"""The fused multi-stream narrow GCN aggregate (the level-0 hot path).

Three equivalences pin it down:
  1. the shared-gather XLA formulation == per-stream gcn_aggregate_linear
  2. the Pallas kernel (interpret mode) == the XLA formulation
  3. the fused fusion level-0 wiring == per-stream _Stream.level0,
     with an IDENTICAL param tree (checkpoints stay loadable)
plus a gradient-flow check through the custom_vjp dispatcher.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.core import pointops as po
from pose_estimation_tpu.ops import pallas_gcn as pg


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _mk(rng, b=2, n=96, m=96, k=5, s=3, o=16, cin=12, streams=3):
    nds, dirs_l, xs, ws, bs = [], [], [], [], []
    for _ in range(streams):
        nd = rng.randn(b, n, k, 3).astype(np.float32)
        nd /= np.linalg.norm(nd, axis=-1, keepdims=True) + 1e-9
        nds.append(jnp.asarray(nd))
        d = rng.randn(3, s * o).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirs_l.append(jnp.asarray(d))
        xs.append(jnp.asarray(rng.randn(b, m, cin).astype(np.float32)))
        ws.append(jnp.asarray(
            rng.randn(cin, s * o).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.randn(s * o).astype(np.float32) * 0.1))
    idx = jnp.asarray(rng.randint(0, m, (b, n, k)).astype(np.int32))
    return nds, dirs_l, xs, ws, bs, idx, s


class TestLinearMulti:

    def test_xla_multi_matches_per_stream(self, rng):
        nds, dirs_l, xs, ws, bs, idx, s = _mk(rng)
        multi = pg._linear_multi_xla(nds, dirs_l, xs, ws, bs, idx, s)
        for si in range(3):
            single = pg.gcn_aggregate_linear(
                nds[si], dirs_l[si], xs[si], ws[si], bs[si], idx, s)
            np.testing.assert_allclose(np.asarray(multi[si]),
                                       np.asarray(single),
                                       rtol=1e-4, atol=1e-4)

    def test_pallas_kernel_matches_xla(self, rng):
        nds, dirs_l, xs, ws, bs, idx, s = _mk(rng)
        ref = pg._linear_multi_xla(nds, dirs_l, xs, ws, bs, idx, s)
        got = pg._linear_multi_tpu_impl(nds, dirs_l, xs, ws, bs, idx, s,
                                        interpret=True)
        for r, g in zip(ref, got):
            # kernel runs the matmuls in bf16 like the TPU XLA path
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0.05, atol=0.05)

    def test_pallas_kernel_unpadded_tile(self, rng):
        # n not a multiple of the 256 tile exercises the pad/crop path
        nds, dirs_l, xs, ws, bs, idx, s = _mk(rng, n=300, m=64)
        ref = pg._linear_multi_xla(nds, dirs_l, xs, ws, bs, idx, s)
        got = pg._linear_multi_tpu_impl(nds, dirs_l, xs, ws, bs, idx, s,
                                        interpret=True)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0.05, atol=0.05)

    def test_grad_flows_through_dispatcher(self, rng):
        nds, dirs_l, xs, ws, bs, idx, s = _mk(rng, b=1, n=32, m=32, k=3)

        def loss(xs_, ws_):
            outs = pg._linear_multi_tpu(s, nds, dirs_l, xs_, ws_, bs, idx)
            return sum(jnp.sum(o ** 2) for o in outs)

        gx, gw = jax.grad(loss, argnums=(0, 1))(xs, ws)
        # custom_vjp backward == vjp of the XLA formulation
        def loss_ref(xs_, ws_):
            outs = pg._linear_multi_xla(nds, dirs_l, xs_, ws_, bs, idx, s)
            return sum(jnp.sum(o ** 2) for o in outs)

        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(xs, ws)
        for a, b_ in zip(gx + gw, rx + rw):
            assert np.isfinite(np.asarray(a)).all()
            # cotangents come from the kernel's bf16 forward -> bf16-level
            # agreement with the all-f32 reference gradient
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=0.05, atol=0.05)


class TestSurfaceMulti:

    def test_matches_per_stream_theta_only(self, rng):
        nds, dirs_l, _, _, _, idx, s = _mk(rng)
        multi = pg._surface_multi_xla(nds, dirs_l, s)
        kern = pg._surface_multi_impl(nds, dirs_l, s, interpret=True)
        for si in range(3):
            single = pg.gcn_aggregate(nds[si], dirs_l[si], None, idx, s)
            np.testing.assert_allclose(np.asarray(multi[si]),
                                       np.asarray(single),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(kern[si]),
                                       np.asarray(single),
                                       rtol=0.05, atol=0.05)

    def test_grad_flows(self, rng):
        nds, dirs_l, _, _, _, _, s = _mk(rng, b=1, n=32, m=32, k=3)

        def loss(nds_, dl_):
            outs = pg._surface_multi_tpu(s, nds_, dl_)
            return sum(jnp.sum(o ** 2) for o in outs)

        gn, gd = jax.grad(loss, argnums=(0, 1))(nds, dirs_l)
        for a in gn + gd:
            assert np.isfinite(np.asarray(a)).all()


class TestShardedKernel:
    """The custom_partitioning rule: batch sharding must pass THROUGH
    the pallas_call (per-shard lowering), not force an all-gather +
    replicated compute."""

    def test_data_sharded_jit_no_allgather(self, rng):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        sh = NamedSharding(mesh, P("data"))
        nds, dirs_l, xs, ws, bs, idx, s = _mk(rng, b=8, n=64, m=64, k=3)
        nds_s = [jax.device_put(x, sh) for x in nds]
        xs_s = [jax.device_put(x, sh) for x in xs]
        idx_s = jax.device_put(idx, sh)

        f = jax.jit(lambda *a: pg._linear_multi_tpu_impl(
            list(a[:3]), dirs_l, list(a[3:6]), ws, bs, a[6], s,
            interpret=True))
        out = f(*nds_s, *xs_s, idx_s)
        # sharding passed through
        assert out[0].sharding.spec == P("data")
        hlo = f.lower(*nds_s, *xs_s, idx_s).compile().as_text()
        assert hlo.count("all-gather") == 0, "kernel forced an all-gather"
        # and per-value identical to the unsharded kernel
        plain = pg._linear_multi_tpu_impl(nds, dirs_l, xs, ws, bs, idx,
                                          s, interpret=True)
        for a, b_ in zip(out, plain):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_surface_sharded(self, rng):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        sh = NamedSharding(mesh, P("data"))
        nds, dirs_l, _, _, _, _, s = _mk(rng, b=8, n=64, m=64, k=3)
        nds_s = [jax.device_put(x, sh) for x in nds]
        g = jax.jit(lambda *a: pg._surface_multi_impl(
            list(a), dirs_l, s, interpret=True))
        out = g(*nds_s)
        assert out[0].sharding.spec == P("data")
        hlo = g.lower(*nds_s).compile().as_text()
        assert hlo.count("all-gather") == 0


class TestOnehotGathers:

    def test_gather_rows_matches_take(self, rng):
        f = jnp.asarray(rng.randn(2, 50, 7).astype(np.float32))
        i = jnp.asarray(rng.randint(0, 50, (2, 30)).astype(np.int32))
        got = po.gather_rows(f, i)
        ref = jnp.take_along_axis(f, i[..., None], axis=-2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    def test_gather_neighbors_max_matches(self, rng):
        f = jnp.asarray(rng.randn(2, 40, 9).astype(np.float32))
        i = jnp.asarray(rng.randint(0, 40, (2, 10, 4)).astype(np.int32))
        got = po.gather_neighbors_max(f, i)
        ref = jnp.max(po.gather_neighbors(f, i), axis=-2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


class TestFusedLevel0:

    def test_matches_per_stream_level0_and_param_tree(self, rng):
        from pose_estimation_tpu.models.fusion import FusionNetLite, _Stream

        b, n = 2, 64
        verts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        nml = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))

        m = FusionNetLite(neighbor_num=4, support_num=2)
        variables = m.init({"params": jax.random.PRNGKey(0)},
                           verts, xyz, nml, False)
        out = m.apply(variables, verts, xyz, nml, False)
        assert out.shape == (b, n, 1280)
        assert np.isfinite(np.asarray(out)).all()

        # param tree identical to the per-stream formulation: conv1's
        # params still live under each stream
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        names = {"/".join(str(k.key) for k in path) for path, _ in flat}
        for sid in ("_Stream_0", "_Stream_1", "_Stream_2"):
            for p in ("weights", "bias", "directions"):
                assert f"{sid}/conv1/{p}" in names, sorted(names)

        # and the fused wiring computes the same values as level0()
        idx = po.knn_indices(verts, 4)

        class PerStream(FusionNetLite.__bases__[0]):  # nn.Module
            support_num: int = 2

            def setup(self):
                self.s0 = _Stream(128, 128, 128, self.support_num, "gn")
                self.s1 = _Stream(128, 128, 128, self.support_num, "gn")
                self.s2 = _Stream(128, 128, 128, self.support_num, "gn")

            def __call__(self, idx, pts_list, train=False):
                return [s.level0(idx, p, train)
                        for s, p in zip((self.s0, self.s1, self.s2),
                                        pts_list)]

        class Fused(PerStream):
            def __call__(self, idx, pts_list, train=False):
                from pose_estimation_tpu.models.fusion import _fused_level0
                return _fused_level0((self.s0, self.s1, self.s2), idx,
                                     pts_list, self.support_num,
                                     jnp.float32, train)

        key = jax.random.PRNGKey(1)
        ref_m = PerStream()
        fus_m = Fused()
        pts = [verts, xyz, nml]
        v1 = ref_m.init({"params": key}, idx, pts)
        ref_out = ref_m.apply(v1, idx, pts)
        fus_out = fus_m.apply(v1, idx, pts)  # same variables load cleanly
        for r, f in zip(ref_out, fus_out):
            np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)
