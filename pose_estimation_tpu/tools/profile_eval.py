"""Per-component device-loop timing of the eval path on the real chip.

Host timing loops lie through the axon relay (identical dispatches are
deduped), so each component is timed as ONE jit program that runs the
component `reps` times inside lax.fori_loop with an input perturbation and
a scalar carry dependency — the device cannot skip or overlap iterations.

Usage (real TPU): python -m pose_estimation_tpu.tools.profile_eval
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.utils.cache import enable_cache
enable_cache(jax, min_compile_secs=1.0)


def device_time(fn, args, reps: int = 10, name: str = "") -> float:
    """Milliseconds per call of fn(*args), measured by an on-device loop.

    Relay hardening (same hazards bench.py documents): the timed dispatch
    carries a wall-clock nonce so it is never byte-identical to the warm
    dispatch (the relay result-caches identical (program, args), within
    and across processes — observed 0.01 ms "timings" without this), and
    completion is forced by a host VALUE fetch, not block_until_ready
    (which can return optimistically through the relay client).
    """
    import numpy as np

    @jax.jit
    def looped(args, eps0):
        def body(i, carry):
            eps, a = carry
            pert = jax.tree.map(
                lambda x: (x + eps.astype(x.dtype)
                           if jnp.issubdtype(x.dtype, jnp.floating) else x),
                a)
            out = fn(*pert)
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            dep = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return (eps * 0.5 + dep * 1e-30, a)

        return jax.lax.fori_loop(0, reps, body, (eps0, args))[0]

    nonce = 1e-9 * (time.time_ns() % 997 + 1)
    out = looped(args, jnp.float32(nonce))              # compile + warm
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = looped(args, jnp.float32(nonce * 0.5 + 1e-7))  # distinct args
    float(np.asarray(out))                               # forces completion
    ms = (time.perf_counter() - t0) * 1000.0 / reps
    print(f"{name:42s} {ms:8.2f} ms")
    return ms


def main(only: str = ""):
    import os
    only = only or os.environ.get("PROFILE_ONLY", "")

    def want(tag):
        return not only or tag in only.split(",")

    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.core import pointops as po
    from pose_estimation_tpu.core.solvers.pnp import pnp_ransac
    from pose_estimation_tpu.data.batching import make_batch
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
    from pose_estimation_tpu.models.fusion import FusionNetLite
    from pose_estimation_tpu.models.hrnet import DEFAULT_STAGES, HRNet
    from pose_estimation_tpu.models.krrn import KRRN
    from pose_estimation_tpu.ops.pallas_gcn import gcn_aggregate

    cfg = schema.Config()
    bs = 32
    n = cfg.data.num_points
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} bs={bs} n={n}")

    ds = SyntheticPoseDataset(num_objects=4, frames_per_object=8,
                              num_regions=cfg.data.num_regions)
    batch = make_batch(ds, [i % len(ds) for i in range(bs)], key,
                       cfg.data.input_size, cfg.data.num_points)

    # --- full model --- (random params via eval_shape: no init compile
    # through the relay; values are timing-irrelevant, see
    # checkpoint.synthesize_params)
    from pose_estimation_tpu.train.checkpoint import synthesize_params
    model = KRRN(cfg=cfg, dtype=dtype)
    params = jax.tree.map(jnp.asarray, synthesize_params(
        lambda: model.init({"params": key}, batch["img"], batch["cloud"],
                           batch["choose"], batch["cls"],
                           train=False))["params"])
    if want("model"): device_time(
        lambda img: model.apply({"params": params}, img, batch["cloud"],
                                batch["choose"], batch["cls"], train=False,
                                opt_pose=True)["pred_t"],
        (batch["img"],), name="KRRN full forward (opt_pose)")
    if want("model"): device_time(
        lambda img: model.apply({"params": params}, img, batch["cloud"],
                                batch["choose"], batch["cls"], train=False,
                                opt_pose=False)["xyz_emb"],
        (batch["img"],), name="KRRN forward no-fusion (opt_pose=False)")

    # --- HRNet alone ---
    hr = HRNet(backbone_outc=cfg.module.backbone_outc, stages=DEFAULT_STAGES,
               stem_width=cfg.module.stem_width, norm=cfg.module.norm,
               dtype=dtype)
    hv = jax.tree.map(jnp.asarray, synthesize_params(
        lambda: hr.init({"params": key}, batch["img"].astype(dtype),
                        False)))
    if want("hrnet"): device_time(
        lambda img: hr.apply(hv, img.astype(dtype), False)[0],
        (batch["img"],), name="HRNet backbone")

    # --- fusion alone ---
    fus = FusionNetLite(neighbor_num=cfg.module.gcn3d.neighbor_num,
                        support_num=cfg.module.gcn3d.support_num,
                        norm=cfg.module.norm, dtype=dtype)
    verts = batch["cloud"].astype(jnp.float32)
    xyz_emb = jax.random.normal(key, (bs, n, 3))
    nml_emb = jax.random.normal(jax.random.fold_in(key, 1), (bs, n, 3))
    fv = jax.tree.map(jnp.asarray, synthesize_params(
        lambda: fus.init({"params": key}, verts, xyz_emb, nml_emb, False)))
    if want("fusion"): device_time(lambda v, x, m: fus.apply(fv, v, x, m, False),
                (verts, xyz_emb, nml_emb), name="FusionNetLite")

    # --- fusion internals ---
    if want("ops"): device_time(lambda v: po.knn_indices(v, 10), (verts,),
                name="knn_indices N=1024 k=10")
    idx = po.knn_indices(verts, 10)
    so = 128 * 7
    feats = jax.random.normal(key, (bs, n, so), dtype)
    dirs = jax.random.normal(key, (3, so), jnp.float32)
    nd = po.neighbor_directions(verts, idx)
    if want("ops"): device_time(lambda f: gcn_aggregate(nd, dirs, f, idx, 7), (feats,),
                name="gcn_aggregate N=1024 C=896 (onehot)")
    if want("ops"): device_time(lambda v: po.nearest_index(v, v[:, :256]), (verts,),
                name="nearest_index 1024<-256")
    if want("ops"):
        # r5 fused kernels vs the XLA formulations at the level-0 shapes
        from pose_estimation_tpu.ops import pallas_gcn as pg
        k3 = jax.random.split(key, 3)
        nds3 = [nd, nd * 0.5, nd * 0.25]
        dirs3 = [jax.random.normal(kk, (3, so), jnp.float32) for kk in k3]
        xs3 = [jax.random.normal(kk, (bs, n, 128), dtype) for kk in k3]
        ws3 = [jax.random.normal(kk, (128, so), dtype) * 0.1 for kk in k3]
        bs3 = [jax.random.normal(kk, (so,), dtype) * 0.1 for kk in k3]
        device_time(lambda *a: pg._linear_multi_tpu_impl(
            list(a[:3]), dirs3, list(a[3:]), ws3, bs3, idx, 7),
            (*nds3, *xs3), reps=30, name="linear_multi fused kernel lvl0")
        device_time(lambda *a: pg._linear_multi_xla(
            list(a[:3]), dirs3, list(a[3:]), ws3, bs3, idx, 7),
            (*nds3, *xs3), reps=30, name="linear_multi XLA lvl0")
        device_time(lambda *a: pg._surface_multi_impl(list(a), dirs3, 7),
                    (*nds3,), reps=30, name="surface_multi fused kernel")
        device_time(lambda n_: gcn_aggregate(n_, dirs, None, idx, 7),
                    (nd,), name="gcn_aggregate theta-only (ConvSurface)")
        from pose_estimation_tpu.models.gcn3d import PoolLayer
        pool = PoolLayer(4, 4)
        f128 = jax.random.normal(key, (bs, n, 128), dtype)
        pv = pool.init({"params": key}, verts, f128)
        device_time(lambda v, f: pool.apply(pv, v, f), (verts, f128),
                    name="PoolLayer N=1024 rate=4")
        verts1 = verts[:, :256]
        idx1 = po.knn_indices(verts1, 10)
        nd1 = po.neighbor_directions(verts1, idx1)
        feats1 = jax.random.normal(key, (bs, 256, so), dtype)
        device_time(lambda f: gcn_aggregate(nd1, dirs, f, idx1, 7),
                    (feats1,), name="gcn_aggregate N=256 (level1)")

    # --- PnP ---
    pw = jax.random.normal(key, (bs, 256, 3)) * 0.05
    uv = jax.random.uniform(key, (bs, 256, 2)) * 100
    kmat = jnp.broadcast_to(batch["k"][0], (bs, 3, 3))
    keys = jax.random.split(key, bs)
    solve = jax.vmap(lambda kk, p, u, km: pnp_ransac(
        kk, p, u, km, num_hypotheses=32, inlier_px=2.0))
    if want("pnp"): device_time(lambda p, u: solve(keys, p, u, kmat)["t"], (pw, uv),
                name="pnp_ransac vmap b=32 h=32")


if __name__ == "__main__":
    main()
