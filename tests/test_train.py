"""Optimizer / scheduler / checkpoint / guard tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

from pose_estimation_tpu.configs import schema
from pose_estimation_tpu.train.guards import TrainGuard, global_norm
from pose_estimation_tpu.train.optim import (
    flat_and_anneal_schedule, gradient_centralization, lookahead,
    make_optimizer, ranger, step_schedule)
from pose_estimation_tpu.train.state import TrainState


class TestGC:
    def test_centers_rank2(self):
        gc = gradient_centralization()
        g = {"w": jnp.ones((4, 8)), "b": jnp.ones((8,))}
        out, _ = gc.update(g, gc.init(g))
        np.testing.assert_allclose(np.asarray(out["w"]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["b"]), 1.0)


class TestLookahead:
    def test_sync_pulls_toward_slow(self):
        la = lookahead(sync_period=2, alpha=0.5)
        params = {"w": jnp.zeros(3)}
        state = la.init(params)
        # step 1: no sync, update passes through
        u1 = {"w": jnp.ones(3)}
        out1, state = la.update(u1, state, params)
        np.testing.assert_allclose(np.asarray(out1["w"]), 1.0)
        params = optax.apply_updates(params, out1)
        # step 2: sync: fast = 1 + 1 = 2, slow = 0 -> synced = 1
        out2, state = la.update(u1, state, params)
        params = optax.apply_updates(params, out2)
        np.testing.assert_allclose(np.asarray(params["w"]), 1.0)

    def test_slow_does_not_alias(self):
        la = lookahead()
        p = {"w": jnp.ones(3)}
        st = la.init(p)
        assert st.slow["w"] is not p["w"]


class TestRangerOptimizesQuadratic:
    def test_converges(self):
        # Ranger's lookahead pulls params back toward the slow weights
        # every 6 steps, so it needs ~4x the steps of bare RAdam on this
        # quadratic — that slower-but-steadier trajectory is the point of
        # the optimizer, not a bug.
        tx = ranger(1e-1)
        params = jnp.array([3.0, -2.0])
        state = tx.init(params)
        for _ in range(400):
            g = 2 * params  # d/dx x^2
            upd, state = tx.update(g, state, params)
            params = params + upd
        assert float(jnp.abs(params).max()) < 1e-2


class TestSchedules:
    def test_flat_anneal_phases(self):
        s = flat_and_anneal_schedule(1.0, 1000, warmup_iters=100,
                                     warmup_factor=0.01,
                                     anneal_point=0.5)
        assert float(s(0)) < 0.02
        np.testing.assert_allclose(float(s(300)), 1.0, rtol=1e-5)
        assert float(s(999)) < 0.01

    def test_step_schedule(self):
        s = step_schedule(1.0, steps_per_epoch=10, step_size=2, gamma=0.5)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(25)), 0.5)
        np.testing.assert_allclose(float(s(45)), 0.25)

    def test_make_optimizer_both_types(self):
        cfg = schema.Config()
        assert make_optimizer(cfg) is not None
        cfg2 = schema.override(cfg, **{"train.optimizer":
                                       schema.OptimizerConfig(type="Adam")})
        assert make_optimizer(cfg2) is not None


class TestTrainState:
    def test_apply_gradients_advances(self):
        tx = optax.sgd(0.1)
        params = {"w": jnp.ones(4)}
        st = TrainState.create(params, tx, jax.random.PRNGKey(0))
        g = {"w": jnp.ones(4)}
        st2 = st.apply_gradients(tx, g)
        assert int(st2.step) == 1
        np.testing.assert_allclose(np.asarray(st2.params["w"]), 0.9)

    def test_checkpoint_roundtrip(self, tmp_path):
        from pose_estimation_tpu.train.checkpoint import CheckpointManager
        tx = optax.adam(1e-3)
        params = {"w": jnp.arange(4.0)}
        st = TrainState.create(params, tx, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(0, st)
        restored = mgr.restore(st)
        assert restored is not None
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.arange(4.0))
        assert int(restored.step) == 0


class TestManualLrScale:
    def test_scale_shrinks_update(self):
        """scheduler='manual': the TrainState.lr_scale must actually scale
        the applied update (round-1 advisor finding: it was a dead field)."""
        cfg = schema.override(schema.Config(),
                              **{"train.lr.scheduler": "manual"})
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(4)}
        g = {"w": jnp.ones(4)}

        st_full = TrainState.create(params, tx, jax.random.PRNGKey(0))
        st_decayed = TrainState.create(params, tx, jax.random.PRNGKey(0))
        st_decayed = st_decayed.replace(lr_scale=jnp.asarray(0.5))

        p1 = st_full.apply_gradients(tx, g).params["w"]
        p2 = st_decayed.apply_gradients(tx, g).params["w"]
        d1 = float(jnp.abs(1.0 - p1).max())
        d2 = float(jnp.abs(1.0 - p2).max())
        assert d2 < d1 * 0.75, (d1, d2)
        np.testing.assert_allclose(d2, d1 * 0.5, rtol=1e-4)


class TestPartialRestore:
    def test_merges_matching_leaves_only(self, tmp_path):
        """load_part_module analog (lib/utils/utlis.py:37-52): leaves with
        matching path+shape restore; the rest keep fresh values."""
        from pose_estimation_tpu.train.checkpoint import CheckpointManager
        tx = optax.adam(1e-3)
        saved_params = {"backbone": {"w": jnp.full((4, 4), 7.0)},
                        "head": {"w": jnp.full(3, 9.0)}}
        st = TrainState.create(saved_params, tx, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(0, st)

        # new model: same backbone, different head shape, extra module
        fresh = {"backbone": {"w": jnp.zeros((4, 4))},
                 "head": {"w": jnp.zeros(5)},
                 "new_head": {"w": jnp.zeros(2)}}
        merged, n = CheckpointManager(
            str(tmp_path / "ck")).merge_partial_params(fresh)
        assert n == 1
        np.testing.assert_allclose(np.asarray(merged["backbone"]["w"]), 7.0)
        np.testing.assert_allclose(np.asarray(merged["head"]["w"]), 0.0)
        np.testing.assert_allclose(np.asarray(merged["new_head"]["w"]), 0.0)


class TestGuards:
    def test_escalates_after_consecutive_failures(self):
        g = TrainGuard(max_consecutive=3)
        bad = {"skipped_nonfinite": 1.0}
        good = {"skipped_nonfinite": 0.0}
        assert not g.observe(0, bad)
        assert not g.observe(1, bad)
        assert g.observe(2, bad)
        g2 = TrainGuard(max_consecutive=3)
        g2.observe(0, bad)
        g2.observe(1, good)  # reset
        assert not g2.observe(2, bad)

    def test_global_norm(self):
        t = {"a": jnp.ones(4), "b": jnp.ones((2, 2)) * 2}
        np.testing.assert_allclose(float(global_norm(t)),
                                   np.sqrt(4 + 16), rtol=1e-6)
