"""End-to-end inference benchmark: RGB-D frames/sec/chip, image -> pose.

Measures the full eval path on the flagship KRRN config — crop preprocess
batch on device, KRRN forward (bf16), xyz denormalize, PnP-RANSAC rotation
recovery, ADD metric — as two jit programs, batched. This is the pipeline
the reference runs at ~11.6 fps bs=1 with CPU OpenCV hops
(BASELINE.md); the driver-set target is >= 500 fps/chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit",
"vs_baseline"}. Progress goes to stderr so a watchdog sees liveness
during the (potentially minutes-long) cold compile through the TPU
relay.

Cold-start budget (VERDICT r2 #1): repeat runs hit three caches —
compiled programs (/root/.jax_cache, XLA persistent cache), the example
batch and the initialized params (/root/.bench_cache, value-irrelevant
to a throughput bench; invalidated by shape mismatch with fallback to
recompute) — so a warm process prints its JSON line well inside a
5-minute driver budget.

Env knobs:
  BENCH_BS     batch size (default 32 — the measured-best operating point)
  BENCH_ITERS  timed iterations (default 10)
  BENCH_FAST=1 quick mode: bs=16, 5 iters (for tight driver budgets)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the eval program (model + vmapped PnP-RANSAC)
# is a large graph; caching makes repeat bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

BASELINE_FPS = 11.6  # reference eval throughput (BASELINE.md)


def log(msg):
    print(f"[bench +{time.perf_counter() - T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.models.krrn import KRRN
    from pose_estimation_tpu.data.batching import make_batch
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
    from pose_estimation_tpu.data.pipeline import denormalize_xyz
    from pose_estimation_tpu.core.solvers.pnp import pnp_ransac
    from pose_estimation_tpu.metrics.metric import add_metric

    fast = os.environ.get("BENCH_FAST") == "1"
    batch_size = int(os.environ.get("BENCH_BS", 16 if fast else 32))
    iters = int(os.environ.get("BENCH_ITERS", 5 if fast else 10))
    num_pnp_points = 256

    cfg = schema.Config()
    model = KRRN(cfg=cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    log(f"devices={jax.devices()} bs={batch_size} iters={iters}")

    # Host-side startup caches (driver-budget insurance, VERDICT r2 #1):
    # the synthetic-batch splat render and the params-init program are
    # the two host/compile costs that survive a warm XLA cache. Both are
    # value-irrelevant to a throughput bench, so cache them on disk and
    # invalidate by shape mismatch (np.load is milliseconds; H2D of
    # ~80 MB through the relay is ~2 s).
    cache_dir = "/root/.bench_cache"
    os.makedirs(cache_dir, exist_ok=True)

    bpath = os.path.join(cache_dir, f"batch_bs{batch_size}.npz")
    batch = None
    if os.path.exists(bpath):
        try:
            with np.load(bpath) as z:
                batch = {k: jnp.asarray(z[k]) for k in z.files}
            if (batch["img"].shape[1] != cfg.data.input_size
                    or batch["choose"].shape[1] != cfg.data.num_points):
                log("batch cache stale shapes; rebuilding")
                batch = None
            else:
                log("batch loaded from cache")
        except Exception as e:
            log(f"batch cache unreadable ({type(e).__name__}); rebuilding")
            batch = None
    if batch is None:
        ds = SyntheticPoseDataset(num_objects=4, frames_per_object=8,
                                  num_regions=cfg.data.num_regions)
        idx = [i % len(ds) for i in range(batch_size)]
        batch = make_batch(ds, idx, key, cfg.data.input_size,
                           cfg.data.num_points)
        np.savez(bpath, **{k: np.asarray(v) for k, v in batch.items()})
    log("batch on device; initializing params")

    ppath = os.path.join(cache_dir, "params.npz")
    params = None
    if os.path.exists(ppath):
        try:
            from pose_estimation_tpu.train.checkpoint import (
                load_params_npz)
            params = load_params_npz(ppath)
            log("params loaded from cache")
        except Exception as e:
            log(f"params cache unreadable ({type(e).__name__}); re-init")
    params_from_cache = params is not None

    def fresh_init():
        variables = model.init({"params": key}, batch["img"],
                               batch["cloud"], batch["choose"],
                               batch["cls"], train=False)
        from pose_estimation_tpu.train.checkpoint import save_params_npz
        save_params_npz(ppath, variables["params"])
        return variables["params"]

    if params is None:
        params = fresh_init()
    log("params ready; compiling eval programs")

    # Two compiled programs, NOT one: fusing the bf16 conv model and the
    # while-loop-heavy PnP solver into a single XLA program degrades the
    # schedule ~10x on v5e (130 ms vs 17 ms for the same math; an
    # optimization_barrier between the stages does not help). Program
    # dispatch between two jits costs microseconds.
    @jax.jit
    def infer_model(params, batch):
        out = model.apply({"params": params}, batch["img"], batch["cloud"],
                          batch["choose"], batch["cls"], train=False,
                          opt_pose=True)
        return out["xyz_emb"], out["pred_t"]

    @jax.jit
    def infer_pose(xyz_emb, pred_t, batch, key):
        n = batch["choose"].shape[1]
        stride = max(n // num_pnp_points, 1)
        sel = jnp.arange(num_pnp_points) * stride % n
        pw = denormalize_xyz(xyz_emb[:, sel], batch["lf_border"],
                             batch["extent"])
        uv = batch["xy_choosed"][:, sel]
        keys = jax.random.split(key, pw.shape[0])
        pnp = jax.vmap(lambda kk, p, u, km: pnp_ransac(
            kk, p, u, km, num_hypotheses=32, inlier_px=2.0))(
                keys, pw, uv, batch["k"])
        dis = add_metric(pnp["r"], pred_t, batch["target_r"],
                         batch["target_t"], batch["model_points"],
                         batch["sym_mask"])
        return pnp["r"], pred_t, dis

    def infer(params, batch, key):
        xyz_emb, pred_t = infer_model(params, batch)
        return infer_pose(xyz_emb, pred_t, batch, key)

    # compile (stale params cache => shape error at trace time: re-init)
    try:
        r, t, dis = infer(params, batch, key)
    except Exception:
        if not params_from_cache:
            raise
        log("cached params stale (model changed); re-initializing")
        params = fresh_init()
        r, t, dis = infer(params, batch, key)
    jax.block_until_ready((r, t, dis))
    log("compiled; building distinct timed batches")

    # timed — each iteration a DISTINCT batch (the axon relay dedupes
    # byte-identical dispatches, so timing identical args flatters fps;
    # VERDICT r1 weak #2). Image perturbation changes every downstream
    # tensor; device-resident so no H2D in the timed loop.
    batches = []
    for i in range(iters):
        bi = dict(batch)
        bi["img"] = batch["img"] + jnp.float32(1e-4) * (i + 1)
        batches.append(bi)
    jax.block_until_ready([bi["img"] for bi in batches])
    # one warm pass on a distinct batch so the timed loop sees no
    # first-dispatch overhead
    jax.block_until_ready(infer(params, batches[0], key))
    log("timing")

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(infer(params, batches[i], jax.random.fold_in(key, i)))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = batch_size * iters / dt
    log(f"done: {fps:.1f} fps over {iters} iters ({dt:.3f}s)")

    print(json.dumps({
        "metric": "krrn_e2e_inference_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        **({"mode": "fast"} if fast else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
