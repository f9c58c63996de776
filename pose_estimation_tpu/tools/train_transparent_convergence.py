"""Transparent-pipeline accuracy evidence: train TRPESNet on the synthetic
transparent fixture to convergence, evaluate the TRAINED checkpoint through
the batched confidence-argmax eval path on a HELD-OUT pose split, and write
the per-object ADD(-S) table to RESULTS_transparent.json — the rebuild's
analog of the reference's committed transparent eval log
(version/transparent/eval_log.txt:534-539, overall 0.9173 @ 0.1d).

Run on the real TPU:
  python -m pose_estimation_tpu.tools.train_transparent_convergence
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def make_cfg(schema, epochs: int = 64, refine: bool = False):
    # fixture-sized TRPESNet: the full 256-crop/1000-point cleargrasp
    # config is unnecessary for 2-object splat renders; geometry and loss
    # paths are identical.
    return schema.override(
        schema.transparent_cleargrasp(),
        **{"train.num_epoch": epochs,   # real horizon -> LR anneal engages
           "module.num_cls": 4, "data.num_points": 256,
           "data.input_size": 96, "train.batch_size": 16,
           "train.amp": True, "train.ckpt_every": 0,
           "train.refine": refine,  # eval-time trimmed ICP vs completed depth
           "train.lr.lr": 2e-4, "train.lr.warmup_iters": 100,
           "train.lr.anneal_point": 0.6,
           "train.optimizer": schema.OptimizerConfig(type="Adam")})


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=64)
    p.add_argument("--frames_per_object", type=int, default=256)
    p.add_argument("--out", default="RESULTS_transparent.json")
    p.add_argument("--log_root", default="/tmp/convergence_transparent")
    p.add_argument("--refine", action="store_true",
                   help="eval-time trimmed-ICP refinement against the "
                        "predicted completed depth (cfg.train.refine)")
    p.add_argument("--eval_from_ckpt", default="",
                   help="skip training; rebuild RESULTS from this saved "
                        "checkpoint dir (the run saves one at "
                        "<log_root>/trpes/ckpt) — lets eval-side changes "
                        "(e.g. the ICP solver) re-measure without the "
                        "~15 min retrain")
    args = p.parse_args(argv)

    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)

    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.data.synthetic import SyntheticTransparentDataset
    from pose_estimation_tpu.metrics.metric import PerObjectAccumulator
    from pose_estimation_tpu.train.transparent_trainer import (
        TransparentTrainer)
    import numpy as np

    cfg = make_cfg(schema, epochs=args.epochs, refine=args.refine)
    train_ds = SyntheticTransparentDataset(
        num_objects=4, frames_per_object=args.frames_per_object,
        im_h=240, im_w=320, num_regions=16, pose_seed=0, sym_objects=(3,),
        cache_frames=True)
    test_ds = SyntheticTransparentDataset(
        num_objects=4, frames_per_object=32,
        im_h=240, im_w=320, num_regions=16, pose_seed=7, sym_objects=(3,),
        cache_frames=True)

    tr = TransparentTrainer(cfg, train_ds, test_dataset=test_ds,
                            log_dir=f"{args.log_root}/trpes",
                            resume=args.eval_from_ckpt or None)
    tr.init_state()

    # Device-resident sample store (same rationale as
    # train_synthetic_convergence.build_device_store: the axon relay's
    # ~55 MB/s H2D path makes streaming full frames the bottleneck; a
    # fixture-sized dataset fits in HBM, so transfer once, gather on
    # device per step).
    import jax.numpy as jnp
    train_sec = 0.0
    if not args.eval_from_ckpt:
        print(f"[trpes] building device store ({len(train_ds)} samples)...",
              flush=True)
        chunks = []
        bs = cfg.train.batch_size
        for start in range(0, len(train_ds) - bs + 1, bs):
            chunks.append(
                tr._batch(list(range(start, start + bs)), seed=start))
        store = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)
        jax.block_until_ready(store)
        gather = jax.jit(lambda s, i: jax.tree.map(
            lambda x: jnp.take(x, i, axis=0), s))

        from pose_estimation_tpu.data.batching import epoch_indices
        t0 = time.time()
        for epoch in range(args.epochs):
            ek = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), epoch)
            for idx in epoch_indices(ek, len(train_ds), bs):
                batch = gather(store, jnp.asarray(idx))
                tr.state, metrics = tr.train_step(tr.state, batch)
            if not np.isfinite(float(metrics["all_loss"])):
                print(f"[trpes] non-finite loss at epoch {epoch}; aborting",
                      flush=True)
                break
            if (epoch + 1) % 8 == 0:
                s = tr.test_epoch(epoch)
                print(f"[trpes] epoch {epoch}: {json.dumps(s['overall'])}",
                      flush=True)
        train_sec = time.time() - t0
        # final checkpoint: lets eval-side variants rerun without
        # retraining (best-ckpt tracking may already have saved this step)
        try:
            tr.ckpt.save(int(tr.state.step), tr.state,
                         metrics={"final": 1.0}, force=True)
        except Exception as e:
            print(f"[trpes] final ckpt save skipped: {type(e).__name__}")
    summary = tr.test_epoch(999)

    results = {
        "refine_icp": args.refine,
        **({"eval_from_ckpt": args.eval_from_ckpt}
           if args.eval_from_ckpt else {}),
        "fixture": "SyntheticTransparentDataset(4 objects, 1 symmetric, "
                   "held-out pose_seed=7 split)",
        "protocol": "batched TRPESNet eval: confidence-argmax point pose, "
                    "allocentric->egocentric rotation, ADD(-S) < 0.1 * "
                    "true max-pairwise diameter",
        "epochs": args.epochs,
        "steps": int(tr.state.step),
        "train_seconds": (None if args.eval_from_ckpt
                          else round(train_sec, 1)),
        "train_fps": (None if args.eval_from_ckpt
                      else round(int(tr.state.step) * cfg.train.batch_size
                                 / max(train_sec, 1e-9), 1)),
        "per_object": summary["per_object"],
        "overall": summary["overall"],
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["overall"], indent=2))


if __name__ == "__main__":
    main()
