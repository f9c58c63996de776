"""Solver-settings sweep on a SAVED convergence checkpoint.

Loads the final checkpoint written by train_synthetic_convergence and
re-evaluates the held-out split under alternative PnP-RANSAC settings
(hypothesis count, robust reweighting, multi-start top-K LM, inlier
threshold, point budget) WITHOUT retraining — the cheap way to attribute
the rotation-error tail between coordinate-map noise and solver slack
(VERDICT r2 weak #3/#5 follow-up).

Run on the real chip:
  python -m pose_estimation_tpu.tools.eval_solver_sweep \
      --ckpt /tmp/convergence_r3/raw_xyz/ckpt [--region_decode]
"""

from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--region_decode", action="store_true")
    p.add_argument("--epochs", type=int, default=160,
                   help="must match the training run's cfg horizon knobs "
                        "(affects nothing at eval; kept for cfg parity)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)

    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
    from pose_estimation_tpu.parallel.train_step import build_eval_step
    from pose_estimation_tpu.tools.train_synthetic_convergence import make_cfg
    from pose_estimation_tpu.train.trainer import Trainer

    cfg = make_cfg(schema, args.region_decode, epochs=args.epochs)
    test_ds = SyntheticPoseDataset(
        num_objects=4, frames_per_object=32,
        im_h=240, im_w=320, num_regions=16, pose_seed=7, sym_objects=(3,),
        cache_frames=True)
    tr = Trainer(cfg, test_ds, test_dataset=test_ds,
                 log_dir="/tmp/eval_sweep", resume=args.ckpt)
    tr.init_state()

    sweeps = {
        # {} = cfg.eval defaults (h64+robust+top4 since the r3 sweep)
        "default": {},
        "h32_hard_top1": dict(pnp_hypotheses=32, robust_refine=False,
                              refine_top_k=1),
        "h64_robust": dict(pnp_hypotheses=64, robust_refine=True,
                           refine_top_k=1),
        "h64_top4": dict(pnp_hypotheses=64, robust_refine=False,
                         refine_top_k=4),
    }
    report = {}
    for name, kw in sweeps.items():
        tr.eval_step = build_eval_step(tr.model, cfg, **kw)
        s = tr.test_epoch(2000)
        report[name] = s["overall"]
        print(f"[sweep {name}] {json.dumps(s['overall'])}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
