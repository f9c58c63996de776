"""Accuracy-evidence run: train KRRN on the synthetic fixture to
convergence, evaluate the TRAINED checkpoint through the full PnP eval
path on a HELD-OUT pose split, and write the per-object ADD(-S) table to
RESULTS_synthetic.json — the rebuild's equivalent of the reference's
committed eval log (version/transparent/eval_log.txt:534-539).

Optionally trains a second model with module.xyz_offset_decode=True and
reports the region-decoded eval numbers next to the raw-xyz path
(tools/script/eval.py:94-105 comparison).

Run on the real TPU: python -m pose_estimation_tpu.tools.train_synthetic_convergence
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np


def make_cfg(schema, region_decode: bool = False, epochs: int = 160,
             capacity: bool = False, flagship: bool = False):
    """capacity=True: a fuller model + finer inputs (128px crops, 1024
    points, wider HRNet) — the mini config's rotation tail is coordinate-
    map noise (solver ablations moved mean rot < 2 deg while the map
    limited it at ~12 deg), and map sharpness is capacity/resolution
    bound.

    flagship=True: the UNMODIFIED schema.Config() model/data settings —
    full-width HRNet, 13 classes, 128px crops, 1024 points, 64 regions —
    i.e. the exact config bench.py measures and cli.py ships; only the
    training-run knobs (epochs/LR/batch) are set. The accuracy artifact
    for the shipped config, matching how the reference's committed log is
    its own shipped config (version/transparent/eval_log.txt:534-539)."""
    if flagship:
        return schema.override(
            schema.Config(),
            **{"train.num_epoch": epochs,
               "train.batch_size": 16, "train.amp": True,
               "train.start_pose_epoch": 0,
               "train.ckpt_every": 0,
               "train.lr.lr": 3e-4, "train.lr.warmup_iters": 100,
               "train.lr.anneal_point": 0.5,
               "module.xyz_offset_decode": region_decode})
    if capacity:
        size = {"data.num_regions": 16, "data.num_points": 1024,
                "data.input_size": 128,
                "module.backbone_outc": 128, "module.stem_width": 48,
                "module.hrnet_stages": ((1, 3, (48, 48)),
                                        (3, 3, (48, 48, 96)),
                                        (2, 3, (48, 48, 96, 96))),
                "module.xyznet": schema.HeadConfig(hidden=128),
                "module.nmlnet": schema.HeadConfig(hidden=128),
                "module.gcn3d": schema.Gcn3dConfig(neighbor_num=10,
                                                   support_num=7),
                "train.lr.anneal_point": 0.5}
    else:
        size = {"data.num_regions": 16, "data.num_points": 512,
                "data.input_size": 96,
                "module.backbone_outc": 64, "module.stem_width": 32,
                "module.hrnet_stages": ((1, 2, (32, 32)),
                                        (2, 2, (32, 32, 64)),
                                        (1, 2, (32, 32, 64, 64))),
                "module.xyznet": schema.HeadConfig(hidden=64),
                "module.nmlnet": schema.HeadConfig(hidden=64),
                "module.gcn3d": schema.Gcn3dConfig(neighbor_num=8,
                                                   support_num=4),
                "train.lr.anneal_point": 0.6}
    return schema.override(
        schema.Config(),
        **{"train.num_epoch": epochs,   # real horizon -> LR anneal engages
           "module.num_cls": 4,
           "module.xyz_offset_decode": region_decode,
           "train.batch_size": 16, "train.amp": True,
           "train.start_pose_epoch": 0,
           "train.ckpt_every": 0,
           "train.lr.lr": 3e-4, "train.lr.warmup_iters": 100,
           **size})


def build_device_store(dataset, cfg, key, chunk: int = 16):
    """One slow pass: every sample preprocessed and stacked into
    device-resident arrays [len(ds), ...].

    Through the axon relay the host->device path runs at ~55 MB/s with
    per-dispatch latency, and each full 240x320 frame ships ~3.4 MB — the
    generic streaming loop measured 2.4 s/step vs 13 ms of device compute.
    A fixture-sized dataset (~0.5 MB/sample post-crop) fits in HBM, so pay
    the transfer once and gather batches on device (zero per-step H2D).
    Crop/choose keys are fixed per index (no per-epoch re-jitter; pose
    diversity across samples is the signal that matters here)."""
    import jax.numpy as jnp
    from pose_estimation_tpu.data.batching import make_batch

    chunks = []
    for start in range(0, len(dataset) - chunk + 1, chunk):
        idx = list(range(start, start + chunk))
        chunks.append(make_batch(dataset, idx, jax.random.fold_in(key, start),
                                 cfg.data.input_size, cfg.data.num_points))
    store = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)
    jax.block_until_ready(store)
    return store


def run_variant(name: str, region_decode: bool, epochs: int,
                train_ds, test_ds, store, log_root: str,
                refine_epochs: int = 0, ablation: bool = False,
                capacity: bool = False, flagship: bool = False,
                eval_from_ckpt: str = ""):
    """eval_from_ckpt: resume the saved final checkpoint and run only the
    eval (+ ablation) part — rebuilds a variant's RESULTS entry without
    retraining (e.g. after an orchestrating process died post-training)."""
    import jax.numpy as jnp
    import numpy as np
    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.data.batching import epoch_indices
    from pose_estimation_tpu.parallel.train_step import (
        build_eval_step, build_train_step)
    from pose_estimation_tpu.train.trainer import Trainer

    total_epochs = epochs + refine_epochs
    cfg = make_cfg(schema, region_decode, epochs=total_epochs,
                   capacity=capacity, flagship=flagship)
    tr = Trainer(cfg, train_ds, test_dataset=test_ds,
                 log_dir=f"{log_root}/{name}",
                 resume=eval_from_ckpt or None)
    tr.init_state()

    gather = jax.jit(lambda s, i: jax.tree.map(
        lambda x: jnp.take(x, i, axis=0), s))

    # refine phase: the last `refine_epochs` epochs add the
    # differentiable-PnP ADD term (cfg.train.refine / Train.REFINE +
    # START_POSE_EPOCH machinery, tools/trainer.py:52) — IFT gradients
    # through the solver sharpen the coordinate map exactly where PnP
    # rotation recovery is sensitive. Same tx => optimizer state and the
    # LR anneal (horizon = total_epochs) carry straight through.
    refine_step = None
    if refine_epochs and not eval_from_ckpt:
        cfg_ref = schema.override(cfg, **{"train.refine": True})
        refine_step = build_train_step(tr.model, tr.tx, cfg_ref)

    bs = cfg.train.batch_size
    t0 = time.time()
    train_epochs = 0 if eval_from_ckpt else total_epochs
    for epoch in range(train_epochs):
        step_fn = (refine_step if refine_step is not None
                   and epoch >= epochs else tr.train_step)
        ek = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), epoch)
        for idx in epoch_indices(ek, len(train_ds), bs):
            batch = gather(store, jnp.asarray(idx))
            tr.state, metrics = step_fn(tr.state, batch, opt_pose=True)
        # once per epoch (not per step — a scalar D2H through the relay
        # costs more than the whole device step): divergence check
        if not np.isfinite(float(metrics["loss"])):
            print(f"[{name}] non-finite loss at epoch {epoch}; aborting",
                  flush=True)
            break
        if (epoch + 1) % 8 == 0:
            s = tr.test_epoch(epoch)
            print(f"[{name}] epoch {epoch}: "
                  f"{json.dumps(s['overall'])}", flush=True)
    train_sec = time.time() - t0
    if not eval_from_ckpt:
        # final checkpoint: eval-side solver experiments rerun from here
        # without retraining (best-ckpt tracking may have saved this step)
        try:
            tr.ckpt.save(int(tr.state.step), tr.state,
                         metrics={"final": 1.0}, force=True)
        except Exception as e:
            print(f"[{name}] final ckpt save skipped: {type(e).__name__}")
    summary = tr.test_epoch(999)
    frames = int(tr.state.step) * cfg.train.batch_size
    result = {
        "variant": name,
        "region_decode": region_decode,
        "epochs": epochs,
        "refine_epochs": refine_epochs,
        "steps": int(tr.state.step),
        "train_seconds": None if eval_from_ckpt else round(train_sec, 1),
        "train_fps": (None if eval_from_ckpt
                      else round(frames / max(train_sec, 1e-9), 1)),
        "per_object": summary["per_object"],
        "overall": summary["overall"],
    }
    if eval_from_ckpt:
        result["eval_from_ckpt"] = eval_from_ckpt
    if ablation:
        # Solver-settings ablation on the SAME trained checkpoint: where
        # does the rotation tail come from — hypothesis count, LM weight
        # scheme, PnP point budget? (VERDICT r2 weak #3/#5 follow-up.)
        abl = {}
        # Deltas from the cfg.eval default (h64 + Cauchy-robust LM +
        # top-4 multi-start — the winner of the r3 sweep, now the
        # shipped default; see schema.EvalConfig):
        variants = {
            "h32_hard_top1": dict(pnp_hypotheses=32, robust_refine=False,
                                  refine_top_k=1),   # pre-r3 baseline
            "no_robust": dict(robust_refine=False),
            "top1": dict(refine_top_k=1),
            "p512": dict(num_pnp_points=512),
        }
        if region_decode:
            variants["hard_decode"] = dict(hard=True)
        for aname, kw in variants.items():
            acfg = cfg
            if kw.pop("hard", False):
                acfg = schema.override(
                    cfg, **{"module.region_soft_decode": False})
            tr.eval_step = build_eval_step(tr.model, acfg, **kw)
            s = tr.test_epoch(1000)
            abl[aname] = s["overall"]
            print(f"[{name}] ablation {aname}: "
                  f"{json.dumps(s['overall'])}", flush=True)
        result["eval_ablation"] = abl
    return result


def merge_variants(existing, produced):
    """Overlay this run's variant entries onto the file's CURRENT
    variants (read at write time, not the launch-time snapshot): a
    multi-hour run that re-writes its startup copy clobbers any variant
    another process (or a manual edit) landed in the meantime — that
    race erased the committed region_decoded entry once (see 7e0ef26
    history). This run's entries win name collisions."""
    ours = {v["variant"] for v in produced}
    return [v for v in existing if v["variant"] not in ours] + produced


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--refine_epochs", type=int, default=0,
                   help="extra epochs with the differentiable-PnP ADD "
                        "term (cfg.train.refine) after the main phase")
    p.add_argument("--frames_per_object", type=int, default=512)
    p.add_argument("--out", default="RESULTS_synthetic.json")
    p.add_argument("--log_root", default="/tmp/convergence")
    p.add_argument("--variants", default="raw_xyz,region_decoded",
                   help="comma list of raw_xyz|region_decoded|capacity. "
                        "Run ONE per process: a dead relay buffer from a "
                        "finished variant wedged a follow-on variant's "
                        "train loop mid-epoch (observed r3)")
    p.add_argument("--append", action="store_true",
                   help="merge into an existing --out file instead of "
                        "overwriting (replaces same-named variants)")
    p.add_argument("--eval_from_ckpt", default="",
                   help="skip training; rebuild the (single) variant's "
                        "entry by evaluating this checkpoint dir")
    p.add_argument("--eval_ablation", action="store_true",
                   help="after training, re-evaluate the checkpoint under "
                        "alternative solver settings")
    args = p.parse_args(argv)

    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)

    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset

    # 4 objects, one symmetric (class 3) for ADD-S coverage; datasets and
    # the device store are shared across variants with matching region
    # counts (the batch content is identical — only the train-step's
    # offset encoding differs). Built lazily per region count: the
    # flagship variant runs at schema.Config()'s num_regions=64 while the
    # mini/capacity variants use 16.
    _ds_cache: dict = {}

    def get_datasets(num_regions: int):
        if num_regions not in _ds_cache:
            _ds_cache[num_regions] = (
                SyntheticPoseDataset(
                    num_objects=4,
                    frames_per_object=args.frames_per_object,
                    im_h=240, im_w=320, num_regions=num_regions,
                    pose_seed=0, sym_objects=(3,), cache_frames=True),
                SyntheticPoseDataset(
                    num_objects=4, frames_per_object=32,
                    im_h=240, im_w=320, num_regions=num_regions,
                    pose_seed=7, sym_objects=(3,), cache_frames=True))
        return _ds_cache[num_regions]

    results = {"fixture": "SyntheticPoseDataset v2 (4 objects, 1 symmetric "
                          "[ADD-S], multi-octave object-frame texture, "
                          "held-out pose_seed=7 split)",
               "protocol": "full PnP eval path (on-device EPnP-RANSAC "
                           "rotation + regressed translation); thresholds "
                           "ADD(-S) < {0.1, 0.05, 0.02} * diameter, "
                           "5deg5cm; AUC over [0, 0.1m]",
               "variants": []}
    wanted = [v.strip() for v in args.variants.split(",") if v.strip()]
    spec = {  # name -> (region_decode, capacity, flagship)
        "raw_xyz": (False, False, False),
        "region_decoded": (True, False, False),
        "capacity": (False, True, False),
        # region decode at the capacity config: separates "region decoding
        # is worse on this fixture" from "the mini config's map capacity
        # limits every decode scheme" (the raw-path tail was proven
        # capacity-bound; this is the same control for the region path)
        "region_capacity": (True, True, False),
        # the UNMODIFIED shipped schema.Config() — the config bench.py
        # measures and cli.py runs (VERDICT r3 missing #3)
        "flagship": (False, False, True),
    }
    unknown = [v for v in wanted if v not in spec]
    assert not unknown, f"unknown variants {unknown}"
    assert not (args.eval_from_ckpt and len(wanted) != 1), (
        "--eval_from_ckpt takes exactly one variant")

    produced = []
    store = None
    store_key = None  # (input_size, num_points, regions) of the store
    for name in wanted:
        region_decode, capacity, flagship = spec[name]
        cfg_v = make_cfg(schema, region_decode, epochs=args.epochs,
                         capacity=capacity, flagship=flagship)
        train_ds, test_ds = get_datasets(cfg_v.data.num_regions)
        need = (cfg_v.data.input_size, cfg_v.data.num_points,
                cfg_v.data.num_regions)
        if not args.eval_from_ckpt and store_key != need:
            print(f"building device store ({len(train_ds)} samples, "
                  f"crop {need[0]}, {need[1]} pts)...", flush=True)
            store = build_device_store(train_ds, cfg_v,
                                       jax.random.PRNGKey(777))
            store_key = need
        produced.append(run_variant(
            name, region_decode, args.epochs, train_ds, test_ds, store,
            args.log_root, refine_epochs=args.refine_epochs,
            ablation=args.eval_ablation, capacity=capacity,
            flagship=flagship, eval_from_ckpt=args.eval_from_ckpt))

    # Exclusive lock across the read->merge->write so two single-variant
    # processes finishing together can't each rebuild from pre-merge
    # contents and erase the other's entry (the 7e0ef26 race, which
    # merge_variants alone only narrowed); write via rename so readers
    # never see a torn file.
    import fcntl
    with open(args.out + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if args.append and os.path.isfile(args.out):
            with open(args.out) as f:
                results = json.load(f)
        results["variants"] = merge_variants(results.get("variants", []),
                                             produced)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2)
        os.replace(tmp, args.out)
    print(json.dumps({v["variant"]: v["overall"]
                      for v in results["variants"]}, indent=2))


if __name__ == "__main__":
    main()
