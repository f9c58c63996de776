"""Offline label generation: the scripts the reference assumes but doesn't
ship.

The reference's LineMOD reader loads precomputed per-frame pickles —
`xyz/*-coordinate.pkl`, `xyz/*-region.pkl`, `normal/*-normal.pkl`
(dataset/linemod/batchdataset.py:200-210) — produced by offline scripts NOT
in the repo. This tool generates those derived labels from mesh + gt pose
via the (native-accelerated) z-buffer splat renderer, writing .npz per
frame:

  python -m pose_estimation_tpu.tools.gen_labels \
      --root /path/to/lm_bop --split test --out /path/to/labels

Output schema per frame: coordinate [H,W,3] f16 (object-frame coords, 0 at
bg), region [H,W] u8 (0 bg, 1..R nearest FPS center), normal [H,W,3] f16
(camera frame), mask [H,W] bool.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="BOP dataset root")
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--cls_type", default="all")
    p.add_argument("--num_regions", type=int, default=64)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from pose_estimation_tpu.data import native
    from pose_estimation_tpu.data.linemod import LinemodBOPDataset
    from pose_estimation_tpu.data.synthetic import render_frame

    ds = LinemodBOPDataset(args.root, split=args.split,
                           cls_type=args.cls_type,
                           num_regions=args.num_regions)
    os.makedirs(args.out, exist_ok=True)
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    use_native = native.available()
    print(f"{n} frames; native splat: {use_native}")
    for i in range(n):
        sdir, im_id, oid, r, t, k = ds.index[i]
        obj = ds.objects[oid]
        h, w = 480, 640
        if use_native:
            regions = (np.argmin(((obj.points[:, None] - obj.fps_centers[
                None]) ** 2).sum(-1), -1) + 1).astype(np.int32)
            frame = native.splat_frame_native(
                obj.points, obj.normals, regions, r, t, k, h, w)
        else:
            frame = render_frame(obj, r, t, k=k, im_h=h, im_w=w)
        scene = os.path.basename(sdir)
        np.savez_compressed(
            os.path.join(args.out, f"{scene}_{im_id:06d}_{oid:02d}.npz"),
            coordinate=frame["coordinate"].astype(np.float16),
            region=frame["region"].astype(np.uint8),
            normal=frame["normal"].astype(np.float16),
            mask=frame["mask"])
        if i % 100 == 0:
            print(f"{i}/{n}")
    print("done")


if __name__ == "__main__":
    main()
