"""Per-region size statistics for choosing `data.num_regions`.

Rebuild of tools/script/region_radius.py (the reference's dev script that
measures "the size of each region patch" from the model plys): for each
object, assign every surface point to its nearest FPS center and report
the per-region radius (max point-to-center distance) and population —
large max radii mean too few regions for the region-classification head
to localize coordinates well.

Usage:
  python -m pose_estimation_tpu.tools.region_stats --synthetic
  python -m pose_estimation_tpu.tools.region_stats \
      --dataset_root data/lm --dataset linemod [--num_regions 64]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def region_stats(points: np.ndarray, centers: np.ndarray) -> dict:
    """points [M,3], centers [R,3] -> radius/population stats per region."""
    d2 = ((points[:, None] - centers[None]) ** 2).sum(-1)   # [M, R]
    owner = d2.argmin(-1)
    radii, pops = [], []
    for r in range(len(centers)):
        sel = owner == r
        pops.append(int(sel.sum()))
        radii.append(float(np.sqrt(d2[sel, r].max())) if sel.any() else 0.0)
    radii = np.array(radii)
    return {
        "num_regions": len(centers),
        "radius_mean": round(float(radii.mean()), 5),
        "radius_max": round(float(radii.max()), 5),
        "population_min": int(min(pops)),
        "population_max": int(max(pops)),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dataset", default="linemod")
    p.add_argument("--dataset_root", default="data/lm")
    p.add_argument("--num_regions", type=int, default=64)
    args = p.parse_args(argv)

    if args.synthetic:
        from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
        ds = SyntheticPoseDataset(num_objects=4, frames_per_object=1,
                                  num_regions=args.num_regions)
        objs = {f"syn_{i}": o for i, o in enumerate(ds.objects)}
    else:
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        ds = LinemodBOPDataset(args.dataset_root, split="test",
                               cls_type="all",
                               num_regions=args.num_regions)
        objs = {str(k): v for k, v in ds.objects.items()}

    out = {}
    for name, obj in objs.items():
        out[name] = region_stats(np.asarray(obj.points[:5000]),
                                 np.asarray(obj.fps_centers))
        out[name]["diameter"] = round(float(obj.diameter), 5)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    main()
