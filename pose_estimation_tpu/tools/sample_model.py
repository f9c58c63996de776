"""Model-asset preparation: FPS-sample meshes into model points + region
centers.

Replaces tools/script/sample_model.py:33-88 (FPS mesh sampling ->
obj_XX.pkl) and the producer of dataset_config/fps_64.pkl (the per-object
64 region centers the region head classifies against). Runs the FPS on
device (core.pointops.farthest_point_sampling) — the reference runs a
python-loop FPS on CPU.

Usage:
  python -m pose_estimation_tpu.tools.sample_model \
      --models_dir data/lm/models --out data/lm/prepared \
      --num_model_points 500 --num_regions 64
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def prepare_object(ply_path: str, num_model_points: int = 500,
                   num_regions: int = 64, unit_scale: float = 1e-3):
    import jax.numpy as jnp
    from pose_estimation_tpu.core.pointops import farthest_point_sampling
    from pose_estimation_tpu.data.linemod import load_ply_points

    pts, normals = load_ply_points(ply_path, max_points=50000)
    pts = pts * unit_scale
    fps_idx = np.asarray(farthest_point_sampling(
        jnp.asarray(pts[None]), num_regions)[0])
    model_idx = np.asarray(farthest_point_sampling(
        jnp.asarray(pts[None]), num_model_points)[0])
    # 8 FPS keypoints + 8 bbox corners: the kps_orb9_fps/*_8_kps.txt +
    # corners assets lm_bop.py:180-190 loads (kps-based supervision
    # variants; regenerated rather than shipped).
    kps_idx = np.asarray(farthest_point_sampling(
        jnp.asarray(pts[None]), 8)[0])
    lf = pts.min(0)
    ext = pts.max(0) - lf
    hi = lf + ext
    corners = np.array([[x, y, z] for x in (lf[0], hi[0])
                        for y in (lf[1], hi[1])
                        for z in (lf[2], hi[2])], np.float32)
    return {
        "model_points": pts[model_idx].astype(np.float32),
        "fps_centers": pts[fps_idx].astype(np.float32),
        "kps_8": pts[kps_idx].astype(np.float32),
        "corners": corners,
        "normals": (normals[model_idx].astype(np.float32)
                    if normals is not None else None),
        "lf_border": lf.astype(np.float32),
        "extent": ext.astype(np.float32),
        "diameter": float(np.linalg.norm(ext)),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_model_points", type=int, default=500)
    p.add_argument("--num_regions", type=int, default=64)
    p.add_argument("--unit_scale", type=float, default=1e-3,
                   help="mm -> m for BOP models")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    info = {}
    for fn in sorted(os.listdir(args.models_dir)):
        if not fn.endswith(".ply"):
            continue
        obj = prepare_object(os.path.join(args.models_dir, fn),
                             args.num_model_points, args.num_regions,
                             args.unit_scale)
        name = os.path.splitext(fn)[0]
        with open(os.path.join(args.out, f"{name}.pkl"), "wb") as f:
            pickle.dump(obj, f)
        info[name] = {"diameter": obj["diameter"],
                      "extent": obj["extent"].tolist(),
                      "lf_border": obj["lf_border"].tolist()}
        print(f"{name}: {len(obj['model_points'])} pts, "
              f"diameter {obj['diameter']:.4f} m")
    with open(os.path.join(args.out, "models_info.json"), "w") as f:
        json.dump(info, f, indent=2)


if __name__ == "__main__":
    main()
