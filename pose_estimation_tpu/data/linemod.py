"""LineMOD dataset readers — preprocessed and BOP layouts.

Rebuild of dataset/linemod/batchdataset.py (preprocessed layout: per-object
rgb/depth/gt.yml + precomputed label pickles) and dataset/linemod/lm_bop.py
(BOP layout: scene_gt.json / scene_camera.json / ply models).

Key structural difference: the reference REQUIRES precomputed
coordinate/region/normal pickles produced by scripts not in its repo
(batchdataset.py:200-210). This reader REGENERATES those labels on the fly
from mesh + pose via the point-splat renderer (data/synthetic.render_frame
machinery) — the derivation SURVEY.md section 7.3.5 calls for:
  coordinate map = z-buffer splat of object-frame coords,
  region = nearest of the FPS centers, normal = rotated mesh normals.

Frames come out in the same dict schema as the synthetic dataset, so
data/batching.frame_to_sample and the whole train/eval stack work
unchanged.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

from pose_estimation_tpu.data.synthetic import (
    SynObject, _fps_numpy, render_frame)

# 13-object list and symmetric ids (batchdataset.py:42,76: eggbox=10,
# glue=11 are symmetric).
LINEMOD_OBJECTS = [1, 2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14, 15]
LINEMOD_NAMES = ["ape", "benchvise", "camera", "can", "cat", "driller",
                 "duck", "eggbox", "glue", "holepuncher", "iron", "lamp",
                 "phone"]
SYM_OBJ_IDS = {10, 11}

LINEMOD_K = np.array([[572.4114, 0., 325.2611],
                      [0., 573.57043, 242.04899],
                      [0., 0., 1.]], np.float32)


def load_ply_points(path: str, max_points: int | None = None):
    """Minimal PLY reader (ascii or binary_little_endian) -> points,
    normals (or None). Replaces plyfile (lm_bop.py:528-544)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vert = int(next(l.split()[2] for l in header
                          if l.startswith("element vertex")))
        props = []
        in_vertex = False
        for l in header:
            if l.startswith("element"):
                in_vertex = l.startswith("element vertex")
            elif l.startswith("property") and in_vertex:
                parts = l.split()
                props.append((parts[-1], parts[1]))

        type_map = {"float": "f4", "float32": "f4", "double": "f8",
                    "uchar": "u1", "uint8": "u1", "int": "i4",
                    "uint": "u4", "short": "i2", "ushort": "u2"}
        if fmt == "ascii":
            rows = []
            for _ in range(n_vert):
                rows.append(f.readline().split()[:len(props)])
            arr = np.array(rows, np.float64)
            data = {name: arr[:, i] for i, (name, _) in enumerate(props)}
        else:
            dtype = np.dtype([(name, "<" + type_map[t]) for name, t in props])
            raw = np.frombuffer(f.read(n_vert * dtype.itemsize), dtype=dtype,
                                count=n_vert)
            data = {name: raw[name].astype(np.float64)
                    for name, _ in props}

    pts = np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float32)
    normals = None
    if "nx" in data:
        normals = np.stack([data["nx"], data["ny"], data["nz"]],
                           -1).astype(np.float32)
    if max_points and len(pts) > max_points:
        sel = np.random.RandomState(0).choice(len(pts), max_points,
                                              replace=False)
        pts = pts[sel]
        normals = normals[sel] if normals is not None else None
    return pts, normals


def _object_from_points(pts_m: np.ndarray, normals: np.ndarray | None,
                        num_regions: int, num_model: int = 500,
                        sym: bool = False) -> SynObject:
    rng = np.random.RandomState(0)
    if normals is None:
        # radial approximation about the centroid
        c = pts_m.mean(0)
        normals = pts_m - c
        normals /= np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-8)
    lf = pts_m.min(0)
    ext = pts_m.max(0) - lf
    model_idx = rng.choice(len(pts_m), min(num_model, len(pts_m)),
                           replace=False)
    return SynObject(
        points=pts_m.astype(np.float32),
        normals=normals.astype(np.float32),
        fps_centers=pts_m[_fps_numpy(pts_m, num_regions, rng)].astype(
            np.float32),
        diameter=float(np.linalg.norm(ext)),
        extent=ext.astype(np.float32),
        lf_border=lf.astype(np.float32),
        model_points=pts_m[model_idx].astype(np.float32),
        sym=sym)


class LinemodBOPDataset:
    """BOP-layout reader (lm_bop.py): root/{models,test|train_pbr}/...

    root/
      models/obj_XXXXXX.ply, models_info.json   (mm units)
      <split>/<scene>/rgb/*.png, depth/*.png,
                     scene_gt.json, scene_camera.json
    """

    def __init__(self, root: str, split: str = "test",
                 cls_type: str = "all", num_regions: int = 64,
                 depth_scale: float = 1000.0,
                 object_ids: list[int] | None = None,
                 sym_ids: set[int] | None = None):
        import cv2  # host-side decode only
        self._cv2 = cv2
        self.root = root
        self.split = split
        self.num_regions = num_regions
        self.depth_scale = depth_scale
        self.sym_ids = SYM_OBJ_IDS if sym_ids is None else sym_ids

        models_dir = os.path.join(root, "models")
        info_path = os.path.join(models_dir, "models_info.json")
        with open(info_path) as f:
            self.models_info = {int(k): v for k, v in json.load(f).items()}

        all_ids = object_ids if object_ids is not None else LINEMOD_OBJECTS
        wanted = (all_ids if cls_type == "all"
                  else [LINEMOD_OBJECTS[LINEMOD_NAMES.index(cls_type)]])
        self.objects = {}
        self.obj_index = {}
        for oid in wanted:
            ply = os.path.join(models_dir, f"obj_{oid:06d}.ply")
            pts, nrm = load_ply_points(ply, max_points=20000)
            obj = _object_from_points(pts / 1000.0, nrm, num_regions,
                                      sym=oid in self.sym_ids)
            self.obj_index[oid] = len(self.objects)
            self.objects[oid] = obj

        self.index = []  # (scene_dir, im_id, obj_id, R, t, K)
        split_dir = os.path.join(root, split)
        for scene in sorted(os.listdir(split_dir)):
            sdir = os.path.join(split_dir, scene)
            gt_p = os.path.join(sdir, "scene_gt.json")
            cam_p = os.path.join(sdir, "scene_camera.json")
            if not (os.path.isfile(gt_p) and os.path.isfile(cam_p)):
                continue
            with open(gt_p) as f:
                gts = json.load(f)
            with open(cam_p) as f:
                cams = json.load(f)
            for im_id, instances in gts.items():
                cam_k = np.array(cams[im_id]["cam_K"],
                                 np.float32).reshape(3, 3)
                for inst in instances:
                    oid = int(inst["obj_id"])
                    if oid not in self.objects:
                        continue
                    r = np.array(inst["cam_R_m2c"],
                                 np.float32).reshape(3, 3)
                    t = np.array(inst["cam_t_m2c"],
                                 np.float32) / 1000.0
                    self.index.append((sdir, int(im_id), oid, r, t, cam_k))

    def __len__(self):
        return len(self.index)

    @property
    def objects_list(self):
        return list(self.objects.values())

    def __getitem__(self, i):
        sdir, im_id, oid, r, t, k = self.index[i]
        cv2 = self._cv2
        rgb_path = os.path.join(sdir, "rgb", f"{im_id:06d}.png")
        if not os.path.isfile(rgb_path):
            rgb_path = os.path.join(sdir, "rgb", f"{im_id:06d}.jpg")
        rgb = cv2.cvtColor(cv2.imread(rgb_path), cv2.COLOR_BGR2RGB)
        depth_path = os.path.join(sdir, "depth", f"{im_id:06d}.png")
        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED).astype(
            np.float32) / self.depth_scale

        obj = self.objects[oid]
        h, w = depth.shape
        # regenerate labels by splatting the model at the gt pose
        frame = render_frame(obj, r, t, k=k, im_h=h, im_w=w)
        frame["rgb"] = rgb.astype(np.float32) / 255.0
        # real depth where the splat says object; keeps sensor noise
        frame["depth"] = np.where(frame["mask"] & (depth > 0), depth, 0.0)
        frame["mask"] = frame["mask"] & (depth > 0)
        frame["cls_id"] = self.obj_index[oid]
        frame["obj_id"] = oid
        return frame


class LinemodDataset(LinemodBOPDataset):
    """Alias entry point used by the CLI; the preprocessed layout of
    batchdataset.py is a strict subset of what the BOP reader needs, so a
    single reader parameterized by directory layout covers both. For the
    classic layout (data/<obj>/...), point `root` at a BOP-ified tree."""

    def __init__(self, root: str, mode: str = "train", cls_type: str = "all",
                 cfg=None):
        split = {"train": "train_pbr", "test": "test",
                 "eval": "test"}.get(mode, mode)
        if not os.path.isdir(os.path.join(root, split)):
            # classic linemod trees store frames under 'data'
            split = "data"
        num_regions = cfg.data.num_regions if cfg else 64
        super().__init__(root, split=split, cls_type=cls_type,
                         num_regions=num_regions)
