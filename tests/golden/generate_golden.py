"""Generator for the FROZEN golden mini-datasets under tests/golden/.

The reader tests normally run against trees produced fresh by
data/testing.py — which means a parser regression can hide behind a
matching change in the tree writer. The golden trees are committed
BYTES in the real formats, carrying the real-file quirks the reference
corpus has (VERDICT r4 missing #3):

  bop/        BOP layout (lm_bop.py:117-190): per-image depth_scale
              variants (1.0 and 0.1), one jpg-only rgb frame, and one
              frame whose scene_gt entry lists TWO object instances.
  classic/    preprocessed layout (batchdataset.py:193-262): gt.yml
              whose per-frame lists carry decoy entries for OTHER
              objects ahead of the right one (the multi-object scene-02
              shape, batchdataset.py:230-236), 3-channel mask pngs,
              segnet eval masks.
  cleargrasp/ transparent layout (cleargrasp/dataset.py:204-341):
              jpg rgb, EXR depth/normals/variant-masks written with
              three different compressions (ZIP/ZIPS/NONE), a
              variant-mask instance with no pose entry (must be
              skipped), json world poses in the blender frame.

expected.json freezes the ground-truth poses and key scalars; the tests
assert the READERS reproduce them from the committed bytes alone.

Run `python tests/golden/generate_golden.py` only to REGENERATE the
fixtures after a deliberate format change — then re-freeze expected.json
and recommit everything together.
"""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def mat_to_quat_wxyz(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w,x,y,z), w >= 0."""
    m = np.asarray(r, np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + m[i, i] - m[j, j] - m[k, k]) * 2
        q = np.empty(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def main():
    import cv2
    import yaml

    from pose_estimation_tpu.data.exr import write_exr
    from pose_estimation_tpu.data.linemod import LINEMOD_K
    from pose_estimation_tpu.data.synthetic import (
        make_object, random_pose, render_frame)
    from pose_estimation_tpu.data.testing import BOP_K, write_ply

    im_h, im_w = 240, 320
    expected = {"bop": {}, "classic": {}, "cleargrasp": {}}

    # ---------------- BOP tree ----------------
    root = os.path.join(HERE, "bop")
    objs = [make_object(100 + i, num_surface=4000, num_regions=16)
            for i in range(2)]
    models_dir = os.path.join(root, "models")
    os.makedirs(models_dir, exist_ok=True)
    info = {}
    rng = np.random.RandomState(0)
    for i, obj in enumerate(objs):
        sel = rng.choice(len(obj.points), 1500, replace=False)
        write_ply(os.path.join(models_dir, f"obj_{i + 1:06d}.ply"),
                  obj.points[sel] * 1000.0, obj.normals[sel])
        mp = obj.model_points
        d2 = ((mp[:, None] - mp[None]) ** 2).sum(-1)
        info[str(i + 1)] = {
            "diameter": float(np.sqrt(d2.max())) * 1000.0,
            "min_x": float(obj.lf_border[0]) * 1000.0,
            "min_y": float(obj.lf_border[1]) * 1000.0,
            "min_z": float(obj.lf_border[2]) * 1000.0,
            "size_x": float(obj.extent[0]) * 1000.0,
            "size_y": float(obj.extent[1]) * 1000.0,
            "size_z": float(obj.extent[2]) * 1000.0}
    with open(os.path.join(models_dir, "models_info.json"), "w") as f:
        json.dump(info, f)

    sdir = os.path.join(root, "test", "000001")
    for sub in ("rgb", "depth"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    # im 0: obj1, depth_scale 1.0, png. im 1: obj2, depth_scale 0.1,
    # JPG-ONLY rgb. im 2: obj1 AND obj2 composited, depth_scale 1.0.
    frames = []
    for im_id, spec in enumerate([((0,), 1.0, "png"),
                                  ((1,), 0.1, "jpg"),
                                  ((0, 1), 1.0, "png")]):
        ois, dscale, ext = spec
        rgb = np.zeros((im_h, im_w, 3), np.float32)
        depth = np.zeros((im_h, im_w), np.float32)
        gt_list = []
        for oi in ois:
            frng = np.random.RandomState(1000 + 10 * im_id + oi)
            r, t = random_pose(frng)
            fr = render_frame(objs[oi], r, t, k=BOP_K,
                              im_h=im_h, im_w=im_w, rng=frng)
            # nearest-depth composite (multi-instance frames)
            win = fr["mask"] & ((depth == 0) | (fr["depth"] < depth))
            rgb = np.where(win[..., None], fr["rgb"], rgb)
            depth = np.where(win, fr["depth"], depth)
            gt_list.append({
                "obj_id": oi + 1,
                "cam_R_m2c": [float(x) for x in r.reshape(-1)],
                "cam_t_m2c": [float(x) for x in t * 1000.0]})
            expected["bop"][f"{im_id}/{oi + 1}"] = {
                "r": np.asarray(r, np.float64).reshape(-1).tolist(),
                "t": np.asarray(t, np.float64).tolist(),
                "depth_scale": dscale}
        bg = np.random.RandomState(50 + im_id).rand(
            im_h, im_w, 3).astype(np.float32) * 0.2
        rgb = np.where((depth > 0)[..., None], rgb, bg)
        rgb8 = cv2.cvtColor((np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                            cv2.COLOR_RGB2BGR)
        if ext == "jpg":
            cv2.imwrite(os.path.join(sdir, "rgb", f"{im_id:06d}.jpg"),
                        rgb8, [cv2.IMWRITE_JPEG_QUALITY, 92])
        else:
            cv2.imwrite(os.path.join(sdir, "rgb", f"{im_id:06d}.png"), rgb8)
        d16 = np.round(depth * 1000.0 / dscale).astype(np.uint16)
        cv2.imwrite(os.path.join(sdir, "depth", f"{im_id:06d}.png"), d16)
        frames.append((gt_list, dscale))
    with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
        json.dump({str(i): g for i, (g, _) in enumerate(frames)}, f)
    with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
        json.dump({str(i): {"cam_K": [float(x)
                                      for x in BOP_K.reshape(-1)],
                            "depth_scale": ds}
                   for i, (_, ds) in enumerate(frames)}, f)

    # ---------------- classic tree ----------------
    root = os.path.join(HERE, "classic")
    obj = make_object(200, num_surface=4000, num_regions=16)
    models_dir = os.path.join(root, "models")
    os.makedirs(models_dir, exist_ok=True)
    sel = np.random.RandomState(1).choice(len(obj.points), 1500,
                                          replace=False)
    write_ply(os.path.join(models_dir, "obj_01.ply"),
              obj.points[sel] * 1000.0, obj.normals[sel])
    mp = obj.model_points
    d2 = ((mp[:, None] - mp[None]) ** 2).sum(-1)
    with open(os.path.join(models_dir, "models_info.yml"), "w") as f:
        yaml.safe_dump({1: {"diameter": float(np.sqrt(d2.max())) * 1000.0,
                            "min_x": float(obj.lf_border[0]) * 1000.0,
                            "min_y": float(obj.lf_border[1]) * 1000.0,
                            "min_z": float(obj.lf_border[2]) * 1000.0,
                            "size_x": float(obj.extent[0]) * 1000.0,
                            "size_y": float(obj.extent[1]) * 1000.0,
                            "size_z": float(obj.extent[2]) * 1000.0}}, f)

    k = LINEMOD_K.copy()
    k[0] *= im_w / 640.0
    k[1] *= im_h / 480.0
    cls_root = os.path.join(root, "data", "01")
    for sub in ("rgb", "depth", "mask"):
        os.makedirs(os.path.join(cls_root, sub), exist_ok=True)
    seg_dir = os.path.join(root, "segnet_results", "01_label")
    os.makedirs(seg_dir, exist_ok=True)
    gt = {}
    decoy_rng = np.random.RandomState(77)
    for fi in range(2):
        frng = np.random.RandomState(2000 + fi)
        r, t = random_pose(frng)
        fr = render_frame(obj, r, t, k=k, im_h=im_h, im_w=im_w, rng=frng)
        rgb8 = (np.clip(fr["rgb"], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(cls_root, "rgb", f"{fi:04d}.png"),
                    cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(cls_root, "depth", f"{fi:04d}.png"),
                    np.round(fr["depth"] * 1000.0).astype(np.uint16))
        m255 = fr["mask"].astype(np.uint8) * 255
        cv2.imwrite(os.path.join(cls_root, "mask", f"{fi:04d}.png"),
                    np.stack([m255] * 3, -1))      # 3-channel, like LM
        cv2.imwrite(os.path.join(seg_dir, f"{fi:04d}_label.png"), m255)
        rows, cols = np.any(fr["mask"], 1), np.any(fr["mask"], 0)
        rmin, rmax = np.where(rows)[0][[0, -1]]
        cmin, cmax = np.where(cols)[0][[0, -1]]
        # the multi-object gt.yml shape: decoy entries for other objects
        # FIRST — the reader must select by obj_id (batchdataset.py:230-236)
        dr, dt = random_pose(decoy_rng)
        gt[fi] = [
            {"obj_id": 5,
             "cam_R_m2c": [float(x) for x in dr.reshape(-1)],
             "cam_t_m2c": [float(x) for x in dt * 1000.0],
             "obj_bb": [1, 1, 20, 20]},
            {"obj_id": 1,
             "cam_R_m2c": [float(x) for x in r.reshape(-1)],
             "cam_t_m2c": [float(x) for x in t * 1000.0],
             "obj_bb": [int(cmin), int(rmin),
                        int(cmax - cmin), int(rmax - rmin)]},
        ]
        expected["classic"][str(fi)] = {
            "r": np.asarray(r, np.float64).reshape(-1).tolist(),
            "t": np.asarray(t, np.float64).tolist(),
            "decoy_t": np.asarray(dt, np.float64).tolist()}
    with open(os.path.join(cls_root, "gt.yml"), "w") as f:
        yaml.safe_dump(gt, f)
    with open(os.path.join(cls_root, "train.txt"), "w") as f:
        f.write("0000\n")
    with open(os.path.join(cls_root, "test.txt"), "w") as f:
        f.write("0001\n")

    # ---------------- cleargrasp tree ----------------
    root = os.path.join(HERE, "cleargrasp")
    name = "cup-with-waves"
    obj = make_object(300, num_surface=4000, num_regions=16, radius=0.08)
    models_dir = os.path.join(root, "models")
    os.makedirs(models_dir, exist_ok=True)
    sel = np.random.RandomState(2).choice(len(obj.points), 1200,
                                          replace=False)
    with open(os.path.join(models_dir, f"{name}.obj"), "w") as f:
        for p in obj.points[sel]:          # meters; vertex-only mesh
            f.write(f"v {p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")

    cg_h, cg_w = 240, 320
    fov_x = 1.2112
    fx = cg_w / (2.0 * np.tan(fov_x / 2.0))
    k_cg = np.array([[fx, 0, cg_w / 2.0], [0, fx, cg_h / 2.0], [0, 0, 1]],
                    np.float32)
    odir = os.path.join(root, f"{name}-train")
    for sub in ("rgb-imgs", "depth-imgs-rectified", "camera-normals",
                "variant-masks", "json-files"):
        os.makedirs(os.path.join(odir, sub), exist_ok=True)
    flip = np.diag([1.0, -1.0, -1.0])
    for fi in range(2):
        frng = np.random.RandomState(3000 + fi)
        r, t = random_pose(frng)
        fr = render_frame(obj, r, t, k=k_cg, im_h=cg_h, im_w=cg_w,
                          rng=frng)
        stem = f"{fi:06d}"
        rgb8 = cv2.cvtColor(
            (np.clip(fr["rgb"], 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(odir, "rgb-imgs", f"{stem}-rgb.jpg"),
                    rgb8, [cv2.IMWRITE_JPEG_QUALITY, 92])
        # three compressions across the three EXR kinds (all must decode)
        write_exr(os.path.join(odir, "depth-imgs-rectified",
                               f"{stem}-depth-rectified.exr"),
                  np.repeat(fr["depth"][..., None], 3, -1),
                  compression="zip")
        write_exr(os.path.join(odir, "camera-normals",
                               f"{stem}-cameraNormals.exr"),
                  fr["normal"].astype(np.float32), compression="zips")
        variant = fr["mask"].astype(np.float32)      # instance id 1
        if fi == 0:
            variant[:20, :20] = 2.0                  # pose-less instance
        write_exr(os.path.join(odir, "variant-masks",
                               f"{stem}-variantMasks.exr"),
                  np.repeat(variant[..., None], 3, -1),
                  compression="none")
        # world-frame pose json (reader: r_cv = flip @ R(q), t_cv = flip@loc)
        rw = flip @ np.asarray(r, np.float64)
        q = mat_to_quat_wxyz(rw)                     # (w,x,y,z)
        loc = (flip @ np.asarray(t, np.float64)).tolist()
        inst = {"1": {"pose": {"rotation":
                               {"quaternion": [q[1], q[2], q[3], q[0]]},
                               "location": loc}}}
        if fi == 0:
            inst["2"] = {"pose": None}               # must be skipped
        meta = {"camera": {"field_of_view": {"x_axis_rads": fov_x}},
                "image": {"width_px": cg_w, "height_px": cg_h},
                "variants": {"masks_and_poses_by_pixel_value": inst}}
        with open(os.path.join(odir, "json-files", f"{stem}-masks.json"),
                  "w") as f:
            json.dump(meta, f)
        expected["cleargrasp"][str(fi)] = {
            "r": np.asarray(r, np.float64).reshape(-1).tolist(),
            "t": np.asarray(t, np.float64).tolist()}

    with open(os.path.join(HERE, "expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("golden trees written under", HERE)


if __name__ == "__main__":
    main()
