"""Device-side preprocessing: full RGB-D frame -> model-ready crop sample.

Replaces the host-side per-sample numpy of the reference's `_load_data` /
`_load_resize_data` (dataset/linemod/batchdataset.py:603-771, 339-601) with
one jit-compiled, vmap-able program:

  mask -> square bbox -> warp-crop to a STATIC size -> valid-pixel `choose`
  sampling (fixed N, wrap-padded) -> depth backprojection at chosen pixels
  -> normalized xyz/region/normal label maps.

Static-shape deltas vs the reference (SURVEY.md section 7.3.2):
- crops warp to a canonical size (cfg.data.input_size) instead of variable
  native-size crops with width-bucketed collation (torch_utils.py:96-110) —
  one compiled program, no retracing;
- `choose` is exactly num_points via masked top-k with wrap padding, the
  fixed-shape analog of batchdataset.py:673-687;
- all label derivation (xyz normalize by extent/lf_border, valid-mask
  intersection mask∧coord∧depth — batchdataset.py:667-694) happens on
  device in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.geometry.warp import (
    bilinear_sample, crop_affine_coords, nearest_sample)


def square_bbox_from_mask(mask: jax.Array, pad: float = 1.2,
                          min_size: float = 40.0):
    """[H, W] mask -> (center [2], side). Branch-free reductions.

    The reference quantizes to a 40-px border_list (batchdataset.py:823,
    890-961) because its crops keep native resolution; with warp-to-static
    crops the side can stay continuous.
    """
    h, w = mask.shape
    rows = jnp.any(mask > 0, axis=1)
    cols = jnp.any(mask > 0, axis=0)
    rmin = jnp.argmax(rows)
    rmax = h - 1 - jnp.argmax(rows[::-1])
    cmin = jnp.argmax(cols)
    cmax = w - 1 - jnp.argmax(cols[::-1])
    center = jnp.stack([(cmin + cmax) * 0.5, (rmin + rmax) * 0.5]
                       ).astype(jnp.float32)
    side = jnp.maximum(jnp.maximum(rmax - rmin, cmax - cmin) * pad, min_size)
    return center, side.astype(jnp.float32)


def choose_valid_pixels(key: jax.Array, valid: jax.Array, num: int):
    """Random sample of exactly `num` flat indices of valid pixels, wrap-
    padded when fewer are valid (batchdataset.py:673-687 semantics).

    valid: [S, S] bool. Returns (choose [num] int32, count scalar).
    """
    flat = valid.reshape(-1)
    u = jax.random.uniform(key, flat.shape)
    priority = jnp.where(flat, 1.0 + u, u)  # valid pixels always outrank
    _, idx = jax.lax.top_k(priority, num)
    count = flat.sum().astype(jnp.int32)
    pos = jnp.arange(num)
    wrapped = idx[pos % jnp.maximum(count, 1)]
    choose = jnp.where(pos < count, idx, wrapped)
    return choose.astype(jnp.int32), count


@functools.partial(jax.jit, static_argnames=("crop_size", "num_points"))
def prepare_sample(key: jax.Array, frame: dict, lf_border: jax.Array,
                   extent: jax.Array, crop_size: int = 128,
                   num_points: int = 1024):
    """Single frame dict (full-res jnp arrays) -> model-input sample dict.

    frame keys: rgb [H,W,3], depth [H,W], mask [H,W], coordinate [H,W,3],
    normal [H,W,3], region [H,W] int, k [3,3]; optional det_center [2] /
    det_side (detection bbox override: eval crops from yolov3 boxes,
    lm_bop.py:100-101,170, instead of the gt mask — gt-mask eval crops
    silently inflate accuracy).
    """
    if "det_center" in frame:
        center = frame["det_center"].astype(jnp.float32)
        side = frame["det_side"].astype(jnp.float32)
    else:
        center, side = square_bbox_from_mask(frame["mask"])
    coords = crop_affine_coords(center, side, (crop_size, crop_size))

    rgb = bilinear_sample(frame["rgb"], coords)
    depth = nearest_sample(frame["depth"], coords)
    coordinate = nearest_sample(frame["coordinate"], coords)
    normal = nearest_sample(frame["normal"], coords)
    region = nearest_sample(frame["region"].astype(jnp.float32),
                            coords).astype(jnp.int32)
    mask = nearest_sample(frame["mask"].astype(jnp.float32), coords) > 0.5

    valid = mask & (depth > 0) & jnp.any(coordinate != 0, axis=-1)
    choose, count = choose_valid_pixels(key, valid, num_points)

    # Backprojection uses ORIGINAL image pixel coords of each crop pixel
    # (batchdataset.py:714-721 via xmap/ymap) — i.e. the warp grid itself.
    xy_src = coords.reshape(-1, 2)
    xy_choosed = jnp.take(xy_src, choose, axis=0)         # [N, 2]
    d_choosed = jnp.take(depth.reshape(-1), choose)       # [N]
    k = frame["k"]
    px = (xy_choosed[:, 0] - k[0, 2]) * d_choosed / k[0, 0]
    py = (xy_choosed[:, 1] - k[1, 2]) * d_choosed / k[1, 1]
    cloud = jnp.stack([px, py, d_choosed], axis=-1)

    xyz = (coordinate - lf_border) / extent
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    normal = jnp.where(valid[..., None], normal, 0.0)
    region = jnp.where(valid, region, 0)

    return {
        "img": rgb,                    # [S, S, 3]
        "cloud": cloud,                # [N, 3]
        "choose": choose,              # [N]
        "choose_count": count,
        "xyz": xyz,                    # [S, S, 3] normalized label
        "normal": normal,              # [S, S, 3]
        "region": region,              # [S, S]
        "valid": valid,                # [S, S]
        "xy_choosed": xy_choosed,      # [N, 2] pixel coords (for PnP)
        "bbox_center": center,
        "bbox_side": side,
    }


def denormalize_xyz(xyz_norm: jax.Array, lf_border: jax.Array,
                    extent: jax.Array) -> jax.Array:
    """Inverse of the label normalization (tools/trainer.py:415-419):
    model coords = xyz * extent + lf_border. Shapes broadcast
    ([..., 3] * [3] + [3] or batched [B,...,3] with [B,3])."""
    if lf_border.ndim == 2:
        shape = lf_border.shape[:1] + (1,) * (xyz_norm.ndim - 2) + (3,)
        lf_border = lf_border.reshape(shape)
        extent = extent.reshape(shape)
    return xyz_norm * extent + lf_border
