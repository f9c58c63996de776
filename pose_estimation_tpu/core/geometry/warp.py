"""On-device affine crop/resize (replaces the reference's OpenCV warps).

The reference preprocesses every sample on the host with
cv2.warpAffine/cv2.getAffineTransform via CenterNet-style center/scale
parametrization (lib/transform/coordinate.py:11-66, used throughout
dataset/linemod/batchdataset.py and the Cleargrasp dataset). Here the same
similarity-warp semantics are a jit-compiled gather-based bilinear sampler so
cropping runs on the TPU, batched, inside the same program as the model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_affine_coords(center: jax.Array, scale: jax.Array,
                       out_size: tuple[int, int], rot_deg: jax.Array | float = 0.0
                       ) -> jax.Array:
    """Source-pixel coordinates for each output pixel of a CenterNet-style crop.

    Maps the square src window (side `scale`, centered at `center`, rotated by
    `rot_deg`) onto an (out_h, out_w) output — the closed form of
    get_affine_transform (lib/transform/coordinate.py:25-66), which builds the
    same similarity transform from 3 point pairs via cv2.getAffineTransform.

    center: [..., 2] (cx, cy); scale: [...] or [..., 2] src-window size (uses
    the x component for the uniform scale, matching the reference where
    scale=(s, s)). Returns [..., out_h, out_w, 2] (x, y) source coords.
    """
    out_h, out_w = out_size
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == center.ndim:  # [..., 2] form
        src_w = scale[..., 0]
    else:
        src_w = scale
    rot = jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))

    # cv2.warpAffine treats integer pixel indices as coordinates, and
    # get_affine_transform puts the dst anchor at (dst_w/2, dst_h/2).
    dx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1) - out_w * 0.5
    dy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0) - out_h * 0.5

    s = src_w / float(out_w)  # uniform similarity scale dst->src
    cos_r, sin_r = jnp.cos(rot), jnp.sin(rot)
    # dst->src rotation is +rot (src_dir is dst_dir rotated by rot).
    sx = (cos_r[..., None, None] * dx - sin_r[..., None, None] * dy) if rot.ndim else (cos_r * dx - sin_r * dy)
    sy = (sin_r[..., None, None] * dx + cos_r[..., None, None] * dy) if rot.ndim else (sin_r * dx + cos_r * dy)
    s_ = s[..., None, None] if s.ndim else s
    src_x = center[..., 0:1, None] + sx * s_ if center.ndim > 1 else center[0] + sx * s_
    src_y = center[..., 1:2, None] + sy * s_ if center.ndim > 1 else center[1] + sy * s_
    return jnp.stack([src_x, src_y], axis=-1)


def bilinear_sample(img: jax.Array, coords: jax.Array,
                    fill: float = 0.0) -> jax.Array:
    """Bilinear sampling with constant out-of-bounds fill.

    img: [H, W] or [H, W, C]; coords: [..., 2] (x, y) in pixel units.
    Matches cv2.warpAffine(INTER_LINEAR, borderValue=0) semantics used at
    lib/transform/coordinate.py:21.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def fetch(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = img[yi_c, xi_c]  # advanced indexing gather
        return jnp.where(valid[..., None], vals, fill)

    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x0i + 1)
    v10 = fetch(y0i + 1, x0i)
    v11 = fetch(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    out = top * (1 - ty) + bot * ty
    return out[..., 0] if squeeze else out


def nearest_sample(img: jax.Array, coords: jax.Array, fill: float = 0.0) -> jax.Array:
    """Nearest-neighbor sampling (for masks/labels; cv2.INTER_NEAREST)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape
    xi = jnp.round(coords[..., 0]).astype(jnp.int32)
    yi = jnp.round(coords[..., 1]).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    vals = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    out = jnp.where(valid[..., None], vals, fill)
    return out[..., 0] if squeeze else out


def crop_resize(img: jax.Array, center: jax.Array, scale: jax.Array,
                out_size: int | tuple[int, int], rot_deg: float = 0.0,
                method: str = "bilinear") -> jax.Array:
    """crop_resize_by_warp_affine equivalent (lib/transform/coordinate.py:11-22).

    img: [H, W] or [H, W, C] single image (vmap for batches).
    """
    if isinstance(out_size, int):
        out_size = (out_size, out_size)
    coords = crop_affine_coords(jnp.asarray(center, jnp.float32),
                                jnp.asarray(scale, jnp.float32),
                                out_size, rot_deg)
    sampler = bilinear_sample if method == "bilinear" else nearest_sample
    return sampler(img, coords)
