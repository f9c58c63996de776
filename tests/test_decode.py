"""Region-decoded coordinate reconstruction tests (models/decode.py)."""

import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.models.decode import (
    decode_xyz_hard, decode_xyz_soft, mask_argmax)


def test_hard_decoding_picks_argmax_center(rng):
    b, h, r = 1, 4, 5
    centers = jnp.asarray(rng.randn(b, r, 3).astype(np.float32))
    logits = jnp.zeros((b, h, h, r)).at[..., 2].set(10.0)
    off = jnp.zeros((b, h, h, 3))
    out = decode_xyz_hard(off, logits, centers)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), np.asarray(centers[0, 2]), atol=1e-6)


def test_soft_equals_hard_at_high_confidence(rng):
    b, h, r = 1, 4, 5
    centers = jnp.asarray(rng.randn(b, r, 3).astype(np.float32))
    logits = jnp.zeros((b, h, h, r)).at[..., 3].set(100.0)
    off = jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)) * 0.01
    soft = decode_xyz_soft(off, logits, centers)
    hard = decode_xyz_hard(off, logits, centers)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=1e-4)


def test_soft_reference_mean_variant(rng):
    """The reference's get_xyz divides the expectation by the region count
    (loss_utils.py:28) — reference_mean=True reproduces that."""
    b, h, r = 1, 2, 4
    centers = jnp.ones((b, r, 3))
    logits = jnp.zeros((b, h, h, r))
    off = jnp.zeros((b, h, h, 3))
    full = decode_xyz_soft(off, logits, centers)
    ref = decode_xyz_soft(off, logits, centers, reference_mean=True)
    np.testing.assert_allclose(np.asarray(full), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref), 1.0 / r, atol=1e-6)


def test_mask_argmax(rng):
    logits = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(5.0)
    m = mask_argmax(logits)
    np.testing.assert_array_equal(np.asarray(m), 1)


def test_offset_label_roundtrips_through_region_decode(key):
    """The xyz_offset_decode convention end-to-end (data conventions, not
    the model): offset label = xyz - region_points[gt_region] (train_step),
    and absolute = offset + region_points[argmax] at chosen pixels
    (eval _model_fwd). With a perfect region prediction the roundtrip must
    reproduce the absolute xyz label exactly."""
    import jax
    from pose_estimation_tpu.data.batching import make_batch
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(num_objects=1, frames_per_object=1,
                              im_h=120, im_w=160, num_regions=8)
    batch = make_batch(ds, [0], key, crop_size=48, num_points=64)
    region = batch["region"]                          # [1,S,S] gt labels
    rp = batch["region_points"]                       # [1,R+1,3]
    assert rp.shape[1] == 9

    onehot = jax.nn.one_hot(region, rp.shape[1], dtype=batch["xyz"].dtype)
    base = jnp.einsum("bhwr,brc->bhwc", onehot, rp)
    offset = jnp.where(batch["valid"][..., None], batch["xyz"] - base, 0.0)

    # eval side: gather offset + argmax base at chosen pixels
    b, s, _ = region.shape
    choose = batch["choose"]
    off_emb = jnp.take_along_axis(offset.reshape(b, s * s, 3),
                                  choose[..., None], axis=1)
    reg_emb = jnp.take_along_axis(region.reshape(b, s * s),
                                  choose, axis=1)
    base_emb = jnp.take_along_axis(rp, reg_emb[..., None], axis=1)
    decoded = off_emb + base_emb

    xyz_emb = jnp.take_along_axis(batch["xyz"].reshape(b, s * s, 3),
                                  choose[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(xyz_emb),
                               atol=1e-6)
