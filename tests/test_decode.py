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
