"""Pallas stem conv: numerical parity vs lax.conv (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafyolo_tpu.ops.stem_pallas import planar_to_nhwc, stem_conv_s2

pytestmark = pytest.mark.slow  # pallas interpret mode is slow on CPU


def _reference(x_u8, kernel, bias):
    x = x_u8[..., ::-1].astype(jnp.float32) / 255.0
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, jnp.float32), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + jnp.asarray(bias, jnp.float32), 0.0)


def test_stem_conv_matches_lax(rng):
    b, h, w, o = 2, 32, 48, 24
    x = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    k = rng.normal(0, 0.2, (3, 3, 3, o)).astype(np.float32)
    bias = rng.normal(0, 0.5, (o,)).astype(np.float32)
    ref = np.asarray(_reference(jnp.asarray(x), k, bias))
    got = planar_to_nhwc(stem_conv_s2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(bias), dtype=jnp.float32,
                                      interpret=True))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_stem_conv_edges(rng):
    """Border columns/rows (the rolled/masked taps) match exactly too."""
    b, h, w, o = 1, 16, 16, 8
    x = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    k = rng.normal(0, 0.2, (3, 3, 3, o)).astype(np.float32)
    bias = np.zeros((o,), np.float32)
    ref = np.asarray(_reference(jnp.asarray(x), k, bias))
    got = np.asarray(planar_to_nhwc(stem_conv_s2(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
        dtype=jnp.float32, interpret=True)))
    np.testing.assert_allclose(got[:, 0, :, :], ref[:, 0, :, :],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[:, :, 0, :], ref[:, :, 0, :],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[:, -1, -1, :], ref[:, -1, -1, :],
                               rtol=1e-4, atol=1e-4)
