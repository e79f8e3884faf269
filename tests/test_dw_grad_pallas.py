"""Pallas DW weight-grad kernel vs autodiff of the depthwise conv."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafyolo_tpu.ops.dw_grad_pallas import dw_grad_kernel, dw_grad_supported

pytestmark = pytest.mark.slow  # pallas interpret mode


@pytest.mark.parametrize("k,dil,c,h", [(3, 1, 8, 16), (5, 1, 16, 32),
                                       (9, 1, 8, 16), (3, 5, 8, 32),
                                       (7, 2, 8, 32)])
def test_dw_grad_matches_autodiff(rng, k, dil, c, h):
    pad = (k - 1) * dil // 2
    x = jnp.asarray(rng.normal(0, 1, (2, h, h, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (2, h, h, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.3, (k, k, 1, c)).astype(np.float32))

    def f(kern):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * g)

    ref = jax.grad(f)(kern)
    assert dw_grad_supported(h, k, dil)
    got = dw_grad_kernel(x, g, k, pad, dil, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("k,dil,c,h,w", [(3, 1, 8, 16, 16), (5, 1, 16, 32, 16),
                                         (9, 1, 8, 16, 16), (3, 5, 8, 32, 32),
                                         (7, 2, 8, 32, 24),
                                         # the P5-stage shape: k=9 at 20x20
                                         # (h not a sublane multiple)
                                         (9, 1, 24, 20, 20)])
def test_dw_grad_planar_matches_autodiff(rng, k, dil, c, h, w):
    """The v2 flat-lane planar kernel (the TPU-default dkernel path)."""
    from mafyolo_tpu.ops.dw_grad_pallas import (dw_grad_planar,
                                                dw_grad_planar_supported)
    pad = (k - 1) * dil // 2
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.3, (k, k, 1, c)).astype(np.float32))

    def f(kern):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * g)

    ref = jax.grad(f)(kern)
    assert dw_grad_planar_supported(h, w, k, dil, pad)
    got = dw_grad_planar(x, g, k, pad, dil, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)
