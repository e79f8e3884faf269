"""Custom-VJP depthwise conv: forward + gradients match XLA autodiff."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafyolo_tpu.ops.dwconv import dw_conv

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


def _ref(x, k, pad, dilation):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)], rhs_dilation=(dilation, dilation),
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,dilation", [(3, 1), (5, 1), (9, 1), (3, 2), (5, 3)])
def test_dwconv_forward_and_grads(rng, k, dilation):
    b, h, w, c = 2, 16, 16, 8
    pad = (dilation * (k - 1) + 1) // 2
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.3, (k, k, 1, c)).astype(np.float32))

    np.testing.assert_allclose(np.asarray(dw_conv(x, kern, pad, dilation)),
                               np.asarray(_ref(x, kern, pad, dilation)),
                               rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.normal(0, 1, dw_conv(x, kern, pad, dilation).shape)
                    .astype(np.float32))

    def loss_custom(x_, k_):
        return jnp.sum(dw_conv(x_, k_, pad, dilation) * g)

    def loss_ref(x_, k_):
        return jnp.sum(_ref(x_, k_, pad, dilation) * g)

    dx_c, dk_c = jax.grad(loss_custom, argnums=(0, 1))(x, kern)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)
