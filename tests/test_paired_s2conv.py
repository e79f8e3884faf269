"""Parity of the W-paired stride-2 3x3 conv fast path vs direct lowering.

ADVICE r3: the paired path in _RawConv (models/blocks.py) only activates at
H,W >= 80, while the rest of the suite tests at <= 64px, so it was never
covered. This pins it against lax.conv_general_dilated's direct lowering in
fp32 at activating shapes, including an odd-H/even-W case.

Note (ADVICE r3 #2): the paired lowering contracts 2C-deep over a [3,2]
window instead of C-deep over [3,3], so bf16 results can differ in the last
bit from the direct lowering; comparisons here are fp32 allclose, not exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models.blocks import _RawConv


def _direct(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("shape", [(1, 160, 160, 18), (2, 81, 80, 8),
                                   (1, 80, 96, 3)])
def test_paired_stride2_matches_direct(shape):
    b, h, w, cin = shape
    cout = 24
    conv = _RawConv(cin=cin, cout=cout, k=3, stride=2, groups=1, dilation=1,
                    pad=1, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)
    # Non-trivial weights: torch init is already random; randomize bias too
    variables = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.1),
                              jnp.float32), variables)

    got = conv.apply(variables, x)
    want = _direct(x, variables["params"]["kernel"],
                   variables["params"]["bias"])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_paired_path_not_taken_below_threshold():
    """At <80px the guard must fall through to the direct lowering (the
    paired reshape only wins at larger spatial sizes; tools/profile_s2conv)."""
    conv = _RawConv(cin=4, cout=8, k=3, stride=2, groups=1, dilation=1,
                    pad=1, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 64, 4)).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)
    got = conv.apply(variables, x)
    want = _direct(x, variables["params"]["kernel"],
                   variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_paired_train_module_matches_direct_conv():
    """_PairedS2Conv (the MAFYOLO_PAIRED_TRAIN train-form cell, default-off,
    measured-and-rejected round 5) == direct 3x3/s2 conv, f32 exact."""
    import jax
    import jax.numpy as jnp

    from mafyolo_tpu.models.blocks import _PairedS2Conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 24)).astype(np.float32))
    mod = _PairedS2Conv(cout=48, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    want = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-5)
