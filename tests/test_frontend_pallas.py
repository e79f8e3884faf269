"""Fused Pallas front-end (layers 0-1) parity vs the XLA deploy path.

Runs the kernel in interpreter mode on CPU against the folded deploy model's
own layer-0+layer-1 forward on the same uint8 batch (the XLA path the kernel
replaces; reference semantics RepVGGBlock deploy, common.py:166-284).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.reparam import fold_variables


@pytest.fixture(scope="module")
def folded_n():
    m = build_model("maf-yolo-n", nc=7)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return m, fold_variables(m.specs, v)


def _xla_l01(folded, imgs_u8, dtype):
    """Reference path: normalize + layer0 + layer1 of the deploy graph."""
    from mafyolo_tpu.models import blocks as B
    p = folded["params"]["net"]
    x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
    s = {}
    for name, (cin, cout) in (("layer0", (3, None)), ("layer1", (None, None))):
        conv = p[name]["fused"]["conv"]
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), conv["kernel"].astype(dtype),
            window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x + conv["bias"].astype(dtype), 0)
    return x


@pytest.mark.parametrize("hw", [(64, 64), (128, 64)])
def test_frontend_matches_xla(folded_n, hw):
    from mafyolo_tpu.ops.frontend_pallas import (
        build_frontend_weights, frontend_params_from_folded, frontend_l01,
        lanepad_for, prep_s2d, unpack_nhwc)
    model, folded = folded_n
    h, w = hw
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, h, w, 3), dtype=np.uint8))

    want = _xla_l01(folded, imgs, jnp.float32)

    k0, b0, k1, b1 = frontend_params_from_folded(folded)
    wts = build_frontend_weights(k0, b0, k1, b1)
    lp = lanepad_for(w)
    y = frontend_l01(prep_s2d(imgs, lp), wts["w0"], wts["b0"], wts["w1"],
                     wts["b1"], c0=wts["c0"], c1=wts["c1"], hb=h // 4,
                     wb=w // 4, lp=lp, interpret=True)
    got = unpack_nhwc(y, h // 4, w // 4)

    assert got.shape == want.shape
    # kernel computes in bf16 with f32 accumulation; XLA ref here is f32
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
    # agreement should be tight relative to activation scale
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.mean() < 0.01


def test_frontend_nonzero_bias(folded_n):
    """Out-of-image halo rows must act as conv zero-padding even when folded
    biases are nonzero. Fresh-init folds give exactly-zero biases (BN fold of
    zero-mean stats), which masked a relu(bias) top-halo leak into layer 1's
    dy=-1 taps."""
    from mafyolo_tpu.ops.frontend_pallas import (
        build_frontend_weights, frontend_params_from_folded, frontend_l01,
        lanepad_for, prep_s2d, unpack_nhwc)
    model, folded = folded_n
    rng = np.random.default_rng(7)
    folded = jax.tree.map(lambda x: x, folded)  # shallow-copy the pytree
    for layer in ("layer0", "layer1"):
        conv = folded["params"]["net"][layer]["fused"]["conv"]
        conv["bias"] = jnp.asarray(
            rng.uniform(0.2, 1.0, conv["bias"].shape), jnp.float32)
    # 256 rows -> multiple grid bands: checks both the band-0 halo masking
    # and that real rows in later bands' halo slots are NOT masked
    h, w = 256, 64
    imgs = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))

    want = _xla_l01(folded, imgs, jnp.float32)

    k0, b0, k1, b1 = frontend_params_from_folded(folded)
    wts = build_frontend_weights(k0, b0, k1, b1)
    lp = lanepad_for(w)
    y = frontend_l01(prep_s2d(imgs, lp), wts["w0"], wts["b0"], wts["w1"],
                     wts["b1"], c0=wts["c0"], c1=wts["c1"], hb=h // 4,
                     wb=w // 4, lp=lp, interpret=True)
    got = unpack_nhwc(y, h // 4, w // 4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_frontend_apply_full_graph(folded_n):
    """frontend_apply == full deploy model forward (same uint8 batch)."""
    from mafyolo_tpu.ops.frontend_pallas import (frontend_apply,
                                                 frontend_supported)
    model, folded = folded_n
    assert frontend_supported(model.specs, model.save)
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8))

    deploy = build_model("maf-yolo-n", nc=7, deploy=True)
    x = imgs[..., ::-1].astype(jnp.float32) / 255.0
    want = deploy.apply(folded, x, train=False)

    skip = build_model("maf-yolo-n", nc=7, deploy=True, skip_until=1)
    got = frontend_apply(skip, folded, imgs, interpret=True)

    for (_, wc, wr), (_, gc, gr) in zip(want, got):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc),
                                   rtol=0.05, atol=0.02)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                                   rtol=0.05, atol=0.05)
