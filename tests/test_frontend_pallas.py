"""Fused Pallas front-end (layers 0-2) parity vs the XLA deploy path.

Runs the kernel in interpreter mode on CPU against the folded deploy model's
own layer-0..2 forward on the same uint8 batch (the XLA path the kernel
replaces; reference semantics: RepVGGBlock deploy common.py:166-284 and the
RepHDW deploy chain common.py:898-946).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models import build_model, blocks as B
from mafyolo_tpu.models.reparam import fold_variables


@pytest.fixture(scope="module")
def folded_n():
    m = build_model("maf-yolo-n", nc=7)
    v = jax.jit(m.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return m, fold_variables(m.specs, v)


def _xla_frontend(model, folded, imgs_u8, upto: int):
    """Reference path: normalize + layers 0..upto of the deploy graph."""
    p = folded["params"]["net"]
    x = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0
    for name in ("layer0", "layer1"):
        conv = p[name]["fused"]["conv"]
        x = jax.lax.conv_general_dilated(
            x, conv["kernel"].astype(jnp.float32), window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x + conv["bias"], 0)
    if upto >= 2:
        kw = dict(model.specs[2].kwargs)
        mod = B.RepHDW(deploy=True, **kw)
        x = mod.apply({"params": p["layer2"]}, x, train=False)
    return x


def _run_kernel(model, folded, imgs, fuse_l2: bool):
    from mafyolo_tpu.ops import frontend_pallas as F
    h, w = imgs.shape[1:3]
    cfg, wts = F.frontend_build(model.specs, folded, h, w, fuse_l2=fuse_l2)
    xp = jnp.asarray(F.pack_s2d_np(np.asarray(imgs), cfg))
    y = F.frontend_forward(xp, tuple(wts), cfg, interpret=True)
    return y[:, :, :cfg.wb, :]


@pytest.mark.parametrize("fuse_l2", [False, True])
@pytest.mark.parametrize("hw", [(64, 64), (128, 64)])
def test_frontend_matches_xla(folded_n, hw, fuse_l2):
    model, folded = folded_n
    h, w = hw
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, h, w, 3), dtype=np.uint8))
    want = _xla_frontend(model, folded, imgs, upto=2 if fuse_l2 else 1)
    got = _run_kernel(model, folded, imgs, fuse_l2)
    assert got.shape == want.shape
    # kernel computes in bf16 with f32 accumulation; XLA ref here is f32
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.mean() < 0.01


def test_pack_device_matches_host(folded_n):
    from mafyolo_tpu.ops import frontend_pallas as F
    model, folded = folded_n
    imgs = np.random.default_rng(3).integers(
        0, 255, (2, 128, 64, 3), dtype=np.uint8)
    cfg, _ = F.frontend_build(model.specs, folded, 128, 64)
    host = F.pack_s2d_np(imgs, cfg)
    dev = np.asarray(F.pack_s2d(jnp.asarray(imgs), cfg))
    np.testing.assert_array_equal(host, dev)


def test_frontend_nonzero_bias(folded_n):
    """Out-of-image halo rows must act as conv zero-padding even when folded
    biases are nonzero. Fresh-init folds give exactly-zero biases (BN fold of
    zero-mean stats), which masked a relu(bias) top-halo leak into layer 1's
    dy=-1 taps in round 3; the RepHDW DW stencil halo has the same hazard on
    BOTH edges."""
    model, folded = folded_n
    rng = np.random.default_rng(7)
    folded = jax.tree.map(lambda x: x, folded)  # shallow-copy the pytree
    p = folded["params"]["net"]
    for path in (("layer0", "fused"), ("layer1", "fused"),
                 ("layer2", "cv_in"), ("layer2", "cv_out"),
                 ("layer2", "m0", "expand"), ("layer2", "m0", "dw", "fused"),
                 ("layer2", "m0", "project")):
        node = p
        for k in path:
            node = node[k]
        conv = node["conv"]
        conv["bias"] = jnp.asarray(
            rng.uniform(0.2, 1.0, conv["bias"].shape), jnp.float32)
    # 256 rows -> multiple grid bands: checks the band-0/band-last halo
    # masking and that real rows in interior bands' halo slots are NOT masked
    h, w = 256, 64
    imgs = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    want = _xla_frontend(model, folded, imgs, upto=2)
    got = _run_kernel(model, folded, imgs, fuse_l2=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_frontend_apply_full_graph(folded_n):
    """frontend_apply == full deploy model forward (same uint8 batch)."""
    from mafyolo_tpu.ops.frontend_pallas import (frontend_apply,
                                                 frontend_skip_until)
    model, folded = folded_n
    assert frontend_skip_until(model.specs, model.save) == 2
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8))

    deploy = build_model("maf-yolo-n", nc=7, deploy=True)
    x = imgs[..., ::-1].astype(jnp.float32) / 255.0
    want = deploy.apply(folded, x, train=False)

    skip = build_model("maf-yolo-n", nc=7, deploy=True, skip_until=2)
    got = frontend_apply(skip, folded, imgs, interpret=True)

    for (_, wc, wr), (_, gc, gr) in zip(want, got):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc),
                                   rtol=0.05, atol=0.02)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                                   rtol=0.05, atol=0.05)


def test_frontend_feasibility_gate(folded_n):
    """Shapes with no 128-lane-aligned band (e.g. 96px: lp=24 admits no
    divisor-of-hb row count) must be detectable WITHOUT building weights, so
    the Evaler can fall back to the XLA front-end instead of crashing
    (regression: tools/train.py eval at --img-size 96 on the real chip)."""
    from mafyolo_tpu.ops import frontend_pallas as F
    model, _ = folded_n
    assert F.frontend_feasible(F.frontend_cfg(model.specs, 640, 640))
    assert F.frontend_feasible(F.frontend_cfg(model.specs, 64, 64))
    assert not F.frontend_feasible(F.frontend_cfg(model.specs, 96, 96))
    # geometry from specs matches geometry from weights
    m, folded = folded_n
    cfg_w, _ = F.frontend_build(m.specs, folded, 64, 64, fuse_l2=True)
    assert cfg_w == F.frontend_cfg(m.specs, 64, 64, fuse_l2=True)
