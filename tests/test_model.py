"""Model build / forward-shape / graph-parity tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.detect import (anchor_points_for, decode_eval,
                                       flatten_train_outputs,
                                       generate_anchors_train)
from mafyolo_tpu.models.graph import parse_graph
from mafyolo_tpu.models.zoo import MODEL_ZOO

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


@pytest.mark.parametrize("name,cout_head", [("maf-yolo-n", (128, 128, 192)),
                                            ("maf-yolo-s", (192, 192, 256)),
                                            ("maf-yolo-m", (256, 384, 384))])
def test_parse_channels(name, cout_head):
    specs, save, out_frm = parse_graph(MODEL_ZOO[name], nc=80)
    heads = [s for s in specs if s.kind == "Head_DepthUni"]
    assert tuple(h.kw["cout"] for h in heads) == cout_head
    assert out_frm == (31, 32, 33)


def test_forward_shapes_and_param_count():
    m = build_model("maf-yolo-n", nc=80)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert len(outs) == 3
    hws = [(8, 8), (4, 4), (2, 2)]
    for (feat, cls, reg), hw in zip(outs, hws):
        assert cls.shape == (2, *hw, 80)
        assert reg.shape == (2, *hw, 68)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    # train-form param count (multi-branch); deploy-form folds to ~3.8M (README.md:24)
    assert 3.5e6 < n_params < 4.5e6


def test_flatten_and_decode_shapes():
    m = build_model("maf-yolo-n", nc=80)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    hw, cls, reg = flatten_train_outputs(outs)
    a = sum(h * w for h, w in hw)
    assert cls.shape == (1, a, 80) and reg.shape == (1, a, 68)
    dec = decode_eval(outs, strides=(8, 16, 32))
    assert dec.shape == (1, a, 85)
    # obj column is all ones (yolo.py:390-396)
    np.testing.assert_allclose(np.asarray(dec[..., 4]), 1.0)


def test_anchor_generation():
    hw = [(4, 4), (2, 2), (1, 1)]
    pts, stride = anchor_points_for(hw, (8, 16, 32))
    assert pts.shape == (21, 2) and stride.shape == (21, 1)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # row-major over (h, w)
    anchors, points, counts, st = generate_anchors_train(hw, (8, 16, 32))
    assert counts == [16, 4, 1]
    np.testing.assert_allclose(np.asarray(points[0]), [4.0, 4.0])  # (0.5)*8
    np.testing.assert_allclose(np.asarray(anchors[0]), [-16, -16, 24, 24])  # +-cell 20


def test_deterministic_init():
    m = build_model("maf-yolo-n", nc=3)
    x = jnp.zeros((1, 32, 32, 3))
    v1 = m.init(jax.random.PRNGKey(7), x)
    v2 = m.init(jax.random.PRNGKey(7), x)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_bn_tracks_f32_bn():
    """bf16-mode BN normalize stays within bf16 rounding of the f32 build
    (ADVICE r4 #2): flax must keep batch statistics in f32 (its
    _compute_stats contract) so only the elementwise normalize rounds.
    Catches a future flax change to stats precision or eval-mode drift."""
    from mafyolo_tpu.models import blocks as B

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 24)).astype(np.float32) * 3)
    mod16 = B.ConvBN(24, 3, act="silu", dtype=jnp.bfloat16)
    mod32f = B.ConvBN(24, 3, act="silu", dtype=jnp.float32)
    v = mod32f.init(jax.random.PRNGKey(1), x, train=False)
    outs = {}
    for train in (True, False):
        y32 = mod32f.apply(v, x, train=train,
                           mutable=["batch_stats"] if train else False)
        old = B.BN_F32
        try:
            B.BN_F32 = False
            y16 = mod16.apply(v, x.astype(jnp.bfloat16), train=train,
                              mutable=["batch_stats"] if train else False)
            B.BN_F32 = True
            y16f = mod16.apply(v, x.astype(jnp.bfloat16), train=train,
                               mutable=["batch_stats"] if train else False)
        finally:
            B.BN_F32 = old
        a = np.asarray((y32[0] if train else y32), np.float32)
        b = np.asarray((y16[0] if train else y16), np.float32)
        c = np.asarray((y16f[0] if train else y16f), np.float32)
        scale = np.abs(a).max()
        # bf16 conv already rounds; BN dtype adds at most ~2 ulp on top of
        # the f32-BN bf16 build -- assert both against the f32 reference
        assert np.abs(a - b).max() <= 0.04 * scale, np.abs(a - b).max()
        assert np.abs(a - c).max() <= 0.04 * scale, np.abs(a - c).max()
        # and the two bf16 builds agree to bf16 rounding of each other
        assert np.abs(b - c).max() <= 0.02 * scale, np.abs(b - c).max()
        # flax contract: batch stats (running stats updates) stay f32-close
        if train:
            for k in ("mean", "var"):
                s32 = np.asarray(y32[1]["batch_stats"]["bn"][k])
                s16 = np.asarray(y16[1]["batch_stats"]["bn"][k])
                np.testing.assert_allclose(s16, s32, rtol=1e-2, atol=1e-3)
