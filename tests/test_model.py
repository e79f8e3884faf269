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
