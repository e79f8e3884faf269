"""SimOTA loss + head: shapes, finiteness, assignment sanity, decode."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mafyolo_tpu.models.blocks import Head_Simota
from mafyolo_tpu.models.detect import decode_simota_eval
from mafyolo_tpu.models.losses.simota import simota_loss

pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


def _fake_outs(key, b=2, nc=4, hw=((8, 8), (4, 4), (2, 2))):
    outs = []
    keys = jax.random.split(key, len(hw) * 3)
    for i, (h, w) in enumerate(hw):
        cls = jax.random.normal(keys[3 * i], (b, h, w, nc)) - 2.0
        reg = jax.random.normal(keys[3 * i + 1], (b, h, w, 4)) * 0.3
        obj = jax.random.normal(keys[3 * i + 2], (b, h, w, 1)) - 2.0
        outs.append((cls, reg, obj))
    return outs


def test_head_simota_shapes():
    m = Head_Simota(cin=16, cout=16, nc=4)
    x = jnp.zeros((2, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    cls, reg, obj = m.apply(v, x, train=False)
    assert cls.shape == (2, 8, 8, 4)
    assert reg.shape == (2, 8, 8, 4)
    assert obj.shape == (2, 8, 8, 1)
    # prior bias on cls/obj
    np.testing.assert_allclose(
        float(jax.nn.sigmoid(v["params"]["cls_pred"]["bias"][0])), 0.01, rtol=1e-3)


def test_simota_loss_runs_and_assigns():
    outs = _fake_outs(jax.random.PRNGKey(0))
    targets = np.zeros((2, 5, 5), np.float32)
    targets[:, :, 0] = -1
    targets[0, 0] = [1, 0.5, 0.5, 0.5, 0.5]
    targets[1, 0] = [2, 0.25, 0.25, 0.3, 0.3]
    total, comps = simota_loss(outs, jnp.array(targets), num_classes=4,
                               img_size=64)
    assert np.isfinite(float(total)) and float(total) > 0
    for k in ("iou", "l1", "obj", "cls"):
        assert np.isfinite(float(comps[k])), k

    # empty batch: finite, obj-only signal
    empty = np.zeros((2, 5, 5), np.float32)
    empty[:, :, 0] = -1
    t2, c2 = simota_loss(outs, jnp.array(empty), num_classes=4, img_size=64)
    assert np.isfinite(float(t2))
    assert float(c2["iou"]) == 0.0


def test_simota_loss_gradients():
    outs = _fake_outs(jax.random.PRNGKey(1))
    targets = np.zeros((1, 3, 5), np.float32)
    targets[:, :, 0] = -1
    targets[0, 0] = [0, 0.5, 0.5, 0.6, 0.6]
    flat, tree = jax.tree_util.tree_flatten([o for lvl in outs for o in lvl])

    def loss_of(leaves):
        lvls = jax.tree_util.tree_unflatten(tree, leaves)
        outs2 = [tuple(lvls[3 * i:3 * i + 3]) for i in range(3)]
        outs2 = [tuple(x[:1] for x in lvl) for lvl in outs2]
        t, _ = simota_loss(outs2, jnp.array(targets), num_classes=4, img_size=64)
        return t

    grads = jax.grad(loss_of)(flat)
    g = sum(float(jnp.abs(x).sum()) for x in grads)
    assert np.isfinite(g) and g > 0


def test_simota_eval_decode():
    outs = _fake_outs(jax.random.PRNGKey(2))
    dec = decode_simota_eval(outs, (8, 16, 32))
    assert dec.shape == (2, 84, 9)
    assert float(dec[..., 4].max()) <= 1.0  # sigmoided obj
    assert float(dec[..., 2:4].min()) > 0   # exp wh positive
