"""detection_loss integration: finite values, gradient flow, both assigner phases."""
import jax
import jax.numpy as jnp
import numpy as np

from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.losses import detection_loss


import functools


@functools.lru_cache(maxsize=2)
def _setup_cached(nc=5, img=64):
    from tests.helpers import TINY_GRAPH
    m = build_model(TINY_GRAPH, nc=nc)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, img, img, 3))
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    targets = np.full((2, 8, 5), 0.0, np.float32)
    targets[:, :, 0] = -1
    # two real boxes per image (normalized xywh)
    targets[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    targets[0, 1] = [3, 0.25, 0.25, 0.2, 0.3]
    targets[1, 0] = [0, 0.7, 0.6, 0.3, 0.2]
    return m, x, v, jnp.array(targets)


def _setup(nc=5, img=64):
    return _setup_cached(nc, img)


def test_loss_finite_both_phases():
    m, x, v, targets = _setup()
    for use_atss in (True, False):
        def loss_fn(params):
            outs = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                           x, train=False)
            total, comps = detection_loss(outs, targets, use_atss=use_atss,
                                          num_classes=5, img_size=64)
            return total, comps
        (total, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
        assert np.isfinite(float(total)) and float(total) > 0
        for k, c in comps.items():
            assert np.isfinite(float(c)), k
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0


def test_loss_wiou_threads_running_mean():
    """iou_type='wiou': loss finite, grads flow, and the running mean returned
    in comps moves off its init and feeds the next call."""
    m, x, v, targets = _setup()

    def loss_fn(params, mean):
        outs = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                       x, train=False)
        total, comps = detection_loss(outs, targets, use_atss=False,
                                      num_classes=5, img_size=64,
                                      iou_type="wiou", wiou_mean=mean)
        return total, comps

    mean = jnp.float32(1.0)
    (total, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        v["params"], mean)
    assert np.isfinite(float(total)) and float(total) > 0
    assert "wiou_mean" in comps
    m1 = float(comps["wiou_mean"])
    assert np.isfinite(m1) and m1 != 1.0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # second call continues the mean
    _, comps2 = loss_fn(v["params"], comps["wiou_mean"])
    assert float(comps2["wiou_mean"]) != m1


def test_loss_empty_batch_is_finite():
    m, x, v, _ = _setup()
    targets = jnp.full((2, 8, 5), 0.0)
    targets = targets.at[..., 0].set(-1.0)
    outs = m.apply(v, x, train=False)
    total, comps = detection_loss(outs, targets, use_atss=False,
                                  num_classes=5, img_size=64)
    assert np.isfinite(float(total))
    assert float(comps["iou"]) == 0.0 and float(comps["dfl"]) == 0.0
