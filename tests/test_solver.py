"""Optimizer/EMA parity vs torch, plus the warmup schedule and one real train step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafyolo_tpu.solver.build import (GROUP_BIAS, GROUP_BNW, GROUP_WEIGHT,
                                      build_lr_fn, group_of, param_groups,
                                      sgd_init, sgd_update, warmup_schedule)
from mafyolo_tpu.utils.ema import ema_update


def test_sgd_matches_torch(rng):
    torch = pytest.importorskip("torch")
    w = rng.normal(0, 1, (8, 4)).astype(np.float32)
    b = rng.normal(0, 1, (8,)).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    lr, mom, wd = 0.02, 0.9, 5e-4
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, nesterov=True)
    opt.add_param_group({"params": [tb], "weight_decay": wd})
    # our layout: tw is a bias-group param (no decay), tb weight-group (decay)
    params = {"a": {"bias": jnp.array(w)}, "b": {"kernel": jnp.array(b)}}
    groups = {"a": {"bias": GROUP_BIAS}, "b": {"kernel": GROUP_WEIGHT}}
    buf = sgd_init(params)
    for step in range(4):
        gw = rng.normal(0, 1, w.shape).astype(np.float32)
        gb = rng.normal(0, 1, b.shape).astype(np.float32)
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()
        grads = {"a": {"bias": jnp.array(gw)}, "b": {"kernel": jnp.array(gb)}}
        params, buf = sgd_update(params, grads, buf, groups,
                                 (jnp.float32(lr), jnp.float32(lr),
                                  jnp.float32(lr)), jnp.float32(mom),
                                 jnp.float32(wd))
    np.testing.assert_allclose(np.asarray(params["a"]["bias"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]["kernel"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_group_classification():
    from mafyolo_tpu.models import build_model
    m = build_model("maf-yolo-n", nc=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    groups = param_groups(v["params"])
    flat = jax.tree_util.tree_flatten_with_path(groups)[0]
    kinds = {GROUP_BNW: 0, GROUP_WEIGHT: 0, GROUP_BIAS: 0}
    for path, g in flat:
        kinds[g] += 1
        name = str(path[-1].key)
        if name == "scale":
            assert g == GROUP_BNW
        elif name == "bias":
            assert g == GROUP_BIAS
        else:
            assert g == GROUP_WEIGHT
    assert all(v > 0 for v in kinds.values())


def test_warmup_schedule_interp():
    lf = build_lr_fn("linear", 0.01, 300)
    s = warmup_schedule(0, 1000, 0, lf, 0.01, 32, warmup_bias_lr=0.1,
                        warmup_momentum=0.8, momentum=0.937)
    assert s["lr_weight"] == 0.0 and np.isclose(s["lr_bias"], 0.1)
    assert np.isclose(s["momentum"], 0.8) and s["accumulate"] == 1
    mid = warmup_schedule(500, 1000, 0, lf, 0.01, 32, 0.1, 0.8, 0.937)
    assert 0 < mid["lr_weight"] < 0.01 and 0.8 < mid["momentum"] < 0.937
    after = warmup_schedule(2000, 1000, 10, lf, 0.01, 32, 0.1, 0.8, 0.937)
    assert np.isclose(after["lr_weight"], 0.01 * lf(10))
    assert after["accumulate"] == 2  # round(64/32)


def test_ema_formula():
    ema = {"w": jnp.ones((3,))}
    cur = {"w": jnp.zeros((3,))}
    out = ema_update(ema, cur, jnp.int32(2000), decay=0.9999)
    d = 0.9999 * (1 - np.exp(-1.0))
    np.testing.assert_allclose(np.asarray(out["w"]), d, rtol=1e-5)


def test_train_step_accumulate_and_apply():
    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.models import build_model
    from tests.helpers import TINY_GRAPH
    m = build_model(TINY_GRAPH, nc=3)
    state = init_train_state(m, jax.random.PRNGKey(0), 64)
    step = make_train_step(m, num_classes=3, img_size=64)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, :, 0] = -1
    targets[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    one = jnp.float32(0.01)

    # note: at init the pred-conv weights are zero (reference init), so gradients
    # only reach the pred layers on the first step; check movement there.
    from mafyolo_tpu.core.train_state import params_pytree

    def pred_bias(s):
        head = f"layer{m.out_frm[0]}"
        return np.asarray(
            params_pytree(m, 64, s)["net"][head]["cls_pred"]["bias"])

    p0 = pred_bias(state)
    # accumulate-only step: params unchanged, grad_acc nonzero, updates unchanged
    state, _ = step(state, jnp.array(imgs), jnp.array(targets), one, one, one,
                    jnp.float32(0.9), jnp.bool_(False), False)
    p1 = pred_bias(state)
    np.testing.assert_array_equal(p0, p1)
    assert int(state["updates"]) == 0
    ga = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(state["grad_acc"]))
    assert ga > 0
    # apply step: params move, grad_acc reset, updates=1, ema moved
    state, metrics = step(state, jnp.array(imgs), jnp.array(targets), one, one, one,
                          jnp.float32(0.9), jnp.bool_(True), False)
    p2 = pred_bias(state)
    assert not np.array_equal(p1, p2)
    assert int(state["updates"]) == 1
    ga = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(state["grad_acc"]))
    assert ga == 0.0
    assert np.isfinite(float(metrics["loss"]))
