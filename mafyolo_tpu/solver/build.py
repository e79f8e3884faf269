"""Optimizer + LR schedule (parity: yolov6/solver/build.py, engine.py:375-391,491-496).

The reference builds torch SGD with three param groups -- BN scales (no decay),
conv/linear weights (weight decay), biases (no decay, separate warmup lr) -- and
mutates group lr/momentum per step during warmup via np.interp. Here SGD-nesterov is
hand-rolled as a pure pytree update so per-step, per-group lr/momentum are plain
traced scalars inside the one jitted train step; group membership is a static mask
pytree computed from parameter paths.

torch-SGD semantics reproduced exactly: g = grad + wd * p; buf = m * buf + g;
update = g + m * buf (nesterov); p -= lr * update.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GROUP_BNW, GROUP_WEIGHT, GROUP_BIAS = 0, 1, 2


def group_of(path) -> int:
    """Classify a param leaf: BN scale -> bnw, *bias -> bias, else weight.

    Mirrors build_optimizer's module walk (solver/build.py:14-21): BN gammas get no
    decay, biases (incl. BN betas) get no decay + warmup_bias_lr, weights decay.
    """
    keys = [str(getattr(p, "key", p)) for p in path]
    if keys[-1] == "bias":
        return GROUP_BIAS
    if keys[-1] == "scale":  # flax BatchNorm gamma
        return GROUP_BNW
    return GROUP_WEIGHT


def param_groups(params) -> Any:
    """Pytree of int group ids matching `params`."""
    return jax.tree_util.tree_map_with_path(lambda p, x: group_of(p), params)


def sgd_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params, grads, momentum_buf, groups, lrs: Tuple, momentum,
               weight_decay):
    """One SGD-nesterov step. lrs = (lr_bnw, lr_weight, lr_bias) traced scalars."""
    lr_arr = jnp.stack(lrs)

    def upd(p, g, buf, grp):
        g = g + jnp.where(grp == GROUP_WEIGHT, weight_decay, 0.0) * p
        new_buf = momentum * buf + g
        step = g + momentum * new_buf
        return p - lr_arr[grp] * step, new_buf

    pairs = jax.tree.map(upd, params, grads, momentum_buf, groups)
    outer = jax.tree.structure(params)
    inner = jax.tree.structure((0, 0))
    return jax.tree.transpose(outer, inner, pairs)


def build_lr_fn(scheduler: str, lrf: float, epochs: int):
    """Epoch -> lr multiplier (solver/build.py:36-48)."""
    if scheduler == "Cosine":
        return lambda x: ((1 - math.cos(x * math.pi / epochs)) / 2) * (lrf - 1) + 1
    if scheduler == "Constant":
        return lambda x: 1.0
    if scheduler == "linear":
        return lambda x: (1 - x / epochs) * (1.0 - lrf) + lrf
    raise ValueError(f"unknown lr scheduler {scheduler!r}")


def warmup_schedule(curr_step: int, warmup_steps: int, epoch: int, lf, lr0: float,
                    batch_size: int, warmup_bias_lr: float, warmup_momentum: float,
                    momentum: float) -> Dict[str, float]:
    """Per-step host-side schedule (engine.py:375-391).

    Returns lr per group, momentum, and the gradient-accumulation length.
    """
    accumulate = max(1, round(64 / batch_size))
    base = lr0 * lf(epoch)
    if warmup_steps and curr_step <= warmup_steps:
        accumulate = max(1, int(round(float(np.interp(
            curr_step, [0, warmup_steps], [1, 64 / batch_size])))))
        lr_w = float(np.interp(curr_step, [0, warmup_steps], [0.0, base]))
        lr_b = float(np.interp(curr_step, [0, warmup_steps], [warmup_bias_lr, base]))
        mom = float(np.interp(curr_step, [0, warmup_steps],
                              [warmup_momentum, momentum]))
        return dict(lr_bnw=lr_w, lr_weight=lr_w, lr_bias=lr_b, momentum=mom,
                    accumulate=accumulate)
    return dict(lr_bnw=base, lr_weight=base, lr_bias=base, momentum=momentum,
                accumulate=accumulate)
