"""Exponential moving average over the full model state pytree.

Parity: yolov6/utils/ema.py:11-38 -- decay ramps as decay * (1 - exp(-updates/2000)),
applied to every float entry of the state dict (params AND BN running stats).
Pure function over pytrees; EMA updates happen only on optimizer steps, matching
engine.py:386-390.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_tree, model_tree, updates: jnp.ndarray, decay: float = 0.9999):
    """One EMA step; updates is the (already-incremented) optimizer-step count."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    return jax.tree.map(lambda e, m: e * d + (1.0 - d) * m, ema_tree, model_tree)
