"""Static pytree <-> flat-vector codec for fused optimizer/EMA updates.

Why: the round-1 train step updated ~420 small parameter tensors leaf-by-leaf
(SGD + EMA + grad-accumulate + a lax.cond over the whole tuple), which cost
~290ms/step of per-leaf traffic on a v5e — more than the entire forward+backward.
Flattening every hot buffer (params, momentum, grad-acc, EMA) into one contiguous
f32 vector turns the optimizer into a handful of large fused elementwise kernels;
group-wise lr/weight-decay become masked selects over a static int8 group-id
vector. Parity target for the semantics is unchanged (torch SGD-nesterov with
three param groups, yolov6/solver/build.py + utils/ema.py).

The codec is built from jax.eval_shape output, so no compute happens at trace
time and the layout is deterministic for a given model spec (stable across
checkpoint save/load within one code version).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mafyolo_tpu.solver.build import group_of


class Flattener:
    """Codec between a pytree of arrays and one flat float32 vector."""

    def __init__(self, tree_shapes):
        leaves, self.treedef = jax.tree_util.tree_flatten(tree_shapes)
        self.shapes = [tuple(l.shape) for l in leaves]
        self.dtypes = [jnp.dtype(l.dtype) for l in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)]).astype(np.int64)
        self.total = int(self.offsets[-1])

    def flatten(self, tree):
        leaves = self.treedef.flatten_up_to(tree)
        if not leaves:
            return jnp.zeros((0,), jnp.float32)
        return jnp.concatenate(
            [jnp.ravel(x).astype(jnp.float32) for x in leaves])

    def unflatten(self, flat):
        out = []
        for o, n, s, dt in zip(self.offsets[:-1], self.sizes, self.shapes,
                               self.dtypes):
            out.append(jax.lax.slice(flat, (int(o),), (int(o) + n,))
                       .reshape(s).astype(dt))
        return self.treedef.unflatten(out)


def make_flatteners(model, img_size: int) -> Tuple[Flattener, Flattener, Any]:
    """(param codec, batch-stats codec, flat int8 group ids) for `model`.

    Group ids follow solver.build.group_of (BN scale / weight / bias), expanded
    to one id per scalar element in flattened order.
    """
    x = jax.ShapeDtypeStruct((1, img_size, img_size, 3), model.dtype)
    shapes = jax.eval_shape(partial(model.init, train=False),
                            jax.random.PRNGKey(0), x)
    pf = Flattener(shapes["params"])
    sf = Flattener(shapes.get("batch_stats", {}))
    flat_with_path = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
    gids = np.concatenate([
        np.full(int(np.prod(l.shape)) if l.shape else 1, group_of(p), np.int8)
        for p, l in flat_with_path]) if flat_with_path else np.zeros(0, np.int8)
    assert gids.size == pf.total
    return pf, sf, gids
