"""RepOptimizer: gradient-mask SGD emulating the RepVGG structural prior.

Parity target: yolov6/utils/RepOptimizer.py (RepVGGOptimizer, engine.py:60-63,
used when cfg.training_mode == 'repopt'). Instead of training multi-branch
RepVGG blocks, a *plain* conv-bn-relu net is trained with (a) conv kernels
re-initialized as the scaled sum of the imaginary branches and (b) per-kernel
gradient masks s_conv^2 (+ s_1x1^2 at the center, +1 at the identity taps),
where the scales come from a hyper-search checkpoint of LinearAddBlocks.

Kernels here are HWIO; masks broadcast over the O (last) axis.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def repopt_reinit_kernel(kernel: np.ndarray, scales: Tuple, rng: np.random.Generator,
                         use_identity_scales: bool = True) -> np.ndarray:
    """Re-initialize a plain 3x3 kernel from searched scales
    (RepVGGOptimizer.reinitialize, RepOptimizer.py:118-135). kernel HWIO."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    # torch default-init imaginary 1x1 kernel
    bound = 1.0 / np.sqrt(cin)
    k1 = rng.uniform(-bound, bound, (1, 1, cin, cout)).astype(np.float32)
    if len(scales) == 2:
        s_1x1, s_conv = [np.asarray(s, np.float32) for s in scales]
        out = kernel * s_conv + np.pad(k1, [(1, 1), (1, 1), (0, 0), (0, 0)]) * s_1x1
    else:
        s_id, s_1x1, s_conv = [np.asarray(s, np.float32) for s in scales]
        assert cin == cout
        out = kernel * s_conv + np.pad(k1, [(1, 1), (1, 1), (0, 0), (0, 0)]) * s_1x1
        identity = np.eye(cout, dtype=np.float32).reshape(1, 1, cout, cout)
        idw = s_id if use_identity_scales else np.ones_like(s_id)
        out = out + np.pad(identity * idw, [(1, 1), (1, 1), (0, 0), (0, 0)])
    return out.astype(np.float32)


def repopt_grad_mask(shape: Tuple[int, ...], scales: Tuple) -> np.ndarray:
    """Gradient mask for a plain 3x3 kernel (generate_gradient_masks,
    RepOptimizer.py:137-152). shape = (3,3,cin,cout) HWIO."""
    kh, kw, cin, cout = shape
    if len(scales) == 2:
        s_1x1, s_conv = [np.asarray(s, np.float32) for s in scales]
        mask = np.ones(shape, np.float32) * (s_conv ** 2)
        mask[1:2, 1:2] += np.ones((1, 1, cin, cout), np.float32) * (s_1x1 ** 2)
    else:
        s_id, s_1x1, s_conv = [np.asarray(s, np.float32) for s in scales]
        mask = np.ones(shape, np.float32) * (s_conv ** 2)
        mask[1:2, 1:2] += np.ones((1, 1, cin, cout), np.float32) * (s_1x1 ** 2)
        ids = np.arange(cout)
        mask[1, 1, ids, ids] += 1.0
    return mask


def build_grad_mask_tree(params, masks_by_path: Dict[str, np.ndarray]):
    """Pytree of masks (1.0 where unmasked) aligned with `params`; paths are
    '/'-joined key strings of the masked conv kernels."""
    def mk(path, leaf):
        key = "/".join(str(p.key) for p in path)
        m = masks_by_path.get(key)
        return jnp.asarray(m) if m is not None else jnp.ones_like(leaf)
    return jax.tree_util.tree_map_with_path(mk, params)


def apply_grad_masks(grads, mask_tree):
    """d_p = grad * mask before the SGD update (RepOptimizer.py step())."""
    return jax.tree.map(jnp.multiply, grads, mask_tree)


def plain_rep_kernel_paths(params) -> List[str]:
    """'/'-joined paths of the plain RepVGG 3x3 kernels, in graph order.

    Mirrors extract_blocks_into_list's recursive module walk
    (RepOptimizer.py:10-15): 'dense' is the unique submodule name of the
    RepVGGBlock 3x3 branch (models/blocks.py), so in a plain_rep build every
    '.../dense/conv/kernel' leaf IS a RealVGG conv. Graph order = the layer{i}
    index embedded in the path.
    """
    import re
    hits = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p.key) for p in path)
        if key.endswith("dense/conv/kernel") and leaf.shape[:2] == (3, 3):
            m = re.search(r"layer(\d+)", key)
            hits.append((int(m.group(1)) if m else 1 << 30, key))
    return [k for _, k in sorted(hits)]


def repopt_prepare(params, scales: List[Tuple], rng: np.random.Generator,
                   reinit: bool = True, use_identity_scales: bool = True):
    """RepVGGOptimizer.__init__ analog for a plain_rep param tree
    (RepOptimizer.py:84-152): optionally re-initialize each plain 3x3 kernel
    from the searched scales, and build the gradient-mask pytree.

    Returns (new_params, mask_tree). scales[i] pairs with the i-th plain
    kernel in graph order; len(scales) must match.
    """
    paths = plain_rep_kernel_paths(params)
    if len(scales) != len(paths):
        raise ValueError(f"got {len(scales)} scale tuples for {len(paths)} "
                         f"plain RepVGG convs")
    by_path = dict(zip(paths, scales))
    masks = {}

    def visit(path, leaf):
        key = "/".join(str(p.key) for p in path)
        s = by_path.get(key)
        if s is None:
            return leaf
        masks[key] = repopt_grad_mask(tuple(leaf.shape), s)
        if reinit:
            return jnp.asarray(repopt_reinit_kernel(
                np.asarray(leaf, np.float32), s, rng, use_identity_scales))
        return leaf

    new_params = jax.tree_util.tree_map_with_path(visit, params)
    return new_params, build_grad_mask_tree(params, masks)


def random_scales_like(params, rng: np.random.Generator) -> List[Tuple]:
    """Synthesize a plausible scale set (for tests / when no hyper-search
    checkpoint exists): s ~ U(0.5, 1.0) per out-channel, identity scale for
    square kernels, matching LinearAddBlock's trained-scale shape."""
    out = []
    for key in plain_rep_kernel_paths(params):
        leaf = params
        for k in key.split("/"):
            leaf = leaf[k]
        cin, cout = leaf.shape[2], leaf.shape[3]
        t = [rng.uniform(0.5, 1.0, cout).astype(np.float32),
             rng.uniform(0.5, 1.0, cout).astype(np.float32)]
        # identity scale exists only for stride-1 square blocks (LinearAddBlock,
        # common.py:318-330); MPRep's rep_down is always stride 2
        if cin == cout and "rep_down" not in key:
            t.insert(0, rng.uniform(0.5, 1.0, cout).astype(np.float32))
        out.append(tuple(t))
    return out


def load_scales(path: str) -> List[Tuple]:
    """Load searched scales: either a pickled list of numpy tuples, or a torch
    LinearAddBlock search checkpoint (extract_scales, RepOptimizer.py:18-29)."""
    import pickle
    if path.endswith(".pt"):
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        model = ckpt["model"] if isinstance(ckpt, dict) else ckpt
        scales = []
        for m in model.modules():
            if type(m).__name__ == "LinearAddBlock":
                t = [m.scale_1x1.weight.detach().numpy(),
                     m.scale_conv.weight.detach().numpy()]
                if hasattr(m, "scale_identity"):
                    t.insert(0, m.scale_identity.weight.detach().numpy())
                scales.append(tuple(t))
        return scales
    with open(path, "rb") as f:
        return pickle.load(f)
