"""Checkpoint I/O (parity: yolov6/utils/checkpoint.py:10-122).

Checkpoints are a pickled dict of numpy pytrees:
  {model: {params, batch_stats}, ema: {params, batch_stats}, opt: momentum buffers,
   updates, epoch, meta: {graph, nc, img_size, ...}}
`strip_checkpoint` mirrors strip_optimizer: promote EMA -> model, drop optimizer
state, cast to fp16 for the half-size eval artifact.

A .pt bridge (load_torch_checkpoint) maps released reference checkpoints onto our
param tree; see mafyolo_tpu/utils/torch_bridge.py.
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
import shutil
from typing import Dict, Optional

import jax
import numpy as np

from mafyolo_tpu.utils.events import LOGGER


def _to_numpy(tree):
    """Arrays -> host numpy; scalars/strings/None pass through untouched."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x,
        tree)


def save_checkpoint(ckpt: Dict, is_best: bool, save_dir: str,
                    model_name: str = "last_ckpt"):
    """last_ckpt + best copy (checkpoint.py:96-104)."""
    os.makedirs(save_dir, exist_ok=True)
    path = osp.join(save_dir, f"{model_name}.npck")
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(ckpt), f, protocol=4)
    if is_best:
        shutil.copyfile(path, osp.join(save_dir, "best_ckpt.npck"))
    return path


def load_checkpoint(path: str, prefer_ema: bool = True) -> Dict:
    """Load; returns the raw dict. Reference prefers the EMA weights for eval
    (checkpoint.py:83-93)."""
    if path.endswith(".pt"):
        from mafyolo_tpu.utils.torch_bridge import load_torch_checkpoint
        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    return ckpt


def eval_variables(ckpt: Dict, prefer_ema: bool = True) -> Dict:
    """Pick the weight set the reference would evaluate (EMA if present)."""
    src = ckpt.get("ema") if (prefer_ema and ckpt.get("ema")) else ckpt["model"]
    return {"params": src["params"], "batch_stats": src.get("batch_stats", {})}


def strip_checkpoint(path: str, half: bool = True):
    """strip_optimizer analog (checkpoint.py:107-122): EMA->model, drop opt, fp16."""
    ckpt = load_checkpoint(path)
    if ckpt.get("ema"):
        ckpt["model"] = ckpt["ema"]
    ckpt.pop("opt", None)
    ckpt["updates"] = 0
    if half:
        ckpt["model"] = jax.tree.map(
            lambda x: x.astype(np.float16) if np.issubdtype(x.dtype, np.floating)
            else x, ckpt["model"])
    ckpt["ema"] = None
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(ckpt), f, protocol=4)
    LOGGER.info(f"stripped optimizer state from {path}")


def load_shape_matched(params, pretrained_params):
    """Finetune loader: copy only shape-matching leaves (checkpoint.py:10-25)."""
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    matched, skipped = 0, 0
    out = {}
    for k, v in flat_new.items():
        o = flat_old.get(k)
        if o is not None and tuple(o.shape) == tuple(v.shape):
            out[k] = np.asarray(o, dtype=np.asarray(v).dtype)
            matched += 1
        else:
            out[k] = v
            skipped += 1
    LOGGER.info(f"finetune load: {matched} matched, {skipped} kept from init")
    treedef = jax.tree_util.tree_structure(params)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p in paths])


def find_latest_checkpoint(search_dir: str) -> Optional[str]:
    """--resume auto-discovery (general.py increment/find_latest analog)."""
    hits = []
    for root, _, files in os.walk(search_dir):
        for f in files:
            if f == "last_ckpt.npck":
                hits.append(osp.join(root, f))
    return max(hits, key=os.path.getmtime) if hits else None
