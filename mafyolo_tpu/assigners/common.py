"""Shared assigner math (reference: yolov6/assigners/assigner_utils.py).

Everything is fixed-shape jnp so both assigners jit cleanly on TPU -- this replaces the
reference's CUDA-OOM -> CPU fallback path (yolov6/models/loss.py:102-149) outright.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_batched(box1, box2, eps: float = 1e-9):
    """Pairwise IoU: box1 [B,N,4] x box2 [B,M,4] -> [B,N,M] (assigner_utils.py:69-89).

    Coordinate-wise (no [B,N,M,2] stacking): every op is [B,N,M] or smaller, so
    XLA fuses the whole thing into one loop — the stacked form materialized
    multiple [B,N,M,2] temporaries (~0.5GB at B32/N120/A8400).
    """
    x11, y11, x12, y12 = (box1[..., i][:, :, None] for i in range(4))
    x21, y21, x22, y22 = (box2[..., i][:, None, :] for i in range(4))
    ow = jnp.clip(jnp.minimum(x12, x22) - jnp.maximum(x11, x21), 0)
    oh = jnp.clip(jnp.minimum(y12, y22) - jnp.maximum(y11, y21), 0)
    overlap = ow * oh
    area1 = jnp.clip(x12 - x11, 0) * jnp.clip(y12 - y11, 0)
    area2 = jnp.clip(x22 - x21, 0) * jnp.clip(y22 - y21, 0)
    return overlap / (area1 + area2 - overlap + eps)


def iou_pairwise_2d(boxes1, boxes2, eps: float = 1e-6):
    """Pairwise IoU: [N,4] x [M,4] -> [N,M] (iou2d_calculator semantics, mode='iou')."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    overlap = jnp.clip(rb - lt, 0).prod(-1)
    area1 = jnp.clip(boxes1[:, 2:] - boxes1[:, :2], 0).prod(-1)
    area2 = jnp.clip(boxes2[:, 2:] - boxes2[:, :2], 0).prod(-1)
    union = area1[:, None] + area2[None, :] - overlap
    return overlap / jnp.maximum(union, eps)


def candidates_in_gts(xy_centers, gt_bboxes, eps: float = 1e-9):
    """Anchor centers strictly inside gt boxes (assigner_utils.py:25-44).

    xy_centers [A,2], gt_bboxes [B,N,4] -> [B,N,A] float mask.
    """
    xc = xy_centers[None, None, :, 0]
    yc = xy_centers[None, None, :, 1]
    x1, y1, x2, y2 = (gt_bboxes[..., i][:, :, None] for i in range(4))
    # min(xc-x1, yc-y1, x2-xc, y2-yc) > eps, without the [B,N,A,4] concat
    inside = ((xc - x1 > eps) & (yc - y1 > eps)
              & (x2 - xc > eps) & (y2 - yc > eps))
    return inside.astype(gt_bboxes.dtype)


def resolve_conflicts(mask_pos, overlaps):
    """Anchors claimed by multiple gts go to the highest-IoU gt
    (select_highest_overlaps, assigner_utils.py:46-67).

    mask_pos, overlaps: [B,N,A] -> (target_gt_idx [B,A], fg_mask [B,A], mask_pos).
    """
    n_max_boxes = mask_pos.shape[1]
    fg_mask = mask_pos.sum(-2)
    mask_multi = (fg_mask[:, None, :] > 1)
    max_idx = jnp.argmax(overlaps, axis=1)                     # [B,A]
    # broadcast compare instead of eye-gather + transpose (both copy [B,N,A])
    is_max = (jnp.arange(n_max_boxes)[None, :, None]
              == max_idx[:, None, :]).astype(overlaps.dtype)   # [B,N,A]
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)
    return target_gt_idx, fg_mask, mask_pos


def dedup_topk_mask(topk_idx, topk_valid, n: int):
    """The reference's one_hot-sum dedup trick (tal_assigner.py:124-128).

    topk_idx [..., K] indices into axis of size n; invalid entries are first zeroed,
    then any index selected more than once (including the resulting pile-up at 0)
    is dropped entirely. Implemented as a scatter-add histogram.
    """
    idx = jnp.where(topk_valid, topk_idx, 0)
    prefix = idx.shape[:-1]
    counts = jnp.zeros((*prefix, n), dtype=jnp.int32)
    lead = []
    for d, size in enumerate(prefix):
        shape = [1] * (len(prefix) + 1)
        shape[d] = size
        lead.append(jnp.arange(size).reshape(shape))
    counts = counts.at[(*lead, idx)].add(1)
    return jnp.where(counts > 1, 0, counts).astype(jnp.float32)


def topk_rows(x, k: int, chunk: int = 128):
    """Exact jax.lax.top_k over the last dim, computed hierarchically.

    The flat TopK custom-call over [B*N, A] is the biggest op bucket in the
    train-step device trace (49 ms at [3840, 8400] k=13; tools/profile_trace
    --stage train, round 5) -- but forced-sync stage timing shows the WHOLE
    loss forward costs 12.7 ms, i.e. the TopK custom-calls overlap the
    TensorCore timeline (async/SparseCore offload) and are NOT a wall-time
    cost. This helper is therefore a parity-exact building block, NOT wired
    into the assigners. Stage 1 takes the top-k of each `chunk`-wide block,
    stage 2 the top-k of the nch*k survivors; every global top-k element is
    in its block's top-k, so the result EQUALS lax.top_k -- and since blocks
    are index-ordered and each block's survivors are (value-desc,
    lower-index-first) ordered, position order at stage 2 equals global
    index order, preserving lax.top_k's lower-index-first tie semantics
    exactly (tests/test_parity_reference.py::test_topk_rows_exact_vs_lax_topk).

    Reference equivalence: torch.topk(metrics, self.topk, axis=-1)
    (yolov6/assigners/tal_assigner.py:112-128 select_topk_candidates).
    """
    r, a = x.shape
    nch = -(-a // chunk)
    if k > chunk or nch * k >= a:
        return jax.lax.top_k(x, k)
    pad = nch * chunk - a
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    v1, i1 = jax.lax.top_k(xp.reshape(r * nch, chunk), k)
    gidx = (i1.reshape(r, nch, k)
            + (jnp.arange(nch, dtype=i1.dtype) * chunk)[None, :, None])
    v2, i2 = jax.lax.top_k(v1.reshape(r, nch * k), k)
    idx = jnp.take_along_axis(gidx.reshape(r, nch * k), i2, axis=1)
    return v2, idx
