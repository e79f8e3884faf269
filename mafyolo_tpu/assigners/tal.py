"""Task-Aligned label assignment, fixed-shape jnp (reference: tal_assigner.py:6-151).

One jit-friendly function; gt tensors are padded to a static n_max_boxes with
mask_gt marking real rows, so there is no data-dependent shape anywhere (the TPU
replacement for the reference's dynamic per-batch padding + CPU OOM fallback).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mafyolo_tpu.assigners.common import (candidates_in_gts, dedup_topk_mask,
                                          iou_batched, resolve_conflicts)


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta"))
def tal_assign(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt,
               topk: int = 13, num_classes: int = 80, alpha: float = 1.0,
               beta: float = 6.0, eps: float = 1e-9):
    """Args (image-scale coords):
      pd_scores [B,A,nc] sigmoid scores; pd_bboxes [B,A,4] xyxy; anc_points [A,2];
      gt_labels [B,N,1]; gt_bboxes [B,N,4] xyxy; mask_gt [B,N,1] in {0,1}.
    Returns:
      target_labels [B,A] int32 (fg rows hold gt class, others arbitrary-but-clamped),
      target_bboxes [B,A,4], target_scores [B,A,nc], fg_mask [B,A] bool.
    """
    b, n, _ = gt_bboxes.shape
    a = pd_scores.shape[1]

    # --- alignment metric (tal_assigner.py:95-111) ---
    labels = jnp.clip(gt_labels.squeeze(-1).astype(jnp.int32), 0, num_classes - 1)
    # each gt's class column of pd_scores as a one_hot matmul: [B,N,nc]@[B,A,nc]^T
    # -> [B,N,A]. Exact (one unit element per row) and MXU-shaped, vs the
    # transpose+gather which copied [B,nc,A] and gathered off the minor axis.
    lbl_onehot = jax.nn.one_hot(labels, num_classes, dtype=pd_scores.dtype)
    bbox_scores = jnp.einsum("bnc,bac->bna", lbl_onehot, pd_scores,
                             preferred_element_type=pd_scores.dtype)
    overlaps = iou_batched(gt_bboxes, pd_bboxes)               # [B,N,A]
    align_metric = bbox_scores ** alpha * overlaps ** beta

    # --- positive mask (tal_assigner.py:75-93, 113-128) ---
    mask_in_gts = candidates_in_gts(anc_points, gt_bboxes)     # [B,N,A]
    metrics = align_metric * mask_in_gts
    # XLA lowers batched-3D top_k ~7x slower than 2D on TPU; reshape is free
    _, topk_idx = jax.lax.top_k(metrics.reshape(b * n, a), topk)
    topk_idx = topk_idx.reshape(b, n, topk)                    # [B,N,K]
    topk_valid = jnp.broadcast_to(mask_gt.astype(bool), topk_idx.shape)
    is_in_topk = dedup_topk_mask(topk_idx, topk_valid, a)      # [B,N,A]
    mask_pos = is_in_topk * mask_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = resolve_conflicts(mask_pos, overlaps)

    # --- gather targets (tal_assigner.py:130-151) ---
    target_labels = jnp.take_along_axis(
        gt_labels.squeeze(-1).astype(jnp.int32), target_gt_idx, axis=1)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1)
    target_labels = jnp.maximum(target_labels, 0)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = target_scores * (fg_mask[..., None] > 0)

    # --- normalization (tal_assigner.py:66-71) ---
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)            # [B,N,1]
    pos_overlaps = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)).max(-2)[..., None]  # [B,A,1]
    target_scores = target_scores * norm

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)
