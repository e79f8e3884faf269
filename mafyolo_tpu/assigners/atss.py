"""ATSS warmup assigner, fixed-shape jnp (reference: atss_assigner.py:7-161).

Used for epochs < warmup_epoch (yolov6/models/loss.py:83-91): per-level top-9 anchors by
center distance, IoU threshold = mean + std of the candidate IoUs, in-gt-box constraint,
highest-IoU conflict resolution, IoU-weighted soft target scores.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mafyolo_tpu.assigners.common import (candidates_in_gts, dedup_topk_mask,
                                          iou_batched, iou_pairwise_2d,
                                          resolve_conflicts)


@partial(jax.jit, static_argnames=("n_level_bboxes", "topk", "num_classes"))
def atss_assign(anc_bboxes, n_level_bboxes, gt_labels, gt_bboxes, mask_gt,
                pd_bboxes=None, topk: int = 9, num_classes: int = 80):
    """Args:
      anc_bboxes [A,4] image-scale anchor cell boxes; n_level_bboxes static tuple of
      per-level anchor counts; gt_labels [B,N,1]; gt_bboxes [B,N,4] xyxy;
      mask_gt [B,N,1]; pd_bboxes [B,A,4] for IoU-soft scores (or None).
    Returns (target_labels [B,A] with bg_idx fill, target_bboxes, target_scores, fg bool).
    """
    b, n, _ = gt_bboxes.shape
    a = anc_bboxes.shape[0]
    bg_idx = num_classes

    gt_flat = gt_bboxes.reshape(-1, 4)
    overlaps = iou_pairwise_2d(gt_flat, anc_bboxes).reshape(b, n, a)

    gt_centers = jnp.stack([(gt_flat[:, 0] + gt_flat[:, 2]) / 2,
                            (gt_flat[:, 1] + gt_flat[:, 3]) / 2], -1)
    ac_centers = jnp.stack([(anc_bboxes[:, 0] + anc_bboxes[:, 2]) / 2,
                            (anc_bboxes[:, 1] + anc_bboxes[:, 3]) / 2], -1)
    distances = jnp.sqrt(
        ((gt_centers[:, None, :] - ac_centers[None, :, :]) ** 2).sum(-1)
    ).reshape(b, n, a)

    # --- per-level top-k nearest candidates (atss_assigner.py:88-115) ---
    is_in_candidate = []
    candidate_idxs = []
    start = 0
    valid = mask_gt.astype(bool)
    for level_count in n_level_bboxes:
        k = min(topk, level_count)
        level_dist = jax.lax.dynamic_slice_in_dim(distances, start, level_count, axis=2)
        # 2D reshape: batched-3D top_k lowers ~7x slower on TPU
        _, idx = jax.lax.top_k(-level_dist.reshape(b * n, level_count), k)
        idx = idx.reshape(b, n, k)                             # nearest k, [B,N,k]
        candidate_idxs.append(idx + start)
        topk_valid = jnp.broadcast_to(valid, idx.shape)
        is_in_candidate.append(dedup_topk_mask(idx, topk_valid, level_count))
        start += level_count
    is_in_candidate = jnp.concatenate(is_in_candidate, axis=-1)   # [B,N,A]
    candidate_idxs = jnp.concatenate(candidate_idxs, axis=-1)     # [B,N,K_total]

    # --- IoU threshold mean+std over the candidates (atss_assigner.py:117-136) ---
    cand_overlaps = jnp.where(is_in_candidate > 0, overlaps, 0.0)
    gathered = jnp.take_along_axis(cand_overlaps, candidate_idxs, axis=-1)  # [B,N,K]
    k_total = gathered.shape[-1]
    mean = gathered.mean(-1, keepdims=True)
    std = jnp.sqrt(((gathered - mean) ** 2).sum(-1, keepdims=True)
                   / jnp.maximum(k_total - 1, 1))               # Bessel, torch default
    thresh = mean + std
    is_pos = jnp.where(cand_overlaps > thresh, is_in_candidate, 0.0)

    is_in_gts = candidates_in_gts(ac_centers, gt_bboxes)
    mask_pos = is_pos * is_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = resolve_conflicts(mask_pos, overlaps)

    # --- targets (atss_assigner.py:138-161) ---
    target_labels = jnp.take_along_axis(
        gt_labels.squeeze(-1).astype(jnp.int32), target_gt_idx, axis=1)
    target_labels = jnp.where(fg_mask > 0, target_labels, bg_idx)
    target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, num_classes + 1,
                                   dtype=gt_bboxes.dtype)[..., :num_classes]

    if pd_bboxes is not None:
        ious = iou_batched(gt_bboxes, pd_bboxes) * mask_pos
        ious = ious.max(-2)[..., None]
        target_scores = target_scores * ious

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)
