"""SimOTA loss (YOLOX-style), fixed-shape jnp (parity: yolov6/models/simOTA.py:15-415).

Opt-in via --simota / cfg.model.target == 'SimOTA' with the Head_Simota head (raw
cls/reg/obj maps, obj+cls logits, reg = (xy offset, log-wh)).

Pipeline per image (vectorized over the batch, no python loops over gts):
  * decode reg to image-scale boxes: xy = (pred_xy + grid) * stride,
    wh = exp(pred_wh) * stride (simOTA.py:decode_output);
  * candidate anchors: center inside a gt box OR inside the 2.5-stride center
    square (get_in_boxes_info);
  * cost = cls_BCE(sqrt(sigmoid_cls*sigmoid_obj), onehot) + 3 * (-log IoU)
    + 1e5 * ~(in_box AND in_center), +inf-like for non-candidates/pad gts;
  * dynamic-k: k[n] = clamp(int(sum of top-10 candidate IoUs), 1); each gt takes
    its k lowest-cost anchors (rank-based mask instead of per-gt topk loops);
  * conflicts -> lowest-cost gt (dynamic_k_matching);
  * losses: IoU (ciou default) + L1 on raw reg + obj BCE over all anchors +
    cls BCE on fg, all summed / total num_fg; weights reg 5.0 / iou(cost) 3.0.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from mafyolo_tpu.ops.boxes import iou_loss


def _decode_levels(head_outs: Sequence[Tuple], strides: Sequence[int]):
    """Per-level (cls, reg, obj) NHWC -> flat decoded/raw tensors + grids."""
    decoded, raw, shifts, stride_cols = [], [], [], []
    for (cls, reg, obj), s in zip(head_outs, strides):
        b, h, w, _ = cls.shape
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1).reshape(1, h * w, 2)
        out = jnp.concatenate([reg, obj, cls], -1).reshape(b, h * w, -1)
        raw.append(out)
        xy = (out[..., :2] + grid) * s
        wh = jnp.exp(out[..., 2:4]) * s
        decoded.append(jnp.concatenate([xy, wh, out[..., 4:]], -1))
        shifts.append(grid)
        stride_cols.append(jnp.full((1, h * w, 1), s, jnp.float32))
    return (jnp.concatenate(decoded, 1), jnp.concatenate(raw, 1),
            jnp.concatenate(shifts, 1), jnp.concatenate(stride_cols, 1))


def _pairwise_iou_xywh(box1, box2, eps=1e-9):
    """[N,4] x [A,4] xywh -> [N,A] (figure_iou.pairwise_bbox_iou semantics)."""
    lt = jnp.maximum(box1[:, None, :2] - box1[:, None, 2:] / 2,
                     box2[None, :, :2] - box2[None, :, 2:] / 2)
    rb = jnp.minimum(box1[:, None, :2] + box1[:, None, 2:] / 2,
                     box2[None, :, :2] + box2[None, :, 2:] / 2)
    valid = (lt < rb).all(-1)
    inter = jnp.clip(rb - lt, 0).prod(-1) * valid
    a1 = box1[:, 2:].prod(-1)
    a2 = box2[:, 2:].prod(-1)
    return inter / (a1[:, None] + a2[None, :] - inter + eps)


def simota_loss(head_outs, targets, *, num_classes: int, img_size: int = 640,
                strides: Sequence[int] = (8, 16, 32), center_radius: float = 2.5,
                reg_weight: float = 5.0, iou_weight: float = 3.0,
                cls_weight: float = 1.0, iou_type: str = "ciou",
                loss_l1: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """head_outs: list of (cls_raw, reg_raw, obj_raw) per level; targets [B,N,5]."""
    decoded, raw, shifts, stride_col = _decode_levels(head_outs, strides)
    decoded = decoded.astype(jnp.float32)
    raw = raw.astype(jnp.float32)
    b, a, _ = decoded.shape
    boxes = decoded[..., :4]                  # xywh image-scale
    obj_logits = decoded[..., 4]
    cls_logits = decoded[..., 5:]
    centers = (shifts[0] + 0.5) * stride_col[0]      # [A,2]
    stride_flat = stride_col[0, :, 0]                # [A]

    gt_cls = jnp.clip(targets[..., 0].astype(jnp.int32), 0, num_classes - 1)
    gt_xywh = targets[..., 1:] * img_size
    mask_gt = (targets[..., 1:].sum(-1) > 0) & (targets[..., 0] >= 0)  # [B,N]

    def assign_one(boxes_i, obj_i, cls_i, gts, gcls, gmask):
        n = gts.shape[0]
        lt = gts[:, :2] - gts[:, 2:] / 2
        rb = gts[:, :2] + gts[:, 2:] / 2
        d_box = jnp.concatenate([centers[None] - lt[:, None],
                                 rb[:, None] - centers[None]], -1)
        in_boxes = (d_box.min(-1) > 0.0) & gmask[:, None]            # [N,A]
        c_lt = gts[:, None, :2] - center_radius * stride_flat[None, :, None]
        c_rb = gts[:, None, :2] + center_radius * stride_flat[None, :, None]
        d_ctr = jnp.concatenate([centers[None] - c_lt, c_rb - centers[None]], -1)
        in_centers = (d_ctr.min(-1) > 0.0) & gmask[:, None]
        candidate = in_boxes.any(0) | in_centers.any(0)              # [A]
        in_both = in_boxes & in_centers

        ious = _pairwise_iou_xywh(gts, boxes_i) * gmask[:, None]     # [N,A]
        iou_cost = -jnp.log(ious + 1e-8)
        p = jnp.sqrt(jax.nn.sigmoid(cls_i)[None] *
                     jax.nn.sigmoid(obj_i)[None, :, None])           # [1,A,nc]
        onehot = jax.nn.one_hot(gcls, num_classes)[:, None]          # [N,1,nc]
        bce = -(onehot * jnp.log(jnp.maximum(p, 1e-12))
                + (1 - onehot) * jnp.log(jnp.maximum(1 - p, 1e-12)))
        cls_cost = bce.sum(-1)                                       # [N,A]
        cost = (cls_weight * cls_cost + iou_weight * iou_cost
                + 1e5 * (~in_both)
                + 1e9 * (~candidate)[None, :] + 1e9 * (~gmask)[:, None])

        # dynamic-k from top-10 candidate IoUs (dynamic_k_matching)
        cand_ious = jnp.where(candidate[None, :], ious, 0.0)
        k10 = jax.lax.top_k(cand_ious, min(10, a))[0]
        dynamic_k = jnp.clip(k10.sum(1).astype(jnp.int32), 1, None)  # [N]
        # rank of each anchor in the gt's ascending-cost order
        order = jnp.argsort(cost, axis=1)
        ranks = jnp.argsort(order, axis=1)                           # [N,A]
        # (non-candidates carry a 1e9 cost so ranks<k never reaches them while any
        # candidate remains -- same as the reference's restriction to candidates)
        match = (ranks < dynamic_k[:, None]) & gmask[:, None] & candidate[None, :]

        # conflict resolution: anchor claimed by several gts -> min cost
        claimed = match.sum(0)
        best_gt = jnp.argmin(jnp.where(match, cost, jnp.inf), axis=0)  # [A]
        only_best = jax.nn.one_hot(best_gt, n, dtype=bool).T & match
        match = jnp.where(claimed[None, :] > 1, only_best, match)

        fg = match.any(0)                                            # [A]
        matched_gt = jnp.argmax(match, axis=0)                       # [A]
        matched_iou = (match * ious).sum(0)                          # [A]
        return fg, matched_gt, matched_iou

    fg, matched_gt, matched_iou = jax.vmap(assign_one)(
        boxes, obj_logits, cls_logits, gt_xywh, gt_cls, mask_gt)
    fg = jax.lax.stop_gradient(fg)
    matched_gt = jax.lax.stop_gradient(matched_gt)
    matched_iou = jax.lax.stop_gradient(matched_iou)

    num_fg = jnp.maximum(fg.sum(), 1).astype(jnp.float32)
    tgt_boxes = jnp.take_along_axis(gt_xywh, matched_gt[..., None], axis=1)  # [B,A,4]
    tgt_cls_idx = jnp.take_along_axis(gt_cls, matched_gt, axis=1)            # [B,A]
    cls_target = (jax.nn.one_hot(tgt_cls_idx, num_classes)
                  * matched_iou[..., None])

    fgf = fg.astype(jnp.float32)
    l_iou = (iou_loss(boxes, tgt_boxes, iou_type=iou_type, box_format="xywh")
             * fgf).sum() / num_fg

    def bce_logits(logits, target):
        return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))

    l_obj = bce_logits(obj_logits, fgf).sum() / num_fg
    l_cls = (bce_logits(cls_logits, cls_target).sum(-1) * fgf).sum() / num_fg
    if loss_l1:
        l1_tgt_xy = tgt_boxes[..., :2] / stride_col[..., 0:1] - shifts
        l1_tgt_wh = jnp.log(tgt_boxes[..., 2:] / stride_col[..., 0:1] + 1e-8)
        l1_tgt = jnp.concatenate([l1_tgt_xy, l1_tgt_wh], -1)
        l_l1 = (jnp.abs(raw[..., :4] - l1_tgt).sum(-1) * fgf).sum() / num_fg
    else:
        l_l1 = jnp.zeros(())

    total = reg_weight * l_iou + l_l1 + l_obj + l_cls
    return total, {"iou": reg_weight * l_iou, "l1": l_l1, "obj": l_obj,
                   "cls": l_cls}
