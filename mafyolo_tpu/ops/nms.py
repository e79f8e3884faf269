"""Fixed-shape batched NMS for TPU (parity target: yolov6/utils/nms.py:31-105).

The reference runs torchvision.ops.nms per image with a class-offset trick
(max_wh=4096), i.e. per-class greedy NMS over the union of multi-label candidates
(anchor, class) with conf = obj * cls > conf_thres, then truncates to max_det=300.

TPU design: everything is static-shape and jit-compiled.
  * per class: top-K candidates by score (K=pre_topk, default 300), one KxK IoU
    matrix, exact greedy suppression as a K-step lax.fori_loop carrying the
    suppressed mask (identical keep-set to torchvision's sequential NMS).
  * classes are vmapped -- 80 independent (K,K) problems batch beautifully.
  * outputs are padded to max_det with a validity mask instead of ragged lists.

Class-offset equivalence: boxes of different classes never suppress each other under
the offset trick, which is exactly per-class NMS; candidates beyond each class's
top-K are dropped (the reference's max_nms=30000 analog), immaterial at max_det=300.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from mafyolo_tpu.ops.boxes import box_iou_pairwise, xywh2xyxy


def _greedy_nms_mask(iou, valid, iou_thres: float):
    """Exact greedy NMS over score-descending boxes. iou [K,K], valid [K] -> keep [K]."""
    k = iou.shape[0]
    col = jnp.arange(k)

    def body(i, suppressed):
        keep_i = valid[i] & ~suppressed[i]
        row = (iou[i] > iou_thres) & (col > i) & keep_i
        return suppressed | row

    suppressed = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return valid & ~suppressed


def _per_class_nms(boxes, scores, pre_topk: int, iou_thres: float):
    """boxes [A,4] xyxy, scores [A] (0 where below conf) -> (boxes[K,4], scores[K])."""
    vals, idx = lax.top_k(scores, pre_topk)
    b = boxes[idx]
    valid = vals > 0
    iou = box_iou_pairwise(b, b)
    keep = _greedy_nms_mask(iou, valid, iou_thres)
    return b, jnp.where(keep, vals, 0.0)


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_topk",
                                   "multi_label", "agnostic"))
def batched_nms(prediction, conf_thres: float = 0.03, iou_thres: float = 0.65,
                max_det: int = 300, pre_topk: int = 300, multi_label: bool = True,
                agnostic: bool = False):
    """prediction [B, A, 5+nc] (xywh, obj, cls scores) -> dict of padded detections.

    Returns {'boxes': [B,max_det,4] xyxy, 'scores': [B,max_det], 'classes': [B,max_det]
    int32, 'valid': [B,max_det] bool}, score-descending per image.
    """
    nc = prediction.shape[-1] - 5

    def single(pred):
        boxes = xywh2xyxy(pred[:, :4])
        cls_scores = pred[:, 5:] * pred[:, 4:5]             # conf = obj * cls
        if not multi_label:
            best = cls_scores.max(-1, keepdims=True)
            cls_scores = jnp.where(cls_scores == best, cls_scores, 0.0)
        cls_scores = jnp.where(cls_scores > conf_thres, cls_scores, 0.0)

        if agnostic:
            score = cls_scores.max(-1)
            cls_of = jnp.argmax(cls_scores, -1)
            b, s = _per_class_nms(boxes, score, pre_topk, iou_thres)
            # recover class of each kept candidate
            _, idx = lax.top_k(score, pre_topk)
            c = cls_of[idx]
            cand_boxes, cand_scores, cand_cls = b, s, c
        else:
            per_cls = jax.vmap(lambda s: _per_class_nms(boxes, s, pre_topk, iou_thres),
                               in_axes=1)
            b, s = per_cls(cls_scores)                      # [nc,K,4], [nc,K]
            cand_boxes = b.reshape(-1, 4)
            cand_scores = s.reshape(-1)
            cand_cls = jnp.broadcast_to(jnp.arange(nc)[:, None],
                                        (nc, pre_topk)).reshape(-1)

        k = min(max_det, cand_scores.shape[0])
        top_scores, top_idx = lax.top_k(cand_scores, k)
        pad = max_det - k
        boxes_out = jnp.pad(cand_boxes[top_idx], ((0, pad), (0, 0)))
        return dict(boxes=boxes_out,
                    scores=jnp.pad(top_scores, (0, pad)),
                    classes=jnp.pad(cand_cls[top_idx].astype(jnp.int32), (0, pad)),
                    valid=jnp.pad(top_scores > 0, (0, pad)))

    return jax.vmap(single)(prediction)
