"""Knowledge-distillation detection loss (parity: yolov6/models/loss_distill.py).

Base VFL + IoU + DFL loss (shared with loss.py) plus:
  * class-logit KL distillation with temperature (loss_distill.py:209-218);
  * DFL-distribution KL distillation on positive anchors, scalar-mean then
    bbox-weighted exactly as the reference quirkily does (loss_distill.py:314-316,
    342-352);
  * optional channel-wise feature-map KL (loss_distill.py:220-229, log_target);
  * cosine distill-weight decay over epochs (loss_distill.py:192-195).

Teacher outputs are stop-gradiented; the assigner warmup epoch is 4 here
(loss_distill.py:23) vs 3 in the plain loss.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mafyolo_tpu.assigners import atss_assign, tal_assign
from mafyolo_tpu.models.detect import (bbox2dist, dfl_decode, dist2bbox,
                                       flatten_train_outputs,
                                       generate_anchors_train)
from mafyolo_tpu.models.losses.loss import _df_loss, varifocal_loss
from mafyolo_tpu.ops.boxes import iou_loss, xywh2xyxy


def _kl_div_sum(log_p_student, p_teacher):
    """torch F.kl_div(log_q, p, reduction='sum') = sum p * (log p - log q)."""
    logp_t = jnp.log(jnp.maximum(p_teacher, 1e-12))
    return (p_teacher * (logp_t - log_p_student)).sum()


def distill_loss_cls(logits_student, logits_teacher, temperature: float):
    s = jax.nn.log_softmax(logits_student.reshape(-1, logits_student.shape[-1])
                           / temperature, axis=1)
    t = jax.nn.softmax(logits_teacher.reshape(-1, logits_teacher.shape[-1])
                       / temperature, axis=1)
    return _kl_div_sum(s, t) * temperature ** 2


def distill_loss_cw(s_feats, t_feats, temperature: float = 1.0):
    """Channel-wise KL over spatial softmax per level; NHWC inputs."""
    total = 0.0
    for sf, tf in zip(s_feats, t_feats):
        n, h, w, c = sf.shape
        s = jax.nn.log_softmax(
            sf.transpose(0, 3, 1, 2).reshape(n, c, h * w) / temperature, axis=2)
        t = jax.nn.log_softmax(
            jax.lax.stop_gradient(tf).transpose(0, 3, 1, 2).reshape(n, c, h * w)
            / temperature, axis=2)
        # torch kl_div(log_target=True): sum exp(t) * (t - s)
        total = total + (jnp.exp(t) * (t - s)).sum() * (temperature ** 2) / (n * c)
    return total


def distill_loss_dfl(logits_student, logits_teacher, temperature: float = 20.0):
    """Per-row KL sum then mean -> scalar (loss_distill.py:342-352)."""
    nbins = logits_student.shape[-1]
    s = jax.nn.log_softmax(logits_student.reshape(-1, nbins) / temperature, axis=1)
    t = jax.nn.softmax(
        jax.lax.stop_gradient(logits_teacher).reshape(-1, nbins) / temperature,
        axis=1)
    kl = (t * (jnp.log(jnp.maximum(t, 1e-12)) - s)).sum(1)
    return kl.mean() * temperature ** 2


def distill_detection_loss(
    head_outs: Sequence[Tuple],
    teacher_outs: Sequence[Tuple],
    targets,
    *,
    epoch_num: int,
    max_epoch: int,
    use_atss: bool,
    num_classes: int,
    img_size: int = 640,
    strides: Sequence[int] = (8, 16, 32),
    reg_max: int = 16,
    use_dfl: bool = True,
    iou_type: str = "giou",
    temperature: float = 20.0,
    distill_feat: bool = False,
    loss_weight: Dict[str, float] = None,
    distill_weight: Dict[str, float] = None,
):
    """-> (total, dict(iou, dfl, cls, cwd))."""
    loss_weight = loss_weight or {"class": 1.0, "iou": 2.5, "dfl": 0.5, "cwd": 10.0}
    distill_weight = distill_weight or {"class": 1.0, "dfl": 1.0}

    hw_list, pred_scores, pred_distri = flatten_train_outputs(head_outs)
    _, t_pred_scores, t_pred_distri = flatten_train_outputs(teacher_outs)
    pred_scores = pred_scores.astype(jnp.float32)
    pred_distri = pred_distri.astype(jnp.float32)
    t_pred_scores = jax.lax.stop_gradient(t_pred_scores.astype(jnp.float32))
    t_pred_distri = jax.lax.stop_gradient(t_pred_distri.astype(jnp.float32))

    anchors, anchor_points, n_anchors_list, stride_tensor = generate_anchors_train(
        hw_list, strides)
    gt_labels = targets[..., :1]
    gt_bboxes = xywh2xyxy(targets[..., 1:] * img_size)
    mask_gt = (gt_bboxes.sum(-1, keepdims=True) > 0).astype(jnp.float32)
    gt_bboxes = gt_bboxes * mask_gt

    anchor_points_s = anchor_points / stride_tensor
    pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max) if use_dfl
                            else pred_distri, anchor_points_s)

    det_bboxes = jax.lax.stop_gradient(pred_bboxes) * stride_tensor
    if use_atss:
        target_labels, target_bboxes, target_scores, fg_mask = atss_assign(
            anchors, tuple(n_anchors_list), gt_labels, gt_bboxes, mask_gt,
            det_bboxes, topk=9, num_classes=num_classes)
    else:
        target_labels, target_bboxes, target_scores, fg_mask = tal_assign(
            jax.lax.stop_gradient(pred_scores), det_bboxes, anchor_points,
            gt_labels, gt_bboxes, mask_gt, topk=13, num_classes=num_classes)

    target_bboxes = target_bboxes / stride_tensor
    fg = fg_mask.astype(jnp.float32)
    labels_bg = jnp.where(fg_mask, target_labels, num_classes)
    one_hot = jax.nn.one_hot(labels_bg, num_classes + 1)[..., :-1]
    loss_cls = varifocal_loss(pred_scores, target_scores, one_hot)
    tss = target_scores.sum()
    denom = jnp.where(tss > 0, tss, 1.0)
    loss_cls = loss_cls / denom

    bbox_weight = target_scores.sum(-1) * fg
    loss_iou = (iou_loss(pred_bboxes, target_bboxes, iou_type=iou_type, eps=1e-10)
                * bbox_weight).sum() / denom

    if use_dfl:
        b, a, _ = pred_distri.shape
        dist_logits = pred_distri.reshape(b, a, 4, reg_max + 1)
        target_ltrb = bbox2dist(anchor_points_s, target_bboxes, reg_max)
        loss_dfl = (_df_loss(dist_logits, target_ltrb).squeeze(-1)
                    * bbox_weight).sum() / denom
        # DFL distill: KL over positive rows only (masked via weights); the
        # reference takes a scalar mean over positives then re-weights
        # (loss_distill.py:314-316). With fixed shapes we weight the per-anchor
        # mean KL by fg and normalize by the positive count to match the mean.
        nbins = reg_max + 1
        s = jax.nn.log_softmax(dist_logits / temperature, axis=-1)
        t = jax.nn.softmax(jax.lax.stop_gradient(
            t_pred_distri.reshape(b, a, 4, nbins)) / temperature, axis=-1)
        kl = (t * (jnp.log(jnp.maximum(t, 1e-12)) - s)).sum(-1)   # [B,A,4]
        n_pos4 = jnp.maximum(fg.sum() * 4, 1.0)
        kl_mean = (kl * fg[..., None]).sum() / n_pos4             # scalar mean
        d_loss_dfl = (kl_mean * temperature ** 2 * bbox_weight).sum() / denom
    else:
        loss_dfl = jnp.zeros(())
        d_loss_dfl = jnp.zeros(())

    d_loss_cls = distill_loss_cls(pred_scores, t_pred_scores, temperature)
    if distill_feat:
        s_feats = [f for f, _, _ in head_outs]
        t_feats = [f for f, _, _ in teacher_outs]
        d_loss_cw = distill_loss_cw(s_feats, t_feats)
    else:
        d_loss_cw = jnp.zeros(())

    # jnp so epoch_num may be a traced scalar (one compile for all epochs)
    decay = ((1 - jnp.cos(epoch_num * jnp.pi / max_epoch)) / 2) * (0.01 - 1) + 1
    d_loss_dfl = d_loss_dfl * decay
    d_loss_cls = d_loss_cls * decay
    d_loss_cw = d_loss_cw * decay

    loss_cls_all = loss_cls + d_loss_cls * distill_weight["class"]
    loss_dfl_all = loss_dfl + d_loss_dfl * distill_weight["dfl"]
    total = (loss_weight["class"] * loss_cls_all + loss_weight["iou"] * loss_iou
             + loss_weight["dfl"] * loss_dfl_all + loss_weight["cwd"] * d_loss_cw)
    comps = {"iou": loss_weight["iou"] * loss_iou,
             "dfl": loss_weight["dfl"] * loss_dfl_all,
             "cls": loss_weight["class"] * loss_cls_all,
             "cwd": loss_weight["cwd"] * d_loss_cw}
    return total, comps
