"""Box geometry + IoU-loss zoo, pure jnp.

Parity targets: yolov6/utils/figure_iou.py:7-139 (giou/diou/ciou/siou with the
reference's exact eps placement -- h gets +eps, w does not), yolov6/utils/nms.py:21-28
(xywh2xyxy), yolov6/utils/general.py:52-58.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def xywh2xyxy(x):
    """[..., 4] center-format -> corner-format."""
    xy, wh = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def xyxy2xywh(x):
    x1y1, x2y2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)


def box_iou_pairwise(box1, box2, eps: float = 1e-7):
    """[N,4] x [M,4] xyxy -> IoU [N,M] (utils/general.py box_iou semantics)."""
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    a1 = jnp.clip(box1[:, 2:] - box1[:, :2], 0).prod(-1)
    a2 = jnp.clip(box2[:, 2:] - box2[:, :2], 0).prod(-1)
    return inter / (a1[:, None] + a2[None, :] - inter + eps)


# IoU_Cal.momentum (yolov6/utils/wiou.py:14): running mean converges with a
# 7000-step half-life.
WIOU_MOMENTUM = 1.0 - 0.5 ** (1.0 / 7000.0)


def wiou_loss(box1, box2, iou_mean, mask=None, gamma: float = 1.9,
              delta: float = 3.0):
    """Wise-IoU v3 with non-monotonic focusing (yolov6/utils/wiou.py:85-90,
    71-79; dispatched from figure_iou.py iou_type=='wiou').

    box1/box2: aligned xyxy [..., 4]. iou_mean: running mean of the detached
    IoU loss (a traced scalar; the reference keeps it as the IoU_Cal.iou_mean
    class attribute and updates it BEFORE the loss reads it, wiou.py:47,63-66).
    mask: optional [...] weights selecting the positives the mean is taken over
    (the reference computes on masked_select-ed positives only).
    Returns (per-element loss [...], new running mean).
    """
    pred_xy = (box1[..., :2] + box1[..., 2:4]) / 2
    tgt_xy = (box2[..., :2] + box2[..., 2:4]) / 2
    pred_wh = box1[..., 2:4] - box1[..., :2]
    tgt_wh = box2[..., 2:4] - box2[..., :2]
    min_c = jnp.minimum(box1[..., :4], box2[..., :4])
    max_c = jnp.maximum(box1[..., :4], box2[..., :4])
    s_inter = jnp.clip(min_c[..., 2:4] - max_c[..., :2], 0).prod(-1)
    s_union = pred_wh.prod(-1) + tgt_wh.prod(-1) - s_inter
    wh_box = max_c[..., 2:4] - min_c[..., :2]
    l2_box = jnp.square(wh_box).sum(-1)
    l2_center = jnp.square(pred_xy - tgt_xy).sum(-1)
    # NB: named 'iou' in the reference but it is the LOSS-oriented 1 - IoU
    iou = 1.0 - s_inter / s_union
    iou_det = lax.stop_gradient(iou)

    if mask is None:
        batch_mean = iou_det.mean()
    else:
        m = mask.astype(jnp.float32)
        batch_mean = (iou_det * m).sum() / jnp.maximum(m.sum(), 1.0)
    new_mean = (1.0 - WIOU_MOMENTUM) * iou_mean + WIOU_MOMENTUM * batch_mean

    dist = jnp.exp(l2_center / lax.stop_gradient(l2_box))
    loss = dist * iou
    # non-monotonic FM (monotonous=False default, wiou.py:71-79)
    beta = iou_det / new_mean
    alpha = delta * jnp.power(gamma, beta - delta)
    return loss * beta / alpha, new_mean


def iou_loss(box1, box2, iou_type: str = "giou", box_format: str = "xyxy",
             eps: float = 1e-10):
    """Elementwise IoU loss between aligned boxes [..., 4] -> [...].

    Mirrors IOUloss.__call__ (figure_iou.py:23-112) including its asymmetric eps
    (heights get +eps, widths don't) and per-variant penalty terms.
    """
    if box_format == "xywh":
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
    b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    t = iou_type.lower()
    if t == "giou":
        c_area = cw * ch + eps
        iou = iou - (c_area - union) / c_area
    elif t in ("diou", "ciou"):
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if t == "diou":
            iou = iou - rho2 / c2
        else:
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = lax.stop_gradient(v / (v - iou + (1 + eps)))
            iou = iou - (rho2 / c2 + v * alpha)
    elif t == "siou":
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5
        sigma = jnp.sqrt(s_cw ** 2 + s_ch ** 2) + eps
        sin_a1 = jnp.abs(s_cw) / sigma
        sin_a2 = jnp.abs(s_ch) / sigma
        sin_alpha = jnp.where(sin_a1 > math.sqrt(2) / 2, sin_a2, sin_a1)
        angle_cost = jnp.cos(jnp.arcsin(jnp.clip(sin_alpha, -1, 1)) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = ((1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4)
        iou = iou - 0.5 * (distance_cost + shape_cost)
    elif t != "iou":
        raise ValueError(f"unknown iou_type {iou_type!r}")
    return (1.0 - iou).squeeze(-1)
