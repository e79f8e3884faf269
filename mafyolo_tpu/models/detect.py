"""Anchor-free Detect head decode, pure jnp (reference Detect_yaml, yolo.py:301-396).

The model (MAFYolo) returns per-level tuples (stem_feat, cls_sigmoid, reg_distri) in
NHWC. Training mode flattens to [B, A, nc] / [B, A, 4*(reg_max+1)] over all levels
(yolo.py:332-354); eval mode applies the DFL expectation (softmax over reg_max+1 bins
matmul'd with linspace(0, reg_max), the frozen proj_conv of yolo.py:322-330), converts
ltrb distances at anchor centers to xywh boxes, scales by stride, and concatenates
[boxes, ones, cls] (yolo.py:355-396). All shapes are static; the decode jit-fuses with
the network forward.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def flatten_train_outputs(head_outs: Sequence[Tuple]):
    """-> (feats hw list, cls_scores [B,A,nc], reg_distri [B,A,4*(reg_max+1)])."""
    feats, cls_list, reg_list = [], [], []
    for feat, cls, reg in head_outs:
        b, h, w, _ = cls.shape
        feats.append((h, w))
        cls_list.append(cls.reshape(b, h * w, -1))
        reg_list.append(reg.reshape(b, h * w, -1))
    return feats, jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1)


def anchor_points_for(hw_list: Sequence[Tuple[int, int]], strides: Sequence[int],
                      grid_cell_offset: float = 0.5):
    """Eval-mode anchors: grid-unit center points + per-anchor stride column.

    Mirrors generate_anchors(is_eval=True) (yolov6/assigners/anchor_generator.py:11-25):
    points are (x+0.5, y+0.5) in feature-grid units, row-major over (h, w).
    """
    points, stride_col = [], []
    for (h, w), s in zip(hw_list, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        stride_col.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return jnp.concatenate(points, 0), jnp.concatenate(stride_col, 0)


def generate_anchors_train(hw_list: Sequence[Tuple[int, int]], strides: Sequence[int],
                           grid_cell_size: float = 5.0, grid_cell_offset: float = 0.5):
    """Train-mode anchors (anchor_generator.py:26-51).

    Returns (anchors [A,4] image-scale cell boxes, anchor_points [A,2] image-scale
    centers, num_anchors_list, stride_tensor [A,1]).
    """
    anchors, points, counts, stride_col = [], [], [], []
    for (h, w), s in zip(hw_list, strides):
        half = grid_cell_size * s * 0.5
        sx = (jnp.arange(w, dtype=jnp.float32) + grid_cell_offset) * s
        sy = (jnp.arange(h, dtype=jnp.float32) + grid_cell_offset) * s
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor = jnp.stack([gx - half, gy - half, gx + half, gy + half], -1)
        anchors.append(anchor.reshape(-1, 4))
        points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        counts.append(h * w)
        stride_col.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return (jnp.concatenate(anchors, 0), jnp.concatenate(points, 0), counts,
            jnp.concatenate(stride_col, 0))


def dist2bbox(distance, anchor_points, box_format: str = "xyxy"):
    """ltrb distances -> boxes (yolov6/utils/general.py:29-40)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if box_format == "xyxy":
        return jnp.concatenate([x1y1, x2y2], -1)
    c_xy = (x1y1 + x2y2) / 2
    wh = x2y2 - x1y1
    return jnp.concatenate([c_xy, wh], -1)


def bbox2dist(anchor_points, bbox, reg_max: int):
    """xyxy boxes -> clipped ltrb distances (general.py:43-49)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    lt = anchor_points - x1y1
    rb = x2y2 - anchor_points
    return jnp.clip(jnp.concatenate([lt, rb], -1), 0, reg_max - 0.01)


def dfl_decode(reg_distri, reg_max: int):
    """[..., 4*(reg_max+1)] -> ltrb [..., 4] via softmax expectation."""
    shape = reg_distri.shape[:-1]
    logits = reg_distri.reshape(*shape, 4, reg_max + 1).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return probs @ proj


def decode_simota_eval(head_outs: Sequence[Tuple], strides: Sequence[int]):
    """SimOTA eval decode (Detect_simota eval branch, yolo.py:427-454):
    per-level raw (cls, reg, obj) -> [B, A, 5+nc] with xy=(xy+grid)*stride,
    wh=exp(wh)*stride, obj/cls sigmoided. Layout (xywh, obj, cls) feeds
    batched_nms directly.
    """
    outs = []
    for (cls, reg, obj), s in zip(head_outs, strides):
        b, h, w, _ = cls.shape
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1).reshape(1, h * w, 2)
        reg = reg.reshape(b, h * w, -1).astype(jnp.float32)
        xy = (reg[..., :2] + grid) * s
        wh = jnp.exp(reg[..., 2:4]) * s
        obj = jax.nn.sigmoid(obj.reshape(b, h * w, 1).astype(jnp.float32))
        cls = jax.nn.sigmoid(cls.reshape(b, h * w, -1).astype(jnp.float32))
        outs.append(jnp.concatenate([xy, wh, obj, cls], -1))
    return jnp.concatenate(outs, 1)


def decode_eval(head_outs: Sequence[Tuple], strides: Sequence[int], reg_max: int = 16,
                use_dfl: bool = True):
    """Eval decode -> [B, A, 4+1+nc] with xywh image-scale boxes, obj==1, cls scores.

    Mirrors Detect_yaml eval branch (yolo.py:355-396).
    """
    hw_list, cls_scores, reg_distri = flatten_train_outputs(head_outs)
    points, stride_col = anchor_points_for(hw_list, strides)
    ltrb = dfl_decode(reg_distri, reg_max) if use_dfl else reg_distri
    boxes = dist2bbox(ltrb, points, box_format="xywh") * stride_col
    b, a, _ = cls_scores.shape
    ones = jnp.ones((b, a, 1), dtype=boxes.dtype)
    return jnp.concatenate([boxes, ones, cls_scores.astype(boxes.dtype)], axis=-1)
