"""Pallas TPU kernel: exact greedy NMS without materializing the MxM IoU matrix.

The XLA path (ops/nms.py) builds a [M,M] IoU matrix in HBM and iterates a
fixpoint over it -- at M=2000 x batch 32 that is ~0.5GB of HBM traffic per
iteration and ~30ms/batch. This kernel keeps the boxes entirely in VMEM
([4, M] layout, M lanes) and walks candidates in score order, computing each
suppressor's IoU row on the fly: zero HBM traffic beyond the initial copy,
M sequential steps of [1, M] VPU ops.

Boxes must arrive score-descending with class offsets already applied (exactly
what ops/nms.py feeds the fixpoint). Output keep mask matches torchvision
greedy semantics bit-for-bit (same keep rule: suppress iou > thr, j > i).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, m: int, iou_thres: float):
    # boxes_ref [1, 4, M]; valid/keep [1, 1, M] float32 (1.0 = alive)
    x1 = boxes_ref[0, 0:1, :]
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    area = (x2 - x1) * (y2 - y1)                       # [1, M]
    keep_ref[0, :, :] = valid_ref[0, :, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, m), 1)  # [1, M]

    def body(i, _):
        sel = (lane == i).astype(jnp.float32)
        keep = keep_ref[0, :, :]
        keep_i = jnp.sum(keep * sel)

        @pl.when(keep_i > 0.0)
        def _():
            bx1 = jnp.sum(x1 * sel)
            by1 = jnp.sum(y1 * sel)
            bx2 = jnp.sum(x2 * sel)
            by2 = jnp.sum(y2 * sel)
            barea = (bx2 - bx1) * (by2 - by1)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (area + barea - inter + 1e-7)
            sup = (iou > iou_thres) & (lane > i)
            keep_ref[0, :, :] = jnp.where(sup, 0.0, keep_ref[0, :, :])

        return 0

    lax.fori_loop(0, m, body, 0)


@partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_nms(boxes, valid, iou_thres: float = 0.65,
                      interpret: bool = False):
    """boxes [B, M, 4] score-descending (offset applied), valid [B, M] bool
    -> keep [B, M] bool. Grid over the batch; one image per program."""
    b, m, _ = boxes.shape
    boxes_t = jnp.swapaxes(boxes, 1, 2).astype(jnp.float32)     # [B, 4, M]
    valid_f = valid.astype(jnp.float32)[:, None, :]             # [B, 1, M]
    kernel = partial(_nms_kernel, m=m, iou_thres=iou_thres)
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        interpret=interpret,
    )(boxes_t, valid_f)
    return keep[:, 0, :] > 0.5
