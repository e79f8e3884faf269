"""Pallas TPU kernel for the stem convolution (3x3 / stride-2 / Cin=3).

Why: XLA lowers the Cin=3 first conv at ~1 TFLOP/s (3.95 ms of a 13.8 ms
MAF-YOLO-N forward at bs32@640) -- the channel dim is too small for its conv
paths. This kernel reformulates the conv over a "plane" layout where the LANE
dim is the output x coordinate:

  prep (XLA, ~0.4 ms): u8 NHWC [B,H,W,3] -> [B,H,6,W/2] u8, plane p=3*dx'+c
  holding merged lane 6x+p of the row (i.e. input column 2x+dx', channel c).

  kernel: for output row r and tap (dy, dx, c) of the 3x3 kernel, the needed
  input vector over all x is exactly one plane of input row 2r+dy-1, shifted
  by {-1, 0, 0} lanes for dx = {0, 1, 2}:
      col = 2x + dx - 1  ->  lane 6x + (3dx + c - 3)
      dx=0 -> plane c+3 rolled right by one x (zero at x=0)
      dx=1 -> plane c
      dx=2 -> plane c+3
  The 27 tap vectors form X [32(pad), W/2]; the conv collapses to ONE MXU dot
  Wt[O,32] @ X per output row, with bias+ReLU fused. /255 normalization and
  the BGR->RGB flip are folded into Wt, so the kernel eats raw loader bytes.

Output is plane-major [B, H/2, O, W/2] ("NHCW"); planar_to_nhwc converts.
Numerical parity vs lax.conv is tested in tests/test_stem_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_PROGRAM = 8


def _round_up(x, m):
    return -(-x // m) * m


def _pack_planes(x_u8):
    """[B, H, W, 3] u8 -> [B, H+2, 8, W2p] u8: one zero row top/bottom, the 6
    planes padded to 8, and the W/2 lane dim padded to a multiple of 128
    (Mosaic DMA slices need dim -2 aligned to 8 and dim -1 to 128)."""
    b, h, w, c = x_u8.shape
    w2 = w // 2
    xp = x_u8.reshape(b, h, w2, 6).transpose(0, 1, 3, 2)
    return jnp.pad(xp, ((0, 0), (1, 1), (0, 2), (0, _round_up(w2, 128) - w2)))


def _prep_weights(kernel, dtype):
    """[3,3,3,O] HWIO (RGB) -> Wt [3, 32, O] f32: tap rows ordered (dy, dx*3+c
    in BGR input order), /255 folded, rows 9..31 zero. jnp ops: traceable."""
    k = jnp.asarray(kernel, jnp.float32) / 255.0
    o = k.shape[-1]
    # (dy, dx, c_bgr, o) with c_bgr = reversed channel order
    taps = k[:, :, ::-1, :].reshape(3, 9, o)
    return jnp.pad(taps, ((0, 0), (0, 23), (0, 0))).astype(dtype)


def _stem_kernel(x_hbm, wt_ref, bias_ref, out_ref, scratch, sem):
    """Grid (B, H2 // R). Computes R output rows for one batch element."""
    r0 = pl.program_id(1) * ROWS_PER_PROGRAM
    bi = pl.program_id(0)
    # input rows needed: (2*r0 - 1 .. 2*(r0+R-1) + 1) + 1 pad offset
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(2 * r0, 2 * ROWS_PER_PROGRAM + 1)], scratch, sem)
    dma.start()
    dma.wait()
    # Mosaic has no direct u8->f32 cast; widen through int32
    rows = scratch[...].astype(jnp.int32).astype(jnp.float32)  # [2R+1, 8, W2p]
    w2p = rows.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (3, w2p), 1)

    wt = wt_ref[...]                               # [3, 32, O]
    w_flat = wt.reshape(96, wt.shape[-1]).T        # [O, 96], cols dy*32 + tap
    for r in range(ROWS_PER_PROGRAM):
        groups = []
        for dy in range(3):
            planes = rows[2 * r + dy]              # [6, W2]
            base = planes[0:3]                     # dx=1: plane c
            high = planes[3:6]                     # dx=2: plane c+3
            # dx=0: plane c+3 shifted right one x, zero-filled at x=0
            shifted = jnp.where(lane == 0, 0.0,
                                pltpu.roll(high, shift=1, axis=1))
            taps9 = jnp.concatenate([shifted, base, high], axis=0)  # [9, W2]
            groups.append(jnp.pad(taps9, ((0, 23), (0, 0))))        # [32, W2]
        x96 = jnp.concatenate(groups, axis=0)      # [96, W2]
        y = jax.lax.dot_general(
            w_flat, x96,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [O, W2]
        y = jnp.maximum(y + bias_ref[...].reshape(-1, 1), 0.0)
        out_ref[0, r] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("dtype", "interpret"))
def stem_conv_s2(x_u8, kernel, bias, dtype=jnp.bfloat16, interpret=False):
    """u8 NHWC [B,H,W,3] (BGR byte order, raw 0..255) -> plane-major
    [B, H/2, O, W/2] of relu(conv3x3_s2(rgb(x)/255) + bias)."""
    b, h, w, _ = x_u8.shape
    h2, w2 = h // 2, w // 2
    w2p = _round_up(w2, 128)
    o = kernel.shape[-1]
    xp = _pack_planes(x_u8)
    wt = _prep_weights(kernel, jnp.float32)
    grid = (b, h2 // ROWS_PER_PROGRAM)

    out = pl.pallas_call(
        _stem_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS_PER_PROGRAM, o, w2p),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, o, w2p), dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * ROWS_PER_PROGRAM + 1, 8, w2p), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, wt, jnp.asarray(bias, jnp.float32))
    return out[..., :w2]


def planar_to_nhwc(y):
    """[B, H, C, W] -> [B, H, W, C]."""
    return y.transpose(0, 1, 3, 2)


def stem_supported(specs) -> bool:
    """True when layer0 is the standard RepVGG 3x3/s2 RGB stem this kernel
    replaces (all shipped MAF graphs)."""
    s0 = specs[0]
    kw = dict(s0.kwargs)
    return (s0.kind == "RepVGGBlock" and kw.get("cin") == 3
            and kw.get("stride") == 2)


def stem_params_from_folded(variables):
    """(kernel [3,3,3,O], bias [O]) of the folded deploy stem."""
    conv = variables["params"]["net"]["layer0"]["fused"]["conv"]
    return conv["kernel"], conv["bias"]


def pallas_stem_apply(model, variables, imgs_u8, dtype=jnp.bfloat16):
    """Forward imgs through the Pallas stem + the skip_stem deploy model.

    Replaces `model.apply(vars, norm(u8))` for a model built with
    skip_stem=True: the kernel consumes the raw uint8 batch directly (BGR
    flip + /255 are folded into its weights)."""
    k, bias = stem_params_from_folded(variables)
    y0 = planar_to_nhwc(stem_conv_s2(imgs_u8, k, bias, dtype=dtype))
    return model.apply(variables, y0, train=False)
