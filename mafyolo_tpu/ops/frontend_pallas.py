"""Fused multi-layer Pallas front-end: layers 0-1 (the two stride-2 RepVGG
convs) of every MAF-YOLO graph in ONE kernel.

Why (round-2 lesson, docs/STATUS.md): XLA lowers the small-channel front-end
convs at ~1 TFLOP/s (layer0 alone is 4.45 ms of a 15 ms bs32@640 forward), and
every single-op Pallas replacement LOST because one pallas_call boundary
forfeits XLA's elementwise fusion. The fix is a multi-layer kernel whose
intermediate (the 157 MB layer-0 output) never touches HBM.

Formulation -- all MXU, no strided lane access:
  * The input is space-to-depth packed by 4 on the host graph (prep_s2d):
    u8 [B,H,W,3] -> planar u8 [B, 48, (Hb+2)*LP], plane q=(dy',dx',c),
    flat lane r*LP + x holding pixel (4(r-2)+dy', 4x+dx') of BGR channel c,
    with 2 zero halo rows on top and zero column pads (LP >= Wb = W/4).
  * A 3x3/s2 conv is a 2x2/s1 conv on the x2-space-to-depth tensor with
    remapped weights (the S2D identity; cf. models/blocks.py S2DStem).
    Layer 0 consumes the x4-blocked input and emits its output x2-blocked
    (4*C0 planes on the same Hb x Wb grid), so layer 1 (3x3/s2 at H/2) is a
    plane-contraction on the very same grid, emitting native C1 planes.
  * Each stage = ONE MXU dot: W[Cout_planes, 4*Cin_planes] @ X[4*Cin_planes,
    S] where X concatenates 4 lane-rolled copies of the input planes (rolls
    {LP+1, LP, 1, 0} realize the (dy,dx) in {-1,0}^2 taps; zero column pads
    make conv zero-padding fall out of the rolls for free).
  * /255 normalization and the BGR->RGB flip are folded into the layer-0
    weights: the kernel eats raw loader bytes.

Replaces: reference stem+layer1 cuDNN convs (RepVGGBlock deploy forward,
/root/reference/yolov6/layers/common.py:166-284, dispatched by
yolo.py:186-201).

Output is planar [B, C1, Hb*LP]; frontend_apply unpacks to NHWC and runs the
rest of the graph (GraphNet skip_until=1). Parity vs the XLA path is pinned
by tests/test_frontend_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lanepad_for(w: int) -> int:
    """Lane padding for blocked width Wb = w//4 (>=128, 128-aligned)."""
    return max(128, _round_up(w // 4, 128))


def prep_s2d(imgs_u8, lanepad: int | None = None):
    """u8 NHWC [B,H,W,3] -> planar s2d u8 [B, 48, (Hb+2)*LP].

    Plane q = (dy'*4 + dx')*3 + c (c in BGR byte order); flat lane r*LP + x =
    pixel (4(r-2)+dy', 4x+dx') -- two zero halo rows prepended, column pads
    zeroed. Pure reshape/transpose/pad.
    """
    b, h, w, c = imgs_u8.shape
    hb, wb = h // 4, w // 4
    lp = lanepad or lanepad_for(w)
    x = imgs_u8.reshape(b, hb, 4, wb, 4, c)
    x = x.transpose(0, 2, 4, 5, 1, 3)            # [B, dy', dx', c, Hb, Wb]
    x = x.reshape(b, 48, hb, wb)
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 0), (0, lp - wb)))
    return x.reshape(b, 48, (hb + 2) * lp)


# Roll-group order shared by the weight builders and the kernel's tap concat:
# g = 0:(dy=-1,dx=-1), 1:(dy=-1,dx=0), 2:(dy=0,dx=-1), 3:(dy=0,dx=0).
def _group(dy, dx):
    return np.where(dy < 0, 0, 2) + np.where(dx < 0, 0, 1)


def _w0_blocked(k0):
    """[3,3,3,C0] HWIO (RGB) -> W0 [4*C0, 4*48].

    Output plane (e*2+f)*C0 + o holds L0out[2Y+e, 2X+f, o]; input column
    g*48 + q with q = (dy'*4+dx')*3 + c_bgr. /255 and BGR fold included.
    """
    k0 = np.asarray(k0, np.float32)
    c0 = k0.shape[-1]
    k0 = k0[:, :, ::-1, :] / 255.0               # BGR byte order + /255
    e, f, o, u, v, c = np.meshgrid(
        np.arange(2), np.arange(2), np.arange(c0), np.arange(3), np.arange(3),
        np.arange(3), indexing="ij")
    yoff = 2 * e + u - 1                         # row offset within x4 block
    xoff = 2 * f + v - 1
    dy, dx = np.where(yoff < 0, -1, 0), np.where(xoff < 0, -1, 0)
    q = ((yoff - 4 * dy) * 4 + (xoff - 4 * dx)) * 3 + c
    rows = (e * 2 + f) * c0 + o
    cols = _group(dy, dx) * 48 + q
    # host numpy scatter: an eager jnp .at[].add on a tunneled chip pays a
    # slow remote scatter compile (utils/envs.py gotcha list)
    w = np.zeros((4 * c0, 4 * 48), np.float32)
    np.add.at(w, (rows.ravel(), cols.ravel()),
              np.asarray(k0)[u.ravel(), v.ravel(), c.ravel(), o.ravel()])
    return w


def _w1_blocked(k1):
    """[3,3,C0,C1] HWIO -> W1 [C1, 4*(4*C0)].

    Consumes the x2-blocked layer-0 planes ((e*2+f)*C0 + i, _w0_blocked's
    output order) and emits native L1 channels.
    """
    k1 = np.asarray(k1, np.float32)
    c0, c1 = k1.shape[-2], k1.shape[-1]
    o, u, v, i = np.meshgrid(np.arange(c1), np.arange(3), np.arange(3),
                             np.arange(c0), indexing="ij")
    yoff, xoff = u - 1, v - 1                    # offsets within x2 blocks
    dy, dx = np.where(yoff < 0, -1, 0), np.where(xoff < 0, -1, 0)
    q = ((yoff - 2 * dy) * 2 + (xoff - 2 * dx)) * c0 + i
    cols = _group(dy, dx) * (4 * c0) + q
    w = np.zeros((c1, 16 * c0), np.float32)
    np.add.at(w, (o.ravel(), cols.ravel()),
              np.asarray(k1)[u.ravel(), v.ravel(), i.ravel(), o.ravel()])
    return w


def build_frontend_weights(k0, b0, k1, b1):
    """Folded layer0/layer1 deploy kernels+biases -> frontend_l01 inputs."""
    return dict(
        w0=jnp.asarray(_w0_blocked(k0), jnp.bfloat16),
        b0=jnp.asarray(np.tile(np.asarray(b0, np.float32), 4)
                       .reshape(-1, 1)),
        w1=jnp.asarray(_w1_blocked(k1), jnp.bfloat16),
        b1=jnp.asarray(np.asarray(b1, np.float32).reshape(-1, 1)),
        c0=k0.shape[-1], c1=k1.shape[-1])


def _l01_kernel(x_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, scratch, sem,
                *, rows: int, lp: int, wb: int):
    """Grid (B, Hb // rows): computes `rows` L1-output rows for one image."""
    bi = pl.program_id(0)
    band = pl.program_id(1)
    s2 = (rows + 2) * lp
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(band * rows * lp, s2)], scratch, sem)
    dma.start()
    dma.wait()
    planes = scratch[...].astype(jnp.int32).astype(jnp.bfloat16)  # [48, S2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s2), 1)
    colmask = ((lane & (lp - 1)) < wb).astype(jnp.bfloat16)
    # Out-of-image top halo: scratch rows 0-1 of the FIRST band are the zero
    # pad rows prep_s2d prepended; relu(bias) computed there is NOT zero for
    # nonzero folded biases and would leak into layer 1's dy=-1 taps. Zero
    # those rows of y0 explicitly (bands > 0 hold real rows there).
    in_image = jnp.logical_or(band > 0, lane >= 2 * lp)
    mask0 = colmask * in_image.astype(jnp.bfloat16)

    def blocked_conv(x, w_ref, b_ref, mask):
        # dy=-1 shift (one grid row = LP lanes, 128-aligned) as slice+concat:
        # Mosaic's dynamic_rotate rejects multi-register roll amounts, and the
        # explicit zero fill gives a true zero top halo instead of wrap-around
        c = x.shape[0]
        up = jnp.concatenate(
            [jnp.zeros((c, lp), x.dtype), x[:, :-lp]], axis=1)
        # jnp.roll, not pltpu.roll: Mosaic's dynamic_rotate lowering of the
        # latter rejects bf16 multi-register vectors on this toolchain
        taps = jnp.concatenate(
            [jnp.roll(up, 1, axis=1), up,
             jnp.roll(x, 1, axis=1), x], axis=0)            # [4*Cin, S2]
        y = jax.lax.dot_general(
            w_ref[...], taps, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b_ref[...], 0.0).astype(jnp.bfloat16)
        # conv zero-padding relies on pad lanes STAYING zero: relu(bias) at
        # pad lanes would leak into the next stage's dx-rolls
        return y * mask if mask is not None else y

    y0 = blocked_conv(planes, w0_ref, b0_ref, mask0)         # [4*C0, S2]
    y1 = blocked_conv(y0, w1_ref, b1_ref, None)              # [C1, S2]
    out_ref[0] = y1[:, 2 * lp:]


def _pick_rows(hb: int, c0: int, c1: int, lp: int) -> int:
    """Largest divisor of Hb whose band VMEM footprint stays under ~10MB.

    Per-lane bytes: u8 scratch 48 + bf16 planes 96 + X0 taps 2*192 + Y0
    2*4*C0 + X1 taps 2*16*C0 + Y1 2*C1 (transients double-counted for slack).
    """
    per_lane = 48 + 96 + 2 * 192 + 2 * 4 * c0 + 2 * 16 * c0 + 2 * c1
    budget = 10 * 2**20
    best = 1
    for r in range(1, hb + 1):
        if hb % r == 0 and (r + 2) * lp * per_lane <= budget:
            best = r
    return best


@partial(jax.jit, static_argnames=("c0", "c1", "hb", "wb", "lp", "interpret"))
def frontend_l01(xp, w0, b0, w1, b1, c0: int, c1: int, hb: int, wb: int,
                 lp: int, interpret: bool = False):
    """s2d-planar u8 [B, 48, (Hb+2)*LP] -> native L1 output planes
    [B, C1, Hb*LP] bf16 (plane o, flat lane z*LP + x = L1out[z, x, o])."""
    b = xp.shape[0]
    rows = _pick_rows(hb, c0, c1, lp)
    grid = (b, hb // rows)

    kern = partial(_l01_kernel, rows=rows, lp=lp, wb=wb)
    return pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c1, rows * lp),
                               lambda bi, ri: (bi, 0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c1, hb * lp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((48, (rows + 2) * lp), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w0, b0, w1, b1)


def unpack_nhwc(y, hb: int, wb: int):
    """Planar [B, C1, Hb*LP] -> NHWC [B, Hb, Wb, C1]."""
    b, c1, flat = y.shape
    lp = flat // hb
    return y.reshape(b, c1, hb, lp)[..., :wb].transpose(0, 2, 3, 1)


def frontend_params_from_folded(variables):
    """(k0, b0, k1, b1) of the folded deploy layer0/layer1 RepVGG convs."""
    p = variables["params"]["net"]
    c0 = p["layer0"]["fused"]["conv"]
    c1 = p["layer1"]["fused"]["conv"]
    return c0["kernel"], c0["bias"], c1["kernel"], c1["bias"]


def frontend_supported(specs, save) -> bool:
    """True when layers 0-1 are the standard RepVGG 3x3/s2 pair this kernel
    replaces and nothing else consumes their outputs (all shipped MAF
    graphs)."""
    s0, s1 = specs[0], specs[1]
    return (s0.kind == "RepVGGBlock" and dict(s0.kwargs).get("cin") == 3
            and dict(s0.kwargs).get("stride") == 2
            and s1.kind == "RepVGGBlock"
            and dict(s1.kwargs).get("stride") == 2 and s1.frm == (-1,)
            and 0 not in save and 1 not in save)


def frontend_apply(model, variables, imgs_u8, interpret: bool = False):
    """Forward raw u8 BGR imgs through the fused front-end + the rest of the
    deploy graph (model built with skip_until=1)."""
    k0, b0, k1, b1 = frontend_params_from_folded(variables)
    wts = build_frontend_weights(k0, b0, k1, b1)
    b, h, w, _ = imgs_u8.shape
    hb, wb = h // 4, w // 4
    lp = lanepad_for(w)
    xp = prep_s2d(imgs_u8, lp)
    y = frontend_l01(xp, wts["w0"], wts["b0"], wts["w1"], wts["b1"],
                     c0=wts["c0"], c1=wts["c1"], hb=hb, wb=wb, lp=lp,
                     interpret=interpret)
    x1 = unpack_nhwc(y, hb, wb)
    return model.apply(variables, x1, train=False)
