"""Fused multi-layer Pallas front-end: layers 0-2 (the two stride-2 RepVGG
convs + the first RepHDW stage) of every MAF-YOLO graph in ONE kernel.

Why (round-2 lesson, docs/STATUS.md): XLA lowers the small-channel front-end
convs at ~1 TFLOP/s (layers 0-1 are 4.8 ms and layer 2 another 3.1 ms of a
15 ms bs32@640 forward), and every single-op Pallas replacement LOST because
one pallas_call boundary forfeits XLA's elementwise fusion. The fix is a
multi-layer kernel whose intermediates (the 160-level feature maps) never
touch HBM. Round-3 additions over the layers-0-1 version: the space-to-depth
input pack moves to the HOST loader (the device-side u8 transpose cost
2.3 ms), the kernel emits NHWC directly via an MXU eye-contraction (the
planar->NHWC XLA transpose cost 3.3 ms), and the RepHDW stage is fused in
with halo-row overlap between grid bands.

Formulation -- all MXU dots + VPU stencils, no strided lane access:
  * The input is space-to-depth packed by 4 on the host: u8 [B,H,W,3] ->
    planar u8 [B, 48, R_tot*LP], plane q=(dy',dx',c), flat lane z*LP + x
    holding pixel (4*(z-top)+dy', 4x+dx') of BGR channel c, with `top`=halo+2
    zero rows above, `halo` below, and zero column pads when LP > Wb = W/4.
  * A 3x3/s2 conv is a 2x2/s1 conv on the x2-space-to-depth tensor with
    remapped weights (the S2D identity). Layer 0 consumes the x4-blocked
    input and emits its output x2-blocked (4*C0 planes on the Hb x Wb grid);
    layer 1 (3x3/s2 at H/2) is then a plane contraction on the same grid,
    emitting native C1 planes.
  * Each RepVGG stage = ONE MXU dot: W[Cout_planes, 4*Cin_planes] @
    X[4*Cin_planes, S] where X concatenates 4 lane-rolled copies of the
    input planes (rolls {LP+1, LP, 1, 0} realize the (dy,dx) in {-1,0}^2
    taps; roll-wrapped edge lanes are masked explicitly so LP may equal Wb).
  * Layer 2 (RepHDW, reference common.py:928-946 deploy form) runs on the
    native-plane y1: the 1x1 convs are plain plane contractions on the MXU,
    the k=3 depthwise conv is a 9-tap VPU stencil (lane rolls + row shifts),
    SiLU on the VPU. Each DW consumes one halo row per side; grid bands
    overlap by `halo` rows of redundant compute instead of communicating.
  * /255 normalization and the BGR->RGB flip are folded into the layer-0
    weights: the kernel eats raw loader bytes.
  * Output: an MXU contraction with the identity transposes [C2, S] ->
    [S, C2] in VMEM, so the kernel writes NHWC(+lane-padded W) directly and
    the downstream graph slices [:, :, :Wb, :] for free.

Replaces: the reference's stem+stage-1 cuDNN convs (RepVGGBlock deploy
forward /root/reference/yolov6/layers/common.py:166-284 and the RepHDW
deploy chain common.py:898-946, dispatched by yolo.py:186-201).

Parity vs the XLA deploy path is pinned by tests/test_frontend_pallas.py
(interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lanepad_for(w: int) -> int:
    """Lane stride per feature row for blocked width Wb = w//4.

    Exactly Wb when sublane-aligned: every kernel op streams the flat lane
    dim, so pad lanes are pure waste (at 640px, LP=256 vs 160 made the
    whole kernel 1.6x more expensive). Row shifts are slice+concat at
    arbitrary offsets (Mosaic relayouts them); _pick_rows keeps band DMA
    offsets 128-lane-aligned."""
    wb = w // 4
    return wb if wb % 8 == 0 else _round_up(wb, 8)


@dataclasses.dataclass(frozen=True)
class FrontendCfg:
    """Static geometry + channel structure of the fused front-end."""
    c0: int                    # layer-0 output channels
    c1: int                    # layer-1 output channels
    hb: int                    # H // 4 (layer-1/2 feature rows)
    wb: int                    # W // 4
    lp: int                    # lane stride per feature row (>= wb)
    depth: int = 0             # RepHDW bottleneck count (0 = layers 0-1 only)
    c_: int = 0                # RepHDW split width  (cout * expansion)
    mid: int = 0               # bottleneck expand width (c_ * depth_expansion)
    c2: int = 0                # RepHDW output channels

    @property
    def halo(self) -> int:     # DW halo rows consumed per side by layer 2
        return self.depth

    @property
    def cp(self) -> int:       # sublane-tile-aligned split width (weights
        return _round_up(self.c_, 16)  # are zero-padded c_ -> cp at build)

    @property
    def top(self) -> int:      # zero rows the host pack prepends
        return self.halo + 2

    @property
    def rows_total(self) -> int:
        return self.hb + self.top + self.halo

    @property
    def flat_len(self) -> int:
        # HBM DMA slice sizes must be 128-lane-aligned: bands over-read up
        # to 127 tail lanes (masked garbage), so the packed buffer carries
        # one extra aligned chunk beyond the last band's window.
        return _round_up(self.rows_total * self.lp, 128) + 128

    @property
    def cout(self) -> int:
        return self.c2 if self.depth else self.c1


# ---------------------------------------------------------------------------
# Input pack (host + device variants)
# ---------------------------------------------------------------------------

def pack_s2d_np(imgs_u8: np.ndarray, cfg: FrontendCfg) -> np.ndarray:
    """HOST pack: u8 NHWC [B,H,W,3] -> planar s2d u8 [B, 48, rows_total*LP].

    Plane q = (dy'*4 + dx')*3 + c (c in BGR byte order); flat lane z*LP + x =
    pixel (4*(z-top)+dy', 4x+dx'). Runs in the loader so the device never
    pays the u8 transpose (2.3 ms/batch32 on a v5e).
    """
    b, h, w, _ = imgs_u8.shape
    hb, wb, lp = h // 4, w // 4, cfg.lp
    x = np.ascontiguousarray(
        imgs_u8.reshape(b, hb, 4, wb, 4, 3).transpose(0, 2, 4, 5, 1, 3)
    ).reshape(b, 48, hb, wb)
    arr = np.zeros((b, 48, cfg.rows_total, lp), np.uint8)
    arr[:, :, cfg.top:cfg.top + hb, :wb] = x
    return np.pad(arr.reshape(b, 48, -1),
                  ((0, 0), (0, 0),
                   (0, cfg.flat_len - cfg.rows_total * lp)))


def pack_s2d(imgs_u8, cfg: FrontendCfg):
    """Device-side pack (jnp mirror of pack_s2d_np) for callers that cannot
    pre-pack on the host; costs a u8 transpose in-graph."""
    b, h, w, _ = imgs_u8.shape
    hb, wb, lp = h // 4, w // 4, cfg.lp
    x = imgs_u8.reshape(b, hb, 4, wb, 4, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(b, 48, hb, wb)
    x = jnp.pad(x, ((0, 0), (0, 0), (cfg.top, cfg.halo), (0, lp - wb)))
    x = x.reshape(b, 48, cfg.rows_total * lp)
    return jnp.pad(x, ((0, 0), (0, 0),
                       (0, cfg.flat_len - cfg.rows_total * lp)))


# ---------------------------------------------------------------------------
# Weight builders (host numpy; an eager jnp .at[].add on a tunneled chip pays
# a slow remote scatter compile -- utils/envs.py gotcha list)
# ---------------------------------------------------------------------------

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


def _dot_w(k):
    """1x1 conv kernel [1,1,Cin,Cout] -> plane-contraction W [Cout, Cin]."""
    return np.asarray(k, np.float32)[0, 0].T


def _bias(b):
    return jnp.asarray(np.asarray(b, np.float32).reshape(-1, 1))


def frontend_cfg(specs, h: int, w: int, fuse_l2: bool = True) -> FrontendCfg:
    """Static front-end geometry for an (h, w) input -- no weights needed, so
    callers can check band feasibility (frontend_feasible) before committing
    to the kernel path."""
    c0 = dict(specs[0].kwargs)["cout"]
    c1 = dict(specs[1].kwargs)["cout"]
    depth = c_ = mid = c2 = 0
    if fuse_l2:
        kw = dict(specs[2].kwargs)
        depth = kw["depth"]
        c2 = kw["cout"]
        c_ = int(c2 * kw["expansion"])
        mid = int(c_ * kw["depth_expansion"])
    return FrontendCfg(c0=c0, c1=c1, hb=h // 4, wb=w // 4, lp=lanepad_for(w),
                       depth=depth, c_=c_, mid=mid, c2=c2)


def frontend_feasible(cfg: FrontendCfg) -> bool:
    """True when a 128-lane-aligned band size exists for this geometry (small
    or odd shapes -- e.g. 96px eval, some stride-granular rect shapes -- have
    none; callers must fall back to the XLA front-end there)."""
    try:
        _pick_rows(cfg)
        return True
    except ValueError:
        return False


def frontend_build(specs, variables, h: int, w: int,
                   fuse_l2: bool = True) -> tuple[FrontendCfg, list]:
    """Folded deploy variables -> (cfg, flat weight operand list).

    Weight order: w0, b0, w1, b1[, win, bin,
    (wexp, bexp, wdw, bdw, wproj, bproj) per bottleneck, wout, bout].
    """
    cfg = frontend_cfg(specs, h, w, fuse_l2=fuse_l2)
    p = variables["params"]["net"]
    k0 = p["layer0"]["fused"]["conv"]
    k1 = p["layer1"]["fused"]["conv"]
    wts = [jnp.asarray(_w0_blocked(k0["kernel"]), jnp.bfloat16),
           _bias(np.tile(np.asarray(k0["bias"], np.float32), 4)),
           jnp.asarray(_w1_blocked(k1["kernel"]), jnp.bfloat16),
           _bias(k1["bias"])]
    if fuse_l2:
        depth, c_, mid, c2 = cfg.depth, cfg.c_, cfg.mid, cfg.c2
        l2 = p["layer2"]
        # The CSP split (x[..., :c_], x[..., c_:]) and the (depth+2)-way
        # concat feeding cv_out are resolved HERE as row/column blocks of
        # the 1x1 weights: c_ is not a bf16 sublane-tile multiple, so
        # in-kernel channel slicing/concat would be Mosaic-hostile -- and
        # every (M<=128, K<=128) MXU dot costs one full pass over the lanes
        # regardless of channel count, so dots are PACKED: cv_in is ONE dot
        # with the b half FIRST (the bottleneck chain reads rows [0:c_), an
        # offset-0 slice); cv_out is one dot over x2 (both halves, columns
        # reordered to match) plus one per-y partial dot.
        cp = _round_up(c_, 16)     # bf16 sublane-tile-aligned split width
        win = _dot_w(l2["cv_in"]["conv"]["kernel"])          # [2c_, c1]
        bin_ = np.asarray(l2["cv_in"]["conv"]["bias"], np.float32)
        winp = np.zeros((2 * cp, win.shape[1]), np.float32)
        binp = np.zeros(2 * cp, np.float32)
        winp[:c_], winp[cp:cp + c_] = win[c_:], win[:c_]     # b half FIRST
        binp[:c_], binp[cp:cp + c_] = bin_[c_:], bin_[:c_]
        wts += [jnp.asarray(winp, jnp.bfloat16), _bias(binp)]
        for i in range(depth):
            m = l2[f"m{i}"]
            kdw = np.asarray(m["dw"]["fused"]["conv"]["kernel"],
                             np.float32)           # [3,3,1,mid]
            wexp = np.zeros((mid, cp), np.float32)           # cp-padded cols
            wexp[:, :c_] = _dot_w(m["expand"]["conv"]["kernel"])
            wproj = np.zeros((cp, mid), np.float32)          # cp-padded rows
            wproj[:c_] = _dot_w(m["project"]["conv"]["kernel"])
            bproj = np.zeros(cp, np.float32)
            bproj[:c_] = np.asarray(m["project"]["conv"]["bias"], np.float32)
            wts += [jnp.asarray(wexp, jnp.bfloat16),
                    _bias(m["expand"]["conv"]["bias"]),
                    jnp.asarray(kdw[:, :, 0].reshape(9, mid, 1)),  # f32
                    _bias(m["dw"]["fused"]["conv"]["bias"]),
                    jnp.asarray(wproj, jnp.bfloat16), _bias(bproj)]
        wout = _dot_w(l2["cv_out"]["conv"]["kernel"])        # [c2, (2+d)c_]
        woutp = np.zeros((c2, 2 * cp), np.float32)
        woutp[:, :c_], woutp[:, cp:cp + c_] = wout[:, c_:2 * c_], wout[:, :c_]
        wts.append(jnp.asarray(woutp, jnp.bfloat16))
        for i in range(depth):
            wy = np.zeros((c2, cp), np.float32)
            wy[:, :c_] = wout[:, (2 + i) * c_:(3 + i) * c_]
            wts.append(jnp.asarray(wy, jnp.bfloat16))
        wts.append(_bias(l2["cv_out"]["conv"]["bias"]))
    assert cfg.c0 == k0["kernel"].shape[-1] and cfg.c1 == k1["kernel"].shape[-1]
    return cfg, wts


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(x_hbm, riota, *refs, out_ref=None, scratch=None, sem=None,
            cfg: FrontendCfg = None, rows: int = 0):
    """Grid (B, Hb // rows): `rows` output rows of the fused front-end for
    one image. riota is the local flat-lane -> (row, col) iota pair."""
    (w0, b0, w1, b1), rest = refs[:4], refs[4:]
    bi = pl.program_id(0)
    band = pl.program_id(1)
    lp, wb = cfg.lp, cfg.wb
    halo, top = cfg.halo, cfg.top
    band_rows = rows + 2 * halo + 2
    s2 = _round_up(band_rows * lp, 128)   # DMA slices are 128-lane-aligned

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, :, pl.ds(band * rows * lp, s2)], scratch, sem)
    dma.start()
    dma.wait()
    planes = scratch[...].astype(jnp.int32).astype(jnp.bfloat16)  # [48, S2]

    # Local geometry: lane l = s*LP + x, global feature row g = band*rows
    # - top + s. Masks: in-image rows/cols (conv zero-padding must see true
    # zeros -- relu/silu(bias) at pad rows/lanes would leak into stencils),
    # and roll-wrap edges (lane rolls wrap across row boundaries; the
    # wrapped-in lane is a real pixel when LP == Wb).
    rloc = riota[0][...]                                    # [1, S2] i32
    cloc = riota[1][...]
    g = band * rows - top + rloc
    f32, bf16 = jnp.float32, jnp.bfloat16
    inimg = (jnp.logical_and(jnp.logical_and(g >= 0, g < cfg.hb),
                             cloc < wb)).astype(bf16)       # [1, S2]
    mleft = (cloc > 0).astype(bf16)      # kills wrapped col -1 taps
    mright = (cloc < wb - 1).astype(bf16)  # kills wrapped col +1 taps

    def rep_conv(x, w_ref, b_ref):
        # One RepVGG stage on blocked planes: taps (dy,dx) in {-1,0}^2 as
        # lane rolls; dy=-1 as slice+concat (Mosaic's dynamic_rotate rejects
        # multi-register roll amounts) with an explicit zero top fill.
        # Four accumulated dots (one per tap group, kernel columns sliced)
        # instead of one dot over a concatenated [4*Cin, S2] tap tensor: the
        # concat materialization was a pure VPU copy of 4x the input planes,
        # while the MXU cost of 4 K=Cin dots ~= 1 K=4*Cin dot at these sizes.
        c = x.shape[0]
        up = jnp.concatenate(
            [jnp.zeros((c, lp), x.dtype), x[:, :-lp]], axis=1)
        taps = (jnp.roll(up, 1, axis=1) * mleft, up,
                jnp.roll(x, 1, axis=1) * mleft, x)
        y = None
        for g, t in enumerate(taps):
            d = jax.lax.dot_general(
                w_ref[:, g * c:(g + 1) * c], t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            y = d if y is None else y + d
        y = jnp.maximum(y + b_ref[...], 0.0).astype(bf16)
        return y * inimg

    y = rep_conv(planes, w0, b0)                            # [4*C0, S2]
    y = rep_conv(y, w1, b1)                                 # [C1, S2]

    if cfg.depth:
        def rawdot(w_ref, x):
            return jax.lax.dot_general(
                w_ref[...], x, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def dot(w_ref, b_ref, x):
            return jax.nn.silu(rawdot(w_ref, x) + b_ref[...]).astype(bf16)

        def dotf(w_ref, b_ref, x):
            # f32 variant feeding the DW stencil: the stencil accumulates in
            # f32 anyway, so the bf16 round-trip (astype + re-convert) is two
            # pure VPU passes of waste.
            return jax.nn.silu(rawdot(w_ref, x) + b_ref[...])

        mleft_f = mleft.astype(f32)
        mright_f = mright.astype(f32)
        inimg_f = inimg.astype(f32)

        def dw3x3(xf, wdw_ref, bdw_ref):
            # 9-tap depthwise stencil: per-plane scalar weights broadcast
            # over lanes; dy shifts by whole rows (slice+concat), dx by
            # lane rolls with wrap-edge masks. Input arrives f32 straight
            # from the expand dot (no bf16 round-trip). Schedule: the 3
            # masked-roll dx variants are formed ONCE (rolls commute with
            # row shifts), then each row shift is a single slice+concat of
            # a variant -- 19 VPU passes for 9 taps vs 25 for the naive
            # roll-per-tap order.
            c = xf.shape[0]
            z = jnp.zeros((c, lp), f32)
            var = {-1: jnp.roll(xf, 1, axis=1) * mleft_f,
                   0: xf,
                   1: jnp.roll(xf, -1, axis=1) * mright_f}
            acc = xf * wdw_ref[4] + bdw_ref[...]          # center tap + bias
            for v in (-1, 0, 1):
                tv = var[v]
                acc += wdw_ref[v + 1] * jnp.concatenate(
                    [z, tv[:, :-lp]], axis=1)             # dy = -1 row
                acc += wdw_ref[7 + v] * jnp.concatenate(
                    [tv[:, lp:], z], axis=1)              # dy = +1 row
                if v != 0:
                    acc += wdw_ref[4 + v] * tv            # dy = 0 row
            return jax.nn.silu(acc).astype(bf16)

        win, bin_ = rest[0:2]
        x2 = dot(win, bin_, y)            # [2c_, S2] silu, b half FIRST
        ys = []
        for i in range(cfg.depth):
            wexp, bexp, wdw, bdw, wproj, bproj = rest[2 + 6 * i:8 + 6 * i]
            src = ys[-1] if ys else x2[:cfg.cp]   # offset-0 slice = b half
            t = dotf(wexp, bexp, src)                       # [mid, S2] silu f32
            t = t * inimg_f            # DW zero padding at image boundary
            t = dw3x3(t, wdw, bdw)                          # [mid, S2] silu
            ys.append(dot(wproj, bproj, t))                 # [c_, S2] silu
        # cv_out over the CSP concat = x2 full dot + per-y partial dots
        wouts = rest[2 + 6 * cfg.depth:-1]
        acc = rest[-1][...] + rawdot(wouts[0], x2)
        for w_ref, part in zip(wouts[1:], ys):
            acc += rawdot(w_ref, part)
        y = jax.nn.silu(acc).astype(bf16)                   # [C2, S2]

    # Emit NHWC: MXU eye-contraction transposes [C, S2] -> [S2, C]; the
    # valid output rows are a sublane-aligned slice (top*LP % 8 == 0).
    c = y.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)).astype(bf16)
    t = jax.lax.dot_general(y, eye, dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=f32).astype(bf16)
    out_ref[0] = t[top * lp:(top + rows) * lp]


def _pick_rows(cfg: FrontendCfg, vmem_budget: int = 48 * 2**20) -> int:
    # The pallas_call raises the scoped-vmem limit to 100M (v5e VMEM is
    # 128M); the estimate below overshoots Mosaic's real stack peak ~1.35x
    # (measured 19.2M actual at a 26M estimate), so 48M lands real peaks
    # ~36M. Bigger bands amortize the 2*(halo+1) redundant halo rows.
    """Largest divisor of Hb (with rows*LP lane-aligned to 128) whose band
    VMEM footprint stays under the budget.

    Peak per-lane bytes ~ scratch u8 48 + bf16 planes 96 + rep taps
    2*max(192, 16*c0) + y 2*c1 + L2 transients (2c_ + mid f32*2 + outs).
    """
    l2 = (2 * (2 * cfg.c_) + 10 * cfg.mid + 2 * cfg.c_ * (cfg.depth + 2)
          + 2 * cfg.c2) if cfg.depth else 0
    per_lane = (48 + 96 + 2 * max(192, 16 * cfg.c0) + 4 * cfg.c1 + l2
                + 4 * cfg.cout)
    best = 0
    for r in range(1, cfg.hb + 1):
        if (cfg.hb % r == 0 and (r * cfg.lp) % 128 == 0
                and (r + 2 * cfg.halo + 2) * cfg.lp * per_lane <= vmem_budget):
            best = r
    if best == 0:
        raise ValueError(f"no feasible band size for {cfg}")
    return best


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def frontend_forward(xp, weights, cfg: FrontendCfg, interpret: bool = False):
    """Packed s2d planar u8 [B, 48, rows_total*LP] -> NHWC(+lane-pad) bf16
    [B, Hb, LP, Cout] (slice [..., :Wb, :] for the true feature map)."""
    b = xp.shape[0]
    rows = _pick_rows(cfg)
    band_rows = rows + 2 * cfg.halo + 2
    s2 = _round_up(band_rows * cfg.lp, 128)
    nfull = s2 // cfg.lp + 1

    riota = (jnp.repeat(jnp.arange(nfull, dtype=jnp.int32),
                        cfg.lp)[None, :s2],
             jnp.tile(jnp.arange(cfg.lp, dtype=jnp.int32),
                      nfull)[None, :s2])

    kern = partial(_kernel, cfg=cfg, rows=rows)

    def body(x_hbm, r0, r1, *refs):
        out_ref, scratch, sem = refs[-3], refs[-2], refs[-1]
        kern(x_hbm, (r0, r1), *refs[:-3], out_ref=out_ref, scratch=scratch,
             sem=sem)

    y = pl.pallas_call(
        body,
        grid=(b, cfg.hb // rows),
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(weights)),
        out_specs=pl.BlockSpec((1, rows * cfg.lp, cfg.cout),
                               lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cfg.hb * cfg.lp, cfg.cout),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((48, s2), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(xp, *riota, *weights)
    return y.reshape(b, cfg.hb, cfg.lp, cfg.cout)


# ---------------------------------------------------------------------------
# Integration helpers
# ---------------------------------------------------------------------------

def frontend_supported(specs, save) -> bool:
    """True when layers 0-1 are the standard RepVGG 3x3/s2 pair and nothing
    else consumes layer 0's or 1's output (all shipped MAF graphs)."""
    s0, s1 = specs[0], specs[1]
    return (s0.kind == "RepVGGBlock" and dict(s0.kwargs).get("cin") == 3
            and dict(s0.kwargs).get("stride") == 2
            and s1.kind == "RepVGGBlock"
            and dict(s1.kwargs).get("stride") == 2 and s1.frm == (-1,)
            and 0 not in save and 1 not in save)


def frontend_l2_supported(specs) -> bool:
    """Layer 2 is fusable when it is a k=3 RepHDW fed by layer 1."""
    s2 = specs[2]
    kw = dict(s2.kwargs)
    return (s2.kind == "RepHDW" and s2.frm == (-1,)
            and kw.get("kersize") == 3)


def frontend_skip_until(specs, save) -> int:
    """How deep the fused front-end covers this graph (-1 = unsupported)."""
    if not frontend_supported(specs, save):
        return -1
    return 2 if frontend_l2_supported(specs) else 1


def frontend_apply_packed(model, xp, weights, cfg: FrontendCfg,
                          variables=None, interpret: bool = False):
    """Forward host-packed planar bytes through the fused front-end + the
    rest of the deploy graph (model built with skip_until matching cfg)."""
    y = frontend_forward(xp, tuple(weights), cfg, interpret=interpret)
    x = y[:, :, :cfg.wb, :]
    return model.apply(variables, x, train=False)


def frontend_apply(model, variables, imgs_u8, interpret: bool = False,
                   fuse_l2: bool = True):
    """Forward raw u8 BGR imgs (device pack in-graph; prefer
    frontend_apply_packed + pack_s2d_np for the host-pack fast path)."""
    h, w = imgs_u8.shape[1:3]
    cfg, wts = frontend_build(model.specs, variables, h, w, fuse_l2=fuse_l2)
    xp = pack_s2d(imgs_u8, cfg)
    return frontend_apply_packed(model, xp, wts, cfg, variables=variables,
                                 interpret=interpret)
