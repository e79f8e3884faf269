"""Fused Pallas neck cluster: layers 19-22 of the MAF graphs in ONE kernel.

The MAFPN's P3 merge cluster -- Concat(L18, L4, L17up) -> RepHDW(k=5) ->
Concat(+L17up) -> RepHDW(k=5) (reference yaml rows 19-22; RepHDW deploy
semantics common.py:898-946) -- runs at 80x80 with 24-to-168 channels, where
XLA's conv lowering leaves most of the MXU idle (the same disease the fused
front-end kernel treats at 160x160; docs/STATUS.md round-3 analysis).

Same formulation as ops/frontend_pallas.py, one resolution tier down:
  * channels in sublanes, flat (row, col) in lanes (LP = 80);
  * the two Concats cost NOTHING: they become per-source partial dots of
    the 1x1 convs (weight column blocks selected at build time);
  * the k=5 depthwise convs are 25-tap VPU stencils (row shifts by +-LP,
    +-2LP, lane rolls +-1, +-2 with wrap-edge masks), with 2 halo rows per
    DW provided by overlapping grid bands (two stacked BlockSpec views);
  * outputs (both RepHDW results -- layer 20 feeds layer 24, layer 22 feeds
    layers 23/31) leave via MXU eye-contraction transposes as NHWC.

Weight preparation runs in jnp INSIDE the jit (tiny transposes/pads of 1x1
kernels; the frontend does it on the host because its weights fold /255 and
BGR constants -- here the deploy params pass through unchanged).

Parity vs the XLA deploy path: tests/test_neck_pallas.py.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class Neck80Cfg:
    """Static geometry of the fused cluster (from specs 19-22)."""
    h: int                      # feature rows/cols (80 at 640px)
    cins: tuple                 # channels of (L18, L4, L17up)
    c20: int                    # layer-20 output channels
    c22: int                    # layer-22 output channels
    d1: int                     # layer-20 bottleneck count
    d2: int                     # layer-22 bottleneck count
    c1_: int                    # layer-20 split width
    mid1: int
    c2_: int                    # layer-22 split width
    mid2: int
    k: int = 5

    @property
    def halo(self) -> int:      # rows consumed per side by the DW chains
        return (self.k // 2) * (self.d1 + self.d2)

    @property
    def lp(self) -> int:
        return self.h           # 80/40 are sublane multiples already

    @property
    def cp1(self) -> int:
        return _round_up(self.c1_, 16)

    @property
    def cp2(self) -> int:
        return _round_up(self.c2_, 16)


def neck80_supported(specs) -> bool:
    """True for the shipped MAF wiring: rows 19-22 are Concat(-1,4,-2) ->
    RepHDW(k5) -> Concat(-1,17) -> RepHDW(k5) fed by ConvWrapper(18)/
    RepHDW(4)/Upsample(17)."""
    if len(specs) < 23:
        return False
    k19, k20, k21, k22 = (specs[i] for i in range(19, 23))
    return (k19.kind == "Concat" and k19.frm == (-1, 4, -2)
            and k20.kind == "RepHDW" and dict(k20.kwargs)["kersize"] == 5
            and k21.kind == "Concat" and k21.frm == (-1, 17)
            and k22.kind == "RepHDW" and dict(k22.kwargs)["kersize"] == 5
            and specs[18].kind == "ConvWrapper" and specs[17].kind == "Upsample")


def neck80_cfg(specs, h: int) -> Neck80Cfg:
    kw20 = dict(specs[20].kwargs)
    kw22 = dict(specs[22].kwargs)
    cins = (specs[18].cout, specs[4].cout, specs[17].cout)
    c1_ = int(kw20["cout"] * kw20["expansion"])
    c2_ = int(kw22["cout"] * kw22["expansion"])
    return Neck80Cfg(
        h=h, cins=cins, c20=kw20["cout"], c22=kw22["cout"],
        d1=kw20["depth"], d2=kw22["depth"],
        c1_=c1_, mid1=int(c1_ * kw20["depth_expansion"]),
        c2_=c2_, mid2=int(c2_ * kw22["depth_expansion"]))


def _prep_hdw_weights(p, c_, cp, mid, depth, in_splits):
    """jnp weight prep for one deploy RepHDW, mirroring the frontend's host
    builder: cv_in as per-source partial dots (b half FIRST, rows padded to
    cp), per-bottleneck expand/dw/project (cp-padded), cv_out as x2 + per-y
    partial dots. in_splits: channel widths of the concat sources."""
    def dot_w(k):                       # [1,1,Cin,Cout] -> [Cout, Cin]
        return k[0, 0].T.astype(jnp.bfloat16)

    def bias(b):
        return b.astype(jnp.float32).reshape(-1, 1)

    win = dot_w(p["cv_in"]["conv"]["kernel"])          # [2c_, cin_total]
    bin_ = p["cv_in"]["conv"]["bias"].astype(jnp.float32)
    perm_rows = jnp.concatenate([
        jnp.pad(win[c_:2 * c_], ((0, cp - c_), (0, 0))),
        jnp.pad(win[:c_], ((0, cp - c_), (0, 0)))], axis=0)   # [2cp, cin]
    binp = jnp.concatenate([
        jnp.pad(bin_[c_:2 * c_], (0, cp - c_)),
        jnp.pad(bin_[:c_], (0, cp - c_))], axis=0)
    wins, off = [], 0
    for w in in_splits:
        wins.append(perm_rows[:, off:off + w])
        off += w
    wts = [*wins, bias(binp)]
    for i in range(depth):
        m = p[f"m{i}"]
        kdw = m["dw"]["fused"]["conv"]["kernel"]       # [5,5,1,mid]
        wexp = jnp.pad(dot_w(m["expand"]["conv"]["kernel"]),
                       ((0, 0), (0, cp - c_)))          # [mid, cp]
        wproj = jnp.pad(dot_w(m["project"]["conv"]["kernel"]),
                        ((0, cp - c_), (0, 0)))         # [cp, mid]
        bproj = jnp.pad(m["project"]["conv"]["bias"].astype(jnp.float32),
                        (0, cp - c_))
        wts += [wexp, bias(m["expand"]["conv"]["bias"]),
                kdw[:, :, 0].reshape(25, -1, 1).astype(jnp.float32),
                bias(m["dw"]["fused"]["conv"]["bias"]),
                wproj, bias(bproj)]
    wout = dot_w(p["cv_out"]["conv"]["kernel"])        # [cout, (2+d)c_]
    woutp = jnp.concatenate([
        jnp.pad(wout[:, c_:2 * c_], ((0, 0), (0, cp - c_))),
        jnp.pad(wout[:, :c_], ((0, 0), (0, cp - c_)))], axis=1)  # [cout,2cp]
    wts.append(woutp)
    for i in range(depth):
        wts.append(jnp.pad(wout[:, (2 + i) * c_:(3 + i) * c_],
                           ((0, 0), (0, cp - c_))))
    wts.append(bias(p["cv_out"]["conv"]["bias"]))
    return wts


def _hdw_nrefs(depth: int, n_in: int) -> int:
    return n_in + 1 + 6 * depth + 1 + depth + 1


def _kernel(riota, *refs, cfg: Neck80Cfg = None, rows: int = 0):
    """Grid (B, H // rows). refs: 2 halo views per input (6), weight refs
    for layer 20 then layer 22, then out refs (y20, y22)."""
    band = pl.program_id(1)
    lp, k = cfg.lp, cfg.k
    p = k // 2
    halo = cfg.halo
    f32, bf16 = jnp.float32, jnp.bfloat16

    ins = []
    for i in range(3):
        a, bv = refs[2 * i], refs[2 * i + 1]
        # two stacked views give 2R rows; only rows + 2*halo are needed --
        # slicing the leading dim is free and keeps the whole band's compute
        # (and VMEM) proportional to rows + 2*halo, not 2R
        cat = jnp.concatenate([a[0], bv[0]], axis=0)        # [2R, LP, C]
        ins.append(cat[:rows + 2 * halo])
    w_refs = refs[6:-2]
    o20, o22 = refs[-2], refs[-1]
    n1 = _hdw_nrefs(cfg.d1, 3)
    w20, w22 = w_refs[:n1], w_refs[n1:]

    rloc = riota[0][...]                    # [1, 2R*LP] i32 local row
    cloc = riota[1][...]
    g = band * rows - halo + rloc           # real feature row
    inimg = jnp.logical_and(g >= 0, g < cfg.h).astype(bf16)
    ml = [None,
          (cloc > 0).astype(bf16), (cloc > 1).astype(bf16)]
    mr = [None,
          (cloc < cfg.h - 1).astype(bf16), (cloc < cfg.h - 2).astype(bf16)]

    def to_planar(a):
        n, w, c = a.shape
        flat = a.reshape(n * w, c).astype(bf16)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)).astype(bf16)
        return jax.lax.dot_general(
            eye, flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(bf16)

    planes = [to_planar(a) for a in ins]    # [C_i, S2] each
    s2 = planes[0].shape[1]

    def rawdot(w, x):
        return jax.lax.dot_general(
            w[...], x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def dw5x5(x, wdw_ref, bdw_ref):
        c = x.shape[0]
        z = jnp.zeros((c, lp), x.dtype)
        sh = {0: x}
        for d in (1, 2):
            sh[-d] = jnp.concatenate([jnp.zeros((c, d * lp), x.dtype),
                                      x[:, :-d * lp]], axis=1)
            sh[d] = jnp.concatenate([x[:, d * lp:],
                                     jnp.zeros((c, d * lp), x.dtype)], axis=1)
        acc = bdw_ref[...] * jnp.ones_like(x, f32)
        for u in range(-p, p + 1):
            for v in range(-p, p + 1):
                t = sh[u]
                if v < 0:
                    t = jnp.roll(t, -v, axis=1) * ml[-v]
                elif v > 0:
                    t = jnp.roll(t, -v, axis=1) * mr[v]
                acc += wdw_ref[(u + p) * k + (v + p)] * t.astype(f32)
        return jax.nn.silu(acc).astype(bf16)

    def hdw(wts, xs, depth, cp, c_out):
        """One deploy RepHDW on planar inputs xs (list of [C_i, S2])."""
        n_in = len(xs)
        acc = wts[n_in][...]
        for w, x in zip(wts[:n_in], xs):
            acc = acc + rawdot(w, x)
        x2 = jax.nn.silu(acc).astype(bf16)           # [2cp, S2], b half first
        ys = []
        for i in range(depth):
            wexp, bexp, wdw, bdw, wproj, bproj = \
                wts[n_in + 1 + 6 * i:n_in + 7 + 6 * i]
            src = ys[-1] if ys else x2[:cp]
            t = jax.nn.silu(rawdot(wexp, src) + bexp[...]).astype(bf16)
            t = t * inimg                # DW zero padding at image boundary
            t = dw5x5(t, wdw, bdw)
            ys.append(jax.nn.silu(rawdot(wproj, t) + bproj[...]).astype(bf16))
        wout0 = wts[n_in + 1 + 6 * depth]
        acc = wts[-1][...] + rawdot(wout0, x2)
        for w, yy in zip(wts[n_in + 2 + 6 * depth:-1], ys):
            acc = acc + rawdot(w, yy)
        return jax.nn.silu(acc).astype(bf16)         # [c_out, S2]

    y20 = hdw(w20, planes, cfg.d1, cfg.cp1, cfg.c20)
    y22 = hdw(w22, [y20, planes[2]], cfg.d2, cfg.cp2, cfg.c22)

    def emit(y, out_ref):
        c = y.shape[0]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)).astype(bf16)
        t = jax.lax.dot_general(
            y, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(bf16)
        out_ref[0] = t[halo * lp:(halo + rows) * lp]

    emit(y20, o20)
    emit(y22, o22)


@partial(jax.jit, static_argnames=("cfg", "interpret", "rows"))
def neck80_forward(x18, x4, x17u, weights, cfg: Neck80Cfg,
                   interpret: bool = False, rows: int = 0):
    """NHWC inputs [B, H, H, C_i] -> (y20, y22) NHWC [B, H, H, c20/c22]."""
    b, h = x18.shape[0], cfg.h
    halo = cfg.halo
    if not rows:
        # ~9.6 KB/lane measured peak (inputs + planes + f32 bottleneck
        # transients across two RepHDWs at the N widths); stay under the
        # 100M scoped limit with slack
        rows = h
        while rows % 2 == 0 and rows // 2 >= 2 * halo and \
                (rows + 2 * halo) * cfg.lp * 9800 > 72 * 2**20:
            rows //= 2
    bands = h // rows
    # out rows [r0, r0+R) need real input rows [r0-halo, r0+R+halo), all of
    # which must live inside the band's 2R-row window starting at r0-halo
    assert rows >= 2 * halo, (rows, halo)

    def pad_rows(x):
        return jnp.pad(x, [(0, 0), (halo, (bands + 1) * rows - h - halo),
                           (0, 0), (0, 0)])

    xs = [pad_rows(v) for v in (x18, x4, x17u)]
    band_rows = rows + 2 * halo
    nfull = band_rows + 1
    riota = (jnp.repeat(jnp.arange(nfull, dtype=jnp.int32),
                        cfg.lp)[None, :band_rows * cfg.lp],
             jnp.tile(jnp.arange(cfg.lp, dtype=jnp.int32),
                      nfull)[None, :band_rows * cfg.lp])

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = list(riota)
    for x in xs:
        c = x.shape[-1]
        in_specs += [
            pl.BlockSpec((1, rows, cfg.lp, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, cfg.lp, c),
                         lambda bi, ri: (bi, ri + 1, 0, 0),
                         memory_space=pltpu.VMEM)]
        operands += [x, x]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights)
    operands += list(weights)

    def body(r0, r1, *refs):
        _kernel((r0, r1), *refs, cfg=cfg, rows=rows)

    y20, y22 = pl.pallas_call(
        body,
        grid=(b, bands),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, rows * cfg.lp, cfg.c20),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * cfg.lp, cfg.c22),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * cfg.lp, cfg.c20), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h * cfg.lp, cfg.c22), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*operands)
    return (y20.reshape(b, h, cfg.lp, cfg.c20),
            y22.reshape(b, h, cfg.lp, cfg.c22))


def neck80_weights(net_params, specs, cfg: Neck80Cfg):
    """Folded deploy params -> flat weight list (jnp; safe inside jit)."""
    w20 = _prep_hdw_weights(net_params["layer20"], cfg.c1_, cfg.cp1,
                            cfg.mid1, cfg.d1, list(cfg.cins))
    w22 = _prep_hdw_weights(net_params["layer22"], cfg.c2_, cfg.cp2,
                            cfg.mid2, cfg.d2, [cfg.c20, cfg.cins[2]])
    return tuple(w20 + w22)
