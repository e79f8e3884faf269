"""Per-graph DW/VPU vs dense/MXU FLOP split -> derived throughput ceilings.

Extends the N-only round-3 ceiling derivation (BASELINE.md) to S and M
(VERDICT r4 #6): lowers the deploy graph at bs32@640, walks the StableHLO
convolutions, and splits MACs into depthwise taps (feature_group_count ==
channels -> VPU-bound, ceiling 2.73 TF/s measured by tools/profile_vpu.py)
and dense contractions (MXU-bound, 197 TF/s bf16 peak). Floor model per
batch32 (round-3 N study, docs/STATUS.md):

    floor_ms = DW_GF / 2.73 + dense_GF / (197 * mxu_eff)
               + frontend_ms + nms_ms + glue_ms

with mxu_eff the measured small-channel MXU efficiency (N study: dense
~1.4 ms at ~9.5 GF -> eff ~0.034... the dense term there was measured, not
peak; we keep the same effective rate), frontend/nms measured, glue ~1 ms.

Run on CPU (lowering only, no compile): python tools/graph_flops.py
"""
import argparse
import os.path as osp
import re
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def conv_flops_from_hlo(hlo_text):
    """Sum conv MACs from StableHLO text, split (depthwise, dense).

    Returns (dw_macs, dense_macs). Parses stablehlo.convolution ops:
    output shape x kernel spatial x (cin_per_group) MACs each.
    """
    dw = dense = 0
    # stablehlo.convolution(%a, %b) ... dim_numbers = [b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f], ... feature_group_count = N ... : (tensor<AxBxCxDxbf16>, tensor<KxKxIxOxbf16>) -> tensor<...>
    pat = re.compile(
        r"stablehlo\.convolution.*?feature_group_count\s*=\s*(\d+).*?:\s*"
        r"\(tensor<([0-9x]+)x[a-z0-9]+>,\s*tensor<([0-9x]+)x[a-z0-9]+>\)\s*"
        r"->\s*tensor<([0-9x]+)x[a-z0-9]+>")
    for m in pat.finditer(hlo_text):
        fgc = int(m.group(1))
        kshape = [int(v) for v in m.group(3).split("x")]
        oshape = [int(v) for v in m.group(4).split("x")]
        # kernel HWIO: [kh, kw, cin/g, cout]
        kh, kw, cin_g, cout = kshape
        out_elems = 1
        for v in oshape:
            out_elems *= v
        macs = out_elems * kh * kw * cin_g
        if fgc > 1 and cin_g == 1:
            dw += macs
        else:
            dense += macs
    return dw, dense


def dot_flops_from_hlo(hlo_text):
    macs = 0
    pat = re.compile(
        r"stablehlo\.dot_general.*?:\s*\(tensor<([0-9x]+)x[a-z0-9]+>,\s*"
        r"tensor<([0-9x]+)x[a-z0-9]+>\)\s*->\s*tensor<([0-9x]+)x[a-z0-9]+>")
    for m in pat.finditer(hlo_text):
        a = [int(v) for v in m.group(1).split("x")]
        o = [int(v) for v in m.group(3).split("x")]
        out_elems = 1
        for v in o:
            out_elems *= v
        # contraction size = prod(a) / prod(o non-rhs dims)... use simple
        # heuristic: K = prod(a) * prod(b) / (prod(o) * prod(batch))
        # safer: K = prod(a) / (out rows) -- assume 2D-ish [M,K]x[K,N]
        b = [int(v) for v in m.group(2).split("x")]
        pa = 1
        for v in a:
            pa *= v
        pb = 1
        for v in b:
            pb *= v
        import math
        k = int(round(math.sqrt(pa * pb / max(out_elems, 1))))
        macs += out_elems * k
    return macs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--graphs", default="maf-yolo-n,maf-yolo-s,maf-yolo-m")
    # measured constants (round-3 N study + round-5 frontend_sm measurements)
    ap.add_argument("--vpu-tfs", type=float, default=2.73)
    ap.add_argument("--mxu-tfs", type=float, default=197.0,
                    help="dense rate (bf16 MXU peak; the round-3 N study's "
                    "1.4 ms dense term ~= peak at N's 334 GF/batch)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables

    from mafyolo_tpu.ops import frontend_pallas as FE

    rows = {}
    for graph in args.graphs.split(","):
        tm = build_model(graph, nc=80)
        v = jax.jit(tm.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        folded = fold_variables(tm.specs, v)
        # POST-KERNEL graph only: the shipped path runs L0-2 inside the fused
        # Pallas front-end, whose cost enters the floor as the measured
        # frontend term -- so count flops of the skip_until=2 deploy model
        # on the front-end's output features.
        skip = FE.frontend_skip_until(tm.specs, tm.save)
        model = build_model(graph, nc=80, deploy=True, skip_until=skip)
        c2 = dict(tm.specs[2].kwargs)["cout"]
        xf = jnp.zeros((args.batch, args.img // 4, args.img // 4, c2))
        txt = jax.jit(lambda p, xx: model.apply(p, xx, train=False)).lower(
            folded, xf).as_text()
        dw, dense = conv_flops_from_hlo(txt)
        dots = dot_flops_from_hlo(txt)
        rows[graph] = (dw, dense + dots)
        print(f"{graph}: post-kernel DW {2*dw/1e9:8.1f} GFLOP/batch"
              f"{args.batch}   dense {2*(dense+dots)/1e9:8.1f} GFLOP",
              flush=True)

    # frontend terms: measured on the real chip (N: e2e trace round 5;
    # S/M: tools/profile_frontend_sm.py -- update when re-measured)
    FRONTEND_MS = {"maf-yolo-n": 2.8, "maf-yolo-s": 2.8, "maf-yolo-m": 2.8}
    NMS_MS, GLUE_MS = 0.8, 1.0
    for graph, (dw, dense) in rows.items():
        dw_gf = 2 * dw / 1e9
        dn_gf = 2 * dense / 1e9
        floor = (dw_gf / args.vpu_tfs + dn_gf / args.mxu_tfs
                 + FRONTEND_MS[graph] + NMS_MS + GLUE_MS)
        print(f"{graph}: floor ~{floor:6.2f} ms/batch{args.batch} "
              f"(DW {dw_gf/args.vpu_tfs:5.2f} + dense "
              f"{dn_gf/args.mxu_tfs:5.2f} + fe {FRONTEND_MS[graph]} + "
              f"nms {NMS_MS} + glue {GLUE_MS}) "
              f"=> ceiling ~{args.batch/floor*1e3:6.0f} img/s")


if __name__ == "__main__":
    main()
