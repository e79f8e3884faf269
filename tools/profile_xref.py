"""Trace x HLO cross-reference: measured per-op device time vs bandwidth floor.

For every HLO op in the e2e inference graph, compares its traced device time
against a memory-floor estimate (operand+result bytes at the measured streaming
rates: ~236 GB/s HBM, ~1.5 TB/s for S(1) VMEM-resident buffers). Ops far above
their floor are lowering fat; ops at their floor need graph surgery (fusion /
layout) rather than better emitters. The round-3 bandwidth study
(docs/STATUS.md) showed this chip streams ~236 GB/s -- NOT the v5e spec sheet
number -- which makes this the honest per-op roofline.

Usage: python tools/profile_xref.py [--stage e2e|fwd] [--top 40]
"""
import argparse
import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import os.path as osp
import re
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

HBM_GBPS = 236.0
VMEM_GBPS = 1500.0

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
               "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
               "u64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]\{[^}]*?(S\(\d+\))?\}")


def shapes_bytes(type_str):
    """All shapes in an HLO type string -> [(bytes, is_vmem)]."""
    out = []
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims, smem = m.group(1), m.group(2), m.group(3)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((n * DTYPE_BYTES[dt], smem is not None))
    return out


def parse_hlo(path):
    """HLO text -> {op_name: (floor_us, meta_op_name)}.

    Compiled HLO prints operand types inline, so every shape on an
    instruction line (result + operands) is exactly the op's surface
    traffic; the floor prices each buffer at its memory's streaming rate."""
    defs = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = re.match(r"%([\w.\-]+) = (.+)", line)
            if not m:
                continue
            name, rest = m.group(1), m.group(2)
            rest = rest.split(" metadata=")[0]       # drop metadata/config
            rest = rest.split(" backend_config=")[0]
            tot = 0.0
            for b, vmem in shapes_bytes(rest):
                tot += b / (VMEM_GBPS if vmem else HBM_GBPS) / 1e3
            mm = re.search(r'op_name="([^"]+)"', line)
            defs[name] = (tot, mm.group(1) if mm else "")
    return defs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="e2e", choices=["e2e", "fwd"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--parse", nargs=2, metavar=("TRACE_DIR", "HLO_TXT"),
                    default=None)
    args = ap.parse_args()

    if args.parse:
        report(args.parse[0], args.parse[1], args.top)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.ops.nms import fused_decode_nms
    from tools.profile_trace import capture

    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    skip = F.frontend_skip_until(train_model.specs, train_model.save)
    model = build_model("maf-yolo-n", nc=80, deploy=True, skip_until=skip,
                        dtype=jnp.bfloat16)
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640,
                                fuse_l2=skip >= 2)
    wts = tuple(jax.device_put(wts))
    imgs_np = np.random.default_rng(0).integers(
        0, 255, (args.batch, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    @jax.jit
    def fwd(x):
        y = F.frontend_forward(x, wts, cfg)
        return model.apply(folded, y[:, :, :cfg.wb, :], train=False)

    @jax.jit
    def e2e(x):
        return fused_decode_nms(fwd(x), strides=model.strides,
                                reg_max=model.reg_max, conf_thres=0.03,
                                iou_thres=0.65, max_det=300)

    fn = e2e if args.stage == "e2e" else fwd
    hlo_path = f"/tmp/xref_{args.stage}_hlo.txt"
    with open(hlo_path, "w") as f:
        f.write(jax.jit(fn).lower(xp).compile().as_text())
    tdir = capture(fn, xp, iters=args.iters)
    print("trace dir:", tdir, "hlo:", hlo_path, flush=True)
    subprocess.run([sys.executable, __file__, "--parse", tdir, hlo_path,
                    "--top", str(args.top)], check=False)


def report(tdir, hlo_path, top):
    from tools.profile_trace import hlo_stats
    ops, n_runs = hlo_stats(tdir)
    defs = parse_hlo(hlo_path)
    rows = []
    for us, name in ops:
        # trace metadata names carry the full instruction text; key on the
        # bare instruction name
        bare = name.lstrip("%").split(" ")[0].rstrip("=")
        fl, meta = defs.get(bare, (None, ""))
        rows.append((us / n_runs, fl, bare, meta))
    tot = sum(r[0] for r in rows)
    tot_floor = sum(r[1] for r in rows if r[1] is not None)
    print(f"runs={n_runs} total {tot/1e3:.3f} ms/run, memory floor "
          f"{tot_floor/1e3:.3f} ms/run (at {HBM_GBPS:.0f} GB/s HBM)")
    print(f"{'meas us':>8} {'floor':>7} {'x':>5}  op / layer")
    for us, fl, bare, meta in rows[:top]:
        ratio = f"{us/fl:5.1f}" if fl and fl > 0 else "    ?"
        layer = re.sub(r"jit\(\w+\)/|MAFYolo/net/", "", meta)[:60]
        print(f"{us:8.1f} {fl if fl else 0:7.1f} {ratio}  "
              f"{bare[:44]:44s} {layer}")


if __name__ == "__main__":
    main()
