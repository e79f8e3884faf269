"""Per-block forward timing of the deploy graph (forced-sync, single chip).

Builds each graph block standalone with its real input shape(s) and times it,
to locate where the forward milliseconds live. Usage:
  python tools/profile_layers.py [--batch 32] [--img-size 640]
"""
import argparse
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=20, warmup=2):
    def sync(x):
        return float(jnp.asarray(jax.tree.leaves(x)[0],
                                 jnp.float32).sum())
    for _ in range(warmup):
        sync(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--graph", default="maf-yolo-n")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models import blocks as B
    from mafyolo_tpu.models.graph import _BLOCK_CTORS
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_model(args.graph, nc=80, deploy=True, dtype=dtype)
    b, s = args.batch, args.img_size

    # derive every block's input shape(s) by abstract-walking the graph
    shapes = {}

    def record(spec, inp):
        if isinstance(inp, (list, tuple)):
            shapes[spec.idx] = [tuple(i.shape) for i in inp]
        else:
            shapes[spec.idx] = [tuple(inp.shape)]

    x = jax.ShapeDtypeStruct((b, s, s, 3), dtype)

    def walk(x):
        y = {}
        cur = x
        for spec in model.specs:
            if spec.kind == "Out":
                return [y[j] for j in model.out_frm]
            if spec.frm != (-1,):
                inp = [cur if j == -1 else y[j if j >= 0 else spec.idx + j]
                       for j in spec.frm]
                if len(inp) == 1:
                    inp = inp[0]
            else:
                inp = cur
            record(spec, inp)
            import flax.linen as nn
            if spec.kind == "Upsample":
                mod = B.Upsample2x(dtype=dtype)
            elif spec.kind == "Concat":
                mod = B.Concat(dtype=dtype)
            else:
                mod = _BLOCK_CTORS[spec.kind](deploy=True, dtype=dtype,
                                              **spec.kw)
            cur = jax.eval_shape(
                lambda i, m=mod: m.init_with_output(
                    jax.random.PRNGKey(0), i, False)[0], inp)
            if spec.idx in model.save:
                y[spec.idx] = cur
        return None

    walk(x)

    rng = np.random.default_rng(0)
    total = 0.0
    rows = []
    for spec in model.specs:
        if spec.kind == "Out":
            break
        if spec.kind in ("Upsample", "Concat"):
            mod = (B.Upsample2x if spec.kind == "Upsample" else B.Concat)(
                dtype=dtype)
        else:
            mod = _BLOCK_CTORS[spec.kind](deploy=True, dtype=dtype, **spec.kw)
        ins = [jnp.asarray(rng.normal(0, 1, sh).astype(np.float32), dtype)
               for sh in shapes[spec.idx]]
        inp = ins if len(ins) > 1 else ins[0]
        variables = jax.jit(mod.init, static_argnames=())(
            jax.random.PRNGKey(0), inp, False)
        fn = jax.jit(lambda v, i: mod.apply(v, i, False))
        t = timeit(fn, variables, inp, n=args.iters)
        total += t
        shp = "+".join("x".join(map(str, sh[1:])) for sh in shapes[spec.idx])
        rows.append((t, spec.idx, spec.kind, shp))
        print(f"layer{spec.idx:>3} {spec.kind:22s} {shp:28s} "
              f"{t*1e3:7.2f} ms", flush=True)
    print(f"{'sum of blocks':54s} {total*1e3:7.2f} ms", flush=True)
    print("top-5 blocks:", flush=True)
    for t, idx, kind, shp in sorted(rows, reverse=True)[:5]:
        print(f"  layer{idx} {kind} {shp}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
