"""Cumulative BACKWARD timing: train-form graph truncated after layer K.

Times jitted fwd+grad(sum) of real-graph PREFIXES, so XLA fusion across block
boundaries is included; differences between cut points give honest in-graph
per-stage backward costs (the VERDICT r3 #2 target: backward = 132 ms =
3.6x the 36 ms forward at bs32@640).

Usage: python tools/profile_bwd_prefix.py [--batch 32] [--cuts 0,1,2,...]
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
from flax import linen as nn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--graph", default="maf-yolo-n")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cuts", default="0,1,2,3,4,5,9,22,30,33")
    ap.add_argument("--fwd", action="store_true",
                    help="also time forward-only prefixes (train form)")
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models import blocks as B
    from mafyolo_tpu.models.graph import _BLOCK_CTORS
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_model(args.graph, nc=80, dtype=dtype)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.device_put(variables)

    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), dtype=np.uint8))

    class Prefix(nn.Module):
        cut: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            specs = model.specs
            y = {}
            out = []
            for spec in specs:
                if spec.idx > self.cut or spec.kind == "Out":
                    break
                if spec.frm != (-1,):
                    inp = [x if j == -1 else y[j if j >= 0 else spec.idx + j]
                           for j in spec.frm]
                    if len(inp) == 1:
                        inp = inp[0]
                else:
                    inp = x
                if spec.kind == "Upsample":
                    x = B.Upsample2x(dtype=dtype, name=f"layer{spec.idx}")(inp, train)
                elif spec.kind == "Concat":
                    x = B.Concat(dtype=dtype, name=f"layer{spec.idx}")(inp, train)
                else:
                    x = _BLOCK_CTORS[spec.kind](
                        dtype=dtype, name=f"layer{spec.idx}", **spec.kw)(inp, train)
                if spec.idx in model.save:
                    y[spec.idx] = x
                if isinstance(x, tuple):
                    out.append(x)
            if out:
                return sum(jnp.sum(t.astype(jnp.float32))
                           for o in out for t in jax.tree.leaves(o))
            return jnp.sum(x.astype(jnp.float32))

    def timeit(fn, n, *a):
        def sync(o):
            return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
        sync(fn(*a))
        sync(fn(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / n

    prev_g = prev_f = 0.0
    print(f"{'cut':>4} {'fwd+grad ms':>12} {'d(grad)':>9}"
          + (f" {'fwd ms':>9} {'d(fwd)':>8}" if args.fwd else ""))
    for cut in [int(c) for c in args.cuts.split(",")]:
        mod = Prefix(cut=cut)
        pv = jax.jit(mod.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs[:1].astype(dtype) / 255, train=False)
        params = {"params": pv["params"]}
        stats = {"batch_stats": pv.get("batch_stats", {})}

        @jax.jit
        def grad_fn(p, u8):
            x = u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)

            def loss(pp):
                out, _ = mod.apply(
                    {"params": pp["params"], **stats}, x, train=True,
                    mutable=["batch_stats"])
                return out
            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(t) for t in jax.tree.leaves(g)) * 0

        t_g = timeit(grad_fn, args.iters, params, imgs)
        line = f"{cut:>4} {t_g*1e3:12.2f} {(t_g-prev_g)*1e3:9.2f}"
        prev_g = t_g
        if args.fwd:
            @jax.jit
            def fwd_fn(p, u8):
                x = u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
                out, _ = mod.apply({"params": p["params"], **stats}, x,
                                   train=True, mutable=["batch_stats"])
                return out

            t_f = timeit(fwd_fn, args.iters, params, imgs)
            line += f" {t_f*1e3:9.2f} {(t_f-prev_f)*1e3:8.2f}"
            prev_f = t_f
        print(line, flush=True)


if __name__ == "__main__":
    main()
