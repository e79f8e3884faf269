"""Band-size (rows-per-grid-step) sweep for the fused front-end kernel.

_pick_rows chooses the largest VMEM-feasible band; this measures whether that
heuristic is optimal on the real chip by timing kernel-only at every feasible
band size."""
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


def timeit(fn, n, *a):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a)); sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640)
    wts = tuple(jax.device_put(wts))

    imgs_np = np.random.default_rng(0).integers(
        0, 255, (args.batch, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    default = F._pick_rows(cfg)
    print(f"default rows = {default} (hb={cfg.hb}, lp={cfg.lp})")
    feasible = [r for r in range(1, cfg.hb + 1)
                if cfg.hb % r == 0 and (r * cfg.lp) % 128 == 0]
    orig = F._pick_rows
    raw = F.frontend_forward.__wrapped__   # bypass the jit cache per band size
    for r in feasible:
        F._pick_rows = lambda cfg, _r=r: _r
        try:
            run = jax.jit(lambda x: raw(x, wts, cfg, False))
            dt = timeit(run, args.iters, xp) * 1e3
            print(f"rows={r:4d}: {dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"rows={r:4d}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        finally:
            F._pick_rows = orig


if __name__ == "__main__":
    main()
