"""Measure the fused Pallas front-end on/off for S and M (VERDICT r3 #5:
the deeper RepHDW chains change the fuse tradeoff — measure, don't assume).

Usage: python tools/profile_frontend_sm.py [--graphs maf-yolo-s,maf-yolo-m]
"""
import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", default="maf-yolo-n,maf-yolo-s,maf-yolo-m")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    on_accel = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    for graph in args.graphs.split(","):
        for on in (True, False):
            bench.FRONTEND_ON[graph] = on
            try:
                ips = bench.bench_infer(graph, args.batch, args.iters, dtype,
                                        on_accel)
                print(f"{graph:12s} frontend={'on ' if on else 'off'} "
                      f"{ips:8.1f} img/s  ({args.batch * 1000 / ips:.2f} "
                      f"ms/batch{args.batch})", flush=True)
            except Exception as e:
                print(f"{graph:12s} frontend={on}: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
