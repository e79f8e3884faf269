"""Microbench: XLA's depthwise-conv lowering vs VPU roofline at the MAF DW
shapes. Establishes whether DW taps are at the VPU ceiling (irreducible) or
XLA is leaving room (worth a Pallas/layout attack)."""
import os.path as osp
import sys
import time
from functools import partial

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
    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    B = 32
    shapes = [  # (H, C, K) -- the post-kernel DW sites of MAF-YOLO-N @640
        (80, 144, 5),   # L4 mid
        (40, 288, 7),   # L6 mid
        (20, 576, 9),   # L8 mid
        (20, 288, 9),   # L12/L30 mid
        (40, 192, 7),   # L16/L26 mid
        (80, 192, 5),   # L20/L22 mid
        (80, 128, 5),   # head P3 branches
        (40, 128, 7),   # head P4
        (20, 192, 9),   # head P5
    ]

    @partial(jax.jit, static_argnames=("k", "pad"))
    def dw(x, kern, k, pad):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @partial(jax.jit, static_argnames=("k", "pad"))
    def dw_shifts(x, kern, k, pad):
        # same op as explicit pad+slice taps (the schedule XLA fuses itself)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        h, w = x.shape[1:3]
        acc = jnp.zeros_like(x, jnp.float32)
        for u in range(k):
            for v in range(k):
                acc += (xp[:, u:u + h, v:v + w, :].astype(jnp.float32)
                        * kern[u, v, 0].astype(jnp.float32))
        return acc.astype(x.dtype)

    total = {"conv": 0.0, "shifts": 0.0, "flops": 0.0}
    rng = np.random.default_rng(0)
    for h, c, k in shapes:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.bfloat16)
        pad = k // 2
        t1 = timeit(dw, 100, x, kern, k, pad) * 1e3
        t2 = timeit(dw_shifts, 50, x, kern, k, pad) * 1e3
        gflop = 2 * k * k * c * h * h * B / 1e9
        gb = 2 * (2 * B * h * h * c) / 1e9   # read + write bf16
        print(f"H={h:3d} C={c:3d} K={k}: conv {t1:6.3f} ms ({gflop/t1:6.2f} TF/s)"
              f"  shifts {t2:6.3f} ms   [{gflop:5.1f} GF, {gb*1e3:5.0f} MB rw]")
        total["conv"] += t1
        total["shifts"] += t2
        total["flops"] += gflop
    print(f"TOTAL conv {total['conv']:.2f} ms, shifts {total['shifts']:.2f} ms, "
          f"{total['flops']:.0f} GFLOP -> {total['flops']/total['conv']:.2f} TF/s")


if __name__ == "__main__":
    main()
