"""Calibrate the VPU ceiling: XLA fused FMA chain vs a Pallas in-register FMA
loop on the same block. Decides whether any DW stencil kernel has headroom."""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


TAPS = 25


@jax.jit
def xla_fma(x, w):
    # 25 dependent FMAs, f32 accumulator over a bf16 operand (the DW shape)
    acc = jnp.zeros(x.shape, jnp.float32)
    for i in range(TAPS):
        acc = acc + x.astype(jnp.float32) * w[i]
    return acc.astype(jnp.bfloat16)


@jax.jit
def xla_fma_bf16(x, w):
    acc = jnp.zeros(x.shape, jnp.bfloat16)
    for i in range(TAPS):
        acc = acc + x * w[i].astype(jnp.bfloat16)
    return acc


def pallas_fma(x, w):
    def kern(x_ref, w_ref, o_ref):
        xv = x_ref[...]
        acc = xv.astype(jnp.float32) * w_ref[0]
        for i in range(1, TAPS):
            acc += xv.astype(jnp.float32) * w_ref[i]
        o_ref[...] = acc.astype(jnp.bfloat16)

    n = x.shape[0]
    blk = 512
    return pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
    )(x, w)


pallas_fma_j = jax.jit(pallas_fma)


def main():
    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    rng = np.random.default_rng(0)
    # ~50M elements: big enough to hide overheads
    x = jnp.asarray(rng.standard_normal((32768, 1536)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((TAPS,)), jnp.float32)
    gflop = 2 * TAPS * x.size / 1e9

    t1 = timeit(xla_fma, 50, x, w) * 1e3
    t2 = timeit(xla_fma_bf16, 50, x, w) * 1e3
    t3 = timeit(pallas_fma_j, 50, x, w) * 1e3
    print(f"elements: {x.size/1e6:.1f}M, {gflop:.1f} GFLOP for {TAPS} FMAs")
    print(f"XLA  f32-acc chain : {t1:7.3f} ms  ({gflop/t1:6.2f} TF/s)")
    print(f"XLA  bf16 chain    : {t2:7.3f} ms  ({gflop/t2:6.2f} TF/s)")
    print(f"Pallas f32-acc     : {t3:7.3f} ms  ({gflop/t3:6.2f} TF/s)")


if __name__ == "__main__":
    main()
