"""Microbench round 2: XLA-level DW optimizations.

1. batch-merge: reshape [B,H,H,C] -> [1,B*(H+2p),H,C] with zero row gaps so
   one big DW replaces B small ones (kills small-spatial overhead at 20/40).
2. channel-split: C=144 -> 128+16 DWs (kills the 144->256 lane pad).
3. dk grouped-conv: DW weight-grad as ONE grouped conv contracting (B,H,W)
   per channel, vs the unrolled shift-multiply-reduce taps.
"""
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


@partial(jax.jit, static_argnames=("pad",))
def dw(x, kern, pad):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.jit, static_argnames=("pad",))
def dw_merged(x, kern, pad):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    xm = xp.reshape(1, b * (h + 2 * pad), w, c)
    y = jax.lax.conv_general_dilated(
        xm, kern, window_strides=(1, 1), padding=[(0, 0), (pad, pad)],
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.pad(y, ((0, 0), (0, 2 * pad), (0, 0), (0, 0)))
    return y.reshape(b, h + 2 * pad, w, c)[:, :h]


@partial(jax.jit, static_argnames=("pad", "split"))
def dw_split(x, kern, pad, split):
    a = dw(x[..., :split], kern[..., :split], pad)
    b = dw(x[..., split:], kern[..., split:], pad)
    return jnp.concatenate([a, b], axis=-1)


@partial(jax.jit, static_argnames=("k", "pad"))
def dk_taps(x, g, k, pad):
    """Current dkernel: unrolled shift-multiply-reduce taps (ops/dwconv.py)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    outs = []
    for u in range(k):
        row = []
        for v in range(k):
            t = xp[:, u:u + h, v:v + w, :].astype(jnp.float32)
            row.append(jnp.sum(t * g.astype(jnp.float32), axis=(0, 1, 2)))
        outs.append(jnp.stack(row))
    return jnp.stack(outs)[:, :, None, :]


@partial(jax.jit, static_argnames=("k", "pad"))
def dk_conv(x, g, k, pad):
    """dk as ONE grouped conv: groups=C, per-group in-features=B, kernel=g."""
    b, h, w, c = x.shape
    lhs = x.transpose(1, 2, 3, 0).reshape(1, h, w, c * b)       # [1,H,W,C*B]
    rhs = g.transpose(1, 2, 0, 3)                                # [H,W,B,C]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)                      # [1,k,k,C]
    return out.transpose(1, 2, 0, 3)                             # [k,k,1,C]


def main():
    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    B = 32
    rng = np.random.default_rng(0)

    print("== batch-merge at small spatial ==")
    for h, c, k in [(20, 576, 9), (20, 288, 9), (20, 192, 9),
                    (40, 288, 7), (40, 192, 7), (40, 128, 7)]:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.bfloat16)
        pad = k // 2
        t1 = timeit(dw, 100, x, kern, pad) * 1e3
        t2 = timeit(dw_merged, 100, x, kern, pad) * 1e3
        ok = np.allclose(np.asarray(dw(x, kern, pad), np.float32),
                         np.asarray(dw_merged(x, kern, pad), np.float32),
                         atol=1e-2)
        print(f"H={h} C={c} K={k}: plain {t1:6.3f}  merged {t2:6.3f} ms  "
              f"({t1/t2:4.2f}x) exact={ok}")

    print("== channel split at C=144 ==")
    for h, c, k in [(80, 144, 5)]:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.bfloat16)
        pad = k // 2
        t1 = timeit(dw, 100, x, kern, pad) * 1e3
        t2 = timeit(dw_split, 100, x, kern, pad, 128) * 1e3
        print(f"H={h} C={c} K={k}: plain {t1:6.3f}  split128 {t2:6.3f} ms")

    print("== dk formulations ==")
    for h, c, k in [(80, 192, 5), (80, 144, 5), (40, 288, 7), (20, 576, 9)]:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        pad = k // 2
        t1 = timeit(dk_taps, 30, x, g, k, pad) * 1e3
        t2 = timeit(dk_conv, 30, x, g, k, pad) * 1e3
        a = np.asarray(dk_taps(x, g, k, pad), np.float32)
        b = np.asarray(dk_conv(x, g, k, pad), np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        print(f"H={h} C={c} K={k}: taps {t1:7.3f}  conv {t2:7.3f} ms  "
              f"({t1/t2:5.2f}x) relerr={rel:.1e}")


if __name__ == "__main__":
    main()
