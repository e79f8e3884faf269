"""Micro-benchmark: 3x3/stride-2 conv at the neck down-branch shapes, direct
XLA lowering vs the W-paired reformulation.

The W-paired form absorbs the width stride into channels with a FREE reshape
(NHWC [B,H,W,C] -> [B,H,W/2,2C] is contiguous): out(y,x) taps columns
{2x-1, 2x, 2x+1} = pair x-1's odd element plus pair x's both, i.e. a [3,2]
window over pairs with stride (2,1). Doubles the contraction depth the MXU
sees at these tiny channel counts."""
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
from jax import lax


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


def pair_weights(k):
    """[3,3,Cin,Cout] -> [3,2,2*Cin,Cout] for the W-paired input layout.

    Paired input P[h, x', 2*? ... ] has channel c*? -- layout is
    [..., 2C] = (pixel 2x'+0 channels, pixel 2x'+1 channels).
    Output x taps input columns 2x-1, 2x, 2x+1 with pad 1:
      col 2x-1 = pair (x-1), element 1 -> window slot 0, channels C:2C
      col 2x   = pair (x),   element 0 -> window slot 1, channels 0:C
      col 2x+1 = pair (x),   element 1 -> window slot 1, channels C:2C
    """
    k = np.asarray(k)
    kh, kw, cin, cout = k.shape
    assert kw == 3
    w = np.zeros((kh, 2, 2 * cin, cout), k.dtype)
    w[:, 0, cin:] = k[:, 0]     # v=0 (col 2x-1)
    w[:, 1, :cin] = k[:, 1]     # v=1 (col 2x)
    w[:, 1, cin:] = k[:, 2]     # v=2 (col 2x+1)
    return w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    b = args.batch
    rng = np.random.default_rng(0)

    for hw, cin, cout in [(160, 18, 24), (80, 36, 24), (80, 48, 48),
                          (40, 48, 48)]:
        x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), jnp.bfloat16)
        k = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
        kb = jnp.asarray(k, jnp.bfloat16)
        kp = jnp.asarray(pair_weights(k), jnp.bfloat16)

        def direct(x):
            return lax.conv_general_dilated(
                x, kb, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def paired(x):
            xp = x.reshape(b, hw, hw // 2, 2 * cin)
            return lax.conv_general_dilated(
                xp, kp, (2, 1), ((1, 1), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        jd = jax.jit(direct)
        jp = jax.jit(paired)
        err = float(jnp.abs(jd(x).astype(jnp.float32)
                            - jp(x).astype(jnp.float32)).max())
        td = timeit(jd, args.iters, x) * 1e3
        tp = timeit(jp, args.iters, x) * 1e3
        print(f"{hw}x{hw} {cin}->{cout}: direct {td:6.3f} ms  "
              f"paired {tp:6.3f} ms  (max err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
