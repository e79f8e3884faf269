"""Weight-grad formulations for the front-end DENSE convs (L0/L1 RepVGG).

profile_bwd_micro: L0 bwd ~10 ms, L1 bwd ~4.3 ms standalone. XLA lowers a
conv weight-grad as a conv contracting over (B,H,W) with tiny Cin*K*K x Cout
output -- badly tiled at cin=3/24. Candidate: explicit im2col patches +
one MXU dot_general (patches matmul), which XLA tiles like any big matmul.

Times, per formulation: fwd+grad of a conv3x3s2 (+1x1s2 branch like RepVGG)
with sum loss, A/B against a patches-dot custom VJP.
"""
import argparse
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


def timeit(fn, *a, iters=20):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a))
    sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / iters


def conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_pdot(x, k, stride, pad):
    return conv(x, k, stride, pad)


def _fwd(x, k, stride, pad):
    return conv(x, k, stride, pad), (x, k)


def _bwd(stride, pad, res, g):
    x, k = res
    kh, kw, cin, cout = k.shape
    # dx: standard transposed conv (what XLA does; it is fine). The high side
    # needs the trailing-edge adjustment (W+2p-k)%s so dx matches x's shape
    # for stride-2 even-sized inputs (ADVICE r4: symmetric padding yielded
    # H/2*2-1 vs H).
    h, w = x.shape[1], x.shape[2]
    adj_h = (h + 2 * pad - kh) % stride
    adj_w = (w + 2 * pad - kw) % stride
    dx = jax.lax.conv_transpose(
        g, jnp.flip(k, (0, 1)).astype(g.dtype).transpose(0, 1, 3, 2),
        strides=(stride, stride),
        padding=[(kh - 1 - pad, kh - 1 - pad + adj_h),
                 (kw - 1 - pad, kw - 1 - pad + adj_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=False)
    # dk: explicit im2col patches + one MXU dot over B*H'*W'
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # [B,H',W',cin*kh*kw]
    p2 = patches.reshape(-1, cin * kh * kw)
    g2 = g.reshape(-1, cout)
    dk = jax.lax.dot_general(p2, g2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # patches channel order is cin-major ([cin, kh, kw] flattened)
    dk = dk.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3).astype(k.dtype)
    return dx.astype(x.dtype), dk


conv_pdot.defvjp(_fwd, _bwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)

    for name, (h, cin, cout) in (("L0 3->24 @640", (640, 3, 24)),
                                 ("L1 24->48 @320", (320, 24, 48))):
        x = jnp.asarray(rng.normal(size=(b, h, h, cin)), dtype)
        k3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
        k1 = jnp.asarray(rng.normal(size=(1, 1, cin, cout)) * 0.1, jnp.float32)

        def mk(fn):
            @jax.jit
            def f(xx, kk3, kk1):
                def loss(ks):
                    y = fn(xx, ks[0], 2, 1) + fn(xx, ks[1], 2, 0)
                    return jnp.sum(y.astype(jnp.float32))
                l, g = jax.value_and_grad(loss)((kk3, kk1))
                return l + sum(jnp.sum(t) for t in jax.tree.leaves(g)) * 0
            return f

        t_xla = timeit(mk(conv), x, k3, k1, iters=args.iters)
        t_pd = timeit(mk(conv_pdot), x, k3, k1, iters=args.iters)
        # parity: dk AND dx (dx would flow if this VJP were ever promoted
        # into the training path; ADVICE r4 asked for the explicit check)
        gx = jax.grad(lambda kk: jnp.sum(conv(x, kk, 2, 1).astype(jnp.float32)))(k3)
        gp = jax.grad(lambda kk: jnp.sum(conv_pdot(x, kk, 2, 1).astype(jnp.float32)))(k3)
        err = float(jnp.max(jnp.abs(gx - gp)) / (jnp.max(jnp.abs(gx)) + 1e-9))
        dxx = jax.grad(lambda xx: jnp.sum(conv(xx, k3, 2, 1).astype(jnp.float32)))(x)
        dxp = jax.grad(lambda xx: jnp.sum(conv_pdot(xx, k3, 2, 1).astype(jnp.float32)))(x)
        assert dxp.shape == x.shape, (dxp.shape, x.shape)
        err_x = float(jnp.max(jnp.abs(dxx.astype(jnp.float32)
                                      - dxp.astype(jnp.float32)))
                      / (float(jnp.max(jnp.abs(dxx))) + 1e-9))
        print(f"{name}: xla {t_xla*1e3:.2f} ms, patches-dot {t_pd*1e3:.2f} ms, "
              f"rel err dk {err:.2e} dx {err_x:.2e}")


if __name__ == "__main__":
    main()
