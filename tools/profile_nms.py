"""Micro-profile of fused_decode_nms stages on real head outputs (forced-sync).

Usage: python tools/profile_nms.py [--batch 32] [--survivors 300]
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


def timeit(fn, *a, n=100):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a))
    sync(fn(*a))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--survivors", type=int, default=300)
    ap.add_argument("--compact-k", type=int, default=1024)
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    from mafyolo_tpu.ops.nms import fused_decode_nms, _blocked_greedy_select
    from mafyolo_tpu.ops.compaction import compact_mask_indices

    b = args.batch
    nc, reg_max = 80, 16
    sizes = [(args.img_size // s) for s in (8, 16, 32)]
    a_total = sum(s * s for s in sizes)
    rng = np.random.default_rng(0)

    # synthetic head outputs with a realistic survivor count per image
    cls = (rng.random((b, a_total, nc)) * 0.02).astype(np.float32)
    for bi in range(b):
        for _ in range(args.survivors):
            cls[bi, rng.integers(a_total), rng.integers(nc)] = \
                0.05 + 0.9 * rng.random()
    reg = rng.normal(size=(b, a_total, 4 * (reg_max + 1))).astype(np.float32)

    outs, i0 = [], 0
    for s in sizes:
        outs.append((None,
                     jnp.asarray(cls[:, i0:i0 + s * s]).reshape(b, s, s, nc)
                     .astype(jnp.bfloat16),
                     jnp.asarray(reg[:, i0:i0 + s * s]).reshape(
                         b, s, s, 4 * (reg_max + 1)).astype(jnp.bfloat16)))
        i0 += s * s
    cls_flat = jnp.asarray(cls).astype(jnp.bfloat16)

    full = jax.jit(lambda o: fused_decode_nms(
        o, conf_thres=0.03, iou_thres=0.65, max_det=300,
        compact_k=args.compact_k))
    print(f"fused_decode_nms (K={args.compact_k}, ~{args.survivors} "
          f"survivors): {timeit(full, outs):7.2f} ms")

    comp = jax.jit(lambda c: jax.vmap(
        lambda x: compact_mask_indices(x.reshape(-1) > 0.03,
                                       args.compact_k))(c))
    print(f"  compaction alone:        {timeit(comp, cls_flat):7.2f} ms")

    kp = args.compact_k
    boxes = jnp.asarray(rng.random((b, kp, 4)) * 600, jnp.float32)
    sc = jnp.asarray(-np.sort(-rng.random((b, kp)).astype(np.float32)), jnp.float32)
    ci = jnp.asarray(rng.integers(0, nc, (b, kp)), jnp.int32)

    greedy = jax.jit(lambda bx, s_, c_: jax.vmap(
        lambda bb, ss, cc: _blocked_greedy_select(
            bb, bb + cc[:, None].astype(bb.dtype) * 4096.0, ss, cc,
            0.65, 300))(bx, s_, c_))
    print(f"  blocked greedy (M={kp}):  {timeit(greedy, boxes, sc, ci):7.2f} ms")


if __name__ == "__main__":
    main()
