"""Estimate the tier-2 fusion win: cost of L3 (MPRep) + L18 (ConvWrapper s2)
when consumed from the fused front-end kernel's 160^2 NHWC output, i.e. the
exact XLA work the tier-2 kernel extension would absorb."""
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
    from mafyolo_tpu.models import build_model, blocks as B
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    dtype = jnp.bfloat16
    train_model = build_model("maf-yolo-n", nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640)
    wts = tuple(jax.device_put(wts))
    p = folded["params"]["net"]

    imgs_np = np.random.default_rng(0).integers(
        0, 255, (32, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    s3 = dict(train_model.specs[3].kwargs)
    s18 = dict(train_model.specs[18].kwargs)
    mp = B.MPRep(deploy=True, dtype=dtype, **s3)
    cw = B.ConvWrapper(deploy=True, dtype=dtype, **s18)

    @jax.jit
    def kernel_only(x):
        return F.frontend_forward(x, wts, cfg)

    @jax.jit
    def with_l3_l18(x):
        y = F.frontend_forward(x, wts, cfg)[:, :, :cfg.wb, :]
        a = mp.apply({"params": p["layer3"]}, y, train=False)
        b = cw.apply({"params": p["layer18"]}, y, train=False)
        return a, b

    tk = timeit(kernel_only, 100, xp) * 1e3
    t2 = timeit(with_l3_l18, 100, xp) * 1e3
    print(f"kernel only        : {tk:6.2f} ms")
    print(f"kernel + L3 + L18  : {t2:6.2f} ms  (L3+L18 cost {t2-tk:+.2f})")


if __name__ == "__main__":
    main()
