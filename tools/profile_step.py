"""Forced-sync train-step profiler (single chip, bs32 @640, MAF-YOLO-N).

block_until_ready is a no-op on the tunneled axon platform, so every timing
forces a scalar host fetch. Usage: python tools/profile_step.py [--batch 32]
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


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def timeit(fn, n=10, warmup=2):
    """fn() must return an on-device scalar-able value; steps are serialized by
    their own data dependence (state threading), so we dispatch n and force ONE
    host fetch at the end — the ~30ms tunnel roundtrip amortizes to ~3ms/iter."""
    for _ in range(warmup):
        sync(fn())
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--deep", action="store_true")
    args = ap.parse_args()

    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    b, s = args.batch, args.img_size
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_model("maf-yolo-n", nc=80, remat=False, dtype=dtype)
    state = init_train_state(model, jax.random.PRNGKey(0), s)
    step = make_train_step(model, num_classes=80, img_size=s)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), np.uint8))
    targets = np.full((b, 120, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    targets[:, 1] = [3, 0.3, 0.3, 0.2, 0.2]
    targets = jnp.asarray(targets)
    one = jnp.float32(0.01)
    mom = jnp.float32(0.937)

    holder = {"state": state}

    def full_apply():
        holder["state"], m = step(holder["state"], imgs, targets, one, one,
                                  one, mom, jnp.bool_(True), False)
        return m["loss"]

    def full_acc():
        holder["state"], m = step(holder["state"], imgs, targets, one, one,
                                  one, mom, jnp.bool_(False), False)
        return m["loss"]

    t_apply = timeit(full_apply, n=args.iters)
    t_acc = timeit(full_acc, n=args.iters)
    print(f"full step (apply):      {t_apply*1e3:8.1f} ms  "
          f"{b/t_apply:7.1f} img/s")
    print(f"full step (accumulate): {t_acc*1e3:8.1f} ms  "
          f"{b/t_acc:7.1f} img/s")

    # forward / fwd+loss+grad breakdown
    from mafyolo_tpu.core.flatten import make_flatteners
    from mafyolo_tpu.models.losses import detection_loss
    pf, _, _ = make_flatteners(model, s)
    params = pf.unflatten(holder["state"]["params"])
    stats = holder["state"]["batch_stats"]

    @jax.jit
    def fwd(params, imgs_u8):
        x = imgs_u8[..., ::-1].astype(model.dtype) / jnp.asarray(
            255.0, model.dtype)
        outs, _ = model.apply({"params": params, "batch_stats": stats}, x,
                              train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs))

    @jax.jit
    def fwd_loss_grad(params, imgs_u8):
        x = imgs_u8[..., ::-1].astype(model.dtype) / jnp.asarray(
            255.0, model.dtype)

        def loss_fn(p):
            outs, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                  train=True, mutable=["batch_stats"])
            total, _ = detection_loss(outs, targets, use_atss=False,
                                      num_classes=80, img_size=s)
            return total
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 0

    t_fwd = timeit(lambda: fwd(params, imgs), n=args.iters)
    t_g = timeit(lambda: fwd_loss_grad(params, imgs), n=args.iters)
    print(f"forward only:           {t_fwd*1e3:8.1f} ms")
    print(f"fwd+loss+grad:          {t_g*1e3:8.1f} ms")
    print(f"optimizer/EMA overhead: {(t_apply-t_g)*1e3:8.1f} ms")

    if not args.deep:
        return

    @jax.jit
    def fwd_loss(params, imgs_u8):
        x = imgs_u8[..., ::-1].astype(model.dtype) / jnp.asarray(
            255.0, model.dtype)
        outs, _ = model.apply({"params": params, "batch_stats": stats}, x,
                              train=True, mutable=["batch_stats"])
        total, _ = detection_loss(outs, targets, use_atss=False,
                                  num_classes=80, img_size=s)
        return total

    @jax.jit
    def grad_dummy(params, imgs_u8):
        # model backward only: scalar-sum loss skips TAL/IoU/DFL backward
        x = imgs_u8[..., ::-1].astype(model.dtype) / jnp.asarray(
            255.0, model.dtype)

        def loss_fn(p):
            outs, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                  train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(outs))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 0

    model_nr = build_model("maf-yolo-n", nc=80, remat=False, dtype=dtype)

    @jax.jit
    def grad_dummy_noremat(params, imgs_u8):
        x = imgs_u8[..., ::-1].astype(model_nr.dtype) / jnp.asarray(
            255.0, model_nr.dtype)

        def loss_fn(p):
            outs, _ = model_nr.apply({"params": p, "batch_stats": stats}, x,
                                     train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(outs))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 0

    t_fl = timeit(lambda: fwd_loss(params, imgs), n=args.iters)
    t_gd = timeit(lambda: grad_dummy(params, imgs), n=args.iters)
    print(f"fwd+loss (no grad):     {t_fl*1e3:8.1f} ms   (loss fwd = "
          f"{(t_fl-t_fwd)*1e3:.1f})")
    print(f"fwd+grad dummy loss:    {t_gd*1e3:8.1f} ms   (model bwd = "
          f"{(t_gd-t_fwd)*1e3:.1f})")
    try:
        t_gdn = timeit(lambda: grad_dummy_noremat(params, imgs), n=args.iters)
        print(f"  same, remat=False:    {t_gdn*1e3:8.1f} ms")
    except Exception as e:
        print(f"  remat=False failed: {e}")


if __name__ == "__main__":
    main()
