"""A/B: bf16-BN (round-4 default) vs f32-BN normalize on the SAME batch.

The round-4 snapshot switched ConvBN/idbn/post_bn to normalize in the model
dtype (bf16 on chip) with no recorded training-quality evidence (VERDICT r4
#4). This harness runs fwd+loss+grad twice on one batch -- once per BN
dtype via the MAFYOLO_BN_F32 flag, same params/stats -- and reports:
  * |loss_bf16BN - loss_f32BN|
  * aggregate grad-L1 relative delta (the round-3 remat-A/B protocol's
    bf16-noise yardstick: reduction-order noise alone measured ~0.6%)
  * step time for each build.

Run twice (flag is read at import): MAFYOLO_BN_F32=0 python ... --save a.npz
                                    MAFYOLO_BN_F32=1 python ... --save b.npz
then                                 python ... --compare a.npz b.npz
"""
import argparse
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--save", default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()

    if args.compare:
        a = np.load(args.compare[0])
        b = np.load(args.compare[1])
        dl = abs(float(a["loss"]) - float(b["loss"]))
        l1 = float(np.abs(a["gflat"] - b["gflat"]).sum())
        ref = float(np.abs(b["gflat"]).sum())
        print(f"loss bf16BN={float(a['loss']):.6f} f32BN={float(b['loss']):.6f} "
              f"|dloss|={dl:.3e}")
        print(f"grad-L1 delta {l1 / max(ref, 1e-12) * 100:.3f}% "
              f"(bf16 reduction-order yardstick ~0.6%)")
        print(f"step ms: bf16BN {float(a['ms']):.1f}  f32BN {float(b['ms']):.1f}")
        return

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from mafyolo_tpu.models import blocks as B
    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.losses import detection_loss

    print(f"BN_F32={B.BN_F32}")
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_model("maf-yolo-n", nc=80, remat=False, dtype=dtype)
    # identical init regardless of flag: params are f32 and BN dtype does not
    # affect shapes/rng
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    params = {"params": variables["params"]}
    stats = variables["batch_stats"]
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (args.batch, args.img, args.img, 3),
                                    np.uint8))
    targets = np.full((args.batch, 120, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    targets[:, 1] = [3, 0.3, 0.3, 0.2, 0.2]
    targets = jnp.asarray(targets)

    @jax.jit
    def fwd_loss_grad(p, u8):
        x = u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)

        def loss_fn(pp):
            outs, _ = model.apply({**pp, "batch_stats": stats}, x, train=True,
                                  mutable=["batch_stats"])
            total, _ = detection_loss(outs, targets, use_atss=False,
                                      num_classes=80, img_size=args.img)
            return total
        return jax.value_and_grad(loss_fn)(p)

    loss, grads = fwd_loss_grad(params, imgs)
    jax.block_until_ready(grads)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss, grads = fwd_loss_grad(params, imgs)
    float(loss)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    gflat = np.concatenate([np.asarray(g, np.float32).ravel()
                            for g in jax.tree.leaves(grads)])
    print(f"loss {float(loss):.6f}  step(fwd+loss+grad) {ms:.1f} ms  "
          f"|g|_1 {np.abs(gflat).sum():.4e}")
    if args.save:
        np.savez(args.save, loss=np.float32(float(loss)), gflat=gflat,
                 ms=np.float32(ms))


if __name__ == "__main__":
    main()
