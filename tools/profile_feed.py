"""Pod-feeding rehearsal: letterbox-only host loader -> device-aug train step.

VERDICT r3 #7: demonstrate (not just plan) that the pod feeding recipe --
host does decode+letterbox only, ALL augmentation (mosaic/mixup/affine/HSV/
flips) on-device via --device-aug -- sustains the real-chip train step for
>= 200 steps without starvation. Reports steady img/s, the host loader's
standalone rate, and the fraction of wall time the step loop spent blocked
waiting on the host (the starvation measure: dispatch is async, so a healthy
pipeline hides the host work entirely under device execution).

Reference equivalence: the torch reference feeds its DDP step from
DataLoader workers (data_load.py); its host does the FULL augmentation
pipeline per sample, which a 1-core host cannot sustain at TPU step rates
(measured 29 img/s vs the 181 img/s demand, docs/STATUS.md round 3).

Usage: python tools/profile_feed.py [--steps 200] [--batch 32] [--workers 2]
"""
import argparse
import os.path as osp
import shutil
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=220)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--processes", action="store_true",
                    help="process-pool loader instead of threads")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from mafyolo_tpu.utils.envs import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mafyolo_tpu.core.train_state import init_train_state, make_train_step
    from mafyolo_tpu.data import create_dataloader
    from mafyolo_tpu.models import build_model
    from tests.helpers import make_synth_dataset

    root = f"/tmp/feed_bench_{args.images}_{args.img_size}"
    if not args.keep and osp.exists(root):
        shutil.rmtree(root)
    if not osp.exists(root):
        make_synth_dataset(root, n_images=args.images, img_size=args.img_size,
                           max_objects=12, nc=16, seed=0, splits=("train",))

    # the maf_yolo_n config's data_aug, run ON DEVICE (engine.py device_aug)
    device_aug = dict(degrees=0.0, translate=0.1, scale=0.9, shear=0.0,
                      hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5,
                      flipud=0.0, mosaic=1.0, mixup=0.1, dy_label=5,
                      dy_mixup=0.1)
    hyp = dict(device_aug)   # loader sees hyp only for cache keys
    loader, _ = create_dataloader(
        f"{root}/images/train", args.img_size, args.batch, stride=32, hyp=hyp,
        augment=False,     # letterbox-only host path (engine.py:90-111)
        workers=args.workers, shuffle=True, seed=0,
        use_processes=args.processes)

    # standalone host rate first (no device in the loop)
    n, t0 = 0, time.perf_counter()
    loader.set_epoch(0)
    for imgs, targets, _ in loader:
        n += imgs.shape[0]
    host_rate = n / (time.perf_counter() - t0)
    print(f"host letterbox-only rate ({args.workers} workers"
          f"{', processes' if args.processes else ''}): {host_rate:.1f} img/s")

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_model("maf-yolo-n", nc=16, dtype=dtype)
    state = init_train_state(model, jax.random.PRNGKey(0), args.img_size)
    step = make_train_step(model, num_classes=16, img_size=args.img_size,
                           device_aug=device_aug, seed=0)
    one, mom = jnp.float32(0.01), jnp.float32(0.937)

    def run(st, imgs, targets, epoch):
        return step(st, jnp.asarray(imgs), jnp.asarray(targets), one, one,
                    one, mom, jnp.bool_(True), False, jnp.float32(epoch))

    # compile + settle
    loader.set_epoch(1)
    it = iter(loader)
    imgs, targets, _ = next(it)
    state, metrics = run(state, imgs, targets, 1)
    float(jnp.asarray(metrics["loss"], jnp.float32))

    done, epoch = 0, 1
    t_wait = 0.0
    t0 = time.perf_counter()
    while done < args.steps:
        tw = time.perf_counter()
        try:
            imgs, targets, _ = next(it)
        except StopIteration:
            epoch += 1
            loader.set_epoch(epoch)
            it = iter(loader)
            imgs, targets, _ = next(it)
        t_wait += time.perf_counter() - tw
        state, metrics = run(state, imgs, targets, epoch)
        done += 1
    # force the final value to fence the async stream
    loss = float(jnp.asarray(metrics["loss"], jnp.float32))
    dt = time.perf_counter() - t0
    ips = done * args.batch / dt
    print(f"{done} steps, {epoch - 1} epoch rollovers: "
          f"{dt / done * 1e3:.1f} ms/step = {ips:.1f} img/s "
          f"(loss {loss:.3f})")
    print(f"host-wait fraction: {t_wait / dt * 100:.1f}% "
          f"({t_wait / done * 1e3:.1f} ms/step blocked in next())")
    demand = ips
    print(f"verdict: host rate {host_rate:.0f} img/s vs device demand "
          f"{demand:.0f} img/s/chip -> "
          f"{'SUSTAINED' if t_wait / dt < 0.1 else 'STARVED'} on this "
          f"1-core host; a v5e-8 needs ~{8 * demand / max(host_rate, 1):.1f} "
          f"such cores")


if __name__ == "__main__":
    main()
