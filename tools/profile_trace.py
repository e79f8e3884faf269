"""Op-level trace of the e2e inference graph (jax.profiler -> hlo_stats).

Captures a device trace of the shipped fused-frontend e2e path and prints the
top HLO ops by self time -- the measurement tool behind the round-3 glue hunt
(concat/transpose/fusion fat in the post-kernel graph is invisible to stage
deltas but obvious here).

Usage: python tools/profile_trace.py [--batch 32] [--top 40] [--stage e2e|fwd]
"""
import argparse
import glob
import os

# the plugin's generated protos predate the installed protobuf C++ runtime;
# the pure-python parser accepts them (slower, fine for offline parsing)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import os.path as osp
import subprocess
import sys
import tempfile

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def capture(fn, *a, iters=30):
    def sync(o):
        return float(jnp.asarray(jax.tree.leaves(o)[0], jnp.float32).sum())
    sync(fn(*a))
    sync(fn(*a))
    tmp = tempfile.mkdtemp(prefix="maf_trace_")
    with jax.profiler.trace(tmp):
        o = None
        for _ in range(iters):
            o = fn(*a)
        sync(o)
    return tmp


def hlo_stats(trace_dir):
    """Parse the captured xplane: per-XLA-op total device time.

    Returns (ops, n_runs): ops = [(total_us, name, avg_us_per_run)], n_runs =
    number of XLA module executions seen (the per-iter divisor). The
    tensorboard_plugin_profile converters are version-broken against the
    installed TF, so this reads the XSpace proto directly (TPU device plane,
    'XLA Ops' line)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = glob.glob(osp.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        raise RuntimeError(f"no xplane under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(xs[0], "rb") as f:
        sp.ParseFromString(f.read())
    plane = next(p for p in sp.planes if "TPU" in p.name or "GPU" in p.name)
    meta = plane.event_metadata
    totals, n_runs = {}, 0
    for line in plane.lines:
        if line.name == "XLA Modules":
            n_runs = max(n_runs, len(line.events))
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta[ev.metadata_id].name
            totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e6
    ops = sorted(((us, name) for name, us in totals.items()), reverse=True)
    return ops, max(n_runs, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--graph", default="maf-yolo-n")
    ap.add_argument("--stage", default="e2e",
                    choices=["e2e", "fwd", "nms", "train"])
    ap.add_argument("--parse", default=None, metavar="TRACE_DIR",
                    help="skip capture; parse an existing trace dir "
                    "(run in a fresh process: the pure-python protobuf "
                    "switch must precede all google.protobuf imports)")
    args = ap.parse_args()

    if args.parse:
        report(args.parse, args.top, args.iters)
        return

    from mafyolo_tpu.utils.envs import setup_jax
    setup_jax()

    if args.stage == "train":
        # full train step (fwd+loss+grad+SGD+EMA) -- the round-5 backward hunt
        from mafyolo_tpu.core.train_state import (init_train_state,
                                                  make_train_step)
        from mafyolo_tpu.models import build_model
        model = build_model(args.graph, nc=80, remat=False, dtype=jnp.bfloat16)
        state = init_train_state(model, jax.random.PRNGKey(0), 640)
        step = make_train_step(model, num_classes=80, img_size=640)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (args.batch, 640, 640, 3),
                                        np.uint8))
        targets = np.full((args.batch, 120, 5), -1, np.float32)
        targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
        targets[:, 1] = [3, 0.3, 0.3, 0.2, 0.2]
        targets = jnp.asarray(targets)
        one, mom = jnp.float32(0.01), jnp.float32(0.937)

        def one_step(st):
            st, m = step(st, imgs, targets, one, one, one, mom,
                         jnp.bool_(True), False)
            return st, m["loss"]

        def run(st):
            for _ in range(args.iters):
                st, loss = one_step(st)
            return loss

        state, _ = one_step(state)
        jax.block_until_ready(state["params"])
        tmp = tempfile.mkdtemp(prefix="maf_trace_")
        with jax.profiler.trace(tmp):
            loss = run(state)
            float(loss)
        print("trace dir:", tmp, flush=True)
        subprocess.run([sys.executable, __file__, "--parse", tmp,
                        "--top", str(args.top), "--iters", str(args.iters)],
                       check=False)
        return

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables
    from mafyolo_tpu.ops import frontend_pallas as F
    from mafyolo_tpu.ops.nms import fused_decode_nms

    dtype = jnp.bfloat16
    train_model = build_model(args.graph, nc=80)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = jax.device_put(fold_variables(train_model.specs, variables))
    skip = F.frontend_skip_until(train_model.specs, train_model.save)
    model = build_model(args.graph, nc=80, deploy=True, skip_until=skip,
                        dtype=dtype)
    cfg, wts = F.frontend_build(train_model.specs, folded, 640, 640,
                                fuse_l2=skip >= 2)
    wts = tuple(jax.device_put(wts))
    imgs_np = np.random.default_rng(0).integers(
        0, 255, (args.batch, 640, 640, 3), dtype=np.uint8)
    xp = jnp.asarray(F.pack_s2d_np(imgs_np, cfg))

    @jax.jit
    def fwd(x):
        y = F.frontend_forward(x, wts, cfg)
        return model.apply(folded, y[:, :, :cfg.wb, :], train=False)

    @jax.jit
    def e2e(x):
        return fused_decode_nms(fwd(x), strides=model.strides,
                                reg_max=model.reg_max, conf_thres=0.03,
                                iou_thres=0.65, max_det=300)

    @jax.jit
    def nms_only(outs):
        return fused_decode_nms(outs, strides=model.strides,
                                reg_max=model.reg_max, conf_thres=0.03,
                                iou_thres=0.65, max_det=300)

    if args.stage == "fwd":
        tdir = capture(fwd, xp, iters=args.iters)
    elif args.stage == "nms":
        outs = jax.block_until_ready(fwd(xp))
        tdir = capture(nms_only, outs, iters=args.iters)
    else:
        tdir = capture(e2e, xp, iters=args.iters)
    print("trace dir:", tdir, flush=True)
    # parse in a clean subprocess: jax already imported upb protobuf here
    subprocess.run([sys.executable, __file__, "--parse", tdir,
                    "--top", str(args.top), "--iters", str(args.iters)],
                   check=False)


def report(tdir, top, iters):
    ops, n_runs = hlo_stats(tdir)
    tot = sum(o[0] for o in ops)
    print(f"module executions seen: {n_runs}")
    print(f"total device op time: {tot:.0f} us "
          f"-> {tot/n_runs/1e3:.3f} ms/run")
    for us, name in ops[:top]:
        print(f"{us/n_runs:9.1f} us/run  {name[:120]}")


if __name__ == "__main__":
    print("trace dirs are left under /tmp/maf_trace_* (delete freely)")
    main()
