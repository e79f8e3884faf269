#!/usr/bin/env python3
"""FLOPs/params report (parity target: tools/get_flops.py + get_model_info,
yolo.py:455-474) -- but TPU-native: instead of a hook-based per-layer counter, the
numbers come from XLA's own cost analysis of the compiled forward, which is what
actually runs on the chip.
"""
import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from mafyolo_tpu.utils.envs import setup_jax  # noqa: E402

setup_jax()


def model_flops(graph="maf-yolo-n", nc=80, img_size=640, deploy=True, batch=1):
    import jax
    import jax.numpy as jnp

    from mafyolo_tpu.models import build_model
    from mafyolo_tpu.models.reparam import fold_variables

    train_model = build_model(graph, nc=nc)
    variables = jax.jit(train_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    if deploy:
        model = build_model(graph, nc=nc, deploy=True)
        variables = fold_variables(train_model.specs, variables)
    else:
        model = train_model

    def fwd(v, x):
        return model.apply(v, x, train=False)

    x = jnp.zeros((batch, img_size, img_size, 3))
    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0) / batch
    params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    return flops, params


def get_args_parser():
    p = argparse.ArgumentParser("MAF-YOLO-TPU flops")
    p.add_argument("--graph", default="maf-yolo-n")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--train-form", action="store_true")
    return p


def main():
    args = get_args_parser().parse_args()
    flops, params = model_flops(args.graph, args.nc, args.img_size,
                                deploy=not args.train_form)
    # the reference reports thop MACs*2 as "Gflops" (yolo.py:469); XLA counts
    # flops directly (mul+add separately), so these are directly comparable.
    print(f"{args.graph} @{args.img_size}: params {params / 1e6:.2f}M, "
          f"flops {flops / 1e9:.2f}G "
          f"({'train' if args.train_form else 'deploy'} form)")


if __name__ == "__main__":
    main()
