"""Training state + the single jitted train step.

Parity target: the Trainer hot loop (yolov6/core/engine.py:141-166, 375-391):
AMP forward -> loss -> backward (DDP all-reduce) -> accumulate 64/bs -> SGD step +
EMA. TPU design: ONE jit-compiled function does forward (bf16), loss, grad, gradient
accumulation, the conditional SGD+EMA apply, and BN running-stat updates; batch
inputs are sharded over the mesh 'data' axis and XLA emits the ICI all-reduce where
torch used NCCL. uint8->float normalization happens on device so hosts ship 1 byte
per pixel (BASELINE.json north-star).

Loss normalization note: the reference normalizes per-rank by the rank-local
target_scores_sum and multiplies by world_size to undo DDP averaging
(engine.py:161-162). Under global-batch jit semantics our loss is normalized by the
global target_scores_sum -- exactly the single-device large-batch semantics, which
is what DDP approximates.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mafyolo_tpu.models.losses import detection_loss
from mafyolo_tpu.solver.build import param_groups, sgd_init, sgd_update
from mafyolo_tpu.utils.ema import ema_update


def init_train_state(model, rng, img_size: int, local_batch: int = 1) -> Dict:
    """Build the full state in ONE jitted call.

    Eager init dispatches one device op per parameter -- catastrophically slow
    over a tunneled chip (each tiny op is a remote compile). ema/params may alias
    buffers: the train step does not donate its inputs.
    """
    x = jnp.zeros((1, img_size, img_size, 3), model.dtype)

    @jax.jit
    def mk(rng):
        variables = model.init(rng, x, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return {
            "params": params,
            "batch_stats": stats,
            "ema": {"params": params, "batch_stats": stats},
            "mom": sgd_init(params),
            "grad_acc": sgd_init(params),
            "updates": jnp.zeros((), jnp.int32),
            "rng_step": jnp.zeros((), jnp.int32),
        }

    return mk(rng)


def make_train_step(model, *, num_classes: int, img_size: int,
                    strides: Sequence[int] = (8, 16, 32), reg_max: int = 16,
                    use_dfl: bool = True, iou_type: str = "giou",
                    weight_decay: float = 5e-4, ema_decay: float = 0.9999,
                    loss_weight=None, mesh=None, loss_type: str = "tal",
                    device_aug: dict = None, seed: int = 0,
                    teacher=None, max_epoch: int = 300,
                    distill_feat: bool = False, temperature: float = 20.0):
    """Returns step(state, imgs_u8, targets, lr_bnw, lr_w, lr_b, momentum,
    do_apply, use_atss) -> (state, metrics)."""
    groups_template: Dict[str, Any] = {}

    base_key = jax.random.PRNGKey(seed ^ 0x5DEECE66D)

    def step(state, imgs_u8, targets, lr_bnw, lr_w, lr_b, momentum, do_apply,
             use_atss, epoch_num=0):
        if device_aug is not None:
            # on-device affine/HSV/flip pipeline (data/device_aug.py); the host
            # loader runs letterbox-only in this mode
            from mafyolo_tpu.data.device_aug import device_augment
            key = jax.random.fold_in(base_key, state["rng_step"])
            imgs_f, targets = device_augment(imgs_u8, targets, key, **device_aug)
            imgs = imgs_f.astype(model.dtype)
        else:
            # BGR uint8 -> RGB float in [0,1] (engine.py prepro_data /255)
            imgs = (imgs_u8[..., ::-1].astype(model.dtype)
                    / jnp.asarray(255.0, model.dtype))

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            if loss_type == "distill":
                # teacher forward (eval mode, stop-grad) + KD loss
                # (engine.py:149-160 distill branch)
                from mafyolo_tpu.models.losses.distill import \
                    distill_detection_loss
                t_model, t_vars = teacher
                t_outs = t_model.apply(t_vars, imgs, train=False)
                total, comps = distill_detection_loss(
                    outs, t_outs, targets, epoch_num=epoch_num,
                    max_epoch=max_epoch, use_atss=use_atss,
                    num_classes=num_classes, img_size=img_size,
                    strides=strides, reg_max=reg_max, use_dfl=use_dfl,
                    iou_type=iou_type, temperature=temperature,
                    distill_feat=distill_feat)
            elif loss_type == "simota":
                from mafyolo_tpu.models.losses.simota import simota_loss
                total, comps = simota_loss(
                    outs, targets, num_classes=num_classes, img_size=img_size,
                    strides=strides, iou_type=iou_type)
            else:
                total, comps = detection_loss(
                    outs, targets, use_atss=use_atss, num_classes=num_classes,
                    img_size=img_size, strides=strides, reg_max=reg_max,
                    use_dfl=use_dfl, iou_type=iou_type, loss_weight=loss_weight)
            return total, (comps, mut["batch_stats"])

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grad_acc = jax.tree.map(jnp.add, state["grad_acc"], grads)
        groups = param_groups(state["params"])

        def apply_fn(op):
            params, mom, grad_acc, ema, updates = op
            new_params, new_mom = sgd_update(
                params, grad_acc, mom, groups, (lr_bnw, lr_w, lr_b), momentum,
                weight_decay)
            new_updates = updates + 1
            new_ema = ema_update(
                ema, {"params": new_params, "batch_stats": new_stats},
                new_updates, ema_decay)
            zero = jax.tree.map(jnp.zeros_like, grad_acc)
            return new_params, new_mom, zero, new_ema, new_updates

        def keep_fn(op):
            return op

        params, mom, grad_acc, ema, updates = jax.lax.cond(
            do_apply, apply_fn, keep_fn,
            (state["params"], state["mom"], grad_acc, state["ema"],
             state["updates"]))
        new_state = {"params": params, "batch_stats": new_stats, "ema": ema,
                     "mom": mom, "grad_acc": grad_acc, "updates": updates,
                     "rng_step": state["rng_step"] + 1}
        metrics = {"loss": loss, **comps}
        return new_state, metrics

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jit_kwargs = dict(
            in_shardings=(repl, data, data, repl, repl, repl, repl, repl, repl),
            out_shardings=(repl, repl),
        )
    # no donation: state buffers may alias (ema==params at init) and the model is
    # small enough that the extra live copy is irrelevant on a 16GB chip.
    return jax.jit(step, static_argnames=("use_atss",), **jit_kwargs)
