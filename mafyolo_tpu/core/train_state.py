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

from mafyolo_tpu.core.flatten import Flattener, make_flatteners
from mafyolo_tpu.models.losses import detection_loss
from mafyolo_tpu.solver.build import GROUP_BIAS, GROUP_BNW, GROUP_WEIGHT


def init_train_state(model, rng, img_size: int, local_batch: int = 1) -> Dict:
    """Build the full state in ONE jitted call.

    Hot buffers (params / momentum / grad-acc / EMA) are stored as flat f32
    vectors (core/flatten.py) so the optimizer+EMA update is a few large fused
    kernels instead of ~420 per-leaf ops. batch_stats stays a pytree (flax
    mutates it through model.apply); its EMA copy is flat.

    Eager init dispatches one device op per parameter -- catastrophically slow
    over a tunneled chip (each tiny op is a remote compile) -- so everything
    happens inside one jit.
    """
    pf, sf, _ = make_flatteners(model, img_size)
    x = jnp.zeros((1, img_size, img_size, 3), model.dtype)

    @jax.jit
    def mk(rng):
        variables = model.init(rng, x, train=False)
        flat = pf.flatten(variables["params"])
        stats = variables.get("batch_stats", {})
        return {
            "params": flat,
            "batch_stats": stats,
            "ema": {"params": flat, "batch_stats": sf.flatten(stats)},
            "mom": jnp.zeros_like(flat),
            "grad_acc": jnp.zeros_like(flat),
            "updates": jnp.zeros((), jnp.int32),
            "rng_step": jnp.zeros((), jnp.int32),
            # Wise-IoU running mean (ops/boxes.wiou_loss; IoU_Cal.iou_mean,
            # yolov6/utils/wiou.py:13). Carried unconditionally; inert unless
            # iou_type == 'wiou'.
            "wiou_mean": jnp.ones((), jnp.float32),
        }

    return mk(rng)


def params_pytree(model, img_size: int, state: Dict):
    """Current (non-EMA) params as a pytree, e.g. for checkpointing."""
    pf, _, _ = make_flatteners(model, img_size)
    return pf.unflatten(state["params"])


def ema_eval_variables(model, img_size: int, state: Dict) -> Dict:
    """EMA weights as flax variables for evaluation."""
    pf, sf, _ = make_flatteners(model, img_size)
    return {"params": pf.unflatten(state["ema"]["params"]),
            "batch_stats": sf.unflatten(state["ema"]["batch_stats"])}


def flatten_into_state(model, img_size: int, state: Dict, *,
                       params=None, ema=None, mom=None) -> Dict:
    """Replace state buffers from pytrees (resume / pretrained load)."""
    pf, sf, _ = make_flatteners(model, img_size)
    out = dict(state)
    if params is not None:
        out["params"] = pf.flatten(params)
    if ema is not None:
        out["ema"] = {"params": pf.flatten(ema["params"]),
                      "batch_stats": sf.flatten(ema.get("batch_stats", {}))}
    if mom is not None:
        out["mom"] = pf.flatten(mom) if isinstance(mom, dict) else \
            jnp.asarray(mom, jnp.float32)
    return out


def make_train_step(model, *, num_classes: int, img_size: int,
                    strides: Sequence[int] = (8, 16, 32), reg_max: int = 16,
                    use_dfl: bool = True, iou_type: str = "giou",
                    weight_decay: float = 5e-4, ema_decay: float = 0.9999,
                    loss_weight=None, mesh=None, loss_type: str = "tal",
                    device_aug: dict = None, seed: int = 0,
                    teacher=None, max_epoch: int = 300,
                    distill_feat: bool = False, temperature: float = 20.0,
                    grad_mask=None):
    """Returns step(state, imgs_u8, targets, lr_bnw, lr_w, lr_b, momentum,
    do_apply, use_atss) -> (state, metrics).

    The optimizer/EMA update is branchless (arithmetic selects on the traced
    do_apply scalar) over flat buffers: round 1's lax.cond over the full
    ~420-leaf state tuple forced XLA to materialize per-leaf copies on both
    branches (~290ms/step, and 1.1s on the accumulate-only branch).
    """
    pf, sf, gids_np = make_flatteners(model, img_size)
    gids = jnp.asarray(gids_np)  # int8, one id per scalar element

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
                    use_dfl=use_dfl, iou_type=iou_type, loss_weight=loss_weight,
                    wiou_mean=state.get("wiou_mean"))
            return total, (comps, mut["batch_stats"])

        params_tree = pf.unflatten(state["params"])
        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params_tree)
        acc = state["grad_acc"] + pf.flatten(grads)

        # torch-SGD-nesterov over flat buffers: g = grad + wd*p (weight group
        # only); buf = m*buf + g; step = g + m*buf; p -= lr[group]*step.
        # RepOptimizer: grad-mask multiplies the raw grad BEFORE weight decay
        # (RepOptimizer.py step(): d_p = p.grad * mask, then d_p += wd*p).
        # The mask is applied only to the step input, not to the stored
        # accumulator, so multi-step accumulation masks exactly once.
        masked = acc * grad_mask if grad_mask is not None else acc
        p, mom_buf = state["params"], state["mom"]
        g = masked + (weight_decay * (gids == GROUP_WEIGHT)) * p
        buf = momentum * mom_buf + g
        delta = g + momentum * buf
        lr_flat = jnp.where(gids == GROUP_BIAS, lr_b,
                            jnp.where(gids == GROUP_BNW, lr_bnw, lr_w))
        # where (not 0/1 scaling): a non-finite grad must not poison params on
        # accumulate-only steps
        new_p = jnp.where(do_apply, p - lr_flat * delta, p)
        new_mom = jnp.where(do_apply, buf, mom_buf)
        new_acc = jnp.where(do_apply, jnp.zeros_like(acc), acc)
        new_updates = state["updates"] + do_apply.astype(jnp.int32)

        # EMA ramp d = decay*(1-exp(-updates/2000)), params AND BN stats,
        # only on optimizer steps (yolov6/utils/ema.py:11-38, engine.py:386-390)
        d = ema_decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / 2000.0))
        ema_p, ema_s = state["ema"]["params"], state["ema"]["batch_stats"]
        new_ema_p = jnp.where(do_apply, ema_p * d + (1.0 - d) * new_p, ema_p)
        stats_flat = sf.flatten(new_stats)
        new_ema_s = jnp.where(do_apply, ema_s * d + (1.0 - d) * stats_flat,
                              ema_s)

        comps = dict(comps)
        new_wiou = comps.pop("wiou_mean",
                             state.get("wiou_mean", jnp.ones((), jnp.float32)))
        new_state = {"params": new_p, "batch_stats": new_stats,
                     "ema": {"params": new_ema_p, "batch_stats": new_ema_s},
                     "mom": new_mom, "grad_acc": new_acc,
                     "updates": new_updates,
                     "rng_step": state["rng_step"] + 1,
                     "wiou_mean": new_wiou}
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
