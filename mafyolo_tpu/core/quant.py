"""INT8 post-training quantization + QAT support.

Parity target: the reference's pytorch_quantization flow (tools/qat/qat_utils.py:12-146,
engine.py:580-615): swap convs for quantized versions, run max-calibration over
training batches, evaluate, optionally finetune (QAT), export.

TPU-native design: quantization is a *mode of the deploy model* (build_model(...,
quant=True)) -- every folded conv fake-quantizes per-output-channel weights and
per-tensor activations with calibrated amax values held in a separate 'quant'
variable collection (the amax tree is the checkpointable artifact, like the
reference's calibrated .pt). Calibration mode (calibrate=True) runs the same graph
while accumulating running maxima into that collection. Fake-quant uses a
straight-through estimator, so the same machinery trains under QAT.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from mafyolo_tpu.models import build_model
from mafyolo_tpu.utils.events import LOGGER


def init_quant_tree(graph, nc: int, folded_params: Dict, img_size: int = 64):
    """Zero-initialized amax tree matching the deploy graph."""
    calib = build_model(graph, nc=nc, deploy=True, quant=True, calibrate=True)
    variables = jax.jit(calib.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)), train=False)
    return variables["quant"]


def ptq_calibrate(graph, nc: int, folded_params: Dict, batches: Iterable,
                  max_batches: int = 32, dtype=jnp.float32) -> Dict:
    """Run max-calibration over `batches` of uint8 NHWC images -> amax tree.

    Mirrors ptq_calibrate/collect_stats/compute_amax with method='max'
    (qat_utils.py:12-59).
    """
    calib = build_model(graph, nc=nc, deploy=True, quant=True, calibrate=True,
                        dtype=dtype)
    quant = init_quant_tree(graph, nc, folded_params)

    @jax.jit
    def step(quant_tree, imgs_u8):
        x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
        _, mut = calib.apply(
            {"params": folded_params["params"], "quant": quant_tree}, x,
            train=False, mutable=["quant"])
        return mut["quant"]

    n = 0
    for batch in batches:
        imgs = batch[0] if isinstance(batch, tuple) else batch
        quant = step(quant, jnp.asarray(imgs))
        n += 1
        if n >= max_batches:
            break
    LOGGER.info(f"PTQ calibration done over {n} batches")
    return jax.device_get(quant)


def qat_finetune(graph, nc: int, folded_params: Dict, quant_tree: Dict,
                 loader, *, img_size: int, epochs: int = 3, lr: float = 1e-4,
                 momentum: float = 0.9, iou_type: str = "giou",
                 dtype=jnp.float32) -> Dict:
    """Quantization-aware finetuning of the folded model (reference QAT analog:
    engine.quant_setup + normal train loop, engine.py:600-615).

    The folded deploy graph (no BN) runs with fake-quant convs; the straight-
    through estimator carries gradients through the int8 grid. Plain SGD with
    momentum on all params; the TAL detection loss supervises.
    """
    from mafyolo_tpu.models.losses import detection_loss

    model = build_model(graph, nc=nc, deploy=True, quant=True, dtype=dtype)
    params = jax.device_put(folded_params["params"])
    mom = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(params, mom, imgs_u8, targets):
        x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)

        def loss_fn(p):
            outs = model.apply({"params": p, "quant": quant_tree}, x, train=False)
            total, _ = detection_loss(outs, targets, use_atss=False,
                                      num_classes=nc, img_size=img_size,
                                      iou_type=iou_type)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_mom = jax.tree.map(lambda m, g: momentum * m + g, mom, grads)
        new_params = jax.tree.map(lambda p, m, g: p - lr * (g + momentum * m),
                                  params, new_mom, grads)
        return new_params, new_mom, loss

    for epoch in range(epochs):
        loader.set_epoch(epoch)
        for imgs, targets, _ in loader:
            params, mom, loss = step(params, mom, jnp.asarray(imgs),
                                     jnp.asarray(targets))
        LOGGER.info(f"QAT epoch {epoch}: loss {float(loss):.4f}")
    return {"params": jax.device_get(params)}


def quantized_predict_fn(graph, nc: int, folded_params: Dict, quant_tree: Dict,
                         strides=(8, 16, 32), reg_max: int = 16,
                         conf_thres: float = 0.03, iou_thres: float = 0.65,
                         max_det: int = 300, dtype=jnp.float32):
    """Jitted int8(simulated) forward + decode + NMS."""
    from mafyolo_tpu.models.detect import decode_eval
    from mafyolo_tpu.ops.nms import batched_nms

    model = build_model(graph, nc=nc, deploy=True, quant=True, dtype=dtype)
    variables = {"params": folded_params["params"], "quant": quant_tree}

    @jax.jit
    def predict(imgs_u8):
        x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
        outs = model.apply(variables, x, train=False)
        pred = decode_eval(outs, strides=strides, reg_max=reg_max)
        return batched_nms(pred, conf_thres=conf_thres, iou_thres=iou_thres,
                           max_det=max_det)

    return predict
