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
import numpy as np

from mafyolo_tpu.models import build_model
from mafyolo_tpu.utils.events import LOGGER


def init_quant_tree(graph, nc: int, folded_params: Dict, img_size: int = 64):
    """Zero-initialized amax tree matching the deploy graph."""
    calib = build_model(graph, nc=nc, deploy=True, quant=True, calibrate=True)
    variables = jax.jit(calib.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)), train=False)
    return variables["quant"]


def _iter_batches(batches, max_batches):
    n = 0
    for batch in batches:
        yield batch[0] if isinstance(batch, tuple) else batch
        n += 1
        if n >= max_batches:
            return


def amax_from_hist(hist, amax: float, method: str,
                   percentile: float = 99.99) -> float:
    """Reduce an |x| histogram over [0, amax] to a calibrated amax.

    TPU-native equivalent of pytorch_quantization's HistogramCalibrator
    reductions (compute_amax methods, dispatched from qat_utils.py:39-59):
    'percentile' picks the edge covering that mass fraction; 'mse' minimizes
    int8 reconstruction error; 'entropy' is the TensorRT KL-divergence sweep.
    """
    hist = np.asarray(hist, np.float64)
    nbins = hist.size
    edges = np.linspace(0.0, amax, nbins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    total = hist.sum()
    if total == 0 or amax == 0:
        return float(amax)
    if method == "percentile":
        cdf = np.cumsum(hist) / total
        idx = int(np.searchsorted(cdf, percentile / 100.0))
        return float(edges[min(idx + 1, nbins)])
    if method == "mse":
        best, best_err = amax, np.inf
        for i in range(nbins // 16, nbins + 1, max(1, nbins // 256)):
            cand = edges[i]
            scale = cand / 127.0
            q = np.clip(np.round(centers / scale), -128, 127) * scale
            err = float((hist * (centers - q) ** 2).sum())
            if err < best_err:
                best, best_err = cand, err
        return float(best)
    if method == "entropy":
        # TensorRT KL calibration: for each truncation point i, compare the
        # clamped reference distribution against its 128-level quantization
        nlevels = 128
        best, best_kl = amax, np.inf
        start = max(nlevels, nbins // 16)
        for i in range(start, nbins + 1, max(1, nbins // 256)):
            p = hist[:i].copy()
            p[-1] += hist[i:].sum()
            ref = p / p.sum()
            # quantize: merge i bins into nlevels groups, spread back uniformly
            # over the nonzero source bins
            idx = (np.arange(i) * nlevels // i)
            q = np.zeros(i)
            nz = p > 0
            sums = np.bincount(idx, weights=p, minlength=nlevels)
            cnts = np.bincount(idx[nz], minlength=nlevels)
            expand = np.where(cnts[idx] > 0, sums[idx] / np.maximum(cnts[idx], 1), 0)
            q[nz] = expand[nz]
            qs = q.sum()
            if qs == 0:
                continue
            q /= qs
            m = ref > 0
            kl = float((ref[m] * np.log(ref[m] / np.maximum(q[m], 1e-12))).sum())
            if kl < best_kl:
                best, best_kl = edges[i], kl
        return float(best)
    raise ValueError(f"unknown amax method {method!r}")


def ptq_calibrate(graph, nc: int, folded_params: Dict, batches: Iterable,
                  max_batches: int = 32, dtype=jnp.float32,
                  method: str = "max", percentile: float = 99.99,
                  num_bins: int = 2048,
                  skip_layers: Optional[Iterable[str]] = None) -> Dict:
    """Run activation calibration over `batches` of uint8 NHWC images -> amax tree.

    method='max' mirrors MaxCalibrator (qat_utils.py:12-59); 'percentile'/
    'mse'/'entropy' run a second histogram pass anchored at the pass-1 max,
    mirroring HistogramCalibrator + compute_amax(method=...). `batches` must be
    re-iterable for histogram methods (a loader, or a list). skip_layers
    disables quantization for matching layer paths (sensitive-layer skip,
    qat_utils.py:61-146,148-157).
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
    for imgs in _iter_batches(batches, max_batches):
        quant = step(quant, jnp.asarray(imgs))
        n += 1
    LOGGER.info(f"PTQ max pass done over {n} batches")

    if method != "max":
        from mafyolo_tpu.models import blocks as _B
        _B.CALIB_HIST_BINS = num_bins
        try:
            calib_h = build_model(graph, nc=nc, deploy=True, quant=True,
                                  calibrate=True, dtype=dtype)
            hq = init_quant_tree(graph, nc, folded_params, img_size=64)
            # graft the pass-1 amax values into the histogram tree
            hq = jax.tree_util.tree_map_with_path(
                lambda p, leaf: _lookup(quant, p, leaf), hq)

            @jax.jit
            def hstep(quant_tree, imgs_u8):
                x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
                _, mut = calib_h.apply(
                    {"params": folded_params["params"], "quant": quant_tree},
                    x, train=False, mutable=["quant"])
                return mut["quant"]

            m = 0
            for imgs in _iter_batches(batches, max_batches):
                hq = hstep(hq, jnp.asarray(imgs))
                m += 1
            if m == 0:
                raise ValueError("histogram calibration needs re-iterable "
                                 "batches (got an exhausted iterator)")
            LOGGER.info(f"PTQ histogram pass done over {m} batches "
                        f"(method={method})")
            quant = _reduce_hist_tree(jax.device_get(hq), method, percentile)
        finally:
            _B.CALIB_HIST_BINS = 0

    quant = jax.device_get(quant)
    if skip_layers:
        quant = skip_sensitive_layers(quant, skip_layers)
    return quant


def _lookup(tree, path, default):
    """Fetch the leaf at `path` from `tree`, else `default` (new hist leaves)."""
    node = tree
    for p in path:
        key = getattr(p, "key", p)
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def _reduce_hist_tree(hq: Dict, method: str, percentile: float) -> Dict:
    """{... act_amax, act_hist} -> {... act_amax} with histogram-reduced amax."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if "act_amax" in node and "act_hist" in node:
            amax = float(np.asarray(node["act_amax"]))
            new = amax_from_hist(node["act_hist"], amax, method, percentile)
            return {"act_amax": np.float32(new)}
        return {k: walk(v) for k, v in node.items()}
    return walk(hq)


def skip_sensitive_layers(quant_tree: Dict, names: Iterable[str]) -> Dict:
    """Disable quantization for layers whose path contains any of `names`
    (amax=0 passes activations through, models/blocks.fake_quant_sym).
    Mirrors skip_sensitive_layers / cfg.ptq.sensitive_layers_list
    (qat_utils.py:73-76,148-157)."""
    names = list(names)
    skipped = []

    def mk(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if any(n in key for n in names):
            skipped.append(key)
            return np.zeros_like(np.asarray(leaf))
        return leaf

    out = jax.tree_util.tree_map_with_path(mk, quant_tree)
    LOGGER.info(f"sensitive-layer skip: {len(skipped)} quant vars disabled")
    return out


def quant_layer_names(quant_tree: Dict) -> list:
    """Unique quantized-conv layer paths (amax parents), for sensitivity sweeps."""
    names = []
    for path, _ in jax.tree_util.tree_flatten_with_path(quant_tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key.endswith("/act_amax"):
            names.append(key[: -len("/act_amax")])
    return sorted(set(names))


def only_layer_quant(quant_tree: Dict, layer: str) -> Dict:
    """amax tree with quantization enabled ONLY for `layer` (zero elsewhere) --
    the per-layer step of the partial-quantization sensitivity sweep
    (tools/partial_quantization/sensitivity_analyse.py:27-51)."""
    def mk(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key.startswith(layer + "/"):
            return leaf
        return np.zeros_like(np.asarray(leaf))
    return jax.tree_util.tree_map_with_path(mk, quant_tree)


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


def int8_predict_fn(graph, nc: int, folded_params: Dict, quant_tree: Dict,
                    strides=(8, 16, 32), reg_max: int = 16,
                    conf_thres: float = 0.03, iou_thres: float = 0.65,
                    max_det: int = 300, dtype=jnp.bfloat16):
    """Jitted REAL-int8 forward (int8 x int8 -> int32 MXU convs; the TPU
    replacement for the reference's TensorRT int8 engine) + fused decode/NMS.

    Requires a fully-calibrated quant tree: sensitive-layer skipping is a
    fake-quant/mixed-precision concept; real-int8 deploy quantizes every conv.
    """
    for leaf in jax.tree.leaves(quant_tree):
        if float(np.asarray(leaf).min() if np.asarray(leaf).ndim else leaf) <= 0:
            raise ValueError("int8 deploy needs every act_amax > 0 "
                             "(run calibration without skip_layers)")
    from mafyolo_tpu.models import blocks as _B
    from mafyolo_tpu.ops.nms import fused_decode_nms

    model = build_model(graph, nc=nc, deploy=True, quant=True, dtype=dtype)
    variables = jax.device_put(
        {"params": folded_params["params"], "quant": quant_tree})

    def fwd(imgs_u8):
        x = imgs_u8[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
        outs = model.apply(variables, x, train=False)
        return fused_decode_nms(outs, strides=strides, reg_max=reg_max,
                                conf_thres=conf_thres,
                                iou_thres=iou_thres, max_det=max_det)

    predict = jax.jit(fwd)

    def predict_int8(imgs_u8):
        # jit traces lazily (once per input shape); arm the module flag around
        # every call so any trace sees the int8 path
        _B.INT8_INFER = True
        try:
            return predict(imgs_u8)
        finally:
            _B.INT8_INFER = False
    return predict_int8
