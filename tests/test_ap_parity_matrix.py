"""AP-parity matrix across the published eval protocols, all model sizes.

Extends tests/test_ap_parity_reference.py (N, square, conf 0.005) to the
protocol surface the published numbers use (VERDICT round-2 #4):

  {N, S, M} x {plain, reproduce_640} x {square, rect}  (sampled matrix below)

where reproduce_640 = test_load_size 638 (N/S) / 630 (M), letterbox_return_int,
scale_exact, force_no_pad -- exactly /root/reference/configs/experiment/
eval_640_repro.py:3-29 -- and rect mirrors the reference Evaler's default val
loader (not_infer_on_rect=False, evaler.py:115-133). Every case drives the
reference's OWN Evaler end-to-end vs ours at the protocol conf 0.03 and
requires detection-level agreement plus |dAP| <= 0.01.

Models are random-weight with deterministic pred-head surgery (cls_pred weight
std 50 + bias logit(0.005)) so score tails cross the 0.03 threshold sparsely
(the zero-init reference heads otherwise emit a constant 0.01 everywhere and
the protocol conf would yield no detections at all).
"""
import math
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.conftest import REFERENCE, requires_reference
from tests.helpers import make_synth_dataset

torch = pytest.importorskip("torch")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

NC = 3
CONF, IOU = 0.03, 0.65           # the published protocol thresholds


def _surgery(tm, cls_std=50.0, reg_std=30.0, prior=0.005):
    """Deterministic pred-head randomization -> sparse detections at conf
    0.03 (~1.6k candidates/img at 320px, calibrated on this fixture)."""
    g = torch.Generator().manual_seed(42)
    b = math.log(prior / (1 - prior))
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "cls_pred" in name:
                if "weight" in name:
                    p.copy_(torch.randn(p.shape, generator=g) * cls_std)
                else:
                    p.fill_(b)
            if "reg_pred" in name and "weight" in name:
                p.copy_(torch.randn(p.shape, generator=g) * reg_std)


@pytest.fixture(scope="module")
def bridged_models():
    cache = {}

    def get(variant):
        if variant not in cache:
            from mafyolo_tpu.models import build_model
            from mafyolo_tpu.utils.torch_bridge import state_dict_to_variables
            from tests.ref_compat import build_reference_model
            tm = build_reference_model(variant, num_classes=NC)
            torch.manual_seed(0)
            tm.train()
            with torch.no_grad():
                for _ in range(2):
                    tm(torch.randn(2, 3, 64, 64))
            tm.eval().float()
            _surgery(tm)
            ours = build_model(f"maf-yolo-{variant}", nc=NC)
            cache[variant] = (tm, state_dict_to_variables(tm.state_dict(),
                                                          ours.specs))
        return cache[variant]

    return get


def _ref_predictions(tm, data_dict, img_size, repro_load, rect):
    from yolov6.core.evaler import Evaler as RefEvaler
    kw = dict(test_load_size=repro_load or img_size,
              letterbox_return_int=bool(repro_load),
              scale_exact=bool(repro_load),
              force_no_pad=bool(repro_load) or not rect,
              not_infer_on_rect=not rect)
    ev = RefEvaler(data_dict, batch_size=4, img_size=img_size, conf_thres=CONF,
                   iou_thres=IOU, device=torch.device("cpu"), half=False, **kw)
    loader = ev.init_data(None, "val")
    model = ev.init_model(tm, None, "train")
    preds, _, _ = ev.predict_model(model, loader, "val")
    return preds


def _our_predictions(variant, variables, data_dict, img_size, repro_load,
                     rect):
    from mafyolo_tpu.core.evaler import Evaler
    ev = Evaler(data_dict, img_size=img_size, batch_size=4, conf_thres=CONF,
                iou_thres=IOU, task="val", half=False,
                test_load_size=repro_load or img_size,
                letterbox_return_int=bool(repro_load),
                scale_exact=bool(repro_load),
                force_no_pad=bool(repro_load) or not rect,
                rect=rect, workers=2)
    loader = ev.init_data()
    ev.init_model(f"maf-yolo-{variant}", variables, NC, folded=False)
    return ev.predict_model(loader), ev.dataset.coco_gt()


def _norm(preds):
    return [dict(p, image_id=int(p["image_id"])) for p in preds]


# (variant, img_size, repro test_load_size or None, rect)
MATRIX = [
    ("n", 640, 638, False),     # the published N repro protocol, at 640
    ("n", 320, None, True),     # plain rect (the reference default val path)
    ("s", 320, 318, False),     # S repro code path (638 scaled to the size)
    ("s", 640, 638, False),     # the published S repro protocol, at 640
    ("m", 640, 630, False),     # the published M repro protocol (630!)
    ("m", 320, None, True),     # rect on the largest model
]


@requires_reference
@pytest.mark.parametrize("variant,img,repro,rect", MATRIX,
                         ids=[f"{v}-{i}-{'repro' + str(r) if r else 'plain'}-"
                              f"{'rect' if rc else 'square'}"
                              for v, i, r, rc in MATRIX])
def test_ap_parity_matrix(tmp_path, bridged_models, variant, img, repro, rect):
    from mafyolo_tpu.utils.coco_eval import COCOEvaluator
    from mafyolo_tpu.utils.events import load_yaml

    tm, variables = bridged_models(variant)
    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=12, img_size=320,
                                   nc=NC, seed=11, noise=25)
    data_dict = load_yaml(yaml_path)

    ref_preds = _norm(_ref_predictions(tm, data_dict, img, repro, rect))
    our_preds, gt = _our_predictions(variant, variables, data_dict, img,
                                     repro, rect)

    assert len(ref_preds) > 0, "reference produced no detections; vacuous"
    n_ref, n_ours = len(ref_preds), len(our_preds)
    assert abs(n_ref - n_ours) <= max(3, 0.02 * n_ref), (n_ref, n_ours)

    by_key = {}
    for p in ref_preds:
        by_key.setdefault((p["image_id"], p["category_id"]), []).append(p)
    matched = 0
    for q in our_preds:
        cands = by_key.get((q["image_id"], q["category_id"]), [])
        for p in cands:
            if (abs(p["score"] - q["score"]) < 5e-3
                    and np.allclose(p["bbox"], q["bbox"], atol=1.5)):
                matched += 1
                cands.remove(p)
                break
    assert matched >= 0.95 * min(n_ref, n_ours), \
        f"only {matched}/{min(n_ref, n_ours)} detections agree"

    ap_ref = COCOEvaluator(gt, ref_preds).summarize()["AP"]
    ap_ours = COCOEvaluator(gt, our_preds).summarize()["AP"]
    assert abs(ap_ref - ap_ours) <= 0.01, (ap_ref, ap_ours)
