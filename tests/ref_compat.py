"""Import shims so the torch reference package loads on this box (CPU torch only).

The reference imports timm / pkg_resources / torchvision / thop at module scope but
the shipped MAF graphs never execute those code paths; minimal stubs let us build
the actual reference Model for numerical parity tests.
"""
import sys
import types

REFERENCE = "/root/reference"


def install_stubs():
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        class DropPath(nn.Identity):
            def __init__(self, *a, **k):
                super().__init__()

        tl.DropPath = DropPath
        tl.trunc_normal_ = lambda *a, **k: None
        tl.to_2tuple = lambda x: (x, x) if isinstance(x, int) else x
        timm.models = tm
        tm.layers = tl
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl})

    if "pkg_resources" not in sys.modules:
        pkg = types.ModuleType("pkg_resources")

        class _V:
            def __init__(self, s):
                self.s = s

            def __ge__(self, o):
                return True

            def __lt__(self, o):
                return False

        pkg.parse_version = _V
        sys.modules["pkg_resources"] = pkg

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.0-stub"
        ops = types.ModuleType("torchvision.ops")

        def _np_nms(boxes, scores, iou_thres):
            """Exact greedy NMS (torchvision.ops.nms semantics: keep indices in
            score order, suppress IoU > threshold). Lets the reference's
            non_max_suppression run end-to-end on this box."""
            import numpy as np
            import torch
            b = boxes.detach().cpu().numpy().astype(np.float64)
            s = scores.detach().cpu().numpy()
            order = np.argsort(-s, kind="stable")
            areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = []
            suppressed = np.zeros(len(order), bool)
            for oi, i in enumerate(order):
                if suppressed[oi]:
                    continue
                keep.append(int(i))
                rest = order[oi + 1:]
                lt = np.maximum(b[i, :2], b[rest, :2])
                rb = np.minimum(b[i, 2:], b[rest, 2:])
                inter = np.clip(rb - lt, 0, None).prod(-1)
                iou = inter / (areas[i] + areas[rest] - inter)
                suppressed[oi + 1:] |= iou > iou_thres
            return torch.tensor(keep, dtype=torch.long)

        ops.nms = _np_nms
        tv.ops = ops
        sys.modules.update({"torchvision": tv, "torchvision.ops": ops})

    if "albumentations" not in sys.modules:
        # module-scope import in yolov6/data/data_augment.py; only the
        # augment=True train path constructs transforms, which eval never does
        alb = types.ModuleType("albumentations")

        class _AnyOp:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("albumentations stub: transform invoked")

        def _alb_getattr(name):
            if name.startswith("__"):          # keep inspect/import machinery sane
                raise AttributeError(name)
            return _AnyOp

        alb.__getattr__ = _alb_getattr
        sys.modules["albumentations"] = alb

    if "pycocotools" not in sys.modules:
        # module-scope import in yolov6/core/evaler.py; only eval_model uses
        # it, which these tests never call (AP comes from our numpy evaluator)
        pc = types.ModuleType("pycocotools")
        coco_mod = types.ModuleType("pycocotools.coco")
        eval_mod = types.ModuleType("pycocotools.cocoeval")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools stub: not available")

        coco_mod.COCO = _Unavailable
        eval_mod.COCOeval = _Unavailable
        pc.coco = coco_mod
        pc.cocoeval = eval_mod
        sys.modules.update({"pycocotools": pc, "pycocotools.coco": coco_mod,
                            "pycocotools.cocoeval": eval_mod})

    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = thop


def build_reference_model(variant: str = "n", num_classes: int = 80):
    """Construct the reference torch Model (yaml path) on CPU.

    Seeds torch's default generator BEFORE construction: the reference
    initializes weights from the process-global RNG at module creation, so an
    unseeded build makes every score-thresholded downstream test (the AP
    parity matrix at protocol conf 0.03) nondeterministic across processes.
    """
    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    torch.manual_seed(0)
    from mafyolo_tpu.utils.config import ConfigDict
    from yolov6.models.yolo import Model
    cfg = ConfigDict(dict(model=dict(
        build_type="yaml",
        yaml_file=f"{REFERENCE}/configs/yaml/MAF-YOLO-{variant}.yaml",
        head=dict(num_layers=3, use_dfl=True, strides=[8, 16, 32], anchors=1,
                  reg_max=16))))
    model = Model(cfg, channels=3, num_classes=num_classes)
    return model


YOLOV6N_OFFICE = dict(
    build_type="office",
    depth_multiple=0.33,
    width_multiple=0.25,
    backbone=dict(type="EfficientRep",
                  num_repeats=[1, 6, 12, 18, 6],
                  out_channels=[64, 128, 256, 512, 1024]),
    neck=dict(type="RepPANNeck",
              num_repeats=[12, 12, 12, 12],
              out_channels=[256, 128, 128, 256, 256, 512]),
    head=dict(type="EffiDeHead", in_channels=[128, 256, 512],
              num_layers=3, begin_indices=24, anchors=1,
              out_indices=[17, 20, 23], strides=[8, 16, 32],
              use_dfl=True, reg_max=16),
)


# CSPBep office family (reference efficientrep.py:110, reppan.py:131 — the
# yolov6-m topology at test-sized multiples; csp_e=2/3 exercises e != 0.5)
YOLOV6M_OFFICE_CSP = dict(
    build_type="office",
    depth_multiple=0.33,
    width_multiple=0.25,
    backbone=dict(type="CSPBepBackbone",
                  num_repeats=[1, 6, 12, 18, 6],
                  out_channels=[64, 128, 256, 512, 768],
                  csp_e=float(2) / 3),
    neck=dict(type="CSPRepPANNeck",
              num_repeats=[12, 12, 12, 12],
              out_channels=[256, 128, 128, 256, 256, 512],
              csp_e=float(2) / 3),
    head=dict(type="EffiDeHead", in_channels=[128, 256, 512],
              num_layers=3, begin_indices=24, anchors=1,
              out_indices=[17, 20, 23], strides=[8, 16, 32],
              use_dfl=True, reg_max=16),
)


def build_reference_office_model(num_classes: int = 80, model_cfg=None,
                                 training_mode: str = "repvgg"):
    """Construct the reference torch Model via the OFFICE (non-yaml) path
    (yolo.py:166-172 build_network) with the yolov6n-shaped config.

    Seeded before construction for the same determinism reason as
    build_reference_model above."""
    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    torch.manual_seed(0)
    from mafyolo_tpu.utils.config import ConfigDict
    from yolov6.models.yolo import Model
    cfg = ConfigDict(dict(model=dict(model_cfg or YOLOV6N_OFFICE),
                          training_mode=training_mode))
    return Model(cfg, channels=3, num_classes=num_classes)
