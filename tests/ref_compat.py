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

        def _no_nms(*a, **k):
            raise RuntimeError("torchvision stub: nms unavailable")

        ops.nms = _no_nms
        tv.ops = ops
        sys.modules.update({"torchvision": tv, "torchvision.ops": ops})

    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = thop


def build_reference_model(variant: str = "n", num_classes: int = 80):
    """Construct the reference torch Model (yaml path) on CPU."""
    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from mafyolo_tpu.utils.config import ConfigDict
    from yolov6.models.yolo import Model
    cfg = ConfigDict(dict(model=dict(
        build_type="yaml",
        yaml_file=f"{REFERENCE}/configs/yaml/MAF-YOLO-{variant}.yaml",
        head=dict(num_layers=3, use_dfl=True, strides=[8, 16, 32], anchors=1,
                  reg_max=16))))
    model = Model(cfg, channels=3, num_classes=num_classes)
    return model
