"""The legacy "office" build path: EfficientRep + RepPANNeck + effidehead.

The reference dispatches on config.model.build_type: 'yaml' interprets the
layer-graph yamls (the shipped MAF-YOLO path), anything else builds the
hardcoded YOLOv6 triple via build_network
(/root/reference/yolov6/models/yolo.py:166-172, 225-275 with
efficientrep.py:5-109, reppan.py:6-129, effidehead.py:137-239).

TPU-native design: rather than a second model executor, the fixed office
topology is EMITTED AS A GRAPH SPEC in the same zoo format the yaml path
uses, so GraphNet execution, re-param folding, deploy forms, checkpointing
and eval all apply unchanged. Channel/depth scaling (make_divisible(c*gw, 8),
max(round(n*gd), 1); yolo.py:235-236) happens here, and the produced dict
carries multiples of 1.0.
"""
from __future__ import annotations

import math
from typing import Dict


def make_divisible(x, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def office_graph(model_cfg: Dict, training_mode: str = "repvgg") -> Dict:
    """config.model section (EfficientRep/RepPANNeck style) -> zoo-format
    graph dict consumable by build_model."""
    bb = model_cfg["backbone"]
    nk = model_cfg["neck"]
    hd = model_cfg["head"]
    bb_type = bb.get("type", "EfficientRep")
    nk_type = nk.get("type", "RepPANNeck")
    if bb_type == "CSPBepBackbone" and nk_type == "CSPRepPANNeck":
        return _cspbep_graph(model_cfg, training_mode)
    if bb_type != "EfficientRep" or nk_type != "RepPANNeck":
        raise NotImplementedError(
            f"office path supports EfficientRep+RepPANNeck and "
            f"CSPBepBackbone+CSPRepPANNeck; got {bb_type}+{nk_type}")
    gd = float(model_cfg.get("depth_multiple", 1.0))
    gw = float(model_cfg.get("width_multiple", 1.0))
    reps = list(bb["num_repeats"]) + list(nk["num_repeats"])
    chs = list(bb["out_channels"]) + list(nk["out_channels"])
    nr = [max(round(i * gd), 1) if i > 1 else i for i in reps]
    ch = [make_divisible(i * gw, 8) for i in chs]
    reg_max = int(hd.get("reg_max", 16))

    backbone = [
        [-1, 1, "RepVGGBlock", [ch[0], 3, 2]],      # 0  stem
        [-1, 1, "RepVGGBlock", [ch[1], 3, 2]],      # 1  ERBlock_2.0
        [-1, nr[1], "RepBlock", [ch[1]]],           # 2  ERBlock_2.1
        [-1, 1, "RepVGGBlock", [ch[2], 3, 2]],      # 3  ERBlock_3.0
        [-1, nr[2], "RepBlock", [ch[2]]],           # 4  ERBlock_3.1 -> P3
        [-1, 1, "RepVGGBlock", [ch[3], 3, 2]],      # 5  ERBlock_4.0
        [-1, nr[3], "RepBlock", [ch[3]]],           # 6  ERBlock_4.1 -> P4
        [-1, 1, "RepVGGBlock", [ch[4], 3, 2]],      # 7  ERBlock_5.0
        [-1, nr[4], "RepBlock", [ch[4]]],           # 8  ERBlock_5.1
        [-1, 1, "SimSPPF", [ch[4], 5]],             # 9  ERBlock_5.2 -> P5
    ]
    neck = [
        [9, 1, "SimConv", [ch[5], 1, 1]],           # 10 reduce_layer0
        [-1, 1, "Transpose", [ch[5]]],              # 11 upsample0
        [[-1, 6], 1, "Concat", [1]],                # 12
        [-1, nr[5], "RepBlock", [ch[5]]],           # 13 Rep_p4
        [-1, 1, "SimConv", [ch[6], 1, 1]],          # 14 reduce_layer1
        [-1, 1, "Transpose", [ch[6]]],              # 15 upsample1
        [[-1, 4], 1, "Concat", [1]],                # 16
        [-1, nr[6], "RepBlock", [ch[6]]],           # 17 Rep_p3 -> pan_out2
        [-1, 1, "SimConv", [ch[7], 3, 2]],          # 18 downsample2
        [[-1, 14], 1, "Concat", [1]],               # 19
        [-1, nr[7], "RepBlock", [ch[8]]],           # 20 Rep_n3 -> pan_out1
        [-1, 1, "SimConv", [ch[9], 3, 2]],          # 21 downsample1
        [[-1, 10], 1, "Concat", [1]],               # 22
        [-1, nr[8], "RepBlock", [ch[10]]],          # 23 Rep_n4 -> pan_out0
    ]
    effidehead = [
        [17, 1, "Head_Effide", [reg_max]],          # 24
        [20, 1, "Head_Effide", [reg_max]],          # 25
        [23, 1, "Head_Effide", [reg_max]],          # 26
        [[24, 25, 26], 1, "Out", []],               # 27
    ]
    return dict(depth_multiple=1.0, width_multiple=1.0, backbone=backbone,
                neck=neck, effidehead=effidehead)


def _cspbep_graph(model_cfg: Dict, training_mode: str) -> Dict:
    """CSPBepBackbone + CSPRepPANNeck (the yolov6-m/l office family) as a
    graph spec (reference efficientrep.py:110-263, reppan.py:131-283).

    training_mode selects the basic block (get_block, common.py:2261-2267):
    'repvgg' -> RepVGGBlock (-m), 'conv_silu' -> ConvWrapper (-l). Downsample
    convs use the same block; the channel merge layer is SPPF for ConvWrapper,
    SimSPPF otherwise (efficientrep.py:225-227).
    """
    bb = model_cfg["backbone"]
    nk = model_cfg["neck"]
    hd = model_cfg["head"]
    gd = float(model_cfg.get("depth_multiple", 1.0))
    gw = float(model_cfg.get("width_multiple", 1.0))
    reps = list(bb["num_repeats"]) + list(nk["num_repeats"])
    chs = list(bb["out_channels"]) + list(nk["out_channels"])
    nr = [max(round(i * gd), 1) if i > 1 else i for i in reps]
    ch = [make_divisible(i * gw, 8) for i in chs]
    reg_max = int(hd.get("reg_max", 16))
    e_bb = float(bb.get("csp_e", 0.5))
    e_nk = float(nk.get("csp_e", 0.5))
    conv_silu = training_mode == "conv_silu"
    basic = "conv" if conv_silu else "repvgg"
    # downsampling block row: ConvWrapper k3/s2 vs RepVGGBlock k3/s2
    down = (lambda c: [-1, 1, "ConvWrapper", [c, 3, 2]]) if conv_silu \
        else (lambda c: [-1, 1, "RepVGGBlock", [c, 3, 2]])
    sppf = "SPPF" if conv_silu else "SimSPPF"

    backbone = [
        down(ch[0]),                                    # 0  stem
        down(ch[1]),                                    # 1  ERBlock_2.0
        [-1, nr[1], "BepC3", [ch[1], e_bb, basic]],     # 2  ERBlock_2.1
        down(ch[2]),                                    # 3  ERBlock_3.0
        [-1, nr[2], "BepC3", [ch[2], e_bb, basic]],     # 4  ERBlock_3.1 -> P3
        down(ch[3]),                                    # 5  ERBlock_4.0
        [-1, nr[3], "BepC3", [ch[3], e_bb, basic]],     # 6  ERBlock_4.1 -> P4
        down(ch[4]),                                    # 7  ERBlock_5.0
        [-1, nr[4], "BepC3", [ch[4], e_bb, basic]],     # 8  ERBlock_5.1
        [-1, 1, sppf, [ch[4], 5]],                      # 9  ERBlock_5.2 -> P5
    ]
    neck = [
        [9, 1, "SimConv", [ch[5], 1, 1]],               # 10 reduce_layer0
        [-1, 1, "Transpose", [ch[5]]],                  # 11 upsample0
        [[-1, 6], 1, "Concat", [1]],                    # 12
        [-1, nr[5], "BepC3", [ch[5], e_nk, basic]],     # 13 Rep_p4
        [-1, 1, "SimConv", [ch[6], 1, 1]],              # 14 reduce_layer1
        [-1, 1, "Transpose", [ch[6]]],                  # 15 upsample1
        [[-1, 4], 1, "Concat", [1]],                    # 16
        [-1, nr[6], "BepC3", [ch[6], e_nk, basic]],     # 17 Rep_p3 -> pan_out2
        [-1, 1, "SimConv", [ch[7], 3, 2]],              # 18 downsample2
        [[-1, 14], 1, "Concat", [1]],                   # 19
        [-1, nr[7], "BepC3", [ch[8], e_nk, basic]],     # 20 Rep_n3 -> pan_out1
        [-1, 1, "SimConv", [ch[9], 3, 2]],              # 21 downsample1
        [[-1, 10], 1, "Concat", [1]],                   # 22
        [-1, nr[8], "BepC3", [ch[10], e_nk, basic]],    # 23 Rep_n4 -> pan_out0
    ]
    effidehead = [
        [17, 1, "Head_Effide", [reg_max]],              # 24
        [20, 1, "Head_Effide", [reg_max]],              # 25
        [23, 1, "Head_Effide", [reg_max]],              # 26
        [[24, 25, 26], 1, "Out", []],                   # 27
    ]
    return dict(depth_multiple=1.0, width_multiple=1.0, backbone=backbone,
                neck=neck, effidehead=effidehead)


# torch state_dict prefixes per graph layer index, for the .pt bridge
# (utils/torch_bridge.state_dict_to_variables(prefixes=...)).
OFFICE_TORCH_PREFIXES = {
    0: "backbone.stem",
    1: "backbone.ERBlock_2.0", 2: "backbone.ERBlock_2.1",
    3: "backbone.ERBlock_3.0", 4: "backbone.ERBlock_3.1",
    5: "backbone.ERBlock_4.0", 6: "backbone.ERBlock_4.1",
    7: "backbone.ERBlock_5.0", 8: "backbone.ERBlock_5.1",
    9: "backbone.ERBlock_5.2",
    10: "neck.reduce_layer0", 11: "neck.upsample0", 13: "neck.Rep_p4",
    14: "neck.reduce_layer1", 15: "neck.upsample1", 17: "neck.Rep_p3",
    18: "neck.downsample2", 20: "neck.Rep_n3",
    21: "neck.downsample1", 23: "neck.Rep_n4",
    24: "detect:0", 25: "detect:1", 26: "detect:2",
}
