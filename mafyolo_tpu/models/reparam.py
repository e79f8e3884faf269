"""Re-parameterization as pure pytree->pytree folds.

The reference mutates nn.Modules in place at eval time (RepVGGBlock.switch_to_deploy
common.py:266, ReparamLargeKernelConv.merge_kernel common.py:2783,
UniRepLKNetBlock.reparameterize common.py:3085, plus conv+BN fusion in fuse_model,
yolov6/utils/torch_utils.py:50-115, applied by Evaler at yolov6/core/evaler.py:101-113).

Here the train-form variables dict {'params', 'batch_stats'} is mapped to the deploy-form
params dict of the same graph built with deploy=True, in one numpy pass. Kernels are HWIO
(flax convention); depthwise kernels are (k, k, 1, C).

Numerical identity train(eval-BN) == deploy holds to float32 rounding; tested in
tests/test_reparam.py, including against the torch reference implementation.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from mafyolo_tpu.models.blocks import DILATED_BRANCHES

BN_EPS = 1e-3


def _np(x):
    return np.asarray(x, dtype=np.float32)


def fuse_conv_bn(conv_p, bn_p, bn_s, eps: float = BN_EPS):
    """Fold BN(conv(x)) -> conv'(x): k' = k * g/s, b' = beta - mean * g/s."""
    k = _np(conv_p["kernel"])
    t = _np(bn_p["scale"]) / np.sqrt(_np(bn_s["var"]) + eps)
    return k * t, _np(bn_p["bias"]) - _np(bn_s["mean"]) * t


def _fold_cbn(p, s):
    """ConvBN subtree -> ConvAct subtree."""
    k, b = fuse_conv_bn(p["conv"], p["bn"], s["bn"])
    return {"conv": {"kernel": k, "bias": b}}


def _identity_kernel(cin: int, cout: int, groups: int, k: int) -> np.ndarray:
    """HWIO identity kernel for the RepVGG identity-BN branch (common.py:250-255)."""
    input_dim = cin // groups
    kernel = np.zeros((k, k, input_dim, cout), dtype=np.float32)
    c = k // 2
    for o in range(cout):
        kernel[c, c, o % input_dim, o] = 1.0
    return kernel


def _fuse_bn_only(bn_p, bn_s, cin: int, cout: int, groups: int, k: int):
    """Fold a bare BatchNorm branch into an equivalent kxk identity conv."""
    t = _np(bn_p["scale"]) / np.sqrt(_np(bn_s["var"]) + BN_EPS)
    kernel = _identity_kernel(cin, cout, groups, k) * t
    bias = _np(bn_p["bias"]) - _np(bn_s["mean"]) * t
    return kernel, bias


def _pad_kernel_center(kernel: np.ndarray, k: int) -> np.ndarray:
    """Zero-pad a smaller HWIO kernel into the center of a kxk one (common.py:232-236)."""
    kh = kernel.shape[0]
    p = (k - kh) // 2
    return np.pad(kernel, [(p, p), (p, p), (0, 0), (0, 0)])


def _dilated_to_dense(kernel: np.ndarray, r: int) -> np.ndarray:
    """Insert r-1 zeros between taps: the conv_transpose-with-identity trick
    (convert_dilated_to_nondilated, common.py:2926-2938), done by direct scatter."""
    if r == 1:
        return kernel
    kh, kw, i, o = kernel.shape
    dh, dw = r * (kh - 1) + 1, r * (kw - 1) + 1
    dense = np.zeros((dh, dw, i, o), dtype=kernel.dtype)
    dense[::r, ::r] = kernel
    return dense


def fold_repvgg(p, s, cin: int, cout: int, stride: int, groups: int = 1):
    """RepVGGBlock.get_equivalent_kernel_bias (common.py:226-264).

    A plain (RealVGG/repopt) block has only the dense branch; folding reduces
    to the standard conv+BN fuse."""
    k3, b3 = fuse_conv_bn(p["dense"]["conv"], p["dense"]["bn"], s["dense"]["bn"])
    if "pw" not in p:
        return {"fused": {"conv": {"kernel": k3, "bias": b3}}}
    k1, b1 = fuse_conv_bn(p["pw"]["conv"], p["pw"]["bn"], s["pw"]["bn"])
    k = k3 + _pad_kernel_center(k1, 3)
    b = b3 + b1
    if "idbn" in p:
        ki, bi = _fuse_bn_only(p["idbn"], s["idbn"], cin, cout, groups, 3)
        k = k + ki
        b = b + bi
    return {"fused": {"conv": {"kernel": k, "bias": b}}}


def fold_dilated_reparam(p, s, k: int):
    """DilatedReparamBlock.merge_dilated_branches (common.py:3033-3051)."""
    kern, bias = fuse_conv_bn(p["origin"]["conv"], p["origin"]["bn"], s["origin"]["bn"])
    for ks, r in DILATED_BRANCHES[k]:
        name = f"dil_k{ks}_r{r}"
        bk, bb = fuse_conv_bn(p[name]["conv"], p[name]["bn"], s[name]["bn"])
        kern = kern + _pad_kernel_center(_dilated_to_dense(bk, r), k)
        bias = bias + bb
    return kern, bias


def fold_unireplk(p, s, k: int):
    """UniRepLKNetBlock.reparameterize: DRB merge + trailing-BN absorb (common.py:3085-3100)."""
    kern, bias = fold_dilated_reparam(p["drb"], s["drb"], k)
    bn_p, bn_s = p["post_bn"], s["post_bn"]
    t = _np(bn_p["scale"]) / np.sqrt(_np(bn_s["var"]) + BN_EPS)
    kern = kern * t
    bias = _np(bn_p["bias"]) + (bias - _np(bn_s["mean"])) * t
    return {"fused": {"conv": {"kernel": kern, "bias": bias}}}


def fold_replk(p, s, k: int, small_k: int):
    """ReparamLargeKernelConv.merge_kernel (common.py:2748-2794)."""
    kern, bias = fuse_conv_bn(p["lk"]["conv"], p["lk"]["bn"], s["lk"]["bn"])
    sk, sb = fuse_conv_bn(p["small"]["conv"], p["small"]["bn"], s["small"]["bn"])
    kern = kern + _pad_kernel_center(sk, k)
    bias = bias + sb
    return {"fused": {"conv": {"kernel": kern, "bias": bias}}}


def _fold_dbu(p, s, kw):
    return {
        "expand": _fold_cbn(p["expand"], s["expand"]),
        "dw": fold_unireplk(p["dw"], s["dw"], kw["kersize"]),
        "project": _fold_cbn(p["project"], s["project"]),
    }


def _fold_block(kind: str, kw: Dict, p, s):
    if kind in ("Conv", "ConvWrapper", "SimConv"):
        return {"block": _fold_cbn(p["block"], s["block"])}
    if kind == "RepVGGBlock":
        return fold_repvgg(p, s, kw["cin"], kw["cout"], kw["stride"])
    if kind == "SPPF":
        return {"cv1": _fold_cbn(p["cv1"], s["cv1"]), "cv2": _fold_cbn(p["cv2"], s["cv2"])}
    if kind == "MPRep":
        return {
            "pool_proj": _fold_cbn(p["pool_proj"], s["pool_proj"]),
            "rep_down": fold_repvgg(p["rep_down"], s["rep_down"], kw["cin"],
                                    kw["cout"] // 2, stride=2),
        }
    if kind == "RepHDW":
        out = {"cv_in": _fold_cbn(p["cv_in"], s["cv_in"]),
               "cv_out": _fold_cbn(p["cv_out"], s["cv_out"])}
        dbu_kw = dict(kersize=kw["kersize"])
        for i in range(kw["depth"]):
            out[f"m{i}"] = _fold_dbu(p[f"m{i}"], s[f"m{i}"], dbu_kw)
        return out
    if kind == "Head_simota":
        out = {"stem": _fold_cbn(p["stem"], s["stem"])}
        for branch in ("cls_conv", "reg_conv"):
            out[branch] = _fold_cbn(p[branch], s[branch])
        for pred in ("cls_pred", "reg_pred", "obj_pred"):
            out[pred] = {"kernel": _np(p[pred]["kernel"]),
                         "bias": _np(p[pred]["bias"])}
        return out
    if kind == "RepBlock":
        out = {"conv1": fold_repvgg(p["conv1"], s["conv1"], kw["cin"],
                                    kw["cout"], stride=1)}
        for i in range(kw["n"] - 1):
            out[f"block{i}"] = fold_repvgg(p[f"block{i}"], s[f"block{i}"],
                                           kw["cout"], kw["cout"], stride=1)
        return out
    if kind == "BepC3":
        from .blocks import bepc3_chain_len
        c_ = int(kw["cout"] * kw["e"])

        def fold_bottlerep(bp, bs, cin):
            o = {}
            for cname, ci in (("conv1", cin), ("conv2", c_)):
                if kw["basic"] == "repvgg":
                    o[cname] = fold_repvgg(bp[cname], bs[cname], ci, c_,
                                           stride=1)
                else:   # ConvWrapper: plain conv-BN-SiLU, BN fold only
                    o[cname] = {"block": _fold_cbn(bp[cname]["block"],
                                                   bs[cname]["block"])}
            if "alpha" in bp:
                o["alpha"] = _np(bp["alpha"])
            return o

        out = {"cv1": _fold_cbn(p["cv1"], s["cv1"]),
               "cv2": _fold_cbn(p["cv2"], s["cv2"]),
               "cv3": _fold_cbn(p["cv3"], s["cv3"]),
               "m_conv1": fold_bottlerep(p["m_conv1"], s["m_conv1"], c_)}
        for i in range(bepc3_chain_len(kw["n"]) - 1):
            out[f"m_block{i}"] = fold_bottlerep(p[f"m_block{i}"],
                                                s[f"m_block{i}"], c_)
        return out
    if kind == "SimSPPF":
        return {"cv1": _fold_cbn(p["cv1"], s["cv1"]),
                "cv2": _fold_cbn(p["cv2"], s["cv2"])}
    if kind == "Transpose":
        return dict(p)       # plain biased ConvTranspose; nothing to fold
    if kind == "Head_Effide":
        out = {"stem": _fold_cbn(p["stem"], s["stem"])}
        for branch in ("cls", "reg"):
            out[f"{branch}_conv"] = _fold_cbn(p[f"{branch}_conv"],
                                              s[f"{branch}_conv"])
            pred = p[f"{branch}_pred"]
            out[f"{branch}_pred"] = {"kernel": _np(pred["kernel"]),
                                     "bias": _np(pred["bias"])}
        return out
    if kind == "Head_DepthUni":
        out = {"stem": _fold_cbn(p["stem"], s["stem"])}
        for branch in ("cls", "reg"):
            out[f"{branch}_dw"] = fold_unireplk(p[f"{branch}_dw"], s[f"{branch}_dw"],
                                                kw["kersize"])
            out[f"{branch}_proj"] = _fold_cbn(p[f"{branch}_proj"], s[f"{branch}_proj"])
            pred = p[f"{branch}_pred"]
            out[f"{branch}_pred"] = {"kernel": _np(pred["kernel"]),
                                     "bias": _np(pred["bias"])}
        return out
    raise NotImplementedError(f"no fold rule for {kind}")


def fold_stem_s2d(fused: Dict) -> Dict:
    """Remap a folded 3x3/s2 stem kernel (HWIO, cin=3) to the space-to-depth
    2x2/s1 form consumed by blocks.S2DStem.

    Derivation: with X[i,j,(py,px,c)] = x[2i+py, 2j+px, c] and tap index
    dy-1 = 2*siy + py (dy in 0..2 -> (siy,py) in {(-1,1),(0,0),(0,1)}), the s2
    conv becomes a 2x2 conv over X with padding (1,0):
      W2[siy+1, six+1, py*2c'+px*c'+ch, o] = W[2siy+py+1, 2six+px+1, ch, o].
    """
    k = _np(fused["conv"]["kernel"])          # [3,3,cin,cout]
    _, _, cin, cout = k.shape
    w2 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for siy in (-1, 0):
        for py in (0, 1):
            dy = 2 * siy + py + 1
            if dy < 0 or dy > 2:
                continue
            for six in (-1, 0):
                for px in (0, 1):
                    dx = 2 * six + px + 1
                    if dx < 0 or dx > 2:
                        continue
                    idx = (py * 2 + px) * cin
                    w2[siy + 1, six + 1, idx:idx + cin] = k[dy, dx]
    return {"kernel": w2, "bias": _np(fused["conv"]["bias"])}


def fold_variables(specs, variables, s2d_stem: bool = False) -> Dict:
    """Train-form {'params','batch_stats'} -> deploy-form {'params'} for the same graph."""
    net_p = variables["params"]["net"]
    net_s = variables["batch_stats"]["net"]
    out = {}
    for spec in specs:
        if spec.kind in ("Upsample", "Concat", "Out"):
            continue
        name = f"layer{spec.idx}"
        out[name] = _fold_block(spec.kind, spec.kw, net_p[name], net_s.get(name, {}))
        if s2d_stem and spec.idx == 0 and spec.kind == "RepVGGBlock":
            out[name] = fold_stem_s2d(out[name]["fused"])
    return {"params": {"net": out}}
