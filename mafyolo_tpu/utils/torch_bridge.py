"""Bridge released PyTorch MAF-YOLO checkpoints onto our flax param pytree.

The reference ships MAFYOLO{n,s,m}.pt whose 'model'/'ema' entries are pickled
nn.Modules (yolov6/utils/checkpoint.py:83-93). This module maps a torch state_dict
(train-form, yaml-built graph: keys 'backbone.{i}.<module path>') onto our
{'params','batch_stats'} tree, converting conv kernels OIHW -> HWIO.

Name correspondence per block (ours <- torch):
  RepVGGBlock:         dense <- rbr_dense, pw <- rbr_1x1, idbn <- rbr_identity
  Conv/ConvWrapper:    block.{conv,bn} <- block.{conv,bn} (ConvWrapper) or
                       {conv,bn} at the Conv's own level
  MPRep:               pool_proj <- conv1, rep_down <- conv2
  SPPF:                cv1, cv2 <- cv1, cv2
  RepHDW:              cv_in <- conv1, m{i} <- m.{i}, cv_out <- conv2
  DepthBottleneckUni:  expand <- conv1, dw <- conv2, project <- one_conv
  UniRepLKNetBlock:    drb <- dwconv, post_bn <- norm
  DilatedReparamBlock: origin.{conv,bn} <- lk_origin/origin_bn,
                       dil_k{k}_r{r}.{conv,bn} <- dil_conv_k{k}_{r}/dil_bn_k{k}_{r}
  Head_DepthUni:       stem<-stem, cls_dw<-cls_conv, cls_proj<-cls_conv_s,
                       cls_pred<-cls_pred, reg_dw<-reg_conv, reg_proj<-reg_conv_s,
                       reg_pred<-reg_pred
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO (works for grouped/depthwise too)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0)))


def _take_convbn(sd: Dict, prefix: str):
    """torch Conv-module or conv_bn cell at `prefix` -> (params, stats) subtrees."""
    params = {"conv": {"kernel": _conv_kernel(sd[f"{prefix}.conv.weight"])},
              "bn": {"scale": np.asarray(sd[f"{prefix}.bn.weight"], np.float32),
                     "bias": np.asarray(sd[f"{prefix}.bn.bias"], np.float32)}}
    stats = {"bn": {"mean": np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32),
                    "var": np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)}}
    return params, stats


def _take_bn(sd: Dict, prefix: str):
    p = {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
         "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    s = {"mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}
    return p, s


def _take_conv_raw(sd: Dict, prefix: str, bias: bool):
    p = {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}
    if bias:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return p


def _repvgg(sd, pfx, has_identity: bool):
    p, s = {}, {}
    p["dense"], s["dense"] = _take_convbn(sd, f"{pfx}.rbr_dense")
    p["pw"], s["pw"] = _take_convbn(sd, f"{pfx}.rbr_1x1")
    if has_identity and f"{pfx}.rbr_identity.weight" in sd:
        bp, bs = _take_bn(sd, f"{pfx}.rbr_identity")
        p["idbn"], s["idbn"] = bp, bs
    return p, s


def _drb(sd, pfx, k: int):
    from mafyolo_tpu.models.blocks import DILATED_BRANCHES
    p, s = {}, {}
    p["origin"] = {"conv": {"kernel": _conv_kernel(sd[f"{pfx}.lk_origin.weight"])}}
    bp, bs = _take_bn(sd, f"{pfx}.origin_bn")
    p["origin"]["bn"] = bp
    s["origin"] = {"bn": bs}
    for ks, r in DILATED_BRANCHES[k]:
        ours = f"dil_k{ks}_r{r}"
        p[ours] = {"conv": {"kernel": _conv_kernel(
            sd[f"{pfx}.dil_conv_k{ks}_{r}.weight"])}}
        bp, bs = _take_bn(sd, f"{pfx}.dil_bn_k{ks}_{r}")
        p[ours]["bn"] = bp
        s[ours] = {"bn": bs}
    return p, s


def _unireplk(sd, pfx, k: int):
    p, s = {}, {}
    p["drb"], s["drb"] = _drb(sd, f"{pfx}.dwconv", k)
    bp, bs = _take_bn(sd, f"{pfx}.norm")
    p["post_bn"], s["post_bn"] = bp, bs
    return p, s


def _dbu(sd, pfx, kersize: int):
    p, s = {}, {}
    p["expand"], s["expand"] = _take_convbn(sd, f"{pfx}.conv1")
    p["dw"], s["dw"] = _unireplk(sd, f"{pfx}.conv2", kersize)
    p["project"], s["project"] = _take_convbn(sd, f"{pfx}.one_conv")
    return p, s


def convert_layer(sd: Dict, spec, torch_prefix: str) -> Tuple[Dict, Dict]:
    """One graph layer: torch state_dict subtree -> (params, batch_stats)."""
    kind, kw = spec.kind, spec.kw
    if kind in ("Conv", "SimConv"):
        p, s = _take_convbn(sd, f"{torch_prefix}")
        return {"block": p}, {"block": s}
    if kind == "ConvWrapper":
        p, s = _take_convbn(sd, f"{torch_prefix}.block")
        return {"block": p}, {"block": s}
    if kind == "RepVGGBlock":
        return _repvgg(sd, torch_prefix,
                       kw["cin"] == kw["cout"] and kw["stride"] == 1)
    if kind == "SPPF":
        p1, s1 = _take_convbn(sd, f"{torch_prefix}.cv1")
        p2, s2 = _take_convbn(sd, f"{torch_prefix}.cv2")
        return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}
    if kind == "MPRep":
        p1, s1 = _take_convbn(sd, f"{torch_prefix}.conv1")
        p2, s2 = _repvgg(sd, f"{torch_prefix}.conv2", False)
        return {"pool_proj": p1, "rep_down": p2}, {"pool_proj": s1, "rep_down": s2}
    if kind == "RepHDW":
        p = {}
        s = {}
        p["cv_in"], s["cv_in"] = _take_convbn(sd, f"{torch_prefix}.conv1")
        p["cv_out"], s["cv_out"] = _take_convbn(sd, f"{torch_prefix}.conv2")
        for i in range(kw["depth"]):
            p[f"m{i}"], s[f"m{i}"] = _dbu(sd, f"{torch_prefix}.m.{i}", kw["kersize"])
        return p, s
    if kind == "RepBlock":
        p, s = {}, {}
        p["conv1"], s["conv1"] = _repvgg(
            sd, f"{torch_prefix}.conv1",
            kw["cin"] == kw["cout"])
        for i in range(kw["n"] - 1):
            p[f"block{i}"], s[f"block{i}"] = _repvgg(
                sd, f"{torch_prefix}.block.{i}", True)
        return p, s
    if kind == "BepC3":
        from mafyolo_tpu.models.blocks import bepc3_chain_len

        def _bottlerep(pfx):
            bp, bs = {}, {}
            for cname in ("conv1", "conv2"):
                if kw["basic"] == "repvgg":
                    bp[cname], bs[cname] = _repvgg(sd, f"{pfx}.{cname}", True)
                else:   # ConvWrapper basic block
                    cp, cs = _take_convbn(sd, f"{pfx}.{cname}.block")
                    bp[cname], bs[cname] = {"block": cp}, {"block": cs}
            if f"{pfx}.alpha" in sd:   # BottleRep weight=True (common.py:518)
                bp["alpha"] = np.asarray(sd[f"{pfx}.alpha"], np.float32)
            return bp, bs

        p, s = {}, {}
        for c in ("cv1", "cv2", "cv3"):
            p[c], s[c] = _take_convbn(sd, f"{torch_prefix}.{c}")
        p["m_conv1"], s["m_conv1"] = _bottlerep(f"{torch_prefix}.m.conv1")
        for i in range(bepc3_chain_len(kw["n"]) - 1):
            p[f"m_block{i}"], s[f"m_block{i}"] = _bottlerep(
                f"{torch_prefix}.m.block.{i}")
        return p, s
    if kind == "SimSPPF":
        p1, s1 = _take_convbn(sd, f"{torch_prefix}.cv1")
        p2, s2 = _take_convbn(sd, f"{torch_prefix}.cv2")
        return {"cv1": p1, "cv2": p2}, {"cv1": s1, "cv2": s2}
    if kind == "Transpose":
        # torch ConvTranspose2d weight [I, O, kH, kW] -> ours [kH, kW, I, O]
        w = sd[f"{torch_prefix}.upsample_transpose.weight"]
        b = sd[f"{torch_prefix}.upsample_transpose.bias"]
        return {"kernel": np.transpose(w, (2, 3, 0, 1)), "bias": b}, {}
    if kind == "Head_Effide":
        # torch_prefix "detect:{j}": the reference stores head layers in
        # per-role ModuleLists indexed by level (effidehead.py:38-51)
        det, j = torch_prefix.split(":")
        p, s = {}, {}
        p["stem"], s["stem"] = _take_convbn(sd, f"{det}.stems.{j}")
        p["cls_conv"], s["cls_conv"] = _take_convbn(sd, f"{det}.cls_convs.{j}")
        p["reg_conv"], s["reg_conv"] = _take_convbn(sd, f"{det}.reg_convs.{j}")
        p["cls_pred"] = _take_conv_raw(sd, f"{det}.cls_preds.{j}", bias=True)
        p["reg_pred"] = _take_conv_raw(sd, f"{det}.reg_preds.{j}", bias=True)
        return p, s
    if kind == "Head_DepthUni":
        p, s = {}, {}
        p["stem"], s["stem"] = _take_convbn(sd, f"{torch_prefix}.stem")
        p["cls_dw"], s["cls_dw"] = _unireplk(sd, f"{torch_prefix}.cls_conv",
                                             kw["kersize"])
        p["cls_proj"], s["cls_proj"] = _take_convbn(sd, f"{torch_prefix}.cls_conv_s")
        p["cls_pred"] = _take_conv_raw(sd, f"{torch_prefix}.cls_pred", bias=True)
        p["reg_dw"], s["reg_dw"] = _unireplk(sd, f"{torch_prefix}.reg_conv",
                                             kw["kersize"])
        p["reg_proj"], s["reg_proj"] = _take_convbn(sd, f"{torch_prefix}.reg_conv_s")
        p["reg_pred"] = _take_conv_raw(sd, f"{torch_prefix}.reg_pred", bias=True)
        return p, s
    raise NotImplementedError(kind)


def state_dict_to_variables(sd: Dict, specs, prefixes: Dict = None) -> Dict:
    """Full torch state_dict -> {'params','batch_stats'}.

    Default prefixes are the yaml path's 'backbone.{i}'; pass
    models.office.OFFICE_TORCH_PREFIXES for office-path checkpoints."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params, stats = {}, {}
    for spec in specs:
        if spec.kind in ("Upsample", "Concat", "Out"):
            continue
        name = f"layer{spec.idx}"
        pfx = prefixes[spec.idx] if prefixes else f"backbone.{spec.idx}"
        p, s = convert_layer(sd, spec, pfx)
        params[name] = p
        if s:
            stats[name] = s
    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference .pt checkpoint into our checkpoint dict format.

    Requires torch; unpickling full-module checkpoints additionally requires the
    reference package on sys.path (the released ckpts store nn.Modules).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model")
    sd = model.float().state_dict() if hasattr(model, "state_dict") else model
    # infer variant from head stem width (layer31 stem out channels)
    key = "backbone.31.stem.conv.weight"
    width = sd[key].shape[0] if key in sd else 128
    graph = {128: "maf-yolo-n", 192: "maf-yolo-s", 256: "maf-yolo-m"}.get(
        int(width), "maf-yolo-n")
    from mafyolo_tpu.models import build_model
    nc = int(sd["backbone.31.cls_pred.weight"].shape[0])
    m = build_model(graph, nc=nc)
    variables = state_dict_to_variables(sd, m.specs)
    return {"model": variables, "ema": None, "opt": None, "updates": 0,
            "epoch": -1, "meta": {"graph": graph, "nc": nc}}
