"""Graph-spec parser and graph-executing model.

Interprets [from, repeats, module, args] rows with the same argument conventions as the
reference parser (yolov6/models/yolo.py:15-120): width_multiple scales RepVGGBlock /
SPPF / Conv channels with make_divisible(.,4), MPRep / Head_DepthUni with
make_divisible(.,8); RepHDW and ConvWrapper channels are taken verbatim; the repeat
count of a RepHDW row becomes its chain depth.

The executor is a single flax module that walks the topologically-ordered layer list
keeping a save-list of intermediate outputs (multi-input rows gather from it), exactly
the dataflow of the reference's Model.forward (yolo.py:186-201) -- but traced once under
jit into a static XLA graph, so there is no per-layer Python dispatch at run time.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mafyolo_tpu.models import blocks as B
from mafyolo_tpu.models.zoo import MODEL_ZOO


def make_divisible(x: float, divisor: int) -> int:
    """Round channel count up to a multiple of divisor (yolo.py:220-222)."""
    return int(math.ceil(x / divisor) * divisor)


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    idx: int
    frm: Tuple[int, ...]      # absolute source layer indices; (-1,) means previous
    kind: str
    kwargs: Tuple[Tuple[str, Any], ...]   # hashable kwargs for the block constructor
    cout: int

    @property
    def kw(self) -> Dict[str, Any]:
        return dict(self.kwargs)


def _norm_kind(m: str) -> str:
    m = m.strip()
    return {"nn.Upsample": "Upsample"}.get(m, m)


def parse_graph(graph: dict, nc: int, ch_in: int = 3):
    """Parse a model-graph dict -> (layer specs, save set, head indices).

    Returns:
      specs: tuple[LayerSpec], one per row of backbone+neck+effidehead.
      save: frozenset of layer indices whose outputs later rows consume.
      out_frm: indices collected by the trailing Out row (the per-level head outputs).
    """
    gd, gw = graph["depth_multiple"], graph["width_multiple"]
    rows = list(graph["backbone"]) + list(graph["neck"]) + list(graph["effidehead"])
    ch: list = []          # ch[j] = out channels of layer j
    specs = []
    save = set()
    out_frm: Tuple[int, ...] = ()

    def cin_of(f: int, i: int) -> int:
        return ch_in if i == 0 else ch[f]

    for i, (f, n, m, args) in enumerate(rows):
        kind = _norm_kind(m)
        n = max(round(n * gd), 1) if n > 1 else n
        frm = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        kw: Dict[str, Any] = {}

        if kind == "RepVGGBlock":
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 4)
            kw = dict(cin=c1, cout=c2, stride=args[2] if len(args) > 2 else 1)
        elif kind in ("Conv", "SimConv"):
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 4)
            kw = dict(cout=c2, k=args[1] if len(args) > 1 else 1,
                      stride=args[2] if len(args) > 2 else 1)
        elif kind == "SPPF":
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 4)
            kw = dict(cin=c1, cout=c2, k=args[1] if len(args) > 1 else 5)
        elif kind == "RepHDW":
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cin=c1, cout=c2, depth=n, shortcut=bool(args[1]),
                      expansion=float(args[2]), kersize=int(args[3]),
                      depth_expansion=float(args[4]) if len(args) > 4 else 1.0)
            n = 1
        elif kind == "MPRep":
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 8)
            kw = dict(cin=c1, cout=c2)
        elif kind == "ConvWrapper":
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cout=c2, k=args[1] if len(args) > 1 else 3,
                      stride=args[2] if len(args) > 2 else 1)
        elif kind == "Upsample":
            c2 = cin_of(frm[0], i)
        elif kind == "Concat":
            c2 = sum(ch[x] for x in frm)
        elif kind == "Head_DepthUni":
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 8)
            kw = dict(cin=c1, cout=c2, reg_max=int(args[1]), kersize=int(args[2]), nc=nc)
        elif kind == "Head_simota":
            c1 = cin_of(frm[0], i)
            c2 = make_divisible(args[0] * gw, 8)
            kw = dict(cin=c1, cout=c2,
                      reg_max=int(args[1]) if len(args) > 1 else 0, nc=nc)
        elif kind == "RepBlock":
            # office-path stage block (common.py:374-401); office graphs are
            # emitted pre-scaled (models/office.py), channels verbatim
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cin=c1, cout=c2, n=n)
            n = 1
        elif kind == "BepC3":
            # CSPBep office-path stage block (common.py:560-582); office
            # graphs are emitted pre-scaled, channels verbatim
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cin=c1, cout=c2, n=n,
                      e=float(args[1]) if len(args) > 1 else 0.5,
                      basic=str(args[2]) if len(args) > 2 else "repvgg")
            n = 1
        elif kind == "SimSPPF":
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cin=c1, cout=c2, k=args[1] if len(args) > 1 else 5)
        elif kind == "Transpose":
            c1 = cin_of(frm[0], i)
            c2 = int(args[0])
            kw = dict(cin=c1, cout=c2)
        elif kind == "Head_Effide":
            c1 = cin_of(frm[0], i)
            c2 = c1
            kw = dict(cin=c1, reg_max=int(args[0]), nc=nc)
        elif kind == "Out":
            out_frm = tuple(x % i for x in frm)
            c2 = ch[-1]
        else:
            raise NotImplementedError(f"graph module {kind!r} not supported")

        if n > 1:
            raise NotImplementedError(f"repeats>1 for {kind} rows is not used by MAF graphs")

        specs.append(LayerSpec(idx=i, frm=frm, kind=kind,
                               kwargs=tuple(sorted(kw.items())), cout=int(c2)))
        save.update(x % i for x in frm if x != -1)
        ch.append(int(c2))

    return tuple(specs), frozenset(save), out_frm


def graph_from_yaml(path: str) -> dict:
    """Accept reference-format yaml graphs (configs/yaml/MAF-YOLO-*.yaml)."""
    import yaml
    with open(path, encoding="ascii", errors="ignore") as fh:
        return yaml.safe_load(fh)


_BLOCK_CTORS = {
    "RepVGGBlock": B.RepVGGBlock,
    "RepHDW": B.RepHDW,
    "MPRep": B.MPRep,
    "SPPF": B.SPPF,
    "Conv": B.Conv,
    "SimConv": B.SimConv,
    "ConvWrapper": B.ConvWrapper,
    "Head_DepthUni": B.Head_DepthUni,
    "Head_simota": B.Head_Simota,
    # legacy office path (models/office.py)
    "RepBlock": B.RepBlock,
    "BepC3": B.BepC3,
    "SimSPPF": B.SimSPPF,
    "Transpose": B.TransposeUp,
    "Head_Effide": B.Head_Effide,
}


def _concat_fusion_sets(specs, save):
    """Static analysis for the deploy-mode concat/upsample elimination.

    Returns (fused_concats, lazy_ups):
      fused_concats: Concat rows whose ONLY consumer is the immediately
        following RepHDW (whose first op is a 1x1 ConvAct) -- the concat is
        passed through as a tuple and the conv splits along Cin, so the
        concatenated buffer never hits HBM.
      lazy_ups: Upsample rows ALL of whose consumers are fused concats --
        the nearest-2x repeat commutes past the consuming 1x1 dots
        (LazyUp2x), so the upsampled buffer never materializes either and
        the dots run at quarter resolution.
    """
    consumers = {}
    by_idx = {s.idx: s for s in specs}
    for s in specs:
        for f in s.frm:
            j = s.idx + f if f < 0 else f
            consumers.setdefault(j, []).append(s.idx)
    fused = set()
    for s in specs:
        if s.kind != "Concat" or s.idx in save:
            continue
        nxt = by_idx.get(s.idx + 1)
        if (consumers.get(s.idx) == [s.idx + 1] and nxt is not None
                and nxt.kind == "RepHDW" and nxt.frm == (-1,)):
            fused.add(s.idx)
    lazy = set()
    for s in specs:
        if s.kind == "Upsample" and consumers.get(s.idx) and all(
                c in fused for c in consumers[s.idx]):
            lazy.add(s.idx)
    return frozenset(fused), frozenset(lazy)


class GraphNet(nn.Module):
    """Executes a parsed layer graph; returns what the trailing Out row collects."""
    specs: Tuple[LayerSpec, ...]
    save: frozenset
    out_frm: Tuple[int, ...]
    deploy: bool = False
    plain_rep: bool = False   # training_mode=='repopt': RealVGG-style blocks
    quant: bool = False
    calibrate: bool = False
    s2d_stem: bool = False
    skip_stem: bool = False   # caller runs layer0 externally (Pallas stem
                              # kernel, ops/stem_pallas.py); input IS layer0's
                              # output
    skip_until: int = -1      # caller runs layers 0..skip_until externally
                              # (fused Pallas front-end, ops/frontend_pallas
                              # .py); input IS layer skip_until's output
    remat: bool = False
    remat_policy: str = "full"  # "full" | "convs" (save conv/dot outputs,
                                # recompute only elementwise/BN)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip_until = max(self.skip_until, 0 if self.skip_stem else -1)
        fuse = (self.deploy and not self.quant and os.environ.get(
            "MAFYOLO_FUSE_CONCAT", "1") == "1")
        fused_cats, lazy_ups = (_concat_fusion_sets(self.specs, self.save)
                                if fuse else (frozenset(), frozenset()))
        y: Dict[int, Any] = {}
        for spec in self.specs:
            if spec.kind == "Out":
                return [y[j] for j in self.out_frm]
            if spec.idx <= skip_until:
                # x IS layer skip_until's output; earlier skipped layers'
                # outputs do not exist (callers check they are not in save)
                if spec.idx == skip_until and spec.idx in self.save:
                    y[spec.idx] = x
                continue
            if spec.frm != (-1,):
                inp = [x if j == -1 else y[j if j >= 0 else spec.idx + j]
                       for j in spec.frm]
                if len(inp) == 1:
                    inp = inp[0]
            else:
                inp = x
            if spec.kind == "Upsample":
                if spec.idx in lazy_ups:
                    x = B.LazyUp2x(inp)   # paramless; consumers commute it
                else:
                    x = B.Upsample2x(dtype=self.dtype, quant=self.quant,
                                     calibrate=self.calibrate,
                                     name=f"layer{spec.idx}")(inp, train)
            elif spec.kind == "Concat":
                if spec.idx in fused_cats:
                    x = tuple(inp)        # split-conv consumer, no concat
                else:
                    x = B.Concat(dtype=self.dtype, name=f"layer{spec.idx}")(inp, train)
            elif (self.s2d_stem and spec.idx == 0
                  and spec.kind == "RepVGGBlock"):
                x = B.S2DStem(cout=spec.kw["cout"], dtype=self.dtype,
                              name=f"layer{spec.idx}")(inp, train)
            else:
                ctor = _BLOCK_CTORS[spec.kind]
                extra = {}
                if self.plain_rep and spec.kind in ("RepVGGBlock", "MPRep"):
                    extra["plain"] = True
                if self.remat:
                    # per-block rematerialization: keeps each block's backward a
                    # self-contained unit (bounds compiled-code size AND live
                    # activation memory; jax.checkpoint over the whole model
                    # does neither). policy "convs" keeps the per-block
                    # structure (code size stays bounded) but saves every
                    # conv/dot output, so the backward recomputes only the
                    # cheap elementwise/BN tail of each block.
                    kw_r = {}
                    if self.remat_policy == "convs":
                        kw_r["policy"] = _save_convs_policy
                    ctor = nn.remat(ctor, static_argnums=(2,), **kw_r)
                x = ctor(deploy=self.deploy, quant=self.quant,
                         calibrate=self.calibrate, dtype=self.dtype,
                         name=f"layer{spec.idx}", **extra, **spec.kw)(inp, train)
            if spec.idx in self.save:
                y[spec.idx] = x
        raise ValueError("graph has no Out row")


class MAFYolo(nn.Module):
    """Full detector: graph (backbone+MAFPN+heads). Output = per-level (feat, cls, reg).

    cls is sigmoid class scores [B,H,W,nc]; reg is the raw DFL distribution
    [B,H,W,4*(reg_max+1)]. Training flattening and eval decode live in
    mafyolo_tpu/models/detect.py (mirrors Detect_yaml, yolo.py:301-396).
    """
    specs: Tuple[LayerSpec, ...]
    save: frozenset
    out_frm: Tuple[int, ...]
    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    deploy: bool = False
    plain_rep: bool = False
    quant: bool = False
    calibrate: bool = False
    s2d_stem: bool = False
    skip_stem: bool = False
    skip_until: int = -1
    remat: bool = False
    remat_policy: str = "full"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return GraphNet(self.specs, self.save, self.out_frm, deploy=self.deploy,
                        plain_rep=self.plain_rep,
                        quant=self.quant, calibrate=self.calibrate,
                        s2d_stem=self.s2d_stem, skip_stem=self.skip_stem,
                        skip_until=self.skip_until,
                        remat=self.remat, remat_policy=self.remat_policy,
                        dtype=self.dtype, name="net")(x, train)


def build_model(graph: Any = "maf-yolo-n", nc: int = 80, reg_max: int = 16,
                strides: Tuple[int, ...] = (8, 16, 32), deploy: bool = False,
                quant: bool = False, calibrate: bool = False,
                s2d_stem: bool = False, skip_stem: bool = False,
                skip_until: int = -1, remat: bool = False,
                remat_policy: str = "full",
                plain_rep: bool = False, dtype: Any = jnp.float32) -> MAFYolo:
    """Build a MAFYolo from a zoo name, a graph dict, or a reference-format yaml path."""
    if isinstance(graph, str):
        if graph in MODEL_ZOO:
            graph = MODEL_ZOO[graph]
        elif graph.lower() in MODEL_ZOO:
            graph = MODEL_ZOO[graph.lower()]
        else:
            graph = graph_from_yaml(graph)
    specs, save, out_frm = parse_graph(graph, nc=nc)
    return MAFYolo(specs=specs, save=save, out_frm=out_frm, nc=nc, reg_max=reg_max,
                   strides=strides, deploy=deploy, plain_rep=plain_rep,
                   quant=quant, calibrate=calibrate, s2d_stem=s2d_stem,
                   skip_stem=skip_stem, skip_until=skip_until, remat=remat,
                   remat_policy=remat_policy, dtype=dtype)


def _save_convs_policy(prim, *_, **__):
    """jax.checkpoint policy: save conv/dot outputs inside remat'd blocks.

    With per-block remat the compiled-code size stays bounded either way;
    this policy removes the backward's forward-recompute of the convs (the
    expensive part) at the cost of keeping their activations live.
    """
    return prim.name in ("conv_general_dilated", "dot_general")
