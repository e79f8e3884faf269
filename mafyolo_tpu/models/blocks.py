"""MAF-YOLO block zoo as flax.linen modules, NHWC, TPU-first.

Behavioral parity targets (cited into the reference, /root/reference):
  Conv / ConvWrapper      yolov6/layers/common.py:29-50, 76-84
  SimConv                 yolov6/layers/common.py:53-74
  SPPF                    yolov6/layers/common.py:114-129
  RepVGGBlock             yolov6/layers/common.py:166-284
  MPRep                   yolov6/layers/common.py:776-792
  DepthBottleneckUni      yolov6/layers/common.py:898-927
  RepHDW                  yolov6/layers/common.py:928-946
  Head_DepthUni           yolov6/layers/common.py:1288-1336
  ReparamLargeKernelConv  yolov6/layers/common.py:2706-2795
  DilatedReparamBlock     yolov6/layers/common.py:2948-3051
  UniRepLKNetBlock        yolov6/layers/common.py:3053-3101

Every re-parameterizable block exists in two forms selected by the `deploy` field:
train form (multi-branch conv+BN) and deploy form (a single biased conv). The pure
pytree transform mapping one to the other lives in mafyolo_tpu/models/reparam.py.

Design choices (TPU-first, not a port):
  * NHWC layout end-to-end; convolutions hit the MXU via XLA with HWIO kernels.
  * BatchNorm statistics are fp32; convolution compute dtype is a module field so the
    whole network can run in bfloat16 while params stay fp32.
  * BN hyperparams match the reference's init override (eps=1e-3, torch momentum 0.03
    => flax momentum 0.97; yolov6/utils/torch_utils.py:43-45).
  * Conv weight init matches torch's Conv2d default (kaiming_uniform(a=sqrt(5)), i.e.
    U(-sqrt(1/fan_in), +sqrt(1/fan_in))) so from-scratch training dynamics line up.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Conv2d default weight init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)).
# flax variance_scaling uniform limit = sqrt(3*scale/fan_in) -> scale=1/3.
torch_conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _activate(x, act: Optional[str]):
    if act is None:
        return x
    if act == "silu":
        return nn.silu(x)
    if act == "relu":
        return nn.relu(x)
    raise ValueError(f"unknown activation {act!r}")


def autopad(k: int, dilation: int = 1) -> int:
    """'same'-style padding used throughout the reference: (d*(k-1)+1)//2."""
    return (dilation * (k - 1) + 1) // 2


class _DWConvNoBias(nn.Module):
    """Depthwise conv (stride 1) with the custom VJP of ops/dwconv.py; param tree
    identical to nn.Conv's ({'kernel': [K,K,1,C]})."""
    ch: int
    k: int
    pad: int
    dilation: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        from mafyolo_tpu.ops.dwconv import dw_conv
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (self.k, self.k, 1, self.ch), jnp.float32)
        return dw_conv(x.astype(self.dtype), kernel.astype(self.dtype),
                       self.pad, self.dilation)


import os as _os

# Train-form W-paired stride-2 conv (the deploy _RawConv trick applied to
# ConvBN's nn.Conv): absorb the width stride into channels with a free
# contiguous reshape, doubling the MXU contraction depth AND the 128-lane
# channel utilization for the conv, its dx, and its dk.
# MEASURED-AND-REJECTED in-graph (round 5, tools/profile_step.py A/B on the
# real chip): full step 171.7 -> 179.3 ms, forward 35.8 -> 40.0 -- the
# reshape costs more fusion than the pairing saves in TRAIN form (deploy
# keeps its win because the folded conv has no BN neighborhood). Kept
# default-off behind MAFYOLO_PAIRED_TRAIN for future toolchains.
PAIRED_TRAIN = bool(int(_os.environ.get("MAFYOLO_PAIRED_TRAIN", "0")))

# Force BatchNorm's elementwise normalize to f32 (the pre-round-4 behavior).
# flax keeps batch statistics and running stats f32 either way; the round-4
# bf16 default only changes the (x-mean)*rsqrt(var+eps) arithmetic dtype.
# A/B harness: tools/profile_bn_ab.py (VERDICT r4 #4).
BN_F32 = bool(int(_os.environ.get("MAFYOLO_BN_F32", "0")))

# Deploy pointwise conv as a reshape-free dot_general. MEASURED-AND-REJECTED
# (round 5): N deploy infer 2309 -> 1921 img/s (the reshape variant was worse
# still, 1473); XLA's conv op + its layout assignment beats every dot
# formulation in-graph. Kept for future toolchains.
PW_DOT = bool(int(_os.environ.get("MAFYOLO_PW_DOT", "0")))


class _PairedS2Conv(nn.Module):
    """3x3/s2 conv via the W-paired formulation; param tree identical to
    nn.Conv's ({'kernel': [3,3,Cin,Cout]}). See _RawConv's deploy variant
    (blocks.py) for the index derivation; numerics differ from the direct
    conv only in bf16 contraction order (tests/test_paired_s2conv.py)."""
    cout: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, cin, self.cout), jnp.float32)
        zeros = jnp.zeros_like(kernel[:, :1])
        kp = jnp.concatenate([
            jnp.concatenate([zeros, kernel[:, 0:1]], axis=2),
            jnp.concatenate([kernel[:, 1:2], kernel[:, 2:3]], axis=2),
        ], axis=1)                                    # [3, 2, 2cin, cout]
        return jax.lax.conv_general_dilated(
            x.reshape(b, h, w // 2, 2 * cin).astype(self.dtype),
            kp.astype(self.dtype), window_strides=(2, 1),
            padding=[(1, 1), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBN(nn.Module):
    """conv(bias=False) + BatchNorm + optional activation (reference Conv/conv_bn cells)."""
    cout: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Optional[str] = None
    pad: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k, self.dilation) if self.pad is None else self.pad
        if (self.groups > 1 and self.groups == x.shape[-1]
                and self.cout == self.groups and self.stride == 1):
            # depthwise path: XLA's DW-conv gradient lowering is pathological at
            # large spatial sizes (2GB executables); use the custom-VJP op
            x = _DWConvNoBias(self.cout, self.k, p, self.dilation,
                              self.dtype, name="conv")(x)
        elif (PAIRED_TRAIN and self.k == 3 and self.stride == 2
              and self.groups == 1 and self.dilation == 1 and p == 1
              and x.ndim == 4 and x.shape[1] >= 80 and x.shape[2] >= 80
              and x.shape[2] % 2 == 0):
            x = _PairedS2Conv(self.cout, self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.cout, (self.k, self.k), strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)], feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                kernel_init=torch_conv_kernel_init,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        # BN computes in the model dtype; flax upcasts the STATISTICS to f32
        # internally (normalization._compute_stats) and the params/running
        # stats stay f32, so only the elementwise normalize runs in bf16 --
        # whose output was cast to self.dtype right here anyway. The explicit
        # f32 materialization it replaces cost ~1.4 ms/instance fwd at the
        # 320^2x24 L0 shape and more in the backward (tools/profile_bwd_micro
        # round-4 BN probe).
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=jnp.float32 if BN_F32 else self.dtype,
            param_dtype=jnp.float32, name="bn")(x)
        return _activate(x.astype(self.dtype), self.act)


def fake_quant_sym(x, amax, bits: int = 8):
    """Symmetric fake quantization with straight-through gradients.

    TPU-native replacement for pytorch_quantization's TensorQuantizer
    (tools/qat/qat_utils.py): scale = amax / qmax, round-clip to int grid,
    dequantize; amax==0 passes through (uncalibrated/no-op).
    """
    qmax = 2.0 ** (bits - 1) - 1
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax) * scale
    q = jnp.where(amax > 0, q, x)
    return x + jax.lax.stop_gradient(q - x)   # STE for QAT


# When nonzero, calibrate-mode _RawConv also accumulates an |x| histogram into
# the 'quant' collection (set by core/quant.ptq_calibrate for histogram-based
# amax methods; a module flag because it only affects calibration tracing).
CALIB_HIST_BINS = 0

# When True, quant-mode _RawConv runs REAL int8 convolutions (int8 x int8 ->
# int32 on the MXU, measured 1.55x bf16 on v5e) instead of bf16 fake-quant
# simulation. Set by core/quant.int8_predict_fn around its trace; requires a
# fully-calibrated amax tree (every act_amax > 0).
INT8_INFER = False


class QuantAct(nn.Module):
    """Standalone activation quantizer for non-conv ops: the maxpool inputs in
    SPPF/SimSPPF/MPRep and the neck upsample output. TPU analog of the
    reference's QuantMaxPool2d input quantizer (tools/qat/qat_utils.py:127-144)
    and RepPANNeck.upsample_enable_quant (yolov6/models/reppan.py:89-97).
    Calibrate mode records the running |x| max (+ optional histogram) and
    passes through; quant mode fake-quantizes with STE. amax==0 is a no-op."""
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        amax = self.variable("quant", "act_amax",
                             lambda: jnp.zeros((), jnp.float32))
        if self.calibrate:
            if not self.is_initializing():
                amax.value = jnp.maximum(amax.value,
                                         jnp.abs(x.astype(jnp.float32)).max())
            if CALIB_HIST_BINS:
                hist = self.variable(
                    "quant", "act_hist",
                    lambda: jnp.zeros((CALIB_HIST_BINS,), jnp.float32))
                if not self.is_initializing():
                    h, _ = jnp.histogram(
                        jnp.abs(x.astype(jnp.float32)), bins=CALIB_HIST_BINS,
                        range=(0.0, jnp.maximum(amax.value, 1e-12)))
                    hist.value = hist.value + h.astype(jnp.float32)
            return x
        return fake_quant_sym(x.astype(jnp.float32), amax.value).astype(x.dtype)


class _RawConv(nn.Module):
    """Bare conv (the {'kernel','bias'} leaf of deploy blocks) with optional
    int8 fake quantization: per-output-channel weights, per-tensor activations."""
    cin: int
    cout: int
    k: int
    stride: int
    groups: int
    dilation: int
    pad: int
    dtype: Dtype
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (self.k, self.k, self.cin // self.groups, self.cout),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
        if isinstance(x, (tuple, list)):
            # Concat-elimination (deploy graphs): conv(concat(xs)) ==
            # sum_i conv(x_i, K[:, :, off_i:off_i+c_i, :]) -- the concat
            # buffer (written + re-read from HBM around the conv) never
            # materializes. LazyUp2x inputs additionally commute the 1x1
            # dot to the pre-upsample resolution (4x fewer dot FLOPs; the
            # nearest repeat runs on the cheap partial result instead).
            assert not self.quant and self.groups == 1
            y = None
            off = 0
            for xi in x:
                lazy = isinstance(xi, LazyUp2x)
                assert not lazy or (self.k == 1 and self.stride == 1)
                t = xi.pre if lazy else xi
                ci = t.shape[-1]
                ki = jax.lax.slice_in_dim(kernel, off, off + ci, axis=2)
                off += ci
                yi = jax.lax.conv_general_dilated(
                    t.astype(self.dtype), ki.astype(self.dtype),
                    window_strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad), (self.pad, self.pad)],
                    rhs_dilation=(self.dilation, self.dilation),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if lazy:
                    yi = _up2x(yi)
                y = yi if y is None else y + yi
            return y + bias.astype(self.dtype)
        if self.quant:
            amax = self.variable("quant", "act_amax",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.calibrate:
                if not self.is_initializing():
                    amax.value = jnp.maximum(amax.value,
                                             jnp.abs(x.astype(jnp.float32)).max())
                if CALIB_HIST_BINS:
                    # histogram pass of the two-pass histogram calibration
                    # (core/quant.py): range anchored at the pass-1 running max,
                    # like pytorch_quantization's HistogramCalibrator
                    # (qat_utils.py:12-59 collect_stats/compute_amax)
                    hist = self.variable(
                        "quant", "act_hist",
                        lambda: jnp.zeros((CALIB_HIST_BINS,), jnp.float32))
                    if not self.is_initializing():
                        h, _ = jnp.histogram(
                            jnp.abs(x.astype(jnp.float32)),
                            bins=CALIB_HIST_BINS,
                            range=(0.0, jnp.maximum(amax.value, 1e-12)))
                        hist.value = hist.value + h.astype(jnp.float32)
            elif INT8_INFER:
                # real int8 path: per-tensor activation scale, per-out-channel
                # weight scale, int32 accumulation on the MXU, one fused
                # dequant+bias epilogue
                x_scale = jnp.maximum(amax.value, 1e-12) / 127.0
                w_amax = jnp.abs(kernel).max(axis=(0, 1, 2))        # [cout]
                w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
                x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                               -127, 127).astype(jnp.int8)
                w_q = jnp.clip(jnp.round(kernel / w_scale), -127,
                               127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    x_q, w_q, window_strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad), (self.pad, self.pad)],
                    rhs_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * (x_scale * w_scale) + bias
                return y.astype(self.dtype)
            else:
                x = fake_quant_sym(x.astype(jnp.float32), amax.value).astype(x.dtype)
            w_amax = jnp.abs(kernel).max(axis=(0, 1, 2), keepdims=True)
            kernel = fake_quant_sym(kernel, w_amax)
        if (PW_DOT and self.k == 1 and self.stride == 1 and self.groups == 1
                and not self.quant and x.ndim == 4):
            # pointwise conv as a DIRECT dot_general over the channel dim (no
            # reshape -- the round-5 reshaped-dot variant lost 36% in-graph
            # to layout-changing copies). Gated for on-chip A/B.
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
                (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            return y.astype(self.dtype) + bias.astype(self.dtype)
        if (self.k == 3 and self.stride == 2 and self.groups == 1
                and self.dilation == 1 and self.pad == 1 and not self.quant
                and x.ndim == 4 and x.shape[1] >= 80 and x.shape[2] >= 80
                and x.shape[2] % 2 == 0):
            # W-paired stride-2 conv: absorb the width stride into channels
            # with a FREE contiguous reshape NHWC [B,H,W,C] -> [B,H,W/2,2C]
            # (output col x taps {2x-1, 2x, 2x+1} = pair x-1's odd element +
            # pair x's both => a [3,2] window over pairs, stride (2,1), pad
            # (1,0)). Doubles the contraction depth the MXU sees -- measured
            # 0.89 -> 0.72 ms at the 160^2 18ch neck down-branch (L18) and
            # neutral-to-winning at 80^2; loses below (tools/profile_s2conv).
            b, h, w, cin = x.shape
            zeros = jnp.zeros_like(kernel[:, :1])
            kp = jnp.concatenate([
                jnp.concatenate([zeros, kernel[:, 0:1]], axis=2),
                jnp.concatenate([kernel[:, 1:2], kernel[:, 2:3]], axis=2),
            ], axis=1)                                    # [3, 2, 2cin, cout]
            y = jax.lax.conv_general_dilated(
                x.reshape(b, h, w // 2, 2 * cin).astype(self.dtype),
                kp.astype(self.dtype), window_strides=(2, 1),
                padding=[(1, 1), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            rhs_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class LazyUp2x:
    """Deferred nearest-2x upsample: holds the pre-upsample tensor so a
    consuming 1x1 conv can commute the dot to quarter resolution
    (conv1x1(up2x(x)) == up2x(conv1x1(x)) exactly for nearest-neighbor).
    Produced by GraphNet's deploy-mode concat fusion; consumed by _RawConv."""
    __slots__ = ("pre",)

    def __init__(self, pre):
        self.pre = pre


def _up2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class ConvAct(nn.Module):
    """Deploy-form conv with bias + optional activation (the fold target of ConvBN)."""
    cout: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Optional[str] = None
    pad: Optional[int] = None
    dtype: Dtype = jnp.float32
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        p = autopad(self.k, self.dilation) if self.pad is None else self.pad
        if isinstance(x, (tuple, list)):
            cin = sum((t.pre if isinstance(t, LazyUp2x) else t).shape[-1]
                      for t in x)
        else:
            cin = x.shape[-1]
        x = _RawConv(cin, self.cout, self.k, self.stride, self.groups,
                     self.dilation, p, self.dtype, quant=self.quant,
                     calibrate=self.calibrate, name="conv")(x)
        return _activate(x, self.act)


def _convish(deploy: bool, quant: bool = False, calibrate: bool = False):
    if deploy:
        import functools
        return functools.partial(ConvAct, quant=quant, calibrate=calibrate)
    return ConvBN


class Conv(nn.Module):
    """conv-BN-SiLU (reference Conv, common.py:29-50)."""
    cout: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _convish(self.deploy, self.quant, self.calibrate)(
            self.cout, self.k, self.stride, self.groups, act=self.act,
            dtype=self.dtype, name="block")(x, train)


class ConvWrapper(nn.Module):
    """Default-k3 Conv wrapper (common.py:76-84); the MAFPN down-branch convs."""
    cout: int
    k: int = 3
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _convish(self.deploy, self.quant, self.calibrate)(
            self.cout, self.k, self.stride, self.groups, act="silu",
            dtype=self.dtype, name="block")(x, train)


class SimConv(nn.Module):
    """conv-BN-ReLU (common.py:53-74)."""
    cout: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _convish(self.deploy, self.quant, self.calibrate)(
            self.cout, self.k, self.stride, self.groups, act="relu",
            dtype=self.dtype, name="block")(x, train)


def max_pool_same(x, k: int, stride: int = 1):
    """MaxPool2d(k, stride, padding=k//2) equivalent, NHWC."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(stride, stride), padding=[(p, p), (p, p)])


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (common.py:114-129)."""
    cin: int
    cout: int
    k: int = 5
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.cin // 2
        cv = _convish(self.deploy, self.quant, self.calibrate)
        x = cv(c_, 1, act="silu", dtype=self.dtype, name="cv1")(x, train)
        # one shared input quantizer across the three pool applications, like
        # the reference's single QuantMaxPool2d module reused three times
        q = QuantAct(calibrate=self.calibrate, name="pool_q") if self.quant \
            else (lambda t: t)
        y1 = max_pool_same(q(x), self.k)
        y2 = max_pool_same(q(y1), self.k)
        y3 = max_pool_same(q(y2), self.k)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return cv(self.cout, 1, act="silu", dtype=self.dtype, name="cv2")(y, train)


class RepVGGBlock(nn.Module):
    """RepVGG 3x3+1x1+identity block with ReLU (common.py:166-284).

    Train: relu(dense3x3_bn(x) + pw1x1_bn(x) [+ id_bn(x) if cin==cout and stride==1]).
    Deploy: relu(conv3x3+bias) -- see reparam.fold_repvgg.
    plain=True drops the 1x1/identity branches: the RealVGGBlock used by
    cfg.training_mode=='repopt' (common.py:286-303, get_block common.py:2261-2267);
    the structural prior then lives in the RepOptimizer grad masks
    (solver/repopt.py).
    """
    cin: int
    cout: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    plain: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = ConvAct(self.cout, 3, self.stride, self.groups,
                        quant=self.quant, calibrate=self.calibrate,
                        dtype=self.dtype, name="fused")(x, train)
            return nn.relu(y)
        y = ConvBN(self.cout, 3, self.stride, self.groups, dtype=self.dtype,
                   name="dense")(x, train)
        if self.plain:
            return nn.relu(y)
        y = y + ConvBN(self.cout, 1, self.stride, self.groups, pad=0, dtype=self.dtype,
                       name="pw")(x, train)
        if self.cin == self.cout and self.stride == 1:
            idn = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                               dtype=jnp.float32 if BN_F32 else self.dtype,
                               param_dtype=jnp.float32,
                               name="idbn")(x)
            y = y + idn.astype(self.dtype)
        return nn.relu(y)


class MPRep(nn.Module):
    """Dual-path downsample: maxpool2+1x1conv || stride-2 RepVGG, concat (common.py:776-792)."""
    cin: int
    cout: int
    deploy: bool = False
    plain: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.cout // 2
        xp = QuantAct(calibrate=self.calibrate, name="pool_q")(x) \
            if self.quant else x
        a = nn.max_pool(xp, (2, 2), strides=(2, 2))
        a = _convish(self.deploy, self.quant, self.calibrate)(c_, 1, act="silu", dtype=self.dtype, name="pool_proj")(a, train)
        b = RepVGGBlock(self.cin, c_, stride=2, deploy=self.deploy,
                        plain=self.plain, quant=self.quant,
                        calibrate=self.calibrate, dtype=self.dtype,
                        name="rep_down")(x, train)
        return jnp.concatenate([a, b], axis=-1)


# Branch schedule of the UniRepLKNet dilated-reparam block for each origin kernel size:
# list of (kernel, dilation) pairs (common.py:2985-3008). Shipped MAF graphs use k in
# {3,5,7,9}, where every dilation is 1; the >=11 rows keep generality.
DILATED_BRANCHES = {
    17: ((5, 1), (9, 2), (3, 4), (3, 5), (3, 7)),
    15: ((5, 1), (7, 2), (3, 3), (3, 5), (3, 7)),
    13: ((5, 1), (7, 2), (3, 3), (3, 4), (3, 5)),
    11: ((5, 1), (5, 2), (3, 3), (3, 4), (3, 5)),
    9: ((7, 1), (5, 1), (3, 1)),
    7: ((5, 1), (3, 1)),
    5: ((3, 1), (1, 1)),
    3: ((3, 1), (1, 1)),
}


class DilatedReparamBlock(nn.Module):
    """UniRepLKNet dilated re-param depthwise block (common.py:2948-3051).

    Train: bn(dw_kxk(x)) + sum_i bn_i(dw_{k_i,r_i}(x)); no activation.
    Deploy: a single depthwise kxk conv with bias.
    """
    ch: int
    k: int
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            return ConvAct(self.ch, self.k, groups=self.ch,
                           quant=self.quant, calibrate=self.calibrate,
                           dtype=self.dtype, name="fused")(x, train)
        out = ConvBN(self.ch, self.k, groups=self.ch, dtype=self.dtype,
                     name="origin")(x, train)
        for ks, r in DILATED_BRANCHES[self.k]:
            out = out + ConvBN(self.ch, ks, groups=self.ch, dilation=r, dtype=self.dtype,
                               name=f"dil_k{ks}_r{r}")(x, train)
        return out


class UniRepLKNetBlock(nn.Module):
    """DilatedReparamBlock + trailing BN; folds to one biased DW conv (common.py:3053-3101)."""
    ch: int
    k: int
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.k == 0:
            return x
        if self.deploy:
            return ConvAct(self.ch, self.k, groups=self.ch,
                           quant=self.quant, calibrate=self.calibrate,
                           dtype=self.dtype, name="fused")(x, train)
        y = DilatedReparamBlock(self.ch, self.k, dtype=self.dtype, name="drb")(x, train)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32 if BN_F32 else self.dtype,
                         param_dtype=jnp.float32,
                         name="post_bn")(y)
        return y.astype(self.dtype)


class ReparamLargeKernelConv(nn.Module):
    """Large-kernel DW conv + parallel small-kernel branch, ReLU (common.py:2706-2795)."""
    ch: int
    k: int
    stride: int = 1
    small_k: int = 3
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = ConvAct(self.ch, self.k, self.stride, groups=self.ch,
                        quant=self.quant, calibrate=self.calibrate,
                        dtype=self.dtype, name="fused")(x, train)
            return nn.relu(y)
        y = ConvBN(self.ch, self.k, self.stride, groups=self.ch, dtype=self.dtype,
                   name="lk")(x, train)
        y = y + ConvBN(self.ch, self.small_k, self.stride, groups=self.ch, dtype=self.dtype,
                       name="small")(x, train)
        return nn.relu(y)


class DepthBottleneckUni(nn.Module):
    """1x1 expand -> UniRepLKNet DW -> SiLU -> 1x1 project (common.py:898-927).

    Note: the reference stores `shortcut` but never adds a residual in this block.
    """
    cin: int
    cout: int
    kersize: int = 5
    expansion_depth: float = 1.0
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.cin * self.expansion_depth)
        cv = _convish(self.deploy, self.quant, self.calibrate)
        y = cv(mid, 1, act="silu", dtype=self.dtype, name="expand")(x, train)
        y = UniRepLKNetBlock(mid, self.kersize, deploy=self.deploy, quant=self.quant, calibrate=self.calibrate, dtype=self.dtype,
                             name="dw")(y, train)
        y = nn.silu(y)
        return cv(self.cout, 1, act="silu", dtype=self.dtype, name="project")(y, train)


class RepHDW(nn.Module):
    """CSP-style heterogeneous-DW merge block, the core MAF unit (common.py:928-946).

    1x1 in-conv to 2*c_; split; chain `depth` DepthBottleneckUni, appending each output;
    concat (depth+2)*c_; 1x1 out-conv.
    """
    cin: int
    cout: int
    depth: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    kersize: int = 5
    depth_expansion: float = 1.0
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.cout * self.expansion)
        cv = _convish(self.deploy, self.quant, self.calibrate)
        x = cv(2 * c_, 1, act="silu", dtype=self.dtype, name="cv_in")(x, train)
        outs = [x[..., :c_], x[..., c_:2 * c_]]
        for i in range(self.depth):
            y = DepthBottleneckUni(c_, c_, self.kersize, self.depth_expansion,
                                   deploy=self.deploy, quant=self.quant, calibrate=self.calibrate, dtype=self.dtype,
                                   name=f"m{i}")(outs[-1], train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        return cv(self.cout, 1, act="silu", dtype=self.dtype, name="cv_out")(y, train)


class Head_DepthUni(nn.Module):
    """Per-level decoupled head (common.py:1288-1336).

    stem 1x1 -> {cls,reg} branches of (UniRepLKNet DW k + 1x1 Conv) -> 1x1 preds.
    cls_pred bias init -log((1-p)/p) with p=1e-2, weights zero; reg_pred bias 1.0,
    weights zero (common.py:1307-1323). Returns (stem_feat, sigmoid(cls), reg_distri).
    """
    cin: int
    cout: int
    reg_max: int = 16
    kersize: int = 5
    nc: int = 80
    num_anchors: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cv = _convish(self.deploy, self.quant, self.calibrate)
        prior = 1e-2
        x = cv(self.cout, 1, act="silu", dtype=self.dtype, name="stem")(x, train)
        cls_f = UniRepLKNetBlock(self.cout, self.kersize, deploy=self.deploy, quant=self.quant, calibrate=self.calibrate,
                                 dtype=self.dtype, name="cls_dw")(x, train)
        cls_f = cv(self.cout, 1, act="silu", dtype=self.dtype, name="cls_proj")(cls_f, train)
        cls_out = nn.Conv(self.nc * self.num_anchors, (1, 1), use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.constant(-math.log((1 - prior) / prior)),
                          dtype=self.dtype, param_dtype=jnp.float32, name="cls_pred")(cls_f)
        # training: f32 sigmoid (the VFL loss matches the reference in fp32,
        # loss.py:196-206); deploy: model dtype -- the eval selection sorts
        # run on these scores and bf16 halves their traffic (sigmoid is
        # monotone under rounding)
        out_dt = self.dtype if self.deploy else jnp.float32
        cls_out = nn.sigmoid(cls_out.astype(out_dt))
        reg_f = UniRepLKNetBlock(self.cout, self.kersize, deploy=self.deploy, quant=self.quant, calibrate=self.calibrate,
                                 dtype=self.dtype, name="reg_dw")(x, train)
        reg_f = cv(self.cout, 1, act="silu", dtype=self.dtype, name="reg_proj")(reg_f, train)
        reg_out = nn.Conv(4 * (self.reg_max + self.num_anchors), (1, 1), use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.constant(1.0),
                          dtype=self.dtype, param_dtype=jnp.float32, name="reg_pred")(reg_f)
        return x, cls_out, reg_out.astype(out_dt)


class S2DStem(nn.Module):
    """Space-to-depth replacement for the deploy-form stem RepVGG (layer0).

    A 3x3/s2 conv on [B,H,W,3] is layout-hostile on TPU (C=3 pads to a full
    128-lane register). Packing 2x2 pixel blocks into channels ([B,H/2,W/2,12])
    turns it into an equivalent 2x2/s1 conv with remapped weights (the MLPerf
    ResNet trick); reparam.fold_stem_s2d produces the remapped kernel. Output is
    numerically identical to the folded RepVGG stem (ReLU included).
    """
    cout: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        kernel = self.param("kernel", nn.initializers.zeros,
                            (2, 2, 4 * c, self.cout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(y + bias.astype(self.dtype))


class Head_Simota(nn.Module):
    """YOLOX-style coupled obj/cls/reg head for the SimOTA path
    (reference Head_simota, common.py:1159-1196).

    stem 1x1 -> cls 3x3 -> cls_pred (logits); reg 3x3 -> reg_pred (4 ch,
    xy-offset + log-wh) + obj_pred (1 ch logits). cls/obj biases init to the
    1e-2 prior; returns raw (cls, reg, obj) maps -- sigmoids live in the loss /
    eval decode (Detect_simota, yolo.py:427-454).
    """
    cin: int
    cout: int
    reg_max: int = 0
    nc: int = 80
    num_anchors: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cv = _convish(self.deploy, self.quant, self.calibrate)
        prior = 1e-2
        bias_p = nn.initializers.constant(-math.log((1 - prior) / prior))
        x = cv(self.cout, 1, act="silu", dtype=self.dtype, name="stem")(x, train)
        cls_f = cv(self.cout, 3, act="silu", dtype=self.dtype, name="cls_conv")(x, train)
        cls_out = nn.Conv(self.nc * self.num_anchors, (1, 1), use_bias=True,
                          kernel_init=torch_conv_kernel_init, bias_init=bias_p,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_pred")(cls_f)
        reg_f = cv(self.cout, 3, act="silu", dtype=self.dtype, name="reg_conv")(x, train)
        reg_out = nn.Conv(4 * (self.reg_max + self.num_anchors), (1, 1),
                          use_bias=True, kernel_init=torch_conv_kernel_init,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="reg_pred")(reg_f)
        obj_out = nn.Conv(self.num_anchors, (1, 1), use_bias=True,
                          kernel_init=torch_conv_kernel_init, bias_init=bias_p,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="obj_pred")(reg_f)
        return (cls_out.astype(jnp.float32), reg_out.astype(jnp.float32),
                obj_out.astype(jnp.float32))


class Upsample2x(nn.Module):
    """nn.Upsample(scale=2, mode='nearest') equivalent; exact integer-repeat,
    fusion-friendly. quant=True inserts a fake-quant on the OUTPUT, the
    reference's upsample_enable_quant (yolov6/models/reppan.py:89-115)."""
    dtype: Dtype = jnp.float32
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        y = _up2x(x)
        if self.quant:
            y = QuantAct(calibrate=self.calibrate, name="up_q")(y)
        return y


class Concat(nn.Module):
    """Channel concat over the NHWC channel axis (common.py:148-154, dim=1 in NCHW)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        del train
        return jnp.concatenate(list(xs), axis=-1)


# ---------------------------------------------------------------------------
# Legacy "office" path blocks (EfficientRep / RepPANNeck / effidehead) --
# the reference's non-yaml build_network dispatch (yolo.py:166-172, 225-275).
# ---------------------------------------------------------------------------

class RepBlock(nn.Module):
    """Chain of n RepVGGBlocks (common.py:374-401, block=RepVGGBlock)."""
    cin: int
    cout: int
    n: int = 1
    deploy: bool = False
    plain: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RepVGGBlock(self.cin, self.cout, deploy=self.deploy,
                        plain=self.plain, quant=self.quant,
                        calibrate=self.calibrate, dtype=self.dtype,
                        name="conv1")(x, train)
        for i in range(self.n - 1):
            x = RepVGGBlock(self.cout, self.cout, deploy=self.deploy,
                            plain=self.plain, quant=self.quant,
                            calibrate=self.calibrate, dtype=self.dtype,
                            name=f"block{i}")(x, train)
        return x


class BottleRep(nn.Module):
    """Two rep-style convs + alpha-weighted identity (common.py:508-526).

    In the CSPBep context (RepBlock with block=BottleRep, common.py:383-386)
    weight=True always, so alpha is a learnable scalar. basic='repvgg' is the
    yolov6-m family block; basic='conv' the ConvWrapper (conv-BN-SiLU k3) of
    the -l family (get_block, common.py:2261-2267).
    """
    cin: int
    cout: int
    basic: str = "repvgg"
    weight: bool = True
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, quant=self.quant,
                  calibrate=self.calibrate, dtype=self.dtype)
        if self.basic == "repvgg":
            y = RepVGGBlock(self.cin, self.cout, name="conv1", **kw)(x, train)
            y = RepVGGBlock(self.cout, self.cout, name="conv2", **kw)(y, train)
        else:
            y = ConvWrapper(self.cout, name="conv1", **kw)(x, train)
            y = ConvWrapper(self.cout, name="conv2", **kw)(y, train)
        if self.cin != self.cout:
            return y
        if self.weight:
            alpha = self.param("alpha", nn.initializers.ones, (1,),
                               jnp.float32)
            return y + alpha.astype(self.dtype) * x
        return y + x


def bepc3_chain_len(n: int) -> int:
    """BottleRep count in a BepC3 of repeat n: RepBlock halves n for
    BottleRep chains (common.py:383-386) -> 1 + max(n//2 - 1, 0)."""
    return 1 + max(n // 2 - 1, 0)


class BepC3(nn.Module):
    """'Beer-mug' CSP RepC3 block (common.py:560-582): 1x1 split cv1/cv2,
    a BottleRep chain on the cv1 branch, concat, 1x1 cv3. All three 1x1s are
    Conv_C3 = conv-BN-SiLU (common.py:544-557; act defaults to SiLU for every
    basic block). n is the pre-halving repeat count from the config."""
    cin: int
    cout: int
    n: int = 1
    e: float = 0.5
    basic: str = "repvgg"
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.cout * self.e)
        cv = _convish(self.deploy, self.quant, self.calibrate)
        kw = dict(basic=self.basic, deploy=self.deploy, quant=self.quant,
                  calibrate=self.calibrate, dtype=self.dtype)
        y1 = cv(c_, 1, act="silu", dtype=self.dtype, name="cv1")(x, train)
        y2 = cv(c_, 1, act="silu", dtype=self.dtype, name="cv2")(x, train)
        m = BottleRep(c_, c_, name="m_conv1", **kw)(y1, train)
        for i in range(bepc3_chain_len(self.n) - 1):
            m = BottleRep(c_, c_, name=f"m_block{i}", **kw)(m, train)
        y = jnp.concatenate([m, y2], axis=-1)
        return cv(self.cout, 1, act="silu", dtype=self.dtype,
                  name="cv3")(y, train)


class SimSPPF(nn.Module):
    """SPPF with ReLU/SimConv cells (common.py:96-112)."""
    cin: int
    cout: int
    k: int = 5
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.cin // 2
        cv = _convish(self.deploy, self.quant, self.calibrate)
        x = cv(c_, 1, act="relu", dtype=self.dtype, name="cv1")(x, train)
        q = QuantAct(calibrate=self.calibrate, name="pool_q") if self.quant \
            else (lambda t: t)
        y1 = max_pool_same(q(x), self.k)
        y2 = max_pool_same(q(y1), self.k)
        y3 = max_pool_same(q(y2), self.k)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return cv(self.cout, 1, act="relu", dtype=self.dtype,
                  name="cv2")(y, train)


class TransposeUp(nn.Module):
    """2x ConvTranspose upsample with bias (common.py:132-145).

    k==stride==2 means output blocks never overlap, so ConvTranspose2d
    reduces exactly to a per-pixel matmul + block reshape:
    out[2y+u, 2x+v, o] = sum_i x[y, x, i] * W[u, v, i, o] + b[o] --
    one MXU einsum instead of a transposed-conv lowering.
    """
    cin: int
    cout: int
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (2, 2, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          jnp.float32)
        if self.quant:
            # reference swaps ConvTranspose2d -> QuantConvTranspose2d with
            # input + per-channel weight quantizers (qat_utils.py:96-126)
            x = QuantAct(calibrate=self.calibrate, name="in_q")(x)
            if not self.calibrate:
                w_amax = jnp.abs(kernel).max(axis=(0, 1, 2), keepdims=True)
                kernel = fake_quant_sym(kernel, w_amax)
        b, h, w, _ = x.shape
        y = jnp.einsum("bhwi,uvio->bhuwvo", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        return y.reshape(b, 2 * h, 2 * w, self.cout) + bias.astype(self.dtype)


class Head_Effide(nn.Module):
    """One level of the Efficient Decoupled Head (effidehead.py:75-134):
    1x1 stem -> {3x3 cls_conv -> 1x1 cls_pred(sigmoid), 3x3 reg_conv ->
    1x1 reg_pred}; prior-prob/one bias init with zero pred weights
    (effidehead.py:53-73). Returns (stem_feat, cls, reg) like Head_DepthUni.
    """
    cin: int
    reg_max: int = 16
    nc: int = 80
    num_anchors: int = 1
    deploy: bool = False
    quant: bool = False
    calibrate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cv = _convish(self.deploy, self.quant, self.calibrate)
        prior = 1e-2
        x = cv(self.cin, 1, act="silu", dtype=self.dtype, name="stem")(x, train)
        cls_f = cv(self.cin, 3, act="silu", dtype=self.dtype,
                   name="cls_conv")(x, train)
        cls_out = nn.Conv(self.nc * self.num_anchors, (1, 1), use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.constant(
                              -math.log((1 - prior) / prior)),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_pred")(cls_f)
        out_dt = self.dtype if self.deploy else jnp.float32
        cls_out = nn.sigmoid(cls_out.astype(out_dt))
        reg_f = cv(self.cin, 3, act="silu", dtype=self.dtype,
                   name="reg_conv")(x, train)
        reg_out = nn.Conv(4 * (self.reg_max + self.num_anchors), (1, 1),
                          use_bias=True, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.constant(1.0),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="reg_pred")(reg_f)
        return x, cls_out, reg_out.astype(out_dt)
