"""From-scratch ResNet encoders (audio / visual), TPU-native NHWC.

Functional equivalent of the reference's scratch ResNet
(cremad/backbone.py — same file duplicated in ave/ and vggsound/):
BasicBlock residual stages [2,2,2,2] (resnet18) with a modality-specific
7x7/stride-2 stem (1-channel audio spectrogram / 3-channel video frames),
3x3/stride-2 max-pool, and a (B, h, w, 512) feature-map output.  The unused
``compress/recover`` path (backbone.py:95-128) is intentionally omitted.

Initialization matches cremad/backbone.py:136-142: kaiming_normal(fan_out)
convs, BN scale ~ N(1, 0.02), BN bias 0.

Layout: NHWC (TPU-preferred).  Video inputs arrive as (B, T, H, W, 3) and
time is folded into the batch before the stem (backbone.py:178-181); the
caller un-folds for pooling.  Compute dtype is bfloat16 on the MXU with
float32 params and BN statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .common import FusedBatchNorm, kaiming_normal_fan_out, normal_init
from ..ops.maxpool_pallas import max_pool_3x3_s2_pallas

_bn_scale_init = normal_init(1.0, 0.02)

#: remat policies for block-level ``jax.checkpoint`` (see ResNetEncoder.remat).
#: "convs" saves only the tagged conv outputs — backward recomputes the cheap
#: BN-apply/ReLU elementwise from them instead of round-tripping every
#: intermediate activation through HBM; "none" recomputes everything.
_REMAT_POLICIES = {
    "convs": lambda: jax.checkpoint_policies.save_only_these_names("conv_out"),
    "none": lambda: None,
}


class _BN(nn.Module):
    """torch-semantics BatchNorm (momentum 0.1 -> flax 0.9, eps 1e-5).

    Two backends (identical variable layout, so checkpoints and param
    paths are stable either way):

      * ``fused=False`` (default): ``nn.BatchNorm``.  Measured FASTER on
        the VGGSound step because XLA fuses the statistics reductions into
        the producing convolutions as epilogues (profile: the
        ``convert_reduce_fusion`` ops ARE conv+stats); a standalone Pallas
        BN forces relayout copies of every feature map and a 2x step
        regression (1423 -> 752 samples/s, measured).
      * ``fused=True``: ops/fused_bn.py Pallas reduction path with torch
        UNBIASED running-var semantics — the right pair for row-major
        (Pallas-conv) pipelines.
    """

    use_running_average: bool
    dtype: Optional[Any] = None
    scale_init: Any = _bn_scale_init
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused:
            return FusedBatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=self.scale_init,
                dtype=self.dtype,
                name="BatchNorm_0",
            )(x)
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=self.scale_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="BatchNorm_0",
        )(x)


def _conv(features: int, kernel: int, stride: int = 1, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        kernel_init=kaiming_normal_fan_out,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class StemConv(nn.Module):
    """7x7/stride-2/pad-3 stem conv with a space-to-depth fast path.

    The parameter is the ordinary (7, 7, C_in, width) kernel (named
    ``Conv_0/kernel`` by the encoder, keeping torch porting and the OGM-GE
    4-D filter contract intact).  When ``space_to_depth`` is on, the
    math-identical rewrite runs instead: input 2x2 space-to-depth (C_in ->
    4*C_in) + the kernel zero-padded to 8x8 and regrouped to (4, 4, 4*C_in,
    width), applied stride-1 VALID.  This quadruples the implicit-GEMM K
    dimension of the stem (K = kh*kw*C_in: audio 49 -> 64-per-tap groups of
    196 total; visual 147 -> 192), the classic MLPerf-ResNet TPU stem
    optimization — identical outputs, better MXU tiling.
    """

    width: int
    space_to_depth: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_out,
                            (7, 7, c_in, self.width), jnp.float32)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        b, h, w, _ = x.shape
        h_out, w_out = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        if not self.space_to_depth:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # pad to exactly 2*out + 6 per spatial dim (3 on top/left, the
        # remainder on bottom/right), then 2x2 space-to-depth
        pad_h = 2 * h_out + 6 - h - 3
        pad_w = 2 * w_out + 6 - w - 3
        xp = jnp.pad(x, ((0, 0), (3, pad_h), (3, pad_w), (0, 0)))
        hz, wz = xp.shape[1] // 2, xp.shape[2] // 2
        z = xp.reshape(b, hz, 2, wz, 2, c_in)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, hz, wz, 4 * c_in)
        # kernel: (8, 8, C, O) split as (a', s, b', t, C, O) -> (a', b',
        # (s, t, C), O), matching the (s, t, c) channel packing of z
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k = k8.reshape(4, 2, 4, 2, c_in, self.width)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c_in, self.width)
        return jax.lax.conv_general_dilated(
            z, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None
    bn_scale_init: Any = _bn_scale_init
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        bn = partial(_BN, not train, self.dtype, self.bn_scale_init,
                     self.bn_fused)
        out = _conv(self.planes, 3, self.stride, self.dtype)(x)
        out = checkpoint_name(out, "conv_out")
        out = bn()(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dtype)(out)
        out = checkpoint_name(out, "conv_out")
        out = bn()(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, self.dtype)(x)
            identity = checkpoint_name(identity, "conv_out")
            identity = bn()(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Residual feature extractor; returns the stage-4 feature map (NHWC)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Optional[Any] = None
    bn_scale_init: Any = _bn_scale_init
    # measured on v5e: the s2d stem is throughput-neutral for these nets
    # (1404 vs 1411 samples/s on the VGGSound step) — the stems are not the
    # bottleneck. Kept available; off by default.
    stem_space_to_depth: bool = False
    # torch-exact running-var semantics (ops/fused_bn.py); the default flax
    # path stores the BIASED batch var in the running buffer (torch uses the
    # unbiased estimator) — a ~1/(M-1) relative eval-only divergence,
    # negligible at real feature-map sizes but visible in strict tests.
    bn_fused: bool = False
    # stem max-pool backend: "xla" (reduce_window + select-and-scatter) or
    # "pallas" (ops/maxpool_pallas.py stored-index kernels — the backward
    # routes dy by a fwd-saved argmax tap (feature-dtype) instead of
    # re-scanning x).
    pool_kernel: str = "xla"
    # block-level rematerialisation: None (save all residuals, XLA default),
    # "convs" (jax.checkpoint each BasicBlock, saving only conv outputs —
    # BN-apply/ReLU recompute in backward), or "none" (full recompute).
    # Math-identical (tests/test_models.py).  MEASURED SLOWER on the
    # VGGSound step (v5e: 164.7 / 184.8 vs 151.7 ms/step baseline,
    # tools/remat_sweep.py): XLA's default residual schedule is already
    # traffic-optimal here and the remat barriers only serialize it.  Kept
    # for memory-bound configurations (larger batches / deeper nets).
    remat: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # name="Conv_0" keeps the param path identical to the plain nn.Conv
        # stem (torch porting + checkpoints are layout-stable)
        x = StemConv(self.width, space_to_depth=self.stem_space_to_depth,
                     dtype=self.dtype, name="Conv_0")(x)
        x = _BN(not train, self.dtype, self.bn_scale_init,
                self.bn_fused)(x)
        x = nn.relu(x)
        # NOTE: ops/maxpool.py has a gather-based custom backward, but
        # in-program it measures SLOWER than select-and-scatter (1051 vs
        # 1428 samples/s on the VGGSound step): the strided slices read
        # 4x data per tap and saving y breaks XLA's remat plan.
        if self.pool_kernel == "pallas":
            x = max_pool_3x3_s2_pallas(x)
        else:
            x = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        block_cls = BasicBlock
        if self.remat:
            # static_argnums: (self, x, train) -> train must stay a Python
            # bool (it selects the BN mode at trace time).  prevent_cse
            # must stay True: with False, XLA CSEs every rematerialized op
            # back into the original and the program is bit-identical to
            # no-remat (measured: 151.9 vs 151.6 ms/step).
            block_cls = nn.remat(
                BasicBlock, static_argnums=(2,), prevent_cse=True,
                policy=_REMAT_POLICIES[self.remat](),
            )
        planes = self.width
        idx = 0
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                # BasicBlock nets change width exactly when striding, so the
                # projection shortcut is needed iff stride != 1.
                down = stride != 1
                x = block_cls(
                    planes,
                    stride=stride,
                    downsample=down,
                    dtype=self.dtype,
                    bn_scale_init=self.bn_scale_init,
                    bn_fused=self.bn_fused,
                    # explicit name: the remat wrapper would otherwise
                    # auto-name as CheckpointBasicBlock_i, breaking param-
                    # path stability (checkpoints, torch porting, OGM-GE)
                    name=f"BasicBlock_{idx}",
                )(x, train)
                idx += 1
            planes *= 2
        return x


class BottleneckBlock(nn.Module):
    """torchvision-style Bottleneck (cremad/backbone.py:213-253): 1x1 ->
    3x3(stride) -> 1x1(4x), BN after each, projection shortcut on the
    first block of every stage.  Conv naming Conv_0..Conv_3 / _BN_0.._BN_3
    (Conv_3/_BN_3 = downsample) for torch_port stability."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None
    bn_scale_init: Any = nn.initializers.ones
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = partial(_BN, not train, self.dtype, self.bn_scale_init,
                     self.bn_fused)
        identity = x
        out = _conv(self.planes, 1, 1, self.dtype)(x)
        out = bn()(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dtype)(out)
        out = bn()(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, self.dtype)(out)
        out = bn()(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, self.dtype)(x)
            identity = bn()(identity)
        return nn.relu(out + identity)


class BottleneckResNetEncoder(nn.Module):
    """Bottleneck residual encoder (resnet50/101/152 family), NHWC.

    Mirrors torchvision resnet50 (the food101 legacy image tower,
    food101/joint_model_proba_logits.py:37) and the reference's own
    Bottleneck class (cremad/backbone.py:213).  Returns the stage-4
    feature map (B, h, w, 2048 for width 64).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Optional[Any] = None
    bn_scale_init: Any = nn.initializers.ones
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = StemConv(self.width, space_to_depth=False,
                     dtype=self.dtype, name="Conv_0")(x)
        x = _BN(not train, self.dtype, self.bn_scale_init,
                self.bn_fused)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        planes = self.width
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                # torchvision: projection on the FIRST block of every stage
                # (channel expansion 4x even at stride 1 — stage 0 included)
                x = BottleneckBlock(
                    planes,
                    stride=stride,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    bn_scale_init=self.bn_scale_init,
                    bn_fused=self.bn_fused,
                )(x, train)
            planes *= 2
        return x


# Named constructors mirroring cremad/backbone.py:261-271 (note the reference's
# "resnet101" is BasicBlock [3,4,23,3], not a true Bottleneck-101 — preserved).
resnet18_encoder = partial(ResNetEncoder, stage_sizes=(2, 2, 2, 2))
resnet34_encoder = partial(ResNetEncoder, stage_sizes=(3, 4, 6, 3))
resnet101_encoder = partial(ResNetEncoder, stage_sizes=(3, 4, 23, 3))
resnet50_encoder = partial(BottleneckResNetEncoder, stage_sizes=(3, 4, 6, 3))
# torchvision resnet152 geometry — the fakenews image tower
# (fakenews/model.py:238: torchvision.models.resnet152)
resnet152_encoder = partial(BottleneckResNetEncoder, stage_sizes=(3, 8, 36, 3))
