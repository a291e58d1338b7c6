"""CoTNet / CoTNeXt — the paper's model family (reference models/cotnet.py).

CotLayer (reference :36-104): static context via grouped KxK conv; a
per-position K^2 attention map from [x; k] through a 2-layer bottleneck with
GroupNorm; dynamic context via the local-aggregation kernel; then a radix-2
split-attention fusion of static and dynamic contexts.

All tensors NHWC.  The attention-weight channels are produced *k-major*
(channel = k*Cw + cw) rather than the reference's cw-major — see
ops/local_agg.py; SubChannelGroupNorm keeps the normalization semantics
identical and the checkpoint converter permutes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from cotnet_tpu.models.helpers import build_model_with_cfg, default_cfg
from cotnet_tpu.models.registry import register_model
from cotnet_tpu.models.resnet import Downsample, ResNet, drop_block_cfgs
from cotnet_tpu.nn import (
    batch_norm,
    Conv2d,
    DropBlock2d,
    DropPath,
    SubChannelGroupNorm,
    avg_pool2d,
    create_attn,
    get_act_fn,
)
from cotnet_tpu.ops import local_aggregate
from cotnet_tpu.ops.local_agg import local_aggregate_embed_gn, local_aggregate_wt
from cotnet_tpu.ops.local_agg_pallas import chwn_wt_plan
from cotnet_tpu.ops import local_agg_pallas as _lap

import os as _os

# Fold the embed GroupNorm's normalize into the aggregation op (the
# normalized attention-weight tensor — the largest activation in each CoT
# layer — never round-trips HBM).  Identical math.  Measured on v5e bf16
# bs128 cotnet50: inference XLA path -0.8 ms/batch, Pallas path neutral;
# the affine BACKWARD is slower (+7.7 ms/batch: the dw kernel re-reads the
# raw weight and the stats-chain adds an elementwise pass), so training
# defaults to the materialized path.
GN_FOLD = _os.environ.get("COTNET_GN_FOLD", "1") == "1"
GN_FOLD_TRAIN = _os.environ.get("COTNET_GN_FOLD_TRAIN", "0") == "1"


def _use_fold(training: bool) -> bool:
    return GN_FOLD and (not training or GN_FOLD_TRAIN)


# key_embed grouped conv as dense block-diagonal (full-width MXU wgrad at
# the cost of groups x FLOPs) — opt-in, measured per shape on chip
DENSE_GROUPED = _os.environ.get("COTNET_DENSE_GROUPED", "0") == "1"


def _key_embed_conv(dim, ks, groups, dtype):
    if DENSE_GROUPED:
        from cotnet_tpu.nn.conv import DenseGroupedConv, normalize_padding
        return DenseGroupedConv(
            features=dim, kernel_size=(ks, ks),
            padding=normalize_padding(ks // 2, ks, 1, 1),
            groups=groups, dtype=dtype, name="key_embed_conv")
    return Conv2d(dim, ks, 1, ks // 2, groups=groups, dtype=dtype,
                  name="key_embed_conv")


# Eval mega-fusion: embed_conv2 + GroupNorm + aggregation as ONE Pallas
# kernel — the attention weight tensor never exists in HBM (see
# ops/local_agg_pallas.agg_embed_gn_pallas).  MEASURED OFF (r3,
# tools/fused_embed_bench.py, bs128 bf16): with the deferred-affine fold
# already deleting the separate GN pass, the unfused path is not
# HBM-bound at any cotnet stage — the fused kernel ties at 14/7px
# (1.00x/1.01x) and loses at 28px (0.67x: the per-image in-kernel dot
# serializes against XLA's one batched matmul), and 56px exceeds scoped
# VMEM.  Kept tested (oracle in tests/test_local_agg.py) behind the flag.
MEGA_FUSE = _os.environ.get("COTNET_MEGA_FUSE", "0") == "1"


class _Conv1x1Params(fnn.Module):
    """Parameter twin of ``Conv2d(features, 1, use_bias=True)``: declares
    the identical {kernel [1,1,Cin,F], bias [F]} structure (same init) so
    the fused-eval path can hand the raw weights to the kernel while
    checkpoints/init remain bit-identical with the unfused module."""

    features: int
    in_features: int

    @fnn.compact
    def __call__(self):
        from cotnet_tpu.nn.conv import kaiming_normal_out

        k = self.param("kernel", kaiming_normal_out,
                       (1, 1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", fnn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b

default_cfgs = {
    "cotnet50": default_cfg(),
    "cotnet101": default_cfg(),
    "cotnext50_2x48d": default_cfg(),
    "cotnext101_2x48d": default_cfg(),
}

SHARE_PLANES = 8


class CotLayer(fnn.Module):
    """Contextual Transformer block (reference models/cotnet.py:36-104).

    Also the hybrid family's CoTLayer (cotnet_hybrid.py:48-116 — identical
    math)."""

    dim: int
    kernel_size: int = 3
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        dim, ks = self.dim, self.kernel_size
        k2 = ks * ks
        cw = dim // SHARE_PLANES
        factor = 2
        radix = 2
        relu = get_act_fn("relu")
        swish = get_act_fn("swish")

        def bn(name):
            return lambda y, training=training: batch_norm(
                y, training, name=name, dtype=self.dtype,
                axis_name=self.axis_name)

        # (1) static context: grouped KxK conv (groups=4) + BN + ReLU
        k = _key_embed_conv(dim, ks, 4, self.dtype)(x)
        k = relu(bn("key_embed_bn")(k))

        # (2) attention embed from [x; k]
        qk = jnp.concatenate([x, k], axis=-1)
        w = Conv2d(dim // factor, 1, dtype=self.dtype, name="embed_conv1")(qk)
        w = relu(bn("embed_bn1")(w))
        n, h, wd = w.shape[0], w.shape[1], w.shape[2]
        mega = MEGA_FUSE and not training and self.impl != "identity"

        # (3) value
        v = Conv2d(dim, 1, dtype=self.dtype, name="conv1x1_conv")(x)
        v = bn("conv1x1_bn")(v)

        # (4) dynamic context: fused local aggregation
        if mega:
            # eval: embed_conv2 + GN + aggregation in one fused op — the
            # K^2*Cw weight tensor never reaches HBM on whole-image shapes
            w2, b2 = _Conv1x1Params(k2 * cw, dim // factor,
                                    name="embed_conv2")()
            gscale, gbias = SubChannelGroupNorm(
                k2=k2, cw=cw, name="embed_gn", raw=True)()
            y = local_aggregate_embed_gn(
                v, w, w2.reshape(dim // factor, k2 * cw), b2, gscale, gbias,
                kernel_size=ks, padding=(ks - 1) // 2, impl=self.impl)
        else:
            fold = _use_fold(training)
            pad = (ks - 1) // 2
            use_wt = (_lap.CHWN_W and not fold
                      and self.impl in ("auto", "pallas")
                      and chwn_wt_plan((n, h, wd, dim), (cw, k2, h, wd, n),
                                       jnp.dtype(v.dtype).itemsize,
                                       (pad, pad)) is not None)
            if use_wt:
                # CHWN-resident weights (COTNET_CHWN_W): transpose the
                # HALF-width embed activation once, emit embed_conv2 as a
                # channel-major matmul whose output layout IS the kernel's
                # [Cw, K2, H, W, N], normalize in that layout, and feed
                # agg_core_pallas_wt — the K2*Cw weight tensor (9/8 x the
                # activation) never pays a boundary transpose in either
                # direction.  Same params as the Conv2d/GN pair.
                import numpy as _np
                w2p, b2p = _Conv1x1Params(k2 * cw, dim // factor,
                                          name="embed_conv2")()
                # conv emits k-major channels (k*Cw + cw); the CHWN layout
                # wants cw-major — permute the weight COLUMNS instead (free)
                perm = _np.arange(k2 * cw).reshape(k2, cw).T.reshape(-1)
                wmat = w2p.reshape(dim // factor, k2 * cw)[:, perm].astype(
                    w.dtype)
                wt1 = jnp.transpose(w, (3, 1, 2, 0))        # [i, h, w, n]
                wt = jnp.einsum("io,ihwn->ohwn", wmat, wt1)
                wt = wt + b2p[perm][:, None, None, None].astype(wt.dtype)
                wt = wt.reshape(cw, k2, h, wd, n)
                wt = SubChannelGroupNorm(k2=k2, cw=cw, dtype=self.dtype,
                                         name="embed_gn", chwn=True)(wt)
                y = local_aggregate_wt(v, wt, kernel_size=ks, padding=pad)
            else:
                w = Conv2d(k2 * cw, 1, use_bias=True, dtype=self.dtype,
                           name="embed_conv2")(w)
                gn = SubChannelGroupNorm(k2=k2, cw=cw, dtype=self.dtype,
                                         name="embed_gn", fold=fold)
                if fold:
                    wsc, wbi = gn(w)  # [n,1,k2,cw] deferred-normalize affine
                else:
                    w = gn(w)
                    wsc = wbi = None
                wr = w.reshape(n, h, wd, 1, k2, cw)
                y = local_aggregate(v, wr, kernel_size=ks,
                                    padding=pad, impl=self.impl,
                                    w_scale=wsc, w_bias=wbi)
        y = swish(bn("bn")(y))

        # (5) radix-2 fusion of dynamic (y) and static (k) contexts
        attn_chs = max(dim * radix // 4, 32)
        gap = jnp.mean(y + k, axis=(1, 2))  # [N, dim]
        a = fnn.Dense(attn_chs, dtype=self.dtype, name="se_fc1")(gap)
        a = batch_norm(a, training, name="se_bn", dtype=self.dtype, axis_name=self.axis_name)
        a = relu(a)
        a = fnn.Dense(radix * dim, dtype=self.dtype, name="se_fc2")(a)
        a = jax.nn.softmax(a.reshape(n, dim, radix), axis=-1)
        out = (y * a[:, None, None, :, 0] + k * a[:, None, None, :, 1])
        return out


class CoXtLayer(fnn.Module):
    """Grouped (cardinality) CoT for CoTNeXt (reference cotnet.py:106-178):
    key_embed groups=8; the embed/value convs and the aggregation itself run
    in dw_group=2 channel groups."""

    dim: int
    kernel_size: int = 3
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        dim, ks = self.dim, self.kernel_size
        k2 = ks * ks
        dw_group = 2
        cw_total = dim // SHARE_PLANES     # total weight channels
        cw = cw_total // dw_group          # per group
        factor = 2
        radix = 2
        relu = get_act_fn("relu")
        swish = get_act_fn("swish")
        n, h, wd, _ = x.shape

        def bn(name):
            return lambda y, training=training: batch_norm(
                y, training, name=name, dtype=self.dtype,
                axis_name=self.axis_name)

        k = _key_embed_conv(dim, ks, 8, self.dtype)(x)
        k = relu(bn("key_embed_bn")(k))

        # interleaved [x_c, k_c] pairs (reference cotnet.py:153-154)
        qk = jnp.stack([x, k], axis=-1).reshape(n, h, wd, 2 * dim)
        w = Conv2d(dim // factor, 1, groups=dw_group, dtype=self.dtype,
                   name="embed_conv1")(qk)
        w = relu(bn("embed_bn1")(w))
        mega = MEGA_FUSE and not training and self.impl != "identity"
        if not mega:
            w = Conv2d(k2 * cw_total, 1, use_bias=True, groups=dw_group,
                       dtype=self.dtype, name="embed_conv2")(w)
            fold = _use_fold(training)
            gn = SubChannelGroupNorm(k2=k2, cw=cw_total, dw_groups=dw_group,
                                     dtype=self.dtype, name="embed_gn",
                                     fold=fold)
            if fold:
                ws, wb = gn(w)  # [n, dw_group, k2, cw] deferred affine
            else:
                w = gn(w)
                ws = wb = None

        v = Conv2d(dim, 1, groups=dw_group, dtype=self.dtype,
                   name="conv1x1_conv")(x)
        v = bn("conv1x1_bn")(v)

        # per-dw-group aggregation (reference reshapes batch*dw_group,
        # cotnet.py:157-162; channel-half split is equivalent and avoids the
        # batch transpose)
        outs = []
        gsz = dim // dw_group
        wsz = k2 * cw
        cp = (dim // factor) // dw_group
        if mega:
            # grouped fused-eval: the grouped conv2's kernel is
            # [1, 1, Cin/groups, F]; group g computes output slice g from
            # input slice g — hand each group's kernel/affine slice to the
            # fused op
            w2, b2 = _Conv1x1Params(k2 * cw_total, cp,
                                    name="embed_conv2")()
            gscale, gbias = SubChannelGroupNorm(
                k2=k2, cw=cw_total, dw_groups=dw_group, name="embed_gn",
                raw=True)()
            w2f = w2.reshape(cp, k2 * cw_total)
            for gi in range(dw_group):
                sl = slice(gi * wsz, (gi + 1) * wsz)
                outs.append(local_aggregate_embed_gn(
                    v[..., gi * gsz:(gi + 1) * gsz],
                    w[..., gi * cp:(gi + 1) * cp],
                    w2f[:, sl], b2[sl], gscale[sl], gbias[sl],
                    kernel_size=ks, padding=(ks - 1) // 2, impl=self.impl))
        else:
            for gi in range(dw_group):
                wg = w[..., gi * wsz:(gi + 1) * wsz].reshape(
                    n, h, wd, 1, k2, cw)
                vg = v[..., gi * gsz:(gi + 1) * gsz]
                outs.append(local_aggregate(
                    vg, wg, kernel_size=ks, padding=(ks - 1) // 2,
                    impl=self.impl,
                    w_scale=None if ws is None else ws[:, gi:gi + 1],
                    w_bias=None if wb is None else wb[:, gi:gi + 1]))
        y = jnp.concatenate(outs, axis=-1)
        y = swish(bn("bn")(y))

        attn_chs = max(dim * radix // 4, 32)
        gap = jnp.mean(y + k, axis=(1, 2))
        a = fnn.Dense(attn_chs, dtype=self.dtype, name="se_fc1")(gap)
        a = batch_norm(a, training, name="se_bn", dtype=self.dtype, axis_name=self.axis_name)
        a = relu(a)
        a = fnn.Dense(radix * dim, dtype=self.dtype, name="se_fc2")(a)
        a = jax.nn.softmax(a.reshape(n, dim, radix), axis=-1)
        return y * a[:, None, None, :, 0] + k * a[:, None, None, :, 1]


class CotBottleneck(fnn.Module):
    """ResNet bottleneck with the 3x3 conv replaced by CoT(Xt)Layer
    (reference cotnet.py:181-264); stride is an avg-pool *before* the CoT
    layer (:199-202, :237-238)."""

    expansion = 4

    planes: int
    stride: int = 1
    downsample: Optional[dict] = None
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None
    act: str = "relu"
    attn_layer: Optional[str] = None
    aa: bool = False
    drop_block: Optional[Tuple[float, int, float]] = None
    drop_path_rate: float = 0.0
    zero_init_last_bn: bool = True
    impl: str = "auto"
    dtype: Any = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, training: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64))
                    ) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * self.expansion
        act = get_act_fn(self.act)
        residual = x

        y = Conv2d(first_planes, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(y, training, name="bn1", dtype=self.dtype, axis_name=self.axis_name)
        y = self._maybe_drop_block(y, training)
        y = act(y)

        if self.stride > 1:
            y = avg_pool2d(y, 3, 2, padding=1)

        layer_cls = CotLayer if self.cardinality == 1 else CoXtLayer
        y = layer_cls(dim=width, kernel_size=3, impl=self.impl,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="conv2")(y, training=training)

        y = Conv2d(outplanes, 1, dtype=self.dtype, name="conv3")(y)
        bn3_scale = (fnn.initializers.zeros if self.zero_init_last_bn
                     else fnn.initializers.ones)
        y = batch_norm(y, training, name="bn3", dtype=self.dtype,
                       axis_name=self.axis_name, scale_init=bn3_scale)
        y = self._maybe_drop_block(y, training)

        attn = create_attn(self.attn_layer, outplanes, dtype=self.dtype,
                           name="se")
        if attn is not None:
            y = attn(y, training=training)
        if self.drop_path_rate > 0:
            y = DropPath(self.drop_path_rate, name="drop_path")(y, training)
        if self.downsample is not None:
            residual = Downsample(out_channels=outplanes, dtype=self.dtype,
                                  axis_name=self.axis_name, name="downsample",
                                  **self.downsample)(residual, training)
        return act(y + residual)

    def _maybe_drop_block(self, y, training):
        if self.drop_block is not None:
            rate, bs, gamma = self.drop_block
            return DropBlock2d(rate, bs, gamma)(y, training=training)
        return y


def _create_cotnet(model_name: str, pretrained: bool = False, **kwargs):
    return build_model_with_cfg(
        ResNet, model_name, default_cfgs.get(model_name, default_cfg()),
        pretrained=pretrained, **kwargs)


@register_model
def cotnet50(pretrained=False, **kwargs):
    return _create_cotnet("cotnet50", pretrained, block=CotBottleneck,
                          layers=(3, 4, 6, 3), **kwargs)


@register_model
def cotnext50_2x48d(pretrained=False, **kwargs):
    return _create_cotnet("cotnext50_2x48d", pretrained, block=CotBottleneck,
                          layers=(3, 4, 6, 3), cardinality=2, base_width=48,
                          **kwargs)


@register_model
def cotnet101(pretrained=False, **kwargs):
    return _create_cotnet("cotnet101", pretrained, block=CotBottleneck,
                          layers=(3, 4, 23, 3), **kwargs)


@register_model
def cotnext101_2x48d(pretrained=False, **kwargs):
    return _create_cotnet("cotnext101_2x48d", pretrained, block=CotBottleneck,
                          layers=(3, 4, 23, 3), cardinality=2, base_width=48,
                          **kwargs)
