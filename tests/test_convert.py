"""Checkpoint-converter parity tests.

Since the reference's CUDA kernels can't run here (no GPU/cupy), the oracle
is a fresh torch-CPU implementation of the CoT block written below from the
block's published math (grouped key embed -> attention embed w/ GroupNorm ->
1x1 value -> unfold-based local aggregation -> radix-2 SE fusion), using the
reference's *module naming* so its state_dict looks exactly like a published
checkpoint slice.  Converting that state_dict and comparing flax vs torch
outputs end-to-end validates every layout transform (OIHW->HWIO, the
cw-major->k-major attention-channel permutation, GroupNorm grouping, BN
stats, 1x1-conv->Dense).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cotnet_tpu.models.cotnet import CotLayer  # noqa: E402
from cotnet_tpu.utils.convert import (  # noqa: E402
    convert_torch_state_dict,
    load_torch_checkpoint,
)


class TorchCotOracle(nn.Module):
    """CoT block oracle on CPU (naming matches reference cotnet.py:36-104)."""

    def __init__(self, dim, ks=3):
        super().__init__()
        self.dim, self.ks = dim, ks
        share, factor, radix = 8, 2, 2
        self.key_embed = nn.Sequential(
            nn.Conv2d(dim, dim, ks, padding=ks // 2, groups=4, bias=False),
            nn.BatchNorm2d(dim), nn.ReLU())
        self.embed = nn.Sequential(
            nn.Conv2d(2 * dim, dim // factor, 1, bias=False),
            nn.BatchNorm2d(dim // factor), nn.ReLU(),
            nn.Conv2d(dim // factor, ks * ks * dim // share, 1),
            nn.GroupNorm(dim // share, ks * ks * dim // share))
        self.conv1x1 = nn.Sequential(
            nn.Conv2d(dim, dim, 1, bias=False), nn.BatchNorm2d(dim))
        self.bn = nn.BatchNorm2d(dim)
        attn_chs = max(dim * radix // 4, 32)
        self.se = nn.Sequential(
            nn.Conv2d(dim, attn_chs, 1), nn.BatchNorm2d(attn_chs), nn.ReLU(),
            nn.Conv2d(attn_chs, radix * dim, 1))

    def forward(self, x):
        dim, ks = self.dim, self.ks
        cw = dim // 8
        k = self.key_embed(x)
        w = self.embed(torch.cat([x, k], dim=1))
        b, _, hh, ww = w.shape
        w = w.view(b, 1, cw, ks * ks, hh, ww)

        v = self.conv1x1(x)
        # unfold-based local aggregation (the reference's oracle form)
        patches = F.unfold(v, ks, padding=ks // 2).view(
            b, dim // cw, cw, ks * ks, hh, ww)
        y = (w.unsqueeze(2) * patches.unsqueeze(1)).sum(-3).view(b, dim, hh, ww)
        y = self.bn(y)
        y = y * torch.sigmoid(y)  # swish

        gap = (y + k).mean((2, 3), keepdim=True)
        a = self.se(gap).view(b, dim, 2)
        a = F.softmax(a, dim=2)
        return y * a[:, :, 0, None, None] + k * a[:, :, 1, None, None]


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(*m.running_mean.shape), dtype=torch.float32) * 0.1)
            m.running_var.copy_(torch.tensor(
                rng.rand(*m.running_var.shape) + 0.5, dtype=torch.float32))


def test_cot_layer_conversion_parity():
    dim = 32
    rng = np.random.RandomState(0)
    oracle = TorchCotOracle(dim)
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    oracle.eval()

    x = rng.randn(2, dim, 9, 9).astype(np.float32)
    with torch.no_grad():
        y_t = oracle(torch.tensor(x)).numpy()  # NCHW

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = CotLayer(dim=dim, kernel_size=3)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x_nhwc)
    variables = convert_torch_state_dict(sd, shapes, strict=True)
    y_j = model.apply(variables, x_nhwc, training=False)
    y_j_nchw = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j_nchw, y_t, rtol=2e-4, atol=2e-4)


def test_resnet_block_conversion_parity():
    """Classic bottleneck (conv/bn/SE/downsample) torch -> flax parity."""
    import cotnet_tpu.models.resnet as R

    planes, inplanes = 16, 32

    class TorchBottleneck(nn.Module):
        def __init__(self):
            super().__init__()
            width = planes
            out = planes * 4
            self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=2, padding=1,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, out, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out)
            self.se = nn.Module()
            self.se.fc1 = nn.Conv2d(out, max(out // 16, 8), 1)
            self.se.fc2 = nn.Conv2d(max(out // 16, 8), out, 1)
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride=2, bias=False),
                nn.BatchNorm2d(out))

        def forward(self, x):
            r = x
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            s = y.mean((2, 3), keepdim=True)
            s = self.se.fc2(F.relu(self.se.fc1(s)))
            y = y * torch.sigmoid(s)
            return F.relu(y + self.downsample(r))

    rng = np.random.RandomState(1)
    t = TorchBottleneck()
    with torch.no_grad():
        _randomize_bn_stats(t, rng)
    t.eval()
    x = rng.randn(2, inplanes, 8, 8).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    block = R.Bottleneck(planes=planes, stride=2,
                         downsample=dict(stride=2, avg=False),
                         attn_layer="se", zero_init_last_bn=False)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    shapes = jax.eval_shape(
        lambda r, x: block.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x_nhwc)
    variables = convert_torch_state_dict(sd, shapes, strict=True)
    y_j = block.apply(variables, x_nhwc, training=False)
    y_j_nchw = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j_nchw, y_t, rtol=2e-4, atol=2e-4)


def test_load_torch_checkpoint_conventions(tmp_path):
    """'module.' strip + state_dict / state_dict_ema selection
    (helpers.py:23-43)."""
    sd = {"module.w": torch.ones(2), "module.b": torch.zeros(3)}
    ema = {"module.w": torch.full((2,), 2.0), "module.b": torch.ones(3)}
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"state_dict": sd, "state_dict_ema": ema, "epoch": 7}, path)
    plain = load_torch_checkpoint(path)
    assert set(plain) == {"w", "b"} and plain["w"][0] == 1.0
    emad = load_torch_checkpoint(path, use_ema=True)
    assert emad["w"][0] == 2.0


class TorchCoXtOracle(nn.Module):
    """Grouped CoT block oracle (reference cotnet.py:106-178 naming/math):
    dw_group=2 grouped embeds, interleaved [x;k] pairs, per-group local
    aggregation."""

    def __init__(self, dim, ks=3):
        super().__init__()
        self.dim, self.ks = dim, ks
        share, factor, radix, dwg = 8, 2, 2, 2
        self.dwg = dwg
        self.key_embed = nn.Sequential(
            nn.Conv2d(dim, dim, ks, padding=ks // 2, groups=8, bias=False),
            nn.BatchNorm2d(dim), nn.ReLU())
        self.embed = nn.Sequential(
            nn.Conv2d(2 * dim, dim // factor, 1, groups=dwg, bias=False),
            nn.BatchNorm2d(dim // factor), nn.ReLU(),
            nn.Conv2d(dim // factor, ks * ks * dim // share, 1, groups=dwg),
            nn.GroupNorm(dim // share, ks * ks * dim // share))
        self.conv1x1 = nn.Sequential(
            nn.Conv2d(dim, dim, 1, groups=dwg, bias=False),
            nn.BatchNorm2d(dim))
        self.bn = nn.BatchNorm2d(dim)
        attn_chs = max(dim * radix // 4, 32)
        self.se = nn.Sequential(
            nn.Conv2d(dim, attn_chs, 1), nn.BatchNorm2d(attn_chs), nn.ReLU(),
            nn.Conv2d(attn_chs, radix * dim, 1))

    def forward(self, x):
        dim, ks, dwg = self.dim, self.ks, self.dwg
        b, _, hh, ww = x.shape
        cw = dim // 8
        k = self.key_embed(x)
        qk = torch.cat([x.unsqueeze(2), k.unsqueeze(2)], dim=2).view(
            b, 2 * dim, hh, ww)
        w = self.embed(qk)
        w = w.view(b * dwg, 1, cw // dwg, ks * ks, hh, ww)

        v = self.conv1x1(x).view(b * dwg, dim // dwg, hh, ww)
        patches = F.unfold(v, ks, padding=ks // 2).view(
            b * dwg, (dim // dwg) // (cw // dwg), cw // dwg, ks * ks, hh, ww)
        y = (w.unsqueeze(2) * patches.unsqueeze(1)).sum(-3).view(
            b, dim, hh, ww)
        y = self.bn(y)
        y = y * torch.sigmoid(y)

        gap = (y + k).mean((2, 3), keepdim=True)
        a = self.se(gap).view(b, dim, 2)
        a = F.softmax(a, dim=2)
        return y * a[:, :, 0, None, None] + k * a[:, :, 1, None, None]


def test_coxt_layer_conversion_parity():
    """dw_group=2 path: grouped convs + per-group k-major permutation."""
    from cotnet_tpu.models.cotnet import CoXtLayer

    dim = 32
    rng = np.random.RandomState(7)
    oracle = TorchCoXtOracle(dim)
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    oracle.eval()
    x = rng.randn(2, dim, 9, 9).astype(np.float32)
    with torch.no_grad():
        y_t = oracle(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = CoXtLayer(dim=dim, kernel_size=3)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x_nhwc)
    variables = convert_torch_state_dict(sd, shapes, dw_group=2, strict=True)
    y_j = model.apply(variables, x_nhwc, training=False)
    y_j_nchw = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(y_j_nchw, y_t, rtol=2e-4, atol=2e-4)


def test_split_attn_conversion_parity():
    """SplitAttnConv2d radix=1 (the 'SE' of SE-CoTNetD,
    split_attn.py:31-88) torch -> flax parity."""
    from cotnet_tpu.nn import SplitAttnConv2d

    in_ch, out_ch = 16, 24

    class TorchSplitAttn(nn.Module):
        def __init__(self, radix=1):
            super().__init__()
            self.radix = radix
            mid = out_ch * radix
            attn = max(in_ch * radix // 4, 32)
            self.conv = nn.Conv2d(in_ch, mid, 3, padding=1, groups=radix,
                                  bias=False)
            self.bn0 = nn.BatchNorm2d(mid)
            self.fc1 = nn.Conv2d(out_ch, attn, 1)
            self.bn1 = nn.BatchNorm2d(attn)
            self.fc2 = nn.Conv2d(attn, mid, 1)

        def forward(self, x):
            x = F.silu(self.bn0(self.conv(x)))  # act swish
            gap = x.mean((2, 3), keepdim=True)
            gap = F.silu(self.bn1(self.fc1(gap)))
            attn = torch.sigmoid(self.fc2(gap))
            return x * attn

    rng = np.random.RandomState(11)
    t = TorchSplitAttn()
    with torch.no_grad():
        _randomize_bn_stats(t, rng)
    t.eval()
    x = rng.randn(2, in_ch, 8, 8).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    mod = SplitAttnConv2d(out_channels=out_ch, kernel_size=3, padding=1,
                          radix=1, act="swish")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    shapes = jax.eval_shape(
        lambda r, x: mod.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x_nhwc)
    variables = convert_torch_state_dict(sd, shapes, strict=True)
    y_j = mod.apply(variables, x_nhwc, training=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
                               y_t, rtol=2e-4, atol=2e-4)


def test_input_conv_and_classifier_surgery():
    """in_chans adaptation + classifier mismatch handling
    (reference load_pretrained surgery, helpers.py:91-153)."""
    from cotnet_tpu.utils.convert import adapt_input_conv, surgery

    k = np.random.RandomState(0).randn(7, 7, 3, 8).astype(np.float32)
    k1 = adapt_input_conv(k, 1)
    np.testing.assert_allclose(k1[..., 0, :], k.sum(2), rtol=1e-6)
    k4 = adapt_input_conv(k, 4)
    assert k4.shape == (7, 7, 4, 8)
    # tiled channels carry the 3/4 rescale
    np.testing.assert_allclose(k4[..., 0, :], k[..., 0, :] * 0.75, rtol=1e-6)

    variables = {"params": {"conv1": {"kernel": k},
                            "head": {"fc": {"kernel": np.ones((8, 1000)),
                                            "bias": np.zeros(1000)}}},
                 "batch_stats": {}}
    shapes = {"params": {"conv1": {"kernel": np.zeros((7, 7, 1, 8))},
                         "head": {"fc": {"kernel": np.zeros((8, 10)),
                                         "bias": np.zeros(10)}}}}
    out = surgery(variables, shapes)
    assert out["params"]["conv1"]["kernel"].shape == (7, 7, 1, 8)
    # mismatched classifier dropped (fresh init kept by the caller)
    assert "kernel" not in out["params"].get("head", {}).get("fc", {})


class TorchSelfAttOracle(nn.Module):
    """LR-Net SelfAttLayer oracle (reference lr_net.py:39-100 naming/math)."""

    def __init__(self, dim, ks=3):
        super().__init__()
        self.dim, self.ks = dim, ks
        self.head_num = dim // 8
        self.conv_q = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                                    nn.BatchNorm2d(dim), nn.ReLU())
        self.conv_k = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                                    nn.BatchNorm2d(dim), nn.ReLU())
        self.conv_v = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                                    nn.BatchNorm2d(dim))
        self.pos_h = nn.Parameter(torch.randn(dim, ks, 1))
        self.pos_w = nn.Parameter(torch.randn(dim, 1, ks))
        self.bn = nn.BatchNorm2d(dim)

    def forward(self, x):
        B, C, H, W = x.shape
        ks, hn = self.ks, self.head_num
        q, k, v = self.conv_q(x), self.conv_k(x), self.conv_v(x)
        unfold_k = F.unfold(k, ks, 1, ks // 2).view(B, -1, ks * ks, H, W)
        pos = (self.pos_h + self.pos_w).view(1, -1, ks * ks, 1, 1)
        kp = unfold_k + pos
        qv = q.view(B, hn, -1, 1, H, W)
        kpv = kp.view(B, hn, -1, ks * ks, H, W)
        attn = F.softmax((qv * kpv).sum(2), dim=2)
        w = attn.view(B, 1, -1, ks * ks, H, W)
        patches = F.unfold(v, ks, 1, ks // 2).view(
            B, C // hn, hn, ks * ks, H, W)
        y = (w.unsqueeze(2) * patches.unsqueeze(1)).sum(-3).view(B, C, H, W)
        return F.relu(self.bn(y))


def test_lrnet_selfatt_conversion_parity():
    from cotnet_tpu.models.lr_net import SelfAttLayer

    dim = 16
    rng = np.random.RandomState(3)
    t = TorchSelfAttOracle(dim)
    with torch.no_grad():
        _randomize_bn_stats(t, rng)
    t.eval()
    x = rng.randn(2, dim, 7, 7).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    # flax names conv_q/bn_q etc. map to torch Sequential indices
    remap = {}
    for base in ("q", "k", "v"):
        remap[f"conv_{base}.weight"] = sd.pop(f"conv_{base}.0.weight")
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            key = f"conv_{base}.1.{leaf}"
            if key in sd:
                remap[f"bn_{base}.{leaf}"] = sd.pop(key)
    sd.update(remap)

    mod = SelfAttLayer(dim=dim, kernel_size=3, key_ks=1)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    shapes = jax.eval_shape(
        lambda r, x: mod.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x_nhwc)
    variables = convert_torch_state_dict(sd, shapes, strict=True)
    y_j = mod.apply(variables, x_nhwc, training=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
                               y_t, rtol=5e-4, atol=5e-4)


def test_model_avg_down_names():
    """avg_down derivation: cardinality suffixes like 2x48d are NOT ResNet-D
    markers (reference CoTNeXt uses the plain conv downsample)."""
    from cotnet_tpu.utils.convert import model_avg_down

    assert not model_avg_down("cotnet50")
    assert not model_avg_down("cotnext50_2x48d")
    assert not model_avg_down("cotnext101_2x48d")
    assert model_avg_down("se_cotnetd_50")
    assert model_avg_down("se_cotnetd_152")
    assert model_avg_down("resnet50d")
