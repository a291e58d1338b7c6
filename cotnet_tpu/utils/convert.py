"""PyTorch .pth(.tar) checkpoint -> flax variables converter.

Covers the reference's published checkpoints (CoTNet/CoTNeXt/SE-CoTNetD on
the timm ResNet chassis) and the reference's own load conventions
(models/helpers.py:23-43: 'module.' prefix strip, EMA key select
'state_dict_ema').

Layout transforms:
- conv OIHW -> HWIO; linear [O,I] -> [I,O]; 1x1-conv-as-linear squeeze+T;
- BatchNorm weight/bias -> scale/bias, running stats -> batch_stats;
- the CoT attention-embed producer (embed.3 conv + embed.4 GroupNorm):
  output channels are permuted cw-major -> k-major to match the TPU weight
  layout (see ops/local_agg.py docstring), per dw_group for CoXt.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# flax stem names for the deep (3-conv) stem -> torch Sequential indices
_DEEP_STEM = {"conv1_0": "conv1.0", "bn1_0": "conv1.1",
              "conv1_1": "conv1.3", "bn1_1": "conv1.4",
              "conv1_2": "conv1.6"}

# CotLayer submodule names -> torch Sequential paths (models/cotnet.py:43-77)
_COT = {"key_embed_conv": "key_embed.0", "key_embed_bn": "key_embed.1",
        "embed_conv1": "embed.0", "embed_bn1": "embed.1",
        "embed_conv2": "embed.3", "embed_gn": "embed.4",
        "conv1x1_conv": "conv1x1.0", "conv1x1_bn": "conv1x1.1",
        "bn": "bn", "se_fc1": "se.0", "se_bn": "se.1", "se_fc2": "se.3"}

# SEModule / SplitAttn children (fc1, fc2, bn0, bn1, conv, ...) pass through
# unchanged — their flax names match the torch attribute names.


def load_torch_checkpoint(path: str, use_ema: bool = False) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into {name: ndarray}, handling the
    reference's dict layout + 'module.' strip (helpers.py:23-43)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict) and not hasattr(ckpt, "keys"):
        sd = ckpt
    if isinstance(ckpt, dict):
        key = "state_dict_ema" if use_ema and "state_dict_ema" in ckpt else (
            "state_dict" if "state_dict" in ckpt else None)
        if key is not None:
            sd = ckpt[key]
        elif "model" in ckpt:
            sd = ckpt["model"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _kmajor_perm(n: int, k2: int, groups: int = 1) -> np.ndarray:
    """Channel permutation cw-major -> k-major, per group.

    torch channel (within group) = cw * k2 + k; ours = k * cw_g + cw."""
    per = n // groups
    cw_g = per // k2
    perm = []
    for g in range(groups):
        base = g * per
        for k in range(k2):
            for cw in range(cw_g):
                perm.append(base + cw * k2 + k)
    return np.asarray(perm)


# per-family renames on top of the generic rules; selected by model name in
# convert_torch_checkpoint (reference families use different SE attribute
# names: models/layers/se.py fc1/fc2 vs efficientnet_blocks.py:105-120
# conv_reduce/conv_expand; ViT's patch embed is a proj inside a module)
_EFFNET_SE = {("se", "fc1"): "se.conv_reduce", ("se", "fc2"): "se.conv_expand"}
_VIT_RENAMES = {"patch_embed": "patch_embed.proj"}


def _rexnet_infer(sd, adapter):
    """rexnet's trailing ConvBnAct lives at features.<num_blocks>; infer the
    index from the state_dict (varies with depth multiplier)."""
    idxs = [int(m.group(1)) for k in sd
            for m in [re.match(r"features\.(\d+)\.", k)] if m]
    head = max(idxs) if idxs else 0
    nm = dict(adapter.get("name_map", {}))
    nm["head_conv"] = f"features.{head}.conv"
    nm["head_bn"] = f"features.{head}.bn"
    return {**adapter, "name_map": nm}


def _tnt_fuse_qkv(sd):
    """TNT's Attention keeps qk fused and v separate (reference tnt.py:55-56);
    ours is one fused qkv Dense.  Synthesize the fused weight rows [q; k; v]
    (qkv_bias=False throughout TNT, so only weights)."""
    sd = dict(sd)
    for k in list(sd):
        m = re.match(r"(.*\.attn_(?:in|out))\.qk\.weight$", k)
        if m:
            base = m.group(1)
            sd[f"{base}.qkv.weight"] = np.concatenate(
                [np.asarray(sd[k]), np.asarray(sd[f"{base}.v.weight"])], 0)
    return sd


def _levit_infer(sd, adapter):
    """LeViT's reference stores stages as one flat nn.Sequential of
    Residual-wrapped modules (reference levit.py:454-490); reconstruct the
    flat index for our (stage, block) naming by classifying each entry:
    AttentionSubsample carries bare ``kv.``, Residual(Attention) carries
    ``.m.qkv``, Residual(Sequential mlp) carries ``.m.0.``."""
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(r"blocks\.(\d+)\.", k)] if m})
    kind = {}
    for i in idxs:
        pre = f"blocks.{i}."
        keys = [k for k in sd if k.startswith(pre)]
        if any(".m.qkv." in k for k in keys):
            kind[i] = "attn"
        elif any(k.startswith(pre + "kv.") for k in keys):
            kind[i] = "sub"
        else:
            kind[i] = "mlp"
    nm = dict(adapter.get("name_map", {}))
    si = bi = 0
    prev = None
    for i in idxs:
        k = kind[i]
        if k == "attn":
            nm[f"attn_{si}_{bi}"] = f"blocks.{i}.m"
        elif k == "sub":
            nm[f"downsample_{si}"] = f"blocks.{i}"
        elif prev == "sub":
            nm[f"ds_mlp_{si}"] = f"blocks.{i}.m"
            si += 1
            bi = 0
        else:
            nm[f"mlp_{si}_{bi}"] = f"blocks.{i}.m"
            bi += 1
        prev = k
    return {**adapter, "name_map": nm}


def _xception_infer(sd, adapter):
    """Xception blocks store [relu?, SeparableConv2d, BN, ...] in one
    ``rep`` Sequential whose indices shift with the leading-relu choice
    (reference xception.py Block); locate each SeparableConv2d by its
    ``conv1.weight`` key and map our sep{k} (dw/pw/bn) onto it."""
    rules = list(adapter.get("post_regex_map", ()))
    blocks = sorted({m.group(1) for k in sd
                     for m in [re.match(r"(block\d+)\.", k)] if m},
                    key=lambda s: int(s[5:]))
    for b in blocks:
        seps = sorted({int(m.group(1)) for k in sd
                       for m in [re.match(rf"{b}\.rep\.(\d+)\.conv1\.weight$",
                                          k)] if m})
        for k_i, p in enumerate(seps):
            rules += [(rf"^{b}\.sep{k_i}\.dw$", f"{b}.rep.{p}.conv1"),
                      (rf"^{b}\.sep{k_i}\.pw$", f"{b}.rep.{p}.pointwise"),
                      (rf"^{b}\.sep{k_i}\.bn$", f"{b}.rep.{p + 1}")]
    return {**adapter, "post_regex_map": rules}


def _san_wperm(val, path):
    """san full-rank SAM conv_w producer: torch lays the K^2 weight out
    cw-major (w.view(b, cw, k2, ...), san_lowrank.py:56-57); ours is
    k-major.  cw = mid_planes // share_planes, fixed per SAN stage."""
    m = re.search(r"layer(\d)_", path)
    cw = (2, 8, 16, 32, 64)[int(m.group(1))]
    n = val.shape[-1]
    return val[..., _kmajor_perm(n, n // cw)]


def _stage_block_renumber(m):
    """our 1-based stage{S}_block{B} -> torch 0-based stages.{s}.blocks.{b}"""
    return f"stages.{int(m.group(1)) - 1}.blocks.{int(m.group(2)) - 1}"


def _swin_merge_perm(val: np.ndarray) -> np.ndarray:
    """PatchMerging channel-group reorder.  Torch concats (x0,x1,x2,x3) =
    ((even,even),(odd,even),(even,odd),(odd,odd)); our reshape produces
    (h-parity, w-parity) raster order — groups 1 and 2 swap.  Applies to
    the merge norm params (axis 0, 4c) and the reduction matrix rows."""
    c = val.shape[0] // 4
    perm = np.concatenate([np.arange(c) + g * c for g in (0, 2, 1, 3)])
    return val[perm]


FAMILY_ADAPTERS = {
    # conv_{i} children are MixedConv2d's per-kernel-size splits — torch's
    # MixedConv registers them by bare index (mixed_conv2d.py add_module)
    "efficientnet": dict(pair_map=_EFFNET_SE,
                         regex_map=[(r"^conv_(\d+)$", r"\1")]),
    "vit": dict(name_map=_VIT_RENAMES),
    "swin": dict(
        name_map={"patch_embed": "patch_embed.proj",
                  "patch_norm": "patch_embed.norm"},
        regex_map=[(r"^layers_(\d+)_(\d+)$", r"layers.\1.blocks.\2"),
                   # our merge_norm{s} precedes stage s; the reference's
                   # PatchMerging closes stage s-1 (layers.{s-1}.downsample)
                   (r"^merge_norm1$", "layers.0.downsample.norm"),
                   (r"^merge_norm2$", "layers.1.downsample.norm"),
                   (r"^merge_norm3$", "layers.2.downsample.norm"),
                   (r"^merge_reduction1$", "layers.0.downsample.reduction"),
                   (r"^merge_reduction2$", "layers.1.downsample.reduction"),
                   (r"^merge_reduction3$", "layers.2.downsample.reduction")],
        value_regex_map=[
            (r"merge_(norm|reduction)\d+/(scale|bias|kernel)$",
             _swin_merge_perm)]),
    "tnt": dict(
        name_map={"pixel_embed": "pixel_embed.proj", "proj_embed": "proj"},
        value_regex_map=[
            # reference pixel_pos is (1, C, ph, pw); ours is token-major
            # (1, ph*pw, C)
            (r"^pixel_pos$", lambda v: np.transpose(v, (0, 2, 3, 1)).reshape(
                1, -1, v.shape[1]))],
        prepare_sd=_tnt_fuse_qkv),
    "twins": dict(
        name_map={"sr_norm": "norm"},
        regex_map=[(r"^patch_embed(\d+)$", r"patch_embeds.\1.proj"),
                   (r"^embed_norm(\d+)$", r"patch_embeds.\1.norm"),
                   # PEG PosConv wraps its dw-conv in Sequential(proj)
                   (r"^pos_block(\d+)$", r"pos_block.\1.proj.0")]),
    "san": dict(
        # full-rank SAM's conv_w Sequential is [bn, relu, conv, bn, relu,
        # conv] (san_lowrank.py:40-43); SAM_lowRank's key_embed/conv_w are
        # [bn, relu, conv] with a 1-entry conv Sequential
        name_map={"conv_w_bn1": "conv_w.0", "conv_w_conv1": "conv_w.2",
                  "conv_w_bn2": "conv_w.3", "conv_w_conv2": "conv_w.5",
                  "key_embed_bn": "key_embed.0",
                  "key_embed_conv": "key_embed.2",
                  "conv_w_bn": "conv_w.0", "conv_w_conv": "conv_w.2"},
        pair_map={("sam", "conv"): "sam.conv.0"},
        value_regex_map=[
            # the K^2 weight producer is cw-major in torch, k-major here
            (r"conv_w_conv2/(kernel|bias)$", _san_wperm)]),
    "botnet": dict(
        # MHSA/plain-conv conv2 is a Sequential [module, bn, act]
        # (reference botnet.py:225-245); GroupPointWise stores its projection
        # as a raw .w parameter
        name_map={"mhsa": "conv2.0", "conv2": "conv2.0", "bn2": "conv2.1"},
        leaf_regex_map=[(r"^([qkv]_proj)$", r"\1.w")]),
    "lambdanet": dict(
        name_map={"to_q": "to_q.0", "bn_q": "to_q.1",
                  "to_v": "to_v.0", "bn_v": "to_v.1"},
        value_regex_map=[
            # reference embeddings are (dim_k, 1, 1, r, r) for conv3d
            (r"embeddings$", lambda v: v.reshape(v.shape[0], *v.shape[-2:]))]),
    "resnet_dw": dict(
        # conv2 Sequential: [pw, bn, act, dw] (reference resnet_dw.py:58-64)
        name_map={"conv2_pw": "conv2.0", "conv2_bn": "conv2.1",
                  "conv2_dw": "conv2.3"}),
    "psresnet": dict(
        # PSConv's masked dense conv is a raw HWIO param on our side
        # (models/psresnet.py conv_kernel); torch stores it at .conv.weight
        leaf_regex_map=[(r"^conv_kernel$", "conv.weight")],
        value_regex_map=[(r"conv_kernel$",
                          lambda v: np.transpose(v, (2, 3, 1, 0)))]),
    "sknet": dict(
        # SelectiveKernelConv: our flat fc_reduce/bn/fc_select live under
        # torch's nested .attn; our per-path convs under .paths
        pair_map={("conv1", "fc_reduce"): "conv1.attn.fc_reduce",
                  ("conv1", "bn"): "conv1.attn.bn",
                  ("conv1", "fc_select"): "conv1.attn.fc_select",
                  ("conv2", "fc_reduce"): "conv2.attn.fc_reduce",
                  ("conv2", "bn"): "conv2.attn.bn",
                  ("conv2", "fc_select"): "conv2.attn.fc_select"},
        regex_map=[(r"^path_(\d+)$", r"paths.\1")],
        # timm sknet wraps plain convs in ConvBnAct (conv{i}.conv/.bn);
        # terminal conv{i}/bn{i} only occur for those (SK convs nest deeper)
        post_regex_map=[(r"(layer\d+\.\d+\.)conv(\d)$", r"\1conv\2.conv"),
                        (r"(layer\d+\.\d+\.)bn(\d)$", r"\1conv\2.bn")]),
    "resnetv2": dict(
        name_map={"stem_conv": "stem.conv", "fc": "head.fc"},
        pair_map={("c1", "conv"): "conv1", ("c1", "norm"): "norm1",
                  ("c2", "conv"): "conv2", ("c2", "norm"): "norm2",
                  ("c3", "conv"): "conv3", ("c3", "norm"): "norm3",
                  ("stem_c", "conv"): "stem.conv",
                  ("stem_c", "norm"): "stem.norm",
                  ("downsample", "conv"): "downsample.conv",
                  ("downsample", "norm"): "downsample.norm"},
        regex_map=[(r"^stage(\d+)_block(\d+)$", _stage_block_renumber)],
        post_regex_map=[(r"downsample$", "downsample.conv")]),
    "vit_hybrid": dict(
        # HybridEmbed nests the CNN under patch_embed.backbone and projects
        # with patch_embed.proj (reference vision_transformer_hybrid.py:100-142)
        name_map={"backbone": "patch_embed.backbone",
                  "patch_embed": "patch_embed.proj"},
        pair_map={("c1", "conv"): "conv1", ("c1", "norm"): "norm1",
                  ("c2", "conv"): "conv2", ("c2", "norm"): "norm2",
                  ("c3", "conv"): "conv3", ("c3", "norm"): "norm3",
                  ("stem_c", "conv"): "stem.conv",
                  ("stem_c", "norm"): "stem.norm",
                  ("downsample", "conv"): "downsample.conv",
                  ("downsample", "norm"): "downsample.norm"},
        regex_map=[(r"^stage(\d+)_block(\d+)$", _stage_block_renumber)],
        post_regex_map=[(r"downsample$", "downsample.conv")],
        infer=lambda sd, ad: (
            # stem-only backbone (R+Ti): create_resnetv2_stem flattens to
            # backbone.conv / backbone.norm with no 'stem.' prefix
            {**ad, "pair_map": {**ad["pair_map"],
                                ("stem_c", "conv"): "conv",
                                ("stem_c", "norm"): "norm"}}
            if not any(".backbone.stem." in k for k in sd) else ad)),
    "xception": dict(
        name_map={"skip_conv": "skip", "skip_bn": "skipbn"},
        post_regex_map=[(r"^conv3\.dw$", "conv3.conv1"),
                        (r"^conv3\.pw$", "conv3.pointwise"),
                        (r"^conv3\.bn$", "bn3"),
                        (r"^conv4\.dw$", "conv4.conv1"),
                        (r"^conv4\.pw$", "conv4.pointwise"),
                        (r"^conv4\.bn$", "bn4")],
        infer=_xception_infer),
    "coat": dict(
        regex_map=[(r"^patch_embed(\d)$", r"patch_embed\1.proj"),
                   (r"^embed_norm(\d)$", r"patch_embed\1.norm"),
                   (r"^serial_blocks(\d)_(\d+)$", r"serial_blocks\1.\2"),
                   (r"^parallel_blocks_(\d+)$", r"parallel_blocks.\1"),
                   # ConvRelPosEnc per-window dw convs live in a ModuleList
                   (r"^conv(\d)$", r"conv_list.\1"),
                   # lite (serial-only) final cls norm: reference always
                   # names it norm4 (coat.py:440)
                   (r"^norm$", "norm4")],
        # ParallelBlock shares one Mlp across scales; torch aliases it as
        # mlp2/mlp3/mlp4 in the state_dict — fetch the mlp2 copy
        post_regex_map=[(r"^(parallel_blocks\.\d+)\.mlp\b", r"\1.mlp2")]),
    "levit": dict(
        name_map={"linear": "c", "fc1": "0", "fc2": "2",
                  "proj": "proj.1", "q": "q.1",
                  "stem0": "patch_embed.0.c", "stem_bn0": "patch_embed.0.bn",
                  "stem1": "patch_embed.2.c", "stem_bn1": "patch_embed.2.bn",
                  "stem2": "patch_embed.4.c", "stem_bn2": "patch_embed.4.bn",
                  "stem3": "patch_embed.6.c", "stem_bn3": "patch_embed.6.bn",
                  "head_bn": "head.bn", "head": "head.l",
                  "head_dist": "head_dist.l"},
        infer=_levit_infer),
    "visformer": dict(
        name_map={"stem_conv": "stem.0", "stem_bn": "stem.1"},
        regex_map=[(r"^patch_embed(\d)$", r"patch_embed\1.proj"),
                   (r"^embed_norm(\d)$", r"patch_embed\1.norm"),
                   (r"^stage(\d)_(\d+)$", r"stage\1.\2")],
        value_regex_map=[
            # reference pos_embed{1,2,3} are (1, C, H, W); ours NHWC
            (r"^pos_embed\d$", lambda v: np.transpose(v, (0, 2, 3, 1)))]),
    "xcit": dict(
        name_map={"pos_proj": "pos_embed.token_projection"},
        regex_map=[(r"^patch_conv0$", "patch_embed.proj.0.0"),
                   (r"^patch_bn0$", "patch_embed.proj.0.1"),
                   (r"^patch_conv1$", "patch_embed.proj.2.0"),
                   (r"^patch_bn1$", "patch_embed.proj.2.1"),
                   (r"^patch_conv2$", "patch_embed.proj.4.0"),
                   (r"^patch_bn2$", "patch_embed.proj.4.1"),
                   (r"^patch_conv3$", "patch_embed.proj.6.0"),
                   (r"^patch_bn3$", "patch_embed.proj.6.1"),
                   (r"^cls_attn_(\d+)$", r"cls_attn_blocks.\1.attn"),
                   (r"^ca_norm(\d+)$", r"cls_attn_blocks.\1.norm1"),
                   (r"^ca_norm_mlp(\d+)$", r"cls_attn_blocks.\1.norm2"),
                   (r"^ca_mlp(\d+)$", r"cls_attn_blocks.\1.mlp")],
        # class-attention LayerScale gammas live at our top level
        leaf_regex_map=[(r"^ca_gamma([12])_(\d+)$",
                         r"cls_attn_blocks.\2.gamma\1")]),
    "cait": dict(
        name_map=dict(_VIT_RENAMES),
        regex_map=[(r"^blocks_token_only_(\d+)$", r"blocks_token_only.\1")]),
    "pit": dict(
        name_map={"patch_embed": "patch_embed.conv"},
        regex_map=[(r"^transformers_(\d+)_blocks_(\d+)$",
                    r"transformers.\1.blocks.\2"),
                   # our pool{s} opens stage s; the reference's
                   # ConvHeadPooling closes stage s-1
                   (r"^pool1_(conv|fc)$", r"transformers.0.pool.\1"),
                   (r"^pool2_(conv|fc)$", r"transformers.1.pool.\1"),
                   (r"^pool3_(conv|fc)$", r"transformers.2.pool.\1")],
        value_regex_map=[
            # reference pos_embed is (1, C, H, W); ours is NHWC
            (r"^pos_embed$", lambda v: np.transpose(v, (0, 2, 3, 1)))]),
    "res2net": dict(
        regex_map=[(r"^bns_(\d+)$", r"bns.\1"),
                   (r"^convs_(\d+)$", r"convs.\1")]),
    "regnet": dict(
        name_map={"fc": "head.fc", "stem_conv": "stem.conv",
                  "stem_bn": "stem.bn", "downsample_conv": "downsample.conv",
                  "downsample_bn": "downsample.bn"},
        regex_map=[(r"^s(\d+)_b(\d+)$", r"s\1.b\2"),
                   (r"^conv(\d)$", r"conv\1.conv"),
                   (r"^bn(\d)$", r"conv\1.bn")]),
    "densenet": dict(
        regex_map=[(r"^denseblock(\d+)_layer(\d+)$",
                    r"features.denseblock\1.denselayer\2"),
                   (r"^transition(\d+)_(conv|norm)$",
                    r"features.transition\1.\2")],
        top_regex_map=[(r"^(conv|norm)(\d+)$", r"features.\1\2")]),
    "rexnet": dict(
        name_map={"fc": "head.fc", "stem_conv": "stem.conv",
                  "stem_bn": "stem.bn"},
        regex_map=[(r"^block_(\d+)$", r"features.\1"),
                   (r"^conv_(exp|dw|pwl)$", r"conv_\1.conv"),
                   (r"^bn_(exp|dw|pwl)$", r"conv_\1.bn")],
        infer=_rexnet_infer),
}

_BLOCKS_RE = re.compile(r"^blocks_(\d+)(?:_(\d+))?$")


def _to_torch_key(parts, avg_down: bool, adapter=None) -> Optional[str]:
    """flax path components (minus leaf) -> torch module path."""
    adapter = adapter or {}
    pair_map = adapter.get("pair_map", {})
    name_map = adapter.get("name_map", {})
    regex_map = adapter.get("regex_map", ())
    top_regex_map = adapter.get("top_regex_map", ())
    out = []
    i = 0
    n = len(parts)
    while i < n:
        p = parts[i]
        if i + 1 < n and (p, parts[i + 1]) in pair_map:
            out.append(pair_map[(p, parts[i + 1])])
            i += 2
            continue
        hit = None
        rules = (tuple(top_regex_map) if i == 0 else ()) + tuple(regex_map)
        for pat, repl in rules:
            new, nsub = re.subn(pat, repl, p)
            if nsub:
                hit = new
                break
        m = _BLOCKS_RE.match(p)
        if hit is not None:
            out.append(hit)
        elif p in name_map:
            out.append(name_map[p])
        elif m:
            # blocks_{stage}_{idx} / blocks_{idx} -> blocks.{stage}.{idx}
            out.append("blocks." + ".".join(g for g in m.groups() if g))
        elif i == 0 and p in _DEEP_STEM:
            out.append(_DEEP_STEM[p])
        elif i == 0 and p.startswith("layer") and "_" in p:
            stage, blk = p.split("_", 1)
            out.append(f"{stage}.{blk}")
        elif p == "head" and i + 1 < n:
            pass  # chassis ClassifierHead nesting: head/fc -> fc
        elif p == "downsample":
            if i + 1 >= n:
                # bare conv module (resnetv2 preact DownsampleConv); the
                # adapter's post rules place it (e.g. downsample.conv)
                out.append("downsample")
                i += 1
                continue
            nxt = parts[i + 1]
            idx = {"conv": 1, "bn": 2} if avg_down else {"conv": 0, "bn": 1}
            out.append(f"downsample.{idx[nxt]}")
            i += 2
            continue
        elif p in _COT:
            out.append(_COT[p])
        elif p == "stem_aa" or p == "aa" or p == "avd":
            return None  # BlurPool: no params on either side
        else:
            out.append(p)
        i += 1
    joined = ".".join(out)
    for pat, repl in adapter.get("post_regex_map", ()):
        joined = re.sub(pat, repl, joined)
    return joined


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    flax_variables: Any,
    *,
    avg_down: bool = False,
    dw_group: int = 1,
    kernel_size: int = 3,
    strict: bool = True,
    adapter: Optional[dict] = None,
) -> Dict[str, Any]:
    """Map a torch state_dict onto the flax variable structure.

    ``flax_variables``: {params, batch_stats} tree (shapes only is fine,
    e.g. from jax.eval_shape) used as the target structure.
    """
    k2 = kernel_size * kernel_size
    out_params = {}
    out_stats = {}
    missing = []

    def fetch(tkey):
        if tkey in sd:
            return np.asarray(sd[tkey])
        missing.append(tkey)
        return None

    if adapter and "prepare_sd" in adapter:
        sd = adapter["prepare_sd"](sd)
    if adapter and "infer" in adapter:
        adapter = adapter["infer"](sd, adapter)
    value_rules = [(re.compile(pat), fn) for pat, fn in
                   (adapter or {}).get("value_regex_map", ())]

    def apply_value_rules(path, val):
        import inspect
        joined = "/".join(map(str, path))
        for pat, fn in value_rules:
            if pat.search(joined):
                if len(inspect.signature(fn).parameters) >= 2:
                    val = fn(val, joined)  # path-aware transform
                else:
                    val = fn(val)
        return val

    flat_p = flatten_dict(flax_variables["params"])
    flat_b = flatten_dict(flax_variables.get("batch_stats", {}))

    for path, ref in flat_p.items():
        parts, leaf = list(path[:-1]), path[-1]
        tmod = _to_torch_key(parts, avg_down, adapter)
        if tmod is None:
            continue
        is_embed_producer = parts and parts[-1] in ("embed_conv2", "embed_gn")
        val = None
        if leaf == "kernel":
            w = fetch(f"{tmod}.weight")
            if w is None:
                continue
            if w.ndim == 4 and len(ref.shape) == 2:
                # 1x1 conv used as linear (CoT se / SplitAttn fc / SE fc)
                val = w[:, :, 0, 0].T
            elif w.ndim == 4:
                val = np.transpose(w, (2, 3, 1, 0))
                if is_embed_producer:
                    val = val[..., _kmajor_perm(val.shape[-1], k2, dw_group)]
            elif w.ndim == 3 and len(ref.shape) == 2:
                # kernel-size-1 conv1d used as linear (coat aggregate)
                val = w[:, :, 0].T
            elif w.ndim == 3:  # eca conv1d [1,1,k] -> [k,1,1]
                val = np.transpose(w, (2, 1, 0))
            else:  # linear
                val = w.T
        elif leaf == "experts":
            # CondConv2d expert bank: torch flattens each expert to one row
            # [E, O*I/g*kh*kw] (reference cond_conv2d.py get_condconv_initializer
            # / CondConv2d.weight); ours is [E, kh, kw, I/g, O]
            w = fetch(f"{tmod}.weight")
            if w is None:
                continue
            e, kh, kw, ci, co = ref.shape
            val = np.transpose(w.reshape(e, co, ci, kh, kw), (0, 3, 4, 2, 1))
        elif leaf == "scale":
            v = fetch(f"{tmod}.weight")
            if v is None:
                continue
            val = v[_kmajor_perm(v.shape[0], k2, dw_group)] if is_embed_producer else v
        elif leaf == "bias":
            v = fetch(f"{tmod}.bias")
            if v is None:
                continue
            val = v[_kmajor_perm(v.shape[0], k2, dw_group)] if is_embed_producer else v
        else:
            # direct nn.Parameter (pos_h/pos_w, rel_emb_*, gating, gamma_*,
            # embeddings, cls_token, ...): copy verbatim
            lk = leaf
            for pat, repl in (adapter or {}).get("leaf_regex_map", ()):
                new, nsub = re.subn(pat, repl, lk)
                if nsub:
                    lk = new
                    break
            tkey = f"{tmod}.{lk}" if tmod else lk
            val = fetch(tkey)
            if val is None:
                continue
        val = apply_value_rules(path, val)
        if tuple(val.shape) != tuple(ref.shape):
            if strict:
                raise ValueError(
                    f"shape mismatch at {'/'.join(map(str, path))}: torch "
                    f"{val.shape} vs flax {tuple(ref.shape)} (torch key {tmod})")
            # non-strict: keep the torch value; ``surgery`` adapts or drops
        out_params[path] = val.astype(np.float32)

    for path, ref in flat_b.items():
        parts, leaf = list(path[:-1]), path[-1]
        tmod = _to_torch_key(parts, avg_down, adapter)
        if tmod is None:
            continue
        tkey = f"{tmod}.running_{'mean' if leaf == 'mean' else 'var'}"
        v = fetch(tkey)
        if v is None:
            continue
        if tuple(v.shape) != tuple(ref.shape):
            raise ValueError(f"shape mismatch at {path}: {v.shape} vs {ref.shape}")
        out_stats[path] = v.astype(np.float32)

    if strict and missing:
        raise KeyError(f"{len(missing)} torch keys missing, first 10: "
                       f"{missing[:10]}")
    return {"params": unflatten_dict(out_params),
            "batch_stats": unflatten_dict(out_stats)}


def adapt_input_conv(kernel: np.ndarray, in_chans: int) -> np.ndarray:
    """First-conv surgery for in_chans != 3 (reference helpers.py:91-126):
    1 channel -> sum over RGB; other counts -> tile and rescale.  HWIO."""
    kh, kw, cin, cout = kernel.shape
    if in_chans == cin:
        return kernel
    if in_chans == 1:
        return kernel.sum(axis=2, keepdims=True)
    reps = -(-in_chans // cin)
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_chans]
    return tiled * (cin / in_chans)


def surgery(variables, flax_shapes) -> dict:
    """Post-conversion surgery: adapt the first conv's input channels and
    drop classifier weights whose class count mismatches (reference
    load_pretrained classifier surgery, helpers.py:127-153)."""
    flat_v = flatten_dict(variables["params"])
    flat_s = flatten_dict(flax_shapes["params"])
    out = {}
    for path, ref in flat_s.items():
        v = flat_v.get(path)
        if v is None:
            continue
        if tuple(v.shape) != tuple(ref.shape):
            if v.ndim == 4 and v.shape[:2] == tuple(ref.shape[:2]) \
                    and v.shape[3] == ref.shape[3]:
                v = adapt_input_conv(np.asarray(v), ref.shape[2])
            else:
                continue  # classifier mismatch: keep the fresh init
        out[path] = v
    return {"params": unflatten_dict(out),
            "batch_stats": variables.get("batch_stats", {})}


def model_avg_down(model_name: str) -> bool:
    """Whether the family uses avg-pool downsample (ResNet-D style), i.e.
    torch downsample keys sit at .1/.2 instead of .0/.1.

    Reference: SE-CoTNetD uses avg_down (cotnet_hybrid.py make_blocks);
    CoTNet/CoTNeXt use the plain Sequential(conv, bn) downsample
    (resnet.py default) — a cardinality suffix like ``2x48d`` is NOT a
    ResNet-D marker."""
    if "cotnext" in model_name or re.search(r"\d+x\d+d$", model_name):
        return False
    return "cotnetd" in model_name or model_name.endswith("d")


def model_adapter(model_name: str) -> Optional[dict]:
    """Per-family converter adapter by registry key."""
    from cotnet_tpu.models.registry import is_model_in_modules

    if model_name and is_model_in_modules(
            model_name, ["efficientnet", "mobilenetv3"]):
        return FAMILY_ADAPTERS["efficientnet"]
    if model_name and is_model_in_modules(model_name, ["vision_transformer"]):
        return FAMILY_ADAPTERS["vit"]
    for mod, key in (("swin_transformer", "swin"), ("res2net", "res2net"),
                     ("regnet", "regnet"), ("densenet", "densenet"),
                     ("rexnet", "rexnet"), ("cait", "cait"), ("pit", "pit"),
                     ("xcit", "xcit"), ("convit", "vit"), ("tnt", "tnt"),
                     ("twins", "twins"), ("visformer", "visformer"),
                     ("levit", "levit"), ("coat", "coat"), ("sknet", "sknet"),
                     ("resnetv2", "resnetv2"), ("xception", "xception"),
                     ("vision_transformer_hybrid", "vit_hybrid"),
                     ("psresnet", "psresnet"), ("botnet", "botnet"),
                     ("lambda_net", "lambdanet"), ("resnet_dw", "resnet_dw"),
                     ("san", "san")):
        if model_name and is_model_in_modules(model_name, [mod]):
            return FAMILY_ADAPTERS[key]
    return None


def convert_torch_checkpoint(path: str, flax_variables, model_name: str = "",
                             use_ema: bool = False, strict: bool = True,
                             in_chans: int = 3):
    """File-level convenience: torch .pth.tar -> flax variables."""
    sd = load_torch_checkpoint(path, use_ema=use_ema)
    avg_down = model_avg_down(model_name)
    dw_group = 2 if "cotnext" in model_name else 1
    converted = convert_torch_state_dict(sd, flax_variables,
                                         avg_down=avg_down,
                                         dw_group=dw_group,
                                         adapter=model_adapter(model_name),
                                         strict=strict and in_chans == 3)
    if in_chans != 3:
        converted = surgery(converted, flax_variables)
    return converted
