"""Model zoo structural tests: registry behavior, parameter-count parity with
the reference's published numbers (README.md:43-52 / SURVEY.md §6), and tiny
jitted forward passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotnet_tpu.models import (
    create_model,
    get_model_default_cfg,
    is_model,
    list_models,
    model_entrypoint,
)


def count_params(model, input_size=224):
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vs["params"]))


def test_registry():
    assert is_model("cotnet50")
    assert "cotnet50" in list_models("cotnet*")
    assert "cotnet50" not in list_models("cotnet*", exclude_filters="*50")
    assert callable(model_entrypoint("se_cotnetd_152"))
    assert "resnet50" in list_models(module="resnet")
    assert "cotnet50" not in list_models(module="resnet")


# reference param counts in millions (README.md:45-52; resnet50 torchvision)
PARAM_PARITY = [
    ("cotnet50", 224, 22.2),
    ("cotnext50_2x48d", 224, 30.1),
    ("se_cotnetd_50", 224, 23.1),
    ("cotnet101", 224, 38.3),
    ("resnet50", 224, 25.6),
]

# EXACT parameter counts, one or more rows per zoo family, measured by
# instantiating the reference's torch modules (models/*.py imported
# standalone) and summing p.numel().  Any drift here is a structural
# divergence from the reference architecture.
PARAM_EXACT = {
    # efficientnet superfamily (reference efficientnet.py)
    "efficientnet_b0": 5288548, "efficientnet_b2": 9109994,
    "efficientnet_es": 5438392, "efficientnet_lite0": 4652008,
    "efficientnet_cc_b0_4e": 13314116, "efficientnet_cc_b1_8e": 39715968,
    "mixnet_s": 4134606, "mixnet_m": 5014382, "mixnet_l": 7329252,
    "mnasnet_050": 2218512, "mnasnet_100": 4383312, "semnasnet_100": 3887038,
    "mnasnet_small": 2030264, "mobilenetv2_100": 3504872,
    "mobilenetv2_110d": 4516520, "mobilenetv2_140": 6108776,
    "fbnetc_100": 5572200, "spnasnet_100": 4421616,
    "tf_efficientnet_b0": 5288548, "tf_mixnet_m": 5014382,
    # CNN zoo
    "resnet50": 25557032, "wide_resnet50_2": 68883240,
    "resnext50_32x4d": 25028904, "seresnet50": 28088024,
    "ecaresnet50d": 25576350, "resnest14d": 10611688,
    "resnest50d": 27483240, "skresnet18": 11958056,
    "res2net50_26w_4s": 25699120, "resnet_rs50": 35654920,
    "regnetx_002": 2684792, "regnety_002": 3162996,
    "densenet121": 7978856, "xception": 22855952, "rexnet_100": 4796873,
    "lambdanet50": 14917768,
    # transformer zoo
    "vit_tiny_patch16_224": 5717416, "vit_base_patch16_224": 86567656,
    "deit_tiny_patch16_224": 5717416,
    "deit_base_distilled_patch16_224": 87338192,
    "swin_tiny_patch4_window7_224": 28288354,
    "swin_large_patch4_window7_224": 196532476,
    "xcit_nano_12_p16_224": 3053224, "xcit_small_12_p16_224": 26253304,
    "cait_xxs24_224": 11956264, "cait_s24_224": 46916200,
    "coat_tiny": 5498540, "coat_lite_tiny": 5721960, "coat_mini": 10337004,
    "convit_tiny": 5710512, "tnt_s_patch16_224": 23755336,
    "twins_pcpvt_small": 24106216, "twins_svt_small": 24060776,
    "visformer_tiny": 10321368, "pit_ti_224": 4847272,
    "pit_b_distilled_224": 74790096, "levit_128": 8828168,
    "levit_384": 38358300,
}


@pytest.mark.parametrize("name", sorted(PARAM_EXACT))
def test_param_count_exact(name):
    model = create_model(name)
    size = get_model_default_cfg(name).get("input_size", (3, 224, 224))[1]
    n = count_params(model, size)
    assert n == PARAM_EXACT[name], (
        f"{name}: {n} params vs reference torch module's {PARAM_EXACT[name]}")


def test_registry_closure():
    """Every @register_model key of the reference is registered here
    (the key list is checked in at tests/data/reference_registry_keys.txt)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "reference_registry_keys.txt")
    ref_keys = set(open(path).read().split())
    ours = set(list_models())
    missing = ref_keys - ours
    assert not missing, f"{len(missing)} reference keys missing: {sorted(missing)[:20]}"


# one numeric forward per registry family (smallest variant), so no family's
# numerics go unexecuted in CI — a NaN under jit fails here
ZOO_FORWARD = [
    # CoT families + attention CNNs
    ("lrnet50", 64), ("lrnet50_ks3", 64), ("BoTNetS1_59", 64),
    ("se_cotnetd_152", 64), ("cotnext50_2x48d", 64),
    # ResNet chassis families
    ("resnet18", 64), ("seresnext50_32x4d", 64), ("ecaresnet50d", 64),
    ("skresnet50", 64), ("resnest50d", 64), ("res2net50_26w_4s", 64),
    ("resnet_rs50", 64), ("resnetv2_50x1_bitm", 64), ("psresnet50", 64),
    ("lambdanet50", 64), ("resnet50_dw", 64),
    # regnet / densenet / xception / rexnet
    ("regnetx_002", 64), ("regnety_002", 64), ("densenet121", 64),
    ("xception", 96), ("rexnet_100", 64),
    # efficientnet superfamily (incl. mixed/cond conv + TF-SAME path)
    ("efficientnet_b0", 64), ("mobilenetv2_100", 64),
    ("mobilenetv3_large_100", 64), ("mnasnet_small", 64),
    ("spnasnet_100", 64), ("fbnetc_100", 64), ("mixnet_s", 64),
    ("efficientnet_es", 64), ("efficientnet_cc_b0_4e", 64),
    ("efficientnet_lite0", 64), ("tf_efficientnet_b0", 64),
    # transformers (native resolution for pos embeds)
    ("vit_tiny_patch16_224", 224), ("deit_tiny_distilled_patch16_224", 224),
    ("vit_tiny_r_s16_p8_224", 224), ("swin_tiny_patch4_window7_224", 224),
    ("xcit_nano_12_p16_224", 224), ("cait_xxs24_224", 224),
    ("coat_lite_tiny", 224), ("coat_tiny", 224), ("convit_tiny", 224),
    ("tnt_s_patch16_224", 224), ("twins_pcpvt_small", 224),
    ("twins_svt_small", 224), ("visformer_tiny", 224), ("pit_ti_224", 224),
    ("levit_128s", 224),
]


@pytest.mark.parametrize("name,size", ZOO_FORWARD)
def test_model_zoo_forward(name, size):
    """Every registered family runs a REAL jitted forward (not eval_shape)
    and produces finite logits."""
    model = create_model(name, num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3)) * 0.25
    vs = jax.jit(lambda r, x: model.init({"params": r}, x, training=False)
                 )(jax.random.PRNGKey(1), x)
    y = jax.jit(lambda v, x: model.apply(v, x, training=False))(vs, x)
    assert y.shape == (1, 7)
    assert bool(jnp.all(jnp.isfinite(y))), f"{name} produced non-finite logits"


def test_san19_forward_train_mode():
    """SAN's w*v aggregation squares activation magnitudes per block, so at
    RANDOM init an eval-mode forward (identity BN running stats) overflows —
    in the torch reference too; the meaningful numeric check is batch-stats
    mode.  Needs 128px+ so the K=7 reflect pad is valid at stage 5."""
    model = create_model("san19", num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 3)) * 0.25
    vs = jax.jit(lambda r, x: model.init({"params": r}, x, training=True)
                 )(jax.random.PRNGKey(1), x)
    y, _ = jax.jit(lambda v, x: model.apply(
        v, x, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)}))(vs, x)
    assert y.shape == (1, 7)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("name,size,ref_m", PARAM_PARITY)
def test_param_count_parity(name, size, ref_m):
    model = create_model(name)
    n = count_params(model, size)
    assert abs(n / 1e6 - ref_m) < 0.15, f"{name}: {n/1e6:.2f}M vs ref {ref_m}M"


@pytest.mark.parametrize("name", ["cotnet50", "se_cotnetd_50"])
def test_tiny_forward(name):
    """Jitted forward at small resolution; checks shapes and finiteness."""
    model = create_model(name, num_classes=10)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    init = jax.jit(lambda r, x: model.init({"params": r}, x, training=False))
    vs = init(rng, x)
    y = jax.jit(lambda v, x: model.apply(v, x, training=False))(vs, x)
    assert y.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_default_cfg():
    cfg = get_model_default_cfg("se_cotnetd_152_L")
    assert cfg["input_size"] == (3, 320, 320)
    assert cfg["crop_pct"] == 0.909
    cfg50 = get_model_default_cfg("cotnet50")
    assert cfg50["input_size"] == (3, 224, 224)


def test_features_only():
    model = create_model("cotnet50", features_only=True)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(
        lambda v, x: model.apply(v, x, training=False), vs, x)
    assert len(outs) == 4
    # strides 4, 8, 16, 32 on the classic chassis
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_swin_forward_values():
    """Run a real (non-eval_shape) tiny Swin forward: exercises windowing,
    shift masks, patch merging numerics."""
    from cotnet_tpu.models.swin_transformer import SwinTransformer

    model = SwinTransformer(patch_size=4, embed_dim=24, depths=(1, 2),
                            num_heads=(2, 4), window_size=4, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    vs = jax.jit(lambda r, x: model.init({"params": r}, x, training=False)
                 )(jax.random.PRNGKey(1), x)
    y = jax.jit(lambda v, x: model.apply(v, x, training=False))(vs, x)
    assert y.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_efficientnet_forward_values():
    from cotnet_tpu.models.efficientnet import EfficientNet, decode_arch_def

    model = EfficientNet(
        block_args=decode_arch_def((("ds_r1_k3_s1_c8_se0.25",),
                                    ("ir_r2_k3_s2_e4_c16_se0.25",))),
        stem_size=8, num_features=32, num_classes=5, act="swish")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    vs = jax.jit(lambda r, x: model.init({"params": r}, x, training=False)
                 )(jax.random.PRNGKey(1), x)
    y = jax.jit(lambda v, x: model.apply(v, x, training=False))(vs, x)
    assert y.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(y)))
