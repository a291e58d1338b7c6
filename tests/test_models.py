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


@pytest.mark.parametrize("name,size", [
    ("lrnet50", 64), ("lrnet50_ks3", 64), ("BoTNetS1_59", 64),
    ("se_cotnetd_152", 64), ("cotnext50_2x48d", 64), ("seresnext50_32x4d", 64),
    ("resnet18", 64), ("ecaresnet50d", 64), ("san19", 64),
    ("skresnet50", 64), ("resnest50d", 64), ("res2net50_26w_4s", 64),
    ("efficientnet_b0", 64), ("mobilenetv2_100", 64),
    ("vit_tiny_patch16_224", 224), ("swin_tiny_patch4_window7_224", 224),
])
def test_model_zoo_builds(name, size):
    """Every registered family constructs and shape-checks."""
    model = create_model(name, num_classes=7)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda v, x: model.apply(v, x, training=False), vs, x)
    assert out.shape == (1, 7)


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
    from cotnet_tpu.models.efficientnet import EfficientNet

    model = EfficientNet(arch=(("ds", 1, 3, 1, 8, 1, 0.25),
                               ("ir", 4, 3, 2, 16, 2, 0.25)),
                         stem_size=8, num_features=32, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    vs = jax.jit(lambda r, x: model.init({"params": r}, x, training=False)
                 )(jax.random.PRNGKey(1), x)
    y = jax.jit(lambda v, x: model.apply(v, x, training=False))(vs, x)
    assert y.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(y)))
