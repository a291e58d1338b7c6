"""Feature-extraction wrapper tests (reference models/features.py parity):
out_indices selection, channel/reduction metadata, dict keys, hook capture."""

import jax
import jax.numpy as jnp
import pytest

from cotnet_tpu.models import create_model
from cotnet_tpu.models.features import (
    FeatureDictNet,
    FeatureHookNet,
    FeatureInfo,
    FeatureListNet,
    build_feature_net,
)


def test_feature_info_api():
    info = [{"num_chs": c, "reduction": r, "module": f"stage{i}"}
            for i, (c, r) in enumerate([(64, 2), (256, 4), (512, 8),
                                        (1024, 16), (2048, 32)])]
    fi = FeatureInfo(info, (0, 1, 2, 3, 4))
    assert fi.channels() == [64, 256, 512, 1024, 2048]
    assert fi.reduction() == [2, 4, 8, 16, 32]
    assert fi.channels(2) == 512
    sel = fi.from_other((1, 3))
    assert sel.channels() == [256, 1024]
    assert len(sel) == 2
    assert sel.get_dicts(keys=["reduction"]) == [{"reduction": 4},
                                                 {"reduction": 16}]


@pytest.mark.parametrize("name,chs,reds", [
    ("cotnet50", [64, 256, 512, 1024, 2048], [2, 4, 8, 16, 32]),
    ("efficientnet_b0", [16, 24, 40, 112, 320], [2, 4, 8, 16, 32]),
])
def test_feature_list_net(name, chs, reds):
    """Reference feature pyramid metadata for the two canonical backbones
    (reference features.py FeatureInfo on resnet/efficientnet chassis)."""
    net = FeatureListNet(create_model(name), out_indices=(0, 1, 2, 3, 4))
    assert net.feature_info.channels() == chs
    assert net.feature_info.reduction() == reds

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: net.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(lambda v, x: net.apply(v, x, training=False), vs, x)
    assert [o.shape[-1] for o in outs] == chs
    assert [64 // o.shape[1] for o in outs] == reds


def test_feature_out_indices_selection():
    net = build_feature_net(create_model("cotnet50"), "list",
                            out_indices=(1, 3))
    assert net.feature_info.channels() == [256, 1024]
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: net.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(lambda v, x: net.apply(v, x, training=False), vs, x)
    assert len(outs) == 2
    assert [o.shape[-1] for o in outs] == [256, 1024]


def test_feature_dict_net():
    net = FeatureDictNet(create_model("efficientnet_b0"),
                         out_indices=(2, 4))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = jax.eval_shape(
        lambda r, x: net.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(lambda v, x: net.apply(v, x, training=False), vs, x)
    assert list(outs.keys()) == ["stage2", "stage4"]
    assert outs["stage4"].shape[-1] == 320


def test_feature_hook_net():
    """Hook-style capture of an arbitrary internal module's output."""
    model = create_model("resnet18", num_classes=5)
    net = FeatureHookNet(model, ["layer2_0", "head"])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 0.2
    vs = net.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    feats, logits = net.apply(vs, x, training=False)
    assert list(feats.keys()) == ["layer2_0", "head"]
    assert feats["layer2_0"].shape[-1] == 128
    assert logits.shape == (1, 5)
