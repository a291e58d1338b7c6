"""Layer-zoo unit tests: shapes, invariants, and semantics checks for the
extended layers (reference models/layers/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotnet_tpu.nn import (
    BlurPool2d,
    CbamModule,
    CondConv2d,
    EcaModule,
    EvoNorm2dB0,
    EvoNorm2dS0,
    Kerv2d,
    MixedConv2d,
    SEModule,
    SelectiveKernelConv,
    Shiftlution,
    SpaceToDepth,
    SplitAttnConv2d,
    SplitBatchNorm,
    TBConv,
    avg_pool2d,
    max_pool2d,
    space_to_depth,
)


def _init_apply(mod, x, training=False, **kw):
    vs = mod.init({"params": jax.random.PRNGKey(0)}, x, **kw)
    return mod.apply(vs, x, **kw), vs


def test_avg_pool_torch_semantics():
    """count_include_pad / ceil_mode parity vs torch (values precomputed)."""
    import torch
    import torch.nn.functional as F

    x = np.arange(36, dtype=np.float32).reshape(1, 1, 6, 6)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    for kwargs in [dict(kernel_size=3, stride=2, padding=1),
                   dict(kernel_size=3, stride=2, padding=1,
                        count_include_pad=False),
                   dict(kernel_size=2, stride=2, ceil_mode=True,
                        count_include_pad=False),
                   dict(kernel_size=3, stride=3, padding=1, ceil_mode=True)]:
        ref = F.avg_pool2d(torch.tensor(x), **kwargs).numpy()
        ours = np.asarray(avg_pool2d(xj, **kwargs)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, err_msg=str(kwargs))


def test_max_pool_torch_semantics():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(1, 3, 7, 7).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    for kwargs in [dict(kernel_size=3, stride=2, padding=1),
                   dict(kernel_size=2, stride=2, ceil_mode=True)]:
        ref = F.max_pool2d(torch.tensor(x), **kwargs).numpy()
        ours = np.asarray(max_pool2d(xj, **kwargs)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, err_msg=str(kwargs))


def test_blur_pool_shape_and_smoothing():
    x = jnp.zeros((1, 8, 8, 4)).at[:, 4, 4, :].set(1.0)
    y, _ = _init_apply(BlurPool2d(filt_size=3, stride=2), x)
    assert y.shape == (1, 4, 4, 4)
    assert float(jnp.sum(y)) == pytest.approx(1.0, abs=1e-5)  # energy kept


def test_attn_modules_shapes():
    x = jnp.ones((2, 8, 8, 32))
    for mod in (SEModule(32), EcaModule(32), CbamModule(32)):
        y, _ = _init_apply(mod, x)
        assert y.shape == x.shape


def test_split_attn_radix1_is_sigmoid_gate():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    y, _ = _init_apply(SplitAttnConv2d(out_channels=16, kernel_size=3,
                                       padding=1, radix=1), x)
    assert y.shape == (2, 8, 8, 16)
    y2, _ = _init_apply(SplitAttnConv2d(out_channels=16, kernel_size=3,
                                        padding=1, radix=2), x)
    assert y2.shape == (2, 8, 8, 16)


def test_shiftlution_shifts_channels():
    c, k = 18, 3
    x = jnp.zeros((1, 5, 5, c)).at[:, 2, 2, :].set(1.0)
    y, _ = _init_apply(Shiftlution(channels=c, kernel_h=k, kernel_w=k), x)
    assert y.shape == x.shape
    # first span (2 channels) is the zero shift -> unchanged
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]),
                               np.asarray(x[0, :, :, 0]))
    # total mass preserved up to border clipping
    assert float(jnp.sum(y)) <= float(jnp.sum(x)) + 1e-5


def test_tbconv_matches_blockwise_conv():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 8))
    mod = TBConv(out_channels=8, kernel_size=3, padding=1, blocks=2,
                 use_bias=False)
    y, vs = _init_apply(mod, x)
    assert y.shape == (2, 6, 6, 8)
    # applying the shared conv to each half separately must agree
    import jax.lax as lax

    kern = vs["params"]["conv"]["kernel"]
    for half in range(2):
        ref = lax.conv_general_dilated(
            x[..., half * 4:(half + 1) * 4], kern, (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y[..., half * 4:(half + 1) * 4]),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kerv2d():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8))
    y, _ = _init_apply(Kerv2d(out_channels=6, power=3), x)
    assert y.shape == (2, 4, 4, 6)


def test_space_to_depth():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = space_to_depth(x, 4)
    assert y.shape == (2, 2, 2, 48)
    # (sh, sw, c)-major: first 3 channels = pixel (0,0) of the block
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, :3]),
                               np.asarray(x[0, 0, 0, :]))
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 3:6]),
                               np.asarray(x[0, 0, 1, :]))


def test_selective_kernel():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
    y, _ = _init_apply(SelectiveKernelConv(out_channels=24), x,
                       training=False)
    assert y.shape == (2, 8, 8, 24)
    y2, _ = _init_apply(SelectiveKernelConv(out_channels=24, split_input=True),
                        x, training=False)
    assert y2.shape == (2, 8, 8, 24)


def test_evo_norms():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 32))
    for mod in (EvoNorm2dB0(), EvoNorm2dS0()):
        vs = mod.init({"params": jax.random.PRNGKey(0)}, x, training=True)
        y = mod.apply(vs, x, training=False,
                      mutable=False if "batch_stats" not in vs else False)
        assert np.asarray(y).shape == x.shape


def test_split_batchnorm():
    x = jnp.concatenate([jnp.zeros((4, 4, 4, 8)), jnp.ones((4, 4, 4, 8))])
    mod = SplitBatchNorm(num_splits=2)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, x, training=True)
    y, new_vs = mod.apply(vs, x, training=True, mutable=["batch_stats"])
    m0 = float(new_vs["batch_stats"]["bn_0"]["mean"][0])
    m1 = float(new_vs["batch_stats"]["bn_1"]["mean"][0])
    assert m0 != m1  # per-split statistics


def test_cond_conv():
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 6, 6, 8))
    y, _ = _init_apply(CondConv2d(out_channels=12, num_experts=3), x)
    assert y.shape == (3, 6, 6, 12)


def test_mixed_conv():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 16))
    y, _ = _init_apply(MixedConv2d(out_channels=16, kernel_sizes=(3, 5)), x)
    assert y.shape == (2, 8, 8, 16)
    y2, _ = _init_apply(MixedConv2d(out_channels=16, kernel_sizes=(3, 5, 7),
                                    depthwise=True), x)
    assert y2.shape == (2, 8, 8, 16)


def test_lean_batch_norm_matches_flax():
    """LeanBatchNorm (nn/norm.py) is a drop-in for flax BatchNorm: same
    param/variable names+shapes, same train-mode statistics and momentum
    update, same eval normalize (f32: forms agree to reduction-order
    noise)."""
    from flax import linen as fnn
    from cotnet_tpu.nn.norm import LeanBatchNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 8), jnp.float32)
    lean = LeanBatchNorm(use_running_average=False, momentum=0.9)
    ref = fnn.BatchNorm(use_running_average=False, momentum=0.9)
    vl = lean.init(jax.random.PRNGKey(1), x)
    vr = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(vl) == jax.tree_util.tree_structure(vr)

    # train mode: outputs + updated running stats
    yl, sl = lean.apply(vl, x, mutable=["batch_stats"])
    yr, sr = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yr),
                               atol=1e-5, rtol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(sl["batch_stats"][k]),
            np.asarray(sr["batch_stats"][k]), atol=1e-6, rtol=1e-6)

    # eval mode with non-trivial running stats
    stats = {"batch_stats": {"mean": jnp.arange(8, dtype=jnp.float32) * 0.1,
                             "var": jnp.linspace(0.5, 2.0, 8)}}
    le = LeanBatchNorm(use_running_average=True)
    re_ = fnn.BatchNorm(use_running_average=True)
    ye_l = le.apply({"params": vl["params"], **stats}, x)
    ye_r = re_.apply({"params": vr["params"], **stats}, x)
    np.testing.assert_allclose(np.asarray(ye_l), np.asarray(ye_r),
                               atol=1e-5, rtol=1e-5)

    # gradients through the train-mode normalize agree
    def loss(mod, v):
        def f(p):
            y, _ = mod.apply({**v, "params": p}, x, mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        return jax.grad(f)(v["params"])
    gl, gr = loss(lean, vl), loss(ref, vr)
    for a, b in zip(jax.tree_util.tree_leaves(gl),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_dense_grouped_conv_matches_grouped():
    """DenseGroupedConv (block-diagonal dense kernel, COTNET_DENSE_GROUPED)
    computes exactly fnn.Conv(feature_group_count=g): same param tree, same
    outputs, same grads — only the lowering differs (full-width MXU wgrad
    vs per-group contractions)."""
    from flax import linen as fnn

    from cotnet_tpu.nn.conv import DenseGroupedConv

    n, h, cin, cout, g, ks = 2, 10, 16, 16, 4, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, h, cin), jnp.float32)
    dense = DenseGroupedConv(features=cout, kernel_size=(ks, ks),
                             padding=((1, 1), (1, 1)), groups=g,
                             use_bias=True)
    ref = fnn.Conv(features=cout, kernel_size=(ks, ks), padding=1,
                   feature_group_count=g, use_bias=True)
    v = dense.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(
        v["params"]) == jax.tree_util.tree_structure(
        ref.init(jax.random.PRNGKey(1), x)["params"])

    yd = dense.apply(v, x)
    yr = ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yr),
                               atol=1e-5, rtol=1e-5)

    def loss(mod):
        def f(p, xx):
            return jnp.sum(mod.apply({"params": p}, xx) ** 2)
        return jax.grad(f, argnums=(0, 1))(v["params"], x)

    gd, gr_ = loss(dense), loss(ref)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gr_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_cotnet_dense_grouped_gate():
    """The COTNET_DENSE_GROUPED gate swaps the key_embed lowering without
    changing the param tree or (up to rounding) the outputs."""
    import cotnet_tpu.models.cotnet as cm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    layer = cm.CotLayer(dim=32)
    v = layer.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    y0 = layer.apply(v, x, training=False)
    old = cm.DENSE_GROUPED
    cm.DENSE_GROUPED = True
    try:
        v1 = layer.init({"params": jax.random.PRNGKey(1)}, x, training=False)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v)
        y1 = layer.apply(v, x, training=False)
    finally:
        cm.DENSE_GROUPED = old
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=2e-5)


def test_bn_fused_bwd_matches_autodiff():
    """COTNET_BN_FUSED_BWD: the closed-form BN training backward
    (dgamma/dbeta/dx in two passes) matches XLA autodiff of the plain path,
    and the forward + running-stat updates are identical."""
    import cotnet_tpu.nn.norm as nm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 8), jnp.float32)
    bn = nm.LeanBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(1), x)

    def run(fused):
        old = nm.BN_FUSED_BWD
        nm.BN_FUSED_BWD = fused
        try:
            def f(p, xx):
                y, upd = bn.apply({**v, "params": p}, xx,
                                  mutable=["batch_stats"])
                return jnp.sum(jnp.sin(y)), (y, upd)
            (loss, (y, upd)), grads = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(v["params"], x)
            return loss, y, upd, grads
        finally:
            nm.BN_FUSED_BWD = old

    l0, y0, u0, g0 = run(False)
    l1, y1, u1, g1 = run(True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(u0),
                    jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # bf16 path: finite + close to the f32 reference grads
    xb = x.astype(jnp.bfloat16)
    def fb(p, xx):
        old = nm.BN_FUSED_BWD
        nm.BN_FUSED_BWD = True
        try:
            y, _ = bn.apply({**v, "params": p}, xx, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)
        finally:
            nm.BN_FUSED_BWD = old
    gb = jax.grad(fb, argnums=1)(v["params"], xb)
    assert jnp.all(jnp.isfinite(gb.astype(jnp.float32)))


def test_all_perf_gates_combined():
    """The three env-gated perf levers (COTNET_DENSE_GROUPED,
    COTNET_BN_FUSED_BWD, COTNET_TILE_DOT) compose: a training-mode CotLayer
    fwd + param/input grads with all three ON matches all-OFF — pins the
    gate *combinations* the on-chip A/B runbook measures."""
    import cotnet_tpu.models.cotnet as cm
    import cotnet_tpu.nn.norm as nm
    import cotnet_tpu.ops.local_agg_pallas as lap

    # batch 4, not 2: the SE-branch BN normalizes [B,1,1,C] pooled features,
    # and at B=2 batch norm maps both elements to exactly +-1 — the true
    # gradient through it is structurally ~eps, so fused-vs-autodiff rounding
    # noise dominates any relative comparison (verified: M=3,4,8 match at
    # 1e-7; M=2 both emit ~1e-7-magnitude values of differing rounding).
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 32), jnp.float32)
    layer = cm.CotLayer(dim=32)
    v = layer.init({"params": jax.random.PRNGKey(1), "dropout":
                    jax.random.PRNGKey(2)}, x, training=True)

    def run():
        def f(p, xx):
            y, upd = layer.apply(
                {**v, "params": p}, xx, training=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.sum(jnp.sin(y)), upd
        (loss, upd), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(v["params"], x)
        return loss, upd, grads

    saved = (cm.DENSE_GROUPED, nm.BN_FUSED_BWD, lap.TILE_DOT)
    try:
        cm.DENSE_GROUPED, nm.BN_FUSED_BWD, lap.TILE_DOT = False, False, False
        l0, u0, g0 = run()
        cm.DENSE_GROUPED, nm.BN_FUSED_BWD, lap.TILE_DOT = True, True, True
        # param tree must be unchanged by the dense-grouped lowering
        v1 = layer.init({"params": jax.random.PRNGKey(1), "dropout":
                         jax.random.PRNGKey(2)}, x, training=True)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v)
        l1, u1, g1 = run()
    finally:
        cm.DENSE_GROUPED, nm.BN_FUSED_BWD, lap.TILE_DOT = saved

    np.testing.assert_allclose(float(l0), float(l1), atol=1e-4, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(u0),
                    jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
