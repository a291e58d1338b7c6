"""Local-aggregation kernel parity tests.

Mirrors the reference's executable self-tests
(/root/reference/cupy_layers/aggregation_zeropad.py:238-297 and siblings):
oracle comparison + gradient checks, for every variant.  The oracle here is
an independent brute-force numpy implementation (even more primitive than the
reference's unfold/einsum oracle, so the two JAX implementations and the
oracle are three mutually independent formulations).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

from cotnet_tpu.ops import (
    local_aggregate,
    local_aggregate_dilated,
    local_aggregate_mix,
    local_aggregate_mix_merge,
    out_size,
)


def oracle_agg(x, w, k, stride, pad, dil, pad_mode="zeros"):
    """Brute-force numpy local aggregation, NHWC / k-major weight layout."""
    n, hi, wi, c = x.shape
    _, ho, wo, heads, k2, cw = w.shape
    mode = {"zeros": "constant", "reflect": "reflect"}[pad_mode]
    xp = np.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode=mode)
    out = np.zeros((n, ho, wo, heads * c), dtype=np.float64)
    for head in range(heads):
        for kh in range(k):
            for kw in range(k):
                tap = xp[:, kh * dil:kh * dil + (ho - 1) * stride + 1:stride,
                         kw * dil:kw * dil + (wo - 1) * stride + 1:stride, :]
                wk = w[:, :, :, head, kh * k + kw, :]  # [n, ho, wo, cw]
                wk_full = np.tile(wk, (1, 1, 1, c // cw))
                out[..., head * c:(head + 1) * c] += wk_full * tap
    return out


def make_inputs(seed=0, n=2, c=8, cw=4, hi=9, wi=9, heads=1, k=3, stride=1,
                dil=1, pad=None):
    if pad is None:
        pad = (dil * (k - 1) + 1) // 2
    ho = out_size(hi, k, stride, pad, dil)
    wo = out_size(wi, k, stride, pad, dil)
    rng = np.random.RandomState(seed)
    x = rng.randn(n, hi, wi, c).astype(np.float32)
    w = rng.randn(n, ho, wo, heads, k * k, cw).astype(np.float32)
    return x, w, pad


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize(
    "k,stride,dil,heads,pad_mode",
    [
        (3, 1, 1, 1, "zeros"),
        (5, 1, 1, 2, "zeros"),
        (1, 1, 1, 2, "zeros"),
        (3, 2, 1, 1, "zeros"),   # strided -> XLA path even under impl='pallas'
        (3, 1, 2, 1, "zeros"),   # dilated
        (3, 1, 1, 1, "reflect"),
        (5, 1, 1, 1, "reflect"),
    ],
)
def test_forward_vs_oracle(impl, k, stride, dil, heads, pad_mode):
    if impl == "pallas" and stride != 1:
        impl = "xla"  # documented fallback
    x, w, pad = make_inputs(k=k, stride=stride, dil=dil, heads=heads)
    y = local_aggregate(
        jnp.asarray(x), jnp.asarray(w), kernel_size=k, stride=stride,
        padding=pad, dilation=dil, pad_mode=pad_mode, impl=impl)
    ref = oracle_agg(x.astype(np.float64), w.astype(np.float64), k, stride,
                     pad, dil, pad_mode)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pad_mode", ["zeros", "reflect"])
def test_pallas_matches_xla_forward_and_grads(pad_mode):
    x, w, pad = make_inputs(k=3, heads=2, c=8, cw=4)
    x, w = jnp.asarray(x), jnp.asarray(w)

    def f(impl):
        def g(x, w):
            y = local_aggregate(x, w, kernel_size=3, padding=pad,
                                pad_mode=pad_mode, impl=impl)
            # non-uniform scalarization so grads exercise all positions
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return g

    y_x = f("xla")(x, w)
    y_p = f("pallas")(x, w)
    np.testing.assert_allclose(y_p, y_x, rtol=1e-4, atol=1e-4)

    gx_x, gw_x = jax.grad(f("xla"), argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(f("pallas"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_check_grads(impl):
    x, w, pad = make_inputs(n=1, c=4, cw=2, hi=5, wi=5)
    x, w = jnp.asarray(x), jnp.asarray(w)

    def g(x, w):
        return local_aggregate(x, w, kernel_size=3, padding=pad, impl=impl)

    check_grads(g, (x, w), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_mix_vs_composition():
    n, c, cw, hi = 2, 8, 4, 6
    rng = np.random.RandomState(1)
    x = rng.randn(n, hi, hi, c).astype(np.float32)
    w1 = rng.randn(n, hi, hi, 1, 9, cw).astype(np.float32)
    w2 = rng.randn(n, hi, hi, 1, 25, cw).astype(np.float32)
    y = local_aggregate_mix(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    assert y.shape == (n, hi, hi, 2 * c)
    r1 = oracle_agg(x.astype(np.float64), w1.astype(np.float64), 3, 1, 1, 1)
    r2 = oracle_agg(x.astype(np.float64), w2.astype(np.float64), 5, 1, 2, 1)
    np.testing.assert_allclose(np.asarray(y), np.concatenate([r1, r2], -1),
                               rtol=1e-4, atol=1e-4)

    # merge variant: packed weights give the same result
    wm = np.concatenate([w1, w2], axis=4)
    ym = local_aggregate_mix_merge(jnp.asarray(x), jnp.asarray(wm))
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y), rtol=1e-6, atol=1e-6)


def test_dilated_per_channel():
    n, c, cw, hi = 2, 8, 4, 9
    dilations = [1, 2, 1, 2]
    rng = np.random.RandomState(2)
    x = rng.randn(n, hi, hi, c).astype(np.float32)
    w = rng.randn(n, hi, hi, 1, 9, cw).astype(np.float32)
    y = local_aggregate_dilated(jnp.asarray(x), jnp.asarray(w), dilations)
    assert y.shape == (n, hi, hi, c)
    r1 = oracle_agg(x.astype(np.float64), w.astype(np.float64), 3, 1, 1, 1)
    r2 = oracle_agg(x.astype(np.float64), w.astype(np.float64), 3, 1, 2, 2)
    ref = np.zeros_like(r1)
    for ci in range(c):
        src = r1 if dilations[ci % cw] == 1 else r2
        ref[..., ci] = src[..., ci]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_bf16_runs_and_is_close():
    x, w, pad = make_inputs(k=3)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    wb = jnp.asarray(w, dtype=jnp.bfloat16)
    for impl in ("xla", "pallas"):
        y = local_aggregate(xb, wb, kernel_size=3, padding=pad, impl=impl)
        assert y.dtype == jnp.bfloat16
        ref = oracle_agg(x.astype(np.float64), w.astype(np.float64), 3, 1, pad, 1)
        np.testing.assert_allclose(np.asarray(y, dtype=np.float64), ref,
                                   rtol=0.1, atol=0.25)


def test_strip_kernels_parity():
    """The halo strip kernels (interpret mode) vs the XLA oracle — kept
    correct even while strip dispatch is off by default (measured slower
    than XLA on v5e at the shapes it covers; see local_agg_pallas notes)."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = lap.STRIP_DISPATCH
    lap.STRIP_DISPATCH = True
    try:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 16))
        w = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 1, 9, 2))
        assert lap.pallas_plan(x.shape, w.shape, 4, (1, 1))[0] == "strip"

        def f(impl):
            return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                x, w, kernel_size=3, padding=1, impl=impl)))

        ya, yb = f("xla")(x, w), f("pallas")(x, w)
        assert abs(float(ya - yb)) < 1e-3
        ga = jax.grad(f("xla"), (0, 1))(x, w)
        gb = jax.grad(f("pallas"), (0, 1))(x, w)
        for a, b in zip(ga, gb):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert rel < 1e-5, rel
    finally:
        lap.STRIP_DISPATCH = old


def test_wloop_kernels_parity():
    """The whole-image grouped-accumulation kernels (interpret mode) vs the
    XLA oracle — the stage-1 experimental flavor behind COTNET_AGG_WLOOP."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = lap.WLOOP_DISPATCH
    old_budget = lap._VMEM_BUDGET_BYTES
    lap.WLOOP_DISPATCH = True
    # shrink the whole-kernel budget so this shape exercises the wloop path
    lap._VMEM_BUDGET_BYTES = 1 * 1024 * 1024
    try:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 16))
        w = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1, 9, 2))
        assert lap.pallas_plan(x.shape, w.shape, 4, (1, 1))[0] == "wloop"

        def f(impl):
            return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                x, w, kernel_size=3, padding=1, impl=impl)))

        ya, yb = f("xla")(x, w), f("pallas")(x, w)
        assert abs(float(ya - yb)) < 1e-3
        ga = jax.grad(f("xla"), (0, 1))(x, w)
        gb = jax.grad(f("pallas"), (0, 1))(x, w)
        for a, b in zip(ga, gb):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert rel < 1e-5, rel
    finally:
        lap.WLOOP_DISPATCH = old
        lap._VMEM_BUDGET_BYTES = old_budget


def test_tile_dot_parity():
    """COTNET_TILE_DOT: the MXU-matmul form of the cw->c lane replication
    (wk @ 0/1 expansion matrix) is exactly the concatenate broadcast — fwd
    and both grads, whole-image kernels, g=8."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = lap.TILE_DOT
    try:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16))
        w = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1, 9, 2))

        def f(impl):
            return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                x, w, kernel_size=3, padding=1, impl=impl)))

        outs = {}
        for flag in (False, True):
            lap.TILE_DOT = flag
            outs[flag] = (f("pallas")(x, w),
                          jax.grad(f("pallas"), (0, 1))(x, w))
        ya = f("xla")(x, w)
        assert abs(float(outs[True][0] - ya)) < 1e-3
        for a, b in zip(outs[False][1], outs[True][1]):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert rel < 1e-6, rel
    finally:
        lap.TILE_DOT = old


def test_xla_gather_vjp_matches_autodiff():
    """The gather-style custom VJP for the stride-1 XLA core (the training
    stage-1 backward fix: no K^2-sized f32 d_patches materialization, no
    scatter chain) produces the same grads as plain autodiff of the core."""
    import jax
    from cotnet_tpu.ops.local_agg import _agg_core_xla, _agg_xla_stride1

    for (n, h, c, cw, heads, k, d) in [(2, 8, 16, 4, 1, 3, 1),
                                       (2, 9, 12, 3, 2, 3, 2),
                                       (1, 11, 8, 8, 1, 5, 1)]:
        pad = (d * (k - 1) + 1) // 2
        hp = h + 2 * pad
        ks = jax.random.split(jax.random.PRNGKey(n + h), 3)
        xp = jax.random.normal(ks[0], (n, hp, hp, c), jnp.float32)
        ho = hp - d * (k - 1)
        w = jax.random.normal(ks[1], (n, ho, ho, heads, k * k, cw),
                              jnp.float32)
        dy = jax.random.normal(ks[2], (n, ho, ho, heads * c), jnp.float32)

        def f_ad(xp, w):
            return _agg_core_xla(xp, w, (k, k), (1, 1), (d, d))

        def f_cv(xp, w):
            return _agg_xla_stride1(xp, w, (k, k), (d, d))

        assert jnp.allclose(f_ad(xp, w), f_cv(xp, w))
        g_ad = jax.vjp(f_ad, xp, w)[1](dy)
        g_cv = jax.vjp(f_cv, xp, w)[1](dy)
        for a, b in zip(g_ad, g_cv):
            err = float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(a)) + 1e-9))
            assert err < 1e-5, (n, h, c, cw, heads, k, d, err)


def test_embed_gn_fused_vs_composition():
    """The eval mega-fusion (embed conv + GroupNorm + aggregation in one
    kernel) matches the unfused composition: conv -> SubChannelGroupNorm
    semantics -> aggregation."""
    import jax
    from cotnet_tpu.ops.local_agg import local_aggregate_embed_gn

    k = jax.random.PRNGKey(0)
    kx, kp, kw2, kb, kg, kbe = jax.random.split(k, 6)
    N, H, C, CP, K = 4, 14, 64, 32, 3
    CW = C // 8
    F = K * K * CW
    x = jax.random.normal(kx, (N, H, H, C), jnp.float32)
    wp = jax.random.normal(kp, (N, H, H, CP), jnp.float32)
    w2 = jax.random.normal(kw2, (CP, F), jnp.float32) * 0.1
    b2 = jax.random.normal(kb, (F,), jnp.float32) * 0.1
    gamma = jax.random.normal(kg, (F,), jnp.float32) * 0.2 + 1.0
    beta = jax.random.normal(kbe, (F,), jnp.float32) * 0.2

    # oracle: explicit conv -> per-(n, cw) GN over (H, W, K^2) -> aggregate
    wr = jnp.einsum("nhwc,cf->nhwf", wp, w2) + b2
    wrk = wr.reshape(N, H, H, K * K, CW)
    mean = jnp.mean(wrk, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(wrk, axis=(1, 2, 3), keepdims=True)
    wn = (wrk - mean) / jnp.sqrt(var + 1e-5)
    wn = wn * gamma.reshape(1, 1, 1, K * K, CW) + beta.reshape(
        1, 1, 1, K * K, CW)
    ref = local_aggregate(x, wn[:, :, :, None], kernel_size=K, padding=1,
                          impl="xla")

    for impl in ("pallas", "xla"):
        out = jax.jit(lambda *a: local_aggregate_embed_gn(
            a[0], a[1], a[2], a[3], a[4], a[5], kernel_size=K, padding=1,
            impl=impl))(x, wp, w2, b2, gamma, beta)
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 1e-3, (impl, err)

def test_affine_fold_vjp_matches_composition():
    """The affine-folded pallas op (aggregate with ``w*s + b``, the GroupNorm
    deferred-normalize fold) matches pre-applying the affine then running the
    plain op — forward AND all four cotangents (dx, dw, ds, db).  This is the
    COTNET_GN_FOLD_TRAIN backward path (one fused dw/ds/db kernel instead of
    materializing the normalized-weight cotangent for XLA's GN backward)."""
    import jax
    from cotnet_tpu.ops.local_agg_pallas import (
        agg_core_pallas, agg_core_pallas_affine, pallas_plan)

    for (n, h, c, cw, heads, k) in [(2, 14, 64, 8, 1, 3), (2, 8, 32, 4, 2, 3)]:
        pad = (k - 1) // 2
        ks = jax.random.split(jax.random.PRNGKey(n * h), 5)
        x = jax.random.normal(ks[0], (n, h, h, c), jnp.float32)
        w = jax.random.normal(ks[1], (n, h, h, heads, k * k, cw), jnp.float32)
        s = jax.random.normal(ks[2], (n, heads, k * k, cw), jnp.float32)
        b = jax.random.normal(ks[3], (n, heads, k * k, cw), jnp.float32)
        dy = jax.random.normal(ks[4], (n, h, h, heads * c), jnp.float32)
        plan = pallas_plan(x.shape, w.shape, 4, (pad, pad), affine=True)
        assert plan is not None and plan[0] == "whole", plan

        def fused(x, w, s, b):
            return agg_core_pallas_affine(x, w, s, b, (k, k), (1, 1),
                                          (pad, pad))

        def composed(x, w, s, b):
            wn = w * s[:, None, None] + b[:, None, None]
            return agg_core_pallas(x, wn, (k, k), (1, 1), (pad, pad))

        ya, prim_a = jax.vjp(fused, x, w, s, b)
        yb, prim_b = jax.vjp(composed, x, w, s, b)
        assert float(jnp.max(jnp.abs(ya - yb))) < 1e-4
        for name, ga, gb in zip("x w s b".split(), prim_a(dy), prim_b(dy)):
            err = float(jnp.max(jnp.abs(ga - gb))
                        / (jnp.max(jnp.abs(gb)) + 1e-9))
            assert err < 1e-5, (n, h, name, err)


def test_gn_fold_train_model_grads():
    """CotLayer gradients with the training-mode GroupNorm fold ON equal the
    unfused path's gradients (same params, same input) — the model-level gate
    for COTNET_GN_FOLD_TRAIN."""
    import jax
    import cotnet_tpu.models.cotnet as cm

    layer = cm.CotLayer(dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 14, 14, 32), jnp.float32)
    variables = layer.init({"params": jax.random.PRNGKey(1)}, x,
                           training=True)

    def loss(params, fold):
        old = (cm.GN_FOLD, cm.GN_FOLD_TRAIN)
        cm.GN_FOLD, cm.GN_FOLD_TRAIN = fold, fold
        try:
            out, _ = layer.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, training=True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out))
        finally:
            cm.GN_FOLD, cm.GN_FOLD_TRAIN = old

    l0, g0 = jax.value_and_grad(loss)(variables["params"], False)
    l1, g1 = jax.value_and_grad(loss)(variables["params"], True)
    # The fold is exact algebra but not exact arithmetic: the normalize
    # path hardwires f32 statistics, and w*s+b vs (w-mu)*inv*gamma+beta
    # rounds differently (cancellation near w~mu; measured per-element
    # <=2e-4 rel).  Summed over 2*14*14*32 sin outputs that lands at
    # ~1e-5 rel on the loss, and the exact residual shifts with unrelated
    # reduction-order changes elsewhere in the layer (e.g. LeanBatchNorm)
    # — bound it at the rounding scale, not below it.
    assert abs(float(l0 - l1)) / (abs(float(l0)) + 1e-9) < 1e-4, (
        float(l0), float(l1))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g1)}
    # Skip true-zero leaves: se_fc1.bias feeds a train-mode BN, so its real
    # gradient is exactly 0 (verified 7e-12 in f64 vs global max 349) and the
    # f32 leaf is pure cancellation noise — comparing noise against noise
    # reads as a large "error" on a correct fold.  Excluded by name (its
    # noise magnitude shifts with unrelated reduction-order changes, so a
    # magnitude filter alone is not stable).
    gmax = max(float(jnp.max(jnp.abs(v))) for _, v in flat0)
    for p, a in flat0:
        key = jax.tree_util.keystr(p)
        bq = flat1[key]
        if "se_fc1" in key and "bias" in key:
            continue
        if max(float(jnp.max(jnp.abs(a))),
               float(jnp.max(jnp.abs(bq)))) < 1e-4 * gmax:
            continue
        err = float(jnp.max(jnp.abs(a - bq)) / jnp.max(jnp.abs(a)))
        # w*s+b vs (w-mu)/sigma*gamma+beta is exact algebra but rounds
        # differently: b = beta - mu*s cancels catastrophically where
        # |mu| >> sigma, so the residual scales with the weight tensor's
        # mean/std ratio at this init, not with machine eps.  With the GN
        # statistics forced to f64 the two paths are bit-identical in loss
        # and every leaf agrees to <=1.1e-7 (verified r3) — the f32
        # residual (observed up to ~6e-3, shifts with unrelated
        # reduction-order changes upstream) is rounding amplification only.
        assert err < 2e-2, (jax.tree_util.keystr(p), err)


def test_dx_gather_vs_scatter_kernels():
    """Both dx kernel forms — scatter (in-place padded accumulator) and
    gather (SSA chain over shifted dy/w slices, COTNET_DX_GATHER) — match
    XLA autodiff grads, incl. dilation>1, heads>1, K=5."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.DX_GATHER, lap.DX_BIG_MAP_MIN, lap.FUSED_BWD)
    try:
        lap.FUSED_BWD = False  # exercise the two-launch dispatch
        lap.DX_BIG_MAP_MIN = 0  # force the big-map kernels on small shapes
        for (n, h, c, cw, heads, k, d) in [(2, 14, 64, 8, 1, 3, 1),
                                           (2, 9, 24, 3, 2, 3, 2),
                                           (2, 8, 32, 4, 1, 5, 1)]:
            pad = (d * (k - 1) + 1) // 2
            ks = jax.random.split(jax.random.PRNGKey(n + h), 2)
            x = jax.random.normal(ks[0], (n, h, h, c), jnp.float32)
            w = jax.random.normal(ks[1], (n, h, h, heads, k * k, cw),
                                  jnp.float32)

            def f(impl):
                return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                    x, w, kernel_size=k, padding=pad, dilation=d, impl=impl)))

            ga = jax.grad(f("xla"), (0, 1))(x, w)
            for gather in (True, False):
                lap.DX_GATHER = gather
                gb = jax.grad(f("pallas"), (0, 1))(x, w)
                for name, a, b in zip("xw", ga, gb):
                    rel = float(jnp.abs(a - b).max()
                                / (jnp.abs(a).max() + 1e-9))
                    assert rel < 1e-5, (n, h, k, d, gather, name, rel)
    finally:
        lap.DX_GATHER, lap.DX_BIG_MAP_MIN, lap.FUSED_BWD = old


def test_fused_dxdw_backward():
    """The single-launch fused dx+dw backward (COTNET_FUSED_BWD) — both the
    gather-dx and scatter-dx fused variants — matches XLA autodiff grads,
    incl. dilation>1, heads>1, K=5, and a shape under the big-map gate
    (scatter+slice-loop dw) vs over it (gather+dot dw)."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.FUSED_BWD, lap.DX_GATHER, lap.DX_BIG_MAP_MIN)
    try:
        lap.FUSED_BWD = True
        for (n, h, c, cw, heads, k, d, gather, big_min) in [
                (2, 14, 64, 8, 1, 3, 1, True, 0),       # gather + dot dw
                (2, 14, 64, 8, 1, 3, 1, True, 10**6),   # gather + slice dw
                (2, 14, 64, 8, 1, 3, 1, False, 10**6),  # scatter + slice dw
                (2, 9, 24, 3, 2, 3, 2, True, 0),        # dilated, 2 heads
                (2, 8, 32, 4, 1, 5, 1, True, 0),        # K=5
                (2, 8, 32, 4, 1, 5, 1, False, 10**6)]:
            lap.DX_GATHER = gather
            lap.DX_BIG_MAP_MIN = big_min
            pad = (d * (k - 1) + 1) // 2
            ks = jax.random.split(jax.random.PRNGKey(n * h + k), 2)
            x = jax.random.normal(ks[0], (n, h, h, c), jnp.float32)
            w = jax.random.normal(ks[1], (n, h, h, heads, k * k, cw),
                                  jnp.float32)

            def f(impl):
                return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                    x, w, kernel_size=k, padding=pad, dilation=d, impl=impl)))

            ga = jax.grad(f("xla"), (0, 1))(x, w)
            gb = jax.grad(f("pallas"), (0, 1))(x, w)
            for name, a, b in zip("xw", ga, gb):
                rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
                assert rel < 1e-5, (n, h, k, d, big_min, name, rel)
    finally:
        lap.FUSED_BWD, lap.DX_GATHER, lap.DX_BIG_MAP_MIN = old


def test_mix_fused_single_launch():
    """The fused dual-kernel path (impl='pallas' on the reference's exact
    K1=3/K2=5 SAME geometry — one launch per pass like the reference's
    aggregation_zeropad_mix.py:20-74 CUDA kernels): forward matches the
    brute-force oracle AND the composed formulation; both grads match the
    composed path's."""
    from cotnet_tpu.ops.local_agg_pallas import mix_plan

    n, c, cw, hi = 2, 8, 4, 6
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n, hi, hi, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(n, hi, hi, 1, 9, cw).astype(np.float32))
    w2 = jnp.asarray(rng.randn(n, hi, hi, 1, 25, cw).astype(np.float32))
    assert mix_plan(x.shape, w1.shape, w2.shape, 4) is not None

    y_f = local_aggregate_mix(x, w1, w2, impl="pallas")
    r1 = oracle_agg(np.asarray(x, np.float64), np.asarray(w1, np.float64),
                    3, 1, 1, 1)
    r2 = oracle_agg(np.asarray(x, np.float64), np.asarray(w2, np.float64),
                    5, 1, 2, 1)
    np.testing.assert_allclose(np.asarray(y_f), np.concatenate([r1, r2], -1),
                               rtol=1e-4, atol=1e-4)

    def loss(fn):
        def f(x, w1, w2):
            return jnp.sum(fn(x, w1, w2).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))

    g_f = loss(lambda *a: local_aggregate_mix(*a, impl="pallas"))(x, w1, w2)
    g_x = loss(lambda *a: local_aggregate_mix(*a, impl="xla"))(x, w1, w2)
    for name, a, b in zip(("dx", "dw1", "dw2"), g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    # merge variant routes through the same fused kernel
    wm = jnp.concatenate([w1, w2], axis=4)
    ym = local_aggregate_mix_merge(x, wm, impl="pallas")
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y_f),
                               rtol=1e-6, atol=1e-6)

    # multi-head + grouped channels exercise the kernel-major halves
    w1h = jnp.asarray(rng.randn(n, hi, hi, 2, 9, cw).astype(np.float32))
    w2h = jnp.asarray(rng.randn(n, hi, hi, 2, 25, cw).astype(np.float32))
    yh = local_aggregate_mix(x, w1h, w2h, impl="pallas")
    o1 = oracle_agg(np.asarray(x, np.float64), np.asarray(w1h, np.float64),
                    3, 1, 1, 1)
    o2 = oracle_agg(np.asarray(x, np.float64), np.asarray(w2h, np.float64),
                    5, 1, 2, 1)
    np.testing.assert_allclose(np.asarray(yh), np.concatenate([o1, o2], -1),
                               rtol=1e-4, atol=1e-4)


def test_m_pack_big_map_parity():
    """m>1 block packing on big maps (COTNET_M_MAX_MAP, r4): fwd + fused
    dx/dw at an m=2-eligible geometry must match the XLA formulation and the
    oracle exactly as m=1 does."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = lap.M_PACK_MAX_MAP
    try:
        lap.M_PACK_MAX_MAP = 784
        n, h, c, cw, k = 4, 14, 32, 4, 3
        plan = lap.pallas_plan((n, h, h, c), (n, h, h, 1, k * k, cw), 4,
                               (1, 1))
        assert plan is not None and plan[0] == "whole" and plan[1] > 1, plan
        ks = jax.random.split(jax.random.PRNGKey(7), 2)
        x = np.asarray(jax.random.normal(ks[0], (n, h, h, c), jnp.float32))
        w = np.asarray(jax.random.normal(
            ks[1], (n, h, h, 1, k * k, cw), jnp.float32))
        out = local_aggregate(jnp.asarray(x), jnp.asarray(w), kernel_size=k,
                              padding=1, impl="pallas")
        ref = oracle_agg(x.astype(np.float64), w.astype(np.float64), k, 1, 1,
                         1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

        def f(impl):
            return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                x, w, kernel_size=k, padding=1, impl=impl)))

        ga = jax.grad(f("xla"), (0, 1))(jnp.asarray(x), jnp.asarray(w))
        gb = jax.grad(f("pallas"), (0, 1))(jnp.asarray(x), jnp.asarray(w))
        for name, a, b in zip("xw", ga, gb):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert rel < 1e-5, (name, rel)
    finally:
        lap.M_PACK_MAX_MAP = old


def test_chwn_kernels_parity():
    """The CHWN (batch-on-lanes) kernels (COTNET_CHWN): forward and the
    fused dx+dw backward in the [G, Cw, H, W, N] layout match the XLA
    formulation and the numpy oracle, including a forced G split (nsplit>1,
    the cross-split f32 dw re-accumulation) and dilation>1."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap._CHWN_BUDGET_BYTES)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        for (n, h, c, cw, k, d, split) in [
                (4, 9, 16, 2, 3, 1, False),   # g=8, one grid split
                (4, 9, 16, 2, 3, 1, True),    # forced G split (nsplit>1)
                (4, 8, 24, 3, 5, 1, False),   # K=5
                (4, 9, 16, 4, 3, 2, False),   # dilated
        ]:
            lap._CHWN_BUDGET_BYTES = old[2]
            pad = (d * (k - 1) + 1) // 2
            xs = (n, h, h, c)
            ws = (n, h, h, 1, k * k, cw)
            if split:
                # shrink the budget until the plan splits G
                plan = lap.chwn_plan(xs, ws, 4, (pad, pad))
                assert plan is not None
                while lap.chwn_plan(xs, ws, 4, (pad, pad))[1] == c // cw:
                    lap._CHWN_BUDGET_BYTES //= 2
            plan = lap.chwn_plan(xs, ws, 4, (pad, pad))
            assert plan is not None, (n, h, c, cw, k, d)
            if split:
                assert plan[1] < c // cw, plan
            ks = jax.random.split(jax.random.PRNGKey(h * c + k), 2)
            x = np.asarray(jax.random.normal(ks[0], xs, jnp.float32))
            w = np.asarray(jax.random.normal(ks[1], ws, jnp.float32))
            out = local_aggregate(jnp.asarray(x), jnp.asarray(w),
                                  kernel_size=k, padding=pad, dilation=d,
                                  impl="pallas")
            ref = oracle_agg(x.astype(np.float64), w.astype(np.float64),
                             k, 1, pad, d)
            np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

            def f(impl):
                return lambda x, w: jnp.sum(jnp.sin(local_aggregate(
                    x, w, kernel_size=k, padding=pad, dilation=d,
                    impl=impl)))

            ga = jax.grad(f("xla"), (0, 1))(jnp.asarray(x), jnp.asarray(w))
            gb = jax.grad(f("pallas"), (0, 1))(jnp.asarray(x),
                                               jnp.asarray(w))
            for name, a, b in zip("xw", ga, gb):
                rel = float(jnp.abs(a - b).max()
                            / (jnp.abs(a).max() + 1e-9))
                assert rel < 1e-5, (n, h, k, d, split, name, rel)
    finally:
        lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap._CHWN_BUDGET_BYTES = old


def test_chwn_affine_fwd_parity():
    """CHWN affine-folded forward (the eval GroupNorm fold) == aggregation
    with the normalized weight materialized outside."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        n, h, c, cw, k = 4, 9, 16, 2, 3
        assert lap.chwn_plan((n, h, h, c), (n, h, h, 1, k * k, cw), 4,
                             (1, 1)) is not None
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        x = jax.random.normal(ks[0], (n, h, h, c), jnp.float32)
        w = jax.random.normal(ks[1], (n, h, h, 1, k * k, cw), jnp.float32)
        s = jax.random.normal(ks[2], (n, 1, k * k, cw), jnp.float32)
        b = jax.random.normal(ks[3], (n, 1, k * k, cw), jnp.float32)
        got = lap.agg_core_pallas_affine(x, w, s, b, (k, k), (1, 1), (1, 1))
        wn = w * s[:, None, None] + b[:, None, None]
        ref = local_aggregate(x, wn, kernel_size=k, padding=1, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
    finally:
        lap.CHWN_DISPATCH, lap.CHWN_ANY_N = old


def test_chwn_bf16_production_shape():
    """VERDICT r4 #7: pin CHWN bf16 at a production shape (stage-2 28x28,
    C=128, share_planes 8, N=128 — the shape whose dw divergence vs the
    NHWC MXU dw was only prose).  The CHWN chain is bf16 I/O with pure-f32
    accumulation, so its error vs the f32 XLA formulation must stay at
    bf16-rounding scale; measured (interpret mode, this exact setup):
    fwd 2.5e-3 / dx 4.5e-3 / dw 4.6e-3 max-rel vs max|ref| — bounds pinned
    at 2x so any CHWN bf16 drift (e.g. a truncating accumulation sneaking
    in, like the NHWC dw's 1.25e-1) fails here."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = lap.CHWN_DISPATCH
    try:
        lap.CHWN_DISPATCH = True
        n, h, c, cw, k = 128, 28, 128, 16, 3
        xs, ws = (n, h, h, c), (n, h, h, 1, k * k, cw)
        assert lap.chwn_plan(xs, ws, 2, (1, 1)) is not None

        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], xs, jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(ks[1], ws, jnp.float32).astype(jnp.bfloat16)
        dy = jax.random.normal(ks[2], xs, jnp.float32)

        def run(impl, dtype):
            xx, wz = x.astype(dtype), w.astype(dtype)

            def f(x_, w_):
                y = local_aggregate(x_, w_, kernel_size=k, padding=1,
                                    impl=impl)
                return jnp.vdot(y.astype(jnp.float32), dy)

            g = jax.grad(f, (0, 1))(xx, wz)
            y = local_aggregate(xx, wz, kernel_size=k, padding=1, impl=impl)
            return (y.astype(jnp.float32), g[0].astype(jnp.float32),
                    g[1].astype(jnp.float32))

        got = run("pallas", jnp.bfloat16)
        ref = run("xla", jnp.float32)
        for name, a, b, bound in zip(
                ("fwd", "dx", "dw"), got, ref, (6e-3, 1.2e-2, 1.2e-2)):
            rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
            assert rel <= bound, (name, rel, bound)
    finally:
        lap.CHWN_DISPATCH = old


def test_chwn_strip_bwd_bf16_stage1_geometry():
    """The in-kernel-g strip backward (chwn_strip_bwd_plan, the stage-1
    1.74x) in bf16 at the production stage-1 geometry — H=56, C=64, cw=8
    (g=8), hs=4 — vs the f32 XLA formulation.  N reduced to 8 via the
    ANY_N interpret escape so CI stays cheap; H/C/cw/hs (the strip/halo
    geometry, the g loop, the f32 SSA dw chain) are the real ones.  The
    on-chip A/B saw dx max-abs 1.25e-1 at unit-normal scale (bf16
    rounding of the 9-tap sum; dw exact vs the gather-VJP) — measured
    (interpret mode, this exact setup): dx 3.2e-3 / dw 3.7e-3 max-rel vs
    max|ref|; bounds pinned at ~2x so any CHWN strip-bwd bf16 drift
    (e.g. a truncating accumulation sneaking in) fails here."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
           lap.pallas_plan)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        lap.chwn_plan = lambda *a, **k: None      # force whole-image off
        lap.pallas_plan = lambda *a, **k: None    # force NHWC plans off
        n, h, c, cw, k = 8, 56, 64, 8, 3
        xs, ws = (n, h, h, c), (n, h, h, 1, k * k, cw)
        assert lap.chwn_strip_bwd_plan(xs, ws, 2, (1, 1)) == 4

        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], xs, jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(ks[1], ws, jnp.float32).astype(jnp.bfloat16)
        dy = jax.random.normal(ks[2], xs, jnp.float32)

        def run(impl, dtype):
            def f(x_, w_):
                y = local_aggregate(x_, w_, kernel_size=k, padding=1,
                                    impl=impl)
                return jnp.vdot(y.astype(jnp.float32), dy)

            g = jax.grad(f, (0, 1))(x.astype(dtype), w.astype(dtype))
            return g[0].astype(jnp.float32), g[1].astype(jnp.float32)

        got = run("pallas", jnp.bfloat16)
        ref = run("xla", jnp.float32)
        for name, a, b, bound in zip(("dx", "dw"), got, ref,
                                     (7e-3, 8e-3)):
            rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
            assert rel <= bound, (name, rel, bound)
    finally:
        (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
         lap.pallas_plan) = old


def test_chwn_resident_weights():
    """agg_core_pallas_wt (COTNET_CHWN_W): CHWN-resident weight input, dw
    returned in the same layout — must match the NHWC formulation for fwd
    and both grads, and the CotLayer wt path must reproduce the standard
    path with the IDENTICAL param tree (checkpoints interchange)."""
    import cotnet_tpu.models.cotnet as cm
    import cotnet_tpu.ops.local_agg_pallas as lap
    from cotnet_tpu.ops import local_aggregate_wt

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.CHWN_W)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        n, h, c, cw, k = 4, 9, 16, 2, 3
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (n, h, h, c), jnp.float32)
        w = jax.random.normal(ks[1], (n, h, h, 1, k * k, cw), jnp.float32)
        dy = jax.random.normal(ks[2], (n, h, h, c), jnp.float32)
        wt = jnp.transpose(w[:, :, :, 0], (4, 3, 1, 2, 0))
        assert lap.chwn_wt_plan(x.shape, wt.shape, 4, (1, 1)) is not None

        ref = local_aggregate(x, w, kernel_size=k, padding=1, impl="xla")
        got = local_aggregate_wt(x, wt, kernel_size=k, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

        def f_ref(x_, w_):
            return jnp.vdot(local_aggregate(
                x_, w_, kernel_size=k, padding=1, impl="xla"), dy)

        def f_wt(x_, wt_):
            return jnp.vdot(local_aggregate_wt(
                x_, wt_, kernel_size=k, padding=1), dy)

        gx_r, gw_r = jax.grad(f_ref, (0, 1))(x, w)
        gx_t, gwt = jax.grad(f_wt, (0, 1))(x, wt)
        np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_r),
                                   atol=2e-5)
        gwt_nhwc = jnp.transpose(gwt, (4, 2, 3, 1, 0))[:, :, :, None]
        np.testing.assert_allclose(np.asarray(gwt_nhwc), np.asarray(gw_r),
                                   atol=2e-5)

        # model level: CotLayer wt path == standard path, same param tree
        dim = 16
        xm = jax.random.normal(jax.random.PRNGKey(3), (n, h, h, dim),
                               jnp.float32)
        layer = cm.CotLayer(dim=dim, kernel_size=3)
        lap.CHWN_W = False
        v0 = jax.jit(lambda r, xx: layer.init(
            {"params": r}, xx, training=True))(jax.random.PRNGKey(1), xm)

        def loss(variables, gate):
            lap.CHWN_W = gate
            out, _ = layer.apply(variables, xm, training=True,
                                 mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out)), out

        (l0, o0), g0 = jax.value_and_grad(
            lambda v: loss(v, False), has_aux=True)(v0)
        (l1, o1), g1 = jax.value_and_grad(
            lambda v: loss(v, True), has_aux=True)(v0)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=2e-4)
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0],
                jax.tree_util.tree_flatten_with_path(g1)[0]):
            scale = float(jnp.abs(a).max())
            # leaves whose gradient is mathematically ~zero (e.g. a bias
            # feeding straight into BN) carry only rounding noise — bound
            # them absolutely; real leaves (scale O(10)) get a rel bound
            tol = 1e-3 if scale < 1e-2 else 2e-4 * scale
            assert float(jnp.abs(a - b).max()) <= tol, (p, scale)
        # identical param trees (the wt path re-declares the same modules)
        lap.CHWN_W = True
        v1 = jax.jit(lambda r, xx: layer.init(
            {"params": r}, xx, training=True))(jax.random.PRNGKey(1), xm)
        assert jax.tree_util.tree_structure(v0) == \
            jax.tree_util.tree_structure(v1)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape and a.dtype == b.dtype, v0, v1))
    finally:
        lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.CHWN_W = old


def test_chwn_strip_stage1_dispatch():
    """The CHWN H-strip forms (the stage-1 wins: fwd 1.28x on chip, the
    in-kernel-g strip backward 1.74x over the XLA VJP): parity vs the
    XLA formulation for fwd, grads, and the affine (GN-fold) form,
    exercised by forcing the whole-image plans off so the strip plans
    dispatch (both the forward's and the backward's plan are asserted
    non-None, so the grad check really covers _agg_bwd_chwn_strip)."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
           lap.pallas_plan)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        lap.chwn_plan = lambda *a, **k: None      # force whole-image off
        lap.pallas_plan = lambda *a, **k: None    # force NHWC plans off
        n, h, c, cw, k = 4, 8, 16, 2, 3
        xs = (n, h, h, c)
        ws = (n, h, h, 1, k * k, cw)
        sp = lap.chwn_strip_plan(xs, ws, 4, (1, 1))
        assert sp is not None and h % sp[0] == 0 and (c // cw) % sp[1] == 0, sp
        bs = lap.chwn_strip_bwd_plan(xs, ws, 4, (1, 1))
        assert bs is not None and h % bs == 0, bs
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        x = jax.random.normal(ks[0], xs, jnp.float32)
        w = jax.random.normal(ks[1], ws, jnp.float32)
        dy = jax.random.normal(ks[2], xs, jnp.float32)

        ref = local_aggregate(x, w, kernel_size=k, padding=1, impl="xla")
        got = local_aggregate(x, w, kernel_size=k, padding=1, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

        def f(impl):
            return lambda x_, w_: jnp.vdot(local_aggregate(
                x_, w_, kernel_size=k, padding=1, impl=impl), dy)

        ga = jax.grad(f("xla"), (0, 1))(x, w)
        gb = jax.grad(f("pallas"), (0, 1))(x, w)
        for name, a, b in zip("xw", ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, err_msg=name)

        # affine (GN fold) strip form == aggregation of the materialized
        # normalized weight
        s = jax.random.normal(ks[3], (n, 1, k * k, cw), jnp.float32)
        b = jax.random.normal(ks[4], (n, 1, k * k, cw), jnp.float32)
        got_a = local_aggregate(x, w, kernel_size=k, padding=1,
                                impl="pallas", w_scale=s, w_bias=b)
        wn = w * s[:, None, None] + b[:, None, None]
        ref_a = local_aggregate(x, wn, kernel_size=k, padding=1, impl="xla")
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                                   atol=2e-4)
    finally:
        (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
         lap.pallas_plan) = old

def test_chwn_strip_bwd_gsplit_dispatch():
    """The strip backward also claims shapes where the WHOLE-IMAGE CHWN
    backward would split G (gs_bwd < g) — in-model that is 28x28x128
    (gs_bwd=4: w refetched twice, dw summed from partials), where the
    strip form measured 1.23x on chip.  Force the G-split scenario by
    pinning chwn_plan to (g, g//2) on a toy shape: chwn_strip_bwd_plan
    must claim it, _agg_bwd_rule must route grads through
    _agg_bwd_chwn_strip, and the grads must match the XLA formulation.
    With full-g whole-image (g, g) the strip plan must decline."""
    import cotnet_tpu.ops.local_agg_pallas as lap

    old = (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
           lap.pallas_plan)
    try:
        lap.CHWN_DISPATCH = True
        lap.CHWN_ANY_N = True
        n, h, c, cw, k = 4, 8, 16, 2, 3
        g = c // cw
        xs = (n, h, h, c)
        ws = (n, h, h, 1, k * k, cw)
        lap.pallas_plan = lambda *a, **k_: None   # force NHWC plans off
        lap.chwn_plan = lambda *a, **k_: (g, g)   # full-g whole-image
        assert lap.chwn_strip_bwd_plan(xs, ws, 4, (1, 1)) is None
        lap.chwn_plan = lambda *a, **k_: (g, g // 2)  # G-split backward
        bs = lap.chwn_strip_bwd_plan(xs, ws, 4, (1, 1))
        assert bs is not None and h % bs == 0, bs

        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        x = jax.random.normal(ks[0], xs, jnp.float32)
        w = jax.random.normal(ks[1], ws, jnp.float32)
        dy = jax.random.normal(ks[2], xs, jnp.float32)

        def f(impl):
            return lambda x_, w_: jnp.vdot(local_aggregate(
                x_, w_, kernel_size=k, padding=1, impl=impl), dy)

        ga = jax.grad(f("xla"), (0, 1))(x, w)
        gb = jax.grad(f("pallas"), (0, 1))(x, w)
        for name, a, b in zip("xw", ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, err_msg=name)
    finally:
        (lap.CHWN_DISPATCH, lap.CHWN_ANY_N, lap.chwn_plan,
         lap.pallas_plan) = old
