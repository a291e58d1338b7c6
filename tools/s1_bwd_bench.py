"""Stage-1 (56x56x64) XLA agg backward shootout, chained at bs128 bf16.

Variants:
  cur    — the shipped gather custom-VJP (f32 upcasts materialized)
  bf16p  — same structure, products in bf16, f32 accumulation only
           (jnp.sum(dtype=f32)): no standalone convert_element_type pass
  auto   — plain autodiff of the gather forward (the pre-VJP baseline)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import cotnet_tpu.ops.local_agg as la

ITERS = 20
N, H, C, CW, K = 128, 56, 64, 8, 3
PAD = 1


def bf16p_bwd(kernel_size, dilation, res, dy):
    """Variant: keep everything in the model dtype; only the accumulations
    are f32 (jnp.sum dtype) so no big converted copy is materialized."""
    xp, w = res
    n, hp, wpd, c = xp.shape
    _, ho, wo, heads, k2, cw = w.shape
    kh, kw = kernel_size
    dh, dw_ = dilation
    g = c // cw
    dyh = dy.reshape(n, ho, wo, heads, g, cw)

    dws = []
    dxp = None
    for ikh in range(kh):
        for ikw in range(kw):
            h0, w0 = ikh * dh, ikw * dw_
            xs = lax.slice(xp, (0, h0, w0, 0), (n, h0 + ho, w0 + wo, c))
            xs6 = xs.reshape(n, ho, wo, 1, g, cw)
            dws.append(jnp.sum(xs6 * dyh, axis=4, dtype=jnp.float32))
            wk = w[:, :, :, :, ikh * kw + ikw, :]
            q = jnp.sum(wk[:, :, :, :, None, :] * dyh, axis=3,
                        dtype=jnp.float32)
            q = q.reshape(n, ho, wo, c)
            qp = jnp.pad(q, ((0, 0), (h0, hp - ho - h0),
                             (w0, wpd - wo - w0), (0, 0)))
            dxp = qp if dxp is None else dxp + qp
    dwt = jnp.stack(dws, axis=4)
    return dxp.astype(xp.dtype), dwt.astype(w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def agg_bf16p(xp, w, kernel_size, dilation):
    return la._agg_core_xla(xp, w, kernel_size, (1, 1), dilation)


agg_bf16p.defvjp(lambda xp, w, ks, d: (agg_bf16p(xp, w, ks, d), (xp, w)),
                 bf16p_bwd)


def _dx_variant_bwd(mode, kernel_size, dilation, res, dy):
    """dx-side variants; dw side identical to bf16p.

    mode='onesum': per-tap products stay bf16, all 9 padded taps feed ONE
    jnp.sum(stack, dtype=f32) — no per-tap f32 accumulator round-trip.
    mode='bf16acc': SSA chain accumulates in bf16 (cheapest traffic,
    9-term bf16 accumulation error).
    """
    xp, w = res
    n, hp, wpd, c = xp.shape
    _, ho, wo, heads, k2, cw = w.shape
    kh, kw = kernel_size
    dh, dw_ = dilation
    g = c // cw
    dyh = dy.reshape(n, ho, wo, heads, g, cw)

    dws = []
    qs = []
    dxp = None
    for ikh in range(kh):
        for ikw in range(kw):
            h0, w0 = ikh * dh, ikw * dw_
            xs = lax.slice(xp, (0, h0, w0, 0), (n, h0 + ho, w0 + wo, c))
            xs6 = xs.reshape(n, ho, wo, 1, g, cw)
            dws.append(jnp.sum(xs6 * dyh, axis=4, dtype=jnp.float32))
            wk = w[:, :, :, :, ikh * kw + ikw, :]
            q = jnp.sum(wk[:, :, :, :, None, :] * dyh, axis=3,
                        dtype=jnp.float32)
            q = q.reshape(n, ho, wo, c).astype(xp.dtype)
            qp = jnp.pad(q, ((0, 0), (h0, hp - ho - h0),
                             (w0, wpd - wo - w0), (0, 0)))
            if mode == "onesum":
                qs.append(qp)
            else:
                dxp = qp if dxp is None else dxp + qp
    if mode == "onesum":
        dxp = jnp.sum(jnp.stack(qs), axis=0, dtype=jnp.float32)
    dwt = jnp.stack(dws, axis=4)
    return dxp.astype(xp.dtype), dwt.astype(w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def agg_onesum(xp, w, kernel_size, dilation):
    return la._agg_core_xla(xp, w, kernel_size, (1, 1), dilation)


agg_onesum.defvjp(lambda xp, w, ks, d: (agg_onesum(xp, w, ks, d), (xp, w)),
                  functools.partial(_dx_variant_bwd, "onesum"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def agg_bf16acc(xp, w, kernel_size, dilation):
    return la._agg_core_xla(xp, w, kernel_size, (1, 1), dilation)


agg_bf16acc.defvjp(lambda xp, w, ks, d: (agg_bf16acc(xp, w, ks, d), (xp, w)),
                   functools.partial(_dx_variant_bwd, "bf16acc"))


def chain_grad(fn):
    @jax.jit
    def chained(x0, w):
        def body(_, xx):
            g = jax.grad(lambda a, b: jnp.sum(
                fn(a, b).astype(jnp.float32) ** 2) / xx.size, (0, 1))(xx, w)
            return (xx + 0.0 * g[0]).astype(xx.dtype)
        return lax.fori_loop(0, ITERS, body, x0)
    return chained


def main():
    ks, kd = jax.random.split(jax.random.PRNGKey(0))
    xp = jax.random.normal(ks, (N, H + 2 * PAD, H + 2 * PAD, C), jnp.bfloat16)
    w = jax.random.normal(kd, (N, H, H, 1, K * K, CW), jnp.bfloat16)
    print("devices:", jax.devices(), flush=True)

    variants = {
        "cur": lambda a, b: la._agg_xla_stride1(a, b, (K, K), (1, 1)),
        "bf16p": lambda a, b: agg_bf16p(a, b, (K, K), (1, 1)),
        "onesum": lambda a, b: agg_onesum(a, b, (K, K), (1, 1)),
        "bf16acc": lambda a, b: agg_bf16acc(a, b, (K, K), (1, 1)),
        "auto": lambda a, b: la._agg_core_xla(a, b, (K, K), (1, 1), (1, 1)),
    }
    # parity first (vs cur, f32 math)
    dyf = jax.random.normal(jax.random.PRNGKey(2), (N // 16, H, H, C))
    xs = xp[:N // 16].astype(jnp.float32)
    ws = w[:N // 16].astype(jnp.float32)
    ga = jax.jit(jax.grad(lambda a, b: jnp.sum(
        variants["cur"](a, b) * dyf), (0, 1)))(xs, ws)
    for name in ("bf16p", "onesum", "bf16acc"):
        gb = jax.jit(jax.grad(lambda a, b: jnp.sum(
            variants[name](a, b) * dyf), (0, 1)))(xs, ws)
        for pname, a, b in zip("xw", ga, gb):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            print(f"parity {name} d{pname}: {rel:.2e}", flush=True)

    for name, fn in variants.items():
        ch = chain_grad(fn)
        out = ch(xp, w)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        out = ch(xp, w)
        np.asarray(out.ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:7.3f} ms (fwd+bwd)", flush=True)


main()
