"""Per-shape conv fwd/dgrad/wgrad timing on the real chip for the cotnet50
conv inventory — locates the excess in the train step's 30.5 ms of backward
convolution fusions (trace: fwd convs 8.7 ms, so bwd should be ~17 ms at
2x; tools/train_attr.py r3).

For each conv shape, times fwd, grad-wrt-input (dgrad) and grad-wrt-kernel
(wgrad) separately with the chained-fori-loop pattern, and for the grouped
3x3 key_embed convs also times a dense (groups=1) equivalent — grouped-conv
wgrad lowers to tiny per-group matmuls that may underuse the MXU, in which
case a masked dense formulation (4x FLOPs, block-diagonal kernel) could
still win.

Usage: python tools/conv_bwd_bench.py [bs]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def chain_time(step, seed, *args):
    @jax.jit
    def chain(x0, *a):
        def body(_, xx):
            y = step(xx, *a)
            bump = jnp.where(jnp.isnan(jnp.sum(y.astype(jnp.float32))),
                             1.0, 0.0).astype(xx.dtype)
            return xx + bump
        return jax.lax.fori_loop(0, ITERS, body, x0)

    out = chain(seed, *args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    out = chain(seed, *args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def conv(x, w, stride=1, groups=1, pad=None):
    k = w.shape[0]
    pad = k // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def bench_shape(name, n, h, cin, cout, k, stride=1, groups=1,
                dtype=jnp.bfloat16):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, h, cin), dtype)
    w = jax.random.normal(kw, (k, k, cin // groups, cout), dtype) * 0.05

    f = functools.partial(conv, stride=stride, groups=groups)

    def loss(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32) ** 2)

    dx = jax.grad(loss, argnums=0)
    dw = jax.grad(loss, argnums=1)

    tf_ = chain_time(lambda x_, w_: f(x_, w_), x, w)
    tdx = chain_time(lambda x_, w_: dx(x_, w_), x, w)
    # chain through w for wgrad (output is kernel-shaped)
    tdw = chain_time(lambda w_, x_: dw(x_, w_), w, x)
    flops = 2 * n * (h // stride) ** 2 * k * k * (cin // groups) * cout
    print(f"{name:28s} fwd {tf_*1e3:7.3f}  dx {tdx*1e3:7.3f}  "
          f"dw {tdw*1e3:7.3f} ms   bwd/fwd {(tdx+tdw)/tf_:5.2f}  "
          f"fwd_tflops {flops/tf_/1e12:6.2f}", flush=True)
    return tf_, tdx, tdw


def bench_strided_1x1(name, n, h, cin, cout, dtype=jnp.bfloat16):
    """Downsample 1x1 stride-2 conv vs the slice-then-matmul identity
    (conv1x1 s2 == x[:, ::2, ::2, :] @ W): forward is trivially equal; the
    interesting number is dx, where the conv form transposes to an
    lhs-dilated conv while the slice form is a dense matmul + interior pad."""
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, h, cin), dtype)
    w = jax.random.normal(kw, (1, 1, cin, cout), dtype) * 0.05

    def f_conv(x_, w_):
        return conv(x_, w_, stride=2, pad=0)

    def f_slice(x_, w_):
        return conv(x_[:, ::2, ::2, :], w_, stride=1, pad=0)

    for tag, f in (("conv", f_conv), ("slice", f_slice)):
        def loss(x_, w_):
            return jnp.sum(f(x_, w_).astype(jnp.float32) ** 2)
        dx = jax.grad(loss, argnums=0)
        dw = jax.grad(loss, argnums=1)
        tf_ = chain_time(f, x, w)
        tdx = chain_time(dx, x, w)
        tdw = chain_time(lambda w_, x_: dw(x_, w_), w, x)
        print(f"{name+' '+tag:28s} fwd {tf_*1e3:7.3f}  dx {tdx*1e3:7.3f}  "
              f"dw {tdw*1e3:7.3f} ms   bwd/fwd {(tdx+tdw)/tf_:5.2f}",
              flush=True)


def bench_maxpool(name, n, h, c, dtype=jnp.bfloat16):
    """Stem maxpool 3x3 s2 fwd + bwd (select_and_scatter)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, h, c), dtype)

    def f(x_):
        return jax.lax.reduce_window(
            x_, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def loss(x_):
        return jnp.sum(f(x_).astype(jnp.float32) ** 2)

    dx = jax.grad(loss)
    tf_ = chain_time(f, x)
    tdx = chain_time(dx, x)
    print(f"{name:28s} fwd {tf_*1e3:7.3f}  dx {tdx*1e3:7.3f} ms   "
          f"bwd/fwd {tdx/tf_:5.2f}", flush=True)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("devices:", jax.devices(), "bs", bs, flush=True)
    # stem
    bench_shape("stem7x7 224 3->64 s2", bs, 224, 3, 64, 7, stride=2)
    bench_maxpool("stem maxpool3x3 s2 112 64", bs, 112, 64)
    # downsample 1x1 stride-2 per stage transition, conv vs slice form
    for h, cin, cout in [(56, 256, 512), (28, 512, 1024), (14, 1024, 2048)]:
        bench_strided_1x1(f"ds1x1 s2 {h} {cin}", bs, h, cin, cout)
    # key_embed grouped 3x3 per stage (cotnet50 dims) + dense equivalents
    for h, dim in [(56, 64), (28, 128), (14, 256), (7, 512)]:
        bench_shape(f"key3x3 g4 {h} {dim}", bs, h, dim, dim, 3, groups=4)
        bench_shape(f"key3x3 g1 {h} {dim}", bs, h, dim, dim, 3, groups=1)
    # representative 1x1s per stage (in->out widest pair)
    for h, cin, cout, tag in [(56, 64, 256, "l1 conv3"),
                              (56, 256, 64, "l1 conv1"),
                              (56, 128, 32, "l1 embed1"),
                              (56, 32, 72, "l1 embed2"),
                              (28, 512, 128, "l2 conv1"),
                              (28, 128, 512, "l2 conv3"),
                              (14, 1024, 256, "l3 conv1"),
                              (14, 256, 1024, "l3 conv3"),
                              (7, 2048, 512, "l4 conv1"),
                              (7, 512, 2048, "l4 conv3")]:
        bench_shape(f"1x1 {tag}", bs, h, cin, cout, 1)


if __name__ == "__main__":
    main()
