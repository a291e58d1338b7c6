"""Platform envelope re-measurement (r4): the r2 roofline.py numbers
(127 GB/s elementwise, 64 TFLOP/s bf16 matmul) are CONTRADICTED by the r4
train-trace — layer1 add fusions move their modeled bytes at ~680 GB/s and
several conv fusions exceed the 64 TFLOP/s line — so every %-of-bound
claim built on them is suspect.  This probes each axis at several sizes
and operand counts to find the real ceilings (and whether the old numbers
were a small-shape / relay artifact).

Run: python -u tools/roofline2.py [OUT.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters, repeats=3):
    np.asarray(fn(*args).ravel()[0])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args).ravel()[0])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


res = {"platform": str(jax.devices())}
print(res["platform"], flush=True)

# --- elementwise bandwidth: 1-operand scale (r2 form) and 2-operand add,
# over sizes from 13 MB to 412 MB ---
for mb, shape in [(13, (64, 56, 56, 64)), (51, (256, 56, 56, 64)),
                  (206, (1024, 56, 56, 64))]:
    x = jnp.ones(shape, jnp.bfloat16)

    @jax.jit
    def scale(x):
        def body(i, x):
            return x * jnp.asarray(1.0000001, x.dtype)
        return lax.fori_loop(0, 50, body, x)

    dt = timeit(scale, x, iters=50)
    gbps = 2 * x.size * 2 / dt / 1e9
    res[f"scale_bf16_{mb}MB_GBps"] = round(gbps, 1)
    print(f"scale bf16 {mb}MB: {dt*1e6:.1f} us -> {gbps:.0f} GB/s",
          flush=True)

    y = jnp.ones(shape, jnp.bfloat16)

    @jax.jit
    def add2(x, y):
        def body(i, x):
            return x + y
        return lax.fori_loop(0, 50, body, x)

    dt = timeit(add2, x, y, iters=50)
    gbps = 3 * x.size * 2 / dt / 1e9
    res[f"add2_bf16_{mb}MB_GBps"] = round(gbps, 1)
    print(f"add2  bf16 {mb}MB: {dt*1e6:.1f} us -> {gbps:.0f} GB/s",
          flush=True)

# f32 variant at one size (is the ceiling dtype-sensitive?)
xf = jnp.ones((256, 56, 56, 64), jnp.float32)


@jax.jit
def scale_f32(x):
    def body(i, x):
        return x * jnp.asarray(1.0000001, x.dtype)
    return lax.fori_loop(0, 50, body, x)


dt = timeit(scale_f32, xf, iters=50)
res["scale_f32_103MB_GBps"] = round(2 * xf.size * 4 / dt / 1e9, 1)
print(f"scale f32 103MB: {dt*1e6:.1f} us -> "
      f"{res['scale_f32_103MB_GBps']:.0f} GB/s", flush=True)

# --- MXU: square matmuls 2048..8192 ---
for n in (2048, 4096, 8192):
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(i, a):
            return (a @ a) * jnp.asarray(1e-9, a.dtype)
        return lax.fori_loop(0, 20, body, a)

    dt = timeit(mm, a, iters=20)
    tf = 2 * n ** 3 / dt / 1e12
    res[f"matmul_{n}_TFLOPs"] = round(tf, 1)
    print(f"matmul {n}: {dt*1e3:.3f} ms -> {tf:.1f} TFLOP/s", flush=True)

# --- conv (the shape class the train step actually runs) ---
for (b, hw, cin, cout, k) in [(128, 56, 64, 64, 3), (128, 28, 128, 128, 3),
                              (128, 56, 64, 256, 1)]:
    xc = jnp.ones((b, hw, hw, cin), jnp.bfloat16)
    kk = jnp.ones((k, k, cin, cout), jnp.bfloat16)

    @jax.jit
    def conv(xc, kk):
        def body(i, xc):
            y = lax.conv_general_dilated(
                xc, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y[..., :cin] * jnp.asarray(1e-9, y.dtype)
        return lax.fori_loop(0, 20, body, xc)

    dt = timeit(conv, xc, kk, iters=20)
    fl = 2 * b * hw * hw * cin * cout * k * k
    tf = fl / dt / 1e12
    res[f"conv{k}x{k}_{hw}_{cin}to{cout}_TFLOPs"] = round(tf, 1)
    print(f"conv{k}x{k} {hw}px {cin}->{cout}: {dt*1e3:.3f} ms -> "
          f"{tf:.1f} TFLOP/s", flush=True)

out = sys.argv[1] if len(sys.argv) > 1 else None
if out:
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
print(json.dumps(res), flush=True)
