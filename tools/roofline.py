import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

def timeit(fn, *args, iters):
    np.asarray(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(fn(*args).ravel()[0])
    return (time.perf_counter() - t0) / iters

# bandwidth: chained x = x * 1.0000001 (read+write 51MB bf16)
x = jnp.ones((128,56,56,64), jnp.bfloat16)
@jax.jit
def bw(x):
    def body(i, x): return x * jnp.asarray(1.0000001, x.dtype)
    return lax.fori_loop(0, 50, body, x)
dt = timeit(bw, x, iters=50)
bytes_ = 2 * x.size * 2
print(f"elementwise: {dt*1e6:.1f} us/iter -> {bytes_/dt/1e9:.0f} GB/s", flush=True)

# matmul roofline
a = jnp.ones((4096, 4096), jnp.bfloat16)
@jax.jit
def mm(a):
    def body(i, a): return (a @ a) * jnp.asarray(1e-9, a.dtype)
    return lax.fori_loop(0, 20, body, a)
dt = timeit(mm, a, iters=20)
fl = 2 * 4096**3
print(f"matmul 4096: {dt*1e3:.3f} ms/iter -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)

# conv roofline (stage-1-like): 3x3 conv 64->64 on 56x56x128batch
xc = jnp.ones((128,56,56,64), jnp.bfloat16)
k = jnp.ones((3,3,64,64), jnp.bfloat16)
@jax.jit
def conv(xc, k):
    def body(i, xc):
        y = lax.conv_general_dilated(xc, k, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"))
        return y * jnp.asarray(1e-9, y.dtype)
    return lax.fori_loop(0, 20, body, xc)
dt = timeit(conv, xc, k, iters=20)
fl = 2 * 128*56*56*64*64*9
print(f"conv3x3 64ch: {dt*1e3:.3f} ms/iter -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)
