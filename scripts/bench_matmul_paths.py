"""Time the integrated matmul paths at several M on the real TPU."""
import sys, time
from functools import partial
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from autogptq_tpu.ops import quantlinear, packing
from autogptq_tpu.ops.pallas import gemm

K, N, GS = 4096, 4096, 128
rng = np.random.default_rng(0)
w = (rng.standard_normal((N, K)) * 0.01).astype(np.float32)
scale = (rng.random((K // GS, N)) * 0.05 + 0.01).astype(np.float32)
zero = rng.integers(1, 16, size=(K // GS, N)).astype(np.float32)
packed = quantlinear.pack_from_solver(w, scale, zero, np.arange(K) // GS, 4, GS)
ql = quantlinear.from_packed(packed)
print("layout", ql.layout, "wp", ql.wp.shape, flush=True)

def timeit(name, fn, x, n1, n2):
    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, x):
            yy = fn(x)
            return jnp.where(yy.reshape(-1)[0] > 1e30, x + 1, x)
        return jax.lax.fori_loop(0, n, body, x)[0, 0]
    def t(n):
        float(np.asarray(loop(x, n)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(loop(x, n)))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (t(n2) - t(n1)) / (n2 - n1)
    m = x.shape[0]
    bw = (K * N // 2) / dt / 1e9
    print(f"{name:26s} M={m:4d}  {dt*1e6:8.1f} us  {bw:7.1f} GB/s(4bit)  {2*m*K*N/dt/1e12:6.2f} TFLOP/s", flush=True)

for m in (1, 8, 16, 64):
    x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
    n1, n2 = (50, 450) if m <= 16 else (10, 110)
    timeit("pallas-kpair", lambda xx: gemm.matmul_pallas(xx, ql), x, n1, n2)
for m in (8, 64, 256):
    x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
    timeit("xla-dequant", lambda xx: quantlinear.matmul_xla(xx, ql), x, 10, 110)

# bn sweep on the integrated kernel
for bn in (1024, 2048, 4096):
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    timeit(f"pallas-kpair bn={bn}", lambda xx, bn=bn: gemm.matmul_pallas(xx, ql, bnh=bn), x, 50, 450)
