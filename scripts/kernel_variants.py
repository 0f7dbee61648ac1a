"""Experiment: dequant-matmul kernel variants on real TPU. Finds the fastest
unpack/dequant strategy for the fused kernel. Run on TPU (no args)."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N, GS = 1, 4096, 4096, 128
rng = np.random.default_rng(0)
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint8)       # logical ints
scales = (rng.random((K // GS, N)) * 0.05 + 0.01).astype(np.float32)
zeros = rng.integers(1, 16, size=(K // GS, N)).astype(np.float32)
sz = scales * zeros
w_ref = (scales.repeat(GS, 0) * (iw - zeros.repeat(GS, 0))).astype(np.float32)
x = rng.standard_normal((M, K)).astype(np.float32)
y_ref = x @ w_ref

# planar nibble pack: byte[k, j] = iw[k, j] | iw[k, j + N//2] << 4
C = N // 2
wp = (iw[:, :C] | (iw[:, C:] << 4)).astype(np.uint8)

xb = jnp.asarray(x, jnp.bfloat16)
wp_d = jnp.asarray(wp)
w8_d = jnp.asarray(iw.astype(np.int8))
s3 = jnp.asarray(scales.reshape(K // GS, 2, C))
z3 = jnp.asarray(sz.reshape(K // GS, 2, C))
s3b = s3.astype(jnp.bfloat16)
z3b = z3.astype(jnp.bfloat16)
s2 = jnp.asarray(scales)
z2 = jnp.asarray(sz)


def run_variant(kernel, inputs, in_specs, grid, out_full_shape, out_spec, name):
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_full_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * (len(grid) - 1) + ("arbitrary",),
        ),
    )
    return f


def check_and_time(name, fn, reshape=None, n1=30, n2=330):
    y = np.asarray(jax.jit(fn)(xb))
    if reshape:
        y = reshape(y)
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, x):
            yy = fn(x)
            return jnp.where(yy.reshape(-1)[0] > 1e30, x + 1, x)
        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    def t(n):
        float(np.asarray(loop(xb, n)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(xb, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(n2) - t(n1)) / (n2 - n1)
    bw = (K * N // 2) / dt / 1e9
    print(f"{name:28s} err={err:.2e}  {dt*1e6:7.1f} us  {bw:7.1f} GB/s(4bit)", flush=True)


# --------------------------------------------------------------- variant A/B
def make_planar(dequant_dtype, bk, bnh, name):
    rows = bk // GS

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xv = x_ref[...]
        w32 = wp_ref[...].astype(jnp.int32)
        for p in range(2):
            wi = ((w32 >> (4 * p)) & 15).astype(dequant_dtype)
            s = s_ref[:, p, :].astype(dequant_dtype)
            z = z_ref[:, p, :].astype(dequant_dtype)
            w3 = wi.reshape(rows, GS, bnh)
            w = (w3 * s[:, None, :] - z[:, None, :]).reshape(bk, bnh)
            o_ref[:, p, :] += jax.lax.dot_general(
                xv.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    grid = (C // bnh, K // bk)
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bnh), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 2, bnh), lambda j, ki: (0, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 2, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    sd, zd = (s3, z3) if dequant_dtype == jnp.float32 else (s3b, z3b)
    fn = lambda x: f(x, wp_d, sd, zd)
    check_and_time(name, fn, reshape=lambda y: y.reshape(M, N))


# ------------------------------------------------------- variant C (factored)
def make_factored(bk, bnh, name):
    rows = bk // GS

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xv = x_ref[...].astype(jnp.bfloat16)         # [M, bk]
        w32 = wp_ref[...].astype(jnp.int32)
        # per-group x sums [M, rows]
        xs = jnp.sum(xv.astype(jnp.float32).reshape(M, rows, GS), axis=2)  # [M, rows]
        for p in range(2):
            wi = ((w32 >> (4 * p)) & 15).astype(jnp.bfloat16)   # [bk, bnh]
            for r in range(rows):
                part = jax.lax.dot_general(
                    xv[:, r * GS : (r + 1) * GS],
                    wi[r * GS : (r + 1) * GS, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [M, bnh]
                s = s_ref[r, p, :].astype(jnp.float32)
                z = z_ref[r, p, :].astype(jnp.float32)
                o_ref[:, p, :] += part * s[None, :] - xs[:, r : r + 1] * z[None, :]

    grid = (C // bnh, K // bk)
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bnh), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 2, bnh), lambda j, ki: (0, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 2, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    fn = lambda x: f(x, wp_d, s3, z3)
    check_and_time(name, fn, reshape=lambda y: y.reshape(M, N))


# --------------------------------------------------- variant D (int8 storage)
def make_int8(bk, bn, name):
    rows = bk // GS

    def kern(x_ref, w_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xv = x_ref[...]
        wi = w_ref[...].astype(jnp.bfloat16)
        s = s_ref[...].astype(jnp.bfloat16)
        z = z_ref[...].astype(jnp.bfloat16)
        w3 = wi.reshape(rows, GS, bn)
        w = (w3 * s[:, None, :] - z[:, None, :]).reshape(bk, bn)
        o_ref[...] += jax.lax.dot_general(
            xv.astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid = (N // bn, K // bk)
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    fn = lambda x: f(x, w8_d, s2, z2)
    check_and_time(name, fn)


print("== variants ==", flush=True)
make_planar(jnp.float32, 128, 512, "A: f32 dequant bk128 bnh512")
make_planar(jnp.bfloat16, 128, 512, "B: bf16 dequant bk128 bnh512")
make_planar(jnp.bfloat16, 512, 512, "B: bf16 bk512 bnh512")
make_planar(jnp.bfloat16, 512, 1024, "B: bf16 bk512 bnh1024")
make_planar(jnp.bfloat16, 1024, 2048, "B: bf16 bk1024 bnh2048")
make_factored(512, 512, "C: factored bk512 bnh512")
make_int8(512, 512, "D: int8 bk512 bn512")
