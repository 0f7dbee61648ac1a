"""Round-2 kernel experiments: push the fused int4 matmul from ~450 GB/s
(VPU-bound unpack+dequant) toward HBM speed-of-light (~820 GB/s on v5e).

Measured findings (v5e, this session):
  * Mosaic here does NOT support 16-bit integer arithmetic (u16 shifts fail
    remote-compile) — the "build bf16 bits in u16" variant is dead.
  * pltpu.bitcast(i32[a,b] -> bf16) IS supported and yields [2a,b] with
    row 2i = low 16 bits of word i, row 2i+1 = high 16 bits.
  * int8 x int8 -> int32 dot_general compiles (W4A8 viable as an option).

Winning idea under test — "K-pair bitcast" (KP):
  storage u8[K/2, N], byte[k',n] = v[2k',n] | v[2k'+1,n] << 4.
  In-kernel: widen to i32, build word = 0x3F803F80 | ((t&15)<<3) |
  ((t&0xF0)<<15), one bitcast -> bf16[K, N] tiles holding 1 + v/16 —
  ~7 integer VPU ops per TWO weights and zero int->float casts, no planes.
  Exact dequant via the factored per-group correction:
     x @ (1 + v/16) = xs_g + (x @ v)/16
     o += (16*s) * B_g - (16*s + s*z) * xs_g
"""

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
iw = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
scales = (rng.random((K // GS, N)) * 0.05 + 0.01).astype(np.float32)
zeros = rng.integers(1, 16, size=(K // GS, N)).astype(np.float32)
sz = scales * zeros
w_ref = (scales.repeat(GS, 0) * (iw - zeros.repeat(GS, 0))).astype(np.float32)
x = rng.standard_normal((M, K)).astype(np.float32)
y_ref = x @ w_ref

# planar pack (current shipping layout)
C = N // 2
wp = (iw[:, :C] | (iw[:, C:] << 4)).astype(np.uint8)
# K-pair pack
wkp = (iw[0::2, :] | (iw[1::2, :] << 4)).astype(np.uint8)   # [K/2, N]

xb = jnp.asarray(x, jnp.bfloat16)
wp_d = jnp.asarray(wp)
wkp_d = jnp.asarray(wkp)
s3 = jnp.asarray(scales.reshape(K // GS, 2, C))
z3 = jnp.asarray(sz.reshape(K // GS, 2, C))
s2 = jnp.asarray(scales)          # [G, N]
z2 = jnp.asarray(sz)
s16 = s2 * 16.0
zadj = s2 * 16.0 + z2


def check_and_time(name, fn, reshape=None, n1=50, n2=450):
    try:
        y = np.asarray(jax.jit(fn)(xb))
    except Exception as e:  # noqa: BLE001
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
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
    print(f"{name:30s} err={err:.2e}  {dt*1e6:7.1f} us  {bw:7.1f} GB/s(4bit)", flush=True)


def pcall(kern, grid, in_specs, out_specs, out_shape):
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * (len(grid) - 1) + ("arbitrary",)),
    )


# ----------------------------------------- B: shipping planar kernel (ref)
def make_planar(bk, bnh, name):
    rows = bk // GS

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xv = x_ref[...]
        w32 = wp_ref[...].astype(jnp.int32)
        for p in range(2):
            wi = ((w32 >> (4 * p)) & 15).astype(jnp.float32)
            s = s_ref[:, p, :]
            z = z_ref[:, p, :]
            w3 = wi.reshape(rows, GS, bnh)
            w = (w3 * s[:, None, :] - z[:, None, :]).reshape(bk, bnh)
            o_ref[:, p, :] += jax.lax.dot_general(
                xv.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    grid = (C // bnh, K // bk)
    f = pcall(
        kern, grid,
        [
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bnh), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2, bnh), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec((M, 2, bnh), lambda j, ki: (0, 0, j), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, 2, C), jnp.float32),
    )
    fn = lambda x: f(x, wp_d, s3, z3)
    check_and_time(name, fn, reshape=lambda y: y.reshape(M, N))


# ------------------------------------------------- KP: K-pair bitcast
def make_kpair(bk, bn, name, batched=False):
    rows = bk // GS

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xf = x_ref[...]
        xv = xf.astype(jnp.bfloat16)
        xs = jnp.sum(xf.astype(jnp.float32).reshape(M, rows, GS), axis=2)  # [M, rows]
        t = wp_ref[...].astype(jnp.int32)                  # [bk/2, bn]
        word = jnp.int32(0x3F803F80) | ((t & 15) << 3) | ((t & 0xF0) << 15)
        wb = pltpu.bitcast(word, jnp.bfloat16)             # [bk, bn] = 1 + v/16
        if batched:
            x3 = xv.reshape(M, rows, GS).transpose(1, 0, 2)
            w3 = wb.reshape(rows, GS, bn)
            B = jax.lax.dot_general(
                x3, w3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [rows, M, bn]
            o_ref[...] += jnp.sum(B * s_ref[:, None, :], axis=0) - xs @ z_ref[...]
        else:
            for r in range(rows):
                B = jax.lax.dot_general(
                    xv[:, r * GS:(r + 1) * GS], wb[r * GS:(r + 1) * GS, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[...] += B * s_ref[r][None, :] - xs[:, r:r + 1] * z_ref[r][None, :]

    grid = (N // bn, K // bk)
    f = pcall(
        kern, grid,
        [
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    fn = lambda x: f(x, wkp_d, s16, zadj)
    check_and_time(name, fn)


# --------------------------------------------------------------- F: W4A8
def make_w4a8(bk, bn, name):
    rows = bk // GS

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        xscale = amax / 127.0
        xq = jnp.round(xf / xscale).astype(jnp.int8)
        xs = jnp.sum(xf.reshape(M, rows, GS), axis=2)
        t = wp_ref[...].astype(jnp.int32)                  # [bk/2, bn] K-pair packed
        w_even = (t & 15).astype(jnp.int8)
        w_odd = ((t >> 4) & 15).astype(jnp.int8)
        for r in range(rows):
            h = GS // 2
            idot = jax.lax.dot_general(
                xq[:, r * GS:(r + 1) * GS:2], w_even[r * h:(r + 1) * h, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            idot += jax.lax.dot_general(
                xq[:, r * GS + 1:(r + 1) * GS:2], w_odd[r * h:(r + 1) * h, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            B = idot.astype(jnp.float32) * xscale
            o_ref[...] += B * s_ref[r][None, :] - xs[:, r:r + 1] * z_ref[r][None, :]

    grid = (N // bn, K // bk)
    f = pcall(
        kern, grid,
        [
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    fn = lambda x: f(x, wkp_d, s2, z2)
    check_and_time(name, fn)


# ---------------------------------------- KP3: integration-shaped variant
# 3-D scales [G,1,N] (tiling constraint lands on the dummy middle axis so
# any rows-per-block works), true scales folded in-kernel, M tiling.
def make_kp3(Mv, Kv, Nv, bk, bn, bm, name, gs=GS):
    rngl = np.random.default_rng(1)
    iwl = rngl.integers(0, 16, size=(Kv, Nv)).astype(np.uint8)
    G = Kv // gs
    sc = (rngl.random((G, Nv)) * 0.05 + 0.01).astype(np.float32)
    zr = rngl.integers(1, 16, size=(G, Nv)).astype(np.float32)
    szl = sc * zr
    wref = (sc.repeat(gs, 0) * (iwl - zr.repeat(gs, 0))).astype(np.float32)
    xl = rngl.standard_normal((Mv, Kv)).astype(np.float32)
    yref = xl @ wref
    wkpl = jnp.asarray((iwl[0::2, :] | (iwl[1::2, :] << 4)).astype(np.uint8))
    s3l = jnp.asarray(sc[:, None, :])
    z3l = jnp.asarray(szl[:, None, :])
    xbl = jnp.asarray(xl, jnp.bfloat16)
    rows = max(1, bk // gs)

    def kern(x_ref, wp_ref, s_ref, z_ref, o_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xf = x_ref[...]
        xv = xf.astype(jnp.bfloat16)
        xs = jnp.sum(xf.astype(jnp.float32).reshape(bm, rows, min(gs, bk)), axis=2)
        t = wp_ref[...].astype(jnp.int32)
        word = jnp.int32(0x3F803F80) | ((t & 15) << 3) | ((t & 0xF0) << 15)
        wb = pltpu.bitcast(word, jnp.bfloat16)
        gsb = min(gs, bk)
        for r in range(rows):
            B = jax.lax.dot_general(
                xv[:, r * gsb:(r + 1) * gsb], wb[r * gsb:(r + 1) * gsb, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s16 = s_ref[r, 0, :] * 16.0
            zad = s16 + z_ref[r, 0, :]
            o_ref[...] += B * s16[None, :] - xs[:, r:r + 1] * zad[None, :]

    if bk % gs == 0:
        scale_idx = lambda mi, j, ki: (ki, 0, j)
    else:
        scale_idx = lambda mi, j, ki: ((ki * bk) // gs, 0, j)
    grid = (max(1, Mv // bm), Nv // bn, Kv // bk)
    f = pcall(
        kern, grid,
        [
            pl.BlockSpec((bm, bk), lambda mi, j, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda mi, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, bn), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, bn), scale_idx, memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec((bm, bn), lambda mi, j, ki: (mi, j), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((Mv, Nv), jnp.float32),
    )
    fn = lambda x: f(x, wkpl, s3l, z3l)

    try:
        y = np.asarray(jax.jit(fn)(xbl))
    except Exception as e:  # noqa: BLE001
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    err = np.abs(y - yref).max() / np.abs(yref).max()

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, x):
            yy = fn(x)
            return jnp.where(yy.reshape(-1)[0] > 1e30, x + 1, x)
        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    def t(n):
        float(np.asarray(loop(xbl, n)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(xbl, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = (50, 450) if Mv == 1 else (10, 60)
    dt = (t(n2) - t(n1)) / (n2 - n1)
    bw = (Kv * Nv // 2) / dt / 1e9
    fl = 2 * Mv * Kv * Nv / dt / 1e12
    print(f"{name:30s} err={err:.2e}  {dt*1e6:7.1f} us  {bw:7.1f} GB/s(4bit) {fl:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    print("== round-2 KP integration checks ==", flush=True)
    import os
    which = os.environ.get("VARIANTS", "1")
    if which == "1":
        make_planar(512, 2048, "B: planar bk512 (ship)")
        make_kp3(1, 4096, 4096, 1024, 2048, 1, "KP3: 4096x4096 bk1024")
        make_kp3(1, 4096, 4096, 512, 2048, 1, "KP3: rows4 bk512")
        make_kp3(1, 11008, 4096, 256, 2048, 1, "KP3: K=11008 bk256")
    else:
        make_kp3(1, 11264, 4096, 1024, 2048, 1, "KP3: K=11264(pad) bk1024")
        make_kp3(1, 11264, 4096, 512, 2048, 1, "KP3: K=11264(pad) bk512")
        make_kp3(1, 4096, 10880, 1024, 2176, 1, "KP3: N=10880 bn2176")
        make_kp3(1, 4096, 4096, 128, 2048, 1, "KP3: gs=-1ish bk128 gs4096", gs=4096)
        make_kp3(8, 4096, 4096, 1024, 2048, 8, "KP3: M=8")
        make_kp3(256, 4096, 4096, 1024, 2048, 256, "KP3: M=256 prefill")
