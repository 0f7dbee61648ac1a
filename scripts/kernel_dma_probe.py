"""Probe the pallas DMA bandwidth ceiling for the decode-kernel pipeline.

The budget probe showed the full kb32 kernel at ~91% of the pure-DMA
ceiling (561 vs 615 GB/s), so any further decode speedup must come from
raising the DMA ceiling itself. Sweeps:

  - (bk x bn) block shape for the pure-wp-load kernel
  - with vs without the scales/zeros side streams (they add ~7.6% traffic)
  - int32 vs uint8-typed wp (same bytes; DMA descriptor differences)

    python scripts/kernel_dma_probe.py [K] [N]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.bench_util import slope_time  # noqa: E402

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
GS = 128
M = 1

rng = np.random.default_rng(0)
g = K // GS
wp = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(K // 8, N)), jnp.int32)
s3 = jnp.asarray((rng.random((g, 1, N)) * 0.02).astype(np.float32))
z3 = jnp.asarray(rng.integers(1, 16, size=(g, 1, N)).astype(np.uint8))
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
wbytes = K * N // 2


def dma_wp_only(xin, bk, bn):
    def body(x_ref, wp_ref, out_ref):
        ki = pl.program_id(1)
        t = wp_ref[0:1, :].astype(jnp.float32) + x_ref[:, 0:1].astype(jnp.float32)

        @pl.when(ki == 0)
        def _():
            out_ref[...] = t[:, :out_ref.shape[1]]

        @pl.when(ki != 0)
        def _():
            out_ref[...] += t[:, :out_ref.shape[1]]

    grid = (N // bn, K // bk)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=N * K // 8, bytes_accessed=wp.size * 4, transcendentals=0),
    )(xin, wp)


def dma_all_streams(xin, bk, bn):
    r = bk // GS

    def body(x_ref, wp_ref, s_ref, z_ref, out_ref):
        ki = pl.program_id(1)
        t = (wp_ref[0:1, :].astype(jnp.float32)
             + x_ref[:, 0:1].astype(jnp.float32)
             + s_ref[0, :, :] + z_ref[0, :, :].astype(jnp.int32).astype(jnp.float32))

        @pl.when(ki == 0)
        def _():
            out_ref[...] = t[:, :out_ref.shape[1]]

        @pl.when(ki != 0)
        def _():
            out_ref[...] += t[:, :out_ref.shape[1]]

    grid = (N // bn, K // bk)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1, bn), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1, bn), lambda j, ki: (ki, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=N * K // 8,
            bytes_accessed=wp.size * 4 + s3.size * 4 + z3.size, transcendentals=0),
    )(xin, wp, s3, z3)


def make_dma_wp_linear(bk, bn):
    """Tile-contiguous layout: each (bk//8, bn) block stored contiguously
    (Marlin's trick, marlin_repack.cu): DMA becomes a pure sequential
    stream instead of bn*4-byte rows strided across the N axis. The repack
    happens HERE, outside the timed loop."""
    nb_k, nb_n = K // bk, N // bn
    wl_host = np.asarray(wp).reshape(nb_k, bk // 8, nb_n, bn).transpose(2, 0, 1, 3)
    wl = jnp.asarray(np.ascontiguousarray(wl_host.reshape(nb_n * nb_k, bk // 8, bn)))

    def body(x_ref, wp_ref, out_ref):
        ki = pl.program_id(1)
        t = wp_ref[0, 0:1, :].astype(jnp.float32) + x_ref[:, 0:1].astype(jnp.float32)

        @pl.when(ki == 0)
        def _():
            out_ref[...] = t[:, :out_ref.shape[1]]

        @pl.when(ki != 0)
        def _():
            out_ref[...] += t[:, :out_ref.shape[1]]

    grid = (nb_n, nb_k)

    def fn(xin):
        return pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, bk), lambda j, ki: (0, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk // 8, bn), lambda j, ki: (j * nb_k + ki, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, ki: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=N * K // 8, bytes_accessed=wp.size * 4, transcendentals=0),
        )(xin, wl)

    return fn


def make_dma_manual(bk, bn, nbuf, linear=True):
    """Manual nbuf-deep DMA pipeline (Marlin's 4-stage cp.async analog,
    marlin_cuda_kernel.cu:55-101): wp stays in HBM (memory_space=ANY) and
    the kernel streams K-chunks through an nbuf-slot VMEM scratch with
    explicit make_async_copy start/wait. Mosaic's automatic BlockSpec
    pipeline is 2-deep; this measures whether 3-4 stages raise the DMA
    ceiling. linear=True additionally stores each (rows, bn) chunk
    contiguously so every copy is one sequential HBM span."""
    nb_k, nb_n = K // bk, N // bn
    rows = bk // 8
    if linear:
        wl_host = (np.asarray(wp).reshape(nb_k, rows, nb_n, bn)
                   .transpose(2, 0, 1, 3))
        w_in = jnp.asarray(np.ascontiguousarray(
            wl_host.reshape(nb_n, nb_k * rows, bn)))
    else:
        w_in = wp

    def body(x_ref, wp_hbm, out_ref):
        j = pl.program_id(0)

        def inner(scratch, sem_ref):
            def get_dma(slot, i):
                if linear:
                    src = wp_hbm.at[j, pl.ds(i * rows, rows), :]
                else:
                    src = wp_hbm.at[pl.ds(i * rows, rows),
                                    pl.ds(j * bn, bn)]
                return pltpu.make_async_copy(
                    src, scratch.at[slot], sem_ref.at[slot])

            for p in range(min(nbuf, nb_k)):
                get_dma(p, p).start()

            def loop_body(i, acc):
                slot = jax.lax.rem(i, nbuf)
                get_dma(slot, i).wait()
                t = scratch[slot][0:1, :].astype(jnp.float32)

                @pl.when(i + nbuf < nb_k)
                def _():
                    get_dma(slot, i + nbuf).start()

                return acc + t

            acc = jax.lax.fori_loop(
                0, nb_k, loop_body,
                jnp.zeros((1, bn), jnp.float32))
            out_ref[...] = acc + x_ref[:, 0:1].astype(jnp.float32)

        pl.run_scoped(
            inner,
            scratch=pltpu.VMEM((nbuf, rows, bn), jnp.int32),
            sem_ref=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    def fn(xin):
        return pl.pallas_call(
            body,
            grid=(nb_n,),
            in_specs=[
                pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=N * K // 8, bytes_accessed=wp.size * 4,
                transcendentals=0),
        )(xin, w_in)

    return fn


print(f"K={K} N={N}  weight bytes {wbytes / 1e6:.1f} MB")
for bk in (512, 1024, 2048, K):
    for bn in (512, 1024, 2048, 4096):
        if (bk // 8) * bn * 4 * 2 > 64 * 1024 * 1024:
            continue
        try:
            t = slope_time(lambda xi, a=bk, b=bn: dma_wp_only(xi, a, b), x)
        except Exception as e:  # keep sweeping: hardware time is precious
            print(f"wp-only  bk={bk:5d} bn={bn:5d}  FAILED {type(e).__name__}")
            continue
        print(f"wp-only  bk={bk:5d} bn={bn:5d}  {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s")
for bk, bn in ((1024, 1024), (1024, 2048)):
    try:
        t = slope_time(lambda xi, a=bk, b=bn: dma_all_streams(xi, a, b), x)
        print(f"all-streams bk={bk} bn={bn}  {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s")
    except Exception as e:
        print(f"all-streams bk={bk} bn={bn}  FAILED {type(e).__name__}")
for bk in (512, 1024, 2048, K):
    for bn in (1024, 2048, 4096):
        if (bk // 8) * bn * 4 * 2 > 64 * 1024 * 1024:
            continue
        try:
            t = slope_time(make_dma_wp_linear(bk, bn), x)
        except Exception as e:
            print(f"wp-linear bk={bk:5d} bn={bn:5d}  FAILED {type(e).__name__}")
            continue
        print(f"wp-linear bk={bk:5d} bn={bn:5d}  {t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s")
for linear in (True, False):
    tag = "lin" if linear else "str"
    for bk, bn in ((512, 1024), (1024, 1024), (1024, 2048), (512, 2048)):
        for nbuf in (2, 3, 4):
            try:
                t = slope_time(make_dma_manual(bk, bn, nbuf, linear), x)
            except Exception as e:
                print(f"manual-{tag} bk={bk:5d} bn={bn:5d} nbuf={nbuf}  "
                      f"FAILED {type(e).__name__}")
                continue
            print(f"manual-{tag} bk={bk:5d} bn={bn:5d} nbuf={nbuf}  "
                  f"{t * 1e6:8.2f} us  {wbytes / t / 1e9:7.1f} GB/s")
