"""Why does one token-row write into the paged pool cost ~17 us?

Times, same-process (slope timing, in-graph loops):
  A. dus of [1,1,hkv,1,d] into the full [L,P,hkv,ps,d] pool (shipped)
  B. dus of [1,hkv,1,d] into ONE layer's [P,hkv,ps,d] slice (per-layer pools)
  C. vector-index scatter into one layer's slice
  D. B for all 32 layers sequentially (what a per-layer-pool step costs)
  E. a Pallas aliased page-RMW write kernel, all (L,B) rows in one launch

    python scripts/kernel_write_probe.py
"""
import sys
from functools import partial

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.bench_util import slope_time

L, P, HKV, PS, D, B = 32, 166, 32, 16, 128, 4
rng = np.random.default_rng(0)
pool = jnp.zeros((L, P, HKV, PS, D), jnp.bfloat16)
pool1 = jnp.zeros((P, HKV, PS, D), jnp.bfloat16)
pools = [jnp.zeros((P, HKV, PS, D), jnp.bfloat16) for _ in range(4)]
rows2d = jnp.asarray(rng.standard_normal((B, HKV * D)), jnp.bfloat16)
rows_all = jnp.asarray(rng.standard_normal((L, B, HKV, D)), jnp.bfloat16)
page_of = jnp.asarray([3, 40, 80, 120], jnp.int32)
off = jnp.asarray([1, 5, 9, 13], jnp.int32)


def a_full_pool(x, pool):
    r5 = x.reshape(B, HKV, D)[:, None, None, :, None, :]
    for i in range(B):
        pool = jax.lax.dynamic_update_slice(
            pool, r5[i], (jnp.int32(2), page_of[i], jnp.int32(0), off[i],
                          jnp.int32(0)))
    return pool[0, 0, 0, 0, :1].reshape(1, 1) + x[:1, :1]


def b_one_layer(x, pool1):
    r4 = x.reshape(B, HKV, D)[:, None, :, None, :]
    for i in range(B):
        pool1 = jax.lax.dynamic_update_slice(
            pool1, r4[i], (page_of[i], jnp.int32(0), off[i], jnp.int32(0)))
    return pool1[0, 0, 0, :1].reshape(1, 1) + x[:1, :1]


def c_scatter_one_layer(x, pool1):
    pool1 = pool1.at[page_of, :, off].set(x.reshape(B, HKV, D))
    return pool1[0, 0, 0, :1].reshape(1, 1) + x[:1, :1]


def d_four_layers(x, *ps4):
    outs = []
    r4 = x.reshape(B, HKV, D)[:, None, :, None, :]
    for p1 in ps4:
        for i in range(B):
            p1 = jax.lax.dynamic_update_slice(
                p1, r4[i], (page_of[i], jnp.int32(0), off[i], jnp.int32(0)))
        outs.append(p1[0, 0, 0, :1])
    return sum(outs).reshape(1, 1) + x[:1, :1]




def f_slice_update_set(x, pool):
    r4 = x.reshape(B, HKV, D)[:, None, :, None, :]
    sl = pool[2]                                   # static-index layer view
    for i in range(B):
        sl = jax.lax.dynamic_update_slice(
            sl, r4[i], (page_of[i], jnp.int32(0), off[i], jnp.int32(0)))
    pool = pool.at[2].set(sl)
    return pool[0, 0, 0, 0, :1].reshape(1, 1) + x[:1, :1]

# E: one Pallas launch, all (L, B) page RMWs, pool aliased in/out
def _wkernel(pof_ref, off_ref, pool_in, rows_ref, pool_out):
    b = pl.program_id(1)
    o = off_ref[b]
    page = pool_in[...]                             # [1,1,HKV,PS,D]
    row = rows_ref[...]                             # [1,1,HKV,D]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, HKV, PS, D), 3) == o)
    pool_out[...] = jnp.where(sel, row[:, :, :, None, :], page)


@jax.jit
def e_pallas_all(rows_all, pool):
    grid = (L, B)
    return pl.pallas_call(
        _wkernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, HKV, PS, D),
                             lambda l, b, pof, o: (l, pof[b], 0, 0, 0)),
                pl.BlockSpec((1, 1, HKV, D), lambda l, b, pof, o: (l, b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, HKV, PS, D),
                                   lambda l, b, pof, o: (l, pof[b], 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(page_of, off, pool, rows_all)


print("devices:", jax.devices(), flush=True)
for name, fn, args in [
    ("A dus full pool x4", a_full_pool, (pool,)),
    ("B dus one layer x4", b_one_layer, (pool1,)),
    ("C scatter one layer", c_scatter_one_layer, (pool1,)),
    ("D dus 4 layers x4", d_four_layers, tuple(pools)),
    ("F slice-upd-set x4", f_slice_update_set, (pool,)),
]:
    t = slope_time(fn, rows2d, n1=20, n2=220, args=args)
    print(f"{name:22s} {t * 1e6:9.2f} us", flush=True)

# E is not slope-loopable through the generic harness (aliasing); time with
# repeated calls + one final sync
import time

e_pallas_all(rows_all, pool).block_until_ready()
p = pool
t0 = time.perf_counter()
N = 200
for _ in range(N):
    p = e_pallas_all(rows_all, p)
np.asarray(p[0, 0, 0, 0, :1])
t = (time.perf_counter() - t0) / N
print(f"{'E pallas all (L,B)':22s} {t * 1e6:9.2f} us  (incl dispatch)", flush=True)
