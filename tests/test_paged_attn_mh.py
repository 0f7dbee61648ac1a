"""Multi-head-per-DMA paged attention kernel (ops/pallas/paged_attn.py):
interpret-mode kernel vs the dense jnp reference, across GQA ratios,
ragged lengths, shared pages, and window widths."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.ops.pallas import paged_attn  # noqa: E402


def _setup(rng, b, h, hkv, d, ps, n_pages, w, max_len):
    q = jnp.asarray(rng.standard_normal((b, h, d)) * 0.3, jnp.float32)
    kp = jnp.asarray(rng.standard_normal((n_pages, hkv, ps, d)) * 0.3,
                     jnp.float32)
    vp = jnp.asarray(rng.standard_normal((n_pages, hkv, ps, d)) * 0.3,
                     jnp.float32)
    lengths = jnp.asarray(
        rng.integers(1, max_len + 1, size=(b,)), jnp.int32)
    tables = jnp.asarray(
        rng.integers(0, n_pages, size=(b, w)), jnp.int32)
    return q, kp, vp, lengths, tables


@pytest.mark.parametrize("h,hkv", [(8, 8), (8, 2), (4, 1)])
@pytest.mark.parametrize("b", [1, 4])
def test_mh_kernel_matches_dense(rng, h, hkv, b):
    d, ps, w = 128, 16, 4
    q, kp, vp, lengths, tables = _setup(
        rng, b, h, hkv, d, ps, n_pages=9, w=w, max_len=w * ps)
    ref = paged_attn.paged_attention_mh_ref(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5)
    got = paged_attn.paged_attention_mh(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mh_kernel_partial_last_page(rng):
    """Lengths that end mid-page must mask the page tail exactly."""
    d, ps, w = 128, 16, 3
    q, kp, vp, _, tables = _setup(
        rng, 3, 8, 4, d, ps, n_pages=7, w=w, max_len=w * ps)
    lengths = jnp.asarray([1, 17, 33], jnp.int32)   # 1 token into each page
    ref = paged_attn.paged_attention_mh_ref(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5)
    got = paged_attn.paged_attention_mh(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mh_kernel_shared_pages_between_rows(rng):
    """Sibling beams alias the same physical pages (copy-on-share): rows
    with identical tables and lengths must produce identical outputs for
    identical queries."""
    d, ps, w = 128, 4, 4
    q1, kp, vp, _, _ = _setup(rng, 1, 8, 8, d, ps, n_pages=6, w=w,
                              max_len=w * ps)
    q = jnp.concatenate([q1, q1], axis=0)
    tables = jnp.asarray([[1, 2, 3, 4]] * 2, jnp.int32)
    lengths = jnp.asarray([13, 13], jnp.int32)
    got = paged_attn.paged_attention_mh(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(got[1]))


def test_mh_kernel_window_slice_equivalence(rng):
    """Slicing the table to a window covering every live position must not
    change the result (the growing-window caller contract)."""
    d, ps = 128, 16
    q, kp, vp, _, tables = _setup(
        rng, 2, 8, 8, d, ps, n_pages=11, w=8, max_len=8 * ps)
    lengths = jnp.asarray([30, 40], jnp.int32)      # live pages: 2 and 3
    full = paged_attn.paged_attention_mh(
        q, kp, vp, lengths, tables, sm_scale=d ** -0.5, interpret=True)
    sliced = paged_attn.paged_attention_mh(
        q, kp, vp, lengths, tables[:, :4], sm_scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_mh_kernel_int8_scales(rng):
    """int8 pools + per-(page, head, position) scales: kernel vs the dense
    reference with the same dequant convention."""
    b, h, hkv, d, ps, w, n_pages = 2, 8, 4, 128, 16, 4, 9
    q = jnp.asarray(rng.standard_normal((b, h, d)) * 0.3, jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, size=(n_pages, hkv, ps, d)),
                     jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, size=(n_pages, hkv, ps, d)),
                     jnp.int8)
    ks = jnp.asarray(rng.random((n_pages, hkv, ps)) * 0.4 + 0.1, jnp.float32)
    vs = jnp.asarray(rng.random((n_pages, hkv, ps)) * 0.4 + 0.1, jnp.float32)
    lengths = jnp.asarray([30, 64], jnp.int32)
    tables = jnp.asarray(rng.integers(0, n_pages, size=(b, w)), jnp.int32)
    ref = paged_attn.paged_attention_mh_ref(
        q, kq, vq, lengths, tables, ks, vs, sm_scale=d ** -0.5)
    got = paged_attn.paged_attention_mh(
        q, kq, vq, lengths, tables, ks, vs, sm_scale=d ** -0.5,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_write_token_pages_matches_scatter(rng):
    """dus-chain page writes == the vector-index scatter form."""
    L, P, hkv, ps, d, B = 3, 7, 4, 8, 128, 5
    pool = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((B, hkv, d)), jnp.float32)
    page_of = jnp.asarray([1, 3, 2, 6, 5], jnp.int32)   # unique per slot
    off = jnp.asarray(rng.integers(0, ps, size=(B,)), jnp.int32)
    for layer in (0, 2):
        ref = pool.at[layer, page_of, :, off].set(rows)
        got = paged_attn.write_token_pages(pool, layer, page_of, off, rows)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_copy_pages_matches_gather_scatter_with_aliasing(rng):
    """Two-phase copy == one-shot gather+scatter, INCLUDING the hazard case
    where one copy's dst page is another copy's src (sibling-beam reorder:
    beam0 takes beam1's page while beam2 still sources old beam0)."""
    L, P, hkv, ps, d = 2, 9, 2, 4, 128
    pool = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), jnp.float32)
    src = jnp.asarray([4, 3, 3, 6], jnp.int32)
    dst = jnp.asarray([3, 5, 7, 8], jnp.int32)   # dst[0]=3 is src[1]/src[2]
    ref = pool.at[:, dst].set(pool[:, src])
    got = paged_attn.copy_pages(pool, src, dst)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("dtype,d", [(jnp.float32, 128), (jnp.int8, 128),
                                     (jnp.float32, 1)])
def test_write_token_pages_kernel(rng, dtype, d):
    """Aliased Pallas page write == the scatter form, for value pools
    (bf16/int8, d=128) and width-1 scale pools (d=1)."""
    L, P, hkv, ps, B = 3, 9, 4, 8, 5
    if dtype == jnp.int8:
        pool_k = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), dtype)
        pool_v = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), dtype)
        rows_k = jnp.asarray(rng.integers(-127, 128, (B, hkv, d)), dtype)
        rows_v = jnp.asarray(rng.integers(-127, 128, (B, hkv, d)), dtype)
    else:
        pool_k = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), dtype)
        pool_v = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), dtype)
        rows_k = jnp.asarray(rng.standard_normal((B, hkv, d)), dtype)
        rows_v = jnp.asarray(rng.standard_normal((B, hkv, d)), dtype)
    page_of = jnp.asarray([1, 3, 2, 6, 5], jnp.int32)
    off = jnp.asarray(rng.integers(0, ps, size=(B,)), jnp.int32)
    for layer in (0, 2):
        got_k, got_v = paged_attn.write_token_pages_kernel(
            pool_k, pool_v, layer, page_of, off, rows_k, rows_v,
            interpret=True)
        ref_k = pool_k.at[layer, page_of, :, off].set(rows_k)
        ref_v = pool_v.at[layer, page_of, :, off].set(rows_v)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_mh_kernel_stacked_pools_layer_indexmap(rng):
    """5-D [L, P, ...] pools with a static layer= must equal slicing the
    layer out first (the stacked form avoids materializing the slice)."""
    b, h, hkv, d, ps, w, L = 2, 8, 4, 128, 16, 4, 3
    q, kp, vp, lengths, tables = _setup(
        rng, b, h, hkv, d, ps, n_pages=9, w=w, max_len=w * ps)
    kst = jnp.stack([kp, kp * 0.5, kp + 0.1])
    vst = jnp.stack([vp + 0.2, vp, vp * 2.0])
    for layer in range(L):
        ref = paged_attn.paged_attention_mh(
            q, kst[layer], vst[layer], lengths, tables,
            sm_scale=d ** -0.5, interpret=True)
        got = paged_attn.paged_attention_mh(
            q, kst, vst, lengths, tables, sm_scale=d ** -0.5,
            interpret=True, layer=layer)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_mh_kernel_stacked_pools_quantized(rng):
    """Stacked int8 pools + [L, P, hkv, ps] scales through layer=."""
    b, h, hkv, d, ps, w, L = 2, 4, 2, 128, 16, 3, 2
    q, kp, vp, lengths, tables = _setup(
        rng, b, h, hkv, d, ps, n_pages=7, w=w, max_len=w * ps)
    kq = jnp.clip(jnp.rint(kp * 100), -127, 127).astype(jnp.int8)
    vq = jnp.clip(jnp.rint(vp * 100), -127, 127).astype(jnp.int8)
    ks = jnp.asarray(rng.uniform(0.5, 2.0, kq.shape[:-1]), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.5, 2.0, vq.shape[:-1]), jnp.float32)
    kst, vst = jnp.stack([kq, vq]), jnp.stack([vq, kq])
    kss, vss = jnp.stack([ks, vs]), jnp.stack([vs, ks])
    for layer in range(L):
        ref = paged_attn.paged_attention_mh(
            q, kst[layer], vst[layer], lengths, tables, kss[layer],
            vss[layer], sm_scale=d ** -0.5, interpret=True)
        got = paged_attn.paged_attention_mh(
            q, kst, vst, lengths, tables, kss, vss, sm_scale=d ** -0.5,
            interpret=True, layer=layer)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_copy_pages_pair_matches_copy_pages(rng):
    """The aliased Pallas gather/scatter pair must equal the dus-chain
    copy_pages for BOTH pools, including the hazard case where one copy's
    src equals another copy's dst (reads must see the pre-copy pools)."""
    L, P, hkv, ps, d, n = 3, 11, 2, 16, 128, 4
    kp = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, P, hkv, ps, d)), jnp.float32)
    # dst unique; src[2] == dst[0] (hazard), src[3] == src[1] (shared parent)
    src = jnp.asarray([5, 6, 8, 6], jnp.int32)
    dst = jnp.asarray([8, 2, 9, 4], jnp.int32)
    ref_k = paged_attn.copy_pages(kp, src, dst)
    ref_v = paged_attn.copy_pages(vp, src, dst)
    got_k, got_v = paged_attn.copy_pages_pair(kp, vp, src, dst,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_copy_pages_pair_int8(rng):
    L, P, hkv, ps, d, n = 2, 7, 2, 16, 128, 3
    kp = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), jnp.int8)
    src = jnp.asarray([1, 4, 4], jnp.int32)
    dst = jnp.asarray([4, 2, 6], jnp.int32)
    ref_k = paged_attn.copy_pages(kp, src, dst)
    ref_v = paged_attn.copy_pages(vp, src, dst)
    got_k, got_v = paged_attn.copy_pages_pair(kp, vp, src, dst,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
