"""Native C++ packlib vs NumPy reference — bit-exact equivalence."""

import numpy as np
import pytest

from autogptq_tpu.ops import native, packing

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native packlib not built"
)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_native_pack_unpack(bits, rng):
    iw = rng.integers(0, 2**bits, size=(256, 192)).astype(np.uint32)
    p_native = native.pack_rows(iw, bits)
    p_np = packing.pack_qweight(iw, bits).view(np.uint32)
    np.testing.assert_array_equal(p_native, p_np)
    np.testing.assert_array_equal(native.unpack_rows(p_native, bits), iw)


def test_native_repack_kint4(rng):
    iw = rng.integers(0, 16, size=(128, 256)).astype(np.uint32)
    perm = rng.permutation(128).astype(np.int32)
    out = native.repack_kint4(iw, perm)
    v = iw[perm]
    np.testing.assert_array_equal(out, (v[0::2] | (v[1::2] << 4)).astype(np.uint8))
    out2 = native.repack_kint4(iw, None)
    np.testing.assert_array_equal(out2, (iw[0::2] | (iw[1::2] << 4)).astype(np.uint8))


@pytest.mark.parametrize(
    "k,k_out,n,n_out,gs", [(256, 256, 64, 128, 64), (384, 512, 100, 128, 128)]
)
@pytest.mark.parametrize("use_perm", [False, True])
def test_native_repack_ki32(rng, k, k_out, n, n_out, gs, use_perm):
    """Fused qweight->ki32 (and values->ki32) vs the NumPy pack, incl. the
    kperm gather and K/N zero padding it folds in."""
    from autogptq_tpu.ops.quantlinear import _ki32_pack

    w = rng.integers(0, 16, size=(k, n)).astype(np.uint32)
    qw = packing.pack_qweight(w, 4)
    perm = rng.permutation(k).astype(np.int32) if use_perm else None
    ref = w if perm is None else w[perm]
    ref = np.pad(ref, ((0, k_out - k), (0, n_out - n)))
    want = _ki32_pack(ref, gs).view(np.uint32)
    got = native.repack_ki32(qw, perm, k, k_out, n, n_out, gs)
    np.testing.assert_array_equal(got.view(np.uint32), want)
    got_v = native.pack_ki32_values(w, perm, k, k_out, n, n_out, gs)
    np.testing.assert_array_equal(got_v.view(np.uint32), want)


@pytest.mark.parametrize("use_perm", [False, True])
def test_native_repack_k2i32(rng, use_perm):
    from autogptq_tpu.ops.quantlinear import _k2i32_pack

    k, k_out, n, n_out, gs = 384, 512, 100, 128, 128
    w = rng.integers(0, 4, size=(k, n)).astype(np.uint32)
    qw = packing.pack_qweight(w, 2)
    perm = rng.permutation(k).astype(np.int32) if use_perm else None
    ref = w if perm is None else w[perm]
    ref = np.pad(ref, ((0, k_out - k), (0, n_out - n)))
    want = _k2i32_pack(ref, gs).view(np.uint32)
    got = native.repack_k2i32(qw, perm, k, k_out, n, n_out, gs)
    np.testing.assert_array_equal(got.view(np.uint32), want)


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("desc_act", [False, True])
def test_from_packed_fused_matches_slow(rng, bits, desc_act, monkeypatch):
    """from_packed with the fused native repack == the pure-NumPy path."""
    from autogptq_tpu.ops import quantlinear as Q

    k, n, gs = 512, 256, 128
    w = rng.integers(0, 2**bits, size=(k, n)).astype(np.uint32)
    qw = packing.pack_qweight(w, bits)
    g = k // gs
    qz = packing.pack_qzeros(
        rng.integers(0, 2**bits, size=(g, n)).astype(np.uint32), bits
    )
    sc = rng.uniform(0.5, 2.0, (g, n)).astype(np.float32)
    if desc_act:
        gi = rng.permutation(np.repeat(np.arange(g), gs)).astype(np.int32)
    else:
        gi = (np.arange(k) // gs).astype(np.int32)
    p = Q.PackedQuantLinear(
        qweight=qw, qzeros=qz, scales=sc, g_idx=gi, bias=None,
        bits=bits, group_size=gs, in_features=k, out_features=n,
    )
    ql_fused = Q.from_packed(p)
    monkeypatch.setattr(native, "available", lambda: False)
    ql_slow = Q.from_packed(p)
    assert ql_fused.layout == ql_slow.layout
    np.testing.assert_array_equal(np.asarray(ql_fused.wp), np.asarray(ql_slow.wp))
    np.testing.assert_array_equal(
        np.asarray(ql_fused.scales), np.asarray(ql_slow.scales)
    )
    np.testing.assert_array_equal(
        np.asarray(ql_fused.zeros), np.asarray(ql_slow.zeros)
    )
    assert (ql_fused.kperm is None) == (ql_slow.kperm is None)
    if ql_fused.kperm is not None:
        np.testing.assert_array_equal(
            np.asarray(ql_fused.kperm), np.asarray(ql_slow.kperm)
        )


def test_native_repack_planar(rng):
    iw = rng.integers(0, 4, size=(64, 512)).astype(np.uint32)
    out = native.repack_planar(iw, None, 4, 2)
    c = 128
    exp = (
        iw[:, :c] | (iw[:, c : 2 * c] << 2) | (iw[:, 2 * c : 3 * c] << 4) | (iw[:, 3 * c :] << 6)
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)
