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


def test_native_repack_planar(rng):
    iw = rng.integers(0, 4, size=(64, 512)).astype(np.uint32)
    out = native.repack_planar(iw, None, 4, 2)
    c = 128
    exp = (
        iw[:, :c] | (iw[:, c : 2 * c] << 2) | (iw[:, 2 * c : 3 * c] << 4) | (iw[:, 3 * c :] << 6)
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)
