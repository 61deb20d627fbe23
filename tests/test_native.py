"""Native packlib must agree bit-for-bit with the jnp packing path."""

import numpy as np
import jax.numpy as jnp
import pytest

from gptq_tpu.ops import native
from gptq_tpu.ops.pack import FIELD_SPLITS, pack_bcq, pack_codes


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("packlib build unavailable")
    return lib


def test_version(lib):
    assert lib.packlib_version() == 2  # v2: planar-subblock word order


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_field_matches_jnp(lib, bits):
    rng = np.random.default_rng(0)
    K, N = 256, 64
    codes = rng.integers(0, 2**bits, size=(K, N)).astype(np.int32)
    jnp_words = pack_codes(jnp.asarray(codes), bits)
    for (fb, sh), jw in zip(FIELD_SPLITS[bits], jnp_words):
        nat = native.pack_field_np(codes, fb, sh)
        np.testing.assert_array_equal(nat, np.asarray(jw))
        # roundtrip
        back = native.unpack_field_np(nat, fb, sh)
        np.testing.assert_array_equal(back, ((codes >> sh) & ((1 << fb) - 1)) << sh)


def test_quantize_codes(lib):
    rng = np.random.default_rng(1)
    N, K, g, bits = 16, 64, 16, 4
    ng = K // g
    scale = np.abs(rng.normal(size=(ng, N))).astype(np.float32) + 0.05
    zero = rng.integers(0, 16, size=(ng, N)).astype(np.float32)
    codes = rng.integers(0, 16, size=(K, N)).astype(np.int32)
    s = np.repeat(scale, g, axis=0)
    z = np.repeat(zero, g, axis=0)
    W = ((codes - z) * s).T.astype(np.float32)  # (N, K)
    got = native.quantize_codes_np(W, scale, zero, 15)
    np.testing.assert_array_equal(got, codes)


def test_pack_signs_matches_jnp(lib):
    rng = np.random.default_rng(2)
    N, K, bits = 8, 64, 3
    B = np.where(rng.normal(size=(N, 1, K, bits)) > 0, 1.0, -1.0).astype(np.float32)
    alpha = np.abs(rng.normal(size=(N, 1, bits))).astype(np.float32)
    pw = pack_bcq(jnp.asarray(B), jnp.asarray(alpha))
    nat = native.pack_signs_np(B.reshape(N, K, bits))
    np.testing.assert_array_equal(nat, np.asarray(pw.words[0]))
