"""crc32_combine / adler32_combine / xxh32 vs ground truth."""

import zlib

import pytest

from qatzip_tpu.ops import crc32, crc32_combine, adler32, adler32_combine, xxh32
from qatzip_tpu.ops.checksum import crc32_combine_many
from qatzip_tpu.ops.xxhash import XXH32State, _xxh32_py


def test_crc32_combine_matches_whole():
    a, b = b"hello world", b"goodbye moon" * 97
    whole = zlib.crc32(a + b)
    assert crc32_combine(crc32(a), crc32(b), len(b)) == whole


def test_crc32_combine_many():
    chunks = [b"a" * 1000, b"bc" * 700, b"", b"xyz" * 333]
    whole = zlib.crc32(b"".join(chunks))
    assert crc32_combine_many([crc32(c) for c in chunks],
                              [len(c) for c in chunks]) == whole


def test_adler32_combine():
    a, b = b"adler test one", b"adler test two" * 55
    whole = zlib.adler32(a + b)
    assert adler32_combine(adler32(a), adler32(b), len(b)) == whole


@pytest.mark.parametrize("data,seed,want", [
    (b"", 0, 0x02CC5D05),
    (b"a", 0, 0x550D7456),
    (b"abc", 0, 0x32D153FF),
    (b"Hello World", 0, 0xB1FD16EE),
    (b"xxhash test of a longer input spanning stripes..", 0, None),
])
def test_xxh32_vectors(data, seed, want):
    got = xxh32(data, seed)
    if want is not None:
        assert got == want
    # python fallback must agree with the native path
    assert _xxh32_py(data, seed) == got


def test_xxh32_streaming_matches_oneshot():
    data = bytes(range(256)) * 123
    st = XXH32State(5)
    for off in range(0, len(data), 97):
        st.update(data[off:off + 97])
    assert st.digest() == xxh32(data, 5)


def test_crc64_native_matches_python_oracle():
    """The slicing-by-8 native CRC64 must agree with the per-byte Python
    reference across configs, lengths, and streaming continuation."""
    import os
    from qatzip_tpu import native
    from qatzip_tpu.crc64 import Crc64, Crc64Config

    if native.lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    data = os.urandom(5000)
    configs = [
        Crc64Config(),
        Crc64Config(reflect_in=True, reflect_out=True,
                    initial_value=(1 << 64) - 1, xor_out=(1 << 64) - 1),
        Crc64Config(polynomial=0xAD93D23594C935A9, reflect_in=True,
                    reflect_out=True),
    ]
    for cfg in configs:
        e = Crc64(cfg)
        assert e._ntbl is not None
        for n in (0, 1, 7, 8, 9, 63, 1000, 5000):
            d = data[:n]
            assert e.compute(d) == e._compute_py(d, cfg.initial_value)
        # streaming continuation equivalence
        c = e.compute(data[:1234])
        c = e.compute(data[1234:], c)
        assert c == e.compute(data)
