"""7z BCJ2 (4-stream x86 converter) reader support.

The reference's 7z reader handles only its own deflate folders
(/root/reference/utils/qzip_7z.c:44); BCJ2 extraction exceeds parity.
No stock 7z binary exists in this image, so the archives are crafted
byte-exactly to the public format: one with BCJ2 fed directly by pack
streams, one stock-shaped (BCJ2 over LZMA2/LZMA inner coders wired by
bind pairs with explicit packed-stream indices).
"""

import lzma
import os
import struct
import zlib

import pytest

from qatzip_tpu.formats.sevenzip import (
    CODEC_BCJ2, CODEC_LZMA1, CODEC_LZMA2, MAGIC, VERSION,
    _RangeDecoder, _RangeEncoder, bcj2_decode, bcj2_encode, extract_7z,
    write_number,
)
from qatzip_tpu.constants import QzError

K_END, K_HEADER, K_MAIN_STREAMS, K_FILES_INFO = 0x00, 0x01, 0x04, 0x05
K_PACK_INFO, K_UNPACK_INFO = 0x06, 0x07
K_SIZE, K_CRC, K_FOLDER, K_CODERS_UNPACK_SIZE = 0x09, 0x0A, 0x0B, 0x0C
K_NAME = 0x11


def _x86ish(n=6000, seed=3):
    """Synthetic code-like bytes with plenty of E8/E9/0F 8x sites."""
    import numpy as np
    rng = np.random.default_rng(seed)
    out = bytearray()
    while len(out) < n:
        r = int(rng.integers(0, 10))
        if r < 3:
            op = [0xE8, 0xE9, 0x0F][r]
            out.append(op)
            if op == 0x0F:
                out.append(0x80 + int(rng.integers(0, 16)))
            out += int(rng.integers(0, 1 << 31)).to_bytes(4, "little")
        else:
            out += rng.integers(0, 256, int(rng.integers(1, 9)),
                                dtype=np.uint8).tobytes()
    return bytes(out[:n])


def test_range_coder_roundtrip():
    import numpy as np
    rng = np.random.default_rng(1)
    bits = [int(b) for b in rng.integers(0, 2, 4000)]
    ctxs = [int(c) for c in rng.integers(0, 258, 4000)]
    probs_e = [1024] * 258
    enc = _RangeEncoder()
    for b, c in zip(bits, ctxs):
        enc.encode_bit(probs_e, c, b)
    blob = enc.flush()                 # first byte is the zero cache byte
    probs_d = [1024] * 258
    dec = _RangeDecoder(blob)
    for b, c in zip(bits, ctxs):
        assert dec.decode_bit(probs_d, c) == b
    assert probs_e == probs_d


@pytest.mark.parametrize("case", ["x86", "text", "tail_marker", "tiny"])
def test_bcj2_codec_roundtrip(case):
    data = {
        "x86": _x86ish(),
        "text": b"no branch opcodes here, plain text " * 100,
        # markers with fewer than 4 trailing bytes (unconvertible sites)
        "tail_marker": _x86ish(500) + b"\xe8\x01\x02",
        "tiny": b"\xe9",
    }[case]
    main, call, jump, rc = bcj2_encode(data)
    assert bcj2_decode(main, call, jump, rc, len(data)) == data
    if case == "x86":
        # the split actually moved branch targets out of main
        assert len(call) > 0 and len(jump) > 0
        assert len(main) < len(data)


def test_bcj2_decode_truncated_streams():
    data = _x86ish(800)
    main, call, jump, rc = bcj2_encode(data)
    with pytest.raises(QzError):
        bcj2_decode(main[:-5], call, jump, rc, len(data))
    if len(call) >= 4:
        with pytest.raises(QzError):
            bcj2_decode(main, call[:2], jump, rc, len(data))


def _coder_bytes(codec: bytes, nin=1, nout=1, props=b"") -> bytes:
    flags = len(codec)
    if (nin, nout) != (1, 1):
        flags |= 0x10
    if props:
        flags |= 0x20
    out = bytearray([flags]) + codec
    if flags & 0x10:
        out += write_number(nin) + write_number(nout)
    if flags & 0x20:
        out += write_number(len(props)) + props
    return bytes(out)


def _archive(packs, coders, bind_pairs, packed_indices, unpack_sizes,
             folder_crc, name, path):
    """Craft a one-folder one-file .7z with the given folder graph."""
    body = b"".join(packs)
    hdr = bytearray([K_HEADER, K_MAIN_STREAMS, K_PACK_INFO])
    hdr += write_number(0) + write_number(len(packs))
    hdr.append(K_SIZE)
    for p in packs:
        hdr += write_number(len(p))
    hdr.append(K_END)
    hdr += bytes([K_UNPACK_INFO, K_FOLDER])
    hdr += write_number(1)
    hdr.append(0)                                   # not external
    hdr += write_number(len(coders))
    for c in coders:
        hdr += c
    for (i, o) in bind_pairs:
        hdr += write_number(i) + write_number(o)
    if len(packed_indices) > 1:
        for i in packed_indices:
            hdr += write_number(i)
    hdr.append(K_CODERS_UNPACK_SIZE)
    for s in unpack_sizes:
        hdr += write_number(s)
    if folder_crc is not None:
        hdr += bytes([K_CRC, 1]) + struct.pack("<I", folder_crc)
    hdr += bytes([K_END, K_END, K_FILES_INFO])
    hdr += write_number(1)
    nm = name.encode("utf-16-le") + b"\x00\x00"
    hdr.append(K_NAME)
    hdr += write_number(1 + len(nm))
    hdr.append(0)
    hdr += nm
    hdr += bytes([K_END, K_END])

    nh_crc = zlib.crc32(hdr) & 0xFFFFFFFF
    sig_tail = struct.pack("<QQI", len(body), len(hdr), nh_crc)
    start_crc = zlib.crc32(sig_tail) & 0xFFFFFFFF
    with open(path, "wb") as f:
        f.write(MAGIC + VERSION + struct.pack("<I", start_crc) + sig_tail)
        f.write(body)
        f.write(bytes(hdr))


def test_extract_bcj2_direct_pack_streams(tmp_path):
    """Folder = one BCJ2 coder fed by four raw pack streams."""
    data = _x86ish(4000, seed=7)
    main, call, jump, rc = bcj2_encode(data)
    arc = str(tmp_path / "direct.7z")
    _archive(
        packs=[main, call, jump, rc],
        coders=[_coder_bytes(CODEC_BCJ2, nin=4, nout=1)],
        bind_pairs=[],
        packed_indices=[0, 1, 2, 3],
        unpack_sizes=[len(data)],
        folder_crc=zlib.crc32(data) & 0xFFFFFFFF,
        name="code.bin", path=arc)
    out = tmp_path / "out"
    extract_7z(arc, str(out))
    assert (out / "code.bin").read_bytes() == data


def test_extract_bcj2_stock_shape(tmp_path):
    """Stock 7z layout: BCJ2 whose main/call/jump ride LZMA2/LZMA coders
    wired by bind pairs; rc packed raw; explicit packed-stream indices."""
    data = _x86ish(20000, seed=11)
    main, call, jump, rc = bcj2_encode(data)

    lz2 = lzma.LZMACompressor(lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20}])
    main_c = lz2.compress(main) + lz2.flush()
    lzma2_props = bytes([16])          # (2|(p&1)) << (p//2+11) == 1<<20

    def lzma1(blob):
        c = lzma.LZMACompressor(lzma.FORMAT_RAW, filters=[
            {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
             "dict_size": 1 << 16}])
        return c.compress(blob) + c.flush()

    lzma1_props = bytes([2 * 45 + 0 * 9 + 3]) + struct.pack("<I", 1 << 16)
    call_c, jump_c = lzma1(call), lzma1(jump)

    # coder 0: LZMA2 (in 0 -> out 0), coder 1/2: LZMA1 (in 1/2 -> out 1/2),
    # coder 3: BCJ2 (ins 3..6 -> out 3, the folder output)
    arc = str(tmp_path / "stock.7z")
    _archive(
        packs=[main_c, call_c, jump_c, rc],
        coders=[
            _coder_bytes(CODEC_LZMA2, props=lzma2_props),
            _coder_bytes(CODEC_LZMA1, props=lzma1_props),
            _coder_bytes(CODEC_LZMA1, props=lzma1_props),
            _coder_bytes(CODEC_BCJ2, nin=4, nout=1),
        ],
        bind_pairs=[(3, 0), (4, 1), (5, 2)],
        packed_indices=[0, 1, 2, 6],
        unpack_sizes=[len(main), len(call), len(jump), len(data)],
        folder_crc=zlib.crc32(data) & 0xFFFFFFFF,
        name="prog.exe", path=arc)
    out = tmp_path / "out"
    extract_7z(arc, str(out))
    assert (out / "prog.exe").read_bytes() == data


def test_extract_bcj2_bad_crc_rejected(tmp_path):
    data = _x86ish(1000, seed=5)
    main, call, jump, rc = bcj2_encode(data)
    arc = str(tmp_path / "bad.7z")
    _archive(
        packs=[main, call, jump, rc],
        coders=[_coder_bytes(CODEC_BCJ2, nin=4, nout=1)],
        bind_pairs=[],
        packed_indices=[0, 1, 2, 3],
        unpack_sizes=[len(data)],
        folder_crc=(zlib.crc32(data) ^ 1) & 0xFFFFFFFF,
        name="x.bin", path=arc)
    with pytest.raises(QzError):
        extract_7z(arc, str(tmp_path / "out"))
    assert not os.path.exists(tmp_path / "out" / "x.bin")
