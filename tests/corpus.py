"""Deterministic mixed test corpus (Silesia stand-in; no network egress).

Mirrors the reference test driver's input strategy (random data via
genRandomData, test/main.c:286, or a user file) but with a reproducible mix
of entropy profiles: text-like Markov data, JSON-ish records, binary
structs, runs, and incompressible noise.
"""

from __future__ import annotations

import json
import random
import struct
import zlib


def text_like(n: int, seed: int = 7) -> bytes:
    rnd = random.Random(seed)
    words = ("the quick brown fox jumps over lazy dog compression ratio "
             "throughput deflate huffman entropy stream buffer chunk "
             "hardware device kernel vector lane systolic matrix").split()
    out = []
    total = 0
    while total < n:
        w = rnd.choice(words)
        out.append(w)
        total += len(w) + 1
    return (" ".join(out))[:n].encode()


def json_like(n: int, seed: int = 11) -> bytes:
    rnd = random.Random(seed)
    recs = []
    total = 0
    i = 0
    while total < n:
        rec = {"id": i, "user": f"user_{rnd.randrange(1000)}",
               "score": rnd.random(), "tags": ["a", "b", "c"][: rnd.randrange(4)],
               "active": bool(rnd.getrandbits(1))}
        s = json.dumps(rec)
        recs.append(s)
        total += len(s) + 1
        i += 1
    return ("\n".join(recs))[:n].encode()


def binary_structs(n: int, seed: int = 13) -> bytes:
    rnd = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        out += struct.pack("<IHHd", rnd.randrange(1 << 20), rnd.randrange(500),
                           rnd.randrange(16), rnd.random() * 100)
    return bytes(out[:n])


def runs(n: int, seed: int = 17) -> bytes:
    rnd = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        out += bytes([rnd.randrange(256)]) * rnd.randrange(1, 400)
    return bytes(out[:n])


def noise(n: int, seed: int = 19) -> bytes:
    rnd = random.Random(seed)
    return rnd.randbytes(n)


def make_corpus(scale: int = 1):
    """Dict of name → bytes, ~1.2MB total at scale 1."""
    return {
        "text": text_like(400_000 * scale),
        "json": json_like(300_000 * scale),
        "binary": binary_structs(200_000 * scale),
        "runs": runs(150_000 * scale),
        "noise": noise(100_000 * scale),
        "empty": b"",
        "tiny": b"abc",
        "one_chunk": text_like(60_000, seed=23),
        "exact_chunk": text_like(65536, seed=29),
        "chunk_plus_one": text_like(65537, seed=31),
    }


def make_silesia_like(total_mb: int = 64) -> bytes:
    """Large benchmark buffer with Silesia-like mixed compressibility
    (~2.5-3x gzip L1 ratio)."""
    mb = 1024 * 1024
    unit = (text_like(mb, 3) + json_like(mb, 5) + binary_structs(mb, 7)
            + runs(mb // 2, 9) + noise(mb // 2, 11))
    reps = max(1, (total_mb * mb) // len(unit))
    # vary each repetition slightly so inter-chunk dedup can't fake ratio
    parts = []
    for i in range(reps):
        parts.append(unit[i % 4096:] + unit[: i % 4096])
    return b"".join(parts)[: total_mb * mb]
