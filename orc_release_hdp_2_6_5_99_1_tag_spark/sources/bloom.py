"""Pure-Python ORC bloom-filter index reader + membership test — the
read-side of the reference's bloom row-group skipping
(`RecordReaderImpl.checkInBloomFilter`, `util/BloomFilter.java`,
`util/Murmur3.java`; stream layout per the ORC spec's index section).

The engine's QUERY path uses Spark's built-in bloom pushdown (F9/I2,
plan- and metric-asserted elsewhere); this module exists for tool-side
parity — `orc-tools check`-style "would this key be skipped" answers
from ranged metadata reads only — and to let the TruthValue kernel
(`functions/truth.py`) refine a range-MAYBE to NO exactly the way the
reference does.

Hash functions are re-implemented from their public definitions:
Murmur3 x64 128's first word with ORC's DEFAULT_SEED (104729) for
byte strings, and the Thomas Wang 64-bit mix for longs; membership is
the Kirsch-Mitzenmacher double-hash probe over an int32 lattice with
Java's exact overflow semantics (validated against real files written
by the embedded Java writer: inserted values MUST all test positive —
a single false negative is a correctness bug, not noise).
"""

from __future__ import annotations

import struct
from typing import Any

DEFAULT_SEED = 104729  # org.apache.orc.util.Murmur3.DEFAULT_SEED

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_R1, _R2, _M, _N1 = 31, 27, 5, 0x52DCE729


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK64
    h ^= h >> 33
    return h


def murmur3_hash64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Murmur3 64-bit hash (the x64 variant's first word), matching
    `Murmur3.hash64(byte[])`. Returns a SIGNED 64-bit value (Java
    long semantics)."""
    h = seed & _MASK64
    n_blocks = len(data) // 8
    for i in range(n_blocks):
        (k,) = struct.unpack_from("<Q", data, i * 8)
        k = (k * _C1) & _MASK64
        k = _rotl64(k, _R1)
        k = (k * _C2) & _MASK64
        h ^= k
        h = (_rotl64(h, _R2) * _M + _N1) & _MASK64
    # tail
    k1 = 0
    tail = data[n_blocks * 8 :]
    for i in range(len(tail) - 1, -1, -1):
        k1 ^= (tail[i] & 0xFF) << (8 * i)
    if tail:
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, _R1)
        k1 = (k1 * _C2) & _MASK64
        h ^= k1
    h ^= len(data)
    h = _fmix64(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def wang_long_hash(key: int) -> int:
    """Thomas Wang 64-bit integer mix, matching
    `BloomFilter.getLongHash(long)` (used by addLong/testLong)."""
    key &= _MASK64
    key = ((~key & _MASK64) + ((key << 21) & _MASK64)) & _MASK64
    key ^= key >> 24
    key = (key + ((key << 3) & _MASK64) + ((key << 8) & _MASK64)) & _MASK64
    key ^= key >> 14
    key = (key + ((key << 2) & _MASK64) + ((key << 4) & _MASK64)) & _MASK64
    key ^= key >> 28
    key = (key + ((key << 31) & _MASK64)) & _MASK64
    return key - (1 << 64) if key >= (1 << 63) else key


def _to_i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def test_hash(bloom: dict, hash64: int) -> bool:
    """Kirsch-Mitzenmacher probe (`BloomFilter.testHash`): hash1/hash2
    are the low/high int32 words; probe i uses hash1 + i*hash2 with
    Java int overflow, bit-flipped when negative, modulo numBits."""
    bits: list[int] = bloom["bits"]
    num_bits = 64 * len(bits)
    if num_bits == 0:
        return True
    h = hash64 & _MASK64
    hash1 = _to_i32(h)
    hash2 = _to_i32(h >> 32)
    for i in range(1, bloom["num_hash"] + 1):
        combined = _to_i32(hash1 + i * hash2)
        if combined < 0:
            combined = ~combined
        pos = combined % num_bits
        if not (bits[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def might_contain_long(bloom: dict, value: int) -> bool:
    return test_hash(bloom, wang_long_hash(value))


def might_contain_string(bloom: dict, value: str) -> bool:
    return test_hash(bloom, murmur3_hash64(value.encode("utf-8")))


def might_contain(bloom: dict, value: Any) -> bool:
    """Probe with the writer's per-type encoding (WriterImpl.java:
    timestamps addLong(utcMillis) in the UTF8 bloom :1816, dates
    addLong(epochDays) :1922, decimals addString(HiveDecimal
    toString) :2029, doubles addLong(doubleToLongBits))."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(value, bool):  # booleans have no bloom streams
        return True
    if isinstance(value, int):
        return might_contain_long(bloom, value)
    if isinstance(value, str):
        return might_contain_string(bloom, value)
    if isinstance(value, float):
        # addDouble = addLong(doubleToLongBits) — UTF8 bloom version
        (bits,) = struct.unpack("<q", struct.pack("<d", value))
        return might_contain_long(bloom, bits)
    if isinstance(value, _dt.datetime):
        # naive = UTC by the engine's session pin; floor to millis the
        # way the writer's secs*1000 + nanos/1e6 truncation does
        ms = (value - _dt.datetime(1970, 1, 1)) // _dt.timedelta(milliseconds=1)
        return might_contain_long(bloom, ms)
    if isinstance(value, _dt.date):
        return might_contain_long(bloom, (value - _dt.date(1970, 1, 1)).days)
    if isinstance(value, _Dec):
        s = str(value)
        if "." in s:  # HiveDecimal.toString strips trailing zeros
            s = s.rstrip("0").rstrip(".") or "0"
        return might_contain_string(bloom, s)
    raise TypeError(f"no bloom encoding for {type(value)}")


def _parse_bloom_filter(buf: bytes) -> dict:
    """OrcProto.BloomFilter: numHashFunctions=1, repeated fixed64
    bitset=2 (pre-UTF8 files), utf8bitset=3 bytes (ORC-101 files —
    little-endian longs).

    Legacy dev-era files (e.g. the reference's `over1k_bloom.orc`
    golden) carry an earlier draft of the message —
    {expectedEntries=1, fpp=2 (double), repeated uint64 varint
    bitset=3} — detected by field 2 arriving as a fixed64 double and
    field 3 as varints; the hash count is then the standard
    k = round(m/n·ln2) the writer derived from the same parameters.
    The STRUCTURAL decode of that draft is pinned (the popcount
    matches k·distinct minus expected collisions on two independent
    columns, tests/test_bloom_parity.py), but MEMBERSHIP probing of
    draft-era files is closed as unrecoverable: an exhaustive search
    over every published hash in the lineage (Murmur3 hash64 tail/len
    variants, x64_128 pairs incl. Guava MURMUR128_MITZ_64, x86_128,
    Murmur2-64A × seeds {0, 104729} × probe bases {0,1} × int32/64-bit
    probe arithmetic × both bit orders × k {4,5}) scores chance-level
    bit overlap, so the draft writer's hash predates every published
    variant. Modern files — everything the current reference or this
    engine writes — have exact zero-false-negative parity."""
    import math

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import _fields

    num_hash, bits = 0, []
    legacy_n, legacy_varint_bits = None, []
    for field, wt, v in _fields(buf):
        if field == 1:
            num_hash = v
        elif field == 2:
            if wt == 1:  # unpacked fixed64: modern bitset OR legacy fpp
                bits.append(v)
            else:  # packed fixed64s
                bits.extend(struct.unpack_from(f"<{len(v) // 8}Q", v))
        elif field == 3:
            if isinstance(v, int):  # legacy repeated uint64 varint bitset
                legacy_varint_bits.append(v)
            else:  # modern utf8bitset bytes
                bits.extend(struct.unpack_from(f"<{len(v) // 8}Q", v))
    if legacy_varint_bits:
        legacy_n = num_hash  # field 1 was expectedEntries in the draft
        bits = legacy_varint_bits  # field 2 was fpp, not a bitset word
        m = 64 * len(bits)
        num_hash = max(1, round(m / max(1, legacy_n) * math.log(2)))
    return {"num_hash": num_hash, "bits": bits}


def parse_bloom_index(path: str, column_id: int) -> list[list[dict]]:
    """Parse a column's bloom-filter index streams out of a real ORC
    file: per stripe, the list of per-row-group blooms. Ranged reads
    only — the index region of each stripe, located via the stream
    directory in the StripeFooter (index-region streams precede data
    streams in listing order, offsets are cumulative lengths)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        _decompress_tail,
        _fields,
        _parse_postscript,
        parse_stripe_footers,
    )

    with open(path, "rb") as fh:
        fh.seek(-1, 2)
        ps_len = fh.read(1)[0]
        fh.seek(-(1 + ps_len), 2)
        ps = _parse_postscript(fh.read(ps_len))
        out: list[list[dict]] = []
        for st in parse_stripe_footers(path):
            pos = st["offset"]
            blooms: list[dict] = []
            for s in st["streams"]:
                if s["kind"] in ("ROW_INDEX", "BLOOM_FILTER", "BLOOM_FILTER_UTF8"):
                    if (
                        s["kind"] in ("BLOOM_FILTER", "BLOOM_FILTER_UTF8")
                        and s["column"] == column_id
                    ):
                        fh.seek(pos)
                        raw = _decompress_tail(
                            fh.read(s["length"]), ps["compression"]
                        )
                        for f, _w, v in _fields(raw):
                            if f == 1:  # repeated BloomFilter
                                blooms.append(_parse_bloom_filter(v))
                    pos += s["length"]
            out.append(blooms)
    return out
