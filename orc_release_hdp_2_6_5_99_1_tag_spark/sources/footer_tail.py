"""Pure-Python ORC file-tail parser: PostScript → Footer → per-column
file statistics, without the JVM.

Why this exists: metadata-only statistics (reference `orc-tools meta`,
`Footer.statistics` — proto `orc_proto.proto:71-91,194-231`) must run
ON EXECUTORS to scale to million-file lakes, but Spark executors'
Python workers have no py4j gateway to the ORC Java library, and
pyarrow.orc exposes file-level facts only (no column statistics). The
tail is a few KiB of protobuf; parsing it needs ~150 lines of wire
format + the ORC chunk framing, both documented in the reference
(`proto/orc_proto.proto`; compression framing `OutStream.java:84-176`:
3-byte little-endian header `(chunkLength << 1) | isOriginal`).

Scope: every chunk codec the postscript can name — NONE, ZLIB (stdlib
raw deflate), SNAPPY/ZSTD (pyarrow codecs), and pure-Python LZ4/LZO1X
block decoders below (both self-terminating, written from the public
format docs; corrupt chunks whose match distance exceeds the decoded
prefix raise instead of wrapping around).

Wire format: field key = varint `(field_number << 3) | wire_type`;
wire types 0=varint, 1=fixed64, 2=length-delimited, 5=fixed32.
sintNN fields are zigzag-encoded.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

# proto enum CompressionKind (orc_proto.proto:205-212)
_COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}

# proto Type.Kind (orc_proto.proto:145-164)
KIND = {
    0: "boolean", 1: "tinyint", 2: "smallint", 3: "int", 4: "bigint",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char",
}  # fmt: skip


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.
    value is int for wire types 0/1/5 (raw, not zigzag-decoded) and
    bytes for wire type 2."""
    pos = 0
    while pos < len(buf):
        key, pos = _varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover - groups don't occur in ORC protos
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield field, wt, v


def _packed_varints(v: Any) -> list[int]:
    """repeated uint32 [packed] arrives as one length-delimited blob;
    unpacked encodings arrive as individual varints."""
    if isinstance(v, int):
        return [v]
    out, pos = [], 0
    while pos < len(v):
        n, pos = _varint(v, pos)
        out.append(n)
    return out


def _lz4_block_decompress(src: bytes) -> bytes:
    """LZ4 raw-block decode (the frame the ORC chunk holds): token =
    (literal_len << 4) | match_len, 255-extension bytes, 2-byte LE
    match offset, min-match 4, overlap-tolerant match copy. The block
    self-terminates (the final sequence is literals-only), so no
    decompressed-size hint is needed — re-derived from the public LZ4
    block format spec."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError(
                f"corrupt LZ4 chunk: literal run of {lit} exceeds the "
                f"{n - i} input bytes left"
            )
        out += src[i : i + lit]
        i += lit
        if i >= n:  # last sequence: literals only
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError(
                f"corrupt LZ4 chunk: match distance {offset} vs "
                f"{len(out)} decoded bytes"
            )
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if offset >= mlen:  # no overlap: one slice
            out += out[start : start + mlen]
        else:  # overlapping match copies byte-by-byte semantics
            for k in range(mlen):
                out.append(out[start + k])
    return bytes(out)


def _lzo1x_decompress(src: bytes) -> bytes:
    """LZO1X block decode, re-derived from the PUBLIC format
    documentation (the LZO stream description distributed with
    liblzo2 / Documentation/lzo.txt): instruction-byte state machine
    where `state` is the literal count of the previous op (0, 1-3, or
    4+), matches carry 2-bit trailing-literal counts, and the stream
    terminates on the distance-16384 marker of the 16..31 opcode."""
    out = bytearray()
    i = 0
    state = 0

    b = src[i]
    if b > 17:  # initial literal run
        i += 1
        t = b - 17
        out += src[i : i + t]
        i += t
        state = 4 if t >= 4 else t

    while True:
        b = src[i]
        i += 1
        if b >= 64:
            # 1LLDDDSS / 01LDDDSS: short match within 2kB
            if b >= 128:
                length = 5 + ((b >> 5) & 3)
            else:
                length = 3 + ((b >> 5) & 1)
            h = src[i]
            i += 1
            distance = (h << 3) + ((b >> 2) & 7) + 1
            s = b & 3
        elif b >= 32:
            # 001LLLLL: match within 16kB
            l = b & 31
            if l == 0:
                zeros = 0
                while src[i] == 0:
                    zeros += 1
                    i += 1
                l = 31 + zeros * 255 + src[i]
                i += 1
            length = 2 + l
            d = src[i] | (src[i + 1] << 8)
            i += 2
            distance = (d >> 2) + 1
            s = d & 3
        elif b >= 16:
            # 0001HLLL: match within 16..48kB, or end-of-stream
            l = b & 7
            if l == 0:
                zeros = 0
                while src[i] == 0:
                    zeros += 1
                    i += 1
                l = 7 + zeros * 255 + src[i]
                i += 1
            length = 2 + l
            d = src[i] | (src[i + 1] << 8)
            i += 2
            distance = 16384 + ((b & 8) << 11) + (d >> 2)
            s = d & 3
            if distance == 16384:
                break  # end of stream
        else:
            # 0000LLLL: long literals (state 0) or tiny match (1..4)
            if state == 0:
                l = b & 15
                if l == 0:
                    zeros = 0
                    while src[i] == 0:
                        zeros += 1
                        i += 1
                    l = 15 + zeros * 255 + src[i]
                    i += 1
                t = 3 + l
                out += src[i : i + t]
                i += t
                state = 4
                continue
            h = src[i]
            i += 1
            if state == 4:
                length = 3
                distance = (h << 2) + ((b >> 2) & 3) + 2049
            else:
                length = 2
                distance = (h << 2) + ((b >> 2) & 3) + 1
            s = b & 3
        # copy the match (overlap-tolerant), then S trailing literals
        if distance > len(out):
            raise ValueError(
                f"corrupt LZO chunk: match distance {distance} exceeds "
                f"{len(out)} decoded bytes"
            )
        start = len(out) - distance
        if distance >= length:
            out += out[start : start + length]
        else:
            for k in range(length):
                out.append(out[start + k])
        if s:
            out += src[i : i + s]
            i += s
        state = s
    return bytes(out)


def _decompress_chunk(chunk: bytes, compression: int) -> bytes:
    if compression == 1:  # ZLIB: raw deflate
        return zlib.decompress(chunk, -15)
    if compression == 2:  # SNAPPY: raw block, uvarint length prefix
        import pyarrow as pa

        size, _ = _varint(chunk, 0)
        return pa.Codec("snappy").decompress(chunk, decompressed_size=size).to_pybytes()
    if compression == 3:  # LZO: LZO1X block, self-terminating
        return _lzo1x_decompress(chunk)
    if compression == 4:  # LZ4: raw block, self-terminating
        return _lz4_block_decompress(chunk)
    if compression == 5:  # ZSTD: stream-decode (no size needed)
        import pyarrow as pa

        with pa.CompressedInputStream(pa.BufferReader(chunk), "zstd") as s:
            return s.read()
    raise ValueError(
        f"unknown ORC compression code {compression!r} "
        f"({_COMPRESSION.get(compression, '?')})"
    )


def _decompress_tail(data: bytes, compression: int) -> bytes:
    """Undo ORC stream framing: sequence of [3-byte LE header][chunk],
    header = (chunkLength << 1) | isOriginal (OutStream.java:84-176)."""
    if compression == 0:
        return data
    out, pos = [], 0
    while pos + 3 <= len(data):
        hdr = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        is_original, length = hdr & 1, hdr >> 1
        chunk = data[pos : pos + length]
        pos += length
        out.append(chunk if is_original else _decompress_chunk(chunk, compression))
    return b"".join(out)


def _parse_postscript(buf: bytes) -> dict:
    ps = {
        "footerLength": 0, "compression": 0, "compressionBlockSize": 262_144,
        "metadataLength": 0, "writerVersion": 0, "magic": "",
    }  # fmt: skip
    for field, _wt, v in _fields(buf):
        if field == 1:
            ps["footerLength"] = v
        elif field == 2:
            ps["compression"] = v
        elif field == 3:
            ps["compressionBlockSize"] = v
        elif field == 5:
            ps["metadataLength"] = v
        elif field == 6:
            # OrcFile.WriterVersion ordinal (orc_proto.proto:232);
            # ORC_135 = 6 is the utc-timestamp-stats cutoff PPD needs
            ps["writerVersion"] = v
        elif field == 8000:
            ps["magic"] = v.decode("utf-8", "replace")
    return ps


def _parse_type(buf: bytes) -> dict:
    t = {
        "kind": 0,
        "subtypes": [],
        "fieldNames": [],
        "precision": None,
        "scale": None,
        "maximumLength": None,  # char/varchar (orc_proto Type.maximumLength=4)
    }
    for field, _wt, v in _fields(buf):
        if field == 1:
            t["kind"] = v
        elif field == 2:
            t["subtypes"] += _packed_varints(v)
        elif field == 3:
            t["fieldNames"].append(v.decode("utf-8"))
        elif field == 4:
            t["maximumLength"] = v
        elif field == 5:
            t["precision"] = v
        elif field == 6:
            t["scale"] = v
    return t


def _f64(raw: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", raw))[0]


def _parse_typed_stats(kind_field: int, buf: bytes) -> dict:
    """One of the typed sub-messages of ColumnStatistics
    (orc_proto.proto:22-69). Returns {min,max,sum,true_count} subset."""
    out: dict = {}
    for field, wt, v in _fields(buf):
        if kind_field == 2:  # IntegerStatistics: sint64 min/max/sum
            if field in (1, 2, 3):
                out[("min", "max", "sum")[field - 1]] = _zigzag(v)
        elif kind_field == 3:  # DoubleStatistics: double min/max/sum
            if field in (1, 2, 3):
                out[("min", "max", "sum")[field - 1]] = _f64(v)
        elif kind_field == 4:  # StringStatistics: str min/max, sint64 len-sum
            if field in (1, 2):
                out[("min", "max")[field - 1]] = v.decode("utf-8")
            elif field == 3:
                out["sum"] = _zigzag(v)
        elif kind_field == 5:  # BucketStatistics: repeated uint64 count
            out["true_count"] = sum(_packed_varints(v))
        elif kind_field == 6:  # DecimalStatistics: strings
            if field in (1, 2, 3):
                out[("min", "max", "sum")[field - 1]] = v.decode("utf-8")
        elif kind_field == 7:  # DateStatistics: sint32 days
            if field in (1, 2):
                out[("min", "max")[field - 1]] = _zigzag(v)
        elif kind_field == 8:  # BinaryStatistics: sint64 byte-sum
            if field == 1:
                out["sum"] = _zigzag(v)
        elif kind_field == 9:  # TimestampStatistics: sint64 millis (+UTC)
            if field in (1, 2, 3, 4):
                out[("min", "max", "min_utc", "max_utc")[field - 1]] = _zigzag(v)
    return out


def _parse_column_statistics(buf: bytes) -> dict:
    s: dict = {"n_values": 0, "has_null": False, "typed": {}, "typed_kind": None}
    for field, _wt, v in _fields(buf):
        if field == 1:
            s["n_values"] = v
        elif field == 10:
            s["has_null"] = bool(v)
        elif 2 <= field <= 9:
            s["typed_kind"] = field
            s["typed"] = _parse_typed_stats(field, v)
    return s


def parse_tail(data: bytes, include_stripe_stats: bool = False) -> dict:
    """Parse an ORC file tail (the last bytes of the file; pass at
    least PostScript+Footer — 16 KiB covers typical schemas, callers
    should retry with `1 + ps_len + footerLength` on a short buffer).

    Returns {compression, magic, n_rows, columns: [{name, kind,
    col_id, n_values, has_null, typed, typed_kind, precision, scale}]}
    for the root struct's top-level fields, exactly the slice the
    reference surfaces per file in `orc-tools meta`. With
    `include_stripe_stats`, also parses the Metadata section (the
    per-stripe ColumnStatistics the reference's A4 merge folds into
    file stats, `OrcProto.Metadata`/`StripeStatistics`) into
    `stripe_stats: [[per-column dict, ...] per stripe]`.
    """
    if len(data) < 4:  # "ORC" + postscript length byte at minimum
        # the reference's ReaderImpl.ensureOrcFooter rejects files
        # shorter than the magic + postscript (zero.orc golden)
        raise ValueError(
            f"not a valid ORC file: {len(data)} bytes is smaller than "
            "the magic + postscript"
        )
    ps_len = data[-1]
    ps = _parse_postscript(data[-1 - ps_len : -1])
    need = 1 + ps_len + ps["footerLength"]
    if include_stripe_stats:
        need += ps["metadataLength"]
    if need > len(data):
        raise _NeedMoreTail(need)
    footer_end = len(data) - (1 + ps_len)
    footer_raw = data[footer_end - ps["footerLength"] : footer_end]
    footer = _decompress_tail(footer_raw, ps["compression"])

    stripe_stats: list[list[dict]] = []
    if include_stripe_stats and ps["metadataLength"]:
        meta_end = footer_end - ps["footerLength"]
        meta_raw = data[meta_end - ps["metadataLength"] : meta_end]
        meta = _decompress_tail(meta_raw, ps["compression"])
        for field, _wt, v in _fields(meta):
            if field == 1:  # StripeStatistics
                stripe_stats.append(
                    [
                        _parse_column_statistics(b)
                        for f, _w, b in _fields(v)
                        if f == 1
                    ]
                )

    types: list[dict] = []
    stats: list[dict] = []
    n_rows = 0
    row_index_stride = 0
    for field, _wt, v in _fields(footer):
        if field == 4:
            types.append(_parse_type(v))
        elif field == 6:
            n_rows = v
        elif field == 7:
            stats.append(_parse_column_statistics(v))
        elif field == 8:  # Footer.rowIndexStride (orc_proto.proto:118)
            row_index_stride = v

    columns = []
    if types and types[0]["kind"] == 12:  # root struct
        root = types[0]
        for name, col_id in zip(root["fieldNames"], root["subtypes"]):
            t = types[col_id]
            col = {
                "name": name,
                "kind": KIND.get(t["kind"], str(t["kind"])),
                "col_id": col_id,
                "precision": t["precision"],
                "scale": t["scale"],
                "max_length": t["maximumLength"],
            }
            if col_id < len(stats):
                col.update(
                    n_values=stats[col_id]["n_values"],
                    has_null=stats[col_id]["has_null"],
                    typed=stats[col_id]["typed"],
                    typed_kind=stats[col_id]["typed_kind"],
                )
            columns.append(col)
    out = {
        "compression": _COMPRESSION.get(ps["compression"], str(ps["compression"])),
        "magic": ps["magic"],
        "n_rows": n_rows,
        "row_index_stride": row_index_stride,
        "writer_version": ps["writerVersion"],
        "compression_block_size": ps["compressionBlockSize"],
        "columns": columns,
        # the FULL per-id footer statistics (Footer.statistics is
        # indexed by column id incl. nested fields) — what nested
        # SArg leaves ("st.a") evaluate at the file level; `columns`
        # above carries the top-level slice merged in
        "footer_stats": stats,
        # the FULL flattened type tree, indexed by column id (0 = root
        # struct): what nested-type consumers (stream_decode's
        # composite readers, subtree IO planning) walk; `columns`
        # above stays the top-level slice orc-tools meta prints
        "types": [
            {
                "kind": KIND.get(t["kind"], str(t["kind"])),
                "subtypes": t["subtypes"],
                "field_names": t["fieldNames"],
                "precision": t["precision"],
                "scale": t["scale"],
                "max_length": t["maximumLength"],  # char/varchar
            }
            for t in types
        ],
    }
    if include_stripe_stats:
        out["stripe_stats"] = stripe_stats
    return out


class _NeedMoreTail(Exception):
    def __init__(self, needed: int):
        super().__init__(f"need {needed} tail bytes")
        self.needed = needed


def parse_tail_of_file(
    path: str,
    initial_read: int = 16 * 1024,
    include_stripe_stats: bool = False,
    max_file_length: int | None = None,
) -> dict:
    """Read + parse a file's tail, growing the read if the footer is
    larger than the initial guess (reference reads the last 16 KiB
    first, `ReaderImpl.extractFileTail:446-560`).

    `max_file_length` is the reference's readable-while-writing bound
    (`OrcConf.MAX_FILE_LENGTH:118-121`, honored at
    `ReaderImpl.extractFileTail:515`): the file is read AS IF it ended
    at that byte, so a reader pointed at a still-growing or torn file
    parses the last durable footer — the length a streaming writer
    publishes in its side file — and sees exactly the committed
    prefix's schema, stripes, and row count."""
    import os

    size = os.path.getsize(path)
    if max_file_length is not None:
        size = min(size, max_file_length)
    with open(path, "rb") as fh:
        n = min(size, initial_read)
        fh.seek(size - n)
        data = fh.read(n)
        try:
            return parse_tail(data, include_stripe_stats=include_stripe_stats)
        except _NeedMoreTail as need:
            n = min(size, need.needed)
            fh.seek(size - n)
            return parse_tail(fh.read(n), include_stripe_stats=include_stripe_stats)


# ---------------------------------------------------------------------------
# Stripe footers: the per-column encodings the writer ACTUALLY chose
# ---------------------------------------------------------------------------

_ENCODING = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2", 3: "DICTIONARY_V2"}


def _parse_stripe_information(buf: bytes) -> dict:
    """OrcProto.StripeInformation (proto/orc_proto.proto): offset=1,
    indexLength=2, dataLength=3, footerLength=4, numberOfRows=5."""
    names = {
        1: "offset",
        2: "indexLength",
        3: "dataLength",
        4: "footerLength",
        5: "numberOfRows",
    }
    s = dict.fromkeys(names.values(), 0)
    for field, _wt, v in _fields(buf):
        if field in names:
            s[names[field]] = v
    return s


def _parse_column_encoding(buf: bytes) -> dict:
    """OrcProto.ColumnEncoding: kind=1, dictionarySize=2."""
    enc = {"kind": "DIRECT", "dictionary_size": 0}
    for field, _wt, v in _fields(buf):
        if field == 1:
            enc["kind"] = _ENCODING.get(v, str(v))
        elif field == 2:
            enc["dictionary_size"] = v
    return enc


def parse_stripe_footers(path: str) -> list[dict]:
    """Parse every stripe's StripeFooter — the per-column encoding
    choices (DICTIONARY_V2 vs DIRECT_V2) the writer actually made,
    i.e. the *output* of the reference's dictionary-cutover decision
    (`WriterImpl.checkDictionaryEncoding`, threshold
    `orc.dictionary.key.threshold`, `OrcConf.java:93-105`) that the
    A6 advisor predicts from the distinct ratio. Per stripe:
    {offset, numberOfRows, encodings} where encodings is indexed by
    column id (0 = the root struct).

    Scale note: metadata-only IO — one tail read plus one
    `footerLength`-byte ranged read per stripe (the `orc-tools meta`
    access pattern), never a data scan."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        n = min(size, 16 * 1024)
        fh.seek(size - n)
        data = fh.read(n)
        ps_len = data[-1]
        ps = _parse_postscript(data[-1 - ps_len : -1])
        need = 1 + ps_len + ps["footerLength"]
        if need > len(data):
            fh.seek(size - need)
            data = fh.read(need)
        footer_end = len(data) - (1 + ps_len)
        footer = _decompress_tail(
            data[footer_end - ps["footerLength"] : footer_end], ps["compression"]
        )
        stripes = [
            _parse_stripe_information(v) for f, _w, v in _fields(footer) if f == 3
        ]
        out = []
        for st in stripes:
            fh.seek(st["offset"] + st["indexLength"] + st["dataLength"])
            sf = _decompress_tail(fh.read(st["footerLength"]), ps["compression"])
            tz = None
            for f, _w, v in _fields(sf):
                if f == 3:  # StripeFooter.writerTimezone
                    tz = v.decode("utf-8")
            out.append(
                {
                    "offset": st["offset"],
                    "indexLength": st["indexLength"],
                    "numberOfRows": st["numberOfRows"],
                    "writerTimezone": tz,
                    "encodings": [
                        _parse_column_encoding(v)
                        for f, _w, v in _fields(sf)
                        if f == 2
                    ],
                    "streams": [
                        _parse_stream(v) for f, _w, v in _fields(sf) if f == 1
                    ],
                }
            )
    return out


_STREAM_KIND = {
    0: "PRESENT", 1: "DATA", 2: "LENGTH", 3: "DICTIONARY_DATA",
    4: "DICTIONARY_COUNT", 5: "SECONDARY", 6: "ROW_INDEX",
    7: "BLOOM_FILTER", 8: "BLOOM_FILTER_UTF8",
}  # fmt: skip


def _parse_stream(buf: bytes) -> dict:
    """OrcProto.Stream: kind=1, column=2, length=3."""
    s = {"kind": "DATA", "column": 0, "length": 0}
    for field, _wt, v in _fields(buf):
        if field == 1:
            s["kind"] = _STREAM_KIND.get(v, str(v))
        elif field == 2:
            s["column"] = v
        elif field == 3:
            s["length"] = v
    return s


def parse_row_index(path: str, column_id: int) -> list[list[dict]]:
    """Parse a column's ROW_INDEX streams: per stripe, the list of
    per-row-group entries ({positions, n_values, has_null, typed
    min/max/sum}) — the reference's RowIndex/RowIndexEntry
    (`OrcProto.RowIndexEntry`: positions=1 packed, statistics=2), the
    granularity `pickRowGroups` actually prunes at. Ranged reads of
    each stripe's index region only."""
    with open(path, "rb") as fh:
        fh.seek(-1, 2)
        ps_len = fh.read(1)[0]
        fh.seek(-(1 + ps_len), 2)
        ps = _parse_postscript(fh.read(ps_len))
        out: list[list[dict]] = []
        for st in parse_stripe_footers(path):
            pos = st["offset"]
            entries: list[dict] = []
            for s in st["streams"]:
                if s["kind"] in ("ROW_INDEX", "BLOOM_FILTER", "BLOOM_FILTER_UTF8"):
                    if s["kind"] == "ROW_INDEX" and s["column"] == column_id:
                        fh.seek(pos)
                        raw = _decompress_tail(fh.read(s["length"]), ps["compression"])
                        for f, _w, v in _fields(raw):
                            if f == 1:  # RowIndexEntry
                                entry: dict = {"positions": []}
                                for ef, _ew, ev in _fields(v):
                                    if ef == 1:
                                        entry["positions"] = _packed_varints(ev)
                                    elif ef == 2:
                                        entry.update(_parse_column_statistics(ev))
                                entries.append(entry)
                    pos += s["length"]
            out.append(entries)
    return out


# position-slot widths (RecordReaderUtils.java:387-390): a byte stream
# records 1 offset, RLE-byte/int add a run offset, the PRESENT
# bitfield adds a bit offset — compression prepends a chunk offset
_BYTE_STREAM_POSITIONS = 1
_RUN_LENGTH_INT_POSITIONS = _BYTE_STREAM_POSITIONS + 1
_BITFIELD_POSITIONS = _BYTE_STREAM_POSITIONS + 1 + 1


def get_index_position(
    column_encoding: str,
    column_type: str,
    stream_type: str,
    is_compressed: bool,
    has_nulls: bool,
) -> int:
    """Offset of `stream_type`'s first slot inside a RowIndexEntry's
    packed positions — the reference's `RecordReaderUtils.
    getIndexPosition` (RecordReaderUtils.java:402-457), the decoder of
    the position layout orc_seek_explain surfaces. PRESENT always
    starts at 0; everything else starts past the PRESENT slots (when
    the column has nulls) and past the preceding streams' slots."""
    if stream_type == "PRESENT":
        return 0
    comp = 1 if is_compressed else 0
    base = (_BITFIELD_POSITIONS + comp) if has_nulls else 0
    t = column_type
    if t in (
        "boolean", "tinyint", "smallint", "int", "bigint", "float",
        "double", "date", "struct", "map", "list", "union",
    ):
        return base
    if t in ("char", "varchar", "string"):
        if column_encoding in ("DICTIONARY", "DICTIONARY_V2"):
            return base
        return base if stream_type == "DATA" else base + _BYTE_STREAM_POSITIONS + comp
    if t in ("binary", "decimal"):
        return base if stream_type == "DATA" else base + _BYTE_STREAM_POSITIONS + comp
    if t == "timestamp":
        return (
            base if stream_type == "DATA"
            else base + _RUN_LENGTH_INT_POSITIONS + comp
        )
    raise ValueError(f"unknown type for index positions: {column_type!r}")
