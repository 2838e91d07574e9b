"""Native-decoder sweep over the reference's ENTIRE example corpus
(`/root/reference/examples/*.orc`): every golden either decodes
value-exactly against an independent reader (pyarrow's C++ ORC), or
fails with a PINNED, documented error (no row index,
not-an-ORC-file). Nothing in the corpus is silently skipped.

This is the capstone of the stream_decode parity work: the corpus
spans v0.11 (RLEv1, DICTIONARY v1) and v0.12 (RLEv2) writers, all
five chunk codecs (NONE/ZLIB/SNAPPY/LZ4/LZO), dev-era writers (over1k_bloom's mixed v1/v2
encodings, all-null stripes with zero-length compressed streams),
non-struct roots (testTimestamp), future writer versions
(version1999), nested composites, unions, decimals, and the
1.9M-row demo files (bounded to one stripe / one row group — the
format coverage is identical, the remainder is just volume).

RUNTIME BUDGET (round-10 housekeeping; SAMPLED fast path round 13 per
the r12 verdict Next #5): the default battery runs a COVERING SUBSET —
at least one file per encoding × codec × writer-version cell (both RLE
versions, both dictionary versions, all five chunk codecs, both
split-elim writer generations, bloom, decimal, binary, both timestamp
epoch edges, nulls-at-end) — and the five files whose cells are
duplicates of test1/its peers run only under SPARK_GRAFT_FULL_SWEEP=1
(the nightly/full mode; `_full_sweep_param` marks them, so they show
as SKIPPED, never silently dropped). Row bounds on the demo files
remain the volume lever. The corpus contract is unchanged: nothing is
silently skipped — sampled-out files are visible skips with the env
flag named in the reason.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.sources import stream_decode as sd
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
    parse_row_index,
    parse_stripe_footers,
    parse_tail_of_file,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.tools import plan_read_ranges

EX = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EX), reason="reference examples absent"
)


def _keep_all_picks(path, only_group=None):
    """sd.keep_all_picks, optionally narrowed to a single group (the
    demo files' volume bound)."""
    picks = sd.keep_all_picks(path)
    if only_group is not None:
        for per_stripe in picks:
            for d in per_stripe:
                d["keep"] = d["row_group"] == only_group
    return picks


def _decode(path, cols, stripes=None, only_group=None):
    picks = _keep_all_picks(path, only_group=only_group)
    plan = plan_read_ranges(path, None, columns=cols, picks=picks)
    got = {c: [] for c in cols}
    n_stripes = len(parse_stripe_footers(path))
    for si in range(n_stripes) if stripes is None else stripes:
        res = sd.decode_stripe(path, si, None, cols, picks=picks, plan=plan)
        for c in cols:
            got[c].extend(res["columns"][c])
    return got


def _norm(v):
    """Fold both decoders' surfaces onto one comparable shape."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, tuple):
        return tuple(_norm(x) for x in v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if hasattr(v, "to_pydatetime") or isinstance(v, dt.datetime):
        return (v.year, v.month, v.day, v.hour, v.minute, v.second,
                v.microsecond)  # fmt: skip
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


FULL_SWEEP = os.environ.get("SPARK_GRAFT_FULL_SWEEP") == "1"


def _full_sweep_param(*entry):
    """A corpus entry whose format cells are fully covered by another
    default-battery file: runs only under SPARK_GRAFT_FULL_SWEEP=1,
    and shows as an explicit SKIP otherwise (never silently dropped)."""
    return pytest.param(
        *entry,
        marks=pytest.mark.skipif(
            not FULL_SWEEP,
            reason="cell-duplicate golden; set SPARK_GRAFT_FULL_SWEEP=1",
        ),
        id=entry[0],
    )


# (file, stripes-to-decode, only_group) — None = everything.
# Sampled-out entries name the default-battery file covering their
# encoding × codec × writer-version cells.
_PARITY = [
    # zlib v0.12 int+string direct — covered by test1's full type zoo
    _full_sweep_param("TestOrcFile.columnProjection.orc", None, None),
    ("TestOrcFile.test1.orc", None, None),
    # user-metadata file; decode surface = test1, metadata parsing is
    # pinned in test_footer_tail
    _full_sweep_param("TestOrcFile.metaData.orc", None, None),
    # zlib int/string — covered by test1 (PPD itself is tested on
    # synthetic strided files across the ppd suites)
    _full_sweep_param("TestOrcFile.testPredicatePushdown.orc", None, None),
    # zlib mixed random — covered by test1; seek/row-skip behavior is
    # pinned by f12 and the row-group tests
    _full_sweep_param("TestOrcFile.testSeek.orc", [0], None),
    ("TestOrcFile.testSnappy.orc", None, None),
    ("TestOrcFile.testStringAndBinaryStatistics.orc", None, None),
    # 3-stripe zlib int/string — covered by test1; stripe stats are
    # pinned in test_footer_tail/footer_stats
    _full_sweep_param("TestOrcFile.testStripeLevelStats.orc", None, None),
    ("TestOrcFile.testDate1900.orc", [0], None),
    ("TestOrcFile.testDate2038.orc", [0], None),
    ("TestVectorOrcFile.testLz4.orc", None, None),
    ("TestVectorOrcFile.testLzo.orc", None, None),
    ("orc-file-11-format.orc", None, None),
    ("orc_split_elim.orc", None, None),
    ("orc_split_elim_new.orc", None, None),
    ("over1k_bloom.orc", None, None),
    ("nulls-at-end-snappy.orc", [0], None),
    ("decimal.orc", None, None),
    # 1.9M rows each: bound to one stripe / one row group — same
    # format surface (v0.11 RLEv1+zlib / v0.12 RLEv2+zlib), less volume
    ("demo-11-zlib.orc", [0], None),
    ("demo-12-zlib.orc", [0], 0),
]


def _ids(entries):
    return [e.id if hasattr(e, "id") else e[0] for e in entries]


@pytest.mark.parametrize(
    "fname,stripes,only_group", _PARITY, ids=_ids(_PARITY)
)
def test_corpus_value_parity_vs_pyarrow(fname, stripes, only_group):
    import pyarrow.orc as pa_orc

    path = os.path.join(EX, fname)
    meta = parse_tail_of_file(path)
    cols = [c["name"] for c in meta["columns"]]
    assert cols, f"{fname}: expected struct root"
    # unions compare against the reference dump instead (pyarrow's
    # arrow surface loses union validity — see test_stream_decode)
    cols = [
        c["name"] for c in meta["columns"] if c["kind"] != "union"
    ]
    got = _decode(path, cols, stripes=stripes, only_group=only_group)

    table = pa_orc.ORCFile(path).read()
    exp = table.to_pydict()
    n = len(got[cols[0]])
    assert n > 0
    for c in cols:
        want = exp[c][:n] if only_group is None else exp[c][: len(got[c])]
        assert len(got[c]) == len(want)
        for i, (g, e) in enumerate(zip(got[c], want)):
            assert _norm(g) == _norm(e), (fname, c, i, g, e)


def test_corpus_non_struct_root():
    """testTimestamp's root is a bare timestamp column (no struct):
    surfaced as `_root` and decoded value-exactly against the
    reference reader's own expected dump — pyarrow REFUSES this file
    ('Only ORC files with a top-level struct can be handled'), so the
    native decoder covers more of the corpus than arrow does."""
    import gzip
    import json

    path = os.path.join(EX, "TestOrcFile.testTimestamp.orc")
    got = _decode(path, ["_root"])["_root"]
    exp = [
        json.loads(line)
        for line in gzip.open(
            os.path.join(EX, "expected", "TestOrcFile.testTimestamp.jsn.gz"),
            "rt",
        )
    ]
    assert len(got) == len(exp) == 12
    for g, e in zip(got, exp):
        head, _, frac = e.partition(".")
        micros = int((frac or "0").ljust(9, "0")[:9]) // 1000
        want = dt.datetime.strptime(head, "%Y-%m-%d %H:%M:%S").replace(
            microsecond=micros
        )
        assert g == want


def test_corpus_pinned_failures():
    """Every non-decodable corpus member fails the PINNED way."""
    # 0-byte file: not a valid ORC file (ReaderImpl.ensureOrcFooter)
    with pytest.raises(ValueError, match="not a valid ORC file"):
        parse_tail_of_file(os.path.join(EX, "zero.orc"))
    # no row index -> no partial-read planning
    for f in (
        "TestOrcFile.testWithoutIndex.orc",
        "TestOrcFile.testMemoryManagementV11.orc",
        "TestOrcFile.testMemoryManagementV12.orc",
    ):
        with pytest.raises(ValueError, match="no row index"):
            sd.decode_stripe(os.path.join(EX, f), 0, None, ["int1"])
    # (no codec limits remain: LZ4 and LZO both decode natively —
    # see _PARITY; an UNKNOWN compression code still raises)


def test_corpus_future_writer_version_permissive():
    """version1999.orc: a postscript stamped by a writer from the
    future parses permissively (the reference reads unknown future
    versions; Spark's reader refuses — SURVEY §1.2)."""
    meta = parse_tail_of_file(os.path.join(EX, "version1999.orc"))
    assert meta["magic"] == "ORC"
    assert meta["n_rows"] == 0


def test_corpus_empty_file():
    meta = parse_tail_of_file(os.path.join(EX, "TestOrcFile.emptyFile.orc"))
    assert meta["n_rows"] == 0
    assert parse_stripe_footers(os.path.join(EX, "TestOrcFile.emptyFile.orc")) == []


def test_lz4_block_decoder_fuzz_vs_pyarrow_compressor():
    """Independent round-trip fuzz for the pure-Python LZ4 block
    decoder: pyarrow's lz4_raw COMPRESSOR produces the blocks, our
    decoder must invert them byte-exactly — runs, literals,
    extensions, overlapping matches, and incompressible spans."""
    import random

    import pyarrow as pa

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        _lz4_block_decompress,
    )

    codec = pa.Codec("lz4_raw")
    rng = random.Random(20260816)
    cases = [
        b"",
        b"a",
        b"a" * 100_000,                       # one long run
        bytes(rng.randrange(256) for _ in range(70_000)),  # incompressible
        (b"the quick brown fox " * 4096),     # repeated phrase matches
        bytes(rng.randrange(4) for _ in range(50_000)),    # low entropy
        b"".join(
            bytes([rng.randrange(256)]) * rng.randrange(1, 300)
            for _ in range(500)
        ),                                    # mixed run lengths
    ]
    for i, data in enumerate(cases):
        comp = codec.compress(data)
        comp = comp if isinstance(comp, bytes) else comp.to_pybytes()
        assert _lz4_block_decompress(comp) == data, f"case {i}"


def test_lz4_corrupt_chunk_fails_loudly():
    """A match distance beyond the decoded prefix raises (corrupt
    chunk) instead of silently wrapping to the buffer tail."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        _lz4_block_decompress,
    )

    # token: 1 literal + match len 4; offset 9999 with only 1 byte out
    bad = bytes([0x10, 0x41, 0x0F, 0x27, 0x00])
    with pytest.raises(ValueError, match="corrupt LZ4"):
        _lz4_block_decompress(bad)


# dump-bearing decodable goldens not already dump-pinned elsewhere
# (testTimestamp + testUnionAndTimestamp + orc-file-11-format have
# dedicated dump tests; Memory/WithoutIndex/zero/emptyFile are the
# pinned non-decodables). Large files bound to stripe 0 — dumps are
# row-ordered, so a prefix compare is exact.
# the expected-dump SECOND oracle: same covering-subset rule as
# _PARITY (the sampled-out files' cells stay dump-checked through
# test1 and the codec/epoch/binary keepers)
_DUMP_PARITY = [
    _full_sweep_param("TestOrcFile.columnProjection.orc", None),
    _full_sweep_param("TestOrcFile.metaData.orc", None),
    ("TestOrcFile.test1.orc", None),
    ("TestOrcFile.testDate1900.orc", [0]),
    ("TestOrcFile.testDate2038.orc", [0]),
    _full_sweep_param("TestOrcFile.testPredicatePushdown.orc", None),
    _full_sweep_param("TestOrcFile.testSeek.orc", [0]),
    ("TestOrcFile.testSnappy.orc", None),
    ("TestOrcFile.testStringAndBinaryStatistics.orc", None),
    _full_sweep_param("TestOrcFile.testStripeLevelStats.orc", None),
    ("TestVectorOrcFile.testLz4.orc", None),
    ("TestVectorOrcFile.testLzo.orc", None),
    ("decimal.orc", None),
    ("nulls-at-end-snappy.orc", [0]),
    ("orc_split_elim.orc", None),
    ("orc_split_elim_new.orc", None),
    ("over1k_bloom.orc", None),
]


def _dump_norm(v, e):
    """Compare one decoded value against its expected-dump JSON shape
    (the reference tool's own output conventions): binary = unsigned
    byte list, timestamp = 'Y-m-d H:M:S.nanos' compared at the
    decoder's microsecond surface, date = ISO string, float = value
    compare (float32 dumps print the shortest round-trip repr),
    decimal = numeric Decimal equality, map = [{key, value}]."""
    import math
    from decimal import Decimal

    if e is None or v is None:
        return v is None and e is None
    if isinstance(v, bytes):
        return list(v) == e
    if isinstance(v, dt.datetime):
        head, _, frac = str(e).partition(".")
        micros = int((frac or "0").ljust(9, "0")[:9]) // 1000
        want = dt.datetime.strptime(head, "%Y-%m-%d %H:%M:%S").replace(
            microsecond=micros
        )
        return v == want
    if isinstance(v, dt.date):
        return v.isoformat() == e
    if isinstance(v, Decimal):
        return v == e if isinstance(e, Decimal) else v == Decimal(str(e))
    if isinstance(v, float):
        ef = float(e)
        if math.isnan(v) or math.isnan(ef):
            return math.isnan(v) and math.isnan(ef)
        return math.isclose(v, ef, rel_tol=1e-6, abs_tol=1e-12)
    if isinstance(v, dict):
        return (
            isinstance(e, dict)
            and set(v) == set(e)
            and all(_dump_norm(v[k], e[k]) for k in v)
        )
    if isinstance(v, list):
        if v and isinstance(v[0], tuple):  # map pairs
            return (
                isinstance(e, list)
                and len(v) == len(e)
                and all(
                    _dump_norm(k, x["key"]) and _dump_norm(val, x["value"])
                    for (k, val), x in zip(v, e)
                )
            )
        return (
            isinstance(e, list)
            and len(v) == len(e)
            and all(_dump_norm(x, y) for x, y in zip(v, e))
        )
    return v == e


@pytest.mark.parametrize(
    "fname,stripes", _DUMP_PARITY, ids=_ids(_DUMP_PARITY)
)
def test_corpus_vs_reference_expected_dumps(fname, stripes):
    """TestMatch.cc parity (SURVEY §5.4), via the NATIVE decoder: the
    reference re-dumps each golden and diffs against
    examples/expected/*.jsn.gz — this does the same with
    stream_decode instead of the reference reader, making the dumps a
    SECOND independent oracle beside pyarrow."""
    import gzip
    import json
    from decimal import Decimal

    path = os.path.join(EX, fname)
    meta = parse_tail_of_file(path)
    cols = [c["name"] for c in meta["columns"]]
    got = _decode(path, cols, stripes=stripes)
    n = len(got[cols[0]])
    dump = os.path.join(
        EX, "expected", fname.replace(".orc", ".jsn.gz")
    )
    compared = 0
    with gzip.open(dump, "rt") as fh:
        for i, line in enumerate(fh):
            if i >= n:
                break
            e = json.loads(line, parse_float=Decimal)
            for c in cols:
                assert _dump_norm(got[c][i], e.get(c)), (
                    fname, c, i, got[c][i], e.get(c),
                )
            compared += 1
    assert compared == n > 0


def test_lzo_corrupt_chunk_fails_loudly():
    """LZO twin of the LZ4 pin: a match distance beyond the decoded
    prefix raises (corrupt chunk), never wraps around."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        _lzo1x_decompress,
    )

    # first byte 18 = copy 1 literal (state 1); then the tiny-match
    # opcode with H=255 -> distance 1024 against 1 decoded byte
    with pytest.raises(ValueError, match="corrupt LZO"):
        _lzo1x_decompress(bytes([18, 65, 0x0C, 0xFF]))
