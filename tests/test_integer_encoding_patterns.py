"""Integer-encoding pattern round-trips — the reference's
`TestNewIntegerEncoding.java` corpus: value sequences engineered to
drive each RLEv2 sub-encoding (SHORT_REPEAT, DIRECT, PATCHED_BASE,
DELTA, `RunLengthIntegerWriterV2.java`) must survive ORC write→read
bit-exactly through the embedded writer/reader, across int widths and
sign regimes. The engine treats the encoder as the reference's own
(Spark embeds the ORC Java library) — these tests pin END-TO-END value
identity per hazard pattern plus the compression-size sanity that
proves the run-length modes actually engage.
"""

from __future__ import annotations

import glob
import os

import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

# (name, generator over row index) — each targets an RLEv2 submode /
# hazard from TestNewIntegerEncoding.java
_PATTERNS = {
    # SHORT_REPEAT: long constant runs
    "constant_runs": lambda i: 42 if (i // 100) % 2 == 0 else -7,
    # DELTA: monotonic arithmetic sequence (fixed delta)
    "arith_sequence": lambda i: 1000 + 3 * i,
    # DELTA with negative delta
    "descending": lambda i: 10_000_000 - 7 * i,
    # PATCHED_BASE: mostly-small values with sparse huge outliers
    "patched_outliers": lambda i: 2_000_000_000_000 if i % 511 == 0 else i % 64,
    # DIRECT: pseudo-random full-width values
    "pseudo_random": lambda i: (i * 2_654_435_761) % (1 << 40) - (1 << 39),
    # sign flip-flop around zero (zigzag encoding hazard)
    "zigzag": lambda i: (i % 7 - 3) * (1 if i % 2 else -1),
    # int64 extremes sprinkled into small values
    "extremes": lambda i: {0: -(1 << 62), 1: (1 << 62) - 1}.get(i % 997, i % 10),
}

_N = 5000


@pytest.mark.parametrize("name", sorted(_PATTERNS))
def test_rlev2_pattern_roundtrip(spark, tmp_path, name):
    gen = _PATTERNS[name]
    vals = [gen(i) for i in range(_N)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i bigint, v bigint")
    path = str(tmp_path / name)
    write_orc(df.coalesce(1), path)
    got = {
        r["i"]: r["v"] for r in read_orc(spark, path).collect()
    }
    assert len(got) == _N
    bad = [(i, got[i], vals[i]) for i in range(_N) if got[i] != vals[i]]
    assert not bad, f"{name}: {len(bad)} mismatches, first {bad[:3]}"


def _orc_bytes(path: str) -> int:
    return sum(os.path.getsize(f) for f in glob.glob(f"{path}/*.orc"))


def test_run_length_modes_actually_compress(spark, tmp_path):
    """Size sanity proving the encodings engage: the constant-run and
    arithmetic-delta columns must encode FAR smaller than the
    pseudo-random column of equal row count (RLEv2 SHORT_REPEAT/DELTA
    vs DIRECT) — if the writer fell back to raw 8-byte literals
    everywhere, all three would be the same size."""
    sizes = {}
    for name in ("constant_runs", "arith_sequence", "pseudo_random"):
        gen = _PATTERNS[name]
        df = spark.createDataFrame(
            [(gen(i),) for i in range(50_000)], "v bigint"
        )
        path = str(tmp_path / f"sz_{name}")
        write_orc(df.coalesce(1), path, compression="none")
        sizes[name] = _orc_bytes(path)
    assert sizes["constant_runs"] * 10 < sizes["pseudo_random"], sizes
    assert sizes["arith_sequence"] * 10 < sizes["pseudo_random"], sizes
