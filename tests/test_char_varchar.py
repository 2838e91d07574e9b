"""CHAR/VARCHAR semantics over ORC (reference `TypeDescription`
char/varchar with `maxLength`; `TestVectorOrcFile` pads/truncates):
Spark enforces the length contract at the catalog layer — CHAR(n)
read-back is space-padded, comparisons pad the literal, over-length
inserts raise — while the PHYSICAL ORC schema stores `string` (the
documented Spark mapping; true char/varchar-typed files from other
writers still read via the normal string path). These tests pin that
split so nobody "fixes" one half into inconsistency, plus the
footer_tail proto parse of `Type.maximumLength` (field 4), which
Spark-written files never populate."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def cv_table(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cv")
    spark.sql("DROP TABLE IF EXISTS cv_semantics")
    spark.sql(
        f"CREATE TABLE cv_semantics (c CHAR(5), v VARCHAR(5), tag STRING) "
        f"USING ORC LOCATION '{d}/cv'"
    )
    spark.sql(
        "INSERT INTO cv_semantics VALUES "
        "('ab', 'cd', 'short'), ('exact', 'exact', 'exact'), (NULL, NULL, 'null')"
    )
    yield str(d / "cv")
    spark.sql("DROP TABLE IF EXISTS cv_semantics")


def test_char_reads_back_space_padded(spark, cv_table):
    rows = {r["tag"]: r for r in spark.sql("SELECT * FROM cv_semantics").collect()}
    assert rows["short"]["c"] == "ab   "  # CHAR(5): padded to declared length
    assert rows["short"]["v"] == "cd"     # VARCHAR: stored as-is
    assert rows["exact"]["c"] == "exact"
    assert rows["null"]["c"] is None


def test_char_comparison_pads_the_literal(spark, cv_table):
    """Both the unpadded and padded literal must hit the same CHAR row
    — the reference's char comparison semantics (pad-to-length before
    compare), which Spark implements by padding the literal."""
    n1 = spark.sql("SELECT COUNT(*) n FROM cv_semantics WHERE c = 'ab'").collect()[0]["n"]
    n2 = spark.sql("SELECT COUNT(*) n FROM cv_semantics WHERE c = 'ab   '").collect()[0]["n"]
    assert n1 == n2 == 1


@pytest.mark.parametrize("col,val", [("c", "'toolong'"), ("v", "'toolong'")])
def test_over_length_insert_raises(spark, cv_table, col, val):
    other = "'x'" if col == "v" else "'x'"
    vals = f"({val}, {other}, 'o')" if col == "c" else f"({other}, {val}, 'o')"
    with pytest.raises(Exception, match="EXCEED_LIMIT_LENGTH"):
        spark.sql(f"INSERT INTO cv_semantics VALUES {vals}")


def test_varchar_trailing_spaces_are_trimmed_to_fit(spark, cv_table):
    """'abcd  ' is 6 chars but only trailing spaces exceed VARCHAR(5):
    the reference (and SQL standard) trims the excess padding rather
    than failing — pinned so the write path keeps that behavior."""
    spark.sql("INSERT INTO cv_semantics VALUES ('z', 'abcd  ', 'trim')")
    r = spark.sql("SELECT v FROM cv_semantics WHERE tag='trim'").collect()
    assert r[0]["v"] == "abcd "  # trimmed to the 5-char limit, data intact


def test_physical_orc_schema_is_string(spark, cv_table):
    """The ORC footer records plain `string` for both columns — the
    documented Spark mapping (length enforcement lives in the catalog,
    not the file), asserted via the pure-Python tail parser."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_tail_of_file,
    )

    part = [f for f in os.listdir(cv_table) if f.startswith("part")][0]
    meta = parse_tail_of_file(os.path.join(cv_table, part))
    kinds = {c["name"]: (c["kind"], c["max_length"]) for c in meta["columns"]}
    assert kinds["c"] == ("string", None)
    assert kinds["v"] == ("string", None)


def test_footer_tail_parses_type_maximum_length():
    """A true char/varchar-typed file (non-Spark writer) carries
    Type.maximumLength (orc_proto field 4) — synthesize the protobuf
    message and pin the parse, since no in-container writer emits it."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import _parse_type

    def varint(n: int) -> bytes:
        out = b""
        while True:
            b7, n = n & 0x7F, n >> 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    # Type { kind=17 (char), maximumLength=5 }  fields: 1 varint, 4 varint
    msg = bytes([1 << 3 | 0]) + varint(17) + bytes([4 << 3 | 0]) + varint(5)
    t = _parse_type(msg)
    assert t["kind"] == 17 and t["maximumLength"] == 5
    # varchar(42)
    msg = bytes([1 << 3 | 0]) + varint(16) + bytes([4 << 3 | 0]) + varint(42)
    t = _parse_type(msg)
    assert t["kind"] == 16 and t["maximumLength"] == 42
