"""S13 recovery job: salvage readable files from a directory with a
torn member; recovered dir reads cleanly WITHOUT ignoreCorruptFiles."""

from __future__ import annotations

import os

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import (
    read_orc,
    recover_orc_dir,
    write_orc,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_recover_orc_dir(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "recovered")
    n = load_table(spark, sf_dir, "nation")
    write_orc(n, src)
    with open(os.path.join(src, "part-torn.orc"), "wb") as fh:
        fh.write(b"ORC\x01garbage" * 100)
    result = recover_orc_dir(spark, src, dest)
    assert result["skipped_corrupt"] == 1
    assert result["recovered"] >= 1
    assert read_orc(spark, dest).count() == n.count()
