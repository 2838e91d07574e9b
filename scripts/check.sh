#!/usr/bin/env bash
# Full local gate, mirroring what the round driver does:
#   1. pytest (oracle compare at sf0.001 by default)
#   2. driver-sim: vanilla session + all queries vs DuckDB at sf0.01
#   3. bench at sf0.1 (one JSON line)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== driver-sim (sf0.01) =="
cd /tmp && python - <<'EOF'
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    c = lambda v: "NULL" if v is None else (repr(v) if isinstance(v, float) else str(v))
    return sorted(tuple(c(r[i]) for i in idx) for r in rows)
qs, osql = e.queries(), e.oracle_sql()
assert len(e.entry(spark).collect()) > 0
bad = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, "/root/testdata/sf0.01"); srows = [tuple(r) for r in sdf.collect()]
    if name not in osql: continue
    rel = con.sql(osql[name])
    if not (sorted(sdf.columns) == sorted(rel.columns)
            and norm(sdf.columns, srows) == norm(rel.columns, rel.fetchall())):
        bad.append(name)
print("driver-sim FAILED:", bad or "none")
assert not bad
EOF

echo "== bench (sf0.1) =="
cd /root/repo && python bench.py 2>/dev/null | tail -1
