"""Source-compiles gate (round-11 ADVICE high / round-12 verdict Next
#4): every committed Python file must at least PARSE. Round 11 shipped
`scripts/sf1_stress.py` with a SyntaxError because nothing in the
battery ever imported it — this test byte-compiles every .py under the
package, `scripts/`, `tests/`, plus the two repo-root entry points, so
that failure class cannot reach a commit again."""

from __future__ import annotations

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _py_files() -> list[str]:
    out = [
        os.path.join(REPO, "bench.py"),
        os.path.join(REPO, "__spark_entry__.py"),
    ]
    for root in ("orc_release_hdp_2_6_5_99_1_tag_spark", "scripts", "tests"):
        for dirpath, dirnames, filenames in os.walk(os.path.join(REPO, root)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            out.extend(
                os.path.join(dirpath, f)
                for f in filenames
                if f.endswith(".py")
            )
    return sorted(out)


@pytest.mark.parametrize(
    "path", _py_files(), ids=lambda p: os.path.relpath(p, REPO)
)
def test_source_compiles(path):
    # a pure in-memory parse+compile: a SyntaxError carries the
    # offending file:line, and nothing touches __pycache__
    with open(path, "rb") as fh:
        compile(fh.read(), path, "exec")
