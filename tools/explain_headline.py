#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to a directory.

Usage: python tools/explain_headline.py OUTDIR [name ...]

With no names, dumps every bench.HEADLINE entry except the stream_* rows
(whose returned relation is a post-run local table — the interesting work
happens inside the streaming engine, not in the returned plan).  Building
a query's DataFrame may run its one-time fixture builds (cached in /tmp),
but no timed action is taken here.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from hadrodb_spark.queries import QUERIES  # noqa: E402
from hadrodb_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or [n for n in HEADLINE if not n.startswith("stream_")]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hadrodb_spark_explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going: one bad row != no plans
            text = f"ERROR building {name}: {exc}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
