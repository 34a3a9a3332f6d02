"""Dump ``.explain("formatted")`` for registry keys to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <key> [key ...]

Writes ``<outdir>/<key>_<suffix>.txt`` for each key — the optimization
rounds' committed plan evidence (plans/r12/<query>_before.txt /
..._after.txt). Uses SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
so the plans match the bench inputs. Memo keys (``_memo_*``) resolve
through queries.memo_builders().
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sarfile_analyzer_ng_spark.queries import REGISTRY, memo_builders
from sarfile_analyzer_ng_spark.session import get_spark


def main() -> None:
    outdir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    memos = memo_builders()
    for key in keys:
        fn = memos[key] if key in memos else REGISTRY[key][0]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
