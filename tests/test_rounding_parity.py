"""Property test for the cross-engine rounding contract: for ANY
double, Spark's `util.rnd` must equal the oracle-side
varchar→DECIMAL(38,8)→round chain in DuckDB — including the
adversarial case of values sitting exactly on a rounding half-boundary
(where plain round() provably diverges between the engines)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from sarfile_analyzer_ng_spark.util import rnd, sql_rnd


def _values() -> list[float]:
    rng = np.random.default_rng(42)
    vals = list(rng.uniform(-1e6, 1e6, 2000))
    vals += list(rng.uniform(-1, 1, 2000))
    # stay inside the contract's domain (util.RND_PARITY_MAX_SCALED):
    # |v|·10^4 < 2^53 → |v| < ~9e11
    vals += list(rng.uniform(-8e11, 8e11, 500))
    # adversarial: exact 5-decimal halves (38.37875-style), the case
    # that flipped q06 before the varchar-decimal fix
    vals += [round(x, 5) + 0.00005 for x in rng.uniform(-1000, 1000, 2000)]
    # sums of 2-decimal money (exact decimals at large magnitude)
    vals += [round(x, 2) for x in rng.uniform(1e7, 1e9, 500)]
    return [float(v) for v in vals]


def test_rnd_matches_duckdb_round_chain(spark):
    vals = _values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    from pyspark.sql import functions as F

    got = {
        r["i"]: (r["r4"], r["r2"])
        for r in sdf.select("i", rnd(F.col("x"), 4).alias("r4"),
                            rnd(F.col("x"), 2).alias("r2")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(vals)), "x": vals}))
    expected = con.execute(
        f"SELECT i, {sql_rnd('x', 4)} AS r4, {sql_rnd('x', 2)} AS r2 FROM t"
    ).fetchall()
    mismatches = [
        (i, got[i], (r4, r2)) for i, r4, r2 in expected if got[i] != (r4, r2)
    ]
    assert not mismatches, mismatches[:5]
