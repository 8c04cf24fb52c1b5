"""Differential test harness: Spark result vs DuckDB oracle.

Rebuild of the reference's checkSparkAnswer methodology (reference:
spark/src/test/scala/org/apache/spark/sql/CometTestBase.scala:159-345)
with DuckDB standing in for vanilla Spark as the oracle, mirroring the
driver's own verify loop: row count + column names + order-insensitive
value comparison, floats with tolerance, NaN/-0.0 canonicalized.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from datetime import date, datetime
from decimal import Decimal
from typing import Any

import duckdb

from .catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the star-schema tables registered as views
    (the same registration the driver performs)."""
    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v: Any, float_round: int = 6) -> Any:
    """Canonicalize a single value for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return round(v, float_round)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x, float_round) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x, float_round)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_canonical(
    rows: list[tuple], col_names: list[str], float_round: int
) -> list[tuple]:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_canon(r[i], float_round) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare_to_oracle(
    spark_df,
    oracle_sql: str,
    sf_dir: str,
    float_round: int = 6,
) -> None:
    """Assert the Spark DataFrame matches the DuckDB oracle result.

    Column-name sets must match (driver sorts columns by name before
    hashing); rows are compared as canonicalized sorted multisets.
    """
    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        con.close()

    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    spark_rows = [tuple(r) for r in spark_df.collect()]
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    a = _rows_to_canonical(spark_rows, spark_cols, float_round)
    b = _rows_to_canonical(oracle_rows, oracle_cols, float_round)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, (
        f"{len(mismatches)}/{len(a)} rows differ; first 5: {mismatches[:5]}"
    )


def lineitem_bytes(sf_dir: str) -> int:
    """On-disk size of the lineitem table (file or directory-shaped)."""
    p = table_path(sf_dir, "lineitem")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    return os.path.getsize(p)


# Exact plan expectations are pinned for TWO regime windows; beyond
# them the broadcast-flip LADDER continues (each scale decade pushes
# more pruned-size estimates over the threshold — measured at
# gen_scale_data sf2, where q4/q11/q18/q20 and the EXISTS family flip
# next; SCALE.md round-9 ladder note) and exact pins would need a
# golden set per rung.  Plan suites SKIP outside the pinned windows
# rather than pretend one flip set fits every scale.
PINNED_LARGE_MAX_BYTES = 200 << 20


def scale_regime(sf_dir: str, threshold_bytes: int = 32 << 20) -> bool:
    """True when lineitem's on-disk size exceeds the static broadcast
    threshold (session.py pins 32 MB), i.e. the dataset is in the
    LARGE plan regime where Catalyst correctly flips the joins whose
    pruned-size estimate crosses the threshold from broadcast to
    shuffle.  Plan tests key their expectations on this bit so both
    regimes are asserted (small: driver testdata <= sf0.1; large:
    dev/gen_scale_data.py sf1, where the flips were measured).
    """
    return lineitem_bytes(sf_dir) > threshold_bytes


def beyond_pinned_regime(sf_dir: str) -> bool:
    """True when the dataset is past BOTH pinned plan-regime windows
    (lineitem > PINNED_LARGE_MAX_BYTES) — exact plan tests should skip
    with a pointer at the regime ladder instead of failing on the
    next legitimate flip rung."""
    return lineitem_bytes(sf_dir) > PINNED_LARGE_MAX_BYTES


@contextmanager
def asymptotic_mode(spark, sf_dir: str):
    """The 100 TB plan regime, forced at test scale: disable the
    size-estimate broadcast path (autoBroadcastJoinThreshold = -1) and
    forge every SCALING table's on-disk byte count to 1 TB so the
    size-gated hint helpers (_dim_hint / _stats_join_back) withhold
    their hints.  What remains broadcast under this mode is exactly
    what stays broadcast at any scale: the fixed-cardinality dims
    (region/nation) and explicit hints on provably bounded sides
    (scalar thresholds, literal spines, |langs|-row cutoffs).

    This is the LADDER'S ENDPOINT — the regime past
    beyond_pinned_regime's window where every scaling join is a
    shuffle join and the plan is scale-stable again.  The broadcast
    flips between the pinned windows are the transition band; plans
    captured under this mode are the asymptotic contract
    (tests/test_asymptotic_regime.py pins them as *.asymptotic.txt
    goldens).  AQE may still locally re-broadcast a small runtime
    stage at execution; the static plan pinned here is the strategy
    Catalyst commits to before those runtime stats exist.
    """
    from .catalog import (
        _TABLE_BYTES_CACHE,
        _TABLE_ROW_GROUPS_CACHE,
        FIXED_SIZE_DIMS,
        TABLES,
    )

    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    scaling = [t for t in TABLES if t not in FIXED_SIZE_DIMS]
    saved_bytes = {
        t: _TABLE_BYTES_CACHE.get((sf_dir, t)) for t in scaling
    }
    saved_rgs = {
        t: _TABLE_ROW_GROUPS_CACHE.get((sf_dir, t)) for t in scaling
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        for t in scaling:
            _TABLE_BYTES_CACHE[(sf_dir, t)] = 1 << 40
            # 100 TB layouts carry far more row groups than any cluster
            # has cores, so the scan-starvation rebalance (_spread_scan)
            # must be a no-op in the asymptotic plans
            _TABLE_ROW_GROUPS_CACHE[(sf_dir, t)] = 1 << 20
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_threshold)
        for t, v in saved_bytes.items():
            if v is None:
                _TABLE_BYTES_CACHE.pop((sf_dir, t), None)
            else:
                _TABLE_BYTES_CACHE[(sf_dir, t)] = v
        for t, v in saved_rgs.items():
            if v is None:
                _TABLE_ROW_GROUPS_CACHE.pop((sf_dir, t), None)
            else:
                _TABLE_ROW_GROUPS_CACHE[(sf_dir, t)] = v
