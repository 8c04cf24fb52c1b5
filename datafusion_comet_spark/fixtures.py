"""Fixture tables from FIXTURES.md — edge-case inputs for semantics tests.

Deterministic (seed 42) pyarrow-generated parquet mirroring the
reference's test-data generators: all-primitive-types files
(reference: spark/src/test/scala/org/apache/spark/sql/CometTestBase.scala:691-756),
nested complex types (CometTestBase.scala:957,
comet/testing/FuzzDataGenerator.scala:50-153) and the aggregation
edge-case table from the SQL-file corpus
(spark/src/test/resources/sql-tests/expressions/aggregate/sum.sql).

Written once per machine to a scratch dir (never into the read-only
driver testdata); both Spark and DuckDB can read the same files, so
differential tests compare engines on identical bytes.
"""

from __future__ import annotations

import math
import os
import random
import tempfile
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_PRIM = 2000
N_AGG = 1000

_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)


def fixtures_dir() -> str:
    return os.path.join(tempfile.gettempdir(), "dcs_fixtures")


def _write(name: str, table: pa.Table) -> str:
    os.makedirs(fixtures_dir(), exist_ok=True)
    path = os.path.join(fixtures_dir(), f"{name}.parquet")
    if not os.path.exists(path):
        pq.write_table(table, path)
    return path


def all_primitives() -> str:
    """One column per supported scalar type, ~50% NULLs, plus
    adversarial rows: int bounds, -0.0, NaN, ±Inf, '' strings,
    full-precision decimals, epoch-boundary timestamps."""
    rng = random.Random(SEED)

    def null_or(i, v):
        return None if rng.random() < 0.5 else v

    rows = list(range(N_PRIM))
    c_bool = [null_or(i, i % 2 == 0) for i in rows]
    c_i8 = [null_or(i, (i % 256) - 128) for i in rows]
    c_i16 = [null_or(i, (i * 7) % 32768 - 16384) for i in rows]
    c_i32 = [null_or(i, i * 1_000_003 - 1_000_000_000) for i in rows]
    c_i64 = [null_or(i, i * 4_611_686_018_427_387) for i in rows]
    c_f64 = [null_or(i, i * 1.5 - 1000.0) for i in rows]
    c_str = [null_or(i, str(i % 4) * 3) for i in rows]
    c_dec = [null_or(i, Decimal(i).scaleb(-2)) for i in rows]
    c_ts = [null_or(i, _EPOCH + timedelta(seconds=i)) for i in rows]
    c_date = [null_or(i, date(2020, 1, 1) + timedelta(days=i % 4000)) for i in rows]

    # adversarial tail (never NULL so every edge is guaranteed present)
    edges = [
        (True, -128, -32768, -(2**31), -(2**63), float("nan"), "", Decimal("0.01"), _EPOCH, date(1970, 1, 1)),
        (False, 127, 32767, 2**31 - 1, 2**63 - 1, float("inf"), " 5 ", Decimal("99999999999999.99"), datetime(1969, 12, 31, 23, 59, 59, tzinfo=timezone.utc), date(9999, 12, 31)),
        (True, 0, 0, 0, 0, float("-inf"), "abc", Decimal("-0.01"), _EPOCH, date(2038, 1, 19)),
        (False, 1, 1, 1, 1, -0.0, "42", Decimal("0.00"), _EPOCH, date(1900, 1, 1)),
        (True, -1, -1, -1, -1, 0.0, "-7", Decimal("1.00"), _EPOCH, date(2020, 2, 29)),
    ]
    for b, i8, i16, i32, i64, f, s, dec, ts, d in edges:
        c_bool.append(b); c_i8.append(i8); c_i16.append(i16)
        c_i32.append(i32); c_i64.append(i64); c_f64.append(f)
        c_str.append(s); c_dec.append(dec); c_ts.append(ts); c_date.append(d)
    n = len(c_bool)

    table = pa.table(
        {
            "id": pa.array(range(n), pa.int32()),
            "c_bool": pa.array(c_bool, pa.bool_()),
            "c_i8": pa.array(c_i8, pa.int8()),
            "c_i16": pa.array(c_i16, pa.int16()),
            "c_i32": pa.array(c_i32, pa.int32()),
            "c_i64": pa.array(c_i64, pa.int64()),
            "c_f32": pa.array([None if v is None else float(v) for v in c_f64], pa.float32()),
            "c_f64": pa.array(c_f64, pa.float64()),
            "c_str": pa.array(c_str, pa.string()),
            "c_bin": pa.array(
                [None if s is None else s.encode() for s in c_str], pa.binary()
            ),
            "c_dec_16_2": pa.array(c_dec, pa.decimal128(16, 2)),
            "c_ts": pa.array(c_ts, pa.timestamp("us", tz="UTC")),
            "c_date": pa.array(c_date, pa.date32()),
            "c_null": pa.array([None] * n, pa.string()),
        }
    )
    return _write("all_primitives", table)


def nested() -> str:
    """Arrays/maps/structs with NULL elements, empty and NULL
    containers, plus a JSON string column with 10% malformed."""
    rng = random.Random(SEED + 1)
    n = 1000

    def arr(i):
        if i % 11 == 0:
            return None
        k = i % 6
        return [None if (i + j) % 7 == 0 else i + j for j in range(k)]

    def mp(i):
        if i % 13 == 0:
            return None
        return [(j, f"v{i+j}") for j in range(i % 5)]

    def js(i):
        if i % 10 == 0:
            return None
        if i % 10 == 1:
            return '{"a": 1, "b": [}'  # malformed
        return f'{{"a": {i}, "b": [{i % 5}, {i % 7}], "c": {{"d": "x{i % 3}"}}}}'

    table = pa.table(
        {
            "id": pa.array(range(n), pa.int32()),
            "arr_i": pa.array([arr(i) for i in range(n)], pa.list_(pa.int32())),
            "arr_str": pa.array(
                [None if arr(i) is None else [str(x) if x is not None else None for x in arr(i)] for i in range(n)],
                pa.list_(pa.string()),
            ),
            "m_is": pa.array([mp(i) for i in range(n)], pa.map_(pa.int32(), pa.string())),
            "s": pa.array(
                [
                    None
                    if i % 17 == 0
                    else {"a": i, "b": str(i % 3), "c": i * 0.5}
                    for i in range(n)
                ],
                pa.struct([("a", pa.int32()), ("b", pa.string()), ("c", pa.float64())]),
            ),
            "json_str": pa.array([js(i) for i in range(n)], pa.string()),
        }
    )
    return _write("nested", table)


def agg_edge() -> str:
    """Aggregation edge cases: NULL-only group, single-row group,
    int/long MAX rows, ±Infinity/NaN doubles, near-overflow decimals,
    booleans, timestamps for ordered first/last."""
    rng = random.Random(SEED + 2)
    rows = []
    # regular groups
    for g in ("a", "b", "c"):
        for i in range(N_AGG // 4):
            rows.append(
                (g, i, i * 10, float(i), i * 1.5, Decimal(i).scaleb(-2), i % 3 == 0,
                 _EPOCH + timedelta(minutes=i))
            )
    # NULL-only group
    for _ in range(5):
        rows.append(("only_nulls", None, None, None, None, None, None, None))
    # single-row group
    rows.append(("singleton", 7, 7, 7.0, 7.0, Decimal("7.00"), True, _EPOCH))
    # overflow / non-finite edges in group 'edge'
    rows.append(("edge", 2**31 - 1, 2**63 - 1, float("inf"), float("inf"), Decimal("999999999999.99"), False, _EPOCH))
    rows.append(("edge", 2**31 - 1, 2**63 - 1, float("-inf"), float("nan"), Decimal("999999999999.99"), True, _EPOCH + timedelta(days=1)))
    cols = list(zip(*rows))
    table = pa.table(
        {
            "grp": pa.array(cols[0], pa.string()),
            "i": pa.array(cols[1], pa.int32()),
            "l": pa.array(cols[2], pa.int64()),
            "f": pa.array(cols[3], pa.float32()),
            "d": pa.array(cols[4], pa.float64()),
            "dec": pa.array(cols[5], pa.decimal128(14, 2)),
            "b": pa.array(cols[6], pa.bool_()),
            "ts": pa.array(cols[7], pa.timestamp("us", tz="UTC")),
        }
    )
    return _write("agg_edge", table)
