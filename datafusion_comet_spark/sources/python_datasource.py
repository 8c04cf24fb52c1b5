"""Custom connector via the PySpark 4 Python DataSource API.

The reference's extension point for new inputs is a native scan operator
compiled into the engine (reference: native/proto/src/proto/operator.proto:38-56
scan oneof; native/core/src/execution/operators/{scan,csv_scan}.rs) — adding a
format means Rust + serde + shims.  The PySpark-native equivalent is the
``pyspark.sql.datasource`` API: declare a schema, plan ``InputPartition``s,
and yield rows per partition; Spark distributes one reader per partition and
everything downstream (pushdown-eligible filters, AQE, codegen) applies as
with any DSv2 source.

The source here generates a deterministic synthetic event stream from a pure
function of the row id — no state, no I/O — so each partition reads
independently (the 100 TB posture: partition planning is metadata-only and
readers never coordinate), and any engine can recompute the same rows (the
DuckDB oracle regenerates them with ``generate_series``).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

SCHEMA_DDL = "id BIGINT, user_id BIGINT, kind STRING, points BIGINT"

KINDS = ("view", "click", "purchase")

# Knuth multiplicative constant: cheap deterministic scatter of the row id.
_MIX = 2654435761


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 8))

    def partitions(self):
        # Metadata-only planning: contiguous id slices, one per partition.
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_Slice(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            h = (i * _MIX) % (1 << 32)
            yield (i, h % 97, KINDS[h % 3], h % 1000)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — deterministic rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# DuckDB rebuild of read(): the same pure function over generate_series.
ORACLE_GENERATOR_SQL = """
SELECT i AS id,
       (i * 2654435761) % 4294967296 % 97 AS user_id,
       ['view', 'click', 'purchase'][CAST((i * 2654435761) % 4294967296 % 3 AS INT) + 1] AS kind,
       (i * 2654435761) % 4294967296 % 1000 AS points
FROM (SELECT unnest(generate_series(0, {max_id})) AS i)
"""
