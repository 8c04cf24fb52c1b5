"""Catalog: the test star schema as DataFrames / temp views.

The reference's scan layer (NativeScan / CsvScan / IcebergScan,
reference: native/proto/src/proto/operator.proto:99-151) reduces in a
single-engine build to ``spark.read`` with pushdown enabled; this
module is the table registry used by every query in the inventory.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that stay small at every scale factor (region/nation
# are fixed-cardinality in TPC-H); always broadcast-join these.
FIXED_SIZE_DIMS: frozenset[str] = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> SimpleNamespace:
    """Load every star-schema table; optionally register temp views so
    SQL-form queries can run against the same data.

    Returns a namespace: ``t = load_tables(...); t.lineitem`` etc.
    """
    out = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return SimpleNamespace(**out)
