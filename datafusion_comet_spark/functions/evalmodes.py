"""Arithmetic eval modes — LEGACY / TRY / ANSI.

The reference threads an eval_mode through every arithmetic and cast
expression (reference: native/proto/src/proto/expr.proto:270-281;
serde/arithmetic.scala:88-359).  Spark exposes the same three modes:
LEGACY is default expression behavior, TRY maps to the ``try_*``
function family, ANSI is the session flag ``spark.sql.ansi.enabled``.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class EvalMode(str, Enum):
    LEGACY = "legacy"
    TRY = "try"
    ANSI = "ansi"  # session-scoped: spark.sql.ansi.enabled=true


_TRY_FNS = {
    "add": F.try_add,
    "subtract": F.try_subtract,
    "multiply": F.try_multiply,
    "divide": F.try_divide,
}

_LEGACY_FNS = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
}


def arith(op: str, a: Column, b: Column, mode: EvalMode = EvalMode.LEGACY) -> Column:
    """Binary arithmetic under an explicit eval mode.

    ANSI mode is not per-expression in Spark; callers run under a
    session with ``spark.sql.ansi.enabled=true`` and use the LEGACY
    column expression (which then throws on overflow, matching the
    reference's ANSI kernels, checked_arithmetic.rs).
    """
    table = _TRY_FNS if mode == EvalMode.TRY else _LEGACY_FNS
    if op not in table:
        raise ValueError(f"unsupported arithmetic op {op!r}")
    return table[op](a, b)
