"""Expression compatibility layer.

The reference declares its expression surface in serde dispatch tables
(reference: spark/src/main/scala/org/apache/comet/serde/QueryPlanSerde.scala:51-294
``exprSerdeMap``/``aggrSerdeMap``) with Spark-semantics native kernels in
native/spark-expr/src/.  In a PySpark-native engine the kernels ARE
Spark's own, so this layer is a *declared, executable registry*: every
reference expression name maps to the pyspark.sql.functions realization,
and the test suite evaluates each one (the rebuild of the generated
support matrix docs/source/user-guide/latest/expressions.md).

See ``registry.py`` for the table and ``evalmodes.py`` for
LEGACY / TRY / ANSI arithmetic (reference: expr.proto:270-281).
"""

from .registry import EXPRESSIONS, Expr, entries_of_kind  # noqa: F401
from .evalmodes import EvalMode, arith  # noqa: F401
