"""Executable expression registry — reference serde tables re-expressed.

Each entry: reference expression name (as it appears in the serde
dispatch maps, reference: serde/QueryPlanSerde.scala:51-294 and the
handler files serde/{predicates,arithmetic,math,strings,datetime,hash,
bitwise,arrays,maps,structs,aggregates}.scala) -> a builder producing a
PySpark Column over the canonical test fixture columns:

    b   boolean        i, j  int (j != 0)     l  long
    f   float          dbl   double           dec decimal(10,2)
    s   string         s2    string
    d   date           ts    timestamp
    arr array<int>     arr2  array<int>       sarr array<string>
    m   map<string,int>                       st  struct<a:int,b:string>
    js  json string    csvs  csv string       bin binary

Kinds: "scalar" (plain select), "agg" (needs groupBy().agg()),
"window" (needs .over(partitionBy/orderBy window)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

c = F.col


@dataclass(frozen=True)
class Expr:
    name: str  # reference expression class name
    kind: str  # scalar | agg | window
    build: Callable[[], Column]
    ref: str = ""  # reference file:line of the serde handler


def _e(reg, name, kind, build, ref=""):
    assert name not in reg, name
    reg[name] = Expr(name, kind, build, ref)


EXPRESSIONS: dict[str, Expr] = {}

# --- predicates & conditionals (serde/predicates.scala:31-244,
# serde/conditional.scala:29-131) --------------------------------------
for name, kind, build, ref in [
    ("And", "scalar", lambda: (c("b") & (c("i") > 0)).alias("v"), "serde/predicates.scala:31"),
    ("Or", "scalar", lambda: (c("b") | (c("i") > 0)).alias("v"), "serde/predicates.scala"),
    ("Not", "scalar", lambda: (~c("b")).alias("v"), "serde/predicates.scala"),
    ("EqualTo", "scalar", lambda: (c("i") == c("j")).alias("v"), "serde/predicates.scala"),
    ("EqualNullSafe", "scalar", lambda: c("i").eqNullSafe(c("j")).alias("v"), "serde/predicates.scala"),
    ("GreaterThan", "scalar", lambda: (c("i") > c("j")).alias("v"), "serde/predicates.scala"),
    ("GreaterThanOrEqual", "scalar", lambda: (c("i") >= c("j")).alias("v"), "serde/predicates.scala"),
    ("LessThan", "scalar", lambda: (c("i") < c("j")).alias("v"), "serde/predicates.scala"),
    ("LessThanOrEqual", "scalar", lambda: (c("i") <= c("j")).alias("v"), "serde/predicates.scala"),
    ("In", "scalar", lambda: c("i").isin(1, 2, 3).alias("v"), "serde/predicates.scala"),
    ("InSet", "scalar", lambda: c("i").isin(list(range(20))).alias("v"), "serde/predicates.scala"),
    ("IsNull", "scalar", lambda: c("i").isNull().alias("v"), "serde/predicates.scala"),
    ("IsNotNull", "scalar", lambda: c("i").isNotNull().alias("v"), "serde/predicates.scala"),
    ("IsNaN", "scalar", lambda: F.isnan(c("dbl")).alias("v"), "serde/predicates.scala"),
    ("CaseWhen", "scalar", lambda: F.when(c("i") > 0, "pos").when(c("i") < 0, "neg").otherwise("zero").alias("v"), "serde/conditional.scala:29"),
    ("If", "scalar", lambda: F.expr("if(i > 0, s, s2)").alias("v"), "serde/conditional.scala"),
    ("Coalesce", "scalar", lambda: F.coalesce(c("i"), c("j"), F.lit(0)).alias("v"), "serde/conditional.scala"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- arithmetic with eval modes (serde/arithmetic.scala:88-359;
# native math_funcs/{checked_arithmetic,div,modulo_expr}.rs) -----------
for name, kind, build, ref in [
    ("Add", "scalar", lambda: (c("i") + c("j")).alias("v"), "serde/arithmetic.scala:88"),
    ("Subtract", "scalar", lambda: (c("i") - c("j")).alias("v"), "serde/arithmetic.scala"),
    ("Multiply", "scalar", lambda: (c("i") * c("j")).alias("v"), "serde/arithmetic.scala"),
    ("Divide", "scalar", lambda: (c("dec") / c("j")).alias("v"), "serde/arithmetic.scala"),
    ("IntegralDivide", "scalar", lambda: F.expr("i div j").alias("v"), "serde/arithmetic.scala"),
    ("Remainder", "scalar", lambda: (c("i") % c("j")).alias("v"), "native/spark-expr/src/math_funcs/modulo_expr.rs"),
    ("Round", "scalar", lambda: F.round(c("dbl"), 2).alias("v"), "serde/arithmetic.scala"),
    ("BRound", "scalar", lambda: F.bround(c("dbl"), 2).alias("v"), "docs expressions.md:134"),
    ("UnaryMinus", "scalar", lambda: (-c("i")).alias("v"), "serde/arithmetic.scala"),
    ("TryAdd", "scalar", lambda: F.try_add(c("i"), c("j")).alias("v"), "expr.proto:276-281 eval_mode=TRY"),
    ("TrySubtract", "scalar", lambda: F.try_subtract(c("i"), c("j")).alias("v"), "expr.proto:276-281"),
    ("TryMultiply", "scalar", lambda: F.try_multiply(c("i"), c("j")).alias("v"), "expr.proto:276-281"),
    ("TryDivide", "scalar", lambda: F.try_divide(c("i"), c("j")).alias("v"), "expr.proto:276-281"),
    ("Abs", "scalar", lambda: F.abs(c("i")).alias("v"), "comet_scalar_funcs.rs abs"),
    ("CheckOverflow", "scalar", lambda: (c("dec") * c("dec")).cast("decimal(20,4)").alias("v"), "serde/decimalExpressions.scala:27"),
    ("UnscaledValue", "scalar", lambda: (c("dec") * 100).cast("long").alias("v"), "serde/decimalExpressions.scala"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- math (QueryPlanSerde.scala:94-138; serde/math.scala:28-244) ------
_MATH = {
    "Acos": lambda: F.acos(c("b").cast("double")),
    "Acosh": lambda: F.acosh(c("i").cast("double") + 2),
    "Asin": lambda: F.asin(c("b").cast("double")),
    "Asinh": lambda: F.asinh(c("dbl")),
    "Atan": lambda: F.atan(c("dbl")),
    "Atanh": lambda: F.atanh(c("b").cast("double") * 0.5),
    "Atan2": lambda: F.atan2(c("dbl"), c("f")),
    "Cbrt": lambda: F.cbrt(c("dbl")),
    "Ceil": lambda: F.ceil(c("dbl")),
    "Cos": lambda: F.cos(c("dbl")),
    "Cosh": lambda: F.cosh(c("dbl")),
    "Cot": lambda: F.cot(c("dbl") + 1),
    "Exp": lambda: F.exp(c("dbl")),
    "Expm1": lambda: F.expm1(c("dbl")),
    "Floor": lambda: F.floor(c("dbl")),
    "Hex": lambda: F.hex(c("l")),
    "Unhex": lambda: F.unhex(F.hex(c("l"))),
    "Log": lambda: F.log(c("dbl") + 10),
    "Log2": lambda: F.log2(c("dbl") + 10),
    "Log10": lambda: F.log10(c("dbl") + 10),
    "Logarithm": lambda: F.log(2.0, c("dbl") + 10),
    "Pi": lambda: F.pi(),
    "Pow": lambda: F.pow(c("dbl"), 2),
    "Signum": lambda: F.signum(c("dbl")),
    "Sin": lambda: F.sin(c("dbl")),
    "Sinh": lambda: F.sinh(c("dbl")),
    "Sqrt": lambda: F.sqrt(F.abs(c("dbl"))),
    "Tan": lambda: F.tan(c("dbl")),
    "Tanh": lambda: F.tanh(c("dbl")),
    "ToDegrees": lambda: F.degrees(c("dbl")),
    "ToRadians": lambda: F.radians(c("dbl")),
    "Bin": lambda: F.bin(c("l")),
}
for name, b in _MATH.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/math.scala:28-244")

# --- strings (serde/strings.scala:34-482) -----------------------------
_STR = {
    "Ascii": lambda: F.ascii(c("s")),
    "BitLength": lambda: F.bit_length(c("s")),
    "Chr": lambda: F.chr(c("i") % 26 + 65),
    "Concat": lambda: F.concat(c("s"), c("s2")),
    "ConcatWs": lambda: F.concat_ws("-", c("s"), c("s2")),
    "Contains": lambda: c("s").contains("a"),
    "EndsWith": lambda: F.endswith(c("s"), F.lit("x")),
    "StartsWith": lambda: F.startswith(c("s"), F.lit("H")),
    "InitCap": lambda: F.initcap(c("s")),
    "Length": lambda: F.length(c("s")),
    "OctetLength": lambda: F.octet_length(c("s")),
    "Like": lambda: c("s").like("%o%"),
    "RLike": lambda: c("s").rlike("[aeiou]"),
    "RegExpReplace": lambda: F.regexp_replace(c("s"), "[aeiou]", "_"),
    "Lower": lambda: F.lower(c("s")),
    "Upper": lambda: F.upper(c("s")),
    "Reverse": lambda: F.reverse(c("s")),
    "StringInstr": lambda: F.instr(c("s"), "o"),
    "StringRepeat": lambda: F.repeat(c("s"), 2),
    "StringReplace": lambda: F.replace(c("s"), F.lit("l"), F.lit("L")),
    "StringLPad": lambda: F.lpad(c("s"), 20, "*"),
    "StringRPad": lambda: F.rpad(c("s"), 20, "*"),
    "StringSpace": lambda: F.concat(F.expr("space(pmod(i, 4) + 1)"), c("s")),
    "StringSplit": lambda: F.split(c("s"), " "),
    "StringTranslate": lambda: F.translate(c("s"), "lo", "10"),
    "StringTrim": lambda: F.trim(c("s")),
    "StringTrimLeft": lambda: F.ltrim(c("s")),
    "StringTrimRight": lambda: F.rtrim(c("s")),
    "StringTrimBoth": lambda: F.btrim(c("s"), F.lit("Hd")),
    "Left": lambda: F.left(c("s"), F.lit(3)),
    "Right": lambda: F.right(c("s"), F.lit(3)),
    "Substring": lambda: F.substring(c("s"), 2, 5),
}
for name, b in _STR.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/strings.scala:34-482")

# --- datetime (serde/datetime.scala:35-716, serde/unixtime.scala) -----
_DT = {
    "Year": lambda: F.year(c("d")),
    "Month": lambda: F.month(c("d")),
    "DayOfMonth": lambda: F.dayofmonth(c("d")),
    "DayOfWeek": lambda: F.dayofweek(c("d")),
    "WeekDay": lambda: F.weekday(c("d")),
    "DayOfYear": lambda: F.dayofyear(c("d")),
    "WeekOfYear": lambda: F.weekofyear(c("d")),
    "Quarter": lambda: F.quarter(c("d")),
    "Hour": lambda: F.hour(c("ts")),
    "Minute": lambda: F.minute(c("ts")),
    "Second": lambda: F.second(c("ts")),
    "DateAdd": lambda: F.date_add(c("d"), 30),
    "DateSub": lambda: F.date_sub(c("d"), 30),
    "DateDiff": lambda: F.datediff(F.current_date(), c("d")),
    "DateFormat": lambda: F.date_format(c("ts"), "yyyy-MM-dd HH:mm"),
    "DateFromUnixDate": lambda: F.date_from_unix_date(F.unix_date(c("d"))),
    "UnixDate": lambda: F.unix_date(c("d")),
    "FromUnixTime": lambda: F.from_unixtime(F.unix_timestamp(c("ts"))),
    "UnixTimestamp": lambda: F.unix_timestamp(c("ts")),
    "LastDay": lambda: F.last_day(c("d")),
    "NextDay": lambda: F.next_day(c("d"), "Mon"),
    "MakeDate": lambda: F.make_date(F.year(c("d")), F.month(c("d")), F.lit(1)),
    "SecondsToTimestamp": lambda: F.timestamp_seconds(F.unix_timestamp(c("ts"))),
    "TruncDate": lambda: F.trunc(c("d"), "month"),
    "TruncTimestamp": lambda: F.date_trunc("hour", c("ts")),
    "DatePart": lambda: F.date_part(F.lit("YEAR"), c("ts")),
    "Extract": lambda: F.extract(F.lit("MONTH"), c("ts")),
}
for name, b in _DT.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/datetime.scala:35-716")

# --- hash (serde/hash.scala:28-136; native hash_funcs/) ---------------
_HASH = {
    "Md5": lambda: F.md5(c("s").cast("binary")),
    "Sha1": lambda: F.sha1(c("s").cast("binary")),
    "Sha2": lambda: F.sha2(c("s").cast("binary"), 256),
    "Crc32": lambda: F.crc32(c("s").cast("binary")),
    "Murmur3Hash": lambda: F.hash(c("s"), c("i")),
    "XxHash64": lambda: F.xxhash64(c("s"), c("i")),
}
for name, b in _HASH.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/hash.scala:28-136")

# --- bitwise (serde/bitwise.scala:27-143) -----------------------------
_BIT = {
    "BitwiseAnd": lambda: c("i").bitwiseAND(c("j")),
    "BitwiseOr": lambda: c("i").bitwiseOR(c("j")),
    "BitwiseXor": lambda: c("i").bitwiseXOR(c("j")),
    "BitwiseNot": lambda: F.bitwise_not(c("i")),
    "ShiftLeft": lambda: F.shiftleft(c("i"), 2),
    "ShiftRight": lambda: F.shiftright(c("i"), 2),
    "BitwiseGet": lambda: F.getbit(c("l"), F.lit(3)),
    "BitwiseCount": lambda: F.bit_count(c("l")),
}
for name, b in _BIT.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/bitwise.scala:27-143")

# --- arrays (serde/arrays.scala:35-814; native array_funcs/) ----------
_ARR = {
    "ArrayAppend": lambda: F.array_append(c("arr"), c("i")),
    "ArrayCompact": lambda: F.array_compact(c("arr")),
    "ArrayContains": lambda: F.array_contains(c("arr"), c("i")),
    "ArrayDistinct": lambda: F.array_distinct(c("arr")),
    "ArrayExcept": lambda: F.array_except(c("arr"), c("arr2")),
    "ArrayFilter": lambda: F.filter(c("arr"), lambda x: x > 0),
    "ArrayInsert": lambda: F.array_insert(c("arr"), 1, c("i")),
    "ArrayIntersect": lambda: F.array_intersect(c("arr"), c("arr2")),
    "ArrayJoin": lambda: F.array_join(c("sarr"), ","),
    "ArrayMax": lambda: F.array_max(c("arr")),
    "ArrayMin": lambda: F.array_min(c("arr")),
    "ArrayPosition": lambda: F.array_position(c("arr"), c("i")),
    "ArrayRemove": lambda: F.array_remove(c("arr"), c("i")),
    "ArrayRepeat": lambda: F.array_repeat(c("i"), 3),
    "ArraysOverlap": lambda: F.arrays_overlap(c("arr"), c("arr2")),
    "ArraysZip": lambda: F.arrays_zip(c("arr"), c("arr2")),
    "ArrayUnion": lambda: F.array_union(c("arr"), c("arr2")),
    "SortArray": lambda: F.sort_array(c("arr"), asc=False),
    "CreateArray": lambda: F.array(c("i"), c("j")),
    "ElementAt": lambda: F.element_at(c("arr"), 1),
    "Flatten": lambda: F.flatten(F.array(c("arr"), c("arr2"))),
    "GetArrayItem": lambda: c("arr")[0],
    "Size": lambda: F.size(c("arr")),
    "ArrayReverse": lambda: F.reverse(c("arr")),
    # higher-order siblings Spark gives for free (superset)
    "TransformArray": lambda: F.transform(c("arr"), lambda x: x * 2),
    "AggregateArray": lambda: F.aggregate(c("arr"), F.lit(0), lambda a, x: a + x),
    "ZipWith": lambda: F.zip_with(c("arr"), c("arr2"), lambda x, y: x + y),
    "ArrayExists": lambda: F.exists(c("arr"), lambda x: x > 2),
    # beyond the reference doc: comparator-lambda sort and reduce
    "ArraySortComparator": lambda: F.array_sort(
        c("arr"),
        lambda x, y: F.when(x < y, 1).when(x > y, -1).otherwise(0),
    ),
    "Reduce": lambda: F.reduce(
        c("arr"), F.lit(0), lambda acc, x: acc + x
    ),
    "ArrayForAll": lambda: F.forall(c("arr"), lambda x: x.isNotNull()),
}
for name, b in _ARR.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/arrays.scala:35-814")

# --- maps (serde/maps.scala:27-168) -----------------------------------
_MAP = {
    "GetMapValue": lambda: c("m")["k1"],
    "MapKeys": lambda: F.sort_array(F.map_keys(c("m"))),
    "MapValues": lambda: F.sort_array(F.map_values(c("m"))),
    "MapEntries": lambda: F.map_entries(c("m")),
    "MapFromArrays": lambda: F.map_from_arrays(c("sarr"), F.transform(c("sarr"), F.length)),
    "MapFromEntries": lambda: F.map_from_entries(
        F.arrays_zip(c("sarr"), F.transform(c("sarr"), F.length))
    ),
    "MapContainsKey": lambda: F.map_contains_key(c("m"), "k1"),
    "StringToMap": lambda: F.str_to_map(F.lit("a:1,b:2"), F.lit(","), F.lit(":")),
    # map higher-order lambdas: beyond the reference's map surface
    # (serde/maps.scala has no lambda handlers) — Spark natives.
    "TransformKeys": lambda: F.sort_array(
        F.map_keys(F.transform_keys(c("m"), lambda k, v: F.upper(k)))
    ),
    "TransformValues": lambda: F.sort_array(
        F.map_values(F.transform_values(c("m"), lambda k, v: v * 2))
    ),
    "MapFilter": lambda: F.sort_array(
        F.map_keys(F.map_filter(c("m"), lambda k, v: v > 0))
    ),
    "MapZipWith": lambda: F.sort_array(
        F.map_values(F.map_zip_with(c("m"), c("m"), lambda k, v1, v2: v1 + v2))
    ),
}
for name, b in _MAP.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/maps.scala:27-168")

# --- structs / json / csv (serde/structs.scala:32-322) ----------------
_STRUCT = {
    "CreateNamedStruct": lambda: F.named_struct(F.lit("x"), c("i"), F.lit("y"), c("s")),
    "GetStructField": lambda: c("st")["a"],
    "GetArrayStructFields": lambda: F.array(c("st"), c("st")).getField("a"),
    "StructsToJson": lambda: F.to_json(c("st")),
    "JsonToStructs": lambda: F.from_json(c("js"), "a INT, b STRING"),
    "StructsToCsv": lambda: F.to_csv(c("st")),
    "GetJsonObject": lambda: F.get_json_object(c("js"), "$.a"),
    "CsvToStructs": lambda: F.from_csv(c("csvs"), F.lit("x INT, y STRING")),
}
for name, b in _STRUCT.items():
    _e(EXPRESSIONS, name, "scalar", (lambda bb=b: bb().alias("v")), "serde/structs.scala:32-322")

# --- conversion (CometCast.scala:139-421; conversion_funcs/cast.rs) ---
for name, kind, build, ref in [
    ("Cast", "scalar", lambda: c("i").cast("string").alias("v"), "expressions/CometCast.scala:139-421"),
    ("CastStringToInt", "scalar", lambda: c("i").cast("string").cast("int").alias("v"), "CometCast.scala"),
    ("CastDoubleToDecimal", "scalar", lambda: c("dbl").cast("decimal(12,4)").alias("v"), "CometCast.scala"),
    ("CastTimestampToDate", "scalar", lambda: c("ts").cast("date").alias("v"), "CometCast.scala"),
    ("TryCast", "scalar", lambda: F.try_to_number(F.lit("x"), F.lit("999")).alias("v"), "eval_mode=TRY"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- misc (QueryPlanSerde.scala:246-261) ------------------------------
for name, kind, build, ref in [
    ("Alias", "scalar", lambda: c("i").alias("renamed"), "QueryPlanSerde.scala:246"),
    ("Literal", "scalar", lambda: F.lit(42).alias("v"), "serde/literals.scala"),
    ("ArrayLiteral", "scalar", lambda: F.lit([1, 2, 3]).alias("v"), "expr.proto:26-41"),
    ("MonotonicallyIncreasingID", "scalar", lambda: F.monotonically_increasing_id().alias("v"), "serde/nondetermenistic.scala"),
    ("SparkPartitionID", "scalar", lambda: F.spark_partition_id().alias("v"), "serde/nondetermenistic.scala"),
    ("Rand", "scalar", lambda: F.rand(42).alias("v"), "serde/nondetermenistic.scala:24-86"),
    ("Randn", "scalar", lambda: F.randn(42).alias("v"), "serde/nondetermenistic.scala"),
    ("UrlEncode", "scalar", lambda: F.url_encode(c("s")).alias("v"), "serde/statics.scala:29-85"),
    ("UrlDecode", "scalar", lambda: F.url_decode(F.url_encode(c("s"))).alias("v"), "serde/statics.scala"),
    ("ToPrettyString", "scalar", lambda: c("arr").cast("string").alias("v"), "QueryPlanSerde.scala to_pretty_string"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- intervals & variant (beyond the reference: interval types are an
# explicit TODO at serde/QueryPlanSerde.scala:822-828; the JSON surface
# stops at get_json_object/from_json, serde/structs.scala) -------------
for name, kind, build, ref in [
    ("IntervalAddMonth", "scalar", lambda: (c("d") + F.expr("INTERVAL 2 MONTH")).cast("date").alias("v"), "QueryPlanSerde.scala:822-828 (unsupported there)"),
    ("IntervalSubDay", "scalar", lambda: (c("d") - F.expr("INTERVAL 10 DAY")).cast("date").alias("v"), "QueryPlanSerde.scala:822-828"),
    ("IntervalAddHourTs", "scalar", lambda: (c("ts") + F.expr("INTERVAL 6 HOUR")).alias("v"), "QueryPlanSerde.scala:822-828"),
    ("MakeInterval", "scalar", lambda: (c("d") + F.make_interval(F.lit(0), F.lit(1), F.lit(0), F.lit(3))).cast("date").alias("v"), "QueryPlanSerde.scala:822-828"),
    ("ParseJson", "scalar", lambda: F.is_variant_null(F.parse_json(c("js"))).alias("v"), "superset: Spark 4 VariantType"),
    ("VariantGet", "scalar", lambda: F.variant_get(F.parse_json(c("js")), "$.a", "int").alias("v"), "superset: Spark 4 VariantType"),
    ("TryVariantGet", "scalar", lambda: F.try_variant_get(F.parse_json(c("js")), "$.a", "int").alias("v"), "superset: Spark 4 VariantType"),
    ("Levenshtein", "scalar", lambda: F.levenshtein(c("s"), c("s2")).alias("v"), "superset: not in serde/strings.scala"),
    ("FormatString", "scalar", lambda: F.format_string("%s-%d", c("s"), c("i")).alias("v"), "superset: not in serde/strings.scala"),
    ("FormatNumber", "scalar", lambda: F.format_number(c("dbl"), 2).alias("v"), "superset: not in serde/strings.scala"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- superset misc: functions with no reference serde entry at all
# (not in any dispatch map, QueryPlanSerde.scala:51-294) — native in
# Spark, declared so the surface delta over the reference is explicit.
for name, kind, build, ref in [
    ("FromXml", "scalar", lambda: F.from_xml(F.lit("<r><a>7</a></r>"), "a INT").alias("v"), "superset: XML not in reference"),
    ("SchemaOfXml", "scalar", lambda: F.schema_of_xml(F.lit("<r><a>1</a></r>")).alias("v"), "superset"),
    ("Mask", "scalar", lambda: F.mask(c("s")).alias("v"), "superset: PII masking"),
    ("Sentences", "scalar", lambda: F.sentences(c("s")).alias("v"), "superset"),
    ("TryParseJson", "scalar", lambda: F.is_variant_null(F.try_parse_json(c("js"))).alias("v"), "superset"),
    ("Overlay", "scalar", lambda: F.overlay(c("s"), F.lit("XX"), 2).alias("v"), "superset"),
    ("Soundex", "scalar", lambda: F.soundex(c("s")).alias("v"), "superset"),
    ("RegexpExtractAll", "scalar", lambda: F.regexp_extract_all(c("s"), F.lit("([a-z]+)"), 1).alias("v"), "superset"),
    ("Base64", "scalar", lambda: F.base64(c("bin")).alias("v"), "superset"),
    ("Unbase64", "scalar", lambda: F.unbase64(F.base64(c("bin"))).alias("v"), "superset"),
    ("ToBinary", "scalar", lambda: F.to_binary(F.hex(c("i")), F.lit("hex")).alias("v"), "superset"),
    ("Elt", "scalar", lambda: F.elt(F.lit(1), c("s"), c("s2")).alias("v"), "superset"),
    ("WidthBucket", "scalar", lambda: F.width_bucket(c("dbl"), F.lit(0.0), F.lit(100.0), F.lit(10)).alias("v"), "superset"),
    ("TryElementAt", "scalar", lambda: F.try_element_at(c("arr"), F.lit(99)).alias("v"), "superset"),
    ("Cardinality", "scalar", lambda: F.cardinality(c("arr")).alias("v"), "superset"),
    # The reference REJECTS collated strings outright (raw-byte
    # comparison only — serde/QueryPlanSerde.scala:832-833,
    # CometShuffleExchangeExec.scala:344-346); native here.
    ("Collate", "scalar", lambda: (F.collate(c("s"), "UTF8_LCASE") == F.collate(F.upper(c("s")), "UTF8_LCASE")).alias("v"), "superset: QueryPlanSerde.scala:832-833 rejects collation"),
    ("Collation", "scalar", lambda: F.collation(F.collate(c("s"), "UNICODE")).alias("v"), "superset"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- Spark 4.0-new scalar surface (no reference counterpart possible —
# the reference's snapshot predates these; declared so the engine's
# frontier tracks Spark's) --------------------------------------------
for name, kind, build, ref in [
    ("RandStr", "scalar", lambda: F.length(F.randstr(F.lit(8), F.lit(7))).alias("v"), "superset: Spark 4.0"),
    ("Uniform", "scalar", lambda: (F.uniform(F.lit(0), F.lit(10), F.lit(7)) >= 0).alias("v"), "superset: Spark 4.0"),
    ("ZeroIfNull", "scalar", lambda: F.zeroifnull(F.try_divide(c("i"), F.lit(0))).alias("v"), "superset: Spark 4.0"),
    ("NullIfZero", "scalar", lambda: F.nullifzero(c("i") - c("i")).alias("v"), "superset: Spark 4.0"),
    ("MonthName", "scalar", lambda: F.monthname(c("d")).alias("v"), "superset: Spark 4.0"),
    ("DayName", "scalar", lambda: F.dayname(c("d")).alias("v"), "superset: Spark 4.0"),
    ("Quote", "scalar", lambda: F.quote(c("s")).alias("v"), "superset: Spark 4.0"),
    ("TypeOf", "scalar", lambda: F.typeof(c("dec")).alias("v"), "superset"),
    ("TryUrlDecode", "scalar", lambda: F.try_url_decode(F.url_encode(c("s"))).alias("v"), "superset: Spark 4.0"),
    ("TryMod", "scalar", lambda: F.try_mod(c("i"), c("j")).alias("v"), "superset: Spark 4.0"),
    ("TryMakeTimestamp", "scalar", lambda: F.try_make_timestamp(F.lit(2024), F.lit(2), F.lit(30), F.lit(0), F.lit(0), F.lit(0)).alias("v"), "superset: Spark 4.0 (invalid date -> NULL, no error)"),
    ("SessionUser", "scalar", lambda: F.length(F.session_user()).alias("v"), "superset: Spark 4.0"),
]:
    _e(EXPRESSIONS, name, kind, build, ref)

# --- Spark 4.0-new aggregate surface ----------------------------------
for name, build in [
    ("ListAgg", lambda: F.listagg(c("s"), ",")),
    ("StringAgg", lambda: F.string_agg(c("s"), ";")),
    ("TrySum", lambda: F.try_sum(c("i"))),
    ("TryAvg", lambda: F.try_avg(c("i"))),
    ("HllSketchAgg", lambda: F.hll_sketch_estimate(F.hll_sketch_agg(c("i")))),
]:
    _e(EXPRESSIONS, name, "agg", (lambda bb=build: bb().alias("v")), "superset: Spark 4.0 / 3.5")

# --- aggregates (serde/aggregates.scala:35-770; agg_funcs/) -----------
_AGG = {
    "Count": lambda: F.count(c("i")),
    "CountDistinct": lambda: F.count_distinct(c("i")),
    "Min": lambda: F.min(c("i")),
    "Max": lambda: F.max(c("i")),
    "Sum": lambda: F.sum(c("l")),
    "SumDecimal": lambda: F.sum(c("dec")),
    "Average": lambda: F.avg(c("dbl")),
    "AverageDecimal": lambda: F.avg(c("dec")),
    "First": lambda: F.first(c("i"), ignorenulls=True),
    "Last": lambda: F.last(c("i"), ignorenulls=True),
    "BitAndAgg": lambda: F.bit_and(c("i")),
    "BitOrAgg": lambda: F.bit_or(c("i")),
    "BitXorAgg": lambda: F.bit_xor(c("i")),
    "CovSample": lambda: F.covar_samp(c("dbl"), c("f")),
    "CovPopulation": lambda: F.covar_pop(c("dbl"), c("f")),
    "VarianceSamp": lambda: F.var_samp(c("dbl")),
    "VariancePop": lambda: F.var_pop(c("dbl")),
    "StddevSamp": lambda: F.stddev_samp(c("dbl")),
    "StddevPop": lambda: F.stddev_pop(c("dbl")),
    "Corr": lambda: F.corr(c("dbl"), c("f")),
    "CollectSet": lambda: F.size(F.collect_set(c("i"))),
    "BoolAnd": lambda: F.bool_and(c("b")),
    "BoolOr": lambda: F.bool_or(c("b")),
    "AggFilterClause": lambda: F.expr("sum(i) FILTER (WHERE b)"),
    "MinBy": lambda: F.min_by(c("s"), c("i")),
    "MaxBy": lambda: F.max_by(c("s"), c("i")),
    # superset: reference aggrSerdeMap has no median/mode/percentile
    # (QueryPlanSerde.scala:275-294 — approx/percentile aggs fall back)
    "Median": lambda: F.median(c("dbl")),
    "Mode": lambda: F.mode(c("i")),
    "Percentile": lambda: F.percentile(c("dbl"), F.lit(0.5)),
    "ApproxPercentile": lambda: F.percentile_approx(c("dbl"), F.lit(0.5)),
    "HllSketchEstimate": lambda: F.hll_sketch_estimate(F.hll_sketch_agg(c("i"))),
    "BitmapConstructAgg": lambda: F.bitmap_count(
        F.bitmap_construct_agg(F.bitmap_bit_position(c("i")))
    ),
}
for name, b in _AGG.items():
    _e(EXPRESSIONS, name, "agg", (lambda bb=b: bb().alias("v")), "serde/aggregates.scala:35-770")

# --- window functions (CometWindowExec.scala:41-247; superset) --------
_WIN = {
    "WindowSum": lambda: F.sum(c("i")),
    "WindowCount": lambda: F.count(c("i")),
    "WindowMin": lambda: F.min(c("i")),
    "WindowMax": lambda: F.max(c("i")),
    "Lag": lambda: F.lag(c("i"), 1),
    "Lead": lambda: F.lead(c("i"), 1),
    # reference falls back to Spark for these (expressions.md:219-232);
    # native here by construction:
    "RowNumber": lambda: F.row_number(),
    "Rank": lambda: F.rank(),
    "DenseRank": lambda: F.dense_rank(),
    "Ntile": lambda: F.ntile(4),
    "CumeDist": lambda: F.cume_dist(),
    "PercentRank": lambda: F.percent_rank(),
    "NthValue": lambda: F.nth_value(c("i"), 2),
}
for name, b in _WIN.items():
    # window builders stay un-aliased: callers apply .over(w) first
    _e(EXPRESSIONS, name, "window", b, "CometWindowExec.scala:41-247")


# --- plan-internal expressions (no standalone evaluation surface) -----
# The remaining names in the reference's expression doc
# (docs/source/user-guide/latest/expressions.md) are Catalyst plan
# artifacts, not user-callable functions.  They are realized implicitly
# by the queries that exercise the enclosing operator; listed here so
# the §2.2 inventory is accounted for name-by-name.
INTERNAL_EXPRESSIONS: dict[str, str] = {
    "AttributeReference": "every column reference in every query",
    "Ascending": "orderBy(col.asc()) — every sorted query",
    "Descending": "orderBy(col.desc()) — every top-k query",
    "NullsFirst": "asc_nulls_first() — sort-gate queries (q1 ordering)",
    "NullsLast": "desc_nulls_last() — window/sort queries",
    "ScalarSubquery": "queries scalar_subquery_api / "
    "correlated_scalar_subquery (serde/CometScalarSubquery.scala:28)",
    "BloomFilterMightContain": "runtime-filter plan test "
    "test_runtime_bloom_filter_injects_on_selective_join "
    "(spark.sql.optimizer.runtime.bloomFilter.enabled)",
    "KnownFloatingPointNormalized": "Catalyst NaN/-0.0 normalization "
    "wrapper, injected by Spark around float comparisons "
    "(rules/CometExecRule.scala:492-531 rebuilds what Spark does itself)",
    "NormalizeNaNAndZero": "same — pinned by tests/test_fixture_edges.py "
    "float-edge groupBy/join cases",
    "MakeDecimal": "decimal internals inside Catalyst agg rewrites — "
    "pinned by expr_decimal_arith / q1 decimal aggregates",
    "PromotePrecision": "legacy decimal precision promotion — Catalyst "
    "DecimalPrecision rule, exercised by every _dec() arithmetic query",
    "Days": "Iceberg partition transform (no Iceberg runtime in env; "
    "date_trunc('DAY', ...) is the semantic equivalent, registry DateTrunc)",
}


def entries_of_kind(kind: str) -> list[Expr]:
    return [e for e in EXPRESSIONS.values() if e.kind == kind]
