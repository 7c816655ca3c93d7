"""The Hive scalar-function surface (FunctionRegistry.java:45-133).

Every function the reference registers, mapped to its Spark builtin. All are
JVM-side expressions (whole-stage codegen) — no Python UDFs anywhere on this
surface. The table is executable: ``column(name, *args)`` builds the Spark
Column for a Hive function name, and tests iterate it for coverage.

Notes on semantics pinned here:
- substr is 1-based with negative offsets (UDFSubstr) — same as Spark.
- like/rlike: SQL %/_ wildcards vs java regex (UDFLike/UDFRegExp) — same.
- CAST surface: BOOLEAN/TINYINT/INT/BIGINT/FLOAT/DOUBLE/STRING/DATE
  (UDFTo*.java) — Spark ``cast`` covers all; DATETIME→TimestampType.
- rand() is registered but excluded from parity tests (nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# hive name -> callable(*Column) -> Column
HIVE_FUNCTIONS: dict[str, object] = {
    # strings (FunctionRegistry.java:47-75)
    "concat": F.concat,
    "substr": lambda c, pos, ln=None: (
        F.substring(c, pos, ln) if ln is not None else F.substr(c, F.lit(pos))
    ),
    "upper": F.upper,
    "ucase": F.upper,
    "lower": F.lower,
    "lcase": F.lower,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "like": lambda c, pat: c.like(pat),
    "rlike": lambda c, pat: c.rlike(pat),
    "regexp": lambda c, pat: c.rlike(pat),
    "regexp_replace": F.regexp_replace,
    # math (:58-84)
    "round": F.round,
    "floor": F.floor,
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "rand": F.rand,
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    # bitwise (:86-89)
    "&": lambda a, b: a.bitwiseAND(b),
    "|": lambda a, b: a.bitwiseOR(b),
    "^": lambda a, b: a.bitwiseXOR(b),
    "~": lambda a: F.bitwise_not(a),
    # logic / comparison (:91-107)
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
    "isnull": lambda a: a.isNull(),
    "isnotnull": lambda a: a.isNotNull(),
    # conversion (:111-126) — UDFTo{Boolean,Byte,Integer,Long,Float,Double,String,Date}
    "to_boolean": lambda a: a.cast("boolean"),
    "to_tinyint": lambda a: a.cast("byte"),
    "to_int": lambda a: a.cast("int"),
    "to_bigint": lambda a: a.cast("long"),
    "to_float": lambda a: a.cast("float"),
    "to_double": lambda a: a.cast("double"),
    "to_string": lambda a: a.cast("string"),
    "to_date": lambda a: a.cast("date"),
    # collections (:56 + ExprNode{Index,Field}Evaluator)
    "size": F.size,
    "index": lambda a, i: a.getItem(i),
    "field": lambda a, name: a.getField(name),
    # sampling (:45)
    "default_sample_hashfn": F.hash,
}

# Hive UDAFs (FunctionRegistry.java:129-133)
HIVE_AGGREGATES = {
    "sum": F.sum,
    "count": F.count,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "count_distinct": F.countDistinct,
}


def column(name: str, *args) -> Column:
    fn = HIVE_FUNCTIONS[name]
    return fn(*args)
