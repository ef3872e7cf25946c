"""Column-function helpers shared by the operator library.

Everything here stays JVM-side (pyspark.sql.functions only — no Python
UDFs), so expressions remain inside whole-stage codegen and Catalyst
can push/prune around them.

Determinism notes (these matter for the DuckDB oracle hash-compare):

* ``dsum`` casts doubles to DECIMAL before summing.  Double summation
  is association-dependent — Spark and DuckDB partition/parallelize
  differently, so ``SUM(double)`` differs in the last ulps between
  engines and across runs.  Decimal summation is exact integer
  arithmetic: bit-identical everywhere, any partitioning.  At 100 TB
  this is also the *correct* choice for money columns.
* ``davg`` divides an exact decimal sum by a count in IEEE double —
  one deterministic rounding instead of billions.
* vector ops fold left-to-right via ``F.aggregate``; results are
  rounded before any ranking so equal-to-6-decimals ties break by key,
  not by engine-specific ulps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Round a double column onto an exact decimal grid.

    ``precision`` is a performance knob: Spark's Decimal is a plain
    long (codegen-friendly) while total digits stay ≤ 18, and SUM's
    accumulator gets precision+10 — so a bounded input cast with
    precision ≤ 8 keeps the whole aggregation on the fast long-backed
    path (~2× at bench scale).  Only narrow it where the column's
    value bound provably fits (a value outside the precision errors
    under ANSI — loud, not wrong).  The DuckDB oracle keeps
    DECIMAL(18,s): the *values* are identical whenever no overflow
    occurs, which the bound guarantees.
    """
    return col.cast(f"decimal({precision},{scale})")


def _sum_exact(col: Column, scale: int, precision: int) -> Column:
    """Exact decimal SUM that stays on long-backed accumulators.

    precision ≤ 8: one fast sum (accumulator ≤ 18 digits).  Otherwise,
    SPLIT the value into integer part (summed as long) and fractional
    part (decimal(scale+1, scale) — its accumulator is scale+11 ≤ 17
    digits, still long-backed), then recombine exactly in decimal(38):
    sum(d) == sum(floor(d)) + sum(d - floor(d)) term-for-term, nulls
    drop from both parts together, and negatives decompose as
    floor(-3.7) = -4 + 0.3.  ~30% faster than one BigDecimal-path sum
    at bench scale; value is bit-identical (recombination is exact, so
    the single final cast-to-double rounds the same exact number the
    oracle's DECIMAL(18,s) sum produces).  Overflow: the long part
    holds sums to 9.2e18 — beyond the driver data's reach at any SF —
    and ANSI mode makes a breach a loud error, not a wrong answer."""
    d = dec(col, scale, 18)
    if precision <= 8:
        return F.sum(dec(col, scale, precision)).cast("decimal(38,%d)" % scale)
    ipart = F.floor(d).cast("long")
    frac = (d - F.floor(d)).cast(f"decimal({scale + 1},{scale})")
    return F.sum(ipart).cast("decimal(38,0)").cast(f"decimal(38,{scale})") + F.sum(frac)


def dsum(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Deterministic SUM of a double column (exact decimal arithmetic),
    returned as double.  SQL oracle twin: ``sql_dsum`` below."""
    return _sum_exact(col, scale, precision).cast("double")


def sql_dec2dbl(expr: str) -> str:
    """DECIMAL → DOUBLE conversion that is CORRECTLY ROUNDED in DuckDB.

    DuckDB's direct ``CAST(DECIMAL AS DOUBLE)`` computes
    ``(double)int128_value / (double)10^scale`` — TWO roundings, which
    drifts one ulp from the true nearest double once the scaled
    integer exceeds 2^53 (observed on sf0.1 power sums:
    1110454735483153.5290 → ...3.6 direct vs ...3.5 correct).  Spark's
    BigDecimal→double is correctly rounded, so the engines disagree
    exactly where sums get big — i.e. exactly at scale.  Routing the
    oracle through VARCHAR (exact digits) → fast_float parse (correctly
    rounded) restores the single-rounding semantics on both sides."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return sql_dec2dbl(f"SUM(CAST({expr} AS DECIMAL(18,{scale})))")


def spark_dsum(expr: str, scale: int = 2) -> str:
    """Spark-SQL-dialect twin of ``sql_dsum`` for operators written as
    ``spark.sql(...)`` strings.  Spark's BigDecimal→double cast is
    already correctly rounded, so no VARCHAR round-trip is needed —
    and Spark's parser rejects DuckDB's bare ``VARCHAR`` anyway
    (DATATYPE_MISSING_SIZE), so ``sql_dsum`` output must never reach
    ``spark.sql``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def spark_davg(expr: str, scale: int = 4) -> str:
    """Spark-SQL-dialect twin of ``sql_davg`` (see ``spark_dsum``)."""
    return spark_dsum(expr, scale) + f" / COUNT({expr})"


def davg(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Deterministic AVG: exact decimal sum / count, one double divide.
    SQL oracle twin: ``sql_davg`` below."""
    return _sum_exact(col, scale, precision).cast("double") / F.count(col)


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        sql_dec2dbl(f"SUM(CAST({expr} AS DECIMAL(18,{scale})))")
        + f" / COUNT({expr})"
    )


def vec_double(col: Column) -> Column:
    """array<float> → array<double> (testdata embeddings are float32;
    all math runs in float64 for cross-engine agreement)."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, folded left-to-right
    JVM-side (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity rounded to ``digits`` (ranking-stable across
    engines; DuckDB twin: ``ROUND(list_cosine_similarity(a::DOUBLE[],
    b::DOUBLE[]), digits)``)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), digits)


def let(bound: Column, body) -> Column:
    """Let-binding for Spark higher-order-function lambdas: evaluate
    ``bound`` ONCE per row and hand it to ``body`` as a lambda
    variable.

    Why this exists: Spark's higher-order functions are
    CodegenFallback — they run interpreted, and an interpreted lambda
    re-evaluates every CAPTURED expression on each element.  A
    ``transform`` over a document's n windows whose lambda captures
    ``split(text, ' ')`` therefore recomputes the split n times —
    O(n²) work per document that silently dominates at scale (the
    8-gram build measured 5.3× faster at 10× data after binding).
    Wrapping the expensive expression as the single element of an
    array and referencing it through the transform's lambda variable
    turns every capture into a variable lookup.  Values are identical;
    this is a plan-shape change only.
    """
    return F.element_at(F.transform(F.array(bound), body), 1)
