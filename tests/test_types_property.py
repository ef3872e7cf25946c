"""Property-based tests for the Glue type-string parser (hypothesis).

The reference's 23 unit tests (glue.rs:580-1104) are ported in
test_types.py; these go further than the reference's own strategy
(SURVEY.md §5 notes it has no property tests): generate arbitrary
nested Glue types, render them to the grammar's string form, and
assert the parser reconstructs exactly the expected Spark type —
including the reference's deviations (everything nullable, char/
varchar → string, decimal ≤ 38).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.errors import TypeMappingError
from datafusion_catalogprovider_glue_spark.types import parse_glue_data_type

# (rendered string, expected spark type) for the primitives
_PRIMITIVES = [
    ("tinyint", T.ByteType()),
    ("smallint", T.ShortType()),
    ("int", T.IntegerType()),
    ("integer", T.IntegerType()),
    ("boolean", T.BooleanType()),
    ("bigint", T.LongType()),
    ("float", T.FloatType()),
    ("double", T.DoubleType()),
    ("binary", T.BinaryType()),
    ("timestamp", T.TimestampNTZType()),
    ("string", T.StringType()),
    ("char", T.StringType()),
    ("varchar", T.StringType()),
    ("date", T.DateType()),
]

_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_0123456789-", min_size=1, max_size=12
).filter(lambda s: not s[0].isdigit())


def _decimal():
    return st.tuples(st.integers(1, 38), st.integers(0, 10)).filter(
        lambda ps: ps[1] <= ps[0]
    ).map(lambda ps: (f"decimal({ps[0]},{ps[1]})", T.DecimalType(ps[0], ps[1])))


def _glue_types():
    base = st.one_of(st.sampled_from(_PRIMITIVES), _decimal())

    def extend(children):
        arrays = children.map(lambda c: (f"array<{c[0]}>", T.ArrayType(c[1], True)))
        maps = st.tuples(children, children).map(
            lambda kv: (
                f"map<{kv[0][0]},{kv[1][0]}>",
                T.MapType(kv[0][1], kv[1][1], True),
            )
        )
        structs = st.lists(
            st.tuples(_ident, children), min_size=1, max_size=4, unique_by=lambda t: t[0]
        ).map(
            lambda fields: (
                "struct<" + ",".join(f"{n}:{c[0]}" for n, c in fields) + ">",
                T.StructType([T.StructField(n, c[1], True) for n, c in fields]),
            )
        )
        return st.one_of(arrays, maps, structs)

    return st.recursive(base, extend, max_leaves=8)


@settings(max_examples=300, deadline=None)
@given(_glue_types())
def test_parse_reconstructs_expected_type(case):
    rendered, expected = case
    assert parse_glue_data_type(rendered) == expected


@settings(max_examples=300, deadline=None)
@given(_glue_types())
def test_interior_whitespace_rejected_like_reference(case):
    """The reference's pest grammar defines no WHITESPACE rule
    (glue_datatype.pest), so 'array< int >' is a parse error there —
    and must be here too (strictness parity)."""
    rendered, expected = case
    spaced = rendered.replace("<", "< ")
    if spaced == rendered:  # primitive with no nesting: nothing to vary
        assert parse_glue_data_type(rendered) == expected
        return
    with pytest.raises(TypeMappingError):
        parse_glue_data_type(spaced)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30))
def test_parser_never_crashes_ungracefully(text):
    """Arbitrary input either parses or raises the typed error — never
    an uncontrolled exception (the reference maps parse failures to
    GlueError::GlueDataTypeMapping, mod.rs:172-175)."""
    try:
        parse_glue_data_type(text)
    except TypeMappingError:
        pass


@pytest.mark.parametrize("p", [39, 50])
def test_decimal_over_38_rejected(p):
    """The reference maps decimal to Decimal256 (glue.rs:471-473);
    Spark caps at 38 — we raise loudly instead of truncating
    (SURVEY.md §1.3 deviation table)."""
    with pytest.raises(TypeMappingError):
        parse_glue_data_type(f"decimal({p},2)")
