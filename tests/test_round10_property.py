"""Hypothesis property pins for the round-10 codecs and parser.

Generated-input coverage the hand-written pins can't reach: arbitrary
position sets through the puffin DV blob (including >2^32 and
container-cutover shapes), arbitrary hash lists through the KMV blob,
and randomized partition filters evaluated against an independent
Python model of the Glue expression semantics.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
    dict_from_values,
    parse_partition_expression,
)
from datafusion_catalogprovider_glue_spark.sources.puffin import (
    decode_dv_blob,
    decode_kmv_blob,
    encode_dv_blob,
    encode_kmv_blob,
)

positions = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**20),       # dense low
        st.integers(min_value=0, max_value=2**62 - 1),   # sparse high keys
    ),
    max_size=3000,
)


@settings(max_examples=60, deadline=None)
@given(positions)
def test_dv_blob_round_trips(pos):
    assert decode_dv_blob(encode_dv_blob(pos)) == sorted(set(pos))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**60 - 1),
        max_size=300,
        unique=True,
    )
)
def test_kmv_blob_round_trips(hashes):
    hashes = sorted(hashes)
    assert decode_kmv_blob(encode_kmv_blob(hashes)) == hashes


KEYS = [("seg", "string"), ("year", "int")]
segs = st.sampled_from(["A", "B", "C", "AB", "it's"])
years = st.integers(min_value=1990, max_value=2030)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.tuples(segs, years), min_size=1, max_size=12),
    segs,
    years,
    years,
)
def test_expression_matches_python_model(parts, seg_lit, y_lo, y_hi):
    """A composite filter evaluated by the parser must agree with a
    direct Python re-implementation on every generated partition."""
    lo, hi = sorted((y_lo, y_hi))
    seg_sql = seg_lit.replace("'", "''")
    expr = (
        f"seg = '{seg_sql}' OR (year BETWEEN {lo} AND {hi} "
        f"AND NOT seg LIKE 'A%')"
    )
    pred = parse_partition_expression(expr)
    for seg, year in parts:
        row = dict_from_values(KEYS, [seg, str(year)])
        want = (seg == seg_lit) or (
            lo <= year <= hi and not seg.startswith("A")
        )
        assert pred(row) == want, (expr, seg, year)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(segs, years), min_size=1, max_size=12), segs)
def test_expression_in_notin_partition(parts, probe):
    """col IN (...) and col NOT IN (...) split every generated
    partition set exactly."""
    pred_in = parse_partition_expression(
        f"seg IN ('{probe.replace(chr(39), chr(39) * 2)}', 'B')"
    )
    pred_out = parse_partition_expression(
        f"seg NOT IN ('{probe.replace(chr(39), chr(39) * 2)}', 'B')"
    )
    for seg, year in parts:
        row = dict_from_values(KEYS, [seg, str(year)])
        inside = seg in (probe, "B")
        assert pred_in(row) == inside
        assert pred_out(row) == (not inside)
