"""Semantic pins for the round-4 batch-4 operators — properties the
oracle gate can't see (algorithm guarantees on adversarial inputs,
exactness of the dyadic fold, determinism of the resampling coin)."""

from __future__ import annotations

from datetime import datetime
from fractions import Fraction

from tests.conftest import SF_CORRECTNESS


def _run_holt(spark, xs):
    import datafusion_catalogprovider_glue_spark.operators.funnel as mod
    from datafusion_catalogprovider_glue_spark.operators.funnel import (
        events_forecast_holt,
    )

    rows = [
        (0, datetime(2024, 1, 1 + d, 3, 0, 0), 7, "click", 1.0, "{}")
        for d, x in enumerate(xs)
        for _ in range(x)
    ]
    rows = [(k, r[1], r[2], r[3], r[4], r[5]) for k, r in enumerate(rows)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        return events_forecast_holt(spark, "ignored").collect()
    finally:
        mod.load_table = orig


def _holt_fraction(xs):
    level, trend = Fraction(xs[0]), Fraction(0)
    for x in xs[1:]:
        new_level = (Fraction(x) + level + trend) / 2
        trend = (new_level - level + trend) / 2
        level = new_level
    return level, trend


def test_holt_fold_exact_on_short_series(spark):
    """For series short enough that the dyadic denominator stays
    inside the double mantissa (10 steps -> denom 2^19, values ~2^9:
    28 bits << 53), the fold must agree EXACTLY with rational
    arithmetic — no rounding at all."""
    xs = [431, 380, 402, 455, 390, 410, 433, 401, 388, 420]
    out = _run_holt(spark, xs)
    level, trend = _holt_fraction(xs)
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == len(xs)
    assert Fraction(r["level"]) == level          # exact, not approx
    assert Fraction(r["trend"]) == trend
    assert Fraction(r["forecast_next"]) == level + trend


def test_holt_fold_tracks_rational_on_long_series(spark):
    """Past ~20 steps additions round (denominator outgrows the
    mantissa) but the fold must still track the rational reference to
    float precision — the cross-engine oracle separately proves both
    engines round IDENTICALLY."""
    xs = [431, 380, 402, 455, 390, 410, 433, 401, 388, 420,
          399, 412, 407, 391, 404, 418, 395, 409, 427, 385,
          400, 415, 393, 406, 411, 397, 403, 419, 389, 408]
    out = _run_holt(spark, xs)
    level, trend = _holt_fraction(xs)
    r = out[0]
    assert abs(r["level"] - float(level)) < 1e-9
    assert abs(r["trend"] - float(trend)) < 1e-9


def test_misra_gries_candidates_superset(spark):
    """MG guarantee on an adversarial split: a token with global
    support >= phi*N must survive the per-partition counters even when
    its occurrences are smeared across partitions filled with unique
    junk tokens."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators.text import (
        _mg_candidates,
    )

    # 8 partitions x 1200 rows: 1100 unique junk + 100 'hot' each
    # -> hot global share 100/1200 ~ 8.3%, counters budget 64 >> 12
    rows = []
    for p in range(8):
        rows += [(f"junk_{p}_{i}",) for i in range(1100)]
        rows += [("hot",)] * 100
    toks = spark.createDataFrame(rows, "tok string").repartition(8)
    cand = {r["tok"] for r in _mg_candidates(toks, 64).distinct().collect()}
    assert "hot" in cand
    # the sketch prunes: candidates are far fewer than distinct tokens
    assert len(cand) < 8 * 64 + 1


def test_frequent_terms_matches_plain_groupby(spark):
    """Two-phase sketch-then-verify returns EXACTLY the plain
    groupBy+filter answer on the real corpus."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators.text import (
        FREQ_TERM_PHI,
        _docs,
        text_frequent_terms,
    )

    got = {
        (r["tok"], r["n_occurrences"])
        for r in text_frequent_terms(spark, SF_CORRECTNESS).collect()
    }
    toks = _docs(spark, SF_CORRECTNESS).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    n = toks.count()
    import math

    support = math.ceil(FREQ_TERM_PHI * n)
    want = {
        (r["tok"], r["n"])
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= support)
        .collect()
    }
    assert got == want and got


def test_importance_resample_deterministic_and_weighted(spark):
    """Same roster on rerun; short docs are kept at a visibly lower
    rate than cap-length docs (the weighting actually bites)."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        RESAMPLE_CHARS_CAP,
        _docs,
        pipeline_importance_resample,
    )

    a = {r["doc_id"] for r in
         pipeline_importance_resample(spark, SF_CORRECTNESS).collect()}
    b = {r["doc_id"] for r in
         pipeline_importance_resample(spark, SF_CORRECTNESS).collect()}
    assert a == b and a
    docs = {r["doc_id"]: r["n_chars"]
            for r in _docs(spark, SF_CORRECTNESS)
            .select("doc_id", "n_chars").collect()}
    short = [d for d, n in docs.items() if n < RESAMPLE_CHARS_CAP // 2]
    long_ = [d for d, n in docs.items() if n >= RESAMPLE_CHARS_CAP]
    if short and long_:
        short_rate = len(a & set(short)) / len(short)
        long_rate = len(a & set(long_)) / len(long_)
        assert long_rate > short_rate


def test_cusum_finds_injected_shift(spark):
    """A level shift injected mid-series must be the CUSUM argmax: 10
    days at 50/day then 10 days at 150/day -> change day = last day of
    the low regime (prefix deviation peaks at the boundary)."""
    import datafusion_catalogprovider_glue_spark.operators.funnel as mod
    from datafusion_catalogprovider_glue_spark.operators.funnel import (
        events_changepoint_cusum,
    )

    rows = []
    k = 0
    for d in range(20):
        n = 50 if d < 10 else 150
        for i in range(n):
            rows.append((k, datetime(2024, 2, 1 + d, 12, 0, 0), 1,
                         "view", 1.0, "{}"))
            k += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = events_changepoint_cusum(spark, "ignored").collect()
    finally:
        mod.load_table = orig
    assert len(out) == 1
    assert out[0]["change_day"].day == 10  # 2024-02-10: last low day


def test_geo_radius_join_matches_bruteforce(spark):
    """Grid candidates are lossless: equal to the quadratic
    cross-join filter on the same derived points."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators.geo import (
        _R2,
        _cust_points,
        _dist2,
        _supp_points,
        geo_radius_join,
    )

    got = {
        (r["c_custkey"], r["s_suppkey"])
        for r in geo_radius_join(spark, SF_CORRECTNESS).collect()
    }
    c = _cust_points(spark, SF_CORRECTNESS)
    s = _supp_points(spark, SF_CORRECTNESS)
    d2 = _dist2(F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon"))
    want = {
        (r["c_custkey"], r["s_suppkey"])
        for r in c.crossJoin(s).filter(d2 <= _R2)
        .select("c_custkey", "s_suppkey").collect()
    }
    assert got == want and got


def test_delta_writer_time_travel_and_compaction(spark, tmp_path):
    """The written log must support the reader's time travel: v0 = even
    half, v1 = full table, v2 (compaction) = logically identical to v1
    with exactly one live data file."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        compact_delta,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    table = str(tmp_path / "dw")
    assert append_delta(docs.filter(F.col("doc_id") % 2 == 0), table) == 0
    assert append_delta(docs.filter(F.col("doc_id") % 2 == 1), table) == 1
    assert compact_delta(spark, table) == 2

    n_even = docs.filter(F.col("doc_id") % 2 == 0).count()
    n_all = docs.count()
    assert read_delta(spark, table, version=0).count() == n_even
    assert read_delta(spark, table, version=1).count() == n_all
    v2 = read_delta(spark, table)
    assert v2.count() == n_all
    assert len(DeltaSnapshot(table)._active) == 1  # compacted to one file
    # payload fidelity, not just counts
    got = {(r["doc_id"], r["lang"], r["n_chars"]) for r in v2.collect()}
    want = {(r["doc_id"], r["lang"], r["n_chars"]) for r in docs.collect()}
    assert got == want


def test_projection_partitions_enum_integer_cartesian():
    """Projection enumeration: enum x integer cartesian product,
    template substitution, and the unsupported-type refusal."""
    import pytest

    from datafusion_catalogprovider_glue_spark.catalog.catalog import (
        GlueCatalog,
    )
    from datafusion_catalogprovider_glue_spark.errors import SparkError

    params = {
        "projection.enabled": "true",
        "projection.seg.type": "enum",
        "projection.seg.values": "a,b",
        "projection.shard.type": "integer",
        "projection.shard.range": "0,4",
        "projection.shard.interval": "2",
        "storage.location.template": "/data/${seg}/s${shard}",
    }
    keys = [("seg", "string"), ("shard", "int")]
    parts = GlueCatalog._projection_partitions(params, keys, "/root")
    assert [p["Values"] for p in parts] == [
        ["a", "0"], ["a", "2"], ["a", "4"],
        ["b", "0"], ["b", "2"], ["b", "4"],
    ]
    assert parts[4]["StorageDescriptor"]["Location"] == "/data/b/s2"

    # no template -> Hive-style dirs under the root
    p2 = GlueCatalog._projection_partitions(
        {k: v for k, v in params.items() if k != "storage.location.template"},
        keys,
        "/root",
    )
    assert p2[0]["StorageDescriptor"]["Location"] == "/root/seg=a/shard=0"

    # disabled -> empty; unsupported type -> loud refusal
    assert GlueCatalog._projection_partitions({}, keys, "/root") == []
    bad = dict(params)
    bad["projection.seg.type"] = "injected"
    with pytest.raises(SparkError, match="unsupported type"):
        GlueCatalog._projection_partitions(bad, keys, "/root")


def test_projection_date_range_enumeration():
    from datafusion_catalogprovider_glue_spark.catalog.catalog import (
        GlueCatalog,
    )

    params = {
        "projection.enabled": "true",
        "projection.dt.type": "date",
        "projection.dt.range": "2024-01-30,2024-02-02",
        "projection.dt.format": "yyyy-MM-dd",
    }
    parts = GlueCatalog._projection_partitions(
        params, [("dt", "string")], "/r"
    )
    assert [p["Values"][0] for p in parts] == [
        "2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02",
    ]


def test_regex_serde_null_row_and_refusals(spark):
    """Hive RegexSerDe contract: the garbage line parses to an all-NULL
    row; input.regex is required; infer-schema mode is refused."""
    import pytest

    from datafusion_catalogprovider_glue_spark.catalog.catalog import (
        GlueCatalog,
        TableRegistrationOptions,
    )
    from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
        FakeGlueClient,
    )
    from datafusion_catalogprovider_glue_spark.errors import (
        NotImplementedYet,
        SparkError,
    )
    from datafusion_catalogprovider_glue_spark.fixtures.glue_regex import (
        REGEX_PATTERN,
        build_regex_log,
    )
    from datafusion_catalogprovider_glue_spark.sources.formats import (
        REGEX_SERDE,
        TEXT_IN,
        TEXT_OUT,
        calculate_reader_spec,
    )

    location = build_regex_log(spark, SF_CORRECTNESS)
    sd = {
        "Location": location,
        "InputFormat": TEXT_IN,
        "OutputFormat": TEXT_OUT,
        "SerdeInfo": {
            "SerializationLibrary": REGEX_SERDE,
            "Parameters": {"input.regex": REGEX_PATTERN},
        },
        "Columns": [
            {"Name": "custkey", "Type": "bigint"},
            {"Name": "seg", "Type": "string"},
            {"Name": "nationkey", "Type": "bigint"},
            {"Name": "bal", "Type": "decimal(12,2)"},
        ],
    }
    table = {
        "DatabaseName": "logdb", "Name": "customer_log",
        "Parameters": {}, "StorageDescriptor": sd,
    }
    catalog = GlueCatalog(
        spark, FakeGlueClient({"logdb": {"customer_log": table}})
    )
    entry = catalog.register_table("logdb", "customer_log")
    df = spark.table(entry.view)
    nulls = df.filter(df.custkey.isNull()).collect()
    assert len(nulls) == 1  # the garbage line — present, all-NULL
    assert all(nulls[0][c] is None for c in df.columns)

    # missing input.regex -> refusal at dispatch
    bad = {**sd, "SerdeInfo": {"SerializationLibrary": REGEX_SERDE,
                               "Parameters": {}}}
    with pytest.raises(NotImplementedYet, match="input.regex"):
        calculate_reader_spec(bad)

    # infer-schema mode -> refusal (a regex carries no types)
    with pytest.raises(SparkError, match="Glue-schema mode"):
        catalog.register_table(
            "logdb", "customer_log",
            options=TableRegistrationOptions.INFER_SCHEMA_FROM_DATA,
        )


def test_iceberg_incremental_refuses_rewrites(spark):
    """A snapshot that removes files inside the range must be refused
    (the real API's appends-only contract) — the pos-delete-seq fixture
    re-adds/removes files between snapshots 2 and 3."""
    import pytest

    from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
    from datafusion_catalogprovider_glue_spark.fixtures.iceberg_seq import (
        build_iceberg_pos_delete_seq,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg_incremental,
    )

    table = build_iceberg_pos_delete_seq(spark, SF_CORRECTNESS)
    # unknown from-snapshot also refuses
    with pytest.raises(NotImplementedYet, match="snapshot chain"):
        read_iceberg_incremental(spark, table, 99, 100)
