"""Behavioral tests for the rows-only extension ops (no SQL oracle):
planted near-duplicates must be found by MinHash-LSH, SimHash must be
locality-sensitive, and LSH top-k must agree with brute force on the
buckets it probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.operators import dedup, similarity
from tests.conftest import SF_CORRECTNESS, SF_SMOKE

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees all day"
)


@pytest.fixture(scope="module")
def planted_docs(spark, tmp_path_factory):
    """120 distinct docs + 3 planted near-dup pairs, written as parquet
    so the ops read it like any sf dir."""
    rows = []
    words = BASE.split()
    for i in range(120):
        # rotate + vary words so docs are mutually dissimilar
        doc = " ".join(words[i % len(words):] + words[: i % len(words)]) + f" tail{i} x{i*7} y{i*13}"
        rows.append((i, doc, "en", f"src{i % 4}", len(doc)))
    # planted near-dups: one-word edits of docs 0, 7, 21
    for j, src in enumerate([0, 7, 21]):
        text = rows[src][1].replace("fox", "wolf")
        rows.append((1000 + j, text, "en", "srcdup", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = tmp_path_factory.mktemp("planted")
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_lsh_finds_planted_dups(spark, planted_docs):
    pairs = dedup.dedup_minhash_lsh(spark, planted_docs).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert {(0, 1000), (7, 1001), (21, 1002)} <= found
    # and the planted pairs carry high exact-verified jaccard
    by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert all(by_pair[p] >= 0.7 for p in [(0, 1000), (7, 1001), (21, 1002)])
    # no wild false positives: everything reported passed exact verification
    assert all(r.jaccard >= dedup.JACCARD_THRESHOLD for r in pairs)


def test_minhash_fast_family_same_pairs(spark, planted_docs):
    """Strategy equality for the xxhash64 production family
    (dedup_minhash_lsh_fast) vs the md5 portable family, two pins:

    1. On the REAL testdata corpus (SF_SMOKE, the planted near-dups
       the generator ships) the two families report the IDENTICAL
       verified pair set — deterministic, since both hash families
       and the corpus are fixed.
    2. On the adversarial planted corpus — deliberately dense in
       borderline j≈0.7-0.8 pairs where each family's S-curve
       candidate probability is 0.89-0.99 and divergence is expected
       by construction — every planted high-j dup is still found by
       both with identical exact-verified jaccard."""
    smoke_portable = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    smoke_fast = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_minhash_lsh_fast(spark, SF_SMOKE).collect()
    }
    assert smoke_portable == smoke_fast

    portable = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_minhash_lsh(spark, planted_docs).collect()
    }
    fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_minhash_lsh_fast(spark, planted_docs).collect()
    }
    for p in [(0, 1000), (7, 1001), (21, 1002)]:
        assert portable[p] == fast[p] >= 0.7
    both = set(portable) & set(fast)
    assert all(portable[p] == fast[p] for p in both)  # exact verify agrees


def test_simhash_locality(spark, planted_docs):
    sigs = {r.doc_id: r.simhash for r in dedup.dedup_simhash(spark, planted_docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    # near-dups land within a few bits
    assert ham(sigs[0], sigs[1000]) <= 8
    assert ham(sigs[7], sigs[1001]) <= 8
    # unrelated docs are far apart (rotations share words but differ in
    # the tail tokens; simhash of same multiset is identical, so compare
    # docs with different extra tokens)
    assert ham(sigs[3], sigs[77]) >= 1


def test_lsh_topk_subset_of_bruteforce_space(spark):
    """Every LSH hit must be a real vector with the exact cosine the
    brute-force path computes (same query → same score)."""
    bf = similarity.sim_topk_bruteforce(spark, SF_CORRECTNESS)
    lsh = similarity.sim_topk_lsh(spark, SF_CORRECTNESS)
    bf_scores = {(r.query_id, r.neighbor_id): r.cos for r in bf.collect()}
    lsh_rows = lsh.collect()
    assert len(lsh_rows) > 0
    for r in lsh_rows:
        key = (r.query_id, r.neighbor_id)
        if key in bf_scores:  # overlap must agree exactly
            assert bf_scores[key] == r.cos


def test_multimodal_decode_refuses_unknown_format(spark):
    """The codecs parse real format bytes and refuse what they can't
    decode — a PNG payload raises, never silently fakes."""
    from datafusion_catalogprovider_glue_spark.functions.media_codecs import (
        decode_ppm,
        decode_wav_pcm16,
    )

    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"\x89PNG\r\n\x1a\n")


def test_minhash_recall_vs_exact_bruteforce(spark):
    """The testdata generator plants real near-duplicates.  Compare
    LSH-found pairs against a DuckDB exact brute-force over ALL pairs
    (feasible at 500 docs): precision must be 1.0 (every reported pair
    is exact-verified) and recall must be high (≥0.9 at j≥0.6, where
    the 8×4 banding S-curve is near 1)."""
    import duckdb

    con = duckdb.connect()
    exact = con.execute(
        f"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, len(string_split(text,' ')) - 1),
                     i -> string_split(text,' ')[i] || ' ' ||
                          string_split(text,' ')[i+1] || ' ' ||
                          string_split(text,' ')[i+2])) AS s
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        )
        SELECT a.doc_id, b.doc_id,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
        """
    ).fetchall()
    exact_pairs = {(r[0], r[1]): r[2] for r in exact}
    found = {(r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    # precision 1.0: every reported pair is exact-verified ≥ threshold
    assert found <= set(exact_pairs)
    # recall on confidently-similar pairs
    strong = {p for p, j in exact_pairs.items() if j >= 0.6}
    assert strong, "generator should plant near-dups"
    recall = len(found & strong) / len(strong)
    assert recall >= 0.9, f"LSH recall {recall} over {len(strong)} strong pairs"


def test_sim_topk_lsh_recall(spark):
    """LSH is approximate; pin its quality: recall vs the exact
    brute-force top-k must clear 0.5 with the tuned parameters
    (expected ~0.7 on this data — see similarity.py's derivation)."""
    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    bf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_bruteforce"](spark, sf).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_lsh"](spark, sf).collect()
    }
    assert len(bf & lsh) / len(bf) >= 0.5


def test_sim_topk_ivf_recall(spark):
    """IVF with nprobe=4 of 16 cells scans ~25% of the corpus; recall
    vs exact top-k must clear 0.5 (measured ~0.7)."""
    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    bf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_bruteforce"](spark, sf).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_ivf"](spark, sf).collect()
    }
    assert len(bf & ivf) / len(bf) >= 0.5


def test_dedup_clusters_consistency(spark):
    """Cluster labels must be closed under the pair graph: both ends
    of every near-dup pair share a cluster id, and exactly one doc per
    cluster is kept."""
    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    labels = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in registry.QUERIES["dedup_clusters"](spark, sf).collect()
    }
    pairs = registry.QUERIES["dedup_ngram_jaccard"](spark, sf).collect()
    for p in pairs:
        assert labels[p.doc_a][0] == labels[p.doc_b][0]
    clusters = {}
    for doc, (cid, keep) in labels.items():
        clusters.setdefault(cid, []).append(keep)
    for cid, keeps in clusters.items():
        assert sum(keeps) == 1


def test_simhash_banding_is_exact_within_radius(spark):
    """4-band SimHash candidate generation must find EVERY pair with
    hamming distance <= 3 (pigeonhole guarantee) — compare against the
    brute-force all-pairs ground truth at sf0.001."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_simhash_pairs"](spark, sf).collect()
    }
    sigs = registry.QUERIES["dedup_simhash"](spark, sf)
    a = sigs.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    truth = {
        (r.da, r.db)
        for r in a.crossJoin(b)
        .filter("da < db")
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .collect()
    }
    assert got == truth


def test_approx_distinct_accuracy(spark):
    """agg_approx_distinct carries a TOLERANCE oracle: it emits the
    exact distinct count plus a within-5·rsd boolean (5σ because rsd
    is a standard deviation, not a guarantee — the cross-engine gate
    must never flake).  Pin here that on THIS data the tighter 3·rsd
    empirical bound also holds, and the exact anchor matches an
    independent countDistinct."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators import registry
    from datafusion_catalogprovider_glue_spark.tables import load_table

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.01"
    rows = registry.QUERIES["agg_approx_distinct"](spark, sf).collect()
    assert rows and all(r.within_5rsd for r in rows)
    est = {
        r.l_returnflag: r.est
        for r in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("est"))
        .collect()
    }
    li = load_table(spark, sf, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag: r.exact_parts for r in rows} == exact
    # tighter empirical pin: on this data the estimate sits within
    # 3·rsd of exact (the cross-engine gate only asserts 5·rsd)
    for flag, n in exact.items():
        assert abs(est[flag] - n) <= 0.03 * n


def test_asof_nearest_tie_and_direction_semantics(spark):
    # nearest view in EITHER direction; equal distances go to the
    # EARLIER view; a view exactly at the purchase ts wins outright
    import datetime as dt

    from datafusion_catalogprovider_glue_spark.operators.analytics import (
        join_asof_nearest,
    )
    import datafusion_catalogprovider_glue_spark.operators.analytics as mod

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: views at -2m and +1m -> forward one is closer
        (1, t0 - 2 * m, 1, "view", 1.0, None),
        (2, t0 + 1 * m, 1, "view", 2.0, None),
        (3, t0, 1, "purchase", 99.0, None),
        # user 2: views at -1m and +1m (equal distance) -> earlier wins
        (4, t0 - m, 2, "view", 3.0, None),
        (5, t0 + m, 2, "view", 4.0, None),
        (6, t0, 2, "purchase", 50.0, None),
        # user 3: view exactly at purchase ts
        (7, t0, 3, "view", 5.0, None),
        (8, t0, 3, "purchase", 7.0, None),
        (9, t0 + m, 3, "view", 6.0, None),
        # user 4: no views at all -> dropped
        (10, t0, 4, "purchase", 8.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {
            r["event_id"]: r for r in join_asof_nearest(spark, "x").collect()
        }
    finally:
        mod.load_table = orig
    assert set(out) == {3, 6, 8}
    assert out[3]["view_value"] == 2.0          # +1m beats -2m
    assert out[6]["view_value"] == 3.0          # tie -> earlier
    assert out[8]["view_value"] == 5.0 and out[8]["view_ts"] == t0


def test_image_ahash_dedup_recall_and_exactness(spark):
    """multimodal_image_dedup_ahash must (a) find most within-group
    near-dup image pairs despite the per-doc pixel noise, (b) emit
    hamming 0 for pairs whose sampled cells dodge the noise entirely,
    and (c) never pair images with hamming above the radius."""
    from datafusion_catalogprovider_glue_spark.operators import multimodal, registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["multimodal_image_dedup_ahash"](spark, sf).collect()
    assert rows, "no near-dup image pairs found at all"
    n_docs = 500
    same_group = [
        r for r in rows if r.doc_a // multimodal._NEARDUP_GROUP
        == r.doc_b // multimodal._NEARDUP_GROUP
    ]
    # every group of 5 has C(5,2)=10 pairs; banding + noise may drop a
    # few, but the operator exists to catch this class: >= 60% recall
    total_group_pairs = (n_docs // multimodal._NEARDUP_GROUP) * 10
    assert len(same_group) >= 0.6 * total_group_pairs, (
        len(same_group), total_group_pairs
    )
    assert all(r.hamming <= multimodal.AHASH_RADIUS for r in rows)


def test_quantizer_sample_bounded_and_hash_ordered(spark):
    """Pin the FAISS-style training contract: the quantizer sample is
    (a) hard-bounded by the cap — the only thing that touches the
    driver/training stage regardless of corpus size — (b) ordered by
    a hash both engines can compute (md5 of the vec_id string), and
    (c) prefix-stable: a smaller cap yields a prefix of a larger
    cap's sample, which is what makes seeds scale-stable."""
    import hashlib

    from datafusion_catalogprovider_glue_spark.operators import similarity as sim

    e = sim._emb(spark, "/root/testdata/sf0.001").select("vec_id", "v")
    assert sim._KMEANS_SAMPLE_CAP == 65536
    small = [r.vec_id for r in sim._hash_sample(e, cap=20).select("vec_id").collect()]
    big = [r.vec_id for r in sim._hash_sample(e, cap=60).select("vec_id").collect()]
    assert len(small) == 20 and len(big) == 60
    assert big[:20] == small
    # the order is exactly (md5(str(vec_id)), vec_id)
    all_ids = [r.vec_id for r in e.select("vec_id").collect()]
    expect = sorted(all_ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:60]
    assert big == expect
    # seed selection is the sample prefix
    assert sim._sample_seed_ids(sim._hash_sample(e), 16) == expect[:16]


def test_asof_join_tie_and_order_semantics(spark):
    # constructed case: view exactly AT the purchase ts must match
    # (inclusive >=), later views must not, and a purchase with no
    # prior view drops (inner asof semantics)
    import datetime as dt

    from datafusion_catalogprovider_glue_spark.operators.analytics import join_asof
    from datafusion_catalogprovider_glue_spark.tables import load_table as real_load
    import datafusion_catalogprovider_glue_spark.operators.analytics as mod

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view@12:00, purchase@12:00 (tie -> matches), view@12:05 later
        (1, t0, 1, "view", 10.0, None),
        (2, t0, 1, "purchase", 99.0, None),
        (3, t0 + dt.timedelta(minutes=5), 1, "view", 20.0, None),
        # user 2: purchase with no prior view -> dropped
        (4, t0, 2, "purchase", 50.0, None),
        # user 3: two views before purchase -> latest wins
        (5, t0, 3, "view", 1.0, None),
        (6, t0 + dt.timedelta(minutes=1), 3, "view", 2.0, None),
        (7, t0 + dt.timedelta(minutes=2), 3, "purchase", 7.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {r["event_id"]: r for r in join_asof(spark, "ignored").collect()}
    finally:
        mod.load_table = orig
    assert set(out) == {2, 7}
    assert out[2]["view_value"] == 10.0 and out[2]["view_ts"] == t0
    assert out[7]["view_value"] == 2.0


def test_asof_forward_join_tie_and_order_semantics(spark):
    # constructed case for the FORWARD direction: a view exactly AT the
    # purchase ts must match (inclusive <=, DuckDB ASOF p.ts <= v.ts),
    # the EARLIEST at-or-after view wins over later ones, and a
    # purchase with no subsequent view drops (inner asof semantics).
    # Regression for the tie bug where (ts DESC, side DESC) ordered the
    # purchase before an equal-ts view so the tie never matched.
    import datetime as dt

    from datafusion_catalogprovider_glue_spark.operators.analytics import (
        join_asof_forward,
    )
    import datafusion_catalogprovider_glue_spark.operators.analytics as mod

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: purchase@12:00, view@12:00 (tie -> matches), view@12:05 later
        (1, t0, 1, "purchase", 99.0, None),
        (2, t0, 1, "view", 10.0, None),
        (3, t0 + dt.timedelta(minutes=5), 1, "view", 20.0, None),
        # user 2: purchase with no at-or-after view -> dropped
        (4, t0, 2, "purchase", 50.0, None),
        (5, t0 - dt.timedelta(minutes=1), 2, "view", 3.0, None),
        # user 3: two views after purchase -> EARLIEST wins
        (6, t0, 3, "purchase", 7.0, None),
        (7, t0 + dt.timedelta(minutes=1), 3, "view", 1.0, None),
        (8, t0 + dt.timedelta(minutes=2), 3, "view", 2.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {
            r["event_id"]: r for r in join_asof_forward(spark, "ignored").collect()
        }
    finally:
        mod.load_table = orig
    assert set(out) == {1, 6}
    assert out[1]["view_value"] == 10.0 and out[1]["view_ts"] == t0
    assert out[6]["view_value"] == 1.0


def test_approx_percentile_within_rank_error(spark):
    """agg_approx_percentile now carries a TOLERANCE oracle: it emits
    the exact quantile plus a boolean bracketing the GK-sketch value
    between the exact quantiles at q ± 2/accuracy.  Pin that the
    bracket holds on real data and the exact anchors match the
    exact-percentile key row for row."""
    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.01"
    rows = registry.QUERIES["agg_approx_percentile"](spark, sf).collect()
    assert rows and all(r.within_rank_eps for r in rows)
    got = {(r.l_returnflag, r.q): r.exact_value for r in rows}
    exact = {
        (r.l_returnflag, r.q): r.q_value
        for r in registry.QUERIES["agg_percentile"](spark, sf).collect()
    }
    assert got == exact


def test_hll_partitioned_merge_accuracy(spark):
    """The key's hashed gate asserts an 8% envelope (flake-proof sigma
    multiple); pin here that on THIS data the tighter 5% bound holds
    for the merged global estimate and every per-day estimate, and
    that the exact anchors the key emits match countDistinct."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.operators import registry
    from datafusion_catalogprovider_glue_spark.tables import load_table

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.01"
    rows = registry.QUERIES["agg_hll_partitioned_merge"](spark, sf).collect()
    assert rows and all(
        r["daily_within_8pct"] and r["total_within_8pct"] for r in rows
    )
    ev = load_table(spark, sf, "events")
    exact_total = ev.select("user_id").distinct().count()
    assert all(r["exact_total_users"] == exact_total for r in rows)
    # tighter 5% pin on the raw sketch estimates, recomputed directly
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("n"),
    )
    total_est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e")
    ).collect()[0]["e"]
    assert abs(total_est - exact_total) <= 0.05 * exact_total
    for r in daily.select(
        F.hll_sketch_estimate("sketch").alias("e"), "n"
    ).collect():
        assert abs(r["e"] - r["n"]) <= max(0.05 * r["n"], 2)


def test_compaction_collapses_file_count(spark):
    """pipeline_compact_files must actually shrink the file count to
    the size-derived target, not merely return correct values."""
    import os

    from datafusion_catalogprovider_glue_spark.operators import layout

    layout.pipeline_compact_files(spark, SF_CORRECTNESS).collect()
    import hashlib

    h = hashlib.md5(SF_CORRECTNESS.encode()).hexdigest()[:12]
    base = os.path.join("/tmp", f"glue_spark_compact_{h}")
    n_small = len(
        [f for f in os.listdir(os.path.join(base, "small")) if f.endswith(".parquet")]
    )
    n_compacted = len(
        [
            f
            for f in os.listdir(os.path.join(base, "compacted"))
            if f.endswith(".parquet")
        ]
    )
    assert n_small == 32
    assert n_compacted < n_small
    total = sum(
        os.path.getsize(os.path.join(base, "small", f))
        for f in os.listdir(os.path.join(base, "small"))
        if f.endswith(".parquet")
    )
    assert n_compacted == max(1, -(-total // layout.TARGET_FILE_BYTES))


def test_edit_distance_blocking_is_exact(spark):
    """FastSS deletion-neighborhood blocking must find EXACTLY the
    brute-force levenshtein<=1 pairs — blocking is a join strategy,
    not an approximation."""
    from datafusion_catalogprovider_glue_spark.tables import load_table

    blocked = {
        (r.name_a, r.name_b)
        for r in dedup.dedup_edit_distance(spark, SF_SMOKE).collect()
    }
    c = load_table(spark, SF_SMOKE, "customer").select("c_name")
    a, b = c.alias("a"), c.alias("b")
    brute = {
        (r.name_a, r.name_b)
        for r in (
            a.crossJoin(b)
            .filter(F.col("a.c_name") < F.col("b.c_name"))
            .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
            .select(
                F.col("a.c_name").alias("name_a"),
                F.col("b.c_name").alias("name_b"),
            )
        ).collect()
    }
    assert blocked == brute and len(brute) > 0


def test_count_min_sketch_error_bound(spark):
    """CMS estimates are one-sided: never below the true count, and
    within eps*N above it (fixed seed makes this deterministic).  The
    key's hashed gate asserts the looser 2*eps*N envelope; this pin
    recomputes the raw estimates and holds them to the tight bound."""
    from datafusion_catalogprovider_glue_spark.operators import analytics
    from datafusion_catalogprovider_glue_spark.tables import load_table

    rows = analytics.agg_count_min_sketch(spark, SF_CORRECTNESS).collect()
    assert rows and all(r.ge_exact and r.within_2eps for r in rows)
    o = load_table(spark, SF_CORRECTNESS, "orders")
    n = o.count()
    blob = o.agg(
        F.expr(
            f"count_min_sketch(o_custkey, {analytics.CMS_EPS}d, "
            f"{analytics.CMS_CONF}d, {analytics.CMS_SEED})"
        ).alias("s")
    ).collect()[0]["s"]
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    true = {
        r.o_custkey: r.n
        for r in o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exact_emitted = {r.o_custkey: r.exact_orders for r in rows}
    for k in analytics.CMS_PROBE_KEYS:
        t = true.get(k, 0)
        assert exact_emitted[k] == t
        e = int(sketch.estimateCount(jvm.java.lang.Long.valueOf(k)))
        assert t <= e <= t + analytics.CMS_EPS * n + 1


def test_zorder_narrows_both_column_ranges(spark):
    """The z-ordered layout must give BOTH interleaved columns narrow
    per-file ranges (the data-skipping evidence), which a 1-D sort
    cannot: under a partkey-only sort every file spans the full
    suppkey range."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from datafusion_catalogprovider_glue_spark.operators import layout

    layout.scan_zordered(spark, SF_CORRECTNESS).collect()
    h = hashlib.md5(SF_CORRECTNESS.encode()).hexdigest()[:12]
    out = os.path.join("/tmp", f"glue_spark_zorder_{h}", "lineitem_z")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) > 4

    def ranges(col):
        spans = []
        for f in files:
            md = pq.read_metadata(os.path.join(out, f))
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return spans

    import duckdb

    con = duckdb.connect()
    full_pk, full_sk = con.execute(
        f"SELECT MAX(l_partkey)-MIN(l_partkey), MAX(l_suppkey)-MIN(l_suppkey) "
        f"FROM read_parquet('{SF_CORRECTNESS}/lineitem.parquet')"
    ).fetchone()
    pk_spans, sk_spans = ranges("l_partkey"), ranges("l_suppkey")
    # median file covers well under half of each key domain
    assert sorted(pk_spans)[len(pk_spans) // 2] < full_pk / 2
    assert sorted(sk_spans)[len(sk_spans) // 2] < full_sk / 2


def test_sim_topk_pq_recall(spark):
    """PQ/ADC with 4×16 codebooks on normalized vectors: recall vs the
    exact cosine top-k must clear 0.5 (4-byte codes, 64× compression)."""
    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    sf = "/root/testdata/sf0.001"
    bf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_bruteforce"](spark, sf).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["sim_topk_pq"](spark, sf).collect()
    }
    assert len(bf & pq) / len(bf) >= 0.5


def test_strip_boilerplate_short_doc_no_crash(spark):
    """Regression: a doc shorter than the 8-token prefix must neither
    crash the token slice (negative length) nor become a prefix
    candidate (its 'prefix' is the whole doc)."""
    import datafusion_catalogprovider_glue_spark.operators.curation as mod
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        text_strip_boilerplate_prefix,
    )

    rows = [
        # two long docs sharing an 8-token prefix -> it is the top prefix
        (1, "web", "a b c d e f g h tail one", 24),
        (2, "web", "a b c d e f g h tail two", 24),
        # a 3-token doc; with unguarded slice len this row would crash if
        # its text ever matched a top prefix, and with unfiltered counts a
        # corpus of short dupes would elect a sub-8-token "prefix"
        (3, "web", "a b c", 5),
        (4, "web", "a b c", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, n_chars int")
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {r["doc_id"]: r for r in text_strip_boilerplate_prefix(spark, "x").collect()}
    finally:
        mod.load_table = orig
    assert out[1]["stripped"] and out[1]["out_text"] == "tail one"
    assert out[2]["stripped"] and out[2]["out_text"] == "tail two"
    # short dupes are NOT prefix candidates and survive untouched
    assert not out[3]["stripped"] and out[3]["out_text"] == "a b c"
    assert not out[4]["stripped"]


def test_dedup_clusters_long_chain_converges(spark):
    """Pointer-doubling convergence pin: a 60-doc chain (adjacent docs
    share 9 of 11 distinct words -> jaccard 0.818, non-adjacent fall
    below 0.8) has component diameter 59 — plain hash-min would need 59
    rounds and silently miss the 20-round cap; the doubling step must
    converge the whole chain to cluster 0 within the cap."""
    import datafusion_catalogprovider_glue_spark.operators.dedup as mod
    from datafusion_catalogprovider_glue_spark.operators.dedup import dedup_clusters

    n = 60
    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + 10)), "en", "web", 40)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, name: df
    try:
        out = dedup_clusters(spark, "ignored").collect()
    finally:
        mod.load_table = orig
    assert len(out) == n
    assert all(r["cluster_id"] == 0 for r in out), sorted(
        {r["cluster_id"] for r in out}
    )
    keeps = [r["doc_id"] for r in out if r["keep"]]
    assert keeps == [0]


# ---------------------------------------------------------------------------
# curation additions: decontamination / unigram-LM buckets / source mixing
# ---------------------------------------------------------------------------


def test_pipeline_decontaminate_semantics(spark):
    """Benchmark docs are excluded from the output roster; overlap
    counts are exact and the contaminated flag is their >0 shadow; on
    the sf0.01 corpus a nontrivial fraction of train docs actually hit
    the eval slice (the op discriminates, it is not vacuously false)."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        _BENCH_MOD,
        _BENCH_REM,
        pipeline_decontaminate,
    )

    rows = pipeline_decontaminate(spark, SF_CORRECTNESS).collect()
    assert all(r.doc_id % _BENCH_MOD != _BENCH_REM for r in rows)
    assert all((r.n_overlap_ngrams > 0) == r.contaminated for r in rows)
    n_cont = sum(r.contaminated for r in rows)
    assert 0 < n_cont < len(rows)


def test_quality_unigram_lm_buckets(spark):
    """Every doc lands in exactly one bucket; NTILE thirds differ by at
    most one doc; head docs never score below tail docs."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        quality_unigram_lm,
    )

    rows = quality_unigram_lm(spark, SF_CORRECTNESS).collect()
    by = {}
    for r in rows:
        by.setdefault(r.lm_bucket, []).append(r.lm_score)
    assert set(by) == {"head", "middle", "tail"}
    sizes = sorted(len(v) for v in by.values())
    assert sizes[-1] - sizes[0] <= 1
    assert min(by["head"]) >= max(by["tail"])


def test_pipeline_mix_sources_deterministic(spark):
    """Rates are valid probabilities, under-represented (short-char)
    sources get boosted relative to raw share, and the draw is
    deterministic: two runs return the identical row set."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        pipeline_mix_sources,
    )

    a = pipeline_mix_sources(spark, SF_CORRECTNESS)
    rows = a.collect()
    assert rows and all(0.0 < r.sample_rate <= 1.0 for r in rows)
    again = {(r.doc_id, r.source) for r in pipeline_mix_sources(spark, SF_CORRECTNESS).collect()}
    assert {(r.doc_id, r.source) for r in rows} == again
    # broadcast pin: the rates side must broadcast, the corpus must not shuffle
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dedup_stitch_records_finds_every_split(spark):
    """Every >=20-token doc is split into two records sharing an
    8-token overlap; the stitcher must recover the (2d, 2d+1) sibling
    pair for each, and every reported pair must be a true overlap."""
    from datafusion_catalogprovider_glue_spark.operators.dedup import (
        dedup_stitch_records,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table

    pairs = {(r.rec_a, r.rec_b) for r in dedup_stitch_records(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    eligible = [
        r.doc_id
        for r in docs.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
        if r.n >= 20
    ]
    assert eligible
    for d in eligible:
        assert (2 * d, 2 * d + 1) in pairs, f"missing sibling stitch for doc {d}"


def test_pipeline_repeat_upsample_epochs(spark):
    """Short-char sources get more epochs; every doc appears exactly
    n_epochs times with epoch indices 1..n_epochs; cap respected."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        pipeline_repeat_upsample,
    )

    rows = pipeline_repeat_upsample(spark, SF_CORRECTNESS).collect()
    by_doc = {}
    for r in rows:
        assert 1 <= r.n_epochs <= 4
        by_doc.setdefault(r.doc_id, []).append((r.epoch, r.n_epochs))
    spreads = set()
    for doc, es in by_doc.items():
        n = es[0][1]
        assert sorted(e for e, _ in es) == list(range(1, n + 1)), doc
        spreads.add(n)
    assert len(spreads) > 1, "epoch counts must discriminate across sources"


def test_embedding_whiten_standardizes(spark):
    """Whitened coordinates have (quantized-grid) mean ~0 and unit
    variance per dimension; constant dims would pass through."""
    from datafusion_catalogprovider_glue_spark.operators.similarity import (
        embedding_whiten,
    )

    rows = embedding_whiten(spark, SF_SMOKE).collect()
    import collections
    import math

    by = collections.defaultdict(list)
    for r in rows:
        by[r.dim].append(r.wval)
    assert len(by) == 64
    for dim, vals in by.items():
        n = len(vals)
        m = sum(vals) / n
        v = sum(x * x for x in vals) / n - m * m
        assert abs(m) < 1e-9, (dim, m)
        assert abs(v - 1.0) < 1e-6, (dim, v)


def test_events_sessionize_gap_semantics(spark):
    """Sessions never contain an internal gap > 30 min, and consecutive
    sessions of the same user are separated by > 30 min."""
    from datafusion_catalogprovider_glue_spark.operators.funnel import (
        events_sessionize,
    )

    rows = sorted(
        events_sessionize(spark, SF_SMOKE).collect(),
        key=lambda r: (r.user_id, r.session_idx),
    )
    assert rows
    by_user = {}
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for user, sess in by_user.items():
        for a, b in zip(sess, sess[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 1800, (user, a.session_idx, gap)


def test_pipeline_token_budget_prefix(spark):
    """Every source's selection is a budget-respecting prefix of the
    hash order: cumulative chars <= budget, and adding the next doc
    (if any were excluded) would exceed it."""
    from datafusion_catalogprovider_glue_spark.operators.curation import (
        _TOKEN_BUDGET_CHARS,
        pipeline_token_budget,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table
    import hashlib

    kept = pipeline_token_budget(spark, SF_SMOKE).collect()
    assert kept and all(r.cum_chars <= _TOKEN_BUDGET_CHARS for r in kept)
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    by_src = {}
    for r in docs:
        key = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        by_src.setdefault(r.source, []).append((key, r.doc_id, r.n_chars))
    kept_ids = {r.doc_id for r in kept}
    for src, lst in by_src.items():
        lst.sort()
        cum = 0
        for key, doc_id, n in lst:
            cum += n
            assert (cum <= _TOKEN_BUDGET_CHARS) == (doc_id in kept_ids), (src, doc_id)


# ---------------------------------------------------------------------------
# round 2 additions: substring spans, triangle count, k-means, SemDeDup
# ---------------------------------------------------------------------------


def test_substring_spans_cross_doc_only(spark, planted_docs):
    """Every reported span occurs in >= 2 distinct docs, is exactly
    SPAN_TOKENS long, and occurrence count >= doc count.  The planted
    rotations share long base-sentence runs, so the table is
    non-empty by construction."""
    out = dedup.dedup_substring_spans(spark, planted_docs).collect()
    assert out, "rotated docs share 8-token windows; span table must be non-empty"
    for r in out:
        assert r.n_docs >= 2
        assert r.n_occurrences >= r.n_docs
        assert len(r.span.split(" ")) == dedup.SPAN_TOKENS


def test_substring_spans_match_bruteforce(spark, planted_docs):
    """Span table equals a driver-side brute-force recount."""
    rows = spark.read.parquet(planted_docs + "/documents.parquet").collect()
    k = dedup.SPAN_TOKENS
    from collections import defaultdict

    occ = defaultdict(list)
    for r in rows:
        t = r.text.split(" ")
        for i in range(len(t) - k + 1):
            occ[" ".join(t[i:i + k])].append(r.doc_id)
    want = {
        s: (len(set(ds)), len(ds), min(ds))
        for s, ds in occ.items()
        if len(set(ds)) >= 2
    }
    got = {
        r.span: (r.n_docs, r.n_occurrences, r.first_doc)
        for r in dedup.dedup_substring_spans(spark, planted_docs).collect()
    }
    assert got == want


def test_triangle_count_matches_bruteforce(spark):
    """Per-node triangle counts at sf0.001 equal a brute-force count
    over the collected edge set."""
    from datafusion_catalogprovider_glue_spark.operators import graph
    from itertools import combinations

    li = spark.read.parquet(SF_SMOKE + "/lineitem.parquet")
    o = spark.read.parquet(SF_SMOKE + "/orders.parquet")
    c = spark.read.parquet(SF_SMOKE + "/customer.parquet")
    s = spark.read.parquet(SF_SMOKE + "/supplier.parquet")
    edges = {
        (min(r.cn, r.sn), max(r.cn, r.sn))
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .where(F.col("c_nationkey") != F.col("s_nationkey"))
            .select(F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn"))
            .distinct()
            .collect()
        )
    }
    nodes = sorted({n for e in edges for n in e})
    want: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in edges and (y, z) in edges and (x, z) in edges:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in graph.graph_triangle_count(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_embedding_kmeans_total_assignment(spark):
    """Every vector is assigned to exactly one of K clusters, cos is a
    valid similarity, and the assignment is run-to-run deterministic."""
    n_vec = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").count()
    a = similarity.embedding_kmeans(spark, SF_SMOKE).collect()
    assert len(a) == n_vec
    assert {r.cluster for r in a} <= set(range(similarity.KMEANS_K))
    assert all(-1.0 <= r.cos <= 1.0 for r in a)
    b = similarity.embedding_kmeans(spark, SF_SMOKE).collect()
    assert sorted((r.vec_id, r.cluster, r.cos) for r in a) == sorted(
        (r.vec_id, r.cluster, r.cos) for r in b
    )


def test_embedding_kmeans_assignment_is_argmax(spark):
    """Each vector's reported cos is the max over final centroids:
    rebuild the centroids from the assignment and re-verify one round
    of assignment driver-side (64-dim, K=8 — trivially small)."""
    import math

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(SF_SMOKE + "/embeddings.parquet").collect()
    }
    asg = {r.vec_id: (r.cluster, r.cos)
           for r in similarity.embedding_kmeans(spark, SF_SMOKE).collect()}
    # seeds = KMEANS_K smallest vec_ids; replicate assign->update
    seed_ids = sorted(vecs)[: similarity.KMEANS_K]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    cents = {i: vecs[v] for i, v in enumerate(seed_ids)}
    m1 = {
        v: max(range(similarity.KMEANS_K),
               key=lambda c: (cos(vecs[v], cents[c]), -c))
        for v in vecs
    }
    upd = {}
    for c in range(similarity.KMEANS_K):
        members = [vecs[v] for v in vecs if m1[v] == c]
        if members:
            upd[c] = [
                sum(round(m[j] * 1e6) for m in members) / len(members) / 1e6
                for j in range(len(members[0]))
            ]
    for v, (cl, cv) in asg.items():
        best = max(upd, key=lambda c: (cos(vecs[v], upd[c]), -c))
        assert cl == best and cv == cos(vecs[v], upd[best])


def test_dedup_semantic_one_candidate_per_cluster(spark):
    """One top pair per non-singleton cluster, canonical orientation,
    pair really is within-cluster."""
    out = similarity.dedup_semantic(spark, SF_SMOKE).collect()
    asg = {r.vec_id: r.cluster
           for r in similarity.embedding_kmeans(spark, SF_SMOKE).collect()}
    assert len({r.cluster for r in out}) == len(out)  # one row per cluster
    for r in out:
        assert r.keep_id < r.dup_id
        assert asg[r.keep_id] == r.cluster == asg[r.dup_id]


def test_jaccard_prefix_and_blocked_strategies_agree(spark, planted_docs):
    """The PPJoin prefix-filter path (above-cutover strategy) and the
    log-size bucket path (below-cutover) must produce the identical
    pair set — the cost-based switch may never change results.  Also
    pins the prefix bound itself: candidates dropped by the rarest-
    first prefix would surface here as missing pairs."""
    d = dedup._parallelize(
        spark.read.parquet(planted_docs + "/documents.parquet"), "doc_id"
    ).select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(F.split("text", " "), lambda w: F.xxhash64(w))
        ).alias("wset"),
    ).withColumn("n", F.size("wset"))
    t = dedup.JACCARD_SIM_THRESHOLD
    blocked = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup._jaccard_pairs_blocked(d, t).collect()
    }
    prefix = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup._jaccard_pairs_prefix(d, t).collect()
    }
    assert blocked, "planted near-dups must produce pairs"
    assert prefix == blocked


def test_gapfill_grid_complete_and_consistent(spark):
    """The densified grid is exactly |types| x |hours| contiguous
    rows; zero rows appear precisely where raw data has no bucket and
    non-zero rows reproduce the raw aggregation."""
    from collections import Counter
    from datafusion_catalogprovider_glue_spark.operators import funnel
    from datafusion_catalogprovider_glue_spark.tables import load_table

    out = funnel.events_gapfill(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events")
    raw = Counter(
        (r.event_type, r.hour)
        for r in e.select(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        ).collect()
    )
    types = {t for t, _h in raw}
    hours = sorted({h for r in out for h in [r.hour]})
    assert len(out) == len(types) * len(hours)
    assert all(
        (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
    ), "hour grid must be contiguous"
    for r in out:
        assert r.n_events == raw.get((r.event_type, r.hour), 0)
        if r.n_events == 0:
            assert r.sum_value == 0.0


def test_ewma_matches_driver_fold(spark):
    """EWMA equals the exact driver-side fold over the dense series
    for every type (bit-identical, not approximately)."""
    from collections import defaultdict
    from datafusion_catalogprovider_glue_spark.operators import funnel

    dense = defaultdict(dict)
    for r in funnel.events_gapfill(spark, SF_SMOKE).collect():
        dense[r.event_type][r.hour] = float(r.n_events)
    got = {
        (r.event_type, r.hour): r.ewma
        for r in funnel.events_ewma(spark, SF_SMOKE).collect()
    }
    L = funnel.EWMA_LOOKBACK
    for typ, series in dense.items():
        hours = sorted(series)
        for i, h in enumerate(hours):
            xs = [series[hh] for hh in hours[max(0, i - L + 1): i + 1]]
            acc = 0.0
            for x in xs:
                acc = acc * 0.5 + x
            want = round(acc / (2.0 - 0.5 ** (len(xs) - 1)), 6)
            assert got[(typ, h)] == want


def test_tar_write_round_trip(spark):
    """Written shards re-open with stdlib tarfile: every doc appears in
    its assigned shard, doc_id-ordered, payload byte-exact."""
    import hashlib as _hashlib
    import os
    import tarfile

    from datafusion_catalogprovider_glue_spark.operators import multimodal
    from datafusion_catalogprovider_glue_spark.tables import load_table

    manifest = {r.shard: r for r in multimodal.multimodal_tar_write(spark, SF_SMOKE).collect()}
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    out_dir = os.path.join(
        "/tmp",
        f"glue_spark_tarw_{_hashlib.md5(SF_SMOKE.encode()).hexdigest()[:12]}",
    )
    seen = 0
    for shard in manifest:
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        assert os.path.getsize(path) == manifest[shard].archive_bytes
        with tarfile.open(path) as tf:
            ids = []
            for info in tf:
                doc_id = int(info.name.removeprefix("doc_").removesuffix(".txt"))
                assert doc_id % multimodal.TAR_WRITE_SHARDS == shard
                assert tf.extractfile(info).read() == docs[doc_id].encode("utf-8")
                ids.append(doc_id)
                seen += 1
            assert ids == sorted(ids), "members must be doc_id-ordered"
    assert seen == len(docs)


def test_remove_spans_keep_first_semantics(spark, planted_docs):
    """Removal matches a driver-side recount: positions covered by any
    cross-doc span occurrence are cut from every doc EXCEPT the span's
    first doc; the first doc's text survives verbatim unless covered
    by someone ELSE's span."""
    import hashlib as _h
    from collections import defaultdict

    rows = spark.read.parquet(planted_docs + "/documents.parquet").collect()
    k = dedup.SPAN_TOKENS
    first = {}
    occ = defaultdict(list)
    for r in sorted(rows, key=lambda r: r.doc_id):
        t = r.text.split(" ")
        for i in range(len(t) - k + 1):
            s = " ".join(t[i:i + k])
            occ[s].append((r.doc_id, i))
            first.setdefault(s, r.doc_id)
    flagged = {s for s, os_ in occ.items() if len({d for d, _ in os_}) >= 2}
    want = {}
    for r in rows:
        t = r.text.split(" ")
        cov = set()
        for i in range(len(t) - k + 1):
            s = " ".join(t[i:i + k])
            if s in flagged and r.doc_id != first[s]:
                cov.update(range(i, i + k))
        kept = [x for j, x in enumerate(t) if j not in cov]
        want[r.doc_id] = (len(t), len(t) - len(kept),
                          _h.md5(" ".join(kept).encode()).hexdigest())
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.new_md5)
        for r in dedup.dedup_remove_spans(spark, planted_docs).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values()), "planted dups must trigger removal"


def test_skyline_matches_quadratic_dominance(spark):
    """The frontier construction (distinct-price max + running max)
    must emit exactly the rows the textbook NOT-EXISTS dominance
    definition keeps — including equal (price, size) twins, which
    don't dominate each other."""
    from datafusion_catalogprovider_glue_spark.operators import analytics
    from datafusion_catalogprovider_glue_spark.operators.registry import QUERIES

    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in QUERIES["agg_skyline"](spark, SF_SMOKE).collect()
    }
    from datafusion_catalogprovider_glue_spark.tables import load_table

    p = load_table(spark, SF_SMOKE, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    q = p.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = p.join(
        q,
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") > F.col("p_size"))
        ),
        "left_semi",
    )
    want = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in p.subtract(dominated).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_prefilter_no_false_negatives_and_bounded_fpr(spark):
    """Bloom filters never miss a true member: every exact_dup row must be
    bloom_hit.  The false-positive rate over non-dups must sit under
    5x the (k, m, n) analytic bound at this corpus size."""
    import math

    from datafusion_catalogprovider_glue_spark.operators import dedup
    from datafusion_catalogprovider_glue_spark.operators.registry import QUERIES

    rows = QUERIES["dedup_bloom_prefilter"](spark, SF_CORRECTNESS).collect()
    assert len(rows) > 0
    assert all(r.bloom_hit for r in rows if r.exact_dup)
    non_dups = [r for r in rows if not r.exact_dup]
    if non_dups:
        fpr = sum(1 for r in non_dups if r.bloom_hit) / len(non_dups)
        n_base = 400  # sf0.01: 500 docs, 4/5 in the base split
        k, m = dedup._BLOOM_K, dedup._BLOOM_BITS
        bound = (1 - math.exp(-k * n_base / m)) ** k
        assert fpr <= max(5 * bound, 0.02)


def test_kmeans_scale_path_engages_above_exact_max(spark, tmp_path):
    """Above _KMEANS_EXACT_MAX vectors the SemDeDup assignment must
    switch to the adaptive-K sample-trained path: K grows to hold
    cluster size near _KMEANS_TARGET_CLUSTER, every vector gets a
    cluster, and cluster ids cover far more than the exact path's
    fixed 32."""
    import numpy as np

    from datafusion_catalogprovider_glue_spark.operators import similarity as sim

    n = sim._KMEANS_EXACT_MAX + 4000
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)], int(i % 3))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = str(tmp_path / "bigsf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.coalesce(4).write.parquet(f"{sf}/embeddings.parquet")
    asg = sim._kmeans_assign(spark, sf)
    got = asg.groupBy().agg(
        F.countDistinct("cluster").alias("k"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    expected_k = max(sim.KMEANS_K, n // sim._KMEANS_TARGET_CLUSTER)
    assert got.n == n
    assert got.k > sim.KMEANS_K  # adaptive K engaged
    assert got.k <= expected_k
    # average cluster size in the target's neighborhood, not 6000+
    assert got.n / got.k < 4 * sim._KMEANS_TARGET_CLUSTER


def test_active_streaks_gaps_and_islands_semantics(spark):
    # days {1,2,3}, {5,6}, {10} -> longest 3, 3 streaks, 6 active days;
    # multiple events on one day collapse to one active day.
    import datetime as dt

    import datafusion_catalogprovider_glue_spark.operators.funnel as mod
    from datafusion_catalogprovider_glue_spark.operators.funnel import (
        events_active_streaks,
    )

    def ev(i, day, h=9):
        return (i, dt.datetime(2024, 1, day, h, 0, 0), 1, "view", 1.0, None)

    rows = [
        ev(1, 1), ev(2, 1, 18),  # duplicate day
        ev(3, 2), ev(4, 3), ev(5, 5), ev(6, 6), ev(7, 10),
        # user 2: single day
        (8, dt.datetime(2024, 1, 4, 9, 0, 0), 2, "click", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {r.user_id: r for r in events_active_streaks(spark, "x").collect()}
    finally:
        mod.load_table = orig
    assert out[1].n_active_days == 6
    assert out[1].longest_streak == 3
    assert out[1].n_streaks == 3
    assert out[2].n_active_days == 1 and out[2].longest_streak == 1


def test_ab_cuped_matches_numpy_reference(spark):
    # run on the real sf0.001 events and reproduce theta / adjusted
    # means / z with a plain numpy computation over per-user (x, y)
    import numpy as np

    from datafusion_catalogprovider_glue_spark.operators import registry
    from datafusion_catalogprovider_glue_spark.tables import load_table

    registry.load_all_operator_modules()
    row = registry.QUERIES["events_ab_cuped"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    pdf = ev.toPandas()
    import hashlib

    per = {}
    for _, r in pdf.iterrows():
        u = int(r.user_id)
        x, y = per.get(u, (0, 0.0))
        if r.event_type == "view":
            x += 1
        if r.event_type == "purchase":
            y += round(float(r.value), 2)
        per[u] = (x, y)
    users = sorted(per)
    x = np.array([per[u][0] for u in users], dtype=float)
    y = np.array([round(per[u][1], 2) for u in users], dtype=float)
    arm_a = np.array(
        [hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567" for u in users]
    )
    theta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    adj = y - theta * (x - x.mean())
    a, b = adj[arm_a], adj[~arm_a]
    assert row.n_a == arm_a.sum() and row.n_b == (~arm_a).sum()
    assert abs(row.theta - theta) < 1e-4
    assert abs(row.mean_adj_a - a.mean()) < 1e-4
    assert abs(row.mean_adj_b - b.mean()) < 1e-4
    z = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert abs(row.z_cuped - z) < 1e-3
    # (no variance-reduction assert: CUPED's var(adj) <= var(raw)
    # guarantee is asymptotic — with 3 users per arm at sf0.001 the
    # sample variance can legitimately tick up)


def test_ks_test_identical_and_disjoint_distributions(spark):
    import datetime as dt

    import datafusion_catalogprovider_glue_spark.operators.funnel as mod
    from datafusion_catalogprovider_glue_spark.operators.funnel import (
        events_ks_test,
    )
    import hashlib

    # find user ids hashing to each arm
    arm_of = lambda u: (
        "A" if hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567" else "B"
    )
    a_users = [u for u in range(1, 200) if arm_of(u) == "A"][:3]
    b_users = [u for u in range(1, 200) if arm_of(u) == "B"][:3]
    t0 = dt.datetime(2024, 1, 1)
    # identical per-user purchase totals in both arms -> D = 0
    rows = []
    for i, (ua, ub) in enumerate(zip(a_users, b_users)):
        v = float(10 * (i + 1))
        rows.append((2 * i, t0, ua, "purchase", v, None))
        rows.append((2 * i + 1, t0, ub, "purchase", v, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        r = events_ks_test(spark, "x").collect()[0]
        assert (r.n_a, r.n_b, r.d_num, r.d_stat) == (3, 3, 0, 0.0)
        # disjoint supports -> D = 1
        rows2 = [
            (i, t0, u, "purchase", 5.0, None) for i, u in enumerate(a_users)
        ] + [
            (10 + i, t0, u, "purchase", 50.0, None)
            for i, u in enumerate(b_users)
        ]
        df2 = spark.createDataFrame(
            rows2,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        mod.load_table = lambda s, d, n: df2
        r2 = events_ks_test(spark, "x").collect()[0]
        assert r2.d_stat == 1.0 and r2.d_num == 9
    finally:
        mod.load_table = orig


def test_interval_overlap_semantics(spark):
    # constructed sessions: overlapping, touching-at-endpoint
    # (inclusive -> overlap_us 0), and disjoint must not join.
    import datetime as dt

    import datafusion_catalogprovider_glue_spark.operators.analytics as mod
    from datafusion_catalogprovider_glue_spark.operators.analytics import (
        join_interval_overlap,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(minutes=m)
    rows = [
        # user 1 browse session [12:00, 12:10]; purchases at 12:05 ->
        # overlap, and at 13:30 (own session) -> disjoint
        (1, t(0), 1, "view", 1.0, None),
        (2, t(10), 1, "click", 1.0, None),
        (3, t(5), 1, "purchase", 9.0, None),
        (4, t(90), 1, "purchase", 9.0, None),
        # user 2: purchase session exactly AT browse end -> touching
        (5, t(0), 2, "view", 1.0, None),
        (6, t(0 + 7), 2, "purchase", 9.0, None),
    ]
    # user 2 browse = [12:00,12:00] (one view); purchase at 12:07 is
    # within 30min of nothing browse-side... adjust: purchase session
    # [12:07,12:07] does NOT overlap [12:00,12:00]; touching case via
    # user 3 below
    rows += [
        (7, t(0), 3, "view", 1.0, None),
        (8, t(0), 3, "purchase", 9.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = join_interval_overlap(spark, "x").collect()
    finally:
        mod.load_table = orig
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    # user 1: exactly one overlapping pair (12:05 purchase)
    assert len(by_user[1]) == 1
    assert by_user[1][0].overlap_us == 0  # point purchase inside browse
    # user 2: disjoint -> no rows
    assert 2 not in by_user
    # user 3: touching at the same instant -> inclusive join, overlap 0
    assert len(by_user[3]) == 1 and by_user[3][0].overlap_us == 0


def test_asof_tolerance_drops_stale_matches(spark):
    import datetime as dt

    import datafusion_catalogprovider_glue_spark.operators.analytics as mod
    from datafusion_catalogprovider_glue_spark.operators.analytics import (
        join_asof_tolerance,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view 30min before purchase -> kept
        (1, t0, 1, "view", 10.0, None),
        (2, t0 + dt.timedelta(minutes=30), 1, "purchase", 99.0, None),
        # user 2: view 2h before purchase -> asof matches, tolerance drops
        (3, t0, 2, "view", 20.0, None),
        (4, t0 + dt.timedelta(hours=2), 2, "purchase", 50.0, None),
        # user 3: view exactly 1h before -> boundary kept (<=)
        (5, t0, 3, "view", 30.0, None),
        (6, t0 + dt.timedelta(hours=1), 3, "purchase", 70.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = mod.load_table
    mod.load_table = lambda s, d, n: df
    try:
        out = {r.event_id: r for r in join_asof_tolerance(spark, "x").collect()}
    finally:
        mod.load_table = orig
    assert set(out) == {2, 6}
    assert out[2].view_value == 10.0
    assert out[6].view_value == 30.0


def test_parquet_bloom_bytes_present_and_sorted(spark):
    """The bloom-layout rewrite must (a) actually embed bloom-filter
    bytes (pinned by size delta against an identical bloom-less
    write — pyarrow 16 doesn't expose bloom offsets) and (b) sort by
    the key so footer min/max ranges are file-disjoint."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    from datafusion_catalogprovider_glue_spark.operators import layout

    layout.scan_parquet_bloom(spark, SF_CORRECTNESS).collect()
    h = hashlib.md5(SF_CORRECTNESS.encode()).hexdigest()[:12]
    out = os.path.join("/tmp", f"glue_spark_bloom_{h}", "lineitem_bloom")
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files) >= 8

    # same rows, same layout, NO bloom option → strictly smaller files
    plain = out + "_nobloom"
    shutil.rmtree(plain, ignore_errors=True)
    (
        spark.read.parquet(out)
        .repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(plain)
    )
    bloom_bytes = sum(
        os.path.getsize(os.path.join(out, f)) for f in files
    )
    plain_bytes = sum(
        os.path.getsize(os.path.join(plain, f))
        for f in os.listdir(plain)
        if f.endswith(".parquet")
    )
    assert bloom_bytes > plain_bytes * 1.01, (bloom_bytes, plain_bytes)

    # range-sorted: per-file [min,max] on l_orderkey barely overlap —
    # a point probe hits ~one file by stats alone; bloom covers the
    # within-range misses
    spans = []
    for f in files:
        md = pq.read_metadata(os.path.join(out, f))
        idx = md.schema.names.index("l_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    overlaps = sum(
        1 for (a, b), (c, d) in zip(spans, spans[1:]) if c < b
    )
    assert overlaps <= 1, spans
    shutil.rmtree(plain)
