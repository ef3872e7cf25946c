"""BPE merge training (operators/bpe.py): the distributed merge loop
must agree with a straightforward in-memory reference implementation
of Sennrich-2016 greedy BPE on a controlled corpus — an independent
check beside the DuckDB oracle (which shares the string-replace merge
representation; this reference does not)."""

from __future__ import annotations

from collections import Counter

from datafusion_catalogprovider_glue_spark.operators import bpe


def _reference_bpe(word_counts: dict[str, int], k: int):
    """Plain-Python greedy BPE: symbols as tuples, left-to-right
    merge application, ties broken lexicographically."""
    seqs = {w: tuple(w) for w in word_counts}
    merges = []
    for idx in range(1, k + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += word_counts[w]
        if not pairs:
            break
        (pa, pb), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((idx, pa, pb, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def test_bpe_matches_reference_implementation(spark, tmp_path):
    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["new"] * 4 + ["west"] * 2
    )
    rows = [(i, " ".join(corpus), "en", "t", 1) for i in range(1)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = tmp_path / "bpe"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))

    got = [
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe.pipeline_bpe_train(spark, str(d))
        .orderBy("merge_idx")
        .collect()
    ]
    want = _reference_bpe(Counter(corpus), bpe.BPE_MERGES)
    assert got == want


def test_bpe_greedy_overlap_semantics(spark, tmp_path):
    """'aaaa' under merge (a,a) must become (aa)(aa) — left-to-right
    non-overlapping, the property the string-replace representation
    has to preserve."""
    rows = [(0, "aaaa aaaa aaaa", "en", "t", 1)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = tmp_path / "bpe2"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = [
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe.pipeline_bpe_train(spark, str(d))
        .orderBy("merge_idx")
        .collect()
    ]
    want = _reference_bpe({"aaaa": 3}, bpe.BPE_MERGES)
    assert got == want
    # round 1 merges (a,a) seen 3 times per word = 9; round 2 (aa,aa)
    assert got[0][:3] == (1, "a", "a") and got[0][3] == 9
    assert got[1][:3] == (2, "aa", "aa")
