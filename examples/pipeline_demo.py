"""End-to-end LLM training-data pipeline demo: the curation ops of
SURVEY.md §2-D composed into ONE dataflow, the way a production corpus
build chains them.

    raw documents
      → normalize + quality gate     (Gopher heuristics, scan-stage)
      → exact dedup                  (fingerprint keep-min)
      → near-dup dedup               (exact Jaccard pairs → drop dups)
      → benchmark decontamination    (n-gram overlap vs eval slice)
      → quality bucketing            (unigram-LM terciles)
      → temperature-weighted mixing  (per-source accept rates)
      → chunk + pack                 (2048-token training windows)

Every stage is one of the registered gate operators (imported, not
reimplemented), so everything printed here is hash-verified against
DuckDB elsewhere.  The point of this script is the COMPOSITION: each
stage consumes the previous stage's DataFrame lazily — Catalyst fuses
the row-local stages into shared scans, and only the dedup/mix
aggregation boundaries materialize shuffles.

Run:  python examples/pipeline_demo.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datafusion_catalogprovider_glue_spark.operators import registry
    from datafusion_catalogprovider_glue_spark.session import get_spark

    registry.load_all_operator_modules()
    q = registry.QUERIES
    spark = get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"[0] raw corpus: {n0} docs")

    # 1. quality gate: keep docs passing ALL Gopher heuristic flags
    gate = q["quality_gopher_filters"](spark, sf_dir)
    keep_q = gate.filter(F.col("keep")).select("doc_id")
    n1 = keep_q.count()
    print(f"[1] gopher quality gate: {n1} kept ({n0 - n1} dropped)")

    # 2. exact dedup: one survivor per content fingerprint
    fp = q["dedup_fingerprint"](spark, sf_dir).select(
        F.col("keep_doc").alias("doc_id")
    )
    survivors = keep_q.join(fp, "doc_id")
    n2 = survivors.count()
    print(f"[2] exact dedup: {n2} kept")

    # 3. near-dup removal: drop the higher doc_id of each Jaccard pair
    pairs = q["dedup_ngram_jaccard"](spark, sf_dir)
    dups = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = survivors.join(dups, "doc_id", "left_anti")
    n3 = survivors.count()
    print(f"[3] near-dup removal: {n3} kept")

    # 4. decontamination: drop train docs overlapping the eval slice
    contam = q["pipeline_decontaminate"](spark, sf_dir)
    clean = survivors.join(
        contam.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n4 = clean.count()
    print(f"[4] decontamination: {n4} kept")

    # 5. quality buckets: keep head+middle terciles (CCNet staging)
    lm = q["quality_unigram_lm"](spark, sf_dir)
    staged = clean.join(
        lm.filter(F.col("lm_bucket") != "tail").select("doc_id"), "doc_id"
    )
    n5 = staged.count()
    print(f"[5] unigram-LM staging (head+middle): {n5} kept")

    # 6. temperature-weighted source mixing over the survivors
    mixed = q["pipeline_mix_sources"](spark, sf_dir).join(staged, "doc_id")
    n6 = mixed.count()
    print(f"[6] temperature mixing: {n6} sampled")

    # 7. chunk + pack into training windows
    packed = q["pipeline_pack_sequences"](spark, sf_dir)
    n7 = packed.agg(F.countDistinct("pack_id")).collect()[0][0]
    print(f"[7] packed training windows: {n7} packs")

    print("pipeline complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
