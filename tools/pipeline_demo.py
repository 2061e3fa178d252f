"""End-to-end training-data pipeline demo — the canonical composition
of this library's operator families into the data-prep DAG the build
brief describes, runnable at any SF:

    quality/repetition/language signals  (operators/text.py)
      -> heuristic filter
    exact + MinHash-LSH near-dup removal  (dedup.py + components.py)
      -> connected-component keep list
    benchmark decontamination             (decontaminate.py)
    KN-perplexity scoring + per-language
      sketch-derived head/middle/tail     (lm_score.py + dds)
    leakage-safe train/test split         (components.py)
    weighted per-source sampling          (sampling.py)
    token sequence packing                (packing.py)

Each stage is the library's public operator; nothing here is bespoke.
Prints ONE JSON summary line and (optionally) writes the surviving
split tables as parquet.

Usage: python tools/pipeline_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def run_pipeline(spark, sf_dir: str, out_dir: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from prefix_filter_spark.operators.components import (
        connected_components,
        leakage_safe_split,
    )
    from prefix_filter_spark.operators.decontaminate import contaminated_docs
    from prefix_filter_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from prefix_filter_spark.operators.lm_score import (
        kn_perplexity,
        perplexity_cutoffs_by_group,
        train_kn_counts,
    )
    from prefix_filter_spark.operators.packing import pack_assignments
    from prefix_filter_spark.operators.sampling import (
        weighted_sample_per_stratum,
    )
    from prefix_filter_spark.operators.text import quality_score, repetition_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n0 = docs.count()

    # 1. heuristic quality filter (map-only signals)
    q = quality_score(docs).select("doc_id", "quality")
    rep = repetition_scores(docs).select("doc_id", "dup_3gram_frac")
    keep_ids = (
        q.join(rep, "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("dup_3gram_frac") <= 0.9))
        .select("doc_id")
    )
    stage1 = docs.join(keep_ids, "doc_id", "left_semi").cache()
    n1 = stage1.count()

    # 2. dedup: exact groups + LSH near-dup pairs -> components -> keep
    # the component minimum
    exact = (
        exact_duplicates(stage1)
        .select(F.col("keep_doc_id").alias("d1"), F.explode("members").alias("d2"))
        .where(F.col("d1") != F.col("d2"))
    )
    near = minhash_lsh_pairs(stage1).select("d1", "d2")
    # cache the edge set: it feeds BOTH this CC pass and the
    # leakage-safe split below (which runs its own CC), and uncached it
    # would re-run the whole LSH candidate pipeline each time
    edges = exact.unionByName(near).cache()
    comp = connected_components(edges)
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    stage2 = stage1.join(drop, "doc_id", "left_anti").cache()
    n2 = stage2.count()

    # 3. decontaminate against a held-out "benchmark" slice
    bench = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    contaminated = contaminated_docs(
        spark, stage2.select("doc_id", "text"), bench, min_hits=8
    ).select("doc_id")
    stage3 = stage2.join(contaminated, "doc_id", "left_anti").cache()
    n3 = stage3.count()

    # 4. KN perplexity + per-language tertile buckets (sketch cutoffs)
    model = train_kn_counts(docs.where(F.col("lang") == "en"))
    scored = kn_perplexity(stage3, model).join(
        stage3.select("doc_id", "lang", "source"), "doc_id"
    ).cache()  # feeds the cutoffs sketch pass AND the bucketing below
    cuts = perplexity_cutoffs_by_group(scored, "lang")
    if not cuts:
        return {"input_docs": n0, "after_quality": n1, "after_dedup": n2,
                "after_decontam": n3, "sampled": 0, "packed_docs": 0,
                "n_packs": 0, "langs": []}
    # ONE nested when-chain over one scored plan (a per-language union
    # of filtered copies would re-run scoring once per language)
    c0 = F.lit(None).cast("double")
    c1 = F.lit(None).cast("double")
    for lang, (a, b) in sorted(cuts.items()):
        c0 = F.when(F.col("lang") == lang, F.lit(a)).otherwise(c0)
        c1 = F.when(F.col("lang") == lang, F.lit(b)).otherwise(c1)
    bucketed = scored.withColumn(
        "ppl_bucket",
        F.when(F.col("perplexity") < c0, F.lit("head"))
        .when(F.col("perplexity") < c1, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    head_mid = bucketed.where(F.col("ppl_bucket") != "tail").select(
        "doc_id", "source", "perplexity"
    )

    # 5. leakage-safe split over the SAME cached edge set
    split = leakage_safe_split(edges, stage3.select("doc_id"), test_frac=0.1)
    train_ids = split.where(F.col("split") == "train").select("doc_id")

    # 6. weighted mixture: 70% of each source's surviving docs,
    # favoring low perplexity
    survivors = head_mid.join(train_ids, "doc_id", "left_semi")
    per_source = {
        r["source"]: max(1, int(r["c"] * 0.7))
        for r in survivors.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    sampled = weighted_sample_per_stratum(
        survivors,
        per_source,
        F.lit(1.0) / (F.col("perplexity") + F.lit(1.0)),
        "source",
        "doc_id",
        seed=13,
    )

    # 7. pack token sequences into fixed budgets
    from prefix_filter_spark.sources.tokenizer import words_col

    sized = sampled.join(
        docs.select("doc_id", F.size(words_col("text")).alias("n_tok")),
        "doc_id",
    )
    packed = pack_assignments(sized, "doc_id", "n_tok", budget=2048)
    n_packed = packed.count()
    n_packs = packed.select("pack_id").distinct().count()

    # 8. map-side vocab enrichment (operators/map_enrich.py): tag every
    # token of the packed training docs with its corpus document-
    # frequency bucket via a broadcast retrieval map — the token stream
    # (the "fact") never shuffles; guard=False because the vocab is
    # built FROM this corpus, so coverage holds by construction
    from prefix_filter_spark.operators.map_enrich import (
        build_enrichment_map,
        enrich,
    )

    tok_stream = stage3.join(packed.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", F.explode(words_col("text")).alias("word")
    )
    vocab = (
        stage3.select(F.explode(words_col("text")).alias("word"), "doc_id")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").alias("df"))
        .select("word", F.least(F.floor(F.log2("df")), F.lit(15)).alias("bucket"))
    )
    em = build_enrichment_map(vocab, "word", "bucket", seed=29, guard=False)
    tagged = enrich(spark, tok_stream, "word", em, "df_bucket", udf_prefix="demo_df")
    rare_frac = tagged.agg(
        F.avg((F.col("df_bucket") == 0).cast("double")).alias("f")
    ).collect()[0]["f"]

    if out_dir:
        packed.write.mode("overwrite").parquet(f"{out_dir}/train_packed.parquet")
        split.write.mode("overwrite").parquet(f"{out_dir}/split.parquet")

    for df in (docs, stage1, stage2, stage3, edges, scored):
        df.unpersist()
    return {
        "input_docs": n0,
        "after_quality": n1,
        "after_dedup": n2,
        "after_decontam": n3,
        # every sampled doc survives the inner join into packing, so
        # the packed count IS the sample count (counting `sampled`
        # here would re-run the pipeline after the unpersists above)
        "sampled": n_packed,
        "packed_docs": n_packed,
        "n_packs": n_packs,
        "rare_token_frac": round(rare_frac, 6) if rare_frac is not None else None,
        "langs": sorted(cuts),
    }


def main() -> int:
    from prefix_filter_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="pipeline-demo")
    summary = run_pipeline(spark, sf_dir, out_dir)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
