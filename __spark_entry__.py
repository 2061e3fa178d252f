"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 /
the training-pipeline brief; ``oracle_sql()`` gives the DuckDB-runnable
equivalent. Sketch queries (approximate by nature) return the exact
quantities both engines can compute *plus* self-asserting bound checks
(zero false negatives, estimate-within-published-bound booleans) — the
honest way to gate approximate operators on a value-hash comparison.

Column names and rounding are aligned pairwise: every float is rounded
on both sides; sums over doubles round at 4dp (1e-9 relative FP noise),
scalars at 6dp.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DuckDB mirror of sources.tokenizer.words_col
_DUCK_WORDS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
_SHINGLE_SQL = f"""
    WITH w AS (SELECT doc_id, {_DUCK_WORDS} ws FROM documents),
    sh AS (SELECT DISTINCT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]) AS s
           FROM w),
    cnts AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) shared
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT da AS d1, db AS d2, shared, ca.n AS n1, cb.n AS n2,
           round(shared::double / (ca.n + cb.n - shared), 6) AS jaccard
    FROM pairs JOIN cnts ca ON ca.doc_id = da JOIN cnts cb ON cb.doc_id = db
    WHERE shared::double / (ca.n + cb.n - shared) >= 0.8
"""


_CHAIN_CC_SQL = f"""
            WITH RECURSIVE
            base AS (SELECT doc_id FROM documents WHERE doc_id % 17 = 0),
            pa AS (SELECT base.doc_id + 1000000 AS doc_id,
                     array_to_string(
                       ['w' || base.doc_id || 'x' || i
                        for i in range(0, 60)], ' ') AS text
                   FROM base),
            pb AS (SELECT base.doc_id + 2000000 AS doc_id,
                     array_to_string(
                       [CASE WHEN i < 4 THEN 'b' || base.doc_id || 'x' || i
                             ELSE 'w' || base.doc_id || 'x' || i END
                        for i in range(0, 60)], ' ') AS text
                   FROM base),
            pc AS (SELECT base.doc_id + 3000000 AS doc_id,
                     array_to_string(
                       [CASE WHEN i < 4 THEN 'b' || base.doc_id || 'x' || i
                             WHEN i < 8 THEN 'c' || base.doc_id || 'x' || i
                             ELSE 'w' || base.doc_id || 'x' || i END
                        for i in range(0, 60)], ' ') AS text
                   FROM base),
            corpus AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT * FROM pa
                       UNION ALL SELECT * FROM pb
                       UNION ALL SELECT * FROM pc),
            w AS (SELECT doc_id, {_DUCK_WORDS} ws FROM corpus),
            sh AS (SELECT DISTINCT doc_id,
                     unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
                   FROM w),
            cnts AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            p AS (SELECT a.doc_id da, b.doc_id db, count(*) shared
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            e0 AS (SELECT da u, db v
                   FROM p JOIN cnts ca ON ca.doc_id = da
                          JOIN cnts cb ON cb.doc_id = db
                   WHERE shared::double / (ca.n + cb.n - shared) >= 0.8),
            edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
            r AS (SELECT u AS node, u AS comp
                  FROM (SELECT DISTINCT u FROM edges)
                  UNION
                  SELECT e.v AS node, r.comp
                  FROM r JOIN edges e ON e.u = r.node
                  WHERE r.comp < e.v)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pii_oracle_sql() -> str:
    """PII oracle — the regex constants are interpolated from
    operators/pii.py so the two engines can never drift apart."""
    from prefix_filter_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0
                      THEN text || ' contact u' || doc_id
                           || '@example.com or 10.0.' || (doc_id % 200)
                           || '.7 call 555-123-4567'
                      ELSE text END AS text
          FROM documents),
        src AS (SELECT doc_id, text AS t FROM planted)
        SELECT doc_id,
               len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ipv4,
               len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone,
               (len(regexp_extract_all(t, '{EMAIL_RE}'))
                + len(regexp_extract_all(t, '{IPV4_RE}'))
                + len(regexp_extract_all(t, '{PHONE_RE}'))) > 0 AS has_pii,
               md5(regexp_replace(regexp_replace(regexp_replace(
                     t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{IPV4_RE}', '<IP>', 'g'),
                     '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
        FROM src ORDER BY doc_id
    """


def _bpe_train_oracle_sql(n_merges: int = 10) -> str:
    """Pure-SQL BPE training oracle (closes the round-3 'no_oracle'
    gap): the merge table is a pure function of the word-count table,
    so unroll ``n_merges`` rounds as chained CTEs.

    Representation trick: each word is a string of sentinel-wrapped
    symbols (``\\x1f a \\x1f\\x1f b \\x1f …``), so applying merge (a,b) is
    ``replace(ws, S||a||S||S||b||S, S||a||b||S)`` — SQL replace scans
    left-to-right over non-overlapping matches, which is EXACTLY the
    greedy i+=2 walk of the Spark rewrite and the Sennrich reference.
    Argmax tie-break (total, a, b) mirrors Spark's struct max via
    ORDER BY total DESC, a DESC, b DESC LIMIT 1; a round whose best
    pair has total < 2 yields an empty single-row CTE, and the LEFT
    JOIN + coalesce makes every later round a no-op — the same early
    stop as train_bpe."""
    S = "e'\\x1F'"
    SS = f"{S} || {S}"
    parts = [
        f"""
        WITH wc AS (
          SELECT w, count(*) AS cnt
          FROM (SELECT unnest({_DUCK_WORDS}) AS w FROM documents)
          GROUP BY w),
        v0 AS (
          SELECT cnt,
                 {S} || array_to_string(
                          list_transform(range(1, length(w) + 1),
                                         i -> substring(w, i, 1)),
                          {SS})
                     || {S} || {S} || '</w>' || {S} AS ws
          FROM wc)"""
    ]
    for k in range(n_merges):
        parts.append(
            f"""
        p{k} AS (
          SELECT pr.a AS a, pr.b AS b, sum(cnt_) AS total FROM (
            SELECT cnt AS cnt_,
                   unnest(list_transform(range(1, len(syms)),
                          i -> struct_pack(a := syms[i], b := syms[i+1]))) AS pr
            FROM (SELECT cnt,
                         string_split(substring(ws, 2, length(ws) - 2), {SS}) AS syms
                  FROM v{k}))
          GROUP BY 1, 2),
        m{k} AS (
          SELECT a, b, total FROM p{k} WHERE total >= 2
          ORDER BY total DESC, a DESC, b DESC LIMIT 1),
        v{k + 1} AS (
          SELECT v.cnt,
                 coalesce(replace(v.ws,
                                  {S} || m.a || {SS} || m.b || {S},
                                  {S} || m.a || m.b || {S}),
                          v.ws) AS ws
          FROM v{k} v LEFT JOIN m{k} m ON true)"""
        )
        parts.append(
            f"""
        r{k} AS (SELECT {k} AS rank, a AS "left", b AS "right",
                        total::BIGINT AS total, true AS ref_match
                 FROM m{k})"""
        )
    union = "\n            UNION ALL ".join(
        f"SELECT * FROM r{k}" for k in range(n_merges)
    )
    parts.append(f"\n        SELECT * FROM ({union}) ORDER BY rank")
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


# --------------------------------------------------------------------------
# relational / pipeline queries (exact, strong oracles)
# --------------------------------------------------------------------------
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return rev.orderBy(F.desc("revenue"), "c_custkey").limit(10)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP_NTZ: cast via timestamp (session TZ pinned UTC) to epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    hour = (epoch / 3600).cast("long") % 24
    return (
        ev.groupBy("event_type", hour.alias("hour_utc"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type", "hour_utc")
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return (
        marked.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 6).alias("avg_k"),
            F.sum(k).alias("sum_k"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def q_lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang", "source")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace AND BPE-ish-regex token stats in ONE per-source gate
    (merged round-4 session-9 from the separate token_stats /
    bpe_token_stats rows to free a driver slot for nb_quality; same
    aggregations, joined on source)."""
    from prefix_filter_spark.operators.text import bpe_token_stats, token_stats

    docs = _docs(spark, sf_dir)
    ws = (
        token_stats(docs)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.round(F.avg("n_words"), 6).alias("avg_words"),
            F.round(F.avg("chars_per_word"), 6).alias("avg_cpw"),
        )
    )
    bpe = (
        bpe_token_stats(docs)
        .groupBy("source")
        .agg(
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg(F.col("n_bpe_tokens") / F.col("n_words")), 6).alias(
                "bpe_per_word"
            ),
        )
    )
    return ws.join(bpe, "source").orderBy("source")


def q_tokenized_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint table shape (doc_id, tokens array<int32>, n_tok,
    source) with the north rule's per-row token-array invariant made a
    gate: per-source doc and token totals are DuckDB-mirrorable
    (n_tok == word count by construction), and the booleans assert,
    over EVERY row, that token ids stay inside the vocab and that two
    independent tokenization runs produce bit-identical arrays
    (deterministic, engine-order-free)."""
    from prefix_filter_spark.sources.tokenizer import tokenize_documents

    docs = _docs(spark, sf_dir)
    a = tokenize_documents(docs).alias("a")
    b = tokenize_documents(docs).alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"))
    checks = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("a.tokens") == F.col("b.tokens")).cast("long")).alias("same"),
        F.min(F.array_min("a.tokens")).alias("tmin"),
        F.max(F.array_max("a.tokens")).alias("tmax"),
    ).collect()[0]
    arrays_identical = bool(checks["n"] > 0 and checks["same"] == checks["n"])
    in_vocab = bool(
        checks["tmin"] is None
        or (checks["tmin"] >= 0 and checks["tmax"] < 50_000)
    )
    return (
        tokenize_documents(docs)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.lit(arrays_identical).alias("arrays_identical"),
            F.lit(in_vocab).alias("ids_in_vocab"),
        )
        .orderBy("source")
    )


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/fastText-style quality classifier gate (round-4): train the
    hashed-token Naive Bayes model on lang=='en' as the positive class
    (the CCNet recipe: 'looks like the good corpus'), score every doc.
    score_fp is an exact integer (fixed-point llr sum — see
    operators/classifier.py determinism notes), so DuckDB reproduces
    the whole train+score pipeline bit-for-bit; prob is rounded to 4
    decimals per the lm_perplexity libm-boundary policy."""
    from prefix_filter_spark.operators.classifier import nb_score, nb_train

    docs = _docs(spark, sf_dir)
    model = nb_train(docs, F.col("lang") == "en")
    return (
        nb_score(docs, model)
        .select("doc_id", "n_feats", "score_fp", F.round("prob", 4).alias("prob"))
        .orderBy("doc_id")
    )


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.text import winnow_fingerprints

    fp = winnow_fingerprints(_docs(spark, sf_dir))
    ex = fp.select("source", F.explode("fingerprints").alias("f"))
    return (
        ex.groupBy("source")
        .agg(
            F.count("*").alias("total_fps"),
            F.countDistinct("f").alias("distinct_fps"),
        )
        .orderBy("source")
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.text import quality_score

    return (
        quality_score(_docs(spark, sf_dir))
        .groupBy("source")
        .agg(
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.round(F.avg("mean_word_len"), 6).alias("avg_word_len"),
        )
        .orderBy("source")
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.text import doc_fingerprint

    fp = doc_fingerprint(_docs(spark, sf_dir))
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_distinct"),
    )


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select(
        "fingerprint", "group_size", "keep_doc_id"
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)
    return out.select(
        "d1", "d2", "shared", "n1", "n2", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("d1", "d2")


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8)
    return out.select(
        "d1", "d2", "shared", "n1", "n2", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("d1", "d2")


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=3)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# sketch queries (exact columns both engines + self-asserted bounds)
# --------------------------------------------------------------------------
def _word_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sources.tokenizer import words_col

    return _docs(spark, sf_dir).select(F.explode(words_col("text")).alias("word"))


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import bloom

    return _membership_panel(
        spark, sf_dir, bloom.build_bloom, bloom.ShardedBloom,
        lambda n: bloom.BloomConfig(n_capacity=n, bits_per_key=12, num_shards=8, seed=42),
        # cfg-derived bound: closed-form FPR x 1.5 sampling margin
        lambda cfg: cfg.theoretical_fpr() * 1.5 + 1e-4,
        "zz",
    )


def q_prefix_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import prefix_filter as pfm

    return _membership_panel(
        spark, sf_dir, pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
        lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42),
        0.006,  # paper-ballpark bound at load<=0.95
        "qq",
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import hll

    words = _word_stream(spark, sf_dir)
    cfg = hll.HllConfig(p=14, seed=42)
    est = hll.distinct_estimate(words, F.xxhash64("word", F.lit(1)), cfg)
    exact = words.select("word").distinct().count()
    ok = abs(est - exact) / max(exact, 1) <= 3 * cfg.rel_error() * 1.5 + 1e-9
    return spark.createDataFrame(
        [(exact, bool(ok))], "exact_distinct bigint, hll_ok boolean"
    )


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta) sketch set expressions: union / intersection /
    difference of the distinct word sets of the even- and odd-doc_id
    halves of the corpus, self-asserted against the exact counts (the
    oracle). Capability HLL lacks: registers only union."""
    from prefix_filter_spark.sketches import kmv

    docs = _docs(spark, sf_dir)
    from prefix_filter_spark.sources.tokenizer import words_col

    words = docs.select(
        (F.col("doc_id").cast("bigint") % 2 == 0).alias("even"),
        F.explode(words_col("text")).alias("word"),
    )
    side_a = words.where("even").select("word")
    side_b = words.where(~F.col("even")).select("word")

    cfg = kmv.KmvConfig(k=4096, seed=42)
    h = F.xxhash64("word", F.lit(7))
    sa = kmv.sketch_bytes(side_a, h, cfg)
    sb = kmv.sketch_bytes(side_b, h, cfg)

    da, db = side_a.distinct(), side_b.distinct()
    exact_union = da.union(db).distinct().count()
    exact_inter = da.intersect(db).count()
    exact_diff = da.subtract(db).count()

    # tolerance scales with the union (the restricted sample covers the
    # union's hash range); generous 4-sigma + small absolute slack
    tol = 4 * cfg.rel_error() * exact_union + 2
    ok_u = abs(kmv.union_estimate(sa, sb) - exact_union) <= tol
    ok_i = abs(kmv.intersection_estimate(sa, sb) - exact_inter) <= tol
    ok_d = abs(kmv.difference_estimate(sa, sb) - exact_diff) <= tol
    return spark.createDataFrame(
        [(exact_union, exact_inter, exact_diff, bool(ok_u), bool(ok_i), bool(ok_d))],
        "exact_union bigint, exact_intersection bigint, exact_a_minus_b bigint,"
        " kmv_union_ok boolean, kmv_inter_ok boolean, kmv_diff_ok boolean",
    )


def q_distinct_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged distinct-cardinality panel (round-4 session-8: frees one
    slot in the driver's 50-entry gate window for boilerplate_lines,
    same precedent as filters_membership): the HLL single-set estimate
    and the KMV set-expression estimates in ONE single-row gate. Exact
    counts hash-match DuckDB; the sketch estimates are self-asserted
    against their published bounds, as before."""
    return q_hll_distinct(spark, sf_dir).crossJoin(q_kmv_set_ops(spark, sf_dir))


_BP_SPLIT_WORDS = ("the", "a", "table", "value", "fast", "row")


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style line-level boilerplate removal
    (operators/boilerplate.py): lines occurring in >= 2% of documents
    are template chrome and get dropped; documents are rebuilt from the
    surviving lines in order. The synthetic corpus is single-line, so
    the gate derives lines deterministically in BOTH engines by
    replacing six frequent words with newlines (literal left-to-right
    replace — identical semantics in Spark and DuckDB); short
    inter-word chunks then repeat across documents organically, giving
    ~29 frequent lines at every SF. Threshold in exact integer
    arithmetic (ceil(n/50) via (n+49)//50) — no float ceil whose
    IEEE rounding could diverge between engines."""
    from prefix_filter_spark.operators.boilerplate import drop_boilerplate_lines

    docs = _docs(spark, sf_dir)
    text = F.col("text")
    for w in _BP_SPLIT_WORDS:
        text = F.replace(text, F.lit(f" {w} "), F.lit("\n"))
    docs = docs.withColumn("text", text)
    n_docs = docs.count()
    min_docs = max(2, (n_docs + 49) // 50)
    out = drop_boilerplate_lines(docs, min_docs=min_docs)
    return out.select(
        "doc_id", "text", "n_lines_kept", "n_lines_dropped"
    ).orderBy("doc_id")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import cms

    words = _word_stream(spark, sf_dir)
    cfg = cms.CmsConfig(width=8192, depth=5, seed=42)
    state = bytes(
        cms.build_cms(words, F.xxhash64("word", F.lit(2)), cfg).collect()[0]["state"]
    )
    top = (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(10)
    ).toPandas()
    import numpy as np

    # estimate on the same derived keys (xxhash64(word, 2)) used at build
    keys_df = spark.createDataFrame(top[["word"]]).select(
        F.xxhash64("word", F.lit(2)).alias("k")
    )
    keys = keys_df.toPandas()["k"].to_numpy()
    est = cms.point_estimates(state, keys, cfg)
    n_total = cms.total_count(state)
    ok = (est >= top["cnt"].to_numpy()).all() and (
        est <= top["cnt"].to_numpy() + cfg.eps * n_total
    ).all()
    top["cms_ok"] = bool(ok)
    return spark.createDataFrame(top[["word", "cnt", "cms_ok"]]).orderBy(
        F.desc("cnt"), "word"
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-split packing of the tokenized documents into
    2048-token training packs (operators/packing.py): per-pack manifest
    rows, computed by the distributed prefix-sum (no global window —
    pinned in test_packing.py), DuckDB-matched against the exact
    window-function cumsum."""
    from prefix_filter_spark.operators.packing import pack_summary
    from prefix_filter_spark.sources.tokenizer import words_col

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(words_col("text")).alias("n_tok")
    )
    return pack_summary(docs, "doc_id", "n_tok", budget=2048, num_buckets=8)


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text.py
    repetition_scores — map-only Catalyst), aggregated per source;
    DuckDB mirrors the per-doc duplicate-n-gram fractions exactly."""
    from prefix_filter_spark.operators.text import repetition_scores

    r = repetition_scores(_docs(spark, sf_dir))
    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dup_word_frac"), 6).alias("avg_dup_word"),
            F.round(F.avg("dup_2gram_frac"), 6).alias("avg_dup_2gram"),
            F.round(F.avg("dup_3gram_frac"), 6).alias("avg_dup_3gram"),
            F.round(F.max("dup_3gram_frac"), 6).alias("max_dup_3gram"),
        )
        .orderBy("source")
    )


def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text-quality AND repetition signals in one gate: the
    round-3 `quality_scores` and `repetition_scores` gates merged
    (joined on source) to free a driver slot for `unigram_scores`,
    the same consolidation the round-3 verdict prescribed for the
    membership family. Both q_* callables stay exported as API."""
    q = q_quality_scores(spark, sf_dir)
    r = q_repetition_scores(spark, sf_dir)
    return q.join(r, "source").orderBy("source")


# Fixed piece table for the unigram Viterbi gate: every corpus letter
# at ln(1/64) plus hand-picked multi-char pieces at ln(1/32) / ln(1/24)
# / ln(1/16) by length — all pre-quantized to integer 1e-6 log-prob
# units so BOTH engines run exact integer max-sum DP (no runtime ln(),
# no float reduction, no cross-libm risk).
_CHAR_FP = -4_158_883  # round(ln(1/64) * 1e6)
_FP2, _FP3, _FP4 = -3_465_736, -3_178_054, -2_772_589  # ln(1/32, 1/24, 1/16)
_UNI_PIECES_FP: dict[str, int] = {
    **{c: _CHAR_FP for c in "abcdefghijklmnopqrstuvwxyz"},
    **{p: _FP2 for p in (
        "jo", "in", "ha", "sh", "ro", "ow", "ba", "an", "er", "or",
        "ta", "da", "va", "ke", "ey", "li", "ne", "ge", "up", "rt",
        "ry", "st", "re", "am", "rk", "ll", "du",
    )},
    **{p: _FP3 for p in (
        "row", "col", "umn", "cus", "tom", "fil", "ter", "sma", "mer",
        "slo", "ord", "vec", "tor", "agg", "lue", "str", "eam", "win",
        "dow", "spa", "gro", "par", "big", "que", "fas", "the", "dup",
        "tch", "ble",
    )},
    **{p: _FP4 for p in ("join", "hash", "scan", "sort", "line", "data")},
}


def q_unigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi segmentation scores (operators/unigram.py)
    over every distinct corpus word, under the fixed integer-fixed-
    point piece table above. The DuckDB oracle re-runs the same
    max-sum lattice DP as a recursive CTE over (word, position) states
    — a genuine cross-engine check of the segmentation lattice, exact
    because scores are integers and max/+ never round. Scale shape:
    one word-count shuffle, then the DP runs on the DISTINCT-word
    table only (same bounded regime as BPE/unigram training)."""
    from prefix_filter_spark.operators.unigram import word_viterbi_scores

    return (
        word_viterbi_scores(_docs(spark, sf_dir), _UNI_PIECES_FP)
        .orderBy("w")
    )


def _unigram_oracle_sql() -> str:
    """The recursive CTE ENUMERATES segmentation paths, exponential in
    matching pieces per word in theory — bounded here because the
    corpus generator's words are <= 8 chars (<= ~2^7 paths/word), and
    the oracle runs at gate scale only. The Spark side is the linear
    O(len x max_piece_len) DP; the asymmetry is deliberate (an
    independent formulation is what makes the cross-check strong)."""
    pieces_sql = ", ".join(
        f"('{p}', {s})" for p, s in sorted(_UNI_PIECES_FP.items())
    )
    return f"""
        WITH RECURSIVE words AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest({_DUCK_WORDS}) AS w FROM documents)
          WHERE w <> '' GROUP BY w
        ),
        pieces(piece, fp) AS (VALUES {pieces_sql}),
        paths(w, i, s) AS (
          SELECT w, 0, CAST(0 AS BIGINT) FROM words
          UNION ALL
          SELECT p.w, p.i + len(pc.piece), p.s + pc.fp
          FROM paths p JOIN pieces pc
            ON substr(p.w, p.i + 1, len(pc.piece)) = pc.piece
          WHERE p.i < len(p.w)
        )
        SELECT words.w AS w, words.cnt AS cnt, dp.viterbi_fp AS viterbi_fp
        FROM words
        JOIN (SELECT w, max(s) AS viterbi_fp FROM paths
              WHERE i = len(w) GROUP BY w) dp USING (w)
        ORDER BY w
    """


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontaminate.py): docs
    with doc_id % 17 == 0 stand in as the held-out benchmark; every
    other doc sharing >= 1 distinct 3-gram with it is flagged with its
    exact shared count. Filter-pruned map-side, exact-verified — the
    DuckDB oracle is the plain shingle intersection."""
    from prefix_filter_spark.operators.decontaminate import contaminated_docs

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    return contaminated_docs(spark, corpus, bench, n=3, min_hits=1).orderBy(
        "doc_id"
    )


def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation (operators/join_stats.py): exact
    distinct-key counts + true join size (DuckDB-matched), with a
    self-asserted boolean that the KMV estimates — computed WITHOUT
    joining or shuffling the data — land within their published bounds
    (4 sigma, overlap error scaled by union/intersection)."""
    import math

    from prefix_filter_spark.operators.join_stats import estimate_join
    from prefix_filter_spark.sketches import kmv

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cfg = kmv.KmvConfig(k=4096, seed=17)
    est = estimate_join(li, "l_orderkey", od, "o_orderkey", cfg)

    da = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    db = od.select(F.countDistinct("o_orderkey")).collect()[0][0]
    shared = (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .join(od.select(F.col("o_orderkey").alias("k")).distinct(), "k")
        .count()
    )
    join_rows = li.join(od, li.l_orderkey == od.o_orderkey).count()
    union = da + db - shared
    tol = 4 * cfg.rel_error() * math.sqrt(union / max(shared, 1))
    ok = (
        abs(est.distinct_a - da) / da <= 4 * cfg.rel_error()
        and abs(est.distinct_b - db) / db <= 4 * cfg.rel_error()
        and abs(est.overlap - shared) / max(shared, 1) <= tol
        and abs(est.est_join_rows - join_rows) / max(join_rows, 1) <= 2 * tol
    )

    # AMS (round-4): join rows WITH duplicates + per-side self-join
    # size, no frequency model — exact F2 hash-matches DuckDB, the
    # inner-product estimate self-asserts inside its 4-sigma band
    from prefix_filter_spark.operators.join_stats import estimate_join_rows_ams
    from prefix_filter_spark.sketches import ams as amsm

    aest = estimate_join_rows_ams(
        li, "l_orderkey", od, "o_orderkey", amsm.AmsConfig(width=4096, depth=7, seed=23)
    )
    self_join = (
        li.groupBy("l_orderkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    f2_tol = 4 * amsm.AmsConfig(width=4096).rel_error_f2()
    ams_ok = (
        abs(aest.est_join_rows - join_rows) <= aest.tolerance
        and abs(aest.f2_a - self_join) <= f2_tol * self_join
        # orders keys are unique: F2 == rows exactly in expectation
        and abs(aest.f2_b - od.count()) <= f2_tol * od.count()
    )
    return spark.createDataFrame(
        [(int(da), int(db), int(shared), int(join_rows), int(self_join),
          bool(ok), bool(ams_ok))],
        "n_keys_lineitem long, n_keys_orders long, n_shared long, "
        "join_rows long, self_join_rows_lineitem long, "
        "kmv_ok boolean, ams_ok boolean",
    )


def q_srp_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SRP embedding near-dup (operators/dedup.py
    srp_near_dup_pairs): planted near-copies (first coordinate ×1.25 —
    cosine ≈ 0.998 vs a 0.51 natural max, so the answer set is
    unambiguous) must ALL be found through the band-bucket candidate
    path and verified by exact cosine. Planting happens in the DOUBLE
    domain on both engines, so values hash-match exactly. The DuckDB
    oracle is the exact all-pairs scan."""
    from prefix_filter_spark.operators.dedup import srp_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == F.lit(0), x * F.lit(1.25)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    out = srp_near_dup_pairs(corpus, threshold=0.95, bands=8)
    return out.select(
        "v1", "v2", F.round("cosine", 6).alias("cosine")
    ).orderBy("v1", "v2")


def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-scoped semantic dedup (operators/dedup.py
    semdedup_pairs, Abbas et al. 2023): same planted-near-copy corpus as
    the SRP gate (first coordinate ×1.25 — cosine ≈ 0.998 vs a ~0.51
    natural max). Every planted pair must surface through the
    k-means-cluster candidate path — near-identical vectors share an
    argmax centroid — and exact cosine verifies in-join. The DuckDB
    oracle is the exhaustive all-pairs scan; the Spark side builds the
    same answer in O(n) from the planted alignment (v2 = v1 + 1e6) —
    organic pairs can't reach 0.95, and if one ever did, the oracle's
    exhaustive scan would hash-mismatch and redden the gate. The
    cluster path's recall vs that answer set is self-asserted >= 0.95
    (same shape as the IVF gate — boundary straddles are SemDeDup's
    documented, accepted miss mode; measured recall on this data is
    0.987-1.0 across the three SFs)."""
    from prefix_filter_spark.operators.dedup import semdedup_pairs
    from prefix_filter_spark.operators.similarity import cosine_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == F.lit(0), x * F.lit(1.25)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    exact = (
        emb.alias("a")
        .join(
            planted.alias("b"),
            F.col("b.vec_id") == F.col("a.vec_id") + F.lit(1_000_000),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            cosine_expr(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.95)
    )
    clustered = semdedup_pairs(corpus, threshold=0.95, nlist=16)
    n_exact = exact.count()
    hits = (
        exact.select("v1", "v2")
        .join(clustered.select("v1", "v2"), ["v1", "v2"], "left_semi")
        .count()
    )
    recall_ok = bool(n_exact > 0 and hits / n_exact >= 0.95)
    return (
        exact.select(
            "v1",
            "v2",
            F.round("cosine", 6).alias("cosine"),
            F.lit(recall_ok).alias("semdedup_recall_ok"),
        )
        .orderBy("v1", "v2")
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass ANALYZE-style column stats (operators/profile.py) over
    documents — exact mode so DuckDB hash-matches every cell; min/max
    restricted to integer/string columns (float rendering differs
    between engines, documented in the operator)."""
    from prefix_filter_spark.operators.profile import table_profile

    docs = _docs(spark, sf_dir)
    return table_profile(docs, ["doc_id", "source", "n_chars"]).orderBy(
        "column"
    )


def q_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (operators/ordering.py): global rank
    + scale-path (shard, shard_rank) for epoch 1, both derived from the
    same LCG order key, hash-matched against DuckDB recomputing the
    identical integer arithmetic and window ranks."""
    from prefix_filter_spark.operators.ordering import (
        epoch_order,
        epoch_shards,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    out = epoch_shards(epoch_order(docs, epoch=1), epoch=1, num_shards=8)
    return out.select("doc_id", "epoch_rank", "shard", "shard_rank").orderBy(
        "doc_id"
    )


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (operators/quantize.py):
    per-vector scale, code checksum, and reconstruction error —
    hash-matched against DuckDB recomputing the identical round(x/scale)
    arithmetic in double (both engines round half-away-from-zero). The
    error bound max_abs_err <= scale/2 is asserted in-gate on every
    vector, not assumed."""
    from prefix_filter_spark.operators.quantize import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qd = quantize_embeddings(emb)
    recon_err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q"),
            lambda a, c: F.abs(a - c.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    # two-step select: rounding `scale` in the SAME select would let
    # Spark 4's lateral column alias shadow the true input column inside
    # recon_err/bound_ok (same trap as q_dup_components' planted ids)
    pre = qd.select(
        "vec_id",
        "scale",
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, v: a + v.cast("long")
        ).alias("q_sum"),
        recon_err.alias("err_raw"),
        (recon_err <= F.col("scale") / 2 + F.lit(1e-12)).alias("bound_ok"),
    )
    out = pre.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "q_sum",
        F.round("err_raw", 6).alias("max_abs_err"),
        "bound_ok",
    )
    n_bad = out.where(~F.col("bound_ok")).count()
    assert n_bad == 0, f"{n_bad} vectors violate the scale/2 bound"
    return out.orderBy("vec_id")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (operators/pii.py): plant a deterministic
    email/IPv4/phone suffix on doc_id % 13 == 0, return per-doc counts
    plus the md5 of the redacted text — the oracle recomputes both with
    RE2's regexp_extract_all/regexp_replace, so pattern-dialect drift
    between Java regex and RE2 reddens the gate immediately."""
    from prefix_filter_spark.operators.pii import pii_signals, redact_pii

    docs = _docs(spark, sf_dir)
    suffix = F.concat(
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 call 555-123-4567"),
    )
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), suffix))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sig = pii_signals(planted)
    red = redact_pii(planted).select(
        "doc_id", F.md5("text").alias("redacted_md5")
    )
    return sig.join(red, "doc_id").orderBy("doc_id")


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py). Training
    is iterative, but the merge table is a pure function of the word
    counts, so the DuckDB oracle (_bpe_train_oracle_sql) unrolls the
    ten merge rounds as chained CTEs and hash-matches the full
    (rank, left, right, total) table — this closed the round-3
    'no_oracle' gap. Correctness is additionally pinned by pytest
    equivalence vs a sequential pure-Python reference
    (tests/test_bpe.py) and by the same reference re-run IN THIS GATE
    on the collected word counts (vocabulary-sized — tiny at every
    SF), surfaced as the ``ref_match`` column."""
    from collections import Counter

    from prefix_filter_spark.operators.bpe import END, train_bpe, word_counts

    docs = _docs(spark, sf_dir)
    n_merges = 10
    got = train_bpe(docs, num_merges=n_merges)

    wc = {r["w"]: r["cnt"] for r in word_counts(docs).collect()}
    vocab = {tuple(list(w) + [END]): c for w, c in wc.items()}
    want = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), total = max(
            pc.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
        )
        if total < 2:
            break
        want.append((a, b, total))
        nv: dict = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    ref_match = bool(got == want)
    rows = [
        (i, a, b, total, ref_match)
        for i, (a, b, total) in enumerate(got)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, total long, ref_match boolean"
    ).orderBy("rank")


def _planted_chain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real corpus ∪ planted 3-chains over synthetic unique-word docs
    (A~B at jaccard 54/62≈0.871, B~C at 52/64≈0.8125, A~C at
    50/66≈0.758 < 0.8 — so {A,B,C} is connected ONLY through B,
    exercising multi-hop propagation). Shared by the dup_components
    and leakage_split gates; the DuckDB oracles rebuild it 1:1."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    base = _docs(spark, sf_dir).where(F.col("doc_id") % 17 == 0).select("doc_id")
    idx = F.sequence(F.lit(0), F.lit(59))

    def _w(tag_rules):
        # tag_rules: list of (bound, letter); default letter 'w'
        def word(i):
            expr = F.concat(F.lit("w"), F.col("doc_id"), F.lit("x"), i)
            for bound, letter in reversed(tag_rules):
                expr = F.when(
                    i < F.lit(bound),
                    F.concat(F.lit(letter), F.col("doc_id"), F.lit("x"), i),
                ).otherwise(expr)
            return expr

        return F.array_join(F.transform(idx, word), " ")

    # two-step selects: text must use the BASE id (Spark 4's lateral
    # column aliasing would otherwise resolve doc_id to the shifted one)
    def _plant(offset, rules):
        return base.select("doc_id", _w(rules).alias("text")).select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"), "text"
        )

    pa = _plant(1_000_000, [])
    pb = _plant(2_000_000, [(4, "b")])
    pc = _plant(3_000_000, [(4, "b"), (8, "c")])
    return docs.unionByName(pa).unionByName(pb).unionByName(pc)


def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-dup pairs
    (operators/components.py): the step between pair generation and
    keep-one-per-cluster, on the planted-chain corpus (organic ≥0.8
    pairs join their own components). Oracle: the same pairs fed
    through a DuckDB recursive CTE computing min-reachable labels — a
    full hash match, no self-asserts."""
    from prefix_filter_spark.operators.components import connected_components
    from prefix_filter_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _planted_chain_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.8)
    return connected_components(pairs, src="d1", dst="d2").orderBy("node")


def q_dup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster — the dedup pipeline's final answer
    (operators/components.py dedup_keep_list): every doc with its
    near-dup component and a keep flag (component minimum survives,
    untouched docs survive). Same planted-chain corpus and
    recursive-CTE oracle as dup_components."""
    from prefix_filter_spark.operators.components import dedup_keep_list
    from prefix_filter_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _planted_chain_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.8)
    return dedup_keep_list(pairs, corpus.select("doc_id")).orderBy("doc_id")


def q_hot_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the round-4 grid-decomposed candidate generator
    (operators/dedup._bucket_candidate_pairs): three planted hot
    buckets (doc_id % 3) far above the cap of 32, so every pair goes
    through the grid-cell path — the oracle is the plain SQL self-join,
    so any dropped, invented, or duplicated pair hash-mismatches."""
    from prefix_filter_spark.operators.dedup import _bucket_candidate_pairs

    members = _docs(spark, sf_dir).select(
        "doc_id",
        F.lit(0).alias("band"),
        (F.col("doc_id") % 3).alias("h"),
    )
    pairs = _bucket_candidate_pairs(members, ["band", "h"], "doc_id", cap=32)
    return pairs.distinct().orderBy("d1", "d2")


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split (operators/components.py
    leakage_safe_split): whole near-dup COMPONENTS go to one side — a
    per-doc split would put one planted twin in train and its copy in
    test, silently inflating eval. Same planted-chain corpus and
    recursive-CTE oracle as dup_components, plus the deterministic
    LCG component-hash assignment recomputed by DuckDB."""
    from prefix_filter_spark.operators.components import leakage_safe_split
    from prefix_filter_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _planted_chain_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.8)
    out = leakage_safe_split(
        pairs, corpus.select("doc_id"), test_frac=0.2, seed=17
    )
    return out.orderBy("doc_id")


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style n-gram LM perplexity filter (operators/lm_score.py),
    BOTH models in one gate: the add-alpha bigram LM ('bigram2') and
    the interpolated Kneser-Ney trigram LM ('kn3' — the KenLM-standard
    formulation, round 4). Train on the reference split (doc_id % 10 !=
    0), score the held-out split. Exact integer counts + double log
    arithmetic with the fixed-point nll reduction — DuckDB reproduces
    both models bit-for-bit (hash-matched), no bound or self-assert."""
    from prefix_filter_spark.operators.lm_score import (
        kn_perplexity,
        lm_perplexity,
        train_bigram_counts,
        train_kn_counts,
    )

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 10 != 0)
    held_out = docs.where(F.col("doc_id") % 10 == 0)
    uni, bg, v = train_bigram_counts(train)
    # rounding policy (determinism rules): avg_nll/perplexity pass
    # through log2/pow in BOTH engines, so a 1-ulp libm disagreement in
    # one trigram's nll can shift the fixed-point sum by 1e-9 — the
    # hash survives only if no doc's rounded value sits within ~1e-11
    # of a rounding boundary. 4/2-decimal rounding keeps that
    # probability ~100x lower than the previous 6/4 while still
    # pinning the model to 4 significant digits.
    big = lm_perplexity(held_out, uni, bg, v, alpha=0.5).select(
        F.lit("bigram2").alias("model"),
        "doc_id",
        F.col("n_bigrams").alias("n_grams"),
        F.round("avg_nll", 4).alias("avg_nll"),
        F.round("perplexity", 2).alias("perplexity"),
    )
    kn = kn_perplexity(held_out, train_kn_counts(train)).select(
        F.lit("kn3").alias("model"),
        "doc_id",
        F.col("n_trigrams").alias("n_grams"),
        F.round("avg_nll", 4).alias("avg_nll"),
        F.round("perplexity", 2).alias("perplexity"),
    )
    return big.unionByName(kn).orderBy("model", "doc_id")


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture over `source` strata
    (operators/sampling.py): exactly ceil(frac_s * n_s) docs per source,
    ranked by a shared-arithmetic order hash (LCG — expressible in both
    engines, unlike xxhash64; the library default is xxhash64). Fracs
    are binary-exact (0.5/0.25/0.125) so double-vs-decimal ceil() can
    never disagree between Spark and DuckDB."""
    from prefix_filter_spark.operators.sampling import stratified_sample_exact

    docs = _docs(spark, sf_dir)
    order = F.pmod(
        F.col("doc_id") * F.lit(1103515245) + F.lit(12345), F.lit(2147483648)
    )
    fracs = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125}
    out = stratified_sample_exact(
        docs, "source", fracs, order, "doc_id", default_frac=0.0625
    )
    return (
        out.groupBy("source")
        .agg(
            F.min("n_total").alias("n_total"),
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )


def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries summary over the word stream (sketches/mg.py):
    exact top-10 words (DuckDB-matched), with a self-asserted boolean
    pinning the deterministic MG contract — per-token two-sided bound
    est <= true <= est + err, global err <= n/(k+1), and presence of
    every top token whose true count clears the error bound (the
    no-false-negative heavy-hitter guarantee)."""
    from prefix_filter_spark.sketches import mg

    words = _word_stream(spark, sf_dir)
    cfg = mg.MgConfig(k=256)
    state = mg.sketch_bytes(words, "word", cfg)
    total, err, counts = mg.estimates(state)
    top = (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(10)
    ).toPandas()
    ok = err <= total / (cfg.k + 1)
    for w, c in zip(top["word"], top["cnt"]):
        est = counts.get(w)
        if c > err:  # guaranteed present
            ok = ok and est is not None
        if est is not None:
            ok = ok and est <= c <= est + err
    top["mg_ok"] = bool(ok)
    return spark.createDataFrame(top[["word", "cnt", "mg_ok"]]).orderBy(
        F.desc("cnt"), "word"
    )


def _rank_interval_oks(
    df: DataFrame, col: str, checks: list[tuple[float, float]], eps: float = 0.025
) -> list[bool]:
    """Distributed rank-interval check: a value occupies the whole rank
    interval [count(x<v)/n, count(x<=v)/n] on tie-heavy data — the
    answer is correct iff that interval intersects [q-eps, q+eps].
    One aggregation job computes every interval (2 filtered counts per
    checked value + the total), replacing the round-1 full-column
    ``toPandas()`` that would OOM the gate itself at 100x data.
    ``checks``: list of (q, estimated_value)."""
    aggs = [F.count("*").alias("_n")]
    for i, (_, v) in enumerate(checks):
        aggs.append(F.sum((F.col(col) < F.lit(v)).cast("long")).alias(f"lo{i}"))
        aggs.append(F.sum((F.col(col) <= F.lit(v)).cast("long")).alias(f"hi{i}"))
    r = df.agg(*aggs).collect()[0]
    n = max(r["_n"], 1)
    return [
        bool(r[f"lo{i}"] / n - eps <= q <= r[f"hi{i}"] / n + eps)
        for i, (q, _) in enumerate(checks)
    ]


def _dds_interval_oks(
    df: DataFrame, col: str, checks: list[tuple[float, float]], alpha: float
) -> list[bool]:
    """DDSketch check in VALUE space (its guarantee is relative value
    error, not rank error): the element at the sketch's rank convention
    (0-based floor(q*(n-1))) must lie inside the alpha-ball
    [est/(1+α), est/(1−α)] (mirrored for negatives). Same one-job
    aggregation shape as _rank_interval_oks."""
    a = alpha + 1e-9
    aggs = [F.count("*").alias("_n")]
    bounds = []
    for i, (_, v) in enumerate(checks):
        if v > 0:
            lo, hi = v / (1 + a), v / (1 - a)
        elif v < 0:
            lo, hi = v / (1 - a), v / (1 + a)
        else:
            lo = hi = 0.0
        bounds.append((lo, hi))
        aggs.append(F.sum((F.col(col) < F.lit(lo)).cast("long")).alias(f"lo{i}"))
        aggs.append(F.sum((F.col(col) <= F.lit(hi)).cast("long")).alias(f"hi{i}"))
    r = df.agg(*aggs).collect()[0]
    n = max(r["_n"], 1)
    oks = []
    for i, (q, _) in enumerate(checks):
        rank = int(q * (n - 1))
        oks.append(bool(r[f"lo{i}"] <= rank and r[f"hi{i}"] >= rank + 1))
    return oks


def q_ntok_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import dds, kll, tdigest
    from prefix_filter_spark.sources.tokenizer import words_col

    docs = _docs(spark, sf_dir).select(F.size(words_col("text")).alias("n_words"))
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    exact = docs.select(
        F.expr(f"percentile(n_words, array({','.join(map(str, qs))}))").alias("p")
    ).collect()[0]["p"]
    sk = kll.KllSketch.from_bytes(
        bytes(kll.build_kll(docs, "n_words", kll.KllConfig(k=200, seed=42)).collect()[0]["state"])
    )
    td = tdigest.TDigest.from_bytes(
        bytes(
            tdigest.build_tdigest(docs, "n_words", tdigest.TDigestConfig(delta=200))
            .collect()[0]["state"]
        )
    )
    dd_cfg = dds.DDSketchConfig(alpha=0.01)
    dd = dds.DDSketch.from_bytes(
        bytes(dds.build_dds(docs, "n_words", dd_cfg).collect()[0]["state"])
    )
    kqs, tqs, dqs = sk.quantiles(qs), td.quantiles(qs), dd.quantiles(qs)
    k_oks = _rank_interval_oks(docs, "n_words", list(zip(qs, (float(v) for v in kqs))))
    t_oks = _rank_interval_oks(docs, "n_words", list(zip(qs, (float(v) for v in tqs))))
    d_oks = _dds_interval_oks(
        docs, "n_words", list(zip(qs, (float(v) for v in dqs))), dd_cfg.alpha
    )
    rows = [
        (q, round(float(ex), 6), ko, to, do)
        for q, ex, ko, to, do in zip(qs, exact, k_oks, t_oks, d_oks)
    ]
    return spark.createDataFrame(
        rows,
        "q double, exact_quantile double, kll_ok boolean, tdigest_ok boolean, "
        "dds_ok boolean",
    )


def _membership_panel(spark, sf_dir, build, handle_cls, cfg_factory, fpr_bound, prefix):
    """cfg_factory: n_distinct_words -> config; fpr_bound: a float or a
    callable(cfg) for closed-form bounds. The panel counts the word
    stream ONCE and sizes the filter from that count (callers used to
    run the identical distinct+count themselves just to build the
    config — a doubled input scan, which at 100TB is the dominant cost)."""
    from prefix_filter_spark.functions import register_contains_udf

    words = _word_stream(spark, sf_dir).distinct()
    n = words.count()
    cfg = cfg_factory(max(n, 1024))
    bound = fpr_bound(cfg) if callable(fpr_bound) else fpr_bound
    handle = handle_cls.from_df(cfg, build(words, "word", cfg))
    fn = register_contains_udf(spark, f"{prefix}_contains", handle, cfg.seed)
    found = words.where(fn("word")).count()
    probes = spark.range(30_000_000, 30_000_000 + 50_000).select(
        F.concat(F.lit(f"{prefix}_"), F.col("id").cast("string")).alias("word")
    )
    fp = probes.where(fn("word")).count()
    return spark.createDataFrame(
        [(n, n - found, bool(fp / 50_000 <= bound))],
        "n_probed bigint, false_negatives bigint, fpr_ok boolean",
    )


def q_filters_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated membership panel — ONE gate row per filter kind
    (round-3 verdict item #1: ten single-row gates wasted the driver's
    50-query window). Same assertions per kind as the individual
    panels: zero false negatives on every inserted key, and empirical
    FPR on 50k disjoint probes under the kind's bound. The word stream
    is scanned and deduplicated ONCE for all ten builds (the individual
    panels each re-scanned it — at 100 TB the scan dominates, so the
    shared-scan shape is also the right production pattern).

    Kinds: Bloom, blocked-Bloom, two-choice, cuckoo (CF-12-stable),
    the five reference prefix-filter assemblies (Bloom / TC / CF /
    BBF / Impala512 spares) per /root/reference/main-perf.cpp:16-31,
    the static Xor-8 filter (sketches/xor.py, outside the
    reference's comparison set), the PF[Xor8] assembly (static
    xor spare — expressible only in the batch model), the binary fuse
    filter, the Ribbon filter (sketches/ribbon.py — the densest
    static row, banded-Gaussian solve), and the ribbon RETRIEVAL
    structure (sketches/retrieval.py — static function word -> 16-bit
    value; its row's false_negatives column counts value mismatches,
    which the exactness contract pins to 0),
    plus the doc-id probe panel (north star: 'token-ID and doc-ID
    probes'; FP probe skipped there — ids, not words — so its bound
    check is trivially true)."""
    from prefix_filter_spark.functions import register_contains_udf
    from prefix_filter_spark.sketches import blocked_bloom as bb
    from prefix_filter_spark.sketches import bloom
    from prefix_filter_spark.sketches import cuckoo as ckm
    from prefix_filter_spark.sketches import prefix_filter as pfm
    from prefix_filter_spark.sketches import two_choice as tc
    from prefix_filter_spark.sketches import bfuse as bfm
    from prefix_filter_spark.sketches import quotient as qfm
    from prefix_filter_spark.sketches import ribbon as rbm
    from prefix_filter_spark.sketches import xor as xorm

    pf_cfg = lambda spare: (
        lambda n: pfm.PrefixFilterConfig(
            n_capacity=n, num_shards=8, seed=42, spare_kind=spare
        )
    )
    kinds = [
        ("bloom", bloom.build_bloom, bloom.ShardedBloom,
         lambda n: bloom.BloomConfig(n_capacity=n, bits_per_key=12, num_shards=8, seed=42),
         lambda cfg: cfg.theoretical_fpr() * 1.5 + 1e-4, "zz"),
        ("blocked_bloom", bb.build_blocked_bloom, bb.ShardedBlockedBloom,
         lambda n: bb.BlockedBloomConfig(n_capacity=n, bits_per_key=10, num_shards=8, seed=42),
         0.05, "bbf"),
        ("two_choice", tc.build_two_choice, tc.ShardedTwoChoice,
         lambda n: tc.TwoChoiceConfig(n_capacity=n, num_shards=8, seed=42),
         0.02, "tc"),
        ("cuckoo", ckm.build_cuckoo, ckm.ShardedCuckoo,
         lambda n: ckm.CuckooConfig(n_capacity=n, num_shards=8, seed=42),
         0.01, "ck"),
        ("pf_bloom", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42),
         0.006, "qq"),
        ("pf_tc", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("tc"), 0.006, "pftc"),
        ("pf_cf", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("cuckoo"), 0.006, "pfcf"),
        ("pf_bbf", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("bbf"), 0.008, "pfbbf"),
        ("pf_impala", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("impala512"), 0.008, "pfimp"),
        ("xor", xorm.build_xor, xorm.ShardedXor,
         lambda n: xorm.XorConfig(n_capacity=n, fingerprint_bits=8, num_shards=8, seed=42),
         lambda cfg: cfg.theoretical_fpr() * 1.5 + 1e-4, "xr"),
        ("pf_xor", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("xor"), 0.006, "pfxr"),
        ("bfuse", bfm.build_bfuse, bfm.ShardedBFuse,
         lambda n: bfm.BFuseConfig(n_capacity=n, fingerprint_bits=8, num_shards=4, seed=42),
         lambda cfg: cfg.theoretical_fpr() * 1.5 + 1e-4, "bfu"),
        ("ribbon", rbm.build_ribbon, rbm.ShardedRibbon,
         lambda n: rbm.RibbonConfig(n_capacity=n, fingerprint_bits=8, num_shards=8, seed=42),
         lambda cfg: cfg.theoretical_fpr() * 1.5 + 1e-4, "rbn"),
        ("pf_ribbon", pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
         pf_cfg("ribbon"), 0.006, "pfrbn"),
        ("quotient", qfm.build_quotient, qfm.ShardedQuotient,
         lambda n: qfm.QuotientFilterConfig(n_capacity=n, num_shards=8, seed=42),
         lambda cfg: cfg.theoretical_fpr() * 1.8 + 1e-4, "qf"),
    ]
    words = _word_stream(spark, sf_dir).distinct().cache()
    n = words.count()
    probes = spark.range(30_000_000, 30_000_000 + 50_000)
    rows = []
    for kind, build, handle_cls, cfg_factory, fpr_bound, prefix in kinds:
        cfg = cfg_factory(max(n, 1024))
        bound = fpr_bound(cfg) if callable(fpr_bound) else fpr_bound
        handle = handle_cls.from_df(cfg, build(words, "word", cfg))
        fn = register_contains_udf(spark, f"{prefix}_contains_all", handle, cfg.seed)
        found = words.where(fn("word")).count()
        neg = probes.select(
            F.concat(F.lit(f"{prefix}_"), F.col("id").cast("string")).alias("word")
        )
        fp = neg.where(fn("word")).count()
        rows.append((kind, n, n - found, bool(fp / 50_000 <= bound)))
    # ribbon retrieval (static function word -> 16-bit value): the
    # "false_negatives" column counts VALUE MISMATCHES on member keys —
    # the static-function exactness contract says it must be 0; the FP
    # bound is vacuous (non-members return arbitrary values by design)
    from prefix_filter_spark.functions import register_lookup_udf
    from prefix_filter_spark.sketches import retrieval as rvm

    val = F.pmod(F.xxhash64("word", F.lit(99)), F.lit(65_536))
    pairs = words.select("word", val.alias("val"))
    rcfg = rvm.RetrievalConfig(n_capacity=max(n, 1024), value_bits=16, num_shards=8, seed=42)
    rhandle = rvm.ShardedRetrieval.from_df(
        rcfg, rvm.build_retrieval(pairs, "word", "val", rcfg)
    )
    rfn = register_lookup_udf(spark, "rvmap_lookup_all", rhandle, rcfg.seed)
    mismatches = pairs.where(rfn("word") != F.col("val")).count()
    rows.append(("ribbon_map", n, mismatches, True))
    words.unpersist()
    docs = _docs(spark, sf_dir).select("doc_id")
    nd = docs.count()
    cfg = pfm.PrefixFilterConfig(n_capacity=max(nd, 1024), num_shards=8, seed=42)
    handle = pfm.ShardedPrefixFilter.from_df(
        cfg, pfm.build_prefix_filter(docs, "doc_id", cfg)
    )
    fn = register_contains_udf(spark, "pf_docid_all", handle, cfg.seed)
    found = docs.where(fn("doc_id")).count()
    rows.append(("doc_id", nd, nd - found, True))
    return spark.createDataFrame(
        rows,
        "kind string, n_probed bigint, false_negatives bigint, fpr_ok boolean",
    ).orderBy("kind")


def q_blocked_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import blocked_bloom as bb

    return _membership_panel(
        spark, sf_dir, bb.build_blocked_bloom, bb.ShardedBlockedBloom,
        lambda n: bb.BlockedBloomConfig(n_capacity=n, bits_per_key=10, num_shards=8, seed=42),
        0.05, "bbf",
    )


def q_two_choice_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefix_filter_spark.sketches import two_choice as tc

    return _membership_panel(
        spark, sf_dir, tc.build_two_choice, tc.ShardedTwoChoice,
        lambda n: tc.TwoChoiceConfig(n_capacity=n, num_shards=8, seed=42),
        0.02, "tc",
    )


def q_cuckoo_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch cuckoo filter (reference CuckooFilterStable, 12-bit tags,
    4-way buckets, delete-capable; cuckoofilter_stable.h:69-135)."""
    from prefix_filter_spark.sketches import cuckoo as ckm

    return _membership_panel(
        spark, sf_dir, ckm.build_cuckoo, ckm.ShardedCuckoo,
        lambda n: ckm.CuckooConfig(n_capacity=n, num_shards=8, seed=42),
        0.01, "ck",
    )


def q_pf_tc_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filter with the two-choice spare (PF[TC], example.cpp:4-5)."""
    from prefix_filter_spark.sketches import prefix_filter as pfm

    return _membership_panel(
        spark, sf_dir, pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
        lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42, spare_kind="tc"),
        0.006, "pftc",
    )


def q_pf_cf_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filter with a stable-cuckoo spare — the reference's third
    published assembly, PF[CF12-Flex]
    (/root/reference/main-perf.cpp:16-31, spare sizing
    Tests/wrappers.hpp:529-546)."""
    from prefix_filter_spark.sketches import prefix_filter as pfm

    return _membership_panel(
        spark, sf_dir, pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
        lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42, spare_kind="cuckoo"),
        0.006, "pfcf",
    )


def q_pf_bbf_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filter with the register-blocked spare — the reference's
    PF[BBF-Fixed] assembly (/root/reference/main-fpp.cpp:20, spare
    sizing Tests/wrappers.hpp:564-569)."""
    from prefix_filter_spark.sketches import prefix_filter as pfm

    return _membership_panel(
        spark, sf_dir, pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
        lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42, spare_kind="bbf"),
        0.008, "pfbbf",
    )


def q_pf_impala_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix filter with the 64B-block spare — the reference's
    PF[Impala512] assembly (/root/reference/main-fpp.cpp:23, spare
    sizing Tests/wrappers.hpp:578-593)."""
    from prefix_filter_spark.sketches import prefix_filter as pfm

    return _membership_panel(
        spark, sf_dir, pfm.build_prefix_filter, pfm.ShardedPrefixFilter,
        lambda n: pfm.PrefixFilterConfig(n_capacity=n, num_shards=8, seed=42, spare_kind="impala512"),
        0.008, "pfimp",
    )


def q_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-join runtime filter: fact side pruned map-side by an AMQ
    filter on the dim keys before the join's shuffle; zero false
    negatives make the result exactly the plain join (the oracle). The
    reference's Contain path (Tests/wrappers.hpp:96-101) as a query
    optimization."""
    from prefix_filter_spark.operators import filter_join as fj

    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = fj.runtime_filter_join(spark, fact, dim, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def q_doc_id_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-ID probes (north star: 'token-ID and doc-ID probes')."""
    from prefix_filter_spark.functions import register_contains_udf
    from prefix_filter_spark.sketches import prefix_filter as pfm

    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    cfg = pfm.PrefixFilterConfig(n_capacity=max(n, 1024), num_shards=8, seed=42)
    handle = pfm.ShardedPrefixFilter.from_df(
        cfg, pfm.build_prefix_filter(docs, "doc_id", cfg)
    )
    fn = register_contains_udf(spark, "q_pf_doc", handle, cfg.seed)
    found = docs.where(fn("doc_id")).count()
    return spark.createDataFrame(
        [(n, n - found)], "n_probed bigint, false_negatives bigint"
    )


def q_per_source_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct words: exact both engines + salted-HLL bound
    check (the north star's 'salted repartitioning for skewed source
    keys, then tree-merge' shape)."""
    from prefix_filter_spark.operators.per_group import sketch_by_group
    from prefix_filter_spark.sketches import hll
    from prefix_filter_spark.sources.tokenizer import words_col

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "source", "doc_id", F.explode(words_col("text")).alias("word")
    )
    cfg = hll.HllConfig(p=13, seed=42)
    sketched = sketch_by_group(
        tok,
        "source",
        F.xxhash64("word", F.lit(5)),
        acc_factory=lambda: hll.HllAccumulator(cfg),
        merge_fn=hll.merge_states,
        salt_on="doc_id",
        salt_buckets=16,
    ).toPandas()
    exact = (
        tok.groupBy("source")
        .agg(F.countDistinct("word").alias("exact_distinct"))
        .toPandas()
    )
    m = sketched.merge(exact, left_on="group", right_on="source")
    m["hll_ok"] = (
        (m["state"].map(hll.estimate) - m["exact_distinct"]).abs()
        / m["exact_distinct"].clip(lower=1)
        <= 3 * cfg.rel_error() * 1.5 + 1e-9
    )
    out = m[["source", "exact_distinct", "hll_ok"]].sort_values("source")
    return spark.createDataFrame(
        out, "source string, exact_distinct bigint, hll_ok boolean"
    ).orderBy("source")


def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round("value", 6).alias("value"), "rnk")
        .orderBy("user_id", "rnk")
    )


def q_salted_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation — must equal a plain GROUP BY."""
    from prefix_filter_spark.plans.salting import salted_count

    docs = _docs(spark, sf_dir)
    return salted_count(docs, ["source"], F.col("doc_id"), salt_buckets=16).orderBy(
        "source"
    )


def q_lang_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained trigram language-ID, gated two ways: the synthetic
    corpus reuses one vocabulary for every lang label (content is NOT
    separable — measured ~chance accuracy), so label recovery cannot be
    asserted. Instead (a) the exact per-lang doc counts are emitted
    (DuckDB-mirrorable), and (b) the train+predict pipeline is run on a
    PLANTED corpus of 5 synthetic languages with disjoint character
    sets, where nearest-centroid must score 100% — a real end-to-end
    check of the distributed partial-sum training and the vectorized
    predict UDF. ``preds_valid`` additionally asserts every real-corpus
    prediction lands in the trained label set."""
    from prefix_filter_spark.operators.text import predict_lang, train_lang_centroids

    docs = _docs(spark, sf_dir)

    # planted separable corpus: lang Li uses only letter i, so trigram
    # profiles are orthogonal across langs and nearest-centroid is exact
    letters = F.array(*[F.lit(c) for c in "qxzjv"])
    letter = F.element_at(letters, (F.col("id") % 5 + 1).cast("int"))
    word = lambda j: F.repeat(letter, ((F.col("id") + j) % 5 + 1).cast("int"))  # noqa: E731
    planted = spark.range(250).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("L"), (F.col("id") % 5).cast("string")).alias("lang"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(20)), word)
        ).alias("text"),
    )
    cents_p = train_lang_centroids(planted)
    planted_acc = (
        predict_lang(planted, cents_p)
        .agg(F.avg((F.col("lang_pred") == F.col("lang")).cast("double")))
        .collect()[0][0]
    )

    cents = train_lang_centroids(docs)
    preds = predict_lang(docs, cents)
    valid = set(cents)
    per_lang = (
        preds.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("lang_pred").isin(*valid).cast("long")).alias("n_valid"),
        )
        .collect()
    )
    preds_valid = all(r["n_docs"] == r["n_valid"] for r in per_lang)
    rows = [
        (r["lang"], r["n_docs"], bool(planted_acc >= 0.999), bool(preds_valid))
        for r in sorted(per_lang, key=lambda r: r["lang"])
    ]
    return spark.createDataFrame(
        rows, "lang string, n_docs bigint, planted_acc_ok boolean, preds_valid boolean"
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing gate: the per-kind counts are DuckDB-
    mirrorable (the generator is a deterministic range() mapping), and
    ``features_ok`` asserts the distributed mapInPandas output matches
    a driver-side recomputation of every row bit-for-bit — verifying
    the Spark plumbing (Arrow transport, batch shapes, schema,
    ordering) around the deterministic fake decode."""
    import hashlib

    import numpy as np

    from prefix_filter_spark.operators.multimodal import (
        DecodeBackend,
        extract_features,
        row_feature,
        synthetic_media,
    )

    n_rows, seed = 256, 42
    media = synthetic_media(spark, n_rows, seed=seed)
    got = {
        r["media_id"]: r
        for r in extract_features(media).collect()
    }
    backend = DecodeBackend()
    features_ok = len(got) == n_rows
    for i in range(n_rows):
        # independent payload derivation: hashlib sha256 hex mirrors
        # F.sha2(..., 256).cast("binary") (utf-8 bytes of the hex digest)
        payload = hashlib.sha256(f"{seed}{i}".encode()).hexdigest().encode()
        kind = "image" if i % 2 == 0 else "audio"
        meta = {
            "width": 32, "height": 24, "channels": 3,
            "sample_rate": 16_000, "duration_ms": i % 900 + 100,
        }
        want = row_feature(backend, kind, payload, meta)
        row = got.get(f"m-{i:08d}")
        if (
            row is None
            or not row["ok"]
            or not np.array_equal(np.array(row["feature"], dtype=np.float32), want)
        ):
            features_ok = False
            break
    agg: dict[str, int] = {}
    n_ok: dict[str, int] = {}
    for r in got.values():
        agg[r["kind"]] = agg.get(r["kind"], 0) + 1
        n_ok[r["kind"]] = n_ok.get(r["kind"], 0) + int(r["ok"])
    rows = [
        (k, agg[k], n_ok[k], bool(features_ok)) for k in sorted(agg)
    ]
    return spark.createDataFrame(
        rows, "kind string, n bigint, n_ok bigint, features_ok boolean"
    )


def q_pf_join_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership through the cogroup join-probe path (the no-broadcast
    regime for filters too large to broadcast)."""
    from prefix_filter_spark.sketches import prefix_filter as pfm, probe

    words = _word_stream(spark, sf_dir).distinct()
    n = words.count()
    cfg = pfm.PrefixFilterConfig(n_capacity=max(n, 1024), num_shards=8, seed=42)
    shards = pfm.build_prefix_filter(words, "word", cfg)
    out = probe.probe_via_join(
        words,
        "word",
        shards,
        seed=cfg.seed,
        num_shards=cfg.num_shards,
        probe_fn=probe.pf_probe_fn(cfg),
    )
    return out.agg(
        F.count("*").alias("n_probed"),
        F.sum((~F.col("contains")).cast("bigint")).alias("false_negatives"),
    ).select("n_probed", "false_negatives")


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.value quantiles through the registered SQL estimate
    surface (kll_quantile / tdigest_quantile / dds_quantile over
    serialized state)."""
    from prefix_filter_spark.functions import register_sketch_sql
    from prefix_filter_spark.sketches import dds, kll, tdigest

    register_sketch_sql(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    kll.build_kll(ev, "value", kll.KllConfig(k=200, seed=42)).createOrReplaceTempView(
        "q_kll_state"
    )
    tdigest.build_tdigest(
        ev, "value", tdigest.TDigestConfig(delta=200)
    ).createOrReplaceTempView("q_td_state")
    dd_cfg = dds.DDSketchConfig(alpha=0.01)
    dds.build_dds(ev, "value", dd_cfg).createOrReplaceTempView("q_dds_state")
    qs = [0.1, 0.5, 0.9, 0.99]
    exact = ev.select(
        F.expr(f"percentile(value, array({','.join(map(str, qs))}))").alias("p")
    ).collect()[0]["p"]
    # explicit double casts: bare 0.1 literals parse as DECIMAL and come
    # back as Decimal keys that would miss the float lookup below
    qlist = ",".join(f"cast({q} as double)" for q in qs)
    # one SQL round trip per sketch — the registered UDFs group rows by
    # state blob, so the whole quantile vector is one sketch walk
    kmap = {
        r["q"]: r["v"]
        for r in spark.sql(
            f"SELECT q, kll_quantile(state, q) v FROM q_kll_state "
            f"LATERAL VIEW explode(array({qlist})) t AS q"
        ).collect()
    }
    tmap = {
        r["q"]: r["v"]
        for r in spark.sql(
            f"SELECT q, tdigest_quantile(state, q) v FROM q_td_state "
            f"LATERAL VIEW explode(array({qlist})) t AS q"
        ).collect()
    }
    dmap = {
        r["q"]: r["v"]
        for r in spark.sql(
            f"SELECT q, dds_quantile(state, q) v FROM q_dds_state "
            f"LATERAL VIEW explode(array({qlist})) t AS q"
        ).collect()
    }
    kqs = [kmap[q] for q in qs]
    tqs = [tmap[q] for q in qs]
    dqs = [dmap[q] for q in qs]
    k_oks = _rank_interval_oks(ev, "value", list(zip(qs, kqs)))
    t_oks = _rank_interval_oks(ev, "value", list(zip(qs, tqs)))
    d_oks = _dds_interval_oks(ev, "value", list(zip(qs, dqs)), dd_cfg.alpha)
    rows = [
        (q, round(float(ex), 6), ko, to, do)
        for q, ex, ko, to, do in zip(qs, exact, k_oks, t_oks, d_oks)
    ]
    return spark.createDataFrame(
        rows,
        "q double, exact_quantile double, kll_ok boolean, tdigest_ok boolean, "
        "dds_ok boolean",
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-family gate (merged round-4 session-9 from the separate
    srp_ann_topk / ivf_ann_topk gates to free a slot under the
    driver's 50-entry cap — the round-3 lesson): emits the EXACT
    brute-force top-k table (DuckDB-mirrorable, the same machinery as
    embedding_topk) plus one self-asserted recall flag per ANN scale
    path against that exact answer.

    - SRP-LSH at the high-recall band setting (bands=32; measured
      recall 1.0 at every SF; bands=16 is the lean bench setting).
    - IVF at nlist=16/nprobe=10 — isotropic embeddings are IVF's
      worst case; measured 0.75 (sf0.01) / 0.925 (sf0.1),
      asserted >= 0.7.
    - PQ-ADC CANDIDATE containment: the exact top-5 must lie inside
      the ADC top-100 candidate set (the two-stage contract —
      operators/pq.py: ADC generates, exact rerank orders); measured
      0.925/1.0/0.825 at sf0.001/0.01/0.1 on worst-case isotropic
      data, asserted >= 0.7.
    """
    from prefix_filter_spark.operators.pq import PqConfig, pq_adc_topk, pq_train_codebooks
    from prefix_filter_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        srp_ann_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    exact = cosine_topk(emb, queries, k=k)
    n_exact = exact.count()
    exact_ids = exact.select("query_id", "vec_id")

    def _recall(ann: DataFrame) -> float:
        hits = exact_ids.join(
            ann.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
        ).count()
        return hits / n_exact if n_exact else 0.0

    srp_ok = bool(_recall(srp_ann_topk(emb, queries, k=k, bands=32)) >= 0.85)
    ivf_ok = bool(_recall(ivf_ann_topk(emb, queries, k=k, nlist=16, nprobe=10)) >= 0.7)
    books = pq_train_codebooks(emb, PqConfig(m=8, k=64, seed=7))
    pq_ok = bool(_recall(pq_adc_topk(emb, queries, k=100, books=books)) >= 0.7)
    return (
        exact.select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
            F.lit(srp_ok).alias("srp_recall_ok"),
            F.lit(ivf_ok).alias("ivf_recall_ok"),
            F.lit(pq_ok).alias("pq_recall_ok"),
        )
        .orderBy("query_id", "rank")
    )


def q_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout gate: the Morton codes the layout sorts by are a
    pure function of the data (minmax rank -> bit interleave, all
    integer/IEEE-exact), so DuckDB reproduces them bit-for-bit with
    the same shift-and-mask chain (sources/zorder.py). Gating the
    CODE gates the layout: repartitionByRange+sort preserve rows and
    order by z deterministically."""
    from prefix_filter_spark.sources import zorder

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    z = zorder.zorder_value(ev, ["user_id", "event_id"], modes=["minmax", "minmax"])
    return ev.select("event_id", z.alias("z")).orderBy("event_id")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash gate via planted duplicates, exact AND near.

    Exact: union the corpus with exact copies of a deterministic subset
    (n_chars % 17 == 0). Identical texts have identical 64-bit
    signatures, so the banded join MUST surface every planted pair at
    Hamming 0 — an exact recall floor (``planted_found``).

    Near (organic recall, round-2 verdict item #7): for docs with ≥ 60
    words (SimHash's documented stability floor is ~50) and
    doc_id % 13 == 0, plant a seeded word-level edit — every 31st word
    replaced by a marker token. The 4x16-bit banding carries a HARD
    guarantee: any pair within Hamming ≤ 3 leaves at least one 16-bit
    chunk intact (pigeonhole), so it MUST appear as a candidate.
    ``near_recall_ok`` asserts exactly that: every planted near pair
    whose true signature distance (recomputed independently via
    bit_count(s1 XOR s2)) is ≤ 3 is present in the banded output with
    the correct reported hamming. Wider distances are probabilistic and
    not gated. Counts are DuckDB-mirrorable; booleans self-asserted."""
    from prefix_filter_spark.operators.dedup import simhash_pairs
    from prefix_filter_spark.operators.text import simhash64

    # doc_id is int64 in the parquet; cast to string up front so the
    # unions below are string-vs-string. Without the cast, Spark 4's
    # default ANSI mode coerces the union to BIGINT and throws
    # CAST_INVALID_INPUT on '<id>~dup' (round-2 verdict finding #1).
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    planted_src = _docs(spark, sf_dir).where(F.col("n_chars") % 17 == 0)
    n_planted = planted_src.count()
    planted = planted_src.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("~dup")).alias("doc_id"),
        "text",
    )
    near_src = _docs(spark, sf_dir).where(
        (F.size(F.split("text", " ", -1)) >= 60) & (F.col("doc_id") % 13 == 0)
    )
    n_near = near_src.count()
    near = near_src.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("~near")).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split("text", " ", -1),
                lambda w, i: F.when(i % 31 == 30, F.lit("qzxnearmarker")).otherwise(w),
            ),
            " ",
        ).alias("text"),
    )
    pairs = simhash_pairs(
        docs.unionByName(planted).unionByName(near), max_hamming=8
    ).cache()
    stats = pairs.agg(
        F.sum(
            (
                (F.col("d2") == F.concat(F.col("d1"), F.lit("~dup")))
                & (F.col("hamming") == 0)
            ).cast("long")
        ).alias("found"),
        F.max("hamming").alias("hmax"),
    ).collect()[0]
    found = stats["found"] or 0
    hmax = stats["hmax"] if stats["hmax"] is not None else 0

    # independent ground truth for the near plants: per-doc signatures,
    # base joined to its edited twin, popcount of the XOR
    sig_base = simhash64(docs, 42).select(
        F.col("doc_id").alias("bid"), F.col("simhash").alias("s1")
    )
    sig_near = simhash64(near, 42).select(
        F.expr("substring(doc_id, 1, length(doc_id) - 5)").alias("bid"),
        F.col("simhash").alias("s2"),
    )
    truth = sig_base.join(sig_near, "bid").select(
        "bid", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("true_h")
    )
    found_near = pairs.where(
        F.col("d2") == F.concat(F.col("d1"), F.lit("~near"))
    ).select(F.col("d1").alias("bid"), F.col("hamming").alias("rep_h"))
    check = (
        truth.where(F.col("true_h") <= 3)
        .join(found_near, "bid", "left")
        .agg(
            F.count("*").alias("n_guaranteed"),
            F.sum((F.col("rep_h") == F.col("true_h")).cast("long")).alias("n_ok"),
        )
        .collect()[0]
    )
    pairs.unpersist()
    n_guaranteed = check["n_guaranteed"] or 0
    near_ok = (check["n_ok"] or 0) == n_guaranteed
    return spark.createDataFrame(
        [
            (
                n_planted,
                bool(found == n_planted),
                bool(hmax <= 8),
                n_near,
                bool(near_ok),
            )
        ],
        "n_planted bigint, planted_found boolean, hamming_ok boolean, "
        "n_near bigint, near_recall_ok boolean",
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS + Misra-Gries heavy hitters in ONE gate (merged so both keep
    a driver row inside the 50-entry window): exact top-10 words
    (DuckDB-matched) with each sketch's self-asserted two-sided-bound
    boolean. Same assertions as the individual q_cms_heavy_hitters /
    q_mg_heavy_hitters, which remain API for pytest."""
    cms_rows = q_cms_heavy_hitters(spark, sf_dir).select(
        F.lit("cms").alias("sketch"), "word", "cnt", F.col("cms_ok").alias("sketch_ok")
    )
    mg_rows = q_mg_heavy_hitters(spark, sf_dir).select(
        F.lit("mg").alias("sketch"), "word", "cnt", F.col("mg_ok").alias("sketch_ok")
    )
    return cms_rows.unionByName(mg_rows)


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL + t-digest + DDSketch quantiles over BOTH gated columns in
    ONE gate (documents n_words and events.value — merged so both keep
    a driver row inside the 50-entry window). Exact quantiles
    DuckDB-matched; KLL/t-digest rank-interval-checked, DDSketch
    value-interval-checked (its guarantee is relative value error)."""
    cols = ["q", "exact_quantile", "kll_ok", "tdigest_ok", "dds_ok"]
    ntok = q_ntok_quantiles(spark, sf_dir).select(
        F.lit("n_words").alias("metric"), *cols
    )
    val = q_value_quantiles(spark, sf_dir).select(
        F.lit("value").alias("metric"), *cols
    )
    return ntok.unionByName(val)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection (operators/span_dedup.py —
    ExactSubstr dedup, Lee et al. 2022, re-expressed as positional
    k-grams + gaps-and-islands): every maximal duplicated word span of
    >= 5 words, DuckDB-matched on positions, extents and gram counts."""
    from prefix_filter_spark.operators.span_dedup import duplicated_spans

    spans = duplicated_spans(_docs(spark, sf_dir), k=5)
    return spans.select(
        "doc_id",
        F.col("start_pos").cast("bigint").alias("start_pos"),
        F.col("end_pos").cast("bigint").alias("end_pos"),
        "n_grams",
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py — Xie et al. 2023):
    integer fixed-point importance weights vs an English target corpus
    and the deterministic top-10% selection, DuckDB-matched exactly
    (the fixed-point quantization makes the weights accumulation-order
    independent, so no float tolerance is needed)."""
    from prefix_filter_spark.operators.dsir import (
        importance_weights,
        select_top_fraction,
    )

    docs = _docs(spark, sf_dir)
    w = importance_weights(docs, docs.where(F.col("lang") == "en"))
    return select_top_fraction(w, 0.1)


# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: prefix-filter membership panel on sf0.001."""
    return q_prefix_filter_membership(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry of driver-gated queries. The driver gates the FIRST 50
    entries (round-3 finding); this dict is at EXACTLY 50 — do NOT
    append a new gate without first merging or removing one, or it
    silently falls outside the gated window (the round-3 bug). The ten
    single-row membership gates are consolidated into
    ``filters_membership`` (one row per filter kind, same assertions),
    and the seven queries that fell past the cap in round 3
    (simhash_pairs, the ANN gates — merged into ann_topk in round-4
    session-9, freeing the slot used by zorder_morton — runtime_filter_join,
    pf_join_probe, plus the two quantile gates) are registered early.
    Round-4 session-4 merges freed two more slots — the two quantile
    gates became ``sketch_quantiles`` and the two heavy-hitter gates
    became ``heavy_hitters`` — used by the new ``span_dedup`` and
    ``dsir_select`` gates. Round-4 session-6 merged the two per-source
    text gates (``quality_scores`` + ``repetition_scores``) into
    ``text_signals``, freeing the slot for ``unigram_scores``.
    Round-4 session-10 merged ``bpe_token_stats`` into ``token_stats``
    (same aggregations, joined on source), freeing the slot for the
    ``nb_quality`` classifier gate. Every individual q_* callable
    remains available as API and for pytest."""
    return {
        "tpch_q1": q_tpch_q1,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
        "sessionization": q_sessionization,
        "events_json_props": q_events_json_props,
        "simhash_pairs": q_simhash_pairs,
        "ann_topk": q_ann_topk,
        "zorder_morton": q_zorder_morton,
        "runtime_filter_join": q_runtime_filter_join,
        "pf_join_probe": q_pf_join_probe,
        "sketch_quantiles": q_sketch_quantiles,
        "span_dedup": q_span_dedup,
        "dsir_select": q_dsir_select,
        "filters_membership": q_filters_membership,
        "hot_bucket_pairs": q_hot_bucket_pairs,
        "dup_keep_list": q_dup_keep_list,
        "lang_source_matrix": q_lang_source_matrix,
        "token_stats": q_token_stats,
        "tokenized_sequences": q_tokenized_sequences,
        "nb_quality": q_nb_quality,
        "winnow_fingerprints": q_winnow_fingerprints,
        "text_signals": q_text_signals,
        "unigram_scores": q_unigram_scores,
        "doc_fingerprints": q_doc_fingerprints,
        "exact_dup_groups": q_exact_dup_groups,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "embedding_topk": q_embedding_topk,
        "per_source_distinct": q_per_source_distinct,
        "top_events_per_user": q_top_events_per_user,
        "salted_source_counts": q_salted_source_counts,
        "lang_predictions": q_lang_predictions,
        "media_features": q_media_features,
        "distinct_sketches": q_distinct_sketches,
        "boilerplate_lines": q_boilerplate_lines,
        "heavy_hitters": q_heavy_hitters,
        "sequence_packing": q_sequence_packing,
        "mixture_sample": q_mixture_sample,
        "srp_near_dup_pairs": q_srp_near_dup_pairs,
        "semdedup_pairs": q_semdedup_pairs,
        "lm_perplexity": q_lm_perplexity,
        "dup_components": q_dup_components,
        "bpe_train": q_bpe_train,
        "pii_scrub": q_pii_scrub,
        "quantize_embeddings": q_quantize_embeddings,
        "epoch_order": q_epoch_order,
        "table_profile": q_table_profile,
        "leakage_split": q_leakage_split,
        "join_cardinality": q_join_cardinality,
        "decontaminate": q_decontaminate,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        "events_hourly": """
            SELECT event_type,
                   (floor(epoch(ts))::BIGINT // 3600) % 24 AS hour_utc,
                   count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "sessionization": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events)
            SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "events_json_props": """
            SELECT event_type,
                   round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k,
                   sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "lang_source_matrix": """
            SELECT lang, source, count(*) AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "token_stats": f"""
            WITH t AS (SELECT source, len({_DUCK_WORDS}) AS n_words,
                              n_chars::double / len({_DUCK_WORDS}) AS cpw,
                              len(regexp_extract_all(lower(text),
                                  '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+'))
                                AS n_bpe
                       FROM documents)
            SELECT source, count(*) AS n_docs, sum(n_words)::BIGINT AS total_words,
                   round(avg(n_words), 6) AS avg_words,
                   round(avg(cpw), 6) AS avg_cpw,
                   sum(n_bpe)::BIGINT AS total_bpe_tokens,
                   round(avg(n_bpe::double / n_words), 6) AS bpe_per_word
            FROM t GROUP BY source ORDER BY source
        """,
        "tokenized_sequences": f"""
            SELECT source, count(*) AS n_docs,
                   sum(len({_DUCK_WORDS}))::BIGINT AS total_tokens,
                   true AS arrays_identical, true AS ids_in_vocab
            FROM documents GROUP BY source ORDER BY source
        """,
        "nb_quality": f"""
            WITH toks AS (SELECT doc_id, (lang = 'en') AS y,
                                 {_DUCK_WORDS} AS ws
                          FROM documents),
            feats AS (
              SELECT doc_id, y,
                     CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT % 32768
                          AS BIGINT) AS bucket
              FROM (SELECT doc_id, y, unnest(ws) AS w FROM toks)),
            counts AS (
              SELECT bucket,
                     sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
                     sum(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
              FROM feats GROUP BY bucket),
            tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg FROM counts),
            nd AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos,
                          sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n_neg
                   FROM documents),
            consts AS (
              SELECT CAST(round(10000 * ln(n_pos::DOUBLE / n_neg)) AS BIGINT)
                       AS prior_fp,
                     CAST(round(10000 * (ln(1.0 / (t_pos + 32768.0))
                                         - ln(1.0 / (t_neg + 32768.0))))
                          AS BIGINT) AS unseen_fp
              FROM nd, tot),
            llr AS (
              SELECT bucket,
                     CAST(round(10000 * (ln((c_pos + 1.0) / (t_pos + 32768.0))
                                         - ln((c_neg + 1.0) / (t_neg + 32768.0))))
                          AS BIGINT) AS llr_fp
              FROM counts, tot),
            perdoc AS (
              SELECT f.doc_id, count(*) AS n_feats,
                     sum(coalesce(l.llr_fp, (SELECT unseen_fp FROM consts)))
                       AS s
              FROM feats f LEFT JOIN llr l USING (bucket) GROUP BY f.doc_id)
            SELECT d.doc_id,
                   coalesce(p.n_feats, 0)::BIGINT AS n_feats,
                   (coalesce(p.s, 0) + (SELECT prior_fp FROM consts))::BIGINT
                     AS score_fp,
                   round(1.0 / (1.0 + exp(-((coalesce(p.s, 0)
                         + (SELECT prior_fp FROM consts))::DOUBLE / 10000.0))), 4)
                     AS prob
            FROM documents d LEFT JOIN perdoc p USING (doc_id)
            ORDER BY d.doc_id
        """,
        "winnow_fingerprints": f"""
            WITH s AS (SELECT doc_id, source,
                              array_to_string({_DUCK_WORDS}, ' ') AS t
                       FROM documents),
            g AS (SELECT doc_id, source, i,
                         substr(md5(substr(t, i, 8)), 1, 16) AS gh
                  FROM s, UNNEST(range(1, greatest(len(t) - 6, 1))) AS u(i)
                  WHERE len(t) >= 8),
            m AS (SELECT doc_id, source, i,
                         min(gh) OVER (PARTITION BY doc_id ORDER BY i
                                       ROWS BETWEEN CURRENT ROW
                                       AND 15 FOLLOWING) AS wmin,
                         count(*) OVER (PARTITION BY doc_id) AS ng
                  FROM g),
            "full" AS (SELECT DISTINCT source, doc_id, wmin AS f
                       FROM m WHERE ng >= 16 AND i <= ng - 15),
            short AS (SELECT source, doc_id, min(gh) AS f FROM g
                      GROUP BY 1, 2 HAVING count(*) < 16),
            e AS (SELECT * FROM "full" UNION ALL SELECT * FROM short)
            SELECT source, count(*) AS total_fps,
                   count(DISTINCT f) AS distinct_fps
            FROM e GROUP BY source ORDER BY source
        """,
        "text_signals": f"""
            WITH qsrc AS (
              SELECT source,
                     len(ws) AS n_words,
                     len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','it')))::double
                        / len(ws) AS stop_ratio,
                     list_sum(list_transform(ws, w -> len(w)))::double / len(ws) AS mwl
              FROM (SELECT source, {_DUCK_WORDS} ws FROM documents)),
            q AS (
              SELECT source,
                     round(avg(round(0.4 * least(1.0, n_words / 64.0)
                             + 0.3 * least(1.0, stop_ratio * 5.0)
                             + 0.3 * least(1.0, mwl / 6.0), 6)), 6) AS avg_quality,
                     round(avg(round(stop_ratio, 6)), 6) AS avg_stop_ratio,
                     round(avg(round(mwl, 6)), 6) AS avg_word_len
              FROM qsrc GROUP BY source),
            rsrc AS (
              SELECT source,
                round(CASE WHEN len(ws) > 0
                  THEN 1.0 - len(list_distinct(ws))::double / len(ws)
                  ELSE 0 END, 6) AS dw,
                round(CASE WHEN len(ws) >= 2
                  THEN 1.0 - len(list_distinct(
                    [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
                  ))::double / (len(ws) - 1) ELSE 0 END, 6) AS d2,
                round(CASE WHEN len(ws) >= 3
                  THEN 1.0 - len(list_distinct(
                    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws)-1)]
                  ))::double / (len(ws) - 2) ELSE 0 END, 6) AS d3
              FROM (SELECT source, {_DUCK_WORDS} ws FROM documents)),
            r AS (
              SELECT source, count(*) AS n_docs,
                     round(avg(dw), 6) AS avg_dup_word,
                     round(avg(d2), 6) AS avg_dup_2gram,
                     round(avg(d3), 6) AS avg_dup_3gram,
                     round(max(d3), 6) AS max_dup_3gram
              FROM rsrc GROUP BY source)
            SELECT q.source AS source, q.avg_quality, q.avg_stop_ratio,
                   q.avg_word_len, r.n_docs, r.avg_dup_word,
                   r.avg_dup_2gram, r.avg_dup_3gram, r.max_dup_3gram
            FROM q JOIN r ON q.source = r.source ORDER BY source
        """,
        "unigram_scores": _unigram_oracle_sql(),
        "doc_fingerprints": f"""
            SELECT count(*) AS n_docs,
                   count(DISTINCT md5(array_to_string({_DUCK_WORDS}, ' '))) AS n_distinct
            FROM documents
        """,
        "exact_dup_groups": f"""
            SELECT md5(array_to_string({_DUCK_WORDS}, ' ')) AS fingerprint,
                   count(*) AS group_size, min(doc_id) AS keep_doc_id
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
        """,
        "ngram_jaccard": _SHINGLE_SQL + " ORDER BY d1, d2",
        "minhash_lsh_dedup": _SHINGLE_SQL + " ORDER BY d1, d2",
        "embedding_topk": """
            WITH pairs AS (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     list_dot_product(q.emb_d, e.emb_d)
                       / (sqrt(list_dot_product(q.emb_d, q.emb_d))
                          * sqrt(list_dot_product(e.emb_d, e.emb_d))) AS cosine
              FROM (SELECT vec_id, list_transform(embedding, x -> x::double) emb_d
                    FROM embeddings WHERE vec_id < 16) q
              JOIN (SELECT vec_id, list_transform(embedding, x -> x::double) emb_d
                    FROM embeddings) e
                ON q.vec_id <> e.vec_id),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM pairs)
            SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank
            FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
        """,
        "filters_membership": f"""
            WITH w AS (SELECT count(DISTINCT x) AS nw
                       FROM (SELECT unnest({_DUCK_WORDS}) AS x FROM documents)),
                 d AS (SELECT count(*) AS nd FROM documents)
            SELECT k.kind,
                   CASE WHEN k.kind = 'doc_id' THEN d.nd ELSE w.nw END AS n_probed,
                   0::BIGINT AS false_negatives,
                   true AS fpr_ok
            FROM (VALUES ('bloom'), ('blocked_bloom'), ('two_choice'),
                         ('cuckoo'), ('pf_bloom'), ('pf_tc'), ('pf_cf'),
                         ('pf_bbf'), ('pf_impala'), ('pf_xor'), ('xor'),
                         ('bfuse'), ('ribbon'), ('pf_ribbon'),
                         ('ribbon_map'), ('quotient'), ('doc_id')) AS k(kind),
                 w, d
            ORDER BY kind
        """,
        "per_source_distinct": f"""
            SELECT source, count(DISTINCT w) AS exact_distinct, true AS hll_ok
            FROM (SELECT source, unnest({_DUCK_WORDS}) AS w FROM documents)
            GROUP BY source ORDER BY source
        """,
        "top_events_per_user": """
            WITH r AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rnk
              FROM events)
            SELECT user_id, event_id, round(value, 6) AS value, rnk
            FROM r WHERE rnk <= 3 ORDER BY user_id, rnk
        """,
        "salted_source_counts": """
            SELECT source, count(*) AS n FROM documents
            GROUP BY source ORDER BY source
        """,
        "lang_predictions": """
            SELECT lang, count(*) AS n_docs,
                   true AS planted_acc_ok, true AS preds_valid
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "media_features": """
            SELECT CASE WHEN (i % 2) = 0 THEN 'image' ELSE 'audio' END AS kind,
                   count(*) AS n, count(*) AS n_ok, true AS features_ok
            FROM (SELECT unnest(range(256)) AS i)
            GROUP BY 1 ORDER BY 1
        """,
        "distinct_sketches": f"""
            WITH a AS (SELECT DISTINCT unnest({_DUCK_WORDS}) AS w
                       FROM documents WHERE doc_id % 2 = 0),
                 b AS (SELECT DISTINCT unnest({_DUCK_WORDS}) AS w
                       FROM documents WHERE doc_id % 2 = 1)
            SELECT
              (SELECT count(DISTINCT w)
               FROM (SELECT unnest({_DUCK_WORDS}) AS w FROM documents))
                AS exact_distinct,
              true AS hll_ok,
              (SELECT count(*) FROM (SELECT w FROM a UNION SELECT w FROM b))
                AS exact_union,
              (SELECT count(*) FROM (SELECT w FROM a INTERSECT SELECT w FROM b))
                AS exact_intersection,
              (SELECT count(*) FROM (SELECT w FROM a EXCEPT SELECT w FROM b))
                AS exact_a_minus_b,
              true AS kmv_union_ok, true AS kmv_inter_ok, true AS kmv_diff_ok
        """,
        "boilerplate_lines": """
            WITH split AS (
              SELECT doc_id,
                     string_split(
                       replace(replace(replace(replace(replace(replace(text,
                         ' the ', chr(10)), ' a ', chr(10)), ' table ', chr(10)),
                         ' value ', chr(10)), ' fast ', chr(10)), ' row ', chr(10)),
                       chr(10)) AS lst
              FROM documents),
            lines AS (
              SELECT doc_id, i AS pos, trim(lst[i]) AS line
              FROM split, UNNEST(generate_series(1, len(lst))) AS s(i)
              WHERE trim(lst[i]) <> ''),
            thr AS (
              SELECT greatest(2, (count(*) + 49) // 50) AS min_docs
              FROM documents),
            freq AS (
              SELECT line FROM lines GROUP BY line
              HAVING count(DISTINCT doc_id) >= (SELECT min_docs FROM thr)),
            kept AS (
              SELECT l.doc_id, l.pos, l.line FROM lines l
              LEFT JOIN freq f ON l.line = f.line WHERE f.line IS NULL),
            agg AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                     count(*) AS n_lines_kept
              FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, count(*) AS n FROM lines GROUP BY doc_id)
            SELECT s.doc_id, coalesce(a.text, '') AS text,
                   coalesce(a.n_lines_kept, 0) AS n_lines_kept,
                   coalesce(t.n, 0) - coalesce(a.n_lines_kept, 0)
                     AS n_lines_dropped
            FROM split s
            LEFT JOIN agg a USING (doc_id) LEFT JOIN tot t USING (doc_id)
            ORDER BY doc_id
        """,
        "heavy_hitters": f"""
            (SELECT 'cms' AS sketch, w AS word, count(*) AS cnt, true AS sketch_ok
             FROM (SELECT unnest({_DUCK_WORDS}) AS w FROM documents)
             GROUP BY w ORDER BY cnt DESC, w LIMIT 10)
            UNION ALL
            (SELECT 'mg' AS sketch, w AS word, count(*) AS cnt, true AS sketch_ok
             FROM (SELECT unnest({_DUCK_WORDS}) AS w FROM documents)
             GROUP BY w ORDER BY cnt DESC, w LIMIT 10)
        """,
        "span_dedup": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents),
            grams AS (
              SELECT doc_id, i - 1 AS pos, array_to_string(ws[i : i + 4], ' ') AS g
              FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
                    FROM toks WHERE len(ws) >= 5)),
            dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
            marked AS (SELECT doc_id, pos FROM grams
                       WHERE g IN (SELECT g FROM dup)),
            isl AS (SELECT doc_id, pos,
                           pos - row_number() OVER (PARTITION BY doc_id
                                                    ORDER BY pos) AS grp
                    FROM marked)
            SELECT doc_id, min(pos) AS start_pos, max(pos) + 4 AS end_pos,
                   count(*) AS n_grams
            FROM isl GROUP BY doc_id, grp
            ORDER BY doc_id, start_pos
        """,
        "dsir_select": f"""
            WITH toks AS (SELECT doc_id, lang, {_DUCK_WORDS} AS ws FROM documents),
            feats AS (
              SELECT doc_id, lang, unnest(ws) AS w FROM toks
              UNION ALL
              SELECT doc_id, lang, array_to_string(ws[i : i + 1], ' ') AS w
              FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i
                    FROM toks WHERE len(ws) >= 2)),
            bucketed AS (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT % 10000 AS BIGINT)
                       AS bucket
              FROM feats),
            rcnt AS (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket),
            tcnt AS (SELECT bucket, count(*) AS cnt FROM bucketed
                     WHERE lang = 'en' GROUP BY bucket),
            rtot AS (SELECT sum(cnt) AS total FROM rcnt),
            ttot AS (SELECT coalesce(sum(cnt), 0) AS total FROM tcnt),
            ratio AS (
              SELECT coalesce(r.bucket, t.bucket) AS bucket,
                     CAST(round((coalesce(ln((t.cnt + 1)::DOUBLE
                                             / (ttot.total + 10000)::DOUBLE),
                                          ln(1.0 / (ttot.total + 10000)::DOUBLE))
                               - coalesce(ln((r.cnt + 1)::DOUBLE
                                             / (rtot.total + 10000)::DOUBLE),
                                          ln(1.0 / (rtot.total + 10000)::DOUBLE)))
                                * 10000) AS BIGINT) AS ratio_fp
              FROM rcnt r FULL OUTER JOIN tcnt t ON r.bucket = t.bucket, rtot, ttot),
            per_doc AS (
              SELECT b.doc_id, sum(ratio_fp) AS weight_fp, count(*) AS n_feats
              FROM bucketed b JOIN ratio USING (bucket) GROUP BY b.doc_id),
            weights AS (
              SELECT d.doc_id, CAST(coalesce(weight_fp, 0) AS BIGINT) AS weight_fp,
                     CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats
              FROM documents d LEFT JOIN per_doc USING (doc_id)),
            ranked AS (
              SELECT *, row_number() OVER (ORDER BY weight_fp DESC, doc_id) AS rk,
                     (SELECT count(*) FROM weights) AS n
              FROM weights)
            SELECT doc_id, weight_fp, n_feats
            FROM ranked WHERE rk <= CAST(ceil(0.1 * n) AS BIGINT)
            ORDER BY doc_id
        """,
        "decontaminate": f"""
            WITH w AS (SELECT doc_id, {_DUCK_WORDS} ws FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
                   FROM w),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
            corp AS (SELECT * FROM sh WHERE doc_id % 17 <> 0)
            SELECT doc_id, count(*) AS n_shared
            FROM corp JOIN bench USING (s)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "join_cardinality": """
            SELECT
              (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_keys_lineitem,
              (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_keys_orders,
              (SELECT count(*) FROM
                 (SELECT DISTINCT l_orderkey FROM lineitem) a
                 JOIN (SELECT DISTINCT o_orderkey FROM orders) b
                   ON a.l_orderkey = b.o_orderkey) AS n_shared,
              (SELECT count(*) FROM lineitem JOIN orders
                 ON l_orderkey = o_orderkey) AS join_rows,
              (SELECT CAST(sum(c * c) AS BIGINT) FROM
                 (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey))
                AS self_join_rows_lineitem,
              true AS kmv_ok, true AS ams_ok
        """,
        "srp_near_dup_pairs": """
            WITH base AS (
              SELECT vec_id, list_transform(embedding, x -> x::double) d
              FROM embeddings),
            planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     [CASE WHEN i = 1 THEN d[i] * 1.25 ELSE d[i] END
                      for i in range(1, len(d) + 1)] AS d
              FROM base),
            allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
            p AS (
              SELECT a.vec_id v1, b.vec_id v2,
                     list_dot_product(a.d, b.d)
                       / (sqrt(list_dot_product(a.d, a.d))
                          * sqrt(list_dot_product(b.d, b.d))) AS c
              FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
            SELECT v1, v2, round(c, 6) AS cosine
            FROM p WHERE c >= 0.95 ORDER BY v1, v2
        """,
        "semdedup_pairs": """
            WITH base AS (
              SELECT vec_id, list_transform(embedding, x -> x::double) d
              FROM embeddings),
            planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     [CASE WHEN i = 1 THEN d[i] * 1.25 ELSE d[i] END
                      for i in range(1, len(d) + 1)] AS d
              FROM base),
            allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
            p AS (
              SELECT a.vec_id v1, b.vec_id v2,
                     list_dot_product(a.d, b.d)
                       / (sqrt(list_dot_product(a.d, a.d))
                          * sqrt(list_dot_product(b.d, b.d))) AS c
              FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
            SELECT v1, v2, round(c, 6) AS cosine,
                   true AS semdedup_recall_ok
            FROM p WHERE c >= 0.95 ORDER BY v1, v2
        """,
        "pii_scrub": _pii_oracle_sql(),
        "bpe_train": _bpe_train_oracle_sql(10),
        "table_profile": """
            SELECT 'doc_id' AS "column", count(*) AS n_rows,
                   count(*) - count(doc_id) AS n_nulls,
                   count(DISTINCT doc_id) AS n_distinct,
                   min(doc_id)::varchar AS min_value,
                   max(doc_id)::varchar AS max_value
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(*) - count(n_chars),
                   count(DISTINCT n_chars),
                   min(n_chars)::varchar, max(n_chars)::varchar
            FROM documents
            UNION ALL
            SELECT 'source', count(*), count(*) - count(source),
                   count(DISTINCT source),
                   min(source)::varchar, max(source)::varchar
            FROM documents
            ORDER BY "column"
        """,
        "epoch_order": """
            WITH h AS (
              SELECT doc_id,
                     (((doc_id + 506952113) % 2147483648)
                       * 1103515245 + 12345) % 2147483648 AS hv
              FROM documents)
            SELECT doc_id,
                   row_number() OVER (ORDER BY hv, doc_id) AS epoch_rank,
                   hv % 8 AS shard,
                   row_number() OVER (PARTITION BY hv % 8
                                      ORDER BY hv, doc_id) AS shard_rank
            FROM h ORDER BY doc_id
        """,
        "quantize_embeddings": """
            WITH e AS (SELECT vec_id,
                         list_transform(embedding, x -> x::double) d
                       FROM embeddings),
            s AS (SELECT vec_id, d,
                    list_max(list_transform(d, x -> abs(x))) / 127.0 AS scale
                  FROM e),
            q AS (SELECT vec_id, d, scale,
                    CASE WHEN scale > 0
                         THEN list_transform(d, x -> round(x / scale))
                         ELSE list_transform(d, x -> 0.0) END AS qc
                  FROM s),
            err AS (SELECT vec_id, scale, qc,
                      list_max([abs(d[i] - qc[i] * scale)
                                for i in range(1, len(d) + 1)]) AS e
                    FROM q)
            SELECT vec_id, round(scale, 6) AS scale,
                   list_sum(qc)::BIGINT AS q_sum,
                   round(e, 6) AS max_abs_err,
                   e <= scale / 2 + 1e-12 AS bound_ok
            FROM err ORDER BY vec_id
        """,
        "dup_components": _CHAIN_CC_SQL + """
            SELECT node, min(comp) AS component
            FROM r GROUP BY node ORDER BY node
        """,
        "dup_keep_list": _CHAIN_CC_SQL + """
            , comp AS (SELECT node, min(comp) AS component
                       FROM r GROUP BY node)
            SELECT c.doc_id,
                   coalesce(comp.component, c.doc_id) AS component,
                   (comp.component IS NULL
                    OR comp.component = c.doc_id) AS keep
            FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id
            ORDER BY doc_id
        """,
        "hot_bucket_pairs": """
            SELECT a.doc_id AS d1, b.doc_id AS d2
            FROM documents a JOIN documents b
              ON a.doc_id % 3 = b.doc_id % 3 AND a.doc_id < b.doc_id
            ORDER BY d1, d2
        """,
        "leakage_split": _CHAIN_CC_SQL + """
            , comp AS (SELECT node, min(comp) AS component
                       FROM r GROUP BY node),
            wc AS (SELECT c.doc_id,
                          coalesce(comp.component, c.doc_id) AS component
                   FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id)
            SELECT doc_id, component,
                   CASE WHEN (((component + 17) % 2147483648)
                              * 1103515245 + 12345)
                             % 2147483648 < 429496729
                        THEN 'test' ELSE 'train' END AS split
            FROM wc ORDER BY doc_id
        """,
        "lm_perplexity": f"""
            WITH w AS (SELECT doc_id, {_DUCK_WORDS} ws FROM documents),
            tbg AS (
              SELECT unnest(ws[1:len(ws)-1]) AS w1,
                     unnest(ws[2:len(ws)]) AS w2
              FROM w WHERE doc_id % 10 <> 0 AND len(ws) >= 2),
            cb AS (SELECT w1, w2, count(*) AS c_bg FROM tbg GROUP BY w1, w2),
            cu AS (SELECT w1, count(*) AS c_u FROM tbg GROUP BY w1),
            v AS (SELECT count(DISTINCT x) AS v
                  FROM (SELECT unnest(ws) AS x
                        FROM w WHERE doc_id % 10 <> 0)),
            sbg AS (
              SELECT doc_id,
                     unnest(ws[1:len(ws)-1]) AS w1,
                     unnest(ws[2:len(ws)]) AS w2
              FROM w WHERE doc_id % 10 = 0 AND len(ws) >= 2),
            nll AS (
              SELECT doc_id,
                     -log2((coalesce(c_bg, 0) + 0.5)
                           / (coalesce(c_u, 0) + 0.5 * v.v)) AS nll
              FROM sbg
              LEFT JOIN cb USING (w1, w2)
              LEFT JOIN cu USING (w1), v),
            -- quantize each nll to 1e-9 and sum exact integers: the
            -- same order-free deterministic reduction as the Spark op
            nq AS (SELECT doc_id,
                          CAST(round(nll * 1e9) AS BIGINT) AS nll_q
                   FROM nll),
            -- interpolated Kneser-Ney trigram arm (operators/lm_score.py
            -- kn_perplexity): same count derivation, D=0.75, alpha=0.5
            ttg AS (
              SELECT unnest(ws[1:len(ws)-2]) AS u,
                     unnest(ws[2:len(ws)-1]) AS v,
                     unnest(ws[3:len(ws)]) AS w
              FROM w WHERE doc_id % 10 <> 0 AND len(ws) >= 3),
            tri AS (SELECT u, v, w, count(*) AS c_uvw FROM ttg GROUP BY u, v, w),
            ctx AS (SELECT u, v, sum(c_uvw) AS c_uv, count(*) AS n1p_uv
                    FROM tri GROUP BY u, v),
            cvw AS (SELECT v, w, count(*) AS n1p_vw FROM tri GROUP BY v, w),
            mid AS (SELECT v, sum(n1p_vw) AS n1p_v_all, count(*) AS n1p_v_types
                    FROM cvw GROUP BY v),
            cw  AS (SELECT w, count(*) AS n1p_w FROM cvw GROUP BY w),
            tot AS (SELECT count(*) AS n1p_total, count(DISTINCT w) AS v_cont
                    FROM cvw),
            stg AS (
              SELECT doc_id,
                     unnest(ws[1:len(ws)-2]) AS u,
                     unnest(ws[2:len(ws)-1]) AS v,
                     unnest(ws[3:len(ws)]) AS w
              FROM w WHERE doc_id % 10 = 0 AND len(ws) >= 3),
            kp AS (
              SELECT doc_id,
                     (coalesce(n1p_w, 0) + 0.5)
                       / (tot.n1p_total + 0.5 * (tot.v_cont + 1)) AS p1,
                     coalesce(c_uvw, 0)::DOUBLE AS c_uvw,
                     coalesce(c_uv, 0)::DOUBLE AS c_uv,
                     coalesce(n1p_uv, 0)::DOUBLE AS n1p_uv,
                     coalesce(n1p_vw, 0)::DOUBLE AS n1p_vw,
                     coalesce(n1p_v_all, 0)::DOUBLE AS n1p_v_all,
                     coalesce(n1p_v_types, 0)::DOUBLE AS n1p_v_types
              FROM stg
              LEFT JOIN tri USING (u, v, w)
              LEFT JOIN ctx USING (u, v)
              LEFT JOIN mid USING (v)
              LEFT JOIN cvw USING (v, w)
              LEFT JOIN cw  USING (w), tot),
            kp2 AS (
              SELECT doc_id,
                     CASE WHEN n1p_v_all > 0
                          THEN greatest(n1p_vw - 0.75, 0.0) / n1p_v_all
                               + 0.75 * n1p_v_types / n1p_v_all * p1
                          ELSE p1 END AS p2,
                     c_uvw, c_uv, n1p_uv
              FROM kp),
            knll AS (
              SELECT doc_id,
                     CAST(round(-log2(
                       CASE WHEN c_uv > 0
                            THEN greatest(c_uvw - 0.75, 0.0) / c_uv
                                 + 0.75 * n1p_uv / c_uv * p2
                            ELSE p2 END) * 1e9) AS BIGINT) AS nll_q
              FROM kp2)
            SELECT 'bigram2' AS model, doc_id, count(*) AS n_grams,
                   round(sum(nll_q) / (count(*) * 1e9), 4) AS avg_nll,
                   round(pow(2.0, sum(nll_q) / (count(*) * 1e9)), 2) AS perplexity
            FROM nq GROUP BY doc_id
            UNION ALL
            SELECT 'kn3' AS model, doc_id, count(*) AS n_grams,
                   round(sum(nll_q) / (count(*) * 1e9), 4) AS avg_nll,
                   round(pow(2.0, sum(nll_q) / (count(*) * 1e9)), 2) AS perplexity
            FROM knll GROUP BY doc_id
            ORDER BY model, doc_id
        """,
        "mixture_sample": """
            WITH r AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rk,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents),
            s AS (SELECT *,
                    CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                                WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.125
                                ELSE 0.0625 END::DOUBLE AS frac
                  FROM r)
            SELECT source, min(n)::BIGINT AS n_total, count(*) AS n_sampled,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM s WHERE rk <= ceil(frac * n)
            GROUP BY source ORDER BY source
        """,
        "sequence_packing": f"""
            WITH t AS (SELECT doc_id, len({_DUCK_WORDS}) AS n_tok FROM documents),
            c AS (SELECT doc_id, n_tok,
                    coalesce(sum(n_tok) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                  FROM t)
            SELECT (off // 2048)::BIGINT AS pack_id, count(*) AS n_docs,
                   sum(n_tok)::BIGINT AS n_tokens,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "sketch_quantiles": f"""
            WITH d AS (SELECT len({_DUCK_WORDS}) AS n_words FROM documents)
            SELECT 'n_words' AS metric, q::double AS q,
                   round(qv, 6) AS exact_quantile,
                   true AS kll_ok, true AS tdigest_ok, true AS dds_ok
            FROM (
              SELECT 0.1 AS q, quantile_cont(n_words, 0.1) AS qv FROM d
              UNION ALL SELECT 0.25, quantile_cont(n_words, 0.25) FROM d
              UNION ALL SELECT 0.5, quantile_cont(n_words, 0.5) FROM d
              UNION ALL SELECT 0.75, quantile_cont(n_words, 0.75) FROM d
              UNION ALL SELECT 0.9, quantile_cont(n_words, 0.9) FROM d
              UNION ALL SELECT 0.99, quantile_cont(n_words, 0.99) FROM d
            )
            UNION ALL
            SELECT 'value' AS metric, q::double AS q,
                   round(qv, 6) AS exact_quantile,
                   true AS kll_ok, true AS tdigest_ok, true AS dds_ok
            FROM (
              SELECT 0.1 AS q, quantile_cont(value, 0.1) AS qv FROM events
              UNION ALL SELECT 0.5, quantile_cont(value, 0.5) FROM events
              UNION ALL SELECT 0.9, quantile_cont(value, 0.9) FROM events
              UNION ALL SELECT 0.99, quantile_cont(value, 0.99) FROM events
            )
        """,
        "pf_join_probe": f"""
            SELECT count(DISTINCT w) AS n_probed, 0::BIGINT AS false_negatives
            FROM (SELECT unnest({_DUCK_WORDS}) AS w FROM documents)
        """,
        "runtime_filter_join": """
            SELECT l_returnflag, count(*) AS n_rows,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "ann_topk": """
            WITH pairs AS (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     list_dot_product(q.emb_d, e.emb_d)
                       / (sqrt(list_dot_product(q.emb_d, q.emb_d))
                          * sqrt(list_dot_product(e.emb_d, e.emb_d))) AS cosine
              FROM (SELECT vec_id, list_transform(embedding, x -> x::double) emb_d
                    FROM embeddings WHERE vec_id < 8) q
              JOIN (SELECT vec_id, list_transform(embedding, x -> x::double) emb_d
                    FROM embeddings) e
                ON q.vec_id <> e.vec_id),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM pairs)
            SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank,
                   true AS srp_recall_ok, true AS ivf_recall_ok,
                   true AS pq_recall_ok
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "zorder_morton": """
            WITH stats AS (
              SELECT min(user_id) AS lo_a, max(user_id) AS hi_a,
                     min(event_id) AS lo_b, max(event_id) AS hi_b
              FROM events),
            r AS (
              SELECT event_id,
                     least(CAST(floor(((user_id::DOUBLE - lo_a::DOUBLE)
                              / (hi_a::DOUBLE - lo_a::DOUBLE)) * 65536.0)
                            AS BIGINT), 65535) AS a,
                     least(CAST(floor(((event_id::DOUBLE - lo_b::DOUBLE)
                              / (hi_b::DOUBLE - lo_b::DOUBLE)) * 65536.0)
                            AS BIGINT), 65535) AS b
              FROM events, stats),
            s1 AS (SELECT event_id, (a | (a << 16)) & 281470681808895 AS a,
                          (b | (b << 16)) & 281470681808895 AS b FROM r),
            s2 AS (SELECT event_id, (a | (a << 8)) & 71777214294589695 AS a,
                          (b | (b << 8)) & 71777214294589695 AS b FROM s1),
            s3 AS (SELECT event_id, (a | (a << 4)) & 1085102592571150095 AS a,
                          (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
            s4 AS (SELECT event_id, (a | (a << 2)) & 3689348814741910323 AS a,
                          (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
            s5 AS (SELECT event_id, (a | (a << 1)) & 6148914691236517205 AS a,
                          (b | (b << 1)) & 6148914691236517205 AS b FROM s4)
            SELECT event_id, (a | (b << 1)) AS z FROM s5 ORDER BY event_id
        """,
        "simhash_pairs": """
            SELECT (SELECT count(*) FROM documents WHERE n_chars % 17 = 0)
                     AS n_planted,
                   true AS planted_found, true AS hamming_ok,
                   (SELECT count(*) FROM documents
                    WHERE len(string_split(text, ' ')) >= 60
                      AND doc_id % 13 = 0) AS n_near,
                   true AS near_recall_ok
        """,
    }
