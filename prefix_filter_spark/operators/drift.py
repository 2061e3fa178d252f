"""Per-source distribution drift: KL divergence of each source's
unigram distribution from the corpus mixture — the dashboard that
catches a crawl snapshot going off the rails (a source whose KL jumps
between snapshots changed its content mix) and guides mixture
re-weighting.

For source s with add-alpha-smoothed word distribution p_s and corpus
distribution q over the corpus vocabulary V:

    kl(s) = Σ_w p_s(w) · log2(p_s(w) / q(w))    [bits]

Shape: ONE corpus-scale aggregation (groupBy(source, word)); everything
after is vocab-scale. The sum over the words a source never uses —
where p_s is the constant p0 = α/(n_s + α|V|) — FACTORS in closed
form:

    Σ_{w unobserved} p0·log2(p0/q(w))
      = p0·( |V|·log2(p0) − Σ_V log2 q(w) )
        − Σ_{w observed} p0·log2(p0/q(w))

so the |S|×|V| dense matrix never materializes: one corpus scalar
(Σ_V log2 q) + per-source sums over OBSERVED pairs only. All counts
are exact integers over known totals (partition-invariant); the log is
Catalyst float math, reported rounded (not hash-gated).

No reference counterpart; extends the corpus-analytics family
(SURVEY §2.7) beside corpus_stats and tokenizer_fertility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col


def source_drift(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """-> (source, n_tokens, n_types, kl_bits) per source, ordered by
    kl_bits descending (most-drifted first)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed KL diverges)")
    sw = (
        docs.select(
            F.col(group_col).alias("src"),
            F.explode(words_col(text_col)).alias("w"),
        )
        .groupBy("src", "w")
        .agg(F.count("*").alias("c"))
        .cache()
    )
    corpus = sw.groupBy("w").agg(F.sum("c").alias("c_all"))
    gl = sw.agg(F.sum("c").alias("n_all")).collect()[0]
    n_all = int(gl["n_all"] or 0)
    if n_all == 0:
        sw.unpersist()
        return docs.sparkSession.createDataFrame(
            [], "source string, n_tokens bigint, n_types bigint, kl_bits double"
        )
    a = float(alpha)
    cstats = corpus.agg(
        F.count("*").alias("v"),
        F.sum(F.log2((F.col("c_all") + a))).alias("sum_log_num"),
    ).collect()[0]
    vocab = int(cstats["v"])
    # Σ_V log2 q(w) = Σ_V log2(c_w + a) − |V|·log2(n_all + a|V|)
    import math

    sum_log_q = float(cstats["sum_log_num"]) - vocab * math.log2(n_all + a * vocab)

    totals = sw.groupBy("src").agg(
        F.sum("c").alias("n_s"), F.count("*").alias("types_s")
    )
    j = sw.join(corpus, "w").join(totals, "src")
    denom_s = F.col("n_s") + a * vocab
    ps = (F.col("c") + a) / denom_s
    p0 = a / denom_s
    q = (F.col("c_all") + a) / (n_all + a * vocab)
    obs = j.groupBy("src").agg(
        F.sum(ps * F.log2(ps / q)).alias("kl_obs"),
        F.sum(p0 * F.log2(p0 / q)).alias("kl_un_at_obs"),
        F.first("n_s").alias("n_s"),
        F.first("types_s").alias("types_s"),
    )
    p0c = a / (F.col("n_s") + a * vocab)
    kl = (
        F.col("kl_obs")
        + p0c * (vocab * F.log2(p0c) - F.lit(sum_log_q))
        - F.col("kl_un_at_obs")
    )
    out = obs.select(
        F.col("src").alias("source"),
        F.col("n_s").alias("n_tokens"),
        F.col("types_s").alias("n_types"),
        F.round(kl, 6).alias("kl_bits"),
    ).orderBy(F.desc("kl_bits"), "source")
    # the result is one tiny row per source: materialize it so the
    # corpus-scale sw cache can be released before returning (a
    # monitoring loop calling this per snapshot must not accumulate
    # pinned corpus partitions)
    out = out.localCheckpoint(eager=True)
    sw.unpersist()
    return out
