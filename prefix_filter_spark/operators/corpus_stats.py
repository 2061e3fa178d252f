"""Corpus power-law statistics: Zipf rank-frequency slope and Heaps
vocabulary-growth exponent — the two standard corpus-health dashboards
(a crawl whose Zipf slope drifts far from -1 or whose Heaps exponent
collapses is usually boilerplate-flooded or deduplicated wrong).

Both reduce to ONE corpus-scale aggregation each, after which
everything is vocab-scale:

- Zipf: word counts (groupBy(word)), take the top ``max_rank`` by
  (count desc, word) and least-squares fit log10(freq) on log10(rank).
- Heaps V(n) ~ K n^beta: for every word, its FIRST-occurrence global
  token position; then V(n) = #{words: first_pos <= n} sampled at
  geometric checkpoints and fit in log space. First positions come
  from one groupBy(word).min over the posexploded token stream — no
  sequential scan, no per-prefix distinct jobs.

Token positions are assigned by (doc_id, pos-in-doc) order, so the
"growth curve" is over the deterministic doc_id ordering — a pure
function of the corpus, partition-invariant (pytest-pinned). Fits are
driver-side float64 over exact integer inputs.

No reference counterpart; extends the text-analytics family
(SURVEY §2.7).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefix_filter_spark.sources.tokenizer import words_col


def _fit_loglog(xs, ys) -> tuple[float, float, float]:
    """Least-squares fit of log10(y) = a + b*log10(x); returns
    (slope b, intercept a, r^2)."""
    lx = [math.log10(x) for x in xs]
    ly = [math.log10(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    sxx = sum((x - mx) ** 2 for x in lx)
    sxy = sum((x - mx) * (y - my) for x, y in zip(lx, ly))
    syy = sum((y - my) ** 2 for y in ly)
    b = sxy / sxx if sxx else 0.0
    a = my - b * mx
    r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else 1.0
    return b, a, r2


def corpus_power_laws(
    docs: DataFrame,
    text_col: str = "text",
    max_rank: int = 5000,
    n_checkpoints: int = 20,
) -> dict:
    """-> {n_tokens, vocab_size, zipf_slope, zipf_intercept, zipf_r2,
    heaps_beta, heaps_k, heaps_r2} as plain Python floats/ints (a
    report, not a table — the vocab-scale intermediates never leave
    the cluster; only the fitted scalars and checkpoint counts do)."""
    if n_checkpoints < 2:
        raise ValueError("n_checkpoints must be >= 2 (the fit needs 2 points)")
    ws = docs.select(
        F.col("doc_id"), words_col(text_col).alias("_ws")
    ).where(F.size("_ws") > 0)
    toks = ws.select(
        "doc_id", F.posexplode("_ws").alias("pos", "word")
    )
    counts = toks.groupBy("word").agg(F.count("*").alias("c")).cache()
    agg = counts.agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("vocab")
    ).collect()[0]
    n_tokens, vocab = int(agg["n_tokens"] or 0), int(agg["vocab"])
    if n_tokens == 0:
        counts.unpersist()
        return {"n_tokens": 0, "vocab_size": 0}

    top = (
        counts.orderBy(F.desc("c"), "word").limit(max_rank).collect()
    )
    zipf_slope, zipf_icpt, zipf_r2 = _fit_loglog(
        range(1, len(top) + 1), [r["c"] for r in top]
    )

    # global token position: each doc's offset is the exclusive prefix
    # sum of earlier docs' token counts in doc_id order — computed with
    # packing.pack_assignments' two-pass distributed prefix sum (a
    # global running-sum window here would serialize into one task at
    # corpus scale, the exact cliff packing.py exists to avoid).
    from prefix_filter_spark.operators.packing import pack_assignments

    # tiny (one long per doc) — cached so pack_assignments' three
    # internal scans don't re-run the corpus tokenization each time
    sizes = ws.select("doc_id", F.size("_ws").alias("n")).cache()
    offsets = pack_assignments(sizes, "doc_id", "n", budget=2**62).select(
        "doc_id", F.col("tok_offset").alias("off")
    )
    firsts = (
        toks.join(offsets, "doc_id")
        .select("word", (F.col("off") + F.col("pos") + 1).alias("gpos"))
        .groupBy("word")
        .agg(F.min("gpos").alias("first_pos"))
    )
    # geometric checkpoints; V(n) for all of them in ONE aggregation
    cps = sorted(
        {
            max(1, int(round(n_tokens ** (i / (n_checkpoints - 1)))))
            for i in range(n_checkpoints)
        }
    )
    vrow = firsts.agg(
        *[
            F.sum((F.col("first_pos") <= n).cast("long")).alias(f"v{i}")
            for i, n in enumerate(cps)
        ]
    ).collect()[0]
    vs = [int(vrow[f"v{i}"]) for i in range(len(cps))]
    keep = [(n, v) for n, v in zip(cps, vs) if v > 0]
    heaps_beta, heaps_a, heaps_r2 = _fit_loglog(
        [n for n, _ in keep], [v for _, v in keep]
    )
    counts.unpersist()
    sizes.unpersist()
    return {
        "n_tokens": n_tokens,
        "vocab_size": vocab,
        "zipf_slope": zipf_slope,
        "zipf_intercept": zipf_icpt,
        "zipf_r2": zipf_r2,
        "heaps_beta": heaps_beta,
        "heaps_k": 10.0 ** heaps_a,
        "heaps_r2": heaps_r2,
        "heaps_checkpoints": keep,
    }
