"""Per-source overlap matrix (operators/overlap.py).

Gates: planted mirror pair reads jaccard ~1 and a disjoint source ~0;
every estimate within KMV bounds of the EXACT pairwise Jaccard
(computed in Spark on the same shingle stream); output shape/ordering
deterministic.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.operators.overlap import (
    source_overlap_matrix,
    source_shingles,
)
from prefix_filter_spark.sketches import kmv

K = 3


@pytest.fixture(scope="module")
def corpus(spark):
    # site_a and mirror share all text; other is disjoint
    base = [
        f"shared passage number {i} with enough words to form grams"
        for i in range(40)
    ]
    rows = (
        [(f"a{i}", t, "site_a") for i, t in enumerate(base)]
        + [(f"m{i}", t, "mirror") for i, t in enumerate(base)]
        + [
            (f"o{i}", f"completely different text body {i} nothing common here at all", "other")
            for i in range(40)
        ]
    )
    return spark.createDataFrame(rows, "doc_id string, text string, source string")


def test_mirror_pair_tops_matrix(corpus):
    out = source_overlap_matrix(corpus, k=K, cfg=kmv.KmvConfig(k=512, seed=9))
    assert list(out.columns) == ["a", "b", "jaccard", "n_common", "n_union", "n_a", "n_b"]
    assert len(out) == 3  # 3 sources -> 3 pairs
    top = out.iloc[0]
    assert {top["a"], top["b"]} == {"mirror", "site_a"}
    assert top["jaccard"] > 0.9
    # disjoint pairs near zero
    assert (out.iloc[1:]["jaccard"] < 0.1).all()


def test_estimates_within_kmv_bounds(corpus):
    cfg = kmv.KmvConfig(k=512, seed=9)
    out = source_overlap_matrix(corpus, k=K, cfg=cfg)
    sh = source_shingles(corpus, k=K).distinct().cache()
    exact = {}
    for src in ("site_a", "mirror", "other"):
        exact[src] = {
            r["g"] for r in sh.filter(F.col("group") == src).collect()
        }
    sh.unpersist()
    for _, row in out.iterrows():
        A, B = exact[row["a"]], exact[row["b"]]
        true_j = len(A & B) / len(A | B)
        # KMV jaccard err ~ sqrt(j(1-j)/k) + union-sample noise; 6
        # sigma at k=512 is ~0.13 worst case
        assert abs(row["jaccard"] - true_j) < 0.15
        assert abs(row["n_a"] - len(A)) <= 4 * len(A) / np.sqrt(cfg.k) + 2
        assert abs(row["n_b"] - len(B)) <= 4 * len(B) / np.sqrt(cfg.k) + 2


def test_deterministic(corpus):
    a = source_overlap_matrix(corpus, k=K, cfg=kmv.KmvConfig(k=256, seed=5))
    b = source_overlap_matrix(
        corpus.repartition(7), k=K, cfg=kmv.KmvConfig(k=256, seed=5)
    )
    assert a.equals(b)
