"""Round-5 queries.

Opens with the suffix filter (d53) — the third exactness-preserving
candidate shrinker in the AllPairs/PPJoin family (d47 prefix, d49
positional), closing the PPJoin+ set of Xiao et al. WWW'08.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (round-5 queries)

from etl_docker_spark.plans._util import dec, t  # noqa: F401

ROUND5: dict = {}

# ---------------------------------------------------------------- d53


def d53_suffix_filter_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.7 pairs with the FULL PPJoin+ filter
    stack: prefix + positional + suffix filtering — d49's documented
    next shrinker, for adversarial corpora where prefix collisions
    survive the positional bound (near-identical sizes, early first
    match) yet can't verify. Zero false negatives: the suffix filter
    only removes candidates whose K-bucket histogram overlap bound
    sum_k min(histA[k], histB[k]) is below the Jaccard minoverlap, so
    the output is identical to d49's (and to the brute-force oracle)
    by construction — the gate pins exactly that.

    See `llm/dedup.py:prefix_filter_jaccard_pairs(suffix_buckets=32)`
    for the distributed re-shape of Xiao's sequential divide-and-conquer
    probe (a 256-byte histogram sketch per doc replaces the recursive
    partitioning; the bound is coarser per-probe but order-free,
    joinable, and computed once per candidate). Measured at sf0.1:
    104,475 prefix candidates -> 33,316 after positional -> 257 after
    suffix (K=32) for 256 true pairs — 99.6% filter precision, with
    the full table in SCALE.md.
    """
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        t_num=7, t_den=10, positional=True, suffix_buckets=32)


from etl_docker_spark.plans.round4c import D49_SQL  # noqa: E402

# Identical ground truth: the filter stack only prunes non-qualifying
# candidates, so the brute-force all-pairs oracle is shared with d49.
D53_SQL = D49_SQL

ROUND5.update({
    "d53_suffix_filter_jaccard": (d53_suffix_filter_jaccard, D53_SQL),
})
