"""Round-4c: positional-filter Jaccard, substring-run dedup, ORC
round-trip, schema evolution, base+delta ANN serving."""

from __future__ import annotations

import itertools
import random

import pytest

from tests.test_round4b import _py_shingle_hashes


@pytest.mark.parametrize("t_num,t_den", [(3, 10), (1, 2), (7, 10), (1, 1)])
def test_positional_jaccard_matches_bruteforce(spark, t_num, t_den):
    """PPJoin positional filter is exactness-preserving at arbitrary
    rational thresholds: output == brute-force all-pairs Jaccard."""
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(25)]
    docs = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.6:
            mut = list(base)
            if mut and rng.random() < 0.7:
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            docs.append((100 + i, " ".join(mut)))

    expected = set()
    hsets = {i: _py_shingle_hashes(t) for i, t in docs}
    for (a, ha), (b, hb) in itertools.combinations(sorted(hsets.items()), 2):
        inter, union = len(ha & hb), len(ha | hb)
        if t_den * inter >= t_num * union:
            expected.add((a, b, inter, union))

    df = spark.createDataFrame(docs, "doc_id long, text string") \
        .repartition(4)
    got = {(r.doc_a, r.doc_b, r.inter_n, r.union_n)
           for r in prefix_filter_jaccard_pairs(
               df, "doc_id", "text", t_num=t_num, t_den=t_den,
               positional=True).collect()}
    assert got == expected
    assert expected  # planted near-dups must produce pairs


def test_positional_filter_only_prunes(spark):
    """The positional path's VERIFIED output equals the plain prefix
    path's on the same corpus (the filter may only discard candidates
    that could never verify)."""
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(18)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 10))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plain = {tuple(r) for r in prefix_filter_jaccard_pairs(
        df, "doc_id", "text", t_num=7, t_den=10).collect()}
    pos = {tuple(r) for r in prefix_filter_jaccard_pairs(
        df, "doc_id", "text", t_num=7, t_den=10,
        positional=True).collect()}
    assert pos == plain
