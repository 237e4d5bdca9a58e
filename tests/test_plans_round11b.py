"""d75 (transposed+typo fuzzy dedup) — plan shape + semantics pins.

The corpus reuses d73's vocabulary, whose three contract properties
(pairwise ed >= 2, deletion-collision-free, no 'q'/'x') are pinned in
tests/test_plans_round10c.py; these tests pin what is NEW in d75: the
order-insensitivity of the blocking and the absence of any data-sized
cartesian in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_d75_plan_no_data_sized_cartesian(spark):
    """The only nested-loop join allowed is the 1-row x 1-row stats
    crossJoin; the signature join must be a hash join. (The all-pairs
    brute force exists ONLY in the DuckDB oracle.)"""
    from etl_docker_spark.plans import QUERIES

    df = QUERIES["d75_transposed_typo_dedup"].builder(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("HashJoin") >= 1


def test_d75_blocking_is_order_insensitive(spark):
    """The signature set of a name must be invariant under any token
    permutation — the property that lets a rotated alias meet its base
    name in a block at all. Rebuild the signature expression over a
    tiny literal frame with a rotated copy and assert the two signature
    sets are identical."""
    rows = [(1, ["alder", "birch", "cedar", "no042"]),
            (2, ["no042", "alder", "birch", "cedar"])]  # rotation of 1
    df = spark.createDataFrame(rows, ["id", "toks"])
    sigs = (df.select("id", F.sort_array("toks").alias("st"))
            .select("id", F.explode(F.expr("sequence(1, 4)")).alias("i"),
                    "st")
            .select("id",
                    F.expr("element_at(st, i)").alias("tok"),
                    F.expr("concat_ws(' ', concat(slice(st, 1, i - 1), "
                           "slice(st, i + 1, 4 - i)))").alias("rest"))
            .select("id", "tok", "rest",
                    F.explode(F.expr("sequence(0, length(tok))"))
                    .alias("p"))
            .select("id", F.concat(
                F.col("rest"), F.lit("|"),
                F.expr("CASE WHEN p = 0 THEN tok "
                       "ELSE concat(substring(tok, 1, p - 1), "
                       "substring(tok, p + 1)) END")).alias("sig")))
    by_id = {r["id"]: set() for r in sigs.collect()}
    for r in sigs.collect():
        by_id[r["id"]].add(r["sig"])
    assert by_id[1] == by_id[2]
    # fan bound: 4 slots x (len + 1) variants, all distinct-or-fewer
    assert len(by_id[1]) <= 4 * 7


def test_d75_match_semantics_on_handmade_corpus(spark):
    """End-to-end on a handmade corpus exercising each regime: exact
    transposition (dist 0), transposition + single-char typo (dist 1),
    and a NON-match at token distance 2 that shares a deletion variant
    (the leakage the levenshtein verify must prune)."""
    rows = [
        (1, ["alder", "birch", "cedar", "no042"]),
        # rotation only -> dist-0 pair with 1
        (2, ["cedar", "no042", "alder", "birch"]),
        # rotation + one deletion inside 'birch' -> dist-1 pair with 1,2
        (3, ["no042", "alder", "brch", "cedar"]),
        # same residual tokens but the fourth token is ed >= 2 from
        # every other fourth token -> must NOT match anything
        (4, ["no042", "alder", "zzzzz", "cedar"]),
    ]
    df = spark.createDataFrame(rows, ["id", "toks"])
    corpus = df.select("id", F.sort_array("toks").alias("st"))
    sigs = (corpus
            .select("id", F.explode(F.expr("sequence(1, 4)")).alias("i"),
                    "st")
            .select("id",
                    F.expr("element_at(st, i)").alias("tok"),
                    F.expr("concat_ws(' ', concat(slice(st, 1, i - 1), "
                           "slice(st, i + 1, 4 - i)))").alias("rest"))
            .select("id", "tok", "rest",
                    F.explode(F.expr("sequence(0, length(tok))"))
                    .alias("p"))
            .select("id", "tok", F.concat(
                F.col("rest"), F.lit("|"),
                F.expr("CASE WHEN p = 0 THEN tok "
                       "ELSE concat(substring(tok, 1, p - 1), "
                       "substring(tok, p + 1)) END")).alias("sig")))
    a = sigs.select(F.col("id").alias("id_a"),
                    F.col("tok").alias("tok_a"), "sig")
    b = sigs.select(F.col("id").alias("id_b"),
                    F.col("tok").alias("tok_b"), "sig")
    pairs = {(r["id_a"], r["id_b"], r["dist"]) for r in
             (a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b",
                      F.levenshtein("tok_a", "tok_b").alias("dist"))
              .distinct().filter(F.col("dist") <= 1)).collect()}
    assert pairs == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}
