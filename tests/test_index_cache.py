"""Train-once artifact memo (llm/index_cache): identity, isolation, and
value equivalence with a fresh build."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_memo_builds_once_per_key(spark):
    from etl_docker_spark.llm.index_cache import memo_frame

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id").alias("v"))

    a = memo_frame(spark, "test_memo_once", build)
    b = memo_frame(spark, "test_memo_once", build)
    assert a is b
    assert calls["n"] == 1
    assert sorted(r["v"] for r in b.collect()) == [0, 1, 2, 3, 4]


def test_memo_keys_do_not_collide(spark):
    from etl_docker_spark.llm.index_cache import memo_frame

    a = memo_frame(spark, "test_memo_k1", lambda: spark.range(1))
    b = memo_frame(spark, "test_memo_k2", lambda: spark.range(2))
    assert a is not b
    assert a.count() == 1 and b.count() == 2


def test_memoized_assignments_match_fresh_training(spark):
    """The served artifact must be bit-identical to retraining from
    scratch — the property that makes memoization invisible to the
    correctness gate."""
    from etl_docker_spark.plans.round2 import e05_assignments, e05_ivf_train

    served = {(r["vec_id"], r["cluster"])
              for r in e05_assignments(spark, SF_SMOKE).collect()}
    fresh = {(r["vec_id"], r["cluster"])
             for r in e05_ivf_train(spark, SF_SMOKE).collect()}
    assert served == fresh and len(served) > 0
