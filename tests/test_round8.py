"""Round-8: VARIANT persistence/landing + the calibrated/held-out
consumers of the trained classifier."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_q95_variant_survives_parquet(spark):
    """to_variant_object -> parquet -> read-back must preserve typed
    path extraction (the shredded-encoding round trip), pinned on a
    hand-built frame so the property is isolated from the corpus."""
    import os
    import shutil
    import tempfile

    df = spark.sql("""
        SELECT to_variant_object(named_struct(
                 'id', id, 'tags', array('a', 'b'),
                 'meta', named_struct('depth', id * 2))) AS v
        FROM range(5)
    """)
    work = tempfile.mkdtemp(prefix="t_q95_")
    try:
        path = os.path.join(work, "v")
        df.write.parquet(path)
        back = spark.read.parquet(path).selectExpr(
            "variant_get(v, '$.id', 'bigint') AS id",
            "variant_get(v, '$.tags[1]', 'string') AS tag",
            "variant_get(v, '$.meta.depth', 'bigint') AS depth",
            "try_variant_get(v, '$.nope', 'bigint') AS miss")
        rows = sorted(back.collect(), key=lambda r: r.id)
        assert [r.id for r in rows] == list(range(5))
        assert all(r.tag == "b" and r.depth == 2 * r.id and r.miss is None
                   for r in rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_q95_native_construction_matches_parse_json(spark):
    """to_variant_object(struct) must equal parse_json(to_json(struct))
    for the same nested value — construction parity between the native
    and JSON-text paths."""
    row = spark.sql("""
        WITH s AS (SELECT named_struct('a', 1, 'b', array(2, 3)) AS st)
        SELECT to_json(to_variant_object(st)) AS native,
               to_json(parse_json(to_json(st))) AS via_json
        FROM s
    """).first()
    assert row.native == row.via_json == '{"a":1,"b":[2,3]}'


def test_s31_from_json_variant_landing(spark):
    """from_json(..., 'variant') must parse arbitrary JSON text into a
    typed-extractable variant, including rows whose shapes differ —
    the schema-evolution property s31 relies on."""
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"k": 9, "extra": [1]}',), ('{"other": true}',)],
        "js string")
    rows = df.selectExpr(
        "try_variant_get(from_json(js, 'variant'), '$.k', 'bigint') AS k"
    ).collect()
    assert sorted([r.k for r in rows], key=lambda x: (x is None, x)) \
        == [7, 9, None]


def test_s31_window_totals_match_batch(spark):
    """The streamed windowed rollup must reproduce the batch answer
    over the same extraction (exactly-once across micro-batches)."""
    from pyspark.sql import functions as F

    from etl_docker_spark.plans._util import t
    from etl_docker_spark.plans.round8 import s31_stream_variant_landing

    got = s31_stream_variant_landing(spark, SF_SMOKE)
    ev = t(spark, SF_SMOKE, "events")
    want = (ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(F.get_json_object("props", "$.k").cast("long"))
                 .cast("long").alias("sum_k")))
    gots = {(r.window_start, r.event_type): (r.n_events, r.sum_k,
                                             r.n_missing)
            for r in got.collect()}
    wants = {(r.w.start, r.event_type): (r.n_events, r.sum_k)
             for r in want.collect()}
    assert set(gots) == set(wants)
    for key, (n, k, miss) in gots.items():
        assert (n, k) == wants[key]
        assert miss == n  # the absent path must be NULL on EVERY row


def test_d62_knife_is_calibrated_not_clamped(spark):
    """Every language's chosen cell must sit strictly inside the grid
    (not the degenerate cell-0 'keep everything' answer, not the top
    clamp), the kept token fraction must meet the 60% target, and the
    knife must actually cut (docs_kept strictly between 0 and all)."""
    from etl_docker_spark.plans.round7 import _D61_CELLS
    from etl_docker_spark.plans.round8 import (_D62_KEEP_TARGET_PCT,
                                               d62_lang_calibrated_thresholds)

    rows = d62_lang_calibrated_thresholds(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # one knife per language
    for r in rows:
        assert 0 < r.chosen_cell < _D61_CELLS - 1
        assert r.tokens_kept * 100 >= _D62_KEEP_TARGET_PCT * r.total_tokens
        assert 0 < r.docs_kept < r.total_docs
        assert r.kept_ppm == r.tokens_kept * 1_000_000 // r.total_tokens


def test_d63_split_weights_differ_from_full(spark):
    """The 80%-split model must be a genuinely different artifact from
    the full-corpus model (same buckets, different counts -> different
    weights somewhere), trained on train rows only."""
    from etl_docker_spark.plans.round7 import d60_weights_frame
    from etl_docker_spark.plans.round8 import d63_weights_frame

    full = {r.bucket: r.w_ppm
            for r in d60_weights_frame(spark, SF_SMOKE).collect()}
    split = {r.bucket: r.w_ppm
             for r in d63_weights_frame(spark, SF_SMOKE).collect()}
    assert split and full
    common = set(full) & set(split)
    assert any(full[b] != split[b] for b in common)


def test_q96_both_xml_grammars_agree(spark):
    """The from_xml schema read and the xpath path language must
    recover identical numbers from the same documents — pinned at the
    output level (the oracle already pins both against the relational
    truth; this pins them against each other row-wise)."""
    from etl_docker_spark.plans.round8 import q96_xml_battery

    rows = q96_xml_battery(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.sum_qty_struct == r.sum_qty_xpath
        assert r.n_items == r.n_items_xpath


def test_xml_roundtrip_unit(spark):
    """to_xml -> from_xml -> xpath on a hand-built nested row: repeated
    elements land as an array, xpath aggregates across them."""
    row = spark.sql("""
        WITH d AS (SELECT to_xml(named_struct(
          'okey', 7, 'items', array(named_struct('qty', 17),
                                    named_struct('qty', 36)))) x)
        SELECT from_xml(x, 'okey BIGINT, items ARRAY<STRUCT<qty: BIGINT>>')
                 AS s,
               xpath_long(x, 'sum(ROW/items/qty)') AS xq,
               CAST(size(xpath(x, 'ROW/items')) AS BIGINT) AS nx
        FROM d""").first()
    assert row.s.okey == 7
    assert [it.qty for it in row.s.items] == [17, 36]
    assert row.xq == 53 and row.nx == 2


def test_theta_exact_mode_set_algebra(spark):
    """Theta sketches in the exact regime (distinct < nominal entries)
    must reproduce set algebra exactly — union/intersection/difference
    on hand-built overlapping sets."""
    row = spark.sql("""
        WITH a AS (SELECT theta_sketch_agg(x, 13) s
                   FROM (SELECT explode(sequence(1, 100)) x)),
             b AS (SELECT theta_sketch_agg(x, 13) s
                   FROM (SELECT explode(sequence(51, 180)) x))
        SELECT theta_sketch_estimate(theta_union(a.s, b.s, 13)) u,
               theta_sketch_estimate(theta_intersection(a.s, b.s)) i,
               theta_sketch_estimate(theta_difference(a.s, b.s)) d
        FROM a, b""").first()
    assert (row.u, row.i, row.d) == (180, 50, 50)


def test_d64_sketch_domain_stays_exact(spark):
    """The gate's exactness precondition: every per-source distinct
    bucket count must stay below the sketch's nominal entries (the
    bounded-domain projection guarantees it at any corpus scale), and
    the pairwise identities union = common + only_a + only_b and
    jaccard = common/union must hold on the emitted rows."""
    from pyspark.sql import functions as F

    from etl_docker_spark.plans._util import t
    from etl_docker_spark.plans.round8 import (_D64_DOMAIN, _D64_LGK,
                                               d64_theta_source_overlap)

    assert _D64_DOMAIN < 2 ** _D64_LGK  # exact regime by construction
    rows = d64_theta_source_overlap(spark, SF_SMOKE).collect()
    n_src = (t(spark, SF_SMOKE, "documents")
             .agg(F.count_distinct("source")).first()[0])
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0 < r.n_common <= r.n_union <= _D64_DOMAIN
        assert r.jaccard_ppm == r.n_common * 1_000_000 // r.n_union


def test_collation_primitives(spark):
    """Round-8 probe finds staged for round 9 (plans/round9.py): pin
    the collation behavior q97 depends on — UTF8_LCASE merges case
    variants under GROUP BY and equality, and the group key keeps the
    FIRST-SEEN representation (why q97 must canonicalize outputs)."""
    rows = spark.sql("""
        SELECT collate(x, 'UTF8_LCASE') k, count(*) n
        FROM VALUES ('Abc'), ('aBC'), ('xyz') t(x)
        GROUP BY k ORDER BY n DESC
    """).collect()
    assert [(r.k, r.n) for r in rows] == [("Abc", 2), ("xyz", 1)]
    eq = spark.sql(
        "SELECT collate('HeLLo', 'UTF8_LCASE') = 'hello' e").first()
    assert eq.e is True


def test_listagg_within_group(spark):
    """Pin listagg WITHIN GROUP ordering (q98's determinism source):
    ascending and descending orders both honored."""
    row = spark.sql("""
        SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) a,
               listagg(x, '|') WITHIN GROUP (ORDER BY x DESC) d
        FROM VALUES ('b'), ('c'), ('a') t(x)
    """).first()
    assert row.a == "a,b,c" and row.d == "c|b|a"


def test_variant_explode_lateral(spark):
    """Pin the variant_explode table function (q99's engine): object
    fields come back as (pos, key, value), arrays carry ordinality."""
    rows = spark.sql("""
        SELECT e.pos, e.key, variant_get(e.value, '$', 'bigint') v
        FROM (SELECT parse_json('[10,20,30]') vv) t,
             LATERAL variant_explode(t.vv) e
        ORDER BY e.pos
    """).collect()
    assert [(r.pos, r.key, r.v) for r in rows] == [
        (0, None, 10), (1, None, 20), (2, None, 30)]
    keys = spark.sql("""
        SELECT e.key FROM (SELECT parse_json('{"a":1,"b":2}') vv) t,
             LATERAL variant_explode(t.vv) e ORDER BY e.key
    """).collect()
    assert [r.key for r in keys] == ["a", "b"]


def test_d63_generalization_gap_is_visible(spark):
    """Train-side keep docs must be predicted keep at a higher rate
    than holdout keep docs (memorization > generalization), and the
    holdout half must be non-degenerate: both keep_pred branches carry
    rows."""
    from etl_docker_spark.plans.round8 import d63_holdout_generalization

    rows = d63_holdout_generalization(spark, SF_SMOKE).collect()
    assert {r.split for r in rows} == {"train", "holdout"}

    def keep_rate(split):
        n = sum(r.n_docs for r in rows
                if r.split == split and r.verdict == "keep")
        k = sum(r.n_docs for r in rows
                if r.split == split and r.verdict == "keep" and r.keep_pred)
        return k / n

    assert keep_rate("train") >= keep_rate("holdout")
    holdout_preds = {r.keep_pred for r in rows if r.split == "holdout"}
    assert holdout_preds == {True, False}
