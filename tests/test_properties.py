"""Property tests (SURVEY.md §5.4): the invariants the reference encodes
implicitly, checked over randomized inputs.

Each property generates a randomized batch of documents (one DataFrame per
example — examples kept low because a Spark round-trip is ~1s).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_docker_spark import schemas
from etl_docker_spark.operators import merge_upsert
from etl_docker_spark.pipelines.sales_documents import (
    CREDIT_NOTE_TYPES,
    sales_document_tables,
)

SETTINGS = settings(max_examples=5, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

amounts = st.floats(min_value=0.01, max_value=10_000,
                    allow_nan=False, allow_infinity=False)


@st.composite
def sale_docs(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    docs = []
    for i in range(n):
        itype = draw(st.sampled_from([1, 2, 3, 5, 6] + list(CREDIT_NOTE_TYPES)))
        n_items = draw(st.integers(min_value=0, max_value=4))
        items = [{
            "DetailID": i * 100 + j, "SaleID": i, "ItemID": draw(st.integers(1, 50)),
            "UnitPrice": draw(amounts), "UnitQty": draw(st.floats(0.5, 20)),
            "UnitDiscount": 0.0, "UnitSubTotal": draw(amounts),
            "UnitCost": draw(amounts),
        } for j in range(n_items)]
        pay_ids = draw(st.lists(st.integers(0, 6), min_size=0, max_size=4))
        payments = [{
            "PaymentID": i * 100 + p, "PaymentMethodID": 1, "SaleID": i,
            "PaymentAmt": draw(amounts), "PaymentsQty": 1, "RechargeAmt": 0.0,
            "CCAuthCode": "", "MP_PaymentID": None, "MP_ExternalReference": None,
        } for p in pay_ids]
        docs.append({
            "SaleID": i, "InvoiceNumberChr": f"0001-{i:08d}", "InvoiceType": itype,
            "CompanyID": 1, "StoreID": 1, "InvoiceDate": "2024-03-01T10:00:00",
            "InvoiceTimeChr": None, "Neto": draw(amounts), "DiscountAmt": draw(amounts),
            "GeneralDiscountAmt": draw(amounts), "NetoFinal": draw(amounts),
            "IVAAmt": 0.0, "RechargeAmt": 0.0, "InvoiceTotal": draw(amounts),
            "CustomerCode": "C", "SalesOrderNumber": None,
            "Items": items, "Payments": payments,
        })
    return docs


@SETTINGS
@given(docs=sale_docs())
def test_credit_note_sign_invariant(spark, docs):
    """Credit-note detail quantities/costs <= 0; sale rows stay positive."""
    nested = spark.createDataFrame(docs, schemas.SALES_DOCUMENT)
    out = sales_document_tables(nested)
    details = out["CARGA_VENTAS_DETALLE"]
    credit = {d["SaleID"] for d in docs if d["InvoiceType"] in CREDIT_NOTE_TYPES}
    for r in details.collect():
        if r.ID_VENTA in credit:
            assert r.CANTIDAD_VENTA <= 0 and r.COSTO_NETO <= 0
        else:
            assert r.CANTIDAD_VENTA >= 0 and r.COSTO_NETO >= 0


@SETTINGS
@given(docs=sale_docs())
def test_header_detail_payment_counts(spark, docs):
    """Explode conservation: one detail row per item; payments unique by PK."""
    nested = spark.createDataFrame(docs, schemas.SALES_DOCUMENT)
    out = sales_document_tables(nested)
    assert out["VENTAS"].count() == len(docs)
    assert out["CARGA_VENTAS_DETALLE"].count() == sum(len(d["Items"]) for d in docs)
    pay = out["VENTAS_METODOS_PAGO"]
    ids = [r.ID_VENTA_METODO_PAGO for r in pay.collect()]
    assert len(ids) == len(set(ids))  # PK protected (A4)
    distinct_in = len({(p["PaymentID"]) for d in docs for p in d["Payments"]})
    assert len(ids) == distinct_in


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.text(min_size=1, max_size=3), st.integers(0, 9)),
    min_size=1, max_size=15))
def test_merge_upsert_idempotent(spark, rows):
    """Re-running a load window changes nothing (the staging/MERGE contract)."""
    target = spark.createDataFrame([(99, "base", -1)], "k long, v string, ver int")
    updates = spark.createDataFrame(rows, "k long, v string, ver int")
    once = merge_upsert(target, updates, ["k"], order_by=[F.desc("ver"), F.desc("v")])
    twice = merge_upsert(once, updates, ["k"], order_by=[F.desc("ver"), F.desc("v")])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@SETTINGS
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                    unique=True),
       mod=st.integers(2, 9))
def test_quarantine_router_partitions_input(spark, tmp_path_factory, ids, mod):
    """route_rows_to_quarantine is a PARTITION of its input for any rule:
    clean ∪ quarantined == input, clean ∩ quarantined == ∅."""
    from etl_docker_spark.sinks.writers import route_rows_to_quarantine

    qdir = str(tmp_path_factory.mktemp("quar"))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    clean = route_rows_to_quarantine(
        df, F.pmod("id", F.lit(mod)) != 0, qdir)
    got_clean = {r["id"] for r in clean.collect()}
    got_bad = {r["id"] for r in spark.read.parquet(qdir).collect()}
    assert got_clean | got_bad == set(ids)
    assert got_clean & got_bad == set()
    assert got_bad == {i for i in ids if i % mod == 0}


@SETTINGS
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                    unique=True),
       mod=st.integers(2, 9))
def test_quarantine_router_nullable_predicate(spark, tmp_path_factory, ids,
                                              mod):
    """A NULLABLE predicate must still PARTITION the input: rows where the
    rule evaluates NULL (undecidable validity) belong in quarantine, not
    dropped from both sides (ADVICE r3). Rule: NULL when id%mod==1."""
    from etl_docker_spark.sinks.writers import route_rows_to_quarantine

    qdir = str(tmp_path_factory.mktemp("quarnull"))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rule = F.when(F.pmod("id", F.lit(mod)) == 1, F.lit(None).cast("boolean")) \
        .otherwise(F.pmod("id", F.lit(mod)) != 0)
    clean = route_rows_to_quarantine(df, rule, qdir)
    got_clean = {r["id"] for r in clean.collect()}
    got_bad = {r["id"] for r in spark.read.parquet(qdir).collect()}
    assert got_clean | got_bad == set(ids)
    assert got_clean & got_bad == set()
    # NULL-rule rows (id%mod==1) and invalid rows (id%mod==0) quarantined
    assert got_bad == {i for i in ids if i % mod in (0, 1)}


@SETTINGS
@given(ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=80,
                    unique=True))
def test_hash_split_is_stable_under_growth(spark, ids):
    """d37's property: a document's split assignment depends only on its
    own id — adding documents never reassigns existing ones (eval-set
    stability), and the three splits partition the corpus."""
    from pyspark.sql import functions as F2

    h = F2.conv(F2.substring(F2.md5(F2.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long")
    bucket = F2.pmod(h, F2.lit(100))
    split = (F2.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))

    def assign(subset):
        df = spark.createDataFrame([(i,) for i in subset], "doc_id long")
        return {r["doc_id"]: r["s"]
                for r in df.select("doc_id", split.alias("s")).collect()}

    full = assign(ids)
    half = assign(ids[: max(1, len(ids) // 2)])
    assert all(full[k] == v for k, v in half.items())
    assert set(full.values()) <= {"train", "val", "test"}
