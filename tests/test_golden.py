"""Golden end-to-end regression (SURVEY.md §5.2): fixture JSON -> full EP2
pipeline -> value-level hash, pinned.

The hash is over sorted canonical rows of all three output tables. If any
transform semantic drifts (a sign flip, a dedup winner, a date parse), this
fails with no oracle needed. The fixture includes the edge cases FIXTURES.md
A1 lists: credit note, type-3 sale, duplicate payment, absent optional col.
"""

from __future__ import annotations

import hashlib

from etl_docker_spark import schemas
from etl_docker_spark.pipelines import sales_document_tables

FIXTURE = [
    {"SaleID": 1, "InvoiceNumberChr": "0001-00000123", "InvoiceType": 1,
     "CompanyID": 1, "StoreID": 10, "InvoiceDate": "2024-03-01T10:00:00",
     "InvoiceTimeChr": "10:00", "Neto": 100.0, "DiscountAmt": 5.0,
     "GeneralDiscountAmt": 2.0, "NetoFinal": 95.0, "IVAAmt": 19.95,
     "RechargeAmt": 0.0, "InvoiceTotal": 114.95, "CustomerCode": "",
     "SalesOrderNumber": None,
     "Items": [{"DetailID": 11, "SaleID": 1, "ItemID": 100, "UnitPrice": 50.0,
                "UnitQty": 2.0, "UnitDiscount": 0.0, "UnitSubTotal": 100.0,
                "UnitCost": 30.0}],
     "Payments": [{"PaymentID": 21, "PaymentMethodID": 1, "SaleID": 1,
                   "PaymentAmt": 114.95, "PaymentsQty": 1, "RechargeAmt": 0.0,
                   "CCAuthCode": "A1", "MP_PaymentID": None,
                   "MP_ExternalReference": None}]},
    {"SaleID": 2, "InvoiceNumberChr": "0014-00000456", "InvoiceType": 3,
     "CompanyID": 2, "StoreID": 11, "InvoiceDate": "2024-03-02T11:30:00",
     "InvoiceTimeChr": None, "Neto": 121.0, "DiscountAmt": 4.0,
     "GeneralDiscountAmt": 0.0, "NetoFinal": 121.0, "IVAAmt": 25.41,
     "RechargeAmt": 0.0, "InvoiceTotal": 146.41, "CustomerCode": "C1",
     "SalesOrderNumber": "SO1", "Items": [], "Payments": []},
    {"SaleID": 3, "InvoiceNumberChr": "0001-00000789", "InvoiceType": 8,
     "CompanyID": 1, "StoreID": 10, "InvoiceDate": "2024-03-03T09:15:00",
     "InvoiceTimeChr": "09:15", "Neto": 50.0, "DiscountAmt": 1.0,
     "GeneralDiscountAmt": 0.0, "NetoFinal": 50.0, "IVAAmt": 10.5,
     "RechargeAmt": 0.0, "InvoiceTotal": 60.5, "CustomerCode": "C2",
     "SalesOrderNumber": None,
     "Items": [{"DetailID": 31, "SaleID": 3, "ItemID": 101, "UnitPrice": 50.0,
                "UnitQty": 1.0, "UnitDiscount": 0.0, "UnitSubTotal": 50.0,
                "UnitCost": 20.0}],
     "Payments": [{"PaymentID": 41, "PaymentMethodID": 2, "SaleID": 3,
                   "PaymentAmt": 60.5, "PaymentsQty": 1, "RechargeAmt": 0.5,
                   "CCAuthCode": "", "MP_PaymentID": None,
                   "MP_ExternalReference": None},
                  {"PaymentID": 41, "PaymentMethodID": 2, "SaleID": 3,
                   "PaymentAmt": 60.5, "PaymentsQty": 1, "RechargeAmt": 0.5,
                   "CCAuthCode": "", "MP_PaymentID": None,
                   "MP_ExternalReference": None}]},
]

# sha256 over the canonical dump of all three tables (see _digest)
GOLDEN_SHA = "ca02ca463e1eff69886c6239d2c2f2598150b93ff3aea48fec2fc94a8db30d70"


def _digest(tables) -> str:
    payload = []
    for name in sorted(tables):
        df = tables[name]
        cols = sorted(df.columns)
        rows = sorted(
            tuple("NULL" if row[c] is None else repr(row[c]) for c in cols)
            for row in df.collect())
        payload.append((name, cols, rows))
    return hashlib.sha256(repr(payload).encode()).hexdigest()


def test_ep2_golden(spark):
    nested = spark.createDataFrame(FIXTURE, schemas.SALES_DOCUMENT)
    got = _digest(sales_document_tables(nested))
    assert got == GOLDEN_SHA, f"EP2 output drifted: {got}"
