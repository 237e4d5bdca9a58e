"""Declared entity schemas (FIXTURES.md A1-A13).

The reference infers schemas from JSON and then defensively reindexes/casts
(SURVEY.md §1.2). We declare StructTypes once and apply them at ingest —
schema-on-read with explicit nullability. Nested arrays stay nested until a
pipeline explodes them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- A1 sales_document (CotyData_IPN.py:83-168, 251-275)

SALE_ITEM = T.StructType([
    T.StructField("DetailID", T.LongType()),
    T.StructField("SaleID", T.LongType()),
    T.StructField("ItemID", T.LongType()),
    T.StructField("UnitPrice", T.DoubleType()),
    T.StructField("UnitQty", T.DoubleType()),
    T.StructField("UnitDiscount", T.DoubleType()),
    T.StructField("UnitSubTotal", T.DoubleType()),
    T.StructField("UnitCost", T.DoubleType()),
])

SALE_PAYMENT = T.StructType([
    T.StructField("PaymentID", T.LongType()),
    T.StructField("PaymentMethodID", T.IntegerType()),
    T.StructField("SaleID", T.LongType()),
    T.StructField("PaymentAmt", T.DoubleType()),
    T.StructField("PaymentsQty", T.IntegerType()),
    T.StructField("RechargeAmt", T.DoubleType()),
    T.StructField("CCAuthCode", T.StringType()),
    T.StructField("MP_PaymentID", T.StringType()),
    T.StructField("MP_ExternalReference", T.StringType()),
])

SALES_DOCUMENT = T.StructType([
    T.StructField("SaleID", T.LongType(), False),
    T.StructField("InvoiceNumberChr", T.StringType()),
    T.StructField("InvoiceType", T.IntegerType()),
    T.StructField("CompanyID", T.IntegerType()),
    T.StructField("StoreID", T.IntegerType()),
    T.StructField("InvoiceDate", T.StringType()),
    T.StructField("InvoiceTimeChr", T.StringType()),
    T.StructField("Neto", T.DoubleType()),
    T.StructField("DiscountAmt", T.DoubleType()),
    T.StructField("GeneralDiscountAmt", T.DoubleType()),
    T.StructField("NetoFinal", T.DoubleType()),
    T.StructField("IVAAmt", T.DoubleType()),
    T.StructField("RechargeAmt", T.DoubleType()),
    T.StructField("InvoiceTotal", T.DoubleType()),
    T.StructField("CustomerCode", T.StringType()),
    T.StructField("SalesOrderNumber", T.StringType()),
    T.StructField("Items", T.ArrayType(SALE_ITEM)),
    T.StructField("Payments", T.ArrayType(SALE_PAYMENT)),
])

# ---- A2/A3 customers (CotyData_IPN.py:323-376, 2205-2224)

ADDRESS = T.StructType([
    T.StructField("Type", T.StringType()),
    T.StructField("ZipCode", T.StringType()),
    T.StructField("City", T.StringType()),
    T.StructField("State", T.StringType()),
])

CUSTOMER_V2 = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("Code", T.StringType()),
    T.StructField("BusinessName", T.StringType()),
    T.StructField("Tax", T.StructType([T.StructField("IdentificationNumber", T.StringType())])),
    T.StructField("PriceList", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("CustomAttribute", T.StructType([T.StructField("Name", T.StringType())])),
    T.StructField("Audit", T.StructType([T.StructField("CreationDate", T.StringType())])),
    T.StructField("Addresses", T.ArrayType(ADDRESS)),
])

CUSTOMER_V3 = T.StructType(
    CUSTOMER_V2.fields
    + [T.StructField("CustomerCode", T.StringType()),
       T.StructField("CustomerFiscalName", T.StringType())]
)

# ---- A4 item (CotyData_IPN.py:462-488, 612-629)

ITEM_AUDIT = T.StructType([
    T.StructField("CreationDatetime", T.StringType()),
    T.StructField("ModificationDatetime", T.StringType()),
    T.StructField("DeletionDatetime", T.StringType()),
    T.StructField("UnDeletionDatetime", T.StringType()),
])

ITEM = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("Code", T.StringType()),
    T.StructField("Guid", T.StringType()),
    T.StructField("FamilyId", T.IntegerType()),
    T.StructField("CategoryId", T.IntegerType()),
    T.StructField("Description", T.StringType()),
    T.StructField("TradeMarkId", T.IntegerType()),
    T.StructField("IsDeleted", T.BooleanType()),
    T.StructField("IsItemsGroup", T.BooleanType()),
    T.StructField("DoNotAllowToBuy", T.BooleanType()),
    T.StructField("DoNotAllowToSell", T.BooleanType()),
    T.StructField("Audit", ITEM_AUDIT),
])

ITEM_BARCODE = T.StructType([
    T.StructField("ItemId", T.LongType(), False),
    T.StructField("Barcode", T.StringType()),
])

ITEM_SUPPLIER = T.StructType([
    T.StructField("ItemId", T.LongType(), False),
    T.StructField("Supplier", T.StructType([T.StructField("Id", T.IntegerType())])),
])

ITEM_GROUP_DETAIL = T.StructType([
    T.StructField("ItemId", T.LongType(), False),   # the combo item
    T.StructField("Id", T.LongType()),              # component item id
    T.StructField("UnitQty", T.DoubleType()),
])

# ---- A5 family / category / trademark (CotyData_IPN.py:960-963, 998-1007, 1075-1078)

FAMILY = T.StructType([
    T.StructField("Id", T.IntegerType(), False),
    T.StructField("Name", T.StringType()),
])

CATEGORY = T.StructType([
    T.StructField("Id", T.IntegerType(), False),
    T.StructField("Name", T.StringType()),
    T.StructField("ItemFamily", T.StructType([T.StructField("Id", T.IntegerType())])),
])

TRADEMARK = FAMILY

# ---- A6 attribute (+values) (CotyData_IPN.py:1486-1519)

ATTRIBUTE = T.StructType([
    T.StructField("Id", T.IntegerType(), False),
    T.StructField("Name", T.StringType()),
    T.StructField("AttributeCategory", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("AttributeType", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("IsRequired", T.BooleanType()),
    T.StructField("IsMandatory", T.BooleanType()),
    T.StructField("Values", T.ArrayType(T.StructType([
        T.StructField("Id", T.IntegerType()),
        T.StructField("Value", T.StringType()),
    ]))),
])

# ---- A7 delivery_note_v2 (CotyData_IPN.py:1109-1275)

DELIVERY_NOTE_V2 = T.StructType([
    T.StructField("SaleReferID", T.LongType(), False),
    T.StructField("SaleReferNumber", T.StringType()),
    T.StructField("SalesOrderNumber", T.StringType()),
    T.StructField("StoreID", T.IntegerType()),
    T.StructField("DestinationStoreID", T.IntegerType()),
    T.StructField("CategoryID", T.IntegerType()),
    T.StructField("CreationDate", T.StringType()),
    T.StructField("CreatedByUserName", T.StringType()),
    T.StructField("Items", T.ArrayType(T.StructType([
        T.StructField("ItemID", T.LongType()),
        T.StructField("UnitQty", T.DoubleType()),
    ]))),
])

# ---- A8 delivery_note_v3 (CotyData_IPN.py:1328-1367, 1639-1690)

DELIVERY_NOTE_V3 = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("DeliveryNoteNumber", T.StringType()),
    T.StructField("DeliveryNoteDate", T.StringType()),
    T.StructField("Audit", T.StructType([
        T.StructField("CreationUsername", T.StringType()),
        T.StructField("CreationDatetime", T.StringType()),
        T.StructField("DeletionDatetime", T.StringType()),
    ])),
    T.StructField("Origin", T.StructType([T.StructField("Name", T.StringType())])),
    T.StructField("Destination", T.StructType([T.StructField("Name", T.StringType())])),
    T.StructField("DeliveryNoteCategory", T.StructType([
        T.StructField("Id", T.IntegerType()),
        T.StructField("Name", T.StringType()),
    ])),
    T.StructField("SalesOrder", T.StructType([
        T.StructField("SalesOrderNumberChr", T.StringType()),
    ])),
    T.StructField("Details", T.ArrayType(T.StructType([
        T.StructField("Item", T.StructType([
            T.StructField("Id", T.LongType()),
            T.StructField("Code", T.StringType()),
        ])),
        T.StructField("UnitQty", T.DoubleType()),
    ]))),
])

# ---- A9 purchase_order (CotyData_IPN.py:1830-1857)

PURCHASE_ORDER = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("PurchaseOrderNumber", T.StringType()),
    T.StructField("Audit", T.StructType([T.StructField("CreationDate", T.StringType())])),
    T.StructField("TotalNetAmt", T.DoubleType()),
    T.StructField("Supplier", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("BuyerEmployee", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("PurchaseOrderStatus", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("PurchaseOrderType", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("Details", T.ArrayType(T.StructType([
        T.StructField("Id", T.LongType()),
        T.StructField("Item", T.StructType([T.StructField("Id", T.LongType())])),
        T.StructField("UnitQty", T.DoubleType()),
        T.StructField("UnitPrice", T.DoubleType()),
    ]))),
])

# ---- A10 goods_receipt (CotyData_IPN.py:2025-2055)

GOODS_RECEIPT = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("ReceiptNumber", T.StringType()),
    T.StructField("IsDeleted", T.BooleanType()),
    T.StructField("Audit", T.StructType([T.StructField("CreationDatetime", T.StringType())])),
    T.StructField("Store", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("Supplier", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("Details", T.ArrayType(T.StructType([
        T.StructField("PurchaseOrder", T.StructType([
            T.StructField("Id", T.LongType()),
            T.StructField("PurchaseOrderNumber", T.StringType()),
        ])),
        T.StructField("Item", T.StructType([
            T.StructField("Id", T.LongType()),
            T.StructField("Code", T.StringType()),
        ])),
        T.StructField("UnitQty", T.DoubleType()),
    ]))),
])

# ---- A11 supplier (CotyData_IPN.py:1954-1969)

SUPPLIER = T.StructType([
    T.StructField("Id", T.IntegerType(), False),
    T.StructField("SupplierFiscalName", T.StringType()),
    T.StructField("SupplierName", T.StringType()),
    T.StructField("SupplierCode", T.StringType()),
    T.StructField("Tax", T.StructType([
        T.StructField("IdentificationNumber", T.StringType()),
        T.StructField("TaxCondition", T.StructType([T.StructField("Id", T.IntegerType())])),
    ])),
    T.StructField("SupplierCompany", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("SupplierType", T.StructType([T.StructField("Id", T.IntegerType())])),
    T.StructField("SupplierSubType", T.StructType([T.StructField("Id", T.IntegerType())])),
])

# ---- A12 price/cost logs (CotyData_IPN.py:1738-1751, 1789-1801)

PRICE_LOG = T.StructType([
    T.StructField("Item", T.StructType([T.StructField("Id", T.LongType())])),
    T.StructField("NetValueNew", T.DoubleType()),
    T.StructField("Audit", T.StructType([T.StructField("CreationDatetime", T.StringType())])),
])

COST_LOG = T.StructType([
    T.StructField("Item", T.StructType([T.StructField("Id", T.LongType())])),
    T.StructField("PriceCostValueNew", T.DoubleType()),
    T.StructField("Audit", T.StructType([T.StructField("ModificationDatetime", T.StringType())])),
])

# ---- A13 sales_order (CotyData_IPN.py:2314-2341)

SALES_ORDER = T.StructType([
    T.StructField("SalesOrderNumberChr", T.StringType(), False),
    T.StructField("SalesOrderDate", T.StringType()),
    T.StructField("StoreId", T.IntegerType()),
    T.StructField("CompanyId", T.IntegerType()),
    T.StructField("EmployeeName", T.StringType()),
    T.StructField("SalesOrderTotalAmt", T.DoubleType()),
    T.StructField("SalesOrderGuid", T.StringType()),
    T.StructField("Items", T.ArrayType(T.StructType([
        T.StructField("ItemId", T.LongType()),
        T.StructField("UnitQty", T.DoubleType()),
        T.StructField("ItemSubTotal", T.DoubleType()),
    ]))),
])

# ---- A14 b2c_order (API_IPN.py:810-849 — the B2C marketplace order list;
# the reference declares the endpoint but its DAG never materializes the
# frame, so fields mirror the endpoint's observable filter surface)

B2C_ORDER = T.StructType([
    T.StructField("OrderId", T.LongType(), False),
    T.StructField("StoreId", T.IntegerType()),
    T.StructField("MarketplaceId", T.IntegerType()),
    T.StructField("StatusId", T.IntegerType()),
    T.StructField("PaymentStatusId", T.IntegerType()),
    T.StructField("ShippingStatusId", T.IntegerType()),
    T.StructField("CreationDate", T.StringType()),
    T.StructField("PaidDate", T.StringType()),
    T.StructField("ShippingDate", T.StringType()),
    T.StructField("TotalAmount", T.DoubleType()),
    T.StructField("Items", T.ArrayType(T.StructType([
        T.StructField("ItemId", T.LongType()),
        T.StructField("UnitQty", T.DoubleType()),
        T.StructField("UnitPrice", T.DoubleType()),
    ]))),
])

# ---- A15 employee (API_IPN.py:1214-1221; store-scoped roster)

EMPLOYEE = T.StructType([
    T.StructField("Id", T.IntegerType(), False),
    T.StructField("Name", T.StringType()),
    T.StructField("StoreId", T.IntegerType()),
    T.StructField("IsActive", T.BooleanType()),
])

# ---- A16 expense via API (API_IPN.py:851-908; the reference loads expenses
# from Excel instead — pipelines/expenses.py — but declares this endpoint)

EXPENSE_API = T.StructType([
    T.StructField("Id", T.LongType(), False),
    T.StructField("CompanyId", T.IntegerType()),
    T.StructField("StoreId", T.IntegerType()),
    T.StructField("ExpenseConceptId", T.IntegerType()),
    T.StructField("SubExpenseConceptId", T.IntegerType()),
    T.StructField("PaymentStatusId", T.IntegerType()),
    T.StructField("IsDeleted", T.BooleanType()),
    T.StructField("NotProfit", T.BooleanType()),
    T.StructField("TotalAmount", T.DoubleType()),
    T.StructField("Audit", T.StructType([
        T.StructField("CreationDate", T.StringType()),
        T.StructField("ModificationDate", T.StringType()),
    ])),
])
