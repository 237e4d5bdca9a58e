"""Pipeline tests against FIXTURES.md-shaped fixtures (edge cases included)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_docker_spark import schemas
from etl_docker_spark.pipelines.sales_documents import sales_document_tables
from etl_docker_spark.pipelines import items as items_pipe
from etl_docker_spark.pipelines import delivery_notes as dn
from etl_docker_spark.pipelines import customers as cust
from etl_docker_spark.pipelines import master_data as md
from etl_docker_spark.pipelines import procurement as proc
from etl_docker_spark.pipelines import price_cost_logs as pcl
from etl_docker_spark.pipelines import enrichment as enr


@pytest.fixture(scope="module")
def sales_nested(spark):
    rows = [
        # normal sale type 1: discount flips negative
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
                       "CCAuthCode": "A1", "MP_PaymentID": None, "MP_ExternalReference": None}]},
        # type-3 sale: fiscal profit + discount flip
        {"SaleID": 2, "InvoiceNumberChr": "0014-00000456", "InvoiceType": 3,
         "CompanyID": 2, "StoreID": 11, "InvoiceDate": "2024-03-02T11:30:00",
         "InvoiceTimeChr": None, "Neto": 121.0, "DiscountAmt": 0.0,
         "GeneralDiscountAmt": 0.0, "NetoFinal": 121.0, "IVAAmt": 25.41,
         "RechargeAmt": 0.0, "InvoiceTotal": 146.41, "CustomerCode": "C1",
         "SalesOrderNumber": "SO1",
         "Items": [], "Payments": []},
        # credit note (type 8): detail qty/cost + payment amounts negate
        {"SaleID": 3, "InvoiceNumberChr": "0001-00000789", "InvoiceType": 8,
         "CompanyID": 1, "StoreID": 10, "InvoiceDate": "2024-03-03T09:15:00",
         "InvoiceTimeChr": "09:15", "Neto": 50.0, "DiscountAmt": 1.0,
         "GeneralDiscountAmt": 0.0, "NetoFinal": 50.0, "IVAAmt": 10.5,
         "RechargeAmt": 0.0, "InvoiceTotal": 60.5, "CustomerCode": "C2",
         "SalesOrderNumber": None,
         "Items": [{"DetailID": 31, "SaleID": 3, "ItemID": 101, "UnitPrice": 50.0,
                    "UnitQty": 1.0, "UnitDiscount": 0.0, "UnitSubTotal": 50.0,
                    "UnitCost": 20.0}],
         # duplicate PaymentID 41 -> deduped to one row
         "Payments": [{"PaymentID": 41, "PaymentMethodID": 2, "SaleID": 3,
                       "PaymentAmt": 60.5, "PaymentsQty": 1, "RechargeAmt": 0.5,
                       "CCAuthCode": "", "MP_PaymentID": None, "MP_ExternalReference": None},
                      {"PaymentID": 41, "PaymentMethodID": 2, "SaleID": 3,
                       "PaymentAmt": 60.5, "PaymentsQty": 1, "RechargeAmt": 0.5,
                       "CCAuthCode": "", "MP_PaymentID": None, "MP_ExternalReference": None}]},
    ]
    return spark.createDataFrame(rows, schemas.SALES_DOCUMENT)


def test_sales_header(spark, sales_nested):
    out = sales_document_tables(sales_nested)["VENTAS"]
    rows = {r.ID_VENTA: r for r in out.collect()}
    # invoice split + int casts (CotyData_IPN.py:99-101)
    assert rows[1].CODIGO_PUNTO_VENTA == 1 and rows[1].NUMERO_COMPROBANTE == 123
    # '' -> NULL customer code (:97)
    assert rows[1].ID_CLIENTE is None and rows[3].ID_CLIENTE == "C2"
    # discount sign flip only for types 1-3 (:110-113)
    assert rows[1].DESCUENTO1 == -5.0 and rows[1].DESCUENTO2 == -2.0
    assert rows[3].DESCUENTO1 == 1.0  # type 8 not flipped
    # fiscal profit only types 3/8... exactly 3 and 8 (:107-108)
    assert rows[1].UTILIDAD_FISCAL is None
    assert abs(rows[2].UTILIDAD_FISCAL - 21.0) < 1e-9
    assert abs(rows[3].UTILIDAD_FISCAL - (50.0 / 1.21 * 0.21)) < 1e-9
    assert rows[2].VENTA_FECHA == dt.date(2024, 3, 2)


def test_sales_details_credit_note_negation(spark, sales_nested):
    out = sales_document_tables(sales_nested)["CARGA_VENTAS_DETALLE"]
    rows = {r.ID_VENTA: r for r in out.collect()}
    assert rows[1].CANTIDAD_VENTA == 2.0 and rows[1].COSTO_NETO == 60.0
    assert abs(rows[1].UTILIDAD_TOTAL_NETA - 40.0) < 1e-9
    # credit note: qty and cost negate, profit does NOT (CotyData_IPN.py:136-139)
    assert rows[3].CANTIDAD_VENTA == -1.0 and rows[3].COSTO_NETO == -20.0
    assert abs(rows[3].UTILIDAD_TOTAL_NETA - 30.0) < 1e-9


def test_sales_payments_dedup_and_negate(spark, sales_nested):
    out = sales_document_tables(sales_nested)["VENTAS_METODOS_PAGO"]
    rows = out.collect()
    assert len(rows) == 2  # duplicate PaymentID collapsed (:166)
    r3 = next(r for r in rows if r.ID_VENTA == 3)
    assert r3.METODO_PAGO_MONTO == -60.5 and r3.METODO_PAGO_RECARGO == -0.5


def test_sales_payments_missing_ccauthcode(spark, sales_nested):
    from etl_docker_spark.operators import explode_children
    from etl_docker_spark.pipelines.sales_documents import (
        credit_note_keys, transform_sales_payments)

    payments = explode_children(sales_nested, "Payments").drop("CCAuthCode")
    out = transform_sales_payments(payments, credit_note_keys(sales_nested))
    assert all(r.METODO_PAGO_CODIGO_AUTORIZACION == "" for r in out.collect())


# ---------------------------------------------------------------- items


def test_item_tables(spark):
    items = spark.createDataFrame([
        {"Id": 1, "Code": "SKU1", "Guid": "g1", "FamilyId": 1, "CategoryId": 2,
         "Description": "normal", "TradeMarkId": 3, "IsDeleted": False,
         "IsItemsGroup": False, "DoNotAllowToBuy": False, "DoNotAllowToSell": False,
         "Audit": {"CreationDatetime": "2024-01-01T00:00:00",
                   "ModificationDatetime": None, "DeletionDatetime": None,
                   "UnDeletionDatetime": None}},
        {"Id": 2, "Code": "SKU2", "Guid": "g2", "FamilyId": 1, "CategoryId": 2,
         "Description": "combo", "TradeMarkId": 3, "IsDeleted": True,
         "IsItemsGroup": True, "DoNotAllowToBuy": False, "DoNotAllowToSell": True,
         "Audit": {"CreationDatetime": "2024-01-02T00:00:00",
                   "ModificationDatetime": "2024-02-01T00:00:00",
                   "DeletionDatetime": None, "UnDeletionDatetime": None}},
    ], schemas.ITEM)
    barcodes = spark.createDataFrame([(1, "779000001")], schemas.ITEM_BARCODE)
    attrs = spark.createDataFrame(
        [(1, [{"Attributes": [{"Values": [{"Id": 100}, {"Id": 101}]}]}])],
        "ItemId long, Categories array<struct<Attributes:array<struct<Values:array<struct<Id:int>>>>>>")
    sups = spark.createDataFrame(
        [(1, {"Id": 7}), (2, {"Id": 8})], schemas.ITEM_SUPPLIER)
    groups = spark.createDataFrame(
        [(2, 1, 3.0), (1, 9, 1.0)], schemas.ITEM_GROUP_DETAIL)

    out = items_pipe.item_tables(items, barcodes, attrs, sups, groups)
    arts = {r.SKU: r for r in out["ARTICULOS"].collect()}
    assert arts["SKU1"].ARTICULO_HABILITADO is True  # NOT IsDeleted (:502)
    assert arts["SKU2"].ARTICULO_HABILITADO is False
    # triple-nested flatten (:522-536)
    assert sorted(r.CODIGO_VALOR for r in out["CARGA_ARTICULOS_ATRIBUTOS"].collect()) == [100, 101]
    # suppliers only for non-combo (:482-483)
    assert [r.ITEM_ID for r in out["CARGA_ARTICULOS_PROVEEDORES"].collect()] == [1]
    # group details only for combos (:487-488)
    assert [(r.ITEM_ID, r.ITEM_ID_COMPOSICION, r.CANTIDAD_COMPOSICION)
            for r in out["CARGA_COMBOS"].collect()] == [(2, 1, 3.0)]


def test_deleted_undeleted_resolution(spark):
    window = spark.createDataFrame([
        # deleted then undeleted later -> enabled
        {"Id": 1, "Code": "A", "Guid": "g", "FamilyId": 1, "CategoryId": 1,
         "Description": "", "TradeMarkId": 1, "IsDeleted": False, "IsItemsGroup": False,
         "DoNotAllowToBuy": False, "DoNotAllowToSell": False,
         "Audit": {"CreationDatetime": "2024-01-01T00:00:00", "ModificationDatetime": None,
                   "DeletionDatetime": "2024-02-01T00:00:00",
                   "UnDeletionDatetime": "2024-03-01T00:00:00"}},
        # undeleted then deleted again -> disabled
        {"Id": 2, "Code": "B", "Guid": "g", "FamilyId": 1, "CategoryId": 1,
         "Description": "", "TradeMarkId": 1, "IsDeleted": True, "IsItemsGroup": False,
         "DoNotAllowToBuy": False, "DoNotAllowToSell": False,
         "Audit": {"CreationDatetime": "2024-01-01T00:00:00", "ModificationDatetime": None,
                   "DeletionDatetime": "2024-04-01T00:00:00",
                   "UnDeletionDatetime": "2024-03-01T00:00:00"}},
    ], schemas.ITEM)
    flags = {r.Code: r.ARTICULO_HABILITADO
             for r in items_pipe.resolve_enabled_flags(window).collect()}
    assert flags == {"A": 1, "B": 0}

    arts = spark.createDataFrame(
        [("A", False), ("B", True), ("C", True)],
        "SKU string, ARTICULO_HABILITADO boolean")
    updated = {r.SKU: r.ARTICULO_HABILITADO for r in items_pipe.apply_enabled_flags(
        arts, items_pipe.resolve_enabled_flags(window)).collect()}
    assert updated == {"A": True, "B": False, "C": True}  # C untouched


# ---------------------------------------------------------------- delivery notes


def test_delivery_notes_v2(spark):
    notes = spark.createDataFrame([
        {"SaleReferID": 1, "SaleReferNumber": "R-1", "SalesOrderNumber": "",
         "StoreID": 1, "DestinationStoreID": 2, "CategoryID": 0,
         "CreationDate": "2024-05-01T08:00:00", "CreatedByUserName": "",
         "Items": [{"ItemID": 9, "UnitQty": 2.0}, {"ItemID": 9, "UnitQty": 3.0},
                   {"ItemID": 10, "UnitQty": 1.0}]},
    ], schemas.DELIVERY_NOTE_V2)
    sucursales = spark.createDataFrame(
        [(1, 1), (2, 2)], "CODIGO_SUCURSAL int, ID_RAZON_SOCIAL int")

    hdr = dn.transform_delivery_notes_v2(notes, sucursales).first()
    assert hdr.ID_CATEGORIA_REMITO_MOVIMIENTO == 7       # 0 -> 7 (:1160)
    assert hdr.NUMERO_PEDIDO_REPOSICION is None and hdr.USUARIO is None
    assert hdr.FECHA_CREACION_REMITO_MOVIMIENTOS == dt.date(2024, 5, 1)
    assert hdr.ID_RAZON_SOCIAL_ORIGEN == 1 and hdr.ID_RAZON_SOCIAL_DESTINO == 2
    assert hdr.REMITO_ANULADO == 0

    det = {r.ITEM_ID: r.CANTIDAD_REMITIDA
           for r in dn.transform_delivery_note_details_v2(notes).collect()}
    assert det == {9: 5.0, 10: 1.0}  # duplicate lines group-summed (:1235)


def test_delivery_notes_v3_category_filter(spark):
    notes = spark.createDataFrame([
        {"Id": 1, "DeliveryNoteNumber": "N1", "DeliveryNoteDate": "2024-05-02T00:00:00",
         "Audit": {"CreationUsername": "u", "CreationDatetime": "2024-05-02T01:00:00",
                   "DeletionDatetime": None},
         "Origin": {"Name": "A"}, "Destination": {"Name": "B"},
         "DeliveryNoteCategory": {"Id": 3, "Name": "Normal"},
         "SalesOrder": None,
         "Details": [{"Item": {"Id": 5, "Code": "S5"}, "UnitQty": 1.0}]},
        {"Id": 2, "DeliveryNoteNumber": "N2", "DeliveryNoteDate": "2024-05-03T00:00:00",
         "Audit": {"CreationUsername": "u", "CreationDatetime": "2024-05-03T01:00:00",
                   "DeletionDatetime": "2024-05-04T00:00:00"},
         "Origin": {"Name": "A"}, "Destination": {"Name": "C"},
         "DeliveryNoteCategory": {"Id": 9, "Name": "Devolución a proveedor"},
         "SalesOrder": {"SalesOrderNumberChr": "SO9"},
         "Details": [{"Item": {"Id": 6, "Code": "S6"}, "UnitQty": 2.0}]},
    ], schemas.DELIVERY_NOTE_V3)
    hdrs = dn.transform_delivery_notes_v3(notes).collect()
    assert [r.REMITO_ID for r in hdrs] == [1]  # Devolución skipped (:1642)
    assert hdrs[0].NUMERO_PEDIDO_REPOSICION is None  # absent SalesOrder (:1339)
    dets = dn.transform_delivery_note_details_v3(notes).collect()
    assert [r.ITEM_ID for r in dets] == [5]


# ---------------------------------------------------------------- customers


def test_clients_v2(spark):
    clients = spark.createDataFrame([
        {"Id": 1, "Code": "C1", "BusinessName": "ACME",
         "Tax": {"IdentificationNumber": "20-1"}, "PriceList": {"Id": 4},
         "CustomAttribute": {"Name": ""},
         "Audit": {"CreationDate": "2024-01-05T10:00:00"},
         "Addresses": [{"Type": "other", "ZipCode": "X", "City": "N", "State": "S"},
                       {"Type": "fiscal_address", "ZipCode": "1425", "City": "CABA",
                        "State": "BA"}]},
        {"Id": 2, "Code": "C2", "BusinessName": "NOFISCAL", "Tax": None,
         "PriceList": None, "CustomAttribute": None, "Audit": None,
         "Addresses": [{"Type": "other", "ZipCode": "9", "City": "Y", "State": "Z"}]},
    ], schemas.CUSTOMER_V2)
    rows = {r.ID_CLIENTE: r for r in cust.transform_clients_v2(clients, 1).collect()}
    assert rows["C1"].CODIGO_POSTAL == "1425"              # searched (:343)
    assert rows["C1"].LOCALIDAD == "BA; CABA"              # "State; City" (:354)
    assert rows["C1"].TIPO_CLIENTE is None                 # '' -> NULL (:337)
    assert rows["C2"].CODIGO_POSTAL is None and rows["C2"].LOCALIDAD is None
    assert rows["C2"].CUIT_CLIENTE is None and rows["C2"].ID_PRECIOS_LISTA is None


def test_customers_v3_quirks(spark):
    customers = spark.createDataFrame([
        {"Id": 9, "Code": "x", "BusinessName": "x",
         "Tax": {"IdentificationNumber": "27-9"}, "PriceList": {"Id": 2},
         "CustomAttribute": {"Name": "VIP"},
         "Audit": {"CreationDate": "2024-02-01T08:00:00"},
         "Addresses": [{"Type": "fiscal_address", "ZipCode": "1000", "City": None,
                        "State": "BA"},
                       {"Type": "delivery", "ZipCode": "2000", "City": "R", "State": "SF"}],
         "CustomerCode": "CC9", "CustomerFiscalName": "FISCAL9"},
    ], schemas.CUSTOMER_V3)
    r = cust.transform_customers_v3(customers, 2).first()
    assert r.CODIGO_POSTAL == "2000"     # hard-indexed Addresses[1] (:2213)
    assert r.LOCALIDAD == "BA"           # State fallback when City missing (:2214)
    assert r.CLIENTE_FECHA_CARGA == "2024-02-01"


# ---------------------------------------------------------------- master data


def test_attribute_values_blacklist(spark):
    attrs = spark.createDataFrame([
        {"Id": 8, "Name": "a8", "AttributeCategory": {"Id": 1}, "AttributeType": {"Id": 1},
         "IsRequired": True, "IsMandatory": False,
         "Values": [{"Id": 218, "Value": "NO"}, {"Id": 218, "Value": "SI"},
                    {"Id": 219, "Value": "NO"}]},
        {"Id": 9, "Name": "a9", "AttributeCategory": {"Id": 1}, "AttributeType": {"Id": 1},
         "IsRequired": False, "IsMandatory": False, "Values": None},
    ], schemas.ATTRIBUTE)
    vals = [(r.CODIGO_VALOR, r.VALOR_DESCRIPCION)
            for r in md.transform_attribute_values(attrs).collect()]
    # (218, 8, 'NO') dropped; (218,'SI') and (219,'NO') survive (:1511-1518)
    assert sorted(vals) == [(218, "SI"), (219, "NO")]


def test_supplier_subtype_absent(spark):
    sups = spark.createDataFrame([
        {"Id": 1, "SupplierFiscalName": "F", "SupplierName": "N", "SupplierCode": "IC",
         "Tax": {"IdentificationNumber": "30-1", "TaxCondition": {"Id": 5}},
         "SupplierCompany": {"Id": 2}, "SupplierType": {"Id": 3}, "SupplierSubType": None},
    ], schemas.SUPPLIER)
    r = md.transform_suppliers(sups).first()
    assert r.ID_SUB_TIPO_PROVEEDOR is None and r.ID_TIPO_CONDICION_FISCAL == 5


# ---------------------------------------------------------------- procurement


def test_purchase_orders(spark):
    pos = spark.createDataFrame([
        {"Id": 1, "PurchaseOrderNumber": "0001-77", "Audit": {"CreationDate": "15/03/2024"},
         "TotalNetAmt": 100.0, "Supplier": {"Id": 5}, "BuyerEmployee": {"Id": 6},
         "PurchaseOrderStatus": {"Id": 13}, "PurchaseOrderType": None,
         "Details": [{"Id": 11, "Item": {"Id": 9}, "UnitQty": 2.0, "UnitPrice": 50.0}]},
    ], schemas.PURCHASE_ORDER)
    h = proc.transform_purchase_order_headers(pos).first()
    assert h.FECHA_ORDEN_COMPRA == dt.date(2024, 3, 15)   # dd/MM/yyyy (:1836)
    assert h.PRESCRITA == 1                                # status 13 (:1840)
    assert h.CODIGO_CATEGORIA_OC == 7                      # default (:1841)
    d = proc.transform_purchase_order_details(pos).first()
    assert d.ITEM_ID == 9 and d.ID_ORDEN_COMPRA_DETALLE == 11


def test_goods_receipts(spark):
    grs = spark.createDataFrame([
        {"Id": 1, "ReceiptNumber": "RC-1", "IsDeleted": False,
         "Audit": {"CreationDatetime": "2024-06-01T12:00:00"},
         "Store": {"Id": 1}, "Supplier": {"Id": 2},
         "Details": [{"PurchaseOrder": {"Id": 3, "PurchaseOrderNumber": "OC-3"},
                      "Item": {"Id": 4, "Code": "S4"}, "UnitQty": 6.0}]},
    ], schemas.GOODS_RECEIPT)
    h = proc.transform_goods_receipts(grs).first()
    assert h.FECHA_REMITO == dt.date(2024, 6, 1)
    assert h.FECHA_REMITO2 == "2024-06-01T12:00:00"
    d = proc.transform_goods_receipt_details(grs).first()
    assert d.NUMERO_ORDEN_COMPRA == "OC-3" and d.CODIGO_PROVEEDOR == 2


# ---------------------------------------------------------------- price/cost logs


def test_price_log_dedup(spark):
    logs = spark.createDataFrame([
        {"Item": {"Id": 1}, "NetValueNew": 10.0,
         "Audit": {"CreationDatetime": "2024-01-01T00:00:00"}},
        {"Item": {"Id": 1}, "NetValueNew": 12.0,
         "Audit": {"CreationDatetime": "2024-02-01T00:00:00"}},
    ], schemas.PRICE_LOG)
    out = pcl.transform_price_logs(logs, price_list_id=4).collect()
    assert len(out) == 1
    assert out[0].PRECIO_NETO == 12.0  # latest-effective wins (pinned A4 order)
    assert out[0].PRECIO_VIGENCIA_DESDE == "2024-02-01 00:00:00.000"


# ---------------------------------------------------------------- enrichment


def test_enrichment_lookups(spark):
    facts = spark.createDataFrame(
        [("MarcaA", 1), ("MarcaB", 2)], "Marca string, v int")
    marcas = spark.createDataFrame(
        [(1, "MarcaA")], "CODIGO_MARCA int, DESCRIPCION_MARCA string")
    out = enr.codigo_marca(facts, marcas, "Marca").collect()
    assert len(out) == 1 and out[0].CODIGO_MARCA == 1  # inner drops unmatched

    df = spark.createDataFrame([("Traslado",), ("Desconocida",)], "cat string")
    cats = spark.createDataFrame(
        [(5, "Traslado")],
        "ID_CATEGORIA_REMITO_MOVIMIENTO int, DESCRIPCION_CATEGORIA_REMITO_MOVIMIENTO string")
    mapped = {r.cat for r in enr.categoria_remito_movimiento(df, cats, "cat").collect()}
    assert mapped == {"5", "Desconocida"}  # unmatched keeps its value (.replace)

    codes = spark.createDataFrame([("123",), ("CLI9",)], "ID_CLIENTE string")
    fixed = [r.ID_CLIENTE for r in enr.fix_client_code(codes).collect()]
    assert sorted(fixed) == ["000123", "CLI9"]

    oc = spark.createDataFrame([("0001-99",), ("0014-11",)], "NUMERO_ORDEN_COMPRA string")
    rz = {r.NUMERO_ORDEN_COMPRA: r.ID_RAZON_SOCIAL
          for r in enr.rz_from_oc_prefix(oc, "NUMERO_ORDEN_COMPRA").collect()}
    assert rz == {"0001-99": 1, "0014-11": 2}


def test_named_map_lookups(spark):
    pl = spark.createDataFrame([(4, "Mayorista")],
                               "ID_PRECIOS_LISTA int, PRECIOS_LISTA_DESCRIPCION string")
    df = spark.createDataFrame([("Mayorista",), ("Otra",)], "lista string")
    out = {r.ID_PRECIOS_LISTA for r in enr.id_precios_lista(df, pl, "lista").collect()}
    assert out == {4, None}  # unmatched -> NULL (left .map semantics)

    pv = spark.createDataFrame([(1, 10, 2)],
                               "CODIGO_PUNTO_VENTA int, CODIGO_SUCURSAL int, ID_RAZON_SOCIAL int")
    sales = spark.createDataFrame([(1,)], "CODIGO_PUNTO_VENTA int")
    r = enr.codigo_sucursal_desde_pv(sales, pv).first()
    assert (r.CODIGO_SUCURSAL, r.ID_RAZON_SOCIAL) == (10, 2)

    rz = spark.createDataFrame([(1, "EMPRESA A")],
                               "ID_RAZON_SOCIAL int, RAZON_SOCIAL_DESCRIPCION string")
    got = enr.codigo_razon_social(
        spark.createDataFrame([("EMPRESA A",)], "emp string"), rz, "emp").first()
    assert got.ID_RAZON_SOCIAL == 1


def test_remitos_cod_proveedor_fix(spark):
    df = spark.createDataFrame(
        [(2, "01-DF CENTRAL", 10), (2, "02-OTRA", 10), (1, "01-DF CENTRAL", 10)],
        "ID_RAZON_SOCIAL int, `Sucursal stock` string, CODIGO_PROVEEDOR int")
    out = [r.CODIGO_PROVEEDOR
           for r in enr.remitos_compra_cod_proveedor_fix(df).collect()]
    assert out == [11, 10, 10]
