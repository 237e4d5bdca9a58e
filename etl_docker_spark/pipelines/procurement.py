"""Procurement pipelines: purchase orders + goods receipts.

Reference semantics (cites into /root/reference/dags/CotyData_IPN.py):

Purchase orders (:1830-1857):
- FECHA_ORDEN_COMPRA parsed dd/MM/yyyy (:1836, F10)
- PRESCRITA = 1 iff status id 13 (:1840)
- CODIGO_CATEGORIA_OC defaults to 7 when PurchaseOrderType absent (:1841, F23)
- details explode with ITEM_ID from the nested Item struct

Goods receipts (:2025-2055):
- FECHA_REMITO = ISO date part + FECHA_REMITO2 = raw string (:2031-2032)
- REMITO_ANULADO = IsDeleted
- details explode carrying the PO number and supplier
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_docker_spark.functions import iso_date_part, parse_date_dmy, struct_field_or

PRESCRIBED_STATUS_ID = 13
DEFAULT_OC_CATEGORY = 7


def transform_purchase_order_headers(orders: DataFrame) -> DataFrame:
    """CARGA_ORDENES_COMPRA (:1830-1845)."""
    return orders.select(
        F.col("Id").alias("ID_ORDEN_COMPRA"),
        F.col("PurchaseOrderNumber").alias("NUMERO_ORDEN_COMPRA"),
        parse_date_dmy(F.col("Audit.CreationDate")).alias("FECHA_ORDEN_COMPRA"),
        F.col("TotalNetAmt").alias("IMPORTE_NETO_ORDEN_COMPRA"),
        F.col("Supplier.Id").alias("CODIGO_PROVEEDOR"),
        F.col("BuyerEmployee.Id").alias("CODIGO_COMPRADOR"),
        F.when(F.col("PurchaseOrderStatus.Id") == PRESCRIBED_STATUS_ID, 1)
         .otherwise(0).alias("PRESCRITA"),
        struct_field_or("PurchaseOrderType", "Id", DEFAULT_OC_CATEGORY)
        .alias("CODIGO_CATEGORIA_OC"),
    )


def transform_purchase_order_details(orders: DataFrame) -> DataFrame:
    """CARGA_ORDENES_COMPRA_DETALLE (:1845-1857)."""
    d = orders.select(
        F.col("Id").alias("ID_ORDEN_COMPRA"),
        F.col("PurchaseOrderNumber").alias("NUMERO_ORDEN_COMPRA"),
        F.explode("Details").alias("d"))
    return d.select(
        "ID_ORDEN_COMPRA", "NUMERO_ORDEN_COMPRA",
        F.col("d.Item.Id").alias("ITEM_ID"),
        F.col("d.UnitQty").alias("CANTIDAD_ORDEN_COMPRA"),
        F.col("d.UnitPrice").alias("PRECIO_COMPRA"),
        F.col("d.Id").alias("ID_ORDEN_COMPRA_DETALLE"),
    )


def transform_goods_receipts(receipts: DataFrame) -> DataFrame:
    """REMITOS_COMPRA (:2025-2038)."""
    return receipts.select(
        F.col("Id").alias("ID_REMITO_COMPRA"),
        F.col("ReceiptNumber").alias("NUMERO_REMITO_COMPRA"),
        iso_date_part(F.col("Audit.CreationDatetime")).alias("FECHA_REMITO"),
        F.col("Audit.CreationDatetime").alias("FECHA_REMITO2"),
        F.col("Store.Id").alias("CODIGO_SUCURSAL"),
        F.col("Supplier.Id").alias("CODIGO_PROVEEDOR"),
        F.col("IsDeleted").alias("REMITO_ANULADO"),
    )


def transform_goods_receipt_details(receipts: DataFrame) -> DataFrame:
    """REMITOS_COMPRA_DETALLE (:2040-2055)."""
    d = receipts.select(
        F.col("Id").alias("ID_REMITO_COMPRA"),
        F.col("ReceiptNumber").alias("NUMERO_REMITO_COMPRA"),
        F.col("Supplier.Id").alias("CODIGO_PROVEEDOR"),
        F.explode("Details").alias("d"))
    return d.select(
        "ID_REMITO_COMPRA", "NUMERO_REMITO_COMPRA",
        F.col("d.PurchaseOrder.PurchaseOrderNumber").alias("NUMERO_ORDEN_COMPRA"),
        F.col("d.Item.Id").alias("ITEM_ID"),
        F.col("d.UnitQty").alias("CANTIDAD_DETALLE_REMITO_COMPRA"),
        "CODIGO_PROVEEDOR",
    )
