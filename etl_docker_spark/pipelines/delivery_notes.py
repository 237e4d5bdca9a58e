"""Delivery-notes pipelines, V2 and V3 (SURVEY.md §2, J3/A1/P8/F6/F7).

Reference semantics (cites into /root/reference/dags/CotyData_IPN.py):

V2 (:1109-1275):
- header projection + ISO date part (split('T')[0], :1117)
- ''->NULL for NUMERO_PEDIDO_REPOSICION / USUARIO (:1125-1127)
- REMITO_ANULADO constant 0 (:1123)
- SUCURSALES enrichment TWICE (origin + destination razón social, :1138-1157)
  — two left broadcast joins against the same dimension
- category 0 -> 7 remap (:1160)
- detail group-sum over (REFER_ID, ITEM_ID, NUMERO_REMITO) collapsing
  duplicate lines (:1235)

V3 (:1328-1367, 1639-1690):
- skip category 'Devolución a proveedor' (:1642, P8)
- SalesOrder struct may be absent -> NULL (:1339)
- detail explode with Item struct access, group-sum (:1677-1690)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_docker_spark.functions import empty_to_null, iso_date_part, remap_values
from etl_docker_spark.operators import enrich, explode_children

RETURN_TO_SUPPLIER = "Devolución a proveedor"


def transform_delivery_notes_v2(notes: DataFrame, sucursales: DataFrame) -> DataFrame:
    """REMITOS_MOVIMIENTOS (:1109-1168)."""
    base = notes.select(
        F.col("SaleReferID").alias("REFER_ID"),
        F.col("SaleReferNumber").alias("NUMERO_REMITO"),
        empty_to_null("SalesOrderNumber").alias("NUMERO_PEDIDO_REPOSICION"),
        F.col("StoreID").alias("CODIGO_SUCURSAL_ORIGEN"),
        F.col("DestinationStoreID").alias("CODIGO_SUCURSAL_DESTINO"),
        remap_values("CategoryID", {0: 7}).alias("ID_CATEGORIA_REMITO_MOVIMIENTO"),
        iso_date_part("CreationDate").alias("FECHA_CREACION_REMITO_MOVIMIENTOS"),
        empty_to_null("CreatedByUserName").alias("USUARIO"),
        F.lit(0).alias("REMITO_ANULADO"),
    )
    dim = sucursales.select("CODIGO_SUCURSAL", "ID_RAZON_SOCIAL")
    origin = enrich(
        base,
        dim.withColumnRenamed("CODIGO_SUCURSAL", "CODIGO_SUCURSAL_ORIGEN")
           .withColumnRenamed("ID_RAZON_SOCIAL", "ID_RAZON_SOCIAL_ORIGEN"),
        on=["CODIGO_SUCURSAL_ORIGEN"], how="left")
    both = enrich(
        origin,
        dim.withColumnRenamed("CODIGO_SUCURSAL", "CODIGO_SUCURSAL_DESTINO")
           .withColumnRenamed("ID_RAZON_SOCIAL", "ID_RAZON_SOCIAL_DESTINO"),
        on=["CODIGO_SUCURSAL_DESTINO"], how="left")
    return both


def transform_delivery_note_details_v2(notes: DataFrame) -> DataFrame:
    """REMITOS_MOVIMIENTOS_DETALLE (:1225-1238): explode + duplicate-line
    group-sum (A1)."""
    detail = explode_children(
        notes.select(
            F.col("SaleReferID").alias("REFER_ID"),
            F.col("SaleReferNumber").alias("NUMERO_REMITO"),
            "Items"),
        "Items", parent_cols=["REFER_ID", "NUMERO_REMITO"])
    return (detail
            .groupBy("REFER_ID", F.col("ItemID").alias("ITEM_ID"), "NUMERO_REMITO")
            .agg(F.sum("UnitQty").alias("CANTIDAD_REMITIDA")))


def transform_delivery_notes_v3(notes: DataFrame) -> DataFrame:
    """Remitos V3 header (:1328-1352, 1639-1676): category filter + audit."""
    kept = notes.filter(
        F.col("DeliveryNoteCategory.Name").isNull()
        | (F.col("DeliveryNoteCategory.Name") != RETURN_TO_SUPPLIER))
    return kept.select(
        F.col("Id").alias("REMITO_ID"),
        F.col("DeliveryNoteNumber").alias("NUMERO_REMITO"),
        iso_date_part("DeliveryNoteDate").alias("FECHA_REMITO"),
        F.col("Audit.CreationUsername").alias("USUARIO"),
        F.to_timestamp(F.col("Audit.CreationDatetime")).alias("FECHA_CREACION"),
        F.col("Origin.Name").alias("SUCURSAL_ORIGEN"),
        F.col("Destination.Name").alias("SUCURSAL_DESTINO"),
        F.col("DeliveryNoteCategory.Id").alias("ID_CATEGORIA_REMITO_MOVIMIENTO"),
        F.col("SalesOrder.SalesOrderNumberChr").alias("NUMERO_PEDIDO_REPOSICION"),
        F.when(F.col("Audit.DeletionDatetime").isNotNull(), 1).otherwise(0)
         .alias("REMITO_ANULADO"),
    )


def transform_delivery_note_details_v3(notes: DataFrame) -> DataFrame:
    """Remitos V3 details (:1677-1690): nested Item struct + group-sum."""
    kept = notes.filter(
        F.col("DeliveryNoteCategory.Name").isNull()
        | (F.col("DeliveryNoteCategory.Name") != RETURN_TO_SUPPLIER))
    detail = kept.select(
        F.col("Id").alias("REMITO_ID"),
        F.col("DeliveryNoteNumber").alias("NUMERO_REMITO"),
        F.explode("Details").alias("d"))
    return (detail
            .groupBy("REMITO_ID", "NUMERO_REMITO",
                     F.col("d.Item.Id").alias("ITEM_ID"),
                     F.col("d.Item.Code").alias("SKU"))
            .agg(F.sum("d.UnitQty").alias("CANTIDAD_REMITIDA")))
