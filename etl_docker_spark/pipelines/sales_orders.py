"""Sales-orders (notas de venta) pipeline.

Reference: /root/reference/dags/CotyData_IPN.py:2314-2341 — header projection
with ISO date part; details exploded from Items[].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_docker_spark.functions import iso_date_part


def transform_sales_orders(orders: DataFrame) -> DataFrame:
    """NOTAS_VENTA headers (:2314-2327)."""
    return orders.select(
        F.col("SalesOrderNumberChr").alias("NUMERO_NOTA_VENTA"),
        iso_date_part("SalesOrderDate").alias("FECHA_NOTA_VENTA"),
        F.col("StoreId").alias("CODIGO_SUCURSAL"),
        F.col("CompanyId").alias("ID_RAZON_SOCIAL"),
        F.col("EmployeeName").alias("USUARIO"),
        F.col("SalesOrderTotalAmt").alias("SUBTOTAL"),
        F.col("SalesOrderGuid").alias("GUID"),
    )


def transform_sales_order_details(orders: DataFrame) -> DataFrame:
    """NOTAS_VENTA_DETALLE (:2329-2341)."""
    d = orders.select(
        F.col("SalesOrderNumberChr").alias("NUMERO_NOTA_VENTA"),
        F.explode("Items").alias("it"))
    return d.select(
        "NUMERO_NOTA_VENTA",
        F.col("it.UnitQty").alias("CANTIDAD_NOTA_VENTA"),
        F.col("it.ItemSubTotal").alias("SUBTOTAL_DETALLE"),
        F.col("it.ItemId").alias("ITEM_ID"),
    )
