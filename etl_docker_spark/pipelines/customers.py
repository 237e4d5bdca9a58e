"""Customers pipelines, V2 ("clients") and V3 (SURVEY.md F20/F21).

Reference semantics (cites into /root/reference/dags/CotyData_IPN.py):

V2 clients (:323-376):
- null-guarded struct extraction: Tax.IdentificationNumber, CustomAttribute
  .Name (''->NULL), PriceList.Id, Audit.CreationDate
- fiscal address SEARCHED by Type=='fiscal_address' (:343) — not indexed
- LOCALIDAD = "State; City" only when both present, else NULL (:354-359)
- company id injected as a constant per pull (:328) — kept as a parameter

V3 customers (:2205-2224), quirks preserved deliberately (SURVEY.md §7.3):
- ZipCode hard-indexes Addresses[1] (:2213) while LOCALIDAD searches the
  fiscal address — asymmetry kept as-is
- LOCALIDAD falls back to bare State when City is missing (:2214-2216),
  unlike V2 which yields NULL
- CLIENTE_FECHA_CARGA is the date part only (:2222), unlike V2
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_docker_spark.functions import empty_to_null, fiscal_address_field


def transform_clients_v2(clients: DataFrame, razon_social: int) -> DataFrame:
    """CLIENTES from the V2 endpoint (:323-376)."""
    state = fiscal_address_field("Addresses", "State")
    city = fiscal_address_field("Addresses", "City")
    return clients.select(
        F.col("Code").alias("ID_CLIENTE"),
        F.col("Id").alias("NUMERO_CLIENTE"),
        F.col("BusinessName").alias("RAZON_SOCIAL_CLIENTE"),
        F.lit(razon_social).alias("ID_RAZON_SOCIAL"),
        F.col("Tax.IdentificationNumber").alias("CUIT_CLIENTE"),
        empty_to_null(F.col("CustomAttribute.Name")).alias("TIPO_CLIENTE"),
        fiscal_address_field("Addresses", "ZipCode").alias("CODIGO_POSTAL"),
        F.when(state.isNotNull() & city.isNotNull(),
               F.concat(state, F.lit("; "), city)).alias("LOCALIDAD"),
        F.col("PriceList.Id").alias("ID_PRECIOS_LISTA"),
        F.col("Audit.CreationDate").alias("CLIENTE_FECHA_CARGA"),
    )


def transform_customers_v3(customers: DataFrame, razon_social: int) -> DataFrame:
    """CLIENTES from the V3 endpoint (:2205-2224), quirks and all."""
    state = fiscal_address_field("Addresses", "State")
    city = fiscal_address_field("Addresses", "City")
    localidad = F.when(
        state.isNotNull(),
        F.when(city.isNotNull(), F.concat(state, F.lit("; "), city)).otherwise(state),
    )
    return customers.select(
        F.col("CustomerCode").alias("ID_CLIENTE"),
        F.col("CustomAttribute.Name").alias("TIPO_CLIENTE"),
        F.col("CustomerFiscalName").alias("RAZON_SOCIAL_CLIENTE"),
        F.col("Tax.IdentificationNumber").alias("CUIT_CLIENTE"),
        # hard-indexed second address, exactly like the reference (:2213)
        F.try_element_at(F.col("Addresses"), F.lit(2)).getField("ZipCode")
         .alias("CODIGO_POSTAL"),
        localidad.alias("LOCALIDAD"),
        F.col("Id").alias("NUMERO_CLIENTE"),
        F.col("PriceList.Id").alias("ID_PRECIOS_LISTA"),
        F.lit(razon_social).alias("ID_RAZON_SOCIAL"),
        F.substring_index(F.col("Audit.CreationDate"), "T", 1).alias("CLIENTE_FECHA_CARGA"),
    )
