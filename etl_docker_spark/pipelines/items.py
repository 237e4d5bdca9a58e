"""Items pipeline (EP3) — the reference's N+1 hazard rebuilt as bulk joins.

Reference (cites into /root/reference/dags/CotyData_IPN.py):
- Item object + 4 per-item API calls (:462-556) — *a per-row remote join*,
  the worst scalability hazard in the reference (SURVEY.md §7.3). Here the
  enrichment endpoints are bulk DataFrames (fetched once via the paginated
  source) and each CARGA_* table is a set-based transform:
    barcodes    (ITEM_ID, CODIGO_BARRA)            :509-520
    attributes  (ITEM_ID, CODIGO_VALOR)            :522-536 (triple-nested)
    suppliers   (ITEM_ID, CODIGO_PROVEEDOR)        :538-546 (non-combo only)
    group dets  (ITEM_ID, ITEM_ID_COMPOSICION, CANTIDAD_COMPOSICION)
                                                   :548-556 (combo only)
- item projection with ARTICULO_HABILITADO = NOT IsDeleted (:493-507)
- deleted/undeleted resolution (:675-718): group-max per SKU + the F19 flag
  rule; the row-by-row UPDATE loop (:713-715) becomes one set-based merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_docker_spark.functions import deleted_flag, parse_ts_iso


def transform_items(items: DataFrame) -> DataFrame:
    """ARTICULOS load table (:479-507)."""
    return items.select(
        F.col("Code").alias("SKU"),
        F.col("Id").alias("ITEM_ID"),
        F.col("Guid").alias("ITEM_GUID"),
        F.col("CategoryId").alias("CODIGO_CATEGORIA"),
        F.col("FamilyId").alias("CODIGO_FAMILIA"),
        F.col("TradeMarkId").alias("CODIGO_MARCA"),
        F.col("Description").alias("DESCRIPCION_ARTICULO"),
        F.col("Audit.CreationDatetime").alias("FECHA_CREACION_ARTICULO"),
        F.col("Audit.ModificationDatetime").alias("FECHA_MODIFICACION_ARTICULO"),
        (~F.col("IsDeleted")).alias("ARTICULO_HABILITADO"),
        F.col("IsItemsGroup").alias("ARTICULO_COMBO"),
        F.col("DoNotAllowToBuy").alias("ARTICULO_NO_COMPRABLE"),
        F.col("DoNotAllowToSell").alias("ARTICULO_NO_VENDIBLE"),
    )


def transform_barcodes(barcodes: DataFrame) -> DataFrame:
    """CARGA_ARTICULOS_CODIGOS_BARRA (:509-520)."""
    return barcodes.select(
        F.col("ItemId").alias("ITEM_ID"),
        F.col("Barcode").alias("CODIGO_BARRA"),
    )


def transform_item_attributes(item_attributes: DataFrame) -> DataFrame:
    """CARGA_ARTICULOS_ATRIBUTOS: the triple-nested category->attribute->value
    flattening (:522-536) as three explodes, parent key carried through."""
    cats = item_attributes.select(
        F.col("ItemId").alias("ITEM_ID"),
        F.explode("Categories").alias("cat"))
    attrs = cats.select("ITEM_ID", F.explode("cat.Attributes").alias("attr"))
    vals = attrs.select("ITEM_ID", F.explode("attr.Values").alias("val"))
    return vals.select("ITEM_ID", F.col("val.Id").alias("CODIGO_VALOR"))


def transform_item_suppliers(item_suppliers: DataFrame, items: DataFrame) -> DataFrame:
    """CARGA_ARTICULOS_PROVEEDORES (:538-546). The reference only fetches
    suppliers for non-combo items (:482-483) — expressed as an anti-filter
    against the combo flag instead of conditional fetching."""
    combos = items.filter(F.col("IsItemsGroup")).select(F.col("Id").alias("ItemId"))
    non_combo = item_suppliers.join(combos, "ItemId", "left_anti")
    return non_combo.select(
        F.col("ItemId").alias("ITEM_ID"),
        F.col("Supplier.Id").alias("CODIGO_PROVEEDOR"),
    )


def transform_group_details(group_details: DataFrame, items: DataFrame) -> DataFrame:
    """CARGA_COMBOS (:548-556): component lines, combo items only (:487-488)."""
    combos = items.filter(F.col("IsItemsGroup")).select(F.col("Id").alias("ItemId"))
    only_combo = group_details.join(combos, "ItemId", "left_semi")
    return only_combo.select(
        F.col("ItemId").alias("ITEM_ID"),
        F.col("Id").alias("ITEM_ID_COMPOSICION"),
        F.col("UnitQty").alias("CANTIDAD_COMPOSICION"),
    )


def resolve_enabled_flags(undeletion_window_items: DataFrame) -> DataFrame:
    """Deleted/undeleted resolution (:675-711): per SKU take the max of each
    timestamp across the window, then the F19 flag rule."""
    parsed = undeletion_window_items.select(
        F.col("Code"),
        parse_ts_iso(F.col("Audit.DeletionDatetime")).alias("del_ts"),
        parse_ts_iso(F.col("Audit.UnDeletionDatetime")).alias("undel_ts"),
    )
    agg = parsed.groupBy("Code").agg(
        F.max("del_ts").alias("del_ts"), F.max("undel_ts").alias("undel_ts"))
    return agg.select(
        "Code", deleted_flag("del_ts", "undel_ts").alias("ARTICULO_HABILITADO"))


def apply_enabled_flags(articulos: DataFrame, flags: DataFrame) -> DataFrame:
    """The row-by-row UPDATE loop (:713-715) as ONE set-based merge: every
    ARTICULOS row whose SKU appears in `flags` gets its new flag."""
    renamed = flags.withColumnRenamed("Code", "SKU")
    joined = articulos.join(
        F.broadcast(renamed.withColumnRenamed("ARTICULO_HABILITADO", "__new_flag")),
        on="SKU", how="left")
    return (joined
            .withColumn("ARTICULO_HABILITADO",
                        F.coalesce(F.col("__new_flag").cast("boolean"),
                                   F.col("ARTICULO_HABILITADO")))
            .drop("__new_flag"))


def item_tables(items: DataFrame, barcodes: DataFrame, item_attributes: DataFrame,
                item_suppliers: DataFrame, group_details: DataFrame) -> dict[str, DataFrame]:
    """Full EP3 output set from bulk inputs (no per-item calls anywhere)."""
    return {
        "ARTICULOS": transform_items(items),
        "CARGA_ARTICULOS_CODIGOS_BARRA": transform_barcodes(barcodes),
        "CARGA_ARTICULOS_ATRIBUTOS": transform_item_attributes(item_attributes),
        "CARGA_ARTICULOS_PROVEEDORES": transform_item_suppliers(item_suppliers, items),
        "CARGA_COMBOS": transform_group_details(group_details, items),
    }


__all__ = [
    "apply_enabled_flags",
    "item_tables",
    "resolve_enabled_flags",
    "transform_barcodes",
    "transform_group_details",
    "transform_item_attributes",
    "transform_item_suppliers",
    "transform_items",
]
