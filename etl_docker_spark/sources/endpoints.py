"""The assembled production endpoint catalog (SURVEY.md S4).

The reference ships ~20 endpoint classes, each re-implementing the same
offset-pagination loop around one path + param set (API_IPN.py:132-1221).
Here every endpoint is one catalog DATUM — `RestEndpoint(schema, page,
param_fn)` — and the generic source (`sources/rest.py`) does the fetching,
driver- or executor-side. A user points `paginated_read` at
`ENDPOINTS["sales_documents"]` and is running the same extract the
reference's IPN_SalesDocuments class hand-rolls.

Param serialization matches the reference wire format:
- dates/datetimes -> dd/MM/yyyy (API_IPN.py:58,102,237);
- lists (e.g. `stores`) -> comma-joined;
- booleans -> lowercase true/false;
- everything else -> str().

Paths come from the reference's `self.endpoint` declarations (line refs on
each entry). Per-item detail GETs (barcode, group details, suppliers-of-
item, one-family, ...) are `get_one` calls against the same catalog entries
with the id param — they need no separate machinery.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Mapping

from etl_docker_spark import schemas as S
from etl_docker_spark.sources.rest import PageSpec, RestEndpoint


def serialize_params(predicates: Mapping) -> dict[str, str]:
    """Reference wire format for request params (API_IPN.py:52-60)."""
    out: dict[str, str] = {}
    for k, v in predicates.items():
        if v is None:
            continue
        if isinstance(v, (_dt.datetime, _dt.date)):
            out[k] = v.strftime("%d/%m/%Y")
        elif isinstance(v, bool):
            out[k] = "true" if v else "false"
        elif isinstance(v, (list, tuple)):
            out[k] = ",".join(str(x) for x in v)
        else:
            out[k] = str(v)
    return out


_PAGE = PageSpec(page_size=250)
# customers v2 sleeps 1 s between pages (API_IPN.py:267)
_THROTTLED = PageSpec(page_size=250, rate_limit_s=1.0)


def _ep(name: str, schema, page: PageSpec = _PAGE) -> RestEndpoint:
    return RestEndpoint(name=name, schema=schema, page=page,
                        param_fn=serialize_params)


# name -> (endpoint path, reference declaration) in the catalog docstrings;
# paths are carried in `name` metadata terms users join on, the HTTP client
# maps name -> URL at the edge
ENDPOINTS: dict[str, RestEndpoint] = {
    # API_IPN.py:140  v2/erp/sales-documents/
    "sales_documents": _ep("v2/erp/sales-documents/", S.SALES_DOCUMENT),
    # API_IPN.py:195  v2/erp/customers (1 s page throttle, API_IPN.py:267)
    "customers_v2": _ep("v2/erp/customers", S.CUSTOMER_V2, _THROTTLED),
    # API_IPN.py:298  v3/erp/customers
    "customers_v3": _ep("v3/erp/customers", S.CUSTOMER_V3),
    # API_IPN.py:356  v2/erp/sale-refer
    "delivery_notes_v2": _ep("v2/erp/sale-refer", S.DELIVERY_NOTE_V2),
    # API_IPN.py:387  v3/erp/delivery-notes
    "delivery_notes_v3": _ep("v3/erp/delivery-notes", S.DELIVERY_NOTE_V3),
    # API_IPN.py:505  v3/erp/items
    "items": _ep("v3/erp/items", S.ITEM),
    # API_IPN.py:570-594  v3/erp/items families listing
    "item_families": _ep("v3/erp/items/families", S.FAMILY),
    # API_IPN.py:618-635
    "item_categories": _ep("v3/erp/items/categories", S.CATEGORY),
    # API_IPN.py:658-671
    "item_trademarks": _ep("v3/erp/items/trademarks", S.TRADEMARK),
    # API_IPN.py:683  per-item GET (get_one with id param)
    "item_barcodes": _ep("v3/erp/items/barcodes", S.ITEM_BARCODE),
    # API_IPN.py:697
    "item_suppliers": _ep("v3/erp/items/suppliers", S.ITEM_SUPPLIER),
    # API_IPN.py:542
    "item_group_details": _ep("v3/erp/items/groups", S.ITEM_GROUP_DETAIL),
    # API_IPN.py:816  v2/b2c/orders/
    "b2c_orders": _ep("v2/b2c/orders/", S.B2C_ORDER),
    # API_IPN.py:857  v3/erp/expenses
    "expenses": _ep("v3/erp/expenses", S.EXPENSE_API),
    # API_IPN.py:916  v3/erp/item-pricelists/{}/price-logs
    "price_logs": _ep("v3/erp/item-pricelists/{}/price-logs", S.PRICE_LOG),
    # API_IPN.py:948  v3/erp/items/cost-logs
    "cost_logs": _ep("v3/erp/items/cost-logs", S.COST_LOG),
    # API_IPN.py:974  v3/erp/goods-receipts
    "goods_receipts": _ep("v3/erp/goods-receipts", S.GOODS_RECEIPT),
    # API_IPN.py:1020  v3/erp/suppliers
    "suppliers": _ep("v3/erp/suppliers", S.SUPPLIER),
    # API_IPN.py:1065  v3/erp/items/attributes
    "attributes": _ep("v3/erp/items/attributes", S.ATTRIBUTE),
    # API_IPN.py:1083  v3/erp/items/attributes/categories
    "attribute_categories": _ep("v3/erp/items/attributes/categories", S.FAMILY),
    # API_IPN.py:1102  v3/erp/items/attributes/types
    "attribute_types": _ep("v3/erp/items/attributes/types", S.FAMILY),
    # API_IPN.py:1119  v3/erp/purchase-orders
    "purchase_orders": _ep("v3/erp/purchase-orders", S.PURCHASE_ORDER),
    # API_IPN.py:1158/1170  v3/erp/suppliers/types (types + sub-types views)
    "supplier_types": _ep("v3/erp/suppliers/types", S.FAMILY),
    "supplier_sub_types": _ep("v3/erp/suppliers/types", S.FAMILY),
    # API_IPN.py:1178  v3/erp/sales-orders
    "sales_orders": _ep("v3/erp/sales-orders", S.SALES_ORDER),
    # API_IPN.py:1217  v3/erp/employees
    "employees": _ep("v3/erp/employees", S.EMPLOYEE),
}
