"""Table-identifier I/O: read/write lakehouse tables OR plain paths.

The north rule's deployment story is "over Iceberg tables": inputs are
catalog tables (``warehouse.crawl.pages``), and each pipeline stage
checkpoints to a table, not a bare directory. The reference has no
notion of this — it reads MySQL tables by name (src/db/schema.rs:72-102)
— so the mapping is: MySQL table name -> lakehouse table identifier,
with the Spark catalog doing what the MySQL connection did.

A *table ref* is either

* a catalog table identifier — ``pages``, ``crawl.pages``,
  ``iceberg.crawl.pages`` (1-3 dot-separated SQL identifiers), or
* a storage path — anything with a ``/``, a URI scheme, or a leading
  ``.``/``~`` — read and written with the given file format.

Which catalog serves an identifier is pure session configuration, and
that is the point: the SAME pipeline code runs against

* the in-memory/Hive session catalog (this sandbox: parquet-provider
  tables under ``spark.sql.warehouse.dir`` — what the tests exercise),
* an Iceberg catalog, by launching with the standard public configs::

      spark.sql.catalog.ice = org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.ice.type = hadoop | hive | rest
      spark.jars.packages = org.apache.iceberg:iceberg-spark-runtime-...

  and passing ``ice.crawl.pages`` refs (the Iceberg runtime jar is not
  baked into this container, so that path is exercised only through
  the V2-writer code path, not an actual Iceberg commit).

Writes prefer the DataFrameWriterV2 API (``df.writeTo(...)
.createOrReplace()``) — on Iceberg catalogs that is an atomic
snapshot-swap REPLACE. The V2SessionCatalog raises
UNSUPPORTED_FEATURE for RTAS, so the writer falls back to the
v1 ``saveAsTable`` path automatically.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# 1-3 dot-separated SQL identifiers (catalog.namespace.table). Paths
# always contain a separator or scheme, so the grammars are disjoint.
_TABLE_REF = re.compile(
    r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}$"
)


def is_table_ref(ref: str) -> bool:
    """True when ``ref`` names a catalog table rather than a path."""
    return bool(_TABLE_REF.match(ref))


def read_table(spark: SparkSession, ref: str, fmt: str = "parquet") -> DataFrame:
    """Load a table ref (catalog lookup) or a path (``fmt`` reader).

    Catalog reads go through ``spark.table``, so Iceberg time travel /
    branch reads work with the standard suffix syntaxes the catalog
    itself supports (e.g. ``VERSION AS OF`` via ``spark.sql``) — this
    helper stays out of the way of those.
    """
    if is_table_ref(ref):
        return spark.table(ref)
    return spark.read.format(fmt).load(ref)


def write_table(
    df: DataFrame, ref: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """Write ``df`` to a table ref or a path.

    Table refs: try the V2 writer first (atomic create-or-replace /
    append on catalogs that support it — Iceberg does); fall back to
    the v1 ``saveAsTable`` for the session catalog. Paths: plain
    ``DataFrameWriter`` with the given format.
    """
    if not is_table_ref(ref):
        df.write.format(fmt).mode(mode).save(ref)
        return
    if mode == "overwrite":
        try:
            df.writeTo(ref).using(fmt).createOrReplace()
            return
        except Exception:  # noqa: BLE001 - V2SessionCatalog: no RTAS
            pass
        df.write.format(fmt).mode("overwrite").saveAsTable(ref)
    elif mode == "append":
        spark = df.sparkSession
        if spark.catalog.tableExists(ref):
            try:
                df.writeTo(ref).append()
                return
            except Exception:  # noqa: BLE001
                pass
        df.write.format(fmt).mode("append").saveAsTable(ref)
    else:
        raise ValueError(f"unsupported mode: {mode!r}")


def drop_table(spark: SparkSession, ref: str) -> None:
    if is_table_ref(ref):
        spark.sql(f"DROP TABLE IF EXISTS {ref}")


def ensure_namespace(spark: SparkSession, ref: str) -> None:
    """Create the namespace of a 2/3-part table ref if missing."""
    if is_table_ref(ref) and "." in ref:
        ns = ref.rsplit(".", 1)[0]
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
