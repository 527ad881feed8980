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

import os
import re

from pyspark.sql import DataFrame, SparkSession

# 1-3 dot-separated SQL identifiers (catalog.namespace.table). Paths
# with a separator or scheme never match; the one genuinely ambiguous
# shape is a bare relative filename like ``persons.parquet`` (a valid
# 2-part identifier), so dotted refs whose final segment is a known
# data-file extension are classified as paths — nobody names a table
# ``x.parquet``, everybody names files that.
_TABLE_REF = re.compile(
    r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}$"
)
_FILE_EXTENSIONS = frozenset(
    {"parquet", "csv", "json", "jsonl", "orc", "avro", "txt", "tsv"}
)


def is_table_ref(ref: str) -> bool:
    """True when ``ref`` names a catalog table rather than a path."""
    if not _TABLE_REF.match(ref):
        return False
    if "." in ref and ref.rsplit(".", 1)[1].lower() in _FILE_EXTENSIONS:
        return False
    return True


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
    spark = df.sparkSession
    if mode == "overwrite":
        try:
            df.writeTo(ref).using(fmt).createOrReplace()
            return
        except Exception as e:  # noqa: BLE001
            # ONLY the capability gap falls through to v1 (the
            # V2SessionCatalog's no-RTAS). A transient V2 failure on a
            # catalog that DOES support atomic replace must surface —
            # silently retrying through drop-and-recreate saveAsTable
            # would forfeit the snapshot-swap guarantee and re-execute
            # the upstream plan.
            if not _is_v2_capability_gap(e):
                raise
        if not spark.catalog.tableExists(ref):
            # Not in the catalog, but the default managed LOCATION may
            # hold leftovers (an in-memory catalog does not outlive the
            # JVM while spark.sql.warehouse.dir does); creating over a
            # non-empty location throws, so a rebuild-after-restart
            # would crash instead of rebuilding. Real catalogs
            # (Hive/Iceberg) never hit this branch on restart because
            # tableExists is durable there.
            _remove_stale_managed_location(spark, ref)
        df.write.format(fmt).mode("overwrite").saveAsTable(ref)
    elif mode == "append":
        if spark.catalog.tableExists(ref):
            try:
                df.writeTo(ref).append()
                return
            except Exception as e:  # noqa: BLE001
                if not _is_v2_capability_gap(e):
                    raise
        df.write.format(fmt).mode("append").saveAsTable(ref)
    else:
        raise ValueError(f"unsupported mode: {mode!r}")


def _is_v2_capability_gap(e: Exception) -> bool:
    """True when the V2 writer failed because the CATALOG lacks the
    table operation (fall back to v1), False for genuine write errors.

    Deliberately narrow: a bare "does not support" substring also
    appears in real V2 write failures (unsupported column type,
    partition transform...), and treating those as capability gaps
    would silently demote an atomic snapshot-swap write to the
    non-atomic drop-and-recreate path. Only the operation-level
    signals qualify: the UNSUPPORTED_FEATURE.TABLE_OPERATION error
    condition, the v1-table redirect, and the V2SessionCatalog's
    "Table does not support <op>" capability message."""
    import re

    msg = str(e)
    return (
        "UNSUPPORTED_FEATURE.TABLE_OPERATION" in msg
        or "Cannot write into v1 table" in msg
        or re.search(
            r"[Tt]able [^\n]*does not support (append|truncate|overwrite|"
            r"dynamic overwrite|batch write)",
            msg,
        )
        is not None
    )


def _remove_stale_managed_location(spark: SparkSession, ref: str) -> None:
    """Best-effort cleanup of a LOCAL default managed-table location
    for a table the catalog does not know (see write_table). Only the
    1/2-part session-catalog layouts are derivable; anything else (3-
    part refs, non-file warehouses) is left alone."""
    import shutil
    from urllib.parse import urlparse

    parts = ref.split(".")
    if len(parts) > 2:
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file") or not wh.path:
        return
    if len(parts) == 1:
        # A 1-part ref resolves against the session's CURRENT database
        # (which is what tableExists/saveAsTable used above), not
        # necessarily `default` — deriving the location from the
        # default layout here could rmtree a LIVE default.<t> while
        # leaving the actual stale location in place.
        parts = [spark.catalog.currentDatabase(), parts[0]]
    if parts[0].lower() == "default":
        loc = os.path.join(wh.path, parts[1].lower())
    else:
        loc = os.path.join(wh.path, f"{parts[0].lower()}.db", parts[1].lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def drop_table(spark: SparkSession, ref: str) -> None:
    if is_table_ref(ref):
        spark.sql(f"DROP TABLE IF EXISTS {ref}")


def ensure_namespace(spark: SparkSession, ref: str) -> None:
    """Create the namespace of a 2/3-part table ref if missing."""
    if is_table_ref(ref) and "." in ref:
        ns = ref.rsplit(".", 1)[0]
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
