"""Entity extraction: pages(url, warc_ts, html, text, lang) -> person rows.

The fixture pages embed one canonical entity block per page (fixtures/
pages.py); extraction recovers it byte-identically (the BASELINE.json
per-row invariant) and parses typed fields. Everything is JVM regexp —
no Python in the scan path, so Catalyst prunes/pushes down freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s) so '.' crosses newlines inside the entity block.
_ENTITY_RE = '(?s)<div class="entity">\n(.*?)\n</div>'
_NAME_RE = "NAME: ([^|\n]*)\\|([^|\n]*)\\|([^|\n]*)"
_BORN_RE = "BORN: ([0-9-]+)"
_HH_RE = "HH: (.*)"


def extract_entities(pages: DataFrame) -> DataFrame:
    """pages -> (url, warc_ts, lang, entity_text, id, first_name,
    middle_name, last_name, birthdate, hh_id).

    The numeric id comes from the url tail (fixture pages are keyed by
    person id); real crawls would instead hash the url. Empty-string
    middle/hh parse back to NULL (round-trip of the writer's
    None -> "" rendering).
    """
    ent = F.regexp_extract("text", _ENTITY_RE, 1)
    out = pages.withColumn("entity_text", ent)
    nullif = lambda c: F.when(c == "", F.lit(None).cast("string")).otherwise(c)  # noqa: E731
    return out.select(
        "url",
        "warc_ts",
        "lang",
        "entity_text",
        # try_cast / try_to_date, NOT cast/to_date: under ANSI mode
        # (Spark 4 default) a single malformed page would otherwise
        # fail the whole job — at crawl scale malformed rows are a
        # certainty, so they must degrade to NULL, not throw.
        F.regexp_extract("url", "/p([0-9]+)$", 1).try_cast("long").alias("id"),
        nullif(F.regexp_extract("entity_text", _NAME_RE, 1)).alias("first_name"),
        nullif(F.regexp_extract("entity_text", _NAME_RE, 2)).alias("middle_name"),
        nullif(F.regexp_extract("entity_text", _NAME_RE, 3)).alias("last_name"),
        F.try_to_date(F.regexp_extract("entity_text", _BORN_RE, 1)).alias("birthdate"),
        nullif(F.regexp_extract("entity_text", _HH_RE, 1)).alias("hh_id"),
    )


REQUIRED_COLUMNS = ("id", "first_name", "last_name", "birthdate")
OPTIONAL_COLUMNS = ("uuid", "middle_name", "hh_id")


def apply_column_mapping(
    df: DataFrame, mapping: dict[str, str] | None = None
) -> DataFrame:
    """Project an arbitrarily-named physical table to the engine's
    logical person schema — the reference's ColumnMapping
    (models.rs:103-126) + schema discovery fallbacks (schema.rs:80-101).

    ``mapping`` is logical -> physical (identity for unmapped names).
    Physical identifiers are validated like schema.rs:26-31 (letters,
    digits, underscore only — blocks injection-shaped names). Required
    columns (id, first_name, last_name, birthdate) must resolve;
    optional ones (uuid, middle_name, hh_id) null-backfill when the
    physical table lacks them, mirroring the reference's
    ``NULL AS uuid`` retry.
    """
    import re

    mapping = mapping or {}
    for logical, physical in mapping.items():
        if not re.fullmatch(r"[A-Za-z0-9_]+", physical or ""):
            raise ValueError(f"invalid physical column name: {physical!r}")
    cols = []
    for logical in REQUIRED_COLUMNS + OPTIONAL_COLUMNS:
        physical = mapping.get(logical, logical)
        if physical in df.columns:
            cols.append(F.col(physical).alias(logical))
        elif logical in OPTIONAL_COLUMNS and logical not in mapping:
            # NULL-backfill is only for columns the caller did NOT map:
            # an EXPLICIT mapping that fails to resolve is a typo, and
            # silently backfilling it would degrade recall with a
            # "successful" run (uuid matching quietly matches nothing).
            cols.append(F.lit(None).cast("string").alias(logical))
        else:
            raise ValueError(
                f"required column {logical!r} (physical {physical!r}) "
                f"not found in {df.columns}"
                if logical in REQUIRED_COLUMNS
                else f"mapped optional column {logical!r} -> {physical!r} "
                f"not found in {df.columns}; drop the mapping entry to "
                "NULL-backfill instead"
            )
    return df.select(*cols)
