"""Common-Crawl-style pages table wrapping person records.

Per BASELINE.json input_hint the engine's primary input is a table
``(url string, warc_ts timestamp, html binary, text string, lang
string)``. Each fixture page embeds exactly ONE entity record in a
fixed template, so extraction has a closed-form expected value and the
"byte-identical extracted text per url" invariant can be asserted.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

# The canonical entity block embedded in every page body. Extraction
# must recover it byte-identically.
PAGE_TEMPLATE = (
    "<html><head><title>record {rid}</title></head><body>\n"
    "<p>boilerplate nav and chrome for host{h}</p>\n"
    '<div class="entity">\n'
    "{entity}\n"
    "</div>\n"
    "<p>footer boilerplate</p>\n"
    "</body></html>"
)

ENTITY_TEMPLATE = (
    "NAME: {first}|{middle}|{last}\nBORN: {birthdate}\nHH: {hh}"
)

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "es", "de", "fr"]


def entity_text(r: pd.Series | dict) -> str:
    """Closed-form expected extracted text for a person record."""
    return ENTITY_TEMPLATE.format(
        first=r["first_name"] or "",
        middle=r["middle_name"] if r["middle_name"] is not None else "",
        last=r["last_name"] or "",
        birthdate=r["birthdate"].isoformat(),
        hh=r["hh_id"] if r["hh_id"] is not None else "",
    )


def make_pages(persons: pd.DataFrame, table_tag: str = "a") -> pd.DataFrame:
    """One page per person row; deterministic url/ts; html wraps text."""
    rows = []
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for i, r in persons.iterrows():
        ent = entity_text(r)
        h = int(r["id"]) % 97
        body = PAGE_TEMPLATE.format(rid=r["id"], h=h, entity=ent)
        rows.append(
            {
                "url": f"https://host{h}.example/{table_tag}/p{int(r['id'])}",
                "warc_ts": epoch + pd.Timedelta(seconds=int(r["id"]) * 7),
                "html": body.encode("utf-8"),
                "text": body,
                "lang": _LANGS[int(r["id"]) % len(_LANGS)],
                "expected_entity": ent,
            }
        )
    return pd.DataFrame(rows)
