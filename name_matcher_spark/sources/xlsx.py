"""XLSX report sink — the reference's 3-sheet workbook
(src/export/xlsx_export.rs:300-326: Algorithm_1_Results,
Algorithm_2_Results, Summary) written with the stdlib only.

An .xlsx file is a zip of OOXML parts; no spreadsheet library exists in
this environment, so this module emits the minimal conformant part set
(content types, relationships, workbook, one sheet XML per sheet) with
inline strings. Styling (the reference's header fill / zebra rows,
xlsx_export.rs:48-62) is intentionally dropped: this is a report
artifact, and the engine contract is the DATA layout.

Scale posture: a workbook is a driver-side report (the sheet format
itself caps at 2^20 rows), so rows stream through ``toLocalIterator``
— bounded driver memory — and each sheet hard-caps at ``max_rows``
with an explicit truncation marker rather than an OOM or a corrupt
file. Full-fidelity exports at crawl scale go through the CSV/parquet
sinks; the workbook is for human review.
"""

from __future__ import annotations

import re
import zipfile
from collections.abc import Iterable, Iterator
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

# Code points illegal in XML 1.0 even when entity-escaped (crawl text
# can carry stray C0 controls or the U+FFFE/U+FFFF noncharacters);
# Excel rejects the whole workbook on one.
_XML_ILLEGAL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ufffe\uffff]")

# Excel's hard sheet limit is 1,048,576 rows incl. header; default far
# lower because a workbook this size is useless to a human anyway.
DEFAULT_MAX_ROWS = 100_000

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _cell(v) -> str:
    if v is None:
        return "<c/>"
    if isinstance(v, bool):
        return f'<c t="inlineStr"><is><t>{"true" if v else "false"}</t></is></c>'
    if isinstance(v, (int, float)):
        return f"<c><v>{v}</v></c>"
    return (
        '<c t="inlineStr"><is><t>'
        f'{escape(_XML_ILLEGAL.sub("�", str(v)))}'
        "</t></is></c>"
    )


def _sheet_xml(header: list[str], rows: Iterable[tuple], max_rows: int) -> Iterator[str]:
    yield (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    )
    yield "<row>" + "".join(_cell(h) for h in header) + "</row>"
    n = 0
    for row in rows:
        if n >= max_rows:
            yield "<row>" + _cell(f"TRUNCATED at {max_rows} rows") + "</row>"
            break
        yield "<row>" + "".join(_cell(v) for v in row) + "</row>"
        n += 1
    yield "</sheetData></worksheet>"


def write_xlsx(
    path: str,
    sheets: list[tuple[str, list[str], Iterable[tuple]]],
    max_rows: int = DEFAULT_MAX_ROWS,
) -> None:
    """sheets: [(name, header, row-iterable)]; rows stream straight
    into the zip entry (no whole-sheet string in memory)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        zf.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr(
            "xl/workbook.xml",
            _WB.format(
                sheets="".join(
                    # quoteattr, not escape: escape() leaves double
                    # quotes alone, which breaks out of the attribute
                    f"<sheet name={quoteattr(_XML_ILLEGAL.sub(chr(0xFFFD), name))} "
                    f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                    for i, (name, _, _) in enumerate(sheets)
                )
            ),
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _WB_RELS.format(
                rels="\n".join(
                    f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                    "openxmlformats.org/officeDocument/2006/relationships/"
                    f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                    for i in range(len(sheets))
                )
            ),
        )
        for i, (_, header, rows) in enumerate(sheets):
            with zf.open(f"xl/worksheets/sheet{i + 1}.xml", "w") as fh:
                for chunk in _sheet_xml(header, rows, max_rows):
                    fh.write(chunk.encode("utf-8"))


ALGO1_HEADERS = [
    "Table1_ID", "Table1_UUID", "Table1_FirstName", "Table1_LastName",
    "Table1_Birthdate", "Table2_ID", "Table2_UUID", "Table2_FirstName",
    "Table2_LastName", "Table2_Birthdate", "is_matched_Infnbd",
    "Confidence", "MatchedFields",
]
ALGO2_HEADERS = [
    "Table1_ID", "Table1_UUID", "Table1_FirstName", "Table1_MiddleName",
    "Table1_LastName", "Table1_Birthdate", "Table2_ID", "Table2_UUID",
    "Table2_FirstName", "Table2_MiddleName", "Table2_LastName",
    "Table2_Birthdate", "is_matched_Infnmnbd", "Confidence", "MatchedFields",
]


def _algo1_rows(pairs: DataFrame) -> Iterator[tuple]:
    cols = pairs.select(
        "id_1", "uuid_1", "first_name_1", "last_name_1", "birthdate",
        "id_2", "uuid_2", "first_name_2", "last_name_2", "confidence",
    ).toLocalIterator()
    for r in cols:
        bd = r["birthdate"].isoformat() if r["birthdate"] is not None else ""
        yield (
            r["id_1"], r["uuid_1"] or "", r["first_name_1"] or "",
            r["last_name_1"] or "", bd,
            r["id_2"], r["uuid_2"] or "", r["first_name_2"] or "",
            r["last_name_2"] or "", bd,
            True, float(r["confidence"]), "first_name;last_name;birthdate",
        )


def _algo2_rows(pairs: DataFrame) -> Iterator[tuple]:
    cols = pairs.select(
        "id_1", "uuid_1", "first_name_1", "middle_name_1", "last_name_1",
        "birthdate", "id_2", "uuid_2", "first_name_2", "middle_name_2",
        "last_name_2", "confidence",
    ).toLocalIterator()
    for r in cols:
        bd = r["birthdate"].isoformat() if r["birthdate"] is not None else ""
        yield (
            r["id_1"], r["uuid_1"] or "", r["first_name_1"] or "",
            r["middle_name_1"] or "", r["last_name_1"] or "", bd,
            r["id_2"], r["uuid_2"] or "", r["first_name_2"] or "",
            r["middle_name_2"] or "", r["last_name_2"] or "", bd,
            True, float(r["confidence"]),
            "first_name;middle_name;last_name;birthdate",
        )


def export_matches_xlsx(
    algo1_pairs: DataFrame,
    algo2_pairs: DataFrame,
    summary: DataFrame,
    path: str,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> None:
    """The reference's 3-sheet workbook (xlsx_export.rs:300-326):
    Algorithm_1_Results + Algorithm_2_Results (deterministic id order)
    + the Summary key/value sheet (run_summary output)."""
    a1 = algo1_pairs.orderBy("id_1", "id_2")
    a2 = algo2_pairs.orderBy("id_1", "id_2")
    srows = ((r["metric"], float(r["value"])) for r in summary.toLocalIterator())
    write_xlsx(
        path,
        [
            ("Algorithm_1_Results", ALGO1_HEADERS, _algo1_rows(a1)),
            ("Algorithm_2_Results", ALGO2_HEADERS, _algo2_rows(a2)),
            ("Summary", ["Metric", "Value"], srows),
        ],
        max_rows=max_rows,
    )
