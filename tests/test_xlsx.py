"""XLSX sink: structural validity (zip + XML parse), the reference's
3-sheet layout (xlsx_export.rs:300-326), data fidelity, truncation cap."""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET

from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.operators.exact import match_algo1, match_algo2
from name_matcher_spark.operators.prepare import prepare_persons
from name_matcher_spark.sources.export import run_summary
from name_matcher_spark.sources.xlsx import export_matches_xlsx, write_xlsx

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _sheet_rows(zf: zipfile.ZipFile, part: str) -> list[list[str]]:
    root = ET.fromstring(zf.read(part))
    out = []
    for row in root.iter(f"{NS}row"):
        cells = []
        for c in row.iter(f"{NS}c"):
            t = c.find(f"{NS}is/{NS}t")
            v = c.find(f"{NS}v")
            cells.append(t.text if t is not None else (v.text if v is not None else None))
        out.append(cells)
    return out


def test_export_matches_xlsx(spark, tmp_path):
    a_pd, b_pd, _ = make_dirty(300)
    pa = prepare_persons(spark.createDataFrame(a_pd))
    pb = prepare_persons(spark.createDataFrame(b_pd))
    a1, a2 = match_algo1(pa, pb), match_algo2(pa, pb)
    summ = run_summary(pa, pb, a1)
    path = str(tmp_path / "report.xlsx")
    export_matches_xlsx(a1, a2, summ, path)

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml", "xl/worksheets/sheet3.xml"} <= names
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheet_names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
        assert sheet_names == [
            "Algorithm_1_Results", "Algorithm_2_Results", "Summary"
        ]
        rows1 = _sheet_rows(zf, "xl/worksheets/sheet1.xml")
        assert rows1[0][0] == "Table1_ID" and rows1[0][-1] == "MatchedFields"
        assert len(rows1) == a1.count() + 1
        # deterministic order + numeric ids as numbers
        assert rows1[1][0] == str(sorted(r["id_1"] for r in a1.collect())[0])
        rows3 = _sheet_rows(zf, "xl/worksheets/sheet3.xml")
        assert rows3[0] == ["Metric", "Value"]
        assert any(r[0] == "matched_pairs" for r in rows3[1:])


def test_write_xlsx_truncates_and_escapes(tmp_path):
    path = str(tmp_path / "t.xlsx")
    rows = [("<b&d>", i) for i in range(10)]
    write_xlsx(path, [("S", ["name", "n"], iter(rows))], max_rows=3)
    with zipfile.ZipFile(path) as zf:
        got = _sheet_rows(zf, "xl/worksheets/sheet1.xml")
    assert len(got) == 1 + 3 + 1  # header + cap + truncation marker
    assert got[1][0] == "<b&d>"  # XML-escaped on write, parsed back
    assert "TRUNCATED" in got[-1][0]


def test_write_xlsx_quoted_sheet_name_and_control_chars(tmp_path):
    """Sheet names go into an XML ATTRIBUTE (quoteattr, not escape —
    escape() leaves double quotes alone and breaks out of the
    attribute), and XML-1.0-illegal control bytes surviving from crawl
    text must be replaced, not emitted: either defect makes Excel
    reject the whole workbook."""
    path = str(tmp_path / "q.xlsx")
    write_xlsx(
        path,
        [('Review "draft" <v1>', ["name"], [("bad\x01ctl\x0bchars",)])],
    )
    with zipfile.ZipFile(path) as zf:
        # ET's expat parser rejects both malformed attributes and
        # illegal control characters — parsing IS the validity check.
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
        assert names == ['Review "draft" <v1>']
        rows = _sheet_rows(zf, "xl/worksheets/sheet1.xml")
    assert rows[1][0] == "bad�ctl�chars"
