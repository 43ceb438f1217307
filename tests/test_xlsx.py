"""Stdlib SpreadsheetML writer: attribute escaping and Excel's
sheet-name constraints (a corrupt workbook.xml is worse than a loud
ValueError)."""

import zipfile
from xml.etree import ElementTree

import pytest

from datamatch_spark.xlsx import write_xlsx

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _sheet_names(path):
    with zipfile.ZipFile(path) as z:
        root = ElementTree.fromstring(z.read("xl/workbook.xml"))
    return [s.attrib["name"] for s in root.iter(f"{_NS}sheet")]


def test_quote_in_sheet_name_round_trips(tmp_path):
    # '"' is legal in Excel sheet names but must be &quot;-escaped in
    # the XML attribute; unescaped it truncates the attribute value
    p = str(tmp_path / "q.xlsx")
    name = 'say "hi" & <bye>'
    write_xlsx(p, [(name, ["a"], [(1,)])])
    assert _sheet_names(p) == [name]


def test_forbidden_sheet_names_raise(tmp_path):
    p = str(tmp_path / "bad.xlsx")
    for bad in ["", "a" * 32, "a[b", "a:b", "a*b", "a?b", "a/b", "a\\b",
                "'lead", "trail'"]:
        with pytest.raises(ValueError):
            write_xlsx(p, [(bad, ["a"], [(1,)])])
    # boundary: exactly 31 chars is fine
    write_xlsx(p, [("a" * 31, ["a"], [(1,)])])
    assert _sheet_names(p) == ["a" * 31]


def test_duplicate_sheet_names_raise(tmp_path):
    p = str(tmp_path / "dup.xlsx")
    with pytest.raises(ValueError, match="duplicate"):
        write_xlsx(p, [("Results", ["a"], [(1,)]), ("results", ["a"], [(2,)])])
