"""Minimal pure-stdlib XLSX writer (no openpyxl/xlsxwriter needed).

An .xlsx file is a zip of a few fixed XML parts plus one XML document
per worksheet (ECMA-376 / ISO 29500 SpreadsheetML, public spec). This
writer emits exactly what the reference's Excel reports need — multiple
named sheets, a header row, string/number/bool cells — using inline
strings (no sharedStrings table), which every reader (Excel,
LibreOffice, pandas/openpyxl) accepts.

Driver-side by design: the Excel report surfaces are small
(sample/all-pairs slices, decision counts — reference
matchers.py:373-459); big results go to parquet sinks instead.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

__all__ = ["write_xlsx"]

_XML_ILLEGAL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}"
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


_SHEET_NAME_FORBIDDEN = set('[]:*?/\\')


def _validate_sheet_name(name: str) -> str:
    """Enforce Excel's sheet-name rules (ECMA-376 §18.2.19 plus
    Excel's UI constraints): non-empty, <= 31 chars, none of
    []:*?/\\, and no leading/trailing apostrophe. Raising here beats
    writing a workbook.xml Excel will refuse to open."""
    if not name:
        raise ValueError("sheet name must be non-empty")
    if len(name) > 31:
        raise ValueError(f"sheet name {name!r} exceeds Excel's 31-char limit")
    bad = _SHEET_NAME_FORBIDDEN & set(name)
    if bad:
        raise ValueError(
            f"sheet name {name!r} contains characters Excel forbids: "
            f"{''.join(sorted(bad))}"
        )
    if name.startswith("'") or name.endswith("'"):
        raise ValueError(f"sheet name {name!r} may not start or end with '")
    return name


def _col_ref(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            v = str(v)  # NaN/inf: not representable as xlsx number
        else:
            return f'<c r="{ref}"><v>{v!r}</v></c>'
    # XML 1.0 forbids \x00-\x08, \x0b, \x0c, \x0e-\x1f even escaped —
    # a raw control byte in a record string would make Excel/openpyxl
    # report the whole workbook corrupt (review r5)
    s = _XML_ILLEGAL.sub("�", str(v))
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(s)}</t></is></c>"
    )


def _sheet_xml(columns, rows) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    ]
    all_rows = [tuple(columns)] + [tuple(r) for r in rows]
    for ri, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell(f"{_col_ref(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        parts.append(f'<row r="{ri}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(path: str, sheets: list) -> None:
    """Write ``sheets = [(name, columns, rows), ...]`` to ``path``.

    ``rows`` is any iterable of tuples (e.g. ``df.collect()``). Cells:
    None -> empty, bool -> boolean cell, int/float -> number, anything
    else -> inline string.
    """
    if not sheets:
        raise ValueError("at least one sheet required")
    # Excel compares sheet names case-insensitively; duplicates make a
    # workbook it reports as corrupt and force-repairs
    seen: dict = {}
    for name, _c, _r in sheets:
        key = str(name).lower()
        if key in seen:
            raise ValueError(
                f"duplicate sheet name {name!r} (collides with "
                f"{seen[key]!r}; Excel compares case-insensitively)"
            )
        seen[key] = name
    overrides, wb_sheets, wb_rels = [], [], []
    for i, (name, _cols, _rows) in enumerate(sheets, start=1):
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
        )
        # attribute context: escape() leaves double quotes alone by
        # default, which would truncate the attribute value
        safe = escape(_validate_sheet_name(name), {'"': "&quot;"})
        wb_sheets.append(
            f'<sheet name="{safe}" sheetId="{i}" r:id="rId{i}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets>{"".join(wb_sheets)}</sheets></workbook>'
    )
    wb_rels_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'{"".join(wb_rels)}</Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides="".join(overrides)),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels_xml)
        for i, (_name, cols, rows) in enumerate(sheets, start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(cols, rows))
