"""Minimal stdlib-only xlsx (OOXML SpreadsheetML) reader/writer.

The reference reads uploads and writes its three report workbooks with
pandas+openpyxl (app.py:85-88, outputs.py:9-20). openpyxl is not in this
container, so the xlsx paths were environment-gated; this module removes the
gate with a dependency-free implementation of the subset those paths need:

* writer: multi-sheet workbooks, inline strings / numbers / booleans,
  deterministic output (fixed zip timestamps — byte-stable across runs);
* reader: sheet discovery via workbook rels, shared strings, inline strings,
  numbers, booleans, sparse rows (gap cells -> None).

xlsx IS a zip of XML parts — zipfile + ElementTree cover it. Driver-side by
design, for config-sized inputs/reports only (the scalable sinks are
parquet/CSV); at 100 TB nothing here is on the data path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"

# fixed timestamp => byte-identical workbooks for identical data
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference 'BC23' -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


# XML 1.0 cannot carry most control characters even escaped; OOXML encodes
# them as _xHHHH_ (and protects literal text that LOOKS like that escape by
# encoding its underscore as _x005F_). openpyxl does the same. \r (0x0D) is
# VALID XML but must be escaped anyway: parsers normalize literal \r and
# \r\n to \n on read (XML 1.0 §2.11), which would silently corrupt the
# round-trip — Excel itself writes _x000D_ for the same reason.
_XML_INVALID = re.compile(r"[\x00-\x08\x0b-\x0c\x0e-\x1f\x0d]")
_OOXML_ESC_LITERAL = re.compile(r"_(?=x[0-9A-Fa-f]{4}_)")
_OOXML_ESC = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _encode_text(s: str) -> str:
    s = _OOXML_ESC_LITERAL.sub("_x005F_", s)
    s = _XML_INVALID.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)
    return escape(s)


def _decode_text(s: str) -> str:
    return _OOXML_ESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _sheet_xml(rows: list[list]) -> bytes:
    n_cols = max((len(r) for r in rows), default=0)
    dim = f"A1:{_col_letter(max(n_cols - 1, 0))}{max(len(rows), 1)}"
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}"><dimension ref="{dim}"/><sheetData>',
    ]
    for r, row in enumerate(rows, start=1):
        cells = []
        for c, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letter(c)}{r}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{_encode_text(str(v))}</t></is></c>"
                )
        parts.append(f'<row r="{r}">{"".join(cells)}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts).encode()


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write {sheet_name: rows} (row 0 = header by convention) as a workbook.
    Sheet names are truncated to Excel's 31-char limit, like openpyxl."""
    names = [s[:31] for s in sheets]
    sheet_tags = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_NS_REL}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        f'<Relationship Id="rId1" Type="{_NS_REL}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:

        def put(name: str, data) -> None:
            info = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)

        put("[Content_Types].xml", content_types)
        put("_rels/.rels", pkg_rels)
        put("xl/workbook.xml", workbook)
        put("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values()):
            put(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(rows))


def _parse_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        ts = cell.find(f"{{{_NS}}}is/{{{_NS}}}t")
        return _decode_text(ts.text or "") if ts is not None else ""
    v = cell.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return _decode_text(shared[int(v.text)])
    if t == "b":
        return v.text == "1"
    if t == "str":
        return _decode_text(v.text)
    text = v.text
    if re.fullmatch(r"-?\d+", text):
        return int(text)  # exact — float() would round ints past 2^53
    return float(text)


def read_xlsx(path: str) -> dict[str, list[list]]:
    """{sheet_name: rows}; sparse cells -> None, rows padded to the widest."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        rels = {}
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.iter(f"{{{_NS_PKG_REL}}}Relationship"):
            target = rel.get("Target").lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            rels[rel.get("Id")] = target
        wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
        out: dict[str, list[list]] = {}
        for sheet in wb_root.iter(f"{{{_NS}}}sheet"):
            name = sheet.get("name")
            target = rels[sheet.get(f"{{{_NS_REL}}}id")]
            sh_root = ET.fromstring(zf.read(target))
            by_row: dict[int, list] = {}
            for row_el in sh_root.iter(f"{{{_NS}}}row"):
                r_idx = int(row_el.get("r", len(by_row) + 1)) - 1
                row: list = []
                for cell in row_el.iter(f"{{{_NS}}}c"):
                    idx = _col_index(cell.get("r", _col_letter(len(row)) + "1"))
                    while len(row) < idx:
                        row.append(None)
                    row.append(_parse_value(cell, shared))
                by_row[r_idx] = row
            # grid shape from the dimension element when present (all-None
            # rows/columns otherwise vanish — cells are sparse in the XML)
            n_rows = max(by_row, default=-1) + 1
            width = max((len(r) for r in by_row.values()), default=0)
            dim = sh_root.find(f"{{{_NS}}}dimension")
            if dim is not None and ":" in (dim.get("ref") or ""):
                end = dim.get("ref").split(":")[1]
                width = max(width, _col_index(end) + 1)
                n_rows = max(n_rows, int(re.search(r"\d+", end).group(0)))
            rows = [by_row.get(i, []) for i in range(n_rows)]
            for r in rows:
                r.extend([None] * (width - len(r)))
            out[name] = rows
        return out
