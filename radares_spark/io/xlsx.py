"""Minimal xlsx reader/writer on the Python stdlib (zipfile + XML).

The reference parses Monitran portal reports with ``xlrd``
(src/scrape.py:97, src/clean_data.py:143). This container has no Excel
library, and the engine only needs positional cell access over the
three fixed report templates — so a ~100-line stdlib reader is both
sufficient and dependency-free. The writer exists to build synthetic
test fixtures (FIXTURES.md §A1); production inputs come from the
portal.

The reader returns a dense 0-based ``rows[r][c]`` grid of
``str | float | None`` — the same addressing convention as the
``xlrd`` sheet the reference indexes (``sheet.cell_value(r, c)``).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def col_letter(c: int) -> str:
    """0-based column index -> A1 letters."""
    s = ""
    c += 1
    while c:
        c, r = divmod(c - 1, 26)
        s = chr(65 + r) + s
    return s


def _col_index(ref: str) -> int:
    m = re.match(r"([A-Z]+)", ref)
    c = 0
    for ch in m.group(1):
        c = c * 26 + (ord(ch) - 64)
    return c - 1


def write_xlsx(rows: list[list[object]]) -> bytes:
    """Build an xlsx from a 0-based grid (str -> inline string, numbers
    -> numeric cells, None -> omitted)."""
    out = io.BytesIO()
    cells_xml: list[str] = ["<sheetData>"]
    for r, row in enumerate(rows):
        cells_xml.append(f'<row r="{r + 1}">')
        for c, v in enumerate(row):
            if v is None:
                continue
            ref = f"{col_letter(c)}{r + 1}"
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                cells_xml.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                txt = (
                    str(v)
                    .replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                cells_xml.append(f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{txt}</t></is></c>')
        cells_xml.append("</row>")
    cells_xml.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(cells_xml)
        + "</worksheet>"
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return out.getvalue()


def read_xlsx(data: bytes) -> list[list[object]]:
    """Parse the first worksheet into a dense 0-based grid.

    Handles numeric cells, inline strings, and shared strings (real
    portal files use shared strings; our fixture writer uses inline).
    """
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
        sheet_name = next(
            (n for n in names if re.match(r"xl/worksheets/sheet1?\.xml$", n)),
            "xl/worksheets/sheet1.xml",
        )
        root = ET.fromstring(z.read(sheet_name))

    grid: dict[tuple[int, int], object] = {}
    max_r = max_c = -1
    for row in root.iter(f"{{{_NS['m']}}}row"):
        r = int(row.get("r")) - 1
        # declared-but-empty rows still count toward the sheet's row
        # count (xlrd's sheet.nrows semantics — template detection
        # depends on it, reference clean_data.py:66-71)
        max_r = max(max_r, r)
        for cell in row.findall("m:c", _NS):
            ref = cell.get("r")
            c = _col_index(ref)
            t = cell.get("t", "n")
            v_el = cell.find("m:v", _NS)
            if t == "inlineStr":
                is_el = cell.find("m:is", _NS)
                val: object = "".join(
                    x.text or "" for x in is_el.iter(f"{{{_NS['m']}}}t")
                ) if is_el is not None else None
            elif t == "s":
                val = shared[int(v_el.text)] if v_el is not None else None
            elif t == "str":
                val = v_el.text if v_el is not None else None
            elif v_el is not None:
                val = float(v_el.text)
            else:
                val = None
            if val is not None:
                grid[(r, c)] = val
                max_r, max_c = max(max_r, r), max(max_c, c)

    rows: list[list[object]] = [[None] * (max_c + 1) for _ in range(max_r + 1)]
    for (r, c), v in grid.items():
        rows[r][c] = v
    return rows
