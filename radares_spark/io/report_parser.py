"""Monitran report template parser + synthetic fixture builder.

Semantics from the reference (``src/clean_data.py:52-136``): three
positional spreadsheet templates, detected by total row count plus the
``"Total Geral"`` sentinel cell; fixed data columns in a merged-cell
layout; report date in cell (2,1), device id in cell (5,1), block
direction labels in column 15.

| template | rows | sentinel  | blocks                               |
|----------|------|-----------|--------------------------------------|
| 1        | 109  | (105, 1)  | 96 rows from row 8, dir @ (5,15)     |
| 2        | 210  | (206, 1)  | 96 @ row 8 + 96 @ row 109, dirs @    |
|          |      |           | (5,15) / (106,15)                    |
| 3        | 205  | (201, 1)  | 192 rows from row 8, dir @ (5,15)    |

Unknown layouts raise ``TemplateError`` -> the Spark kernel converts
that into a quarantine row (status='quarantined'), never a task
failure (SURVEY §2.11 failure isolation).

This module is pure Python (runs inside executor tasks via
``mapInPandas``); no Spark imports.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import re

from radares_spark.io.xlsx import read_xlsx, write_xlsx

SENTINEL = "Total Geral"
# data cell columns: time_range, 11 speed bins, total
# (reference clean_data.py:102-114)
TIME_COL = 1
BIN_COLS_XLSX = [5, 7, 9, 10, 12, 13, 14, 15, 17, 18, 20]
TOTAL_COL = 21
DATE_CELL = (2, 1)
EQUIP_CELL = (5, 1)

# (n_sheet_rows, sentinel_row) -> template id
_TEMPLATES = {(109, 105): 1, (210, 206): 2, (205, 201): 3}


class TemplateError(ValueError):
    pass


def _cell(rows: list[list[object]], r: int, c: int):
    try:
        return rows[r][c]
    except IndexError:
        return None


def detect_template(rows: list[list[object]]) -> int:
    n = len(rows)
    for (nrows, srow), tid in _TEMPLATES.items():
        if n == nrows and str(_cell(rows, srow, 1) or "").strip() == SENTINEL:
            return tid
    raise TemplateError(f"unknown layout: {n} rows, sentinel not found")


def _blocks(tid: int) -> list[tuple[int, int, tuple[int, int]]]:
    """(begin_row, n_rows, direction_label_cell) per data block."""
    if tid == 1:
        return [(8, 96, (5, 15))]
    if tid == 2:
        return [(8, 96, (5, 15)), (109, 96, (106, 15))]
    return [(8, 192, (5, 15))]


def parse_report(data: bytes) -> list[dict]:
    """xlsx bytes -> list of row dicts (pubdate, equipment,
    direction_raw, time_range, 11 bins, total). Raises TemplateError /
    ValueError on malformed input — callers quarantine."""
    rows = read_xlsx(data)
    tid = detect_template(rows)

    date_text = str(_cell(rows, *DATE_CELL) or "")
    m = re.search(r"(\d{2})/(\d{2})/(\d{4})", date_text)
    if not m:
        raise ValueError(f"no report date in cell {DATE_CELL}: {date_text!r}")
    d, mo, y = m.groups()
    pubdate = f"{y}-{mo}-{d}"
    dt.date.fromisoformat(pubdate)  # validate

    equip_text = str(_cell(rows, *EQUIP_CELL) or "")
    em = re.match(r"([A-Z0-9]+)", equip_text)
    if not em:
        raise ValueError(f"no equipment id in cell {EQUIP_CELL}: {equip_text!r}")
    equipment = em.group(1)

    out: list[dict] = []
    for begin, n, dir_cell in _blocks(tid):
        direction_raw = str(_cell(rows, *dir_cell) or "")
        for r in range(begin, begin + n):
            time_range = str(_cell(rows, r, TIME_COL) or "")
            bins = []
            for c in BIN_COLS_XLSX:
                v = _cell(rows, r, c)
                bins.append(int(v) if v is not None else 0)
            tv = _cell(rows, r, TOTAL_COL)
            out.append(
                {
                    "pubdate": pubdate,
                    "equipment": equipment,
                    "direction_raw": direction_raw,
                    "time_range": time_range,
                    "bins": bins,
                    "total": int(tv) if tv is not None else sum(bins),
                }
            )
    return out


# ---------------------------------------------------------------------------
# Synthetic fixture builder (FIXTURES.md §A1) — deterministic, no RNG.
# ---------------------------------------------------------------------------


def _slot(i: int) -> str:
    h, q = divmod(i % 96, 4)
    m0 = q * 15
    h2, m2 = (h, m0 + 15) if m0 + 15 < 60 else ((h + 1) % 24, 0)
    return f"{h:02d}:{m0:02d} as {h2:02d}:{m2:02d}"


def _counts(equipment: str, pubdate: str, slot: int, direction: str) -> list[int]:
    h = hashlib.md5(f"{equipment}|{pubdate}|{slot}|{direction}".encode()).hexdigest()
    return [int(h[2 * i : 2 * i + 2], 16) % 50 for i in range(11)]


def build_report(
    template: int, pubdate: dt.date, equipment: str, street: str = "Rua Blumenau"
) -> bytes:
    """Synthetic report matching the reference's template geometry."""
    geometry = {1: 109, 2: 210, 3: 205}
    n_rows = geometry[template]
    rows: list[list[object]] = [[None] * 22 for _ in range(n_rows)]
    rows[DATE_CELL[0]][DATE_CELL[1]] = (
        f"Relatório de fluxo - {pubdate.strftime('%d/%m/%Y')}\nMonitran"
    )
    rows[EQUIP_CELL[0]][EQUIP_CELL[1]] = f"{equipment}-RadarFixo"
    sentinel_row = {1: 105, 2: 206, 3: 201}[template]
    rows[sentinel_row][1] = SENTINEL

    dirs = {1: ["N"], 2: ["N", "S"], 3: ["L"]}[template]
    for bi, (begin, n, dir_cell) in enumerate(_blocks(template)):
        direction = dirs[bi] if template != 2 else dirs[bi]
        rows[dir_cell[0]][dir_cell[1]] = f"{street}/{dirs[bi]}"
        for i in range(n):
            r = begin + i
            rows[r][TIME_COL] = _slot(i)
            counts = _counts(equipment, pubdate.isoformat(), i, dirs[bi])
            for c, v in zip(BIN_COLS_XLSX, counts):
                rows[r][c] = v
            rows[r][TOTAL_COL] = sum(counts)
    return write_xlsx(rows)


def build_bad_report() -> bytes:
    """Unknown layout — must quarantine, not crash (clean_data.py:72-73)."""
    rows = [["garbage"] * 5 for _ in range(17)]
    return write_xlsx(rows)
