"""Template parser unit tests (SURVEY §5.1): templates 1/2/3 round-trip
through the stdlib xlsx writer/reader, unknown layouts quarantine."""

from __future__ import annotations

import datetime as dt

import pytest

from radares_spark.io.report_parser import (
    TemplateError,
    build_bad_report,
    build_report,
    detect_template,
    parse_report,
)
from radares_spark.io.xlsx import read_xlsx, write_xlsx

PUBDATE = dt.date(2024, 3, 15)


def test_xlsx_roundtrip():
    rows = [["a", None, 3.5], [None, "x y", None], ["Total Geral", 7.0, "z"]]
    got = read_xlsx(write_xlsx(rows))
    assert got[0][0] == "a" and got[0][2] == 3.5
    assert got[1][1] == "x y"
    assert got[2][0] == "Total Geral" and got[2][1] == 7.0


@pytest.mark.parametrize("template,n_rows,n_dirs", [(1, 96, 1), (2, 192, 2), (3, 192, 1)])
def test_parse_templates(template, n_rows, n_dirs):
    data = build_report(template, PUBDATE, "FS551JOI")
    rows = parse_report(data)
    assert len(rows) == n_rows
    assert {r["pubdate"] for r in rows} == {"2024-03-15"}
    assert {r["equipment"] for r in rows} == {"FS551JOI"}
    assert len({r["direction_raw"] for r in rows}) == n_dirs
    for r in rows:
        assert len(r["bins"]) == 11
        assert r["total"] == sum(r["bins"])  # A2 invariant
        assert len(r["time_range"]) == 14 and " as " in r["time_range"]


def test_template_detection():
    for t in (1, 2, 3):
        assert detect_template(read_xlsx(build_report(t, PUBDATE, "FS001JOI"))) == t
    with pytest.raises(TemplateError):
        detect_template(read_xlsx(build_bad_report()))


def test_parse_is_deterministic():
    a = parse_report(build_report(2, PUBDATE, "FS655JOI"))
    b = parse_report(build_report(2, PUBDATE, "FS655JOI"))
    assert a == b


def test_slot_grid():
    rows = parse_report(build_report(1, PUBDATE, "FS551JOI"))
    assert rows[0]["time_range"] == "00:00 as 00:15"
    assert rows[-1]["time_range"] == "23:45 as 00:00"
