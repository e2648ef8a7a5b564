"""Portal fetcher — the S1/K1 edge of the pipeline (driver-side).

Mirrors the reference's authenticated download loop
(``/root/reference/src/scrape.py:54-88``, ``backload_scrape.py:109-120``):

- one authenticated HTTP session: ``POST auth_url {login, senha}``
  (scrape.py:54-56);
- per (equipment, date) work item: ``GET url`` with the portal's query
  params — ``dataStr`` as un-padded ``d/m/Y``, hour range 00-23,
  ``opcao=excel``, ``exibir=on``, ``equipamento=<id>``
  (scrape.py:63-72, 85-86);
- raw bytes land under ``<equipment>/<YYYY-MM-DD>.xlsx`` (zero-padded
  landing key, scrape.py:87-88) — the landing prefix the
  ``binaryFile`` ingest scans (io/ingest.py);
- per-item failure isolation: one device failing records a ``fail``
  run-log row and the loop continues (scrape.py:105-111) — including
  the reference's latent bug fixed here: its ``data_execucao`` is
  referenced before assignment when the very first request throws.

This is NOT a Spark operator (SURVEY §2.1 S1): it is plain ``requests``
driver code, isolated behind an injectable ``session`` so everything is
testable offline, and kept out of the query engine entirely. The work
list it consumes comes from the anti-join backfill planner
(pipeline/backfill.py) — bounded by devices x days, so collecting it to
the driver is legitimate. For massive fan-out the same ``fetch_one``
kernel can ride a ``mapInPandas`` over the work-list DataFrame.

Credentials come from the caller / environment — never hardcoded (the
reference's schema.sql:4 hardcodes one; deliberately not replicated).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterable

# Fixed portal query params (reference scrape.py:66-72).
BASE_PARAMS = {
    "horaInicio": "00",
    "horaFim": "23",
    "opcao": "excel",
    "exibir": "on",
}


@dataclass(frozen=True)
class FetchResult:
    equipment: str
    pubdate: dt.date
    key: str  # landing-relative key "<equip>/<YYYY-MM-DD>.xlsx"
    status: str  # downloaded | fail
    error: str | None
    fetched_at: dt.datetime


def querystring_date(d: dt.date) -> str:
    """Un-padded d/m/Y — exactly the portal's format (scrape.py:63-66:
    ``str(day)+"/"+str(month)+"/"+str(year)``, no zfill)."""
    return f"{d.day}/{d.month}/{d.year}"


def landing_key(equipment: str, d: dt.date) -> str:
    """Zero-padded landing key (scrape.py:87: ``equip/Y-m-d.xlsx`` with
    ``month.zfill(2)``/``day.zfill(2)``)."""
    return f"{equipment}/{d.year}-{d.month:02d}-{d.day:02d}.xlsx"


def login(session: Any, auth_url: str, username: str, password: str) -> Any:
    """Authenticate the session (scrape.py:54-56: form fields are the
    portal's pt-BR names ``login``/``senha``)."""
    return session.post(auth_url, data={"login": username, "senha": password})


def fetch_one(
    session: Any, url: str, equipment: str, d: dt.date, landing_dir: str
) -> FetchResult:
    """Download one report and land the raw bytes. Raises nothing —
    failures become a ``fail`` result (per-device isolation)."""
    key = landing_key(equipment, d)
    fetched_at = dt.datetime.now()
    try:
        params = dict(BASE_PARAMS, dataStr=querystring_date(d), equipamento=equipment)
        resp = session.get(url, params=params, stream=True)
        # A 401 (expired login) or 500 must become a ``fail`` result, NOT
        # land its HTML error body as <equip>/<date>.xlsx — that would
        # misclassify fetch failures as parse-quarantines downstream and
        # leave junk the backfill planner treats as done.
        resp.raise_for_status()
        target = Path(landing_dir) / key
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_bytes(resp.content)
        return FetchResult(equipment, d, key, "downloaded", None, fetched_at)
    except Exception as e:
        return FetchResult(equipment, d, key, "fail", str(e), fetched_at)


def fetch_reports(
    session: Any,
    url: str,
    work_items: Iterable[tuple[str, dt.date]],
    landing_dir: str,
) -> list[FetchResult]:
    """Fetch every (equipment, date) work item; never aborts the loop.

    ``work_items`` is the collected output of the backfill planner's
    anti-join (pipeline/backfill.py — reference backload_scrape.py:61-86)
    or the single-yesterday daily list (scrape.py:59-66).
    """
    return [fetch_one(session, url, eq, d, landing_dir) for eq, d in work_items]
