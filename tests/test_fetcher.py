"""Fetcher (S1/K1) offline tests: URL/params/landing-key parity with
the reference portal loop (src/scrape.py:54-88) via a mocked session."""

from __future__ import annotations

import datetime as dt

from radares_spark.io.fetcher import (
    BASE_PARAMS,
    fetch_reports,
    landing_key,
    login,
    querystring_date,
)
from radares_spark.pipeline.run_log import fetch_run_log


class FakeResponse:
    def __init__(self, content: bytes, status_code: int = 200):
        self.content = content
        self.status_code = status_code

    def raise_for_status(self):
        if self.status_code >= 400:
            raise OSError(f"HTTP {self.status_code}")


class FakeSession:
    """Records calls; raises for FSBADJOI, returns HTTP 401 for FS401JOI."""

    def __init__(self):
        self.posts: list[tuple[str, dict]] = []
        self.gets: list[tuple[str, dict]] = []

    def post(self, url, data=None):
        self.posts.append((url, dict(data)))
        return FakeResponse(b"ok")

    def get(self, url, params=None, stream=False):
        self.gets.append((url, dict(params)))
        if params["equipamento"] == "FSBADJOI":
            raise OSError("connection reset")
        if params["equipamento"] == "FS401JOI":
            return FakeResponse(b"<html>expired login</html>", status_code=401)
        return FakeResponse(b"xlsx:" + params["equipamento"].encode())


D = dt.date(2024, 3, 5)  # single-digit day+month -> exercises padding rules


def test_querystring_unpadded_landing_key_padded():
    # portal date is UN-padded d/m/Y (scrape.py:63-66), the landing key
    # IS zero-padded (scrape.py:87)
    assert querystring_date(D) == "5/3/2024"
    assert landing_key("FS551JOI", D) == "FS551JOI/2024-03-05.xlsx"


def test_login_form_fields():
    s = FakeSession()
    login(s, "https://portal/login", "user", "secret")
    assert s.posts == [("https://portal/login", {"login": "user", "senha": "secret"})]


def test_fetch_lands_bytes_and_isolates_failures(tmp_path):
    s = FakeSession()
    work = [("FS551JOI", D), ("FSBADJOI", D), ("FS401JOI", D), ("FS655JOI", D)]
    results = fetch_reports(s, "https://portal/report", work, str(tmp_path))

    # every device requested with the reference's fixed params
    assert [g[1]["equipamento"] for g in s.gets] == [
        "FS551JOI", "FSBADJOI", "FS401JOI", "FS655JOI"
    ]
    for _, p in s.gets:
        for k, v in BASE_PARAMS.items():
            assert p[k] == v
        assert p["dataStr"] == "5/3/2024"

    # raw bytes landed under the padded key; failure did not stop the loop
    assert (tmp_path / "FS551JOI/2024-03-05.xlsx").read_bytes() == b"xlsx:FS551JOI"
    assert (tmp_path / "FS655JOI/2024-03-05.xlsx").read_bytes() == b"xlsx:FS655JOI"
    assert [r.status for r in results] == ["downloaded", "fail", "fail", "downloaded"]
    assert "connection reset" in results[1].error
    assert not (tmp_path / "FSBADJOI/2024-03-05.xlsx").exists()
    # non-2xx response -> fail result, error body NOT landed as xlsx
    assert "HTTP 401" in results[2].error
    assert not (tmp_path / "FS401JOI/2024-03-05.xlsx").exists()


def test_fetch_run_log_rows(spark, tmp_path):
    s = FakeSession()
    results = fetch_reports(
        s, "https://portal/report", [("FS551JOI", D), ("FSBADJOI", D)], str(tmp_path)
    )
    log = fetch_run_log(spark, results)
    rows = {r["name"]: (r["status"], r["error"]) for r in log.collect()}
    assert rows["FS551JOI/2024-03-05.xlsx"] == ("downloaded", None)
    assert rows["FSBADJOI/2024-03-05.xlsx"][0] == "fail"
