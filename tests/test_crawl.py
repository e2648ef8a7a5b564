"""End-to-end crawl curation (pipeline/crawl.py): stage order, audit
spine completeness, and first-dropping-stage attribution over a
planted mini-crawl."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

BODY_A = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain every single day of the long year"
)
BODY_B = (
    "a completely different page about the history of distributed "
    "systems and the many ways in which they fail under load over time"
)


def _page(body):
    return f"<html><head><style>x{{}}</style></head><body><p>{body}</p></body></html>"


@pytest.fixture(scope="module")
def crawl_result(spark):
    from radares_spark.pipeline.crawl import curate_crawl

    spam_body = (
        "buy the best cheap widgets in the whole wide world today and "
        "every day because the deals on this site are always the best "
    )
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "url": [
                "https://a.com/x",
                "https://A.com:443/x#frag",  # same canonical URL as 0
                "https://b.com/copy",        # same CONTENT as 0
                "https://c.com/thin",
                "https://d.com/fresh",
                "https://e.com/pii",
                "https://spam.com/1",
                "https://spam.com/2",
                "https://spam.com/3",
                "https://spam.com/4",
            ],
            "html": [
                _page(BODY_A),
                _page("whatever the fetcher got the second time"),
                _page(BODY_A),
                _page("too few words here"),  # quality fail
                _page(BODY_B),
                _page(BODY_B.replace("history", "story") + " mail me at a@b.co"),
                _page(spam_body + "one"),
                _page(spam_body + "two two"),
                _page(spam_body + "three three three"),
                _page(spam_body + "four four four four"),
            ],
        }
    )
    kept, audit = curate_crawl(
        spark.createDataFrame(pdf), max_per_domain=2
    )
    return (
        {r["doc_id"]: r for r in kept.collect()},
        {r["doc_id"]: r["outcome"] for r in audit.collect()},
    )


def test_audit_spine_covers_every_page_once(crawl_result):
    _, audit = crawl_result
    assert sorted(audit) == list(range(10))


def test_first_dropping_stage_attribution(crawl_result):
    kept, audit = crawl_result
    assert audit[0] == "kept"
    assert audit[1] == "url_dup"       # canonical twin of 0, html never parsed
    assert audit[2] == "exact_dup"     # same extracted content as 0
    assert audit[3] == "quality"
    assert audit[4] == "kept"
    # spam.com: cap 2 by text length — the two LONGEST suffixes win
    spam = {d: audit[d] for d in (6, 7, 8, 9)}
    assert sorted(spam.values()) == ["domain_capped", "domain_capped", "kept", "kept"]
    assert spam[9] == "kept" and spam[8] == "kept"  # longest texts
    assert set(kept) == {d for d, o in audit.items() if o == "kept"}


def test_pii_scrubbed_and_markup_stripped_before_keeping(crawl_result):
    kept, audit = crawl_result
    assert audit[5] in ("kept", "near_dup")  # near-twin of 4 either way
    if 5 in kept:
        t = kept[5]["text"]
        assert "<EMAIL>" in t and "a@b.co" not in t
    assert "<p>" not in kept[0]["text"] and "style" not in kept[0]["text"]
    assert kept[0]["text"].startswith("the quick brown fox")


def test_pipeline_audit_outcome_distribution(spark):
    """The e2e spec must exercise every stage: the paired synthetic
    URLs drop exactly half the crawl as url_dup, and the content
    stages classify the survivors (DuckDB parity runs in the library
    sweep)."""
    from collections import Counter

    from radares_spark.pipeline.crawl import crawl_pipeline_audit
    from tests.conftest import SF_ORACLE

    audit = crawl_pipeline_audit(spark, SF_ORACLE).collect()
    c = Counter(r["outcome"] for r in audit)
    assert sum(c.values()) == 500
    assert c["url_dup"] == 250  # every id pair shares a canonical URL
    assert c["kept"] > 0
    assert set(c) <= {"url_dup", "kept", "quality", "lang", "exact_dup", "near_dup"}
