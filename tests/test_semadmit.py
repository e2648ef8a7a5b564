"""Semantic admission against the IVF serving store
(semdedup.semdedup_admit_from_store): a nightly delta is gated by
cosine against the KEPT corpus's vectors, reading only probed cell
partitions. Pins: full-probe equality with a brute-force python
oracle, planted-twin recall at n_probe=1, changed-doc self-exclusion,
and the DPP-pruned scan."""

from __future__ import annotations

import numpy as np
import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from radares_spark.operators.semdedup import semdedup_admit_from_store
from radares_spark.operators.similarity import (
    _normed,
    build_ivf_index,
    write_ivf_store,
)
from tests.conftest import SF_SMOKE

N_CELLS = 8
TAU = 0.35


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    normed = _normed(spark, SF_SMOKE).localCheckpoint()
    assignment, centroids = build_ivf_index(normed, n_cells=N_CELLS, iters=3)
    path = str(tmp_path_factory.mktemp("semadmit") / "store")
    write_ivf_store(
        spark, normed, assignment.localCheckpoint(),
        centroids.localCheckpoint(), path,
    )
    return normed, path


def _np_vectors(df):
    return {
        r["vec_id"]: (np.array(r["v"], dtype=np.float64), r["nrm"])
        for r in df.collect()
    }


def test_full_probe_matches_brute_force(spark, store):
    """n_probe = n_cells => the gate IS exact max-cosine admission;
    verified against a numpy brute force with the same round-4 and
    tie-break conventions."""
    normed, path = store
    delta = (
        normed.filter(F.col("vec_id") % 7 == 3)
        .limit(12)
        .select((F.col("vec_id") + 700000).alias("vec_id"), "label", "v", "nrm")
        .localCheckpoint()
    )
    got = {
        r["vec_id"]: (r["outcome"], r["match_id"])
        for r in semdedup_admit_from_store(
            spark, path, delta, tau=TAU, n_probe=N_CELLS
        ).collect()
    }
    corpus = _np_vectors(spark.read.parquet(path).select("vec_id", "v", "nrm"))
    for vid, (v, nrm) in _np_vectors(
        delta.select("vec_id", "v", "nrm")
    ).items():
        best = max(
            (
                (round(float(np.dot(v, cv) / (nrm * cn)), 4), -cid)
                for cid, (cv, cn) in corpus.items()
                if cid != vid
            ),
        )
        cos, match = best[0], -best[1]
        want = ("semantic_dup", match) if cos >= TAU else ("kept", got[vid][1])
        assert got[vid] == want, (vid, got[vid], (cos, match))


def test_planted_twin_caught_at_one_probe(spark, store):
    """A delta doc that is a byte copy of a stored vector must be
    flagged at n_probe=1 (its nearest cell IS its twin's cell) with
    match_cos 1.0 and the twin as match_id."""
    normed, path = store
    donor = normed.orderBy("vec_id").limit(3).localCheckpoint()
    twins = donor.select(
        (F.col("vec_id") + 500000).alias("vec_id"), "label", "v", "nrm"
    )
    out = {
        r["vec_id"]: r
        for r in semdedup_admit_from_store(
            spark, path, twins, tau=0.95, n_probe=1
        ).collect()
    }
    for r in donor.select("vec_id").collect():
        twin = r["vec_id"] + 500000
        assert out[twin]["outcome"] == "semantic_dup", out[twin]
        assert out[twin]["match_id"] == r["vec_id"]
        assert out[twin]["match_cos"] == pytest.approx(1.0, abs=1e-4)


def test_changed_doc_does_not_match_its_own_stale_vector(spark, store):
    """A changed doc re-embedded under its stored id must not be
    dropped against its own old vector (the refresh replaces it) —
    exclude_self keeps the gate honest, and with every OTHER vector
    below tau the doc stays kept."""
    normed, path = store
    # reuse a stored id with its own (identical) vector: the only >=
    # tau=0.999 neighbor would be itself
    keep_id = normed.orderBy("vec_id").limit(1).collect()[0]["vec_id"]
    same = normed.filter(F.col("vec_id") == keep_id)
    out = semdedup_admit_from_store(
        spark, path, same, tau=0.999, n_probe=N_CELLS
    ).collect()
    assert len(out) == 1 and out[0]["outcome"] == "kept", out


def test_probe_scan_is_partition_pruned(spark, store):
    normed, path = store
    delta = normed.limit(4).select(
        (F.col("vec_id") + 600000).alias("vec_id"), "label", "v", "nrm"
    )
    audit = semdedup_admit_from_store(spark, path, delta, tau=TAU, n_probe=1)
    audit.collect()
    plan = audit._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "vec_id#" in ln and "cell#" in ln
    ]
    assert scans, "store never scanned"
    assert any("dynamicpruningexpression(cell#" in ln for ln in scans), (
        "admission probe did not prune cells"
    )


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_crawl_nightly_semantic_gate(spark, tmp_path):
    """crawl-nightly --semantic-store: an admitted page whose content
    semantically duplicates a RESIDENT kept-corpus doc drops with
    outcome semantic_dup and never lands in kept/; novel pages pass."""
    import pandas as pd

    from radares_spark.cli import main
    from radares_spark.operators.embed import hashed_tf

    body_resident = (
        "genuine prose with the quick brown fox and many more words "
        "covering several sentences of plausible english text " * 5
    )
    body_novel = (
        "an entirely different article about the history of astronomy "
        "and the telescopes that mapped the sky in early modern times " * 5
    )
    # resident kept corpus -> IVF store the nightly gates against
    resident = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [body_resident]})
    )
    vecs = hashed_tf(resident, 16).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").alias("v"),
        F.lit(1.0).alias("nrm"),
    ).localCheckpoint()
    assignment, centroids = build_ivf_index(vecs, n_cells=1, iters=1, dim=16)
    store_dir = str(tmp_path / "resident_ivf")
    write_ivf_store(
        spark, vecs, assignment.localCheckpoint(),
        centroids.localCheckpoint(), store_dir,
    )

    pages = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "url": [
                "https://a.example.com/twin",
                "https://b.example.com/novel",
            ],
            "html": [
                f"<html><body><p>{b}</p></body></html>"
                for b in (body_resident, body_novel)
            ],
        }
    )
    src = tmp_path / "pages"
    spark.createDataFrame(pages).write.parquet(str(src))
    out = tmp_path / "out"
    rc = main(
        [
            "crawl-nightly", "--pages", str(src),
            "--url-ledger", str(tmp_path / "ledger"), "--out", str(out),
            "--semantic-store", store_dir, "--semantic-tau", "0.95",
        ]
    )
    assert rc == 0
    audit = {
        r["doc_id"]: r["outcome"]
        for r in spark.read.parquet(str(out / "audit")).collect()
    }
    assert audit[0] == "semantic_dup" and audit[1] == "kept", audit
    kept_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(out / "kept")).select("doc_id").collect()
    }
    assert kept_ids == {1}


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_crawl_nightly_semantic_and_content_gates_compose(spark, tmp_path):
    """Both nightly gates together pin the ordering contract: the
    semantic gate runs FIRST, so a semantically-dropped page never
    claims content-ledger residency; the content ledger then catches
    cross-night twins of what actually kept. Outcomes land in one
    audit; the ledger holds ONLY each night's final kept docs."""
    import pandas as pd

    from radares_spark.cli import main
    from radares_spark.operators.embed import hashed_tf

    body_resident = (
        "genuine prose with the quick brown fox and many more words "
        "covering several sentences of plausible english text " * 5
    )
    body_novel = (
        "an entirely different article about the history of astronomy "
        "and the telescopes that mapped the sky in early modern times " * 5
    )
    body_third = (
        "a long report on river navigation describing locks and barges "
        "and the seasonal floods that shaped trade along the banks " * 5
    )
    resident = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [body_resident]})
    )
    vecs = hashed_tf(resident, 16).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").alias("v"),
        F.lit(1.0).alias("nrm"),
    ).localCheckpoint()
    assignment, centroids = build_ivf_index(vecs, n_cells=1, iters=1, dim=16)
    store_dir = str(tmp_path / "resident_ivf")
    write_ivf_store(
        spark, vecs, assignment.localCheckpoint(),
        centroids.localCheckpoint(), store_dir,
    )
    url_led = str(tmp_path / "url_ledger")
    con_led = str(tmp_path / "content_ledger")

    def _night(n, rows):
        src = tmp_path / f"pages{n}"
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [i for i, _, _ in rows],
                    "url": [u for _, u, _ in rows],
                    "html": [
                        f"<html><body><p>{b}</p></body></html>"
                        for _, _, b in rows
                    ],
                }
            )
        ).write.parquet(str(src))
        out = tmp_path / f"out{n}"
        rc = main(
            [
                "crawl-nightly", "--pages", str(src),
                "--url-ledger", url_led, "--out", str(out),
                "--semantic-store", store_dir, "--semantic-tau", "0.95",
                "--content-ledger", con_led, "--max-bucket", "64",
            ]
        )
        assert rc == 0
        return {
            r["doc_id"]: r["outcome"]
            for r in spark.read.parquet(str(out / "audit")).collect()
        }

    # night 1: a semantic twin of the RESIDENT doc (drops via the
    # gate, must NOT enter the content ledger) + a novel page (keeps)
    a1 = _night(1, [(0, "https://a.example.com/twin", body_resident),
                    (1, "https://b.example.com/novel", body_novel)])
    assert a1 == {0: "semantic_dup", 1: "kept"}
    led_ids = {
        r["doc_id"]
        for r in spark.read.parquet(con_led).select("doc_id").collect()
    }
    assert led_ids == {1}  # the semantic drop claimed no residency

    # night 2: the semantic twin RETRIES at a new url — still dropped
    # by the gate (not by the content ledger, where it never resided);
    # a copy of night 1's KEPT page drops via the content ledger; a
    # genuinely new page keeps
    a2 = _night(2, [(10, "https://c.example.com/twin2", body_resident),
                    (11, "https://d.example.com/copy", body_novel),
                    (12, "https://e.example.com/third", body_third)])
    assert a2 == {
        10: "semantic_dup",
        11: "exact_dup_corpus",
        12: "kept",
    }
    led_ids = {
        r["doc_id"]
        for r in spark.read.parquet(con_led).select("doc_id").collect()
    }
    assert led_ids == {1, 12}


def test_misconfigured_store_raises_descriptive_error(spark, store, tmp_path):
    """A missing or empty _centroids sidecar must name the store and
    the init prerequisite, not die with a bare 'NoneType is not
    subscriptable' TypeError (r8 advice)."""
    from radares_spark.operators.semdedup import store_centroids

    normed, path = store
    delta = normed.limit(1)
    missing = str(tmp_path / "not_a_store")
    with pytest.raises(ValueError, match="no _centroids sidecar"):
        semdedup_admit_from_store(spark, missing, delta)
    empty = str(tmp_path / "empty_store")
    spark.read.parquet(f"{path}/_centroids").limit(0).write.parquet(
        f"{empty}/_centroids"
    )
    with pytest.raises(ValueError, match="EMPTY _centroids"):
        semdedup_admit_from_store(spark, empty, delta)
    # the healthy path still infers the dim from the sidecar
    _, dim = store_centroids(spark, path)
    assert dim == len(normed.head()["v"])


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_crawl_nightly_intra_night_semantic_twins(spark, tmp_path):
    """r8 verdict #2 (the within-night hole): two lexically-distinct
    paraphrases of the SAME article arriving the SAME night pass the
    store gate (the resident corpus knows neither) and the lexical
    near-dedup (word order changes every shingle but not the tf
    vector) — the intra-night cluster-blocked SemDeDup must keep
    exactly one, and only the survivor may claim content-ledger
    residency."""
    import pandas as pd

    from radares_spark.cli import main
    from radares_spark.operators.embed import hashed_tf

    body_resident = (
        "genuine prose with the quick brown fox and many more words "
        "covering several sentences of plausible english text " * 5
    )
    body_twin_a = (
        "an entirely different article about the history of astronomy "
        "and the telescopes that mapped the sky in early modern times " * 5
    )
    # the same word multiset in reversed order: every shingle differs
    # (minhash-blind) while the tf vector is identical (cosine 1.0)
    body_twin_b = " ".join(reversed(body_twin_a.split()))
    body_novel = (
        "a long report on river navigation describing locks and barges "
        "and the seasonal floods that shaped trade along the banks " * 5
    )
    resident = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [body_resident]})
    )
    vecs = hashed_tf(resident, 16).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").alias("v"),
        F.lit(1.0).alias("nrm"),
    ).localCheckpoint()
    assignment, centroids = build_ivf_index(vecs, n_cells=1, iters=1, dim=16)
    store_dir = str(tmp_path / "resident_ivf")
    write_ivf_store(
        spark, vecs, assignment.localCheckpoint(),
        centroids.localCheckpoint(), store_dir,
    )

    pages = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "url": [
                "https://a.example.com/twin-a",
                "https://b.example.com/twin-b",
                "https://c.example.com/novel",
            ],
            "html": [
                f"<html><body><p>{b}</p></body></html>"
                for b in (body_twin_a, body_twin_b, body_novel)
            ],
        }
    )
    src = tmp_path / "pages"
    spark.createDataFrame(pages).write.parquet(str(src))
    out = tmp_path / "out"
    con_led = str(tmp_path / "content_ledger")
    rc = main(
        [
            "crawl-nightly", "--pages", str(src),
            "--url-ledger", str(tmp_path / "ledger"), "--out", str(out),
            "--semantic-store", store_dir, "--semantic-tau", "0.95",
            "--content-ledger", con_led,
        ]
    )
    assert rc == 0
    audit = {
        r["doc_id"]: r["outcome"]
        for r in spark.read.parquet(str(out / "audit")).collect()
    }
    # ties on centroid_sim break to the smaller vec_id: 0 survives
    assert audit[0] == "kept", audit
    assert audit[1] == "semantic_dup_intra", audit
    assert audit[2] == "kept", audit
    kept_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(out / "kept")).select("doc_id").collect()
    }
    assert kept_ids == {0, 2}
    led_ids = {
        r["doc_id"]
        for r in spark.read.parquet(con_led).select("doc_id").collect()
    }
    assert led_ids == {0, 2}  # the intra drop claimed no residency
