"""Planted-semantics tests for DSIR importance weights and the
hashed-unigram LM score (operators/dsir.py). Value parity vs DuckDB is
covered by the ALL_LIBRARY_SPECS sweep in test_oracle_parity.py; these
pin that the scores actually DISCRIMINATE the way the papers intend."""

from __future__ import annotations

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.dsir import dsir_weights, unigram_logprob
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TARGETY = "the quick brown fox jumps over the lazy dog near the river bank"
OTHERY = "zxq vbn mkl poi uyt rew qas dfg hjk lzx cvb nmq wer tyu iop"


def test_dsir_steers_toward_target_distribution(spark):
    """Docs made of target-marker grams must outscore docs made of
    never-in-target grams; a doc with no grams scores exactly 0."""
    docs = _docs(
        spark,
        [
            (1, TARGETY),          # target member
            (2, TARGETY + " extra"),  # target member
            (3, TARGETY),          # raw doc that LOOKS like the target
            (4, OTHERY),           # raw doc that does not
            (5, None),             # no grams
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(docs, F.col("doc_id") <= 2).collect()
    }
    # absolute sign is smoothing-dependent at toy scale (add-1 over
    # 1024 buckets dwarfs a 50-gram corpus); the ORDERING is the
    # contract: target-like ranks strictly above target-unlike, and
    # identical text to a target member scores exactly like it
    assert out[3]["dsir_logweight"] > out[4]["dsir_logweight"]
    assert out[3]["dsir_logweight"] == out[1]["dsir_logweight"]
    assert out[5]["n_grams"] == 0 and out[5]["dsir_logweight"] == 0.0


def test_dsir_on_testdata_separates_languages(spark):
    """With target = lang 'en', English docs must average a higher
    weight than non-English docs — the discriminative sanity check."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    w = dsir_weights(docs, F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
        if r["is_en"] is not None
    }
    assert means[True] > means[False]


def test_unigram_logprob_ranks_rare_text_as_surprising(spark):
    """A doc of corpus-common words scores lower (less surprising)
    than a doc of corpus-rare words under the corpus-trained model."""
    common = "alpha beta " * 30
    docs = _docs(
        spark,
        [(i, common) for i in range(10)]
        + [(100, "alpha beta alpha beta alpha beta")]  # all common words
        + [(101, "qqqz wwwx eeec rrrv tttb yyyn")],  # all rare words
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert out[100]["avg_neg_logprob"] < out[101]["avg_neg_logprob"]
    assert out[100]["n_tokens"] == 6 and out[101]["n_tokens"] == 6


def test_dsir_resample_takes_highest_weights_first(spark):
    """Greedy budgeted selection: the admitted set is exactly the
    (weight desc, doc_id) prefix, never a lower-weight doc admitted
    over a higher-weight one."""
    from radares_spark.operators.dsir import dsir_resample, dsir_weights

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    budget = 2_000
    picked = {
        r["doc_id"]: r["n_tokens"]
        for r in dsir_resample(docs, F.col("lang") == "en", budget).collect()
    }
    assert picked and sum(picked.values()) <= budget
    # naive oracle ordering on the driver (500 docs)
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    order = sorted(w, key=lambda d: (-w[d], d))
    expect, total = set(), 0
    ntok = {
        r["doc_id"]: r["n_tokens"]
        for r in dsir_resample(docs, F.col("lang") == "en", 10**9)
        .select("doc_id", "n_tokens")
        .collect()
    }
    for d in order:
        if total + ntok[d] > budget:
            break
        total += ntok[d]
        expect.add(d)
    assert set(picked) == expect


def test_plans_have_no_doc_level_broadcast_or_python(spark):
    """The model tables are the ONLY broadcast sides (N_BUCKETS rows);
    no row-Python anywhere."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    for df in (
        dsir_weights(docs, F.col("lang") == "en"),
        unigram_logprob(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the model reaches the gram stream as a broadcast equi join on
        # the bucket id (the only corpus-wide join in the plan); the
        # 1-row totals crossJoin is the sanctioned scalar broadcast
        assert "BroadcastHashJoin [b#" in plan
        assert "CartesianProduct" not in plan


def test_unigram_sql_matches_spark_on_null_and_empty_text(spark):
    """ADVICE r4: the DuckDB mirror must agree with Spark on NULL/empty
    docs — string_split('', ' ') yields [''] in DuckDB (one bogus gram
    at n=1) unless empty normalized text is excluded from the gram
    stream. Both sides must score such docs n_tokens=0, logprob 0.0."""
    import duckdb
    import pandas as pd

    from radares_spark.operators.dsir import UNIGRAM_SQL

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                None,
                "",
                "   ",
                "real words appear here",
                "real words appear here too",
            ],
        }
    )
    sdf = spark.createDataFrame(pdf.astype(object), "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(sdf).collect()}
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {
        r[0]: r for r in con.execute(UNIGRAM_SQL).fetchall()
    }
    assert set(got) == set(oracle) == {1, 2, 3, 4, 5}
    for d in got:
        assert got[d]["n_tokens"] == oracle[d][1], d
        assert got[d]["avg_neg_logprob"] == __import__("pytest").approx(
            oracle[d][2], abs=1e-9
        ), d
    # the degenerate docs really are degenerate on both sides
    for d in (1, 2, 3):
        assert got[d]["n_tokens"] == 0 and got[d]["avg_neg_logprob"] == 0.0


def test_ccnet_buckets_split_by_token_mass_per_language(spark):
    """ccnet_buckets semantics on testdata: within every language, the
    bucket sequence is monotone in (score, doc_id) order — head, then
    middle, then tail — and the head/middle masses are the MAXIMAL
    prefixes fitting their token-mass fractions."""
    from radares_spark.operators.dsir import HEAD_FRAC, TAIL_FRAC, ccnet_buckets
    from radares_spark.io.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    rows = ccnet_buckets(docs).collect()
    assert len(rows) == docs.count()

    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["avg_neg_logprob"], r["doc_id"]))
        seq = [order[r["bucket"]] for r in rs]
        assert seq == sorted(seq), lang  # monotone prefix split
        assert set(seq) == {0, 1, 2}, lang  # all three fire on testdata
        tot = sum(r["n_tokens"] for r in rs)
        head = [r for r in rs if r["bucket"] == "head"]
        head_mass = sum(r["n_tokens"] for r in head)
        assert head_mass <= tot * HEAD_FRAC, lang
        first_middle = next(r for r in rs if r["bucket"] == "middle")
        assert head_mass + first_middle["n_tokens"] > tot * HEAD_FRAC, lang
        nontail_mass = sum(
            r["n_tokens"] for r in rs if r["bucket"] in ("head", "middle")
        )
        assert nontail_mass <= tot * (1.0 - TAIL_FRAC), lang
        first_tail = next(r for r in rs if r["bucket"] == "tail")
        assert nontail_mass + first_tail["n_tokens"] > tot * (1.0 - TAIL_FRAC), lang


def test_ccnet_and_resample_never_sort_the_corpus(spark):
    """The scale claim of both prefix-sum consumers, held in the plan:
    no range partitioning (global sort) anywhere — ordering work happens
    only inside the bounded bin/lang windows."""
    from radares_spark.operators.dsir import ccnet_buckets, dsir_resample
    from radares_spark.io.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    for df in (
        ccnet_buckets(docs),
        dsir_resample(docs, F.col("lang") == "en", 10_000),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_ccnet_buckets_keep_null_lang_docs(spark):
    """Review fix: a NULL-lang doc must not vanish through the
    null-rejecting equi-joins — it forms its own language group, same
    as the oracle's PARTITION BY lang."""
    import duckdb
    import pandas as pd

    from radares_spark.operators.dsir import CCNET_SQL, ccnet_buckets

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over another lazy dog",
                "zzgblorp qwxv jjkh unique rare tokens here now",
                "common words appear here as well in this doc",
            ],
            "lang": ["en", "en", None, None],
        }
    )
    sdf = spark.createDataFrame(pdf.astype(object), "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["lang"], r["bucket"]) for r in ccnet_buckets(sdf).collect()}
    assert set(got) == {1, 2, 3, 4}  # NULL-lang docs stay in the output
    assert got[3][0] is None and got[4][0] is None

    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {r[0]: (r[1], r[4]) for r in con.execute(CCNET_SQL).fetchall()}
    assert got == oracle


# ---- conditional (bigram) LM score ----


def test_bigram_logprob_penalizes_shuffled_word_order(spark):
    """The discriminating property the unigram scorer CANNOT have:
    identical token multiset, different order => different score, with
    fluent (corpus-typical) order scoring lower perplexity. Train on
    many copies of a fluent sentence plus one shuffled outlier."""
    import pandas as pd
    from radares_spark.operators.dsir import bigram_logprob, unigram_logprob

    fluent = "the cat sat on the mat and the dog ran off"
    shuffled = "mat the on dog cat the ran sat off and the"  # same words
    pdf = pd.DataFrame(
        {
            "doc_id": range(21),
            "text": [fluent] * 20 + [shuffled],
        }
    )
    docs = spark.createDataFrame(pdf)
    bi = {r["doc_id"]: r["avg_neg_logprob"] for r in bigram_logprob(docs).collect()}
    uni = {
        r["doc_id"]: r["avg_neg_logprob"] for r in unigram_logprob(docs).collect()
    }
    # unigram: blind to order (same multiset => same score)
    assert abs(uni[0] - uni[20]) < 1e-9
    # bigram: the shuffled doc is strictly more surprising
    assert bi[20] > bi[0] + 1.0


def test_bigram_logprob_short_docs_keep_rows(spark):
    import pandas as pd
    from radares_spark.operators.dsir import bigram_logprob

    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["one", "", None]})
    rows = {r["doc_id"]: r for r in bigram_logprob(spark.createDataFrame(pdf)).collect()}
    for d in (0, 1, 2):
        assert rows[d]["n_bigrams"] == 0 and rows[d]["avg_neg_logprob"] == 0.0


def test_kn_bigram_matches_pure_python_replica(spark):
    """Interpolated Kneser-Ney (fixed discount): the Spark model must
    equal an independent pure-python implementation of the Chen &
    Goodman formula over the same hashed buckets — continuation counts
    and the discount/backoff split included."""
    import hashlib
    import math

    import pandas as pd

    from radares_spark.operators.dsir import (
        KN_DISCOUNT,
        N_BUCKETS,
        kn_bigram_logprob,
    )
    from tests.test_bpe import _ref_normalize

    texts = [
        "the cat sat on the mat and the dog ran off",
        "the dog sat on the cat",
        "a completely different sentence about rivers and locks",
        "the cat sat on the mat again and again",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % N_BUCKETS

    grams = {}
    for i, t in enumerate(texts):
        w = _ref_normalize(t or "").split()
        grams[i] = [
            (bucket(w[j]), bucket(f"{w[j]} {w[j+1]}"))
            for j in range(len(w) - 1)
        ] if len(w) >= 2 else []
    from collections import Counter

    c2 = Counter(g for gs in grams.values() for g in gs)
    c1 = Counter()
    n_after = Counter()
    n_before = Counter()
    for (b1, b2), c in c2.items():
        c1[b1] += c
        n_after[b1] += 1
        n_before[b2] += 1
    t_total = len(c2)
    D = KN_DISCOUNT

    def nlp(b1, b2):
        return -math.log(
            max(c2[(b1, b2)] - D, 0.0) / c1[b1]
            + D * n_after[b1] / c1[b1] * (n_before[b2] / t_total)
        )

    want = {
        i: round(sum(nlp(*g) for g in gs) / len(gs), 6) if gs else 0.0
        for i, gs in grams.items()
    }
    got = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in kn_bigram_logprob(docs).collect()
    }
    for i in grams:
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])

    # and the probabilities are a proper distribution per context:
    # sum_w p_KN(w|v) == 1 for every context in the closed bucket set
    for b1 in c1:
        s = sum(
            max(c2.get((b1, b2), 0) - D, 0.0) / c1[b1]
            + D * n_after[b1] / c1[b1] * (n_before[b2] / t_total)
            for b2 in n_before
        )
        assert abs(s - 1.0) < 1e-9, (b1, s)


def test_kn_bigram_penalizes_shuffled_word_order(spark):
    """KN keeps the bigram scorer's discriminating property (word
    order) while redistributing mass by continuation counts rather
    than uniformly."""
    import pandas as pd

    from radares_spark.operators.dsir import bigram_logprob, kn_bigram_logprob

    fluent = "the cat sat on the mat and the dog ran off"
    shuffled = "mat the on dog cat the ran sat off and the"
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(21), "text": [fluent] * 20 + [shuffled]})
    )
    kn = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in kn_bigram_logprob(docs).collect()
    }
    assert kn[20] > kn[0] + 1.0
    # the two smoothers are genuinely different models, not a rename
    aa = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in bigram_logprob(docs).collect()
    }
    assert abs(kn[0] - aa[0]) > 1e-3


def test_kn_trigram_matches_pure_python_replica(spark):
    """Recursive interpolated KN: the Spark model equals an
    independent python implementation of the full Chen & Goodman
    chain — continuation-count middle and low orders included — and
    BOTH conditional levels are proper distributions (sum to 1 per
    context)."""
    import hashlib
    import math
    from collections import Counter

    import pandas as pd

    from radares_spark.operators.dsir import (
        KN_DISCOUNT,
        N_BUCKETS,
        kn_trigram_logprob,
    )
    from tests.test_bpe import _ref_normalize

    texts = [
        "the cat sat on the mat and the dog ran off the mat",
        "the dog sat on the cat and the cat ran",
        "a completely different sentence about rivers locks and barges",
        "the cat sat on the mat again and again and again",
        "two words",
        "",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % N_BUCKETS

    grams = {}
    for i, t in enumerate(texts):
        w = _ref_normalize(t or "").split()
        grams[i] = [
            (bucket(w[j]), bucket(w[j + 1]), bucket(w[j + 2]))
            for j in range(len(w) - 2)
        ] if len(w) >= 3 else []
    c3 = Counter(g for gs in grams.values() for g in gs)
    c12, n_after12, a23 = Counter(), Counter(), Counter()
    for (b1, b2, b3), c in c3.items():
        c12[(b1, b2)] += c
        n_after12[(b1, b2)] += 1
        a23[(b2, b3)] += 1
    a_sum, nv, bw = Counter(), Counter(), Counter()
    for (b2, b3), a in a23.items():
        a_sum[b2] += a
        nv[b2] += 1
        bw[b3] += 1
    t_total = len(a23)
    D = KN_DISCOUNT

    def p2(b2, b3):
        return max(a23[(b2, b3)] - D, 0.0) / a_sum[b2] + D * nv[b2] / a_sum[
            b2
        ] * (bw[b3] / t_total)

    def nlp(b1, b2, b3):
        return -math.log(
            max(c3[(b1, b2, b3)] - D, 0.0) / c12[(b1, b2)]
            + D * n_after12[(b1, b2)] / c12[(b1, b2)] * p2(b2, b3)
        )

    want = {
        i: round(sum(nlp(*g) for g in gs) / len(gs), 6) if gs else 0.0
        for i, gs in grams.items()
    }
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_neg_logprob"])
        for r in kn_trigram_logprob(docs).collect()
    }
    for i, gs in grams.items():
        assert got[i][0] == len(gs)
        assert abs(got[i][1] - want[i]) < 1e-6, (i, got[i], want[i])
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)  # <3 tokens

    # both conditional levels are proper distributions
    for b2 in a_sum:
        s = sum(p2(b2, b3) for b3 in bw)
        assert abs(s - 1.0) < 1e-9, ("p2", b2, s)
    for (b1, b2) in c12:
        s = sum(
            max(c3.get((b1, b2, b3), 0) - D, 0.0) / c12[(b1, b2)]
            + D * n_after12[(b1, b2)] / c12[(b1, b2)] * p2(b2, b3)
            for b3 in bw
        )
        assert abs(s - 1.0) < 1e-9, ("p3", (b1, b2), s)
