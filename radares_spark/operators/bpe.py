"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units")
— the tokenizer-training stage of an LLM data pipeline, completing
the counting side that ``text_ext.vocab_top_ngrams`` provides.

The classical algorithm trains on the WORD FREQUENCY TABLE, not the
raw corpus: every distinct word becomes a symbol sequence (its
characters plus an end-of-word marker), and each merge round (a)
counts adjacent symbol pairs weighted by word frequency, (b) merges
the single most frequent pair everywhere it occurs. That structure is
what makes this tractable at 100 TB: ONE corpus-wide shuffle builds
the word table (``word_counts`` — vocabulary-sized, ~10^7-10^8 rows
for web scale, independent of corpus bytes from then on), and every
merge round is a small job over the word table — an explode + one
map-side-combined pair aggregate + a SCALAR argmax collect (the
PageRank/k-means per-round pattern) + a codegen'd fold that rewrites
the symbol arrays.

Greedy left-to-right merge application within a round is an
``F.aggregate`` fold: "a a a" under merge (a,a) becomes (aa, a) —
the new symbol never re-merges in the same round, matching the
reference implementation exactly (pinned against a pure-Python
replica in tests/test_bpe.py, the same verification tier as the
k-means trainer and PageRank — iterative algorithms have no SQL
oracle).

Determinism: ties on pair count break on (left, right) lexicographic
ascending — stable across partitionings and engines.

Scale honesty: each merge is one Spark job over the word table, so a
production 32k-merge vocabulary is 32k sequential small jobs — real
trainers amortize this by sampling the word table or batching
disjoint merges; THIS implementation keeps the exact sequential
semantics (the testable contract) and documents the knob. The word
table is localCheckpoint'd every ``checkpoint_every`` rounds so plan
lineage stays bounded (the PageRank recipe).

``bpe_encode`` tokenizes documents with the trained table the way
fast tokenizers do: the trained word -> symbols mapping is a
dictionary join for in-vocabulary words (no forced broadcast hint —
the table is vocabulary-sized, AQE decides from stats);
out-of-vocabulary words fall back to character symbols — zero Python
on either of those paths — or, when the merge list is passed, get the
trained merges applied (Sennrich apply_bpe semantics) via an
Arrow-batched UDF over the DISTINCT OOV vocabulary only, never the
corpus token stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radares_spark.operators.dedup import normalize_text

EOW = "_"  # end-of-word marker appended to the final character
# normalize_text's alphabet is [a-z0-9 ], so '_' can never collide
# with a real character — the marker stays unambiguous


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the corpus' word frequency table; the ONLY
    corpus-sized computation in BPE training (one map-side-combined
    shuffle on the word key)."""
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    return (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters of ``word`` with EOW appended to the last one:
    'low' -> [l, o, w_]."""
    chars = F.split(word, "")
    last = F.size(chars) - 1
    return F.transform(
        chars,
        lambda c, i: F.when(i == last, F.concat(c, F.lit(EOW))).otherwise(c),
    )


def _merge_fold(l: str, r: str) -> Column:
    """Greedy left-to-right single-round application of merge (l, r)
    to the ``syms`` array, as one codegen'd F.aggregate fold: append
    each symbol, except when the accumulator's last element is l and
    the incoming symbol is r — then replace the last element with
    l+r. A just-created l+r can never chain within the round (it no
    longer equals l), which IS the reference greedy semantics."""
    lit_l, lit_r = F.lit(l), F.lit(r)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(lit_l, lit_r)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    words: DataFrame,
    n_merges: int,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges on a (word, n) frequency table.

    Returns ``(merges, word_syms)``: the ordered merge list (the
    tokenizer artifact — kilobytes) and the trained word table
    (word, n, syms) whose symbol arrays reflect every merge — the
    encode-side dictionary. Stops early when the best remaining pair
    occurs fewer than ``min_freq`` times (weighted).

    Per round: one explode + pair aggregate over the WORD TABLE (never
    the corpus), one 1-row argmax collect, one codegen'd fold
    projection. The argmax orders (count desc, left asc, right asc) —
    deterministic under ties — and is a single ungrouped MIN over
    ``struct(-cnt, l, r)`` (struct comparison is field-by-field, so
    min(-cnt) IS max(cnt) with lexicographic-ascending tie-break): one
    map-side-combined aggregate with NO sort of the pair table, vs the
    previous ``orderBy().limit(1)`` whose per-round full sort
    multiplies 32,000x at a production vocabulary (r6 verdict)."""
    table = words.select("word", "n", _initial_symbols(F.col("word")).alias("syms"))
    table = table.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        best = (
            _pair_counts(table)
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("l"), F.col("r"))
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        if best is None or -best["nc"] < min_freq:
            break
        l, r = best["l"], best["r"]
        merges.append((l, r))
        table = table.select("word", "n", _merge_fold(l, r).alias("syms"))
        if (step + 1) % checkpoint_every == 0:
            table = table.localCheckpoint(eager=True)
    return merges, table.localCheckpoint(eager=True)


def _pair_counts(table: DataFrame) -> DataFrame:
    """(l, r, cnt) — adjacent symbol-pair counts over the word table,
    weighted by word frequency; the per-round aggregate both trainers
    share."""
    return (
        table.select(
            "n",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> struct(x AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("n").alias("cnt"))
    )


def train_bpe_batched(
    words: DataFrame,
    n_merges: int,
    min_freq: int = 2,
    batch_size: int = 16,
    candidate_factor: int = 4,
) -> tuple[list[tuple[str, str]], DataFrame, int]:
    """Production-scale BPE training: up to ``batch_size`` DISJOINT
    merges applied per round, cutting the 32k-merge vocabulary from
    32k sequential Spark jobs to ~32k/batch_size rounds (the knob
    ``train_bpe``'s docstring promises; r6 verdict #2).

    Selection per round, from ONE pair-count aggregate: take the top
    ``batch_size * candidate_factor`` candidates (TakeOrderedAndProject
    — a bounded heap per partition, never a full sort), walk them in
    rank order (cnt desc, l asc, r asc) and keep a pair only when it
    shares NO symbol with any higher-ranked pick — including the
    symbol that pick CREATES (l+r may already exist from an earlier
    round, and a candidate touching it would see occurrences minted
    mid-batch). Disjointness makes the batch order-independent AND
    keeps every applied count exact: merging (a,b) only changes counts
    of pairs touching a, b, or the minted ab, so a disjoint
    lower-ranked pick's count is exactly what a sequential recount
    would have shown.

    What batching changes vs the sequential oracle: a merge CREATES a
    new symbol whose pairs can outrank stale candidates — sequential
    recounts after every merge and may promote them; batched sees them
    only next round. On corpora where that promotion doesn't happen
    (picks don't interact) the two trainers produce IDENTICAL merge
    tables; where it does, batched produces the standard
    fast-trainer approximation (still a valid greedy application of
    its own merge list — pinned against a pure-Python replica of THIS
    selection rule in tests/test_bpe.py, with the sequential trainer
    kept as the exact oracle).

    The word table is pinned per round: a round chains up to
    ``batch_size`` nested fold expressions, so lineage (and codegen
    expression depth) is bounded by one round, the sequential
    trainer's checkpoint_every recipe scaled to the batch.

    Returns ``(merges, word_syms, rounds)`` — rounds is the number of
    pair-aggregate jobs actually run, the measured reduction."""
    table = words.select("word", "n", _initial_symbols(F.col("word")).alias("syms"))
    table = table.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        k = min(batch_size, n_merges - len(merges))
        cands = (
            _pair_counts(table)
            .filter(F.col("cnt") >= min_freq)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(k * candidate_factor)
            .collect()
        )
        used: set[str] = set()
        picked: list[tuple[str, str]] = []
        for row in cands:
            if len(picked) >= k:
                break
            l, r = row["l"], row["r"]
            if l in used or r in used:
                continue
            picked.append((l, r))
            # block the CREATED symbol too: if an earlier-round merge
            # already minted l+r, a lower-ranked candidate touching
            # that symbol would see occurrences this pick creates —
            # its stale count would no longer be exact and the batch
            # would stop being order-independent (review finding)
            used.update((l, r, l + r))
        if not picked:
            break  # no pair reaches min_freq — training converged
        for l, r in picked:
            table = table.select("word", "n", _merge_fold(l, r).alias("syms"))
        merges.extend(picked)
        table = table.localCheckpoint(eager=True)
    return merges, table, rounds


def _apply_merges_udf(merges: list[tuple[str, str]]):
    """Arrow-batched word -> BPE symbol array under a trained merge
    list — the Sennrich ``apply_bpe`` encode semantics: repeatedly
    select the LOWEST-RANK adjacent pair present anywhere in the word
    and merge every occurrence greedy left-to-right, until no trained
    pair remains. The rank table rides the closure (a tokenizer
    artifact — 32k pairs is kilobytes-to-megabytes, not a corpus
    object)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def apply_pair(syms: list[str], l: str, r: str) -> list[str]:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        return out

    @F.pandas_udf("array<string>")
    def enc(words):
        out = []
        for w in words:
            if w is None:
                # null-guarded call sites pass NULL for words that
                # already resolved through the dictionary join, so the
                # in-vocabulary bulk never pays the merge loop
                out.append(None)
                continue
            syms = list(w)
            syms[-1] = syms[-1] + EOW
            while len(syms) > 1:
                best = min(
                    (
                        (ranks[p], i)
                        for i, p in enumerate(zip(syms, syms[1:]))
                        if p in ranks
                    ),
                    default=None,
                )
                if best is None:
                    break
                l, r = merges[best[0]]
                syms = apply_pair(syms, l, r)
            out.append(syms)
        return pd.Series(out)

    # Nondeterministic marking keeps the optimizer from duplicating
    # the merge-application node when the syms column is referenced
    # through filters/union branches (shards_pack carried FOUR
    # ArrowEvalPython copies of it; two after). Values are unchanged
    # (pure function); measured 1.5-1.8x on the encode plans.
    return enc.asNondeterministic()


def bpe_encode(
    docs: DataFrame,
    word_syms: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — tokenize documents
    with a trained word table. In-vocabulary words resolve through a
    dictionary join (the fast-tokenizer word cache; AQE decides
    broadcast vs shuffle from the table's actual size);
    out-of-vocabulary words fall back to character symbols. Token
    order is the document's word order (positional explode + ordered
    regroup).

    The doc SPINE is preserved: a doc whose normalized text is empty
    (NULL / whitespace-only) yields ``(doc_id, [], 0)`` rather than
    vanishing — token-less docs drop out of the word explode, so the
    aggregate rejoins the input's doc_ids left (hashed_tf's
    drop-and-rejoin contract, applied here instead of documented
    away; review finding r6).

    ``merges`` (the ordered merge list ``train_bpe`` returns) turns on
    REAL OOV encoding: an unseen word gets the trained merges applied
    (Sennrich apply_bpe: merge the lowest-rank pair present,
    repeat) instead of degrading to characters — so "lowest" encodes
    as [low, est_] under a table trained before that word existed,
    exactly what a production tokenizer does with fresh data. The
    merge application runs over DISTINCT OOV words only (the word
    cache: anti-join, apply, union back into the dictionary), so the
    Arrow-batched UDF touches the OOV vocabulary, never the corpus
    token stream. Known corner (shared with reference BPE
    implementations): a word whose chronological training segmentation
    skipped an early pair that a later merge re-created can encode
    differently through the min-rank path than the trained table
    recorded — in-vocabulary words always resolve through the trained
    table first, so this affects only OOV words, where no trained
    segmentation exists to disagree with."""
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    toks = docs.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "word")
    ).filter(F.col("word") != "")
    # no broadcast HINT: the trained word table is vocabulary-sized
    # (~10^7-10^8 rows at web scale) — AQE picks broadcast vs shuffle
    # from runtime stats; a forced hint would OOM the driver at scale
    vocab = word_syms.select("word", "syms")
    if merges is not None:
        oov = (
            toks.select("word")
            .distinct()
            .join(vocab.select("word"), "word", "left_anti")
        )
        oov_syms = oov.select(
            "word", _apply_merges_udf(merges)(F.col("word")).alias("syms")
        )
        vocab = vocab.unionByName(oov_syms)
    joined = toks.join(vocab, "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("syms"), _initial_symbols(F.col("word"))).alias("syms"),
    )
    agg = joined.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                lambda s: s.syms,
            )
        ).alias("tokens")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("tokens"), F.expr("cast(array() as array<string>)")
            ).alias("tokens"),
        )
        .select("doc_id", "tokens", F.size("tokens").alias("n_tokens"))
    )


def bpe_vocab(merges: list[tuple[str, str]], words: DataFrame) -> DataFrame:
    """(symbol) — the trained vocabulary: every base character symbol
    present in the word table plus one merged symbol per merge, the
    artifact a tokenizer ships."""
    base = (
        words.select(F.explode(_initial_symbols(F.col("word"))).alias("symbol"))
        .distinct()
    )
    spark = words.sparkSession
    merged = spark.createDataFrame(
        [(l + r,) for l, r in merges], "symbol string"
    ).distinct()
    return base.unionByName(merged).distinct()


def save_tokenizer(
    spark,
    path: str,
    word_syms: DataFrame,
    merges: list[tuple[str, str]],
) -> None:
    """Persist a trained tokenizer (the word -> symbols table plus the
    ORDERED merge list) so nightly jobs load the frozen artifact
    instead of re-training. The merge order IS the tokenizer — it
    drives OOV encoding rank — so it rides an explicit rank column;
    the word table is vocabulary-sized parquet."""
    word_syms.select("word", "syms").write.mode("overwrite").parquet(
        f"{path}/word_syms"
    )
    # repartition(1), never coalesce(1), on local relations (see
    # shards._write_meta: coalesce serializes the Python slices)
    spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)], ["rank", "l", "r"]
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/merges")


def load_tokenizer(spark, path: str) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Inverse of :func:`save_tokenizer` — the merge list re-collects
    in rank order (kilobyte artifact, sanctioned collect)."""
    word_syms = spark.read.parquet(f"{path}/word_syms")
    merges = [
        (r["l"], r["r"])
        for r in spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    ]
    return word_syms, merges
