"""Differential tests for the BPE trainer/tokenizer and SemDeDup.

The BPE trainer's delimited-string merge apply is checked against an
independent list-based Python reference implementation of greedy BPE
(Sennrich et al. 2016) on the same word-frequency table; SemDeDup's
windowed election is checked against its own invariants (window drops
are a subset of the full pairwise drops; the first member of every
duplicate pair always survives).
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------- reference
def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Independent list-based greedy BPE: segmentations as piece
    lists, merges applied left-to-right non-overlapping."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, pieces in segs.items():
            for a, b in zip(pieces, pieces[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append((r, best_pair[0], best_pair[1], top))
        for w, pieces in segs.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == best_pair[0]
                    and pieces[i + 1] == best_pair[1]
                ):
                    out.append(pieces[i] + pieces[i + 1])
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_bpe_merges_match_reference(spark, sf_dir):
    from grapho_spark.queries.text import BPE_ROUNDS, BPE_WORD_RE, _bpe_train

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc_rows = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(BPE_WORD_RE), F.lit(0))
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .collect()
    )
    word_counts = {r["w"]: r["count"] for r in wc_rows}
    ref_merges, ref_segs = _ref_bpe(word_counts, BPE_ROUNDS)

    merges, vocab = _bpe_train(spark, sf_dir)
    got = [
        (r["merge_round"], r["left_piece"], r["right_piece"], r["pair_count"])
        for r in merges.orderBy("merge_round").collect()
    ]
    assert got == ref_merges

    got_pieces = {r["w"]: r["n_pieces"] for r in vocab.collect()}
    assert got_pieces == {w: len(p) for w, p in ref_segs.items()}


def test_bpe_tokenize_totals(spark, sf_dir):
    """Doc-level token counts: sum(pieces) over the doc's words, and
    tokens-per-word bounded by [1, word length]."""
    from grapho_spark.queries.text import text_bpe_tokenize

    out = text_bpe_tokenize(spark, sf_dir)
    bad = out.filter(
        (F.col("n_bpe_tokens") < F.col("n_words"))
        | (F.col("n_bpe_tokens") > F.col("n_letters"))
    ).count()
    assert bad == 0


def test_semdedup_window_subset_of_full(spark, sf_dir):
    """The windowed drop-set must be a subset of the full per-cell
    pairwise drop-set, and the lowest-ranked member of each cell
    never drops (it has no predecessors)."""
    from grapho_spark.queries.embeddings import (
        SEMDEDUP_TAU,
        _kmeans_pair,
        _spark_cosine,
        embedding_semantic_dedup,
    )

    assign, _ = _kmeans_pair(spark, sf_dir, 4, 1)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    mem = assign.join(e, "vec_id")
    a = mem.select(
        F.col("cid").alias("ca"), F.col("vec_id").alias("vi"), F.col("ev").alias("av")
    )
    b = mem.select(
        F.col("cid").alias("cb"), F.col("vec_id").alias("vj"), F.col("ev").alias("bv")
    )
    full_pairs = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("vi") != F.col("vj")))
    full_dropped_ids = {
        r["vi"]
        for r in full_pairs.select(
            "ca", "vi", "vj", _spark_cosine("av", "bv").alias("c")
        )
        .filter(F.col("c") >= SEMDEDUP_TAU)
        .select("vi")
        .distinct()
        .collect()
    }

    out = embedding_semantic_dedup(spark, sf_dir).collect()
    n_dropped = sum(r["n_dropped"] for r in out)
    # every windowed drop has a full-pairwise near-dup partner, so the
    # windowed count cannot exceed the count of vectors with any
    # same-cell partner at the threshold
    assert 0 < n_dropped <= len(full_dropped_ids)
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"]
        assert r["n_kept"] >= 1  # rank-1 member always survives


def test_fertility_bounds(spark, sf_dir):
    """Fertility per language is within [1, max word length] and the
    language rollup totals match the doc-level tokenize totals."""
    from grapho_spark.queries.text import (
        text_bpe_fertility_by_lang,
        text_bpe_tokenize,
    )

    by_lang = text_bpe_fertility_by_lang(spark, sf_dir).collect()
    assert by_lang, "no languages"
    for r in by_lang:
        assert 1.0 <= r["fertility"] <= 64.0
        assert r["n_bpe_tokens"] >= r["n_words"]
    by_doc = text_bpe_tokenize(spark, sf_dir).agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    assert sum(r["n_words"] for r in by_lang) == by_doc["w"]
    assert sum(r["n_bpe_tokens"] for r in by_lang) == by_doc["t"]


def test_semdedup_coverage_curve_monotone(spark, sf_dir):
    """Bigger windows can only catch MORE of the full drop-set, and
    every step is bounded by the full pairwise count."""
    from grapho_spark.queries.embeddings import embedding_semdedup_coverage

    rows = sorted(
        embedding_semdedup_coverage(spark, sf_dir).collect(),
        key=lambda r: r["window_size"],
    )
    assert [r["window_size"] for r in rows] == [32, 64, 128]
    prev = 0
    for r in rows:
        assert prev <= r["n_window_dropped"] <= r["n_full_dropped"]
        prev = r["n_window_dropped"]


def test_semantic_leakage_consistent_with_splits(spark, sf_dir):
    """Leakage rows cover exactly the non-train splits and counts are
    bounded by the split sizes from the text-side split query."""
    from grapho_spark.queries.embeddings import corpus_semantic_leakage

    leak = {r["split"]: r for r in corpus_semantic_leakage(spark, sf_dir).collect()}
    assert set(leak) == {"val", "test"}
    for r in leak.values():
        assert 0 <= r["n_leaked"] <= r["n_docs"]
        assert abs(r["leak_rate"] - r["n_leaked"] / r["n_docs"]) < 1e-6
    # the holdout sizes equal the md5-hash split assignment computed
    # directly over the vector ids (the same protocol the text-side
    # corpus_train_val_test_split uses on its quality-gated subset)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    direct = {
        r["split"]: r["n"]
        for r in e.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s in ("val", "test"):
        assert leak[s]["n_docs"] == direct[s]


def test_bpe_exhaustion_is_noop(spark, tmp_path):
    """A corpus whose words are all single letters produces NO merge
    pairs in round 1: every round must then be a no-op (zero-count
    sentinel winner), yielding an EMPTY merge table and an intact
    single-piece vocab — regression for the empty-winner crossJoin
    that silently emptied the whole vocab (r8 self-review)."""
    import pandas as pd

    from grapho_spark.queries.text import _bpe_train

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [5, 5],
            "text": ["a b c", "b c d"],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    merges, vocab = _bpe_train(spark, str(tmp_path))
    assert merges.count() == 0
    got = {r["w"]: r["n_pieces"] for r in vocab.collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 1}
