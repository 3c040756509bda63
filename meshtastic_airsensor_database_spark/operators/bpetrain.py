"""Iterative BPE tokenizer training (Sennrich et al., ACL'16) as a
driver-orchestrated Spark loop.

``plans/textq.py::bpe_merge_candidates`` computes ONE round (the
corpus-wide pair frequencies). This module runs the actual training
loop: repeatedly take the most frequent adjacent symbol pair, merge it
everywhere, recount. The result — the ordered merge list — IS a BPE
tokenizer's vocabulary file.

Scale shape (the reason BPE training is feasible on a 100-TB corpus):
- the corpus collapses to its WORD VOCABULARY first (one hash agg;
  10^5-10^6 rows regardless of corpus size) and the loop never touches
  the corpus again — every round is O(vocab), not O(corpus);
- pair counting per round is an explode + hash agg with map-side
  partials; the argmax is a deterministic ``orderBy().limit(1)``
  (TakeOrderedAndProject — a 1-row driver collect per round, the same
  bounded round-trip pattern as connected_components' checksum);
- the merge application is a pure Catalyst ``aggregate`` lambda over
  each word's symbol array (greedy left-to-right non-overlapping, the
  reference semantics) — no Python, no shuffle;
- per-round ``materialize`` (io_utils) truncates lineage, otherwise
  the plan doubles every round.

Reference parity: none (the reference has no tokenizer); this extends
the mandated text-analysis surface. The exactness contract is pytest:
the distributed loop reproduces a serial pure-Python BPE trainer
merge-for-merge (tests/test_bpetrain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io_utils import materialize


def init_word_vocab(
    docs: DataFrame, text_col: str = "text", min_word_len: int = 2
) -> DataFrame:
    """Corpus -> (syms: array<string> of characters, wc: long)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.filter(F.trim(text_col) != "")
        .select(F.explode(toks).alias("w"))
        .filter(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(F.split("w", "").alias("syms"), "wc")
    )


def count_pairs(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol pair frequencies weighted by word count."""
    # fully-merged words (one symbol) have no pairs; without the guard
    # sequence(1, 0) is a DESCENDING [1, 0] in Spark and syms[1] throws
    pairs = vocab.filter(F.size("syms") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
        "wc",
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("wc").cast("long").alias("n"))


def apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every adjacent (left, right) occurrence, greedy
    left-to-right non-overlapping: fold over the symbol array, merging
    with the accumulator's tail when it matches. The fold IS the
    left-to-right scan, so overlap resolution matches the serial
    algorithm exactly (e.g. merging ('a','a') turns 'aaaa' into
    ['aa','aa'], and 'aaa' into ['aa','a'])."""
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select(merged.alias("syms"), "wc")


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE rounds; returns [(rank, left, right, n)].

    Ties break deterministically on (count desc, left, right). Stops
    early when the best pair drops below ``min_pair_count`` (merging
    singletons only memorizes the corpus).
    """
    # eager=False: each round's argmax collect is the action that both
    # materializes the (lineage-truncated) vocab checkpoint and counts
    # the pairs — one job per round instead of two (the eager variant
    # ran a checkpoint job AND a collect job per round; values are
    # identical either way).
    vocab = materialize(init_word_vocab(docs, text_col), eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            count_pairs(vocab)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((rank, a, b, int(n)))
        vocab = materialize(apply_merge(vocab, a, b), eager=False)
    return merges


def encode_words(
    vocab: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a learned merge list (rank order) to every word — the
    ENCODE side of the tokenizer: chained Catalyst folds, one per
    merge, all narrow (no shuffle; the whole encode is a single
    projection over the vocabulary or corpus)."""
    out = vocab
    for _, left, right, _ in merges:
        out = apply_merge(out, left, right)
    return out


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Train on the corpus, then encode its word vocabulary with the
    learned merges and report the compression the tokenizer achieves:
    corpus-weighted symbols per word before (== chars) and after.

    Scale shape: training is O(vocab)/round (train_bpe_merges); the
    encode is ``n_merges`` chained narrow folds over the vocabulary;
    the report is one tiny agg. At serving time the same encode
    expression runs over the full corpus as a pure projection.
    """
    vocab = materialize(init_word_vocab(docs, text_col))
    merges = train_bpe_merges(docs, text_col, n_merges)
    encoded = encode_words(vocab, merges)
    return encoded.agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("wc").cast("long").alias("n_occurrences"),
        F.sum(F.aggregate("syms", F.lit(0), lambda a, x: a + F.length(x)) * F.col("wc"))
        .cast("long")
        .alias("chars_weighted"),
        F.sum(F.size("syms") * F.col("wc")).cast("long").alias("symbols_weighted"),
    ).select(
        "n_words",
        "n_occurrences",
        "chars_weighted",
        "symbols_weighted",
        F.round(
            (F.col("symbols_weighted") / F.col("chars_weighted")).cast(
                "decimal(38,9)"
            ),
            4,
        )
        .cast("double")
        .alias("compression_ratio"),
    )


def bpe_merges_df(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """The learned merge table as a DataFrame (declared-query shape)."""
    spark = docs.sparkSession
    merges = train_bpe_merges(docs, text_col, n_merges)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, n long"
    )
