"""operators/bpetrain.py — the distributed BPE loop must reproduce a
serial pure-Python reference trainer merge-for-merge (same pairs, same
counts, same order), including greedy left-to-right overlap handling.
"""

from __future__ import annotations

from collections import Counter

from meshtastic_airsensor_database_spark.operators.bpetrain import (
    apply_merge,
    bpe_merges_df,
    init_word_vocab,
    train_bpe_merges,
)

CORPUS = [
    "the theme of the thesis",
    "then the theory was there",
    "aaaa aaa banana bandana",
    "low lower lowest slow slower",
]


def serial_bpe(words: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        # count desc, then lexicographic (a, b) — the engine's tie-break
        (a, b), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _word_counts() -> dict[str, int]:
    counts: Counter = Counter()
    for line in CORPUS:
        for w in line.lower().split():
            if len(w) >= 2:
                counts[w] += 1
    return dict(counts)


def test_distributed_bpe_matches_serial_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe_merges(docs, "text", n_merges=10)
    want = serial_bpe(_word_counts(), 10)
    assert got == want
    assert len(got) >= 5  # the corpus supports a non-trivial merge run


def test_apply_merge_overlap_is_left_to_right(spark):
    vocab = spark.createDataFrame(
        [(["a", "a", "a", "a"], 1), (["a", "a", "a"], 1)],
        "syms array<string>, wc long",
    )
    out = {
        tuple(r["syms"])
        for r in apply_merge(vocab, "a", "a").collect()
    }
    assert out == {("aa", "aa"), ("aa", "a")}


def test_bpe_merges_df_shape(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    df = bpe_merges_df(docs, n_merges=3)
    rows = df.collect()
    assert df.columns == ["rank", "left", "right", "n"]
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_init_vocab_splits_to_chars(spark):
    docs = spark.createDataFrame([("ab ab cd",)], "text string")
    rows = {
        tuple(r["syms"]): r["wc"]
        for r in init_word_vocab(docs).collect()
    }
    assert rows == {("a", "b"): 2, ("c", "d"): 1}


def test_encode_matches_serial_merge_application(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    from meshtastic_airsensor_database_spark.operators.bpetrain import (
        encode_words,
    )

    merges = train_bpe_merges(docs, "text", n_merges=6)
    vocab = init_word_vocab(docs)
    got = {
        "".join(r["syms"]): tuple(r["syms"])
        for r in encode_words(vocab, merges).collect()
    }

    def serial_encode(word):
        syms = list(word)
        for _, a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return tuple(syms)

    for w in _word_counts():
        assert got[w] == serial_encode(w), w


def test_encode_stats_compression_below_one(spark):
    from meshtastic_airsensor_database_spark.operators.bpetrain import (
        bpe_encode_stats,
    )

    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    row = bpe_encode_stats(docs, n_merges=6).collect()[0]
    assert row["symbols_weighted"] < row["chars_weighted"]
    assert 0.0 < row["compression_ratio"] < 1.0
    assert row["n_occurrences"] >= row["n_words"]
