"""Text function tests (token counting, quality, lang ID, fingerprints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.functions.text import (
    doc_fingerprint_md5,
    doc_fingerprint_rolling,
    lang_id_pred,
    token_count,
    word_shingles,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).collect()[0].v


def test_token_count_edges(spark):
    assert _one(spark, "a b  c", token_count(F.col("t"))) == 3
    assert _one(spark, "", token_count(F.col("t"))) == 0
    assert _one(spark, "   ", token_count(F.col("t"))) == 0
    assert _one(spark, "one", token_count(F.col("t"))) == 1


def test_word_shingles(spark):
    sh = _one(spark, "a b c d", word_shingles(F.col("t"), 3))
    assert sorted(sh) == ["a b c", "b c d"]
    short = _one(spark, "a b", word_shingles(F.col("t"), 3))
    assert short == ["a b"]  # short docs -> whole-text shingle


def test_lang_id_markers(spark):
    assert _one(spark, "the quick fox and dog", lang_id_pred(F.col("t"))) == "en"
    assert _one(spark, "el rapido zorro", lang_id_pred(F.col("t"))) == "es"
    assert _one(spark, "xyzzy qwerty", lang_id_pred(F.col("t"))) == "unk"
    # priority: en markers beat es when both present
    assert _one(spark, "the de la", lang_id_pred(F.col("t"))) == "en"


def test_md5_fingerprint_known_value(spark):
    # md5("hello") — cross-checked constant
    assert (
        _one(spark, "hello", doc_fingerprint_md5(F.col("t")))
        == "5d41402abc4b2a76b9719d911017c592"
    )


def test_rolling_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta", doc_fingerprint_rolling(F.col("t")))
    b = _one(spark, "beta alpha", doc_fingerprint_rolling(F.col("t")))
    assert a != b  # order matters, unlike a set hash


def test_bpe_tokens_pretokenizer_shapes(spark):
    from meshtastic_airsensor_database_spark.functions.text import (
        bpe_token_count,
        bpe_tokens,
    )

    toks = _one(spark, "Don't panic, 42 towels!", bpe_tokens(F.col("t")))
    assert toks == ["don", "'t", " panic", ",", " 42", " towels", "!"]
    # whitespace runs excluded from the count
    assert _one(spark, "Don't panic, 42 towels!", bpe_token_count(F.col("t"))) == 7
    assert _one(spark, "", bpe_token_count(F.col("t"))) == 0
