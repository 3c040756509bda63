"""Trained-classifier curation tier (operators/classify.py): the Spark
ML language-ID pipeline must actually learn a separable corpus (the
shipped synthetic documents table carries no language signal — its
text is identical word soup across lang labels, so accuracy there
would only measure noise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.classify import (
    predict_lang,
    train_langid_model,
)

# tiny separable vocabulary per language
_VOCAB = {
    "en": ["the", "and", "house", "water", "light"],
    "de": ["und", "das", "haus", "wasser", "licht"],
    "fr": ["le", "et", "maison", "eau", "lumiere"],
}


def _corpus(spark, n_per_lang=60, n_tokens=30):
    rows = []
    i = 0
    for lang, vocab in _VOCAB.items():
        for d in range(n_per_lang):
            toks = [vocab[(d * 7 + j * 3 + i) % len(vocab)] for j in range(n_tokens)]
            rows.append((i, " ".join(toks), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_pipeline_learns_separable_corpus(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = train_langid_model(train)
    pred = predict_lang(model, test)
    agg = (
        pred.select((F.col("pred_lang") == F.col("lang")).cast("int").alias("ok"))
        .agg(F.avg("ok").alias("acc"), F.count("*").alias("n"))
        .first()
    )
    assert agg["n"] == test.count()
    assert agg["acc"] >= 0.95  # fully separable vocabularies

    # schema contract: original columns + pred_lang, no ML scratch cols
    assert set(pred.columns) == {"doc_id", "text", "lang", "pred_lang"}


def test_langid_prediction_is_deterministic(spark):
    docs = _corpus(spark, n_per_lang=30)
    m1 = train_langid_model(docs)
    m2 = train_langid_model(docs)
    p1 = {r.doc_id: r.pred_lang for r in predict_lang(m1, docs).collect()}
    p2 = {r.doc_id: r.pred_lang for r in predict_lang(m2, docs).collect()}
    assert p1 == p2
