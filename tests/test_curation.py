"""Training-data curation operators: decontamination, repetition
signals, sequence packing (operators/curation.py, plans/curateq.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.operators.curation import (
    dsir_gumbel_topk,
    dsir_importance,
    chunk_pack_assignment,
    ffd_pack_bins,
    ngram_decontaminate,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


# --- decontamination ----------------------------------------------------------


def test_decontaminate_flags_shared_ngram(spark):
    shared = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (0, f"{shared} tail words here", "train"),
            (1, f"prefix {shared} other stuff", "test"),  # contaminated
            (2, "totally different words with no overlap at all ok", "val"),
        ],
    )
    out = ngram_decontaminate(docs).collect()
    assert len(out) == 1
    row = out[0]
    assert row.doc_id == 1 and row.split == "test"
    assert row.n_shared_ngrams >= 1
    assert 0 < row.contamination_rate <= 1.0


def test_decontaminate_train_never_flagged(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c d e f g h i j", "train"),
            (1, "a b c d e f g h i j", "train"),  # dup inside train: fine
        ],
    )
    assert ngram_decontaminate(docs).count() == 0


def test_decontaminate_clean_eval_absent(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta", "train"),
            (1, "iota kappa lambda mu nu xi omicron pi", "test"),
        ],
    )
    assert ngram_decontaminate(docs).count() == 0


# --- repetition signals -------------------------------------------------------


def test_repetition_signals_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [(0, "x x x x"), (1, "a b c d")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    deg = rows[0]
    # 3 bigrams, 1 distinct -> 2/3 duplicated
    assert math.isclose(deg.dup_bigram_frac, round(2 / 3, 4))
    assert deg.top_token_frac == 1.0
    assert deg.type_token_ratio == 0.25
    clean = rows[1]
    assert clean.dup_bigram_frac == 0.0
    assert clean.top_token_frac == 0.25
    assert clean.type_token_ratio == 1.0


def test_repetition_signals_single_token_doc(spark):
    docs = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    row = repetition_signals(docs).collect()[0]
    assert row.n_tokens == 1
    assert row.dup_bigram_frac == 0.0  # no bigrams -> defined as 0
    assert row.top_token_frac == 1.0


# --- chunk packing ------------------------------------------------------------


def test_chunk_pack_spans_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i))) for i in range(16)],
        "doc_id long, text string",
    )
    out = chunk_pack_assignment(docs, seq_len=16, n_shards=2)
    rows = sorted(out.collect(), key=lambda r: (r.shard, r.doc_id))
    for shard in (0, 1):
        cum = 0
        for r in (x for x in rows if x.shard == shard):
            assert r.first_seq == cum // 16
            assert r.last_seq == (cum + r.n_tokens - 1) // 16
            assert r.first_seq <= r.last_seq
            cum += r.n_tokens


def test_chunk_pack_empty_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "   ")], "doc_id long, text string"
    )
    out = chunk_pack_assignment(docs)
    assert [r.doc_id for r in out.collect()] == [0]


# --- FFD bin packing ----------------------------------------------------------


def test_ffd_invariants(spark, sf_dir):
    from meshtastic_airsensor_database_spark.io_utils import load

    docs = load(spark, sf_dir, "documents")
    cap = 128
    out = ffd_pack_bins(docs, capacity=cap).collect()
    n_docs = docs.filter(F.trim("text") != "").count()
    # every non-empty doc assigned exactly once
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs
    # bin capacity respected except dedicated oversized-doc bins
    from collections import defaultdict

    bins = defaultdict(list)
    for r in out:
        bins[(r.shard, r.bin_id)].append(r.n_tokens)
    total = 0
    for toks in bins.values():
        total += sum(toks)
        assert sum(toks) <= cap or len(toks) == 1
    # packing quality: no worse than one bin per doc, at least the
    # volume lower bound overall
    n_bins = len(bins)
    assert n_bins <= n_docs
    assert n_bins >= math.ceil(total / cap)


def test_ffd_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + (i * 7) % 40))) for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, ffd_pack_bins(docs, capacity=64).collect()))
    b = sorted(map(tuple, ffd_pack_bins(docs, capacity=64).collect()))
    assert a == b


def test_ffd_oversized_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 100)), (8, " ".join(["v"] * 10))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ffd_pack_bins(docs, capacity=32).collect()}
    # both docs are shard 0; the oversized one must sit alone
    assert out[0].bin_id != out[8].bin_id


def test_lang_quota_sample_dupes_share_fate_and_rates(spark, sf_dir):
    """Content-hash quota: exact duplicate texts always share a keep
    decision, and per-language keep rates track the declared quotas."""
    from pyspark.sql import functions as F

    from meshtastic_airsensor_database_spark.io_utils import load
    from meshtastic_airsensor_database_spark.plans.curateq import (
        QUOTA_DEFAULT_PCT,
        QUOTA_PCT,
        lang_quota_sample,
    )

    decisions = lang_quota_sample(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    joined = decisions.join(docs, "doc_id")
    # duplicates share fate: one distinct keep decision per distinct text
    per_text = joined.groupBy("text").agg(
        F.countDistinct("kept").alias("n_decisions")
    )
    assert per_text.filter(F.col("n_decisions") > 1).count() == 0

    rates = {
        row["lang"]: row["rate"]
        for row in decisions.groupBy("lang")
        .agg(F.avg(F.col("kept").cast("double")).alias("rate"))
        .collect()
    }
    for lang, rate in rates.items():
        want = QUOTA_PCT.get(lang, QUOTA_DEFAULT_PCT) / 100.0
        assert abs(rate - want) < 0.25, (lang, rate, want)


def test_curation_funnel_is_monotone_and_ordered(spark, sf_dir):
    """Each funnel stage can only shrink the survivor set, and stages
    arrive in pipeline order."""
    from meshtastic_airsensor_database_spark.plans.curateq import curation_funnel

    rows = sorted(curation_funnel(spark, sf_dir).collect(),
                  key=lambda r: r["stage_idx"])
    assert [r["stage"] for r in rows] == [
        "all", "lang_quota", "quality", "exact_dedup", "train_split",
        "decontaminated",
    ]
    counts = [r["n_docs"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[0] > counts[-1] > 0


def test_dsir_importance_prefers_target_like_docs(spark):
    # Target slice speaks "alpha beta"; off-target speaks "gamma delta".
    # A fresh doc in the target's vocabulary must outscore one in the
    # off-target vocabulary (hashed-unigram likelihood ratio).
    rows = [
        (0, "alpha beta alpha beta", "en"),
        (1, "alpha beta beta alpha", "en"),
        (2, "gamma delta gamma delta", "de"),
        (3, "gamma delta delta gamma", "de"),
        (10, "alpha beta", "zz"),   # target-like, unlabeled
        (11, "gamma delta", "zz"),  # off-target-like, unlabeled
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    imp = {
        r["doc_id"]: r["imp_w"]
        for r in dsir_importance(docs, F.col("lang") == "en").collect()
    }
    assert imp[10] > imp[11]
    # weights are per-token sums: doc 0 (4 target tokens) doubles doc 10
    assert math.isclose(imp[0], 2 * imp[10], rel_tol=1e-9)


def test_dsir_gumbel_topk_deterministic_and_bounded(spark):
    rows = [(i, "alpha beta gamma", "en") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    imp = dsir_importance(docs, F.col("lang") == "en")
    a = [r["doc_id"] for r in dsir_gumbel_topk(docs, imp, 5).collect()]
    b = [r["doc_id"] for r in dsir_gumbel_topk(docs, imp, 5).collect()]
    assert a == b and len(a) == 5
    # identical imp_w everywhere -> selection is ranked purely by the
    # md5-derived Gumbel noise, which is a fixed function of doc_id
    assert len(set(a)) == 5


def test_split_leakage_report_consistent_with_splits(spark, sf_dir):
    """Every reported pair count must be reproducible by classifying
    the verified near-dup pairs with the split assignment directly;
    cross-split rows (and only those) carry crosses_split=True."""
    from meshtastic_airsensor_database_spark.io_utils import load
    from meshtastic_airsensor_database_spark.operators.dedup import (
        minhash_lsh_neardup_pairs,
    )
    from meshtastic_airsensor_database_spark.plans import REGISTRY
    from meshtastic_airsensor_database_spark.plans.curateq import _with_split
    from meshtastic_airsensor_database_spark.plans.textq import (
        NEARDUP_SAMPLE_MAX_ID,
    )

    rows = REGISTRY["split_leakage_report"].builder(spark, sf_dir).collect()
    got = {(r["split_lo"], r["split_hi"]): r["n_pairs"] for r in rows}
    assert all(
        r["crosses_split"] == (r["split_lo"] != r["split_hi"]) for r in rows
    )
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < NEARDUP_SAMPLE_MAX_ID
    )
    split = {
        r["doc_id"]: r["split"] for r in _with_split(docs).collect()
    }
    expected: dict = {}
    for p in minhash_lsh_neardup_pairs(docs, "doc_id", "text", 0.8).collect():
        key = tuple(sorted((split[p["id_a"]], split[p["id_b"]])))
        expected[key] = expected.get(key, 0) + 1
    assert got == expected


def test_weighted_quality_sample_matches_brute_force(spark, sf_dir):
    """The derandomized A-ES top-K must equal a direct Python
    recomputation of key = ln(md5-uniform)/n_chars over every doc, and
    heavier docs must be overrepresented relative to a uniform draw
    (the sample's mean weight exceeds the corpus mean)."""
    import hashlib
    import math

    from meshtastic_airsensor_database_spark.io_utils import load
    from meshtastic_airsensor_database_spark.plans import REGISTRY
    from meshtastic_airsensor_database_spark.plans.curateq import (
        _WQS_DENOM,
        WQS_K,
    )

    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }

    def key(doc_id: int) -> float:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return math.log((float(h) + 1.0) / _WQS_DENOM) / float(docs[doc_id])

    expected = sorted(docs, key=lambda d: (-round(key(d), 6), d))[:WQS_K]
    rows = REGISTRY["weighted_quality_sample"].builder(spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows] == expected
    mean_sample = sum(docs[d] for d in expected) / WQS_K
    mean_corpus = sum(docs.values()) / len(docs)
    assert mean_sample > mean_corpus
