"""Training-data curation operators: split assignment consumers,
train/eval decontamination, intra-document repetition signals, and
sequence packing.

These extend the engine's LLM-pipeline surface (SURVEY.md §2.11
text_analysis / exact_dedup family) with the curation steps a
pretraining pipeline runs between "corpus" and "token stream":

- **decontamination** — eval/val documents sharing verbatim word
  n-grams with any training document leak supervision; flag them by
  joining the eval shingle set against the distinct train shingle set.
- **repetition signals** — Rae et al. (Gopher, arXiv:2112.11446 §A1.1)
  style quality gates: duplicate n-gram fraction, most-frequent-token
  fraction, type-token ratio.
- **sequence packing** — the concat-and-chunk mapping from documents to
  fixed-length training sequences (deterministic, window-based), plus a
  greedy first-fit-decreasing bin packer for the padding-minimizing
  variant (applyInPandas; inherently sequential within a shard).

Scale notes are per-function; none of these touch a Python row path
except the FFD packer (Arrow-batched, per-shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens, word_shingles

# --- decontamination ----------------------------------------------------------

CONTAM_NGRAM_N = 8


def ngram_decontaminate(
    docs_with_split: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    n: int = CONTAM_NGRAM_N,
) -> DataFrame:
    """Flag non-train documents that share any word ``n``-gram with the
    training split (train/test contamination detection).

    Returns one row per contaminated eval document:
    ``(id, split, n_shared_ngrams, n_ngrams, contamination_rate)``.

    Scale shape: both sides explode their DISTINCT per-doc shingles
    (``word_shingles`` dedups within a document), the train side is
    globally ``distinct()`` (hash aggregate with map-side partials),
    and the single shuffle is the equi-join on the shingle value. At
    100 TB the join key is the bottleneck-sized artifact: pre-hash it
    (``xxhash64``) to an 8-byte key so the exchange never carries gram
    strings — collisions only ever over-count a shared gram
    (~n²/2⁶⁴, acceptable for a contamination GATE; the declared oracle
    query at test scale matches because no collision occurs there).
    """
    sh = docs_with_split.select(
        F.col(id_col),
        F.col(split_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    ).withColumn("gram_key", F.xxhash64("gram"))
    train_grams = (
        sh.filter(F.col(split_col) == "train")
        .select("gram_key")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    eval_grams = sh.filter(F.col(split_col) != "train").drop("gram")
    # LEFT join + match flag: one aggregation yields both the matched
    # count and the per-doc total (shingles are distinct per doc), so
    # the docs table is scanned once per side — no third scan + rejoin
    # for n_ngrams.
    return (
        eval_grams.join(train_grams, "gram_key", "left")
        .groupBy(id_col, split_col)
        .agg(
            F.count("_hit").cast("long").alias("n_shared_ngrams"),
            F.count("*").cast("long").alias("n_ngrams"),
        )
        .filter(F.col("n_shared_ngrams") > 0)
        .select(
            id_col,
            split_col,
            "n_shared_ngrams",
            "n_ngrams",
            F.round(
                (F.col("n_shared_ngrams") / F.col("n_ngrams")).cast("decimal(38,9)"), 4
            )
            .cast("double")
            .alias("contamination_rate"),
        )
    )


# --- repetition / token-distribution signals ----------------------------------


def _bigrams(toks):
    """Non-distinct word bigrams (repetition needs multiplicity).
    zip_with form — a lambda capturing ``toks`` would re-tokenize per
    bigram (functions/text.py::zipped_ngrams documents the trap)."""
    from ..functions.text import zipped_ngrams

    return F.when(
        F.size(toks) >= 2,
        zipped_ngrams(toks, 2, " "),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition/distribution quality signals:

    - ``dup_bigram_frac``: fraction of bigram OCCURRENCES that are
      repeats of an earlier bigram (1 - distinct/total; 0 when < 2
      bigrams) — the Gopher duplicate-n-gram gate.
    - ``top_token_frac``: occurrences of the most frequent token over
      total tokens — degenerate docs ("buy buy buy …") score near 1.
    - ``type_token_ratio``: distinct/total tokens — low TTR means
      boilerplate or looping text.

    Scale shape: the bigram stats are a narrow projection (higher-order
    functions, per-row). Token stats explode to (doc, token) rows and
    run a two-level hash aggregate — both levels get map-side partial
    aggregation, and the final join is doc_id-to-doc_id (co-partitioned
    after the agg shuffle). No Python path, no window over the corpus.
    """
    toks = tokens(F.col(text_col))
    grams = _bigrams(toks)
    gram_stats = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.size(grams).alias("_total_bigrams"),
        F.size(F.array_distinct(grams)).alias("_distinct_bigrams"),
    )
    tok_counts = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").alias("_max_cnt"),
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count("*").alias("_n_distinct"),
        )
    )

    def _r4(c):
        return F.round(c.cast("decimal(38,9)"), 4).cast("double")

    return gram_stats.join(tok_counts, id_col).select(
        id_col,
        "n_tokens",
        _r4(
            F.when(
                F.col("_total_bigrams") > 0,
                (F.col("_total_bigrams") - F.col("_distinct_bigrams"))
                / F.col("_total_bigrams"),
            ).otherwise(F.lit(0.0))
        ).alias("dup_bigram_frac"),
        _r4(F.col("_max_cnt") / F.col("n_tokens")).alias("top_token_frac"),
        _r4(F.col("_n_distinct") / F.col("n_tokens")).alias("type_token_ratio"),
    )


# --- sequence packing ---------------------------------------------------------

SEQ_LEN = 64
PACK_SHARDS = 8
FFD_BIN_CAPACITY = 128


def chunk_pack_assignment(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = SEQ_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate documents in
    deterministic order and split the token stream into fixed
    ``seq_len`` sequences; report each document's sequence span.

    Returns ``(id, shard, n_tokens, first_seq, last_seq)`` where
    ``first_seq``/``last_seq`` are the shard-local sequence indices the
    document's tokens land in (a document spanning a boundary appears
    in both — exactly the crossing the attention-mask machinery must
    handle).

    Scale shape: a single global ORDER BY would serialize the corpus
    through one partition, so packing is SHARDED — ``id % n_shards``
    buckets, each an independent packing stream; the window runs per
    shard (parallelism = n_shards; at scale set n_shards ~ executor
    count). Cumulative sum over a partitioned window is the only
    shuffle.
    """
    from ..functions.text import token_count

    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / seq_len).cast("long").alias("first_seq"),
        F.floor((cum_before + F.col("n_tokens") - 1) / seq_len)
        .cast("long")
        .alias("last_seq"),
    )


_FFD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
    ]
)


def ffd_pack_bins(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = FFD_BIN_CAPACITY,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Greedy first-fit-decreasing bin packing of documents into
    fixed-token-capacity bins (the padding-minimizing alternative to
    concat-and-chunk: no document is split; bins are padded to
    ``capacity``).

    Deterministic: within a shard, docs are processed by
    (n_tokens DESC, id ASC) and placed in the lowest-indexed bin with
    room; docs longer than ``capacity`` get a dedicated overflow bin.
    FFD uses at most (11/9)·OPT + 1 bins (Johnson 1973).

    Scale shape: packing is inherently sequential, so it runs per shard
    inside ``applyInPandas`` (Arrow-batched, one group per shard).
    Shards bound both parallelism and driver-free memory: a shard's
    (id, n_tokens) pairs — 16 bytes/doc — must fit in a worker, which
    at 100 TB means raising ``n_shards``, not rewriting the operator.
    The token counting itself stays JVM-side before the shuffle.
    """
    from ..functions.text import token_count

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_space: list[int] = []  # remaining capacity per bin
        assignment = []
        for n_tok in pdf["n_tokens"]:
            n_tok = int(n_tok)
            placed = None
            if n_tok <= capacity:
                for b, space in enumerate(bin_space):
                    if space >= n_tok:
                        placed = b
                        break
            if placed is None:
                bin_space.append(capacity)
                placed = len(bin_space) - 1
                # oversized doc: dedicated bin, capacity exhausted
                bin_space[placed] = max(capacity - n_tok, 0) if n_tok <= capacity else 0
            else:
                bin_space[placed] -= n_tok
            assignment.append(placed)
        pdf["bin_id"] = pd.Series(assignment, dtype="int64")
        return pdf[["doc_id", "shard", "n_tokens", "bin_id"]]

    return base.groupBy("shard").applyInPandas(_pack, _FFD_SCHEMA)


# --- DSIR-style importance resampling -----------------------------------------

DSIR_BUCKETS = 1024
DSIR_SMOOTH = 1.0


def _hash_bucket(col, buckets: int):
    """Deterministic engine-portable hash bucket: first 8 hex chars of
    md5 as an int, mod ``buckets``. Same construction as the
    content-hash split (plans/textq.py) — md5 exists verbatim in both
    Spark and DuckDB, so the oracle reproduces bucket ids exactly."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets


def dsir_importance(
    docs: DataFrame,
    target_pred,
    buckets: int = DSIR_BUCKETS,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    arXiv:2302.03169): score every document by how much its hashed
    unigram distribution looks like a TARGET slice of the corpus
    relative to the corpus as a whole.

    Per token occurrence t: bucket b(t) in [0, buckets); the bucket's
    importance log-weight is
        lw(b) = ln((tgt_b + a) / (tgt_tot + a*B))
              - ln((raw_b + a) / (raw_tot + a*B))
    (add-a smoothed log likelihood ratio of the target vs the raw
    unigram bucket model), and a document's importance is the sum of
    lw over its token occurrences.

    Scale shape: one explode -> hash-agg to AT MOST ``buckets`` rows
    (map-side partialed; the shuffle carries (bucket, 2 longs), never
    tokens), totals folded in with a window over the tiny bucket
    table, then a BROADCAST join of that <=B-row weight table back to
    the token stream and a second hash-agg per doc_id. Two shuffles
    total (bucket agg, doc agg), both on bounded-width rows. The
    reference has no counterpart; this is pure extension surface.

    ``target_pred`` is a boolean Column over ``docs`` (e.g.
    ``F.col('lang') == 'en'``).
    """
    toks = docs.where(F.trim("text") != "").select(
        "doc_id",
        target_pred.alias("_is_target"),
        F.explode(tokens("text")).alias("tok"),
    )
    tok_buckets = toks.select(
        "doc_id",
        "_is_target",
        _hash_bucket(F.col("tok"), buckets).alias("bucket"),
    )
    counts = tok_buckets.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_target"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("tgt"),
        F.count(F.lit(1)).cast("long").alias("raw"),
    )
    w = Window.partitionBy()  # <=B rows: totals via window, no extra pass
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("tgt") + smooth) / (F.sum("tgt").over(w) + smooth * buckets))
            - F.log((F.col("raw") + smooth) / (F.sum("raw").over(w) + smooth * buckets))
        ).alias("lw"),
    )
    return (
        tok_buckets.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lw").alias("imp_w"), F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )


def dsir_gumbel_topk(docs: DataFrame, imp: DataFrame, k: int) -> DataFrame:
    """DSIR's sampling step, made deterministic: sample k documents
    without replacement from softmax(imp_w) via the Gumbel top-k
    trick (select the k largest imp_w + Gumbel(0,1) keys), with the
    Gumbel noise derived from md5(doc_id) instead of an RNG so any
    engine reproduces the exact same sample — no seed coordination
    across executors, no per-partition RNG state.

    u in (0,1) from the top 8 md5 hex chars; g = -ln(-ln(u)).
    Selection is a global top-k: TakeOrderedAndProject (per-partition
    partial top-k, k rows to the driver), never a full sort.
    """
    u = (
        (_hash_bucket(F.col("doc_id").cast("string"), 2**32) + F.lit(0.5))
        / F.lit(float(2**32))
    )
    keyed = imp.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "imp_w",
        (F.col("imp_w") + (-F.log(-F.log(u)))).alias("gumbel_key"),
    )
    return keyed.orderBy(F.desc("gumbel_key"), "doc_id").limit(k)
