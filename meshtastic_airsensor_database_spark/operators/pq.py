"""Product-quantization ANN (SURVEY.md §2.11 similarity_search_topk —
the memory-compression scale path).

PQ (Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): split each D-dim vector into M subvectors, learn
a K-centroid codebook per subspace, store each vector as M small codes
(M bytes at K<=256) instead of D floats. A query is answered with
ADC (asymmetric distance computation): one M x K table of exact
query-to-centroid distances, then each stored vector's approximate
distance is M table lookups — no float vector is ever read at query
time.

Why this matters at 100 TB: the scan that answers a query reads the
CODES column (M bytes/vector — 32x smaller than float32 at D=64, M=8)
plus a broadcast M x K table; the float embeddings stay cold. Spark
mapping:

- codebooks: M Spark ML KMeans fits on a bounded SAMPLE of the corpus
  (codebook training is statistics, not per-row work — sample size is
  constant in corpus size);
- encoding: one narrow Arrow pass, (B, d') @ (d', K) BLAS per subspace
  — no shuffle, codes land next to the rows they describe;
- query: the M x K ADC table is computed on the driver (tiny), shipped
  in the UDF closure, scores are one narrow Arrow pass over codes +
  TakeOrderedAndProject — zero shuffles end to end;
- optional exact re-rank of the ADC top candidates (standard IVFADC
  practice) restores exactness of the final ordering while touching
  only k' << n float vectors.

Vectors are unit-normalized before training/encoding, so squared L2 ==
2 - 2*cosine and ADC ranking approximates cosine ranking (the corpus
convention everywhere else in this package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..io_utils import fan_out

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace
PQ_TRAIN_SAMPLE = 4096  # codebook training sample cap (constant in n)


def _np():
    import numpy as np

    return np


def train_pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = PQ_TRAIN_SAMPLE,
):
    """Train M per-subspace codebooks -> ndarray (m, k, d//m).

    Training runs driver-side on a deterministic bounded sample (lowest
    ids first — stable across runs/cluster sizes, unlike RNG sampling):
    k-means over a few thousand subvectors is milliseconds of numpy,
    and the sample bound makes the driver work O(1) in corpus size.
    Lloyd iterations with fixed seed; empty clusters re-seeded from the
    farthest points (standard k-means guard).
    """
    np = _np()
    rows = (
        emb.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(sample_cap)
        .collect()
    )
    x = np.stack([np.asarray(r["v"]) for r in rows])
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub))
    for mi in range(m):
        xs = x[:, mi * sub : (mi + 1) * sub]
        # init: k distinct sample rows (deterministic shuffle)
        idx = rng.permutation(len(xs))[:k]
        cents = xs[idx].copy()
        for _ in range(25):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    cents[ci] = xs[mask].mean(axis=0)
                else:  # empty cluster: grab the farthest point
                    cents[ci] = xs[d2.min(axis=1).argmax()]
        books[mi] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length M) — one narrow Arrow pass."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    np = _np()
    books = np.asarray(codebooks)
    m, k, sub = books.shape

    @pandas_udf("array<int>")
    def _encode(v):
        x = np.stack([np.asarray(e, dtype=np.float64) for e in v])
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
        codes = np.empty((len(x), m), dtype=np.int32)
        for mi in range(m):
            xs = x[:, mi * sub : (mi + 1) * sub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
            d2 = (
                -2.0 * (xs @ books[mi].T)
                + (books[mi] ** 2).sum(axis=1)[None, :]
            )
            codes[:, mi] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return fan_out(emb).select(F.col(id_col), _encode(F.col(vec_col)).alias("codes"))


def pq_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = PQ_M,
    codebook_size: int = PQ_K,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: approximate by code lookups, then exact cosine
    re-rank of the top ``rerank_factor * k`` ADC candidates (touches
    only that many float vectors). Returns (vec_id, adc_dist2, cosine)
    ordered by exact cosine desc."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    np = _np()
    books = train_pq_codebooks(emb, m, codebook_size, vec_col)
    sub = books.shape[2]

    qrow = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    if not qrow:
        raise KeyError(f"query vector {query_vec_id} not found")
    q = np.asarray(qrow[0]["v"])
    qn = np.linalg.norm(q)
    q = q / qn if qn > 0 else q
    # ADC table: exact squared L2 from the query subvector to every centroid
    table = np.stack(
        [
            ((q[mi * sub : (mi + 1) * sub][None, :] - books[mi]) ** 2).sum(axis=1)
            for mi in range(m)
        ]
    )  # (m, K)

    @pandas_udf("double")
    def _adc(codes):
        c = np.stack([np.asarray(x, dtype=np.int64) for x in codes])
        return pd.Series(table[np.arange(m)[None, :], c].sum(axis=1))

    encoded = pq_encode(emb, books, id_col, vec_col)
    cands = (
        encoded.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), F.round(_adc(F.col("codes")), 6).alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), F.col(id_col))
        .limit(rerank_factor * k)
    )
    qdf = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv")
    )
    return (
        cands.join(emb.select(id_col, vec_col), id_col)
        .crossJoin(F.broadcast(qdf))
        .select(
            id_col,
            "adc_dist2",
            F.round(cosine_similarity(F.col(vec_col), F.col("_qv")), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
