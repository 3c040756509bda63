"""Scale smoke: drive the dedup / similarity SCALE paths on a corpus
~N× larger than sf0.1 (default 40× → 200k docs, 20k embeddings),
synthesized by replicating the testdata with deterministic
perturbations (no files written; testdata stays read-only).

This is the "would it survive 100×?" check the small-SF correctness
suite can't give: the LSH candidate pipeline, SimHash bucketing, and
IVF ANN must stay near-linear — if any of them quadratically explodes
or OOMs at 40×, the 100 TB story is fiction. Usage:

    python tools/scale_smoke.py [replication_factor]

Prints one JSON line with per-path wall seconds and output sizes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.io_utils import load
from meshtastic_airsensor_database_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_buckets,
)
from meshtastic_airsensor_database_spark.operators.similarity import ivf_topk
from meshtastic_airsensor_database_spark.session import get_spark


def replicate_docs(docs, factor: int):
    """factor copies per doc; each copy gets a unique id and a replica
    suffix so only intra-replica near-dups exist (keeps the true pair
    count linear in corpus size, like a real crawl)."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    return (
        docs.select("doc_id", "text", reps)
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" replica "), F.col("rep").cast("string")
            ).alias("text"),
        )
    )


def replicate_embeddings(emb, factor: int):
    """factor copies per vector, each shifted by a tiny per-replica
    delta on the first component (distinct points, same distribution)."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    delta = (F.col("rep").cast("double") / F.lit(1e4)).cast("float")
    return (
        emb.select("vec_id", "embedding", reps)
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + delta),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).alias("embedding"),
        )
    )


def timed(spark, label, df, out: dict):
    spark._jvm.System.gc()  # keep one section's GC debt out of the next
    t0 = time.time()
    n = df.count()
    out[label] = {"sec": round(time.time() - t0, 2), "rows": n}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_smoke")

    docs = replicate_docs(load(spark, sf_dir, "documents"), factor)
    emb = replicate_embeddings(load(spark, sf_dir, "embeddings"), factor)
    n_docs, n_emb = docs.count(), emb.count()

    out: dict = {"factor": factor, "n_docs": n_docs, "n_embeddings": n_emb}
    timed(spark, "minhash_lsh_candidates",
          minhash_lsh_candidates(docs, "doc_id", "text"), out)
    timed(spark, "simhash_buckets", simhash_buckets(docs, "doc_id", "text"), out)
    timed(spark, "ivf_topk",
          ivf_topk(emb, query_vec_id=0, k=10, n_centroids=32, n_probe=4), out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
