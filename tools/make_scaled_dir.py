"""Synthesize a ~sf1 testdata directory by replicating sf0.1 10x with
consistent key remaps, for the 8-vs-32-core scaling evidence the r11
verdict asked for (sf0.1 is per-job fixed-cost-bound: 8 vs 32 cores
moved the suite total 3% while the cpu probe moved 2x, so sf0.1 cannot
demonstrate the scale shape). Writes to the given output dir (never
touches /root/testdata, which is read-only by contract).

Replication discipline (tools/scale_smoke.py's vetted designs):

- documents: text RE-SYNTHESIZED per copy (50 tokens hashed from
  (doc_id, pos) over a 50k vocabulary) — suffix-perturbed copies would
  make all copies mutual near-dups (quadratic LSH pairs); resynthesis
  keeps the LSH workload LINEAR in the factor. lang/source/n_chars
  carry from the base row (n_chars recomputed for the new text).
- embeddings: ids INTERLEAVE (rep * base_count + vec_id) with a tiny
  per-rep first-component delta — block re-iding would make the
  first-N-ids centroid stand-ins degenerate (scale_smoke's measured
  failure).
- events: user_id/event_id remap (*factor + rep), ts SHIFTED by
  rep * 64 days — without the shift every clock-hour bucket grows
  factor x and the co-presence pair fan-out grows factor^2 (and trips
  the MAX_BUCKET cap); shifted, buckets keep their size and the
  workload scales linearly.
- orders/lineitem/customer/supplier/part: all keys remapped
  consistently (*factor + rep) so FK joins keep their fan-out.
- region/nation: tiny dims, kept as-is (dims do not scale with data).

    python tools/make_scaled_dir.py OUT_DIR [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshtastic_airsensor_database_spark.io_utils import load
from meshtastic_airsensor_database_spark.session import get_spark

TOKENS_PER_DOC = 50
VOCAB = 50_000
BASE = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("make_scaled_dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")

    def write(df, name):
        df.hint("rebalance").write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"wrote {name}")

    for name in ("region", "nation"):
        write(load(spark, BASE, name), name)

    cust = load(spark, BASE, "customer").select("*", reps)
    write(
        cust.select(
            (F.col("c_custkey") * factor + F.col("rep")).alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit("#"), F.col("rep")).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer",
    )
    supp = load(spark, BASE, "supplier").select("*", reps)
    write(
        supp.select(
            (F.col("s_suppkey") * factor + F.col("rep")).alias("s_suppkey"),
            *[c for c in load(spark, BASE, "supplier").columns if c != "s_suppkey"],
        ),
        "supplier",
    )
    part = load(spark, BASE, "part").select("*", reps)
    write(
        part.select(
            (F.col("p_partkey") * factor + F.col("rep")).alias("p_partkey"),
            *[c for c in load(spark, BASE, "part").columns if c != "p_partkey"],
        ),
        "part",
    )
    orders = load(spark, BASE, "orders").select("*", reps)
    write(
        orders.select(
            (F.col("o_orderkey") * factor + F.col("rep")).alias("o_orderkey"),
            (F.col("o_custkey") * factor + F.col("rep")).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
    )
    li = load(spark, BASE, "lineitem").select("*", reps)
    write(
        li.select(
            (F.col("l_orderkey") * factor + F.col("rep")).alias("l_orderkey"),
            (F.col("l_partkey") * factor + F.col("rep")).alias("l_partkey"),
            (F.col("l_suppkey") * factor + F.col("rep")).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )
    ev = load(spark, BASE, "events").select("*", reps)
    write(
        ev.select(
            (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
            (F.col("ts") + F.make_interval(days=F.col("rep") * 64)).alias("ts"),
            (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )
    docs = load(spark, BASE, "documents").select("*", reps)
    new_did = F.col("doc_id") * factor + F.col("rep")
    new_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
            lambda i: F.concat(
                F.lit("t"),
                F.pmod(F.xxhash64(new_did, i), F.lit(VOCAB)).cast("string"),
            ),
        ),
    )
    write(
        docs.select(
            new_did.alias("doc_id"),
            new_text.alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("int")),
        "documents",
    )
    emb = load(spark, BASE, "embeddings")
    base_count = emb.count()
    emb = emb.select("*", reps)
    delta = (F.col("rep").cast("double") / F.lit(1e4)).cast("float")
    write(
        emb.select(
            (F.col("rep") * base_count + F.col("vec_id")).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + delta),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )
    print("done", out, "factor", factor)


if __name__ == "__main__":
    main()
