"""A/B: dedup_minhash_det signature hash — md5-conv (oracle-portable,
the shipped key) vs xxhash64 (the documented production swap). Same
plan shape, only the 16-per-shingle signature expression differs.

Methodology per the repo noise protocol: interleaved A/B/A/B... in ONE
session, >=6 timed runs per arm after one warmup each, compare MEDIANS.
Prints one JSON line; the medians are recorded in BENCH_NOTES.md.

Usage: python tools/ab_minhash_hash.py [runs_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


def _build(spark: SparkSession, sf_dir: str, hash_expr) -> DataFrame:
    """dedup_minhash_det's exact pipeline with a pluggable signature
    hash (see operators/llm_dedup.py:1129 for the shipped md5 key)."""
    from e2e_data_pipeline_spark.operators.llm_dedup import _shingles

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    hashed = (
        sh.select(
            "doc_id",
            "shingle",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("seed"),
        )
        .select("doc_id", "seed", hash_expr.alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )
    bands = hashed.groupBy(
        "doc_id", (F.col("seed") / 2).cast("long").alias("band")
    ).agg(
        F.max(F.when(F.col("seed") % 2 == 0, F.col("sig"))).alias("s0"),
        F.max(F.when(F.col("seed") % 2 == 1, F.col("sig"))).alias("s1"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.s0") == F.col("b.s0"))
            & (F.col("a.s1") == F.col("b.s1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(
        F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b")
    )
    verified = (
        cand.join(sha, "doc_a")
        .join(
            shb,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        verified.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.lit(16) * F.col("n_common")
            >= F.lit(6) * (F.col("na") + F.col("nb"))
        )
        .select("doc_a", "doc_b", "n_common")
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from e2e_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-minhash-hash")
    spark.sparkContext.setLogLevel("ERROR")

    seeded = F.concat(
        F.lit("s"), F.col("seed").cast("string"), F.lit("|"), F.col("shingle")
    )
    arms = {
        "md5": F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long"),
        "xxh": F.xxhash64(seeded),
    }

    def run(expr) -> float:
        t0 = time.time()
        _build(spark, sf_dir, expr).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    for expr in arms.values():  # warmup, untimed
        run(expr)

    times: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(runs):
        for name, expr in arms.items():  # interleaved
            times[name].append(run(expr))

    meds = {k: round(statistics.median(v), 3) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "minhash_signature_hash_ab",
                "sf_dir": sf_dir,
                "runs_per_arm": runs,
                "medians_sec": meds,
                "md5_tax_x": round(meds["md5"] / meds["xxh"], 3)
                if meds["xxh"]
                else None,
                "all_times": times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
