"""LLM-family benchmark tier (VERDICT r5 item 6): the north-star
training-data-pipeline path that bench.py's relational headline set
does not cover. NOT driver-facing — this tier exists so a perf
regression in dedup / text / similarity / corpus ops becomes a
recorded number instead of an invisible drift; per-round medians live
in BENCH_NOTES.md.

Prints ONE JSON line with the same shape as bench.py:
  {"metric": "llm_queries_total_wall", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}

Methodology mirrors bench.py: noop-sink end-to-end execution, one
untimed warmup pass, then four timed passes keeping the per-query
minimum (scheduler noise is additive; min-of-N estimates engine cost)
plus per-query median / CV and total_median, so the LLM-side series
is noise-separable the same way the relational headline became in r9
(uniform CV + drifting medians = host shift; a single query's min
moving = a real regression).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dedup_minhash_det",
    "dedup_simhash_det",
    "text_bm25_rank",
    "text_lm_score",
    "sim_knn_join",
    "sim_ivf_index_roundtrip",
    "dedup_semantic_det",
    "corpus_e2e_manifest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from e2e_data_pipeline_spark.operators import QUERIES
    from e2e_data_pipeline_spark.session import get_spark

    spark = get_spark("e2e-bench-llm")
    spark.sparkContext.setLogLevel("ERROR")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = [n for n in HEADLINE if n in QUERIES]
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    n_passes = 4
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(n_passes):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.time() - t0)

    timings = {n: round(min(s), 3) for n, s in samples.items()}
    medians = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    cvs = {
        n: round(statistics.pstdev(s) / (statistics.mean(s) or 1.0), 3)
        for n, s in samples.items()
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "llm_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "queries_cv": cvs,
                "passes": n_passes,
                "total_median": round(sum(medians.values()), 3),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
