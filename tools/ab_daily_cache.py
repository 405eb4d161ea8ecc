"""A/B harness for the day-grain rollup cache (r10): times the
migrated consumer keys back-to-back in ONE warm session — the shape
the sweep/driver actually runs — printing per-pass totals and the
median. Run against two checkouts (PYTHONPATH) to compare.

Usage: python tools/ab_daily_cache.py [sf_dir] [passes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "ts_backtest_snaive", "ts_hampel_outliers", "ts_record_highs",
    "ts_cross_corr", "ts_pacf", "ts_viterbi_regimes", "ts_kalman_1d",
    "ts_holt_winters", "ts_periodogram", "agg_event_study",
    "ts_theil_u", "ts_granger_lag1", "ts_adstock", "ts_sharpe_sortino",
    "ts_lttb_downsample", "ts_seasonal_esd", "stats_mann_kendall",
    "stats_runs_test", "stats_sign_test", "stats_theil_sen",
    "stats_min_variance_portfolio", "stats_friedman",
    "stats_pettitt_change", "ts_variance_ratio", "stats_chow_break",
    "stats_fleiss_kappa", "ml_eval_pinball", "stats_durbin_watson",
    "stats_ljung_box", "win_rolling_slope", "win_mfi", "win_stock_span",
    "win_kaufman_er", "win_parabolic_sar", "dq_drift_tvd",
    "dq_outlier_votes",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from e2e_data_pipeline_spark.session import get_spark
    from e2e_data_pipeline_spark.operators import QUERIES

    spark = get_spark()
    # warm the JVM/codegen on an unrelated key
    QUERIES["agg_global"](spark, sf_dir).collect()

    totals = []
    for p in range(passes):
        t0 = time.perf_counter()
        per = {}
        for k in KEYS:
            t1 = time.perf_counter()
            QUERIES[k](spark, sf_dir).collect()
            per[k] = round(time.perf_counter() - t1, 3)
        total = round(time.perf_counter() - t0, 3)
        totals.append(total)
        slowest = sorted(per.items(), key=lambda kv: -kv[1])[:5]
        print(f"pass {p}: total={total}s slowest={slowest}", flush=True)
    totals.sort()
    print(f"median_total={totals[len(totals) // 2]}s n_keys={len(KEYS)}")


if __name__ == "__main__":
    main()
