"""Registry-wide single-partition Sort/Window sweep.

The scale trap this guards: a ``row_number()/SUM() OVER (ORDER BY
...)`` with no partition key (or a global ``Sort`` that isn't a
top-k) compiles to ``Exchange SinglePartition`` feeding a Sort/Window
— every row through ONE task. Round 4's verdict found five row-grain
offenders by hand-auditing ~86 window sites; this sweep automates the
audit over the WHOLE registry so the class cannot regrow (it caught
``fn_uuid_v5``'s COUNT() OVER () the day it was written).

Mechanics: every key's formatted physical plan is taken from the
shared zero-row construction cache (same plan structure as sf0.001 —
verified by diffing the two audits; tools/plan_sp_audit.py is the
standalone twin). A Sort/Window/WindowGroupLimit whose direct child
is an Exchange SinglePartition is an offender unless (a) a partial
WindowGroupLimit sits below the exchange (rank <= k: only k rows per
mapper cross the shuffle — auto-exempt, structural) or (b) the key is
in BOUNDED_GRAIN below with its grain justification: the frame the
window runs over is bounded by calendar/value-domain/config, NOT by
input rows, so the single partition holds O(grain) rows at any data
scale.

A whitelisted key that stops having hits FAILS too — stale entries
must be removed, so the list can only shrink unless a new bounded-
grain op is added deliberately.
"""

from __future__ import annotations

import pytest

from e2e_data_pipeline_spark.operators import QUERIES
from tools.plan_sp_audit import sp_hits

# key -> why its single-partition frame is bounded (grown-by-data
# frames do NOT belong here; distribute them via registry.global_rank
# like stats_cvm_2sample / ml_conformal_interval / the agg_var_es six).
BOUNDED_GRAIN = {
    # --- daily/weekly/monthly calendar series (one row per bar) ---
    "ts_autocorr": "day-grain series",
    "ts_burst_detect": "day-grain series",
    "ts_changepoint_cusum": "day-grain series",
    "stats_sprt_sequential": "day-grain series (cumulative LLR walk)",
    "stats_logrank": "duration-grain suffix-sum risk sets (<= 61"
    " administrative-censoring rows)",
    "ts_sample_entropy": "day-grain series (rank + lead windows over"
    " calendar days)",
    "ts_dfa": "day-grain series (rank spine for calendar-bounded"
    " DFA boxes)",
    "ts_turning_points": "day-grain series (lag/lead over calendar"
    " days)",
    "stats_quade": "blocks-grain (one row per calendar day; the"
    " global midrank of block ranges runs over <=days rows)",
    "ts_croston": "day-grain demand series",
    "ts_error_budget": "day-grain SLO series",
    "ts_granger_lag1": "day-grain series pair",
    "ts_holt_linear": "day-grain series",
    "ts_periodogram": "day-grain series (dense rank over calendar days)",
    "ts_peak_detect": "day-grain series",
    "ts_record_highs": "day-grain series",
    "ts_ordinal_patterns": "day-grain series (triple lags over"
    " calendar days)",
    "win_hull_ma": "day-grain series (rolling WMA frames over"
    " calendar days)",
    "ts_seasonal_decompose": "day-grain series",
    "ts_seasonal_index": "month-grain series",
    "ts_sharpe_sortino": "day-grain return series",
    "ts_spc_rules": "day-grain control chart",
    "ts_theil_u": "day-grain series",
    "ts_trading_day_adjusted": "day-grain series",
    "ts_variance_ratio": "day-grain return series",
    "ts_viterbi_regimes": "day-grain series (DP is O(days))",
    "ts_survival_km": "distinct-duration grain (suffix-sum risk sets)",
    "ts_nelson_aalen": "distinct-duration grain (suffix-sum risk sets)",
    "agg_bass_diffusion": "week-grain adoption curve",
    "sql_window_clause": "day-grain reducer output",
    "dq_volume_anomaly": "day-grain volume series",
    "ml_eval_pinball": "day-grain forecast series",
    "stats_durbin_watson": "day-grain residual series",
    "stats_ljung_box": "day-grain residual series",
    "stats_pettitt_change": "day-grain series",
    "stats_runs_test": "day-grain sign sequence",
    "stats_sign_test": "day-grain paired series",
    "stats_spearman": "day-grain aggregate pair",
    "stats_theil_sen": "documented O(days^2) day-pair frame",
    # --- daily OHLC/bar technical indicators ---
    "win_aroon": "daily bar series",
    "win_atr": "daily bar series",
    "win_candlestick": "daily bar series",
    "win_bollinger": "daily bar series",
    "win_cci": "daily bar series",
    "win_donchian": "daily bar series",
    "win_ichimoku": "daily bar series",
    "win_kaufman_er": "daily bar series",
    "win_keltner": "daily bar series",
    "win_macd": "daily bar series",
    "win_mfi": "daily bar series",
    "win_obv": "daily bar series",
    "win_pivot_points": "daily bar series",
    "win_rolling_corr": "daily bar series pair",
    "win_rolling_slope": "daily bar series",
    "win_rsi": "daily bar series",
    "win_stochastic_osc": "daily bar series",
    "win_stock_span": "daily bar series",
    "win_ulcer_index": "daily bar series",
    "win_vortex": "daily bar series",
    # --- value-domain (distinct cents / distinct values) frames ---
    "agg_winsorized_mean": "distinct-cents frame",
    "agg_log_histogram_quantiles": "~120-cell log-bucket + distinct-cents frames",
    "stats_emd_1d": "distinct-cents prefix walk",
    "stats_kruskal_wallis": "distinct-cents rank frame",
    "stats_ks_test": "distinct-value step function",
    "stats_brunner_munzel": "50-value quantity domain rank frame",
    "stats_mannwhitney": "distinct-cents rank frame",
    "stats_cliffs_delta": "distinct-cents prefix-sum frame",
    "stats_kuiper": "distinct-value step function",
    "stats_median_ci": "distinct-cents order stats",
    "ml_eval_auc": "distinct-score-cents rank frame",
    "ml_eval_auc_delong": "distinct-score-cents rank frame",
    "graph_degree_dist": "distinct-degree histogram",
    "agg_littles_law": "distinct-second sweep (calendar-bounded)",
    # --- config/vocabulary/cell-bounded frames ---
    "agg_apportionment": "25-nation seat table",
    "fn_natural_sort": "bounded versioned-name list",
    "fn_semver_sort": "bounded version list",
    "ml_dbscan_grid": "grid-cell frame",
    "ml_decision_stump": "decile candidate grid",
    "ml_isotonic_calibration": "bounded calibration bins",
    "ml_one_rule": "bounded attribute-value cells",
    "ml_slice_audit": "5-slice audit table",
    "ml_threshold_sweep": "9 fixed thresholds",
    "ml_coxph_newton": "duration-grain suffix sums (calendar-bounded)",
    "ml_uplift_segments": "25-segment bound",
    "ml_uplift_qini": "8 score-octile buckets (cumulative frame)",
    "stats_bh_fdr": "dim-grain hypothesis family",
    "stats_bootstrap_ci": "100 bootstrap replicates",
    "stats_cramers_v": "<=15 contingency cells",
    "stats_hodges_lehmann": "fixed-size sampled pair frame",
    # --- documented algorithmic global sort ---
    "win_skyline": "sort-based skyline sweep over the filtered frontier",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_row_grain_single_partition_rank(empty_query_cache, name):
    _, plan = empty_query_cache(name)
    hits = sp_hits(plan)
    if name in BOUNDED_GRAIN:
        assert hits, (
            f"{name}: whitelisted ({BOUNDED_GRAIN[name]!r}) but its plan "
            "no longer has a single-partition Sort/Window — remove the "
            "stale BOUNDED_GRAIN entry"
        )
    else:
        assert not hits, (
            f"{name}: Sort/Window fed by Exchange SinglePartition: {hits}. "
            "Distribute it (registry.global_rank / boundary-recovered "
            "range partitioning) or, if the frame is genuinely bounded, "
            "add a BOUNDED_GRAIN entry with the grain justification."
        )
