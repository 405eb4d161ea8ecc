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


def test_kmeans_matches_numpy_replication(spark):
    """ml_kmeans_lloyd replicated independently in numpy (same
    quantization, same tie-breaks, same floor-division updates) must
    produce identical cluster sizes and inertia — a third
    implementation agreeing with Spark AND DuckDB pins the algorithm,
    not just the two engines' shared arithmetic."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    vec_ids = tbl["vec_id"].to_numpy()
    q = np.array(
        [np.round(np.asarray(v.as_py(), dtype=np.float64) * 1e6) for v in tbl["embedding"]],
        dtype=np.int64,
    )
    order = np.argsort(vec_ids)
    vec_ids, q = vec_ids[order], q[order]
    cents = q[vec_ids < 4].copy()

    def assign(c):
        # dist matrix (n,k); argmin with (dist, cluster) tie-break =
        # numpy argmin's first-minimum rule over cluster order
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)

    for _ in range(2):
        a, _ = assign(cents)
        new = []
        for c in sorted(set(a)):
            s = q[a == c].sum(axis=0)
            n = (a == c).sum()
            new.append((s - np.mod(s, n)) // n)  # pmod floor division
        cents = np.array(new, dtype=np.int64)
    a, dmin = assign(cents)
    expect = {
        c: (int((a == c).sum()), int((dmin[a == c] // 1_000_000).sum()))
        for c in sorted(set(a))
    }
    rows = QUERIES["ml_kmeans_lloyd"](spark, SF_SMALL).collect()
    got = {r.cluster: (r.n_points, r.inertia_k) for r in rows}
    assert got == expect


def test_semantic_det_clusters_are_sound(spark):
    """Every member of a dedup_semantic_det cluster must have a TRUE
    quantized cosine ≥ 0.35 to at least one other member (soundness
    re-derived with numpy floats well above the threshold's ppm
    resolution). The det op may miss boundary pairs (P=2 probes) but
    must never invent one."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    vid = tbl["vec_id"].to_numpy()
    q = np.array(
        [np.round(np.asarray(v.as_py(), dtype=np.float64) * 1e6) for v in tbl["embedding"]],
        dtype=np.float64,
    )
    idx = {int(v): i for i, v in enumerate(vid)}
    rows = QUERIES["dedup_semantic_det"](spark, SF_SMALL).collect()
    # rebuild membership: rep r cluster holds every v whose greedy rep is r;
    # soundness check only needs "each rep has >=1 member within threshold"
    reps = [r.rep for r in rows]
    norms = np.linalg.norm(q, axis=1)
    sims = (q @ q.T) / np.outer(norms, norms)
    for r in reps:
        i = idx[r]
        close = np.where(sims[i] >= 0.35 - 1e-9)[0]
        assert len(close) > 1, f"rep {r} has no true neighbor at 0.35"


def test_vwap_and_elasticity_share_bases(spark):
    """ts_vwap and agg_price_elasticity aggregate the same lineitem
    cents/quantities by the same category key through different
    pipelines — their totals must agree exactly: total_flow = c1+c2
    and total_vol = q1+q2 per category."""
    vwap = {
        r.cat: (r.total_vol, r.total_flow_cents)
        for r in QUERIES["ts_vwap"](spark, SF_SMALL).collect()
    }
    elas = {
        r.cat: (r.q1 + r.q2, r.c1 + r.c2)
        for r in QUERIES["agg_price_elasticity"](spark, SF_SMALL).collect()
    }
    assert vwap == elas


def test_nrr_identity_floor_equals_retained_minus_expansion(spark):
    """agg_nrr_grr internal identity: the GRR floor (LEAST-capped
    revenue) must equal retained_total − expansion in every month —
    two different constructions of the same quantity."""
    from e2e_data_pipeline_spark.operators import QUERIES

    rows = QUERIES["agg_nrr_grr"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture must produce months"
    for r in rows:
        floor = r.retained_total - r.expansion
        assert floor >= 0
        assert r.start_rev >= r.churned
        assert r.grr_ppm <= r.nrr_ppm
        assert r.grr_ppm == floor * 1000000 // r.start_rev


def test_median_polish_effects_bounded_by_band(spark):
    """agg_median_polish col effects must sit inside the hour-of-day
    min/max envelope of the raw matrix (a median cannot escape the
    data range after level removal: |effect| <= max row spread)."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["agg_median_polish"](spark, sf).collect()
    assert len(rows) == 24
    events = load_table(spark, sf, "events")
    grid = events.groupBy(
        F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400").alias("d"),
        F.expr(
            "pmod(CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 3600, 24)"
        ).alias("hod"),
    ).agg(F.count("*").alias("z"))
    spread = grid.groupBy("d").agg(
        (F.max("z") - F.min("z")).alias("sp")
    ).agg(F.max("sp")).collect()[0][0]
    for r in rows:
        assert abs(r.col_effect) <= spread


def test_session4_calculator_invariants(spark):
    """Cheap single-pass invariants for the session-4 calculators —
    bounds and identities that a formula typo would break even though
    shared-text oracle parity would not."""
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"

    rows = QUERIES["win_mfi"](spark, sf).collect()
    for r in rows:
        assert 0 <= r.mfi_ppm <= 1_000_000
        assert r.pos_flow >= 0 and r.neg_flow >= 0

    for r in QUERIES["win_keltner"](spark, sf).collect():
        assert r.lower <= r.mid <= r.upper
        if r.breakout_up:
            assert r.close_cents > r.mid
        if r.breakout_down:
            assert r.close_cents < r.mid

    mc = QUERIES["stats_median_ci"](spark, sf).collect()[0]
    assert mc.ci_lo_cents <= mc.median_cents <= mc.ci_hi_cents
    assert 1 <= mc.lo_rank < mc.hi_rank <= mc.n

    dl = QUERIES["ml_eval_auc_delong"](spark, sf).collect()[0]
    assert dl.ci_lo <= dl.auc <= dl.ci_hi
    assert dl.se_delong > 0

    vr = QUERIES["ts_variance_ratio"](spark, sf).collect()[0]
    assert vr.vr5 > 0

    dp = QUERIES["dq_digit_preference"](spark, sf).collect()
    assert abs(sum(r.share_ppm for r in dp) - 1_000_000) <= len(dp)
    assert len({r.whipple_ppm for r in dp}) == 1

    b58 = QUERIES["fn_base58_codec"](spark, sf).collect()[0]
    assert b58.n_roundtrip_ok == b58.n_rows

    ks = QUERIES["stats_ks_uniform_hash"](spark, sf).collect()[0]
    assert 0 <= ks.d_stat <= 1

    cr = QUERIES["agg_capture_recapture"](spark, sf).collect()[0]
    assert cr.m <= min(cr.n1, cr.n2)
    assert cr.chapman >= 0

    mk = QUERIES["agg_attribution_markov"](spark, sf).collect()
    base = [r for r in mk if r.removed_channel == "base"][0]
    assert base.removal_effect == 0.0
    for r in mk:
        assert r.removal_effect <= 1.0
        assert r.conv_weight >= 0

    er = QUERIES["win_kaufman_er"](spark, sf).collect()
    for r in er:
        assert 0 <= r.efficiency_ppm <= 1_000_000
        assert r.net_abs <= r.path_abs or r.path_abs == 0


def test_apportionment_bpe_dictionary_invariants(spark):
    """Micro-invariants for the late session ops."""
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"

    seats = QUERIES["agg_divisor_apportionment"](spark, sf).collect()
    assert sum(r.dhondt_seats for r in seats) == 10
    assert sum(r.sainte_lague_seats for r in seats) == 10

    bpe = QUERIES["text_bpe_step"](spark, sf).collect()
    for r in bpe:
        assert r.merged_occurrences <= r.weighted_count

    dd = QUERIES["dq_data_dictionary"](spark, sf).collect()
    assert len(dd) == 48
    for r in dd:
        assert 0 <= r.n_null <= r.n_rows
        assert r.n_distinct <= r.n_rows

    fp = QUERIES["fn_feistel_permutation"](spark, sf).collect()[0]
    assert fp.n_roundtrip == fp.n
    assert fp.n_distinct_tokens == fp.n

    hw = QUERIES["ts_holt_winters"](spark, sf).collect()[0]
    assert hw.n_days >= 1 and hw.level is not None


def test_grubbs_g_matches_numpy_replay(spark):
    """stats_grubbs_test's cleared-denominator chain replicated
    independently: daily cents rebuilt in pure pandas/numpy, G =
    max|x − x̄|/s with ddof=1 — the textbook formula, none of the op's
    integer-moment algebra. Identical-expression ops are parity-blind
    to formula bugs; this pin is the independent reference."""
    import math

    row = QUERIES["stats_grubbs_test"](spark, SF_SMALL).collect()[0]

    import pandas as pd

    orders = spark.read.parquet(SF_SMALL + "/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    )
    pdf = orders.toPandas()
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    day = (
        pd.to_datetime(pdf["o_orderdate"]).astype("int64") // (86400 * 10**9)
    )
    daily = cents.groupby(day).sum()
    n = len(daily)
    mean = daily.mean()
    s = daily.std(ddof=1)
    g_ref = (daily - mean).abs().max() / s
    peak_day_ref = (daily - mean).abs().idxmax()

    assert row["n_days"] == n
    assert row["peak_day"] == peak_day_ref
    assert math.isclose(row["grubbs_g"], g_ref, rel_tol=1e-9)


def test_logreg_newton_matches_numpy_replay(spark):
    """ml_logreg_newton's closed form replicated independently: the
    Newton step from beta=0 computed as the textbook matrix product
    4*(X'X)^-1 X'(y-1/2) in numpy — none of the op's cleared-halves
    algebra. Identical-expression ops are parity-blind to formula
    bugs; this pin is the independent reference."""
    import math

    import numpy as np

    row = QUERIES["ml_logreg_newton"](spark, SF_SMALL).collect()[0]

    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet").select(
        "l_quantity", "l_returnflag"
    )
    pdf = li.toPandas()
    x = pdf["l_quantity"].round().astype("int64").to_numpy()
    y = (pdf["l_returnflag"] == "R").astype("int64").to_numpy()
    X = np.stack([np.ones_like(x), x], axis=1).astype("float64")
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    n_pred = int(((beta[0] + beta[1] * x) > 0).sum())

    assert row["n"] == len(x)
    assert row["n_pos"] == int(y.sum())
    assert math.isclose(row["beta0"], beta[0], rel_tol=1e-9)
    assert math.isclose(row["beta1"], beta[1], rel_tol=1e-9)
    assert row["n_pred_pos"] == n_pred
    # one Newton step from 0 must IMPROVE the log-likelihood vs beta=0
    z = beta[0] + beta[1] * x
    ll1 = float((y * z - np.log1p(np.exp(z))).sum())
    ll0 = float(len(x) * math.log(0.5))
    assert ll1 > ll0


def test_brunner_munzel_matches_numpy_replay(spark):
    """stats_brunner_munzel replayed with the textbook midrank
    construction (scipy.stats.brunnermunzel's formulation) in pure
    numpy — none of the op's x2-integer-unit algebra. The two engine
    sides share the rank CTEs, so parity alone cannot catch a formula
    bug; this pin is the independent reference."""
    import math

    import numpy as np

    row = QUERIES["stats_brunner_munzel"](spark, SF_SMALL).collect()[0]

    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet").select(
        "l_quantity", "l_discount"
    )
    pdf = li.toPandas()
    v = pdf["l_quantity"].round().astype("int64").to_numpy()
    g = (pdf["l_discount"] > 0.05).to_numpy()
    x, y = v[~g], v[g]  # control, treated

    def midranks(a, within):
        # midrank of each element of `within` among `a`
        a_sorted = np.sort(a)
        lo = np.searchsorted(a_sorted, within, side="left")
        hi = np.searchsorted(a_sorted, within, side="right")
        return (lo + hi + 1) / 2.0

    comb = np.concatenate([x, y])
    rcx, rcy = midranks(comb, x), midranks(comb, y)
    rx, ry = midranks(x, x), midranks(y, y)
    nx, ny = len(x), len(y)
    sx2 = ((rcx - rx - rcx.mean() + (nx + 1) / 2.0) ** 2).sum() / (nx - 1)
    sy2 = ((rcy - ry - rcy.mean() + (ny + 1) / 2.0) ** 2).sum() / (ny - 1)
    w_ref = (
        nx * ny * (rcy.mean() - rcx.mean())
        / ((nx + ny) * math.sqrt(nx * sx2 + ny * sy2))
    )
    p_ref = (rcy.mean() - (ny + 1) / 2.0) / nx

    assert row["n_control"] == nx and row["n_treated"] == ny
    assert math.isclose(row["bm_stat"], w_ref, rel_tol=1e-9)
    assert math.isclose(row["p_hat"], p_ref, rel_tol=1e-9)


def test_seasonal_esd_matches_pandas_replay(spark):
    """ts_seasonal_esd replayed with the textbook S-H-ESD loop in
    pandas (dow-median deseasonalize, then per-round median/MAD argmax
    + removal) — none of the op's order-statistic SQL. The two engine
    sides share the round text, so parity alone cannot catch a
    formula bug."""
    import pandas as pd

    rows = QUERIES["ts_seasonal_esd"](spark, SF_SMALL).collect()

    orders = spark.read.parquet(SF_SMALL + "/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    )
    pdf = orders.toPandas()
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    day = (
        pd.to_datetime(pdf["o_orderdate"]).astype("int64")
        // (86400 * 10**9)
    )
    daily = cents.groupby(day).sum().sort_index()

    def low_median(s):  # discrete low median: rank (n+1)//2
        v = sorted(s)
        return v[(len(v) + 1) // 2 - 1]

    dow = daily.index % 7
    med_dow = {w: low_median(daily[dow == w]) for w in set(dow)}
    resid = daily - pd.Series([med_dow[w] for w in dow], index=daily.index)

    rem = resid.copy()
    for k, row in zip((1, 2, 3), rows):
        m = low_median(rem)
        dev = (rem - m).abs()
        mad = low_median(dev)
        top = dev.max()
        d = min(rem.index[dev == top])
        assert row["round"] == k
        assert row["day"] == d, f"round {k}: {row['day']} != {d}"
        assert row["resid"] == rem[d]
        assert row["dev"] == top and row["mad"] == mad
        assert abs(row["score"] - top / max(1, mad)) < 1e-12
        rem = rem.drop(d)


def test_parabolic_sar_matches_python_replay(spark):
    """win_parabolic_sar's recursion replayed as a plain Python loop
    (the textbook Wilder update with the documented simplified-clamp
    convention). Shared-text recursions are parity-blind to formula
    bugs; this is the independent reference."""
    import pandas as pd

    rows = QUERIES["win_parabolic_sar"](spark, SF_SMALL).collect()

    ev = spark.read.parquet(SF_SMALL + "/events.parquet").select(
        "ts", "value"
    )
    pdf = ev.toPandas()
    cents = (pdf["value"].fillna(0) * 100).round().astype("int64")
    day = pd.to_datetime(pdf["ts"]).astype("int64") // (86400 * 10**9)
    g = pd.DataFrame({"d": day, "c": cents}).groupby("d")["c"]
    hi, lo = g.max().sort_index(), g.min().sort_index()

    trend, sar, ep, afs = 1, float(lo.iloc[0]), float(hi.iloc[0]), 1
    expect = [(1, trend, sar, ep, afs)]
    for i in range(1, len(hi)):
        h, l = float(hi.iloc[i]), float(lo.iloc[i])
        cand = sar + afs * 0.02 * (ep - sar)
        if trend == 1:
            if l < cand:
                trend, sar, ep, afs = -1, ep, l, 1
            else:
                sar = cand
                if h > ep:
                    afs = min(afs + 1, 10)
                ep = max(ep, h)
        else:
            if h > cand:
                trend, sar, ep, afs = 1, ep, h, 1
            else:
                sar = cand
                if l < ep:
                    afs = min(afs + 1, 10)
                ep = min(ep, l)
        expect.append((i + 1, trend, sar, ep, afs))

    assert len(rows) == len(expect)
    for row, (d, t, s, e, a) in zip(rows, expect):
        assert (row["day"], row["trend"], row["afs"]) == (d, t, a)
        assert row["sar"] == s and row["ep"] == e, f"day {d}"


def test_als_rank1_matches_numpy_replay(spark):
    """ml_als_rank1_step's cleared-eighths algebra replayed as the
    textbook ridge solve u = (X'X + lambda)^-1 X'r in numpy per
    supplier — independent of the op's integer units."""
    import math

    import numpy as np

    rows = QUERIES["ml_als_rank1_step"](spark, SF_SMALL).collect()

    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    pdf = li.toPandas()
    pdf["rt"] = pdf["l_quantity"].round().astype("int64")
    pdf["x"] = (8 + pdf["l_partkey"] % 7) / 8.0
    best = {}
    for u, g in pdf.groupby("l_suppkey"):
        x, r = g["x"].to_numpy(), g["rt"].to_numpy()
        best[u] = float((r * x).sum() / (1.0 + (x * x).sum()))
    top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    assert len(rows) == min(15, len(best))  # sf0.001 has 10 suppliers
    for row, (u, f) in zip(rows, top):
        assert row["suppkey"] == u
        assert math.isclose(row["factor"], f, rel_tol=1e-12)


def test_periodogram_matches_numpy_replay(spark):
    """ts_periodogram vs numpy's own trig: P(k) computed with
    np.cos/np.sin over the same daily counts. The op's injected
    constants and fold order are implementation details; the spectrum
    itself must match the textbook DFT to float tolerance."""
    import numpy as np
    import pandas as pd

    rows = QUERIES["ts_periodogram"](spark, SF_SMALL).collect()

    ev = spark.read.parquet(SF_SMALL + "/events.parquet").select("ts")
    day = (
        pd.to_datetime(ev.toPandas()["ts"]).astype("int64")
        // (86400 * 10**9)
    )
    y = day.value_counts().sort_index().to_numpy().astype("float64")
    t = np.arange(len(y))
    assert len(rows) == 5
    for row in rows:
        k = row["k"]
        ang = 2 * np.pi * k * t / 30.0
        c, s = float((y * np.cos(ang)).sum()), float((y * np.sin(ang)).sum())
        assert abs(row["cos_sum"] - c) < 1e-6 * max(1, abs(c))
        assert abs(row["sin_sum"] - s) < 1e-6 * max(1, abs(s))
        assert abs(row["power"] - (c * c + s * s)) < 1e-6 * (c * c + s * s)


def test_textrank_matches_python_replay(spark):
    """text_textrank_sentences replayed as a plain Python graph loop
    (pseudo-sentence windows, >=2-shared-word edges, two integer
    ppm PageRank iterations) — independent of the op's SQL."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_textrank_sentences"](
            spark, SF_SMALL
        ).collect()
    }

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pandas()
    tbl = tbl[tbl.doc_id < 120]
    for _, doc in tbl.iterrows():
        words = [w for w in doc.text.split(" ") if w]
        sents = {}
        for i, w in enumerate(words):
            sents.setdefault(i // 10, set()).add(w)
        sids = sorted(sents)
        edges = {s: set() for s in sids}
        n_edges = 0
        for i, a in enumerate(sids):
            for b in sids[i + 1 :]:
                if len(sents[a] & sents[b]) >= 2:
                    edges[a].add(b)
                    edges[b].add(a)
                    n_edges += 1
        r = {s: 1_000_000 for s in sids}
        for _ in range(2):
            r = {
                v: 150_000
                + (850_000 * sum(r[u] // len(edges[u]) for u in edges[v]))
                // 1_000_000
                for v in sids
            }
        best = min(sids, key=lambda s: (-r[s], s))
        got = rows[doc.doc_id]
        assert got["n_sents"] == len(sids)
        assert got["n_edges"] == n_edges
        assert (got["top_sentence"], got["rank_ppm"]) == (best, r[best]), (
            f"doc {doc.doc_id}"
        )


def test_coxph_newton_matches_numpy_replay(spark):
    """ml_coxph_newton replayed with the textbook Breslow score /
    information loop in numpy (risk sets rebuilt per event time by
    brute force) — none of the op's suffix-sum algebra."""
    import math

    import pandas as pd

    row = QUERIES["ml_coxph_newton"](spark, SF_SMALL).collect()[0]

    o = spark.read.parquet(SF_SMALL + "/orders.parquet").select(
        "o_custkey", "o_orderdate"
    )
    pdf = o.toPandas()
    day = (
        pd.to_datetime(pdf["o_orderdate"]).astype("int64")
        // (86400 * 10**9)
    )
    g = pd.DataFrame({"c": pdf["o_custkey"], "d": day}).groupby("c")["d"]
    dur = (g.max() - g.min()).to_numpy()
    event = (g.max() < g.max().max() - 90).to_numpy().astype(int)
    x = g.count().to_numpy().astype(float)

    u_score = info = 0.0
    for t in sorted(set(dur[event == 1])):
        at_risk = dur >= t
        deaths = (dur == t) & (event == 1)
        d_t = int(deaths.sum())
        s0, s1 = at_risk.sum(), x[at_risk].sum()
        s2 = (x[at_risk] ** 2).sum()
        u_score += x[deaths].sum() - d_t * s1 / s0
        info += d_t * (s2 / s0 - (s1 / s0) ** 2)

    assert row["n_subjects"] == len(dur)
    assert row["n_events"] == int(event.sum())
    assert math.isclose(row["u_score"], u_score, rel_tol=1e-9)
    assert math.isclose(row["fisher_info"], info, rel_tol=1e-9)
    assert math.isclose(row["beta"], u_score / info, rel_tol=1e-9)


def test_matrix_profile_matches_numpy_replay(spark):
    """ts_matrix_profile vs a numpy brute force over the same daily
    cents series — independent of the op's join construction (both
    engine sides share one derivation, so this is the real check)."""
    import numpy as np
    import pandas as pd

    rows = {
        r["win_idx"]: (r["nn_idx"], r["nn_dist2"])
        for r in QUERIES["ts_matrix_profile"](spark, SF_SMALL).collect()
    }

    ev = spark.read.parquet(SF_SMALL + "/events.parquet").select(
        "ts", "value"
    )
    pdf = ev.toPandas()
    cents = (pdf["value"].fillna(0) * 100).round().astype("int64")
    day = pd.to_datetime(pdf["ts"]).dt.floor("D")
    series = (
        pd.DataFrame({"d": day, "c": cents})
        .groupby("d")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(series)
    nw = n - 6
    assert nw >= 5
    expect = {}
    for t in range(1, nw + 1):
        best = None
        for s in range(1, nw + 1):
            if abs(t - s) < 4:
                continue
            wa = series[t - 1 : t + 6]
            wb = series[s - 1 : s + 6]
            d2 = int(((wa - wb) ** 2).sum())
            if best is None or (d2, s) < best:
                best = (d2, s)
        expect[t] = (best[1], best[0])
    assert rows == expect


def test_regression_tree_depth2_matches_numpy_replay(spark):
    """ml_regression_tree_depth2's split choices and leaf means vs a
    plain numpy greedy CART on the same integer data — independent of
    the op's cumulative/decimal construction."""
    import numpy as np

    rows = {
        r["leaf"]: r
        for r in QUERIES["ml_regression_tree_depth2"](
            spark, SF_SMALL
        ).collect()
    }

    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet").select(
        "l_extendedprice", "l_quantity", "l_discount"
    )
    pdf = li.toPandas()
    y = (pdf["l_extendedprice"] * 100).round().astype("int64").to_numpy()
    feats = {
        "q": pdf["l_quantity"].astype("int64").to_numpy(),
        "d": (pdf["l_discount"] * 100).round().astype("int64").to_numpy(),
    }

    def best_split(mask):
        n_s, s_s = int(mask.sum()), int(y[mask].sum())
        best = None
        for f in ("d", "q"):  # tie order: feature asc
            vals = np.unique(feats[f][mask])
            for t in vals[:-1]:
                left = mask & (feats[f] <= t)
                n_l, s_l = int(left.sum()), int(y[left].sum())
                a = n_s * s_l - n_l * s_s
                g = (a * a) / (n_l * (n_s - n_l))
                key = (-g, f, int(t))
                if best is None or key < best:
                    best = key
        return (best[1], best[2]) if best else None

    all_mask = np.ones(len(y), bool)
    rf, rt = best_split(all_mask)
    assert (rows["LL"]["root_feat"], rows["LL"]["root_thr"]) == (rf, rt)
    for side in ("L", "R"):
        m = (
            all_mask & (feats[rf] <= rt)
            if side == "L"
            else all_mask & (feats[rf] > rt)
        )
        lf, lt = best_split(m)
        for sub in ("L", "R"):
            leaf = rows[side + sub]
            assert (leaf["leaf_feat"], leaf["leaf_thr"]) == (lf, lt)
            mm = m & (feats[lf] <= lt) if sub == "L" else m & (feats[lf] > lt)
            assert leaf["n_rows"] == int(mm.sum())
            assert abs(leaf["pred"] - y[mm].mean()) < 1e-6 * abs(
                y[mm].mean()
            )
