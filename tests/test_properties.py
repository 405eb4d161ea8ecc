"""Property-based tests (hypothesis): invariants that must hold for
ARBITRARY data, not just the fixtures — the cross-engine determinism
arguments the oracle hash relies on.

Each test generates small inputs, builds a DataFrame, and checks the
invariant under the operations that vary at scale (partitioning,
ordering), since those are exactly what a 1000-executor cluster
randomizes.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# Two-decimal "money" doubles: the fixture domain for prices/values.
money = st.integers(min_value=-(10**7), max_value=10**7).map(lambda c: c / 100.0)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(money, min_size=1, max_size=200), parts=st.integers(1, 8))
@settings(**_SETTINGS)
def test_decimal_sum_invariant_under_partitioning(spark, values, parts):
    """dec_sum must equal the exact Decimal sum for ANY partitioning —
    the property that makes the oracle hash reproducible. A raw double
    sum does NOT have this property; decimal summation does."""
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(parts)
    got = df.agg(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s")
    ).collect()[0].s
    expect = float(sum(Decimal(str(v)).quantize(Decimal("0.01")) for v in values))
    assert got == expect


@given(keys=st.lists(st.integers(0, 10**6), min_size=1, max_size=300, unique=True))
@settings(**_SETTINGS)
def test_hash_sample_is_partitioning_invariant(spark, keys):
    """The systematic key-hash sample must select the same keys no
    matter how the data is partitioned (df.sample would not)."""
    pred = (F.col("k") * F.lit(2654435761)) % 100 < 5

    def sample(parts: int) -> set:
        df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(parts)
        return {r.k for r in df.where(pred).collect()}

    assert sample(1) == sample(7)


@given(
    n_rows=st.integers(1, 100),
    hot_share=st.integers(0, 80),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, n_rows, hot_share):
    """Salting must be result-invariant for any skew profile: the
    salted fact⋈dim join returns exactly the plain join's rows,
    including for a pathological hot key."""
    n_salts = 4
    # hot_share% of rows share key 0; the rest spread over 10 keys
    facts = [
        (i, (0 if i * 100 < hot_share * n_rows else i % 10) + 1)
        for i in range(n_rows)
    ]
    fact = spark.createDataFrame(facts, "row_id long, k long")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 11)], "k long, label string")

    plain = {
        (r.row_id, r.label)
        for r in fact.join(dim, "k").select("row_id", "label").collect()
    }
    salted_fact = fact.withColumn(
        "salt", F.pmod(F.xxhash64("row_id"), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted = {
        (r.row_id, r.label)
        for r in salted_fact.join(salted_dim, ["k", "salt"])
        .select("row_id", "label")
        .collect()
    }
    assert salted == plain


@given(
    updates=st.lists(st.integers(0, 30), max_size=15, unique=True),
    inserts=st.lists(st.integers(100, 130), max_size=15, unique=True),
)
@settings(**_SETTINGS)
def test_merge_upsert_invariants(spark, updates, inserts):
    """Full-outer-join MERGE emulation: output keys are unique, every
    target key survives, every insert key appears, and actions are
    consistent with membership."""
    target = spark.createDataFrame([(k, 1.0) for k in range(31)], "k long, v double")
    delta = spark.createDataFrame(
        [(k, 2.0) for k in updates] + [(k, 3.0) for k in inserts], "k long, v double"
    )
    t, d = target.alias("t"), delta.alias("d")
    merged = t.join(d, F.col("t.k") == F.col("d.k"), "full").select(
        F.coalesce("t.k", "d.k").alias("k"),
        F.coalesce("d.v", "t.v").alias("v"),
        F.when(F.col("t.k").isNull(), "insert")
        .when(F.col("d.k").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    rows = merged.collect()
    ks = [r.k for r in rows]
    assert len(ks) == len(set(ks)), "merge output must have unique keys"
    assert set(ks) == set(range(31)) | set(inserts)
    for r in rows:
        if r.k in inserts:
            assert r.action == "insert" and r.v == 3.0
        elif r.k in updates:
            assert r.action == "update" and r.v == 2.0
        else:
            assert r.action == "keep" and r.v == 1.0


@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_exact_dedup_idempotent_and_minimal(spark, texts):
    """Exact dedup invariants on arbitrary text: output has no
    duplicate normalized texts, keeps the minimum doc_id per group,
    and is idempotent."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    from pyspark.sql import Window

    w = Window.partitionBy("norm").orderBy("doc_id")
    deduped = (
        df.withColumn("norm", norm)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    out = deduped.collect()
    norms = [r.norm for r in out]
    assert len(norms) == len(set(norms))
    # minimal representative: no earlier doc_id shares the norm
    firsts = {}
    for r in df.withColumn("norm", norm).collect():
        firsts.setdefault(r.norm, r.doc_id)
    for r in out:
        assert r.doc_id == firsts[r.norm]


def test_scd2_intervals_partition_the_timeline(spark):
    """SCD2 semantic invariants on real data: per user, exactly one
    open (is_current) interval; closed intervals chain contiguously
    (each valid_to equals the next valid_from); values actually change
    at every boundary."""
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["scd2_history"](spark, SF_SMALL).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.valid_from_us)
        assert sum(r.is_current for r in hist) == 1
        assert hist[-1].is_current and hist[-1].valid_to_us is None
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.attr_value != b.attr_value


def test_running_distinct_final_equals_exact_count(spark):
    """The last running value per supplier must equal the exact
    COUNT(DISTINCT part) for that supplier."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    running = QUERIES["win_distinct_running"](spark, SF_SMALL)
    finals = {
        r.l_suppkey: r.distinct_parts_so_far
        for r in running.orderBy("l_suppkey", "shipdate", "l_orderkey",
                                 "l_linenumber").collect()
    }  # dict keeps the LAST row per supplier
    exact = {
        r.l_suppkey: r.n
        for r in load_table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_suppkey") < 10)
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert finals == exact


@given(
    keys=st.lists(st.integers(0, 10**6), min_size=1, max_size=200, unique=True),
    parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_contiguous_ids_are_a_sorted_permutation(spark, keys, parts):
    """fn_contiguous_ids' two-pass construction must produce exactly
    0..n-1 in global key order for ANY input partitioning — the
    property the per-partition offsets scheme must preserve."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long").repartition(
        parts
    )
    n_range = 4
    rp = df.repartitionByRange(n_range, "doc_id").localCheckpoint()
    with_pid = rp.withColumn("pid", F.spark_partition_id())
    sizes = {
        r["pid"]: r["cnt"]
        for r in with_pid.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("pid").orderBy("doc_id")
    out = with_pid.select(
        "doc_id",
        (omap[F.col("pid")] + F.row_number().over(w) - 1).alias("sample_id"),
    ).collect()
    by_key = sorted(out, key=lambda r: r.doc_id)
    assert [r.sample_id for r in by_key] == list(range(len(keys)))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),          # user
            st.integers(0, 3600 * 6),   # epoch seconds within 6h
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(**_SETTINGS)
def test_binned_interval_join_equals_naive_theta(spark, rows):
    """join_range_binned's bin-explode construction must produce
    EXACTLY the naive |Δt| ≤ width theta-join pair set for arbitrary
    event layouts (each qualifying pair matched once, none missed)."""
    width = 300
    data = [(i, u, t) for i, (u, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, u long, t long")
    naive = {
        (a_id, b_id)
        for a_id, a_u, a_t in data
        for b_id, b_u, b_t in data
        if a_u == b_u and a_id < b_id and abs(a_t - b_t) <= width
    }
    base = df.withColumn("bin", (F.col("t") / width).cast("long"))
    left = base.select(
        F.col("id").alias("id_a"), F.col("u"), F.col("t").alias("t_a"),
        F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)).alias("bin_j"),
    )
    right = base.select(
        F.col("id").alias("id_b"), F.col("u"), F.col("t").alias("t_b"),
        F.col("bin").alias("bin_j"),
    )
    got = {
        (r.id_a, r.id_b)
        for r in left.join(right, ["u", "bin_j"])
        .where((F.col("id_a") < F.col("id_b"))
               & (F.abs(F.col("t_a") - F.col("t_b")) <= width))
        .collect()
    }
    assert got == naive


@given(
    tokens=st.lists(st.integers(1, 40), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_shard_pack_bounded_overflow(spark, tokens):
    """corpus_shard_pack's cumulative-quota assignment: every shard's
    token total stays under quota + its last doc's size (bounded
    overflow), shards are contiguous in doc order, and totals add up."""
    quota = 64
    data = [(i, n) for i, n in enumerate(tokens)]
    from pyspark.sql import Window

    df = spark.createDataFrame(data, "doc_id long, n_tokens long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = (
        df.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("shard", F.floor((F.col("cum") - 1) / quota))
        .collect()
    )
    per_shard = {}
    for r in sorted(packed, key=lambda r: r.doc_id):
        per_shard.setdefault(r.shard, []).append(r)
    shard_ids = sorted(per_shard)
    # contiguity in doc order
    seen = []
    for s in shard_ids:
        seen.extend(r.doc_id for r in per_shard[s])
    assert seen == sorted(seen)
    # bounded overflow: a shard's total < quota + its FIRST doc's size
    # (the first doc is the boundary-straddler; oversized docs get
    # their own overflowing shard)
    for s in shard_ids:
        total = sum(r.n_tokens for r in per_shard[s])
        assert total < quota + per_shard[s][0].n_tokens
    assert sum(tokens) == sum(r.n_tokens for r in packed)


@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=300),
    parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_countmin_never_underestimates(spark, keys, parts):
    """The count-min sketch guarantee est >= true must hold for ANY key
    distribution and ANY partitioning — the property agg_countmin_freq's
    `overestimate` column asserts per row. Rebuilds the same 4x64
    sketch over arbitrary integer keys."""
    df = spark.createDataFrame([(str(k),) for k in keys], "k string").repartition(
        parts
    )
    depths = F.explode(F.array(*[F.lit(i) for i in range(4)]))

    def bucket(depth_col, key_col):
        seeded = F.concat(depth_col.cast("string"), F.lit(":"), key_col)
        return (
            F.conv(F.substring(F.md5(seeded.cast("binary")), 1, 8), 16, 10)
            .cast("long") % 64
        ).alias("bucket")

    cms = (
        df.select("k", depths.alias("depth"))
        .select("depth", bucket(F.col("depth"), F.col("k")))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    truth = df.groupBy("k").agg(F.count("*").alias("true_n"))
    probe = truth.select("k", "true_n", depths.alias("depth")).select(
        "k", "true_n", "depth", bucket(F.col("depth"), F.col("k"))
    )
    est = (
        probe.join(cms, ["depth", "bucket"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est"), F.min("true_n").alias("true_n"))
    )
    for r in est.collect():
        assert r.est >= r.true_n, (r.k, r.est, r.true_n)


@given(values=st.lists(money, min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_ewma_stays_within_frame_envelope(spark, values):
    """A convex-weight fold can never leave [min, max] of its frame —
    win_ewma's defining invariant, for arbitrary value streams."""
    rows = [(1, i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    out = df.select(
        F.collect_list("value").over(w).alias("arr"),
    ).select(
        F.expr(
            "aggregate(slice(arr, 2, size(arr) - 1),"
            " CAST(element_at(arr, 1) AS DOUBLE),"
            " (acc, x) -> x * 0.25 + acc * 0.75)"
        ).alias("ewma"),
        F.array_min("arr").alias("lo"),
        F.array_max("arr").alias("hi"),
    )
    for r in out.collect():
        assert r.lo - 1e-9 <= r.ewma <= r.hi + 1e-9


@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=200, unique=True),
    parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_cap_per_group_selects_same_members_any_partitioning(spark, ids, parts):
    """sample_cap_per_group's hash-order cap must pick the SAME K
    members regardless of physical partitioning (df.limit would not)."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000007)
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    kept = lambda d: sorted(
        r.doc_id
        for r in d.select("doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 10)
        .collect()
    )
    assert kept(df.repartition(parts)) == kept(df.coalesce(1))


@given(tokens=st.lists(st.text(alphabet="abcdefgh |", min_size=0, max_size=12), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_portable_md5_60bit_hash_matches_reference(spark, tokens):
    """The md5-derived 60-bit hash (the primitive under
    dedup_minhash_det / dedup_simhash_det) must equal a from-scratch
    hashlib computation for ARBITRARY strings — pinning that Spark's
    conv(substr(md5)) really is the portable integer both engines
    share."""
    import hashlib

    df = spark.createDataFrame([(t,) for t in tokens], "t string")
    got = {
        r.t: r.h
        for r in df.select(
            "t",
            F.conv(F.substring(F.md5("t"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        ).collect()
    }
    for t in set(tokens):
        expect = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[t] == expect


@given(
    nums=st.lists(
        st.tuples(
            st.integers(0, 2**62), st.integers(1, 2**31)
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(**_SETTINGS)
def test_integer_div_matches_python_floor(spark, nums):
    """Spark's `div` must equal Python's // (and DuckDB's //) for the
    full int64 range used by the fixed-point ops — a double-divide +
    cast would fail this above 2^53."""
    df = spark.createDataFrame(nums, "a long, b long")
    got = df.select("a", "b", F.expr("a div b").alias("q")).collect()
    for r in got:
        assert r.q == r.a // r.b


@given(
    a=st.sets(st.integers(0, 100_000), max_size=200),
    b=st.sets(st.integers(0, 100_000), max_size=200),
)
@settings(**_SETTINGS)
def test_bitmap_inclusion_exclusion_intersection(spark, a, b):
    """|A∩B| computed the agg_bitmap_retention way (per-bucket bitmaps,
    |A|+|B|−|A∪B| via bitmap_or_agg popcounts) must equal the exact
    set intersection for arbitrary id sets."""
    rows = [(0, x) for x in a] + [(1, x) for x in b]
    if not rows:
        return
    df = spark.createDataFrame(rows, "side int, id long")
    per_bucket = (
        df.select(
            "side",
            F.bitmap_bucket_number("id").alias("bucket"),
            F.bitmap_bit_position("id").alias("pos"),
        )
        .groupBy("side", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
        .withColumn("cnt", F.bitmap_count("bm"))
    )
    merged = per_bucket.groupBy("bucket").agg(
        F.sum(F.when(F.col("side") == 0, F.col("cnt"))).alias("ca"),
        F.sum(F.when(F.col("side") == 1, F.col("cnt"))).alias("cb"),
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("cu"),
    )
    inter = (
        merged.where(F.col("ca").isNotNull() & F.col("cb").isNotNull())
        .agg(F.sum(F.col("ca") + F.col("cb") - F.col("cu")).alias("i"))
        .collect()[0]
        .i
    )
    assert (inter or 0) == len(a & b)


def test_geohash_matches_bitwise_reference(spark):
    """fn_geohash's magic-mask Morton spread + base32 pick must equal
    a bit-by-bit reference geohash for every supplier row (the
    docstring's promise)."""
    from e2e_data_pipeline_spark.operators import QUERIES

    rows = QUERIES["fn_geohash"](spark, "/root/testdata/sf0.001").collect()
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref(lat_c: int, lon_c: int) -> tuple[int, str]:
        ylat = (lat_c + 9000) * 32768 // 18000
        xlon = (lon_c + 18000) * 32768 // 36000
        m = 0
        for i in range(14, -1, -1):
            m = m * 2 + ((xlon >> i) & 1)
            m = m * 2 + ((ylat >> i) & 1)
        return m, "".join(alpha[(m >> (5 * j)) & 31] for j in range(5, -1, -1))

    assert rows
    for r in rows:
        m, gh = ref(r.lat_c, r.lon_c)
        assert (r.morton, r.geohash6) == (m, gh), r


def test_isotonic_minimax_equals_sequential_pav(spark):
    """ml_isotonic_calibration's minimax identity must produce the
    SAME fit as the classic sequential pool-adjacent-violators
    algorithm, and the fit must be monotone non-decreasing."""
    from e2e_data_pipeline_spark.operators import QUERIES

    rows = sorted(
        QUERIES["ml_isotonic_calibration"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.bin,
    )
    assert rows
    # sequential PAV over the same (weight, positives) bins
    blocks = []  # [sum_pos, weight]
    for r in rows:
        blocks.append([r.n_returned, r.n_orders])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p, w = blocks.pop()
            blocks[-1][0] += p
            blocks[-1][1] += w
    # expand blocks back to per-bin rates
    expanded = []
    for p, w in blocks:
        rate = p / w
        # each block covers as many bins as its accumulated weight
        # came from; recover the span by re-walking the bins
        expanded.append((rate, w))
    # walk bins against blocks
    i = 0
    acc_w = 0
    fits = []
    for r in rows:
        rate, w = expanded[i]
        fits.append(rate)
        acc_w += r.n_orders
        if acc_w >= w:
            i += 1
            acc_w = 0
    for r, f in zip(rows, fits):
        assert abs(r.iso_rate - f) < 1e-12, (r.bin, r.iso_rate, f)
    for x, y in zip(fits, fits[1:]):
        assert x <= y + 1e-12


def test_round_policies_match_python_semantics(spark):
    """fn_round_policies' integer half-even must agree with Python's
    round() (banker's) and half-up with the school rule, on a
    constructed set of boundary cents values."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    vals = [50, 150, 250, 1050, 99_950, 100_050, 123_456, 10_000_150]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        F.expr("(v + 50) div 100").alias("half_up"),
        F.expr(
            "v div 100 + CASE WHEN v % 100 > 50 THEN 1"
            " WHEN v % 100 = 50 AND (v div 100) % 2 = 1 THEN 1"
            " ELSE 0 END"
        ).alias("half_even"),
        F.col("v"),
    )
    for r in df.collect():
        assert r.half_even == round(Decimal(r.v) / 100), r
        assert r.half_up == int(
            (Decimal(r.v) / 100).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        ), r


def test_viterbi_fold_matches_reference_dp(spark):
    """ts_viterbi_regimes' arithmetic-bitmask fold must reproduce a
    plain python Viterbi DP (costs AND decoded path) on the fixture
    series."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS LONG)"
                " div 86400"
            ).alias("di")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0)"
                " AS BIGINT)) div 100 AS BIGINT)"
            ).alias("x")
        )
        .orderBy("di")
        .collect()
    )
    xs = [r.x for r in daily]
    n = len(xs)
    ranked = sorted(xs)
    lo = ranked[(n + 1) // 4 - 1]
    hi = ranked[(3 * (n + 1)) // 4 - 1]
    c = max(1, (hi - lo) // 4)
    cost = [0, 0]
    path = [0, 0]
    pw = 1
    for x in xs:
        stay_l = cost[0] if cost[0] <= cost[1] + c else cost[1] + c
        pl = path[0] if cost[0] <= cost[1] + c else path[1]
        stay_h = cost[1] if cost[1] <= cost[0] + c else cost[0] + c
        ph = path[1] if cost[1] <= cost[0] + c else path[0]
        cost = [abs(x - lo) + stay_l, abs(x - hi) + stay_h]
        path = [pl, ph + pw]
        pw *= 2
    best_cost = min(cost)
    best_path = path[0] if cost[0] <= cost[1] else path[1]
    row = QUERIES["ts_viterbi_regimes"](spark, sf).collect()[0]
    assert (row.n_days, row.lo, row.hi) == (n, lo, hi)
    assert row.best_cost == best_cost
    assert row.path_bits == best_path
    assert row.n_high_days == bin(best_path).count("1")


def test_tax_brackets_fee_bounds_and_monotonicity(spark):
    """Marginal-tier algebra invariants: the effective rate never
    exceeds the top marginal rate, and the fee is monotone in spend
    (checked on a synthetic ladder spanning every bracket edge)."""
    from pyspark.sql import functions as F

    ladder = spark.createDataFrame(
        [(c,) for c in [0, 1, 9_999_999, 10_000_000, 10_000_001,
                        19_999_999, 20_000_000, 25_000_000, 30_000_000,
                        30_000_001, 99_999_999]],
        ["cents"],
    )
    c = F.col("cents")
    fee100 = (
        5 * F.least(F.greatest(c - 10000000, F.lit(0)), F.lit(10000000))
        + 10 * F.least(F.greatest(c - 20000000, F.lit(0)), F.lit(10000000))
        + 15 * F.greatest(c - 30000000, F.lit(0))
    ).cast("long")
    rows = ladder.select("cents", fee100.alias("f")).orderBy("cents").collect()
    prev = -1
    for r in rows:
        assert r.f >= prev  # monotone
        prev = r.f
        assert r.f <= 15 * r.cents  # never above top marginal rate


def test_erlang_b_is_decreasing_in_servers(spark):
    """Erlang-B blocking probability must fall as servers are added
    (the recursion's defining property)."""
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    rows = (
        QUERIES["agg_erlang_c"](spark, SF_SMALL)
        .orderBy("k")
        .collect()
    )
    bs = [r.erlang_b for r in rows]
    assert all(b1 > b2 for b1, b2 in zip(bs, bs[1:]))
    assert all(0.0 < b <= 1.0 for b in bs)


def test_amortization_balance_decreases_to_zero(spark):
    """Level-payment amortization: balances strictly decrease and the
    final balance is ~0 (within float slack of the pmt formula)."""
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["agg_amortization"](spark, SF_SMALL).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append((r.period, r.balance_cents))
    for region, seq in by_region.items():
        seq.sort()
        balances = [b for _, b in seq]
        assert all(a > b for a, b in zip(balances, balances[1:]))
        assert abs(balances[-1]) < 1e-3 * balances[0]


def test_seasonal_decompose_identity(spark):
    """trend + seasonal + residual must reconstruct the observation
    exactly up to the shared denominator (24·n)."""
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["ts_seasonal_decompose"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert abs((r.trend + r.seasonal + r.residual) - r.z) < 1e-6


def test_lttb_walk_matches_reference_python(spark):
    """ts_lttb_downsample's transition-table recursion must reproduce
    a plain sequential LTTB (Steinarsson's algorithm with the same
    bucket split and tie rule) on the fixture daily series — guards
    the shared-construction parity blindness (both engines run the
    same CTE text, so a formula bug would still hash-match)."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    daily = (
        orders.groupBy(
            F.expr(
                "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .orderBy("d")
        .collect()
    )
    pts = [(r.d, r.y) for r in daily]
    n = len(pts)
    assert n > 14, "fixture must have enough days"
    m = 12
    # sequential reference: bucket k holds interior ranks rn in [2, n-1]
    # with (rn-2)*m // (n-2) == k; anchor = next bucket's centroid
    # (last point for the final bucket); maximize |cross| / tie -> day.
    buckets: list[list[tuple[int, int]]] = [[] for _ in range(m)]
    for rn in range(2, n):
        buckets[(rn - 2) * m // (n - 2)].append(pts[rn - 1])
    sel = [pts[0]]
    for k in range(m):
        if not buckets[k]:
            break
        if k + 1 < m and buckets[k + 1]:
            nxt = buckets[k + 1]
            c = len(nxt)
            sx = sum(p[0] for p in nxt)
            sy = sum(p[1] for p in nxt)
        else:
            c, sx, sy = 1, pts[-1][0], pts[-1][1]
        px, py = sel[-1]
        best = max(
            buckets[k],
            key=lambda p: (
                abs((px * c - sx) * (p[1] - py) - (px - p[0]) * (sy - py * c)),
                -p[0],
            ),
        )
        sel.append(best)
    sel.append(pts[-1])
    got = QUERIES["ts_lttb_downsample"](spark, sf).collect()
    assert [(r.day, r.rev_cents) for r in got] == sel


def test_perceptron_fold_matches_reference_loop(spark):
    """ml_perceptron_int's recursive-CTE fold must reproduce a plain
    Python mistake-driven perceptron on the same 32-row sample —
    guards the shared-recursion parity blindness."""
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    row = QUERIES["ml_perceptron_int"](spark, sf).collect()[0]
    sample = spark.sql(
        "SELECT * FROM perceptron_sample ORDER BY i"
    ).collect()
    assert len(sample) == 32
    w = [0, 0, 0, 0]
    mistakes = 0
    for r in sample:
        margin = r.y * (w[0] + w[1] * r.x1 + w[2] * r.x2 + w[3] * r.x3)
        if margin <= 0:
            w[0] += r.y
            w[1] += r.y * r.x1
            w[2] += r.y * r.x2
            w[3] += r.y * r.x3
            mistakes += 1
    assert (
        row.n_seen,
        row.bias,
        row.w_qty,
        row.w_disc,
        row.w_tax,
        row.mistakes,
    ) == (32, w[0], w[1], w[2], w[3], mistakes)


def test_jonckheere_matches_bruteforce_pairs(spark):
    """stats_jonckheere's prefix-sum fold must equal the O(n²)
    pairwise definition J2 = Σ_{i<j groups} (2·#{y>x} + #{y=x}) on the
    sf0.001 fixture."""
    import itertools
    from collections import defaultdict

    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    order_map = {
        "AUTOMOBILE": 1,
        "BUILDING": 2,
        "FURNITURE": 3,
        "HOUSEHOLD": 4,
    }
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("v"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[order_map.get(r.c_mktsegment, 5)].append(r.v)
    j2 = 0
    for a, b in itertools.combinations(sorted(groups), 2):
        for x in groups[a]:
            for y in groups[b]:
                j2 += 2 if y > x else (1 if y == x else 0)
    got = QUERIES["stats_jonckheere"](spark, sf).collect()[0]
    assert got.j2 == j2
    n = sum(len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    assert got.e2x2 == n * n - sn2


def test_delong_se_matches_placement_reference(spark):
    """ml_eval_auc_delong must reproduce a plain placement-value
    DeLong computation (bisect + statistics.variance) on the fixture,
    and its AUC must equal ml_eval_auc's rank-identity AUC."""
    import bisect
    import math
    import statistics

    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["ml_eval_auc_delong"](spark, sf).collect()[0]
    rows = (
        load_table(spark, sf, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .select(
            (F.col("event_type") == "purchase").alias("pos"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
        )
        .collect()
    )
    pos = sorted(r.v for r in rows if r.pos)
    neg = sorted(r.v for r in rows if not r.pos)

    def placements(xs, others):
        return [
            (
                bisect.bisect_left(others, x)
                + (
                    bisect.bisect_right(others, x)
                    - bisect.bisect_left(others, x)
                )
                / 2
            )
            / len(others)
            for x in xs
        ]

    v10 = placements(pos, neg)
    v01 = [1 - p for p in placements(neg, pos)]
    auc = sum(v10) / len(v10)
    se = math.sqrt(
        statistics.variance(v10) / len(v10)
        + statistics.variance(v01) / len(v01)
    )
    assert abs(got.auc - auc) < 1e-12
    assert abs(got.se_delong - se) < 1e-12
    base = QUERIES["ml_eval_auc"](spark, sf).collect()[0]
    assert abs(got.auc - base.auc) < 1e-12


def test_wide_decimal_double_cast_hazard_and_remedy(spark):
    """Document + guard the cross-engine hazard: DuckDB's
    INT128->DOUBLE conversion is NOT correctly rounded (boundary value
    31173371832096364495 lands 1 ulp above Python/Spark), so a bare
    CAST(DECIMAL(38,0) AS DOUBLE) is only value-luck beyond 2^53.
    registry.wide_dbl's 3-limb split must be bit-identical on both
    engines across magnitudes and signs."""
    import duckdb

    from e2e_data_pipeline_spark.operators.registry import wide_dbl

    con = duckdb.connect()
    boundary = "31173371832096364495"
    naive = con.sql(
        f"SELECT CAST(CAST('{boundary}' AS DECIMAL(38,0)) AS DOUBLE)"
    ).fetchone()[0]
    assert naive != float(int(boundary)), (
        "DuckDB started rounding INT128 casts correctly — the bare "
        "cast may be safe again; revisit wide_dbl call sites"
    )
    vals = [
        "31173371832096364495",
        "-31173371832096364495",
        "123",
        "-9007199254740993123456789",
        "999999999999999999999999999999999",
        "0",
        "1152921504606846977",
    ]
    for v in vals:
        e = wide_dbl(f"CAST('{v}' AS DECIMAL(38,0))")
        d = con.sql(f"SELECT {e}").fetchone()[0]
        s = spark.sql(f"SELECT {e} AS x").collect()[0][0]
        assert d.hex() == s.hex(), (v, d.hex(), s.hex())


def test_serial_stats_match_python_reference(spark):
    """DW, Ljung-Box, variance-ratio, and Chow share one derivation
    across both engines (identical CTE text) — a formula bug would
    hash-match. Pin each against a plain Python computation on the
    same daily series."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"
    daily = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.expr(
                "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .orderBy("d")
        .collect()
    )
    ds = [r.d for r in daily]
    ys = [r.y for r in daily]
    n = len(ys)
    mean = sum(ys) / n

    # Durbin-Watson
    dw_num = sum((a - b) ** 2 for a, b in zip(ys[1:], ys[:-1]))
    dw_den = sum((y - mean) ** 2 for y in ys)
    got = QUERIES["stats_durbin_watson"](spark, sf).collect()[0]
    assert abs(got.dw_stat - dw_num / dw_den) < 1e-9

    # Ljung-Box (lags 1-3)
    c = [
        sum((ys[t] - mean) * (ys[t - k] - mean) for t in range(k, n))
        for k in range(4)
    ]
    q_lb = n * (n + 2) * sum(
        (c[k] / c[0]) ** 2 / (n - k) for k in (1, 2, 3)
    )
    got = QUERIES["stats_ljung_box"](spark, sf).collect()[0]
    assert abs(got.q_lb - q_lb) < 1e-6

    # Variance ratio q=5 (population variances of available lagged diffs)
    d1 = [b - a for a, b in zip(ys[:-1], ys[1:])]
    d5 = [ys[t] - ys[t - 5] for t in range(5, n)]

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    got = QUERIES["ts_variance_ratio"](spark, sf).collect()[0]
    assert abs(got.vr5 - pvar(d5) / (5 * pvar(d1))) < 1e-9

    # Chow break at epoch day 10227
    def rss(pairs):
        m = len(pairs)
        sx = sum(t for t, _ in pairs)
        sy = sum(v for _, v in pairs)
        sxx = sum(t * t for t, _ in pairs)
        sxy = sum(t * v for t, v in pairs)
        b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        a = (sy - b * sx) / m
        return sum((v - a - b * t) ** 2 for t, v in pairs)

    t0 = min(ds)
    pts = [(d - t0, y) for d, y in zip(ds, ys)]
    p1 = [(t, v) for (t, v), d in zip(pts, ds) if d < 10227]
    p2 = [(t, v) for (t, v), d in zip(pts, ds) if d >= 10227]
    rss_p, rss_1, rss_2 = rss(pts), rss(p1), rss(p2)
    f_ref = ((rss_p - rss_1 - rss_2) / 2) / ((rss_1 + rss_2) / (n - 4))
    got = QUERIES["stats_chow_break"](spark, sf).collect()[0]
    assert abs(got.chow_f - f_ref) / max(f_ref, 1e-9) < 1e-6


def test_pettitt_and_cmh_match_python_reference(spark):
    """Pettitt's rank identity and the CMH pivot both share one
    derivation across engines — pin against direct Python
    computations."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.catalog import load_table
    from e2e_data_pipeline_spark.operators import QUERIES

    sf = "/root/testdata/sf0.001"

    # Pettitt: brute-force U_t = sum_{i<=t, j>t} sign(x_j - x_i)
    daily = (
        load_table(spark, sf, "events")
        .groupBy(
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400").alias(
                "d"
            )
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y")
        )
        .orderBy("d")
        .collect()
    )
    ys = [r.y for r in daily]
    n = len(ys)
    best_k, best_day, best_u = -1, None, None
    for t in range(1, n):
        u = sum(
            (1 if ys[j] > ys[i] else (-1 if ys[j] < ys[i] else 0))
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k or (abs(u) == best_k and False):
            best_k, best_day, best_u = abs(u), daily[t - 1].d, u
    got = QUERIES["stats_pettitt_change"](spark, sf).collect()[0]
    assert (got.k_stat, got.change_day, got.u_at_change) == (
        best_k,
        best_day,
        best_u,
    )

    # CMH: recompute from the five stratum tables
    rows = (
        load_table(spark, sf, "orders")
        .join(
            load_table(spark, sf, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_orderpriority", "o_totalprice")
        .collect()
    )
    strata = {}
    for r in rows:
        a, r1, c1, nn = strata.get(r.c_mktsegment, (0, 0, 0, 0))
        exp = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        out = r.o_totalprice > 3000
        strata[r.c_mktsegment] = (
            a + (1 if exp and out else 0),
            r1 + (1 if exp else 0),
            c1 + (1 if out else 0),
            nn + 1,
        )
    dev = sum(a - r1 * c1 / nn for a, r1, c1, nn in strata.values())
    var = sum(
        r1 * (nn - r1) * c1 * (nn - c1) / (nn * nn * (nn - 1))
        for a, r1, c1, nn in strata.values()
    )
    got = QUERIES["stats_cmh"](spark, sf).collect()[0]
    assert abs(got.dev - dev) < 1e-9
    assert abs(got.var_sum - var) < 1e-9
    assert abs(got.cmh_stat - dev * dev / var) < 1e-9


def test_log_histogram_quantiles_bound_holds_vs_python(spark):
    """agg_log_histogram_quantiles shares its derivation with the
    oracle (identical-expression rule) — replay the truth side in
    plain Python and assert the sketch's bucket really contains the
    true discrete quantile (bound_holds must be 1 on real data, and
    the true quantile must equal the Python reference)."""
    import math

    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    rows = {
        r["q_pct"]: r
        for r in QUERIES["agg_log_histogram_quantiles"](
            spark, SF_SMALL
        ).collect()
    }
    cents = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    )
    n = len(cents)
    for q in (50, 95, 99):
        r = rows[q]
        true_q = cents[math.ceil(q * n / 100) - 1]
        assert r["true_q_cents"] == true_q, (q, r, true_q)
        assert r["est_lo_cents"] <= true_q <= r["est_hi_cents"], (q, r)
        assert r["bound_holds"] == 1
        assert r["n_total"] == n


def test_luhn_checksum_matches_textbook_python(spark):
    """fn_luhn_checksum's digit surgery is shared Spark↔oracle text —
    pin it against the textbook Luhn algorithm in Python: every
    minted number must validate, every corrupted one must not, and
    the per-verdict custkey sums must match a full replay."""
    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    def luhn_ok(num: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(num)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    got = {
        r["is_valid"]: (r["n_accounts"], r["custkey_sum"])
        for r in QUERIES["fn_luhn_checksum"](spark, SF_SMALL).collect()
    }
    sums = {0: [0, 0], 1: [0, 0]}
    for r in spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect():
        k = r["c_custkey"]
        base = str((k * 37) % 10_000_000_000).zfill(10)
        # mint the check digit the textbook way
        check = next(d for d in range(10) if luhn_ok(base + str(d)))
        acct = base + str(check)
        assert luhn_ok(acct)
        if k % 13 == 0:
            acct = str((int(acct[0]) + 5) % 10) + acct[1:]
        v = 1 if luhn_ok(acct) else 0
        if k % 13 == 0:
            assert v == 0, "corruption must always be caught"
        sums[v][0] += 1
        sums[v][1] += k
    expect = {v: tuple(sums[v]) for v in sums if sums[v][0]}
    assert got == expect


def test_m4_downsample_matches_python_replay(spark):
    """ts_m4_downsample shares its bucketing with the oracle — replay
    M4 in Python (min/max/first/last per pixel over the deterministic
    (sec, event_id) order) and compare every pixel exactly."""
    from collections import defaultdict

    from e2e_data_pipeline_spark.operators import QUERIES
    from tests.conftest import SF_SMALL

    got = {
        r["pixel"]: (
            r["n_pts"], r["y_min"], r["y_max"], r["y_first"],
            r["y_last"], r["t_min"], r["t_max"],
        )
        for r in QUERIES["ts_m4_downsample"](spark, SF_SMALL).collect()
    }
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "ts", "event_id", "value"
    ).collect()
    pts = []
    for r in rows:
        sec = int(r["ts"].timestamp())  # UTC session ⇒ epoch truncation
        cents = int(round((r["value"] or 0.0) * 100))
        pts.append((sec, r["event_id"], cents))
    lo = min(p[0] for p in pts)
    hi = max(p[0] for p in pts)
    byp = defaultdict(list)
    for sec, eid, cents in pts:
        byp[((sec - lo) * 400) // (hi - lo + 1)].append((sec, eid, cents))
    expect = {}
    for px, ps in byp.items():
        ps.sort()
        expect[px] = (
            len(ps),
            min(c for _, _, c in ps),
            max(c for _, _, c in ps),
            ps[0][2],
            ps[-1][2],
            ps[0][0],
            max(s for s, _, _ in ps),
        )
    assert got == expect
