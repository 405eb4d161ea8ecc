"""Registry-wide audit for the fixed-position-cap oracle class.

Round-7 verdict: ``text_bpe_step``'s oracle enumerated pair positions
via ``unnest(range(1, 40))`` while the Spark side walked the full
word — any token of length >= 41 silently diverged (the exact bug
class ADVICE r6 named for ``text_wordpiece_step``). The oracle is now
length-driven; these tests (a) prove the old oracle WOULD have failed
on a long-word fixture while the new one matches, and (b) sweep every
registered oracle for the class: a constant-bounded ``range()`` whose
variable is then truncated against a data-dependent ``length()`` /
``len()``.

Pinned-dimension constants (e.g. ``range(1, 65)`` over the 64-d
embedding, ``range(0, 256)`` HLL registers, bootstrap/permutation
resample counts) are NOT the hazard: they enumerate a fixed schema
dimension, not a capped view of variable-length data, and carry no
length filter.
"""

from __future__ import annotations

import math
import re

import duckdb
import pandas as pd
import pytest

from e2e_data_pipeline_spark.operators.registry import ORACLES
import e2e_data_pipeline_spark.operators  # noqa: F401  (populate registry)

SF_SMALL = "/root/testdata/sf0.001"

CONST_RANGE = re.compile(r"range\(\s*-?\d+\s*,\s*\d+\s*\)")
# range-var capped by a data-dependent length: `WHERE i <= length(...)`
CAP_FWD = re.compile(
    r"(?:WHERE|AND)\s+\w+\s*(?:<=|<)\s*(?:length|len)\s*\(", re.I
)
# reversed spelling: `length(...) - 1 >= i`
CAP_REV = re.compile(
    r"(?:length|len)\s*\([^)]*\)\s*(?:-\s*\d+\s*)?(?:>=|>)\s*\w+", re.I
)

# Keys allowed to combine a constant range with a length comparison,
# with the justification the auditor must re-check before extending.
WHITELIST: dict[str, str] = {}


def test_no_constant_range_capped_by_data_length():
    offenders = []
    for key, sql in ORACLES.items():
        if key in WHITELIST:
            continue
        if CONST_RANGE.search(sql) and (CAP_FWD.search(sql) or CAP_REV.search(sql)):
            offenders.append(key)
    assert not offenders, (
        "oracle(s) enumerate positions from a CONSTANT range but filter "
        f"against a data-dependent length — the text_bpe_step bug class: {offenders}"
    )


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return v

    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(map(repr, r)))
    return rows


# The pre-fix oracle text, verbatim position cap included.
OLD_BPE_ORACLE = r"""
    WITH words AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2
        GROUP BY w
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair, SUM(wc) AS total
        FROM words, (SELECT unnest(range(1, 40)) AS i) ix
        WHERE i <= length(word) - 1
        GROUP BY 1
    ),
    ranked AS (
        SELECT pair, CAST(total AS BIGINT) AS weighted_count,
               CAST(row_number() OVER (ORDER BY total DESC, pair)
                    AS BIGINT) AS rnk
        FROM pairs
    ),
    top10 AS (SELECT * FROM ranked WHERE rnk <= 10),
    savings AS (
        SELECT t.pair, t.weighted_count, t.rnk,
               CAST(SUM(w.wc * (length(w.word)
                     - length(replace(w.word, t.pair, ''))) / 2)
                    AS BIGINT) AS merged_occurrences
        FROM top10 t CROSS JOIN words w
        GROUP BY t.pair, t.weighted_count, t.rnk
    )
    SELECT pair, weighted_count, rnk, merged_occurrences
    FROM savings ORDER BY rnk
"""


@pytest.fixture(scope="module")
def long_word_docs(spark, tmp_path_factory):
    """documents fixture containing a 45-char token — past the old
    oracle's 39-position cap — in the real documents schema."""
    root = tmp_path_factory.mktemp("bpe_longword")
    base = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pdf = base.limit(4).toPandas()
    long_word = "z" * 45  # 44 'zz' pairs; old oracle counted only 39
    pdf["text"] = [
        f"{long_word} the quick brown fox",
        "the lazy dog the end",
        f"{long_word} again with more zz text",
        "plain filler words here",
    ][: len(pdf)]
    spark.createDataFrame(pdf, schema=base.schema).write.mode(
        "overwrite"
    ).parquet(str(root / "documents.parquet"))
    return str(root)


def test_bpe_long_word_probe(spark, long_word_docs):
    from e2e_data_pipeline_spark.operators import QUERIES

    sdf = QUERIES["text_bpe_step"](spark, long_word_docs).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{long_word_docs}/documents.parquet/*.parquet')"
    )
    new_rows = _canon(con.execute(ORACLES["text_bpe_step"]).fetchdf())
    old_rows = _canon(con.execute(OLD_BPE_ORACLE).fetchdf())
    spark_rows = _canon(sdf)

    # the fixed oracle matches Spark exactly
    assert spark_rows == new_rows
    # and the pre-fix capped oracle provably diverges on this fixture
    assert old_rows != new_rows, (
        "long-word probe failed to distinguish the capped oracle — "
        "fixture no longer exercises positions beyond 39"
    )
