

def test_business_days_formula_matches_brute_force():
    # The GREATEST/LEAST closed form must equal a literal day walk
    # (Monday=0 numbering, business days in [d0, d1)).
    def closed(d0, d1):
        dow0 = (d0 + 4) % 7
        span = d1 - d0
        rem = span % 7
        return (
            5 * (span // 7)
            + min(rem, max(0, 5 - dow0))
            + max(0, rem - (7 - dow0))
        )

    def brute(d0, d1):
        return sum(1 for d in range(d0, d1) if (d + 4) % 7 < 5)

    for d0 in range(9700, 9750):
        for span in range(0, 45):
            assert closed(d0, d0 + span) == brute(d0, d0 + span)


def test_soundex_classic_names_match_manual_twin(spark):
    """The fn_soundex_match oracle hand-builds American Soundex; pin
    both Spark's builtin and the manual DuckDB construction against
    the textbook values (h/w transparency, vowel adjacency breaks,
    duplicate collapse, padding)."""
    import duckdb

    names = {
        "robert": "R163",
        "rupert": "R163",
        "ashcraft": "A261",
        "ashcroft": "A261",
        "tymczak": "T522",
        "pfister": "P236",
        "honeyman": "H555",
        "washington": "W252",
        "lee": "L000",
        "gutierrez": "G362",
        "jackson": "J250",
        "wu": "W000",
        "hull": "H400",
    }
    got_spark = {
        r.w: r.s
        for r in spark.sql(
            "SELECT w, soundex(w) AS s FROM VALUES "
            + ", ".join(f"('{n}')" for n in names)
            + " AS t(w)"
        ).collect()
    }
    assert got_spark == names
    con = duckdb.connect()
    manual = """
    WITH clean AS (SELECT unnest([{vals}]) AS word),
    chars AS (
        SELECT word, unnest(string_split(word, '')) AS ch,
               unnest(range(1, length(word) + 1)) AS pos
        FROM clean
    ),
    kept AS (
        SELECT word, ch, pos,
               translate(ch, 'abcdefghijklmnopqrstuvwxyz',
                         '01230120022455012623010202') AS code
        FROM chars WHERE pos = 1 OR ch NOT IN ('h', 'w')
    ),
    collapsed AS (
        SELECT word, pos, code,
               lag(code) OVER (PARTITION BY word ORDER BY pos) AS prev_code
        FROM kept
    ),
    digits AS (
        SELECT word, pos, code FROM collapsed
        WHERE pos > 1 AND code <> '0'
              AND (prev_code IS NULL OR code <> prev_code)
    ),
    agg AS (
        SELECT c.word,
               upper(substr(c.word, 1, 1))
                 || COALESCE(string_agg(d.code, '' ORDER BY d.pos), '') AS raw
        FROM clean c LEFT JOIN digits d ON d.word = c.word GROUP BY c.word
    )
    SELECT word, substr(raw || '000', 1, 4) FROM agg
    """.format(vals=", ".join(f"'{n}'" for n in names))
    got_duck = dict(con.sql(manual).fetchall())
    assert got_duck == names
