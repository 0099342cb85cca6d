"""Blocked fuzzy matching: DuckDB-oracle equality, planted-typo recall,
multi-pass blocking behavior, and cluster resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.fuzzy import (
    fuzzy_dedup,
    fuzzy_pairs,
    fuzzy_pairs_multi,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

from .oracle_utils import compare_frames, duckdb_connection

PAIRS_ORACLE = """
WITH n AS (
    SELECT c_custkey AS id,
           regexp_replace(lower(trim(c_name)), '\\s+', ' ', 'g') AS s
    FROM customer),
p AS (
    SELECT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
    FROM n a JOIN n b
      ON substr(a.s, 1, 12) = substr(b.s, 1, 12) AND a.id < b.id
    WHERE abs(len(a.s) - len(b.s)) <= 1)
SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS INT) AS dist
FROM p WHERE levenshtein(sa, sb) <= 1
"""


def test_fuzzy_pairs_match_duckdb_oracle(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    got = fuzzy_pairs(
        cust, "c_name", "c_custkey", max_distance=1, block_len=12
    ).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(PAIRS_ORACLE).df()
    assert compare_frames(got, want) == []
    assert len(got) > 0, "customer names differing by one digit must pair"


def test_planted_typo_found_and_resolved(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    first = cust.orderBy("c_custkey").limit(1).collect()[0]
    # typo in the LAST character -> prefix block still catches it
    typo = first.c_name[:-1] + ("X" if first.c_name[-1] != "X" else "Y")
    planted = spark.createDataFrame(
        [(9_000_000, typo)], "c_custkey long, c_name string"
    )
    df = cust.unionByName(planted)
    pairs = fuzzy_pairs(df, "c_name", "c_custkey", max_distance=1, block_len=8)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (first.c_custkey, 9_000_000) in found

    kept = fuzzy_dedup(df, "c_name", "c_custkey", max_distance=1, block_len=8)
    kept_ids = {r.c_custkey for r in kept.select("c_custkey").collect()}
    # min-id survivor: the original stays, the planted typo is dropped
    assert first.c_custkey in kept_ids
    assert 9_000_000 not in kept_ids


def test_multi_pass_blocking_catches_prefix_typos(spark):
    # a typo in the FIRST character escapes prefix blocking but not
    # suffix blocking; multi-pass must find it
    df = spark.createDataFrame(
        [(1, "customer alpha one"), (2, "Xustomer alpha one"), (3, "unrelated row")],
        "id long, name string",
    )
    single = fuzzy_pairs(df, "name", "id", max_distance=1, block_len=4)
    assert single.count() == 0
    multi = fuzzy_pairs_multi(df, "name", "id", max_distance=1, block_len=4)
    found = {(r.id_a, r.id_b, r.dist) for r in multi.collect()}
    assert found == {(1, 2, 1)}


def test_length_prune_is_safe(spark):
    # deletion typo changes length by 1; must survive the prune at d=1
    df = spark.createDataFrame(
        [(1, "shared prefix abcdef"), (2, "shared prefix abcde")],
        "id long, name string",
    )
    pairs = fuzzy_pairs(df, "name", "id", max_distance=1, block_len=8)
    rows = pairs.collect()
    assert len(rows) == 1 and rows[0].dist == 1


def test_jaro_winkler_reference_vectors_and_duckdb_agreement(spark):
    import duckdb
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.fuzzy import (
        _jaro_winkler_py,
        jaro_winkler_pairs,
    )

    # textbook vectors
    assert _jaro_winkler_py("martha", "marhta") == pytest.approx(0.9611111111, abs=1e-9)
    assert _jaro_winkler_py("dixon", "dicksonx") == pytest.approx(0.8133333333, abs=1e-9)
    assert _jaro_winkler_py("abc", "abc") == 1.0
    assert _jaro_winkler_py("", "abc") == 0.0
    # sub-threshold jaro gets NO winkler boost (0.7 cutoff)
    assert _jaro_winkler_py("aa", "aeb") == pytest.approx(0.6111111111, abs=1e-9)
    # DuckDB bit-agreement on a deterministic sweep (the oracle contract)
    import random
    import string

    rng = random.Random(3)
    for _ in range(300):
        a = "".join(rng.choices(string.ascii_lowercase[:5], k=rng.randint(0, 9)))
        b = "".join(rng.choices(string.ascii_lowercase[:5], k=rng.randint(0, 9)))
        want = duckdb.sql(
            f"select jaro_winkler_similarity('{a}','{b}')"
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12), (a, b)

    # operator wiring: blocked pairs over a toy frame
    df = spark.createDataFrame(
        [(1, "martha"), (2, "marhta"), (3, "marcus"), (4, "zeta")],
        "id long, name string",
    )
    out = {
        (r.id_a, r.id_b): r.jw
        for r in jaro_winkler_pairs(df, "name", "id", threshold=0.9, block_len=2).collect()
    }
    assert out[(1, 2)] == pytest.approx(0.961111, abs=1e-6)
    assert (1, 4) not in out  # different block never compared
    assert all(v >= 0.9 for v in out.values())


def test_phonetic_pairs_blocks_by_soundex(spark):
    from taxi_data_pipeline_pset2_spark.operators.fuzzy import phonetic_pairs

    df = spark.createDataFrame(
        [
            (1, "smith"),
            (2, "smyth"),     # S530 == S530, lev 1
            (3, "schmidt"),   # S530 too, lev(smith, schmidt)=3 > 2
            (4, "jones"),     # different block
            (5, "jonas"),     # J520 == J520? jones=J520 jonas=J520, lev 1
        ],
        "id long, name string",
    )
    out = {
        (r.id_a, r.id_b): r.dist
        for r in phonetic_pairs(df, "name", "id", max_distance=2).collect()
    }
    assert out[(1, 2)] == 1   # smith/smyth pair despite no shared prefix-4
    assert out[(4, 5)] == 1
    assert (1, 3) not in out  # same block but over the distance cap
    assert (1, 4) not in out and (2, 5) not in out  # cross-block never pairs
    # python soundex reference agrees with Spark's block keys
    def soundex(w):
        codes = {**{c: "1" for c in "bfpv"}, **{c: "2" for c in "cgjkqsxz"},
                 **{c: "3" for c in "dt"}, "l": "4", **{c: "5" for c in "mn"},
                 "r": "6"}
        w = w.lower()
        out_ = w[0].upper()
        prev = codes.get(w[0], "")
        for ch in w[1:]:
            c = codes.get(ch, "")
            if c and c != prev:
                out_ += c
            if ch not in "hw":  # h/w do not reset the previous code
                prev = c if c else ("" if ch in "aeiouy" else prev)
        return (out_ + "000")[:4]

    from pyspark.sql import functions as F

    got = {r.name: r.sdx for r in df.select("name", F.soundex("name").alias("sdx")).collect()}
    for name, sdx in got.items():
        assert sdx == soundex(name), name


def _brute_lev_pairs(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int]]:
    """Python reference: all normalized pairs within distance d."""
    import re

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    norm = [(i, re.sub(r"\s+", " ", s.strip().lower())) for i, s in rows]
    out = set()
    for x in range(len(norm)):
        for y in range(x + 1, len(norm)):
            (ia, sa), (ib, sb) = norm[x], norm[y]
            if ia > ib:
                ia, ib, sa, sb = ib, ia, sb, sa
            if lev(sa, sb) <= d:
                out.add((ia, ib))
    return out


def test_exhaustive_pairs_match_python_reference(spark):
    from taxi_data_pipeline_pset2_spark.operators.fuzzy import (
        exhaustive_levenshtein_pairs,
    )

    rows = [
        (1, "acme corp"),
        (2, "acme corpx"),   # 1 insertion from 1
        (3, "acme  CORP "),  # normalizes equal to 1 (distance 0)
        (4, "zenith ltd"),
        (5, "zenth ltd"),    # 1 deletion from 4
        (6, "completely different"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b)
        for r in exhaustive_levenshtein_pairs(df, "name", "id").collect()
    }
    assert got == _brute_lev_pairs(rows, 1)
    assert (1, 2) in got and (1, 3) in got and (4, 5) in got


def test_exhaustive_pairs_cap_raises_in_plan(spark):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.fuzzy import (
        exhaustive_levenshtein_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"name {i}") for i in range(10)], ["id", "name"]
    )
    with pytest.raises(Exception, match="max_rows"):
        exhaustive_levenshtein_pairs(df, "name", "id", max_rows=5).collect()


def test_blocking_recall_audit_planted_geometry(spark):
    """A 20-char name with a single mid-string edit (inside BOTH 8-char
    affixes) is missed by two-pass blocking; an edit in the last chars
    (prefix intact) is found -- the audit must measure exactly that."""
    from taxi_data_pipeline_pset2_spark.operators.fuzzy import (
        exhaustive_levenshtein_pairs,
        fuzzy_pairs_multi,
    )

    rows = [
        (1, "aaaabbbbccXddddeeee"),
        (2, "aaaabbbbccYddddeeee"),  # edit at char 11: inside both affixes -> missed
        (3, "ppppqqqqrrrrssssttX"),
        (4, "ppppqqqqrrrrssssttY"),  # edit at char 19: prefix-16 intact -> found
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    truth = {
        (r.id_a, r.id_b)
        for r in exhaustive_levenshtein_pairs(df, "name", "id").collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs_multi(
            df, "name", "id", max_distance=1, block_len=16
        ).collect()
    }
    assert truth == {(1, 2), (3, 4)}
    assert found == {(3, 4)}  # recall exactly 1/2 on this geometry
    assert found <= truth
