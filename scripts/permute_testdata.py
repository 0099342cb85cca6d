"""Data-variation axis for the catalog sweep (VERDICT r11 item #4).

All eight hostile-config sweep axes vary the SESSION against one fixed
synthetic corpus; none vary the DATA. A Spark/DuckDB hash that matches
only on one lucky corpus — tie-free ranks, a particular planted-dup
geometry, ids that happen to sort with their payloads — is exactly what
a config axis cannot catch. This script derives a permuted twin of a
testdata sf directory and writes it somewhere the sweep can point at:

    python scripts/permute_testdata.py --src /root/testdata/sf0.01 \
        --out /tmp/testdata_perm/sf0.01 --seed 12
    python scripts/sweep_catalog.py --sf /tmp/testdata_perm/sf0.01

Two seeded, deterministic transformations, both value-set preserving:

1. **Key re-assignment within each key domain.** For every surrogate
   key domain (custkey, suppkey, partkey, orderkey, doc_id, vec_id,
   event_id, user_id) the distinct values are bijectively shuffled
   among themselves and the map applied consistently to every column
   of the domain (o_custkey moves with c_custkey, l_orderkey with
   o_orderkey, ...). FK integrity, key ranges, density, and every
   non-key column are untouched — but which payload each id carries
   changes, so every id-based tiebreak, hash-split, min-id survivor
   rule, and id-ordered window now exercises a different order.
   Nation/region keys are left alone (their names are semantically
   tied to the keys; the big domains carry the tie-sensitivity risk).

2. **Row-order shuffle.** Each table is written in seeded-hash order,
   so any operator that silently depends on parquet row order diverges.

The texts, embeddings, timestamps, and prices are byte-identical —
planted duplicate geometry and value distributions survive, so a
mismatch on the twin corpus is a tie-sensitivity bug in an operator or
oracle, not a generator artifact.
"""

from __future__ import annotations

import argparse
import os

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# domain -> [(table, column), ...]; every column in a domain gets the
# SAME bijection so referential integrity is preserved exactly
DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=12)
    args = ap.parse_args()

    import duckdb

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{args.src}/{t}.parquet')"
        )

    # per-domain bijection: distinct values shuffled among themselves.
    # The shuffle key is a seeded hash of the value — deterministic,
    # and a different seed yields a different twin corpus.
    for dom, cols in DOMAINS.items():
        union = " UNION ".join(
            f"SELECT DISTINCT {c} AS k FROM {t}" for t, c in cols
        )
        con.execute(
            f"""
            CREATE TABLE map_{dom} AS
            SELECT a.k AS old_k, b.k AS new_k
            FROM (SELECT k, row_number() OVER (
                      ORDER BY hash(k + {args.seed}), k) AS rn
                  FROM ({union})) a
            JOIN (SELECT k, row_number() OVER (ORDER BY k) AS rn
                  FROM ({union})) b USING (rn)
            """
        )
        n, nd = con.execute(
            f"SELECT count(*), count(DISTINCT new_k) FROM map_{dom}"
        ).fetchone()
        assert n == nd, f"map_{dom} is not a bijection"

    remap: dict[tuple[str, str], str] = {
        (t, c): dom for dom, cols in DOMAINS.items() for t, c in cols
    }
    for t in TABLES:
        cols = [r[0] for r in con.execute(f"DESCRIBE {t}").fetchall()]
        select, joins = [], []
        for c in cols:
            dom = remap.get((t, c))
            if dom is None:
                select.append(f"{t}.{c} AS {c}")
            else:
                # The remap below is an INNER join against the bijection
                # map: a NULL key value would silently drop the row and
                # only the post-write row-count assert would notice --
                # after a partial twin corpus is already on disk
                # (ADVICE r12). Fail fast, before any output is written.
                n_null = con.execute(
                    f"SELECT count(*) FROM {t} WHERE {c} IS NULL"
                ).fetchone()[0]
                assert n_null == 0, (
                    f"{t}.{c}: {n_null} NULL key values; the inner-join "
                    "key remap would drop these rows"
                )
                select.append(f"m_{c}.new_k AS {c}")
                joins.append(
                    f"JOIN map_{dom} m_{c} ON m_{c}.old_k = {t}.{c}"
                )
        # embedding is FLOAT[] (not concat-able); the scalar columns are
        # plenty of entropy for a deterministic shuffle
        order = ", ".join(
            f"hash(concat({args.seed}, {t}.{c}))"
            for c in cols if c != "embedding"
        )
        con.execute(
            f"COPY (SELECT {', '.join(select)} FROM {t} {' '.join(joins)} "
            f"ORDER BY {order}) TO '{args.out}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n0 = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        n1 = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        assert n0 == n1, f"{t}: row count changed {n0} -> {n1}"
        print(f"{t}: {n1} rows permuted")
    print(f"twin corpus written to {args.out} (seed {args.seed})")


if __name__ == "__main__":
    main()
