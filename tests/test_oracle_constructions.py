"""Property sweeps for the r9 UNROLLED-ORACLE constructions, run in
DuckDB + pure python only (no Spark): the catalog gate proves each
oracle on the fixed test tables; these prove the CONSTRUCTIONS -- the
recursive-CTE BFD state machine and the unrolled exact-integer Lloyd
chain -- against from-scratch python references on arbitrary random
inputs, so a boundary case the synthetic tables never hit (exact
best-fit ties, oversize-vs-fit interleavings, empty clusters, argmin
ties) still has coverage."""

from __future__ import annotations

import hashlib
import math
from bisect import bisect_left, insort

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


# ---- packing: recursive-CTE BFD vs python best-fit-decreasing ----------


def _py_bfd(rows: list[tuple[int, int]], budget: int, n_shards: int = 64):
    """From-scratch reference of operators/packing.py pack_sequences:
    returns {doc_id: (shard, seq_id, seq_pos, oversize)}."""
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n_tokens in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        shards.setdefault(h % n_shards, []).append((doc_id, n_tokens))
    out = {}
    for shard_id, docs in shards.items():
        docs = sorted(docs, key=lambda t: (-t[1], t[0]))
        n_bins = 0
        fill: list[int] = []
        open_bins: list[tuple[int, int]] = []
        for doc_id, ln in docs:
            if ln > budget:
                out[doc_id] = (shard_id, (shard_id << 32) | n_bins, 0, True)
                fill.append(1)
                n_bins += 1
                continue
            i = bisect_left(open_bins, (ln, -1))
            if i < len(open_bins):
                room, b = open_bins.pop(i)
            else:
                room, b = budget, n_bins
                fill.append(0)
                n_bins += 1
            out[doc_id] = (shard_id, (shard_id << 32) | b, fill[b], False)
            fill[b] += 1
            if room - ln > 0:
                insort(open_bins, (room - ln, b))
    return out


@settings(max_examples=20, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=9),
)
def test_packing_recursive_cte_matches_python_bfd(lens, budget):
    """The encoded-bigint recursive CTE must replay BFD exactly on
    arbitrary (length, budget) instances -- tiny budgets force dense
    best-fit ties, zero-length docs, and oversize interleavings the
    documents table never produces."""
    from taxi_data_pipeline_pset2_spark.queries.extensions import (
        _packing_oracle,
    )

    rows = [(i + 1, ln) for i, ln in enumerate(lens)]
    # synthesize text with exactly n_tokens whitespace tokens; 0 tokens
    # is impossible via split (min 1), so shift all lengths up by 1 --
    # the CTE and the reference both see len+1
    docs = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": ["w " * r[1] + "w" for r in rows]}
    )
    con = duckdb.connect()
    con.register("documents", docs)
    got = {
        r[0]: (r[1], r[2], r[3], bool(r[5]))
        for r in con.execute(_packing_oracle(budget)).fetchall()
    }
    con.close()
    ref = _py_bfd([(i, ln + 1) for i, ln in rows], budget)
    assert set(got) == set(ref)
    for doc_id, (shard, seq, pos, over) in ref.items():
        g = got[doc_id]
        assert g == (shard, seq, pos, over), (
            f"doc {doc_id}: CTE {g} != BFD {(shard, seq, pos, over)}"
        )


# ---- k-means: unrolled CTE chain vs python exact-integer Lloyd ---------


def _py_int_lloyd(vecs: dict[int, list[int]], k: int, n_iter: int):
    """From-scratch exact-integer Lloyd reference (same update rule as
    operators/clustering.py): returns {vec_id: (cluster, dist6)}."""
    init_ids = sorted(vecs)[:k]
    cents = [list(vecs[i]) for i in init_ids]

    def argmin(v):
        d2s = [
            sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents
        ]
        m = min(d2s)
        return d2s.index(m), m

    for _ in range(n_iter):
        assign = {i: argmin(v)[0] for i, v in vecs.items()}
        for c_idx in range(len(cents)):
            members = [vecs[i] for i, a in assign.items() if a == c_idx]
            if not members:
                continue
            n = len(members)
            cents[c_idx] = [
                (2 * sum(col) + n) // (2 * n) for col in zip(*members)
            ]
    out = {}
    for i, v in vecs.items():
        c, d2 = argmin(v)
        out[i] = (c, round(math.sqrt(d2) / 1e6, 6))
    return out


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
        ),
        min_size=4,
        max_size=25,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_kmeans_unrolled_cte_matches_python_lloyd(data, k):
    """The unrolled assign/update CTE chain must replay exact-integer
    Lloyd on arbitrary tiny instances: coarse integer coordinates force
    exact argmin TIES (pinning the lowest-cluster break in SQL) and
    empty clusters (pinning the keep-previous-centroid branch)."""
    from taxi_data_pipeline_pset2_spark.queries.similarity import (
        _kmeans_oracle,
    )

    k = min(k, len(data))
    # grid coordinates in iv units (1e-6 grid x small ints)
    vecs = {i + 1: [x * 1_000_000 for x in row] for i, row in enumerate(data)}
    emb = pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [[x / 1_000_000 for x in v] for v in vecs.values()],
            "label": [0] * len(vecs),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(_kmeans_oracle(k=k, n_iter=4, dim=3)).fetchall()
    }
    con.close()
    ref = _py_int_lloyd(vecs, k, 4)
    assert set(got) == set(ref)
    for vid, (c, d) in ref.items():
        assert got[vid][0] == c, f"vec {vid}: cluster {got[vid][0]} != {c}"
        assert abs(got[vid][1] - d) < 2e-6, vid
