"""Sequence packing: greedy bin-packing of documents into fixed
token-budget training sequences (SURVEY.md 2b extension surface -- the
step between a curated corpus and a pretraining dataloader).

Distribution model: packing is a local decision INSIDE a hash shard.
Docs are hash-sharded by id (reshuffle-stable, like every id-derived
operator in this repo), each shard packs independently with best-fit-
decreasing via ``applyInPandas`` (the sanctioned Arrow-batched path for
genuinely imperative per-group logic), and sequence ids are globally
unique by construction (shard << 32 | local). One shuffle total -- the
groupBy on the shard key -- regardless of corpus size; shard count, not
corpus size, bounds the per-task working set.

BFD inside a shard carries the same 11/9-OPT + 6/9 guarantee family as
FFD, and the bisect-maintained (room, bin) list makes placement
O(log bins) per doc -- O(n log n) per shard, so a million-doc shard is
seconds of Python, not hours of linear bin scans. Sharding costs a
little packing efficiency at the boundaries in exchange for linear
scale-out, the standard trade.
"""

from __future__ import annotations

from bisect import bisect_left, insort

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import stable_hash64


def pack_sequences(
    docs: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    n_shards: int = 64,
) -> DataFrame:
    """Assign every doc to a (seq_id, seq_pos) such that each sequence's
    token sum fits ``token_budget``.

    Returns (id, shard, seq_id, seq_pos, len, oversize): ``oversize``
    docs (longer than the whole budget) get a dedicated sequence --
    never shared, not even with zero-token docs -- and are flagged for
    the caller to truncate/split downstream; packing never silently
    drops or cuts data. Deterministic: shard assignment is the
    salted-hash of the id, in-shard order is (len DESC, id ASC), ties
    between equally-fitting bins break toward the oldest bin.
    """
    import pandas as pd

    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    shard = F.pmod(stable_hash64(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )
    # the id passes through with ITS OWN type: the repo-wide id
    # convention includes string/UUID ids, and a cast("long") here
    # would throw under ANSI (or silently NULL every id without it),
    # destroying the doc -> sequence assignment
    id_type = docs.schema[id_col].dataType.simpleString()
    base = docs.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias(len_col),
    ).withColumn("shard", shard)
    out_schema = (
        f"{id_col} {id_type}, shard int, seq_id long, seq_pos int, "
        f"{len_col} long, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # validate the lengths INSIDE the kernel: a NULL length becomes
        # a float NaN whose comparisons are all False -- it would pop a
        # real open bin, fail to reinsert it (permanently lost
        # capacity, changing every later doc's placement) and then die
        # in the Arrow long conversion with an opaque error. "never
        # silently drops data" includes failing loudly on bad lengths.
        if pdf[len_col].isna().any() or (pdf[len_col] < 0).any():
            raise ValueError(
                f"pack_sequences: {len_col} must be non-null and >= 0"
            )
        pdf = pdf.sort_values([len_col, id_col], ascending=[False, True])
        shard_id = int(pdf["shard"].iloc[0])
        n_bins = 0
        bin_fill: list[int] = []  # next position per sequence
        # open shared bins as a bisect-sorted list of (room, bin_id);
        # oversize bins are never inserted, so nothing can join them
        open_bins: list[tuple[int, int]] = []
        seq_ids, seq_pos, oversize = [], [], []
        for ln in pdf[len_col].tolist():
            if ln > token_budget:
                bin_fill.append(1)
                seq_ids.append(n_bins)
                seq_pos.append(0)
                oversize.append(True)
                n_bins += 1
                continue
            # best fit: smallest room >= ln, ties to the oldest bin
            i = bisect_left(open_bins, (ln, -1))
            if i < len(open_bins):
                room, b = open_bins.pop(i)
            else:
                room, b = token_budget, n_bins
                bin_fill.append(0)
                n_bins += 1
            seq_ids.append(b)
            seq_pos.append(bin_fill[b])
            bin_fill[b] += 1
            if room - ln > 0:
                insort(open_bins, (room - ln, b))
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": shard_id,
                "seq_id": [(shard_id << 32) | s for s in seq_ids],
                "seq_pos": seq_pos,
                len_col: pdf[len_col].to_numpy(),
                "oversize": oversize,
            }
        )

    return base.groupBy("shard").applyInPandas(pack, schema=out_schema)
