"""Domain-mixture sampling: re-weight a multi-source corpus to target
proportions (SURVEY.md 2b extension surface). Not present in the
reference (batch BI pipeline); standard pretraining practice -- The
Pile / DoReMi style domain weights, where each source contributes a
chosen fraction of the training mix.

Two selection kernels, both deterministic and reshuffle-stable (the
repo's salted md5 hash, never ``rand()``):

- ``exact=False`` (default, the 100 TB path): per-domain hash
  THRESHOLD via ``sampling.stratified_sample`` -- keep a doc iff
  salted_hash(id) < f_d * 2^32. Scan-shaped: a broadcast of k domain
  fractions onto the corpus, no shuffle at all; realized counts are
  binomial around the target (relative error ~1/sqrt(c_d), negligible
  at training scale). The hash is id-only on purpose: within a domain
  the draw is uniform (so shares track targets regardless of how ids
  collide across domains), and raising a domain's weight grows its
  kept set monotonically -- a re-weighted mixture never discards
  previously selected docs.
- ``exact=True``: per-domain rank by hash (row_number window), take
  exactly its largest-remainder share of ``total``. Exact counts, but
  each domain is one window partition = one task's sort -- fine for
  dim-sized domains, wrong for a 100 TB domain; that is why it is not
  the default.

Upsampling (small high-quality domains repeated for multiple epochs)
is explicit: integer replicas materialize as an ``epoch`` column via
``explode(sequence(...))`` and the fractional remainder is an
independent salted draw, so epoch e of a doc is kept independently of
epoch e' and reruns agree bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.sampling import (
    HASH_SPACE,
    salted_hash,
    stratified_sample,
)

# mixtures are dim-sized by contract: the per-domain plan (counts,
# fractions, replicas) is driver-resident
MAX_DOMAINS = 10_000


def domain_profile(docs: DataFrame, domain_col: str = "source") -> DataFrame:
    """(domain, n_docs, share) -- the observed mixture, one aggregate."""
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count("*").alias("n_docs"))
        .withColumn("share", F.round(F.col("n_docs") / total, 6))
    )


def _mixture_plan(
    counts: dict[str, int],
    weights: dict[str, float],
    total: int | None,
    allow_upsample: bool,
) -> tuple[dict[str, float], int]:
    """(per-domain expected replication factor r_d = target_d / n_d,
    resolved integer total)."""
    unknown = set(weights) - set(counts)
    if unknown:
        raise ValueError(f"weights name absent domains: {sorted(unknown)}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {d: w / wsum for d, w in weights.items() if w > 0}
    # largest total where no domain needs more docs than it has
    feasible = min(counts[d] / w for d, w in norm.items())
    if total is None:
        total = math.floor(feasible)
    if total > feasible and not allow_upsample:
        raise ValueError(
            f"total={total} needs upsampling (downsample-only cap is "
            f"{math.floor(feasible)}); pass allow_upsample=True"
        )
    rates = {d: (w * total) / counts[d] for d, w in norm.items()}
    if total <= feasible:
        # mathematically every rate <= 1 here; float noise can leave one
        # at 1.0000000000000002, flipping callers into the upsample path
        rates = {d: min(r, 1.0) for d, r in rates.items()}
    return rates, total


def _apportion(targets: dict[str, float], total: int) -> dict[str, int]:
    """Integer takes summing to ``total``: floor of each domain's real
    share, then largest-remainder (ties by name) for the leftovers.
    Independent ``round()`` would miss the total (round-half-even:
    two 12.5 shares -> 24 of a requested 25)."""
    takes = {d: math.floor(t) for d, t in targets.items()}
    leftover = total - sum(takes.values())
    by_remainder = sorted(
        targets, key=lambda d: (takes[d] - targets[d], d)  # most-negative frac first
    )
    for d in by_remainder[:leftover]:
        takes[d] += 1
    return takes


def sample_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    total: int | None = None,
    allow_upsample: bool = False,
    exact: bool = False,
    salt: str = "mixture",
) -> DataFrame:
    """Sample ``docs`` so domains appear in ``weights`` proportions.

    Domains absent from ``weights`` (or weighted 0) are dropped.
    ``total`` defaults to the largest downsample-only mix; with
    ``allow_upsample=True`` larger totals replicate small domains and
    the output gains an ``epoch`` column (0-based replica index).
    """
    counts = {
        r[domain_col]: r["count"]
        for r in docs.groupBy(domain_col).count().limit(MAX_DOMAINS + 1).collect()
    }
    if len(counts) > MAX_DOMAINS:
        raise ValueError(f"more than {MAX_DOMAINS} domains; not a mixture column")
    plan, grand = _mixture_plan(counts, weights, total, allow_upsample)

    dom = F.col(domain_col)
    in_mix = docs.filter(dom.isin(list(plan)))

    if exact:
        if any(r > 1 for r in plan.values()):
            raise ValueError("exact=True supports downsample-only mixtures")
        takes = _apportion({d: r * counts[d] for d, r in plan.items()}, grand)
        take = F.create_map(
            *[x for d, n in takes.items() for x in (F.lit(d), F.lit(n))]
        )
        # Per-domain rank by (hash, id) via the BUCKETED exact-rank plan
        # (robust.global_rank_bucketed's construction, inlined per
        # domain; r9): a plain per-domain row_number window sorts an
        # entire domain inside one task -- a 10^9-doc domain is a
        # single-task scale ceiling. Hash-prefix buckets are a PREFIX of
        # the (hash, id) total order, so rank = (running count of the
        # domain's earlier buckets) + (row_number inside the (domain,
        # bucket) partition): the offset window runs over the <=
        # domains x n_buckets COUNT frame and the row window over
        # domain/n_buckets-sized partitions. Same total order, same
        # selected rows as the naive window (pinned in
        # tests/test_mixing.py).
        n_buckets = 1024
        width = HASH_SPACE // n_buckets
        h = salted_hash(F.col(id_col), salt)
        with_b = in_mix.withColumn("__h", h).withColumn(
            "__b", F.floor(F.col("__h") / F.lit(width)).cast("int")
        )
        bkt_counts = with_b.groupBy(dom.alias("__d"), "__b").agg(
            F.count("*").alias("__c")
        )
        w_off = (
            Window.partitionBy("__d")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # no broadcast hint: the offset frame is domains x n_buckets
        # rows (up to MAX_DOMAINS x 1024); AQE broadcasts it when small
        offsets = bkt_counts.select(
            "__d",
            F.col("__b").alias("__ob"),
            F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        )
        w_in = Window.partitionBy(dom, "__b").orderBy("__h", F.col(id_col))
        return (
            with_b.join(
                offsets,
                (dom == F.col("__d")) & (F.col("__b") == F.col("__ob")),
            )
            .withColumn("__rk", F.col("__off") + F.row_number().over(w_in))
            .filter(F.col("__rk") <= take[dom])
            .drop("__rk", "__h", "__b", "__d", "__ob", "__off")
        )

    if all(r <= 1 for r in plan.values()):
        # pure downsample: no epoch column, one scan-shaped filter --
        # the same kernel as every other hash sample in the repo.
        # NB the raw rate, not its fractional part: r == 1.0 must keep
        # every doc (threshold 2^32 is always true), not frac == 0.
        return stratified_sample(
            in_mix, 0.0, id_col=id_col, strata_col=domain_col,
            fractions=plan, salt=salt,
        )
    whole = F.create_map(
        *[x for d, r in plan.items() for x in (F.lit(d), F.lit(int(r)))]
    )
    frac = F.create_map(
        *[x for d, r in plan.items() for x in (F.lit(d), F.lit(r - int(r)))]
    )
    # epochs 0..whole-1 are full replicas; epoch `whole` keeps the
    # fractional remainder via an epoch-salted independent draw.
    # Epoch 0 draws on the ID-ONLY hash -- the exact input and the
    # exact truncated threshold of the pure-downsample kernel
    # (stratified_sample) -- so the module's monotonicity guarantee
    # holds ACROSS the path boundary: re-weighting a rate from 0.25 up
    # to 0.3 keeps every previously selected doc instead of redrawing
    # ~all of them from an independent id:0 hash. Epochs >= 1 stay
    # independent per-epoch draws.
    epochs = F.sequence(F.lit(0), whole[dom])
    out = in_mix.withColumn("epoch", F.explode(epochs))
    frac_h = salted_hash(
        F.when(F.col("epoch") == 0, F.col(id_col).cast("string")).otherwise(
            F.concat_ws(":", F.col(id_col), F.col("epoch"))
        ),
        salt,
    )
    thresh = (frac[dom] * F.lit(float(HASH_SPACE))).cast("bigint")
    return out.filter((F.col("epoch") < whole[dom]) | (frac_h < thresh))
