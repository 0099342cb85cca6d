"""Deterministic sampling / dataset-split operators (SURVEY.md 2b
extension surface: what a large-scale training-data pipeline needs
around the corpus).

Not present in the reference (batch BI pipeline); standard practice for
pretraining-data curation. Everything here is HASH-derived, never
``rand()``:

- reshuffle-stable: the same row lands in the same split/sample on any
  cluster, any partitioning, any rerun -- a re-partitioned 100 TB corpus
  must not silently re-draw its validation set;
- engine-portable: the hash is the md5-prefix bigint used across this
  repo (``operators/dedup.py stable_hash64``), so DuckDB twins can
  reproduce splits bit-exactly (pinned in tests/test_sampling.py).

All pure DataFrame compositions: one narrow projection per operator, no
shuffle at all except ``top_n_by_hash``'s TakeOrdered merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import stable_hash64

HASH_SPACE = 1 << 32  # stable_hash64 range: [0, 2^32)


def salted_hash(col: Column, salt: str) -> Column:
    """Deterministic bigint in [0, 2^32) from (value, salt). Distinct
    salts give independent draws, so a split and a downstream sample
    don't correlate.

    NULL ids hash as the literal sentinel ``<null-id>``: without the
    coalesce, ``concat`` propagates NULL and every comparison against it
    is neither true nor false -- hash_split would dump ALL null-id rows
    into the fallback split while stratified_sample silently dropped
    them. With the sentinel, null-id rows are one deterministic cohort
    treated consistently by every hash-derived operator."""
    return stable_hash64(
        F.concat(
            F.coalesce(col.cast("string"), F.lit("<null-id>")), F.lit("|" + salt)
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test ...)
    by hash-bucketing its id: bucket = h(id) / 2^32 falls into the
    cumulative-weight interval of its split. Adds a ``split`` column.

    Weights must sum to ~1. Deterministic per (id, salt): append-only
    corpora keep historical rows' splits stable as new data arrives --
    the property a time-partitioned ingest needs so val examples never
    leak into train across backfills.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = salted_hash(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        bound = int(acc * HASH_SPACE)
        expr = (
            F.when(h < bound, F.lit(name))
            if expr is None
            else expr.when(h < bound, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def _with_group_id(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str,
    dst: str,
) -> DataFrame:
    """``df`` plus ``group_id``: the near-dup component minimum for
    rows in a pair, the row's own id otherwise. The single grouping
    rule leakage_safe_split and group_kfold share -- splits and CV
    folds must agree on group boundaries by construction."""
    from taxi_data_pipeline_pset2_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(pairs, src=src, dst=dst)
    return df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(
        "group_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Group-aware train/val/test split: hash-split by near-duplicate
    GROUP, not by document, so every member of a duplicate cluster lands
    in the same split. Plain per-id hash splitting quietly leaks -- a
    test document's near-copy trains the model and the eval score is
    fiction; this is the standard fix (split on the dedup-component
    key).

    ``pairs`` is any near-dup edge set (jaccard_pairs, minhash LSH
    verified pairs, semantic_pairs...). Documents in no pair form their
    own singleton group. Adds ``group_id`` (the component minimum, or
    the doc's own id) and ``split``.

    Plan: connected components over the PAIR set (dup-sized, not
    corpus-sized), one left join back to the corpus, then the same
    portable salted-hash interval assignment as ``hash_split`` -- so a
    given corpus + edge set + salt yields identical splits on any
    engine, and append-only corpora keep historical assignments stable."""
    grouped = _with_group_id(df, pairs, id_col, src, dst)
    return hash_split(grouped, id_col="group_id", weights=weights, salt=salt)


def group_kfold(
    df: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "fold-v1",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Group-aware k-fold assignment: ``fold`` in [0, k) keyed on the
    near-dup component, so cross-validation folds never see a held-out
    example's near-copy (the CV form of ``leakage_safe_split``; sklearn
    GroupKFold's purpose, hash-deterministic instead of size-balanced).
    Adds ``group_id`` and ``fold``."""
    if k < 2:
        raise ValueError("k must be >= 2")
    grouped = _with_group_id(df, pairs, id_col, src, dst)
    return grouped.withColumn(
        "fold",
        F.pmod(salted_hash(F.col("group_id"), salt), F.lit(k)).cast("int"),
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    embargo: str = "0 seconds",
    split_col: str = "split",
) -> DataFrame:
    """Time-based train/test split with an embargo gap: rows at or
    before ``train_end`` are 'train'; rows inside (train_end,
    train_end + embargo] are DROPPED (the leakage buffer -- with
    autocorrelated series, the first post-cutoff rows are near-copies
    of the last training rows, and windowed features computed near the
    boundary straddle it); later rows are 'test'. The standard temporal
    CV hygiene (de Prado's purged/embargoed split, simplified to one
    boundary).

    NULL timestamps are DROPPED with the embargo rows (both boundary
    comparisons are NULL, so the split column is NULL): an undated row
    can sit on either side of the cutoff, and guessing 'train' would
    leak any actually-post-cutoff rows into training. Same convention
    as the as-of joins (NULL timestamps match nothing).

    Pure projection + filter -- scan-shaped, and the timestamp
    predicate pushes down to pruned partitions on a time-partitioned
    table."""
    end = F.lit(train_end).cast("timestamp")
    cutoff = F.expr(f"TIMESTAMP '{train_end}' + INTERVAL {embargo}")
    out = df.withColumn(
        split_col,
        F.when(F.col(ts_col) <= end, F.lit("train")).when(
            F.col(ts_col) > cutoff, F.lit("test")
        ),
    )
    return out.filter(F.col(split_col).isNotNull())


def stratified_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    h(id) < fraction * 2^32, where the fraction may vary per stratum
    (e.g. upsample a rare language, downsample boilerplate-heavy
    sources). With no ``strata_col`` it is a plain uniform hash sample.

    Hash-threshold sampling composes monotonically: the 1% sample is a
    subset of the 10% sample under the same salt, so growing a data
    mixture never discards previously selected rows.
    """
    h = salted_hash(F.col(id_col), salt)
    if strata_col is None or not fractions:
        return df.filter(h < int(fraction * HASH_SPACE))
    frac_expr: Column = F.lit(fraction)
    for value, f in fractions.items():
        frac_expr = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac_expr)
    return df.filter(h < (frac_expr * F.lit(float(HASH_SPACE))).cast("bigint"))


def top_n_by_hash(
    df: DataFrame, n: int, id_col: str = "doc_id", salt: str = "topn-v1"
) -> DataFrame:
    """Exact-size deterministic pseudo-uniform sample without
    replacement: order by the salted hash, take n. Spark plans
    sort+limit as TakeOrdered (per-partition top-n, then a single merge
    of n*n_partitions candidate rows) -- no global sort, driver traffic
    bounded by n. The fixed-size counterpart to the fraction-based
    ``stratified_sample``."""
    h = salted_hash(F.col(id_col), salt)
    return df.withColumn("_h", h).orderBy("_h", id_col).limit(n).drop("_h")


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, n items,
    inclusion probability proportional to ``weight_col`` (Efraimidis &
    Spirakis 2006: key = u^(1/w) with u uniform from the salted hash;
    the top-n keys are the sample). Same contract as everything here:
    hash-derived, reshuffle-stable, engine-portable.

    Distributed shape: one narrow projection computes the key, then a
    TakeOrdered top-n merge (per-partition heaps + driver merge of n
    rows) -- no full sort, no shuffle of the corpus. n is driver-sized
    by contract, like ``top_n_by_hash``.

    Zero/negative weights are excluded (their inclusion probability is
    zero); ties on the key (measure-zero under distinct hashes) break by
    id for determinism.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    u = (salted_hash(F.col(id_col), salt) + 1).cast("double") / F.lit(
        float(HASH_SPACE + 1)
    )  # u in (0, 1] -- never exactly 0, so ln(u) is finite
    # key = u^(1/w) ranks equivalently to ln(u)/w (monotone transform);
    # use the log form for numeric stability at tiny weights
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), F.col(id_col))
        .limit(n)
        .drop("_wkey")
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    n_files: int | None = None,
) -> DataFrame:
    """Deterministic global training order for one epoch: every row gets
    a salted-hash order key (salt = the epoch number), the frame is
    range-partitioned and sorted by it. Writing the result yields
    ``n_files`` shards whose concatenation IS the epoch's order --
    different epochs draw independent permutations, the same epoch is
    bit-reproducible on any cluster/partitioning.

    One range shuffle (the unavoidable cost of a global permutation);
    no driver involvement, no rand(). The key column is dropped -- order
    is carried by the layout, exactly like ``clustered_write``."""
    n = int(
        n_files
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    key = salted_hash(F.col(id_col), f"epoch-{epoch}")
    return (
        df.withColumn("_ekey", key)
        .repartitionByRange(n, F.col("_ekey"), F.col(id_col))
        .sortWithinPartitions("_ekey", id_col)
        .drop("_ekey")
    )


def per_group_sample(
    df: DataFrame,
    n: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "group-sample-v1",
) -> DataFrame:
    """Deterministic n-per-group sample (balanced eval sets, per-domain
    spot checks): rank rows within each group by the salted hash (ties
    by id) and keep rank <= n. Groups smaller than n pass through whole.

    One shuffle on ``group_col`` (the row_number window); n is per-GROUP
    sized, not driver-sized, so the output scales with cardinality x n
    and never funnels through the driver. The hash ordering makes the
    draw uniform-per-group, reshuffle-stable, and engine-portable (the
    DuckDB twin reproduces it verbatim -- see the
    ``per_group_sample_counts`` catalog oracle).

    A skewed group key concentrates ONE task per giant group (window
    sort); for pathological skew pre-aggregate with ``top_n_by_hash``
    per partition or sample by threshold (`stratified_sample`) instead.
    """
    from pyspark.sql import Window

    h = salted_hash(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def select_quality_mass(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    p: float,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the highest-``score_col`` rows (ties by id) until the kept
    ``weight_col`` mass reaches fraction ``p`` of the group total -- the
    "best X% of the token mass" curation primitive (quality-ranked
    corpus truncation, data-constrained scaling recipes).

    The boundary row that CROSSES the p threshold is included, so every
    non-empty group keeps at least one row and the kept mass is the
    smallest prefix >= p * total. Exact decimal accumulation keeps the
    running and total sums order-independent, so the cut is
    deterministic and engine-portable.

    One shuffle (the per-group ordered window). A giant group serializes
    into one task's sort -- for corpus-scale single groups, pre-bucket
    by a hash prefix or use the threshold form (quantile of score via
    operators/robust.group_clip_bounds) instead.
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"need 0 < p <= 1, got {p}")
    from pyspark.sql import Window

    group_cols = group_cols or []
    # a NULL weight costs no mass (coalesce to 0): without it the filter
    # predicate goes NULL and the row silently vanishes regardless of
    # score, breaking the at-least-one-row contract (ADVICE r5). A
    # NEGATIVE weight would make the running prefix non-monotone (rows
    # far past the threshold re-qualifying), so it fails loudly.
    wdec = F.coalesce(
        F.when(
            F.col(weight_col) < 0,
            F.raise_error(
                F.lit("select_quality_mass: negative weight")
            ).cast("decimal(28,6)"),
        ).otherwise(F.col(weight_col).cast("decimal(28,6)")),
        F.lit(0).cast("decimal(28,6)"),
    )
    part = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    order = part.orderBy(F.desc_nulls_last(score_col), F.asc(id_col))
    running = F.sum(wdec).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(wdec).over(part)
    # keep while the PREVIOUS prefix is still short of p * total --
    # equivalently: running - w < p * total (boundary row included).
    # The threshold multiplies DECIMAL by DECIMAL (p via its shortest
    # decimal repr, the same literal the oracle writes): a double
    # product would round where the DuckDB twin computes exactly,
    # flipping boundary rows. rn == 1 keeps the documented
    # at-least-one-row guarantee even for an all-zero-mass group
    # (0 < 0 is false for every row otherwise).
    p_dec = F.lit(str(p)).cast("decimal(12,10)")
    return (
        df.withColumn("_run", running)
        .withColumn("_tot", total)
        .withColumn("_rn", F.row_number().over(order))
        .filter(
            ((F.col("_run") - wdec) < F.col("_tot") * p_dec)
            | (F.col("_rn") == 1)
        )
        .drop("_run", "_tot", "_rn")
    )


def inverse_frequency_weights(
    df: DataFrame,
    label_col: str,
    weight_col: str = "sample_weight",
) -> DataFrame:
    """Class-imbalance sample weights: weight = N / (k * n_class) --
    sklearn's 'balanced' heuristic -- attached per row, 6-dp. NULL
    labels are one legitimate class (NULL-safe grouping). One
    class-cardinality aggregate broadcast back onto the scan; weighted
    losses downstream see every class contribute equal total mass."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # ONE aggregate: the class-cardinality-sized count rows are
    # collected once and both the scalars and the broadcast weight
    # table derive from them (re-deriving the scalars via counts.agg
    # would recompute the full aggregate a second time)
    counts = (
        df.groupBy(F.col(label_col).alias("_lbl"))
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    if not counts:  # empty frame: keep the shape, weight NULL
        return df.withColumn(weight_col, F.lit(None).cast("double"))
    n_total = sum(r["_n"] for r in counts)
    k = len(counts)
    schema = StructType(
        [
            StructField("_lbl", df.schema[label_col].dataType),
            StructField(weight_col, DoubleType()),
        ]
    )
    # mirror the engine/SQL pipeline exactly: the same double division,
    # then HALF_UP at 6dp on the double's shortest decimal repr (what
    # Spark's F.round does via BigDecimal.valueOf) -- python's builtin
    # round is banker's and could disagree on .5e-7 boundaries
    from decimal import ROUND_HALF_UP, Decimal

    def _w(n: int) -> float:
        val = float(n_total) / (k * n)
        return float(
            Decimal(repr(val)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    w = df.sparkSession.createDataFrame(
        [(r["_lbl"], _w(r["_n"])) for r in counts], schema=schema
    )
    return df.join(
        F.broadcast(w), F.col(label_col).eqNullSafe(F.col("_lbl")), "left"
    ).drop("_lbl")


def rolling_origin_folds(
    df: DataFrame,
    ts_col: str,
    boundaries: list[str],
    embargo: str = "0 seconds",
) -> DataFrame:
    """Expanding-window (rolling-origin) backtest folds: for each
    boundary b_i, fold i trains on rows <= b_i and tests on rows past
    the embargo gap -- the standard time-series cross-validation that
    never trains on the future. Returns one row per (input row, fold)
    with ``fold`` and ``role`` ('train'/'test'); embargo rows for that
    fold are absent, like ``temporal_split``.

    Plan: the fold table is a k-row broadcast literal crossed onto the
    scan, then a projection/filter -- rows replicate k times by
    construction (that is the OUTPUT, each fold is a full backtest),
    nothing else shuffles."""
    if not boundaries:
        raise ValueError("need at least one boundary")
    spark = df.sparkSession
    folds = spark.createDataFrame(
        [(i, b) for i, b in enumerate(boundaries)], "fold int, _end string"
    ).select(
        "fold",
        F.col("_end").cast("timestamp").alias("_end"),
        F.expr(f"CAST(_end AS TIMESTAMP) + INTERVAL {embargo}").alias("_cut"),
    )
    j = df.crossJoin(F.broadcast(folds))
    role = F.when(F.col(ts_col) <= F.col("_end"), F.lit("train")).when(
        F.col(ts_col) > F.col("_cut"), F.lit("test")
    )
    return (
        j.withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .drop("_end", "_cut")
    )
