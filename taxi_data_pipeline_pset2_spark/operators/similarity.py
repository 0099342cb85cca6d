"""Similarity search over embedding columns (SURVEY.md 2b).

Embeddings are plain ``array<float>`` columns. Cosine top-k is computed
with higher-order functions (``zip_with`` + ``aggregate``) -- JVM-side,
no UDF, no collect.

Determinism: float dot products are order-sensitive, so embeddings are
scaled to exact BIGINT (round(x * 1e6)) before the dot/norm sums. Integer
sums are associative -> identical under any partitioning, and identical
to the DuckDB oracle. Cosine is then one double division + sqrt (both
IEEE-exact). The ~1e-6 quantization is far below any ranking-relevant
signal, and it buys bit-reproducibility at every scale.

Scale paths:
- brute force     : broadcast the (small) query set, scan candidates once
                    -- the right plan whenever |queries| << |corpus|
- IVF-style       : restrict to matching coarse-bucket (the ``label``
                    column stands in for a k-means assignment) -- prunes
                    the scan to 1/n_buckets of the corpus
- true IVF        : ``knn_ivf_kmeans`` -- k-means coarse quantizer +
                    n_probe nearest cells per query (the real inverted-
                    file index; recall/scan-fraction trade is tunable)
- random-proj LSH : pyspark.ml BucketedRandomProjectionLSH wrapper for
                    approx joins when both sides are huge
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from taxi_data_pipeline_pset2_spark.operators.dedup import bucket_pairs

# Hard cap on rows a query predicate may select in the vectorized kNN
# path: the query set is collected to the driver and broadcast, so it
# must stay dim-sized no matter what predicate the caller passes.
MAX_QUERY_ROWS = 100_000

SCALE = 1_000_000

# int64-headroom cap of the 1e-6 grid itself (|iv| < 2^25, raw values
# < ~33.5): every integer kernel over grid values -- clustering's exact
# d2, pq's subspace dots, the euclid ground truth -- shares this
# envelope, and each dot/distance must ALSO check its own
# dimension-aware bound D * (2 * MAX_ABS_IV)^2 < 2^63 (the magnitude
# cap alone is safe only up to D = 2048; ADVICE r9). Lives here, next
# to SCALE, because it is a property of the quantization grid, not of
# any one consumer.
MAX_ABS_IV = 1 << 25


def int_embedding(col: Column) -> Column:
    """array<float> -> exact array<bigint> at 1e-6 quantization."""
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("bigint"))


def int_norm2(col: Column) -> Column:
    """Exact squared norm of an int-scaled embedding."""
    return F.aggregate(
        col, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _prepared(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Shared (id, iv, norm2) projection. NULL vectors are EXCLUDED
    here: the SQL-side kernels already self-exclude them (NULL cosine
    fails every threshold), but the Arrow kernels downstream build
    np.int64 batch matrices, where one None crashes the whole task --
    absence, not a corpus-killing TypeError, is the contract (the
    pq.py precedent)."""
    prepped = emb.filter(F.col(vec_col).isNotNull())
    iv = int_embedding(F.col(vec_col))
    return prepped.select(
        F.col(id_col), iv.alias("iv"), int_norm2(iv).alias("norm2"), *(
            [F.col("label")] if "label" in emb.columns else []
        )
    )


def knn_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for each query row (rows matching
    ``query_pred``) against the whole corpus (or only the query's
    ``bucket_col`` partition -- the IVF-style pruned path).

    Physical plan: queries are broadcast (they are the small side by
    construction), candidates stream through one scan; the per-query
    top-k is a partitioned window -> shuffle on query_id only.
    """
    scored = _scored_query_pairs(emb, query_pred, id_col, vec_col, bucket_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _scored_query_pairs(
    emb: DataFrame,
    query_pred: Column,
    id_col: str,
    vec_col: str,
    bucket_col: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) for every (query, candidate)
    pair: the broadcast-queries-scan-candidates stage knn_topk and
    mine_hard_negatives share, BEFORE any ranking -- so a consumer that
    must filter pairs (dup exclusion) does it once, then ranks once."""
    prep = _prepared(emb, id_col, vec_col)
    q_cols = [F.col(id_col).alias("query_id"), F.col("iv").alias("q_iv"),
              F.col("norm2").alias("q_norm2")]
    c_cols = [F.col(id_col).alias("neighbor_id"), F.col("iv").alias("c_iv"),
              F.col("norm2").alias("c_norm2")]
    if bucket_col:
        q_cols.append(F.col(bucket_col).alias("q_bucket"))
        c_cols.append(F.col(bucket_col).alias("c_bucket"))
    queries = prep.filter(query_pred).select(*q_cols)
    cands = prep.select(*c_cols)

    cond = F.col("query_id") != F.col("neighbor_id")
    if bucket_col:
        cond = cond & (F.col("q_bucket") == F.col("c_bucket"))
    joined = cands.join(F.broadcast(queries), cond)

    dot = int_dot(F.col("q_iv"), F.col("c_iv"))
    cos = F.round(
        dot.cast("double")
        / (F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("c_norm2").cast("double"))),
        6,
    )
    return joined.select("query_id", "neighbor_id", cos.alias("cosine"))


def knn_topk_vectorized(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as ``knn_topk`` (identical int-scaled math, same
    oracle), but the dot products run as one numpy int64 matmul per Arrow
    batch instead of per-pair interpreted ``aggregate``/``zip_with``.

    The broadcast-queries-scan-candidates shape is unchanged; only the
    inner loop moves from Catalyst's interpreted higher-order functions to
    BLAS. This is the documented exception to "UDFs are the slow path":
    for dense numeric kernels, one vectorized pandas batch beats
    per-element expression evaluation by an order of magnitude.
    """
    import numpy as np
    import pandas as pd

    prep = _prepared(emb, id_col, vec_col)
    # The query set must be driver-sized: it is collected and broadcast.
    # Enforce the contract instead of trusting the predicate -- a
    # too-loose query_pred at 100 TB would otherwise OOM the driver.
    q_rows = prep.filter(query_pred).limit(MAX_QUERY_ROWS + 1).collect()
    if len(q_rows) > MAX_QUERY_ROWS:
        raise ValueError(
            f"query_pred selects more than {MAX_QUERY_ROWS} rows; "
            "knn_topk_vectorized broadcasts the query set and requires it "
            "to be driver-sized. Tighten the predicate or use knn_topk."
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["iv"] for r in q_rows], dtype=np.int64)  # (Q, D)
    q_norm = np.sqrt(np.array([r["norm2"] for r in q_rows], dtype=np.float64))
    b_q = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def run(batches):
        ids_b, mat_b, norm_b = b_q.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["iv"]), dtype=np.int64)  # (C, D)
            c_norm = np.sqrt(pdf["norm2"].to_numpy(dtype=np.float64))
            dots = c_mat @ mat_b.T  # (C, Q) int64 exact
            raw = dots / (c_norm[:, None] * norm_b[None, :])
            # boundary-safe HALF_UP at 6dp, same kernel as the verify path
            cos = _round_half_up_6(raw.ravel()).reshape(raw.shape)
            C, Q = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_b[None, :], C, axis=0).ravel(),
                    "neighbor_id": np.repeat(c_ids[:, None], Q, axis=1).ravel(),
                    "cosine": cos.ravel(),
                }
            )

    pairs = prep.mapInPandas(run, schema=out_schema).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


N_PLANES = 32
COS_LSH_BANDS = 4
COS_LSH_ROWS = N_PLANES // COS_LSH_BANDS  # 8-bit band signatures


def lsh_banding_recall(threshold: float, bands: int, rows: int) -> float:
    """Predicted candidate probability of a pair at exactly ``threshold``
    cosine under a (bands x rows) sign-RP design: 1 - (1 - s^rows)^bands
    with per-bit collision odds s = 1 - theta/pi (Goemans-Williamson)."""
    import math

    s = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - s**rows) ** bands


def lsh_params_for(
    threshold: float, recall: float, max_planes: int = 64
) -> tuple[int, int]:
    """Pick (bands, rows) so the banding curve guarantees candidate
    probability >= ``recall`` for every pair at cosine >= ``threshold``.

    This closes the loop the r7 ``lsh_recall_audit`` opened: it proved
    (hash-verified) that the fixed 4x8 high-similarity design gets ~0.09
    recall at cosine 0.4 -- the sketch must be re-derived per threshold,
    not reused. For each rows-per-band r, the minimum band count is
    b = ceil(log(1-recall) / log(1 - s^r)); among feasible designs
    (b*r <= max_planes) the LARGEST r wins: at a fixed recall floor,
    candidate precision improves monotonically with band selectivity
    (a random pair collides on an r-row band w.p. ~(1/2)^r), so the
    plane budget is spent on selectivity, never on excess recall.

    At 100 TB the plane budget is the sketch's storage/compute cost
    (one int64 matmul column per plane) while b drives shuffle volume
    (one (band, sig) row per vector per band) -- both scale linearly
    and stay tiny next to the candidate-pair stage this design exists
    to keep sparse."""
    import math

    if not 0.0 < recall < 1.0:
        raise ValueError(f"recall must be in (0, 1), got {recall}")
    s = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best: tuple[int, int] | None = None
    for r in range(1, max_planes + 1):
        p_band = s**r
        # once s^r underflows past ~1e-12, log1p(-p_band) is 0 (or the
        # minimal band count exceeds any budget by orders of magnitude):
        # no larger r can be feasible either, stop scanning
        if p_band < 1e-12:
            break
        if p_band >= 1.0:
            b = 1
        else:
            b = math.ceil(math.log(1.0 - recall) / math.log1p(-p_band))
        if b * r > max_planes:
            continue
        if best is None or r > best[1]:
            best = (b, r)
    if best is None:
        raise ValueError(
            f"no (bands, rows) design reaches recall {recall} at cosine "
            f"{threshold} within {max_planes} planes"
        )
    return best


def hyperplane_signs(
    n_planes: int = N_PLANES, dim: int = 64, salt: str = ""
) -> list[list[int]]:
    """Deterministic +-1 hyperplane matrix for sign-random-projection LSH.

    Component (j, i) is the parity of the md5-prefix hash of "{salt}j_i"
    -- the same engine-portable stable hash used for shingles
    (operators/dedup.py ``stable_hash64``), computed driver-side once.
    Both the Spark plan (literal arrays) and the DuckDB oracle (md5 in a
    CTE) reproduce the identical matrix, which is what makes an
    approximate LSH operator hash-verifiable. ``salt`` decorrelates
    independent plane families (the euclidean BRP tables use "brp")."""
    import hashlib

    return [
        [
            1
            - 2
            * (
                int(
                    hashlib.md5(f"{salt}{j}_{i}".encode()).hexdigest()[:8], 16
                )
                % 2
            )
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def cosine_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, exact int-scaled arithmetic.

    O(n^2) verify stage: the baseline the LSH path is measured against,
    and the in-bucket verifier at scale (run it per LSH bucket, never on
    the full corpus)."""
    prep = _prepared(emb, id_col, vec_col)
    a = prep.select(
        F.col(id_col).alias("id_a"), F.col("iv").alias("iv_a"), F.col("norm2").alias("n2_a")
    )
    b = prep.select(
        F.col(id_col).alias("id_b"), F.col("iv").alias("iv_b"), F.col("norm2").alias("n2_b")
    )
    cos = F.round(
        int_dot(F.col("iv_a"), F.col("iv_b")).cast("double")
        / (F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double"))),
        6,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_sketch_bands(
    emb: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = COS_LSH_BANDS,
    rows: int = COS_LSH_ROWS,
) -> DataFrame:
    """(id, band, band_sig) sign-sketch LSH bucket keys.

    bit_j = sign(iv . hyperplane_j); bands pack COS_LSH_ROWS bits into one
    integer signature. Collision probability per bit is 1 - theta/pi, so
    true near-dups (cosine >= 0.9) collide on >= 1 of the 4 bands w.p.
    ~0.75+ while random pairs almost never do -- the 100 TB candidate
    generator.

    All plane dots are one exact int64 numpy matmul per Arrow batch
    (the vectorized dense-kernel pattern, cf. knn_topk_vectorized) --
    same bits as the expression formulation, ~10x cheaper than
    bands*rows interpreted higher-order aggregates per row.

    ``bands``/``rows`` default to the fixed high-similarity 4x8 design;
    pass ``lsh_params_for(threshold, recall)`` output to tune the sketch
    to a different operating point (rows <= 62 so the band signature
    fits an int64)."""
    import numpy as np
    import pandas as pd

    if rows > 62:
        raise ValueError(f"band signature needs rows <= 62, got {rows}")
    n_planes = bands * rows
    S = np.array(hyperplane_signs(n_planes, dim), dtype=np.int64)  # (P, D)
    weights = (2 ** np.arange(rows)).astype(np.int64)
    prep = _prepared(emb, id_col, vec_col)

    def run(batches):
        for pdf in batches:
            X = np.array(list(pdf["iv"]), dtype=np.int64)  # (N, D)
            bits = (X @ S.T) >= 0  # (N, P) exact integer sign
            sigs = bits.reshape(-1, bands, rows).astype(np.int64) @ weights
            n = len(X)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), n),
                    "band_sig": sigs.ravel(),
                }
            )

    return prep.select(id_col, "iv").mapInPandas(
        run, schema=f"{id_col} long, band int, band_sig long"
    )


def _round_half_up_6(raw):
    """ROUND(x, 6) with Spark/DuckDB semantics: HALF_UP on the double's
    exact decimal expansion (java.math.BigDecimal HALF_UP / DuckDB round).

    The fast vectorized form ``floor(|x|*1e6 + 0.5)`` computes in float64
    and can disagree with BigDecimal when ``|x|*1e6`` lands within one ULP
    of a .5 boundary, so elements near a boundary are re-rounded through
    Python ``decimal`` -- ``Decimal(float)`` is the exact binary expansion
    and ``ROUND_HALF_UP`` is ties-away-from-zero, the same path the JVM
    takes. Boundary cases are measure-zero in practice, so the slow path
    touches a handful of elements per batch at most."""
    import decimal

    import numpy as np

    raw = np.asarray(raw, dtype=np.float64)
    scaled = np.abs(raw) * 1e6
    out = np.sign(raw) * np.floor(scaled + 0.5) / 1e6
    frac = scaled - np.floor(scaled)
    suspect = np.abs(frac - 0.5) < 1e-6
    if suspect.any():
        q = decimal.Decimal("0.000001")
        for i in np.flatnonzero(suspect):
            out[i] = float(
                decimal.Decimal(float(raw[i])).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
            )
    return out


def _grid_int64(raw):
    """round(x * SCALE) -> exact int64 grid values with HALF_UP
    (ties away from zero) -- the ONE quantizer every numpy kernel must
    use, so it lands on the identical integers as Spark's
    ``int_embedding`` (F.round = BigDecimal HALF_UP) and the oracles'
    DuckDB ``round(x * 1e6)``. ``np.round`` is banker's rounding
    (half-to-even): a component whose IEEE product x*SCALE is exactly a
    .5 boundary would quantize differently per engine (ADVICE r9).

    Fast path ``sign(y) * floor(|y| + 0.5)``; elements whose product
    sits within float tolerance of a .5 boundary re-round through
    ``decimal`` on the exact binary expansion of the product -- integer
    boundaries k + 0.5 are exactly representable in float64 up to
    2^51, so exact-expansion HALF_UP equals both engines' rule (the
    shortest-repr subtlety only afflicts fractional grains)."""
    import decimal

    import numpy as np

    y = np.asarray(raw, dtype=np.float64) * float(SCALE)
    ay = np.abs(y)
    # past 2^52 the fast path's ay + 0.5 is not representable (it can
    # round UP past an exact odd integer while frac reads 0, dodging
    # the decimal re-round) and grid quantization is meaningless anyway
    # -- refuse instead of silently diverging from the oracle grid
    if ay.size and ay.max() >= float(1 << 52):
        raise ValueError(
            "values too large for exact 1e-6 grid quantization "
            f"(|x| >= {(1 << 52) / SCALE:.0f}: the scaled product "
            "exceeds float64's exact-integer range)"
        )
    out = np.sign(y) * np.floor(ay + 0.5)
    frac = ay - np.floor(ay)
    suspect = np.abs(frac - 0.5) < 1e-6
    if suspect.any():
        flat_y, flat_out = y.ravel(), out.ravel()
        for i in np.flatnonzero(suspect.ravel()):
            flat_out[i] = float(
                decimal.Decimal(float(flat_y[i])).to_integral_value(
                    rounding=decimal.ROUND_HALF_UP
                )
            )
    return out.astype(np.int64)


def round_half_up_6(y: float) -> float:
    """Scalar ROUND(x, 6) with the Spark/DuckDB HALF_UP rule -- the
    6-dp sibling of ``round_half_up_int`` for driver-side scalars the
    oracles recompute (funnel step rates, profile null fractions).
    Delegates to the vectorized kernel so the boundary handling stays
    defined in exactly one place."""
    return float(_round_half_up_6([y])[0])


def round_half_up_int(y: float) -> int:
    """HALF_UP a scalar double to the nearest integer -- the Spark
    F.round / DuckDB round() rule. Python's builtin ``round`` is
    banker's (round(2.5)=2 vs duckdb round(2.5)=3), so any driver-side
    integer rounding whose twin an oracle RECOMPUTES in SQL (DSIR/LM
    floor log-probs, LSH grid lengths) must come through here. Exact:
    Decimal(float) is the double's exact binary expansion, and integer
    .5 boundaries are exactly representable in float64 up to 2^51, so
    exact-expansion HALF_UP equals both engines on doubles."""
    import decimal

    return int(
        decimal.Decimal(float(y)).to_integral_value(
            rounding=decimal.ROUND_HALF_UP
        )
    )


def verify_cosine_pairs(
    emb: DataFrame,
    cands: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine verification of a candidate-pair frame (id_a, id_b):
    join both sides' int-scaled vectors, then compute every dot product
    as one numpy int64 einsum per Arrow batch -- identical math (and
    identical rounded doubles) to the expression formulation in
    ``cosine_pairs_exact``, but the 64-multiply inner loop runs in BLAS
    instead of Catalyst's interpreted higher-order functions (~2x on the
    verify stage). Shared by the LSH near-dup path and SemDeDup.

    Arrow-native kernel (r13): the int64 vector columns are re-sliced
    straight off the list array's contiguous values buffer
    (``flatten().to_numpy()`` + reshape -- guide section 4.2) instead of
    ``np.array(list(...))``-ing a Python list per pair, which dominated
    the verify stage at high candidate volume (measured ~0.9 s -> ~0.1 s
    on a 250k-pair batch). The reshape is guarded by an exact
    value-length check; mixed-dimension input falls back to the row-wise
    build (same math, just slower)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    prep = _prepared(emb, id_col, vec_col)
    a = prep.select(
        F.col(id_col).alias("id_a"), F.col("iv").alias("iv_a"), F.col("norm2").alias("n2_a")
    )
    b = prep.select(
        F.col(id_col).alias("id_b"), F.col("iv").alias("iv_b"), F.col("norm2").alias("n2_b")
    )
    joined = cands.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "iv_a", "iv_b", "n2_a", "n2_b"
    )

    def _mat(col: "pa.ChunkedArray | pa.Array", n: int) -> "np.ndarray":
        lens = pc.unique(pc.list_value_length(col))
        if len(lens) == 1:
            flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            if not np.issubdtype(flat.dtype, np.integer):
                # a NULL element inside a vector makes the flatten come
                # back float64-with-NaN, which would silently demote the
                # exact int64 dot to float and drop the pair (ADVICE
                # r13); fail loudly like the pre-Arrow kernel did
                raise ValueError(
                    "verify_cosine_pairs: embedding contains NULL "
                    f"elements (flattened dtype {flat.dtype}); clean or "
                    "filter malformed vectors upstream"
                )
            return flat.reshape(n, -1)
        # ragged input (mixed dims): row-wise fallback, identical math
        return np.array(
            [np.asarray(x, dtype=np.int64) for x in col.to_pylist()],
            dtype=np.int64,
        )

    def run(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            A = _mat(batch.column("iv_a"), n)
            B = _mat(batch.column("iv_b"), n)
            dots = np.einsum("ij,ij->i", A, B)  # exact int64
            raw = dots / (
                np.sqrt(batch.column("n2_a").to_numpy(zero_copy_only=False))
                * np.sqrt(batch.column("n2_b").to_numpy(zero_copy_only=False))
            )
            cos = _round_half_up_6(raw)
            keep = cos >= threshold
            yield pa.RecordBatch.from_pydict(
                {
                    "id_a": batch.column("id_a").to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "id_b": batch.column("id_b").to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "cosine": cos[keep],
                }
            )

    return joined.mapInArrow(run, schema="id_a long, id_b long, cosine double")


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucketed candidates, exact verify.

    Candidates = pairs sharing >= 1 band signature (equi-join on the
    bucket key -- only colliding docs ever meet); verify = exact
    int-scaled cosine >= threshold on the candidate set only (the
    vectorized ``verify_cosine_pairs`` kernel). The two-phase shape is
    the scale plan: candidate volume is driven by the sketch,
    verification cost by true-near-dup density, never by n^2."""
    sigs = cosine_sketch_bands(emb, dim, id_col, vec_col)
    # bucket pairing via collect_list instead of a self-join: the sketch
    # pipeline is evaluated ONCE (a self-join re-computes both sides), and
    # pair generation happens inside each (band, band_sig) bucket -- LSH
    # keeps buckets small on natural data, and bucket_pairs chunks a
    # degenerate bucket (e.g. an all-identical corpus collapsing onto one
    # signature) so per-row memory stays bounded at cap^2 pairs.
    buckets = (
        sigs.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cands = (
        bucket_pairs(buckets, "ids")
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    return verify_cosine_pairs(emb, cands, threshold, id_col, vec_col)


def brp_lsh_neighbors(
    emb: DataFrame,
    threshold: float = 6.0,
    bucket_length: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate euclidean-distance self-join via
    ``pyspark.ml.feature.BucketedRandomProjectionLSH`` -- the stock Spark
    ANN primitive for huge-x-huge joins. Returns (id_a, id_b, dist).
    Approximate by design -> no SQL oracle; tested in pytest against the
    brute-force path (recall check)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, seed=seed
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(F.col("dist"), 6).alias("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def brp_buckets(
    emb: DataFrame,
    bucket_length: float = 2.0,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) euclidean BRP-LSH keys with DETERMINISTIC
    md5-derived +-1 projection vectors (Rademacher entries satisfy the
    same JL/p-stable contract as MLlib's gaussians): bucket =
    floor(dot(iv, s_j) / round(bucket_length * SCALE)), all-integer, so
    a DuckDB oracle reproduces every bucket id bit-exactly -- the same
    construction that made the cosine sign-sketch (cosine_sketch_bands)
    hash-verifiable. One exact int64 matmul per Arrow batch."""
    import numpy as np
    import pandas as pd

    S = np.array(
        hyperplane_signs(n_tables, dim, salt="brp"), dtype=np.int64
    )  # (T, D)
    L = round_half_up_int(bucket_length * SCALE)
    if L <= 0:
        raise ValueError(f"bucket_length too small: {bucket_length}")
    prep = _prepared(emb, id_col, vec_col)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["iv"]), dtype=np.int64)  # (N, D)
            proj = X @ S.T  # (N, T) exact int64
            bkt = np.floor_divide(proj, L)  # exact floor semantics
            n = len(X)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": bkt.ravel(),
                }
            )

    return prep.select(id_col, "iv").mapInPandas(
        run, schema=f"{id_col} long, table int, bucket long"
    )


def verify_euclidean_pairs(
    emb: DataFrame,
    cands: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact euclidean-distance verification of a candidate-pair frame
    (id_a, id_b): d2 = norm2_a + norm2_b - 2*dot is EXACT int64, so the
    threshold test is an integer comparison (d2 <= round(t*SCALE)^2 --
    no float boundary can flip membership across engines); only the
    reported dist = round(sqrt(d2)/SCALE, 6) touches doubles, via the
    shared correctly-rounded sqrt + HALF_UP discipline."""
    import numpy as np
    import pandas as pd

    t2 = round_half_up_int(threshold * SCALE) ** 2
    prep = _prepared(emb, id_col, vec_col)
    a = prep.select(
        F.col(id_col).alias("id_a"), F.col("iv").alias("iv_a"), F.col("norm2").alias("n2_a")
    )
    b = prep.select(
        F.col(id_col).alias("id_b"), F.col("iv").alias("iv_b"), F.col("norm2").alias("n2_b")
    )
    joined = cands.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "iv_a", "iv_b", "n2_a", "n2_b"
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["iv_a"]), dtype=np.int64)
            B = np.array(list(pdf["iv_b"]), dtype=np.int64)
            dots = np.einsum("ij,ij->i", A, B)  # exact int64
            d2 = (
                pdf["n2_a"].to_numpy(dtype=np.int64)
                + pdf["n2_b"].to_numpy(dtype=np.int64)
                - 2 * dots
            )
            keep = d2 <= t2
            dist = _round_half_up_6(np.sqrt(d2[keep].astype(np.float64)) / SCALE)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"][keep],
                    "id_b": pdf["id_b"][keep],
                    "dist": dist,
                }
            )

    return joined.mapInPandas(run, schema="id_a long, id_b long, dist double")


def brp_lsh_neighbors_det(
    emb: DataFrame,
    threshold: float = 1.2,
    bucket_length: float = 2.0,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate euclidean self-join, deterministic end to end: BRP
    bucket keys (brp_buckets) OR-ed across n_tables hash tables generate
    candidates via a bounded bucket equi-join, then the exact integer
    verify (verify_euclidean_pairs) keeps true pairs at dist <=
    threshold. Same two-phase scale shape as cosine_near_dup_pairs --
    candidate volume driven by the sketch, verify cost by true-pair
    density, never n^2 -- but unlike the seeded-MLlib
    ``brp_lsh_neighbors`` every stage is reproducible in SQL, so the
    whole operator carries a full DuckDB oracle (VERDICT r8 item #8).
    Returns (id_a, id_b, dist), id_a < id_b."""
    sigs = brp_buckets(emb, bucket_length, n_tables, 64, id_col, vec_col)
    buckets = (
        sigs.groupBy("table", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cands = (
        bucket_pairs(buckets, "ids")
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    return verify_euclidean_pairs(emb, cands, threshold, id_col, vec_col)


def knn_ivf_kmeans(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """True IVF: coarse-quantize the corpus with k-means cells
    (operators/clustering.py, Lloyd's with deterministic init), then for
    each query search only its ``n_probe`` nearest cells.

    The 100 TB shape: the cell assignment is a one-off corpus pass
    (in practice materialized/bucketed by ``cell``); a query then scans
    ~n_probe/n_cells of the corpus. Cell ranking per query runs on the
    driver against the (n_cells x dim) centroid table the k-means fit
    already produced (same centroids that partitioned the corpus -- a
    re-derived mean table would be one Lloyd step ahead and could rank
    a cell the true neighbors were not assigned to) and ships to
    executors as a broadcast (query_id, cell) probe list joined against
    the cell-restricted candidates. Cells that ended up EMPTY are
    excluded from ranking so they cannot waste probe slots. Same
    int-scaled exact cosine + windowed top-k as ``knn_topk``, so within
    probed cells the ranking is bit-identical to brute force. Recall vs
    exact is pinned in tests/test_similarity.py.
    """
    import numpy as np

    from taxi_data_pipeline_pset2_spark.operators.clustering import kmeans_fit_assign

    spark = emb.sparkSession
    assigned, cents = kmeans_fit_assign(
        emb,
        k=n_cells,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        return_centroids=True,
    )
    assigned = assigned.select(id_col, F.col("cluster").alias("cell"))
    prep = _prepared(emb, id_col, vec_col).join(assigned, id_col)

    # an empty cell has no candidates: probing it silently shrinks the
    # effective n_probe, so rank only populated cells
    populated = sorted(
        r.cell for r in assigned.select("cell").distinct().collect()
    )

    q_rows = (
        emb.filter(query_pred)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .limit(MAX_QUERY_ROWS + 1)
        .collect()
    )
    if len(q_rows) > MAX_QUERY_ROWS:
        raise ValueError(
            f"query_pred selects more than {MAX_QUERY_ROWS} rows; "
            "knn_ivf_kmeans ranks probe cells driver-side and requires a "
            "driver-sized query set"
        )
    probes = []
    cents_pop = cents[populated]  # rank populated cells only
    c_sq = (cents_pop * cents_pop).sum(axis=1)
    for r in q_rows:
        x = np.array(r.v, dtype=np.float64)
        d2 = c_sq - 2.0 * (cents_pop @ x)  # + ||x||^2, constant per query
        for i in np.argsort(d2, kind="stable")[:n_probe]:
            probes.append((r[id_col], int(populated[i])))
    probes_df = spark.createDataFrame(probes, "query_id long, cell int")

    queries = prep.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col("iv").alias("q_iv"),
        F.col("norm2").alias("q_norm2"),
    )
    cands = prep.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("iv").alias("c_iv"),
        F.col("norm2").alias("c_norm2"),
        "cell",
    )
    joined = (
        cands.join(F.broadcast(probes_df), "cell")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    dot = int_dot(F.col("q_iv"), F.col("c_iv"))
    cos = F.round(
        dot.cast("double")
        / (F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("c_norm2").cast("double"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def mine_hard_negatives(
    emb: DataFrame,
    dup_pairs: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (rows matching ``query_pred``), the top-``k`` most-similar corpus
    rows that are NOT known duplicates of it -- the highest-value
    negatives are precisely the near-misses, and the known-dup exclusion
    keeps false negatives (actual positives) out of the training pairs.

    ``dup_pairs`` is any verified near-dup edge set (cosine_pairs_exact,
    LSH-verified pairs, semantic_pairs...); both orientations are
    excluded, as is self.

    Plan: the same broadcast-anchors-scan-corpus shape as ``knn_topk``
    (the shared pre-rank stage ``_scored_query_pairs``), plus one
    left-anti join against the (dup-sized) exclusion set, then ONE
    per-anchor top-k window. Exclusion BEFORE ranking matters twice: a
    post-rank filter would silently return fewer than k negatives for
    dup-heavy anchors, and ranking first would sort the full pair set
    only to re-rank it after the anti-join."""
    scored = _scored_query_pairs(emb, query_pred, id_col, vec_col)
    sym = dup_pairs.select(
        F.col(src).alias("query_id"), F.col(dst).alias("neighbor_id")
    ).unionByName(
        dup_pairs.select(
            F.col(dst).alias("query_id"), F.col(src).alias("neighbor_id")
        )
    )
    kept = scored.join(sym, ["query_id", "neighbor_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def exact_euclid_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-``k`` for ONE query vector over the corpus,
    on the 1e-6 integer grid: (id, d2_int, dist2) ascending, ties by
    id. The ground-truth side of the ANN recall audits (the euclidean
    sibling of knn_topk's cosine ranking): corpus and query quantize
    through the shared grid (int_embedding / _grid_int64), so d2_int is
    an exact bigint both engines reproduce and dist2 = d2_int / 1e12 a
    single identical int-to-double division.

    Plan shape: the query rides as a literal array (no join at all),
    distances are one JVM higher-order aggregate per row, and top-k
    plans as TakeOrderedAndProject -- one corpus scan, no shuffle
    beyond the k-row ordered take.

    Ground-truth hardening (a wrong "exact" side corrupts every recall
    number silently): a corpus row whose vector length differs from the
    query's, or whose grid magnitude exceeds the MAX_ABS_IV grid cap,
    fails the scan loudly (raise_error) instead of ranking as a
    NULL-first or int64-wrapped distance; the dimension-aware bound
    D * (2 * 2^25)^2 < 2^63 is checked on the driver."""
    if k < 1:
        raise ValueError("k must be >= 1")
    qiv = [int(v) for v in _grid_int64(query)]
    dim = len(qiv)
    if max((abs(v) for v in qiv), default=0) >= MAX_ABS_IV:
        raise ValueError("query magnitude exceeds the 2^25 grid cap")
    if dim * (2 * MAX_ABS_IV) ** 2 >= 1 << 63:
        raise ValueError(f"dim {dim} overflows the int64 d2 bound")
    qarr = F.array(*[F.lit(v).cast("bigint") for v in qiv])
    iv = int_embedding(F.col(vec_col))
    # the NULL-element check must come first AND the magnitude check
    # must be null-safe: under three-valued logic exists(abs(x) >= cap)
    # over a vector containing NULL returns NULL (not TRUE), the WHEN
    # would not fire, and the NULL d2 would sort NULLS FIRST into the
    # "exact" top-k -- silently deflating every recall audit
    checked = F.when(
        iv.isNull(),
        F.raise_error(
            F.lit("exact_euclid_topk: corpus vector is NULL")
        ).cast("array<bigint>"),
    ).when(
        F.size(iv) != dim,
        F.raise_error(
            F.lit("exact_euclid_topk: corpus vector length != query dim")
        ).cast("array<bigint>"),
    ).when(
        F.exists(iv, lambda x: x.isNull()),
        F.raise_error(
            F.lit("exact_euclid_topk: corpus vector has a NULL component")
        ).cast("array<bigint>"),
    ).when(
        F.exists(iv, lambda x: F.abs(x) >= F.lit(MAX_ABS_IV)),
        F.raise_error(
            F.lit("exact_euclid_topk: corpus magnitude exceeds the 2^25 grid cap")
        ).cast("array<bigint>"),
    ).otherwise(iv)
    d2 = F.aggregate(
        F.zip_with(checked, qarr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        emb.select(F.col(id_col), d2.alias("d2_int"))
        .select(
            id_col,
            "d2_int",
            (F.col("d2_int").cast("double") / F.lit(1e12)).alias("dist2"),
        )
        .orderBy("d2_int", id_col)
        .limit(k)
    )
