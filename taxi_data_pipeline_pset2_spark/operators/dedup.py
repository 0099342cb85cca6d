"""Deduplication operators for LLM-scale data pipelines (SURVEY.md 2b).

Not present in the reference (its only dedup narrative is the MD5 trip_id,
``README.md:46-49``); mandated by BASELINE.json. All operators are pure
DataFrame compositions -- no Python UDFs -- so they stay JVM-side and scale:

- exact dedup      : md5-fingerprint hash-aggregate (one shuffle on the
                     fingerprint; map-side partial keeps it skew-tolerant)
- n-gram Jaccard   : shingle inverted-index self-join (the scalable
                     alternative to O(n^2) pairwise -- candidate pairs are
                     generated only for docs sharing a shingle)
- MinHash + LSH    : k=16 signatures, 4 bands x 4 rows banding; candidate
                     pairs join on (band, band_signature) -- at 100 TB the
                     band join touches only colliding buckets
- SimHash          : 32-bit majority-vote fingerprint; hamming-adjacent
                     docs land on nearby fingerprints

Determinism: the shingle hash is the first 8 hex digits of md5 -- stable
across engines/runs (unlike Spark's xxhash64 seed or Python's hash),
which is what makes the DuckDB oracle twins possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.skew import spread_small_input

# MinHash parameters -- fixed constants, shared with the SQL oracles.
MINHASH_K = 16
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS
SIMHASH_BITS = 32
# Manku et al. (WWW'07) block decomposition of the fingerprint: two
# fingerprints within Hamming distance d agree on >= (BLOCKS - d) blocks,
# so for d < SIMHASH_BLOCKS every qualifying pair collides on at least
# one block (pigeonhole) and the block-bucket equi-join is an EXACT
# candidate generator -- never all-pairs.
SIMHASH_BLOCKS = 4
SIMHASH_BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS

# Posting-list chunk size for in-bucket pair generation. Bounds per-row
# memory at ~CAP^2 pair structs no matter how hot a bucket gets.
BUCKET_PAIR_CAP = 512


def _bind_once(col: Column, f) -> Column:
    """Evaluate ``col`` exactly once and hand it to ``f`` as a bound lambda
    variable. Higher-order functions are interpreted (no codegen, no
    common-subexpression elimination), so an expression referenced N times
    is evaluated N times; wrapping it in a 1-element ``transform`` pins a
    single evaluation (same trick as ``doc_shingles``)."""
    return F.element_at(F.transform(F.array(col), f), 1)


def _tri_pairs(xs: Column, cap: int) -> Column:
    """Triangular (i < j) pairs of a materialized array (attribute or
    bound lambda variable -- NOT an unbound expression, see _bind_once)."""
    return F.flatten(
        F.transform(
            xs,
            lambda x, i: F.transform(
                F.slice(xs, i + 2, cap),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def _bucket_pair_arrays(
    buckets: DataFrame, arr_col: str, cap: int = BUCKET_PAIR_CAP
) -> DataFrame:
    """Pre-explode form of :func:`bucket_pairs`: one row per chunk pair
    with the bounded ``pair_arr`` column. Exposed separately so tests can
    assert the OBSERVED per-row array size bound (<= cap^2) rather than
    re-deriving it from the chunking arithmetic."""
    arr = F.col(arr_col)
    # Defensive: size-0/1 buckets have no pairs, and size 0 would make
    # sequence(0, n_chunks-1) = sequence(0, -1) count DOWN, yielding a
    # chunk index -1 whose slice start indexes from the end of the array.
    buckets = buckets.filter(F.size(arr) >= 2)
    n_chunks = F.ceil(F.size(arr) / F.lit(cap)).cast("int")
    chunk_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.transform(
                F.sequence(i, n_chunks - 1),
                lambda j: F.struct(i.alias("ci"), j.alias("cj")),
            ),
        )
    )
    chunked = buckets.select(arr.alias("_xs"), F.explode(chunk_idx).alias("c"))
    xs = F.col("_xs")
    left = F.slice(xs, F.col("c.ci") * cap + 1, cap)
    right = F.slice(xs, F.col("c.cj") * cap + 1, cap)
    # Fast path (the overwhelmingly common case): a bucket at or under the
    # cap is a single (0,0) chunk row, so the triangular expansion can run
    # directly on the stored array -- no slice copies, no lambda binding.
    # Without this branch every small bucket paid the chunk machinery for
    # nothing (the r2 bench regression: dedup_ngram_jaccard +80%).
    small = _tri_pairs(xs, cap)
    # Oversized buckets: bind each chunk slice ONCE, then pair within
    # (triangular) or across (full product) -- at most cap^2 structs per
    # row no matter how hot the bucket.
    tri_big = _bind_once(left, lambda lf: _tri_pairs(lf, cap))
    cross = _bind_once(
        left,
        lambda lf: _bind_once(
            right,
            lambda rt: F.flatten(
                F.transform(
                    lf,
                    lambda x: F.transform(
                        rt, lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
        ),
    )
    pair_arr = F.when(F.size(xs) <= cap, small).otherwise(
        F.when(F.col("c.ci") == F.col("c.cj"), tri_big).otherwise(cross)
    )
    return chunked.select(pair_arr.alias("pair_arr"))


def bucket_pairs(buckets: DataFrame, arr_col: str, cap: int = BUCKET_PAIR_CAP) -> DataFrame:
    """Explode each bucket's sorted posting list into its unordered pairs
    with bounded per-row memory.

    A naive ``flatten(transform(...))`` builds a bucket's full O(b^2) pair
    array inside ONE row -- a stopword-frequency shingle or degenerate LSH
    bucket with b ~ 1e5 members would materialize ~5e9 structs on a single
    executor thread (the round-1 `weak` finding). Here the list is viewed
    as ceil(b/cap) chunks and one row is emitted per chunk pair (ci <= cj):
    within-chunk rows generate the triangular pairs, cross-chunk rows the
    full left x right product -- at most cap^2 pair structs per row
    regardless of bucket size. Buckets at or under the cap (the common
    case) skip the chunk slicing entirely and expand in place. The emitted
    pair SET is identical to the naive formulation (each unordered pair
    exactly once, first element earlier in the sorted list), so exactness
    and oracle hashes are unchanged; the quadratic work for hot buckets is
    merely spread across (b/cap)^2 rows that pipeline through executors
    instead of one monolithic array.

    Returns a single column ``p`` = struct(a, b) over the array's element
    type. Size-0/1 buckets are filtered defensively (they have no pairs).
    """
    return _bucket_pair_arrays(buckets, arr_col, cap).select(
        F.explode("pair_arr").alias("p")
    )


def normalize_text(col: Column) -> Column:
    """lower + trim + whitespace collapse: canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokenize(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def positioned_shingles(tokens: Column, k: int = 3) -> Column:
    """All k-token shingles in document order (index = 0-based start
    position), as ``zip_with`` over k shifted slices. ~8x faster than the
    index-``transform`` + per-element ``slice`` formulation (no
    per-shingle array copies; one linear zip per offset). ``greatest(..,
    0)`` yields an empty array for docs shorter than k."""
    n_out = F.greatest(F.size(tokens) - (k - 1), F.lit(0))
    sh = F.slice(tokens, 1, n_out)
    for off in range(1, k):
        sh = F.zip_with(
            sh, F.slice(tokens, off + 1, n_out), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return sh


def shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (the set-similarity form)."""
    return F.array_distinct(positioned_shingles(tokens, k))


def stable_hash64(col: Column) -> Column:
    """First 8 hex digits of md5 as a bigint in [0, 2^32): engine-portable
    deterministic hash (DuckDB twin: CAST('0x' || substr(md5(s),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content fingerprint: one hash-aggregate on
    md5(normalized text). Returns (fingerprint, keep_id, n_copies);
    keep_id = min id is the deterministic survivor. NULL-text docs are
    EXCLUDED: md5(NULL) is NULL and groupBy would bundle every
    contentless doc into one giant "duplicate" group whose survivors
    policy then deletes all but one -- an ingestion gap is not
    identical content."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle, n_shingles) exploded inverted-index input.

    The shingle array must be evaluated exactly once per row: higher-order
    functions are interpreted (no codegen, no common-subexpression
    elimination), and Catalyst's CollapseProject happily inlines the array
    expression into ``size()`` AND ``explode()`` -- a silent 3x. Binding the
    array as a lambda variable (1-element ``transform`` wrapper) pins a
    single evaluation, then ``inline`` emits (shingle, n_shingles) rows."""
    docs = spread_small_input(docs, key_cols=[id_col])
    sh_expr = shingles(tokenize(F.col(text_col)), k)
    rows = F.element_at(
        F.transform(
            F.array(sh_expr),
            lambda a: F.transform(
                a, lambda s: F.struct(s.alias("shingle"), F.size(a).alias("n_shingles"))
            ),
        ),
        1,
    )
    return docs.select(F.col(id_col), F.inline(rows))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index.

    Candidate generation happens inside each shingle's posting list
    (collect_list) instead of a self-join: the shingle pipeline is
    evaluated once, the posting list is sorted so pairs come out ordered
    (a < b), and the per-doc sizes ride along in the struct -- no
    join-back. Only pairs sharing at least one shingle are ever
    materialized, and ``bucket_pairs`` chunks each posting list so a hot
    shingle never builds an O(df^2) array on one executor.

    ``max_df`` (optional, default off) is the standard prefix-filter
    escape hatch for adversarial corpora: shingles whose document
    frequency exceeds it are dropped from the index entirely. This is an
    APPROXIMATION -- pairs connected only through dropped shingles are
    missed and intersection counts exclude them, so reported jaccard is a
    lower bound -- which is why it is off by default and excluded from
    the SQL oracles.
    """
    e = doc_shingles(docs, text_col, id_col, k)
    buckets = (
        e.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("n_shingles").alias("n")))
            ).alias("xs")
        )
        .filter(F.size("xs") >= 2)
    )
    if max_df is not None:
        buckets = buckets.filter(F.size("xs") <= max_df)
    # Length filter (standard similarity-join pruning): jaccard(A,B) is
    # at most min(|A|,|B|)/max(|A|,|B|), so pairs whose size ratio falls
    # below the threshold can never qualify -- drop them BEFORE the
    # counting shuffle. The 1e-6 slack keeps the filter strictly weaker
    # than the post-rounding threshold test (round(jac, 6) could round a
    # boundary pair up), so the emitted pair set is bit-identical to the
    # unfiltered formulation and the oracle hash is unchanged.
    n_a, n_b = F.col("p.a.n"), F.col("p.b.n")
    length_ok = (n_a >= (threshold - 1e-6) * n_b) & (
        n_b >= (threshold - 1e-6) * n_a
    )
    inter = (
        bucket_pairs(buckets, "xs")
        .filter(length_ok)
        .groupBy(
            F.col("p.a.i").alias("doc_a"),
            F.col("p.b.i").alias("doc_b"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_band_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-doc LSH band signatures from MinHash.

    Permutation j (j in 0..15): h_j(s) = (a_j * h(s) + b_j) mod p with
    a_j = 2j+1, b_j = 7919j + 12345 -- literal constants so the DuckDB
    oracle reproduces them. Band signature combines the band's 4 minima
    with fixed weights 31^(j mod 4): order-independent aggregation
    (a SUM), deterministic under any shuffle order.

    Deliberately explode + hash-aggregate rather than a per-row
    ``array_min`` fold over the shingle array: the md5 in the exploded
    form runs under whole-stage codegen (interpreted higher-order
    functions are ~3x slower per element, measured), and map-side
    partial aggregation reduces the shuffle to ~one row per doc anyway
    -- the explode never hits the network.
    """
    e = doc_shingles(docs, text_col, id_col, k).withColumn(
        "h", stable_hash64(F.col("shingle"))
    )
    # All 16 permutation minima in ONE hash aggregate (16 agg columns over
    # the shingle rows) instead of a 16x row-multiplying broadcast cross
    # join + two shuffles: same math, ~1/16th the shuffled rows.
    mins = e.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(2 * j + 1) * F.col("h") + F.lit(7919 * j + 12345))
                % MINHASH_PRIME
            ).alias(f"m{j}")
            for j in range(MINHASH_K)
        ]
    )
    band_structs = []
    for band in range(LSH_BANDS):
        # band signature = 60-bit md5 prefix of the comma-joined minima
        # TUPLE, not a 31^r weighted sum: the linear form collides on
        # any equal weighted sum (e.g. (m0+31, m1-1) vs (m0, m1)),
        # ~2^-33 per random pair-band -- thousands of spurious
        # "near-dup" pairs at a 1e8-doc corpus in an output that is
        # final, not verify-filtered. The md5-tuple form only collides
        # at ~2^-60 (the assign_variants precedent) and keeps true dups
        # colliding exactly (identical tuples -> identical md5).
        tup = F.concat_ws(
            ",",
            *[
                F.col(f"m{band * LSH_ROWS + r}").cast("string")
                for r in range(LSH_ROWS)
            ],
        )
        sig = F.conv(F.substring(F.md5(tup), 1, 15), 16, 10).cast("bigint")
        band_structs.append(
            F.struct(
                F.lit(band).cast("int").alias("band"),
                sig.alias("band_sig"),
            )
        )
    return mins.select(
        id_col, F.inline(F.array(*band_structs))
    )


def band_collision_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, n_shared_bands) from a (id, band, band_sig) frame.

    Same single-evaluation bucket pairing as jaccard_pairs: a self-join
    would re-run the whole shingle->hash->minima pipeline for both
    sides; collecting each band bucket's sorted posting list runs it
    once, and bucket_pairs chunks degenerate buckets (e.g. a corpus of
    near-identical docs all landing on one band signature) so no single
    row ever holds an O(b^2) pair array."""
    buckets = (
        sigs.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        bucket_pairs(buckets, "ids")
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_candidate_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """LSH candidate pairs: docs colliding on >=1 band signature.
    Returns (doc_a, doc_b, n_shared_bands). The join key (band, band_sig)
    is the bucket -- at scale only same-bucket docs meet, never the full
    cross product."""
    sigs = minhash_band_signatures(docs, text_col, id_col, k)
    return band_collision_pairs(sigs, id_col)


def verify_jaccard_pairs(
    docs: DataFrame,
    cands: DataFrame,
    threshold: float = 0.2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard verification of a candidate-pair frame
    (doc_a, doc_b): shingle sets are materialized ONLY for docs that
    appear in a candidate pair (semi-join -- dup-sized, not
    corpus-sized), then each pair's intersection is one
    ``array_intersect`` -- no inverted-index pass over the corpus.

    This is the verify stage of the two-phase scale plan
    (:func:`minhash_verified_pairs`); ``jaccard_pairs`` remains the
    one-shot exact operator whose inverted index touches every doc."""
    ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .unionByName(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets_df = (
        docs.join(ids, id_col, "left_semi")
        .select(
            F.col(id_col),
            shingles(tokenize(F.col(text_col)), k).alias("sh"),
        )
    )
    a = sets_df.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    # try_divide: a caller-supplied candidate pair of two shingle-less
    # docs has union = 0, and a plain division is an ANSI
    # DIVIDE_BY_ZERO crash; NULL jaccard then fails the threshold
    # filter, so the degenerate pair drops instead of killing the job
    jac = F.round(F.try_divide(inter, union), 6)
    return (
        cands.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The two-phase 100 TB text near-dup plan: MinHash-LSH band
    collisions generate candidates (never n^2), exact Jaccard verifies
    candidates only (never the corpus). Versus ``jaccard_pairs`` this
    trades the stopword-shingle inverted index for the banded one and
    misses only pairs that collide on zero bands (recall pinned vs the
    exact operator in tests)."""
    cands = minhash_candidate_pairs(docs, text_col, id_col, k).select(
        "doc_a", "doc_b"
    )
    return verify_jaccard_pairs(docs, cands, threshold, k, text_col, id_col)


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """``bits``-wide SimHash: per-token stable hash, per-bit majority
    vote over token occurrences (frequency-weighted). One explode + one
    group-by with ``bits`` conditional sums -- all JVM-side, no UDF.
    Default 32 bits (the oracle-pinned grid); up to 62 fit a signed
    bigint. Bit positions past 31 draw from a SECOND md5-prefix word
    (hex digits 9-16), so every position gets an independent hash bit
    rather than recycling the first word."""
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    docs = spread_small_input(docs, key_cols=[id_col])
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).withColumn("h", stable_hash64(F.col("tok")))
    if bits > 32:
        # second independent 32-bit word: md5 hex digits 9..16 (the
        # engine-portable construction, same as the first word)
        toks = toks.withColumn(
            "h2",
            F.conv(F.substring(F.md5(F.col("tok")), 9, 8), 16, 10).cast(
                "bigint"
            ),
        )
    def _bit(i: int) -> Column:
        src = F.col("h") if i < 32 else F.col("h2")
        return F.shiftright(src, i % 32).bitwiseAND(F.lit(1))

    bit_sums = [F.sum(_bit(i)).alias(f"b{i}") for i in range(bits)]
    agg = toks.groupBy(id_col).agg(F.count("*").alias("n_tokens"), *bit_sums)
    simhash = None
    for i in range(bits):
        bit = F.when(
            2 * F.col(f"b{i}") > F.col("n_tokens"), F.lit(2**i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        simhash = bit if simhash is None else simhash + bit
    return agg.select(F.col(id_col), F.col("n_tokens"), simhash.alias("simhash"))


def simhash_candidate_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    blocks: int = SIMHASH_BLOCKS,
    key_blocks: int = 1,
) -> DataFrame:
    """EXACT SimHash near-dup pairs at Hamming distance <= ``max_hamming``
    via the Manku et al. (WWW'07) block pigeonhole: the ``bits``-wide
    fingerprint splits into ``blocks`` disjoint blocks; ``max_hamming``
    differing bits can touch at most ``max_hamming`` blocks, so every
    qualifying pair agrees on >= ``blocks - max_hamming`` whole blocks
    and therefore shares at least ONE of the C(blocks, key_blocks)
    ``key_blocks``-sized block combinations whenever ``key_blocks <=
    blocks - max_hamming``. Joining on (table_idx, combined_block_key)
    buckets generates a superset of every qualifying pair WITHOUT an
    all-pairs comparison; the bit_count(xor) filter then makes the
    output exact, not approximate. Returns (doc_a, doc_b, hamming,
    n_shared_tables), doc_a < doc_b.

    The default (32-bit fingerprint, 4 blocks, key_blocks=1) matches
    the catalog's oracle-pinned grid: 4 tables keyed on 8 bits each --
    fine for audits and mid-size corpora, but an 8-bit key alphabet
    has only 256 buckets per table, so bucket populations grow
    LINEARLY with the corpus and the in-bucket pairing quadratically.
    At corpus scale use Manku's design point: ``bits=60, blocks=6,
    key_blocks=3`` -- C(6,3) = 20 tables, each keyed on 30 bits (~1e9
    bucket alphabet), exact for the same Hamming <= 3 (exactness for
    any valid configuration is pinned vs brute force in tests).

    Same bounded-bucket discipline as the MinHash band join: bucket
    posting lists are collected once and chunk-expanded via
    bucket_pairs (<= BUCKET_PAIR_CAP^2 pair structs per row even on a
    degenerate corpus of near-identical fingerprints)."""
    from itertools import combinations

    if blocks < 1 or bits % blocks:
        raise ValueError(
            f"bits ({bits}) must divide evenly into blocks ({blocks})"
        )
    if not 0 <= max_hamming <= blocks - key_blocks:
        raise ValueError(
            f"need max_hamming <= blocks - key_blocks "
            f"({blocks} - {key_blocks}): the pigeonhole only guarantees "
            f"a fully-agreeing {key_blocks}-block key for pairs within "
            f"{blocks - key_blocks} bits; a larger bound would silently "
            "under-recall"
        )
    if key_blocks < 1:
        raise ValueError("key_blocks must be >= 1")
    block_bits = bits // blocks
    if key_blocks * block_bits > 62:
        raise ValueError(
            f"combined key width {key_blocks * block_bits} exceeds a "
            "signed bigint"
        )
    fps = simhash_fingerprints(docs, text_col, id_col, bits=bits)
    mask = (1 << block_bits) - 1

    def _key(combo: tuple[int, ...]) -> Column:
        key = F.lit(0).cast("bigint")
        for pos, b in enumerate(combo):
            blk_val = F.shiftright(
                F.col("simhash"), b * block_bits
            ).bitwiseAND(F.lit(mask))
            key = key + F.shiftleft(blk_val, pos * block_bits)
        return key

    tables = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(ti).cast("int").alias("blk"),
                        _key(combo).alias("blk_val"),
                    )
                    for ti, combo in enumerate(
                        combinations(range(blocks), key_blocks)
                    )
                ]
            )
        ),
    )
    buckets = (
        tables.groupBy("blk", "blk_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), F.col("simhash")))
            ).alias("ids")
        )
        .filter(F.size("ids") >= 2)
    )
    # sort_array on struct(id, simhash) orders by id first, so p.a/p.b are
    # already (doc_a < doc_b); a pair sharing several table keys appears
    # once per shared table and the group-by collapses it.
    pairs = bucket_pairs(buckets, "ids").select(
        F.col("p.a." + id_col).alias("doc_a"),
        F.col("p.b." + id_col).alias("doc_b"),
        F.bit_count(
            F.col("p.a.simhash").bitwiseXOR(F.col("p.b.simhash"))
        ).alias("hamming"),
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.min("hamming").alias("hamming"),
            F.count("*").alias("n_shared_tables"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
