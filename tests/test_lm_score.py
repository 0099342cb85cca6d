"""Unigram LM scoring: exact DuckDB twin (the determinism contract),
monotonic intuition checks, and the CCNet-style tail filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.lm_score import (
    doc_logprob,
    logprob_filter,
    unigram_model,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

from .oracle_utils import compare_frames, duckdb_connection

DOC_LOGPROB_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents),
counts AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM counts),
model AS (
    SELECT term,
           CAST(round(ln((n + 1.0) / (total + vocab)) * 1000000) AS BIGINT)
               AS logp_m
    FROM counts, tot),
scored AS (
    SELECT t.doc_id, m.logp_m
    FROM toks t JOIN model m USING (term))
SELECT doc_id,
       count(*) AS n_tokens,
       round(sum(logp_m) / 1000000.0 / count(*), 6) AS mean_logprob,
       round(exp(-round(sum(logp_m) / 1000000.0 / count(*), 6)), 4) AS ppl_proxy
FROM scored GROUP BY doc_id
"""


def test_doc_logprob_matches_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = doc_logprob(docs).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(DOC_LOGPROB_ORACLE).df()
    assert compare_frames(got, want) == []


def test_model_probabilities_sum_below_one(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model, total, vocab = unigram_model(docs)
    assert total > 0 and vocab > 0
    # add-one smoothing: seen-term mass = (sum n + vocab)/(total + vocab) = 1,
    # so sum over the model of (n+1) must equal total + vocab exactly
    s = model.agg(F.sum(F.col("n") + 1)).first()[0]
    assert s == total + vocab


def test_common_token_doc_scores_higher_than_rare(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # build two synthetic docs from the corpus's own most/least frequent
    # terms; score them against the corpus model
    model, _, _ = unigram_model(docs)
    common = [r.term for r in model.orderBy(F.desc("n"), "term").limit(5).collect()]
    rare = [r.term for r in model.orderBy(F.asc("n"), "term").limit(5).collect()]
    probe = docs.sparkSession.createDataFrame(
        [(9_000_001, " ".join(common)), (9_000_002, " ".join(rare))],
        "doc_id long, text string",
    )
    scored = {
        r.doc_id: r.mean_logprob
        for r in doc_logprob(probe, model_docs=docs).collect()
    }
    assert scored[9_000_001] > scored[9_000_002]


def test_oov_tokens_take_smoothed_floor(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.sparkSession.createDataFrame(
        [(9_000_003, "zzqx_never_seen_token_1 zzqx_never_seen_token_2")],
        "doc_id long, text string",
    )
    row = doc_logprob(probe, model_docs=docs).collect()[0]
    import math

    _, total, vocab = unigram_model(docs)
    floor = round(round(math.log(1.0 / (total + vocab)) * 1e6) / 1e6, 6)
    assert row.n_tokens == 2
    assert abs(row.mean_logprob - floor) < 1e-9


def test_logprob_filter_drops_high_perplexity_tail(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = doc_logprob(docs)
    cutoff = scored.approxQuantile("ppl_proxy", [0.9], 0.0)[0]
    kept = logprob_filter(docs, max_ppl=cutoff)
    n_docs, n_kept = docs.count(), kept.count()
    assert n_kept < n_docs
    # every surviving doc is at or below the cutoff
    survivors = doc_logprob(docs).join(kept.select("doc_id"), "doc_id")
    assert survivors.filter(F.col("ppl_proxy") > cutoff).count() == 0


BIGRAM_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents),
pairs AS (
    SELECT doc_id, t[i] AS prev, t[i+1] AS cur
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 2),
bi AS (SELECT prev, cur, count(*) AS n_bi FROM pairs GROUP BY prev, cur),
uni AS (SELECT unnest(t) AS term FROM toks),
unic AS (SELECT term, count(*) AS n_uni FROM uni GROUP BY term),
v AS (SELECT count(*) AS vocab FROM unic),
scored AS (
    SELECT p.doc_id,
           CAST(round(ln((COALESCE(b.n_bi, 0) + 1.0)
                         / (COALESCE(u.n_uni, 0) + (SELECT vocab FROM v)))
                      * 1000000) AS BIGINT) AS logp_m
    FROM pairs p
    LEFT JOIN bi b ON p.prev = b.prev AND p.cur = b.cur
    LEFT JOIN unic u ON p.prev = u.term)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(sum(logp_m) / 1000000.0 / count(*), 6) AS mean_logprob,
       round(exp(-round(sum(logp_m) / 1000000.0 / count(*), 6)), 4) AS ppl_proxy
FROM scored GROUP BY doc_id
"""


def test_doc_bigram_logprob_matches_duckdb_oracle(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.lm_score import doc_bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    got = doc_bigram_logprob(docs).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(BIGRAM_ORACLE).df()
    assert compare_frames(got, want) == []


def test_bigram_scores_order_sensitivity(spark, sf_dir):
    """The bigram model must distinguish natural order from shuffled
    tokens where the unigram model cannot: a doc made of REVERSED
    corpus bigrams scores lower than the same tokens in corpus order."""
    from taxi_data_pipeline_pset2_spark.operators.lm_score import (
        doc_bigram_logprob,
        doc_logprob,
    )

    docs = load_table(spark, sf_dir, "documents")
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    toks = first.text.strip().lower().split()
    probe = spark.createDataFrame(
        [(9_100_000, " ".join(toks)), (9_100_001, " ".join(reversed(toks)))],
        "doc_id long, text string",
    )
    big = {
        r.doc_id: r.mean_logprob
        for r in doc_bigram_logprob(probe, model_docs=docs).collect()
    }
    assert big[9_100_000] > big[9_100_001]
    unig = {
        r.doc_id: r.mean_logprob
        for r in doc_logprob(probe, model_docs=docs).collect()
    }
    assert unig[9_100_000] == unig[9_100_001]  # unigram is order-blind


def test_bigram_logprob_matches_python_reference(spark):
    import math

    import pytest

    from taxi_data_pipeline_pset2_spark.operators.lm_score import (
        LOGP_SCALE,
        bigram_doc_logprob,
    )

    rows = [
        (1, "a b a b c"),
        (2, "a b"),
        (3, "z"),          # single OOV-ish token: unigram only
        (4, "c c c c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob, r.ppl_proxy)
        for r in bigram_doc_logprob(docs, lam=0.75).collect()
    }
    # python reference with identical integer-millionths rounding
    toks = {d: t.split() for d, t in rows}
    uni: dict = {}
    big: dict = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total, vocab = sum(uni.values()), len(uni)
    denom = total + vocab
    floor_m = round(math.log(1.0 / denom) * LOGP_SCALE)
    for d, ts in toks.items():
        w0 = ts[0]
        s = (
            round(math.log((uni[w0] + 1) / denom) * LOGP_SCALE)
            if w0 in uni
            else floor_m
        )
        for a, b in zip(ts, ts[1:]):
            cond = 0.75 * big.get((a, b), 0) / uni[a] if (a, b) in big and a in uni else 0.0
            back = 0.25 * (uni.get(b, 0) + 1) / denom
            s += round(math.log(cond + back) * LOGP_SCALE)
        mean = s / LOGP_SCALE / len(ts)
        assert got[d][0] == len(ts)
        assert got[d][1] == pytest.approx(round(mean, 6), abs=1e-9), d
        assert got[d][2] == pytest.approx(round(math.exp(-mean), 6), abs=1e-6), d
    # repetitive doc 4 has the most predictable bigrams -> best mean
    assert got[4][1] == max(v[1] for v in got.values())
    with pytest.raises(ValueError):
        bigram_doc_logprob(docs, lam=1.0)


def test_bigram_logprob_omits_tokenless_docs(spark):
    """NULL-text docs are ABSENT (matching doc_logprob), not emitted as
    a row whose metrics are NULL (mean = sum / NULL n_tokens). An
    empty-string doc tokenizes to the single '' token (split semantics,
    shared with the DuckDB twin) and stays scored under the unigram."""
    from taxi_data_pipeline_pset2_spark.operators.lm_score import (
        bigram_doc_logprob,
        doc_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_doc_logprob(docs).collect()}
    assert set(got) == {1, 3}
    assert got[3].n_tokens == 1
    assert got[1].mean_logprob is not None
    # sibling consistency: the unigram scorer's doc set is identical
    assert {r.doc_id for r in doc_logprob(docs).collect()} == {1, 3}
