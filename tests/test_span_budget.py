"""dup_span_dedup / token_budget_sample / domain_mix_weights: planted-dup
semantics, randomized pure-Python parity, partitioning invariance, and
plan-shape pins."""

import hashlib
import random
from collections import Counter

from pyspark.sql import functions as F

from scidbgeo_spark import model
from scidbgeo_spark.operators import curation, dedup

MD5_EMPTY = hashlib.md5(b"").hexdigest()


def _docs(spark, sf):
    return model.load_table(spark, sf, "documents")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_dup_span(texts: dict[int, str], n: int):
    toks = {i: t.split(" ") for i, t in texts.items()}
    cnt = Counter()
    for tk in toks.values():
        for s in range(len(tk) - n + 1):
            cnt[" ".join(tk[s : s + n])] += 1
    out = {}
    for i, tk in toks.items():
        starts = [
            s for s in range(len(tk) - n + 1) if cnt[" ".join(tk[s : s + n])] > 1
        ]
        cov = set()
        for s in starts:
            cov.update(range(s, s + n))
        kept = " ".join(tok for p, tok in enumerate(tk) if p not in cov)
        out[i] = (
            len(tk),
            len(starts),
            len(cov),
            hashlib.md5(kept.encode()).hexdigest(),
        )
    return out


def test_dup_span_planted_exact_copies_fully_covered(spark, sf_smoke):
    """An exact copy means every n-gram in both twins occurs >= 2 times
    corpus-wide: both the base doc (doc_id % 11 == 0) and its +200000
    copy must be 100% covered and collapse to md5('')."""
    corpus = dedup.dup_corpus(_docs(spark, sf_smoke))
    out = dedup.dup_span_dedup(corpus)
    twins = out.filter(
        ((F.col("doc_id") % 11 == 0) & (F.col("doc_id") < 100000))
        | (F.col("doc_id") >= 200000)
    ).collect()
    assert twins
    for r in twins:
        assert r.n_tokens >= dedup.DUPSPAN_N
        assert r.n_covered == r.n_tokens
        assert r.frac_covered == 1.0
        assert r.kept_fp == MD5_EMPTY


def test_dup_span_randomized_python_parity(spark):
    """Random tiny-vocab corpus (with planted shared spans, an empty doc
    and a one-token doc) vs the pure-Python positional reference."""
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for i in range(40)
    }
    shared = " ".join(rng.choice(vocab) for _ in range(9))
    texts[100] = f"{texts[3]} {shared}"
    texts[101] = f"{shared} {texts[7]}"
    texts[102] = ""
    texts[103] = "solo"
    n = 4
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_grams, r.n_covered, r.kept_fp)
        for r in dedup.dup_span_dedup(df, n=n).collect()
    }
    assert got == _py_dup_span(texts, n)


def test_dup_span_short_and_unique_docs_untouched(spark):
    """Docs shorter than n carry no grams; a unique long doc keeps its
    original fingerprint."""
    uniq = " ".join(f"only{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, uniq)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dedup.dup_span_dedup(df).collect()}
    assert rows[1].n_dup_grams == 0 and rows[1].n_covered == 0
    assert rows[1].kept_fp == hashlib.md5(b"tiny doc").hexdigest()
    assert rows[2].frac_covered == 0.0
    assert rows[2].kept_fp == hashlib.md5(uniq.encode()).hexdigest()


def test_token_budget_matches_python_greedy_and_is_partition_invariant(
    spark, sf_smoke
):
    docs = _docs(spark, sf_smoke)
    rows = docs.select("doc_id", "lang", "text").collect()
    per = {}
    for r in rows:
        pri = _md5int(f"{curation.TB_SEED}:{r.doc_id}")
        per.setdefault((r.lang, pri % curation.TB_SHARDS), []).append(
            (pri, r.doc_id, len(r.text.split(" ")))
        )
    expect = set()
    for items in per.values():
        cum = 0
        for pri, doc_id, n in sorted(items):
            cum += n
            if cum > curation.TB_SHARD_BUDGET:
                break
            expect.add(doc_id)
    got = {r.doc_id for r in curation.token_budget_sample(docs).collect()}
    assert got == expect
    got13 = {
        r.doc_id
        for r in curation.token_budget_sample(docs.repartition(13)).collect()
    }
    assert got13 == expect


def test_token_budget_respects_shard_budget(spark, sf_smoke):
    out = curation.token_budget_sample(_docs(spark, sf_smoke))
    over = out.groupBy("lang", "shard").agg(F.max("cum").alias("m")).filter(
        F.col("m") > curation.TB_SHARD_BUDGET
    )
    assert over.isEmpty()
    # exactly one exchange: the (lang, shard) window sort
    assert _plan(out).count("Exchange") == 1


def test_domain_mix_weights_inverts_the_mixture(spark, sf_smoke):
    rows = curation.domain_mix_weights(_docs(spark, sf_smoke)).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-12
    n_dom = len(rows)
    for r in rows:
        # weight * share == uniform target share
        assert abs(r.mix_weight * r.token_share - 1.0 / n_dom) < 1e-12
