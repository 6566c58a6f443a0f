"""Text / dedup / similarity operator tests (sf0.001 for speed, NumPy or
self-consistency oracles)."""

import numpy as np
from pyspark.sql import functions as F

from scidbgeo_spark import model
from scidbgeo_spark.kernels import rolling_fingerprint
from scidbgeo_spark.operators import dedup, multimodal, similarity, text


def _docs(spark, sf):
    return model.load_table(spark, sf, "documents")


def test_extract_text_byte_identical(spark, sf_correct):
    """North-rule invariant: per-url byte-identical extracted text."""
    docs = _docs(spark, sf_correct)
    pages = text.pages_from_documents(docs)
    joined = (
        text.extract_text(pages)
        .join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.col("extracted") != F.col("text"))
    )
    assert joined.count() == 0


def test_token_count_bpe_matches_python_re(spark):
    """The JVM regexp count equals Python re.findall on the same pattern
    for adversarial inputs (contractions, digit runs, punctuation runs,
    multi-space, unicode-free edge strings)."""
    import re

    samples = [
        "it's the 1990s, isn't it?  we'll see...",
        "a  b   c\t\nd",
        "don't stop!!! 123 456x7",
        "word",
        "--- ## @@@ 42",
        "I'd've thought so",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tokens_bpe for r in text.token_count_bpe(df).collect()}
    pat = re.compile(text.BPE_TOKEN_RE)
    want = {i: len(pat.findall(s)) for i, s in enumerate(samples)}
    assert got == want
    # the pattern is lossless: matches concatenate back to the input
    for s in samples:
        assert "".join(pat.findall(s)) == s


def test_quality_filter_rule_bits(spark, sf_correct):
    """Each curation rule fires its own mask bit on crafted rows, and
    the fixture corpus splits nontrivially on the defaults."""
    rows = [
        (0, " ".join(f"w{i}" for i in range(40))),  # clean -> keep
        (1, "only three words"),  # too few tokens (bit 1)
        (2, " ".join("supercalifragilistic" for _ in range(40))),  # cpt>12 (2) + lex (8)
        (3, " ".join("!!!" for _ in range(40))),  # punct (4) + lex (8); cpt ok (3.0+1... )
        (4, " ".join(["dup"] * 40)),  # low lexical diversity (8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.fail_mask) for r in text.quality_filter(df).collect()}
    assert got[0] == (True, 0)
    assert got[1][1] & text.Q_FEW_TOKENS
    assert got[2][1] & text.Q_CHARS_PER_TOKEN and got[2][1] & text.Q_LEXDIV
    assert got[3][1] & text.Q_PUNCT
    assert got[4] == (False, text.Q_LEXDIV)
    corpus = text.quality_filter(_docs(spark, sf_correct))
    kept = corpus.filter("keep").count()
    total = corpus.count()
    assert 0 < kept < total  # defaults split the fixture corpus


def test_text_quality_and_filter_survive_empty_text(spark):
    """An EMPTY document (n_chars == 0) must not kill the query: Spark's
    ANSI mode throws DIVIDE_BY_ZERO on the punct ratio where DuckDB's
    0/0 yields NULL — the guard emits NULL in both engines, the punct
    rule cannot fire, and min_tokens still rejects the doc."""
    rows = [(0, ""), (1, " ".join(f"w{i}" for i in range(40)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tq = {r.doc_id: r for r in text.text_quality(df).collect()}
    assert tq[0].punct_ratio is None and tq[0].n_chars == 0
    assert tq[1].punct_ratio == 0.0
    qf = {r.doc_id: (r.keep, r.fail_mask) for r in text.quality_filter(df).collect()}
    assert qf[0][0] is False
    assert qf[0][1] & text.Q_FEW_TOKENS
    assert not qf[0][1] & text.Q_PUNCT  # NULL ratio: rule can't fire
    assert qf[1] == (True, 0)


def test_doc_fingerprint_matches_numpy_kernel(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    got = {r.doc_id: r.fingerprint for r in text.doc_fingerprint(docs).collect()}
    rows = docs.select("doc_id", "text").collect()
    want = rolling_fingerprint([r.text for r in rows])
    for r, w in zip(rows, want):
        assert got[r.doc_id] == int(w)


def test_repetition_stats_flags_boilerplate(spark):
    """A templated doc concentrates bigram mass; natural-ish text
    spreads it.  Counts verified by hand on a tiny doc."""
    rows = [
        (0, "a b a b a b"),  # bigrams: ab,ba,ab,ba,ab -> top 3/5
        (1, "one two three four five six"),  # all distinct -> top 1/5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    assert got[0].top_bigram_n == 3 and got[0].n_bigrams == 5
    assert got[0].top_bigram_frac == 0.6
    assert got[0].n_distinct_bigrams == 2
    assert got[1].top_bigram_n == 1 and got[1].n_distinct_bigrams == 5
    assert got[1].top_bigram_frac == 0.2


def test_repetition_stats_short_docs_emit_no_row(spark):
    """Docs with < 2 tokens have no bigrams: no row, no crash.  Unguarded,
    Spark's sequence(1, 0) is the DESCENDING [1, 0] and element_at(toks, 0)
    throws 'SQL array indices start at 1' — killing the whole query the
    moment a real corpus contains a one-word or empty document."""
    rows = [
        (0, "solo"),  # single token -> sequence(1, 0) without the guard
        (1, ""),  # empty text: split gives [''] (size 1)
        (2, "a b"),  # exactly one bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    assert set(got) == {2}
    assert got[2].top_bigram_n == 1 and got[2].n_bigrams == 1


def test_url_normalize_variants_collapse(spark):
    """Scheme case, http/https, www., fragments and one trailing slash
    all normalize away; distinct pages stay distinct."""
    variants = [
        "https://Site0.example/p/1",
        "HTTP://site0.example/p/1/",
        "https://www.site0.example/p/1#frag",
        "http://www.SITE0.example/p/1",
    ]
    other = ["https://site0.example/p/2", "https://wwwx.example/p/1"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants + other)], "doc_id long, url string"
    )
    rows = {r.url_norm: (r.keep_id, r.n_copies) for r in dedup.url_dedup(df).collect()}
    assert rows["site0.example/p/1"] == (0, 4)
    assert rows["site0.example/p/2"][1] == 1
    assert rows["wwwx.example/p/1"][1] == 1  # www. strips only as a label prefix


def test_dedup_exact_finds_injected_dups(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    n = docs.count()
    corpus = dedup.dup_corpus(docs)
    res = dedup.dedup_exact(corpus).collect()
    n_dup_groups = sum(1 for r in res if r.n_copies > 1)
    n_injected = docs.filter(F.col("doc_id") % 11 == 0).count()
    assert n_dup_groups == n_injected
    assert sum(r.n_copies for r in res) == corpus.count()


def test_minhash_no_false_negatives_on_exact_dups(spark, sf_smoke):
    """An exact duplicate has identical signatures in every band — LSH can
    never miss it."""
    docs = _docs(spark, sf_smoke)
    pairs = {(r.a, r.b) for r in dedup.minhash_dup_pairs(dedup.dup_corpus(docs)).collect()}
    for r in docs.filter(F.col("doc_id") % 11 == 0).select("doc_id").collect():
        assert (r.doc_id, r.doc_id + 200000) in pairs


def test_minhash_pairs_subset_of_exact_jaccard(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    corpus = dedup.dup_corpus(docs)
    mh = {(r.a, r.b) for r in dedup.minhash_dup_pairs(corpus).collect()}
    exact = {(r.a, r.b) for r in dedup.ngram_jaccard_pairs(corpus).collect()}
    assert mh <= exact
    assert len(mh) >= 0.9 * len(exact)  # high recall at jaccard >= 0.5


def test_minhash_recall_gauge_matches_pair_sets(spark, sf_smoke):
    """The one-row recall gauge equals the arithmetic over the two pair
    sets it summarizes (and is high on the fixture)."""
    corpus = dedup.dup_corpus(_docs(spark, sf_smoke))
    mh = {(r.a, r.b) for r in dedup.minhash_dup_pairs(corpus).collect()}
    exact = {(r.a, r.b) for r in dedup.ngram_jaccard_pairs(corpus).collect()}
    row = dedup.minhash_recall(corpus).collect()[0]
    assert row.n_exact == len(exact)
    assert row.n_recovered == len(mh & exact)
    assert row.recall == len(mh & exact) / len(exact)
    assert row.recall >= 0.9


def test_minhash_recall_empty_baseline_yields_null(spark):
    """A corpus where no pair clears the Jaccard threshold gives
    (0, 0, NULL) — not a DIVIDE_BY_ZERO crash (Spark 4 ANSI mode) and
    not a spurious number; matches DuckDB's 0/0 -> NULL."""
    rows = [(0, "alpha beta gamma delta"), (1, "one two three four five")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = dedup.minhash_recall(df).collect()[0]
    assert (row.n_exact, row.n_recovered, row.recall) == (0, 0, None)


def test_every_text_op_survives_degenerate_docs(spark):
    """Sweep: EVERY text/dedup operator runs to completion on a corpus
    containing an empty doc and a one-token doc — the degenerate rows a
    real web corpus always contains, and the class Spark's ANSI mode
    turns into whole-query crashes (descending sequence(1,0), 0/0
    divisions, empty-string casts)."""
    df = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "hello world join scan " * 8)],
        "doc_id long, text string",
    )
    ops = [
        lambda: dedup.dedup_exact(df),
        lambda: dedup.minhash_signatures(df),
        lambda: dedup.minhash_bands(df),
        lambda: dedup.minhash_dup_pairs(df),
        lambda: dedup.ngram_jaccard_pairs(df),
        lambda: dedup.minhash_recall(df),
        lambda: dedup.simhash(df),
        lambda: dedup.simhash_dup_pairs(df),
        lambda: dedup.dedup_clusters(df),
        lambda: text.token_count(df),
        lambda: text.token_count_bpe(df),
        lambda: text.text_quality(df),
        lambda: text.quality_filter(df),
        lambda: text.repetition_stats(df),
        lambda: text.lang_id(df),
        lambda: text.doc_fingerprint(df),
        lambda: text.tfidf_top_terms(
            df.withColumn("lang", df.doc_id.cast("string"))
        ),
    ]
    for fn in ops:
        fn().count()  # completing without an exception IS the assertion


def test_simhash_exact_dups_equal_near_dups_close(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    sh = {r.doc_id: r.simhash for r in dedup.simhash(dedup.dup_corpus(docs)).collect()}
    for r in docs.select("doc_id").collect():
        if r.doc_id % 11 == 0:
            assert sh[r.doc_id] == sh[r.doc_id + 200000]
        if r.doc_id % 7 == 0:
            ham = bin(sh[r.doc_id] ^ sh[r.doc_id + 100000]).count("1")
            assert ham <= 6  # near-dup stays within a small Hamming ball


def test_ann_survives_zero_vector(spark, sf_correct):
    """One zero embedding (a failed encoder output) must not kill the
    query: its cosine is NULL (undefined; DuckDB's x/0), it ranks last,
    and every other neighbor ranking is unchanged."""
    from pyspark.sql import functions as F

    emb = model.load_table(spark, sf_correct, "embeddings").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(99999, [0.0] * dim)], "vec_id long, embedding array<double>"
    ).select("vec_id", F.col("embedding").cast(emb.schema["embedding"].dataType))
    with_zero = emb.unionByName(zero)
    base = {(r.q_id, r.vec_id, r.rank) for r in similarity.ann_bruteforce_topk(emb).collect()}
    got = {(r.q_id, r.vec_id, r.rank) for r in similarity.ann_bruteforce_topk(with_zero).collect()}
    assert got == base  # NULL cosine never enters any top-k


def test_ann_lsh_recall(spark, sf_correct):
    emb = model.load_table(spark, sf_correct, "embeddings")
    bf = {(r.q_id, r.vec_id) for r in similarity.ann_bruteforce_topk(emb).collect()}
    lsh = {(r.q_id, r.vec_id) for r in similarity.ann_lsh_topk(emb).collect()}
    # rank-1 self hits always recalled; overall recall is approximate
    assert len(lsh & bf) / len(bf) >= 0.3
    for q in {q for q, _ in bf}:
        assert (q, q) in lsh


def test_ann_ivf_recall(spark, sf_correct):
    emb = model.load_table(spark, sf_correct, "embeddings")
    bf = {(r.q_id, r.vec_id) for r in similarity.ann_bruteforce_topk(emb).collect()}
    ivf = {(r.q_id, r.vec_id) for r in similarity.ann_ivf_topk(emb).collect()}
    assert len(ivf & bf) / len(bf) >= 0.3
    for q in {q for q, _ in bf}:
        assert (q, q) in ivf  # self always in its own probed list


def test_embedding_neardups_exact(spark, sf_smoke):
    emb = model.load_table(spark, sf_smoke, "embeddings")
    got = {(r.a, r.b) for r in similarity.embedding_neardup_pairs(emb).collect()}
    want = {
        (r.vec_id, r.vec_id + 10000)
        for r in emb.filter(F.col("vec_id") % 5 == 0).select("vec_id").collect()
    }
    assert got == want


def test_embedding_neardup_hot_bucket_cap(spark, sf_smoke):
    """Adversarial identical-vector clump: a boilerplate clump larger than
    the bucket cap fills its bucket in EVERY table (identical vectors hash
    identically), so the cap drops all of its m^2 candidate pairs — while
    the genuine injected dups (under the cap) are still found."""
    emb = model.load_table(spark, sf_smoke, "embeddings")
    # cap 70 clears every natural fixture bucket (max 68) but the 100-wide
    # clump overflows its bucket in all tables; clump ids stay below the
    # corpus guard's 10000 offset (their %5==0 members get dup-injected
    # too — more clump mass, same capped bucket)
    clump_n = 100
    one = emb.filter(F.col("vec_id") == 1).select("embedding")
    clump = (
        spark.range(clump_n)
        .select((F.col("id") + 5000).alias("vec_id"))
        .crossJoin(F.broadcast(one))
    )
    poisoned = emb.select("vec_id", "embedding").unionAll(clump)
    got = {
        (r.a, r.b)
        for r in similarity.embedding_neardup_pairs(poisoned, bucket_cap=70).collect()
    }

    def in_clump(v):
        return 5000 <= v < 5100 or 15000 <= v < 15100

    # no clump-internal pair survives (bucket over cap in all tables) ...
    assert not any(in_clump(a) and in_clump(b) for a, b in got)
    # ... and every genuine injected fixture dup is still recovered
    want = {
        (r.vec_id, r.vec_id + 10000)
        for r in emb.filter(F.col("vec_id") % 5 == 0).select("vec_id").collect()
    }
    assert want <= got


def test_media_features_deterministic_stub(spark, sf_smoke):
    pages = text.pages_from_documents(_docs(spark, sf_smoke))
    a = {r.doc_id: r.mean_byte for r in multimodal.extract_media_features(pages).collect()}
    b = {r.doc_id: r.mean_byte for r in multimodal.extract_media_features(pages).collect()}
    assert a == b and len(a) == pages.count()
    import numpy as np

    row = pages.select("doc_id", "html").first()
    feats = multimodal.decode_stub(row.html)
    assert abs(a[row.doc_id] - feats["mean_byte"]) < 1e-12


def test_lang_id_deterministic_labels(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    res = text.lang_id(docs)
    assert res.count() == docs.count()
    langs = {r.lang_pred for r in res.collect()}
    assert langs <= {lang for lang, _ in text.LANG_MARKERS}


def test_corpus_curation_never_uses_ngram_selfjoin(spark, sf_smoke, monkeypatch):
    """The curation composite must route near-dup removal through
    MinHash+LSH only — constructing OR running it may never touch the
    exploded ngram self-join (baseline/verification-only operator)."""
    import __spark_entry__ as e

    def _forbidden(*a, **kw):
        raise AssertionError("curation path built the exploded ngram self-join")

    monkeypatch.setattr(dedup, "ngram_jaccard_pairs", _forbidden)
    out = e.q_corpus_curation(spark, sf_smoke)
    assert out.count() > 0


def test_corpus_curation_drops_near_dups(spark, sf_smoke):
    """The injected 'mutated' near-copies (doc_id+100000) must be gone
    from the curated corpus while their originals survive curation's
    dedup stages (quality filtering aside)."""
    import __spark_entry__ as e

    docs = _docs(spark, sf_smoke)
    corpus = dedup.dup_corpus(docs)
    keep = dedup.dedup_exact(corpus).selectExpr("keep_id AS doc_id")
    kept_ids = {
        r.doc_id
        for r in corpus.join(keep, "doc_id")
        .join(dedup.near_dup_drop_ids(corpus), "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    }
    near_sources = {
        r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0).collect()
    }
    assert not any(d + 100000 in kept_ids for d in near_sources)
    # originals survive unless they are themselves the b-side of a
    # genuine (naturally occurring) near-dup pair
    dropped = {r.doc_id for r in dedup.near_dup_drop_ids(corpus).collect()}
    assert near_sources - dropped <= kept_ids


def test_simhash_dup_pairs_complete_for_exact_dups(spark, sf_smoke):
    """Pigeonhole completeness: hamming(a, b) <= BLOCKS-1 implies one
    equal block, so every exact duplicate (hamming 0) must be a pair."""
    docs = _docs(spark, sf_smoke)
    pairs = {
        (r.a, r.b): r.hamming
        for r in dedup.simhash_dup_pairs(dedup.dup_corpus(docs)).collect()
    }
    for r in docs.filter(F.col("doc_id") % 11 == 0).select("doc_id").collect():
        assert pairs.get((r.doc_id, r.doc_id + 200000)) == 0
    # verify is exact: no reported pair exceeds the threshold
    assert all(h <= 3 for h in pairs.values())


def test_dedup_clusters_match_union_find(spark, sf_correct):
    """dedup_clusters equals an independent union-find over the verified
    pair graph: transitive closure (A~B, B~C -> one cluster even without
    A~C), cluster id = component min, singletons present."""
    corpus = dedup.dup_corpus(_docs(spark, sf_correct))
    pairs = [(r.a, r.b) for r in dedup.minhash_dup_pairs(corpus).collect()]
    docs = [r.doc_id for r in corpus.select("doc_id").collect()]
    parent = {d: d for d in docs}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in docs}
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(corpus).collect()}
    assert got == want
    # the fixture corpus genuinely contains non-trivial clusters
    assert any(v != k for k, v in got.items())


def test_tfidf_top_terms_ranked_per_lang(spark, sf_correct):
    rows = text.tfidf_top_terms(_docs(spark, sf_correct)).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
    # common terms (in every doc) must score below distinctive ones
    assert len(by_lang) >= 2


def test_tfidf_builder_runs_no_job(spark, sf_correct):
    """Building the tfidf plan must be pure plan construction: N_docs is
    a 1-row aggregate cross-joined into the plan, not a driver-side
    .count() (which would execute the whole upstream corpus pipeline an
    extra time per invocation at 100 TB)."""
    docs = _docs(spark, sf_correct)  # source loading may read footers
    group = "tfidf-build-probe"
    sc = spark.sparkContext
    sc.setJobGroup(group, "plan-only probe")
    try:
        df = text.tfidf_top_terms(docs)
        assert sc.statusTracker().getJobIdsForGroup(group) == []
    finally:
        sc.setJobGroup(None, None)
    # and the plan still executes correctly after the de-action change
    assert df.count() > 0


def test_cluster_drop_superset_and_chain_case(spark, sf_correct):
    """cluster_drop_ids is a superset of the pairwise b-drop, drops
    exactly every non-canonical cluster member, and keeps one canonical
    survivor per cluster."""
    corpus = dedup.dup_corpus(_docs(spark, sf_correct))
    b_drop = {r.doc_id for r in dedup.near_dup_drop_ids(corpus).collect()}
    c_drop = {r.doc_id for r in dedup.cluster_drop_ids(corpus).collect()}
    assert b_drop <= c_drop
    clusters = {r.doc_id: r.cluster for r in dedup.dedup_clusters(corpus).collect()}
    assert c_drop == {d for d, c in clusters.items() if d != c}
    survivors = set(clusters.values())
    assert survivors.isdisjoint(c_drop)


# ---- curation operators (contamination / PII / sampling / packing) ----

from scidbgeo_spark.operators import curation  # noqa: E402


def test_contamination_flags_planted_copies(spark, sf_correct):
    """Exact (+200000) and mutated (+100000) variants of benchmark docs
    must be flagged; the benchmark docs themselves are excluded from the
    corpus side, and a corpus of unrelated docs yields no self-hits."""
    docs = _docs(spark, sf_correct)
    eval_docs = docs.filter(F.col("doc_id") % curation.EVAL_MOD == curation.EVAL_REM)
    corpus = dedup.dup_corpus(docs).filter(
        ~(
            (F.col("doc_id") % curation.EVAL_MOD == curation.EVAL_REM)
            & (F.col("doc_id") < 100000)
        )
    )
    hits = {
        r.doc_id: r.n_hits
        for r in curation.contamination_check(corpus, eval_docs.select("doc_id", "text")).collect()
    }
    eval_ids = {r.doc_id for r in eval_docs.select("doc_id").collect()}
    planted = {i + 200000 for i in eval_ids if i % 11 == 0} | {
        i + 100000 for i in eval_ids if i % 7 == 0
    }
    assert planted, "fixture must plant at least one contaminated copy"
    assert planted <= set(hits), f"missed planted contamination: {planted - set(hits)}"
    # a mutated copy shares every interior shingle => large hit counts
    assert all(hits[d] >= 1 for d in planted)
    # benchmark doc_ids themselves never appear (they left the corpus)
    assert not (set(hits) & eval_ids)


def test_contamination_empty_eval_set(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    empty = docs.filter(F.lit(False)).select("doc_id", "text")
    assert curation.contamination_check(dedup.dup_corpus(docs), empty).count() == 0


def test_pii_redact_counts_and_fingerprint(spark):
    rows = [
        (1, "reach me at alice.b@corp.example please"),
        (2, "call +1-555-0199 or +1-555-0200"),
        (3, "bob@x.io and carol@y.org then +1-555-1234"),
        (4, "no pii here"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in curation.pii_redact(df).collect()}
    assert (got[1].n_emails, got[1].n_phones) == (1, 0)
    assert (got[2].n_emails, got[2].n_phones) == (0, 2)
    assert (got[3].n_emails, got[3].n_phones) == (2, 1)
    assert (got[4].n_emails, got[4].n_phones) == (0, 0)
    assert (got[5].n_emails, got[5].n_phones) == (0, 0)
    import hashlib

    expected = hashlib.md5(b"<EMAIL> and <EMAIL> then <PHONE>").hexdigest()
    assert got[3].redacted_fp == expected


def test_stratified_sample_deterministic_and_stratified(spark, sf_correct):
    docs = _docs(spark, sf_correct)
    s1 = curation.stratified_sample(docs)
    s2 = curation.stratified_sample(docs)
    a = sorted(r.doc_id for r in s1.collect())
    b = sorted(r.doc_id for r in s2.collect())
    assert a == b and len(a) > 0
    # empirical rate per stratum within a loose band of the target
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, tot in totals.items():
        if tot < 30:
            continue
        rate = curation.SAMPLE_RATES.get(lang, curation.RATE_DEFAULT) / 1000
        assert abs(kept.get(lang, 0) / tot - rate) < 0.25


def test_pack_sequences_chunk_invariants(spark, sf_correct):
    """Chunks partition each shard's doc stream contiguously; every chunk
    except a shard's last begins before the budget boundary it fills."""
    docs = _docs(spark, sf_correct)
    out = curation.pack_sequences(docs).collect()
    n_docs_total = docs.count()
    assert sum(r.n_docs for r in out) == n_docs_total
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, chunks in by_shard.items():
        chunks.sort(key=lambda r: r.chunk_id)
        # doc-id ranges are contiguous and non-overlapping across chunks
        for prev, cur in zip(chunks, chunks[1:]):
            assert prev.last_doc < cur.first_doc
            assert cur.chunk_id > prev.chunk_id
        # token conservation per shard
        want = (
            docs.filter(F.col("doc_id") % curation.PACK_SHARDS == shard)
            .select(F.sum(F.size(F.split("text", " "))).alias("s"))
            .collect()[0]
            .s
        )
        assert sum(r.n_tokens for r in chunks) == want


def test_pack_sequences_exact_boundary(spark):
    """Docs of exactly budget tokens: each lands in its own chunk id."""
    budget = curation.PACK_BUDGET
    text = " ".join(["w"] * budget)
    df = spark.createDataFrame([(i * curation.PACK_SHARDS, text) for i in range(3)],
                               "doc_id long, text string")
    out = sorted(curation.pack_sequences(df).collect(), key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert all(r.n_docs == 1 and r.n_tokens == budget for r in out)


def test_url_dedup_latest_newest_wins(spark):
    """max_by keeps the newest capture even when it has the SMALLER id
    (so the result provably differs from min-id url_dedup)."""
    rows = [
        (1, "https://a.example/p", 500),   # newest, smaller id
        (2, "http://www.a.example/p/", 100),
        (3, "https://b.example/", 50),
        (4, "HTTPS://b.example", 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    got = {r.url_norm: r for r in dedup.url_dedup_latest(df).collect()}
    assert got["a.example/p"].keep_id == 1
    assert got["a.example/p"].latest_ts == 500
    assert got["a.example/p"].n_captures == 2
    assert got["b.example"].keep_id == 3
    assert got["b.example"].n_captures == 2


def test_resize_blob_numpy_parity(spark, sf_smoke):
    """Block-8 resize stub matches a pure-NumPy reference per doc."""
    pages = text.pages_from_documents(_docs(spark, sf_smoke))
    got = {r.doc_id: r for r in multimodal.resize_blob(pages).collect()}
    for row in pages.select("doc_id", "html").collect():
        b = np.frombuffer(row.html, dtype=np.uint8)
        nb = b.size // 8
        sums = b[: nb * 8].reshape(nb, 8).sum(axis=1, dtype=np.int64)
        acc = 0
        for s in sums.tolist():
            acc = (acc * 1000003 + s) % 2147483647
        r = got[row.doc_id]
        assert r.n_blocks == nb
        assert r.blocks_checksum == acc
        assert r.mean_byte_resized == float(int(sums.sum())) / (nb * 8)


def test_resize_blob_short_payload_null_mean(spark):
    """A payload shorter than the block factor yields zero blocks and a
    NULL mean (matching DuckDB's guarded CASE) instead of crashing."""
    df = spark.createDataFrame([(1, b"abc"), (2, b"")], "doc_id long, html binary")
    got = {r.doc_id: r for r in multimodal.resize_blob(df).collect()}
    for r in got.values():
        assert r.n_blocks == 0
        assert r.mean_byte_resized is None
        assert r.blocks_checksum == 0


def test_frame_sample_stride_and_truncation(spark, sf_smoke):
    """Every 4th 16-byte frame, nothing past the truncated tail, hashes
    match a pure-Python reference."""
    pages = text.pages_from_documents(_docs(spark, sf_smoke))
    out = multimodal.frame_sample(pages).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for row in pages.select("doc_id", "html").collect():
        b = row.html
        n_frames = len(b) // 16
        rows = sorted(by_doc.get(row.doc_id, []), key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, n_frames, 4))
        for r in rows:
            fr = b[r.frame_idx * 16 : (r.frame_idx + 1) * 16]
            acc = 0
            for v in fr:
                acc = (acc * 257 + v) % 2147483647
            assert r.frame_hash == acc
            assert r.frame_mean == float(sum(fr)) / 16


def test_frame_sample_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, b"x" * 64)], "doc_id long, html binary")
    with pytest.raises(ValueError):
        multimodal.frame_sample(df, stride=0)
    with pytest.raises(ValueError):
        multimodal.resize_blob(df, factor=0)


# ---- incremental dedup + bloom prefilter --------------------------------


def test_incremental_dedup_semantics(spark, sf_correct):
    """Re-crawls of frozen pages vanish, near-mutants and fresh pages
    survive, and the twice-captured fresh pages collapse to the lower id
    with n_batch_copies=2."""
    from scidbgeo_spark.operators import dedup

    docs = _docs(spark, sf_correct)
    out = dedup.incremental_dedup(docs, dedup.crawl_batch(docs))
    rows = {r["keep_id"]: r["n_batch_copies"] for r in out.collect()}
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    # every exact re-crawl (id%11 -> +200000) is dropped
    assert not any(200000 <= k < 300000 for k in rows)
    # every near-mutant survives as a singleton
    for i in ids:
        if i % 7 == 0:
            assert rows[i + 100000] == 1
    # fresh pages: captured twice iff id%10==0 -> keep the +300000 copy
    for i in ids:
        if i % 5 == 0:
            assert rows[i + 300000] == (2 if i % 10 == 0 else 1)
            assert i + 400000 not in rows


def test_bloom_prefilter_no_false_negatives_and_broadcast(spark, sf_correct):
    """Bloom invariant: seen => maybe_seen (no false negatives, ever);
    the bitmap probe join must be a broadcast (the batch side never
    shuffles on a bitmap lookup)."""
    from scidbgeo_spark.operators import dedup

    docs = _docs(spark, sf_correct)
    out = dedup.bloom_prefilter(docs, dedup.crawl_batch(docs))
    rows = out.collect()
    assert any(r["seen"] for r in rows)  # re-crawls exist
    assert not any(r["seen"] and not r["maybe_seen"] for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_bitmap_bounded(spark, sf_correct):
    """The build aggregates to at most BLOOM_WORDS rows regardless of
    corpus size — the broadcastable-summary property."""
    from scidbgeo_spark.operators import dedup

    bm = dedup.bloom_build(_docs(spark, sf_correct))
    assert bm.count() <= dedup.BLOOM_WORDS


def test_kmeans_assign_partitioning_invariant(spark, sf_correct):
    """The whole point of the scaled-integer design: the assignment is
    bit-stable across input partitionings (exact integer sums are
    order-free), unlike a double-accumulation KMeans."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import similarity

    emb = model.load_table(spark, sf_correct, "embeddings")
    a = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.kmeans_assign(emb).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.kmeans_assign(emb.repartition(7)).collect()
    )
    assert a == b
    assert len(a) == emb.count()
    assert len({c for _, c in a}) <= similarity.KMEANS_K


def test_hll_shingle_ndv_error_band(spark, sf_correct):
    """HLL with 1024 registers in its valid regime (ndv >= 2.5m):
    relative error ~ 1.04/sqrt(1024) ~ 3.3%; assert a 4-sigma band."""
    from scidbgeo_spark.operators import dedup

    row = dedup.hll_shingle_ndv(dedup.dup_corpus(_docs(spark, sf_correct))).collect()[0]
    assert row["n_registers_hit"] <= dedup.HLL_M
    assert row["true_ndv"] >= 2.5 * dedup.HLL_M  # raw-estimator regime
    rel = abs(row["hll_estimate"] - row["true_ndv"]) / row["true_ndv"]
    assert rel < 0.13, (row["hll_estimate"], row["true_ndv"])


def test_cms_overestimate_property(spark, sf_correct):
    """Count-min invariant: estimate >= truth for EVERY probe, and the
    overshoot is bounded by 2N/W at 4 rows with high probability (assert
    a loose 8N/W)."""
    from scidbgeo_spark.operators import text as text_ops

    docs = _docs(spark, sf_correct)
    rows = text_ops.cms_heavy_hitters(docs).collect()
    assert len(rows) == 10
    n_total = docs.selectExpr("sum(size(split(text, ' '))) AS n").collect()[0]["n"]
    for r in rows:
        assert r["cms_estimate"] >= r["true_count"], r
        assert r["cms_estimate"] - r["true_count"] <= 8 * n_total / text_ops.CMS_W, r


def test_host_pagerank_mass_and_invariance(spark, sf_correct):
    """Rank mass stays within (teleport-only, full) bounds — floor
    divisions only ever LOSE mass — and the all-integer iteration is
    bit-stable across input partitionings."""
    from scidbgeo_spark.operators import graph

    docs = _docs(spark, sf_correct)
    a = sorted(
        (r["source"], r["rank_scaled"])
        for r in graph.host_pagerank(docs).collect()
    )
    b = sorted(
        (r["source"], r["rank_scaled"])
        for r in graph.host_pagerank(docs.repartition(7)).collect()
    )
    assert a == b
    total = sum(rk for _, rk in a)
    assert graph.PR_SCALE * 0.14 < total <= graph.PR_SCALE
    assert all(rk > 0 for _, rk in a)


def test_inverted_index_shape_and_single_shuffle(spark, sf_correct):
    """Posting heads are capped, ascending, and the rank filter + final
    aggregate share ONE term-keyed exchange (plus the (term,doc) tf
    aggregate's): more would mean the cap cost a second shuffle."""
    from scidbgeo_spark.operators import text as text_ops

    docs = _docs(spark, sf_correct)
    out = text_ops.inverted_index(docs)
    # plan BEFORE execution: AQE's finalized plan re-prints exchanges
    # inside query stages, double-counting them
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan.count("Exchange")
    rows = out.collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings_head"].split(",")]
        assert len(ids) <= text_ops.IDX_POSTING_CAP
        assert ids == sorted(ids)
        assert r["df"] >= text_ops.IDX_MIN_DF >= len(ids) or r["df"] >= len(ids)


def test_sq8_codes_bounded_and_recall_high(spark, sf_correct):
    """SQ8 codes stay in [0,255]; top-1 is always the query itself
    (distance 0 to its own code); recall@5 vs full precision is high on
    the fixture (quantization of 64 dims to 8 bits rarely reorders a
    top-5)."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import similarity

    emb = model.load_table(spark, sf_correct, "embeddings")
    qz = similarity._sq8_quantize(emb, similarity._sq8_stats(emb))
    import pyspark.sql.functions as F

    bad = qz.filter(
        F.exists("q", lambda v: (v < 0) | (v > similarity.SQ8_LEVELS))
    ).count()
    assert bad == 0
    topk = similarity.ann_sq8_topk(emb).collect()
    top1 = {r["q_id"]: r["vec_id"] for r in topk if r["rank"] == 1}
    assert top1 == {q: q for q in top1}
    bf = similarity.ann_bruteforce_topk(emb).collect()
    bf_sets: dict = {}
    ap_sets: dict = {}
    for r in bf:
        bf_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    for r in topk:
        ap_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = sum(
        len(bf_sets[q] & ap_sets[q]) for q in bf_sets
    ) / sum(len(v) for v in bf_sets.values())
    assert recall >= 0.8, recall


def test_kmeans_matches_sequential_numpy_reference(spark):
    """Randomized parity: the distributed two-round Lloyd equals a
    sequential NumPy implementation of the same algorithm bit for bit
    (exact integer round-1 distances; round-2 fold replayed in the same
    left-fold order)."""
    import numpy as np

    from scidbgeo_spark.operators import similarity

    for seed in (7, 91, 2024):
        rng = np.random.default_rng(seed)
        n, dim, k = 120, similarity.DIM, similarity.KMEANS_K
        emb = (rng.random((n, dim), dtype=np.float32) - 0.5).astype(np.float32)

        sv = np.floor(emb.astype(np.float64) * similarity.KMEANS_SCALE).astype(
            np.int64
        )
        c0 = sv[:k]
        d1 = ((sv[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
        a1 = d1.argmin(1)  # first min == lowest cid tie-break
        cids = sorted(set(a1.tolist()))
        cents = np.stack(
            [sv[a1 == j].sum(0) / (a1 == j).sum() for j in cids]
        )
        acc = np.zeros((n, len(cids)))
        for i in range(dim):  # same left-fold order as the Spark aggregate
            acc += (sv[:, i, None].astype(np.float64) - cents[None, :, i]) ** 2
        want = {v: cids[j] for v, j in enumerate(acc.argmin(1))}

        df = spark.createDataFrame(
            [(int(i), [float(x) for x in emb[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        got = {
            r["vec_id"]: r["cluster"]
            for r in similarity.kmeans_assign(df).collect()
        }
        assert got == want, seed


def test_cms_matches_python_counter_reference(spark):
    """Randomized parity: sketch estimates equal a pure-Python count-min
    built with the identical md5-affine cells; truths equal Counter."""
    import hashlib
    import random
    from collections import Counter

    from scidbgeo_spark.operators import text as text_ops

    rng = random.Random(13)
    vocab = [f"t{j}" for j in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30)))) for i in range(60)
    ]

    def cells(tok):
        hp = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % text_ops.FP_MOD
        return [
            (j, ((hp * text_ops.CMS_A[j] + text_ops.CMS_B[j]) % text_ops.FP_MOD) % text_ops.CMS_W)
            for j in range(text_ops.CMS_D)
        ]

    counts = Counter(t for _, txt in docs for t in txt.split(" "))
    grid: Counter = Counter()
    for t, n in counts.items():
        for cell in cells(t):
            grid[cell] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        t: (n, min(grid[c] for c in cells(t))) for t, n in top
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["token"]: (r["true_count"], r["cms_estimate"])
        for r in text_ops.cms_heavy_hitters(df).collect()
    }
    assert got == want


def test_lm_quality_score_matches_python_counter(spark):
    """Exact parity with a sequential Counter reference: mean corpus
    frequency and rare fraction per doc, including the single-token and
    repeated-token edges."""
    from collections import Counter

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "zyx",  # single rare token
        4: "the the the",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in text.lm_quality_score(docs).collect()
    }
    corpus = Counter(tok for t in texts.values() for tok in t.split(" "))
    for i, t in texts.items():
        toks = t.split(" ")
        sum_freq = sum(corpus[tok] for tok in toks)
        n_rare = sum(1 for tok in toks if corpus[tok] <= text.LM_RARE_MAX)
        r = out[i]
        assert r["n_toks"] == len(toks)
        assert r["sum_freq"] == sum_freq
        assert r["mean_freq"] == sum_freq / len(toks)
        assert r["rare_frac"] == n_rare / len(toks)


def _boiler_reference(rows, n=5, min_docs=3):
    """Sequential reference for boilerplate_spans: per-source n-grams in
    >= min_docs distinct docs; coverage + cleaned md5 per doc."""
    import hashlib
    from collections import defaultdict

    grams = defaultdict(set)  # (source, gram) -> doc_ids
    toks = {}
    for doc_id, source, txt in rows:
        t = txt.split(" ")
        toks[doc_id] = (source, t)
        for s in range(len(t) - n + 1):
            grams[(source, " ".join(t[s : s + n]))].add(doc_id)
    boiler = {k for k, ids in grams.items() if len(ids) >= min_docs}
    out = {}
    for doc_id, (source, t) in toks.items():
        covered = set()
        for s in range(len(t) - n + 1):
            if (source, " ".join(t[s : s + n])) in boiler:
                covered.update(range(s, s + n))
        kept = " ".join(tok for i, tok in enumerate(t) if i not in covered)
        out[doc_id] = (
            len(t),
            len(covered),
            hashlib.md5(kept.encode()).hexdigest(),
        )
    return out


def test_boilerplate_spans_strips_planted_template(spark, sf_correct):
    """Full parity with the sequential reference over the planted-chrome
    corpus: every doc's coverage count and cleaned fingerprint match,
    and every planted doc's 8-token template is fully covered."""
    docs = model.load_table(spark, sf_correct, "documents")
    planted = text.boiler_corpus(docs)
    rows = [
        (r["doc_id"], r["source"], r["text"])
        for r in planted.select("doc_id", "source", "text").collect()
    ]
    ref = _boiler_reference(rows)
    out = {r["doc_id"]: r for r in text.boilerplate_spans(planted).collect()}
    assert set(out) == set(ref)
    n_planted = 0
    for doc_id, (nt, ncov, fp) in ref.items():
        r = out[doc_id]
        assert r["n_tokens"] == nt
        assert r["n_boiler"] == ncov, doc_id
        assert r["clean_fp"] == fp, doc_id
        if doc_id % 3 < 2:
            n_planted += 1
            assert r["n_boiler"] >= 8  # whole prepended template covered
    assert n_planted > 0


def test_boilerplate_spans_threshold_and_short_docs(spark):
    """A 5-gram shared by only 2 docs of a source stays (min_docs=3);
    the same gram in a third doc of ANOTHER source does not cross the
    source boundary; sub-n docs pass through untouched."""
    import hashlib

    rows = [
        (1, "srcA", "a b c d e x1"),
        (2, "srcA", "a b c d e x2"),
        (3, "srcA", "a b c d e x3"),
        (4, "srcB", "a b c d e y1"),
        (5, "srcB", "a b c d e y2"),
        (6, "srcB", "tiny doc"),
        (7, "srcB", "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in text.boilerplate_spans(docs).collect()}
    ref = _boiler_reference(rows)
    for doc_id, (nt, ncov, fp) in ref.items():
        assert out[doc_id]["n_tokens"] == nt
        assert out[doc_id]["n_boiler"] == ncov
        assert out[doc_id]["clean_fp"] == fp
    # and the scenario is what we think it is:
    assert out[1]["n_boiler"] == 5  # srcA template covered
    assert out[1]["clean_fp"] == hashlib.md5(b"x1").hexdigest()
    for i, txt in [(4, "a b c d e y1"), (5, "a b c d e y2"),
                   (6, "tiny doc"), (7, "solo")]:
        assert out[i]["n_boiler"] == 0
        assert out[i]["clean_fp"] == hashlib.md5(txt.encode()).hexdigest()


def test_crawl_delta_all_four_statuses(spark):
    """Hand-built snapshots exercise added/removed/changed/unchanged,
    url canonicalization applies before the diff, and absent sides
    surface as -1 (never NULL/NaN)."""
    old = spark.createDataFrame(
        [
            (1, "https://a.example/p/1", "alpha"),
            (2, "https://a.example/p/2/", "beta"),
            (3, "https://www.a.example/p/3", "gamma"),
        ],
        "doc_id long, url string, text string",
    )
    new = spark.createDataFrame(
        [
            (11, "http://A.example/p/1", "alpha"),  # unchanged (canon match)
            (13, "https://a.example/p/3", "gamma EDITED"),  # changed
            (14, "https://a.example/p/4", "delta"),  # added
        ],
        "doc_id long, url string, text string",
    )
    got = {r["url_norm"]: r for r in dedup.crawl_delta(old, new).collect()}
    assert got["a.example/p/1"]["status"] == "unchanged"
    assert got["a.example/p/1"]["old_id"] == 1 and got["a.example/p/1"]["new_id"] == 11
    assert got["a.example/p/2"]["status"] == "removed"
    assert got["a.example/p/2"]["new_id"] == -1
    assert got["a.example/p/3"]["status"] == "changed"
    assert got["a.example/p/4"]["status"] == "added"
    assert got["a.example/p/4"]["old_id"] == -1
    assert len(got) == 4


def test_pq_encode_and_adc_properties(spark, sf_correct):
    """PQ structure: every vector gets exactly PQ_M codes in [0, PQ_K);
    a codebook vector encodes to ITSELF in every subspace (distance 0);
    ADC top-1 for a codebook-member query is the query itself; recall
    vs brute force is positive."""
    from scidbgeo_spark.operators import similarity as sim

    emb = model.load_table(spark, sf_correct, "embeddings")
    codes = sim.pq_encode(emb).collect()
    n_vec = emb.count()
    assert len(codes) == n_vec * sim.PQ_M
    assert all(0 <= r["code"] < sim.PQ_K for r in codes)
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    for vid in range(sim.PQ_K):  # codebook members self-encode
        assert by_vec[vid] == {m: vid for m in range(sim.PQ_M)}, vid
    top = {
        (r["q_id"], r["rank"]): r["vec_id"]
        for r in sim.ann_pq_topk(emb).collect()
    }
    for q in range(8):  # query IS a codebook member -> ADC dist 0 to itself
        assert top[(q, 1)] == q


def test_boilerplate_spans_randomized_python_parity(spark):
    """Randomized corpora (tiny vocab -> organic cross-doc n-gram
    collisions, random sources, doc lengths 0-14 tokens) against the
    sequential reference — seeds fixed, 3 corpora x 60 docs."""
    import random

    vocab = ["a", "b", "c", "d"]
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        rows = [
            (
                i,
                f"src{rng.randrange(3)}",
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(15))),
            )
            for i in range(60)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        ref = _boiler_reference(rows)
        out = {
            r["doc_id"]: (r["n_tokens"], r["n_boiler"], r["clean_fp"])
            for r in text.boilerplate_spans(docs).collect()
        }
        assert out == ref, seed


def test_crawl_delta_randomized_python_parity(spark):
    """Random old/new snapshots (overlapping url spaces, random edits)
    against a dict-diff reference."""
    import hashlib
    import random

    for seed in (5, 17):
        rng = random.Random(seed)
        old_rows = [
            (i, f"https://s.example/p/{rng.randrange(40)}", f"t{rng.randrange(6)}")
            for i in range(30)
        ]
        new_rows = [
            (100 + i, f"https://s.example/p/{rng.randrange(40)}", f"t{rng.randrange(6)}")
            for i in range(30)
        ]
        # crawl_delta requires one capture per canonical url per side
        o = {u: (i, t) for i, u, t in old_rows}
        n = {u: (i, t) for i, u, t in new_rows}
        old = spark.createDataFrame(
            [(i, u, t) for u, (i, t) in o.items()], "doc_id long, url string, text string"
        )
        new = spark.createDataFrame(
            [(i, u, t) for u, (i, t) in n.items()], "doc_id long, url string, text string"
        )
        got = {
            r["url_norm"]: (r["status"], r["old_id"], r["new_id"])
            for r in dedup.crawl_delta(old, new).collect()
        }
        want = {}
        for u in set(o) | set(n):
            key = u.replace("https://", "")
            if u not in n:
                want[key] = ("removed", o[u][0], -1)
            elif u not in o:
                want[key] = ("added", -1, n[u][0])
            elif o[u][1] != n[u][1]:
                want[key] = ("changed", o[u][0], n[u][0])
            else:
                want[key] = ("unchanged", o[u][0], n[u][0])
        assert got == want, seed


def test_lang_drift_and_dup_rate_arithmetic(spark, sf_correct):
    """Drift = new share - old share per language, shares sum to 1 in
    each half; dup_rate matches the planted-dup construction (every
    doc_id % 11 == 0 doc gains one exact copy in 'injected')."""
    import __spark_entry__ as e

    docs = _docs(spark, sf_correct).collect()
    old = [r for r in docs if r["doc_id"] % 2 == 0]
    new = [r for r in docs if r["doc_id"] % 2 == 1]
    drift = {r["lang"]: r for r in e.queries()["lang_drift"](spark, sf_correct).collect()}
    assert abs(sum(r["share_old"] for r in drift.values()) - 1.0) < 1e-12
    assert abs(sum(r["share_new"] for r in drift.values()) - 1.0) < 1e-12
    for lang, r in drift.items():
        n_o = sum(1 for d in old if d["lang"] == lang)
        n_n = sum(1 for d in new if d["lang"] == lang)
        assert (r["n_old"], r["n_new"]) == (n_o, n_n)
        assert r["drift"] == n_n / len(new) - n_o / len(old)

    rates = {
        r["source"]: r
        for r in e.queries()["dup_rate_by_source"](spark, sf_correct).collect()
    }
    # injected bucket: the exact copies (id%11) collide with their base
    # text only within a source bucket if the base is there — they land
    # in 'injected' with the near-dups, all distinct from each other
    assert "injected" in rates
    for src, r in rates.items():
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["n_distinct"] <= r["n_docs"]


def test_vocab_growth_vs_python(spark, sf_smoke):
    """Pure-Python twin of the Heaps-law shingle-vocabulary curve, and
    the structural invariants: buckets partition the vocabulary, the
    cumulative column is the running sum, and growth is sub-linear
    (later slices introduce no more than the first)."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import text as text_mod

    docs = model.load_table(spark, sf_smoke, "documents")
    rows = docs.select("doc_id", "text").collect()
    n_docs = len(rows)
    first = {}
    for r in rows:
        toks = r.text.split(" ")
        k = 3
        sh = {
            " ".join(toks[i : i + k])
            for i in range(max(len(toks) - k, 0) + 1)
        }
        for s in sh:
            if s not in first or r.doc_id < first[s]:
                first[s] = r.doc_id
    want = {}
    for d in first.values():
        b = min(d * 10 // n_docs, 9)
        want[b] = want.get(b, 0) + 1
    got = {
        r.bucket: r.new_terms
        for r in text_mod.vocab_growth(docs).collect()
    }
    assert got == want
    out = sorted(
        (r.bucket, r.new_terms, r.vocab_cum)
        for r in text_mod.vocab_growth(docs).collect()
    )
    run = 0
    for b, new, cum in out:
        run += new
        assert cum == run
    assert out[0][1] == max(v for _, v, _ in out)


def test_host_degree_stats_vs_python(spark, sf_smoke):
    """Pure-Python twin of the host degree/reciprocity profile, plus
    the handshake identities: sum(out_deg) == sum(in_deg) == |edges|,
    sum(out_w) == sum(in_w) == |docs|, and reciprocity is symmetric in
    total (sum over hosts counts each mutual pair twice... once per
    direction)."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import graph

    docs = model.load_table(spark, sf_smoke, "documents")
    rows = docs.select("doc_id", "source").collect()
    n = len(rows)
    src_of = {r.doc_id: r.source for r in rows}
    w = {}
    for r in rows:
        e = (r.source, src_of[(r.doc_id * 7 + 3) % n])
        w[e] = w.get(e, 0) + 1
    hosts = {h for e in w for h in e}
    want = {}
    for h in hosts:
        outs = [e for e in w if e[0] == h]
        ins = [e for e in w if e[1] == h]
        recip = sum(1 for e in outs if (e[1], e[0]) in w)
        want[h] = (
            len(outs),
            len(ins),
            sum(w[e] for e in outs),
            sum(w[e] for e in ins),
            recip,
        )
    got = {
        r.host: (r.out_deg, r.in_deg, r.out_w, r.in_w, r.n_reciprocal)
        for r in graph.host_degree_stats(docs).collect()
    }
    assert got == want
    assert sum(v[0] for v in want.values()) == sum(v[1] for v in want.values()) == len(w)
    assert sum(v[2] for v in want.values()) == sum(v[3] for v in want.values()) == n


def test_doc_novelty_vs_python(spark, sf_smoke):
    """Python twin + identities: doc 0 is fully novel; counts aggregate
    to the shingle-vocabulary size (sum of n_novel == distinct
    shingles); exact duplicate of an earlier doc scores 0."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import text as text_mod

    docs = model.load_table(spark, sf_smoke, "documents")
    rows = sorted(docs.select("doc_id", "text").collect(), key=lambda r: r.doc_id)
    first = {}
    sh_of = {}
    for r in rows:
        toks = r.text.split(" ")
        sh = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}
        sh_of[r.doc_id] = sh
        for s in sh:
            if s not in first or r.doc_id < first[s]:
                first[s] = r.doc_id
    want = {
        d: (
            len(sh),
            sum(1 for s in sh if first[s] == d),
        )
        for d, sh in sh_of.items()
    }
    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
        for r in text_mod.doc_novelty(docs).collect()
    }
    assert {d: v[:2] for d, v in got.items()} == want
    for d, (ns, nn, nov) in got.items():
        assert nov == nn / ns
    assert got[rows[0].doc_id][1] == got[rows[0].doc_id][0]  # doc 0 all-novel
    assert sum(v[1] for v in want.values()) == len(first)


def test_phrase_search_vs_python(spark, sf_smoke):
    """Python twin of the positional phrase query: overlapping adjacent
    occurrences of "table key" counted identically, 0-based first_pos."""
    docs = _docs(spark, sf_smoke)
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        hits = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == "table" and toks[i + 1] == "key"
        ]
        if hits:
            want[r.doc_id] = (len(hits), hits[0])
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in text.phrase_search(docs).collect()
    }
    assert got == want
    assert want  # the fixture corpus actually contains the phrase


def test_doc_chunks_vs_python_and_coverage(spark, sf_smoke):
    """Python twin of the 64/48 training-window chunking + coverage
    property: every token position falls in >= 1 window and chunk_no
    is the dense 0-based window ordinal."""
    import hashlib

    docs = _docs(spark, sf_smoke)
    chunk, stride = 64, 48
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        n = len(toks)
        covered = set()
        for cno, start in enumerate(range(0, n, stride)):
            win = toks[start : start + chunk]
            covered.update(range(start, min(start + chunk, n)))
            want[(r.doc_id, cno)] = (
                start,
                len(win),
                hashlib.md5(" ".join(win).encode()).hexdigest(),
            )
        assert covered == set(range(n))
    got = {
        (r.doc_id, r.chunk_no): (r.start_pos, r.n_tokens, r.chunk_md5)
        for r in text.doc_chunks(docs).collect()
    }
    assert got == want
    # the fixture exercises short tail windows (n_tokens < chunk)
    assert any(v[1] < chunk for v in want.values())


def test_doc_chunks_rejects_bad_stride(spark, sf_smoke):
    import pytest

    with pytest.raises(ValueError):
        text.doc_chunks(_docs(spark, sf_smoke), chunk=16, stride=17)


def _winnow_python(text_s, k=3, w=4):
    import hashlib

    toks = text_s.split(" ")
    n = len(toks)
    if n < k + w - 1:
        return set()
    keys = []
    for i in range(n - k + 1):
        h = int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15], 16)
        keys.append((h % (1 << 40)) * (1 << 20) + ((1 << 20) - 1 - i))
    sel = set()
    for j in range(len(keys) - w + 1):
        sel.add(min(keys[j : j + w]))
    return {((1 << 20) - 1 - kk % (1 << 20), kk // (1 << 20)) for kk in sel}


def test_winnow_fingerprints_vs_python_and_coverage(spark, sf_smoke):
    """Python twin of MOSS winnowing (min hash per window, rightmost
    tie) + the winnowing COVERAGE guarantee: every window of w
    consecutive k-grams contains at least one selected fingerprint."""
    docs = _docs(spark, sf_smoke)
    want = {}
    for r in docs.select("doc_id", "text").collect():
        for pos, h40 in _winnow_python(r.text):
            want[(r.doc_id, pos, h40)] = True
    got = {
        (r.doc_id, r.pos, r.h40): True
        for r in text.winnow_fingerprints(docs).collect()
    }
    assert got == want and want
    # coverage guarantee per doc
    bydoc = {}
    for d, pos, _h in want:
        bydoc.setdefault(d, set()).add(pos)
    for r in docs.select("doc_id", "text").collect():
        n_h = len(r.text.split(" ")) - 2
        if n_h < 4:
            continue
        sel = bydoc[r.doc_id]
        for j in range(n_h - 3):
            assert any(j <= p <= j + 3 for p in sel)


def test_winnow_dup_pairs_vs_python(spark, sf_smoke):
    """Python twin of the MOSS pair detector over the winnowing
    fingerprints (>= 2 shared hashes, hot-hash cap), plus symmetry
    a < b and agreement with a planted duplicate if present."""
    docs = _docs(spark, sf_smoke)
    byhash = {}
    for r in docs.select("doc_id", "text").collect():
        for _pos, h40 in _winnow_python(r.text):
            byhash.setdefault(h40, set()).add(r.doc_id)
    shared = {}
    for h, ds in byhash.items():
        if len(ds) > 200:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                k = (ds[i], ds[j])
                shared[k] = shared.get(k, 0) + 1
    want = {k: v for k, v in shared.items() if v >= 2}
    got = {
        (r.a, r.b): r.n_shared
        for r in text.winnow_dup_pairs(docs).collect()
    }
    assert got == want
    assert all(a < b for a, b in got)


def test_cluster_survivors_vs_python(spark, sf_smoke):
    """Python twin of longest-member survivor selection over the
    planted-dup corpus + identities: one survivor per cluster, the
    mutated (longer) planted copy beats its original, survivors are
    cluster members."""
    corpus = dedup.dup_corpus(_docs(spark, sf_smoke))
    cl = {
        r.doc_id: r.cluster for r in dedup.dedup_clusters(corpus).collect()
    }
    lens = {r.doc_id: len(r.text) for r in corpus.collect()}
    want = {}
    for d, c in cl.items():
        cand = (lens[d], d)
        best = want.get(c)
        if best is None or (-cand[0], cand[1]) < (-best[0], best[1]):
            want[c] = cand
    got = {
        r.cluster: (r.keep_chars, r.keep_id, r.n_members)
        for r in dedup.cluster_survivors(corpus).collect()
    }
    assert {c: (v[0], v[1]) for c, v in {k: (x[0], x[1]) for k, x in got.items()}.items()} == {
        c: (l, d) for c, (l, d) in want.items()
    }
    members = {}
    for d, c in cl.items():
        members[c] = members.get(c, 0) + 1
    assert {c: v[2] for c, v in got.items()} == members
    # a planted mutated copy ('mutated ' prefix, +8 chars) that landed
    # in its original's cluster must win the survivor pick
    mutated_winners = [c for c, (l, d) in want.items() if d >= 100000]
    assert mutated_winners


def test_lang_confusion_vs_python(spark, sf_smoke):
    """Python twin over lang_id's own output + row-stochastic identity
    and total-count conservation."""
    docs = _docs(spark, sf_smoke)
    pred = {r.doc_id: r.lang_pred for r in text.lang_id(docs).collect()}
    actual = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    n = {}
    for d, a in actual.items():
        k = (a, pred[d])
        n[k] = n.get(k, 0) + 1
    tot = {}
    for (a, _p), c in n.items():
        tot[a] = tot.get(a, 0) + c
    want = {k: (c, c / tot[k[0]]) for k, c in n.items()}
    got = {
        (r.lang_actual, r.lang_pred): (r.n, r.recall_share)
        for r in text.lang_confusion(docs).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(actual)


def test_proximity_search_vs_python_and_phrase_subset(spark, sf_smoke):
    """Python twin of the slop-2 proximity query; phrase matches
    (gap==1) are a subset with min_gap == 1 wherever the exact phrase
    occurs first."""
    docs = _docs(spark, sf_smoke)
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        hits = [
            j - i
            for i, t in enumerate(toks)
            if t == "table"
            for j in range(i + 1, min(i + 4, len(toks)))
            if toks[j] == "key"
        ]
        if hits:
            want[r.doc_id] = (len(hits), min(hits))
    got = {
        r.doc_id: (r.n_matches, r.min_gap)
        for r in text.proximity_search(docs).collect()
    }
    assert got == want and want
    phrase = {r.doc_id for r in text.phrase_search(docs).collect()}
    assert phrase <= set(got)
    assert all(got[d][1] == 1 for d in phrase)


def test_bm25_topk_vs_python(spark):
    """BM25 scores and ranking equal a pure-Python fold with the same
    pre-folded constants and association order — including docs hit by
    a subset of the query terms and the rank-k boundary."""
    import random as _r

    rng = _r.Random(4118)
    vocab = ["hash", "join", "vector", "scan", "row", "agg", "the"]
    rows = []
    for d in range(80):
        n = rng.randint(3, 40)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    rows.append((80, "vector"))  # single rare-term doc: max tf ratio
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["hash", "join", "vector"]
    got = [
        (r.doc_id, r.score, r.n_hit)
        for r in text.bm25_topk(docs, q, k=10).collect()
    ]
    # python twin
    n_docs = float(len(rows))
    dls = {d: len(t.split(" ")) for d, t in rows}
    avgdl = sum(dls.values()) / len(rows)
    tf = {}
    for d, t in rows:
        for w in t.split(" "):
            if w in q:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {w: sum(1 for (_d, w2) in tf if w2 == w) for w in q}
    per_doc = {}
    for (d, w), f in tf.items():
        idf = ((n_docs - df[w]) + 0.5) / (df[w] + 0.5)
        s = idf * (
            (f * text.BM25_K1P1)
            / (f + (text.BM25_K1_1B + (dls[d] * text.BM25_K1B) / avgdl))
        )
        per_doc.setdefault(d, {})[w] = s
    blend = []
    for d, parts in per_doc.items():
        score = 0.0
        for w in q:
            score = score + parts.get(w, 0.0)
        blend.append((d, score, len(parts)))
    blend.sort(key=lambda x: (-x[1], x[0]))
    assert got == blend[:10]
    # full ranking: the single-term doc is scored (n_hit = 1) and every
    # scored doc matches the twin end to end, not just the top slice
    got_all = [
        (r.doc_id, r.score, r.n_hit)
        for r in text.bm25_topk(docs, q, k=1000).collect()
    ]
    assert got_all == blend
    assert (80, blend[[d for d, _s, _n in blend].index(80)][1], 1) in got_all


def test_hll_merge_equals_direct_global(spark, sf_smoke):
    """Sketch MERGEABILITY pin: the register-wise-max 'ALL' row of
    hll_by_source is bit-identical to sketching the union stream
    directly (same estimate to the last bit)."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import dedup as dd

    docs = model.load_table(spark, sf_smoke, "documents")
    rows = {r.source: r for r in dd.hll_by_source(docs).collect()}
    vals = docs.select(
        dd.F.explode(dd.shingles_col("text")).alias("v")
    )
    [direct] = dd.hll_ndv(vals, "v").collect()
    assert rows["ALL"].n_registers_hit == direct.n_registers_hit
    assert rows["ALL"].hll_estimate == direct.hll_estimate
    # per-source sketches are genuinely partial: every source hits
    # fewer registers than the merge
    assert all(
        r.n_registers_hit <= rows["ALL"].n_registers_hit
        for r in rows.values()
    )
    assert len(rows) >= 3
