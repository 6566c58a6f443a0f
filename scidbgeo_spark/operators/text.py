"""Text-analysis operators over the web-page corpus (graft surface).

The reference has no text path — these are the training-data-pipeline
operations the engine adds for the Common-Crawl-style input table
(BASELINE.json input_hint): extraction with the byte-identical invariant,
token counting, quality scoring, language-ID, and document fingerprinting.

Everything here is JVM-side column algebra (codegen'd); the only Python is
the vectorized fingerprint fallback used for very long documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HTML_PREFIX = "<html><body>"
HTML_SUFFIX = "</body></html>"

FP_BASE = 257
FP_MOD = 2147483647


def md5_int(col: Column | str) -> Column:
    """First 60 bits of md5 as a bigint — the engine's portable string
    hash (DuckDB twin: ('0x'||substr(md5(x),1,15))::BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap document text into the pages shape (url-ish id, html binary) —
    the deterministic stand-in for a WARC payload."""
    html = F.encode(F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX)), "utf-8")
    return docs.select("doc_id", html.alias("html"), "text", "lang")


def extract_text(pages: DataFrame) -> DataFrame:
    """html binary -> extracted text; the per-url **byte-identical** text
    invariant (north rule) is pinned by comparing against the source
    ``text`` column via the oracle value hash."""
    s = F.decode(F.col("html"), "utf-8")
    extracted = F.substring(
        s, len(HTML_PREFIX) + 1, F.length(s) - len(HTML_PREFIX) - len(HTML_SUFFIX)
    )
    return pages.select("doc_id", extracted.alias("extracted"))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokenization (BPE-ish regex variant in
    token_count_bpe)."""
    return docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))


# GPT-2-style pre-tokenizer word pattern: contraction suffixes,
# space-prefixed letter runs / digit runs / punctuation runs, residual
# whitespace runs.  No lookarounds, so the SAME pattern string runs on
# Java regex (Spark) and RE2 (DuckDB) with identical matches — the
# oracle twin is exact.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer's regex splits
    (letter runs, digit runs, punctuation runs, contraction suffixes,
    each optionally space-prefixed) — the unit a byte-pair encoder
    would merge within.  Counting these (JVM regexp_extract_all, no
    Python) gives the curation-pipeline token estimate ~proportional to
    real BPE token counts without a vocabulary file."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0)).alias(
            "n_tokens_bpe"
        ),
    )


# small fixed stopword list (quality heuristics use dozens; the ratio's
# plumbing and oracle are list-size-agnostic)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "as"]


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality-scoring features: length, tokens, chars/token, lexical
    diversity (distinct-token share), punctuation ratio, stopword ratio.
    Single exact divisions so the DuckDB twin is bitwise identical."""
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length("text").cast("long")
    n_punct = n_chars - F.length(
        F.regexp_replace("text", r"[^A-Za-z0-9 ]", "")
    ).cast("long")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / n_tokens).alias("chars_per_token"),
        (n_distinct / n_tokens).alias("lexical_diversity"),
        # guarded: empty text has n_chars == 0 and Spark's ANSI mode
        # throws DIVIDE_BY_ZERO where DuckDB's 0/0 yields NULL — emit
        # NULL explicitly so both engines agree (n_tokens is never 0:
        # split('') gives [''])
        F.when(n_chars > 0, n_punct / n_chars).alias("punct_ratio"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


# C4-style curation rule bits (quality_filter's fail_mask)
Q_FEW_TOKENS = 1  # n_tokens < min_tokens
Q_CHARS_PER_TOKEN = 2  # chars/token outside [cpt_lo, cpt_hi]
Q_PUNCT = 4  # punctuation ratio above punct_max
Q_LEXDIV = 8  # lexical diversity below lex_min (boilerplate/repetition)


def quality_fail_mask(
    min_tokens: int = 30,
    cpt_lo: float = 3.0,
    cpt_hi: float = 12.0,
    punct_max: float = 0.2,
    lex_min: float = 0.35,
) -> Column:
    """The C4-rule fail-mask EXPRESSION over a ``text`` column — shared
    by the batch quality_filter and the streaming curation pipeline
    (pure column algebra, so it applies unchanged to a streaming
    DataFrame)."""
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_chars = F.length("text").cast("long")
    cpt = n_chars / n_tokens
    n_punct = n_chars - F.length(
        F.regexp_replace("text", r"[^A-Za-z0-9 ]", "")
    ).cast("long")
    # NULL for empty text (matches DuckDB 0/0 -> NULL; ANSI Spark would
    # throw): the NULL comparison below is false, so the punct rule
    # simply cannot fire on an empty doc — the min_tokens rule catches it
    punct = F.when(n_chars > 0, n_punct / n_chars)
    lex = F.size(F.array_distinct(toks)) / n_tokens
    return (
        F.when(n_tokens < min_tokens, Q_FEW_TOKENS).otherwise(0)
        + F.when((cpt < cpt_lo) | (cpt > cpt_hi), Q_CHARS_PER_TOKEN).otherwise(0)
        + F.when(punct > punct_max, Q_PUNCT).otherwise(0)
        + F.when(lex < lex_min, Q_LEXDIV).otherwise(0)
    ).cast("int")


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 30,
    cpt_lo: float = 3.0,
    cpt_hi: float = 12.0,
    punct_max: float = 0.2,
    lex_min: float = 0.35,
) -> DataFrame:
    """C4-style heuristic curation filter: (doc_id, keep, fail_mask)
    where ``fail_mask`` ORs a bit per failed rule (too few tokens,
    words implausibly short/long, too much punctuation, low lexical
    diversity).  Keeping the mask instead of dropping rows makes the
    filter auditable — a curation pipeline reports WHY documents fell
    out, then anti-joins on keep.  All features are the text_quality
    expressions (single exact divisions), so threshold comparisons are
    bitwise identical across engines and the DuckDB twin is exact."""
    mask = quality_fail_mask(min_tokens, cpt_lo, cpt_hi, punct_max, lex_min)
    return docs.select(
        "doc_id", (mask == 0).alias("keep"), mask.alias("fail_mask")
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition signal (the Gopher-rules shape): the
    most frequent token BIGRAM's share of all bigrams, plus the
    distinct-bigram ratio.  Boilerplate and template spam concentrate
    probability mass on a few bigrams; natural text spreads it.  One
    explode + one (doc_id, bigram) hash aggregate + one per-doc
    aggregate — bigrams shuffle as counts, and integer counts with a
    single closing division keep the DuckDB twin bitwise.

    Docs with fewer than two tokens have NO bigrams and emit no row —
    guarded explicitly because Spark's ``sequence(1, 0)`` is the
    DESCENDING array [1, 0] (element_at(toks, 0) then throws), while
    DuckDB's ``generate_series(1, 0)`` is empty; the guard pins the
    empty-bigram semantics both engines can agree on."""
    toks = F.split("text", " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select("doc_id", F.explode(bigrams).alias("b"))
    counts = bg.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.max("n").alias("top_bigram_n"),
        F.sum("n").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        (F.max("n") / F.sum("n")).alias("top_bigram_frac"),
        (F.count("*") / F.sum("n")).alias("distinct_bigram_ratio"),
    )


# marker-word table: occurrence counts of distinctive words vote for a
# language label (n-gram-heuristic shape; markers are configurable — the
# fixture corpus has a synthetic vocabulary, so markers come from it).
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", "join"),
    ("de", "hash"),
    ("fr", "scan"),
    ("es", "merge"),
]


def _occurrences(col: Column, needle: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-language top-k terms by corpus TF-IDF: score = (term count in
    the language) * N_docs / (global document frequency), ties broken by
    term.  The corpus-statistics view a curation pipeline uses to spot
    boilerplate vocabularies.  Two hash aggregates + one broadcast-sized
    join + one per-lang window — the term dictionary shuffles as (term,
    count) pairs, never token streams; counts are integers and the score
    is a single exact division, so the DuckDB twin is bitwise."""
    # one term-partitioned exchange feeds BOTH aggregates (Spark reuses
    # exchanges, not projections): the corpus is exploded and shuffled
    # once; partitioning on term satisfies clustering for (lang, term)
    # and for term, so neither aggregate nor the join shuffles again
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).repartition("term")
    # N_docs rides the plan as a 1-row aggregate broadcast-cross-joined
    # in — NO driver action here: on a 100-TB filtered/derived corpus a
    # .count() in the builder would run the whole upstream pipeline an
    # extra time before the real query even starts (round-3 advice)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    tf = tok.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    scored = tf.join(df_, "term").join(F.broadcast(n_docs)).select(
        "lang",
        "term",
        ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("doc_freq")).alias(
            "score"
        ),
    )
    win = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("lang", "term", "score", F.col("rank").cast("long").alias("rank"))
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: argmax of marker occurrences with a total
    tie-break (marker-table priority), via an encoded score
    ``count*1000 + priority`` so the argmax is a plain greatest() — the
    DuckDB twin mirrors the encoding exactly."""
    t = F.col("text")
    n = len(LANG_MARKERS)
    encs = {
        lang: (_occurrences(t, m) * 1000 + (n - 1 - i))
        for i, (lang, m) in enumerate(LANG_MARKERS)
    }
    d = docs.select("doc_id", *[c.alias(f"e_{lang}") for lang, c in encs.items()])
    g = F.greatest(*[F.col(f"e_{lang}") for lang, _ in LANG_MARKERS])
    pred = None
    for lang, _ in LANG_MARKERS:
        cond = F.col(f"e_{lang}") == g
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return d.select("doc_id", pred.alias("lang_pred"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over the characters (Horner, mod 2^31-1),
    computed JVM-side with a higher-order aggregate — the scalable
    whole-document fingerprint (kernels.rolling_fingerprint is the NumPy
    twin used in unit tests)."""
    fp = F.aggregate(
        F.transform(F.split("text", ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---- count-min sketch (heavy-hitter term counts) ------------------------
# The frequency twin of dedup.hll_ndv's cardinality sketch: a
# CMS_D x CMS_W counter grid (4096 cells regardless of corpus size,
# built by one map-side-combined count aggregate) answers "how often
# does this term occur?" with one-sided error (estimate >= truth,
# overshoot ~ 2N/CMS_W w.p. 1 - 2^-CMS_D).  Pure integer algebra over
# the md5-prefix hash, so the DuckDB twin matches bitwise.
CMS_D = 4
CMS_W = 1024
# affine row hashes: h_j(t) = ((A*h + B) % P) % W, same family style as
# the MinHash signatures (distinct constants)
CMS_A = [2 * j + 3 for j in range(CMS_D)]
CMS_B = [(j * j * 6131 + 29) % FP_MOD for j in range(CMS_D)]


def _cms_cells(tok_hash: Column) -> Column:
    """array of CMS_D (row, col) structs for one token hash.  The 60-bit
    digest is reduced mod P BEFORE the affine step: 2^60 * CMS_A
    overflows int64 (ANSI-mode throw); (P-1) * CMS_A + CMS_B ~ 2e10
    does not."""
    hp = tok_hash % FP_MOD
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (((hp * CMS_A[j] + CMS_B[j]) % FP_MOD) % CMS_W).alias("col"),
            )
            for j in range(CMS_D)
        ]
    )


def cms_heavy_hitters(docs: DataFrame, k: int = 10) -> DataFrame:
    """(token, true_count, cms_estimate) for the k most frequent tokens
    (ties by token): the sketch is built over EVERY token occurrence,
    then probed for the true top-k so the overestimate is visible
    in-result.  At 100 TB the probe side (true counts) is the expensive
    path; the sketch itself is one scan + a 4096-cell aggregate, and
    serving a probe is a k*CMS_D-row broadcast join against it."""
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).select("token", md5_int("token").alias("th"))
    cells = (
        toks.select(F.explode(_cms_cells(F.col("th"))).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(k)
    )
    probes = top.select(
        "token",
        "true_count",
        F.explode(_cms_cells(md5_int("token"))).alias("c"),
    ).select("token", "true_count", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        cells.join(F.broadcast(probes), ["row", "col"])
        .groupBy("token", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select("token", "true_count", "cms_estimate")
    )


# ---- inverted index (term -> posting list) ------------------------------
IDX_POSTING_CAP = 8  # posting-list head length carried in the result
IDX_MIN_DF = 3  # vocabulary floor: terms in fewer docs are dropped


def inverted_index(docs: DataFrame) -> DataFrame:
    """Serving-side inverted index over the corpus: one row per term
    with document frequency, collection frequency, and the posting-list
    HEAD (first IDX_POSTING_CAP doc_ids ascending, comma-joined so the
    oracle compares it as a scalar).

    Scale shape: tokenize -> per-doc term counts (one (doc, term)
    aggregate with map-side combine) -> ONE term-keyed shuffle that
    both ranks postings and aggregates the stats.  The posting head is
    capped BEFORE collect_list by a row_number over the same term
    partitioning (no second shuffle: the window and the groupBy share
    the exchange) — an uncapped collect_list over a web-scale stopword
    posting list would materialize one giant row per stopword, the
    same single-partition hazard the LSH bucket cap guards against."""
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = tf.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= IDX_POSTING_CAP, F.col("doc_id")))
                ),
                ",",
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= IDX_MIN_DF)
    )


# unigram-LM quality proxy: corpus frequencies below this are "rare"
LM_RARE_MAX = 3
# per-source boilerplate: an n-gram seen in >= this many DISTINCT docs
# of one source is template boilerplate there
BOILER_N = 5
BOILER_MIN_DOCS = 3


def lm_quality_score(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram-LM quality proxy per document: mean corpus
    frequency of the document's tokens (high = stereotyped/boilerplate
    vocabulary, low = rare/noisy) plus the fraction of tokens whose
    corpus count is <= LM_RARE_MAX (OCR garbage / mojibake signal).
    CCNet ranks documents by a KenLM perplexity; the same corpus-derived
    signal expressed in integer counts and two single exact divisions
    keeps the score bitwise-reproducible across engines (libm log is
    not), which is what lets the driver value-hash it.

    Scale shape: tokens hash to 60-bit longs BEFORE any exchange (raw
    terms never shuffle); ONE term-keyed exchange feeds both the corpus
    count aggregate and the probe join back onto the token stream
    (Spark reuses the exchange), then one doc-keyed aggregate with
    map-side combine. By Zipf the distinct-term table is tiny next to
    the corpus, so AQE broadcasts the probe side at any scale. No
    driver actions, no Python UDFs."""
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .select("doc_id", md5_int("t").alias("h"))
        .repartition("h")
    )
    freq = tok.groupBy("h").agg(F.count("*").alias("cnt"))
    per = (
        tok.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum("cnt").cast("long").alias("sum_freq"),
            F.sum((F.col("cnt") <= LM_RARE_MAX).cast("long")).alias("n_rare"),
        )
    )
    # split('') == [''] so n_toks >= 1 always; both divisions are single
    # exact operations on integer-valued doubles -> bitwise on any engine
    return per.select(
        "doc_id",
        "n_toks",
        "sum_freq",
        (F.col("sum_freq").cast("double") / F.col("n_toks")).alias("mean_freq"),
        (F.col("n_rare").cast("double") / F.col("n_toks")).alias("rare_frac"),
    )


def boiler_corpus(docs: DataFrame) -> DataFrame:
    """documents with a per-source template sentence planted at the head
    of two of every three docs (doc_id % 3 < 2) — the deterministic
    stand-in for the site chrome ("all rights reserved ...") a real
    crawl carries, so the boilerplate detector has ground truth."""
    template = F.concat(
        F.lit("copyright "),
        F.col("source"),
        F.lit(" all rights reserved terms of service apply"),
    )
    return docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 3 < 2, F.concat(template, F.lit(" "), "text")
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def boilerplate_spans(
    docs: DataFrame, n: int = BOILER_N, min_docs: int = BOILER_MIN_DOCS
) -> DataFrame:
    """Per-SOURCE template-boilerplate removal (the CCNet/C4 "strip the
    site chrome" pass): an n-gram is boilerplate within a source iff it
    occurs in >= min_docs DISTINCT documents of that source; per doc,
    report token coverage by boilerplate grams and the md5 fingerprint
    of the text with every covered token removed.

    Scale shape mirrors dup_span_dedup (`dedup.py`): positional n-gram
    hashes are 60-bit longs keyed by (source, h) — raw text never rides
    the gram shuffles; the boilerplate set comes from a map-side-
    combined distinct-doc aggregate (bounded by template mass, not
    corpus size) and AQE broadcasts it into the probe join; duplicated
    start positions collapse to ONE array row per affected doc, and
    coverage, span removal, and the kept fingerprint are per-row array
    algebra — no positional explode, no (doc_id, pos) anti-join."""
    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id", "source", toks.alias("toks"), F.size(toks).alias("n_tokens")
    )

    def _gram(s: Column) -> Column:
        return F.struct(
            s.alias("s"),
            md5_int(F.array_join(F.slice(F.col("toks"), s, n), " ")).alias("h"),
        )

    grams = (
        t.filter(F.col("n_tokens") >= n)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.col("n_tokens") - n + 1), _gram)
            ).alias("g"),
        )
        .select("doc_id", "source", F.col("g.s").alias("s"), F.col("g.h").alias("h"))
    )
    boiler = (
        grams.groupBy("source", "h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("source", "h")
    )
    starts = (
        grams.join(boiler, ["source", "h"])
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("s")).alias("starts"))
    )
    st = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    covered = F.array_distinct(
        F.flatten(F.transform(st, lambda s: F.sequence(s, s + (n - 1))))
    )
    clean_fp = F.md5(
        F.array_join(
            F.filter(
                F.col("toks"),
                lambda tok, i: ~F.array_contains(F.col("covered"), i + 1),
            ),
            " ",
        )
    )
    ncov = F.size("covered").cast("long")
    return (
        t.join(starts, "doc_id", "left")
        .withColumn("covered", covered)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            ncov.alias("n_boiler"),
            F.when(F.col("n_tokens") > 0, ncov / F.col("n_tokens")).alias(
                "frac_boiler"
            ),
            clean_fp.alias("clean_fp"),
        )
    )


def vocab_growth(docs: DataFrame, buckets: int = 10) -> DataFrame:
    """Heaps-law vocabulary-growth curve: split the corpus into
    ``buckets`` equal doc-id slices and report, per slice, how many
    NEVER-SEEN-BEFORE terms it introduces plus the cumulative
    vocabulary size — the standard diminishing-returns screen for "is
    more crawl adding new language or just more of the same?".  The
    "term" here is the 3-word shingle (the hll_shingle_ndv vocabulary
    unit — single words saturate any corpus in the first slice; phrase
    vocabulary is what actually keeps growing).

    Scale shape: shingles hash to 60-bit longs before any exchange
    (the lm_quality_score convention), ONE term-keyed min-aggregate
    finds each term's first document, the bucket histogram is map-side
    combinable, and the final cumulative window runs over ``buckets``
    rows — constant-size, not corpus-size.  The corpus count rides the
    plan as a broadcast (no driver action).  Exact integers end to
    end."""
    from scidbgeo_spark.operators.dedup import shingles_col

    tok = docs.select(
        "doc_id", F.explode(shingles_col("text")).alias("t")
    ).select("doc_id", md5_int("t").alias("h"))
    first = tok.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    n = docs.agg(F.count("*").alias("n_docs"))
    b = first.crossJoin(F.broadcast(n)).select(
        F.least(
            F.expr(f"first_doc * {buckets} DIV n_docs"),
            F.lit(buckets - 1).cast("long"),
        ).alias("bucket")
    )
    per = b.groupBy("bucket").agg(F.count("*").alias("new_terms"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "bucket",
        "new_terms",
        F.sum("new_terms").over(w).alias("vocab_cum"),
    )


def doc_novelty(docs: DataFrame) -> DataFrame:
    """Per-document NOVELTY score: the fraction of the document's
    distinct 3-word shingles whose corpus-wide FIRST appearance is this
    document (first = min doc_id) — the per-doc contribution signal
    behind "does adding this page add new language?" curation (the
    pointwise form of :func:`vocab_growth`; near-duplicates and
    boilerplate-heavy pages score ~0).

    Scale shape: one shingle-keyed min-aggregate (60-bit hashes, raw
    strings never shuffle), probe join back onto the (doc, shingle)
    stream — Spark reuses the exchange — then one doc-keyed count agg.
    Exact integers + one IEEE division."""
    from scidbgeo_spark.operators.dedup import shingles_col

    tok = docs.select(
        "doc_id", F.explode(shingles_col("text")).alias("t")
    ).select("doc_id", md5_int("t").alias("h"))
    first = tok.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        tok.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
    )


def phrase_search(docs: DataFrame, w1: str = "table", w2: str = "key") -> DataFrame:
    """Positional-index PHRASE query: the docs containing the exact
    2-word phrase ``"w1 w2"`` with occurrence count and first match
    position — the serving-side lookup a positional inverted index
    (inverted_index's posting lists + positions) exists to answer.

    Scale shape: the classic posting-list INTERSECTION join — explode
    to (doc_id, pos, tok) postings, filter each side to ONE term
    (predicate pushes below the generate), equi-join on
    (doc_id, adjacent position).  Both sides of the join are single
    posting lists (corpus-frequency-sized, not corpus-sized), the join
    key is (doc_id, pos) so no skew beyond a term's in-doc frequency;
    one shuffle per side + the map-side-combinable per-doc count."""
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    a = pos.filter(F.col("tok") == w1).select("doc_id", "pos")
    b = pos.filter(F.col("tok") == w2).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


def doc_chunks(docs: DataFrame, chunk: int = 64, stride: int = 48) -> DataFrame:
    """Training-window CHUNKING: split every document's token stream
    into fixed-size windows of ``chunk`` tokens advancing by ``stride``
    (overlap = chunk - stride, the context-continuity overlap LM
    pipelines keep so no span is only ever seen truncated).  One row
    per (doc_id, chunk_no) with the window's start offset, its actual
    token count (the tail window may be short) and an md5 fingerprint
    of the window text — the downstream shard-dedup / packing key.

    Scale shape: pure per-row column algebra — ``sequence`` generates
    the start offsets, ``slice`` takes each window straight from the
    token array, all inside codegen; the explode multiplies rows by
    ~n_tokens/stride with ZERO shuffle (narrow dependency), so the op
    pipelines into whatever consumes the chunks."""
    if not (0 < stride <= chunk):
        raise ValueError(f"need 0 < stride <= chunk, got {stride} > {chunk}")
    toks = F.split("text", " ")
    n = F.size(toks)
    t = docs.select("doc_id", toks.alias("toks"), n.alias("n"))
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    ex = t.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("chunk_no", "start_pos"),
    )
    win = F.slice(F.col("toks"), F.col("start_pos") + 1, chunk)
    return ex.select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.least(F.lit(chunk), F.col("n") - F.col("start_pos"))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.concat_ws(" ", win)).alias("chunk_md5"),
    )


WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window
_W_HMOD = 1 << 40  # hash kept to 40 bits so (hash, pos) packs into one int64
_W_PMOD = 1 << 20  # position field width (docs < 1M tokens)


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """WINNOWING document fingerprints (the MOSS local-fingerprinting
    algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every
    ``WINNOW_K``-word gram, slide a ``WINNOW_W``-hash window, and keep
    each window's MINIMUM hash (ties to the RIGHTMOST position) — the
    guaranteed-coverage sparse fingerprint set plagiarism/near-dup
    detectors index instead of every k-gram.  One row per selected
    (doc_id, pos, h) fingerprint, distinct per doc.

    Determinism across engines: the (hash, position) pair packs into a
    single int64 key ``(h % 2^40) * 2^20 + (2^20 - 1 - pos)`` so the
    window minimum IS the tie rule (smaller hash wins; equal hashes ->
    larger pos wins) — pure integer algebra both sides, no argmin.

    Scale shape: k-gram hashing, window minima and the decode are ALL
    in-array codegen (``transform`` + ``array_min`` over ``slice``) —
    zero shuffle until the final per-doc distinct, which exchanges only
    the selected fingerprints (~2/(w+1) of the k-grams).  Docs shorter
    than k+w-1 tokens yield no fingerprints (no full window exists)."""
    k, w = WINNOW_K, WINNOW_W
    toks = F.split("text", " ")
    n = F.size(toks)
    h = lambda i: F.conv(
        F.substring(
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, k))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    keys = F.transform(
        F.sequence(F.lit(0), F.col("n") - k),
        lambda i: (h(i) % _W_HMOD) * _W_PMOD + (_W_PMOD - 1 - i),
    )
    t = (
        docs.select("doc_id", toks.alias("toks"), n.alias("n"))
        .filter(F.col("n") >= k + w - 1)
        .select("doc_id", keys.alias("keys"), (F.col("n") - k + 1).alias("n_h"))
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.col("n_h") - w),
        lambda j: F.array_min(F.slice(F.col("keys"), j + 1, w)),
    )
    sel = t.select("doc_id", F.explode(wins).alias("key")).distinct()
    return sel.select(
        "doc_id",
        (F.lit(_W_PMOD - 1) - F.col("key") % _W_PMOD).alias("pos"),
        # integer DIV, not `/`: the packed key reaches ~2^60, past
        # double's 2^53 exact-integer range
        F.expr(f"key DIV {_W_PMOD}").alias("h40"),
    )


WINNOW_HASH_CAP = 200  # fingerprints shared by more docs are boilerplate
WINNOW_MIN_SHARED = 2


def winnow_dup_pairs(
    docs: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    hash_cap: int = WINNOW_HASH_CAP,
) -> DataFrame:
    """MOSS-style NEAR-DUP pairs from winnowing fingerprints: document
    pairs (a < b) sharing >= ``min_shared`` selected fingerprint hashes
    — the detector the fingerprint index exists to serve (fourth
    near-dup family next to MinHash-LSH, SimHash and n-gram Jaccard;
    winnowing's guarantee makes it sensitive to LOCAL copied spans the
    global-signature families dilute).

    Hot-hash cap: a fingerprint selected by m docs yields m^2
    candidates, so hashes shared by more than ``hash_cap`` docs are
    dropped (template boilerplate) — the minhash_dup_pairs BUCKET_CAP
    convention, mirrored by the oracle and far above fixture sizes.

    Scale shape: candidates come ONLY from the fingerprint equi-join
    (capped per hash), the pair count is map-side-combinable, and the
    fingerprint set is ~2/(w+1) of the k-grams — strictly sparser than
    the shingle exchange the MinHash family ships."""
    fp = winnow_fingerprints(docs).select("doc_id", "h40").distinct()
    hw = Window.partitionBy("h40")
    capped = fp.withColumn("hsz", F.count("*").over(hw)).filter(
        F.col("hsz") <= hash_cap
    )
    a = capped.select(F.col("doc_id").alias("a"), "h40")
    b = capped.select(F.col("doc_id").alias("b"), "h40")
    return (
        a.join(b, "h40")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """CONFUSION MATRIX of the lang_id heuristic against the corpus's
    labeled ``lang`` column — (lang_actual, lang_pred, n, recall_share)
    — the evaluation harness a classifier-driven curation pipeline runs
    before trusting a model to route documents; recall_share is the
    fraction of the actual language's docs landing in each predicted
    bucket (rows per actual language sum to 1).

    Scale shape: the lang_id column algebra (zero extra scans), one
    map-side-combinable (actual, pred) count — key space |langs|^2 —
    and a constant-size window normalize."""
    pred = lang_id(docs)
    j = docs.select("doc_id", F.col("lang").alias("lang_actual")).join(
        pred, "doc_id"
    )
    per = j.groupBy("lang_actual", "lang_pred").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("lang_actual")
    return per.select(
        "lang_actual",
        "lang_pred",
        "n",
        (F.col("n") / F.sum("n").over(tot)).alias("recall_share"),
    )


def proximity_search(
    docs: DataFrame, w1: str = "table", w2: str = "key", slop: int = 2
) -> DataFrame:
    """PROXIMITY query: docs where ``w2`` occurs within ``slop``
    positions AFTER ``w1`` (ordered window — the "w1 ... w2" search
    operators serve with positional posting lists; slop=0 would be the
    exact phrase).  Output (doc_id, n_matches, min_gap).

    Scale shape: phrase_search's posting-list intersection with a
    bounded BAND join — each w1 posting replicates into its slop+1
    candidate positions (constant fan-out, stays an equi-join; never a
    range/theta join)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    a = pos.filter(F.col("tok") == w1).select(
        "doc_id",
        F.col("pos").alias("apos"),
        F.explode(
            F.sequence(F.col("pos") + 1, F.col("pos") + 1 + slop)
        ).alias("pos"),
    )
    b = pos.filter(F.col("tok") == w2).select("doc_id", "pos")
    return (
        a.join(b, ["doc_id", "pos"])
        .select("doc_id", (F.col("pos") - F.col("apos")).alias("gap"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("gap").cast("long").alias("min_gap"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75
# products of constants are PRE-FOLDED in Python so each engine performs
# only single multiplies of a literal (DuckDB reassociates constants
# through longer products and drifts the last ulp — see oracle.py's
# distance_join_geo note)
BM25_K1P1 = BM25_K1 + 1.0
BM25_K1_1B = BM25_K1 * (1.0 - BM25_B)
BM25_K1B = BM25_K1 * BM25_B


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20) -> DataFrame:
    """BM25 ranking of the corpus against a bag of query terms — the
    serving-side scorer the inverted-index family was missing
    (inverted_index/phrase/proximity find candidates; this ORDERS
    them).  LOG-FREE VARIANT (documented): idf is the raw Robertson
    odds ratio (N - df + 0.5)/(df + 0.5) without the usual ln() —
    monotone in the standard idf, so rankings for single-term queries
    are identical and multi-term blends weight rare terms more
    aggressively; ln() is banned here because libm logs differ across
    engines in the last ulp and the oracle compare is bit-exact.

    score(d) = sum_t idf_t * (tf * (k1+1)) / (tf + k1(1-b) + k1*b*dl/avgdl)

    with every constant product pre-folded driver-side and each binary
    float op written in the same association order as the SQL twin.
    Output (doc_id, score, n_hit) for the top k by (score desc, doc_id).

    Scale shape: tokenize -> per-doc tf for QUERY TERMS ONLY (the
    filter pushes below the explode's shuffle), df per term and
    (N, avgdl) as 1-row/broadcast aggregates, score as column algebra,
    ONE global top-k (TakeOrdered — no full sort).  The query-term
    filter is the whole story at 100 TB: the exploded token stream
    never shuffles, only the matching (doc, term) pairs do."""
    terms = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.array_contains(terms, F.col("term")))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum(F.size(F.split("text", " ")).cast("long"))
            / F.count("*")
        ).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                (
                    (F.col("n_docs") - F.col("df")) + F.lit(0.5)
                )  # (N - df) + 0.5
                / (F.col("df") + F.lit(0.5))
                * (
                    (F.col("tf") * F.lit(BM25_K1P1))
                    / (
                        F.col("tf")
                        + (
                            F.lit(BM25_K1_1B)
                            + (F.col("dl") * F.lit(BM25_K1B)) / F.col("avgdl")
                        )
                    )
                )
            ).alias("s"),
        )
    )
    # FIXED-ORDER blend: a float sum(s) across a doc's matched terms is
    # order-dependent across engines; each term appears at most once
    # per doc after the tf aggregate, so pivot per term (an exact
    # one-element conditional sum) and add in the literal query order
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"_s{i}")
            for i, t in enumerate(query_terms)
        ],
        F.count("*").alias("n_hit"),
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    agg = per_term.select("doc_id", score.alias("score"), "n_hit")
    return agg.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


LM2_SCALE = 10**6


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """BIGRAM-LM fluency proxy per document — the conditional-probability
    signal :func:`lm_quality_score`'s unigram view cannot see: for each
    adjacent token pair (w1, w2) in a document, the corpus-level
    conditional p(w2|w1) = c(w1,w2) / c(w1,·) says how *expected* the
    continuation is; word salad scores low even when every individual
    token is common.  KenLM ranks by log-perplexity; the same signal in
    scaled-integer rationals — p_scaled = (c2 * SCALE) div c1 per
    occurrence, doc score = sum div n_bigrams — stays bitwise across
    engines (libm log is not).  Output (doc_id, n_bigrams, sum_p,
    lm2_score); documents with fewer than 2 tokens carry no bigram and
    are excluded (same rule both engines — the r4-advice single-token
    lesson, honored by construction here).

    Scale shape: bigrams hash to 60-bit longs BEFORE any exchange, the
    corpus bigram table and the prefix table are map-side-combinable
    aggregates of the same stream, the probe joins are bigram-keyed
    (Zipf => the distinct-bigram table is corpus-sublinear and AQE
    broadcasts it), and the final doc-keyed agg combines map-side.  No
    driver action, no Python UDF."""
    toks = F.split("text", " ")
    bg = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i.cast("int")).alias("w1"),
                        F.concat_ws(
                            " ",
                            F.element_at(toks, i.cast("int")),
                            F.element_at(toks, (i + 1).cast("int")),
                        ).alias("b"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p"),
    ).select(
        "doc_id",
        md5_int(F.col("p.w1")).alias("h1"),
        md5_int(F.col("p.b")).alias("h2"),
    )
    c2 = bg.groupBy("h1", "h2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("h1").agg(F.sum("c2").alias("c1"))
    stats = c2.join(c1, "h1").select(
        "h2", F.expr(f"(c2 * {LM2_SCALE}) DIV c1").alias("p_scaled")
    )
    return (
        bg.join(stats, "h2")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("p_scaled").alias("sum_p"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_p",
            F.expr("sum_p DIV n_bigrams").alias("lm2_score"),
        )
    )


OUTLINK_RE = r'href="([^"]+)"'


def outlink_extract(docs: DataFrame) -> DataFrame:
    """OUTLINK extraction from page HTML — the parse step between WARC
    ingest and the host graph: anchor hrefs come out of the raw html
    BINARY by regex group capture (the ``href="..."`` attribute), fully
    JVM-side.  The fixture plants 1 + (doc_id % 2) deterministic anchor
    tags into each page's html (the documents table carries no real
    markup); with real WARC payloads only the html construction drops
    away.  Output (doc_id, n_links, first_href, n_offsite) — total
    links, the first href in document order, and how many point off the
    page's own synthetic host.

    Scale shape: pure projection — decode + regexp_extract_all + array
    algebra, zero exchanges, zero Python."""
    own = F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"), F.lit(".example"))
    a1 = F.concat(
        F.lit('<a href="http://h'),
        ((F.col("doc_id") * 3 + 1) % 20).cast("string"),
        F.lit(".example/p"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">x</a>'),
    )
    a2 = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit('<a href="http://'),
            own,
            F.lit("/q"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">y</a>'),
        ),
    ).otherwise(F.lit(""))
    html = F.encode(
        F.concat(F.lit(HTML_PREFIX), a1, a2, F.col("text"), F.lit(HTML_SUFFIX)),
        "utf-8",
    )
    pages = docs.select("doc_id", own.alias("own_host"), html.alias("html"))
    hrefs = F.regexp_extract_all(
        F.decode(F.col("html"), "utf-8"), F.lit(OUTLINK_RE), 1
    )
    offsite = F.size(
        F.filter(
            hrefs,
            lambda h: ~h.startswith(
                F.concat(F.lit("http://"), F.col("own_host"))
            ),
        )
    )
    return pages.select(
        "doc_id",
        F.size(hrefs).cast("long").alias("n_links"),
        F.element_at(hrefs, 1).alias("first_href"),
        offsite.cast("long").alias("n_offsite"),
    )
