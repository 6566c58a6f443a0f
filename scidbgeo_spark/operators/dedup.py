"""Deduplication operators for the web-page corpus (graft surface):
exact (hash groupBy), MinHash + LSH band buckets, SimHash, and
n-gram-Jaccard verification.

All signatures are computed JVM-side with higher-order array functions
over word shingles; the hash is the portable md5-prefix bigint
(text.md5_int) so the DuckDB oracle reproduces every signature exactly.

The driver's documents table has no duplicates, so queries run over a
deterministic dup-injected corpus (``dup_corpus``) built identically in
Spark and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scidbgeo_spark.operators.text import md5_int

P = 2147483647  # 2^31 - 1
SHINGLE_K = 3
N_HASHES = 16
N_BANDS = 4  # 4 rows per band

# deterministic affine hash family: h_j(x) = (A[j] * x + B[j]) % P
A = [2 * j + 1 for j in range(N_HASHES)]
B = [(j * j * 7919 + 17) % P for j in range(N_HASHES)]


def dup_corpus(docs: DataFrame) -> DataFrame:
    """documents + injected duplicates: exact copies (doc_id % 11 == 0,
    id + 200000) and near-duplicates with a prefix mutation
    (doc_id % 7 == 0, id + 100000)."""
    base = docs.select("doc_id", "text")
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), F.concat(F.lit("mutated "), "text").alias("text"))
    )
    exact = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    return base.unionAll(near).unionAll(exact)


def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the
    kept (minimum) id and the group size."""
    return (
        corpus.select(F.col("doc_id"), F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def shingles_col(text: Column | str, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles as an array column (JVM-side)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(t, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.array_distinct(sh)


def _affine_min(j: int) -> Column:
    return F.array_min(
        F.transform(F.col("hs"), lambda h: (h * A[j] + B[j]) % P)
    ).alias(f"mh_{j}")


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_15): per-document MinHash signature over word
    shingles — fully JVM-side, oracle-reproducible.  The shingle md5s are
    materialized once per document (a projection barrier), then the 16
    affine minima read the shared array — without it Catalyst inlines the
    md5 tree into every signature column (16x the hashing work)."""
    hs = F.transform(shingles_col("text"), lambda s: md5_int(s) % P)
    return corpus.select("doc_id", hs.alias("hs")).select(
        "doc_id", *[_affine_min(j) for j in range(N_HASHES)]
    )


def minhash_bands(corpus: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): LSH banding of the signature — documents
    sharing a (band, bucket) are near-dup candidates.  bucket combines the
    band's rows with the same affine family."""
    sig = minhash_signatures(corpus)
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        acc = F.lit(0).cast("long")
        for r in range(rows_per_band):
            acc = (acc * 1000003 + F.col(f"mh_{b * rows_per_band + r}")) % P
        bands.append(F.struct(F.lit(b).alias("band"), acc.alias("bucket")))
    return (
        sig.select("doc_id", F.explode(F.array(*bands)).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_dup_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs: LSH candidates (shared band bucket) verified by
    exact shingle-set Jaccard >= threshold.  The candidate join shuffles
    only (doc_id, bucket) pairs; the verify join carries shingle sets for
    candidates only — the standard MinHash+LSH scale shape."""
    bands = minhash_bands(corpus)
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    sh = corpus.select("doc_id", shingles_col("text").alias("sh"))
    j = (
        cand.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (
        j.select("a", "b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exhaustive candidate generation by shared shingle (no MinHash
    approximation): explode distinct shingles, self-join, exact Jaccard.
    The scale path is minhash_dup_pairs; this is the exact baseline."""
    sh = corpus.select("doc_id", shingles_col("text").alias("sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    pairs = (
        ex.alias("l")
        .join(ex.alias("r"), (F.col("l.s") == F.col("r.s")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    j = (
        pairs.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return j.select("a", "b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 16


def simhash(corpus: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over shingle hashes: bit i of the fingerprint is the sign
    of sum(+1/-1 votes of bit i across shingles).  JVM-side; 16 bits keeps
    the oracle SQL tractable (the semantics are bit-count-agnostic)."""
    sh = shingles_col("text")
    hs = F.transform(sh, lambda s: md5_int(s) % P)

    def _vote(i: int):
        return lambda a, h: a + (F.shiftright(h, i) % 2) * 2 - 1

    acc = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hs, F.lit(0).cast("long"), _vote(i))
        acc = acc + F.when(vote > 0, F.lit(2**i)).otherwise(F.lit(0))
    return corpus.select("doc_id", acc.alias("simhash"))
