"""Host-graph analytics for crawl curation (graft surface).

Common-Crawl-style pipelines rank hosts (harmonic centrality /
PageRank over the host link graph) to prioritize the crawl frontier
and to weight domains during corpus mixing.  The reference engine has
no graph surface at all — this is part of the training-data-pipeline
extension, expressed as iterative sparse mat-vec in DataFrame algebra.

Arithmetic is EXACT integers throughout (ranks scaled by PR_SCALE,
floor divisions): like operators.similarity.kmeans_assign, the result
is bit-stable at any parallelism and the DuckDB oracle unrolls the
same iterations bitwise.  Spark's `div` truncates toward zero and
DuckDB's `//` floors — identical on the nonnegative ranks here.

Scale shape per iteration: one join of edges->ranks on src (at 100 TB
both sides hash-partition on host — co-partitioned across iterations
since the key never changes, so AQE reuses the exchange), one
map-side-combined sum by dst.  The graph (hosts, not pages) is orders
of magnitude smaller than the corpus; 10^8 hosts x ~40 edges is a
~100 GB edge list — a few-second iteration on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_DAMP_NUM_BASE = PR_DAMP_DEN - PR_DAMP_NUM  # teleport mass 15/100


def host_graph(docs: DataFrame) -> DataFrame:
    """Deterministic weighted host link graph (src, dst, w): document i
    "links to" document (i * 7 + 3) mod n, and edges aggregate to the
    source-host level.  A fixture-side derivation (the documents table
    carries no real hyperlinks) — with a real link column the groupBy
    below is the only step that changes."""
    cnt = docs.agg(F.count("*").alias("n_docs"))
    d1 = docs.select("doc_id", "source").crossJoin(F.broadcast(cnt))
    d2 = docs.select(
        F.col("doc_id").alias("dst_doc"), F.col("source").alias("dst")
    )
    return (
        d1.select(
            F.col("source").alias("src"),
            ((F.col("doc_id") * 7 + 3) % F.col("n_docs")).alias("dst_doc"),
        )
        .join(d2, "dst_doc")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(node, rank_scaled) after ``iters`` damped power iterations from
    the uniform start, all-integer: contrib(u->v) = ((R(u)*85 div 100)
    * w(u,v)) div W(u), R'(v) = (SCALE*15) div (100*n) + sum(contrib).
    Dangling mass is dropped (the simplified formulation) — the same
    rule on both engines.  Overflow headroom: R <= SCALE, so R*85*w
    stays far under 2^63 for w < 10^8.

    The edge list is cache()d: Spark's exchange reuse does not fire
    across the unrolled iterations (measured: 66 source re-scans / 113
    exchanges for 3 iterations uncached), and re-deriving edges from
    the corpus every iteration is the one genuine scale-killer here —
    caching the host-level edge list (small by construction) makes each
    iteration touch only host-keyed data, the same move as Spark's own
    iterative-graph examples."""
    edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{PR_SCALE} div n_nodes").alias("rank")
    )
    base = F.expr(f"({PR_SCALE} * {PR_DAMP_NUM_BASE}) div ({PR_DAMP_DEN} * n_nodes)")
    for _ in range(iters):
        contribs = (
            edges.join(outw, "src")
            .join(r.select(F.col("node").alias("src"), "rank"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(((rank * {PR_DAMP_NUM}) div {PR_DAMP_DEN}) * w) div tw"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contribs, "node", "left")
            .select(
                "node",
                (base + F.coalesce(F.col("c"), F.lit(0))).alias("rank"),
            )
        )
    return r.select("node", F.col("rank").alias("rank_scaled"))



def host_pagerank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """PageRank of the deterministic host graph: (source, rank_scaled)."""
    return pagerank(host_graph(docs), iters).select(
        F.col("node").alias("source"), "rank_scaled"
    )


def host_degree_stats(docs: DataFrame) -> DataFrame:
    """Per-host link-graph degree profile: (host, out_deg, in_deg,
    out_w, in_w, n_reciprocal) — distinct out/in neighbor counts, total
    out/in edge weight, and how many of the host's out-neighbors link
    back (reciprocity, the classic link-spam / link-farm screen next to
    rank itself).  Exact integers.

    Scale shape: two map-side-combinable aggregates of the host-level
    edge list (already orders of magnitude smaller than the corpus) +
    one self-join of edges on the REVERSED key pair for reciprocity —
    all host-keyed, nothing page-level shuffles."""
    edges = host_graph(docs)
    out = edges.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("out_deg"), F.sum("w").alias("out_w")
    )
    inn = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").alias("in_deg"), F.sum("w").alias("in_w")
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).distinct()
    recip = (
        edges.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("host"))
        .agg(F.count("*").alias("n_reciprocal"))
    )
    z = F.lit(0).cast("long")
    return (
        out.join(inn, "host", "full")
        .join(recip, "host", "left")
        .select(
            "host",
            F.coalesce("out_deg", z).alias("out_deg"),
            F.coalesce("in_deg", z).alias("in_deg"),
            F.coalesce("out_w", z).alias("out_w"),
            F.coalesce("in_w", z).alias("in_w"),
            F.coalesce("n_reciprocal", z).alias("n_reciprocal"),
        )
    )


def host_triangles(docs: DataFrame) -> DataFrame:
    """TRIANGLE COUNT + global clustering coefficient of the (simple,
    undirected) host graph — the link-farm / community-density screen:
    organic link neighborhoods close triangles, spam rings mostly
    don't.  One row: (n_nodes, n_edges, n_triangles, gcc) with
    gcc = 3*T / wedges, wedges = sum(deg*(deg-1)/2) — exact integers,
    one double division.

    Scale shape: the classic DEGREE-ORDERED orientation — every edge
    points from its lower-(degree, name) endpoint to the higher, so
    each node's out-degree is bounded by sqrt(2m) on any graph
    (arboricity bound) and the wedge self-join can never blow up on a
    celebrity host.  Two equi-joins on host keys (wedge build + closing
    -edge probe), all shuffles on the same small host-graph table.

    Edge derivation: TWO deterministic link functions per document
    (doc i -> (7i+3) mod n and -> (i*i DIV 5 + 2) mod n) instead of
    host_graph's single one — affine maps compose to affine maps on
    the source residue classes, so the single-function graph is
    triangle-FREE at every fixture scale and would leave the closing
    join untested; the integer-division quadratic breaks the residue
    structure (392 triangles at sf0.001).  Fixture-side derivation
    like host_graph's: with a real link column only these two SELECT
    lines change (and i*i stays in int64 for doc_id < ~3e9 — fixture
    ids are far below)."""
    cnt = docs.agg(F.count("*").alias("n_docs"))
    d1 = docs.select("doc_id", "source").crossJoin(F.broadcast(cnt))
    d2 = docs.select(
        F.col("doc_id").alias("dst_doc"), F.col("source").alias("dst")
    )
    links = d1.select(
        F.col("source").alias("src"),
        F.explode(
            F.array(
                (F.col("doc_id") * 7 + 3) % F.col("n_docs"),
                (F.expr("doc_id * doc_id DIV 5") + 2) % F.col("n_docs"),
            )
        ).alias("dst_doc"),
    ).join(d2, "dst_doc")
    e = (
        links.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    wedge = o.alias("e1").join(
        o.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(
        F.col("e1.u").alias("u"), F.col("e1.v").alias("v"), F.col("e2.v").alias("w")
    )
    tri = wedge.alias("wg").join(
        o.alias("e3"),
        (F.col("wg.u") == F.col("e3.u")) & (F.col("wg.w") == F.col("e3.v")),
    ).agg(F.count("*").alias("n_triangles"))
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.expr("sum(deg * (deg - 1) DIV 2)").alias("wedges"),
    )
    ne = e.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(ne)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.when(
                F.col("wedges") > 0,
                (F.lit(3.0) * F.col("n_triangles").cast("double"))
                / F.col("wedges").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("gcc"),
        )
    )


HITS_SCALE = 10**9
HITS_ITERS = 2


def _hits_term():
    """One half-step product w*s, widened BEFORE multiplying (r6, ADVICE
    r5): s <= SCALE = 1e9, so plain int64 w*s sums wrap silently once
    total in-weight nears ~9e9 while the DuckDB oracle (HUGEINT sum,
    cast to BIGINT) raises — divergent failure modes.  decimal(19,0)
    factors make the product decimal(38,0), the sum stays decimal(38,0),
    and the post-aggregate cast("long") raises loudly on overflow,
    matching the oracle's failure mode bit for bit below it."""
    return (
        F.col("w").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    ).alias("x")


def hits(edges: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """HITS hubs & authorities over a weighted edge list — the second
    classic link-analysis ranking next to :func:`pagerank` (Kleinberg's
    mutually-recursive pair: good hubs point at good authorities, good
    authorities are pointed at by good hubs).  Crawl pipelines use the
    pair where PageRank alone misleads: directory/aggregator hosts are
    hubs, not authorities.

    All-integer like pagerank, but HITS needs a per-half-step
    normalization (the raw vectors grow geometrically): this uses
    MAX-normalization — h(u) = (SCALE * h_raw(u)) div max(h_raw) — so
    every value stays in [0, SCALE] and the division is exact on both
    engines.  The numerator SCALE * h_raw can exceed int64 (h_raw is
    itself <= total_in_weight * SCALE), so that one product runs in
    decimal(38,0) and comes back to BIGINT after the floor division;
    the DuckDB oracle runs the identical product in HUGEINT.  Dangling
    hosts (no out-edges / no in-edges) hold score 0 after the first
    half-step, same rule both engines.

    Scale shape per iteration: two joins of the host-level edge list
    against a host-keyed score vector + two map-side-combinable sums —
    the same host-keyed exchange reused every half-step — plus a 1-row
    max() broadcast for the normalizer (no driver action; the scalar
    rides the plan exactly like pagerank's n_nodes).  Output
    (node, hub_scaled, auth_scaled)."""
    edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    a = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("s"))
    h = None
    for _ in range(iters):
        hraw = (
            edges.join(a.select(F.col("node").alias("dst"), "s"), "dst")
            .select("src", _hits_term())
            .groupBy("src")
            .agg(F.sum("x").cast("long").alias("raw"))
        )
        h = _hits_norm(nodes, hraw, "src")
        araw = (
            edges.join(h.select(F.col("node").alias("src"), "s"), "src")
            .select("dst", _hits_term())
            .groupBy("dst")
            .agg(F.sum("x").cast("long").alias("raw"))
        )
        a = _hits_norm(nodes, araw, "dst")
    return (
        h.select("node", F.col("s").alias("hub_scaled"))
        .join(a.select("node", F.col("s").alias("auth_scaled")), "node")
    )


def _hits_norm(nodes: DataFrame, raw: DataFrame, key: str) -> DataFrame:
    """Max-normalize a raw HITS half-step vector back onto [0, SCALE]:
    (node, s) over ALL nodes, missing raws as 0.  The SCALE * raw
    product runs in decimal(38,0) (raw <= total_weight * SCALE can pass
    int64); DIV floors, matching DuckDB's // on the same nonnegative
    HUGEINT product."""
    mx = raw.agg(F.greatest(F.max("raw"), F.lit(1)).alias("mx"))
    return (
        nodes.join(raw.withColumnRenamed(key, "node"), "node", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "node",
            F.expr(
                f"CAST((CAST({HITS_SCALE} AS DECIMAL(38,0))"
                " * coalesce(raw, 0)) DIV mx AS BIGINT)"
            ).alias("s"),
        )
    )


def host_hits(docs: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """HITS of the deterministic host graph: (source, hub_scaled,
    auth_scaled) — same fixture-side edge derivation as
    :func:`host_pagerank`."""
    return hits(host_graph(docs), iters).select(
        F.col("node").alias("source"), "hub_scaled", "auth_scaled"
    )


ANCHOR_WORDS = 2


def anchor_text_agg(docs: DataFrame) -> DataFrame:
    """Per-target-host ANCHOR-TEXT aggregation — the classic web-index
    signal (search engines index a page under the words other pages use
    to link to it; SEO spam screens watch for one anchor dominating a
    host's in-links).  Each document contributes one in-link to its
    deterministic link target (same (7i+3) mod n rule as
    :func:`host_graph`; with a real hyperlink/anchor column only the
    link SELECT changes), carrying the first ``ANCHOR_WORDS`` tokens of
    the SOURCE document's text as the anchor phrase.

    Output per target host: (host, n_links, n_anchors, top_anchor,
    top_count) — total in-links, distinct anchor phrases, and the
    modal anchor under the exact (count DESC, anchor ASC) tie rule.

    Scale shape: the (host, anchor) pre-aggregation is map-side
    combinable, so page-level rows collapse before any wide exchange;
    the ranking window then runs over the already-compact per-host
    anchor table (bounded by distinct anchors, not by pages).  No
    driver action, no cross join (the 1-row doc count broadcasts)."""
    cnt = docs.agg(F.count("*").alias("n_docs"))
    links = (
        docs.select(
            "doc_id",
            F.array_join(
                F.slice(F.split("text", " "), 1, ANCHOR_WORDS), " "
            ).alias("anchor"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            ((F.col("doc_id") * 7 + 3) % F.col("n_docs")).alias("dst_doc"),
            "anchor",
        )
    )
    tgt = docs.select(
        F.col("doc_id").alias("dst_doc"), F.col("source").alias("host")
    )
    per = (
        links.join(tgt, "dst_doc")
        .groupBy("host", "anchor")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("c"), F.asc("anchor"))
    return (
        per.withColumn("rn", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum("c").alias("n_links"),
            F.count("*").alias("n_anchors"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("top_count"),
        )
    )


def host_assortativity(docs: DataFrame) -> DataFrame:
    """Degree ASSORTATIVITY of the undirected host graph — do
    high-degree hosts link to each other (r > 0, organic hub cores) or
    to leaves (r < 0, hub-and-spoke / link-farm shape)?  The Pearson
    correlation of end-point degrees over every undirected edge counted
    in both orientations (the standard symmetrized estimator).  One row
    (n_edges, r).

    Exact integer sums; the covariance algebra runs in decimal and
    converts to double only at the boundary with IEEE sqrt — the
    band_correlation discipline, so the double is bitwise across
    engines (NULL on a degree-regular graph where variance is 0).

    Scale shape: degrees are one map-side-combinable agg of the host
    edge list; the probe joins are host-keyed; the closing sums are a
    single global agg of the (already host-level) edge table."""
    e = host_graph(docs).filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    both = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = both.groupBy("a").agg(F.count("*").alias("d")).withColumnRenamed(
        "a", "node"
    )
    j = (
        both.join(deg.select(F.col("node").alias("a"), F.col("d").alias("dx")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("dy")), "b")
    )
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    d = "decimal(19,0)"
    cd = F.col("n").cast(d)
    num = (cd * F.col("sxy").cast(d) - F.col("sx").cast(d) * F.col("sy").cast(d)).cast("double")
    vx = (cd * F.col("sxx").cast(d) - F.col("sx").cast(d) * F.col("sx").cast(d)).cast("double")
    vy = (cd * F.col("syy").cast(d) - F.col("sy").cast(d) * F.col("sy").cast(d)).cast("double")
    den = F.sqrt(vx) * F.sqrt(vy)
    return agg.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when(den > 0, num / den).alias("r"),
    )


def host_coupling(docs: DataFrame) -> DataFrame:
    """Bibliographic COUPLING and CO-CITATION of the host graph in one
    pass — the two classic link-similarity signals next to HITS/PageRank
    (search engines cluster hosts that cite the same targets; coupling =
    shared OUT-targets, co-citation = shared IN-sources).  One row per
    unordered host pair with either signal nonzero:
    (host_a, host_b, n_coupled, n_cocited) — counts of shared distinct
    neighbors.

    Scale shape: both signals are self-joins of the DISTINCT host edge
    list on one endpoint (dst for coupling, src for co-citation) — the
    classic wedge join, bounded by the square of the hottest endpoint's
    degree (degree-capped upstream at web scale, the simhash-bucket
    discipline); a full outer merge on the pair key combines them.

    Edge derivation: host_triangles' TWO deterministic link functions
    (7i+3 and i*i div 5 + 2, mod n) — the single-function graph is a
    host permutation (every out/in degree exactly 1), which makes both
    wedge joins empty by construction; the quadratic breaks the residue
    structure, same reasoning as the triangle count."""
    cnt = docs.agg(F.count("*").alias("n_docs"))
    d1 = docs.select("doc_id", "source").crossJoin(F.broadcast(cnt))
    d2 = docs.select(
        F.col("doc_id").alias("dst_doc"), F.col("source").alias("dst")
    )
    links = d1.select(
        F.col("source").alias("src"),
        F.explode(
            F.array(
                (F.col("doc_id") * 7 + 3) % F.col("n_docs"),
                (F.expr("doc_id * doc_id DIV 5") + 2) % F.col("n_docs"),
            )
        ).alias("dst_doc"),
    ).join(d2, "dst_doc")
    e = links.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    coup = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.dst") == F.col("r.dst"))
            & (F.col("l.src") < F.col("r.src")),
        )
        .groupBy(
            F.col("l.src").alias("host_a"), F.col("r.src").alias("host_b")
        )
        .agg(F.count("*").alias("n_coupled"))
    )
    coci = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.src") == F.col("r.src"))
            & (F.col("l.dst") < F.col("r.dst")),
        )
        .groupBy(
            F.col("l.dst").alias("host_a"), F.col("r.dst").alias("host_b")
        )
        .agg(F.count("*").alias("n_cocited"))
    )
    z = F.lit(0).cast("long")
    return (
        coup.join(coci, ["host_a", "host_b"], "full")
        .select(
            "host_a",
            "host_b",
            F.coalesce("n_coupled", z).alias("n_coupled"),
            F.coalesce("n_cocited", z).alias("n_cocited"),
        )
    )
