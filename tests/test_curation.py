"""Curation operators: plan-shape pins (the 100 TB story) + randomized
parity against pure-Python references."""

import random
import re

from pyspark.sql import functions as F

from scidbgeo_spark import model
from scidbgeo_spark.operators import curation, dedup


def _docs(spark, sf):
    return model.load_table(spark, sf, "documents")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- plan shape: these operators must keep their scalable plans ----


def test_pii_and_sample_plans_have_zero_exchanges(spark, sf_smoke):
    """Redaction and seeded sampling are pure projections/filters — any
    Exchange in their plan is a regression."""
    docs = _docs(spark, sf_smoke)
    assert _plan(curation.pii_redact(docs)).count("Exchange") == 0
    assert _plan(curation.stratified_sample(docs)).count("Exchange") == 0


def test_pack_sequences_single_exchange(spark, sf_smoke):
    """One shuffle total: the groupBy(shard, chunk_id) must reuse the
    window's hash-partitioning on shard (subset-of-keys distribution),
    not add a second exchange."""
    assert _plan(curation.pack_sequences(_docs(spark, sf_smoke))).count("Exchange") == 1


def test_contamination_broadcasts_eval_side(spark, sf_smoke):
    """The benchmark n-gram set must reach the corpus via broadcast —
    a shuffled join would move the exploded corpus shingles."""
    docs = _docs(spark, sf_smoke)
    plan = _plan(
        curation.contamination_check(docs, docs.limit(5).select("doc_id", "text"))
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- randomized parity vs pure-Python references ----


def test_pack_sequences_matches_python_reference(spark):
    rng = random.Random(7)
    ids = rng.sample(range(10_000), 300)
    rows = [(i, " ".join(["w"] * rng.randint(1, 900))) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.shard, r.chunk_id): (r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
        for r in curation.pack_sequences(df).collect()
    }
    expected: dict = {}
    per_shard: dict = {}
    for i, text in sorted(rows):
        n = len(text.split(" "))
        shard = i % curation.PACK_SHARDS
        start = per_shard.get(shard, 0)
        chunk = start // curation.PACK_BUDGET
        nd, nt, fd, ld = expected.get((shard, chunk), (0, 0, i, i))
        expected[(shard, chunk)] = (nd + 1, nt + n, min(fd, i), max(ld, i))
        per_shard[shard] = start + n
    assert got == expected


def test_pii_redact_matches_python_re(spark):
    rng = random.Random(11)
    atoms = [
        "plain words here",
        "a.b@x.example",
        "+1-555-0000",
        "trailing@dot.example.",
        "not-an-email@",
        "@not.either",
        "two@y.io,three@z.net",
        "+1-555-99",  # too short: no match
    ]
    rows = [
        (i, " ".join(rng.choice(atoms) for _ in range(rng.randint(0, 6))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in curation.pii_redact(df).collect()}
    import hashlib

    for i, txt in rows:
        assert got[i].n_emails == len(re.findall(curation.EMAIL_RE, txt)), txt
        assert got[i].n_phones == len(re.findall(curation.PHONE_RE, txt)), txt
        red = re.sub(
            curation.PHONE_RE, "<PHONE>", re.sub(curation.EMAIL_RE, "<EMAIL>", txt)
        )
        assert got[i].redacted_fp == hashlib.md5(red.encode()).hexdigest(), txt


def test_contamination_matches_python_sets(spark):
    rng = random.Random(13)
    vocab = [f"t{j}" for j in range(12)]  # tiny vocab -> real overlaps
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    corpus_rows = [(i, mk(rng.randint(1, 30))) for i in range(40)]
    eval_rows = [(1000 + i, mk(rng.randint(1, 30))) for i in range(6)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {r.doc_id: r.n_hits for r in curation.contamination_check(corpus, ev).collect()}

    k = curation.CONTAM_K

    def shingles(text: str) -> set:
        toks = text.split(" ")
        idx = range(max(len(toks) - k, 0) + 1)
        return {" ".join(toks[i : i + k]) for i in idx}

    eval_ng = set().union(*(shingles(t) for _, t in eval_rows))
    expected = {
        i: len(shingles(t) & eval_ng)
        for i, t in corpus_rows
        if shingles(t) & eval_ng
    }
    assert got == expected


def test_stratified_sample_is_subset_with_exact_membership(spark, sf_smoke):
    """Membership is decided row-locally by the hash threshold — verify
    against a Python recomputation of the same md5 rule."""
    import hashlib

    docs = _docs(spark, sf_smoke).select("doc_id", "lang", "text").collect()
    kept = {
        r.doc_id
        for r in curation.stratified_sample(
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
        ).collect()
    }
    for r in docs:
        h = int(hashlib.md5(f"{curation.SAMPLE_SEED}:{r.doc_id}".encode()).hexdigest()[:15], 16)
        rate = curation.SAMPLE_RATES.get(r.lang, curation.RATE_DEFAULT)
        assert (r.doc_id in kept) == (h % 1000 < rate)


def test_corpus_freeze_stage_consistency(spark, sf_correct):
    """The freeze manifest's doc totals equal a stage-by-stage
    recomputation, and no benchmark or contaminated doc survives into
    the packed set."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    docs = _docs(spark, sf_correct)
    is_eval_base = (F.col("doc_id") % curation.EVAL_MOD == curation.EVAL_REM) & (
        F.col("doc_id") < 100000
    )
    eval_docs = docs.filter(
        F.col("doc_id") % curation.EVAL_MOD == curation.EVAL_REM
    ).select("doc_id", "text")
    corp = dedup.dup_corpus(docs).filter(~is_eval_base)
    keep = {r.keep_id for r in dedup.dedup_exact(corp).collect()}
    contam = {
        r.doc_id for r in curation.contamination_check(corp, eval_docs).collect()
    }
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    import hashlib

    survivors = set()
    for r in corp.select("doc_id").collect():
        i = r.doc_id
        if i not in keep or i in contam:
            continue
        h = int(hashlib.md5(f"{curation.SAMPLE_SEED}:{i}".encode()).hexdigest()[:15], 16)
        rate = curation.SAMPLE_RATES.get(lang.get(i, "unk"), curation.RATE_DEFAULT)
        if h % 1000 < rate:
            survivors.add(i)

    out = entry.q_corpus_freeze(spark, sf_correct).collect()
    assert sum(r.n_docs for r in out) == len(survivors)
    eval_base_ids = {i for i in lang if i % curation.EVAL_MOD == curation.EVAL_REM}
    assert not (survivors & eval_base_ids)
    assert not (survivors & contam)


def test_url_filter_rules_and_zero_shuffle(spark, sf_smoke):
    """Each rule bit fires on a crafted url; the gate is pure column
    algebra (zero exchanges)."""
    from scidbgeo_spark.operators import curation

    rows = spark.createDataFrame(
        [
            (0, "https://ok.example/p/1"),
            (1, "https://site0.example/p/1"),      # blocked host
            (2, "https://ok.example/casino/x"),    # keyword
            (3, "ftp://ok.example/p/1"),           # scheme
            (4, "https://ok.example/p/" + "9" * 150),  # too long
            (5, "https://www.site3.example/p/13"), # host + keyword
        ],
        "doc_id long, url string",
    )
    out = curation.url_filter(rows)
    assert _plan(out).count("Exchange") == 0
    got = {r["doc_id"]: (r["keep"], r["reason_mask"], r["url_host"]) for r in out.collect()}
    assert got[0] == (True, 0, "ok.example")
    assert got[1] == (False, curation.U_BLOCK_DOMAIN, "site0.example")
    assert got[2] == (False, curation.U_KEYWORD, "ok.example")
    assert got[3] == (False, curation.U_SCHEME, "ok.example")
    assert got[4][1] == curation.U_TOO_LONG
    assert got[5] == (
        False,
        curation.U_BLOCK_DOMAIN + curation.U_KEYWORD,
        "site3.example",
    )


def test_funnel_ordering_semantics(spark):
    """A user whose stages are out of order does not advance; first-touch
    times chain strictly."""
    from scidbgeo_spark.operators import temporal

    rows = [
        # user 1: full ordered funnel
        (0, "2024-01-01 00:00:00", 1, "signup"),
        (1, "2024-01-01 00:01:00", 1, "view"),
        (2, "2024-01-01 00:02:00", 1, "click"),
        (3, "2024-01-01 00:03:00", 1, "purchase"),
        # user 2: view BEFORE signup -> stalls at signup
        (4, "2024-01-01 00:00:30", 2, "view"),
        (5, "2024-01-01 00:01:30", 2, "signup"),
        # user 3: signup+view only
        (6, "2024-01-01 00:00:00", 3, "signup"),
        (7, "2024-01-01 00:05:00", 3, "view"),
        # user 4: purchase with no prior stages -> counted nowhere
        (8, "2024-01-01 00:00:00", 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["stage"]: r["n_users"] for r in temporal.funnel(ev).collect()}
    assert got == {"signup": 3, "view": 2, "click": 1, "purchase": 1}


def test_new_r5_operator_plan_shapes(spark, sf_smoke):
    """Plan pins for the round-5 additions: the geometry audit is
    exchange-free (pure array folds); the pyramid adds one cascade
    exchange per extra level on top of the base aggregate (and never
    rescans the base); the decile map and the PQ LUT reach the corpus
    via broadcast joins."""
    from scidbgeo_spark.operators import pixel, regions, similarity

    docs = _docs(spark, sf_smoke)
    rings = spark.createDataFrame(
        [(1, 0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 2.0, 2.0])],
        "zone_id int, ring_no int, xs array<double>, ys array<double>",
    )
    assert _plan(regions.zone_geometry(rings)).count("Exchange") == 0

    coo = model.raster_coo(spark, sf_smoke)
    pyr = pixel.raster_pyramid(coo, levels=3)
    pyr.collect()  # AQE finalizes reuse only in the executed plan
    p3 = _plan(pyr)
    # the three union branches share the base-level aggregate exchange:
    # without ReusedExchange the base raster would be re-aggregated per
    # level, turning one scan into three at 100 TB
    assert "isFinalPlan=true" in p3
    assert p3.count("ReusedExchange") >= 1

    assert "BroadcastHashJoin" in _plan(curation.quality_deciles(docs)) or (
        "BroadcastExchange" in _plan(curation.quality_deciles(docs))
    )
    emb = model.load_table(spark, sf_smoke, "embeddings")
    assert "BroadcastExchange" in _plan(similarity.ann_pq_topk(emb))


def test_rasterize_layer_df_plans_equi_join(spark):
    """The tile x ring pruning must plan as a hash/sort-merge EQUI-join
    on the exploded tile keys — a BroadcastNestedLoopJoin means the
    bbox condition regressed to an inequality join (whole layer to the
    driver, O(tiles x rings) comparisons)."""
    from scidbgeo_spark import fixtures
    from scidbgeo_spark.operators import zonal

    rows = [
        (int(z), [float(v) for v in r[:, 0]], [float(v) for v in r[:, 1]])
        for z, r in fixtures.rect_grid_polygons(100, 100)
    ]
    layer = spark.createDataFrame(rows, "zone_id int, xs array<double>, ys array<double>")
    plan = _plan(zonal.rasterize_layer_df(spark, layer, 100, 100, 50))
    assert "BroadcastNestedLoopJoin" not in plan


def test_flow_moran_trajectory_plan_shapes(spark, sf_smoke):
    """Plan pins for the late-r5 additions: Moran's I reaches the cell
    self-join via BROADCAST (the cell table caps at 64,800 rows
    forever); the trajectory rollup runs ONE exchange — the lag window
    and the groupBy share the user_id hash partitioning; the flow-edge
    kernel is a single halo exchange + applyInPandas, no join."""
    from scidbgeo_spark import tiling
    from scidbgeo_spark.operators import focal, knn, temporal

    pts = model.points(spark, sf_smoke)
    assert "BroadcastExchange" in _plan(knn.moran_i(pts))

    ev = model.load_table(spark, sf_smoke, "events")
    tplan = _plan(temporal.trajectory_stats(ev))
    assert tplan.count("Exchange hashpartitioning") == 1

    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // 100, 100
    tiles = tiling.pack_tiles(coo, 50, h, w)
    eplan = _plan(focal.flow_edges_coo(tiles, h, w, 50))
    assert "FlatMapGroupsInPandas" in eplan
    assert "Join" not in eplan


def test_simpson_diversity_vs_python(spark, sf_smoke):
    """Python twin of per-language Simpson source concentration +
    range/pure-concentration identities."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import curation

    docs = model.load_table(spark, sf_smoke, "documents")
    per = {}
    for r in docs.select("lang", "source").collect():
        per.setdefault(r.lang, {}).setdefault(r.source, 0)
        per[r.lang][r.source] += 1
    want = {}
    for lang, srcs in per.items():
        nd = sum(srcs.values())
        ps = sum(n * (n - 1) for n in srcs.values())
        want[lang] = (
            nd,
            len(srcs),
            ps / (nd * (nd - 1)) if nd > 1 else 0.0,
        )
    got = {
        r.lang: (r.n_docs, r.n_sources, r.simpson)
        for r in curation.simpson_diversity(docs).collect()
    }
    assert got == want
    assert all(0.0 <= v[2] <= 1.0 for v in got.values())


def test_late_r5_batch_plan_shapes(spark, sf_smoke):
    """Plan pins for the late-r5 additions: doc_chunks is exchange-FREE
    (sequence+slice+explode pipeline, narrow all the way); the
    winnowing fingerprint set reaches the output through exactly ONE
    exchange (the per-doc distinct — hashing and window minima are
    in-array codegen); ripley_k and the semivariogram must never plan a
    CartesianProduct (cell-candidate equi-joins only); the band-axis
    composites run ONE hash exchange each."""
    from scidbgeo_spark.operators import knn, temporal, text

    docs = _docs(spark, sf_smoke)
    assert _plan(text.doc_chunks(docs)).count("Exchange") == 0
    assert (
        _plan(text.winnow_fingerprints(docs)).count("Exchange hashpartitioning")
        == 1
    )

    pts = model.points(spark, sf_smoke)
    for df in (knn.ripley_k(pts), knn.semivariogram(pts)):
        p = _plan(df)
        assert "CartesianProduct" not in p

    coo3 = model.raster3_coo(spark, sf_smoke)
    assert _plan(temporal.band_argmax(coo3)).count(
        "Exchange hashpartitioning"
    ) == 1
    assert _plan(temporal.gap_fill(coo3)).count(
        "Exchange hashpartitioning"
    ) == 1


def test_host_triangles_vs_python(spark, sf_smoke):
    """Brute-force Python twin of the degree-ordered triangle count +
    clustering coefficient on the deterministic host graph."""
    from itertools import combinations

    from scidbgeo_spark.operators import graph

    docs = model.load_table(spark, sf_smoke, "documents")
    rows = docs.select("doc_id", "source").collect()
    n = len(rows)
    src_of = {r.doc_id: r.source for r in rows}
    edges = set()
    for r in rows:
        for dst_doc in (
            (r.doc_id * 7 + 3) % n,
            (r.doc_id * r.doc_id // 5 + 2) % n,
        ):
            dst = src_of[dst_doc]
            if dst != r.source:
                edges.add((min(r.source, dst), max(r.source, dst)))
    nodes = sorted({x for e in edges for x in e})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes)
    [row] = graph.host_triangles(docs).collect()
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(nodes),
        len(edges),
        tri,
    )
    assert abs(row.gcc - (3.0 * tri / wedges if wedges else 0.0)) < 1e-12
    assert tri > 0


def test_integral_image_and_triangles_plan_shapes(spark, sf_smoke):
    """Plan pins: the SAT never plans a cartesian/NL join (all aux
    tables join on tile keys) and never exchanges the raster more than
    the tile scan + the marginal windows; the triangle count joins on
    host keys only — no CartesianProduct anywhere."""
    from scidbgeo_spark import tiling
    from scidbgeo_spark.operators import graph, pixel

    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // 100, 100
    tiles = tiling.pack_tiles(coo, 50, h, w)
    p = _plan(pixel.integral_image(tiles, h, w, 50))
    assert "CartesianProduct" not in p

    docs = _docs(spark, sf_smoke)
    p2 = _plan(graph.host_triangles(docs))
    assert "CartesianProduct" not in p2


def test_funnel_steps_vs_python(spark):
    """Randomized parity for the per-user completion chain: the greedy
    sorted fold must equal the recursive chained-min definition; covers
    duplicate timestamps, out-of-order stages, single-event users and
    non-completers (absent from the output)."""
    from scidbgeo_spark.operators import temporal

    rng = random.Random(4107)
    steps = ("signup", "view", "click", "purchase")
    types = list(steps) + ["error"]
    base = 1704067200  # 2024-01-01 epoch seconds
    rows = []
    eid = 0
    for u in range(30):
        for _ in range(rng.randint(0, 12)):
            rows.append((eid, base + rng.randint(0, 50), u, rng.choice(types)))
            eid += 1
    ev = (
        spark.createDataFrame(
            rows, "event_id long, sec long, user_id long, event_type string"
        )
        .withColumn(
            "ts", F.col("sec").cast("timestamp").cast("timestamp_ntz")
        )
        .drop("sec")
    )
    rank = {s: i for i, s in enumerate(steps)}
    expect = {}
    by_user = {}
    for e, sec, u, t in rows:
        by_user.setdefault(u, []).append((sec * 1_000_000, rank.get(t)))
    for u, evs in by_user.items():
        acc = [None] * 4
        for t, rk in sorted(
            (p for p in evs if p[1] is not None), key=lambda p: (p[0], p[1])
        ):
            if acc[rk] is None and (
                rk == 0 or (acc[rk - 1] is not None and t > acc[rk - 1])
            ):
                acc[rk] = t
        if acc[3] is not None:
            expect[u] = tuple(acc)
    got = {
        r.user_id: (r.t_signup, r.t_view, r.t_click, r.t_purchase)
        for r in temporal.funnel_steps(ev, steps).collect()
    }
    assert got == expect
    assert expect  # the fixture must actually produce completers


def test_longest_prefix_join_vs_python(spark):
    """Randomized parity for the robots-gate join: segment-boundary
    longest-prefix match, '/' catch-all, hosts with NO rules falling to
    default_allow, and the root path '/' (whose prefix explosion emits
    '/' twice) still yielding exactly one output row per url."""
    rng = random.Random(4108)
    segs = ["a", "b", "c", "aa"]
    hosts = [f"h{k}.example" for k in range(5)]  # h4 gets no rules
    rules = set()
    for h in hosts[:4]:
        rules.add((h, "/", rng.random() < 0.5))
        for _ in range(4):
            depth = rng.randint(1, 2)
            p = "/" + "/".join(rng.choice(segs) for _ in range(depth))
            if not any(r[0] == h and r[1] == p for r in rules):
                rules.add((h, p, rng.random() < 0.5))
    urls = []
    for d in range(120):
        h = rng.choice(hosts)
        depth = rng.randint(0, 3)
        p = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        urls.append((d, h, p))
    u_df = spark.createDataFrame(urls, "doc_id long, host string, path string")
    r_df = spark.createDataFrame(
        sorted(rules), "host string, prefix string, allow boolean"
    )
    got = {
        r.doc_id: (r.rule_prefix, r.allow)
        for r in curation.longest_prefix_join(u_df, r_df).collect()
    }
    assert len(got) == len(urls)  # exactly one row per url, even path='/'
    for d, h, p in urls:
        cands = [
            (pre, al)
            for (rh, pre, al) in rules
            if rh == h
            and (pre == "/" or p == pre or p.startswith(pre + "/"))
        ]
        if cands:
            best = max(cands, key=lambda x: len(x[0]))
            assert got[d] == best, (d, h, p)
        else:
            assert got[d] == (None, True), (d, h, p)
    assert any(h == "h4.example" for _, h, _p in urls)  # default path hit


def test_longest_prefix_join_broadcasts_rules(spark):
    """The rule table must reach the urls via broadcast — a shuffled
    rule join at web scale would move the whole corpus."""
    u_df = spark.createDataFrame(
        [(0, "h0.example", "/a/b")], "doc_id long, host string, path string"
    )
    r_df = spark.createDataFrame(
        [("h0.example", "/", True)], "host string, prefix string, allow boolean"
    )
    p = _plan(curation.longest_prefix_join(u_df, r_df))
    assert "BroadcastHashJoin" in p


def test_host_split_python_twin_and_disjointness(spark):
    """The split totals must match a pure-Python fold of the same hash,
    and — leakage guard — every host maps to exactly one split by
    construction (asserted over the per-host assignment)."""
    rng = random.Random(4109)
    rows = [
        (d, f"site{rng.randint(0, 40)}.example", rng.randint(1, 500))
        for d in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, n_chars long")

    def phash(s):
        a = 0
        for ch in s:
            a = (a * 31 + ord(ch)) % curation.HOST_HASH_MOD
        return a

    def psplit(h):
        m = phash(h) % 10
        return "train" if m < 8 else ("val" if m == 8 else "test")

    expect = {}
    for _d, h, nc in rows:
        sp = psplit(h)
        e = expect.setdefault(sp, [0, set(), 0])
        e[0] += 1
        e[1].add(h)
        e[2] += nc
    got = {
        r.split: (r.n_docs, r.n_hosts, r.n_chars)
        for r in curation.host_split(docs).collect()
    }
    assert got == {k: (v[0], len(v[1]), v[2]) for k, v in expect.items()}
    # all three splits exercised by the fixture
    assert set(got) == {"train", "val", "test"}


def test_crawl_schedule_python_twin_and_broadcast(spark):
    """Slots are 0..n-1 per host in doc_id order, fetch_at = slot*delay;
    the delay table must reach the urls via broadcast."""
    urls = spark.createDataFrame(
        [(d, f"h{d % 3}.example") for d in range(20)], "doc_id long, host string"
    )
    delays = spark.createDataFrame(
        [(f"h{k}.example", k + 1) for k in range(3)], "host string, delay_s long"
    )
    out = curation.crawl_schedule(urls, delays)
    assert "BroadcastHashJoin" in _plan(out)
    got = {r.doc_id: (r.slot, r.fetch_at_s) for r in out.collect()}
    per_host = {}
    for d in range(20):
        h = d % 3
        k = per_host.get(h, 0)
        per_host[h] = k + 1
        assert got[d] == (k, k * (h + 1)), d


def test_pareto_frontier_vs_bruteforce(spark):
    """Randomized parity against the O(n^2) strict-dominance check,
    including exact (q, n) duplicates (both stay on the frontier)."""
    rng = random.Random(4110)
    rows = []
    for d in range(150):
        words = [rng.choice("abcdefgh") for _ in range(rng.randint(1, 30))]
        rows.append((d, " ".join(words)))
    rows.append((150, rows[7][1]))  # exact duplicate text
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pts = {d: (len(set(t.split(" "))), len(t)) for d, t in rows}
    expect = {
        d
        for d, (q, n) in pts.items()
        if not any(q2 > q and n2 > n for q2, n2 in pts.values())
    }
    got = {r.doc_id for r in curation.pareto_frontier(docs).collect()}
    assert got == expect
    assert 150 in got or 7 not in got or (7 in got and 150 in got)


# ---- HITS / anchor text / time-weighted average (late r5) ----


def test_host_hits_vs_python(spark, sf_smoke):
    """Exact-integer Python twin of the 2-iteration max-normalized HITS
    over the deterministic host graph (hugeint product via Python int)."""
    from scidbgeo_spark.operators import graph

    docs = _docs(spark, sf_smoke)
    rows = docs.select("doc_id", "source").collect()
    n = len(rows)
    src_of = {r.doc_id: r.source for r in rows}
    edges = {}
    for r in rows:
        key = (r.source, src_of[(r.doc_id * 7 + 3) % n])
        edges[key] = edges.get(key, 0) + 1
    nodes = sorted({x for e in edges for x in e})
    a = {v: graph.HITS_SCALE for v in nodes}
    h = {}
    for _ in range(graph.HITS_ITERS):
        hraw = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            hraw[s] += w * a[d]
        mx = max(max(hraw.values()), 1)
        h = {v: graph.HITS_SCALE * hraw[v] // mx for v in nodes}
        araw = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            araw[d] += w * h[s]
        mx = max(max(araw.values()), 1)
        a = {v: graph.HITS_SCALE * araw[v] // mx for v in nodes}
    got = {
        r.source: (r.hub_scaled, r.auth_scaled)
        for r in graph.host_hits(docs).collect()
    }
    assert got == {v: (h[v], a[v]) for v in nodes}
    assert max(x for v in got.values() for x in v) == graph.HITS_SCALE


def test_anchor_text_agg_vs_python(spark, sf_smoke):
    """Anchor-text rollup twin: counts and the (count DESC, anchor ASC)
    modal-anchor tie rule."""
    from collections import Counter

    from scidbgeo_spark.operators import graph

    docs = _docs(spark, sf_smoke)
    rows = docs.select("doc_id", "source", "text").collect()
    n = len(rows)
    src_of = {r.doc_id: r.source for r in rows}
    per = Counter()
    for r in rows:
        anchor = " ".join(r.text.split(" ")[: graph.ANCHOR_WORDS])
        per[(src_of[(r.doc_id * 7 + 3) % n], anchor)] += 1
    hosts = {}
    for (host, anchor), c in per.items():
        hosts.setdefault(host, []).append((anchor, c))
    want = {}
    for host, lst in hosts.items():
        top = min(lst, key=lambda t: (-t[1], t[0]))
        want[host] = (sum(c for _, c in lst), len(lst), top[0], top[1])
    got = {
        r.host: (r.n_links, r.n_anchors, r.top_anchor, r.top_count)
        for r in graph.anchor_text_agg(docs).collect()
    }
    assert got == want


def test_time_weighted_avg_vs_python(spark, sf_smoke):
    """LOCF time-weighted mean twin: per-user exact numerator/denominator
    over (ts, event_id)-ordered holding durations; single-event users
    excluded."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = ev.select("user_id", "ts", "event_id", "value").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        num = den = 0
        for cur, nxt in zip(rs, rs[1:]):
            dur = int(
                (nxt.ts - cur.ts).total_seconds() * 1_000_000 + 0.5
            )
            num += round(cur.value * 100) * dur
            den += dur
        if den > 0:
            want[u] = (num, den, num // den)
    got = {
        r.user_id: (r.twa_num, r.twa_den, r.twa_cents)
        for r in temporal.time_weighted_avg(ev).collect()
    }
    assert got == want
    assert len(got) > 1


def test_hits_anchor_twa_plan_shapes(spark, sf_smoke):
    """Plan pins: no cartesian products anywhere (the 1-row scalars
    broadcast); time_weighted_avg shuffles exactly once (the user-keyed
    window and the per-user agg share the hash partitioning)."""
    from scidbgeo_spark.operators import graph, temporal

    docs = _docs(spark, sf_smoke)
    assert "CartesianProduct" not in _plan(graph.host_hits(docs))
    assert "CartesianProduct" not in _plan(graph.anchor_text_agg(docs))
    ev = model.load_table(spark, sf_smoke, "events")
    p = _plan(temporal.time_weighted_avg(ev))
    assert "CartesianProduct" not in p
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1


def test_curriculum_shards_vs_python_and_partition_invariance(spark, sf_smoke):
    """The decomposed distributed rank equals the plain spec
    (row_number per shard over (n_chars, doc_id)) and is invariant to
    input partitioning."""
    docs = _docs(spark, sf_smoke)
    rows = docs.select("doc_id", "n_chars").collect()
    want = {}
    by_shard = {}
    for r in rows:
        s = (r.doc_id * curation.CUR_A + curation.CUR_B) % curation.CUR_P \
            % curation.CUR_SHARDS
        by_shard.setdefault(s, []).append(r)
    for s, rs in by_shard.items():
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        for i, r in enumerate(rs, 1):
            want[r.doc_id] = (s, i)
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in curation.curriculum_shards(docs).collect()
    }
    assert got == want
    got2 = {
        r.doc_id: (r.shard, r.pos)
        for r in curation.curriculum_shards(docs.repartition(13)).collect()
    }
    assert got2 == want
    assert len(by_shard) == curation.CUR_SHARDS  # hash actually spreads


def test_bigram_lm_score_vs_python_and_short_docs(spark):
    """Exact twin on a tiny corpus that includes single-token and empty
    docs (excluded — no bigram), plus a repeated phrase whose bigrams
    should score high."""
    from scidbgeo_spark.operators import text as t

    data = [
        (0, "the cat sat"),
        (1, "the cat ran"),
        (2, "cat"),
        (3, ""),
        (4, "the cat sat"),
    ]
    docs = spark.createDataFrame(data, ["doc_id", "text"])
    # python twin
    from collections import Counter

    c2 = Counter()
    for _, txt in data:
        ws = txt.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, a + " " + b)] += 1
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    want = {}
    for did, txt in data:
        ws = txt.split(" ")
        bgs = [(a, a + " " + b) for a, b in zip(ws, ws[1:])]
        if not bgs:
            continue
        sp = sum(c2[k] * t.LM2_SCALE // c1[k[0]] for k in bgs)
        want[did] = (len(bgs), sp, sp // len(bgs))
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p, r.lm2_score)
        for r in t.bigram_lm_score(docs).collect()
    }
    assert got == want
    assert 2 not in got and 3 not in got  # no-bigram docs excluded
    # "the cat" always continues identically for doc 0/1/4's first bigram;
    # repeated docs outscore the divergent one
    assert got[0] == got[4] and got[0][2] > got[1][2] * 0  # sanity


def test_simhash_recall_bounds(spark, sf_smoke):
    """Gauge sanity on the planted-dup corpus: a nonempty exact baseline
    and 0 <= recovered <= exact with recall = recovered/exact."""
    from scidbgeo_spark.operators import dedup as dd

    [row] = dd.simhash_recall(dd.dup_corpus(_docs(spark, sf_smoke))).collect()
    assert row.n_exact > 0
    assert 0 <= row.n_recovered <= row.n_exact
    assert abs(row.recall - row.n_recovered / row.n_exact) < 1e-12


def test_cluster_quality_vs_python(spark, sf_smoke):
    """Exact rational-centroid WCSS twin: recompute n*ssq - ||s||^2 in
    unbounded Python ints from the (oracle-pinned) assignment."""
    import math

    from scidbgeo_spark.operators import similarity as sim

    emb = model.load_table(spark, sf_smoke, "embeddings")
    asg = {r.vec_id: r.cluster for r in sim.kmeans_assign(emb).collect()}
    vecs = {
        r.vec_id: [math.floor(float(x) * sim.KMEANS_SCALE) for x in r.embedding]
        for r in emb.collect()
    }
    by_c = {}
    for vid, c in asg.items():
        by_c.setdefault(c, []).append(vecs[vid])
    want = {}
    for c, vs in by_c.items():
        n = len(vs)
        ssq = sum(sum(x * x for x in v) for v in vs)
        s = [sum(col) for col in zip(*vs)]
        snorm2 = sum(x * x for x in s)
        num = n * ssq - snorm2
        want[c] = (n, ssq, float(num), num // (n * n))
    got = {
        r.cluster: (r.n, r.ssq, r.wcss_num, r.msd)
        for r in sim.cluster_quality(emb).collect()
    }
    assert got == want
    assert all(v[3] >= 0 for v in got.values())


def test_dup_source_matrix_and_cell_skew_twins(spark, sf_smoke):
    """Rollup twins: the source matrix re-derives from collected pairs;
    the Gini recomputes from collected per-cell counts (rank form)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)

    docs = _docs(spark, sf_smoke)
    pairs = dedup.minhash_dup_pairs(dedup.dup_corpus(docs)).collect()
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    from collections import Counter

    want = Counter()
    for r in pairs:
        sa, sb = src[r.a % 100000], src[r.b % 100000]
        want[(min(sa, sb), max(sa, sb))] += 1
    got = {
        (r.src_a, r.src_b): r.n_pairs
        for r in em.q_dup_source_matrix(spark, sf_smoke).collect()
    }
    assert got == dict(want) and len(got) > 0

    pts = model.points(spark, sf_smoke).collect()
    cells = Counter()
    import math as m

    for r in pts:
        cells[m.floor(r.lat + 90) * 360 + m.floor(r.lon + 180)] += 1
    cs = sorted(cells.values())
    n, tot = len(cs), sum(cs)
    gnum = 2 * sum(i * c for i, c in enumerate(cs, 1)) - (n + 1) * tot
    [row] = em.q_cell_skew_stats(spark, sf_smoke).collect()
    assert (row.n_cells, row.n_points, row.max_cell_n) == (n, tot, max(cs))
    assert (row.gini_num, row.gini_den) == (gnum, n * tot)
    assert abs(row.gini - gnum / (n * tot)) < 1e-15
    assert row.gini > 0.05  # the hot cell makes the grid measurably skewed


def test_trajectory_segments_and_od_flows(spark, sf_smoke):
    """Twins for the gaps-and-islands segmentation and the OD matrix,
    plus the single-user-shuffle plan pin for the segmentation."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    traj = {}
    for r in rows:
        traj.setdefault(r.user_id, []).append(
            ((r.event_id * 7919) % 180000, (r.event_id * 9973) % 360000)
        )
    want_seg = {}
    want_od = {}
    for u, pts in traj.items():
        seg, prev = 0, None
        stats = None
        for py, px in pts:
            brk = prev is None or (
                (py - prev[0]) ** 2 + (px - prev[1]) ** 2
                > temporal.SEG_JUMP2
            )
            if brk:
                seg += 1
                want_seg[(u, seg)] = [0, 0, py, py, px, px]
            st = want_seg[(u, seg)]
            st[0] += 1
            if not brk:
                st[1] += (py - prev[0]) ** 2 + (px - prev[1]) ** 2
            st[2], st[3] = min(st[2], py), max(st[3], py)
            st[4], st[5] = min(st[4], px), max(st[5], px)
            if prev is not None:
                o = (prev[0] // temporal.OD_CELL) * 12 + prev[1] // temporal.OD_CELL
                d = (py // temporal.OD_CELL) * 12 + px // temporal.OD_CELL
                if o != d:
                    want_od[(o, d)] = want_od.get((o, d), 0) + 1
            prev = (py, px)
    got = {
        (r.user_id, r.seg_id): (r.n_pts, r.path_len2, r.bbox_h, r.bbox_w)
        for r in temporal.trajectory_segments(ev).collect()
    }
    assert got == {
        k: (v[0], v[1], v[3] - v[2], v[5] - v[4])
        for k, v in want_seg.items()
    }
    god = {
        (r.o_cell, r.d_cell): r.n_trips
        for r in temporal.od_flows(ev).collect()
    }
    assert god == want_od and len(god) > 10
    p = temporal.trajectory_segments(ev)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1


def test_band_correlation_vs_numpy_and_outlinks(spark, sf_smoke):
    """band_correlation matches numpy's exact-int Pearson on the pivoted
    raster; outlink_extract matches a Python re twin."""
    import numpy as np

    from scidbgeo_spark import model as mdl
    from scidbgeo_spark.operators import temporal, text as t

    coo = mdl.raster3_coo(spark, sf_smoke)
    rows = coo.collect()
    cells = {}
    for r in rows:
        cells.setdefault((r.y, r.x), {})[r.band] = r.value
    mat = np.array(
        [[c[b] for b in range(4)] for c in cells.values()], dtype=np.int64
    )
    got = {
        (r.band_a, r.band_b): (r.n, r.r)
        for r in temporal.band_correlation(coo).collect()
    }
    n = len(mat)
    for (i, j), (gn, gr) in got.items():
        x, y = mat[:, i].astype(object), mat[:, j].astype(object)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        vx = n * int((x * x).sum()) - int(x.sum()) ** 2
        vy = n * int((y * y).sum()) - int(y.sum()) ** 2
        assert gn == n
        import math

        want = num / (math.sqrt(vx) * math.sqrt(vy)) if vx and vy else None
        assert (gr is None) == (want is None)
        if want is not None:
            assert abs(gr - want) < 1e-12

    docs = _docs(spark, sf_smoke)
    got_l = {r.doc_id: r for r in t.outlink_extract(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        i = r.doc_id
        hrefs = [f"http://h{(i * 3 + 1) % 20}.example/p{i % 7}"]
        if i % 2 == 1:
            hrefs.append(f"http://h{i % 20}.example/q{i % 5}")
        own = f"http://h{i % 20}.example"
        g = got_l[i]
        assert g.n_links == len(hrefs)
        assert g.first_href == hrefs[0]
        assert g.n_offsite == sum(not h.startswith(own) for h in hrefs)


def test_cusum_and_assortativity_twins(spark, sf_smoke):
    """CUSUM: the windowed prefix-minus-running-min equals the textbook
    sequential reset recursion.  Assortativity: exact-int Pearson twin
    over the symmetrized host edge list."""
    import math

    from scidbgeo_spark.operators import graph, temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("event_type", "ts", "event_id", "value").collect(),
        key=lambda r: (r.event_type, r.ts, r.event_id),
    )
    by_t = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(round(r.value * 100))
    want = {}
    for t, xs in by_t.items():
        k = sum(xs) // len(xs)
        s = mx = 0
        for x in xs:
            s = max(0, s + x - k)
            mx = max(mx, s)
        want[t] = (len(xs), k, mx)
    got = {
        r.event_type: (r.n, r.k, r.cusum_max)
        for r in temporal.cusum_max(ev).collect()
    }
    assert got == want

    docs = _docs(spark, sf_smoke)
    n_docs = docs.count()
    src_of = {
        r.doc_id: r.source for r in docs.select("doc_id", "source").collect()
    }
    eu = set()
    for i, s0 in src_of.items():
        d = src_of[(i * 7 + 3) % n_docs]
        if d != s0:
            eu.add((min(s0, d), max(s0, d)))
    deg = {}
    for a, b in eu:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in eu:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    [row] = graph.host_assortativity(docs).collect()
    assert row.n_edges == len(eu)
    if vx and vy:
        assert abs(row.r - num / (math.sqrt(vx) * math.sqrt(vy))) < 1e-12
    else:
        assert row.r is None


def test_host_coupling_and_centroid_separation_twins(spark, sf_smoke):
    """Coupling/co-citation counts vs a Python set twin on the two-link
    host graph; centroid separation vs exact rational arithmetic from
    the (oracle-pinned) assignment."""
    from scidbgeo_spark.operators import graph, similarity as sim

    docs = _docs(spark, sf_smoke)
    n = docs.count()
    src_of = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    e = set()
    for i, s0 in src_of.items():
        for d_doc in ((i * 7 + 3) % n, (i * i // 5 + 2) % n):
            d = src_of[d_doc]
            if d != s0:
                e.add((s0, d))
    from collections import Counter

    coup, coci = Counter(), Counter()
    es = sorted(e)
    for a1, b1 in es:
        for a2, b2 in es:
            if b1 == b2 and a1 < a2:
                coup[(a1, a2)] += 1
            if a1 == a2 and b1 < b2:
                coci[(b1, b2)] += 1
    want = {
        k: (coup.get(k, 0), coci.get(k, 0))
        for k in set(coup) | set(coci)
    }
    got = {
        (r.host_a, r.host_b): (r.n_coupled, r.n_cocited)
        for r in graph.host_coupling(docs).collect()
    }
    assert got == want and len(got) > 5

    emb = model.load_table(spark, sf_smoke, "embeddings")
    import math

    asg = {r.vec_id: r.cluster for r in sim.kmeans_assign(emb).collect()}
    vecs = {
        r.vec_id: [math.floor(float(x) * sim.KMEANS_SCALE) for x in r.embedding]
        for r in emb.collect()
    }
    by_c = {}
    for vid, c in asg.items():
        by_c.setdefault(c, []).append(vecs[vid])
    cs = {c: ([sum(col) for col in zip(*vs)], len(vs)) for c, vs in by_c.items()}
    got_s = {
        (r.cluster_a, r.cluster_b): r.d2
        for r in sim.centroid_separation(emb).collect()
    }
    for (a, b), d2 in got_s.items():
        sa, na = cs[a]
        sb, nb = cs[b]
        num = sum((x * nb - y * na) ** 2 for x, y in zip(sa, sb))
        assert d2 == float(num) / float((na * nb) ** 2)
    assert len(got_s) == len(cs) * (len(cs) - 1) // 2


def test_peak_concurrency_vs_python(spark, sf_smoke):
    """Sweep-line twin: sessions from the gap rule, +1/-1 boundaries,
    closings before openings at equal instants, first-peak tie rule."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("event_type", "user_id", "ts", "event_id").collect(),
        key=lambda r: (r.event_type, r.user_id, r.ts, r.event_id),
    )
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    sess = {}
    cur_k, last_t = None, None
    for r in rows:
        t = int((r.ts - epoch).total_seconds() * 1_000_000 + 0.5)
        k = (r.event_type, r.user_id)
        if k != cur_k or t - last_t > 3600 * 1_000_000:
            sess.setdefault(r.event_type, []).append([t, t])
            cur_k = k
        else:
            sess[r.event_type][-1][1] = t
        last_t = t
        cur_k = k
    want = {}
    for et, ss in sess.items():
        deltas = sorted(
            [(t0, 1) for t0, _ in ss] + [(t1 + 1, -1) for _, t1 in ss],
            key=lambda x: (x[0], x[1]),
        )
        cur = peak = 0
        tp = None
        for t, d in deltas:
            cur += d
            if cur > peak:
                peak, tp = cur, t
        want[et] = (len(ss), peak, tp)
    got = {
        r.event_type: (r.n_sessions, r.peak, r.t_peak_us)
        for r in temporal.peak_concurrency(ev).collect()
    }
    assert got == want
    assert any(v[1] > 1 for v in got.values())


def test_quantile_normalize_decomposed_rank_exact_and_scale_safe(spark, sf_smoke):
    """r6: both quantile_normalize ranks run the curriculum_shards
    decomposition.  Pins (1) exact equality with the plain one-sort
    spec (python twin), (2) partitioning invariance, (3) the plan
    shape: the raw corpus never meets an unpartitioned window — every
    Exchange SinglePartition in the executed plan feeds from a
    HashAggregate (the corpus-sublinear bucket/count tables)."""
    docs = _docs(spark, sf_smoke)
    rows = docs.select("doc_id", "source", "n_chars").collect()
    order = sorted(rows, key=lambda r: (r.n_chars, r.doc_id))
    g_of_rank = {i + 1: r.n_chars for i, r in enumerate(order)}
    n_tot = len(rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    want = {}
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        n_s = len(rs)
        for i, r in enumerate(rs, 1):
            want[r.doc_id] = (src, i, g_of_rank[-(-(i * n_tot) // n_s)])
    got = {
        r.doc_id: (r.source, r.src_rank, r.qn_score)
        for r in curation.quantile_normalize(docs).collect()
    }
    assert got == want
    got2 = {
        r.doc_id: (r.source, r.src_rank, r.qn_score)
        for r in curation.quantile_normalize(docs.repartition(13)).collect()
    }
    assert got2 == want
    plan = (
        curation.quantile_normalize(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for seg in plan.split("Exchange SinglePartition")[1:]:
        head = seg.split("Exchange", 1)[0]
        assert "HashAggregate" in head, (
            "SinglePartition exchange over a non-aggregated (corpus-sized)"
            " input:\n" + seg[:400]
        )
