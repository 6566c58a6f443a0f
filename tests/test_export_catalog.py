"""Export sinks, catalog facade, geotransform, CLI, streaming."""

import csv
import glob

import numpy as np
from pyspark.sql import functions as F

from scidbgeo_spark import export, model, tiling
from scidbgeo_spark.catalog import ArrayCatalog
from scidbgeo_spark.model import CHUNK, RASTER_W, VALUE_MOD, VALUE_MULT


def _dense(n):
    ids = np.arange(n, dtype=np.int64)
    return ((ids * VALUE_MULT) % VALUE_MOD).reshape(n // RASTER_W, RASTER_W)


def test_sorted_csv_export(spark, sf_smoke, tmp_path):
    coo = model.raster_coo(spark, sf_smoke)
    path = str(tmp_path / "coo_csv")
    export.write_sorted_csv(coo, path, single_file=True)
    files = glob.glob(path + "/part-*.csv")
    assert len(files) == 1
    with open(files[0]) as f:
        rows = list(csv.DictReader(f))
    n = coo.count()
    assert len(rows) == n
    # sorted by (y, x) — save(sort(Q,y,x)) semantics
    pairs = [(int(r["y"]), int(r["x"])) for r in rows]
    assert pairs == sorted(pairs)


def test_tiles_to_numpy_roundtrip(spark, sf_smoke):
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    arr = export.tiles_to_numpy(tiles, h, w)
    np.testing.assert_array_equal(arr, _dense(n))


def test_tiles_to_numpy_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        export.tiles_to_numpy(None, 100_000, 100_000)


def test_geotransform_matches_reference_formulas():
    """world2Pixel/Pixel2world math (SciDBGDAL.py:12-56): x = floor((lon -
    ulX)/xDist), lon = x*xDist + ulX."""
    gt = export.GeoTransform(-180.0, 90.0, 0.25, -0.25)
    lon = np.array([-180.0, -179.9, 0.0, 179.99])
    lat = np.array([90.0, 89.9, 0.0, -89.99])
    x, y = gt.world_to_pixel(lon, lat)
    np.testing.assert_array_equal(x, [0, 0, 720, 1439])
    np.testing.assert_array_equal(y, [0, 0, 360, 719])
    lon2, lat2 = gt.pixel_to_world(x, y)
    assert (np.abs(lon2 - lon) <= 0.25).all()
    assert (np.abs(lat2 - lat) <= 0.25).all()


def test_catalog_facade(spark, sf_smoke, tmp_path):
    cat = ArrayCatalog(spark, warehouse=str(tmp_path))
    coo = model.raster_coo(spark, sf_smoke)
    cat.register("coo_view", coo)
    assert "coo_view" in cat.list_arrays()
    assert "y:bigint" in cat.show("coo_view")
    cat.save("coo_saved", coo)
    assert spark.table("coo_saved").count() == coo.count()
    cat.remove("coo_view")
    assert "coo_view" not in cat.list_arrays()
    assert cat.instance_count() >= 1


def test_tile_store_partition_pruning(spark, sf_correct, tmp_path):
    """Persisted chunk tables prune tile_y partitions at planning time —
    the reference's 'between both join inputs' optimization becomes
    storage-level pruning (SURVEY §4 row 1)."""
    from pyspark.sql import functions as F

    from scidbgeo_spark.operators import pixel

    cat = ArrayCatalog(spark, warehouse=str(tmp_path))
    coo = model.raster_coo(spark, sf_correct)
    h, w = 100, 100
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    stored = cat.save_tiles("raster_tiles", tiles)

    pruned = pixel.between_tiles(stored, CHUNK, 0, 0, 49, 99)  # tile_y == 0 only
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile_y" in plan.split("PartitionFilters")[1][:200]
    back = pixel.between(tiling.tiles_to_coo(pruned, "value"), 0, 0, 49, 99)
    assert back.count() == 50 * 100
    # round-trip correctness through the store
    assert tiling.tiles_to_coo(stored, "value").count() == coo.count()


def test_cli_zonal_timing_csv(spark, sf_smoke, tmp_path):
    """CLI writes the reference's timing columns
    (SciDB_analysis.py:57-63)."""
    from scidbgeo_spark import cli

    timed = cli.run_zonal(spark, sf_smoke, 50, 1, None)
    want_fields = [
        "connectionInfo",
        "run",
        "array_table",
        "boundary_table",
        "full_time",
        "join_time",
        "redimension_time",
        "rasterize_time",
        "dataset",
        "chunk",
        "load_time",
    ]
    assert [k for k in timed if k in want_fields] == want_fields
    out = str(tmp_path / "t.csv")
    cli.write_file(out, {("k",): timed})
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and float(rows[0]["full_time"]) > 0


def test_streaming_incremental_two_batches(spark, sf_smoke, tmp_path):
    """Files arriving after the stream starts are processed incrementally
    and the final state equals the batch aggregate over everything."""
    from scidbgeo_spark import streaming

    ev = model.load_table(spark, sf_smoke, "events")
    d = str(tmp_path / "incr")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(d)
    q = (
        streaming.hourly_event_stream(spark, d)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("incr_test")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT sum(n) FROM incr_test").collect()[0][0]
        assert n1 == first.count()
        second.write.mode("append").parquet(d)
        q.processAllAvailable()
        n2 = spark.sql("SELECT sum(n) FROM incr_test").collect()[0][0]
        assert n2 == ev.count()
    finally:
        q.stop()


def test_streaming_hourly_equals_batch(spark, sf_smoke, tmp_path):
    from scidbgeo_spark import streaming

    events_dir = str(tmp_path / "events_stream")
    model.load_table(spark, sf_smoke, "events").write.parquet(events_dir)
    got = streaming.run_to_memory(
        streaming.hourly_event_stream(spark, events_dir), "hourly_test"
    )
    batch = (
        model.load_table(spark, sf_smoke, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    a = {(r.hour, r.event_type): (r.n, r.min_value, r.max_value) for r in got.collect()}
    b = {(r.hour, r.event_type): (r.n, r.min_value, r.max_value) for r in batch.collect()}
    assert a == b


def test_stateful_sessionize_stream_equals_batch(spark, sf_smoke, tmp_path):
    """applyInPandasWithState sessionizer == batch sessionize query, fed
    incrementally in two time-ordered batches."""
    import shutil

    import __spark_entry__ as e
    from scidbgeo_spark import streaming

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").orderBy("ts", "event_id")
    n = ev.count()
    first, second = ev.limit(n // 2), ev.subtract(ev.limit(n // 2))
    d = str(tmp_path / "ev_stream")
    first.coalesce(1).write.mode("overwrite").parquet(d)

    got_df = streaming.sessionize_stream(spark, d)
    q = (
        got_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch arrives later (strictly later timestamps)
        second.coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = spark.table("sess_stream")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    got = {(r.user_id, r.n_sessions, r.n_events) for r in final}
    want = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in e.q_sessionize(spark, sf_smoke).collect()
    }
    assert got == want
    # time-ordered feed: the exactness contract held and says so
    assert all(r.n_out_of_order == 0 for r in final)


def test_sessionize_stream_flags_out_of_order_arrivals(spark, sf_smoke, tmp_path):
    """A file arriving with OLDER timestamps than an already-processed
    batch violates the exactness contract — n_out_of_order must expose
    it instead of silently producing wrong session counts."""
    import __spark_entry__  # noqa: F401  (package path side effect)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from scidbgeo_spark import streaming

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").orderBy("ts", "event_id")
    n = ev.count()
    newer, older = ev.subtract(ev.limit(n // 2)), ev.limit(n // 2)
    d = str(tmp_path / "ev_ooo")
    newer.coalesce(1).write.mode("overwrite").parquet(d)

    q = (
        streaming.sessionize_stream(spark, d)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_ooo")
        .start()
    )
    try:
        q.processAllAvailable()
        older.coalesce(1).write.mode("append").parquet(d)  # late, older data
        q.processAllAvailable()
    finally:
        q.stop()
    t = spark.table("sess_ooo")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).collect()
    )
    assert sum(r.n_out_of_order for r in final) > 0


def test_cli_ingest_geotiff(spark, sf_correct, tmp_path):
    """CLI ingest: real TIFF -> chunk table committed as snapshot 1."""
    import numpy as np

    from scidbgeo_spark import cli, model
    from scidbgeo_spark.catalog import SnapshotCatalog
    from scidbgeo_spark.sources import geotiff

    h, w = model.raster_dims(spark, sf_correct)
    eid = np.arange(h * w, dtype=np.int64)
    arr = ((eid * model.VALUE_MULT) % model.VALUE_MOD).astype(np.int32).reshape(h, w)
    tdir = tmp_path / "tiffs"
    tdir.mkdir()
    (tdir / "r.tif").write_bytes(geotiff.write_tiff(arr))
    wh = str(tmp_path / "wh")
    timed = cli.run_ingest(spark, str(tdir), 50, 1, wh)
    assert timed["n_cells"] == h * w
    assert (timed["height"], timed["width"]) == (h, w)
    cat = SnapshotCatalog(spark, wh)
    table = timed["array_table"]
    assert cat.current_version(table) == 1
    from scidbgeo_spark import tiling

    got = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(cat.read(table), "value").collect()
    )
    want = sorted(
        (r.y, r.x, r.value) for r in model.raster_coo(spark, sf_correct).collect()
    )
    assert got == want
    # repeated runs / chunk sweeps land in distinct tables — no
    # snapshot-1 collision (the docstring's own '--chunks 50 100' case)
    t2 = cli.run_ingest(spark, str(tdir), 50, 2, wh)
    t3 = cli.run_ingest(spark, str(tdir), 100, 1, wh)
    assert len({table, t2["array_table"], t3["array_table"]}) == 3
    assert cat.current_version(t3["array_table"]) == 1


def test_dedup_stream_drops_duplicates_within_horizon(spark, tmp_path):
    """Streaming exact dedup: later copies of a content hash inside the
    watermark horizon are dropped, across micro-batches, and the
    survivor set equals batch dedup's distinct-hash set."""
    from scidbgeo_spark import streaming

    rows = [(i, f"text body {i % 4}") for i in range(12)]  # 4 distinct
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "docs_stream")
    df.filter("doc_id < 6").write.parquet(d)
    stream = streaming.dedup_stream(spark, d, watermark="1 hour")
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ds_test")
        .start()
    )
    try:
        q.processAllAvailable()
        df.filter("doc_id >= 6").write.mode("append").parquet(d)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM ds_test").collect()
    finally:
        q.stop()
    hashes = [r.content_hash for r in got]
    assert len(hashes) == len(set(hashes)) == 4  # one survivor per content
    # survivors are first arrivals: all from the first file batch
    assert all(r.doc_id < 6 for r in got)


def test_zone_page_stream_equals_batch(spark, tmp_path):
    """The streaming pages->geotags->PIP->daily-zone-counts pipeline
    converges to the batch result, including files that arrive after the
    stream starts (the batch PIP operator composes onto the stream
    unchanged because every pre-aggregation stage is stateless)."""
    from scidbgeo_spark import fixtures, streaming
    from scidbgeo_spark.operators import pip
    from scidbgeo_spark.sources import pages as pages_src

    pg = pages_src.generate_pages(spark, 1500)
    d = str(tmp_path / "pages_stream")
    pg.filter(F.col("url").endswith("0")).write.parquet(d)
    stream = streaming.zone_page_stream(spark, d, fixtures.GEO_POLYGONS)
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("zps_test")
        .start()
    )
    try:
        q.processAllAvailable()
        pg.filter(~F.col("url").endswith("0")).write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {
            (r.day, r.zone_id): r.n_pages
            for r in spark.sql("SELECT * FROM zps_test").collect()
        }
    finally:
        q.stop()
    pts = pages_src.extract_geotags(pg, id_col="url").join(
        pg.select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts")), "url"
    )
    batch = (
        pip.pip_join(spark, pts, fixtures.GEO_POLYGONS)
        .groupBy(
            F.date_format(F.date_trunc("day", "warc_ts"), "yyyy-MM-dd").alias("day"),
            "zone_id",
        )
        .agg(F.count("*").alias("n_pages"))
    )
    want = {(r.day, r.zone_id): r.n_pages for r in batch.collect()}
    assert got == want
    assert len(want) > 10  # non-trivial coverage across days and zones


def test_zone_page_stream_watermark_drops_late_pages(spark, tmp_path):
    """Append-mode watermark semantics on the streaming PIP pipeline:
    once the event-time watermark passes a daily window's end, the
    window is finalized and emitted, and pages arriving later with
    timestamps inside that window are DROPPED — bounded state, the
    property that lets the per-zone density surface run forever on a
    Common-Crawl-style feed."""
    from scidbgeo_spark import fixtures, streaming
    from scidbgeo_spark.operators import pip
    from scidbgeo_spark.sources import pages as pages_src

    pg = pages_src.generate_pages(spark, 30)
    pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    DAY1, DAY3, DAY1_LATE = (
        "2025-06-01 10:00:00",
        "2025-06-03 12:00:00",
        "2025-06-01 11:00:00",
    )
    pg = pg.withColumn(
        "warc_ts",
        F.when(pid < 10, F.to_timestamp(F.lit(DAY1)))
        .when(pid < 20, F.to_timestamp(F.lit(DAY3)))
        .otherwise(F.to_timestamp(F.lit(DAY1_LATE))),
    )
    d = str(tmp_path / "pages_late")
    pg.filter(pid < 10).write.parquet(d)
    stream = streaming.zone_page_stream(spark, d, fixtures.GEO_POLYGONS)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("zps_late")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: day-1 pages, nothing final yet
        # batch 2: day-3 pages push the watermark (max_ts - 1h) past the
        # day-1 window's end -> day-1 finalizes and emits
        pg.filter((pid >= 10) & (pid < 20)).write.mode("append").parquet(d)
        q.processAllAvailable()
        # batch 3: LATE day-1 pages, below the watermark -> dropped
        pg.filter(pid >= 20).write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {
            (r.day, r.zone_id): r.n_pages
            for r in spark.sql("SELECT * FROM zps_late").collect()
        }
    finally:
        q.stop()
    # emitted = exactly the finalized day-1 window computed from batch 1
    # alone: no late-batch contribution, and the still-open day-3 window
    # is absent from append output
    b1 = pg.filter(pid < 10)
    pts = pages_src.extract_geotags(b1, id_col="url")
    want = {
        ("2025-06-01", r.zone_id): r.n_pages
        for r in pip.pip_join(spark, pts, fixtures.GEO_POLYGONS)
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_pages"))
        .collect()
    }
    assert got == want
    assert want  # at least one zone actually hit
    assert all(day == "2025-06-01" for day, _ in got)


def test_zone_page_stream_file_layer_uses_cached_gate(spark, tmp_path):
    """The streaming PIP path with a FILE-BACKED polygon layer (the
    production shape) routes through pip_join_df's broadcast gate and
    leaves the covering-cell estimate cached on the layer — so further
    stream/batch builds against the same prepared layer run zero gate
    jobs — and converges to the batch rollup."""
    from scidbgeo_spark import fixtures, streaming
    from scidbgeo_spark.operators import pip
    from scidbgeo_spark.sources import pages as pages_src

    lpath = str(tmp_path / "layer.parquet")
    pip.polygons_df(spark, fixtures.GEO_POLYGONS).write.parquet(lpath)
    layer = spark.read.parquet(lpath)
    pg = pages_src.generate_pages(spark, 800)
    d = str(tmp_path / "pages_layer")
    pg.write.parquet(d)
    stream = streaming.zone_page_stream(spark, d, layer)
    # the broadcast gate engaged during stream construction and cached
    # its one-time fan-out estimate on the layer object
    assert isinstance(getattr(layer, "_scidbgeo_ccell_estimate", None), int)
    got = {
        (r.day, r.zone_id): r.n_pages
        for r in streaming.run_to_memory(stream, "zps_layer").collect()
    }
    pts = pages_src.extract_geotags(pg, id_col="url").join(
        pg.select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts")), "url"
    )
    want = {
        (r.day, r.zone_id): r.n_pages
        for r in pip.pip_join_df(spark, pts, layer)
        .groupBy(
            F.date_format(F.date_trunc("day", "warc_ts"), "yyyy-MM-dd").alias("day"),
            "zone_id",
        )
        .agg(F.count("*").alias("n_pages"))
        .collect()
    }
    assert got == want
    assert len(want) > 5


def test_streaming_merge_to_catalog_exactly_once(spark, sf_correct, tmp_path):
    """Streaming COO file arrivals merge into the SnapshotCatalog; the
    final table equals the batch pack over everything, and a replayed
    micro-batch (simulated retry) leaves the table state unchanged."""
    from scidbgeo_spark import streaming
    from scidbgeo_spark.catalog import SnapshotCatalog

    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    d = str(tmp_path / "coo_stream")
    ck = str(tmp_path / "ck")
    coo.filter(F.col("y") < h // 2).write.parquet(d)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    q = streaming.merge_stream_to_catalog(spark, d, cat, "stream_r", h, w, 25, ck)
    try:
        q.processAllAvailable()
        v1 = cat.current_version("stream_r")
        coo.filter(F.col("y") >= h // 2).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(cat.read("stream_r"), "value").collect()
    )
    want = sorted((r.y, r.x, r.value) for r in coo.collect())
    assert got == want
    assert cat.current_version("stream_r") > v1
    # simulated replay of an already-applied batch: marker short-circuits
    import os

    markers = os.listdir(os.path.join(ck, "applied"))
    assert len(markers) >= 2
    v_before = cat.current_version("stream_r")
    # re-running the whole stream from the same checkpoint replays nothing new
    q2 = streaming.merge_stream_to_catalog(spark, d, cat, "stream_r", h, w, 25, ck)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cat.current_version("stream_r") == v_before
    got2 = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(cat.read("stream_r"), "value").collect()
    )
    assert got2 == want


def test_curate_stream_filters_decontaminates_and_dedups(spark, tmp_path):
    """Streaming curation: low-quality docs and benchmark-contaminated
    docs never enter; duplicates collapse to one survivor per content
    across micro-batches; survivors equal the batch-eligible set."""
    import hashlib

    from scidbgeo_spark import streaming

    good = " ".join(f"tok{i} word{i * 7 % 13}" for i in range(20))  # 40 toks
    good2 = " ".join(f"alpha{i} beta{i % 9} gamma{i % 5}" for i in range(15))
    bench = " ".join(f"bench{i} mark{i}" for i in range(16))
    rows = [
        (0, good),
        (1, good),                      # duplicate of 0
        (2, "too short"),               # fails min_tokens
        (3, f"{good2} {bench}"),        # contaminated
        (4, good2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "curate_stream")
    df.filter("doc_id <= 2").write.parquet(d)

    # benchmark hash set, computed batch-side like contamination_check
    from pyspark.sql import functions as F

    from scidbgeo_spark.operators.dedup import shingles_col
    from scidbgeo_spark.operators.text import md5_int

    ev = [
        r.h
        for r in spark.createDataFrame([(bench,)], "text string")
        .select(F.explode(F.transform(shingles_col("text", 5), md5_int)).alias("h"))
        .collect()
    ]
    stream = streaming.curate_stream(spark, d, eval_hashes=ev)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("cs_test")
        .start()
    )
    try:
        q.processAllAvailable()
        df.filter("doc_id >= 3").write.mode("append").parquet(d)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM cs_test").collect()
    finally:
        q.stop()
    by_hash = {r.content_hash: r.doc_id for r in got}
    # survivors: exactly one of {0,1} (same content) and doc 4
    assert set(by_hash) == {
        hashlib.md5(good.encode()).hexdigest(),
        hashlib.md5(good2.encode()).hexdigest(),
    }
    assert by_hash[hashlib.md5(good.encode()).hexdigest()] in (0, 1)
    assert by_hash[hashlib.md5(good2.encode()).hexdigest()] == 4


def test_trending_terms_stream_sliding_windows(spark, tmp_path):
    """Sliding windows: every token occurrence lands in BOTH overlapping
    2h windows; finalized append output equals the batch computation on
    the on-time docs, and late arrivals below the watermark are
    dropped."""
    from scidbgeo_spark import streaming

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha", "2025-06-01 10:10:00"),
            (1, "beta gamma", "2025-06-01 10:40:00"),
            # late arrival, same early hour (written in batch 3)
            (2, "alpha alpha", "2025-06-01 10:20:00"),
            # watermark pusher, far future (written in batch 2)
            (3, "omega", "2025-06-02 09:00:00"),
        ],
        "doc_id long, text string, crawl_ts string",
    ).withColumn("crawl_ts", F.to_timestamp("crawl_ts"))
    d = str(tmp_path / "trend_docs")
    docs.filter(F.col("doc_id") < 2).write.parquet(d)
    stream = streaming.trending_terms_stream(spark, d)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("trend")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: on-time docs, nothing final
        docs.filter(F.col("doc_id") == 3).write.mode("append").parquet(d)
        q.processAllAvailable()  # batch 2: watermark passes 10:xx windows
        docs.filter(F.col("doc_id") == 2).write.mode("append").parquet(d)
        q.processAllAvailable()  # batch 3: late doc -> dropped
        got = {
            (r.win_start, r.token): r.n
            for r in spark.sql("SELECT * FROM trend WHERE token <> 'omega'").collect()
        }
    finally:
        q.stop()
    want = {
        (r.win_start, r.token): r.n
        for r in (
            docs.filter(F.col("doc_id") < 2)
            .select(
                F.col("crawl_ts").alias("ts"),
                F.explode(F.split("text", " ")).alias("token"),
            )
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "token")
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").cast("string").alias("win_start"), "token", "n")
            .collect()
        )
    }
    assert got == want
    # sliding property: 'alpha' (ts 10:10) appears in the 09:00 and
    # 10:00 windows, with the late doc's copies absent from both
    alphas = {k: v for k, v in got.items() if k[1] == "alpha"}
    assert len(alphas) == 2
    assert all(v == 2 for v in alphas.values())


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """Stream-static anti-join + horizon dedup equals the batch
    incremental_dedup survivors on the same input, including across
    micro-batches (a later batch re-sending a frozen text or an
    already-seen novel text emits nothing)."""
    from scidbgeo_spark import streaming
    from scidbgeo_spark.operators import dedup

    frozen = spark.createDataFrame(
        [(i, f"frozen text number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(100, "frozen text number 3"), (101, "novel alpha"), (102, "novel beta")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        # re-sent frozen + duplicate of an already-streamed novel + new
        [(103, "frozen text number 7"), (104, "novel alpha"), (105, "novel gamma")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "feed")
    b1.write.parquet(d)
    stream = streaming.incremental_dedup_stream(spark, d, frozen)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("incdedup")
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {r.doc_id for r in spark.sql("SELECT * FROM incdedup").collect()}
    finally:
        q.stop()
    assert got == {101, 102, 105}
    # batch twin on the union agrees on the kept hash set
    batch_keep = {
        r["keep_id"]
        for r in dedup.incremental_dedup(frozen, b1.unionAll(b2)).collect()
    }
    assert batch_keep == got


def test_click_attribution_stream_matches_batch_interval_join(
    spark, tmp_path
):
    """Stream-stream interval join == the batch interval join on the
    same events, across two micro-batch deliveries; state stays bounded
    by the watermark horizon (append mode accepts the plan at all)."""
    import datetime as dt

    from scidbgeo_spark import streaming

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, kind, offset_min):
        return (
            eid,
            t0 + dt.timedelta(minutes=offset_min),
            uid,
            kind,
            0.0,
            "{}",
        )

    rows = [
        ev(1, 7, "view", 0),
        ev(2, 7, "click", 10),   # attributed to view 1 (gap 600s)
        ev(3, 7, "click", 45),   # outside 30-min horizon of view 1
        ev(4, 8, "view", 5),
        ev(5, 8, "view", 20),
        ev(6, 8, "click", 25),   # matches BOTH views of user 8
        ev(7, 9, "click", 30),   # user with no view at all
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "events_stream")
    df.filter("event_id <= 4").write.parquet(d)

    stream = streaming.click_attribution_stream(spark, d)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_test")
        .start()
    )
    try:
        q.processAllAvailable()
        df.filter("event_id > 4").write.mode("append").parquet(d)
        q.processAllAvailable()
        got = {
            (r.user_id, r.click_id, r.view_id, r.gap_s)
            for r in spark.sql("SELECT * FROM attr_test").collect()
        }
    finally:
        q.stop()
    assert got == {(7, 2, 1, 600), (8, 6, 4, 1200), (8, 6, 5, 300)}
