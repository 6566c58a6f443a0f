"""SnapshotCatalog: transactional MERGE, versions, time travel, expiry.

The semantics under test are the reference's array lifecycle —
``insert(redimension(...), A)`` chunk upserts + ``versions(A)`` /
``remove_versions`` (SciDBParallel.py:346-348, scidb.py:126-156) —
implemented as snapshot-isolated copy-on-write parquet.
"""

import json
import os
import shutil

from pyspark.sql import functions as F

from scidbgeo_spark import model, tiling
from scidbgeo_spark.catalog import SnapshotCatalog
from scidbgeo_spark.model import CHUNK


def _base_and_updates(spark, sf_correct):
    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    upd_coo = coo.filter(F.col("y") < CHUNK).withColumn(
        "value", F.lit(777).cast("long")
    )
    updates = tiling.pack_tiles(upd_coo, CHUNK, h, w)
    return tiles, updates


def _content(cat, name, version=None):
    return sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(cat.read(name, version), "value").collect()
    )


def test_merge_matches_plain_merge_into_tiles(spark, sf_correct, tmp_path):
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    v = cat.merge("a", updates)
    assert v == 2
    want = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(
            tiling.merge_into_tiles(tiles, updates), "value"
        ).collect()
    )
    assert _content(cat, "a") == want


def test_merge_orphan_reclaim_preserves_retry_budget(spark, sf_correct, tmp_path):
    """A crashed writer's orphan data dir (published, never committed)
    must be repaired WITHOUT consuming retry budget: with max_retries=1
    the merge still succeeds after reclaiming the orphan, where counting
    the reclaim as a lost race would raise before ever writing."""
    import time

    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    orphan = os.path.join(str(tmp_path), "a", "data", "v000002")
    os.makedirs(orphan)
    past = time.time() - 60
    os.utime(orphan, (past, past))  # well past the grace period
    v = cat.merge("a", updates, max_retries=1, wait_s=5, orphan_grace_s=30)
    assert v == 2
    want = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(
            tiling.merge_into_tiles(tiles, updates), "value"
        ).collect()
    )
    assert _content(cat, "a") == want


def test_rerun_merge_is_idempotent(spark, sf_correct, tmp_path):
    """Re-applying the identical merge (a retry after a lost ack) creates
    a new snapshot with IDENTICAL content — upsert semantics."""
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    cat.merge("a", updates)
    before = _content(cat, "a")
    v = cat.merge("a", updates)
    assert v == 3
    assert _content(cat, "a") == before
    assert [m["version"] for m in cat.versions("a")] == [1, 2, 3]


def test_time_travel_reads_parent_snapshot(spark, sf_correct, tmp_path):
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    original = _content(cat, "a", 1)
    cat.merge("a", updates)
    assert _content(cat, "a", 1) == original  # v1 unchanged
    assert _content(cat, "a", 2) != original


def test_copy_on_write_rewrites_only_touched_partitions(spark, sf_correct, tmp_path):
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    n_parts_v1 = len(cat._read_manifest("a", 1)["partitions"])
    cat.merge("a", updates)
    m2 = cat._read_manifest("a", 2)
    rewritten = [p for p in m2["partitions"].values() if "v000002" in p]
    inherited = [p for p in m2["partitions"].values() if "v000001" in p]
    assert len(rewritten) == 1  # updates touch only tile_y=0
    assert len(inherited) == n_parts_v1 - 1


def test_commit_race_retries_onto_winner(spark, sf_correct, tmp_path):
    """Simulate a concurrent writer that committed version 2 first: merge
    must retry and land at version 3 on top of the winner's snapshot."""
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    # fake winner: snapshot 2 identical to 1 (a no-op concurrent commit)
    m1 = cat._read_manifest("a", 1)
    winner = dict(m1, version=2, parent=1, operation="merge")
    with open(cat._manifest_path("a", 2), "w") as fh:
        json.dump(winner, fh)
    v = cat.merge("a", updates)
    assert v == 3
    assert cat._read_manifest("a", 3)["parent"] == 2
    want = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(
            tiling.merge_into_tiles(tiles, updates), "value"
        ).collect()
    )
    assert _content(cat, "a") == want


def test_expire_snapshots_gc(spark, sf_correct, tmp_path):
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    cat.merge("a", updates)
    current = _content(cat, "a")
    expired = cat.expire_snapshots("a", keep_last=1)
    assert expired == [1]
    assert [m["version"] for m in cat.versions("a")] == [2]
    assert _content(cat, "a") == current  # current snapshot intact
    # v1-only data (the rewritten partition's old copy) must still exist
    # iff referenced: v2 inherits most v1 partitions, so v000001 survives
    data = os.listdir(os.path.join(str(tmp_path), "a", "data"))
    assert "v000001" in data and "v000002" in data
    # but after expiring everything except a fresh full rewrite, GC drops it
    full = cat.merge("a", cat.read("a"))  # rewrites every partition
    cat.expire_snapshots("a", keep_last=1)
    data = os.listdir(os.path.join(str(tmp_path), "a", "data"))
    assert data == [f"v{full:06d}"]
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_merge_race_across_processes(spark, tmp_path):
    """REAL cross-process optimistic-commit race: two separate Spark
    JVMs merge disjoint x-bands of the SAME copy-on-write partition
    concurrently.  The hard-link create-if-absent commit must serialize
    them — final version 3, both updates present, no lost write."""
    import subprocess
    import sys
    import textwrap

    sf = "/root/testdata/sf0.001"
    coo = model.raster_coo(spark, sf)
    h, w = model.raster_dims(spark, sf)
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    wh = str(tmp_path / "wh")
    SnapshotCatalog(spark, wh).create("a", tiles)

    worker = textwrap.dedent(
        """
        import sys
        from pyspark.sql import functions as F
        from scidbgeo_spark.session import get_spark
        from scidbgeo_spark import model, tiling
        from scidbgeo_spark.catalog import SnapshotCatalog
        from scidbgeo_spark.model import CHUNK
        wh, band = sys.argv[1], int(sys.argv[2])
        spark = get_spark(f"race{band}", cores=2, shuffle_partitions=4)
        sf = "/root/testdata/sf0.001"
        coo = model.raster_coo(spark, sf)
        h, w = model.raster_dims(spark, sf)
        upd = coo.filter(
            (F.col("x") >= band * CHUNK) & (F.col("x") < (band + 1) * CHUNK)
        ).withColumn("value", F.lit(1000 + band).cast("long"))
        SnapshotCatalog(spark, wh).merge("a", tiling.pack_tiles(upd, CHUNK, h, w))
        spark.stop()
        """
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, wh, str(b)],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
            text=True,
        )
        for b in (0, 1)
    ]
    for b, p in zip((0, 1), procs):
        # communicate() drains stderr (Spark logs heavily — a raw wait()
        # on a PIPE would deadlock when the pipe buffer fills)
        _out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker {b} rc={p.returncode}: {err[-2000:]}"

    cat = SnapshotCatalog(spark, wh)
    assert cat.current_version("a") == 3
    assert cat._read_manifest("a", 3)["parent"] == 2
    got = _content(cat, "a")
    want = sorted(
        (y, x, 1000 + x // CHUNK) for y in range(h) for x in range(w)
    )
    assert got == want  # neither concurrent update was lost


def test_diff_extracts_exactly_changed_cells(spark, sf_correct, tmp_path):
    """Snapshot diff reads only changed partitions and emits exactly the
    cells whose value differs between versions (changelog-scan shape)."""
    from pyspark.sql import functions as F

    from scidbgeo_spark import model, tiling

    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    tiles = tiling.pack_tiles(coo, 25, h, w)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.create("d", tiles)
    # update: negate values in one 25x25 chunk
    upd_coo = coo.filter((F.col("y") < 25) & (F.col("x") < 25)).select(
        "y", "x", (-F.col("value") - 1).alias("value")
    )
    cat.merge("d", tiling.pack_tiles(upd_coo, 25, 25, 25, int_values=True))
    d = cat.diff("d", 1, 2).collect()
    changed = {(r.y, r.x): (r.old_value, r.new_value) for r in d}
    # every diff row is inside the updated chunk and shows the negation
    assert changed
    for (y, x), (ov, nv) in changed.items():
        assert y < 25 and x < 25
        assert nv == -ov - 1
    # cells whose value was already equal (none here: -v-1 != v always
    # since values >= 0) -> diff cardinality == chunk size
    assert len(changed) == 25 * 25
    # identical versions diff to empty
    assert cat.diff("d", 2, 2).count() == 0


def test_diff_appearing_partition_reports_null_old(spark, sf_correct, tmp_path):
    """A merge that ADDS a new chunk (new tile_y partition) diffs as
    appearing cells: old_value NULL, new_value set, nothing else read."""
    from pyspark.sql import functions as F

    from scidbgeo_spark import model, tiling

    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh2"))
    cat.create("a", tiling.pack_tiles(coo, 25, h, w))
    # new rows BELOW the existing raster: tile_y outside any v1 partition
    extra = coo.filter(F.col("y") < 25).select(
        (F.col("y") + h).alias("y"), "x", "value"
    )
    cat.merge("a", tiling.pack_tiles(extra, 25, h + 25, w))
    d = cat.diff("a", 1, 2).collect()
    assert len(d) == 25 * w
    for r in d:
        assert r.old_value is None and r.new_value is not None and r.y >= h


def test_compact_rewrites_small_files_content_identical(spark, sf_correct, tmp_path):
    """Compaction coalesces each partition to one file, preserves content
    exactly (diff of the two snapshots is EMPTY), and commits a
    'compact' snapshot with the old one still time-travelable."""
    import glob
    import os

    from scidbgeo_spark import model, tiling

    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    # scatter rows so every pt_y dir gets several small files
    tiles = tiling.pack_tiles(coo, 25, h, w).repartition(8)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.create("c", tiles)

    def files_per_part(version):
        m = cat._read_manifest("c", version)
        return {
            k: len(glob.glob(os.path.join(cat._dir("c"), p, "*.parquet")))
            for k, p in m["partitions"].items()
        }

    before = files_per_part(1)
    assert any(n > 1 for n in before.values())  # genuinely fragmented
    v2 = cat.compact("c")
    after = files_per_part(v2)
    assert set(after) == set(before) and all(n == 1 for n in after.values())
    assert cat.diff("c", 1, v2).count() == 0  # content-identical
    a = sorted(tuple(r) for r in tiling.tiles_to_coo(cat.read("c", 1), "value").collect())
    b = sorted(tuple(r) for r in tiling.tiles_to_coo(cat.read("c", v2), "value").collect())
    assert a == b
    assert cat.versions("c")[-1]["operation"] == "compact"


def test_rollback_restores_content_and_keeps_history(spark, sf_correct, tmp_path):
    """rollback(v1) commits a NEW metadata-only snapshot with v1's
    content: current read == v1, the undone v2 stays time-travelable,
    no data dir is rewritten, and expiry after rollback keeps the data
    files the rollback snapshot shares with v1."""
    tiles, updates = _base_and_updates(spark, sf_correct)
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.create("a", tiles)
    original = _content(cat, "a", 1)
    cat.merge("a", updates)
    changed = _content(cat, "a", 2)
    assert changed != original

    v3 = cat.rollback("a", 1)
    assert v3 == 3
    assert cat.current_version("a") == 3
    assert _content(cat, "a") == original  # current == v1
    assert _content(cat, "a", 2) == changed  # history preserved
    m3 = cat._read_manifest("a", 3)
    assert m3["operation"] == "rollback:1"
    assert m3["partitions"] == cat._read_manifest("a", 1)["partitions"]
    # metadata-only: no v000003 data dir exists
    data_root = os.path.join(cat._dir("a"), "data")
    assert not any("v000003" in d for d in os.listdir(data_root))
    # expiry keeps shared dirs: only v3 kept, content must survive
    cat.expire_snapshots("a", keep_last=1)
    assert _content(cat, "a") == original
    # no-op rollback to current returns current
    assert cat.rollback("a", 3) == 3
