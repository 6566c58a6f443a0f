"""Temporal joins Spark lacks natively: AS-OF join via the union +
last-non-null window trick.

No reference analog (the reference is strictly batch-spatial); this is
the event-stream companion the north-star's web-page feed needs — "join
each event to the most recent state row at or before its timestamp"
(dimension snapshots, model-version rollouts, user-state changelogs).

Scale shape: ONE shuffle (the window partition on the join key).  Right
rows interleave with left rows in event-time order inside each key
partition and a running ``last(..., ignorenulls=True)`` carries the
state forward — no range expansion, no per-row lookup, skew bounded by
the hottest key's row count like any keyed window.  DuckDB's native
ASOF JOIN is the oracle twin, so the semantics are pinned exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (LEFT semantics:
    unmatched left rows keep nulls).

    ``right`` must be unique per (on, right_ts) — pre-aggregate a
    changelog first (the deterministic-tie contract DuckDB's ASOF JOIN
    shares).  All right columns except the key and timestamp come back
    state-carried."""
    state_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(state_cols) & set(left.columns)
    if clash:
        # silently nulling a shared-name left column and replacing it
        # with the carried right value would corrupt data with no error
        raise ValueError(
            f"asof_join: right state columns {sorted(clash)} collide with "
            "left columns — rename one side before joining"
        )
    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in state_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn("__t", F.col(right_ts)).withColumn(
        "__is_left", F.lit(0)
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [on, "__t", "__is_left", *state_cols] + [
        c for c in left.columns if c != on
    ]
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))
    # right rows sort BEFORE left rows at equal timestamps so
    # right_ts == left_ts matches (the ASOF >= contract)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for c in state_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("__is_left") == 1).drop("__t", "__is_left")


# ---- funnel analysis ----------------------------------------------------
FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def funnel(events: DataFrame, stages: list[str] = FUNNEL_STAGES) -> DataFrame:
    """(stage_idx, stage, n_users): users reaching each funnel stage IN
    ORDER — stage i counts users with an event of type stages[i]
    strictly after their stage-(i-1) qualifying time (earliest
    qualifying event wins, so the funnel is the standard first-touch
    definition).

    Scale shape: every stage is a user-keyed aggregate joined to the
    previous stage's (user, t) frame — all shuffles share the user_id
    key, so the chain stays co-partitioned (AQE reuses the exchange);
    no window over the full event stream, no per-user arrays, hot users
    cost only their own events."""
    cur = (
        events.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    frames = [(stages[0], cur)]
    for st in stages[1:]:
        cur = (
            events.filter(F.col("event_type") == st)
            .join(cur.select("user_id", F.col("t").alias("prev_t")), "user_id")
            .filter(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        frames.append((st, cur))
    result = None
    for i, (st, df) in enumerate(frames):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(st).alias("stage"),
            "n_users",
        )
        result = row if result is None else result.unionAll(row)
    return result


def trajectory_stats(events: DataFrame) -> DataFrame:
    """Per-user movement statistics over a geotagged event stream:
    order each user's events by (ts, event_id), difference consecutive
    positions, and aggregate — the trajectory rollup every
    mobility/crawl-geography pipeline runs (no reference analog; the
    reference is single-raster batch).

    Positions live on the integer milli-degree lattice (py, px) =
    (event_id*7919 % 180000, event_id*9973 % 360000) — the events table
    carries no geo columns, so the fixture derives them exactly like
    model.points does for documents; with real columns only the two
    SELECT lines change.  Every output is EXACT integer algebra:
    path_len2 = sum of squared planar step lengths, net_disp2 = squared
    first-to-last displacement, bbox_h/bbox_w = bounding-box extents.

    Scale shape: ONE shuffle — the lag window and the groupBy share the
    user_id hash partitioning, so AQE reuses the exchange; skew is
    bounded by the hottest user's event count (a keyed window, same
    contract as asof_join)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = events.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 180000).alias("py"),
        ((F.col("event_id") * 9973) % 360000).alias("px"),
    )
    stepped = pts.select(
        "user_id",
        "py",
        "px",
        (F.col("py") - F.lag("py").over(w)).alias("dy"),
        (F.col("px") - F.lag("px").over(w)).alias("dx"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pts"),
            F.sum(
                F.col("dy") * F.col("dy") + F.col("dx") * F.col("dx")
            ).alias("path_len2"),
            (F.max("py") - F.min("py")).alias("bbox_h"),
            (F.max("px") - F.min("px")).alias("bbox_w"),
            F.max(F.struct(F.col("rn"), F.col("py"))).getField("py").alias("_last_py"),
            F.max(F.struct(F.col("rn"), F.col("px"))).getField("px").alias("_last_px"),
            F.min(F.struct(F.col("rn"), F.col("py"))).getField("py").alias("_first_py"),
            F.min(F.struct(F.col("rn"), F.col("px"))).getField("px").alias("_first_px"),
        )
        .select(
            "user_id",
            "n_pts",
            F.coalesce("path_len2", F.lit(0)).alias("path_len2"),
            (
                (F.col("_last_py") - F.col("_first_py"))
                * (F.col("_last_py") - F.col("_first_py"))
                + (F.col("_last_px") - F.col("_first_px"))
                * (F.col("_last_px") - F.col("_first_px"))
            ).alias("net_disp2"),
            "bbox_h",
            "bbox_w",
        )
    )


def mk_trend(coo3: DataFrame) -> DataFrame:
    """Mann-Kendall trend statistic per (y, x) cell across the band /
    time axis of a 3-D raster: S = sum over ordered band pairs
    (b1 < b2) of sign(v_b2 - v_b1) — the standard nonparametric
    monotone-trend screen behind "emerging hot spot" analysis (S near
    +n_pairs = strictly rising series, near -n_pairs = falling).
    Exact integers end to end.

    Scale shape: ONE map-side-combinable groupBy collects each cell's
    (band, value) series — a CONSTANT-length array (the band count) —
    sorts it JVM-side, and folds the pairwise signs with array algebra
    inside codegen: no raster self-join (the naive pair join ships
    n_bands copies of every cell), no Python in the loop.  Oracle: the
    literal pair join, band-restricted, in DuckDB."""
    g = coo3.groupBy("y", "x").agg(
        F.sort_array(F.collect_list(F.struct("band", "value"))).alias("tv")
    )
    s = F.expr(
        "aggregate(flatten(transform(tv, (a, i) -> "
        "transform(slice(tv, i + 2, size(tv)), b -> "
        "CAST(CASE WHEN b.value > a.value THEN 1 "
        "WHEN b.value < a.value THEN -1 ELSE 0 END AS BIGINT)))), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return g.select(
        "y",
        "x",
        F.size("tv").cast("long").alias("n_bands"),
        F.expr("CAST(size(tv) * (size(tv) - 1) DIV 2 AS BIGINT)").alias(
            "n_pairs"
        ),
        s.alias("s_stat"),
    )


def trajectory_rose(events: DataFrame) -> DataFrame:
    """Per-user DIRECTION ROSE: each consecutive step of the user's
    trajectory classified into one of 8 compass octants by integer sign
    tests (N, NE, E, SE, S, SW, W, NW; diagonals only on exact
    |dy| == |dx|, zero-length steps dropped) — the movement-pattern
    histogram (octant, n_steps) per user, exact integers end to end.
    Octant code: 0=N (dy<0, |dy|>|dx|), 1=NE, 2=E, 3=SE, 4=S, 5=SW,
    6=W, 7=NW — screen coordinates, north = decreasing y.

    Scale shape: the trajectory_stats single keyed-window shuffle, then
    a map-side-combinable (user, octant) count — no extra exchange
    beyond the agg."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = events.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 180000).alias("py"),
        ((F.col("event_id") * 9973) % 360000).alias("px"),
    )
    stepped = pts.select(
        "user_id",
        (F.col("py") - F.lag("py").over(w)).alias("dy"),
        (F.col("px") - F.lag("px").over(w)).alias("dx"),
    ).filter(
        F.col("dy").isNotNull() & ((F.col("dy") != 0) | (F.col("dx") != 0))
    )
    ady, adx = F.abs(F.col("dy")), F.abs(F.col("dx"))
    octant = (
        F.when((F.col("dy") < 0) & (ady > adx), 0)
        .when((F.col("dy") < 0) & (F.col("dx") > 0) & (ady == adx), 1)
        .when((F.col("dx") > 0) & (adx > ady), 2)
        .when((F.col("dy") > 0) & (F.col("dx") > 0) & (ady == adx), 3)
        .when((F.col("dy") > 0) & (ady > adx), 4)
        .when((F.col("dy") > 0) & (F.col("dx") < 0) & (ady == adx), 5)
        .when((F.col("dx") < 0) & (adx > ady), 6)
        .otherwise(7)
        .cast("long")
    )
    return (
        stepped.select("user_id", octant.alias("octant"))
        .groupBy("user_id", "octant")
        .agg(F.count("*").alias("n_steps"))
    )


def band_argmax(coo3: DataFrame) -> DataFrame:
    """Per-cell ARGMAX COMPOSITE across the band/time axis — the
    max-value composite (max-NDVI greenest-pixel mosaic analog): for
    every (y, x) the band holding the maximum value, ties broken to the
    SMALLEST band so the result is deterministic on any cluster.

    Scale shape: one map-side-combinable groupBy over (y, x) — the
    struct-max trick ``max(struct(value, -band))`` keeps argmax inside
    the JVM hash aggregate (partial combine on every map task), no
    window, no self-join."""
    best = F.max(F.struct(F.col("value"), (-F.col("band")).alias("nb")))
    return (
        coo3.groupBy("y", "x")
        .agg(best.alias("b"))
        .select(
            "y",
            "x",
            (-F.col("b.nb")).alias("best_band"),
            F.col("b.value").alias("best_value"),
        )
    )


# Deterministic "missing observation" rule for gap_fill: a cell whose
# value is divisible by GAP_K is treated as cloud-masked.  Derived from
# the value itself so the DuckDB oracle rebuilds the identical mask.
GAP_K = 10


def gap_fill(coo3: DataFrame) -> DataFrame:
    """Temporal GAP-FILL (last-observation-carried-forward along the
    band/time axis) — the cloud-mask compositing step remote-sensing
    time series run before any per-pixel analysis: observations where
    ``value % GAP_K == 0`` are masked missing, and each masked slot
    takes the most recent unmasked value at the same (y, x); leading
    gaps (no prior observation) read the -1 sentinel — NOT NULL, so
    downstream kernels keep fixed-width integer columns (the
    traffic_spikes sentinel convention).  Output one row per
    (band, y, x) with the filled value and an ``is_gap`` flag.

    Scale shape: ONE keyed-window shuffle partitioned on the cell —
    the same running ``last(..., ignorenulls=True)`` trick as the AS-OF
    join; the frame is growing-only so Spark keeps O(1) state per cell,
    and partition count = H*W cells bounds skew by BANDS rows per key.
    """
    w = (
        Window.partitionBy("y", "x")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.when(F.col("value") % GAP_K != 0, F.col("value"))
    return coo3.select(
        "band",
        "y",
        "x",
        F.coalesce(F.last(obs, ignorenulls=True).over(w), F.lit(-1)).alias(
            "filled"
        ),
        (F.col("value") % GAP_K == 0).alias("is_gap"),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order MARKOV TRANSITION profile of user behavior: for every
    ordered pair of consecutive events within a user's stream (ordered
    by ts, event_id), count the (prev_type -> event_type) transition and
    report its conditional probability p = n / sum(n over prev_type) —
    the navigation model behind next-action prediction and bot
    screening (a scraper's transition matrix is near-degenerate).

    Scale shape: the trajectory keyed-window shuffle (lag over user
    streams), a map-side-combinable pair count, then the conditional
    normalization as a window over the TYPE-PAIR table — whose size is
    |event_type|^2, constant in the corpus.  The double division runs
    on exact integers, identical on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            "event_type",
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_trans"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n_trans",
        (F.col("n_trans") / F.sum("n_trans").over(tot)).alias("p_trans"),
    )


def user_burst(events: DataFrame) -> DataFrame:
    """Per-user BURSTINESS profile — the rate-limit / bot screen: bucket
    each user's events into minutes and report the peak events-in-one-
    minute, the active-minute count, the total, and the mean
    events-per-active-minute (one double division of exact integers).

    Scale shape: two map-side-combinable aggregates — (user, minute)
    then user; the first combines on every map task so the exchange
    carries minute buckets, not raw events."""
    per_min = events.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count("*").alias("n"))
    return per_min.groupBy("user_id").agg(
        F.max("n").alias("peak_min_events"),
        F.count("*").alias("n_active_minutes"),
        F.sum("n").alias("n_events"),
        (F.sum("n") / F.count("*")).alias("events_per_minute"),
    )


def session_stats(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Corpus-wide SESSION-LENGTH distribution: sessionize (1-hour
    inactivity gap, the q_sessionize contract), then per-session
    duration (exact microseconds) and event count, rolled up to the
    one-row profile dashboards track — session count, exact
    median/p90 duration, total events and events-per-session.

    Scale shape: ONE user-keyed window shuffle (lag + running
    session-number sum share the partition), a map-side-combinable
    (user, session) agg on the SAME key prefix (AQE reuses the
    exchange), then a single-row rollup.  The percentile aggregate is
    Spark's exact implementation — interpolation matches DuckDB
    quantile_cont bitwise on integer microseconds (the zonal_median
    precedent)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = events.withColumn("prev_ts", F.lag("ts").over(w))
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    marked = prev.withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull() | (gap_us > gap_s * 1000000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sess_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "sess_no").agg(
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("dur_us"),
        F.count("*").alias("n_ev"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.expr("percentile(dur_us, 0.5)").alias("median_dur_us"),
        F.expr("percentile(dur_us, 0.9)").alias("p90_dur_us"),
        F.sum("n_ev").alias("n_events"),
        (F.sum("n_ev") / F.count("*")).alias("events_per_session"),
    )


COOCCUR_WINDOW_US = 300 * 1000000  # 5 minutes


def event_cooccurrence(
    events: DataFrame, window_us: int = COOCCUR_WINDOW_US
) -> DataFrame:
    """Ordered EVENT-TYPE CO-OCCURRENCE within a time window: for every
    pair of a user's events with ``0 < t2 - t1 <= window``, count the
    (earlier_type, later_type) pair — the market-basket / session-
    affinity matrix behaviour models start from ("error follows click
    within 5 minutes" etc.).  Exact microsecond arithmetic; ties at the
    exact same timestamp are excluded (no deterministic order exists
    for them).

    Scale shape: the distance_join pattern in TIME — events bucket into
    window-sized epochs, ONE side replicates x2 (own + next bucket, a
    constant fan so the join stays an EQUI-join on (user, bucket)),
    the exact dt filter trims bucket over-coverage, and the pair count
    is map-side-combinable with a |types|^2 key space.  Never a
    range/theta join; skew bounded by the hottest user-bucket."""
    # ts is TIMESTAMP_NTZ: diff from the literal epoch (timezone-free,
    # matching DuckDB's epoch_us on naive timestamps); unix_micros would
    # require a TZ cast that drags the session timezone into the result
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = events.select(
        "user_id",
        "event_type",
        t_us.alias("t"),
        F.floor(t_us / window_us).alias("b"),
    )
    left = base.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("t").alias("ta"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("b"),
    )
    right = base.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("t").alias("tb"),
        "b",
    )
    dt = F.col("tb") - F.col("ta")
    return (
        left.join(right, ["user_id", "b"])
        .filter((dt > 0) & (dt <= window_us))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
    )


PATH_CELL = 18000  # milli-degree lattice -> 10 x 20 coarse traversal grid
COVER_CELL = 3600  # finer 50 x 100 grid for the coverage audit


def _traj_cells(events: DataFrame, cell: int):
    """Trajectory positions snapped to a coarse cell grid — the same
    integer milli-degree lattice trajectory_stats derives (the events
    table carries no geo columns; with real columns only these two
    expressions change)."""
    return events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(f"((event_id * 7919) % 180000) DIV {cell}").alias("cy"),
        F.expr(f"((event_id * 9973) % 360000) DIV {cell}").alias("cx"),
    )


def path_rasterize(events: DataFrame, cell: int = PATH_CELL) -> DataFrame:
    """LINE RASTERIZATION of user trajectories: every consecutive step
    of a user's event stream is walked cell-by-cell with an integer DDA
    (the Bresenham analog on the cell grid) and the per-cell traversal
    incidences are counted — the vector->raster conversion for LINE
    features (the reference's rasterize covers polygons via zonal
    layers, SciDB_ZonalStats_CL.py builds them offline; lines are the
    missing half) and the road-usage / crawl-path heatmap every
    mobility pipeline runs.

    Cell at parameter t in [0, s] (s = Chebyshev cell distance) along
    axis d: offset = sign(d) * floor((2*t*|d| + s) / (2*s)) — an exact
    integer rounding-interpolation both engines evaluate identically
    (the denominator uses greatest(s, 1): at s = 0 the sign factor is 0,
    so the guard never changes a value, only avoids the 0-division).
    Segment ENDPOINTS are counted once per incident step (documented
    incidence semantics, junction cells score each arriving/leaving
    step).

    Scale shape: ONE keyed shuffle (the lag window), then a per-row
    explode bounded by the grid diameter (cells crossed <= max(ny, nx)
    ~ constant), then a map-side-combinable (cy, cx) count whose key
    space is the fixed cell grid — no joins, no driver action."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = _traj_cells(events, cell)
    seg = (
        pts.select(
            F.lag("cy").over(w).alias("cy0"),
            F.lag("cx").over(w).alias("cx0"),
            "cy",
            "cx",
        )
        .filter(F.col("cy0").isNotNull())
        .select(
            "cy0",
            "cx0",
            (F.col("cy") - F.col("cy0")).alias("dy"),
            (F.col("cx") - F.col("cx0")).alias("dx"),
            F.greatest(
                F.abs(F.col("cy") - F.col("cy0")), F.abs(F.col("cx") - F.col("cx0"))
            ).alias("s"),
        )
    )

    def sgn(d):
        return F.when(d < 0, F.lit(-1)).when(d > 0, F.lit(1)).otherwise(F.lit(0))

    def off(d, t):
        den = 2 * F.greatest(F.col("s"), F.lit(1))
        return sgn(d) * F.floor((2 * t * F.abs(d) + F.col("s")) / den)

    cells = seg.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("s")),
                lambda t: F.struct(
                    (F.col("cy0") + off(F.col("dy"), t)).alias("cy"),
                    (F.col("cx0") + off(F.col("dx"), t)).alias("cx"),
                ),
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.cy").cast("long").alias("cy"), F.col("c.cx").cast("long").alias("cx")
    ).agg(F.count("*").alias("n_visits"))


def coverage_gaps(
    spark, events: DataFrame, cell: int = COVER_CELL
) -> DataFrame:
    """Cells of the fixed traversal grid NO event ever visited — the
    coverage audit run before trusting a density map (unvisited %
    drives sampling decisions; the crawl-frontier "which geography has
    no pages yet" question).  Output (cy, cx) empty cells.

    Scale shape: the event side reduces to distinct cells first (a
    map-side-combinable distinct bounded by the FIXED grid size, never
    by the event count), then one anti-join between two grid-bounded
    sides — the generated grid dimension is constant (ny*nx rows)
    regardless of data scale."""
    ny, nx = 180000 // cell, 360000 // cell
    grid = (
        spark.range(ny)
        .select(F.col("id").alias("cy"))
        .crossJoin(spark.range(nx).select(F.col("id").alias("cx")))
    )
    visited = _traj_cells(events, cell).select("cy", "cx").distinct()
    return grid.join(visited, ["cy", "cx"], "left_anti")


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """ORDERED-SEQUENCE FUNNEL: per user, the earliest strictly
    increasing chain of timestamps hitting each step type in order
    (first ``steps[0]``, then the first ``steps[1]`` strictly after it,
    ...) — the conversion-funnel operator of every event-analytics
    engine (no reference analog; the greedy earliest chain is the
    standard funnel semantic and is optimal: any valid chain's k-th
    step is >= the greedy one's).  Output one row per COMPLETING user:
    (user_id, t_<step>... micros).

    Scale shape: ONE shuffle — a groupBy(user) collect of the user's
    (ts, step-rank) pairs, sort_array, then a sequential F.aggregate
    fold (codegen, bounded by the user's event count like any keyed
    window); no per-stage re-join, no driver action."""
    ranks = {s: i for i, s in enumerate(steps)}
    rank_col = F.element_at(
        F.create_map(
            *[x for s, i in ranks.items() for x in (F.lit(s), F.lit(i))]
        ),
        F.col("event_type"),
    )
    # ts is TIMESTAMP_NTZ: diff from the literal epoch (timezone-free,
    # matching DuckDB's epoch_us on naive timestamps); unix_micros would
    # require a TZ cast that drags the session timezone into the result
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    pairs = events.select(
        "user_id",
        t_us.alias("t"),
        rank_col.alias("rk"),
    ).filter(F.col("rk").isNotNull())
    packed = pairs.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "rk"))).alias("evs")
    )
    k = len(steps)
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def fold(acc, e):
        # advance stage i when: stage i unset, all stages < i set, the
        # event is of type i, and (i == 0 or t strictly after stage i-1)
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.when(
                F.element_at(acc, (i + 1).cast("int")).isNotNull(),
                F.element_at(acc, (i + 1).cast("int")),
            ).otherwise(
                F.when(
                    (e["rk"] == i)
                    & (
                        (i == 0)
                        | (
                            F.element_at(acc, i.cast("int")).isNotNull()
                            & (e["t"] > F.element_at(acc, i.cast("int")))
                        )
                    ),
                    e["t"],
                )
            ),
        )

    done = packed.select(
        "user_id", F.aggregate("evs", init, fold).alias("ts_chain")
    )
    out = done.select(
        "user_id",
        *[
            F.element_at("ts_chain", i + 1).alias(f"t_{s}")
            for i, s in enumerate(steps)
        ],
    )
    return out.filter(F.col(f"t_{steps[-1]}").isNotNull())


IV_BUCKET_US = 3_600_000_000  # 1-hour join buckets
IV_MAX_LEN_US = 14_400_000_000  # intervals capped at 4 hours


def interval_join(events: DataFrame, intervals: DataFrame) -> DataFrame:
    """EVENT-TO-INTERVAL overlap join (ts in [t0, t1)) — the
    maintenance-window / campaign-attribution join Spark has no native
    operator for (a naive version is a range/theta join that
    nested-loops at scale).  ``intervals``: (iv_id, t0_us, t1_us)
    micros, lengths capped at IV_MAX_LEN_US (asserted in the plan via
    a filter the caller must respect — oversize intervals would break
    the fan bound).

    Scale shape: the distance_join pattern in time — each interval
    replicates to the hour buckets it overlaps (fan bounded by
    cap/bucket + 1 = 5), events compute ONE bucket, the pair space
    collapses to an equi-join on the bucket + the exact containment
    filter.  The interval side is usually small (broadcast); neither
    side ever cross-joins."""
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    iv = intervals.select(
        "iv_id",
        "t0_us",
        "t1_us",
        F.explode(
            F.sequence(
                F.expr(f"t0_us DIV {IV_BUCKET_US}"),
                F.expr(f"(t1_us - 1) DIV {IV_BUCKET_US}"),
            )
        ).alias("bkt"),
    )
    ev = events.select(
        "event_id", "user_id", t_us.alias("t_us")
    ).withColumn("bkt", F.expr(f"t_us DIV {IV_BUCKET_US}"))
    return (
        ev.join(F.broadcast(iv), "bkt")
        .filter((F.col("t_us") >= F.col("t0_us")) & (F.col("t_us") < F.col("t1_us")))
        .select("event_id", "user_id", "iv_id", "t_us")
    )


TS_WINDOW_H = 167  # odd pair count (167*166/2) -> exact middle median


def theil_sen(events: DataFrame) -> DataFrame:
    """THEIL-SEN robust trend per event type: the median of all
    pairwise slopes of the DENSE hourly count series over the last
    TS_WINDOW_H hours (ending at the global max hour) — the
    outlier-proof alternative to least squares every monitoring
    pipeline wants (mk_trend's natural companion: MK gives direction
    significance, Theil-Sen the magnitude).

    Exactness: the window length 167 makes the pair count odd, so the
    median is an exact middle element (no interpolated mean whose
    association could drift an ulp); each slope is ONE long/long
    division.  Missing hours are densified to zero on a generated hour
    spine first — pairwise slopes over sparse hours would silently
    skip the zeros and overstate trends.

    Scale shape: ONE count agg keyed (type, hour), a generated
    constant-size spine per type (broadcast cross of types x 167
    hours), then a per-type self-join bounded by 167^2/2 pairs per
    type — constant work per entity regardless of corpus size."""
    # integer hour bucketing: a float quotient of a 1.7e15 micros value
    # can round across an hour boundary before flooring and disagree
    # with DuckDB's integer // — stay in int64 DIV end to end
    base = events.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " DIV 3600000000"
        ).alias("h"),
    )
    hmax = base.agg(F.max("h").alias("hmax"))
    counts = (
        base.join(F.broadcast(hmax))
        .filter(F.col("h") > F.col("hmax") - TS_WINDOW_H)
        .groupBy("event_type", (F.col("hmax") - F.col("h")).alias("age"))
        .agg(F.count("*").alias("cnt"))
    )
    types = counts.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            counts.sparkSession.range(TS_WINDOW_H).select(F.col("id").alias("age"))
        )
    )
    dense = spine.join(counts, ["event_type", "age"], "left").select(
        "event_type", "age", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    a = dense.select("event_type", F.col("age").alias("i"), F.col("cnt").alias("ci"))
    b = dense.select("event_type", F.col("age").alias("j"), F.col("cnt").alias("cj"))
    # slope vs TIME: time = hmax - age, so d(cnt)/d(time) = (ci - cj)/(j - i)
    pairs = a.join(b, "event_type").filter(F.col("i") < F.col("j"))
    slope = (F.col("ci") - F.col("cj")) / (F.col("j") - F.col("i"))
    return (
        pairs.select("event_type", slope.alias("slope"))
        .groupBy("event_type")
        .agg(
            F.expr("median(slope)").alias("slope_per_hour"),
            F.count("*").alias("n_pairs"),
        )
    )


DECAY_CAP_H = 40  # dyadic decay exactness bound: 2^-40 granules sum exactly


def decayed_counts(events: DataFrame) -> DataFrame:
    """TIME-DECAYED activity counters per event type: each event
    contributes 2^-age_hours (half-life = 1 hour, ages capped at
    DECAY_CAP_H) relative to the global newest event — the freshness
    score behind trending-topic / hot-host rankings.

    Exactness trick: the decayed weight is summed as the INTEGER
    numerator sum(1 << (CAP - age)) and divided by 2^CAP exactly once —
    float sums are order-dependent across partitions, an exact long sum
    is not, and every weight is a dyadic rational so the single final
    division is exact.  The cap also bounds the numerator: 10^12 events
    x 2^40 fits in unsigned 80 bits... so at true corpus scale the
    numerator would sum in DECIMAL(38) (same pattern as the zonal
    variance sums); the long path holds to ~2^22 max-weight events and
    is what both engines evaluate here.

    Scale shape: one 1-row global-max agg broadcast back, then ONE
    map-side-combinable groupBy — no window, no join beyond the scalar
    broadcast."""
    # integer hour bucketing: a float quotient of a 1.7e15 micros value
    # can round across an hour boundary before flooring and disagree
    # with DuckDB's integer // — stay in int64 DIV end to end
    base = events.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " DIV 3600000000"
        ).alias("h"),
    )
    hmax = base.agg(F.max("h").alias("hmax"))
    aged = base.join(F.broadcast(hmax)).select(
        "event_type",
        F.least(F.col("hmax") - F.col("h"), F.lit(DECAY_CAP_H)).alias("age"),
    )
    # SQL-form shiftleft: the Python F.shiftleft only takes a literal
    # bit count, the SQL function takes a column
    num = F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), cast({DECAY_CAP_H} - age as int))")
    )
    return aged.groupBy("event_type").agg(
        (num / F.lit(float(1 << DECAY_CAP_H))).alias("decayed"),
        F.count("*").alias("n_events"),
    )


OHLC_BUCKET_US = 900_000_000  # 15-minute candles


def events_ohlc(events: DataFrame) -> DataFrame:
    """OHLC RESAMPLE (the finance-style candle rollup): per
    (event_type, 15-min bucket) the first/highest/lowest/last `value`,
    with first/last under the deterministic (ts, event_id) total order
    — events_hourly counts rows; this carries the value channel.  All
    four outputs are EXISTING doubles (picked, never combined), so the
    oracle compare is bit-exact without arithmetic pinning.

    Scale shape: ONE keyed shuffle — the two row_number windows and
    the final groupBy all share the (event_type, bucket) hash
    partitioning, so Spark reuses the exchange; hot buckets cost their
    own rows only."""
    base = events.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            f" DIV {OHLC_BUCKET_US}"
        ).alias("bkt"),
    )
    wa = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = base.select(
        "event_type",
        "bkt",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return rn.groupBy("event_type", "bkt").agg(
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n"),
    )


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """TIME-WEIGHTED average of ``value`` per user — the correct mean
    for irregularly-sampled state series (a sensor that reports rarely
    while steady must not be out-voted by one that chatters): each
    observation holds until the next one (LOCF weighting), so it
    carries weight = its holding duration, and the final observation
    (nothing to hold until) carries zero.

    Exact arithmetic end to end: values quantize to integer cents
    (``round(value*100)`` — fixture values carry two decimals, so the
    product is within 1e-10 of an integer and every rounding rule
    agrees), durations are integer epoch-microsecond gaps from
    ``lead(ts)`` under the deterministic (ts, event_id) order, and the
    output is the exact integer pair plus their floor quotient:
    (user_id, twa_num, twa_den, twa_cents) with
    twa_cents = twa_num div twa_den.  Single-observation users (den 0)
    are excluded, same rule both engines.  Overflow headroom:
    cents <= ~1e4 and per-gap micros <= ~1e12, so per-row products sit
    near 1e16 and int64 holds user spans to ~75 years of continuous
    max-value data; past that the sum moves to decimal(38,0) exactly
    like zonal variance does.

    Scale shape: ONE shuffle (hash by user for the lead window), then a
    map-side-combinable sum per user.  At 100 TB the window sort runs
    per user key — no global sort, no driver state."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    stepped = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.lead(t_us).over(w) - t_us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dur_us")).alias("twa_num"),
            F.sum("dur_us").alias("twa_den"),
        )
        .filter(F.col("twa_den") > 0)
        .select(
            "user_id",
            "twa_num",
            "twa_den",
            F.expr("twa_num DIV twa_den").alias("twa_cents"),
        )
    )


DP_EPS = 20000  # milli-degree perpendicular tolerance (20 deg)
DP_MAX_ROUNDS = 28  # recursion-depth bound, mirrored by the oracle


def trajectory_simplify(
    events: DataFrame, eps: int = DP_EPS, max_rounds: int = DP_MAX_ROUNDS
) -> DataFrame:
    """Distributed DOUGLAS-PEUCKER polyline simplification of every
    user trajectory at once — the classic cartographic generalization,
    re-expressed as data-parallel rounds instead of per-line recursion:
    round r relaxes every open segment of every trajectory
    simultaneously (find the farthest interior vertex; keep it and
    split if it clears the tolerance, else drop the interior), so the
    engine runs ONE argmax aggregate + ONE reassignment join per
    recursion LEVEL, not per segment.  Output: the kept vertices
    (user_id, idx, py, px) on the exact integer milli-degree lattice.

    Exact arithmetic end to end: the perpendicular test compares the
    squared cross product (B-A)x(P-A) against eps^2 * |AB|^2 — both
    sides integer, the squares in decimal(38,0) (cross^2 reaches ~1e22;
    the DuckDB twin squares in HUGEINT) — and argmax ties break
    (dist^2 DESC, idx ASC) via a struct max whose second field is
    -idx.  Zero-length chords (duplicate endpoints) yield cross = 0 <=
    threshold 0: interior drops, same rule both engines.

    BOUNDED-DEPTH semantics: both engines run at most ``max_rounds``
    recursion levels (segments still splittable past the bound drop
    their interiors) — the operator is therefore identical at any data
    scale by construction, and the bound is generous (fixture depth 19
    at every eps probed; the pytest twin asserts the bounded result
    equals TRUE unbounded DP at fixture scale).

    Scale shape: points carry their CURRENT containing segment (s, e)
    plus its endpoint coordinates, so each round touches only
    still-unresolved points — total work O(n * depth), the same as the
    sequential algorithm, spread across the cluster with one
    (user, s, e)-keyed agg + join per round.  Per-round
    localCheckpoint keeps the 28-round lineage flat (the knn_join_bulk
    pattern); the per-round emptiness count is the one driver boolean,
    same contract as regions.resolve_roots."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = events.select(
        "user_id",
        ((F.col("event_id") * 7919) % 180000).alias("py"),
        ((F.col("event_id") * 9973) % 360000).alias("px"),
        (F.row_number().over(w) - 1).cast("long").alias("idx"),
    ).localCheckpoint()
    ends = pts.groupBy("user_id").agg(F.max("idx").alias("mx"))
    kept = (
        ends.select("user_id", F.lit(0).cast("long").alias("idx"))
        .union(ends.select("user_id", F.col("mx")))
        .distinct()
    )
    s0 = pts.filter(F.col("idx") == 0).select(
        "user_id", F.col("py").alias("sy"), F.col("px").alias("sx")
    )
    e1 = pts.join(ends, "user_id").filter(F.col("idx") == F.col("mx")).select(
        "user_id", F.col("py").alias("ey"), F.col("px").alias("ex")
    )
    assign = (
        pts.join(ends, "user_id")
        .filter((F.col("idx") > 0) & (F.col("idx") < F.col("mx")))
        .join(s0, "user_id")
        .join(e1, "user_id")
        .select(
            "user_id",
            F.lit(0).cast("long").alias("s"),
            F.col("mx").alias("e"),
            "idx",
            "py",
            "px",
            "sy",
            "sx",
            "ey",
            "ex",
        )
    )
    d19 = "decimal(19,0)"
    cross = (F.col("ex") - F.col("sx")) * (F.col("py") - F.col("sy")) - (
        F.col("ey") - F.col("sy")
    ) * (F.col("px") - F.col("sx"))
    c2 = cross.cast(d19) * cross.cast(d19)
    len2 = (F.col("ex") - F.col("sx")) * (F.col("ex") - F.col("sx")) + (
        F.col("ey") - F.col("sy")
    ) * (F.col("ey") - F.col("sy"))
    thr = F.lit(eps * eps).cast(d19) * len2.cast(d19)
    for _ in range(max_rounds):
        assign = assign.localCheckpoint()
        if assign.isEmpty():
            break
        best = (
            assign.select(
                "user_id",
                "s",
                "e",
                F.struct(
                    c2.alias("c2"),
                    (-F.col("idx")).alias("ni"),
                    F.col("py").alias("my"),
                    F.col("px").alias("mx2"),
                ).alias("cand"),
                thr.alias("thr"),
            )
            .groupBy("user_id", "s", "e")
            .agg(F.max("cand").alias("m"), F.max("thr").alias("thr"))
        )
        split = best.filter(F.col("m.c2") > F.col("thr")).select(
            "user_id",
            "s",
            "e",
            (-F.col("m.ni")).alias("m_idx"),
            F.col("m.my").alias("my"),
            F.col("m.mx2").alias("mx2"),
        )
        kept = kept.union(
            split.select("user_id", F.col("m_idx").alias("idx"))
        ).localCheckpoint(eager=False)
        lo = F.col("idx") < F.col("m_idx")
        assign = (
            assign.join(split, ["user_id", "s", "e"])
            .filter(F.col("idx") != F.col("m_idx"))
            .select(
                "user_id",
                F.when(lo, F.col("s")).otherwise(F.col("m_idx")).alias("s"),
                F.when(lo, F.col("m_idx")).otherwise(F.col("e")).alias("e"),
                "idx",
                "py",
                "px",
                F.when(lo, F.col("sy")).otherwise(F.col("my")).alias("sy"),
                F.when(lo, F.col("sx")).otherwise(F.col("mx2")).alias("sx"),
                F.when(lo, F.col("my")).otherwise(F.col("ey")).alias("ey"),
                F.when(lo, F.col("mx2")).otherwise(F.col("ex")).alias("ex"),
            )
        )
    return kept.join(pts, ["user_id", "idx"]).select(
        "user_id", "idx", "py", "px"
    )


SEG_JUMP2 = 20_000_000_000  # squared step threshold (lattice units^2)
OD_CELL = 30000  # milli-degree OD cell span -> 6 x 12 world grid


def trajectory_segments(
    events: DataFrame, jump2: int = SEG_JUMP2
) -> DataFrame:
    """GPS-track SEGMENTATION (gaps-and-islands): split every user
    trajectory wherever the squared step length exceeds ``jump2`` (the
    teleport/jump detector every mobility pipeline runs before speed or
    stay analysis), then roll each segment up — (user_id, seg_id,
    n_pts, path_len2, bbox_h, bbox_w), seg_id 1-based per user in time
    order, path_len2 summing only intra-segment steps.  Exact integer
    algebra on the milli-degree lattice.

    Scale shape: the classic single-key two-window composition — lag
    for steps, running sum of the break flag for island ids — and the
    per-(user, seg) agg all share the user_id hash partitioning: ONE
    shuffle, map-side-combined rollup, skew bounded by the hottest
    user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = events.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 7919) % 180000).alias("py"),
        ((F.col("event_id") * 9973) % 360000).alias("px"),
    )
    stepped = pts.select(
        "user_id",
        "py",
        "px",
        (F.col("py") - F.lag("py").over(w)).alias("dy"),
        (F.col("px") - F.lag("px").over(w)).alias("dx"),
        F.when(
            F.lag("py").over(w).isNull()
            | (
                (F.col("py") - F.lag("py").over(w))
                * (F.col("py") - F.lag("py").over(w))
                + (F.col("px") - F.lag("px").over(w))
                * (F.col("px") - F.lag("px").over(w))
                > jump2
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
        F.col("ts").alias("__ts"),
        F.col("event_id").alias("__eid"),
    )
    seg = stepped.withColumn(
        "seg_id",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("__ts", "__eid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    step2 = F.col("dy") * F.col("dy") + F.col("dx") * F.col("dx")
    return seg.groupBy("user_id", "seg_id").agg(
        F.count("*").alias("n_pts"),
        F.coalesce(
            F.sum(F.when(F.col("brk") == 0, step2)), F.lit(0)
        ).alias("path_len2"),
        (F.max("py") - F.min("py")).alias("bbox_h"),
        (F.max("px") - F.min("px")).alias("bbox_w"),
    )


def od_flows(events: DataFrame, cell: int = OD_CELL) -> DataFrame:
    """ORIGIN-DESTINATION flow matrix over the coarse world grid: count
    consecutive-point transitions between DIFFERENT cells per the
    (ts, event_id) order — the OD rollup behind every mobility /
    crawl-geography heat map.  (o_cell, d_cell, n_trips), cells =
    (py div 30000) * 12 + (px div 30000) on the 6 x 12 grid.

    Scale shape: one user-keyed lag window (same single-shuffle
    contract as trajectory_stats), then a map-side-combinable count on
    the 72^2-bounded (o, d) key space — the output is constant-size
    regardless of corpus."""
    nx = 360000 // cell
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        F.expr(f"((event_id * 7919) % 180000) DIV {cell}") * nx
        + F.expr(f"((event_id * 9973) % 360000) DIV {cell}")
    )
    t = events.select("user_id", "ts", "event_id", c.alias("cell")).select(
        F.lag("cell").over(w).alias("o_cell"), F.col("cell").alias("d_cell")
    )
    return (
        t.filter(F.col("o_cell").isNotNull() & (F.col("o_cell") != F.col("d_cell")))
        .groupBy("o_cell", "d_cell")
        .agg(F.count("*").alias("n_trips"))
    )


def cell_dwell(events: DataFrame, cell: int = OD_CELL) -> DataFrame:
    """TIME-WEIGHTED cell heat map: total dwell (LOCF holding duration,
    epoch microseconds) and visit count per world-grid cell — the map
    :func:`od_flows` counts transitions OF and :func:`time_weighted_avg`
    weights values BY, aggregated spatially.  The last observation per
    user holds nothing (same endpoint rule as time_weighted_avg).

    Scale shape: one user-keyed lead window, then a map-side-combinable
    sum on the constant-size 72-cell key space."""
    nx = 360000 // cell
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    c = (
        F.expr(f"((event_id * 7919) % 180000) DIV {cell}") * nx
        + F.expr(f"((event_id * 9973) % 360000) DIV {cell}")
    )
    stepped = events.select(
        c.alias("cell"), (F.lead(t_us).over(w) - t_us).alias("dur_us")
    ).filter(F.col("dur_us").isNotNull())
    return stepped.groupBy("cell").agg(
        F.sum("dur_us").alias("dwell_us"), F.count("*").alias("n_visits")
    )


def band_correlation(coo3: DataFrame, bands: int = 4) -> DataFrame:
    """PEARSON CORRELATION matrix between raster bands — the
    multivariate statistic behind band selection / index design (NDVI
    chooses red vs NIR because their correlation under vegetation
    breaks): one row per unordered band pair (band_a, band_b, n, r).

    All sums are exact integers; the closing covariance algebra runs in
    decimal(38,0) and converts to double only at the boundary, sqrt is
    IEEE-correctly-rounded — the zonal_var exactness discipline, so the
    doubles are bitwise across engines.  Constant-variance degenerate
    bands yield r = NULL (0/0), same rule both sides.

    Scale shape: ONE (y, x)-keyed pivot aggregate (map-side combinable,
    conditional max per band), then a single global agg producing all
    pair sums at once (bands*(bands-1)/2 * 5 columns — constant width),
    unpivoted to rows by an inline explode.  The raster shuffles once;
    the pair table never materializes per cell."""
    p = coo3.groupBy("y", "x").agg(
        *[
            F.max(F.when(F.col("band") == b, F.col("value"))).alias(f"b{b}")
            for b in range(bands)
        ]
    )
    pairs = [(i, j) for i in range(bands) for j in range(i + 1, bands)]
    aggs = [F.count("*").alias("n")]
    for i, j in pairs:
        x, y = F.col(f"b{i}"), F.col(f"b{j}")
        aggs += [
            F.sum(x).alias(f"sx_{i}_{j}"),
            F.sum(y).alias(f"sy_{i}_{j}"),
            F.sum(x * y).alias(f"sxy_{i}_{j}"),
            F.sum(x * x).alias(f"sxx_{i}_{j}"),
            F.sum(y * y).alias(f"syy_{i}_{j}"),
        ]
    one = p.agg(*aggs)
    # (19,0) factors -> exact (38,0) products (sums stay < 1e18)
    d = "decimal(19,0)"
    structs = []
    for i, j in pairs:
        sx, sy = F.col(f"sx_{i}_{j}").cast(d), F.col(f"sy_{i}_{j}").cast(d)
        sxy = F.col(f"sxy_{i}_{j}").cast(d)
        sxx, syy = F.col(f"sxx_{i}_{j}").cast(d), F.col(f"syy_{i}_{j}").cast(d)
        cd = F.col("n").cast(d)
        num = (cd * sxy - sx * sy).cast("double")
        vx = (cd * sxx - sx * sx).cast("double")
        vy = (cd * syy - sy * sy).cast("double")
        den = F.sqrt(vx) * F.sqrt(vy)
        structs.append(
            F.struct(
                F.lit(i).cast("long").alias("band_a"),
                F.lit(j).cast("long").alias("band_b"),
                F.col("n").alias("n"),
                F.when(den > 0, num / den).alias("r"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.band_a", "s.band_b", "s.n", "s.r"
    )


MAD_K = 3.0


def mad_outliers(events: DataFrame, k: float = MAD_K) -> DataFrame:
    """ROBUST outlier screen per event type: median absolute deviation
    (the estimator that survives the very outliers it hunts — stddev
    does not) with the classic |x - median| > k * MAD rule.  Output
    (event_type, n, med, mad, n_outliers).  Medians via the exact
    percentile aggregate (interpolation pinned to DuckDB quantile_cont
    by the zonal_median precedent); a zero-MAD type (constant values)
    flags nothing, same rule both engines.

    Scale shape: two type-keyed aggregates with a broadcast join-back
    between them (the per-type median/MAD tables are k-type-sized) —
    the event stream is scanned twice and shuffled never beyond its
    type key."""
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("dv")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dv, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum((F.col("dv") > k * F.col("mad")).cast("long")).alias(
                "n_outliers"
            ),
        )
    )


def cusum_max(events: DataFrame) -> DataFrame:
    """CHANGE-POINT drift per event type — the one-sided CUSUM control
    statistic, made data-parallel by the identity that untangles its
    sequential reset: S_i = max(0, S_{i-1} + x_i - k) equals
    P_i - min(0, min_{j<=i} P_j) for the drift prefix
    P_i = sum_{j<=i}(x_j) - i*k, so two stacked windows (running sum +
    running min) replace the recursion.  Reference level k = the
    per-type floor mean in exact cents.  Output (event_type, n, k,
    cusum_max) — the maximum upward drift a monitor would alarm on.

    Exact integers end to end (cents, counts, floor division).  Scale
    shape: one tiny per-type stats broadcast, then ONE type-keyed
    shuffle shared by both windows and the final max agg."""
    cents = F.round(F.col("value") * 100).cast("long")
    m = events.select("event_type", cents.alias("c")).groupBy(
        "event_type"
    ).agg(F.expr("sum(c) DIV count(*)").alias("k"))
    j = events.select(
        "event_type", "ts", "event_id", cents.alias("c")
    ).join(F.broadcast(m), "event_type")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = j.select(
        "event_type",
        "ts",
        "event_id",
        "k",
        (
            F.sum("c").over(run)
            - F.row_number().over(w).cast("long") * F.col("k")
        ).alias("p"),
    )
    s = p.select(
        "event_type",
        "k",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(run))).alias("s"),
    )
    return s.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max("k").alias("k"),
        F.max("s").alias("cusum_max"),
    )


def diurnal_profile(events: DataFrame) -> DataFrame:
    """HOUR-OF-DAY profile per event type — the seasonal fingerprint a
    traffic monitor subtracts before anomaly detection: (event_type,
    hour, n, mean_cents) with the floor mean in exact cents, plus
    is_peak marking the (max n, min hour) modal hour per type.

    Scale shape: one map-side-combinable agg on the constant
    (type x 24) key space, then a window over that tiny table."""
    cents = F.round(F.col("value") * 100).cast("long")
    g = (
        events.select(
            "event_type", F.hour("ts").cast("long").alias("hour"), cents.alias("c")
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"), F.expr("sum(c) DIV count(*)").alias("mean_cents"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hour"))
    return g.select(
        "event_type",
        "hour",
        "n",
        "mean_cents",
        (F.row_number().over(w) == 1).alias("is_peak"),
    )


def peak_concurrency(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """PEAK CONCURRENT SESSIONS per event type — the sweep-line classic
    (capacity planning's first question) in pure window algebra: session
    intervals (same gap rule as session_stats: a session closes after
    ``gap_s`` idle seconds) emit +1 at their start and -1 one
    microsecond after their end, and the peak is the max running sum in
    (time, delta) order, ties broken so closings apply before openings
    at the same instant (the half-open [start, end+1us) convention).
    Output (event_type, n_sessions, peak, t_peak_us) with t_peak_us the
    FIRST boundary reaching the peak.

    Exact integers throughout.  Scale shape: one user-keyed window pass
    builds sessions, one type-keyed window order runs the sweep — two
    keyed shuffles, no self-joins, no interval explosion."""
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    wu = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    run = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        "event_type", "user_id", "ts", "event_id", t_us.alias("t")
    ).withColumn(
        "new_sess",
        F.when(
            F.lag("t").over(wu).isNull()
            | (F.col("t") - F.lag("t").over(wu) > gap_s * 1_000_000),
            1,
        ).otherwise(0),
    ).withColumn("sess", F.sum("new_sess").over(run))
    sessions = marked.groupBy("event_type", "user_id", "sess").agg(
        F.min("t").alias("t0"), (F.max("t") + 1).alias("t1")
    )
    deltas = sessions.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sessions.select(
            "event_type", F.col("t1").alias("t"), F.lit(-1).alias("d")
        )
    )
    ws = Window.partitionBy("event_type").orderBy("t", "d")
    swept = deltas.select(
        "event_type",
        "t",
        F.sum("d").over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cur"),
    )
    best = swept.groupBy("event_type").agg(
        F.max("cur").alias("peak"),
        F.min_by("t", F.struct((-F.col("cur")).alias("nc"), F.col("t"))).alias(
            "t_peak_us"
        ),
    )
    ns = sessions.groupBy("event_type").agg(F.count("*").alias("n_sessions"))
    return ns.join(best, "event_type").select(
        "event_type", "n_sessions", "peak", "t_peak_us"
    )


ACF_LAG = 1


def hourly_acf(events: DataFrame, lag: int = ACF_LAG) -> DataFrame:
    """Lag-``lag`` AUTOCORRELATION of the densified hourly count series
    per event type — the "is traffic sticky hour-to-hour" number a
    forecaster checks before fitting anything.  Missing hours count 0
    (dense series via a per-type hour spine).  Pearson r over the
    (c_t, c_{t+lag}) pairs; exact integer sums, double boundary with
    IEEE sqrt (band_correlation discipline); NULL r for constant
    series.  Output (event_type, n_pairs, r).

    Scale shape: the hourly rollup is map-side-combinable to a
    (type x hours) table that is tiny at any corpus scale; the spine
    join, the lag window, and the closing sums all run on that compact
    series."""
    hr = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " DIV 3600000000"
    )
    g = events.select("event_type", hr.alias("h")).groupBy(
        "event_type", "h"
    ).agg(F.count("*").alias("c"))
    span = g.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = span.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    dense = spine.join(g, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    pairs = dense.select(
        "event_type", "c", F.lead("c", lag).over(w).alias("cn")
    ).filter(F.col("cn").isNotNull())
    agg = pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.sum("c").alias("sx"),
        F.sum("cn").alias("sy"),
        F.sum(F.col("c") * F.col("cn")).alias("sxy"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
        F.sum(F.col("cn") * F.col("cn")).alias("syy"),
    )
    d = "decimal(19,0)"
    cd = F.col("n_pairs").cast(d)
    num = (cd * F.col("sxy").cast(d) - F.col("sx").cast(d) * F.col("sy").cast(d)).cast("double")
    vx = (cd * F.col("sxx").cast(d) - F.col("sx").cast(d) * F.col("sx").cast(d)).cast("double")
    vy = (cd * F.col("syy").cast(d) - F.col("sy").cast(d) * F.col("sy").cast(d)).cast("double")
    den = F.sqrt(vx) * F.sqrt(vy)
    return agg.select(
        "event_type", "n_pairs", F.when(den > 0, num / den).alias("r")
    )


def iet_histogram(events: DataFrame) -> DataFrame:
    """INTER-EVENT-TIME distribution per event type in power-of-two
    microsecond buckets — the heavy-tail fingerprint (Poisson traffic
    decays geometrically across log buckets; bursty human traffic does
    not).  bucket = floor(log2(gap_us)) computed EXACTLY as bit length
    minus one (length(bin(gap)) - 1 — no libm), zero gaps in bucket -1.
    Output (event_type, bucket, n).

    Scale shape: one type-keyed lag window, then a map-side-combinable
    count on the constant (type x ~40-bucket) key space."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    g = events.select(
        "event_type", (t_us - F.lag(t_us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    bucket = F.when(F.col("gap") <= 0, F.lit(-1).cast("long")).otherwise(
        (F.length(F.bin("gap")) - 1).cast("long")
    )
    return g.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


def max_drawdown(events: DataFrame) -> DataFrame:
    """MAXIMUM DRAWDOWN of the cumulative value series per event type —
    the running-peak-minus-current statistic (finance's risk number;
    ops dashboards use it on cumulative error budgets): over the
    (ts, event_id)-ordered cumulative cents C_i, drawdown_i =
    max_{j<=i} C_j - C_i, reported at its max with the FIRST time it is
    reached.  Output (event_type, n, max_drawdown, t_at_us).  Exact
    integers; one type-keyed shuffle shared by the two stacked windows
    (running sum, running max) and the final argmax agg."""
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = events.select(
        "event_type",
        "ts",
        "event_id",
        t_us.alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("cum", F.sum("cents").over(run))
    dd = c.select(
        "event_type",
        "t",
        (F.max("cum").over(run) - F.col("cum")).alias("dd"),
    )
    return dd.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max("dd").alias("max_drawdown"),
        F.min_by("t", F.struct((-F.col("dd")).alias("nd"), F.col("t"))).alias(
            "t_at_us"
        ),
    )
