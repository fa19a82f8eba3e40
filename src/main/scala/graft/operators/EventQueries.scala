package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Stable._

/** Event-stream surface: the batch-gradable forms of the reference's
  * change-stream processing (tumbling/sliding/session event-time windows,
  * JSON prop extraction, exact dedup). The same `window()` /
  * `session_window()` expressions run unchanged under Structured
  * Streaming (see graft.streaming), which is how the incremental path is
  * exercised; batch execution here makes them DuckDB-oracle-checkable
  * (SURVEY.md §2.2).
  *
  * All window starts are emitted as epoch seconds (BIGINT) — the
  * engine-neutral timestamp encoding.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q27
  /** JSON extraction from `events.props` + aggregation over the value. */
  def q27JsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        avg(col("k")).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q28
  /** Array/higher-order functions over the embedding column: size,
    * element access, exact left-fold double sum, L2 norm. The fold order
    * (0.0 ⊕ x₁ ⊕ x₂ …) is bit-identical to DuckDB's list_reduce. */
  def q28ArrayFns(spark: SparkSession, sfDir: String): DataFrame = {
    val em = Tables.embeddings(spark, sfDir)
    em.select(col("vec_id"), col("label"),
        asLong(size(col("embedding"))).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first"),
        round(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)"
        ), 4).as("vsum"),
        round(sqrt(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)"
        )), 4).as("l2norm"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------- q29
  /** Tumbling event-time window (reference R3+R4: date-granularity
    * dimension over the change stream), batch form. */
  def q29TumblingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(epochS(col("window.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))
  }

  // ---------------------------------------------------------------- q30
  /** Sliding window: 1 hour window, 15 minute slide — every event lands
    * in exactly 4 epoch-aligned windows. */
  def q30SlidingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(epochS(col("window.start")).as("ws"), col("n"), col("sum_value"))
      .orderBy(col("ws"))
  }

  // ---------------------------------------------------------------- q31
  /** Session window with a 30-minute gap per user (reference-style
    * sessionization of the change stream). Spark semantics: a new session
    * starts when the gap to the previous event is ≥ the timeout; the
    * oracle reproduces that as lag/cumsum islands. */
  def q31SessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"), epochS(col("session_window.start")).as("session_start"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // ---------------------------------------------------------------- q32
  /** Exact deduplication, deterministic form: keep the earliest
    * (ts, event_id) row per (user_id, event_type). The same rule runs
    * streaming via dropDuplicatesWithinWatermark (graft.streaming);
    * batch uses an explicit row_number so the survivor is well-defined
    * on both engines (dropDuplicates keeps an arbitrary row). */
  def q32DedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        epochS(col("ts")).as("ts_s"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  // ---------------------------------------------------------------- q65
  /** Map-type functions (SURVEY §2.2 map row). The testdata has no map
    * column, so one is synthesized deterministically per event —
    * `map_from_entries` over (json k, user_id, cents) — then the map
    * surface is exercised end-to-end: construction (`map`,
    * `map_from_entries`, `map_concat`), lookup (`element_at`,
    * `map_contains_key`), extraction (`map_keys`, `map_values`, `size`),
    * and higher-order forms (`map_filter`, `transform_values`). The
    * DuckDB oracle recomputes every aggregate from the underlying scalars
    * (json_extract path), so the map plumbing itself is what's graded. */
  def q65MapFns(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val m = e.withColumn("m", map_from_entries(array(
        struct(lit("k").as("key"),
          get_json_object(col("props"), "$.k").cast("long").as("val")),
        struct(lit("user").as("key"), col("user_id").as("val")),
        struct(lit("cents").as("key"),
          round(col("value") * 100).cast("long").as("val")))))
      .withColumn("m2", map_concat(col("m"), map(lit("one"), lit(1L))))
    m.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(element_at(col("m"), "k")).as("sum_k"),
        asLong(sum(size(col("m2")))).as("n_entries"),
        sum(expr(
          "aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)"))
          .as("sum_vals"),
        asLong(sum(size(expr("map_filter(m, (k, v) -> v % 2 = 0)"))))
          .as("n_even_vals"),
        sum(expr(
          """aggregate(map_values(transform_values(m, (k, v) -> v * 2)),
               CAST(0 AS BIGINT), (a, x) -> a + x)""")).as("sum_doubled"),
        asLong(sum(when(expr("map_contains_key(m, 'user')"), 1).otherwise(0)))
          .as("n_has_user"),
        min(array_join(sort_array(map_keys(col("m2"))), ",")).as("keys_csv"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q92
  /** Conversion funnel view → click → purchase: each user's first view,
    * first click STRICTLY after it, first purchase strictly after that
    * (ordered-sequence semantics, not mere co-occurrence). Stage frames
    * are per-user min aggregates chained by equi-joins on user_id —
    * map-side partial mins, |users| rows between stages, no window over
    * the raw event stream and no per-user sort: at 100 TB the cost is
    * three hash aggregates over the type-filtered slices (each filter
    * pushed to the scan). Output: per-stage distinct-user count and
    * mean seconds from funnel entry (lags are exact BIGINT seconds, so
    * the avg is a sum-exact division in both engines). */
  /** Per-user funnel times (t0 = first view, t1 = first click after t0,
    * t2 = first purchase after t1; t1/t2 null when the stage is never
    * reached) — the shared core of q92 and the streaming funnel's
    * batch-equivalence test (StreamingSpec). */
  def funnelTimes(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
  }

  def q92Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ft = funnelTimes(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts")))
    val s1 = ft.agg(count(col("t0")).as("n_users"),
      avg(lit(0L)).as("avg_lag_s")).withColumn("stage", lit("1_view"))
    val s2 = ft.filter(col("t1").isNotNull)
      .agg(count(lit(1)).as("n_users"),
        avg(epochS(col("t1")) - epochS(col("t0"))).as("avg_lag_s"))
      .withColumn("stage", lit("2_click"))
    val s3 = ft.filter(col("t2").isNotNull)
      .agg(count(lit(1)).as("n_users"),
        avg(epochS(col("t2")) - epochS(col("t0"))).as("avg_lag_s"))
      .withColumn("stage", lit("3_purchase"))
    s1.unionByName(s2).unionByName(s3)
      .select(col("stage"), col("n_users"), col("avg_lag_s"))
      .orderBy(col("stage"))
  }

  // ---------------------------------------------------------------- q93
  /** Cohort retention: users grouped by the epoch-week of their FIRST
    * event; for every (cohort, week-offset) cell, how many of them were
    * active — the classic retention triangle. Two hash aggregates (the
    * per-user first week, then the distinct-user count per cell, both
    * with map-side partials) and one equi-join on user_id; the cell
    * count is a distinct aggregate, which Spark executes as a two-phase
    * partial distinct — never a per-cohort sort. */
  def q93Retention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"),
        (epochS(col("ts")).cast("double") / 604800).cast("long").as("wk"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("wk_offset"))
  }

  // ---------------------------------------------------------------- q97
  /** Equi-width histogram of event value per type: 20 buckets spanning
    * the corpus [min, max] — the OLAP distribution primitive behind
    * every dashboard's value histogram. Pass 1 is a global min/max
    * aggregate (ONE row, map-side partials) broadcast back; pass 2 is a
    * map-only bucket assignment + hash aggregate. Same two-pass
    * broadcast-stats shape as q83's quantizer: the stats row never
    * shuffles the corpus, and bucket math is two double ops on
    * identical operands in both engines (top value clamped into the
    * last bucket). */
  def q97Histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val stats = e.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    e.crossJoin(broadcast(stats))
      .withColumn("bucket",
        least(floor((col("value") - col("vmin"))
          / ((col("vmax") - col("vmin")) / lit(20.0))).cast("long"), lit(19L)))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"), col("bucket"))
  }

  // ---------------------------------------------------------------- q98
  /** Event-transition mining (first-order Markov matrix): per user,
    * each event's successor by (ts, event_id) order, counted per
    * (from, to) pair. The lead window sorts each user's OWN events
    * (shuffle partitioned by user_id — the canonical sequence-mining
    * shape; no global sort), then a hash aggregate with map-side
    * partials collapses to the |types|² transition matrix. */
  def q98Transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // --------------------------------------------------------------- q100
  /** Time-series gap fill + resample: the hourly grid per event type
    * over the corpus time range, missing hours emitted with n=0 and the
    * hourly sum FORWARD-FILLED from the last observed hour (dashboards
    * and training-feature pipelines both need the dense grid, not the
    * sparse observations). The grid is |types| × |hours| — generated
    * from a ONE-row min/max broadcast (q83's stats shape) and a
    * sequence explode, never a driver loop; the fill is
    * `last(ignoreNulls)` over an hours-ordered window per type —
    * partition-local, no corpus re-shuffle beyond the hourly
    * pre-aggregation (which carries one row per (type, hour)). */
  def q100GapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .withColumn("ts_s", epochS(col("ts")))
      .select(col("event_type"),
        expr("(ts_s div 3600) * 3600").as("hr"), col("value"))
    val hourly = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n_obs"), moneySum(col("value")).as("sum_v"))
    val stats = e.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(stats))
      .select(col("event_type"),
        explode_outer(expr("sequence(h0, h1, 3600)")).as("hr"))
      .filter(col("hr").isNotNull)
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("filled_sum",
        coalesce(last(col("sum_v"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("event_type"), col("hr"), col("n_obs"), col("filled_sum"))
      .orderBy(col("event_type"), col("hr"))
  }

  // --------------------------------------------------------------- q101
  /** Statistical anomaly detection: per-type 2σ outliers with EXACT
    * decimal moment sums — Σv and Σv² accumulate as DECIMAL (value is
    * 2-decimal ⇒ v² is exactly a 4-decimal; both sums are
    * order-independent under any partitioning), and only the final
    * mean/σ/threshold arithmetic runs in double — the same expressions
    * in both engines, so the >2σ gate is ulp-exact where a naive
    * stddev_samp would diverge by accumulation order. One aggregate +
    * one broadcast of the |types|-row moment table + a map-side flag
    * pass: two corpus scans, no window. */
  def q101AnomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val m = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("s1"),
        sum(dec2(col("value")) * dec2(col("value"))).cast("double").as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("sd", sqrt(
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)))
    e.join(broadcast(m), Seq("event_type"))
      .withColumn("is_anom",
        col("value") > col("mean") + lit(2.0) * col("sd") ||
        col("value") < col("mean") - lit(2.0) * col("sd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anomalies"),
        min(when(col("is_anom"), col("event_id"))).as("first_anom"),
        max(when(col("is_anom"), col("event_id"))).as("last_anom"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q124
  /** Last-touch attribution: for every purchase, the user's most recent
    * PRIOR view and the view→purchase latency — the per-user as-of
    * lookup (q10/q53's semantic) expressed as a running conditional max
    * over the user's own timeline: one window pass, no join, no event
    * re-sort beyond the per-user order. Timestamps ride as exact epoch
    * MICROS (events.ts is ns-parquet truncated to µs identically in
    * both engines). */
  def q124Attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("last_view_us",
        max(when(col("event_type") === "view", col("t_us"))).over(before))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("t_us").as("purchase_us"), col("last_view_us"),
        (col("t_us") - col("last_view_us")).as("latency_us"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q125
  /** Ratio-to-report: each supplier nation's share of its region's
    * revenue — the percent-of-total window idiom. The per-nation
    * revenue stays DECIMAL through the window total (exact and
    * order-independent where a double window-sum would depend on
    * partition row order), divided once in double. */
  def q125ShareOfTotal(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    // rev stays at the product's full scale (no mid-pipeline rounding:
    // a (18,2) re-round here hit a .xx5 half-way case the two engines
    // round differently) — exact through the window, one double cast out
    val rev = li.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .as("rev"))
    rev.withColumn("region_rev",
        sum(col("rev")).over(Window.partitionBy(col("r_name"))))
      .select(col("r_name"), col("n_name"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") / col("region_rev").cast("double"))
          .as("share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // ---------------------------------------------------------------- q127
  /** TIME-WEIGHTED average: each event's value holds until the user's
    * next event, so the mean weights values by their holding interval —
    * the correct aggregate for sampled state (sensor readings, account
    * balances, feature gauges), where a row-weighted avg over-counts
    * bursts. Weights are exact epoch-µs intervals; value·Δt accumulates
    * as DECIMAL×BIGINT (exact, order-free), one double division at the
    * end. One lead() window per user, then a plain hash aggregate. */
  def q127TimeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("t_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
    e.withColumn("dt_us", lead(col("t_us"), 1).over(w) - col("t_us"))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        asLong(sum(col("dt_us"))).as("total_dt_us"),
        // round(12): the huge decimal Σ(value·Δt) exceeds double's
        // mantissa, and DuckDB's decimal→double conversion can differ
        // from the JVM's by 1 ulp (the q107 lesson)
        round(sum(dec2(col("value")) * col("dt_us")).cast("double")
          / sum(col("dt_us")).cast("double"), 12).as("twa"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------- q135
  /** LINEAR (multi-touch) attribution — the sibling of q124's
    * last-touch: each purchase's value splits EQUALLY across the user's
    * clicks in the preceding 7 days. Implemented as ONE RANGE-framed
    * window per user (conditional count of clicks over
    * [−7 d, −1 µs] in epoch-µs space) — no self-join, no explode: the
    * touch count rides the same sorted pass every other per-user
    * window uses, so at 100 TB this is one shuffle on user_id.
    * Determinism: the frame is VALUE-based (epoch-µs bounds), immune to
    * row order among ties; credit is one double division spelled
    * identically in both engines; purchases with zero prior clicks
    * report credit 0 (not null) so the output is total. */
  def q135LinearAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val WeekUs = 7L * 86400L * 1000000L
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("t_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-WeekUs, -1L)
    e.withColumn("n_touches",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        asLong(coalesce(col("n_touches"), lit(0L))).as("n_touches"),
        when(col("n_touches") > 0,
            dec2(col("value")).cast("double") / col("n_touches"))
          .otherwise(lit(0.0)).as("credit_per_touch"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- q137
  /** CDC COMPACTION — latest state per key: collapse an append-only
    * change log to each (user, event_type)'s most recent row, the
    * upsert-view operator every lake table with CDC ingestion needs
    * (the cube's signed-delta fold is the AGGREGATE consumer of the
    * same log; this is the row-level one).
    *
    * Scale shape: one shuffle on the key; within each partition the
    * window keeps row 1 of the (ts, event_id)-descending order —
    * event_id breaks timestamp ties deterministically, which is what
    * makes the result (and the oracle hash) well-defined on a log with
    * same-instant updates. At lake scale the same plan runs per
    * partition-of-the-log (merge-on-read compaction); a max_by
    * aggregate is the alternative when rows are wide. */
  def q137CdcCompact(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        epochS(col("ts")).as("ts_s"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  // --------------------------------------------------------------- q138
  /** ROLLING 7-DAY DISTINCT USERS per day — the WAU/reach curve every
    * engagement dashboard plots, and the canonical "distinct over a
    * sliding window" operator: for each observed day d, how many
    * distinct users were active in [d-6, d]. Distinct does not add
    * across days, so the window CANNOT be a sum over daily counts; the
    * exact form here first collapses events to distinct (user, day)
    * pairs (one hash aggregate — the corpus's only full shuffle, output
    * ∝ active-user-days, not events), then EXPLODES each pair to the ≤7
    * window endpoints it contributes to and re-counts distinct per day.
    * The ×7 fan-out is on the collapsed table, and the observed-day
    * dimension it semi-joins is tiny at any scale (broadcast). The
    * sketch twin that avoids even the ×7 re-count at 100 TB is q139:
    * merge 7 daily HLL partials per endpoint instead. */
  def q138RollingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val du = Tables.events(spark, sfDir)
      .select(col("user_id"),
        (epochS(col("ts")).cast("double") / 86400).cast("long").as("d"))
      .distinct()
    graft.functions.Rolling.endpoints(du)
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .orderBy(col("day"))
  }

  // --------------------------------------------------------------- q199
  /** LINEAR INTERPOLATION over a sparse daily series — the telemetry
    * resampling twin of q100's zero-fill: where gap-fill carries the
    * last observation forward, interpolation reconstructs interior
    * missing days as the straight line between the surrounding
    * anchors. The series is a SPARSE slice of events (1-in-23 by id —
    * the full table is day-dense and would never exercise the
    * operator); per type the calendar grid spans the observed range
    * and each missing day finds its anchors with FOUR ignore-null
    * window lookups (last value/day before, first value/day after) —
    * one shuffle on the series key, O(1) state per row, never a
    * self-join of the grid against observations. The daily level is
    * the Stable decimal-sum / count form and the interpolation
    * arithmetic is written identically in both engines (same operand
    * order, same promotions), so the DuckDB twin hash-matches the
    * doubles exactly — interior points only by construction (the grid
    * starts and ends on observed days). */
  def q199Interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_id") % 23 === 0)
      .select(col("event_type"),
        (epochS(col("ts")).cast("double") / 86400).cast("long").as("d"),
        col("value"))
      .groupBy(col("event_type"), col("d"))
      .agg((moneySum(col("value")) / count(lit(1))).as("v"))
    val span = daily.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = span
      .select(col("event_type"), explode_outer(expr("sequence(d0, d1)"))
        .as("d"))
      .filter(col("d").isNotNull)
    val asc = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val desc = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(0, Window.unboundedFollowing)
    grid.join(daily, Seq("event_type", "d"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(asc))
      .withColumn("pd", last(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(asc))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(desc))
      .withColumn("nd", first(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(desc))
      .select(col("event_type"), col("d").as("day"),
        col("v").isNotNull.as("observed"),
        round(coalesce(col("v"),
          col("pv") + (col("nv") - col("pv")) * (col("d") - col("pd"))
            / (col("nd") - col("pd"))), 6).as("v"))
      .orderBy(col("event_type"), col("day"))
  }

  // --------------------------------------------------------------- q202
  /** DISTRIBUTION DRIFT (chi-square) — the monitoring primitive every
    * production pipeline runs on its event mix: did the event-type
    * distribution shift between the first and second half of the
    * window? The contingency table is (type × half) with the half
    * boundary the integer midpoint of the observed epoch-second range
    * (computed once, broadcast — never a percentile pass), and every
    * χ² cell is emitted as its own ROW-wise column rather than summed:
    * each expected count and each cell contribution is a single IEEE
    * expression over EXACT BIGINTs ((rowΣ·colΣ)/grand, (o−e)²/e with
    * the square as an explicit product, no libm pow), written in the
    * same operand order in both engines, so the doubles hash-match
    * bit-for-bit; the only float ADDITION is the fixed two-term
    * chi_early + chi_late. Plan: one pushed two-column scan, one hash
    * aggregate to |types| rows, two broadcast one-row joins — the 100
    * TB cost is the scan, as it should be. (At 1e12+ rows the BIGINT
    * products rowΣ·colΣ widen to DECIMAL(38,0) — noted, not needed at
    * any graded scale.) */
  def q202DriftChisq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), epochS(col("ts")).as("s"))
    val mm = e.agg(min(col("s")).as("s0"), max(col("s")).as("s1"))
      .select(expr("(s0 + s1) div 2").as("mid"))
    val byType = e.crossJoin(broadcast(mm))
      .groupBy(col("event_type"))
      .agg(sum(when(col("s") < col("mid"), 1L).otherwise(0L)).as("o_early"),
        sum(when(col("s") >= col("mid"), 1L).otherwise(0L)).as("o_late"))
    // Column totals via a full-frame window over the |types|-row
    // aggregate — NOT a second aggregate of byType, which would re-run
    // the event scan (the plan audit showed 4 scans; this form has 2:
    // the min/max pass and the count pass).
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val grand = (col("t_early") + col("t_late")).cast("double")
    // zero-expected guard: e_early/e_late is 0 exactly when the whole
    // column total is 0 (every event on one side of the midpoint — the
    // all-one-epoch degenerate input). Spark's Divide returns NULL for
    // a 0 divisor where DuckDB's IEEE division yields NaN/inf, so the
    // cell is explicitly NULLed on BOTH sides (matching CASE in the
    // oracle) — the engines then agree instead of hash-diverging.
    def cell(o: String, e: String) = {
      val d = col(o).cast("double") - col(e)
      when(col(e) > 0, d * d / col(e))
    }
    byType
      .withColumn("t_early", sum(col("o_early")).over(wAll))
      .withColumn("t_late", sum(col("o_late")).over(wAll))
      .withColumn("e_early",
        ((col("o_early") + col("o_late")) * col("t_early")).cast("double")
          / grand)
      .withColumn("e_late",
        ((col("o_early") + col("o_late")) * col("t_late")).cast("double")
          / grand)
      .select(col("event_type"), col("o_early"), col("o_late"),
        col("e_early"), col("e_late"),
        cell("o_early", "e_early").as("chi_early"),
        cell("o_late", "e_late").as("chi_late"),
        (cell("o_early", "e_early") + cell("o_late", "e_late"))
          .as("chi_type"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------- q204
  /** SEASONAL PROFILE — the day-of-week decomposition of the daily
    * revenue series (the "is Monday really our weak day" question, and
    * the seasonal-index half of an STL-style decomposition): daily
    * exact-decimal totals, regrouped by weekday, each weekday's mean
    * day compared against the overall mean day as ONE ratio of exact
    * products (revᵈᵒʷ·daysᵃˡˡ / revᵃˡˡ·daysᵈᵒʷ — a single IEEE
    * division, never a mean-of-means float chain). Two hash aggregates
    * (calendar-day, then weekday — the first does the data reduction,
    * the second is 7 rows) plus a one-row broadcast; weekday numbering
    * pinned to Monday=0 on both engines (Spark `weekday`, DuckDB
    * `isodow−1` — `dayofweek` disagrees across engines and is a
    * classic silent-skew bug). */
  def q204SeasonalProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .groupBy(col("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    val byDow = daily
      .select(asLong(weekday(col("day"))).as("dow"), col("rev"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("rev_dow"))
    // Grand totals as a full-frame window over the 7-row weekday frame
    // — a second aggregate of byDow would re-run the whole daily scan.
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    byDow
      .withColumn("rev_all", sum(col("rev_dow")).over(wAll))
      .withColumn("days_all", sum(col("n_days")).over(wAll))
      .select(col("dow"), col("n_days"),
        col("rev_dow").cast("double").as("revenue"),
        (col("rev_dow").cast("double") / col("n_days")).as("avg_day"),
        ((col("rev_dow").cast("double") * col("days_all"))
          / (col("rev_all").cast("double") * col("n_days")))
          .as("seasonal_ratio"))
      .orderBy(col("dow"))
  }

  // --------------------------------------------------------------- q207
  /** HIGHER-MOMENT PROFILE — per-type mean / variance / third / fourth
    * central moments of the value column, the distribution-shape sweep
    * behind drift detectors and outlier gates. The 2-decimal values are
    * scaled to integer CENTS and the four raw power sums Σx..Σx⁴
    * accumulate in DECIMAL — exact and order-independent, so the
    * map-side partial aggregation (ONE hash aggregate over the pushed
    * two-column scan) is safe at any parallelism; factor precision is
    * (9,0) so the product chain stays inside BOTH engines' 38-digit
    * decimal (x⁴ ≤ 10³⁶). Central moments then come out of the sums in
    * identically-written single IEEE expression trees — the float math
    * happens once per GROUP, not per row, and no libm call (explicit
    * products, no pow). Output stays in cents-units; sums are also
    * emitted so the oracle pins the exact integers, not just the
    * derived floats. */
  def q207CentralMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val xc = (dec2(col("value")) * 100).cast("decimal(9,0)")
    val sums = Tables.events(spark, sfDir)
      .select(col("event_type"), xc.as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n
    val r2 = col("s2").cast("double") / n
    val r3 = col("s3").cast("double") / n
    // Float moments stop at m3: s1..s3 stay under 2^53 at graded
    // scales, so their int→double conversions are EXACT in any engine.
    // s4 (~1e19+) is not, and measured cross-engine DECIMAL→DOUBLE
    // conversion disagrees by ulps above 2^53 — so the 4th moment is
    // emitted as the EXACT integer n⁴·m4 (the standard unnormalized
    // central-moment form), never passing through a float.
    val nD = col("n").cast("decimal(38,0)")
    val d1 = col("s1").cast("decimal(38,0)")
    val d2 = col("s2").cast("decimal(38,0)")
    val d3 = col("s3").cast("decimal(38,0)")
    val d4 = col("s4").cast("decimal(38,0)")
    val m4n = nD * nD * nD * d4 - lit(4) * nD * nD * d3 * d1 +
      lit(6) * nD * d2 * d1 * d1 - lit(3) * d1 * d1 * d1 * d1
    // Output types are engine-neutral: the sub-2^53 sums as BIGINT, the
    // two beyond-int64 integers (s4, n⁴·m4) as their exact decimal
    // STRINGS — the same discipline as epoch-BIGINT timestamps.
    sums.select(col("event_type"), col("n"),
        col("s1").cast("long").as("s1"), col("s2").cast("long").as("s2"),
        col("s3").cast("long").as("s3"),
        d4.cast("string").as("s4"),
        mean.as("mean_cents"),
        (r2 - mean * mean).as("m2"),
        (r3 - lit(3) * mean * r2 + lit(2) * mean * mean * mean).as("m3"),
        m4n.cast("decimal(38,0)").cast("string").as("m4n"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------- q208
  /** EXACT DISTINCT FROM MERGEABLE BITMAP PARTIALS — the materialized-
    * view answer to COUNT(DISTINCT)'s non-reaggregability: per (type,
    * day, id-block-of-64) one BIGINT word bit-ors the block's present
    * users, giving per-day exact distincts as Σ bit_count(word) AND
    * letting the full-range distinct be recomputed by OR-merging the
    * DAILY PARTIALS — the second aggregate never touches raw events,
    * exactly how a day-grained MV serves month/quarter exact distincts
    * (the exact-arithmetic sibling of the q139 rolling-HLL path; unlike
    * HLL the words are exact, unlike naive distinct they merge). Plan:
    * one hash aggregate to the word table (the only raw-data shuffle;
    * map-side bit_or partials compress each block to one word early),
    * then two word-table-sized aggregates. Assumes dense ids (words ∝
    * id-range/64 per group — true for this schema's user ids; sparse or
    * UUID key spaces dictionary-encode first or take the HLL path).
    * Oracle recomputes both levels with plain COUNT(DISTINCT): equality
    * proves every word exact. */
  def q208BitmapDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("d"),
        expr("user_id div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 64 as int))")
          .as("bit"))
      .groupBy(col("event_type"), col("d"), col("w"))
      .agg(expr("bit_or(bit)").as("word"))
      // Cached: the word table IS the materialized partial this query
      // models, and both consumers below must read it rather than
      // re-aggregate raw events (the plan audit showed the un-cached
      // form scanning events twice). The cache keys on the canonical
      // plan, so repeated calls per (session, sfDir) share one entry;
      // its size is |blocks touched|, orders below the event count.
    val cachedWords = words.cache()
    val daily = cachedWords.groupBy(col("event_type"), col("d"))
      .agg(sum(expr("cast(bit_count(word) as bigint)")).as("nd"))
    val total = cachedWords.groupBy(col("event_type"), col("w"))
      .agg(expr("bit_or(word)").as("word"))
      .groupBy(col("event_type"))
      .agg(sum(expr("cast(bit_count(word) as bigint)"))
        .as("distinct_total"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("nd")).as("sum_daily_distinct"),
        max(col("nd")).as("max_daily_distinct"))
      .join(total, Seq("event_type"))
      .orderBy(col("event_type"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q207_central_moments" -> q207CentralMoments,
    "q208_bitmap_distinct" -> q208BitmapDistinct,
    "q202_drift_chisq" -> q202DriftChisq,
    "q204_seasonal_profile" -> q204SeasonalProfile,
    "q199_interpolate" -> q199Interpolate,
    "q138_rolling_distinct" -> q138RollingDistinct,
    "q124_attribution" -> q124Attribution,
    "q135_linear_attribution" -> q135LinearAttribution,
    "q137_cdc_compact" -> q137CdcCompact,
    "q125_share_of_total" -> q125ShareOfTotal,
    "q127_time_weighted_avg" -> q127TimeWeightedAvg,
    "q100_gap_fill" -> q100GapFill,
    "q101_anomaly_zscore" -> q101AnomalyZscore,
    "q97_histogram" -> q97Histogram,
    "q98_transitions" -> q98Transitions,
    "q92_funnel" -> q92Funnel,
    "q93_retention" -> q93Retention,
    "q27_json_extract" -> q27JsonExtract,
    "q28_array_fns" -> q28ArrayFns,
    "q29_tumbling_window" -> q29TumblingWindow,
    "q30_sliding_window" -> q30SlidingWindow,
    "q31_session_window" -> q31SessionWindow,
    "q32_dedup_exact" -> q32DedupExact,
    "q65_map_fns" -> q65MapFns,
  )

  lazy val sql: Map[String, String] = Map(
    // The power sums are pinned as exact DECIMAL integers; the derived
    // moments repeat the Spark expression trees operand-for-operand
    // (explicit products, no pow, same association).
    "q207_central_moments" -> """
      SELECT event_type, n,
        CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
        CAST(s3 AS BIGINT) AS s3,
        CAST(CAST(s4 AS DECIMAL(38,0)) AS VARCHAR) AS s4,
        mean AS mean_cents,
        r2 - mean * mean AS m2,
        r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
        CAST(CAST(nh * nh * nh * s4 - 4 * nh * nh * s3 * s1
          + 6 * nh * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1
          AS DECIMAL(38,0)) AS VARCHAR) AS m4n
      FROM (
        SELECT event_type, n, CAST(n AS HUGEINT) AS nh, s1, s2, s3, s4,
          CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
          CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3
        FROM (
          -- HUGEINT power chain: DuckDB's decimal multiply overflows its
          -- physical int64 on the x**4 step; 128-bit integers hold the
          -- identical exact values (x**4 <= ~1.4e18, sums <= ~1e25).
          SELECT event_type, count(1) AS n,
            sum(x) AS s1,
            sum(xh * x) AS s2,
            sum(xh * x * x) AS s3,
            sum(xh * x * x * x) AS s4
          FROM (
            SELECT event_type, x, CAST(x AS HUGEINT) AS xh FROM (
              SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
              FROM events) a) t
          GROUP BY 1) sums) m
      ORDER BY event_type""",
    // The oracle recomputes BOTH levels with plain COUNT(DISTINCT) —
    // equality proves every bitmap word exact, including the OR-merge
    // of daily partials into the full-range distinct.
    "q208_bitmap_distinct" -> """
      WITH e AS (
        SELECT event_type,
          CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
            AS d,
          user_id
        FROM events),
      daily AS (
        SELECT event_type, d, count(DISTINCT user_id) AS nd
        FROM e GROUP BY 1, 2),
      tot AS (
        SELECT event_type, count(DISTINCT user_id) AS distinct_total
        FROM e GROUP BY 1)
      SELECT daily.event_type, count(1) AS n_days,
        CAST(sum(nd) AS BIGINT) AS sum_daily_distinct,
        CAST(max(nd) AS BIGINT) AS max_daily_distinct,
        CAST(min(t.distinct_total) AS BIGINT) AS distinct_total
      FROM daily JOIN tot t ON daily.event_type = t.event_type
      GROUP BY 1
      ORDER BY 1""",
    // Identical expression trees cell by cell: expected =
    // (rowΣ·colΣ)/grand, contribution = (o−e)·(o−e)/e — explicit
    // product, not pow(); the sole float addition is the final
    // two-term chi_early + chi_late in the written order.
    "q202_drift_chisq" -> """
      WITH e AS (
        SELECT event_type,
          CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
        FROM events),
      mm AS (SELECT (min(s) + max(s)) // 2 AS mid FROM e),
      bytype AS (
        SELECT event_type,
          CAST(sum(CASE WHEN s < mid THEN 1 ELSE 0 END) AS BIGINT)
            AS o_early,
          CAST(sum(CASE WHEN s >= mid THEN 1 ELSE 0 END) AS BIGINT)
            AS o_late
        FROM e CROSS JOIN mm GROUP BY 1),
      bt AS (
        SELECT event_type, o_early, o_late,
          CAST(sum(o_early) OVER () AS BIGINT) AS t_early,
          CAST(sum(o_late) OVER () AS BIGINT) AS t_late
        FROM bytype)
      SELECT event_type, o_early, o_late, e_early, e_late,
        CASE WHEN e_early > 0 THEN (CAST(o_early AS DOUBLE) - e_early)
          * (CAST(o_early AS DOUBLE) - e_early) / e_early END AS chi_early,
        CASE WHEN e_late > 0 THEN (CAST(o_late AS DOUBLE) - e_late)
          * (CAST(o_late AS DOUBLE) - e_late) / e_late END AS chi_late,
        CASE WHEN e_early > 0 THEN (CAST(o_early AS DOUBLE) - e_early)
          * (CAST(o_early AS DOUBLE) - e_early) / e_early END
        + CASE WHEN e_late > 0 THEN (CAST(o_late AS DOUBLE) - e_late)
          * (CAST(o_late AS DOUBLE) - e_late) / e_late END AS chi_type
      FROM (
        SELECT event_type, o_early, o_late,
          CAST((o_early + o_late) * t_early AS DOUBLE)
            / CAST(t_early + t_late AS DOUBLE) AS e_early,
          CAST((o_early + o_late) * t_late AS DOUBLE)
            / CAST(t_early + t_late AS DOUBLE) AS e_late
        FROM bt) x
      ORDER BY event_type""",
    // Weekday pinned Monday=0 on both engines (isodow−1 here, weekday()
    // in Spark); the seasonal index is one division of exact products.
    "q204_seasonal_profile" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      bydow AS (
        SELECT CAST(isodow(day) - 1 AS BIGINT) AS dow,
          count(1) AS n_days, sum(rev) AS rev_dow
        FROM daily GROUP BY 1),
      bd AS (
        SELECT dow, n_days, rev_dow,
          sum(rev_dow) OVER () AS rev_all,
          CAST(sum(n_days) OVER () AS BIGINT) AS days_all
        FROM bydow)
      SELECT dow, n_days,
        CAST(rev_dow AS DOUBLE) AS revenue,
        CAST(rev_dow AS DOUBLE) / n_days AS avg_day,
        (CAST(rev_dow AS DOUBLE) * days_all)
          / (CAST(rev_all AS DOUBLE) * n_days) AS seasonal_ratio
      FROM bd
      ORDER BY dow""",
    // Identical arithmetic, identical operand order: daily value =
    // decimal-sum / count as DOUBLE, interpolation
    // pv + (nv - pv) * (d - pd) / (nd - pd).
    "q199_interpolate" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT) AS d,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS v
        FROM events
        WHERE event_id % 23 = 0
        GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(d) AS d0, max(d) AS d1
        FROM daily GROUP BY 1),
      grid AS (
        SELECT s.event_type, gs.d
        FROM span s, LATERAL (SELECT unnest(generate_series(s.d0, s.d1)) AS d) gs),
      j AS (
        SELECT g.event_type, g.d, daily.v
        FROM grid g LEFT JOIN daily
          ON daily.event_type = g.event_type AND daily.d = g.d),
      f AS (
        SELECT event_type, d, v,
          last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM j)
      SELECT event_type, d AS day, v IS NOT NULL AS observed,
        round(COALESCE(v, pv + (nv - pv) * (d - pd) / (nd - pd)), 6) AS v
      FROM f
      ORDER BY event_type, day""",
    "q138_rolling_distinct" -> """
      WITH du AS (
        SELECT DISTINCT user_id,
          CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT) AS d
        FROM events),
      days AS (SELECT DISTINCT d AS day FROM du)
      SELECT days.day, count(DISTINCT du.user_id) AS n_users_7d
      FROM days JOIN du ON du.d BETWEEN days.day - 6 AND days.day
      GROUP BY 1
      ORDER BY 1""",
    "q137_cdc_compact" -> """
      SELECT user_id, event_type, event_id,
        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s, value
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rk
        FROM events)
      WHERE rk = 1
      ORDER BY user_id, event_type""",
    "q135_linear_attribution" -> """
      WITH e AS (
        SELECT event_id, user_id, event_type, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        FROM events),
      t AS (
        SELECT event_id, user_id, event_type, value,
          sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id ORDER BY t_us
            RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
            AS n_touches
        FROM e)
      SELECT event_id, user_id,
        CAST(coalesce(n_touches, 0) AS BIGINT) AS n_touches,
        CASE WHEN n_touches > 0
          THEN CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) / n_touches
          ELSE 0.0 END AS credit_per_touch
      FROM t
      WHERE event_type = 'purchase'
      ORDER BY event_id""",
    "q127_time_weighted_avg" -> """
      WITH e AS (
        SELECT event_id, user_id, event_type, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        FROM events),
      d AS (
        SELECT event_type, value,
          lead(t_us, 1) OVER (PARTITION BY user_id
                              ORDER BY t_us, event_id) - t_us AS dt_us
        FROM e)
      SELECT event_type, count(1) AS n_intervals,
        CAST(sum(dt_us) AS BIGINT) AS total_dt_us,
        round(CAST(sum(CAST(value AS DECIMAL(18,2)) * dt_us) AS DOUBLE)
          / CAST(sum(dt_us) AS DOUBLE), 12) AS twa
      FROM d
      WHERE dt_us IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type""",
    "q124_attribution" -> """
      WITH e AS (
        SELECT event_id, user_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        FROM events)
      SELECT event_id, user_id, t_us AS purchase_us, last_view_us,
        t_us - last_view_us AS latency_us
      FROM (
        SELECT e.*,
          max(CASE WHEN event_type = 'view' THEN t_us END)
            OVER (PARTITION BY user_id ORDER BY t_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS last_view_us
        FROM e) t
      WHERE event_type = 'purchase'
      ORDER BY event_id""",
    "q125_share_of_total" -> """
      WITH rev AS (
        SELECT r_name, n_name,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
        CAST(rev AS DOUBLE)
          / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE) AS share
      FROM rev
      ORDER BY r_name, n_name""",
    "q100_gap_fill" -> """
      WITH e AS (
        SELECT event_type,
          CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
            // 3600 * 3600 AS hr,
          value
        FROM events),
      h AS (
        SELECT event_type, hr, count(1) AS n_obs,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        FROM e GROUP BY 1, 2),
      s AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e),
      g AS (
        SELECT t.event_type, unnest(generate_series(s.h0, s.h1, 3600)) AS hr
        FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN s)
      SELECT g.event_type, g.hr,
        coalesce(h.n_obs, 0) AS n_obs,
        coalesce(last_value(h.sum_v IGNORE NULLS) OVER (
          PARTITION BY g.event_type ORDER BY g.hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
          AS filled_sum
      FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr
      ORDER BY g.event_type, g.hr""",
    "q101_anomaly_zscore" -> """
      WITH m AS (
        SELECT event_type, count(1) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
            AS DOUBLE) AS s2
        FROM events GROUP BY 1),
      f AS (
        SELECT e.event_type, e.event_id,
          (e.value > m.s1 / m.n + 2.0 * sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
           OR e.value < m.s1 / m.n - 2.0 * sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)))
            AS is_anom
        FROM events e JOIN m USING (event_type))
      SELECT event_type, count(1) AS n_events,
        CAST(sum(CASE WHEN is_anom THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        CAST(min(CASE WHEN is_anom THEN event_id END) AS BIGINT) AS first_anom,
        CAST(max(CASE WHEN is_anom THEN event_id END) AS BIGINT) AS last_anom
      FROM f
      GROUP BY event_type
      ORDER BY event_type""",
    "q97_histogram" -> """
      WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
      SELECT event_type,
        CAST(least(floor((value - s.vmin) / ((s.vmax - s.vmin) / 20.0)), 19)
          AS BIGINT) AS bucket,
        count(1) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN s
      GROUP BY 1, 2
      ORDER BY event_type, bucket""",
    "q98_transitions" -> """
      WITH t AS (
        SELECT event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        FROM events)
      SELECT event_type AS from_type, next_type AS to_type, count(1) AS n
      FROM t
      WHERE next_type IS NOT NULL
      GROUP BY 1, 2
      ORDER BY from_type, to_type""",
    "q92_funnel" -> """
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu
        FROM events),
      v AS (
        SELECT user_id, min(tsu) AS t0 FROM e
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, v.t0, min(e.tsu) AS t1
        FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.tsu > v.t0
        GROUP BY 1, 2),
      p AS (
        SELECT e.user_id, c.t0, min(e.tsu) AS t2
        FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tsu > c.t1
        GROUP BY 1, 2)
      SELECT '1_view' AS stage, count(1) AS n_users,
        avg(0) AS avg_lag_s FROM v
      UNION ALL
      SELECT '2_click', count(1),
        avg(CAST(floor(epoch(t1)) AS BIGINT)
          - CAST(floor(epoch(t0)) AS BIGINT)) FROM c
      UNION ALL
      SELECT '3_purchase', count(1),
        avg(CAST(floor(epoch(t2)) AS BIGINT)
          - CAST(floor(epoch(t0)) AS BIGINT)) FROM p
      ORDER BY stage""",
    "q93_retention" -> """
      WITH e AS (
        SELECT user_id,
          CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 604800) AS BIGINT) AS wk
        FROM events),
      cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
      SELECT c.cohort_wk, e.wk - c.cohort_wk AS wk_offset,
        count(DISTINCT e.user_id) AS n_users
      FROM e JOIN cohort c USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_wk, wk_offset""",
    "q27_json_extract" -> """
      SELECT event_type, count(1) AS n,
        CAST(sum(k) AS BIGINT) AS sum_k,
        avg(k) AS avg_k,
        CAST(min(k) AS BIGINT) AS min_k,
        CAST(max(k) AS BIGINT) AS max_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type""",
    "q28_array_fns" -> """
      SELECT vec_id, label,
        CAST(len(embedding) AS BIGINT) AS dim,
        CAST(embedding[1] AS DOUBLE) AS first,
        round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, x) -> a + x), 4) AS vsum,
        round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)), 4) AS l2norm
      FROM embeddings
      ORDER BY vec_id""",
    "q29_tumbling_window" -> """
      SELECT CAST(floor(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS ws,
        event_type, count(1) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY ws, event_type""",
    "q30_sliding_window" -> """
      SELECT (CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT) - i) * 900 AS ws,
        count(1) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) offs
      GROUP BY 1
      ORDER BY ws""",
    "q31_session_window" -> """
      WITH e AS (
        SELECT user_id, value, CAST(ts AS TIMESTAMP) AS tsu, event_id FROM events),
      flagged AS (
        SELECT user_id, value, tsu,
          CASE WHEN lag(tsu) OVER w IS NULL
                 OR tsu - lag(tsu) OVER w >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      sessions AS (
        SELECT user_id, value, tsu,
          sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id,
        CAST(floor(epoch(min(tsu))) AS BIGINT) AS session_start,
        count(1) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sessions
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",
    "q32_dedup_exact" -> """
      SELECT user_id, event_type, event_id,
        CAST(floor(epoch(tsu)) AS BIGINT) AS ts_s, value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY tsu, event_id) AS rn
        FROM (SELECT *, CAST(ts AS TIMESTAMP) AS tsu FROM events) e) t
      WHERE rn = 1
      ORDER BY user_id, event_type""",
    "q65_map_fns" -> """
      WITH t AS (
        SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          user_id AS u,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
      SELECT event_type,
        count(1) AS n,
        CAST(sum(k) AS BIGINT) AS sum_k,
        CAST(4 * count(1) AS BIGINT) AS n_entries,
        CAST(sum(k + u + cents) AS BIGINT) AS sum_vals,
        CAST(sum((CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
               + (CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END)
               + (CASE WHEN cents % 2 = 0 THEN 1 ELSE 0 END)) AS BIGINT)
          AS n_even_vals,
        CAST(sum(2 * (k + u + cents)) AS BIGINT) AS sum_doubled,
        count(1) AS n_has_user,
        min('cents,k,one,user') AS keys_csv
      FROM t
      GROUP BY event_type
      ORDER BY event_type""",
  )
}
