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

  lazy val defs: Map[String, Q] = Map(
    "q27_json_extract" -> q27JsonExtract,
    "q28_array_fns" -> q28ArrayFns,
    "q29_tumbling_window" -> q29TumblingWindow,
    "q30_sliding_window" -> q30SlidingWindow,
    "q31_session_window" -> q31SessionWindow,
    "q32_dedup_exact" -> q32DedupExact,
    "q65_map_fns" -> q65MapFns,
  )

  lazy val sql: Map[String, String] = Map(
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
