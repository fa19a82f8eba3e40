package graft.streaming

import graft.cube.{CubeConfig, CubeManager}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, StructType}

/** The reference's steady-state loop (change-stream ingestion → buffered
  * deltas → fold into the aggregate collection → persist resume token)
  * re-expressed as Structured Streaming:
  *
  * - change stream      → file/`readStream` source (micro-batches)
  * - oplog buffer       → the micro-batch itself
  * - incremental fold   → streaming `groupBy(dims).agg(...)` — Spark's
  *   state store IS the aggregate collection, updated per batch
  * - resume token       → `checkpointLocation` (offsets + state)
  * - stop/start verbs   → `StreamingQuery.stop()` / restart from
  *   checkpoint
  *
  * The aggregation plan is the same one `CubeManager.create` builds for
  * batch — one definition, two execution modes; the equivalence
  * (streamed-in-N-batches == batch recompute) is asserted in
  * StreamingSpec. At scale the state store shards by the dimension-key
  * hash across executors exactly like the batch shuffle, and RocksDB
  * state backend + watermarking bound memory for high-cardinality
  * cubes. */
object StreamingCube {

  /** The one streaming cube aggregation both sinks share: the SAME plan
    * `CubeManager.create` builds for batch, over a file-stream of
    * parquet delta files (`maxFilesPerTrigger=1` makes each file one
    * micro-batch — the "oplog buffer flush" unit). Sketch measures ride
    * the same streaming aggregation: the HLL/KLL buffer lives in the
    * state store per group, merged per micro-batch
    * (TypedImperativeAggregate buffers serialize into streaming state
    * like any partial aggregate). */
  private def cubeAgg(
      spark: SparkSession,
      config: CubeConfig,
      sourceDir: String,
      schema: StructType): DataFrame = {
    // dictionary bitmaps need the append-only key dictionary extended
    // per batch — a streaming AGGREGATION has nowhere to do that.
    // They are still stream-maintainable: CubeService.startAutoUpdate
    // routes dictionary cubes to a foreachBatch per-batch fold that
    // extends the dictionary durably before each fold. Gate BEFORE the
    // source is built so the refusal beats any path/schema analysis.
    require(config.dictBitmaps.isEmpty,
      s"cube '${config.name}' maintains dictionary bitmaps — the " +
        "complete-mode streaming aggregation cannot extend the key " +
        "dictionary; use CubeService.startAutoUpdate (per-batch fold) " +
        "or fold deltas through CubeService.updateAggregates")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
    // same honesty gate as the batch create: a stream-only pipeline
    // with a non-integral bitmap column must refuse, not silently
    // serve lossy "exact" distinct counts
    graft.cube.CubeManager.requireIntegralBitmaps(config, stream)
    val sums = config.measures.map(m =>
      sum(col(m.path).cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as(m.id))
    val sks = config.sketches.map(m =>
      hll_sketch_agg(col(m.path), graft.cube.CubeManager.SketchLgK).as(m.id))
    val qs = config.quantiles.map(m =>
      graft.functions.Kll.sketchAgg(col(m.path).cast("double")).as(m.id))
    // min/max partials: the file stream is insert-only (the R2 shape),
    // so plain min/max per group matches CubeManager.create exactly
    val exts = config.extremes.flatMap(m => Seq(
      min(col(m.path)).as(s"${m.id}_min"),
      max(col(m.path)).as(s"${m.id}_max")))
    // freq partials stream the same way: the CMS counter buffer and the
    // candidate heap serialize into streaming state per group, exactly
    // the batch create's aggregates
    val fqs = config.freq.flatMap(m => Seq(
      graft.functions.CountMinSketch.sketch(col(m.path)).as(m.id),
      org.apache.spark.sql.functions.transform(
        graft.functions.CountMinSketch
          .approxTopK(col(m.path), CubeManager.FreqCand),
        s => s.getField("key")).as(s"${m.id}_cand")))
    // bitmap partials stream like the sketches — the (block → word) map
    // buffer serializes into streaming state per group, and since the
    // union is LOSSLESS the stream-maintained cube serves EXACT distinct
    // counts (the one distinct family where streamed == batch is
    // hash-equal, pinned in CubeServiceSpec)
    val bms = config.bitmaps.map(m =>
      graft.functions.Bitmap.setAgg(col(m.path).cast("long")).as(m.id))
    // weighted (per-id additive) partials stream the same way: the
    // (id → count, weight) map buffer serializes into streaming state
    // per group, pointwise addition is lossless, and the file stream
    // is insert-only (+1 per row) — streamed == batch is hash-equal
    graft.cube.CubeManager.requireIntegralWeighted(config, stream)
    val wms = config.weighted.map(m =>
      graft.functions.WeightMap.buildAgg(col(m.idPath).cast("long"),
        lit(1L), graft.functions.WeightMap.scaled(col(m.weightPath)))
        .as(m.id))
    // `_count` is always present, so the combined list is never empty
    // even for a sums-free config (e.g. a weighted-only cube)
    val all = sums ++ sks ++ qs ++ exts ++ fqs ++ bms ++ wms :+
      count(lit(1)).as(CubeManager.CountCol)
    stream
      .groupBy(config.dimCols: _*)
      .agg(all.head, all.tail: _*)
  }

  /** Start a streaming cube over a directory of parquet delta files.
    * Complete output mode publishes the whole cube to the in-memory
    * table `name` after every batch. */
  def start(
      spark: SparkSession,
      config: CubeConfig,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String,
      name: String): StreamingQuery =
    cubeAgg(spark, config, sourceDir, schema).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Same fold, DURABLE sink: after every micro-batch the complete-mode
    * state (the whole stream-side cube) is handed to `publish`, which
    * lands it in cube storage — the steady-state loop CubeService wires
    * to its two-rename swap so `getAggregates`/`getRolling` serve the
    * maintained cube while the stream runs. Complete mode means the
    * published table is a pure function of (base snapshot, all stream
    * data so far): batch replays after a crash re-publish the same
    * state — idempotent by construction, no delta double-count
    * possible. */
  def startPersist(
      spark: SparkSession,
      config: CubeConfig,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String,
      publish: DataFrame => Unit): StreamingQuery =
    cubeAgg(spark, config, sourceDir, schema).writeStream
      .outputMode("complete")
      .foreachBatch((batchState: DataFrame, _: Long) => publish(batchState))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Full MongoDB-style delete/update fidelity in streaming: deltas
    * carry a `_sign` column (+1 insert / −1 delete; update = pair) and
    * `flatMapGroupsWithState` maintains (measure-sum, row-count) per
    * dimension tuple, emitting the group's new state each batch and
    * dropping state when its count reaches zero — the streaming twin of
    * `CubeManager.applyDeltas` (reference R3). State is sharded by group
    * key across executors; cents-as-long arithmetic keeps the fold exact
    * and order-independent. */
  def startSigned(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      dimCol: String,
      measureCol: String,
      checkpointDir: String,
      name: String): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .select(col(dimCol).cast("string").as("k"),
        // exact cents so streaming state never accumulates float drift
        (col(measureCol).cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("_sign").cast("long").as("sign"))
      .as[(String, Long, Long)]
    val folded = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Double, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val (s0, c0) = state.getOption.getOrElse((0L, 0L))
          var s = s0; var c = c0
          rows.foreach { case (_, cents, sign) =>
            s += sign * cents; c += sign
          }
          if (c == 0) {
            // emptied group: identical to a from-scratch recompute
            state.remove()
            Iterator.empty
          } else if (c < 0) {
            // over-deletion: keep the debt as tombstone state (hidden
            // from output) so a later insert nets correctly — the
            // streaming twin of CubeManager.applyDeltas' tombstones
            state.update((s, c))
            Iterator.empty
          } else {
            state.update((s, c))
            Iterator.single((key, s / 100.0, c))
          }
      }
      .toDF("k", "measure_sum", "n")
    folded.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Tumbling-window aggregation with a watermark: late events (older
    * than `delay` behind the max seen ts) are dropped, and windows are
    * emitted only once finalized (append mode) — the streaming form of
    * EventQueries.q29. */
  def startWindowed(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      tsCol: String,
      delay: String,
      windowLen: String,
      checkpointDir: String,
      name: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Streaming exact dedup within a watermark: the streaming form of
    * EventQueries.q32 (state for a key is dropped once the watermark
    * passes, bounding memory on an infinite stream). */
  def startDedup(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      tsCol: String,
      delay: String,
      keys: Seq[String],
      checkpointDir: String,
      name: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
    stream
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
