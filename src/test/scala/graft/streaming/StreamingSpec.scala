package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.cube.{CubeConfig, CubeManager, FieldDim, Measure, TimeDim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming demonstrators (SURVEY.md §7.1-4): the cube maintained by
  * Structured Streaming micro-batches equals the batch recompute;
  * watermarks drop late data; streaming dedup keeps one row per key;
  * checkpoint restart resumes without reprocessing. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val cfg = CubeConfig("s", "mem",
    Seq(FieldDim("etype", "event_type"), TimeDim("hour", "ts", "hour")),
    Seq(Measure("v", "value")))

  private def eventRows(n: Int, seed: Int): Seq[(String, Timestamp, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (Seq("click", "view", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(8) * 3600000L
          + rnd.nextInt(3600000)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
  }

  private def toDf(rows: Seq[(String, Timestamp, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "ts", "value")
  }

  test("streaming cube over N micro-batches == batch recompute") {
    val src = tmp("graft_stream_src")
    val all = eventRows(300, seed = 11)
    // five delta files = five micro-batches
    all.grouped(60).zipWithIndex.foreach { case (chunk, i) =>
      toDf(chunk).coalesce(1).write.parquet(s"$src/batch_$i")
    }
    val schema = toDf(all.take(1)).schema
    val q = StreamingCube.start(spark, cfg, s"$src/batch_*", schema,
      tmp("graft_ckpt"), "cube_stream")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cube_stream").collect()
      .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    val batch = CubeManager.create(cfg, toDf(all)).aggregates.collect()
      .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    assert(streamed == batch)
  }

  test("streaming cube with an HLL sketch measure == batch distinct estimates") {
    import graft.cube.Measure
    val src = tmp("graft_sk_src")
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map { _ =>
      (Seq("click", "view", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(4) * 3600000L),
        1.0, rnd.nextInt(40).toLong)
    }
    import spark.implicits._
    def df(rs: Seq[(String, Timestamp, Double, Long)]): DataFrame =
      rs.toDF("event_type", "ts", "value", "user_id")
    rows.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      df(chunk).coalesce(1).write.parquet(s"$src/b$i")
    }
    val skCfg = cfg.copy(name = "sks",
      sketches = Seq(Measure("users", "user_id")))
    val q = StreamingCube.start(spark, skCfg, s"$src/b*", df(rows.take(1)).schema,
      tmp("graft_sk_ckpt"), "skcube_stream")
    q.processAllAvailable()
    q.stop()
    def est(frame: DataFrame): Map[(String, Long), Long] = frame
      .select(col("etype"), col("hour"),
        hll_sketch_estimate(col("users")).as("nd"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Timestamp](1).getTime) ->
        r.getAs[Long]("nd")).toMap
    val streamed = est(spark.table("skcube_stream"))
    val batch = est(graft.cube.CubeManager.create(skCfg, df(rows)).aggregates)
    assert(streamed == batch && batch.nonEmpty,
      "per-group streamed sketch estimates must equal the batch cube's")
  }

  test("streaming cube with a weighted measure == batch weight maps") {
    import graft.cube.WeightedMeasure
    val src = tmp("graft_wm_src")
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { _ =>
      (Seq("click", "view", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(4) * 3600000L),
        math.round(rnd.nextDouble() * 1000) / 100.0,
        rnd.nextInt(40).toLong)
    }
    import spark.implicits._
    def df(rs: Seq[(String, Timestamp, Double, Long)]): DataFrame =
      rs.toDF("event_type", "ts", "value", "user_id")
    rows.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      df(chunk).coalesce(1).write.parquet(s"$src/b$i")
    }
    val wmCfg = cfg.copy(name = "wms", measures = Nil,
      weighted = Seq(WeightedMeasure("ltv", "user_id", "value")))
    val q = StreamingCube.start(spark, wmCfg, s"$src/b*",
      df(rows.take(1)).schema, tmp("graft_wm_ckpt"), "wmcube_stream")
    q.processAllAvailable()
    q.stop()
    // the canonical byte form makes stream == batch BIT-equal per cell
    // (pointwise addition is order-independent across micro-batches)
    def blobs(frame: DataFrame): Map[(String, Long), Seq[Byte]] = frame
      .collect()
      .map(r => (r.getAs[String]("etype"),
        r.getAs[Timestamp]("hour").getTime) ->
        r.getAs[Array[Byte]]("ltv").toSeq).toMap
    val streamed = blobs(spark.table("wmcube_stream"))
    val batch =
      blobs(graft.cube.CubeManager.create(wmCfg, df(rows)).aggregates)
    assert(streamed == batch && batch.nonEmpty,
      "per-cell streamed weight maps must equal the batch cube's")
  }

  test("streaming cube with a freq measure == batch CMS counters + top-k") {
    import graft.cube.{CubeManager, FieldDim, Measure}
    val src = tmp("graft_fq_src")
    val words = Seq("alpha", "beta", "gamma", "delta")
    // well-separated frequencies so the candidate heap is merge-order
    // stable; the COUNTERS are exact under any merge order regardless
    val rows = for {
      g <- Seq("x", "y"); (w, i) <- words.zipWithIndex
      _ <- 0 until (5 - i) * (5 - i)
    } yield (g, w, 1.0)
    import spark.implicits._
    def df(rs: Seq[(String, String, Double)]): DataFrame =
      rs.toDF("grp", "word", "value")
    val shuffled = new scala.util.Random(7).shuffle(rows)
    shuffled.grouped(30).zipWithIndex.foreach { case (chunk, i) =>
      df(chunk).coalesce(1).write.parquet(s"$src/b$i")
    }
    val fqCfg = graft.cube.CubeConfig("fqs", "mem",
      Seq(FieldDim("g", "grp")), Seq(Measure("v", "value")),
      freq = Seq(Measure("w", "word")))
    val q = StreamingCube.start(spark, fqCfg, s"$src/b*",
      df(rows.take(1)).schema, tmp("graft_fq_ckpt"), "fqcube_stream")
    q.processAllAvailable()
    q.stop()
    def counters(frame: DataFrame): Map[String, Seq[Long]] = frame
      .collect().map(r =>
        r.getAs[String]("g") -> r.getSeq[Long](r.fieldIndex("w"))).toMap
    def topk(frame: DataFrame): Seq[(String, String, Long)] = frame
      .groupBy(col("g"))
      .agg(graft.functions.CountMinSketch.mergeSketches(col("w")).as("sk"),
        sort_array(array_distinct(flatten(
          collect_list(col("w_cand"))))).as("cand"))
      .select(col("g"), explode(graft.functions.CountMinSketch
        .topkFromMerged(col("sk"), col("cand"), 2)).as("t"))
      .select(col("g"), col("t.key"), col("t.n_est"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    val streamed = spark.table("fqcube_stream")
    val batch = CubeManager.create(fqCfg, df(rows)).aggregates
    assert(counters(streamed) == counters(batch) && counters(batch).nonEmpty,
      "streamed CMS counters must equal the batch cube's (lossless merge)")
    assert(topk(streamed) == topk(batch),
      "top-k served from the streamed cells diverged from batch")
  }

  test("rolling 7-day distinct served from a stream-maintained daily HLL cube") {
    // the q139 claim end-to-end: a streaming cube keeps ONE HLL partial
    // per day (new events only fold into their day's sketch); the WAU
    // curve is then a read-side merge of <=7 one-row sketches per
    // endpoint — never a re-scan of the event log
    import graft.cube.Measure
    val src = tmp("graft_roll_src")
    val rnd = new scala.util.Random(41)
    val rows = (0 until 600).map { _ =>
      ("e", new Timestamp(1700000000000L
          + rnd.nextInt(12) * 86400000L + rnd.nextInt(86400000)),
        1.0, rnd.nextInt(80).toLong)
    }
    import spark.implicits._
    def df(rs: Seq[(String, Timestamp, Double, Long)]): DataFrame =
      rs.toDF("event_type", "ts", "value", "user_id")
    rows.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      df(chunk).coalesce(1).write.parquet(s"$src/b$i")
    }
    val rollCfg = CubeConfig("roll", "mem",
      Seq(TimeDim("day", "ts", "day")), Seq(Measure("v", "value")),
      sketches = Seq(Measure("users", "user_id")))
    val q = StreamingCube.start(spark, rollCfg, s"$src/b*",
      df(rows.take(1)).schema, tmp("graft_roll_ckpt"), "rollcube_stream")
    q.processAllAvailable()
    q.stop()
    def rolling(daily: DataFrame): Map[Long, Long] =
      graft.functions.Rolling.endpoints(daily.select(
          (unix_timestamp(col("day")).cast("double") / 86400)
            .cast("long").as("d"), col("users")))
        .agg(hll_sketch_estimate(hll_union_agg(col("users"))).as("est"))
        .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("est")).toMap
    val streamed = rolling(spark.table("rollcube_stream"))
    val batch = rolling(CubeManager.create(rollCfg, df(rows)).aggregates)
    assert(streamed == batch && streamed.nonEmpty,
      "rolling merge over stream-maintained partials must equal the batch cube's")
    // and the curve tracks the exact rolling distinct of the raw log
    val exact = graft.functions.Rolling.endpoints(
        df(rows).select(col("user_id"),
          (unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").as("d")).distinct())
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n")).toMap
    assert(streamed.keySet == exact.keySet)
    exact.foreach { case (day, n) =>
      assert(math.abs(streamed(day) - n) <= math.max(n * 0.05, 2.0),
        s"day $day: streamed rolling estimate ${streamed(day)} vs exact $n")
    }
  }

  test("watermark drops events later than the delay") {
    val src = tmp("graft_late_src")
    def hourStart(ms: Long): Long = ms - ms % 3600000L
    val onTime = Seq(
      ("click", new Timestamp(1700000000000L + 3 * 3600000L), 1.0),
      ("click", new Timestamp(1700000000000L + 4 * 3600000L), 1.0))
    // 4 hours behind the max seen event time, watermark is 10 minutes
    val late = Seq(("click", new Timestamp(1700000000000L), 9.0))
    val flush = Seq(("click", new Timestamp(1700000000000L + 6 * 3600000L), 1.0))
    val schema = toDf(onTime).schema
    toDf(onTime).coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingCube.startWindowed(spark, s"$src/f*", schema,
      "ts", "10 minutes", "1 hour", tmp("graft_ckpt_w"), "late_stream")
    q.processAllAvailable() // batch 1: on-time → watermark = max(ts) − 10 min
    toDf(late).coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable() // batch 2: late event, behind watermark → dropped
    toDf(flush).coalesce(1).write.parquet(s"$src/f2")
    q.processAllAvailable() // batch 3: advances watermark, finalizes windows
    q.stop()
    val finalized = spark.table("late_stream").collect()
      .map(r => r.getAs[Timestamp]("ws").getTime).toSet
    assert(finalized.contains(hourStart(1700000000000L + 3 * 3600000L)))
    assert(finalized.contains(hourStart(1700000000000L + 4 * 3600000L)))
    assert(!finalized.contains(hourStart(1700000000000L)),
      "late event window must be dropped")
  }

  test("streaming dedup within watermark keeps first row per key") {
    val src = tmp("graft_dedup_src")
    val rows = Seq(
      ("a", new Timestamp(1700000000000L), 1.0),
      ("a", new Timestamp(1700000001000L), 2.0), // dup key within watermark
      ("b", new Timestamp(1700000002000L), 3.0))
    toDf(rows).coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingCube.startDedup(spark, s"$src/f*", toDf(rows).schema,
      "ts", "1 hour", Seq("event_type"), tmp("graft_ckpt_d"), "dedup_stream")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream").collect()
      .map(r => r.getAs[String]("event_type"))
    assert(out.sorted.toSeq == Seq("a", "b"))
  }

  test("signed-delta flatMapGroupsWithState == batch signed fold, deletes drop state") {
    import org.apache.spark.sql.types._
    val src = tmp("graft_signed_src")
    // batch 1: inserts; batch 2: deletes for 'view' (all of them) + more inserts
    val b1 = Seq(("click", 1.50, 1L), ("click", 2.25, 1L), ("view", 4.00, 1L))
    val b2 = Seq(("view", 4.00, -1L), ("click", 0.25, 1L))
    import spark.implicits._
    b1.toDF("event_type", "value", "_sign").coalesce(1)
      .write.parquet(s"$src/f0")
    val schema = StructType(Seq(StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("_sign", LongType)))
    val q = StreamingCube.startSigned(spark, s"$src/f*", schema,
      "event_type", "value", tmp("graft_ckpt_s"), "signed_stream")
    q.processAllAvailable()
    b2.toDF("event_type", "value", "_sign").coalesce(1)
      .write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends each batch's updates: last row per
    // key is the live state; keys whose count hit zero emit nothing more
    val rows = spark.sql(
      "SELECT * FROM signed_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val lastClick = rows.filter(_._1 == "click").last
    assert(lastClick == ("click", 4.00, 3L))
    // 'view' was fully deleted in batch 2: no new emission, state removed
    val viewRows = rows.filter(_._1 == "view")
    assert(viewRows.toSeq == Seq(("view", 4.00, 1L)),
      s"view must emit only its batch-1 state, got ${viewRows.toSeq}")
  }

  test("signed streaming: over-deletion tombstone nets against later inserts") {
    import org.apache.spark.sql.types._
    val src = tmp("graft_tomb_src")
    import spark.implicits._
    val schema = StructType(Seq(StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("_sign", LongType)))
    // batch 1: one insert; batch 2: TWO deletes (over-deletion, net -1);
    // batch 3: two inserts — from-scratch net: 1 -2 +2 = +1 row, sum 5.0
    Seq(("buy", 5.00, 1L)).toDF("event_type", "value", "_sign")
      .coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingCube.startSigned(spark, s"$src/f*", schema,
      "event_type", "value", tmp("graft_ckpt_tomb"), "tomb_stream")
    q.processAllAvailable()
    Seq(("buy", 5.00, -1L), ("buy", 5.00, -1L))
      .toDF("event_type", "value", "_sign")
      .coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    Seq(("buy", 5.00, 1L), ("buy", 5.00, 1L))
      .toDF("event_type", "value", "_sign")
      .coalesce(1).write.parquet(s"$src/f2")
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM tomb_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // batch 2 (negative state) must emit nothing; batch 3 must emit the
    // netted state (5.0, 1), NOT a restarted-from-zero (10.0, 2)
    assert(rows.last == ("buy", 5.00, 1L),
      s"tombstone netting broken, got ${rows.toSeq}")
  }

  test("streaming near-dup dedup: in-batch, cross-batch, and unique docs") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val src = tmp("graft_neardup_src")
    val idx = tmp("graft_neardup_idx") + "/index"
    val out = tmp("graft_neardup_out") + "/out"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different words about spark streaming state stores"
    val textC = "a third unrelated document mentioning cubes and aggregates here"
    // batch 0: doc 1 (A), doc 2 (B), doc 3 (copy of A) -> 3 dups doc 1
    Seq((1L, textA), (2L, textB), (3L, textA))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingDedup.start(spark, s"$src/f*", schema, idx, out,
      tmp("graft_neardup_ckpt"))
    q.processAllAvailable()
    // batch 1: doc 10 (copy of A -> dups history), doc 11 (C -> unique)
    Seq((10L, textA), (11L, textC))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    val survivors = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 11L),
      s"expected {1, 2, 11}, got $survivors")
    // the index holds ONLY the retained docs' band keys
    val indexed = spark.read.parquet(idx)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 11L))
  }

  test("streaming near-dup dedup: micro-batch replay is idempotent") {
    import spark.implicits._
    val idx = tmp("graft_neardup_replay_idx") + "/index"
    val out = tmp("graft_neardup_replay_out") + "/out"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different words about spark streaming state stores"
    val b0 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val textC = "a third unrelated document mentioning cubes and aggregates here"
    val b1 = Seq((10L, textA), (11L, textC)).toDF("doc_id", "text")
    StreamingDedup.dedupBatch(b0, 0L, idx, out)
    StreamingDedup.dedupBatch(b1, 1L, idx, out)
    val once = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val idxOnce = spark.read.parquet(idx)
      .select("doc_id", "band", "bh").collect().map(_.toString).sorted.toSeq
    // foreachBatch is at-least-once: replay batch 1 (crash-before-
    // checkpoint-commit). Sink rows and index keys must NOT duplicate,
    // and the replay must not see its own prior keys as history (which
    // would drop doc 10's survivor decision differently).
    StreamingDedup.dedupBatch(b1, 1L, idx, out)
    val twice = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val idxTwice = spark.read.parquet(idx)
      .select("doc_id", "band", "bh").collect().map(_.toString).sorted.toSeq
    assert(once == twice, s"sink changed on replay: $once -> $twice")
    assert(idxOnce == idxTwice, "index changed on replay")
    assert(once == Seq(1L, 2L, 11L), s"unexpected survivors: $once")
  }

  test("streaming cube folds KLL quantile measures across micro-batches") {
    import graft.cube.{CubeConfig, FieldDim, Measure}
    import spark.implicits._
    val src = tmp("graft_kllstream_src")
    val cfgQ = CubeConfig("sq", "mem",
      Seq(FieldDim("etype", "event_type")),
      Seq(Measure("v", "value")),
      quantiles = Seq(Measure("dist", "value")))
    def batch(lo: Int, hi: Int) =
      (lo to hi).map(i => ("a", new Timestamp(1700000000000L), i.toDouble))
        .toDF("event_type", "ts", "value")
    // 99 total values split across two micro-batches: the KLL buffer in
    // the state store stays sub-capacity (k=200), so the fold across
    // batches must read back EXACT — any state-store serialization or
    // merge defect shows as a wrong median, not noise
    batch(1, 50).coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingCube.start(spark, cfgQ, s"$src/f*",
      batch(1, 1).schema, tmp("graft_kllstream_ckpt"), "kll_stream")
    q.processAllAvailable()
    batch(51, 99).coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    val row = spark.table("kll_stream")
      .select(col("etype"),
        graft.functions.Kll.quantile(col("dist"), 0.5).as("p50"),
        col(graft.cube.CubeManager.CountCol))
      .collect().head
    assert(row.getString(0) == "a" && row.getLong(2) == 99L)
    assert(row.getDouble(1) == 50.0,
      s"cross-batch folded median ${row.getDouble(1)} != exact 50.0")
  }

  test("grouped CMS top-k folds across micro-batches == batch aggregate") {
    import spark.implicits._
    val src = tmp("graft_topk_src")
    val b0 = Seq(("en", "x"), ("en", "x"), ("en", "y"), ("de", "q"))
      .toDF("lang", "w")
    val b1 = Seq(("en", "x"), ("en", "z"), ("de", "q"), ("de", "r"))
      .toDF("lang", "w")
    b0.coalesce(1).write.parquet(s"$src/f0")
    val q = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/f*")
      .groupBy(col("lang"))
      .agg(graft.functions.CountMinSketch.approxTopK(col("w"), 2).as("top"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("topk_stream")
      .option("checkpointLocation", tmp("graft_topk_ckpt"))
      .start()
    q.processAllAvailable()
    b1.coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lang"), posexplode(col("top")))
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getStruct(2).getString(0), r.getStruct(2).getLong(1))).toSet
    val streamed = rows(spark.table("topk_stream"))
    // tiny key domain: CMS has no collisions and the candidate map is
    // under cap, so the streaming fold must EQUAL the batch aggregate
    val batch = rows(b0.unionByName(b1).groupBy(col("lang"))
      .agg(graft.functions.CountMinSketch.approxTopK(col("w"), 2).as("top")))
    assert(streamed == batch,
      s"streaming fold diverged: $streamed vs $batch")
    assert(streamed.contains(("en", 0, "x", 3L)), s"wrong counts: $streamed")
  }

  test("streaming survivorship fold == batch q126 on a replayed doc stream") {
    import graft.functions.Dedup
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_surv_src")
    val idx = tmp("graft_surv_idx") + "/index"
    val edges = tmp("graft_surv_edges") + "/edges"
    // replay the corpus as three doc_id-ranged files → three micro-batches
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val parts = Seq(
      docs.filter(col("doc_id") <= c1),
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      docs.filter(col("doc_id") > c2))
    parts.head.coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingSurvivors.start(spark, s"$src/f*", docs.schema, idx,
      edges, tmp("graft_surv_ckpt"))
    q.processAllAvailable()
    parts(1).coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    parts(2).coalesce(1).write.parquet(s"$src/f2")
    q.processAllAvailable()
    q.stop()
    // the folded edge set must equal batch pair mining over the drained
    // corpus — cross-batch pairs (mined at the later endpoint's batch)
    // must carry the COMPLETE common count, not just late shingles
    def pairSet(df: DataFrame) = df.select("da", "db", "common", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val streamedPairs = pairSet(spark.read.parquet(edges))
    val batchPairs = pairSet(Dedup.jaccardPairs(docs))
    assert(streamedPairs.nonEmpty, "replay produced no duplicate edges")
    assert(streamedPairs == batchPairs,
      s"stream-mined edges diverge: ${streamedPairs.size} vs ${batchPairs.size}")
    // and the read-side view equals batch q126 row for row
    val streamed = StreamingSurvivors.survivors(spark, edges, docs)
      .collect().map(_.toString).toSeq
    val batch = Dedup.q126DedupSurvivors(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(streamed == batch, "survivor view diverges from batch q126")
    // replay safety: re-folding the last micro-batch (crash before
    // checkpoint commit) must leave the edge set unchanged
    StreamingSurvivors.foldBatch(parts(2), 2L, idx, edges)
    assert(pairSet(spark.read.parquet(edges)) == streamedPairs,
      "edge partitions changed on micro-batch replay")
  }

  test("streaming passage-count fold == batch q148 on a replayed doc stream") {
    import graft.functions.TextAnalysis
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_pass_src")
    val counts = tmp("graft_pass_counts") + "/counts"
    // replay the corpus as three doc_id-ranged files → three micro-batches;
    // cross-batch duplicate passages force RETROACTIVE hotness (a passage
    // unique in batch 0 goes hot when its twin arrives in batch 2)
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val parts = Seq(
      docs.filter(col("doc_id") <= c1),
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      docs.filter(col("doc_id") > c2))
    parts.head.coalesce(1).write.parquet(s"$src/f0")
    val q = StreamingPassages.start(spark, s"$src/f*", docs.schema, counts,
      tmp("graft_pass_ckpt"))
    q.processAllAvailable()
    parts(1).coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    parts(2).coalesce(1).write.parquet(s"$src/f2")
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val streamed = rows(StreamingPassages.cleaned(spark, counts, docs))
    val batch = rows(TextAnalysis.q148PassageDedup(spark, sfDir))
    assert(streamed == batch, "cleaned view diverges from batch q148")
    // the retroactive case actually occurred: some passage crossed
    // batches (its global count ≥ 2 but no single batch saw it twice)
    val perBatchHot = spark.read.parquet(counts)
      .filter(col("n") >= 2).select("passage")
    val globalHot = spark.read.parquet(counts)
      .groupBy(col("passage")).agg(sum(col("n")).as("n"))
      .filter(col("n") >= 2).select("passage")
    assert(globalHot.join(perBatchHot, Seq("passage"), "left_anti").count() > 0,
      "replay produced no cross-batch duplicate passage — test is vacuous")
    // replay safety: re-folding the last micro-batch (crash before
    // checkpoint commit) must leave the view unchanged
    StreamingPassages.foldBatch(parts(2), 2L, counts)
    assert(rows(StreamingPassages.cleaned(spark, counts, docs)) == streamed,
      "count partitions changed on micro-batch replay")
  }

  test("streaming session window sessionizes per user with the 30m gap") {
    import org.apache.spark.sql.functions._
    val src = tmp("graft_sess_src")
    val rows = Seq(
      ("u1", new Timestamp(1700000000000L), 1.0),
      ("u1", new Timestamp(1700000000000L + 10 * 60000L), 2.0), // same session
      ("u1", new Timestamp(1700000000000L + 90 * 60000L), 3.0), // new session
      ("u2", new Timestamp(1700000000000L), 4.0))
    toDf(rows).toDF("user", "ts", "value").coalesce(1)
      .write.parquet(s"$src/f0")
    val q = spark.readStream
      .schema(toDf(rows).toDF("user", "ts", "value").schema)
      .parquet(s"$src/f*")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("session_window.start").as("ss"), col("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_stream")
      .option("checkpointLocation", tmp("graft_sess_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_stream").collect()
      .map(r => (r.getString(0), r.getAs[Timestamp]("ss").getTime,
        r.getLong(2))).toSet
    assert(got == Set(
      ("u1", 1700000000000L, 2L),
      ("u1", 1700000000000L + 90 * 60000L, 1L),
      ("u2", 1700000000000L, 1L)))
  }

  test("streaming cube runs on the RocksDB state store backend") {
    // the bounded-memory state backend a 100 TB deployment would use:
    // state spills to local RocksDB instead of living on the JVM heap
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = tmp("graft_rocks_src")
      val all = eventRows(120, seed = 17)
      all.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
        toDf(chunk).coalesce(1).write.parquet(s"$src/b$i")
      }
      val q = StreamingCube.start(spark, cfg, s"$src/b*", toDf(all).schema,
        tmp("graft_rocks_ckpt"), "rocks_cube")
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("rocks_cube").collect()
        .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
          BigDecimal(r.getAs[java.math.BigDecimal]("v")),
          r.getAs[Long]("_count"))).toSet
      val batch = CubeManager.create(cfg, toDf(all)).aggregates.collect()
        .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
          BigDecimal(r.getAs[java.math.BigDecimal]("v")),
          r.getAs[Long]("_count"))).toSet
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join matches the batch join") {
    import org.apache.spark.sql.functions._
    val src = tmp("graft_ssj")
    val clicks = Seq(
      ("u1", new Timestamp(1700000000000L), 1.0),
      ("u2", new Timestamp(1700000060000L), 2.0))
    val buys = Seq(
      ("u1", new Timestamp(1700000120000L), 10.0), // 2 min after click
      ("u2", new Timestamp(1700003600000L), 20.0)) // 59 min after: outside
    toDf(clicks).toDF("user", "cts", "cv").coalesce(1)
      .write.parquet(s"$src/clicks/f0")
    toDf(buys).toDF("buser", "bts", "bv").coalesce(1)
      .write.parquet(s"$src/buys/f0")
    val cStream = spark.readStream
      .schema(toDf(clicks).toDF("user", "cts", "cv").schema)
      .parquet(s"$src/clicks/f*").withWatermark("cts", "10 minutes")
    val bStream = spark.readStream
      .schema(toDf(buys).toDF("buser", "bts", "bv").schema)
      .parquet(s"$src/buys/f*").withWatermark("bts", "10 minutes")
    val joined = cStream.join(bStream,
      expr("""user = buser AND bts BETWEEN cts AND cts + INTERVAL 30 minutes"""))
    val q = joined.select(col("user"), col("cv"), col("bv"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_stream")
      .option("checkpointLocation", tmp("graft_ssj_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_stream").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set(("u1", 1.0, 10.0)),
      s"only the within-interval pair joins, got $got")
  }

  test("multi-batch stream-stream interval join == batch join (inner)") {
    import spark.implicits._
    val src = tmp("graft_ssj2")
    val rnd = new scala.util.Random(77)
    def rows(n: Int): Seq[(Long, Timestamp, Double)] = (0 until n).map { _ =>
      (rnd.nextInt(20).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(4 * 3600) * 1000L),
        math.round(rnd.nextDouble() * 1000) / 100.0)
    }
    val clicks = rows(80)
    val buys = rows(80)
    // three files per side = three micro-batches each, arrival order
    // uncorrelated with event time — the delay spans the whole range so
    // no state is evicted and stream must equal batch EXACTLY
    clicks.grouped(27).zipWithIndex.foreach { case (c, i) =>
      c.toDF("user_id", "ts", "value").coalesce(1)
        .write.parquet(s"$src/clicks/f$i")
    }
    buys.grouped(27).zipWithIndex.foreach { case (c, i) =>
      c.toDF("user_id", "ts", "value").coalesce(1)
        .write.parquet(s"$src/buys/f$i")
    }
    val schema = clicks.take(1).toDF("user_id", "ts", "value").schema
    val q = StreamingJoin.startIntervalJoin(spark, s"$src/clicks/f*",
      s"$src/buys/f*", schema, "24 hours", "1 HOUR",
      tmp("graft_ssj2_ckpt"), "ssj2_stream")
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getDouble(3))
    val streamed = spark.table("ssj2_stream").collect().map(key).sorted
    val batch = StreamingJoin.batchEquivalent(spark, s"$src/clicks/f*",
      s"$src/buys/f*", "1 HOUR").collect().map(key).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"stream ${streamed.length} rows vs batch ${batch.length}")
  }

  test("left-outer stream-stream join emits null matches after the watermark") {
    import spark.implicits._
    val src = tmp("graft_ssjo")
    val t0 = 1700000000000L
    val clicks = Seq(
      (1L, new Timestamp(t0), 0.0), // matched within the hour
      (2L, new Timestamp(t0), 0.0)) // never matched -> null row
    val buys = Seq((1L, new Timestamp(t0 + 600000L), 5.0))
    clicks.toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$src/clicks/f0")
    buys.toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$src/buys/f0")
    val schema = clicks.toDF("user_id", "ts", "value").schema
    val q = StreamingJoin.startIntervalJoin(spark, s"$src/clicks/f*",
      s"$src/buys/f*", schema, "10 minutes", "1 HOUR",
      tmp("graft_ssjo_ckpt"), "ssjo_stream", joinType = "left_outer")
    q.processAllAvailable()
    // the null match for user 2 is UNDECIDABLE until the watermark
    // proves no purchase can still arrive: only the matched row so far
    val early = spark.table("ssjo_stream").collect()
    assert(early.map(_.getLong(0)).toSet == Set(1L),
      "null match must not surface before the watermark passes the window")
    // sentinel flush rows (user -1) advance BOTH watermarks past
    // click-time + window + delay, forcing the outer-null decision
    val flush = Seq((-1L, new Timestamp(t0 + 10L * 3600 * 1000), 0.0))
    flush.toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$src/clicks/f1")
    flush.toDF("user_id", "ts", "value").coalesce(1)
      .write.parquet(s"$src/buys/f1")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjo_stream").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), Option(r.get(3)))).toSet
    assert(got == Set((1L, Some(5.0)), (2L, None)),
      s"expected one match and one watermark-decided null, got $got")
  }

  test("stream-static join enriches the stream with a dimension table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = tmp("graft_ssd")
    val stream = Seq(("click", new Timestamp(1700000000000L), 1.0),
      ("buy", new Timestamp(1700000001000L), 2.0))
    toDf(stream).coalesce(1).write.parquet(s"$src/f0")
    val dim = Seq(("click", "engagement"), ("buy", "conversion"))
      .toDF("event_type", "category") // static side, broadcast by planner
    val q = spark.readStream.schema(toDf(stream).schema)
      .parquet(s"$src/f*")
      .join(dim, Seq("event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssd_stream")
      .option("checkpointLocation", tmp("graft_ssd_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssd_stream").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("category")))
      .toSet
    assert(got == Set(("click", "engagement"), ("buy", "conversion")))
  }

  test("streaming stratified sample == batch selection (stateless map-only)") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_strat")
    docs.coalesce(1).write.parquet(s"$src/f0")
    val q = graft.functions.Sampling.stratifiedKeep(spark,
        spark.readStream.schema(docs.schema).parquet(s"$src/f*"))
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("strat_stream")
      .option("checkpointLocation", tmp("graft_strat_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("strat_stream").collect()
      .map(_.getLong(0)).toSet
    val batch = graft.functions.Sampling.stratifiedKeep(spark, docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream/batch selection diverged: ${streamed.size} vs ${batch.size}")
  }

  test("streaming count-min sketch across micro-batches == batch sketch") {
    // the CMS buffer is the poster-child streaming aggregate: fixed
    // d×w state through the store regardless of stream length, and
    // merge = element-wise add, so stream-fold == batch-fold exactly
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_cms")
    def words(df: DataFrame): DataFrame = df
      .select(explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$src/f0")
    val q = words(spark.readStream.schema(docs.schema).parquet(s"$src/f*"))
      .agg(graft.functions.CountMinSketch.sketch(col("w")).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream")
      .option("checkpointLocation", tmp("graft_cms_ckpt"))
      .start()
    q.processAllAvailable()
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").collect().head.getSeq[Long](0)
    val batch = words(docs)
      .agg(graft.functions.CountMinSketch.sketch(col("w")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(streamed.sum > 0)
    assert(streamed == batch, "stream-folded sketch diverged from batch")
  }

  test("streaming chunk windows == batch (stateless map-only fan-out)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_chunk")
    docs.coalesce(1).write.parquet(s"$src/f0")
    val q = graft.functions.TextAnalysis.chunkWindows(
        spark.readStream.schema(docs.schema).parquet(s"$src/f*"))
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_stream")
      .option("checkpointLocation", tmp("graft_chunk_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("chunk_stream").collect()
      .map(_.toString).toSet
    val batch = graft.functions.TextAnalysis.chunkWindows(docs).collect()
      .map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream/batch chunks diverged: ${streamed.size} vs ${batch.size}")
  }

  test("streaming funnel == batch funnel times across micro-batches") {
    import org.apache.spark.sql.Row
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val src = tmp("graft_funnel_src")
    // two micro-batches split by event-id parity: the chained-min state
    // must net out the interleaving (late views re-qualifying clicks)
    e.filter(col("event_id") % 2 === 0).drop("event_id")
      .coalesce(1).write.parquet(s"$src/f0")
    val schema = spark.read.parquet(s"$src/f0").schema
    val q = StreamingFunnel.start(spark, s"$src/f*", schema,
      tmp("graft_funnel_ckpt"), "funnel_stream")
    q.processAllAvailable()
    e.filter(col("event_id") % 2 === 1).drop("event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    // Update-mode memory sink accumulates one row per touched user per
    // batch; the final emission dominates on (stage, then smaller times)
    val streamed = spark.table("funnel_stream").collect()
      .groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
        val best = rs.maxBy { r =>
          def g(i: Int): Long = if (r.isNullAt(i)) Long.MinValue else -r.getLong(i)
          (r.getAs[Int]("stage"), g(1), g(2), g(3))
        }
        def opt(r: Row, i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        u -> (opt(best, 1), opt(best, 2), opt(best, 3))
      }.toMap
    val batch = graft.operators.EventQueries.funnelTimes(
        graft.Tables.events(spark, "/root/testdata/sf0.001")
          .select(col("user_id"), col("event_type"), col("ts")))
      .collect().map { r =>
        def opt(i: Int): Option[Long] =
          if (r.isNullAt(i)) None
          else Some(micros(r.getAs[java.sql.Timestamp](i)))
        r.getAs[Long]("user_id") -> (opt(1), opt(2), opt(3))
      }.toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch funnel diverged: ${streamed.size} vs ${batch.size} users")
  }

  test("streaming repetition + PII scrub == batch (stateless map-only)") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val src = tmp("graft_scrub")
    docs.coalesce(1).write.parquet(s"$src/f0")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$src/f*")
    val q = graft.functions.TextAnalysis.redactPii(
        graft.functions.TextAnalysis.repetitionSignals(stream)
          .filter(!col("repetitive")))
      .select("doc_id", "digest")
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_stream")
      .option("checkpointLocation", tmp("graft_scrub_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scrub_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.functions.TextAnalysis.redactPii(
        graft.functions.TextAnalysis.repetitionSignals(docs)
          .filter(!col("repetitive")))
      .select("doc_id", "digest").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream/batch scrub diverged: ${streamed.size} vs ${batch.size}")
  }

  test("streaming decontamination == batch (stream-static shingle join)") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val eval = docs.filter(col("doc_id") < 50)
    val train = docs.filter(col("doc_id") >= 50)
    val src = tmp("graft_decon")
    train.coalesce(1).write.parquet(s"$src/f0")
    val q = graft.functions.Dedup.contaminationAgainst(
        spark.readStream.schema(docs.schema).parquet(s"$src/f*"), eval)
      .writeStream.outputMode("complete")
      .format("memory").queryName("decon_stream")
      .option("checkpointLocation", tmp("graft_decon_ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("decon_stream").collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id"),
        r.getAs[Long]("shared"))).toSet
    val batch = graft.functions.Dedup.contaminationPairs(docs).collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id"),
        r.getAs[Long]("shared"))).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream/batch contamination diverged: $streamed vs $batch")
  }

  test("streaming windowed aggregation to a durable parquet sink") {
    import org.apache.spark.sql.functions._
    val src = tmp("graft_fsink_src")
    val out = tmp("graft_fsink_out")
    val rows = eventRows(100, seed = 23)
    toDf(rows).coalesce(1).write.parquet(s"$src/f0")
    val q = spark.readStream.schema(toDf(rows).schema)
      .parquet(s"$src/f*")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", tmp("graft_fsink_ckpt"))
      .start()
    q.processAllAvailable()
    // append mode: windows finalize once the watermark passes — push one
    // late-enough file to flush everything, then stop
    toDf(Seq(("flush", new Timestamp(1700000000000L + 100L * 3600000L), 0.0)))
      .coalesce(1).write.parquet(s"$src/f1")
    q.processAllAvailable()
    q.stop()
    val sunk = spark.read.parquet(out)
      .filter(col("event_type") =!= "flush")
      .groupBy().sum("n").collect().head.getLong(0)
    assert(sunk == rows.length.toLong,
      s"all $sunk finalized rows must reach the parquet sink")
  }

  test("restart from checkpoint resumes instead of recomputing") {
    val src = tmp("graft_resume_src")
    val ckpt = tmp("graft_resume_ckpt")
    val first = eventRows(60, seed = 5)
    toDf(first).coalesce(1).write.parquet(s"$src/b0")
    val schema = toDf(first).schema
    val q1 = StreamingCube.start(spark, cfg, s"$src/b*", schema, ckpt, "resume_a")
    q1.processAllAvailable(); q1.stop()
    // new data lands while the query is down
    val second = eventRows(60, seed = 6)
    toDf(second).coalesce(1).write.parquet(s"$src/b1")
    val q2 = StreamingCube.start(spark, cfg, s"$src/b*", schema, ckpt, "resume_b")
    q2.processAllAvailable(); q2.stop()
    val resumed = spark.table("resume_b").collect()
      .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    val batch = CubeManager.create(cfg, toDf(first ++ second)).aggregates
      .collect()
      .map(r => (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    assert(resumed == batch)
  }
}
