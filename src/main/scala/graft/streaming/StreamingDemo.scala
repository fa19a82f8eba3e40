package graft.streaming

import java.nio.file.Files

import graft.Tables
import graft.cube.{CubeConfig, CubeManager, FieldDim, Measure, TimeDim}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demonstrator of the streaming cube path: replays the
  * `events` table as N parquet micro-batches through StreamingCube and
  * checks the streamed state equals a batch recompute.
  *
  *   sbt "runMain graft.streaming.StreamingDemo [sfDir] [nBatches]"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value"), col("event_id"))
    val src = Files.createTempDirectory("graft_demo_src").toString
    events.withColumn("b", pmod(col("event_id"), lit(nBatches)))
      .repartitionByRange(nBatches, col("b"))
      .write.partitionBy("b").parquet(s"$src/deltas")

    val cfg = CubeConfig("demo", "events",
      Seq(FieldDim("etype", "event_type"), TimeDim("hour", "ts", "hour")),
      Seq(Measure("v", "value")))
    val schema = events.drop("event_id").schema
    val q = StreamingCube.start(spark, cfg, s"$src/deltas/b=*", schema,
      Files.createTempDirectory("graft_demo_ckpt").toString, "demo_cube")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("demo_cube")
    val batch = CubeManager.create(cfg, events).aggregates
    val diff = streamed.unionByName(batch).distinct().count() - streamed.count()
    println(s"[demo] micro-batches=$nBatches cube_groups=${streamed.count()} " +
      s"stream_vs_batch_diff=$diff")
    streamed.orderBy(col("etype"), col("hour")).show(5, truncate = false)
    assert(diff == 0L, "streamed cube must equal batch recompute")
    println("[demo] OK: streaming cube == batch recompute")

    // Signed-delta path: replay events as +1 inserts, then a second batch
    // deleting every 'error' event; final per-type state must equal the
    // batch signed fold.
    val signedSrc = Files.createTempDirectory("graft_demo_signed").toString
    events.withColumn("_sign", lit(1L))
      .coalesce(1).write.parquet(s"$signedSrc/f0")
    val sq = StreamingCube.startSigned(spark, s"$signedSrc/f*",
      events.withColumn("_sign", lit(1L)).schema, "event_type", "value",
      Files.createTempDirectory("graft_demo_sckpt").toString, "demo_signed")
    sq.processAllAvailable() // batch 1: all inserts
    events.filter(col("event_type") === "error").withColumn("_sign", lit(-1L))
      .coalesce(1).write.parquet(s"$signedSrc/f1")
    sq.processAllAvailable() // batch 2: delete every 'error' → state dropped
    sq.stop()
    // each key emitted once (batch 1); 'error' state was removed in batch
    // 2 with no further emission, so its only row is the stale batch-1
    // state — the live view is everything except fully-deleted keys
    val emissions = spark.table("demo_signed").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val expect = events
      .withColumn("s", when(col("event_type") === "error", -1L).otherwise(1L))
      .groupBy("event_type")
      .agg(((sum(col("s") * col("value").cast("decimal(18,2)")) * 100)
        .cast("long") / 100.0).as("m"), sum("s").as("n"))
      .filter(col("n") > 0)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    println(s"[demo] signed emissions=$emissions")
    assert(!expect.contains("error"), "batch fold must drop fully-deleted key")
    val liveOnly = emissions.view.filterKeys(_ != "error").toMap
    assert(liveOnly == expect, s"signed stream diverged: $liveOnly vs $expect")
    println("[demo] OK: signed-delta streaming == batch signed fold")
    spark.stop()
  }
}
