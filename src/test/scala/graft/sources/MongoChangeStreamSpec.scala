package graft.sources

import java.sql.Timestamp

import graft.cube._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The MongoDB change-stream decoder: wire-format JSON → signed deltas,
  * folded through the SAME cube path as every other source. Transport is
  * the only stubbed piece (zero-egress build), so these tests drive raw
  * event JSON — the exact bytes a cursor would hand over. */
class MongoChangeStreamSpec extends AnyFunSuite {
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

  private val docSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("v", DoubleType)))

  private def raw(lines: String*): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
  }

  private def ins(k: String, v: Double) =
    s"""{"operationType":"insert","fullDocument":{"k":"$k","v":$v},"documentKey":{"_id":"$k"},"clusterTime":{"$$timestamp":{"t":1,"i":1}}}"""
  private def del(k: String, v: Double) =
    s"""{"operationType":"delete","fullDocumentBeforeChange":{"k":"$k","v":$v},"documentKey":{"_id":"$k"}}"""
  private def upd(k: String, from: Double, to: Double) =
    s"""{"operationType":"update","fullDocument":{"k":"$k","v":$to},"fullDocumentBeforeChange":{"k":"$k","v":$from},"updateDescription":{"updatedFields":{"v":$to},"removedFields":[]}}"""
  private def repl(k: String, from: Double, to: Double) =
    s"""{"operationType":"replace","fullDocument":{"k":"$k","v":$to},"fullDocumentBeforeChange":{"k":"$k","v":$from}}"""

  test("decode maps each operationType to its signed rows; non-row ops drop") {
    val events = raw(
      ins("a", 1.5),
      upd("b", 2.0, 3.0),
      repl("c", 4.0, 5.0),
      del("d", 6.0),
      // ddl/invalidate events carry no row data and must vanish silently
      """{"operationType":"drop"}""",
      """{"operationType":"invalidate"}""")
    val out = MongoChangeStream.decode(events, docSchema)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Double]("v"),
        r.getAs[Int]("_sign")))
      .toSet
    assert(out == Set(
      ("a", 1.5, 1),                     // insert: post only
      ("b", 2.0, -1), ("b", 3.0, 1),     // update: -before, +after
      ("c", 4.0, -1), ("c", 5.0, 1),     // replace: full overwrite
      ("d", 6.0, -1)))                   // delete: pre-image only
  }

  test("decoded change stream folds a cube to the final collection state") {
    import spark.implicits._
    val cfg = CubeConfig("mongo_t", "mem",
      dims = Seq(FieldDim("k", "k")),
      measures = Seq(Measure("v", "v")))
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("c", 7.0))
      .toDF("k", "v")
    val cube0 = CubeManager.create(cfg, base)
    // the stream a cursor would deliver: one new doc, one value update
    // (a: 2.0 → 2.5), one delete (c)
    val deltas = MongoChangeStream.decode(
      raw(ins("b", 4.0), upd("a", 2.0, 2.5), del("c", 7.0)), docSchema)
    val folded = CubeManager.applyDeltas(cube0, deltas)
    val expected = CubeManager.create(cfg,
      Seq(("a", 1.0), ("a", 2.5), ("b", 10.0), ("b", 4.0)).toDF("k", "v"))
    def rows(c: Cube) = c.aggregates.collect()
      .map(r => (r.getAs[String]("k"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    assert(rows(folded) == rows(expected),
      "change-stream fold diverges from the final collection state")
  }

  test("delete/update without a pre-image fails loudly, not silently") {
    val noPre = raw("""{"operationType":"delete","documentKey":{"_id":"x"}}""")
    val e = intercept[Exception] {
      MongoChangeStream.decode(noPre, docSchema).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("changeStreamPreAndPostImages")),
      s"wrong failure: $e")
  }

  test("file-transport stream maintains a cube via the standard fold") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_mongo_src")
    val cfg = CubeConfig("mongo_s", "mem",
      dims = Seq(FieldDim("k", "k")),
      measures = Seq(Measure("v", "v")))
    var cube = CubeManager.create(cfg,
      Seq(("a", 1.0), ("c", 7.0)).toDF("k", "v"))
    // micro-batch 1 lands before the stream starts, 2 while it runs —
    // the file source's checkpoint is the resume token stand-in
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b0.json"),
      Seq(ins("b", 4.0), upd("a", 1.0, 1.5)).mkString("\n"))
    val q = MongoChangeStream.stream(spark, dir, docSchema)
      .writeStream
      .option("checkpointLocation", tmp("graft_mongo_ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        cube = CubeManager.applyDeltas(cube, b); ()
      }
      .start()
    q.processAllAvailable()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b1.json"), del("c", 7.0))
    q.processAllAvailable()
    q.stop()
    val expected = CubeManager.create(cfg,
      Seq(("a", 1.5), ("b", 4.0)).toDF("k", "v"))
    def rows(c: Cube) = c.aggregates.collect()
      .map(r => (r.getAs[String]("k"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))).toSet
    assert(rows(cube) == rows(expected),
      "streamed change events diverge from the final state")
  }

  test("loopback socket transport: live tail decodes == file replay") {
    // the last physically-possible inch of the cursor seam on a
    // zero-egress box: a localhost TCP server plays the remote end,
    // socketStream live-tails it, and the decoded deltas must equal
    // decoding the SAME event bytes through the batch/file path
    val events = Seq(
      ins("a", 1.5), upd("b", 2.0, 3.0), del("c", 7.0), repl("d", 4.0, 5.5),
      """{"operationType":"drop"}""") // non-row op must vanish on the wire too
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val writer = new Thread(() => {
      val s = server.accept()
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      events.foreach(out.println)
      out.flush()
      // keep the connection open until the query is done tailing —
      // closing early would be a cursor drop, a different test
      while (!Thread.interrupted()) Thread.sleep(50)
      s.close()
    })
    writer.setDaemon(true)
    writer.start()
    val q = MongoChangeStream.socketStream(spark,
        server.getInetAddress.getHostAddress, server.getLocalPort, docSchema)
      .writeStream.format("memory").queryName("mongo_live_tail")
      .outputMode("append").start()
    try {
      // 4 row-ops → 6 signed rows (insert 1, update 2, delete 1, replace 2)
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (spark.table("mongo_live_tail").count() < 6
          && System.nanoTime < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      def set(df: DataFrame) = df.collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Double]("v"),
          r.getAs[Int]("_sign"))).toSet
      val live = set(spark.table("mongo_live_tail"))
      val replay = set(MongoChangeStream.decode(raw(events: _*), docSchema))
      assert(live == replay,
        s"live socket tail diverges from file replay: $live vs $replay")
      assert(live.size == 6)
    } finally {
      q.stop(); writer.interrupt(); server.close()
    }
  }
}
