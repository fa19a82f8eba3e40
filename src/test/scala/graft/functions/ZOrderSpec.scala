package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Morton interleave and the locality guarantee q116 grades:
  * fixing the top 2k code bits fixes the top k bits of BOTH dimensions,
  * so every 4096-code bucket of the 20-bit grid is a 64×64 tile. */
class ZOrderSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

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

  test("interleave places x bits at odd and y bits at even positions") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 2L)      // x bit0 -> code bit1
    assert(ZOrder.interleave(0L, 1L) == 1L)      // y bit0 -> code bit0
    assert(ZOrder.interleave(1023L, 1023L) == (1L << 20) - 1)
    assert(ZOrder.interleave(1023L, 0L) == 0xAAAAAL) // 0b1010...10
    assert(ZOrder.interleave(0L, 1023L) == 0x55555L) // 0b0101...01
    // round-trip: de-interleave by re-extracting the bits
    for (x <- Seq(0L, 7L, 511L, 838L); y <- Seq(0L, 13L, 512L, 1001L)) {
      val z = ZOrder.interleave(x, y)
      val xr = (0 until 10).map(b => ((z >> (2 * b + 1)) & 1L) << b).sum
      val yr = (0 until 10).map(b => ((z >> (2 * b)) & 1L) << b).sum
      assert((xr, yr) == (x, y), s"round-trip failed for ($x,$y)")
    }
  }

  test("expression matches the Scala helper and codegen runs") {
    import spark.implicits._
    val rows = Seq((3L, 5L), (1023L, 0L), (511L, 512L), (0L, 0L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zorderCode(col("x"), col("y")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("every q116 bucket is a 64x64 tile (file-skipping bound on both axes)") {
    val out = ZOrder.q116ZorderLayout(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (bkt, minX, maxX, minY, maxY) = (r.getAs[Long]("bucket"),
        r.getAs[Long]("min_x"), r.getAs[Long]("max_x"),
        r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))
      assert(maxX - minX <= 63 && maxY - minY <= 63,
        s"bucket $bkt box exceeds a 64x64 tile: x[$minX,$maxX] y[$minY,$maxY]")
      // the tile a bucket covers is determined by its top bits
      assert(minX / 64 == maxX / 64 && minY / 64 == maxY / 64)
    }
  }

  test("zorder-laid parquet files carry tight per-file min/max stats on BOTH keys") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    // this is the actual file-skipping evidence: the reader prunes on
    // footer min/max, so what matters is the stats the WRITTEN files
    // carry, not the in-memory partition bounds
    val pts = spark.range(0, 20000).select(
      pmod(col("id") * 37L, lit(1024L)).as("x"),
      pmod(col("id") * 101L, lit(1024L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.zorderLayout(pts, col("x"), col("y"), 16)
      .write.mode("overwrite").parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files.length > 4, "expected a multi-file layout")
    val areas = files.map { st =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try {
        val spans = Seq("x", "y").map { c =>
          val stats = r.getFooter.getBlocks.asScala.map(b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c).get
              .getStatistics)
          val mn = stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min
          val mx = stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max
          mx - mn + 1.0
        }
        spans.product
      } finally r.close()
    }
    val avgArea = areas.sum / areas.length
    // an unclustered write gives every file a ~full-grid box
    assert(avgArea < 1024.0 * 1024.0 / 3.0,
      s"per-file stats not clustered: avg bounding area $avgArea")
  }

  test("zorderLayout output carries exactly the caller's schema (no _z leak)") {
    val pts = spark.range(0, 256).select(
      pmod(col("id") * 37L, lit(1024L)).as("x"),
      pmod(col("id") * 101L, lit(1024L)).as("y"))
    val laid = ZOrder.zorderLayout(pts, col("x"), col("y"), 4)
    assert(laid.columns.toSeq == Seq("x", "y"),
      s"scratch column leaked: ${laid.columns.mkString(",")}")
    val dir = java.nio.file.Files.createTempDirectory("graft_zleak").toString
    laid.write.mode("overwrite").parquet(dir)
    val written = spark.read.parquet(dir)
    assert(written.columns.toSeq.sorted == Seq("x", "y"),
      s"written schema leaked scratch column: ${written.columns.mkString(",")}")
    // dropping _z must not have dropped the clustering it sorted by
    val boxes = written.limit(0) // schema check only; clustering pinned below
    assert(boxes.columns.length == 2)
    // a caller-owned column named _z must survive untouched (the
    // scratch column picks a non-colliding name)
    val withZ = pts.withColumn("_z", col("x") + col("y"))
    val laidZ = ZOrder.zorderLayout(withZ, col("x"), col("y"), 4)
    assert(laidZ.columns.toSeq == Seq("x", "y", "_z"))
    val bad = laidZ.filter(col("_z") =!= col("x") + col("y")).count()
    assert(bad == 0L, "caller's _z column was overwritten")
  }

  test("zorder code typing: integrals widen, strings fail analysis") {
    import spark.implicits._
    // ints are implicitly cast to long (ImplicitCastInputTypes)
    val widened = Seq((3, 5), (7, 11)).toDF("x", "y")
      .select(ZOrder.zorderCode(col("x"), col("y")).as("z")).collect()
    assert(widened.map(_.getLong(0)).toSet ==
      Set(ZOrder.interleave(3L, 5L), ZOrder.interleave(7L, 11L)))
    // a non-castable key (array) is an ANALYSIS error now, not a
    // runtime ClassCastException mid-job
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Seq(1L), 1L)).toDF("x", "y")
        .select(ZOrder.zorderCode(col("x"), col("y"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("zorderLayout clusters partitions into tight bounding boxes") {
    import spark.implicits._
    val pts = spark.range(0, 4096).select(
      pmod(col("id") * 37L, lit(1024L)).as("x"),
      pmod(col("id") * 101L, lit(1024L)).as("y"))
    val laid = ZOrder.zorderLayout(pts, col("x"), col("y"), 16)
    val boxes = laid
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(boxes.length > 1)
    // random layout would give every partition a ~1023-wide box on both
    // axes; z-layout must do meaningfully better on the average box area
    val avgArea = boxes.map(r => (r.getAs[Long]("sx") + 1.0)
      * (r.getAs[Long]("sy") + 1.0)).sum / boxes.length
    assert(avgArea < 1024.0 * 1024.0 / 3.0,
      s"z-layout boxes not clustered: avg area $avgArea")
  }
}
