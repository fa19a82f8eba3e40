package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanism checks: salted join/agg equivalence, and bucketed
  * tables joining without a shuffle exchange (the co-located join shape
  * a 100 TB deployment pre-materializes). */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sfDir = "/root/testdata/sf0.001"

  test("salted join == plain join (heavily skewed key)") {
    import spark.implicits._
    // 10k rows on ONE key + a small dimension
    val large = (1 to 10000).map(i => (if (i % 100 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (100L, "cold"), (200L, "cold")).toDF("k", "tag")
    val plain = large.join(small, "k")
      .groupBy("k", "tag").count().orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(large, small, "k", col("payload"), salts = 8)
      .groupBy("k", "tag").count().orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salted two-phase aggregation == direct aggregation") {
    val e = graft.Tables.events(spark, sfDir)
    val direct = e.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedSumCount(e, "event_type",
        col("value").cast("decimal(18,2)"), col("event_id"), salts = 16)
      .orderBy("event_type").collect().toSeq
    assert(salted.map(_.toSeq) == direct.map(_.toSeq))
  }

  test("top-k aggregate: bounded buffer survives partial/merge across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    import graft.functions.TopKAggregate.topK
    val rnd = new scala.util.Random(13)
    val rows = (0 until 5000).map(i =>
      ("g" + (i % 7), rnd.nextInt(100).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(16) // force merges
    val got = df.groupBy("g").agg(topK(col("v"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.value"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val expect = rows.groupBy(_._1).view.mapValues(g =>
      g.map(t => (t._2, t._3))
        .sortBy { case (v, i) => (-v, i) }.take(5).toSet).toMap
    assert(got == expect)
  }

  test("partitioned layout prunes directories at the scan") {
    // date-partitioned events (the layout a 100 TB event store uses);
    // a date-filtered read must scan ONE partition directory, proven by
    // the scan's partition filters and its file count.
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val e = graft.Tables.events(spark, sfDir)
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
    e.write.mode("overwrite").partitionBy("d").parquet(dir)
    val nDates = e.select("d").distinct().count()
    assert(nDates > 1, "need multiple partitions for the test to mean anything")
    val read = spark.read.parquet(dir)
    val oneDay = read.filter(col("d") === e.select(min("d")).head().getString(0))
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "date filter must become a partition filter, not a data filter")
    val expected = e.filter(col("d") === e.select(min("d")).head().getString(0))
      .count()
    assert(oneDay.count() == expected)
    // directory-level pruning: the scan reads strictly fewer files than
    // the unfiltered read
    val allFiles = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.get
    val prunedFiles = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.length).sum
    assert(prunedFiles < allFiles,
      s"pruned scan reads $prunedFiles of $allFiles files — no pruning happened")
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
    val o = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables between JVMs but their files
    // survive in the warehouse dir — clear both before re-creating
    Seq("li_bkt", "o_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(loc)
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bkt")
    val joined = spark.table("li_bkt")
      .join(spark.table("o_bkt"),
        col("l_orderkey") === col("o_orderkey"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$planStr")
    // and it still computes the right thing
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expect)
  }
}
