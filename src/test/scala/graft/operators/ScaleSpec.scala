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
