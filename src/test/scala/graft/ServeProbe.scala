package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary measurement harness for the round-18 optimization work:
  * decomposes the cohort-serve cost (cube scan vs serve plan vs repeat
  * run) so changes target the measured component. Not part of the
  * graded surface; run with
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ServeProbe"
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // dedup pair-build timing: 3 repetitions, cache evicted between
    for (i <- 1 to 3) {
      graft.functions.Dedup.evictPairs(spark)
      time(s"jaccard pair build run $i") {
        noop(graft.functions.Dedup.q36DedupJaccard(spark, sfDir))
      }
    }
    time("semanticDedup run 1") {
      noop(graft.functions.Similarity.q115SemanticDedup(spark, sfDir))
    }
    time("semanticDedup run 2") {
      noop(graft.functions.Similarity.q115SemanticDedup(spark, sfDir))
    }
    import graft.cube._
    val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val svc = new CubeService(spark, dir)
    time("createCube cal_ret") {
      svc.createCube(
        CubeConfig("cal_ret", "orders",
          dims = Seq(TimeDim("day", "o_orderdate", "day")),
          measures = Seq(Measure("rev", "o_totalprice")),
          bitmaps = Seq(Measure("c", "o_custkey")),
          weighted = Seq(WeightedMeasure("ltv", "o_custkey",
            "o_totalprice"))),
        Tables.orders(spark, sfDir))
      ()
    }
    time("getAggregates day (cube scan)") {
      noop(svc.getAggregates("cal_ret", Seq("day")))
    }
    time("getAggregates day (again)") {
      noop(svc.getAggregates("cal_ret", Seq("day")))
    }
    time("getCohortValue run 1") {
      noop(svc.getCohortValue("cal_ret", "day", "ltv", periodDays = 7))
    }
    time("getCohortValue run 2") {
      noop(svc.getCohortValue("cal_ret", "day", "ltv", periodDays = 7))
    }
    time("getCohortValue run 3") {
      noop(svc.getCohortValue("cal_ret", "day", "ltv", periodDays = 7))
    }
    time("getCohortMatrix run 1") {
      noop(svc.getCohortMatrix("cal_ret", "day", "c", periodDays = 7))
    }
    time("getCohortMatrix run 2") {
      noop(svc.getCohortMatrix("cal_ret", "day", "c", periodDays = 7))
    }
    time("getValueGrowthAccounting run 1") {
      noop(svc.getValueGrowthAccounting("cal_ret", "day", "ltv",
        periodDays = 7))
    }
    time("getValueGrowthAccounting run 2") {
      noop(svc.getValueGrowthAccounting("cal_ret", "day", "ltv",
        periodDays = 7))
    }
    time("getCumulative run 1") {
      noop(svc.getCumulative("cal_ret", "day", sumOf = Seq("rev"),
        exactDistinctOf = Seq("c")))
    }
    time("getCumulative run 2") {
      noop(svc.getCumulative("cal_ret", "day", sumOf = Seq("rev"),
        exactDistinctOf = Seq("c")))
    }
    spark.stop()
  }
}
