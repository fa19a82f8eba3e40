package graft.cube

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the materialized-view win the reference is built around:
  * the same roll-up answered from the source scan vs from the cube
  * (via CubeRewriteRule routing).
  *
  *   sbt "runMain graft.cube.CubeSpeedupDemo [sfDir] [reps]"
  */
object CubeSpeedupDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_speedup").toString
    val srcDir = s"$dir/source"
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
        col("l_extendedprice")).write.parquet(srcDir)
    val cfg = CubeConfig("li_cube", "lineitem",
      Seq(FieldDim("rf", "l_returnflag"), FieldDim("ls", "l_linestatus"),
        TimeDim("month", "l_shipdate", "month")),
      Seq(Measure("price", "l_extendedprice")))
    CubeManager.save(CubeManager.create(cfg, spark.read.parquet(srcDir)), dir)

    def query() = spark.read.parquet(srcDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("s"), count(lit(1)).as("n"))

    def bench(label: String,
        q: () => org.apache.spark.sql.DataFrame = query _): Double = {
      q().count() // warm plan path once
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => q().collect())
      val dt = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[speedup] $label%-12s ${dt}%.4f s/query")
      dt
    }

    val fromSource = bench("from-source")
    CubeCatalog.install(spark)
    CubeCatalog.register("li_cube",
      CubeManager.load(spark, dir, "li_cube"), srcDir)
    val scans = query().queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    require(scans.exists(_.endsWith("/li_cube")),
      s"routing must fire for the measurement to mean anything; scans=$scans")
    val fromCube = bench("from-cube")
    println(f"[speedup] ratio ${fromSource / fromCube}%.1fx at $sfDir " +
      "(grows with source size; the cube side is O(|cube|))")

    // the distinct-count twin: approx_count_distinct answered from the
    // source scan vs from maintained HLL partials (opt-in routing)
    val dsrcDir = s"$dir/dsource"
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("user_id"))
      .write.parquet(dsrcDir)
    val dcfg = CubeConfig("ev_users", "events",
      Seq(FieldDim("etype", "event_type")), Seq(Measure("v", "value")),
      sketches = Seq(Measure("users", "user_id")))
    CubeManager.save(CubeManager.create(dcfg, spark.read.parquet(dsrcDir)), dir)
    def dquery() = spark.read.parquet(dsrcDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("nd"))
    val dFromSource = bench("distinct-src", dquery _)
    CubeCatalog.register("ev_users",
      CubeManager.load(spark, dir, "ev_users"), dsrcDir)
    spark.conf.set("spark.graft.cube.approxDistinctRouting", "true")
    val dScans = dquery().queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    require(dScans.exists(_.endsWith("/ev_users")),
      s"distinct routing must fire for the measurement; scans=$dScans")
    val dFromCube = bench("distinct-cube", dquery _)
    println(f"[speedup] distinct ratio ${dFromSource / dFromCube}%.1fx at " +
      s"$sfDir (the HLL-partial union reads |cube| rows, never re-scans " +
      "raw user ids)")
    spark.stop()
  }
}
