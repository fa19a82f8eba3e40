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

    // ROLLUP through the Expand: three grouping sets, each re-reading
    // the source without the MV vs re-aggregating the same cells with
    // it — the grouping-set multiplier on top of the base MV win
    def rquery() = spark.read.parquet(srcDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("s"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
    val rFromCube = bench("rollup-cube", rquery _) // registered above
    CubeCatalog.unregister("li_cube")
    val rFromSource = bench("rollup-src", rquery _)
    CubeCatalog.register("li_cube",
      CubeManager.load(spark, dir, "li_cube"), srcDir)
    println(f"[speedup] rollup ratio ${rFromSource / rFromCube}%.1fx at " +
      s"$sfDir (every grouping set re-aggregates the cells instead of " +
      "re-scanning the source)")

    // percentile_approx from maintained KLL partials (opt-in routing)
    val qcfg = CubeConfig("ev_kll", "events",
      Seq(FieldDim("etype", "event_type")), Seq(Measure("v", "value")),
      quantiles = Seq(Measure("vdist", "value")))
    CubeManager.save(CubeManager.create(qcfg, spark.read.parquet(dsrcDir)), dir)
    def pquery() = spark.read.parquet(dsrcDir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(50)).as("p50"))
    val pFromSource = bench("pctile-src", pquery _)
    CubeCatalog.register("ev_kll",
      CubeManager.load(spark, dir, "ev_kll"), dsrcDir, approxDistinct = true)
    val pScans = pquery().queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    require(pScans.exists(_.endsWith("/ev_kll")),
      s"percentile routing must fire for the measurement; scans=$pScans")
    val pFromCube = bench("pctile-cube", pquery _)
    println(f"[speedup] percentile ratio ${pFromSource / pFromCube}%.1fx " +
      s"at $sfDir (KLL merge of |cube| partials vs a source re-sort)")

    // distinct-over-join from join-MV HLL partials: the no-MV plan pays
    // the join shuffle AND the distinct re-shuffle per run
    val joDir = s"$dir/jo"; val jlDir = s"$dir/jl"
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority")).write.parquet(joDir)
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")).write.parquet(jlDir)
    val jsvc = new CubeService(spark, dir)
    jsvc.createJoinCube(
      JoinCubeConfig(
        CubeConfig("jo_supps", "jo_jl",
          Seq(FieldDim("prio", "o_orderpriority")),
          Seq(Measure("sk_sum", "l_suppkey")),
          sketches = Seq(Measure("supps", "l_suppkey"))),
        leftKey = "o_orderkey", rightKey = "l_orderkey"),
      spark.read.parquet(joDir), spark.read.parquet(jlDir))
    def jquery() = spark.read.parquet(joDir)
      .join(spark.read.parquet(jlDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("l_suppkey")).as("nd"))
    val jFromSource = bench("jdistinct-src", jquery _)
    CubeCatalog.registerJoin("jo_supps", jsvc.loadJoinCube("jo_supps"),
      joDir, jlDir, approxDistinct = true)
    val jScans = jquery().queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    require(jScans.exists(_.contains(".jmv/")),
      s"join sketch routing must fire for the measurement; scans=$jScans")
    val jFromCube = bench("jdistinct-cube", jquery _)
    println(f"[speedup] join-distinct ratio ${jFromSource / jFromCube}%.1fx " +
      s"at $sfDir (removes the join shuffle AND the distinct re-shuffle)")
    spark.stop()
  }
}
