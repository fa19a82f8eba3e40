package graft

import org.apache.spark.sql.SparkSession

/** Round-19 measurement harness (test scope — not on the graded main
  * surface, per the round-18 advice on ServeProbe/TuneProbe):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "Test/runMain graft.Probe19"
  *
  * Decomposes the two remaining profile questions before any code is
  * changed (guide §1):
  *   1. q293/q281 cohort-value serves — cold (first run: plan build +
  *      codegen + execute, what Bench times) vs warm (repeat in the
  *      same JVM: execute only). If warm is a small fraction of cold,
  *      the cost is per-query fixed overhead, not the serve's compute,
  *      and no plan restructuring can move the bench number.
  *   2. The terminal-orderBy tax on typical tail queries: the declared
  *      form vs the same logical plan with the top Sort stripped. A
  *      bare global orderBy adds a range-partitioner sampling pass
  *      (one extra job re-running the final stage) plus the sort
  *      exchange; if that reads >= ~0.1 s/query cold it prices the
  *      guide §2.4 "orderBy used only to make output deterministic"
  *      item across the ~150-query tail.
  */
object Probe19 {
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
      println(f"PROBE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    // the terminal-orderBy tax on the LARGE-output queries (>= ~3000
    // rows at sf0.01 — the set where a cosmetic global sort is also a
    // genuine scale bug): declared vs the same logical plan with the
    // top Sort stripped
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    def stripSort(name: String): Option[org.apache.spark.sql.DataFrame] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.logical match {
        case s: Sort =>
          Some(org.apache.spark.sql.graft.Bridge.ofRows(spark, s.child))
        case _ => None
      }
    }
    for (name <- Seq("q132_interval_overlap", "q19_window_moving_avg",
        "q25_date_fns", "q144_bucketed_agg", "q179_merge_upsert",
        "q18_window_lag_lead", "q60_window_range_frame",
        "q31_session_window", "q04_join_inner", "q100_gap_fill",
        "q29_tumbling_window", "q02_filter_project")) {
      for (i <- 1 to 2) {
        time(s"$name DECLARED run $i") {
          noop(SparkEntry.queries(name)(spark, sfDir)) }
        stripSort(name).foreach(nos =>
          time(s"$name NOSORT   run $i") { noop(nos) })
      }
    }
    spark.stop()
  }
}
