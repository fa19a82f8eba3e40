package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plans of selected queries so the
  * scale-critical properties can be inspected (and are recorded in
  * PERFORMANCE.md): parquet filter pushdown + column pruning, broadcast
  * vs shuffle join selection, partial aggregation, whole-stage codegen
  * spans.
  *
  *   sbt "runMain graft.PlanCheck q01_pricing_summary q05_join_broadcast_star"
  *
  * With SPARK_GRAFT_PLAN_DIR set, each query's formatted plan is ALSO
  * written to `$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt` (tag from
  * SPARK_GRAFT_PLAN_TAG, e.g. `before`/`after`) — the audit-file form
  * the optimization rounds commit under plans/rNN/. Runs
  * [[SparkEntry.prepare]] first so routed queries resolve against their
  * cubes exactly as Bench times them, and uses the Bench session shape
  * (local[$SPARK_GRAFT_CPUS], matching shuffle partitions) so the
  * recorded plans are the benched plans.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val tag = sys.env.get("SPARK_GRAFT_PLAN_TAG").map("_" + _).getOrElse("")
    if (planDir.isDefined) SparkEntry.prepare(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      planDir.foreach { dir =>
        val text = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name$tag.txt"),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
