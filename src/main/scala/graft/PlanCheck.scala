package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plans of selected queries so the
  * scale-critical properties can be inspected (and are recorded in
  * PERFORMANCE.md): parquet filter pushdown + column pruning, broadcast
  * vs shuffle join selection, partial aggregation, whole-stage codegen
  * spans.
  *
  *   sbt "runMain graft.PlanCheck q01_pricing_summary q05_join_broadcast_star"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
