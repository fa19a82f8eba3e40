package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf scratchpad: `sbt "Test/runMain graft.Scratch"`.
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
    val docs = graft.Tables.documents(spark, sfDir)
    time("warm")(docs.count())

    time("q70 a")(functions.Sampling.q70StratifiedSample(spark, sfDir).count())
    time("q70 b")(functions.Sampling.q70StratifiedSample(spark, sfDir).count())
    functions.Sampling.q70StratifiedSample(spark, sfDir).explain("formatted")

    time("q67 a")(functions.Dedup.q67DedupEmbeddingLsh(spark, sfDir).count())
    time("q67 b")(functions.Dedup.q67DedupEmbeddingLsh(spark, sfDir).count())
    time("q45 a")(functions.TextAnalysis.q45LangId(spark, sfDir).count())
    time("q45 b")(functions.TextAnalysis.q45LangId(spark, sfDir).count())
    spark.stop()
  }
}
