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

    // Stage decomposition of q36.
    val M = 1L << 21
    val sh = docs.withColumn("_toks", split(col("text"), " "))
      .select(col("doc_id"), functions.Dedup.shingleExpr("_toks").as("_sharr"))
      .select((col("doc_id") * lit(M) + size(col("_sharr"))).as("dn"),
        explode_outer(col("_sharr")).as("s0"))
      .filter(col("s0").isNotNull)
      .select(col("dn"), xxhash64(col("s0")).as("s"))
    sh.explain("formatted")
    time("explode+pack only")(sh.count())

    val shPlain = functions.Dedup.docShingles(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    time("explode plain only")(shPlain.count())

    val grouped = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("dn"))).as("ds"))
      .filter(size(col("ds")).between(2, 128))
    time("grouped")(grouped.count())

    time("q36 full")(functions.Dedup.q36DedupJaccard(spark, sfDir).count())
    time("q36 full again")(functions.Dedup.q36DedupJaccard(spark, sfDir).count())
    spark.stop()
  }
}
