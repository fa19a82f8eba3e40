package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary round-18 check: the one-serve tuneNprobe sweep must
  * reproduce the per-width serve results EXACTLY. Compares, for every
  * candidate width, the result set of a real queryIndex serve against
  * the recall the rewritten tuneNprobe computes, and prints both
  * tuning outcomes. */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_tuneprobe").toString
    val svc = new graft.ann.AnnIndexService(spark, dir)
    svc.createIndex("tp",
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      k = 16, lloydIters = 2)
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def oldSet(np: Int): Set[(Long, Long)] =
      svc.queryIndex("tp", sample, 5, np)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = oldSet(16)
    val oldRecalls = (1 to 16).map(np =>
      np -> oldSet(np).intersect(exact).size.toDouble / exact.size).toMap
    var lo = 1; var hi = 16
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (oldRecalls(mid) >= 0.95) hi = mid else lo = mid + 1
    }
    println(s"TUNEPROBE old: nprobe=$lo recall=${oldRecalls(lo)}")
    (1 to 16).foreach(np =>
      println(f"TUNEPROBE old recall($np%2d) = ${oldRecalls(np)}%.4f"))
    val (np2, rec2) = svc.tuneNprobe("tp", sample, topK = 5,
      targetRecall = 0.95)
    println(s"TUNEPROBE new: nprobe=$np2 recall=$rec2")
    // replicate the new derivation to diff sets per width
    val idx = svc.loadIndex("tp")
    val q = sample.select(col("query_id").as("vec_id"), col("embedding"))
      .withColumn("nrm",
        graft.functions.VectorExpressions.floatVecNorm(col("embedding")))
    val probes = graft.functions.Similarity
      .assignRanked(q, idx.centroids, keep = 16)
      .select(col("vec_id").as("query_id"), col("cent_id"), col("crn"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("cent_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val rows = q
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .join(broadcast(probes), Seq("query_id"))
      .join(idx.vectors, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.Similarity
        .dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
      .withColumn("rk", row_number().over(wc))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("cos"), col("crn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    def newSet(np: Int): Set[(Long, Long)] = rows.iterator
      .filter(_._4 <= np).toSeq
      .groupBy(_._1)
      .iterator
      .flatMap { case (qid, cs) =>
        cs.sortBy(c => (-c._3, c._2)).take(5).map(c => (qid, c._2))
      }.toSet
    for (np <- Seq(13, 14, 15, 16)) {
      val o = oldSet(np); val n = newSet(np)
      println(s"TUNEPROBE np=$np old-only=${(o -- n).toSeq.sorted} " +
        s"new-only=${(n -- o).toSeq.sorted}")
    }
    spark.stop()
  }
}
