package graft.functions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      (new java.sql.Timestamp(1700000000000L + (i % 12) * 86400000L),
        (i % 20).toLong, Seq("view","click","purchase")(i % 3)) }
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    rows.toDF("ts", "uid", "et").write.parquet(s"$dir/src")
    def src = spark.read.parquet(s"$dir/src")
    def pe = (unix_timestamp(col("ts")).cast("double")/86400).cast("long")
    def ev(s: String) = src.filter(col("et") === s).select(col("uid"), pe.as("p"))
    val w = 3
    val q1 = ev("view").distinct()
    val q2 = ev("click").as("e").join(q1.as("c"),
        col("c.uid") === col("e.uid") &&
        col("c.p") >= col("e.p") - w && col("c.p") <= col("e.p"))
      .select(col("e.uid"), col("e.p")).distinct()
    val q3 = ev("purchase").as("e").join(q2.as("c"),
        col("c.uid") === col("e.uid") &&
        col("c.p") >= col("e.p") - w && col("c.p") <= col("e.p"))
      .select(col("e.uid"), col("e.p")).distinct()
    val t3 = q3.groupBy(col("uid")).agg(min(col("p")).as("t"))
    val days = src.select(pe.as("day")).distinct()
    val out = days.join(t3, col("t") <= col("day"))
      .groupBy(col("day")).agg(countDistinct(col("uid")).as("converted"))
    println("=== WINDOWED FUNNEL ===")
    println(out.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
