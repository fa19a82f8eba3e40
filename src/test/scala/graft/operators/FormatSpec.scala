package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond parquet: ORC, CSV, and JSON round-trips
  * preserve the data the engine computes on (Spark's format surface is
  * part of the engine's; the reference's only source — MongoDB — has no
  * offline connector, see COVERAGE.md). */
class FormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sfDir = "/root/testdata/sf0.001"

  private def nationFingerprint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").collect().map(_.mkString("|")).toSeq

  test("orc round-trip preserves rows") {
    val src = graft.Tables.nation(spark, sfDir)
    val dir = Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").orc(s"$dir/nation")
    assert(nationFingerprint(spark.read.orc(s"$dir/nation"))
      == nationFingerprint(src))
  }

  test("csv round-trip with header + explicit schema preserves rows") {
    val src = graft.Tables.nation(spark, sfDir)
    val dir = Files.createTempDirectory("graft_csv").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/nation")
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(s"$dir/nation")
    assert(nationFingerprint(back) == nationFingerprint(src))
  }

  test("json round-trip preserves rows") {
    val src = graft.Tables.nation(spark, sfDir)
    val dir = Files.createTempDirectory("graft_json").toString
    src.write.mode("overwrite").json(s"$dir/nation")
    val back = spark.read.schema(src.schema).json(s"$dir/nation")
    assert(nationFingerprint(back) == nationFingerprint(src))
  }

  test("query results are format-independent (q01 over orc == parquet)") {
    val dir = Files.createTempDirectory("graft_orc_li").toString
    graft.Tables.lineitem(spark, sfDir).write.mode("overwrite")
      .orc(s"$dir/lineitem")
    val fromOrc = spark.read.orc(s"$dir/lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Stable.moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.mkString("|")).toSeq
    val fromParquet = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Stable.moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.mkString("|")).toSeq
    assert(fromOrc == fromParquet)
  }

  test("schema evolution: mergeSchema unions epochs, old rows NULL-backfill") {
    val o = graft.Tables.orders(spark, sfDir)
    val dir = Files.createTempDirectory("graft_sevo").toString
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.parquet(s"$dir/epoch1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.parquet(s"$dir/epoch2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/epoch1", s"$dir/epoch2")
    // the unified schema carries the late column …
    assert(merged.columns.contains("o_orderpriority"))
    // … and rows written BEFORE it existed surface it as NULL — the
    // mixed-physical-schema semantics q173 maps to a legacy default
    val nulls = merged.filter(col("o_orderpriority").isNull)
      .agg(count(lit(1))).head.getLong(0)
    val evens = o.filter(col("o_orderkey") % 2 === 0).count()
    assert(nulls == evens && evens > 0)
    // without mergeSchema a single-footer read would MISS the column:
    // pinning that the merged read is doing real work
    val firstOnly = spark.read.parquet(s"$dir/epoch1")
    assert(!firstOnly.columns.contains("o_orderpriority"))
  }
}
