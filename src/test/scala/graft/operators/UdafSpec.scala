package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two extension-seam forms of the weighted-average Aggregator
  * to each other: the graded untyped `functions.udaf` column path (q48)
  * and the typed `as[LineW].groupByKey.agg(toColumn)` Dataset path must
  * produce identical rows — same class, same decimal buffer, two
  * registration seams. */
class UdafSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

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

  test("udaf column path == typed Dataset path, bit-exact") {
    val untyped = ExtensionQueries.q48UdafWeightedAvg(spark, sfDir).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("wavg_price")))
    val typed = ExtensionQueries.q48TypedForm(spark, sfDir).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("wavg_price")))
    assert(untyped.nonEmpty)
    assert(untyped.toSeq == typed.toSeq)
  }
}
