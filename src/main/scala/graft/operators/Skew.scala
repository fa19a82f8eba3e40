package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for 100 TB-class joins/aggregations.
  *
  * AQE's runtime skew-join splitting (on by default in Spark 4) handles
  * most cases; these explicit forms cover the two situations AQE can't:
  * a skewed key in a join AQE doesn't classify as skewed until too late,
  * and a skewed aggregation key (AQE never splits those). Both are pure
  * plan rewrites — results are identical to the unsalted forms, which is
  * what SkewSpec asserts.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a random-ish
    * but DETERMINISTIC salt derived from row content, the small side is
    * replicated `salts` times so every salted key finds its match. One
    * hot key fans out over `salts` reducers instead of one.
    *
    * `saltSource` must be a column of the large side (any
    * high-cardinality column; determinism keeps reruns stable). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for a skewed group key: partial-aggregate on
    * (key, salt), then final-aggregate on key. Exposed for SUM/COUNT
    * shapes (re-aggregable measures — same algebra the cube engine
    * relies on). */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: Column,
      saltSource: Column,
      salts: Int): DataFrame = {
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }
}
