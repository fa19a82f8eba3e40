package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Helpers that make query results hash-identical between Spark and the
  * DuckDB oracle (SURVEY.md §5.2 rules).
  *
  * Money/value columns in the test data are exact 2-decimal doubles
  * (verified against sf0.01: `x == round(x, 2)` for every money column).
  * Casting each FACTOR to decimal(18,2) before arithmetic makes sums
  * exact and order-independent — immune to the different reduction orders
  * of Spark partial aggregation vs DuckDB, at any scale. The final cast
  * back to double keeps output schemas engine-neutral.
  */
object Stable {
  /** Exact decimal view of a 2-decimal money column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a money column, output as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact average of a money column: exact decimal sum, double divide. */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  /** Integer-valued expression normalized to BIGINT on both engines
    * (DuckDB widens freely: year()→BIGINT, sum(BIGINT)→HUGEINT …). */
  def asLong(c: Column): Column = c.cast(LongType)

  /** Seconds-since-epoch as BIGINT — the engine-neutral way to output a
    * timestamp (avoids parquet INT96-vs-µs and tz representation drift). */
  def epochS(c: Column): Column = unix_timestamp(c)
}
