package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

import graft.operators.Stable._

/** Z-order (Morton) data layout: interleave the bits of two bounded
  * dimension keys so that sorting by the combined code co-locates rows
  * that are close in BOTH dimensions.
  *
  * This is the multi-dimensional clustering story at 100 TB: parquet
  * file skipping prunes on per-file min/max column stats, and a
  * single-column sort gives perfect pruning on that column but none on
  * any other. Writing files in Z-code order bounds every file's
  * bounding BOX in all interleaved dimensions at once (each 2k-bit
  * Z-prefix fixes the top k bits of every dimension), so selective
  * scans on either dimension — or both — skip most files. The same
  * code is a shuffle/range-partitioning key for co-locating
  * 2-dimensional workloads with a 1-dimensional partitioner.
  *
  * [[ZOrderCode]] is a native codegen'd expression (two longs in, one
  * long out, a 10-iteration bit loop — no allocation, stays inside
  * whole-stage codegen). [[zorderLayout]] is the writer-side layout op:
  * range-partition + sort by the code, the exact shape a `write.
  * partitionBy`-free clustered export wants.
  */
object ZOrder {
  type Q = (SparkSession, String) => DataFrame

  /** Bits per dimension; 10 ⇒ 20-bit codes over a 1024×1024 grid. */
  val Bits: Int = ZOrderCode.Bits

  def interleave(x: Long, y: Long): Long = ZOrderCode.interleave(x, y)

  def zorderCode(x: Column, y: Column): Column =
    Bridge.toColumn(ZOrderCode(Bridge.toExpression(x), Bridge.toExpression(y)))

  /** Layout op: cluster `df` for writing by the Z-code of (x, y) —
    * range partitioning balances output files by code quantiles, the
    * within-partition sort makes every file a tight Z-range (⇒ tight
    * per-file min/max on BOTH source columns). The scratch `_z` column
    * is dropped after the sort (a projection above the sort keeps the
    * ordering), so written files carry exactly the caller's schema. */
  def zorderLayout(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    // scratch name chosen to not collide with the caller's schema — a
    // fixed "_z" would silently OVERWRITE then DROP a real _z column
    val zc = Iterator.from(0).map(i => s"_z$i")
      .find(n => !df.columns.contains(n)).get
    val coded = df.withColumn(zc, zorderCode(x, y))
    coded.repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
  }

  // ---------------------------------------------------------------- q116
  /** Z-order layout audit: code every lineitem on a 1024×1024
    * (partkey, suppkey) grid, group into 256 Z-buckets (top 8 code
    * bits), and report each bucket's bounding box. The Z-property the
    * oracle + spec pin: every bucket's box is a 64×64 tile — the
    * file-skipping guarantee a Z-clustered write gives BOTH key
    * columns, where a single-column sort gives one dimension a span of
    * 1023. The oracle recomputes the interleave arithmetically, so the
    * native expression's bit loop is hash-checked bit-for-bit. */
  def q116ZorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val coded = li.select(
      pmod(col("l_partkey"), lit(1024L)).as("x"),
      pmod(col("l_suppkey"), lit(1024L)).as("y"))
      .withColumn("z", zorderCode(col("x"), col("y")))
    coded.groupBy((col("z") / lit(4096)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        asLong(min(col("x"))).as("min_x"), asLong(max(col("x"))).as("max_x"),
        asLong(min(col("y"))).as("min_y"), asLong(max(col("y"))).as("max_y"))
      .orderBy(col("bucket"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q116_zorder_layout" -> q116ZorderLayout,
  )

  /** The interleave, spelled arithmetically for DuckDB: bit b of x
    * lands at code bit 2b+1, bit b of y at 2b. */
  private def sqlInterleave(xCol: String, yCol: String): String =
    (0 until Bits).map { b =>
      s"(($xCol // ${1L << b}) % 2) * ${1L << (2 * b + 1)}" +
        s" + (($yCol // ${1L << b}) % 2) * ${1L << (2 * b)}"
    }.mkString(" + ")

  lazy val sql: Map[String, String] = Map(
    "q116_zorder_layout" -> s"""
      WITH coded AS (
        SELECT x, y, ${sqlInterleave("x", "y")} AS z
        FROM (
          SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
          FROM lineitem))
      SELECT CAST(z // 4096 AS BIGINT) AS bucket, count(1) AS n,
        CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
        CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
      FROM coded
      GROUP BY 1
      ORDER BY bucket""",
  )
}

/** Morton interleave of the low [[ZOrder.Bits]] bits of two longs —
  * x's bits at odd positions, y's at even. Inputs outside the grid are
  * masked by construction (callers bound them with pmod). */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // nullSafeEval reads both sides as Long; declaring the types widens
  // narrower integrals with an analysis-time cast and turns any type
  // with no implicit cast to long (arrays, structs, …) into an
  // analysis error instead of a runtime ClassCastException.
  // (Seq[DataType] covariantly refines Seq[AbstractDataType], which is
  // private[sql] and unnameable here)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "zorder_code"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderCode.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the helper object is tiny and Serializable (the big ZOrder query
    // object must NOT ride the task closure)
    val helper = ctx.addReferenceObj("zorderHelper", ZOrderCode,
      ZOrderCode.getClass.getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $helper.interleave($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode extends Serializable {
  final val Bits = 10

  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < Bits) {
      z |= ((x >> b) & 1L) << (2 * b + 1)
      z |= ((y >> b) & 1L) << (2 * b)
      b += 1
    }
    z
  }
}
