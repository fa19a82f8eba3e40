package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Weight-map partial invariants: canonical byte form, pointwise-ADD
  * merge == from-scratch build, signed netting (the family's
  * delete-invertibility), key-bitmap bridge == the bitmap family's own
  * build, and the cohort-cell walks (sumIn/countIn) vs brute force. */
class WeightMapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def df(rows: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "cnt", "w")
  }

  // the fold contract: the weight child is SIGNED (sign × scaled),
  // exactly like the cube's signed decimal sums
  private def buildBlob(rows: Seq[(Long, Long, Double)]): Array[Byte] =
    df(rows).agg(WeightMap.buildAgg(col("id"), col("cnt"),
        col("cnt") * WeightMap.scaled(col("w"))).as("m"))
      .collect()(0).getAs[Array[Byte]]("m")

  private def entries(blob: Array[Byte]): Seq[(Long, Long, Long)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    WeightMapCodec.foreachEntry(blob, (id, c, w) => b += ((id, c, w)))
    b.toSeq
  }

  test("build groups per id with exact scaled weights, ids ascending") {
    val blob = buildBlob(Seq((5L, 1L, 10.25), (2L, 1L, 1.11),
      (5L, 1L, 0.75), (2L, 1L, 2.22)))
    assert(entries(blob) === Seq((2L, 2L, 333L), (5L, 2L, 1100L)))
  }

  test("merge of partials == from-scratch build, bit for bit") {
    val a = Seq((1L, 1L, 3.00), (2L, 1L, 4.50), (9L, 1L, 0.01))
    val b = Seq((2L, 1L, 5.50), (7L, 1L, 2.00))
    import spark.implicits._
    val parts = Seq(buildBlob(a), buildBlob(b)).toDF("m")
    val merged = parts.agg(WeightMap.mergeAgg(col("m")).as("m"))
      .collect()(0).getAs[Array[Byte]]("m")
    assert(merged.toSeq === buildBlob(a ++ b).toSeq)
  }

  test("signed folds net exactly; (0,0) entries leave the byte form") {
    // id 3: insert then delete (nets out completely); id 4: two
    // inserts, one delete (nets to one row)
    val blob = buildBlob(Seq((3L, 1L, 7.77), (3L, -1L, 7.77),
      (4L, 1L, 5.00), (4L, 1L, 6.00), (4L, -1L, 5.00)))
    assert(entries(blob) === Seq((4L, 1L, 600L)))
    // the netted form equals the never-inserted form bit for bit
    assert(blob.toSeq === buildBlob(Seq((4L, 1L, 6.00))).toSeq)
  }

  test("keyBitmap == the bitmap family's own build over present ids") {
    val rows = Seq((1L, 1L, 1.0), (64L, 1L, 2.0), (65L, 1L, 3.0),
      (1000L, 1L, 4.0), (7L, 1L, 0.0),
      // id 8 nets out — must NOT be present
      (8L, 1L, 9.0), (8L, -1L, 9.0))
    import spark.implicits._
    val wmBm = df(rows)
      .agg(WeightMap.keyBitmap(WeightMap.buildAgg(col("id"), col("cnt"),
        WeightMap.scaled(col("w")))).as("bm"))
      .collect()(0).getAs[Array[Byte]]("bm")
    val direct = Seq(1L, 64L, 65L, 1000L, 7L).toDF("id")
      .agg(graft.functions.Bitmap.setAgg(col("id")).as("bm"))
      .collect()(0).getAs[Array[Byte]]("bm")
    assert(wmBm.toSeq === direct.toSeq)
  }

  test("sumIn/countIn restrict to the bitmap, presence is cnt > 0") {
    import spark.implicits._
    val wm = buildBlob(Seq((1L, 1L, 10.00), (2L, 1L, 20.00),
      (3L, 1L, 40.00), (3L, -1L, 40.00), // nets out — excluded
      (64L, 1L, 1.50)))
    val bm = Seq(1L, 3L, 64L, 99L).toDF("id")
      .agg(graft.functions.Bitmap.setAgg(col("id")).as("bm"))
      .collect()(0).getAs[Array[Byte]]("bm")
    val out = Seq((wm, bm)).toDF("m", "bm")
      .select(WeightMap.sumIn(col("bm"), col("m")).as("s"),
        WeightMap.countIn(col("bm"), col("m")).as("n"))
      .collect()(0)
    // ids 1 (10.00) and 64 (1.50) are present AND in the bitmap; 2 is
    // present but outside; 3 netted out; 99 has no weight entry
    assert(out.getAs[Long]("s") === 1150L)
    assert(out.getAs[Long]("n") === 2L)
  }

  test("null ids are skipped; null weights count presence at weight 0") {
    import spark.implicits._
    val rows = Seq[(java.lang.Long, Long, java.lang.Double)](
      (null, 1L, 5.0), (10L, 1L, null), (10L, 1L, 2.00))
    val blob = rows.toDF("id", "cnt", "w")
      .agg(WeightMap.buildAgg(col("id"), col("cnt"),
        WeightMap.scaled(col("w"))).as("m"))
      .collect()(0).getAs[Array[Byte]]("m")
    assert(entries(blob) === Seq((10L, 2L, 200L)))
  }

  test("deltaSums: expansion/contraction over ids present in both maps") {
    import spark.implicits._
    val cur = buildBlob(Seq((1L, 1L, 5.00), (2L, 1L, 1.00),
      (3L, 1L, 9.00), // only in cur — not a delta cell
      (5L, 1L, 2.00), // netted out on the prev side — skipped
      (6L, 1L, 4.00))) // equal weights — contributes nothing
    val prev = buildBlob(Seq((1L, 1L, 3.00), (2L, 1L, 4.00),
      (4L, 1L, 7.00), // only in prev — churn, not a delta cell
      (5L, 1L, 8.00), (5L, -1L, 8.00),
      (6L, 1L, 4.00)))
    val out = Seq((cur, prev)).toDF("c", "p")
      .select(WeightMap.deltaSums(col("c"), col("p")).as("d"))
      .collect()(0).getSeq[Long](0)
    // id 1: +200 expansion; id 2: 300 contraction
    assert(out.toSeq == Seq(200L, 300L))
  }

  test("topK: boundary ties all survive for the caller's re-rank") {
    import spark.implicits._
    val blob = buildBlob(Seq((10L, 1L, 5.00), (3L, 1L, 9.00),
      (7L, 1L, 5.00), // ties 10 at 5.00 — smaller id ranks first
      (4L, 1L, 1.00),
      (8L, 1L, 9.00), // ties 3 at 9.00
      (9L, 1L, 4.00), (9L, -1L, 4.00))) // netted out — never ranked
    def top(k: Int): Seq[(Long, Long)] = Seq(blob).toDF("m")
      .select(WeightMap.topK(col("m"), k).as("t"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    // k=3's boundary weight is 500 — BOTH 500-weight ids survive as
    // candidates (ids ascend in the emit pass)
    assert(top(3).toSet == Set((3L, 900L), (8L, 900L), (7L, 500L),
      (10L, 500L)))
    assert(top(10).toSet == Set((3L, 900L), (8L, 900L), (7L, 500L),
      (10L, 500L), (4L, 100L)))
    // brute-force agreement on a random map
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      (rnd.nextInt(80).toLong, 1L, (rnd.nextInt(500)) / 100.0))
    val perId = rows.groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(r => math.round(r._3 * 100)).sum }
    val want = perId.toSeq.sortBy { case (id, w) => (-w, id) }.take(5)
    val blob2 = buildBlob(rows)
    val got = Seq(blob2).toDF("m")
      .select(WeightMap.topK(col("m"), 5).as("t"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    // candidates re-ranked with the (w desc, id asc) tiebreak == the
    // brute-force board
    assert(got.sortBy { case (id, w) => (-w, id) }.take(5) == want,
      s"got $got want $want")
  }

  test("distributed build (many partitions) == single-partition build") {
    val rows = (0 until 5000).map { i =>
      ((i % 97).toLong, 1L, (i % 13) + 0.25)
    }
    val one = df(rows).coalesce(1)
      .agg(WeightMap.buildAgg(col("id"), col("cnt"),
        WeightMap.scaled(col("w"))).as("m"))
      .collect()(0).getAs[Array[Byte]]("m")
    val many = df(rows).repartition(16)
      .agg(WeightMap.buildAgg(col("id"), col("cnt"),
        WeightMap.scaled(col("w"))).as("m"))
      .collect()(0).getAs[Array[Byte]]("m")
    assert(one.toSeq === many.toSeq)
  }
}
