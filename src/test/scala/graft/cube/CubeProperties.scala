package graft.cube

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck form of the cube engine's defining invariants
  * (SURVEY §5.2-3): for GENERATED event multisets and delete subsets,
  * incremental maintenance equals recompute, and roll-up-from-cube
  * equals direct aggregation. Complements CubeSpec's seeded trials with
  * shrinking counterexamples. */
object CubeProperties extends Properties("CubeEngine") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val cfg = CubeConfig("p", "mem",
    Seq(FieldDim("etype", "event_type")), Seq(Measure("v", "value")))

  private val genRow: Gen[(String, Timestamp, Double)] = for {
    t <- Gen.oneOf("click", "view", "buy")
    h <- Gen.choose(0, 3)
    cents <- Gen.choose(0L, 99999L)
  } yield (t, new Timestamp(1700000000000L + h * 3600000L), cents / 100.0)

  private val genCase: Gen[(List[(String, Timestamp, Double)], List[(String, Timestamp, Double)])] =
    for {
      base <- Gen.listOfN(25, genRow)
      later <- Gen.listOfN(15, genRow)
    } yield (base, later)

  private def contents(c: Cube): Set[(String, BigDecimal, Long)] =
    c.aggregates.collect().map { r =>
      (r.getAs[String]("etype"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")),
        r.getAs[Long]("_count"))
    }.toSet

  property("incremental fold == recompute (inserts + deletes)") =
    Prop.forAllNoShrink(genCase) { case (base, later) =>
      import spark.implicits._
      // delete a deterministic half of base (generator already random)
      val deleted = base.zipWithIndex.collect { case (r, i) if i % 2 == 0 => r }
      val cube0 = CubeManager.create(cfg,
        base.toDF("event_type", "ts", "value"))
      val deltas = later.toDF("event_type", "ts", "value")
        .withColumn("_sign", lit(1))
        .unionByName(deleted.toDF("event_type", "ts", "value")
          .withColumn("_sign", lit(-1)))
      val incremental = CubeManager.applyDeltas(cube0, deltas)
      val expected = CubeManager.create(cfg,
        (base.diff(deleted) ++ later).toDF("event_type", "ts", "value"))
      contents(incremental) == contents(expected)
    }

  property("roll-up from cube == direct aggregation") =
    Prop.forAllNoShrink(Gen.listOfN(40, genRow)) { rows =>
      import spark.implicits._
      val df = rows.toDF("event_type", "ts", "value")
      val cube = CubeManager.create(cfg, df)
      val fromCube = CubeManager.query(cube, Seq("etype"), sumOf = Seq("v"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val direct = df.groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .toSet
      fromCube == direct
    }
}
