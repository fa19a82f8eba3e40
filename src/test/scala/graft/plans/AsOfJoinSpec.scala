package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join vs a brute-force Scala ground truth, on randomized
  * data with the nasty cases: users with no matches, duplicate
  * timestamps (tiebreak order), matches exactly at the boundary. */
case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

class AsOfJoinSpec extends AnyFunSuite {
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

  private def gen(n: Int, users: Int, seed: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // coarse time quantization on purpose: forces duplicate timestamps
      Ev(rnd.nextInt(users).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(50) * 1000L),
        i.toLong, rnd.nextInt(1000) / 10.0)
    }
  }

  test("native as-of == brute force, with ties and no-match users") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    for (trial <- 1 to 5) {
      val all = gen(400 + rnd.nextInt(200), users = 12, seed = trial)
      val (lSeq, rSeq) = all.partition(_.event_id % 3 == 0)
      val left = lSeq.toDF()
      val right = rSeq.toDF()
      val got = AsOf.join(spark, left, right, "user_id",
          Seq("ts", "event_id"))
        .select(col("event_id"), col("r_event_id"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expect = lSeq.map { l =>
        val cands = rSeq.filter(r => r.user_id == l.user_id &&
          (r.ts.getTime < l.ts.getTime ||
            (r.ts.getTime == l.ts.getTime && r.event_id < l.event_id)))
        val best = if (cands.isEmpty) -1L
          else cands.maxBy(r => (r.ts.getTime, r.event_id)).event_id
        l.event_id -> best
      }.toMap
      assert(got == expect, s"trial $trial diverged")
    }
  }

  test("null join keys never match (SQL semantics)") {
    val l = spark.sql(
      """SELECT * FROM VALUES (CAST(NULL AS BIGINT), 10L, 1L), (1L, 10L, 2L)
         AS t(user_id, ts, event_id)""")
    val r = spark.sql(
      """SELECT * FROM VALUES (CAST(NULL AS BIGINT), 5L, 3L), (1L, 5L, 4L)
         AS t(user_id, ts, event_id)""")
    val got = AsOf.join(spark, l, r, "user_id", Seq("ts", "event_id"))
      .orderBy(col("event_id"))
      .collect()
      .map(x => (x.getLong(2), if (x.isNullAt(5)) -1L else x.getLong(5)))
    assert(got.toSeq == Seq((1L, -1L), (2L, 4L)))
  }

  test("physical plan uses AsOfJoinExec with clustered exchanges") {
    import spark.implicits._
    val left = gen(50, 5, 99).toDF()
    val right = gen(50, 5, 98).toDF()
    val df = AsOf.join(spark, left, right, "user_id", Seq("ts", "event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }
}
