package graft.cube

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cube engine invariants (SURVEY.md §5.2-3):
  * incrementally maintained cube == cube recomputed from the final state,
  * for randomized insert/delete/update sequences; roll-up queries from
  * the cube == direct aggregation of the source; persistence roundtrip.
  */
class CubeSpec extends AnyFunSuite {
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

  private val cfg = CubeConfig(
    name = "t",
    source = "mem",
    dims = Seq(FieldDim("etype", "event_type"), TimeDim("hour", "ts", "hour")),
    measures = Seq(Measure("v", "value")))

  private def toDf(rows: Seq[(String, Timestamp, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "ts", "value")
  }

  private def contents(c: Cube): Set[(String, Timestamp, BigDecimal, Long)] =
    c.aggregates.collect().map { r =>
      (r.getAs[String]("etype"), r.getAs[Timestamp]("hour"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v")), r.getAs[Long]("_count"))
    }.toSet

  private def randomRows(rnd: scala.util.Random, n: Int) =
    (0 until n).map { _ =>
      (Seq("click", "view", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(6) * 3600000L
          + rnd.nextInt(3600000)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }

  test("incremental fold == recompute, randomized insert/delete/update") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val all = randomRows(rnd, 30 + rnd.nextInt(40))
      val (base, later) = all.splitAt(all.size / 2)
      val deleted = base.filter(_ => rnd.nextBoolean())
      val (updFrom, kept) = later.splitAt(later.size / 3)
      val updTo = updFrom.map { case (t, ts, v) => (t, ts, v + 1.5) }

      // final logical state: base - deleted + (updTo ++ kept)
      val finalRows = base.diff(deleted) ++ updTo ++ kept
      val expected = CubeManager.create(cfg, toDf(finalRows))

      // incremental path: two successive delta batches
      val cube0 = CubeManager.create(cfg, toDf(base))
      val batch1 = toDf(later).withColumn("_sign", lit(1))
      val cube1 = CubeManager.applyDeltas(cube0, batch1)
      val batch2 = toDf(deleted ++ updFrom).withColumn("_sign", lit(-1))
        .unionByName(toDf(updTo).withColumn("_sign", lit(1)))
      val cube2 = CubeManager.applyDeltas(cube1, batch2)

      assert(contents(cube2) == contents(expected), s"trial $trial diverged")
    }
  }

  test("weighted partials: signed fold == from-scratch, no delete latch") {
    import spark.implicits._
    val wcfg = CubeConfig("w", "mem",
      dims = Seq(TimeDim("day", "ts", "day")),
      measures = Nil,
      weighted = Seq(WeightedMeasure("ltv", "user_id", "value")))
    def toDfW(rows: Seq[(Long, Timestamp, Double)]): DataFrame =
      rows.toDF("user_id", "ts", "value")
    def blobs(c: Cube): Map[Timestamp, Seq[Byte]] =
      c.aggregates.collect().map(r => r.getAs[Timestamp]("day") ->
        r.getAs[Array[Byte]]("ltv").toSeq).toMap
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 10) {
      val all = (0 until 40 + rnd.nextInt(40)).map { _ =>
        ((rnd.nextInt(12) + 1).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(4) * 86400000L),
          math.round(rnd.nextDouble() * 10000) / 100.0)
      }
      val (base, later) = all.splitAt(all.size / 2)
      val deleted = base.filter(_ => rnd.nextBoolean())
      val finalRows = base.diff(deleted) ++ later
      val expected = CubeManager.create(wcfg, toDfW(finalRows))
      val cube0 = CubeManager.create(wcfg, toDfW(base))
      val cube1 = CubeManager.applyDeltas(cube0,
        toDfW(later).withColumn("_sign", lit(1)))
      // deletes fold SOURCELESS — the weighted family is invertible,
      // so (unlike every other per-id family) nothing latches and the
      // netted blobs still equal the from-scratch build bit for bit
      val cube2 = CubeManager.applyDeltas(cube1,
        toDfW(deleted).withColumn("_sign", lit(-1)))
      assert(!cube2.hasDeletes, s"trial $trial latched")
      assert(blobs(cube2) == blobs(expected), s"trial $trial diverged")
    }
  }

  test("dict-weighted maps: string-keyed folds serve == from-scratch") {
    import spark.implicits._
    // a weighted measure over a STRING id rides the dictBitmaps
    // dictionary (weightedIdCol) — per-id sums stay exact under any
    // injective encoding, so the id-free matrices AND the translated
    // leaderboard equal a from-scratch build even though the two
    // dictionaries assign different dense ids
    val dwCfg = CubeConfig("dw", "mem",
      dims = Seq(TimeDim("day", "ts", "day")),
      measures = Nil,
      dictBitmaps = Seq(Measure("us", "uid")),
      weighted = Seq(WeightedMeasure("ltv", "uid", "value")))
    def toDfW(rows: Seq[(String, Timestamp, Double)]): DataFrame =
      rows.toDF("uid", "ts", "value")
    val rnd = new scala.util.Random(83)
    val all = (0 until 120).map { i =>
      (s"u${rnd.nextInt(25)}",
        new Timestamp(1700000000000L + rnd.nextInt(5) * 86400000L),
        math.round(rnd.nextDouble() * 1000) / 100.0)
    }
    // the delta carries UNSEEN keys (u90..) plus re-inserts and
    // sourceless deletes of seen rows
    val (base, extraSeen) = all.splitAt(80)
    val unseen = (0 until 20).map { i =>
      (s"u9$i", new Timestamp(1700000000000L + (i % 5) * 86400000L),
        math.round(rnd.nextDouble() * 1000) / 100.0)
    }
    val deleted = base.take(7)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dw_svc").toString
    val svc = new CubeService(spark, dir)
    svc.createCube(dwCfg, toDfW(base))
    svc.updateAggregates("dw",
      toDfW(extraSeen ++ unseen).withColumn("_sign", lit(1)))
    svc.updateAggregates("dw",
      toDfW(deleted).withColumn("_sign", lit(-1)))
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_dw_svc2").toString
    val svc2 = new CubeService(spark, dir2)
    svc2.createCube(dwCfg.copy(name = "dw2"),
      toDfW(base.drop(7) ++ extraSeen ++ unseen))
    // the id-free matrix AND the id-VISIBLE leaderboard (dict ids
    // translated back to the original string keys) both match
    assert(svc.getCohortValue("dw", "day", "ltv", periodDays = 1)
        .collect().map(_.toSeq).toSeq ==
      svc2.getCohortValue("dw2", "day", "ltv", periodDays = 1)
        .collect().map(_.toSeq).toSeq,
      "dict-weighted cohort value: fold != from-scratch")
    assert(svc.getTopSpenders("dw", "day", "ltv", k = 4, periodDays = 1)
        .collect().map(_.toSeq).toSeq ==
      svc2.getTopSpenders("dw2", "day", "ltv", k = 4, periodDays = 1)
        .collect().map(_.toSeq).toSeq,
      "dict-weighted leaderboard: fold != from-scratch")
    // the sourceless delete latched the BITMAP family (insert-only) —
    // but the weighted serves above kept answering: the families'
    // documented split
    val e = intercept[IllegalArgumentException] {
      svc.getRolling("dw", "day", exactDistinctOf = Seq("us")) }
    assert(e.getMessage.contains("insert-only"))
    svc.deleteCube("dw"); svc2.deleteCube("dw2")
  }

  test("roll-up query from cube == direct aggregation of source") {
    val rnd = new scala.util.Random(7)
    val rows = randomRows(rnd, 200)
    val df = toDf(rows)
    val cube = CubeManager.create(cfg, df)
    val fromCube = CubeManager.query(cube, Seq("etype"),
        sumOf = Seq("v"), avgOf = Seq("v"))
      .orderBy("etype").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val direct = df.groupBy(col("event_type").as("etype"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
        (sum(col("value").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("a"),
        count(lit(1)).as("n"))
      .orderBy("etype").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(fromCube.toSeq == direct.toSeq)
  }

  test("groups emptied by deletes are dropped") {
    val rows = Seq(("click", new Timestamp(1700000000000L), 5.0))
    val cube = CubeManager.create(cfg, toDf(rows))
    val afterDelete = CubeManager.applyDeltas(cube,
      toDf(rows).withColumn("_sign", lit(-1)))
    assert(afterDelete.aggregates.count() == 0)
  }

  test("over-deletion tombstones: a later insert nets against the debt") {
    val row = Seq(("click", new Timestamp(1700000000000L), 5.0))
    val cube = CubeManager.create(cfg, toDf(row))
    // delete the row twice (over-deletion): count nets to -1
    val overDel = CubeManager.applyDeltas(cube,
      toDf(row ++ row).withColumn("_sign", lit(-1)))
    assert(overDel.live.count() == 0, "tombstone must be hidden from live")
    assert(overDel.aggregates.count() == 1, "tombstone state must be kept")
    // two later identical inserts: 1 - 2 + 2 = 1, exactly the from-scratch
    // signed recompute — a restart-from-zero would show count 2
    val after = CubeManager.applyDeltas(overDel,
      toDf(row ++ row).withColumn("_sign", lit(1)))
    assert(contents(after) == contents(CubeManager.create(cfg, toDf(row))))
  }

  test("persistence roundtrip: save/list/load/delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cubes").toString
    val rows = randomRows(new scala.util.Random(3), 50)
    val cube = CubeManager.create(cfg, toDf(rows))
    CubeManager.save(cube, dir)
    assert(CubeManager.list(dir) == Seq("t"))
    val loaded = CubeManager.load(spark, dir, "t")
    assert(loaded.config == cfg)
    assert(contents(loaded) == contents(cube))
    CubeManager.delete(dir, "t")
    assert(CubeManager.list(dir).isEmpty)
  }

  test("config json roundtrip") {
    val json = CubeManager.configToJson(cfg)
    assert(CubeManager.configFromJson(json) == cfg)
    val withExpr = cfg.copy(dims = cfg.dims :+
      ExprDim("kb", "CAST(get_json_object(props, '$.k') AS BIGINT) % 10"))
    assert(CubeManager.configFromJson(
      CubeManager.configToJson(withExpr)) == withExpr)
    // every measure family round-trips, extremes included
    val full = cfg.copy(
      sketches = Seq(Measure("users", "user_id")),
      quantiles = Seq(Measure("dist", "value")),
      extremes = Seq(Measure("vx", "value")),
      weighted = Seq(WeightedMeasure("ltv", "user_id", "value")))
    assert(CubeManager.configFromJson(
      CubeManager.configToJson(full)) == full)
    // configs persisted BEFORE the extremes feature (no "extremes" key)
    // still parse, with an empty extremes list
    val legacy = CubeManager.configToJson(cfg)
      .replace(""","extremes":[]""", "")
    assert(CubeManager.configFromJson(legacy) == cfg)
  }

  test("minimal wire configs parse for EVERY subset of sections present") {
    // Hand-written wire clients omit sections they don't use (the r13
    // AdminServerSpec regression: dims followed directly by bitmaps
    // mis-parsed the bitmap entry as a FieldDim AND a measure). Each
    // section regex must capture its own flat array regardless of
    // which sections follow — exercised here over all 2^6 subsets.
    val sections = Seq(
      "measures" -> Seq(Measure("rev", "amount")),
      "sketches" -> Seq(Measure("hll_u", "user_id")),
      "quantiles" -> Seq(Measure("qv", "value")),
      "extremes" -> Seq(Measure("vx", "value")),
      "freq" -> Seq(Measure("topp", "page")),
      "bitmaps" -> Seq(Measure("u", "user_id")),
      "dictBitmaps" -> Seq(Measure("us", "uid_s")))
    // the weighted section's entries have their own field names
    // (idPath/weightPath) — toggled as an 8th independent section
    val weightedJson =
      """"weighted":[{"id":"ltv","idPath":"user_id","weightPath":"value"}]"""
    val weightedWant = Seq(WeightedMeasure("ltv", "user_id", "value"))
    val dimsJson =
      """"dims":[{"id":"day","path":"ts","kind":"time","granularity":"day"},{"id":"cc","path":"country"}]"""
    val dims = Seq(TimeDim("day", "ts", "day"), FieldDim("cc", "country"))
    for (mask <- 0 until (1 << (sections.length + 1))) {
      val present = sections.zipWithIndex.collect {
        case ((k, ms), i) if (mask & (1 << i)) != 0 => (k, ms)
      }
      val weightedPresent = (mask & (1 << sections.length)) != 0
      val body = present.map { case (k, ms) =>
        s""""$k":[${ms.map(m => s"""{"id":"${m.id}","path":"${m.path}"}""").mkString(",")}]"""
      } ++ (if (weightedPresent) Seq(weightedJson) else Nil)
      val json =
        (Seq(""""name":"t"""", """"source":"events"""", dimsJson) ++ body)
          .mkString("{", ",", "}")
      val parsed = CubeManager.configFromJson(json)
      def want(k: String): Seq[Measure] =
        present.collectFirst { case (`k`, ms) => ms }.getOrElse(Nil)
      assert(parsed.dims == dims, s"mask=$mask dims")
      assert(parsed.measures == want("measures"), s"mask=$mask measures")
      assert(parsed.sketches == want("sketches"), s"mask=$mask sketches")
      assert(parsed.quantiles == want("quantiles"), s"mask=$mask quantiles")
      assert(parsed.extremes == want("extremes"), s"mask=$mask extremes")
      assert(parsed.freq == want("freq"), s"mask=$mask freq")
      assert(parsed.bitmaps == want("bitmaps"), s"mask=$mask bitmaps")
      assert(parsed.dictBitmaps == want("dictBitmaps"),
        s"mask=$mask dictBitmaps")
      assert(parsed.weighted ==
        (if (weightedPresent) weightedWant else Nil), s"mask=$mask weighted")
    }
  }

  test("dotted nested field paths work as dimensions and measures") {
    // the MongoDB document model: dimensions/measures live at a.b.c
    import spark.implicits._
    val df = Seq(
      (("mobile", ("ios", 1.5)), 2.0),
      (("mobile", ("android", 2.5)), 3.0),
      (("web", ("chrome", 4.0)), 5.0))
      .toDF("meta", "v")
      .selectExpr(
        "named_struct('channel', meta._1, 'client', " +
          "named_struct('os', meta._2._1, 'score', meta._2._2)) AS meta",
        "v")
    val nestedCfg = CubeConfig("nested", "mem",
      Seq(FieldDim("channel", "meta.channel"), FieldDim("os", "meta.client.os")),
      Seq(Measure("score", "meta.client.score"), Measure("v", "v")))
    val cube = CubeManager.create(nestedCfg, df)
    val rows = cube.aggregates.orderBy("channel", "os").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue,
        r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("mobile", "android", 2.5, 3.0, 1L),
      ("mobile", "ios", 1.5, 2.0, 1L),
      ("web", "chrome", 4.0, 5.0, 1L)))
  }

  test("time dimension granularities bucket correctly") {
    import spark.implicits._
    val ts = new Timestamp(1700000000000L) // 2023-11-14T22:13:20Z
    val df = Seq(("a", ts, 1.0)).toDF("event_type", "ts", "value")
    def bucket(g: String): Timestamp = {
      val c = CubeConfig("g", "mem",
        Seq(TimeDim("b", "ts", g)), Seq(Measure("v", "value")))
      CubeManager.create(c, df).aggregates.collect().head.getAs[Timestamp]("b")
    }
    assert(bucket("hour").toInstant.toString == "2023-11-14T22:00:00Z")
    assert(bucket("day").toInstant.toString == "2023-11-14T00:00:00Z")
    assert(bucket("month").toInstant.toString == "2023-11-01T00:00:00Z")
    assert(bucket("year").toInstant.toString == "2023-01-01T00:00:00Z")
    intercept[IllegalArgumentException] { TimeDim("b", "ts", "fortnight") }
  }

  test("multi-measure cube: independent sums maintained through deltas") {
    import spark.implicits._
    val cfg2 = CubeConfig("mm", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value"), Measure("w", "weight")))
    val base = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 5.0, 50.0))
      .toDF("event_type", "value", "weight")
    val cube = CubeManager.create(cfg2, base)
    val deltas = Seq(("a", 1.0, 10.0, -1), ("b", 7.0, 70.0, 1))
      .toDF("event_type", "value", "weight", "_sign")
    val updated = CubeManager.applyDeltas(cube, deltas)
    val rows = updated.aggregates.orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue,
        r.getDecimal(2).doubleValue, r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 2.0, 20.0, 1L), ("b", 12.0, 120.0, 2L)))
  }

  test("q119: HLL union of day partials == whole-corpus sketch, within error of exact") {
    val out = CubeQueries.q119HllCube(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // hll_sketch_estimate returns BIGINT
      val (merged, whole, exact) = (r.getAs[Long]("est_merged"),
        r.getAs[Long]("est_whole"), r.getAs[Long]("exact"))
      // mergeability: folding per-day partials must equal sketching the
      // whole input (same lgK, same values — the cube-maintenance claim)
      assert(merged == whole,
        s"${r.getString(0)}: union-of-parts $merged != whole $whole")
      // standard HLL relative error at default lgK=12 is ~1.6%; allow 5%
      assert(math.abs(merged - exact) <= math.max(exact * 0.05, 2.0),
        s"${r.getString(0)}: estimate $merged vs exact $exact")
    }
  }

  test("sketch measures: create/fold/query/persist lifecycle") {
    import spark.implicits._
    val cfg = CubeConfig("sk", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value")),
      sketches = Seq(Measure("users", "user_id")))
    val base = Seq(("a", 1.0, 10L), ("a", 2.0, 11L), ("a", 3.0, 10L),
      ("b", 5.0, 20L)).toDF("event_type", "value", "user_id")
    val cube = CubeManager.create(cfg, base)
    def distincts(c: Cube): Map[String, Long] =
      CubeManager.query(c, Seq("k"), distinctOf = Seq("users"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct_users"))
        .toMap
    assert(distincts(cube) == Map("a" -> 2L, "b" -> 1L))
    // insert-only fold == from-scratch sketch over the union
    val inserts = Seq(("a", 4.0, 12L, 1), ("b", 6.0, 20L, 1))
      .toDF("event_type", "value", "user_id", "_sign")
    val folded = CubeManager.applyDeltas(cube, inserts)
    assert(distincts(folded) == Map("a" -> 3L, "b" -> 1L))
    // deletes adjust sums/counts but leave the sketch an upper bound
    val deletes = Seq(("a", 1.0, 10L, -1))
      .toDF("event_type", "value", "user_id", "_sign")
    val afterDel = CubeManager.applyDeltas(folded, deletes)
    val aRow = afterDel.live.filter(col("k") === "a").collect().head
    assert(aRow.getAs[Long](CubeManager.CountCol) == 3L)
    assert(distincts(afterDel)("a") == 3L, "sketch stays an upper bound")
    // persistence round-trips the sketch column and the config
    val dir = java.nio.file.Files.createTempDirectory("graft_skcube").toString
    CubeManager.save(afterDel, dir)
    val loaded = CubeManager.load(spark, dir, "sk")
    assert(loaded.config.sketches == cfg.sketches)
    assert(distincts(loaded) == distincts(afterDel))
  }

  test("min/max measures: create/fold/query/persist lifecycle, delete latch") {
    import spark.implicits._
    val cfg = CubeConfig("mm", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value")),
      extremes = Seq(Measure("value", "value")))
    val base = Seq(("a", 3.0), ("a", 7.0), ("b", 5.0))
      .toDF("event_type", "value")
    val cube = CubeManager.create(cfg, base)
    def extremes(c: Cube): Map[String, (Double, Double)] =
      CubeManager.query(c, Seq("k"),
          minOf = Seq("value"), maxOf = Seq("value"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Double]("min_value"), r.getAs[Double]("max_value"))).toMap
    assert(extremes(cube) == Map("a" -> (3.0, 7.0), "b" -> (5.0, 5.0)))
    // insert folds extend the stored extremes exactly
    val inserts = Seq(("a", 1.0, 1), ("b", 9.0, 1), ("c", 4.0, 1))
      .toDF("event_type", "value", "_sign")
    val folded = CubeManager.applyDeltas(cube, inserts)
    assert(!folded.hasDeletes)
    assert(extremes(folded) ==
      Map("a" -> (1.0, 7.0), "b" -> (5.0, 9.0), "c" -> (4.0, 4.0)))
    // an insert-only batch that leaves a group untouched keeps its stored
    // extremes through the null-skipping merge (no "c" rows here)
    val more = Seq(("a", 5.0, 1)).toDF("event_type", "value", "_sign")
    assert(extremes(CubeManager.applyDeltas(folded, more))("c") == (4.0, 4.0))
    // the first delete trips the persisted latch: sums keep serving,
    // min/max serves refuse (a delete cannot un-see an extreme)
    val deletes = Seq(("a", 1.0, -1)).toDF("event_type", "value", "_sign")
    val afterDel = CubeManager.applyDeltas(folded, deletes)
    assert(afterDel.hasDeletes)
    assert(CubeManager.query(afterDel, Seq("k"), sumOf = Seq("v"))
      .collect().nonEmpty)
    intercept[IllegalArgumentException] {
      CubeManager.query(afterDel, Seq("k"), minOf = Seq("value"))
    }
    // unknown extreme id fails fast
    intercept[IllegalArgumentException] {
      CubeManager.query(folded, Seq("k"), maxOf = Seq("nope"))
    }
    // persistence round-trips the partial columns, the config, the latch
    val dir = java.nio.file.Files.createTempDirectory("graft_mmcube").toString
    CubeManager.save(folded, dir)
    val loaded = CubeManager.load(spark, dir, "mm")
    assert(loaded.config.extremes == cfg.extremes)
    assert(extremes(loaded) == extremes(folded))
    CubeManager.save(afterDel, dir)
    assert(CubeManager.load(spark, dir, "mm").hasDeletes)
  }

  test("delete-capable extremes: fold with source == from-scratch recompute, no latch") {
    import spark.implicits._
    val cfg = CubeConfig("dmm", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value")),
      extremes = Seq(Measure("value", "value")))
    def extremes(c: Cube): Map[String, (Double, Double)] =
      CubeManager.query(c, Seq("k"),
          minOf = Seq("value"), maxOf = Seq("value"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Double]("min_value"), r.getAs[Double]("max_value"))).toMap
    // deletes remove BOTH a group's min (a:1) and max (b:9), plus a
    // mid value (a:5) — the recompute must find the surviving bounds
    val base = Seq(("a", 1.0), ("a", 5.0), ("a", 7.0),
      ("b", 2.0), ("b", 9.0), ("c", 4.0)).toDF("event_type", "value")
    val cube = CubeManager.create(cfg, base)
    val deletes = Seq(("a", 1.0, -1), ("a", 5.0, -1), ("b", 9.0, -1))
      .toDF("event_type", "value", "_sign")
    val remaining = Seq(("a", 7.0), ("b", 2.0), ("c", 4.0))
      .toDF("event_type", "value")
    val folded = CubeManager.applyDeltas(cube, deletes,
      source = Some(remaining))
    // the latch did NOT trip: min/max keep serving, and they equal a
    // from-scratch recompute over the post-delete state
    assert(!folded.hasDeletes, "delete-capable fold must not latch")
    assert(extremes(folded) == extremes(CubeManager.create(cfg, remaining)),
      "targeted recompute diverged from from-scratch")
    // untouched cell c kept its partials (and they are still right)
    assert(extremes(folded)("c") == (4.0, 4.0))
    // sums/counts still net exactly
    val sums = CubeManager.query(folded, Seq("k"), sumOf = Seq("v"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("sum_v"), r.getAs[Long]("n_rows"))).toMap
    assert(sums == Map("a" -> (7.0, 1L), "b" -> (2.0, 1L),
      "c" -> (4.0, 1L)))
    // a group deleted down to nothing drops entirely
    val delC = Seq(("c", 4.0, -1)).toDF("event_type", "value", "_sign")
    val rem2 = remaining.filter(col("event_type") =!= "c")
    val folded2 = CubeManager.applyDeltas(folded, delC, Some(rem2))
    assert(!extremes(folded2).contains("c"))
    // WITHOUT the source the old refusal discipline still stands
    val latched = CubeManager.applyDeltas(folded, delC)
    assert(latched.hasDeletes)
    intercept[IllegalArgumentException] {
      CubeManager.query(latched, Seq("k"), minOf = Seq("value"))
    }
    // a sketch-carrying cube is delete-capable WITH the source too —
    // touched cells' sketches are rebuilt from the source with the
    // create-time builders, so the fold does not latch
    val scfg = cfg.copy(name = "dmm2",
      sketches = Seq(Measure("u", "event_type")))
    val scube = CubeManager.create(scfg, base)
    assert(!CubeManager.applyDeltas(scube, deletes, Some(remaining))
      .hasDeletes)
    // …and WITHOUT the source it latches exactly as before
    assert(CubeManager.applyDeltas(scube, deletes).hasDeletes)
  }

  test("delete-capable sketches: all non-invertible families recompute, no latch") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val all = (0 until 400).map { i =>
      (Seq("a", "b", "c")(rnd.nextInt(3)),
        math.round(rnd.nextDouble() * 1000) / 10.0,
        (rnd.nextInt(50) + 1).toLong,
        s"w${rnd.nextInt(12)}")
    }
    val cfg = CubeConfig("dsk", "mem",
      Seq(FieldDim("k", "grp")),
      Seq(Measure("v", "value")),
      sketches = Seq(Measure("users", "uid")),
      quantiles = Seq(Measure("vdist", "value")),
      extremes = Seq(Measure("vx", "value")),
      freq = Seq(Measure("words", "word")))
    def df(rows: Seq[(String, Double, Long, String)]) =
      rows.toDF("grp", "value", "uid", "word")
    val cube = CubeManager.create(cfg, df(all))
    // delete every 'a' row with value below the group median-ish cut,
    // plus a few 'b' rows — two touched cells, one untouched ('c')
    val gone = all.filter(r => (r._1 == "a" && r._2 < 50.0) ||
      (r._1 == "b" && r._4 == "w3"))
    assert(gone.nonEmpty && gone.exists(_._1 == "a")
      && gone.exists(_._1 == "b"))
    val remaining = all.diff(gone)
    val folded = CubeManager.applyDeltas(cube,
      df(gone).withColumn("_sign", lit(-1L)), Some(df(remaining)))
    assert(!folded.hasDeletes, "all-family delete-capable fold latched")
    val scratch = CubeManager.create(cfg, df(remaining))
    // HLL: estimate-equal to from-scratch (union at fixed lgK is
    // register-equivalent; touched cells are literally re-built)
    def distincts(c: Cube) = CubeManager.query(c, Seq("k"),
        distinctOf = Seq("users")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct_users")).toMap
    assert(distincts(folded) == distincts(scratch),
      s"HLL diverged: ${distincts(folded)} vs ${distincts(scratch)}")
    // extremes: bit-equal
    def exts(c: Cube) = CubeManager.query(c, Seq("k"),
        minOf = Seq("vx"), maxOf = Seq("vx")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("min_vx"), r.getAs[Double]("max_vx"))).toMap
    assert(exts(folded) == exts(scratch))
    // CMS heavy hitters: count-equal (CMS is linear; rebuilt cells are
    // exact create-time builds, untouched cells additive == one-pass)
    def tops(c: Cube) = CubeManager.query(c, Seq("k"),
        topkOf = Seq(("words", 3))).collect()
      .map(r => r.getString(0) -> r.getAs[Seq[Row]]("topk_words")
        .map(x => (x.getString(0), x.getLong(1))).toSet).toMap
    assert(tops(folded) == tops(scratch),
      s"CMS diverged: ${tops(folded)} vs ${tops(scratch)}")
    // KLL: rank-randomized, so rank-band vs exact per group
    val p50 = CubeManager.query(folded, Seq("k"),
        quantilesOf = Seq(("vdist", 0.5))).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50_vdist")).toMap
    remaining.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val rank = sorted.indexWhere(_ >= p50(g)).toDouble / sorted.size
      assert(math.abs(rank - 0.5) <= 0.05,
        s"group $g: folded p50 ${p50(g)} at rank $rank")
    }
    // the deleted values are really unseeable: the dominant deleted
    // word w3 must not surface in b's served top-k unless it survives
    val bW3Remaining = remaining.count(r => r._1 == "b" && r._4 == "w3")
    assert(bW3Remaining == 0)
    assert(!tops(folded)("b").exists(_._1 == "w3"),
      "deleted word still served from b's rebuilt CMS")
  }

  test("quantile measures: create/fold/query/persist lifecycle, merge-safe rank bound") {
    import spark.implicits._
    val cfgQ = CubeConfig("kq", "mem",
      Seq(FieldDim("k", "event_type"), FieldDim("bucket", "bucket")),
      Seq(Measure("v", "value")),
      quantiles = Seq(Measure("dist", "value")))
    // group "a" spans 7 cells so the roll-up exercises the KLL UNION
    // path, not just a single-cell read; values are distinct 1..1000 so
    // rank(v) = v/1000 exactly
    val base = (1 to 1000).map(i => ("a", i % 7, i.toDouble)) ++
      (1 to 100).map(i => ("b", i % 7, i.toDouble))
    val cube = CubeManager.create(cfgQ, base.toDF("event_type", "bucket", "value"))
    assert(cube.aggregates.count() == 14)
    def p50(c: Cube): Map[String, Double] =
      CubeManager.query(c, Seq("k"), quantilesOf = Seq(("dist", 0.5)))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("p50_dist")).toMap
    // 3x the two-sided 99% bound: the union of 7 partials must keep the
    // single-sketch guarantee (merge-shape independence is THE property
    // a cube measure needs)
    val eps = 3 * graft.functions.Kll.rankError() + 0.005
    val m = p50(cube)
    assert(math.abs(m("a") / 1000.0 - 0.5) <= eps, s"a median ${m("a")}")
    assert(math.abs(m("b") / 100.0 - 0.5) <= eps, s"b median ${m("b")}")
    // insert-only fold: shift a's distribution upward with 1000 new
    // values 1001..2000 — the folded median must track the new rank
    val inserts = (1001 to 2000).map(i => ("a", i % 7, i.toDouble, 1))
      .toDF("event_type", "bucket", "value", "_sign")
    val folded = CubeManager.applyDeltas(cube, inserts)
    assert(math.abs(p50(folded)("a") / 2000.0 - 0.5) <= eps,
      "fold did not absorb the delta distribution")
    // deletes adjust sums/counts but leave the sketch (insert-only,
    // the documented contract)
    val deletes = Seq(("b", 1, 1.0, -1))
      .toDF("event_type", "bucket", "value", "_sign")
    val afterDel = CubeManager.applyDeltas(folded, deletes)
    assert(math.abs(p50(afterDel)("b") / 100.0 - 0.5) <= eps)
    // persistence round-trips the binary sketch column and the config.
    // NOTE: no exact-equality check against the unsaved cube — its
    // aggregates are a lazy plan, so every query re-runs the randomized
    // KLL compaction; the saved bytes are one fixed draw. The loaded
    // sketch must still satisfy the rank bound.
    val dir = java.nio.file.Files.createTempDirectory("graft_kllcube").toString
    CubeManager.save(afterDel, dir)
    val loaded = CubeManager.load(spark, dir, "kq")
    assert(loaded.config == cfgQ)
    val lm = p50(loaded)
    assert(math.abs(lm("a") / 2000.0 - 0.5) <= eps, s"loaded a median ${lm("a")}")
    // group b holds 99 ≤ k values, so its sketch — and the union of its
    // 7 partials — never compacts: the quantile read is EXACT and
    // deterministic (the sub-capacity contract)
    assert(lm("b") == 50.0, s"sub-capacity sketch must be exact: ${lm("b")}")
  }

  test("quantile labels stay distinct for nearby ranks") {
    import spark.implicits._
    val cfgQ = CubeConfig("lbl", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value")),
      quantiles = Seq(Measure("dist", "value")))
    val cube = CubeManager.create(cfgQ,
      (1 to 50).map(i => ("a", i.toDouble)).toDF("event_type", "value"))
    val cols = CubeManager.query(cube, Seq("k"),
      quantilesOf = Seq(("dist", 0.995), ("dist", 0.999),
        ("dist", 0.005), ("dist", 0.01), ("dist", 0.5))).columns.toSeq
    // a rounded %02d label would collide 0.995/0.999 (both "p100") and
    // 0.005/0.01 (both "p01"); canonical-decimal labels must not
    val qcols = cols.filter(_.startsWith("p"))
    assert(qcols == Seq("p99_5_dist", "p99_9_dist", "p0_5_dist",
      "p1_dist", "p50_dist"), s"labels: $qcols")
    assert(qcols.distinct.size == qcols.size)
  }

  test("q130: rolled-up KLL percentiles land within rank-error of target") {
    val sfDir = "/root/testdata/sf0.001"
    val out = CubeQueries.q130CubeQuantiles(spark, sfDir).collect()
    assert(out.nonEmpty)
    // verify in RANK space (value-space error is density-dependent):
    // the fraction of the group's values at or below the estimate must
    // sit within the (3x, 99%) KLL band around the requested rank
    val values = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted
      }
    val eps = 3 * graft.functions.Kll.rankError() + 0.01
    out.foreach { r =>
      val vs = values(r.getString(0))
      def rank(est: Double): Double =
        vs.count(_ <= est).toDouble / vs.length
      assert(math.abs(rank(r.getAs[Double]("p50_value_dist")) - 0.5) <= eps,
        s"${r.getString(0)} p50 rank off")
      assert(math.abs(rank(r.getAs[Double]("p90_value_dist")) - 0.9) <= eps,
        s"${r.getString(0)} p90 rank off")
    }
  }

  test("q139: rolling 7-day HLL merge tracks exact rolling distinct on every endpoint") {
    val sfDir = "/root/testdata/sf0.001"
    val est = CubeQueries.q139RollingDistinctHll(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("est_users_7d")).toMap
    val exact = graft.operators.EventQueries.q138RollingDistinct(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_users_7d")).toMap
    // both forms window over the same observed-day endpoints
    assert(est.keySet == exact.keySet,
      s"endpoint sets differ: ${est.keySet diff exact.keySet} / ${exact.keySet diff est.keySet}")
    assert(est.nonEmpty)
    exact.foreach { case (day, n) =>
      // standard HLL relative error at default lgK=12 is ~1.6%; allow 5%
      assert(math.abs(est(day) - n) <= math.max(n * 0.05, 2.0),
        s"day $day: merged estimate ${est(day)} vs exact $n")
    }
  }

  test("q141: rolling KLL quantiles land within rank-error of the exact window") {
    val sfDir = "/root/testdata/sf0.001"
    val out = CubeQueries.q141RollingQuantilesKll(spark, sfDir).collect()
    assert(out.nonEmpty)
    // exact per-endpoint windows, in rank space (q130 discipline)
    val raw = graft.Tables.events(spark, sfDir)
      .select((unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").as("d"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val eps = 3 * graft.functions.Kll.rankError() + 0.01
    out.foreach { r =>
      val day = r.getAs[Long]("day")
      val vs = raw.filter(p => p._1 >= day - 6 && p._1 <= day).map(_._2).sorted
      assert(vs.length == r.getAs[Long]("n_rows"),
        s"day $day: window row count ${r.getAs[Long]("n_rows")} != ${vs.length}")
      def rank(est: Double): Double = vs.count(_ <= est).toDouble / vs.length
      assert(math.abs(rank(r.getAs[Double]("p50_value")) - 0.5) <= eps,
        s"day $day p50 rank off")
      assert(math.abs(rank(r.getAs[Double]("p90_value")) - 0.9) <= eps,
        s"day $day p90 rank off")
    }
  }

  test("q120: inclusion-exclusion overlap estimates track exact overlaps") {
    val out = CubeQueries.q120AudienceOverlap(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Long]("est_overlap")
      val exact = r.getAs[Long]("exact_overlap")
      // three ~1.6% sketches compound through the subtraction; 15% of
      // the exact overlap (or a small absolute floor) bounds the drift
      assert(math.abs(est - exact) <= math.max(exact * 0.15, 5.0),
        s"${r.getString(0)}∩${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("freq candidates stay bounded across many folds; cumulative hitter survives") {
    import spark.implicits._
    val cfg = CubeConfig("fqb", "mem",
      Seq(FieldDim("g", "grp")),
      Seq(Measure("n", "one")),
      freq = Seq(Measure("w", "word")))
    // batch b: 40 filler words unique to the batch (once each) plus a
    // 'hot' key appearing 5× — per-batch top-32 always includes hot,
    // the 200 cumulative fillers would blow the candidate array to 5×
    // the budget without the merge-time re-trim
    def batch(b: Int) = ((0 until 40).map(i => ("x", s"f_${b}_$i", 1)) ++
      Seq.fill(5)(("x", "hot", 1))).toDF("grp", "word", "one")
    var cube = CubeManager.create(cfg, batch(0))
    for (b <- 1 to 4)
      cube = CubeManager.applyDeltas(cube,
        batch(b).withColumn("_sign", lit(1)))
    val candLen = cube.aggregates.select(size(col("w_cand")))
      .head().getInt(0)
    assert(candLen <= CubeManager.FreqCand,
      s"candidate array grew unbounded: $candLen > ${CubeManager.FreqCand}")
    // the trim ranks by the MERGED counters, so the cumulative heavy
    // hitter (25 total, never more than 5 in one batch) survives and
    // serves as top-1
    val top = CubeManager.query(cube, Seq("g"), topkOf = Seq(("w", 1)))
      .select(col("topk_w")).head().getSeq[Row](0)
    assert(top.head.getString(0) == "hot",
      s"cumulative hitter lost by the trim: $top")
  }

  test("freq measures: lossless fold, est>=exact, recall, persist, latch") {
    import spark.implicits._
    val cfg = CubeConfig("fq", "mem",
      Seq(FieldDim("g", "grp")),
      Seq(Measure("n", "one")),
      freq = Seq(Measure("w", "word")))
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    // skewed corpus: word i appears ~ (6-i)² times per group
    val rows = for {
      g <- Seq("x", "y"); (w, i) <- words.zipWithIndex
      _ <- 0 until (6 - i) * (6 - i) + rnd.nextInt(2)
    } yield (g, w, 1)
    val df = rows.toDF("grp", "word", "one")
    val cube = CubeManager.create(cfg, df)

    // LOSSLESS merge: build-on-half + fold-other-half must produce
    // bit-identical counter arrays to the whole-corpus build (the CMS
    // property the family's cube residency rests on; HLL/KLL can't)
    val (h1, h2) = (rows.take(rows.size / 2), rows.drop(rows.size / 2))
    val folded = CubeManager.applyDeltas(
      CubeManager.create(cfg, h1.toDF("grp", "word", "one")),
      h2.map { case (g, w, o) => (g, w, o, 1) }
        .toDF("grp", "word", "one", "_sign"))
    def counters(c: Cube): Map[String, Seq[Long]] =
      c.aggregates.collect().map(r =>
        r.getAs[String]("g") -> r.getSeq[Long](r.fieldIndex("w"))).toMap
    assert(counters(folded) == counters(cube),
      "fold-of-halves diverged from whole-build counters")

    def served(c: Cube): Seq[(String, String, Long)] =
      CubeManager.query(c, Seq("g"), topkOf = Seq(("w", 3)))
        .select(col("g"), explode(col("topk_w")).as("t"))
        .select(col("g"), col("t.key"), col("t.n_est"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq
    val exact = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    val top = served(cube)
    assert(top.size == 6, s"expected 3 per group: $top")
    top.foreach { case (g, w, est) =>
      assert(est >= exact((g, w)),
        s"($g,$w): est $est below exact ${exact((g, w))}")
    }
    // exact top-3 recall per group (well-separated frequencies)
    for (g <- Seq("x", "y")) {
      val want = exact.collect { case ((`g`, w), n) => (n, w) }.toSeq
        .sortBy { case (n, w) => (-n, w) }.take(3).map(_._2).toSet
      val got = top.collect { case (`g`, w, _) => w }.toSet
      assert(got == want, s"group $g: served $got, exact top-3 $want")
    }

    // persistence round-trips the freq config + both stored columns
    val dir = java.nio.file.Files.createTempDirectory("graft_fqcube").toString
    CubeManager.save(cube, dir)
    val loaded = CubeManager.load(spark, dir, "fq")
    assert(loaded.config.freq == cfg.freq)
    assert(served(loaded) == served(cube))

    // a delete trips the shared insert-only latch; topk serves refuse,
    // exact sums keep working
    val afterDel = CubeManager.applyDeltas(cube,
      Seq(("x", "alpha", 1, -1)).toDF("grp", "word", "one", "_sign"))
    assert(afterDel.hasDeletes)
    val e = intercept[IllegalArgumentException] {
      CubeManager.query(afterDel, Seq("g"), topkOf = Seq(("w", 3)))
    }
    assert(e.getMessage.contains("insert-only"))
    assert(CubeManager.query(afterDel, Seq("g"), sumOf = Seq("n"))
      .count() == 2)
  }

  test("bitmap measures: EXACT distinct through create/fold/rollup/persist") {
    import spark.implicits._
    val cfg = CubeConfig("bm", "mem",
      Seq(FieldDim("k", "event_type"), FieldDim("d", "day")),
      Seq(Measure("v", "value")),
      bitmaps = Seq(Measure("users", "user_id")))
    // ids straddle block boundaries (63/64) and include a negative —
    // floorDiv/floorMod must keep every id in a distinct bit
    val base = Seq(("a", 1L, 1.0, 63L), ("a", 1L, 2.0, 64L),
      ("a", 2L, 3.0, 63L), ("b", 1L, 5.0, -1L), ("b", 1L, 6.0, -1L))
      .toDF("event_type", "day", "value", "user_id")
    val cube = CubeManager.create(cfg, base)
    def exact(c: Cube): Map[String, Long] =
      CubeManager.query(c, Seq("k"), exactDistinctOf = Seq("users"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_exact_users"))
        .toMap
    // roll-up over the day dim: per-cell bitmaps union losslessly —
    // user 63 in two cells counts ONCE (the thing HLL only estimates
    // and naive per-cell distincts over-count)
    assert(exact(cube) == Map("a" -> 2L, "b" -> 1L))
    // insert-only fold == from-scratch over the union
    val inserts = Seq(("a", 2L, 4.0, 128L, 1), ("b", 2L, 7.0, -1L, 1))
      .toDF("event_type", "day", "value", "user_id", "_sign")
    val folded = CubeManager.applyDeltas(cube, inserts)
    assert(exact(folded) == Map("a" -> 3L, "b" -> 1L))
    assert(!folded.hasDeletes)
    // persistence round-trips the bitmap bytes and the config
    val dir = java.nio.file.Files.createTempDirectory("graft_bmcube").toString
    CubeManager.save(folded, dir)
    val loaded = CubeManager.load(spark, dir, "bm")
    assert(loaded.config.bitmaps == cfg.bitmaps)
    assert(exact(loaded) == exact(folded))
  }

  test("bitmap set algebra: intersect-agg and AND/ANDNOT walks are set identities") {
    import spark.implicits._
    import graft.functions.Bitmap
    val rnd = new scala.util.Random(61)
    // ids span negative blocks and boundary bits so the merge-walk over
    // the sorted byte forms covers blocks present on one side only
    val data = (0 until 6).flatMap { g =>
      (0 until 120).map(_ => (g, rnd.nextInt(300).toLong - 100L))
    }
    val sets: Map[Int, Set[Long]] =
      data.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    val bm = data.toDF("g", "id")
      .groupBy(col("g")).agg(Bitmap.setAgg(col("id")).as("bm"))
    // intersect-agg across ALL groups == scala set intersection
    val interAll = bm.agg(Bitmap.cardinality(
        Bitmap.intersectAgg(col("bm"))).as("n"))
      .collect().head.getAs[Long]("n")
    assert(interAll == sets.values.reduce(_ intersect _).size.toLong)
    // order independence: aggregating a reversed frame yields the
    // SAME bytes (serialize is a pure function of the set)
    val interBytesA = bm.orderBy(col("g").asc)
      .agg(Bitmap.intersectAgg(col("bm"))).collect().head.getAs[Array[Byte]](0)
    val interBytesB = bm.orderBy(col("g").desc)
      .agg(Bitmap.intersectAgg(col("bm"))).collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(interBytesA, interBytesB))
    // pairwise AND / ANDNOT against every scala-set twin, including
    // the self pair (AND == identity, ANDNOT == 0)
    val pairs = bm.as("a").crossJoin(bm.as("b"))
      .select(col("a.g").as("ga"), col("b.g").as("gb"),
        Bitmap.andCardinality(col("a.bm"), col("b.bm")).as("and_n"),
        Bitmap.andNotCardinality(col("a.bm"), col("b.bm")).as("andnot_n"))
      .collect()
    assert(pairs.length == 36)
    pairs.foreach { r =>
      val (sa, sb) = (sets(r.getAs[Int]("ga")), sets(r.getAs[Int]("gb")))
      assert(r.getAs[Long]("and_n") == (sa intersect sb).size.toLong)
      assert(r.getAs[Long]("andnot_n") == (sa diff sb).size.toLong)
    }
    // disjoint sets AND to the EMPTY bitmap (cardinality 0, not null);
    // an all-null group evals to null — the two stay distinguishable
    val disjoint = Seq((0, 1L), (1, 100L)).toDF("g", "id")
      .groupBy(col("g")).agg(Bitmap.setAgg(col("id")).as("bm"))
    val dj = disjoint.agg(
        Bitmap.cardinality(Bitmap.intersectAgg(col("bm"))).as("n"))
      .collect().head
    assert(!dj.isNullAt(0) && dj.getLong(0) == 0L)
    val allNull = Seq((0, null: Array[Byte]), (1, null: Array[Byte]))
      .toDF("g", "bm")
      .agg(Bitmap.intersectAgg(col("bm"))).collect().head
    assert(allNull.isNullAt(0),
      "intersect over zero non-null bitmaps must be null")
  }

  test("bitmap deletes: targeted recompute == from-scratch; sourceless latches") {
    import spark.implicits._
    val cfg = CubeConfig("bmd", "mem",
      Seq(FieldDim("k", "event_type")),
      Seq(Measure("v", "value")),
      bitmaps = Seq(Measure("users", "user_id")))
    val base = Seq(("a", 1.0, 10L), ("a", 2.0, 11L), ("a", 3.0, 10L),
      ("b", 5.0, 20L)).toDF("event_type", "value", "user_id")
    val cube = CubeManager.create(cfg, base)
    // delete BOTH rows of user 10 with the post-delta source at hand:
    // the touched cell's bitmap is rebuilt exactly — user 10 gone,
    // user 11 still counted, nothing latched
    val deletes = Seq(("a", 1.0, 10L, -1), ("a", 3.0, 10L, -1))
      .toDF("event_type", "value", "user_id", "_sign")
    val postSrc = Seq(("a", 2.0, 11L), ("b", 5.0, 20L))
      .toDF("event_type", "value", "user_id")
    val afterDel = CubeManager.applyDeltas(cube, deletes, Some(postSrc))
    assert(!afterDel.hasDeletes)
    val served = CubeManager.query(afterDel, Seq("k"),
        exactDistinctOf = Seq("users"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_exact_users"))
      .toMap
    assert(served == Map("a" -> 1L, "b" -> 1L),
      "recomputed bitmap must equal a from-scratch COUNT(DISTINCT)")
    // the SAME state recomputed from scratch is bit-identical, bitmap
    // bytes included (block-sorted serialization is order-independent)
    val scratch = CubeManager.create(cfg, postSrc)
    val a = afterDel.aggregates.orderBy("k").collect().toSeq
    val b = scratch.aggregates.orderBy("k").collect().toSeq
    assert(a == b, "fold-with-recompute must equal from-scratch state")
    // sourceless delete: nothing can rebuild the bitmap — latch trips
    // and the exact-distinct serve refuses while sums keep working
    val latched = CubeManager.applyDeltas(cube, deletes)
    assert(latched.hasDeletes)
    val e = intercept[IllegalArgumentException] {
      CubeManager.query(latched, Seq("k"), exactDistinctOf = Seq("users"))
    }
    assert(e.getMessage.contains("insert-only"))
    assert(CubeManager.query(latched, Seq("k"), sumOf = Seq("v"))
      .count() == 2)
  }

  test("dictionary bitmaps: fold == from-scratch across service restarts") {
    import spark.implicits._
    // STRING keys — the case the plain-bitmap type gate refuses
    def df(rows: Seq[(String, String, Double)]) =
      rows.toDF("k", "uid", "value")
    val base = df(Seq(
      ("a", "alice", 1.0), ("a", "bob", 2.0), ("b", "alice", 3.0),
      ("a", "alice", 4.0)))
    // the delta re-inserts known keys AND introduces unseen ones — the
    // dictionary must extend append-only and reuse existing ids
    val delta = df(Seq(
      ("a", "alice", 5.0), ("a", "carol", 6.0), ("b", "dave", 7.0)))
    val cfg = CubeConfig("dict", "mem", Seq(FieldDim("k", "k")),
      Seq(Measure("v", "value")),
      dictBitmaps = Seq(Measure("users", "uid")))
    val dir = java.nio.file.Files.createTempDirectory("graft_dictspec")
      .toString
    val svc = new CubeService(spark, dir)
    svc.createCube(cfg, base)
    svc.updateAggregates("dict", delta.withColumn("_sign", lit(1)))
    // RESTART: a fresh service must reload the persisted dictionaries
    // and serve counts equal to a from-scratch recompute of base+delta
    val svc2 = new CubeService(spark, dir)
    def counts(d: DataFrame) = d.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("n_exact_users"))
      .toMap
    val served = counts(svc2.getAggregates("dict", Seq("k"),
      exactDistinctOf = Seq("users")))
    val scratch = counts(CubeManager.query(
      CubeManager.create(cfg, base.unionByName(delta)), Seq("k"),
      exactDistinctOf = Seq("users")))
    assert(served == scratch && served == Map("a" -> 3L, "b" -> 2L),
      s"served=$served scratch=$scratch")
    // a second fold re-inserting ONLY known keys must not move counts
    // (id reuse: the OR lands on already-set bits)
    val svc3 = new CubeService(spark, dir)
    svc3.updateAggregates("dict",
      df(Seq(("a", "alice", 9.0), ("b", "dave", 9.0)))
        .withColumn("_sign", lit(1)))
    assert(counts(svc3.getAggregates("dict", Seq("k"),
      exactDistinctOf = Seq("users"))) == served,
      "re-inserted keys must reuse their dictionary ids")
    // the complete-mode STREAMING AGGREGATION still refuses dictionary
    // cubes (its state cannot extend the dictionary mid-batch) — the
    // supported stream path is startAutoUpdate's per-batch fold,
    // pinned in CubeServiceSpec ("dictionary cubes stream-maintain…")
    val se = intercept[IllegalArgumentException] {
      graft.streaming.StreamingCube.start(spark, cfg, s"$dir/deltas",
        base.schema, s"$dir/deltas.ckpt", "dict_mem")
    }
    assert(se.getMessage.contains("dictionary"))
    // DICT + SHARD compose: the shard keys on the DENSE DICT ID, so a
    // string-keyed WAU cube gets bounded blobs too — same counts
    // through create, fold, AND the delete-capable targeted recompute
    // (whose touched-cell keys come from the dict-joined shard)
    val cfgS = CubeConfig("dictsh", "mem", Seq(FieldDim("k", "k")),
      Seq(Measure("v", "value")),
      dictBitmaps = Seq(Measure("users", "uid")), bitmapShardBits = 2)
    val dirS = java.nio.file.Files.createTempDirectory("graft_dictsh")
      .toString
    val svcS = new CubeService(spark, dirS)
    svcS.createCube(cfgS, base)
    svcS.updateAggregates("dictsh", delta.withColumn("_sign", lit(1)))
    assert(counts(svcS.getAggregates("dictsh", Seq("k"),
      exactDistinctOf = Seq("users"))) == served)
    val postSrc = base.unionByName(delta)
      .filter(!(col("k") === "a" && col("uid") === "bob"))
    svcS.updateAggregates("dictsh",
      df(Seq(("a", "bob", 2.0))).withColumn("_sign", lit(-1)),
      source = Some(postSrc))
    assert(counts(svcS.getAggregates("dictsh", Seq("k"),
      exactDistinctOf = Seq("users"))) == Map("a" -> 2L, "b" -> 2L),
      "sharded dict delete-recompute must serve the post-delete counts")
  }

  test("sharded bitmap partials: serves bit-identical, blobs bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // ids drawn across a WIDE range so shards actually subdivide; a
    // couple of calendar gaps so the retention null-gating is exercised
    val rows = (0 until 3000).map { _ =>
      val day = Seq(0, 1, 2, 3, 5, 6, 9)(rnd.nextInt(7))
      ("s" + rnd.nextInt(2),
        new Timestamp(1700000000000L + day * 86400000L
          + rnd.nextInt(86400000)),
        rnd.nextInt(100000).toLong,
        rnd.nextDouble() * 100)
    }
    val src = rows.toDF("seg", "ts", "uid", "value")
    def cfg(bits: Int) = CubeConfig(s"shard$bits", "mem",
      Seq(FieldDim("seg", "seg"), TimeDim("day", "ts", "day")),
      Seq(Measure("v", "value")),
      bitmaps = Seq(Measure("u", "uid")),
      bitmapShardBits = bits)
    val dir = java.nio.file.Files.createTempDirectory("graft_shard")
      .toString
    val svc = new CubeService(spark, dir)
    svc.createCube(cfg(0), src)
    // 2^10 ids per shard → per-row blob ≤ 4 + 16·(2^10/64 + 1) bytes
    svc.createCube(cfg(10), src)
    def rowsOf(d: DataFrame) = d.collect().map(_.toSeq).toSeq
    // plain roll-up serve: shard rows are just finer cells
    assert(
      rowsOf(svc.getAggregates("shard10", Seq("seg"),
        exactDistinctOf = Seq("u"), sumOf = Seq("v"))) ==
      rowsOf(svc.getAggregates("shard0", Seq("seg"),
        exactDistinctOf = Seq("u"), sumOf = Seq("v"))))
    // rolling serve: the per-shard two-level path must equal the
    // unsharded union — exact distinct, stickiness, and a mixed
    // request carrying a non-bitmap family through the join
    for (segs <- Seq(Nil, Seq("seg"))) {
      assert(
        rowsOf(svc.getRolling("shard10", "day", windowDays = 3,
          exactDistinctOf = Seq("u"), intersectOf = Seq("u"),
          sumOf = Seq("v"), segmentBy = segs)) ==
        rowsOf(svc.getRolling("shard0", "day", windowDays = 3,
          exactDistinctOf = Seq("u"), intersectOf = Seq("u"),
          sumOf = Seq("v"), segmentBy = segs)),
        s"rolling serve diverged (segmentBy=$segs)")
      // retention matrix: the full-outer shard pairing must equal the
      // lag walk, including the p−1-unobserved null gating at the gaps
      assert(
        rowsOf(svc.getRetention("shard10", "day", "u", periodDays = 2,
          segmentBy = segs)) ==
        rowsOf(svc.getRetention("shard0", "day", "u", periodDays = 2,
          segmentBy = segs)),
        s"retention matrix diverged (segmentBy=$segs)")
    }
    // the blob bound the sharding exists for: every stored bitmap cell
    // of the sharded cube is ≤ 4 + 16·(2^bits/64 + 1) bytes
    val bound = 4 + 16 * ((1 << 10) / 64 + 1)
    val maxBlob = svc.loadCube("shard10").aggregates
      .agg(max(length(col("u")))).collect()(0).getInt(0)
    assert(maxBlob <= bound, s"blob $maxBlob exceeds bound $bound")
    // and the unsharded cube CAN exceed it on this id range (the
    // ceiling the shards remove)
    val maxBlob0 = svc.loadCube("shard0").aggregates
      .agg(max(length(col("u")))).collect()(0).getInt(0)
    assert(maxBlob0 > bound,
      s"fixture too small to demonstrate the ceiling ($maxBlob0)")
  }
}
