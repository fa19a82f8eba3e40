package graft.cube

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The advisor's honesty contract: a recommended config, materialized
  * and registered VERBATIM, makes every covered workload query route;
  * unservable queries are reported uncovered, never half-covered. */
class CubeAdvisorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    CubeCatalog.install(s)
    s
  }

  private def scansOf(q: DataFrame): Seq[String] =
    q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r).get
    }

  test("advised config covers the workload and the workload then routes") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(47)
    val rows = (0 until 600).map { i =>
      (Seq("click", "view", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(72) * 3600000L),
        math.round(rnd.nextDouble() * 10000) / 100.0,
        (i % 50).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_adv_src").toString
    rows.toDF("event_type", "ts", "value", "user_id")
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)

    // a DataFrame memoizes its queryExecution, so the plans the
    // advisor analyzed would never see the later registration — build
    // the workload fresh for each phase
    def mkWorkload(): Seq[DataFrame] = Seq(
      // 0: plain rollup
      src.groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("n")),
      // 1: two dims incl. a time bucket
      src.groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s")),
      // 2: filter column must surface as a dim
      src.filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n")),
      // 3: ROLLUP (Expand path)
      src.rollup(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s"),
          grouping_id().as("gid")),
      // 4: approx distinct → sketch measure
      src.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("nd")),
      // 5: min/max → extremes
      src.groupBy(col("event_type"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx")),
      // 6: UNSUPPORTED leaf (native avg) → uncovered
      src.groupBy(col("event_type")).agg(avg(col("value")).as("a")),
      // 7: not an aggregate at all → uncovered
      src.filter(col("value") > 50.0),
      // 8: EXACT distinct over an INTEGRAL key → covered via a bitmap
      // measure (lossless union — the q209 routing family)
      src.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("ndx")),
      // 9: EXACT distinct over a STRING column → uncovered (the
      // bitmap cast would be lossy; a silently 'covered' verdict here
      // would break the honesty contract)
      src.groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(countDistinct(col("event_type")).as("nds")))

    val advice = CubeAdvisor.advise(mkWorkload())
    assert(advice.uncovered == Seq(6, 7, 9),
      s"uncovered=${advice.uncovered}")
    assert(advice.cubes.size == 1 && advice.joinCubes.isEmpty,
      s"expected one recommendation, got $advice")
    val rec = advice.cubes.head
    assert(rec.coveredQueries == Seq(0, 1, 2, 3, 4, 5, 8))
    // dims: event_type + day(ts); NO duplicate dim for the filter column
    val dimKeys = rec.config.dims.map {
      case FieldDim(_, p) => s"f:$p"
      case TimeDim(_, p, g) => s"t:$p:$g"
      case ExprDim(_, s) => s"e:$s"
    }
    assert(dimKeys.toSet == Set("f:event_type", "t:ts:day"), dimKeys.toString)
    assert(rec.config.measures.map(_.path) == Seq("value"))
    assert(rec.config.sketches.map(_.path) == Seq("user_id"))
    assert(rec.config.extremes.map(_.path) == Seq("value"))
    assert(rec.config.bitmaps.map(_.path) == Seq("user_id"))

    // the honesty check: materialize + register the config VERBATIM and
    // every covered query routes
    val cubeDir = Files.createTempDirectory("graft_adv_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), cubeDir)
    CubeCatalog.register(rec.config.name,
      CubeManager.load(spark, cubeDir, rec.config.name), srcDir,
      approxDistinct = true)
    val fresh = mkWorkload()
    rec.coveredQueries.foreach { i =>
      val scans = scansOf(fresh(i))
      assert(scans == Seq(CubeCatalog.normalize(s"$cubeDir/${rec.config.name}")),
        s"covered query $i did not route: $scans")
    }
    // the uncovered avg query keeps reading the source (and stays right)
    assert(scansOf(fresh(6)) == Seq(CubeCatalog.normalize(srcDir)))
    CubeCatalog.clear()
  }

  test("raw-column filter under a time bucket keeps the column as a dim and routes") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(61)
    val rows = (0 until 300).map { _ =>
      ("e", new Timestamp(1700000000000L + rnd.nextInt(96) * 3600000L),
        rnd.nextDouble() * 100)
    }
    val srcDir = Files.createTempDirectory("graft_adv_tf").toString
    rows.toDF("etype", "ts", "value").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    val cut = new Timestamp(1700000000000L + 48 * 3600000L)
    def mkQ(): DataFrame = src.filter(col("ts") >= lit(cut))
      .groupBy(date_trunc("day", col("ts")))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"))
    val advice = CubeAdvisor.advise(Seq(mkQ()), "advtf")
    // covered, with BOTH the day bucket and the raw ts column as dims:
    // the raw-column predicate can only be served from a raw-column
    // dim — dropping it would report covered but never route
    assert(advice.uncovered.isEmpty && advice.cubes.size == 1,
      advice.toString)
    val cfg = advice.cubes.head.config
    val dimKeys = cfg.dims.map {
      case FieldDim(_, p) => s"f:$p"
      case TimeDim(_, p, g) => s"t:$p:$g"
      case ExprDim(_, s) => s"e:$s"
    }
    assert(dimKeys.toSet == Set("t:ts:day", "f:ts"), dimKeys.toString)
    val cubeDir = Files.createTempDirectory("graft_adv_tf_cube").toString
    CubeManager.save(CubeManager.create(cfg, src), cubeDir)
    CubeCatalog.register(cfg.name,
      CubeManager.load(spark, cubeDir, cfg.name), srcDir)
    val scans = scansOf(mkQ())
    assert(scans == Seq(CubeCatalog.normalize(s"$cubeDir/${cfg.name}")),
      s"ts-filtered rollup did not route: $scans")
    // and the routed answer equals the direct one
    val routed = mkQ().orderBy(col("date_trunc(day, ts)"))
      .collect().map(_.toSeq).toSeq
    CubeCatalog.clear()
    val direct = mkQ().orderBy(col("date_trunc(day, ts)"))
      .collect().map(_.toSeq).toSeq
    assert(routed == direct, "routed ts-filtered rollup diverged")
  }

  test("adviseWithStats vetoes a cube with no re-aggregation advantage") {
    import spark.implicits._
    CubeCatalog.clear()
    val srcDir = Files.createTempDirectory("graft_adv_uniq").toString
    (0 until 500).map(i => (i.toLong, i * 2.0))
      .toDF("event_id", "value").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    // grouping by the unique key: cube cells == source rows
    val badWorkload = Seq(src.groupBy(col("event_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s")))
    val recs = CubeAdvisor.adviseWithStats(spark, badWorkload).cubes
    assert(recs.size == 1)
    assert(!recs.head.worthwhile,
      s"unique-key cube must not be worthwhile: ${recs.head}")
    // a genuinely aggregating workload stays worthwhile
    val okDir = Files.createTempDirectory("graft_adv_ok").toString
    (0 until 500).map(i => (s"k${i % 5}", i * 1.0))
      .toDF("k", "value").write.mode("overwrite").parquet(okDir)
    val okWorkload = Seq(spark.read.parquet(okDir).groupBy(col("k"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s")))
    val okRecs = CubeAdvisor.adviseWithStats(spark, okWorkload).cubes
    assert(okRecs.head.worthwhile && okRecs.head.cells.exists(_ <= 6))
  }

  test("rolling workloads yield a day-dimmed sketch cube that getRolling serves") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(61)
    val rows = (0 until 900).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(20) * 86400000L
          + rnd.nextInt(86400000)),
        math.round(rnd.nextDouble() * 10000) / 100.0,
        (i % 40).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advr_src").toString
    rows.toDF("ts", "value", "user_id")
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def dayCol = (unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").as("d")
    def mkWorkload(): Seq[DataFrame] = Seq(
      // 0: the q138 exact shape — rolling 7d distinct users
      graft.functions.Rolling.endpoints(
          src.select(col("user_id"), dayCol).distinct())
        .agg(countDistinct(col("user_id")).as("nu")),
      // 1: the q159/q141 shape — rolling 14d percentile + extremes
      graft.functions.Rolling.endpoints(
          src.select(dayCol, col("value")), 14)
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          min(col("value")).as("mn"), max(col("value")).as("mx")),
      // 2: REFUSED — a filtered curve (the serve can't reproduce the
      // filter from day partials)
      graft.functions.Rolling.endpoints(
          src.filter(col("value") > 50.0).select(dayCol, col("value")))
        .agg(max(col("value")).as("mx")),
      // 3: REFUSED — sum does not roll from daily partials under this
      // serve (and must not be silently advised)
      graft.functions.Rolling.endpoints(src.select(dayCol, col("value")))
        .agg(sum(col("value")).as("s")),
      // 4: REFUSED — pre-deduped percentile (dedup changes the
      // distribution the partials would sketch)
      graft.functions.Rolling.endpoints(
          src.select(dayCol, col("value")).distinct())
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p")),
      // 5: rolling DECIMAL sum — the exact, delete-proof family
      graft.functions.Rolling.endpoints(src.select(dayCol, col("value")))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s")))
    val advice = CubeAdvisor.advise(mkWorkload(), "advr")
    assert(advice.uncovered == Seq(2, 3, 4), s"uncovered=${advice.uncovered}")
    assert(advice.rolling.size == 1 && advice.cubes.isEmpty, advice.toString)
    val rec = advice.rolling.head
    assert(rec.coveredQueries == Seq(0, 1, 5))
    assert(rec.windows == Seq(7, 14))
    assert(rec.config.dims == Seq(TimeDim("ts_day", "ts", "day")))
    // the distinct key is BIGINT → the advisor recommends EXACT bitmap
    // partials, not the HLL sketch trade
    assert(rec.config.bitmaps.map(_.path) == Seq("user_id"))
    assert(rec.config.sketches.isEmpty)
    assert(rec.exactDistinctOf == Seq("user_id_xd") && rec.distinctOf.isEmpty)
    assert(rec.config.quantiles.map(_.path) == Seq("value"))
    assert(rec.config.extremes.map(_.path) == Seq("value"))
    assert(rec.config.measures.map(_.path) == Seq("value")
      && rec.sumOf == Seq("value_sum"))

    // honesty: materialize VERBATIM, then getRolling must reproduce
    // each workload query's own curve — exactly for extremes AND the
    // bitmap distinct (lossless union), within the estimate band for
    // the sketch families
    val svcDir = Files.createTempDirectory("graft_advr_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val fresh = mkWorkload()
    val exactDu = fresh(0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val servedDu = svc.getRolling(rec.config.name, rec.dayDim,
        windowDays = 7, exactDistinctOf = rec.exactDistinctOf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(servedDu == exactDu,
      s"bitmap rolling distinct diverged: $servedDu vs $exactDu")
    val exact1 = fresh(1).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val served1 = svc.getRolling(rec.config.name, rec.dayDim,
        windowDays = 14, quantilesOf = rec.quantilesOf,
        minOf = rec.minOf, maxOf = rec.maxOf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(served1.keySet == exact1.keySet)
    exact1.foreach { case (day, (p50, mn, mx)) =>
      val (sp50, smn, smx) = served1(day)
      assert(smn == mn && smx == mx,
        s"day $day: extremes ($smn,$smx) vs exact ($mn,$mx)")
      // KLL rank guarantee at k=200: ~1.65% rank error; on these
      // window sizes that is a handful of rank positions — bound the
      // VALUE by the exact window's neighborhood instead of equality
      assert(sp50 >= mn && sp50 <= mx && math.abs(sp50 - p50) <= 0.1 * (mx - mn),
        s"day $day: p50 $sp50 vs exact $p50 (range $mn..$mx)")
    }
    // the sum curve is decimal-exact: serve == the workload's own query
    val exactSum = fresh(5).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val servedSum = svc.getRolling(rec.config.name, rec.dayDim,
        windowDays = 7, sumOf = rec.sumOf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(servedSum == exactSum,
      s"rolling sum diverged: $servedSum vs $exactSum")
    CubeCatalog.clear()
  }

  test("segmented rolling workloads yield a segment-dimmed cube; serve == workload") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(89)
    val rows = (0 until 900).map { i =>
      (Seq("click", "view")(rnd.nextInt(2)),
        new Timestamp(1700000000000L + rnd.nextInt(15) * 86400000L
          + rnd.nextInt(86400000)),
        (i % 60).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advseg_src").toString
    rows.toDF("etype", "ts", "user_id").write.mode("overwrite")
      .parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def dayCol = (unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").as("d")
    // the q219 user form: per-segment trailing distinct, endpoints
    // restricted to the segment's OWN observed days
    def mkQ(): DataFrame = {
      val du = src.select(col("etype"), col("user_id"), dayCol).distinct()
      val days = du.select(col("etype"), col("d").as("day")).distinct()
      du.withColumn("day", expr("explode(sequence(d, d + 6))"))
        .drop("d")
        .join(days, Seq("etype", "day"), "left_semi")
        .groupBy(col("etype"), col("day"))
        .agg(countDistinct(col("user_id")).as("nu"))
    }
    val advice = CubeAdvisor.advise(Seq(mkQ()), "advseg")
    assert(advice.uncovered.isEmpty && advice.rolling.size == 1,
      advice.toString)
    val rec = advice.rolling.head
    assert(rec.segmentBy == Seq("etype"), rec.toString)
    assert(rec.config.dims.collect { case FieldDim(id, p) => (id, p) }
      == Seq(("etype", "etype")), rec.config.dims.toString)
    assert(rec.exactDistinctOf == Seq("user_id_xd"), rec.toString)
    // honesty: materialize verbatim; the segmented serve equals the
    // workload's own curve EXACTLY (bitmap partials)
    val svcDir = Files.createTempDirectory("graft_advseg_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val exact = mkQ().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val served = svc.getRolling(rec.config.name, rec.dayDim,
        windowDays = 7, exactDistinctOf = rec.exactDistinctOf,
        segmentBy = rec.segmentBy).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(served == exact,
      s"segmented advised serve diverged (${served.size} vs ${exact.size})")
    // REFUSED: segment groupings with a day-only semi-join — the
    // endpoints would be the GLOBALLY observed days, a different curve
    // from what the per-segment serve reproduces
    def mkBad(): DataFrame = {
      val du = src.select(col("etype"), col("user_id"), dayCol).distinct()
      val days = du.select(col("d").as("day")).distinct()
      du.withColumn("day", expr("explode(sequence(d, d + 6))"))
        .drop("d")
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("etype"), col("day"))
        .agg(countDistinct(col("user_id")).as("nu"))
    }
    val bad = CubeAdvisor.advise(Seq(mkBad()), "advsegbad")
    assert(bad.rolling.isEmpty && bad.uncovered == Seq(0),
      s"day-only semi-join under segment groupings must refuse: $bad")
    CubeCatalog.clear()
  }

  test("join-rolling workloads yield a join MV that getJoinRolling serves exactly") {
    import spark.implicits._
    CubeCatalog.clear()
    val lDir = Files.createTempDirectory("graft_advjr_l").toString
    val rDir = Files.createTempDirectory("graft_advjr_r").toString
    val rnd = new scala.util.Random(71)
    (0 until 30).map(i => (i.toLong,
        java.sql.Date.valueOf(f"2024-01-${1 + rnd.nextInt(12)}%02d")))
      .toDF("o_key", "o_date").write.mode("overwrite").parquet(lDir)
    (0 until 200).map(_ => (rnd.nextInt(30).toLong,
        math.round(rnd.nextDouble() * 10000) / 100.0))
      .toDF("l_key", "l_price").write.mode("overwrite").parquet(rDir)
    def mkQ(): DataFrame = {
      val j = spark.read.parquet(lDir)
        .join(spark.read.parquet(rDir), col("o_key") === col("l_key"))
        .select(datediff(col("o_date"), lit("1970-01-01")).cast("long")
            .as("d"),
          col("l_price"))
      graft.functions.Rolling.endpoints(j)
        .agg(sum(col("l_price").cast("decimal(18,2)")).as("s"),
          max(col("l_price")).as("mx"))
    }
    val advice = CubeAdvisor.advise(Seq(mkQ()), "advjr")
    assert(advice.uncovered.isEmpty && advice.rolling.size == 1,
      advice.toString)
    val rec = advice.rolling.head
    assert(rec.joinKeys.contains((CubeCatalog.normalize(lDir),
      CubeCatalog.normalize(rDir), "o_key", "l_key")), rec.toString)
    assert(rec.config.dims == Seq(TimeDim("o_date_day", "o_date", "day")))
    assert(rec.sumOf == Seq("l_price_sum") && rec.maxOf == Seq("l_price_x"))
    // materialize the JOIN MV verbatim; the served curves must equal
    // the workload's own (sum decimal-exact, max exact)
    val svcDir = Files.createTempDirectory("graft_advjr_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createJoinCube(rec.joinConfig.get,
      spark.read.parquet(lDir), spark.read.parquet(rDir))
    val exact = mkQ().collect()
      .map(r => r.getLong(0) ->
        ((r.getDecimal(1).doubleValue(), r.getDouble(2)))).toMap
    val served = svc.getJoinRolling(rec.config.name, rec.dayDim,
        windowDays = 7, sumOf = rec.sumOf, maxOf = rec.maxOf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(1)))).toMap
    assert(served == exact, s"join-rolling serve diverged:\n$served\nvs\n$exact")
    CubeCatalog.clear()
  }

  test("range-only filter columns are flagged on the recommendation") {
    import spark.implicits._
    CubeCatalog.clear()
    val srcDir = Files.createTempDirectory("graft_advrf_src").toString
    (0 until 200).map(i => (s"t${i % 3}", i / 2.0, i.toLong))
      .toDF("event_type", "value", "user_id")
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    // a range predicate on a measure-shaped column: promoted (routing
    // requires it) but FLAGGED
    val ranged = CubeAdvisor.advise(Seq(
      src.filter(col("value") > 10.0).groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s"))), "advf")
    assert(ranged.cubes.size == 1)
    assert(ranged.cubes.head.rangeOnlyDims == Seq("value"),
      ranged.cubes.head.toString)
    assert(ranged.cubes.head.config.dims.exists {
      case FieldDim(_, "value") => true; case _ => false
    }, "the flagged column must still be a dim — routing depends on it")
    // point predicates (and point+range on the same column) are not
    // flagged: the equality vouches for dimension shape
    val pointed = CubeAdvisor.advise(Seq(
      src.filter(col("event_type") === "t1").groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s")),
      src.filter(col("event_type") === "t1" && col("event_type") >= "a")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s"))), "advf2")
    assert(pointed.cubes.forall(_.rangeOnlyDims.isEmpty),
      pointed.cubes.toString)
    // ...and nothing point-shaped yields a layout recommendation
    assert(pointed.layouts.isEmpty, pointed.layouts.toString)
    CubeCatalog.clear()
  }

  test("nested time buckets collapse to the finest dim; hierarchy routing serves both") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(73)
    val rows = (0 until 500).map { _ =>
      (Seq("x", "y")(rnd.nextInt(2)),
        new Timestamp(1700000000000L + rnd.nextInt(200) * 86400000L),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    val srcDir = Files.createTempDirectory("graft_advh_src").toString
    rows.toDF("k", "ts", "v").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def mkWorkload(): Seq[DataFrame] = Seq(
      src.groupBy(col("k"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("v").cast("decimal(18,2)")).as("s")),
      src.groupBy(date_trunc("month", col("ts")).as("m"))
        .agg(sum(col("v").cast("decimal(18,2)")).as("s")))
    val advice = CubeAdvisor.advise(mkWorkload(), "advh")
    assert(advice.uncovered.isEmpty && advice.cubes.size == 1,
      advice.toString)
    val rec = advice.cubes.head
    // ONE day dim, not day × month (the hierarchy rewrite serves the
    // month view by re-truncation — a month dim would only multiply
    // the advised cells)
    val tds = rec.config.dims.collect { case t: TimeDim => t }
    assert(tds.map(t => (t.path, t.granularity)) == Seq(("ts", "day")),
      rec.config.dims.toString)
    // honesty: materialized verbatim, BOTH views route
    val cubeDir = Files.createTempDirectory("graft_advh_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), cubeDir)
    CubeCatalog.register(rec.config.name,
      CubeManager.load(spark, cubeDir, rec.config.name), srcDir)
    mkWorkload().zipWithIndex.foreach { case (q, i) =>
      assert(scansOf(q) ==
        Seq(CubeCatalog.normalize(s"$cubeDir/${rec.config.name}")),
        s"workload query $i did not route: ${scansOf(q)}")
    }
    // NON-nesting mix keeps both buckets (week + month): collapsing
    // would break the route-on-registration contract. (Catalog cleared
    // first — an ACTIVE registration makes the advisor see the
    // already-routed plans, which is correct behavior: a served
    // workload needs no advice.)
    CubeCatalog.clear()
    val advice2 = CubeAdvisor.advise(Seq(
      src.groupBy(date_trunc("week", col("ts")).as("w"))
        .agg(sum(col("v").cast("decimal(18,2)")).as("s")),
      src.groupBy(date_trunc("month", col("ts")).as("m"))
        .agg(sum(col("v").cast("decimal(18,2)")).as("s"))), "advh2")
    assert(advice2.cubes.nonEmpty, s"advh2 advice: $advice2")
    val tds2 = advice2.cubes.head.config.dims
      .collect { case t: TimeDim => (t.path, t.granularity) }
    assert(tds2.toSet == Set(("ts", "week"), ("ts", "month")),
      tds2.toString)
    CubeCatalog.clear()
  }

  test("layout recommendation: applied layout skips files the original cannot") {
    import spark.implicits._
    CubeCatalog.clear()
    val srcDir = Files.createTempDirectory("graft_advly_src").toString
    // ids written in a SHUFFLED order: every file's [min,max] id range
    // spans nearly the whole domain, so a range predicate prunes
    // nothing on the original layout
    val rnd = new scala.util.Random(29)
    rnd.shuffle((0 until 4000).toList)
      .map(i => (s"t${i % 3}", i / 2.0, i.toLong))
      .toDF("event_type", "value", "user_id")
      .repartition(8)
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    val advice = CubeAdvisor.advise(Seq(
      src.filter(col("user_id") < 400L).groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("s"))), "advly")
    assert(advice.layouts.size == 1, advice.layouts.toString)
    val rec = advice.layouts.head
    assert(rec.columns == Seq("user_id"), rec.toString)

    // per-file [min,max] of the filter column — the parquet footer
    // evidence, observed through the files themselves
    def fileRanges(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    def skipRate(dir: String): Double = {
      val rs = fileRanges(dir)
      rs.count { case (lo, _) => lo >= 400L }.toDouble / rs.size
    }
    // original layout: every file intersects the predicate range
    assert(skipRate(srcDir) == 0.0,
      s"fixture broken: original layout already skips")
    val destDir = Files.createTempDirectory("graft_advly_dst").toString
    CubeAdvisor.applyLayout(spark, rec, destDir, numFiles = 10)
    // applied layout: most files' ranges are disjoint from the
    // predicate and would be footer-skipped by the scan
    val rate = skipRate(destDir)
    assert(rate >= 0.7, s"applied layout skips too little: $rate")
    // the rewrite is a permutation, not a transformation
    assert(spark.read.parquet(destDir).count() == 4000)
    assert(spark.read.parquet(destDir)
      .agg(sum(col("user_id"))).head.getLong(0)
      == (0L until 4000L).sum)
    CubeCatalog.clear()
  }

  test("join workloads yield a join-MV recommendation that routes") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(53)
    val lDir = Files.createTempDirectory("graft_advj_l").toString
    val rDir = Files.createTempDirectory("graft_advj_r").toString
    (0 until 40).map(i =>
      (i.toLong, Seq("HIGH", "MED", "LOW")(rnd.nextInt(3))))
      .toDF("o_key", "o_prio").write.mode("overwrite").parquet(lDir)
    (0 until 200).map(_ =>
      (rnd.nextInt(40).toLong, math.round(rnd.nextDouble() * 10000) / 100.0))
      .toDF("l_key", "l_price").write.mode("overwrite").parquet(rDir)
    def mkQ(): DataFrame = spark.read.parquet(lDir)
      .join(spark.read.parquet(rDir), col("o_key") === col("l_key"))
      .groupBy(col("o_prio"))
      .agg(sum(col("l_price").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
    val advice = CubeAdvisor.advise(Seq(mkQ()), "advj")
    assert(advice.cubes.isEmpty && advice.uncovered.isEmpty
      && advice.joinCubes.size == 1, advice.toString)
    val jrec = advice.joinCubes.head
    assert(jrec.config.leftKey == "o_key" && jrec.config.rightKey == "l_key")
    assert(jrec.config.cube.dims.map(_.id) == Seq("o_prio"))
    assert(jrec.config.cube.measures.map(_.path) == Seq("l_price"))
    // materialize + register the recommendation verbatim: it routes
    val svcDir = Files.createTempDirectory("graft_advj_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createJoinCube(jrec.config,
      spark.read.parquet(jrec.leftPath),
      spark.read.parquet(jrec.rightPath))
    CubeCatalog.registerJoin(jrec.config.cube.name,
      svc.loadJoinCube(jrec.config.cube.name),
      jrec.leftPath, jrec.rightPath)
    val scans = scansOf(mkQ())
    assert(scans.size == 1 && scans.head.contains(".jmv/"),
      s"advised join MV did not route: $scans")
    CubeCatalog.clear()
  }

  test("retention workloads: string ids take the dictionary path; edges refuse") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(71)
    val rows = (0 until 800).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(28) * 86400000L
        + rnd.nextInt(86400000)), s"u${i % 50}")
    }
    val srcDir = Files.createTempDirectory("graft_advret_src").toString
    rows.toDF("ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def pairs(pd: Int) = src.select(col("uid"),
        floor((unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").cast("double") / pd).cast("long").as("p"))
      .distinct()
    def retainedQ(pd: Int) = {
      val up = pairs(pd)
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val advice = CubeAdvisor.advise(Seq(retainedQ(7)), "ret")
    assert(advice.retention.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.retention.head
    // the STRING id must land in dictBitmaps (exact via the maintained
    // dictionary), never plain bitmaps (lossy cast) or a refusal
    assert(rec.config.bitmaps.isEmpty &&
      rec.config.dictBitmaps.map(_.path) == Seq("uid"), rec.toString)
    assert(rec.periods == Seq(7), rec.toString)
    // honesty: materialize verbatim; the served matrix's retained
    // column equals the workload's own self-join count per period
    val svcDir = Files.createTempDirectory("graft_advret_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val served = svc.getRetention(rec.config.name, rec.dayDim,
        rec.bitmapId, periodDays = 7)
      .select(col("period"), col("retained")).collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getLong(1) }
      .toMap
    val exact = retainedQ(7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the workload omits periods whose p−1 had no overlap row; compare
    // on the workload's own keys (a served 0 has no raw twin row)
    assert(exact.forall { case (p, n) => served.get(p).contains(n) },
      s"served=$served exact=$exact")
    // refusal edges: mismatched period widths across the join sides, a
    // non-adjacent period join, and a residual value predicate
    val mixed = pairs(7).as("cur").join(pairs(14).as("prev"),
        col("cur.uid") === col("prev.uid") &&
          col("prev.p") === col("cur.p") - 1)
      .groupBy(col("cur.p"))
      .agg(countDistinct(col("cur.uid")).as("retained"))
    val skip = {
      val up = pairs(7)
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.p") === col("cur.p") - 2)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val filtered = {
      val up = pairs(7).filter(col("uid") =!= "u0")
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val bad = CubeAdvisor.advise(Seq(mixed, skip, filtered), "retbad")
    assert(bad.retention.isEmpty && bad.uncovered == Seq(0, 1, 2),
      s"refusal edges must stay uncovered: $bad")
    CubeCatalog.clear()
  }

  test("cumulative workloads fold into the retention-family cube; serve == workload") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(83)
    val rows = (0 until 900).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(25) * 86400000L
        + rnd.nextInt(86400000)), (i % 60).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advcum_src").toString
    rows.toDF("ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def pairs() = src.select(col("uid"),
        (unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").as("d"))
      .distinct()
    def cumQ(strict: Boolean = false) = {
      val du = pairs()
      val days = du.select(col("d").as("day")).distinct()
      days.join(du,
          if (strict) col("d") < col("day") else col("d") <= col("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("uid")).as("cum_users"))
    }
    def retainedQ() = {
      val up = src.select(col("uid"),
          floor((unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").cast("double") / 7).cast("long").as("p"))
        .distinct()
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    // the cumulative hit and the retention hit want the SAME
    // day-dimmed bitmap cube — one recommendation covers both
    val advice = CubeAdvisor.advise(Seq(cumQ(), retainedQ()), "cum")
    assert(advice.retention.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.retention.head
    assert(rec.coveredQueries == Seq(0, 1), rec.toString)
    assert(rec.config.bitmaps.map(_.path) == Seq("uid"), rec.toString)
    // honesty: materialize verbatim; getCumulative's curve equals the
    // workload's own quadratic join, day for day
    val svcDir = Files.createTempDirectory("graft_advcum_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val served = svc.getCumulative(rec.config.name, rec.dayDim,
        exactDistinctOf = Seq(rec.bitmapId)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long](s"cum_exact_${rec.bitmapId}"))
      .toMap
    val exact = cumQ().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == exact, s"served=$served exact=$exact")
    // the exclusive (strict <) curve is a different question — refused
    val bad = CubeAdvisor.advise(Seq(cumQ(strict = true)), "cumbad")
    assert(bad.retention.isEmpty && bad.uncovered == Seq(0),
      s"strict inequality must stay uncovered: $bad")
    CubeCatalog.clear()
  }

  test("SEGMENTED retention workloads yield a segment-dimmed cube; serve == workload") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(83)
    val rows = (0 until 900).map { i =>
      (Seq("free", "pro")(rnd.nextInt(2)),
        new Timestamp(1700000000000L + rnd.nextInt(28) * 86400000L
          + rnd.nextInt(86400000)), (i % 40).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advrets_src").toString
    rows.toDF("plan", "ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    // weekly retained per PLAN: the self-join carries the segment
    // equality, the grouping adds the segment column
    def retainedQ() = {
      val up = src.select(col("plan"), col("uid"),
          floor((unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").cast("double") / 7).cast("long").as("p"))
        .distinct()
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("cur.plan") === col("prev.plan") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.plan"), col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val advice = CubeAdvisor.advise(Seq(retainedQ()), "rets")
    assert(advice.retention.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.retention.head
    assert(rec.segmentBy == Seq("plan") &&
      rec.config.dims.collect { case FieldDim(id, p) => (id, p) } ==
        Seq(("plan", "plan")), rec.toString)
    // honesty: materialize verbatim, the per-segment matrix's retained
    // cells equal the workload's own self-join counts
    val svcDir = Files.createTempDirectory("graft_advrets_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val served = svc.getRetention(rec.config.name, rec.dayDim,
        rec.bitmapId, periodDays = 7, segmentBy = rec.segmentBy)
      .select(col("plan"), col("period"), col("retained")).collect()
      .collect { case r if !r.isNullAt(2) =>
        (r.getString(0), r.getLong(1)) -> r.getLong(2) }.toMap
    val exact = retainedQ().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(exact.forall { case (k, n) => served.get(k).contains(n) },
      s"served=$served exact=$exact")
    // REFUSED: a segment grouping whose column is NOT carried through
    // the self-join — the per-segment matrix would partition what the
    // workload's join did not
    def badQ() = {
      val up = src.select(col("plan"), col("uid"),
          floor((unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").cast("double") / 7).cast("long").as("p"))
        .distinct()
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.plan"), col("cur.p"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val bad = CubeAdvisor.advise(Seq(badQ()), "retsbad")
    assert(bad.retention.isEmpty && bad.uncovered == Seq(0),
      s"segment not in the join must refuse: $bad")
    CubeCatalog.clear()
  }

  test("JOIN retention workloads yield a join rec that getJoinRetention serves") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(79)
    val ords = (0 until 30).map(i =>
      (i.toLong,
        new Timestamp(1700000000000L + rnd.nextInt(28) * 86400000L)))
    val lins = (0 until 300).map(_ =>
      (rnd.nextInt(33).toLong, rnd.nextInt(20).toLong))
    val lDir = Files.createTempDirectory("graft_advjret_l").toString
    val rDir = Files.createTempDirectory("graft_advjret_r").toString
    ords.toDF("o_key", "o_ts").write.mode("overwrite").parquet(lDir)
    lins.toDF("l_key", "l_supp").write.mode("overwrite").parquet(rDir)
    def pairs() = spark.read.parquet(lDir)
      .join(spark.read.parquet(rDir), col("o_key") === col("l_key"))
      .select(col("l_supp"),
        floor((unix_timestamp(col("o_ts")).cast("double") / 86400)
          .cast("long").cast("double") / 7).cast("long").as("p"))
      .distinct()
    def retainedQ() = {
      val up = pairs()
      up.as("cur").join(up.as("prev"),
          col("cur.l_supp") === col("prev.l_supp") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.l_supp")).as("retained"))
    }
    val advice = CubeAdvisor.advise(Seq(retainedQ()), "advjret")
    assert(advice.retention.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.retention.head
    // the rec carries the JOIN identity: materialize as a join MV
    assert(rec.join.isDefined, rec.toString)
    val (lp, rp, lk, rk) = rec.join.get
    assert(Set(lp, rp) == Set(CubeCatalog.normalize(lDir),
      CubeCatalog.normalize(rDir)), rec.join.toString)
    assert(lk == "o_key" && rk == "l_key", rec.join.toString)
    assert(rec.periods == Seq(7) &&
      rec.config.bitmaps.map(_.path) == Seq("l_supp"), rec.toString)
    // honesty: materialize VERBATIM as a join MV; the served matrix's
    // retained column equals the workload's own self-join count
    val svc = new CubeService(spark,
      Files.createTempDirectory("graft_advjret_svc").toString)
    svc.createJoinCube(
      JoinCubeConfig(rec.config, leftKey = lk, rightKey = rk),
      spark.read.parquet(lp), spark.read.parquet(rp))
    val served = svc.getJoinRetention(rec.config.name, rec.dayDim,
        rec.bitmapId, periodDays = 7)
      .select(col("period"), col("retained")).collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getLong(1) }
      .toMap
    val exact = retainedQ().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty &&
      exact.forall { case (p, n) => served.get(p).contains(n) },
      s"served=$served exact=$exact")
    CubeCatalog.clear()
  }

  test("rolling workloads: string count(DISTINCT) advises the dictionary path") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(67)
    val rows = (0 until 700).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(12) * 86400000L
          + rnd.nextInt(86400000)),
        s"u${i % 45}")
    }
    val srcDir = Files.createTempDirectory("graft_advds_src").toString
    rows.toDF("ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def dayCol = (unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").as("d")
    def wau() = graft.functions.Rolling.endpoints(
        src.select(col("uid"), dayCol).distinct())
      .agg(countDistinct(col("uid")).as("nu"))
    val advice = CubeAdvisor.advise(Seq(wau()), "advds")
    assert(advice.rolling.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.rolling.head
    // an EXACT count over a STRING key must advise the dictionary
    // (exact for any key type), never the HLL estimate — the workload
    // asked for an exact number, and the retention/funnel recs already
    // hold this line
    assert(rec.config.sketches.isEmpty && rec.config.bitmaps.isEmpty &&
      rec.config.dictBitmaps.map(_.path) == Seq("uid"), rec.toString)
    assert(rec.distinctOf.isEmpty && rec.exactDistinctOf == Seq("uid_xd"),
      rec.toString)
    // honesty: materialize verbatim → the served curve EQUALS the
    // workload's own exact recompute, and the raw plan ROUTES with no
    // approx opt-in (the dictionary-first binding)
    val svcDir = Files.createTempDirectory("graft_advds_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val served = svc.getRolling(rec.config.name, rec.dayDim,
        windowDays = 7, exactDistinctOf = rec.exactDistinctOf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_exact_uid_xd"))
      .toMap
    val exact = wau().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == exact, s"served=$served exact=$exact")
    CubeCatalog.register("advds_route",
      CubeManager.load(spark, svcDir, rec.config.name), srcDir)
    assert(scansOf(wau()).forall(_.endsWith(s"/${rec.config.name}")),
      s"advised dict cube must route the raw plan: ${scansOf(wau())}")
    CubeCatalog.clear()
  }

  test("funnel workloads: string ids take the dictionary path; edges refuse") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(83)
    val rows = (0 until 1000).map { i =>
      (Seq("view", "click", "buy")(rnd.nextInt(3)),
        new Timestamp(1700000000000L + rnd.nextInt(21) * 86400000L
          + rnd.nextInt(86400000)),
        s"u${i % 40}")
    }
    val srcDir = Files.createTempDirectory("graft_advfun_src").toString
    rows.toDF("step", "ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def pairs(step: String) = src.filter(col("step") === step)
      .select(col("uid"),
        (unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").as("p"))
    def funnelQ(steps: Seq[String], strict: Boolean = false) = {
      val s1 = pairs(steps.head).groupBy(col("uid"))
        .agg(min(col("p")).as("t1"))
      val chain = steps.tail.zipWithIndex.foldLeft(s1) {
        case (prev, (s, i)) =>
          pairs(s).as("e").join(prev.as("pv"),
              col("e.uid") === col("pv.uid") &&
                col("e.p") >= col(s"pv.t${i + 1}"))
            .groupBy(col("e.uid"))
            .agg(min(col("e.p")).as(s"t${i + 2}"))
      }
      val t = s"t${steps.size}"
      val days = src.select(
        (unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").as("day")).distinct()
      days.join(chain,
          if (strict) col(t) < col("day") else col(t) <= col("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("uid")).as("converted"))
    }
    val advice = CubeAdvisor.advise(
      Seq(funnelQ(Seq("view", "click", "buy"))), "fun")
    assert(advice.funnel.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    // dashboards log their presentation layer too: ORDER BY / LIMIT
    // above the metric must not hide the workload from the advisor
    val presented = CubeAdvisor.advise(
      Seq(funnelQ(Seq("view", "click", "buy"))
        .orderBy(col("day")).limit(100)), "funp")
    assert(presented.funnel.size == 1 && presented.uncovered.isEmpty,
      s"ORDER BY/LIMIT must peel before analysis: $presented")
    // calendar-ordinal chains ride the same matcher: a MONTHLY funnel
    // workload is covered (the day-dimmed rec's cells collapse to any
    // calendar at serve time)
    def monthlyFunnelQ() = {
      val ordE = (year(col("ts")) * 12 + month(col("ts"))).cast("long")
      def mp(step: String) = src.filter(col("step") === step)
        .select(col("uid"), ordE.as("p"))
      val s1 = mp("view").groupBy(col("uid")).agg(min(col("p")).as("t1"))
      val chain = mp("buy").as("e").join(s1.as("pv"),
          col("e.uid") === col("pv.uid") && col("e.p") >= col("pv.t1"))
        .groupBy(col("e.uid")).agg(min(col("e.p")).as("t2"))
      val months = src.select(ordE.as("m")).distinct()
      months.join(chain, col("t2") <= col("m"))
        .groupBy(col("m"))
        .agg(countDistinct(col("uid")).as("converted"))
    }
    val calFun = CubeAdvisor.advise(Seq(monthlyFunnelQ()), "funcal")
    assert(calFun.funnel.size == 1 && calFun.uncovered.isEmpty,
      s"monthly funnel workload must be covered: $calFun")
    val rec = advice.funnel.head
    // the STRING id must land in dictBitmaps (exact via the maintained
    // dictionary), never plain bitmaps (lossy cast) or a refusal
    assert(rec.config.bitmaps.isEmpty &&
      rec.config.dictBitmaps.map(_.path) == Seq("uid"), rec.toString)
    assert(rec.chains == Seq(Seq("view", "click", "buy")) &&
      rec.periods == Seq(1) && rec.stepDim == "step", rec.toString)
    // honesty: materialize verbatim; getFunnel's final-step converted
    // column equals the workload's own chain count per period
    val svcDir = Files.createTempDirectory("graft_advfun_svc").toString
    val svc = new CubeService(spark, svcDir)
    svc.createCube(rec.config, src)
    val served = svc.getFunnel(rec.config.name, rec.dayDim,
        rec.bitmapId, rec.stepDim, steps = Seq("view", "click", "buy"))
      .filter(col("step_ord") === 3)
      .select(col("period"), col("converted")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = funnelQ(Seq("view", "click", "buy")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the workload omits days with zero conversions; compare on the
    // workload's own keys
    assert(exact.nonEmpty &&
      exact.forall { case (p, n) => served.get(p).contains(n) },
      s"served=$served exact=$exact")
    // refusal edges: the strict-inequality chain is the EXCLUSIVE
    // curve (a different chart); a repeated step is not a funnel
    val bad = CubeAdvisor.advise(
      Seq(funnelQ(Seq("view", "click"), strict = true),
        funnelQ(Seq("view", "view"))), "funbad")
    assert(bad.funnel.isEmpty && bad.uncovered == Seq(0, 1),
      s"refusal edges must stay uncovered: $bad")
    CubeCatalog.clear()
  }

  test("cohort-value workloads fold into the retention-family rec; edges refuse") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(59)
    val rows = (0 until 1500).map { i =>
      val day = rnd.nextInt(25)
      (new Timestamp(1700000000000L + day * 86400000L
        + rnd.nextInt(86400000)),
        rnd.nextInt(20 * (day + 1)).toLong,
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    val srcDir = Files.createTempDirectory("graft_advcv_src").toString
    rows.toDF("ts", "uid", "amount").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def pExpr = floor((unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").cast("double") / 3).cast("long")
    def cvQ(s: DataFrame, money: Boolean) = {
      val w = if (money) sum(col("amount").cast("decimal(18,2)"))
        else sum(col("amount"))
      val g = s.groupBy(col("uid"), pExpr.as("p")).agg(w.as("w"))
      val f = s.groupBy(col("uid")).agg(min(pExpr).as("cohort"))
      g.join(f, "uid")
        .groupBy(col("cohort"), (col("p") - col("cohort")).as("age"))
        .agg(count(lit(1)).as("active"), sum(col("w")).as("v"))
    }
    def fsQ() = src.select(col("uid"), pExpr.as("w0"))
      .groupBy(col("uid")).agg(min(col("w0")).as("fw"))
      .groupBy(col("fw")).agg(count(col("uid")).as("nu"))
    // an LTV matrix + a first-seen chart over the same id → ONE
    // day-dimmed rec carrying BOTH the bitmap and the weighted measure
    val advice = CubeAdvisor.advise(
      Seq(cvQ(src, money = true), fsQ()), "adv")
    assert(advice.uncovered.isEmpty, s"uncovered: ${advice.uncovered}")
    assert(advice.retention.size == 1)
    val rec = advice.retention.head
    assert(rec.config.weighted ==
      Seq(WeightedMeasure("amount_w", "uid", "amount")), rec.config)
    assert(rec.config.bitmaps == Seq(Measure("uid_xd", "uid")))
    assert(rec.periods == Seq(3) && rec.coveredQueries == Seq(0, 1))
    // honesty: materialize VERBATIM, register — the raw LTV plan
    // routes to the advised cube and matches its own raw recompute
    val dir = Files.createTempDirectory("graft_advcv_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), dir)
    CubeCatalog.install(spark)
    CubeCatalog.register("advcv_pin",
      CubeManager.load(spark, dir, rec.config.name), srcDir)
    val routed = cvQ(src, money = true)
    val scans = routed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scans.nonEmpty && !scans.exists(_.endsWith(srcDir)),
      s"advised cohort-value plan did not route: $scans")
    val served = routed.collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val raw = cvQ(src, money = true).collect().map(_.toSeq)
      .sortBy(_.toString)
    assert(served.toSeq == raw.toSeq,
      "advised-and-routed LTV matrix must equal the raw recompute")
    // a double-summed weight has no money discipline — stays uncovered
    val adviceBad = CubeAdvisor.advise(Seq(cvQ(src, money = false)),
      "advb")
    assert(adviceBad.retention.isEmpty &&
      adviceBad.uncovered == Seq(0), adviceBad.uncovered)
    // a STRING id takes the dictionary path (r16): the rec carries
    // dictBitmaps + the weighted measure — requireIntegralWeighted's
    // create-time contract — and the materialized cube ROUTES the raw
    // string-keyed LTV matrix exactly (the serve is id-free, so the
    // injective dense encoding changes nothing)
    val srcSDir = Files.createTempDirectory("graft_advcvs_src").toString
    rows.map { case (ts, uid, a) => (ts, s"u$uid", a) }
      .toDF("ts", "uid", "amount").write.mode("overwrite")
      .parquet(srcSDir)
    def srcS = spark.read.parquet(srcSDir)
    val adviceS = CubeAdvisor.advise(Seq(cvQ(srcS, money = true)), "advs")
    assert(adviceS.uncovered.isEmpty && adviceS.retention.size == 1,
      s"string-id cohort value must take the dictionary path: $adviceS")
    val recS = adviceS.retention.head
    assert(recS.config.bitmaps.isEmpty &&
      recS.config.dictBitmaps == Seq(Measure("uid_xd", "uid")) &&
      recS.config.weighted ==
        Seq(WeightedMeasure("amount_w", "uid", "amount")), recS.config)
    val dirS = Files.createTempDirectory("graft_advcvs_cube").toString
    CubeManager.save(CubeManager.create(recS.config, srcS), dirS)
    CubeCatalog.register("advcvs_pin",
      CubeManager.load(spark, dirS, recS.config.name), srcSDir)
    val routedS = cvQ(srcS, money = true)
    val scansS = routedS.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scansS.nonEmpty && !scansS.exists(_.endsWith(srcSDir)),
      s"advised string-keyed cohort-value plan did not route: $scansS")
    val servedS = routedS.collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val rawS = cvQ(srcS, money = true).collect().map(_.toSeq)
      .sortBy(_.toString)
    assert(servedS.toSeq == rawS.toSeq,
      "advised-and-routed string-keyed LTV matrix must equal the raw " +
        "recompute")
  }

  test("3-table rollups get a CHAIN-MV rec; honesty loop routes") {
    import spark.implicits._
    CubeCatalog.clear()
    val dir = Files.createTempDirectory("graft_advchain").toString
    val rnd = new scala.util.Random(67)
    (0 until 40).map(i => (i.toLong, (i % 7).toLong,
      Seq("HIGH", "MED", "LOW")(rnd.nextInt(3))))
      .toDF("o_key", "o_cust", "o_prio").write.parquet(s"$dir/ord")
    (0 until 200).map(_ => (rnd.nextInt(44).toLong,
      math.round(rnd.nextDouble() * 10000) / 100.0))
      .toDF("l_key", "l_price").write.parquet(s"$dir/lin")
    (0L to 7L).map(i => (i, Seq("AUTO", "HOME")(rnd.nextInt(2))))
      .toDF("c_key", "c_seg").write.parquet(s"$dir/cus")
    def o = spark.read.parquet(s"$dir/ord")
    def l = spark.read.parquet(s"$dir/lin")
    def c = spark.read.parquet(s"$dir/cus")
    // BOTH parenthesizations of the star rollup — the linearizer must
    // order either tree into a valid prefix chain
    def rollup() = o.join(l, col("o_key") === col("l_key"))
      .join(c, col("o_cust") === col("c_key"))
      .groupBy(col("o_prio"), col("c_seg"))
      .agg(sum(col("l_price").cast("decimal(18,2)")).as("rev"))
    def rollup2() = o.join(c, col("o_cust") === col("c_key"))
      .join(l, col("o_key") === col("l_key"))
      .groupBy(col("o_prio"), col("c_seg"))
      .agg(sum(col("l_price").cast("decimal(18,2)")).as("rev"))
    val advice = CubeAdvisor.advise(Seq(rollup(), rollup2()), "advch")
    assert(advice.uncovered.isEmpty, s"uncovered: ${advice.uncovered}")
    assert(advice.chains.size == 1, advice.chains)
    val rec = advice.chains.head
    assert(rec.coveredQueries == Seq(0, 1))
    assert(rec.paths.size == 3 && rec.config.edges.size == 2,
      rec.config.edges)
    // honesty: materialize VERBATIM, register — the raw rollup routes
    // to the advised chain cube and matches its own raw recompute
    val cc = ChainCubeManager.create(rec.config,
      rec.paths.map(spark.read.parquet(_)))
    val cubeDir = Files.createTempDirectory("graft_advchain_cube")
      .toString
    CubeManager.save(cc.cube, cubeDir)
    CubeCatalog.install(spark)
    CubeCatalog.registerChain("advch_pin",
      cc.copy(cube = CubeManager.load(spark, cubeDir,
        rec.config.cube.name)), rec.paths)
    val routed = rollup()
    val scans = routed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scans.nonEmpty && !scans.exists(_.startsWith(dir)),
      s"advised chain plan did not route: $scans")
    val served = routed.collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val raw = rollup().collect().map(_.toSeq).sortBy(_.toString)
    assert(served.toSeq == raw.toSeq,
      "advised-and-routed chain rollup must equal the raw recompute")
    // a two-relation join stays with the binary join-MV family; an
    // OUTER three-way tree is uncovered (no chain vocabulary)
    val adviceJ = CubeAdvisor.advise(Seq(
      o.join(l, col("o_key") === col("l_key"))
        .groupBy(col("o_prio"))
        .agg(sum(col("l_price").cast("decimal(18,2)")).as("rev"))),
      "advch2")
    assert(adviceJ.chains.isEmpty && adviceJ.joinCubes.size == 1,
      s"binary joins must stay in the join-MV family: $adviceJ")
    val adviceO = CubeAdvisor.advise(Seq(
      o.join(l, col("o_key") === col("l_key"), "left_outer")
        .join(c, col("o_cust") === col("c_key"))
        .groupBy(col("o_prio"), col("c_seg"))
        .agg(sum(col("l_price").cast("decimal(18,2)")).as("rev"))),
      "advch3")
    assert(adviceO.chains.isEmpty && adviceO.uncovered == Seq(0),
      s"an outer three-way tree must land uncovered: $adviceO")
  }

  test("cohort workloads over a 3-table chain fold into the CHAIN rec; stats veto applies") {
    import spark.implicits._
    CubeCatalog.clear()
    val dir = Files.createTempDirectory("graft_advchcoh").toString
    val rnd = new scala.util.Random(83)
    (0 until 60).map(i => (i.toLong, (i % 8).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(21) * 86400000L)))
      .toDF("o_key", "o_cust", "o_ts").write.parquet(s"$dir/ord")
    (0 until 300).map(_ => (rnd.nextInt(66).toLong,
      rnd.nextInt(20).toLong,
      math.round(rnd.nextDouble() * 10000) / 100.0))
      .toDF("l_key", "l_supp", "l_amt").write.parquet(s"$dir/lin")
    (0L to 7L).map(i => (i, Seq("AUTO", "HOME")(rnd.nextInt(2))))
      .toDF("c_key", "c_seg").write.parquet(s"$dir/cus")
    def o = spark.read.parquet(s"$dir/ord")
    def l = spark.read.parquet(s"$dir/lin")
    def c = spark.read.parquet(s"$dir/cus")
    def joined = o.join(l, col("o_key") === col("l_key"))
      .join(c, col("o_cust") === col("c_key"))
    def rollup() = joined
      .groupBy(col("c_seg"), date_trunc("day", col("o_ts")).as("d"))
      .agg(sum(col("l_amt").cast("decimal(18,2)")).as("rev"))
    def retention() = {
      val up = joined.select(col("l_supp"),
          floor((unix_timestamp(col("o_ts")).cast("double") / 86400)
            .cast("long").cast("double") / 7).cast("long").as("p"))
        .distinct()
      up.as("cur").join(up.as("prev"),
          col("cur.l_supp") === col("prev.l_supp") &&
            col("prev.p") === col("cur.p") - 1)
        .groupBy(col("cur.p"))
        .agg(countDistinct(col("cur.l_supp")).as("retained"))
    }
    // ONE chain rec covers both: the generic rollup hit and the
    // retention fold union by canonical chain identity — the merged
    // config carries the rollup's measure AND the cohort's day-dimmed
    // supplier bitmap
    val advice = CubeAdvisor.advise(Seq(rollup(), retention()), "advcc")
    assert(advice.uncovered.isEmpty, s"uncovered: ${advice.uncovered}")
    assert(advice.chains.size == 1, advice.chains)
    assert(advice.retention.isEmpty,
      s"a chain cohort group must not emit a retention rec with a " +
        s"non-path source: ${advice.retention}")
    val rec = advice.chains.head
    assert(rec.coveredQueries == Seq(0, 1), rec.coveredQueries)
    assert(rec.config.cube.bitmaps.exists(_.path == "l_supp"), rec)
    assert(rec.config.cube.measures.exists(_.path == "l_amt"), rec)
    assert(rec.config.cube.dims.count {
      case TimeDim(_, "o_ts", _) => true; case _ => false } == 1, rec)
    // honesty: materialize VERBATIM, register — BOTH queries route and
    // the cohort result equals its raw recompute
    val cc = ChainCubeManager.create(rec.config,
      rec.paths.map(spark.read.parquet(_)))
    val cubeDir = Files.createTempDirectory("graft_advchcoh_cube")
      .toString
    CubeManager.save(cc.cube, cubeDir)
    CubeCatalog.install(spark)
    CubeCatalog.registerChain("advcc_pin",
      cc.copy(cube = CubeManager.load(spark, cubeDir,
        rec.config.cube.name)), rec.paths)
    Seq(rollup(), retention()).zipWithIndex.foreach { case (q, i) =>
      val scans = scansOf(q)
      assert(scans.nonEmpty && !scans.exists(_.startsWith(dir)),
        s"advised chain workload $i did not route: $scans")
    }
    val served = retention().collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val raw = retention().collect().map(_.toSeq).sortBy(_.toString)
    assert(served.toSeq == raw.toSeq,
      "advised-and-routed chain retention must equal the raw recompute")
    // stats mode: the chain rec is probed (one count-only pass over
    // the joined frame) ...
    val stats = CubeAdvisor.adviseWithStats(spark,
      Seq(rollup(), retention()), "advcc_s")
    val srec = stats.chains.head
    assert(srec.cells.isDefined && srec.sourceRows.isDefined, srec)
    assert(srec.worthwhile, srec)
    // ... and a chain cube whose cells approach the joined row count
    // is VETOED — the most expensive materialization deserves the
    // cheapest insurance
    val bad = CubeAdvisor.adviseWithStats(spark,
      Seq(joined.groupBy(col("l_amt"))
        .agg(sum(col("l_amt").cast("decimal(18,2)")).as("s"))),
      "advcc_bad")
    assert(bad.chains.size == 1, bad.chains)
    assert(!bad.chains.head.worthwhile,
      s"near-unique chain grouping must be vetoed: ${bad.chains.head}")
  }

  test("cohort-matrix workloads fold into the retention-family rec") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(61)
    val rows = (0 until 1500).map { i =>
      val day = rnd.nextInt(25)
      (new Timestamp(1700000000000L + day * 86400000L
        + rnd.nextInt(86400000)),
        rnd.nextInt(20 * (day + 1)).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advcm_src").toString
    rows.toDF("ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def pExpr = floor((unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").cast("double") / 3).cast("long")
    def cmQ() = {
      val a = src.select(col("uid"), pExpr.as("p")).distinct()
      val f = src.groupBy(col("uid")).agg(min(pExpr).as("cohort"))
      a.join(f, "uid")
        .groupBy(col("cohort"), (col("p") - col("cohort")).as("age"))
        .agg(countDistinct(col("uid")).as("active"))
    }
    // the heatmap folds into the same day-dimmed bitmap-cube family
    // the retention matcher recommends — one rec, id bitmap, no
    // weighted measure (no weight column exists in this shape)
    val advice = CubeAdvisor.advise(Seq(cmQ()), "advcm")
    assert(advice.uncovered.isEmpty, s"uncovered: ${advice.uncovered}")
    assert(advice.retention.size == 1)
    val rec = advice.retention.head
    assert(rec.config.bitmaps == Seq(Measure("uid_xd", "uid")) &&
      rec.config.weighted.isEmpty, rec.config)
    assert(rec.periods == Seq(3) && rec.coveredQueries == Seq(0))
    // honesty: materialize VERBATIM, register — the raw heatmap routes
    // to the advised cube and matches its own raw recompute
    val dir = Files.createTempDirectory("graft_advcm_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), dir)
    CubeCatalog.install(spark)
    CubeCatalog.register("advcm_pin",
      CubeManager.load(spark, dir, rec.config.name), srcDir)
    val routed = cmQ()
    val scans = routed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scans.nonEmpty && !scans.exists(_.endsWith(srcDir)),
      s"advised cohort-matrix plan did not route: $scans")
    val served = routed.collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val raw = cmQ().collect().map(_.toSeq).sortBy(_.toString)
    assert(served.toSeq == raw.toSeq,
      "advised-and-routed heatmap must equal the raw recompute")
  }

  test("leaderboard workloads fold into the retention-family rec; " +
      "honesty loop routes the board") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    CubeCatalog.clear()
    val rnd = new scala.util.Random(71)
    val rows = (0 until 1200).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(20) * 86400000L
        + rnd.nextInt(86400000)),
        s"u${i % 40}",
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    val srcDir = Files.createTempDirectory("graft_advts_src").toString
    rows.toDF("ts", "uid", "amount").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def board() = {
      val g = src.filter(col("uid").isNotNull)
        .groupBy(col("uid"),
          floor((unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").cast("double") / 7).cast("long").as("p"))
        .agg(sum(col("amount").cast("decimal(18,2)")).as("w"))
      val win = Window.partitionBy(col("p"))
        .orderBy(col("w").desc, col("uid").asc)
      g.withColumn("rnk", row_number().over(win)).filter(col("rnk") <= 3)
        .select(col("p").as("period"), col("rnk").as("rank"),
          col("uid").as("id"), col("w").cast("double").as("value"))
    }
    // a STRING-keyed board: the rec must carry dictBitmaps + weighted
    // (the routed serve translates candidates through the dictionary)
    val advice = CubeAdvisor.advise(Seq(board()), "advts")
    assert(advice.uncovered.isEmpty && advice.retention.size == 1,
      s"leaderboard workload must fold into one rec: $advice")
    val rec = advice.retention.head
    assert(rec.config.weighted ==
      Seq(WeightedMeasure("amount_w", "uid", "amount")) &&
      rec.config.dictBitmaps == Seq(Measure("uid_xd", "uid")) &&
      rec.config.bitmaps.isEmpty, rec.config)
    val dir = Files.createTempDirectory("graft_advts_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), dir)
    CubeCatalog.register("advts_pin",
      CubeManager.load(spark, dir, rec.config.name), srcDir)
    val routed = board()
    val scans = routed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scans.nonEmpty && !scans.exists(_.endsWith(srcDir)),
      s"advised leaderboard did not route: $scans")
    val served = routed.collect().map(_.toSeq).sortBy(_.toString)
    CubeCatalog.clear()
    val raw = board().collect().map(_.toSeq).sortBy(_.toString)
    assert(served.toSeq == raw.toSeq,
      "advised-and-routed board must equal the raw rank")
  }

  test("value-bridge workloads fold into the retention-family rec; " +
      "honesty loop routes every term") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(61)
    val rows = (0 until 1500).map { i =>
      val day = rnd.nextInt(25)
      (new Timestamp(1700000000000L + day * 86400000L
        + rnd.nextInt(86400000)),
        rnd.nextInt(20 * (day + 1)).toLong,
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    val srcDir = Files.createTempDirectory("graft_advvb_src").toString
    rows.toDF("ts", "uid", "amount").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
      .filter(col("uid").isNotNull)
    def pExpr = floor((unix_timestamp(col("ts")).cast("double") / 86400)
      .cast("long").cast("double") / 3).cast("long")
    def g = src.groupBy(col("uid"), pExpr.as("p"))
      .agg(sum(col("amount").cast("decimal(18,2)")).as("w"))
    def f = src.groupBy(col("uid")).agg(min(pExpr).as("fp"))
    def rev() = g.groupBy(col("p")).agg(sum(col("w")).as("revenue"))
    def newV() = g.as("g").join(f.as("f"),
        col("g.uid") === col("f.uid") && col("g.p") === col("f.fp"))
      .groupBy(col("g.p")).agg(sum(col("g.w")).as("new_value"))
    def churn() = g.as("prv").join(g.as("cur"),
        col("cur.uid") === col("prv.uid") &&
          col("cur.p") === col("prv.p") + 1, "left_anti")
      .groupBy((col("p") + 1).as("p"))
      .agg(sum(col("w")).as("churned_value"))
    def spine() = src.select(pExpr.as("p")).distinct()
    // an unfiltered DIRECT revenue (null ids included) rides a plain
    // decimal MEASURE, not the maps — one rec must carry both
    def revAll() = spark.read.parquet(srcDir).groupBy(pExpr.as("p"))
      .agg(sum(col("amount").cast("decimal(18,2)")).as("revenue"))
    val advice = CubeAdvisor.advise(
      Seq(rev(), newV(), churn(), spine(), revAll()), "advvb")
    assert(advice.uncovered.isEmpty, s"uncovered: ${advice.uncovered}")
    // the id-filtered terms share one rec; the unfiltered direct
    // revenue groups by no id → its own measure-only rec
    assert(advice.retention.size == 2, advice.retention.map(_.config))
    val recs = advice.retention.sortBy(_.config.weighted.isEmpty)
    val wrec = recs.head
    assert(wrec.config.weighted ==
      Seq(WeightedMeasure("amount_w", "uid", "amount")), wrec.config)
    assert(wrec.config.bitmaps == Seq(Measure("uid_xd", "uid")))
    val mrec = recs(1)
    assert(mrec.config.weighted.isEmpty &&
      mrec.config.measures == Seq(Measure("amount_m", "amount")),
      mrec.config)
    // honesty: materialize BOTH verbatim, register — every term routes
    // and equals its raw recompute
    advice.retention.zipWithIndex.foreach { case (rec, i) =>
      val dir = Files.createTempDirectory(s"graft_advvb_cube$i").toString
      CubeManager.save(CubeManager.create(rec.config, src.sparkSession
        .read.parquet(srcDir)), dir)
      CubeCatalog.register(s"advvb_pin$i",
        CubeManager.load(spark, dir, rec.config.name), srcDir)
    }
    val qs = Seq(rev(), newV(), churn(), spine(), revAll())
    qs.zipWithIndex.foreach { case (q, i) =>
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          CubeCatalog.sourcePathOf(r)
      }.flatten
      assert(scans.nonEmpty && !scans.exists(_.endsWith(srcDir)),
        s"advised bridge term $i did not route: $scans")
    }
    val served = qs.map(_.collect().map(_.toSeq).sortBy(_.toString))
    CubeCatalog.clear()
    Seq(rev(), newV(), churn(), spine(), revAll()).zip(served)
      .zipWithIndex.foreach { case ((q, s), i) =>
        assert(q.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
          s.toSeq,
          s"advised-and-routed bridge term $i must equal the raw " +
            "recompute")
      }
  }

  test("first-seen and engagement workloads fold into the retention-family cube") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(91)
    // ids drawn from a growing pool so first-seen periods SPREAD (an
    // all-ids-on-day-one corpus has a one-row growth chart)
    val rows = (0 until 1500).map { i =>
      val day = rnd.nextInt(25)
      (new Timestamp(1700000000000L + day * 86400000L
        + rnd.nextInt(86400000)),
        rnd.nextInt(20 * (day + 1)).toLong)
    }
    val srcDir = Files.createTempDirectory("graft_advfs_src").toString
    rows.toDF("ts", "uid").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def firstSeenQ() = {
      val f = src.select(col("uid"),
          floor((unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").cast("double") / 3).cast("long").as("w"))
        .groupBy(col("uid"))
        .agg(min(col("w")).as("fw"))
      f.groupBy(col("fw")).agg(count(col("uid")).as("new_users"))
    }
    def engageQ(strictLo: Boolean = false) = {
      val d = (unix_timestamp(col("ts")).cast("double") / 86400)
        .cast("long")
      val withD = src.select(col("uid"), d.as("d"))
      val bounded = (if (strictLo) withD.filter(col("d") > 19677L)
        else withD.filter(col("d") >= 19677L))
        .filter(col("d") <= 19690L)
      bounded.groupBy(col("uid"))
        .agg(countDistinct(col("d")).as("n_active"))
        .groupBy(col("n_active"))
        .agg(count(col("uid")).as("users"))
    }
    // growth accounting's fourth cell rides the same cube: the raw
    // three-join resurrected plan (anti on p−1, semi witness q < p)
    def resurrectedQ() = {
      val up = src.select(col("uid"),
          (unix_timestamp(col("ts")).cast("double") / 86400)
            .cast("long").as("d")).distinct()
      up.as("c").join(up.as("prev"),
          col("c.uid") === col("prev.uid") &&
            col("prev.d") === col("c.d") - 1, "left_anti")
        .as("c2").join(up.as("w"),
          col("w.uid") === col("c2.uid") && col("w.d") < col("c2.d"),
          "left_semi")
        .groupBy(col("d"))
        .agg(countDistinct(col("uid")).as("resurrected"))
    }
    // all three hits want the SAME day-dimmed bitmap cube the
    // retention family maintains — one recommendation covers them
    val advice = CubeAdvisor.advise(
      Seq(firstSeenQ(), engageQ(), resurrectedQ()), "fs")
    assert(advice.retention.size == 1 && advice.uncovered.isEmpty,
      advice.toString)
    val rec = advice.retention.head
    assert(rec.coveredQueries == Seq(0, 1, 2), rec.toString)
    assert(rec.config.bitmaps.map(_.path) == Seq("uid"), rec.toString)
    // capture the raw answers BEFORE registration
    val rawFs = firstSeenQ().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawEn = engageQ().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawRz = resurrectedQ().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawFs.size > 3, s"fixture must spread first-seen: $rawFs")
    assert(rawRz.nonEmpty, "fixture must resurrect some ids")
    // honesty loop, the q254 discipline: materialize VERBATIM,
    // register, and the SAME raw plans silently route — cube-only
    // plans, identical answers
    val cubeDir = Files.createTempDirectory("graft_advfs_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), cubeDir)
    CubeCatalog.register("advfs",
      CubeManager.load(spark, cubeDir, rec.config.name), srcDir)
    def scans(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          CubeCatalog.sourcePathOf(r)
      }.flatten
    val (fsQ, enQ, rzQ) = (firstSeenQ(), engageQ(), resurrectedQ())
    assert(scans(fsQ).nonEmpty &&
      scans(fsQ).forall(_.endsWith("/" + rec.config.name)),
      s"advised first-seen must route: ${scans(fsQ)}")
    assert(scans(enQ).nonEmpty &&
      scans(enQ).forall(_.endsWith("/" + rec.config.name)),
      s"advised engagement must route: ${scans(enQ)}")
    assert(scans(rzQ).nonEmpty &&
      scans(rzQ).forall(_.endsWith("/" + rec.config.name)),
      s"advised resurrected must route: ${scans(rzQ)}")
    assert(fsQ.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == rawFs, "routed first-seen must equal the raw plan")
    assert(enQ.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == rawEn, "routed engagement must equal the raw plan")
    assert(rzQ.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == rawRz, "routed resurrected must equal the raw plan")
    // refusal edge rides the same matcher the rewrite uses: a strict
    // window bound stays uncovered
    val bad = CubeAdvisor.advise(Seq(engageQ(strictLo = true)), "fsbad")
    assert(bad.retention.isEmpty && bad.uncovered == Seq(0),
      s"strict bound must stay uncovered: $bad")
    // calendar-ordinal cohorts ride the SAME matchers/rec family: a
    // monthly-retention workload is covered by a day-dimmed cube rec
    // (day cells collapse to any calendar), while the yyyymm encoding
    // stays uncovered (its −1 adjacency is wrong at December).
    // Catalog cleared first — with advfs still registered the monthly
    // plan ROUTES before advise sees it (the analyzer would read the
    // serve, not the workload).
    CubeCatalog.clear()
    def monthlyQ(enc: Long) = {
      val up = src.select(col("uid"),
          (year(col("ts")) * lit(enc) + month(col("ts")))
            .cast("long").as("m")).distinct()
      up.as("cur").join(up.as("prev"),
          col("cur.uid") === col("prev.uid") &&
            col("prev.m") === col("cur.m") - 1)
        .groupBy(col("cur.m"))
        .agg(countDistinct(col("cur.uid")).as("retained"))
    }
    val calAdvice = CubeAdvisor.advise(Seq(monthlyQ(12L)), "cal")
    assert(calAdvice.retention.size == 1 &&
      calAdvice.uncovered.isEmpty, calAdvice.toString)
    val yyyymm = CubeAdvisor.advise(Seq(monthlyQ(100L)), "calbad")
    assert(yyyymm.retention.isEmpty && yyyymm.uncovered == Seq(0),
      s"yyyymm must stay uncovered: $yyyymm")
    CubeCatalog.clear()
  }

  test("composite dashboards advise per metric component") {
    import spark.implicits._
    CubeCatalog.clear()
    val rnd = new scala.util.Random(59)
    val rows = (0 until 900).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(20) * 86400000L
        + rnd.nextInt(86400000)), (i % 70).toLong, rnd.nextDouble() * 9)
    }
    val srcDir = Files.createTempDirectory("graft_advcomp_src").toString
    rows.toDF("ts", "uid", "value").write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    def du = src.select(col("uid"),
        (unix_timestamp(col("ts")).cast("double") / 86400)
          .cast("long").as("d"))
      .distinct()
    // the q269 shape: DAU and MAU (two rolling components) joined on
    // day with the ratio in the shell — the rewrite serves each
    // sub-aggregate in place, so advise must see both components
    // instead of reporting the dashboard uncovered
    def dashboard() = {
      val dau = graft.functions.Rolling.endpoints(du, 1)
        .agg(countDistinct(col("uid")).as("dau"))
      val mau = graft.functions.Rolling.endpoints(du, 7)
        .agg(countDistinct(col("uid")).as("mau"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          (col("dau") / col("mau")).as("ratio"))
    }
    val advice = CubeAdvisor.advise(Seq(dashboard()), "comp")
    assert(advice.uncovered.isEmpty, advice.toString)
    assert(advice.rolling.size == 1, advice.toString)
    val rec = advice.rolling.head
    // both components fold into ONE rolling rec: same source/day/id,
    // two windows
    assert(rec.coveredQueries == Seq(0) && rec.windows == Seq(1, 7),
      rec.toString)
    // honesty loop: materialize verbatim, register — the SAME
    // composite plan silently routes end to end
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    val raw = sortedRows(dashboard())
    val cubeDir = Files.createTempDirectory("graft_advcomp_cube").toString
    CubeManager.save(CubeManager.create(rec.config, src), cubeDir)
    CubeCatalog.register("advcomp",
      CubeManager.load(spark, cubeDir, rec.config.name), srcDir)
    val q = dashboard()
    val scans = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        CubeCatalog.sourcePathOf(r)
    }.flatten
    assert(scans.nonEmpty &&
      scans.forall(_.endsWith("/" + rec.config.name)),
      s"advised composite must route: $scans")
    assert(sortedRows(q) == raw,
      "routed composite must equal the raw recompute")
    // ALL-or-nothing honesty: a shell mixing a servable metric with an
    // ENRICHMENT side reading raw rows keeps the query whole and
    // uncovered — a cube cannot remove the raw-side scan
    CubeCatalog.clear()
    def enriched() = {
      val wau = graft.functions.Rolling.endpoints(du, 7)
        .agg(countDistinct(col("uid")).as("wau"))
      val raw = du
      wau.join(raw, wau("day") === raw("d"))
    }
    val mixed = CubeAdvisor.advise(Seq(enriched()), "compbad")
    assert(mixed.rolling.isEmpty && mixed.uncovered == Seq(0),
      s"enrichment shell must stay whole and uncovered: $mixed")
    CubeCatalog.clear()
  }
}
