package graft.ann

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Persisted IVF index lifecycle: create → query (== the in-session
  * IVF search), restart-reload, append-only upserts against persisted
  * centroids, streaming maintenance with replay/re-home guards. */
class AnnIndexSpec extends AnyFunSuite {
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

  /** Deterministic synthetic corpus: 60 vectors, dim 6, values from a
    * seeded generator (same float bits every run). */
  private def corpus(n: Int = 60, from: Int = 0): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(77 + from)
    (from until from + n).map { i =>
      (i.toLong, Array.fill(6)((rnd.nextInt(2000) - 1000) / 997.0f))
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }).toSeq

  test("persisted serve == in-session IVF build; restart-reload identical") {
    val dir = Files.createTempDirectory("graft_ann_spec").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("ix", corpus(), k = 8, lloydIters = 2)
    val queries = corpus().filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val served = rows(svc.queryIndex("ix", queries, topK = 4, nprobe = 3))
    assert(served.nonEmpty && served.map(_.head).distinct.size == 3)

    // in-session equivalent: same deterministic centroids, same scoring
    val em = corpus().select(col("vec_id"), col("embedding"),
      Similarity.normExpr("embedding").as("nrm"))
    val cents = Similarity.buildCentroids(em, 8, 2)
    import org.apache.spark.sql.expressions.Window
    val probes = Similarity.assign(
        em.filter(col("vec_id") < 3), cents, keep = 3)
      .withColumnRenamed("vec_id", "query_id")
    val scored = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .join(broadcast(probes), Seq("query_id"))
      .join(Similarity.assignWithVec(em, cents), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        Similarity.dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val direct = rows(scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select(col("query_id"), col("vec_id").as("cand_id"), col("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank")))
    assert(served == direct,
      "persisted-index serve diverged from the in-session IVF search")

    // restart: a FRESH service instance reloads from disk only
    val svc2 = new AnnIndexService(spark, dir)
    assert(svc2.listIndexes() == Seq("ix"))
    assert(rows(svc2.queryIndex("ix", queries, topK = 4, nprobe = 3))
      == served, "reloaded index serves a different answer")
    svc2.deleteIndex("ix")
    assert(svc2.listIndexes().isEmpty)
  }

  test("upsert appends a segment assigned by PERSISTED centroids") {
    val dir = Files.createTempDirectory("graft_ann_up").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("ux", corpus(), k = 8, lloydIters = 1)
    val before = svc.loadIndex("ux")
    val newVecs = corpus(n = 10, from = 1000)
    svc.upsertVectors("ux", newVecs)
    val after = svc.loadIndex("ux")
    assert(after.vectors.count() == before.vectors.count() + 10)
    // the new rows' assignments equal a fresh assignment against the
    // SAME persisted centroids (maintenance never re-clusters)
    val got = after.vectors.filter(col("vec_id") >= 1000L)
      .select(col("vec_id"), col("cent_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Similarity.assign(
        newVecs.select(col("vec_id"), col("embedding"),
          Similarity.normExpr("embedding").as("nrm")),
        before.centroids, keep = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, "upsert assignments diverged from the centroids")
    // queries now see the appended vectors
    val q = newVecs.limit(1)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(svc.queryIndex("ux", q, topK = 3, nprobe = 8).count() == 3)
  }

  test("compaction: one segment, identical results, deferred segment GC") {
    val dir = Files.createTempDirectory("graft_ann_cmp").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("cx", corpus(), k = 8, lloydIters = 1)
    svc.upsertVectors("cx", corpus(n = 10, from = 1000))
    svc.upsertVectors("cx", corpus(n = 10, from = 2000))
    def segDirs() = new java.io.File(s"$dir/cx.ann").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg"))
      .map(_.getName).sorted.toSeq
    assert(segDirs() == Seq("seg0", "seg1", "seg2"))
    val queries = corpus().filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = rows(svc.queryIndex("cx", queries, topK = 4, nprobe = 3))

    val compacted = svc.compactIndex("cx")
    // one live segment; results bit-identical; old segments still on
    // disk (the PREVIOUS version may be mid-read by a straggler)
    assert(compacted.vectors.count() == 80)
    assert(segDirs() == Seq("seg0", "seg1", "seg2", "seg3"))
    assert(rows(svc.queryIndex("cx", queries, topK = 4, nprobe = 3))
      == before, "compaction changed query results")
    // a fresh service (restart) sees the compacted layout identically
    val svc2 = new AnnIndexService(spark, dir)
    assert(rows(svc2.queryIndex("cx", queries, topK = 4, nprobe = 3))
      == before, "post-compaction restart-reload diverged")
    // compacting an already-compact index is a no-op
    assert(svc.compactIndex("cx").vectors.count() == 80)
    assert(segDirs() == Seq("seg0", "seg1", "seg2", "seg3"))

    // old segments stay referenced while ANY kept version (advertised
    // window + the one deferred-GC grace version) lists them: with
    // retain=2 the pre-compaction version leaves the kept set two
    // publishes after compaction, not one — an in-flight as-of read of
    // the window's edge must never lose its files (the cube-service
    // deferred-GC argument on the index lifecycle)
    svc.upsertVectors("cx", corpus(n = 5, from = 3000))
    assert(segDirs() == Seq("seg0", "seg1", "seg2", "seg3", "seg4"),
      "pre-compaction segments GC'd while a kept version still lists them")
    svc.upsertVectors("cx", corpus(n = 5, from = 4000))
    assert(segDirs() == Seq("seg3", "seg4", "seg5"),
      "superseded segments survived past the last kept version listing them")
    assert(svc.queryIndex("cx", queries, topK = 4, nprobe = 3).count()
      == before.size)
  }

  test("streaming maintenance: insert batches fold once; deletes tombstone; re-home guarded") {
    val dir = Files.createTempDirectory("graft_ann_stream").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("sx", corpus(), k = 4, lloydIters = 1)
    val docSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def ins(id: Long, v: Seq[Float]) =
      s"""{"operationType":"insert","fullDocument":{"vec_id":$id,"embedding":[${v.mkString(",")}]}}"""
    val changes = s"$dir/changes"
    Files.createDirectories(Paths.get(changes))
    Files.writeString(Paths.get(changes, "c0.json"),
      ins(2000L, Seq(0.1f, 0.2f, 0.3f, 0.4f, 0.5f, 0.6f)) + "\n" +
        ins(2001L, Seq(-0.1f, -0.2f, -0.3f, -0.4f, -0.5f, -0.6f)))
    val q = svc.startAutoUpdate("sx", changes, docSchema)
    q.processAllAvailable()
    svc.stopAutoUpdate("sx")
    assert(svc.loadIndex("sx").vectors.filter(col("vec_id") >= 2000L)
      .count() == 2)
    // streamed assignment == batch assignment against the same centroids
    val streamed = svc.loadIndex("sx").vectors
      .filter(col("vec_id") >= 2000L)
      .select(col("vec_id"), col("cent_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Similarity.assign(
        svc.loadIndex("sx").vectors.filter(col("vec_id") >= 2000L)
          .select(col("vec_id"), col("embedding"),
            Similarity.normExpr("embedding").as("nrm")),
        svc.loadIndex("sx").centroids, keep = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch, "stream assignment != batch assignment")
    // checkpoint-loss replay of the SAME stream is a no-op
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr); f.delete(); ()
    }
    rmr(new java.io.File(s"$dir/sx.ann.checkpoint"))
    val q2 = svc.startAutoUpdate("sx", changes, docSchema)
    q2.processAllAvailable()
    svc.stopAutoUpdate("sx")
    assert(svc.loadIndex("sx").vectors.filter(col("vec_id") >= 2000L)
      .count() == 2, "checkpoint-loss replay double-folded")
    // a DIFFERENT change dir refuses while a recorded id exists
    val changesB = s"$dir/changesB"
    Files.createDirectories(Paths.get(changesB))
    Files.writeString(Paths.get(changesB, "b0.json"),
      ins(3000L, Seq(1f, 0f, 0f, 0f, 0f, 0f)))
    intercept[IllegalArgumentException] {
      svc.startAutoUpdate("sx", changesB, docSchema)
    }
    // explicit re-home (checkpoint deleted) folds B from batch 0
    rmr(new java.io.File(s"$dir/sx.ann.checkpoint"))
    val q3 = svc.startAutoUpdate("sx", changesB, docSchema,
      resetBatchTracking = true)
    q3.processAllAvailable()
    svc.stopAutoUpdate("sx")
    assert(svc.loadIndex("sx").vectors.filter(col("vec_id") === 3000L)
      .count() == 1, "re-homed stream's first batch was skipped")
    // a streamed delete event tombstones the vector in the same publish
    Files.writeString(Paths.get(changesB, "b1.json"),
      """{"operationType":"delete","fullDocumentBeforeChange":{"vec_id":3000,"embedding":[1,0,0,0,0,0]}}""")
    val q4 = svc.startAutoUpdate("sx", changesB, docSchema)
    q4.processAllAvailable()
    svc.stopAutoUpdate("sx")
    assert(svc.loadIndex("sx").vectors.filter(col("vec_id") === 3000L)
      .count() == 0, "streamed delete did not mask the vector")
    // a streamed UPDATE (replace) masks the old rows and serves the new
    Files.writeString(Paths.get(changesB, "b2.json"),
      """{"operationType":"replace","fullDocument":{"vec_id":2000,"embedding":[9,0,0,0,0,0]},"fullDocumentBeforeChange":{"vec_id":2000,"embedding":[0.1,0.2,0.3,0.4,0.5,0.6]}}""")
    val q5 = svc.startAutoUpdate("sx", changesB, docSchema)
    q5.processAllAvailable()
    svc.stopAutoUpdate("sx")
    val served2000 = svc.loadIndex("sx").vectors
      .filter(col("vec_id") === 2000L).collect()
    assert(served2000.length == 1, s"update left ${served2000.length} rows")
    assert(served2000.head.getAs[Seq[Float]]("embedding").head == 9f,
      "update serves the stale embedding")
    svc.deleteIndex("sx")
  }

  test("delete sidecar: mask, re-insert revives, compaction purges, restart keeps") {
    val dir = Files.createTempDirectory("graft_ann_del").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("dx", corpus(), k = 4, lloydIters = 1)
    val queries = corpus().filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = rows(svc.queryIndex("dx", queries, topK = 4, nprobe = 4))
    // delete the top candidate of query 0 — it must vanish from serves
    val victim = before.head(1).asInstanceOf[Long]
    import spark.implicits._
    svc.deleteVectors("dx", Seq(victim).toDF("vec_id"))
    assert(svc.loadIndex("dx").vectors
      .filter(col("vec_id") === victim).count() == 0)
    val after = rows(svc.queryIndex("dx", queries, topK = 4, nprobe = 4))
    assert(!after.exists(_(1) == victim), "deleted vector still served")
    assert(svc.tombstones("dx").count() == 1)
    // re-insert the id with a NEW embedding: live again (higher segment
    // outruns the tombstone — no sidecar surgery), exactly one row
    svc.upsertVectors("dx",
      Seq((victim, Array(1f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val revived = svc.loadIndex("dx").vectors
      .filter(col("vec_id") === victim).collect()
    assert(revived.length == 1, s"re-insert served ${revived.length} rows")
    assert(revived.head.getAs[Seq[Float]]("embedding").head == 1f)
    assert(svc.tombstones("dx").count() == 1,
      "re-insert should not edit the sidecar")
    // delete another id, then compact: masked rows physically dropped,
    // sidecar cleared, serves identical across the compaction
    svc.deleteVectors("dx", Seq(7L).toDF("vec_id"))
    val preCompact = rows(svc.queryIndex("dx", queries, topK = 4, nprobe = 4))
    val liveCount = svc.loadIndex("dx").vectors.count()
    svc.compactIndex("dx")
    assert(svc.tombstones("dx").count() == 0, "compaction kept the sidecar")
    assert(svc.loadIndex("dx").vectors.count() == liveCount)
    assert(rows(svc.queryIndex("dx", queries, topK = 4, nprobe = 4))
      == preCompact, "compaction changed serve results")
    // a fresh service (restart) sees the same masked state
    svc.deleteVectors("dx", Seq(9L).toDF("vec_id"))
    val svc2 = new AnnIndexService(spark, dir)
    assert(svc2.loadIndex("dx").vectors
      .filter(col("vec_id") === 9L).count() == 0,
      "tombstones lost across restart")
    svc2.deleteIndex("dx")
  }

  test("tuneNprobe finds the minimal probe width for a recall target") {
    val dir = Files.createTempDirectory("graft_ann_tune").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("tx", corpus(120), k = 8, lloydIters = 2)
    val sample = corpus(120).filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (np, recall) = svc.tuneNprobe("tx", sample, topK = 4,
      targetRecall = 0.9)
    assert(np >= 1 && np <= 8 && recall >= 0.9, s"np=$np recall=$recall")
    // minimality: one probe fewer must miss the target (unless np == 1)
    if (np > 1) {
      def rs(n: Int) = svc.queryIndex("tx", sample, topK = 4, nprobe = n)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = rs(8)
      val below = rs(np - 1).intersect(exact).size.toDouble / exact.size
      assert(below < 0.9, s"np-1 already met the target: $below")
    }
    // a 1.0 target is always satisfiable: exhaustive probing is exact
    val (npFull, rFull) = svc.tuneNprobe("tx", sample, topK = 4,
      targetRecall = 1.0)
    assert(rFull == 1.0 && npFull <= 8)
    svc.deleteIndex("tx")
  }

  test("recluster compaction: bit-identical undrifted; recall recovers after drift") {
    val dir = Files.createTempDirectory("graft_ann_recl").toString
    val svc = new AnnIndexService(spark, dir, retainAnnVersions = 3)
    // UNDRIFTED: the seeded Lloyd build over the same surviving corpus
    // reproduces the create-time centroids exactly, so recluster is a
    // pure relayout — results bit-identical
    svc.createIndex("rc", corpus(), k = 8, lloydIters = 2)
    val queries = corpus().filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = rows(svc.queryIndex("rc", queries, topK = 4, nprobe = 3))
    svc.compactIndex("rc", recluster = true)
    assert(rows(svc.queryIndex("rc", queries, topK = 4, nprobe = 3))
      == before, "recluster over an undrifted corpus changed results")

    // DRIFT: fold a LINE of vectors crossing the boundary between two
    // create-time centroids — the worst case for the fixed partition:
    // each member's true nearest neighbors are its immediate line
    // neighbors on BOTH sides of the stale boundary, but the stale
    // assignment splits the line across the two cells, so a narrow
    // probe from near the boundary misses the other side's half. After
    // recluster the drifted mass (40 of 100 vectors) attracts its own
    // centroid(s) and line neighborhoods co-locate.
    import spark.implicits._
    val centRows = svc.loadIndex("rc").centroids
      .orderBy(col("cent_id")).collect()
    val c1 = centRows(0).getAs[scala.collection.Seq[Float]]("ce").toSeq
    val c2 = centRows(1).getAs[scala.collection.Seq[Float]]("ce").toSeq
    val mid = c1.zip(c2).map { case (a, b) => (a + b) / 2 }
    val d = c1.zip(c2).map { case (a, b) => a - b }
    val dn = math.sqrt(d.map(x => x.toDouble * x).sum).toFloat
    val pack = (5000 until 5040).map { i =>
      val t = (i - 5020) / 100.0f // −0.20 .. 0.19 along the axis
      (i.toLong,
        mid.zip(d).map { case (m, dd) => m + t * dd / dn }.toArray)
    }.toDF("vec_id", "embedding")
    svc.upsertVectors("rc", pack)
    // self-calibrating: find WHERE along the line the stale assignment
    // actually cuts, and query the members straddling that cut — the
    // vectors whose true neighbors the narrow probe must miss
    val assignedLine = svc.loadIndex("rc").vectors
      .filter(col("vec_id") >= 5000L)
      .select(col("vec_id"), col("cent_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cuts = assignedLine.sliding(2).collect {
      case Array((_, a), (i2, b)) if a != b => i2
    }.toSeq
    assert(cuts.nonEmpty,
      s"fixture: drifted line landed in one stale cell ($assignedLine)")
    val cut = cuts.head
    val qIds = Seq(cut - 2, cut - 1, cut, cut + 1)
      .filter(i => i >= 5000L && i < 5040L)
    val packQ = pack.filter(col("vec_id").isin(qIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    // ground truth: exhaustive probe (exact over the surviving corpus)
    def resultSet(np: Int): Set[(Long, Long)] =
      svc.queryIndex("rc", packQ, topK = 4, nprobe = np)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactBefore = resultSet(8)
    val recallBefore =
      resultSet(1).intersect(exactBefore).size.toDouble / exactBefore.size
    svc.compactIndex("rc", recluster = true)
    val exactAfter = resultSet(8)
    // the exhaustive serve is partition-independent: same corpus, same
    // exact answer under either clustering
    assert(exactAfter == exactBefore,
      "re-clustering changed the exhaustive (exact) answer")
    val recallAfter =
      resultSet(1).intersect(exactAfter).size.toDouble / exactAfter.size
    assert(recallAfter > recallBefore + 0.1,
      s"recall did not recover: before=$recallBefore after=$recallAfter")
    svc.deleteIndex("rc")
  }

  test("recall is monotone in nprobe: the superset-displacement argument, 100+ random trials") {
    // The q191 tuner's binary search is sound only if recall(nprobe)
    // is non-decreasing. The argument: a wider probe's candidate set
    // is a SUPERSET, and under the serve's total order (cos desc,
    // vec_id asc) an added candidate can displace a true neighbor from
    // the top-k only by ranking above it — in which case the displacer
    // is itself in the exact top-k. Made executable here over random
    // corpora with a pure-Scala twin of the serve (same cosine, same
    // assignment argmax, same tie-break), anchored against the Spark
    // serve on one corpus below.
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val trials = 120
    var checked = 0
    (0 until trials).foreach { t =>
      val rnd = new scala.util.Random(1000 + t)
      val dim = 4 + rnd.nextInt(4)
      val n = 30 + rnd.nextInt(40)
      val k = 4 + rnd.nextInt(5)
      val vecs = (0 until n).map(i =>
        i.toLong -> Array.fill(dim)(rnd.nextDouble() * 2 - 1)).toMap
      // centroids: any k distinct vectors serve (the argument is
      // partition-independent)
      val cents = rnd.shuffle(vecs.toSeq).take(k).zipWithIndex
        .map { case ((_, e), ci) => ci.toLong -> e }.toMap
      def assigned(e: Array[Double], keep: Int): Seq[Long] =
        cents.toSeq.map { case (ci, ce) => (cos(e, ce), ci) }
          .sortBy { case (c, ci) => (-c, ci) }.take(keep).map(_._2)
      val members: Map[Long, Seq[Long]] = vecs.toSeq
        .map { case (id, e) => id -> assigned(e, 1).head }
        .groupBy(_._2).map { case (ci, xs) => ci -> xs.map(_._1) }
      val queryIds = rnd.shuffle(vecs.keys.toSeq).take(3)
      def serve(qid: Long, nprobe: Int): Set[Long] = {
        val qe = vecs(qid)
        val probed = assigned(qe, nprobe).toSet
        val cands = probed.toSeq.flatMap(ci => members.getOrElse(ci, Nil))
          .filter(_ != qid)
        cands.map(id => (cos(qe, vecs(id)), id))
          .sortBy { case (c, id) => (-c, id) }.take(4).map(_._2).toSet
      }
      queryIds.foreach { qid =>
        val exact = serve(qid, k)
        if (exact.nonEmpty) {
          val recalls = (1 to k).map(np =>
            serve(qid, np).intersect(exact).size.toDouble / exact.size)
          assert(recalls == recalls.sorted,
            s"trial $t query $qid: recall not monotone: $recalls")
          checked += 1
        }
      }
    }
    assert(checked >= 100, s"only $checked monotonicity checks ran")

    // anchor: the pure-Scala twin agrees with the Spark serve's recall
    // curve shape on one persisted index (same monotonicity seen
    // through the real path)
    val dir = Files.createTempDirectory("graft_ann_mono").toString
    val svc = new AnnIndexService(spark, dir)
    svc.createIndex("mx", corpus(80), k = 8, lloydIters = 2)
    val sample = corpus(80).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def rs(np: Int) = svc.queryIndex("mx", sample, topK = 4, nprobe = np)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = rs(8)
    val curve = Seq(1, 2, 4, 8).map(np =>
      rs(np).intersect(exact).size.toDouble / exact.size)
    assert(curve == curve.sorted, s"Spark serve recall curve not monotone: $curve")
    assert(curve.last == 1.0)
    svc.deleteIndex("mx")
  }

  test("index time travel: retained window slides, as-of serves history exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ann_ttw").toString
    intercept[IllegalArgumentException] {
      new AnnIndexService(spark, dir, retainAnnVersions = 1)
    }
    val svc = new AnnIndexService(spark, dir, retainAnnVersions = 3)
    svc.createIndex("tt", corpus(60), k = 4, lloydIters = 1)         // v0
    val sample = corpus(60).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def serve() = rows(svc.queryIndex("tt", sample, topK = 3, nprobe = 4))
    def serveAt(v: Int) =
      rows(svc.queryIndexAsOf("tt", sample, v, topK = 3, nprobe = 4))
    val head0 = serve()
    svc.upsertVectors("tt",
      Seq((900L, Array.fill(4)(0.42f))).toDF("vec_id", "embedding")) // v1
    val head1 = serve()
    svc.deleteVectors("tt", Seq(900L).toDF("vec_id"))                // v2
    assert(svc.listIndexVersions("tt") == Seq(0, 1, 2))
    // every retained version serves EXACTLY what queryIndex served
    // while it was head: later folds invisible, later deletes alive
    assert(serveAt(0) == head0, "as-of(0) diverged from v0's head serve")
    assert(serveAt(1) == head1, "as-of(1) diverged from v1's head serve")
    assert(serveAt(2) == serve(), "as-of(head) diverged from queryIndex")
    assert(serveAt(1) != serveAt(2), "the delete fold must be visible at head")
    // a fourth publish slides the window: v0 refused, history exact
    svc.upsertVectors("tt",
      Seq((901L, Array.fill(4)(-0.3f))).toDF("vec_id", "embedding")) // v3
    assert(svc.listIndexVersions("tt") == Seq(1, 2, 3))
    assert(serveAt(1) == head1, "history moved after the window slid")
    val refused = intercept[IllegalArgumentException] { serveAt(0) }
    assert(refused.getMessage.contains("not retained"))
    // the grace copy survives ONE publish (deferred GC), then goes
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tt.ann", "v0")), "grace copy deleted")
    svc.upsertVectors("tt",
      Seq((902L, Array.fill(4)(0.9f))).toDF("vec_id", "embedding"))  // v4
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tt.ann", "v0")), "grace not GC'd")
    svc.deleteIndex("tt")
  }

  test("q191 graded tuning row meets its own declared target") {
    // the graded surface's one-row report must be self-consistent: the
    // tuned width really achieves the declared recall on the declared
    // sample over the q164 index (deterministic given the fixed sample)
    val sfDir = "/root/testdata/sf0.001"
    val r = graft.functions.Similarity
      .q191AnnTuneNprobe(spark, sfDir).head()
    val (np, recall, target) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(np >= 1 && np <= 16, s"nprobe out of range: $np")
    assert(recall >= target || np == 16,
      s"tuned nprobe=$np reports recall=$recall below target=$target")
    // repeat run is bit-stable (fixed sample, deterministic build)
    assert(graft.functions.Similarity.q191AnnTuneNprobe(spark, sfDir)
      .head() == r, "q191 is not deterministic across runs")
  }

  test("q164 persisted serve == q51 in-session IVF at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val a = rows(graft.functions.Similarity
      .q164AnnIndexServe(spark, sfDir))
    val b = rows(graft.functions.Similarity.q51KnnIvf(spark, sfDir))
    assert(a == b, "q164 (persisted index) diverged from q51 (in-session)")
  }
}
