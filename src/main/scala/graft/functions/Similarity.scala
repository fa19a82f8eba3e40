package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * q40 is the exact brute-force baseline (small query set × full scan —
  * the candidate side is broadcast, queries stream, so it parallelizes
  * per-partition with no shuffle of the big side). q41 is the scale
  * path: random-hyperplane LSH buckets shrink the candidate set so cost
  * is ∝ bucket size, not corpus size; on a 100 TB corpus the bucket join
  * is an equi-join on the signature, shuffled on bucket key.
  *
  * Dot/norm are left-to-right double folds over the float32 array —
  * bit-identical to DuckDB's `list_reduce(list_prepend(0.0, …))`, which
  * is what makes the cosine outputs hash-comparable with no rounding.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Exact left-fold dot product of two ArrayType(Float) columns —
    * native codegen'd expression; bit-identical to the higher-order
    * `aggregate(zip_with(…))` form and to DuckDB's list_reduce. */
  def dotExpr(a: String, b: String): Column =
    VectorExpressions.floatVecDot(col(a), col(b))

  /** Exact left-fold L2 norm (same codegen'd math). */
  def normExpr(a: String): Column =
    VectorExpressions.floatVecNorm(col(a))

  // ---------------------------------------------------------------- q40
  /** Brute-force cosine top-5 for query vectors vec_id < 5. */
  def q40KnnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val em = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
    val q = em.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val scored = em.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("cand_id"), col("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q41
  /** Multi-table LSH ANN: 4 hash tables × 6 deterministic pseudo-random
    * hyperplanes (seeded splitmix64, no RNG state) → 6-bit bucket per
    * table; candidates = union of same-bucket vectors across tables
    * (multi-table is what buys recall — a single wide signature has
    * near-zero collision probability at moderate similarity). The
    * candidate join is an equi-join on (table, bucket): shuffle ∝
    * candidate volume, never corpus². Rows-only check (recall is
    * probabilistic by design); recall vs q40's exact answer is
    * unit-tested.
    *
    * Scale shape (the two levers that matter at 100 TB): the hyperplane
    * dots run through the codegen'd [[FloatVecDot]] against LITERAL
    * float planes — a tight primitive loop inside whole-stage codegen,
    * not an interpreted `aggregate(zip_with(…))` lambda per plane per
    * row; and the cross-table candidate `.distinct()` operates on
    * (query_id, vec_id) ONLY — two longs per row — with the 500-byte
    * embedding payloads re-attached AFTER dedup (query side broadcast,
    * corpus side an id equi-join), so no vector ever rides the dedup
    * shuffle. Same discipline as [[Dedup.embeddingLshPairs]]. */
  def q41KnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTables = 4
    val bitsPerTable = 6
    val planes = hyperplanes(nPlanes = nTables * bitsPerTable, dim = 64)
    val planeCols = planes.map(p => array(p.map(v => lit(v.toFloat)): _*))
    val bitCols = planeCols.map(pc =>
      when(VectorExpressions.floatVecDot(col("embedding"), pc) >= 0, 1)
        .otherwise(0))
    val tableCols = (0 until nTables).map { t =>
      val bucket = (0 until bitsPerTable)
        .map(i => bitCols(t * bitsPerTable + i) * lit(1 << (bitsPerTable - 1 - i)))
        .reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
    val buckets = base
      .select(col("vec_id"), explode_outer(array(tableCols: _*)).as("tb"))
      .filter(col("tb").isNotNull)
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
    val qb = buckets.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "query_id")
    val candIds = buckets.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val q = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val scored = candIds
      .join(broadcast(q), Seq("query_id"))
      .join(base, Seq("vec_id"))
      .withColumn("cos", dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("cand_id"), col("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Nearest-centroid assignment: broadcast the (≤K-row) centroid table,
    * keep each vector's `keep` best clusters by cosine (ties broken by
    * cent_id asc).
    *
    * keep=1 (the full-corpus path, and every Lloyd iteration) is a pure
    * hash aggregation — max of a (cos, −cent_id) struct with map-side
    * partials, so at 100 TB the shuffle carries one row per vector, no
    * per-vector sort. The window form is kept only for keep>1, which
    * only ever runs on the (tiny) query set. */
  private[graft] def assign(df: DataFrame, cents: DataFrame, keep: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("cos", dotExpr("embedding", "ce") / (col("nrm") * col("cn")))
    if (keep == 1) {
      scored.groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cent_id")).as("nc"))).as("best"))
        .select(col("vec_id"), (-col("best.nc")).as("cent_id"))
    } else {
      assignKeepN(scored, keep)
    }
  }

  /** keep=1 assignment that CARRIES the vector through the argmax: the
    * embedding rides last in the max-struct (unreachable by the
    * comparison — (cos, −cent_id) never ties, cent_id is unique), so
    * cluster membership comes out of one hash aggregation with no
    * join-back to re-fetch vectors. Per Lloyd iteration that is 1
    * corpus shuffle instead of 3 (assign + both sides of the re-join). */
  private[graft] def assignWithVec(df: DataFrame, cents: DataFrame): DataFrame =
    df.crossJoin(broadcast(cents))
      .withColumn("cos", dotExpr("embedding", "ce") / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cent_id")).as("nc"),
        col("embedding").as("e"), col("nrm").as("n"))).as("best"))
      .select(col("vec_id"), (-col("best.nc")).as("cent_id"),
        col("best.e").as("embedding"), col("best.n").as("nrm"))

  private def assignKeepN(scored: DataFrame, keep: Int): DataFrame = {
    {
      import org.apache.spark.sql.expressions.Window
      val byCos = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cent_id"))
      scored.withColumn("crn", row_number().over(byCos))
        .filter(col("crn") <= keep)
        .select(col("vec_id"), col("cent_id"))
    }
  }

  /** [[assign]] keeping the probe RANK (`crn` = 1 for the nearest
    * cluster, ..., `keep` for the keep-th; the assign tiebreak — cos
    * desc, cent_id asc — verbatim). Lets a consumer evaluate EVERY
    * candidate probe width from one assignment: the width-`np` probe
    * set is exactly the rows with `crn` ≤ np ([[graft.ann
    * .AnnIndexService.tuneNprobe]]'s one-serve sweep rides this). Query
    * sets only — the corpus path stays the keep=1 hash aggregate. */
  private[graft] def assignRanked(df: DataFrame, cents: DataFrame,
      keep: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("cos", dotExpr("embedding", "ce") / (col("nrm") * col("cn")))
    val byCos = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cent_id"))
    scored.withColumn("crn", row_number().over(byCos))
      .filter(col("crn") <= keep)
      .select(col("vec_id"), col("cent_id"), col("crn"))
  }

  /** One Lloyd step: element-wise mean of each cluster's vectors via the
    * [[VecMeanFloat]] aggregate — one dim-length buffer per cluster with
    * map-side partials (the posexplode → groupBy(cent, pos) form would
    * multiply shuffle volume by the vector dimension). Exact BigDecimal
    * accumulation keeps the refinement deterministic under any
    * partitioning/AQE plan. Emptied clusters simply drop out. */
  private def lloydStep(em: DataFrame, cents: DataFrame): DataFrame =
    assignWithVec(em, cents)
      .groupBy(col("cent_id"))
      .agg(VecMeanFloat.vecMean(col("embedding")).as("ce"))
      .withColumn("cn", normExpr("ce"))

  // ---------------------------------------------------------------- q51
  /** IVF (inverted-file) ANN: K=16 centroids — deterministically seeded
    * (hash-ranked corpus vectors) then refined with 2 Lloyd k-means
    * iterations as pure DataFrame ops — every vector assigned to its
    * nearest centroid (linear scan over broadcast centroids), queries
    * probe their nprobe=5 nearest clusters (measured recall vs q40:
    * 0.60-0.64 across scales, vs 0.40 at nprobe=3 — the synthetic
    * embeddings are near-random, so recall is probe-fraction-bound; at
    * corpus scale K grows to thousands and nprobe/K drops). The index
    * is one extra int column; the search is an equi-join on cluster
    * id — cost ∝ probed-cluster volume. Rows-only (cluster recall is
    * approximate by design); recall vs q40 is unit-tested. */
  def q51KnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    knnIvf(spark, sfDir, k = 16, nprobe = 5, lloydIters = 2)

  /** Shared per-(session, sfDir, k, iters) refined-centroid cache —
    * q51 and q115 run the identical seeded k-means over the same
    * corpus, so whichever executes first pays the Lloyd passes once
    * (the Tables/pairsCache fixed-cost discipline; same
    * unpersist-on-context-stop hygiene). Also fixes the prior per-call
    * `.cache()` that was never unpersisted. */
  private val centroidCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int), DataFrame]
  private val evictHooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Unit]

  def evictCentroids(spark: SparkSession): Unit =
    centroidCache.keys.filter(_._1 == spark)
      .foreach(k => centroidCache.remove(k).foreach(_.unpersist()))

  private def cachedCentroids(spark: SparkSession, sfDir: String,
      k: Int, lloydIters: Int): DataFrame = {
    evictHooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            evictCentroids(spark)
            evictHooked.remove(spark); ()
          }
        })
    })
    centroidCache.getOrElseUpdate((spark, sfDir, k, lloydIters), {
      val em = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
      buildCentroids(em, k, lloydIters).cache()
    })
  }

  /** Seeded-init + Lloyd-refined centroids for any (vec_id, embedding,
    * nrm) frame. DETERMINISTIC end to end — hash-ranked seed vectors,
    * exact BigDecimal element means — so an index persisted from this
    * build and a fresh in-session build over the same corpus are
    * bit-identical (what lets [[graft.ann.AnnIndexService]] pin
    * persisted-serve == in-session q51). */
  private[graft] def buildCentroids(em: DataFrame, k: Int,
      lloydIters: Int): DataFrame = {
    val init = em.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
        col("nrm").as("cn"))
    (1 to lloydIters).foldLeft(init)((c, _) => lloydStep(em, c))
  }

  /** The IVF SERVE step — probe assignment → broadcast-probes join →
    * candidate join → exact cosine rescore → per-query rank — shared
    * by the in-session search (q51), the persisted index
    * ([[graft.ann.AnnIndexService.queryIndex]], which passes its
    * partition-pruned, tombstone-masked candidates), and the Scaling
    * probe: ONE implementation, so a tie-break or self-exclusion fix
    * reaches every consumer and SCALING.md can never silently measure
    * a different algorithm than the one the queries ship.
    * `queriesN`/`candidates`: (vec_id, embedding, nrm), candidates
    * additionally keyed by cent_id. */
  private[graft] def ivfServe(queriesN: DataFrame, cents: DataFrame,
      candidates: DataFrame, topK: Int, nprobe: Int): DataFrame =
    ivfServeWithProbes(queriesN,
      assign(queriesN, cents, keep = nprobe)
        .withColumnRenamed("vec_id", "query_id"),
      candidates, topK)

  /** The serve with a PRECOMPUTED probe assignment (query_id, cent_id).
    * Split out so a partition-pruning caller
    * ([[graft.ann.AnnIndexService.queryIndex]]) can compute the
    * assignment ONCE and use the very same probe set for both its
    * `cent_id` pushdown filter and this join — rather than running
    * `assign` twice and relying (implicitly) on its deterministic
    * tie-break to keep the two sets equal. */
  private[graft] def ivfServeWithProbes(queriesN: DataFrame,
      probes: DataFrame, candidates: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = queriesN
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .join(broadcast(probes), Seq("query_id"))
      .join(candidates, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("cand_id"), col("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private[functions] def knnIvf(spark: SparkSession, sfDir: String,
      k: Int, nprobe: Int, lloydIters: Int): DataFrame = {
    val em = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
    val cents = cachedCentroids(spark, sfDir, k, lloydIters)
    val clustered = assignWithVec(em, cents)
    ivfServe(em.filter(col("vec_id") < 5), cents, clustered,
      topK = 5, nprobe = nprobe)
  }

  // --------------------------------------------------------------- q164
  /** One-time persisted-index build for q164, keyed per (session,
    * sfDir) — the q58 setup discipline: the index is built ONCE through
    * [[graft.ann.AnnIndexService.createIndex]] into a temp storage
    * root, so the graded query times the persisted SERVE (probe →
    * partition-pruned segment scan → exact rescore), not the build. */
  private val annSetup = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.ann.AnnIndexService]
  private def annService(spark: SparkSession,
      sfDir: String): graft.ann.AnnIndexService =
    annSetup.getOrElseUpdate((spark, sfDir), {
      val dir = java.nio.file.Files.createTempDirectory("graft_ann").toString
      val svc = new graft.ann.AnnIndexService(spark, dir)
      svc.createIndex("ann_demo",
        Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
        k = 16, lloydIters = 2)
      svc
    })

  def ensureAnnIndexSetup(spark: SparkSession, sfDir: String): Unit = {
    annService(spark, sfDir)
    annDelService(spark, sfDir)
    annTtService(spark, sfDir)
    ()
  }

  /** PERSISTED-index ANN serve on the graded surface: q51's IVF search
    * answered from the on-disk index (clustered segments partitioned by
    * cent_id + persisted centroids) instead of the session-local
    * centroid cache. The build is deterministic end to end, so this
    * equals q51's in-session result row for row — pinned in
    * AnnIndexSpec (restart-reload == in-session build ==this serve);
    * rows-only here because cluster membership is float-k-means
    * dependent (the q51/q115 justification). */
  def q164AnnIndexServe(spark: SparkSession, sfDir: String): DataFrame =
    annService(spark, sfDir).queryIndex("ann_demo",
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding")),
      topK = 5, nprobe = 5)

  // --------------------------------------------------------------- q191
  /** RECALL-TARGETED PROBE-WIDTH TUNING on the graded surface
    * ([[graft.ann.AnnIndexService.tuneNprobe]]): choose the smallest
    * `nprobe` meeting a 0.95 recall target over the q164 persisted
    * index, measured on a fixed 10-query sample. Ground truth is the
    * index's OWN exhaustive probe — nprobe = k turns the IVF serve
    * into an exact top-k over the (tombstone-masked) corpus, the same
    * argument that gives q178 its full oracle — so tuning needs no
    * external brute-force twin and prices at |sample|-sized serves per
    * candidate width (≤ k of them). At 100 TB this is how the
    * probed-cluster-volume vs recall trade gets set from evidence
    * instead of guessed, re-run cheaply after each compaction or drift
    * in the insert stream. One row: (nprobe, recall, target,
    * sample_n). Rows-only: the chosen width depends on float-k-means
    * cluster membership (the q164/q51 justification); AnnIndexSpec
    * pins minimality + target satisfaction on the same service path. */
  def q191AnnTuneNprobe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (np, recall) = annService(spark, sfDir)
      .tuneNprobe("ann_demo", sample, topK = 5, targetRecall = 0.95)
    Seq((np.toLong, recall, 0.95, 10L))
      .toDF("nprobe", "recall", "target", "sample_n")
  }

  // --------------------------------------------------------------- q178
  /** DELETE-CAPABLE persisted ANN serve, with a FULL oracle: a second
    * index over the embeddings corpus has a slice (vec_id ≡ 3 mod 7)
    * tombstoned through [[graft.ann.AnnIndexService.deleteVectors]] —
    * the per-version (vec_id, up_to_seg) sidecar, applied at load as
    * one broadcast anti-join against immutable segments, delete cost
    * ∝ |deletes| at any index size. The serve probes EVERY cluster
    * (nprobe = k), which turns the IVF path into an exact top-k over
    * the surviving corpus — so unlike q164 (cluster-membership
    * dependent, rows-only) this query carries a DuckDB twin: the q40
    * brute-force cosine with the deleted slice filtered out. Hash
    * equality proves the tombstone mask EXACT — deleted vectors
    * unfindable, surviving ranks identical to never having indexed
    * them — through the full persisted path (segment scan + sidecar
    * anti-join + rescore), not a special-cased serve. */
  private val annDelSetup = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.ann.AnnIndexService]
  private def annDelService(spark: SparkSession,
      sfDir: String): graft.ann.AnnIndexService =
    annDelSetup.getOrElseUpdate((spark, sfDir), {
      val svc = annService(spark, sfDir)
      svc.createIndex("ann_del_demo",
        Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
        k = 16, lloydIters = 2)
      svc.deleteVectors("ann_del_demo",
        Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      svc
    })

  def q178AnnDeleteServe(spark: SparkSession, sfDir: String): DataFrame =
    annDelService(spark, sfDir).queryIndex("ann_del_demo",
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding")),
      topK = 5, nprobe = 16)

  // --------------------------------------------------------------- q193
  /** ANN INDEX TIME TRAVEL with a FULL oracle: a third index built in
    * three published versions — v0 = two-thirds of the corpus
    * (vec_id % 3 ≠ 0), v1 = + the remaining third (one append-only
    * segment fold), v2 = − the (vec_id % 7 ≡ 3) slice (tombstone
    * sidecar) — retained with `retainAnnVersions = 4` and EVERY version
    * served through [[graft.ann.AnnIndexService.queryIndexAsOf]] with
    * nprobe = k. Exhaustive probing makes each as-of serve an exact
    * top-k over that version's corpus (the q178 argument), so the
    * DuckDB twin recomputes three brute-force cosine top-ks with the
    * matching corpus filters and one hash compare proves the whole
    * time-travel story: later folds invisible, later deletes alive
    * again, each retained version byte-equal to what queryIndex served
    * while it was head. Versions are metadata (segment lists +
    * delta-sized sidecars over immutable shared segments), so the
    * window costs retain × |manifest|, never retain × |corpus|. */
  private val annTtSetup = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.ann.AnnIndexService]
  private def annTtService(spark: SparkSession,
      sfDir: String): graft.ann.AnnIndexService =
    annTtSetup.getOrElseUpdate((spark, sfDir), {
      val dir = java.nio.file.Files.createTempDirectory("graft_ann_tt").toString
      val svc = new graft.ann.AnnIndexService(spark, dir,
        retainAnnVersions = 4)
      val em = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      svc.createIndex("ann_tt_demo", em.filter(col("vec_id") % 3 =!= 0),
        k = 16, lloydIters = 2)                                     // v0
      svc.upsertVectors("ann_tt_demo",
        em.filter(col("vec_id") % 3 === 0))                         // v1
      svc.deleteVectors("ann_tt_demo",
        em.filter(col("vec_id") % 7 === 3).select(col("vec_id")))   // v2
      svc
    })

  def q193AnnTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val svc = annTtService(spark, sfDir)
    val versions = svc.listIndexVersions("ann_tt_demo")
    require(versions == Seq(0, 1, 2),
      s"expected the full retained window 0..2, got $versions")
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    versions.map { v =>
      svc.queryIndexAsOf("ann_tt_demo", q, v, topK = 5, nprobe = 16)
        .select(lit(v.toLong).as("version"), col("query_id"),
          col("cand_id"), col("cos"), col("rank"))
    }.reduce(_.unionByName(_))
      .orderBy(col("version"), col("query_id"), col("rank"))
  }

  /** Deterministic hyperplanes in [-0.5, 0.5) from splitmix64 — public
    * constant-based mixer, reproducible across runs and engines. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map(p =>
      (0 until dim).map { i =>
        val h = splitmix64(p.toLong * 10007L + i)
        (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
      })
  }

  // ---------------------------------------------------------------- q83
  /** Int8 scalar quantization of the embedding column — the storage/
    * bandwidth path for ANN at 100 TB (4 bytes/dim → 1): per-dimension
    * min/max over the corpus, each float mapped to its 256-bin code,
    * reconstruction error reported per vector.
    *
    * Scale shape: pass 1 is posexplode → groupBy(dim) with map-side
    * partials, so the shuffle is |dims| × partitions rows — independent
    * of corpus size; the 64-row stats table is collapsed to ONE row
    * (sorted struct array) and broadcast; pass 2 is map-only encode.
    * All arithmetic is double on exactly-representable float32 inputs
    * and the per-vector folds are index-ordered, so outputs are
    * bit-identical cross-engine (code sums are exact BIGINTs). */
  def q83VecQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val em = Tables.embeddings(spark, sfDir)
    val dims = em
      .select(posexplode(col("embedding")).as(Seq("i0", "f")))
      .select((col("i0") + 1).as("i"), col("f").cast("double").as("v"))
      .groupBy(col("i"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .agg(sort_array(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("dims"))
    em.crossJoin(broadcast(dims))
      .withColumn("codes", expr("""
        transform(sequence(1, size(embedding)), i ->
          CASE WHEN element_at(dims, i).mx > element_at(dims, i).mn THEN
            CAST(least(floor(
              (CAST(element_at(embedding, i) AS DOUBLE) - element_at(dims, i).mn)
              / (element_at(dims, i).mx - element_at(dims, i).mn) * 256), 255)
              AS BIGINT)
          ELSE CAST(0 AS BIGINT) END)"""))
      .withColumn("errs", expr("""
        transform(sequence(1, size(embedding)), i ->
          CASE WHEN element_at(dims, i).mx > element_at(dims, i).mn THEN
            abs(CAST(element_at(embedding, i) AS DOUBLE)
              - (element_at(dims, i).mn
                 + (CAST(element_at(codes, i) AS DOUBLE) + 0.5) / 256
                   * (element_at(dims, i).mx - element_at(dims, i).mn)))
          ELSE CAST(0 AS DOUBLE) END)"""))
      .select(col("vec_id"),
        col("label").cast("long").as("label"),
        size(col("embedding")).cast("long").as("n_dims"),
        expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)")
          .as("code_sum"),
        expr("array_min(codes)").as("code_min"),
        expr("array_max(codes)").as("code_max"),
        expr("array_max(errs)").as("max_abs_err"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------- q115
  /** SemDeDup-style SEMANTIC deduplication (cluster-then-prune, after
    * Abbas et al. 2023): coarse k-means clusters bound the candidate
    * space, then each cluster is pruned of vectors that have an
    * earlier-id partner at cosine ≥ τ — one survivor per semantic
    * ε-ball instead of reporting raw pairs (q39/q67's job).
    *
    * Scale shape: clustering is the q51 IVF path (broadcast centroids,
    * one corpus shuffle per Lloyd iteration); the pairwise prune is an
    * EQUI-join on cluster id, so comparisons are Σ|cluster|² — at
    * 100 TB K grows with the corpus to keep clusters bounded, and the
    * occupancy cap (the q36/q37/q67 discipline) degrades a runaway
    * cluster to "kept" instead of detonating the join. The dup flag
    * rides a min-struct aggregate (earliest partner + its cosine), one
    * shuffle of pair rows. Rows-only: cluster membership is
    * float-k-means-dependent; validity (every dropped vector's partner
    * really is ≥ τ) and determinism are test-pinned. */
  def q115SemanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    semanticDedup(spark, sfDir, k = 16, lloydIters = 2, tau = 0.5)

  private[functions] def semanticDedup(spark: SparkSession, sfDir: String,
      k: Int, lloydIters: Int, tau: Double): DataFrame =
    semanticDedupFrame(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      k, lloydIters, tau,
      cents = Some(cachedCentroids(spark, sfDir, k, lloydIters)))

  /** Frame form of q115 (any (vec_id, embedding) input — also the
    * scale-probe entry point). `cents` lets the sfDir path reuse the
    * shared centroid cache; None recomputes from the input. */
  private[functions] def semanticDedupFrame(input: DataFrame,
      k: Int, lloydIters: Int, tau: Double,
      cents: Option[DataFrame] = None): DataFrame = {
    val em = input
      .select(col("vec_id"), col("embedding"), normExpr("embedding").as("nrm"))
    val cent = cents.getOrElse {
      val init = em.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      (1 to lloydIters).foldLeft(init)((c, _) => lloydStep(em, c))
    }
    val clustered = assignWithVec(em, cent)
    val occ = clustered.groupBy(col("cent_id")).agg(count(lit(1)).as("_occ"))
    val capped = clustered.join(broadcast(occ), Seq("cent_id"))
      .filter(col("_occ") <= Dedup.MaxBucket).drop("_occ")
    // SALTED prune join (round 18, guide §2.5): the pairwise stage's
    // only join key is the cluster id — ≤ k distinct values — so on a
    // box with more cores than clusters the dot-product stage ran at
    // ≤ k-way parallelism. Salting the a-side deterministically
    // (vec_id mod r) and exploding the b-side r ways keeps the pair
    // set IDENTICAL (each (a, b) lands in exactly a's salt bucket)
    // while the join fans out k × r ways. r is derived from the
    // session's parallelism, NOT a constant: at corpus scale k itself
    // grows past the core count and r collapses to 1 (a no-op salt).
    val r = math.max(1, 2 * input.sparkSession.sparkContext
      .defaultParallelism / math.max(k, 1))
    val aSide = capped
      .withColumn("__salt", pmod(col("vec_id"), lit(r.toLong)))
    val bSide = capped.withColumn("__salt", explode(expr(
      s"transform(sequence(0, ${r - 1}), x -> CAST(x AS BIGINT))")))
    val dups = aSide.as("a").join(bSide.as("b"),
        col("a.cent_id") === col("b.cent_id")
          && col("a.__salt") === col("b.__salt")
          && col("b.vec_id") < col("a.vec_id"))
      .withColumn("cos",
        VectorExpressions.floatVecDot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(struct(col("b.vec_id").as("u"), col("cos").as("c"))).as("m"))
      .select(col("vec_id"), col("m.u").as("dup_of"), col("m.c").as("dup_cos"))
    clustered.select(col("vec_id"), col("cent_id"))
      .join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cent_id"),
        col("dup_of").isNull.as("kept"), col("dup_of"), col("dup_cos"))
      .orderBy(col("vec_id"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q40_knn_brute" -> q40KnnBrute,
    "q41_knn_lsh" -> q41KnnLsh,
    "q51_knn_ivf" -> q51KnnIvf,
    "q83_vec_quantize" -> q83VecQuantize,
    "q115_semantic_dedup" -> q115SemanticDedup,
    "q164_ann_index_serve" -> q164AnnIndexServe,
    "q178_ann_delete_serve" -> q178AnnDeleteServe,
    "q191_ann_tune_nprobe" -> q191AnnTuneNprobe,
    "q193_ann_time_travel" -> q193AnnTimeTravel,
  )

  /** q41 is approximate by construction ⇒ rows-only. */
  lazy val sql: Map[String, String] = Map(
    "q40_knn_brute" -> """
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
            (x, y) -> x + y)) AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(q.embedding)),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
            (x, y) -> x + y) / (q.nrm * c.nrm) AS cos
        FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
      SELECT query_id, cand_id, cos, rank FROM (
        SELECT query_id, cand_id, cos,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, cand_id) AS rank
        FROM scored) t
      WHERE rank <= 5
      ORDER BY query_id, rank""",
    "q178_ann_delete_serve" -> """
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
            (x, y) -> x + y)) AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(q.embedding)),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
            (x, y) -> x + y) / (q.nrm * c.nrm) AS cos
        FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
          AND c.vec_id % 7 <> 3)
      SELECT query_id, cand_id, cos, rank FROM (
        SELECT query_id, cand_id, cos,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, cand_id) AS rank
        FROM scored) t
      WHERE rank <= 5
      ORDER BY query_id, rank""",
    // Three brute-force top-ks with the per-version corpus filters
    // (v0: two-thirds slice; v1: everything; v2: minus the deleted
    // slice) — exhaustive probing makes each as-of serve exact, so one
    // hash compare pins the whole retained history.
    "q193_ann_time_travel" -> """
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
            (x, y) -> x + y)) AS nrm
        FROM embeddings),
      scored AS (
        SELECT v.version, q.vec_id AS query_id, c.vec_id AS cand_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(q.embedding)),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
            (x, y) -> x + y) / (q.nrm * c.nrm) AS cos
        FROM (SELECT CAST(0 AS BIGINT) AS version UNION ALL
              SELECT 1 UNION ALL SELECT 2) v
        JOIN e q ON q.vec_id < 5
        JOIN e c ON c.vec_id <> q.vec_id
          AND ((v.version = 0 AND c.vec_id % 3 <> 0)
            OR (v.version = 1)
            OR (v.version = 2 AND c.vec_id % 7 <> 3)))
      SELECT version, query_id, cand_id, cos, rank FROM (
        SELECT version, query_id, cand_id, cos,
          row_number() OVER (PARTITION BY version, query_id
                             ORDER BY cos DESC, cand_id) AS rank
        FROM scored) t
      WHERE rank <= 5
      ORDER BY version, query_id, rank""",
    "q83_vec_quantize" -> """
      WITH x AS (
        SELECT vec_id, label, len(embedding) AS nd,
          unnest(generate_series(1, len(embedding))) AS i,
          CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      s AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
      c AS (
        SELECT x.vec_id, x.label, x.nd,
          CASE WHEN s.mx > s.mn THEN
            CAST(least(floor((x.v - s.mn) / (s.mx - s.mn) * 256), 255)
              AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS code,
          CASE WHEN s.mx > s.mn THEN
            abs(x.v - (s.mn +
              (CAST(CAST(least(floor((x.v - s.mn) / (s.mx - s.mn) * 256), 255)
                AS BIGINT) AS DOUBLE) + 0.5) / 256 * (s.mx - s.mn)))
          ELSE 0.0 END AS err
        FROM x JOIN s USING (i))
      SELECT vec_id, CAST(any_value(label) AS BIGINT) AS label,
        CAST(any_value(nd) AS BIGINT) AS n_dims,
        CAST(sum(code) AS BIGINT) AS code_sum,
        CAST(min(code) AS BIGINT) AS code_min,
        CAST(max(code) AS BIGINT) AS code_max,
        max(err) AS max_abs_err
      FROM c
      GROUP BY vec_id
      ORDER BY vec_id""",
  )
}
