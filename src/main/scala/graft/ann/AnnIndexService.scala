package graft.ann

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.functions.Similarity

/** A loaded persisted IVF index: the refined centroids (K rows) and the
  * clustered vector corpus (union of the index's append-only segments,
  * each parquet partitioned by `cent_id`). */
final case class AnnIndex(name: String, k: Int, lloydIters: Int,
    centroids: DataFrame, vectors: DataFrame)

/** Persisted IVF ANN index lifecycle — create / load / query / upsert /
  * streaming maintenance — through the same durable-publish discipline
  * as the cube service ([[graft.cube.CubeService]]): a real pipeline
  * builds the index ONCE and serves many query batches across
  * restarts, where the session-local centroid cache behind q51 dies
  * with the JVM.
  *
  * Storage layout under `storageDir`:
  * {{{
  * <name>.ann/MANIFEST      one line: current version number
  * <name>.ann/v<j>/centroids/   K-row parquet (cent_id, ce, cn)
  * <name>.ann/v<j>/segments     text: one live segment name per line
  * <name>.ann/v<j>/meta         "k=…\nlloydIters=…"
  * <name>.ann/v<j>/batch_id     replay guard (streaming upserts)
  * <name>.ann/v<j>/stream_id    stream identity the batch_id belongs to
  * <name>.ann/seg<j>/           vector parquet PARTITIONED BY cent_id
  * }}}
  *
  * Scale design, deliberately log-structured:
  * - Segments are APPEND-ONLY: an upsert assigns the new vectors to
  *   their nearest PERSISTED centroid (one broadcast of K rows, map-only
  *   scoring) and writes one new segment — the existing corpus is never
  *   rewritten, so maintenance cost is ∝ |delta| at any index size.
  *   Versions are metadata: a new `segments` list + MANIFEST swap (the
  *   versioned-manifest pattern; centroids are K rows and are rewritten
  *   per version for self-containment — negligible against segments).
  * - Each segment is parquet `partitionBy("cent_id")` — the ON-DISK
  *   inverted file. A query batch probes nprobe clusters per query, the
  *   probed cluster ids are collected (bounded by |queries| × nprobe by
  *   construction — the query batch is the SMALL side) and pushed as a
  *   literal `IN` filter, so the scan reads ONLY the probed cluster
  *   directories: query cost ∝ probed-cluster volume, not corpus size,
  *   straight from disk with no shuffle of the big side.
  * - Deletes are REFUSED (an insert-only index): a tombstone would have
  *   to mask a row inside an immutable segment. The honest upgrade path
  *   at scale is a delete-bitmap sidecar per segment, not silent row
  *   loss — until then the refusal is loud.
  *
  * Streaming maintenance composes the change-stream seam
  * ([[graft.sources.MongoChangeStream]] wire format): each micro-batch
  * decodes to vectors, is assigned against the persisted centroids, and
  * publishes one segment + version. Exactly-once follows the join-MV
  * discipline: each version records the micro-batch id it folded plus
  * the stream identity (canonical changeDir) the id belongs to;
  * replayed ids from the same stream are skipped, a CHANGED identity
  * refuses to start unless explicitly re-homed (batch ids are
  * checkpoint-relative — resuming the guard against a new stream would
  * silently swallow its first batches). */
class AnnIndexService(spark: SparkSession, storageDir: String) {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storageDir))

  private val live = TrieMap.empty[String, AnnIndex]
  private val autoUpdates = TrieMap.empty[String, StreamingQuery]

  private def root(name: String) =
    java.nio.file.Paths.get(storageDir, s"$name.ann")

  private def version(name: String): Int = {
    val m = root(name).resolve("MANIFEST")
    if (m.toFile.exists()) java.nio.file.Files.readString(m).trim.toInt
    else -1
  }

  private def vdir(name: String, v: Int) = root(name).resolve(s"v$v")

  private def lastBatch(name: String): Long = {
    val v = version(name)
    if (v < 0) -1L
    else {
      val f = vdir(name, v).resolve("batch_id")
      if (f.toFile.exists()) java.nio.file.Files.readString(f).trim.toLong
      else -1L
    }
  }

  private def streamId(name: String): Option[String] = {
    val v = version(name)
    if (v < 0) None
    else {
      val f = vdir(name, v).resolve("stream_id")
      if (f.toFile.exists())
        Some(java.nio.file.Files.readString(f).trim)
      else None
    }
  }

  private def segmentsOf(name: String, v: Int): Seq[String] =
    java.nio.file.Files.readString(vdir(name, v).resolve("segments"))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  private def metaOf(name: String, v: Int): (Int, Int) = {
    val m = java.nio.file.Files.readString(vdir(name, v).resolve("meta"))
      .linesIterator.map(_.split('=')).map(a => a(0) -> a(1).toInt).toMap
    (m("k"), m("lloydIters"))
  }

  /** Normalize a (vec_id, embedding) frame to the internal
    * (vec_id, embedding, nrm) shape. */
  private def withNorm(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"), col("embedding"),
      Similarity.normExpr("embedding").as("nrm"))

  /** Publish the next version: segment data must already be on disk;
    * this writes the version dir (centroids + segment list + replay
    * metadata) and atomically swaps MANIFEST. Superseded version dirs
    * are cleaned DEFERRED BY ONE (the join-MV discipline — readers that
    * predate this publish still list the previous version's centroid
    * files). Segment directories unreferenced by BOTH retained versions
    * are GC'd here too — append-only folds never create those (every
    * old segment stays referenced), only [[compactIndex]] does, and its
    * superseded segments become collectible exactly one publish later,
    * when no retained version can still list them. */
  private def publish(name: String, v: Int, cents: DataFrame,
      segments: Seq[String], k: Int, lloydIters: Int,
      batchId: Option[Long], sid: Option[String]): AnnIndex = {
    val lb = batchId.getOrElse(lastBatch(name))
    val s = sid.orElse(streamId(name))
    val dir = vdir(name, v)
    java.nio.file.Files.createDirectories(dir)
    cents.write.mode("overwrite").parquet(dir.resolve("centroids").toString)
    java.nio.file.Files.writeString(dir.resolve("segments"),
      segments.mkString("\n"))
    java.nio.file.Files.writeString(dir.resolve("meta"),
      s"k=$k\nlloydIters=$lloydIters")
    java.nio.file.Files.writeString(dir.resolve("batch_id"), lb.toString)
    s.foreach(x =>
      java.nio.file.Files.writeString(dir.resolve("stream_id"), x))
    val tmp = root(name).resolve("MANIFEST.tmp")
    java.nio.file.Files.writeString(tmp, v.toString)
    java.nio.file.Files.move(tmp, root(name).resolve("MANIFEST"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(root(name).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("v") && f.isDirectory
        && f.getName != s"v$v" && f.getName != s"v${v - 1}")
      .foreach(rm)
    val referenced = Seq(v, v - 1)
      .filter(x => x >= 0 && vdir(name, x).resolve("segments").toFile.exists())
      .flatMap(x => segmentsOf(name, x)).toSet
    Option(root(name).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg")
        && !referenced.contains(f.getName))
      .foreach(rm)
    val loaded = load(name)
    live.put(name, loaded)
    loaded
  }

  /** Build and persist version 0: seeded deterministic k-means over the
    * corpus (the q51 build, [[Similarity.buildCentroids]]), every
    * vector assigned to its nearest centroid, written as the first
    * segment partitioned by cluster. `vectors`: (vec_id, embedding). */
  def createIndex(name: String, vectors: DataFrame, k: Int = 16,
      lloydIters: Int = 2): AnnIndex = {
    require(version(name) < 0,
      s"ANN index '$name' already exists under $storageDir")
    val em = withNorm(vectors)
    val cents = Similarity.buildCentroids(em, k, lloydIters)
    val seg = "seg0"
    Similarity.assignWithVec(em, cents)
      .write.partitionBy("cent_id")
      .parquet(root(name).resolve(seg).toString)
    publish(name, 0, cents, Seq(seg), k, lloydIters, None, None)
  }

  private def load(name: String): AnnIndex = {
    val v = version(name)
    require(v >= 0, s"ANN index '$name' does not exist under $storageDir")
    val (k, iters) = metaOf(name, v)
    val cents = spark.read.parquet(vdir(name, v).resolve("centroids").toString)
    val vecs = segmentsOf(name, v)
      .map(s => spark.read.parquet(root(name).resolve(s).toString)
        // partition-column values come back as inferred ints — restore
        // the long key the probes join on
        .withColumn("cent_id", col("cent_id").cast("long")))
      .reduce(_.unionByName(_))
    AnnIndex(name, k, iters, cents, vecs)
  }

  def loadIndex(name: String): AnnIndex =
    live.getOrElseUpdate(name, load(name))

  /** Serve a query batch from the persisted index: assign each query to
    * its nprobe nearest persisted centroids (broadcast of K rows), push
    * the probed cluster ids down as a literal partition filter (the
    * probe set is ≤ |queries| × nprobe — bounded because the query
    * batch is the small side by construction), score candidates with
    * the exact codegen'd cosine, keep the top `topK` per query.
    * `queries`: (query_id, embedding). Self-matches are excluded. */
  def queryIndex(name: String, queries: DataFrame, topK: Int = 5,
      nprobe: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = loadIndex(name)
    val q = withNorm(queries.select(col("query_id").as("vec_id"),
      col("embedding")))
    val probes = Similarity.assign(q, idx.centroids, keep = nprobe)
      .withColumnRenamed("vec_id", "query_id")
    val probedIds = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val cands = idx.vectors.filter(col("cent_id").isin(probedIds: _*))
    val scored = q
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .join(broadcast(probes), Seq("query_id"))
      .join(cands, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        Similarity.dotExpr("qe", "embedding") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("cand_id"), col("cos"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fold new vectors into the index: assign against the PERSISTED
    * centroids (maintenance never re-clusters — assignments stay
    * consistent with every earlier segment), write one new segment,
    * publish the next version. `newVectors`: (vec_id, embedding). */
  def upsertVectors(name: String, newVectors: DataFrame): AnnIndex = {
    require(!autoUpdates.get(name).exists(_.isActive),
      s"stop auto-update on '$name' before a manual upsert — " +
        "concurrent manifest publishes would race")
    fold(name, newVectors, None, None)
  }

  /** The shared fold (manual verb + the stream's own foreachBatch —
    * which must NOT trip the concurrent-maintainer guard above). */
  private def fold(name: String, newVectors: DataFrame,
      batchId: Option[Long], sid: Option[String]): AnnIndex = {
    val v = version(name)
    val idx = loadIndex(name)
    val seg = s"seg${v + 1}"
    Similarity.assignWithVec(withNorm(newVectors), idx.centroids)
      .write.partitionBy("cent_id")
      .parquet(root(name).resolve(seg).toString)
    publish(name, v + 1, idx.centroids, segmentsOf(name, v) :+ seg,
      idx.k, idx.lloydIters, batchId, sid)
  }

  /** Merge every live segment into ONE new segment (still partitioned
    * by `cent_id`) and publish: the log-structured upsert path trades
    * write amplification for segment fan-out, and after many small
    * folds a query's probed-cluster scan opens |segments| × nprobe
    * directories of mostly-tiny files. Compaction restores the
    * one-segment layout at cost ∝ |corpus| — the classic LSM trade,
    * run when fan-out, not data, is the problem (same economics as the
    * table-side q145 compact-optimize). Results are unchanged by
    * construction: the same rows land in the same cent_id partitions,
    * only file layout moves. Superseded segments stay on disk until the
    * NEXT publish retires the last version referencing them (the
    * deferred-by-one GC in [[publish]]). */
  def compactIndex(name: String): AnnIndex = {
    require(!autoUpdates.get(name).exists(_.isActive),
      s"stop auto-update on '$name' before compaction — " +
        "concurrent manifest publishes would race")
    val v = version(name)
    val idx = loadIndex(name)
    if (segmentsOf(name, v).size <= 1) idx // already compact — no-op
    else {
      val seg = s"seg${v + 1}"
      // overwrite: a crashed earlier fold/compact may have left data at
      // this name without ever publishing it
      idx.vectors.write.mode("overwrite").partitionBy("cent_id")
        .parquet(root(name).resolve(seg).toString)
      publish(name, v + 1, idx.centroids, Seq(seg), idx.k, idx.lloydIters,
        None, None)
    }
  }

  /** Continuous maintenance from a directory of change-event JSON lines
    * (insert-only: any decoded delete/update pre-image refuses the
    * batch — see the class doc). `docSchema` must describe
    * (vec_id, embedding). Replay and re-home semantics follow
    * [[graft.cube.CubeService.startJoinAutoUpdate]]. */
  def startAutoUpdate(name: String, changeDir: String,
      docSchema: StructType,
      resetBatchTracking: Boolean = false): StreamingQuery = {
    require(!autoUpdates.get(name).exists(_.isActive),
      s"ANN auto-update already running on '$name' — stop it first")
    loadIndex(name) // fail fast on an unknown index
    val identity = new java.io.File(changeDir).getCanonicalPath
    val recorded = streamId(name)
    if (lastBatch(name) >= 0 && recorded.exists(_ != identity)) {
      require(resetBatchTracking,
        s"ANN index '$name' recorded batches from stream " +
          s"'${recorded.get}' but this start targets '$identity'; " +
          "batch ids are checkpoint-relative — pass " +
          "resetBatchTracking = true to re-home (keeps segments, folds " +
          "from batch 0).")
      val ckpt = new java.io.File(s"$storageDir/$name.ann.checkpoint")
      require(!ckpt.exists(),
        s"checkpoint ${ckpt.getPath} belongs to the previous stream " +
          s"'${recorded.get}' — delete it before re-homing '$name'.")
      val dir = vdir(name, version(name))
      java.nio.file.Files.writeString(dir.resolve("batch_id"), "-1")
      java.nio.file.Files.writeString(dir.resolve("stream_id"), identity)
    }
    val raw = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(changeDir)
    val q = raw.writeStream
      .option("checkpointLocation", s"$storageDir/$name.ann.checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatch(name)) {
          val delta = graft.sources.MongoChangeStream.decode(batch, docSchema)
          // loud refusal beats silent divergence: a delete or update
          // pre-image cannot be applied to immutable segments
          require(delta.filter(col("_sign") < 0).isEmpty,
            s"ANN index '$name' is insert-only; the change batch " +
              "carries deletes/updates (see AnnIndexService scaladoc)")
          fold(name, delta.drop("_sign"), Some(batchId), Some(identity))
          ()
        }
      }
      .start()
    autoUpdates.put(name, q)
    q
  }

  def stopAutoUpdate(name: String): Unit =
    autoUpdates.remove(name).foreach(_.stop())

  def listIndexes(): Seq[String] = {
    val d = new java.io.File(storageDir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.endsWith(".ann"))
      .map(_.getName.stripSuffix(".ann")).sorted
  }

  def deleteIndex(name: String): Unit = {
    stopAutoUpdate(name)
    live.remove(name)
    rm(root(name).toFile)
    rm(new java.io.File(s"$storageDir/$name.ann.checkpoint"))
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
    ()
  }
}
