package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming NEAR-duplicate dedup: documents arriving on a stream are
  * dropped when they are MinHash/LSH near-duplicates of any previously
  * RETAINED document (exact streaming dedup is
  * `dropDuplicatesWithinWatermark`, StreamingCube; this is its fuzzy
  * sibling — the missing piece of an online training-data intake
  * pipeline).
  *
  * Design: the dedup state is an INVERTED INDEX of the retained corpus's
  * LSH band keys — (band, bandHash) rows in a persistent table — not
  * per-key executor state: near-dup lookups are cross-key (a doc probes
  * 8 buckets at once), which `mapGroupsWithState` cannot express, and
  * the index for a 100 TB corpus belongs in storage, not on the heap.
  * Each micro-batch (`foreachBatch` — at-least-once replay, made
  * effectively-once by BATCH-SCOPED IDEMPOTENT writes, see below):
  *   1. band keys per incoming doc — the per-row `minHashSigsRowwise`
  *      expressions, zero shuffle;
  *   2. history hits: left-semi join against the index (at scale:
  *      bucketed/partitioned on bandHash so the probe is pruned);
  *   3. within-batch: a doc also dups against a smaller-doc_id batch
  *      doc sharing a bucket (micro-batch arrivals are simultaneous;
  *      doc_id is the deterministic tie-break);
  *   4. survivors land in the sink AND their keys in the index —
  *      dropped docs contribute no keys (their surviving near-dup
  *      representative already covers their neighborhood).
  *
  * Replay safety: `foreachBatch` alone is at-least-once — a crash after
  * the writes but before the checkpoint commit replays the batch, and a
  * blind `append` would duplicate survivor rows and index keys (and
  * duplicated index keys silently change later dedup decisions). Both
  * writes therefore go to a `batch=<id>` subdirectory in OVERWRITE
  * mode: a replay of batch N rewrites exactly its own partition, so the
  * net state after any number of replays equals the once-only state.
  * The history probe excludes the current batch's own partition, so a
  * replayed batch never sees its previous attempt's keys as "history"
  * (which would drop every doc and publish an empty partition).
  * Readers see `batch` as an ordinary discovered partition column.
  *
  * Semantics pinned by StreamingSpec: within-batch dups, cross-batch
  * dups, and non-dups each behave per the greedy-by-doc_id rule.
  */
object StreamingDedup {
  /** Existence probe through the Hadoop FileSystem API — a
    * `java.io.File` check is always false for non-local URIs
    * (hdfs://, s3a://), which would silently make every batch see an
    * empty history index on exactly the storage the scaladoc's 100 TB
    * framing implies. */
  private[streaming] def pathExists(
      spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, batchId, indexDir, outDir); ()
      }
      .start()
  }

  /** One micro-batch fold — also the unit-testable core. */
  private[streaming] def dedupBatch(
      batch: DataFrame, batchId: Long, indexDir: String,
      outDir: String): Unit = {
    val spark = batch.sparkSession
    val keys = Dedup.bandedOf(Dedup.minHashSigsRowwise(batch)).cache()
    val histDup =
      if (pathExists(spark, indexDir))
        keys.join(
            spark.read.parquet(indexDir)
              .filter(col("batch") =!= batchId) // replay: own keys ≠ history
              .select(col("band"), col("bh")),
            Seq("band", "bh"), "left_semi")
          .select(col("doc_id"))
      else keys.select(col("doc_id")).limit(0)
    val firstPerBucket = keys.groupBy(col("band"), col("bh"))
      .agg(min(col("doc_id")).as("first_id"))
    val batchDup = keys.join(firstPerBucket, Seq("band", "bh"))
      .filter(col("doc_id") > col("first_id"))
      .select(col("doc_id"))
    val dupIds = histDup.unionByName(batchDup).distinct()
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    survivors.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    keys.join(dupIds, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    keys.unpersist()
    ()
  }
}
