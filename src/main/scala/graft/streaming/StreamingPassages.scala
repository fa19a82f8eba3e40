package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming REPEATED-PASSAGE index: incrementally maintain the global
  * passage-frequency table as documents stream in, so the cleaned-
  * corpus view (batch q148) is always serveable without re-counting
  * passages over the accumulated corpus.
  *
  * Why counts and not decisions: a passage's hotness is a GLOBAL
  * property — a passage unique today becomes boilerplate when its twin
  * arrives in a later batch, which must retroactively remove it from
  * the earlier document too. So the fold persists per-batch count
  * PARTIALS (count is associative — the merge is exact, not
  * approximate) and the cleaning decision lives in the read-side view,
  * the same late-binding discipline as [[StreamingSurvivors]]' label
  * propagation. A decide-at-arrival variant would freeze wrong
  * decisions; republishing the whole cleaned corpus per batch would be
  * write-amplified by |corpus| — the count index is the only state
  * whose maintenance cost is batch-sized.
  *
  * Per micro-batch (`foreachBatch`, replay-safe via batch-partition
  * OVERWRITE writes — the StreamingDedup discipline): the batch's
  * passage counts (one map-side-combined aggregate over
  * [[TextAnalysis.passageRows]], output bounded by batch volume) land
  * in `countsDir/batch=<id>`. A replayed batch overwrites its own
  * partition, so no count is ever doubled.
  *
  * Read-side view [[cleaned]]: hot = Σ per-batch partials ≥ 2, applied
  * through the SAME [[TextAnalysis.removePassages]] the batch query
  * uses — stream == batch is a plan-level equivalence over shared
  * code, pinned by StreamingSpec on a replayed corpus. At 100 TB the
  * per-batch cost is one aggregate over the batch; the view's hot-set
  * merge is ∝ |distinct passages| count partials (at scale: keyed on
  * xxhash64(passage), partitioned on the hash — the q148 doc-comment's
  * discipline), and only consumers pay it, on read. */
object StreamingPassages {
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      countsDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, countsDir); ()
      }
      .start()
  }

  /** One micro-batch fold — also the unit-testable core. */
  private[streaming] def foldBatch(
      batch: DataFrame, batchId: Long, countsDir: String): Unit = {
    TextAnalysis.passageRows(batch)
      .groupBy(col("passage")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
    ()
  }

  /** Cleaned-corpus view over the accumulated count partials —
    * identical cleaning/reassembly code to batch q148. */
  def cleaned(spark: SparkSession, countsDir: String,
      docs: DataFrame): DataFrame = {
    val hot = spark.read.parquet(countsDir)
      .groupBy(col("passage")).agg(sum(col("n")).as("n"))
      .filter(col("n") >= 2)
      .select(col("passage"))
    TextAnalysis.removePassages(docs, hot)
  }
}
