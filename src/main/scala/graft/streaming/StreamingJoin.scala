package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Stream-stream interval joins — the streaming twin of the batch
  * attribution shapes (q124's click→purchase lookup): two unbounded
  * event streams joined per user within a bounded event-time window.
  *
  * Why the shape matters at scale: an unbounded stream-stream join
  * without time bounds needs UNBOUNDED state on both sides. The
  * event-time range condition + watermarks make the state finite by
  * construction — Spark derives, from `p_ts BETWEEN c_ts AND c_ts + L`
  * plus each side's watermark, exactly how long a click must be
  * retained (L past its event time, plus the delay) and evicts older
  * state. State size is then ∝ (event rate × (L + delay)) per
  * executor after the user_id hash shuffle, independent of stream
  * lifetime — the only formulation that survives a week-long run at
  * 100 TB/day. Both sides shuffle once on the equality key (user),
  * exactly like the batch join.
  *
  * Inner form: matches emit as soon as both rows have arrived (no
  * watermark hold-back); the watermark only bounds state. Left-outer
  * form: unmatched clicks must out-wait the join window — a null match
  * can only be decided once the watermark proves no purchase can still
  * arrive — so null rows surface with watermark latency. Both pinned
  * stream == batch in StreamingSpec.
  */
object StreamingJoin {
  /** Inner interval join: purchases attributed to a prior click by the
    * same user within `window` (event time). Append-mode memory sink. */
  def startIntervalJoin(
      spark: SparkSession,
      clickDir: String,
      purchaseDir: String,
      schema: StructType,
      delay: String,
      window: String,
      checkpointDir: String,
      name: String,
      joinType: String = "inner"): StreamingQuery = {
    val clicks = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(clickDir)
      .withWatermark("ts", delay)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val purchases = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(purchaseDir)
      .withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    clicks.join(purchases,
        col("c_user") === col("p_user")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr(s"INTERVAL $window"),
        joinType)
      .select(col("c_user"), col("c_ts"), col("p_ts"), col("p_value"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** The batch equivalent the streaming result must equal — same join
    * condition over the same static frames. */
  def batchEquivalent(
      spark: SparkSession,
      clickDir: String,
      purchaseDir: String,
      window: String,
      joinType: String = "inner") = {
    val clicks = spark.read.parquet(clickDir)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val purchases = spark.read.parquet(purchaseDir)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    clicks.join(purchases,
        col("c_user") === col("p_user")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr(s"INTERVAL $window"),
        joinType)
      .select(col("c_user"), col("c_ts"), col("p_ts"), col("p_value"))
  }
}
