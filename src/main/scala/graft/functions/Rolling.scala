package graft.functions

import org.apache.spark.sql.{DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** The shared core of the rolling-window-over-daily-partials family
  * (q138 exact re-count, q139 HLL distinct, q141 KLL quantiles, and the
  * stream-maintained twin pinned in StreamingSpec): a value observed on
  * day d contributes to the rolling endpoints [d, d+len-1], so each
  * per-day partial row is EXPLODED to those endpoints and re-grouped.
  * Endpoints are restricted to observed days via a semi-join against
  * the day dimension — tiny at any scale, hence broadcast: the ×len
  * fan-out runs map-side and the only shuffle is the final per-endpoint
  * aggregation.
  */
object Rolling {
  /** Explode each daily row to its rolling endpoints and group by the
    * endpoint. `daily` must carry an epoch-day LongType column `d` (and
    * no column named `day`); every other column rides along to the
    * caller's aggregate (re-count, sketch union, ...). */
  def endpoints(daily: DataFrame, len: Int = 7): RelationalGroupedDataset = {
    // len=0 would make sequence(d, d-1) a DESCENDING 2-element array —
    // a silently wrong curve, not an empty one
    require(len >= 1, s"rolling window length must be >= 1, got $len")
    val days = daily.select(col("d").as("day")).distinct()
    daily
      .withColumn("day", explode(expr(s"sequence(d, d + ${len - 1})")))
      .drop("d")
      .join(broadcast(days), Seq("day"), "left_semi")
      .groupBy(col("day"))
  }
}
