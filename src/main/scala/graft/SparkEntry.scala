package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's declared queries;
  * `oracleSql` the matching DuckDB SQL (absent key ⇒ rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.defs ++ operators.EventQueries.defs ++
      operators.ExtensionQueries.defs ++ operators.TpchQueries.defs ++
      cube.CubeQueries.defs ++ functions.Dedup.defs ++
      functions.Similarity.defs ++ functions.TextAnalysis.defs ++
      functions.Multimodal.defs ++ functions.Sampling.defs ++
      functions.ZOrder.defs ++ functions.CountMinSketch.defs ++
      functions.BloomFilter.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.sql ++ operators.EventQueries.sql ++
      operators.ExtensionQueries.sql ++ operators.TpchQueries.sql ++
      cube.CubeQueries.sql ++ functions.Dedup.sql ++
      functions.Similarity.sql ++ functions.TextAnalysis.sql ++
      functions.Multimodal.sql ++ functions.Sampling.sql ++
      functions.ZOrder.sql ++ functions.BloomFilter.sql
}
