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

  /** One-time storage-layout/materialization setup shared by several
    * declared queries (q143/q144's bucketed fact tables, q58/q140's
    * materialized routing cubes). Bench invokes this BEFORE timing so
    * per-query numbers measure query work, not the amortized one-time
    * writes; every query still performs its own setup lazily when this
    * was never called (Verify and ad-hoc use need no ceremony). */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    operators.RelationalQueries.ensureBucketedLayout(spark, sfDir)
    cube.CubeQueries.ensureRoutingSetup(spark, sfDir)
    functions.Similarity.ensureAnnIndexSetup(spark, sfDir)
    functions.Sampling.ensureCompactFixture(spark, sfDir)
    ()
  }

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
      functions.ZOrder.sql ++ functions.CountMinSketch.sql ++
      functions.BloomFilter.sql
}
