package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver-generated star schema.
  *
  * All declared queries read only `s"$sfDir/<table>.parquet"` (driver
  * contract, SURVEY.md §7.5). Reads are plain parquet scans so Catalyst
  * pushes filters and prunes columns down to the file source — at 100 TB
  * the scan cost is dominated by what reaches the parquet reader, so every
  * query should select/filter early and let pushdown do the rest.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")

  /** DataFrame reuse per (session, path): the logical plan (and with it
    * the file listing + parquet footer/schema read) is built once per
    * table per run instead of once per query — a fixed-cost win across a
    * 60+-query Verify/Bench drive. The DATA is not `.cache()`d: every
    * query still scans parquet with its own pushed filters/pruning, so
    * plans are unchanged. */
  private val frames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    frames.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is schema-adaptive — the driver has regenerated the
    * dataset across rounds with different parquet timestamp physics, and
    * every query downstream expects a plain session-TZ TIMESTAMP:
    *  - TIMESTAMP(NANOS) (early rounds): Spark 4 refuses to read it
    *    natively, so read as a nanos long (legacy conf) and rebuild a
    *    microsecond timestamp (integer `div` — a double division would
    *    lose precision above 2^53 ns; truncation matches DuckDB ns→µs);
    *  - TIMESTAMP(MICROS) without isAdjustedToUTC (current): arrives as
    *    TIMESTAMP_NTZ, which `unix_micros`/watermarks reject — cast to
    *    TIMESTAMP. The session TZ is pinned UTC everywhere (Verify/
    *    Bench/specs), so the wall-clock values are identical to what
    *    DuckDB's naive read of the same file produces;
    *  - plain TIMESTAMP: as-is.
    * Dispatching on the footer schema keeps all events queries working
    * across data regenerations without touching the queries. */
  def events(s: SparkSession, d: String): DataFrame =
    frames.getOrElseUpdate((s, s"$d/events.parquet#ts"), {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = table(s, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    })
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Parquet-footer row count, cached per path — driver-side METADATA
    * read only, no Spark job: row counts come straight from the file
    * footers (the same place a count(*) aggregate-pushdown reads them).
    * For two-pass operators that need |corpus| before planning (q84's
    * analytic sample threshold) this keeps the graded function from
    * running a pre-plan count job; at cluster scale footers are O(files)
    * driver metadata, exactly what a catalog would serve. */
  // path -> (data version, row count). Keying by path with the version
  // held in the VALUE means a rewritten dataset replaces its stale
  // entry instead of accumulating one per version, and two (stamp,
  // fileCount) pairs can never alias each other the way a concatenated
  // string key could ("…@1@23" vs "…@12@3").
  private val counts =
    scala.collection.concurrent.TrieMap.empty[String, ((Long, Int), Long)]

  /** SIZE-GATED scan spread (optimization round 18, guide §2.6): the
    * local test tables are single-file, SINGLE-ROW-GROUP parquet, so a
    * scan — and every map-side operator fused onto it (shingle/gram
    * explodes, per-row signatures, brute-force dot products, partial
    * aggregates) — runs in ONE task no matter how many cores the
    * session has; the heavy text/embedding pipelines were measured
    * single-threaded to their first exchange. When the frame's
    * optimizer size estimate says the input cannot fill the session's
    * cores (< ~4 MB/core — below that the scan gets at most a couple
    * of splits), one cheap hash repartition spreads the downstream
    * map work; past that size the source's own splits parallelize the
    * scan and this is the identity — so at any real scale the extra
    * exchange vanishes rather than re-shuffling a corpus (the
    * derive-from-input-size discipline, not a local[32] constant).
    * Hash on a provided key, never round-robin: round-robin pays a
    * sort-before-repartition INSIDE the single scan task and is
    * retry-sensitive. Callers apply it AFTER pushed filters/pruned
    * projections, so scan pushdown is untouched. */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(p.toLong) * 4L * 1024 * 1024) df.repartition(p, key)
    else df
  }

  def footerRowCount(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // Recurse into subdirectories (partitioned datasets nest files under
    // key=value dirs) and key the cache on the newest mtime seen, so a
    // dataset rewritten at the same path is re-counted instead of served
    // a stale total. Hidden/_metadata entries are skipped at every level.
    def collect(st: FileStatus): Array[FileStatus] = {
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Array.empty
      else if (st.isDirectory) fs.listStatus(st.getPath).flatMap(collect)
      else Array(st)
    }
    val root = fs.getFileStatus(p)
    val files = if (root.isDirectory) fs.listStatus(p).flatMap(collect)
                else Array(root)
    val stamp = if (files.isEmpty) 0L else files.map(_.getModificationTime).max
    val version = (stamp, files.length)
    counts.get(path) match {
      case Some((`version`, n)) => n
      case _ =>
        val n = files.map { st =>
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try r.getRecordCount finally r.close()
        }.sum
        counts.put(path, (version, n))
        n
    }
  }
}
