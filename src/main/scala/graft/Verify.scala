package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes VERIFY_SELF.json (outDir + repo root): a per-query
  * fingerprint (rows, sorted-column schema, order-independent value
  * hash) computed from the dumped parquet. BENCH_SELF.json's sibling:
  * when a driver-side artifact zeroes (the round-9 failure mode was a
  * regenerated events.parquet killing 45 queries with no committed
  * trace), the committed self-summary still shows which queries ran,
  * their cardinalities, and whether their values drifted across rounds.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query-name filter (substring
    // match) for fast local iteration. Filtered runs skip the repo-root
    // VERIFY_SELF.json copy so a partial sweep never masquerades as the
    // round's committed fingerprint.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // --- self-summary: fingerprint each dumped result ----------------
    // Hash discipline mirrors the driver's compare (columns sorted by
    // name, values stringified) but is order-INDEPENDENT (sum of per-row
    // xxhash64 in decimal(38,0) — no ANSI overflow, duplicates don't
    // cancel the way xor would), so re-partitioning can't move it; it is
    // a cross-round drift detector, not a DuckDB-matching hash.
    val summaries = SparkEntry.queries.keys.toSeq.sorted
      .filter(selected).filterNot(failed.contains).map { name =>
        val df = spark.read.parquet(s"$outDir/$name")
        val cols = df.columns.sorted
        val sig = cols.map(c =>
          c + ":" + df.schema(c).dataType.simpleString).mkString(",")
        val strs = cols.map(c =>
          coalesce(col(c).cast("string"), lit("NULL")))
        val agg = df.select(xxhash64(strs: _*).cast(DecimalType(38, 0))
            .as("h"))
          .agg(count(lit(1)).as("n"), sum(col("h")).as("hs")).head()
        val rows = agg.getLong(0)
        val hash = Option(agg.getDecimal(1)).map(_.toBigInteger.toString(16))
          .getOrElse("empty")
        val oracled = SparkEntry.oracleSql.contains(name)
        name -> s"""{"rows":$rows,"cols":${q(sig)},"hash":${q(hash)},"oracle":$oracled}"""
      }
    val self = "{" +
      s""""sf":${q(sfDir)},"n_queries":${SparkEntry.queries.size},""" +
      s""""failed":[${failed.toSeq.sorted.map(q).mkString(",")}],""" +
      s""""queries":{${summaries.map { case (k, v) => s"${q(k)}:$v" }
        .mkString(",")}}}"""
    Files.writeString(Paths.get(s"$outDir/VERIFY_SELF.json"), self)
    // repo root copy — committed per round (BENCH_SELF.json discipline)
    if (only.isEmpty)
      try Files.writeString(Paths.get("VERIFY_SELF.json"), self)
      catch { case _: Throwable => () }
    spark.stop()
  }
}
