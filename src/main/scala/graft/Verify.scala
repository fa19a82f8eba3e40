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
    def render(drift: Seq[String]) = "{" +
      s""""sf":${q(sfDir)},"srcHash":${q(mainSourceHash())},""" +
      s""""n_queries":${SparkEntry.queries.size},""" +
      s""""failed":[${failed.toSeq.sorted.map(q).mkString(",")}],""" +
      s""""drift":[${drift.map(q).mkString(",")}],""" +
      s""""queries":{${summaries.map { case (k, v) => s"${q(k)}:$v" }
        .mkString(",")}}}"""
    Files.writeString(Paths.get(s"$outDir/VERIFY_SELF.json"), render(Nil))
    // repo root copy — committed per round (BENCH_SELF.json discipline).
    // Before overwriting, the IN-TREE DRIFT ALARM fires: an oracled
    // query whose committed fingerprint moved while the main source
    // tree is byte-identical means the DATA under the queries changed —
    // the round-9 silent-regression mode (a regenerated events.parquet
    // moved 45 queries' results while the DuckDB compare, recomputing
    // over the same new parquet, stayed green). Loud on stderr, recorded
    // in the committed summary, and ContractSpec refuses a nonempty
    // drift list — sbt test goes red until a human adjudicates.
    if (only.isEmpty) {
      val prevPath = Paths.get("VERIFY_SELF.json")
      val drift =
        if (prevPath.toFile.exists())
          driftBetween(Files.readString(prevPath), render(Nil))
        else Nil
      drift.foreach(n => System.err.println(
        s"[verify] DRIFT $n: result moved with an unchanged source tree " +
          "— the input data under this query changed"))
      try Files.writeString(prevPath, render(drift))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }

  /** 8-byte hex SHA-256 over the main source tree (sorted paths +
    * bytes): the "did the CODE change" side of the drift alarm. */
  def mainSourceHash(): String = {
    val root = Paths.get("src/main/scala")
    if (!root.toFile.exists()) "absent"
    else {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      import scala.jdk.CollectionConverters._
      val files = Files.walk(root).iterator().asScala
        .filter(_.toFile.isFile).toSeq.sortBy(_.toString)
      files.foreach { p =>
        md.update(p.toString.getBytes("UTF-8"))
        md.update(Files.readAllBytes(p))
      }
      md.digest().take(8).map("%02x".format(_)).mkString
    }
  }

  /** ORACLED queries whose fingerprint differs between two
    * VERIFY_SELF.json summaries THAT RECORD THE SAME srcHash — i.e.
    * results moved and the code provably didn't. Different (or absent)
    * srcHash → Nil: a source change legitimately moves results, and the
    * DuckDB oracle gate judges those. Rows-only queries are excluded
    * (sketch/model randomness — KLL compaction is rank-randomized —
    * moves their hashes run to run by design; their regressions are
    * pinned in ScalaTest instead). Pure string → string so DriftSpec
    * can trip it with a deliberate perturbation. */
  def driftBetween(prevJson: String, curJson: String): Seq[String] = {
    def srcHash(j: String): Option[String] =
      """"srcHash":"([^"]*)"""".r.findFirstMatchIn(j).map(_.group(1))
    def fps(j: String): Map[String, String] =
      """"([^"]+)":\{"rows":(\d+),"cols":"((?:[^"\\]|\\.)*)","hash":"([^"]*)","oracle":(true|false)\}""".r
        .findAllMatchIn(j).filter(_.group(5) == "true")
        .map(m => m.group(1) ->
          s"${m.group(2)}|${m.group(3)}|${m.group(4)}").toMap
    (srcHash(prevJson), srcHash(curJson)) match {
      case (Some(a), Some(b)) if a == b =>
        val p = fps(prevJson); val c = fps(curJson)
        p.keySet.intersect(c.keySet).filter(k => p(k) != c(k)).toSeq.sorted
      case _ => Nil
    }
  }
}
