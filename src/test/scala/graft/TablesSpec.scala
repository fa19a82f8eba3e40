package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the footer-count cache's versioning: the cache key is the path,
  * the value carries the (max mtime, file count) version, so a rewrite
  * at the same path is re-counted — and replaces the stale entry instead
  * of accumulating one entry per data version. */
class TablesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("footerRowCount tracks rewrites at the same path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    val path = s"$dir/t.parquet"
    spark.range(0, 100).toDF("id").coalesce(2)
      .write.mode("overwrite").parquet(path)
    assert(Tables.footerRowCount(spark, path) == 100L)
    // cached: a second call with unchanged data serves the same count
    assert(Tables.footerRowCount(spark, path) == 100L)
    spark.range(0, 37).toDF("id").coalesce(2)
      .write.mode("overwrite").parquet(path)
    // force the version stamp past any fs mtime granularity — the two
    // writes above can land in the same clock tick with the same file
    // count, which is exactly the aliasing the versioned cache must see
    // through once the stamp differs
    val bump = System.currentTimeMillis() + 60000L
    new java.io.File(path).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach(f => assert(f.setLastModified(bump)))
    assert(Tables.footerRowCount(spark, path) == 37L,
      "rewritten dataset served a stale cached count")
  }
}
