package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Registration path: a session built withExtensions(GraftExtensions)
  * can call the native vector functions from SQL and plans the native
  * as-of join without touching experimental hooks. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // force a fresh session so the extensions actually apply (other
    // suites may have installed a default session in this JVM)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("float_vec_dot / float_vec_norm callable from SQL") {
    val row = spark.sql("""
      SELECT float_vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
                           CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
             float_vec_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n
    """).collect().head
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 5.0)
  }

  test("simhash64 callable from SQL, matches the Column form") {
    val viaSql = spark.sql(
      "SELECT simhash64(split('the quick brown fox', ' ')) AS s")
      .collect().head.getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.SimHash64.simhash64(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lit("the quick brown fox"), " ")))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
    // identical token multisets in different order hash identically
    val perm = spark.sql(
      "SELECT simhash64(split('fox brown quick the', ' ')) AS s")
      .collect().head.getLong(0)
    assert(perm == viaSql)
  }

  test("shingle_hashes / minhash_sig / vec_mean_float callable from SQL") {
    val sh = spark.sql(
      "SELECT shingle_hashes(split('a b c d', ' ')) AS h")
      .collect().head.getSeq[Long](0)
    assert(sh.length == 2, s"expected 2 shingles, got $sh") // 'a b c','b c d'
    val sig = spark.sql(
      "SELECT minhash_sig(split('a b c d', ' ')) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == graft.functions.MinHashSig.H)
    val mean = spark.sql("""
      SELECT vec_mean_float(v) AS m FROM VALUES
        (CAST(array(1.0, 3.0) AS ARRAY<FLOAT>)),
        (CAST(array(3.0, 5.0) AS ARRAY<FLOAT>)) AS t(v)""")
      .collect().head.getSeq[Float](0)
    assert(mean == Seq(2.0f, 4.0f), s"got $mean")
  }

  test("char_gram_hashes / zorder_code / count_min_sketch_agg callable from SQL") {
    val grams = spark.sql("SELECT char_gram_hashes('abcde') AS g")
      .collect().head.getSeq[Long](0)
    assert(grams.length == 2) // starts at chars 1 and 3 ('abc', 'cde')
    val z = spark.sql("SELECT zorder_code(3, 5) AS z")
      .collect().head.getLong(0)
    assert(z == graft.functions.ZOrderCode.interleave(3L, 5L))
    val est = spark.sql("""
      SELECT count_min_sketch_agg(w, 4, 64) AS sk
      FROM VALUES ('x'), ('x'), ('y') AS t(w)""")
      .collect().head.getSeq[Long](0)
    assert(est.length == 4 * 64 && est.sum == 3 * 4) // 3 keys x 4 rows
  }

  test("top_k_by_value callable from SQL, literal k enforced") {
    val rows = spark.sql("""
      SELECT g, top_k_by_value(CAST(v AS DOUBLE), CAST(i AS BIGINT), 2) AS tk
      FROM VALUES ('a', 1.0, 10), ('a', 3.0, 30), ('a', 2.0, 20),
                  ('b', 5.0, 50) AS t(g, v, i)
      GROUP BY g ORDER BY g""").collect()
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((3.0, 30L), (2.0, 20L)))
    val b = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(b.map(r => (r.getDouble(0), r.getLong(1))) == Seq((5.0, 50L)))
  }

  test("word_ngrams generator callable from SQL, matches the Column form") {
    val viaSql = spark.sql(
      "SELECT pos, ngram FROM (SELECT word_ngrams(split('a b c d', ' '), 2))")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(viaSql == Seq((1, "a b"), (2, "b c"), (3, "c d")))
    val viaCol = spark.range(1)
      .select(graft.functions.WordNgrams.wordNgrams(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lit("a b c d"), " "), 2))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(viaCol == viaSql)
    // shorter than n: the row vanishes (non-outer Generate semantics)
    assert(spark.sql(
      "SELECT word_ngrams(split('a b', ' '), 3)").count() == 0)
  }

  test("kll / bloom / approx_top_k callable from SQL") {
    // KLL build + union + quantile read: 1..99 is sub-capacity at k=200,
    // so the median read is exact and deterministic
    val med = spark.sql("""
      SELECT kll_quantile(kll_merge_agg(sk, 200), 0.5) AS m
      FROM (
        SELECT kll_sketch_agg(CAST(id AS DOUBLE), 200) AS sk
        FROM range(1, 100) GROUP BY id % 7)""")
      .collect().head.getDouble(0)
    assert(med == 50.0, s"sub-capacity KLL median $med")
    // bloom build + probe: inserted key hits, far key (overwhelmingly)
    // misses at this load factor. The probe takes NO k argument — it
    // reads k from the bloom value's header, so a mismatched probe k
    // (which would silently break no-false-negatives) cannot be expressed
    val bf = spark.sql("""
      SELECT might_contain_long(bloom_filter_agg(id, 1024, 6), 7) AS hit,
             might_contain_long(bloom_filter_agg(id, 1024, 6), 999999) AS miss
      FROM range(0, 10)""").collect().head
    assert(bf.getBoolean(0) && !bf.getBoolean(1))
    val topk = spark.sql("""
      SELECT approx_top_k(w, 4, 2048, 2) AS tk
      FROM VALUES ('x'), ('x'), ('x'), ('y'), ('y'), ('z') AS t(w)""")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("x", 3L), ("y", 2L)))
  }

  test("as-of strategy is installed by the extension") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100.0), (1L, 3L, 50.0)).toDF("k", "t", "v")
    val r = Seq((1L, 5L, 7.0)).toDF("rk", "rt", "rv")
    val lPlan = Bridge.analyzed(l)
    val rPlan = Bridge.analyzed(r)
    val plan = graft.plans.AsOfJoinPlan(lPlan, rPlan,
      Seq(lPlan.output.head), Seq(rPlan.output.head),
      Seq(lPlan.output(1)), Seq(rPlan.output(1)))
    val df = Bridge.ofRows(spark, plan)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val rows = df.orderBy("t").collect()
    // t=3 has no right row before it; t=10 matches rt=5
    assert(rows.length == 2)
    assert(rows(0).isNullAt(3))
    assert(rows(1).getLong(4) == 5L)
  }
}
