package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two properties that make the bloom pre-filter (q133) safe
  * and worthwhile:
  *
  * 1. NO FALSE NEGATIVES — every inserted key probes true (the
  *    exactness guarantee the oracle equality rests on);
  * 2. false positives stay near the analytic rate — the pre-filter
  *    actually sheds non-matching fact rows instead of passing
  *    everything (the shuffle-volume claim).
  */
class BloomFilterSpec extends AnyFunSuite {
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

  test("no false negatives; fp rate near analytic bound") {
    val n = 30000
    val inserted = spark.range(0, n).select(col("id").as("k"))
    val bloom = inserted.agg(BloomFilter.agg(col("k")).as("bf"))
    // every inserted key must probe true — across partitioned partial
    // builds and the merge (|= of words)
    val misses = inserted.join(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bf"), col("k")))
      .count()
    assert(misses == 0L, s"$misses false negatives")
    // disjoint probe keys: fp ≈ (1 − e^(−kn/m))^k ≈ 1.07% at these
    // parameters; allow 2×
    val probes = 30000
    val fp = spark.range(1000000, 1000000L + probes).select(col("id").as("k"))
      .join(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bf"), col("k")))
      .count()
    val kk = BloomFilter.K.toDouble
    val analytic = math.pow(1 - math.exp(-kk * n / BloomFilter.NumBits), kk)
    assert(fp <= (2 * analytic * probes).ceil.toLong + 5,
      s"fp rate ${fp.toDouble / probes} vs analytic $analytic")
  }

  test("probe k comes from the bloom's header, not the caller") {
    // build with a NON-default k: the probe takes no k argument and must
    // still agree with the build (k rides in the value's header word) —
    // previously a caller probing with k > build-k tested never-set bits
    // and silently produced false negatives
    val bloom = spark.range(0, 100)
      .agg(BloomFilter.agg(col("id"), numBits = 1024, k = 2).as("bf"))
    val misses = spark.range(0, 100).join(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bf"), col("id"))).count()
    assert(misses == 0L, s"$misses false negatives under non-default k")
    // a bare long array is not a bloom value: loud error, not a silent
    // wrong answer (header k=0 fails validation)
    val e = intercept[Exception] {
      spark.range(1)
        .select(BloomFilter.mightContain(
          array(lit(0L), lit(0L)).cast("array<bigint>"), lit(7L)))
        .collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("not a bloom_filter_agg value")),
      s"unexpected failure: $e")
    // an OLD-FORMAT (headerless) value whose first bit-set word happens
    // to land in [1,64] must fail the magic check too — previously it
    // was silently misinterpreted as a k header and probed with wrong
    // bit offsets
    val e2 = intercept[Exception] {
      spark.range(1)
        .select(BloomFilter.mightContain(
          array(lit(3L), lit(-1L), lit(-1L)).cast("array<bigint>"), lit(7L)))
        .collect()
    }
    assert(rootMessages(e2).exists(_.contains("not a bloom_filter_agg value")),
      s"unexpected failure: $e2")
  }

  test("degenerate bloom parameters are rejected at construction") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // 0 and Int.MinValue pass a bare power-of-two check but build an
    // empty/negative buffer and die mid-job; 32 is a real power of two
    // below one long word
    for (bad <- Seq(0, 32, Int.MinValue))
      intercept[IllegalArgumentException] {
        BloomFilterAgg(Literal(1L), bad, 6)
      }
    intercept[IllegalArgumentException] {
      BloomFilterAgg(Literal(1L), 1024, 0)
    }
    ()
  }

  test("approx_top_k eval re-estimates before the cut (no-merge path)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // d=1, w=1: every key shares ONE counter, so each key's true
    // estimate is the total row count — the maximal staleness setup.
    // "a" is inserted first (stored est 1), "z" nine times after
    // (stored est up to 10). A stale sort would cut on a=1 < z=10 and
    // report z first; a fresh eval sees both at 10 and the binary-order
    // tie-break must put "a" first.
    val agg = ApproxTopKAgg(
      BoundReference(0, StringType, nullable = true), 1, 1, 1)
    val buf = agg.createAggregationBuffer()
    def row(s: String) = InternalRow(UTF8String.fromString(s))
    agg.update(buf, row("a"))
    (1 to 9).foreach(_ => agg.update(buf, row("z")))
    val out = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    assert(out.numElements() == 1)
    val top = out.getStruct(0, 2)
    assert(top.getUTF8String(0).toString == "a" && top.getLong(1) == 10L,
      s"stale-estimate cut: got ${top.getUTF8String(0)}=${top.getLong(1)}")
  }

  test("edge inputs: empty/null-only groups degrade cleanly") {
    import spark.implicits._
    // bloom over zero rows: all-zero bits, every probe misses
    val emptyBloom = spark.range(0).select(col("id").as("k"))
      .agg(BloomFilter.agg(col("k")).as("bf"))
    val probe = emptyBloom
      .select(BloomFilter.mightContain(col("bf"), lit(7L)).as("hit"))
      .collect().head
    assert(!probe.getBoolean(0), "empty bloom claimed membership")
    // null keys are skipped, not hashed: only the non-null key is set
    val nullish = Seq(Some(1L), None, None).toDF("k")
      .agg(BloomFilter.agg(col("k")).as("bf"))
    val r = nullish.select(
      BloomFilter.mightContain(col("bf"), lit(1L)).as("a"),
      BloomFilter.mightContain(col("bf"), lit(99L)).as("b")).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // KLL over an empty group: quantile reads NULL, not a crash
    val kllEmpty = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(Kll.sketchAgg(col("v")).as("sk"))
      .select(Kll.quantile(col("sk"), 0.5).as("m")).collect().head
    assert(kllEmpty.isNullAt(0), "empty KLL sketch must read null")
    // approx_top_k over an empty group: empty array
    val topkEmpty = spark.range(0).select(col("id").cast("string").as("w"))
      .agg(CountMinSketch.approxTopK(col("w"), 5).as("tk"))
      .collect().head.getSeq[Any](0)
    assert(topkEmpty.isEmpty, "empty top-k must be an empty array")
  }

  test("q133 pre-filter sheds non-matching lineitems before the join") {
    val sfDir = "/root/testdata/sf0.01"
    val cust = graft.Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 8000.0)
    val o = graft.Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    val bloom = o.agg(BloomFilter.agg(col("o_orderkey")).as("bf"))
    val li = graft.Tables.lineitem(spark, sfDir)
    val total = li.count()
    val kept = li.join(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bf"), col("l_orderkey")))
      .count()
    val trueMatches = li.join(o, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(kept >= trueMatches, "pre-filter dropped a true match")
    // the point of the operator: the shuffle-side row count collapses
    // toward |matching|, not |fact| (~20% of customers qualify here)
    assert(kept < total / 2,
      s"pre-filter shed too little: $kept of $total (true $trueMatches)")
    assert(kept <= trueMatches + (0.05 * total).toLong,
      s"fp volume out of band: kept $kept vs true $trueMatches")
  }
}
