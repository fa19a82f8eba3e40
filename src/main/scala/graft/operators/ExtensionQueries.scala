package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import Stable.dec2

/** The UDF/UDAF/generator surface (SURVEY §2.2 "UDF surface" rows).
  *
  * Built-ins are preferred everywhere else in the engine (they stay
  * inside Catalyst's optimizer and codegen); these queries exist to
  * prove the extension seams work end-to-end through the graded path:
  * - a typed `Aggregator[IN, BUF, OUT]` with an exact decimal buffer
  *   (order-independent merges — safe under partial aggregation on any
  *   cluster),
  * - one deliberately-simple scalar UDF (opaque to the optimizer: no
  *   pushdown through it, which is why it is a demo and not a pattern),
  * - `posexplode` as the built-in generator (UDTF row in the survey).
  */
object ExtensionQueries {
  type Q = (SparkSession, String) => DataFrame

  case class LineW(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)

  /** Quantity-weighted average price with exact decimal accumulation:
    * num = Σ dec2(price)·dec2(qty), den = Σ dec2(qty); finish divides in
    * double (both engines cast their exact decimal sums identically). */
  object WeightedAvgPrice
      extends Aggregator[LineW, (java.math.BigDecimal, java.math.BigDecimal), Double] {
    private type B = java.math.BigDecimal
    private def d2(x: Double): B =
      new B(x).setScale(2, java.math.RoundingMode.HALF_UP)
    def zero: (B, B) = (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)
    def reduce(b: (B, B), r: LineW): (B, B) =
      (b._1.add(d2(r.l_extendedprice).multiply(d2(r.l_quantity))),
        b._2.add(d2(r.l_quantity)))
    def merge(a: (B, B), b: (B, B)): (B, B) =
      (a._1.add(b._1), a._2.add(b._2))
    def finish(b: (B, B)): Double =
      if (b._2.signum == 0) 0.0 else b._1.doubleValue / b._2.doubleValue
    def bufferEncoder: Encoder[(B, B)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---------------------------------------------------------------- q48
  /** The SAME typed Aggregator graded through the untyped
    * `functions.udaf` column path: a plain hash `groupBy` whose input
    * projection builds only the 3 needed fields per row — not
    * `as[LineW].groupByKey`, whose whole-row deserialization ran the
    * Aggregator outside whole-stage codegen and made this the board's
    * second-slowest query (4.7 s → sub-second at sf0.1). The typed
    * Dataset path stays exercised in UdafSpec (same class, same
    * results), so both extension seams remain proven. */
  def q48UdafWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val wavg = udaf(WeightedAvgPrice, Encoders.product[LineW])
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** The typed-Dataset form of q48 — identical algebra through
    * `as[LineW].groupByKey.agg(toColumn)`; pinned equal to the udaf
    * path in UdafSpec so the typed seam stays covered. */
  def q48TypedForm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[LineW]
      .groupByKey(_.l_returnflag)
      .agg(WeightedAvgPrice.toColumn.name("wavg_price"))
      .toDF("l_returnflag", "wavg_price")
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q49
  /** Scalar UDF demo: slugify part names. A UDF is an optimizer black
    * box — the equivalent built-in chain (lower+replace) would keep
    * pushdown/codegen, which is the engine's default style. */
  def q49UdfSlug(spark: SparkSession, sfDir: String): DataFrame = {
    val slug = udf((s: String) => if (s == null) null
      else s.toLowerCase.replace(' ', '-'))
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), slug(col("p_name")).as("slug"))
      .filter(col("p_partkey") % 10 === 0)
      .orderBy(col("p_partkey"))
  }

  // ---------------------------------------------------------------- q50
  /** Generator (UDTF row): posexplode over the first 4 embedding
    * coordinates — one input row fans out to 4 output rows. */
  def q50Posexplode(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(slice(col("embedding"), 1, 4)).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
      .orderBy(col("vec_id"), col("pos"))
  }

  // ---------------------------------------------------------------- q52
  /** Skew-proof two-phase aggregation (Skew.saltedSumCount): partial agg
    * on (key, salt) then final on key — identical algebra to the plain
    * groupBy (which the oracle runs), but a hot key spreads across 16
    * reducers instead of one. */
  def q52SaltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.{Skew, Stable}
    Skew.saltedSumCount(Tables.events(spark, sfDir), "event_type",
        Stable.dec2(col("value")), col("event_id"), salts = 16)
      .select(col("event_type"),
        col("sum_value").cast("double").as("sum_value"), col("n"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q53
  /** The native as-of join operator (graft.plans.AsOfJoinExec — custom
    * LogicalPlan + Strategy + sort-merge physical node) answering the
    * same question as q10's window rewrite, against the same oracle:
    * the hash gate proves operator == rewrite == DuckDB. */
  def q53AsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Stable.epochS
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
    val clicks = e.filter(col("event_type") === "click")
    graft.plans.AsOf.join(spark, purchases, clicks, "user_id",
        Seq("ts", "event_id"))
      .select(col("event_id"), col("user_id"), epochS(col("ts")).as("ts_s"),
        epochS(col("r_ts")).as("click_ts_s"),
        col("r_value").as("last_click_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q54
  /** Top-3 orders per status via the bounded TypedImperativeAggregate
    * (graft.functions.TopKByValue): shuffle carries ≤ k rows per group
    * instead of window-sorting every partition. Oracle: the window
    * rewrite — both must produce identical rows. */
  def q54TopKAggregate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAggregate.topK
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(topK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderstatus"), explode(col("top")).as("t"))
      .select(col("o_orderstatus"), col("t.value").as("o_totalprice"),
        col("t.id").as("o_orderkey"))
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc,
        col("o_orderkey"))
  }

  // ---------------------------------------------------------------- q55
  /** Exact percentiles (linear interpolation — same semantics as
    * DuckDB's quantile_cont; approximate sketches stay off the oracle
    * surface like HLL). */
  def q55Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 2).as("p50"),
        round(expr("percentile(value, 0.9)"), 2).as("p90"),
        round(expr("percentile(value, 0.99)"), 2).as("p99"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q56
  /** Correlated scalar subquery (TPC-H Q17 shape): small-quantity
    * lineitems below 50% of their part's average quantity — exercises
    * Catalyst subquery decorrelation into an aggregate + join. */
  def q56ScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("ssq_lineitem")
    spark.sql("""
      SELECT l.l_partkey,
        count(1) AS n_small,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
      FROM ssq_lineitem l
      WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM ssq_lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
      GROUP BY l.l_partkey
      ORDER BY l.l_partkey
    """)
  }

  // ---------------------------------------------------------------- q57
  /** TPC-H Q3 shape: shipping-priority revenue — two fact joins, a
    * selective date sargable filter on each side, top-10 with total
    * tie-break. */
  def q57ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    c.filter(col("c_mktsegment") === "BUILDING")
      .join(o, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q59
  /** IN-subquery (decorrelated to a semi join by Catalyst): orders from
    * machinery-segment customers. */
  def q59InSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("insq_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("insq_customer")
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM insq_orders
      WHERE o_custkey IN (SELECT c_custkey FROM insq_customer
                          WHERE c_mktsegment = 'MACHINERY')
        AND o_totalprice > 250000
      ORDER BY o_orderkey
    """)
  }

  // ---------------------------------------------------------------- q60
  /** RANGE window frame over event-time seconds: per user, events and
    * exact value sum in the trailing 10 minutes (value-based frame, not
    * row-based — the other half of the frame-aggregate surface). */
  def q60WindowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .withColumn("ts_s", Stable.epochS(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-600, 0)
    e.select(col("event_id"), col("user_id"), col("ts_s"),
        count(lit(1)).over(w).as("n_10m"),
        sum(dec2(col("value"))).over(w).cast("double").as("sum_10m"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q61
  /** TPC-H Q10 shape: revenue lost to returned items per customer over a
    * quarter — 4-table join, broadcast dims, top-20 by revenue. */
  def q61ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q99
  /** TPC-H Q5 shape: local-supplier revenue per nation — the 6-table
    * join-order stress (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈
    * nation ⋈ region) with the locality constraint c_nationkey =
    * s_nationkey riding the supplier join. region/nation are broadcast;
    * the two fact joins are equi-joins Catalyst + AQE order from
    * runtime stats — at 100 TB this is the query where join order makes
    * or breaks the plan, which is exactly why it's declared rather than
    * hand-scheduled. */
  def q99LocalSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- q104
  /** TPC-H Q7 shape: shipping volume between two nations by ship year —
    * the double-dimension-alias stress (nation joined twice under two
    * roles). The nation pair filter is applied INSIDE each broadcast
    * dim before the fact joins — at 100 TB that prunes supplier and
    * customer matches at join time instead of carrying every nation
    * through the 4-way fact join and filtering at the end; only the
    * cheap cross-role inequality runs post-join. */
  def q104VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n1 = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // ---------------------------------------------------------------- q105
  /** TPC-H Q8 shape: one nation's market share inside one region's
    * consumption of one part type, by order year — conditional share of
    * a 6-table join. Both sums accumulate exact decimal and divide once
    * in double (the q62 discipline), so the ratio is bit-stable
    * cross-engine. part is filtered before its broadcast; the two
    * nation roles ride separate broadcast aliases. */
  def q105MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val p = Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY")
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val vol = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", vol)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_year"))
  }

  // ---------------------------------------------------------------- q106
  /** The custom-Generator seam graded end-to-end: word trigrams of a
    * document sample via the native `WordNgrams` Catalyst Generator
    * (functions/NgramGenerator.scala) — the analyzer's ExtractGenerator
    * rewrites the select into a streaming Generate node, no
    * intermediate n-gram array is ever materialized (contrast q50,
    * which grades the BUILT-IN generator path). md5 of the ngram keeps
    * the graded payload small while pinning exact content. */
  def q106NgramGenerate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 20 === 0)
    docs
      .select(col("doc_id"),
        graft.functions.WordNgrams.wordNgrams(split(col("text"), " "), 3))
      .select(col("doc_id"), col("pos"), md5(col("ngram")).as("ngram_md5"))
      .orderBy(col("doc_id"), col("pos"))
  }

  // ---------------------------------------------------------------- q62
  /** TPC-H Q14 shape: promo revenue share in a month — conditional
    * aggregation over a fact/dim join, exact decimal ratio in double. */
  def q62PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    li.filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO",
            dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0
          / sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double")).as("promo_pct"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- q63
  /** String aggregation (listagg/string_agg): nations per region as a
    * deterministic sorted CSV — collect_list order is nondeterministic
    * under parallel merge, so array_sort pins it (same reason the oracle
    * uses ORDER BY inside string_agg). */
  def q63StringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q63_string_agg" -> q63StringAgg,
    "q61_returned_items" -> q61ReturnedItems,
    "q62_promo_revenue" -> q62PromoRevenue,
    "q59_in_subquery" -> q59InSubquery,
    "q60_window_range_frame" -> q60WindowRangeFrame,
    "q55_percentiles" -> q55Percentiles,
    "q56_scalar_subquery" -> q56ScalarSubquery,
    "q57_shipping_priority" -> q57ShippingPriority,
    "q48_udaf_weighted_avg" -> q48UdafWeightedAvg,
    "q49_udf_slug" -> q49UdfSlug,
    "q50_posexplode" -> q50Posexplode,
    "q52_salted_agg" -> q52SaltedAgg,
    "q53_asof_native" -> q53AsofNative,
    "q54_topk_aggregate" -> q54TopKAggregate,
    "q99_local_supplier_volume" -> q99LocalSupplierVolume,
    "q104_volume_shipping" -> q104VolumeShipping,
    "q105_market_share" -> q105MarketShare,
    "q106_ngram_generate" -> q106NgramGenerate,
  )

  lazy val sql: Map[String, String] = Map(
    "q48_udaf_weighted_avg" -> """
      SELECT l_returnflag,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q49_udf_slug" -> """
      SELECT p_partkey, replace(lower(p_name), ' ', '-') AS slug
      FROM part
      WHERE p_partkey % 10 = 0
      ORDER BY p_partkey""",
    "q50_posexplode" -> """
      SELECT vec_id,
        CAST(unnest(generate_series(0, 3)) AS BIGINT) AS pos,
        unnest(list_transform([1, 2, 3, 4],
          i -> CAST(embedding[i] AS DOUBLE))) AS v
      FROM embeddings
      ORDER BY vec_id, pos""",
    "q52_salted_agg" -> """
      SELECT event_type,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        count(1) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    // identical oracle to q10 — the native operator and the window
    // rewrite must both hash-match it
    "q53_asof_native" -> RelationalQueries.sql("q10_join_asof"),
    "q54_topk_aggregate" -> """
      SELECT o_orderstatus, o_totalprice, o_orderkey
      FROM (
        SELECT o_orderstatus, o_totalprice, o_orderkey,
          row_number() OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""",
    "q55_percentiles" -> """
      SELECT event_type,
        round(quantile_cont(value, 0.5), 2) AS p50,
        round(quantile_cont(value, 0.9), 2) AS p90,
        round(quantile_cont(value, 0.99), 2) AS p99
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "q56_scalar_subquery" -> """
      SELECT l.l_partkey,
        count(1) AS n_small,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
      FROM lineitem l
      WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
      GROUP BY l.l_partkey
      ORDER BY l.l_partkey""",
    "q57_shipping_priority" -> """
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",
    "q59_in_subquery" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'MACHINERY')
        AND o_totalprice > 250000
      ORDER BY o_orderkey""",
    "q60_window_range_frame" -> """
      SELECT event_id, user_id, ts_s,
        count(1) OVER w AS n_10m,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10m
      FROM (SELECT event_id, user_id, value,
              CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
            FROM events) e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    "q99_local_supplier_volume" -> """
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",
    "q104_volume_shipping" -> """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INTEGER) AS l_year,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND n1.n_name IN ('NATION_3', 'NATION_7')
        AND n2.n_name IN ('NATION_3', 'NATION_7')
        AND n1.n_name <> n2.n_name
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3""",
    "q105_market_share" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share,
        count(1) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
      ORDER BY 1""",
    "q106_ngram_generate" -> """
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words
        FROM documents WHERE doc_id % 20 = 0),
      g AS (
        SELECT doc_id, words,
          CAST(unnest(generate_series(1, len(words) - 2)) AS INTEGER) AS pos
        FROM w)
      SELECT doc_id, pos,
        md5(array_to_string(words[pos:pos+2], ' ')) AS ngram_md5
      FROM g
      ORDER BY doc_id, pos""",
    "q61_returned_items" -> """
      SELECT c_custkey, c_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON CAST(c_nationkey AS INTEGER) = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",
    "q62_promo_revenue" -> """
      SELECT
        CAST(sum(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
          / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
        count(1) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'""",
    "q63_string_agg" -> """
      SELECT r_name,
        string_agg(n_name, ',' ORDER BY n_name) AS nations,
        count(1) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",
  )
}
