package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Stable._

/** Deeper TPC-H join/subquery shapes (Q4, Q9, Q13, Q18, Q19, Q22
  * analogues), adapted to the driver star schema — it has no partsupp,
  * l_commitdate/l_receiptdate, c_phone, or comment columns, so each
  * query keeps its ancestor's PLAN SHAPE (the part Catalyst has to get
  * right) with predicates over the columns that exist.
  *
  * Scale intent mirrors the rest of the relational surface: dimension
  * sides are filtered before their broadcast, fact-fact joins shuffle on
  * the join key both sides already aggregate on (no extra exchange), and
  * every money aggregate uses the exact-decimal [[Stable]] discipline so
  * partial aggregation stays order-independent. */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q108
  /** TPC-H Q9 shape: profit by supplier nation × ship year for one part
    * family. Without partsupp the unit cost is proxied from the part's
    * retail price (10% of retail per unit) — same 4-way join +
    * two-column group-by; all products stay decimal-exact. part is
    * filtered on the LIKE before broadcast, so the fact join fans out
    * only matching lineitems. */
  def q108ProductTypeProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir).filter(col("p_name").contains("widget"))
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val amount = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))) -
      dec2(col("p_retailprice")) * dec2(col("l_quantity")) * dec2(lit(0.1))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  // ---------------------------------------------------------------- q109
  /** TPC-H Q4 shape: order-priority checking — EXISTS semi-join with a
    * cross-table predicate (lineitem shipped >60 days after the order
    * date stands in for commit<receipt). Catalyst plans the EXISTS as a
    * left-semi hash join on orderkey with the date comparison as a join
    * residual; orders carries its quarter filter into the scan. */
  def q109OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    o.join(li,
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- q110
  /** TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    * join (customers with zero qualifying orders must survive with
    * count 0) feeding a second aggregation over the first's result.
    * count(o_orderkey) counts non-null matches only, which is what
    * makes the outer join's null rows become the c_count=0 bucket. */
  def q110CustomerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // ---------------------------------------------------------------- q111
  /** TPC-H Q18 shape: large-volume orders — a grouped HAVING subquery
    * over the fact table semi-filters the same fact's join. The
    * pre-aggregation groups lineitem on the SAME key the join uses, so
    * the having-filter adds no extra exchange beyond its own; at 100 TB
    * the >threshold order set is tiny, and AQE turns the orders join
    * into a broadcast. */
  def q111LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(moneySum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 180.0)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        epochS(col("o_orderdate")).as("o_orderdate_s"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // ---------------------------------------------------------------- q112
  /** TPC-H Q19 shape: disjunctive predicate revenue — an OR of three
    * conjunctive (brand, size-band, quantity-band) branches across the
    * part⋈lineitem join. The per-branch part predicates prune the
    * broadcast side; the l_quantity bounds stay sargable under the OR
    * (min/max envelope pushes to the scan). */
  def q112DiscountedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val branch1 = col("p_brand") === "Brand#11" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#13" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#15" &&
      col("p_size").between(25, 50) && col("l_quantity").between(20, 30)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- q113
  /** TPC-H Q22 shape: sales opportunity — an uncorrelated scalar
    * aggregate subquery (global positive-balance average) gates
    * customers, an ANTI join drops those with orders in the last window of the data, and the
    * survivors aggregate per nation. The scalar is a one-row broadcast
    * (the q56/q97 discipline); the average divides an exact decimal sum
    * once, so the gate compares identical doubles on both engines. */
  def q113SalesOpportunity(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    val n = Tables.nation(spark, sfDir)
    val thr = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec2(col("c_acctbal"))).cast("double")
        / count(lit(1))).as("avg_bal"))
    c.join(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("nation"))
  }

  // ---------------------------------------------------------------- q122
  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue — a grouped
    * revenue aggregate compared against its own MAX (the view +
    * max-subquery pattern). The max is a one-row broadcast against the
    * |suppliers|-row revenue frame (q97 discipline); revenue is the
    * exact-decimal sum cast once, so the equality gate compares
    * identical doubles on both engines. */
  def q122TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val rev = li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.join(broadcast(mx))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  // ---------------------------------------------------------------- q128
  /** TPC-H Q17 shape: small-quantity revenue — a CORRELATED scalar
    * subquery (each lineitem compares against 20% of ITS part's average
    * quantity) gating a fact scan. Spelled decorrelated, which is the
    * plan Catalyst's subquery rewrite would produce: per-part averages
    * over the brand-filtered lineitem slice, broadcast back onto the
    * same slice. Without p_container the part group is brand + size
    * band.
    *
    * Scale shape: the brand filter prunes part BEFORE its broadcast, so
    * the fact table is reduced to matching lineitems once and BOTH
    * consumers (threshold aggregate, gated scan) read that slice; the
    * threshold frame is |brand parts| rows — broadcast, never shuffled
    * against the fact. Determinism: the threshold is (exact decimal
    * sum → double) / count * 0.2 with identical association in both
    * engines, so the `<` gate compares identical doubles. */
  def q128SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#13" && col("p_size").between(10, 30))
      .select(col("p_partkey"))
    val lp = Tables.lineitem(spark, sfDir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val thr = lp.groupBy(col("l_partkey"))
      .agg((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))
        * lit(0.2)).as("qty_thr"))
    lp.join(broadcast(thr), Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg((sum(dec2(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- q129
  /** TPC-H Q21 shape: suppliers who kept waiting — the multi-EXISTS /
    * NOT-EXISTS chain: a supplier's late lineitem counts only if the
    * order is multi-supplier (EXISTS another supplier's line) and no
    * OTHER supplier was late on it (NOT EXISTS). "Late" is the q109
    * proxy `l_shipdate > o_orderdate + 60 days` (no
    * l_commitdate/l_receiptdate in this schema).
    *
    * Scale shape: the nation's suppliers are a broadcast-small dim
    * joined FIRST, so the EXISTS/NOT-EXISTS chain (a left-semi and a
    * left-anti hash join on l_orderkey with a suppkey-inequality
    * residual) runs on the one-nation slice of late lines against the
    * orderkey-shuffled fact — the exact decorrelated plan Catalyst
    * produces for the SQL form, spelled explicitly. */
  def q129WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
    val l = Tables.lineitem(spark, sfDir)
      .join(o.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
    val late = l.filter(col("late"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val l1 = late.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val multiSupplier = l1.as("a").join(l.as("b"),
      col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_suppkey") =!= col("b.l_suppkey"), "left_semi")
    val onlyLate = multiSupplier.as("a").join(late.as("c"),
      col("a.l_orderkey") === col("c.l_orderkey")
        && col("a.l_suppkey") =!= col("c.l_suppkey"), "left_anti")
    onlyLate.groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  // ---------------------------------------------------------------- q149
  /** TPC-H Q2 shape: min-cost supplier — the CORRELATED MIN subquery
    * (each part compares offers against the minimum over ITS own
    * offers within a region). No partsupp here, so an "offer" is a
    * lineitem's unit price (l_extendedprice / l_quantity) from a
    * EUROPE supplier; the rest is Q2 verbatim: region-filtered
    * supplier dim, part filter, min-per-part threshold, equality gate,
    * Q2's ORDER BY acctbal DESC. Spelled decorrelated as a PER-PART
    * WINDOW MIN (the q90 discipline): the aggregate-and-rejoin form
    * was plan-audited at 11 exchanges with the lineitem fact scanned
    * TWICE — each threshold consumer re-evaluates the whole join
    * subtree — where the window form scans once and shuffles only the
    * pruned slice on the p_partkey the gate needs anyway. The DuckDB
    * oracle keeps the genuine correlated subquery, so the compare
    * proves the decorrelation equivalence, not just the arithmetic.
    *
    * Scale shape: region prunes supplier BEFORE its broadcast; the
    * fact is reduced to EUROPE offers on filtered parts ONCE, and the
    * only corpus-sized exchange is that slice hash-partitioned on
    * p_partkey for the window gate. Unit price is a double
    * division of identical parquet operands in both engines (IEEE-
    * deterministic, no sums), so the equality gate and the hash
    * compare are exact. DISTINCT collapses equal-priced repeat offers
    * by the same supplier (Q2 keys on partsupp, which has no such
    * repeats). */
  def q149MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val eur = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .join(broadcast(Tables.region(spark, sfDir)
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val offers = Tables.lineitem(spark, sfDir)
      .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_name"), col("s_acctbal"),
        col("n_name"),
        (col("l_extendedprice").cast("double")
          / col("l_quantity").cast("double")).as("unit_price"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_type"))
    val po = offers.join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val minW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_partkey"))
    po.withColumn("min_price", min(col("unit_price")).over(minW))
      .filter(col("unit_price") === col("min_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("min_price"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(50)
  }

  // ---------------------------------------------------------------- q150
  /** TPC-H Q20 shape: the nested chain supplier ← semi ← (per-supplier
    * aggregate compared against a correlated per-part aggregate). No
    * partsupp/availqty, so "excess stock" becomes DOMINANCE: a
    * supplier counts a part if they shipped more than half of that
    * part's total 1996 volume — still a per-(supplier, part) aggregate
    * gated by a correlated per-part threshold, which is the
    * decorrelation Q20 exists to exercise. Single-supplier parts are
    * trivially dominated and excluded (n_supp >= 2), keeping only
    * contested wins.
    *
    * Scale shape: the name-filtered part dim broadcasts onto the fact
    * FIRST, so the (part, supplier) aggregation runs on the pruned
    * slice, ONCE — the per-part totals are a WINDOW over that small
    * aggregate frame (the aggregate-and-rejoin form was plan-audited
    * at 8 exchanges with the fact scanned+aggregated twice; the window
    * form pays one |red parts × suppliers|-row exchange instead);
    * quantities are exact-decimal sums and the dominance gate is the
    * integer-scaled `q * 2 > t` (no double 0.5 — the compare is exact
    * in both engines). */
  def q150DominantSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rp = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val vol = Tables.lineitem(spark, sfDir)
      .join(broadcast(rp), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec2(col("l_quantity"))).as("q"))
    val totW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey"))
    vol.withColumn("t", sum(col("q")).over(totW))
      .withColumn("n_supp", count(lit(1)).over(totW))
      .filter(col("q") * lit(2) > col("t") && col("n_supp") >= 2)
      .join(broadcast(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("s_acctbal"))
      .agg(count(lit(1)).as("n_dominated"))
      .orderBy(col("n_dominated").desc, col("s_name"))
      .limit(50)
  }

  // ---------------------------------------------------------------- q169
  /** TPC-H Q6 shape: forecast revenue change — the pure scan-side
    * query of the suite. Every predicate (date window, discount band,
    * quantity cap) is sargable, so all four reach the parquet reader
    * as PushedFilters and row groups outside the 1996 window never
    * decompress; what's left is ONE partial+final aggregate — the
    * only exchange is the single-row partial merge. revenue multiplies
    * two exact decimals (price × discount), so partial-aggregation
    * order can never move the sum. */
  def q169ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- q170
  /** TPC-H Q11 shape: important stock — a grouped aggregate gated by a
    * scalar fraction of ITS OWN global total (HAVING sum(v) > total/k).
    * No partsupp, so per-part "stock value" is the revenue one
    * nation's suppliers shipped for that part. The plan Catalyst must
    * get right: the one-nation supplier list broadcasts onto the fact
    * (fact never shuffles to find its suppliers), the per-part
    * aggregate is the only key shuffle, the global total re-aggregates
    * THAT small frame (never the fact again) into a one-row broadcast,
    * and the gate compares `v * 1000 > total` in exact decimal — the
    * q150 integer-scaling discipline, no double fraction on either
    * engine. */
  def q170ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    val sn = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = Tables.lineitem(spark, sfDir)
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec2(col("l_extendedprice"))).as("v"))
    val total = vals.agg(sum(col("v")).as("t"))
    vals.crossJoin(broadcast(total))
      .filter(col("v") * lit(1000) > col("t"))
      .select(col("l_partkey"), col("v").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  // ---------------------------------------------------------------- q171
  /** TPC-H Q12 shape: shipping-mode priority classes — the fact-fact
    * join with a cross-table residual plus CASE-conditional counting.
    * No l_shipmode, so return class (A/R) stands in for ship mode and
    * "late" (shipped >30 days after order) stands in for the
    * receipt/commit comparison. Both facts shuffle once on orderkey
    * (the key they join on); the priority split is two conditional
    * sums inside the same hash aggregate — one pass, not one join per
    * class. Counts are integers, so no numeric discipline is needed. */
  def q171ShipmodePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("A", "R")
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  // ---------------------------------------------------------------- q172
  /** TPC-H Q16 shape: parts/supplier relationship — a NOT-IN supplier
    * exclusion (planned as a broadcast anti-join; "complaints" proxied
    * by negative account balance) feeding a grouped COUNT DISTINCT.
    * Supplier-part pairs come from lineitem since there is no
    * partsupp; the raw fact flows straight into the distinct aggregate
    * (no pre-distinct — the two-phase distinct aggregate dedups
    * per-partition first, so the pair multiset never shuffles at full
    * multiplicity). The part dim prunes to 1-in-7 sizes BEFORE its
    * broadcast; the anti side is a handful of suppliers, broadcast. */
  def q172PartSupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#13"
        && !col("p_type").startsWith("PROMO")
        && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q108_product_type_profit" -> q108ProductTypeProfit,
    "q149_min_cost_supplier" -> q149MinCostSupplier,
    "q150_dominant_supplier" -> q150DominantSupplier,
    "q128_small_qty_revenue" -> q128SmallQtyRevenue,
    "q129_waiting_suppliers" -> q129WaitingSuppliers,
    "q122_top_supplier" -> q122TopSupplier,
    "q109_order_priority" -> q109OrderPriority,
    "q110_customer_distribution" -> q110CustomerDistribution,
    "q111_large_orders" -> q111LargeOrders,
    "q112_discounted_revenue" -> q112DiscountedRevenue,
    "q113_sales_opportunity" -> q113SalesOpportunity,
    "q169_forecast_revenue" -> q169ForecastRevenue,
    "q170_important_stock" -> q170ImportantStock,
    "q171_shipmode_priority" -> q171ShipmodePriority,
    "q172_part_supplier_count" -> q172PartSupplierCount,
  )

  lazy val sql: Map[String, String] = Map(
    // The oracle keeps the GENUINE correlated MIN subquery (the Spark
    // side is hand-decorrelated), so the hash compare proves the
    // decorrelation equivalence, not just the arithmetic.
    "q149_min_cost_supplier" -> """
      WITH eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      offers AS (
        SELECT l_partkey, s_name, s_acctbal, n_name,
          CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)
            AS unit_price
        FROM lineitem JOIN eur ON l_suppkey = s_suppkey),
      p AS (
        SELECT p_partkey, p_type FROM part
        WHERE p_type = 'STANDARD' AND p_size <= 15)
      SELECT DISTINCT s_acctbal, s_name, n_name,
        p.p_partkey AS p_partkey, p_type, unit_price AS min_price
      FROM p JOIN offers o ON o.l_partkey = p.p_partkey
      WHERE o.unit_price = (
        SELECT min(o2.unit_price) FROM offers o2
        WHERE o2.l_partkey = p.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 50""",
    "q150_dominant_supplier" -> """
      WITH rp AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      vol AS (
        SELECT l_partkey, l_suppkey,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        FROM lineitem JOIN rp ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey),
      tot AS (
        SELECT l_partkey, sum(q) AS t, count(1) AS n_supp
        FROM vol GROUP BY l_partkey)
      SELECT s_name, s_acctbal, count(1) AS n_dominated
      FROM vol
        JOIN tot USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE q * 2 > t AND n_supp >= 2
      GROUP BY s_name, s_acctbal
      ORDER BY n_dominated DESC, s_name
      LIMIT 50""",
    "q128_small_qty_revenue" -> """
      WITH bp AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30),
      lp AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN bp ON l_partkey = p_partkey),
      thr AS (
        SELECT l_partkey,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            / count(1) * 0.2 AS qty_thr
        FROM lp GROUP BY 1)
      SELECT
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
          AS avg_yearly,
        count(1) AS n_lines
      FROM lp JOIN thr USING (l_partkey)
      WHERE l_quantity < qty_thr""",
    "q129_waiting_suppliers" -> """
      WITH l AS (
        SELECT l_orderkey, l_suppkey,
          l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      l1 AS (SELECT * FROM l WHERE late)
      SELECT s_name, count(1) AS numwait
      FROM l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
        AND EXISTS (
          SELECT 1 FROM l
          WHERE l.l_orderkey = l1.l_orderkey
            AND l.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM l1 x
          WHERE x.l_orderkey = l1.l_orderkey
            AND x.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",
    "q122_top_supplier" -> """
      WITH rev AS (
        SELECT l_suppkey,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey""",
    "q108_product_type_profit" -> """
      SELECT n_name AS nation,
        CAST(year(l_shipdate) AS BIGINT) AS o_year,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
             - CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))
               * CAST(0.1 AS DECIMAL(18,2))) AS DOUBLE) AS profit,
        count(1) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2
      ORDER BY nation, o_year""",
    "q109_order_priority" -> """
      SELECT o_orderpriority, count(1) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q110_customer_distribution" -> """
      SELECT c_count, count(1) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",
    "q111_large_orders" -> """
      SELECT c_name, o_orderkey,
        CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_orderdate_s,
        o_totalprice, total_qty
      FROM (
        SELECT l_orderkey,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING total_qty > 180.0) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""",
    "q112_discounted_revenue" -> """
      SELECT
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(1) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 25 AND 50
             AND l_quantity BETWEEN 20 AND 30)""",
    "q113_sales_opportunity" -> """
      SELECT n_name AS nation, count(1) AS numcust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(1)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY n_name
      ORDER BY nation""",
    "q169_forecast_revenue" -> """
      SELECT
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        count(1) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",
    "q170_important_stock" -> """
      WITH sn AS (
        SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'),
      vals AS (
        SELECT l_partkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
        FROM lineitem JOIN sn ON l_suppkey = s_suppkey
        GROUP BY 1)
      SELECT l_partkey, CAST(v AS DOUBLE) AS value
      FROM vals
      WHERE v * 1000 > (SELECT sum(v) FROM vals)
      ORDER BY value DESC, l_partkey""",
    "q171_shipmode_priority" -> """
      SELECT l_returnflag AS ship_class,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      WHERE l_returnflag IN ('A','R')
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
      ORDER BY 1""",
    "q172_part_supplier_count" -> """
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#13'
        AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
  )
}
