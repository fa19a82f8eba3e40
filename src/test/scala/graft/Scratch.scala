package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only perf scratchpad: `sbt "Test/runMain graft.functions.Scratch"`.
  * Not part of the graded surface. Current probe: 10× scale-up of the
  * dedup/sampling hot paths by unioning sf0.1 documents with shifted
  * doc_ids — checks runtime grows ~linearly (no hidden quadratic). */
object Scratch {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(s"[scratch] $tag ${(System.nanoTime - t0) / 1e9}s")
    r
  }

  /** SMB-vs-shuffle probe (`… Scratch smb`): puts a wall-clock number on
    * q143's plan-shape claim. At ×k replication of sf0.1 orders/lineitem
    * (shifted orderkeys, so join cardinality grows k× with no skew
    * change), time the same fact-to-fact sort-merge join (a) off the
    * bucketed layout — zero Exchange, partition-local sort — and (b) off
    * raw parquet — both sides shuffled. Broadcast is disabled and both
    * runs carry merge hints, so the ONLY difference is the exchange the
    * layout pre-paid. The one-time bucketed-write cost is timed too, so
    * the break-even (#joins that amortize the write) is computable. */
  def smbProbe(): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val lif = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    def ordAt(k: Int): DataFrame = (0 until k).map(i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    def liAt(k: Int): DataFrame = (0 until k).map(i =>
      lif.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    for (k <- Seq(1, 3, 10)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_smb_x$k")
      val (to, tl) = (s"smb_orders_x$k", s"smb_lineitem_x$k")
      time(s"x$k bucketed write (one-time)") {
        ordAt(k).write.option("path", s"$dir/$to")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
        liAt(k).write.option("path", s"$dir/$tl")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
      }
      // also materialize the raw (unbucketed) layout so both joins read
      // comparable parquet rather than one side paying the union fan-out
      val (ro, rl) = (s"raw_orders_x$k", s"raw_lineitem_x$k")
      ordAt(k).write.option("path", s"$dir/$ro").saveAsTable(ro)
      liAt(k).write.option("path", s"$dir/$rl").saveAsTable(rl)
      def joined(l: DataFrame, o: DataFrame): DataFrame =
        l.hint("merge").join(o.hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      for (round <- 1 to 2) {
        time(s"x$k smb join (bucketed, run $round)")(
          joined(spark.table(tl), spark.table(to)).collect())
        time(s"x$k shuffle join (raw, run $round)")(
          joined(spark.table(rl), spark.table(ro)).collect())
      }
      val smbPlan = joined(spark.table(tl), spark.table(to))
        .queryExecution.executedPlan.toString
      // the agg after the join still exchanges on o_orderpriority; the
      // JOIN itself must be exchange-free on the bucketed layout
      println(s"[scratch] x$k smb exchanges: " +
        "Exchange ".r.findAllIn(smbPlan).size)
      Seq(to, tl, ro, rl).foreach(t => spark.sql(s"DROP TABLE $t"))
    }
    spark.stop()
  }

  /** q126 cost breakdown (`… Scratch q126`): splits the survivorship
    * first-run cost into its three stages — shingle-pair mining,
    * min-label propagation (with per-round wall-clock), and the final
    * survivor aggregate — at the bench's own settings (local[32],
    * shuffle.partitions=32, sf0.1) so the numbers are comparable to the
    * sweep. Decides whether the verdict's stretch "propagation fusion"
    * is worth code: if mining dominates, fusing the per-round join+agg
    * buys nothing. */
  def q126Probe(): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    time("warm docs scan")(docs.count())
    val pairs = time("stage 1: jaccardPairs mine+cache") {
      val p = Dedup.jaccardPairs(docs).cache(); p.count(); p
    }
    val labels = time("stage 2: dupClusters propagation") {
      val l = Dedup.dupClusters(pairs).cache(); l.count(); l
    }
    time("stage 3: survivorStats agg")(
      Dedup.survivorStats(
        labels.select(col("doc_id"), col("cluster_id")), docs).count())
    time("stage 2 again (loop cost, pairs hot)")(
      Dedup.dupClusters(pairs).count())
    spark.stop()
  }

  /** Skew-stress probe (`… Scratch skew`): makes the occupancy caps
    * ENGAGE and puts wall-clock on both sides. The graded scales never
    * trip the caps (DedupCapSpec proves they're no-ops there), so this
    * probe builds the hot key the caps exist for — a whale customer
    * owning h orders (q132's equi-block on custkey) and a boilerplate
    * 16-char prefix shared by h docs (q94's block key) — and times the
    * same pairing capped (512, the shipped default) vs uncapped. The
    * uncapped side must grow ~h² while the capped side stays flat
    * (the whale block is dropped, everything else is untouched). */
  def skewProbe(): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // --- q132 shape: whale customer with h concurrent-ish orders
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val span = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("fin"))
    def intervals(h: Int): DataFrame = {
      // first h orders re-owned by custkey -1 (the whale), rest as-is
      val w = Window.orderBy(col("o_orderkey"))
      val tagged = ord.withColumn("_rn", row_number().over(w))
        .withColumn("o_custkey",
          when(col("_rn") <= h, lit(-1L)).otherwise(col("o_custkey")))
        .drop("_rn")
      tagged.join(span, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("s"), col("fin").as("e"))
        .cache()
    }
    def overlapPairs(o: DataFrame, cap: Long): Long = {
      val occW = Window.partitionBy(col("o_custkey"))
      val c = o.withColumn("_occ", count(lit(1)).over(occW))
        .filter(col("_occ") <= cap).drop("_occ")
      c.as("a").join(c.as("b"),
          col("a.o_custkey") === col("b.o_custkey")
            && col("a.o_orderkey") < col("b.o_orderkey")
            && col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
        .count()
    }
    for (h <- Seq(2000, 8000)) {
      val o = intervals(h); o.count()
      val capped = time(s"q132 h=$h capped(512)")(
        overlapPairs(o, graft.functions.Dedup.MaxBucket))
      val open = time(s"q132 h=$h uncapped")(overlapPairs(o, Long.MaxValue))
      println(s"[scratch] q132 h=$h pairs capped=$capped uncapped=$open")
      o.unpersist()
    }

    // --- q94 shape: h docs sharing one 16-char prefix (boilerplate)
    val docs = Tables.documents(spark, sfDir)
    def hotDocs(h: Int): DataFrame = {
      val w = Window.orderBy(col("doc_id"))
      docs.withColumn("_rn", row_number().over(w))
        .withColumn("text",
          when(col("_rn") <= h,
            concat(lit("boilerplate head "), col("text")))
            .otherwise(col("text")))
        .drop("_rn").cache()
    }
    for (h <- Seq(500, 1000)) {
      val d = hotDocs(h); d.count()
      val capped = time(s"q94 h=$h capped(512)")(
        Dedup.fuzzyPairs(d).count())
      val open = time(s"q94 h=$h uncapped")(
        Dedup.fuzzyPairs(d, maxBlock = Int.MaxValue).count())
      println(s"[scratch] q94 h=$h pairs capped=$capped uncapped=$open")
      d.unpersist()
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skew")) { skewProbe(); return }
    if (args.headOption.contains("q126")) { q126Probe(); return }
    if (args.headOption.contains("plan")) {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s2.sparkContext.setLogLevel("ERROR")
      val plan = Sampling.q77PipelineFull(s2, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println("[scratch] exchanges: " +
        "Exchange ".r.findAllIn(plan).size + "\n" + plan.linesIterator
          .filter(_.contains("Exchange")).mkString("\n"))
      s2.stop(); return
    }
    // `… Scratch plans q148 q149 …`: per-query physical-plan audit —
    // exchange count + join/aggregate operator lines, the ".explain
    // until it's the plan you'd want" loop in greppable form.
    if (args.headOption.contains("plans")) {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
      s2.sparkContext.setLogLevel("ERROR")
      val sel = args.drop(1).toSet
      graft.SparkEntry.queries
        .filter { case (n, _) => sel.isEmpty || sel.exists(n.startsWith) }
        .toSeq.sortBy(_._1)
        .foreach { case (name, fn) =>
          val plan = fn(s2, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          println(s"[scratch] $name exchanges=" +
            "Exchange ".r.findAllIn(plan).size)
          plan.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Join")
              || l.contains("HashAggregate") || l.contains("Scan"))
            .foreach(l => println(s"[scratch]   ${l.trim.take(140)}"))
        }
      s2.stop(); return
    }
    if (args.headOption.contains("smb")) { smbProbe(); return }
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    // 10 shifted copies: same text distribution, distinct doc ids ⇒ the
    // dup-cluster sizes grow 10× (each text now appears ~10× as often),
    // the honest worst direction for pair expansion
    def at(k: Int): DataFrame = {
      val copies = (0 until k).map(i =>
        docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
      copies.reduce(_ unionByName _)
    }
    val em = Tables.embeddings(spark, sfDir)
    def emAt(k: Int): DataFrame =
      (0 until k).map(i =>
        em.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
    for (k <- Seq(1, 3, 10)) {
      val d = at(k)
      time(s"x$k count")(d.count())
      time(s"x$k q37 minhash")(Dedup.minHashPairs(d).count())
      time(s"x$k q38 simhash")(Dedup.simHashPairs(d).count())
      time(s"x$k q72 contamination")(Dedup.contaminationPairs(d).count())
      time(s"x$k q70 sample")(Sampling.stratifiedKeep(spark, d).count())
      time(s"x$k q67 emb lsh")(Dedup.embeddingLshPairs(emAt(k)).count())
      time(s"x$k q94 fuzzy")(Dedup.fuzzyPairs(d).count())
      time(s"x$k q115 semdedup")(
        Similarity.semanticDedupFrame(emAt(k), k = 16, lloydIters = 2,
          tau = 0.5).count())
      time(s"x$k q116 zorder") {
        val li = Tables.lineitem(spark, sfDir)
        val pts = (0 until k).map(_ => li.select(
          pmod(col("l_partkey"), lit(1024L)).as("x"),
          pmod(col("l_suppkey"), lit(1024L)).as("y"))).reduce(_ unionByName _)
        ZOrder.zorderLayout(pts, col("x"), col("y"), 32).count()
      }
      // round-6 operators. Orders are replicated with SHIFTED orderkeys
      // but the SAME custkeys, so per-customer order counts grow k× and
      // true overlap pairs grow ~k² — the honest worst direction for the
      // q132 equi-blocked pairing (mirrors the q36/q94 probes).
      val ord = Tables.orders(spark, sfDir)
      val lif = Tables.lineitem(spark, sfDir)
      def ordAt(k: Int): DataFrame = (0 until k).map(i =>
        ord.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_orderdate")))
        .reduce(_ unionByName _)
      def liAt(k: Int): DataFrame = (0 until k).map(i =>
        lif.select((col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
          col("l_shipdate")))
        .reduce(_ unionByName _)
      time(s"x$k q132 interval overlap") {
        val span = liAt(k).groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("fin"))
        val oo = ordAt(k).join(span, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").as("s"), col("fin").as("e"))
        oo.as("a").join(oo.as("b"),
            col("a.o_custkey") === col("b.o_custkey")
              && col("a.o_orderkey") < col("b.o_orderkey")
              && col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
          .count()
      }
      // bloom keys grow k×: past the m-sized design point the fp rate
      // saturates and the pre-filter degrades toward plain-join volume
      // (never wrong, just less selective) — the designed failure mode
      time(s"x$k q133 bloom prefilter") {
        val cust = Tables.customer(spark, sfDir)
          .filter(col("c_acctbal") > 8000.0)
        val qo = ordAt(k).join(cust,
          col("o_custkey") === col("c_custkey"), "left_semi")
        val bloom = qo.agg(BloomFilter.agg(col("o_orderkey")).as("bf"))
        liAt(k).join(broadcast(bloom))
          .filter(BloomFilter.mightContain(col("bf"), col("l_orderkey")))
          .count()
      }
      time(s"x$k q130 kll cube") {
        val ev = Tables.events(spark, sfDir)
        val evk = (0 until k).map(_ =>
          ev.select(col("event_type"), col("ts"), col("value")))
          .reduce(_ unionByName _)
        graft.cube.CubeManager.create(
          graft.cube.CubeConfig("probe", "events",
            Seq(graft.cube.FieldDim("etype", "event_type"),
              graft.cube.TimeDim("day", "ts", "day")),
            Seq(graft.cube.Measure("v", "value")),
            quantiles = Seq(graft.cube.Measure("dist", "value"))),
          evk).aggregates.count()
      }
      // rolling distinct: copies are shifted by 60 days each, so events,
      // distinct user-days AND window endpoints all grow k× — the corpus
      // collapse and the ×7 fan-out re-count should both scale linearly
      val ev6 = Tables.events(spark, sfDir)
      def evAt(k: Int): DataFrame = (0 until k).map(i =>
        ev6.select(col("user_id"),
          (col("ts") + expr(s"INTERVAL ${i * 60} DAYS")).as("ts")))
        .reduce(_ unionByName _)
      time(s"x$k q138 rolling distinct") {
        Rolling.endpoints(evAt(k).select(col("user_id"),
            (unix_timestamp(col("ts")).cast("double") / 86400)
              .cast("long").as("d")).distinct())
          .agg(countDistinct(col("user_id")).as("n")).count()
      }
      time(s"x$k q139 rolling hll") {
        Rolling.endpoints(evAt(k).select(col("user_id"),
            (unix_timestamp(col("ts")).cast("double") / 86400)
              .cast("long").as("d"))
          .groupBy(col("d")).agg(hll_sketch_agg(col("user_id")).as("sk")))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).count()
      }
      // quality audit: tables replicated with shifted keys (valid FKs
      // preserved) — every metric is an associative aggregate or a
      // keyed join, so the audit should scale linearly
      time(s"x$k q142 quality audit") {
        val ok = ordAt(k)
        val lk = liAt(k)
        val orphans = lk.join(ok, col("l_orderkey") === col("o_orderkey"),
            "left_outer")
          .agg(coalesce(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
              lit(0L)).as("orphans"),
            coalesce(sum(when(col("l_shipdate").cast("date")
                < col("o_orderdate").cast("date"), 1L).otherwise(0L)),
              lit(0L)).as("ship_before"))
        val dups = ok.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("dups"))
        orphans.crossJoin(dups).count()
      }
      time(s"x$k q131 grouped topk") {
        d.select(col("lang"), explode_outer(split(col("text"), " ")).as("w"))
          .filter(col("w").isNotNull && col("w") =!= "")
          .groupBy(col("lang"))
          .agg(CountMinSketch.approxTopK(col("w"), 10).as("top"))
          .count()
      }
    }
    spark.stop()
  }
}
