package graft.cube

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, Cast, Divide, EqualNullSafe, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Month, Multiply, NamedExpression, Quarter, Sequence, Subtract, TruncTimestamp, Year}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Complete, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.types.DecimalType

/** Workload-driven MV advisor — the designer-side complement of
  * [[CubeRewriteRule]]: given the queries a user actually runs, derive
  * the cube configs that would make them route. The rule answers "can
  * THIS cube serve THIS query"; the advisor inverts it: walk each
  * query's optimized plan with the same structural vocabulary the
  * rewrite matches on (grouping expressions → dims, `sum(dec2)` →
  * measures, `approx_count_distinct` → sketch measures,
  * `percentile_approx` → quantile measures, `min`/`max` → extremes,
  * dim-valued filter columns → dims, because a filter column must BE a
  * dimension for the cell-filter rewrite to fire), merge per source
  * path, and emit one [[CubeConfig]] per source covering every
  * analyzable aggregate in the workload.
  *
  * The contract that keeps this honest (pinned in CubeAdvisorSpec):
  * a recommended config, materialized and registered verbatim, makes
  * every covered workload query actually ROUTE. Queries the rewrite
  * could never serve (non-aggregates, unsupported leaves like native
  * `avg`, computed groupings the canonical match can't see) are
  * reported as uncovered, never silently half-covered.
  *
  * At 100 TB the advisor's second question matters as much as the
  * first: is the cube WORTH it? [[advise]] is purely structural (no
  * data access); [[adviseWithStats]] additionally runs ONE
  * approx-distinct aggregation per source to estimate the grouping
  * cardinality — a cube whose cell count approaches the source's row
  * count has no re-aggregation advantage (the same economics the
  * rewrite's cost refusal enforces at serve time, applied at design
  * time, where it saves the materialization cost too). */
object CubeAdvisor {

  /** One recommended cube: the source it covers, a registrable config,
    * which workload indices it serves, and (stats mode) the measured
    * grouping cardinality vs source rows. */
  final case class CubeRecommendation(
      sourcePath: String,
      config: CubeConfig,
      coveredQueries: Seq[Int],
      cells: Option[Long] = None,
      sourceRows: Option[Long] = None,
      rangeOnlyDims: Seq[String] = Nil) {
    def worthwhile: Boolean = (cells, sourceRows) match {
      case (Some(c), Some(r)) => r > 0 && c.toDouble / r <= 0.5
      case _ => true // structural mode: no evidence against
    }
  }

  /** One recommended ROLLING cube: a day-granularity TimeDim over the
    * source's time column plus the sketch/extreme partials the
    * trailing-window serves need. Materialize `config` verbatim
    * (create + register through [[CubeService]]) and every covered
    * query is served by [[CubeService.getRolling]]`(name, dayDim,
    * window, ...)` — the maintained-daily-partials form whose windowed
    * stage costs |days|·window one-row sketch merges instead of
    * re-shuffling the corpus per refresh. `windows` lists the distinct
    * trailing lengths observed (a serve-time parameter — one cube
    * serves them all). Distinct counts over INTEGRAL key columns come
    * back as EXACT bitmap partials (`exactDistinctOf` — bitmap union
    * is lossless, so the served curve equals the workload's own
    * re-count; the q208 dense-integer boundary); non-integral distinct
    * columns fall back to HLL estimates (`distinctOf`) and quantiles
    * to KLL estimates — there the advice IS the sketch trade, since
    * exact ranks cannot roll from pre-aggregated state and a lossy
    * bitmap cast would be silently wrong. Min/max stay exact. */
  final case class RollingCubeRecommendation(
      sourcePath: String,
      config: CubeConfig,
      dayDim: String,
      windows: Seq[Int],
      distinctOf: Seq[String],
      quantilesOf: Seq[(String, Double)],
      minOf: Seq[String],
      maxOf: Seq[String],
      sumOf: Seq[String],
      coveredQueries: Seq[Int],
      joinKeys: Option[(String, String, String, String)] = None,
      exactDistinctOf: Seq[String] = Nil,
      segmentBy: Seq[String] = Nil) {
    /** Set for a rolling-over-JOIN recommendation: materialize with
      * `CubeService.createJoinCube(joinConfig.get, left, right)` and
      * serve the covered curves via `getJoinRolling` — the day-dimmed
      * partials are maintained incrementally by the delta-join rule
      * like any other join MV. */
    def joinConfig: Option[JoinCubeConfig] = joinKeys.map {
      case (_, _, lk, rk) => JoinCubeConfig(config, lk, rk)
    }
  }

  /** One recommended JOIN MV: both source paths, the registrable
    * config (pass to `CubeService.createJoinCube` + side projections of
    * the two parquet paths, then `CubeCatalog.registerJoin`), and the
    * covered workload indices. */
  final case class JoinCubeRecommendation(
      leftPath: String, rightPath: String,
      config: JoinCubeConfig,
      coveredQueries: Seq[Int])

  /** One recommended CHAIN MV (3+ relations): the relation paths in
    * chain order, the registrable config (pass to
    * `CubeService.createChainCube` + narrow projections of the
    * relation paths, then `CubeCatalog.registerChain`), and the
    * covered workload indices. */
  final case class ChainCubeRecommendation(
      paths: Seq[String],
      config: ChainCubeConfig,
      coveredQueries: Seq[Int],
      cells: Option[Long] = None,
      sourceRows: Option[Long] = None) {
    /** The [[CubeRecommendation.worthwhile]] cell-count veto for
      * chains (stats mode): a chain cube whose grouping cardinality
      * approaches the JOINED row count has no re-aggregation
      * advantage — and a chain materialization is the most expensive
      * of the three families (it pays the full multi-join once plus
      * per-relation state), so a bad rec wastes the most. */
    def worthwhile: Boolean = (cells, sourceRows) match {
      case (Some(c), Some(r)) => r > 0 && c.toDouble / r <= 0.5
      case _ => true // structural mode: no evidence against
    }
  }

  /** What one analyzable aggregate needs from a cube. `join` is set
    * when the aggregate sits over an inner equi-join of two parquet
    * relations (leftPath, rightPath, leftKey, rightKey); `chain` when
    * it sits over a 3+-relation inner equi-join tree (relation paths
    * in chain order, linearized edges). */
  private final case class Needs(
      path: String,
      dims: Seq[Dimension],
      measures: Seq[Measure],
      sketches: Seq[Measure],
      quantiles: Seq[Measure],
      extremes: Seq[Measure],
      join: Option[(String, String, String, String)] = None,
      rangeDims: Seq[String] = Nil,
      bitmaps: Seq[Measure] = Nil,
      chain: Option[(Seq[String], Seq[(String, String)])] = None)

  /** What one trailing-window (rolling) query needs: the source, the
    * single time column its epoch-day derives from, the window length,
    * and the per-family measure columns. `outs` is the ORDERED mapping
    * of the aggregate's output columns (one entry per output attribute,
    * in output order) — the advisor ignores it; [[CubeRewriteRule]]'s
    * rolling route consumes it to rebind each original output to the
    * corresponding serve column. */
  private[cube] final case class RollingNeeds(
      path: String, tsCol: String, windowDays: Int,
      distinctOf: Seq[String], quantilesOf: Seq[(String, Double)],
      minOf: Seq[String], maxOf: Seq[String], sumOf: Seq[String],
      join: Option[(String, String, String, String)] = None,
      exactDistinctOf: Seq[String] = Nil,
      segments: Seq[String] = Nil,
      outs: Seq[RollOut] = Nil,
      filters: Seq[(String, Seq[Literal])] = Nil,
      // set when the curve runs over a registrable 3+-relation chain:
      // `path` is then the order-canonical chain key and the rewrite
      // matches it against registered CHAIN MVs; the linearized
      // (paths, edges) feed the advisor's chain fold
      chain: Option[(Seq[String], Seq[(String, String)])] = None)

  /** One output column of a recognized rolling aggregate: the exploded
    * day key, a segment grouping, or an aggregate leaf.
    * Leaf families: "xdistinct" (exact bitmap), "distinct" (HLL),
    * "quantile" (KLL, `pct` set), "min", "max", "sum". */
  private[cube] sealed trait RollOut
  private[cube] object RollOut {
    case object Day extends RollOut
    final case class Seg(srcCol: String) extends RollOut
    /** `outerCast`: the workload applied its own output Cast on top of
      * the aggregate (e.g. `sum(dec).cast(double)`) — the rewrite
      * reproduces that cast on the served value, which is identical
      * because the pre-cast values are equal. */
    final case class Leaf(family: String, srcCol: String,
        pct: Double = 0.0, outerCast: Boolean = false) extends RollOut
  }

  /** One recommended RETENTION cube: a day-dimmed bitmap cube whose
    * maintained daily partials serve the workload's period-over-period
    * matrix through [[CubeService.getRetention]] — active / retained /
    * churned / new, all EXACT (bitmap set algebra). One day-granularity
    * cube serves EVERY period width in `periods` (getRetention
    * re-buckets days per call). A non-integral id column gets a
    * `dictBitmaps` entry instead of a refusal — the dictionary path
    * keeps the matrix exact for string keys. */
  /** `join` present = the cohort workload ran over an INNER EQUI-JOIN:
    * materialize as `createJoinCube(JoinCubeConfig(config, leftKey,
    * rightKey), left, right)` and serve with the getJoinRetention /
    * getJoinCumulative verbs; absent = the single-table createCube /
    * getRetention pairing. */
  final case class RetentionRecommendation(
      sourcePath: String,
      config: CubeConfig,
      dayDim: String,
      bitmapId: String,
      periods: Seq[Int],
      coveredQueries: Seq[Int],
      segmentBy: Seq[String] = Nil,
      join: Option[(String, String, String, String)] = None)

  /** One recommended FUNNEL cube: a day+step-dimmed bitmap cube wired
    * to [[CubeService.getFunnel]] — the step column dims the cube so
    * per-(period, step) bitmaps exist for the cascade, and the id
    * column gets exact bitmap partials (dictionary-encoded for
    * non-integral keys). `chains` records each covered query's step
    * sequence (the cube itself serves ANY chain over the step
    * dimension's values — the config does not bake the chain in). */
  final case class FunnelRecommendation(
      sourcePath: String,
      config: CubeConfig,
      dayDim: String,
      stepDim: String,
      bitmapId: String,
      chains: Seq[Seq[String]],
      periods: Seq[Int],
      coveredQueries: Seq[Int],
      join: Option[(String, String, String, String)] = None)

  /** What one recognized retention query needs: the source, the time
    * column its period derives from, the distinct-counted id column,
    * the period width in days, and any segment columns the matrix
    * partitions by. */
  /** `outs` is the ordered output map ([[RollOut]] reused with Day
    * standing for the PERIOD key): the rewrite's retention route
    * consumes it; the advisor ignores it. `kind` names the matrix
    * column the plan computes — "retained" (inner self-join),
    * "churned" (anti-join against the FOLLOWING period), "new_ids"
    * (anti-join against the PRECEDING), "cumulative" (the prefix
    * union), "first_seen" (min-period groups — Day stands for the
    * FIRST period) or "engagement" (the fixed-window activity
    * histogram — Day stands for the ACTIVE-PERIOD COUNT bucket and
    * `window` carries the inclusive epoch-day bounds) — all served
    * from the same day-dimmed bitmap cube. */
  private[cube] final case class RetentionNeeds(
      path: String, tsCol: String, idCol: String, periodDays: Int,
      integralId: Boolean, segments: Seq[String] = Nil,
      outs: Seq[RollOut] = Nil, kind: String = "retained",
      filters: Seq[(String, Seq[Literal])] = Nil,
      join: Option[(String, String, String, String)] = None,
      window: Option[(Long, Long)] = None,
      // Some((granularity, offset)) when the plan buckets by a
      // calendar ORDINAL (year*12+month etc.) instead of day
      // multiples — the serve reproduces the user's exact ordinals
      calendar: Option[(String, Long)] = None,
      // set when the cohort ran over a registrable 3+-relation chain
      // (`path` is then the order-canonical chain key; see
      // [[RollingNeeds.chain]])
      chain: Option[(Seq[String], Seq[(String, String)])] = None)

  /** One recommended STORAGE LAYOUT: the consumer of
    * [[CubeRecommendation.rangeOnlyDims]]. A column promoted into the
    * cube config ONLY because of a range predicate is usually the
    * wrong dimension (near-source cardinality cells) but exactly the
    * right CLUSTERING key: laying the source out ordered by it (one
    * column → range-partition + sort; two → Z-order, which gives BOTH
    * columns tight per-file min/max) turns the range filter into
    * parquet footer skipping — the scan reads only the files whose
    * [min,max] intersects the predicate. Apply with [[applyLayout]];
    * the honesty pin (CubeAdvisorSpec) measures the skip rate on the
    * rewritten files. */
  final case class LayoutRecommendation(
      sourcePath: String,
      columns: Seq[String],
      coveredQueries: Seq[Int])

  /** Materialize a [[LayoutRecommendation]]: rewrite the source
    * clustered by the recommended column(s) into `destDir`. One column
    * → range-partitioned, sorted within files; two columns → Z-order
    * (both get tight per-file bounds). More than two: cluster on the
    * first two (the Z-curve's benefit decays with dimensionality). */
  def applyLayout(spark: org.apache.spark.sql.SparkSession,
      rec: LayoutRecommendation, destDir: String,
      numFiles: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(rec.sourcePath)
    val laid = rec.columns match {
      case Seq(c) =>
        df.repartitionByRange(numFiles, col(c)).sortWithinPartitions(col(c))
      case c1 +: c2 +: _ =>
        graft.functions.ZOrder.zorderLayout(df,
          col(c1).cast("long"), col(c2).cast("long"), numFiles)
      case _ => df
    }
    laid.write.mode("overwrite").parquet(destDir)
  }

  /** The advisor's full answer: single-table cube recommendations,
    * join-MV recommendations, rolling-cube recommendations, storage
    * layouts for range-only filter columns, and the workload indices
    * nothing could cover. */
  final case class Advice(cubes: Seq[CubeRecommendation],
      joinCubes: Seq[JoinCubeRecommendation], uncovered: Seq[Int],
      rolling: Seq[RollingCubeRecommendation] = Nil,
      layouts: Seq[LayoutRecommendation] = Nil,
      retention: Seq[RetentionRecommendation] = Nil,
      funnel: Seq[FunnelRecommendation] = Nil,
      chains: Seq[ChainCubeRecommendation] = Nil)

  /** Presentation layers a logged dashboard query carries ABOVE the
    * metric — a total ORDER BY and/or LIMIT — peeled before analysis:
    * they change how rows are shown, not what cube serves them (and
    * the routing rule itself fires on the inner Aggregate regardless,
    * so recognition and serving stay consistent). Without this, every
    * `adviseSql` call on real dashboard text (which always ends in
    * ORDER BY) reported the workload uncovered. */
  private def peelPresentation(p: LogicalPlan): LogicalPlan = p match {
    case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
      peelPresentation(s.child)
    case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit =>
      peelPresentation(l.child)
    case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit =>
      peelPresentation(l.child)
    case _ => p
  }

  /** Decompose a COMPOSITE dashboard plan — a pure combination shell
    * (projections, filters, joins, unions, sorts, limits) over several
    * Aggregate metrics, the ratio/share/delta form real dashboards log
    * — into those metric sub-plans. The rewrite rule serves each
    * sub-aggregate IN PLACE (it transforms every Aggregate node), so
    * the advisor must recognize the same components or composite
    * queries read as uncovered. Returns the plan whole when it IS an
    * aggregate-rooted metric, when any shell leaf is NOT under an
    * Aggregate (an enrichment join against raw rows — no cube removes
    * that scan, so decomposed "coverage" would be dishonest), or when
    * the shell carries a node outside the combination vocabulary (a
    * Window/Generate shell computes, not combines). */
  private def componentsOf(p: LogicalPlan): Seq[LogicalPlan] = p match {
    case _: Aggregate => Seq(p)
    case _ =>
      var ok = true
      def walk(q: LogicalPlan): Seq[LogicalPlan] = q match {
        case a: Aggregate => Seq(a)
        case _: Project | _: Filter | _: Join |
            _: org.apache.spark.sql.catalyst.plans.logical.Union |
            _: org.apache.spark.sql.catalyst.plans.logical.Sort |
            _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit |
            _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit |
            _: org.apache.spark.sql.catalyst.plans.logical
              .SubqueryAlias =>
          q.children.flatMap(walk)
        case _ => ok = false; Nil
      }
      val cs = walk(p)
      if (ok && cs.nonEmpty) cs else Seq(p)
  }

  /** Dimension-list merge shared by the per-source config merge and
    * the chain-rec union: dedup by binding identity, then COLLAPSE
    * nested time buckets on one column to the FINEST — the rewrite's
    * time-hierarchy binding serves every nesting coarser granularity
    * by re-truncating the finer attribute, so a workload mixing day
    * and month views needs ONE day dim (a day × month dim pair would
    * multiply the advised cube's cells for nothing). Non-nesting
    * mixes (week + month) keep both dims: collapsing would break the
    * route-on-registration contract. */
  private def mergeDims(raw: Seq[Dimension]): Seq[Dimension] = {
    val dims0 = raw.distinctBy {
      case FieldDim(_, p) => ("f", p, "")
      case TimeDim(_, p, g) => ("t", p, g)
      case ExprDim(_, s) => ("e", s, "")
    }
    val fineness = Seq("minute", "hour", "day", "week", "month",
      "quarter", "year")
    dims0.flatMap {
      case td @ TimeDim(_, p, _) =>
        val same = dims0.collect {
          case t @ TimeDim(_, `p`, _) => t }
        val finest = same.minBy(t => fineness.indexOf(t.granularity))
        val servable = same.forall(t =>
          t.granularity == finest.granularity ||
            CubeRewriteRule.coarserThan(finest.granularity)
              .contains(t.granularity))
        if (!servable) Some(td) // keep every bucket, unchanged
        else if (td.id == finest.id) Some(finest)
        else None
      case d => Some(d)
    }
  }

  /** Union of two cube configs over the SAME source (the chain-rec
    * merge): every partial family concatenates and dedups by the
    * source column it binds (first id wins — routing binds dims and
    * measures by defining expression, not by id). */
  private def unionConfig(a: CubeConfig, b: CubeConfig): CubeConfig =
    a.copy(
      dims = mergeDims(a.dims ++ b.dims),
      measures = (a.measures ++ b.measures).distinctBy(_.path),
      sketches = (a.sketches ++ b.sketches).distinctBy(_.path),
      quantiles = (a.quantiles ++ b.quantiles).distinctBy(_.path),
      extremes = (a.extremes ++ b.extremes).distinctBy(_.path),
      freq = (a.freq ++ b.freq).distinctBy(_.path),
      bitmaps = (a.bitmaps ++ b.bitmaps).distinctBy(_.path),
      dictBitmaps = (a.dictBitmaps ++ b.dictBitmaps).distinctBy(_.path),
      weighted = (a.weighted ++ b.weighted)
        .distinctBy(w => (w.idPath, w.weightPath)))

  /** Structural advice: no data is read. */
  def advise(workload: Seq[DataFrame],
      namePrefix: String = "advised"): Advice = {
    val plans =
      workload.map(df => peelPresentation(df.queryExecution.optimizedPlan))
    // composite shells decompose into their metric components (see
    // [[componentsOf]]); a single-metric query is its own component.
    // Each component is claimed by at most ONE family, in the same
    // precedence order the single-metric chain always used.
    val comps: Vector[(Int, LogicalPlan)] = plans.zipWithIndex.flatMap {
      case (p, i) => componentsOf(p).map(i -> _)
    }.toVector
    val claimed = Array.fill(comps.size)(false)
    def claim[T](f: LogicalPlan => Option[T]): Seq[(Int, T)] =
      comps.zipWithIndex.flatMap { case ((qi, p), ci) =>
        if (claimed(ci)) None
        else f(p).map { t => claimed(ci) = true; qi -> t }
      }
    // rolling shapes first: the generic matcher would refuse them
    // (count(DISTINCT) over the exploded window is unservable from
    // cells) and report the workload's daily-curve queries uncovered
    val rollingHits: Seq[(Int, RollingNeeds)] = claim(analyzeRolling)
    // retention shapes next: same reasoning — an aggregate over the
    // distinct-pair self-join has no single source for the generic
    // matcher, and the defining cohort query would land uncovered
    val retentionHits: Seq[(Int, RetentionNeeds)] =
      claim(analyzeRetention)
    // cumulative-distinct shapes fold into the SAME recommendation
    // family: the day-dimmed bitmap cube that serves getRetention
    // serves getCumulative too (both walk per-period bitmap unions)
    val cumulativeHits: Seq[(Int, RetentionNeeds)] =
      claim(analyzeCumulative)
    // funnel shapes next among the cohort families: the min-join
    // conversion chain is aggregates over joins of aggregates — the
    // generic matcher refuses the whole tree and the defining funnel
    // query would land uncovered
    val funnelHits: Seq[(Int, FunnelNeeds)] = claim(analyzeFunnel)
    // first-seen ("new users per period") and engagement-histogram
    // shapes fold into the SAME day-dimmed bitmap-cube family: the
    // cube that serves getRetention serves getGrowthAccounting's
    // new_ids walk and getEngagement's k-count partition too — and
    // both raw plans (aggregates over aggregates) would otherwise
    // land uncovered at the generic matcher
    val firstSeenHits: Seq[(Int, RetentionNeeds)] =
      claim(analyzeFirstSeen)
    val engagementHits: Seq[(Int, RetentionNeeds)] =
      claim(analyzeEngagement)
    // growth accounting's fourth cell — the three-join resurrected
    // plan folds into the same day-dimmed bitmap-cube family (the
    // serve is an ANDNOT-prefix walk over the same period bitmaps)
    val resurrectedHits: Seq[(Int, RetentionNeeds)] =
      claim(analyzeResurrected)
    // cohort-VALUE (LTV) shapes fold into the SAME day-dimmed cube
    // family: the retention rec's cube gains a `weighted` measure so
    // one cube serves the whole growth dashboard — counts from the
    // bitmaps, values from the weight maps
    val cohortValueHits: Seq[(Int, CohortValueNeeds)] =
      claim(analyzeCohortValue)
    // the count-distinct cohort heatmap (every BI tool's retention
    // triangle) folds into the SAME day-dimmed bitmap-cube family:
    // the cube that serves getRetention serves getCohortMatrix's
    // prefix-ANDNOT + AND-cardinality walk from the same id bitmaps
    val cohortMatrixHits: Seq[(Int, CohortMatrixNeeds)] =
      claim(analyzeCohortMatrix)
    // the raw MRR-bridge terms (q297's vocabulary) fold into the SAME
    // day-dimmed weighted cube family: map-served terms add the
    // weighted measure, measure-served revenue adds a plain decimal
    // measure, and the id-guarded spine rides the id bitmap
    val valueBridgeHits: Seq[(Int, ValueBridgeNeeds)] =
      claim(analyzeValueBridge)
    // LEADERBOARD shapes (q295's vocabulary) fold in too: the board's
    // top node is a Filter-over-Window (componentsOf keeps the whole
    // plan as one component), so the claim peels the user's output
    // Project before matching; the serve needs the same weighted
    // measure the LTV family recommends
    val topSpenderHits: Seq[(Int, TopSpendersNeeds)] = claim {
      case pr: Project => pr.child match {
        case f: Filter => analyzeTopSpenders(f)
        case _ => None
      }
      case f: Filter => analyzeTopSpenders(f)
      case _ => None
    }
    val analyzed: Seq[(Int, Option[Needs])] =
      comps.zipWithIndex.collect {
        case ((qi, p), ci) if !claimed(ci) => qi -> analyze(p)
      }
    // ALL-or-nothing per query: the honesty contract promises a
    // covered query ROUTES once the recs materialize — a composite
    // with one unservable component routes only partially, so the
    // whole query reports uncovered and its other components' hits
    // are dropped rather than half-claimed
    val badQ: Set[Int] = analyzed.collect { case (qi, None) => qi }.toSet
    def keep[T](hs: Seq[(Int, T)]): Seq[(Int, T)] =
      hs.filterNot(h => badQ(h._1))
    val funnelRecs = keep(funnelHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol, h._2.stepCol))
      .toSeq.sortBy(g => (g._1._1, g._1._2, g._1._3, g._1._4))
      .zipWithIndex.map {
        case (((path, tsCol, idCol, stepCol), hits), k) =>
          val dayDim = s"${tsCol}_day"
          val bmId = s"${idCol}_xd"
          val m = Seq(Measure(bmId, idCol))
          val integralId = hits.head._2.integralId
          FunnelRecommendation(path,
            CubeConfig(s"${namePrefix}_funnel_$k", path,
              // the step column dims the cube so the cascade finds a
              // per-(period, step) bitmap cell for every chain stage;
              // serving is chain-agnostic — one cube covers every
              // funnel over this (source, time, id, step) vocabulary
              dims = Seq(FieldDim(stepCol, stepCol),
                TimeDim(dayDim, tsCol, "day")),
              measures = Nil,
              bitmaps = if (integralId) m else Nil,
              dictBitmaps = if (integralId) Nil else m),
            dayDim, stepCol, bmId,
            chains = hits.map(_._2.steps).distinct,
            periods = hits.map(_._2.periodDays).distinct.sorted,
            coveredQueries = hits.map(_._1).distinct.sorted,
            join = hits.head._2.join)
      }
    val retGrouped = keep(retentionHits ++ cumulativeHits ++
        firstSeenHits ++ engagementHits ++ resurrectedHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol, h._2.segments,
        h._2.filters.map(_._1).distinct.sorted))
    // cohort-value hits share the group key (they carry no segments);
    // a value-only group still gets a rec — the weighted cube serves
    // it alone
    val cvGrouped = keep(cohortValueHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol,
        Seq.empty[String], h._2.filters.map(_._1).distinct.sorted))
    val cmGrouped = keep(cohortMatrixHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol,
        Seq.empty[String], h._2.filters.map(_._1).distinct.sorted))
    val vbGrouped = keep(valueBridgeHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol,
        Seq.empty[String], h._2.filters.map(_._1).distinct.sorted))
    val tsGrouped = keep(topSpenderHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.idCol,
        h._2.segments.map(_._2).distinct.sorted,
        h._2.filters.map(_._1).distinct.sorted))
    // which cube family serves a bridge hit (mirrors the serve
    // selection in CubeRewrite.buildValueBridgeServe)
    def vbMaps(n: ValueBridgeNeeds): Boolean = n.kind match {
      case "new" | "anti" | "resurrected" | "expcon" => true
      case "revenue" => n.idFiltered
      case _ => false // periods: rides the id bitmap (or needs nothing)
    }
    def vbMeasure(n: ValueBridgeNeeds): Boolean =
      n.kind == "revenue" && !n.idFiltered
    // a cohort group over a 3+-relation CHAIN (path = canonical chain
    // key, chain vocabulary on the hits) folds into a
    // ChainCubeRecommendation below instead of a retention rec whose
    // sourcePath is no parquet path — the chain MV maintains the same
    // day-dimmed bitmap partials, so ONE chain cube serves the
    // rollups and the cohort walks
    val retentionRecsE = (retGrouped.keySet ++ cvGrouped.keySet ++
        cmGrouped.keySet ++ vbGrouped.keySet ++ tsGrouped.keySet)
      .toSeq.sortBy(g => (g._1, g._2, g._3,
        g._4.mkString(","), g._5.mkString(",")))
      .zipWithIndex.map {
        case (key @ (path, tsCol, idCol, segments, filterCols), k) =>
          val hits = retGrouped.getOrElse(key, Nil)
          val cvs = cvGrouped.getOrElse(key, Nil)
          val cms = cmGrouped.getOrElse(key, Nil)
          val vbs = vbGrouped.getOrElse(key, Nil)
          val tss = tsGrouped.getOrElse(key, Nil)
          val dayDim = s"${tsCol}_day"
          val bmId = s"${idCol}_xd"
          val m = Seq(Measure(bmId, idCol))
          // all families carry the id's type off the same source
          // column; a value-only group reads it from the cv/vb hits (a
          // non-integral group's rec takes the dictionary path, which
          // the weighted measure then rides — requireIntegralWeighted's
          // create-time contract)
          val integralId = hits.headOption.map(_._2.integralId)
            .orElse(cvs.headOption.map(_._2.integralId))
            .orElse(cms.headOption.map(_._2.integralId))
            .orElse(vbs.headOption.map(_._2.integralId))
            .getOrElse(tss.head._2.integralId)
          // a bridge group keyed by no id (direct revenue / spine over
          // ALL rows) dims the day only — no id column exists to bitmap
          val hasId = idCol.nonEmpty
          val rec = RetentionRecommendation(path,
            CubeConfig(s"${namePrefix}_retention_$k", path,
              // segment columns dim the cube so the period bitmaps
              // subdivide per segment cell (getRetention(segmentBy));
              // FILTER columns dim it so the routed serve can restrict
              // cells to the filtered values
              dims = (segments ++ filterCols).distinct
                .map(c => FieldDim(c, c)) :+
                TimeDim(dayDim, tsCol, "day"),
              // measure-served bridge revenue (null-id rows included)
              // takes a plain decimal measure
              measures = vbs.filter(h => vbMeasure(h._2))
                .map(_._2.weightCol).distinct.sorted
                .map(wc => Measure(s"${wc}_m", wc)),
              // non-integral ids take the dictionary path (exact for
              // any key type) instead of the pre-dictionary refusal
              bitmaps = if (hasId && integralId) m else Nil,
              dictBitmaps = if (hasId && !integralId) m else Nil,
              // one weighted measure per distinct LTV weight column —
              // the cohort-value / bridge / leaderboard serves'
              // per-id additive partials
              weighted = (cvs.map(_._2.weightCol) ++
                vbs.filter(h => vbMaps(h._2)).map(_._2.weightCol) ++
                tss.map(_._2.weightCol))
                .distinct.sorted
                .map(wc => WeightedMeasure(s"${wc}_w", idCol, wc))),
            dayDim, bmId,
            periods = (hits.map(_._2.periodDays) ++
              cvs.map(_._2.periodDays) ++ cms.map(_._2.periodDays) ++
              vbs.map(_._2.periodDays) ++
              tss.map(_._2.periodDays))
              .distinct.sorted,
            coveredQueries = (hits.map(_._1) ++ cvs.map(_._1) ++
              cms.map(_._1) ++
              vbs.map(_._1) ++ tss.map(_._1)).distinct.sorted,
            segmentBy = segments,
            // path grouping keys a JOIN workload by its composite
            // registration identity, so one group is one join — the
            // rec carries the join info for createJoinCube
            join = hits.headOption.map(_._2.join)
              .orElse(cvs.headOption.map(_._2.join))
              .orElse(cms.headOption.map(_._2.join))
              .orElse(vbs.headOption.map(_._2.join))
              .getOrElse(tss.head._2.join))
          hits.headOption.flatMap(_._2.chain) match {
            case Some((cpaths, cedges)) =>
              Right(ChainCubeRecommendation(cpaths,
                ChainCubeConfig(rec.config, cedges),
                rec.coveredQueries))
            case None => Left(rec)
          }
      }
    val retentionRecs = retentionRecsE.collect { case Left(r) => r }
    val chainCohortRecs = retentionRecsE.collect { case Right(r) => r }
    val rollingRecsE = keep(rollingHits)
      .groupBy(h => (h._2.path, h._2.tsCol, h._2.segments,
        h._2.filters.map(_._1).distinct.sorted))
      .toSeq.sortBy(g => (g._1._1, g._1._2, g._1._3.mkString(","),
        g._1._4.mkString(",")))
      .zipWithIndex.map {
        case (((path, tsCol, segments, filterCols), hits), k) =>
          val needs = hits.map(_._2)
          val dayDim = s"${tsCol}_day"
          // non-integral count(DISTINCT) columns take the DICTIONARY
          // path (exact for any key type) instead of the HLL sketch —
          // the workload asked for an exact count, and since the
          // dictionary family exists recommending an estimator for it
          // would silently change answers (the retention/funnel recs'
          // discipline, applied to rolling). Explicitly-approx
          // workloads (approx_count_distinct) still land in sketches
          // via the generic matcher.
          val dOf = needs.flatMap(_.distinctOf).distinct
          val xdOf = needs.flatMap(_.exactDistinctOf).distinct
          val qOf = needs.flatMap(_.quantilesOf).distinct
          val mnOf = needs.flatMap(_.minOf).distinct
          val mxOf = needs.flatMap(_.maxOf).distinct
          val sOf = needs.flatMap(_.sumOf).distinct
          val rec = RollingCubeRecommendation(path,
            CubeConfig(s"${namePrefix}_rolling_$k", path,
              // segment columns dim the cube so the daily partials
              // subdivide per segment cell (getRolling(segmentBy));
              // FILTER columns dim it so the routed serve can
              // restrict cells to the filtered values
              dims = (segments ++ filterCols).distinct
                .map(c => FieldDim(c, c)) :+
                TimeDim(dayDim, tsCol, "day"),
              measures = sOf.map(c => Measure(s"${c}_sum", c)),
              sketches = Nil,
              quantiles = qOf.map(_._1).distinct
                .map(c => Measure(s"${c}_dist", c)),
              extremes = (mnOf ++ mxOf).distinct
                .map(c => Measure(s"${c}_x", c)),
              bitmaps = xdOf.map(c => Measure(s"${c}_xd", c)),
              dictBitmaps = dOf.map(c => Measure(s"${c}_xd", c))),
            dayDim,
            windows = needs.map(_.windowDays).distinct.sorted,
            distinctOf = Nil,
            quantilesOf = qOf.map { case (c, p) => (s"${c}_dist", p) },
            minOf = mnOf.map(c => s"${c}_x"),
            maxOf = mxOf.map(c => s"${c}_x"),
            sumOf = sOf.map(c => s"${c}_sum"),
            coveredQueries = hits.map(_._1).distinct.sorted,
            joinKeys = needs.head.join,
            exactDistinctOf = (xdOf ++ dOf).map(c => s"${c}_xd"),
            segmentBy = segments)
          needs.head.chain match {
            case Some((cpaths, cedges)) =>
              Right(ChainCubeRecommendation(cpaths,
                ChainCubeConfig(rec.config, cedges),
                rec.coveredQueries))
            case None => Left(rec)
          }
      }
    val rollingRecs = rollingRecsE.collect { case Left(r) => r }
    val chainRollingRecs = rollingRecsE.collect { case Right(r) => r }
    val uncovered = badQ.toSeq.distinct.sorted
    val bySource = analyzed
      .collect { case (i, Some(n)) if !badQ(i) => (i, n) }
      .groupBy(_._2.path)
    def mergedConfig(name: String, source: String,
        entries: Seq[(Int, Needs)]): CubeConfig = {
      def mergeMeasures(get: Needs => Seq[Measure]): Seq[Measure] =
        entries.flatMap(e => get(e._2)).distinctBy(_.path)
      val dims = mergeDims(entries.flatMap(_._2.dims))
      CubeConfig(name, source, dims,
        measures = mergeMeasures(_.measures),
        sketches = mergeMeasures(_.sketches),
        quantiles = mergeMeasures(_.quantiles),
        extremes = mergeMeasures(_.extremes),
        bitmaps = mergeMeasures(_.bitmaps))
    }
    var singles = Vector.empty[CubeRecommendation]
    var joins = Vector.empty[JoinCubeRecommendation]
    var chainRecs = Vector.empty[ChainCubeRecommendation]
    bySource.toSeq.sortBy(_._1).zipWithIndex.foreach {
      case ((path, entries), k) =>
        (entries.head._2.chain, entries.head._2.join) match {
          case (Some((paths, edges)), _) =>
            chainRecs :+= ChainCubeRecommendation(paths,
              ChainCubeConfig(
                mergedConfig(s"${namePrefix}_chain_$k", path, entries),
                edges),
              entries.map(_._1).distinct)
          case (None, None) =>
            singles :+= CubeRecommendation(path,
              mergedConfig(s"${namePrefix}_$k", path, entries),
              entries.map(_._1).distinct,
              rangeOnlyDims = entries.flatMap(_._2.rangeDims).distinct)
          case (None, Some((lp, rp, lk, rk))) =>
            joins :+= JoinCubeRecommendation(lp, rp,
              JoinCubeConfig(
                mergedConfig(s"${namePrefix}_join_$k", path, entries),
                leftKey = lk, rightKey = rk),
              entries.map(_._1).distinct)
        }
    }
    // layout advice rides the range-only flags: those columns entered
    // the config under protest (no grouping or point predicate vouches
    // for them) — the right home for a range predicate is the storage
    // order, not a dimension
    val layouts = singles.filter(_.rangeOnlyDims.nonEmpty).map(r =>
      LayoutRecommendation(r.sourcePath, r.rangeOnlyDims.take(2),
        r.coveredQueries))
    // ONE rec per chain identity: cohort folds (retention / rolling
    // groups over a chain) union into the generic rollup rec for the
    // same relations+edges — the first rec's linearization carries
    // (any valid one serves every form; routing matches multisets),
    // configs union by binding identity, covered queries union
    val mergedChainRecs =
      (chainRecs ++ chainCohortRecs ++ chainRollingRecs)
        .groupBy(r => chainKey(r.paths, r.config.edges))
        .toSeq.sortBy(_._1).map { case (_, rs) =>
          rs.reduce { (a, b) =>
            a.copy(
              config = ChainCubeConfig(
                unionConfig(a.config.cube, b.config.cube),
                a.config.edges),
              coveredQueries =
                (a.coveredQueries ++ b.coveredQueries).distinct.sorted)
          }
        }.toVector
    Advice(singles, joins, uncovered, rollingRecs, layouts,
      retentionRecs, funnelRecs, mergedChainRecs)
  }

  /** SQL-TEXT advisor surface: the workload as the query strings a
    * dashboard's log actually contains, planned through `spark.sql`
    * against the session catalog (register the parquet tables as views
    * first — the q160 SQL-text routing discipline applies on the serve
    * side of the same loop). Same analysis, same honesty contract:
    * text → optimized plan → the structural vocabulary above. */
  def adviseSql(spark: org.apache.spark.sql.SparkSession,
      workload: Seq[String], namePrefix: String = "advised"): Advice =
    advise(workload.map(spark.sql), namePrefix)

  /** Structural advice + one cardinality probe per source: measures
    * |distinct dim tuples| (approx, the cube's cell count) and |rows|,
    * so [[CubeRecommendation.worthwhile]] can veto cubes with no
    * re-aggregation advantage BEFORE anything is materialized. */
  def adviseWithStats(spark: org.apache.spark.sql.SparkSession,
      workload: Seq[DataFrame], namePrefix: String = "advised"): Advice = {
    import org.apache.spark.sql.functions.{approx_count_distinct, count, lit, struct}
    val a = advise(workload, namePrefix)
    val measured = a.cubes.map { rec =>
      val src = spark.read.parquet(rec.sourcePath)
      val dimCols = rec.config.dims.map(_.expr)
      val row = src.agg(
        approx_count_distinct(struct(dimCols: _*)).as("cells"),
        count(lit(1)).as("rows")).head()
      rec.copy(cells = Some(row.getLong(0)), sourceRows = Some(row.getLong(1)))
    }
    // join MVs keep structural-only verdicts in v1: their cell count
    // needs the join run once, which is the cost stats mode exists to
    // avoid — callers who want it can probe the recommendation's
    // dims over the joined frame themselves.
    //
    // CHAIN MVs opt INTO the probe despite the same objection: a chain
    // materialization is the most expensive of the three families (the
    // full multi-join once, plus per-relation state), so a bad chain
    // rec wastes the most — one count-only pass over the joined frame
    // (nothing materialized) is the cheap insurance. The probe joins
    // the rec's relations along its own edges and measures
    // |distinct dim tuples| vs |joined rows| for
    // [[ChainCubeRecommendation.worthwhile]].
    val measuredChains = a.chains.map { rec =>
      val rels = rec.paths.map(spark.read.parquet(_))
      val joined = rels.tail.zip(rec.config.edges)
        .foldLeft(rels.head) { case (acc, (r, (lc, rc))) =>
          acc.join(r, org.apache.spark.sql.functions.col(lc) ===
            org.apache.spark.sql.functions.col(rc))
        }
      val dimCols = rec.config.cube.dims.map(_.expr)
      val row = joined.agg(
        approx_count_distinct(struct(dimCols: _*)).as("cells"),
        count(lit(1)).as("rows")).head()
      rec.copy(cells = Some(row.getLong(0)),
        sourceRows = Some(row.getLong(1)))
    }
    a.copy(cubes = measured, chains = measuredChains)
  }

  // ---- rolling-shape analysis ------------------------------------------

  /** Recognize the trailing-window-over-daily-values shape (the
    * q138/q159 family, [[graft.functions.Rolling.endpoints]]'s lowered
    * plan): an aggregate grouped on the output of
    * `explode(sequence(d, d + L-1))` over a per-day frame, semi-joined
    * back to the observed days — i.e. "for every day, <aggregate> over
    * the trailing L days". The generic matcher refuses these
    * (count(DISTINCT) over the exploded window is unservable from
    * cells); the right advice is a DAY-DIMMED cube whose sketch
    * partials [[CubeService.getRolling]] merges per endpoint:
    * distinct → HLL, percentile → KLL, min/max → exact extreme
    * partials. Refusals keep the honesty contract: a filtered curve, a
    * multi-column day derivation, an aggregate family that does not
    * roll (sum/avg of the window re-counts rows the partials cannot
    * attribute), or a pre-deduped percentile (dedup changes the
    * distribution) all return None rather than advising a cube that
    * serves a different curve. Day-bucket equivalence (the workload's
    * epoch-day arithmetic vs the cube's calendar-day dimension) holds
    * in a UTC session — the CubeAdvisorSpec honesty pin compares the
    * served curve against the workload's own, endpoint by endpoint. */
  private[cube] def analyzeRolling(plan: LogicalPlan): Option[RollingNeeds] =
    plan match {
      case Aggregate(groups, aggs, child, _)
          if groups.nonEmpty &&
            groups.forall(_.isInstanceOf[AttributeReference]) =>
        val groupAttrs = groups.map(_.asInstanceOf[AttributeReference])
        val (base, _, preds) = peel(child)
        if (preds.nonEmpty) return None
        base match {
          case Join(l, r, LeftSemi, Some(cond), _) =>
            val (lb, lenv, lpreds) = peel(l)
            lb match {
              case Generate(Explode(Sequence(start, stop, None, _)), _,
                  false, _, Seq(genOut), gchild)
                  if groupAttrs.exists(_.exprId == genOut.exprId) =>
                val day = groupAttrs.find(_.exprId == genOut.exprId).get
                // any further groupings are SEGMENTS ("WAU per event
                // type" — the getRolling(segmentBy) serve): per-segment
                // daily partials, per-segment observed-day endpoints
                val segAttrs = groupAttrs.filterNot(_.exprId == day.exprId)
                val windowDays = stop match {
                  case Add(s2, Literal(n: Long, _), _)
                      if s2.semanticEquals(start) => n.toInt + 1
                  case Add(s2, Literal(n: Int, _), _)
                      if s2.semanticEquals(start) => n + 1
                  case s2 if s2.semanticEquals(start) => 1
                  case _ => return None
                }
                // the semi-join must carry ONE equality per grouping:
                // the day against the right-side day, and EVERY
                // segment against a right-side column — a day-only
                // semi-join under segment groupings would make the
                // endpoints the GLOBALLY observed days, a different
                // curve from the per-segment serve (refused)
                def split(e: Expression): Seq[Expression] = e match {
                  case org.apache.spark.sql.catalyst.expressions
                      .And(a, b) => split(a) ++ split(b)
                  case o => Seq(o)
                }
                val lOut = l.outputSet
                val oriented = split(cond).map {
                  case EqualTo(a: AttributeReference,
                      b: AttributeReference) =>
                    if (lOut.contains(a)) (a, b)
                    else if (lOut.contains(b)) (b, a)
                    else return None
                  case _ => return None
                }
                val dayEqs = oriented.filter(_._1.exprId == day.exprId)
                if (dayEqs.size != 1) return None
                val rightDay = dayEqs.head._2
                val segEqs = oriented.filterNot(_._1.exprId == day.exprId)
                if (segEqs.map(_._1.exprId).toSet !=
                    segAttrs.map(_.exprId).toSet ||
                    segEqs.size != segAttrs.size) return None
                // under the explode: an optional pure dedup (the
                // distinct (key, day) collapse of the count-distinct
                // form), then projects down to the relation
                val (inner, ienv, ipreds) = peel(gchild)
                val (srcPlan, env, deduped, innerPreds) = inner match {
                  case Aggregate(gs, as2, c2, _)
                      if as2.forall(_.isInstanceOf[Attribute]) &&
                        gs.map(_.canonicalized).toSet ==
                          as2.map(_.canonicalized).toSet =>
                    val (b2, env2, p2) = peel(c2)
                    (b2, lenv ++ ienv ++ env2, true, p2)
                  case other => (other, lenv ++ ienv, false, Nil)
                }
                // LEFT-side predicates: the optimizer plants
                // isnotnull(<segment key>) under the equi-semi-join.
                // Those are IMPLIED by the join (null keys never
                // match) and the segmented serve's own endpoint
                // semi-join drops null segments identically, so
                // IsNotNull over a segment column is accepted.
                // DIM-VALUE filters (col = lit / col IN lits — the
                // "WAU of click events" dashboard form) are collected
                // and must match the right side's; anything else
                // filters the curve by semantics the partials cannot
                // reproduce — refuse.
                val leftNN =
                  scala.collection.mutable.ListBuffer
                    .empty[AttributeReference]
                val leftRest =
                  scala.collection.mutable.ListBuffer.empty[Expression]
                (lpreds ++ ipreds ++ innerPreds).foreach {
                  case IsNotNull(a: AttributeReference) => leftNN += a
                  case other => leftRest += other
                }
                // the per-day frame may sit over ONE parquet relation,
                // over an inner equi-join of two (the join-MV
                // rolling shape, served by getJoinRolling), or over a
                // registrable 3+-relation CHAIN (canonical chain key;
                // served by a chain MV's daily partials); residual
                // side filters would make the curve unreproducible
                // from partials — refuse them
                val (path, join, jPreds, chain) =
                  cohortSourceOf(srcPlan).getOrElse(return None)
                if (jPreds.nonEmpty) return None
                val lFilters = sideFilters(leftRest.toList, subst(env))
                  .getOrElse(return None)
                // join-MV rolling with residual filters: not served
                if (join.isDefined && lFilters.nonEmpty) return None
                val dExpr = subst(env)(start)
                val tsCol = dayBucketColumn(dExpr).getOrElse(return None)
                // each segment must be a PLAIN source column (the
                // advised cube dims on it directly)
                val segNames = segAttrs.map(a => subst(env)(a) match {
                  case sa: AttributeReference => sa.name
                  case _ => return None
                })
                // every accepted left-side isnotnull must be on a
                // segment column (see above) or a filter column
                // (implied by its own equality)
                val filterCols = lFilters.map(_._1).toSet
                if (!leftNN.forall(a => subst(env)(a) match {
                    case sa: AttributeReference =>
                      segNames.contains(sa.name) ||
                        filterCols.contains(sa.name)
                    case _ => false
                  })) return None
                // the semi-join's right side must be the observed
                // (segment, day) set of the SAME source, the SAME day
                // derivation, and the SAME segment columns — anything
                // else filters endpoints by semantics the serve does
                // not reproduce
                val (rb, renv, rpreds) = peel(r)
                val rOk = rb match {
                  // gs may be WIDER than outs (the SQL-text IN-subquery
                  // form groups its distinct on (key, day) then projects
                  // the day): extra grouping columns only duplicate
                  // days, and duplicates are inert under LeftSemi — the
                  // endpoint SET stays "observed days of the same
                  // filtered source"
                  case Aggregate(gs, outs, c2, _)
                      if outs.size == segAttrs.size + 1 &&
                        gs.size >= outs.size &&
                        outs.forall(_.isInstanceOf[Attribute]) =>
                    val (b2, env2, p2) = peel(c2)
                    val envR = renv ++ env2
                    val outAttrs = outs.map(_.asInstanceOf[Attribute])
                    val dayOutOk = outAttrs
                      .find(_.exprId == rightDay.exprId)
                      .exists(o => subst(envR)(o).sql == dExpr.sql)
                    val segOutOk = segEqs.forall { case (lSeg, rSeg) =>
                      outAttrs.exists(_.exprId == rSeg.exprId) &&
                        (subst(envR)(rSeg) match {
                          case sa: AttributeReference =>
                            segAttrs.zip(segNames).exists { case (la, n) =>
                              la.exprId == lSeg.exprId && sa.name == n }
                          case _ => false
                        })
                    }
                    dayOutOk && segOutOk && (cohortSourceOf(b2) match {
                      // the endpoint side must carry the SAME dim
                      // filters as the pair side — the raw plan's
                      // endpoints are the days the FILTERED data was
                      // observed, which the serve reproduces by
                      // filtering cells once for both partials and
                      // endpoints (a chain side compares equal via the
                      // canonical chain key)
                      case Some((p3, _, p3preds, _)) if p3 == path =>
                        val rRest = (p2 ++ rpreds ++ p3preds).filterNot(
                          _.isInstanceOf[IsNotNull])
                        sideFilters(rRest, subst(envR)) match {
                          case Some(rFilters) =>
                            filterKey(rFilters) == filterKey(lFilters)
                          case None => false
                        }
                      case _ => false
                    })
                  case _ => false
                }
                if (!rOk) return None
                val segMap = segAttrs.map(_.exprId).zip(segNames).toMap
                rollingLeaves(day.exprId, segMap, aggs, deduped).map { outs =>
                  def leaves(f: String) = outs.collect {
                    case RollOut.Leaf(`f`, c, _, _) => c }
                  RollingNeeds(path, tsCol, windowDays,
                    leaves("distinct"),
                    outs.collect {
                      case RollOut.Leaf("quantile", c, p, _) => (c, p) },
                    leaves("min"), leaves("max"), leaves("sum"), join,
                    leaves("xdistinct"), segNames, outs, lFilters,
                    chain)
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  /** The single source column under a day-bucket derivation: accepts
    * the epoch-day arithmetic (`cast(unix_seconds / 86400 as long)` —
    * any expression dividing by 86400) and the calendar form
    * (`datediff`/`date_trunc('day', …)`); refuses derivations that
    * reference more than one column or no day-shaped bucketing at all
    * (a cube dimmed on an arbitrary expression would serve a curve the
    * workload never asked for). */
  private def dayBucketColumn(e: Expression): Option[String] = {
    val refs = e.references.toSeq
    if (refs.size != 1) return None
    val dayShaped = e.exists {
      case Literal(86400.0, _) => true
      case Literal(86400, _) => true
      case Literal(86400L, _) => true
      case TruncTimestamp(Literal(g, _), _, _) => g.toString == "day"
      case _: org.apache.spark.sql.catalyst.expressions.DateDiff => true
      case _ => false
    }
    if (dayShaped) Some(refs.head.name) else None
  }

  /** The single source column and PERIOD WIDTH under a period-bucket
    * derivation: `floor(<day-expr> / N)` → (tsCol, N); a bare
    * day-shaped expression is the N = 1 (daily) case. Pre-order
    * traversal finds the outer `/ N` before the day expr's own
    * `/ 86400`. */
  private def periodBucket(e: Expression): Option[(String, Int)] = {
    def toN(v: Any): Option[Int] = v match {
      case i: Int => Some(i)
      case l: Long if l == l.toInt => Some(l.toInt)
      case d: Double if d == d.toInt => Some(d.toInt)
      case de: org.apache.spark.sql.types.Decimal => Some(de.toInt)
      case _ => None
    }
    val divided = e.collectFirst {
      case Divide(inner, Literal(n, _), _)
          if dayBucketColumn(inner).isDefined && toN(n).exists(_ >= 1) =>
        (dayBucketColumn(inner).get, toN(n).get)
    }
    divided.orElse(dayBucketColumn(e).map((_, 1)))
  }

  /** CALENDAR-period derivations written as INTEGER ORDINALS — the
    * monthly/quarterly/yearly cohort shapes whose ±1 adjacency is
    * EXACT across year boundaries: `year(ts)*12 + month(ts) [± c]`,
    * `year(ts)*4 + quarter(ts) [± c]`, `year(ts) [± c]`. Returns
    * (ts column, granularity, the additive constant c — the serve
    * reproduces the user's exact values). yyyymm-style encodings
    * (`year*100 + month`) are deliberately NOT recognized: their −1
    * adjacency is wrong at every December (202401 − 1 ≠ 202312) and
    * routing would bless a broken dashboard — the raw plan keeps its
    * raw (wrong) answer instead. date_trunc groupings are also out:
    * their adjacency is interval arithmetic, not −1. */
  private def calendarBucket(e: Expression):
      Option[(String, String, Long)] = {
    def strip(x: Expression): Expression = x match {
      case Cast(c, _, _, _) => strip(c)
      case o => o
    }
    def toL(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    def tsOf(x: Expression): Option[String] = strip(x) match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def mulYear(x: Expression): Option[(Expression, Long)] =
      strip(x) match {
        case Multiply(y, Literal(k, _), _) if toL(k).isDefined =>
          strip(y) match {
            case Year(yc) => Some((yc, toL(k).get))
            case _ => None
          }
        case Multiply(Literal(k, _), y, _) if toL(k).isDefined =>
          strip(y) match {
            case Year(yc) => Some((yc, toL(k).get))
            case _ => None
          }
        case _ => None
      }
    def ordinal(l0: Expression, r0: Expression):
        Option[(String, String, Long)] =
      (mulYear(l0), strip(r0)) match {
        case (Some((yc, 12L)), Month(mc))
            if yc.canonicalized == mc.canonicalized =>
          tsOf(yc).map((_, "month", 0L))
        case (Some((yc, 4L)), Quarter(qc))
            if yc.canonicalized == qc.canonicalized =>
          tsOf(yc).map((_, "quarter", 0L))
        case _ => None
      }
    def core(x: Expression, off: Long): Option[(String, String, Long)] =
      strip(x) match {
        case Add(a, Literal(n, _), _) if toL(n).isDefined =>
          core(a, off + toL(n).get)
        case Add(Literal(n, _), a, _) if toL(n).isDefined =>
          core(a, off + toL(n).get)
        case Subtract(a, Literal(n, _), _) if toL(n).isDefined =>
          core(a, off - toL(n).get)
        case Add(a, b, _) =>
          ordinal(a, b).orElse(ordinal(b, a))
            .map { case (t, g, _) => (t, g, off) }
        case Year(yc) => tsOf(yc).map((_, "year", off))
        case _ => None
      }
    core(e, 0L)
  }

  /** Unified period recognition for the cohort-family matchers: a
    * day-multiple bucket (`floor(day / N)`) or a calendar ordinal.
    * Returns (ts column, period width in days — 1 under a calendar,
    * where it is unused — and the calendar (granularity, offset)). */
  private def periodKind(e: Expression):
      Option[(String, Int, Option[(String, Long)])] =
    periodBucket(e).map { case (t, n) => (t, n, None) }
      .orElse(calendarBucket(e).map { case (t, g, c) =>
        (t, 1, Some((g, c))) })

  /** One side of the retention self-join: a DISTINCT over (plain
    * source columns..., period bucket) of a parquet relation. `cols`
    * maps each non-period output attr to the source column it resolves
    * to; role assignment (which is the counted id, which are segments)
    * happens in [[analyzeRetention]], which sees the grouping and the
    * aggregate leaves. */
  private final case class PairSide(path: String, tsCol: String,
      periodDays: Int,
      pId: org.apache.spark.sql.catalyst.expressions.ExprId,
      cols: Seq[(org.apache.spark.sql.catalyst.expressions.ExprId,
        AttributeReference)],
      filters: Seq[(String, Seq[Literal])] = Nil,
      join: Option[(String, String, String, String)] = None,
      // Some((granularity, offset)) when the period derivation is a
      // calendar ordinal rather than a day-multiple bucket
      calendar: Option[(String, Long)] = None,
      // the chain vocabulary when `path` is a canonical chain key
      chain: Option[(Seq[String], Seq[(String, String)])] = None)

  /** DIM-VALUE filters on a pair side: conjuncts of the shape
    * `col = literal` / `col IN (literals)` over a plain source column
    * ("retention of CLICK users" — the filtered-dashboard form).
    * IsNotNull conjuncts are dropped (implied by the equality / the
    * join); anything else refuses the whole side. The serve applies
    * the same restriction to cube CELLS, which is exact because cells
    * partition by the dimension. */
  private def sideFilters(preds: Seq[Expression],
      sub: Expression => Expression):
      Option[Seq[(String, Seq[Literal])]] = {
    val out = scala.collection.mutable.ListBuffer
      .empty[(String, Seq[Literal])]
    preds.foreach { p0 =>
      sub(p0) match {
        case IsNotNull(_) => ()
        case EqualTo(a: AttributeReference, l: Literal) =>
          out += a.name -> Seq(l)
        case EqualTo(l: Literal, a: AttributeReference) =>
          out += a.name -> Seq(l)
        case In(a: AttributeReference, vs)
            if vs.forall(_.isInstanceOf[Literal]) =>
          out += a.name -> vs.map(_.asInstanceOf[Literal])
        case InSet(a: AttributeReference, hs) =>
          // InSet carries internal-format values; re-wrap with the
          // column's type so downstream conversion is uniform
          out += a.name -> hs.toSeq.map(v => Literal(v, a.dataType))
        case _ => return None
      }
    }
    Some(out.toList)
  }

  /** Canonical form for comparing two sides' filters: both sides of
    * the self-join must restrict the source IDENTICALLY or the routed
    * cell filter would answer a different cohort question. */
  private def filterKey(fs: Seq[(String, Seq[Literal])]):
      Seq[(String, Set[String])] =
    fs.map { case (c, ls) => c -> ls.map(_.sql).toSet }
      .sortBy(_._1)

  private def distinctPairs(side: LogicalPlan): Option[PairSide] = {
    val (b, env0, preds0) = peel(side)
    b match {
      case Aggregate(gs, outs, c, _) if outs.size >= 2 =>
        // outputs: bare grouping attributes, or — the column-pruned /
        // PullOutGroupingExpressions shape (a weighted aggregate whose
        // sum was pruned degrades to exactly this) — an Alias of a
        // grouping attribute
        val outPairs: Seq[(Attribute, Expression)] = outs.map {
          case a: Attribute => (a: Attribute, a: Expression)
          case al: Alias if al.child.isInstanceOf[AttributeReference] =>
            (al.toAttribute, al.child)
          case _ => return None
        }
        if (gs.map(_.canonicalized).toSet !=
          outPairs.map(_._2.canonicalized).toSet) return None
        val (inner, env, preds) = peel(c)
        val sub = subst(env0 ++ env) _
        // join-aware: the pair set may be built over an INNER EQUI-JOIN
        // ("distinct (supplier, order-week) pairs over orders⋈lineitem")
        // — sourceOf yields the composite registration key + join info,
        // so both cohort sides compare on the SAME join identity and
        // the rewrite can dispatch to a registered join MV; a
        // 3+-relation chain collapses to its canonical chain key the
        // same way (cohortSourceOf), dispatching to a CHAIN MV
        val (path, join, jpreds, chain) =
          cohortSourceOf(inner).getOrElse(return None)
        val fs = sideFilters(preds0 ++ preds ++ jpreds, sub)
          .getOrElse(return None)
        val resolved = outPairs.map { case (a, e) => a -> sub(e) }
        val pOpt = resolved.flatMap { case (a, e) =>
          periodKind(e).map(a -> _) }.headOption
        val (pAttr, (tsCol, pd, cal)) = pOpt.getOrElse(return None)
        // every OTHER column must be a plain source column
        val cols = resolved.filterNot(_._1.exprId == pAttr.exprId).map {
          case (a, e: AttributeReference) => a.exprId -> e
          case _ => return None
        }
        Some(PairSide(path, tsCol, pd, pAttr.exprId, cols, fs, join,
          cal, chain))
      case _ => None
    }
  }

  /** The NON-deduplicated pair side: a plain projection of (id cols,
    * period bucket) straight off the source. The optimizer removes a
    * redundant distinct below the cohort join (count(DISTINCT) above
    * an anti join makes the left-side dedup a no-op —
    * RemoveRedundantAggregates), so the shape arrives WITHOUT the
    * Aggregate [[distinctPairs]] expects. Accepting it is exact for
    * the only aggregate leaf this matcher admits: count(DISTINCT id)
    * kills row multiplicity, and the bitmap serve is dedup-agnostic
    * by construction. */
  private def projectedPairs(side: LogicalPlan): Option[PairSide] = {
    val (b, env, preds) = peel(side)
    val sub = subst(env) _
    val (path, join, jpreds, chain) =
      cohortSourceOf(b).getOrElse(return None)
    val fs = sideFilters(preds ++ jpreds, sub).getOrElse(return None)
    val resolved = side.output.map(a => a -> sub(a))
    val pOpt = resolved.flatMap { case (a, e) =>
      periodKind(e).map(a -> _) }.headOption
    val (pAttr, (tsCol, pd, cal)) = pOpt.getOrElse(return None)
    val cols = resolved.filterNot(_._1.exprId == pAttr.exprId).map {
      case (a, e: AttributeReference) => a.exprId -> e
      case _ => return None
    }
    Some(PairSide(path, tsCol, pd, pAttr.exprId, cols, fs, join, cal,
      chain))
  }

  /** The RETENTION plan shape — "how many of period p−1's ids came
    * back in p", written the way users write it: distinct (id, period)
    * pairs self-joined on (same id, adjacent period), re-counted per
    * current period. The generic matcher refuses it (an aggregate over
    * a join of aggregates has no single source), and without
    * recognition the workload's defining cohort query would be
    * reported uncovered; the right advice is a DAY-dimmed BITMAP cube
    * wired to [[CubeService.getRetention]], whose AND-walk over
    * OR-merged period bitmaps equals this plan's self-join count
    * exactly. Refusals keep the honesty contract: extra predicates, a
    * second aggregate leaf, sides from different sources or different
    * period widths all return None. */
  private[cube] def analyzeRetention(
      plan: LogicalPlan): Option[RetentionNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.nonEmpty &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      val groupAttrs = groups.map(_.asInstanceOf[AttributeReference])
      val (base, _, preds) = peel(child)
      if (!preds.forall(_.isInstanceOf[IsNotNull])) return None
      base match {
        case Join(l, r, jt, Some(cond), _)
            if jt == org.apache.spark.sql.catalyst.plans.Inner ||
              jt == org.apache.spark.sql.catalyst.plans.LeftAnti =>
          val isAnti = jt == org.apache.spark.sql.catalyst.plans.LeftAnti
          val lp = distinctPairs(l).orElse(projectedPairs(l))
            .getOrElse(return None)
          val rp = distinctPairs(r).orElse(projectedPairs(r))
            .getOrElse(return None)
          if (lp.path != rp.path || lp.tsCol != rp.tsCol ||
              lp.periodDays != rp.periodDays ||
              lp.calendar != rp.calendar) return None
          // both sides must restrict the source IDENTICALLY — a
          // one-sided filter asks a different cohort question ("of
          // week p's CLICK users, how many came back AT ALL") that the
          // single-cell-filtered serve cannot answer
          if (filterKey(lp.filters) != filterKey(rp.filters)) return None
          // the COUNTED side: Inner — the side whose period attr is
          // grouped (retained); LeftAnti — the LEFT side by
          // construction (the join outputs no right-side columns), the
          // churn/new-users cohort forms
          val (cur, other) =
            if (isAnti) {
              if (!groupAttrs.exists(_.exprId == lp.pId)) return None
              (lp, rp)
            }
            else if (groupAttrs.exists(_.exprId == lp.pId)) (lp, rp)
            else if (groupAttrs.exists(_.exprId == rp.pId)) (rp, lp)
            else return None
          val curColOf = cur.cols.toMap
          val prevColOf = other.cols.toMap
          // further groupings are SEGMENTS ("weekly retention per
          // plan"): cur-side plain columns, each carried through the
          // self-join so the matrix partitions per segment — exactly
          // getRetention(segmentBy)
          val segGroups = groupAttrs.filterNot(_.exprId == cur.pId)
          val segs: Seq[(org.apache.spark.sql.catalyst.expressions.ExprId,
              String)] =
            segGroups.map(a => a.exprId ->
              curColOf.getOrElse(a.exprId, return None).name)
          // aggregate leaves: the groups (possibly RENAMED — a
          // post-aggregate select collapses into the Aggregate's output
          // list) plus ONE count(DISTINCT <cur non-segment column>) —
          // nothing else is this serve. The ordered walk doubles as the
          // rewrite's output map.
          var idId: Option[org.apache.spark.sql.catalyst.expressions.ExprId] =
            None
          val segName = segs.toMap
          val outs: Seq[RollOut] = aggs.map { ne =>
            val grp = ne match {
              case a: AttributeReference
                  if groupAttrs.exists(_.exprId == a.exprId) => Some(a)
              case al: Alias => al.child match {
                case a: AttributeReference
                    if groupAttrs.exists(_.exprId == a.exprId) => Some(a)
                case _ => None
              }
              case _ => None
            }
            grp match {
              case Some(a) if a.exprId == cur.pId => RollOut.Day
              case Some(a) if segName.contains(a.exprId) =>
                RollOut.Seg(segName(a.exprId))
              case Some(_) => return None
              case None => ne match {
                case al: Alias => al.child match {
                  case AggregateExpression(Count(Seq(
                      ca: AttributeReference)), Complete, true, _, _)
                      if curColOf.contains(ca.exprId) &&
                        !segs.exists(_._1 == ca.exprId) && idId.isEmpty =>
                    idId = Some(ca.exprId)
                    RollOut.Leaf("retained", "")
                  case _ => return None
                }
                case _ => return None
              }
            }
          }
          if (idId.isEmpty) return None
          val idSrc = curColOf(idId.get)
          def conj(e: Expression): Seq[Expression] = e match {
            case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
              conj(a) ++ conj(b)
            case o => Seq(o)
          }
          val cs = conj(cond)
          // exactly: id equality + one equality per segment + adjacency
          if (cs.size != 2 + segs.size) return None
          def one(e: Expression) = e match {
            case Literal(1, _) | Literal(1L, _) => true
            case _ => false
          }
          var idMatched = false
          // adjacency direction as (EARLIER period attr, LATER period
          // attr) — validated against the two sides' period ids after
          // the walk, which also decides the matrix column the plan
          // computes (retained / churned / new_ids)
          var adjDir: Option[(org.apache.spark.sql.catalyst.expressions
              .ExprId, org.apache.spark.sql.catalyst.expressions.ExprId)] =
            None
          val segMatched = scala.collection.mutable.Set
            .empty[org.apache.spark.sql.catalyst.expressions.ExprId]
          cs.foreach {
            // adjacency in either algebraic writing: a = b − 1 (a
            // earlier) or a = b + 1 (a later)
            case EqualTo(a: AttributeReference,
                Subtract(b: AttributeReference, o, _)) if one(o) =>
              adjDir = Some((a.exprId, b.exprId))
            case EqualTo(Subtract(b: AttributeReference, o, _),
                a: AttributeReference) if one(o) =>
              adjDir = Some((a.exprId, b.exprId))
            case EqualTo(a: AttributeReference,
                Add(b: AttributeReference, o, _)) if one(o) =>
              adjDir = Some((b.exprId, a.exprId))
            case EqualTo(Add(b: AttributeReference, o, _),
                a: AttributeReference) if one(o) =>
              adjDir = Some((b.exprId, a.exprId))
            case EqualTo(x: AttributeReference, y: AttributeReference) =>
              // plain column equality: orient cur ↔ prev, require the
              // SAME source column on both sides, classify id vs segment
              val oriented =
                if (curColOf.contains(x.exprId) &&
                    prevColOf.contains(y.exprId)) Some((x, y))
                else if (curColOf.contains(y.exprId) &&
                    prevColOf.contains(x.exprId)) Some((y, x))
                else None
              oriented match {
                case Some((c, p))
                    if curColOf(c.exprId).name == prevColOf(p.exprId).name =>
                  if (c.exprId == idId.get && !idMatched) idMatched = true
                  else if (segs.exists(_._1 == c.exprId))
                    segMatched += c.exprId
                  else return None
                case _ => return None
              }
            case _ => return None
          }
          if (!idMatched || segMatched.size != segs.size) return None
          // orientation → matrix column. Inner: the matched side must
          // PRECEDE the counted one (classic retention); LeftAnti:
          // absent-side-later is churn ("of period p's ids, how many
          // never showed in p+1"), absent-side-earlier is new users
          val kind = adjDir match {
            case Some((e, lt)) if e == other.pId && lt == cur.pId =>
              if (isAnti) "new_ids" else "retained"
            case Some((e, lt))
                if isAnti && e == cur.pId && lt == other.pId =>
              "churned"
            case _ => return None
          }
          Some(RetentionNeeds(cur.path, cur.tsCol, idSrc.name,
            cur.periodDays, integral(idSrc.dataType), segs.map(_._2),
            outs.map {
              case l: RollOut.Leaf =>
                l.copy(family = kind, srcCol = idSrc.name)
              case o => o
            }, kind, cur.filters, cur.join, calendar = cur.calendar,
            chain = cur.chain))
        case _ => None
      }
    case _ => None
  }

  /** The RESURRECTED plan shape — growth accounting's fourth matrix
    * cell, the one [[analyzeRetention]]'s two-join forms cannot
    * express: of period p's active ids, those ABSENT from p−1 that
    * WERE seen in some period before it. Users write the
    * earlier-activity witness one of two ways, both matched:
    *
    *   - a LEFT SEMI join back onto the pairs with `q < p`
    *     ("EXISTS earlier activity"), or
    *   - an INNER join against the per-id min-period aggregate with
    *     `first < p` (the first-seen frame growth dashboards already
    *     compute).
    *
    * The anti (p−1 exclusion) and witness joins stack over the
    * current pair side in either order; all sides must be the SAME
    * source, period derivation and dim filters. Exactness of the
    * serve: resurrected_p = |B_p ∖ B_{p−1} ∩ prefixOR(B_{<p})| — the
    * witness `q < p` admits q = p−1, but those ids are already
    * removed by the anti side, so the strict prefix union IS the
    * witness set; an UNOBSERVED p−1 reads as the empty set in both
    * forms (anti keeps everything, ANDNOT-empty is identity). The
    * first period never emits a row in either form (no earlier
    * witness exists / the prefix is empty — the serve's ≥ 1 filter).
    * Refusals keep the honesty contract: a non-strict witness
    * inequality (`q ≤ p` admits same-period self-witness — every id
    * "resurrects", a different query), segments (wider groupings),
    * mismatched sources/periods/filters, or extra conjuncts all
    * return None. Reuses [[RetentionNeeds]] with
    * `kind = "resurrected"` so the hits fold into the same
    * day-dimmed bitmap-cube recommendation family. */
  private[cube] def analyzeResurrected(
      plan: LogicalPlan): Option[RetentionNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.size == 1 &&
          groups.head.isInstanceOf[AttributeReference] =>
      val pGroup = groups.head.asInstanceOf[AttributeReference]
      // peel the two wrapper joins (either stacking order): exactly
      // one LeftAnti (the p−1 exclusion) and one witness layer over
      // the current pair side. A layer is consumed only when the
      // PEELED node is a Join (attribute-only Projects between layers
      // fold into the running env; non-IsNotNull Filters refuse); the
      // final — current-pairs — side is handed to the pair matchers
      // RAW, so its own projection/dim-filters stay intact for them.
      var env = Map.empty[
        org.apache.spark.sql.catalyst.expressions.ExprId, Expression]
      var node: LogicalPlan = child
      var anti: Option[(LogicalPlan, Expression)] = None
      var wit: Option[(String, LogicalPlan, Expression)] = None
      var walking = true
      while (walking) {
        val (b, e, pr) = peel(node)
        b match {
          case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftAnti,
              Some(cond), _) if anti.isEmpty =>
            if (!pr.forall(_.isInstanceOf[IsNotNull])) return None
            env ++= e
            anti = Some((r, cond))
            node = l
          case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftSemi,
              Some(cond), _) if wit.isEmpty =>
            if (!pr.forall(_.isInstanceOf[IsNotNull])) return None
            env ++= e
            wit = Some(("semi", r, cond))
            node = l
          case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
              Some(cond), _) if wit.isEmpty =>
            if (!pr.forall(_.isInstanceOf[IsNotNull])) return None
            // the witness is whichever side is a per-id aggregate;
            // the current pairs continue on the other. A per-id
            // aggregate side is an Aggregate with ONE grouping after
            // its peel (a distinct pair side has two — disjoint).
            def isPerId(s: LogicalPlan): Boolean = peel(s)._1 match {
              case Aggregate(gs, _, _, _) if gs.size == 1 => true
              case _ => false
            }
            env ++= e
            if (isPerId(r) && !isPerId(l)) {
              wit = Some(("inner", r, cond))
              node = l
            } else if (isPerId(l) && !isPerId(r)) {
              wit = Some(("inner", l, cond))
              node = r
            } else return None
          case Aggregate(gs, outs, dc, _)
              if outs.forall(_.isInstanceOf[Attribute]) &&
                gs.map(_.canonicalized).toSet ==
                  outs.map(_.canonicalized).toSet &&
                peel(dc)._1.isInstanceOf[Join] =>
            // a pure DISTINCT between the wrapper joins (the
            // optimizer hoists the pair dedup above the anti) is a
            // no-op for this matcher: the only admitted leaf is
            // count(DISTINCT id), which kills row multiplicity anyway
            // — descend. Output attrs are the input attrs, so every
            // collected condition keeps resolving.
            if (!pr.forall(_.isInstanceOf[IsNotNull])) return None
            env ++= e
            node = dc
          case _ => walking = false
        }
      }
      if (anti.isEmpty || wit.isEmpty) return None
      // the CURRENT side: materialized pairs (distinct or projected),
      // or — the SQL-text shape — the raw relation with the period
      // derivation INLINED into the join conditions and materialized
      // only in the projection above the joins (count(DISTINCT) makes
      // the CTE's dedup redundant, so the optimizer collapses it and
      // fuses the projection). In the inline shape the outer grouping
      // resolves to the period expression and conditions are matched
      // by CANONICAL expression equality instead of attr identity.
      val pairsCur = distinctPairs(node).orElse(projectedPairs(node))
      val (curPath, curTs, curPd, curCal, curFilters, curJoin,
          curColOf, isCurP) = pairsCur match {
        case Some(c) =>
          if (pGroup.exprId != c.pId) return None
          (c.path, c.tsCol, c.periodDays, c.calendar, c.filters,
            c.join, c.cols.toMap,
            (e: Expression) => e match {
              case a: AttributeReference => a.exprId == c.pId
              case _ => false
            })
        case None =>
          val (b, env2, preds2) = peel(node)
          val sub2 = subst(env ++ env2) _
          val (path, join, jpreds) = sourceOf(b).getOrElse(return None)
          val fs = sideFilters(preds2 ++ jpreds, sub2)
            .getOrElse(return None)
          val pExpr = subst(env)(pGroup)
          val (tsCol, pd, cal) = periodKind(pExpr)
            .getOrElse(return None)
          val colOf = node.output.flatMap { a =>
            sub2(a) match {
              case s: AttributeReference => Some(a.exprId -> s)
              case _ => None
            }
          }.toMap
          (path, tsCol, pd, cal, fs, join, colOf,
            (e: Expression) => e.canonicalized == pExpr.canonicalized)
      }
      // aggregate leaves: the period grouping (possibly renamed) plus
      // ONE count(DISTINCT <cur id column>) — nothing else
      var idId: Option[org.apache.spark.sql.catalyst.expressions
        .ExprId] = None
      val outs: Seq[RollOut] = aggs.map { ne =>
        val grp = ne match {
          case a: AttributeReference if a.exprId == pGroup.exprId =>
            true
          case al: Alias => al.child match {
            case a: AttributeReference => a.exprId == pGroup.exprId
            case _ => false
          }
          case _ => false
        }
        if (grp) RollOut.Day
        else ne match {
          case al: Alias => al.child match {
            case AggregateExpression(Count(Seq(
                ca: AttributeReference)), Complete, true, _, _)
                if curColOf.contains(ca.exprId) && idId.isEmpty =>
              idId = Some(ca.exprId)
              RollOut.Leaf("resurrected", "")
            case _ => return None
          }
          case _ => return None
        }
      }
      if (idId.isEmpty) return None
      val idSrc = curColOf(idId.get)
      def conj(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
          conj(a) ++ conj(b)
        case o => Seq(o)
      }
      def one(e: Expression) = e match {
        case Literal(1, _) | Literal(1L, _) => true
        case _ => false
      }
      // id equality against a side: same exprId role on ours, same
      // SOURCE column name on theirs
      def idEq(x: AttributeReference, y: AttributeReference,
          theirCols: Map[org.apache.spark.sql.catalyst.expressions
            .ExprId, AttributeReference]): Boolean = {
        def ok(c: AttributeReference, t: AttributeReference) =
          c.exprId == idId.get && theirCols.get(t.exprId)
            .exists(_.name == idSrc.name)
        ok(x, y) || ok(y, x)
      }
      // ---- the anti side: same pairs, adjacency prev.p = cur.p − 1
      val prev = distinctPairs(anti.get._1)
        .orElse(projectedPairs(anti.get._1)).getOrElse(return None)
      if (prev.path != curPath || prev.tsCol != curTs ||
          prev.periodDays != curPd || prev.calendar != curCal)
        return None
      if (filterKey(prev.filters) != filterKey(curFilters))
        return None
      val prevColOf = prev.cols.toMap
      val acs = conj(anti.get._2)
      if (acs.size != 2) return None
      var aIdOk = false
      var aAdjOk = false
      // prev.p = cur.p − 1 in either algebraic writing; the absent
      // side must be the EARLIER period (absent-later is churn — a
      // different cell, already analyzeRetention's). The cur period
      // is an attr (pairs) or the inline derivation (SQL text) —
      // isCurP covers both.
      def adjMatch(x: Expression, y: Expression): Boolean = (x, y) match {
        case (a: AttributeReference, Subtract(b, o, _))
            if one(o) && a.exprId == prev.pId && isCurP(b) => true
        case (Add(a: AttributeReference, o, _), b)
            if one(o) && a.exprId == prev.pId && isCurP(b) => true
        case _ => false
      }
      acs.foreach {
        case EqualTo(x, y) if adjMatch(x, y) || adjMatch(y, x) =>
          aAdjOk = true
        case EqualTo(x: AttributeReference, y: AttributeReference) =>
          if (idEq(x, y, prevColOf)) aIdOk = true else return None
        case _ => return None
      }
      if (!aIdOk || !aAdjOk) return None
      // ---- the witness side
      wit.get match {
        case ("semi", wp, wcond) =>
          val w = distinctPairs(wp).orElse(projectedPairs(wp))
            .getOrElse(return None)
          if (w.path != curPath || w.tsCol != curTs ||
              w.periodDays != curPd || w.calendar != curCal)
            return None
          if (filterKey(w.filters) != filterKey(curFilters))
            return None
          val wColOf = w.cols.toMap
          val wcs = conj(wcond)
          if (wcs.size != 2) return None
          var wIdOk = false
          var wLtOk = false
          wcs.foreach {
            case EqualTo(x: AttributeReference, y: AttributeReference) =>
              if (idEq(x, y, wColOf)) wIdOk = true else return None
            case LessThan(a: AttributeReference, b)
                if a.exprId == w.pId && isCurP(b) =>
              wLtOk = true
            case GreaterThan(b, a: AttributeReference)
                if a.exprId == w.pId && isCurP(b) =>
              wLtOk = true
            case _ => return None
          }
          if (!wIdOk || !wLtOk) return None
        case (_, wp, wcond) =>
          val (wb, we, wpr) = peel(wp)
          if (!wpr.forall(_.isInstanceOf[IsNotNull])) return None
          val (wpath, wjoin, wgroups, _, wal, wpreds, wsub) =
            perIdAggregate(wb, subst(env ++ we) _).getOrElse(return None)
          if (wgroups.size != 1) return None
          val (wIdAttr, wIdSrc) = wgroups.head
          if (wIdSrc.name != idSrc.name) return None
          val (wtsCol, wpd, wcal) = wal.child match {
            case AggregateExpression(Min(m), Complete, false, _, _) =>
              periodKind(wsub(m)).getOrElse(return None)
            case _ => return None
          }
          if (wpath != curPath || wtsCol != curTs ||
              wpd != curPd || wcal != curCal) return None
          if (wjoin != curJoin) return None
          val wfs = sideFilters(wpreds, wsub).getOrElse(return None)
          if (filterKey(wfs) != filterKey(curFilters)) return None
          val wcs = conj(wcond)
          if (wcs.size != 2) return None
          var wIdOk = false
          var wLtOk = false
          wcs.foreach {
            case EqualTo(x: AttributeReference, y: AttributeReference) =>
              val ok = (x.exprId == idId.get &&
                  y.exprId == wIdAttr.exprId) ||
                (y.exprId == idId.get && x.exprId == wIdAttr.exprId)
              if (ok) wIdOk = true else return None
            case LessThan(a: AttributeReference, b)
                if a.exprId == wal.toAttribute.exprId && isCurP(b) =>
              wLtOk = true
            case GreaterThan(b, a: AttributeReference)
                if a.exprId == wal.toAttribute.exprId && isCurP(b) =>
              wLtOk = true
            case _ => return None
          }
          if (!wIdOk || !wLtOk) return None
      }
      Some(RetentionNeeds(curPath, curTs, idSrc.name,
        curPd, integral(idSrc.dataType), Nil, outs,
        "resurrected", curFilters, curJoin, calendar = curCal))
    case _ => None
  }

  /** Rolling aggregate leaves → per-family measure columns; None when
    * any leaf does not roll from daily partials. `deduped` workloads
    * (the distinct-pair collapse) refuse percentile and sum leaves:
    * dedup changes the distribution / the total the partials would
    * carry. Sums must be the decimal-cast form (the
    * [[graft.operators.Stable]] discipline the generic matcher also
    * requires) — a bare double sum is order-dependent and the serve
    * could not reproduce it bit-exactly. */

  /** The CUMULATIVE-distinct plan shape — "lifetime uniques by day",
    * written the way users write it in SQL: distinct (id, period)
    * pairs joined to the observed periods on `d <= day` and
    * re-counted per day. Quadratic in |periods| at the source (every
    * period re-joins ALL prior pairs — the single worst raw dashboard
    * query at scale), while the bitmap serve is ONE prefix-union pass
    * over the |periods| frame; recognition is what makes the routed
    * form reachable (the generic matcher refuses non-equi joins of
    * aggregates). Both sides must be the SAME source, period
    * derivation and filters; the inequality must be inclusive (strict
    * `<` is the exclusive curve — a different answer, refused); only
    * the period grouping and ONE count(DISTINCT id) leaf are this
    * serve. Reuses [[RetentionNeeds]] with `kind = "cumulative"`:
    * the SAME day-dimmed bitmap cube serves retention AND cumulative,
    * so the hits fold into one recommendation. */
  private[cube] def analyzeCumulative(
      plan: LogicalPlan): Option[RetentionNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.size == 1 &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      val dayAttr = groups.head.asInstanceOf[AttributeReference]
      val (base, _, preds) = peel(child)
      if (!preds.forall(_.isInstanceOf[IsNotNull])) return None
      base match {
        case Join(l, r, jt, Some(cond), _)
            if jt == org.apache.spark.sql.catalyst.plans.Inner =>
          // the observed-period side: a distinct over the same
          // source's period derivation (gs may be wider than the
          // projection — the SQL-text lowering; duplicates only
          // multiply rows count(DISTINCT) ignores)
          def asDays(side: LogicalPlan): Option[(Attribute, String,
              String, Int, Option[(String, Long)],
              Seq[(String, Seq[Literal])])] = {
            val (b, env0, preds0) = peel(side)
            b match {
              case Aggregate(gs, outs, c, _)
                  if outs.size == 1 && gs.size >= 1 &&
                    outs.forall(_.isInstanceOf[Attribute]) =>
                val (inner, env, preds2) = peel(c)
                val sub = subst(env0 ++ env) _
                // join-aware like the pairs side: the composite key
                // makes "same join" one path comparison
                val (path, _, jpreds) = sourceOf(inner)
                  .getOrElse(return None)
                val fs = sideFilters(preds0 ++ preds2 ++ jpreds, sub)
                  .getOrElse(return None)
                val a = outs.head.asInstanceOf[Attribute]
                periodKind(sub(a)).map { case (tsCol, pd, cal) =>
                  (a, path, tsCol, pd, cal, fs) }
              case _ => None
            }
          }
          // orient: the grouped day attr names the days side
          val (daysOpt, pairsPlan) = {
            val lOut = l.outputSet
            if (lOut.exists(_.exprId == dayAttr.exprId)) (asDays(l), r)
            else (asDays(r), l)
          }
          val (dOut, dPath, dTs, dPd, dCal, dFs) =
            daysOpt.getOrElse(return None)
          if (dOut.exprId != dayAttr.exprId) return None
          val pairs = distinctPairs(pairsPlan)
            .orElse(projectedPairs(pairsPlan)).getOrElse(return None)
          if (pairs.path != dPath || pairs.tsCol != dTs ||
              pairs.periodDays != dPd || pairs.calendar != dCal)
            return None
          if (filterKey(pairs.filters) != filterKey(dFs)) return None
          // exactly ONE inclusive inequality: pairs period ≤ day
          def conj(e: Expression): Seq[Expression] = e match {
            case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
              conj(a) ++ conj(b)
            case o => Seq(o)
          }
          val cs = conj(cond)
          if (cs.size != 1) return None
          val inclusiveOk = cs.head match {
            case LessThanOrEqual(a: AttributeReference,
                b: AttributeReference) =>
              a.exprId == pairs.pId && b.exprId == dayAttr.exprId
            case GreaterThanOrEqual(b: AttributeReference,
                a: AttributeReference) =>
              a.exprId == pairs.pId && b.exprId == dayAttr.exprId
            case _ => false
          }
          if (!inclusiveOk) return None
          // the ordered output map: the period grouping (possibly
          // renamed) + ONE count(DISTINCT <pairs column>)
          val pairColOf = pairs.cols.toMap
          var idId: Option[org.apache.spark.sql.catalyst.expressions
            .ExprId] = None
          val outs: Seq[RollOut] = aggs.map { ne =>
            val grp = ne match {
              case a: AttributeReference
                  if a.exprId == dayAttr.exprId => Some(a)
              case al: Alias => al.child match {
                case a: AttributeReference
                    if a.exprId == dayAttr.exprId => Some(a)
                case _ => None
              }
              case _ => None
            }
            grp match {
              case Some(_) => RollOut.Day
              case None => ne match {
                case al: Alias => al.child match {
                  case AggregateExpression(Count(Seq(
                      ca: AttributeReference)), Complete, true, _, _)
                      if pairColOf.contains(ca.exprId) &&
                        idId.isEmpty =>
                    idId = Some(ca.exprId)
                    RollOut.Leaf("cumulative", "")
                  case _ => return None
                }
                case _ => return None
              }
            }
          }
          if (idId.isEmpty) return None
          val idSrc = pairColOf(idId.get)
          Some(RetentionNeeds(pairs.path, pairs.tsCol, idSrc.name,
            pairs.periodDays, integral(idSrc.dataType), Nil,
            outs.map {
              case lf: RollOut.Leaf =>
                lf.copy(family = "cumulative", srcCol = idSrc.name)
              case o => o
            }, "cumulative", pairs.filters, pairs.join,
            calendar = pairs.calendar))
        case _ => None
      }
    case _ => None
  }

  /** What one recognized FUNNEL query needs: the source, the time
    * column its period derives from, the converted id column, the
    * period width, the step dimension column and the ordered step
    * literals of the min-join chain, and the ordered output map
    * ([[RollOut]] reused: Day = the period grouping, one Leaf = the
    * converted count). */
  private[cube] final case class FunnelNeeds(
      path: String, tsCol: String, idCol: String, periodDays: Int,
      integralId: Boolean, stepCol: String, steps: Seq[String],
      outs: Seq[RollOut] = Nil,
      join: Option[(String, String, String, String)] = None,
      calendar: Option[(String, Long)] = None,
      // > 0: the GAP-BOUNDED chain (step k must follow step k−1 within
      // this many periods) — [[CubeService.getFunnel]]'s withinPeriods
      within: Int = 0)

  /** One stage of the min-join conversion chain, bottom-up: the
    * stage's source identity, the counted id's source column, the
    * OUTPUT exprIds of its (id, t) columns (what the next stage's join
    * condition references), the step column, and the step literals in
    * chain order so far. */
  private final case class ChainInfo(path: String, tsCol: String,
      periodDays: Int, idSrc: AttributeReference,
      idOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      tOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      stepCol: String, steps: Seq[String],
      join: Option[(String, String, String, String)] = None,
      calendar: Option[(String, Long)] = None,
      within: Long = 0L)

  /** One level of the WINDOWED funnel's qualified-pair recursion —
    * the q246 raw vocabulary (the ClickHouse-windowFunnel semantics):
    *
    *   Q_1 = DISTINCT (id, p) of step-1 rows
    *   Q_k = DISTINCT (id, p) of step-k rows with a qualified
    *         step-(k−1) pair at p' ∈ [p − w, p]
    *
    * (id, p) are the DISTINCT frame's output exprIds — what the next
    * level's join condition references. Unlike the unbounded min
    * chain, intermediate levels carry the FULL qualified pair set
    * (the greedy min would miss re-qualification); only the final
    * stage takes the min, which [[minChain]]'s windowed arm handles. */
  private final case class QChain(path: String, tsCol: String,
      periodDays: Int, calendar: Option[(String, Long)],
      idSrc: AttributeReference,
      idOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      pOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      stepCol: String, steps: Seq[String],
      join: Option[(String, String, String, String)],
      within: Long)

  /** Parse a windowed-join condition's conjuncts: one id equality plus
    * the two inequalities bounding `stepP − prevP` to `[0, w]`
    * (BETWEEN lowers to exactly these; either parameterization —
    * `prevP ∈ [stepP − w, stepP]` or `stepP ∈ [prevP, prevP + w]` —
    * normalizes here). Some(w ≥ 1) on success; strict inequalities,
    * extra conjuncts, and degenerate bounds refuse. */
  private def windowBound(cs: Seq[Expression],
      isStepId: Expression => Boolean, isPrevId: Expression => Boolean,
      stepShift: Expression => Option[Long],
      prevPOut: org.apache.spark.sql.catalyst.expressions.ExprId):
      Option[Long] = {
    var idEq = false
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def prevShift(e: Expression): Option[Long] = {
      val (x, s) = stripShift(e)
      x match {
        case a: AttributeReference if a.exprId == prevPOut => Some(s)
        case _ => None
      }
    }
    // x >= y → one constraint on Δ = stepP − prevP
    def ge(x: Expression, y: Expression): Boolean =
      (stepShift(x), prevShift(y)) match {
        case (Some(sx), Some(sy)) if lo.isEmpty =>
          lo = Some(sy - sx); true // stepP + sx ≥ prevP + sy
        case _ => (prevShift(x), stepShift(y)) match {
          case (Some(sx), Some(sy)) if hi.isEmpty =>
            hi = Some(sx - sy); true // Δ ≤ sx − sy
          case _ => false
        }
      }
    cs.foreach {
      case EqualTo(x, y)
          if (isStepId(x) && isPrevId(y)) ||
            (isStepId(y) && isPrevId(x)) => idEq = true
      case GreaterThanOrEqual(x, y) => if (!ge(x, y)) return None
      case LessThanOrEqual(x, y) => if (!ge(y, x)) return None
      case _ => return None
    }
    if (idEq && lo.contains(0L) && hi.exists(_ >= 1L)) hi else None
  }

  /** Recognize the windowed qualified-pair recursion (see [[QChain]]).
    * Base level: distinct pairs with exactly one step filter;
    * recursive level: distinct (stepId, stepP) over an inner join of
    * the step-filtered source with the previous level, the condition
    * parsed by [[windowBound]]. All levels must share one window. */
  private def windowChain(side: LogicalPlan): Option[QChain] = {
    def baseQ(): Option[QChain] = distinctPairs(side).flatMap { ps =>
      if (ps.cols.size != 1 || ps.filters.size != 1 ||
        ps.filters.head._2.size != 1) None
      else litString(ps.filters.head._2.head).map { s =>
        QChain(ps.path, ps.tsCol, ps.periodDays, ps.calendar,
          ps.cols.head._2, ps.cols.head._1, ps.pId,
          ps.filters.head._1, Seq(s), ps.join, 0L)
      }
    }
    def recQ(): Option[QChain] = {
      val (b, env0, preds0) = peel(side)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      b match {
        case Aggregate(gs, outs, c, _) if gs.size == 2 && outs.size == 2 =>
          // a pure distinct: outputs are exactly the grouping attrs
          val outIds = outs.map {
            case a: AttributeReference => a.exprId
            case al: Alias => al.child match {
              case a: AttributeReference => a.exprId
              case _ => return None
            }
            case _ => return None
          }.toSet
          val gAttrs = gs.map {
            case a: AttributeReference => a
            case _ => return None
          }
          if (gAttrs.map(_.exprId).toSet != outIds) return None
          val (mid, env1, preds1) = peel(c)
          if (!preds1.forall(_.isInstanceOf[IsNotNull])) return None
          val join0 = mid match {
            case j: Join
                if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
              j
            case _ => return None
          }
          val cond = join0.condition.getOrElse(return None)
          // the distinct's columns come from the STEP side
          val (stepPlan, prevPlan) =
            if (gAttrs.forall(a =>
              join0.left.outputSet.exists(_.exprId == a.exprId)))
              (join0.left, join0.right)
            else if (gAttrs.forall(a =>
              join0.right.outputSet.exists(_.exprId == a.exprId)))
              (join0.right, join0.left)
            else return None
          val prev = windowChain(prevPlan).getOrElse(return None)
          val (sBase, sEnv, sPreds) = peel(stepPlan)
          val ssub = subst(env0 ++ env1 ++ sEnv) _
          val (path, sJoin, jpreds) = sourceOf(sBase).getOrElse(return None)
          val fs = sideFilters(sPreds ++ jpreds, ssub).getOrElse(return None)
          if (fs.size != 1 || fs.head._2.size != 1) return None
          val step = litString(fs.head._2.head).getOrElse(return None)
          // grouping roles: the id column and the period derivation
          var idG: Option[(org.apache.spark.sql.catalyst.expressions
            .ExprId, AttributeReference)] = None
          var pG: Option[(org.apache.spark.sql.catalyst.expressions
            .ExprId, (String, Int, Option[(String, Long)]))] = None
          gAttrs.foreach { ga =>
            ssub(ga) match {
              case a: AttributeReference if idG.isEmpty =>
                idG = Some(ga.exprId -> a)
              case e => periodKind(e) match {
                case Some(k) if pG.isEmpty => pG = Some(ga.exprId -> k)
                case _ => return None
              }
            }
          }
          val (idGid, idSrc) = idG.getOrElse(return None)
          val (pGid, pk) = pG.getOrElse(return None)
          if (path != prev.path || sJoin != prev.join ||
            pk._1 != prev.tsCol || pk._2 != prev.periodDays ||
            pk._3 != prev.calendar || idSrc.name != prev.idSrc.name ||
            fs.head._1 != prev.stepCol) return None
          if (prev.steps.contains(step)) return None
          def isStepId(e: Expression) = ssub(e) match {
            case a: AttributeReference => a.exprId == idSrc.exprId
            case _ => false
          }
          def isPrevId(e: Expression) = e match {
            case a: AttributeReference => a.exprId == prev.idOut
            case _ => false
          }
          def stepShift(e: Expression): Option[Long] = {
            val (x, s) = stripShift(e)
            periodKind(ssub(x)) match {
              case Some(k) if k == pk => Some(s)
              case _ => None
            }
          }
          val w = windowBound(
            conjunctsOf(cond).filterNot(_.isInstanceOf[IsNotNull]),
            isStepId, isPrevId, stepShift, prev.pOut)
            .getOrElse(return None)
          // one window for the whole chain (the verb's contract)
          if (prev.steps.size > 1 && prev.within != w) return None
          Some(QChain(path, pk._1, pk._2, pk._3, idSrc, idGid, pGid,
            prev.stepCol, prev.steps :+ step, sJoin, w))
        case _ => None
      }
    }
    recQ().orElse(baseQ())
  }

  /** Recognize one stage of the funnel's min-conversion-time
    * recursion, written the way users write it:
    *
    *   S_1 = source WHERE step = s_1  GROUP BY id  → min(period) AS t_1
    *   S_k = (source WHERE step = s_k) ⋈ S_{k−1}
    *           ON same id AND period ≥ t_{k−1}
    *         GROUP BY id → min(period) AS t_k
    *
    * — exactly the t_k = min q ≥ t_{k−1} recursion the funnel cascade
    * serves (see [[CubeService.getFunnel]]'s induction). Each stage is
    * an Aggregate with ONE grouping (the id) and exactly (id,
    * min(period)) outputs over either a step-filtered source (base) or
    * an inner join of one with the previous stage (recursive). The
    * step restriction must be a single `col = literal` conjunct on a
    * shared column across stages; period derivation and source must
    * agree stage-to-stage. Anything else returns None — the honesty
    * discipline every cohort matcher follows. */
  private def minChain(side: LogicalPlan): Option[ChainInfo] = {
    val (b, envOuter, predsOuter) = peel(side)
    // the optimizer infers `isnotnull(t_k)` above each stage from the
    // next join's condition — implied by the inner join, tolerated;
    // any OTHER predicate between stages changes the recursion
    if (!predsOuter.forall(_.isInstanceOf[IsNotNull])) return None
    b match {
      case Aggregate(Seq(g: AttributeReference), outs, c, _)
          if outs.size == 2 =>
        var idOut: Option[org.apache.spark.sql.catalyst.expressions
          .ExprId] = None
        var tOut: Option[org.apache.spark.sql.catalyst.expressions
          .ExprId] = None
        var minArg: Option[Expression] = None
        outs.foreach {
          case a: AttributeReference if a.exprId == g.exprId =>
            idOut = Some(a.exprId)
          case al: Alias => al.child match {
            case a: AttributeReference if a.exprId == g.exprId =>
              idOut = Some(al.toAttribute.exprId)
            case AggregateExpression(Min(arg), Complete, false, _, _) =>
              tOut = Some(al.toAttribute.exprId); minArg = Some(arg)
            case _ => return None
          }
          case _ => return None
        }
        if (idOut.isEmpty || tOut.isEmpty || minArg.isEmpty) return None
        val (inner, env, preds) = peel(c)
        // base stage: step-filtered source — possibly itself an INNER
        // EQUI-JOIN of two relations (the q261 join-cohort discipline),
        // which is why the Join arm below FALLS BACK here when its
        // "previous stage" side turns out to be a plain relation: a
        // joined source's base stage is structurally a Join too
        def baseStage(): Option[ChainInfo] = {
          val sub = subst(envOuter ++ env) _
          val (path, bJoin, jpreds) = sourceOf(inner)
            .getOrElse(return None)
          val fs = sideFilters(preds ++ jpreds, sub)
            .getOrElse(return None)
          if (fs.size != 1 || fs.head._2.size != 1) return None
          val (tsCol, pd, cal) = periodKind(sub(minArg.get))
            .getOrElse(return None)
          val idSrc = sub(g) match {
            case a: AttributeReference => a
            case _ => return None
          }
          val step = litString(fs.head._2.head).getOrElse(return None)
          Some(ChainInfo(path, tsCol, pd, idSrc, idOut.get, tOut.get,
            fs.head._1, Seq(step), bJoin, cal))
        }
        inner match {
          case Join(jl, jr, jt, Some(cond), _)
              if jt == org.apache.spark.sql.catalyst.plans.Inner =>
            def recursiveStage(): Option[ChainInfo] = {
            if (!preds.forall(_.isInstanceOf[IsNotNull])) return None
            // the stage's grouping comes from the STEP side; the other
            // side is the previous stage's (id, t) frame
            val (stepPlan, prevPlan) =
              if (jl.outputSet.exists(_.exprId == g.exprId)) (jl, jr)
              else if (jr.outputSet.exists(_.exprId == g.exprId)) (jr, jl)
              else return None
            val prev = minChain(prevPlan).getOrElse(return None)
            val (sBase, sEnv, sPreds) = peel(stepPlan)
            val ssub = subst(envOuter ++ env ++ sEnv) _
            // join-aware (the q261 discipline): the step side may be an
            // INNER EQUI-JOIN; the step filter is then pushed INTO one
            // join side, so sourceOf's side preds carry it
            val (path, sJoin, jpreds) = sourceOf(sBase)
              .getOrElse(return None)
            val fs = sideFilters(sPreds ++ jpreds, ssub)
              .getOrElse(return None)
            if (fs.size != 1 || fs.head._2.size != 1) return None
            val (stepCol, stepLit) = (fs.head._1, fs.head._2.head)
            val (tsCol, pd, cal) = periodKind(ssub(minArg.get))
              .getOrElse(return None)
            val idSrc = ssub(g) match {
              case a: AttributeReference => a
              case _ => return None
            }
            // stage-to-stage consistency: same source, same period
            // derivation, same id column, same step column
            if (path != prev.path || tsCol != prev.tsCol ||
                pd != prev.periodDays || cal != prev.calendar ||
                idSrc.name != prev.idSrc.name ||
                stepCol != prev.stepCol) return None
            // join condition: exactly (id equality, period ≥ prev t)
            def conj(e: Expression): Seq[Expression] = e match {
              case org.apache.spark.sql.catalyst.expressions.And(x, y) =>
                conj(x) ++ conj(y)
              case o => Seq(o)
            }
            val cs = conj(cond).filterNot(_.isInstanceOf[IsNotNull])
            if (cs.size != 2) return None
            var idMatched = false
            var ineqMatched = false
            def isStepId(e: Expression) = ssub(e) match {
              case a: AttributeReference => a.exprId == idSrc.exprId
              case _ => false
            }
            def isStepPeriod(e: Expression) =
              periodKind(ssub(e)).contains((tsCol, pd, cal))
            def isPrevId(e: Expression) = e match {
              case a: AttributeReference => a.exprId == prev.idOut
              case _ => false
            }
            def isPrevT(e: Expression) = e match {
              case a: AttributeReference => a.exprId == prev.tOut
              case _ => false
            }
            cs.foreach {
              case EqualTo(x, y)
                  if (isStepId(x) && isPrevId(y)) ||
                    (isStepId(y) && isPrevId(x)) => idMatched = true
              case GreaterThanOrEqual(p, t)
                  if isStepPeriod(p) && isPrevT(t) => ineqMatched = true
              case LessThanOrEqual(t, p)
                  if isStepPeriod(p) && isPrevT(t) => ineqMatched = true
              case _ => return None
            }
            if (!idMatched || !ineqMatched) return None
            val step = litString(stepLit).getOrElse(return None)
            if (prev.steps.contains(step)) return None
            Some(ChainInfo(path, tsCol, pd, idSrc, idOut.get, tOut.get,
              stepCol, prev.steps :+ step, sJoin, cal))
            }
            // the WINDOWED final stage: min over the last qualified-
            // pair level — the previous side is the q246 Q-recursion
            // and the condition carries the [0, w] gap bound
            def windowedStage(): Option[ChainInfo] = {
              if (!preds.forall(_.isInstanceOf[IsNotNull])) return None
              val (stepPlan, prevPlan) =
                if (jl.outputSet.exists(_.exprId == g.exprId)) (jl, jr)
                else if (jr.outputSet.exists(_.exprId == g.exprId))
                  (jr, jl)
                else return None
              val prev = windowChain(prevPlan).getOrElse(return None)
              val (sBase, sEnv, sPreds) = peel(stepPlan)
              val ssub = subst(envOuter ++ env ++ sEnv) _
              val (path, sJoin, jpreds) = sourceOf(sBase)
                .getOrElse(return None)
              val fs = sideFilters(sPreds ++ jpreds, ssub)
                .getOrElse(return None)
              if (fs.size != 1 || fs.head._2.size != 1) return None
              val (stepCol, stepLit) = (fs.head._1, fs.head._2.head)
              val (tsCol, pd, cal) = periodKind(ssub(minArg.get))
                .getOrElse(return None)
              val idSrc = ssub(g) match {
                case a: AttributeReference => a
                case _ => return None
              }
              if (path != prev.path || sJoin != prev.join ||
                tsCol != prev.tsCol || pd != prev.periodDays ||
                cal != prev.calendar || idSrc.name != prev.idSrc.name ||
                stepCol != prev.stepCol) return None
              val step = litString(stepLit).getOrElse(return None)
              if (prev.steps.contains(step)) return None
              def isStepId(e: Expression) = ssub(e) match {
                case a: AttributeReference => a.exprId == idSrc.exprId
                case _ => false
              }
              def isPrevId(e: Expression) = e match {
                case a: AttributeReference => a.exprId == prev.idOut
                case _ => false
              }
              def stepShift(e: Expression): Option[Long] = {
                val (x, s) = stripShift(e)
                periodKind(ssub(x)) match {
                  case Some(k) if k == ((tsCol, pd, cal)) => Some(s)
                  case _ => None
                }
              }
              val w = windowBound(
                conjunctsOf(cond).filterNot(_.isInstanceOf[IsNotNull]),
                isStepId, isPrevId, stepShift, prev.pOut)
                .getOrElse(return None)
              if (prev.steps.size > 1 && prev.within != w) return None
              Some(ChainInfo(path, tsCol, pd, idSrc, idOut.get,
                tOut.get, stepCol, prev.steps :+ step, sJoin, cal, w))
            }
            recursiveStage().orElse(windowedStage()).orElse(baseStage())
          case _ => baseStage()
        }
      case _ => None
    }
  }

  /** Step literals are dimension VALUES — the serve compares them
    * against cube cells, so only string-typed steps are admitted (the
    * step dimension is categorical by construction). */
  private def litString(l: Literal): Option[String] = l.dataType match {
    case org.apache.spark.sql.types.StringType =>
      Option(l.value).map(_.toString)
    case _ => None
  }

  /** The FUNNEL plan shape — "users who completed steps s_1..s_K in
    * order, cumulative by period", written the way users write it: the
    * [[minChain]] min-join recursion for the conversion times, joined
    * to the source's observed periods on `t_K ≤ period` and re-counted
    * per period (the final stage is [[analyzeCumulative]]'s join shape
    * over the chain instead of distinct pairs). The generic matcher
    * refuses the whole tree (aggregates over joins of aggregates);
    * recognition routes it to the funnel CASCADE over a registered
    * day+step-dimmed bitmap cube — prefix-unions over per-period step
    * bitmaps, which by the induction in [[CubeService.getFunnel]]
    * equals this plan's min-time recursion exactly. The days side must
    * be UNFILTERED (the full observed-period domain — a filtered
    * domain is a different chart, refused); K is bounded to the
    * serve's 2..8. */
  private[cube] def analyzeFunnel(
      plan: LogicalPlan): Option[FunnelNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.size == 1 &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      val dayAttr = groups.head.asInstanceOf[AttributeReference]
      val (base, _, preds) = peel(child)
      if (!preds.forall(_.isInstanceOf[IsNotNull])) return None
      base match {
        case Join(l, r, jt, Some(cond), _)
            if jt == org.apache.spark.sql.catalyst.plans.Inner =>
          def asDays(side: LogicalPlan): Option[(Attribute, String,
              String, Int, Option[(String, Long)],
              Seq[(String, Seq[Literal])], Boolean)] = {
            val (b, env0, preds0) = peel(side)
            b match {
              case Aggregate(gs, outs, c, _)
                  if outs.size == 1 && gs.size >= 1 &&
                    outs.forall(_.isInstanceOf[Attribute]) =>
                val (inner, env, preds2) = peel(c)
                val sub = subst(env0 ++ env) _
                // join-aware: composite key, side preds carried
                val (path, _, jpreds) = sourceOf(inner)
                  .getOrElse(return None)
                val fs = sideFilters(preds0 ++ preds2 ++ jpreds, sub)
                  .getOrElse(return None)
                val a = outs.head.asInstanceOf[Attribute]
                // periodOnly: the grouping is EXACTLY the period, so
                // each period emits one row. A wider grouping (the
                // IN-subquery lowering leaves extra keys) duplicates
                // period rows — inert under count(DISTINCT), answer-
                // changing under plain count(id) (see the outs walk)
                periodKind(sub(a)).map { case (tsCol, pd, cal) =>
                  (a, path, tsCol, pd, cal, fs, gs.size == 1) }
              case _ => None
            }
          }
          val (daysOpt, chainPlan) = {
            val lOut = l.outputSet
            if (lOut.exists(_.exprId == dayAttr.exprId)) (asDays(l), r)
            else (asDays(r), l)
          }
          val (dOut, dPath, dTs, dPd, dCal, dFs, dPeriodOnly) =
            daysOpt.getOrElse(return None)
          if (dOut.exprId != dayAttr.exprId) return None
          // the observed-period domain must be the FULL source's
          if (dFs.nonEmpty) return None
          val chain = minChain(chainPlan).getOrElse(return None)
          if (chain.path != dPath || chain.tsCol != dTs ||
              chain.periodDays != dPd || chain.calendar != dCal)
            return None
          if (chain.steps.size < 2 || chain.steps.size > 8) return None
          // exactly ONE inclusive inequality: chain t ≤ day
          def conj(e: Expression): Seq[Expression] = e match {
            case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
              conj(a) ++ conj(b)
            case o => Seq(o)
          }
          val cs = conj(cond)
          if (cs.size != 1) return None
          val inclusiveOk = cs.head match {
            case LessThanOrEqual(t: AttributeReference,
                d: AttributeReference) =>
              t.exprId == chain.tOut && d.exprId == dayAttr.exprId
            case GreaterThanOrEqual(d: AttributeReference,
                t: AttributeReference) =>
              t.exprId == chain.tOut && d.exprId == dayAttr.exprId
            case _ => false
          }
          if (!inclusiveOk) return None
          // ordered output map: the period grouping + ONE converted
          // count over the chain's id. count(DISTINCT) and plain
          // count(id) are BOTH the set size ONLY when the days side is
          // one row per period (dPeriodOnly): the chain emits one row
          // per id, so within a period group an id appears once per
          // matching days row. A wider days grouping duplicates period
          // rows — plain count(id) then counts each converted id once
          // per duplicate, a DIFFERENT answer the cascade must not
          // silently replace (analyzeCumulative's isDistinct=true
          // discipline, applied conditionally)
          var counted = false
          val outs: Seq[RollOut] = aggs.map { ne =>
            val grp = ne match {
              case a: AttributeReference
                  if a.exprId == dayAttr.exprId => Some(a)
              case al: Alias => al.child match {
                case a: AttributeReference
                    if a.exprId == dayAttr.exprId => Some(a)
                case _ => None
              }
              case _ => None
            }
            grp match {
              case Some(_) => RollOut.Day
              case None => ne match {
                case al: Alias => al.child match {
                  case AggregateExpression(Count(Seq(
                      ca: AttributeReference)), Complete, dist, _, _)
                      if ca.exprId == chain.idOut && !counted &&
                        (dist || dPeriodOnly) =>
                    counted = true
                    RollOut.Leaf("funnel", chain.idSrc.name)
                  case _ => return None
                }
                case _ => return None
              }
            }
          }
          if (!counted) return None
          Some(FunnelNeeds(chain.path, chain.tsCol, chain.idSrc.name,
            chain.periodDays, integral(chain.idSrc.dataType),
            chain.stepCol, chain.steps, outs, chain.join,
            calendar = chain.calendar, within = chain.within.toInt))
        case _ => None
      }
    case _ => None
  }

  /** The inner aggregate both per-id cohort shapes share: plain
    * source-column groupings — the id plus optional SEGMENT columns —
    * and the required aggregate alias (caller inspects it) among
    * grouping passthroughs. Role assignment (which grouping is the
    * counted id, which are segments) happens in the CALLER, which
    * sees the outer grouping and the count leaf — the analyzeRetention
    * discipline. Returns (source path, join identity, the grouping
    * attrs with their resolved source columns, the output attrs that
    * pass groupings through, the aggregate alias, the un-consumed
    * predicate conjuncts, the substitution). */
  private def perIdAggregate(base: LogicalPlan,
      subOuter: Expression => Expression):
      Option[(String, Option[(String, String, String, String)],
        Seq[(AttributeReference, AttributeReference)],
        Seq[Attribute], Alias,
        Seq[Expression], Expression => Expression)] = base match {
    case Aggregate(gs, outs, c, _) if gs.nonEmpty =>
      val (inner, env, preds2) = peel(c)
      val sub: Expression => Expression = e => subOuter(subst(env)(e))
      val (path, join, jpreds) = sourceOf(inner).getOrElse(return None)
      val groups: Seq[(AttributeReference, AttributeReference)] =
        gs.map { g =>
          val ga = g match {
            case a: AttributeReference => a
            case _ => return None
          }
          sub(ga) match {
            case src: AttributeReference => ga -> src
            case _ => return None
          }
        }
      val groupIds = groups.map(_._1.exprId).toSet
      var passthroughs = Vector.empty[Attribute]
      var agg: Option[Alias] = None
      outs.foreach {
        case a: AttributeReference if groupIds(a.exprId) =>
          passthroughs :+= a
        case al: Alias =>
          if (agg.nonEmpty) return None
          agg = Some(al)
        case _ => return None
      }
      agg.map(al => (path, join, groups, passthroughs, al,
        preds2 ++ jpreds, sub))
    case _ => None
  }

  /** The outer histogram aggregate both shapes share: the ordered
    * output map over `aggs` — the grouping attr (possibly re-aliased)
    * as [[RollOut.Day]] plus exactly one count leaf over the inner
    * id. `count(id)` and `count(DISTINCT id)` are both exact (inner
    * rows are unique per id) and skip a null-id group like the bitmap
    * domain does; `count(1)` counts that group, so it is accepted only
    * over a NON-NULLABLE id — the analyzeFunnel distinct-hazard
    * discipline applied to nulls. */
  private def histogramOuts(aggs: Seq[NamedExpression],
      groupAttr: AttributeReference, segOf: Map[
        org.apache.spark.sql.catalyst.expressions.ExprId, String],
      idOut: Option[Attribute],
      idSrc: AttributeReference, family: String,
      subOuter: Expression => Expression): Option[Seq[RollOut]] = {
    var counted = false
    def slot(e: Expression): Option[RollOut] = e match {
      case a: AttributeReference if a.exprId == groupAttr.exprId =>
        Some(RollOut.Day)
      case a: AttributeReference if segOf.contains(a.exprId) =>
        Some(RollOut.Seg(segOf(a.exprId)))
      case _ => None
    }
    val outs = aggs.map { ne =>
      val grp = ne match {
        case a: AttributeReference => slot(a)
        case al: Alias => slot(al.child)
        case _ => None
      }
      grp.getOrElse(ne match {
        case al: Alias => al.child match {
          case AggregateExpression(Count(Seq(c)), Complete, _, _, _)
              if !counted && (subOuter(c) match {
                case ca: AttributeReference =>
                  idOut.exists(_.exprId == ca.exprId)
                case _ => false
              }) =>
            counted = true
            RollOut.Leaf(family, idSrc.name)
          case AggregateExpression(Count(Seq(Literal(v, _))),
              Complete, false, _, _)
              if v != null && !idSrc.nullable && !counted =>
            counted = true
            RollOut.Leaf(family, idSrc.name)
          case _ => return None
        }
        case _ => return None
      })
    }
    if (counted) Some(outs) else None
  }

  /** Role assignment for the per-id histogram shapes' OUTER grouping:
    * the metric attr (min-period / activity count) must be grouped;
    * every OTHER outer grouping must pass through an inner grouping —
    * those are SEGMENTS ("new users per week PER PLAN") — and exactly
    * ONE inner grouping must remain un-grouped outside: the counted
    * id. An id grouped in the outer ("per-user first periods") or a
    * second leftover grouping refuses — a different question. */
  private def histogramRoles(
      groups: Seq[Expression],
      metricAttr: Attribute,
      innerGroups: Seq[(AttributeReference, AttributeReference)],
      subOuter: Expression => Expression):
      Option[(AttributeReference, AttributeReference, Seq[String], Map[
        org.apache.spark.sql.catalyst.expressions.ExprId, String])] = {
    var sawMetric = false
    var segs = Vector.empty[(org.apache.spark.sql.catalyst
      .expressions.ExprId, AttributeReference)]
    groups.foreach { g =>
      val ga = g match {
        case a: AttributeReference => a
        case _ => return None
      }
      subOuter(ga) match {
        case a: AttributeReference if a.exprId == metricAttr.exprId =>
          if (sawMetric) return None
          sawMetric = true
        case a: AttributeReference =>
          innerGroups.find(_._1.exprId == a.exprId) match {
            case Some((_, src)) => segs :+= (ga.exprId -> src)
            case None => return None
          }
        case _ => return None
      }
    }
    if (!sawMetric) return None
    val segInner = segs.map { case (_, src) => src.exprId }.toSet
    val leftover = innerGroups.filterNot(g => segInner(g._2.exprId))
    leftover match {
      case Seq((idInner, idSrc)) =>
        Some((idInner, idSrc, segs.map(_._2.name),
          segs.map { case (oid, src) => oid -> src.name }.toMap))
      case _ => None
    }
  }

  /** The FIRST-SEEN plan shape — "new users per period", the growth
    * chart's defining query, written the way users write it:
    *
    *   first = source GROUP BY id → min(period) AS fp
    *   SELECT fp, count(id) FROM first GROUP BY fp
    *
    * An id's first-seen period is p exactly when it is in B_p but no
    * earlier period's bitmap, so the per-period count equals
    * |B_p \ prefixOR(B_{<p})| — [[CubeService.getGrowthAccounting]]'s
    * `new_ids` column, servable from the SAME day-dimmed bitmap cube
    * the retention family maintains. The raw plan emits a row only for
    * periods that ARE some id's first (groups are non-empty); the
    * serve reproduces that row set with a ≥ 1 filter over observed
    * periods (a first period is always observed, and an observed
    * period survives the filter exactly when some id is new in it).
    * Honesty refusals: a wider inner grouping (per-(id, x) first
    * periods answer a different question), a second aggregate leaf,
    * non-IsNotNull predicates between the two aggregates, a
    * non-period min, and count(1) over a nullable id (see
    * [[histogramOuts]]). Dim-value filters route as cell filters, the
    * q236 discipline. */
  private[cube] def analyzeFirstSeen(
      plan: LogicalPlan): Option[RetentionNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.nonEmpty &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      val (base, env0, preds0) = peel(child)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      val subOuter = subst(env0) _
      val (path, join, innerGroups, passthroughs, al, innerPreds,
        sub) = perIdAggregate(base, subOuter).getOrElse(return None)
      val (tsCol, pd, cal) = al.child match {
        case AggregateExpression(Min(m), Complete, false, _, _) =>
          periodKind(sub(m)).getOrElse(return None)
        case _ => return None
      }
      // role assignment: the min-period alias is the metric grouping,
      // other outer groupings are segments, exactly one inner
      // grouping stays un-grouped — the counted id
      val (idInner, idSrc, segNames, segOf) =
        histogramRoles(groups, al.toAttribute, innerGroups, subOuter)
          .getOrElse(return None)
      val fpAttr = groups.map(_.asInstanceOf[AttributeReference])
        .find(g => subOuter(g) match {
          case a: AttributeReference =>
            a.exprId == al.toAttribute.exprId
          case _ => false
        }).getOrElse(return None)
      val idOut = passthroughs.find(_.exprId == idInner.exprId)
      val fs = sideFilters(innerPreds, sub).getOrElse(return None)
      val outs = histogramOuts(aggs, fpAttr, segOf, idOut, idSrc,
        "first_seen", subOuter).getOrElse(return None)
      Some(RetentionNeeds(path, tsCol, idSrc.name, pd,
        integral(idSrc.dataType), segNames, outs, "first_seen", fs,
        join, calendar = cal))
    case _ => None
  }

  /** The ENGAGEMENT-HISTOGRAM plan shape — "how many users were active
    * exactly k periods of this window" (the L7/L28 power-user curve):
    *
    *   nd = source WHERE day BETWEEN lo AND hi
    *        GROUP BY id → count(DISTINCT period) AS n
    *   SELECT n, count(id) FROM nd GROUP BY n
    *
    * Served exactly by the k-count PARTITION of the window's
    * per-period bitmap partials ([[graft.functions.Bitmap.kCountAgg]],
    * the [[CubeService.getEngagement]] primitive): an id's bucket is
    * the number of period bitmaps containing it, which IS its distinct
    * active-period count; daily bitmaps dedup within the day like
    * count(DISTINCT) does. Refusals keep the honesty contract: a
    * NON-distinct inner count (counts events, not active periods),
    * missing / one-sided / strict window bounds (an unbounded
    * histogram is a different question, and the serve's k-count
    * fan-out must be bounded — the getEngagement 366-day discipline
    * applied at match time), windows wider than 366 days, wider inner
    * groupings, and count(1) over a nullable id. The window bounds
    * must be INCLUSIVE comparisons of an EPOCH-DAY derivation of the
    * same time column against integral literals — the one shape whose
    * value space provably matches the serve's day filter (a
    * date_trunc bound compares micros, not days, and would read the
    * literal in the wrong unit). */
  private[cube] def analyzeEngagement(
      plan: LogicalPlan): Option[RetentionNeeds] = plan match {
    case Aggregate(groups, aggs, child, _)
        if groups.nonEmpty &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      val (base, env0, preds0) = peel(child)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      val subOuter = subst(env0) _
      val (path, join, innerGroups, passthroughs, al, innerPreds,
        sub) = perIdAggregate(base, subOuter).getOrElse(return None)
      val (tsCol, pd) = al.child match {
        case AggregateExpression(Count(Seq(m)), Complete, true, _, _) =>
          periodBucket(sub(m)).getOrElse(return None)
        case _ => return None
      }
      val (idInner, idSrc, segNames, segOf) =
        histogramRoles(groups, al.toAttribute, innerGroups, subOuter)
          .getOrElse(return None)
      val nAttr = groups.map(_.asInstanceOf[AttributeReference])
        .find(g => subOuter(g) match {
          case a: AttributeReference =>
            a.exprId == al.toAttribute.exprId
          case _ => false
        }).getOrElse(return None)
      val idOut = passthroughs.find(_.exprId == idInner.exprId)
      // the epoch-day shapes: /86400 on the single time column, or
      // datediff against the epoch — both EVALUATE to days since
      // 1970-01-01, matching the serve's cell filter unit
      def epochDays(e: Expression): Boolean = {
        val refs = e.references.toSeq
        refs.size == 1 && refs.head.name == tsCol && e.exists {
          case Literal(86400.0, _) => true
          case Literal(86400, _) => true
          case Literal(86400L, _) => true
          case org.apache.spark.sql.catalyst.expressions.DateDiff(
              _, Literal(0, org.apache.spark.sql.types.DateType)) =>
            true
          case _ => false
        }
      }
      def dayLit(v: Any): Option[Long] = v match {
        case i: Int => Some(i.toLong)
        case l: Long => Some(l)
        case s: Short => Some(s.toLong)
        case _ => None
      }
      var lo: Option[Long] = None
      var hi: Option[Long] = None
      val restPreds = innerPreds.filter { p0 =>
        sub(p0) match {
          case GreaterThanOrEqual(e, Literal(v, _))
              if epochDays(e) && dayLit(v).isDefined && lo.isEmpty =>
            lo = dayLit(v); false
          case LessThanOrEqual(e, Literal(v, _))
              if epochDays(e) && dayLit(v).isDefined && hi.isEmpty =>
            hi = dayLit(v); false
          case LessThanOrEqual(Literal(v, _), e)
              if epochDays(e) && dayLit(v).isDefined && lo.isEmpty =>
            lo = dayLit(v); false
          case GreaterThanOrEqual(Literal(v, _), e)
              if epochDays(e) && dayLit(v).isDefined && hi.isEmpty =>
            hi = dayLit(v); false
          case _ => true
        }
      }
      val fs = sideFilters(restPreds, sub).getOrElse(return None)
      val wLo = lo.getOrElse(return None)
      val wHi = hi.getOrElse(return None)
      if (wLo > wHi || wHi - wLo + 1 > 366) return None
      val outs = histogramOuts(aggs, nAttr, segOf, idOut, idSrc,
        "engagement", subOuter).getOrElse(return None)
      Some(RetentionNeeds(path, tsCol, idSrc.name, pd,
        integral(idSrc.dataType), segNames, outs, "engagement", fs,
        join, window = Some((wLo, wHi))))
    case _ => None
  }

  private def rollingLeaves(
      dayId: org.apache.spark.sql.catalyst.expressions.ExprId,
      segMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String],
      aggs: Seq[Expression], deduped: Boolean): Option[Seq[RollOut]] = {
    def colName(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      case Cast(inner, _, _, _) => colName(inner)
      case _ => None
    }
    // ordered walk: ONE RollOut per output column, so the rewrite can
    // rebind the original aggregate's output list position by position
    val outs = aggs.map {
      case a: AttributeReference if a.exprId == dayId => RollOut.Day
      case a: AttributeReference if segMap.contains(a.exprId) =>
        RollOut.Seg(segMap(a.exprId))
      case al: Alias =>
        // an output cast the workload applied itself (sum(dec) cast to
        // double is the common reporting form) is reproducible on the
        // served value — peel it, record it
        val (leafExpr, outerCast) = al.child match {
          case Cast(c: AggregateExpression, _, _, _) => (c, true)
          case c => (c, false)
        }
        def mk(family: String, srcCol: String, pct: Double = 0.0) =
          RollOut.Leaf(family, srcCol, pct, outerCast)
        leafExpr match {
        // distinct curve: an INTEGRAL key column gets exact bitmap
        // partials (lossless union — the served curve EQUALS the
        // workload's re-count); anything else falls back to the HLL
        // sketch trade (a lossy bitmap cast would be silently wrong —
        // the CubeManager.create type gate made executable at
        // design time)
        case AggregateExpression(Count(Seq(c)), Complete, true, _, _) =>
          val name = colName(c).getOrElse(return None)
          mk(if (integral(c.dataType)) "xdistinct" else "distinct", name)
        case AggregateExpression(ap: ApproximatePercentile, Complete,
            false, _, _) =>
          if (deduped) return None
          val pct = ap.percentageExpression match {
            case Literal(p: Double, _) => p
            case Literal(d: org.apache.spark.sql.types.Decimal, _) =>
              d.toDouble
            case _ => return None
          }
          mk("quantile", colName(ap.child).getOrElse(return None), pct)
        case AggregateExpression(Min(c), Complete, false, _, _) =>
          mk("min", colName(c).getOrElse(return None))
        case AggregateExpression(Max(c), Complete, false, _, _) =>
          mk("max", colName(c).getOrElse(return None))
        case AggregateExpression(
            Sum(Cast(inner, _: DecimalType, _, _), _), Complete,
            false, _, _) =>
          if (deduped) return None
          mk("sum", colName(inner).getOrElse(return None))
        case _ => return None
      }
      case _ => return None
    }
    if (outs.exists(_.isInstanceOf[RollOut.Leaf])) Some(outs) else None
  }

  /** Output tokens of the cohort-VALUE plan (the [[CohortValueNeeds]]
    * `outs` map, consumed by the rewrite's serve builder): the cohort
    * period, the activity period or its cohort-relative offset, the
    * per-cell id count, and the per-cell value sum. */
  private[cube] sealed trait CVOut
  private[cube] object CVOut {
    case object Cohort extends CVOut
    case object Period extends CVOut
    case object Offset extends CVOut
    case object Active extends CVOut
    case object Value extends CVOut
  }

  /** What one recognized cohort-VALUE query needs: the source, the
    * time column, the summed-per-id weight column, and the ordered
    * output map. The serve is [[CubeService.getCohortValue]]'s weight-
    * map algebra over a `weighted`-measured cube. */
  private[cube] final case class CohortValueNeeds(
      path: String, tsCol: String, idCol: String, weightCol: String,
      periodDays: Int, outs: Seq[CVOut],
      filters: Seq[(String, Seq[Literal])] = Nil,
      join: Option[(String, String, String, String)] = None,
      calendar: Option[(String, Long)] = None,
      integralId: Boolean = true)

  /** One side of the cohort-value join: the per-(id, period) WEIGHTED
    * aggregate — `GROUP BY id, period → sum(CAST(w AS DECIMAL(18,2)))`
    * over the source. The cast must be EXACTLY the cube's
    * DECIMAL(18,2) money discipline (or the column already decimal
    * scale 2, precision ≤ 18): the weight-map partials store
    * `cast(w as decimal(18,2)) × 100` as exact longs, so only then is
    * the routed sum bit-equal to the raw one (a double sum would
    * drift with order; a narrower cast could overflow to null where
    * the partials don't). */
  private final case class WeightedPairSide(
      path: String, tsCol: String, periodDays: Int,
      calendar: Option[(String, Long)],
      idOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      pOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      wOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      idSrc: AttributeReference, weightSrc: AttributeReference,
      filters: Seq[(String, Seq[Literal])],
      join: Option[(String, String, String, String)],
      notNullCols: Set[String] = Set.empty,
      // SEGMENTED boards group by extra plain columns; which plain
      // grouping is the id is decided by the CALLER (the leaderboard's
      // ORDER BY names it) — `idSrc`/`idOut` hold the first plain
      // grouping, `extraPlain` any others (cohort-value refuses them)
      extraPlain: Seq[(org.apache.spark.sql.catalyst.expressions.ExprId,
        AttributeReference)] = Nil)

  private def weightedPairs(side: LogicalPlan): Option[WeightedPairSide] = {
    val (b, env0, preds0) = peel(side)
    b match {
      case Aggregate(gs, outs, c, _)
          if gs.size >= 2 && gs.size <= 4 &&
            outs.size == gs.size + 1 =>
        val (inner, env, preds) = peel(c)
        val sub = subst(env0 ++ env) _
        val (path, join, jpreds) = sourceOf(inner).getOrElse(return None)
        val fs = sideFilters(preds0 ++ preds ++ jpreds, sub)
          .getOrElse(return None)
        // source columns with an explicit IS NOT NULL conjunct —
        // sideFilters drops them as serve-neutral, but the LEADERBOARD
        // matcher needs them: its id is OUTPUT-visible and the weight
        // maps never carry a null-id group, so the route is honest
        // only when the raw plan provably has no null-id row
        val notNull: Set[String] = (preds0 ++ preds ++ jpreds)
          .map(sub).collect {
            case IsNotNull(a: AttributeReference) => a.name
          }.toSet
        var idOut: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, AttributeReference)] = None
        var pOut: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, (String, Int, Option[(String, Long)]))] = None
        var wOut: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, AttributeReference)] = None
        var extra = Vector.empty[(org.apache.spark.sql.catalyst
          .expressions.ExprId, AttributeReference)]
        // an output is a grouping passthrough (a bare attribute, or —
        // the PullOutGroupingExpressions shape — an Alias of the
        // pulled grouping attribute) or the single weight-sum alias
        outs.foreach { ne =>
          val (outId, child): (org.apache.spark.sql.catalyst
            .expressions.ExprId, Expression) = ne match {
            case a: AttributeReference => (a.exprId, a)
            case al: Alias => (al.toAttribute.exprId, al.child)
            case _ => return None
          }
          child match {
            case AggregateExpression(Sum(we, _), Complete, false, _, _)
                if wOut.isEmpty =>
              import org.apache.spark.sql.types.DecimalType
              val srcOpt = sub(we) match {
                case Cast(src: AttributeReference, dt: DecimalType,
                    _, _) if dt.precision == 18 && dt.scale == 2 =>
                  Some(src)
                case src: AttributeReference => src.dataType match {
                  case dt: DecimalType
                      if dt.scale == 2 && dt.precision <= 18 =>
                    Some(src)
                  case _ => None
                }
                case _ => None
              }
              wOut = Some(outId -> srcOpt.getOrElse(return None))
            case _: AggregateExpression => return None
            case grp =>
              val e = sub(grp)
              periodKind(e) match {
                case Some(k) if pOut.isEmpty => pOut = Some(outId -> k)
                case _ => e match {
                  case src: AttributeReference if idOut.isEmpty =>
                    idOut = Some(outId -> src)
                  case src: AttributeReference =>
                    extra :+= (outId -> src)
                  case _ => return None
                }
              }
          }
        }
        for {
          (idId, idSrc) <- idOut
          (pId, (tsCol, pd, cal)) <- pOut
          (wId, wSrc) <- wOut
        } yield WeightedPairSide(path, tsCol, pd, cal, idId, pId, wId,
          idSrc, wSrc, fs, join, notNull, extra)
      case _ => None
    }
  }

  /** What one recognized LEADERBOARD query needs — the raw per-period
    * top-k-by-value plan ("top spenders this week"):
    *
    *   g = source GROUP BY id, period → sum(CAST(w AS DEC(18,2))) AS v
    *   r = row_number() OVER (PARTITION BY period
    *                          ORDER BY v DESC, id ASC)
    *   SELECT ... FROM r WHERE r <= k
    *
    * Served exactly by [[CubeService.getTopSpenders]]'s bounded
    * selection over the weighted cube's per-period maps. The four
    * output exprIds let the rewrite rebind the Filter's whole output
    * row (id, period, value, rank) in the user's own types. */
  private[cube] final case class TopSpendersNeeds(
      path: String, tsCol: String, idCol: String, weightCol: String,
      periodDays: Int, k: Int,
      filters: Seq[(String, Seq[Literal])],
      join: Option[(String, String, String, String)],
      calendar: Option[(String, Long)],
      integralId: Boolean,
      idOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      pOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      wOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      rankOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      // SEGMENTED boards ("top spenders per region per week"): the
      // window partitions by these extra plain columns too — (output
      // exprId, source column) per segment
      segments: Seq[(org.apache.spark.sql.catalyst.expressions.ExprId,
        String)] = Nil)

  /** The LEADERBOARD plan shape — `Filter(rank <= k, Window(row_number
    * PARTITION BY period ORDER BY value DESC, id ASC, child = the
    * per-(id, period) weighted aggregate))`. Honesty refusals:
    * - k outside 1..100 (the serve's bounded-selection fan-out);
    * - a rank function other than ROW_NUMBER/RANK (under the required
    *   unique (value DESC, id ASC) ordering the two coincide — every
    *   id appears once per period — so both are deterministic);
    * - any ordering other than exactly (value DESC, id ASC) with
    *   default null placement: a missing id tiebreak leaves ties
    *   nondeterministic, extra keys break ties on columns the maps
    *   don't carry, and NULLS FIRST on the value would move the
    *   all-NULL-weight convention rows ([[WeightMapBuildAgg]]);
    * - a NULLABLE id with no `IS NOT NULL` conjunct: the id is
    *   OUTPUT-VISIBLE here (unlike every other routed family) and the
    *   weight maps never carry a null-id group, so a null id row would
    *   appear raw but not routed;
    * - extra window expressions or filter conjuncts.
    *
    * ALL-NULL-WEIGHT convention (declared, not a refusal): the weight
    * maps store a null weight as 0 with presence kept
    * ([[graft.functions.WeightMap]]'s codec convention, pinned in
    * CubeServiceSpec), so an (id, period) group whose weights are ALL
    * NULL ranks with value 0.00 on the routed board where the raw
    * window sorts its NULL value LAST. When net values can be negative
    * or a period holds fewer than k positive ids, that can change
    * board membership/rank for exactly those all-NULL rows. The
    * nullable-weight source is NOT refused — every parquet-backed
    * column resolves nullable, so refusing would refuse all real
    * plans; the divergence is confined to ids with no non-null weight
    * in the period, which a revenue table that records amounts never
    * produces (the same boundary the cohort-value family declares).
    * The divergence case is pinned in CubeRewriteSpec
    * ("all-NULL-weight rows follow the declared 0.00 convention"). */
  private[cube] def analyzeTopSpenders(
      plan: LogicalPlan): Option[TopSpendersNeeds] = plan match {
    case Filter(cond, w: org.apache.spark.sql.catalyst.plans.logical.Window) =>
      import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, RowNumber, SortOrder, WindowExpression}
      val (rankAttr, k) = cond match {
        case LessThanOrEqual(a: AttributeReference,
            Literal(v: Int, org.apache.spark.sql.types.IntegerType)) =>
          (a, v)
        case LessThan(a: AttributeReference,
            Literal(v: Int, org.apache.spark.sql.types.IntegerType)) =>
          (a, v - 1)
        case _ => return None
      }
      if (k < 1 || k > 100) return None
      if (w.windowExpressions.size != 1) return None
      val al = w.windowExpressions.head match {
        case a: Alias => a
        case _ => return None
      }
      if (al.toAttribute.exprId != rankAttr.exprId) return None
      al.child match {
        case WindowExpression(fn, _) => fn match {
          case _: RowNumber => ()
          case _: org.apache.spark.sql.catalyst.expressions.Rank => ()
          case _ => return None
        }
        case _ => return None
      }
      // InferWindowGroupLimit may have inserted a WindowGroupLimit
      // below the Window — semantics-neutral (it only prunes rows the
      // rank filter drops anyway), so see through it
      val child = w.child match {
        case wgl: org.apache.spark.sql.catalyst.plans.logical
            .WindowGroupLimit => wgl.child
        case c => c
      }
      val g = weightedPairs(child).getOrElse(return None)
      // which plain grouping is the RANKED id is named by the ORDER
      // BY's ASC tiebreak; every other plain grouping must partition
      // the window (a segmented board) — an unreferenced grouping
      // would duplicate board rows the serve cannot see
      val plain: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        AttributeReference] =
        (Seq(g.idOut -> g.idSrc) ++ g.extraPlain).toMap
      val (idOutId, idSrc) = w.orderSpec match {
        case Seq(
            SortOrder(wv: AttributeReference, Descending, NullsLast, _),
            SortOrder(iv: AttributeReference, Ascending, NullsFirst, _))
            if wv.exprId == g.wOut && plain.contains(iv.exprId) =>
          (iv.exprId, plain(iv.exprId))
        case _ => return None
      }
      val partIds = w.partitionSpec.map {
        case a: AttributeReference => a.exprId
        case _ => return None
      }
      if (partIds.distinct.size != partIds.size) return None
      val segIds = plain.keySet - idOutId
      if (partIds.toSet != segIds + g.pOut) return None
      val segments = g.extraPlain.filter(_._1 != idOutId)
        .map { case (oid, src) => oid -> src.name } ++
        (if (idOutId != g.idOut) Seq(g.idOut -> g.idSrc.name) else Nil)
      // output-visible id: provably no null-id row or no route
      if (idSrc.nullable && !g.notNullCols.contains(idSrc.name))
        return None
      Some(TopSpendersNeeds(g.path, g.tsCol, idSrc.name,
        g.weightSrc.name, g.periodDays, k, g.filters, g.join,
        g.calendar, integral(idSrc.dataType),
        idOutId, g.pOut, g.wOut, rankAttr.exprId, segments))
    case _ => None
  }

  // ---- value-bridge (MRR growth-accounting) term analysis ---------------

  /** Output tokens of a recognized VALUE-BRIDGE term. */
  private[cube] sealed trait VBOut
  private[cube] object VBOut {
    case object Period extends VBOut
    case object Value extends VBOut
    case object Expansion extends VBOut
    case object Contraction extends VBOut
  }

  /** One recognized term of the raw revenue growth-accounting
    * decomposition (the MRR bridge, [[CubeService
    * .getValueGrowthAccounting]]'s column vocabulary written as raw
    * SQL/DataFrame terms):
    *
    *  - `revenue`     — per-period Σw (directly off the source or as
    *                    a sum over the per-(id, period) frame), with
    *                    an optional label shift (`prev_revenue` is
    *                    revenue labeled at p+1);
    *  - `periods`     — the observed-period spine (SELECT DISTINCT p);
    *  - `new`         — Σw over ids at their FIRST period (the
    *                    per-(id, period) frame joined to the per-id
    *                    min-period frame on p = first);
    *  - `anti`        — Σw over ids at p with NO row at p+adj
    *                    (adj = +1 → churned value labeled p+1;
    *                    adj = −1 → inflow = new + resurrected);
    *  - `resurrected` — the anti(−1) term with a STRICT earlier-
    *                    activity witness (min-period frame, fp < p);
    *  - `expcon`      — Σ max(0, w_p − w_{p−1}) / Σ max(0, w_{p−1} −
    *                    w_p) over ids present in both adjacent periods.
    *
    * `pShift` relabels the walk period on output (churn emits at p+1;
    * prev_revenue labels at p+1). The composite dashboard assembling
    * these terms (the q288 oracle's exact text) routes term-wise under
    * the user's shell — the q269 composite discipline. */
  private[cube] final case class ValueBridgeNeeds(
      path: String, tsCol: String, idCol: String, weightCol: String,
      periodDays: Int, calendar: Option[(String, Long)],
      kind: String, adj: Long, pShift: Long,
      outs: Seq[VBOut],
      filters: Seq[(String, Seq[Literal])],
      join: Option[(String, String, String, String)],
      // null-id honesty state (see [[analyzeValueBridge]]): whether
      // the plan provably filters null ids, and whether the id column
      // is nullable at all — revenue's serve selection depends on both
      idFiltered: Boolean, idNullable: Boolean,
      // steers the ADVISOR's rec only (bitmaps vs dictBitmaps — the
      // create-time dictionary contract); the serve itself is id-free
      integralId: Boolean = true)

  /** A per-(id, period) weighted aggregate side, generalized beyond
    * [[weightedPairs]] for the bridge terms: the id passthrough may be
    * pruned (churn's outer needs only the shifted period), the period
    * output may carry an additive shift, and the aggregate's child may
    * be the optimizer's pushed-down LeftAnti against the same source's
    * distinct (id, period + adj) pairs
    * (PushDownLeftSemiAntiJoin moves the user's post-aggregation anti
    * join below the per-(id, period) sum — sound because the condition
    * is a function of the grouping keys). */
  private final case class WeightedTermSide(
      path: String, tsCol: String, periodDays: Int,
      calendar: Option[(String, Long)],
      idOut: Option[org.apache.spark.sql.catalyst.expressions.ExprId],
      pOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      pShift: Long,
      wOut: org.apache.spark.sql.catalyst.expressions.ExprId,
      idSrc: AttributeReference, weightSrc: AttributeReference,
      filters: Seq[(String, Seq[Literal])],
      join: Option[(String, String, String, String)],
      notNullCols: Set[String],
      anti: Option[Long])

  /** Peel one top-level additive integer shift: `x + c` / `x − c` →
    * (x, ±c). */
  private def stripShift(e: Expression): (Expression, Long) = {
    def toL(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    e match {
      case Add(x, Literal(c, _), _) if toL(c).isDefined => (x, toL(c).get)
      case Add(Literal(c, _), x, _) if toL(c).isDefined => (x, toL(c).get)
      case Subtract(x, Literal(c, _), _) if toL(c).isDefined =>
        (x, -toL(c).get)
      case _ => (e, 0L)
    }
  }

  /** The shift of a (possibly relabeled) period expression relative to
    * a base period kind: Some(s) when `e` derives the SAME (ts column,
    * width, calendar granularity) period + the constant s. Calendar
    * ordinals carry shifts in their own additive constant (the
    * optimizer folds `(y*12+m−1)+1` to `y*12+m`), so the shift is the
    * offset difference there. */
  private def shiftOf(e: Expression,
      base: (String, Int, Option[(String, Long)]),
      sub: Expression => Expression): Option[Long] = {
    val (tsCol, pd, cal) = base
    def rel(k: (String, Int, Option[(String, Long)]), s: Long): Option[Long] =
      k match {
        case (t2, p2, c2) if t2 == tsCol && p2 == pd => (cal, c2) match {
          case (None, None) => Some(s)
          case (Some((g, c)), Some((g2, cc))) if g == g2 => Some(s + cc - c)
          case _ => None
        }
        case _ => None
      }
    val (x, s) = stripShift(e)
    periodKind(sub(x)).flatMap(rel(_, s))
      .orElse(periodKind(sub(e)).flatMap(rel(_, 0L)))
  }

  private def weightedTerm(side: LogicalPlan): Option[WeightedTermSide] = {
    val (b, env0, preds0) = peel(side)
    b match {
      case Aggregate(gs, outs, c, _) if gs.size == 2 &&
          (outs.size == 2 || outs.size == 3) =>
        val (mid, env1, preds1) = peel(c)
        // optional pushed-down LeftAnti between the aggregate and the
        // source: (left = the source rows, right = distinct pairs)
        val (inner0, antiPart) = mid match {
          case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftAnti,
              Some(cond), _) => (l, Some((r, cond)))
          case other => (other, None)
        }
        val (inner, env2, preds2) = peel(inner0)
        val sub = subst(env0 ++ env1 ++ env2) _
        val (path, join, jpreds) = sourceOf(inner).getOrElse(return None)
        val allPreds = preds0 ++ preds1 ++ preds2 ++ jpreds
        val fs = sideFilters(allPreds, sub).getOrElse(return None)
        val notNull: Set[String] = allPreds.map(sub).collect {
          case IsNotNull(a: AttributeReference) => a.name
        }.toSet
        // grouping roles: one plain id column, one period derivation
        var idGrp: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, AttributeReference)] = None
        var pGrp: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, (String, Int, Option[(String, Long)]))] = None
        gs.foreach { g =>
          val ga = g match {
            case a: AttributeReference => a
            case _ => return None
          }
          sub(ga) match {
            case src: AttributeReference if idGrp.isEmpty =>
              idGrp = Some(ga.exprId -> src)
            case e => periodKind(e) match {
              case Some(k) if pGrp.isEmpty => pGrp = Some(ga.exprId -> k)
              case _ => return None
            }
          }
        }
        val (idGid, idSrc) = idGrp.getOrElse(return None)
        val (pGid, pKind) = pGrp.getOrElse(return None)
        // outputs: the single money-disciplined sum, the (possibly
        // shifted) period, and optionally the id passthrough
        var idOut: Option[org.apache.spark.sql.catalyst.expressions
          .ExprId] = None
        var pOut: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, Long)] = None
        var wOut: Option[(org.apache.spark.sql.catalyst.expressions
          .ExprId, AttributeReference)] = None
        outs.foreach { ne =>
          val (outId, child): (org.apache.spark.sql.catalyst
            .expressions.ExprId, Expression) = ne match {
            case a: AttributeReference => (a.exprId, a)
            case al: Alias => (al.toAttribute.exprId, al.child)
            case _ => return None
          }
          child match {
            case AggregateExpression(Sum(we, _), Complete, false, _, _)
                if wOut.isEmpty =>
              val srcOpt = sub(we) match {
                case Cast(src: AttributeReference, dt: DecimalType,
                    _, _) if dt.precision == 18 && dt.scale == 2 =>
                  Some(src)
                case src: AttributeReference => src.dataType match {
                  case dt: DecimalType
                      if dt.scale == 2 && dt.precision <= 18 =>
                    Some(src)
                  case _ => None
                }
                case _ => None
              }
              wOut = Some(outId -> srcOpt.getOrElse(return None))
            case _: AggregateExpression => return None
            case a: AttributeReference if a.exprId == idGid =>
              if (idOut.nonEmpty) return None
              idOut = Some(outId)
            case grp =>
              // the period out: the period grouping attr, optionally
              // under an additive shift (churn's `p + 1`)
              if (pOut.nonEmpty) return None
              val (x, s) = stripShift(grp)
              x match {
                case a: AttributeReference if a.exprId == pGid =>
                  pOut = Some(outId -> s)
                case _ => return None
              }
          }
        }
        // validate the anti side: distinct (id, period + adj) pairs of
        // the SAME source under the SAME filters
        val adj: Option[Long] = antiPart match {
          case None => None
          case Some((r, cond)) =>
            val ps = distinctPairs(r).getOrElse(return None)
            if (ps.path != path || ps.join != join ||
              ps.tsCol != pKind._1 || ps.periodDays != pKind._2 ||
              ps.calendar != pKind._3) return None
            if (filterKey(ps.filters) != filterKey(fs)) return None
            if (ps.cols.size != 1) return None
            val (psIdOut, psIdSrc) = ps.cols.head
            if (psIdSrc.name != idSrc.name) return None
            val cs = conjunctsOf(cond)
            if (cs.size != 2) return None
            var idEq = false
            var adjOpt: Option[Long] = None
            cs.foreach {
              case EqualTo(a: AttributeReference, bb: AttributeReference)
                  if Set(a.exprId, bb.exprId) ==
                    Set(psIdOut, idSrc.exprId) =>
                idEq = true
              case EqualTo(x, y) =>
                // one side the pairs' period attr, the other the left
                // side's shifted period expression (either order)
                val (pa, pe) = (x, y) match {
                  case (a: AttributeReference, e) if a.exprId == ps.pId =>
                    (a, e)
                  case (e, a: AttributeReference) if a.exprId == ps.pId =>
                    (a, e)
                  case _ => return None
                }
                val _ = pa
                adjOpt = shiftOf(pe, pKind, sub)
                if (adjOpt.isEmpty) return None
              case _ => return None
            }
            if (!idEq) return None
            Some(adjOpt.getOrElse(return None))
        }
        for {
          (pId, pShift) <- pOut
          (wId, wSrc) <- wOut
        } yield WeightedTermSide(path, pKind._1, pKind._2, pKind._3,
          idOut, pId, pShift, wId, idSrc, wSrc, fs, join, notNull, adj)
      case _ => None
    }
  }

  /** Recognize one raw VALUE-BRIDGE term (see [[ValueBridgeNeeds]]).
    * NULL-id honesty per kind: `new`/`resurrected`/`expcon` drop
    * null-id rows on both paths (their inner joins never match a null
    * key; weight maps never carry one). `anti` KEEPS null-id left
    * rows in the raw plan (a LeftAnti condition on a null key is
    * null → unmatched → kept), so it requires proof there are none
    * (non-nullable id, or an explicit IS NOT NULL conjunct).
    * `revenue`/`periods` sum ALL rows including a null-id group —
    * served from the cube's plain decimal MEASURE partials (row sums,
    * null-id rows included) unless the plan filters the id non-null,
    * in which case only the weight maps reproduce it.
    *
    * NULL-PERIOD convention (declared, not a refusal): every routed
    * bridge term drops rows whose timestamp is NULL — a null event
    * time is not a period, and the cube's day cells never carry one.
    * On a null-ts source the RAW spine (`SELECT DISTINCT p`) and the
    * raw direct-revenue term would each keep one NULL-period group
    * that the routed serve omits; the adjacency/min-join terms drop
    * it on both paths (a null period never joins). A user who needs
    * the null-ts bucket keeps it by NOT registering a cube over the
    * dirty source (or by cleaning the timestamp first) — the
    * convention is surfaced in README.md's routing-conventions
    * section alongside the null-id and all-NULL-weight rules. */
  private[cube] def analyzeValueBridge(
      plan: LogicalPlan): Option[ValueBridgeNeeds] = plan match {
    case Aggregate(groups, aggs, child, _) if groups.size == 1 =>
      val (base, env0, preds0) = peel(child)
      val sub0 = subst(env0) _
      def sameAsGroup(e: Expression): Boolean =
        sub0(e).canonicalized == sub0(groups.head).canonicalized
      // the ordered output map for the single-value kinds: the group
      // period (any encoding) and/or ONE sum over `wantSum`
      def valueOuts(wantSum: Expression => Boolean): Option[Seq[VBOut]] = {
        var sawValue = false
        val outs = aggs.map { ne =>
          val c = ne match {
            case a: AttributeReference => (a: Expression)
            case al: Alias => al.child
            case _ => return None
          }
          if (sameAsGroup(c)) VBOut.Period
          else {
            val inner = c match {
              case Cast(i, _, _, _) => i
              case o => o
            }
            inner match {
              case AggregateExpression(Sum(we, _), Complete, false, _, _)
                  if !sawValue && wantSum(we) =>
                sawValue = true; VBOut.Value
              case _ => return None
            }
          }
        }
        if (sawValue) Some(outs) else None
      }
      base match {
        // ---- new / resurrected / expcon: Aggregate over a Join -----
        case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), _) =>
          if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
          (weightedTerm(l), weightedTerm(r)) match {
            case (Some(a), Some(b)) =>
              vbExpCon(a, b, cond, groups, aggs, sub0, sameAsGroup)
            case (wl, wr) =>
              val (wt, fSide) = wl.map((_, r))
                .orElse(wr.map((_, l))).getOrElse(return None)
              vbMinJoin(wt, fSide, cond, groups, sub0, valueOuts,
                sameAsGroup)
          }
        // ---- revenue (over the per-(id, period) frame) / anti ------
        case _: Aggregate =>
          if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
          val wt = weightedTerm(child).getOrElse(return None)
          val (gx, gShift) = stripShift(sub0(groups.head))
          val pOk = gx match {
            case a: AttributeReference => a.exprId == wt.pOut
            case _ => false
          }
          if (!pOk) return None
          val outs = valueOuts {
            case wa: AttributeReference => wa.exprId == wt.wOut
            case _ => false
          }.getOrElse(return None)
          val idFiltered = wt.notNullCols.contains(wt.idSrc.name)
          val kind = wt.anti match {
            case Some(adj) =>
              // LeftAnti keeps null-id rows raw; maps never carry them
              if (wt.idSrc.nullable && !idFiltered) return None
              return Some(ValueBridgeNeeds(wt.path, wt.tsCol,
                wt.idSrc.name, wt.weightSrc.name, wt.periodDays,
                wt.calendar, "anti", adj, wt.pShift + gShift, outs,
                wt.filters, wt.join, idFiltered, wt.idSrc.nullable,
                integral(wt.idSrc.dataType)))
            case None => "revenue"
          }
          Some(ValueBridgeNeeds(wt.path, wt.tsCol, wt.idSrc.name,
            wt.weightSrc.name, wt.periodDays, wt.calendar, kind, 0L,
            wt.pShift + gShift, outs, wt.filters, wt.join,
            idFiltered, wt.idSrc.nullable, integral(wt.idSrc.dataType)))
        // ---- direct off the source: revenue / the periods spine ----
        case other =>
          val (path, join, jpreds) = sourceOf(other).getOrElse(return None)
          val fs = sideFilters(preds0 ++ jpreds, sub0)
            .getOrElse(return None)
          val (gx, gShift) = stripShift(sub0(groups.head))
          val (tsCol, pd, cal) = periodKind(gx).getOrElse(return None)
          // IsNotNull conjuncts: a single id-column guard switches the
          // serve to the weight maps' row set (periods with ≥ 1
          // non-null id); a guard over the period derivation itself is
          // the serve's own null-period convention (see
          // [[CubeRewrite]]'s bridge scaladoc); anything else refuses
          // (it would drop rows the measure partials keep)
          var idNN: Option[AttributeReference] = None
          preds0.map(sub0).foreach {
            case IsNotNull(a: AttributeReference) =>
              if (idNN.exists(_.name != a.name)) return None
              idNN = Some(a)
            case IsNotNull(e)
                if periodKind(e).contains((tsCol, pd, cal)) => ()
            case IsNotNull(_) => return None
            case _ => ()
          }
          var wCol: Option[String] = None
          val outs = valueOuts { we0 =>
            (sub0(we0) match {
              case Cast(src: AttributeReference, dt: DecimalType, _, _)
                  if dt.precision == 18 && dt.scale == 2 => Some(src)
              case src: AttributeReference => src.dataType match {
                case dt: DecimalType
                    if dt.scale == 2 && dt.precision <= 18 => Some(src)
                case _ => None
              }
              case _ => None
            }) match {
              case Some(src) if wCol.isEmpty || wCol.contains(src.name) =>
                wCol = Some(src.name); true
              case _ => false
            }
          }.orElse {
            // no sum leaf: the observed-periods spine (DISTINCT p)
            if (aggs.size == 1 && sameAsGroup(aggs.head match {
              case a: AttributeReference => a
              case al: Alias => al.child
              case _ => return None
            })) Some(Seq(VBOut.Period)) else None
          }.getOrElse(return None)
          val kind = if (wCol.isEmpty) "periods" else "revenue"
          Some(ValueBridgeNeeds(path, tsCol,
            idNN.map(_.name).getOrElse(""), wCol.getOrElse(""), pd,
            cal, kind, 0L, gShift, outs, fs, join,
            idFiltered = idNN.nonEmpty, idNullable = true,
            integralId = idNN.forall(a => integral(a.dataType))))
      }
    case _ => None
  }

  /** expansion / contraction: two weighted sides inner-joined on
    * (same id, adjacent period). */
  private def vbExpCon(a: WeightedTermSide, b: WeightedTermSide,
      cond: Expression, groups: Seq[Expression],
      aggs: Seq[NamedExpression], sub0: Expression => Expression,
      sameAsGroup: Expression => Boolean): Option[ValueBridgeNeeds] = {
    if (a.path != b.path || a.join != b.join || a.tsCol != b.tsCol ||
      a.periodDays != b.periodDays || a.calendar != b.calendar)
      return None
    if (filterKey(a.filters) != filterKey(b.filters)) return None
    if (a.idSrc.name != b.idSrc.name) return None
    if (a.anti.nonEmpty || b.anti.nonEmpty) return None
    if (a.pShift != 0L || b.pShift != 0L) return None
    val aId = a.idOut.getOrElse(return None)
    val bId = b.idOut.getOrElse(return None)
    val cs = conjunctsOf(cond)
    if (cs.size != 2) return None
    var idEq = false
    // d: period(a) = period(b) + d
    var dOpt: Option[Long] = None
    cs.foreach {
      case EqualTo(x: AttributeReference, y: AttributeReference)
          if Set(x.exprId, y.exprId) == Set(aId, bId) => idEq = true
      case EqualTo(x, y) =>
        def pRef(e: Expression): Option[(Boolean, Long)] = {
          val (core, s) = stripShift(e)
          core match {
            case at: AttributeReference if at.exprId == a.pOut =>
              Some((true, s))
            case at: AttributeReference if at.exprId == b.pOut =>
              Some((false, s))
            case _ => None
          }
        }
        (pRef(x), pRef(y)) match {
          case (Some((isA1, s1)), Some((isA2, s2))) if isA1 != isA2 =>
            // pA + sA = pB + sB → pA = pB + (sB − sA)
            dOpt = Some(if (isA1) s2 - s1 else s1 - s2)
          case _ => return None
        }
      case _ => return None
    }
    if (!idEq) return None
    val d = dOpt.getOrElse(return None)
    // exactly adjacent: one side is the other's previous period
    val (cur, prv, curIsA) =
      if (d == 1L) (a, b, true)
      else if (d == -1L) (b, a, false)
      else return None
    // group: either side's period attr (+shift), labeled relative to
    // the CURRENT side's walk period
    val (gx, gShift) = stripShift(sub0(groups.head))
    val pShift = gx match {
      case at: AttributeReference if at.exprId == cur.pOut => gShift
      case at: AttributeReference if at.exprId == prv.pOut => gShift - 1L
      case _ => return None
    }
    var sawLeaf = false
    val outs = aggs.map { ne =>
      val c = ne match {
        case at: AttributeReference => (at: Expression)
        case al: Alias => al.child
        case _ => return None
      }
      if (sameAsGroup(c)) VBOut.Period
      else {
        val inner = c match { case Cast(i, _, _, _) => i; case o => o }
        inner match {
          case AggregateExpression(Sum(ge, _), Complete, false, _, _) =>
            val role = vbGreatestRole(ge, cur.wOut, prv.wOut)
              .getOrElse(return None)
            sawLeaf = true; role
          case _ => return None
        }
      }
    }
    if (!sawLeaf) return None
    val _ = curIsA
    Some(ValueBridgeNeeds(cur.path, cur.tsCol, cur.idSrc.name,
      cur.weightSrc.name, cur.periodDays, cur.calendar, "expcon", 0L,
      pShift, outs, cur.filters, cur.join,
      idFiltered = true, idNullable = cur.idSrc.nullable,
      integralId = integral(cur.idSrc.dataType)))
  }

  /** `greatest(curW − prvW, 0.00)` → Expansion; the reverse →
    * Contraction. The zero must be a literal decimal 0 (any scale-2
    * form); argument order of greatest is free. */
  private def vbGreatestRole(ge: Expression,
      curW: org.apache.spark.sql.catalyst.expressions.ExprId,
      prvW: org.apache.spark.sql.catalyst.expressions.ExprId):
      Option[VBOut] = {
    def isZero(e: Expression): Boolean = e match {
      case Literal(v: org.apache.spark.sql.types.Decimal, _) =>
        v.toBigDecimal.signum == 0
      case Literal(v: java.math.BigDecimal, _) => v.signum == 0
      case Cast(i, _, _, _) => isZero(i)
      case _ => false
    }
    def strip(e: Expression): Expression = e match {
      case Cast(i, _, _, _) => strip(i)
      case o => o
    }
    ge match {
      case org.apache.spark.sql.catalyst.expressions.Greatest(args)
          if args.size == 2 =>
        val (zeros, subs) = args.partition(isZero)
        if (zeros.size != 1) return None
        strip(subs.head) match {
          case Subtract(x: AttributeReference, y: AttributeReference, _)
              if x.exprId == curW && y.exprId == prvW =>
            Some(VBOut.Expansion)
          case Subtract(x: AttributeReference, y: AttributeReference, _)
              if x.exprId == prvW && y.exprId == curW =>
            Some(VBOut.Contraction)
          case _ => None
        }
      case _ => None
    }
  }

  /** new value (p = first period) / resurrected value (anti(−1) with
    * a strict earlier-activity witness): the weighted side joined to
    * the per-id min-period frame. */
  private def vbMinJoin(wt: WeightedTermSide, fSide: LogicalPlan,
      cond: Expression, groups: Seq[Expression],
      sub0: Expression => Expression,
      valueOuts: (Expression => Boolean) => Option[Seq[VBOut]],
      sameAsGroup: Expression => Boolean): Option[ValueBridgeNeeds] = {
    val (fBase, fEnv, fPreds) = peel(fSide)
    if (!fPreds.forall(_.isInstanceOf[IsNotNull])) return None
    val (fPath, fJoin, fGroups, fPassthroughs, fAl, fInnerPreds,
      fSub) = perIdAggregate(fBase, subst(fEnv) _)
      .getOrElse(return None)
    if (fGroups.size != 1) return None
    val (tsCol2, pd2, cal2) = fAl.child match {
      case AggregateExpression(Min(m), Complete, false, _, _) =>
        periodKind(fSub(m)).getOrElse(return None)
      case _ => return None
    }
    if (fPath != wt.path || fJoin != wt.join || tsCol2 != wt.tsCol ||
      pd2 != wt.periodDays || cal2 != wt.calendar) return None
    val fFs = sideFilters(fInnerPreds, fSub).getOrElse(return None)
    if (filterKey(fFs) != filterKey(wt.filters)) return None
    val (fIdOut, fIdSrc) = fGroups.head
    if (fIdSrc.name != wt.idSrc.name) return None
    val fIdPass = fPassthroughs.find(_.exprId == fIdOut.exprId)
    val wtId = wt.idOut.getOrElse(return None)
    val idIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      Set(wtId) ++ fIdPass.map(_.exprId)
    val fpId = fAl.toAttribute.exprId
    if (wt.pShift != 0L) return None
    val cs = conjunctsOf(cond)
    if (cs.size != 2) return None
    var idEq = false
    var kind: Option[String] = None
    cs.foreach {
      case EqualTo(x: AttributeReference, y: AttributeReference)
          if idIds.contains(x.exprId) && idIds.contains(y.exprId) &&
            x.exprId != y.exprId => idEq = true
      case EqualTo(x: AttributeReference, y: AttributeReference)
          if Set(x.exprId, y.exprId) == Set(wt.pOut, fpId) =>
        // p = first period → the NEW-value term (no anti child)
        if (wt.anti.nonEmpty) return None
        kind = Some("new")
      case LessThan(x: AttributeReference, y: AttributeReference)
          if x.exprId == fpId && y.exprId == wt.pOut =>
        // fp < p: the strict witness → resurrected (anti(−1) required)
        if (!wt.anti.contains(-1L)) return None
        kind = Some("resurrected")
      case GreaterThan(x: AttributeReference, y: AttributeReference)
          if x.exprId == wt.pOut && y.exprId == fpId =>
        if (!wt.anti.contains(-1L)) return None
        kind = Some("resurrected")
      case _ => return None
    }
    if (!idEq || kind.isEmpty) return None
    val (gx, gShift) = stripShift(sub0(groups.head))
    val pOk = gx match {
      case at: AttributeReference => at.exprId == wt.pOut
      case _ => false
    }
    if (!pOk) return None
    val outs = valueOuts {
      case wa: AttributeReference => wa.exprId == wt.wOut
      case _ => false
    }.getOrElse(return None)
    val _ = sameAsGroup
    Some(ValueBridgeNeeds(wt.path, wt.tsCol, wt.idSrc.name,
      wt.weightSrc.name, wt.periodDays, wt.calendar, kind.get, 0L,
      gShift, outs, wt.filters, wt.join,
      idFiltered = true, idNullable = wt.idSrc.nullable,
      integralId = integral(wt.idSrc.dataType)))
  }

  /** The per-id min-period frame the cohort matchers share: GROUP BY
    * id → min(period) straight off the source (possibly passing the
    * id through), under IsNotNull-only predicates, with the SAME
    * source / join identity / period derivation / dim filters as the
    * activity side. Returns the cohort output's exprId plus the id
    * passthrough's exprId (when the frame re-emits the id). */
  private def cohortMinFrame(fSide: LogicalPlan, path: String,
      join: Option[(String, String, String, String)], tsCol: String,
      periodDays: Int, calendar: Option[(String, Long)],
      filters: Seq[(String, Seq[Literal])], idName: String):
      Option[(org.apache.spark.sql.catalyst.expressions.ExprId,
        Option[org.apache.spark.sql.catalyst.expressions.ExprId])] = {
    val (fBase, fEnv, fPreds) = peel(fSide)
    if (!fPreds.forall(_.isInstanceOf[IsNotNull])) return None
    val (fPath, fJoin, fGroups, fPassthroughs, fAl, fInnerPreds,
      fSub) = perIdAggregate(fBase, subst(fEnv) _)
      .getOrElse(return None)
    if (fGroups.size != 1) return None
    val (tsCol2, pd2, cal2) = fAl.child match {
      case AggregateExpression(Min(m), Complete, false, _, _) =>
        periodKind(fSub(m)).getOrElse(return None)
      case _ => return None
    }
    if (fPath != path || fJoin != join || tsCol2 != tsCol ||
      pd2 != periodDays || cal2 != calendar) return None
    val fFs = sideFilters(fInnerPreds, fSub).getOrElse(return None)
    if (filterKey(fFs) != filterKey(filters)) return None
    // both sides must group/aggregate the SAME source id column
    val (fIdOut, fIdSrc) = fGroups.head
    if (fIdSrc.name != idName) return None
    val fIdPass = fPassthroughs.find(_.exprId == fIdOut.exprId)
    Some((fAl.toAttribute.exprId, fIdPass.map(_.exprId)))
  }

  /** The COHORT-VALUE plan shape — revenue by cohort age as users
    * write it raw:
    *
    *   g = source GROUP BY id, period → sum(CAST(w AS DEC(18,2))) AS v
    *   f = source GROUP BY id → min(period) AS cohort
    *   g ⋈ f ON id GROUP BY cohort, period − cohort
    *     → count / sum(v)
    *
    * Served exactly by [[CubeService.getCohortValue]]'s weight-map
    * algebra over a `weighted`-measured day-dimmed cube: per-period
    * weight maps pointwise-ADD to g's per-(id, period) sums, the
    * first-seen prefix-ANDNOT walk IS f, and each (cohort, offset)
    * cell's countIn/sumIn are the join-then-reaggregate. NULL ids
    * drop identically on both paths (the inner join never matches a
    * null key; the weight maps skip null ids at build), so count(1),
    * count(id) and count(DISTINCT id) all equal the cell's active
    * count regardless of id nullability. Refusals keep the honesty
    * contract: a min side from a different source / period width /
    * filter set, a weight sum outside the DECIMAL(18,2) money
    * discipline, extra aggregate leaves, non-IsNotNull predicates
    * above the join, and the f-over-g CTE shape (the min side must
    * scan the source directly) all return None.
    *
    * NULL-weight convention (documented, pinned in CubeServiceSpec):
    * the weight-map build stores a null weight as 0 with presence
    * kept, so a routed (cohort, offset) cell whose weights are ALL
    * NULL serves 0.00 where the raw sum(w) returns NULL. Refusing
    * every nullable weight source would refuse all parquet-backed
    * plans (parquet columns resolve nullable), so the divergence is
    * instead a declared convention of the weighted family — exact for
    * every cell with at least one non-null weight, which is every
    * cell of a revenue table that records amounts. */
  private[cube] def analyzeCohortValue(
      plan: LogicalPlan): Option[CohortValueNeeds] = plan match {
    case Aggregate(groups, aggs, child, _) if groups.size == 2 =>
      val (base, env0, preds0) = peel(child)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      val sub0 = subst(env0) _
      val (l, r, cond) = base match {
        case Join(jl, jr, org.apache.spark.sql.catalyst.plans.Inner,
            Some(jc), _) => (jl, jr, jc)
        case _ => return None
      }
      // the weighted pair side vs the per-id min side, either order;
      // extra plain groupings (segmented boards) are not this shape
      val sides: Option[(WeightedPairSide, LogicalPlan)] =
        weightedPairs(l).map((_, r)).orElse(weightedPairs(r).map((_, l)))
      val (g, fSide) = sides.getOrElse(return None)
      if (g.extraPlain.nonEmpty) return None
      // the min side: GROUP BY id → min(period) straight off the source
      val (cohortId, fIdPass) = cohortMinFrame(fSide, g.path, g.join,
        g.tsCol, g.periodDays, g.calendar, g.filters, g.idSrc.name)
        .getOrElse(return None)
      // the join condition: g.id = f.id, either order
      val idIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
        Set(g.idOut) ++ fIdPass
      cond match {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if idIds.contains(a.exprId) && idIds.contains(b.exprId) &&
              a.exprId != b.exprId => ()
        case _ => return None
      }
      // role of one expression: the cohort attr, the period attr, or
      // their difference (period − cohort, the age/offset form)
      def roleOf(e0: Expression): Option[CVOut] = sub0(e0) match {
        case a: AttributeReference if a.exprId == cohortId =>
          Some(CVOut.Cohort)
        case a: AttributeReference if a.exprId == g.pOut =>
          Some(CVOut.Period)
        case Subtract(pa: AttributeReference, ca: AttributeReference, _)
            if pa.exprId == g.pOut && ca.exprId == cohortId =>
          Some(CVOut.Offset)
        case _ => None
      }
      val groupRoles = groups.map(e => roleOf(e).getOrElse(return None))
      if (!groupRoles.contains(CVOut.Cohort) ||
        groupRoles.toSet.size != 2) return None
      // id type is NOT a refusal: an integral id keys the maps as
      // CAST(id AS BIGINT); a non-integral id is served exactly by a
      // DICT-weighted cube (weightedIdCol rides the dictBitmaps dense
      // ids — injective, and the serve's cells are id-free, so no
      // translation is ever needed). The rewrite binds only cubes that
      // maintain a weighted measure on this exact column, and cube
      // creation already refuses a non-integral weighted id with no
      // dictionary — so `integralId` here only steers the ADVISOR's
      // rec (bitmaps vs dictBitmaps), never correctness.
      var sawValue = false
      var sawActive = false
      val outs: Seq[CVOut] = aggs.map { ne =>
        val asGroup = ne match {
          case a: AttributeReference => roleOf(a)
          case al: Alias => roleOf(al.child)
          case _ => None
        }
        asGroup.getOrElse(ne match {
          case al: Alias => al.child match {
            case AggregateExpression(Count(Seq(Literal(1, _))),
                Complete, false, _, _) =>
              sawActive = true; CVOut.Active
            case AggregateExpression(Count(Seq(
                ca: AttributeReference)), Complete, _, _, _)
                if idIds.contains(ca.exprId) =>
              sawActive = true; CVOut.Active
            case AggregateExpression(Sum(
                wa: AttributeReference, _), Complete, false, _, _)
                if wa.exprId == g.wOut =>
              sawValue = true; CVOut.Value
            case Cast(AggregateExpression(Sum(
                wa: AttributeReference, _), Complete, false, _, _),
                _, _, _) if wa.exprId == g.wOut =>
              sawValue = true; CVOut.Value
            case _ => return None
          }
          case _ => return None
        })
      }
      if (!sawValue && !sawActive) return None
      Some(CohortValueNeeds(g.path, g.tsCol, g.idSrc.name,
        g.weightSrc.name, g.periodDays, outs, g.filters, g.join,
        g.calendar, integral(g.idSrc.dataType)))
    case _ => None
  }

  /** What one recognized COHORT-MATRIX (count-distinct heatmap) query
    * needs: the source vocabulary of the classic BI retention
    * triangle, served by [[CubeService.getCohortMatrix]]'s
    * prefix-ANDNOT + AND-cardinality walk over a day-dimmed bitmap
    * cube. Reuses the [[CVOut]] roles (never Value — no weight column
    * exists in this shape). */
  private[cube] final case class CohortMatrixNeeds(
      path: String, tsCol: String, idCol: String, periodDays: Int,
      outs: Seq[CVOut],
      filters: Seq[(String, Seq[Literal])] = Nil,
      join: Option[(String, String, String, String)] = None,
      calendar: Option[(String, Long)] = None,
      integralId: Boolean = true)

  /** The COHORT-MATRIX plan shape — the count-distinct retention
    * heatmap as every BI tool writes it raw (the single most common
    * cohort SQL in existence):
    *
    *   a = (DISTINCT) (id, period) activity pairs off the source
    *   f = source GROUP BY id → min(period) AS cohort
    *   a ⋈ f ON id GROUP BY cohort, period − cohort
    *     → count(DISTINCT id)
    *
    * Served exactly by [[CubeService.getCohortMatrix]]'s bitmap
    * algebra over a day-dimmed bitmap cube: new_w = P_w ANDNOT
    * prefixOR(P_{<w}) IS f's cohort partition, and each
    * (cohort, offset) cell's |new_w ∩ P_{w+k}| is the join-then-
    * recount. NULL ids drop identically on both paths (the inner join
    * never matches a null key; bitmaps skip null ids at build).
    * The pair side arrives deduplicated (an Aggregate) or bare (the
    * optimizer's RemoveRedundantAggregates strips a distinct that a
    * count(DISTINCT) head makes redundant — the [[projectedPairs]]
    * discipline): count(DISTINCT id) is exact over either; count(1) /
    * count(id) are accepted only over a DEDUPLICATED pair side, where
    * each (cohort, offset) group holds exactly one row per id.
    * Refusals keep the honesty contract: a min side from a different
    * source / period width / filter set, extra pair columns
    * (segments), plain counts over a non-deduplicated side,
    * non-IsNotNull predicates above the join, and group roles other
    * than {cohort} × {period | offset} all return None. */
  private[cube] def analyzeCohortMatrix(
      plan: LogicalPlan): Option[CohortMatrixNeeds] = plan match {
    case Aggregate(groups, aggs, child, _) if groups.size == 2 =>
      val (base, env0, preds0) = peel(child)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      val sub0 = subst(env0) _
      val (l, r, cond) = base match {
        case Join(jl, jr, org.apache.spark.sql.catalyst.plans.Inner,
            Some(jc), _) => (jl, jr, jc)
        case _ => return None
      }
      // the activity-pair side vs the per-id min side, either order
      def pairOf(p: LogicalPlan): Option[(PairSide, Boolean)] =
        distinctPairs(p).map((_, true))
          .orElse(projectedPairs(p).map((_, false)))
      val sides = pairOf(l).map((_, r)).orElse(pairOf(r).map((_, l)))
      val ((g, deduped), fSide) = sides.getOrElse(return None)
      // exactly one non-period pair column: the counted id (a second
      // plain column would be a segment this serve does not partition)
      if (g.cols.size != 1) return None
      val (gIdOut, gIdSrc) = g.cols.head
      val (cohortId, fIdPass) = cohortMinFrame(fSide, g.path, g.join,
        g.tsCol, g.periodDays, g.calendar, g.filters, gIdSrc.name)
        .getOrElse(return None)
      // the join condition: a.id = f.id, either order
      val idIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
        Set(gIdOut) ++ fIdPass
      cond match {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if idIds.contains(a.exprId) && idIds.contains(b.exprId) &&
              a.exprId != b.exprId => ()
        case _ => return None
      }
      def roleOf(e0: Expression): Option[CVOut] = sub0(e0) match {
        case a: AttributeReference if a.exprId == cohortId =>
          Some(CVOut.Cohort)
        case a: AttributeReference if a.exprId == g.pId =>
          Some(CVOut.Period)
        case Subtract(pa: AttributeReference, ca: AttributeReference, _)
            if pa.exprId == g.pId && ca.exprId == cohortId =>
          Some(CVOut.Offset)
        case _ => None
      }
      val groupRoles = groups.map(e => roleOf(e).getOrElse(return None))
      if (!groupRoles.contains(CVOut.Cohort) ||
        groupRoles.toSet.size != 2) return None
      var sawActive = false
      val outs: Seq[CVOut] = aggs.map { ne =>
        val asGroup = ne match {
          case a: AttributeReference => roleOf(a)
          case al: Alias => roleOf(al.child)
          case _ => None
        }
        asGroup.getOrElse(ne match {
          case al: Alias => al.child match {
            case AggregateExpression(Count(Seq(
                ca: AttributeReference)), Complete, true, _, _)
                if idIds.contains(ca.exprId) =>
              sawActive = true; CVOut.Active
            // a deduplicated pair side makes the plain counts exact
            // too: each (cohort, offset) group holds one row per id
            case AggregateExpression(Count(Seq(Literal(1, _))),
                Complete, false, _, _) if deduped =>
              sawActive = true; CVOut.Active
            case AggregateExpression(Count(Seq(
                ca: AttributeReference)), Complete, false, _, _)
                if deduped && idIds.contains(ca.exprId) =>
              sawActive = true; CVOut.Active
            case _ => return None
          }
          case _ => return None
        })
      }
      if (!sawActive) return None
      Some(CohortMatrixNeeds(g.path, g.tsCol, gIdSrc.name,
        g.periodDays, outs, g.filters, g.join, g.calendar,
        integral(gIdSrc.dataType)))
    case _ => None
  }

  /** What one recognized TIME-TO-CONVERT query needs: the raw
    * conversion-lag histogram's source vocabulary, served by
    * [[CubeService.getTimeToConvert]]'s (F, N) bitmap pairing. */
  private[cube] final case class TimeToConvertNeeds(
      path: String, tsCol: String, idCol: String, periodDays: Int,
      integralId: Boolean, stepCol: String, steps: Seq[String],
      outs: Seq[RollOut],
      join: Option[(String, String, String, String)] = None,
      calendar: Option[(String, Long)] = None)

  /** The TIME-TO-CONVERT plan shape — q278's raw form, "how long does
    * the funnel take":
    *
    *   s_1 = step-1 min frame (id → t_1)
    *   s_K = the full min-chain (id → t_K)
    *   s_K ⋈ s_1 ON id GROUP BY t_K − t_1 → count
    *
    * routed to the [[CubeService.getTimeToConvert]] algebra: F_p
    * (first step-1 period = p) paired with N_q (newly converted at q)
    * — every converted id lands in exactly one (F, N) cell at its
    * true lag, so the AND-cardinality histogram equals the per-id
    * subtraction re-count. Refusals: a short side that is not exactly
    * the chain's FIRST stage (a t_3 − t_2 lag has no F-frame), a
    * windowed chain (the bounded recursion's t_1 is a different
    * anchor), mismatched sources/periods/filters, a reversed or
    * non-subtraction grouping, extra join conjuncts. count(1) /
    * count(id) / count(DISTINCT id) all equal here — the join's rows
    * are one per converted id and null ids never join. */
  private[cube] def analyzeTimeToConvert(
      plan: LogicalPlan): Option[TimeToConvertNeeds] = plan match {
    case Aggregate(groups, aggs, child, _) if groups.size == 1 =>
      val (base, env0, preds0) = peel(child)
      if (!preds0.forall(_.isInstanceOf[IsNotNull])) return None
      val sub0 = subst(env0) _
      base match {
        case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), _) =>
          val cl = minChain(l).getOrElse(return None)
          val cr = minChain(r).getOrElse(return None)
          val (long, short) =
            if (cl.steps.size >= cr.steps.size) (cl, cr) else (cr, cl)
          if (short.steps != Seq(long.steps.head)) return None
          if (long.steps.size < 2 || long.steps.size > 8) return None
          if (long.within != 0L || short.within != 0L) return None
          if (long.path != short.path || long.join != short.join ||
            long.tsCol != short.tsCol ||
            long.periodDays != short.periodDays ||
            long.calendar != short.calendar ||
            long.idSrc.name != short.idSrc.name) return None
          val cs = conjunctsOf(cond).filterNot(_.isInstanceOf[IsNotNull])
          val idIds = Set(long.idOut, short.idOut)
          cs match {
            case Seq(EqualTo(a: AttributeReference,
                b: AttributeReference))
                if Set(a.exprId, b.exprId) == idIds => ()
            case _ => return None
          }
          val lagOk = sub0(groups.head) match {
            case Subtract(a: AttributeReference, b: AttributeReference,
                _) => a.exprId == long.tOut && b.exprId == short.tOut
            case _ => false
          }
          if (!lagOk) return None
          def sameAsGroup(e: Expression): Boolean =
            sub0(e).canonicalized == sub0(groups.head).canonicalized
          var counted = false
          val outs: Seq[RollOut] = aggs.map { ne =>
            val c = ne match {
              case a: AttributeReference => (a: Expression)
              case al: Alias => al.child
              case _ => return None
            }
            if (sameAsGroup(c)) RollOut.Day
            else c match {
              case AggregateExpression(Count(Seq(Literal(v, _))),
                  Complete, false, _, _) if v != null =>
                counted = true; RollOut.Leaf("count", "")
              case AggregateExpression(Count(Seq(a: AttributeReference)),
                  Complete, _, _, _) if idIds.contains(a.exprId) =>
                counted = true; RollOut.Leaf("count", "")
              case _ => return None
            }
          }
          if (!counted) return None
          Some(TimeToConvertNeeds(long.path, long.tsCol,
            long.idSrc.name, long.periodDays,
            integral(long.idSrc.dataType), long.stepCol, long.steps,
            outs, long.join, long.calendar))
        case _ => None
      }
    case _ => None
  }

  /** The bitmap family's type boundary (see [[CubeManager.create]]'s
    * validation): distinct ids must be integral for the cast-to-BIGINT
    * bit encoding to be injective. */
  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  }

  // ---- plan analysis ---------------------------------------------------

  /** Extract what a single query plan needs, or None when the rewrite
    * could never serve it (so recommending for it would be dishonest). */
  private def analyze(plan: LogicalPlan): Option[Needs] = plan match {
    // the analyzer lowers rollup/cube/grouping-sets to Aggregate over
    // Expand; the FINEST grouping set's slot definitions are the dims
    case Aggregate(_, aggs, exp: Expand, _) =>
      val (base, env, preds0) = peel(exp.child)
      val (path, join, sidePreds) = sourceOf(base).getOrElse(return None)
      val preds = preds0 ++ sidePreds
      val gidName =
        org.apache.spark.sql.catalyst.expressions.VirtualColumn.groupingIdName
      val gidIdx = exp.output.indexWhere(_.name == gidName)
      // a grouping slot is one whose defs vary per set (the defining
      // expression in the finest set, a typed null elsewhere);
      // passthrough slots repeat the same attribute in every
      // projection. A slot whose non-null defs DISAGREE across sets is
      // not the analyzer's lowered shape — refuse the query rather
      // than advise a cube that would not route (the rewrite applies
      // the same distinct-defs check).
      var slotsOk = true
      val slotDefs: Seq[Expression] = exp.output.indices
        .filter(i => i != gidIdx)
        .flatMap { i =>
          val defs = exp.projections.map(_(i))
          val nonNull = defs.filter {
            case Literal(null, _) => false
            case _ => true
          }
          if (nonNull.size < defs.size && nonNull.nonEmpty) {
            if (nonNull.map(_.canonicalized).distinct.size != 1)
              slotsOk = false
            Some(nonNull.head)
          } else None
        }
      if (!slotsOk) return None
      build(path, slotDefs.map(subst(env)), preds.map(subst(env)),
        aggLeaves(aggs).getOrElse(return None), join)
    case Aggregate(groups, aggs, child, _) =>
      val (base, env, preds0) = peel(child)
      sourceOf(base) match {
        case Some((path, join, sidePreds)) =>
          build(path, groups.map(subst(env)),
            (preds0 ++ sidePreds).map(subst(env)),
            aggLeaves(aggs).getOrElse(return None), join)
        case None =>
          // a 3+-relation inner equi-join tree: the CHAIN-MV family
          val (key, paths, edges, sidePreds) =
            chainSourceOf(base).getOrElse(return None)
          build(key, groups.map(subst(env)),
            (preds0 ++ sidePreds).map(subst(env)),
            aggLeaves(aggs).getOrElse(return None), None,
            chain = Some((paths, edges)))
      }
    case _ => None
  }

  /** Resolve the plan under an aggregate to something a cube can be
    * built over: a parquet relation, or an inner equi-join of two —
    * returning a merge key, the join info, and side-filter conjuncts
    * (minus the inferred isnotnull on the join keys, which the inner
    * join itself implies). */
  private def sourceOf(base: LogicalPlan)
      : Option[(String, Option[(String, String, String, String)],
          Seq[Expression])] =
    CubeCatalog.sourcePathOf(base) match {
      case Some(p) => Some((p, None, Nil))
      case None => base match {
        case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), _) =>
          val (lb, _, lpreds) = peel(l)
          val (rb, _, rpreds) = peel(r)
          for {
            lp <- CubeCatalog.sourcePathOf(lb)
            rp <- CubeCatalog.sourcePathOf(rb)
            keys <- cond match {
              case EqualTo(a: AttributeReference, b: AttributeReference) =>
                if (l.outputSet.contains(a) && r.outputSet.contains(b))
                  Some((a.name, b.name))
                else if (l.outputSet.contains(b) && r.outputSet.contains(a))
                  Some((b.name, a.name))
                else None
              case _ => None
            }
          } yield (s"$lp|$rp|${keys._1}|${keys._2}",
            Some((lp, rp, keys._1, keys._2)),
            (lpreds ++ rpreds).filterNot {
              case IsNotNull(x: AttributeReference) =>
                x.name == keys._1 || x.name == keys._2
              case _ => false
            })
        case _ => None
      }
    }

  /** Resolve a 3+-relation INNER EQUI-JOIN TREE to a registrable CHAIN
    * vocabulary: the relation paths LINEARIZED into
    * [[ChainCubeManager]]'s prefix order (each edge joins relation
    * i+1 to a column of relations 0..i — any join-tree associativity
    * admits such an order exactly when the single-equality edges form
    * a spanning tree over the relations), plus a merged grouping key
    * and side-filter conjuncts (minus the inferred isnotnull on edge
    * keys, implied by the inner joins). Refusals mirror the places
    * `ChainCubeManager.create` would refuse: duplicate relation
    * paths, overlapping column names (both make name-based edges
    * ambiguous), non-spanning or extra edges, outer joins, theta
    * conjuncts. */
  private def chainSourceOf(base: LogicalPlan)
      : Option[(String, Seq[String], Seq[(String, String)],
          Seq[Expression])] = {
    final case class Rel(path: String, cols: Set[String])
    def flat(p: LogicalPlan): Option[(Vector[Rel],
        Vector[(String, String)], Vector[Expression])] = {
      val (b, env, preds) = peel(p)
      val sub = subst(env) _
      b match {
        case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
            Some(cond), _) =>
          val eq = conjunctsOf(cond)
            .filterNot(_.isInstanceOf[IsNotNull]) match {
            case Seq(EqualTo(a: AttributeReference,
                b2: AttributeReference)) => Some((a.name, b2.name))
            case _ => None
          }
          for {
            e <- eq
            lf <- flat(l)
            rf <- flat(r)
          } yield (lf._1 ++ rf._1, (lf._2 ++ rf._2) :+ e,
            lf._3 ++ rf._3 ++ preds.map(sub))
        case leaf =>
          CubeCatalog.sourcePathOf(leaf).map(p0 =>
            (Vector(Rel(p0, leaf.output.map(_.name).toSet)),
              Vector.empty[(String, String)], preds.map(sub).toVector))
      }
    }
    val (rels, pairs, preds) = flat(base).getOrElse(return None)
    if (rels.size < 3) return None
    // pairwise-disjoint column names make name membership unambiguous;
    // duplicate paths are un-linearizable by name — both refuse here
    // exactly where ChainCubeManager would refuse at create
    if (rels.map(_.path).distinct.size != rels.size) return None
    val allCols = rels.flatMap(_.cols.toSeq)
    if (allCols.distinct.size != allCols.size) return None
    // linearize the spanning tree into chain order: greedily attach a
    // remaining relation reachable from the prefix by one pool edge
    def linearize(startIdx: Int): Option[(Vector[Rel],
        Vector[(String, String)])] = {
      var order = Vector(rels(startIdx))
      var rest = rels.patch(startIdx, Nil, 1)
      var pool = pairs
      var chosen = Vector.empty[(String, String)]
      while (rest.nonEmpty) {
        val prefix: Set[String] = order.flatMap(_.cols.toSeq).toSet
        val hit = pool.iterator.flatMap { case (a, b) =>
          val oriented =
            if (prefix(a) && !prefix(b)) Some(((a, b), (a, b)))
            else if (prefix(b) && !prefix(a)) Some(((a, b), (b, a)))
            else None
          oriented.flatMap { case (orig, (pc, rc)) =>
            rest.find(_.cols(rc)).map(rel => (orig, (pc, rc), rel))
          }
        }.take(1).toSeq.headOption
        hit match {
          case Some((orig, e, rel)) =>
            chosen :+= e
            order :+= rel
            rest = rest.filterNot(_ eq rel)
            pool = pool.patch(pool.indexOf(orig), Nil, 1)
          case None => return None
        }
      }
      if (pool.nonEmpty) return None // a leftover edge is a cycle/theta
      Some((order, chosen))
    }
    val (order, edges) = rels.indices.view.flatMap(linearize(_))
      .headOption.getOrElse(return None)
    val keyCols = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
    val kept = preds.filterNot {
      case IsNotNull(x: AttributeReference) => keyCols.contains(x.name)
      case _ => false
    }
    val paths = order.map(_.path)
    // the merge key is ORDER-CANONICAL (sorted paths + sorted
    // orientation-normalized edges): two parenthesizations of the same
    // multiset join group into ONE recommendation even when the greedy
    // linearizer visits their trees in different prefix orders — the
    // rec carries one valid linearization, and routing matches
    // multisets, so any of them serves every form
    Some((chainKey(paths, edges), paths, edges, kept))
  }

  /** The order-canonical chain identity (sorted paths + sorted
    * orientation-normalized edges) — shared by [[chainSourceOf]], the
    * cohort matchers' chain fallback, and the rewrite's chain-MV
    * candidate lookup, so "same chain" is ONE string comparison no
    * matter which linearization each side carries. */
  private[cube] def chainKey(paths: Seq[String],
      edges: Seq[(String, String)]): String =
    paths.sorted.mkString("|") + "||" +
      edges.map { case (a, b) => Seq(a, b).sorted.mkString("=") }
        .sorted.mkString("|")

  /** Pair-side source resolution for the COHORT matchers: [[sourceOf]]
    * (one relation or a binary inner equi-join), extended with the
    * CHAIN fallback — a registrable 3+-relation inner equi-join tree
    * collapses to its order-canonical [[chainKey]] (join stays None;
    * the rewrite matches the key against registered chain MVs), with
    * the linearized (paths, edges) carried for the advisor's chain
    * fold. Both sides of a cohort self-join over the same chain
    * produce the same canonical key, so every "same source" check in
    * the matchers keeps working as a single path comparison. */
  private def cohortSourceOf(base: LogicalPlan)
      : Option[(String, Option[(String, String, String, String)],
          Seq[Expression],
          Option[(Seq[String], Seq[(String, String)])])] =
    sourceOf(base).map { case (p, j, preds) => (p, j, preds, None) }
      .orElse(chainSourceOf(base).map { case (key, paths, edges, preds) =>
        (key, None, preds, Some((paths, edges))) })

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      conjunctsOf(a) ++ conjunctsOf(b)
    case other => Seq(other)
  }

  /** Peel attribute/alias Projects and Filters down to the relation,
    * collecting alias definitions and filter conjuncts (the same
    * normalization [[CubeRewriteRule]] applies before matching). */
  private def peel(p: LogicalPlan): (LogicalPlan,
      Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
      Seq[Expression]) = {
    var env = Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Expression]
    var preds = Vector.empty[Expression]
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def go(q: LogicalPlan): LogicalPlan = q match {
      case pr: Project if pr.projectList.forall(e =>
          e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        env ++= pr.projectList.collect {
          case a: Alias => a.toAttribute.exprId -> a.child
        }
        go(pr.child)
      case f: Filter => preds ++= conjuncts(f.condition); go(f.child)
      case org.apache.spark.sql.catalyst.plans.logical
          .SubqueryAlias(_, c) => go(c)
      case other => other
    }
    (go(p), env, preds)
  }

  private def subst(
      env: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])(
      e: Expression): Expression = e.transformUp {
    case a: AttributeReference if env.contains(a.exprId) => env(a.exprId)
  }

  /** Aggregate leaves → measure-family needs keyed by column name;
    * None when any leaf is one the rewrite cannot serve. */
  private final case class Leaves(sums: Seq[String], sketches: Seq[String],
      quantiles: Seq[String], extremes: Seq[String],
      xdistincts: Seq[String] = Nil)
  private def aggLeaves(aggs: Seq[Expression]): Option[Leaves] = {
    var sums = Vector.empty[String]
    var sks = Vector.empty[String]
    var qs = Vector.empty[String]
    var exts = Vector.empty[String]
    var xds = Vector.empty[String]
    var ok = true
    def colName(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      case Cast(inner, _, _, _) => colName(inner)
      case _ => None
    }
    aggs.foreach(_.foreach {
      case AggregateExpression(fn, Complete, false, _, _) => fn match {
        case Sum(Cast(inner, _: DecimalType, _, _), _) =>
          colName(inner) match {
            case Some(n) => sums :+= n
            case None => ok = false
          }
        case Count(Seq(Literal(v, _))) if v != null => ()
        case HyperLogLogPlusPlus(child, _, _, _) =>
          colName(child) match {
            case Some(n) => sks :+= n
            case None => ok = false
          }
        case ap: ApproximatePercentile =>
          colName(ap.child) match {
            case Some(n) => qs :+= n
            case None => ok = false
          }
        case Min(child) => colName(child) match {
          case Some(n) => exts :+= n
          case None => ok = false
        }
        case Max(child) => colName(child) match {
          case Some(n) => exts :+= n
          case None => ok = false
        }
        case _ => ok = false
      }
      // count(DISTINCT x) over an INTEGRAL key column IS servable from
      // cells — as bitmap partials (lossless union, the q209 routing):
      // the recommendation materializes a bitmap measure and the
      // rewrite's exact-distinct path routes the query. Non-integral
      // keys refuse below (the lossy cast would be silently wrong).
      case AggregateExpression(Count(Seq(c)), Complete, true, _, _)
          if integral(c.dataType) && colName(c).isDefined =>
        xds :+= colName(c).get
      // anything else aggregate-shaped — DISTINCT aggregates over
      // non-integral columns (exact distinct cannot be served from
      // cells without a lossless bitmap encoding), non-Complete modes,
      // filtered aggregates — is unservable: without this arm a
      // count(DISTINCT x) would silently match no case and the query
      // would be reported covered by a cube that can never route it
      case _: AggregateExpression => ok = false
      case _ => ()
    })
    if (ok) Some(Leaves(sums, sks, qs, exts, xds)) else None
  }

  /** Grouping + filter expressions → dims; refuse shapes the canonical
    * dim match could never bind (anything beyond a plain column or a
    * `date_trunc` bucket). Filter columns become FieldDims: the
    * cell-filter rewrite serves a predicate only over dimension
    * attributes. */
  private def build(path: String, groups: Seq[Expression],
      preds: Seq[Expression], leaves: Leaves,
      join: Option[(String, String, String, String)],
      chain: Option[(Seq[String], Seq[(String, String)])] = None)
      : Option[Needs] = {
    val dims = groups.map {
      case a: Attribute => FieldDim(a.name, a.name)
      case TruncTimestamp(Literal(g, _), arg, _) =>
        val col = arg match {
          case a: Attribute => a.name
          case Cast(a: Attribute, _, _, _) => a.name
          case _ => return None
        }
        TimeDim(s"${col}_$g", col, g.toString)
      case _ => return None
    }
    // a predicate is DIM-SHAPED when it constrains the column to
    // discrete points (equality / IN / null tests) — the natural usage
    // of a dimension column. A range predicate (value > 10) is
    // measure-shaped: promoting its column to a dim is still REQUIRED
    // for the query to route (the cell-filter rewrite serves predicates
    // only over dimension attributes), but one range filter on a
    // high-cardinality measure column yields an advised cube with
    // near-source-cardinality cells, so such columns are surfaced in
    // [[CubeRecommendation.rangeOnlyDims]] — a structural warning that
    // does not need the (optional) stats probe to fire.
    // three-way classification: POINT predicates vouch for the column
    // being dimension-shaped; NULL TESTS are neutral (the optimizer
    // plants isnotnull under every comparison — it vouches for
    // nothing); everything else is range-shaped
    def pointShaped(p: Expression): Boolean = p match {
      case _: EqualTo | _: EqualNullSafe | _: In | _: InSet => true
      case org.apache.spark.sql.catalyst.expressions.Not(inner) =>
        pointShaped(inner)
      case _ => false
    }
    def nullTest(p: Expression): Boolean = p match {
      case _: IsNull | _: IsNotNull => true
      case org.apache.spark.sql.catalyst.expressions.Not(inner) =>
        nullTest(inner)
      case _ => false
    }
    val rangeCols = preds.filterNot(p => pointShaped(p) || nullTest(p))
      .flatMap(_.references.map(_.name)).distinct
    val pointCols = preds.filter(pointShaped)
      .flatMap(_.references.map(_.name)).distinct
    val filterDims = preds.flatMap(_.references).toSeq.distinct
      .map(a => FieldDim(a.name, a.name))
      // a filter on a column already grouped as a FieldDim needs no
      // second dim — the grouped dim serves it. A TimeDim on the same
      // column does NOT: the rewrite can only serve predicates over
      // dimension ATTRIBUTES, and a raw-column predicate (ts >= X)
      // cannot be rewritten onto the day bucket — dropping the
      // FieldDim here would report the query covered while the
      // materialized cube refuses to route it. Keeping the raw column
      // as an extra dim preserves the route-on-registration contract;
      // its (possibly brutal) cardinality cost is exactly what
      // adviseWithStats exists to surface.
      .filterNot(fd => dims.exists {
        case FieldDim(_, p) => p == fd.path
        case _ => false
      })
    def ms(names: Seq[String], suffix: String): Seq[Measure] =
      names.distinct.map(n => Measure(s"${n}_$suffix", n))
    Some(Needs(path, dims ++ filterDims,
      ms(leaves.sums, "sum"), ms(leaves.sketches, "nd"),
      ms(leaves.quantiles, "dist"), ms(leaves.extremes, "x"), join,
      // flagged: promoted into the config ONLY because of a range
      // predicate — no grouping and no point predicate vouches for the
      // column being dimension-shaped
      rangeDims = rangeCols.filterNot(pointCols.contains)
        .filter(c => filterDims.exists(_.path == c)),
      bitmaps = ms(leaves.xdistincts, "xd"),
      chain = chain))
  }
}
