package graft.cube

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, IsNotNull, Literal, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Complete, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project}
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
      sourceRows: Option[Long] = None) {
    def worthwhile: Boolean = (cells, sourceRows) match {
      case (Some(c), Some(r)) => r > 0 && c.toDouble / r <= 0.5
      case _ => true // structural mode: no evidence against
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

  /** What one analyzable aggregate needs from a cube. `join` is set
    * when the aggregate sits over an inner equi-join of two parquet
    * relations (leftPath, rightPath, leftKey, rightKey). */
  private final case class Needs(
      path: String,
      dims: Seq[Dimension],
      measures: Seq[Measure],
      sketches: Seq[Measure],
      quantiles: Seq[Measure],
      extremes: Seq[Measure],
      join: Option[(String, String, String, String)] = None)

  /** The advisor's full answer: single-table cube recommendations,
    * join-MV recommendations, and the workload indices nothing could
    * cover. */
  final case class Advice(cubes: Seq[CubeRecommendation],
      joinCubes: Seq[JoinCubeRecommendation], uncovered: Seq[Int])

  /** Structural advice: no data is read. */
  def advise(workload: Seq[DataFrame],
      namePrefix: String = "advised"): Advice = {
    val analyzed: Seq[(Int, Option[Needs])] =
      workload.zipWithIndex.map { case (df, i) =>
        i -> analyze(df.queryExecution.optimizedPlan)
      }
    val uncovered = analyzed.collect { case (i, None) => i }
    val bySource = analyzed.collect { case (i, Some(n)) => (i, n) }
      .groupBy(_._2.path)
    def mergedConfig(name: String, source: String,
        entries: Seq[(Int, Needs)]): CubeConfig = {
      def mergeMeasures(get: Needs => Seq[Measure]): Seq[Measure] =
        entries.flatMap(e => get(e._2)).distinctBy(_.path)
      val dims = entries.flatMap(_._2.dims)
        .distinctBy(d => d match {
          case FieldDim(_, p) => ("f", p, "")
          case TimeDim(_, p, g) => ("t", p, g)
          case ExprDim(_, s) => ("e", s, "")
        })
      CubeConfig(name, source, dims,
        measures = mergeMeasures(_.measures),
        sketches = mergeMeasures(_.sketches),
        quantiles = mergeMeasures(_.quantiles),
        extremes = mergeMeasures(_.extremes))
    }
    var singles = Vector.empty[CubeRecommendation]
    var joins = Vector.empty[JoinCubeRecommendation]
    bySource.toSeq.sortBy(_._1).zipWithIndex.foreach {
      case ((path, entries), k) =>
        entries.head._2.join match {
          case None =>
            singles :+= CubeRecommendation(path,
              mergedConfig(s"${namePrefix}_$k", path, entries),
              entries.map(_._1))
          case Some((lp, rp, lk, rk)) =>
            joins :+= JoinCubeRecommendation(lp, rp,
              JoinCubeConfig(
                mergedConfig(s"${namePrefix}_join_$k", path, entries),
                leftKey = lk, rightKey = rk),
              entries.map(_._1))
        }
    }
    Advice(singles, joins, uncovered)
  }

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
    // dims over the joined frame themselves
    a.copy(cubes = measured)
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
      val (path, join, sidePreds) = sourceOf(base).getOrElse(return None)
      build(path, groups.map(subst(env)), (preds0 ++ sidePreds).map(subst(env)),
        aggLeaves(aggs).getOrElse(return None), join)
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
      quantiles: Seq[String], extremes: Seq[String])
  private def aggLeaves(aggs: Seq[Expression]): Option[Leaves] = {
    var sums = Vector.empty[String]
    var sks = Vector.empty[String]
    var qs = Vector.empty[String]
    var exts = Vector.empty[String]
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
      // anything else aggregate-shaped — DISTINCT aggregates (exact
      // distinct cannot be served from cells), non-Complete modes,
      // filtered aggregates — is unservable: without this arm a
      // count(DISTINCT x) would silently match no case and the query
      // would be reported covered by a cube that can never route it
      case _: AggregateExpression => ok = false
      case _ => ()
    })
    if (ok) Some(Leaves(sums, sks, qs, exts)) else None
  }

  /** Grouping + filter expressions → dims; refuse shapes the canonical
    * dim match could never bind (anything beyond a plain column or a
    * `date_trunc` bucket). Filter columns become FieldDims: the
    * cell-filter rewrite serves a predicate only over dimension
    * attributes. */
  private def build(path: String, groups: Seq[Expression],
      preds: Seq[Expression], leaves: Leaves,
      join: Option[(String, String, String, String)]): Option[Needs] = {
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
      ms(leaves.quantiles, "dist"), ms(leaves.extremes, "x"), join))
  }
}
