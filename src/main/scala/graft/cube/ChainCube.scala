package graft.cube

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained CHAINED JOIN materialized view: a cube over
  * `R₀ ⋈ R₁ ⋈ … ⋈ R_{n−1}` (n ≥ 3; chains AND stars — each edge joins
  * the next relation to ANY column of the prefix join, so
  * `orders ⋈ lineitem` + `orders ⋈ customer` registers as one chain)
  * kept fresh under signed deltas to ANY relation.
  *
  * The binary delta-join rule composes associatively: a batch touching
  * one relation folds as
  *
  *   Δ(R₀ ⋈ … ⋈ R_{n−1}) = R₀ ⋈ … ⋈ ΔR_j ⋈ … ⋈ R_{n−1}
  *
  * (signs multiply across every relation's net multiplicity), and a
  * batch touching several relations folds them SEQUENTIALLY — each
  * per-relation fold joins against the already-advanced states of the
  * relations folded before it and the pre-batch states of the rest,
  * which telescopes exactly to the multi-relation delta
  * (R₀′⋈R₁⋈… − R₀⋈R₁⋈… = ΔR₀⋈R₁⋈…, then the next relation against
  * R₀′, and so on). Correctness inherits [[CubeManager.applyDeltas]]'s
  * invariants verbatim: fold-then-query == from-scratch recompute for
  * ANY interleaving (ChainCubeSpec pins randomized sequences).
  *
  * Auxiliary state mirrors [[JoinCubeManager]]: every relation is a
  * compacted signed multiset (net `_mult`, zeros dropped), a NARROW
  * keyed projection of the source table. At 100 TB the per-batch cost
  * of a one-relation fold is |Δ| joined against the key-matching
  * slices of the other states — co-partitioned equi-joins on the edge
  * keys, with AQE broadcasting the (small) delta side — never a
  * re-join of the full chain. Column names must be pairwise disjoint
  * across ALL relations (true of every TPC-H-style prefixed schema):
  * the joined schema is their concatenation and every downstream
  * consumer binds by name. */
final case class ChainCubeConfig(cube: CubeConfig,
    edges: Seq[(String, String)])

/** `states(i)` is relation i's compacted signed multiset; `edges(i)`
  * joins relation i+1 (right column) to the prefix join of relations
  * 0..i (left column). */
final case class ChainCube(config: ChainCubeConfig, cube: Cube,
    states: Seq[DataFrame])

object ChainCubeManager {

  /** Net-multiplicity compaction of a signed multiset: group identical
    * rows, sum signs, drop zeros. State size ∝ |distinct live rows|. */
  private def compact(side: DataFrame): DataFrame = {
    val cols = side.columns.filterNot(_ == "_mult")
    side.groupBy(cols.map(col): _*)
      .agg(sum(col("_mult")).cast("long").as("_mult"))
      .filter(col("_mult") =!= 0)
  }

  /** Non-chain shapes refuse at creation: fewer than three relations
    * (that is a [[JoinCubeManager]] MV), overlapping column names (the
    * joined schema is a by-name concatenation), an edge whose right
    * column is not on its relation, or whose left column is not on the
    * PREFIX (relations 0..i) — the shape that would make the fold
    * order ambiguous. */
  private[cube] def validateRelations(cfg: ChainCubeConfig,
      relCols: Seq[Seq[String]]): Unit = {
    require(relCols.size >= 3,
      s"a chain MV needs at least 3 relations, got ${relCols.size} " +
        "(use JoinCubeManager for binary joins)")
    require(cfg.edges.size == relCols.size - 1,
      s"a ${relCols.size}-relation chain needs ${relCols.size - 1} " +
        s"edges, got ${cfg.edges.size}")
    relCols.zipWithIndex.combinations(2).foreach {
      case Seq((a, ai), (b, bi)) =>
        val overlap = a.toSet.intersect(b.toSet)
        require(overlap.isEmpty,
          s"chain MV relation column names must be pairwise disjoint; " +
            s"relations $ai and $bi overlap on: ${overlap.mkString(", ")}")
      case _ => ()
    }
    cfg.edges.zipWithIndex.foreach { case ((lc, rc), i) =>
      val prefix = relCols.take(i + 1).flatten.toSet
      require(relCols(i + 1).contains(rc),
        s"edge $i right column '$rc' is not a column of relation ${i + 1}")
      require(prefix.contains(lc),
        s"edge $i left column '$lc' is not a column of relations 0..$i")
      // The persisted chain_edges file is newline-separated `l=r` pairs
      // parsed with split("=", 2); a '=' or newline in an edge column
      // name would round-trip to a DIFFERENT edge list silently.
      Seq(lc -> "left", rc -> "right").foreach { case (c, side) =>
        require(!c.exists(ch => ch == '=' || ch == '\n' || ch == '\r'),
          s"edge $i $side column '$c' contains '=' or a newline — " +
            "unrepresentable in the persisted chain_edges format")
      }
    }
  }

  /** The chain join with relation `deltaIdx` (when ≥ 0) swapped for a
    * delta frame: per-relation `_mult`s get unique names, the edges
    * fold left to right, and the net sign is the product. */
  private def chainJoin(cfg: ChainCubeConfig,
      rels: Seq[DataFrame]): DataFrame = {
    val withMults = rels.zipWithIndex.map { case (s, i) =>
      s.withColumnRenamed("_mult", s"_m$i")
    }
    val joined = withMults.tail.zip(cfg.edges)
      .foldLeft(withMults.head) { case (acc, (r, (lc, rc))) =>
        acc.join(r, col(lc) === col(rc))
      }
    joined
      .withColumn("_sign",
        rels.indices.map(i => col(s"_m$i")).reduce(_ * _))
      .drop(rels.indices.map(i => s"_m$i"): _*)
  }

  /** Initial population: cube over the raw chain join; every relation
    * compacted from the raw input (multiplicity = row count). */
  def create(cfg: ChainCubeConfig, rels: Seq[DataFrame]): ChainCube = {
    validateRelations(cfg, rels.map(_.columns.toSeq))
    val ones = rels.map(_.withColumn("_mult", lit(1L)))
    val joined = chainJoin(cfg, ones).drop("_sign")
    ChainCube(cfg, CubeManager.create(cfg.cube, joined),
      ones.map(compact))
  }

  /** The maintained states ARE the MV's source of record (the
    * [[JoinCubeManager.joinedSource]] discipline): expand net
    * multiplicities back to rows and re-join, making non-invertible
    * partials delete-capable via targeted cell recompute. */
  private def joinedSource(cfg: ChainCubeConfig,
      states: Seq[DataFrame]): DataFrame = {
    def expand(s: DataFrame): DataFrame =
      s.filter(col("_mult") > 0)
        .withColumn("_i", explode(sequence(lit(1L), col("_mult"))))
        .drop("_i")
        .withColumn("_mult", lit(1L))
    chainJoin(cfg, states.map(expand)).drop("_sign")
  }

  /** Fold one batch of signed deltas to ONE relation — the streaming-
    * maintenance shape, and the primitive the multi-relation fold
    * composes. Every untouched relation's state is REUSED as-is (no
    * union + recompaction over rows that cannot have changed); the
    * single delta term is the chain join with relation `idx` swapped
    * for the delta, so per-batch cost is |Δ| ⋈ key-matching state
    * slices. */
  def applySideDeltas(cc: ChainCube, delta: DataFrame,
      idx: Int): ChainCube = {
    val cfg = cc.config
    require(idx >= 0 && idx < cc.states.size,
      s"relation index $idx out of range 0..${cc.states.size - 1}")
    val d = delta.withColumnRenamed("_sign", "_mult")
    val term = chainJoin(cfg, cc.states.updated(idx, d))
    val newStates = cc.states.updated(idx,
      compact(cc.states(idx).unionByName(d)))
    ChainCube(cfg,
      CubeManager.applyDeltas(cc.cube, term,
        source = Some(joinedSource(cfg, newStates))),
      newStates)
  }

  /** Fold a batch touching SEVERAL relations: sequential per-relation
    * folds (each against the already-advanced predecessors — the exact
    * telescoping of the multi-relation delta). */
  def applyDeltas(cc: ChainCube,
      deltas: Seq[(Int, DataFrame)]): ChainCube =
    deltas.foldLeft(cc) { case (c, (idx, d)) =>
      applySideDeltas(c, d, idx)
    }

  /** Lineage truncation for long-running maintenance — the
    * [[JoinCubeManager.checkpoint]] discipline over n states. */
  def checkpoint(cc: ChainCube): ChainCube =
    ChainCube(cc.config,
      cc.cube.copy(aggregates = cc.cube.aggregates.localCheckpoint(true)),
      cc.states.map(_.localCheckpoint(true)))
}
