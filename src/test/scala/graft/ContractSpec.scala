package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the oracle map must reference
  * only declared queries (a stray key would silently grade as a missing
  * result), and the declared surface keeps its naming scheme. */
class ContractSpec extends AnyFunSuite {
  test("every oracle key has a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("declared names follow the qNN_snake_case scheme") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("rows-only queries are the documented hash/model-dependent set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q16_approx_distinct", "q37_dedup_minhash",
      "q38_dedup_simhash", "q41_knn_lsh", "q45_lang_id",
      "q46_fingerprint", "q51_knn_ivf", "q67_dedup_embedding_lsh",
      "q69_approx_percentile",
      "q115_semantic_dedup",  // float k-means clustering, q39's exactness covers the anchor
      "q117_heavy_hitters",   // xxhash64 CMS estimates
      "q119_hll_cube",        // datasketches HLL estimates (no DuckDB twin)
      "q120_audience_overlap", // HLL inclusion-exclusion estimates
      "q121_cube_distinct",   // cube sketch-measure path (HLL estimates)
      "q130_cube_quantiles",  // cube KLL quantile measure (rank-randomized)
      "q131_grouped_heavy_hitters", // CMS top-k candidate set (heuristic)
      "q139_rolling_distinct_hll", // rolling HLL merge (no DuckDB twin; CubeSpec pins vs exact q138)
      "q140_distinct_routing", // MV-routed HLL estimates (CubeRewriteSpec pins vs exact)
      "q141_rolling_quantiles_kll", // rolling KLL merge (rank-randomized; CubeSpec pins rank band)
      "q164_ann_index_serve", // persisted-index IVF serve (AnnIndexSpec pins == q51 in-session)
      "q191_ann_tune_nprobe", // tuned width is float-k-means cluster-membership dependent (AnnIndexSpec pins minimality + target)
      "q168_cube_topk",       // cube-served CMS heavy hitters (q167 is the exact anchor; CubeSpec pins)
      "q175_sketch_rollup_routing", // HLL estimates rolled through the routed Expand (CubeRewriteSpec pins per-set est-vs-exact; q163 hash-matches the exact twin measures)
      "q176_quantile_rollup_routing", // KLL estimates through the same rewrite (rank-randomized; CubeRewriteSpec pins rank bands + refusal edges)
      "q177_delete_sketches", // HLL/KLL estimates from a delete-processed cube (CubeSpec pins folded == from-scratch per family; the serve itself proves the latch stayed open)
      "q183_join_sketch_routing", // HLL estimates served from join-MV partials (CubeRewriteSpec pins routed == MV distinctOf + est-vs-exact; q153 hash-matches the exact twin measures)
      "q184_join_stream_sketch", // HLL estimates from a stream-maintained join MV with deletes (CubeServiceSpec pins streamed == from-scratch; q154 hash-matches the exact twins)
      "q188_join_quantile_routing", // KLL estimates over a registered join (rank-randomized; CubeRewriteSpec pins the rank band; q258 is the oracle-graded EXACT twin of the same join median)
      "q231_monthly_topk_hierarchy"), // CMS heavy hitters rolled day→month through timeRollup (xxhash64 estimates, no DuckDB twin; CubeRewriteSpec pins est≥exact, top-1 recall, and roll == direct-build per hierarchy level; exact counts ride along in the output; q257 is the oracle-graded EXACT twin of the same monthly top-k)
      s"unexpected rows-only set: $rowsOnly")
  }

  // ---- the in-tree drift alarm (Verify.driftBetween) -----------------
  private def selfJson(src: String, hash: String, oracle: Boolean = true) =
    s"""{"sf":"x","srcHash":"$src","n_queries":1,"failed":[],"drift":[],""" +
      s""""queries":{"q01_agg":{"rows":3,"cols":"a:bigint","hash":"$hash","oracle":$oracle}}}"""

  test("drift alarm trips on a moved oracled result under an unchanged source tree") {
    // the round-9 failure mode, deliberately reproduced: same srcHash,
    // different value hash → the alarm MUST name the query
    assert(Verify.driftBetween(selfJson("aaaa", "h1"), selfJson("aaaa", "h2"))
      == Seq("q01_agg"))
    // normal runs stay green: identical fingerprints
    assert(Verify.driftBetween(selfJson("aaaa", "h1"), selfJson("aaaa", "h1"))
      .isEmpty)
    // a SOURCE change legitimately moves results — the oracle gate
    // judges those, not the alarm
    assert(Verify.driftBetween(selfJson("aaaa", "h1"), selfJson("bbbb", "h2"))
      .isEmpty)
    // rows-only queries carry sketch randomness; excluded by design
    assert(Verify.driftBetween(selfJson("aaaa", "h1", oracle = false),
      selfJson("aaaa", "h2", oracle = false)).isEmpty)
    // pre-alarm summaries (no srcHash) can't be compared
    assert(Verify.driftBetween(
      selfJson("aaaa", "h1").replace(""""srcHash":"aaaa",""", ""),
      selfJson("aaaa", "h2")).isEmpty)
  }

  test("committed VERIFY_SELF.json carries no unadjudicated drift") {
    val f = java.nio.file.Paths.get("VERIFY_SELF.json")
    if (f.toFile.exists()) {
      val j = java.nio.file.Files.readString(f)
      val drift = """"drift":\s*\[([^\]]*)\]""".r.findFirstMatchIn(j)
        .map(_.group(1).trim).getOrElse("")
      assert(drift.isEmpty,
        s"VERIFY_SELF.json records result drift with an unchanged source " +
          s"tree — the input data moved under these queries: [$drift]. " +
          "Adjudicate (re-pin or fix), then re-run a full Verify.")
    }
  }

  test("committed VERIFY_SELF.json covers the whole declared surface") {
    // stale-snapshot alarm (the r12 advice): a query added to
    // SparkEntry without a fresh full Verify would leave the committed
    // evidence describing an older surface — fail loudly like drift
    // does, instead of letting the summary silently lag HEAD.
    val f = java.nio.file.Paths.get("VERIFY_SELF.json")
    if (f.toFile.exists()) {
      val j = java.nio.file.Files.readString(f)
      val recorded = """"(q\d{2,3}_[a-z0-9_]+)":\s*\{""".r
        .findAllMatchIn(j).map(_.group(1)).toSet
      val missing = SparkEntry.queries.keySet -- recorded
      assert(missing.isEmpty,
        s"VERIFY_SELF.json is stale: declared queries missing from the " +
          s"committed summary: ${missing.toSeq.sorted.mkString(", ")}. " +
          "Run a full Verify and commit the refreshed snapshot.")
    }
  }

  test("oracle SQL references only bare known table names") {
    val known = Tables.starTables.toSet
    val fromRe = "(?i)(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // allow CTE/alias names that the query itself defines (with or
        // without a recursive-CTE column list: `name(a, b) AS (`)
        val defined = s"(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*$t\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
          .findFirstIn(sql).isDefined ||
          sql.toLowerCase.contains(s"$t as (") ||
          known.contains(t) || t == "values" ||
          t == "generate_series" // DuckDB table function, not a table
        assert(defined || sql.toLowerCase.contains(s") $t") ||
          sql.toLowerCase.contains(s") as $t"),
          s"$name references unknown table '$t'")
      }
    }
  }
}
