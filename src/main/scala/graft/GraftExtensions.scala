package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.Bridge

import graft.functions.{ApproxTopKAgg, BloomFilterAgg, CharGramHashes, CountMinSketchAgg, FloatVecDot, FloatVecNorm, KllDoublesAgg, KllQuantileExpr, MightContainLong, MinHashSig, ShingleHashes, SimHash64, TopKByValue, VecMeanFloat, WordNgrams, ZOrderCode}

/** Session-extension registration (the installable form of the engine's
  * Catalyst additions): the as-of join planner strategy and the native
  * vector functions, available to SQL as `float_vec_dot` /
  * `float_vec_norm`.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *
  * Inside the driver-built session the same pieces are reachable without
  * extensions: `AsOf.join` registers its strategy through
  * `spark.experimental.extraStrategies`, and the vector functions are
  * used as Columns directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => Bridge.AsOfStrategy)
    e.injectOptimizerRule(_ => cube.CubeRewriteRule)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("float_vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "float_vec_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecNorm(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_mean_float"),
      new ExpressionInfo(classOf[VecMeanFloat].getName, "vec_mean_float"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecMeanFloat(exprs.head).toAggregateExpression()))
    // aggregate + generator registrations take literal extra args: k / n
    // must be a foldable literal (evaluated once at resolution time)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("top_k_by_value"),
      new ExpressionInfo(classOf[TopKByValue].getName, "top_k_by_value"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKByValue(exprs(0), exprs(1), literalInt(exprs(2), "top_k_by_value(value, id, k)"))
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordNgrams(exprs(0), literalInt(exprs(1), "word_ngrams(words, n)"))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharGramHashes(exprs.head)))
    // SQL integer literals arrive as INT; the expression wants LONG —
    // cast at the registration seam (Column-API callers already pass
    // long key columns)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_code"),
      new ExpressionInfo(classOf[ZOrderCode].getName, "zorder_code"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ZOrderCode(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(0),
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.LongType))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("count_min_sketch_agg"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "count_min_sketch_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountMinSketchAgg(exprs(0),
          literalInt(exprs(1), "count_min_sketch_agg(key, d, w)"),
          literalInt(exprs(2), "count_min_sketch_agg(key, d, w)"))
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("approx_top_k"),
      new ExpressionInfo(classOf[ApproxTopKAgg].getName, "approx_top_k"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ApproxTopKAgg(exprs(0),
          literalInt(exprs(1), "approx_top_k(key, d, w, k)"),
          literalInt(exprs(2), "approx_top_k(key, d, w, k)"),
          literalInt(exprs(3), "approx_top_k(key, d, w, k)"))
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllDoublesAgg].getName, "kll_sketch_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllDoublesAgg(exprs(0),
          literalInt(exprs(1), "kll_sketch_agg(value, k)"), isMerge = false)
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllDoublesAgg].getName, "kll_merge_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllDoublesAgg(exprs(0),
          literalInt(exprs(1), "kll_merge_agg(sketch, k)"), isMerge = true)
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantileExpr].getName, "kll_quantile"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllQuantileExpr(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_filter_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomFilterAgg(exprs(0),
          literalInt(exprs(1), "bloom_filter_agg(key, numBits, k)"),
          literalInt(exprs(2), "bloom_filter_agg(key, numBits, k)"))
          .toAggregateExpression()))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("might_contain_long"),
      new ExpressionInfo(classOf[MightContainLong].getName, "might_contain_long"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        // k is NOT a parameter: the probe reads it from the bloom value's
        // header word, so build and probe can never disagree
        MightContainLong(exprs(0), exprs(1))))
  }

  private def literalInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      sig: String): Int = {
    require(e.foldable, s"$sig: last argument must be a literal integer")
    e.eval().asInstanceOf[Number].intValue
  }
}
