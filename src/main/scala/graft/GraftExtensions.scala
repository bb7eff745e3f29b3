package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for `spark.sql.extensions` (SURVEY §7.5): installs
  * every graft Catalyst extension at session build time, so a deployment
  * enables the whole engine with one conf —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Installed: the codegen `cosine_sim` expression (SQL + Column via
  * `call_function`) and the as-of join planner strategy. The in-process
  * alternatives remain for sessions built without the conf
  * (`GraftFunctions.register`, `AsOf.join`'s experimental-strategy patch).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[graft.functions.HammingDistance].getName, "hamming"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"hamming requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.HammingDistance(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bmp_ahash"),
      new ExpressionInfo(classOf[graft.functions.BmpAHash].getName, "bmp_ahash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"bmp_ahash requires exactly 1 argument, got ${exprs.length}")
        graft.functions.BmpAHash(exprs(0))
      }))
    // runtime-filter primitives (see GraftFunctions.register / BloomPrune)
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_build"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"bloom_build(key, estimatedItems): got ${exprs.length} args")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.LongType))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain(bloom, key): got ${exprs.length} args")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1))))
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfColumnPruning)
  }
}
