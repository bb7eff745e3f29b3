package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.graftbridge.Bridge

/** User-facing API for the custom as-of join operator. Column names of
  * `left` and `right` should be disjoint (alias the right side — same
  * contract as the compositional form).
  */
object AsOf {

  private def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))

  /** For each left row: the latest right row of the same key strictly
    * earlier by timestamp (ties by `rightTie` descending preference),
    * left-outer. Timestamp columns must be timestamp/long-typed. Null keys
    * and null timestamps follow SQL equi-join semantics: they match nothing
    * (null-key/ts left rows still surface with a null right side).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTie: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    Bridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightTie.map(attr(rPlan, _))))
  }
}
