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
    * `tolerance` (same unit as the timestamp's physical long — microseconds
    * for timestamps) bounds how far back a match may reach: a candidate
    * with `leftTs − rightTs > tolerance` yields a null right side instead.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTie: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfColumnPruning)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfColumnPruning
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    Bridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightTie.map(attr(rPlan, _)),
      tolerance))
  }

  /** Forward as-of join: the EARLIEST right row strictly LATER than the
    * left timestamp (pandas `merge_asof(direction='forward')`). Implemented
    * by negating both event times and reusing the backward operator — the
    * order-reversal trick keeps the single two-pointer merge exec. Tie
    * preference under reversal is unchanged (max `rightTie` among equal
    * timestamps).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTie: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    // narrow import: functions.left/right would shadow the parameters
    import org.apache.spark.sql.functions.{col, unix_micros}
    // the scratch columns are replaced-then-dropped — refuse inputs that
    // already carry them rather than silently destroying user data
    require(!left.columns.contains("__l_negts") && !right.columns.contains("__r_negts"),
      "joinForward reserves the __l_negts/__r_negts column names")
    def negated(df: DataFrame, ts: String, out: String): DataFrame = {
      val asLong = df.schema(ts).dataType match {
        case org.apache.spark.sql.types.LongType => col(ts)
        case _ => unix_micros(col(ts))
      }
      df.withColumn(out, -asLong)
    }
    negated(left, leftTs, "__l_negts")
      .transform(l => AsOf.join(l, negated(right, rightTs, "__r_negts"),
        leftKey, rightKey, "__l_negts", "__r_negts", rightTie, tolerance))
      .drop("__l_negts", "__r_negts")
  }
}
