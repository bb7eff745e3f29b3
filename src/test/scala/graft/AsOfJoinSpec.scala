package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.plans.{AsOf, AsOfJoinExec}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def purchases: DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("events").filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
  }
  private def views: DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("events").filter($"event_type" === "view")
      .select($"event_id".as("v_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
  }

  test("custom as-of join matches the compositional (pair-join + max_by) form") {
    val got = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .filter($"v_id".isNotNull)
      .select($"p_id", $"v_ts", $"v_id")
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap

    val pairs = purchases.join(views, $"p_user" === $"v_user" && $"v_ts" < $"p_ts")
    val mts = pairs.groupBy("p_id").agg(max("v_ts").as("mts"))
    val expected = pairs.join(mts, "p_id").filter($"v_ts" === $"mts")
      .groupBy($"p_id", $"mts").agg(max("v_id").as("vid"))
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap

    assert(got == expected)
  }

  test("left-outer shape: every left row survives; unmatched get null right") {
    val got = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
    assert(got.count() == purchases.count())
    // the earliest purchase of each user precedes any view only sometimes —
    // just assert the null-right rows are exactly those with no earlier view
    val unmatched = got.filter($"v_id".isNull).count()
    val noView = purchases.as("p").join(views.as("v"),
        $"p_user" === $"v_user" && $"v_ts" < $"p_ts", "left_anti").count()
    assert(unmatched == noView)
  }

  test("tolerance bounds the lookback: stale matches turn into null right") {
    val tolUs = 3600L * 1000000L // 1 hour
    val got = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts",
        Seq("v_id"), tolerance = Some(tolUs))
      .filter($"v_id".isNotNull)
      .select($"p_id", $"v_ts", $"v_id")
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap

    // compositional oracle with the same gap bound
    val pairs = purchases.join(views,
      $"p_user" === $"v_user" && $"v_ts" < $"p_ts" &&
        unix_micros($"p_ts") - unix_micros($"v_ts") <= tolUs)
    val mts = pairs.groupBy("p_id").agg(max("v_ts").as("mts"))
    val expected = pairs.join(mts, "p_id").filter($"v_ts" === $"mts")
      .groupBy($"p_id", $"mts").agg(max("v_id").as("vid"))
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap
    assert(got == expected)
    // the bound must actually bite: unbounded finds strictly more matches
    val unbounded = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .filter($"v_id".isNotNull).count()
    assert(got.size < unbounded)
  }

  test("forward direction: earliest strictly-later right row (pandas direction='forward')") {
    val got = AsOf.joinForward(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .filter($"v_id".isNotNull)
      .select($"p_id", $"v_ts", $"v_id")
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap

    val pairs = purchases.join(views, $"p_user" === $"v_user" && $"v_ts" > $"p_ts")
    val mts = pairs.groupBy("p_id").agg(min("v_ts").as("mts"))
    val expected = pairs.join(mts, "p_id").filter($"v_ts" === $"mts")
      .groupBy($"p_id", $"mts").agg(max("v_id").as("vid"))
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getLong(2))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("null keys and null timestamps match nothing (SQL equi-join semantics)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq(
      (1L, Option(10L), Option(ts(100))), // normal: matches right seq 2
      (2L, None, Option(ts(100))),        // null key: no match
      (3L, Option(10L), None),            // null ts: no match
      (4L, Option(99L), Option(ts(100)))  // key only present with null on right
    ).toDF("p_id", "p_user", "p_ts")
    val right = Seq(
      (1L, Option(10L), Option(ts(50))),
      (2L, Option(10L), Option(ts(80))),
      (3L, Option.empty[Long], Option(ts(10))), // null key
      (4L, Option(99L), None)             // null ts
    ).toDF("v_id", "v_user", "v_ts")
    val got = AsOf.join(left, right, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .select($"p_id", $"v_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(2L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("column pruning pushes through the custom plan: unused columns never shuffle") {
    // wide sides: only p_id/v_id are selected downstream, so every other
    // non-key/ts column must be pruned from the exec's children
    val wideP = purchases.withColumn("p_pad1", lit("x")).withColumn("p_pad2", lit(1.0))
    val wideV = views.withColumn("v_pad1", lit("y")).withColumn("v_pad2", lit(2.0))
    val joined = AsOf.join(wideP, wideV, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .select($"p_id", $"v_id")
    val plans = joined.queryExecution.optimizedPlan.collect {
      case j: graft.plans.AsOfJoinPlan => j
    }
    assert(plans.nonEmpty)
    val leftCols = plans.head.left.output.map(_.name).toSet
    val rightCols = plans.head.right.output.map(_.name).toSet
    assert(!leftCols.contains("p_pad1") && !leftCols.contains("p_pad2"), leftCols)
    assert(!rightCols.contains("v_pad1") && !rightCols.contains("v_pad2"), rightCols)
    // and results are unaffected by pruning
    val got = joined.filter($"v_id".isNotNull).count()
    val reference = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .filter($"v_id".isNotNull).count()
    assert(got == reference)
  }

  test("physical plan is AsOfJoinExec with one shuffle+sort per side, no pair blowup") {
    val got = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
    got.collect() // finalize the adaptive plan
    val s = got.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin"))
    assert(s.contains("Sort") && s.contains("Exchange"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("SortMergeJoin"))
  }

  test("downstream aggregation on the as-of key reuses the join's partitioning (no extra shuffle)") {
    val agg = AsOf.join(purchases, views, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
      .groupBy($"p_user").agg(org.apache.spark.sql.functions.count($"v_id").as("n"))
    agg.collect()
    // exactly the two join-input exchanges; the groupBy must NOT add a third
    // (count only the AQE final plan — the printed initial plan repeats them)
    val planStr = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = planStr.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, planStr)
  }
}
