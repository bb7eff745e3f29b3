package graft

import graft.engine.GraftSession

/** [[GraftSession.boundedCollect]] mechanizes the bounded-model-state
  * convention: every driver-side collect in graft.llm / graft.engine now
  * declares its bound, the plan truncates at bound+1 (a violation can
  * never OOM the driver), and exceeding the bound throws naming the
  * caller.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("returns within-bound frames, preserves sort order, throws past the bound") {
    val df = (1 to 10).toDF("x")
    assert(GraftSession.boundedCollect(df, 10, "exact").length == 10)
    assert(GraftSession.boundedCollect(df, 100, "loose").length == 10)
    // limit on a sorted frame is TakeOrderedAndProject — order survives
    val sorted = GraftSession.boundedCollect(df.orderBy($"x".desc), 10, "sorted")
    assert(sorted.map(_.getInt(0)).toSeq == (10 to 1 by -1))
    val e = intercept[IllegalArgumentException](
      GraftSession.boundedCollect(df, 9, "page-xyz"))
    assert(e.getMessage.contains("page-xyz") && e.getMessage.contains("9"))
    intercept[IllegalArgumentException](
      GraftSession.boundedCollect(df, 0, "zero-bound"))
  }
}
