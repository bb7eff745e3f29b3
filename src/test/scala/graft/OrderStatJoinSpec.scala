package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.OrderStatJoin

/** [[graft.engine.OrderStatJoin.countLess]]: the bin-decomposed monotone
  * theta COUNT must agree with the brute-force cartesian count on every
  * edge the decomposition could fumble — bin-boundary ties, strictness,
  * negative values (floor vs truncating division), empty sides, nulls,
  * and bin widths from degenerate (1) to wider-than-domain.
  */
class OrderStatJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(l: Seq[Long], r: Seq[Long]): Long =
    l.map(lv => r.count(_ < lv).toLong).sum

  private def decomposed(l: Seq[Long], r: Seq[Long], binW: Long): Long = {
    val ld: DataFrame = l.toDF("v")
    val rd: DataFrame = r.toDF("v")
    OrderStatJoin.countLess(ld, col("v"), rd, col("v"), binW)
      .head().getLong(0)
  }

  test("agrees with brute force across widths, ties, negatives, boundaries") {
    val l = Seq(-33L, -32L, -1L, 0L, 1L, 15L, 16L, 17L, 31L, 32L, 100L, 100L)
    val r = Seq(-33L, -17L, -16L, 0L, 0L, 1L, 16L, 16L, 32L, 99L, 100L, 101L)
    val expect = brute(l, r)
    for (w <- Seq(1L, 2L, 16L, 17L, 1000L)) {
      assert(decomposed(l, r, w) == expect, s"binW=$w")
    }
  }

  test("values above 2^53 keep distinct bins (integral division, not double)") {
    // the r13 binOf used Column `/` (double division): above 2^53 adjacent
    // bins collapsed, silently inflating the within-bin quadratic term —
    // and at full-domain magnitudes even the COUNT could drift if the
    // collapsed mapping lost monotonicity at the double's rounding edges
    val base = (1L << 60)
    val l = Seq(base, base + 1L, base + 100L, -base, Long.MaxValue, Long.MinValue + 1L)
    val r = Seq(base - 1L, base, base + 99L, -base - 5L, Long.MaxValue - 2L, Long.MinValue)
    val expect = brute(l, r)
    for (w <- Seq(1L, 7L, 1000L)) {
      assert(decomposed(l, r, w) == expect, s"binW=$w")
    }
  }

  test("strictness: equal values never pair; empty sides count zero") {
    assert(decomposed(Seq(5L, 5L), Seq(5L, 5L), 4L) == 0L)
    assert(decomposed(Seq.empty, Seq(1L, 2L), 4L) == 0L)
    assert(decomposed(Seq(1L, 2L), Seq.empty, 4L) == 0L)
  }

  test("nulls pair with nothing (three-valued theta semantics)") {
    val ld = Seq(Some(10L), None, Some(3L)).toDF("v")
    val rd = Seq(Some(1L), None, Some(9L)).toDF("v")
    val got = OrderStatJoin.countLess(ld, col("v"), rd, col("v"), 4L)
      .head().getLong(0)
    // pairs: 10>1, 10>9, 3>1 = 3; anything involving null contributes 0
    assert(got == 3L)
  }

  test("matches the cartesian plan on the q17 fixture shape") {
    graft.engine.Tables.ensure(spark, "/root/testdata/sf0.001")
    val cartesian = spark.sql(
      "SELECT count(*) AS cnt FROM part, supplier WHERE p_size > s_suppkey * 4")
      .head().getLong(0)
    val ranked = OrderStatJoin.countLess(
      spark.table("part"), col("p_size"),
      spark.table("supplier"), col("s_suppkey") * 4, binW = 16L)
      .head().getLong(0)
    assert(ranked == cartesian)
  }
}
