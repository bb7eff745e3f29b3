package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

/** [[graft.plans.RangeJoinBinning]]: the optimizer rewrite that routes
  * equi-key + bounded-interval range joins onto the binned plan. Every
  * case compares the rewritten result against the SAME query with the rule
  * disabled — semantics must be bit-identical; only the plan changes.
  */
class RangeJoinBinningSpec extends SparkSpec {
  import spark.implicits._

  private def binnedJoinsIn(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(
        _.references.exists(_.name.startsWith("__graft_bin"))) => j
    }.size

  private def withRule[A](enabled: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoinBinning.enabled", enabled.toString)
    try f finally
      spark.conf.set("spark.graft.rangeJoinBinning.enabled", "true")
  }

  private def resultOf(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  test("timestamp window self-join: rewritten, and bit-identical to the unbinned plan") {
    // boundary-heavy data: rows exactly AT the window edge (t+1h), exactly
    // at bin edges, and pre-1970 negative-micro timestamps (floorDiv vs
    // truncating div is THE classic negative-value bug)
    Seq(
      (1L, "1969-12-31 22:30:00"), (1L, "1969-12-31 23:15:00"),
      (1L, "1969-12-31 23:59:59"), (1L, "1970-01-01 00:00:00"),
      (1L, "1970-01-01 00:30:00"), (1L, "1970-01-01 01:00:00"),
      (1L, "1970-01-01 01:30:00"), (2L, "1970-01-01 00:10:00"),
      (2L, "1970-01-01 01:10:00"), (3L, "2024-06-01 07:59:59"),
      (3L, "2024-06-01 08:59:59"), (3L, "2024-06-01 09:00:00")
    ).toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("rjb_t")
    val q =
      """SELECT a.k, unix_micros(a.ts) AS a_us, unix_micros(b.ts) AS b_us
        |FROM rjb_t a JOIN rjb_t b
        |  ON a.k = b.k AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin
    val on = withRule(enabled = true) {
      val df = spark.sql(q)
      assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
      df.collect().map(_.toString).sorted.toSeq
    }
    val off = withRule(enabled = false) {
      val df = spark.sql(q)
      assert(binnedJoinsIn(df) == 0)
      df.collect().map(_.toString).sorted.toSeq
    }
    assert(on == off, s"binned ${on.size} rows vs unbinned ${off.size}")
    assert(on.nonEmpty, "degenerate fixture: no qualifying pairs at all")
  }

  test("inclusive lower bound (>=) keeps the self-pair; strict (>) drops it") {
    Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:20:00"))
      .toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("rjb_i")
    def q(op: String) =
      s"""SELECT count(*) AS cnt FROM rjb_i a JOIN rjb_i b
         |  ON a.k = b.k AND b.ts $op a.ts
         | AND b.ts <= a.ts + INTERVAL 30 MINUTE""".stripMargin
    for (op <- Seq(">", ">=")) {
      val on = withRule(enabled = true) {
        val df = spark.sql(q(op))
        assert(binnedJoinsIn(df) == 1, s"rule must engage for '$op'")
        df.head().getLong(0)
      }
      val off = withRule(enabled = false)(spark.sql(q(op)).head().getLong(0))
      assert(on == off, s"op $op: binned $on vs unbinned $off")
    }
  }

  test("numeric (long) bound columns with literal windows rewrite too (legacy arithmetic)") {
    // integral bounds only bin under legacy arithmetic — under ANSI the
    // rule declines them (see the ANSI-gate test below)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 11L), (2L, 100L), (2L, 109L),
        (2L, 111L)).toDF("k", "pos").createOrReplaceTempView("rjb_n")
      val q =
        """SELECT a.k, a.pos AS a_pos, b.pos AS b_pos
          |FROM rjb_n a JOIN rjb_n b
          |  ON a.k = b.k AND b.pos > a.pos AND b.pos <= a.pos + 10""".stripMargin
      val on = withRule(enabled = true) {
        val df = spark.sql(q)
        assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
        df.collect().map(_.toString).sorted.toSeq
      }
      val off = withRule(enabled = false)(resultOf(q))
      assert(on == off)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("long domain edges: values within the window of ±Long.MaxValue neither throw nor drop pairs") {
    // the r13 rewrite computed bin endpoints with plain adds and
    // (a - pmod) div w — near Long.MaxValue the lo/hi pair wrapped (a
    // Sequence step-direction crash, or silently dropped pairs), and near
    // Long.MinValue the floor-division itself underflowed. The fixed form
    // (wrap-mode adds + span guard + overflow-safe floorDiv) must agree
    // with the unrewritten plan across the full domain.
    val mx = Long.MaxValue
    val mn = Long.MinValue
    Seq(
      // near MaxValue: base rows whose window arithmetic overflows
      (1L, mx - 3L), (1L, mx - 2L), (1L, mx - 1L), (1L, mx),
      // near MinValue: exact floor division at the negative edge
      (2L, mn), (2L, mn + 3L), (2L, mn + 9L), (2L, mn + 11L),
      // a normal key for sanity
      (3L, 0L), (3L, 7L), (3L, 10L), (3L, 11L)
    ).toDF("k", "pos").createOrReplaceTempView("rjb_edge")
    val q =
      """SELECT a.k, a.pos AS a_pos, b.pos AS b_pos
        |FROM rjb_edge a JOIN rjb_edge b
        |  ON a.k = b.k AND b.pos > a.pos AND b.pos <= a.pos + 10""".stripMargin
    // wrap semantics on both plans: under ANSI the UNREWRITTEN plan throws
    // on the edge rows' `a.pos + 10`, so agreement is only defined in
    // legacy arithmetic — which is exactly where silent divergence lived
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val on = withRule(enabled = true) {
        val df = spark.sql(q)
        assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
        df.collect().map(_.toString).sorted.toSeq
      }
      val off = withRule(enabled = false)(resultOf(q))
      assert(on == off, s"binned ${on.size} rows vs unbinned ${off.size}")
      // the MinValue-side pairs must actually be there (floorDiv exactness)
      assert(on.exists(_.contains(s"${mn + 3L}")), s"missing MinValue-edge pairs: $on")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("mirrored orientation (window base on the RIGHT table) rewrites and agrees") {
    Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:20:00"),
      (1L, "2024-01-01 00:59:59"), (1L, "2024-01-01 01:00:00"),
      (2L, "2024-01-01 00:30:00"), (2L, "2024-01-01 01:29:59"))
      .toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("rjb_m")
    // same semantics as the canonical form, roles swapped: the LEFT row is
    // the probe, the RIGHT row holds the window base
    val q =
      """SELECT a.k, unix_micros(a.ts) AS a_us, unix_micros(b.ts) AS b_us
        |FROM rjb_m a JOIN rjb_m b
        |  ON a.k = b.k AND a.ts > b.ts AND a.ts <= b.ts + INTERVAL 1 HOUR""".stripMargin
    val on = withRule(enabled = true) {
      val df = spark.sql(q)
      assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
      df.collect().map(_.toString).sorted.toSeq
    }
    val off = withRule(enabled = false)(resultOf(q))
    assert(on == off && on.nonEmpty)
  }

  test("symmetric proximity band (r within ±W of l) rewrites and agrees") {
    // the "events within W of each other" shape: the lower bound is a
    // SHIFTED base (l.ts - W), normalizing to a (base-W, base+W] window
    Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:29:59"),
      (1L, "2024-01-01 00:30:00"), (1L, "2024-01-01 01:00:00"),
      (1L, "2024-01-01 02:00:00"), (2L, "2024-01-01 00:15:00"),
      (2L, "2024-01-01 00:44:59"), (2L, "2024-01-01 00:45:00"))
      .toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("rjb_band")
    val q =
      """SELECT a.k, unix_micros(a.ts) AS a_us, unix_micros(b.ts) AS b_us
        |FROM rjb_band a JOIN rjb_band b
        |  ON a.k = b.k AND b.ts > a.ts - INTERVAL 30 MINUTE
        | AND b.ts <= a.ts + INTERVAL 30 MINUTE""".stripMargin
    val on = withRule(enabled = true) {
      val df = spark.sql(q)
      assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
      df.collect().map(_.toString).sorted.toSeq
    }
    val off = withRule(enabled = false)(resultOf(q))
    assert(on == off && on.nonEmpty)
    // numeric band via explicit +/- literals (legacy arithmetic: integral
    // bounds decline the rewrite under ANSI — see the ANSI-gate test)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      Seq((1L, 0L), (1L, 9L), (1L, 10L), (1L, 11L), (1L, 30L))
        .toDF("k", "pos").createOrReplaceTempView("rjb_nband")
      val qn =
        """SELECT a.k, a.pos AS a_pos, b.pos AS b_pos
          |FROM rjb_nband a JOIN rjb_nband b
          |  ON a.k = b.k AND b.pos >= a.pos - 10 AND b.pos < a.pos + 10""".stripMargin
      val onN = withRule(enabled = true) {
        val df = spark.sql(qn)
        assert(binnedJoinsIn(df) == 1, df.queryExecution.optimizedPlan.treeString)
        df.collect().map(_.toString).sorted.toSeq
      }
      val offN = withRule(enabled = false)(resultOf(qn))
      assert(onN == offN && onN.nonEmpty)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("no rewrite without an equi key, or for month-bearing intervals") {
    Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:20:00"))
      .toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("rjb_g")
    // pure range theta-join (no key): out of scope, must pass through
    val theta = spark.sql(
      """SELECT count(*) AS cnt FROM rjb_g a JOIN rjb_g b
        |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin)
    assert(binnedJoinsIn(theta) == 0)
    // calendar-month window: not a constant micro offset, must pass through
    val monthly = spark.sql(
      """SELECT count(*) AS cnt FROM rjb_g a JOIN rjb_g b
        |  ON a.k = b.k AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 1 MONTH""".stripMargin)
    assert(binnedJoinsIn(monthly) == 0)
    // both still EXECUTE correctly (the rule only declined, nothing broke)
    assert(theta.head().getLong(0) == 1L)
    assert(monthly.head().getLong(0) == 0L)
  }

  test("ANSI mode: integral bound columns decline the rewrite; timestamps still bin") {
    // at the Long-domain edges the rewrite's span guard DROPS single-wrap
    // rows where ANSI's unrewritten plan would THROW — a rewrite-visible
    // divergence, so ANSI + raw integral bounds must pass through
    // unrewritten (timestamps can't reach the edge and keep the rewrite)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 11L))
        .toDF("k", "pos").createOrReplaceTempView("rjb_ansi_n")
      val qn = spark.sql(
        """SELECT count(*) AS cnt FROM rjb_ansi_n a JOIN rjb_ansi_n b
          |  ON a.k = b.k AND b.pos > a.pos AND b.pos <= a.pos + 10""".stripMargin)
      assert(binnedJoinsIn(qn) == 0,
        "ANSI + integral bound must decline: " +
          qn.queryExecution.optimizedPlan.treeString)
      assert(qn.head().getLong(0) == 5L) // still executes, just unbinned
      Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:20:00"))
        .toDF("k", "s").selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
        .createOrReplaceTempView("rjb_ansi_t")
      val qt = spark.sql(
        """SELECT count(*) AS cnt FROM rjb_ansi_t a JOIN rjb_ansi_t b
          |  ON a.k = b.k AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin)
      assert(binnedJoinsIn(qt) == 1,
        "ANSI must not gate TIMESTAMP bounds: " +
          qt.queryExecution.optimizedPlan.treeString)
      assert(qt.head().getLong(0) == 1L)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }
}
