package graft

import org.apache.spark.sql.functions._
import graft.cdc.SnapshotDiff
import graft.inspect.Inspection

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("SnapshotDiff: verdicts, multi-column changed_cols, null-safe compares") {
    val before = Seq(
      (1L, Option("a"), Option(10)),
      (2L, Option("b"), Option(20)),
      (3L, Option("c"), None),
      (4L, None, Option(40)),
      (5L, Option("e"), Option(50))
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Option("a"), Option(10)),  // unchanged
      (2L, Option("B"), Option(21)),  // both columns changed
      (3L, Option("c"), Option(30)),  // null -> value counts as change
      (4L, None, Option(40)),         // null == null: unchanged
      (6L, Option("f"), Option(60))   // added; 5 removed
    ).toDF("k", "s", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> (("unchanged", "")),
      2L -> (("changed", "s,v")),
      3L -> (("changed", "v")),
      4L -> (("unchanged", "")),
      5L -> (("removed", "")),
      6L -> (("added", ""))))
    val sum = SnapshotDiff.summary(before, after, Seq("k")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(sum(("changed", "s,v")) == ((1L, 2L)))
    assert(sum(("removed", "")) == ((1L, 5L)))
    assert(sum(("added", "")) == ((1L, 6L)))
    assert(sum(("unchanged", "")) == ((2L, 5L)))
  }

  test("SnapshotDiff: a column present on only one side is schema drift, not row change") {
    val before = Seq((1L, "a", 1)).toDF("k", "s", "extra")
    val after = Seq((1L, "a")).toDF("k", "s")
    val got = SnapshotDiff.diff(before, after, Seq("k")).collect()
    assert(got.length == 1 && got(0).getString(1) == "unchanged")
  }

  test("numericProfile: one row per column; nulls counted; sums exact in decimal") {
    val df = Seq(
      (Option(1.5), Option(10L)),
      (Option(-2.25), None),
      (None, Option(30L))
    ).toDF("a", "b")
    val got = Inspection.numericProfile(df, Seq("a", "b"), scale = 2).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))).toMap
    assert(got("a") == (("-2.25", "1.50", "-0.75", 1L)))
    assert(got("b") == (("10.00", "30.00", "40.00", 1L)))
  }

  test("numericProfile: epoch-micros-sized values survive the sum (full-precision cast)") {
    // ~1e15 has 16 integer digits: a DECIMAL(18,4) input cast would null it
    // out of the sum silently while min/max still saw it
    val big = 1_500_000_000_000_000L
    val df = Seq(big, big + 1, 2L).toDF("ts")
    val r = Inspection.numericProfile(df, Seq("ts"), scale = 4).collect()(0)
    assert(r.getString(3) == "3000000000000003.0000", r.toString)
    assert(r.getString(1) == "2.0000" && r.getString(2) == "1500000000000001.0000")
    intercept[IllegalArgumentException] { Inspection.numericProfile(df, Seq()) }
    ()
  }

  test("skewProfile: exact counts and top-k mass with deterministic ties") {
    val rows = Seq.fill(10)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L, 5L, 6L)
    val df = rows.toDF("k")
    val r = Inspection.skewProfile(df, col("k"), topK = 2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_rows")) == 17L)
    assert(r.getLong(r.fieldIndex("n_keys")) == 6L)
    assert(r.getLong(r.fieldIndex("max_cnt")) == 10L)
    assert(r.getLong(r.fieldIndex("top2_mass")) == 13L)
  }

  test("fkOrphans: dangling children counted per missing parent, intact keys silent") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L, 8L).toDF("fk")
    val got = Inspection.fkOrphans(child, "fk", parent, "pk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 9 dangles 3 rows, 8 dangles 1; children of live parents never appear
    assert(got == Seq((9L, 3L), (8L, 1L)), got.toString)
    // a fully consistent pair yields an empty frame
    assert(Inspection.fkOrphans(child.filter($"fk" < 3), "fk", parent, "pk").count() == 0)
  }

  test("jsonProfile: per-key presence, integer probe, cardinality on mixed payloads") {
    val rows = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2}""",
      """{"a": -30, "c": 1.5}""",
      """{"b": "x"}""").toDF("js")
    val got = Inspection.jsonProfile(rows, $"js")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // a: 3 present, all integers (incl. negative), 3 distinct values
    // b: 2 present, none integer, 1 distinct; c: float fails the int probe
    assert(got == Map("a" -> ((3L, 3L, 3L)), "b" -> ((2L, 0L, 1L)),
      "c" -> ((1L, 0L, 1L))), got.toString)
  }

  test("rateAnomalies: discrete lower median baseline, exact integer scores") {
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // type a hourly counts [1, 2, 10] → ct=3, lower median = 2nd smallest = 2
    // type b single hour count 4 → its own median → score exactly 1000
    val events =
      (Seq(("a", ts(0, 5))) ++
        (1 to 2).map(i => ("a", ts(1, i))) ++
        (1 to 10).map(i => ("a", ts(2, i))) ++
        (1 to 4).map(i => ("b", ts(0, i)))).toDF("event_type", "ts")
    val got = Inspection.rateAnomalies(events)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // scores: a@h2 = 10000 DIV 2 = 5000; a@h1 = 1000; b@h0 = 1000 (type
    // tiebreak a < b); a@h0 = 500
    assert(got.toSeq == Seq(("a", 10L, 2L, 5000L), ("a", 2L, 2L, 1000L),
      ("b", 4L, 4L, 1000L), ("a", 1L, 2L, 500L)), got.toSeq.toString)
  }
}
