package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must install the engine's
  * Catalyst extensions at session build — no imperative register calls.
  * The suite builds its own session (sharing the JVM's SparkContext) and
  * restores the default session afterwards.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions conf installs cosine_sim and the as-of planner strategy") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions exercises the same injection seam the
    // spark.sql.extensions conf resolves to; the conf string itself is only
    // read when the SparkContext is first created, which a shared-JVM test
    // suite can't control deterministically.
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val c = s2.sql(
        "SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c").head.getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      assert(s2.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy))
      // runtime-filter pair round-trips through SQL: build a bloom over
      // 0..99, probe a member and a non-member (probe type must match the
      // build side's — xxhash64 of INT and BIGINT differ, same as any
      // hash-join key contract)
      val probes = s2.sql(
        """SELECT bloom_might_contain((SELECT bloom_build(id, 100) FROM range(100)),
          |                           CAST(50 AS BIGINT)) AS yes,
          |       bloom_might_contain((SELECT bloom_build(id, 100) FROM range(100)),
          |                           CAST(12345 AS BIGINT)) AS no
          |""".stripMargin).head
      assert(probes.getBoolean(0))
      assert(!probes.getBoolean(1))
      // codegen hamming: distance, zero, and the unequal-length null
      val h = s2.sql(
        "SELECT hamming('abcdef', 'abXdeY') AS d, hamming('a', 'a') AS z, " +
          "hamming('ab', 'abc') AS n").head
      assert(h.getInt(0) == 2 && h.getInt(1) == 0 && h.isNullAt(2))
      // codegen and interpreted paths agree over a value sweep
      import s2.implicits._
      val sweep = (0 until 64).map(i => (f"v$i%02d-fixed", f"v${i ^ 9}%02d-fixed"))
        .toDF("a", "b")
      val viaExpr = sweep.selectExpr("hamming(a, b) AS d").collect().map(_.getInt(0))
      val viaSubstr = sweep.selectExpr(
        "aggregate(sequence(1, length(a)), 0, " +
          "(acc, i) -> acc + IF(substring(a, i, 1) = substring(b, i, 1), 0, 1)) AS d")
        .collect().map(_.getInt(0))
      assert(viaExpr.toSeq == viaSubstr.toSeq)
      // codegen bmp_ahash through the SQL seam: the 2x2 seed-0 fixture
      // hand-computed in LlmSpec (gray [3,4,0,1], mean 2 → ahash 3),
      // bytes from the engine's own encoder
      import graft.multimodal.Multimodal
      val enc = Seq((2, 2, 0L)).toDF("w", "h", "seed")
        .select(Multimodal.encodeBmp($"w", $"h", $"seed").as("m"))
      enc.createOrReplaceTempView("bmp_t")
      assert(s2.sql("SELECT bmp_ahash(m) AS a FROM bmp_t").head.getLong(0) == 3L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }
}
