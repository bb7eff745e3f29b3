package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (100 TB design note, SURVEY
  * §4). AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even a
  * split partition exceeds executor memory, or when AQE is unavailable
  * (e.g. inside `foreachBatch`).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side scatters each row into one of
    * `factor` salt buckets; the smaller side replicates each row `factor`
    * times. The join key becomes (key, salt), splitting every hot key's hash
    * partition `factor` ways.
    *
    * Scatter choice — the retry-determinism / duplicate-row trade-off:
    * the default scatter is a hash of the WHOLE ROW, which is deterministic
    * under task retries (a row always lands in the same bucket, so a retried
    * task reproduces its partition exactly). The caveat: N IDENTICAL rows
    * hash identically and land in ONE salt bucket — a hot key whose rows are
    * also duplicate-heavy (real CDC / crawl data, where the hot key is often
    * hot BECAUSE the same record repeats) defeats the split entirely.
    * Callers with such data pass `scatter`: any stable, near-unique
    * per-row column — an ingest-time sequence number (the snapshot sink's
    * `seq`), a source offset, a pre-assigned row id. The scatter column is
    * hashed then bucketed, so any orderable type works and non-uniform id
    * distributions still spread. `monotonically_increasing_id()` /
    * `rand()` are NOT valid scatter inputs: they change across retries, and
    * a retried task would emit rows into different buckets than its first
    * attempt (duplicate or lost join rows under speculative execution).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, factor: Int,
      scatter: Option[Column] = None): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt", saltColumn(large, factor, scatter))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The per-row salt bucket [[saltedJoin]] assigns — factored out so tests
    * and skew diagnostics can observe the scatter a given input produces
    * (the whole point of the `scatter` knob is WHICH bucket identical rows
    * land in, and that is invisible in the joined output).
    */
  private[graft] def saltColumn(large: DataFrame, factor: Int,
      scatter: Option[Column]): Column =
    pmod(scatter.map(xxhash64(_))
      .getOrElse(xxhash64(struct(large.columns.map(col): _*))), lit(factor.toLong))

  /** The salt factor [[graft.inspect.Inspection.skewProfile]]'s numbers
    * imply: how many ways the heaviest key must split so its share of one
    * post-shuffle partition drops to ~the average key's load, capped (salt
    * replicates the ENTIRE small side `factor`×, so an absurd factor turns
    * the mitigation into the bottleneck). `1` = balanced data, salting
    * unnecessary. Pure integer arithmetic on three profile scalars —
    * callable on the driver with no extra scan beyond the profile the
    * operator of a 100 TB join should have read anyway.
    */
  def saltFactorFor(nRows: Long, nKeys: Long, maxCnt: Long, cap: Int = 32): Int = {
    require(nRows >= 0 && nKeys >= 0 && maxCnt >= 0, "profile counts must be non-negative")
    if (nRows == 0L || nKeys == 0L || maxCnt == 0L) 1
    else {
      val avg = math.max(1L, nRows / nKeys)
      math.min(cap.toLong, math.max(1L, (maxCnt + avg - 1L) / avg)).toInt
    }
  }

  /** Profile `large`'s key distribution and derive its salt factor: the
    * statistics scan a planner pays ONCE per table (ANALYZE) and reuses
    * across queries — callers that join the same table repeatedly should
    * cache this (q12d does, via `Tables.ensureModel`). Only the three
    * scalars the factor needs are computed (per-key counts → one global
    * rollup), not `Inspection.skewProfile`'s top-k mass arm. An empty
    * frame profiles as balanced (factor 1): the global agg's sum/max are
    * null there, never fed to [[saltFactorFor]] unguarded.
    */
  def profileSaltFactor(large: DataFrame, key: String, cap: Int = 32): Int = {
    val prof = large.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(max(col("cnt")), lit(0L)).cast("long").as("max_cnt"))
      .head() // 1-row profile
    saltFactorFor(prof.getLong(0), prof.getLong(1), prof.getLong(2), cap)
  }

  /** Measurement-driven salted join: [[profileSaltFactor]] then either join
    * plainly (factor 1 — don't replicate the small side for balanced data)
    * or salt. Returns the joined frame plus the decision, so callers can
    * log/assert what the data made the engine do (the no-silent-decisions
    * rule). `factorOverride` feeds a cached/profiled-elsewhere factor in.
    */
  def adaptiveSaltedJoin(large: DataFrame, small: DataFrame, key: String,
      cap: Int = 32, factorOverride: Option[Int] = None,
      scatter: Option[Column] = None): (DataFrame, Int) = {
    val factor = factorOverride.getOrElse(profileSaltFactor(large, key, cap))
    val joined =
      if (factor <= 1) large.join(small, key)
      else saltedJoin(large, small, key, factor, scatter)
    (joined, factor)
  }
}
