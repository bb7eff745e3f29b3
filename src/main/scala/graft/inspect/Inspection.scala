package graft.inspect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-derived metadata queries the reference gets from the inspection API
  * (R20–R22, R25): field first-seen times, value distributions, table
  * discovery. All are single-shuffle aggregations.
  */
object Inspection {

  /** R20 (add_output.py:264-274): earliest event time at which each listed
    * column was observed non-null. Drives the schema-evolution backfill
    * window (R19: replay from `min(firstSeen) − 1 minute`).
    */
  def firstSeen(df: DataFrame, tsCol: Column, cols: Seq[(String, Column)]): DataFrame = {
    val aggs = cols.map { case (name, c) =>
      min(when(c.isNotNull, tsCol)).as(name)
    }
    // one pass over the data for ALL columns (the reference probes one HTTP
    // round-trip per column; here a single aggregate), then unpivot.
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackExpr) AS (column_name, first_seen)")
  }

  /** R21 (add_output.py:524-534): distinct values + frequencies, capped —
    * `TakeOrderedAndProject` physically, so the cap bounds driver memory.
    */
  def valueDistribution(df: DataFrame, value: Column, take: Int): DataFrame =
    df.groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(take)

  /** Per-column data-quality profile: row, null, and distinct counts for
    * each listed column — the table-health read a schema-evolution or
    * data-quality monitor runs (R21-adjacent: the reference's field
    * inspection reports distributions per field; this is the one-pass
    * whole-table variant). All counts come from a single aggregate (the
    * distinct counts expand map-side), then unpivot to one row per column.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__n_$c"),
        count_distinct(col(c)).as(s"__d_$c"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', `__n_$c`, `__d_$c`").mkString(", ")
    wide.selectExpr(
        s"stack(${cols.size}, $stackExpr) AS (column_name, n_nulls, n_distinct)",
        "__total AS n_rows")
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
  }

  /** The sketch twin of [[nullProfile]] for 100 TB tables: per-column
    * APPROXIMATE cardinalities via HLL (`approx_count_distinct`) — one pass,
    * fixed sketch memory per column, no per-column distinct expansion (the
    * exact profile's `count_distinct` grows its partial state with the
    * cardinality itself; the sketch stays at ~1.5 KB/column regardless).
    * q67c pins every estimate within 3·rsd of exact.
    */
  def cardinalityProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"__a_$c")) :+
      count(lit(1)).as("__total")
    val stackExpr = cols.map(c => s"'$c', `__a_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackExpr) AS (column_name, approx_distinct)",
        "__total AS n_rows")
      .select(col("column_name"), col("n_rows"), col("approx_distinct"))
  }

  /** Key-distribution skew profile — the diagnostic a partition planner
    * reads before choosing a join strategy for a 100 TB key: total rows,
    * distinct keys, the heaviest key's count, and the mass held by the
    * top-k keys, all exact integers (no ratios — consumers cross-multiply,
    * e.g. hot-key test `max_cnt * n_keys > 8 * n_rows`). Two aggregations:
    * per-key counts (one shuffle), then a global rollup whose top-k arm is
    * a TakeOrdered (bounded driver memory at any key cardinality). A
    * `max_cnt` far above `n_rows / n_keys` is the signal to reach for
    * [[graft.engine.Skew.saltedJoin]] or AQE skew splitting.
    */
  def skewProfile(df: DataFrame, key: Column, topK: Int): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("k")).limit(topK)
      .agg(sum(col("cnt")).cast("bigint").as(s"top${topK}_mass"))
    counts.agg(
        sum(col("cnt")).cast("bigint").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).cast("bigint").as("max_cnt"))
      .crossJoin(broadcast(top)) // 1-row frame; explicit, not AQE-rescued
  }

  /** Per-column numeric profile: min / max / sum / null count for each
    * listed numeric column in ONE aggregate pass, unpivoted to a row per
    * column (the [[nullProfile]] shape for range/volume health). Sums run
    * in DECIMAL at the given scale — a double sum's value depends on
    * partition-order association, so it can never be compared across
    * engines or reruns; min/max are order-free and stay exact.
    */
  def numericProfile(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val dt = org.apache.spark.sql.types.DecimalType(38, scale)
    // the sum input casts at FULL precision (38, scale): a narrower input
    // cast (e.g. 18 digits) silently nulls any value with ≥ 18−scale
    // integer digits under non-ANSI semantics — epoch micros or large
    // money columns would drop out of the sum while min/max still see them
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast(dt)).as(s"__min_$c"),
        max(col(c).cast(dt)).as(s"__max_$c"),
        sum(col(c).cast(dt)).as(s"__sum_$c"),
        count(when(col(c).isNull, 1)).as(s"__n_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', CAST(`__min_$c` AS STRING), CAST(`__max_$c` AS STRING), " +
        s"CAST(`__sum_$c` AS STRING), `__n_$c`").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackExpr) AS " +
      "(column_name, min_v, max_v, sum_v, n_nulls)")
  }

  /** Referential-integrity monitor for replicated state: child rows whose
    * foreign key has no matching parent key — the cross-table health check
    * a per-table CDC apply needs, because independent last-write-wins
    * streams are never transactionally consistent ACROSS tables (a child
    * batch can land before its parent's insert, or after the parent's hard
    * delete). Emits one row per orphaned key with its child-row count, top
    * `topK` by (count DESC, key) — the triage view: WHICH parents are
    * missing and how much child data dangles on each. Plan shape at 100 TB:
    * the parent side collapses to its DISTINCT key column before a
    * left-anti equi-join (dimension-sized → broadcast; fact-sized → shuffle
    * on the key, the same join the apply itself pays), then a grouped count
    * of only the orphaned survivors.
    */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, topK: Int = 20): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(parentKeys, col(childKey) === col("__pk"), "left_anti")
      .groupBy(col(childKey).as("orphan_key"))
      .agg(count(lit(1)).cast("bigint").as("n_child_rows"))
      .orderBy(col("n_child_rows").desc, col("orphan_key"))
      .limit(topK)
  }

  /** Rate-anomaly triage over an event stream — the "did a producer go
    * rogue / die" monitor next to [[fkOrphans]]'s consistency check: per
    * (type, hour) counts ranked by their exact ratio to the type's own
    * typical hour. Typical = the DISCRETE lower median (the
    * (ct+1) DIV 2-th smallest hourly count, ties by hour) — rank-based, so
    * one runaway hour cannot drag its own baseline the way a mean would,
    * and exactly replayable by any engine (no interpolation).
    * score_x1000 = (n·1000) DIV median; both burst (high score) and outage
    * (low) tails matter — this surfaces the top `topK` by score.
    *
    * Scale shape: one grouped count keyed (type, hour) — map-side
    * combinable, the only full-data shuffle; the median window partitions
    * by type over hour-sized frames; the baseline join is |types| rows,
    * broadcast.
    */
  def rateAnomalies(events: DataFrame, topK: Int = 20,
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame =
    rateAnomalyScores(
      events.groupBy(col(typeCol).as("event_type"),
          unix_micros(date_trunc("hour", col(tsCol))).as("hour_us"))
        .agg(count(lit(1)).as("n")),
      topK)

  /** The scoring half of [[rateAnomalies]] over a pre-aggregated
    * (event_type, hour_us, n) frame — the ONE implementation the batch
    * query and the streaming [[graft.streaming.RateMonitor]] both run, so
    * the baselines can never diverge.
    */
  def rateAnomalyScores(hourly: DataFrame, topK: Int = 20): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy(col("n"), col("hour_us"))
    val wAll = Window.partitionBy("event_type")
    val med = hourly.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__ct", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__ct + 1) DIV 2"))
      .select(col("event_type"), col("n").as("med"))
    hourly.join(broadcast(med), "event_type")
      .withColumn("score_x1000", expr("(n * 1000) DIV med"))
      .select(col("event_type"), col("hour_us"), col("n").cast("bigint").as("n"),
        col("med").cast("bigint").as("med"),
        col("score_x1000").cast("bigint").as("score_x1000"))
      .orderBy(col("score_x1000").desc, col("event_type"), col("hour_us"))
      .limit(topK)
  }

  /** Semi-structured schema profile — the inspection a JSON payload column
    * gets before anyone writes a typed extraction (which keys exist, how
    * often, what scalar type they carry, how wide their value domain is):
    * per key observed anywhere in the column, presence count, how many
    * values parse as integers (a pure-regex type probe — no dialect-
    * dependent typeof), and the distinct-value cardinality. Flat-object
    * payloads decode through one `from_json` to map<string,string> (scalar
    * values keep their JSON text form) — one explode + one grouped count,
    * key-count-sized output.
    */
  def jsonProfile(df: DataFrame, jsonCol: Column): DataFrame =
    df.select(explode(from_json(jsonCol,
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "value")))
      .groupBy("key")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(when(col("value").rlike("^-?[0-9]+$"), 1L).otherwise(0L))
          .cast("bigint").as("n_int"),
        count_distinct(col("value")).cast("bigint").as("n_distinct"))

  /** R25: table discovery = distribution of the derived full table name. */
  def tables(envelope: DataFrame): DataFrame =
    graft.cdc.CdcPipeline.withFullTableName(envelope)
      .select(col("full_table_name")).distinct()

  /** One drift finding between two schema epochs. */
  final case class SchemaDrift(column: String, change: String,
      beforeType: Option[String], afterType: Option[String])

  /** Schema drift report between two table epochs (the decision input for
    * the R19/R23 evolution loop): columns added, removed, or re-typed,
    * top-level by name. `added` is what triggers a backfill-and-restart in
    * [[graft.streaming.CdcStream]]'s SchemaEvolution; `retyped` is the case
    * warehouses reject (surface it, don't guess a cast); `removed` columns
    * stay in the sink (null-filled) under union-by-name semantics.
    */
  def schemaDrift(before: org.apache.spark.sql.types.StructType,
      after: org.apache.spark.sql.types.StructType): Seq[SchemaDrift] = {
    val b = before.fields.map(f => f.name -> f.dataType.sql).toMap
    val a = after.fields.map(f => f.name -> f.dataType.sql).toMap
    val added = (a.keySet -- b.keySet).toSeq.sorted
      .map(c => SchemaDrift(c, "added", None, Some(a(c))))
    val removed = (b.keySet -- a.keySet).toSeq.sorted
      .map(c => SchemaDrift(c, "removed", Some(b(c)), None))
    val retyped = (a.keySet & b.keySet).toSeq.sorted
      .filter(c => a(c) != b(c))
      .map(c => SchemaDrift(c, "retyped", Some(b(c)), Some(a(c))))
    added ++ removed ++ retyped
  }
}
