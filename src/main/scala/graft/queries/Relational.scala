package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables

/** Relational t2 surface: scans, filters, joins, aggregations, windows,
  * sort/limit, set ops, scalar functions (SURVEY §2.3 Q01–Q56).
  *
  * Engine-side the `events` view is already canonical (microsecond
  * timestamps); the DuckDB oracle normalizes the nanosecond parquet column
  * with the normative CTE (FIXTURES.md §1).
  */
object Relational {

  /** q03's scratch dir: fixed within a JVM (overwrite keeps repeated runs
    * from accumulating copies), pid-suffixed against concurrent sessions,
    * and deleted on JVM exit so sessions don't leak tmp disk across runs.
    */
  private lazy val q03Out: String = {
    val out = sys.props("java.io.tmpdir") + "/graft_q03_roundtrip_" +
      ProcessHandle.current().pid()
    sys.addShutdownHook { graft.engine.Fs.deleteTree(new java.io.File(out)); () }
    out
  }

  /** DuckDB-side canonical events view (engine side has the `events` view). */
  private val E =
    """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
      |user_id, event_type, value, props FROM events)""".stripMargin

  /** Shared by q19 (compositional as-of) and q19b (custom AsOfJoinExec) —
    * the two are row-identical by construction, so one oracle verifies both.
    */
  private val asofOracleSql =
    s"""$E,
       |     p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
       |     v AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'view'),
       |     j AS (SELECT p.event_id AS pid, v.ts AS vts, v.event_id AS vid
       |           FROM p JOIN v ON p.user_id = v.user_id AND v.ts < p.ts),
       |     m AS (SELECT pid, max(vts) AS mts FROM j GROUP BY pid)
       |SELECT m.pid AS event_id, epoch_us(m.mts) AS view_ts_us,
       |       max(j.vid) AS view_event_id
       |FROM m JOIN j ON j.pid = m.pid AND j.vts = m.mts
       |GROUP BY m.pid, m.mts""".stripMargin

  val all: Seq[QDef] = Seq(

    // ---------------------------------------------------------- scans
    QDef.shared("q01_count", "SELECT count(*) AS cnt FROM lineitem"),

    QDef.shared(
      "q02_project_limit",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_quantity AS DECIMAL(18,4)) AS STRING) AS quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin),

    // Engine writes a filtered parquet, re-reads, counts — exercises the
    // writer path; oracle counts directly.
    QDef.df("q03_parquet_roundtrip",
      "SELECT count(*) AS cnt FROM lineitem WHERE l_discount > 0.05") { (s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_discount") > 0.05)
        .write.mode("overwrite").parquet(q03Out)
      s.read.parquet(q03Out).agg(count(lit(1)).as("cnt"))
    },

    // seeded sampling (engine-only: sampling RNGs differ across engines;
    // REPEATABLE makes it deterministic within Spark)
    // Sample membership differs per engine RNG, but the sampling CONTRACT
    // is oracle-checkable: emit the total (oracle-knowable) plus a boolean
    // asserting the Bernoulli 10% draw landed within [5%, 15%] of the
    // table — ±3sigma at sf0.01 is well inside that.
    QDef.df("q99_tablesample",
      "SELECT count(*) AS total, true AS sample_ok FROM lineitem") { (s, dir) =>
      Tables.ensure(s, dir)
      s.sql(
        """SELECT total, sampled BETWEEN total * 0.05 AND total * 0.15 AS sample_ok
          |FROM (SELECT (SELECT count(*) FROM lineitem) AS total,
          |             (SELECT count(*) FROM lineitem
          |              TABLESAMPLE (10 PERCENT) REPEATABLE (42)) AS sampled)""".stripMargin)
    },

    // ------------------------------------------------- filters / predicates
    QDef.shared(
      "q04_compound_predicate",
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND (l_quantity BETWEEN 10 AND 20 OR l_tax > 0.05)
        |  AND l_linestatus IN ('F','O')
        |  AND NOT (l_shipdate < TIMESTAMP '1995-01-01 00:00:00')""".stripMargin),

    QDef.shared(
      "q05_null_handling",
      """SELECT event_type,
        |       count(*) FILTER (WHERE coalesce(value, 0) > 100) AS cnt_big,
        |       count(*) FILTER (WHERE props IS NOT NULL) AS cnt_props
        |FROM events GROUP BY event_type""".stripMargin),

    QDef.shared(
      "q06_case_buckets",
      """SELECT CASE WHEN o_totalprice > 150000 THEN 'big'
        |            WHEN o_totalprice > 50000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |       count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9) AS DECIMAL(38,3)) AS STRING) AS disc_sum
        |FROM orders GROUP BY 1""".stripMargin),

    QDef.shared(
      "q07_like",
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'a%'
        |GROUP BY p_brand""".stripMargin),

    QDef.sql(
      "q08_null_safe_eq",
      """SELECT count(*) AS matched FROM events e1 JOIN events e2
        |  ON e1.event_id = e2.event_id AND e1.value <=> e2.value""".stripMargin,
      """SELECT count(*) AS matched FROM events e1 JOIN events e2
        |  ON e1.event_id = e2.event_id AND e1.value IS NOT DISTINCT FROM e2.value""".stripMargin),

    QDef.shared(
      "q09_conditionals",
      """SELECT o_orderstatus,
        |       count(nullif(o_orderpriority, '1-URGENT')) AS non_urgent,
        |       CAST(CAST(SUM(CAST(greatest(o_totalprice, 100000) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS sum_hi,
        |       CAST(CAST(SUM(CAST(least(o_totalprice, 100000) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS sum_lo
        |FROM orders GROUP BY o_orderstatus""".stripMargin),

    // ---------------------------------------------------------- joins
    QDef.shared(
      "q10_inner_join",
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    // Broadcast join spelled with the DataFrame API: `part` is the small
    // dimension → BroadcastHashJoin, no shuffle of lineitem.
    QDef.df("q11_broadcast_join",
      """SELECT p_brand, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast("string").as("sum_price"))
    },

    // Bloom-pruned join (runtime-filter pattern, driven explicitly): the
    // lineitem side is filtered through a bloom of the selective part-key
    // set BEFORE any exchange; the exact join then removes false positives,
    // so the result is row-identical to the plain join the oracle runs.
    QDef.df("q11b_bloom_join",
      """SELECT p_brand, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |GROUP BY p_brand""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
      val p = Tables.table(s, dir, "part").filter(col("p_size") === 1)
      // expectedItems sized to the selective key set (p_size=1 ≈ 2% of
      // part), keeping the bloom literal KBs instead of the 1M default's MB
      graft.engine.BloomPrune.prunedJoin(li, p, "l_partkey", "p_partkey",
        expectedItems = 1L << 16)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast("string").as("sum_qty"))
    },

    QDef.sql(
      "q12_sortmerge_join",
      """SELECT /*+ MERGE(lineitem) */ o_orderstatus, count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
      """SELECT o_orderstatus, count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin),

    // Salted skew join sharing the plain join's oracle: the large side
    // scatters into 8 salt buckets, the small side replicates 8x, the key
    // becomes (key, salt) — a dominant hot key's partition splits 8 ways.
    // The tool for skew so heavy even AQE's split partitions blow executor
    // memory (or where AQE is off, e.g. inside foreachBatch). Same rows out.
    QDef.df("q12b_salted_join",
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.engine.Skew.saltedJoin(li, ord, "l_orderkey", factor = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
            .cast("string").as("qty"))
    },

    // Measurement-driven salting (q12b's decision made by the data): the
    // engine profiles the large side's key — total rows, distinct keys,
    // heaviest key — derives the factor that levels the hottest key to the
    // average key's partition load, and joins plainly when the profile says
    // the data is balanced. The 100 TB rule q12b leaves implicit: whether
    // to salt is read off the data, never hardcoded. Same oracle rows; the
    // chosen factor is part of the output so the decision is auditable.
    QDef.df("q12d_adaptive_salted",
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      // key statistics are ANALYZE-style planner state: profiled once per
      // (session, dir), reused by every later run — the join is what a
      // repeat caller pays
      val factor: Int = Tables.ensureModel[java.lang.Integer]("q12d_salt_factor", s, dir)(
        Int.box(graft.engine.Skew.profileSaltFactor(li, "l_orderkey"))).intValue
      val (joined, _) = graft.engine.Skew.adaptiveSaltedJoin(
        li, ord, "l_orderkey", factorOverride = Some(factor))
      joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
            .cast("string").as("qty"))
    },

    // Bucketed co-located join: both sides are written bucketed on the join
    // key FIRST (the ingest-time shuffle a 100 TB fact table pays once —
    // Tables.ensureBucketed builds them a single time per session/dir, so
    // the query itself measures only the read side), then the sort-merge
    // join runs with ZERO Exchange — the bucketed scans already satisfy the
    // distribution (shuffle-freedom pinned by the PlanSpec bucketed-join
    // test). Same rows as the plain-join oracle.
    QDef.df("q12c_bucketed_join",
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.ensureBucketed(s, dir)
      s.table("bq12c_lineitem").hint("merge")
        .join(s.table("bq12c_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
            .cast("string").as("qty"))
    },

    QDef.shared(
      "q13_left_outer_join",
      """SELECT c_custkey, count(o_orderkey) AS cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 50 GROUP BY c_custkey""".stripMargin),

    QDef.shared(
      "q14_full_outer_join",
      """WITH s AS (SELECT s_nationkey AS nk, count(*) AS sc FROM supplier GROUP BY s_nationkey),
        |     c AS (SELECT c_nationkey AS nk, count(*) AS cc FROM customer GROUP BY c_nationkey)
        |SELECT coalesce(s.nk, c.nk) AS nationkey,
        |       coalesce(sc, 0) AS suppliers, coalesce(cc, 0) AS customers
        |FROM s FULL OUTER JOIN c ON s.nk = c.nk""".stripMargin),

    QDef.shared(
      "q15_semi_join",
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin),

    QDef.shared(
      "q16_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),

    QDef.shared(
      "q17_theta_join",
      "SELECT count(*) AS cnt FROM part, supplier WHERE p_size > s_suppkey * 4"),

    // q17's semantics through the ORDER-STATISTICS decomposition
    // ([[graft.engine.OrderStatJoin]]): the monotone theta COUNT never
    // materializes pairs — cross-bin pairs count from two B-row per-bin
    // aggregate frames, only the boundary bin pays an exact equi-joined
    // check. Same oracle as q17: the cartesian plan and the decomposition
    // must agree to the row.
    QDef.df("q17b_theta_rank",
      "SELECT count(*) AS cnt FROM part, supplier WHERE p_size > s_suppkey * 4") {
      (s, dir) =>
        Tables.ensure(s, dir)
        graft.engine.OrderStatJoin.countLess(
          s.table("part"), col("p_size"),
          s.table("supplier"), col("s_suppkey") * 4, binW = 16L)
    },

    // the natural range-join SQL, auto-routed: [[graft.plans
    // .RangeJoinBinning]] rewrites the equi+interval join onto the binned
    // plan (q18b's shape) inside the optimizer, so the user's query stops
    // materializing O(pairs-per-key) before filtering. The guard fails the
    // CORRECTNESS run if the rule ever stops engaging.
    QDef.df(
      "q18_range_self_join",
      s"""$E
         |SELECT e1.event_type, count(*) AS cnt
         |FROM e e1 JOIN e e2
         |  ON e1.user_id = e2.user_id
         | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
         |GROUP BY e1.event_type""".stripMargin) { (s, dir) =>
      Tables.ensure(s, dir)
      val df = s.sql(
        """SELECT e1.event_type, count(*) AS cnt
          |FROM events e1 JOIN events e2
          |  ON e1.user_id = e2.user_id
          | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
          |GROUP BY e1.event_type""".stripMargin)
      val binned = df.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists(_.references.exists(
              _.name.startsWith("__graft_bin"))) => j
      }
      require(binned.nonEmpty,
        "RangeJoinBinning did not engage: q18 would run as an unbinned " +
          "equi-join with the range as a post-filter (O(pairs-per-key))")
      df
    },

    // q18's semantics through the bin-bucketed range join: same oracle, but
    // the engine joins on (user, time-bin) instead of materializing every
    // within-user pair — the scale path for dense keys.
    QDef.df("q18b_range_binned",
      s"""$E
         |SELECT e1.event_type, count(*) AS cnt
         |FROM e e1 JOIN e e2
         |  ON e1.user_id = e2.user_id
         | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
         |GROUP BY e1.event_type""".stripMargin) { (s, dir) =>
      Tables.ensure(s, dir)
      val e = s.table("events")
      val l = e.select(col("user_id").as("l_user"), col("event_type"),
        unix_micros(col("ts")).as("l_us"))
      val r = e.select(col("user_id").as("r_user"), unix_micros(col("ts")).as("r_us"))
      graft.engine.RangeJoin
        .binned(l, r, "l_user", "r_user", "l_us", "r_us", windowUs = 3600L * 1000000L)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    },

    // Two-sided interval OVERLAP join (vs q18's point-in-window): view and
    // purchase events carry closed intervals of event-id-derived length;
    // pairs with the same user and overlapping intervals. Engine explodes
    // BOTH sides to touched time bins and counts each pair only in the bin
    // holding the overlap's start — equi-join on (user, bin), exact, no
    // dedup pass; oracle is the plain theta join.
    QDef.df("q18c_interval_overlap",
      s"""$E,
         |a AS (SELECT user_id, event_id, epoch_us(ts) AS s0,
         |             epoch_us(ts) + (event_id % 3600) * 1000000 AS e0
         |      FROM e WHERE event_type = 'view'),
         |b AS (SELECT user_id, event_id, epoch_us(ts) AS s0,
         |             epoch_us(ts) + (event_id % 3600) * 1000000 AS e0
         |      FROM e WHERE event_type = 'purchase')
         |SELECT a.user_id, count(*) AS n_pairs,
         |       CAST(sum(a.event_id + b.event_id) AS BIGINT) AS id_sum
         |FROM a JOIN b ON a.user_id = b.user_id
         |              AND greatest(a.s0, b.s0) <= least(a.e0, b.e0)
         |GROUP BY a.user_id""".stripMargin) { (s, dir) =>
      Tables.ensure(s, dir)
      val ev = s.table("events")
      def side(tpe: String, u: String, id: String, s0: String, e0: String) =
        ev.filter(col("event_type") === tpe).select(
          col("user_id").as(u), col("event_id").as(id),
          unix_micros(col("ts")).as(s0),
          (unix_micros(col("ts")) + (col("event_id") % 3600) * 1000000L).as(e0))
      graft.engine.RangeJoin.intervalOverlap(
          side("view", "user_id", "aid", "as0", "ae0"),
          side("purchase", "bu", "bid", "bs0", "be0"),
          "user_id", "bu", "as0", "ae0", "bs0", "be0",
          binWidth = 3600L * 1000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("aid") + col("bid")).cast("bigint").as("id_sum"))
    },

    // symmetric proximity band ("other events within ±30 min of this
    // one") — the SHIFTED-lower-bound shape [[graft.plans
    // .RangeJoinBinning]] normalizes to a (base−W, base+W] window; the
    // guard fails CORRECTNESS if the auto-binning ever stops engaging on
    // bands (q18's guard covers only the one-sided form)
    QDef.df(
      "q18d_proximity_band",
      s"""$E
         |SELECT e1.event_type, count(*) AS cnt
         |FROM e e1 JOIN e e2
         |  ON e1.user_id = e2.user_id
         | AND e2.ts > e1.ts - INTERVAL 30 MINUTE
         | AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
         | AND e1.event_id <> e2.event_id
         |GROUP BY e1.event_type""".stripMargin) { (s, dir) =>
      Tables.ensure(s, dir)
      val df = s.sql(
        """SELECT e1.event_type, count(*) AS cnt
          |FROM events e1 JOIN events e2
          |  ON e1.user_id = e2.user_id
          | AND e2.ts > e1.ts - INTERVAL 30 MINUTE
          | AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
          | AND e1.event_id <> e2.event_id
          |GROUP BY e1.event_type""".stripMargin)
      val binned = df.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists(_.references.exists(
              _.name.startsWith("__graft_bin"))) => j
      }
      require(binned.nonEmpty,
        "RangeJoinBinning did not engage on the proximity band — q18d " +
          "would run as an unbinned equi-join with the band as a post-filter")
      df
    },

    QDef.sql(
      "q19_asof_join",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |     j AS (SELECT p.event_id AS pid, v.ts AS vts, v.event_id AS vid
        |           FROM p JOIN v ON p.user_id = v.user_id AND v.ts < p.ts),
        |     m AS (SELECT pid, max(vts) AS mts FROM j GROUP BY pid)
        |SELECT m.pid AS event_id, unix_micros(m.mts) AS view_ts_us,
        |       max(j.vid) AS view_event_id
        |FROM m JOIN j ON j.pid = m.pid AND j.vts = m.mts
        |GROUP BY m.pid, m.mts""".stripMargin,
      asofOracleSql),

    // Q19's semantics through the custom AsOfJoinExec operator (LogicalPlan
    // + Strategy + SparkPlan; graft.plans). Row-identical to q19 by
    // construction — the operator's right side sorts by (key, ts, tie) and
    // keeps the last candidate, so ts-ties resolve to max(v_id), exactly the
    // oracle's max(vid) — hence it shares q19's DuckDB oracle, which verifies
    // the CUSTOM plan, not just ScalaTest (AsOfJoinSpec still pins
    // row-identity vs the compositional form); measured 8.6x over the
    // compositional form at 1M events.
    QDef.df("q19b_asof_custom", asofOracleSql) { (s, dir) =>
      val e = s.table("events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOf.join(p, v, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
        .filter(col("v_id").isNotNull)
        .select(col("p_id").as("event_id"),
          unix_micros(col("v_ts")).as("view_ts_us"),
          col("v_id").as("view_event_id"))
    },

    // Tolerance as-of through the CUSTOM operator: latest view within
    // [p.ts − 1h, p.ts) — the bounded-lookback form every finance/telemetry
    // as-of actually runs (an unbounded as-of joins against arbitrarily
    // stale rows). Same custom exec, tolerance pushed into the merge; the
    // oracle adds the window bound to q19's shape.
    QDef.df("q19c_asof_tolerance",
      s"""$E,
         |     p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
         |     v AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'view'),
         |     j AS (SELECT p.event_id AS pid, v.ts AS vts, v.event_id AS vid
         |           FROM p JOIN v ON p.user_id = v.user_id AND v.ts < p.ts
         |                        AND v.ts >= p.ts - INTERVAL 1 HOUR),
         |     m AS (SELECT pid, max(vts) AS mts FROM j GROUP BY pid)
         |SELECT m.pid AS event_id, epoch_us(m.mts) AS view_ts_us,
         |       max(j.vid) AS view_event_id
         |FROM m JOIN j ON j.pid = m.pid AND j.vts = m.mts
         |GROUP BY m.pid, m.mts""".stripMargin) { (s, dir) =>
      val e = s.table("events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOf.join(p, v, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"),
          tolerance = Some(3600L * 1000000L)) // 1 hour in event-time micros
        .filter(col("v_id").isNotNull)
        .select(col("p_id").as("event_id"),
          unix_micros(col("v_ts")).as("view_ts_us"),
          col("v_id").as("view_event_id"))
    },

    // FORWARD as-of through the custom operator (earliest view AFTER each
    // purchase): both event times negate and the backward two-pointer merge
    // exec runs unchanged — direction is a view transform, not a second
    // operator. Oracle mirrors q19 with min-after instead of max-before.
    QDef.df("q19d_asof_forward",
      s"""$E,
         |     p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
         |     v AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'view'),
         |     j AS (SELECT p.event_id AS pid, v.ts AS vts, v.event_id AS vid
         |           FROM p JOIN v ON p.user_id = v.user_id AND v.ts > p.ts),
         |     m AS (SELECT pid, min(vts) AS mts FROM j GROUP BY pid)
         |SELECT m.pid AS event_id, epoch_us(m.mts) AS view_ts_us,
         |       max(j.vid) AS view_event_id
         |FROM m JOIN j ON j.pid = m.pid AND j.vts = m.mts
         |GROUP BY m.pid, m.mts""".stripMargin) { (s, dir) =>
      val e = s.table("events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOf.joinForward(p, v, "p_user", "v_user", "p_ts", "v_ts", Seq("v_id"))
        .filter(col("v_id").isNotNull)
        .select(col("p_id").as("event_id"),
          unix_micros(col("v_ts")).as("view_ts_us"),
          col("v_id").as("view_event_id"))
    },

    // ---------------------------------------------------------- aggregations
    QDef.shared(
      "q20_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_price,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_disc_price,
        |       count(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),

    QDef.shared(
      "q21_count_distinct",
      """SELECT count(DISTINCT l_partkey) AS dparts,
        |       count(DISTINCT l_suppkey) AS dsupps,
        |       count(*) AS cnt FROM lineitem""".stripMargin),

    QDef.shared(
      "q22_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin),

    QDef.shared(
      "q23_rollup",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin),

    QDef.shared(
      "q24_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),

    QDef.shared(
      "q25_having",
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin),

    QDef.shared(
      "q25b_correlated_scalar",
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
        |       (SELECT CAST(CAST(coalesce(max(o_totalprice), 0) AS DECIMAL(18,2)) AS STRING)
        |        FROM orders WHERE o_custkey = c_custkey) AS max_price
        |FROM customer WHERE c_custkey < 50""".stripMargin),

    // correlated LATERAL subquery: per-nation top customer by balance
    QDef.shared(
      "q49b_lateral",
      """SELECT n_name, t.c_name, t.bal
        |FROM nation,
        |LATERAL (SELECT c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS bal
        |         FROM customer WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t""".stripMargin),

    QDef.sql(
      "q26_filtered_agg",
      """SELECT event_type,
        |       count(*) FILTER (WHERE value > 100) AS cnt_big,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE user_id % 2 = 0) AS DECIMAL(38,4)) AS STRING) AS even_sum
        |FROM events GROUP BY event_type""".stripMargin,
      """SELECT event_type,
        |       count(*) FILTER (WHERE value > 100) AS cnt_big,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE user_id % 2 = 0) AS DECIMAL(38,4)) AS STRING) AS even_sum
        |FROM events GROUP BY event_type""".stripMargin),

    QDef.sql(
      "q27_max_by",
      """SELECT o_custkey,
        |       unix_micros(CAST(max_by(o_orderdate, o_orderkey) AS TIMESTAMP)) AS maxkey_date_us,
        |       unix_micros(CAST(min_by(o_orderdate, o_orderkey) AS TIMESTAMP)) AS minkey_date_us
        |FROM orders WHERE o_custkey < 100 GROUP BY o_custkey""".stripMargin,
      """SELECT o_custkey,
        |       epoch_us(max_by(o_orderdate, o_orderkey)) AS maxkey_date_us,
        |       epoch_us(min_by(o_orderdate, o_orderkey)) AS minkey_date_us
        |FROM orders WHERE o_custkey < 100 GROUP BY o_custkey""".stripMargin),

    QDef.sql(
      "q28_global_stats",
      """SELECT unix_micros(CAST(min(o_orderdate) AS TIMESTAMP)) AS min_date_us,
        |       unix_micros(CAST(max(o_orderdate) AS TIMESTAMP)) AS max_date_us,
        |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,4)) AS STRING) AS min_price,
        |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,4)) AS STRING) AS max_price,
        |       count(*) AS cnt, count(DISTINCT o_custkey) AS dcust
        |FROM orders""".stripMargin,
      """SELECT epoch_us(min(o_orderdate)) AS min_date_us,
        |       epoch_us(max(o_orderdate)) AS max_date_us,
        |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,4)) AS STRING) AS min_price,
        |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,4)) AS STRING) AS max_price,
        |       count(*) AS cnt, count(DISTINCT o_custkey) AS dcust
        |FROM orders""".stripMargin),

    // Statistical aggregates the scale-correct way: variance from EXACT
    // decimal power sums (one pass, map-side combinable, no float
    // accumulation-order dependence — Spark's builtin stddev merges partial
    // moments in double and is not cross-engine-stable). The final formula
    // runs in double over the same exact decimal inputs on both engines.
    QDef.shared(
      "q28b_exact_stats",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(CAST(SUM(q) AS DECIMAL(38,4)) AS STRING) AS sum_q,
        |       CAST(CAST(SUM(q * q) AS DECIMAL(38,8)) AS STRING) AS sum_q2,
        |       CAST(CAST((CAST(count(*) AS DOUBLE) * CAST(SUM(q * q) AS DOUBLE)
        |                  - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE))
        |                 / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1))
        |            AS DECIMAL(38,4)) AS STRING) AS variance
        |FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,4)) AS q FROM lineitem) t
        |GROUP BY l_returnflag""".stripMargin),

    // Bivariate exact-arithmetic stats (the q28b pattern in two variables):
    // n, Σx, Σy, Σxy, Σx², Σy² as exact decimal power sums — map-side
    // combinable, accumulation-order-independent — then sample covariance
    // and Pearson correlation derived in double from those exact sums (the
    // conversions and IEEE ops are identical text on both engines, so the
    // derived values match bit-for-bit).
    QDef.shared(
      "q28c_covariance",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(CAST(SUM(x * y) AS DECIMAL(38,6)) AS STRING) AS sum_xy,
        |       CAST(CAST(SUM(x) AS DECIMAL(38,4)) AS STRING) AS sum_x,
        |       CAST(CAST(SUM(y) AS DECIMAL(38,2)) AS STRING) AS sum_y,
        |       CAST(CAST((CAST(count(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
        |                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
        |                 / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1))
        |            AS DECIMAL(38,4)) AS STRING) AS covar_samp,
        |       CAST(CAST((CAST(count(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
        |                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
        |                 / (sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
        |                         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
        |                    * sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(y * y) AS DOUBLE)
        |                           - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)))
        |            AS DECIMAL(38,6)) AS STRING) AS corr
        |FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,4)) AS x,
        |             -- price at its native scale 2: a scale-4 cast would put the
        |             -- scaled int64 near 1e9 and price*price past int64 in
        |             -- DuckDB's width-18 multiply path
        |             CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem) t
        |GROUP BY l_returnflag""".stripMargin),

    // Per-group outlier detection from exact power sums — |x − mean| > 2σ
    // (population), cross-multiplied into pure integers so no float or
    // decimal division ever happens: (n·q − Σq)² > 4·(n·Σq² − (Σq)²) is the
    // z² > 4 test scaled by n². Two passes (grouped sums, then the flagging
    // join back) — both map-side combinable, the join key is the group.
    // l_quantity is uniform (zero natural outliers), so both sides inject
    // one quantity-500 anomaly for every 10th supplier — the q90b
    // synthesize-the-phenomenon pattern — and exactly those must flag.
    QDef.shared(
      "q28d_outliers",
      """WITH t AS (SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS q FROM lineitem
        |           UNION ALL
        |           SELECT s_suppkey, 500 FROM supplier WHERE s_suppkey % 10 = 0),
        |s AS (SELECT l_suppkey, count(*) AS n, CAST(SUM(q) AS BIGINT) AS sq,
        |             CAST(SUM(q * q) AS BIGINT) AS sq2
        |      FROM t GROUP BY l_suppkey)
        |SELECT l_suppkey, n,
        |       CAST(SUM(CASE WHEN (n * q - sq) * (n * q - sq) > 4 * (n * sq2 - sq * sq)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM t JOIN s USING (l_suppkey)
        |GROUP BY l_suppkey, n""".stripMargin),

    QDef.sql(
      "q29_percentile",
      """SELECT l_returnflag,
        |       CAST(CAST(percentile(l_quantity, 0.5) AS DECIMAL(38,4)) AS STRING) AS med_qty,
        |       CAST(CAST(percentile(l_extendedprice, 0.9) AS DECIMAL(38,4)) AS STRING) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |       CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(38,4)) AS STRING) AS med_qty,
        |       CAST(CAST(quantile_cont(l_extendedprice, 0.9) AS DECIMAL(38,4)) AS STRING) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // The sketch path of q29 (exact percentile sorts each group; the
    // GK-summary sketch is the 100 TB answer), oracle-checked as an
    // Winsorization: clamp order totals at the EXACT p05/p95 order
    // statistics (rank floor((n−1)q)+1 over integer cents — floor of the
    // IEEE double·100 product is engine-identical) computed through the
    // bounded-memory exact-quantile path, then sum the clamped column.
    // The outlier-capping pass run before training-statistics extraction.
    QDef.df("q28e_winsorize",
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rk FROM v),
        |lo AS (SELECT c FROM r CROSS JOIN n WHERE rk = CAST(floor((n - 1) * 0.05) AS BIGINT) + 1),
        |hi AS (SELECT c FROM r CROSS JOIN n WHERE rk = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1)
        |SELECT (SELECT c FROM lo) AS p05_cents, (SELECT c FROM hi) AS p95_cents,
        |       count(*) AS cnt,
        |       CAST(sum(least(greatest(v.c, (SELECT c FROM lo)), (SELECT c FROM hi))) AS BIGINT) AS wsum
        |FROM v""".stripMargin) { (s, dir) =>
      val cents = Tables.table(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      // both quantiles off ONE shared scan set (count + sketch + bracket
      // counts + rank) instead of two independent exactQuantile passes
      val Seq(p05, p95) = graft.engine.Ranking
        .exactQuantiles(cents, col("c"), Seq(0.05, 0.95))
        .map(_.get.asInstanceOf[Long])
      cents
        .agg(count(lit(1)).as("cnt"),
          sum(least(greatest(col("c"), lit(p05)), lit(p95))).cast("bigint").as("wsum"))
        .select(lit(p05).as("p05_cents"), lit(p95).as("p95_cents"),
          col("cnt"), col("wsum"))
    },

    // accuracy-contract invariant per the q21b pattern: the sketch's median
    // element must sit between the exact 45th and 55th percentile ranks —
    // oracle-knowable group sizes plus a boolean that is a constant of the
    // data, far inside percentile_approx's rank-error guarantee.
    QDef.df("q29b_approx_percentile",
      """SELECT l_returnflag, count(*) AS n, true AS within_bounds
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("bigint").as("q"))
      val sketch = li.groupBy("l_returnflag")
        .agg(expr("percentile_approx(q, 0.5, 1000)").as("approx"),
          count(lit(1)).as("n"))
      li.join(broadcast(sketch), "l_returnflag")
        .groupBy(col("l_returnflag"), col("n"))
        .agg(sum(when(col("q") < col("approx"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("q") <= col("approx"), 1L).otherwise(0L)).as("le"))
        .select(col("l_returnflag"), col("n"),
          (col("lt") <= ceil(col("n") * 0.55) &&
            col("le") >= floor(col("n") * 0.45)).as("within_bounds"))
    },

    // EXACT quantiles through the scalable path (Ranking.exactQuantile:
    // approx bracket → below-count → distributed rank inside the bracket) —
    // Spark's built-in percentile buffers whole columns per group, this
    // never holds more than the bracket. Oracle derives the same order
    // statistic rank by window arithmetic; values are exact decimals.
    QDef.df("q29c_exact_quantile",
      """WITH s AS (SELECT o_totalprice, row_number() OVER (ORDER BY o_totalprice) AS rn,
        |                  count(*) OVER () AS n FROM orders)
        |SELECT '0.5' AS p, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS v FROM s
        |WHERE rn = floor((n - 1) * 0.5) + 1
        |UNION ALL
        |SELECT '0.9' AS p, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS v FROM s
        |WHERE rn = floor((n - 1) * 0.9) + 1""".stripMargin) { (s, dir) =>
      val price = Tables.table(s, dir, "orders").select(col("o_totalprice"))
      val ps = Seq("0.5", "0.9")
      val vs = graft.engine.Ranking
        .exactQuantiles(price, col("o_totalprice"), ps.map(_.toDouble))
      val rows = ps.zip(vs).map { case (p, v) => (p, v.get.asInstanceOf[Double]) }
      import s.implicits._
      // money-valued doubles round to 2 decimals identically on both
      // engines (no exact .005 boundary exists in binary64)
      rows.toDF("p", "__v")
        .select(col("p"), col("__v").cast("decimal(18,2)").cast("string").as("v"))
    },

    // Per-group exact medians through the same bounded path (group count
    // low and checked — the refuse-don't-loop contract): median l_quantity
    // per returnflag.
    QDef.df("q29d_group_quantile",
      """WITH s AS (SELECT l_returnflag, l_quantity,
        |                  row_number() OVER (PARTITION BY l_returnflag
        |                                     ORDER BY l_quantity) AS rn,
        |                  count(*) OVER (PARTITION BY l_returnflag) AS n
        |           FROM lineitem)
        |SELECT l_returnflag, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS STRING) AS med
        |FROM s WHERE rn = floor((n - 1) * 0.5) + 1""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
      val meds = graft.engine.Ranking.exactQuantileByGroup(
        li, col("l_returnflag"), col("l_quantity"), 0.5)
      import s.implicits._
      meds.map { case (g, v) => (g.asInstanceOf[String], v.asInstanceOf[Double]) }
        .toDF("l_returnflag", "__v")
        .select(col("l_returnflag"),
          col("__v").cast("decimal(18,2)").cast("string").as("med"))
    },

    // The HIGH-cardinality side of the grouped-quantile decision boundary:
    // exactQuantileByGroup REFUSES past 64 groups (q29d's bounded contract),
    // so per-customer percentiles — thousands of groups — belong to the
    // grouped percentile_approx sketch. Sketch values aren't
    // oracle-reproducible, but the accuracy contract is (the q29b/q21b
    // pattern): every group's sketch median must sit between its exact 45th
    // and 55th percentile ranks (far inside the GK guarantee at accuracy
    // 1000, rank error ≤ max(n/1000, 1) with per-customer n in the tens).
    // One grouped sketch + one join back on the SAME key (the sketch side
    // reuses its partitioning) + a final rollup — no per-group driver work
    // at any cardinality.
    QDef.df("q29e_group_approx_quantile",
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups,
        |       count(*) AS total_rows, true AS all_within_bounds
        |FROM orders""".stripMargin) { (s, dir) =>
      val o = Tables.table(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      val sketch = o.groupBy("o_custkey")
        .agg(expr("percentile_approx(o_totalprice, 0.5, 1000)").as("approx"),
          count(lit(1)).as("n"))
      o.join(sketch, "o_custkey")
        .groupBy(col("o_custkey"), col("n"))
        .agg(sum(when(col("o_totalprice") < col("approx"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("o_totalprice") <= col("approx"), 1L).otherwise(0L)).as("le"))
        .select(col("o_custkey"), col("n"),
          (col("lt") <= ceil(col("n") * 0.55) &&
            col("le") >= floor(col("n") * 0.45)).as("within"))
        .agg(count(lit(1)).cast("bigint").as("n_groups"),
          sum(col("n")).as("total_rows"),
          min(col("within")).as("all_within_bounds"))
    },

    // Exact WEIGHTED quantiles (importance-weighted corpus statistics —
    // each row counts w times): quantile q/1000 = smallest v with
    // cum·1000 >= total·q, pure integer comparisons, cumulative weight via
    // the distributed prefix sum over the distinct-value domain. Oracle is
    // the window cumsum formulation.
    QDef.df("q29f_weighted_quantile",
      """WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS v,
        |                  CAST(l_linenumber AS BIGINT) AS w FROM lineitem),
        |s AS (SELECT v, SUM(w) AS wv FROM t GROUP BY v),
        |c AS (SELECT v, SUM(wv) OVER (ORDER BY v) AS cum,
        |             (SELECT SUM(w) FROM t) AS tot FROM s)
        |SELECT CAST(MIN(CASE WHEN cum * 1000 >= tot * 250 THEN v END) AS BIGINT) AS p250,
        |       CAST(MIN(CASE WHEN cum * 1000 >= tot * 500 THEN v END) AS BIGINT) AS p500,
        |       CAST(MIN(CASE WHEN cum * 1000 >= tot * 750 THEN v END) AS BIGINT) AS p750
        |FROM c""".stripMargin) { (s, dir) =>
      graft.engine.Ranking.weightedQuantiles(
        Tables.table(s, dir, "lineitem"),
        col("l_quantity"), col("l_linenumber"), Seq(250, 500, 750))
    },

    // HLL twin of q21 (SURVEY: approx_count_distinct as the scalable
    // count-distinct) — engine-only: HLL sketches differ across engines.
    // HLL sketch values aren't oracle-reproducible, but the sketch's CLAIM
    // is: the engine emits exact distinct counts (oracle-knowable) plus
    // booleans asserting the HLL estimates land within 3x the configured
    // 5% rsd — so the driver verifies the approximation contract, not just
    // row counts.
    QDef.df("q21b_approx_distinct",
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_suppkey) AS exact_supps,
        |       count(*) AS cnt,
        |       true AS parts_ok, true AS supps_ok
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "lineitem")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"),
          count(lit(1)).as("cnt"))
        .select(col("exact_parts"), col("exact_supps"), col("cnt"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.15).as("parts_ok"),
          (abs(col("approx_supps") - col("exact_supps"))
            <= col("exact_supps") * 0.15).as("supps_ok"))
    },

    // Mergeable-sketch pattern (the 100 TB incremental path for q21b):
    // per-group Datasketches HLL sketches built independently, then merged
    // with hll_union_agg — exactly how a 1000-executor cluster (or an
    // incremental pipeline) computes a global cardinality without ever
    // re-reading history. Sketch bytes aren't oracle-reproducible, so the
    // output is the sketch's CLAIM: exact distincts (oracle-knowable) plus
    // booleans asserting (a) the merged estimate lands within 5% of exact
    // (lgK=12 ⇒ ~1.6% rsd, 3σ margin) and (b) union-of-partials agrees
    // with a direct whole-table sketch to 5% — the mergeability contract.
    QDef.df("q21c_hll_union",
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_returnflag) AS n_groups,
        |       true AS union_ok, true AS merge_consistent
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
      val partials = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      val merged = partials.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("union_est"),
        count(lit(1)).as("n_groups"))
      val direct = li.agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12))).as("direct_est"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      merged.crossJoin(broadcast(direct)).select(
        col("exact_parts"), col("n_groups"),
        (abs(col("union_est") - col("exact_parts"))
          <= col("exact_parts") * 0.05).as("union_ok"),
        (abs(col("union_est") - col("direct_est"))
          <= col("exact_parts") * 0.05).as("merge_consistent"))
    },

    // PERSISTENT sketch store (the q21c pattern made incremental): three
    // ingest batches each commit per-group HLL partials to disk; the
    // cardinality answer merges STORED partials only — history's data rows
    // are never re-read, appending a batch writes one tiny partial set.
    // Store build is the ingest-time cost, paid once via ensureSketchStore
    // (the q12c bucketed-table rule); the timed query is merge-at-read.
    // Oracle verifies the sketch's claim: exact per-group distincts plus
    // the 5%-band boolean (lgK=12 ⇒ ~1.6% rsd, 3σ margin) and the batch
    // bookkeeping.
    QDef.df("q21d_sketch_store",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       count(*) AS cnt, true AS est_ok, CAST(3 AS BIGINT) AS n_batches
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val store = new graft.sink.HllSketchStore(Tables.ensureSketchStore(s, dir))
      val exact = Tables.table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("cnt"))
      exact.join(store.estimates(s, Seq("l_returnflag")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
          (abs(col("estimate") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("est_ok"),
          col("n_batches"))
    },

    // q21d through a COMPACTED sketch store (round 10): three per-batch
    // partials folded into one by HllSketchStore.compact (a generation
    // flip). HLL union is associative and idempotent, so the merged
    // partial's estimates must clear the identical 5% band — and the
    // bookkeeping shows exactly one batch. The store-maintenance twin of
    // q84r for the cardinality leg.
    QDef.df("q21e_compacted_sketches",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       count(*) AS cnt, true AS est_ok, CAST(1 AS BIGINT) AS n_batches
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val store = new graft.sink.HllSketchStore(Tables.ensureCompactSketchStore(s, dir))
      val exact = Tables.table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("cnt"))
      exact.join(store.estimates(s, Seq("l_returnflag")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
          (abs(col("estimate") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("est_ok"),
          col("n_batches"))
    },

    // q21d across a concurrent-append/compaction interleaving (round-10
    // fold watermarks): two batches compacted, the third committed into
    // the SUPERSEDED generation (an appender that resolved the old
    // generation just before the flip), a folded batch replayed (no-op).
    // Estimates must still cover the whole table — the straggler stays
    // visible across the flip via the manifest watermark — with exactly
    // 2 visible partials (merged + straggler).
    QDef.df("q21f_straggler_sketches",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       count(*) AS cnt, true AS est_ok, CAST(2 AS BIGINT) AS n_batches
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val store = new graft.sink.HllSketchStore(Tables.ensureStragglerSketchStore(s, dir))
      val exact = Tables.table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("cnt"))
      exact.join(store.estimates(s, Seq("l_returnflag")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
          (abs(col("estimate") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("est_ok"),
          col("n_batches"))
    },

    // q21d under RETENTION (round 10): three batches, then
    // compact(dropBelow=1) — batch 0's rows leave the store (the Kafka
    // retention.ms analog for a year of daily partials), the retained
    // window folds to one partial, and a late replay of the dropped batch
    // no-ops under the watermark. Estimates must cover EXACTLY the two
    // surviving batches — the oracle aggregates that subset directly.
    QDef.df("q21g_retention_sketches",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       count(*) AS cnt, true AS est_ok, CAST(1 AS BIGINT) AS n_batches
        |FROM lineitem WHERE l_orderkey % 3 <> 0 GROUP BY 1""".stripMargin) { (s, dir) =>
      val store = new graft.sink.HllSketchStore(Tables.ensureRetainedSketchStore(s, dir))
      val exact = Tables.table(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(3)) =!= 0)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("cnt"))
      exact.join(store.estimates(s, Seq("l_returnflag")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
          (abs(col("estimate") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("est_ok"),
          col("n_batches"))
    },

    QDef.sql(
      "q39_string_agg",
      """SELECT n_regionkey,
        |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey""".stripMargin),

    // collection aggregates — sorted before serialization so the hash is
    // order-insensitive (collect_list order is nondeterministic)
    QDef.sql(
      "q38_collect",
      """SELECT o_custkey,
        |       to_json(array_sort(collect_list(o_orderkey))) AS orders_json,
        |       to_json(array_sort(collect_set(o_orderpriority))) AS prios_json
        |FROM orders WHERE o_custkey < 30 GROUP BY o_custkey""".stripMargin,
      """SELECT o_custkey,
        |       to_json(list_sort(list(o_orderkey))) AS orders_json,
        |       to_json(list_sort(list_distinct(list(o_orderpriority)))) AS prios_json
        |FROM orders WHERE o_custkey < 30 GROUP BY o_custkey""".stripMargin),

    // ---------------------------------------------------------- windows
    QDef.shared(
      "q30_row_number",
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey < 100) t
        |WHERE rn <= 2""".stripMargin),

    QDef.shared(
      "q31_rank",
      """SELECT o_orderpriority, o_orderkey,
        |       CAST(rk AS BIGINT) AS rk, CAST(drk AS BIGINT) AS drk FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rk <= 5""".stripMargin),

    QDef.sql(
      "q32_lag_lead",
      """WITH e2 AS (SELECT user_id, event_id, unix_micros(ts) AS tus
        |            FROM events WHERE user_id < 5)
        |SELECT user_id, event_id,
        |       tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap_us,
        |       lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS next_us
        |FROM e2""".stripMargin,
      s"""$E,
         |e2 AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM e WHERE user_id < 5)
         |SELECT user_id, event_id,
         |       tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap_us,
         |       lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS next_us
         |FROM e2""".stripMargin),

    QDef.shared(
      "q33_running_sum",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DECIMAL(38,4)) AS STRING) AS run_qty
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin),

    // RANGE frame (value-based, vs q33's ROWS): rolling 1h event count/sum
    // per user over epoch-micro offsets — works identically in both dialects
    // as a numeric range.
    QDef.sql(
      "q33b_range_frame",
      """WITH e2 AS (SELECT user_id, event_id, unix_micros(ts) AS tus, value
        |            FROM events WHERE user_id < 5)
        |SELECT user_id, event_id,
        |       CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
        |       CAST(CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,4))) OVER w AS DECIMAL(38,4)) AS STRING) AS sum_1h
        |FROM e2
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
      s"""$E,
         |e2 AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value
         |       FROM e WHERE user_id < 5)
         |SELECT user_id, event_id,
         |       CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
         |       CAST(CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,4))) OVER w AS DECIMAL(38,4)) AS STRING) AS sum_1h
         |FROM e2
         |WINDOW w AS (PARTITION BY user_id ORDER BY tus
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin),

    QDef.shared(
      "q34_ntile",
      """SELECT CAST(tile AS BIGINT) AS tile, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total
        |FROM (SELECT o_totalprice, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
        |      FROM orders) t
        |GROUP BY tile""".stripMargin),

    // q34's semantics through the distributed ranking path (engine-only —
    // same oracle as q34; Ranking.ntileScalable avoids the single-partition
    // global window that q34's ntile() OVER (ORDER BY ...) implies).
    QDef.df("q34b_ntile_scalable",
      """SELECT CAST(tile AS BIGINT) AS tile, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS total
        |FROM (SELECT o_totalprice, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
        |      FROM orders) t
        |GROUP BY tile""".stripMargin) { (s, dir) =>
      val orders = Tables.table(s, dir, "orders")
      // the aggregate is n=4 rows by construction — materialize inside the
      // managed scope so Ranking's internal cache is released on exit
      graft.engine.Ranking
        .ntileScalable(orders, 4, Seq(col("o_totalprice"), col("o_orderkey"))) { tiled =>
          val agg = tiled.groupBy(col("tile"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("o_totalprice").cast(DecimalType(18, 2)))
                .cast(DecimalType(38, 2)).cast("string").as("total"))
            .select(col("tile"), col("cnt"), col("total"))
          QDef.localized(s, agg)
        }
    },

    QDef.sql(
      "q35_moving_avg",
      """SELECT user_id, event_id,
        |       CAST(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |            AS DECIMAL(38,4)) AS STRING) AS mavg
        |FROM events WHERE user_id < 3""".stripMargin,
      s"""$E
         |SELECT user_id, event_id,
         |       CAST(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |            AS DECIMAL(38,4)) AS STRING) AS mavg
         |FROM e WHERE user_id < 3""".stripMargin),

    QDef.shared(
      "q36_first_last_value",
      """SELECT DISTINCT o_custkey,
        |       first_value(o_orderkey) OVER w AS first_ok,
        |       last_value(o_orderkey) OVER w AS last_ok
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),

    QDef.shared(
      "q36c_nth_value",
      """SELECT DISTINCT o_custkey,
        |       nth_value(o_orderkey, 2) OVER w AS second_ok,
        |       nth_value(o_orderkey, 5) OVER w AS fifth_ok
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),

    // Forward-fill (time-series gap fill): last non-null value per user up
    // to each event — last_value IGNORE NULLS with a running frame.
    QDef.sql(
      "q36b_forward_fill",
      """SELECT user_id, event_id,
        |       CAST(coalesce(
        |         last_value(CAST(value AS DECIMAL(18,4))) IGNORE NULLS OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         CAST(-1 AS DECIMAL(18,4))) AS STRING) AS filled
        |FROM events WHERE user_id < 5""".stripMargin,
      s"""$E
         |SELECT user_id, event_id,
         |       CAST(coalesce(
         |         last_value(CAST(value AS DECIMAL(18,4)) IGNORE NULLS) OVER
         |           (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         CAST(-1 AS DECIMAL(18,4))) AS STRING) AS filled
         |FROM e WHERE user_id < 5""".stripMargin),

    QDef.shared(
      "q37_percent_rank",
      """SELECT o_orderkey,
        |       CAST(CAST(percent_rank() OVER w AS DECIMAL(38,6)) AS STRING) AS pr,
        |       CAST(CAST(cume_dist() OVER w AS DECIMAL(38,6)) AS STRING) AS cd
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin),

    // ------------------------------------------------- sort / limit / top-k
    QDef.shared(
      "q40_global_sort",
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name DESC, n_name ASC""".stripMargin),

    // Z-order data layout: the Morton key interleaves the bits of two
    // dimensions, so every 4096-cell z-tile is a 64×64 square — the output
    // pins per-tile counts AND the tightness of both dims' min/max
    // envelopes (the property that makes parquet row-group stats prunable
    // on EITHER predicate after a z-sorted write). Exact bit arithmetic,
    // identical on both engines.
    QDef.df("q40b_zorder_layout", {
      val terms = (0 until 10).map(j =>
        s"((x >> $j) & 1) * ${1L << (2 * j)} + ((y >> $j) & 1) * ${1L << (2 * j + 1)}")
        .mkString(" + ")
      s"""WITH t AS (SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y FROM lineitem),
         |z AS (SELECT x, y, $terms AS zkey FROM t)
         |SELECT zkey >> 12 AS zbucket, count(*) AS cnt,
         |       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         |       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
         |       (max(x) - min(x) <= 63 AND max(y) - min(y) <= 63) AS tile_tight
         |FROM z GROUP BY 1""".stripMargin
    }) { (s, dir) =>
      import graft.engine.ZOrder
      val t = Tables.table(s, dir, "lineitem")
        .select((col("l_orderkey") % 1024).as("x"), (col("l_partkey") % 1024).as("y"))
      t.withColumn("zkey", ZOrder.interleave2(col("x"), col("y"), 10))
        .groupBy(shiftright(col("zkey"), 12).as("zbucket"))
        .agg(count(lit(1)).as("cnt"),
          min("x").cast("bigint").as("min_x"), max("x").cast("bigint").as("max_x"),
          min("y").cast("bigint").as("min_y"), max("y").cast("bigint").as("max_y"),
          (max(col("x")) - min(col("x")) <= 63 &&
            max(col("y")) - min(col("y")) <= 63).as("tile_tight"))
    },

    QDef.shared(
      "q41_topk",
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),

    QDef.shared(
      "q42_topk_per_group",
      """SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING) AS price
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |             row_number() OVER (PARTITION BY l_orderkey
        |                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |      FROM lineitem WHERE l_orderkey < 100) t
        |WHERE rn <= 3""".stripMargin),

    // The no-window scale path of q42, sharing its oracle verbatim: a
    // bounded-state Aggregator keeps ≤ k entries per group, so partial
    // aggregation caps shuffle volume at O(groups·k) — the window
    // formulation shuffles every row of every group. Prices ride as exact
    // cents so the long-typed aggregator loses nothing.
    QDef.df("q42b_topk_agg",
      """SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING) AS price
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |             row_number() OVER (PARTITION BY l_orderkey
        |                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |      FROM lineitem WHERE l_orderkey < 100) t
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
          col("l_linenumber").cast("long").as("ln"))
      graft.engine.TopKAggregator.topKPerGroup(li, "l_orderkey", col("cents"), col("ln"), 3)
        .select(col("l_orderkey"), col("tie").cast("int").as("l_linenumber"),
          (col("value").cast("decimal(38,4)") / 100).cast("decimal(18,2)")
            .cast("string").as("price"))
    },

    // TPC-H Q3 shape: 3-way join, filtered, grouped, top-10 by revenue
    QDef.sql(
      "q48_tpch_q3",
      """SELECT l_orderkey, CAST(revenue AS STRING) AS revenue, orderdate_us FROM (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
        |         unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_us
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_custkey % 2 = 0
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_orderkey, o_orderdate
        |  ORDER BY revenue DESC, l_orderkey LIMIT 10) t""".stripMargin,
      """SELECT l_orderkey, CAST(revenue AS STRING) AS revenue, orderdate_us FROM (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
        |         epoch_us(o_orderdate) AS orderdate_us
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_custkey % 2 = 0
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_orderkey, o_orderdate
        |  ORDER BY revenue DESC, l_orderkey LIMIT 10) t""".stripMargin),

    // TPC-H Q5 shape: 6-way star join (supplier and customer in the same
    // nation), revenue per region/nation
    QDef.shared(
      "q49_tpch_q5",
      """SELECT r_name, n_name,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS revenue,
        |       count(*) AS cnt
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY r_name, n_name""".stripMargin),

    // TPC-H Q4 shape: correlated EXISTS + date-range scan — orders in one
    // quarter having at least one late-shipping lineitem. The subquery
    // decorrelates to a left-semi join in Catalyst.
    QDef.shared(
      "q48b_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT * FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin),

    // TPC-H Q7 shape: volume shipped between two nations, either direction —
    // double nation join with a symmetric pair predicate, yearly rollup
    QDef.shared(
      "q48c_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS revenue,
        |       count(*) AS cnt
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin),

    // TPC-H Q8 shape: 7-way join + conditional aggregation (market share of
    // one supplier nation within a customer region, per year). Numerator and
    // denominator emitted as exact decimals — decimal division scale rules
    // differ between engines, the ratio is the consumer's one division.
    QDef.shared(
      "q48d_tpch_q8",
      """SELECT o_year,
        |       CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
        |                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS STRING) AS nation_volume,
        |       CAST(CAST(SUM(volume) AS DECIMAL(38,4)) AS STRING) AS total_volume
        |FROM (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
        |         n2.n_name AS nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n1.n_regionkey
        |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year""".stripMargin),

    // TPC-H Q13 shape: outer-join fan-out then distribution of the count —
    // two stacked aggregations, the classic "customers per order-count"
    QDef.shared(
      "q48f_tpch_q13",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin),

    // TPC-H Q22 shape: scalar subquery + NOT EXISTS anti-join. The original
    // compares c_acctbal > avg(...); engines may differ in the last ulp of a
    // double avg (summation order), so the comparison is cross-multiplied
    // into exact decimal arithmetic — same predicate, no division.
    QDef.shared(
      "q48g_tpch_q22",
      """SELECT cntrycode, count(*) AS numcust,
        |       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS totacctbal
        |FROM (
        |  SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
        |        > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer WHERE c_acctbal > 0)
        |    AND NOT EXISTS (SELECT * FROM orders WHERE o_custkey = c_custkey)
        |) custsale
        |GROUP BY cntrycode""".stripMargin),

    // TPC-H Q16 shape: NOT IN (anti-join) + count(DISTINCT) per group.
    // lineitem stands in for partsupp as the part↔supplier association
    // (the driver testdata has no partsupp table).
    QDef.shared(
      "q48e_tpch_q16",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |  AND p_size IN (1, 5, 10, 15, 20, 25)
        |GROUP BY p_brand, p_type, p_size""".stripMargin),

    // TPC-H Q2 shape: min-cost supplier per part in a region, expressed as a
    // correlated scalar-min subquery over the same 3-way join. lineitem is the
    // part↔supplier association (no partsupp table); s_acctbal stands in for
    // ps_supplycost as the minimized measure.
    QDef.shared(
      "q48h_tpch_q2",
      """SELECT acctbal, s_name, n_name, p_partkey FROM (
        |  SELECT DISTINCT CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS STRING) AS acctbal,
        |         s_name, n_name, p_partkey, s_acctbal AS bal
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'LARGE' AND p_size <= 25 AND r_name = 'EUROPE'
        |    AND s_acctbal = (SELECT min(s2.s_acctbal)
        |                     FROM supplier s2
        |                     JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
        |                     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |                     JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |                     WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |  ORDER BY bal DESC, n_name, s_name, p_partkey LIMIT 100) t""".stripMargin),

    // TPC-H Q6 shape: forecasting-revenue change — a pure scan-side filter
    // (date range + discount band + quantity cap) into one global aggregate.
    // The whole predicate should reach the parquet scan as pushed filters.
    QDef.shared(
      "q48i_tpch_q6",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS STRING) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.06
        |  AND l_quantity < 24""".stripMargin),

    // TPC-H Q9 shape: product-type profit by nation and year — 5-way join,
    // profit = revenue minus a cost proxy (p_retailprice * 0.1 * qty; the
    // testdata has no ps_supplycost). Double arithmetic is IEEE-identical on
    // both engines; the decimal cast happens on the same text on both sides.
    QDef.shared(
      "q48j_tpch_q9",
      """SELECT nation, o_year,
        |       CAST(CAST(SUM(amount) AS DECIMAL(38,4)) AS STRING) AS sum_profit,
        |       count(*) AS cnt
        |FROM (
        |  SELECT n_name AS nation,
        |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |           - CAST(p_retailprice * 0.1 * l_quantity AS DECIMAL(18,4)) AS amount
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE p_type LIKE 'PROMO%'
        |) profit
        |GROUP BY nation, o_year""".stripMargin),

    // TPC-H Q10 shape: returned-item revenue loss — top-20 customers by
    // revenue of 'R'-flagged lineitems in one quarter; 4-way join, group,
    // order-by-decimal then top-k (TakeOrderedAndProject, no global sort).
    QDef.shared(
      "q48k_tpch_q10",
      """SELECT c_custkey, c_name, CAST(rev AS STRING) AS revenue,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS acctbal, n_name
        |FROM (
        |  SELECT c_custkey, c_name,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS rev,
        |         c_acctbal, n_name
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_returnflag = 'R'
        |  GROUP BY c_custkey, c_name, c_acctbal, n_name
        |  ORDER BY rev DESC, c_custkey LIMIT 20) t""".stripMargin),

    // TPC-H Q11 shape: important-stock fraction-of-total — per-part value vs
    // a scalar-subquery grand total. Both sides are exact decimal sums; the
    // fraction comparison converts to double (deterministic conversion +
    // identical IEEE multiply on both engines) to dodge cross-engine decimal
    // overflow-rescale rules at precision 38.
    QDef.shared(
      "q48l_tpch_q11",
      """SELECT p_partkey, CAST(val AS STRING) AS value FROM (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS val
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey) t
        |WHERE CAST(val AS DOUBLE) * 500 > (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_3')""".stripMargin),

    // TPC-H Q12 shape: shipping-priority buckets — join + conditional counts
    // per category (l_returnflag stands in for l_shipmode; the testdata has
    // no shipmode column).
    QDef.shared(
      "q48m_tpch_q12",
      """SELECT l_returnflag AS shipmode,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('R', 'A')
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin),

    // TPC-H Q14 shape: promotion-revenue share in one month. Numerator and
    // denominator emitted as separate exact decimals (decimal division scale
    // rules differ between engines; the ratio is the consumer's one division).
    QDef.shared(
      "q48n_tpch_q14",
      """SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS STRING) AS promo_revenue,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS total_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin),

    // TPC-H Q15 shape: top supplier by quarterly revenue — a reused grouped
    // CTE plus a scalar-max subquery over it; exact decimal equality picks
    // the winner(s).
    QDef.shared(
      "q48o_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS STRING) AS total_revenue
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin),

    // TPC-H Q17 shape: small-quantity-order revenue — per-part average
    // quantity threshold, cross-multiplied (qty * 5 * cnt < sum_qty means
    // qty < 0.2 * avg) so no double average is ever compared across engines.
    QDef.shared(
      "q48p_tpch_q17",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS total_price,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS agg_partkey, count(*) AS cnt_qty,
        |             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY l_partkey) agg ON agg_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        |  AND l_quantity * 5 * cnt_qty < sum_qty""".stripMargin),

    // TPC-H Q18 shape: large-volume orders — grouped-HAVING IN-subquery
    // (decorrelates to a semi join on the grouped aggregate), then re-group.
    QDef.shared(
      "q48q_tpch_q18",
      """SELECT c_custkey, o_orderkey, CAST(sum_qty AS STRING) AS sum_qty FROM (
        |  SELECT c_custkey, o_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_qty
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                       GROUP BY l_orderkey
        |                       HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
        |  GROUP BY c_custkey, o_orderkey) t""".stripMargin),

    // TPC-H Q19 shape: disjunctive brand/size/quantity brackets — an OR of
    // conjunctive predicates over a part join; Catalyst extracts the common
    // join key so this stays one hash join, not a union of three.
    QDef.shared(
      "q48r_tpch_q19",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // TPC-H Q20 shape: suppliers with excess shipped quantity of a part
    // class — nested IN subqueries, the inner one a grouped-HAVING aggregate
    // (availqty has no testdata analogue; shipped-quantity plays its role).
    QDef.shared(
      "q48s_tpch_q20",
      """SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1'
        |  AND s_suppkey IN (
        |     SELECT l_suppkey FROM lineitem
        |     WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'STA%')
        |       AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |     GROUP BY l_suppkey
        |     HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200)""".stripMargin),

    // TPC-H Q21 shape: suppliers who kept orders waiting — one EXISTS (another
    // supplier on the same order) and one NOT EXISTS (no OTHER supplier was
    // also late), both correlated self-joins on lineitem; lateness is
    // shipdate > orderdate + 30 days (no commit/receipt dates in testdata).
    QDef.shared(
      "q48t_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND n_name = 'NATION_2'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND EXISTS (SELECT * FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT * FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY s_name""".stripMargin),

    // Per-column profile of the events table (null rates + cardinalities) —
    // the R21-adjacent table-health read, one aggregate pass engine-side
    QDef.df("q67b_null_profile", {
      val cols = Seq("event_type", "props", "user_id", "value")
      val arms = cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM e""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$E\n$arms"
    }) { (s, dir) =>
      graft.inspect.Inspection.nullProfile(
        s.table("events"), Seq("event_type", "props", "user_id", "value"))
    },

    // The q67b profile's 100 TB path: HLL cardinalities per column instead
    // of exact distincts, oracle-checked as an accuracy contract (q21b
    // pattern) — the oracle computes the exact counts, the engine asserts
    // every estimate lands within 3·rsd of them.
    QDef.df("q67c_cardinality_profile", {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS exact_distinct,
           |       true AS within_bound FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    }) { (s, dir) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority")
      val o = Tables.table(s, dir, "orders")
      val prof = graft.inspect.Inspection.cardinalityProfile(o, cols, rsd = 0.05)
      val exactStack = o
        .agg(count_distinct(col(cols.head)).as(s"__e_${cols.head}"),
          cols.tail.map(c => count_distinct(col(c)).as(s"__e_$c")): _*)
        .selectExpr(s"stack(${cols.size}, " +
          cols.map(c => s"'$c', `__e_$c`").mkString(", ") +
          ") AS (column_name, exact_distinct)")
      prof.join(exactStack, "column_name")
        .select(col("column_name"), col("n_rows"),
          col("exact_distinct").cast("bigint").as("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.15).as("within_bound"))
    },

    // Key-skew profile of lineitem's supplier key — the diagnostic read
    // before picking a join strategy (salting / AQE skew split); exact
    // integers only, top-k arm is a TakeOrdered (bounded at any key count).
    QDef.df("q67d_skew_profile",
      """WITH c AS (SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |       CAST(max(cnt) AS BIGINT) AS max_cnt,
        |       (SELECT CAST(sum(cnt) AS BIGINT) FROM
        |          (SELECT cnt FROM c ORDER BY cnt DESC, k LIMIT 10) x) AS top10_mass
        |FROM c""".stripMargin) { (s, dir) =>
      graft.inspect.Inspection.skewProfile(
        Tables.table(s, dir, "lineitem"), col("l_suppkey"), topK = 10)
    },

    // Numeric range/volume profile of lineitem's measure columns — one
    // aggregate pass, a row per column. Sums in exact DECIMAL (a double
    // sum's value depends on partition-order association); min/max are
    // order-free. Per-value half-up vs half-even cast ties cannot occur:
    // no finite double sits exactly on a 1e-4 grid midpoint.
    QDef.df("q67e_numeric_profile", {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  CAST(CAST(min($c) AS DECIMAL(38,4)) AS VARCHAR) AS min_v,
           |  CAST(CAST(max($c) AS DECIMAL(38,4)) AS VARCHAR) AS max_v,
           |  CAST(CAST(SUM(CAST($c AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_v,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    }) { (s, dir) =>
      graft.inspect.Inspection.numericProfile(
        Tables.table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },

    // Snapshot content diff (CDC audit read): synthesize an "after" version
    // of orders with deterministic removals (%13), two change classes (%7
    // status, %11 price — overlapping keys exercise multi-column
    // changed_cols) and additions (%31, shifted keys), then verdict-classify
    // via ONE full-outer key join (SnapshotDiff) and roll up.
    QDef.df("q69_table_diff",
      """WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders),
        |a AS (SELECT o_orderkey,
        |             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
        |             o_orderpriority
        |      FROM b WHERE o_orderkey % 13 <> 0
        |      UNION ALL
        |      SELECT o_orderkey + 100000000, 'N', o_totalprice, o_orderpriority
        |      FROM b WHERE o_orderkey % 31 = 0),
        |j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS k,
        |             b.o_orderkey IS NULL AS is_add, a.o_orderkey IS NULL AS is_rm,
        |             concat_ws(',',
        |               CASE WHEN NOT (b.o_orderpriority IS NOT DISTINCT FROM a.o_orderpriority) THEN 'o_orderpriority' END,
        |               CASE WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus) THEN 'o_orderstatus' END,
        |               CASE WHEN NOT (b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice) THEN 'o_totalprice' END) AS chg
        |      FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
        |SELECT CASE WHEN is_add THEN 'added' WHEN is_rm THEN 'removed'
        |            WHEN chg <> '' THEN 'changed' ELSE 'unchanged' END AS verdict,
        |       CASE WHEN is_add OR is_rm THEN '' ELSE chg END AS changed_cols,
        |       count(*) AS cnt, CAST(sum(k) AS BIGINT) AS key_sum
        |FROM j GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val b = Tables.table(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      val kept = b.filter(col("o_orderkey") % 13 =!= 0).select(
        col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderpriority"))
      val added = b.filter(col("o_orderkey") % 31 === 0).select(
        (col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      graft.cdc.SnapshotDiff.summary(b, kept.unionByName(added), Seq("o_orderkey"))
        .select("verdict", "changed_cols", "cnt", "key_sum")
    },

    // ---------------------------------------------------------- set ops
    QDef.shared(
      "q43_union_all",
      """SELECT count(*) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders UNION ALL SELECT c_custkey FROM customer) t""".stripMargin),

    QDef.shared(
      "q44_union_distinct",
      """SELECT count(*) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer) t""".stripMargin),

    QDef.shared(
      "q45_intersect",
      "SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders"),

    QDef.shared(
      "q46_except",
      "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders"),

    QDef.shared(
      "q47_recursive_cte",
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 10)
        |SELECT CAST(SUM(n) AS BIGINT) AS total, count(*) AS cnt FROM r""".stripMargin),

    // generator: posexplode / LATERAL VIEW (oracle: zipped unnest)
    QDef.sql(
      "q57_posexplode",
      """SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
        |FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        |WHERE doc_id < 5""".stripMargin,
      """SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         unnest(range(0, len(string_split(text, ' ')))) AS pos
        |  FROM documents WHERE doc_id < 5) x""".stripMargin),

    // explode_outer: generator breadth — rows with EMPTY arrays survive
    // with a null element (27 of the 100 docs have no >6-char token at
    // sf0.01), where plain explode would drop them. DuckDB's unnest always
    // drops, so the oracle reconstructs the outer half with a UNION ALL.
    QDef.df("q57b_explode_outer",
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split(text, ' '), t -> length(t) > 6) AS l
        |           FROM documents WHERE doc_id < 100)
        |SELECT doc_id, unnest(l) AS tok FROM d WHERE len(l) > 0
        |UNION ALL
        |SELECT doc_id, NULL AS tok FROM d WHERE len(l) = 0""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "),
            t => length(t) > 6)).as("tok"))
    },

    // pivot (engine: relational pivot operator; oracle: FILTER aggregation)
    QDef.df("q58_pivot",
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'view') AS view,
        |       count(*) FILTER (WHERE event_type = 'click') AS click
        |FROM events WHERE user_id < 10 GROUP BY user_id""".stripMargin) { (s, dir) =>
      Tables.ensure(s, dir)
      s.table("events").filter(col("user_id") < 10)
        .groupBy("user_id")
        .pivot("event_type", Seq("error", "signup", "purchase", "view", "click"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("error", "signup", "purchase", "view", "click"))
    },

    // unpivot via stack (oracle: UNION ALL)
    QDef.sql(
      "q59_unpivot",
      """SELECT s_suppkey AS id, t.metric, CAST(CAST(t.val AS DECIMAL(18,4)) AS STRING) AS val
        |FROM supplier
        |LATERAL VIEW stack(2, 'acctbal', s_acctbal,
        |                      'suppkey', CAST(s_suppkey AS DOUBLE)) t AS metric, val""".stripMargin,
      """SELECT s_suppkey AS id, 'acctbal' AS metric, CAST(CAST(s_acctbal AS DECIMAL(18,4)) AS STRING) AS val
        |FROM supplier
        |UNION ALL
        |SELECT s_suppkey, 'suppkey', CAST(CAST(CAST(s_suppkey AS DOUBLE) AS DECIMAL(18,4)) AS STRING)
        |FROM supplier""".stripMargin),

    // ----------------------------------------------------- scalar functions
    QDef.shared(
      "q50_string_suite",
      """SELECT p_partkey,
        |       upper(p_brand) AS ub, lower(p_type) AS lt,
        |       substring(p_name, 1, 5) AS sub5,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       trim(p_name) AS trimmed,
        |       replace(p_type, ' ', '_') AS repl,
        |       lpad(CAST(p_partkey AS STRING), 8, '0') AS pad,
        |       p_brand || '.' || p_type AS cat
        |FROM part""".stripMargin),

    // split_part + levenshtein: the tokenize-by-delimiter and edit-distance
    // primitives (both engines implement unit-cost Levenshtein identically;
    // the distance to the type string is a deterministic integer).
    QDef.shared(
      "q50b_fuzzy_strings",
      """SELECT p_partkey,
        |       split_part(p_type, ' ', 1) AS type_head,
        |       split_part(p_type, ' ', 3) AS type_tail,
        |       CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_name_type,
        |       CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev_brand
        |FROM part WHERE p_partkey < 500""".stripMargin),

    // R3's calculated-field expression (README.md:29-32) must round-trip;
    // '[0-9]' avoids backslash-escape dialect differences.
    QDef.shared(
      "q51_regexp",
      """SELECT CAST(SUM(CASE WHEN regexp_replace(event_type || '_part_' || CAST(user_id % 5 AS STRING),
        |                                         '_part_[0-9]+$', '') = event_type
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS roundtrip_ok,
        |       count(*) AS cnt
        |FROM events""".stripMargin),

    QDef.shared(
      "q51b_regexp_extract",
      """SELECT regexp_extract(p_name, '^[a-z]+', 0) AS prefix, count(*) AS cnt
        |FROM part GROUP BY 1""".stripMargin),

    QDef.sql(
      "q52_date_suite",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |       count(*) AS cnt,
        |       unix_micros(CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP)) AS min_month_us,
        |       unix_micros(CAST(max(o_orderdate + INTERVAL 90 DAY) AS TIMESTAMP)) AS max_plus90_us,
        |       CAST(min(EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS min_month,
        |       CAST(max(EXTRACT(DAY FROM o_orderdate)) AS BIGINT) AS max_day
        |FROM orders GROUP BY 1""".stripMargin,
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |       count(*) AS cnt,
        |       epoch_us(min(date_trunc('month', o_orderdate))) AS min_month_us,
        |       epoch_us(max(o_orderdate + INTERVAL 90 DAY)) AS max_plus90_us,
        |       CAST(min(EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS min_month,
        |       CAST(max(EXTRACT(DAY FROM o_orderdate)) AS BIGINT) AS max_day
        |FROM orders GROUP BY 1""".stripMargin),

    QDef.shared(
      "q53_math_suite",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(18,6)) AS STRING) AS abs_disc,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING) AS price2,
        |       CAST(floor(l_quantity) AS BIGINT) AS fl,
        |       CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |       CAST(CAST(power(l_discount, 2) AS DECIMAL(18,6)) AS STRING) AS pow2,
        |       l_partkey % 7 AS mod7,
        |       CAST(CAST(sqrt(l_quantity) AS DECIMAL(18,6)) AS STRING) AS sq
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin),

    // bitwise suite: &, |, xor, shifts, popcount — the hash/bucket/bitmap
    // primitives (DuckDB spells xor/shifts differently, so dialect texts
    // differ while the arithmetic is identical).
    QDef.sql(
      "q53b_bitwise",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_partkey & l_suppkey AS BIGINT) AS band,
        |       CAST(l_partkey | l_suppkey AS BIGINT) AS bor,
        |       CAST(l_partkey ^ l_suppkey AS BIGINT) AS bxor,
        |       CAST(shiftleft(l_linenumber, 3) AS BIGINT) AS shl,
        |       CAST(shiftright(l_partkey, 2) AS BIGINT) AS shr,
        |       CAST(bit_count(l_partkey) AS BIGINT) AS bcnt
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin,
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_partkey & l_suppkey AS BIGINT) AS band,
        |       CAST(l_partkey | l_suppkey AS BIGINT) AS bor,
        |       CAST(xor(l_partkey, l_suppkey) AS BIGINT) AS bxor,
        |       CAST(l_linenumber << 3 AS BIGINT) AS shl,
        |       CAST(l_partkey >> 2 AS BIGINT) AS shr,
        |       CAST(bit_count(l_partkey) AS BIGINT) AS bcnt
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin),

    QDef.sql(
      "q54_array_ops",
      """SELECT label, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(element_at(embedding, 1) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_e1,
        |       CAST(min(size(embedding)) AS BIGINT) AS min_dim,
        |       CAST(max(size(embedding)) AS BIGINT) AS max_dim
        |FROM embeddings GROUP BY label""".stripMargin,
      """SELECT label, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(embedding[1] AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_e1,
        |       CAST(min(len(embedding)) AS BIGINT) AS min_dim,
        |       CAST(max(len(embedding)) AS BIGINT) AS max_dim
        |FROM embeddings GROUP BY label""".stripMargin),

    // Per-label centroid accumulators: element-wise sums + counts over the
    // 64-dim embeddings (the k-means/class-prototype building block; the
    // caller's one division yields the mean). posexplode + groupBy(label,
    // idx) — partial aggregation combines map-side, shuffle carries
    // labels × dims rows, never the corpus. Elements quantize to 1e-4
    // fixed-point via floor (round-free: decimal CASTs of raw floats split
    // on half-up vs half-even at expansion boundaries; floor of an
    // IEEE-identical double multiply cannot), so the sums are exact BIGINTs.
    QDef.df("q54c_label_centroids",
      """SELECT label, CAST(idx AS BIGINT) AS idx, count(*) AS cnt,
        |       CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS sum_x4
        |FROM (SELECT label, unnest(embedding) AS x,
        |             generate_subscripts(embedding, 1) AS idx
        |      FROM embeddings) t
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), (col("pos") + 1).cast("bigint").as("idx"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("x").cast("double") * 10000).cast("long")).as("sum_x4"))
    },

    QDef.sql(
      "q54b_array_advanced",
      """SELECT vec_id,
        |       CAST(size(slice(embedding, 1, 8)) AS BIGINT) AS slice_len,
        |       CAST(CAST(element_at(reverse(embedding), 1) AS DECIMAL(18,4)) AS STRING) AS last_elem,
        |       CAST(size(array_distinct(transform(embedding, x -> CAST(x > 0 AS INT)))) AS BIGINT) AS sign_kinds
        |FROM embeddings""".stripMargin,
      """SELECT vec_id,
        |       CAST(len(embedding[1:8]) AS BIGINT) AS slice_len,
        |       CAST(CAST(list_reverse(embedding)[1] AS DECIMAL(18,4)) AS STRING) AS last_elem,
        |       CAST(len(list_distinct(list_transform(embedding, x -> CAST(x > 0 AS INTEGER)))) AS BIGINT) AS sign_kinds
        |FROM embeddings""".stripMargin),

    QDef.sql(
      "q55_json",
      """SELECT event_type,
        |       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin,
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin),

    // Semi-structured schema profile: which keys the JSON payload column
    // carries, how often, how many values parse as integers (pure-regex
    // type probe — no dialect-dependent typeof), and the distinct-value
    // cardinality. Engine decodes the flat object via from_json to a
    // string map; the oracle walks json_keys with a dynamic extract path.
    QDef.df("q55b_json_profile",
      """WITH k AS (SELECT unnest(json_keys(props)) AS key, props FROM events)
        |SELECT key, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN regexp_matches(
        |              json_extract_string(props, '$.' || key), '^-?[0-9]+$')
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
        |       CAST(count(DISTINCT json_extract_string(props, '$.' || key))
        |            AS BIGINT) AS n_distinct
        |FROM k GROUP BY 1""".stripMargin) { (s, _) =>
      graft.inspect.Inspection.jsonProfile(s.table("events"), col("props"))
    },

    // Deeply nested VariantType (round 10): q55b profiles a FLAT object;
    // real CDC payloads nest. Each event deterministically builds a 3-level
    // document — object → array of structs → object — which the engine
    // parses to Spark-4 VARIANT (parse_json, the DbVariant read path) and
    // extracts through variant_get paths including array indexing
    // ('$.order.items[0].qty') and a nested boolean flag. The oracle builds
    // the identical JSON string and walks it with json_extract — so a
    // malformed construction, a path-resolution bug, or a variant type
    // coercion on either side hash-mismatches.
    QDef.sql(
      "q55c_variant_nested",
      """WITH b AS (SELECT event_id, user_id, event_type,
        |                  coalesce(CAST(get_json_object(props, '$.k') AS BIGINT), 0) AS k
        |           FROM events),
        |d AS (SELECT parse_json(format_string(
        |        '{"order":{"id":%d,"items":[{"sku":"s%d","qty":%d},{"sku":"s%d","qty":%d}],"meta":{"flags":{"vip":%s},"src":"%s"}}}',
        |        event_id, pmod(k, 10), pmod(k, 5), pmod(user_id, 7), pmod(user_id, 3),
        |        CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END, event_type)) AS v
        |      FROM b)
        |SELECT variant_get(v, '$.order.meta.src', 'string') AS src,
        |       CAST(SUM(variant_get(v, '$.order.id', 'bigint')) AS BIGINT) AS sum_id,
        |       CAST(SUM(variant_get(v, '$.order.items[0].qty', 'bigint')) AS BIGINT) AS sum_qty0,
        |       CAST(SUM(CASE WHEN variant_get(v, '$.order.meta.flags.vip', 'boolean')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_vip,
        |       CAST(count(DISTINCT variant_get(v, '$.order.items[1].sku', 'string'))
        |            AS BIGINT) AS sku1_kinds
        |FROM d GROUP BY 1""".stripMargin,
      """WITH b AS (SELECT event_id, user_id, event_type,
        |                  coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
        |           FROM events),
        |d AS (SELECT printf(
        |        '{"order":{"id":%d,"items":[{"sku":"s%d","qty":%d},{"sku":"s%d","qty":%d}],"meta":{"flags":{"vip":%s},"src":"%s"}}}',
        |        event_id, k % 10, k % 5, user_id % 7, user_id % 3,
        |        CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END, event_type) AS j
        |      FROM b)
        |SELECT json_extract_string(j, '$.order.meta.src') AS src,
        |       CAST(SUM(CAST(json_extract(j, '$.order.id') AS BIGINT)) AS BIGINT) AS sum_id,
        |       CAST(SUM(CAST(json_extract(j, '$.order.items[0].qty') AS BIGINT)) AS BIGINT) AS sum_qty0,
        |       CAST(SUM(CASE WHEN CAST(json_extract(j, '$.order.meta.flags.vip') AS BOOLEAN)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_vip,
        |       CAST(count(DISTINCT json_extract_string(j, '$.order.items[1].sku'))
        |            AS BIGINT) AS sku1_kinds
        |FROM d GROUP BY 1""".stripMargin),

    QDef.sql(
      "q56b_map_functions",
      """SELECT event_type,
        |       to_json(map_keys(map('t', event_type, 'u', CAST(user_id AS STRING)))) AS mkeys,
        |       element_at(map_values(map('t', event_type, 'u', CAST(user_id AS STRING))), 1) AS first_val,
        |       count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
      """SELECT event_type,
        |       to_json(map_keys(MAP {'t': event_type, 'u': CAST(user_id AS STRING)})) AS mkeys,
        |       map_values(MAP {'t': event_type, 'u': CAST(user_id AS STRING)})[1] AS first_val,
        |       count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    QDef.sql(
      "q56_map_ops",
      """SELECT CAST(element_at(map('error', 0, 'signup', 1, 'purchase', 2, 'view', 3, 'click', 4),
        |                       event_type) AS BIGINT) AS code,
        |       count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
      """SELECT CAST(CASE event_type WHEN 'error' THEN 0 WHEN 'signup' THEN 1
        |                            WHEN 'purchase' THEN 2 WHEN 'view' THEN 3
        |                            WHEN 'click' THEN 4 END AS BIGINT) AS code,
        |       count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin)
  )
}
