package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + canonical table registration for the engine.
  *
  * Design notes (100 TB scale): every conf here is a per-session default a
  * cluster deployment would also want — AQE for runtime re-planning and skew
  * joins, broadcast threshold for dimension tables, UTC for deterministic
  * temporal semantics. `local[32]` is the test harness topology only; nothing
  * in the engine assumes single-JVM execution.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS), unreadable by Spark 4.1.2
      // without this flag (SURVEY §7.4); the canonical `events` view converts
      // the resulting long to a microsecond timestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply engine confs to an externally-created session (Verify/Bench own
    * their builders; tests may pass any session). Runtime-settable confs only.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    graft.functions.GraftFunctions.register(spark)
  }
}

/** Registers the driver-provided parquet tables as temp views, with the
  * normative canonical `events` view (FIXTURES.md §1): raw nanosecond longs →
  * `timestamp_micros(ts DIV 1000)`. Registration is cached per (session, dir)
  * so the ~60 t2 queries don't re-read parquet footers.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  @volatile private var last: Option[(SparkSession, String)] = None

  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    if (!last.contains((spark, dir))) {
      GraftSession.configure(spark)
      names.foreach { n =>
        spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
      }
      spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events_raw")
      spark
        .sql(
          """SELECT event_id, timestamp_micros(ts DIV 1000) AS ts, user_id,
            |       event_type, value, props
            |FROM events_raw""".stripMargin)
        .createOrReplaceTempView("events")
      last = Some((spark, dir))
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensure(spark, dir)
    spark.table(name)
  }
}
