package graft

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR, prints
  * one JSON line {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  * JVM is warmed with one throwaway Q01 run (BASELINE.md protocol); each
  * query is then timed wall-clock once, drained via count() so the full plan
  * executes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // warm-up: session init + codegen + parquet footer cache
    try qs.get("q01_count").foreach(_(spark, sfDir).count()) catch { case _: Throwable => }

    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: f"%.3f" under a comma-decimal default locale would emit
    // invalid JSON
    def num(fmt: String, v: Double): String = String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + num("%.3f", v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val eps = cdcThroughput(spark)
    println(s"""{"metric":"total","value":${num("%.3f", total)},"unit":"sec","queries":$qjson,"cdc_events_per_sec":${num("%.0f", eps)},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** BASELINE.md protocol: CDC upsert throughput over a ≥1M-event generated
    * stream (seeded, generation excluded) — full Q61 path: JSONL file read →
    * parse → per-table filter → flatten → typed cast → last-write-wins →
    * parquet sink merge. One warm-up run (codegen), then one timed run.
    */
  private def cdcThroughput(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.cdc.CdcPipeline
    import graft.model.{ColSpec, TableSpec}
    import graft.sink.LocalParquetSink
    val n = 1000000L
    val keys = 200000L
    try {
      val js = format_string(
        """{"seq":%d,"data":{"database_name":"shop","table_name":"orders_part_%d","primary_key":"%d","metadata":{"is_delete":false},"row":{"id":"%d","amount":"%d.50","qty":"%d"}}}""",
        col("id"), pmod(col("id"), lit(5)), pmod(col("id"), lit(keys)),
        pmod(col("id"), lit(keys)), pmod(col("id"), lit(1000)), pmod(col("id"), lit(20)))
      val envSchema = StructType(Seq(
        StructField("seq", LongType),
        StructField("data", StructType(Seq(
          StructField("database_name", StringType),
          StructField("table_name", StringType),
          StructField("primary_key", StringType),
          StructField("metadata", StructType(Seq(StructField("is_delete", BooleanType)))),
          StructField("row", StructType(Seq(
            StructField("id", StringType),
            StructField("amount", StringType),
            StructField("qty", StringType)))))))))
      val spec = TableSpec("shop.orders", Seq(
        ColSpec("id", "int", isPrimaryKey = true),
        ColSpec("amount", "decimal", isPrimaryKey = false),
        ColSpec("qty", "smallint", isPrimaryKey = false)))
      // fixed, wiped base dir — fresh temp dirs would accumulate ~1M-row
      // copies across bench runs
      val base = sys.props("java.io.tmpdir") + "/graft_cdc_bench"
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(new java.io.File(base))
      val jsonDir = s"$base/events"
      spark.range(n).select(js.as("value")).write.text(jsonDir) // untimed generation

      def run(sinkDir: String): Unit = {
        val env = spark.read.schema(envSchema).json(jsonDir)
        val flat = CdcPipeline.expanded(CdcPipeline.forTable(env, "shop.orders"))
        new LocalParquetSink(sinkDir)
          .merge(CdcPipeline.typed(flat, spec), Seq("primary_key"), "seq", "is_delete")
      }
      run(s"$base/warm") // codegen warm-up
      val t0 = System.nanoTime()
      run(s"$base/timed")
      n / ((System.nanoTime() - t0) / 1e9)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] cdc throughput failed: $e")
      -1.0
    }
  }
}
