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
    val qjson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
