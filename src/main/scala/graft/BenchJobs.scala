package graft

/** Per-query JOB-LEVEL profile (optimization round instrumentation): runs
  * the named queries once warm, then once measured with a SparkListener
  * recording every job's description, duration and stage/task counts —
  * the "where do a lifecycle query's seconds go" view the wall-clock bench
  * cannot give. stderr-only, no artifact: this is an iteration aid, the
  * committed evidence stays `graft.Bench`.
  *
  * Usage: BenchJobs <sfDir> <queryName...>   (env SPARK_GRAFT_CPUS honored)
  */
object BenchJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass at least one query name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        (!sys.env.get("SPARK_GRAFT_AQE").contains("0")).toString)
    // ad-hoc conf probes: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
      ()
    })
    val spark = builder
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, desc: String, ms: Long, stages: Int, tasks: Int)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[J]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(s.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(s.jobId, (System.nanoTime(), desc, s.stageInfos.size,
          s.stageInfos.map(_.numTasks).sum))
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, d, st, tk) =>
          jobs.add(J(e.jobId, d, (System.nanoTime() - t0) / 1000000L, st, tk))
          ()
        }
      }
    }

    // warm-up: session init + codegen (mirrors Bench's protocol)
    try SparkEntry.queries.get("q01_count").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      fn(spark, sfDir).count() // warm run (codegen, model/store builds)
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.toArray(Array.empty[J]).sortBy(_.id)
      System.err.println(f"===== $name%s wall=${wall}%.3f s jobs=${js.length}%d jobTime=${js.map(_.ms).sum / 1000.0}%.3f s =====")
      js.foreach { j =>
        System.err.println(f"  job ${j.id}%4d ${j.ms}%6d ms stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}%s")
      }
    }
    spark.stop()
  }
}
