package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Forward-drift guard for the OTHER temporal columns (the events.ts
  * counterpart lives in TablesDtypeSpec): the driver has already moved
  * `o_orderdate`/`l_shipdate` from timestamp[ms] to timestamp[us] between
  * rounds; the remaining plausible regeneration is DATE. The date-touching
  * query families must keep analyzing and executing against a DATE-typed
  * fixture dir — every engine-side use is either type-agnostic (ORDER BY,
  * year(), min/max_by) or explicitly `CAST(... AS TIMESTAMP)`, and this
  * spec keeps it that way.
  */
class TemporalDriftSpec extends SparkSpec {
  import spark.implicits._

  /** A miniature sf dir whose orders/lineitem carry DATE temporal columns;
    * other tables are minimal but schema-complete for the chosen queries.
    */
  private lazy val dateDir: String = {
    val dir = tmpDir("temporal_drift")
    val src = "/root/testdata/sf0.001"
    // copy the real schemas, rewriting only the temporal columns to DATE —
    // queries touch many real columns, so synthesizing from scratch would
    // drift from the true fixture shape
    for (n <- graft.engine.Tables.names) {
      val df = spark.read.parquet(s"$src/$n.parquet")
      val out = n match {
        case "orders"   => df.withColumn("o_orderdate", col("o_orderdate").cast("date"))
        case "lineitem" => df.withColumn("l_shipdate", col("l_shipdate").cast("date"))
        case _          => df
      }
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    spark.read.parquet(s"$src/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // one representative per date-touching family: TPC-H date predicates +
  // group/order (q48), the date-function suite (q52), lag/lead over a
  // date ordering (q32), first/last value by date (q36)
  private val representatives = Seq(
    "q48_tpch_q3", "q52_date_suite", "q32_lag_lead", "q36_first_last_value")

  for (name <- representatives)
    test(s"$name analyzes and executes when o_orderdate/l_shipdate are DATE") {
      val q = Registry.byName(name)
      val rows = q.build(spark, dateDir).collect()
      assert(rows.nonEmpty, s"$name returned no rows on the DATE-typed fixture")
    }

  test("embedding queries survive list<float> → list<double> drift") {
    // the ANN stack casts per-element (quantize/asDouble/cosine_sim all
    // accept float|double) — pin that a regeneration to double analyzes
    // and executes for a similarity and a k-means representative
    val dir = tmpDir("embedding_drift")
    val src = "/root/testdata/sf0.001"
    for (n <- graft.engine.Tables.names) {
      val df = spark.read.parquet(s"$src/$n.parquet")
      val out =
        if (n == "embeddings")
          df.withColumn("embedding", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        else df
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    spark.read.parquet(s"$src/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").schema("embedding")
      .dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.DoubleType)
    for (name <- Seq("q82_cosine_all", "q89d_kmeans"))
      assert(Registry.byName(name).build(spark, dir).collect().nonEmpty,
        s"$name returned no rows on the double-typed embeddings")
  }
}
