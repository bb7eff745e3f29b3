package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Forward-drift guards for fixture dtype regenerations (the events.ts
  * counterpart lives in TablesDtypeSpec): the driver regenerates
  * /root/testdata between rounds and has already moved temporal columns
  * across three physical types. Each test rebuilds the fixture dir with the
  * NEAREST-PLAUSIBLE alternate dtype for one column family and runs a
  * representative query per touching family — so the next regeneration
  * breaks one targeted test here instead of a third of the suite:
  *  - o_orderdate/l_shipdate → DATE (timestamp[ms]→[us] already happened)
  *  - embeddings → list<double> (and the element type is asserted, not
  *    assumed — array element drift is the realistic failure)
  *  - TPC-H money columns → DECIMAL(15,2) (the canonical TPC-H type; the
  *    generator currently ships double)
  */
class TemporalDriftSpec extends SparkSpec {
  import spark.implicits._

  /** A miniature sf dir copied from the real sf0.001 fixtures with a
    * per-table rewrite applied — queries touch many real columns, so
    * synthesizing from scratch would drift from the true fixture shape.
    */
  private def driftDir(tag: String)(rewrite: (String, DataFrame) => DataFrame): String = {
    val dir = tmpDir(tag)
    val src = "/root/testdata/sf0.001"
    for (n <- graft.engine.Tables.names :+ "events") {
      val df = spark.read.parquet(s"$src/$n.parquet")
      rewrite(n, df).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  private lazy val dateDir: String = driftDir("temporal_drift") {
    case ("orders", df)   => df.withColumn("o_orderdate", col("o_orderdate").cast("date"))
    case ("lineitem", df) => df.withColumn("l_shipdate", col("l_shipdate").cast("date"))
    case (_, df)          => df
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
    val dir = driftDir("embedding_drift") {
      case ("embeddings", df) =>
        df.withColumn("embedding", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      case (_, df) => df
    }
    assert(spark.read.parquet(s"$dir/embeddings.parquet").schema("embedding")
      .dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.DoubleType)
    for (name <- Seq("q82_cosine_all", "q89d_kmeans"))
      assert(Registry.byName(name).build(spark, dir).collect().nonEmpty,
        s"$name returned no rows on the double-typed embeddings")
  }

  test("money queries survive double → DECIMAL(15,2) drift on TPC-H amounts") {
    // DECIMAL(15,2) is what canonical TPC-H ships; the generator currently
    // writes double. Aggregations, join filters, sorts and TPC-H pricing
    // arithmetic must keep analyzing (decimal arithmetic widens precision
    // rather than erroring) and returning rows
    val money = Map(
      "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      "orders"   -> Seq("o_totalprice"),
      "part"     -> Seq("p_retailprice"),
      "supplier" -> Seq("s_acctbal"),
      "customer" -> Seq("c_acctbal"))
    val dir = driftDir("money_drift") { (n, df) =>
      money.getOrElse(n, Nil).foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d.withColumn(c, col(c).cast("decimal(15,2)")) else d
      }
    }
    assert(spark.read.parquet(s"$dir/lineitem.parquet").schema("l_extendedprice")
      .dataType == org.apache.spark.sql.types.DecimalType(15, 2))
    // representatives: TPC-H Q1 pricing aggregate, an orders⋈lineitem join,
    // TPC-H Q3 (join + money arithmetic + date), a money-keyed global sort
    for (name <- Seq("q20_tpch_q1", "q10_inner_join", "q48_tpch_q3", "q40_global_sort"))
      assert(Registry.byName(name).build(spark, dir).collect().nonEmpty,
        s"$name returned no rows on the DECIMAL-typed money columns")
  }
}
