package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.engine.Tables

/** Environment-drift guard for the canonical `events` view: the driver has
  * regenerated `/root/testdata` across rounds with `ts` as timestamp[ns]
  * (surfaced as BIGINT under `nanosAsLong`) and as timestamp[us] (surfaced
  * as TIMESTAMP_NTZ). `Tables.ensure` must bind to the OBSERVED dtype and
  * produce the same canonical instant for every representation — so the
  * next regeneration breaks this one targeted test, not the whole suite.
  * Deleting either dtype branch in `Tables.ensure` fails the matching case.
  */
class TablesDtypeSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-05T06:07:08.123456Z
  private val micros = 1704434828123456L

  /** Minimal sf dir: every table Tables.ensure registers, 1 row each; the
    * events file's ts representation is injected per-case.
    */
  private def writeDir(tsCase: String): String = {
    val dir = tmpDir(s"tables_dtype_$tsCase")
    Tables.names.foreach { n =>
      Seq(1L).toDF("x").write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val base = Seq((1L, 2L, "view", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val withTs = tsCase match {
      // timestamp[ns] read under nanosAsLong: physically a plain int64
      case "long_nanos" => base.withColumn("ts", lit(micros * 1000L))
      // timestamp[us] isAdjustedToUTC=0: Spark writes/reads TIMESTAMP_NTZ
      case "ntz" => base.withColumn("ts",
        lit("2024-01-05 06:07:08.123456").cast("timestamp_ntz"))
      // timestamp[us] isAdjustedToUTC=1: plain TIMESTAMP (session TZ is UTC)
      case "ltz" => base.withColumn("ts",
        lit("2024-01-05 06:07:08.123456").cast("timestamp"))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def canonical(tsCase: String): (org.apache.spark.sql.types.DataType, Long) = {
    Tables.ensure(spark, writeDir(tsCase))
    val events = spark.table("events")
    val row = events.select(col("ts"), unix_micros(col("ts"))).head()
    (events.schema("ts").dataType, row.getLong(1))
  }

  for (c <- Seq("long_nanos", "ntz", "ltz"))
    test(s"canonical events view binds to the observed ts dtype: $c") {
      val (dt, us) = canonical(c)
      assert(dt == TimestampType, s"view must normalize $c to TIMESTAMP")
      assert(us == micros, s"wrong instant for $c: $us != $micros")
    }
}
