package graft.sink

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned MERGE emulation over plain parquet — the scalable
  * twin of [[LocalParquetSink]] (which rewrites the whole table per merge,
  * O(table)). Rows hash-partition by their merge key into `nBuckets`
  * directories (`__bucket=<b>/`); a merge reads and rewrites ONLY the
  * buckets its batch touches, so merge cost is O(affected fraction of the
  * table) — the same data layout a cluster deployment gets from
  * `partitionBy` on a key hash, where partition pruning turns key lookups
  * into file-level skips.
  *
  * Correctness notes:
  *   - last-write-wins dedup and the `__gen` tie-break are per-key, and a
  *     key lives in exactly one bucket, so per-bucket generation counters
  *     are equivalent to the global one;
  *   - deleted keys are retained as tombstones exactly like
  *     [[LocalParquetSink]] (idempotent replay, out-of-order safety);
  *   - bucket rewrites go through Spark's dynamic partition overwrite —
  *     untouched buckets are never opened, let alone rewritten;
  *   - schema evolution: only rewritten buckets carry new columns; reads
  *     use `mergeSchema` so older buckets surface them as null.
  */
final class PartitionedParquetSink(dir: String, nBuckets: Int = 16) extends UpsertSink {

  private def bucketOf(keys: Seq[String]) =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")

  override def merge(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    val spark = batch.sparkSession
    val incoming0 = batch
      .withColumn("__is_deleted", coalesce(col(isDeleteCol), lit(false)))
      .withColumn("__bucket", bucketOf(keys))
    // ≤ nBuckets values by construction — the driver-side list is what lets
    // the read below prune to affected buckets only
    val affected = incoming0.select("__bucket").distinct().collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) return
    val existingDirs = affected.map(b => s"$dir/__bucket=$b")
      .filter(p => Files.exists(Paths.get(p)))
    val (current, gen) =
      if (existingDirs.nonEmpty) {
        val c = spark.read.option("mergeSchema", "true").option("basePath", dir)
          .parquet(existingDirs.toIndexedSeq: _*)
        val maxGen = Option(c.agg(max(col("__gen"))).collect().head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(-1L)
        (Some(c), maxGen + 1L)
      } else (None, 0L)
    val incoming = incoming0.withColumn("__gen", lit(gen))
    val all = current match {
      case Some(c) => c.unionByName(incoming, allowMissingColumns = true)
      case None    => incoming
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__gen").desc)
    val merged = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // one output file per bucket: without this, every bucket directory gets
    // a file per shuffle partition and the layout degenerates into
    // nBuckets × partitions small files, swamping the pruning win
    merged.repartition(affected.length, col("__bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(dir)
  }

  override def read(spark: SparkSession, mode: DeleteMode): DataFrame = {
    val t = spark.read.option("mergeSchema", "true").parquet(dir).drop("__gen", "__bucket")
    mode match {
      case DeleteMode.Hard    => t.filter(!col("__is_deleted")).drop("__is_deleted")
      case DeleteMode.Logical => t.withColumnRenamed("__is_deleted", "is_deleted")
    }
  }
}
