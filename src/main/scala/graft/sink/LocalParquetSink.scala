package graft.sink

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local-filesystem MERGE emulation over plain parquet (SURVEY §7.4): read
  * current state, union-by-name with the batch (schema evolution ⇒ new
  * columns null-backfilled), window-dedup by (keys, seq), atomic directory
  * swap.
  *
  * Deleted keys are RETAINED internally as tombstones (`__is_deleted`) so
  * merges stay idempotent and out-of-order-safe: a stale pre-delete event
  * replayed later cannot resurrect a deleted row, because the tombstone
  * still wins by `seq`. `read(Hard)` filters tombstones out; `read(Logical)`
  * exposes them as `is_deleted`.
  *
  * Scale: this impl rewrites the whole table per merge — correct but
  * O(table). [[PartitionedParquetSink]] is the scalable local twin
  * (hash-bucketed layout, rewrites only affected buckets); the 100 TB path
  * is a real warehouse MERGE (Snowflake COPY+MERGE via staged files, Delta
  * MERGE) with identical semantics; see SnowflakeSqlGen.
  */
final class LocalParquetSink(dir: String) extends UpsertSink {

  private def path: Path = Paths.get(dir)
  private def exists: Boolean = Files.exists(path) && new File(dir).list() != null &&
    new File(dir).list().exists(_.endsWith(".parquet"))

  /** Crash recovery for the two-move swap: a crash between moving dir→.old
    * and tmp→dir leaves the table only under .old — restore it, otherwise
    * the next merge would silently rebuild state from its batch alone. A
    * crash after the second move but before cleanup leaves a stale .old
    * alongside the live dir — drop it (it's the superseded generation, and
    * it would make the next swap's ATOMIC_MOVE fail).
    */
  private def recover(): Unit = {
    val old = Paths.get(dir + ".old")
    if (Files.exists(old)) {
      if (!Files.exists(path)) Files.move(old, path, StandardCopyOption.ATOMIC_MOVE)
      else deleteRecursively(new File(dir + ".old"))
    }
    ()
  }

  override def merge(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    recover()
    val spark = batch.sparkSession
    // __gen = merge generation: on a (key, seq) tie — e.g. a schema-evolution
    // backfill replaying an already-stored event with MORE columns — the
    // newer merge wins deterministically instead of the window picking an
    // arbitrary survivor.
    val (current, gen) =
      if (exists) {
        val c = spark.read.parquet(dir)
        // max over an empty table (schema-only parquet from an all-filtered
        // micro-batch) is null — start generations at 0 in that case
        val maxGen = Option(c.agg(max(col("__gen"))).collect().head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(-1L)
        (Some(c), maxGen + 1L)
      } else (None, 0L)
    val incoming = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__gen", lit(gen))
    val all = current match {
      case Some(c) => c.unionByName(incoming, allowMissingColumns = true)
      case None    => incoming
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__gen").desc)
    val merged = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val tmp = dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val old = dir + ".old"
    if (Files.exists(path)) {
      Files.move(path, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(new File(old))
    } else {
      Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def replaceAll(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    recover()
    val spark = batch.sparkSession
    // continue the generation counter (replayed micro-batches after the
    // replace must still order deterministically), but do NOT union with
    // the stored rows — prior state, including its TYPES, is superseded
    val gen =
      if (exists) {
        Option(spark.read.parquet(dir).agg(max(col("__gen"))).collect().head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(-1L) + 1L
      } else 0L
    val incoming = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__gen", lit(gen))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__gen").desc)
    val merged = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val tmp = dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val old = dir + ".old"
    if (Files.exists(path)) {
      Files.move(path, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(new File(old))
    } else {
      Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def read(spark: SparkSession, mode: DeleteMode): DataFrame = {
    synchronized(recover())
    val t = spark.read.parquet(dir).drop("__gen")
    mode match {
      case DeleteMode.Hard    => t.filter(!col("__is_deleted")).drop("__is_deleted")
      case DeleteMode.Logical => // 'is_deleted' reserved by Logical mode
        t.drop("is_deleted").withColumnRenamed("__is_deleted", "is_deleted")
    }
  }

  private def deleteRecursively(f: File): Unit = { graft.engine.Fs.deleteTree(f); () }
}
