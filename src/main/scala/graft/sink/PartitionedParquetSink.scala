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

  private def backupRoot = Paths.get(dir + ".backup")

  /** Present exactly while a [[replaceAll]] commit is in flight. Without
    * it, a crash after the truncate-and-load's static overwrite but before
    * the backup cleanup would let the next implicit [[recover]] silently
    * restore every backed-up bucket missing from the REBUILT layout —
    * resurrecting rows (and column types) the replace intentionally
    * superseded. With it, [[recover]] refuses to touch a crashed replace:
    * the only valid repair is re-running the replace itself.
    */
  private def replaceMarker = Paths.get(dir + ".replace-in-progress")

  /** Crash recovery: the dynamic-partition-overwrite commit replaces each
    * affected bucket directory non-atomically (delete, then move staged
    * files in), so a crash mid-commit can leave a bucket missing. Before
    * every overwrite the affected buckets are copied to `<dir>.backup`;
    * on open, any bucket present in the backup but missing from the live
    * table is restored (a bucket present in both means the commit got at
    * least that far — the live copy wins), then the backup is dropped.
    */
  /** Eager, stream-closing directory listing — recover() runs once per
    * micro-batch merge, so an unclosed Files.list stream here would leak
    * one directory fd per merge and exhaust the ulimit on a long-running
    * streaming query.
    */
  private def children(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try { val it = s.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
      while (it.hasNext) b += it.next(); b.result()
    } finally s.close()
  }

  private def recover(): Unit = {
    // A crashed replaceAll must FAIL LOUDLY, never auto-restore: the backup
    // is the full PRE-replace image, and the overwrite may have committed —
    // restoring buckets absent from the rebuilt (possibly narrower) layout
    // would silently resurrect superseded rows and types. The marker can
    // also survive a crash in replaceAll's own post-commit cleanup window
    // (backup already dropped) — re-running the replace is safe then too.
    if (Files.exists(replaceMarker))
      sys.error(s"a replaceAll at $dir crashed mid-commit (marker " +
        s"$replaceMarker present) — re-run the replace before reading or " +
        "merging; automatic recovery could half-undo the truncate-and-load")
    if (Files.exists(backupRoot)) {
      children(backupRoot).foreach { saved =>
        val live = Paths.get(dir).resolve(saved.getFileName)
        if (!Files.exists(live)) copyTree(saved, live)
      }
      deleteTree(backupRoot)
    }
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    Files.createDirectories(to)
    children(from).foreach { f =>
      if (Files.isDirectory(f)) copyTree(f, to.resolve(f.getFileName))
      else { Files.copy(f, to.resolve(f.getFileName)); () }
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) children(p).foreach(deleteTree)
    Files.deleteIfExists(p)
    ()
  }

  override def merge(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    recover()
    val spark = batch.sparkSession
    // persisted: the affected-bucket probe below and the union+write would
    // otherwise execute the batch's full lineage twice per micro-batch
    val incoming0 = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__bucket", bucketOf(keys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ≤ nBuckets values by construction — the driver-side list is what
      // lets the read below prune to affected buckets only
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
      // save the pre-image of every bucket this commit will replace
      if (existingDirs.nonEmpty) {
        Files.createDirectories(backupRoot)
        existingDirs.foreach { d =>
          val p = Paths.get(d)
          copyTree(p, backupRoot.resolve(p.getFileName))
        }
      }
      // one output file per bucket: without this, every bucket directory
      // gets a file per shuffle partition and the layout degenerates into
      // nBuckets × partitions small files, swamping the pruning win
      merged.repartition(affected.length, col("__bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(dir)
      deleteTree(backupRoot)
    } finally {
      incoming0.unpersist()
      ()
    }
  }

  /** Truncate-and-load over the bucket layout: EVERY existing bucket is
    * superseded (stale buckets whose keys vanished are deleted, and no
    * stored column type leaks into the rebuilt table — the type-widening
    * contract). Crash safety: a replace-in-progress marker brackets the
    * commit; while it is present every [[recover]] (and so every read or
    * merge) fails loudly instead of restoring the pre-image backup over the
    * rebuilt layout. Re-running the replace is the only repair — exactly
    * what the caller's migration does on restart — and this method clears
    * the crashed state itself on entry.
    */
  override def replaceAll(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    // a crashed prior replaceAll is cleared HERE, not restored: this call
    // supersedes the entire pre-image by intent, so the stale backup (if
    // any survives) is garbage, not a recovery source
    if (Files.exists(replaceMarker)) {
      deleteTree(backupRoot)
      Files.deleteIfExists(replaceMarker)
      ()
    }
    recover()
    val spark = batch.sparkSession
    val gen = {
      val existing = Files.exists(Paths.get(dir)) &&
        children(Paths.get(dir)).exists(_.getFileName.toString.startsWith("__bucket="))
      if (existing) {
        val c = spark.read.option("mergeSchema", "true").parquet(dir)
        Option(c.agg(max(col("__gen"))).collect().head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(-1L) + 1L
      } else 0L
    }
    val incoming = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__bucket", bucketOf(keys))
      .withColumn("__gen", lit(gen))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__gen").desc)
    val merged = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // back up the ENTIRE pre-image: static overwrite below replaces the
    // whole directory, so every bucket is at risk during the commit
    if (Files.exists(Paths.get(dir))) {
      Files.createDirectories(backupRoot)
      children(Paths.get(dir))
        .filter(_.getFileName.toString.startsWith("__bucket="))
        .foreach(p => copyTree(p, backupRoot.resolve(p.getFileName)))
    }
    // marker AFTER the backup completes (a crash before this line recovers
    // normally — the overwrite has not started) and BEFORE the overwrite
    Files.write(replaceMarker, Array[Byte]())
    merged.repartition(nBuckets, col("__bucket"))
      .write.mode("overwrite")
      .partitionBy("__bucket")
      .parquet(dir)
    deleteTree(backupRoot)
    Files.deleteIfExists(replaceMarker)
    ()
  }

  override def read(spark: SparkSession, mode: DeleteMode): DataFrame = {
    synchronized(recover())
    val t = spark.read.option("mergeSchema", "true").parquet(dir).drop("__gen", "__bucket")
    mode match {
      case DeleteMode.Hard    => t.filter(!col("__is_deleted")).drop("__is_deleted")
      case DeleteMode.Logical => // 'is_deleted' reserved by Logical mode
        t.drop("is_deleted").withColumnRenamed("__is_deleted", "is_deleted")
    }
  }

  /** Point lookup: current state of ONE key, reading only its bucket
    * directory — the read-side payoff of the hash layout (a key lookup
    * opens 1/nBuckets of the table's files). `keyValues` pairs with the
    * merge `keys` used at write time.
    *
    * Bucket derivation must be BIT-IDENTICAL to the write path, and
    * xxhash64 hashes the same logical value differently per data type — so
    * the literals are first cast to the STORED key column types (schema
    * read from one existing bucket's footers, not a table scan) and the
    * hash is evaluated driver-side (no Spark job). A sink that was never
    * merged yields an empty zero-column frame.
    */
  def lookup(spark: SparkSession, keys: Seq[String], keyValues: Seq[Any],
      mode: DeleteMode = DeleteMode.Hard): DataFrame = {
    synchronized(recover())
    require(keys.length == keyValues.length, "one value per key column")
    def shaped(df: DataFrame): DataFrame = mode match {
      case DeleteMode.Hard    => df.filter(!col("__is_deleted")).drop("__is_deleted")
      case DeleteMode.Logical => // 'is_deleted' reserved by Logical mode
        df.drop("is_deleted").withColumnRenamed("__is_deleted", "is_deleted")
    }
    val anyBucket = {
      val p = Paths.get(dir)
      if (!Files.exists(p)) None
      else children(p).find(_.getFileName.toString.startsWith("__bucket="))
    }
    anyBucket match {
      case None => spark.emptyDataFrame // never merged ⇒ nothing to look up
      case Some(sample) =>
        val sampleDf = spark.read.option("basePath", dir).parquet(sample.toString)
          .drop("__gen", "__bucket")
        val schema = sampleDf.schema
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
        val castLits = keys.zip(keyValues).map { case (k, v) =>
          Cast(Literal(v), schema(k).dataType, Some("UTC")): org.apache.spark.sql.catalyst.expressions.Expression
        }
        val h = new XxHash64(castLits.toIndexedSeq).eval(null).asInstanceOf[Long]
        val bucket = (h % nBuckets + nBuckets) % nBuckets
        val bucketDir = s"$dir/__bucket=$bucket"
        if (!Files.exists(Paths.get(bucketDir))) shaped(sampleDf.limit(0))
        else {
          val t = spark.read.option("mergeSchema", "true").option("basePath", dir)
            .parquet(bucketDir).drop("__gen", "__bucket")
          shaped(keys.zip(keyValues).foldLeft(t) { case (df, (k, v)) => df.filter(col(k) === v) })
        }
    }
  }
}
