package graft

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sink.{TextIndexStore, VectorIndexStore}

/** DSv2 read paths over the batch stores: plain SQL must see exactly the
  * committed state the Scala store APIs see (uncommitted partials
  * invisible), and the provider-level file pruning must mirror the store's
  * own read discipline — cell predicates plan only the matching `cell=`
  * dirs, the way a key probe plans one bucket on the snapshot format.
  */
class IndexStoreProvidersSpec extends SparkSpec {
  import spark.implicits._

  private def scanFiles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.length
        }
    }.sum
  }

  test("graft-textindex: committed batches only; postings and doclens readable") {
    val dir = tmpDir("tix") + "/s"
    val store = new TextIndexStore(dir)
    store.append(Seq((0L, "alpha beta gamma"), (1L, "beta beta delta"))
      .toDF("doc_id", "text"), batchId = 0L)
    store.append(Seq((2L, "alpha alpha epsilon")).toDF("doc_id", "text"), batchId = 1L)
    // a crashed third append: data written, commit marker missing
    store.append(Seq((3L, "zeta zeta zeta")).toDF("doc_id", "text"), batchId = 2L)
    for (sub <- Seq("postings", "doclens"))
      assert(new File(s"$dir/$sub/batch=2/_SUCCESS").delete())

    val posts = spark.read.format("graft-textindex").load(dir)
    // committed visibility: doc 3's tokens never surface
    assert(posts.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L, 2L))
    // the file list itself excludes the uncommitted dir (one file per
    // committed batch — the append path writes repartition(1))
    assert(scanFiles(posts) == 2, "uncommitted batch dir must not be planned")
    // postings agree with the store's own search arithmetic
    assert(posts.filter($"tok" === "beta").agg(sum("tf")).head.getLong(0) == 3L)
    val dls = spark.read.format("graft-textindex").option("sub", "doclens").load(dir)
    assert(dls.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
    // SQL view composes
    posts.createOrReplaceTempView("idx_postings")
    assert(spark.sql("SELECT count(DISTINCT tok) FROM idx_postings").head.getLong(0) == 5L)
    intercept[Exception] {
      spark.read.format("graft-textindex").option("sub", "bogus").load(dir).collect()
    }
  }

  test("graft-vectorindex: cell predicates prune to the matching cell dirs") {
    val dir = tmpDir("vix") + "/s"
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val store = new VectorIndexStore(dir)
    store.init(emb, k = 4, iters = 3)
    store.append(emb.filter($"vec_id" < 250), batchId = 0L)
    store.append(emb.filter($"vec_id" >= 250), batchId = 1L)

    val t = spark.read.format("graft-vectorindex").load(dir)
    // partition-derived columns surface; every committed vector visible
    assert(t.columns.contains("cell") && t.columns.contains("batch"))
    assert(t.count() == emb.count())
    val fullFiles = scanFiles(t)
    assert(fullFiles > 2, s"expected one file per (batch, cell) dir, saw $fullFiles")

    // pick a populated cell and probe it: the plan must touch only that
    // cell's dirs (<= one per batch), and the rows must match a full-scan
    // filter exactly
    val cellCounts = t.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probeCell = cellCounts.maxBy(_._2)._1
    val probe = t.filter($"cell" === probeCell)
    val probeFiles = scanFiles(probe)
    assert(probeFiles <= 2 && probeFiles < fullFiles,
      s"cell probe planned $probeFiles of $fullFiles files")
    assert(probe.count() == cellCounts(probeCell))
    // IN-list pruning
    val two = cellCounts.keys.toSeq.sorted.take(2)
    val inProbe = t.filter($"cell".isin(two: _*))
    assert(scanFiles(inProbe) <= 4 && scanFiles(inProbe) < fullFiles)
    assert(inProbe.count() == two.map(cellCounts).sum)
    // a non-cell predicate must not prune files (and stays correct)
    val wide = t.filter($"vec_id" === 7L)
    assert(scanFiles(wide) == fullFiles)
    assert(wide.select("vec_id").head.getLong(0) == 7L)
  }
}
