package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent incremental text index — the SEARCH leg of the incremental-
  * analytics store family (bands = similarity, HLL = cardinality, MG =
  * frequency, this = retrieval): each ingested document batch commits its
  * inverted-index postings `(tok, doc_id, tf)` and doc lengths `(doc_id,
  * dl)` under `_SUCCESS`-gated `batch=<id>` dirs, and BM25 queries run
  * against the STORED postings only — the accumulated corpus text is never
  * re-tokenized, which is the property that keeps "search everything ever
  * ingested" affordable after a year of crawl batches. Scoring is
  * [[graft.llm.TextAnalysis.bm25Score]] verbatim (shared code), so a
  * store-backed search returns bit-identical scores to a one-shot
  * [[graft.llm.TextAnalysis.bm25Search]] over the union corpus
  * (test-pinned).
  *
  * Same commit contract as the sketch stores: idempotent per-batch
  * overwrite (a replayed batch rewrites its own dirs with identical
  * content), appends never touch history, uncommitted partials are
  * invisible. Documents are append-only across batches (a doc_id lives in
  * exactly one batch; re-ingesting a doc means re-appending its batch).
  *
  * Scale shape: postings are written sorted by token, so a query's
  * `tok IN (...)` predicate prunes parquet row groups via min/max stats —
  * the columnar stand-in for an index seek; per query only the matching
  * posting rows and the doc-count-sized length table are read. At 10⁹+
  * docs the postings dir gains a `tok`-hash subpartitioning (same layout,
  * one more dir level) so pruning happens at the directory level first.
  */
final class TextIndexStore(val dir: String) {

  /** Tokenize one batch and commit its postings + doc-length partials. */
  def append(batch: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val toks = batch.select(col(idCol).as("doc_id"),
      explode(graft.llm.TextAnalysis.tokens(col(textCol))).as("tok"))
    toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .repartition(1).sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(s"$dir/postings/batch=$batchId")
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/doclens/batch=$batchId")
  }

  /** BM25 top-k over everything ever committed — reads only the query
    * terms' posting rows plus the length table; scores are bit-identical
    * to a one-shot scan of the union corpus.
    */
  def search(spark: SparkSession, queryTokens: Seq[String], k: Int,
      scale: Long = 1000L): DataFrame = {
    require(queryTokens.nonEmpty, "search needs at least one query token")
    val posts = committed(spark, "postings")
    val dls = committed(spark, "doclens")
    val q = queryTokens.distinct
    // a doc lives in one batch, but summing keeps a re-appended batch's
    // overwrite semantics exact even mid-recommit
    val tf = posts.filter(col("tok").isin(q: _*))
      .groupBy("doc_id", "tok").agg(sum(col("tf")).as("tf"))
    val dl = dls.groupBy("doc_id").agg(sum(col("dl")).as("dl"))
    graft.llm.TextAnalysis.bm25Score(tf, dl, k, scale)
  }

  private def committed(spark: SparkSession, sub: String): DataFrame = {
    val paths = BatchStore.committedBatchPaths(s"$dir/$sub")
    require(paths.nonEmpty, s"no committed $sub batches at $dir")
    spark.read.option("basePath", s"$dir/$sub").parquet(paths: _*)
  }
}
