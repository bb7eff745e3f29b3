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

  /** Tokenize one batch and commit its postings + doc-length partials.
    * Postings are POSITIONAL — `(tok, doc_id, tf, pos ARRAY<INT>)` with
    * the token's 0-based in-document positions sorted — so the same store
    * serves both bag-of-words scoring (BM25 reads tf) and adjacency
    * queries (phrase search intersects shifted position lists).
    */
  def append(batch: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // NOT synchronized beyond the entry recover(): an append writes only
    // its own batch dirs, so serializing the whole (minutes-long) Spark
    // write against every concurrent search would turn safe read/ingest
    // concurrency into full serialization
    // repair any crashed compact() BEFORE touching the store: without this,
    // an append interleaved after a mid-swap crash would recreate a live
    // dir containing only this batch, and the next recover() would then
    // classify the full pre-crash copy (old_<sub>) as post-swap garbage —
    // deleting the only complete index (the parquet sinks' merge() plays
    // the same recover-first rule)
    recover()
    val toks = batch.select(col(idCol).as("doc_id"),
      posexplode(graft.llm.TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("pos"))
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

  /** Index-accelerated exact phrase search: reads ONLY the phrase terms'
    * posting rows (never the corpus), and counts occurrences as
    * `|∩_j (positions(tok_j) − j)|` — the classic positional-index
    * intersection, which handles repeated-token phrases for free and
    * returns counts identical to the scan-side
    * [[graft.llm.TextAnalysis.phraseSearch]] (test-pinned). Per-term
    * position lists merge across batches defensively (a doc lives in one
    * batch; flatten + distinct keeps a mid-recommit state exact). Output
    * (doc_id, occ), top-k by (occ DESC, doc_id).
    */
  def phraseSearch(spark: SparkSession, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val posts = committed(spark, "postings")
    val per = phrase.zipWithIndex.map { case (t, j) =>
      posts.filter(col("tok") === t)
        .groupBy("doc_id")
        .agg(array_sort(array_distinct(flatten(collect_list(col("pos"))))).as("p"))
        .select(col("doc_id"), transform(col("p"), x => x - j).as(s"s$j"))
    }
    val joined = per.reduce((a, b) => a.join(b, "doc_id"))
    val inter = (1 until phrase.length)
      .foldLeft(col("s0"))((acc, j) => array_intersect(acc, col(s"s$j")))
    joined.select(col("doc_id"), size(inter).cast("long").as("occ"))
      .filter(col("occ") > 0)
      .orderBy(col("occ").desc, col("doc_id"))
      .limit(k)
  }

  /** Index-accelerated ordered proximity search ("`first` followed by
    * `second` within `slop` tokens"): reads ONLY the two terms' posting
    * rows, pairs their per-doc position lists (occurrences = ordered pairs
    * with 0 < p₂ − p₁ ≤ slop), never touches the corpus. Counts are
    * identical to the scan-side
    * [[graft.llm.TextAnalysis.proximitySearch]] (test-pinned); batch
    * merging is the same defensive flatten + distinct as [[phraseSearch]].
    */
  def proximitySearch(spark: SparkSession, first: String, second: String,
      slop: Int, k: Int): DataFrame = {
    require(slop >= 1, "slop must be >= 1")
    val posts = committed(spark, "postings")
    def positions(t: String, out: String) =
      posts.filter(col("tok") === t)
        .groupBy("doc_id")
        .agg(array_sort(array_distinct(flatten(collect_list(col("pos"))))).as(out))
    positions(first, "pa").join(positions(second, "pb"), "doc_id")
      .select(col("doc_id"),
        aggregate(col("pa"), lit(0L), (acc, i) =>
          acc + size(filter(col("pb"), j => j > i && j <= i + slop)).cast("long"))
          .as("occ"))
      .filter(col("occ") > 0)
      .orderBy(col("occ").desc, col("doc_id"))
      .limit(k)
  }

  /** Index maintenance: merge every committed batch into ONE batch dir
    * (`batch=<compactId>`) per sub-store — the store-side twin of
    * [[Compaction]]: a year of crawl appends leaves thousands of small
    * batch dirs whose per-file open/footer costs eventually dominate the
    * posting reads themselves. Content is preserved exactly (a doc lives
    * in one batch; tf sums and position merges are the same defensive
    * folds every reader already applies), so search / phrase / proximity
    * results are identical before and after (test-pinned).
    *
    * Crash safety mirrors [[Compaction]]'s two-rename swap: merged content
    * is fully written (and `_SUCCESS`-gated) under `tmp_<sub>` first, then
    * `<sub>` → `old_<sub>` → delete. A crash at any point is repaired by
    * [[recover]], never by a rewrite. Single-writer contract (same as
    * Compaction): run compaction when no concurrent search executes — the
    * inter-rename window has no live dir.
    */
  def compact(spark: SparkSession, compactId: Long = 0L): Unit = synchronized {
    recover()
    // committedRaw, not committed: the reader-side recover would classify
    // the tmp_ dir this merge is writing as crash garbage and delete it
    val posts = committedRaw(spark, "postings")
    posts.groupBy("doc_id", "tok")
      .agg(sum(col("tf")).as("tf"),
        array_sort(array_distinct(flatten(collect_list(col("pos"))))).as("pos"))
      .repartition(1).sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(s"$dir/tmp_postings/batch=$compactId")
    committedRaw(spark, "doclens").groupBy("doc_id")
      .agg(sum(col("dl")).as("dl"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/tmp_doclens/batch=$compactId")
    for (sub <- Seq("postings", "doclens")) {
      val live = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$dir/old_$sub")
      graft.engine.Dfs.rename(live, old)
      graft.engine.Dfs.rename(new org.apache.hadoop.fs.Path(s"$dir/tmp_$sub"), live)
      graft.engine.Dfs.deleteTreeStrict(old)
    }
  }

  /** Repairs whatever a crashed [[compact]] left behind (same decision
    * table as [[Compaction.recover]]): live missing + `old_` present →
    * the crash hit mid-swap, restore the original; live present + `old_`
    * present → post-swap garbage, delete; `tmp_` is always garbage (the
    * live dir is never touched before the merged copy is fully committed).
    *
    * Store-mutating, so concurrency is pinned down: `synchronized` (like
    * [[append]]/[[compact]]) serializes every recover in THIS instance —
    * two same-instance readers over crash leftovers can no longer race the
    * `old_` → live restore, and a read can't wipe a running same-instance
    * compact's `tmp_` dirs. Across INSTANCES the restore additionally
    * tolerates losing the rename race (the other recoverer restored the
    * same content — the store is append-only, so both copies are
    * identical); the cross-instance compact-vs-read window remains the
    * documented single-writer contract on [[compact]].
    */
  def recover(): Unit = synchronized {
    for (sub <- Seq("postings", "doclens")) {
      val live = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$dir/old_$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/tmp_$sub")
      if (!graft.engine.Dfs.exists(live) && graft.engine.Dfs.exists(old)) {
        // rename-onto-absent, NOT FileSystem.rename: HDFS's rename onto an
        // existing directory silently moves the source INTO it (nesting
        // old_ garbage under the live index); the FileContext NONE form
        // fails cleanly instead, and a false return = another instance's
        // recover restored the identical copy first — accept it
        graft.engine.Dfs.renameOntoAbsent(old, live)
        ()
      }
      if (graft.engine.Dfs.exists(old) && graft.engine.Dfs.exists(live))
        graft.engine.Dfs.deleteTreeStrict(old)
      if (graft.engine.Dfs.exists(tmp))
        graft.engine.Dfs.deleteTreeStrict(tmp)
    }
  }

  private def committed(spark: SparkSession, sub: String): DataFrame = {
    recover() // a reader after a mid-swap crash must see the restored copy
    committedRaw(spark, sub)
  }

  /** [[committed]] without the recover step — for [[compact]]'s internal
    * reads, which run AFTER its own entry recover and must not wipe the
    * `tmp_` dirs the merge is writing.
    */
  private def committedRaw(spark: SparkSession, sub: String): DataFrame = {
    val paths = BatchStore.committedBatchPaths(s"$dir/$sub")
    require(paths.nonEmpty, s"no committed $sub batches at $dir")
    spark.read.option("basePath", s"$dir/$sub").parquet(paths: _*)
  }
}
