package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.KMeans

/** Persistent incremental IVF vector index — the ANN leg of the
  * incremental-analytics store family (bands = similarity, HLL =
  * cardinality, MG = frequency, postings = retrieval, this = vectors):
  * centroids are trained ONCE on the initial corpus with the
  * oracle-replayable integer Lloyd ([[graft.llm.KMeans]] — deterministic,
  * no RNG), then every ingested batch assigns its vectors to the FIXED
  * centroid set (the narrow per-row argmin) and commits them under
  * `vectors/batch=<id>/cell=<c>/` — a `_SUCCESS`-gated batch dir whose
  * inner `cell=` level is a real partition column. A search probes the
  * `nProbe` nearest cells and reads ONLY those cells' files (directory-level
  * partition pruning — the columnar stand-in for an inverted-list seek), so
  * query cost scales with the probed fraction of the corpus, not its
  * accumulated size: the property that keeps "search everything ever
  * ingested" affordable after a year of embedding batches.
  *
  * Same commit contract as the other stores: idempotent per-batch overwrite
  * (a replayed batch rewrites its own dir with identical content — the
  * fixed centroids make assignment replay-stable), appends never touch
  * history, uncommitted partials are invisible. A vec_id lives in exactly
  * one batch.
  *
  * Because centroids never move after `init`, search results over the
  * accumulated store are IDENTICAL to a one-shot IVF over the union corpus
  * with the same centroids — which is exactly what the t2 oracle computes
  * (q89h replays the Lloyd chain, the probe ranking and the cosine rerank
  * in SQL, never touching the index). Centroid drift at scale is handled
  * the way serving systems do: retrain offline, write a NEW index dir,
  * swap readers.
  */
final class VectorIndexStore(val dir: String) {

  /** Trains the cell layout on the initial corpus (integer Lloyd — see
    * [[graft.llm.KMeans.train]]) and persists the centroid table. Call once
    * per index; appends and searches bind to these frozen centroids.
    */
  def init(corpus: DataFrame, k: Int, iters: Int, scale: Int = 4096,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val model = KMeans.train(corpus, k, iters, scale, idCol, embCol)
    model.centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  private def centroids(spark: SparkSession): KMeans.Centroids =
    KMeans.collectCentroids(spark.read.parquet(s"$dir/centroids"))

  /** Assigns one vector batch to the frozen centroids and commits it,
    * partitioned by cell. The raw embedding rides along for the exact
    * rerank at search time (the quantized view exists only inside the
    * assignment expression), and every OTHER input column is persisted as
    * payload — metadata (labels, timestamps, source) that a filtered
    * search can push down into the cell scan.
    */
  def append(batch: DataFrame, batchId: Long, scale: Int = 4096,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val cents = centroids(batch.sparkSession)
    batch.withColumnRenamed(idCol, "vec_id").withColumnRenamed(embCol, "embedding")
      .withColumn("cell",
        KMeans.cellOf(KMeans.quantize(col("embedding"), scale), cents))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$dir/vectors/batch=$batchId")
  }

  /** Top-k by exact cosine within the `nProbe` nearest cells per query —
    * reads only the probed cells' files across every committed batch.
    * Output (q_id, n_id, cos DECIMAL(38,4)), deterministic order by
    * (cos DESC, n_id) per query. Queries are a serving-sized frame (its
    * per-query probe lists collapse to ≤ k distinct cells for the scan
    * filter); candidates join queries via the broadcast query side, so the
    * store side never shuffles.
    *
    * `candidateFilter` is the filtered-ANN path (the metadata predicate a
    * vector database applies WITH the similarity search, not after it): a
    * predicate over the store's payload columns, applied to the cell scan
    * BEFORE the rerank — a plain column predicate reaches the parquet
    * reader as a pushed filter, so non-matching row groups are skipped at
    * the same layer the cell pruning happens. Recall caveat is the
    * standard one: candidates still come from the probed cells; a highly
    * selective filter wants a larger nProbe.
    */
  def search(spark: SparkSession, queries: DataFrame, k: Int, nProbe: Int,
      scale: Int = 4096, idCol: String = "vec_id",
      embCol: String = "embedding",
      candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cents = centroids(spark)
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("qe"))
      .withColumn("cells",
        KMeans.probeCellsOf(KMeans.quantize(col("qe"), scale), cents, nProbe))
    // distinct probed cells: ⊆ the k centroid ids, so this collect is
    // bounded by k regardless of query count
    val probed = q.select(explode(col("cells")).as("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val batches = BatchStore.committedBatchPaths(s"$dir/vectors")
    require(batches.nonEmpty, s"no committed vector batches at $dir")
    val scanned = spark.read.option("basePath", s"$dir/vectors")
      .parquet(batches: _*)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
      .drop("batch")
    val vecs = candidateFilter.fold(scanned)(scanned.filter)
    val scored = vecs.join(broadcast(q), array_contains(col("cells"), col("cell")))
      .withColumn("cos",
        graft.llm.Similarity.cosine(col("embedding"), col("qe")).cast("decimal(38,4)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos"))
  }

  /** Index-health cell histogram — the balance monitor every IVF serving
    * system watches (a hot cell means its inverted list dominates probe
    * latency; many near-empty cells mean the centroids drifted off the
    * data): per cell, the committed vector count and
    * hot_x1000 = (n·k·1000) DIV total — 1000 = perfectly balanced, higher
    * = hot. Reads only the cell column (partition-derived — the scan
    * touches directory metadata plus row counts, not vectors).
    */
  def cellHistogram(spark: SparkSession): DataFrame = {
    val batches = BatchStore.committedBatchPaths(s"$dir/vectors")
    require(batches.nonEmpty, s"no committed vector batches at $dir")
    val counts = spark.read.option("basePath", s"$dir/vectors")
      .parquet(batches: _*)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("tot"), count(lit(1)).as("k"))
    counts.crossJoin(broadcast(total))
      .select(col("cell").cast("bigint").as("cell"), col("n").cast("bigint").as("n"),
        expr("(n * k * 1000) DIV tot").cast("bigint").as("hot_x1000"))
  }
}
