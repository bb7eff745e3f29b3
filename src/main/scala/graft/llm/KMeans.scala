package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-point k-means over embedding columns — the semantic
  * clustering step of a training-data pipeline (topic balancing, data-mix
  * curation, cluster-level pre-grouping before dedup). Complements
  * [[Ivf]] (double-precision spherical k-means for ANN cell layout): this
  * variant trades a quantization step for EXACT reproducibility.
  *
  * Everything is integer arithmetic: embeddings are floor-quantized to
  * `scale` fixed-point, assignment minimizes the exact integer squared
  * Euclidean distance (ties to the lowest cell id), and Lloyd recomputation
  * floors the per-dimension mean. No RNG and no float accumulation-order
  * sensitivity — the same clustering falls out on any engine, partitioning
  * or rerun, so a DuckDB oracle replays the WHOLE training loop and
  * hash-matches (q89d).
  *
  * Scale shape: each Lloyd step broadcasts k centroids (k·dim longs), then
  * one narrow per-row argmin (no corpus shuffle) + one (cell, pos) grouped
  * sum — map-side combinable, 64·k·dim partial-agg rows per task. Overflow
  * bounds at the default scale 4096 with |x| ≤ 1 inputs: per-element
  * distance terms ≤ (2·4096)², per-(cell,pos) sums stay inside int64 to
  * ~10^14 rows per cell.
  */
object KMeans {

  /** floor(x·scale) fixed-point view of a float/double array column. */
  def quantize(emb: Column, scale: Int): Column =
    transform(emb, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer squared Euclidean distance between two long arrays. */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** `centroids`: (cell INT, cv ARRAY<LONG>); `assigned`: one row per input
    * vector — (vec_id, qv, cell, d2) with d2 the exact squared distance to
    * its centroid (Σ per-cell d2 = the inertia the run minimizes).
    */
  final case class Model(centroids: DataFrame, assigned: DataFrame)

  private def assign(q: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = q.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("qv"), col("cv")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vec_id"), col("qv"), col("cell"), col("d2"))
  }

  /** Floored per-dimension mean of each cell's members: floor(s/n) written
    * mode-free as (s − pmod(s, n)) / n, so it computes identically on
    * engines that truncate integer division and engines that floor it.
    */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", ((col("s") - pmod(col("s"), col("n"))) / col("n")).cast("long"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))

  /** `iters` Lloyd steps from the deterministic init (the k lowest-id
    * vectors, numbered 0..k−1 in id order), then a final assignment.
    * Centroids are materialized between steps (≤ k·dim longs by
    * construction) so every step is a fresh broadcast over a shallow plan.
    */
  def train(corpus: DataFrame, k: Int, iters: Int, scale: Int = 4096,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val spark = corpus.sparkSession
    val q = corpus.select(col(idCol).as("vec_id"), quantize(col(embCol), scale).as("qv"))
    def localized(rows: IndexedSeq[Row], schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    // init frame is ≤ k rows by the limit — numbered on the driver
    val initSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    var centroids = localized(
      q.orderBy("vec_id").limit(k).collect().toIndexedSeq.zipWithIndex
        .map { case (r, i) => Row(i, r.getSeq[Long](1)) },
      initSchema)
    for (_ <- 0 until iters) {
      val next = recompute(assign(q, centroids))
      centroids = localized(next.collect().toIndexedSeq, next.schema) // ≤ k rows
    }
    Model(centroids, assign(q, centroids))
  }

  /** Per-cluster summary of a trained model: size, id checksum, inertia. */
  def clusterStats(model: Model): DataFrame =
    model.assigned.groupBy(col("cell").cast("bigint").as("cell"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("vec_id")).cast("bigint").as("id_sum"),
        sum(col("d2")).cast("bigint").as("inertia"))
}
