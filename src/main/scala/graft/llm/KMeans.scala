package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * Scale shape: assignment is a NARROW per-row argmin — the k centroids
  * (k·dim longs, driver-local between steps) enter the plan as an array
  * literal and `array_min(transform(...))` picks the (d2, cell)-minimal
  * struct inside the row, so the corpus is never shuffled, crossed or
  * windowed (at k·dim beyond literal-tree comfort, the same expression runs
  * against a broadcast variable). Each Lloyd step then needs one
  * (cell, pos) grouped sum — map-side combinable, ≤ k·dim rows per task
  * partial. Overflow bounds at the default scale 4096 with |x| ≤ 1 inputs:
  * per-element distance terms ≤ (2·4096)², per-(cell, pos) sums stay inside
  * int64 to ~10^14 rows per cell.
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

  private[graft] type Centroids = IndexedSeq[(Int, IndexedSeq[Long])]

  /** Hard ceiling on driver-resident centroid counts: centroids are model
    * state BY DESIGN (they broadcast into every assignment expression), and
    * 64k cells × dim longs is already past any sane IVF layout — a frame
    * larger than this is a bug, not a big index.
    */
  private[graft] val MaxDriverCentroids = 65536

  /** Collects a (cell, cv) centroid frame into driver-local form — bounded
    * by construction (≤ k rows of k·dim longs) and ENFORCED at
    * [[MaxDriverCentroids]] ([[graft.engine.GraftSession.boundedCollect]]).
    */
  private[graft] def collectCentroids(df: DataFrame): Centroids =
    graft.engine.GraftSession.boundedCollect(
      df.select(col("cell").cast("int"), col("cv")),
      MaxDriverCentroids, "kmeans centroids").toIndexedSeq
      .map(r => (r.getInt(0), r.getSeq[Long](1).toIndexedSeq)).sortBy(_._1)

  /** [[assign]]'s narrow argmin as an added `cell` column, keeping every
    * input column — the shape a persistent index's ingest path needs
    * (assign, then partition the batch write by cell).
    */
  private[graft] def cellOf(qv: Column, cents: Centroids): Column =
    array_min(transform(centroidArray(cents),
      c => struct(dist2(qv, c.getField("cv")).as("d2"),
        c.getField("cell").as("cell")))).getField("cell")

  /** [[cellOf]]'s sibling for the DISTANCE: exact squared distance to the
    * nearest centroid — summing it over a corpus is the quantization
    * inertia a drift monitor compares across centroid sets.
    */
  private[graft] def minDist2Of(qv: Column, cents: Centroids): Column =
    array_min(transform(centroidArray(cents),
      c => struct(dist2(qv, c.getField("cv")).as("d2"),
        c.getField("cell").as("cell")))).getField("d2")

  /** The `nProbe` nearest cells by exact integer distance, ties to the
    * lowest cell id — struct sort order IS (d2 ASC, cell ASC), so this is
    * one codegen'd per-row expression, no join.
    */
  private[graft] def probeCellsOf(qv: Column, cents: Centroids, nProbe: Int): Column =
    transform(
      slice(array_sort(transform(centroidArray(cents),
        c => struct(dist2(qv, c.getField("cv")).as("d2"),
          c.getField("cell").as("cell")))), 1, nProbe),
      s => s.getField("cell"))

  /** The centroid set as one array-of-struct literal column. */
  private def centroidArray(cents: Centroids): Column =
    array(cents.map { case (cell, cv) =>
      struct(lit(cell).as("cell"), array(cv.map(lit): _*).as("cv"))
    }: _*)

  /** Narrow argmin: struct ordering is lexicographic, so the array_min of
    * (d2, cell) structs IS "nearest centroid, ties to the lowest cell" —
    * one codegen'd expression per row, no join, no shuffle, no window.
    */
  private def assign(q: DataFrame, cents: Centroids): DataFrame =
    q.withColumn("__best", array_min(transform(centroidArray(cents),
        c => struct(dist2(col("qv"), c.getField("cv")).as("d2"),
          c.getField("cell").as("cell")))))
      .select(col("vec_id"), col("qv"),
        col("__best").getField("cell").as("cell"),
        col("__best").getField("d2").as("d2"))

  /** Floored per-dimension mean of each cell's members: floor(s/n) written
    * mode-free as (s − pmod(s, n)) / n, so it computes identically on
    * engines that truncate integer division and engines that floor it.
    * A cell that loses every member drops out (k shrinks), same as the
    * textbook Lloyd formulation.
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
    * Centroids live on the driver between steps (≤ k·dim longs by
    * construction), so every step is one narrow pass over the corpus.
    */
  def train(corpus: DataFrame, k: Int, iters: Int, scale: Int = 4096,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val spark = corpus.sparkSession
    val q = corpus.select(col(idCol).as("vec_id"), quantize(col(embCol), scale).as("qv"))
    // init frame is ≤ k rows by the limit — numbered on the driver
    var cents: Centroids = graft.engine.GraftSession.boundedCollect(
      q.orderBy("vec_id").limit(k), k, "kmeans init").toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toIndexedSeq) }
    for (_ <- 0 until iters) {
      cents = graft.engine.GraftSession.boundedCollect(
        recompute(assign(q, cents)), k, "kmeans step").toIndexedSeq // ≤ k rows
        .map(r => (r.getInt(0), r.getSeq[Long](1).toIndexedSeq)).sortBy(_._1)
    }
    val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val centroidDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.map { case (c, v) => Row(c, v) }, 1),
      centroidSchema)
    Model(centroidDf, assign(q, cents))
  }

  /** Per-cluster summary of a trained model: size, id checksum, inertia. */
  def clusterStats(model: Model): DataFrame =
    model.assigned.groupBy(col("cell").cast("bigint").as("cell"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("vec_id")).cast("bigint").as("id_sum"),
        sum(col("d2")).cast("bigint").as("inertia"))
}
