package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to [[Similarity.annLsh]]. Vectors are partitioned into `nCells` by
  * nearest centroid (spherical k-means, a few Lloyd iterations in plain
  * DataFrame ops); a query scores only the `nProbe` nearest cells, so work
  * per query is |corpus|·nProbe/nCells instead of |corpus|.
  *
  * Scale shape (the [[KMeans]] pattern): centroids live on the DRIVER
  * between Lloyd steps (≤ nCells·dim doubles by construction) and enter the
  * assignment plan as an array-of-struct literal, so nearest-cell selection
  * is a NARROW per-row argmax — `array_min(transform(centroids, struct(
  * -sim, cell)))` — with no cross join, no shuffle, no window and no sort
  * over scored rows. The earlier formulation cross-joined the corpus with
  * the centroid frame and ranked n×nCells rows through a row_number window
  * (full exchange + sort per Lloyd iteration). At cluster scale the
  * assigned corpus is written partitioned by `cell` (partition pruning
  * turns a probe into a file-level skip); here the cell assignment is a
  * column. All distance kernels use the codegen
  * [[graft.functions.CosineSimilarity]] expression.
  */
object Ivf {

  private type Centroids = IndexedSeq[(Int, IndexedSeq[Double])]

  final case class Model(centroids: DataFrame, assigned: DataFrame,
      private[Ivf] val cents: Centroids) {
    /** Releases the cached assignment dataset. Results still
      * un-materialized at close() recompute from lineage (correct, slower).
      */
    def close(): Unit = {
      assigned.unpersist()
      ()
    }
  }

  /** The centroid set as one array-of-struct literal column. */
  private def centroidArray(cents: Centroids): Column =
    array(cents.map { case (cell, cv) =>
      struct(lit(cell).as("cell"), array(cv.map(lit): _*).as("centroid"))
    }: _*)

  /** Per-centroid (-cosine, cell) structs for one row's embedding — struct
    * ordering is lexicographic, so the array_min IS "most similar cell,
    * ties to the lowest cell id".
    */
  private def scoredCells(emb: Column, cents: Centroids): Column =
    transform(centroidArray(cents),
      c => struct((-GraftFunctions.cosine_sim(emb, c.getField("centroid"))).as("nsim"),
        c.getField("cell").as("cell")))

  private def bestCell(df: DataFrame, cents: Centroids, embCol: String): DataFrame =
    df.withColumn("__best", array_min(scoredCells(col(embCol), cents)))
      .select(col("vec_id"), col(embCol), col("__best.cell").as("cell"))

  /** Deterministic init (first nCells vectors by id) + `iters` Lloyd steps:
    * assign to nearest centroid, recompute element-wise means. Each step is
    * one narrow pass over the corpus plus a (cell, pos) grouped mean —
    * map-side combinable, ≤ nCells·dim rows past the exchange.
    */
  def train(corpus: DataFrame, nCells: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("vec_id"), col(embCol))
    // the init frame is ≤ nCells rows by the limit — numbered on the driver
    var cents: Centroids = graft.engine.GraftSession.boundedCollect(
      base.orderBy("vec_id").limit(nCells)
        .select(Similarity.asDouble(col(embCol)).as("centroid")),
      nCells, "ivf init").toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toIndexedSeq) }
    for (_ <- 0 until iters) {
      val assigned = bestCell(base, cents, embCol)
      cents = graft.engine.GraftSession.boundedCollect(assigned
        .select(col("cell"), posexplode(Similarity.asDouble(col(embCol))).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid")),
        nCells, "ivf step").toIndexedSeq // ≤ nCells rows by construction
        .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq)).sortBy(_._1)
    }
    val centroidDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.map { case (c, v) => Row(c, v) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
    Model(centroidDf, bestCell(base, cents, embCol).cache(), cents)
  }

  /** Top-k per query over the nProbe nearest cells only. Probe-cell
    * selection is the same narrow per-row expression as assignment (sort
    * the ≤-nCells literal array inside the row, slice nProbe, explode) —
    * no window over the scored queries. The final top-k IS a window, but a
    * genuinely top-k-per-group one over candidates already cut to
    * |corpus|·nProbe/nCells.
    */
  /** (q_id, qe, cell) — each query's nProbe nearest cells, the narrow
    * probe-selection expression shared by [[search]] and [[Pq.searchIvf]].
    */
  def probeCells(model: Model, queries: DataFrame, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    queries.select(col(idCol).as("q_id"), col(embCol).as("qe"))
      .withColumn("__probe",
        slice(array_sort(scoredCells(col("qe"), model.cents)), 1, nProbe))
      .select(col("q_id"), col("qe"), explode(col("__probe.cell")).as("cell"))

  def search(model: Model, queries: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val qCells = probeCells(model, queries, nProbe, idCol, embCol)
    val cand = model.assigned.join(qCells, "cell")
      .withColumn("cos", GraftFunctions.cosine_sim(col(embCol), col("qe")).cast("decimal(38,4)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos"))
  }
}
