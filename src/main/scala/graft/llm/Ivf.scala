package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to [[Similarity.annLsh]]. Vectors are partitioned into `nCells` by
  * nearest centroid (spherical k-means, a few Lloyd iterations in plain
  * DataFrame ops); a query scores only the `nProbe` nearest cells, so work
  * per query is |corpus|·nProbe/nCells instead of |corpus|.
  *
  * At cluster scale the assigned corpus is written partitioned by `cell`
  * (partition pruning turns a probe into a file-level skip); here the cell
  * assignment is a column. All distance kernels use the codegen
  * [[graft.functions.CosineSimilarity]] expression.
  */
object Ivf {

  final case class Model(centroids: DataFrame, assigned: DataFrame) {
    /** Releases the cached centroid and assignment datasets. Call when done
      * searching; results still un-materialized at close() recompute from
      * lineage (correct, slower).
      */
    def close(): Unit = {
      centroids.unpersist()
      assigned.unpersist()
      ()
    }
  }

  private def bestCell(df: DataFrame, centroids: DataFrame, embCol: String): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("__sim", GraftFunctions.cosine_sim(col(embCol), col("centroid")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__sim").desc, col("cell"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__sim", "centroid")
  }

  /** Deterministic init (first nCells vectors by id) + `iters` Lloyd steps:
    * assign to nearest centroid, recompute element-wise means.
    */
  def train(corpus: DataFrame, nCells: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    GraftFunctions.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).as("vec_id"), col(embCol))
    // the init frame is ≤ nCells rows by the limit — number the cells on
    // the driver instead of through a window (tiny by construction, and it
    // keeps the log free of the global-window warning)
    val spark = corpus.sparkSession
    val initRows = base.orderBy("vec_id").limit(nCells)
      .select(Similarity.asDouble(col(embCol)).as("centroid"))
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(i, r.getSeq[Double](0)) }
    var centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(initRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = bestCell(base, centroids, embCol)
      val exploded = assigned.select(col("cell"),
        posexplode(Similarity.asDouble(col(embCol))).as(Seq("pos", "v")))
      centroids = exploded.groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
    }
    Model(centroids.cache(), bestCell(base, centroids, embCol).cache())
  }

  /** Top-k per query over the nProbe nearest cells only. */
  def search(model: Model, queries: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("qe"))
    val qScored = q.crossJoin(broadcast(model.centroids))
      .withColumn("__sim", GraftFunctions.cosine_sim(col("qe"), col("centroid")))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("__sim").desc, col("cell"))
    val qCells = qScored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe).select(col("q_id"), col("qe"), col("cell"))
    val cand = model.assigned.join(qCells, "cell")
      .withColumn("cos", GraftFunctions.cosine_sim(col(embCol), col("qe")).cast("decimal(38,4)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos"))
  }
}
