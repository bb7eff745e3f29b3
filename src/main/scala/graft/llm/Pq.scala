package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the MEMORY side of ANN at 10⁹ vectors:
  * [[Ivf]] prunes which vectors to score, PQ shrinks what scoring reads. A
  * d-dim vector splits into `nSub` subvectors, each quantized to the id of
  * its nearest subspace centroid (a codebook of `kSub` entries learned by
  * k-means per subspace), so the corpus stores `nSub` small ints per
  * vector (64 dims × 4 bytes → 8 bytes at 8×256) and asymmetric distance
  * computation (ADC) scores a candidate with `nSub` table lookups instead
  * of d multiplies.
  *
  * Everything reuses [[KMeans]]' deterministic integer Lloyd machinery:
  * training, encoding and ADC tables are exact fixed-point arithmetic, so
  * codes and distances are engine/rerun-reproducible (no RNG, no float
  * accumulation order) — the property that lets a correctness contract pin
  * recall as a constant of the data rather than a flaky sample.
  *
  * Scale shape: training touches the corpus once per subspace per Lloyd
  * step (narrow argmin against centroid literals — no join, no shuffle);
  * encoding is one narrow pass; search broadcasts per-query ADC tables
  * (nSub·kSub longs each) and scans codes without shuffling the corpus —
  * the same corpus-never-moves contract as [[Similarity.annBruteForce]].
  */
object Pq {

  /** codebooks(s) = subspace s's (cell, centroid) list; codes = one row per
    * corpus vector: (vec_id, codes ARRAY<INT>).
    */
  final case class Model(nSub: Int, subDim: Int, scale: Int,
      codebooks: IndexedSeq[IndexedSeq[(Int, IndexedSeq[Long])]], codes: DataFrame)

  private def quantized(df: DataFrame, idCol: String, embCol: String, scale: Int) =
    df.select(col(idCol).as("vec_id"), KMeans.quantize(col(embCol), scale).as("qv"))

  /** Narrow per-subspace argmin: centroids enter as an array literal,
    * array_min of (d2, cell) structs picks the code — no join/shuffle.
    */
  private def codeExpr(sub: Int, subDim: Int,
      cents: IndexedSeq[(Int, IndexedSeq[Long])]): Column = {
    val slice = expr(s"slice(qv, ${sub * subDim + 1}, $subDim)")
    array_min(array(cents.map { case (cell, cv) =>
      struct(KMeans.dist2(slice, array(cv.map(lit): _*)).as("d2"),
        lit(cell).as("cell"))
    }: _*)).getField("cell")
  }

  /** Train one codebook per subspace (k-means over the subvector slice),
    * then encode the corpus. `dim` must divide into `nSub` equal slices.
    */
  def train(corpus: DataFrame, dim: Int, nSub: Int, kSub: Int, iters: Int,
      scale: Int = 4096, idCol: String = "vec_id",
      embCol: String = "embedding"): Model = {
    require(dim % nSub == 0, s"dim $dim must split into $nSub equal subspaces")
    val subDim = dim / nSub
    val q = quantized(corpus, idCol, embCol, scale)
    val codebooks = (0 until nSub).map { s =>
      // KMeans.train over the slice: reuse the exact machinery by viewing
      // the subvector as the embedding (already-quantized ints pass
      // through quantize(scale=1) unchanged)
      val sliceDf = q.select(col("vec_id"),
        expr(s"transform(slice(qv, ${s * subDim + 1}, $subDim), x -> CAST(x AS DOUBLE))")
          .as("embedding"))
      KMeans.train(sliceDf, k = kSub, iters = iters, scale = 1).centroids
        .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toIndexedSeq))
        .toIndexedSeq.sortBy(_._1)
    }
    val codeCols = (0 until nSub).map(s => codeExpr(s, subDim, codebooks(s)))
    Model(nSub, subDim, scale, codebooks,
      q.select(col("vec_id"), array(codeCols: _*).as("codes")))
  }

  /** IVFPQ (the FAISS-style composition): [[Ivf]] prunes WHICH vectors are
    * scored — only the nProbe probed cells' members — and PQ shrinks WHAT
    * scoring reads — their codes, not raw vectors. At 10⁹ vectors this is
    * the layout that fits an index in cluster memory: cells cut candidates
    * by nProbe/nCells, codes cut bytes-per-candidate by ~32×. Candidate
    * selection joins the IVF assignment on the probed cell (partition-
    * pruned when the assignment is stored partitioned by cell); ADC then
    * runs as in [[search]] over the candidate subset.
    */
  def searchIvf(model: Model, ivf: Ivf.Model, queries: DataFrame, k: Int,
      nProbe: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val members = Ivf.probeCells(ivf, queries, nProbe, idCol, embCol)
      .select(col("q_id"), col("cell"))
      .join(ivf.assigned.select(col("vec_id"), col("cell")), "cell")
      .select(col("q_id"), col("vec_id"))
    val spark = queries.sparkSession
    val qs = quantized(queries, idCol, embCol, model.scale)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq)) // ≤ nQ rows
    val scored = qs.map { case (qid, qv) =>
      val tables = (0 until model.nSub).map { s =>
        val sub = qv.slice(s * model.subDim, (s + 1) * model.subDim)
        model.codebooks(s).map { case (_, cv) =>
          sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
      val dist = (0 until model.nSub).map { s =>
        element_at(array(tables(s).map(lit): _*),
          element_at(col("codes"), s + 1).cast("int") + 1)
      }.reduce(_ + _)
      members.filter(col("q_id") === qid)
        .join(model.codes, "vec_id")
        .select(col("q_id"), col("vec_id").as("n_id"), dist.cast("bigint").as("adist"))
        .orderBy(col("adist").asc, col("n_id")).limit(k)
    }
    scored.reduce(_.unionByName(_))
  }

  /** ADC top-k: per query, the exact integer distance table to every
    * subspace centroid is computed driver-side (nSub·kSub longs) and enters
    * the plan as a literal; a candidate's approximate distance is the sum
    * of its codes' table entries — the corpus scan reads codes only and
    * never shuffles; top-k resolves per query (genuinely top-k-per-group).
    */
  def search(model: Model, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val qs = quantized(queries, idCol, embCol, model.scale)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq)) // ≤ nQ rows
    val perQuery = qs.map { case (qid, qv) =>
      val tables = (0 until model.nSub).map { s =>
        val sub = qv.slice(s * model.subDim, (s + 1) * model.subDim)
        model.codebooks(s).map { case (_, cv) =>
          sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
      val dist = (0 until model.nSub).map { s =>
        element_at(array(tables(s).map(lit): _*),
          element_at(col("codes"), s + 1).cast("int") + 1)
      }.reduce(_ + _)
      model.codes.select(lit(qid).as("q_id"), col("vec_id").as("n_id"),
          dist.cast("bigint").as("adist"))
        .orderBy(col("adist").asc, col("n_id")).limit(k)
    }
    perQuery.reduce(_.unionByName(_))
  }
}
