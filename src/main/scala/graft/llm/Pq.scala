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

  /** Train one codebook per subspace, then encode the corpus. ALL nSub
    * subspace k-means run SIMULTANEOUSLY — one corpus pass per Lloyd step
    * (assign every subspace with per-row expressions, one (sub, cell, pos)
    * grouped mean for every codebook at once) instead of nSub sequential
    * trainings: at 100 TB that is nSub× fewer scans, and at bench scale
    * nSub× fewer job round-trips. Same deterministic integer arithmetic as
    * [[KMeans]] (init = first kSub vectors' slices, floored means, lowest-
    * cell tie-break), so codebooks are engine/rerun-exact. `dim` must
    * divide into `nSub` equal slices.
    */
  def train(corpus: DataFrame, dim: Int, nSub: Int, kSub: Int, iters: Int,
      scale: Int = 4096, idCol: String = "vec_id",
      embCol: String = "embedding"): Model = {
    require(dim % nSub == 0, s"dim $dim must split into $nSub equal subspaces")
    val subDim = dim / nSub
    val q = quantized(corpus, idCol, embCol, scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init: subspace s's codebook = the first kSub vectors'
      // s-slices, numbered 0..kSub-1 in id order (one ≤ kSub-row collect)
      var cents: IndexedSeq[IndexedSeq[(Int, IndexedSeq[Long])]] = {
        val init = graft.engine.GraftSession.boundedCollect(
          q.orderBy("vec_id").limit(kSub), kSub, "pq init")
          .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
        (0 until nSub).map(s => init.zipWithIndex.map { case (qv, i) =>
          (i, qv.slice(s * subDim, (s + 1) * subDim))
        })
      }
      for (_ <- 0 until iters) {
        // one pass: per row, per subspace, the assigned cell; then one
        // (sub, cell, pos) grouped floored mean rebuilds EVERY codebook —
        // ≤ nSub·kSub·subDim rows reach the driver
        val codeCols = (0 until nSub).map(s => codeExpr(s, subDim, cents(s)))
        val assigned = q.select(col("qv"), array(codeCols: _*).as("codes"))
        val meansDf = assigned
          .select(explode(expr(s"transform(sequence(0, ${nSub - 1}), " +
            s"s -> struct(s AS sub, element_at(codes, s + 1) AS cell, " +
            s"slice(qv, s * $subDim + 1, $subDim) AS sv))")).as("e"))
          .select(col("e.sub").as("sub"), col("e.cell").as("cell"),
            posexplode(col("e.sv")).as(Seq("pos", "v")))
          .groupBy("sub", "cell", "pos")
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .withColumn("c", ((col("s") - pmod(col("s"), col("n"))) / col("n")).cast("long"))
          .groupBy("sub", "cell")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
            x => x.getField("c")).as("cv"))
        val means = graft.engine.GraftSession.boundedCollect(
          meansDf, nSub * kSub, "pq step") // ≤ nSub·kSub codebook rows
        val bySub = means.map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toIndexedSeq))
          .groupBy(_._1)
        cents = (0 until nSub).map(s =>
          bySub.getOrElse(s, Array.empty).map(t => (t._2, t._3)).toIndexedSeq.sortBy(_._1))
      }
      val codeCols = (0 until nSub).map(s => codeExpr(s, subDim, cents(s)))
      val codes = q.select(col("vec_id"), array(codeCols: _*).as("codes"))
        .localCheckpoint(true) // materialize off the persisted qv before release
      Model(nSub, subDim, scale, cents, codes)
    } finally {
      q.unpersist()
      ()
    }
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
    val qs = graft.engine.GraftSession.boundedCollect(
      quantized(queries, idCol, embCol, model.scale),
      Similarity.MaxQueryPage, "pq query page")
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq)) // ≤ nQ rows
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
    val qs = graft.engine.GraftSession.boundedCollect(
      quantized(queries, idCol, embCol, model.scale),
      Similarity.MaxQueryPage, "pq query page")
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq)) // ≤ nQ rows
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
