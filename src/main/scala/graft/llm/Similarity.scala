package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity operators (north-star surface, SURVEY §2.3
  * Q82/Q83/Q89). The kernels are pure Catalyst higher-order functions
  * (`zip_with` + `aggregate`) — whole-stage-codegen'd, no UDF, sequential
  * left-fold accumulation in double (bit-identical to DuckDB's
  * `list_dot_product`, which the oracles use).
  *
  * Scale path: brute-force top-k is a single broadcast-join + per-partition
  * TakeOrdered (no shuffle of the corpus); the LSH variant buckets vectors
  * by random-hyperplane signs so candidate generation is an equi-join on the
  * bucket key — the standard sub-linear ANN layout for 10⁸+ vectors.
  */
object Similarity {

  /** Hard ceiling on a driver-resident QUERY PAGE (the probe/rerank side of
    * a search — never the corpus): retrieval pages are serving-sized by
    * contract, and collecting past this is a corpus-sized frame on the
    * wrong side of the join. Enforced via
    * [[graft.engine.GraftSession.boundedCollect]].
    */
  private[graft] val MaxQueryPage = 65536

  /** float[] → double[] view (embeddings are list<float>). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an embedding column (double view, sequential fold). */
  def l2Norm(emb: Column): Column = {
    val d = asDouble(emb)
    sqrt(dotD(d, d))
  }

  /** L2-normalizes an embedding column to unit length — the standard prep
    * before dot-product-as-cosine ANN, LSH bucketing or quantization. Pure
    * higher-order functions (one fold + one transform), codegen'd, and the
    * per-element division is a single IEEE op — any engine normalizing the
    * same floats produces bit-identical unit vectors (q82b pins this).
    * Zero vectors pass through unchanged instead of dividing by zero.
    */
  def normalize(emb: Column): Column = {
    val d = asDouble(emb)
    val n = l2Norm(emb)
    when(n === 0.0, d).otherwise(transform(d, x => x / n))
  }

  /** Cosine via the native codegen expression (one fused loop; see
    * graft.functions.CosineSimilarity). [[cosineHof]] is the pure-builtin
    * formulation — bit-identical results, kept as the composition reference.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  def cosineHof(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dotD(ad, bd) / (sqrt(dotD(ad, ad)) * sqrt(dotD(bd, bd)))
  }

  /** Cosine of every row's `embCol` against one query vector frame
    * (single row, column `qe`) — broadcast, so the corpus never shuffles.
    */
  def cosineAll(corpus: DataFrame, query: DataFrame, embCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    corpus.crossJoin(broadcast(query))
      .withColumn("cos", cosine(col(embCol), col("qe")))
  }

  /** Brute-force ANN: top-k neighbors per query vector, deterministic order
    * by (rounded cosine DESC, id). Ranking on the rounded decimal makes ties
    * well-defined (SURVEY Q83).
    */
  def annBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("qe"))
    val scored = corpus.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(embCol), col("qe")).cast("decimal(38,4)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col(idCol).as("n_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes for LSH bucketing: plane p,
    * dim d ↦ a fixed hash-derived weight in [-1, 1). No RNG state — the
    * same planes on every executor and every run. Public: the t2 oracle
    * embeds these exact values as SQL literals (shortest-round-trip double
    * formatting parses back to the identical bits), so bucket signatures
    * agree bit-for-bit across engines.
    */
  def planeWeight(p: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((p, d))
    (h.toDouble / Int.MaxValue)
  }

  /** Random-hyperplane LSH bucket key: sign-bit signature of `nPlanes`
    * projections packed into a long. Vectors in the same bucket are cosine-
    * close with high probability; candidate generation is then an equi-join
    * on `bucket` (scales linearly, vs the quadratic cross join).
    */
  def lshBucket(emb: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val weights = array((0 until dim).map(d => lit(planeWeight(p, d))): _*)
      when(dotD(asDouble(emb), weights) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine only within matching buckets. Recall is
    * tunable via nPlanes (fewer planes → bigger buckets → higher recall).
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, nPlanes: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.withColumn("bucket", lshBucket(col(embCol), dim, nPlanes))
    val qb = queries.select(col(idCol).as("q_id"), col(embCol).as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), dim, nPlanes))
    val scored = cb.join(broadcast(qb), "bucket")
      .withColumn("cos", cosine(col(embCol), col("qe")).cast("decimal(38,4)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col(idCol).as("n_id"), col("cos"))
  }

  /** Johnson–Lindenstrauss random projection: maps `dim`-d embeddings onto
    * `outDim` deterministic hash-derived hyperplanes (the same
    * [[planeWeight]] planes LSH buckets with — here the full dot product is
    * kept instead of just its sign). JL's lemma says pairwise distances are
    * preserved within (1±ε) at outDim = O(log n / ε²), so the projected
    * vectors are a drop-in cheaper substrate for clustering / coarse ANN:
    * at 100 TB this is the pass that turns 64–4096-d float corpora into
    * 8–32-d sketches BEFORE any pairwise work, shrinking every downstream
    * shuffle by dim/outDim. Pure per-row HOF arithmetic (zero shuffle,
    * whole-stage codegen); no RNG state — identical planes on every
    * executor, every run, and in the oracle, which embeds the same weights
    * as SQL literals (shortest-round-trip doubles parse to identical bits).
    * Output: one row per (id, plane j) with the projection floor-quantized
    * at 1e4 (floor of an exactly-computed double is engine-identical).
    */
  def randomProject(vectors: DataFrame, outDim: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val d = asDouble(col(embCol))
    val projs = array((0 until outDim).map { p =>
      val w = array((0 until dim).map(i => lit(planeWeight(p, i))): _*)
      dotD(d, w)
    }: _*)
    vectors.select(col(idCol), posexplode(projs).as(Seq("j", "pj")))
      .select(col(idCol), col("j").cast("bigint").as("j"),
        floor(col("pj") * 10000).cast("bigint").as("proj_q"))
  }

  /** Coarse-to-fine ANN (the serving-system rerank shape): stage 1 scores
    * every corpus vector against each query in the cheap [[randomProject]]
    * subspace (outDim ≪ dim — dim/outDim less arithmetic per pair; at 10⁹
    * vectors this is the scan pass a quantized/compressed index answers),
    * keeps the top `coarseK` per query, then stage 2 recomputes EXACT
    * full-dimension cosine on those candidates only and returns the top
    * `k`. Recall is tunable via coarseK (JL distance distortion shrinks as
    * outDim grows); determinism is total — both stages rank on quantized
    * DECIMAL(38,4) scores with id tiebreaks, so the oracle replays the
    * identical two-stage pipeline from the same plane literals. Corpus is
    * never shuffled: queries broadcast into both stages.
    */
  def annCoarseRerank(corpus: DataFrame, queries: DataFrame, k: Int,
      coarseK: Int, outDim: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    def proj(e: Column): Column = array((0 until outDim).map { p =>
      val w = array((0 until dim).map(i => lit(planeWeight(p, i))): _*)
      dotD(asDouble(e), w)
    }: _*)
    val c = corpus.select(col(idCol), col(embCol), proj(col(embCol)).as("pv"))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("qe"),
      proj(col(embCol)).as("pq"))
    val coarse = c.crossJoin(broadcast(q))
      .withColumn("cd", dotD(col("pv"), col("pq")).cast("decimal(38,4)"))
    val wCoarse = Window.partitionBy(col("q_id")).orderBy(col("cd").desc, col(idCol))
    val cand = coarse.withColumn("__crn", row_number().over(wCoarse))
      .filter(col("__crn") <= coarseK)
    val scored = cand.withColumn("cos", cosineHof(col(embCol), col("qe")).cast("decimal(38,4)"))
    val wFine = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(wFine)).filter(col("__rn") <= k)
      .select(col("q_id"), col(idCol).as("n_id"), col("cos"))
  }

  /** Symmetric int8 quantization profile — the vector-DB compression pass
    * (4× over float32) with an engine-reproducible contract: codes are
    * `floor(x·127 / absmax)` in IEEE double (multiply, divide, floor are
    * all correctly-rounded, so both engines produce identical integers —
    * never round-half, which splits up/even across engines). Emits the
    * floor-quantized scale plus exact-integer code aggregates (sum,
    * position-weighted sum, min, max) — the checksum view a migration
    * validates against, element order pinned by the weighted sum. Pure
    * per-row array arithmetic; zero-vector rows quantize to all-zero codes.
    */
  def quantizeInt8Profile(vectors: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val d = asDouble(col(embCol))
    val absmax = array_max(transform(d, x => abs(x)))
    val codes = when(absmax === 0.0, transform(d, _ => lit(0L)))
      .otherwise(transform(d, x => floor(x * 127.0 / absmax).cast("long")))
    vectors.select(
      col(idCol),
      floor(absmax * 10000).cast("bigint").as("scale_q"),
      aggregate(codes, lit(0L), (acc, x) => acc + x).as("code_sum"),
      aggregate(
        zip_with(codes, sequence(lit(0L), size(col(embCol)).cast("long") - 1),
          (c, i) => c * i),
        lit(0L), (acc, x) => acc + x).as("code_wsum"),
      array_min(codes).cast("bigint").as("code_min"),
      array_max(codes).cast("bigint").as("code_max"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor, the top-k most-similar corpus vectors with a DIFFERENT label
    * (similar-but-wrong examples are what metric-learning losses need;
    * same-label rows — including the anchor itself — are excluded by the
    * label predicate). Same shape and determinism contract as
    * [[annBruteForce]]: anchors broadcast, the corpus never shuffles,
    * ranking on quantized DECIMAL(38,4) cosine with id tiebreak. The scale
    * path swaps the scan for any of the index variants (LSH/IVF/PQ) with
    * the label filter applied to candidates.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = anchors.select(col(idCol).as("q_id"), col(embCol).as("qe"),
      col(labelCol).as("q_label"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col(labelCol) =!= col("q_label"))
      .withColumn("cos", cosine(col(embCol), col("qe")).cast("decimal(38,4)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col(idCol).as("n_id"), col("cos"))
  }

  /** ANN recall evaluation — the index-quality monitor a serving system
    * runs continuously (an approximate index silently degrades as the
    * corpus drifts; recall against exact ground truth is THE metric):
    * per query, how many of the exact brute-force top-`k` does the
    * LSH-bucketed path ([[annLsh]]) retrieve? Both sides rank on the same
    * quantized DECIMAL(38,4) cosine with id tiebreaks, so the hit sets —
    * and therefore the recall integers — are engine-exact. Output per
    * query: n_hits, k, recall_x1000 = (n_hits·1000) DIV k; queries whose
    * bucket contains none of the true neighbors report 0, not absence.
    *
    * Scale shape: ground truth is the brute pass (run on a SAMPLE of
    * queries at scale — recall estimation doesn't need every query);
    * the comparison itself is a (q_id, n_id) equi-semi-join + grouped
    * count, nothing pairwise beyond the k·|queries| frames.
    */
  def annRecall(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nPlanes: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val truth = annBruteForce(corpus, queries, k, idCol, embCol)
      .select(col("q_id"), col("n_id"))
    val approx = annLsh(corpus, queries, k, dim, nPlanes, idCol, embCol)
      .select(col("q_id"), col("n_id"))
    val hits = truth.join(approx, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("h"))
    queries.select(col(idCol).as("q_id"))
      .join(broadcast(hits), Seq("q_id"), "left")
      .withColumn("n_hits", coalesce(col("h"), lit(0L)))
      .select(col("q_id"), col("n_hits").cast("bigint").as("n_hits"),
        lit(k.toLong).as("k"),
        expr(s"(n_hits * 1000) DIV $k").cast("bigint").as("recall_x1000"))
  }

  /** Dimension-truncation recall — the serving question matryoshka-style
    * embeddings pose ("can I rank with the first 16 of 64 dims and rerank
    * the rest?"): per query, how many of the full-dimension exact top-`k`
    * does ranking on the TRUNCATED prefix retrieve? Same exact machinery
    * as [[annRecall]] (quantized cosine, id tiebreaks, engine-exact hit
    * sets); the answer calibrates how much of the corpus a prefix-index
    * can serve before the full-vector rerank.
    */
  def truncationRecall(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    def trunc(df: DataFrame) = df.withColumn("__emb", slice(col(embCol), 1, dims))
    val truth = annBruteForce(corpus, queries, k, idCol, embCol)
      .select(col("q_id"), col("n_id"))
    val approx = annBruteForce(trunc(corpus), trunc(queries), k, idCol, "__emb")
      .select(col("q_id"), col("n_id"))
    val hits = truth.join(approx, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("h"))
    queries.select(col(idCol).as("q_id"))
      .join(broadcast(hits), Seq("q_id"), "left")
      .withColumn("n_hits", coalesce(col("h"), lit(0L)))
      .select(col("q_id"), col("n_hits").cast("bigint").as("n_hits"),
        lit(k.toLong).as("k"),
        expr(s"(n_hits * 1000) DIV $k").cast("bigint").as("recall_x1000"))
  }

  /** Mutual k-nearest-neighbor graph over an embedding corpus — the
    * backbone of graph-based corpus curation (kNN-graph clustering, label
    * propagation, density-based outlier pruning): an undirected edge (i, j)
    * exists iff j is in i's top-`k` AND i is in j's top-`k` — the mutuality
    * filter is what kills hub nodes (high-degree vectors that are "near"
    * everything and would otherwise glue unrelated clusters).
    *
    * Ranking is quantized DECIMAL(38,4) cosine with id tiebreaks, so any
    * engine replays the identical neighbor lists. Pair generation here is
    * brute-force with the corpus broadcast into its self-join (the caller
    * bounds the corpus — this is the oracle-checkable baseline); the 100 TB
    * path swaps pair generation for index candidates ([[Ivf.search]] /
    * [[annLsh]] buckets) and keeps the mutuality join — edges meet on the
    * (i, j) equi-key either way.
    */
  /** Per-vector top-`k` neighbor frame (i, j, cos) over the bounded
    * broadcast self-join — the ONE candidate-generation implementation
    * [[mutualKnnGraph]] and [[knnOutliers]] both rank from (quantized
    * DECIMAL(38,4) cosine, id tiebreaks); the scale path swaps this for
    * index candidates and both consumers inherit it.
    */
  private def knnCandidates(corpus: DataFrame, k: Int,
      idCol: String, embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("i"), col(embCol).as("ea"))
    val b = corpus.select(col(idCol).as("j"), col(embCol).as("eb"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("i") =!= col("j"))
      .withColumn("cos", cosine(col("ea"), col("eb")).cast("decimal(38,4)"))
    val w = Window.partitionBy("i").orderBy(col("cos").desc, col("j"))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("i"), col("j"), col("cos"))
  }

  def mutualKnnGraph(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val knn = knnCandidates(corpus, k, idCol, embCol)
    val fwd = knn.filter(col("i") < col("j"))
    val rev = knn.filter(col("i") > col("j")).select(col("j").as("i"), col("i").as("j"))
    fwd.join(rev, Seq("i", "j"), "left_semi")
      .select(col("i"), col("j"), col("cos").cast("string").as("cos"))
  }

  /** kNN-density outlier scoring — the embedding-space junk pruner (OCR
    * noise, mojibake, wrong-modality rows embed far from EVERYTHING; a
    * label-prototype check like [[labelPrototypes]] misses them when the
    * junk has no meaningful label): per vector, density = the SUM of its
    * top-`k` quantized cosines (exact DECIMAL addition — a mean would
    * divide; the sum ranks identically and stays engine-exact), lowest
    * `bottomN` densities = the isolates to prune. Same bounded
    * broadcast-self-join candidate generation as [[mutualKnnGraph]]; index
    * candidates at scale.
    */
  def knnOutliers(corpus: DataFrame, k: Int, bottomN: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    knnCandidates(corpus, k, idCol, embCol)
      .groupBy(col("i").as("vec_id"))
      .agg(sum(col("cos")).cast("decimal(38,4)").as("density"))
      .orderBy(col("density").asc, col("vec_id"))
      .limit(bottomN)
      .select(col("vec_id"), col("density").cast("string").as("density"))

  /** Per-label prototype vectors + cohesion — the embedding-space health
    * check a labeled corpus gets before training (drifting or bimodal
    * classes show up as inflated inertia): prototype = the floored
    * per-dimension mean of the label's `scale`-quantized members (the same
    * mode-free floor as the Lloyd step, so any engine computes the
    * identical integer centroid), cohesion = the exact integer squared
    * distance sum to the prototype. Output per label: member count, the
    * prototype's component sum (its checksum) and the inertia — all exact
    * BIGINTs.
    *
    * Scale shape: one (label, pos) grouped sum (map-side combinable,
    * ≤ labels·dim rows), one equi-join of the corpus back to the
    * label-sized prototype frame, one grouped sum. Nothing pairwise.
    */
  /** Per-(key, dimension) floored mean of the `scale`-quantized vectors —
    * the ONE implementation of the mode-free Lloyd floor (exact on
    * negative odd sums) that [[labelPrototypes]] and [[centroidDrift]]
    * both aggregate from; output (__k, pos, m).
    */
  private def flooredDimMeans(corpus: DataFrame, keyCol: Column, scale: Int,
      embCol: String): DataFrame =
    corpus.select(keyCol.as("__k"), KMeans.quantize(col(embCol), scale).as("qv"))
      .select(col("__k"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("__k", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", ((col("s") - pmod(col("s"), col("n"))) / col("n")).cast("long"))

  def labelPrototypes(corpus: DataFrame, scale: Int = 4096,
      embCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val q = corpus.select(col(labelCol).as("label"),
      KMeans.quantize(col(embCol), scale).as("qv"))
    val proto = flooredDimMeans(corpus, col(labelCol), scale, embCol)
      .select(col("__k").as("label"), col("pos"), col("m").as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))
    q.join(broadcast(proto), "label")
      .withColumn("d2", KMeans.dist2(col("qv"), col("cv")))
      .groupBy(col("label").cast("bigint").as("label"))
      .agg(count(lit(1)).as("n"),
        first(aggregate(col("cv"), lit(0L), (acc, x) => acc + x)).as("proto_sum"),
        sum(col("d2")).cast("bigint").as("inertia"))
  }

  /** Embedding centroid drift between two corpus partitions — the ML-ops
    * monitor for "did the embedding distribution move" (model version
    * change, upstream content shift, a broken encoder): per-dimension
    * floored means of the `scale`-quantized vectors in each partition
    * (the same mode-free Lloyd floor as [[labelPrototypes]], exact on
    * negative odd sums), drift = the exact integer L1 distance between
    * the two mean vectors. Zero drift on identical distributions; a
    * single shifted dimension shows up undiluted (L2 would square-mix it).
    *
    * Shape: one (partition, pos) grouped sum — map-side combinable,
    * ≤ 2·dim rows out — then a dim-sized self-join. Nothing pairwise.
    */
  def centroidDrift(corpus: DataFrame, partCol: Column, scale: Int = 4096,
      embCol: String = "embedding"): DataFrame = {
    val means = flooredDimMeans(corpus, partCol.cast("int"), scale, embCol)
    val a = means.filter(col("__k") === 0).select(col("pos"), col("m").as("ma"))
    val b = means.filter(col("__k") === 1).select(col("pos"), col("m").as("mb"))
    val counts = corpus.select(partCol.cast("int").as("half")).agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).cast("bigint").as("n_a"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).cast("bigint").as("n_b"))
    // coalesce: with an EMPTY partition (monitor ran before any "after"
    // data) the dim join is empty and the sums would be null — report
    // dims = 0, drift = 0 and let the caller read n_a/n_b, instead of an
    // NPE-shaped null row
    a.join(b, "pos")
      .agg(count(lit(1)).cast("bigint").as("dims"),
        coalesce(sum(abs(col("ma") - col("mb"))), lit(0L))
          .cast("bigint").as("l1_drift"))
      .crossJoin(broadcast(counts))
      .select(col("n_a"), col("n_b"), col("dims"), col("l1_drift"))
  }

  /** Maximal-marginal-relevance diversified top-k — the serving-side rerank
    * that trades raw relevance for coverage (RAG context assembly, dedup of
    * near-identical hits): greedily pick
    * argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ = lamX10/10
    * cross-multiplied into integers so every score is exact DECIMAL(38,4)
    * arithmetic over the quantized cosines (ties to the lowest id; the
    * empty-selection max-sim is 0, so step 1 is the pure relevance argmax).
    *
    * Distribution: the heavy work — scoring the corpus against the query
    * and the candidate×candidate similarity matrix — is Spark (corpus never
    * shuffles; the candidate frame broadcasts into its self-join). The
    * greedy loop itself runs on the driver over ≤ candK·candK quantized
    * sims (the bounded-model-state rule: candK is a serving-sized rerank
    * window, not a corpus fraction), exactly as an application server would
    * run MMR over one retrieval page. Output: (step, vec_id, score) in
    * selection order — score is the exact MMR objective at pick time.
    */
  def mmrSelect(corpus: DataFrame, query: DataFrame, candK: Int, selectK: Int,
      lamX10: Int = 7, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(selectK <= candK && lamX10 >= 0 && lamX10 <= 10,
      "selectK must be <= candK, lamX10 in [0, 10]")
    val spark = corpus.sparkSession
    val cand = annBruteForce(corpus, query, candK, idCol, embCol)
      .select(col("n_id").as("vec_id"), col("cos").as("rel"))
    val cvecs = cand.join(corpus.select(col(idCol).as("vec_id"), col(embCol)), "vec_id")
    val sims = cvecs.as("a")
      .join(broadcast(cvecs.as("b")), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        cosineHof(col(s"a.$embCol"), col(s"b.$embCol")).cast("decimal(38,4)").as("sim"))
    // ≤ candK rows + ≤ candK² sims: the one retrieval page, driver-local
    val rel = graft.engine.GraftSession.boundedCollect(cand, candK, "mmr page")
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val sim = graft.engine.GraftSession
      .boundedCollect(sims, candK * candK, "mmr sims")
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    val lam = java.math.BigDecimal.valueOf(lamX10.toLong)
    val oneMinusLam = java.math.BigDecimal.valueOf(10L - lamX10)
    val zero = java.math.BigDecimal.ZERO.setScale(4)
    val ord = Ordering.ordered[java.math.BigDecimal]
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, java.math.BigDecimal)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ rel.keys
    // a corpus smaller than selectK exhausts the page early — stop, don't throw
    for (step <- 1 to selectK if remaining.nonEmpty) {
      // λ stays integer by ×10-ing both terms; the objective ORDER (and
      // therefore the selection) is unchanged, and scale-4 decimals stay
      // scale-4 — the oracle replays this exact expression
      val scoredCands = remaining.toSeq.map { d =>
        val maxSim =
          if (selected.isEmpty) zero
          else selected.map(s => sim((d, s._2))).max(ord)
        (d, lam.multiply(rel(d)).subtract(oneMinusLam.multiply(maxSim)))
      }
      // remaining iterates ascending, so strict > keeps the lowest id on ties
      val best = scoredCands.reduceLeft { (a, b) =>
        if (ord.compare(b._2, a._2) > 0) b else a
      }
      selected += ((step, best._1, best._2))
      remaining -= best._1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DataTypes.createDecimalType(38, 4))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        selected.toSeq.map { case (st, id, sc) =>
          org.apache.spark.sql.Row(st.toLong, id, sc)
        }, 1),
      schema)
  }
}
