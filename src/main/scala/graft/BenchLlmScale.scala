package graft

import org.apache.spark.sql.functions._

/** Bench-only scale ladder for the dedup/ANN families (SURVEY §2.3): the
  * "never corpus-quadratic" claims measured as curves instead of asserted —
  * deterministic synthetic corpora at 1×/10×/100× an sf0.1-sized base,
  * wall time AND candidate volume per rung.
  *
  * Claims measured:
  *   - LSH banding (`Dedup.minhashLsh`): candidate pairs track the TRUE
  *     duplicate density (engineered at one pair per 8 docs), not |corpus|²
  *     — `cand_per_kdoc` stays flat as N grows 100×, and wall time stays
  *     near-linear (`sec_per_mdoc`).
  *   - IVF probe (`Ivf.search`): a probed search costs the probed FRACTION
  *     of a full scan at every rung — `probe_speedup` (full-probe time over
  *     nProbe=4-of-64 time) holds as the corpus grows, so serving cost
  *     scales with nProbe/nCells, not accumulated corpus size.
  *   - PQ/ADC (`Pq.search`): the codes-only scan is linear in N
  *     (`sec_per_mvec` flat-ish), never quadratic — the memory path of
  *     10⁹-vector search.
  *
  * Synthesis is pure integer hash arithmetic (no RNG) — identical corpora
  * across runs. Emits ONE JSON line:
  * {"lsh":{"<N>":{...}},"ivf":{...},"pq":{...}}
  */
object BenchLlmScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    val base = args.headOption.map(_.toLong).getOrElse(50000L)
    val mults = if (args.length > 1) args(1).split(',').toSeq.map(_.toLong)
      else Seq(1L, 10L, 100L)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- LSH: docs 8k and 8k+1 share a token set (one engineered
    // near-dup pair per 8 docs); all other docs draw 16 tokens from an
    // N-sized vocabulary through xxhash64 (PROPER mixing: a linear
    // congruential draw makes every doc's token set a shifted copy of one
    // base pattern, and set autocorrelation then manufactures whole
    // families of accidental near-dups — measured 30× the engineered pair
    // density before this fix)
    def docs(n: Long) = {
      val baseId = when(pmod(col("id"), lit(8)) <= 1,
        col("id") - pmod(col("id"), lit(8))).otherwise(col("id"))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(15)),
          j => concat(lit("t"), pmod(xxhash64(baseId, j), lit(n))))).as("text"))
    }
    // untimed warm-up: codegen + shuffle machinery, so the first rung's
    // number is the pipeline, not JVM startup
    graft.llm.Dedup.minhashLsh(docs(2000L), dictionary = false)(_.count())
    val lshJson = mults.map { m =>
      val n = base * m
      val d = docs(n)
      val ((cands, _), sec) = timed {
        graft.llm.Dedup.minhashLsh(d, dictionary = false) { est => (est.count(), ()) }
      }
      System.err.println(f"[scale] lsh n=$n cands=$cands sec=$sec%.1f")
      s""""$n":{"sec":${num(sec)},"sec_per_mdoc":${num(sec * 1e6 / n)},"candidates":$cands,"cand_per_kdoc":${num(cands * 1000.0 / n)}}"""
    }.mkString("{", ",", "}")

    // ---- IVF: dim-16 vectors from the same hash family; 64 cells, probe 4
    def vecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => (pmod(col("id") * 2654435761L + d.cast("long") * 40503L, lit(1000L))
          .cast("double") / 1000.0).cast("float")).as("embedding"))
    val ivfJson = mults.map { m =>
      val n = base * m
      val corpus = vecs(n)
      val model = graft.llm.Ivf.train(corpus, nCells = 64, iters = 1)
      model.assigned.count() // materialize the cache untimed
      val queries = vecs(8L)
      graft.llm.Ivf.search(model, queries, k = 10, nProbe = 4).count() // codegen warm
      val (_, secProbe) = timed(
        graft.llm.Ivf.search(model, queries, k = 10, nProbe = 4).count())
      val (_, secFull) = timed(
        graft.llm.Ivf.search(model, queries, k = 10, nProbe = 64).count())
      model.close()
      System.err.println(f"[scale] ivf n=$n probe=$secProbe%.2f full=$secFull%.2f")
      s""""$n":{"sec_probe4":${num(secProbe)},"sec_full64":${num(secFull)},"probe_speedup":${num(secFull / math.max(1e-9, secProbe))}}"""
    }.mkString("{", ",", "}")

    // ---- PQ/ADC: 4 subspaces × 16 centroids over the same vectors
    val pqJson = mults.map { m =>
      val n = base * m
      val corpus = vecs(n)
      val model = graft.llm.Pq.train(corpus, dim = 16, nSub = 4, kSub = 16, iters = 1)
      val queries = vecs(8L)
      graft.llm.Pq.search(model, queries, k = 10).count() // codegen warm
      val (_, sec) = timed(graft.llm.Pq.search(model, queries, k = 10).count())
      model.codes.unpersist()
      System.err.println(f"[scale] pq n=$n sec=$sec%.2f")
      s""""$n":{"sec":${num(sec)},"sec_per_mvec":${num(sec * 1e6 / n)}}"""
    }.mkString("{", ",", "}")

    // ---- positioned-shingle SPAN dedup (`Dedup.duplicateSpans`) and
    // tf-idf pair mining (`TextAnalysis.tfidfPairs`): the two df-cut join
    // families. Their fan-out bound is structural — a shingle/term joins
    // ≤ dfCap/maxDf docs against themselves, so candidate volume is
    // Σ_term df² ≤ maxDf · Σ df, linear in corpus for bounded df — and
    // this leg turns that argument into a measured curve (sec_per_mdoc
    // flat-ish, result volume tracking the engineered dup density).
    // Same corpus generator as LSH: docs 8k/8k+1 are identical (maximal
    // spans + maximal dot), everything else draws from an N-sized vocab.
    graft.llm.Dedup.duplicateSpans(docs(2000L), k = 5, dfCap = 8, topN = 50)
      .count() // untimed warm-up
    val spanJson = mults.map { m =>
      val n = base * m
      val (rows, sec) = timed(
        graft.llm.Dedup.duplicateSpans(docs(n), k = 5, dfCap = 8, topN = 50)
          .count())
      System.err.println(f"[scale] span n=$n rows=$rows sec=$sec%.1f")
      s""""$n":{"sec":${num(sec)},"sec_per_mdoc":${num(sec * 1e6 / n)},"top_rows":$rows}"""
    }.mkString("{", ",", "}")

    graft.llm.TextAnalysis.tfidfPairs(docs(2000L), minDot = 1L, maxDf = 8L)
      .count() // untimed warm-up
    val tfidfJson = mults.map { m =>
      val n = base * m
      val (pairs, sec) = timed(
        graft.llm.TextAnalysis.tfidfPairs(docs(n), minDot = 1L, maxDf = 8L)
          .count())
      System.err.println(f"[scale] tfidf n=$n pairs=$pairs sec=$sec%.1f")
      s""""$n":{"sec":${num(sec)},"sec_per_mdoc":${num(sec * 1e6 / n)},"pairs":$pairs,"pairs_per_kdoc":${num(pairs * 1000.0 / n)}}"""
    }.mkString("{", ",", "}")

    println(s"""{"base":$base,"lsh":$lshJson,"ivf":$ivfJson,"pq":$pqJson,""" +
      s""""span":$spanJson,"tfidf":$tfidfJson}""")
    spark.stop()
  }
}
