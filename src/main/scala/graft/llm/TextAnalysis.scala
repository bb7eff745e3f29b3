package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north star):
  * tokenization, token frequency, quality scoring, language-ID heuristic,
  * document fingerprinting, token counting. All pure Catalyst expressions —
  * codegen'd, no UDFs, every aggregate map-side-combinable.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Global token frequency, top-N by (count DESC, word) — partial
    * aggregation before the shuffle, TakeOrdered for the cap.
    */
  def tokenFrequency(docs: DataFrame, topN: Int, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(topN)

  /** A small function-word list used by the quality score's stopword ratio
    * (matches the synthetic corpus vocabulary).
    */
  val Stopwords: Seq[String] = Seq("a", "the", "of", "and", "to", "in")

  /** Per-document quality signals: char count, token count, average token
    * length, stopword ratio, BPE-ish subword estimate (≈ chars/4).
    */
  def quality(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nChars = length(col(textCol))
    val stopHits = size(filter(t, x => x.isInCollection(Stopwords)))
    docs.select(
      col(idCol).as("doc_id"),
      nChars.cast("bigint").as("chars"),
      nTok.cast("bigint").as("tokens"),
      ((nChars - (nTok - lit(1))) / nTok).cast("decimal(38,4)").as("avg_tok_len"),
      (stopHits / nTok).cast("decimal(38,4)").as("stop_ratio"),
      ceil(nChars / lit(4.0)).cast("bigint").as("est_bpe_tokens"))
  }

  /** Character-bigram profiles for the language-ID heuristic. Toy-sized on
    * purpose — the operator shape (profile scoring + argmax) is the real
    * n-gram language-ID algorithm; profiles would be learned at scale.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "an"),
    "de" -> Seq("ch", "ei", "er"),
    "fr" -> Seq("le", "ou", "es"),
    "es" -> Seq("os", "ar", "la"))

  /** Occurrences of a substring via length arithmetic (expressible in any
    * SQL dialect — the oracle uses the identical formula).
    */
  def occurrences(text: Column, sub: String): Column =
    (length(text) - length(replace(text, lit(sub), lit("")))) / sub.length

  /** n-gram heuristic language guess: argmax of profile scores, first-listed
    * profile wins ties (deterministic).
    */
  def langGuess(text: Column): Column = {
    val scores = LangProfiles.map { case (lang, grams) =>
      lang -> grams.map(g => occurrences(text, g)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => when(a >= b, a).otherwise(b))
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Order-sensitive rolling document fingerprint: Σ pos·(31·len(tok) +
    * ascii(tok[0])). Token order matters (unlike bag-of-words hashes), the
    * arithmetic is exact BIGINT, and the same formula runs on any engine.
    * Scale twin: xxhash64 over the concatenated stream per partition.
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .groupBy("doc_id")
      .agg(sum((col("pos") + 1) *
        (length(col("tok")) * 31 + ascii(col("tok")))).cast("bigint").as("fp"))

  /** Within-document repetition (a Gopher-style quality filter): the share
    * of word n-gram occurrences that are repeats of an earlier n-gram in
    * the same document — `1 − distinct/total`. High values flag boilerplate
    * and degenerate generations. One explode + one grouped aggregation;
    * every aggregate map-side-combinable.
    */
  def repetitionRatio(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.shingles(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), n)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("total_ngrams"),
        countDistinct(col("sh")).cast("bigint").as("distinct_ngrams"))
      .withColumn("rep_ratio",
        (lit(1.0) - col("distinct_ngrams") / col("total_ngrams")).cast("decimal(38,4)"))

  /** Deterministic train/val/test assignment: a multiplicative hash of the
    * id into [0, 100), thresholded by the cumulative percentages. Pure
    * integer arithmetic (Knuth's 2654435761 multiplier, then a 16-bit
    * right-shift so the bucket draws on mixed HIGH bits — `(id*K) % 100`
    * alone is a bijection of `id % 100` and degenerates on strided id
    * spaces). Any engine computes the identical split, so the partition is
    * reproducible across reruns and engines without storing membership.
    * Contract: non-negative ids below 2^31 (no i64 overflow in id*K).
    */
  val SplitMultiplier = 2654435761L
  /** `((id * K) >> 16) % 100` as a Column — shared by split and sampling. */
  def splitHash(id: Column): Column =
    pmod(shiftright(id * SplitMultiplier, 16), lit(100))
  /** The same hash as an SQL fragment — the ONE copy every split-family
    * oracle embeds, so the oracles can never diverge from [[splitHash]].
    */
  def splitHashSql(idExpr: String): String =
    s"((($idExpr * $SplitMultiplier) >> 16) % 100)"
  def deterministicSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10,
      idCol: String = "doc_id"): DataFrame = {
    val h = splitHash(col(idCol))
    docs.withColumn("split",
      when(h < trainPct, "train").when(h < trainPct + valPct, "val").otherwise("test"))
  }

  /** BPE-style pre-tokenization: alphanumeric runs and single punctuation
    * marks, the split a byte-pair tokenizer sees before merges (a portable
    * `[a-z0-9]` regex so any engine extracts identical pre-tokens). Counts
    * approximate real tokenizer token counts far better than whitespace
    * splits on punctuation-heavy text.
    */
  val PreTokenRe = "[a-z0-9]+|[^a-z0-9 ]"
  def preTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PreTokenRe), lit(0))).cast("bigint")

  /** PII scrubbing: redact email-like and phone-like spans, reporting per-doc
    * redaction counts. Patterns use only portable character classes
    * (`[0-9]`, `[a-z]`) so any regex engine matches identically; a real
    * deployment swaps in its full pattern set — the operator shape (count +
    * chained replace, one narrow projection) is the 100 TB-relevant part.
    */
  val EmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"
  def scrubPii(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).cast("bigint").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("bigint").as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"))

  /** Stratified deterministic downsampling: per-stratum keep-fractions
    * applied through the same multiplicative id hash as
    * [[deterministicSplit]] — class rebalancing that is reproducible across
    * engines and reruns with no RNG state, and a pushdown-friendly filter
    * (no shuffle, no sampling operator).
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, keepPct: Map[String, Int],
      defaultPct: Int = 100, idCol: String = "doc_id"): DataFrame = {
    val h = splitHash(col(idCol))
    val pct = keepPct.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    docs.filter(h < pct)
  }

  /** Deterministic epoch shuffle — the training-order stage between
    * curation and the data loader: each epoch's seed yields a fresh
    * pseudorandom permutation of the corpus, materialized as `nShards`
    * shard files each internally ordered. No RNG state: shard and position
    * fall out of a seeded multiplicative hash
    * (`(id·K + seed·40503) mod 1000000007`), so any engine, rerun or
    * partitioning reproduces the identical epoch order, and a resumed job
    * re-derives where it was without a stored permutation.
    *
    * Scale shape: the within-shard `row_number` window partitions by shard
    * (never global) — exactly the sort a shard writer pays anyway; the
    * corpus is hash-scattered across shards so every sort is 1/nShards of
    * the data. Same id contract as [[splitHash]]: non-negative, < 2^31.
    * Seeds are bounded too (0 ≤ seed < 8·10^13): id·K alone reaches
    * ~5.7·10^18, so a larger seed·40503 term would overflow int64 —
    * silently wrapping on non-ANSI Spark while erroring on engines that
    * check, breaking the any-engine-identical-order contract. Epoch
    * numbers (the intended seed) are nowhere near the bound; a
    * hash-derived seed must be reduced below it first.
    * Returns (idCol, shard, pos) — pos is the 1-based order within shard.
    */
  def epochShuffle(docs: DataFrame, seed: Long, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(seed >= 0L && seed < 80000000000000L,
      s"seed $seed outside [0, 8e13): seed*40503 + id*$SplitMultiplier must stay in int64")
    val h = pmod(col(idCol) * SplitMultiplier + lit(seed) * lit(40503L),
      lit(1000000007L))
    docs.select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("bigint"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__h"), col(idCol))).cast("bigint"))
      .drop("__h")
  }
  /** The same epoch hash as an SQL fragment (the one copy oracles embed). */
  def epochShuffleSql(idExpr: String, seed: Long): String =
    s"(($idExpr * $SplitMultiplier + $seed * 40503) % 1000000007)"

  /** Unigram concentration per document, exact integers: occurrence count,
    * type count, and Σ cnt² — the Simpson/Gini numerator, so repeated-token
    * mass needs no float division (1 − Σcnt²/n² is derivable downstream).
    * Complements [[repetitionRatio]] (n-gram repeats) with single-token
    * concentration: "the the the ..." maxes Σcnt² while its 3-gram set can
    * still look diverse. Two grouped counts, both map-side combinable.
    */
  def tokenDiversity(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("bigint").as("n_tokens"),
        count(lit(1)).cast("bigint").as("n_types"),
        sum(col("cnt") * col("cnt")).cast("bigint").as("sum_cnt2"))

  /** Target-mix rebalancing (data-mix curation): keep exactly `scale · w_s`
    * documents of stratum s, where the integer weights `w_s` state the
    * desired ratio and `scale = min_s floor(cnt_s / w_s)` is the largest
    * multiple the corpus supports — the output realizes the target mix
    * EXACTLY, bottlenecked by the scarcest stratum. Strata not listed are
    * dropped. Selection is deterministic (per stratum, smallest
    * ([[splitHash]], id) first), so the sample is reproducible across
    * engines and reruns. Two bounded side-frames (per-stratum counts, the
    * scalar scale) broadcast back; the per-stratum rank is a window over
    * the stratum — strata counts are bounded (sources, languages), and a
    * degenerate single giant stratum would swap in the
    * [[graft.engine.Ranking.prefixSum]] pattern unchanged.
    */
  def mixSample(docs: DataFrame, strataCol: String, weights: Map[String, Int],
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val spark = docs.sparkSession
    val w = spark.createDataFrame(weights.toSeq).toDF(strataCol, "__w")
    val withW = docs.join(broadcast(w), strataCol)
    val counts = withW.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__cnt"), min(col("__w")).as("__wt"))
    val scale = counts.agg(
      min(floor(col("__cnt") / col("__wt")).cast("long")).as("__scale"))
    val keep = counts.crossJoin(broadcast(scale))
      .select(col(strataCol), (col("__scale") * col("__wt")).as("__keep"))
    val rn = row_number().over(
      Window.partitionBy(col(strataCol)).orderBy(splitHash(col(idCol)), col(idCol)))
    withW.withColumn("__rn", rn)
      .join(broadcast(keep), strataCol)
      .filter(col("__rn") <= col("__keep"))
      .drop("__rn", "__keep", "__w")
  }

  /** Exact integer square root floor(√x) as a Column: double-sqrt estimate
    * then a ±1 correction pass — exact for every x in [0, 2^62) (the
    * double estimate is within one of the truth there, and the correction
    * squares stay inside int64). No float reaches the result.
    */
  private def isqrt(x: Column): Column = {
    val f = floor(sqrt(x.cast("double"))).cast("long")
    val up = when((f + 1) * (f + 1) <= x, f + 1).otherwise(f)
    when(up * up > x, up - 1).otherwise(up)
  }

  /** The same exact isqrt as a SQL fragment (for oracle replay). */
  def isqrtSql(xExpr: String): String = {
    val f = s"CAST(floor(sqrt(CAST(($xExpr) AS DOUBLE))) AS BIGINT)"
    val up = s"(CASE WHEN ($f + 1) * ($f + 1) <= ($xExpr) THEN $f + 1 ELSE $f END)"
    s"(CASE WHEN $up * $up > ($xExpr) THEN $up - 1 ELSE $up END)"
  }

  /** Temperature-flattened mixture sampling at T = 2 — the multilingual-
    * pretraining rebalance (sampling share ∝ cnt^(1/T) instead of ∝ cnt,
    * so head languages/sources stop drowning the tail without the tail
    * being oversampled): per-stratum weight w_s = isqrt(cnt_s), realized
    * sample keep_s = scale · w_s with scale = min_s floor(cnt_s / w_s)
    * (the largest multiple no stratum oversamples — [[mixSample]]'s
    * bottleneck rule with data-derived weights). T = 2 because √ is the
    * one fractional power with an EXACT integer form ([[isqrt]]); other
    * temperatures need float powers both engines would round differently.
    * Selection is deterministic (smallest ([[splitHash]], id) first), so
    * kept COUNTS and kept IDS replay exactly.
    */
  def mixTemperature(docs: DataFrame, strataCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__wt", isqrt(col("__cnt")))
    val scale = counts.agg(
      min(expr("__cnt DIV __wt")).cast("long").as("__scale"))
    val keep = counts.crossJoin(broadcast(scale))
      .select(col(strataCol), (col("__scale") * col("__wt")).as("__keep"))
    val rn = row_number().over(
      Window.partitionBy(col(strataCol)).orderBy(splitHash(col(idCol)), col(idCol)))
    docs.withColumn("__rn", rn)
      .join(broadcast(keep), strataCol)
      .filter(col("__rn") <= col("__keep"))
      .drop("__rn", "__keep")
  }

  /** Per-group document cap — "at most k docs per source/domain", the
    * over-represented-domain guard a pretraining mix applies before
    * weighting. Deterministic: the k SMALLEST ids per group survive.
    * Scale path: selection runs through [[graft.engine.TopKAggregator]]
    * (bounded k-entry state per group, map-side partials shrink every
    * task to ≤ k rows per group BEFORE the shuffle) — a
    * `row_number() OVER (PARTITION BY group)` would shuffle and sort the
    * whole corpus and collapse a hot domain into one task. Survivor ids
    * then semi-join back — NOT hint-forced broadcast: the survivor set is
    * k·|groups| rows, and the over-represented-domain use case has millions
    * of groups, where a forced broadcast would blow the broadcast limit /
    * driver heap. AQE sees the aggregated side's real size at runtime and
    * broadcasts exactly when it is small.
    */
  def capPerGroup(docs: DataFrame, groupCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val kept = graft.engine.TopKAggregator
      .topKPerGroup(docs.select(col(groupCol), col(idCol)), groupCol,
        -col(idCol), col(idCol), k)
      .select(col("tie").as(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }

  /** Set-containment filter: documents whose token set contains EVERY term
    * in `terms`. For a single query set this is a pure per-row predicate —
    * `array_intersect` against a literal, zero shuffle, zero explode, fully
    * codegen'd, and the filter pushes into the scan's row-group pruning
    * envelope. (Many query sets at once would instead join an inverted
    * index — the q84e posting-list shape — grouped by set id; this is the
    * degenerate single-set case done optimally.)
    */
  def containingAll(docs: DataFrame, terms: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    docs.filter(
      size(array_intersect(array_distinct(split(col(textCol), " ")),
        lit(terms.distinct.toArray))) === terms.distinct.size)
  }

  /** Weighted systematic sampling — deterministic "one doc per `step`
    * weight units": docs are laid on a line in id order at their weight
    * (token/char count), and a doc is selected iff its span
    * `[psum, psum+w)` crosses a multiple of `step`. Inclusion probability
    * ∝ weight (docs with w ≥ step are always selected), zero randomness,
    * exact integers — reruns and engines agree bit-for-bit. The cumulative
    * position is [[graft.engine.Ranking.prefixSum]] (range partition +
    * per-partition window + broadcast offsets), never a global window.
    */
  def weightedSystematicSample[T](docs: DataFrame, weight: Column, step: Long,
      idCol: String = "doc_id")(consume: DataFrame => T): T = {
    require(step > 0, "step must be positive")
    graft.engine.Ranking.prefixSum(
      docs.select(col(idCol), weight.cast("long").as("__w")),
      col("__w"), Seq(col(idCol))) { p =>
      consume(p
        .filter(expr(s"(__psum + __w) DIV $step") > expr(s"__psum DIV $step"))
        .select(col(idCol), col("__w").as("weight"), col("__psum").as("offset")))
    }
  }

  /** Text normalization — the canonical-form pass run BEFORE exact/fuzzy
    * dedup so trivial variants (case, runs of whitespace, stray
    * non-printable bytes) hash identically: lowercase, strip characters
    * outside printable ASCII, collapse whitespace runs, trim. Portable
    * regex classes only (`[ -~]` is space..tilde on any engine), so the
    * oracle computes the identical canonical form.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^ -~]", ""), "  +", " "))

  /** Sequence packing for pretraining: documents concatenated in id order
    * and cut into fixed `budgetTokens` sequences — each doc reports the
    * global token offset where it starts, the sequence (bin) containing
    * that offset, and whether it straddles a sequence boundary (the
    * cross-document attention-mask case). The global offset is an exclusive
    * prefix sum over doc order — computed via [[graft.engine.Ranking.prefixSum]]
    * (range partition + per-partition window + driver offset table), NOT an
    * empty-PARTITION-BY window, which would collapse 100 TB into one task.
    */
  def packSequences[T](docs: DataFrame, budgetTokens: Long,
      idCol: String = "doc_id", textCol: String = "text")(
      consume: DataFrame => T): T = {
    val withTokens = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
    graft.engine.Ranking.prefixSum(withTokens, col("n_tokens"), Seq(col("doc_id"))) { p =>
      val bin = expr(s"__psum DIV $budgetTokens") // exact integer division
      consume(p.select(
        col("doc_id"), col("n_tokens"),
        col("__psum").as("start_offset"),
        bin.as("bin"),
        (col("__psum") + col("n_tokens") > (bin + 1) * budgetTokens).as("straddles")))
    }
  }

  /** Distinctive terms per document — the TF-IDF shape with integer-only
    * ordering (tf DESC, rarest df, then token): tf = occurrences in the
    * doc, df = docs containing the token, top-k per doc. Float-free ranking
    * keeps the result engine-reproducible bit-for-bit; a real idf weight
    * changes only the ORDER BY, not the two-aggregation + per-doc-window
    * shape. No global window — ranking partitions by doc.
    */
  def topTermsPerDoc(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("df").asc, col("tok"))
    tf.join(idf, "tok")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("rk"))
  }

  /** BM25 keyword retrieval over the corpus — the query-time companion to
    * [[topTermsPerDoc]]'s corpus-side scoring, and the lookup a curation
    * pipeline runs ("which training docs match these eval keywords"). The
    * classic Robertson formula with k1=1.2, b=0.75 expressed as EXACT
    * integer arithmetic so any engine replays scores bit-for-bit (the
    * TF-IDF rule at :353 — floats would drift across engines; `ln`-based
    * idf would drift across libms):
    *
    *   idf(t)     = (scale · (N − df)) DIV (df + 1)        — rational idf
    *   denom(d,t) = 10·tf·A + 3·A + 9·dl·N                 — ×(10·A) form of
    *                tf + k1·(1 − b + b·dl/avgdl), avgdl = A/N
    *   score(d)   = Σ_t (idf · tf · 22 · A) DIV denom      — ×22 = 10·(k1+1)
    *
    * N = corpus docs, A = total corpus tokens, dl = doc tokens, tf/df as
    * usual. The per-term numerator and denominator are computed in
    * DECIMAL(38,0): idf ≤ scale·N fits int64 comfortably, but idf·tf·22·A
    * wraps int64 silently under non-ANSI arithmetic already at ~10⁵ docs ×
    * 10⁷ corpus tokens (scale=1000) — score corruption with no error. In
    * decimal the bound is 10³⁸: scale·N·tf·22·A < 10³⁸ holds past
    * 10¹² docs × 10¹³ tokens, beyond any corpus this engine will see (an
    * overflow there errors rather than wrapping). The quotient (integral
    * DIV) and the final per-doc sum are exact longs either way, so scores
    * are bit-identical to the int64 path wherever that path didn't wrap.
    *
    * Scale shape: two aggregations over the token stream (tf per (doc,
    * term), dl per doc), a broadcast of the query-sized df/idf side, one
    * 1-row corpus-stats frame cross-joined broadcast, one grouped sum per
    * doc — the corpus is scanned once and never pairwise-joined.
    */
  def bm25Search(docs: DataFrame, queryTokens: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      scale: Long = 1000L): DataFrame = {
    require(queryTokens.nonEmpty, "bm25Search needs at least one query token")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val q = queryTokens.distinct
    val tf = toks.filter(col("tok").isin(q: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, k, scale)
  }

  /** Robertson scoring over pre-aggregated components — shared verbatim by
    * the one-shot [[bm25Search]] and the persistent
    * [[graft.sink.TextIndexStore]] so the arithmetic can never fork:
    * `tf` = (doc_id, tok, tf) restricted to the query terms, `dl` =
    * (doc_id, dl) for EVERY corpus doc. Corpus stats (N, A) re-aggregate
    * the doc-count-sized dl frame, never the token stream; df and the
    * 1-row stats frame broadcast.
    */
  private[graft] def bm25Score(tf: DataFrame, dl: DataFrame, k: Int,
      scale: Long = 1000L): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("a_tokens"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        expr(s"($scale * (n_docs - df)) DIV (df + 1)"))
      .withColumn("contrib",
        expr("(CAST(idf AS DECIMAL(38,0)) * tf * 22 * a_tokens) DIV " +
          "(CAST(10 AS DECIMAL(38,0)) * tf * a_tokens + 3 * a_tokens + 9 * dl * n_docs)"))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).cast("long").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (sparse BM25 + dense ANN, or any N ranked lists): fused(d) =
    * Σ_lists 1/(kConst + rank_d), documents missing from a list contribute
    * nothing. Computed as exact integers — each list contributes
    * `scale DIV (kConst + rank)` (floor division both engines share), so
    * at scale = 10¹² the floor error (< 1) is six orders below the
    * smallest meaningful score difference and the fused score is
    * bit-identical everywhere, with no float formatting to disagree on.
    * Input frames are (id, rank) with 1-based BIGINT ranks; the union is
    * candidate-list-sized (top-k per retriever, NOT corpus-sized), so the
    * fusion itself is a trivial grouped sum — at 100 TB the cost lives in
    * the retrievers, which is where it belongs.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, kConst: Long = 60L,
      scale: Long = 1000000000000L, idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(r =>
      r.select(col(idCol),
        expr(s"$scale DIV ($kConst + rank)").as("contrib")))
    contribs.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(sum(col("contrib")).cast("long").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }

  /** TF-IDF-weighted sparse all-pairs similarity (the DISCO / all-pairs
    * shape): per-(doc, term) integer weights w = tf · idf with the same
    * integral idf as [[bm25Search]] (`(scale·(N−df)) DIV (df+1)`), then
    * pair scores dot(i,j) = Σ_t w_i·w_j via a self-equi-join of the
    * inverted index on the term. The scale lever is `maxDf`: terms in more
    * than maxDf documents are dropped BEFORE the join (classic df-cut /
    * prefix filtering) — the join fan-out per term is ≤ maxDf², so hot
    * Zipf-head terms can never drive the pair count quadratic in the
    * corpus; at 100 TB maxDf is the knob that trades recall on
    * common-word-only similarity (worthless anyway — that's what stopword
    * idf≈0 encodes) for a bounded shuffle. Products accumulate in
    * DECIMAL(38,0) (w ≤ scale·N·tf — int64 wraps silently at large N·tf,
    * decimal errors instead). Emits pairs with dot ≥ minDot, i < j.
    */
  def tfidfPairs(docs: DataFrame, minDot: Long, maxDf: Long,
      scale: Long = 1000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = tf.join(dfT, "tok")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"),
        (col("tf").cast("decimal(38,0)") *
          expr(s"($scale * (n_docs - df)) DIV (df + 1)")).as("w"))
    w.as("a").join(w.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(sum(col("a.w") * col("b.w")).cast("decimal(38,0)").as("dot"))
      .filter(col("dot") >= minDot)
  }

  /** Train/test contamination detection (the decontamination pass every
    * eval-clean training pipeline needs): test-split documents sharing at
    * least one word n-gram with any train-split document, via the
    * deterministic [[splitHash]] split. Per contaminated test doc: the
    * number of distinct shared n-grams and the smallest offending train
    * doc. Scale: distinct per-doc shingles feed an equi-join on the shingle
    * (candidate generation like MinHash banding — never pairwise over
    * docs); at 100 TB the shingle column would be a 64-bit hash instead of
    * the string (same join shape, 8-byte keys).
    */
  def contamination(docs: DataFrame, n: Int, trainPct: Int = 80, valPct: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val split = deterministicSplit(docs, trainPct, valPct, idCol)
    val shTrain = Dedup.shingles(split.filter(col("split") === "train"), n, idCol, textCol)
      .distinct().select(col("doc_id").as("train_doc"), col("sh"))
    val shTest = Dedup.shingles(split.filter(col("split") === "test"), n, idCol, textCol)
      .distinct().select(col("doc_id").as("test_doc"), col("sh"))
    shTest.join(shTrain, "sh")
      .groupBy(col("test_doc"))
      .agg(count_distinct(col("sh")).as("shared_ngrams"),
        min(col("train_doc")).as("min_train_doc"))
  }

  /** Rare-token mass per document — a corpus-level quality signal the
    * per-doc filters ([[quality]], [[repetitionRatio]]) can't see: documents
    * dominated by tokens that barely occur elsewhere (OCR garbage, random
    * identifiers, mojibake) have high rare-token counts even when their
    * local statistics look clean. Two aggregations + one equi-join on the
    * token: corpus frequency is a grouped count (map-side combinable), the
    * join key is the token — Zipf skew concentrates on HIGH-frequency
    * tokens, which are exactly the ones AQE-salted or broadcast from the
    * (small) head of the frequency table at scale. Thresholds are counts,
    * so the whole result is exact integers.
    */
  def rareTokenStats(docs: DataFrame, rareMax: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val corpusFreq = toks.groupBy("tok").agg(count(lit(1)).as("cf"))
    toks.join(corpusFreq, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        sum(when(col("cf") <= rareMax, 1L).otherwise(0L)).cast("bigint").as("n_rare"),
        count_distinct(when(col("cf") <= rareMax, col("tok"))).cast("bigint").as("rare_types"))
  }

  /** End-to-end keep/drop filter decision (the Gopher/C4-style quality
    * gate): every rule is integer-exact (thresholds cross-multiplied, no
    * ratio ever materialized) and every signal — token count, average
    * token length, stopword hits, distinct-trigram repetition — is pure
    * per-row array arithmetic. No shuffle anywhere: the 100 TB filter pass
    * is scan-bound and embarrassingly parallel. `reason` is the FIRST
    * failing rule in documented order (short → long → tok_len →
    * low_stopwords → repetitive), so drop reasons are stable for
    * monitoring; `keepCols` passes corpus columns (e.g. source, lang)
    * through to downstream rollups without a join.
    */
  def filterPipeline(docs: DataFrame, minTokens: Long = 10, maxTokens: Long = 5000,
      keepCols: Seq[String] = Nil,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val passthrough = keepCols.map(col)
    val staged = docs
      .select(col(idCol).as("doc_id") +: col(textCol).as("__text") +:
        tokens(col(textCol)).as("__toks") +: passthrough: _*)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__chars", length(col("__text")).cast("long"))
      .withColumn("__stop",
        size(filter(col("__toks"), x => x.isInCollection(Stopwords))).cast("long"))
      .withColumn("__tri_distinct",
        when(col("__n") >= 3,
          size(array_distinct(transform(sequence(lit(0L), col("__n") - 3),
            i => concat_ws(" ", slice(col("__toks"), (i + 1).cast("int"), lit(3))))))
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("__tri_total", greatest(col("__n") - 2, lit(0L)))
    // avg token length ∈ [2, 12] as integers: chars−(n−1) vs 2n / 12n;
    // stop_ratio ≥ 2% as stop·50 ≥ n; repetition < 50% as 2·distinct ≥ total
    val reason = when(col("__n") < minTokens, "too_short")
      .when(col("__n") > maxTokens, "too_long")
      .when((col("__chars") - (col("__n") - 1)) < col("__n") * 2 ||
        (col("__chars") - (col("__n") - 1)) > col("__n") * 12, "tok_len")
      .when(col("__stop") * 50 < col("__n"), "low_stopwords")
      .when(col("__tri_total") > 0 && col("__tri_distinct") * 2 < col("__tri_total"),
        "repetitive")
      .otherwise("ok")
    staged.select(col("doc_id") +: col("__n").as("tokens") +: reason.as("reason") +:
      (reason === "ok").as("keep") +: passthrough: _*)
  }

  /** Collocation extraction — adjacent token pairs occurring above
    * independence (the log-free PMI criterion): keep bigrams with
    * `cnt_ab ≥ minCount` and `cnt_ab·N·liftDenom ≥ liftNumer·cnt_a·cnt_b`
    * (lift ≥ liftNumer/liftDenom as an exact integer cross-product — PMI's
    * log changes only the threshold's shape, not the ranking). Bigram
    * generation is the windowless array-slice pattern; the unigram join
    * keys are the words themselves — Zipf-head keys arrive pre-aggregated
    * (one row per distinct word), so the join is vocabulary-sized, not
    * corpus-sized. Counts fit BIGINT here; a 100 TB corpus promotes the
    * cross-products to DECIMAL(38,0) — same plan, wider arithmetic.
    */
  def collocations(docs: DataFrame, minCount: Long,
      liftNumer: Long = 1L, liftDenom: Long = 1L,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // N = Σ unigram counts — derived from the (vocabulary-sized) unigram
    // table, not a second corpus scan
    val total = uni.agg(sum(col("cnt")).as("total"))
    // token array bound as a lambda variable — one split per row (the
    // plain-column form re-split for the filter and the generator)
    val bi = docs
      .select(explode(element_at(transform(array(tokens(col(textCol))), ts =>
        when(size(ts) >= 2,
          transform(sequence(lit(1), size(ts) - 1),
            i => struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))), 1)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minCount)
    bi
      .join(uni.select(col("tok").as("w1"), col("cnt").as("cnt_a")), "w1")
      .join(uni.select(col("tok").as("w2"), col("cnt").as("cnt_b")), "w2")
      .crossJoin(broadcast(total))
      .filter(col("cnt_ab") * col("total") * liftDenom >=
        lit(liftNumer) * col("cnt_a") * col("cnt_b"))
      .select(col("w1"), col("w2"), col("cnt_ab"),
        col("cnt_a").cast("bigint").as("cnt_a"), col("cnt_b").cast("bigint").as("cnt_b"))
  }

  /** RAG-style chunking: each document's token stream cut into chunks of
    * `chunkTokens` tokens starting every `strideTokens` (overlap =
    * chunk − stride); the final chunks truncate at the document end. Pure
    * per-row array arithmetic (`sequence` + `explode` + `slice`) — no
    * window, no shuffle: chunking 100 TB is embarrassingly parallel and
    * stays inside whole-stage codegen. Chunk identity is the md5 of the
    * joined token span, so chunk-level dedup/indexing downstream joins on a
    * fixed-width key instead of the text.
    */
  def chunkWithOverlap(docs: DataFrame, chunkTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(strideTokens > 0 && chunkTokens >= strideTokens,
      s"stride must be in (0, chunk]; got chunk=$chunkTokens stride=$strideTokens")
    val s = strideTokens.toLong
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("__n"),
        // n ≥ 1 always (split yields [""] for empty text), so the double
        // division truncates to the exact floor for any real doc length
        explode(sequence(lit(0L),
          ((size(col("__toks")).cast("long") - 1) / s).cast("long"))).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * s).as("start_tok"),
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_idx") * s).as("n_toks"),
        md5(concat_ws(" ",
          slice(col("__toks"), (col("chunk_idx") * s + 1).cast("int"),
            lit(chunkTokens)))).as("chunk_md5"))
  }

  /** Inverted-index posting lists: per token, document frequency and the
    * sorted posting list, for tokens with df in [minDf, maxDf]. The df
    * bound is applied BEFORE postings are collected (grouped count →
    * filter → semi-join back), so per-group aggregation state is bounded
    * by maxDf — an unguarded `collect_set` over a Zipf head token would
    * hold millions of ids in one group at 100 TB. Real index builds shard
    * the unbounded head separately; this operator is the bounded tail.
    */
  def invertedIndex(docs: DataFrame, minDf: Long, maxDf: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    val dfs = t.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
    t.join(dfs, "tok")
      .groupBy("tok", "df")
      .agg(concat_ws(",",
        transform(sort_array(collect_set(col("doc_id"))), _.cast("string"))).as("postings"))
      .select(col("tok"), col("df").cast("bigint").as("df"), col("postings"))
  }

  /** Sequence-length histogram for batch packing: token counts bucketed by
    * `bucketTokens`, capped at `maxBucket` (the overflow bucket). The
    * shape a packing scheduler needs to pick batch geometry at 100 TB —
    * one narrow projection + one grouped count.
    */
  def lengthHistogram(docs: DataFrame, bucketTokens: Int = 32, maxBucket: Int = 15,
      textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol)))
    docs.select(
        least(floor(nTok / lit(bucketTokens)), lit(maxBucket)).cast("bigint").as("bucket"),
        nTok.cast("bigint").as("tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min(col("tokens")).as("min_tokens"),
        max(col("tokens")).as("max_tokens"))
  }

  /** Exact phrase search — adjacency-aware retrieval (what a bag-of-words
    * index can't answer): per-doc occurrence count of the token sequence
    * `phrase`, top-k by (count DESC, id). The count is a pure per-row array
    * scan (filter over candidate start positions comparing an n-slice to
    * the phrase literal — no explode, no join, no shuffle until the final
    * top-k), so the corpus is read once and the operator rides whatever
    * pruning the scan has. The index-accelerated variant adds positions to
    * [[graft.sink.TextIndexStore]]'s postings and verifies adjacency only
    * on docs containing every term; this scan form is its correctness
    * reference.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val n = phrase.length
    val lits = array(phrase.map(lit): _*)
    // The tokenization is BOUND as a lambda variable (1-element outer
    // transform) so it evaluates once per row: referenced directly, `ts`
    // would be inlined by projection collapse into the slice() inside the
    // position lambda and re-split the text at EVERY candidate position —
    // O(len²) per doc, measured as a ~7× slowdown on the corpus scan.
    // sequence() descends when start > stop, so short docs are gated out
    // rather than generating phantom positions.
    val occ = element_at(transform(array(tokens(col(textCol))), ts =>
      when(size(ts) < n, lit(0L)).otherwise(
        size(filter(sequence(lit(1), size(ts) - (n - 1)),
          i => slice(ts, i, lit(n)) === lits)).cast("long"))), 1)
    docs.select(col(idCol).as("doc_id"), occ.as("occ"))
      .filter(col("occ") > 0)
      .orderBy(col("occ").desc, col("doc_id"))
      .limit(k)
  }

  /** Ordered proximity search — "`first` followed by `second` within
    * `slop` tokens", the query class BETWEEN bag-of-words (any distance)
    * and exact phrase (distance exactly 1): occurrences = ordered position
    * pairs (i, j) with ts[i] = first, ts[j] = second, 0 < j − i ≤ slop.
    * Pure per-row scan like [[phraseSearch]] (no explode, no join, no
    * shuffle until the top-k) and the correctness reference for the
    * index-accelerated [[graft.sink.TextIndexStore.proximitySearch]].
    * The j-window is gated (`i < len`) because sequence() descends when
    * start > stop — the same phantom-position trap phraseSearch pins.
    */
  def proximitySearch(docs: DataFrame, first: String, second: String,
      slop: Int, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(slop >= 1, "slop must be >= 1")
    val occ = element_at(transform(array(tokens(col(textCol))), ts =>
      aggregate(
        filter(sequence(lit(1), size(ts)), i => element_at(ts, i) === lit(first)),
        lit(0L), (acc, i) =>
          acc + when(i < size(ts),
            size(filter(sequence(i + 1, least(i + slop, size(ts))),
              j => element_at(ts, j) === lit(second))).cast("long"))
            .otherwise(0L))), 1)
    docs.select(col(idCol).as("doc_id"), occ.as("occ"))
      .filter(col("occ") > 0)
      .orderBy(col("occ").desc, col("doc_id"))
      .limit(k)
  }

  /** Phrase-blocklist gate — the content-policy filter every production
    * corpus passes through (license strings, spam markers, policy
    * phrases): per document, the total occurrence count across all
    * blocklist phrases (raw substring semantics — a policy phrase must
    * match inside markup/concatenations where token boundaries lie) and
    * the FIRST matching phrase (earliest position; position ties go to the
    * lexicographically smallest phrase — `least` ignores the null
    * non-matches on both engines). Occurrence counting is the
    * length-difference trick ((len − len(replace))/|p|) — pure per-row
    * string arithmetic, zero shuffle until the report aggregation, the
    * same gate shape as [[filterPipeline]].
    */
  def blocklistGate(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "blocklistGate needs at least one phrase")
    val big = Int.MaxValue
    val t = col(textCol)
    val occ = phrases.map(p =>
      ((length(t) - length(call_function("replace", t, lit(p), lit(""))))
        / p.length).cast("long"))
      .reduce(_ + _)
    val poss = phrases.map(p => when(locate(p, t) > 0, locate(p, t)).otherwise(lit(big)))
    val m = if (poss.size == 1) poss.head else least(poss: _*)
    val cands = phrases.zip(poss).map { case (p, pos) =>
      when(pos === m, lit(p)).otherwise(lit(null).cast("string"))
    }
    val first = when(m === big, lit(null).cast("string"))
      .otherwise(if (cands.size == 1) cands.head else least(cands: _*))
    docs.select(col(idCol).as("doc_id"), occ.as("n_hits"), first.as("first_phrase"))
      .filter(col("n_hits") > 0)
  }

  /** Decontamination — the REMOVAL form of [[contamination]]'s detection
    * (the step training pipelines actually ship: Lee et al. / GPT-3's
    * 13-gram dedup against eval sets): train-split documents sharing at
    * least `minShared` distinct word n-grams with the TEST split are
    * dropped; returns the surviving corpus with its split column. The
    * direction matters — the test set is immutable ground truth, so the
    * TRAIN side pays the removal.
    *
    * Shape: the same shingle equi-join as detection (never doc-pairwise;
    * the test side collapses to DISTINCT shingles first — eval-set-sized),
    * a grouped count per train doc, and one left-anti join back.
    */
  def decontaminate(docs: DataFrame, n: Int, minShared: Long,
      trainPct: Int = 80, valPct: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val split = deterministicSplit(docs, trainPct, valPct, idCol)
    val shTrain = Dedup.shingles(split.filter(col("split") === "train"), n, idCol, textCol)
      .distinct().select(col("doc_id").as("train_doc"), col("sh"))
    val shTest = Dedup.shingles(split.filter(col("split") === "test"), n, idCol, textCol)
      .select("sh").distinct()
    val dirty = shTrain.join(shTest, "sh")
      .groupBy("train_doc").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("train_doc").as(idCol))
    split.join(dirty, Seq(idCol), "left_anti")
  }

  /** Related terms by document-level co-occurrence lift — the
    * query-expansion / "related searches" op (what else appears in
    * documents containing the seed, more often than chance): for each
    * candidate term t, lift = P(t | seed) / P(t) computed in exact
    * integers as (co(seed,t) · N · 1000) DIV (df(seed) · df(t)), over
    * DISTINCT per-doc terms (presence, not frequency — one spammy doc
    * can't fabricate a relation). `minCo` floors the co-occurrence count
    * so rare coincidences don't top the ranking (the standard PMI
    * smoothing concern). Top-`k` by (lift DESC, term).
    *
    * Shape: one distinct (doc, tok) pass, document frequencies grouped
    * from it, the seed-doc set semi-joins the same frame — all equi-joins
    * on doc/token keys, nothing pairwise.
    */
  def relatedTerms(docs: DataFrame, seed: String, minCo: Long, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val df0 = dt.groupBy("tok").agg(count(lit(1)).as("df"))
    val seedDocs = dt.filter(col("tok") === seed).select("doc_id")
    val n = docs.select(col(idCol)).agg(count(lit(1)).as("n_docs"))
    val dfSeed = df0.filter(col("tok") === seed)
      .select(col("df").as("df_seed"))
    val co = dt.join(seedDocs, "doc_id")
      .filter(col("tok") =!= seed)
      .groupBy("tok").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    co.join(df0, "tok")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(dfSeed))
      .withColumn("lift_x1000", expr("(co * n_docs * 1000) DIV (df_seed * df)"))
      .select(col("tok").as("term"), col("co").cast("bigint").as("co"),
        col("df").cast("bigint").as("df"),
        col("lift_x1000").cast("bigint").as("lift_x1000"))
      .orderBy(col("lift_x1000").desc, col("term"))
      .limit(k)
  }

  /** Search-result snippet extraction — the last leg of the retrieval
    * stack (a hit list without context is unusable): per document
    * containing `term`, the ±`window`-token span around its FIRST
    * occurrence, ranked by (term frequency DESC, id) — the single-term
    * relevance order BM25 reduces to at fixed document length. Pure
    * per-row array arithmetic (position, slice, join — the token array
    * bound once per the HOF rule); both engines clip the window at the
    * document edges identically.
    */
  def snippets(docs: DataFrame, term: String, window: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 0, "window must be >= 0")
    // the position is BOUND once (1-element transform — the HOF rule):
    // spliced twice it would scan the token array twice per row; the
    // slice LENGTH is p+window−start+1 so a left-edge hit truly clips to
    // ±window instead of borrowing extra right context
    val f = element_at(transform(array(tokens(col(textCol))), ts =>
      element_at(transform(array(array_position(ts, term)), p => {
        val start = greatest(lit(1), p - window)
        struct(
          p.as("p"),
          size(filter(ts, x => x === term)).cast("long").as("tf"),
          concat_ws(" ",
            slice(ts, start.cast("int"), (p + window - start + 1).cast("int")))
            .as("snippet"))
      }), 1)), 1)
    docs.select(col(idCol).as("doc_id"), f.as("f"))
      .filter(col("f.p") > 0)
      .select(col("doc_id"), col("f.tf").as("tf"), col("f.snippet").as("snippet"))
      .orderBy(col("tf").desc, col("doc_id"))
      .limit(k)
  }

  /** Query spelling suggestion against the corpus's OWN vocabulary — the
    * "did you mean" leg of the retrieval stack (an OOV query term returns
    * nothing from any index; the fix is the nearest in-vocabulary terms):
    * per query term, the top-`k` vocabulary tokens within `maxDist` edits,
    * ranked (dist ASC, corpus frequency DESC, token ASC) so common words
    * win ties — all integer/string comparisons, engine-exact.
    *
    * Shape: one vocabulary aggregation (map-side combinable), the
    * |terms|-row query frame broadcast into a vocab scan with the exact
    * levenshtein as the predicate — linear in vocabulary size per term.
    * At 10⁹-token vocabularies, candidate generation swaps to the same
    * length-bin banding [[Dedup.editDistanceNearDup]] uses (edit distance
    * bounds length difference), keeping the verify set per term tiny.
    */
  def spellSuggest(docs: DataFrame, terms: Seq[String], maxDist: Int, k: Int,
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "spellSuggest needs at least one query term")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val q = terms.toDF("term")
    val cand = vocab.crossJoin(broadcast(q))
      .withColumn("dist", levenshtein(col("term"), col("tok")))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy("term")
      .orderBy(col("dist").asc, col("freq").desc, col("tok").asc)
    cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("term"), col("tok").as("suggestion"),
        col("dist").cast("bigint").as("dist"), col("freq").cast("bigint").as("freq"))
  }

  /** Fill-in-the-middle transform — the code-LLM training rewrite
    * (Bavarian et al.: span-corruption at the character level teaches
    * infilling): each document splits at two DETERMINISTIC points into
    * (prefix, middle, suffix) and re-emits in PSM order
    * `<PRE>prefix<SUF>suffix<MID>middle`. Split points are pure modular
    * arithmetic over (doc_id, length) — no RNG state, any engine replays
    * the identical transform, and re-running an epoch regenerates the
    * same examples (vary the transform by mixing an epoch seed into the
    * arithmetic). prefix ++ middle ++ suffix == text by construction
    * (property-tested). Zero-shuffle per-row string arithmetic.
    */
  def fimTransform(docs: DataFrame, preTag: String = "<PRE>",
      sufTag: String = "<SUF>", midTag: String = "<MID>",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val n = length(col(textCol))
    val p1 = pmod(col(idCol) * 37 + 11, n.cast("long") + 1).cast("int")
    val p2 = (p1 + pmod(col(idCol) * 101 + 7, n.cast("long") - p1 + 1).cast("int"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"), p1.as("__p1"), p2.as("__p2"))
      .select(col("doc_id"),
        col("__t").substr(lit(1), col("__p1")).as("prefix"),
        col("__t").substr(col("__p1") + 1, col("__p2") - col("__p1")).as("middle"),
        col("__t").substr(col("__p2") + 1, length(col("__t"))).as("suffix"))
      .select(col("doc_id"),
        concat(lit(preTag), col("prefix"), lit(sufTag), col("suffix"),
          lit(midTag), col("middle")).as("fim"),
        length(col("prefix")).cast("bigint").as("n_prefix"),
        length(col("middle")).cast("bigint").as("n_middle"),
        length(col("suffix")).cast("bigint").as("n_suffix"))
  }

  /** Mixture budgeting — the "what can I actually train on" solver for a
    * target domain mix (the arithmetic core of DoReMi-style reweighting,
    * minus the learned weights): given per-source target shares
    * (x1000, summing to 1000), the largest achievable total WITHOUT
    * oversampling any source is T = min_i floor(count_i · 1000 / share_i);
    * each source then contributes take_i = (share_i · T) DIV 1000 docs at
    * sampling rate (take_i · 1000) DIV count_i. A declared source absent
    * from the corpus counts as count=0 and clamps T to 0 (the mixture is
    * unachievable — no source may contribute). All floor arithmetic —
    * any engine replays the budget exactly. One grouped count + a
    * tiny join with the |sources|-row share table.
    */
  def mixBudget(docs: DataFrame, sharesX1000: Map[String, Long],
      labelCol: String = "source"): DataFrame = {
    require(sharesX1000.values.sum == 1000L, "target shares must sum to 1000")
    val spark = docs.sparkSession
    import scala.jdk.CollectionConverters._
    val shares = spark.createDataFrame(
      sharesX1000.toSeq.sortBy(_._1).map { case (s, v) => org.apache.spark.sql.Row(s, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("share_x1000",
          org.apache.spark.sql.types.LongType))))
    val present = docs.groupBy(col(labelCol).as("source"))
      .agg(count(lit(1)).as("cnt"))
    // LEFT-join FROM the share table: a declared source with ZERO documents
    // must still constrain the budget (its cnt=0 row drives T to 0 — the
    // declared mixture is unachievable), not vanish through an inner join
    // and leave the other sources reporting nonzero takes. Tiny-to-tiny
    // join (|sources| rows each side) — AQE broadcasts it at runtime.
    val counts = shares.join(present, Seq("source"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val t = counts.agg(min(expr("(cnt * 1000) DIV share_x1000")).as("t_total"))
    counts.crossJoin(broadcast(t))
      .withColumn("take", expr("(share_x1000 * t_total) DIV 1000"))
      .select(col("source"), col("cnt").cast("bigint").as("cnt"),
        col("share_x1000").cast("bigint").as("share_x1000"),
        col("take").cast("bigint").as("take"),
        expr("CASE WHEN cnt = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (take * 1000) DIV cnt END").cast("bigint").as("rate_x1000"))
  }

  /** Integer bit-surprisal: floor(log₂(total/count)) computed EXACTLY as
    * `length(bin(total DIV count)) − 1` — the binary-digit count of the
    * floored odds ratio. floor(log₂(x)) over reals equals
    * floor(log₂(floor(x))) because every power of two is an integer, so the
    * integer-division inner floor loses nothing, and `bin()` (both engines
    * render a BIGINT's binary digits identically) turns it into string
    * length — no floating-point log anywhere, no last-ulp dialect risk.
    */
  private def bitSurprisal(totalCol: String, cntCol: String): Column =
    expr(s"CAST(length(bin($totalCol DIV $cntCol)) - 1 AS BIGINT)")

  /** Unigram LM surprisal scoring — the perplexity-filter shape (CCNet's
    * LM quality gate) with the corpus as its own language model: each token
    * instance costs floor(log₂(N/c(w))) bits (N = corpus token count), a
    * doc's score is the bit total and the scaled mean
    * `(Σ·1000) DIV n_toks`. High mean = rare-token-heavy text (gibberish,
    * OCR noise, non-language); low mean = boilerplate the corpus repeats —
    * both tails are exactly what an LM-based quality filter trims. All
    * arithmetic is integer ([[bitSurprisal]]), so an oracle replays it
    * bit-for-bit.
    *
    * Scale shape: one corpus tokenization, a vocabulary-sized grouped count
    * (map-side combinable), an equi-join of the token stream back to the
    * vocabulary (never broadcast — vocab grows with the corpus), one 1-row
    * stats frame broadcast, one grouped sum per doc. Nothing pairwise,
    * nothing windowed.
    */
  def surprisal(docs: DataFrame, topN: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val stats = toks.agg(count(lit(1)).as("n_total"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(stats))
      .withColumn("sur", bitSurprisal("n_total", "c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("sur")).cast("long").as("total_surprisal"))
      .withColumn("mean_surprisal_x1000",
        expr("(total_surprisal * 1000) DIV n_toks"))
      .orderBy(col("mean_surprisal_x1000").desc, col("doc_id"))
      .limit(topN)
  }

  /** Bigram (order-2) LM surprisal — the same gate conditioned on the
    * previous token: an instance of bigram (w₁,w₂) costs
    * floor(log₂(c₁(w₁)/c₁₂(w₁,w₂))) bits, where c₁(w₁) = Σ_w c₁₂(w₁,w) (so
    * the odds ratio is a true conditional and ≥ 1 by construction). Catches
    * what unigram surprisal can't: docs built from common words in
    * improbable ORDER (shuffled text, keyword stuffing) score high here
    * while sailing through the unigram gate. Docs with fewer than two
    * tokens have no bigrams and drop out, as in any order-2 model.
    *
    * Scale shape: bigrams come from a per-row array transform (no window,
    * no self-join — the slice/transform pair is zero-shuffle), then the
    * same vocabulary-equi-join + grouped-sum shape as [[surprisal]].
    */
  def bigramSurprisal(docs: DataFrame, topN: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // same binding discipline as phraseSearch: `ts` is a lambda variable,
    // so the element_at(ts, i+2) inside the pair lambda reads the one
    // bound array instead of re-splitting the text per position
    val bg = docs
      .select(col(idCol).as("doc_id"),
        explode(element_at(transform(array(tokens(col(textCol))), ts =>
          transform(slice(ts, lit(1), size(ts) - 1),
            (x, i) => struct(x.as("w1"), element_at(ts, i + lit(2)).as("w2")))), 1)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).cast("long").as("c1"))
    bg.join(c12, Seq("w1", "w2")).join(c1, "w1")
      .withColumn("sur", bitSurprisal("c1", "c12"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sur")).cast("long").as("total_surprisal"))
      .withColumn("mean_surprisal_x1000",
        expr("(total_surprisal * 1000) DIV n_bigrams"))
      .orderBy(col("mean_surprisal_x1000").desc, col("doc_id"))
      .limit(topN)
  }

  /** Self-trained multinomial Naive Bayes source classifier + confusion
    * matrix — the quality-classifier shape (fastText-style linear scorers
    * gating CommonCrawl against curated reference corpora) in EXACT integer
    * arithmetic: class-conditional token cost is the Laplace-smoothed
    * negative log-likelihood floor(log₂((N_s + V) / (c(w,s) + 1))) bits
    * (N_s = class token count, V = global vocabulary size — so unseen
    * tokens cost the full class odds), a doc's class score is the
    * tf-weighted cost sum, the prediction is the argmin (ties to the
    * lexicographically smallest source). Training and scoring run over the
    * same corpus; the output is the (actual, predicted) confusion matrix —
    * diagonal mass = how linearly separable the sources are, off-diagonal
    * cells = which sources a gate would confuse.
    *
    * Scale shape: one corpus tokenization folded to per-doc (tok, tf)
    * rows, a (source, tok) grouped count (map-side combinable), the
    * class-stats frame is |sources| rows and BROADCAST into the scoring
    * fan-out (per-doc-token × |sources| — linear in corpus tokens times a
    * constant), the (tok, src) vocabulary equi-join is never broadcast
    * (vocab grows with the corpus). Argmin is a |sources|-wide window per
    * doc. No floating-point log anywhere: any engine replays the matrix
    * bit-for-bit.
    */
  def nbSourceConfusion(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "source"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(labelCol).as("actual"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "actual", "tok").agg(count(lit(1)).as("tf"))
    val cnt = toks.groupBy(col("actual").as("src"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val srcStats = toks.groupBy(col("actual").as("src"))
      .agg(count(lit(1)).as("n_src"))
      .crossJoin(broadcast(
        toks.select("tok").distinct().agg(count(lit(1)).as("vocab"))))
    val scored = tf.crossJoin(broadcast(srcStats))
      .join(cnt, Seq("src", "tok"), "left")
      .withColumn("cost", col("tf") *
        expr("CAST(length(bin((n_src + vocab) DIV (coalesce(c, 0L) + 1))) - 1 AS BIGINT)"))
      .groupBy("doc_id", "actual", "src")
      .agg(sum(col("cost")).cast("long").as("total"))
    // argmin via one grouped MIN over (total, src) structs — struct
    // ordering is field-lexicographic, so the minimum IS "lowest total,
    // ties to the lexicographically smallest source". Replaces a
    // row_number window (extra sort of every (doc, class) row) with a
    // partial-aggregable min — one less sort, map-side combinable.
    scored
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct(col("total"), col("src"))).as("best"))
      .groupBy(col("actual"), col("best.src").as("predicted"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
  }
}
