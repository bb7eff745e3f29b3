package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer-vocabulary induction (Sennrich et al. 2016), distributed.
  *
  * The working set is the DISTINCT pre-token table with corpus frequencies
  * — vocabulary-sized, not corpus-sized: a 100 TB corpus collapses to a few
  * million (pre_token, freq) rows after the first aggregation, and every
  * merge iteration runs over that table, never the corpus again. Each
  * iteration is one pair-count shuffle (map-side combinable) + a driver
  * pick of exactly ONE row (the argmax pair — bounded by construction) + a
  * narrow per-row merge application, the classic greedy left-to-right fold
  * expressed as a Catalyst `aggregate` higher-order function (codegen'd, no
  * UDF).
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right), so the learned merge sequence is engine-reproducible.
  */
object Bpe {

  /** Distinct pre-tokens with corpus frequencies, symbols = characters.
    * Pre-tokenization is the q84b regex (lowercase runs + single
    * punctuation) — the split a real BPE trainer sees before merges.
    */
  def preTokenTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(col(textCol), lit(TextAnalysis.PreTokenRe), lit(0))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("freq"))
      .select(col("pt"), col("freq"),
        expr("transform(sequence(1, length(pt)), i -> substring(pt, i, 1))").as("symbols"))

  /** Frequency of every adjacent symbol pair, weighted by pre-token
    * frequency; the merge candidate ranking.
    */
  def pairCounts(table: DataFrame): DataFrame =
    table
      // sequence over 1..size (never descending — a single-symbol token
      // would make sequence(1, 0) count DOWN); the final try_element_at
      // yields null and the pair is dropped below
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(symbols)),
          |  i -> struct(element_at(symbols, i) AS a, try_element_at(symbols, i + 1) AS b))"""
          .stripMargin)).as("p"))
      .filter(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right application of one merge (a, b) → ab over a
    * symbol array — the standard BPE merge semantics — as a pure fold
    * (`aggregate` HOF): a pending slot carries the previous symbol, a
    * match emits the merged symbol and clears it. Empty string is a safe
    * sentinel: symbols are never empty.
    */
  private[graft] def mergeExpr(symbolsCol: String, a: String, b: String): String = {
    def q(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    s"""aggregate($symbolsCol,
       |  named_struct('done', array_repeat('', 0), 'pend', ''),
       |  (acc, x) -> CASE
       |    WHEN acc.pend = ${q(a)} AND x = ${q(b)}
       |      THEN named_struct('done', array_append(acc.done, ${q(a + b)}), 'pend', '')
       |    ELSE named_struct(
       |      'done', CASE WHEN acc.pend = '' THEN acc.done
       |                   ELSE array_append(acc.done, acc.pend) END,
       |      'pend', x) END,
       |  acc -> CASE WHEN acc.pend = '' THEN acc.done
       |              ELSE array_append(acc.done, acc.pend) END)""".stripMargin
  }

  /** One learned merge: `(left, right, weightedCount)`, ties broken
    * lexicographically.
    */
  case class Merge(a: String, b: String, cnt: Long)

  /** Learn `iters` merges. Returns the ordered merge list and the final
    * pre-token table (symbols rewritten through every merge). The driver
    * holds one row per iteration; all heavy work stays distributed.
    */
  /** Encode a corpus through a learned (or fixed) merge sequence — the
    * tokenize step a training pipeline actually runs over 100 TB. Shape:
    * the merge folds are applied to the DISTINCT pre-token table of THIS
    * corpus (vocabulary-sized, same trick as [[learn]]); the corpus then
    * pays ONE equi-join (pre_token → encoded symbols; AQE broadcasts the
    * vocab when small) and a per-doc ordered reassembly. Merges apply in
    * sequence order — BPE's greedy semantics — so the same merges encode
    * identically anywhere. Returns (idCol, tokens ARRAY<STRING>,
    * n_tokens); concatenating `tokens` reproduces the pre-token text
    * verbatim (merges are lossless — test-pinned).
    */
  def encode(docs: DataFrame, merges: Seq[Merge], idCol: String = "doc_id",
      textCol: String = "text", checkpointEvery: Int = 16): DataFrame = {
    // the vocab IS preTokenTable minus the freq column — one source of the
    // pre-token/symbol construction (and of the regex's lit() quoting)
    var vocab = preTokenTable(docs, textCol).select(col("pt"), col("symbols"))
    merges.zipWithIndex.foreach { case (m, i) =>
      vocab = vocab.withColumn("symbols", expr(mergeExpr("symbols", m.a, m.b)))
      if ((i + 1) % checkpointEvery == 0) vocab = vocab.localCheckpoint()
    }
    val encoded = docs
      .select(col(idCol), posexplode(
        regexp_extract_all(col(textCol), lit(TextAnalysis.PreTokenRe), lit(0)))
        .as(Seq("__pos", "pt")))
      .join(vocab, "pt")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("symbols")))),
        s => s.getField("symbols"))).as("tokens"))
    // a doc with zero pre-tokens (empty/whitespace text) has no exploded
    // rows — rejoin so it surfaces with an empty token array, not silently
    // dropped from the encoded corpus
    docs.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("bigint"))
  }

  def learn(docs: DataFrame, iters: Int, textCol: String = "text",
      checkpointEvery: Int = 16): (Seq[Merge], DataFrame) = {
    var table = preTokenTable(docs, textCol)
    val merges = Seq.newBuilder[Merge]
    for (it <- 0 until iters) {
      val top = graft.engine.GraftSession.boundedCollect(pairCounts(table)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1), 1, "bpe top pair")
      if (top.nonEmpty) {
        val r = top(0)
        val m = Merge(r.getString(0), r.getString(1), r.getLong(2))
        merges += m
        table = table.withColumn("symbols", expr(mergeExpr("symbols", m.a, m.b)))
        // each merge nests another aggregate HOF into the plan — truncate
        // lineage periodically or a real vocab run (thousands of merges)
        // drowns in analysis time long before it runs out of compute
        if ((it + 1) % checkpointEvery == 0) table = table.localCheckpoint()
      }
    }
    (merges.result(), table)
  }
}
