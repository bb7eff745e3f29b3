package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.llm.{Dedup, TextAnalysis}

/** End-to-end corpus curation: the composed pipeline a training-data team
  * actually runs, wired from the library's own operators — normalize →
  * near-dup dedup (MinHash-LSH candidates → components → verdict) →
  * quality gate → deterministic split → epoch shuffle → sequence packing.
  * Asserts the INVARIANTS a real pipeline audit would: monotone survivor
  * counts, dedup idempotence (a second pass removes nothing), split
  * completeness, pack budget compliance — all deterministic, so the end
  * state is stable across reruns and machines.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("normalize -> dedup -> quality gate -> split -> shuffle -> pack, deterministically") {
    val docs = Tables.table(spark, dir, "documents")
    val nDocs = docs.count()

    // 1. canonical form before dedup (case/whitespace variants collapse)
    val normed = docs.withColumn("text", TextAnalysis.normalizeText(col("text")))

    // 2. near-dup dedup at the LSH scale path; keep/drop verdict per doc —
    // persisted AND materialized inside the managed scope (its contract:
    // round caches release on exit, so late materialization would replay
    // the whole iterative clustering from lineage)
    val keptDocs = Dedup.minhashLsh(normed, dictionary = false) { est =>
      val pairs = est.filter(col("est") >= 0.8).select("i", "j")
      Dedup.dedupVerdict(normed, pairs) { verdict =>
        val k = verdict.filter(col("keep")).select("doc_id")
        val p = normed.join(k, "doc_id").persist()
        p.count()
        p
      }
    }
    try {
      val nKept = keptDocs.count()
      assert(nKept > 0 && nKept <= nDocs)

      // dedup idempotence: the survivors contain no >=0.8 pair
      val residual = Dedup.minhashLsh(keptDocs, dictionary = false) { est2 =>
        est2.filter(col("est") >= 0.8).count()
      }
      assert(residual == 0L, s"second dedup pass still sees $residual pairs")

      // 3. quality gate: integer-exact keep/drop rules
      val gated = TextAnalysis.filterPipeline(keptDocs)
      val clean = keptDocs.join(gated.filter(col("keep")).select("doc_id"), "doc_id")
      val nClean = clean.count()
      assert(nClean > 0 && nClean <= nKept)

      // 4. split: every clean doc lands in exactly one of train/val/test
      val split = TextAnalysis.deterministicSplit(clean)
      val bySplit = split.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.values.sum == nClean)
      assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
      assert(bySplit("train") > bySplit.getOrElse("val", 0L)) // 80/10/10 shape

      // 5. epoch shuffle over the train split: a bijection into shards
      val train = split.filter(col("split") === "train")
      val order = TextAnalysis.epochShuffle(train, seed = 1L, nShards = 4)
      assert(order.count() == bySplit("train"))
      assert(order.select("doc_id").distinct().count() == bySplit("train"))

      // 6. pack the ordered corpus into token-budget bins (continuous
      // stream: docs may straddle bin boundaries, flagged as such).
      // Verified against an INDEPENDENT driver-side re-pack: a running sum
      // over doc order recomputes offset/bin/straddle from raw token
      // counts, so a packing bug cannot hide behind its own formula.
      TextAnalysis.packSequences(train, budgetTokens = 512) { packed =>
        val rows = packed.select("doc_id", "n_tokens", "start_offset", "bin", "straddles")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
          .sortBy(_._1)
        assert(rows.length == bySplit("train").toInt) // every train doc packed once
        var run = 0L
        rows.foreach { case (id, n, start, bin, straddles) =>
          assert(start == run, s"doc $id: offset $start, independent cumsum $run")
          assert(bin == run / 512, s"doc $id: bin $bin vs ${run / 512}")
          assert(straddles == (run + n > (run / 512 + 1) * 512), s"doc $id straddle flag")
          run += n
        }
      }

      // whole pipeline is deterministic: rerunning the dedup+gate+split
      // chain yields the identical survivor id checksum
      val sum1 = clean.agg(sum("doc_id")).head().getLong(0)
      val again = Dedup.minhashLsh(normed, dictionary = false) { est =>
        val pairs = est.filter(col("est") >= 0.8).select("i", "j")
        Dedup.dedupVerdict(normed, pairs) { verdict =>
          val k2 = verdict.filter(col("keep")).select("doc_id")
          normed.join(k2, "doc_id")
            .join(TextAnalysis.filterPipeline(normed.join(k2, "doc_id"))
              .filter(col("keep")).select("doc_id"), "doc_id")
            .agg(sum("doc_id")).head().getLong(0)
        }
      }
      assert(again == sum1)
    } finally {
      keptDocs.unpersist()
      ()
    }
  }
}
