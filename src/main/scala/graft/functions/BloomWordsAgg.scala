package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.sink.BloomIndex

/** Aggregate that builds the per-bucket bloom-sidecar WORDS during the same
  * job that writes the data files — attached via `Dataset.observe` on the
  * commit's write frame, so the sidecar build costs ZERO extra reads and
  * ZERO extra jobs (the pre-round-13 build re-read the freshly written
  * files and ran two more aggregations per bloom column; measured at
  * 1.5–2.1× bulk-commit overhead, now folded into the write scan).
  *
  * Input: `(bucket INT, hash BIGINT)` where `hash = xxhash64(col)` with
  * nulls passed through as null (skipped — a null never matches an equality
  * probe). Bits are set with [[BloomIndex.position]]'s exact double-hash
  * formula at the maximum filter size; the power-of-two FOLD identity
  * ((p mod 2^20) mod m = p mod m when m | 2^20) lets partials ship at each
  * bucket's fill-implied size and re-fold losslessly on merge, so per-task
  * transmission is O(final sidecar size), not O(2^20 bits).
  *
  * Output: `map<int, struct<nhat: bigint, bf: binary>>` — per bucket, the
  * distinct-count estimate (standard bloom inversion n̂ = −(m/k)·ln(1−X/m))
  * and the [[BloomIndex.encode]]d filter. Buckets whose estimate exceeds
  * [[BloomIndex.MaxDistinct]] are OMITTED (a saturated bloom admits
  * everything — same "absence = cannot prune" contract as before).
  *
  * Scale shape: after `repartition(affected, __bucket)` each task holds
  * one-ish bucket, so the update-phase dense buffer is ~128 KiB per bucket
  * and the driver merge receives already-folded filters — the same bytes
  * the old collect()-based build shipped, minus the extra read of the data.
  */
case class BloomWordsAgg(
    bucket: Expression,
    hash: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomWordsAgg.Buf] {

  override def children: Seq[Expression] = Seq(bucket, hash)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucket = newChildren(0), hash = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false

  override val dataType: DataType = BloomWordsAgg.OutType

  override def createAggregationBuffer(): BloomWordsAgg.Buf =
    new BloomWordsAgg.Buf

  override def update(buf: BloomWordsAgg.Buf, input: InternalRow): BloomWordsAgg.Buf = {
    val b = bucket.eval(input)
    val h = hash.eval(input)
    if (b != null && h != null) {
      buf.entFor(b.asInstanceOf[Int]).add(h.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: BloomWordsAgg.Buf, b: BloomWordsAgg.Buf): BloomWordsAgg.Buf = {
    b.entries.foreach { case (bk, be) =>
      a.entries.get(bk) match {
        case None     => a.entries.put(bk, be)
        case Some(ae) => a.entries.put(bk, BloomWordsAgg.combine(ae, be))
      }
    }
    a.invalidateCache()
    a
  }

  override def eval(buf: BloomWordsAgg.Buf): Any = {
    val kept = buf.entries.toSeq.sortBy(_._1).flatMap { case (bk, e) =>
      val ent = e.foldedToEstimate()
      if (ent.m == 0) None
      else Some((bk, ent.nhat, BloomIndex.encode(ent.m, ent.words)))
    }
    new ArrayBasedMapData(
      new GenericArrayData(kept.map(_._1)),
      new GenericArrayData(kept.map(t => InternalRow(t._2, t._3))))
  }

  override def serialize(buf: BloomWordsAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    buf.entries.toSeq.sortBy(_._1).foreach { case (bk, e) =>
      val ent = e.foldedToEstimate()
      out.writeInt(bk)
      out.writeLong(ent.nhat)
      out.writeInt(ent.m)
      ent.words.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomWordsAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BloomWordsAgg.Buf
    var i = 0
    while (i < n) {
      val bk = in.readInt()
      val nhat = in.readLong()
      val m = in.readInt()
      val words = new Array[Long](m / 64)
      var w = 0
      while (w < words.length) { words(w) = in.readLong(); w += 1 }
      buf.entries.put(bk, new BloomWordsAgg.Ent(m, words, nhat))
      i += 1
    }
    buf
  }

  override def prettyName: String = "graft_bloom_words"
}

object BloomWordsAgg {

  /** Per-task accumulation state: bucket → filter entry, with a LAST-ENTRY
    * cache — the write frame is repartitioned by `__bucket`, so consecutive
    * rows overwhelmingly share one; the cache turns the per-row boxed map
    * probe into one probe per bucket RUN.
    */
  final class Buf {
    val entries: mutable.HashMap[Int, Ent] = mutable.HashMap.empty
    private var lastB: Int = 0
    private var lastE: Ent = null

    def entFor(b: Int): Ent = {
      if (lastE != null && lastB == b) lastE
      else {
        val e = entries.getOrElseUpdate(b,
          new Ent(BloomIndex.MaxBits, new Array[Long](BloomIndex.MaxBits / 64), -1L))
        lastB = b
        lastE = e
        e
      }
    }

    /** merge() replaces entries in place — a stale cache would OR bits
      * into a dropped entry.
      */
    def invalidateCache(): Unit = lastE = null
  }

  val OutType: DataType = MapType(IntegerType,
    StructType(Seq(
      StructField("nhat", LongType, nullable = false),
      StructField("bf", BinaryType, nullable = false))),
    valueContainsNull = false)

  /** One bucket's filter state: `m` bits (0 = saturated, no words), words,
    * and the distinct estimate (−1 = not yet estimated from fill — valid
    * only while the entry has ONLY seen direct inserts at its current m).
    */
  final class Ent(var m: Int, var words: Array[Long], var nhat: Long) {

    /** Insert at the CURRENT size — exact under the fold identity:
      * (p mod 2^20) mod m = p mod m for every m | 2^20, so inserting
      * directly at a folded size sets the same bit the full-size insert
      * would fold onto.
      */
    def add(h: Long): Unit =
      if (m > 0) {
        // inlined BloomIndex.position (bit-identical: same h1/h2/mask
        // formula) — h1/h2 hoisted out of the K-iteration loop; this runs
        // K times per WRITTEN ROW in the fused sidecar build, so the
        // redundant per-position recomputation was a measured slice of
        // the commit overhead
        val h1 = h & 0x7fffffffL
        val h2 = ((h >>> 32) | 1L) & 0x7fffffffL
        val mask = m - 1
        var i = 0
        while (i < BloomIndex.K) {
          val p = ((h1 + i.toLong * h2) & mask).toInt
          words(p >>> 6) |= 1L << (p & 63)
          i += 1
        }
        nhat = -1L // fill changed; re-estimate lazily
      }

    private def fill(): Long = {
      var x = 0L
      var i = 0
      while (i < words.length) { x += java.lang.Long.bitCount(words(i)); i += 1 }
      x
    }

    /** Resolve n̂ from the current fill when unknown, then fold down to the
      * size the estimate asks for. m=0 marks saturation (estimate beyond
      * [[BloomIndex.MaxDistinct]] or a full filter) — no sidecar.
      */
    def foldedToEstimate(): Ent = {
      if (nhat < 0L) {
        val x = fill()
        nhat =
          if (x >= m) Long.MaxValue // saturated: every bit set
          else math.ceil(-m.toDouble / BloomIndex.K *
            math.log1p(-x.toDouble / m.toDouble)).toLong
      }
      BloomIndex.sizeFor(nhat) match {
        case None => new Ent(0, Array.empty, nhat)
        case Some(target) =>
          // can fold down, never up: a post-merge estimate larger than the
          // already-folded m keeps m (higher fill ⇒ higher FP rate, still
          // zero false negatives)
          if (target < m) fold(target) else this
      }
    }

    private def fold(target: Int): Ent = {
      val tw = target / 64
      val folded = new Array[Long](tw)
      var w = 0
      while (w < words.length) {
        folded(w % tw) |= words(w)
        w += 1
      }
      new Ent(target, folded, nhat)
    }
  }

  /** OR-merge two entries: estimates add (an over-count — two partials may
    * share values — which only ever makes the filter LARGER than needed);
    * filters fold to the smaller size first (exact), saturation is sticky.
    */
  private[functions] def combine(a: Ent, b: Ent): Ent = {
    val ar = a.foldedToEstimate()
    val br = b.foldedToEstimate()
    val nhat =
      if (ar.nhat == Long.MaxValue || br.nhat == Long.MaxValue) Long.MaxValue
      else ar.nhat + br.nhat
    if (ar.m == 0 || br.m == 0 || nhat > BloomIndex.MaxDistinct)
      return new Ent(0, Array.empty, nhat)
    val m = math.min(ar.m, br.m)
    val (small, large) = if (ar.m <= br.m) (ar, br) else (br, ar)
    val words = small.words.clone()
    val tw = m / 64
    var w = 0
    while (w < large.words.length) {
      words(w % tw) |= large.words(w)
      w += 1
    }
    new Ent(m, words, nhat)
  }
}
