package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column design (north star): media travel as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extract /
  * resize / frame-sample are per-row transforms over the bytes.
  *
  * No image/audio codecs exist in this environment, so the DECODE STEP IS A
  * STUB — `decodeStub` derives deterministic fake dimensions from a byte
  * hash. Everything around it is the real engine surface: the schema
  * contract, columnar-friendly projections, partition-preserving transforms
  * and batch shapes are exactly what a codec-backed implementation (JNI or
  * vectorized Python workers on a cluster) would plug into.
  */
object Multimodal {

  /** Metadata contract carried beside every blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Test helper: packs a string column into the binary contract (stands in
    * for real blobs — the engine only sees bytes either way).
    */
  def packFromText(df: DataFrame, textCol: String, mediaType: String): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit(mediaType))

  /** STUBBED decode: deterministic pseudo-metadata from the bytes. A real
    * implementation replaces ONLY the width/height/duration expressions with
    * a codec call; the schema and plan shape stay identical.
    */
  def decodeStub(media: Column, mediaType: Column): Column = {
    val h = abs(xxhash64(media))
    struct(
      mediaType.as("media_type"),
      length(media).cast("long").as("n_bytes"),
      (pmod(h, lit(1920)) + 1).cast("int").as("width"),
      (pmod(h, lit(1080)) + 1).cast("int").as("height"),
      when(mediaType.isin("audio", "video"), pmod(h, lit(600000L))).otherwise(lit(null))
        .cast("long").as("duration_ms"))
  }

  def withMeta(df: DataFrame): DataFrame =
    df.withColumn("meta", decodeStub(col("media"), col("media_type")))

  /** STUBBED feature extraction: fixed-dim pseudo-embedding from byte hashes
    * — the array<float> contract downstream similarity ops consume.
    */
  def featureStub(media: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(media, i), lit(2000L)).cast("double") / 1000.0 - 1.0).cast("float"))

  /** Resize: at this layer just a metadata rewrite + byte passthrough (the
    * codec stub has no pixels); keeps the partition-preserving narrow shape
    * a real resize kernel would have.
    */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", col("meta")
      .withField("width", lit(w).cast("int"))
      .withField("height", lit(h).cast("int")))

  /** Frame sampling for video rows: one output row per sampled frame offset
    * — `explode(sequence(...))`, the generator shape a real frame extractor
    * uses (bytes per frame would come from the codec).
    */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.media_type") === "video" && col("meta.duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))

  /** Magic-number format sniffing: detects the container format from the
    * first bytes (public file-format signatures: JPEG/PNG/GIF, ID3/RIFF-WAVE/
    * fLaC, ftyp/EBML/RIFF-AVI). The crawl-pipeline truth check for a claimed
    * media_type — declared-vs-actual mismatches flag corrupt or mislabeled
    * blobs before any decode is attempted. Reads at most 12 bytes per row
    * (every signature fits), so the scan stays narrow no matter the blob size.
    */
  def sniffType(media: Column): Column = {
    val h = hex(substring(media, 1, 12)) // 24 hex chars cover every signature
    when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("89504E470D0A1A0A"), "png")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("494433"), "mp3")
      .when(h.startsWith("664C6143"), "flac")
      .when(h.startsWith("1A45DFA3"), "mkv")
      // RIFF branches BEFORE the offset-4 "ftyp" probe: a RIFF container's
      // little-endian size field occupies bytes 4-7, and for certain sizes
      // spells "ftyp" — the prefix check must win over the offset check
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", "wav")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "41564920", "avi")
      .when(substring(h, 9, 8) === "66747970", "mp4") // "ftyp" at byte offset 4
      .otherwise("unknown")
  }

  /** Maps a sniffed container format to its media category — comparable
    * against the claimed `media_type` column.
    */
  def sniffCategory(sniffed: Column): Column =
    when(sniffed.isin("jpeg", "png", "gif"), "image")
      .when(sniffed.isin("mp3", "wav", "flac"), "audio")
      .when(sniffed.isin("mp4", "mkv", "avi"), "video")
      .otherwise("unknown")

  /** Fixed-size blob chunking: one output row per `chunkBytes` slice, with
    * the chunk index alongside. At 100 TB this is the row-size bound — a
    * multi-GB video as ONE parquet cell breaks row-group sizing, shuffle
    * block limits and task balance; sharded to bounded chunks the table
    * partitions and shuffles like any other. The generator (explode over a
    * computed offset sequence) is the same shape frameSample uses; the slice
    * is a codegen'd substring, no UDF.
    */
  def chunk(df: DataFrame, mediaCol: String, chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    val nChunks = ceil(length(col(mediaCol)).cast("double") / chunkBytes).cast("int")
    df.withColumn("chunk_idx", explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1)))
      .withColumn("chunk",
        expr(s"substring($mediaCol, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  /** Content-chunk media near-dup — the binary twin of token-set dedup:
    * blobs sharing identical `chunkBytes`-aligned chunk CONTENT (position-
    * independent), with the shared-distinct-chunk count per pair. Candidate
    * generation is an equi-join on the chunk bytes — one shuffle keyed by
    * content, never pairwise over blobs; at 100 TB the join key would be
    * `xxhash64(chunk)` (8-byte keys, same plan shape) with a byte-equality
    * re-check. Catches re-encodes-with-tail-edits, partial copies and
    * chunk reorders that a whole-file hash misses.
    */
  def chunkNearDup(df: DataFrame, mediaCol: String, chunkBytes: Int,
      minShared: Long = 1L, idCol: String = "media_id"): DataFrame = {
    val c = chunk(df, mediaCol, chunkBytes)
      .select(col(idCol).as("media_id"), col("chunk")).distinct()
    c.as("a").join(c.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("i"), col("b.media_id").as("j"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }

  /** Every-`everyN`th chunk of [[chunk]]'s shard space — the strided access
    * pattern of video keyframe sampling and audio analysis windows, over
    * bytes (a codec-backed frame extractor swaps the slice for a decode
    * call; the generator and offsets stay identical). Sampled offsets are
    * generated directly as a stepped sequence, so skipped chunks are never
    * materialized — output-proportional work no matter the stride.
    */
  def sampleChunks(df: DataFrame, mediaCol: String, chunkBytes: Int, everyN: Int): DataFrame = {
    require(chunkBytes > 0 && everyN > 0, "chunkBytes and everyN must be positive")
    val nChunks = ceil(length(col(mediaCol)).cast("double") / chunkBytes).cast("int")
    df.withColumn("chunk_idx",
        explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1, lit(everyN))))
      .withColumn("chunk",
        expr(s"substring($mediaCol, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  // ------------------------------------------------------------------ BMP
  // The one raster format this container CAN decode for real: BMP is
  // header + raw pixels, no codec jar needed. The encoder/decoder below are
  // byte-level (little-endian header fields, 4-byte-padded bottom-up pixel
  // rows) and expression-only — the whole roundtrip stays inside
  // whole-stage codegen, no UDF. This replaces `decodeStub` for BMP blobs:
  // width/height/bpp/pixel reads come from the actual bytes.

  /** hex of the low byte of `v`, always 2 chars. */
  private def hexByte(v: Column): Column =
    lpad(hex(pmod(v.cast("long"), lit(256L))), 2, "0")

  /** 4-byte little-endian hex encoding of `v`. */
  private def le32Hex(v: Column): Column = {
    val x = v.cast("long")
    concat(hexByte(x), hexByte(shiftright(x, 8)),
      hexByte(shiftright(x, 16)), hexByte(shiftright(x, 24)))
  }

  /** BMP pixel rows are padded to 4-byte boundaries: stride = ceil(3w/4)·4. */
  private def bmpStride(w: Column): Column =
    shiftleft(shiftright(w.cast("long") * 3 + 3, 2), 2)

  /** Encodes a REAL 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + raw
    * BGR rows, bottom-up, 4-byte row padding) with a deterministic pixel
    * pattern derived from (x, y, seed):
    *   B = (3x + y) mod 251, G = (x + 7y) mod 251, R = (x + y + seed) mod 251
    * The bytes are a valid image any BMP viewer opens; the pattern makes
    * every pixel independently checkable by closed-form arithmetic — which
    * is exactly what lets an external oracle verify [[bmpChannelSum]]'s
    * byte-level decode without itself parsing BMP.
    */
  def encodeBmp(w: Column, h: Column, seed: Column): Column = {
    val stride = bmpStride(w)
    val dataSize = stride * h.cast("long")
    val fileSize = dataSize + 54L
    val header = concat(
      lit("424D"), le32Hex(fileSize), lit("00000000"), le32Hex(lit(54L)), // file header
      le32Hex(lit(40L)), le32Hex(w), le32Hex(h), lit("0100"), lit("1800"), // info header
      le32Hex(lit(0L)), le32Hex(dataSize),
      le32Hex(lit(2835L)), le32Hex(lit(2835L)), le32Hex(lit(0L)), le32Hex(lit(0L)))
    // rows bottom-up (file row r carries image row y = h-1-r), each padded
    // to the 4-byte stride
    val rows = array_join(
      transform(sequence(h.cast("long") - 1, lit(0L), lit(-1L)), y =>
        concat(
          array_join(transform(sequence(lit(0L), w.cast("long") - 1), x =>
            concat(
              hexByte(pmod(x * 3 + y, lit(251L))),
              hexByte(pmod(x + y * 7, lit(251L))),
              hexByte(pmod(x + y + seed.cast("long"), lit(251L))))), ""),
          repeat(lit("00"), (bmpStride(w) - w.cast("long") * 3).cast("int")))), "")
    unhex(concat(header, rows))
  }

  /** The byte at 1-based `pos` of a binary column, as 0..255. */
  private def byteAt(media: Column, pos: Column): Column =
    conv(hex(media.substr(pos.cast("int"), lit(1))), 16, 10).cast("long")

  /** Little-endian unsigned integer of `n` bytes at 1-based `pos` — folded
    * high-byte-first so no per-step shift is needed.
    */
  private def leIntAt(media: Column, pos: Int, n: Int): Column =
    aggregate(sequence(lit(n - 1), lit(0), lit(-1)), lit(0L),
      (acc, i) => acc * 256L + byteAt(media, lit(pos) + i))

  /** REAL BMP header decode: (width, height, bits-per-pixel, pixel-data
    * offset) parsed from the actual little-endian header bytes. Non-BMP
    * bytes (wrong magic) decode as null — the sniff-then-decode contract.
    */
  def decodeBmpMeta(media: Column): Column = {
    val isBmp = hex(media.substr(lit(1), lit(2))) === "424D"
    val meta = struct(
      leIntAt(media, 19, 4).cast("int").as("width"),
      leIntAt(media, 23, 4).cast("int").as("height"),
      leIntAt(media, 29, 2).cast("int").as("bpp"),
      leIntAt(media, 11, 4).as("data_offset"))
    when(isBmp, meta).otherwise(lit(null).cast(
      "struct<width:int,height:int,bpp:int,data_offset:bigint>"))
  }

  /** Sum of one channel (0=B, 1=G, 2=R) over EVERY pixel of a 24-bit BMP,
    * reading the actual pixel bytes (data offset, stride and dimensions all
    * from the header — nothing assumed from the writer). One flat aggregate
    * over w·h positions per row; padding bytes are skipped by construction.
    * The downstream shape of any real per-pixel feature (mean brightness,
    * channel histograms): a narrow per-row expression, no UDF, no shuffle.
    */
  def bmpChannelSum(media: Column, channel: Int): Column = {
    require(channel >= 0 && channel < 3, "channel must be 0 (B), 1 (G) or 2 (R)")
    // header fields bound once per row (the HOF binding rule — see
    // bmpAHashHof): referenced directly, each 4-byte LE fold re-evaluates
    // inside every per-pixel lambda iteration
    element_at(transform(array(struct(
        leIntAt(media, 19, 4).as("w"),
        leIntAt(media, 23, 4).as("h"),
        leIntAt(media, 11, 4).as("off"))), hdr => {
      val w = hdr.getField("w")
      val off = hdr.getField("off")
      val stride = bmpStride(w)
      aggregate(sequence(lit(0L), w * hdr.getField("h") - 1), lit(0L), (acc, i) => {
        val x = pmod(i, w)
        val r = ((i - x) / w).cast("long") // file row; bottom-up order is sum-irrelevant
        acc + byteAt(media, off + r * stride + x * 3 + channel + 1)
      })
    }), 1)
  }

  /** Perceptual average-hash (aHash) of a 24-bit BMP, computed from the
    * ACTUAL pixel bytes (offset/stride/dims all parsed from the header —
    * nothing assumed from the writer): per-pixel gray = (B+G+R) DIV 3, the
    * image mean = (Σ gray) DIV (w·h), and bit i (file-order pixel index
    * i = row·w + x, bottom-up as stored) is set iff gray(i) > mean. The
    * first min(w·h, 63) pixels pack into a non-negative BIGINT — the
    * fixed-width fingerprint whose Hamming distance survives uniform
    * brightness shifts (every aHash's point): two images differing by a
    * constant channel offset flip only the bits near the mean.
    *
    * One narrow per-row expression — no UDF, no shuffle. This is the
    * codegen path (graft.functions.BmpAHash — one fused Java loop over the
    * raw bytes); [[bmpAHashHof]] below is the pure-builtin composition
    * reference the spec pins it against bit-for-bit. Requires
    * GraftFunctions.register on the session (Tables.ensure does it).
    */
  def bmpAHash(media: Column): Column =
    graft.functions.GraftFunctions.bmp_ahash(media)

  /** [[bmpAHash]] composed from builtin higher-order functions —
    * bit-identical by spec, kept as the composition reference (HOFs are
    * CodegenFallback: every per-byte read is an interpreted substr → hex →
    * conv chain, ~0.25 ms/row on 84-pixel images vs ~1 µs fused).
    */
  def bmpAHashHof(media: Column): Column = {
    // binding discipline (the HOF rule, applied twice): the HEADER fields
    // are bound once per row — referenced as plain expressions they
    // re-evaluate their 4-byte little-endian folds inside EVERY per-pixel
    // lambda (~16 extra byte reads per pixel, measured ~6× on the corpus) —
    // and the GRAY vector is materialized once, instead of separate
    // evaluations in the mean pass and again per packed bit
    element_at(transform(array(struct(
        leIntAt(media, 19, 4).as("w"),
        leIntAt(media, 23, 4).as("h"),
        leIntAt(media, 11, 4).as("off"))), hdr => {
      val w = hdr.getField("w")
      val off = hdr.getField("off")
      val stride = bmpStride(w)
      val n = w * hdr.getField("h")
      def gray(i: Column): Column = {
        val x = pmod(i, w)
        val r = ((i - x) / w).cast("long")
        val base = off + r * stride + x * 3
        ((byteAt(media, base + 1) + byteAt(media, base + 2) + byteAt(media, base + 3)) / 3)
          .cast("long")
      }
      element_at(transform(array(transform(sequence(lit(0L), n - 1), i => gray(i))), gs =>
        element_at(transform(
          array((aggregate(gs, lit(0L), (acc, g) => acc + g) / size(gs)).cast("long")), m =>
          // Horner over descending bit index: acc·2 + bit — no shift-by-column
          aggregate(sequence(least(size(gs).cast("long"), lit(63L)) - 1, lit(0L), lit(-1L)),
            lit(0L),
            (acc, i) => acc * 2 +
              when(element_at(gs, (i + 1).cast("int")) > m, 1L).otherwise(0L))), 1)), 1)
    }), 1)
  }

  /** Inference batch shape: rows grouped into fixed-size batches keyed by
    * `id div batchSize` — one output row per batch with id-aligned feature
    * arrays, ready to hand a vectorized model runner one tensor per row.
    * The batch key is a pure function of the id: batching is deterministic
    * across runs, and data written/bucketed by id range keeps the groupBy
    * shuffle-light. The struct array is sorted so ids[i] ↔ features[i]
    * alignment never depends on arrival order.
    */
  def inferenceBatches(df: DataFrame, idCol: String, featCol: String,
      batchSize: Int): DataFrame = {
    val packed = sort_array(collect_list(struct(col(idCol).as("id"), col(featCol).as("f"))))
    df.groupBy(floor(col(idCol) / batchSize).cast("long").as("batch_id"))
      .agg(packed.as("packed"))
      .select(col("batch_id"),
        transform(col("packed"), _.getField("id")).as("ids"),
        transform(col("packed"), _.getField("f")).as("features"),
        size(col("packed")).cast("long").as("n"))
  }
}
