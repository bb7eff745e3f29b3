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
