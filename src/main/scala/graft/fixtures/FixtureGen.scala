package graft.fixtures

import java.io.{File, PrintWriter}
import java.time.Instant

/** Deterministic generator for the repo-owned CDC fixtures (FIXTURES.md §2):
  * `fixtures/cdc_events.jsonl` + `fixtures/columns_file.csv`. Seeded PRNG
  * decides version counts, delete flags and event interleaving; all field
  * values are pure formulas of (key, version) so regeneration is stable.
  *
  * Layout: keys 0-199 → shop.orders (sharded `orders_part_{k%5}`),
  * 200-299 → shop.customers, 300-349 → shop.audit_log (exclude-list
  * target), 350-399 → crm.leads. 2-7 versions per key (~1800 events);
  * ~10% of keys end with a hard-delete event; versions of one key appear in
  * increasing `seq` order but keys interleave randomly; `ts` = 2024-02-01T00:00Z
  * + seq minutes. Events of shop.orders with seq >= 1500 carry the epoch-2
  * field `row.discount` (schema-evolution target, Q64).
  */
object FixtureGen {

  private val epochSplit = 1500
  private val t0 = Instant.parse("2024-02-01T00:00:00Z")

  private def f2(n: Int): String = "%02d".format(n)

  private def tableOf(k: Int): (String, String, String) = // (db, table_name, full)
    if (k < 200) ("shop", s"orders_part_${k % 5}", "shop.orders")
    else if (k < 300) ("shop", "customers", "shop.customers")
    else if (k < 350) ("shop", "audit_log", "shop.audit_log")
    else ("crm", "leads", "crm.leads")

  /** Row payload as ordered (name, jsonValue) pairs; values are CDC wire
    * strings (typed interpretation is Q65's job).
    */
  private def row(k: Int, v: Int, withDiscount: Boolean): Seq[(String, String)] = {
    def s(x: String) = "\"" + x + "\""
    if (k < 200) {
      val base = Seq(
        "id" -> s(k.toString),
        "amount" -> s(s"${10 + (k * 7 + v * 13) % 990}.${f2((k * 3 + v * 17) % 100)}"),
        "qty" -> s(((k + v) % 20 + 1).toString),
        "note" -> (if ((k + v) % 5 == 0) "null" else s(s"note_${(k + v) % 26}")),
        "created" -> s("2024-01-%02d %02d:%02d:00".format(1 + k % 28, (v * 5) % 24, (k * 3) % 60)),
        "active" -> s(((k + v) % 2).toString),
        "tags" -> (0 until ((k + v) % 3 + 1)).map(i => s((((k + i * 5 + v) % 9) + 1).toString))
          .mkString("[", ",", "]"),
        "ext_id" -> s(s"ext-$k-$v"))
      if (withDiscount) base :+ ("discount" -> s(s"0.${f2((k + v * 7) % 100)}")) else base
    } else if (k < 300) Seq(
      "id" -> s(k.toString),
      "name" -> s(s"cust_${k}_v$v"),
      "joined" -> s("2024-01-%02d 12:00:00".format(1 + k % 28)))
    else if (k < 350) Seq(
      "id" -> s(k.toString),
      "action" -> s(Seq("login", "update", "delete")((k + v) % 3)))
    else Seq(
      "id" -> s(k.toString),
      "score" -> s(s"${(k + v) % 100}.${f2((k * 11 + v) % 100)}"))
  }

  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (n, j) => "\"" + n + "\":" + j }.mkString("{", ",", "}")

  def generate(outDir: String): Unit = {
    val rng = new scala.util.Random(42)
    val keys = 0 until 400
    val versions = keys.map(_ => 2 + rng.nextInt(6))
    val deleted = keys.map(_ => rng.nextDouble() < 0.10)
    // interleave: shuffle the multiset of key occurrences; the i-th
    // occurrence of key k is version i of k, so per-key version order is
    // preserved while keys mix.
    val slots = rng.shuffle(keys.flatMap(k => Seq.fill(versions(k))(k)).toVector)
    val seen = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)

    new File(outDir).mkdirs()
    val out = new PrintWriter(new File(outDir, "cdc_events.jsonl"), "UTF-8")
    try {
      slots.zipWithIndex.foreach { case (k, seq) =>
        val v = seen(k); seen(k) = v + 1
        val (db, tbl, full) = tableOf(k)
        val isDelete = deleted(k) && v == versions(k) - 1
        val withDiscount = full == "shop.orders" && seq >= epochSplit
        val r = row(k, v, withDiscount)
        val oldRow =
          if (v == 0) None
          else Some(row(k, v - 1, full == "shop.orders" && seq >= epochSplit))
        val data = Seq(
          "database_name" -> ("\"" + db + "\""),
          "table_name" -> ("\"" + tbl + "\""),
          "full_table_name" -> "null",
          "primary_key" -> ("\"" + k + "\""),
          "metadata" -> obj(Seq("is_delete" -> isDelete.toString)),
          "row" -> obj(r)) ++ oldRow.map(o => "old_row" -> obj(o))
        val ts = t0.plusSeconds(seq * 60L).toString
        out.println(obj(Seq(
          "seq" -> seq.toString,
          "data" -> obj(data),
          "ts" -> ("\"" + ts + "\""))))
      }
    } finally out.close()

    val csv = new PrintWriter(new File(outDir, "columns_file.csv"), "UTF-8")
    try csv.print(
      """shop.orders,id,int,true
        |shop.orders,amount,decimal,false
        |shop.orders,qty,smallint,false
        |shop.orders,note,varchar,false
        |shop.orders,created,datetime,false
        |shop.orders,active,bit,false
        |shop.orders,tags,_int4,false
        |shop.orders,ext_id,uuid,false
        |shop.orders,discount,float8,false
        |shop.customers,id,bigint,true
        |shop.customers,name,text,false
        |shop.customers,joined,timestamptz,false
        |crm.leads,id,int8,true
        |crm.leads,score,numeric,false
        |""".stripMargin)
    finally csv.close()
  }

  /** Real container signatures (public file-format magic numbers) prepended
    * to each blob so the format sniffer has something true to detect. The
    * RIFF container carries its chunk size little-endian after the tag.
    */
  private def intLE(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)

  private def magic(fmt: String, bodyLen: Int): Array[Byte] = fmt match {
    case "jpeg" => Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
    case "png" => Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    case "gif" => "GIF89a".getBytes("US-ASCII")
    case "mp3" => Array(0x49, 0x44, 0x33, 0x04).map(_.toByte) // ID3v2.4 tag
    case "wav" => "RIFF".getBytes("US-ASCII") ++ intLE(bodyLen + 4) ++ "WAVE".getBytes("US-ASCII")
    case "flac" => "fLaC".getBytes("US-ASCII")
    case "mp4" => Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("US-ASCII")
    case "mkv" => Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) // EBML header
    case "avi" => "RIFF".getBytes("US-ASCII") ++ intLE(bodyLen + 4) ++ "AVI ".getBytes("US-ASCII")
    case _ => Array.empty[Byte]
  }

  private val mediaFormats =
    Vector("jpeg", "png", "gif", "mp3", "wav", "flac", "mp4", "mkv", "avi", "unknown")

  /** Deterministic binary media blobs (the multimodal fixture): a real
    * container signature followed by a pure formula of (id, byte position)
    * covering all 256 byte values — real non-UTF-8 binary, so the parquet
    * BINARY round-trip is actually exercised on both engines (the driver's
    * DuckDB side reads the same file with `read_parquet`). `media_type` is
    * the CLAIMED type; the three `unknown` rows claim "image" with no
    * signature, so sniff-vs-claim disagreement has fixture coverage.
    */
  def mediaRows: Seq[(Long, String, Array[Byte])] = {
    val base = (0 until 30).map { i =>
      val fmt = mediaFormats(i % 10)
      val mediaType = fmt match {
        case "jpeg" | "png" | "gif" => "image"
        case "mp3" | "wav" | "flac" => "audio"
        case "mp4" | "mkv" | "avi" => "video"
        case _ => "image"
      }
      val len = 64 + (i * 37) % 200
      val body = Array.tabulate(len)(j => ((i * 31 + j * 7 + (j * j) % 11) % 256).toByte)
      (i.toLong, mediaType, magic(fmt, len) ++ body)
    }
    // near-dup family for content-chunk media dedup (q95e): 31 = blob 1
    // with only its final byte flipped (shares every full leading 32-byte
    // chunk); 32 = blob 1 with its first two chunks swapped (same chunk
    // CONTENT at different positions); 33 = unrelated control.
    val (_, t1, b1) = base(1)
    val b31 = b1.clone(); b31(b31.length - 1) = (b31(b31.length - 1) ^ 0x7f).toByte
    val b32 = b1.clone()
    for (k <- 0 until 32) { val t = b32(k); b32(k) = b32(32 + k); b32(32 + k) = t }
    val b33 = Array.tabulate(100)(j => ((j * 131 + 17) % 256).toByte)
    base :+
      ((30L, "image", Array.empty[Byte])) :+ // zero-length blob: chunk/sniff edge
      ((31L, t1, b31)) :+ ((32L, t1, b32)) :+ ((33L, "image", b33))
  }

  /** Writes `media.parquet` as a SINGLE parquet file (not a directory) so
    * DuckDB's `read_parquet('<path>')` takes it verbatim.
    */
  def generateMedia(spark: org.apache.spark.sql.SparkSession, outDir: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(mediaRows.map { case (id, mt, b) => Row(id, mt, b) }, 1),
      schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft_media_fix")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no parquet part written"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(outDir, "media.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toFile.listFiles().foreach(_.delete())
    java.nio.file.Files.deleteIfExists(tmp)
    ()
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "fixtures"
    generate(out)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    try generateMedia(spark, out) finally spark.stop()
  }
}
