package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.{DeleteMode, SnapshotCatalog}
import graft.streaming.CatalogTxnStream

/** Streaming multi-table transactions (the q61i shape driven from
  * foreachBatch): every committed catalog version must be a consistent
  * cross-table cut at a micro-batch boundary, under kill-and-restart with
  * a replayed micro-batch — and the replay may add NO duplicate catalog
  * version.
  */
class CatalogTxnStreamSpec extends SparkSpec {

  private def writeChunk(dir: String, name: String, lines: Seq[String]): Unit = {
    val w = new PrintWriter(new File(dir, name), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  // crash injection: [[SparkSpec.injectCrash]]

  // each micro-batch carries one row PER member table, tagged with the
  // batch number — a consistent cut must show the same max tag in both
  private def chunk(n: Int): Seq[String] = Seq(
    s"""{"tbl":"orders","primary_key":"o$n","seq":$n,"val":"b$n","is_delete":false}""",
    s"""{"tbl":"customers","primary_key":"c$n","seq":$n,"val":"b$n","is_delete":false}""")

  private def maxTag(df: DataFrame): Option[String] =
    df.agg(max(col("val"))).collect().headOption.flatMap(r => Option(r.getString(0)))

  test("every catalog version is a consistent cut; crash replay adds no duplicate cut") {
    val in = tmpDir("txn_in")
    val ckpt = tmpDir("txn_ck")
    val catDir = tmpDir("txn_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    val members = Seq(
      CatalogTxnStream.Member("orders", _.filter(col("tbl") === "orders").drop("tbl"), 2),
      CatalogTxnStream.Member("customers", _.filter(col("tbl") === "customers").drop("tbl"), 2))

    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, val STRING, is_delete BOOLEAN")
      .json(in)
    def startQ() = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "txn-writer")

    // ---- batches 0 and 1, then crash with batch 1 fully applied
    writeChunk(in, "b0.jsonl", chunk(0))
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      writeChunk(in, "b1.jsonl", chunk(1))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    assert(cat.versions.size == 2, s"one cut per micro-batch, got ${cat.versions}")

    injectCrash(ckpt)
    writeChunk(in, "b2.jsonl", chunk(2))
    val q2 = startQ()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination() }

    // replayed batch 1 must NOT have published a duplicate cut: exactly one
    // catalog version per source micro-batch
    assert(cat.versions.size == 3,
      s"3 micro-batches ⇒ 3 cuts, got ${cat.versions} (replay duplicated a cut?)")
    // ... and its epoch stamps are strictly increasing batch ids
    val stamps = cat.versions.map(v => cat.epochs(v)("txn-writer"))
    assert(stamps == Seq(0L, 1L, 2L), stamps.toString)

    // NO TORN CUT AT ANY POINT: readers only ever observe committed catalog
    // versions, so check every one — both members must sit at the same
    // micro-batch boundary in every cut
    for (v <- cat.versions) {
      val view = cat.readAllAt(spark, v)
      val o = maxTag(view("orders")); val c = maxTag(view("customers"))
      assert(o == c, s"torn cut at catalog v$v: orders=$o customers=$c")
      assert(o.contains(s"b${cat.epochs(v)("txn-writer")}"),
        s"cut v$v must sit at its own epoch boundary")
    }

    // final state: all three batches applied exactly once per member
    val fin = cat.readAll(spark)
    assert(fin("orders").count() == 3 && fin("customers").count() == 3)
    // the replayed merge was skipped entirely (no orphan table versions):
    // each member advanced exactly once per micro-batch
    for (m <- Seq("orders", "customers"))
      assert(graft.sink.SnapshotParquetSink.versions(s"$catDir/$m") == Seq(0L, 1L, 2L),
        s"$m grew orphan versions from the replay")
  }

  test("a member rebucketted mid-stream re-routes the next merge instead of wedging") {
    val in = tmpDir("txn3_in")
    val ckpt = tmpDir("txn3_ck")
    val catDir = tmpDir("txn3_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    val members = Seq(
      CatalogTxnStream.Member("orders", _.filter(col("tbl") === "orders").drop("tbl"), 2),
      CatalogTxnStream.Member("customers", _.filter(col("tbl") === "customers").drop("tbl"), 2))
    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, val STRING, is_delete BOOLEAN")
      .json(in)
    def startQ() = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "w3")
    writeChunk(in, "b0.jsonl", chunk(0))
    val q1 = startQ()
    try q1.processAllAvailable()
    finally { q1.stop(); q1.awaitTermination() }
    // maintenance between micro-batches: orders evolves its partition count
    // (openTable adopts the committed layout — the Member's declared
    // nBuckets only seeds creation).
    // First a CRASHED attempt: the rebucket dies at its manifest publish —
    // manifest atomicity must leave the table fully intact (old layout, old
    // version, readable), the pipeline un-wedged, and the orphan data root
    // collectable; the RETRY then lands
    val boom = new graft.engine.CommitLock {
      override def publishOntoAbsent(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean =
        throw new java.io.IOException("injected crash at rebucket publish")
    }
    intercept[java.io.IOException](graft.engine.CommitLock.withLock(boom)(
      cat.openTable("orders").rebucket(spark, newBuckets = 8)))
    assert(graft.sink.SnapshotParquetSink.manifest(s"$catDir/orders",
      graft.sink.SnapshotParquetSink.versions(s"$catDir/orders").last)._1 == 2,
      "a crashed rebucket must leave the committed layout untouched")
    assert(cat.openTable("orders").read(spark, DeleteMode.Hard).count() == 1L)
    val (_, orphans) = cat.openTable("orders").vacuum(keepLast = 10, minOrphanAgeMs = 0L)
    assert(orphans >= 1, "the crashed attempt's data root is unreferenced scratch")
    cat.openTable("orders").rebucket(spark, newBuckets = 8)
    assert(graft.sink.SnapshotParquetSink.manifest(s"$catDir/orders",
      graft.sink.SnapshotParquetSink.versions(s"$catDir/orders").last)._1 == 8)
    writeChunk(in, "b1.jsonl", chunk(1))
    val q2 = startQ()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination() }
    // the merge landed on the new layout and the cut is still consistent
    val view = cat.readAllAt(spark, cat.currentVersion.get)
    assert(maxTag(view("orders")) == maxTag(view("customers")),
      "post-rebucket cut must not tear")
    assert(view("orders").count() == 2L)
  }

  test("a maintained view advances inside the transaction, pinned with its source") {
    val in = tmpDir("txn4_in")
    val ckpt = tmpDir("txn4_ck")
    val catDir = tmpDir("txn4_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    val members = Seq(
      CatalogTxnStream.Member("orders", _.filter(col("tbl") === "orders").drop("tbl"), 2))
    val src = cat.openTable("orders", 2)
    val m = new graft.sink.MaterializedAgg(src, cat.openTable("orders_by_grp", 2),
      Seq("grp"), Seq(count(lit(1)).as("n"), sum(col("amt")).as("total")))
    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, grp STRING, amt LONG, is_delete BOOLEAN")
      .json(in)
    def startQ() = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "w4",
      views = Seq("orders_by_grp" -> m))
    def row(pk: String, seq: Long, grp: String, amt: Long, del: Boolean = false) =
      s"""{"tbl":"orders","primary_key":"$pk","seq":$seq,"grp":${if (grp == null) "null" else s""""$grp""""},"amt":$amt,"is_delete":$del}"""

    writeChunk(in, "b0.jsonl", Seq(row("o1", 1, "a", 10), row("o2", 2, "b", 5)))
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      // b1: group move + a delete — the delta-IVM killers, mid-stream
      writeChunk(in, "b1.jsonl", Seq(row("o1", 3, "b", 10), row("o2", 4, null, 0, del = true)))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    injectCrash(ckpt)
    writeChunk(in, "b2.jsonl", Seq(row("o3", 5, "a", 7)))
    val q2 = startQ()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination() }

    assert(cat.versions.size == 3, s"one cut per micro-batch, got ${cat.versions}")
    // EVERY cut pins (source, view) together, and the pinned view equals a
    // from-scratch GROUP BY of the pinned source — the rollup can never lag
    // the fact table inside a committed cut
    for (v <- cat.versions) {
      val pins = cat.pins(v)
      assert(pins.keySet == Set("orders", "orders_by_grp"), s"cut v$v pins $pins")
      val srcState = src.readAt(spark, pins("orders"), DeleteMode.Hard)
      val expect = srcState.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("amt")).as("total"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
      val got = m.sink.readAt(spark, pins("orders_by_grp"), DeleteMode.Hard)
        .select("grp", "n", "total")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"view lags its source inside cut v$v: $got vs $expect")
    }
    // final content sanity: o1 moved to b, o2 deleted, o3 arrived in a
    val fin = m.read(spark).select("grp", "n", "total")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(fin == Set((Some("a"), 1L, 7L), (Some("b"), 1L, 10L)))
  }

  test("a map view (per-row enrichment hop) advances inside the cut, cascade on top") {
    val in = tmpDir("txn6_in")
    val ckpt = tmpDir("txn6_ck")
    val catDir = tmpDir("txn6_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    val members = Seq(
      CatalogTxnStream.Member("orders", _.filter(col("tbl") === "orders").drop("tbl"), 2))
    val src = cat.openTable("orders", 2)
    val enriched = cat.openTable("orders_silver", 2)
    // map hop: derive cents, uppercase the note — then a rollup CASCADES on
    // the map view's OUTPUT (bottom-up declaration order)
    val mapView = new graft.streaming.MaterializedMap(src, enriched, Seq("primary_key"),
      df => df.withColumn("cents", col("amt") * 100)
        .withColumn("note_u", upper(col("note"))))
    val rollup = new graft.sink.MaterializedAgg(enriched,
      cat.openTable("silver_by_grp", 2),
      Seq("grp"), Seq(count(lit(1)).as("n"), sum(col("cents")).as("total_cents")))
    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, grp STRING, amt LONG, note STRING, is_delete BOOLEAN")
      .json(in)
    def startQ() = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "w6",
      views = Seq("orders_silver" -> mapView, "silver_by_grp" -> rollup))
    def row(pk: String, seq: Long, grp: String, amt: Long, note: String, del: Boolean = false) =
      s"""{"tbl":"orders","primary_key":"$pk","seq":$seq,"grp":"$grp","amt":$amt,"note":"$note","is_delete":$del}"""

    writeChunk(in, "b0.jsonl", Seq(row("o1", 1, "a", 10, "x1"), row("o2", 2, "b", 5, "x2")))
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      // update + delete mid-stream: both must forward through the hop
      writeChunk(in, "b1.jsonl",
        Seq(row("o1", 3, "a", 20, "y1"), row("o2", 4, "b", 0, "gone", del = true)))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    injectCrash(ckpt)
    writeChunk(in, "b2.jsonl", Seq(row("o3", 5, "a", 7, "z3")))
    val q2 = startQ()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination() }

    assert(cat.versions.size == 3, s"one cut per micro-batch, got ${cat.versions}")
    // every cut pins (source, map view, rollup) together; the pinned map
    // view equals transform(pinned source) and the pinned rollup equals a
    // GROUP BY of the pinned map view — the whole cascade moves atomically
    for (v <- cat.versions) {
      val pins = cat.pins(v)
      assert(pins.keySet == Set("orders", "orders_silver", "silver_by_grp"),
        s"cut v$v pins $pins")
      val srcState = src.readAt(spark, pins("orders"), DeleteMode.Hard)
      val expectMap = srcState
        .withColumn("cents", col("amt") * 100).withColumn("note_u", upper(col("note")))
        .select("primary_key", "cents", "note_u")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val gotMap = enriched.readAt(spark, pins("orders_silver"), DeleteMode.Hard)
        .select("primary_key", "cents", "note_u")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(gotMap == expectMap, s"map view lags its source in cut v$v")
      val expectRoll = enriched.readAt(spark, pins("orders_silver"), DeleteMode.Hard)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val gotRoll = rollup.sink.readAt(spark, pins("silver_by_grp"), DeleteMode.Hard)
        .select("grp", "n", "total_cents")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotRoll == expectRoll, s"rollup lags the map view in cut v$v")
    }
    // final content: o1 updated (2000 cents), o2 deleted, o3 arrived (700)
    val fin = enriched.read(spark, DeleteMode.Hard)
      .select("primary_key", "cents", "note_u")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(fin == Set(("o1", 2000L, "Y1"), ("o3", 700L, "Z3")), fin.toString)
  }

  test("cascaded views (fact ⋈ dim, rollup on top) advance in one atomic cut") {
    val in = tmpDir("txn5_in")
    val ckpt = tmpDir("txn5_ck")
    val catDir = tmpDir("txn5_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    // one multiplexed feed, two members with DIFFERENT merge keys: the dim
    // is keyed by its natural key (what the join view requires)
    val members = Seq(
      CatalogTxnStream.Member("orders",
        _.filter(col("tbl") === "orders").drop("tbl", "cname"), 2),
      CatalogTxnStream.Member("customers",
        _.filter(col("tbl") === "customers")
          .select(col("primary_key").as("cust"), col("cname"), col("seq"),
            col("is_delete")), 2, keys = Seq("cust")))
    val orders = cat.openTable("orders", 2)
    val custs = cat.openTable("customers", 2)
    val enriched = new graft.sink.MaterializedJoin(orders, custs,
      cat.openTable("orders_enriched", 2), Seq("cust"), Seq("cname"))
    val rollup = new graft.sink.MaterializedAgg(enriched.sink,
      cat.openTable("orders_by_cname", 2), Seq("cname"),
      Seq(count(lit(1)).as("n"), sum(col("amt")).as("total")), seqCol = "__vseq")
    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, cust STRING, " +
        "cname STRING, amt LONG, is_delete BOOLEAN")
      .json(in)
    def startQ() = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "w5",
      views = Seq("orders_enriched" -> enriched, "orders_by_cname" -> rollup))
    def o(pk: String, seq: Long, cust: String, amt: Long, del: Boolean = false) =
      s"""{"tbl":"orders","primary_key":"$pk","seq":$seq,"cust":"$cust","amt":$amt,"is_delete":$del}"""
    def c(ck: String, seq: Long, name: String, del: Boolean = false) =
      s"""{"tbl":"customers","primary_key":"$ck","seq":$seq,"cname":${if (name == null) "null" else s""""$name""""},"is_delete":$del}"""

    writeChunk(in, "b0.jsonl", Seq(o("o1", 1, "a", 10), o("o2", 2, "b", 5),
      c("a", 1, "Acme"), c("b", 2, "Bolt")))
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      // b1: dim rename fans out through BOTH views; an order re-points
      writeChunk(in, "b1.jsonl", Seq(c("a", 3, "Acme Corp"), o("o2", 4, "a", 5)))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    injectCrash(ckpt)
    writeChunk(in, "b2.jsonl", Seq(o("o3", 5, "b", 7), c("b", 6, null, del = true)))
    val q2 = startQ()
    try q2.processAllAvailable()
    finally { q2.stop(); q2.awaitTermination() }

    assert(cat.versions.size == 3, s"one cut per micro-batch, got ${cat.versions}")
    // EVERY committed cut: join view ≡ from-scratch join of the pinned
    // members; rollup ≡ from-scratch GROUP BY of the pinned join view
    for (v <- cat.versions) {
      val pins = cat.pins(v)
      assert(pins.keySet == Set("orders", "customers", "orders_enriched",
        "orders_by_cname"), s"cut v$v pins $pins")
      val oState = orders.readAt(spark, pins("orders"), DeleteMode.Hard)
      val cState = custs.readAt(spark, pins("customers"), DeleteMode.Hard)
      val joinExpect = oState
        .join(cState.select("cust", "cname"), Seq("cust"), "left_outer")
        .select("primary_key", "cust", "amt", "cname")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.getString(3)))).toSet
      val joinGot = enriched.sink
        .readAt(spark, pins("orders_enriched"), DeleteMode.Hard)
        .select("primary_key", "cust", "amt", "cname")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.getString(3)))).toSet
      assert(joinGot == joinExpect, s"join view lags inside cut v$v")
      val rollExpect = enriched.sink
        .readAt(spark, pins("orders_enriched"), DeleteMode.Hard)
        .groupBy("cname").agg(count(lit(1)).as("n"), sum(col("amt")).as("total"))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
      val rollGot = rollup.sink
        .readAt(spark, pins("orders_by_cname"), DeleteMode.Hard)
        .select("cname", "n", "total")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
      assert(rollGot == rollExpect, s"rollup lags inside cut v$v")
    }
    // final content: o1+o2 under Acme Corp, o3's customer deleted → null
    val fin = rollup.read(spark).select("cname", "n", "total")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(fin == Set((Some("Acme Corp"), 2L, 15L), (None, 1L, 7L)))
  }

  test("two streaming writers share one catalog: disjoint members, whole-warehouse cuts") {
    val inA = tmpDir("txn7_ina"); val inB = tmpDir("txn7_inb")
    val ckA = tmpDir("txn7_cka"); val ckB = tmpDir("txn7_ckb")
    val catDir = tmpDir("txn7_cat") + "/c"
    val cat = new SnapshotCatalog(catDir)
    val schema = "tbl STRING, primary_key STRING, seq LONG, val STRING, is_delete BOOLEAN"
    def startA() = CatalogTxnStream.start(
      spark.readStream.schema(schema).json(inA), cat,
      Seq(CatalogTxnStream.Member("orders", _.drop("tbl"), 2)),
      Seq("primary_key"), "seq", "is_delete", ckA, writerId = "wA")
    def startB() = CatalogTxnStream.start(
      spark.readStream.schema(schema).json(inB), cat,
      Seq(CatalogTxnStream.Member("shipments", _.drop("tbl"), 2)),
      Seq("primary_key"), "seq", "is_delete", ckB, writerId = "wB")
    def row(t: String, pk: String, n: Int) =
      s"""{"tbl":"$t","primary_key":"$pk","seq":$n,"val":"b$n","is_delete":false}"""

    // both writers run CONCURRENTLY against one catalog
    writeChunk(inA, "a0.jsonl", Seq(row("orders", "o1", 0)))
    writeChunk(inB, "b0.jsonl", Seq(row("shipments", "s1", 0)))
    val qa = startA(); val qb = startB()
    try {
      qa.processAllAvailable(); qb.processAllAvailable()
      writeChunk(inA, "a1.jsonl", Seq(row("orders", "o2", 1)))
      writeChunk(inB, "b1.jsonl", Seq(row("shipments", "s2", 1)))
      qa.processAllAvailable(); qb.processAllAvailable()
    } finally {
      qa.stop(); qb.stop(); qa.awaitTermination(); qb.awaitTermination()
    }
    assert(cat.versions.size == 4, s"two writers × two batches = 4 cuts, got ${cat.versions}")
    // once both writers have committed, every later cut carries BOTH tables
    val head = cat.currentVersion.get
    assert(cat.pins(head).keySet == Set("orders", "shipments"), cat.pins(head).toString)
    val view = cat.readAllAt(spark, head)
    assert(view("orders").count() == 2L && view("shipments").count() == 2L)
    // each writer's epoch trail is independent and complete on the head
    assert(cat.epochs(head) == Map("wA" -> 1L, "wB" -> 1L), cat.epochs(head).toString)

    // crash-replay one writer: its replayed batch adds NO duplicate cut and
    // does not disturb the other writer's pins
    injectCrash(ckA)
    writeChunk(inA, "a2.jsonl", Seq(row("orders", "o3", 2)))
    val qa2 = startA()
    try qa2.processAllAvailable()
    finally { qa2.stop(); qa2.awaitTermination() }
    assert(cat.versions.size == 5, s"exactly one new cut, got ${cat.versions}")
    val h2 = cat.currentVersion.get
    assert(cat.epochs(h2) == Map("wA" -> 2L, "wB" -> 1L))
    assert(cat.readAllAt(spark, h2)("orders").count() == 3L)
    assert(cat.readAllAt(spark, h2)("shipments").count() == 2L,
      "the other writer's table must ride along unchanged")
  }

  test("a member with no rows yet is not pinned; it joins the cut when data arrives") {
    val in = tmpDir("txn2_in")
    val ckpt = tmpDir("txn2_ck")
    val cat = new SnapshotCatalog(tmpDir("txn2_cat") + "/c")
    val members = Seq(
      CatalogTxnStream.Member("orders", _.filter(col("tbl") === "orders").drop("tbl"), 2),
      CatalogTxnStream.Member("customers", _.filter(col("tbl") === "customers").drop("tbl"), 2))
    val stream = spark.readStream
      .schema("tbl STRING, primary_key STRING, seq LONG, val STRING, is_delete BOOLEAN")
      .json(in)
    // batch 0 carries ONLY orders rows
    writeChunk(in, "b0.jsonl", Seq(
      """{"tbl":"orders","primary_key":"o0","seq":0,"val":"b0","is_delete":false}"""))
    val q = CatalogTxnStream.start(stream, cat, members,
      Seq("primary_key"), "seq", "is_delete", ckpt, writerId = "w")
    try {
      q.processAllAvailable()
      assert(cat.pins(cat.currentVersion.get).keySet == Set("orders"))
      writeChunk(in, "b1.jsonl", chunk(1))
      q.processAllAvailable()
      assert(cat.pins(cat.currentVersion.get).keySet == Set("orders", "customers"))
    } finally { q.stop(); q.awaitTermination() }
  }
}
