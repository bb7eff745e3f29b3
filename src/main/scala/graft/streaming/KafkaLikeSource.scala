package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** In-memory ordered-partition CDC transport that simulates KAFKA
  * SEMANTICS — the R1 ingestion contract (the reference ingests Debezium
  * CDC over Kafka into cloud storage, /root/reference/README.md:12,16)
  * pinned beyond what a file listing can express, without a broker jar in
  * the image:
  *
  *   - ORDER WITHIN A PARTITION ONLY: [[Group.deliverAvailable]]
  *     interleaves partitions round-robin one record at a time — the
  *     adversarial cross-partition arrival order a multi-partition topic
  *     produces. Downstream state must converge regardless
  *     (last-write-wins by seq), which is exactly why the CDC contract
  *     orders by `seq`, never by arrival.
  *   - AT-LEAST-ONCE DELIVERY: the consumer position is tracked per
  *     partition; [[Group.commit]] records it (offset commit), and
  *     [[Group.rebalance]] rewinds the position to the last committed
  *     offset — the consumer-group rebalance/crash replay. Everything
  *     delivered-but-uncommitted re-delivers, and the downstream merge
  *     must absorb the duplicates idempotently.
  *   - CONSUMER GROUPS: the topic is one shared durable log; each
  *     [[group]] is an independent consumer with its own positions and
  *     committed offsets (and its own stream plumbing), so N table
  *     pipelines fan out over ONE topic exactly like N consumer groups —
  *     the R30 multi-table orchestration shape. The source itself acts as
  *     a default group for single-pipeline callers.
  *
  * A production deployment swaps in a real `readStream.format("kafka")`
  * source behind the same [[CdcSource]] seam; this class exists so the
  * streaming contract those semantics impose is executable in tests
  * (CdcStreamingSpec) rather than documented prose.
  */
final class KafkaLikeSource(spark: SparkSession, nPartitions: Int)
    extends CdcSource {
  require(nPartitions > 0, "a topic needs at least one partition")

  // the topic: durable per-partition logs, shared by every group
  private val logs =
    Array.fill(nPartitions)(scala.collection.mutable.ArrayBuffer.empty[String])

  /** Producer append: the record is durable in the partition log from here
    * on (replays re-read it); delivery to a consumer group happens at its
    * next [[Group.deliverAvailable]].
    */
  def publish(partition: Int, json: String): Unit = synchronized {
    require(partition >= 0 && partition < nPartitions, s"no partition $partition")
    logs(partition) += json
    ()
  }

  private def logSize(p: Int): Int = synchronized(logs(p).size)
  private def logAt(p: Int, i: Int): String = synchronized(logs(p)(i))

  private def held: Dataset[String] = {
    import spark.implicits._
    spark.createDataset(synchronized(logs.toSeq.flatten))
  }

  /** An independent consumer group over the shared topic log: own
    * positions, own committed offsets, own stream. One per table pipeline
    * in a fan-out (each pipeline checkpoints independently, so each must
    * own its delivery cursor — one shared cursor would let pipeline A's
    * commit prune records pipeline B has not read).
    */
  final class Group private[KafkaLikeSource] () extends CdcSource {
    private val position = Array.fill(nPartitions)(0) // next offset to deliver
    private val committed = Array.fill(nPartitions)(0) // consumer-committed

    private implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    private val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]

    /** Deliver up to `maxPerPartition` pending records from every
      * partition into this group's stream, round-robin ONE RECORD AT A
      * TIME across partitions — per-partition order holds, cross-partition
      * order is the interleave. Returns the number of records delivered.
      */
    def deliverAvailable(maxPerPartition: Int = Int.MaxValue): Int = synchronized {
      val until = (0 until nPartitions).map(p =>
        math.min(logSize(p), position(p).toLong + maxPerPartition).toInt)
      var n = 0
      var progressed = true
      while (progressed) {
        progressed = false
        var p = 0
        while (p < nPartitions) {
          if (position(p) < until(p)) {
            mem.addData(logAt(p, position(p)))
            position(p) += 1
            n += 1
            progressed = true
          }
          p += 1
        }
      }
      n
    }

    /** Offset commit: everything delivered so far becomes this group's
      * durable position.
      */
    def commit(): Unit = synchronized {
      var p = 0
      while (p < nPartitions) { committed(p) = position(p); p += 1 }
    }

    /** Consumer-group rebalance / crash: the next consumer generation
      * resumes from the COMMITTED offsets, so every
      * delivered-but-uncommitted record re-delivers at the next
      * [[deliverAvailable]] — Kafka's at-least-once contract, which the
      * downstream seq-idempotent merge must absorb.
      */
    def rebalance(): Unit = synchronized {
      var p = 0
      while (p < nPartitions) { position(p) = committed(p); p += 1 }
    }

    override def inferSchema(spark: SparkSession): StructType =
      spark.read.json(held).schema

    /** The live stream: raw JSON values parsed against the inferred
      * envelope schema — exactly the `from_json(value, schema)` shape a
      * real Kafka source yields.
      */
    override def stream(spark: SparkSession, schema: StructType): DataFrame =
      mem.toDF().select(from_json(col("value"), schema).as("e")).select("e.*")

    /** Bounded replay of the full retained log (all partitions, from
      * offset zero) — the backfill/evolution path.
      */
    override def batch(spark: SparkSession): DataFrame =
      spark.read.json(held)
  }

  /** A fresh consumer group positioned at offset zero. */
  def group(): Group = new Group()

  // ---- default-group face: single-pipeline callers use the source itself
  // as one consumer (the pre-fan-out API, unchanged)
  private val defaultGroup = new Group()

  def deliverAvailable(maxPerPartition: Int = Int.MaxValue): Int =
    defaultGroup.deliverAvailable(maxPerPartition)
  def commit(): Unit = defaultGroup.commit()
  def rebalance(): Unit = defaultGroup.rebalance()

  override def inferSchema(spark: SparkSession): StructType =
    defaultGroup.inferSchema(spark)
  override def stream(spark: SparkSession, schema: StructType): DataFrame =
    defaultGroup.stream(spark, schema)
  override def batch(spark: SparkSession): DataFrame =
    defaultGroup.batch(spark)
}
