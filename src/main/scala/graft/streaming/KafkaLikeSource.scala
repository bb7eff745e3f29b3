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
  *   - ORDER WITHIN A PARTITION ONLY: [[deliverAvailable]] interleaves
  *     partitions round-robin one record at a time — the adversarial
  *     cross-partition arrival order a multi-partition topic produces.
  *     Downstream state must converge regardless (last-write-wins by seq),
  *     which is exactly why the CDC contract orders by `seq`, never by
  *     arrival.
  *   - AT-LEAST-ONCE DELIVERY: the consumer position is tracked per
  *     partition; [[commit]] records it (offset commit), and
  *     [[rebalance]] rewinds the position to the last committed offset —
  *     the consumer-group rebalance/crash replay. Everything
  *     delivered-but-uncommitted re-delivers, and the downstream merge
  *     must absorb the duplicates idempotently.
  *
  * A production deployment swaps in a real `readStream.format("kafka")`
  * source behind the same [[CdcSource]] seam; this class exists so the
  * streaming contract those semantics impose is executable in tests
  * (CdcStreamingSpec) rather than documented prose.
  */
final class KafkaLikeSource(spark: SparkSession, nPartitions: Int)
    extends CdcSource {
  require(nPartitions > 0, "a topic needs at least one partition")

  private val logs =
    Array.fill(nPartitions)(scala.collection.mutable.ArrayBuffer.empty[String])
  private val position = Array.fill(nPartitions)(0) // next offset to deliver
  private val committed = Array.fill(nPartitions)(0) // consumer-committed

  import spark.implicits._
  private implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val mem =
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]

  /** Producer append: the record is durable in the partition log from here
    * on (replays re-read it); delivery to the consumer happens at the next
    * [[deliverAvailable]].
    */
  def publish(partition: Int, json: String): Unit = synchronized {
    require(partition >= 0 && partition < nPartitions, s"no partition $partition")
    logs(partition) += json
    ()
  }

  /** Deliver up to `maxPerPartition` pending records from every partition
    * into the live stream, round-robin ONE RECORD AT A TIME across
    * partitions — per-partition order holds, cross-partition order is the
    * interleave. Returns the number of records delivered.
    */
  def deliverAvailable(maxPerPartition: Int = Int.MaxValue): Int = synchronized {
    val until = (0 until nPartitions).map(p =>
      math.min(logs(p).size, position(p).toLong + maxPerPartition).toInt)
    var n = 0
    var progressed = true
    while (progressed) {
      progressed = false
      var p = 0
      while (p < nPartitions) {
        if (position(p) < until(p)) {
          mem.addData(logs(p)(position(p)))
          position(p) += 1
          n += 1
          progressed = true
        }
        p += 1
      }
    }
    n
  }

  /** Offset commit: everything delivered so far becomes the consumer
    * group's durable position.
    */
  def commit(): Unit = synchronized {
    var p = 0
    while (p < nPartitions) { committed(p) = position(p); p += 1 }
  }

  /** Consumer-group rebalance / crash: the next consumer generation resumes
    * from the COMMITTED offsets, so every delivered-but-uncommitted record
    * re-delivers at the next [[deliverAvailable]] — Kafka's at-least-once
    * contract, which the downstream seq-idempotent merge must absorb.
    */
  def rebalance(): Unit = synchronized {
    var p = 0
    while (p < nPartitions) { position(p) = committed(p); p += 1 }
  }

  private def held: Dataset[String] = {
    import spark.implicits._
    spark.createDataset(synchronized(logs.toSeq.flatten))
  }

  override def inferSchema(spark: SparkSession): StructType =
    spark.read.json(held).schema

  /** The live stream: raw JSON values parsed against the inferred envelope
    * schema — exactly the `from_json(value, schema)` shape a real Kafka
    * source yields.
    */
  override def stream(spark: SparkSession, schema: StructType): DataFrame =
    mem.toDF().select(from_json(col("value"), schema).as("e")).select("e.*")

  /** Bounded replay of the full retained log (all partitions, from offset
    * zero) — the backfill/evolution path.
    */
  override def batch(spark: SparkSession): DataFrame =
    spark.read.json(held)
}
