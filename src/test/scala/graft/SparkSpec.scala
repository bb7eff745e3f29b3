package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** Shared session for all suites (one per JVM; sbt forks a single test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Persistent RDDs that a managed-scope operator leaked. localCheckpoint
    * blocks (e.g. Bpe.learn's periodic lineage truncation) are excluded:
    * they are ContextCleaner-managed and released on GC, so their presence
    * depends on JVM timing, not on any operator's cache discipline.
    */
  def leakedCaches: Map[Int, org.apache.spark.rdd.RDD[_]] =
    spark.sparkContext.getPersistentRDDs.toMap
      .filterNot(_._2.toString.contains("localCheckpoint"))
}
