package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Registry

/** Plan-inspection main: prints the formatted physical plan of each named
  * query (all queries when no names are given) over a small sf dir. The
  * operational twin of PlanSpec — use it to eyeball pushdown/broadcast/
  * exchange placement before pinning a property as a test.
  *
  * Usage: PlanDump [sfDir] [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.all.map(_.name)
    val spark = graft.engine.GraftSession.getOrCreate()
    names.foreach { n =>
      println(s"========== $n ==========")
      println(Registry.byName(n).build(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
