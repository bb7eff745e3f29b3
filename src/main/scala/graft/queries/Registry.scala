package graft.queries

/** All declared t2 queries, keyed by name. SparkEntry exposes these to the
  * driver; additional groups (Cdc, Llm) register here as they land.
  */
object Registry {
  val groups: Seq[Seq[QDef]] = Seq(
    Relational.all,
    StreamingBatch.all,
    Cdc.all,
    Llm.all
  )

  lazy val all: Seq[QDef] = {
    val qs = groups.flatten
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    // the q-id (part before the first '_') must be unique too: two queries
    // sharing one id (the q84s incident) break id-addressed tooling like
    // SPARK_GRAFT_ONLY prefix filters and bench cross-round comparisons
    val dupId = qs.groupBy(_.name.takeWhile(_ != '_'))
      .collect { case (p, g) if g.size > 1 => s"$p (${g.map(_.name).mkString(", ")})" }
    require(dupId.isEmpty, s"duplicate query ids: ${dupId.mkString("; ")}")
    qs
  }

  lazy val byName: Map[String, QDef] = all.map(q => q.name -> q).toMap
}
