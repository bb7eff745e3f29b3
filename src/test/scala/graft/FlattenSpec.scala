package graft

import graft.cdc.Flatten

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.read.json(Seq(
    """{"a": 1, "s": {"x": "v", "n": {"y": 2}}, "t": {"z": true}}""").toDS())

  test("columns() expands leaves with prefix and _-joined nesting") {
    val out = df.select(Flatten.columns(df, "s", "row_"): _*)
    assert(out.columns.toSet == Set("row_x", "row_n_y"))
    val r = out.collect().head
    assert(r.getAs[String]("row_x") == "v" && r.getAs[Long]("row_n_y") == 2L)
  }

  test("flattenAll keeps scalars and prefixes each struct with its own name") {
    val out = Flatten.flattenAll(df)
    assert(out.columns.toSet == Set("a", "s_x", "s_n_y", "t_z"))
  }

  test("missing struct path throws") {
    intercept[IllegalArgumentException] { Flatten.columns(df, "nope", "p_") }
  }
}
