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

  test("typed(variantArrays): DbVariant columns become VariantType, same JSON at the boundary") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.VariantType
    import graft.cdc.CdcPipeline
    import graft.model.TableSpec
    import graft.queries.Cdc
    val env = CdcPipeline.readBatch(spark, Cdc.Fixtures.eventsPath)
    val flat = CdcPipeline.expanded(CdcPipeline.forTable(env, "shop.orders"))
    val spec = TableSpec.loadCsv(Cdc.Fixtures.columnsPath)("shop.orders")
    val variant = CdcPipeline.typed(flat, spec, variantArrays = true)
    assert(variant.schema("row_tags").dataType == VariantType)
    // element extraction through the variant path
    val first = variant.filter(col("row_tags").isNotNull)
      .select(expr("variant_get(row_tags, '$[0]', 'long')").as("t0")).limit(1).collect()
    assert(first.nonEmpty && !first.head.isNullAt(0))
    // sink boundary: identical JSON to the ArrayType representation
    val arrayJson = CdcPipeline.typed(flat, spec)
      .select(col("seq"), to_json(col("row_tags")).as("j")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val variantJson = variant
      .select(col("seq"), to_json(col("row_tags")).as("j")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(variantJson == arrayJson)
  }

  test("missing struct path throws") {
    intercept[IllegalArgumentException] { Flatten.columns(df, "nope", "p_") }
  }
}
