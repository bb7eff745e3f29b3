package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ColSpec, TableSpec}
import graft.sink.SnowflakeSqlGen

class SnowflakeSqlGenSpec extends AnyFunSuite {

  private val spec = TableSpec("shop.orders", Seq(
    ColSpec("id", "int", isPrimaryKey = true),
    ColSpec("amount", "decimal", isPrimaryKey = false),
    ColSpec("tags", "_int4", isPrimaryKey = false),
    ColSpec("created", "datetime", isPrimaryKey = false)))

  test("createTable: upper-cased identifiers, variant for arrays, SEQ column, IF NOT EXISTS") {
    val ddl = SnowflakeSqlGen.createTable("db", "public", spec)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS DB.PUBLIC.ORDERS"))
    assert(ddl.contains("ID BIGINT"))
    assert(ddl.contains("AMOUNT DOUBLE"))
    assert(ddl.contains("TAGS VARIANT"))
    assert(ddl.contains("CREATED TIMESTAMP_NTZ"))
    assert(ddl.contains("SEQ BIGINT"))
  }

  test("merge: per-key dedup source, SEQ replay guard, hard delete, no insert of deletes") {
    val m = SnowflakeSqlGen.merge("db", "public", spec)
    assert(m.contains("ON t.ID = s.ID"))
    assert(m.contains("QUALIFY ROW_NUMBER() OVER (PARTITION BY ID ORDER BY SEQ DESC) = 1"))
    assert(m.contains("WHEN MATCHED AND s.SEQ > t.SEQ AND s.IS_DELETE THEN DELETE"))
    assert(m.contains("WHEN MATCHED AND s.SEQ > t.SEQ THEN UPDATE SET"))
    assert(m.contains("t.SEQ = s.SEQ"))
    assert(m.contains("WHEN NOT MATCHED AND NOT s.IS_DELETE"))
  }

  test("merge logical mode: IS_DELETED column instead of DELETE clause") {
    val m = SnowflakeSqlGen.merge("db", "public", spec, logicalDeletes = true)
    assert(!m.contains("THEN DELETE"))
    assert(m.contains("t.IS_DELETED = s.IS_DELETE"))
  }

  test("information_schema catalog SQL mirrors the reference's live read (R27)") {
    val sql = TableSpec.informationSchemaSql("shop.orders")
    assert(sql ==
      "SELECT CONCAT(table_schema, '.', table_name) as table_name, column_name, data_type, " +
        "CASE WHEN column_key = 'PRI' THEN 'true' else 'false' end as is_primary_key " +
        "FROM information_schema.columns c " +
        "WHERE TABLE_SCHEMA = 'shop' and CONCAT(table_schema, '.', table_name) = 'shop.orders' " +
        "ORDER BY ordinal_position")
    val fetched = TableSpec.fromCatalogRows("shop.orders",
      Seq(("id", "int", true), ("amount", "decimal", false)))
    assert(fetched.pkCols.map(_.name) == Seq("id"))
    assert(fetched.cols.map(_.udt) == Seq("int", "decimal"))
  }

  test("merge requires an upsert key") {
    val noPk = spec.copy(cols = spec.cols.map(_.copy(isPrimaryKey = false)))
    intercept[IllegalArgumentException] { SnowflakeSqlGen.merge("db", "public", noPk) }
  }
}
