package graft.model

import graft.types.UdtMapper

/** One column of a CDC-materialized table: name, source udt, PK flag.
  * Mirrors the reference's columns-file row (README.md:42) and
  * information_schema read (add_output.py:312-343).
  */
final case class ColSpec(name: String, udt: String, isPrimaryKey: Boolean) {
  lazy val mapped: UdtMapper.Mapped = UdtMapper.map(udt)
  /** Warehouse identifiers are upper-cased (add_output.py:226,305,363,437). */
  def warehouseName: String = name.toUpperCase
}

/** Schema source for one table pipeline (R27). */
final case class TableSpec(fullTableName: String, cols: Seq[ColSpec]) {
  def pkCols: Seq[ColSpec] = cols.filter(_.isPrimaryKey)
  def colNames: Seq[String] = cols.map(_.name)
}

object TableSpec {

  /** Loads the CSV columns file:
    * `full_table_name,column_name,udt_name,is_primary_key` (no header),
    * grouped per table preserving file order (= ordinal_position).
    */
  def loadCsv(path: String): Map[String, TableSpec] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val rows = src.getLines().map(_.trim).filter(_.nonEmpty).map { line =>
        val parts = line.split(",", -1).map(_.trim)
        require(parts.length == 4, s"bad columns-file line: $line")
        (parts(0), ColSpec(parts(1), parts(2), parts(3).equalsIgnoreCase("true")))
      }.toSeq
      rows.groupBy(_._1).map { case (t, rs) => t -> TableSpec(t, rs.map(_._2)) }
    } finally src.close()
  }

  /** R27 live-catalog read (add_output.py:312-343): the exact
    * information_schema query the reference issues against the source
    * database. This environment has no JDBC driver or network, so the SQL
    * is generated (and unit-tested) for callers that bring their own
    * connection; `fromCatalogRows` turns the fetched rows into a spec.
    */
  def informationSchemaSql(fullTableName: String): String = {
    // table names come from operator config / CSV — escape quotes so a
    // hostile or malformed name can't break out of the SQL string literal
    val safe = fullTableName.replace("'", "''")
    val schema = safe.split('.').head
    s"SELECT CONCAT(table_schema, '.', table_name) as table_name, column_name, data_type, " +
      s"CASE WHEN column_key = 'PRI' THEN 'true' else 'false' end as is_primary_key " +
      s"FROM information_schema.columns c " +
      s"WHERE TABLE_SCHEMA = '$schema' and CONCAT(table_schema, '.', table_name) = '$safe' " +
      s"ORDER BY ordinal_position"
  }

  /** Rows as fetched by [[informationSchemaSql]]:
    * (column_name, data_type, is_primary_key) in ordinal order.
    */
  def fromCatalogRows(fullTableName: String, rows: Seq[(String, String, Boolean)]): TableSpec =
    TableSpec(fullTableName, rows.map { case (n, udt, pk) => ColSpec(n, udt, pk) })
}
