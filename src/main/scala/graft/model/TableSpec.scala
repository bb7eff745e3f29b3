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
}
