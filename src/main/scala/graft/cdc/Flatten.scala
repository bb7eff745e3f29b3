package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Star-expansion of nested structs into prefixed flat columns — the
  * reference's `shouldFlatten` + `row_*`/`old_row_*` projection semantics
  * (R4/R6; README.md:21-22,34; add_output.py:114). Nested structs flatten
  * recursively with `_`-joined names.
  */
object Flatten {

  /** Leaf columns under `structPath`, each aliased `prefix + leafName`
    * (nested leaves join intermediate names with `sep`).
    */
  def columns(df: DataFrame, structPath: String, prefix: String, sep: String = "_"): Seq[Column] = {
    def fieldAt(schema: StructType, path: Seq[String]): Option[org.apache.spark.sql.types.DataType] =
      path match {
        case Nil => Some(schema)
        case h +: t =>
          schema.fields.find(_.name == h).flatMap { f =>
            (f.dataType, t) match {
              case (s: StructType, _) => fieldAt(s, t)
              case (other, Nil)       => Some(other)
              case _                  => None
            }
          }
      }
    val root = fieldAt(df.schema, structPath.split('.').toSeq)
      .getOrElse(throw new IllegalArgumentException(s"no struct at $structPath"))
    root match {
      case s: StructType => leaves(s, structPath, "")(prefix, sep)
      case _ => Seq(col(structPath).as(prefix + structPath.split('.').last))
    }
  }

  private def leaves(s: StructType, path: String, name: String)(prefix: String, sep: String): Seq[Column] =
    s.fields.toSeq.flatMap { f =>
      val p = s"$path.${quote(f.name)}"
      val n = if (name.isEmpty) f.name else s"$name$sep${f.name}"
      f.dataType match {
        case nested: StructType => leaves(nested, p, n)(prefix, sep)
        case _                  => Seq(col(p).as(prefix + n))
      }
    }

  private def quote(n: String): String = if (n.matches("[A-Za-z0-9_]+")) n else s"`$n`"

  /** Flattens the whole frame: non-struct columns kept as-is, each struct
    * column expanded with its own name as prefix (`row` → `row_*`).
    */
  def flattenAll(df: DataFrame, sep: String = "_"): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: StructType => columns(df, f.name, f.name + sep, sep)
        case _             => Seq(col(quote(f.name)))
      }
    }
    df.select(cols: _*)
  }
}
