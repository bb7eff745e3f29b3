package graft.types

import org.apache.spark.sql.types._

/** Source-udt → engine type matrix (R10), mirroring the reference's behavior
  * at add_output.py:43-57 (udt_map), :278-280 (leading `_` marks a Postgres
  * array), :283-285 (unknown udt → string fallback), :286 (DbDate flag),
  * :299-302 (arrays forced to DbVariant), :355-356 (`[]` logical suffix).
  *
  * Three layers (SURVEY §1.2): the source udt name, the engine's logical
  * type (`number`/`string`/`boolean`, `[]`-suffixed for arrays) and the
  * warehouse type (DbBigInt/DbString/DbDouble/DbTimestamp/DbBoolean/DbDate/
  * DbVariant). `decimal`/`numeric`/`money` intentionally lose exactness
  * (DbDouble) for reference compatibility.
  */
object UdtMapper {

  final case class Mapped(
      sparkType: DataType,
      logicalType: String,
      dbType: String,
      isArray: Boolean,
      isDate: Boolean,
      known: Boolean) {
    /** Element type as stored in Spark; arrays wrap it. */
    def engineType: DataType = if (isArray) ArrayType(sparkType) else sparkType
    /** Spark-4 variant representation for DbVariant columns (SURVEY §1.3):
      * semi-structured values carry their own type tags instead of a frozen
      * array element type.
      */
    def variantType: DataType = if (dbType == "DbVariant") VariantType else engineType
  }

  private val bigints = Set("int2", "int4", "int", "int8", "bigint", "tinyint", "smallint")
  private val doubles = Set("double", "float", "float4", "float8", "decimal", "numeric", "money")
  private val strings = Set("varchar", "char", "bpchar", "text", "longtext", "mediumtext",
    "enum", "json", "jsonb")
  private val booleans = Set("bool", "bit")
  private val timestamps = Set("timestamp", "timestamptz", "datetime", "time")

  def map(udtRaw: String): Mapped = {
    val isArray = udtRaw.startsWith("_")
    val udt = if (isArray) udtRaw.substring(1) else udtRaw
    val (dt, logical, db, known) = udt match {
      case u if bigints(u)    => (LongType, "number", "DbBigInt", true)
      case u if doubles(u)    => (DoubleType, "number", "DbDouble", true)
      case u if strings(u)    => (StringType, "string", "DbString", true)
      case u if booleans(u)   => (BooleanType, "boolean", "DbBoolean", true)
      case "date"             => (DateType, "number", "DbDate", true)
      case u if timestamps(u) => (TimestampType, "number", "DbTimestamp", true)
      case _                  => (StringType, "string", "DbString", false) // unknown → string
    }
    Mapped(
      sparkType = dt,
      logicalType = if (isArray) logical + "[]" else logical,
      dbType = if (isArray) "DbVariant" else db,
      isArray = isArray,
      isDate = db == "DbDate" && !isArray,
      known = known)
  }

  /** Is an in-place udt change `from` → `to` a WIDENING — re-castable over
    * the stored wire strings without information loss, so evolution can
    * adopt it with a replay instead of a manual re-sync? True when the
    * mapped engine types are equal (the matrix already coarsens e.g.
    * int→bigint and varchar(n) growth to one Spark type) or move strictly
    * up the ladder: integral → double (the matrix's own decimal/numeric
    * representation), date → timestamp, anything → string (the textual
    * escape hatch). Array-ness must be preserved (scalar↔array is a
    * restructuring, not a retype); everything else — e.g. text → int,
    * double → bigint — is a narrowing and must be refused loudly.
    */
  def widens(from: String, to: String): Boolean = {
    val f = map(from); val t = map(to)
    if (f.isArray != t.isArray) false
    else if (f.sparkType == t.sparkType) true
    else (f.sparkType, t.sparkType) match {
      case (LongType, DoubleType)    => true
      case (DateType, TimestampType) => true
      case (_, StringType)           => true
      case _                         => false
    }
  }
}
