package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.UdtMapper

class UdtMapperSpec extends AnyFunSuite {

  test("integer udts map to LongType / number / DbBigInt") {
    for (u <- Seq("int2", "int4", "int", "int8", "bigint", "tinyint", "smallint")) {
      val m = UdtMapper.map(u)
      assert(m.sparkType == LongType && m.logicalType == "number" && m.dbType == "DbBigInt", u)
    }
  }

  test("floating/decimal udts map to DoubleType / DbDouble (exactness loss is intentional)") {
    for (u <- Seq("double", "float", "float4", "float8", "decimal", "numeric", "money")) {
      val m = UdtMapper.map(u)
      assert(m.sparkType == DoubleType && m.dbType == "DbDouble", u)
    }
  }

  test("string-family udts map to StringType / DbString") {
    for (u <- Seq("varchar", "char", "bpchar", "text", "longtext", "mediumtext", "enum", "json", "jsonb")) {
      assert(UdtMapper.map(u).sparkType == StringType, u)
    }
  }

  test("booleans, date, timestamps") {
    assert(UdtMapper.map("bool").sparkType == BooleanType)
    assert(UdtMapper.map("bit").sparkType == BooleanType)
    val d = UdtMapper.map("date")
    assert(d.sparkType == DateType && d.isDate && d.dbType == "DbDate" && d.logicalType == "number")
    for (u <- Seq("timestamp", "timestamptz", "datetime", "time")) {
      val m = UdtMapper.map(u)
      assert(m.sparkType == TimestampType && m.dbType == "DbTimestamp" && m.logicalType == "number", u)
    }
  }

  test("leading underscore marks an array: DbVariant, [] suffix, element type kept") {
    val m = UdtMapper.map("_int4")
    assert(m.isArray && m.dbType == "DbVariant" && m.logicalType == "number[]")
    assert(m.engineType == ArrayType(LongType))
    assert(!m.isDate)
  }

  test("array of dates is variant, not DbDate") {
    val m = UdtMapper.map("_date")
    assert(m.dbType == "DbVariant" && !m.isDate)
  }

  test("variantType: DbVariant maps to Spark-4 VariantType, scalars unchanged") {
    import org.apache.spark.sql.types._
    assert(UdtMapper.map("_int4").variantType == VariantType)
    assert(UdtMapper.map("_date").variantType == VariantType)
    assert(UdtMapper.map("int4").variantType == LongType)
    assert(UdtMapper.map("varchar").variantType == StringType)
  }

  test("unknown udt falls back to string") {
    val m = UdtMapper.map("uuid")
    assert(m.sparkType == StringType && m.dbType == "DbString" && !m.known)
  }

  test("widens: same-engine-type and up-the-ladder changes only, arrays preserved") {
    // same mapped type: the matrix already coarsens these
    assert(UdtMapper.widens("int", "int8"))        // int → bigint
    assert(UdtMapper.widens("smallint", "bigint"))
    assert(UdtMapper.widens("varchar", "text"))    // varchar(n) growth / retype
    // strictly up the ladder
    assert(UdtMapper.widens("int8", "numeric"))    // integral → double
    assert(UdtMapper.widens("date", "timestamp"))
    assert(UdtMapper.widens("int", "varchar"))     // textual escape hatch
    assert(UdtMapper.widens("timestamptz", "text"))
    assert(UdtMapper.widens("_int4", "_varchar"))  // array element widening
    // narrowings and restructurings refuse
    assert(!UdtMapper.widens("numeric", "int8"))   // double → integral
    assert(!UdtMapper.widens("text", "int"))
    assert(!UdtMapper.widens("timestamp", "date"))
    assert(!UdtMapper.widens("int4", "_int4"))     // scalar → array
    assert(!UdtMapper.widens("_int4", "int4"))
    assert(!UdtMapper.widens("bool", "int"))
  }
}
