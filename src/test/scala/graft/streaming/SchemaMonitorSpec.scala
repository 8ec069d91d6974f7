package graft.streaming

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Compatibility verdicts (SURVEY.md §2.9 T10): additive ok; removal or
  * narrowing incompatible (`streaming/schema_monitor.py:51-130` policy).
  */
class SchemaMonitorSpec extends AnyFunSuite {
  private val base = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("identical schemas → Unchanged") {
    assert(SchemaMonitor.diff(base, base) === SchemaMonitor.Unchanged)
  }

  test("added column → Compatible") {
    val next = base.add(StructField("age", IntegerType))
    assert(SchemaMonitor.diff(base, next) === SchemaMonitor.Compatible(Seq("age")))
  }

  test("removed column → Incompatible") {
    val next = StructType(base.fields.filter(_.name != "name"))
    SchemaMonitor.diff(base, next) match {
      case SchemaMonitor.Incompatible(rs) => assert(rs.exists(_.contains("name removed")))
      case other => fail(s"expected Incompatible, got $other")
    }
  }

  test("type widening (int → long) → not incompatible") {
    val prev = StructType(Seq(StructField("id", IntegerType)))
    val next = StructType(Seq(StructField("id", LongType)))
    assert(SchemaMonitor.diff(prev, next) === SchemaMonitor.Unchanged)
  }

  test("type narrowing (long → int) → Incompatible") {
    val prev = StructType(Seq(StructField("id", LongType)))
    val next = StructType(Seq(StructField("id", IntegerType)))
    SchemaMonitor.diff(prev, next) match {
      case SchemaMonitor.Incompatible(rs) => assert(rs.exists(_.contains("changed")))
      case other => fail(s"expected Incompatible, got $other")
    }
  }

  test("string → long change → Incompatible") {
    val next = StructType(Seq(
      StructField("id", LongType), StructField("name", LongType)))
    assert(SchemaMonitor.diff(base, next).isInstanceOf[SchemaMonitor.Incompatible])
  }
}
