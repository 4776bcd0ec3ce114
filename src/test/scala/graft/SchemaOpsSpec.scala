package graft

import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{SchemaOps, TypeMapping}

/** Collect-and-compare unit tests for the schema-op core, including the
  * port of the reference's one real correctness test
  * (`tests/unit/test_spark_utils.py:45-77`).
  */
class SchemaOpsSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("alignTo adds missing target column as typed null (reference align_schema test)") {
    val df = Seq(("1", "John"), ("2", "Jane")).toDF("id", "name")
    val target = StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("age", IntegerType)))
    val out = SchemaOps.alignTo(df, target)
    assert(out.schema == target)
    assert(out.collect().toSet ==
      Set(Row("1", "John", null), Row("2", "Jane", null)))
  }

  test("alignTo casts existing columns and appends extras last") {
    val df = Seq((1, "2.5", "x")).toDF("a", "b", "extra")
    val target = StructType(Seq(
      StructField("a", LongType),
      StructField("b", DoubleType)))
    val out = SchemaOps.alignTo(df, target)
    assert(out.columns.toSeq == Seq("a", "b", "extra"))
    assert(out.schema("a").dataType == LongType)
    assert(out.schema("b").dataType == DoubleType)
    assert(out.collect().head == Row(1L, 2.5, "x"))
  }

  test("conformOrder reorders + null-fills but does not cast") {
    val df = Seq(("x", 1)).toDF("b", "a")
    val target = StructType(Seq(
      StructField("a", LongType),   // df has Integer — must stay Integer
      StructField("c", StringType)))
    val out = SchemaOps.conformOrder(df, target)
    assert(out.columns.toSeq == Seq("a", "c", "b"))
    assert(out.schema("a").dataType == IntegerType)
    assert(out.collect().head == Row(1, null, "x"))
  }

  test("castTo casts only common columns, keeps df order") {
    val df = Seq((1, "x")).toDF("a", "b")
    val target = StructType(Seq(StructField("a", DoubleType),
      StructField("zzz", StringType)))
    val out = SchemaOps.castTo(df, target)
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.schema("a").dataType == DoubleType)
  }

  test("diff reports missing/extra/type-mismatch") {
    val s1 = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("b", IntegerType),
      StructField("c", DateType)))
    val d = SchemaOps.diff(s1, s2)
    assert(d.missingInSource.map(_.name) == Seq("c"))
    assert(d.extraInSource.map(_.name) == Seq("a"))
    assert(d.typeMismatches == Seq(("b", StringType, IntegerType)))
  }

  test("normalizeNames: lowercase, space/hyphen to underscore, parens stripped") {
    assert(SchemaOps.normalizeName("Marketing Opt-In") == "marketing_opt_in")
    assert(SchemaOps.normalizeName("Amount (USD)") == "amount_usd")
    val df = Seq((1, true)).toDF("Page Views", "Opt-In (email)")
    assert(SchemaOps.normalizeNames(df).columns.toSeq ==
      Seq("page_views", "opt_in_email"))
  }

  test("stampCreatedAt prepends a fixed-instant timestamp column") {
    val df = Seq((1, "a")).toDF("x", "y")
    val at = Instant.parse("2026-01-01T00:00:00Z")
    val out = SchemaOps.stampCreatedAt(df, at)
    assert(out.columns.toSeq == Seq("created_at", "x", "y"))
    assert(out.schema("created_at").dataType == TimestampType)
    assert(out.select("created_at").distinct().collect().head.getTimestamp(0)
      == java.sql.Timestamp.from(at))
  }

  test("unionByNameAll null-fills missing columns across frames") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, true)).toDF("id", "b")
    val out = SchemaOps.unionByNameAll(Seq(a, b))
    assert(out.columns.toSet == Set("id", "a", "b"))
    assert(out.count() == 2)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[String]("a") == "x" && rows(0).isNullAt(rows(0).fieldIndex("b")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("a")) && rows(1).getAs[Boolean]("b"))
  }

  test("withDefaults fills string/boolean/int defaults (dormant C5)") {
    val schema = StructType(Seq(StructField("s", StringType),
      StructField("bo", BooleanType), StructField("i", IntegerType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(null, null, null), Row("v", true, 7)), schema)
    val rows = SchemaOps.withDefaults(df).orderBy("i").collect()
    assert(rows(0) == Row("Unknown", false, 0))
    assert(rows(1) == Row("v", true, 7))
  }

  test("datesToTimestamps casts DateType columns only") {
    val df = Seq((java.sql.Date.valueOf("2024-05-01"), "keep"))
      .toDF("d", "s")
    val out = SchemaOps.datesToTimestamps(df)
    assert(out.schema("d").dataType == TimestampType)
    assert(out.schema("s").dataType == StringType)
  }

  test("TypeMapping renders the closed universe and rejects outside types") {
    assert(TypeMapping.render(DecimalType(12, 2)) == "decimal(12,2)")
    assert(TypeMapping.render(ArrayType(FloatType)) == "array<float>")
    assert(TypeMapping.render(
      StructType(Seq(StructField("a", MapType(StringType, LongType)))))
      == "struct<a:map<string,bigint>>")
    intercept[IllegalArgumentException] {
      TypeMapping.render(CalendarIntervalType)
    }
  }
}
