package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface probes for corners users hit in production: unqualified
  * DELETE, BY NAME inserts, and REPLACE WHERE conflicts.
  */
class SqlSurfaceProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def sql(q: String) = spark.sql(q)

  test("DELETE FROM with no WHERE empties the table as one commit") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.surf")
    sql("DROP TABLE IF EXISTS graft.surf.d")
    sql("CREATE TABLE graft.surf.d (id BIGINT)")
    sql("INSERT INTO graft.surf.d SELECT id FROM range(0, 100)")
    sql("DELETE FROM graft.surf.d")
    assert(sql("SELECT count(*) FROM graft.surf.d").as[Long].head == 0L)
    sql("INSERT INTO graft.surf.d SELECT id FROM range(0, 5)")
    assert(sql("SELECT count(*) FROM graft.surf.d").as[Long].head == 5L)
  }

  test("INSERT INTO ... BY NAME resolves reordered and missing columns") {
    sql("DROP TABLE IF EXISTS graft.surf.bn")
    sql("CREATE TABLE graft.surf.bn (id BIGINT, k STRING, v DOUBLE)")
    sql("INSERT INTO graft.surf.bn BY NAME " +
      "SELECT 'x' AS k, 1.5 AS v, 7 AS id")
    val r = sql("SELECT id, k, v FROM graft.surf.bn").collect().head
    assert((r.getLong(0), r.getString(1), r.getDouble(2)) == ((7L, "x", 1.5)))
    // missing nullable column null-fills under BY NAME
    sql("INSERT INTO graft.surf.bn BY NAME SELECT 8 AS id, 'y' AS k")
    assert(sql("SELECT v FROM graft.surf.bn WHERE id = 8")
      .collect().head.isNullAt(0))
  }

  test("DELETE with an IN-subquery predicate routes through the row-level op") {
    sql("DROP TABLE IF EXISTS graft.surf.sq")
    sql("CREATE TABLE graft.surf.sq (id BIGINT, v DOUBLE)")
    sql("INSERT INTO graft.surf.sq SELECT id, cast(id as double) " +
      "FROM range(0, 100)")
    spark.range(0, 100, 3).toDF("kid").createOrReplaceTempView("surf_keys")
    sql("DELETE FROM graft.surf.sq WHERE id IN (SELECT kid FROM surf_keys)")
    val left = sql("SELECT id FROM graft.surf.sq").as[Long].collect().toSet
    assert(left == (0L until 100L).filterNot(_ % 3 == 0).toSet)
  }

  test("UPDATE on a nested struct field") {
    sql("DROP TABLE IF EXISTS graft.surf.ns")
    sql("CREATE TABLE graft.surf.ns " +
      "(id BIGINT, meta STRUCT<kind: STRING, score: BIGINT>)")
    sql("INSERT INTO graft.surf.ns SELECT id, " +
      "named_struct('kind', 'a', 'score', id) FROM range(0, 50)")
    sql("UPDATE graft.surf.ns SET meta.score = meta.score * 10 " +
      "WHERE id < 10")
    assert(sql("SELECT sum(meta.score) FROM graft.surf.ns")
      .as[Long].head == (0L until 10L).map(_ * 10).sum +
        (10L until 50L).sum)
    assert(sql("SELECT count(*) FROM graft.surf.ns WHERE meta.kind = 'a'")
      .as[Long].head == 50L, "untouched nested sibling intact")
  }
}
