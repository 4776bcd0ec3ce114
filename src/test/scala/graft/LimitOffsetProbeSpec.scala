package graft

import org.scalatest.funsuite.AnyFunSuite

/** LIMIT+OFFSET over the pushed-limit file prefix: Spark must push a
  * value covering offset+limit (its LocalLimit below Offset), so the
  * prefix still guarantees enough rows. Pinned empirically — an
  * under-planned prefix would return fewer rows than the limit.
  */
class LimitOffsetProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSparkSession.spark

  test("LIMIT with OFFSET returns exactly the limit under prefix planning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.probe")
    spark.sql("DROP TABLE IF EXISTS graft.probe.lo")
    spark.sql("CREATE TABLE graft.probe.lo (id BIGINT)")
    (0 until 20).foreach { i =>
      spark.sql(s"INSERT INTO graft.probe.lo SELECT /*+ REPARTITION(1) */ " +
        s"id FROM range(${i * 100}, ${i * 100 + 100})")
    }
    assert(spark.sql("SELECT * FROM graft.probe.lo LIMIT 150 OFFSET 100")
      .collect().length == 150)
    assert(spark.sql("SELECT * FROM graft.probe.lo LIMIT 1900 OFFSET 150")
      .collect().length == 1850)
    assert(spark.sql("SELECT * FROM graft.probe.lo OFFSET 1990")
      .collect().length == 10)
  }
}
