package graft

import org.apache.spark.sql.functions._

/** Tolerance-based checks for the approximate functions excluded from
  * the t2 hash-match set (SURVEY.md §2.11 exclusions: HLL count-distinct
  * and approximate percentiles are non-deterministic across engines, so
  * they get property/tolerance tests instead of DuckDB hashes).
  */
class ApproxFunctionsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact percentile") {
    val ev = Tables.load(spark, sf, "events")
    val row = ev.agg(
      expr("percentile(value, 0.95)").as("exact"),
      expr("percentile_approx(value, 0.95, 1000)").as("approx"),
      min(col("value")).as("lo"), max(col("value")).as("hi")).collect().head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    val span = row.getDouble(3) - row.getDouble(2)
    // within 2% of the value range of the exact p95
    assert(math.abs(approx - exact) <= 0.02 * span, s"approx=$approx exact=$exact span=$span")
  }

  test("hll estimate is deterministic run-to-run (same plan, same answer)") {
    val li = Tables.load(spark, sf, "lineitem")
    val a = li.agg(approx_count_distinct(col("l_suppkey"))).collect().head.getLong(0)
    val b = li.agg(approx_count_distinct(col("l_suppkey"))).collect().head.getLong(0)
    assert(a === b)
  }
}
