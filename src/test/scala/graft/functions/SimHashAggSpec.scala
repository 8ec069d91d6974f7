package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SimHashAgg ≡ the explode formulation it replaced, on real fixture
  * tokens — the same identity MinHashAgg carries for its family.
  */
class SimHashAggSpec extends SparkSpec {

  test("one-pass aggregator equals the bit-explode formulation") {
    val tok = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .cache()

    val agg = udaf(new SimHashAgg(32), org.apache.spark.sql.Encoders.scalaLong)
    val got = tok.groupBy(col("doc_id")).agg(agg(col("h")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = tok
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 31)")).as("bit"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(expr("CAST(((h >> bit) & 1) * 2 - 1 AS BIGINT)")).as("score"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("score") > 0, expr("CAST(pow(2, bit) AS BIGINT)"))
        .otherwise(0L)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    tok.unpersist()
    assert(got.nonEmpty && got === want)
  }

  test("empty input yields fingerprint 0; single hash reproduces its bits") {
    val a = new SimHashAgg(32)
    assert(a.finish(a.zero) === 0L)
    val h = 0xB3D5_C1A7L
    assert(a.finish(a.reduce(a.zero, h)) === (h & 0xFFFFFFFFL))
  }

  test("aggregators are SQL-callable after GraftFunctions.register") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 7L), (1L, 7L), (2L, 0L)).toDF("k", "h").createOrReplaceTempView("shash")
    val rows = spark.sql(
      "SELECT k, simhash_agg(h) AS sh, minhash_agg(h) AS mh FROM shash GROUP BY k ORDER BY k")
      .collect()
    assert(rows(0).getLong(1) === 7L) // two 0b111 votes → bits 0..2 set
    assert(rows(1).getLong(1) === 0L)
    assert(rows(0).getSeq[Long](2).length === 16) // k=16 minhash signature
  }

  test("merge is the sum of per-partition counters") {
    val a = new SimHashAgg(8)
    val x = a.reduce(a.reduce(a.zero, 0xFFL), 0xFFL) // two all-ones
    val y = a.reduce(a.zero, 0x00L) // one all-zeros
    assert(a.finish(a.merge(x, y)) === 0xFFL) // 2-1 > 0 on every bit
  }
}
