package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmTextQueries.{QualityD, QualityW}

/** `bow_score` must be VALUE-IDENTICAL to the Catalyst HOF formulation
  * it replaces (q81's oracle twin mirrors that formulation, so any
  * divergence is an oracle failure).
  */
class BowScoreSpec extends SparkSpec {

  private val wArr = QualityW.mkString(",")

  private def hof: String =
    s"""aggregate(
         transform(toks,
           w -> element_at(array($wArr),
             CAST(pmod(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT), $QualityD) AS INT) + 1)),
         0L, (acc, x) -> acc + x)"""

  test("identical to the HOF formulation on the fixture corpus") {
    graft.functions.GraftFunctions.register(spark)
    val diff = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(expr(s"bow_score(toks, array($wArr))").as("fast"),
        expr(hof).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0L)
  }

  test("edge cases: empty array, empty-string token, multi-byte UTF-8, null array") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, Seq.empty[String]),      // no tokens -> 0
      (2L, Seq("")),                // md5("") is a real bucket
      (3L, Seq("á", "漢", "the")),  // multi-byte UTF-8
      (4L, Seq("the", "the"))       // repetition accumulates
    ).toDF("id", "toks")
    val out = rows.select(col("id"),
        expr(s"bow_score(toks, array($wArr))").as("fast"),
        expr(hof).as("slow"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}"))
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) === 0L)
    val rep = out.find(_.getLong(0) == 4L).get.getLong(1)
    val single = spark.sql(s"SELECT bow_score(array('the'), array($wArr))")
      .head().getLong(0)
    assert(rep === 2 * single)
    // null array -> null
    assert(rows.limit(1)
      .select(expr(s"bow_score(CAST(NULL AS ARRAY<STRING>), array($wArr))"))
      .head().isNullAt(0))
  }
}
