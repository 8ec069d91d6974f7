package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** `count_in` must be VALUE-IDENTICAL to the filter-lambda formulation
  * it replaces (q45/q46/q64/q82/q87 oracles mirror that formulation).
  */
class CountInSpec extends SparkSpec {

  test("identical to size(filter(..., IN)) on the fixture corpus") {
    graft.functions.GraftFunctions.register(spark)
    val diff = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(
        expr("count_in(toks, array('the','a','of','and','is','to','in'))").as("fast"),
        size(expr("filter(toks, t -> t IN ('the','a','of','and','is','to','in'))")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0L)
  }

  test("equals the summed per-marker counts (the q46 vote formulation)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      Seq("der", "die", "und", "der", "the"),
      Seq.empty[String],
      Seq("x"),
      Seq("und", "und", "und")
    ).toDF("toks")
    val out = rows.select(
        expr("count_in(toks, array('der','die','und'))").as("fast"),
        (size(expr("filter(toks, t -> t = 'der')")) +
         size(expr("filter(toks, t -> t = 'die')")) +
         size(expr("filter(toks, t -> t = 'und')"))).as("slow"))
      .collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // null array -> null; null tokens don't match
    assert(rows.limit(1)
      .select(expr("count_in(CAST(NULL AS ARRAY<STRING>), array('x'))"))
      .head().isNullAt(0))
    val withNull = spark.sql(
      "SELECT count_in(array('a', CAST(NULL AS STRING), 'b'), array('a','b'))")
      .head().getInt(0)
    assert(withNull === 2)
  }
}
