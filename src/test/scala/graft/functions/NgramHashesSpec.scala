package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** `ngram_hashes` must be VALUE- AND ORDER-IDENTICAL to the Catalyst
  * HOF formulation it replaces (the oracle twins mirror that
  * formulation, so any divergence is an oracle failure).
  */
class NgramHashesSpec extends SparkSpec {

  private def hof(n: Int, mod: Long): String = {
    val m = if (mod > 0) s" % ${mod}L" else ""
    s"""array_distinct(transform(sequence(0, size(toks) - $n),
          i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, $n))), 1, 15), 16, 10) AS BIGINT)$m))"""
  }

  test("identical to the HOF formulation on the fixture corpus (n=3,4; with and without mod)") {
    graft.functions.GraftFunctions.register(spark)
    val toks = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
    for ((n, mod) <- Seq((3, 0L), (4, 0L), (3, graft.queries.LlmSimQueries.MinhashP))) {
      val diff = toks.select(
          expr(s"ngram_hashes(toks, $n, $mod)").as("fast"),
          expr(hof(n, mod)).as("slow"))
        .filter(not(col("fast") === col("slow")))
        .count()
      assert(diff === 0L, s"n=$n mod=$mod diverged on $diff docs")
    }
  }

  test("edge cases: short input, nulls, duplicate grams") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("a", "b")),            // shorter than n -> empty
      (2L, Seq("a", "b", "c")),       // exactly one 3-gram
      (3L, Seq("x", "y", "x", "y", "x", "y")), // repeating grams dedup
      (4L, Seq("a")),
      (5L, Seq("á", "ü", "漢", "字")) // multi-byte UTF-8
    ).toDF("id", "toks")
    // the HOF reference THROWS on docs shorter than n (sequence(0, -1)
    // drives slice with start 0) — that is why every call site had to
    // pre-filter; ngram_hashes returns an empty set instead. Compare
    // against the HOF only where it is defined.
    val out = rows.filter(size(col("toks")) >= 3)
      .select(col("id"),
        expr("ngram_hashes(toks, 3, 0)").as("fast"),
        expr(hof(3, 0)).as("slow"))
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // dedup actually happened for the repeating doc (4 windows, 2 distinct)
    assert(out.find(_.getLong(0) == 3L).get.getSeq[Long](1).length === 2)
    // shorter-than-n inputs yield the empty set, not an error
    val short = rows.filter(size(col("toks")) < 3)
      .select(expr("ngram_hashes(toks, 3, 0)")).collect()
    assert(short.length === 2 && short.forall(_.getSeq[Long](0).isEmpty))
    // null array -> null
    assert(rows.select(expr("ngram_hashes(CAST(NULL AS ARRAY<STRING>), 3, 0)"))
      .head().isNullAt(0))
  }
}
