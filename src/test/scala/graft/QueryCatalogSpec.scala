package graft

/** Catalog contract smoke (the full oracle hash-match runs via
  * `graft.Verify` + DuckDB — this spec guards the structural invariants
  * cheaply inside `sbt test`).
  */
class QueryCatalogSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every query has an oracle twin (or is consciously rows-only)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without query impl: ${o.diff(q)}")
    assert(q === o, s"queries without oracle (weaker rows-only check): ${q.diff(o)}")
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries execute and return rows at sf0.001") {
    val sample = Seq("q03_shipping_priority", "q10_regional_revenue",
      "q24_window_ranks", "q36_tumbling_window", "q42_dedup_hash",
      "q49_cosine_topk", "q52_minhash_lsh")
    sample.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("query names are unique across sub-catalogs") {
    val parts = Seq(
      queries.RelationalQueries.queries, queries.WindowScalarQueries.queries,
      queries.StreamEquivQueries.queries, queries.LlmTextQueries.queries,
      queries.LlmSimQueries.queries, queries.CdcOpQueries.queries)
    assert(parts.map(_.size).sum === SparkEntry.queries.size, "duplicate query names collapse in the merged map")
  }
}
