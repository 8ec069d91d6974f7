package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmSimQueries

/** CI pins for the sketch aggregators' one-pass claims, both sides:
  *
  *  - THROUGHPUT floors on the raw reduce loops (DecoderThroughputSpec
  *    style: measured steady state on this box is 5–16 M hashes/s, the
  *    gates sit 10–20× below, so they trip only on real regressions —
  *    boxing sneaking into the hot loop, unbounded per-row state);
  *  - PLAN guards that q51/q52 carry exactly the intended shuffles:
  *    one doc-keyed hash exchange per signature aggregation and the
  *    final range sort, nothing keyed on (doc, band)/(doc, bit) — the
  *    round-1 explode-and-regroup shape that cost 10–20×.
  */
class SketchAggSpec extends SparkSpec {

  private val hashes =
    Array.tabulate(1000000)(i => (i * 2654435761L) & 0x7FFFFFFFFFFFFFL)

  private def rate(f: () => Unit): Double = {
    f() // JIT warmup
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f()
      hashes.length / ((System.nanoTime() - t0) / 1e9)
    }.max
  }

  test("MinHashAgg reduce sustains > 1M hashes/s (k=16 running minima)") {
    val mh = new graft.functions.MinHashAgg(
      LlmSimQueries.minhashA.toArray, LlmSimQueries.minhashB.toArray,
      LlmSimQueries.MinhashP)
    val r = rate { () =>
      var acc = mh.zero
      var i = 0
      while (i < hashes.length) { acc = mh.reduce(acc, hashes(i)); i += 1 }
    }
    assert(r > 1e6, f"minhash reduce $r%.0f hashes/s")
  }

  test("SimHashAgg reduce sustains > 500K hashes/s (32 counters)") {
    val sh = new graft.functions.SimHashAgg(32)
    val r = rate { () =>
      var acc = sh.zero
      var i = 0
      while (i < hashes.length) { acc = sh.reduce(acc, hashes(i)); i += 1 }
    }
    assert(r > 5e5, f"simhash reduce $r%.0f hashes/s")
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q51 plan: exactly one doc-keyed shuffle + the final sort") {
    val p = plan("q51_simhash")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size === 2, s"plan:\n$p")
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size === 1)
    assert("rangepartitioning\\(doc_id".r.findAllIn(p).size === 1)
  }

  test("q52 plan: signature aggs are the only hash shuffles; banding never re-groups") {
    // inspect the PRE-checkpoint pipeline: the shipped query
    // localCheckpoints the pair set (cache-release + lineage cut), which
    // truncates its visible plan to a Scan ExistingRDD
    val (pairs, docsH) = LlmSimQueries.minhashPairs(spark, "/root/testdata/sf0.001")
    try {
      val p = pairs.orderBy(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      // two doc-keyed aggregation shuffles (the two sides of the band
      // self-join), one range exchange for the output sort — and nothing
      // else: no exchange keyed on band/band_key (candidate join and
      // jaccard verify run broadcast off the aggregated frames)
      assert("hashpartitioning\\(doc_id".r.findAllIn(p).size === 2, s"plan:\n$p")
      assert("rangepartitioning\\(doc_a".r.findAllIn(p).size === 1)
      assert(!"hashpartitioning\\([^)]*band".r.findAllIn(p).hasNext,
        s"banding must slice the signature array, not re-shuffle:\n$p")
      assert(!p.contains("SortMergeJoin"), s"verify path must broadcast:\n$p")
    } finally docsH.unpersist()
    // and the SHIPPED query's visible (post-checkpoint) plan: nothing
    // may sneak in between the materialized pair set and the sort
    val shipped = plan("q52_minhash_lsh")
    assert("\\(\\d+\\) Exchange".r.findAllIn(shipped).size === 1,
      s"only the final sort may follow the checkpoint:\n$shipped")
  }
}
