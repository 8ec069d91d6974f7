package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.LlmSimQueries

/** Behavior proof for the q80 SemDeDup path: the fixture corpora have
  * no pairs at the paper-scale thresholds, so the driver's oracle match
  * pins the cluster geometry and the fixture-range drop rule — this
  * spec plants REAL semantic duplicates (base vector + small
  * perturbation, cosine ~0.9995) and asserts the clustered pipeline
  * drops exactly the planted copies, each pointing at its base.
  */
class SemanticDedupSpec extends SparkSpec {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def vec(id: Long): Array[Float] =
    Array.tabulate(LlmSimQueries.AnnDim) { i =>
      (splitmix64(id * 1337L + i).toDouble / Long.MaxValue.toDouble).toFloat
    }

  private def nearDupOf(base: Array[Float], seed: Long): Array[Float] =
    base.zipWithIndex.map { case (v, i) =>
      v + 0.02f * (splitmix64(seed * 31L + i).toDouble / Long.MaxValue.toDouble).toFloat
    }

  test("planted semantic duplicates drop with dup_of = their base vector") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val nBase = 200
    val nDups = 25
    val base = (0 until nBase).map(i => (i.toLong, vec(i.toLong)))
    // planted copy 1000+j of base j: cosine ~0.9995, so it lands in the
    // same k-means cell as its base (assignment is a deterministic
    // nearest-centroid argmax over near-identical vectors)
    val dups = (0 until nDups).map(j => (1000L + j, nearDupOf(vec(j.toLong), j + 7L)))
    val e = (base ++ dups).toDF("vec_id", "embedding")

    val out = LlmSimQueries.semanticDedup(e, 0.95).collect()
    assert(out.length === nBase + nDups, "one row per vector, kept AND dropped")

    val dropped = out.filter(!_.getBoolean(2)).map(r => (r.getLong(0), r.getLong(3))).toMap
    // random 64-dim base vectors are near-orthogonal: no base pair can
    // reach 0.95, so the dropped set is EXACTLY the planted copies
    assert(dropped.keySet === (0 until nDups).map(j => 1000L + j).toSet,
      "dropped set must be exactly the planted duplicates")
    (0 until nDups).foreach { j =>
      assert(dropped(1000L + j) === j.toLong,
        s"planted copy ${1000 + j} must point at its base $j")
    }
    // every dropped vector shares its cell with its base (the method
    // only ever prunes within a cell)
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until nDups).foreach { j =>
      assert(cellOf(1000L + j) === cellOf(j.toLong))
    }
  }

  test("q80 plan: pair space confined to the cell join, no product, dup verdict broadcasts") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    val df = LlmSimQueries.semanticDedupFrame(e, LlmSimQueries.SemDedupT)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell pruning must never become an all-pairs product:\n$p")
    // the pair join must be an EQUI-join keyed on the cell id (at this
    // SF one side broadcasts; at scale it shuffles on cell — both keep
    // the pair space O(n²/C), which is the property under guard)
    assert(p.contains("Right keys [1]: [cell_b"),
      s"the pair join must key on the cell id:\n$p")
    // corpus-sized shuffles: at most the cell-keyed pair-join sides,
    // the dup aggregation, and the verdict join key — never more
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 4,
      s"unexpected extra corpus shuffle:\n$p")
    // at runtime AQE must collapse the kept/dropped verdict join to a
    // broadcast of the tiny dup set, not a corpus re-shuffle
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin") &&
      executed.toLowerCase.contains("leftouter"),
      s"the dup verdict must broadcast at runtime:\n$executed")
  }
}
