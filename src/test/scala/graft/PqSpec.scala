package graft

import org.apache.spark.sql.functions._
import graft.queries.LlmSimQueries._

/** Product-quantization invariants behind q109: deterministic training
  * (identical codebooks at any partition layout), Lloyd actually
  * reduces quantization distortion, encoding is total and in-range,
  * and the ADC-shortlist → exact-rerank compose hits its recall floor
  * against brute-force cosine (the hash gate pins determinism; recall
  * is the APPROXIMATION quality and needs its own pin, the q63
  * IvfTrainingSpec convention).
  */
class PqSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def corpus = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
  }

  test("codebooks are partition-layout-invariant (order-free treeAggregate)") {
    val a = pqCodebooks(corpus.repartition(3))
    val b = pqCodebooks(corpus.repartition(8))
    assert(a.length == b.length)
    a.indices.foreach { s =>
      assert(a(s).map(_._1) == b(s).map(_._1))
      a(s).zip(b(s)).foreach { case ((_, ca), (_, cb)) =>
        assert(ca.sameElements(cb), s"subspace $s codewords differ across layouts")
      }
    }
  }

  test("Lloyd training reduces total quantization distortion vs the init codebooks") {
    val e = corpus.cache()
    try {
      val init = pqCodebooks(e, iters = 0)
      val trained = pqCodebooks(e)
      val rows = e.select(col("embedding")).collect().map(_.getSeq[Float](0))
      def distortion(books: Array[IndexedSeq[(Int, Array[Float])]]): Double =
        rows.map { emb =>
          (0 until PqM).map { s =>
            books(s).map { case (_, c) =>
              (0 until PqDsub).map { i =>
                val d = emb(s * PqDsub + i).toDouble - c(i).toDouble
                d * d
              }.sum
            }.min
          }.sum
        }.sum
      val d0 = distortion(init)
      val d2 = distortion(trained)
      assert(d2 < d0, s"training must reduce distortion: init $d0, trained $d2")
      // sanity on MAGNITUDE (the quantized-moments lesson): trained
      // distortion must be a real fraction of the signal, not 1e8 off
      assert(d2 > 0.0 && d2 < d0 * 0.95)
    } finally e.unpersist()
  }

  test("encoding is total and in-range; map-side (no exchange in the encode plan)") {
    val e = corpus
    val books = pqCodebooks(e)
    val codes = pqEncode(e, books).cache()
    try {
      assert(codes.count() === e.count())
      (0 until PqM).foreach { s =>
        val bad = codes.filter(col(s"code$s") < 0 || col(s"code$s") >= PqK).count()
        assert(bad === 0L, s"subspace $s produced out-of-range codes")
      }
      val plan = pqEncode(e, books).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), "PQ encoding must not shuffle the corpus")
    } finally codes.unpersist()
  }

  private def recallAt5(query: String): Double = {
    val got = SparkEntry.queries(query)(spark, sf)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = corpus.cache()
    val truth = try {
      val qs = e.filter(col("vec_id") < PqQueryCount)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", expr("dotp(q_emb, embedding)") / (col("q_nrm") * col("nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally e.unpersist()
    truth.count(got.contains).toDouble / truth.size
  }

  test("ADC shortlist + exact rerank: recall@5 >= 0.7 vs brute-force cosine") {
    val recall = recallAt5("q109_ann_pq")
    assert(recall >= 0.7, s"q109 recall@5 $recall below floor")
  }

  test("IVF-PQ compose (q111): cell pruning + residual codes keep recall@5 >= 0.7") {
    // the residual trick must not LOSE recall vs raw-vector PQ at the
    // same bit budget even with the scan cut to nprobe cells
    val recall = recallAt5("q111_ann_ivfpq")
    assert(recall >= 0.7, s"q111 recall@5 $recall below floor")
  }
}
