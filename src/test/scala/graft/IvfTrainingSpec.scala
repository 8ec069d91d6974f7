package graft

import org.apache.spark.sql.functions._
import graft.queries.LlmSimQueries._

/** Centroid training for the IVF index (q63): fixed-seed, fixed-
  * iteration Lloyd refinement must (a) stay deterministic across runs
  * and (b) produce better-balanced cells than the first-C seeds —
  * balance is what bounds the worst-case inverted-list scan at query
  * time, so it IS the scale property.
  */
class IvfTrainingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def occupancy(iters: Int): Seq[Long] = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    val cents = ivfCentroids(e, IvfC, iters)
    ivfAssign(e, cents).groupBy(col("cell")).count()
      .collect().map(_.getLong(1)).toSeq
  }

  test("trained centroids balance cells better than first-C seeds") {
    val before = occupancy(0)
    val after = occupancy(IvfIters)
    val n = before.sum
    assert(after.sum === n, "every vector stays assigned to exactly one cell")
    def variance(xs: Seq[Long]): Double = {
      val mean = xs.sum.toDouble / xs.size
      xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    }
    val (vB, vA) = (variance(before), variance(after))
    info(f"first-C: cells=${before.size} max=${before.max} occ-variance=$vB%.1f")
    info(f"trained: cells=${after.size} max=${after.max} occ-variance=$vA%.1f")
    // occupancy variance is the balance statistic (max alone is noisy at
    // 500 rows — a single boundary vector moves it); training must
    // flatten the distribution and never grow the hottest cell
    assert(vA < vB, s"training must flatten cell occupancy: $vA vs $vB")
    assert(after.max <= before.max)
  }

  test("training is deterministic: identical centroids on re-run") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    def snap(): Seq[(Int, Seq[Float])] =
      ivfCentroids(e).collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    assert(snap() === snap())
  }
}
