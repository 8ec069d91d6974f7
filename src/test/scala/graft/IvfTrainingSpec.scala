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

  test("recall pin: IVF(nprobe=2) recall@5 vs exact top-k stays above the measured floor") {
    // q63's oracle twin replicates the IVF geometry in SQL, so the hash
    // gate proves the INDEX is computed right — not that the index is
    // any GOOD. This pins the serving quality against the exact q49
    // answer: measured 0.78 mean recall@5 on this fixture (nprobe=2 of
    // 16 cells); a centroid/probe/geometry change that silently
    // degrades retrieval fails HERE, not in production.
    def topk(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk("q49_cosine_topk")
    val ivf = topk("q63_ann_ivf")
    assert(exact.nonEmpty, "exact top-k returned nothing — pin is vacuous")
    val recalls = exact.map { case (q, want) =>
      ivf.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@5 over ${recalls.size} queries: mean=$mean%.3f min=${recalls.min}%.2f")
    assert(mean >= 0.75, f"IVF mean recall@5 degraded to $mean%.3f (floor 0.75, measured 0.78)")
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
