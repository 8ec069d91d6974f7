package graft

import org.apache.spark.sql.functions._
import graft.functions.Pca

/** Distributed PCA / whitening (`Pca.moments/fit/transform`, gated
  * upstream as q94's covariance): the treeAggregate moments must be
  * partition-count-invariant, the Jacobi eigensolve must actually
  * diagonalize the covariance, and the map-side literal-HOF transform
  * must reproduce the model it was fitted from (projected covariance =
  * eigenvalue diagonal; whitened variance = 1).
  */
class PcaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val d = 64

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val model = Pca.fit(emb, "embedding", d)

  test("moments are identical at any partitioning (exact integer sums)") {
    val (n1, a1, b1) = Pca.moments(emb.repartition(1), "embedding", d)
    val (n2, a2, b2) = Pca.moments(emb.repartition(7), "embedding", d)
    assert(n1 === n2)
    assert(a1.toSeq === a2.toSeq, "linear sums must not depend on partitioning")
    assert(b1.toSeq === b2.toSeq, "product sums must not depend on partitioning")
  }

  test("eigenvalues are descending and non-negative; eigenvectors orthonormal") {
    val ev = model.eigenvalues
    assert(ev.length === d)
    ev.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    // covariance is PSD, so no eigenvalue may be meaningfully negative
    assert(ev.last > -1e-9, s"negative eigenvalue ${ev.last}")
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => model.components(i)(k) * model.components(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"components ($i, $j) dot $dot, want $want")
    }
  }

  test("eigendecomposition reconstructs the covariance (V Λ Vᵀ = C)") {
    val (n, s1, s2) = Pca.moments(emb, "embedding", d)
    var maxErr = 0.0
    for (i <- 0 until d; j <- i until d) {
      val c = Pca.covEntry(n, s1, s2, d, i, j)
      val rec = (0 until d).map(k =>
        model.eigenvalues(k) * model.components(k)(i) * model.components(k)(j)).sum
      maxErr = math.max(maxErr, math.abs(c - rec))
    }
    info(f"max |C - VΛVᵀ| = $maxErr%.3e")
    assert(maxErr < 1e-9, s"reconstruction error $maxErr")
  }

  test("projected covariance is the eigenvalue diagonal; whitening gives unit variance") {
    val k = 8
    val proj = Pca.transform(emb, "embedding", model, k).select(col("proj"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    // projections are already centered (mean subtracted pre-rotation)
    for (a <- 0 until k) {
      val mean = proj.map(_(a)).sum / n
      assert(math.abs(mean) < 1e-6, s"projected dim $a mean $mean")
      for (b <- a until k) {
        val cov = proj.map(p => (p(a) - mean) * p(b)).sum / n
        val want = if (a == b) model.eigenvalues(a) else 0.0
        assert(math.abs(cov - want) < 1e-6,
          s"projected cov($a,$b) = $cov, want $want")
      }
    }
    val white = Pca.transform(emb, "embedding", model, k, whiten = true)
      .select(col("proj")).collect().map(_.getSeq[Double](0).toArray)
    for (a <- 0 until k) {
      val v = white.map(p => p(a) * p(a)).sum / n
      assert(math.abs(v - 1.0) < 1e-6, s"whitened dim $a variance $v")
    }
  }

  test("transform is map-side: no exchange, no join in the plan") {
    val p = Pca.transform(emb, "embedding", model, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PCA transform must not shuffle:\n$p")
    assert(!p.contains("Join"), s"PCA transform must not join:\n$p")
  }

  test("signFixed: first nonzero coordinate positive, magnitudes untouched, idempotent") {
    val fixed = Pca.signFixed(model)
    fixed.components.zip(model.components).foreach { case (f, o) =>
      val i = f.indexWhere(_ != 0.0)
      assert(i >= 0 && f(i) > 0.0, "first nonzero coordinate must be positive")
      assert(f.zip(o).forall { case (a, b) => a == b || a == -b },
        "orientation may only flip the whole vector")
    }
    assert(fixed.mean.toSeq === model.mean.toSeq)
    assert(fixed.eigenvalues.toSeq === model.eigenvalues.toSeq)
    val twice = Pca.signFixed(fixed)
    assert(twice.components.map(_.toSeq).toSeq === fixed.components.map(_.toSeq).toSeq,
      "sign fixing must be idempotent")
  }

  test("top-k captures most variance on the fixture (spectrum sanity)") {
    val total = model.eigenvalues.sum
    val top8 = model.eigenvalues.take(8).sum
    info(f"variance: total=$total%.4f top8=${top8 / total * 100}%.1f%%")
    assert(total > 0.0)
    // embeddings are synthetic label clusters + noise — the spectrum
    // must be non-degenerate (top-8 carries more than uniform 8/64)
    assert(top8 / total > 8.0 / 64.0)
  }
}
