package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an `array<float>` embedding column.
  *
  * The pipeline motivation (reference `enrich/embedder.py` produces the
  * vectors; curation consumes them for semantic dedup and ANN): embedding
  * whitening — subtract the corpus mean, rotate onto the principal axes,
  * scale to unit variance — measurably improves cosine-based near-dup and
  * retrieval quality, and the top-k eigenspectrum is the standard
  * "effective dimensionality" health check for an embedding table.
  *
  * Scale design is the MLlib Gramian pattern (`RowMatrix
  * .computeGramianMatrix` → driver-side eigensolve): the ONLY distributed
  * work is one shuffle-free `treeAggregate` pass that folds every
  * partition into `d + d(d+1)/2` exact BIGINT sums (quantized to a 1e-8
  * grid, so accumulation order cannot change a bit); partials merge
  * log-depth, and the driver receives O(d²) integers — metadata, not
  * data — however many partitions the corpus has. The d×d eigensolve
  * (cyclic Jacobi; d ≲ 1024) is driver-side O(d³) like every production
  * PCA at this shape. `transform` is then purely map-side: the mean and
  * the component matrix travel as literals inside codegen'd HOF
  * expressions — no join, no shuffle, no UDF.
  */
object Pca {

  /** Quantization grid for the moment sums. With components bounded by
    * B, a product term contributes up to B²·Q per row — at B ≈ 10 that
    * is 1e10, so overflow of a signed 64-bit sum is possible past
    * ~9e8 rows, NOT the 1e9+ a naive |x|·Q ≲ 1e9 reading suggests.
    * Every accumulation below therefore goes through `Math.addExact`:
    * an out-of-range corpus fails loudly (switch Q down, or shard and
    * combine in BigInt) instead of silently wrapping the covariance.
    * One grid for both the linear and the product sums keeps the
    * oracle SQL one expression.
    */
  val Q = 1e8

  /** Exact quantized moments of an `array<float>` column: row count,
    * per-dimension sums of floor(x·Q + 0.5), and upper-triangle sums of
    * floor(x_i·x_j·Q + 0.5) laid out row-major (i ≤ j at index
    * `i*d - i(i-1)/2 + (j-i)`). Deterministic at any partitioning.
    */
  def moments(df: DataFrame, embCol: String, d: Int): (Long, Array[Long], Array[Long]) = {
    val pairs = d * (d + 1) / 2
    import org.apache.spark.sql.Encoders
    val rows = df.select(col(embCol))
      .as[Seq[Float]](org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val (n, s1, s2) = rows.rdd.treeAggregate(
      (0L, new Array[Long](d), new Array[Long](pairs)))(
      seqOp = { case ((n, s1, s2), emb) =>
        require(emb.length == d, s"embedding dim ${emb.length} != $d")
        val e = new Array[Double](d)
        var i = 0
        while (i < d) { e(i) = emb(i).toDouble; i += 1 }
        var k = 0
        i = 0
        while (i < d) {
          s1(i) = Math.addExact(s1(i), math.floor(e(i) * Q + 0.5).toLong)
          var j = i
          while (j < d) {
            s2(k) = Math.addExact(s2(k), math.floor(e(i) * e(j) * Q + 0.5).toLong)
            j += 1; k += 1
          }
          i += 1
        }
        (n + 1L, s1, s2)
      },
      combOp = { case ((n1, a1, b1), (n2, a2, b2)) =>
        var i = 0
        while (i < a1.length) { a1(i) = Math.addExact(a1(i), a2(i)); i += 1 }
        i = 0
        while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
        (Math.addExact(n1, n2), a1, b1)
      })
    (n, s1, s2)
  }

  /** Covariance entry (i ≤ j) from the quantized moments, in the exact
    * IEEE sequence the DuckDB oracle twin uses: mean_i = (s1_i / Q) / n,
    * cov_ij = (s2_ij / Q) / n − mean_i · mean_j (the PRODUCT was
    * quantized once, so one /Q recovers it). Every operand is an
    * exactly-represented integer-valued double, so the result is
    * bit-identical across engines.
    */
  def covEntry(n: Long, s1: Array[Long], s2: Array[Long], d: Int, i: Int, j: Int): Double = {
    val nn = n.toDouble
    val k = i * d - i * (i - 1) / 2 + (j - i)
    val mi = (s1(i).toDouble / Q) / nn
    val mj = (s1(j).toDouble / Q) / nn
    ((s2(k).toDouble / Q) / nn) - mi * mj
  }

  /** Fitted model: corpus mean, eigenvalues descending, and the matching
    * unit eigenvectors (components(k) is the k-th principal axis).
    */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def d: Int = mean.length
  }

  /** Fit mean + full eigendecomposition of the covariance: one
    * treeAggregate pass, then a driver-side cyclic-Jacobi eigensolve of
    * the d×d symmetric matrix (O(d³), d is the embedding width).
    */
  def fit(df: DataFrame, embCol: String, d: Int): PcaModel = {
    val (n, s1, s2) = moments(df, embCol, d)
    require(n > 0, "cannot fit PCA on an empty corpus")
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = covEntry(n, s1, s2, d, i, j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val mean = Array.tabulate(d)(k => (s1(k).toDouble / Q) / n.toDouble)
    PcaModel(mean, values, vectors)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: rotate away the
    * largest off-diagonal entries until convergence. Returns
    * (eigenvalues descending, matching row-major unit eigenvectors).
    * Textbook numerical method (Golub & Van Loan §8.5) — O(d³) on the
    * driver, which is the right place for a d×d spectral solve.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    val tol = 1e-14 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // classic 2x2 symmetric Schur rotation
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    // sort descending by eigenvalue, carrying the eigenvector columns
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (values, vectors)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Diagonal-Mahalanobis outlier score (q96's math, shared so composed
    * pipelines screen with the same integers): Σ_i (x_i − μ_i)²/σ²_i
    * with per-dimension terms quantized to BIGINT before the row sum —
    * accumulation-order-free, twin-reproducible. Pass 1 is the
    * shuffle-free `moments` treeAggregate; the scoring column is purely
    * map-side (μ/σ² as array literals in codegen'd HOFs).
    */
  def diagMahalanobisScore(df: DataFrame, embCol: String, d: Int,
      outCol: String = "q_score"): DataFrame = {
    val (n, s1, s2) = moments(df, embCol, d)
    val mean = Array.tabulate(d)(i => (s1(i).toDouble / Q) / n.toDouble)
    val vEff = Array.tabulate(d)(i => math.max(covEntry(n, s1, s2, d, i, i), 1e-12))
    val meanLit = typedLit(mean.toSeq)
    val varLit = typedLit(vEff.toSeq)
    val centered = zip_with(col(embCol), meanLit, (x, m) => x.cast("double") - m)
    val terms = zip_with(centered, varLit,
      (c, v) => floor(c * c / v * lit(1e8) + lit(0.5)).cast("long"))
    df.withColumn(outCol, aggregate(terms, lit(0L), (acc, x) => acc + x))
  }

  /** Deterministic eigenvector orientation: an eigenvector is only
    * defined up to sign, so twin engines must agree on one — flip any
    * component whose FIRST NONZERO coordinate is negative
    * (first-nonzero-positive, the LAPACK-style convention). Negation is
    * IEEE-exact, so this changes no magnitude anywhere downstream.
    */
  def signFixed(m: PcaModel): PcaModel = {
    val comps = m.components.map { v =>
      val i = v.indexWhere(_ != 0.0)
      if (i >= 0 && v(i) < 0.0) v.map(x => -x) else v
    }
    PcaModel(m.mean, m.eigenvalues, comps)
  }

  /** Project onto the top-k principal axes, optionally whitening each
    * coordinate to unit variance. Purely map-side: mean and components
    * are array LITERALS inside codegen'd `zip_with`/`aggregate` HOFs —
    * the executor sees a constant-folded expression, no broadcast join,
    * no UDF, no shuffle.
    */
  def transform(df: DataFrame, embCol: String, model: PcaModel, k: Int,
      whiten: Boolean = false, outCol: String = "proj"): DataFrame = {
    require(k >= 1 && k <= model.d, s"k=$k out of range 1..${model.d}")
    val meanLit = typedLit(model.mean.toSeq)
    // center by zipping the embedding with the mean literal, then each
    // component dot runs over the centered array
    val centered = zip_with(col(embCol), meanLit, (x, m) => x.cast("double") - m)
    val projected = (0 until k).map { c =>
      val compLit = typedLit(model.components(c).toSeq)
      val dot = aggregate(
        zip_with(centered, compLit, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      if (whiten) dot / lit(math.sqrt(math.max(model.eigenvalues(c), 1e-12)))
      else dot
    }
    df.withColumn(outCol, array(projected: _*))
  }
}
