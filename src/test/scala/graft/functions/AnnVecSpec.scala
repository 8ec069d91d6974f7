package graft.functions

import org.apache.spark.sql.{DataFrame, GraftColumnAccess}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmSimQueries

/** The r16 native ANN expressions ([[NearestCell]], [[ResidualVec]],
  * [[PqCodeSub]]) must be BIT-EQUIVALENT to the literal-array forms
  * they replaced — `array_max` over (score, −id) structs of
  * dotp-against-typedlit columns, and the zip_with residual cast chain
  * — including tie-breaks (lowest id), null elements, short arrays,
  * and both execution paths (codegen + interpreted eval).
  */
class AnnVecSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def corpus: DataFrame = {
    GraftFunctions.register(spark)
    Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
  }

  /** The pre-r16 literal-column assignment, kept verbatim as the
    * semantic reference.
    */
  private def literalAssign(e: DataFrame,
      cv: Seq[(Int, Array[Float], Double)]): DataFrame = {
    val scoredArr = array(cv.map { case (id, emb, cn) =>
      struct(
        (call_function("dotp", col("embedding"), typedlit(emb)) /
          (col("nrm") * lit(cn))).as("cscore"),
        lit(-id).as("negid"))
    }: _*)
    e.withColumn("cell", -array_max(scoredArr).getField("negid"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
  }

  /** The pre-r16 literal-column encode, kept verbatim. */
  private def literalEncode(e: DataFrame,
      books: Array[IndexedSeq[(Int, Array[Float])]]): DataFrame = {
    var out = e
    for (s <- 0 until LlmSimQueries.PqM) {
      val scored = array(books(s).map { case (cid, c) =>
        val half = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble) / 2.0
        struct(
          (call_function("dotp",
            slice(col("embedding"), s * LlmSimQueries.PqDsub + 1,
              LlmSimQueries.PqDsub), typedlit(c)) - lit(half)).as("score"),
          lit(-cid).as("negid"))
      }: _*)
      out = out.withColumn(s"code$s", -array_max(scored).getField("negid"))
    }
    out.select(col("vec_id") +:
      (0 until LlmSimQueries.PqM).map(s => col(s"code$s")): _*)
  }

  test("NearestCell matches the literal array_max assignment on the fixture corpus") {
    val e = corpus.cache()
    try {
      val cv = LlmSimQueries.ivfCentroidValues(e)
      val native = LlmSimQueries.ivfAssignV(e, cv)
        .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val lit0 = literalAssign(e, cv)
        .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(native == lit0)
    } finally e.unpersist()
  }

  test("ResidualVec matches the broadcast-join + zip_with residual bit-for-bit") {
    val e = corpus.cache()
    try {
      val cv = LlmSimQueries.ivfCentroidValues(e)
      val assigned = LlmSimQueries.ivfAssignV(e, cv)
      val centDf = {
        import spark.implicits._
        cv.map { case (cid, cemb, _) => (cid, cemb.toSeq) }.toDF("cell", "c_emb")
      }
      val viaJoin = assigned.join(broadcast(centDf), "cell")
        .withColumn("embedding", expr(
          "zip_with(embedding, c_emb, (x, c) -> CAST(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) AS FLOAT))"))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Float](1)).toMap
      val viaExpr = assigned.withColumn("embedding",
          GraftColumnAccess.column(ResidualVec(
            GraftColumnAccess.expression(col("embedding")),
            GraftColumnAccess.expression(col("cell")),
            CellModel.of(cv))))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Float](1)).toMap
      assert(viaExpr.keySet == viaJoin.keySet)
      viaExpr.foreach { case (id, got) =>
        val want = viaJoin(id)
        assert(got.size == want.size, s"vec $id length")
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          // bit equality, not numeric tolerance — persistence relies on it
          assert((g eq null) == (w eq null) &&
            ((g eq null) ||
              java.lang.Float.floatToIntBits(g) == java.lang.Float.floatToIntBits(w)),
            s"vec $id elem $i: $g vs $w")
        }
      }
    } finally e.unpersist()
  }

  test("PqCodeSub matches the literal array_max encode on the fixture corpus") {
    val e = corpus.cache()
    try {
      val books = LlmSimQueries.pqCodebooks(e)
      val native = LlmSimQueries.pqEncode(e, books)
        .collect().map(r => r.getLong(0) ->
          (1 to LlmSimQueries.PqM).map(r.getInt)).toMap
      val lit0 = literalEncode(e, books)
        .collect().map(r => r.getLong(0) ->
          (1 to LlmSimQueries.PqM).map(r.getInt)).toMap
      assert(native == lit0)
    } finally e.unpersist()
  }

  test("edge shapes: tie toward lowest id, null elements, short arrays — both eval paths") {
    import spark.implicits._
    // two identical centroids (ids 3 < 7) force a score tie; a third is
    // orthogonal. Vectors: exact match (tie → 3), a null element, an
    // array shorter than dim, an all-zero vector (NaN scores: 0/0).
    val c = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val cv = Seq((3, c, 1.0), (7, c, 1.0), (9, Array(0f, 1f, 0f, 0f), 1.0))
    val rows = Seq(
      (1L, Seq[java.lang.Float](1f, 0f, 0f, 0f)),
      (2L, Seq[java.lang.Float](null, 1f, 0f, 0f)),
      (3L, Seq[java.lang.Float](0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    GraftFunctions.register(spark)
    def run(df: DataFrame): Map[Long, Int] =
      df.select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
    val wantAssign = run(literalAssign(rows, cv))
    val gotCodegen = run(LlmSimQueries.ivfAssignV(rows, cv))
    assert(gotCodegen == wantAssign)
    assert(gotCodegen(1L) == 3, "score tie must keep the lowest cell id")
    // interpreted path: evaluate the expression directly per row
    val model = CellModel.of(cv)
    val local = rows.select("vec_id", "embedding", "nrm").collect()
    local.foreach { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[java.lang.Float](1).map(f =>
          if (f eq null) null else f.floatValue()).toArray[Any])
      val got = AnnVecOps.nearestCell(arr, r.getDouble(2), model)
      assert(got == wantAssign(r.getLong(0)), s"interpreted vs codegen for vec ${r.getLong(0)}")
    }
    // a zero vector (nrm = 0) made the LITERAL form throw DIVIDE_BY_ZERO
    // under ANSI — undefined input for the operator. The native form
    // stays total: all-NaN scores tie toward the lowest cell id.
    val zeroArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](0f, 0f, 0f, 0f))
    assert(AnnVecOps.nearestCell(zeroArr, 0.0, model) == 3)
  }
}
