package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Native dotp expression: value parity with the interpreted
  * higher-order formulation it replaced (same fold order), codegen and
  * interpreted paths, null handling.
  */
class DotProductSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.5f, -0.25f), Seq(2.0f, 8.0f)),
      (3L, Seq.empty[Float], Seq.empty[Float])
    ).toDF("id", "a", "b")
  }

  test("dotp matches aggregate(zip_with(...)) exactly (bit-identical fold)") {
    GraftFunctions.register(spark)
    val out = df.select(col("id"),
      expr("dotp(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
      .collect().sortBy(_.getLong(0))
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
    assert(out(0).getDouble(1) === 32.0)
    assert(out(2).getDouble(1) === 0.0)
  }

  test("null array yields null; works on real embeddings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val withNull = Seq((1L, Option(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("id", "a", "b")
    assert(withNull.select(expr("dotp(a, b)")).collect().head.isNullAt(0))

    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val Row(n: Long) = e.select(count(when(expr("dotp(embedding, embedding)") > 0.0, 1))).collect().head
    assert(n === e.count(), "every embedding has positive self-dot")
  }

  test("GraftExtensions injects dotp into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    // getOrCreate reuses the suite session (extensions apply only at
    // session construction) — detach it so a genuinely new session is
    // built on the shared context, then restore.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions = the programmatic form of
      // spark.sql.extensions=graft.functions.GraftExtensions (the conf
      // route is static and only applies at SparkContext creation)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql("SELECT dotp(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS v").collect()
      assert(r.head.getDouble(0) === 11.0)
      // every registry-side function must resolve through the
      // extensions injector too — a function added to register() but
      // not to GraftExtensions would work in tests and fail in any
      // spark.sql.extensions deployment
      val all = s2.sql("""SELECT
        url_normalize('HTTPS://H.com:443/x/?b=2&a=1#f') AS u,
        wav_decode(CAST(NULL AS BINARY)) AS w,
        bmp_decode(CAST(NULL AS BINARY)) AS b,
        wav_features(CAST(NULL AS BINARY), 4) AS f,
        ngram_hashes(array('a','b'), 2, 0) AS n,
        count_in(array('a'), array('a')) AS c""").collect().head
      assert(all.getString(0) === "https://h.com/x?a=1&b=2")
      assert(all.isNullAt(1) && all.isNullAt(2) && all.isNullAt(3))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("codegen and interpreted paths agree") {
    GraftFunctions.register(spark)
    val q = df.select(expr("dotp(a, b)").as("v"))
    val withCodegen = q.collect().map(_.getDouble(0)).toSeq
    withClue("interpreted fallback") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val interp = df.select(expr("dotp(a, b)").as("v")).collect().map(_.getDouble(0)).toSeq
        assert(interp === withCodegen)
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }
}
