package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-array dot product: Σᵢ (double)a[i] · (double)b[i],
  * accumulated strictly in index order (a left fold), so the result is
  * bit-identical to DuckDB's `list_reduce` over the same promotion —
  * the determinism contract the similarity queries rely on.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order formulation,
  * which Catalyst interprets per element with boxing (measured 55 s for
  * the sf0.1 all-pairs scan vs ~3 s with this expression inside
  * whole-stage codegen). At 100 TB this is the difference between the
  * embedding scan being compute-bound on SIMD-friendly loops vs
  * allocation-bound on lambda dispatch.
  *
  * Null handling: null array → null (nullIntolerant); null ELEMENTS are
  * treated as 0.0 (embeddings are non-null float vectors by schema).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotp requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dotp"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the expression may occur several times in one
      // whole-stage-codegen scope (e.g. dotp(x,x) and dotp(x,y))
      val n = ctx.freshName("dotpN")
      val acc = ctx.freshName("dotpAcc")
      val i = ctx.freshName("dotpI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. */
object GraftFunctions {
  private[functions] val dotpBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "dotp takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    }

  private[functions] val ngramBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 3, "ngram_hashes takes exactly 3 arguments")
      NgramHashes(children.head, children(1), children(2))
    }

  private[functions] val bowBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "bow_score takes exactly 2 arguments")
      BowScore(children.head, children(1))
    }

  private[functions] val countInBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "count_in takes exactly 2 arguments")
      CountIn(children.head, children(1))
    }

  private[functions] val bloomMcBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "bloom_might_contain takes exactly 2 arguments")
      BloomMightContain(children.head, children(1))
    }

  private[functions] val cmsEstBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "cms_estimate takes exactly 2 arguments")
      CmsEstimate(children.head, children(1))
    }

  private[functions] val wavDecodeBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 1, "wav_decode takes exactly 1 argument")
      WavDecode(children.head)
    }

  private[functions] val bmpDecodeBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 1, "bmp_decode takes exactly 1 argument")
      BmpDecode(children.head)
    }

  private[functions] val wavFeaturesBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 2, "wav_features takes exactly 2 arguments")
      WavFeatures(children.head, children(1))
    }

  private[functions] val urlNormalizeBuilder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.size == 1, "url_normalize takes exactly 1 argument")
      UrlNormalizeExpr(children.head)
    }

  /** CMS sizing knobs, honored by [[register]] (and so by the
    * `GraftExtensions` deployment path, which cannot take parameters):
    * the 4×2048 default is fixture-sized — at production vocabulary the
    * prefilter's selectivity collapses once heavy mass saturates the
    * grid, so width should scale to ~(heavy-candidate count)/fpp.
    * CmsSpec measures the selectivity-vs-width curve on a Zipf stream.
    */
  val CmsWidthConf = "spark.graft.cms.width"
  val CmsDepthConf = "spark.graft.cms.depth"

  def register(spark: SparkSession): Unit = {
    val cmsWidth = spark.conf.get(CmsWidthConf, Cms.DefaultWidth.toString).toInt
    val cmsDepth = spark.conf.get(CmsDepthConf, Cms.DefaultDepth.toString).toInt
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      dotpBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      ngramBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bow_score"),
      new ExpressionInfo(classOf[BowScore].getName, "bow_score"),
      bowBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "count_in"),
      countInBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      bloomMcBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      cmsEstBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("wav_decode"),
      new ExpressionInfo(classOf[WavDecode].getName, "wav_decode"),
      wavDecodeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bmp_decode"),
      new ExpressionInfo(classOf[BmpDecode].getName, "bmp_decode"),
      bmpDecodeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("wav_features"),
      new ExpressionInfo(classOf[WavFeatures].getName, "wav_features"),
      wavFeaturesBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("url_normalize"),
      new ExpressionInfo(classOf[UrlNormalizeExpr].getName, "url_normalize"),
      urlNormalizeBuilder)
    // the sketch aggregators, SQL-callable (`SELECT simhash_agg(h) ...`)
    // with the library's fixed default families
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("simhash_agg",
      udaf(new SimHashAgg(32), org.apache.spark.sql.Encoders.scalaLong))
    spark.udf.register("minhash_agg",
      udaf(new MinHashAgg(
        graft.queries.LlmSimQueries.minhashA.toArray,
        graft.queries.LlmSimQueries.minhashB.toArray,
        graft.queries.LlmSimQueries.MinhashP),
        org.apache.spark.sql.Encoders.scalaLong))
    spark.udf.register("cms_sketch",
      udaf(new CmsAgg(cmsWidth, cmsDepth), org.apache.spark.sql.Encoders.scalaLong))
  }
}

/** `SparkSessionExtensions` entry point — the idiomatic deployment route
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) so every
  * session in a cluster gets the native functions without per-query
  * registration.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      GraftFunctions.dotpBuilder))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      GraftFunctions.ngramBuilder))
    ext.injectFunction((
      FunctionIdentifier("bow_score"),
      new ExpressionInfo(classOf[BowScore].getName, "bow_score"),
      GraftFunctions.bowBuilder))
    ext.injectFunction((
      FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "count_in"),
      GraftFunctions.countInBuilder))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      GraftFunctions.bloomMcBuilder))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      GraftFunctions.cmsEstBuilder))
    ext.injectFunction((
      FunctionIdentifier("wav_decode"),
      new ExpressionInfo(classOf[WavDecode].getName, "wav_decode"),
      GraftFunctions.wavDecodeBuilder))
    ext.injectFunction((
      FunctionIdentifier("bmp_decode"),
      new ExpressionInfo(classOf[BmpDecode].getName, "bmp_decode"),
      GraftFunctions.bmpDecodeBuilder))
    ext.injectFunction((
      FunctionIdentifier("wav_features"),
      new ExpressionInfo(classOf[WavFeatures].getName, "wav_features"),
      GraftFunctions.wavFeaturesBuilder))
    ext.injectFunction((
      FunctionIdentifier("url_normalize"),
      new ExpressionInfo(classOf[UrlNormalizeExpr].getName, "url_normalize"),
      GraftFunctions.urlNormalizeBuilder))
    // the SQL row-mutating verbs over lakehouse tables (UPDATE / MERGE /
    // full-predicate DELETE); also auto-installed by LakehouseCatalog
    ext.injectPlannerStrategy(_ => graft.lakehouse.LakehouseDmlStrategy)
  }
}
