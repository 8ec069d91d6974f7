package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The IVF/PQ model halves of the ANN expressions, as plain values the
  * expressions carry in constructor fields (so plan equality/
  * canonicalization works through case-class equality, and codegen
  * references ONE object instead of inlining C·dim literals).
  *
  * Why these exist (guide §1.2 step 2, §4.1): the literal-array
  * formulation — `array_max(array(struct(dotp(emb, lit(c0))/…, -0),
  * struct(…), …))` over 16 centroids × 64 floats — is map-side and
  * correct, but its expression TREE is thousands of nodes. Every
  * action that plans it pays ~0.5-1 s of analysis/optimization/codegen
  * before a single row moves (measured: pqEncode noop on 2 000 rows =
  * 1.0 s, ≈100% driver). One expression node holding the matrix does
  * the same IEEE-exact loop with a tree of size 1 — cheap to plan, and
  * at scale the fused loop also beats 16 separate array traversals per
  * row. Scoring math is BIT-IDENTICAL to the literal form (same strict
  * index-order double folds, same Double.compare tie-break toward the
  * lower id that `array_max` over (score, −id) structs produced).
  */
final case class CellModel(ids: IndexedSeq[Int],
    cents: IndexedSeq[IndexedSeq[Float]], norms: IndexedSeq[Double]) {
  @transient lazy val idArr: Array[Int] = ids.toArray
  @transient lazy val centArr: Array[Array[Float]] = cents.map(_.toArray).toArray
  @transient lazy val normArr: Array[Double] = norms.toArray
  // centroids may be non-square only in degenerate fixtures; dim is per
  // centroid below, so nothing here assumes uniformity
  override def toString: String = s"CellModel(${ids.length} cells)"
}

object CellModel {
  /** From the (id, emb, norm) triples the training/load paths carry —
    * ascending id, the tie-break order the scoring loop relies on.
    */
  def of(cv: Seq[(Int, Array[Float], Double)]): CellModel = {
    val sorted = cv.sortBy(_._1)
    CellModel(sorted.map(_._1).toIndexedSeq,
      sorted.map(_._2.toIndexedSeq).toIndexedSeq,
      sorted.map(_._3).toIndexedSeq)
  }
}

/** One PQ subspace's codebook: codeword ids ascending, the embedding
  * column offset of this subspace, and the precomputed `|c|²/2` halves
  * (same strict fold as the literal form computed per codeword).
  */
final case class SubBook(cids: IndexedSeq[Int],
    words: IndexedSeq[IndexedSeq[Float]], offset: Int) {
  @transient lazy val cidArr: Array[Int] = cids.toArray
  @transient lazy val wordArr: Array[Array[Float]] = words.map(_.toArray).toArray
  @transient lazy val halfArr: Array[Double] =
    words.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble) / 2.0).toArray
  override def toString: String = s"SubBook(@$offset, ${cids.length} words)"
}

object SubBook {
  def of(book: IndexedSeq[(Int, Array[Float])], offset: Int): SubBook = {
    val sorted = book.sortBy(_._1)
    SubBook(sorted.map(_._1), sorted.map(_._2.toIndexedSeq), offset)
  }
}

/** Row-level kernels shared by interpreted eval and codegen (the
  * generated code calls these statics — tiny generated bodies, and the
  * hot loops JIT once in ONE place).
  */
object AnnVecOps {
  /** argmax over cells of dotp(x, c)/(nrm·|c|): strict index-order
    * double fold per centroid (null elements skipped, exactly `dotp`),
    * `Double.compare` strictly-greater keeps the LOWEST id on ties —
    * the `array_max((score, −id))` ordering, NaN ranking above
    * +Infinity included.
    */
  def nearestCell(x: ArrayData, nrm: Double, m: CellModel): Int = {
    val cents = m.centArr
    val norms = m.normArr
    val xn = x.numElements()
    var best = 0
    var bestSc = Double.NaN
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      val n = math.min(xn, c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) acc += x.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      val sc = acc / (nrm * norms(ci))
      if (ci == 0 || java.lang.Double.compare(sc, bestSc) > 0) {
        bestSc = sc; best = ci
      }
      ci += 1
    }
    m.idArr(best)
  }

  /** residual = float(double(x_i) − double(c_i)) elementwise — the
    * `zip_with` lambda's exact cast chain, with its exact padding: the
    * result spans max(|x|, dim) elements and an element is null unless
    * BOTH sides are present (x shorter than the centroid, or a null
    * element, pads with null exactly like zip_with).
    */
  def residual(x: ArrayData, cell: Int, m: CellModel): ArrayData = {
    val idArr = m.idArr
    var pos = -1
    var i = 0
    while (pos < 0 && i < idArr.length) {
      if (idArr(i) == cell) pos = i
      i += 1
    }
    if (pos < 0) throw new IllegalStateException(
      s"residual: cell $cell not in the ${idArr.length}-cell model")
    val c = m.centArr(pos)
    val xn = x.numElements()
    val n = math.max(xn, c.length)
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      if (j < xn && j < c.length && !x.isNullAt(j))
        out(j) = (x.getFloat(j).toDouble - c(j).toDouble).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** argmax over one subspace's codewords of dotp(slice(x), c) − |c|²/2
    * — the literal encode form: slice bounds clip to |x|, null elements
    * skip, strictly-greater Double.compare keeps the lowest cid.
    */
  def pqCode(x: ArrayData, b: SubBook): Int = {
    val words = b.wordArr
    val halves = b.halfArr
    val off = b.offset
    val xn = x.numElements()
    var best = 0
    var bestSc = Double.NaN
    var ci = 0
    while (ci < words.length) {
      val c = words(ci)
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val idx = off + i
        if (idx < xn && !x.isNullAt(idx))
          acc += x.getFloat(idx).toDouble * c(i).toDouble
        i += 1
      }
      val sc = acc - halves(ci)
      if (ci == 0 || java.lang.Double.compare(sc, bestSc) > 0) {
        bestSc = sc; best = ci
      }
      ci += 1
    }
    b.cidArr(best)
  }
}

/** `cell = argmax_c cosine(embedding, c)` with the model in ONE node —
  * plan-cheap replacement for the 16-literal-struct `array_max` form
  * (identical results; see [[CellModel]]).
  */
case class NearestCell(left: Expression, right: Expression, model: CellModel)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AnnVecOps.nearestCell(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.addReferenceObj("cellModel", model, classOf[CellModel].getName)
      s"${ev.value} = graft.functions.AnnVecOps.nearestCell($a, $b, $m);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

/** `embedding − centroid(cell)` in the zip_with cast chain, one node —
  * replaces the broadcast join against the 16-row centroid frame plus
  * the per-element lambda (identical results; no join, no exchange).
  */
case class ResidualVec(left: Expression, right: Expression, model: CellModel)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "residual_vec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AnnVecOps.residual(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.addReferenceObj("cellModel", model, classOf[CellModel].getName)
      s"${ev.value} = graft.functions.AnnVecOps.residual($a, $b, $m);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualVec =
    copy(left = newLeft, right = newRight)
}

/** One subspace's PQ code — replaces the per-subspace 16-literal
  * `array_max` encode column (identical results).
  */
case class PqCodeSub(child: Expression, book: SubBook)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_code"

  override protected def nullSafeEval(a: Any): Any =
    AnnVecOps.pqCode(a.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("subBook", book, classOf[SubBook].getName)
      s"${ev.value} = graft.functions.AnnVecOps.pqCode($a, $b);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodeSub =
    copy(child = newChild)
}
