package graft.lakehouse

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.LlmSimQueries

/** A loaded ANN serving index: IVF centroids (with their norms, the
  * probe metadata), the per-subspace residual PQ codebooks, and the
  * compressed corpus as a DataFrame of (vec_id, cell, code0..code7).
  * O(C·dim + M·K·dsub) driver metadata plus a lakehouse scan — never
  * the raw vectors.
  */
final case class AnnIndexHandle(
    centroids: Seq[(Int, Array[Float], Double)],
    books: Array[IndexedSeq[(Int, Array[Float])]],
    codes: DataFrame)

/** Persistent IVF-PQ serving index over the lakehouse (the FAISS IVFPQ
  * architecture, Jégou et al. TPAMI 2011, made restart-durable):
  * [[build]] trains coarse centroids + residual codebooks and writes
  * TWO lakehouse tables under `root` —
  *
  *   - `root/model`: (kind, sub, cid, vec) — "centroid" rows carry the
  *     IVF cells, "book" rows the per-subspace residual codewords.
  *     O(C + M·K) rows of index metadata with full snapshot lineage.
  *   - `root/codes`: (vec_id, code0..code{M-1}) PARTITIONED BY cell —
  *     the 16×-compressed corpus. Partitioning by cell means a serve
  *     with nprobe cells is a partition-pruned scan: unprobed files
  *     are never opened, which at 100 TB is the difference between
  *     reading nprobe/C of the index and all of it.
  *
  * [[load]] reconstructs the handle from those tables alone — ZERO
  * training jobs (training runs under the [[TrainJobGroup]] job group
  * precisely so AnnIndexSpec can pin that with a listener), so a
  * serving restart costs two metadata reads, not a corpus re-scan.
  * [[append]] encodes NEW vectors map-side against the frozen
  * codebooks (the q100 incremental-ingestion shape: per-batch cost is
  * batch size, never corpus size) and appends to the codes table;
  * codebook refresh is a full [[build]], scheduled like compaction.
  *
  * Floats round-trip parquet exactly and centroid norms are recomputed
  * with the same strict left fold training used, so a reloaded index
  * serves BIT-IDENTICAL results to the session that built it (gated:
  * q114 hash-matches q111's DuckDB oracle through a build → persist →
  * fresh-session reload → serve round trip).
  */
object AnnIndex {
  /** Job group wrapping every training job — load/serve/append must
    * never run jobs in this group (AnnIndexSpec asserts it).
    */
  val TrainJobGroup = "ann-index-train"

  private def modelRoot(root: String) = root + "/model"
  private def codesRoot(root: String) = root + "/codes"

  private def deleteTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
  }

  /** Residual frame: embedding := float(double(x) − double(c_cell)) —
    * the exact cast chain q111's oracle twin mirrors per element.
    */
  private def residualize(s: SparkSession, assigned: DataFrame,
      cv: Seq[(Int, Array[Float], Double)]): DataFrame = {
    val centDf = {
      import s.implicits._
      cv.map { case (cid, cemb, _) => (cid, cemb.toSeq) }.toDF("cell", "c_emb")
    }
    assigned.join(broadcast(centDf), "cell")
      .withColumn("embedding", expr(
        "zip_with(embedding, c_emb, (x, c) -> CAST(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) AS FLOAT))"))
      .select(col("vec_id"), col("cell"), col("embedding"))
  }

  /** Train on `embeddings` (vec_id, embedding) and persist, replacing
    * any index previously at `root`. Training is the q111 chain:
    * IvfIters Lloyd treeAggregates for the coarse cells, PqIters
    * treeAggregates for the residual codebooks — O(C·dim + M·K·dsub)
    * driver metadata however large the corpus. Encoding is map-side
    * codeword-literal argmax; the only corpus-sized motion is the
    * partitioned parquet write of the code rows themselves.
    */
  def build(spark: SparkSession, embeddings: DataFrame, root: String): AnnIndexHandle = {
    graft.functions.GraftFunctions.register(spark)
    val e = embeddings
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)"))).cache()
    val sc = spark.sparkContext
    sc.setJobGroup(TrainJobGroup, "ANN index: IVF Lloyd passes", interruptOnCancel = false)
    val cv = try LlmSimQueries.ivfCentroidValues(e) finally sc.clearJobGroup()
    val residuals = residualize(spark, LlmSimQueries.ivfAssignV(e, cv), cv).cache()
    sc.setJobGroup(TrainJobGroup, "ANN index: residual PQ Lloyd passes", interruptOnCancel = false)
    val books = try LlmSimQueries.pqCodebooks(residuals) finally sc.clearJobGroup()

    // STAGE the rebuild: train + write into fresh `.staging` roots and
    // swap in only after BOTH tables are durably written — a crash or
    // executor failure mid-rebuild must leave the previous index
    // serving (the maintenance scheduler swallows errors by contract,
    // so a delete-first build would silently destroy the index)
    val stagingModel = modelRoot(root) + ".staging"
    val stagingCodes = codesRoot(root) + ".staging"
    deleteTree(stagingModel)
    deleteTree(stagingCodes)
    val modelDf = {
      import spark.implicits._
      (cv.map { case (cid, emb, _) => ("centroid", -1, cid, emb.toSeq) } ++
        books.zipWithIndex.flatMap { case (b, s) =>
          b.map { case (cid, c) => ("book", s, cid, c.toSeq) }
        }).toDF("kind", "sub", "cid", "vec")
    }
    new LakehouseTable(spark, stagingModel).append(modelDf.coalesce(1))
    new LakehouseTable(spark, stagingCodes).append(
      LlmSimQueries.pqEncode(residuals, books, keep = Seq("cell")),
      partitionBy = Seq("cell"))
    residuals.unpersist()
    e.unpersist()
    // the swap: two directory moves, no training work at risk
    deleteTree(modelRoot(root))
    deleteTree(codesRoot(root))
    Files.createDirectories(Paths.get(root))
    Files.move(Paths.get(stagingModel), Paths.get(modelRoot(root)))
    Files.move(Paths.get(stagingCodes), Paths.get(codesRoot(root)))
    AnnIndexHandle(cv, books, new LakehouseTable(spark, codesRoot(root)).read())
  }

  /** Reload the handle from the persisted tables — the restart path.
    * Costs: one O(C + M·K)-row collect of the model table and a lazy
    * scan handle on the codes table. No training jobs, no corpus scan.
    */
  def load(spark: SparkSession, root: String): AnnIndexHandle = {
    val rows = new LakehouseTable(spark, modelRoot(root)).read()
      .select(col("kind"), col("sub"), col("cid"), col("vec")).collect()
    // centroid norms re-derive with training's exact fold — floats
    // round-trip parquet losslessly, so the handle is bit-identical
    val cv = rows.filter(_.getString(0) == "centroid").map { r =>
      val emb = r.getSeq[Float](3).toArray
      (r.getInt(2), emb,
        math.sqrt(emb.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    }.sortBy(_._1).toSeq
    require(cv.nonEmpty, s"no index at $root (model table has no centroid rows)")
    val books = Array.tabulate(LlmSimQueries.PqM) { s =>
      rows.filter(r => r.getString(0) == "book" && r.getInt(1) == s)
        .map(r => (r.getInt(2), r.getSeq[Float](3).toArray))
        .sortBy(_._1).toIndexedSeq
    }
    AnnIndexHandle(cv, books, new LakehouseTable(spark, codesRoot(root)).read())
  }

  /** Incremental encode-on-append: assign + residualize + encode the
    * NEW vectors map-side against the FROZEN persisted codebooks, and
    * append to the codes table. Per-batch cost is the batch, never the
    * corpus; no training jobs run (the spec pins it). Drift from stale
    * codebooks is repaired by a scheduled full [[build]].
    */
  def append(spark: SparkSession, newEmbeddings: DataFrame, root: String): Snapshot = {
    graft.functions.GraftFunctions.register(spark)
    val idx = load(spark, root)
    val e = newEmbeddings
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    val residuals = residualize(spark, LlmSimQueries.ivfAssignV(e, idx.centroids), idx.centroids)
    new LakehouseTable(spark, codesRoot(root)).append(
      LlmSimQueries.pqEncode(residuals, idx.books, keep = Seq("cell")),
      partitionBy = Seq("cell"))
  }

  /** Serve top-5 cosine neighbors for the index's query convention
    * (vec_id < PqQueryCount) straight from a handle: nprobe-cell
    * partition-pruned code scan, residual ADC shortlist, exact re-rank
    * against `embeddings` (hydration only). Delegates to the gated
    * q111 scoring so persisted and in-session indexes serve
    * identically.
    */
  def serve(spark: SparkSession, handle: AnnIndexHandle, embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = embeddings.withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    LlmSimQueries.ivfpqServe(spark, e, handle.centroids, handle.books, handle.codes)
      .orderBy(col("q_id"), col("rk"))
  }
}
