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
    codes: DataFrame,
    /** What this index was BUILT on (None for indexes built from a bare
      * DataFrame, and for pre-provenance pointers).
      */
    provenance: Option[CorpusProvenance] = None)

/** The corpus pin an index build trained on — which table, which exact
  * snapshot, and (when the build was tag-addressed) which release tag.
  * Recorded in the index pointer at publish, read back by [[AnnIndex
  * .load]]/[[AnnIndex.provenance]], so a serving handle answers "which
  * corpus version am I serving?" — paired with a tag-pinned stream
  * (q144) this gives end-to-end reproducible retrieval: the same tag
  * names the corpus state, the training input, and the serving index's
  * lineage. Appends/removals advance the index CONTENT past the pin
  * (the pin describes the build; a scheduled rebuild re-pins).
  */
final case class CorpusProvenance(table: String, snapshotId: Long,
    tag: Option[String] = None)

/** Per-cell occupancy of the live codes table ([[AnnIndex.occupancy]]):
  * the drift probe frozen-codebook appends need — `skew` (max/mean)
  * climbing past a few means one IVF cell is absorbing the corpus
  * drift and serve-time partition pruning is degrading; trigger
  * [[AnnIndex.rebalance]].
  */
final case class CellOccupancy(cells: Int, rows: Long, min: Long,
    max: Long, mean: Double, skew: Double)

/** Persistent IVF-PQ serving index over the lakehouse (the FAISS IVFPQ
  * architecture, Jégou et al. TPAMI 2011, made restart-durable):
  * [[build]] trains coarse centroids + residual codebooks and writes
  * TWO lakehouse tables under `root`, into VERSIONED roots committed
  * by an atomic pointer-file flip (`root/INDEX.json` names the live
  * version; see the layout notes on the companion) —
  *
  *   - `root/model.v<N>`: (kind, sub, cid, vec) — "centroid" rows carry
  *     the IVF cells, "book" rows the per-subspace residual codewords.
  *     O(C + M·K) rows of index metadata with full snapshot lineage.
  *   - `root/codes.v<N>`: (vec_id, code0..code{M-1}) PARTITIONED BY cell —
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

  // ---- versioned layout + pointer-file commit ----
  //
  // A rebuild trains into FRESH versioned roots (`model.v<N>`,
  // `codes.v<N>`) and publishes by atomically replacing ONE small
  // pointer file (`INDEX.json`) naming the live version — the same
  // commit discipline the lakehouse snapshots use. Consequences:
  //  - no crash window: until the pointer flips, readers resolve the
  //    previous version; a crash mid-rebuild leaves orphan dirs, never
  //    a missing index (the directory-move swap this replaces had a
  //    delete-then-move window that could strand the root empty);
  //  - rename-free for object storage: the only "atomic" operation is
  //    a single small-object PUT;
  //  - in-flight readers survive a rebuild: a handle loaded at version
  //    N keeps its files until the N+2 build GCs version N (one
  //    version of grace, like retained snapshots).

  private def pointerPath(root: String) = Paths.get(root, "INDEX.json")
  private def modelRoot(root: String, v: Long) = s"$root/model.v$v"
  private def codesRoot(root: String, v: Long) = s"$root/codes.v$v"

  /** The pointer body: live version + the build's corpus provenance.
    * Options keep pre-provenance pointers parsing unchanged.
    */
  private final case class IndexPointer(version: Long,
      provenance: Option[CorpusProvenance] = None)

  private implicit val ptrFormats: org.json4s.Formats =
    org.json4s.DefaultFormats

  private def readPointer(root: String): Option[IndexPointer] = {
    val p = pointerPath(root)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      try Some(org.json4s.jackson.Serialization.read[IndexPointer](s))
      catch { case e: Exception =>
        throw new IllegalStateException(s"corrupt index pointer at $p: $s", e) }
    }
  }

  /** The published index version, or None before the first publish. */
  /** The live published index version (the pointer's) — public: the
    * operator surface (gates, consoles) addresses `codes.v<N>` roots.
    */
  def currentVersion(root: String): Option[Long] =
    readPointer(root).map(_.version)

  /** The corpus pin recorded at the live version's publish, if any. */
  def provenance(root: String): Option[CorpusProvenance] =
    readPointer(root).flatMap(_.provenance)

  /** Atomic publish: temp file + single ATOMIC_MOVE of the pointer. */
  private def publish(root: String, v: Long,
      prov: Option[CorpusProvenance] = None): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"INDEX.json.tmp-$v")
    Files.writeString(tmp,
      org.json4s.jackson.Serialization.write(IndexPointer(v, prov)))
    Files.move(tmp, pointerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop versioned roots older than `keepFrom` (publish-time GC: the
    * PREVIOUS version always survives one rebuild for in-flight
    * handles).
    */
  private def gcVersions(root: String, keepFrom: Long): Unit = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(Paths.get(root))) return
    val ver = """(?:model|codes)\.v(\d+)""".r
    graft.Fs.listAll(Paths.get(root)).foreach { p =>
      p.getFileName.toString match {
        case ver(v) if v.toLong < keepFrom => deleteTree(p.toString)
        case _ => ()
      }
    }
  }

  private def deleteTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      graft.Fs.deleteRecursively(p)
    }
  }

  /** Residual frame: embedding := float(double(x) − double(c_cell)) —
    * the exact cast chain q111's oracle twin mirrors per element. One
    * model-carrying node (identical results to the old broadcast-join +
    * zip_with form, minus the join/exchange and its per-action plan
    * cost — r16 opt round).
    */
  private def residualize(s: SparkSession, assigned: DataFrame,
      cv: Seq[(Int, Array[Float], Double)]): DataFrame = {
    import org.apache.spark.sql.GraftColumnAccess.{column, expression}
    assigned.withColumn("embedding", column(graft.functions.ResidualVec(
        expression(col("embedding")), expression(col("cell")),
        graft.functions.CellModel.of(cv))))
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
  def build(spark: SparkSession, embeddings: DataFrame, root: String,
      provenance: Option[CorpusProvenance] = None): AnnIndexHandle = {
    val v = stageVersion(spark, embeddings, root)
    // the commit: one atomic pointer replace — a crash any time before
    // this line leaves the previous version serving; any time after,
    // the new one. There is no in-between.
    publish(root, v, provenance)
    gcVersions(root, keepFrom = v - 1) // previous version survives for in-flight readers
    load(spark, root)
  }

  /** [[build]] pinned to a CORPUS VERSION: train on lakehouse table
    * `corpusRoot` exactly as of `tag` / `snapshotId` (default: the
    * current head, still pinned to its id) and record that pin in the
    * index pointer. The corpus advancing after the build never leaks
    * into training (snapshot isolation), and [[load]]/[[provenance]]
    * read the lineage back — the reproducible-retrieval composition
    * with tag-pinned streams (q144/q146).
    */
  def buildFromCorpus(spark: SparkSession, corpusRoot: String, root: String,
      tag: Option[String] = None,
      snapshotId: Option[Long] = None): AnnIndexHandle = {
    require(tag.isEmpty || snapshotId.isEmpty,
      "tag and snapshotId are mutually exclusive corpus pins")
    val corpus = new LakehouseTable(spark, corpusRoot)
    val snap = tag.map(corpus.snapshotForTag)
      .orElse(snapshotId.map(corpus.snapshotOrThrow))
      .orElse(corpus.currentSnapshot())
      .getOrElse(throw new IllegalStateException(
        s"corpus table $corpusRoot has no snapshots"))
    require(snap.branch.isEmpty,
      s"corpus snapshot ${snap.snapshotId} belongs to branch " +
        s"'${snap.branch.get}' — train on published corpus state only")
    build(spark, corpus.scanAtSnapshot(snap.snapshotId), root,
      provenance = Some(CorpusProvenance(corpusRoot, snap.snapshotId, tag)))
  }

  /** Train + durably write the NEXT version's (model, codes) tables
    * WITHOUT publishing them — [[build]] = stage, then pointer flip.
    * Package-visible so the crash-injection spec can stop exactly at
    * the unpublished state. `fixedBooks` (the [[rebalance]] path)
    * SKIPS codebook training and re-encodes against the given books.
    */
  private[lakehouse] def stageVersion(
      spark: SparkSession, embeddings: DataFrame, root: String,
      fixedBooks: Option[Array[IndexedSeq[(Int, Array[Float])]]] = None): Long = {
    graft.functions.GraftFunctions.register(spark)
    val e = embeddings
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)"))).cache()
    val sc = spark.sparkContext
    sc.setJobGroup(TrainJobGroup, "ANN index: IVF Lloyd passes", interruptOnCancel = false)
    val cv = try LlmSimQueries.ivfCentroidValues(e) finally sc.clearJobGroup()
    val residuals = residualize(spark, LlmSimQueries.ivfAssignV(e, cv), cv).cache()
    val books = fixedBooks.getOrElse {
      sc.setJobGroup(TrainJobGroup, "ANN index: residual PQ Lloyd passes", interruptOnCancel = false)
      try LlmSimQueries.pqCodebooks(residuals) finally sc.clearJobGroup()
    }

    val v = currentVersion(root).getOrElse(0L) + 1L
    // an earlier crashed stage may have left a dir at this version
    deleteTree(modelRoot(root, v))
    deleteTree(codesRoot(root, v))
    val modelDf = {
      import spark.implicits._
      (cv.map { case (cid, emb, _) => ("centroid", -1, cid, emb.toSeq) } ++
        books.zipWithIndex.flatMap { case (b, s) =>
          b.map { case (cid, c) => ("book", s, cid, c.toSeq) }
        }).toDF("kind", "sub", "cid", "vec")
    }
    new LakehouseTable(spark, modelRoot(root, v)).append(modelDf.coalesce(1))
    new LakehouseTable(spark, codesRoot(root, v)).append(
      LlmSimQueries.pqEncode(residuals, books, keep = Seq("cell")),
      partitionBy = Seq("cell"))
    residuals.unpersist()
    e.unpersist()
    v
  }

  /** Reload the handle from the persisted tables — the restart path.
    * Costs: one O(C + M·K)-row collect of the model table and a lazy
    * scan handle on the codes table. No training jobs, no corpus scan.
    */
  def load(spark: SparkSession, root: String): AnnIndexHandle = {
    val ptr = readPointer(root).getOrElse(throw new IllegalStateException(
      s"no published index at $root (missing ${pointerPath(root)})"))
    val v = ptr.version
    val rows = new LakehouseTable(spark, modelRoot(root, v)).read()
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
    AnnIndexHandle(cv, books,
      new LakehouseTable(spark, codesRoot(root, v)).read(),
      provenance = ptr.provenance)
  }

  /** Incremental encode-on-append: assign + residualize + encode the
    * NEW vectors map-side against the FROZEN persisted codebooks, and
    * land them in the LIVE version's codes table KEYED by vec_id.
    * Per-batch cost is the batch for disjoint ids (a manifest-stats
    * range check routes them down the pure-append path — never a
    * corpus read); a batch whose id range overlaps existing files
    * additionally pays the keyed replace of those files, which is what
    * makes retried batches and re-embedded docs safe. No training jobs
    * run either way (the spec pins it). Drift from stale codebooks is
    * repaired by a scheduled full [[build]].
    */
  def append(spark: SparkSession, newEmbeddings: DataFrame, root: String): Snapshot = {
    graft.functions.GraftFunctions.register(spark)
    val v = currentVersion(root).getOrElse(throw new IllegalStateException(
      s"no published index at $root — build before appending"))
    val idx = load(spark, root)
    val e = newEmbeddings
      .withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    val residuals = residualize(spark, LlmSimQueries.ivfAssignV(e, idx.centroids), idx.centroids)
    // keyed by vec_id, not a blind append: re-ingesting an id that is
    // already in the index (a retried batch, or a doc re-embedded after
    // an edit) must REPLACE its codes — duplicate code rows would
    // surface the same vec_id twice in every serve shortlist. The
    // batch itself dedupes first (an at-least-once feed can repeat an
    // id WITHIN one batch; identical rows collapse exactly, and a
    // conflicting pair was ill-defined input either way). Cost stays
    // O(batch): a manifest-stats range check (zero file opens, zero
    // jobs) detects the common disjoint-ids case — monotone ids from
    // a fresh-documents feed — and takes the pure-append path; only a
    // batch whose id range OVERLAPS existing files pays upsert's
    // keyed collision probe over those files.
    val enc = LlmSimQueries.pqEncode(residuals, idx.books, keep = Seq("cell"))
      .dropDuplicates("vec_id")
      .localCheckpoint() // bound: the collision checks below and the write reuse it
    val codes = new LakehouseTable(spark, codesRoot(root, v))
    val r = enc.agg(min(col("vec_id")), max(col("vec_id"))).head
    val collides = !r.isNullAt(0) && codes.currentSnapshot().exists { snap =>
      // two-stage collision test, cheapest first: manifest min/max
      // prunes to candidate files with zero I/O (a disjoint id range —
      // the monotone-ids norm — exits here); survivors get one EXACT
      // column-pruned semi-join over only those files' vec_id column,
      // so interleaved-but-new ids (fresh docs with scattered ids)
      // still take the pure-append path at one column scan, not the
      // full keyed rewrite probe
      val candidates = codes.pruneFiles(snap,
        Seq(ScanPredicate.Range("vec_id", Some(r.getLong(0)), Some(r.getLong(1)))))._1
      candidates.nonEmpty && !codes.scanFiles(snap, candidates)
        .select("vec_id").join(enc.select("vec_id"), Seq("vec_id"), "left_semi")
        .isEmpty
    }
    if (collides) codes.upsert(enc, keys = Seq("vec_id"))
    else codes.append(enc, partitionBy = Seq("cell"))
  }

  /** Per-cell OCCUPANCY of the live codes table — the drift probe for
    * frozen-codebook appends: ZERO file opens, answered from manifest
    * row counts + the hive `cell=` partition paths (the reason codes
    * partition by cell in the first place). `skew` = max/mean — the
    * rebalance trigger a maintenance scheduler watches (a healthy
    * Lloyd layout sits near 1–3; a corpus that drifted into one cell
    * climbs unboundedly, and with it serve-time partition pruning
    * degrades toward a full scan). MoR removal tombstones subtract
    * per-cell from the manifest too (they are cell-partitioned by
    * construction); only a tombstone without a cell path degrades the
    * probe to one column-pruned scan.
    */
  def occupancy(spark: SparkSession, root: String): CellOccupancy = {
    val v = currentVersion(root).getOrElse(throw new IllegalStateException(
      s"no published index at $root"))
    val codes = new LakehouseTable(spark, codesRoot(root, v))
    val snap = codes.currentSnapshot().getOrElse(
      throw new IllegalStateException(s"index codes table at $root is empty"))
    def cellOf(f: String): Option[Int] = f.split('/').collectFirst {
      case seg if seg.startsWith("cell=") => seg.stripPrefix("cell=").toInt
    }
    def perCell(fs: Seq[String]): Option[Map[Int, Long]] = {
      val pairs = fs.map(f => cellOf(f).map(_ -> codes.fileRowsOf(snap, f)
        .getOrElse(0L)))
      if (pairs.exists(_.isEmpty)) None
      else Some(pairs.flatten.groupBy(_._1)
        .map { case (c, xs) => c -> xs.map(_._2).sum })
    }
    // MoR tombstones written through [[remove]]`(mergeOnRead = true)`
    // are cell-partitioned: per-cell removed counts subtract from the
    // per-cell data counts, all from MANIFEST stats — still ZERO file
    // opens right after the remove, exactly when a maintenance probe
    // runs. (Exact for resolved-id removals; a key re-added after its
    // removal under-counts its cell by one until compaction folds —
    // a rounding error on a max/mean skew trigger.) Only a tombstone
    // WITHOUT a cell path (a foreign key file) degrades to the scan.
    val counts: Map[Int, Long] =
      (perCell(snap.files), perCell(snap.tombstones)) match {
        case (Some(data), Some(removed)) =>
          data.map { case (c, n) =>
            c -> math.max(0L, n - removed.getOrElse(c, 0L)) }
        case _ =>
          codes.read().groupBy("cell").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
      }
    val vals = counts.values
    val mean = if (counts.isEmpty) 0.0 else vals.sum.toDouble / counts.size
    CellOccupancy(counts.size, vals.sum, if (counts.isEmpty) 0L else vals.min,
      if (counts.isEmpty) 0L else vals.max,
      mean, if (mean <= 0) 0.0 else vals.max / mean)
  }

  /** REBALANCE the live index against corpus drift: retrain ONLY the
    * coarse IVF centroids on `embeddings` (the current corpus) and
    * re-encode every vector's residual against the KEPT published
    * codebooks — the cheap half of a rebuild (one Lloyd chain + a
    * map-side encode; PQ codebook training, the expensive half, is
    * skipped, and serve-time ADC tables stay valid because the books
    * are bit-identical). Publishes as a new version with a provenance
    * bump, same atomic pointer flip + one-version GC grace as
    * [[build]]. Use when [[occupancy]] shows skewed cells after
    * frozen-codebook appends; a full [[build]] remains the codebook-
    * drift repair.
    */
  def rebalance(spark: SparkSession, embeddings: DataFrame, root: String,
      provenance: Option[CorpusProvenance] = None): AnnIndexHandle = {
    val prev = load(spark, root)
    val v = stageVersion(spark, embeddings, root, fixedBooks = Some(prev.books))
    publish(root, v, provenance.orElse(AnnIndex.provenance(root)))
    gcVersions(root, keepFrom = v - 1)
    load(spark, root)
  }

  /** [[rebalance]] pinned to a corpus version — the [[buildFromCorpus]]
    * twin: re-cluster on table `corpusRoot` as of `tag`/`snapshotId`
    * (default: current head, pinned to its id) and record the NEW pin
    * in the pointer, so [[provenance]] answers "which corpus state is
    * this layout balanced for" across the maintenance cycle.
    */
  def rebalanceFromCorpus(spark: SparkSession, corpusRoot: String, root: String,
      tag: Option[String] = None,
      snapshotId: Option[Long] = None): AnnIndexHandle = {
    require(tag.isEmpty || snapshotId.isEmpty,
      "tag and snapshotId are mutually exclusive corpus pins")
    val corpus = new LakehouseTable(spark, corpusRoot)
    val snap = tag.map(corpus.snapshotForTag)
      .orElse(snapshotId.map(corpus.snapshotOrThrow))
      .orElse(corpus.currentSnapshot())
      .getOrElse(throw new IllegalStateException(
        s"corpus table $corpusRoot has no snapshots"))
    rebalance(spark, corpus.scanAtSnapshot(snap.snapshotId), root,
      provenance = Some(CorpusProvenance(corpusRoot, snap.snapshotId, tag)))
  }

  /** Keep a published index IN STEP with its corpus table — the live
    * maintenance half of the corpus-release loop (q149's clone seeds a
    * replica in O(metadata); this keeps the replica's INDEX current):
    * diff the corpus between the index's recorded provenance pin and
    * the current head ([[LakehouseTable.changesBetween]] — CHANGE
    * volume, never table volume), MoR-remove the deleted keys
    * (key-file cost; [[occupancy]] stays manifest-exact), re-encode
    * inserted/updated rows against the FROZEN published codebooks
    * ([[append]] semantics — an updated id replaces its codes), and
    * advance the provenance pin to the drained head. Returns
    * (inserted, removed) row counts; (0, 0) when already in step.
    *
    * Removal runs FIRST: an updated id arrives as delete(old) +
    * insert(new), and masking the stale codes before the fresh ones
    * land keeps every intermediate state serviceable (MoR origin
    * ordering makes the new codes immune to the older mask). The pin
    * only advances after both halves land, and both halves are
    * re-applicable (removing an absent key masks nothing; re-appending
    * an id replaces its codes with the same frozen-book encoding), so
    * a crashed sync re-runs to the same state. Codebooks and centroids
    * never move here — [[rebalance]] and the scheduled full rebuild
    * remain the layout/codebook repairs.
    */
  def syncFromCorpus(spark: SparkSession, corpusRoot: String,
      root: String): (Long, Long) = {
    val prov = provenance(root).getOrElse(throw new IllegalStateException(
      s"index at $root records no corpus provenance — seed the lineage " +
        "with buildFromCorpus"))
    require(Paths.get(prov.table).toAbsolutePath.normalize ==
      Paths.get(corpusRoot).toAbsolutePath.normalize,
      s"index provenance points at '${prov.table}', not '$corpusRoot'")
    val corpus = new LakehouseTable(spark, corpusRoot)
    val head = corpus.currentSnapshot().getOrElse(throw new IllegalStateException(
      s"corpus table $corpusRoot has no snapshots")).snapshotId
    if (head == prov.snapshotId) return (0L, 0L)
    val changes = corpus.changesBetween(prov.snapshotId, head)
      .select(col("vec_id"), col("embedding"), col("_change"))
      .localCheckpoint() // one diff, consumed by both halves + counts
    val dels = changes.filter(col("_change") === "delete").select("vec_id")
    val ins = changes.filter(col("_change") === "insert")
      .select("vec_id", "embedding")
    val nDel = dels.count()
    val nIns = ins.count()
    if (nDel > 0) { remove(spark, dels, root, mergeOnRead = true); () }
    if (nIns > 0) { append(spark, ins, root); () }
    val v = currentVersion(root).getOrElse(throw new IllegalStateException(
      s"no published index at $root"))
    // the sync pin is a bare snapshot id — a release TAG names the
    // BUILD's corpus state; advancing past it must not keep claiming it
    publish(root, v, Some(CorpusProvenance(prov.table, head, tag = None)))
    (nIns, nDel)
  }

  /** Remove vectors from the LIVE index version by id — the index-
    * hygiene half of decontamination: when curation drops documents,
    * their vectors must stop serving. A keyed CDC delete against the
    * codes table: only the cell-partition files holding the ids are
    * rewritten (batch cost, never corpus cost — and never a training
    * job), the hive cell layout is preserved by the rewrite, and
    * serving reflects the removal immediately because the ADC scan and
    * the exact re-rank both hydrate from the codes rows. Codebooks and
    * centroids are untouched (removal cannot drift them; only the
    * scheduled full rebuild retrains).
    */
  def remove(spark: SparkSession, ids: DataFrame, root: String,
      mergeOnRead: Boolean = false): Snapshot = {
    val v = currentVersion(root).getOrElse(throw new IllegalStateException(
      s"no published index at $root — nothing to remove from"))
    val codes = new LakehouseTable(spark, codesRoot(root, v))
    val ch =
      if (!mergeOnRead) ids.select(col("vec_id")).withColumn("_change", lit("delete"))
      else
        // MoR removal defers the rewrite to compaction (write cost =
        // the key file, nothing else). Resolve each id's CELL first —
        // one column-pruned semi join — so the delete keys land under
        // the codes table's hive `cell=` layout: the tombstone then
        // carries per-cell manifest counts and [[occupancy]] stays
        // metadata-only. Resolving also drops ids the index never
        // held, keeping the per-cell accounting exact.
        codes.read().select("vec_id", "cell")
          .join(ids.select("vec_id"), Seq("vec_id"), "left_semi")
          .withColumn("_change", lit("delete"))
    codes.applyChanges(ch, Seq("vec_id"), mergeOnRead = mergeOnRead).get
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
