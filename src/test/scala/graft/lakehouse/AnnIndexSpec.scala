package graft.lakehouse

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.LlmSimQueries

/** Persisted IVF-PQ index contracts: the reload path runs ZERO
  * training jobs (pinned via the train job group + a listener), a
  * reloaded index serves bit-identical answers, incremental append
  * encodes against frozen codebooks without retraining, and the codes
  * table is cell-partitioned so probes prune at the scan.
  */
class AnnIndexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private final class TrainJobCounter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (j.properties != null &&
          AnnIndex.TrainJobGroup == j.properties.getProperty("spark.jobGroup.id"))
        jobs.incrementAndGet()
  }

  /** Run `body`, return (result, training-job count observed). The
    * listener bus is async — settle by polling until the count is
    * stable across a beat.
    */
  private def countTrainJobs[T](body: => T): (T, Int) = {
    val l = new TrainJobCounter
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      var prev = -1
      var cur = l.jobs.get
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = l.jobs.get; spins += 1
      }
      (r, cur)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def emb = Tables.load(spark, sf, "embeddings")

  test("buildFromCorpus pins the corpus version, records provenance, and never sees later corpus commits") {
    import spark.implicits._
    val corpusRoot = tmpDir("ann-prov-corpus")
    val idxRoot = tmpDir("ann-prov-idx")
    val corpus = new LakehouseTable(spark, corpusRoot)
    corpus.append(emb.repartition(2)) // snap 1: the release
    corpus.setTag("corpus-v1", 1L)
    val built = AnnIndex.buildFromCorpus(spark, corpusRoot, idxRoot,
      tag = Some("corpus-v1"))
    assert(built.provenance ===
      Some(CorpusProvenance(corpusRoot, 1L, Some("corpus-v1"))))
    // the corpus advances past the release — invisible to the index
    corpus.append(Seq((900001L, Seq.fill(LlmSimQueries.AnnDim)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>")).coalesce(1)) // snap 2
    val reloaded = AnnIndex.load(spark, idxRoot)
    val prov = reloaded.provenance.get
    assert(prov === CorpusProvenance(corpusRoot, 1L, Some("corpus-v1")))
    // the lineage is actionable: time travel to the recorded snapshot
    // reproduces EXACTLY the training input, not the advanced head
    val t = new LakehouseTable(spark, prov.table)
    assert(t.scanAtSnapshot(prov.snapshotId).collect().length ===
      emb.collect().length)
    assert(t.read().collect().length === emb.collect().length + 1)
    // the index content matches the pin too: the post-pin vector is
    // not in the codes table
    assert(reloaded.codes.filter(col("vec_id") === 900001L).collect().isEmpty)
    // a plain build keeps None; an OLD pointer (no provenance field)
    // parses as None — pre-round-14 indexes load unchanged
    val bare = AnnIndex.build(spark, emb, tmpDir("ann-prov-bare"))
    assert(bare.provenance.isEmpty)
    val ptr = java.nio.file.Paths.get(idxRoot, "INDEX.json")
    java.nio.file.Files.writeString(ptr, """{"version": 1}""")
    assert(AnnIndex.load(spark, idxRoot).provenance.isEmpty)
    assert(AnnIndex.provenance(idxRoot).isEmpty)
  }

  test("build trains; load+serve runs zero training jobs and matches the build-session answer") {
    val root = tmpDir("annidx")
    val (built, buildTrainJobs) = countTrainJobs(AnnIndex.build(spark, emb, root))
    assert(buildTrainJobs > 0, "build must run its Lloyd passes under the train job group")
    val want = AnnIndex.serve(spark, built, emb).collect()
    assert(want.nonEmpty)

    // fresh session state: the reload stands on the persisted tables
    val s2 = spark.newSession()
    val ((idx, got), reloadTrainJobs) = countTrainJobs {
      val idx = AnnIndex.load(s2, root)
      (idx, AnnIndex.serve(s2, idx, Tables.load(s2, sf, "embeddings")).collect())
    }
    assert(reloadTrainJobs === 0, "reload path must not retrain")
    assert(got.toSeq === want.toSeq, "persisted index must serve bit-identical results")
    // handle metadata survived the round trip exactly
    assert(idx.centroids.map(_._1) === built.centroids.map(_._1))
    assert(idx.books.length === LlmSimQueries.PqM)
    idx.books.zip(built.books).foreach { case (a, b) =>
      assert(a.map(_._1) === b.map(_._1))
      a.zip(b).foreach { case ((_, ca), (_, cb)) => assert(ca.toSeq === cb.toSeq) }
    }
  }

  test("append encodes new vectors against frozen codebooks — no training, codes identical to a direct encode") {
    val root = tmpDir("annidx")
    val base = emb.filter(col("vec_id") < 96)
    val extra = emb.filter(col("vec_id") >= 96)
    val built = AnnIndex.build(spark, base, root)
    val before = built.codes.count()

    val (_, appendTrainJobs) = countTrainJobs(AnnIndex.append(spark, extra, root))
    assert(appendTrainJobs === 0, "append must never retrain")

    val idx = AnnIndex.load(spark, root)
    assert(idx.codes.count() === emb.count())
    assert(idx.codes.count() > before)
    // appended codes == map-side encode of the extras with the same
    // frozen books (the incremental path changes WHEN, never WHAT)
    val e2 = extra.withColumn("nrm", sqrt(expr("dotp(embedding, embedding)")))
    val assigned = LlmSimQueries.ivfAssignV(e2, built.centroids)
    val centDf = {
      import spark.implicits._
      built.centroids.map { case (cid, c, _) => (cid, c.toSeq) }.toDF("cell", "c_emb")
    }
    val want = assigned.join(broadcast(centDf), "cell")
      .withColumn("embedding", expr(
        "zip_with(embedding, c_emb, (x, c) -> CAST(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) AS FLOAT))"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val wantCodes = LlmSimQueries.pqEncode(want, built.books, keep = Seq("cell"))
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    val gotCodes = idx.codes.filter(col("vec_id") >= 96)
      .select(col("vec_id") +: col("cell") +:
        (0 until LlmSimQueries.PqM).map(s => col(s"code$s")): _*)
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(gotCodes.toSeq === wantCodes.toSeq)
  }

  test("rebuild publishes via the pointer flip: replaces content, GCs old versions, keeps the previous") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = tmpDir("annidx")
    AnnIndex.build(spark, emb.filter(col("vec_id") < 200), root)
    assert(AnnIndex.currentVersion(root) === Some(1L))
    assert(AnnIndex.load(spark, root).codes.count() === 200L)
    // second build over the grown corpus REPLACES (no leftover rows)
    AnnIndex.build(spark, emb, root)
    assert(AnnIndex.currentVersion(root) === Some(2L))
    val idx = AnnIndex.load(spark, root)
    assert(idx.codes.count() === emb.count())
    assert(idx.codes.select("vec_id").distinct().count() === emb.count())
    // v1 survives ONE rebuild (in-flight handles), v3 drops it
    def versionsOnDisk: Set[String] = Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("codes.v")).toSet
    assert(versionsOnDisk === Set("codes.v1", "codes.v2"))
    AnnIndex.build(spark, emb, root)
    assert(versionsOnDisk === Set("codes.v2", "codes.v3"))
  }

  test("CRASH INJECTION: a rebuild that dies after writing tables but before publish leaves the old index serving") {
    val root = tmpDir("annidx")
    val v1 = AnnIndex.build(spark, emb.filter(col("vec_id") < 200), root)
    val want = AnnIndex.serve(spark, v1, emb).collect()
    // simulate the crash: stage the next version fully (both tables
    // durably on disk) and stop before the pointer flip
    val staged = AnnIndex.stageVersion(spark, emb, root)
    assert(staged === 2L)
    // the pointer still names v1 — load() must resolve the OLD index
    assert(AnnIndex.currentVersion(root) === Some(1L))
    val idx = AnnIndex.load(spark, root)
    assert(idx.codes.count() === 200L, "unpublished rebuild must be invisible")
    assert(AnnIndex.serve(spark, idx, emb).collect().toSeq === want.toSeq,
      "serving must be unchanged by a crashed rebuild")
    // recovery: the next build simply re-stages v2 and publishes it
    val v2 = AnnIndex.build(spark, emb, root)
    assert(AnnIndex.currentVersion(root) === Some(2L))
    assert(v2.codes.count() === emb.count())
  }

  test("codes table is cell-partitioned: a probed scan reads only probed-cell files") {
    val root = tmpDir("annidx")
    AnnIndex.build(spark, emb, root)
    val idx = AnnIndex.load(spark, root)
    val cells = idx.codes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    assert(cells.length > 1, "fixture must produce multiple cells")
    val probe = cells.take(2)
    val files = idx.codes.filter(col("cell").isin(probe.map(Int.box): _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    // every file read belongs to a probed cell's hive directory
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(probe.exists(c => f.contains(s"cell=$c")),
        s"scan read unprobed file $f")
    }
  }

  test("re-appending existing ids REPLACES their codes — a retried batch can never duplicate serving rows") {
    import spark.implicits._
    val root = tmpDir("annidx-reapp")
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val rest = emb.filter(col("vec_id") % 4 === 0)
    AnnIndex.build(spark, base, root)
    AnnIndex.append(spark, rest, root)
    val once = AnnIndex.load(spark, root).codes.collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long]))
    // the retry: the SAME batch lands again (at-least-once ingestion)
    AnnIndex.append(spark, rest, root)
    val twice = AnnIndex.load(spark, root).codes
    assert(twice.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "a re-ingested id must never hold two code rows")
    assert(twice.collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long])).toSeq === once.toSeq,
      "re-appending the identical batch must be a bit-exact no-op on the codes")
    // layout still partitioned after the keyed rewrite
    val codesTable = new LakehouseTable(spark,
      root + "/codes.v" + AnnIndex.currentVersion(root).get)
    assert(codesTable.currentSnapshot().get.files.forall(_.contains("cell=")))

    // intra-batch duplicates (an at-least-once feed repeating an id
    // WITHIN one batch) also collapse to one code row
    val dup = rest.limit(4)
    AnnIndex.append(spark, dup.unionAll(dup), root)
    assert(AnnIndex.load(spark, root).codes
      .groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "duplicate ids inside one batch must not produce duplicate code rows")
  }

  test("append with DISJOINT ids takes the pure-append path — zero reads of existing code files") {
    import spark.implicits._
    val root = tmpDir("annidx-disjoint")
    AnnIndex.build(spark, emb.filter(col("vec_id") < 192), root)
    // structural check: the appended snapshot's operation distinguishes
    // the paths — "append" is the manifest-stats fast path, "upsert"
    // would mean the collision probe scanned existing code files
    AnnIndex.append(spark, emb.filter(col("vec_id") >= 192), root)
    val codesTable = new LakehouseTable(spark,
      root + "/codes.v" + AnnIndex.currentVersion(root).get)
    assert(codesTable.currentSnapshot().get.operation === "append",
      "disjoint-id ingestion must take the O(batch) append path, not the keyed probe")
  }

  test("occupancy probes drift from the manifest; rebalance retrains cells ONLY — books bit-identical, skew repaired") {
    import spark.implicits._
    val root = tmpDir("ann-rebal")
    val built = AnnIndex.build(spark, emb, root)
    val occ0 = AnnIndex.occupancy(spark, root)
    assert(occ0.rows === emb.count() && occ0.cells > 1)
    // corpus DRIFT: five tight far-apart blobs of 60 vectors each —
    // frozen centroids pile them into whichever old cell(s) sit
    // nearest, so occupancy skews; a re-clustered layout gives each
    // blob its own cell
    val drift = (0 until 300).map { i =>
      val g = i / 60
      (5000L + i, Seq.tabulate(LlmSimQueries.AnnDim)(d =>
        (if (d >= g * 12 && d < g * 12 + 12) 30.0f else 0.0f) +
          0.01f * ((i + d) % 5)), 0)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val (_, appendJobs) = countTrainJobs(AnnIndex.append(spark, drift, root))
    assert(appendJobs === 0)
    val occ1 = AnnIndex.occupancy(spark, root)
    assert(occ1.rows === occ0.rows + 300)
    assert(occ1.skew > occ0.skew && occ1.max > occ0.max,
      s"the frozen-codebook drift must show in the probe: $occ0 -> $occ1")
    val v1 = AnnIndex.currentVersion(root).get
    // REBALANCE on the current corpus: coarse cells retrain, books keep
    val rebal = AnnIndex.rebalance(spark, emb.unionByName(drift), root)
    def flat(b: Array[IndexedSeq[(Int, Array[Float])]]) =
      b.toSeq.map(_.map { case (c, a) => (c, a.toSeq) })
    assert(flat(rebal.books) === flat(built.books),
      "rebalance must keep the published codebooks bit-identical")
    val occ2 = AnnIndex.occupancy(spark, root)
    assert(occ2.rows === occ1.rows, "rebalance re-encodes, never drops rows")
    assert(occ2.skew < occ1.skew && occ2.max < occ1.max,
      s"re-clustering must repair the skew: $occ1 -> $occ2")
    // published as a NEW version (pointer flip), previous kept for
    // in-flight readers, and the rebalanced handle serves
    assert(AnnIndex.currentVersion(root) === Some(v1 + 1))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, s"codes.v$v1")))
    val served = AnnIndex.serve(spark, rebal,
      emb.unionByName(drift))
    assert(served.count() > 0)
  }

  /** Run `body`, return (result, TOTAL Spark jobs observed) — the
    * zero-I/O proof for manifest-only probes (stronger than file-open
    * counting: no job, no scan, no footer).
    */
  private def countAllJobs[T](body: => T): (T, Int) = {
    val l = new SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      var prev = -1
      var cur = l.jobs.get
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = l.jobs.get; spins += 1
      }
      (r, cur)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("MoR removal keeps occupancy MANIFEST-ONLY: per-cell counts subtract the removal tombstone, zero Spark jobs") {
    import spark.implicits._
    val root = tmpDir("annidx-morrm")
    AnnIndex.build(spark, emb, root)
    val occ0 = AnnIndex.occupancy(spark, root)
    val victims = emb.filter(col("vec_id") % 7 === 2).select("vec_id")
    val nVictims = victims.count()
    val (_, trainJobs) = countTrainJobs(
      AnnIndex.remove(spark, victims, root, mergeOnRead = true))
    assert(trainJobs === 0, "MoR removal must never retrain")
    val codesTable = new LakehouseTable(spark,
      root + "/codes.v" + AnnIndex.currentVersion(root).get)
    val snap = codesTable.currentSnapshot().get
    assert(snap.tombstones.nonEmpty,
      "MoR removal must defer the rewrite to a key tombstone")
    assert(snap.tombstones.forall(_.contains("cell=")),
      s"removal tombstones must land cell-partitioned: ${snap.tombstones}")
    // the probe right after the remove — exactly when a maintenance
    // scheduler calls it — must answer from the manifest alone
    val (occ1, probeJobs) = countAllJobs(AnnIndex.occupancy(spark, root))
    assert(probeJobs === 0,
      "occupancy under MoR removal tombstones must run ZERO jobs (no scan fallback)")
    assert(occ1.rows === occ0.rows - nVictims,
      s"manifest subtraction must be exact for resolved-id removals: $occ0 -> $occ1")
    // ...and per-cell it matches the true post-mask counts bit-for-bit
    val trueCounts = codesTable.read().groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ1.rows === trueCounts.values.sum)
    assert(occ1.max === trueCounts.values.max)
    // a fully-emptied cell keeps a 0 entry in the probe (the true
    // groupBy would omit it) — cells may only differ in that direction
    assert(occ1.cells >= trueCounts.size, s"probe $occ1 vs true $trueCounts")
    // serving reflects the removal immediately (the MoR mask at read)
    val served = AnnIndex.serve(spark, AnnIndex.load(spark, root), emb)
    val victimIds = victims.as[Long].collect().toSet
    assert(served.filter(col("vec_id").isin(victimIds.toSeq: _*)).isEmpty,
      "a MoR-removed vector must never appear in any top-k")
  }

  test("syncFromCorpus applies exactly the corpus diff: arrivals encode frozen, departures mask, updates replace, pin advances") {
    import spark.implicits._
    val corpusRoot = tmpDir("ann-sync-c")
    val idxRoot = tmpDir("ann-sync-i")
    val corpus = new LakehouseTable(spark, corpusRoot)
    corpus.append(emb.repartition(2)) // snap 1
    AnnIndex.buildFromCorpus(spark, corpusRoot, idxRoot)
    val before = AnnIndex.load(spark, idxRoot)
    val beforeCodes = before.codes.collect().map(_.toSeq)
      .map(r => r.head.asInstanceOf[Long] -> r).toMap
    // the corpus churns: one UPDATE (same id, different vector), one
    // DELETE, one ARRIVAL — all through ordinary corpus writes
    val victim = 3L
    val updated = 7L
    val newcomer = 900001L
    val updVec = emb.filter(col("vec_id") === updated)
      .select("embedding").as[Seq[Float]].head().map(x => x + 5.0f)
    corpus.applyChanges(
      Seq((victim, "delete")).toDF("vec_id", "_change"),
      Seq("vec_id"), mergeOnRead = true)
    corpus.upsert(Seq((updated, updVec, 0))
      .toDF("vec_id", "embedding", "label"), Seq("vec_id"))
    corpus.append(Seq((newcomer, Seq.fill(LlmSimQueries.AnnDim)(0.125f), 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>")).coalesce(1))
    val (ins, rm) = AnnIndex.syncFromCorpus(spark, corpusRoot, idxRoot)
    assert(ins === 2L && rm === 2L,
      s"update = delete(old)+insert(new), so +2/-2 expected: +$ins/-$rm")
    val after = AnnIndex.load(spark, idxRoot)
    // books and centroids NEVER move on a sync
    assert(after.centroids.map(c => (c._1, c._2.toSeq)) ===
      before.centroids.map(c => (c._1, c._2.toSeq)))
    assert(after.books.map(_.map { case (i, v) => (i, v.toSeq) }).toSeq ===
      before.books.map(_.map { case (i, v) => (i, v.toSeq) }).toSeq)
    val afterCodes = after.codes.collect().map(_.toSeq)
      .map(r => r.head.asInstanceOf[Long] -> r).toMap
    assert(!afterCodes.contains(victim), "a departed id must stop serving")
    assert(afterCodes.contains(newcomer), "an arrival must enter the index")
    assert(afterCodes(updated) !== beforeCodes(updated),
      "an updated id must REPLACE its codes (re-encoded vector)")
    assert(afterCodes.contains(updated) &&
      afterCodes.count(_._1 == updated) === 1, "exactly one row per live id")
    // untouched ids keep bit-identical codes
    (beforeCodes.keySet - victim - updated).foreach { id =>
      assert(afterCodes(id) === beforeCodes(id), s"id $id must be untouched")
    }
    // the pin advanced to the head; an in-step re-run is a no-op
    assert(AnnIndex.provenance(idxRoot).map(_.snapshotId) ===
      Some(corpus.currentSnapshot().get.snapshotId))
    assert(AnnIndex.syncFromCorpus(spark, corpusRoot, idxRoot) === ((0L, 0L)))
  }

  test("remove deletes EXACTLY the requested ids — no training, other codes bit-unchanged, cell layout preserved") {
    import spark.implicits._
    val root = tmpDir("annidx-rm")
    AnnIndex.build(spark, emb, root)
    val before = AnnIndex.load(spark, root)
    val beforeCodes = before.codes.collect().map(_.toSeq).toSet
    val victims = emb.filter(col("vec_id") % 7 === 2).select("vec_id")
    val victimIds = victims.as[Long].collect().toSet

    val (_, trainJobs) = countTrainJobs(AnnIndex.remove(spark, victims, root))
    assert(trainJobs === 0, "removal must never retrain")

    val after = AnnIndex.load(spark, root)
    // codebooks and centroids untouched
    assert(after.centroids.map(c => (c._1, c._2.toSeq)) ===
      before.centroids.map(c => (c._1, c._2.toSeq)))
    assert(after.books.map(_.map { case (i, v) => (i, v.toSeq) }).toSeq ===
      before.books.map(_.map { case (i, v) => (i, v.toSeq) }).toSeq)
    // codes = before minus exactly the victims, bit-identical rows
    val afterCodes = after.codes.collect().map(_.toSeq).toSet
    assert(afterCodes === beforeCodes.filterNot(r =>
      victimIds.contains(r.head.asInstanceOf[Long])),
      "removal must drop exactly the requested ids and leave every other code row bit-unchanged")
    // the rewrite preserved the hive cell layout (partition-pruned
    // serving keeps its skipping power)
    val codesTable = new LakehouseTable(spark,
      root + "/codes.v" + AnnIndex.currentVersion(root).get)
    assert(codesTable.currentSnapshot().get.files.forall(_.contains("cell=")),
      "rewritten survivor files must land back under cell= dirs")
    // serving never surfaces a removed id
    val served = AnnIndex.serve(spark, after, emb)
    assert(served.filter(col("vec_id").isin(victimIds.toSeq: _*)).isEmpty,
      "a removed vector must never appear in any top-k")
  }
}
