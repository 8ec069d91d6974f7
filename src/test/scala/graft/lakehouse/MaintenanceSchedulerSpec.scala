package graft.lakehouse

import graft.SparkSpec

/** Maintenance beside a writer: expiry + compaction passes do their
  * jobs, and concurrent writer/maintenance activity serializes on the
  * table's single-writer lock without corrupting snapshot lineage
  * (`lakehouse/maintenance.py:62-124` + the shared write lock of
  * `sinks/iceberg.py:93-101`).
  */
class MaintenanceSchedulerSpec extends SparkSpec {
  import spark.implicits._

  test("compaction pass coalesces once over threshold; expiry drops old snapshots") {
    val table = new LakehouseTable(spark, tmpDir("maint"))
    (1 to 4).foreach(i => table.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 0, // everything but current is expirable
      expireIntervalMs = 3600000, compactIntervalMs = 3600000,
      compactFileThreshold = 2, compactMaxRows = 1000000)

    assert(sched.runCompaction().isDefined)
    assert(table.currentSnapshot().get.operation === "compact")
    assert(table.read().count() === 4)

    val expired = sched.runExpiry()
    assert(expired > 0)
    // current snapshot survives expiry; data intact
    assert(table.read().count() === 4)
    assert(sched.stats === ((expired, 1)))
  }

  test("tombstone budget: crossing triggers a targeted fold; under-budget leaves masks alone") {
    import org.apache.spark.sql.functions.col
    val t = new LakehouseTable(spark, tmpDir("maint-tomb"))
    (0 until 4).foreach { i =>
      val lo = i.toLong * 1000
      t.append((lo until lo + 1000).map(id => (id, s"v$id")).toDF("id", "v").coalesce(1))
    }
    // two MoR applies: masks ACCUMULATE (this is the unbudgeted shape)
    t.applyChanges(Seq((100L, "x", "delete")).toDF("id", "v", "_change"),
      Seq("id"), mergeOnRead = true)
    t.applyChanges(Seq((2100L, "x", "delete"), (2200L, "x", "delete"))
      .toDF("id", "v", "_change"), Seq("id"), mergeOnRead = true)
    val snap = t.currentSnapshot().get
    val (tf, tk, tb) = t.tombstoneVolume(snap)
    assert(tf >= 2 && tk === 3L && tb > 0L, s"volume ($tf, $tk, $tb)")
    def sched(maxKeys: Long) = new MaintenanceScheduler(t,
      expireOlderThanMs = 0, expireIntervalMs = 3600000,
      compactIntervalMs = 3600000, compactFileThreshold = 100,
      compactMaxRows = 1000000, maxTombstoneKeys = maxKeys)
    // under budget: no fold, masks stay
    assert(sched(maxKeys = 10).runTombstoneFold().isEmpty)
    assert(t.currentSnapshot().get.tombstones.nonEmpty)
    // over budget: the fold fires, rewrites ONLY the affected files
    // (ranges are disjoint: files 0 and 2), and drops every tombstone
    val folded = sched(maxKeys = 2).runTombstoneFold()
    assert(folded.exists(_.operation === "fold"))
    val cur = t.currentSnapshot().get
    assert(cur.tombstones.isEmpty, "fold must drop all tombstones")
    assert(t.tombstoneVolume(cur) === ((0, 0L, 0L)))
    assert(snap.files.count(cur.files.contains) === 2,
      "unaffected files must carry by reference")
    // content exact; the native scan no longer plans any mask
    val df = spark.read.format("graft-lakehouse").load(t.root)
    assert(df.count() === 3997L)
    assert(df.filter(col("id") === 2100L).collect().isEmpty)
    assert(df.filter(col("id") === 500L).select("v").head.getString(0) === "v500")
    assert(!df.queryExecution.executedPlan.toString.contains("MoR: masked"))
  }

  test("partition-scoped compaction pass: hot partitions coalesce, cold ones carry by reference") {
    val t = new LakehouseTable(spark, tmpDir("maint-part"))
    // 'a': 3 files (over threshold 3); 'b': 2 files (under)
    (1 to 3).foreach(i => t.append(Seq((i.toLong, "a")).toDF("id", "cell"),
      partitionBy = Seq("cell")))
    (4 to 5).foreach(i => t.append(Seq((i.toLong, "b")).toDF("id", "cell"),
      partitionBy = Seq("cell")))
    val before = t.currentSnapshot().get.files
    val sched = new MaintenanceScheduler(t,
      expireOlderThanMs = 0, expireIntervalMs = 3600000,
      compactIntervalMs = 3600000, compactFileThreshold = 3,
      compactMaxRows = 1000000, compactPartitionCol = Some("cell"))
    assert(sched.runCompaction().isDefined)
    val after = t.currentSnapshot().get.files
    assert(before.count(f => f.contains("cell=b") && after.contains(f)) === 2,
      "the under-threshold partition must carry by reference")
    assert(after.count(_.contains("cell=a")) === 1,
      "the hot partition must coalesce to one file")
    assert(t.read().count() === 5)
    // below threshold everywhere now: the pass is a no-op
    assert(sched.runCompaction().isEmpty)
  }

  test("zorder-configured compaction pass clusters instead of plain coalesce") {
    val table = new LakehouseTable(spark, tmpDir("maint-z"))
    (1 to 4).foreach(i => table.append(
      Seq((i.toLong, i.toLong * 7 % 5)).toDF("id", "k")))
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 0,
      expireIntervalMs = 3600000, compactIntervalMs = 3600000,
      compactFileThreshold = 2, compactMaxRows = 1000000,
      zorderCols = Seq("id", "k"))
    assert(sched.runCompaction().isDefined)
    assert(table.currentSnapshot().get.operation === "compact")
    assert(table.read().count() === 4)
    // below threshold now — the pass is a no-op, like plain compaction
    assert(sched.runCompaction().isEmpty)
  }

  test("zorder pass honors the row cap: target file count = ceil(rows / compactMaxRows)") {
    val table = new LakehouseTable(spark, tmpDir("maint-zcap"))
    // 4 appends × 64 rows = 256 rows; cap 100 → ceil(256/100) = 3 files
    (0 until 4).foreach { i =>
      table.append((0 until 64).map(j => (i * 64L + j, (i * 64L + j) * 7 % 97))
        .toDF("id", "k"))
    }
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 0,
      expireIntervalMs = 3600000, compactIntervalMs = 3600000,
      compactFileThreshold = 2, compactMaxRows = 100,
      zorderCols = Seq("id", "k"))
    val snap = sched.runCompaction()
    assert(snap.isDefined)
    assert(snap.get.files.size === 3,
      s"256 rows / cap 100 must rewrite into 3 z-files, got ${snap.get.files.size}")
    assert(table.read().count() === 256)
  }

  test("writer and maintenance interleave safely under the shared lock") {
    val table = new LakehouseTable(spark, tmpDir("maint-conc"))
    table.append(Seq((0L, "seed")).toDF("id", "v"))
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 3600000, expireIntervalMs = 3600000,
      compactIntervalMs = 3600000, compactFileThreshold = 2,
      compactMaxRows = 1000000)

    // writer thread appends 12 single-row snapshots while the main
    // thread fires compactions as fast as it can — every snapshot's
    // parent chain must stay consistent and no rows may be lost
    val writer = new Thread(() =>
      (1 to 12).foreach(i => table.append(Seq((i.toLong, s"v$i")).toDF("id", "v"))))
    writer.start()
    while (writer.isAlive) sched.runCompaction()
    writer.join()
    sched.runCompaction()

    assert(table.read().count() === 13)
    assert(table.read().agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) === (0 to 12).sum.toLong)
    // lineage: every snapshot's parent is the one before it
    val snaps = table.listSnapshots()
    snaps.sliding(2).foreach {
      case Seq(a, b) => assert(b.parentId.contains(a.snapshotId),
        s"broken lineage: ${b.snapshotId} -> ${b.parentId}")
      case _ => ()
    }
  }

  test("configured bloom_index_cols: sidecars build on the compaction cadence, compaction output included") {
    val table = new LakehouseTable(spark, tmpDir("maint-bloom"))
    (1 to 4).foreach(i => table.append(
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)))
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 3600000, expireIntervalMs = 3600000,
      compactIntervalMs = 3600000, compactFileThreshold = 2,
      compactMaxRows = 1000000, bloomIndexCols = Seq("id"))
    // pass 1: compaction rewrites the 4 files, then the bloom pass
    // indexes the fresh compaction output in the SAME pass
    assert(sched.runCompaction().isDefined)
    assert(sched.bloomStats >= 1)
    val files = table.currentSnapshot().get.files
    val (kept, skipped) = (table.pointLookupFiles("id", 2L)._1, table.pointLookupFiles("id", 2L)._2)
    assert(kept.nonEmpty && kept.size + skipped === files.size)
    assert(table.readPointLookup("id", 2L).count() === 1L)
    // pass 2: nothing new — incremental build is a no-op
    val before = sched.bloomStats
    sched.runBloomIndex()
    assert(sched.bloomStats === before, "re-index of immutable files must be a no-op")
  }

  test("configured ann_index_root: rebuild pass retrains the serving index over current table rows") {
    import org.apache.spark.sql.functions.col
    // a vector table in the (vec_id, embedding[64]) shape AnnIndex trains on
    def vec(id: Long): Seq[Float] =
      (0 until 64).map(d => (((id * 31 + d * 17) % 97).toFloat - 48f) / 48f)
    val table = new LakehouseTable(spark, tmpDir("maint-ann"))
    table.append((0L until 96L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idxRoot = tmpDir("maint-ann-idx")
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 0,
      expireIntervalMs = 3600000, compactIntervalMs = 3600000,
      compactFileThreshold = 2, compactMaxRows = 1000000,
      annIndexRoot = Some(idxRoot), annRebuildIntervalMs = 3600000)

    assert(sched.runAnnRebuild())
    assert(sched.annStats === 1)
    val idx = AnnIndex.load(spark, idxRoot)
    assert(idx.codes.count() === 96L)

    // ingestion keeps encoding incrementally against frozen codebooks;
    // the next scheduled rebuild re-fits to the grown corpus
    table.append((96L until 128L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    AnnIndex.append(spark, table.read().filter(col("vec_id") >= 96L), idxRoot)
    assert(AnnIndex.load(spark, idxRoot).codes.count() === 128L)
    assert(sched.runAnnRebuild())
    val refit = AnnIndex.load(spark, idxRoot)
    assert(refit.codes.count() === 128L)
    // a rebuild replaces, not appends: one codes row per vector
    assert(refit.codes.select("vec_id").distinct().count() === 128L)
    // unconfigured scheduler: the pass is a no-op
    val bare = new MaintenanceScheduler(table,
      expireOlderThanMs = 0,
      expireIntervalMs = 3600000, compactIntervalMs = 3600000,
      compactFileThreshold = 2, compactMaxRows = 1000000)
    assert(!bare.runAnnRebuild() && bare.annStats === 0)
  }

  test("occupancy-triggered rebalance: the scheduler probes skew and fires rebalanceFromCorpus with a provenance bump") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def vec(id: Long): Seq[Float] =
      (0 until 64).map(d => (((id * 31 + d * 17) % 97).toFloat - 48f) / 48f)
    val table = new LakehouseTable(spark, tmpDir("maint-rebal"))
    table.append((0L until 96L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idxRoot = tmpDir("maint-rebal-idx")
    AnnIndex.buildFromCorpus(spark, table.root, idxRoot)
    val built = AnnIndex.load(spark, idxRoot)
    // corpus DRIFT: a tight far-away blob the frozen centroids pile
    // into few cells — the occupancy skew the scheduler watches
    val drift = (0 until 120).map { i =>
      (5000L + i, (0 until 64).map(d =>
        (if (d < 8) 30.0f else 0.0f) + 0.01f * ((i + d) % 5)))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    table.append(drift)
    AnnIndex.append(spark, drift, idxRoot)
    val skewed = AnnIndex.occupancy(spark, idxRoot).skew
    val v0 = AnnIndex.currentVersion(idxRoot).get
    def sched(th: Double) = new MaintenanceScheduler(table,
      expireOlderThanMs = 0, expireIntervalMs = 3600000,
      compactIntervalMs = 3600000, compactFileThreshold = 9999,
      compactMaxRows = 1000000, annIndexRoot = Some(idxRoot),
      annRebalanceSkewThreshold = th)
    // under threshold: the probe runs (manifest-only), nothing fires
    assert(!sched(skewed + 1.0).runAnnRebalanceCheck())
    assert(AnnIndex.currentVersion(idxRoot) === Some(v0))
    // over threshold: rebalance fires — pointer bump, books kept
    // bit-identical, provenance re-pinned to the corpus HEAD
    val s = sched(math.max(1.0, skewed * 0.5))
    assert(skewed > math.max(1.0, skewed * 0.5), s"drift fixture must skew: $skewed")
    assert(s.runAnnRebalanceCheck())
    assert(s.annRebalanceStats === 1)
    assert(AnnIndex.currentVersion(idxRoot) === Some(v0 + 1))
    val rebal = AnnIndex.load(spark, idxRoot)
    def flat(b: Array[IndexedSeq[(Int, Array[Float])]]) =
      b.toSeq.map(_.map { case (c, a) => (c, a.toSeq) })
    assert(flat(rebal.books) === flat(built.books),
      "rebalance must keep the published codebooks bit-identical")
    assert(AnnIndex.occupancy(spark, idxRoot).skew < skewed,
      "the fired rebalance must repair the probed skew")
    assert(rebal.provenance.exists(p => p.table == table.root &&
      p.snapshotId == table.currentSnapshot().get.snapshotId),
      s"provenance must re-pin to the corpus head: ${rebal.provenance}")
    // unconfigured (threshold 0): the check is a no-op
    assert(!sched(0.0).runAnnRebalanceCheck())
  }

  test("timer-driven maintenance runs passes in the background") {
    val table = new LakehouseTable(spark, tmpDir("maint-timer"))
    (1 to 3).foreach(i => table.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val sched = new MaintenanceScheduler(table,
      expireOlderThanMs = 3600000, expireIntervalMs = 100,
      compactIntervalMs = 100, compactFileThreshold = 2,
      compactMaxRows = 1000000)
    sched.start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (sched.stats._2 < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sched.stats._2 >= 1, "compaction never ran on the timer")
    } finally sched.stop()
    assert(table.read().count() === 3)
  }
}
