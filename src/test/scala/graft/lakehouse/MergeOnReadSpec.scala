package graft.lakehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Merge-on-read keyed writes: a CDC apply lands as a PURE APPEND
  * (batch keys as a tombstone + inserts as new files — zero existing
  * files read or rewritten), reads anti-join the tombstones with
  * origin-snapshot sequencing, and compaction folds everything back to
  * plain copy-on-write. Write amplification becomes the batch itself —
  * the property a high-frequency CDC feed into a 100 TB table needs.
  */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): LakehouseTable =
    new LakehouseTable(spark, tmpDir(prefix))

  private def content(t: LakehouseTable): Seq[(Long, String)] =
    t.read().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  private def ch(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "v", "_change")

  test("pre-MoR manifests parse with no tombstones (backward compat)") {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val s = org.json4s.jackson.Serialization.read[Snapshot](
      """{"snapshotId":1,"parentId":null,"timestampMs":5,"operation":"append",
         "files":["data/s1/part-0.parquet"],"schemaJson":"{}"}""")
    assert(s.tombstones.isEmpty)
  }

  test("MoR apply is a pure append: zero existing files read, rewritten, or probed") {
    val cow = newTable("mor-eq-cow")
    val mor = newTable("mor-eq-mor")
    val batches = Seq(
      ch((1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")),
      ch((2L, "b2", "insert"), (4L, "d", "insert")), // update 2, insert 4
      ch((1L, "a", "delete"), (3L, "c3", "insert")), // delete 1, update 3
      ch((5L, "e", "insert"), (5L, "e", "delete"))) // same-batch ins+del: insert wins (update shape)
    batches.foreach(b => cow.applyChanges(b, Seq("id")))

    val probed0 = mor.keyedWriteProbedFiles.get()
    var carried = true
    batches.foreach { b =>
      val before = mor.currentSnapshot().map(_.files).getOrElse(Nil)
      mor.applyChanges(b, Seq("id"), mergeOnRead = true)
      carried &&= before.forall(mor.currentSnapshot().get.files.contains)
    }
    assert(mor.keyedWriteProbedFiles.get() === probed0,
      "MoR never runs the touched-file probe")
    assert(carried, "MoR never drops or rewrites an existing data file")
    assert(mor.currentSnapshot().get.tombstones.nonEmpty)
    // equivalence with the copy-on-write semantics
    assert(content(mor) === content(cow))
    assert(content(mor) === Seq((2L, "b2"), (3L, "c3"), (4L, "d"), (5L, "e")))
  }

  test("origin parse anchors to the table's own data dir, not a '/data/s<digit>' in the ROOT path") {
    // a root like .../data/s3cache/warehouse/t would satisfy an
    // UNANCHORED '/data/s([0-9]+)' first-match with origin 3 for every
    // row — masking a batch's own re-inserts as if they predated their
    // tombstone (MoR updates would lose their new version)
    val root = java.nio.file.Paths.get(tmpDir("mor-evil"), "data", "s3cache", "warehouse", "t")
    java.nio.file.Files.createDirectories(root)
    val t = new LakehouseTable(spark, root.toString)
    t.applyChanges(ch((1L, "a", "insert"), (2L, "b", "insert")), Seq("id"), mergeOnRead = true)
    t.applyChanges(ch((1L, "a", "delete"), (1L, "A2", "insert")), Seq("id"), mergeOnRead = true)
    t.applyChanges(ch((2L, "b", "delete")), Seq("id"), mergeOnRead = true)
    assert(content(t) === Seq((1L, "A2")))
  }

  test("origin sequencing: same-batch delete+insert is an update; later re-insert resurrects") {
    val t = newTable("mor-seq")
    t.applyChanges(ch((1L, "a", "insert")), Seq("id"), mergeOnRead = true)
    // update = delete(old)+insert(new) in ONE batch: new version visible
    t.applyChanges(ch((1L, "a", "delete"), (1L, "A2", "insert")), Seq("id"),
      mergeOnRead = true)
    assert(content(t) === Seq((1L, "A2")))
    // delete, then re-insert in a LATER batch: the newer origin wins
    t.applyChanges(ch((1L, "A2", "delete")), Seq("id"), mergeOnRead = true)
    assert(content(t) === Seq())
    t.applyChanges(ch((1L, "A3", "insert")), Seq("id"), mergeOnRead = true)
    assert(content(t) === Seq((1L, "A3")))
  }

  test("every read path masks tombstoned rows: pruned reads, point lookup, DSv2 count, time travel") {
    val t = newTable("mor-reads")
    t.applyChanges(
      (1L to 100L).map(i => (i, s"v$i", "insert")).toDF("id", "v", "_change"),
      Seq("id"))
    val preMor = t.currentSnapshot().get.snapshotId
    t.applyChanges(ch((7L, "v7", "delete"), (50L, "V50", "insert")), Seq("id"),
      mergeOnRead = true)
    // skipping read: file stats still cover id=7, the anti-join masks it
    assert(t.read(Seq(ScanPredicate.EqualTo("id", 7L))).collect().isEmpty)
    assert(t.read(Seq(ScanPredicate.EqualTo("id", 50L)))
      .select("v").head.getString(0) === "V50")
    assert(t.readPointLookup("id", 7L).collect().isEmpty)
    // DSv2 face: metadata COUNT must NOT answer from (stale) manifest
    val df = spark.read.format("graft-lakehouse").load(t.root)
    assert(df.count() === 99L) // 100 - deleted 7; id 50 replaced, not duplicated
    assert(ScanEvents.lastScan(t.root).exists(_.filesPlanned > 0),
      "a MoR snapshot must fall back to a real scan for COUNT(*)")
    // time travel BEFORE the MoR apply sees the un-masked state
    assert(t.scanAtSnapshot(preMor).filter(col("id") === 7L).count() === 1L)
  }

  test("whole-table compaction folds tombstones; metadata counts and CDF fast path return") {
    val t = newTable("mor-fold")
    t.applyChanges(
      (1L to 50L).map(i => (i, s"v$i", "insert")).toDF("id", "v", "_change"), Seq("id"))
    t.applyChanges(ch((5L, "", "delete"), (6L, "V6", "insert")), Seq("id"),
      mergeOnRead = true)
    assert(t.manifestRowCount(t.currentSnapshot().get).isEmpty,
      "tombstones must disable metadata row counts")
    val folded = t.compact(fileThreshold = 1, maxRows = 1000000, targetFiles = 1)
    assert(folded.get.deletes.forall(_.isEmpty))
    assert(t.manifestRowCount(t.currentSnapshot().get).contains(49L))
    assert(content(t).size === 49 && !content(t).exists(_._1 == 5L))
    assert(content(t).contains((6L, "V6")))
  }

  test("changesBetween across MoR applies reports row-level diffs") {
    val t = newTable("mor-cdf")
    t.applyChanges(ch((1L, "a", "insert"), (2L, "b", "insert")), Seq("id"))
    val s1 = t.currentSnapshot().get.snapshotId
    t.applyChanges(ch((1L, "a", "delete"), (2L, "B2", "insert"), (3L, "c", "insert")),
      Seq("id"), mergeOnRead = true)
    val s2 = t.currentSnapshot().get.snapshotId
    val changes = t.changesBetween(s1, s2).select("id", "v", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(changes === Seq((1L, "a", "delete"), (2L, "B2", "insert"),
      (2L, "b", "delete"), (3L, "c", "insert")))
  }

  test("incremental MoR change feed: change-volume cost, never the table") {
    val t = newTable("mor-cdf-inc")
    // two key-disjoint bootstrap files
    t.applyChanges((1L to 50L).map(i => (i, s"v$i", "insert")).toDF("id", "v", "_change"), Seq("id"))
    t.applyChanges((1000L to 1050L).map(i => (i, s"v$i", "insert")).toDF("id", "v", "_change"), Seq("id"))
    val s0 = t.currentSnapshot().get.snapshotId
    // MoR batch touching ONLY the high range
    t.applyChanges(ch((1005L, "x", "delete"), (1010L, "NEW", "insert"), (2000L, "n", "insert")),
      Seq("id"), mergeOnRead = true)
    val s1 = t.currentSnapshot().get.snapshotId
    val changes = t.changesBetween(s0, s1)
    val got = changes.select("id", "v", "_change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got === Seq((1005L, "v1005", "delete"), (1010L, "NEW", "insert"),
      (1010L, "v1010", "delete"), (2000L, "n", "insert")))
    // the diff must read only the added files, the key-candidate files,
    // and the tombstones — the low-range bootstrap files stay untouched
    val lowRange = t.snapshotOrThrow(s0).files.filter { f =>
      val (files, _) = t.pruneFiles(t.snapshotOrThrow(s0),
        Seq(ScanPredicate.Range("id", Some(1000L), Some(2000L))))
      !files.contains(f)
    }
    assert(lowRange.nonEmpty, "fixture needs files outside the touched key range")
    val readSet = changes.inputFiles.toSeq
    assert(!lowRange.exists(lf => readSet.exists(_.endsWith(lf))),
      s"incremental CDF must not read key-disjoint files: $readSet")
  }

  test("snapshot expiry never GCs a tombstone a retained snapshot references") {
    val t = newTable("mor-gc")
    t.applyChanges(ch((1L, "a", "insert"), (2L, "b", "insert")), Seq("id"))
    Thread.sleep(15)
    t.applyChanges(ch((1L, "a", "delete")), Seq("id"), mergeOnRead = true)
    val cutoff = System.currentTimeMillis() + 60000
    t.expireSnapshotsOlderThan(cutoff) // everything but the head expires
    assert(content(t) === Seq((2L, "b")),
      "the tombstone must survive the GC sweep")
    val tomb = t.currentSnapshot().get.tombstones
    assert(tomb.nonEmpty && tomb.forall(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(t.root).resolve(f))))
  }

  test("hive layout: MoR inserts land partitioned; partial compaction keeps the tombstones") {
    val t = newTable("mor-part")
    t.append((1L to 40L).map(i => (i, s"v$i", if (i <= 20) "lo" else "hi"))
      .toDF("id", "v", "bucket"), partitionBy = Seq("bucket"))
    t.applyChanges(
      Seq((5L, "V5", "lo", "insert"), (25L, "x", "hi", "delete"))
        .toDF("id", "v", "bucket", "_change"),
      Seq("id"), mergeOnRead = true)
    val snap = t.currentSnapshot().get
    assert(snap.files.forall(_.contains("bucket=")),
      "MoR inserts must follow the table's hive layout")
    // partial (per-partition) compaction must carry tombstones: the
    // 'hi' delete still masks after 'lo' is rewritten
    t.applyChanges(ch((6L, "V6", "insert")).withColumn("bucket", lit("lo")),
      Seq("id"), mergeOnRead = true) // more lo files to cross the threshold
    val c = t.compactPartitioned("bucket", fileThreshold = 2, maxRows = 100000)
    assert(c.isDefined && c.get.tombstones.nonEmpty,
      "partition-scoped compaction must keep the tombstones")
    val got = t.read().select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(!got.exists(_._1 == 25L), "the hi-partition delete still applies")
    assert(got.contains((5L, "V5")) && got.contains((6L, "V6")))
    assert(got.count(_._1 == 5L) === 1, "the lo rewrite must not resurrect the old id=5 row")
  }

  test("MoR upsert via the public API and the batch write face") {
    val t = newTable("mor-upsert")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val before = t.currentSnapshot().get.files
    t.upsert(Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), Seq("id"), mergeOnRead = true)
    assert(before.forall(t.currentSnapshot().get.files.contains),
      "MoR upsert rewrites nothing")
    assert(content(t) === Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    // write-face option
    Seq((3L, "C3"), (4L, "d")).toDF("id", "v").write.format("graft-lakehouse")
      .option("keys", "id").option("mergeOnRead", "true").mode("append").save(t.root)
    assert(content(t) === Seq((1L, "a"), (2L, "B2"), (3L, "C3"), (4L, "d")))
  }
}
