package graft.lakehouse

import graft.SparkSpec

/** Lakehouse-lite semantics, porting the assertions of the reference's
  * `tests/integration/test_lakehouse_e2e.py:72-266`: snapshots reflect
  * appends, point-in-time scans see historical state, rollback restores
  * state (and rejects invalid ids), compaction reduces file count,
  * expiry drops old snapshots and unreferenced files.
  */
class LakehouseTableSpec extends SparkSpec {
  import spark.implicits._

  test("append creates snapshots; reads see cumulative state") {
    val t = new LakehouseTable(spark, tmpDir("lh-append"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t.listSnapshots().map(_.operation) === Seq("append", "append"))
    assert(t.read().count() === 3)
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("time travel sees the state at each snapshot") {
    val t = new LakehouseTable(spark, tmpDir("lh-tt"))
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v"))
    val s2 = t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.scanAtSnapshot(s1.snapshotId).count() === 1)
    assert(t.scanAtSnapshot(s2.snapshotId).count() === 2)
    assert(t.scanAtSnapshot(s2.snapshotId, limit = Some(1)).count() === 1)
  }

  test("widen-only schema evolution: added columns read back as nulls; retyping rejected") {
    import org.apache.spark.sql.functions._
    val t = new LakehouseTable(spark, tmpDir("lh-evolve"))
    val s1 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // widening append: new column `score` flows, older rows go null
    t.append(Seq((3L, "c", 0.5)).toDF("id", "v", "score"))
    val now = t.read()
    assert(now.columns.toSet === Set("id", "v", "score"))
    assert(now.filter(col("score").isNull).count() === 2)
    assert(now.filter(col("id") === 3L && col("score") === 0.5).count() === 1)
    // a batch may also OMIT an existing column (nulls for its rows)
    t.append(Seq((4L, 0.7)).toDF("id", "score"))
    assert(t.read().filter(col("id") === 4L && col("v").isNull).count() === 1)
    assert(t.read().count() === 4)
    // time travel to the pre-widening snapshot sees the narrow shape
    assert(t.scanAtSnapshot(s1.snapshotId).columns.toSet === Set("id", "v"))
    // type change on a shared column stops the writer (monitor policy)
    val bad = intercept[IllegalArgumentException] {
      t.append(Seq((5L, 9)).toDF("id", "v")) // v: string -> int
    }
    assert(bad.getMessage.contains("incompatible type change"))
    // upsert is held to the same contract, and evolves the same way
    t.upsert(Seq((2L, "B2", 0.9)).toDF("id", "v", "score"), keys = Seq("id"))
    assert(t.read().filter(col("id") === 2L && col("score") === 0.9).count() === 1)
  }

  test("schema compatibility follows spark.sql.caseSensitive: case-variant names are the SAME column, not additive") {
    import org.apache.spark.sql.functions._
    val t = new LakehouseTable(spark, tmpDir("lh-case"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // 'ID' resolves to 'id' under default case-insensitive resolution —
    // a type change through the case variant must be REJECTED, not
    // accepted as a new column (which would poison later reads with
    // ambiguous-column failures)
    val retype = intercept[IllegalArgumentException] {
      t.append(Seq(("x", "b")).toDF("ID", "v"))
    }
    assert(retype.getMessage.contains("incompatible type change"))
    // same-type case variant is absorbed as the SAME column (no dup)
    t.append(Seq((2L, "b")).toDF("ID", "v"))
    assert(t.read().columns.count(_.equalsIgnoreCase("id")) === 1,
      s"case variant must not widen: ${t.read().columns.mkString(",")}")
    assert(t.read().count() === 2)
    // a batch carrying case-only duplicate columns is rejected outright
    val dup = intercept[IllegalArgumentException] {
      t.append(Seq((3L, 4L, "c")).toDF("id", "ID", "v"))
    }
    assert(dup.getMessage.contains("caseSensitive"))
  }

  test("changesBetween crosses a schema widening; compaction yields no phantom changes") {
    import org.apache.spark.sql.functions._
    val t = new LakehouseTable(spark, tmpDir("lh-cdf"))
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v").repartition(1))
    val s2 = t.append(Seq((2L, "b", 0.5)).toDF("id", "v", "score").repartition(1))
    // diff across the widening: the pre-widening row aligns with a null
    val ch = t.changesBetween(s1.snapshotId, s2.snapshotId).collect()
    assert(ch.length === 1)
    assert(ch.head.getAs[String]("_change") === "insert")
    assert(ch.head.getAs[Long]("id") === 2L && ch.head.getAs[Double]("score") === 0.5)
    // a pure rewrite produces zero changes
    val s3 = t.compact(fileThreshold = 2, maxRows = 1000).get
    assert(t.changesBetween(s2.snapshotId, s3.snapshotId).count() === 0)
    // unknown snapshot ids are rejected like the other lineage APIs
    intercept[IllegalArgumentException](t.changesBetween(99L, s3.snapshotId))
  }

  test("change-feed algebra fuzz: from + inserts − deletes = to, for random op sequences") {
    // the CDF contract as an executable identity: for ANY snapshot pair
    // (s_i, s_j), applying the diff to the earlier state reproduces the
    // later state as a multiset. Seeded random append/upsert/compact
    // sequences probe orderings a hand-written scenario would miss.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(101L)
    val t = new LakehouseTable(spark, tmpDir("lh-cdf-fuzz"))
    var snapIds = List.empty[Long]
    (1 to 8).foreach { _ =>
      val batch = (1 to 1 + rnd.nextInt(4))
        .map(_ => (rnd.nextInt(12).toLong, s"v${rnd.nextInt(5)}")).toDF("id", "v")
        .repartition(1)
      val s = rnd.nextInt(3) match {
        case 0 => t.append(batch)
        case 1 => t.upsert(batch, keys = Seq("id"))
        case _ => t.compact(fileThreshold = 1, maxRows = 10000)
          .getOrElse(t.append(batch))
      }
      snapIds ::= s.snapshotId
    }
    val ids = snapIds.reverse
    def stateOf(id: Long): Seq[(Long, String)] =
      t.scanAtSnapshot(id).as[(Long, String)].collect().toSeq.sorted
    // every consecutive pair plus a few long ranges
    val pairs = ids.sliding(2).map(p => (p.head, p.last)).toSeq ++
      Seq((ids.head, ids.last), (ids(1), ids(ids.length - 2)))
    pairs.foreach { case (a, b) =>
      val ch = t.changesBetween(a, b)
        .select(col("_change"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      val inserts = ch.collect { case ("insert", i, v) => (i, v) }
      val deletes = ch.collect { case ("delete", i, v) => (i, v) }
      val replayed = {
        val buf = scala.collection.mutable.ArrayBuffer(stateOf(a): _*)
        deletes.foreach { d =>
          val k = buf.indexOf(d)
          assert(k >= 0, s"delete $d not present in state($a) for range $a->$b")
          buf.remove(k)
        }
        (buf ++ inserts).sorted
      }
      assert(replayed === stateOf(b),
        s"replaying changes $a->$b must reproduce the target state")
    }
  }

  test("upsert replaces matching keys, keeps others, adds new") {
    val t = new LakehouseTable(spark, tmpDir("lh-upsert"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.upsert(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), keys = Seq("id"))
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("upsert is idempotent (same batch absorbed, mirroring replay)") {
    val t = new LakehouseTable(spark, tmpDir("lh-idem"))
    val batch = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    t.upsert(batch, keys = Seq("id"))
    t.upsert(batch, keys = Seq("id"))
    assert(t.read().count() === 2)
  }

  test("upsert rewrites only files containing matching keys") {
    val t = new LakehouseTable(spark, tmpDir("lh-rw"))
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val s3 = t.upsert(Seq((2L, "B")).toDF("id", "v"), keys = Seq("id"))
    // s1's file (untouched by the upsert) must carry over by reference
    assert(s1.files.forall(s3.files.contains))
  }

  test("upsert into a partitioned table keeps the hive layout (partition pruning survives merges)") {
    val t = new LakehouseTable(spark, tmpDir("lh-up-part"))
    t.append(Seq((1L, "hot"), (2L, "hot"), (100L, "cold")).toDF("id", "p")
      .coalesce(1), partitionBy = Seq("p"))
    t.upsert(Seq((2L, "hot"), (3L, "hot")).toDF("id", "p"), Seq("id"))
    assert(t.currentSnapshot().get.files.forall(_.contains("p=")),
      "rewritten and merged files must land back under partition dirs")
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((1L, "hot"), (2L, "hot"), (3L, "hot"), (100L, "cold")))
    // the cold partition's file was untouched (carried by reference)
    val cold = t.listSnapshots().head.files.filter(_.contains("p=cold"))
    assert(cold.forall(t.currentSnapshot().get.files.contains))
  }

  test("rollback restores old state as a new snapshot; invalid id rejected") {
    val t = new LakehouseTable(spark, tmpDir("lh-rb"))
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
    t.rollbackToSnapshot(s1.snapshotId)
    assert(t.read().count() === 1)
    assert(t.listSnapshots().last.operation === "rollback")
    val ex = intercept[IllegalArgumentException](t.rollbackToSnapshot(999L))
    assert(ex.getMessage.contains("Valid snapshot IDs"))
  }

  test("compaction coalesces files when over threshold, respects row cap") {
    val t = new LakehouseTable(spark, tmpDir("lh-compact"))
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val before = t.currentSnapshot().get.files.size
    assert(before >= 4)
    // row cap below table size → skipped
    assert(t.compact(fileThreshold = 3, maxRows = 2) === None)
    // within cap → compacts to 1 file, content preserved
    val snap = t.compact(fileThreshold = 3, maxRows = 1000000)
    assert(snap.isDefined)
    assert(snap.get.files.size === 1)
    assert(t.read().count() === 4)
    // below threshold → no-op
    assert(t.compact(fileThreshold = 3, maxRows = 1000000) === None)
  }

  test("partitioned append: hive layout, partition column round-trips, pruned scan") {
    val t = new LakehouseTable(spark, tmpDir("lh-part"))
    val snap = t.append(
      Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")).toDF("id", "v", "p"),
      partitionBy = Seq("p"))
    assert(snap.files.forall(_.contains("p=")))
    assert(t.read().as[(Long, String, String)].collect().toSet ===
      Set((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")))
    // partition filter prunes the scan to p=x files only
    val scanned = t.read().filter(org.apache.spark.sql.functions.col("p") === "x")
    assert(scanned.count() === 2)
    val plan = scanned.queryExecution.executedPlan.toString
    assert(!plan.contains("p=y"), "pruned partition must not be scanned")
  }

  test("partition-scoped compaction rewrites only hot partitions, respects row cap") {
    val t = new LakehouseTable(spark, tmpDir("lh-pcompact"))
    // 3 appends -> partition "hot" has 3 files, "cold" has 1
    t.append(Seq((1L, "hot"), (100L, "cold")).toDF("id", "p"), partitionBy = Seq("p"))
    t.append(Seq((2L, "hot")).toDF("id", "p"), partitionBy = Seq("p"))
    t.append(Seq((3L, "hot")).toDF("id", "p"), partitionBy = Seq("p"))
    val before = t.currentSnapshot().get
    val hotBefore = before.files.filter(_.contains("p=hot"))
    val coldBefore = before.files.filter(_.contains("p=cold"))
    assert(hotBefore.size === 3 && coldBefore.size === 1)

    // row cap below partition size -> nothing compacts
    assert(t.compactPartitioned("p", fileThreshold = 3, maxRows = 1) === None)

    val snap = t.compactPartitioned("p", fileThreshold = 3, maxRows = 1000)
    assert(snap.isDefined)
    val after = snap.get
    // cold partition's file carried over by reference; hot rewritten to 1
    assert(coldBefore.forall(after.files.contains))
    assert(hotBefore.forall(f => !after.files.contains(f)))
    assert(after.files.count(_.contains("p=hot")) === 1)
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((1L, "hot"), (2L, "hot"), (3L, "hot"), (100L, "cold")))
  }

  test("expiry drops old snapshots but never the current one") {
    val t = new LakehouseTable(spark, tmpDir("lh-expire"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.overwrite(Seq((2L, "b")).toDF("id", "v"))
    val dropped = t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(dropped === 1)
    assert(t.listSnapshots().size === 1)
    assert(t.read().as[(Long, String)].collect().toSet === Set((2L, "b")))
    // the expired snapshot's now-unreferenced file is gone from disk
    assert(intercept[IllegalArgumentException](t.scanAtSnapshot(1L)) != null)
  }

  test("applyChanges: keyed CDC apply — update replaces, bare delete removes, empty batch still snapshots") {
    import org.apache.spark.sql.functions._
    val t = new LakehouseTable(spark, tmpDir("lh-apply"))
    def batch(rows: (Long, String, String)*) =
      rows.toDF("id", "v", "_change")
    // bootstrap: pure inserts auto-create the table (no _change column lands)
    t.applyChanges(batch((1L, "a", "insert"), (2L, "b", "insert")), Seq("id"))
    assert(t.read().columns.toSeq === Seq("id", "v"))
    assert(t.read().as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // an update arrives as delete(old)+insert(new); a bare delete removes
    t.applyChanges(batch((2L, "b", "delete"), (2L, "B2", "insert"),
      (1L, "a", "delete"), (3L, "c", "insert")), Seq("id"))
    assert(t.read().as[(Long, String)].collect().toSet === Set((2L, "B2"), (3L, "c")))
    assert(t.currentSnapshot().get.operation === "apply")
    // untouched files carry over by reference (the upsert discipline)
    val before = t.currentSnapshot().get
    t.append(Seq((100L, "far")).toDF("id", "v"))
    val appended = t.currentSnapshot().get.files.diff(before.files)
    t.applyChanges(batch((3L, "c", "delete")), Seq("id"))
    assert(appended.forall(t.currentSnapshot().get.files.contains),
      "files without touched keys must not be rewritten")
    // empty change batch: no data files added, but a snapshot commits
    val n = t.listSnapshots().size
    t.applyChanges(batch(), Seq("id"), txn = Some(("app-x", 7L)))
    assert(t.listSnapshots().size === n + 1)
    assert(t.lastTxnVersion("app-x") === Some(7L))
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((2L, "B2"), (100L, "far")))
  }

  test("txn ledger: replayed versions are no-ops for applyChanges and appendIdempotent; marks survive reopen") {
    val t = new LakehouseTable(spark, tmpDir("lh-txn"))
    val app = "stream-q"
    assert(t.lastTxnVersion(app) === None)
    assert(t.applyChanges(
      Seq((1L, "a", "insert")).toDF("id", "v", "_change"), Seq("id"),
      txn = Some((app, 0L))).isDefined)
    // the same batchId replays after a crash-before-checkpoint: no-op
    assert(t.applyChanges(
      Seq((1L, "a", "insert")).toDF("id", "v", "_change"), Seq("id"),
      txn = Some((app, 0L))).isEmpty)
    assert(t.read().count() === 1, "replay must not duplicate rows")
    // an older version is also rejected; a newer one applies
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), app, 0L).isEmpty)
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), app, 1L).isDefined)
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), app, 1L).isEmpty)
    assert(t.read().count() === 2)
    // marks are durable manifest state, not handle state: a fresh handle
    // (a restarted writer process) sees them
    val reopened = new LakehouseTable(spark, t.root)
    assert(reopened.lastTxnVersion(app) === Some(1L))
    // ledgers are per-app: another app's versions are independent
    assert(reopened.appendIdempotent(Seq((3L, "c")).toDF("id", "v"),
      "other-app", 0L).isDefined)
    assert(reopened.lastTxnVersion(app) === Some(1L))
  }

  test("snapshot expiry never deletes an app's LATEST txn mark (replay safety survives retention)") {
    val t = new LakehouseTable(spark, tmpDir("lh-txn-expire"))
    assert(t.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "stream-a", 5L).isDefined)
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), "stream-a", 6L).isDefined)
    assert(t.appendIdempotent(Seq((3L, "c")).toDF("id", "v"), "stream-b", 0L).isDefined)
    t.append(Seq((4L, "d")).toDF("id", "v")) // unmarked head
    val dropped = t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    // every non-current manifest expires (data files vacuum freely) —
    // the marks they carried fold into the retention floor file
    assert(dropped === 3)
    assert(t.listSnapshots().size === 1)
    assert(t.lastTxnVersion("stream-a") === Some(6L),
      "the latest mark per app must survive maintenance via the floor file")
    assert(t.lastTxnVersion("stream-b") === Some(0L))
    // idempotent: a second expiry pass must not lose or regress floors
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(t.lastTxnVersion("stream-a") === Some(6L))
    // and the guarantee holds through a fresh handle (manifest truth)
    val re = new LakehouseTable(spark, t.root)
    assert(re.applyChanges(Seq((9L, "x", "insert")).toDF("id", "v", "_change"),
      Seq("id"), txn = Some(("stream-a", 6L))).isEmpty,
      "a replayed batch must still be absorbed after expiry")
  }

  test("hive partition values read back with the DECLARED type (path-inference cast)") {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir("lh-ptype"))
    // partition paths like part=7 type-INFER as INT on read; the
    // snapshot schema (LONG, from the written frame) must win on the
    // V1 scan path exactly as the DSv2 path already casts
    t.append(Seq((1L, 7L), (2L, 8L)).toDF("id", "part"), partitionBy = Seq("part"))
    assert(t.read().schema("part").dataType === org.apache.spark.sql.types.LongType)
    assert(t.read().as[(Long, Long)].collect().toSet === Set((1L, 7L), (2L, 8L)))
  }

  test("optimizeWrite clusters a wide batch to one file per partition value") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a 4-task batch into an 8-value layout writes up to 4x8 files
    // unclustered; with optimizeWrite each value lands in ONE task
    val batch = (0L until 800L).map(i => (i, i % 8)).toDF("id", "cell").repartition(4)
    val plain = new LakehouseTable(spark, tmpDir("lh-ow-plain"))
    plain.append(batch, partitionBy = Seq("cell"))
    val opt = new LakehouseTable(spark, tmpDir("lh-ow-opt"), optimizeWrite = true)
    opt.append(batch, partitionBy = Seq("cell"))
    assert(opt.currentSnapshot().get.files.size === 8,
      s"one file per partition value, got ${opt.currentSnapshot().get.files}")
    assert(plain.currentSnapshot().get.files.size > 8,
      "the unclustered control writes tasks x values files (else this spec tests nothing)")
    assert(opt.read().as[(Long, Long)].collect().toSet ===
      plain.read().as[(Long, Long)].collect().toSet)
    // the write faces expose it as an option
    val viaFace = tmpDir("lh-ow-face")
    batch.write.format("graft-lakehouse")
      .option("partitionBy", "cell").option("optimizeWrite", "true")
      .mode("append").save(viaFace)
    assert(new LakehouseTable(spark, viaFace).currentSnapshot().get.files.size === 8)
  }

  test("size-targeted optimizeWrite bins a SKEWED partition value into ≈targetBytes files") {
    import spark.implicits._
    val target = 64L * 1024
    val t = new LakehouseTable(spark, tmpDir("lh-ow-target"),
      optimizeWrite = true, optimizeWriteTargetBytes = Some(target))
    def rows(n: Long, p: String) = (0L until n).map(i =>
      (i, s"payload-$i-${i * 2654435761L}%016x-${"x" * 40}", p)).toDF("id", "v", "p")
    // seed batch: establishes the manifest bytes-per-row estimate
    // (a FRESH table has no estimate and writes uncapped — by design)
    t.append(rows(2000, "seed").repartition(2), partitionBy = Seq("p"))
    val seedFiles = t.currentSnapshot().get.files

    // skewed batch: one hot value dominating, one cold value
    t.append((rows(20000, "hot").union(rows(100, "cold"))).repartition(4),
      partitionBy = Seq("p"))
    val newFiles = t.currentSnapshot().get.files.diff(seedFiles)
    val hot = newFiles.filter(_.contains("p=hot"))
    val cold = newFiles.filter(_.contains("p=cold"))
    assert(cold.size === 1, s"the cold value stays one file, got $cold")
    assert(hot.size >= 3,
      s"the hot value must BIN into multiple ≈${target}B files, got ${hot.size}")
    // every binned file lands in the target's ballpark (parquet framing
    // and the estimate's batch-vs-batch drift allow slack, not 10×)
    val sizes = hot.map(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(t.root).resolve(f)))
    assert(sizes.forall(_ <= target * 3),
      s"no hot file may stay giant: ${sizes.mkString(",")} vs target $target")
    // content is unaffected by the binning
    assert(t.read().where(org.apache.spark.sql.functions.col("p") === "hot").count() === 20000L)
    assert(t.read().where(org.apache.spark.sql.functions.col("p") === "cold").count() === 100L)

    // the property travels with a catalog table
    val wh = tmpDir("lh-ow-target-wh")
    spark.conf.set("spark.sql.catalog.owcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.owcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS owcat.db")
    spark.sql("DROP TABLE IF EXISTS owcat.db.owt")
    spark.sql("CREATE TABLE owcat.db.owt (id BIGINT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('optimizeWrite'='true', " +
      s"'optimizeWrite.targetBytes'='$target')")
    rows(2000, "seed").write.format("graft-lakehouse").mode("append")
      .option("partitionBy", "p")
      .save(java.nio.file.Paths.get(wh, "db", "owt").toString)
    spark.sql("INSERT INTO owcat.db.owt SELECT id, v, p FROM " +
      "(SELECT id, concat('payload-', id, '-', repeat('x', 56)) AS v, 'hot' AS p " +
      " FROM range(20000))")
    val ct = new LakehouseTable(spark, java.nio.file.Paths.get(wh, "db", "owt").toString)
    val ctHot = ct.currentSnapshot().get.files.filter(_.contains("p=hot"))
    assert(ctHot.size >= 3,
      s"TBLPROPERTIES targetBytes must bin the skewed INSERT, got ${ctHot.size}")
    spark.sql("DROP TABLE owcat.db.owt")
  }
}
