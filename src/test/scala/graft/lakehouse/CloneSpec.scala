package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Zero-copy snapshot clone/export (round 15): a new table root seeded
  * from a tag/snapshot with files BY REFERENCE (absolute paths,
  * O(metadata)), independent lineage after the fork, a tag-based pin
  * contract against source expiry, and `deepen()` to localize bytes.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  /** Source with the hard parts live: hive partitions, a rename (era
    * resolution), and a MoR tombstone (masking + origin ordering).
    */
  private def buildSource(): LakehouseTable = {
    val t = new LakehouseTable(spark, tmpDir("clone-src"))
    t.append(Seq((1L, 0, "a"), (2L, 1, "b"), (3L, 0, "c"))
      .toDF("id", "cell", "v"), partitionBy = Seq("cell")) // snap 1
    t.renameColumn("v", "label") // snap 2
    t.append(Seq((4L, 1, "d")).toDF("id", "cell", "label"),
      partitionBy = Seq("cell")) // snap 3
    t.applyChanges(Seq((2L, "delete")).toDF("id", "_change"), Seq("id"),
      mergeOnRead = true) // snap 4: tombstone masks id=2
    t
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
    df.select("id", "cell", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private val expected = Set((1L, 0, "a"), (3L, 0, "c"), (4L, 1, "d"))

  test("shallow clone at a tag: zero bytes copied, reads identical through BOTH scan paths") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val cloneRoot = tmpDir("clone-dst")
    val c = t.cloneAtTag(cloneRoot, "rel")
    // ZERO data bytes under the clone root — pure metadata
    val dataDir = java.nio.file.Paths.get(cloneRoot, "data")
    assert(!java.nio.file.Files.isDirectory(dataDir) ||
      graft.Fs.walkAll(dataDir).forall(p => !p.toString.endsWith(".parquet")),
      "a shallow clone must not copy data files")
    // programmatic scan: era resolution + MoR masking over foreign files
    assert(rowsOf(c.read()) === expected)
    // native DSv2 scan too (origin parsing, per-dir basePath, stats)
    assert(rowsOf(spark.read.format("graft-lakehouse").load(cloneRoot)) === expected)
    // per-file stats carried into the seed with no footer reads: the
    // seed's stats map covers every referenced file
    val seed = c.currentSnapshot().get
    assert(seed.operation === "clone")
    assert((seed.files ++ seed.tombstones).forall(f =>
      seed.stats.exists(_.contains(f))), "seed must carry per-file stats")
    // the seed id EQUALS the fork id: referenced-file origins stay <=
    // it, so clone-side MoR tombstones (origin > fork) mask correctly
    assert(seed.snapshotId === t.snapshotForTag("rel").snapshotId)
    // provenance: the user tag is the pin
    assert(c.cloneProvenance.map(ci => (ci.pinTag, ci.deep)) ===
      Some((Some("rel"), false)))
  }

  test("clone and source advance independently after the fork") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val c = t.cloneAtTag(tmpDir("clone-ind"), "rel")
    // source advances: invisible to the clone
    t.append(Seq((9L, 0, "src-only")).toDF("id", "cell", "label"),
      partitionBy = Seq("cell"))
    assert(rowsOf(c.read()) === expected)
    // clone advances: append + a MoR delete of a PRE-FORK key (the
    // tombstone's origin must out-order the foreign files' origins)
    c.append(Seq((10L, 1, "clone-only")).toDF("id", "cell", "label"),
      partitionBy = Seq("cell"))
    c.applyChanges(Seq((1L, "delete")).toDF("id", "_change"), Seq("id"),
      mergeOnRead = true)
    assert(rowsOf(c.read()) === Set((3L, 0, "c"), (4L, 1, "d"), (10L, 1, "clone-only")))
    // ...and none of it reached the source
    assert(rowsOf(t.read()) === expected + ((9L, 0, "src-only")))
    // clone-side SQL-path operations work over the mixed file set
    assert(c.read().where(col("cell") === 0).count() === 1L)
  }

  test("expiry-vs-clone arbitration: the tag pins; deepen() localizes; a dropped pin is fatal") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val c = t.cloneAtTag(tmpDir("clone-exp"), "rel")
    t.append(Seq((9L, 0, "head")).toDF("id", "cell", "label"),
      partitionBy = Seq("cell"))
    // COMPACT rewrites the head so the fork's files stop being
    // head-referenced, then expire everything old: the TAGGED fork
    // state alone keeps those files alive — the pin doing its job
    assert(t.compact(fileThreshold = 1, maxRows = 1000000L).isDefined)
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(rowsOf(c.read()) === expected,
      "tagged fork files must survive source expiry (the pin contract)")
    // deepen: bytes localize, reads unchanged, nothing foreign remains
    val localized = c.deepen()
    assert(localized > 0)
    val after = c.currentSnapshot().get
    assert((after.files ++ after.tombstones).forall(f =>
      !java.nio.file.Paths.get(f).isAbsolute),
      s"deepen must leave only root-relative entries: ${after.files}")
    assert(rowsOf(c.read()) === expected)
    assert(rowsOf(spark.read.format("graft-lakehouse").load(c.root)) === expected)
    assert(c.deepen() === 0, "deepen is idempotent")
    // now the pin can go: source expiry deletes the fork's files and
    // the DEEPENED clone does not care
    t.dropTag("rel")
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(rowsOf(c.read()) === expected)
    // contrast: a shallow clone whose pin was dropped WITHOUT deepen
    // fails loudly once the source expires (the documented contract)
    val t2 = buildSource()
    t2.setTag("rel2", t2.currentSnapshot().get.snapshotId)
    val c2 = t2.cloneAtTag(tmpDir("clone-broken"), "rel2")
    t2.append(Seq((9L, 0, "head")).toDF("id", "cell", "label"),
      partitionBy = Seq("cell"))
    t2.dropTag("rel2")
    assert(t2.compact(fileThreshold = 1, maxRows = 1000000L).isDefined)
    t2.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    intercept[Exception](rowsOf(c2.read()))
  }

  test("cloneAtSnapshot auto-pins the source; deepen releases the pin") {
    val t = buildSource()
    val forkId = t.currentSnapshot().get.snapshotId
    val c = t.cloneAtSnapshot(tmpDir("clone-snap"), forkId)
    val pin = c.cloneProvenance.flatMap(_.pinTag)
    assert(pin.exists(_.startsWith("clone-pin-")), s"auto-pin expected: $pin")
    assert(t.tags.get(pin.get).map(_._1) === Some(forkId),
      "the auto-pin tag must point at the fork snapshot in the SOURCE")
    assert(rowsOf(c.read()) === expected)
    assert(c.deepen() > 0)
    assert(t.tags.get(pin.get).isEmpty, "deepen must release the auto-pin")
  }

  test("deep clone copies bytes at clone time: no pin, survives source removal") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val c = t.cloneAtTag(tmpDir("clone-deep"), "rel", deep = true)
    assert(c.cloneProvenance.map(_.pinTag) === Some(None), "deep clones need no pin")
    val seed = c.currentSnapshot().get
    assert((seed.files ++ seed.tombstones).forall(f =>
      !java.nio.file.Paths.get(f).isAbsolute))
    // the source can VANISH entirely
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(t.root))
    assert(rowsOf(c.read()) === expected)
    assert(rowsOf(spark.read.format("graft-lakehouse").load(c.root)) === expected)
  }

  test("foreign-file reads keep partition pruning — the clone's 100 TB scan story") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val root = tmpDir("clone-prune")
    t.cloneAtTag(root, "rel")
    // the hive `cell=` dirs live in the FOREIGN absolute paths — the
    // scan must still prune on them (hiveSegsOf anchors past the claim
    // dir), or a 100 TB clone would read every referenced file
    val got = spark.read.format("graft-lakehouse").load(root)
      .where(col("cell") === 1).select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(4L), s"cell=1 rows through the pruned clone scan: $got")
    val info = ScanEvents.lastScan(root).getOrElse(
      sys.error("no scan recorded for the clone root"))
    assert(info.filesPlanned < info.filesTotal,
      s"cell=1 must prune the clone's foreign hive dirs: $info")
  }

  test("clone refuses a busy destination and branch commits") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val other = new LakehouseTable(spark, tmpDir("clone-busy"))
    other.append(Seq((1L, "x")).toDF("id", "v"))
    intercept[IllegalArgumentException](t.cloneAtTag(other.root, "rel"))
    intercept[IllegalArgumentException](
      t.cloneAtSnapshot(t.root, t.currentSnapshot().get.snapshotId))
  }

  test("a deepen snapshot is CONTENT-NEUTRAL: the changefeed across it delivers nothing") {
    // deepen swaps foreign references for local copies of the SAME
    // bytes — the q101 cancellation contract must hold across it, or
    // every downstream changefeed consumer would re-receive the whole
    // clone as spurious deletes+inserts after a localization
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val c = t.cloneAtTag(tmpDir("clone-cdf"), "rel")
    c.append(Seq((801, 8, "post-fork")).toDF("id", "cell", "label")
      .coalesce(1)) // snap fork+1
    val preDeepen = c.currentSnapshot().get.snapshotId
    assert(c.deepen() > 0) // snap fork+2
    val across = spark.read.format("graft-changefeed")
      .option("path", c.root)
      .option("startingSnapshot", preDeepen).load()
    assert(across.count() === 0L,
      "a localization must never surface as row changes")
    // ...while the REAL post-fork change still delivers before it
    val fromFork = spark.read.format("graft-changefeed")
      .option("path", c.root)
      .option("startingSnapshot", preDeepen - 1).load()
    assert(fromFork.count() === 1L)
    assert(fromFork.head.getAs[String]("_change") === "insert")
  }

  test("SQL face: CALL clone_table seeds a catalog table; deepen_table localizes and releases the pin") {
    val cat = "clonecat"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakehouseCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir(s"$cat-wh"))
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.src")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.replica")
    spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.src SELECT id, concat('v', id) FROM range(50)")
    // default pin: current head by snapshot id → an auto clone-pin tag
    val r = spark.sql(
      s"CALL $cat.system.clone_table(table => 'db.src', dest => 'db.replica')").head
    assert(r.getLong(0) === 2L, "the seed id equals the fork id")
    assert(r.getString(1).startsWith("clone-pin-"), s"auto pin expected: $r")
    // the clone IS a catalog table immediately — reads, SQL, the lot
    assert(spark.sql(s"SELECT count(*), sum(id) FROM $cat.db.replica").head ===
      org.apache.spark.sql.Row(50L, (0L until 50L).sum))
    // both sides advance independently through SQL
    spark.sql(s"INSERT INTO $cat.db.src VALUES (100, 'src-only')")
    spark.sql(s"INSERT INTO $cat.db.replica VALUES (200, 'replica-only')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.src WHERE id = 200").head.getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.replica WHERE id = 100").head.getLong(0) === 0L)
    // deepen: bytes localize, the auto-pin releases on the SOURCE
    val localized = spark.sql(
      s"CALL $cat.system.deepen_table(table => 'db.replica')").head.getInt(0)
    assert(localized > 0)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val src = new LakehouseTable(spark,
      java.nio.file.Paths.get(wh, "db", "src").toString)
    assert(!src.tags.contains(r.getString(1)), "deepen must release the auto-pin")
    assert(spark.sql(
      s"CALL $cat.system.deepen_table(table => 'db.replica')").head.getInt(0) === 0)
    // tag-pinned form: the user tag is the pin (no auto tag created)
    spark.sql(s"CALL $cat.system.set_tag(table => 'db.src', tag => 'rel')")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.replica2")
    val r2 = spark.sql(s"CALL $cat.system.clone_table(" +
      "table => 'db.src', dest => 'db.replica2', tag => 'rel')").head
    assert(r2.getString(1) === "rel")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.replica2").head.getLong(0) === 51L)
    spark.sql(s"DROP TABLE $cat.db.src")
    spark.sql(s"DROP TABLE $cat.db.replica")
    spark.sql(s"DROP TABLE $cat.db.replica2")
  }

  test("deepen of a many-file clone distributes the byte copy as a Spark job") {
    val t = new LakehouseTable(spark, tmpDir("clone-dist-src"))
    // well past DriverCopyMax files: 6 write tasks x 2 cells
    t.append(spark.range(240)
      .selectExpr("id", "cast(id % 2 as int) as cell", "cast(id as string) as label")
      .repartition(6), partitionBy = Seq("cell"))
    val c = t.cloneAtSnapshot(tmpDir("clone-dist-dst"),
      t.currentSnapshot().get.snapshotId)
    val files = c.currentSnapshot().get.files
    assert(files.size > LakehouseTable.DriverCopyMax,
      s"fixture must exceed the driver-copy cap: ${files.size}")
    val tasks0 = CloneCopyStats.copyTasks.get()
    val copied0 = CloneCopyStats.filesCopied.get()
    assert(c.deepen() === files.size)
    assert(CloneCopyStats.copyTasks.get() - tasks0 > 1,
      "a many-file deepen must copy through >1 executor task, not a driver loop")
    assert(CloneCopyStats.filesCopied.get() - copied0 === files.size.toLong)
    // contract unchanged: bytes local, source can vanish, content equal
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(t.root))
    assert(c.read().count() === 240L)
    assert(spark.read.format("graft-lakehouse").load(c.root).count() === 240L)
  }

  /** A clone whose HEAD rewrote a foreign file away: the seed still
    * references the original — the one shape where `allHistory`
    * localizes strictly more than the plain deepen.
    */
  private def cloneWithRewrittenHistory(prefix: String): (LakehouseTable, LakehouseTable, Long) = {
    val t = buildSource()
    val forkId = t.currentSnapshot().get.snapshotId
    val c = t.cloneAtSnapshot(tmpDir(prefix), forkId)
    // CoW replace of a PRE-FORK key: the foreign file holding id=3
    // rewrites into a LOCAL file; only the seed references the original
    c.applyChanges(Seq((3L, 0, "rewritten", "insert"))
      .toDF("id", "cell", "label", "_change"), Seq("id"))
    (t, c, forkId)
  }

  private val rewrittenHead = Set((1L, 0, "a"), (4L, 1, "d"), (3L, 0, "rewritten"))

  test("deepen(allHistory) keeps pre-deepen time travel alive after the source vanishes") {
    val (t, c, forkId) = cloneWithRewrittenHistory("clone-hist")
    val headForeign = (c.currentSnapshot().get.files ++
      c.currentSnapshot().get.tombstones)
      .filter(f => java.nio.file.Paths.get(f).isAbsolute).distinct.size
    val localized = c.deepen(allHistory = true)
    assert(localized > headForeign,
      s"allHistory must also localize the rewritten-away seed file " +
        s"($localized vs head-foreign $headForeign)")
    // history manifests were NOT rewritten (immutability contract): the
    // seed still references the source by absolute path — only bytes moved
    val seed = c.listSnapshots().find(_.operation === "clone").get
    assert((seed.files ++ seed.tombstones).exists(f =>
      java.nio.file.Paths.get(f).isAbsolute),
      "allHistory must localize bytes, never rewrite history manifests")
    // the source EXPIRES entirely — pre-deepen time travel must survive
    // through the local copies (a fresh handle proves no cached state)
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(t.root))
    val c2 = new LakehouseTable(spark, c.root)
    assert(rowsOf(c2.scanAtSnapshot(forkId)) === expected,
      "time travel to the all-foreign seed after source expiry")
    assert(rowsOf(c2.read()) === rewrittenHead)
  }

  test("plain deepen leaves rewritten-away history foreign — the documented contract") {
    val (t, c, forkId) = cloneWithRewrittenHistory("clone-nohist")
    assert(c.deepen() > 0)
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(t.root))
    // the head is self-contained...
    assert(rowsOf(c.read()) === rewrittenHead)
    // ...but the seed's rewritten-away file was never localized: time
    // travel to pre-deepen states is the documented casualty
    intercept[Exception] {
      c.scanAtSnapshot(forkId).collect()
    }
  }

  test("a PARTIALLY-localized clone (deepen interrupted mid-copy) reads and upserts exactly") {
    val t = buildSource()
    val forkId = t.currentSnapshot().get.snapshotId
    val c = t.cloneAtSnapshot(tmpDir("clone-partial"), forkId)
    // simulate the crash window: SOME foreign bytes landed locally but
    // the deepen commit never did — the head still spells every
    // reference absolute, and local copies shadow a subset of them
    val cur = c.currentSnapshot().get
    val foreign = (cur.files ++ cur.tombstones)
      .filter(f => java.nio.file.Paths.get(f).isAbsolute)
    val one = foreign.find(_.contains("cell=0")).getOrElse(foreign.head)
    val local = java.nio.file.Paths.get(c.root)
      .resolve(LakehouseTable.claimDirRelative(one))
    java.nio.file.Files.createDirectories(local.getParent)
    java.nio.file.Files.copy(java.nio.file.Paths.get(one), local)
    // mixed resolution must stay group-consistent: reads answer exactly
    assert(rowsOf(c.read()) === expected)
    // and a CoW keyed apply must still find + rewrite the touched file
    // (the probe's URIs and the manifest's keys normalize to the same
    // claim-relative form whichever side served the bytes)
    c.applyChanges(Seq((3L, 0, "rewritten", "insert"))
      .toDF("id", "cell", "label", "_change"), Seq("id"))
    assert(rowsOf(c.read()) === rewrittenHead)
    // the finished deepen then completes the localization idempotently
    assert(c.deepen() > 0)
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(t.root))
    assert(rowsOf(c.read()) === rewrittenHead)
  }

  test("compaction on a shallow clone naturally localizes every file") {
    val t = buildSource()
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    val c = t.cloneAtTag(tmpDir("clone-compact"), "rel")
    assert(c.compact(fileThreshold = 1, maxRows = 1000000L).isDefined)
    val cur = c.currentSnapshot().get
    assert(cur.files.nonEmpty &&
      (cur.files ++ cur.tombstones).forall(f =>
        !java.nio.file.Paths.get(f).isAbsolute),
      s"compaction rewrites locally: ${cur.files}")
    assert(rowsOf(c.read()) === expected)
  }
}
