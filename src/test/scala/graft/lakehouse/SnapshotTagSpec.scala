package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot TAGS (named refs): `setTag`/`dropTag`/`tags`, resolution
  * via `VERSION AS OF '<tag>'`, the `$refs` registry, the SQL CALL
  * face, and the retention contract — a tagged snapshot (and its
  * files) survives `expire_snapshots` until the tag drops. The
  * reproducible-corpus-version primitive: tag what a training run
  * consumed, and that exact table state stays addressable.
  */
class SnapshotTagSpec extends SparkSpec {
  import spark.implicits._

  test("set / resolve / re-point / drop; unknown tags list what exists") {
    val t = new LakehouseTable(spark, tmpDir("tag-basic"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val s1 = t.currentSnapshot().get.snapshotId
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.setTag("corpus-v1", s1)
    assert(t.tags.keySet === Set("corpus-v1"))
    assert(t.snapshotForTag("corpus-v1").snapshotId === s1)
    // tags are movable pointers: re-point replaces
    t.setTag("corpus-v1", t.currentSnapshot().get.snapshotId)
    assert(t.snapshotForTag("corpus-v1").snapshotId !== s1)
    val e = intercept[IllegalArgumentException](t.snapshotForTag("nope"))
    assert(e.getMessage.contains("corpus-v1"), e.getMessage)
    assert(t.dropTag("corpus-v1") && !t.dropTag("corpus-v1"))
    // hygiene: a tag name is a filename
    intercept[IllegalArgumentException](t.setTag("../escape", 1L))
    intercept[IllegalArgumentException](t.setTag(".hidden", 1L))
    // tagging a snapshot that does not exist refuses
    intercept[IllegalArgumentException](t.setTag("ok", 999L))
  }

  test("a tagged snapshot and its files survive retention until the tag drops") {
    val t = new LakehouseTable(spark, tmpDir("tag-retain"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val s1 = t.currentSnapshot().get.snapshotId
    t.overwrite(Seq((9L, "z")).toDF("k", "v").coalesce(1)) // s1's files now unreferenced by head
    t.setTag("pinned", s1)
    Thread.sleep(15)
    val cutoff = System.currentTimeMillis() + 60000
    t.expireSnapshotsOlderThan(cutoff)
    // the tagged snapshot is still addressable WITH its data
    assert(t.scanAtSnapshot(s1).as[(Long, String)].collect().toSet === Set((1L, "a")),
      "tagged snapshot must survive expiry with its files")
    assert(t.snapshotForTag("pinned").snapshotId === s1)
    // drop the tag → the next expiry takes it
    t.dropTag("pinned")
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    intercept[IllegalArgumentException](t.scanAtSnapshot(s1))
  }

  test("path face: .option(snapshotTag) pins the tagged snapshot like VERSION AS OF") {
    val t = new LakehouseTable(spark, tmpDir("tag-path"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.setTag("v1", t.currentSnapshot().get.snapshotId)
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val pinned = spark.read.format("graft-lakehouse")
      .option("snapshotTag", "v1").load(t.root)
    assert(pinned.as[(Long, String)].collect().toSet === Set((1L, "a")))
    // the pin holds across actions even if the tag MOVES mid-query
    t.setTag("v1", t.currentSnapshot().get.snapshotId)
    assert(pinned.count() === 1L, "a loaded frame keeps its resolved pin")
    intercept[IllegalArgumentException](
      spark.read.format("graft-lakehouse")
        .option("snapshotTag", "missing").load(t.root))
  }

  test("SQL face: CALL set_tag (default = head) / drop_tag, VERSION AS OF '<tag>', $refs") {
    val wh = tmpDir("tag-wh")
    spark.conf.set("spark.sql.catalog.tagcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.tagcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagcat.db")
    spark.sql("DROP TABLE IF EXISTS tagcat.db.t")
    spark.sql("CREATE TABLE tagcat.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO tagcat.db.t VALUES (1, 'a')")
    val tagged = spark.sql(
      "CALL tagcat.system.set_tag(table => 'db.t', tag => 'corpus-v1')")
      .head.getLong(0)
    spark.sql("INSERT INTO tagcat.db.t VALUES (2, 'b')")
    // head moved on; the tag still reads the pinned state
    assert(spark.sql("SELECT count(*) FROM tagcat.db.t").head.getLong(0) === 2L)
    assert(spark.sql("SELECT k, v FROM tagcat.db.t VERSION AS OF 'corpus-v1'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a")))
    val refs = spark.sql("SELECT tag, snapshot_id FROM tagcat.db.`t$refs`").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(refs === Seq(("corpus-v1", tagged)))
    assert(spark.sql("CALL tagcat.system.drop_tag(table => 'db.t', tag => 'corpus-v1')")
      .head.getBoolean(0))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM tagcat.db.t VERSION AS OF 'corpus-v1'").collect())
    assert(e.getMessage.contains("not found"), e.getMessage)
    spark.sql("DROP TABLE tagcat.db.t")
  }

  test("an ALL-DIGIT tag resolves through VERSION AS OF when no such snapshot id exists") {
    // '20260816' Long-parses, so snapshot-id resolution is tried first —
    // but when the table has no snapshot 20260816 the tag namespace must
    // answer, or date-shaped tags are reachable from .option(snapshotTag)
    // yet never from SQL (ADVICE r12)
    val wh = tmpDir("tag-digit-wh")
    spark.conf.set("spark.sql.catalog.tagdig", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.tagdig.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagdig.db")
    spark.sql("CREATE TABLE tagdig.db.t (k BIGINT)")
    spark.sql("INSERT INTO tagdig.db.t VALUES (1)")
    spark.sql("CALL tagdig.system.set_tag(table => 'db.t', tag => '20260816')")
    spark.sql("INSERT INTO tagdig.db.t VALUES (2)")
    assert(spark.sql("SELECT count(*) FROM tagdig.db.t VERSION AS OF '20260816'")
      .head.getLong(0) === 1L)
    // a REAL snapshot id still wins over any same-spelled tag lookup
    val headId = spark.sql("SELECT max(snapshot_id) FROM tagdig.db.`t$snapshots`")
      .head.getLong(0)
    assert(spark.sql(s"SELECT count(*) FROM tagdig.db.t VERSION AS OF $headId")
      .head.getLong(0) === 2L)
    // neither a snapshot nor a tag: the error says so
    val e = intercept[Exception](
      spark.sql("SELECT * FROM tagdig.db.t VERSION AS OF '99990101'").collect())
    assert(e.getMessage.contains("neither a snapshot id"), e.getMessage)
    spark.sql("DROP TABLE tagdig.db.t")
  }
  test("tag-vs-expiry arbitration: a tag landing in the sweep window survives; late tags fail loudly; stale locks break") {
    val root = tmpDir("tag-arb")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1)) // snap 1 (old)
    Thread.sleep(15)
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1)) // snap 2 (current)
    val other = new LakehouseTable(spark, root) // the "remote" writer
    // 1. the round-12 race window: the tag lands AFTER the sweep
    //    started but BEFORE its locked listing — the in-lock listing
    //    must see it and keep the snapshot
    t.onBeforeExpireSweep = () => {
      other.setTag("pinned", 1L)
      t.onBeforeExpireSweep = () => ()
    }
    try t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    finally t.onBeforeExpireSweep = () => ()
    assert(t.snapshotForTag("pinned").snapshotId === 1L)
    assert(t.listSnapshots().map(_.snapshotId).contains(1L),
      "the racing tag must protect its snapshot from the same sweep")
    // 2. the other linearization: once the sweep deleted the manifest,
    //    a setTag against it fails LOUDLY and leaves no ref
    t.dropTag("pinned")
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(t.listSnapshots().map(_.snapshotId) === Seq(2L))
    val e = intercept[IllegalArgumentException](other.setTag("late", 1L))
    assert(e.getMessage.contains("not found"), e.getMessage)
    assert(!t.tags.contains("late"), "a failed setTag must leave no ref")
    // 3. a crashed holder's lock ages out: setTag breaks it and lands
    val lock = java.nio.file.Paths.get(root, "_refs", ".lock")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - LakehouseTable.RefLockStaleMs - 60000L))
    t.setTag("after-stale", 2L)
    assert(t.snapshotForTag("after-stale").snapshotId === 2L)
    assert(!java.nio.file.Files.exists(lock), "the lock releases after the write")
  }

  test("a LIVE holder's long critical section survives breakers: the heartbeat refreshes the lock") {
    val root = tmpDir("tag-hb")
    val a = new LakehouseTable(spark, root)
    a.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val b = new LakehouseTable(spark, root)
    // stale threshold far BELOW the critical-section length: without
    // the heartbeat, b would break a's live lock mid-section (the
    // ADVICE r13 two-holders race); with it, mtime never ages past the
    // threshold and b waits for the real release
    a.refLockStaleMs = 250L
    b.refLockStaleMs = 250L
    val aInside = new java.util.concurrent.atomic.AtomicBoolean(false)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val holder = new Thread(() => a.refsLockedForTest {
      aInside.set(true); Thread.sleep(1200); aInside.set(false)
    })
    holder.start()
    Thread.sleep(400) // a's lock is now older than the naive threshold
    b.refsLockedForTest { if (aInside.get) overlap.set(true) }
    holder.join(10000)
    assert(!overlap.get,
      "a second holder entered while the live holder was still inside " +
        "its critical section — the heartbeat failed to protect the lock")
  }

  test("racing breakers over a genuinely stale lock: one wins the rename-aside, all land") {
    val root = tmpDir("tag-brk")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    val lock = java.nio.file.Paths.get(root, "_refs", ".lock")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.writeString(lock, "crashed-holder-token")
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - LakehouseTable.RefLockStaleMs - 60000L))
    val handles = (0 until 4).map(_ => new LakehouseTable(spark, root))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = handles.zipWithIndex.map { case (h, i) =>
      new Thread(() => try h.setTag(s"brk-$i", 1L)
        catch { case e: Throwable => errs.add(e); () })
    }
    ts.foreach(_.start()); ts.foreach(_.join(30000))
    assert(errs.isEmpty, s"racing breakers must all land: ${errs.peek()}")
    assert((0 until 4).forall(i => t.tags.contains(s"brk-$i")))
    assert(!java.nio.file.Files.exists(lock))
    // no leftover break-in-progress files either
    val leftovers = graft.Fs.listAll(lock.getParent)
      .filter(_.getFileName.toString.startsWith(".lock-breaking"))
    assert(leftovers.isEmpty, s"leaked aside files: $leftovers")
  }

  test("max-ref-age: an aged tag drops at the next sweep and its snapshot expires with it") {
    val t = new LakehouseTable(spark, tmpDir("tag-age"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1)) // snap 1
    Thread.sleep(15)
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1)) // snap 2 (current)
    t.setTag("ephemeral", 1L, maxRefAgeMs = Some(40L))
    t.setTag("forever", 1L) // no age: lives until dropped
    // $refs surfaces the age and the computed expiry instant
    val wh = tmpDir("tag-age-wh") // path-less: use the programmatic face
    assert(wh.nonEmpty)
    assert(t.tagRefs("ephemeral").maxRefAgeMs === Some(40L))
    assert(t.tagRefs("forever").maxRefAgeMs === None)
    // young enough: the first sweep keeps both refs and the snapshot
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(t.tags.keySet === Set("ephemeral", "forever"))
    assert(t.listSnapshots().map(_.snapshotId).contains(1L))
    // past its age: the sweep drops the ref; 'forever' still pins
    Thread.sleep(60)
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(t.tags.keySet === Set("forever"),
      "an aged ref must drop at the sweep")
    assert(t.listSnapshots().map(_.snapshotId).contains(1L),
      "the un-aged tag still pins the snapshot")
    // drop the survivor: the next sweep takes the snapshot too
    t.dropTag("forever")
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(t.listSnapshots().map(_.snapshotId) === Seq(2L))
    // zero/negative ages refuse
    intercept[IllegalArgumentException](t.setTag("bad", 2L, Some(0L)))
  }

}
