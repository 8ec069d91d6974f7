package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BRANCH refs — write-audit-publish (the Iceberg WAP shape a curation
  * pipeline wants before promoting a corpus version): fork a branch
  * from main, append candidate data to it (ordinary snapshots, global
  * version ids, invisible to main), audit the branch head with real
  * queries, then fast-forward publish main onto the audited state —
  * or abandon the branch and let retention take its snapshots.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  test("write/audit/publish: branch commits are invisible to main until the fast-forward") {
    val t = new LakehouseTable(spark, tmpDir("br-wap"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // main snap 1
    t.forkBranch("audit-1")
    assert(t.branches("audit-1").fork === 1L)
    // WRITE: two branch appends (global ids 2 and 3, branch-side)
    t.appendToBranch(Seq((10L, "x")).toDF("k", "v").coalesce(1), "audit-1")
    t.appendToBranch(Seq((11L, "y")).toDF("k", "v").coalesce(1), "audit-1")
    // main sees NOTHING of the branch — head, reads, time travel
    assert(t.currentSnapshot().get.snapshotId === 1L)
    assert(t.read().as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    assert(spark.read.format("graft-lakehouse").load(t.root).count() === 2L)
    // AUDIT: the branch head reads the full candidate state
    val audit = spark.read.format("graft-lakehouse")
      .option("snapshotBranch", "audit-1").load(t.root)
    assert(audit.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y")))
    assert(t.branchHead("audit-1").snapshotId === 3L)
    // PUBLISH: one main commit adopts the branch head's state (files
    // by reference — nothing rewrites), the ref drops
    val pub = t.publishBranch("audit-1")
    assert(pub.operation === "publish" && pub.parentId === Some(1L))
    assert(t.currentSnapshot().get.snapshotId === pub.snapshotId)
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y")))
    assert(t.branches.isEmpty, "publish drops the ref")
    intercept[IllegalArgumentException](t.branchHead("audit-1"))
  }

  test("fast-forward refuses when main advanced; abandon lets retention take the branch") {
    val t = new LakehouseTable(spark, tmpDir("br-ff"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    t.forkBranch("wap")
    t.appendToBranch(Seq((10L, "x")).toDF("k", "v").coalesce(1), "wap")
    Thread.sleep(15)
    // main moves past the fork: the fast-forward must refuse LOUDLY
    // (publishing would discard main's commit)
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))
    val e = intercept[IllegalArgumentException](t.publishBranch("wap"))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // the branch is still auditable; expiry keeps its head + fork
    // while the ref lives
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(spark.read.format("graft-lakehouse")
      .option("snapshotBranch", "wap").load(t.root).count() === 2L)
    // ABANDON: the ref drops; the next sweep takes the branch snapshots
    assert(t.dropBranch("wap") && !t.dropBranch("wap"))
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    assert(t.listSnapshots().forall(_.branch.isEmpty),
      "an abandoned branch's snapshots age out of retention")
    assert(t.read().as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("a main stream never delivers branch commits; TIMESTAMP AS OF skips them") {
    val t = new LakehouseTable(spark, tmpDir("br-stream"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1)) // main 1
    t.forkBranch("wap")
    t.appendToBranch(Seq((50L, "BR")).toDF("k", "v").coalesce(1), "wap") // id 2, branch
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1)) // main 3
    Thread.sleep(15)
    // the main timeline's AS OF resolution skips the branch commit
    assert(t.snapshotAsOf(System.currentTimeMillis()).snapshotId === 3L)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-lakehouse").load(t.root)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.select("k").collect().map(_.getLong(0)).toSet
        batches.synchronized { if (ks.nonEmpty) batches += ks }
        ()
      }
      .option("checkpointLocation", tmpDir("br-stream-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(batches.flatten.toSet === Set(1L, 2L),
      s"the main stream must never deliver unpublished branch rows: $batches")
    // rollback refuses branch targets
    val e = intercept[IllegalArgumentException](t.rollbackToSnapshot(2L))
    assert(e.getMessage.contains("branch"), e.getMessage)
  }

  test("SQL face: CALL fork_branch / publish_branch, VERSION AS OF '<branch>', $refs kinds") {
    val wh = tmpDir("br-wh")
    spark.conf.set("spark.sql.catalog.brcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.brcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS brcat.db")
    spark.sql("DROP TABLE IF EXISTS brcat.db.t")
    spark.sql("CREATE TABLE brcat.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO brcat.db.t VALUES (1, 'a')")
    assert(spark.sql(
      "CALL brcat.system.fork_branch(table => 'db.t', branch => 'wap')")
      .head.getLong(0) === 2L) // CREATE=1, INSERT=2
    val t = new LakehouseTable(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    t.appendToBranch(Seq((10L, "x")).toDF("k", "v").coalesce(1), "wap")
    // audit via SQL time travel by branch name
    assert(spark.sql("SELECT count(*) FROM brcat.db.t VERSION AS OF 'wap'")
      .head.getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM brcat.db.t").head.getLong(0) === 1L)
    val kinds = spark.sql("SELECT tag, kind FROM brcat.db.`t$refs`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kinds === Set(("wap", "branch")))
    assert(spark.sql("SELECT count(*) FROM brcat.db.`t$snapshots` WHERE branch = 'wap'")
      .head.getLong(0) === 1L)
    spark.sql("CALL brcat.system.publish_branch(table => 'db.t', branch => 'wap')")
    assert(spark.sql("SELECT count(*) FROM brcat.db.t").head.getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM brcat.db.`t$refs`").head.getLong(0) === 0L)
    // drop_branch on a fresh fork abandons it
    spark.sql("CALL brcat.system.fork_branch(table => 'db.t', branch => 'dead')")
    assert(spark.sql("CALL brcat.system.drop_branch(table => 'db.t', branch => 'dead')")
      .head.getBoolean(0))
    spark.sql("DROP TABLE brcat.db.t")
  }
  test("branches compose with MoR masks; a dropped branch name cannot be re-forked over unexpired snapshots") {
    val t = new LakehouseTable(spark, tmpDir("br-mor"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    t.applyChanges(Seq((2L, "b", "delete")).toDF("k", "v", "_change"),
      Seq("k"), mergeOnRead = true)
    t.forkBranch("wap")
    t.appendToBranch(Seq((10L, "x")).toDF("k", "v").coalesce(1), "wap")
    // the branch head carries the MAIN head's tombstones: the masked
    // row stays masked on the audit read
    assert(spark.read.format("graft-lakehouse")
      .option("snapshotBranch", "wap").load(t.root)
      .collect().map(_.getLong(0)).toSet === Set(1L, 10L))
    t.publishBranch("wap")
    assert(t.read().collect().map(_.getLong(0)).toSet === Set(1L, 10L))
    // re-forking a dropped name over its unexpired snapshots refuses:
    // branchHead would otherwise resolve the DEAD incarnation
    t.forkBranch("ghost")
    t.appendToBranch(Seq((99L, "dead")).toDF("k", "v").coalesce(1), "ghost")
    t.dropBranch("ghost")
    val e = intercept[IllegalArgumentException](t.forkBranch("ghost"))
    assert(e.getMessage.contains("unexpired"), e.getMessage)
    // expiry takes the dead snapshots, then the name frees up
    Thread.sleep(15)
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 3600000L)
    t.forkBranch("ghost")
    assert(t.branchHead("ghost").snapshotId === t.currentSnapshot().get.snapshotId,
      "the re-forked branch heads at its fork, never the dead lineage")
  }

  test("df.write .option(branch): the batch write face appends to a branch; non-append shapes refuse") {
    val t = new LakehouseTable(spark, tmpDir("br-write"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    t.forkBranch("wap")
    Seq((10L, "x")).toDF("k", "v").coalesce(1)
      .write.format("graft-lakehouse").mode("append")
      .option("branch", "wap").save(t.root)
    assert(t.read().collect().map(_.getLong(0)).toSet === Set(1L),
      "a branch write is invisible to main")
    assert(spark.read.format("graft-lakehouse").option("snapshotBranch", "wap")
      .load(t.root).collect().map(_.getLong(0)).toSet === Set(1L, 10L))
    // keyed / overwrite shapes refuse loudly on a branch
    val e1 = intercept[Exception](
      Seq((11L, "y")).toDF("k", "v").write.format("graft-lakehouse")
        .mode("append").option("branch", "wap").option("keys", "k").save(t.root))
    assert(e1.getMessage.contains("append-only"), e1.getMessage)
    val e2 = intercept[Exception](
      Seq((11L, "y")).toDF("k", "v").write.format("graft-lakehouse")
        .mode("overwrite").option("branch", "wap").save(t.root))
    assert(e2.getMessage.contains("APPEND-only"), e2.getMessage)
    t.publishBranch("wap")
    assert(t.read().collect().map(_.getLong(0)).toSet === Set(1L, 10L))
  }

  test("racing branch writers rebase like main appends: both commits land, none lost") {
    val root = tmpDir("br-race")
    val a = new LakehouseTable(spark, root)
    a.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    a.forkBranch("wap")
    val b = new LakehouseTable(spark, root) // a second handle = remote writer
    // inject B's branch append at exactly A's publish window: A loses
    // the put-if-absent link and must rebase onto B's branch head
    a.onBeforePublish = () => {
      a.onBeforePublish = () => ()
      b.appendToBranch(Seq((20L, "B")).toDF("k", "v").coalesce(1), "wap")
    }
    try a.appendToBranch(Seq((10L, "A")).toDF("k", "v").coalesce(1), "wap")
    finally a.onBeforePublish = () => ()
    assert(a.branchHead("wap").parentId.isDefined)
    assert(spark.read.format("graft-lakehouse").option("snapshotBranch", "wap")
      .load(root).collect().map(_.getLong(0)).toSet === Set(1L, 10L, 20L),
      "both racing branch appends must land")
    // the lineage is a clean chain: fork <- B <- A (or fork <- A <- B)
    val ids = a.listSnapshots().filter(_.branch.contains("wap")).map(_.snapshotId)
    assert(ids.size === 2 && ids.distinct.size === 2)
    a.publishBranch("wap")
    assert(a.read().collect().map(_.getLong(0)).toSet === Set(1L, 10L, 20L))
  }

}
