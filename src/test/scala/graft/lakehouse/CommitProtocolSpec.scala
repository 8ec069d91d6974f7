package graft.lakehouse

import graft.SparkSpec

/** Cross-process commit protocol (the Delta OCC shape over a
  * filesystem): manifests publish via atomic put-if-absent, appends
  * rebase past a lost race, txn-marked replicas absorb, rewrites
  * surface [[ConcurrentCommitException]]. Two [[LakehouseTable]]
  * handles over one root stand in for two processes (they share
  * nothing but the directory — separate locks, separate caches), and
  * the `onBeforePublish` seam injects the racing commit at exactly the
  * window between head read and publish.
  */
class CommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def raceOnce(t: LakehouseTable)(body: => Unit): Unit = {
    t.onBeforePublish = () => {
      t.onBeforePublish = () => () // fire exactly once (rebase retries pass through)
      body
    }
  }

  test("append losing the publish race rebases: both writers' rows land, ids stay distinct") {
    val root = tmpDir("occ-append")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "base")).toDF("id", "v"))

    // b sneaks its commit in AFTER a has claimed its version but BEFORE
    // a publishes — a must rebase onto b's head, not clobber or fail
    raceOnce(a) { b.append(Seq((3L, "racer")).toDF("id", "v")) }
    val committed = a.append(Seq((2L, "loser-rebased")).toDF("id", "v"))

    val snaps = a.listSnapshots()
    assert(snaps.map(_.snapshotId) === Seq(1L, 2L, 3L),
      "exactly one winner per version; the rebase took the next id")
    assert(committed.snapshotId === 3L)
    assert(committed.parentId === Some(2L), "rebased commit parents the racer's head")
    assert(a.read().as[(Long, String)].collect().toSet ===
      Set((1L, "base"), (3L, "racer"), (2L, "loser-rebased")),
      "no writer's rows were lost")
  }

  test("racing replicas of one txn-marked batch: exactly one applies") {
    val root = tmpDir("occ-replica")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "base")).toDF("id", "v"))

    // replica b lands the SAME (appId, batch) in a's race window: a's
    // rebase must re-check the mark against the new head and absorb
    val batch = Seq((2L, "batch7")).toDF("id", "v")
    raceOnce(a) { assert(b.appendIdempotent(batch, "app-x", 7L).isDefined) }
    assert(a.appendIdempotent(batch, "app-x", 7L).isEmpty,
      "the losing replica must be absorbed, not double-applied")
    assert(a.read().filter($"v" === "batch7").count() === 1)
    assert(a.lastTxnVersion("app-x") === Some(7L))
  }

  test("rewrite-shaped commit losing the race surfaces ConcurrentCommitException; retry succeeds") {
    val root = tmpDir("occ-rewrite")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "old"), (2L, "keep")).toDF("id", "v"))

    raceOnce(a) { b.append(Seq((9L, "racer")).toDF("id", "v")) }
    val ex = intercept[ConcurrentCommitException] {
      a.upsert(Seq((1L, "new")).toDF("id", "v"), keys = Seq("id"))
    }
    assert(ex.getMessage.contains("re-run"))
    // the racer's commit is intact; a's failed upsert left no manifest
    assert(a.read().as[(Long, String)].collect().toSet ===
      Set((1L, "old"), (2L, "keep"), (9L, "racer")))
    // the standard client response: re-run against the new head
    a.upsert(Seq((1L, "new")).toDF("id", "v"), keys = Seq("id"))
    assert(a.read().as[(Long, String)].collect().toSet ===
      Set((1L, "new"), (2L, "keep"), (9L, "racer")))
  }

  test("SQL DML auto-retries past a lost race: the statement re-plans against the new head") {
    val root = tmpDir("occ-dml")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "x"), (2L, "x")).toDF("id", "v"))

    // b's racer lands between a's head read and publish — the SQL
    // statement (a SQL user cannot catch mid-statement) must RE-RUN
    // with fresh candidates instead of surfacing the exception the
    // programmatic faces keep (upsert's contract is pinned above)
    raceOnce(a) { b.append(Seq((3L, "x")).toDF("id", "v")) }
    var computeRuns = 0
    val snap = a.sqlMutate("update",
      candidatesOf = _.files,
      compute = { (_, _, scan) =>
        computeRuns += 1
        (Some(scan.withColumn("v", org.apache.spark.sql.functions.lit("hit"))), None)
      })
    assert(snap.isDefined)
    assert(computeRuns === 2, "the losing attempt must re-run compute against the new head")
    assert(a.read().as[(Long, String)].collect().toSet ===
      Set((1L, "hit"), (2L, "hit"), (3L, "hit")),
      "the retry re-planned candidates, so the racer's row is covered too " +
        "(statement-level serializability)")
  }

  test("append racing a NEWER MoR tombstone conflicts instead of committing maskable rows") {
    val root = tmpDir("occ-tomb")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "base")).toDF("id", "v"))

    // b lands TWO commits in a's window: an append (takes a's claimed
    // id) then a MoR apply whose tombstone is NEWER than a's claimed
    // id — path-derived origins would mask a's rows as if they predated
    // the apply, so the rebase must refuse
    raceOnce(a) {
      b.append(Seq((5L, "racer")).toDF("id", "v"))
      b.applyChanges(
        Seq((1L, "upd", "insert")).toDF("id", "v", "_change"),
        keys = Seq("id"), mergeOnRead = true)
    }
    intercept[ConcurrentCommitException] {
      a.append(Seq((1L, "would-be-masked")).toDF("id", "v"))
    }
    // retried against the new head, the append commits and stays visible
    a.append(Seq((1L, "retried")).toDF("id", "v"))
    assert(a.read().filter($"v" === "retried").count() === 1)
  }

  test("manifest publication is atomic: temps invisible to listings, orphans age out with retention") {
    val root = tmpDir("occ-atomic")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a")).toDF("id", "v"))

    // a crashed writer's leftover temp: listings ignore it...
    val snapsDir = java.nio.file.Paths.get(root, "_snapshots")
    val orphan = snapsDir.resolve(".commit-crashed.tmp")
    java.nio.file.Files.writeString(orphan, "{half a manifest")
    assert(t.listSnapshots().size === 1)
    assert(t.read().count() === 1)
    // ...and retention GCs it past the cutoff
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(!java.nio.file.Files.exists(orphan))
  }

  test("vacuum spares another process's in-flight (unreferenced, young) data files") {
    val root = tmpDir("occ-vacuum")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))

    // stand-in for a concurrent writer mid-commit: data written, no
    // manifest yet. A cutoff in the past expires nothing and must not
    // vacuum the young file either.
    val inflight = java.nio.file.Paths.get(root, "data", "s9-wraced", "part-inflight.parquet")
    java.nio.file.Files.createDirectories(inflight.getParent)
    java.nio.file.Files.writeString(inflight, "not yet committed")
    t.expireSnapshotsOlderThan(0L)
    assert(java.nio.file.Files.exists(inflight),
      "a young unreferenced file may be an in-flight write — grace applies")
    // past the retention cutoff it is an orphan and goes
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(!java.nio.file.Files.exists(inflight))
  }

  test("racing claimants of one version cannot clobber each other's data files") {
    val root = tmpDir("occ-dirs")
    val a = new LakehouseTable(spark, root)
    val b = new LakehouseTable(spark, root)
    a.append(Seq((1L, "base")).toDF("id", "v"))
    // both writers claim version 2; per-write nonce dirs keep their
    // uncommitted files apart, so the loser's rebase commits files that
    // still exist
    raceOnce(a) { b.append(Seq((2L, "winner")).toDF("id", "v")) }
    a.append(Seq((3L, "loser")).toDF("id", "v"))
    val head = a.listSnapshots().last
    assert(head.files.size === 3)
    head.files.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, f)), s"missing $f")
    }
    assert(a.read().count() === 3)
  }
}
