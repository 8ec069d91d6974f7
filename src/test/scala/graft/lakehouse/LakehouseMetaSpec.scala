package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Metadata tables (`t$snapshots` / `$files` / `$txns`), CALL
  * maintenance procedures, and ALTER TABLE ADD COLUMNS — the
  * operational surface from pure SQL. All metadata answers are
  * driver-side manifest reads: zero Spark jobs, zero data files.
  */
class LakehouseMetaSpec extends SparkSpec {

  private lazy val warehouse = tmpDir("graft-meta-wh")

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.metacat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.metacat.warehouse", warehouse)
  }

  private def root(name: String): String =
    java.nio.file.Paths.get(warehouse, "db", name).toString

  private def fresh(name: String, ddl: String): LakehouseTable = {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS metacat.db")
    spark.sql(s"DROP TABLE IF EXISTS metacat.db.$name")
    spark.sql(s"CREATE TABLE metacat.db.$name ($ddl)")
    new LakehouseTable(spark, root(name))
  }

  test("$snapshots and $history expose the commit lineage with manifest row counts") {
    fresh("s1", "id BIGINT, v STRING")
    spark.sql("INSERT INTO metacat.db.s1 VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO metacat.db.s1 VALUES (3,'c')")
    val snaps = spark.sql(
      "SELECT snapshot_id, parent_id, operation, file_count, row_count " +
        "FROM metacat.db.`s1$snapshots` ORDER BY snapshot_id").collect()
    assert(snaps.map(_.getString(2)).toSeq === Seq("create", "append", "append"))
    assert(snaps.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq === Seq(0L, 2L, 3L),
      "row_count must come from manifest stats")
    assert(snaps(0).isNullAt(1) && snaps(1).getLong(1) === 1L)
    // $history is an alias; committed_at is a real timestamp
    val hist = spark.sql(
      "SELECT committed_at FROM metacat.db.`s1$history` ORDER BY snapshot_id").collect()
    assert(hist.length === 3 && hist.forall(!_.isNullAt(0)))
  }

  test("$files lists the current snapshot's files with sizes, stats rows, partition dirs") {
    fresh("f1", "id BIGINT, bucket STRING")
    spark.sql("DROP TABLE IF EXISTS metacat.db.f1")
    spark.sql("CREATE TABLE metacat.db.f1 (id BIGINT, bucket STRING) PARTITIONED BY (bucket)")
    spark.sql("INSERT INTO metacat.db.f1 SELECT id, CASE WHEN id < 50 THEN 'lo' ELSE 'hi' END FROM range(0, 100)")
    val t = new LakehouseTable(spark, root("f1"))
    val files = spark.sql(
      "SELECT file, size_bytes, row_count, partition FROM metacat.db.`f1$files` WHERE type = 'data'").collect()
    assert(files.length === t.currentSnapshot().get.files.size)
    assert(files.forall(_.getLong(1) > 0L), "size_bytes from the filesystem")
    assert(files.map(_.getLong(2)).sum === 100L, "stats rows must sum to the row count")
    assert(files.forall(r => r.getString(3).startsWith("bucket=")),
      "partition column must surface the hive dir")
  }

  test("$partitions: per-partition file/row/byte counts; tombstone volume in $snapshots") {
    import spark.implicits._
    fresh("p1", "id BIGINT, cell STRING")
    spark.sql("DROP TABLE IF EXISTS metacat.db.p1")
    spark.sql("CREATE TABLE metacat.db.p1 (id BIGINT, cell STRING) PARTITIONED BY (cell)")
    spark.sql("INSERT INTO metacat.db.p1 SELECT id, CASE WHEN id < 60 THEN 'lo' ELSE 'hi' END " +
      "FROM range(0, 100)")
    val parts = spark.sql("SELECT partition, file_count, row_count, size_bytes, " +
      "tombstone_files FROM metacat.db.`p1$partitions` ORDER BY partition").collect()
    assert(parts.map(r => (r.getString(0), r.getLong(2), r.getInt(4))).toSeq
      === Seq(("cell=hi", 40L, 0), ("cell=lo", 60L, 0)))
    assert(parts.forall(r => r.getInt(1) > 0 && r.getLong(3) > 0L))
    // round 16: a MoR apply whose batch CARRIES the partition column
    // lands its tombstone under the hive layout — the key files
    // surface ATTRIBUTED to their partition row, and $snapshots
    // carries the volume
    val t = new LakehouseTable(spark, root("p1"))
    t.applyChanges(Seq((5L, "lo", "delete"), (7L, "lo", "delete"))
      .toDF("id", "cell", "_change"), Seq("id"), mergeOnRead = true)
    val loRow = spark.sql("SELECT tombstone_files FROM " +
      "metacat.db.`p1$partitions` WHERE partition = 'cell=lo'").head
    assert(loRow.getInt(0) > 0,
      "a partition-carrying tombstone must surface on its partition row")
    val vol = spark.sql("SELECT tombstone_files, tombstone_keys, tombstone_bytes " +
      "FROM metacat.db.`p1$snapshots` ORDER BY snapshot_id DESC LIMIT 1").head
    assert(vol.getInt(0) > 0 && vol.getLong(1) === 2L && vol.getLong(2) > 0L)
    // a KEYS-ONLY batch (no partition column) still lands its tombstone
    // FLAT: a tombstone-only null-partition row surfaces
    t.applyChanges(Seq((8L, "delete")).toDF("id", "_change"),
      Seq("id"), mergeOnRead = true)
    val nullRow = spark.sql("SELECT file_count, tombstone_files FROM " +
      "metacat.db.`p1$partitions` WHERE partition IS NULL").collect()
    assert(nullRow.length === 1 && nullRow.head.getInt(0) === 0
      && nullRow.head.getInt(1) > 0, "tombstone-only partitions must surface")
    // an unpartitioned table reads as one NULL-partition row
    fresh("p2", "id BIGINT")
    spark.sql("INSERT INTO metacat.db.p2 SELECT id FROM range(0, 10)")
    val flat = spark.sql("SELECT partition, row_count FROM metacat.db.`p2$partitions`").collect()
    assert(flat.length === 1 && flat.head.isNullAt(0) && flat.head.getLong(1) === 10L)
  }

  test("$txns surfaces the exactly-once ledger (marks + floor)") {
    fresh("x1", "id BIGINT")
    val t = new LakehouseTable(spark, root("x1"))
    import spark.implicits._
    t.appendIdempotent(Seq(1L).toDF("id"), "appA", 7L)
    t.appendIdempotent(Seq(2L).toDF("id"), "appB", 3L)
    t.appendIdempotent(Seq(3L).toDF("id"), "appA", 9L)
    val got = spark.sql(
      "SELECT app_id, last_version FROM metacat.db.`x1$txns` ORDER BY app_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("appA", 9L), ("appB", 3L)))
  }

  test("CALL compact / rollback / build_bloom_index / zorder run the maintenance ops from SQL") {
    fresh("p1", "id BIGINT, v STRING")
    spark.sql("INSERT INTO metacat.db.p1 SELECT id, concat('v', id) FROM range(0, 40)")
    spark.sql("INSERT INTO metacat.db.p1 SELECT id, concat('v', id) FROM range(40, 80)")
    spark.sql("INSERT INTO metacat.db.p1 SELECT id, concat('v', id) FROM range(80, 120)")
    val t = new LakehouseTable(spark, root("p1"))
    val filesBefore = t.currentSnapshot().get.files.size
    assert(filesBefore > 1)
    val cid = spark.sql(
      "CALL metacat.system.compact(table => 'db.p1', file_threshold => 2, " +
        "max_rows => 1000000, target_files => 1)").collect()
    assert(cid.length === 1 && !cid(0).isNullAt(0), "compact must return the new snapshot id")
    assert(t.currentSnapshot().get.files.size < filesBefore)
    assert(spark.sql("SELECT count(*) FROM metacat.db.p1").head.getLong(0) === 120L)
    // rollback to the pre-compact head (compact's parent)
    val parent = t.currentSnapshot().get.parentId.get
    val rid = spark.sql(
      s"CALL metacat.system.rollback(table => 'db.p1', snapshot_id => $parent)").collect()
    assert(rid(0).getLong(0) === t.currentSnapshot().get.snapshotId)
    assert(t.currentSnapshot().get.files.size === filesBefore,
      "rollback must re-point at the pre-compact file set")
    // bloom index over id: one sidecar per data file
    val nIdx = spark.sql(
      "CALL metacat.system.build_bloom_index(table => 'db.p1', column => 'id')")
      .head.getInt(0)
    assert(nIdx === t.currentSnapshot().get.files.size)
    // zorder rewrite preserves content
    val zid = spark.sql(
      "CALL metacat.system.zorder(table => 'db.p1', columns => 'id', " +
        "target_files => 2, buckets => 16)").collect()
    assert(!zid(0).isNullAt(0))
    assert(spark.sql("SELECT sum(id) FROM metacat.db.p1").head.getLong(0) === (0L until 120L).sum)
  }

  test("CALL expire_snapshots trims history; $snapshots reflects it") {
    fresh("p2", "id BIGINT")
    spark.sql("INSERT INTO metacat.db.p2 VALUES (1)")
    spark.sql("INSERT INTO metacat.db.p2 VALUES (2)")
    val before = spark.sql("SELECT count(*) FROM metacat.db.`p2$snapshots`").head.getLong(0)
    assert(before === 3L)
    val expired = spark.sql(
      "CALL metacat.system.expire_snapshots(table => 'db.p2', " +
        "older_than => TIMESTAMP '2030-01-01 00:00:00')").head.getInt(0)
    assert(expired === 2, "everything but the current snapshot expires")
    assert(spark.sql("SELECT count(*) FROM metacat.db.`p2$snapshots`").head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM metacat.db.p2").head.getLong(0) === 2L)
  }

  test("ALTER TABLE ADD COLUMNS: widen-only DDL; old rows read NULL; old snapshots keep the old schema") {
    fresh("a1", "id BIGINT, v STRING")
    spark.sql("INSERT INTO metacat.db.a1 VALUES (1,'a'), (2,'b')")
    val t = new LakehouseTable(spark, root("a1"))
    val preAlter = t.currentSnapshot().get.snapshotId
    spark.sql("ALTER TABLE metacat.db.a1 ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(spark.table("metacat.db.a1").columns.toSeq === Seq("id", "v", "score", "tag"))
    assert(t.currentSnapshot().get.operation === "alter")
    // existing rows surface NULL for the added columns
    val rows = spark.sql("SELECT id, score, tag FROM metacat.db.a1 ORDER BY id").collect()
    assert(rows.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    // new writes can fill them; old files still read
    spark.sql("INSERT INTO metacat.db.a1 VALUES (3, 'c', 0.5, 'x')")
    val got = spark.sql(
      "SELECT id, coalesce(tag, '-') FROM metacat.db.a1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "-"), (2L, "-"), (3L, "x")))
    // time travel to before the ALTER sees the narrow schema
    assert(spark.sql(s"SELECT * FROM metacat.db.a1 VERSION AS OF $preAlter")
      .columns.toSeq === Seq("id", "v"))
    // DROP COLUMN works as of round 11, ALTER COLUMN COMMENT as of
    // round 12 (SchemaEvolutionSpec / LakehouseCatalogSpec own those
    // contracts); unsupported shapes still refuse loudly
    val e = intercept[Exception](
      spark.sql("ALTER TABLE metacat.db.a1 ALTER COLUMN v AFTER tag"))
    assert(e.getMessage.contains("ADD COLUMNS"), e.getMessage)
  }

  test("$columns exposes the schema, rename lineage, and declared layout roles") {
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS metacat.db.c1")
    spark.sql("CREATE TABLE metacat.db.c1 (k BIGINT, v STRING, cell STRING) " +
      "PARTITIONED BY (cell)")
    spark.sql("INSERT INTO metacat.db.c1 VALUES (1, 'a', 'x')")
    spark.sql("ALTER TABLE metacat.db.c1 RENAME COLUMN v TO label")
    val got = spark.sql(
      "SELECT column, type, former_names, layout FROM metacat.db.`c1$columns` ORDER BY column")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    assert(got === Seq(
      ("cell", "string", None, Some("identity")),
      ("k", "bigint", None, None),
      ("label", "string", Some("v"), None)))
    // bucket layout surfaces its transform
    spark.sql("DROP TABLE IF EXISTS metacat.db.c2")
    spark.sql("CREATE TABLE metacat.db.c2 (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    assert(spark.sql("SELECT layout FROM metacat.db.`c2$columns` WHERE column = 'k'")
      .head.getString(0) === "bucket(4)")
    spark.sql("DROP TABLE metacat.db.c1")
    spark.sql("DROP TABLE metacat.db.c2")
  }

  test("$columns surfaces the DROPPED registry (name, pre-drop type, drop snapshot) and field ids") {
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS metacat.db.c3")
    spark.sql("CREATE TABLE metacat.db.c3 (k BIGINT, v STRING, extra INT)")
    spark.sql("INSERT INTO metacat.db.c3 VALUES (1, 'a', 7)")
    spark.sql("ALTER TABLE metacat.db.c3 DROP COLUMN extra")
    val t = new LakehouseTable(spark, root("c3"))
    val dropSnap = t.currentSnapshot().get.snapshotId
    val rows = spark.sql(
      "SELECT column, type, status, dropped_at, field_id FROM metacat.db.`c3$columns` " +
        "ORDER BY status, column").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSeq
    // dropped row: pre-drop type recovered from the dropping snapshot's
    // parent manifest, field id 3 retired with it
    assert(rows === Seq(
      ("extra", "int", "dropped", dropSnap, 3),
      ("k", "bigint", "live", -1L, 1),
      ("v", "string", "live", -1L, 2)))
    // re-add works IMMEDIATELY (identity resolution, round 13): the
    // name leaves the dropped registry, the reborn column gets a FRESH
    // id (never 3), and pre-drop files serve it as NULL
    spark.sql("ALTER TABLE metacat.db.c3 ADD COLUMNS (extra INT)")
    assert(spark.sql("SELECT count(*) FROM metacat.db.`c3$columns` WHERE status = 'dropped'")
      .head.getLong(0) === 0L, "a re-added name must leave the dropped registry")
    assert(spark.sql("SELECT field_id FROM metacat.db.`c3$columns` WHERE column = 'extra'")
      .head.getInt(0) === 4, "a re-added name must get a fresh field id, not the retired one")
    assert(spark.sql("SELECT extra FROM metacat.db.c3").head.isNullAt(0),
      "pre-drop files serve the reborn column as NULL, never the retired bytes")
    spark.sql("DROP TABLE metacat.db.c3")
  }

  test("metadata tables and procedures refuse unknown names loudly") {
    ensureCatalog()
    intercept[Exception](spark.sql("SELECT * FROM metacat.db.`missing$snapshots`").collect())
    val e = intercept[Exception](spark.sql("CALL metacat.system.vacuum_everything(table => 'db.p1')"))
    assert(e.getMessage.contains("vacuum_everything"), e.getMessage)
  }
}
