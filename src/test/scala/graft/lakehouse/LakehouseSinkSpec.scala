package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `writeStream.format("graft-lakehouse")` — the exactly-once
  * streaming sink: ledger-guarded batch dispatch (CDC apply / keyed
  * upsert / append), replay absorption, and the one-line
  * changefeed→lakehouse replication pipeline with restart-resume.
  */
class LakehouseSinkSpec extends SparkSpec {
  import spark.implicits._

  test("one-line replication: changefeed → graft-lakehouse sink keeps the downstream equal to the source across restarts") {
    val a = new LakehouseTable(spark, tmpDir("sink-a"))
    val bRoot = tmpDir("sink-b")
    val ckpt = tmpDir("sink-ck")
    a.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-changefeed").option("path", a.root).load()
        .writeStream.format("graft-lakehouse")
        .option("path", bRoot).option("keys", "id")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    drain()
    val b = new LakehouseTable(spark, bRoot)
    def same(hint: String): Unit =
      assert(b.read().exceptAll(a.read()).isEmpty &&
        a.read().exceptAll(b.read()).isEmpty, hint)
    same("bootstrap must replicate the initial snapshot")
    assert(!b.read().columns.contains("_change"), "the CDC tag must not land")

    // updates + inserts while the stream is down; restart resumes from
    // the checkpoint and applies only the diff
    a.upsert(Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    drain()
    same("restart must apply exactly the cursor-range diff")
    // ledger: one committed version per engine batch, no duplicates
    val versions = b.listSnapshots().flatMap(_.txn).map(_.version)
    assert(versions.distinct.size === versions.size)
  }

  test("widen-only schema evolution flows THROUGH replication on restart") {
    // the source table gains a column while the stream is down; the
    // restarted stream's feed schema (fixed at stream start) carries
    // it, and the sink's apply lands it via the table's widen-only
    // evolution — pre-evolution downstream rows read back as nulls
    val a = new LakehouseTable(spark, tmpDir("sink-ev-a"))
    val bRoot = tmpDir("sink-ev-b")
    val ckpt = tmpDir("sink-ev-ck")
    a.append(Seq((1L, "a")).toDF("id", "v"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-changefeed").option("path", a.root).load()
        .writeStream.format("graft-lakehouse")
        .option("path", bRoot).option("keys", "id")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    drain()
    a.append(Seq((2L, "b", 0.9)).toDF("id", "v", "score")) // widening append
    drain()
    val b = new LakehouseTable(spark, bRoot)
    assert(b.read().columns.toSet === Set("id", "v", "score"))
    val rows = b.read().collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(rows === Set((1L, "a", None), (2L, "b", Some(0.9))),
      "pre-evolution rows must null-fill the new column; new rows carry it")
  }

  test("addBatch replay is absorbed by the ledger in all three dispatch modes") {
    import org.apache.spark.sql.SQLContext
    val ctx: SQLContext = spark.sqlContext

    // CDC-apply mode (keys + _change)
    val cdcRoot = tmpDir("sink-cdc")
    val cdc = new LakehouseSink(ctx, cdcRoot, Seq("id"), "app-cdc", Nil)
    val ch = Seq((1L, "a", "insert")).toDF("id", "v", "_change")
    cdc.addBatch(0, ch); cdc.addBatch(0, ch) // crash-replay twin
    assert(new LakehouseTable(spark, cdcRoot).read().count() === 1,
      "replayed CDC batch must not duplicate")

    // keyed-upsert mode (keys, no _change): latest-by-key materialization
    val upRoot = tmpDir("sink-up")
    val up = new LakehouseSink(ctx, upRoot, Seq("id"), "app-up", Nil)
    up.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    up.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    up.addBatch(1, Seq((1L, "A2")).toDF("id", "v"))
    assert(new LakehouseTable(spark, upRoot).read()
      .as[(Long, String)].collect().toSet === Set((1L, "A2")))

    // append mode (no keys): fact stream
    val apRoot = tmpDir("sink-ap")
    val ap = new LakehouseSink(ctx, apRoot, Nil, "app-ap", Nil)
    ap.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    ap.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    ap.addBatch(1, Seq((1L, "a")).toDF("id", "v")) // same DATA, new batch: kept
    assert(new LakehouseTable(spark, apRoot).read().count() === 2,
      "replays dedupe by batchId, identical payloads in new batches do not")
  }

  test("a user column that merely NAMES itself _ddl is data, not a schema record") {
    // DDL mode requires BOTH channel markers (_ddl AND _change): an
    // ordinary stream with its own `_ddl` column must land it as data
    // instead of being misrouted into applySchemaChange (which would
    // kill the stream with 'unparseable schema change')
    val ctx = spark.sqlContext
    val root = tmpDir("sink-ddlname")
    val s = new LakehouseSink(ctx, root, Nil, "app-ddlname", Nil)
    s.addBatch(0, Seq((1L, "whatever")).toDF("id", "_ddl"))
    val got = new LakehouseTable(spark, root).read()
    assert(got.columns.toSeq === Seq("id", "_ddl"), "the column must survive as data")
    assert(got.count() === 1L)
  }
}
