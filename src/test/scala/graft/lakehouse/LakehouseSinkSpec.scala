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

  /** Drain one AvailableNow stream of `df` (written as a json file
    * source) into a SNAPSHOT-LESS lakehouse root — the DSv2 bootstrap
    * path (round 16: no V1 sink exists to fall back to).
    */
  private def drainTo(df: org.apache.spark.sql.DataFrame, root: String,
      ckpt: String, opts: Map[String, String]): Unit = {
    // the source dir rides the checkpoint: a restart against the same
    // checkpoint must re-read the same path (file-source contract)
    val src = ckpt + "-srcdir"
    df.coalesce(1).write.mode("overwrite").json(src)
    val q = opts.foldLeft(
      spark.readStream.schema(df.schema).json(src)
        .writeStream.format("graft-lakehouse")
        .option("path", root).option("checkpointLocation", ckpt)) {
      case (w, (k, v)) => w.option(k, v)
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain")
  }

  test("snapshot-less roots bootstrap THROUGH the DSv2 face in all three dispatch modes") {
    // round 16: the V1 sink is deleted — batch 1 auto-creates via the
    // DSv2 write's query-schema seed, and every dispatch mode lands
    // with the V1 contract's semantics from the very first epoch.
    val before = LakehouseWriteStats.writersCreated.get()

    // CDC-apply mode (keys + _change): the tag column must not land
    val cdcRoot = tmpDir("sink-cdc")
    drainTo(Seq((1L, "a", "insert"), (1L, "A2", "insert"), (2L, "gone", "delete"))
      .toDF("id", "v", "_change"), cdcRoot, tmpDir("sink-cdc-ck"),
      Map("keys" -> "id", "txnAppId" -> "app-cdc"))
    val cdcT = new LakehouseTable(spark, cdcRoot)
    assert(!cdcT.read().columns.contains("_change"), "the CDC tag must not land")
    assert(cdcT.read().select("id").as[Long].collect().toSet === Set(1L))
    assert(cdcT.lastTxnVersion("app-cdc") === Some(0L),
      "the bootstrap epoch must land under its txn mark")

    // keyed-upsert mode (keys, no _change): latest-by-key across epochs
    val upRoot = tmpDir("sink-up")
    val upCk = tmpDir("sink-up-ck")
    drainTo(Seq((1L, "a")).toDF("id", "v"), upRoot, upCk,
      Map("keys" -> "id", "txnAppId" -> "app-up"))
    drainTo(Seq((1L, "A2")).toDF("id", "v"), upRoot, upCk,
      Map("keys" -> "id", "txnAppId" -> "app-up"))
    assert(new LakehouseTable(spark, upRoot).read()
      .as[(Long, String)].collect().toSet === Set((1L, "A2")))

    // append mode (no keys): fact stream, partitionBy honored at bootstrap
    val apRoot = tmpDir("sink-ap")
    drainTo(Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "cell"),
      apRoot, tmpDir("sink-ap-ck"),
      Map("txnAppId" -> "app-ap", "partitionBy" -> "cell"))
    val apT = new LakehouseTable(spark, apRoot)
    assert(apT.read().count() === 2)
    assert(apT.currentSnapshot().get.files.forall(_.contains("cell=")),
      "bootstrap appends must honor the partitionBy layout")

    assert(LakehouseWriteStats.writersCreated.get() > before,
      "every bootstrap epoch must take the DSv2 executor-writer path")
  }

  test("a user column that merely NAMES itself _ddl is data, not a schema record — bootstrap included") {
    // DDL mode requires BOTH channel markers (_ddl AND _change): an
    // ordinary stream with its own `_ddl` column must land it as data
    // (misrouting it into applySchemaChange would kill the stream),
    // and the DSv2 bootstrap seed must DECLARE it as data too.
    val root = tmpDir("sink-ddlname")
    drainTo(Seq((1L, "whatever")).toDF("id", "_ddl"), root,
      tmpDir("sink-ddlname-ck"), Map("txnAppId" -> "app-ddlname"))
    val got = new LakehouseTable(spark, root).read()
    assert(got.columns.toSeq === Seq("id", "_ddl"), "the column must survive as data")
    assert(got.count() === 1L)
  }
}
