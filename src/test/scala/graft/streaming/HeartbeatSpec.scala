package graft.streaming

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** T12: the heartbeat table holds exactly one row whose beat advances. */
class HeartbeatSpec extends SparkSpec {
  test("heartbeat upserts a single advancing liveness row") {
    val table = new LakehouseTable(spark, tmpDir("hb-table"))
    val q = Heartbeat.start(spark, table, interval = "1 second", tmpDir("hb-ckpt"))
    try {
      val deadline = System.currentTimeMillis() + 60000
      var beats = Set.empty[Long]
      while (System.currentTimeMillis() < deadline && beats.size < 2) {
        Thread.sleep(500)
        if (table.listSnapshots().nonEmpty) {
          val rows = table.read().collect()
          assert(rows.length === 1, "heartbeat table must stay single-row")
          beats += rows.head.getAs[Long]("beat_batch")
        }
      }
      assert(beats.size >= 2, s"heartbeat did not advance: $beats")
    } finally q.stop()
  }
}
