package graft

import org.apache.spark.sql.SparkSession

import graft.lakehouse.LakehouseTable

/** Lakehouse operations entry point (SURVEY.md §3.3; reference
  * `cdc lakehouse snapshots|query|rollback`, `cli.py:251-366`):
  *
  *   graft.LakehouseCli snapshots <tableDir>
  *   graft.LakehouseCli query     <tableDir> [snapshotId|current] [limit]
  *   graft.LakehouseCli rollback  <tableDir> <snapshotId>
  *
  * `query` defaults to a LIMIT of 20 rows like the reference CLI
  * (`cli.py:298`). Invalid snapshot ids fail with the valid-id listing
  * (same error contract as `time_travel.py:33-58`).
  */
object LakehouseCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, usage)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-lakehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = new LakehouseTable(spark, args(1))

    args(0) match {
      case "snapshots" =>
        println(f"${"ID"}%-6s ${"PARENT"}%-8s ${"OPERATION"}%-10s ${"FILES"}%-6s TIMESTAMP")
        table.listSnapshots().foreach { s =>
          println(f"${s.snapshotId}%-6d ${s.parentId.map(_.toString).getOrElse("-")}%-8s " +
            f"${s.operation}%-10s ${s.files.size}%-6d " +
            java.time.Instant.ofEpochMilli(s.timestampMs).toString)
        }
      case "query" =>
        val limit = if (args.length >= 4) args(3).toInt else 20
        val df = args.lift(2).filterNot(_ == "current") match {
          case Some(id) => table.scanAtSnapshot(id.toLong, Some(limit))
          case None     => table.read().limit(limit)
        }
        df.show(limit, truncate = false)
      case "rollback" =>
        require(args.length >= 3, usage)
        val snap = table.rollbackToSnapshot(args(2).toLong)
        println(s"rolled back: new snapshot ${snap.snapshotId} -> files of ${args(2)}")
      case other =>
        System.err.println(s"unknown command: $other\n$usage")
        sys.exit(2)
    }
    spark.stop()
  }

  private val usage =
    """usage: graft.LakehouseCli snapshots <tableDir>
      |       graft.LakehouseCli query <tableDir> [snapshotId|current] [limit]
      |       graft.LakehouseCli rollback <tableDir> <snapshotId>""".stripMargin
}
