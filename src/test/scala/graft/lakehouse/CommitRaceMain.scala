package graft.lakehouse

import org.apache.spark.sql.SparkSession

/** Test scaffolding (test classpath only): the OTHER PROCESS of
  * [[CrossProcessCommitSpec]]. Boots its own SparkSession, drops a
  * ready-marker file, waits for the parent's go-marker, then fires
  * `n` appends into the shared table root as fast as they commit —
  * a real second JVM racing the suite's writer through nothing but
  * the directory. Rows are tagged with `writer` so the parent can
  * attribute them. Exits 0 on success; any uncaught throw exits
  * nonzero with the message on stdout.
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writer, nStr, markerDir) = args.take(4)
    val n = nStr.toInt
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-commit-race-child")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("race-child-wh").toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val t = new LakehouseTable(spark, root)
      val ready = java.nio.file.Paths.get(markerDir, "child-ready")
      val go = java.nio.file.Paths.get(markerDir, "go")
      java.nio.file.Files.writeString(ready, "up")
      val deadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(go)) {
        if (System.currentTimeMillis() > deadline) sys.error("go-marker never appeared")
        Thread.sleep(20)
      }
      (1 to n).foreach { i =>
        t.append(Seq((1000L + i, writer)).toDF("id", "v"))
      }
      spark.stop()
      println(s"child: $n appends committed")
      sys.exit(0)
    } catch {
      case e: Throwable =>
        println(s"child failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        sys.exit(1)
    }
  }
}
