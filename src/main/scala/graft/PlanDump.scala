package graft

import org.apache.spark.sql.SparkSession

/** Plan-artifact dumper for the optimization rounds: for each named
  * query, write the final DataFrame's `.explain("formatted")` text to
  * `<outDir>/<name>.txt` — the judge-checkable evidence behind plan
  * claims (Exchange counts, join strategies, PushedFilters). Same
  * session config as [[Bench]] so the captured plans are the plans the
  * bench runs.
  *
  * Usage: `PlanDump <outDir> <query> [query ...]` (env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
        println(s"[plandump] wrote ${outDir.resolve(s"$name.txt")}")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
