package graft

import org.apache.spark.sql.SparkSession

/** Focused single-query timing harness for iterating on one operator
  * without paying for the full [[Bench]] suite: `runMain graft.QBench
  * q63_ann_ivf [q47_ngram_jaccard ...] [--reps N]`. Same session
  * config as Bench; each query is materialized with the same
  * noop-write and the cache is cleared between runs.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    // both `--reps=N` and `--reps N` (the Cli flag grammar)
    @scala.annotation.tailrec
    def parse(rest: List[String], reps: Int, prof: Boolean,
        names: List[String]): (Int, Boolean, List[String]) = rest match {
      case Nil => (reps, prof, names.reverse)
      case a :: tail if a.startsWith("--reps=") => parse(tail, a.stripPrefix("--reps=").toInt, prof, names)
      case "--reps" :: n :: tail => parse(tail, n.toInt, prof, names)
      case "--profile" :: tail => parse(tail, reps, prof = true, names)
      case a :: tail => parse(tail, reps, prof, a :: names)
    }
    val (reps, profile, names) = parse(args.toList, 2, prof = false, Nil)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --profile: count Spark jobs/stages/tasks per rep — the structural
    // signal behind a wall-clock number (a lifecycle gate that runs 120
    // tiny jobs is paying scheduler+codegen overhead 120×, whatever the
    // data volume says)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size.toLong)
          tasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
        }
      })
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to reps).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val profStr = if (profile)
          s" jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}" else ""
        println(f"[qbench] $name rep$i: $sec%.3f s ($sfDir)$profStr")
      }
    }
    spark.stop()
  }
}
