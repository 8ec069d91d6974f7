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
    def parse(rest: List[String], reps: Int, names: List[String]): (Int, List[String]) = rest match {
      case Nil => (reps, names.reverse)
      case a :: tail if a.startsWith("--reps=") => parse(tail, a.stripPrefix("--reps=").toInt, names)
      case "--reps" :: n :: tail => parse(tail, n.toInt, names)
      case a :: tail => parse(tail, reps, a :: names)
    }
    val (reps, names) = parse(args.toList, 2, Nil)
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
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[qbench] $name rep$i: $sec%.3f s ($sfDir)")
      }
    }
    spark.stop()
  }
}
