package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the DSv2→V1 Row-bridge overhead the lakehouse read face
  * pays (`LakehouseV1Scan.buildScan`'s `df.rdd` deserializes
  * InternalRow → Row → InternalRow) against the same data read
  * directly as parquet — the "retire the V1Scan bridge?" decision
  * input (VERDICT r8 #8). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ... graft.BridgeBench
  *
  * Prints min-of-3 wall seconds for (a) full-scan agg over every
  * column-bearing row, (b) a 2-column projected agg — through the
  * DSv2 face and through spark.read.parquet on the same files.
  */
object BridgeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bridge-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-bridge").toString
    val li = Tables.load(spark, sfDir, "lineitem")
    new graft.lakehouse.LakehouseTable(spark, root).append(li)

    def time(f: => Unit): Double = {
      val reps = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }
    def fullAgg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(count(lit(1)), sum("l_quantity"), sum("l_extendedprice"),
        min("l_shipdate"), max("l_returnflag")).collect(); ()
    }
    def projAgg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.filter(col("l_quantity") > 10)
        .agg(sum("l_extendedprice"), count(lit(1))).collect(); ()
    }

    def dsv2 = spark.read.format("graft-lakehouse").load(root)
    def direct = spark.read.parquet(
      java.nio.file.Paths.get(root, "data").toString + "/*")

    // warm both paths (codegen, file listing)
    fullAgg(dsv2); fullAgg(direct)
    val rows = direct.count()
    val r = Map(
      "full_dsv2" -> time(fullAgg(dsv2)),
      "full_parquet" -> time(fullAgg(direct)),
      "proj_dsv2" -> time(projAgg(dsv2)),
      "proj_parquet" -> time(projAgg(direct)))
    println(f"""{"rows": $rows, "full_dsv2_s": ${r("full_dsv2")}%.3f, "full_parquet_s": ${r(
        "full_parquet")}%.3f, "proj_dsv2_s": ${r("proj_dsv2")}%.3f, "proj_parquet_s": ${r(
        "proj_parquet")}%.3f}""")

    // merge-on-read read pricing: tombstone ~1% of the keys, then read
    // the masked table through the NATIVE batch scan (broadcast hash
    // masks, columnar, zero-copy passthrough for unaffected batches)
    // vs the V1 COMPOSING path (per-action inner plan + anti-join) —
    // the round-10 "busy CDC target between compactions" number.
    val t = new graft.lakehouse.LakehouseTable(spark, root)
    t.applyChanges(
      li.filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"))
        .withColumn("_change", lit("delete")),
      Seq("l_orderkey", "l_linenumber"), mergeOnRead = true)
    require(t.currentSnapshot().get.tombstones.nonEmpty)
    def composing = t.read()
    fullAgg(dsv2); fullAgg(composing) // warm
    val morNative = time(fullAgg(dsv2))
    val morComposing = time(fullAgg(composing))
    val maskedRows = dsv2.count()
    println(f"""{"mor_masked_rows": $maskedRows, "mor_native_s": $morNative%.3f, "mor_composing_s": $morComposing%.3f}""")

    graft.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
