package graft.lakehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native batch scan's scale features: RUNTIME (join-driven) file
  * pruning — a fact⋈dim join hands the dim side's keys to the scan at
  * execution time and the manifest drops every fact file outside the
  * key set (the dynamic-partition-pruning shape, over STATS ranges
  * instead of a partition column class) — plus manifest-exact size
  * statistics (small lakehouse tables auto-broadcast with no hint),
  * byte-bounded split planning (one oversized file fans out to many
  * tasks), and the mixed-layout column permutation path.
  */
class LakehouseRuntimeFilterSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  /** 16 files, file i holding the contiguous id range [1000i, 1000i+999]. */
  private def factTable(name: String): LakehouseTable = {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir(name))
    (0 until 16).foreach { i =>
      val lo = i.toLong * 1000
      t.append((lo until lo + 1000).map(id => (id, s"v$id")).toDF("id", "payload").coalesce(1))
    }
    t
  }

  private def dsv2(t: LakehouseTable): DataFrame =
    spark.read.format("graft-lakehouse").load(t.root)

  test("fact⋈dim join prunes fact files at RUNTIME from the dim side's keys") {
    import spark.implicits._
    val fact = factTable("rtf-fact")
    // dim: keys confined to two of the sixteen fact ranges, with a
    // selective category filter — the classic star-join shape
    val dim = new LakehouseTable(spark, tmpDir("rtf-dim"))
    dim.append((0 until 40).map(i =>
      (3000L + i, if (i % 2 == 0) "keep" else "drop")).toDF("id", "cat").coalesce(1))
    dim.append((0 until 40).map(i =>
      (11000L + i, if (i % 2 == 0) "keep" else "drop")).toDF("id", "cat").coalesce(1))

    val joined = dsv2(fact)
      .join(dsv2(dim).filter(col("cat") === "keep"), "id")
      .select("id", "payload")
    val rows = joined.collect()
    assert(rows.length === 40)
    assert(rows.forall { r =>
      val id = r.getLong(0)
      ((id >= 3000 && id < 3040) || (id >= 11000 && id < 11040)) &&
        id % 2 == 0 && r.getString(1) == s"v$id"
    })
    val info = ScanEvents.lastScan(fact.root).get
    assert(info.pushed.exists(_.startsWith("runtime:")),
      s"the fact scan must have received a runtime filter: $info")
    assert(info.filesPlanned === 2 && info.filesTotal === 16,
      s"runtime keys land in 2 of 16 ranges — manifest stats must drop the rest: $info")
  }

  test("runtime pruning composes with a STATIC pushed filter (intersection)") {
    import spark.implicits._
    val fact = factTable("rtf-both")
    val dim = new LakehouseTable(spark, tmpDir("rtf-both-dim"))
    // dim keys touch ranges 3 and 11; the static filter keeps ids < 8000,
    // so only range 3 survives both prunes
    dim.append((Seq(3500L, 11500L)).map(id => (id, "k")).toDF("id", "cat").coalesce(1))

    val joined = dsv2(fact).filter(col("id") < 8000L)
      .join(dsv2(dim).filter(col("cat") === "k"), "id")
    val rows = joined.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3500L))
    val info = ScanEvents.lastScan(fact.root).get
    assert(info.filesPlanned === 1 && info.filesTotal === 16,
      s"static (id<8000: 8 files) ∩ runtime (2 ranges) = 1 file: $info")
  }

  test("manifest statistics auto-broadcast a small lakehouse dim — no hint") {
    import spark.implicits._
    val fact = factTable("rtf-stats")
    val dim = new LakehouseTable(spark, tmpDir("rtf-stats-dim"))
    dim.append((0L until 50L).map(id => (id * 100, s"d$id")).toDF("id", "dv").coalesce(1))

    val joined = dsv2(fact).join(dsv2(dim), "id")
    assert(joined.collect().length === 50)
    val bhj = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      "a KB-sized lakehouse dim must broadcast from manifest-reported size alone:\n" +
        joined.queryExecution.executedPlan)
  }

  test("split planning: one oversized file fans out to many input partitions") {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir("rtf-split"))
    // ~50k rows of incompressible-ish payload in ONE file
    t.append((0L until 50000L).map(id =>
      (id, s"payload-$id-${id * 2654435761L}%016x")).toDF("id", "payload").coalesce(1))
    val oldMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.getOption("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = dsv2(t)
      assert(df.collect().length === 50000)
      assert(df.rdd.getNumPartitions > 4,
        s"a single large file must split into byte-bounded tasks, got ${df.rdd.getNumPartitions}")
    } finally {
      oldMax.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        spark.conf.set("spark.sql.files.maxPartitionBytes", _))
      oldCost.fold(spark.conf.unset("spark.sql.files.openCostInBytes"))(
        spark.conf.set("spark.sql.files.openCostInBytes", _))
    }
  }

  test("mixed layouts in one scan: flat and hive files align through the permutation") {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir("rtf-mixed"))
    t.append(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p").coalesce(1))
    t.append(Seq((3L, "c", "x"), (4L, "d", null.asInstanceOf[String]))
      .toDF("id", "v", "p").coalesce(1), partitionBy = Seq("p"))
    // projection order puts the path column FIRST — the hive group's
    // natural (data ++ partition) output needs the permutation
    val got = dsv2(t).select("p", "id", "v").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((Some("x"), 1L, "a"), (Some("y"), 2L, "b"),
      (Some("x"), 3L, "c"), (None, 4L, "d")))
    // and a projection that drops the path column entirely
    val ids = dsv2(t).filter(col("p") === "x").select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L))
  }
}
