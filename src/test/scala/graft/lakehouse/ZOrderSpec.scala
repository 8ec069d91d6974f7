package graft.lakehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering compaction: data is preserved exactly, and the
  * rewritten layout actually SKIPS — per-file min/max ranges become
  * selective on BOTH curve columns, where a plain single-column sort
  * only helps its leading column and a shuffled layout helps neither.
  * The skipping statistic mirrors what a parquet reader's row-group
  * pruning does with the same min/max metadata.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val N = 4096
  private val Files = 16

  /** Deterministic pseudo-random 2-d points: hash-scatter both dims. */
  private def points = spark.range(N)
    .select(
      pmod(xxhash64(col("id")), lit(1024L)).as("a"),
      pmod(xxhash64(col("id"), lit(7L)), lit(1024L)).as("b"),
      col("id").as("payload"))

  /** Fraction of files a point-ish range predicate on `c` must read,
    * averaged over a probe grid: per file min/max (the parquet footer
    * stat), count files whose range overlaps [p, p+31].
    */
  private def filesScanned(t: LakehouseTable, c: String): Double = {
    val files = t.currentSnapshot().get.files
    val ranges = files.map { f =>
      val r = spark.read.parquet(
        java.nio.file.Paths.get(t.root, f).toString)
        .agg(min(col(c)), max(col(c))).head()
      (r.getLong(0), r.getLong(1))
    }
    val probes = (0 until 1024 by 64).map(p => (p.toLong, p.toLong + 31))
    val frac = probes.map { case (lo, hi) =>
      ranges.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / ranges.size
    }
    frac.sum / probes.size
  }

  test("zorder preserves the row multiset and lineage; skips on both dimensions") {
    val t = new LakehouseTable(spark, tmpDir("lh-zorder"))
    // 8 shuffled appends — every file spans ~the full range of a and b
    (0 until 8).foreach { i =>
      t.append(points.filter(pmod(col("payload"), lit(8L)) === i))
    }
    val before = t.read().as[(Long, Long, Long)].collect().sorted
    val scanBeforeA = filesScanned(t, "a")
    val scanBeforeB = filesScanned(t, "b")

    val snap = t.compactZOrder(Seq("a", "b"), targetFiles = Files)
    assert(snap.isDefined, "zorder must produce a snapshot")
    assert(snap.get.operation === "compact")
    assert(snap.get.parentId.contains(snap.get.snapshotId - 1))

    // contract 1: a clustering rewrite never changes the data
    val after = t.read().as[(Long, Long, Long)].collect().sorted
    assert(after === before, "zorder must preserve the row multiset")

    // contract 2: both dimensions skip. The shuffled layout reads ~all
    // files for any probe; the z-layout must cut BOTH columns' scans —
    // the property a leading-column sort cannot deliver on column b.
    val scanAfterA = filesScanned(t, "a")
    val scanAfterB = filesScanned(t, "b")
    info(f"files scanned, col a: $scanBeforeA%.2f -> $scanAfterA%.2f")
    info(f"files scanned, col b: $scanBeforeB%.2f -> $scanAfterB%.2f")
    assert(scanBeforeA > 0.9 && scanBeforeB > 0.9,
      "precondition: shuffled appends must not already skip")
    assert(scanAfterA < 0.6 * scanBeforeA,
      s"z-order must prune column a scans (got $scanAfterA of $scanBeforeA)")
    assert(scanAfterB < 0.6 * scanBeforeB,
      s"z-order must prune column b scans (got $scanAfterB of $scanBeforeB)")

    // contract 3: time travel still reaches the pre-compaction state
    val pre = t.scanAtSnapshot(snap.get.parentId.get).count()
    assert(pre === N)
  }

  test("zorder on an empty table is a no-op") {
    val t = new LakehouseTable(spark, tmpDir("lh-zorder-empty"))
    assert(t.compactZOrder(Seq("a"), 4).isEmpty)
  }

  test("string zorder column: hash surrogate clusters equal values; point predicates skip files") {
    val t = new LakehouseTable(spark, tmpDir("lh-zorder-str"))
    val domains = (0 until 64).map(i => s"site-$i.example")
    val rows = spark.range(N).select(
      element_at(typedLit(domains), (pmod(xxhash64(col("id")), lit(64L)) + 1).cast("int")).as("host"),
      pmod(xxhash64(col("id"), lit(7L)), lit(1024L)).as("b"),
      col("id").as("payload"))
    (0 until 8).foreach { i =>
      t.append(rows.filter(pmod(col("payload"), lit(8L)) === i))
    }
    val before = t.read().orderBy("payload").collect()
    val snap = t.compactZOrder(Seq("host", "b"), targetFiles = Files)
    assert(snap.isDefined)
    assert(t.read().orderBy("payload").collect() === before,
      "string zorder must preserve the row multiset")
    // equality skipping: each distinct host value must now live in FEW
    // files (the hash surrogate clusters equal strings), vs the
    // shuffled layout where every file holds ~every host
    val files = t.currentSnapshot().get.files
    val perFileHosts = files.map { f =>
      spark.read.parquet(java.nio.file.Paths.get(t.root, f).toString)
        .select("host").distinct().collect().map(_.getString(0)).toSet
    }
    val avgFilesPerHost = domains.map(h => perFileHosts.count(_.contains(h))).sum.toDouble / domains.size
    info(f"files holding a given host: $avgFilesPerHost%.2f of ${files.size}")
    assert(avgFilesPerHost < files.size * 0.5,
      s"a host must concentrate in few files, got $avgFilesPerHost of ${files.size}")
  }

  test("unsupported zorder column types fail fast with a clear message, before any rewrite") {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir("lh-zorder-bad"))
    t.append(Seq((1L, Seq(1, 2))).toDF("id", "arr"))
    val filesBefore = t.currentSnapshot().get.files
    val missing = intercept[IllegalArgumentException](t.compactZOrder(Seq("nope"), 2))
    assert(missing.getMessage.contains("not in table schema"))
    val badType = intercept[IllegalArgumentException](t.compactZOrder(Seq("arr"), 2))
    assert(badType.getMessage.contains("z-order supports"))
    assert(t.currentSnapshot().get.files === filesBefore, "validation must not write")
  }
}
