package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom file-skipping index invariants: point lookups prune most
  * files while NEVER changing the answer (no false negatives — a
  * skipped file provably lacks the key; false positives die at the
  * exact residual filter), unindexed files always scan, and the build
  * is idempotent.
  */
class BloomIndexSpec extends SparkSpec {

  private def freshTable(nFiles: Int, rowsPerFile: Int): LakehouseTable = {
    import spark.implicits._
    val t = new LakehouseTable(spark, tmpDir("bloomidx"))
    (0 until nFiles).foreach { i =>
      val lo = i.toLong * rowsPerFile
      t.append((lo until lo + rowsPerFile).map(id => (id, s"v$id"))
        .toDF("id", "payload").coalesce(1))
    }
    t
  }

  test("point lookup reads ~1 file of 16 and matches the full-scan answer") {
    val t = freshTable(nFiles = 16, rowsPerFile = 1000)
    assert(t.buildBloomIndex("id", expectedPerFile = 2000) === 16)
    val (files, skipped) = t.pointLookupFiles("id", 4500L)
    // 15 other files skip unless a ~3%-fpp bloom false-positives
    assert(skipped >= 12, s"only $skipped of 15 candidate files skipped")
    assert(files.nonEmpty && files.size <= 4)
    val got = t.readPointLookup("id", 4500L).collect()
    val want = t.read().filter(col("id") === 4500L).collect()
    assert(got.toSeq === want.toSeq && want.length === 1)
  }

  test("absent key: every indexed file can be skipped; result is empty") {
    val t = freshTable(nFiles = 8, rowsPerFile = 500)
    t.buildBloomIndex("id", expectedPerFile = 1000)
    val (files, skipped) = t.pointLookupFiles("id", 999999L)
    assert(skipped >= 6, s"only $skipped of 8 files skipped for an absent key")
    assert(t.readPointLookup("id", 999999L).count() === 0L)
    assert(files.size <= 2)
  }

  test("build is idempotent; new unindexed files always scan (correctness never depends on sidecars)") {
    import spark.implicits._
    val t = freshTable(nFiles = 4, rowsPerFile = 250)
    assert(t.buildBloomIndex("id", expectedPerFile = 500) === 4)
    assert(t.buildBloomIndex("id", expectedPerFile = 500) === 0, "second build must be a no-op")
    // a post-index append has no sidecar — its rows must still surface
    t.append(Seq((777777L, "late")).toDF("id", "payload").coalesce(1))
    val got = t.readPointLookup("id", 777777L).collect()
    assert(got.length === 1 && got.head.getString(1) === "late")
    // and the fresh file is in the read set despite every indexed
    // file skipping
    val (files, _) = t.pointLookupFiles("id", 777777L)
    assert(files.exists(_.contains("s5")), "unindexed file must always be read")
  }

  test("string probe against a BIGINT column coerces before hashing (the CLI shape)") {
    val t = freshTable(nFiles = 6, rowsPerFile = 400)
    t.buildBloomIndex("id", expectedPerFile = 800)
    // an uncoerced probe would hash the STRING "1234" and skip the
    // file that holds id = 1234 — a silent wrong-empty-answer
    val got = t.readPointLookup("id", "1234").collect()
    assert(got.length === 1 && got.head.getLong(0) === 1234L)
    val (_, skipped) = t.pointLookupFiles("id", "1234")
    assert(skipped >= 3, "coerced probe must still prune")
  }

  test("sidecar GC: expiry prunes blooms of dropped files; live sidecars survive") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val t = freshTable(nFiles = 6, rowsPerFile = 400)
    t.buildBloomIndex("id", expectedPerFile = 800)
    val bloomRoot = Paths.get(t.root).resolve("_index").resolve("bloom")
    def sidecars(): Int = Files.walk(bloomRoot).iterator().asScala
      .count(p => p.toString.endsWith(".bloom"))
    assert(sidecars() === 6)
    // compaction rewrites the file set; the 6 old files survive only in
    // retained snapshots — so their sidecars must survive expiry-free GC
    t.compact(fileThreshold = 1, maxRows = Long.MaxValue)
    assert(t.pruneBloomSidecars() === 0, "sidecars of retained-snapshot files must not be GC'd")
    // expiry drops the old snapshots AND data files → sidecars now dead
    assert(t.expireSnapshotsOlderThan(System.currentTimeMillis() + 1000) > 0)
    assert(sidecars() === 0, "expiry must prune sidecars of dropped files")
    // index the compacted file and confirm lookups still work end-to-end
    assert(t.buildBloomIndex("id", expectedPerFile = 3000) === 1)
    val got = t.readPointLookup("id", 1234L).collect()
    assert(got.length === 1 && got.head.getLong(0) === 1234L)
  }

  test("string-keyed index prunes on the same xxhash64 the probe uses") {
    val t = freshTable(nFiles = 6, rowsPerFile = 400)
    t.buildBloomIndex("payload", expectedPerFile = 800)
    val got = t.readPointLookup("payload", "v1234").collect()
    assert(got.length === 1 && got.head.getLong(0) === 1234L)
    val (_, skipped) = t.pointLookupFiles("payload", "v1234")
    assert(skipped >= 3)
  }
}
