package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Field-id assignment pins (FIELD_IDS.md — the round-12 design spike):
  * ids stamp on every NEW snapshot, are stable under rename/widen,
  * retire on drop (never reused), and backfill positionally for
  * lineages that predate them. Resolution stays name-based this round —
  * these pins freeze the ID ALGEBRA so the later switch to id-based
  * resolution cannot silently re-number anything.
  */
class FieldIdSpec extends SparkSpec {

  private def ids(t: LakehouseTable): Map[String, Int] =
    t.currentSnapshot().get.fieldIds.get.ids
  private def next(t: LakehouseTable): Int =
    t.currentSnapshot().get.fieldIds.get.next

  test("initial schema assigns 1..n in declaration order; same names keep ids across commits") {
    import spark.implicits._
    val root = tmpDir("graft-fid-1")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a", 7)).toDF("k", "v", "extra"))
    assert(ids(t) === Map("k" -> 1, "v" -> 2, "extra" -> 3) && next(t) === 4)
    t.append(Seq((2L, "b", 8)).toDF("k", "v", "extra"))
    assert(ids(t) === Map("k" -> 1, "v" -> 2, "extra" -> 3) && next(t) === 4,
      "an append must not re-number anything")
  }

  test("ADD allocates next; RENAME carries the id; WIDEN keeps it; DROP retires it forever") {
    import spark.implicits._
    val root = tmpDir("graft-fid-2")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "flag", org.apache.spark.sql.types.StringType, nullable = true)))
    assert(ids(t) === Map("k" -> 1, "v" -> 2, "flag" -> 3))
    t.renameColumn("v", "label")
    assert(ids(t) === Map("k" -> 1, "label" -> 2, "flag" -> 3),
      "a rename must carry the old name's id to the new name")
    t.widenColumn("k", org.apache.spark.sql.types.LongType)
    assert(ids(t) === Map("k" -> 1, "label" -> 2, "flag" -> 3),
      "a type widen must not touch ids")
    t.dropColumn("flag")
    assert(ids(t) === Map("k" -> 1, "label" -> 2) && next(t) === 4,
      "a drop retires the id but the high-water mark stays")
    t.compact(fileThreshold = 1, maxRows = Long.MaxValue, targetFiles = 1)
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "flag", org.apache.spark.sql.types.StringType, nullable = true)))
    assert(ids(t)("flag") === 4,
      "a re-added name is a NEW column: fresh id, never the retired 3")
  }

  test("rollback restores the target's ids; the allocation mark never rewinds") {
    import spark.implicits._
    val root = tmpDir("graft-fid-3")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))
    val pre = t.currentSnapshot().get.snapshotId
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "flag", org.apache.spark.sql.types.StringType, nullable = true)))
    t.rollbackToSnapshot(pre)
    assert(ids(t) === Map("k" -> 1, "v" -> 2))
    assert(next(t) === 4,
      "flag's id 3 was allocated on the abandoned branch — it must stay retired")
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "other", org.apache.spark.sql.types.StringType, nullable = true)))
    assert(ids(t)("other") === 4)
  }

  test("step 1: new data files stamp head-confirmed parquet field ids; compaction stamps all") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = tmpDir("graft-fid-5")
    def footerIds(f: String): Map[String, Option[Int]] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(java.nio.file.Paths.get(root).resolve(f).toString),
        spark.sessionState.newHadoopConf())
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(fd => fd.getName -> Option(fd.getId).map(_.intValue)).toMap
      finally reader.close()
    }
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val first = t.currentSnapshot().get.files
    // the FIRST write precedes any committed head: unstamped by design
    // (an id must be head-confirmed before it may enter a file)
    assert(first.forall(f => footerIds(f).values.forall(_.isEmpty)))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val second = t.currentSnapshot().get.files.diff(first)
    assert(second.nonEmpty)
    second.foreach { f =>
      assert(footerIds(f) === Map("k" -> Some(1), "v" -> Some(2)),
        s"second append must stamp the head-confirmed ids into $f")
    }
    // compaction rewrites every file → the whole table is stamped
    t.compact(fileThreshold = 1, maxRows = Long.MaxValue, targetFiles = 1)
    t.currentSnapshot().get.files.foreach { f =>
      assert(footerIds(f) === Map("k" -> Some(1), "v" -> Some(2)))
    }
  }

  test("a pre-field-id lineage backfills positionally at its next commit") {
    import spark.implicits._
    val root = tmpDir("graft-fid-4")
    val t = new LakehouseTable(spark, root)
    t.append(Seq((1L, "a", 0.5)).toDF("k", "v", "w"))
    // simulate a pre-round-12 manifest: strip the stamped state and
    // republish the manifest body without it
    val snapsDir = java.nio.file.Paths.get(root, "_snapshots")
    val head = t.currentSnapshot().get
    val p = snapsDir.resolve(f"${head.snapshotId}%09d.json")
    val stripped = java.nio.file.Files.readString(p)
      .replaceAll(""","fieldIds":\{[^}]*"ids":\{[^}]*\}[^}]*\}""", "")
    java.nio.file.Files.writeString(p, stripped)
    val t2 = new LakehouseTable(spark, root)
    assert(t2.currentSnapshot().get.fieldIds.isEmpty, "manifest strip must have worked")
    t2.append(Seq((2L, "b", 0.7)).toDF("k", "v", "w"))
    assert(ids(t2) === Map("k" -> 1, "v" -> 2, "w" -> 3) && next(t2) === 4,
      "backfill must be positional over the declared schema")
  }
}
