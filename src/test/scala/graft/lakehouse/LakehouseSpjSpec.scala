package graft.lakehouse

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Storage-partitioned joins: two lakehouse tables laid out on the
  * same hive partition columns join (and pre-aggregate) with ZERO
  * shuffle — the scan reports `KeyGroupedPartitioning` and Spark
  * aligns tasks value-for-value (the Iceberg SPJ shape; at 100 TB this
  * is the fact⋈fact join broadcast can't save). Opt-in via
  * `spark.sql.sources.v2.bucketing.enabled`, exactly like Iceberg.
  */
class LakehouseSpjSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String, rows: Seq[(Long, Long, String)]): String = {
    val root = tmpDir(prefix)
    val t = new LakehouseTable(spark, root)
    // two appends → several files per cell (SPJ must merge same-key files)
    val (a, b) = rows.splitAt(rows.size / 2)
    t.append(a.toDF("cell", "id", "v"), partitionBy = Seq("cell"))
    t.append(b.toDF("cell", "id", "v"), partitionBy = Seq("cell"))
    root
  }
  private def lake(root: String): DataFrame =
    spark.read.format("graft-lakehouse").load(root)

  private def perCellJoin(l: String, r: String): DataFrame =
    lake(l).groupBy("cell").agg(sum("id").as("lsum"))
      .join(lake(r).groupBy("cell").agg(sum("id").as("rsum")), "cell")

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def shuffles(df: DataFrame): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(fmt(df)).size

  private def withSpj[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("co-partitioned agg + join runs with ZERO shuffles under SPJ; same result as the shuffle plan") {
    val l = mkTable("spj-l", (0L until 400L).map(i => (i % 4, i, s"l$i")))
    val r = mkTable("spj-r", (0L until 400L).map(i => (i % 4, i * 3, s"r$i")))
    val expected = withSpj(on = false) {
      val df = perCellJoin(l, r)
      assert(shuffles(df) > 0, "baseline must be the shuffling plan")
      df.collect().toSet
    }
    withSpj(on = true) {
      val df = perCellJoin(l, r)
      assert(shuffles(df) === 0,
        s"co-partitioned agg+join must not shuffle:\n${fmt(df)}")
      assert(df.collect().toSet === expected)
    }
  }

  test("partition-value sets may differ across sides (push-down part values pads the gap)") {
    // left covers cells 0..3, right only 0..2 — SPJ must not lose or
    // fabricate rows for the uncovered cell
    val l = mkTable("spj-miss-l", (0L until 400L).map(i => (i % 4, i, s"l$i")))
    val r = mkTable("spj-miss-r", (0L until 300L).map(i => (i % 3, i, s"r$i")))
    val expected = withSpj(on = false) { perCellJoin(l, r).collect().toSet }
    withSpj(on = true) {
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      try assert(perCellJoin(l, r).collect().toSet === expected)
      finally spark.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    }
  }

  test("unpartitioned and mixed-layout tables stay on UnknownPartitioning (correct, shuffled)") {
    val flatRoot = tmpDir("spj-flat")
    new LakehouseTable(spark, flatRoot)
      .append((0L until 100L).map(i => (i % 4, i, s"f$i")).toDF("cell", "id", "v"))
    // mixed lineage: one hive append + one flat append → ineligible
    val mixedRoot = tmpDir("spj-mixed")
    val mt = new LakehouseTable(spark, mixedRoot)
    mt.append((0L until 50L).map(i => (i % 4, i, s"m$i")).toDF("cell", "id", "v"),
      partitionBy = Seq("cell"))
    mt.append((50L until 100L).map(i => (i % 4, i, s"m$i")).toDF("cell", "id", "v"))
    withSpj(on = true) {
      Seq(flatRoot, mixedRoot).foreach { root =>
        val df = lake(root).groupBy("cell").agg(sum("id").as("s"))
        assert(shuffles(df) > 0, "ineligible layouts must keep the shuffle")
        assert(df.count() === 4)
      }
    }
  }

  test("pure-SQL SPJ: catalog PARTITIONED BY tables join with zero shuffles") {
    val warehouse = tmpDir("spj-sql-wh")
    spark.conf.set("spark.sql.catalog.spjcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.db")
      spark.sql("CREATE TABLE spjcat.db.sl (cell BIGINT, id BIGINT) PARTITIONED BY (cell)")
      spark.sql("CREATE TABLE spjcat.db.sr (cell BIGINT, id BIGINT) PARTITIONED BY (cell)")
      spark.sql("INSERT INTO spjcat.db.sl SELECT id % 4, id FROM range(400)")
      spark.sql("INSERT INTO spjcat.db.sr SELECT id % 4, id * 2 FROM range(400)")
      val q = """SELECT l.cell, l.ls, r.rs FROM
                   (SELECT cell, sum(id) AS ls FROM spjcat.db.sl GROUP BY cell) l
                   JOIN
                   (SELECT cell, sum(id) AS rs FROM spjcat.db.sr GROUP BY cell) r
                   ON l.cell = r.cell"""
      val expected = withSpj(on = false) { spark.sql(q).collect().toSet }
      withSpj(on = true) {
        val df = spark.sql(q)
        assert(shuffles(df) === 0,
          s"SQL-declared co-partitioned tables must join shuffle-free:\n${fmt(df)}")
        assert(df.collect().toSet === expected)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS spjcat.db.sl")
      spark.sql("DROP TABLE IF EXISTS spjcat.db.sr")
      spark.conf.unset("spark.sql.catalog.spjcat")
      spark.conf.unset("spark.sql.catalog.spjcat.warehouse")
    }
  }

  test("bucket(N, col) SPJ: high-cardinality keys join with ZERO shuffles through the catalog") {
    val warehouse = tmpDir("spj-bkt-wh")
    spark.conf.set("spark.sql.catalog.bktcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.bktcat.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS bktcat.db")
      // high-cardinality join key: identity partitioning would need one
      // dir per key; bucket(8, k) co-partitions both sides into 8 cells
      spark.sql("CREATE TABLE bktcat.db.bl (k BIGINT, lv BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      spark.sql("CREATE TABLE bktcat.db.br (k BIGINT, rv BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      spark.sql("INSERT INTO bktcat.db.bl SELECT id, id * 10 FROM range(4000)")
      spark.sql("INSERT INTO bktcat.db.br SELECT id, id * 100 FROM range(2000, 6000)")
      // the physical layout really is bucketed: 8 k_bucket= dirs/table
      val blRoot = java.nio.file.Paths.get(warehouse, "db", "bl").toString
      val buckets = new LakehouseTable(spark, blRoot).currentSnapshot().get.files
        .flatMap(_.split('/').find(_.startsWith("k_bucket="))).distinct
      assert(buckets.size === 8, s"bucketed layout must span 8 cells, got $buckets")

      val q = """SELECT l.k, l.lv, r.rv FROM bktcat.db.bl l
                 JOIN bktcat.db.br r ON l.k = r.k"""
      val expected = withSpj(on = false) {
        val df = spark.sql(q)
        assert(shuffles(df) > 0, "baseline must be the shuffling plan")
        df.collect().toSet
      }
      assert(expected.size === 2000)
      withSpj(on = true) {
        val df = spark.sql(q)
        assert(shuffles(df) === 0,
          s"same-bucketed tables must join shuffle-free:\n${fmt(df)}")
        assert(df.collect().toSet === expected)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bktcat.db.bl")
      spark.sql("DROP TABLE IF EXISTS bktcat.db.br")
      spark.conf.unset("spark.sql.catalog.bktcat")
      spark.conf.unset("spark.sql.catalog.bktcat.warehouse")
    }
  }

  test("bucket layout reads back correctly without SPJ (bucket dir is layout, not data)") {
    val warehouse = tmpDir("spj-bkt2-wh")
    spark.conf.set("spark.sql.catalog.bkt2cat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.bkt2cat.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt2cat.db")
      spark.sql("CREATE TABLE bkt2cat.db.b2 (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO bkt2cat.db.b2 SELECT id, concat('v', id) FROM range(100)")
      assert(spark.sql("SELECT count(*) FROM bkt2cat.db.b2 WHERE k < 50")
        .head.getLong(0) === 50L)
      assert(spark.sql("SELECT v FROM bkt2cat.db.b2 WHERE k = 7").head.getString(0) === "v7")
      // bucket-dir PRUNING: a point lookup on the bucketed key plans
      // only its bucket's files (1/4 of the table), no SPJ conf needed
      val root = java.nio.file.Paths.get(warehouse, "db", "b2").toString
      val info = ScanEvents.lastScan(root).get
      assert(info.filesPlanned * 4 <= info.filesTotal * 2,
        s"k=7 must skip to its bucket's files: $info")
      assert(spark.sql("SELECT count(DISTINCT k) FROM bkt2cat.db.b2").head.getLong(0) === 100L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt2cat.db.b2")
      spark.conf.unset("spark.sql.catalog.bkt2cat")
      spark.conf.unset("spark.sql.catalog.bkt2cat.warehouse")
    }
  }

  test("keyed writes into a bucketed catalog table KEEP the bucket layout (SPJ stays eligible)") {
    import spark.implicits._
    val warehouse = tmpDir("spj-bkt3-wh")
    spark.conf.set("spark.sql.catalog.bkt3cat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.bkt3cat.warehouse", warehouse)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt3cat.db")
      spark.sql("CREATE TABLE bkt3cat.db.b3 (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO bkt3cat.db.b3 SELECT id, concat('v', id) FROM range(200)")
      val root = java.nio.file.Paths.get(warehouse, "db", "b3").toString
      val t = new LakehouseTable(spark, root)
      // a keyed CDC apply (the replication-sink shape): the upsert's
      // rewrites AND inserts must land under k_bucket= dirs — dir
      // inference alone can't reconstruct bucket(N, k), the declared
      // catalog spec must win
      t.applyChanges(Seq((5L, "UP", "insert"), (300L, "NEW", "insert"),
        (7L, "x", "delete")).toDF("k", "v", "_change"), Seq("k"))
      // SQL MERGE keeps the layout too
      spark.sql("MERGE INTO bkt3cat.db.b3 t USING (SELECT 10 AS k, 'M' AS v) s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
      val files = t.currentSnapshot().get.files
      assert(files.forall(_.contains("k_bucket=")),
        s"every file must stay bucket-laid-out: ${files.filterNot(_.contains("k_bucket="))}")
      assert(spark.sql("SELECT v FROM bkt3cat.db.b3 WHERE k = 5").head.getString(0) === "UP")
      assert(spark.sql("SELECT v FROM bkt3cat.db.b3 WHERE k = 10").head.getString(0) === "M")
      assert(spark.sql("SELECT count(*) FROM bkt3cat.db.b3 WHERE k = 7").head.getLong(0) === 0L)
      assert(spark.sql("SELECT count(*) FROM bkt3cat.db.b3").head.getLong(0) === 200L)
      // the maintained layout still serves a zero-shuffle join
      withSpj(on = true) {
        val df = spark.sql("SELECT a.k FROM bkt3cat.db.b3 a JOIN bkt3cat.db.b3 b ON a.k = b.k")
        assert(shuffles(df) === 0, s"post-write bucket layout must keep SPJ:\n${fmt(df)}")
        assert(df.count() === 200L)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt3cat.db.b3")
      spark.conf.unset("spark.sql.catalog.bkt3cat")
      spark.conf.unset("spark.sql.catalog.bkt3cat.warehouse")
    }
  }

  test("SPJ-reporting scan still answers filters correctly (runtime pruning stands down)") {
    val l = mkTable("spj-filter-l", (0L until 400L).map(i => (i % 4, i, s"l$i")))
    val r = mkTable("spj-filter-r", (0L until 400L).map(i => (i % 4, i, s"r$i")))
    withSpj(on = true) {
      val j = lake(l).filter(col("id") < 100L)
        .join(lake(r).groupBy("cell").agg(count(lit(1)).as("n")), "cell")
      assert(j.count() === 100L)
    }
  }
}
