package graft.lakehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition-scoped overwrites — the daily backfill statement on a
  * partitioned corpus: `INSERT OVERWRITE t PARTITION (p='x')` (static,
  * OverwriteByExpression → one snapshot: matching rows out, new data
  * in, everything else carried BY REFERENCE) and dynamic mode
  * (`partitionOverwriteMode=dynamic`: replace exactly the partitions
  * present in the incoming data). Both refuse nothing silently: NULL
  * partition rows survive a value-scoped overwrite, bucket layouts
  * refuse dynamic mode, and a full INSERT OVERWRITE still truncates.
  */
class PartitionOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = tmpDir("graft-pow-wh")

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.powcat", classOf[LakehouseCatalog].getName)
    spark.conf.set("spark.sql.catalog.powcat.warehouse", warehouse)
  }

  private def fresh(name: String): LakehouseTable = {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS powcat.db")
    spark.sql(s"DROP TABLE IF EXISTS powcat.db.$name")
    spark.sql(s"CREATE TABLE powcat.db.$name (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO powcat.db.$name VALUES (1,'x'), (2,'y'), (3,'z'), (4,'x')")
    new LakehouseTable(spark, java.nio.file.Paths.get(warehouse, "db", name).toString)
  }

  private def rows(name: String): Set[(Long, String)] =
    spark.sql(s"SELECT id, p FROM powcat.db.$name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("static PARTITION overwrite replaces only the named partition, one snapshot, file-pruned") {
    val t = fresh("s1")
    val before = t.currentSnapshot().get
    spark.sql("INSERT OVERWRITE powcat.db.s1 PARTITION (p='x') SELECT 10 AS id")
    assert(rows("s1") === Set((10L, "x"), (2L, "y"), (3L, "z")))
    val after = t.currentSnapshot().get
    assert(after.operation === "overwrite")
    assert(after.parentId === Some(before.snapshotId), "exactly ONE snapshot")
    // other partitions' files carried by reference, not rewritten
    val carried = before.files.filter(after.files.contains)
    assert(carried.nonEmpty && carried.forall(!_.contains("p=x")),
      s"non-matching partitions must carry by reference: kept $carried")
    assert(after.files.exists(_.contains("p=x")), "the new partition data landed")
  }

  test("overwriting a partition with no existing rows is a pure insert; NULL partition rows survive") {
    val t = fresh("s2")
    spark.sql("INSERT INTO powcat.db.s2 VALUES (9, NULL)")
    spark.sql("INSERT OVERWRITE powcat.db.s2 PARTITION (p='new') SELECT 20 AS id")
    assert(rows("s2").contains((20L, "new")))
    assert(spark.sql("SELECT count(*) FROM powcat.db.s2 WHERE p IS NULL")
      .head.getLong(0) === 1L, "NULL-partition rows are not matched by a value filter")
    // a value-scoped overwrite never touches the null partition either
    spark.sql("INSERT OVERWRITE powcat.db.s2 PARTITION (p='new') SELECT 21 AS id")
    assert(spark.sql("SELECT count(*) FROM powcat.db.s2 WHERE p IS NULL")
      .head.getLong(0) === 1L)
    assert(rows("s2").contains((21L, "new")) && !rows("s2").contains((20L, "new")))
    assert(t.currentSnapshot().get.operation === "overwrite")
  }

  test("programmatic overwriteDynamic replaces exactly the incoming partitions; SQL dynamic mode refuses loudly") {
    val t = fresh("d1")
    // the programmatic backfill API: one snapshot, matching partitions
    // replaced wholesale, others carried by reference
    val before = t.currentSnapshot().get
    t.overwriteDynamic(Seq((20L, "x"), (30L, "z")).toDF("id", "p"))
    assert(rows("d1") === Set((20L, "x"), (30L, "z"), (2L, "y")),
      "partitions x and z replaced, y untouched")
    val after = t.currentSnapshot().get
    assert(after.parentId === Some(before.snapshotId) && after.operation === "overwrite")
    assert(before.files.filter(after.files.contains).forall(_.contains("p=y")),
      "only the untouched partition's files carry by reference")
    // bucket transforms carry no partition values to key on
    val tb = new LakehouseTable(spark,
      java.nio.file.Paths.get(warehouse, "db", "d2").toString)
    spark.sql("DROP TABLE IF EXISTS powcat.db.d2")
    spark.sql("CREATE TABLE powcat.db.d2 (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO powcat.db.d2 VALUES (1,'a')")
    val eb = intercept[IllegalArgumentException](
      tb.overwriteDynamic(Seq((2L, "b")).toDF("id", "v")))
    assert(eb.getMessage.contains("bucket"), eb.getMessage)
    // SQL dynamic mode (round 13): plans through the DML strategy —
    // replaces exactly the partitions present in the incoming rows
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val before2 = t.currentSnapshot().get
      spark.sql("INSERT OVERWRITE powcat.db.d1 VALUES (40,'x')")
      assert(rows("d1") === Set((40L, "x"), (30L, "z"), (2L, "y")),
        "dynamic SQL overwrite replaces only partition x")
      val after2 = t.currentSnapshot().get
      assert(after2.parentId === Some(before2.snapshotId) &&
        after2.operation === "overwrite", "one snapshot")
      assert(before2.files.filter(after2.files.contains).forall(!_.contains("p=x")),
        "untouched partitions carry by reference")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // full overwrite semantics hold in static mode
    spark.sql("INSERT OVERWRITE powcat.db.d1 VALUES (99,'q')")
    assert(rows("d1") === Set((99L, "q")), "static full overwrite truncates")
  }

  test("overwrites never resurrect MoR-masked rows; multi-column PARTITION clauses replace exactly") {
    // the candidate scan is tombstone-masked (scanFiles applies the
    // MoR anti-join), so rewriting a partition that holds a masked row
    // writes the SURVIVORS only — the delete holds through the rewrite
    val t = new LakehouseTable(spark, tmpDir("pow-mor"))
    t.append(Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "p"), partitionBy = Seq("p"))
    t.applyChanges(Seq((2L, "x", "delete")).toDF("id", "p", "_change"),
      Seq("id"), mergeOnRead = true)
    t.overwriteWhere(Seq((30L, "y")).toDF("id", "p"),
      Seq(org.apache.spark.sql.sources.EqualTo("p", "y")))
    assert(t.read().as[(Long, String)].collect().toSet === Set((1L, "x"), (30L, "y")))
    t.overwriteWhere(Seq((10L, "x")).toDF("id", "p"),
      Seq(org.apache.spark.sql.sources.EqualTo("p", "x")))
    assert(t.read().as[(Long, String)].collect().toSet === Set((10L, "x"), (30L, "y")),
      "the masked row must not resurrect through the partition rewrite")
    // a multi-column PARTITION clause conjuncts its filters
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS powcat.db.m1")
    spark.sql("CREATE TABLE powcat.db.m1 (id BIGINT, p STRING, n INT) PARTITIONED BY (p, n)")
    spark.sql("INSERT INTO powcat.db.m1 VALUES (1,'x',1), (2,'x',2), (3,'y',1)")
    spark.sql("INSERT OVERWRITE powcat.db.m1 PARTITION (p='x', n=1) SELECT 10 AS id")
    assert(spark.sql("SELECT id, p, n FROM powcat.db.m1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ===
      Set((10L, "x", 1), (2L, "x", 2), (3L, "y", 1)))
  }

  test("dynamic overwrite matches partition values containing literal %XX sequences") {
    // 'a%25b' path-escapes to 'a%2525b' on disk; the decode must apply
    // Spark's unescape exactly ONCE (castPartValueToDesiredType does it
    // internally) — a double decode read the dir back as 'a%b', so the
    // partition's files were never candidates and the overwrite
    // silently DUPLICATED rows instead of replacing them (ADVICE r12)
    val t = new LakehouseTable(spark, tmpDir("pow-esc"))
    t.append(Seq((1L, "a%25b"), (2L, "plain"), (3L, "a:b")).toDF("id", "p"),
      partitionBy = Seq("p"))
    t.overwriteDynamic(Seq((10L, "a%25b"), (30L, "a:b")).toDF("id", "p"))
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((10L, "a%25b"), (2L, "plain"), (30L, "a:b")),
      "escaped-value partitions replace exactly once, never duplicate")
    // SHOW PARTITIONS decodes the same way: Spark's display RE-escapes
    // the decoded value ('a%25b' renders as the path fragment
    // 'p=a%2525b') — the pre-fix double decode would have rendered
    // 'p=a%25b', i.e. the WRONG stored value round-tripped
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS powcat.db.esc")
    spark.sql("CREATE TABLE powcat.db.esc (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO powcat.db.esc VALUES (1, 'a%25b')")
    val shown = spark.sql("SHOW PARTITIONS powcat.db.esc").collect().map(_.getString(0))
    assert(shown.toSet === Set("p=a%2525b"), shown.mkString(","))
  }

  test("dynamic overwrite over a mixed-lineage table rewrites pre-spec flat files' matching rows") {
    // files written BEFORE the declared layout carry no hive segments:
    // their rows may belong to an incoming partition, so they must be
    // candidates (row-filtered rewrite), or the replaced partition ends
    // up holding both old and new rows with no error (ADVICE r12)
    val t = new LakehouseTable(spark, tmpDir("pow-mixed"))
    t.append(Seq((1L, "x"), (2L, "y")).toDF("id", "p")) // flat, pre-spec
    t.setPartitionSpec(Seq("p"))
    t.append(Seq((3L, "x"), (4L, "z")).toDF("id", "p"), partitionBy = Seq("p"))
    t.overwriteDynamic(Seq((10L, "x")).toDF("id", "p"))
    assert(t.read().as[(Long, String)].collect().toSet ===
      Set((10L, "x"), (2L, "y"), (4L, "z")),
      "the flat file's x-row is replaced too; its y-row survives the rewrite")
    // SHOW PARTITIONS skips the undecodable flat lineage instead of
    // fabricating an all-__HIVE_DEFAULT_PARTITION__ row
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS powcat.db.mix")
    spark.sql("CREATE TABLE powcat.db.mix (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO powcat.db.mix VALUES (1, 'x')")
    val tm = new LakehouseTable(spark,
      java.nio.file.Paths.get(warehouse, "db", "mix").toString)
    tm.append(Seq((9L, "w")).toDF("id", "p")) // flat append, no layout
    val shown = spark.sql("SHOW PARTITIONS powcat.db.mix").collect().map(_.getString(0))
    assert(shown.toSet === Set("p=x"), shown.mkString(","))
  }

  test("programmatic overwriteWhere refuses a batch wider than the declared types") {
    val t = fresh("g1")
    val wide = Seq((5000000000L, 1L, "x")).toDF("id", "extra", "p")
      .select(col("id"), col("p"), col("extra").cast("decimal(38,0)").as("id2"))
    // same-name column with a DIFFERENT type is the dangerous shape
    val bad = Seq(("oops", "x")).toDF("id", "p")
    val e = intercept[IllegalArgumentException](
      t.overwriteWhere(bad, Seq(org.apache.spark.sql.sources.EqualTo("p", "x"))))
    assert(e.getMessage.contains("declares"), e.getMessage)
    assert(wide.columns.length === 3) // keep the frame used
  }
}
