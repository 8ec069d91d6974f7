package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Fixture-table registry over the driver test data
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, schemas in
  * FIXTURES.md §A). Every query loads through here so projection /
  * predicate pushdown reach the parquet scan unmodified.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Fixture tables are immutable per (dir, name), so their PHYSICAL
  // schema is a per-process constant. Memoizing it turns every
  // subsequent load into `spark.read.schema(memoized)` — parquet schema
  // inference is a Spark JOB (SchemaMergeUtils.mergeSchemasInParallel
  // footer-reads even a single file through the cluster), and a bench
  // pass over the catalog was paying it hundreds of times (guide §2.4:
  // remove work outright before tuning it).
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Fixture generations have shipped events.ts under two physical
      // types: parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
      // natively (read as int64 nanos via the legacy conf and convert —
      // lossless: all fixture values are µs-aligned), and plain
      // TIMESTAMP(MICROS) without tz metadata, which reads as
      // TIMESTAMP_NTZ. Normalize both to session-TZ TIMESTAMP (every
      // entry point pins spark.sql.session.timeZone=UTC, so the NTZ→TZ
      // cast is instant-preserving) so the catalog sees one schema
      // regardless of fixture vintage.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = schemaMemo.getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet").schema)
      val raw = spark.read.schema(sch).parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      val sch = schemaMemo.getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet").schema)
      spark.read.schema(sch).parquet(s"$dir/$name.parquet")
    }

  /** Register all fixture tables as temp views for SQL-level access. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // Fixture tables are immutable per (dir, name), so a row count is a
  // per-process constant — memoized so queries that size themselves from
  // the cardinality (q50's tile count) don't pay an eager count() job on
  // every invocation.
  private val countMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countMemo.getOrElseUpdate((dir, name), load(spark, dir, name).count())
}

/** Driver-side filesystem helper for the self-contained lineage queries
  * and benches that stage temp lakehouse roots: delete a tree once its
  * audited values are collected, so repeated runs don't accumulate
  * temp dirs.
  */
object Fs {
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close() // Files.walk holds a directory handle
    }
  }

  /** Materialize a path stream with the stream CLOSED — the bare
    * iterator pattern leaks a directory fd per call until GC, which a
    * long-lived driver doing per-commit manifest listings exhausts.
    */
  private def drain(s: java.util.stream.Stream[java.nio.file.Path]): Seq[java.nio.file.Path] =
    try {
      val b = Seq.newBuilder[java.nio.file.Path]
      s.forEach(p => { b += p; () })
      b.result()
    } finally s.close()

  def listAll(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    drain(java.nio.file.Files.list(dir))

  def walkAll(root: java.nio.file.Path): Seq[java.nio.file.Path] =
    drain(java.nio.file.Files.walk(root))
}

/** Determinism helpers for the DuckDB-oracle hash contract (SURVEY §7.5):
  * monetary aggregates go through exact decimal arithmetic, results are
  * rounded to a fixed scale and emitted as double so Spark and DuckDB
  * produce bit-identical values regardless of accumulation order.
  */
object Det {
  /** Exact-decimal term for summation: cast the (IEEE-identical) double
    * expression to decimal(38,6) so the subsequent SUM is exact.
    */
  def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Deterministic money sum: sum over decimal(38,6), round, emit double. */
  def dsum(c: Column, scale: Int = 4): Column =
    round(sum(dec(c)), scale).cast(DoubleType)

  /** Portable half-up rounding of a double, entirely in IEEE arithmetic:
    * floor(x·10^s + 0.5) / 10^s. Double→decimal CASTs are NOT portable —
    * Spark rounds the shortest-representation string (123.4567885 →
    * .456789) while DuckDB rounds the scaled double (→ .456788); this
    * formula uses only mul/add/floor/div, which are round-to-nearest in
    * both engines, so the result is bit-identical by construction.
    */
  private def ieeeRound(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Deterministic average: exact decimal sum → double, IEEE division
    * by the count, IEEE rounding. (Decimal division is not portable
    * either — each engine rounds the quotient at its own result scale;
    * seen at sf0.1: 3275.45875 → .4588 vs .4587.)
    */
  def davg(c: Column, scale: Int = 4): Column =
    ieeeRound(sum(dec(c)).cast(DoubleType) / count(lit(1)).cast(DoubleType), scale)

  /** Round a non-aggregated double deterministically (IEEE formula). */
  def dround(c: Column, scale: Int = 4): Column =
    ieeeRound(c.cast(DoubleType), scale)

  /** The same IEEE half-up rounding for driver-side scala Doubles
    * (metadata assembled from exact integer sums, e.g. q94's covariance).
    */
  def droundD(x: Double, scale: Int): Double = {
    val p = math.pow(10.0, scale)
    math.floor(x * p + 0.5) / p
  }

  /** DuckDB-side equivalents (kept adjacent so the two dialects stay in
    * lockstep): see Oracle.scala for the SQL strings.
    */
  val dsumSql: (String, Int) => String =
    (x, s) => s"CAST(round(sum(CAST(($x) AS DECIMAL(38,6))), $s) AS DOUBLE)"
  private def ieeeRoundSql(x: String, s: Int): String = {
    val p = s"1e$s"
    s"floor(($x) * $p + 0.5) / $p"
  }
  val davgSql: (String, Int) => String =
    (x, s) => ieeeRoundSql(s"CAST(sum(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE) / count(*)", s)
  val droundSql: (String, Int) => String =
    (x, s) => ieeeRoundSql(s"CAST(($x) AS DOUBLE)", s)
}
