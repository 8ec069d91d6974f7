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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read natively; read it as int64 nanos and convert. All fixture
      // values are µs-aligned (verified: epoch_ns(ts) % 1000 == 0 for
      // every row), so the DIV-1000 conversion is lossless.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all fixture tables as temp views for SQL-level access. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
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

  /** Deterministic average: exact decimal sum → double, then IEEE double
    * division by the count. Decimal division is NOT portable — each
    * engine rounds the quotient at its own result scale, which flips
    * half-point values (seen at sf0.1: 3275.45875 → .4588 vs .4587).
    * decimal→double conversion and double division are round-to-nearest
    * in both engines, so this path is bit-stable.
    */
  def davg(c: Column, scale: Int = 4): Column =
    round((sum(dec(c)).cast(DoubleType) / count(lit(1)).cast(DoubleType))
      .cast(DecimalType(38, 6)), scale).cast(DoubleType)

  /** Round a non-aggregated double deterministically via decimal. */
  def dround(c: Column, scale: Int = 4): Column =
    round(c.cast(DecimalType(38, 6)), scale).cast(DoubleType)

  /** DuckDB-side equivalents (kept adjacent so the two dialects stay in
    * lockstep): see Oracle.scala for the SQL strings.
    */
  val dsumSql: (String, Int) => String =
    (x, s) => s"CAST(round(sum(CAST(($x) AS DECIMAL(38,6))), $s) AS DOUBLE)"
  val davgSql: (String, Int) => String =
    (x, s) => s"CAST(round(CAST(CAST(sum(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS DECIMAL(38,6)), $s) AS DOUBLE)"
  val droundSql: (String, Int) => String =
    (x, s) => s"CAST(round(CAST(($x) AS DECIMAL(38,6)), $s) AS DOUBLE)"
}
