package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** `bloom_might_contain` contract: no false negatives ever (the property
  * q88's exactness rests on), false positives bounded by the sketch's
  * fpp, agreement with the driver-side `BloomFilter.mightContainLong`,
  * and rejection of a non-foldable bloom argument (per-row
  * deserialization must be impossible by construction).
  */
class BloomMightContainSpec extends SparkSpec {

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted key probes true (10k keys)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val keys = (0 until 10000).map(i => i * 2654435761L % 1000003L)
    val bf = BloomFilter.create(16384, 0.01)
    keys.foreach(bf.putLong)
    val misses = keys.toDF("v")
      .filter(!call_function("bloom_might_contain", lit(serialize(bf)), col("v")))
      .count()
    assert(misses === 0L)
  }

  test("agrees with driver-side mightContainLong on hits and misses") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(1024, 0.03)
    (0L until 512L).foreach(i => bf.putLong(i * 7919L))
    val bytes = serialize(bf)
    val probes = (0L until 4096L).map(i => i * 104729L % 99991L)
    val sparkSide = probes.toDF("v")
      .select(col("v"), call_function("bloom_might_contain", lit(bytes), col("v")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(sparkSide(p) === bf.mightContainLong(p), s"probe $p diverges")
    }
  }

  test("false-positive rate stays near the sketch fpp (sanity bound)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(8192, 0.01)
    (0L until 8192L).foreach(i => bf.putLong(i))
    // disjoint probe range: any true is a false positive
    val fp = (100000L until 120000L).toDF("v")
      .filter(call_function("bloom_might_contain", lit(serialize(bf)), col("v")))
      .count()
    assert(fp < 20000L * 0.05, s"fp rate ${fp / 20000.0} far above sketch fpp")
  }

  test("null value probes return null (nullIntolerant contract)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(64, 0.03)
    bf.putLong(1L)
    val out = Seq(Some(1L), None).toDF("v")
      .select(call_function("bloom_might_contain", lit(serialize(bf)), col("v")))
      .collect()
    assert(out(0).getBoolean(0))
    assert(out(1).isNullAt(0))
  }

  test("non-foldable bloom argument is rejected at analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(64, 0.03)
    val df = Seq((serialize(bf), 1L)).toDF("b", "v")
    val e = intercept[Exception] {
      df.select(call_function("bloom_might_contain", col("b"), col("v"))).collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }
}
