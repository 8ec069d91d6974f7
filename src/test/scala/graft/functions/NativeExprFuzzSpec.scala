package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmTextQueries.{QualityD, QualityW}

/** Seeded-random equivalence fuzz for the native expressions vs the
  * Catalyst HOF formulations they replace — the fixture-corpus specs
  * prove parity on realistic text; this drives the edge space
  * (unicode, empty strings, duplicates, single tokens, long arrays).
  */
class NativeExprFuzzSpec extends SparkSpec {

  private val alphabet: Vector[String] = Vector(
    "the", "a", "of", "and", "is", "to", "in", "der", "die", "und",
    "le", "la", "et", "el", "los", "y", "", " ", "á", "ü", "漢", "字",
    "x", "y9", "Z_", "mixedCase", "0", "-1", "emoji😀", "tab\tchar")

  private def randomDocs(seed: Long, n: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(120) // includes empty arrays
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
    }
  }

  private val wArr = QualityW.mkString(",")

  test("bow_score ≡ HOF aggregate on 300 random token arrays") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val hof =
      s"""aggregate(
           transform(toks,
             w -> element_at(array($wArr),
               CAST(pmod(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT), $QualityD) AS INT) + 1)),
           0L, (acc, x) -> acc + x)"""
    val rows = randomDocs(seed = 20260813L, n = 300).toDF("toks")
    val diff = rows.select(
        expr(s"bow_score(toks, array($wArr))").as("fast"), expr(hof).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff === 0L)
  }

  test("count_in ≡ size(filter(IN)) on 300 random token arrays and 3 key sets") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = randomDocs(seed = 987654321L, n = 300).toDF("toks")
    val keySets = Seq(
      Seq("the", "a", "of", "and", "is", "to", "in"),
      Seq("", "漢", "emoji😀"),
      Seq("nomatch"))
    keySets.foreach { ks =>
      val lit = ks.map(k => s"'${k.replace("'", "''")}'").mkString(",")
      val diff = rows.select(
          expr(s"count_in(toks, array($lit))").as("fast"),
          size(expr(s"filter(toks, t -> t IN ($lit))")).as("slow"))
        .filter(col("fast") =!= col("slow")).count()
      assert(diff === 0L, s"keys=$ks")
    }
  }

  test("bloom_might_contain ≡ driver-side mightContainLong on 5k seeded-random probes") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(2048, 0.02)
    val inserted = Seq.fill(2048)(rnd.nextLong())
    inserted.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    // probes: half inserted, half random, plus the integer edge space
    val probes = (inserted.take(2500) ++ Seq.fill(2500)(rnd.nextLong()) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)).distinct
    val diff = probes.toDF("v")
      .select(col("v"),
        call_function("bloom_might_contain", lit(bytes), col("v")).as("hit"))
      .collect()
      .count(r => r.getBoolean(1) != bf.mightContainLong(r.getLong(0)))
    assert(diff === 0)
  }

  test("cms_estimate ≡ driver-side Cms.estimate on 5k seeded-random probes") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val keys = Seq.fill(4096)(rnd.nextLong() % 512) // force collisions
    val sketch = keys.toDF("k").agg(expr("cms_sketch(k)")).head.getAs[Array[Byte]](0)
    val (d, w, counts) = Cms.deserialize(sketch)
    val probes = (keys.distinct ++ Seq.fill(2500)(rnd.nextLong()) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)).distinct
    val diff = probes.toDF("v")
      .select(col("v"),
        call_function("cms_estimate", lit(sketch), col("v")).as("est"))
      .collect()
      .count(r => r.getLong(1) != Cms.estimate(d, w, counts, r.getLong(0)))
    assert(diff === 0)
  }

  test("ngram_hashes ≡ HOF on 200 random token arrays (n=2,3)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    def hof(n: Int): String =
      s"""array_distinct(transform(sequence(0, size(toks) - $n),
            i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, $n))), 1, 15), 16, 10) AS BIGINT)))"""
    val rows = randomDocs(seed = 1357911L, n = 200).toDF("toks")
    Seq(2, 3).foreach { n =>
      val diff = rows.filter(size(col("toks")) >= n)
        .select(expr(s"ngram_hashes(toks, $n, 0)").as("fast"), expr(hof(n)).as("slow"))
        .filter(not(col("fast") === col("slow"))).count()
      assert(diff === 0L, s"n=$n")
    }
  }

  test("media decoders NEVER throw: 10k random and mutated-valid byte blobs → null or a row, no exceptions, no OOB") {
    // the hostile-input contract the decode docs promise — a bad blob
    // on a 100 TB scan must yield a filterable null, never a dead task
    val rnd = new scala.util.Random(20260814L)
    def randomBlob(): Array[Byte] = {
      val len = rnd.nextInt(200)
      val b = new Array[Byte](len); rnd.nextBytes(b); b
    }
    def mutatedWav(): Array[Byte] = {
      val samples = Array.tabulate[Short](8)(i => (i * 100 - 300).toShort)
      val b = WavCodec.encode(2, 8000, samples)
      (0 until 3).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
      b
    }
    def mutatedBmp(): Array[Byte] = {
      val b = BmpCodec.encode(3, 2, Array.tabulate(6)(i => i * 0x31171))
      (0 until 3).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
      b
    }
    (0 until 10000).foreach { i =>
      val blob = (i % 4: @unchecked) match {
        case 0 => randomBlob()
        case 1 => mutatedWav()
        case 2 => mutatedBmp()
        case 3 => // valid prefix, truncated mid-structure
          val full = if (i % 8 < 4) mutatedWav() else mutatedBmp()
          full.take(rnd.nextInt(full.length + 1))
      }
      WavCodec.decode(blob) // null or row — must not throw
      WavCodec.features(blob, 1 + rnd.nextInt(5))
      BmpCodec.decode(blob)
    }
  }
}
