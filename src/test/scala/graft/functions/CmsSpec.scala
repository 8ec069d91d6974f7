package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch invariants the q106 prefilter pattern rests on:
  * the estimate NEVER under-counts (so a threshold prefilter has no
  * false negatives and the exact confirm keeps the answer exact),
  * the build is merge-order-free (map-side partials at any partition
  * count produce the identical sketch), and on a skewed stream the
  * candidate set the prefilter admits is a small superset of the true
  * heavy hitters (the shuffle-volume win, not just correctness).
  */
class CmsSpec extends SparkSpec {

  // deterministic skewed stream: 20 heavy keys ×100, 9,980 light keys
  // ×(1..3) — no RNG (seeded structure, not sampled)
  private lazy val stream: Seq[Long] = {
    val heavy = (0L until 20L).flatMap(k => Seq.fill(100)(k))
    val light = (20L until 10000L).flatMap(k => Seq.fill((k % 3L).toInt + 1)(k))
    heavy ++ light
  }
  private val T = 100L

  private def trueCounts: Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketchOf(parts: Int): Array[Byte] = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    stream.toDS().repartition(parts).toDF("k")
      .agg(expr("cms_sketch(k)")).head.getAs[Array[Byte]](0)
  }

  test("estimate never under-counts any key (no false negatives at any threshold)") {
    val (d, w, counts) = Cms.deserialize(sketchOf(4))
    val tc = trueCounts
    tc.foreach { case (k, n) =>
      assert(Cms.estimate(d, w, counts, k) >= n, s"under-count for key $k")
    }
  }

  test("build is merge-order-free: 1, 4 and 7 partitions produce identical bytes") {
    val a = sketchOf(1)
    val b = sketchOf(4)
    val c = sketchOf(7)
    assert(java.util.Arrays.equals(a, b) && java.util.Arrays.equals(b, c))
  }

  test("serialization round-trips") {
    val counts = Array.tabulate(4 * 2048)(i => i.toLong * 3)
    val (d, w, back) = Cms.deserialize(Cms.serialize(4, 2048, counts))
    assert(d == 4 && w == 2048 && back.sameElements(counts))
  }

  test("skewed stream: prefilter admits all heavy keys and prunes the light tail") {
    val (d, w, counts) = Cms.deserialize(sketchOf(4))
    val tc = trueCounts
    val heavy = tc.filter(_._2 >= T).keySet
    val admitted = tc.keySet.filter(k => Cms.estimate(d, w, counts, k) >= T)
    assert(heavy.subsetOf(admitted), "a true heavy hitter was pruned")
    // the point of the pattern: candidates ≪ vocabulary (9,980 light
    // keys over 4×2048 counters — a light key passes only if it
    // collides into heavy mass in ALL 4 rows)
    assert(admitted.size <= heavy.size + 100,
      s"prefilter admitted ${admitted.size} of ${tc.size} keys — no pruning win")
  }

  test("q106 composed pattern equals the brute-force exact aggregation") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q106_heavy_hitters")(spark, sf).collect()
    val brute = graft.Tables.load(spark, sf, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= graft.queries.CorpusStatQueries.HhThreshold)
      .orderBy(col("n_ab").desc, col("w1"), col("w2"))
      .collect()
    assert(got.toSeq == brute.toSeq)
  }
}
