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

  test("cms_sketch honors spark.graft.cms.{width,depth} at registration") {
    import spark.implicits._
    try {
      spark.conf.set(GraftFunctions.CmsWidthConf, "512")
      spark.conf.set(GraftFunctions.CmsDepthConf, "3")
      GraftFunctions.register(spark)
      val sk = stream.toDS().toDF("k")
        .agg(expr("cms_sketch(k)")).head.getAs[Array[Byte]](0)
      val (d, w, _) = Cms.deserialize(sk)
      assert(d === 3 && w === 512)
      assert(sk.length === 8 + 3 * 512 * 8)
    } finally {
      spark.conf.unset(GraftFunctions.CmsWidthConf)
      spark.conf.unset(GraftFunctions.CmsDepthConf)
      GraftFunctions.register(spark) // restore defaults for later suites
    }
  }

  test("selectivity vs width on a Zipf stream: heavy keys always pass; pass-rate shrinks as width grows") {
    // Zipf(1): key of rank r occurs max(1, N/r) times — 20k distinct
    // keys, a 40-key heavy head at T, and a long tail of singletons
    // (the Heaps-law vocabulary the prefilter exists to prune)
    val N = 2000L
    val zipfT = 50L
    val counts: Map[Long, Long] =
      (1L to 20000L).map(r => r -> math.max(1L, N / r)).toMap
    val heavy = counts.filter(_._2 >= zipfT).keySet
    assert(heavy.size === 40)

    def passRate(width: Int, depth: Int): (Double, Boolean) = {
      // driver-built sketch (same reduce/merge path the Aggregator runs)
      val grid = new Array[Long](depth * width)
      counts.foreach { case (k, n) =>
        var d = 0
        while (d < depth) { grid(d * width + Cms.idx(k, d, width)) += n; d += 1 }
      }
      val admitted = counts.keySet.filter(k => Cms.estimate(depth, width, grid, k) >= zipfT)
      (admitted.size.toDouble / counts.size, heavy.subsetOf(admitted))
    }

    val totalMass = counts.values.sum // ≈ 33.9k
    val widths = Seq(256, 1024, 4096, 16384)
    val rates = widths.map { w =>
      val (rate, noFalseNeg) = passRate(w, 4)
      assert(noFalseNeg, s"width=$w dropped a true heavy hitter")
      rate
    }
    // monotone non-increasing: more counters → fewer light-key collisions
    rates.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
    // the scale caveat, PINNED: at width ≪ totalMass/T (256 ≪ 679) the
    // per-counter mass alone clears T, the estimate saturates, and the
    // prefilter admits EVERYTHING — correct but useless. This is why
    // cms_sketch width must scale with corpus mass, not heavy count.
    assert(rates.head > 0.9,
      s"width=256 should saturate on ${totalMass} mass, admitted only ${rates.head}")
    // the CMS bound (overcount ≤ e·N/width w.h.p.): once width clears
    // e·N/T ≈ ${"1846"} the prefilter prunes hard — the exchange-volume
    // win q106 claims, with graceful degradation in between
    assert(rates(1) < 0.35, s"width=1024 admitted ${rates(1)} — should already prune most of the tail")
    assert(rates(2) < 0.02, s"width=4096 admitted ${rates(2)}")
    assert(rates.last < 0.01, s"width=16384 should be near-exact, admitted ${rates.last}")
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
