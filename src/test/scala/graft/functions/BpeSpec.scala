package graft.functions

import graft.{SparkSpec, Tables}

/** BPE trainer (`Bpe.train/trainOnCorpus/tokenize`): hand-checkable
  * algebra on toy vocabularies, the q95 consistency pin (first merge =
  * the gated pair-statistics argmax), and the segmentation contract.
  */
class BpeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hand-checked toy vocabulary: merges and segmentation") {
    // "aaab": pairs (a,a)x2, (a,b)x1 → first merge (a,a),
    // left-to-right apply gives [aa, a, b]
    val m1 = Bpe.train(Map("aaab" -> 1L), 1)
    assert(m1 === Seq(("a", "a")))
    assert(Bpe.tokenize("aaab", m1) === Seq("aa", "a", "b"))
    // the classic Sennrich shape: es dominates, then est
    val v = Map("newest" -> 6L, "widest" -> 3L, "low" -> 5L, "lower" -> 2L)
    val m = Bpe.train(v, 2)
    assert(m === Seq(("e", "s"), ("es", "t")),
      s"expected (e,s) then (es,t), got $m")
    assert(Bpe.tokenize("newest", m) === Seq("n", "e", "w", "est"))
  }

  test("merges only ever shrink the total symbol count") {
    val v = Map("newest" -> 6L, "widest" -> 3L, "low" -> 5L, "lower" -> 2L)
    def totalSymbols(merges: Seq[(String, String)]): Long =
      v.map { case (w, c) => Bpe.tokenize(w, merges).length.toLong * c }.sum
    val m = Bpe.train(v, 6)
    (0 to m.length).sliding(2).foreach { case Seq(a, b) =>
      assert(totalSymbols(m.take(b)) < totalSymbols(m.take(a)),
        s"merge $b must strictly reduce the corpus symbol count")
    }
  }

  test("tokenization always reassembles the word exactly") {
    val v = Map("newest" -> 6L, "widest" -> 3L, "low" -> 5L, "lower" -> 2L)
    val m = Bpe.train(v, 8)
    v.keys.foreach { w =>
      assert(Bpe.tokenize(w, m).mkString === w, s"lossy segmentation of $w")
    }
  }

  test("first corpus merge equals q95's gated top pair (same statistic, same tie-break)") {
    val docs = Tables.load(spark, sf, "documents")
    val firstMerge = Bpe.trainOnCorpus(docs, "text", 1).head
    val topPair = graft.SparkEntry.queries("q95_bpe_pairs")(spark, sf)
      .head().getString(0)
    assert(firstMerge._1 + firstMerge._2 === topPair,
      s"trainer argmax $firstMerge must be the q95 top row $topPair")
  }

  test("seeded fuzz: segmentation stays lossless and symbol count never grows") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 20).foreach { _ =>
      val vocab = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val merges = Bpe.train(vocab, 1 + rnd.nextInt(10))
      def total(ms: Seq[(String, String)]): Long =
        vocab.map { case (w, c) => Bpe.tokenize(w, ms).length.toLong * c }.sum
      vocab.keys.foreach { w =>
        assert(Bpe.tokenize(w, merges).mkString === w, s"lossy on $w")
      }
      (0 until merges.length).foreach { k =>
        assert(total(merges.take(k + 1)) < total(merges.take(k)),
          "an applied merge must strictly reduce the weighted symbol count")
      }
    }
  }

  test("vocab cap: full-width cap reproduces the uncapped merges; small cap trains on exactly the top-N") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    // ground truth: the full vocabulary, built independently of the cap path
    val full = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a cap at (or above) the true vocab size must change nothing
    val uncapped = Bpe.train(full, 5)
    assert(Bpe.trainOnCorpus(docs, "text", 5, maxVocab = full.size) === uncapped)
    assert(Bpe.trainOnCorpus(docs, "text", 5) === uncapped) // default cap is >> any fixture vocab
    // a small cap must equal training on exactly the top-N words under
    // the same (count desc, word asc) order — i.e. the collect really is
    // the bounded top-N, not an arbitrary subset
    val n = 10
    val topN = full.toSeq.sortBy { case (w, c) => (-c, w) }.take(n).toMap
    assert(Bpe.trainOnCorpus(docs, "text", 3, maxVocab = n) === Bpe.train(topN, 3))
    // min-count floor drops singletons
    val floored = full.filter(_._2 >= 2L)
    assert(Bpe.trainOnCorpus(docs, "text", 3, minCount = 2L) === Bpe.train(floored, 3))
  }

  test("trainer stops early when no pairs remain") {
    val m = Bpe.train(Map("ab" -> 1L), 10)
    // (a,b) merges once; afterwards the vocab is single symbols
    assert(m === Seq(("a", "b")))
  }
}
