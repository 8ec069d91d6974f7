package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) on the
  * corpus the engine just curated — the step after q95's pair
  * statistics: iterate the argmax-merge until the requested vocabulary
  * of merges exists.
  *
  * Scale split (the standard one, used by every production tokenizer
  * trainer): the CORPUS pass is distributed — one word-count aggregation
  * collapses 100 TB of text to the Heaps-law vocabulary frame (sublinear
  * in corpus size; the counts carry all the frequency information BPE
  * needs) — and the merge LOOP is driver-side over that in-memory vocab,
  * because each merge mutates global state (the symbol sequences) that
  * every subsequent pair count depends on. Distributing the loop would
  * shuffle the whole vocab per merge for no parallelism win.
  *
  * Determinism: the argmax tie-breaks by (count desc, pair lexicographic
  * asc) — exactly q95's ordering, so `train(...)`'s first merge IS
  * q95's top row (spec-pinned).
  */
object Bpe {

  /** Train `numMerges` merges from a word → occurrence-count table.
    * Words start as character-symbol sequences; each round merges the
    * most frequent adjacent symbol pair (left-to-right, non-overlapping)
    * in every word.
    */
  def train(wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** Distributed corpus pass + driver merge loop. The driver collect is
    * BOUNDED: only the `maxVocab` most frequent words at or above
    * `minCount` come back (count desc, word asc — deterministic), via
    * orderBy+limit so Spark plans a TakeOrderedAndProject (per-partition
    * bounded heaps, O(maxVocab) driver rows however big the corpus is).
    * An uncapped collect of the distinct-word map is O(10⁸⁺) entries at
    * 100 TB; a frequency floor is standard BPE practice anyway (rare
    * words contribute ~nothing to merge counts), and the default cap
    * (2²⁰ words) already exceeds every production tokenizer's training
    * vocabulary.
    */
  def trainOnCorpus(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20, minCount: Long = 1L): Seq[(String, String)] = {
    require(maxVocab > 0, "maxVocab must be positive")
    val vocab = df.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).count()
      .filter(col("count") >= minCount)
      .orderBy(col("count").desc, col("word"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    train(vocab, numMerges)
  }

  /** Segment a word with a trained merge list (apply merges in training
    * order, left-to-right non-overlapping — the standard BPE apply).
    */
  def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { m => syms = applyMerge(syms, m) }
    syms
  }

  private def applyMerge(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (syms(i) + syms(i + 1))
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }
}
