package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Det, Tables}

/** Round-5 continuation batch: warehouse-history and corpus-analysis
  * operators a production training-data platform runs alongside the
  * curation chain (q64/q68/q82):
  *
  *  - q89: SCD Type-2 dimension history from a change stream — the
  *    classic CDC→warehouse materialization (every Debezium deployment
  *    lands one of these; reference consumers build it downstream of
  *    `pipeline/runner.py`'s sink dispatch).
  *  - q90: token-distribution drift between two corpus slices, in
  *    EXACT integer arithmetic (total-variation numerator) so the
  *    verdict is bit-identical across engines — the "did the new crawl
  *    shift the vocabulary" check run before a mixture re-weighting.
  *  - q91: robust per-domain outlier trim (median + MAD on document
  *    length) — heavy-tail document removal that a fixed z-score would
  *    get wrong on skewed length distributions.
  *  - q92: per-source n-gram novelty — which shard introduces new
  *    content vs repeating what an earlier shard already contributed
  *    (the diminishing-returns curve behind data-buying decisions).
  *
  * Scale design is noted per query; the shared rule: per-source /
  * per-slice frames are bounded by domain cardinality (broadcastable
  * metadata), corpus-sized frames are touched map-side or via one
  * keyed shuffle.
  */
object CurationQueries {
  private type Q = (SparkSession, String) => DataFrame
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- SCD Type-2 history: collapse a per-user change stream into
    //      versioned validity intervals (valid_from/valid_to,
    //      is_current) with per-version event counts. Scale shape: ONE
    //      user-key shuffle — the change-tag window, the version
    //      running sum, the (user, version) aggregate, and the
    //      valid_to lead all cluster on user_id, so EnsureRequirements
    //      satisfies every downstream distribution from the first
    //      exchange (ClusteredDistribution(user, version) is satisfied
    //      by HashPartitioning(user)). No driver state; version ids
    //      are per-key ordinals, not global sequences, exactly so the
    //      op parallelizes by key at any user count. ----
    "q89_scd2_history" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tagged = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
        .withColumn("chg",
          when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("version", sum(col("chg")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
      tagged
        .groupBy(col("user_id"), col("version"), col("event_type").as("status"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("next_from", lead(col("valid_from"), 1).over(wVer))
        .withColumn("is_current", col("next_from").isNull)
        // open-ended versions close at the conventional far-future
        // sentinel rather than NULL, so interval predicates
        // (`BETWEEN valid_from AND valid_to`) need no null branch
        .withColumn("valid_to",
          coalesce(col("next_from"), lit("2100-01-01 00:00:00").cast(TimestampType)))
        .select(col("user_id"), col("version"), col("status"), col("valid_from"),
          col("valid_to"), col("n_events"), col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),
    // ---- token-distribution drift between corpus halves (sources with
    //      even vs odd id): per-token total-variation contribution as
    //      the EXACT BIGINT |c_a·tot_b − c_b·tot_a| (cross-multiplied
    //      so no division happens before the final rounded report
    //      column — both engines agree bit-for-bit), top-32 drifting
    //      tokens. Scale shape: the classic word count (explode →
    //      map-side partial agg on the token key, one shuffle); the
    //      totals are a 1-row aggregate OVER THE FREQUENCY FRAME (never
    //      a second corpus pass) broadcast back; top-k is
    //      TakeOrderedAndProject. At extreme corpus sizes the BIGINT
    //      cross-product would overflow (c·tot ≈ 1e24 at 100 TB) — the
    //      production swap is DECIMAL(38,0) accumulation; the gate pins
    //      the exact-integer form at fixture scale. ----
    "q90_token_drift" -> ((s, dir) => {
      val freq = Tables.load(s, dir, "documents")
        .select((expr("CAST(substring(source, 4) AS INT) % 2") === 0).as("in_a"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
      val tot = freq.agg(sum(col("c_a")).as("tot_a"), sum(col("c_b")).as("tot_b"))
      freq.crossJoin(broadcast(tot))
        .withColumn("drift_num",
          abs(col("c_a") * col("tot_b") - col("c_b") * col("tot_a")))
        .withColumn("p_delta", dround(
          col("drift_num").cast(DoubleType) /
            (col("tot_a") * col("tot_b")).cast(DoubleType), 8))
        .orderBy(col("drift_num").desc, col("tok"))
        .limit(32)
        .select(col("tok"), col("c_a"), col("c_b"), col("drift_num"), col("p_delta"))
        .orderBy(col("drift_num").desc, col("tok"))
    }),
    // ---- (the DECIMAL(38,0) production form of the drift arithmetic
    //      lives in `tokenDriftDecimal` below; the gated row keeps the
    //      exact-BIGINT form, the spec pins both equal at fixture
    //      scale) ----
    // ---- robust per-domain outlier trim: flag documents whose length
    //      deviates from the SOURCE median by more than 2× the median
    //      absolute deviation — the heavy-tail document filter (a
    //      mean/stddev cut would let one 10 MB document inflate its own
    //      domain's threshold). Exact `percentile` keeps the gate
    //      deterministic: medians of integer lengths are integers or
    //      exact halves, so every comparison is portable IEEE
    //      arithmetic. Scale shape: two aggregations to SOURCE
    //      granularity (20 rows at any corpus size) broadcast back onto
    //      a 3-column pruned scan; at extreme per-domain volume the
    //      production swap is approx_percentile — the gate pins the
    //      exact form. ----
    "q91_outlier_trim" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val med = docs.groupBy(col("source"))
        .agg(expr("percentile(n_chars, 0.5)").as("med_chars"))
      val dev = docs.join(broadcast(med), "source")
        .withColumn("adev", abs(col("n_chars").cast(DoubleType) - col("med_chars")))
      val mad = dev.groupBy(col("source"))
        .agg(expr("percentile(adev, 0.5)").as("mad_chars"))
      dev.join(broadcast(mad), "source")
        .filter(col("adev") > lit(2.0) * col("mad_chars"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          dround(col("med_chars"), 4).as("med_chars"),
          dround(col("mad_chars"), 4).as("mad_chars"))
        .orderBy(col("doc_id"))
    }),
    // ---- Bloom-prefiltered decontamination: the q68 semantics (drop
    //      any training doc sharing a 4-gram with the eval slice) under
    //      the plan that survives an eval set TOO LARGE to broadcast as
    //      an exact hash relation: the eval grams build a spark-sketch
    //      BloomFilter (bits broadcast via a plan literal — ~10
    //      bits/key vs 8+ bytes/key for the exact set), the corpus
    //      gram stream is pruned MAP-SIDE through the native
    //      `bloom_might_contain` probe inside whole-stage codegen, and
    //      only the surviving sliver reaches the exact confirm join.
    //      No false negatives, so the RESULT is exact — the sketch
    //      parameters tune cost, never correctness — which is why the
    //      same plain NOT-EXISTS oracle gates it. Output is the keep
    //      side (the clean training corpus), complementing q68/q86
    //      which report the contaminated rows. ----
    "q88_decontaminate_bloom" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val evalGrams = LlmTextQueries.evalGramSet(s, dir)
      val bloomBytes: Array[Byte] = {
        // eval-side build (distributed treeAggregate inside stat.bloomFilter);
        // the serialized bits are O(capacity) driver metadata, the same
        // budget class as the IVF centroids
        val bf = evalGrams.stat.bloomFilter("g", 1 << 16, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        bos.toByteArray
      }
      val train = Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 100 >= 5)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      val contaminated = train
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"), explode(expr("ngram_hashes(toks, 4, 0)")).as("g"))
        .filter(call_function("bloom_might_contain", lit(bloomBytes), col("g")))
        .join(evalGrams, "g")
        .select(col("doc_id")).distinct()
      train
        .select(col("doc_id"), col("source"), size(col("toks")).as("n_tokens"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),
    // ---- per-source n-gram novelty: scanning the corpus in doc_id
    //      order, which source INTRODUCES each distinct 4-gram vs
    //      repeating one an earlier document already contributed — the
    //      diminishing-returns measure for acquiring another shard of
    //      the same domain. Scale shape: per-doc distinct grams from
    //      `ngram_hashes` map-side; first-occurrence attribution rides
    //      the gram-key aggregation itself (no join of the gram frame
    //      back to the corpus) — and instead of min_by(source, doc_id),
    //      whose string buffer demotes the agg to SortAggregate (two
    //      full sorts of the gram stream), (doc_id, source-id) packs
    //      into ONE BIGINT so the first-occurrence agg is a
    //      hash-aggregable min(long) with map-side partials; instance
    //      counts aggregate the same exploded frame to source
    //      granularity (20 rows). ----
    "q92_gram_novelty" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val grams = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("CAST(substring(source, 4) AS INT)").as("src_n"),
          col("source"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"), col("src_n"), col("source"),
          explode(expr("ngram_hashes(toks, 4, 0)")).as("g"))
      val novel = grams
        // doc_id is the high-order part, so min(packed) is the packed
        // minimum doc_id; 1024 bounds the source-id space (doc ids stay
        // < 2^53 at any plausible corpus size, so no overflow)
        .select(col("g"), (col("doc_id") * 1024L + col("src_n")).as("packed"))
        .groupBy(col("g"))
        .agg(min(col("packed")).as("mp"))
        .select(concat(lit("src"), (col("mp") % 1024L).cast(StringType)).as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("novel_grams"))
      grams.groupBy(col("source"))
        .agg(count(lit(1)).as("gram_instances"))
        .join(novel, Seq("source"), "left")
        .withColumn("novel_grams", coalesce(col("novel_grams"), lit(0L)))
        .withColumn("novelty", dround(
          col("novel_grams").cast(DoubleType) / col("gram_instances").cast(DoubleType), 6))
        .select(col("source"), col("gram_instances"), col("novel_grams"), col("novelty"))
        .orderBy(col("source"))
    }),
    // ---- cross-document span deduplication with text reconstruction
    //      (CCNet/FineWeb line-dedup re-expressed over fixed 8-token
    //      spans — fixture text is single-line): the corpus is cut into
    //      consecutive non-overlapping spans; an occurrence survives iff
    //      it is the FIRST occurrence of that span content corpus-wide
    //      (scanning in (doc_id, span_idx) order), and each document's
    //      surviving text is reassembled, reported as an md5 so result
    //      rows stay fixed-width. Scale shape: the span frame is
    //      corpus-token volume but every wire key is the 60-bit md5 gram
    //      id (no string keys shuffle); first-occurrence attribution is
    //      a hash-aggregable min(long) over the packed (doc_id,
    //      span_idx) — q92's packing trick — the attribution joins back
    //      co-partitioned on the same hash key, and reassembly is one
    //      doc_id shuffle. No sort of the span stream; the per-doc
    //      ordered concat sorts only each doc's own surviving spans. ----
    "q93_span_dedup" -> ((s, dir) => {
      val L = 8
      val spans = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, (size(toks)-1) div $L), i -> array_join(slice(toks, i*$L+1, $L), ' '))"))
          .as(Seq("span_idx", "span")))
        .withColumn("h", expr("CAST(conv(substring(md5(span), 1, 15), 16, 10) AS BIGINT)"))
        // doc_id is the high-order part so min(packed) is the earliest
        // (doc, span) occurrence; 2^20 bounds span_idx (an 8M-token doc
        // before overflow; doc ids stay < 2^43)
        .withColumn("packed", col("doc_id") * lit(1048576L) + col("span_idx"))
      val firstOcc = spans.groupBy(col("h")).agg(min(col("packed")).as("mp"))
      spans.join(firstOcc, "h")
        .withColumn("keep", col("packed") === col("mp"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_spans"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("keep"), struct(col("span_idx"), col("span"))))),
            x => x.getField("span")), " ")).as("text_hash"))
        .orderBy(col("doc_id"))
    }),
    // ---- embedding covariance via one shuffle-free treeAggregate pass
    //      (the distributed Gramian pattern, `Pca.moments`): every
    //      partition folds its rows into d + d(d+1)/2 exact BIGINT sums
    //      on a 1e-8 quantization grid, partials merge log-depth, and
    //      the driver assembles the d×d covariance from O(d²) integers
    //      (metadata, not data — the MLlib RowMatrix shape). The gate
    //      emits the upper triangle (i, j, q_sum, cov): q_sum pins the
    //      exact integer accumulation, cov pins the IEEE assembly the
    //      DuckDB twin reproduces operand-for-operand. Downstream
    //      (spec-tested, driver-side O(d³)): Jacobi eigensolve →
    //      whitening/projection as map-side literal HOFs (`Pca.fit` /
    //      `Pca.transform`). ----
    "q94_embed_covariance" -> ((s, dir) => {
      val d = 64
      val (n, s1, s2) = graft.functions.Pca.moments(
        Tables.load(s, dir, "embeddings"), "embedding", d)
      val rows = for {
        i <- 0 until d
        j <- i until d
      } yield {
        val k = i * d - i * (i - 1) / 2 + (j - i)
        org.apache.spark.sql.Row(i, j, s2(k),
          graft.Det.droundD(graft.functions.Pca.covEntry(n, s1, s2, d, i, j), 8))
      }
      val schema = StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("q_sum", LongType, nullable = false),
        StructField("cov", DoubleType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy(col("i"), col("j"))
    }),
    // ---- BPE merge-pair statistics (tokenizer training, step 1): the
    //      frequency of every adjacent character pair across the
    //      corpus, weighted by word occurrence — the argmax of this
    //      table IS the first BPE merge, and iterating it is how a
    //      tokenizer vocabulary is trained on the corpus the engine
    //      just curated. Scale shape: the corpus collapses to the
    //      VOCAB frame first (word → count, map-side partial agg — the
    //      distinct-word space is Heaps-law sublinear in corpus size
    //      and is the standard working set of distributed BPE), and
    //      the character-pair explode runs over vocab rows only,
    //      weighted by the carried count; top-32 is
    //      TakeOrderedAndProject (no global sort). ----
    "q95_bpe_pairs" -> ((s, dir) => {
      val vocab = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n_w"))
      vocab
        // 1-char words carry no pairs; the filter also dodges Spark's
        // sequence(1, 0) step-inference (it would count DOWN)
        .filter(length(col("word")) >= 2)
        .select(col("n_w"), explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n_w")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(32)
    }),
    // ---- BPE trainer (tokenizer training, step 2): the first 16
    //      merges from iterating q95's argmax — `Bpe.trainOnCorpus`'s
    //      distributed corpus pass (word-count agg, the Heaps-law
    //      vocab frame) + driver merge loop, now under the hash gate
    //      end-to-end. The oracle unrolls the 16 rounds as chained
    //      CTEs: state = each word's symbol sequence as a
    //      double-space-delimited padded string, so applying a merge
    //      is ONE `replace(' l  r ', ' lr ')` — SQL replace scans
    //      left-to-right non-overlapping, which IS the BPE greedy
    //      apply, and the padding makes partial-symbol matches
    //      impossible (symbols never contain spaces). ----
    "q113_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Bpe
        .trainOnCorpus(Tables.load(s, dir, "documents"), "text", numMerges = BpeGateMerges)
        .zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }
        .toDF("round", "lhs", "rhs")
    }),
    // ---- BPE tokenizer APPLICATION (tokenizer training, step 3): the
    //      per-document token count under the q113-trained tokenizer —
    //      the number that actually prices a document into a training
    //      budget (whitespace counts like q44 under-count subword
    //      splits). Scale shape: tokenization runs on the Heaps-law
    //      VOCAB frame, not the corpus — each distinct word's padded
    //      char string flows through 16 chained codegen'd `replace`
    //      calls (the q113 merge-apply, literal merges baked into the
    //      plan), then the per-word token counts BROADCAST onto the
    //      doc word stream and sum per doc. Tokenizer cost is O(vocab)
    //      however big the corpus; the corpus pays one explode + one
    //      doc-keyed aggregation. ----
    "q115_bpe_token_count" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val merges = graft.functions.Bpe
        .trainOnCorpus(docs, "text", numMerges = BpeGateMerges)
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val vocab = words.select(col("word")).distinct().filter(length(col("word")) >= 1)
      val start = concat(lit(" "),
        array_join(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"), "  "),
        lit(" "))
      val tokenized = merges.foldLeft(start) { case (st, (l, r)) =>
        call_function("replace", st, lit(s" $l  $r "), lit(s" $l$r "))
      }
      val tok = vocab.select(col("word"), size(split(trim(tokenized), "  ")).as("n"))
      words.join(broadcast(tok), "word")
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),
    // ---- embedding outlier scores (diagonal Mahalanobis): per-vector
    //      Σ_i (x_i − μ_i)² / σ²_i against the corpus statistics — the
    //      corrupt/out-of-distribution vector screen run before
    //      embeddings feed semantic dedup or ANN serving. Scale shape:
    //      the classic two-pass standardization — pass 1 is q94's
    //      shuffle-free quantized treeAggregate (O(d²) driver
    //      metadata), pass 2 is purely map-side (μ/σ² ride as array
    //      LITERALS inside codegen'd zip_with/aggregate HOFs); each
    //      per-dimension term is quantized to BIGINT before the
    //      per-row sum so the score is accumulation-order-free, and
    //      top-32 is TakeOrderedAndProject on the exact integer. ----
    // ---- embedding-space class separability (Fisher scatter): per
    //      label, the within-class variance trace and the squared
    //      centroid distance to the global mean — the "are these
    //      classes actually separated in embedding space" health check
    //      run before trusting labels for curation or eval. Scale
    //      shape: the 64-way posexplode partial-aggregates to
    //      (label × dim) granularity BEFORE its exchange (HashAggregate
    //      partial mode — the wire carries per-partition partials of a
    //      ~hundreds-row frame, not corpus×64 rows), the global per-dim
    //      frame is a 64-row broadcast, and every trace term quantizes
    //      to BIGINT before the per-label sum so assembly is
    //      accumulation-order-free in both engines. ----
    "q97_class_scatter" -> ((s, dir) => {
      val pli = Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("label"), col("i"),
          floor(col("x").cast(DoubleType) * lit(1e8) + lit(0.5)).cast(LongType).as("q1"),
          floor(col("x").cast(DoubleType) * col("x").cast(DoubleType) * lit(1e8) + lit(0.5))
            .cast(LongType).as("q2"))
        .groupBy(col("label"), col("i"))
        .agg(sum(col("q1")).as("s1"), sum(col("q2")).as("s2"), count(lit(1)).as("n"))
      val gi = pli.groupBy(col("i"))
        .agg(sum(col("s1")).as("gs1"), sum(col("n")).as("gn"))
      val ml = (col("s1").cast(DoubleType) / lit(1e8)) / col("n").cast(DoubleType)
      val mg = (col("gs1").cast(DoubleType) / lit(1e8)) / col("gn").cast(DoubleType)
      val ex2 = (col("s2").cast(DoubleType) / lit(1e8)) / col("n").cast(DoubleType)
      pli.join(broadcast(gi), "i")
        .select(col("label"), col("n"),
          floor((ex2 - ml * ml) * lit(1e8) + lit(0.5)).cast(LongType).as("tw"),
          floor((ml - mg) * (ml - mg) * lit(1e8) + lit(0.5)).cast(LongType).as("tb"))
        .groupBy(col("label"))
        .agg(min(col("n")).as("n_vecs"),
          dround(sum(col("tw")).cast(DoubleType) / lit(1e8), 6).as("within_trace"),
          dround(sum(col("tb")).cast(DoubleType) / lit(1e8), 6).as("between_dist2"))
        .orderBy(col("label"))
    }),
    // ---- collocation mining: the corpus's most-associated adjacent
    //      token pairs by LIFT = P(ab) / (P(a)·P(b)) — the monotone
    //      log-free transform of PMI (log is not bit-portable across
    //      engines; lift ranks identically), the standard phrase-mining
    //      statistic for tokenizer/vocab decisions. Exact integer
    //      counts cross-multiply into one IEEE division both engines
    //      perform on identical operands. Scale shape: bigram and
    //      unigram counts are two-phase word-count aggs; the unigram
    //      frame is Heaps-law vocab-sized and broadcasts onto the
    //      bigram frame twice; top-32 is TakeOrderedAndProject. ----
    "q104_collocations" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      val totalN = toks.select(sum(size(col("toks"))).as("n")).as("t")
      val bi = toks
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))"))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      bi
        .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_a"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_b"))), "w2")
        .crossJoin(broadcast(totalN))
        .select(col("w1"), col("w2"), col("n_ab"),
          dround((col("n_ab") * col("n")).cast(DoubleType) /
            (col("n_a") * col("n_b")).cast(DoubleType), 8).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(32)
    }),
    // ---- incremental dedup: the production INGESTION shape — a small
    //      incoming batch (doc_id % 10 = 0, ~10%) dedups against the
    //      accumulated history AND itself, without ever shuffling the
    //      history: the batch's distinct hash set broadcasts, ONE
    //      history scan probes it map-side (BroadcastHashJoin, streamed
    //      side = history), and the surviving hit-set — bounded by the
    //      batch size — broadcasts back onto the batch. In-batch
    //      first-occurrence is a batch-sized agg. At 100 TB of history
    //      this plan touches it once, sequentially, with zero history
    //      exchanges — the property that makes per-batch ingestion
    //      dedup affordable at all. History-dup outranks batch-dup. ----
    // ---- pairwise source-overlap matrix: for every shard pair, how
    //      many distinct 4-grams they SHARE, plus the overlap
    //      coefficient (shared / min(|A|, |B|)) — the "are we about to
    //      buy a shard we already have" decision table that complements
    //      q92's first-occurrence novelty curve. Scale shape: the
    //      corpus collapses to DISTINCT (source, gram) pairs first
    //      (map-side partial dedup on an 8-byte hash); the self-join
    //      co-partitions on the gram key and its output is bounded by
    //      Σ_g |sources(g)|² ≤ grams × domains² — domain count, not
    //      corpus size, caps the blow-up; per-source totals ride a
    //      domain-cardinality broadcast. ----
    "q102_source_overlap" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val gs = Tables.load(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(col("source"), explode(expr("ngram_hashes(toks, 4, 0)")).as("g"))
        .distinct()
      val tot = gs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val shared = gs.as("a").join(gs.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared_grams"))
      shared
        .join(broadcast(tot.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
        .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          dround(col("shared_grams").cast(DoubleType) /
            least(col("n_a"), col("n_b")).cast(DoubleType), 6).as("overlap"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    "q100_incremental_dedup" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val batch = d.filter(col("doc_id") % 10 === 0)
      val hist = d.filter(col("doc_id") % 10 =!= 0)
      val batchHashes = batch.select(col("h")).distinct()
      val hitHashes = hist.join(broadcast(batchHashes), "h")
        .select(col("h")).distinct()
        .withColumn("in_hist", lit(true))
      val firstInBatch = batch.groupBy(col("h")).agg(min(col("doc_id")).as("first_id"))
      batch
        .join(broadcast(hitHashes), Seq("h"), "left")
        .join(broadcast(firstInBatch), "h")
        .select(col("doc_id"),
          when(col("in_hist"), lit("dup_history"))
            .when(col("first_id") < col("doc_id"), lit("dup_batch"))
            .otherwise(lit("new")).as("status"),
          when(col("in_hist").isNull && (col("first_id") < col("doc_id")),
            col("first_id")).as("dup_of"))
        .orderBy(col("doc_id"))
    }),
    "q96_embed_outliers" -> ((s, dir) => {
      graft.functions.Pca
        .diagMahalanobisScore(Tables.load(s, dir, "embeddings"), "embedding", 64)
        .select(col("vec_id"), col("label"), col("q_score"))
        .orderBy(col("q_score").desc, col("vec_id"))
        .limit(32)
        .withColumn("score", dround(col("q_score").cast(DoubleType) / lit(1e8), 6))
        .select(col("vec_id"), col("label"), col("q_score"), col("score"))
    }),
    // ---- PCA projection + whitening, DRIVER-GATED (q94 gates the
    //      distributed moments; this row gates `Pca.fit` →
    //      `Pca.signFixed` → `Pca.transform` end-to-end): 2-D PCA over
    //      the first two embedding coordinates, because a 2×2
    //      eigensolve has a closed form a SQL twin can reproduce
    //      operand-for-operand (one Jacobi rotation, which is exact for
    //      d = 2 — the oracle mirrors the rotation's FP sequence; a
    //      64-D Jacobi sweep has no SQL expression, which is why d>2
    //      fit stays spec-gated in PcaSpec). Emits each vector's
    //      projection onto both principal axes plus the whitened first
    //      coordinate; eigenvector sign pinned first-nonzero-positive
    //      on both sides. Scale shape: fit is the q94 treeAggregate
    //      (shuffle-free, O(d²) driver metadata), transform is
    //      map-side literal HOFs — zero exchanges before the final
    //      presentation sort. ----
    "q105_pca_project" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), expr("slice(embedding, 1, 2)").as("e2"))
      val model = graft.functions.Pca.signFixed(
        graft.functions.Pca.fit(emb, "e2", 2))
      val proj = graft.functions.Pca
        .transform(emb, "e2", model, k = 2, whiten = false, outCol = "proj")
      graft.functions.Pca
        .transform(proj, "e2", model, k = 1, whiten = true, outCol = "wproj")
        .select(col("vec_id"),
          dround(element_at(col("proj"), 1), 6).as("p1"),
          dround(element_at(col("proj"), 2), 6).as("p2"),
          dround(element_at(col("wproj"), 1), 6).as("w1"))
        .orderBy(col("vec_id"))
    }))

  /** q90's PRODUCTION arithmetic: identical plan shape (one token
    * shuffle, 1-row broadcast totals, TakeOrderedAndProject), but the
    * cross-products `c·tot` accumulate in DECIMAL(38,0) instead of
    * BIGINT. At 100 TB the BIGINT form wraps (c·tot ≈ 1e24 > 2⁶³);
    * 38 decimal digits hold products to ~1e38 — beyond any corpus. The
    * decimal compare/sort is exact, so the top-32 verdict is identical
    * wherever both forms are in range (spec-pinned equal at fixture
    * scale in ScaleDesignSpec); only `drift_num`'s column TYPE differs,
    * which is the honest production contract — a value that can exceed
    * 2⁶³ cannot ship as a BIGINT.
    */
  def tokenDriftDecimal(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val freq = Tables.load(s, dir, "documents")
      .select((expr("CAST(substring(source, 4) AS INT) % 2") === 0).as("in_a"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
    val tot = freq.agg(sum(col("c_a")).as("tot_a"), sum(col("c_b")).as("tot_b"))
    freq.crossJoin(broadcast(tot))
      .withColumn("drift_num",
        abs(col("c_a").cast(dec) * col("tot_b").cast(dec) -
          col("c_b").cast(dec) * col("tot_a").cast(dec)).cast(dec))
      .withColumn("p_delta", dround(
        col("drift_num").cast(DoubleType) /
          (col("tot_a").cast(dec) * col("tot_b").cast(dec)).cast(DoubleType), 8))
      .orderBy(col("drift_num").desc, col("tok"))
      .limit(32)
      .select(col("tok"), col("c_a"), col("c_b"), col("drift_num"), col("p_delta"))
      .orderBy(col("drift_num").desc, col("tok"))
  }

  private val R = droundSql

  /** Merges the q113 gate pins (small enough that the unrolled oracle
    * stays readable; every extra round is one more CTE pair).
    */
  val BpeGateMerges = 16

  /** The shared BPE CTE chain (q113 + q115 twins): BPE over the q95
    * vocab, one CTE pair per round — `p{k}` picks the argmax pair
    * (count desc, pair asc — q95's ordering), `s{k}` applies it via
    * padded-string replace. The `word` column threads through the
    * state chain so downstream consumers (q115) can map final symbol
    * sequences back to words. Every CTE is MATERIALIZED: `p{k}` is
    * referenced three times by `s{k}` and DuckDB inlines
    * multi-referenced CTEs (the q109 lesson — the 16-round chain
    * would re-execute combinatorially).
    */
  private def bpeChainCtes: String = {
    val rounds = (1 to BpeGateMerges).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS MATERIALIZED (
        SELECT l, r FROM (
          SELECT p.l AS l, p.r AS r, sum(cnt) AS c FROM (
            SELECT unnest(list_transform(range(1, len(sy)),
                     i -> {'l': sy[i], 'r': sy[i + 1]})) AS p, cnt
            FROM (SELECT string_split(trim(state, ' '), '  ') AS sy, cnt FROM $prev))
          GROUP BY 1, 2)
        ORDER BY c DESC, l, r LIMIT 1),
      s$k AS MATERIALIZED (
        SELECT word, replace(state,
            ' ' || (SELECT l FROM p$k) || '  ' || (SELECT r FROM p$k) || ' ',
            ' ' || (SELECT l FROM p$k) || (SELECT r FROM p$k) || ' ') AS state, cnt
        FROM $prev)"""
    }.mkString(",\n      ")
    s"""w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      v AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word),
      s0 AS MATERIALIZED (
        SELECT word, ' ' || array_to_string(
            list_transform(range(1, length(word) + 1), i -> substr(word, CAST(i AS INT), 1)),
            '  ') || ' ' AS state, cnt
        FROM v WHERE length(word) >= 1),
      $rounds"""
  }

  private def bpeMergesOracleSql: String =
    s"""
      WITH $bpeChainCtes
      ${(1 to BpeGateMerges).map(k =>
        s"SELECT $k AS round, l AS lhs, r AS rhs FROM p$k").mkString("\n      UNION ALL\n      ")}
      ORDER BY round"""

  /** The q115 twin: final symbol-sequence lengths per WORD off the
    * shared chain's last state, joined back to the doc word stream.
    */
  private def bpeTokenCountOracleSql: String =
    s"""
      WITH $bpeChainCtes,
      tok AS MATERIALIZED (
        SELECT word, len(string_split(trim(state, ' '), '  ')) AS n
        FROM s$BpeGateMerges)
      SELECT w.doc_id, CAST(sum(t.n) AS BIGINT) AS n_tokens
      FROM w JOIN tok t ON w.word = t.word
      GROUP BY w.doc_id
      ORDER BY w.doc_id"""

  val oracle: Map[String, String] = Map(
    "q113_bpe_merges" -> bpeMergesOracleSql,
    "q115_bpe_token_count" -> bpeTokenCountOracleSql,
    "q89_scd2_history" -> """
      WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
               THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      versioned AS (
        SELECT user_id, ts, event_type,
          CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        FROM tagged),
      versions AS (
        SELECT user_id, version, event_type AS status,
          min(ts) AS valid_from, count(*) AS n_events
        FROM versioned
        GROUP BY user_id, version, event_type)
      SELECT user_id, version, status, valid_from,
        COALESCE(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
          TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
        n_events,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
      FROM versions
      ORDER BY user_id, version""",
    "q90_token_drift" -> s"""
      WITH freq AS (
        SELECT tok,
          CAST(sum(CASE WHEN slice_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
          CAST(sum(CASE WHEN slice_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        FROM (
          SELECT CAST(substr(source, 4) AS INT) % 2 = 0 AS slice_a,
            unnest(string_split(text, ' ')) AS tok
          FROM documents)
        GROUP BY tok),
      tot AS (
        SELECT CAST(sum(c_a) AS BIGINT) AS tot_a, CAST(sum(c_b) AS BIGINT) AS tot_b
        FROM freq)
      SELECT tok, c_a, c_b,
        abs(c_a * tot_b - c_b * tot_a) AS drift_num,
        ${R("CAST(abs(c_a * tot_b - c_b * tot_a) AS DOUBLE) / CAST(tot_a * tot_b AS DOUBLE)", 8)} AS p_delta
      FROM freq, tot
      ORDER BY drift_num DESC, tok
      LIMIT 32""",
    "q91_outlier_trim" -> s"""
      WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med_chars
        FROM documents GROUP BY source),
      dev AS (
        SELECT d.doc_id, d.source, d.n_chars, m.med_chars,
          abs(CAST(d.n_chars AS DOUBLE) - m.med_chars) AS adev
        FROM documents d JOIN med m USING (source)),
      mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad_chars
        FROM dev GROUP BY source)
      SELECT doc_id, dev.source, n_chars,
        ${R("med_chars", 4)} AS med_chars,
        ${R("mad_chars", 4)} AS mad_chars
      FROM dev JOIN mad USING (source)
      WHERE adev > 2.0 * mad_chars
      ORDER BY doc_id""",
    "q88_decontaminate_bloom" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 4),
      g AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(len(toks) - 3),
          i -> CAST('0x' || substr(md5(toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]), 1, 15) AS BIGINT)))) AS g
        FROM t),
      ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 < 5),
      contam AS (
        SELECT DISTINCT doc_id FROM g JOIN ev USING (g) WHERE doc_id % 100 >= 5)
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      FROM documents d
      WHERE doc_id % 100 >= 5
        AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
      ORDER BY doc_id""",
    "q92_gram_novelty" -> s"""
      WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 4),
      g AS (
        SELECT doc_id, source, unnest(list_distinct(list_transform(
          range(len(toks) - 3),
          i -> CAST('0x' || substr(md5(toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]), 1, 15) AS BIGINT)))) AS g
        FROM t),
      novel AS (
        SELECT src AS source, count(*) AS novel_grams
        FROM (SELECT g, arg_min(source, doc_id) AS src FROM g GROUP BY g)
        GROUP BY src),
      inst AS (
        SELECT source, count(*) AS gram_instances FROM g GROUP BY source)
      SELECT inst.source, gram_instances,
        CAST(COALESCE(novel_grams, 0) AS BIGINT) AS novel_grams,
        ${R("CAST(COALESCE(novel_grams, 0) AS DOUBLE) / gram_instances", 6)} AS novelty
      FROM inst LEFT JOIN novel ON inst.source = novel.source
      ORDER BY inst.source""",
    "q93_span_dedup" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      e AS (SELECT doc_id, toks, unnest(range((len(toks)-1)//8 + 1)) AS span_idx FROM t),
      g AS (SELECT doc_id, span_idx,
              array_to_string(toks[span_idx*8+1 : span_idx*8+8], ' ') AS span,
              doc_id * 1048576 + span_idx AS packed
            FROM e),
      k AS (SELECT doc_id, span_idx, span, packed,
              CAST('0x' || substr(md5(span), 1, 15) AS BIGINT) AS h FROM g),
      f AS (SELECT h, min(packed) AS mp FROM k GROUP BY h)
      SELECT k.doc_id,
        CAST(count(*) AS BIGINT) AS n_spans,
        CAST(sum(CASE WHEN packed = mp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(CASE WHEN packed = mp THEN span END, ' ' ORDER BY span_idx), '')) AS text_hash
      FROM k JOIN f USING (h)
      GROUP BY k.doc_id
      ORDER BY k.doc_id""",
    "q94_embed_covariance" -> """
      WITH v AS (SELECT embedding AS e FROM embeddings),
      cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM v),
      lin AS (
        SELECT i, CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS si
        FROM v CROSS JOIN range(64) a(i) GROUP BY i),
      quad AS (
        SELECT i, j, CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * CAST(e[j+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS sq
        FROM v CROSS JOIN range(64) a(i) CROSS JOIN range(64) b(j)
        WHERE i <= j GROUP BY i, j)
      SELECT CAST(q.i AS INT) AS i, CAST(q.j AS INT) AS j, sq AS q_sum,
        floor((((CAST(sq AS DOUBLE) / 1e8) / nn)
               - ((CAST(li.si AS DOUBLE) / 1e8) / nn) * ((CAST(lj.si AS DOUBLE) / 1e8) / nn)) * 1e8 + 0.5) / 1e8 AS cov
      FROM quad q
      JOIN lin li ON li.i = q.i
      JOIN lin lj ON lj.i = q.j
      CROSS JOIN cnt
      ORDER BY q.i, q.j""",
    "q95_bpe_pairs" -> """
      WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      v AS (SELECT word, count(*) AS n_w FROM w GROUP BY word),
      e AS (SELECT word, n_w, unnest(range(1, length(word))) AS i FROM v),
      p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, n_w FROM e)
      SELECT pair, CAST(sum(n_w) AS BIGINT) AS cnt FROM p
      GROUP BY pair
      ORDER BY cnt DESC, pair
      LIMIT 32""",
    "q96_embed_outliers" -> """
      WITH v AS (SELECT vec_id, label, embedding AS e FROM embeddings),
      cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM v),
      lin AS (
        SELECT i, CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS si
        FROM v CROSS JOIN range(64) a(i) GROUP BY i),
      diag AS (
        SELECT i, CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * CAST(e[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS sq
        FROM v CROSS JOIN range(64) a(i) GROUP BY i),
      stats AS (
        SELECT lin.i,
          (CAST(si AS DOUBLE) / 1e8) / nn AS m,
          greatest(((CAST(sq AS DOUBLE) / 1e8) / nn)
                   - ((CAST(si AS DOUBLE) / 1e8) / nn) * ((CAST(si AS DOUBLE) / 1e8) / nn), 1e-12) AS veff
        FROM lin JOIN diag ON lin.i = diag.i CROSS JOIN cnt),
      terms AS (
        SELECT vec_id, label,
          CAST(floor((CAST(e[s.i+1] AS DOUBLE) - m) * (CAST(e[s.i+1] AS DOUBLE) - m) / veff * 1e8 + 0.5) AS BIGINT) AS t
        FROM v CROSS JOIN stats s)
      SELECT vec_id, label, CAST(sum(t) AS BIGINT) AS q_score,
        floor(CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1e8 * 1e6 + 0.5) / 1e6 AS score
      FROM terms GROUP BY vec_id, label
      ORDER BY q_score DESC, vec_id
      LIMIT 32""",
    "q97_class_scatter" -> """
      WITH v AS (SELECT label, embedding AS e FROM embeddings),
      pli AS (
        SELECT label, i,
          CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
          CAST(sum(CAST(floor(CAST(e[i+1] AS DOUBLE) * CAST(e[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
          CAST(count(*) AS BIGINT) AS n
        FROM v CROSS JOIN range(64) a(i)
        GROUP BY label, i),
      gi AS (
        SELECT i, CAST(sum(s1) AS BIGINT) AS gs1, CAST(sum(n) AS BIGINT) AS gn
        FROM pli GROUP BY i),
      terms AS (
        SELECT label, n,
          CAST(floor((((CAST(s2 AS DOUBLE) / 1e8) / n)
                      - ((CAST(s1 AS DOUBLE) / 1e8) / n) * ((CAST(s1 AS DOUBLE) / 1e8) / n)) * 1e8 + 0.5) AS BIGINT) AS tw,
          CAST(floor((((CAST(s1 AS DOUBLE) / 1e8) / n) - ((CAST(gs1 AS DOUBLE) / 1e8) / gn))
                     * (((CAST(s1 AS DOUBLE) / 1e8) / n) - ((CAST(gs1 AS DOUBLE) / 1e8) / gn)) * 1e8 + 0.5) AS BIGINT) AS tb
        FROM pli JOIN gi USING (i))
      SELECT label, min(n) AS n_vecs,
        floor(CAST(CAST(sum(tw) AS BIGINT) AS DOUBLE) / 1e8 * 1e6 + 0.5) / 1e6 AS within_trace,
        floor(CAST(CAST(sum(tb) AS BIGINT) AS DOUBLE) / 1e8 * 1e6 + 0.5) / 1e6 AS between_dist2
      FROM terms GROUP BY label
      ORDER BY label""",
    "q100_incremental_dedup" -> """
      WITH d AS (
        SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
        FROM documents),
      b AS (SELECT * FROM d WHERE doc_id % 10 = 0),
      hset AS (SELECT DISTINCT h FROM d WHERE doc_id % 10 <> 0),
      fb AS (SELECT h, min(doc_id) AS first_id FROM b GROUP BY h)
      SELECT b.doc_id,
        CASE WHEN hset.h IS NOT NULL THEN 'dup_history'
             WHEN fb.first_id < b.doc_id THEN 'dup_batch'
             ELSE 'new' END AS status,
        CASE WHEN hset.h IS NULL AND fb.first_id < b.doc_id THEN fb.first_id END AS dup_of
      FROM b
      LEFT JOIN hset ON b.h = hset.h
      JOIN fb ON b.h = fb.h
      ORDER BY b.doc_id""",
    "q102_source_overlap" -> s"""
      WITH t AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 4),
      g AS (
        SELECT DISTINCT source, unnest(list_distinct(list_transform(
          range(len(toks) - 3),
          i -> CAST('0x' || substr(md5(toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]), 1, 15) AS BIGINT)))) AS gram
        FROM t),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
      p AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS shared_grams
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY a.source, b.source)
      SELECT src_a, src_b, shared_grams,
        ${R("CAST(shared_grams AS DOUBLE) / CAST(least(ta.n, tb.n) AS DOUBLE)", 6)} AS overlap
      FROM p
      JOIN tot ta ON ta.source = p.src_a
      JOIN tot tb ON tb.source = p.src_b
      ORDER BY src_a, src_b""",
    "q104_collocations" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_w
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
      tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n FROM t),
      bi AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab FROM (
          SELECT toks[i] AS w1, toks[i + 1] AS w2
          FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t
                WHERE len(toks) >= 2))
        GROUP BY w1, w2)
      SELECT w1, w2, n_ab,
        ${R("CAST(n_ab * n AS DOUBLE) / CAST(a.n_w * b.n_w AS DOUBLE)", 8)} AS lift
      FROM bi
      JOIN uni a ON a.w = bi.w1
      JOIN uni b ON b.w = bi.w2
      CROSS JOIN tot
      ORDER BY lift DESC, w1, w2
      LIMIT 32""",
    // twin of the engine's fit → signFix → transform chain: quantized
    // moments (q94's grid) → covariance in covEntry's operand order →
    // ONE Jacobi rotation mirrored term-for-term (exact for 2×2) →
    // stable descending sort → first-nonzero-positive orientation →
    // the aggregate-HOF dot sequence. Every step is IEEE mul/add/div/
    // sqrt, bit-identical across engines.
    "q105_pca_project" -> s"""
      WITH v AS (
        SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x0,
               CAST(embedding[2] AS DOUBLE) AS x1
        FROM embeddings),
      mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS nn,
          CAST(sum(CAST(floor(x0 * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s10,
          CAST(sum(CAST(floor(x1 * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s11,
          CAST(sum(CAST(floor(x0 * x0 * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s200,
          CAST(sum(CAST(floor(x0 * x1 * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s201,
          CAST(sum(CAST(floor(x1 * x1 * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s211
        FROM v),
      cov AS (
        SELECT
          (CAST(s10 AS DOUBLE) / 1e8) / nn AS m0,
          (CAST(s11 AS DOUBLE) / 1e8) / nn AS m1,
          ((CAST(s200 AS DOUBLE) / 1e8) / nn)
            - ((CAST(s10 AS DOUBLE) / 1e8) / nn) * ((CAST(s10 AS DOUBLE) / 1e8) / nn) AS ca,
          ((CAST(s201 AS DOUBLE) / 1e8) / nn)
            - ((CAST(s10 AS DOUBLE) / 1e8) / nn) * ((CAST(s11 AS DOUBLE) / 1e8) / nn) AS cb,
          ((CAST(s211 AS DOUBLE) / 1e8) / nn)
            - ((CAST(s11 AS DOUBLE) / 1e8) / nn) * ((CAST(s11 AS DOUBLE) / 1e8) / nn) AS cc
        FROM mom),
      rot AS (
        SELECT m0, m1, ca, cb, cc,
          (cc - ca) / (2.0 * cb) AS theta,
          sign(theta) / (abs(theta) + sqrt(theta * theta + 1.0)) AS tt,
          1.0 / sqrt(tt * tt + 1.0) AS cr,
          tt * cr AS sr,
          cr * (cr * ca - sr * cb) - sr * (cr * cb - sr * cc) AS lpp,
          sr * (sr * ca + cr * cb) + cr * (sr * cb + cr * cc) AS lqq
        FROM cov),
      eig AS (
        SELECT m0, m1,
          CASE WHEN lpp >= lqq THEN lpp ELSE lqq END AS l1,
          CASE WHEN lpp >= lqq THEN cr ELSE sr END AS u0,
          CASE WHEN lpp >= lqq THEN -sr ELSE cr END AS u1,
          CASE WHEN lpp >= lqq THEN sr ELSE cr END AS w0,
          CASE WHEN lpp >= lqq THEN cr ELSE -sr END AS w1c
        FROM rot),
      fixed AS (
        SELECT m0, m1, l1,
          CASE WHEN u0 < 0 OR (u0 = 0 AND u1 < 0) THEN -u0 ELSE u0 END AS a0,
          CASE WHEN u0 < 0 OR (u0 = 0 AND u1 < 0) THEN -u1 ELSE u1 END AS a1,
          CASE WHEN w0 < 0 OR (w0 = 0 AND w1c < 0) THEN -w0 ELSE w0 END AS b0,
          CASE WHEN w0 < 0 OR (w0 = 0 AND w1c < 0) THEN -w1c ELSE w1c END AS b1
        FROM eig)
      SELECT vec_id,
        ${R("(x0 - m0) * a0 + (x1 - m1) * a1", 6)} AS p1,
        ${R("(x0 - m0) * b0 + (x1 - m1) * b1", 6)} AS p2,
        ${R("((x0 - m0) * a0 + (x1 - m1) * a1) / sqrt(greatest(l1, 1e-12))", 6)} AS w1
      FROM v CROSS JOIN fixed
      ORDER BY vec_id""")
}
