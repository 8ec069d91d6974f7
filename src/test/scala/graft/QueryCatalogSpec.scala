package graft

/** Catalog contract smoke (the full oracle hash-match runs via
  * `graft.Verify` + DuckDB — this spec guards the structural invariants
  * cheaply inside `sbt test`).
  */
class QueryCatalogSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every query has an oracle twin (or is consciously rows-only)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without query impl: ${o.diff(q)}")
    assert(q === o, s"queries without oracle (weaker rows-only check): ${q.diff(o)}")
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries execute and return rows at sf0.001") {
    val sample = Seq("q03_shipping_priority", "q10_regional_revenue",
      "q24_window_ranks", "q36_tumbling_window", "q42_dedup_hash",
      "q49_cosine_topk", "q52_minhash_lsh")
    sample.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q75 fixture precondition: no (user_id, ts) ties among view events") {
    // DuckDB's ASOF JOIN leaves its pick among duplicate r.ts rows
    // unspecified, while q75's window formulation tie-breaks on
    // r_event_id — with a tie the oracle compare could fail with no
    // code defect. Guard the precondition per fixture (the q67-recall
    // pattern) so a data refresh surfaces as THIS failure, not as a
    // mysterious q75 hash mismatch.
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val ties = Tables.load(spark, dir, "events")
          .filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts")).count()
          .filter(col("count") > 1).count()
        assert(ties === 0, s"$dir has $ties (user_id, ts) view ties — " +
          "q75's oracle becomes ambiguous; re-derive the tie-break")
      }
  }

  test("q74 fixture precondition: every documents.source matches ^src\\d+$") {
    // q74 derives the mixture weight from CAST(substring(source, 4) AS
    // INT); a non-conforming source value would diverge ASYMMETRICALLY
    // on fixture drift (Spark's non-ANSI cast null-drops the rows,
    // DuckDB's cast errors). Guard the precondition per gate corpus so
    // a data refresh fails loudly here, not as a q74 hash mismatch.
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val bad = Tables.load(spark, dir, "documents")
          .filter(!col("source").rlike("^src\\d+$")).count()
        assert(bad === 0, s"$dir has $bad documents.source values not " +
          "matching ^src\\d+$ — q74's derived keep rate becomes engine-dependent")
      }
  }

  test("q78 invariants: fragments tile each doc; every full bin holds exactly the budget") {
    import org.apache.spark.sql.functions._
    val frags = SparkEntry.queries("q78_seq_pack_split")(spark, sf).cache()
    try {
      // fragments partition the document: per-doc frag_tokens sum back
      // to the doc's token count from the q71 layout
      val docs = SparkEntry.queries("q71_seq_pack")(spark, sf)
        .select(col("doc_id"), col("n_tokens"))
      val broken = frags.groupBy(col("doc_id"))
        .agg(sum(col("frag_tokens")).as("tiled"))
        .join(docs, "doc_id")
        .filter(col("tiled") =!= col("n_tokens")).count()
      assert(broken === 0, "fragment lengths must sum to the doc token count")
      // the whole point of splitting: every bin except the trailing
      // partial one is filled to exactly the 1024-token budget
      val lastBin = frags.agg(max(col("bin_id"))).head().getLong(0)
      val offBudget = frags.filter(col("bin_id") < lastBin)
        .groupBy(col("bin_id"))
        .agg(sum(col("frag_tokens")).as("fill"))
        .filter(col("fill") =!= queries.LlmTextQueries.PackBudget).count()
      assert(offBudget === 0, "every non-trailing bin must hold exactly the budget")
    } finally frags.unpersist()
  }

  test("q82 composition invariants: survivors ⊆ q64 minus eval slice; packing tiles the curated corpus") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q82_curation_pipeline")(spark, sf).cache()
    try {
      // stage plumbing: every q82 row is a q64 survivor outside the
      // eval slice (decontamination can only REMOVE rows)
      val q64 = SparkEntry.queries("q64_corpus_filter")(spark, sf)
        .filter(col("doc_id") % 100 >= 5)
      val extras = out.join(q64, Seq("doc_id"), "left_anti").count()
      assert(extras === 0, "q82 emitted a doc that is not a non-eval q64 survivor")
      // packing invariant on the FILTERED corpus: offsets are the exact
      // prefix sum of the curated docs in doc_id order (no gaps, no
      // overlaps — each start = previous start + previous n_tokens)
      val rows = out.orderBy(col("doc_id"))
        .select(col("n_tokens"), col("start_offset")).collect()
      var expect = 0L
      rows.foreach { r =>
        assert(r.getLong(1) === expect, "packing offset gap/overlap in curated corpus")
        expect += r.getLong(0)
      }
    } finally out.unpersist()
  }

  test("q83 invariants: allocations never exceed the budget; weights follow the q74 convention") {
    import org.apache.spark.sql.functions._
    val plan = SparkEntry.queries("q83_mixture_plan")(spark, sf).collect()
    val totalAllocated = plan.map(_.getAs[Long]("target_tokens")).sum
    assert(totalAllocated <= 1000000L,
      s"integer-floor allocation must conserve the budget (got $totalAllocated)")
    // flooring loses at most (#domains - 1) tokens
    assert(totalAllocated > 1000000L - plan.length,
      "allocation must not under-fill beyond the flooring remainder")
    plan.foreach { r =>
      val w = r.getAs[Int]("weight")
      assert(w >= 1 && w <= 4, s"weight out of the 1..4 convention: $w")
      assert(r.getAs[Boolean]("upsample") ===
        (r.getAs[Long]("target_tokens") > r.getAs[Long]("n_tokens")))
    }
  }

  test("q85 invariants: splits form a covering disjoint partition of the corpus") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q85_split_assign")(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.rowCount(spark, sf, "documents"),
      "per-(split, lang) doc counts must sum to the corpus size")
    assert(out.map(_.getAs[String]("split")).toSet === Set("train", "valid", "test"))
  }

  test("q86 invariants: same doc set as q68; fraction bounded by construction") {
    import org.apache.spark.sql.functions._
    val frac = SparkEntry.queries("q86_decontaminate_frac")(spark, sf).cache()
    try {
      // both variants surface exactly the docs sharing ≥1 eval gram —
      // the threshold changes the VERDICT column, never the row set
      val any = SparkEntry.queries("q68_decontaminate")(spark, sf)
        .select(col("doc_id"))
      assert(frac.select(col("doc_id")).exceptAll(any).count() === 0)
      assert(any.exceptAll(frac.select(col("doc_id"))).count() === 0)
      val bad = frac.filter(col("overlap_frac") <= 0.0 || col("overlap_frac") > 1.0 ||
        col("contaminated_4grams") > col("total_4grams")).count()
      assert(bad === 0, "overlap fraction must be in (0, 1] with count ≤ denominator")
    } finally frac.unpersist()
  }

  test("q87 invariants: per-source retention is exactly the percent_rank half") {
    import org.apache.spark.sql.functions._
    // percent_rank = (rank-1)/(n-1) with tie-free ordering, so the cut
    // keeps floor((n-1)/2) + 1 docs of each source (all docs when n = 1)
    val kept = SparkEntry.queries("q87_quality_cut")(spark, sf)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.load(spark, sf, "documents")
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      val want = if (n == 1) 1L else (n - 1) / 2 + 1
      assert(kept.getOrElse(src, 0L) === want,
        s"source $src: kept ${kept.getOrElse(src, 0L)} of $n, want $want")
    }
  }

  test("q88 invariants: clean + contaminated partition the training slice exactly") {
    import org.apache.spark.sql.functions._
    val clean = SparkEntry.queries("q88_decontaminate_bloom")(spark, sf)
      .select(col("doc_id"))
    val contaminated = SparkEntry.queries("q68_decontaminate")(spark, sf)
      .select(col("doc_id"))
    val training = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 100 >= 5).select(col("doc_id"))
    // disjoint and covering: the bloom path may prune differently but
    // must land on exactly the q68 complement
    assert(clean.intersect(contaminated).count() === 0,
      "a doc cannot be both clean and contaminated")
    assert(training.exceptAll(clean.unionAll(contaminated)).count() === 0,
      "every training doc must be classified")
    assert(clean.unionAll(contaminated).exceptAll(training).count() === 0,
      "no rows outside the training slice")
  }

  test("q89 invariants: versions tile the event stream; one open interval per user") {
    import org.apache.spark.sql.functions._
    val hist = SparkEntry.queries("q89_scd2_history")(spark, sf).cache()
    try {
      val totalEvents = Tables.load(spark, sf, "events").count()
      assert(hist.agg(sum(col("n_events"))).head.getLong(0) === totalEvents,
        "every event must belong to exactly one version")
      assert(hist.filter(col("valid_from") >= col("valid_to")).count() === 0,
        "validity intervals must be non-degenerate")
      val openPerUser = hist.filter(col("is_current"))
        .groupBy(col("user_id")).count()
        .filter(col("count") =!= 1L).count()
      assert(openPerUser === 0, "exactly one current version per user")
      // versions are contiguous ordinals 1..k per user
      val badSeq = hist.groupBy(col("user_id"))
        .agg(min(col("version")).as("lo"), max(col("version")).as("hi"),
          count(lit(1)).as("n"))
        .filter(col("lo") =!= 1L || col("hi") =!= col("n")).count()
      assert(badSeq === 0, "version ids must be contiguous per user")
    } finally hist.unpersist()
  }

  test("q92 invariants: novelty attributions cover the distinct-gram space exactly") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val nov = SparkEntry.queries("q92_gram_novelty")(spark, sf).cache()
    try {
      val distinctGrams = Tables.load(spark, sf, "documents")
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(explode(expr("ngram_hashes(toks, 4, 0)")).as("g"))
        .distinct().count()
      assert(nov.agg(sum(col("novel_grams"))).head.getLong(0) === distinctGrams,
        "every distinct gram is introduced by exactly one source")
      assert(nov.filter(col("novel_grams") > col("gram_instances")).count() === 0,
        "a source cannot introduce more grams than it contains")
    } finally nov.unpersist()
  }

  test("q93 invariants: kept spans = distinct span space; reconstruction only ever shrinks") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q93_span_dedup")(spark, sf).cache()
    try {
      // every doc appears, counts are sane
      assert(out.count() === Tables.rowCount(spark, sf, "documents"))
      assert(out.filter(col("n_kept") > col("n_spans")).count() === 0,
        "a doc cannot keep more spans than it has")
      // first-occurrence dedup keeps exactly one occurrence per distinct
      // span content: total kept across the corpus = |distinct spans|
      val distinctSpans = Tables.load(spark, sf, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(explode(expr(
          "transform(sequence(0, (size(toks)-1) div 8), i -> array_join(slice(toks, i*8+1, 8), ' '))"))
          .as("span"))
        .distinct().count()
      assert(out.agg(sum(col("n_kept"))).head.getLong(0) === distinctSpans,
        "corpus-wide kept spans must equal the distinct span space")
      // a doc with all-unique spans reconstructs to its own text
      val full = out.filter(col("n_kept") === col("n_spans")).count()
      assert(full > 0, "fixture should contain at least one fully-novel doc")
    } finally out.unpersist()
  }

  test("q94 fixture precondition: every embedding is exactly 64-wide") {
    // q94/Pca quantize into fixed d + d(d+1)/2 buffers and the DuckDB
    // twin iterates range(64) — a ragged or re-dimensioned fixture must
    // fail HERE, not as a treeAggregate exception or an oracle mismatch.
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val bad = Tables.load(spark, dir, "embeddings")
          .filter(size(col("embedding")) =!= 64).count()
        assert(bad === 0, s"$dir has $bad embeddings with dim != 64")
      }
  }

  test("q95 matches a driver-side brute-force recount (independent of the SQL path)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q95_bpe_pairs")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // recompute in plain Scala from the raw fixture
    val words = Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { w =>
      var i = 0
      while (i < w.length - 1) {
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1L
        i += 1
      }
    }
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(32)
    assert(got === want, "q95 must equal the brute-force pair count")
  }

  test("q96 matches a driver-side brute-force score (independent of the SQL path)") {
    import org.apache.spark.sql.functions._
    import graft.functions.Pca
    val d = 64
    val emb = Tables.load(spark, sf, "embeddings")
    val (n, s1, s2) = Pca.moments(emb, "embedding", d)
    val mean = Array.tabulate(d)(i => (s1(i).toDouble / Pca.Q) / n.toDouble)
    val vEff = Array.tabulate(d)(i => math.max(Pca.covEntry(n, s1, s2, d, i, i), 1e-12))
    val want = emb.select(col("vec_id"), col("embedding")).collect().map { r =>
      val e = r.getSeq[Float](1)
      var q = 0L
      var i = 0
      while (i < d) {
        val c = e(i).toDouble - mean(i)
        q += math.floor(c * c / vEff(i) * 1e8 + 0.5).toLong
        i += 1
      }
      (r.getLong(0), q)
    }.sortBy { case (id, q) => (-q, id) }.take(32).toSeq
    val got = SparkEntry.queries("q96_embed_outliers")(spark, sf)
      .select(col("vec_id"), col("q_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "q96 must equal the brute-force Mahalanobis ranking")
  }

  test("q97 invariants: counts cover the corpus; traces are non-negative; classes separate") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q97_class_scatter")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum ===
      Tables.rowCount(spark, sf, "embeddings"),
      "per-label counts must partition the embedding table")
    out.foreach { r =>
      assert(r.getAs[Double]("within_trace") >= 0.0, "variance trace cannot be negative")
      assert(r.getAs[Double]("between_dist2") >= 0.0)
    }
    // the fixture embeds synthetic label clusters — at least some class
    // structure must be visible (a centroid away from the global mean)
    assert(out.map(_.getAs[Double]("between_dist2")).max > 0.0,
      "no class separation at all — fixture drifted or math broke")
  }

  test("q98 composition invariants: curated set = corpus minus q96 outliers; q80 contract holds") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q98_embed_curation")(spark, sf).cache()
    try {
      val outliers = SparkEntry.queries("q96_embed_outliers")(spark, sf)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val ids = out.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val all = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(ids === all.diff(outliers),
        "q98 must cover exactly the corpus minus the q96 screen")
      // q80 row contract on the survivors: a dropped vector points at a
      // kept-or-earlier cell-mate with a lower id
      val bad = out.filter(!col("kept") &&
        (col("dup_of").isNull || col("dup_of") >= col("vec_id"))).count()
      assert(bad === 0, "every dup must reference a lower-id neighbor")
    } finally out.unpersist()
  }

  test("q99 composition invariants: hits are servable survivors; 5 ranked hits per query") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q99_retrieval_serve")(spark, sf).cache()
    try {
      val survivors = SparkEntry.queries("q64_corpus_filter")(spark, sf)
        .select(col("doc_id"))
      // set-wise: the same doc legitimately serves several queries
      assert(out.select(col("doc_id")).distinct().except(survivors).count() === 0,
        "a non-servable doc must never be retrieved")
      val perQuery = out.groupBy(col("q_id")).count().collect()
      assert(perQuery.length === 20, "all 20 query vectors must answer")
      perQuery.foreach(r => assert(r.getLong(1) === 5L,
        s"query ${r.get(0)} returned ${r.getLong(1)} hits, want 5"))
      assert(out.filter(col("source").isNull || col("lang").isNull).count() === 0,
        "hydration must fill metadata for every hit")
    } finally out.unpersist()
  }

  test("q100 invariants: statuses partition the batch; dup_of only for in-batch dups") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q100_incremental_dedup")(spark, sf).cache()
    try {
      val batchSize = Tables.load(spark, sf, "documents")
        .filter(col("doc_id") % 10 === 0).count()
      assert(out.count() === batchSize, "every batch doc must be classified")
      assert(out.filter(!col("status").isin("new", "dup_history", "dup_batch")).count() === 0)
      assert(out.filter(col("status") === "dup_batch" &&
        (col("dup_of").isNull || col("dup_of") >= col("doc_id"))).count() === 0,
        "an in-batch dup must point at an earlier batch doc")
      assert(out.filter(col("status") =!= "dup_batch" && col("dup_of").isNotNull).count() === 0,
        "dup_of is only defined for in-batch dups")
    } finally out.unpersist()
  }

  test("q102 invariants: symmetric-by-construction, bounded overlap, consistent with q92 totals") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val out = SparkEntry.queries("q102_source_overlap")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"),
        "each unordered pair must appear exactly once, lexicographically")
      val ov = r.getAs[Double]("overlap")
      assert(ov > 0.0 && ov <= 1.0, s"overlap out of (0, 1]: $ov")
    }
    // shared grams can never exceed either side's distinct-gram count
    val totals = Tables.load(spark, sf, "documents")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("source"), explode(expr("ngram_hashes(toks, 4, 0)")).as("g"))
      .distinct().groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val cap = math.min(totals(r.getAs[String]("src_a")), totals(r.getAs[String]("src_b")))
      assert(r.getAs[Long]("shared_grams") <= cap,
        s"shared grams exceed the smaller side's distinct space")
    }
  }

  test("q112 invariants: allocation bounded by the budget; temperature flattens the mixture") {
    val rows = SparkEntry.queries("q112_temperature_mix")(spark, sf).collect()
    val budget = queries.CorpusStatQueries.MixBudget
    // floor-division under-allocates, never over
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= budget)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") >= 0L)
      assert(r.getAs[Long]("w_q") > 0L)
    }
    // τ = 0.5 must compress the spread: the max/min ALLOCATION ratio is
    // strictly below the max/min TOKEN ratio (unless all sources are
    // equal-sized) — the point of temperature sampling
    val n = rows.map(_.getAs[Long]("n_tokens"))
    val a = rows.map(_.getAs[Long]("alloc_tokens"))
    if (n.max != n.min) {
      assert(a.max.toDouble / a.min < n.max.toDouble / n.min,
        "temperature sampling must upsample low-resource domains")
    }
    // weight ordering follows token ordering (monotone transform)
    val byN = rows.sortBy(_.getAs[Long]("n_tokens")).map(_.getAs[Long]("w_q"))
    assert(byN.sameElements(byN.sorted))
  }

  test("q113/q115 invariants: merges apply-consistently; token counts bracket words and chars") {
    import org.apache.spark.sql.functions._
    val merges = SparkEntry.queries("q113_bpe_merges")(spark, sf).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    assert(merges.length === queries.CurationQueries.BpeGateMerges)
    // every merge pair must have been producible: each side is either a
    // single char or the concatenation of an EARLIER merge
    val known = scala.collection.mutable.Set[String]()
    merges.foreach { case (l, r) =>
      assert(l.length == 1 || known(l), s"left symbol '$l' not derivable")
      assert(r.length == 1 || known(r), s"right symbol '$r' not derivable")
      known += (l + r)
    }
    // the first merge IS q95's top pair (shared ordering contract)
    val q95top = SparkEntry.queries("q95_bpe_pairs")(spark, sf).head.getAs[String]("pair")
    assert(merges.head._1 + merges.head._2 === q95top)

    // q115: for every doc, words ≤ bpe tokens ≤ non-space chars (each
    // word is ≥1 token; merging only ever shrinks from chars)
    val toks = SparkEntry.queries("q115_bpe_token_count")(spark, sf)
    val bounds = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) >= 1)).as("n_words"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars"))
    val joined = toks.join(bounds, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val t = r.getAs[Long]("n_tokens")
      assert(t >= r.getAs[Int]("n_words").toLong, s"doc ${r.get(0)}: fewer tokens than words")
      assert(t <= r.getAs[Int]("n_chars").toLong, s"doc ${r.get(0)}: more tokens than characters")
    }
    // and a direct driver-side recount with Bpe.tokenize on one doc
    val doc = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).head
    val want = doc.getString(1).split(" ").filter(_.nonEmpty)
      .map(w => graft.functions.Bpe.tokenize(w, merges.toSeq).size.toLong).sum
    val got = joined.find(_.getAs[Long]("doc_id") == doc.getLong(0)).get.getAs[Long]("n_tokens")
    assert(got === want, "q115 must equal Bpe.tokenize applied word-by-word")
  }

  test("q114 invariant: the persisted-index answer IS the q111 answer") {
    val a = SparkEntry.queries("q111_ann_ivfpq")(spark, sf).collect()
    val b = SparkEntry.queries("q114_ann_index_reuse")(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "persist + reload must be bit-lossless")
  }

  test("query names are unique across sub-catalogs") {
    val parts = Seq(
      queries.RelationalQueries.queries, queries.WindowScalarQueries.queries,
      queries.StreamEquivQueries.queries, queries.LlmTextQueries.queries,
      queries.LlmSimQueries.queries, queries.CdcOpQueries.queries,
      queries.CurationQueries.queries, queries.CorpusStatQueries.queries)
    assert(parts.map(_.size).sum === SparkEntry.queries.size, "duplicate query names collapse in the merged map")
  }
}
