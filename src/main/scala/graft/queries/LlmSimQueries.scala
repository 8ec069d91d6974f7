package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Tables, Det}

/** Similarity search + probabilistic dedup over `embeddings` /
  * `documents` (north-star LLM-data ops).
  *
  * Determinism strategy for the DuckDB oracle: all float math is
  * promoted to double BEFORE any arithmetic and accumulated in strict
  * element order (Spark `aggregate` left-fold ≡ DuckDB `list_reduce`),
  * so both engines produce bit-identical doubles; results are rounded
  * to 6 decimals before ranking/threshold so ordering is stable.
  * MinHash/SimHash use md5-derived 60-bit integer hashes (md5 is
  * identical everywhere) + explicit (a*h+b) mod p families — no
  * engine-private hash functions anywhere.
  *
  * Scale design: top-k = broadcast(query-set) × linear scan + per-query
  * window (no global sort); near-dup pair generation goes through LSH
  * buckets (MinHash bands / SimHash prefixes), never all-pairs; the
  * brute-force variants exist as correctness baselines.
  */
object LlmSimQueries {
  private type Q = (SparkSession, String) => DataFrame
  import Det._

  /** Strict left-fold dot product of two float arrays as double, via the
    * codegen'd native expression [[graft.functions.DotProduct]] (same
    * fold order as the `aggregate(zip_with(...))` formulation it
    * replaces, ~20× faster on the all-pairs scan).
    */
  private def dot(a: String, b: String): Column = expr(s"dotp($a, $b)")

  private def sqnorm(a: String): Column = dot(a, a)

  /** DuckDB twin of `dot` (1-based list indexing, same fold order). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len($a) + 1),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""

  // MinHash family: k=16 permutations h_i(x) = (a_i * x + b_i) mod p
  // over x = md5-60bit(shingle) mod p. Constants are arbitrary odd
  // numbers < 2^20 (fit 64-bit products), fixed for reproducibility.
  val MinhashP = 2147483647L
  val MinhashK = 16
  val minhashA: Seq[Long] = Seq(387413L, 559831L, 723947L, 104723L, 911159L, 333667L, 175261L, 477977L,
    604171L, 259631L, 722363L, 135977L, 881821L, 414977L, 623171L, 287117L)
  val minhashB: Seq[Long] = Seq(98491L, 771151L, 339401L, 552581L, 127733L, 910913L, 274769L, 618439L,
    752797L, 193813L, 421331L, 866777L, 250199L, 711871L, 133103L, 995377L)
  val MinhashBands = 4 // 4 bands x 4 rows

  // ANN index geometry: K independent hash tables, each hashing a
  // vector to an L-bit bucket via L random ±1 hyperplanes (sign-LSH).
  // Collision probability per bit is 1 - θ/π, so for near-neighbors
  // (θ small) P(bucket collision in >=1 table) = 1-(1-p^L)^K stays
  // high while the expected bucket occupancy — and with it the
  // candidate pair space — shrinks by ~2^L per table. Hyperplane
  // signs come from splitmix64 on (table, bit, dim): deterministic,
  // seedable, and reproducible in the DuckDB oracle as literals.
  val AnnTables = 4
  val AnnBits = 12
  val AnnDim = 64

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ±1 hyperplane for (table, bit) — shared by query and oracle. */
  def annPlane(t: Int, l: Int): Array[Float] =
    Array.tabulate(AnnDim) { i =>
      if ((splitmix64(t * 1000003L + l * 1009L + i) & 1L) == 0L) 1f else -1f
    }

  // Near-dup index geometry (q67): tuned for RECALL at cosine >= 0.99
  // rather than top-k pruning. θ = arccos(0.99) ≈ 0.1415 rad gives a
  // per-bit collision probability p = 1 - θ/π ≈ 0.955, so a true
  // near-dup pair collides in one L=8-bit table with p^8 ≈ 0.69 and
  // escapes ALL K=8 tables with (1 - 0.69)^8 ≈ 8e-5 — while random
  // pairs (p ≈ 0.5) share a bucket with only K/2^L ≈ 3% probability,
  // keeping the candidate space sub-quadratic. Separate plane family
  // from the ANN index (different seed stream) so the two indexes stay
  // independently tunable.
  val NdTables = 8
  val NdBits = 8

  def ndPlane(t: Int, l: Int): Array[Float] =
    Array.tabulate(AnnDim) { i =>
      if ((splitmix64(0x4E44L + t * 7000003L + l * 10007L + i) & 1L) == 0L) 1f else -1f
    }

  /** Candidate (id_a, id_b) pairs (id_a < id_b) whose vectors share a
    * bucket in at least one of the K sign-LSH tables. All bucket ids
    * are computed map-side (one codegen'd dotp per hyperplane); the
    * only shuffle is the self-join on (table, bucket). Public so the
    * sub-quadratic guard spec can measure the volume the exact
    * re-check sees.
    */
  def neardupCandidates(e: DataFrame): DataFrame = {
    val tb = explode(array((0 until NdTables).map { t =>
      val bucket = (0 until NdBits).map { l =>
        when(call_function("dotp", col("embedding"), typedlit(ndPlane(t, l))) > 0d,
          lit(1L << l)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }: _*)).as("tb")
    // cached: the self-join consumes sig on BOTH sides, and without the
    // cache each side re-runs the K·L hyperplane dotps over the full
    // corpus scan (broadcast joins get no exchange reuse). The cached
    // frame is 3 longs per (vector, table) — O(n·K), no embeddings.
    val sig = e.select(col("vec_id"), tb)
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .cache()
    // localCheckpoint severs the candidate set's lineage from sig so the
    // cache can be dropped HERE rather than leaking for the life of the
    // session (the candidate set is the tiny colliding-pair list; sig is
    // O(n·K) rows). Without the cut, unpersisting before the consumer
    // materializes would re-run the K·L hyperplane dotps twice.
    val cand = sig.as("x").join(sig.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b")).distinct()
      .localCheckpoint()
    sig.unpersist()
    cand
  }

  /** The production near-dup path (scale shape of q50): sign-LSH
    * candidate generation + exact cosine re-check, same output contract
    * as the all-pairs baseline (pairs with 6-dp cosine >= 0.99). Takes
    * the embeddings frame directly so specs can run it over planted
    * duplicates. Requires [[graft.functions.GraftFunctions.register]].
    */
  def neardupLsh(e0: DataFrame): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(sqnorm("embedding")))
    neardupCandidates(e)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), "id_b")
      .withColumn("cosine_raw", dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")))
      // conservative raw prefilter (identical to q50's): nothing that
      // could round to >= 0.99 at 6 dp is below 0.989999
      .filter(col("cosine_raw") >= 0.989999)
      .withColumn("cosine", dround(col("cosine_raw"), 6))
      .filter(col("cosine") >= 0.99)
      .select(col("id_a"), col("id_b"), col("cosine"))
      // checkpoint the (tiny) verified pair set before the sort:
      // orderBy's range sampling re-executes its child, which here
      // means two more corpus scans through the exact re-check
      .localCheckpoint()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Candidate (q_id, vec_id) pairs from the multi-table LSH index:
    * all buckets computed map-side, candidates = vectors sharing any
    * (table, bucket) with a query. Public so the sub-quadratic guard
    * spec can measure the candidate volume the exact re-rank sees.
    */
  def annCandidates(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings")
    val tb = explode(array((0 until AnnTables).map { t =>
      val bucket = (0 until AnnBits).map { l =>
        when(call_function("dotp", col("embedding"), typedlit(annPlane(t, l))) > 0d,
          lit(1L << l)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }: _*)).as("tb")
    // cached: the bucket join consumes sig on BOTH sides (index +
    // broadcast query side), and each side would otherwise re-run the
    // K·L hyperplane dotps over the full corpus scan. localCheckpoint
    // severs the (tiny) candidate list's lineage so the cache drops
    // here instead of leaking for the session — the q67 pattern.
    val sig = e.select(col("vec_id"), tb)
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .cache()
    val qsig = sig.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cand = sig.join(broadcast(qsig), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
      .localCheckpoint()
    sig.unpersist()
    cand
  }

  // IVF geometry (q63): C cells, nprobe probed cells per query, and a
  // fixed number of Lloyd iterations refining the first-C seed
  // centroids. Training math is portable by construction: elements are
  // quantized to a 1e-9 integer grid with pure IEEE ops, per-dim sums
  // are exact BIGINT arithmetic (accumulation-order-free), and the mean
  // divides in IEEE double before a float cast — so Spark and the
  // DuckDB twin derive bit-identical centroids without any
  // double→decimal casts (which round differently per engine).
  val IvfC = 16
  val IvfNprobe = 2
  val IvfIters = 2

  // q80 semantic-dedup threshold. The fixture's synthetic embeddings
  // are near-orthogonal (max pairwise cosine ≈ 0.48-0.51 across the
  // gate corpora), so the gate threshold sits INSIDE that range to
  // exercise the drop path; real corpora pass their own `t` (the paper
  // uses ~0.95 on OpenCLIP embeddings).
  val SemDedupT = 0.4

  /** Centroids as driver-side values (index METADATA, O(C·dim) — the
    * same class as MLlib's per-iteration center collect; never the
    * data). The norm is a strict left fold over double-promoted floats,
    * matching `sqrt(dotp(c,c))` and the twin's `sqrt(list_reduce(...))`
    * bit-for-bit.
    */
  private def centValues(cents: DataFrame): Seq[(Int, Array[Float], Double)] =
    cents.collect().map { r =>
      val emb = r.getSeq[Float](1).toArray
      (r.getInt(0), emb,
        math.sqrt(emb.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    }.toSeq.sortBy(_._1)

  /** One assignment pass: nearest centroid by cosine (ties → lower id).
    * Pure map-side: the argmax runs as one expression over literal
    * centroid arrays, so NO shuffle touches the corpus — the window
    * formulation would move n·C embedding-carrying rows per pass to
    * rank them. (For a C too large to inline — tens of thousands — a
    * broadcast join against the centroid frame is the fallback.) Ties pick the
    * lower cent_id: array_max on (cscore, -id) structs maximizes the
    * NEGATED id at equal score.
    */
  def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame =
    ivfAssignV(e, centValues(cents))

  /** [[ivfAssign]] over pre-collected centroid values — the form the
    * q63 pipeline threads end-to-end so the training lineage executes
    * exactly once per Lloyd pass (a `cents` DataFrame re-runs its full
    * aggregation plan at every consumer).
    */
  def ivfAssignV(e: DataFrame, cv: Seq[(Int, Array[Float], Double)]): DataFrame = {
    // one model-carrying node instead of C literal-struct score columns:
    // bit-identical scores/tie-breaks (NearestCell doc), but the plan
    // tree is O(1), so the per-ACTION analysis/codegen cost stops
    // scaling with C — measured ~0.5-1 s of pure driver time per
    // planned action at C=16 on the literal form (r16 opt round)
    import org.apache.spark.sql.GraftColumnAccess.{column, expression}
    val cell = column(graft.functions.NearestCell(
      expression(col("embedding")), expression(col("nrm")),
      graft.functions.CellModel.of(cv)))
    e.withColumn("cell", cell)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
  }


  /** Lloyd-refined centroids from first-C seeds (k-means with fixed
    * init + fixed iteration count — the deterministic analogue of
    * k-means‖: the heavy step per iteration is one broadcast
    * assignment plus a partial-aggregated per-(cell,dim) sum, both
    * map-side shapes that carry to 100 TB). Returns (cent_id, c_emb:
    * array<float>).
    */
  def ivfCentroids(e: DataFrame, c: Int = IvfC, iters: Int = IvfIters): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    ivfCentroidValues(e, c, iters).map { case (id, emb, _) => (id, emb) }
      .toDF("cent_id", "c_emb")
  }

  /** [[ivfCentroids]] returning collected (cent_id, c_emb, norm)
    * values: each Lloyd pass runs exactly ONE Spark job (assignment +
    * the parallel-sum aggregation) and collects the O(C·dim) result —
    * so training costs `iters` jobs total instead of re-executing
    * frame lineage at every downstream consumer.
    */
  def ivfCentroidValues(e: DataFrame, c: Int = IvfC,
      iters: Int = IvfIters): Seq[(Int, Array[Float], Double)] = {
    var cv = centValues(e.filter(col("vec_id") < c)
      .select(col("vec_id").cast(IntegerType).as("cent_id"), col("embedding").as("c_emb")))
    // Each Lloyd pass is ONE shuffle-free stage (the MLlib k-means
    // step): every partition assigns its rows to the nearest current
    // centroid and folds them into a local (C·dim longs, C counts)
    // buffer; treeAggregate merges the partials logarithmically, so
    // the driver receives O(C·dim) however many partitions the corpus
    // has. The math is the oracle twin's, bit-for-bit: cosine scored
    // by the same strict index-order IEEE fold as `dotp`, ties to the
    // lower cent_id, elements quantized to a 1e-9 integer grid
    // (floor(x·1e9 + 0.5), round-to-nearest in IEEE) and summed as
    // BIGINT — accumulation-order-free — then the mean divides in
    // IEEE double ((s / n) / 1e9) before the float cast.
    import org.apache.spark.sql.Encoders
    val rows = e.select(col("embedding"), col("nrm"))
      .as[(Seq[Float], Double)](Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]](),
        Encoders.scalaDouble))
    val dim = AnnDim
    for (_ <- 1 to iters) {
      val centArr = cv.toArray // (id, emb, nrm), ascending id
      val (sums, counts) = rows.rdd.treeAggregate(
        (new Array[Long](centArr.length * dim), new Array[Long](centArr.length)))(
        seqOp = { case ((s, n), (emb, nrm)) =>
          var best = 0; var bestSc = Double.NegativeInfinity
          var ci = 0
          while (ci < centArr.length) {
            val (_, cemb, cn) = centArr(ci)
            var acc = 0.0; var i = 0
            while (i < dim) { acc += emb(i).toDouble * cemb(i).toDouble; i += 1 }
            val sc = acc / (nrm * cn)
            // strictly-greater keeps the earliest (lowest) id on ties —
            // array_max over (cscore, -id) structs, same order
            if (sc > bestSc) { bestSc = sc; best = ci }
            ci += 1
          }
          var i = 0
          while (i < dim) {
            s(best * dim + i) += math.floor(emb(i).toDouble * 1e9 + 0.5).toLong
            i += 1
          }
          n(best) += 1L
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < n1.length) { n1(i) += n2(i); i += 1 }
          (s1, n1)
        })
      cv = centArr.indices.flatMap { ci =>
        // cells that lost every vector drop out, like the groupBy form
        if (counts(ci) == 0L) None
        else {
          val n = counts(ci)
          val emb = Array.tabulate(dim)(i =>
            (sums(ci * dim + i).toDouble / n.toDouble / 1e9).toFloat)
          Some((centArr(ci)._1, emb,
            math.sqrt(emb.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))))
        }
      }
    }
    cv
  }

  // Product quantization (Jégou, Douze, Schmid, "Product quantization
  // for nearest neighbor search", TPAMI 2011): split d=64 into M=8
  // 8-dim subspaces, k-means each subspace to K=16 codewords, encode
  // every vector as 8 one-byte codes (64 floats → 8 bytes, the 32×
  // compression that makes billion-vector serving memory-feasible),
  // and score queries with asymmetric distance computation (ADC): a
  // per-query M×K lookup table of exact query-to-codeword inner
  // products, so each corpus vector costs M table reads + M-1 adds.
  val PqM = 8
  val PqDsub = 8 // AnnDim / PqM
  val PqK = 16
  val PqIters = 2
  val PqQueryCount = 20
  val PqShortlist = 50 // ADC candidates per query, exact-reranked to top-5

  /** Per-subspace codebooks: `books(s)` = (cid, codeword) ascending
    * cid. Init is the first-K vectors' subslices (deterministic, the
    * q63 convention); each Lloyd pass is ONE shuffle-free treeAggregate
    * over ALL subspaces at once — a partition folds its rows into
    * M·K·dsub quantized-BIGINT sums + M·K counts (O(512) longs of
    * driver metadata however large the corpus), merged order-free.
    * Assignment minimizes subspace L2 via the equivalent max of
    * `dot(x_sub, c) − |c|²/2` (one IEEE fold + one subtract — the form
    * the oracle twin mirrors term-for-term), ties to the lower cid.
    * Cells that lose every vector drop out, like the SQL GROUP BY form.
    */
  def pqCodebooks(e: DataFrame, iters: Int = PqIters): Array[IndexedSeq[(Int, Array[Float])]] = {
    val init = e.filter(col("vec_id") < PqK)
      .select(col("vec_id"), col("embedding")).collect().sortBy(_.getLong(0))
    var books: Array[IndexedSeq[(Int, Array[Float])]] =
      Array.tabulate(PqM) { s =>
        init.toIndexedSeq.map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).slice(s * PqDsub, (s + 1) * PqDsub).toArray))
      }
    import org.apache.spark.sql.Encoders
    val rows = e.select(col("embedding"))
      .as[Seq[Float]](org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    for (_ <- 1 to iters) {
      val bArr: Array[Array[(Int, Array[Float])]] = books.map(_.toArray)
      val halves: Array[Array[Double]] = bArr.map(_.map { case (_, c) =>
        c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble) / 2.0
      })
      val offs: Array[Int] = bArr.scanLeft(0)((acc, b) => acc + b.length).init
      val totalCents = bArr.map(_.length).sum
      val (sums, counts) = rows.rdd.treeAggregate(
        (new Array[Long](totalCents * PqDsub), new Array[Long](totalCents)))(
        seqOp = { case ((sm, n), emb) =>
          var s = 0
          while (s < PqM) {
            val cents = bArr(s)
            val base = s * PqDsub
            var best = 0; var bestSc = Double.NegativeInfinity
            var ci = 0
            while (ci < cents.length) {
              val c = cents(ci)._2
              var acc = 0.0; var i = 0
              while (i < PqDsub) { acc += emb(base + i).toDouble * c(i).toDouble; i += 1 }
              val sc = acc - halves(s)(ci)
              // strictly-greater keeps the earliest (lowest) cid on ties
              if (sc > bestSc) { bestSc = sc; best = ci }
              ci += 1
            }
            val slot = offs(s) + best
            var i = 0
            while (i < PqDsub) {
              sm(slot * PqDsub + i) += math.floor(emb(base + i).toDouble * 1e9 + 0.5).toLong
              i += 1
            }
            n(slot) += 1L
            s += 1
          }
          (sm, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < n1.length) { n1(i) += n2(i); i += 1 }
          (s1, n1)
        })
      books = Array.tabulate(PqM) { s =>
        bArr(s).indices.flatMap { ci =>
          val slot = offs(s) + ci
          if (counts(slot) == 0L) None
          else {
            val n = counts(slot)
            Some((bArr(s)(ci)._1, Array.tabulate(PqDsub)(i =>
              (sums(slot * PqDsub + i).toDouble / n.toDouble / 1e9).toFloat)))
          }
        }
      }
    }
    books
  }

  /** Map-side PQ encoding: per subspace, the argmax of the SAME
    * `dot − |c|²/2` scores over codeword literals (`array_max` on
    * (score, −cid) structs — the ivfAssignV trick), so NO shuffle
    * touches the corpus and codes match training assignment exactly.
    */
  def pqEncode(e: DataFrame, books: Array[IndexedSeq[(Int, Array[Float])]],
      keep: Seq[String] = Nil): DataFrame = {
    // one model-carrying node per subspace instead of K literal-struct
    // score columns each — identical codes (PqCodeSub doc), O(M) plan
    // tree instead of O(M·K·dsub); the literal form cost ~1 s of pure
    // driver analysis/codegen per planned action (r16 opt round)
    import org.apache.spark.sql.GraftColumnAccess.{column, expression}
    var out = e
    for (s <- 0 until PqM) {
      out = out.withColumn(s"code$s", column(graft.functions.PqCodeSub(
        expression(col("embedding")),
        graft.functions.SubBook.of(books(s), s * PqDsub))))
    }
    out.select((col("vec_id") +: keep.map(col)) ++
      (0 until PqM).map(s => col(s"code$s")): _*)
  }

  /** IVFPQ serving — the q111 tail as a standalone stage, so the SAME
    * bit-deterministic scoring runs against a just-built index (q111)
    * or one reloaded from the lakehouse without retraining
    * ([[graft.lakehouse.AnnIndex]], q114). `codes` must carry
    * (vec_id, cell, code0..code{M-1}); `e` is the raw corpus with
    * `nrm`, touched ONLY to hydrate the per-query shortlist for the
    * exact re-rank (broadcast metadata joins — the corpus is never
    * scanned for scoring; the probed-cell code rows are).
    */
  def ivfpqServe(s: SparkSession, e: DataFrame,
      cv: Seq[(Int, Array[Float], Double)],
      books: Array[IndexedSeq[(Int, Array[Float])]],
      codes: DataFrame): DataFrame = {
    val qRows = e.filter(col("vec_id") < PqQueryCount)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .collect().sortBy(_.getLong(0))
    // probes carry the coarse term dot(q, c_cell) as `offset`; LUTs
    // are per-query residual-codeword inner products — both
    // O(queries·…) index metadata, broadcast
    val probeRows: Seq[(Long, Int, Double)] = qRows.toIndexedSeq.flatMap { r =>
      val qemb = r.getSeq[Float](1)
      val qnrm = r.getDouble(2)
      cv.map { case (cid, cemb, cn) =>
        var acc = 0.0; var i = 0
        while (i < qemb.length) { acc += qemb(i).toDouble * cemb(i).toDouble; i += 1 }
        // rank cells by cosine (q63's probe convention); the raw dot
        // travels as the coarse ADC term
        (acc / (qnrm * cn), cid, acc)
      }.sortBy { case (cos, cid, _) => (-cos, cid) }
        .take(IvfNprobe).map { case (_, cid, off) => (r.getLong(0), cid, off) }
    }
    val probes = {
      import s.implicits._
      probeRows.toDF("q_id", "cell", "offset")
    }
    val qdf = {
      val lutRows = qRows.toIndexedSeq.map { r =>
        val emb = r.getSeq[Float](1)
        val luts = IndexedSeq.tabulate(PqM) { sub =>
          val arr = new Array[Double](PqK)
          books(sub).foreach { case (cid, c) =>
            var acc = 0.0; var i = 0
            while (i < PqDsub) { acc += emb(sub * PqDsub + i).toDouble * c(i).toDouble; i += 1 }
            arr(cid) = acc
          }
          arr.toSeq
        }
        org.apache.spark.sql.Row.fromSeq(r.getLong(0) +: luts)
      }
      val schema = StructType(StructField("q_id", LongType, nullable = false) +:
        (0 until PqM).map(sub =>
          StructField(s"lut$sub", ArrayType(DoubleType, containsNull = false), nullable = false)))
      s.createDataFrame(java.util.Arrays.asList(lutRows: _*), schema)
    }
    // at scale the probed cells are a LITERAL partition predicate —
    // codes partitioned by cell prune unprobed files at the scan
    val probedCells = probeRows.map(_._2).distinct.sorted
    val codesProbed = codes.filter(col("cell").isin(probedCells.map(Int.box): _*))
    val adc = (0 until PqM).map(sub =>
      element_at(col(s"lut$sub"), col(s"code$sub") + 1))
      .foldLeft(col("offset"))(_ + _)
    import org.apache.spark.sql.expressions.Window
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
    // the shortlist is O(queries · PqShortlist) index METADATA — it was
    // already materialized driver-side as a broadcast build; collecting
    // it instead lets the exact-rerank hydration push the shortlist ids
    // INTO the corpus scan (IN/InSet → parquet row-group stats / the
    // lakehouse per-file key pruning). At 100 TB the re-rank then reads
    // the row groups holding ~queries·50 ids instead of the FULL corpus
    // — the difference between hydration being a point lookup and a
    // table scan. Results are identical: the inner broadcast join kept
    // exactly these vec_ids.
    val shortRows = codesProbed.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qdf), "q_id")
      .withColumn("adc", dround(adc, 6))
      .withColumn("crk", row_number().over(wAdc))
      .filter(col("crk") <= PqShortlist)
      .select(col("q_id"), col("vec_id"))
      .collect()
    val shortlist = {
      import s.implicits._
      shortRows.toIndexedSeq.map(r => (r.getLong(0), r.getLong(1)))
        .toDF("q_id", "vec_id")
    }
    val slIds = shortRows.map(_.getLong(1)).distinct.sorted
    val qe = {
      import s.implicits._
      qRows.toIndexedSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .toDF("q_id", "q_emb", "q_nrm")
    }
    val wX = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    e.filter(col("vec_id").isin(slIds.map(Long.box): _*))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(qe), "q_id")
      .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      .withColumn("rk", row_number().over(wX))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus with the q63 k-means
    * (deterministic first-C init, fixed Lloyd passes), then within each
    * cell drop every vector whose 6-dp cosine to ANY lower-id cell-mate
    * reaches `t` — the paper's keep-one rule made order-deterministic:
    * kept = vectors with no similar lower-id neighbor, and `dup_of`
    * records the lowest such neighbor (chains collapse toward the
    * lowest id, like q77's min-id representative; a dropped vector's
    * dup_of may itself be dropped). Confining the pair space to the
    * method's scale trick: O(Σ cellᵢ²) ≈ O(n²/C) instead of O(n²),
    * with C grown alongside the corpus; cross-cell near-dups are out
    * of scope by design (q67 covers the exact-recall contract).
    *
    * Scale shape: training is `IvfIters` shuffle-free treeAggregate
    * jobs; assignment is pure map-side (centroid-literal argmax); the
    * pair join is ONE shuffle keyed on the cell id (AQE splits skewed
    * cells); the verdict join broadcasts the tiny dup set. Output is
    * one row per vector — kept AND dropped, with its cell — so the
    * gate pins the cluster geometry even when a corpus has no
    * semantic dups.
    */
  // The previous semanticDedup invocation's checkpoint RDDs, released
  // on the NEXT call: the snapshot is one row per corpus vector, so an
  // unpersist-never policy would grow the block manager by a corpus
  // footprint per bench rep (clearCache() doesn't reach checkpointed
  // RDDs). It can't be released any sooner — the caller consumes the
  // returned frame lazily and the checkpoint IS its only lineage.
  // CONTRACT: a semanticDedup result stays valid until the next
  // semanticDedup call (the q77 bounded-residency discipline); hold
  // two live results by collecting the first before requesting the
  // second.
  private val lastSemanticCp =
    new java.util.concurrent.atomic.AtomicReference[Seq[org.apache.spark.rdd.RDD[_]]](Nil)

  def semanticDedup(e0: DataFrame, t: Double): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(sqnorm("embedding")))
      .cache() // training collects + both pair-join sides re-scan it
    val out = semanticDedupFrame(e, t)
      // sever lineage before the sort (orderBy re-executes its child
      // for range sampling) and let the corpus cache drop eagerly
      .localCheckpoint()
    e.unpersist()
    val cp = out.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    lastSemanticCp.getAndSet(cp).foreach { rdd =>
      // skip RDDs from a stopped/previous context (their blocks died
      // with it — unpersist against a dead RpcEnv throws), and never
      // let best-effort block cleanup fail the new query
      try if (!rdd.sparkContext.isStopped) rdd.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    out.orderBy(col("vec_id"))
  }

  /** The q80 pipeline up to the lineage cut (expects (vec_id,
    * embedding, nrm)) — separate so the plan guard can inspect the
    * join shape that localCheckpoint truncates from the public form.
    */
  private[graft] def semanticDedupFrame(e: DataFrame, t: Double): DataFrame = {
    val cv = ivfCentroidValues(e)
    val assigned = ivfAssignV(e, cv)
    val a = assigned.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"), col("cell"))
    val b = assigned.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"), col("cell").as("cell_b"))
    val dups = a.join(b, col("cell") === col("cell_b") && col("id_b") < col("id_a"))
      .withColumn("cosine", dround(dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cosine") >= t)
      .groupBy(col("id_a").as("vec_id")).agg(min(col("id_b")).as("dup_of"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** Word 3-gram shingle hash SET per doc, as (doc_id, hs: array<long>).
    * Built entirely map-side: shingling, hashing, mod-P and the
    * per-doc dedup all happen inside one row's array expressions, so
    * the set never needs a distinct() shuffle (the round-1 formulation
    * shuffled every (doc, hash) row twice — once for the global
    * distinct, once for the signature groupBy).
    */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr(s"ngram_hashes(toks, 3, $MinhashP)").as("hs"))
      .cache() // consumed 3× in q52 (signatures + both verify sides)
  }

  val queries: Map[String, Q] = Map(
    // ---- brute-force cosine top-k: broadcast queries × linear scan ----
    "q49_cosine_topk" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val joined = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rk"))
    }),
    // ---- embedding near-duplicates: rounded cosine >= 0.99.
    //      Exact all-pairs as a TILE LOOP of bounded broadcast joins:
    //      the block side is chunked by vec_id mod nTiles so every
    //      broadcast holds <= TileRows vectors (~1 MB at d=64) no matter
    //      how big the corpus is, and each tile runs as a
    //      BroadcastNestedLoopJoin — every task streams its partition
    //      against the in-memory tile. Nothing is ever collected to the
    //      driver. Pairs below a conservative raw threshold
    //      (0.99 - 1e-6 > anything that could round to >= 0.99 at 6 dp)
    //      are dropped inside the join, so the O(n²) pair space is never
    //      materialized as rows. The codegen'd `dotp` left-fold matches
    //      the DuckDB oracle bit-for-bit. ----
    "q50_embedding_neardup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", sqrt(sqnorm("embedding")))
      val TileRows = 4096L
      val nRows = Tables.rowCount(s, dir, "embeddings")
      val nTiles = (((nRows + TileRows - 1) / TileRows).toInt).max(1)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"))
      val tiles = (0 until nTiles).map { t =>
        val b = e.filter(pmod(col("vec_id"), lit(nTiles)) === t)
          .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
            col("nrm").as("nrm_b"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("cosine_raw", dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")))
          .filter(col("cosine_raw") >= 0.989999)
          .select(col("id_a"), col("id_b"), col("cosine_raw"))
      }
      tiles.reduce(_ unionAll _)
        .withColumn("cosine", dround(col("cosine_raw"), 6))
        .filter(col("cosine") >= 0.99)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // ---- SimHash document fingerprints (32-bit, md5-token-derived):
    //      one-pass Aggregator folding every token hash into 32 ±1
    //      counters — ONE shuffle of 32-int buffers per doc with
    //      map-side partials, replacing the round-1 32× bit-explode
    //      and its two grouped aggregations. ----
    "q51_simhash" -> ((s, dir) => {
      val shAgg = udaf(new graft.functions.SimHashAgg(32),
        org.apache.spark.sql.Encoders.scalaLong)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .groupBy(col("doc_id"))
        .agg(shAgg(col("h")).as("simhash"))
        .orderBy(col("doc_id"))
    }),
    // ---- SimHash near-dup JOIN (Manku et al., WWW'07): pairs of
    //      documents whose 32-bit SimHash signatures differ in ≤ 3
    //      bits, found via the block-permutation trick — the signature
    //      splits into 4 byte blocks, and by pigeonhole any pair within
    //      hamming 3 agrees EXACTLY on at least one block, so equal-
    //      block bucketing is a lossless candidate filter; the exact
    //      bit_count(xor) confirm runs on candidates only. Scale shape:
    //      signatures and block slicing are map-side; the only shuffle
    //      is the (block, value) self-join; at production scale the
    //      same plan runs 64-bit signatures with 16-bit blocks (2^16
    //      buckets per table) — the fixture keeps q51's 32-bit oracle
    //      geometry. ----
    "q103_simhash_neardup" -> ((s, dir) => {
      val shAgg = udaf(new graft.functions.SimHashAgg(32),
        org.apache.spark.sql.Encoders.scalaLong)
      val sigs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .groupBy(col("doc_id"))
        .agg(shAgg(col("h")).as("simhash"))
      val blocks = sigs.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), b -> named_struct('blk', b, 'bval', shiftright(simhash, b * 8) % 256))"))
          .as("bb"))
        .select(col("doc_id"), col("simhash"),
          col("bb.blk").as("blk"), col("bb.bval").as("bval"))
      // gate contract: the near-dup CENSUS (pairs per hamming 0..3),
      // not the pair list — the fixture's tiny vocab clusters
      // signatures so hard that the ≤3 pair set is ~2M rows at sf0.1;
      // the 4-row census still breaks on any candidate loss (a missed
      // bucket collision) or double-count (a broken distinct)
      blocks.as("x").join(blocks.as("y"),
          col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
            col("x.doc_id") < col("y.doc_id"))
        // confirm INSIDE the join projection, before any shuffle: the
        // xor/bit_count is a few cycles per candidate. DEDUP is a
        // map-side filter, not an exchange: a qualifying pair reappears
        // once per matching block, and "matching" is visible right here
        // (byte b of the xor is zero) — so counting the pair ONLY at
        // its first zero byte keeps exactly one copy without the old
        // `.distinct()`, whose exchange carried the full qualifying
        // pair set (~2M rows at sf0.1; the census GROUP BY now ships 4
        // partially-aggregated rows per partition instead — guide §2.3)
        .select(col("x.blk").as("blk"),
          col("x.simhash").bitwiseXOR(col("y.simhash")).as("xr"))
        .withColumn("hamming", bit_count(col("xr")).cast(IntegerType))
        .filter(col("hamming") <= 3 &&
          col("blk") === when(shiftright(col("xr"), 0) % 256 === 0, 0)
            .when(shiftright(col("xr"), 8) % 256 === 0, 1)
            .when(shiftright(col("xr"), 16) % 256 === 0, 2)
            .otherwise(3))
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("hamming"))
    }),
    // ---- ANN via a real multi-table sign-LSH index (the 100 TB-scale
    //      similarity path): K=4 tables × L=12 random ±1 hyperplanes
    //      per vector, all computed map-side (one codegen'd dotp per
    //      hyperplane — no shuffle to build the index). Candidates are
    //      vectors sharing any (table, bucket) with a query — expected
    //      pair space O(K·n²/2^L) instead of O(n²) — then exact cosine
    //      re-rank on the candidate ids only. The bucket value is an
    //      integer sum of per-bit terms, so Spark's expression fold and
    //      the oracle's GROUP BY sum agree exactly. ----
    "q53_ann_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
      val candIds = annCandidates(s, dir)
      // query-side lookup as a LOCAL relation (O(queries) metadata —
      // the frame form launched a broadcast-build job over a fourth
      // corpus scan)
      import s.implicits._
      val qe = e.filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .collect().sortBy(_.getLong(0)).toIndexedSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .toDF("q_id", "q_emb", "q_nrm")
      val scored = candIds.join(broadcast(qe), "q_id").join(e, "vec_id")
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      // checkpoint before the final sort: orderBy's range sampling
      // re-executes its child (the q63 lesson)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
        .localCheckpoint()
        .orderBy(col("q_id"), col("rk"))
    }),

    // ---- ANN via IVF-flat (the other classic scale path next to LSH):
    //      a coarse quantizer of C centroids partitions the corpus into
    //      inverted lists; queries probe their nprobe nearest cells and
    //      re-rank exactly inside them. Centroids are k-means-trained
    //      (fixed first-C init + fixed Lloyd iterations, exact integer
    //      sums — deterministic AND oracle-portable, see ivfCentroids).
    //      The STRUCTURE is what scales: training and assignment are
    //      map-side broadcast cross-scores, the candidate join shuffles
    //      on the cell id, and the pair space shrinks to
    //      O(n·nprobe/C) per query. ----
    "q63_ann_ivf" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // cached: training is EAGER (each Lloyd pass collects centroids,
      // re-driving assignment + per-dim sums over the corpus), and the
      // final assignment + probe scoring + query-side lookups scan it
      // again — ~4 full parquet re-reads without the cache. Unpersisted
      // below once the (tiny) result is materialized.
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
        .cache()
      val cv = ivfCentroidValues(e)
      val assigned = ivfAssignV(e, cv)
      // The query set (and so the probe list) is O(queries) index
      // metadata — the serving-side lookup table, same class as the
      // centroids, never the corpus. Collect it ONCE and feed both
      // join sides as LOCAL relations: their broadcast needs no Spark
      // job, where the frame form launched one broadcast-build job
      // per side over the corpus lineage. Probe cells rank by the
      // exact dotp fold order, so scores are bit-identical to the
      // expression path (and the oracle twin).
      val qRows = e.filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .collect().sortBy(_.getLong(0))
      val probePairs: Seq[(Long, Int)] = qRows.toIndexedSeq.flatMap { r =>
        val qemb = r.getSeq[Float](1)
        val qnrm = r.getDouble(2)
        cv.map { case (cid, cemb, cn) =>
          val sc = qemb.indices.foldLeft(0.0)((acc, i) =>
            acc + qemb(i).toDouble * cemb(i).toDouble) / (qnrm * cn)
          (sc, cid)
        }.sortBy { case (sc, cid) => (-sc, cid) }
          .take(IvfNprobe).map { case (_, cid) => (r.getLong(0), cid) }
      }
      import s.implicits._
      val probes = probePairs.toDF("q_id", "cell")
      val qe = qRows.toIndexedSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .toDF("q_id", "q_emb", "q_nrm")
      val scored = assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qe), "q_id")
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      // checkpoint the k·|queries|-row result BEFORE the final sort:
      // orderBy's range-partition sampling re-executes its child, so
      // sorting the un-materialized frame would run the join+window
      // twice — and materializing here also lets the corpus cache drop
      // eagerly instead of lingering for the session
      val out = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
        .localCheckpoint()
      e.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    }),

    // ---- hard-negative mining for contrastive training: for each
    //      anchor, the 5 MOST similar vectors with a DIFFERENT label —
    //      the "hard negatives" a contrastive/metric-learning recipe
    //      mines between epochs (easy negatives are uninformative;
    //      hardness = cosine). Production path, not brute force: the
    //      q63 IVF cells restrict the scan to the anchor's nprobe
    //      nearest cells (the label filter composes with the cell
    //      filter map-side), exact cosine re-ranks inside them. Scale
    //      shape inherits q63's: training treeAggregates, assignment
    //      map-side, ONE cell-keyed join, label hydration co-keyed on
    //      vec_id, per-anchor window (WindowGroupLimit). ----
    "q110_hard_negatives" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
        .cache()
      val cv = ivfCentroidValues(e)
      val assigned = ivfAssignV(e, cv)
        .join(e.select(col("vec_id"), col("label")), "vec_id")
      val qRows = e.filter(col("vec_id") < PqQueryCount)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("label"))
        .collect().sortBy(_.getLong(0))
      val probePairs: Seq[(Long, Int)] = qRows.toIndexedSeq.flatMap { r =>
        val qemb = r.getSeq[Float](1)
        val qnrm = r.getDouble(2)
        cv.map { case (cid, cemb, cn) =>
          val sc = qemb.indices.foldLeft(0.0)((acc, i) =>
            acc + qemb(i).toDouble * cemb(i).toDouble) / (qnrm * cn)
          (sc, cid)
        }.sortBy { case (sc, cid) => (-sc, cid) }
          .take(IvfNprobe).map { case (_, cid) => (r.getLong(0), cid) }
      }
      import s.implicits._
      val probes = probePairs.toDF("q_id", "cell")
      val qe = qRows.toIndexedSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2), r.getInt(3)))
        .toDF("q_id", "q_emb", "q_nrm", "q_label")
      val scored = assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qe), "q_id")
        .filter(col("label") =!= col("q_label"))
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      val out = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"),
          col("label").as("neg_label"), col("cosine"))
        .localCheckpoint()
      e.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    }),
    // ---- product-quantization ANN (ADC shortlist + exact re-rank):
    //      the memory-side of the 100 TB serving story (q63's IVF is
    //      the compute side): the corpus collapses to M=8 4-bit-ish
    //      codes per vector — 16× smaller than the float embeddings —
    //      and the shortlist scan costs M lookup-table reads + M−1
    //      adds per vector, map-side against a broadcast
    //      O(queries·M·K) LUT frame. The exact re-rank then touches
    //      only queries·PqShortlist embedding rows (the q67
    //      candidates-then-exact-recheck discipline), so the output
    //      contract is exact cosine over the shortlist and PQ's
    //      approximation error moves wholly into shortlist recall
    //      (pinned in PqSpec). Training: PqIters shuffle-free
    //      treeAggregates (O(M·K·dsub) driver metadata); encoding:
    //      map-side codeword-literal argmax; both rankings: per-query
    //      windows (WindowGroupLimit, no global sort), rounded scores,
    //      bit-deterministic and oracle-twinned down to the Lloyd
    //      iterations. ----
    "q109_ann_pq" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // cached: training re-scans per Lloyd pass, then encode + the
      // query collect + the re-rank hydration read it again
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val books = pqCodebooks(e)
      // materialize the code frame — this IS the PQ index a serving
      // system persists (M int codes per vector, the 16×-compressed
      // corpus). Left lazy, CollapseProject fuses the 128 struct-array
      // codeword scorings into the post-join projection and re-encodes
      // every (vector, query) pair: measured 13.5 s → 4.1 s for the
      // whole query at sf0.1 (1.9 s warm). Released below once the
      // result is materialized.
      val codes = pqEncode(e, books).localCheckpoint()
      val codesRdds = codes.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      val qRows = e.filter(col("vec_id") < PqQueryCount)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .collect().sortBy(_.getLong(0))
      // per-query ADC lookup tables: exact query-to-codeword inner
      // products (index fold order = dotp = the oracle's list_reduce);
      // dead cids keep a 0.0 slot no code can reference
      val qdf = {
        val lutRows = qRows.toIndexedSeq.map { r =>
          val emb = r.getSeq[Float](1)
          val luts = IndexedSeq.tabulate(PqM) { sub =>
            val arr = new Array[Double](PqK)
            books(sub).foreach { case (cid, c) =>
              var acc = 0.0; var i = 0
              while (i < PqDsub) { acc += emb(sub * PqDsub + i).toDouble * c(i).toDouble; i += 1 }
              arr(cid) = acc
            }
            arr.toSeq
          }
          org.apache.spark.sql.Row.fromSeq(r.getLong(0) +: luts)
        }
        val schema = StructType(StructField("q_id", LongType, nullable = false) +:
          (0 until PqM).map(sub =>
            StructField(s"lut$sub", ArrayType(DoubleType, containsNull = false), nullable = false)))
        s.createDataFrame(java.util.Arrays.asList(lutRows: _*), schema)
      }
      val adc = (0 until PqM).map(sub =>
        element_at(col(s"lut$sub"), col(s"code$sub") + 1))
        .reduceLeft(_ + _)
      import org.apache.spark.sql.expressions.Window
      val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
      val shortlist = codes.crossJoin(broadcast(qdf))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adc", dround(adc, 6))
        .withColumn("crk", row_number().over(wAdc))
        .filter(col("crk") <= PqShortlist)
        .select(col("q_id"), col("vec_id"))
      // exact re-rank: hydrate the queries·PqShortlist candidate rows
      // with their embeddings (the shortlist broadcasts — it is index
      // metadata, never the corpus) and score exact cosine, q63's tail
      val qe = {
        import s.implicits._
        qRows.toIndexedSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
          .toDF("q_id", "q_emb", "q_nrm")
      }
      val wX = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      val out = e.join(broadcast(shortlist), "vec_id")
        .join(broadcast(qe), "q_id")
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
        .withColumn("rk", row_number().over(wX))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
        .localCheckpoint()
      e.unpersist()
      codesRdds.foreach(_.unpersist(false))
      out.orderBy(col("q_id"), col("rk"))
    }),
    // ---- IVF-PQ compose (the FAISS IVFPQ architecture, Jégou
    //      TPAMI'11 §V): q63's IVF cells prune COMPUTE (scan nprobe
    //      cells, not the corpus), q109's PQ prunes MEMORY — but
    //      trained on cell RESIDUALS x − c(cell), which quantize far
    //      tighter than raw vectors (the residual trick that makes
    //      billion-scale recall workable). Scoring decomposes exactly:
    //      dot(q, x) ≈ dot(q, c_cell) [driver scalar per (q, cell)]
    //      + Σ_s lut_s[code_s] [residual ADC]. The index = (cell,
    //      M codes) per vector, checkpointed; the scan touches
    //      probed-cell rows only, map-side against broadcast
    //      (probe offsets + residual LUTs); exact cosine re-ranks the
    //      per-query shortlist (q67 discipline). Residuals are
    //      float-cast double differences — one rounding both engines
    //      perform identically — so training, codes, ADC and rerank
    //      all stay bit-deterministic and oracle-twinned. ----
    "q111_ann_ivfpq" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val cv = ivfCentroidValues(e)
      val assigned = ivfAssignV(e, cv)
      // residual in float: CAST(double(x) − double(c) AS FLOAT) — the
      // exact form the oracle twin mirrors per element, as one
      // model-carrying node (no centroid join; r16 opt round)
      val residuals = {
        import org.apache.spark.sql.GraftColumnAccess.{column, expression}
        assigned.withColumn("embedding", column(graft.functions.ResidualVec(
            expression(col("embedding")), expression(col("cell")),
            graft.functions.CellModel.of(cv))))
          .select(col("vec_id"), col("cell"), col("embedding"))
      }
      val books = pqCodebooks(residuals.cache())
      // the IVFPQ index: (cell, M residual codes) per vector,
      // checkpointed (same rationale as q109's code frame); `keep`
      // threads the cell through encoding — no join-back shuffle
      val codes = pqEncode(residuals, books, keep = Seq("cell"))
        .localCheckpoint()
      residuals.unpersist()
      val codesRdds = codes.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      val out = ivfpqServe(s, e, cv, books, codes).localCheckpoint()
      e.unpersist()
      codesRdds.foreach(_.unpersist(false))
      out.orderBy(col("q_id"), col("rk"))
    }),
    // ---- persisted-index serving (the production restart story):
    //      build the q111 IVFPQ index, PERSIST it as two lakehouse
    //      tables (model = centroids + residual codebooks, codes =
    //      the cell-partitioned compressed corpus), then reload in a
    //      FRESH session and serve — zero training jobs on the reload
    //      path (AnnIndexSpec pins that with a job-group listener).
    //      Same oracle as q111: persistence must be bit-lossless. ----
    // ---- incremental-index serving (the production ingestion story):
    //      build the IVFPQ index on the BASE three quarters of the
    //      corpus, APPEND the rest with encode-on-append (frozen
    //      codebooks — per-batch cost, never corpus cost), reload in a
    //      fresh session and serve over the mixed index. The oracle
    //      trains its CTE chain on the same base slice and encodes
    //      everything against the frozen books, so this gates the
    //      WHOLE incremental contract: what append writes must be
    //      exactly what full training on the base would have encoded. ----
    "q116_ann_index_incremental" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annincr_" + Integer.toHexString(dir.hashCode)).toString
      val all = Tables.load(s, dir, "embeddings")
      graft.lakehouse.AnnIndex.build(s, all.filter(col("vec_id") % 4 =!= 0), root)
      graft.lakehouse.AnnIndex.append(s, all.filter(col("vec_id") % 4 === 0), root)
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, root)
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val out = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes)
        .localCheckpoint()
      e2.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    }),
    // ---- index-hygiene removal (round 8): build on the FULL corpus,
    //      delete a fifth of the vectors from the live codes table
    //      (the decontamination → stop-serving path), reload in a
    //      fresh session, serve. The oracle trains its CTE chain on
    //      the full corpus but serves only the kept codes
    //      (servePred), so the gate proves removal touches EXACTLY
    //      the requested ids — codebooks, centroids and every other
    //      vector's codes must be bit-unchanged, and no removed id
    //      may surface in any top-5. ----
    "q122_ann_index_remove" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annrm_" + Integer.toHexString(dir.hashCode)).toString
      val all = Tables.load(s, dir, "embeddings")
      graft.lakehouse.AnnIndex.build(s, all, root)
      graft.lakehouse.AnnIndex.remove(s,
        all.filter(col("vec_id") % 5 === 3).select("vec_id"), root)
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, root)
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val out = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes)
        .localCheckpoint()
      e2.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    }),
    "q114_ann_index_reuse" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annindex_" + Integer.toHexString(dir.hashCode)).toString
      graft.lakehouse.AnnIndex.build(s, Tables.load(s, dir, "embeddings"), root)
      // a fresh session state: no cached frames, no temp views — the
      // reload path must stand on the persisted tables alone
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, root)
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val out = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes)
        .localCheckpoint()
      e2.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    }),
    // ---- index × corpus versioning (round 14, q114 family): build the
    //      persisted IVF-PQ index FROM a lakehouse corpus table pinned
    //      at a release TAG; the pin is recorded in the index pointer,
    //      a fresh-session load reads the lineage back, time travel to
    //      the recorded snapshot reproduces exactly the training input
    //      (the corpus advancing past the release never leaks into the
    //      index), and the reloaded index serves the full query set —
    //      end-to-end reproducible retrieval with q144/q146's pinned
    //      streams. ----
    "q147_ann_provenance" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val corpusRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_anncorp_" + Integer.toHexString(dir.hashCode)).toString
      val idxRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annprov_" + Integer.toHexString(dir.hashCode)).toString
      Seq(corpusRoot, idxRoot).foreach(p =>
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(p)))
      val corpus = new graft.lakehouse.LakehouseTable(s, corpusRoot)
      corpus.append(Tables.load(s, dir, "embeddings").repartition(2)) // snap 1
      corpus.setTag("corpus-v1", 1L)
      graft.lakehouse.AnnIndex.buildFromCorpus(
        s, corpusRoot, idxRoot, tag = Some("corpus-v1"))
      // the corpus advances past the release — invisible to the index
      corpus.append(Seq((900001L, Seq.fill(AnnDim)(0.25f), 0))
        .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>")).coalesce(1)) // snap 2
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, idxRoot)
      val prov = idx.provenance.getOrElse(
        sys.error("q147: the reloaded index lost its corpus provenance"))
      val pinned = new graft.lakehouse.LakehouseTable(s2, prov.table)
        .scanAtSnapshot(prov.snapshotId).count()
      val now = new graft.lakehouse.LakehouseTable(s2, prov.table)
        .read().count()
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val served = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes).count()
      e2.unpersist()
      Seq(
        ("built_on_snapshot", prov.snapshotId.toString),
        ("corpus_rows_at_pin", pinned.toString),
        ("corpus_rows_now", now.toString),
        ("served_rows", served.toString),
        ("tag", prov.tag.getOrElse("-")))
        .toDF("step", "v").orderBy(col("step"))
    }),
    // ---- ANN maintenance loop (round 15, q116 family): frozen-
    //      codebook appends DRIFT cell occupancy — the manifest-only
    //      occupancy probe shows it, rebalanceFromCorpus re-clusters
    //      the coarse cells on a pinned corpus tag while KEEPING the
    //      published codebooks bit-identical, occupancy flattens,
    //      recall@5 stays ON PAR with a full rebuild of the same
    //      pinned corpus (keeping the books is free — codebook
    //      training, the expensive half, is skipped), and the
    //      provenance pin bumps to the rebalanced tag — closing
    //      q147's reproducibility loop across the maintenance
    //      cycle. ----
    "q150_ann_rebalance" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val corpusRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annrebc_" + Integer.toHexString(dir.hashCode)).toString
      val idxRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annrebi_" + Integer.toHexString(dir.hashCode)).toString
      Seq(corpusRoot, idxRoot).foreach(p =>
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(p)))
      val corpus = new graft.lakehouse.LakehouseTable(s, corpusRoot)
      val base = Tables.load(s, dir, "embeddings")
      corpus.append(base.repartition(2)) // snap 1
      corpus.setTag("bal-v1", 1L)
      val built = graft.lakehouse.AnnIndex.buildFromCorpus(
        s, corpusRoot, idxRoot, tag = Some("bal-v1"))
      val occ0 = graft.lakehouse.AnnIndex.occupancy(s, idxRoot)
      // corpus drift: five tight, far-apart blobs — frozen centroids
      // pile them into whichever old cells sit nearest. Sized WITH the
      // corpus so the skew signal is SF-independent (a fixed 300 rows
      // would vanish into sf0.1's cell means).
      val driftN = math.max(300L, base.count()).toInt
      val drift = (0 until driftN).map { i =>
        val g = i * 5 / driftN
        (910000L + i, Seq.tabulate(AnnDim)(d =>
          (if (d >= g * 12 && d < g * 12 + 12) 30.0f else 0.0f) +
            0.01f * ((i + d) % 5)), 9)
      }.toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      corpus.append(drift.coalesce(1)) // snap 2: the drifted release
      corpus.setTag("bal-v2", 2L)
      graft.lakehouse.AnnIndex.append(s, drift, idxRoot)
      val occ1 = graft.lakehouse.AnnIndex.occupancy(s, idxRoot)
      val preRebal = graft.lakehouse.AnnIndex.load(s, idxRoot)
      val rebal = graft.lakehouse.AnnIndex.rebalanceFromCorpus(
        s, corpusRoot, idxRoot, tag = Some("bal-v2"))
      val occ2 = graft.lakehouse.AnnIndex.occupancy(s, idxRoot)
      def flat(b: Array[IndexedSeq[(Int, Array[Float])]]) =
        b.toSeq.map(_.map { case (c, a) => (c, a.toSeq) })
      // fresh session: the bumped pin reads back and serving is intact
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, idxRoot)
      val prov = idx.provenance.getOrElse(
        sys.error("q150: rebalance lost the corpus provenance"))
      val eAll = new graft.lakehouse.LakehouseTable(s2, corpusRoot)
        .scanAtSnapshot(prov.snapshotId).cache()
      def topOf(h: graft.lakehouse.AnnIndexHandle): Array[(Long, Long)] =
        graft.lakehouse.AnnIndex.serve(s2, h, eAll)
          .select("q_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      val served = topOf(idx)
      val servedBefore = topOf(preRebal)
      // exact top-5 on the same pinned corpus (the q49 baseline shape)
      val en = eAll.withColumn("nrm", sqrt(sqnorm("embedding")))
      val q = en.filter(col("vec_id") < PqQueryCount)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val wE = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      val exact = en.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
        .withColumn("rk", row_number().over(wE)).filter(col("rk") <= 5)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      eAll.unpersist()
      def recallOf(top: Array[(Long, Long)]): Double = {
        val rs = exact.map { case (qid, want) =>
          top.filter(_._1 == qid).map(_._2).toSet.intersect(want).size.toDouble /
            want.size
        }
        rs.sum / rs.size
      }
      val recall = recallOf(served)
      val recallBefore = recallOf(servedBefore)
      val fullRoot = idxRoot + "-full"
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(fullRoot))
      val full = graft.lakehouse.AnnIndex.buildFromCorpus(
        s2, corpusRoot, fullRoot, tag = Some("bal-v2"))
      val recallFull = recallOf(topOf(full))
      def b(x: Boolean) = if (x) "1" else "0"
      Seq(
        ("1_built_cells_gt1", b(occ0.cells > 1)),
        ("2_drift_skewed", b(occ1.skew > occ0.skew && occ1.max > occ0.max)),
        ("3_books_kept", b(flat(rebal.books) == flat(built.books))),
        ("4_rows_kept", b(occ2.rows == occ1.rows)),
        ("5_skew_repaired", b(occ2.skew < occ1.skew && occ2.max < occ1.max)),
        ("6_prov", s"${prov.snapshotId}:${prov.tag.getOrElse("-")}"),
        // rebalance must be RECALL-EQUIVALENT to the full rebuild on
        // the same pinned corpus (keeping the books is free); the
        // absolute level under this synthetic drift is a property of
        // the fixed C/nprobe geometry (5 of 16 cells absorb the blobs
        // — the production answer is growing C with the corpus), which
        // both maintenance ops share, so the gate pins the PARITY, not
        // the level, plus a floor against collapse
        ("7_recall_parity", b(recall >= recallFull - 0.05 && recall >= 0.3 &&
          recallBefore >= 0.5)),
        ("8_served_rows", served.length.toString))
        .toDF("step", "v").orderBy(col("step"))
    }),
    // ---- embedding near-dup, production path: sign-LSH candidates +
    //      exact re-check. Same output contract (and DuckDB all-pairs
    //      oracle) as the q50 baseline, but the pair space is
    //      O(K·n²/2^L) instead of O(n²) — the version the composed
    //      pipelines should call on full corpora. ----
    "q67_neardup_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      neardupLsh(Tables.load(s, dir, "embeddings"))
    }),
    // ---- SemDeDup semantic deduplication: the q63 k-means partitions
    //      the corpus; within-cell cosine prunes near-duplicates
    //      (keep-lowest-id). See semanticDedup for the scale shape. ----
    "q80_semantic_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      semanticDedup(Tables.load(s, dir, "embeddings"), SemDedupT)
    }),
    // ---- composed embedding curation: the chain a production vector
    //      pipeline runs before serving — q96's diagonal-Mahalanobis
    //      screen drops the 32 most extreme vectors (corrupt/OOD), then
    //      q80's SemDeDup prunes semantic near-duplicates among the
    //      SURVIVORS. Gates the COMPOSITION of two already-gated
    //      stages: the outlier stats come from the full corpus, the
    //      k-means cells retrain on the clean set (seeds = clean ∩
    //      vec_id < C, exactly what the oracle's parameterized CTE
    //      chain reproduces). Scale shape inherits both stages: one
    //      treeAggregate pass + map-side scoring + a 32-row broadcast
    //      anti-join, then the sub-quadratic cell-local dedup. ----
    "q98_embed_curation" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings")
      val outliers = graft.functions.Pca
        .diagMahalanobisScore(emb, "embedding", AnnDim)
        .select(col("vec_id"), col("q_score"))
        .orderBy(col("q_score").desc, col("vec_id"))
        .limit(32)
        .select(col("vec_id"))
      val clean = emb.join(broadcast(outliers), Seq("vec_id"), "left_anti")
      semanticDedup(clean, SemDedupT)
    }),
    // ---- retrieval serving compose: the RAG-shaped query path — the
    //      servable corpus is the q64 quality/language survivor set
    //      (vec_id ≡ doc_id in the fixture, 1:1 by construction), each
    //      query vector takes exact cosine top-5 over the SURVIVORS,
    //      and hits hydrate document metadata for the caller. Gates the
    //      composition of the quality gate, the ANN-oracle scoring
    //      contract, and the metadata join. Scale shape: the survivor
    //      filter is a key join before any scoring (score only what you
    //      may serve), queries ride one broadcast, ranking is a
    //      per-query window (WindowGroupLimit — no global sort), and
    //      the hydrate join keys on doc_id. ----
    "q99_retrieval_serve" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val keep = LlmTextQueries.corpusFilterSurvivors(s, dir)
        .select(col("doc_id").as("vec_id"))
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"))
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
      val corpus = e.join(keep, "vec_id")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      corpus.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("doc_id"), col("cosine"))
        .join(docs, "doc_id")
        .select(col("q_id"), col("rk"), col("doc_id"), col("cosine"),
          col("source"), col("lang"))
        .orderBy(col("q_id"), col("rk"))
    }),
    // ---- symmetric int8 embedding quantization — the serving-side
    //      memory step before ANN (4× smaller vectors, SIMD-friendly
    //      int dot products). Per vector: scale = 127/max|x|, q_i =
    //      round(x_i·scale), clamped by construction since |x|≤max|x|.
    //      Entirely map-side. Rounding is floor(x+0.5) (IEEE mul/add/
    //      floor only — portable); widening FLOAT→DOUBLE casts are
    //      exact in both engines, so the int summaries are bit-stable. ----
    "q73_embed_quantize" -> ((s, dir) => {
      Tables.load(s, dir, "embeddings")
        .withColumn("maxabs",
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
        .withColumn("q", expr(
          """transform(embedding, x -> CASE WHEN maxabs = 0D THEN 0
             ELSE CAST(floor(CAST(x AS DOUBLE) / maxabs * 127.0D + 0.5D) AS INT) END)"""))
        .select(col("vec_id"),
          size(col("embedding")).as("n_dims"),
          dround(col("maxabs"), 6).as("maxabs_r"),
          expr("aggregate(q, 0, (a, x) -> a + x)").as("q_sum"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"))
        .orderBy(col("vec_id"))
    }),
    // ---- MinHash + LSH banding near-dup (the 100 TB-scale dedup path) ----
    "q52_minhash_lsh" -> ((s, dir) => {
      val (pairs, docsH) = minhashPairs(s, dir)
      // materialize the (tiny) verified pair set, then drop the shingle
      // cache — without the checkpoint the cache entry would linger in
      // executor storage for the session (the q67 ADVICE pattern), and
      // without the lineage cut the final sort would recompute through
      // the now-uncached arrays
      val out = pairs.localCheckpoint()
      docsH.unpersist()
      out.orderBy(col("doc_a"), col("doc_b"))
    }),
    // ---- MERGE-ON-READ index removal (round 16, the q122 twin at key-
    //      file cost): removal lands as a cell-partitioned key
    //      tombstone — zero data-file rewrites, occupancy still answers
    //      from the MANIFEST alone (per-cell subtraction), a fresh
    //      session serves the removal immediately through the MoR mask,
    //      and folding the tombstone changes nothing bit-for-bit. Same
    //      oracle as q122: the two removal mechanisms must be
    //      indistinguishable to every consumer. ----
    "q152_index_mor_remove" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annmorrm_" + Integer.toHexString(dir.hashCode)).toString
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val all = Tables.load(s, dir, "embeddings")
      graft.lakehouse.AnnIndex.build(s, all, root)
      val occ0 = graft.lakehouse.AnnIndex.occupancy(s, root)
      val victims = all.filter(col("vec_id") % 5 === 3).select("vec_id")
      val nVictims = victims.count()
      def codesT = new graft.lakehouse.LakehouseTable(s,
        root + "/codes.v" + graft.lakehouse.AnnIndex.currentVersion(root).get)
      val dataFilesBefore = codesT.currentSnapshot().get.files.toSet
      graft.lakehouse.AnnIndex.remove(s, victims, root, mergeOnRead = true)
      val snap = codesT.currentSnapshot().get
      require(snap.files.toSet == dataFilesBefore,
        "MoR removal must rewrite ZERO data files")
      require(snap.tombstones.nonEmpty && snap.tombstones.forall(_.contains("cell=")),
        "MoR removal must land a cell-partitioned key tombstone")
      val occ1 = graft.lakehouse.AnnIndex.occupancy(s, root)
      require(occ1.rows == occ0.rows - nVictims,
        s"occupancy must subtract removed keys from the manifest: $occ0 -> $occ1")
      // a FRESH session proves the removal serves through the mask
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, root)
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val served = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes)
        .localCheckpoint()
      // compaction folds the mask away; serving is unchanged
      require(codesT.foldTombstones().exists(_.operation == "fold"),
        "the removal tombstone must fold")
      require(codesT.currentSnapshot().get.tombstones.isEmpty)
      val idx2 = graft.lakehouse.AnnIndex.load(s2, root)
      val served2 = ivfpqServe(s2, e2, idx2.centroids, idx2.books, idx2.codes)
        .localCheckpoint()
      require(served2.exceptAll(served).isEmpty && served.exceptAll(served2).isEmpty,
        "folding the removal tombstone must not change a single served row")
      e2.unpersist()
      served.orderBy(col("q_id"), col("rk"))
    }),
    // ---- corpus→index INCREMENTAL SYNC (round 16): the live
    //      maintenance half of the corpus-release loop. The index is
    //      built from a pinned corpus state; the corpus then gains new
    //      docs AND loses a contamination set; ONE syncFromCorpus call
    //      diffs exactly the change range (changesBetween — change
    //      volume, never table volume), MoR-removes the departed keys,
    //      re-encodes the arrivals against the FROZEN published books,
    //      and advances the provenance pin to the head. The oracle
    //      trains on the initial corpus and serves the final live set —
    //      so the gate proves the sync lands exactly the diff, encoded
    //      exactly as the incremental contract demands. ----
    "q153_index_sync" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val corpusRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annsyncc_" + Integer.toHexString(dir.hashCode)).toString
      val idxRoot = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_annsynci_" + Integer.toHexString(dir.hashCode)).toString
      Seq(corpusRoot, idxRoot).foreach(p =>
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(p)))
      val all = Tables.load(s, dir, "embeddings")
      val corpus = new graft.lakehouse.LakehouseTable(s, corpusRoot)
      corpus.append(all.filter(col("vec_id") % 4 =!= 0).repartition(2)) // snap 1
      graft.lakehouse.AnnIndex.buildFromCorpus(s, corpusRoot, idxRoot)
      val pin0 = graft.lakehouse.AnnIndex.provenance(idxRoot).get
      require(pin0.snapshotId == 1L, s"build must pin the corpus head: $pin0")
      // the corpus moves on: new documents arrive, a decontamination
      // pass deletes flagged ones — the index sees NONE of it yet
      corpus.append(all.filter(col("vec_id") % 4 === 0).coalesce(1)) // snap 2
      corpus.applyChanges(
        all.filter(col("vec_id") % 5 === 3).select("vec_id")
          .withColumn("_change", lit("delete")),
        Seq("vec_id"), mergeOnRead = true) // snap 3
      val (ins, rm) = graft.lakehouse.AnnIndex.syncFromCorpus(s, corpusRoot, idxRoot)
      require(ins > 0 && rm > 0, s"the sync must land both halves: +$ins/-$rm")
      val pin1 = graft.lakehouse.AnnIndex.provenance(idxRoot).get
      require(pin1.snapshotId == corpus.currentSnapshot().get.snapshotId,
        s"the provenance pin must advance to the drained head: $pin1")
      // in-step re-run: a no-op, no version churn
      require(graft.lakehouse.AnnIndex.syncFromCorpus(s, corpusRoot, idxRoot) == ((0L, 0L)),
        "an in-step sync must be a no-op")
      val s2 = s.newSession()
      graft.functions.GraftFunctions.register(s2)
      val idx = graft.lakehouse.AnnIndex.load(s2, idxRoot)
      val e2 = Tables.load(s2, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding"))).cache()
      val out = ivfpqServe(s2, e2, idx.centroids, idx.books, idx.codes)
        .localCheckpoint()
      e2.unpersist()
      out.orderBy(col("q_id"), col("rk"))
    })
  )

  /** q52's pipeline up to (but not including) materialization: returns
    * the verified-pair frame plus the cached shingle frame so the
    * caller controls checkpoint + cache release — and so the CI plan
    * guard can inspect the REAL plan (a localCheckpoint would truncate
    * it to a Scan ExistingRDD).
    */
  private[graft] def minhashPairs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
      val docsH = shingleHashes(s, dir)
      val sh = docsH.select(col("doc_id"), explode(col("hs")).as("h"))
      // k minhash values per doc in ONE pass: the Aggregator keeps k
      // running minima per doc, so the shuffle carries one k-long array
      // per (doc, partition) instead of k rows per shingle — O(docs·k)
      // vs O(shingles·k) at 100 TB. Applied through udaf() (untyped
      // column route): rows stay in Tungsten with map-side partial
      // aggregation, unlike groupByKey which deserializes per row.
      // Identical results to explode + groupBy-min (and the oracle).
      val mhUdaf = udaf(new graft.functions.MinHashAgg(
        minhashA.toArray, minhashB.toArray, MinhashP),
        org.apache.spark.sql.Encoders.scalaLong)
      val rows = MinhashK / MinhashBands
      // Band keys sliced straight out of the signature array — one
      // map-side expression per doc. (Round 1 posexploded the signature
      // and re-grouped by (doc, band): a second full shuffle that
      // carried k rows per doc for information already sitting in one
      // array. The slice formulation is shuffle-free.)
      val bands = sh.groupBy(col("doc_id"))
        .agg(mhUdaf(col("h")).as("sig"))
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(0, ${MinhashBands - 1}),
                b -> struct(b AS band,
                  concat_ws('-', CAST(slice(sig, b * $rows + 1, $rows) AS ARRAY<STRING>)) AS band_key))"""))
          .as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      // Exact-Jaccard verify straight off the per-doc hash-set arrays:
      // broadcasting the tiny candidate-pair set turns both lookups into
      // map-side joins over the cached arrays, and |∩| is a per-row
      // array_intersect — no h-equality self-join, no re-shuffle of the
      // shingle stream at all. (Round 1 shuffled the full (doc, h)
      // stream twice here.)
      val verified = broadcast(cand)
        .join(docsH.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
        .join(docsH.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).as("inter"),
          size(col("hs_a")).as("sz_a"), size(col("hs_b")).as("sz_b"))
      val pairs = verified
        .withColumn("jaccard", dround(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType), 6))
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      (pairs, docsH)
  }

  private val R = droundSql

  private def neardupAllPairsSql: String = s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings)
      SELECT id_a, id_b, cosine FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${R(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      WHERE cosine >= 0.99
      ORDER BY id_a, id_b"""

  private def minhashFamilyValues: String =
    minhashA.zip(minhashB).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** The ANN hyperplanes as DuckDB VALUES rows `(tbl, bit, wv)`. */
  private def annPlaneSqlValues: String =
    (for (t <- 0 until AnnTables; l <- 0 until AnnBits) yield {
      val lst = annPlane(t, l).map(v => if (v > 0f) "1.0" else "-1.0").mkString(",")
      s"($t, $l, [$lst]::DOUBLE[])"
    }).mkString(", ")

  /** Shared WITH-chain body for the IVF-backed oracles (q63, q80): the
    * Lloyd iterations mirrored CTE-by-CTE from
    * [[ivfCentroidValues]]/[[ivfAssignV]] (same quantized integer sums,
    * same IEEE mean, same float cast — bit-identical centroids by
    * construction), ending at `ranked` (per-vec centroid ranking) and
    * `assigned` (vec_id, embedding, nrm, cell).
    */
  /** `trainPred` restricts TRAINING (seed pick + Lloyd refinement) to a
    * row subset while the final assignment still covers every row —
    * the incremental-index contract (q116: centroids frozen on the
    * base slice, appended vectors assigned against them).
    */
  private def ivfAssignCtes(source: String = "embeddings",
      trainPred: String = "TRUE"): String = {
    val iterCtes = (1 to IvfIters).map { k =>
      s"""
      scored$k AS (
        SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
          ${dotSql("e.embedding", "c.c_emb")}
            / (e.nrm * sqrt(${dotSql("c.c_emb", "c.c_emb")})) AS cscore
        FROM e CROSS JOIN cents${k - 1} c WHERE ($trainPred)),
      assigned$k AS (
        SELECT vec_id, embedding, cent_id AS cell FROM (
          SELECT vec_id, embedding, cent_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
          FROM scored$k) WHERE crk = 1),
      sums$k AS (
        SELECT cell, pos,
          sum(CAST(floor(CAST(embedding[pos + 1] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS s,
          count(*) AS n
        FROM assigned$k CROSS JOIN (SELECT unnest(range($AnnDim)) AS pos) d
        GROUP BY cell, pos),
      cents$k AS (
        SELECT cell AS cent_id,
          list(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 AS FLOAT) ORDER BY pos) AS c_emb
        FROM sums$k GROUP BY cell)"""
    }.mkString(",")
    s"""e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM $source),
      cents0 AS (SELECT CAST(vec_id AS INT) AS cent_id, embedding AS c_emb
                 FROM e WHERE ($trainPred) AND vec_id < $IvfC),$iterCtes,
      scored_cells AS (
        SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
          ${dotSql("e.embedding", "c.c_emb")}
            / (e.nrm * sqrt(${dotSql("c.c_emb", "c.c_emb")})) AS cscore
        FROM e CROSS JOIN cents$IvfIters c),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
        FROM scored_cells),
      assigned AS (SELECT vec_id, embedding, nrm, cent_id AS cell
                   FROM ranked WHERE crk = 1)"""
  }

  /** The q63 twin: the shared IVF chain plus the probe/re-rank tail. */
  private def ivfOracleSql: String = s"""
      WITH ${ivfAssignCtes()},
      probes AS (SELECT vec_id AS q_id, cent_id AS cell
                 FROM ranked WHERE vec_id < 20 AND crk <= $IvfNprobe),
      qe AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
             FROM e WHERE vec_id < 20),
      scored AS (
        SELECT p.q_id, a.vec_id,
          ${R(s"${dotSql("qe.q_emb", "a.embedding")} / (qe.q_nrm * a.nrm)", 6)} AS cosine
        FROM assigned a
          JOIN probes p ON a.cell = p.cell
          JOIN qe ON p.q_id = qe.q_id
        WHERE a.vec_id <> p.q_id)
      SELECT q_id, rk, vec_id AS neighbor_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY q_id, rk"""

  /** The q109 twin: per-subspace Lloyd (same quantized-BIGINT sums /
    * float-cast means as the engine), encode via the same
    * `dot − |c|²/2` ranking, LUT join with explicit left-to-right ADC
    * addition (never SUM — aggregation order isn't deterministic).
    * Every CTE is MATERIALIZED: DuckDB inlines multi-referenced CTEs,
    * and each p{s}c2 feeds both its encode and its LUT — inlined, the
    * whole per-subspace Lloyd chain re-executes per reference and the
    * plan tree grows exponentially in chain depth (measured: >9 min
    * inlined vs 0.9 s materialized on the sf0.001 fixture).
    */
  private def pqMaterialize(sql: String): String =
    sql.replace("AS (", "AS MATERIALIZED (")

  /** The per-subspace PQ CTE chain (init → Lloyd iters → encode → LUT),
    * parameterized on the training source (`e` for raw-vector PQ, the
    * residual CTE for IVF-PQ) and the query source (always raw
    * vectors). Both must expose (vec_id, embedding). `encodeSrc`
    * separates WHO gets encoded from who trained (the incremental
    * contract: frozen codebooks from the base slice encode everything).
    */
  private def pqChainCtes(trainSrc: String, querySrc: String,
      encodeSrc: Option[String] = None): String = {
    val encSrc = encodeSrc.getOrElse(trainSrc)
    def sliceOf(expr: String, s: Int): String =
      s"$expr[${s * PqDsub + 1}:${(s + 1) * PqDsub}]"
    (0 until PqM).map { s =>
      val init = s"""
      p${s}c0 AS (SELECT CAST(vec_id AS INT) AS cid, ${sliceOf("embedding", s)} AS c
                  FROM $trainSrc WHERE vec_id < $PqK)"""
      val iters = (1 to PqIters).map { j =>
        s"""
      p${s}sc$j AS (
        SELECT t.vec_id, c.cid,
          ${dotSql(sliceOf("t.embedding", s), "c.c")} - ${dotSql("c.c", "c.c")} / 2.0 AS score
        FROM $trainSrc t CROSS JOIN p${s}c${j - 1} c),
      p${s}as$j AS (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rk
          FROM p${s}sc$j) WHERE rk = 1),
      p${s}sm$j AS (
        SELECT a.cid, pos,
          sum(CAST(floor(CAST(t.embedding[${s * PqDsub} + pos + 1] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS s,
          count(*) AS n
        FROM p${s}as$j a JOIN $trainSrc t ON t.vec_id = a.vec_id
          CROSS JOIN (SELECT unnest(range($PqDsub)) AS pos) d
        GROUP BY a.cid, pos),
      p${s}c$j AS (
        SELECT cid, list(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 AS FLOAT) ORDER BY pos) AS c
        FROM p${s}sm$j GROUP BY cid)"""
      }.mkString(",")
      val encode = s"""
      p${s}enc AS (
        SELECT vec_id, cid AS code$s FROM (
          SELECT t.vec_id, c.cid,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ${dotSql(sliceOf("t.embedding", s), "c.c")} - ${dotSql("c.c", "c.c")} / 2.0 DESC,
              c.cid) AS rk
          FROM $encSrc t CROSS JOIN p${s}c$PqIters c) WHERE rk = 1),
      p${s}lut AS (
        SELECT q.vec_id AS q_id, c.cid,
          ${dotSql(sliceOf("q.embedding", s), "c.c")} AS val
        FROM $querySrc q CROSS JOIN p${s}c$PqIters c WHERE q.vec_id < $PqQueryCount)"""
      init + "," + iters + "," + encode
    }.mkString(",")
  }

  private def pqCodeJoin: String = (1 until PqM)
    .map(s => s"JOIN p${s}enc e$s ON e$s.vec_id = e0.vec_id").mkString(" ")
  private def pqLutJoin(probeAlias: String): String = (1 until PqM)
    .map(s => s"JOIN p${s}lut l$s ON l$s.q_id = $probeAlias.q_id AND l$s.cid = v.code$s")
    .mkString(" ")

  private def pqOracleSql: String = {
    val subCtes = pqChainCtes("e", "e")
    val codeJoin = pqCodeJoin
    val lutJoin = (1 until PqM)
      .map(s => s"JOIN p${s}lut l$s ON l$s.q_id = l0.q_id AND l$s.cid = v.code$s")
      .mkString(" ")
    val adcSum = (0 until PqM).map(s => s"l$s.val").mkString(" + ")
    pqMaterialize(s"""
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM embeddings),$subCtes,
      codes AS (
        SELECT e0.vec_id, e0.code0${(1 until PqM).map(s => s", e$s.code$s").mkString}
        FROM p0enc e0 $codeJoin),
      adc AS (
        SELECT l0.q_id, v.vec_id, ${R(adcSum, 6)} AS score
        FROM codes v
        JOIN p0lut l0 ON l0.cid = v.code0 $lutJoin
        WHERE v.vec_id <> l0.q_id),
      shortlist AS (
        SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS crk
          FROM adc)
        WHERE crk <= $PqShortlist),
      reranked AS (
        SELECT sl.q_id, sl.vec_id,
          ${R(s"${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)", 6)} AS cosine
        FROM shortlist sl
        JOIN e c ON c.vec_id = sl.vec_id
        JOIN e q ON q.vec_id = sl.q_id)
      SELECT q_id, rk, vec_id AS neighbor_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM reranked)
      WHERE rk <= 5
      ORDER BY q_id, rk""")
  }

  /** The q111 twin: IVF chain (q63's CTEs) → per-cell residuals
    * (float-cast double differences) → the PQ chain TRAINED ON
    * RESIDUALS with LUTs from raw query vectors → coarse offset
    * dot(q, c_cell) + residual ADC → shortlist → exact rerank.
    */
  private def ivfpqOracleSql: String = ivfpqOracleSqlFor("TRUE")

  /** The q116 twin: the SAME IVFPQ math with training confined to the
    * base slice (vec_id % 4 <> 0) — centroids and codebooks never see
    * the appended quarter, every vector (base + appended) encodes
    * against the frozen books, and serving covers the whole index.
    * Mirrors AnnIndex.build(base) + AnnIndex.append(rest) exactly.
    */
  private def ivfpqIncrementalOracleSql: String =
    ivfpqOracleSqlFor("vec_id % 4 <> 0")

  /** The q122 twin: full-corpus training (centroids and codebooks see
    * everything — removal must NOT retrain), with serving confined to
    * the kept codes. Mirrors AnnIndex.build(all) + remove(fifth).
    */
  private def ivfpqRemovalOracleSql: String =
    ivfpqOracleSqlFor("TRUE", servePred = "vec_id % 5 <> 3")

  /** The q153 twin: training confined to the INITIAL corpus (the
    * sync's arrivals encode against frozen books — the incremental
    * contract), serving confined to the FINAL live set (arrivals in,
    * the decontamination departures out). Mirrors buildFromCorpus on
    * `%4<>0` + one syncFromCorpus over append(`%4==0`) +
    * delete(`%5==3`).
    */
  private def ivfpqSyncOracleSql: String =
    ivfpqOracleSqlFor("vec_id % 4 <> 0", servePred = "vec_id % 5 <> 3")

  private def ivfpqOracleSqlFor(trainPred: String, servePred: String = "TRUE"): String = {
    val subCtes = pqChainCtes("residbase", "e", encodeSrc = Some("resid"))
    val adcSum = (0 until PqM).map(s => s"l$s.val").mkString(" + ")
    pqMaterialize(s"""
      WITH ${ivfAssignCtes(trainPred = trainPred)},
      resid AS (
        SELECT a.vec_id, a.cell,
          list_transform(range(1, $AnnDim + 1),
            i -> CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.c_emb[i] AS DOUBLE) AS FLOAT)) AS embedding
        FROM assigned a JOIN cents$IvfIters c ON c.cent_id = a.cell),
      residbase AS (SELECT * FROM resid WHERE ($trainPred)),$subCtes,
      allcodes AS (
        SELECT e0.vec_id, r.cell, e0.code0${(1 until PqM).map(s => s", e$s.code$s").mkString}
        FROM p0enc e0 $pqCodeJoin JOIN resid r ON r.vec_id = e0.vec_id),
      codes AS (SELECT * FROM allcodes WHERE ($servePred)),
      probes AS (SELECT vec_id AS q_id, cent_id AS cell
                 FROM ranked WHERE vec_id < $PqQueryCount AND crk <= $IvfNprobe),
      offs AS (
        SELECT p.q_id, p.cell, ${dotSql("q.embedding", "c.c_emb")} AS off
        FROM probes p
          JOIN e q ON q.vec_id = p.q_id
          JOIN cents$IvfIters c ON c.cent_id = p.cell),
      adc AS (
        SELECT o.q_id, v.vec_id, ${R(s"o.off + $adcSum", 6)} AS score
        FROM codes v
        JOIN offs o ON v.cell = o.cell
        JOIN p0lut l0 ON l0.q_id = o.q_id AND l0.cid = v.code0 ${pqLutJoin("o")}
        WHERE v.vec_id <> o.q_id),
      shortlist AS (
        SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS crk
          FROM adc)
        WHERE crk <= $PqShortlist),
      reranked AS (
        SELECT sl.q_id, sl.vec_id,
          ${R(s"${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)", 6)} AS cosine
        FROM shortlist sl
        JOIN e c ON c.vec_id = sl.vec_id
        JOIN e q ON q.vec_id = sl.q_id)
      SELECT q_id, rk, vec_id AS neighbor_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM reranked)
      WHERE rk <= 5
      ORDER BY q_id, rk""")
  }

  /** The q110 twin: the shared IVF chain, labels hydrated from the
    * base table, label-mismatch filter inside the probe scan.
    */
  private def hardNegOracleSql: String = s"""
      WITH ${ivfAssignCtes()},
      al AS (
        SELECT a.vec_id, a.embedding, a.nrm, a.cell, l.label
        FROM assigned a JOIN embeddings l ON l.vec_id = a.vec_id),
      probes AS (SELECT vec_id AS q_id, cent_id AS cell
                 FROM ranked WHERE vec_id < $PqQueryCount AND crk <= $IvfNprobe),
      qe AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, e.nrm AS q_nrm,
               l.label AS q_label
             FROM e JOIN embeddings l ON l.vec_id = e.vec_id
             WHERE e.vec_id < $PqQueryCount),
      scored AS (
        SELECT p.q_id, a.vec_id, a.label AS neg_label,
          ${R(s"${dotSql("qe.q_emb", "a.embedding")} / (qe.q_nrm * a.nrm)", 6)} AS cosine
        FROM al a
          JOIN probes p ON a.cell = p.cell
          JOIN qe ON p.q_id = qe.q_id
        WHERE a.vec_id <> p.q_id AND a.label <> qe.q_label)
      SELECT q_id, rk, vec_id AS neighbor_id, neg_label, cosine FROM (
        SELECT q_id, vec_id, neg_label, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY q_id, rk"""

  val oracle: Map[String, String] = Map(
    "q63_ann_ivf" -> ivfOracleSql,
    "q109_ann_pq" -> pqOracleSql,
    "q110_hard_negatives" -> hardNegOracleSql,
    "q111_ann_ivfpq" -> ivfpqOracleSql,
    // build → persist → fresh-session reload → serve must be lossless:
    // the reloaded index serves the exact q111 answer
    "q114_ann_index_reuse" -> ivfpqOracleSql,
    // q147: the provenance pin (snapshot 1, the tag), the pinned-vs-now
    // corpus counts, and the reloaded index serving the full query set
    // (PqQueryCount queries × top-5).
    "q147_ann_provenance" -> s"""
      SELECT step, v FROM (
        SELECT 'built_on_snapshot' AS step, '1' AS v
        UNION ALL SELECT 'corpus_rows_at_pin',
          CAST((SELECT count(*) FROM embeddings) AS VARCHAR)
        UNION ALL SELECT 'corpus_rows_now',
          CAST((SELECT count(*) FROM embeddings) + 1 AS VARCHAR)
        UNION ALL SELECT 'served_rows', '${PqQueryCount * 5}'
        UNION ALL SELECT 'tag', 'corpus-v1')
      ORDER BY step""",
    // q150: the rebalance maintenance loop's invariants — drift shows
    // in the occupancy probe, re-clustering repairs it with codebooks
    // bit-kept and rows preserved, the provenance pin bumps to the
    // rebalanced release tag, recall@5 stays on par with a full
    // rebuild (books keeping is free), and the serve stays
    // PqQueryCount×5 rows.
    "q150_ann_rebalance" -> s"""
      SELECT step, v FROM (
        SELECT '1_built_cells_gt1' AS step, '1' AS v
        UNION ALL SELECT '2_drift_skewed', '1'
        UNION ALL SELECT '3_books_kept', '1'
        UNION ALL SELECT '4_rows_kept', '1'
        UNION ALL SELECT '5_skew_repaired', '1'
        UNION ALL SELECT '6_prov', '2:bal-v2'
        UNION ALL SELECT '7_recall_parity', '1'
        UNION ALL SELECT '8_served_rows', '${PqQueryCount * 5}')
      ORDER BY step""",
    "q116_ann_index_incremental" -> ivfpqIncrementalOracleSql,
    "q122_ann_index_remove" -> ivfpqRemovalOracleSql,
    // MoR removal must serve EXACTLY what CoW removal serves
    "q152_index_mor_remove" -> ivfpqRemovalOracleSql,
    "q153_index_sync" -> ivfpqSyncOracleSql,
    // same trained cells as q63 (shared CTE chain), SemDeDup pruning tail
    "q80_semantic_dedup" -> s"""
      WITH ${ivfAssignCtes()},
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${R(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND b.vec_id < a.vec_id),
      dups AS (
        SELECT id_a AS vec_id, min(id_b) AS dup_of FROM pairs
        WHERE cosine >= $SemDedupT GROUP BY id_a)
      SELECT a.vec_id, a.cell, d.dup_of IS NULL AS kept, d.dup_of
      FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
      ORDER BY a.vec_id""",
    "q98_embed_curation" -> s"""
      WITH olv AS (SELECT vec_id, embedding AS oe FROM embeddings),
      olcnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM olv),
      ollin AS (
        SELECT i, CAST(sum(CAST(floor(CAST(oe[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS si
        FROM olv CROSS JOIN range($AnnDim) a(i) GROUP BY i),
      oldiag AS (
        SELECT i, CAST(sum(CAST(floor(CAST(oe[i+1] AS DOUBLE) * CAST(oe[i+1] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS sq
        FROM olv CROSS JOIN range($AnnDim) a(i) GROUP BY i),
      olstats AS (
        SELECT ollin.i,
          (CAST(si AS DOUBLE) / 1e8) / nn AS m,
          greatest(((CAST(sq AS DOUBLE) / 1e8) / nn)
                   - ((CAST(si AS DOUBLE) / 1e8) / nn) * ((CAST(si AS DOUBLE) / 1e8) / nn), 1e-12) AS veff
        FROM ollin JOIN oldiag ON ollin.i = oldiag.i CROSS JOIN olcnt),
      olterms AS (
        SELECT vec_id,
          CAST(floor((CAST(oe[s.i+1] AS DOUBLE) - m) * (CAST(oe[s.i+1] AS DOUBLE) - m) / veff * 1e8 + 0.5) AS BIGINT) AS t
        FROM olv CROSS JOIN olstats s),
      outliers AS (
        SELECT vec_id FROM olterms GROUP BY vec_id
        ORDER BY CAST(sum(t) AS BIGINT) DESC, vec_id LIMIT 32),
      clean AS (
        SELECT e0.* FROM embeddings e0
        WHERE NOT EXISTS (SELECT 1 FROM outliers o WHERE o.vec_id = e0.vec_id)),
      ${ivfAssignCtes("clean")},
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${R(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND b.vec_id < a.vec_id),
      dups AS (
        SELECT id_a AS vec_id, min(id_b) AS dup_of FROM pairs
        WHERE cosine >= $SemDedupT GROUP BY id_a)
      SELECT a.vec_id, a.cell, d.dup_of IS NULL AS kept, d.dup_of
      FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
      ORDER BY a.vec_id""",
    "q99_retrieval_serve" -> s"""
      WITH keep AS (
        SELECT doc_id FROM (${LlmTextQueries.oracle("q64_corpus_filter")})),
      e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM embeddings),
      corpus AS (SELECT e.* FROM e JOIN keep ON keep.doc_id = e.vec_id),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
            FROM e WHERE vec_id < 20),
      scored AS (
        SELECT q_id, corpus.vec_id,
          ${R(s"${dotSql("q_emb", "corpus.embedding")} / (q_nrm * corpus.nrm)", 6)} AS cosine
        FROM corpus CROSS JOIN q
        WHERE corpus.vec_id <> q_id),
      ranked AS (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      SELECT q_id, rk, vec_id AS doc_id, cosine, d.source, d.lang
      FROM ranked JOIN documents d ON d.doc_id = ranked.vec_id
      WHERE rk <= 5
      ORDER BY q_id, rk""",
    "q73_embed_quantize" -> s"""
      WITH m AS (
        SELECT vec_id, embedding,
          CAST(len(embedding) AS INT) AS n_dims,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings),
      qd AS (
        SELECT vec_id, n_dims, maxabs,
          list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
            ELSE CAST(floor(CAST(x AS DOUBLE) / maxabs * 127.0 + 0.5) AS INT) END) AS q
        FROM m)
      SELECT vec_id, n_dims,
        ${R("maxabs", 6)} AS maxabs_r,
        CAST(list_sum(q) AS INT) AS q_sum,
        CAST(list_min(q) AS INT) AS q_min,
        CAST(list_max(q) AS INT) AS q_max
      FROM qd
      ORDER BY vec_id""",
    "q53_ann_lsh" -> s"""
      WITH w AS (SELECT * FROM (VALUES ${annPlaneSqlValues}) AS t(tbl, bit, wv)),
      e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM embeddings),
      sig AS (
        SELECT vec_id, tbl,
          sum(CASE WHEN ${dotSql("embedding", "wv")} > 0
              THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS bucket
        FROM e CROSS JOIN w
        GROUP BY vec_id, tbl),
      cand AS (
        SELECT DISTINCT q.vec_id AS q_id, s.vec_id
        FROM sig s JOIN sig q ON s.tbl = q.tbl AND s.bucket = q.bucket
        WHERE q.vec_id < 20 AND s.vec_id <> q.vec_id),
      scored AS (
        SELECT c.q_id, c.vec_id,
          ${R(s"${dotSql("qe.embedding", "e.embedding")} / (qe.nrm * e.nrm)", 6)} AS cosine
        FROM cand c
          JOIN e qe ON c.q_id = qe.vec_id
          JOIN e ON c.vec_id = e.vec_id)
      SELECT q_id, rk, vec_id AS neighbor_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY q_id, rk""",
    "q49_cosine_topk" -> s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id < 20),
      scored AS (
        SELECT q.q_id, e.vec_id,
          ${R(s"${dotSql("q_emb", "embedding")} / (q_nrm * nrm)", 6)} AS cosine
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.q_id)
      SELECT q_id, rk, vec_id AS neighbor_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY q_id, rk""",
    "q50_embedding_neardup" -> neardupAllPairsSql,
    // q67 must produce the SAME answer as the exact all-pairs scan —
    // the LSH index is a pruning strategy, not an approximation of the
    // output contract — so it is gated against the identical oracle.
    // FIXTURE-DEPENDENT: sign-LSH has a ~8e-5 per-pair chance that a
    // true >=0.99 pair escapes all 8 tables; on the current corpora
    // recall is complete (proven per-corpus by NearDupLshSpec's
    // fixture guard). If that guard ever fails after a data refresh,
    // this row reporting a mismatch is a recall miss, not a bug.
    "q67_neardup_lsh" -> neardupAllPairsSql,
    "q51_simhash" -> """
      WITH tok AS (
        SELECT doc_id,
          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents)),
      bits AS (
        SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS score
        FROM tok CROSS JOIN (SELECT unnest(range(32)) AS bit)
        GROUP BY doc_id, bit)
      SELECT doc_id,
        CAST(sum(CASE WHEN score > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits
      GROUP BY doc_id
      ORDER BY doc_id""",
    "q103_simhash_neardup" -> """
      WITH tok AS (
        SELECT doc_id,
          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents)),
      bits AS (
        SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS score
        FROM tok CROSS JOIN (SELECT unnest(range(32)) AS bit)
        GROUP BY doc_id, bit),
      sigs AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN score > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id)
      SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming,
        CAST(count(*) AS BIGINT) AS n_pairs
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      GROUP BY 1
      ORDER BY hamming""",
    "q52_minhash_lsh" -> s"""
      WITH sh AS (
        SELECT DISTINCT doc_id,
          CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % $MinhashP AS h
        FROM (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(len(toks) - 2),
            i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS shingle
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3)),
      fam AS (SELECT * FROM (VALUES ${minhashFamilyValues}) AS t(i, a, b)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % $MinhashP) AS mh
        FROM sh CROSS JOIN fam
        GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // ${MinhashK / MinhashBands} AS band,
          string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS band_key
        FROM sig
        GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
      inter AS (
        SELECT doc_a, doc_b, count(*) AS inter
        FROM cand JOIN sh sa ON doc_a = sa.doc_id
          JOIN sh sb ON doc_b = sb.doc_id AND sa.h = sb.h
        GROUP BY 1, 2),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
      SELECT doc_a, doc_b,
        ${R("CAST(coalesce(inter, 0) AS DOUBLE) / CAST(a.sz + b.sz - coalesce(inter, 0) AS DOUBLE)", 6)} AS jaccard
      FROM cand
        LEFT JOIN inter USING (doc_a, doc_b)
        JOIN sz a ON cand.doc_a = a.doc_id
        JOIN sz b ON cand.doc_b = b.doc_id
      ORDER BY doc_a, doc_b"""
  )
}
