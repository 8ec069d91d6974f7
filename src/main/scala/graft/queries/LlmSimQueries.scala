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

  /** Word 3-gram shingle set with 60-bit md5 hash, as (doc_id, h). */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(toks) - 3),
             i -> concat_ws(' ', slice(toks, i + 1, 3))))""").as("shingles"))
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"),
        expr(s"CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT) % $MinhashP").as("h"))
      .distinct() // hash SET per doc (mod-P collisions would skew |∩| counts)
      .cache() // consumed 4× in q52 (signatures, both join sides, sizes)
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
    //      All-pairs via a broadcast block product (mapPartitions over
    //      primitive float arrays): each partition streams its rows
    //      against the broadcast block and emits ONLY pairs above a
    //      conservative raw threshold (0.99 - 1e-6 > any value that
    //      could round to >= 0.99 at 6 dp), so the O(n²) pair space is
    //      never materialized as rows. The survivors get the exact
    //      decimal rounding + filter in DataFrame land — bit-identical
    //      to the declarative join formulation and the DuckDB oracle
    //      (same left-fold dot). At cluster scale the broadcast block
    //      becomes a tile loop; the per-partition structure is the same. ----
    "q50_embedding_neardup" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val vecs = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
      val block = s.sparkContext.broadcast(
        vecs.collect().sortBy(_._1))
      val rawPairs = vecs.mapPartitions { it =>
        val all = block.value
        def dotRaw(x: Array[Float], y: Array[Float]): Double = {
          var acc = 0.0; var i = 0
          val n = math.min(x.length, y.length)
          while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
          acc
        }
        it.flatMap { case (idA, embA) =>
          val nrmA = math.sqrt(dotRaw(embA, embA))
          all.iterator
            .filter(_._1 > idA)
            .map { case (idB, embB) =>
              (idA, idB, dotRaw(embA, embB) / (nrmA * math.sqrt(dotRaw(embB, embB))))
            }
            .filter(_._3 >= 0.989999)
        }
      }.toDF("id_a", "id_b", "cosine_raw")
      rawPairs
        .withColumn("cosine", dround(col("cosine_raw"), 6))
        .filter(col("cosine") >= 0.99)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // ---- SimHash document fingerprints (32-bit, md5-token-derived) ----
    "q51_simhash" -> ((s, dir) => {
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val bits = tok.select(col("doc_id"), col("h"),
          explode(expr("sequence(0, 31)")).as("bit"))
        .groupBy(col("doc_id"), col("bit"))
        .agg(sum(expr("CAST(((h >> bit) & 1) * 2 - 1 AS BIGINT)")).as("score"))
      bits.groupBy(col("doc_id"))
        .agg(sum(when(col("score") > 0,
          expr("CAST(pow(2, bit) AS BIGINT)")).otherwise(0L)).as("simhash"))
        .orderBy(col("doc_id"))
    }),
    // ---- ANN via sign-LSH buckets (the 100 TB-scale similarity path):
    //      bucket = sign bits of the first 8 dims (axis-aligned
    //      hyperplanes); candidates only within a query's own bucket, so
    //      the pair space shrinks from O(n²) to O(n²/2^8) and the join
    //      shuffles on the bucket key. Exact re-rank inside the bucket. ----
    "q53_ann_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sqnorm("embedding")))
        .withColumn("bucket", expr(
          """aggregate(sequence(0, 7),
               0L, (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > 0.0
                                          THEN shiftleft(1L, i) ELSE 0L END)"""))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("bucket"))
      val joined = e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", dround(dot("q_emb", "embedding") / (col("q_nrm") * col("nrm")), 6))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
      joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
        .orderBy(col("q_id"), col("rk"))
    }),

    // ---- MinHash + LSH banding near-dup (the 100 TB-scale dedup path) ----
    "q52_minhash_lsh" -> ((s, dir) => {
      val sh = shingleHashes(s, dir)
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
      val sig = sh.groupBy(col("doc_id"))
        .agg(mhUdaf(col("h")).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("i", "mh")))
      // band key = minhashes of the band joined; docs sharing any band collide
      // `div` = floor division; a plain cast-of-double-quotient truncates
      // in Spark but rounds in DuckDB, silently shifting band membership.
      val bands = sig.withColumn("band", expr(s"i div ${MinhashK / MinhashBands}"))
        .groupBy(col("doc_id"), col("band"))
        .agg(concat_ws("-", sort_array(collect_list(struct(col("i"), col("mh")))).getField("mh").cast(ArrayType(StringType))).as("band_key"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      // verify candidates with exact shingle-set Jaccard
      val inter = cand.join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      cand.join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("inter"))
        .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", dround(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType), 6))
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    })
  )

  private val R = droundSql

  private def minhashFamilyValues: String =
    minhashA.zip(minhashB).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q53_ann_lsh" -> s"""
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(0, 8),
              i -> CASE WHEN embedding[i + 1] > 0.0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)),
            (acc, v) -> acc + v) AS bucket
        FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bucket
            FROM e WHERE vec_id < 20),
      scored AS (
        SELECT q.q_id, e.vec_id,
          ${R(s"${dotSql("q_emb", "e.embedding")} / (q_nrm * e.nrm)", 6)} AS cosine
        FROM e JOIN q USING (bucket)
        WHERE e.vec_id <> q.q_id)
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
    "q50_embedding_neardup" -> s"""
      WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
                 FROM embeddings)
      SELECT id_a, id_b, cosine FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${R(s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)", 6)} AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      WHERE cosine >= 0.99
      ORDER BY id_a, id_b""",
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
        sum(CASE WHEN score > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS simhash
      FROM bits
      GROUP BY doc_id
      ORDER BY doc_id""",
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
