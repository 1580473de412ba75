package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import Text.{normText, shingles3, sqlNorm, sqlShingles, sqlWords, words}

/** Deduplication operators over `documents` — the standard LLM
  * training-data dedup ladder: exact (hash groupBy), MinHash + LSH
  * banding, SimHash, df-capped inverted-index n-gram Jaccard, and
  * embedding-cosine near-dup (in [[Similarity]]'s vector algebra).
  *
  * Scale design (100 TB): every variant is shuffle-minimal —
  *   - exact dedup: one hash-partitioned groupBy on the 128-bit digest;
  *   - MinHash: shingle explode → ONE partial-aggregated groupBy(doc)
  *     computes all 16 minima map-side; candidates come from the banded
  *     self-join (keys are 128-bit band digests, so buckets stay tiny and
  *     skew-free), and only candidates — never all pairs — reach the
  *     exact-Jaccard verify;
  *   - Jaccard index join: document-frequency cap drops stop-shingles
  *     before the self-join, the standard guard against quadratic hot
  *     keys in an inverted index;
  *   - engine parity: md5-hex-string hashing only (see [[Text]] header).
  */
object Dedup {

  /** Distinct (doc_id, shingle) pairs — word 3-grams. */
  private def shingleSet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(shingles3(words(col("text"))))).as("s"))

  private val sqlShingleSet =
    s"""norm AS (SELECT doc_id, $sqlWords AS ws FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct($sqlShingles)) AS s FROM norm)"""

  /** Exact dedup: md5 over normalized text, first doc id wins. */
  def q30ExactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** MinHash (16 perms as seed-prefixed md5 minima) → LSH (4 bands × 4
    * rows) → exact-Jaccard verification of candidates at 0.8.
    */
  def q31MinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSet(s, dir).cache()
    val minAggs = (0 until 16).map(k =>
      min(md5(concat_ws(":", lit(k), col("s")))).as(s"m$k"))
    val sig = sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(r => col(s"m${4 * b + r}")): _*)).as("bkey"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    jaccardOver(cand, sh, 0.8)
  }

  /** Exact Jaccard of candidate pairs against the shingle sets, emitting
    * pairs at/above `thr` as (doc_a, doc_b, jaccard).
    */
  private def jaccardOver(cand: DataFrame, sh: DataFrame, thr: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("da"), col("s")), "da")
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter")).cast("double")
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da").as("doc_a"), col("db").as("doc_b"), j.as("jaccard"))
      .where(j >= thr)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def sqlJaccardTail(candCte: String, thr: String) = s"""
      sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.da, c.db, COUNT(1) AS i
                FROM $candCte c
                JOIN sh x ON x.doc_id = c.da
                JOIN sh y ON y.doc_id = c.db AND y.s = x.s
                GROUP BY c.da, c.db)
      SELECT da AS doc_a, db AS doc_b,
        CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= $thr
      ORDER BY doc_a, doc_b"""

  /** SimHash: 32-bit majority-vote fingerprint over distinct tokens
    * (bit j of a token = bit j%4 of hex digit j/4 of its md5).
    */
  def q32Simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("tok"))
    val votes = toks
      .select(col("doc_id"), col("tok"), explode(sequence(lit(0), lit(31))).as("j"))
      .select(col("doc_id"), col("j"),
        expr("""CASE WHEN (shiftright(instr('0123456789abcdef',
                   substr(md5(tok), (j div 4) + 1, 1)) - 1, j % 4) & 1) = 1
                THEN 1 ELSE -1 END""").as("pm"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("pm")).as("v"))
    votes
      .select(col("doc_id"), col("j"),
        when(col("v") > 0, "1").otherwise("0").as("bit"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("bit")))),
          x => x.getField("bit")), "").as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** df-capped inverted-index exact n-gram Jaccard: shingles in more than
    * 50 docs are dropped before the index self-join (hot-key guard), then
    * pairs sharing any surviving shingle are scored at 0.5.
    */
  def q33JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val shAll = shingleSet(s, dir)
    val rare = shAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 50).select(col("s"))
    val sh = shAll.join(rare, "s").cache()
    val cand = sh.as("x")
      .join(sh.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    jaccardOver(cand, sh, 0.5)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_exact_dedup" -> (q30ExactDedup _),
    "q31_minhash_pairs" -> (q31MinhashPairs _),
    "q32_simhash" -> (q32Simhash _),
    "q33_jaccard_pairs" -> (q33JaccardPairs _),
  )

  private val sqlSig = (0 until 16)
    .map(k => s"min(md5('$k:' || s)) AS m$k").mkString(", ")
  private val sqlBandRows = (0 until 4).map { b =>
    val key = (0 until 4).map(r => s"m${4 * b + r}").mkString(" || '|' || ")
    s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sig"
  }.mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" -> s"""
      SELECT md5($sqlNorm) AS norm_hash, MIN(doc_id) AS canonical_id,
        COUNT(1) AS n_copies
      FROM documents GROUP BY 1 ORDER BY canonical_id""",
    "q31_minhash_pairs" -> s"""
      WITH $sqlShingleSet,
      sig AS (SELECT doc_id, $sqlSig FROM sh GROUP BY doc_id),
      bands AS ($sqlBandRows),
      cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
               FROM bands x JOIN bands y
                 ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      ${sqlJaccardTail("cand", "0.8")}""",
    "q32_simhash" -> s"""
      WITH norm AS (SELECT doc_id, $sqlWords AS ws FROM documents),
      toks AS (SELECT doc_id, unnest(list_distinct(ws)) AS tok FROM norm),
      votes AS (SELECT doc_id, j,
          SUM(CASE WHEN ((strpos('0123456789abcdef',
                substr(md5(tok), (j // 4) + 1, 1)) - 1) >> (j % 4)) & 1 = 1
              THEN 1 ELSE -1 END) AS v
        FROM toks, (SELECT unnest(range(0, 32)) AS j)
        GROUP BY doc_id, j)
      SELECT doc_id,
        string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
      FROM votes GROUP BY doc_id ORDER BY doc_id""",
    "q33_jaccard_pairs" -> s"""
      WITH norm AS (SELECT doc_id, $sqlWords AS ws FROM documents),
      sh_all AS (SELECT doc_id, unnest(list_distinct($sqlShingles)) AS s FROM norm),
      rare AS (SELECT s FROM sh_all GROUP BY s HAVING COUNT(1) <= 50),
      sh AS (SELECT doc_id, x.s AS s FROM sh_all x JOIN rare USING (s)),
      cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
               FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id),
      ${sqlJaccardTail("cand", "0.5")}""",
  )
}
