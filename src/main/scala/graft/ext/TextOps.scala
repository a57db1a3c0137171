package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` table — the
  * LLM-training-data-pipeline surface (SURVEY.md §7.6 north-star
  * extensions): exact dedup, n-gram-shingle Jaccard near-dedup, MinHash+LSH
  * near-dedup, SimHash, winnowing fingerprints, token statistics, quality
  * scoring, language ID, token frequencies.
  *
  * Shingling: word trigrams (`tok[i] tok[i+1] tok[i+2]`), distinct per doc.
  * The testdata vocabulary is tiny (~31 words), so unigram-set similarity is
  * background-dense; trigram shingles cleanly separate the planted
  * near-duplicates (jaccard ≥ 0.8) from unrelated docs (< 0.3).
  *
  * Scale posture (100 TB):
  *  - pair generation uses an INVERTED-INDEX join (explode shingles → join
  *    on shingle → count common per pair), never an O(n²) cross join; the
  *    DuckDB oracle may use the quadratic formulation — same result, tiny sf;
  *  - MinHash-LSH banding is the sub-quadratic candidate path: 32 hashes in
  *    8 bands × 4 rows; candidates then exact-verified. With the planted
  *    dup similarity ≥ 0.8, band recall is 1 − (1−0.8⁴)⁸ ≈ 0.996 per pair
  *    (empirically 100% on this corpus, so it shares the exact oracle);
  *  - all hashing is Spark's codegen'd xxhash64 — no UDFs in hot paths.
  */
object TextOps {

  /** Distinct trigram-shingle hashes per doc. Docs with <3 tokens carry no
    * shingles and are excluded from near-dup ops (mirrored in oracles).
    *
    * Each shingle string is hashed to a long immediately, so every
    * downstream join/set shuffles and compares 8-byte longs instead of
    * strings. Set semantics equal the oracle's string-shingle form
    * (`shingleSqlCte`) modulo 64-bit collisions (birthday bound ~1e-11 at
    * this corpus's 27k distinct shingles).
    *
    * Hashing runs through the native `word_trigram_hashes` expression
    * (graft.functions.ShingleHash): one pass over the text bytes, one
    * xxhash64 per trigram byte range, zero string materialization —
    * bit-identical to the `xxhash64(concat_ws(' ', slice(toks, i, 3)))`
    * formulation it replaces (equivalence pinned in CosineSimilaritySpec),
    * which allocated a token array plus one string per shingle per row.
    */
  private[ext] def shingleHashed(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"shingles:$dir")
    if (pre != null) return pre
    graft.functions.GraftFunctions.register(s)
    // NO fanOut here, measured (round 14): the native one-pass trigram
    // hasher is cheap enough that the single-task scan-fused cost is
    // below the extra exchange + stage it would take to spread it —
    // d05 1.56→1.83 s, d06 0.94→1.13 s with a fanOut; the md5-heavy
    // sign/gram kernels (d07/d08/d74/d76, gram8/gramPos8) are where the
    // input-skew guard pays.
    Tables.documents(s, dir)
      .selectExpr("doc_id", "array_distinct(word_trigram_hashes(text)) AS shs")
      .where("size(shs) > 0")
  }

  /** All ordered (x, y) pairs, x < y, from a sorted posting list `ds` —
    * the pair-generation kernel of the posting-list near-dup
    * formulation: the inverted index is built ONCE, grouped on the
    * key, and pairs are emitted per group. The self-join alternative
    * computes the whole index subtree twice (once per side) and was
    * measured ~2× slower end-to-end; at cluster scale the posting-list
    * form also shuffles each index row once instead of twice. Callers
    * must bound the list size (frequency cap) — emission is O(|ds|²).
    *
    * Backed by the native `pair_explode` Generator
    * (graft.functions.PairExplode): a lazy two-index cursor over the
    * array buffer, replacing the transform/flatten/explode lambda chain
    * that MATERIALIZED the full C(n,2) struct array per list before
    * exploding — same pairs, same order, O(1) peak memory beyond the
    * list itself (equivalence pinned in PairExplodeSpec).
    */
  private[ext] val pairExplode = "pair_explode(ds) AS (x, y)"

  private[ext] val shingleSqlCte =
    """t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, len(toks)-1),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |      FROM t WHERE len(toks) >= 3)""".stripMargin

  // ---------------------------------------------------------------- d01

  /** Exact dedup: hash-groupBy on full text, keep the min doc_id per group.
    * At 100 TB group on xxhash64(text) first and only compare full text
    * within hash buckets; here text IS the group key (exact semantics).
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  private val exactDedupSql =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- d02

  /** Token statistics: counts, distinct counts, mean token length (exact
    * integer arithmetic → deterministic).
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr(
        "doc_id",
        "size(split(text,' ')) AS n_tokens",
        "size(array_distinct(split(text,' '))) AS n_uniq_tokens",
        "length(translate(text,' ','')) * 1.0D / size(split(text,' ')) AS avg_tok_len",
        "n_chars")
      .orderBy("doc_id")

  private val tokenStatsSql =
    """SELECT doc_id,
      | len(string_split(text,' ')) AS n_tokens,
      | len(list_distinct(string_split(text,' '))) AS n_uniq_tokens,
      | length(replace(text,' ','')) * 1.0 / len(string_split(text,' ')) AS avg_tok_len,
      | n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d03

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality scoring (reference-style heuristics re-expressed for documents:
    * length bounds, stopword ratio, uniqueness ratio). All ratios are exact
    * integer divisions → bit-deterministic.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    Tables.documents(s, dir)
      .selectExpr(
        "doc_id",
        "size(split(text,' ')) AS n_tokens",
        s"size(filter(split(text,' '), t -> array_contains($stopArr, t))) AS n_stop",
        "size(array_distinct(split(text,' '))) AS n_uniq")
      .selectExpr(
        "doc_id", "n_tokens",
        "n_stop * 1.0D / n_tokens AS stop_ratio",
        "n_uniq * 1.0D / n_tokens AS uniq_ratio",
        "CAST(n_tokens >= 20 AND n_tokens <= 400 AND n_stop * 1.0D / n_tokens >= 0.05 AS INT) AS is_quality")
      .orderBy("doc_id")
  }

  private val qualityScoreSql = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""SELECT doc_id, n_tokens,
       | n_stop * 1.0 / n_tokens AS stop_ratio,
       | n_uniq * 1.0 / n_tokens AS uniq_ratio,
       | CAST(n_tokens >= 20 AND n_tokens <= 400 AND n_stop * 1.0 / n_tokens >= 0.05 AS INT) AS is_quality
       |FROM (SELECT doc_id,
       |        len(string_split(text,' ')) AS n_tokens,
       |        len(list_filter(string_split(text,' '), t -> list_contains($stopList, t))) AS n_stop,
       |        len(list_distinct(string_split(text,' '))) AS n_uniq
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d04

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est"),
    "zh" -> Seq("wo", "ni", "shi", "bu", "le"))

  /** Language-ID heuristic: stopword-hit counts per language, argmax with a
    * deterministic priority tie-break (en > es > de > fr > zh). Both sides
    * spell the argmax as the same CASE chain.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val hitCols = langWords.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("array(", ",", ")")
      s"size(filter(split(text,' '), t -> array_contains($arr, t))) AS ${l}_hits"
    }
    val pred =
      """CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
        |     WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
        |     WHEN de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
        |     WHEN fr_hits >= zh_hits THEN 'fr'
        |     ELSE 'zh' END AS pred_lang""".stripMargin
    Tables.documents(s, dir)
      .selectExpr(Seq("doc_id", "lang") ++ hitCols: _*)
      .selectExpr("doc_id", "lang", "en_hits", "es_hits", "de_hits", "fr_hits", "zh_hits", pred)
      .orderBy("doc_id")
  }

  private val langIdSql = {
    val hitCols = langWords.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), t -> list_contains($arr, t))) AS ${l}_hits"
    }.mkString(",\n        ")
    """SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits, zh_hits,
      | CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
      |      WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
      |      WHEN de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
      |      WHEN fr_hits >= zh_hits THEN 'fr'
      |      ELSE 'zh' END AS pred_lang
      |FROM (SELECT doc_id, lang,
      |        """.stripMargin + hitCols +
      """
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d05

  /** Exact n-gram-Jaccard near-dup pairs (jaccard ≥ 0.5 on trigram shingle
    * sets) via inverted-index POSTING LISTS — the distributed formulation:
    * explode shingles, group by shingle collecting the (bounded) doc list,
    * emit in-list pairs, count common shingles per pair, then
    * jaccard = common / (|A|+|B|−common). No cross join anywhere; two
    * shuffles total (by shingle, then by pair), and the index subtree is
    * computed once — unlike a self-join, which computes it per side.
    * Exactness requires no frequency cap, so extremely hot shingles are a
    * skew risk at scale; the standard mitigation (drop shingles with
    * df > cap as non-discriminative) changes `common` and is therefore
    * reserved for the approximate paths (d06/d07).
    */
  /** Pipeline-shared compute-once frames: the shingle table, the d05
    * pair set and the d13 cluster map are the three subtrees the dedup
    * family (d12/d13/d18/d26/d29/d34/d37/d39) rebuilds when each query
    * runs self-contained — d39 alone computes the shingle table three
    * times (candidate generation plus both verify sides). A real
    * pipeline materializes them once; [[enableSharedFrames]] opts into
    * that mode (persist + register here; [[shingleHashed]],
    * [[jaccardDupPairs]] and [[dupClusters]] consult the registry at
    * entry), and [[clearSharedFrames]] releases the storage. Keyed by
    * data dir so different SFs never cross-serve. Default behavior is
    * unchanged — every query stays self-contained unless a driver opts
    * in (Bench's pipeline segment reports both numbers).
    */
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Pipeline-shared BPE trainer result (merge table + final vocab):
    * d50 emits the merges, d56 consumes the vocab — self-contained runs
    * each execute the three driver-argmax rounds, the most round-trip-
    * heavy subtree in this file; pipeline mode trains once. */
  private val sharedBpe = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, String, String, String, Long)], DataFrame)]()

  def enableSharedFrames(s: SparkSession, dir: String): Unit = {
    sharedBpe.put(dir, bpeTrainImpl(s, dir, 3))
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // shingles first: every downstream frame (pairs, clusters, d18's
    // split streams, d39's verify sides) builds through this cache
    val sh = shingleHashed(s, dir).persist(lvl)
    sh.count()
    shared.put(s"shingles:$dir", sh)
    val p = jaccardDupPairs(s, dir).persist(lvl)
    p.count()
    shared.put(s"pairs:$dir", p)
    // builds through the pairs cache just registered
    val c = dupClusters(s, dir).persist(lvl)
    c.count()
    shared.put(s"clusters:$dir", c)
    // the 8-gram subtree d20/d45/d46/d48 share (gram8 persists its own
    // build), and the positional frame d46/d48 share
    val g = gram8(s, dir)
    g.count()
    shared.put(s"grams8:$dir", g)
    val gp = gramPos8(s, dir)
    gp.count()
    shared.put(s"gramPos8:$dir", gp)
    // d40's (shingle TEXT, df) aggregate — the one dedup-family subtree
    // the hash-keyed shingle frame cannot serve (the report needs the
    // shingle STRING); tiny (distinct-shingle-count rows) once aggregated
    val sdf = shingleTextDf(s, dir).persist(lvl)
    sdf.count()
    shared.put(s"shingleDf:$dir", sdf)
  }

  def clearSharedFrames(): Unit = {
    shared.values.forEach(df => { df.unpersist(); () })
    shared.clear()
    sharedBpe.clear() // vocab frames are localCheckpoints; GC releases them
  }

  def jaccardDupPairs(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"pairs:$dir")
    if (pre != null) return pre
    // NO fanOut on this kernel, measured twice (round 14): before the
    // hash (d05 1.56→1.83) and after it (d05 1.59→1.68, d13 1.85→2.07)
    // — the codegen'd collect_list partial is cheaper than the exchange
    // either placement adds; contrast d39, whose typed-UDAF partial over
    // the same stream DID pay for the spread
    val ex = shingleHashed(s, dir)
      .selectExpr("doc_id", "size(shs) AS n_sh", "explode(shs) AS h")
    // Set sizes ride WITH the doc_id through the posting lists (a slim
    // count-then-rejoin-sizes variant measured no faster on the pair
    // stream and ~1s slower on the d13 consumer — the extra joins cost
    // more than the wider pair payload saves at every scale where the
    // sizes frame itself needs a shuffle).
    val posts = ex.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .where(size(col("ds")) > 1)
    val pairs = posts.selectExpr(pairExplode)
      .selectExpr("x.doc_id AS doc_id_1", "y.doc_id AS doc_id_2",
        "x.n_sh AS na", "y.n_sh AS nb")
      .groupBy("doc_id_1", "doc_id_2", "na", "nb")
      .agg(count(lit(1)).as("common"))
    pairs
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard")
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val jaccardPairsSql =
    s"""WITH $shingleSqlCte
       |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       | len(list_intersect(a.sh, b.sh)) * 1.0
       |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d39

  /** Hot-shingle frequency cap for [[cappedJaccardDupPairs]]: shingles in
    * more than this many docs are dropped from pair GENERATION (they are
    * non-discriminative boilerplate) and reported by
    * [[hotShingleEvidence]]. The counting bound makes the hot set tiny:
    * at most total-occurrences/cap shingles can exceed the cap.
    */
  val ShingleDfCap = 20

  /** Capped-exact near-dup pairs — d05's answer through a skew-proof
    * plan, closing the one quadratic hole in the exact path
    * (d05 deliberately caps nothing; a shingle in 1e9 docs then emits
    * 1e18 pairs from one aggregation buffer). Three stages:
    * (1) ONE bounded posting aggregation
    * ([[graft.functions.BoundedPostingAgg]], bound = cap + 1): per
    * shingle, the cap+1 smallest doc_ids plus the exact df, O(cap)
    * state even for a shingle in 1e9 docs — this replaces the earlier
    * count-then-anti-join-then-collect_list two-pass shape (two
    * shuffles of the posting stream, and collect_list state only
    * bounded because the anti-join ran first); (2) pairs expand ONLY
    * where df ≤ cap — for exactly those groups the bounded list is
    * provably COMPLETE (df ≤ cap < bound means nothing was evicted),
    * so emission is O(cap²) per shingle on full cold postings;
    * (3) d06's exact verify re-joins the original
    * shingle arrays so `common` counts EVERY shared shingle, hot ones
    * included — the cap bounds who gets compared, never the measure.
    *
    * Residual risk, explicit: a pair whose shared shingles are ALL hot
    * is never generated. Such docs are boilerplate-only overlaps by
    * definition of the cap; [[hotShingleEvidence]] is the side channel
    * that makes the drop auditable (DedupSpec proves pair-set equality
    * with d05 on this corpus and postings boundedness).
    */
  def cappedJaccardDupPairs(s: SparkSession, dir: String): DataFrame = {
    // the shingle frame feeds pair generation AND both sides of the
    // exact-confirm rejoin — unpersisted, the split+hash shingling ran
    // three times per isolated run (in pipeline mode shingleHashed
    // returns the already-persisted shared frame and this is a no-op);
    // runner owns cleanup, as with q31/q33/d42
    val sh = shingleHashed(s, dir).persist()
    // fanOut (guide §2.5 input skew): the BoundedPostingAgg PARTIAL runs
    // fused with the read of the single-partition persisted shingle
    // frame, so the whole per-instance typed-aggregator update stream —
    // the dominant cost of this query, far heavier per row than d05's
    // codegen'd collect_list — otherwise runs on one task. The exchange
    // carries only (doc_id, shs); the confirm joins below keep reading
    // the un-fanned persisted frame.
    val ex = Tables.fanOut(sh).selectExpr("doc_id", "explode(shs) AS h")
    val bounded = udaf(new graft.functions.BoundedPostingAgg(ShingleDfCap + 1),
      org.apache.spark.sql.Encoders.scalaLong)
    val cand = ex.groupBy("h").agg(bounded(col("doc_id")).as("p"))
      .where(col("p.df") <= ShingleDfCap && size(col("p.ds")) > 1)
      .select(col("p.ds").as("ds"))
      .selectExpr(pairExplode)
      .selectExpr("x AS doc_id_1", "y AS doc_id_2")
      .distinct()
    cand
      .join(sh.selectExpr("doc_id AS doc_id_1", "shs AS sh1"), Seq("doc_id_1"))
      .join(sh.selectExpr("doc_id AS doc_id_2", "shs AS sh2"), Seq("doc_id_2"))
      .selectExpr("doc_id_1", "doc_id_2",
        "size(array_intersect(sh1, sh2)) AS common",
        "size(sh1) AS na", "size(sh2) AS nb")
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard")
      .orderBy("doc_id_1", "doc_id_2")
  }

  /** The dup-evidence side channel for [[cappedJaccardDupPairs]]: every
    * cap-dropped shingle with its document frequency — what an operator
    * audits to confirm the dropped overlap really is boilerplate (and
    * the input to a "top boilerplate n-grams" report).
    */
  def hotShingleEvidence(s: SparkSession, dir: String): DataFrame =
    shingleHashed(s, dir)
      .selectExpr("doc_id", "explode(shs) AS h")
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > ShingleDfCap)
      .orderBy(desc("df"), col("h"))

  // ---------------------------------------------------------------- d40

  /** Per-corpus (shingle TEXT, document frequency) aggregate — d40's
    * pre-limit frame, registry-aware: in pipeline mode the tokenize +
    * explode + agg runs once and d40 is a TakeOrdered over the cached
    * result. Kept SEPARATE from [[shingleHashed]] deliberately: the
    * hash-keyed frame every other dedup consumer shares cannot recover
    * shingle strings, and re-tokenizing just for the report is exactly
    * the duplicated work pipeline mode exists to remove.
    */
  private[ext] def shingleTextDf(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"shingleDf:$dir")
    if (pre != null) return pre
    // fanOut before the shingle-string explode (gram8's rationale)
    Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr(
        """explode(array_distinct(transform(sequence(1, size(toks)-2),
          |  i -> concat_ws(' ', slice(toks, i, 3))))) AS sh""".stripMargin)
      .groupBy("sh").agg(count(lit(1)).as("df"))
  }

  /** Boilerplate n-gram report — the top-20 trigram shingles by document
    * frequency, WITH their text: the human-readable face of d39's
    * hash-keyed dup-evidence channel (an operator inspects this list to
    * confirm the df-cap drops headers/footers, not content, and to seed
    * an explicit boilerplate-strip rule). One (shingle → df) aggregation
    * with map-side combine ([[shingleTextDf]], shared in pipeline mode),
    * then TakeOrderedAndProject — the full shingle keyspace never sorts
    * globally. Ties break on the shingle text so the top-20 is
    * total-ordered on both engines.
    */
  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame =
    shingleTextDf(s, dir)
      .orderBy(desc("df"), col("sh"))
      .limit(20)

  private val boilerplateNgramsSql =
    s"""WITH $shingleSqlCte
       |SELECT u.sh2 AS sh, count(*) AS df
       |FROM (SELECT doc_id, unnest(sh) AS sh2 FROM s) u
       |GROUP BY u.sh2
       |ORDER BY df DESC, sh LIMIT 20""".stripMargin

  // ------------------------------------------------------- PII scrubbing

  /** PII scrubbing transform — the redaction pass a training-data
    * pipeline runs before anything ships: masks emails, IPv4 addresses,
    * 13-19-digit runs (payment-card-shaped) and phone-shaped numbers,
    * in that order (IP before phone so dotted quads never half-match a
    * phone; card runs before phone so a 16-digit run is one mask).
    * Row-local `regexp_replace`/`regexp_count` chain — zero shuffles,
    * whole-stage codegen'd, linear in text size. Emits per-category
    * mask counts so the action is auditable (and filterable: a doc
    * that is mostly PII is usually spam).
    *
    * Library op with spec coverage rather than an oracle query: the
    * synthetic corpus plants no PII, so a registry entry would only
    * hash-check the identity transform.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    val card = "\\b\\d{13,19}\\b"
    val phone = "\\b(?:\\+?\\d{1,2}[ -])?\\(?\\d{3}\\)?[ -]?\\d{3}[ -]?\\d{4}\\b"
    val t = col(textCol)
    // Column-API regexp_count/lit — routing patterns through expr()'s SQL
    // string literal would re-escape the backslashes
    docs
      .withColumn("n_email", regexp_count(t, lit(email)))
      .withColumn("masked0", regexp_replace(t, email, "<EMAIL>"))
      .withColumn("n_ip", regexp_count(col("masked0"), lit(ip)))
      .withColumn("masked1", regexp_replace(col("masked0"), ip, "<IP>"))
      .withColumn("n_card", regexp_count(col("masked1"), lit(card)))
      .withColumn("masked2", regexp_replace(col("masked1"), card, "<CARD>"))
      .withColumn("n_phone", regexp_count(col("masked2"), lit(phone)))
      .withColumn(textCol, regexp_replace(col("masked2"), phone, "<PHONE>"))
      .drop("masked0", "masked1", "masked2")
      .withColumn("pii_masked",
        col("n_email") + col("n_ip") + col("n_card") + col("n_phone"))
  }

  // ---------------------------------------------------------------- d41

  /** PMI phrase mining — word2phrase-style collocation scoring: the
    * top-20 adjacent token pairs by pointwise mutual information
    * ln(p(ab)/(p(a)·p(b))), min bigram count 25. The corpus-level
    * companion of d33 (which scores DOCS by conditional bigram
    * likelihood; this scores PAIRS for phrase promotion — the step that
    * turns "new york" into a single vocabulary unit before tokenizer
    * training). Plan: token and bigram count tables join BY KEY (d23/
    * d33's unbounded-vocab discipline — never broadcast), the two
    * one-row totals broadcast, the top-20 is TakeOrderedAndProject.
    * Determinism: PMI = ln of ONE exact-integer rational
    * (cab·N²/(B·ca·cb)) — a single division and a single ln, 6-dp
    * display rounding (d23's policy); ties total-order on (w1, w2).
    */
  def pmiPhrases(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("explode(split(text,' ')) AS w")
    val cu = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val nTot = cu.agg(sum("c").as("n_tok"))
    val bigs = Tables.documents(s, dir)
      .selectExpr("split(text,' ') AS toks").where("size(toks) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2))) AS b""".stripMargin)
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cbt = bigs.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val bTot = cbt.agg(sum("cab").as("n_big"))
    cbt.filter(col("cab") >= 25)
      .join(cu.select(col("w").as("w1"), col("c").as("ca")), Seq("w1"))
      .join(cu.select(col("w").as("w2"), col("c").as("cb2")), Seq("w2"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(bTot))
      .select(col("w1"), col("w2"), col("cab"),
        round(log((col("cab") * col("n_tok") * col("n_tok")).cast("double") /
          (col("n_big") * col("ca") * col("cb2"))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(20)
  }

  private val pmiPhrasesSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |u AS (SELECT unnest(toks) AS w FROM t),
      |cu AS (SELECT w, count(*) AS c FROM u GROUP BY w),
      |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM cu),
      |b AS (SELECT unnest(list_transform(range(1, len(toks)),
      |        i -> {'w1': toks[i], 'w2': toks[i+1]})) AS e
      |      FROM t WHERE len(toks) >= 2),
      |cbt AS (SELECT e.w1 AS w1, e.w2 AS w2, count(*) AS cab
      |        FROM b GROUP BY 1, 2),
      |nb AS (SELECT CAST(sum(cab) AS BIGINT) AS n_big FROM cbt)
      |SELECT w1, w2, cab,
      |  round(ln(CAST(cab * n_tok * n_tok AS DOUBLE) / (n_big * ca * cb2)), 6)
      |    AS pmi
      |FROM (SELECT cbt.w1, cbt.w2, CAST(cbt.cab AS BIGINT) AS cab,
      |        CAST(a.c AS BIGINT) AS ca, CAST(b2.c AS BIGINT) AS cb2
      |      FROM cbt JOIN cu a ON cbt.w1 = a.w
      |      JOIN cu b2 ON cbt.w2 = b2.w
      |      WHERE cbt.cab >= 25), nt, nb
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- d06

  /** MinHash + LSH near-dup pairs — the 100 TB path. 32 minhash values
    * (xxhash64 of perm-index‖shingle), banded 8×4; docs sharing any band
    * bucket become candidates; candidates are exact-verified with the true
    * shingle jaccard ≥ 0.5. Shares d05's oracle: on this corpus the planted
    * dups sit at jaccard ≥ 0.8 where band recall is ≈ 0.996/pair and
    * empirically 1.0 (asserted in DedupSpec).
    */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleHashed(s, dir)
    // Signature computation is explode + one codegen'd hash-aggregation:
    // each shingle is already a long, the 32 permutations re-hash that
    // long (no string concat), and the per-doc minima are 32 flat `min`
    // aggregate buffers. (A pure array-lambda formulation looks neat but
    // Catalyst's projection collapse inlines the shingle array into every
    // lambda, recomputing it 32× — measured 26 s vs ~2 s at sf0.1.)
    val hv = sh.selectExpr("doc_id", "explode(shs) AS h")
    val minAggs = (0 until 32).map(i => min(expr(s"xxhash64($i, h)")).as(s"m$i"))
    val sigs = hv.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    // 8 bands × 4 rows; band key hashes the 4 signature longs directly.
    val bandStructs = (0 until 8).map(b =>
      s"named_struct('band', $b, 'bh', xxhash64(m${b * 4}, m${b * 4 + 1}, m${b * 4 + 2}, m${b * 4 + 3}))")
    // Candidate pairs via band-bucket posting lists (index computed once;
    // see pairExplode). No frequency cap here: the 64-bit band hash is
    // high-entropy, so a large bucket is a REAL dup cluster whose pairs
    // are all in the output — emission is output-bound, not skew.
    val cand = sigs
      .selectExpr("doc_id", s"explode(array(${bandStructs.mkString(",")})) AS e")
      .groupBy(col("e.band"), col("e.bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .selectExpr(pairExplode)
      .selectExpr("x AS doc_id_1", "y AS doc_id_2")
      .distinct()
    val withSets = cand
      .join(sh.selectExpr("doc_id AS doc_id_1", "shs AS sh1"), Seq("doc_id_1"))
      .join(sh.selectExpr("doc_id AS doc_id_2", "shs AS sh2"), Seq("doc_id_2"))
      .selectExpr("doc_id_1", "doc_id_2",
        "size(array_intersect(sh1, sh2)) AS common", "size(sh1) AS na", "size(sh2) AS nb")
    withSets
      .withColumn("jaccard",
        col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard")
      .orderBy("doc_id_1", "doc_id_2")
  }

  // ---------------------------------------------------------------- d07

  /** Portable 60-bit string hash, identical in Spark and DuckDB: the first
    * 15 hex digits of md5 parsed as an integer (DuckDB spells it
    * `('0x'||substr(md5(s),1,15))::BIGINT`; 15 digits = 60 bits < 2⁶³, so
    * the BIGINT cast never wraps). Cross-engine bit-identical — which is
    * what makes d07/d08/d14/d16/d17 hash-checkable instead of rows-only.
    * The Spark side runs the native `md5_long60` expression
    * (graft.functions.Md5Long60): digest bytes → long directly, none of
    * the hex-string/substring/conv re-parsing of the built-in chain
    * (equivalence pinned in CosineSimilaritySpec). Callers must
    * `GraftFunctions.register` first.
    */
  private[ext] def md5h60(arg: String): String = s"md5_long60($arg)"

  /** DuckDB spelling of [[md5h60]] — defined once so the oracle side can
    * never drift from the engine side. */
  private[ext] def md5h60Sql(arg: String): String =
    s"CAST(('0x' || substr(md5($arg),1,15)) AS BIGINT)"

  /** Deterministic doc bucket 0-99 (the d14 split key), Spark + oracle. */
  private[ext] val docBucket = s"pmod(${md5h60("CAST(doc_id AS STRING)")}, 100) AS bucket"

  /** The Spark-side BM25 per-term score (k1 = 1.2, b = 0.75, the
    * ln(1 + (N − df + ½)/(df + ½)) idf) over columns (tf, df, dl,
    * n_docs, sum_dl) — ONE definition shared by d62's inline retrieval,
    * the committed-artifact serves (d83/d84/d85) and e41's lexical arm,
    * so the engine-side formula can never drift between call sites
    * (the SQL side is [[bm25SqlOver]]'s single definition). UNROUNDED:
    * per-term consumers round at 6 dp, document-at-a-time consumers sum
    * terms first and round the sum (e41's measured-noise discipline).
    */
  private[ext] val bm25TermScoreExpr =
    """ln(1.0D + (CAST(n_docs AS DOUBLE) - df + 0.5D) / (df + 0.5D))
      |  * (tf * 2.2D)
      |  / (tf + 1.2D * (0.25D + 0.75D * (dl * 1.0D * n_docs / sum_dl)))""".stripMargin

  /** Train/val/test bucket boundaries — the single source of truth for
    * d14's split, d17/d24's base-vs-incoming cut, and d26's leakage
    * matrix (both the Spark plans and the oracle SQL interpolate these).
    */
  private[ext] val TrainCut = 80
  private val ValCut = 90
  private val splitCase =
    s"CASE WHEN bucket < $TrainCut THEN 'train' WHEN bucket < $ValCut THEN 'val' ELSE 'test' END AS split"

  /** d17/d24's shared prologue: documents with their hash bucket, cut
    * into (base corpus, incoming batch) at [[TrainCut]].
    */
  private def baseIncoming(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .selectExpr("doc_id", "text", docBucket)
    (docs.filter(col("bucket") < TrainCut), docs.filter(col("bucket") >= TrainCut))
  }
  private[ext] val docBucketSql = s"${md5h60Sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket"

  /** SimHash(60) near-dup pairs: per-bit majority vote over the doc's
    * distinct trigram-shingle hashes (shingles, not unigrams — the corpus
    * vocabulary is so small that unigram sets barely differ across docs,
    * while shingle sets overlap ≈98% only for true near-dups), LSH-banded,
    * verified by hamming ≤ 7.
    *
    * The threshold/band pair is chosen so the banded plan is PROVABLY
    * equal to the brute-force oracle: 8 bands over 60 bits and hamming ≤ 7
    * means ≤7 flipped bits land in ≤7 bands, so at least one band is
    * intact (pigeonhole) and every qualifying pair becomes a candidate.
    * Measured at sf0.01 the true near-dups sit at hamming ≤ 7 and the
    * background starts at 15 — the threshold sits in the gap.
    *
    * There is deliberately NO band-frequency cap in this exact variant:
    * pair emission happens BEFORE the hamming filter, so a hot (band,
    * value) bucket does go quadratic — that is the price of full recall,
    * since a 7-8-bit band collision says little and capped buckets could
    * hide qualifying pairs. On a low-entropy corpus at cluster scale,
    * re-introduce the cap (`.where(size(col("ds")).between(2, cap))`) and
    * accept best-effort recall — the standard LSH production trade; the
    * oracle equality then no longer holds by construction.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // Explode + one hash-aggregation with 60 flat sum buffers (per-bit
    // majority votes), then recombine the bits. The nested array-lambda
    // formulation was 100× slower: projection collapse inlined the shingle
    // hashing into each of the bit-folds.
    val hv = Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id",
        """explode(array_distinct(transform(sequence(1, size(toks)-2),
          |  i -> concat_ws(' ', slice(toks, i, 3))))) AS sh""".stripMargin)
      .selectExpr("doc_id", s"${md5h60("sh")} AS h")
    val bitAggs = (0 until 60).map(b =>
      sum(expr(s"IF((shiftright(h, $b) & 1) = 1, 1, -1)")).as(s"b$b"))
    val recombine = (0 until 60)
      .map(b => s"IF(b$b > 0, shiftleft(CAST(1 AS BIGINT), $b), CAST(0 AS BIGINT))")
      .mkString(" + ")
    val sim = hv.groupBy("doc_id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .selectExpr("doc_id", s"($recombine) AS simhash")
    // 8 bands over 60 bits: 4×8-bit + 4×7-bit chunks.
    val widths = Seq(8, 8, 8, 8, 7, 7, 7, 7)
    val offsets = widths.scanLeft(0)(_ + _).init
    val bandExprs = widths.zip(offsets).zipWithIndex.map { case ((w, off), b) =>
      s"named_struct('band', $b, 'bv', shiftright(simhash, $off) & ${(1 << w) - 1})"
    }
    sim.selectExpr("doc_id", "simhash", s"explode(array(${bandExprs.mkString(",")})) AS e")
      .groupBy(col("e.band"), col("e.bv"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
      .where(size(col("ds")) > 1)
      .selectExpr(pairExplode)
      .selectExpr("x.doc_id AS doc_id_1", "y.doc_id AS doc_id_2",
        "x.simhash AS sh1", "y.simhash AS sh2")
      .distinct()
      .selectExpr("doc_id_1", "doc_id_2", "bit_count(sh1 ^ sh2) AS hamming")
      .filter(col("hamming") <= 7)
      .orderBy("doc_id_1", "doc_id_2")
  }

  // Oracle: brute-force all-pairs hamming over the same 60-bit simhash —
  // quadratic is fine at oracle scale; equality with the banded plan is
  // the pigeonhole argument above.
  private val simhashPairsSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |s AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, len(toks)-1),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |      FROM t WHERE len(toks) >= 3),
      |h AS (SELECT doc_id,
      |        list_transform(sh, x -> CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)) AS hs
      |      FROM s),
      |sim AS (SELECT doc_id,
      |          list_reduce(list_transform(range(0, 60), b ->
      |            CASE WHEN len(list_filter(hs, x -> (x >> b) & 1 = 1)) * 2 > len(hs)
      |                 THEN (1::BIGINT << b) ELSE 0::BIGINT END), (a, c) -> a + c) AS simhash
      |        FROM h)
      |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
      |       bit_count(xor(a.simhash, b.simhash)) AS hamming
      |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
      |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d08

  /** Winnowing document fingerprints (rolling char-5-gram hashes, window-4
    * minima, distinct): doc_id → fingerprint-set size + xor checksum.
    * Uses the portable md5-60 hash so the whole pipeline — k-gram hashing,
    * window minima, distinct, xor fold — is replayed verbatim by the
    * DuckDB oracle (hash-checked, not rows-only).
    */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // fanOut: ~296 substring-md5s per doc, fully row-local — the whole
    // fingerprint pass is scan-fused onto one task without it
    Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .where("length(text) >= 8")
      .selectExpr("doc_id",
        s"transform(sequence(1, length(text)-4), i -> ${md5h60("substring(text, i, 5)")}) AS hs")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(1, size(hs)-3), i -> array_min(slice(hs, i, 4)))) AS fps")
      .selectExpr("doc_id", "size(fps) AS n_fp",
        "aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a ^ x) AS fp_xor")
      .orderBy("doc_id")
  }

  // DuckDB range(a,b) is exclusive of b where Spark's sequence(a,b) is
  // inclusive — hence range(1, length-3) ≙ sequence(1, length-4) and
  // hs[i:i+3] (inclusive slice, 4 elements) ≙ slice(hs, i, 4).
  private val winnowFingerprintSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_transform(range(1, length(text)-3),
      |      i -> CAST(('0x' || substr(md5(substr(text, i, 5)),1,15)) AS BIGINT)) AS hs
      |  FROM documents WHERE length(text) >= 8),
      |f AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(hs)-2),
      |      i -> list_min(hs[i:i+3]))) AS fps
      |  FROM h)
      |SELECT doc_id, len(fps) AS n_fp,
      |       list_reduce(fps, (a, x) -> xor(a, x)) AS fp_xor
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d09

  /** Token frequency table via generator/explode (the one UDTF-shaped
    * surface — SURVEY §2.10 note on explode).
    */
  def tokenFrequencies(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("explode(split(text,' ')) AS token")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))

  private val tokenFrequenciesSql =
    """SELECT tok AS token, count(*) AS n
      |FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
      |GROUP BY 1 ORDER BY n DESC, token""".stripMargin

  // ---------------------------------------------------------------- d10

  /** BPE-style pre-tokenization counting (GPT-2-ish pretokenizer classes:
    * contractions, space-prefixed letter runs, digit runs, punctuation
    * runs) alongside plain whitespace counting — the two token-count
    * surfaces a training-data pipeline meters by. Both engines' regex
    * dialects (Java / RE2) agree on this alternation: leftmost-first, no
    * lookaround. This corpus is lowercase words only, so the interesting
    * classes match zero here — the operator surface is what's exercised.
    */
  def bpeTokenCounts(s: SparkSession, dir: String): DataFrame = {
    val pat = """\'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"""
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "size(split(text, ' ')) AS n_ws_tokens",
        s"regexp_extract_all(text, '$pat', 0) AS ts")
      .selectExpr("doc_id", "n_ws_tokens",
        "size(ts) AS n_bpe_tokens",
        "size(array_distinct(ts)) AS n_uniq_bpe")
      .orderBy("doc_id")
  }

  private val bpeTokenCountsSql = {
    val pat = """''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"""
    s"""SELECT doc_id,
       | len(string_split(text, ' ')) AS n_ws_tokens,
       | len(regexp_extract_all(text, '$pat')) AS n_bpe_tokens,
       | len(list_distinct(regexp_extract_all(text, '$pat'))) AS n_uniq_bpe
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d11

  /** Top-50 tokens via the Misra-Gries heavy-hitters Aggregator
    * (graft.functions.HeavyHittersAgg) — bounded-state frequent-items
    * with ONE small map per partition shuffled to the final merge,
    * instead of a full token-space groupBy (d09's exact formulation).
    * Capacity 64 exceeds this corpus's vocabulary, so no eviction fires
    * and the result is exact — shares d09's oracle shape with LIMIT.
    */
  def heavyHitterTokens(s: SparkSession, dir: String): DataFrame = {
    val hh = udaf(new graft.functions.HeavyHittersAgg(k = 50, capacity = 64))
    Tables.documents(s, dir)
      .selectExpr("explode(split(text,' ')) AS token")
      .agg(hh(col("token")).as("hits"))
      .selectExpr("inline(hits)")
      .orderBy(desc("est_count"), col("token"))
  }

  private val heavyHitterTokensSql =
    """SELECT tok AS token, count(*) AS est_count
      |FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
      |GROUP BY 1 ORDER BY est_count DESC, token LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- d12

  /** Edit-distance verification of near-dup candidates: the fuzzy-dedup
    * composition where a cheap candidate generator (trigram-Jaccard
    * posting lists, d05) bounds the pair set and the expensive O(len²)
    * `levenshtein` runs ONLY on candidates — never all pairs.
    *
    * Cross-engine caveat (probe-discovered): Spark's levenshtein counts
    * CHARACTERS while DuckDB's counts UTF-8 BYTES ('héllo'→'hello' is 1
    * vs 2) — the oracle comparison is therefore valid only on ASCII
    * corpora like this one. The engine's contract is the character-based
    * distance (pinned in SemanticsSpec).
    */
  def editDistanceDupPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    jaccardDupPairs(s, dir)
      .join(docs.selectExpr("doc_id AS doc_id_1", "text AS t1"), Seq("doc_id_1"))
      .join(docs.selectExpr("doc_id AS doc_id_2", "text AS t2"), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        levenshtein(col("t1"), col("t2")).as("edit_dist"),
        (length(col("t1")) + length(col("t2"))).as("len_sum"))
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val editDistanceDupPairsSql =
    s"""WITH $shingleSqlCte,
       |pairs AS (
       |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5)
       |SELECT doc_id_1, doc_id_2,
       | levenshtein(d1.text, d2.text) AS edit_dist,
       | length(d1.text) + length(d2.text) AS len_sum
       |FROM pairs
       |JOIN documents d1 ON d1.doc_id = doc_id_1
       |JOIN documents d2 ON d2.doc_id = doc_id_2
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d13

  /** Near-dup CLUSTERS: connected components over the d05 pair graph,
    * labeling every clustered doc with the min doc_id of its component —
    * the "keep one canonical doc per dup cluster" step that follows pair
    * finding in a dedup pipeline (pairs alone over-delete on transitive
    * chains A~B~C).
    *
    * Spark-first CC: iterative hash-min label propagation — every node
    * starts as its own label; each round takes the min label across
    * neighbors; fixpoint in ≤ diameter rounds. Each round is one shuffle
    * join + partial agg, fully distributed; the driver loop only counts
    * changed labels (a scalar per round — NOT a data collect). Lineage is
    * truncated per round with localCheckpoint so 10 rounds don't build a
    * 10-deep recompute chain. Dup-cluster graphs have tiny diameters
    * (chains of near-identical docs), so rounds ≈ 3-5 in practice; the
    * iteration cap is a safety rail.
    */
  /** Symmetric near-dup edge list (both directions of every d05 pair),
    * lineage-truncated — the one derivation d13's label propagation and
    * d51's power iteration both start from.
    */
  private def dupEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardDupPairs(s, dir)
      .select(col("doc_id_1").as("src"), col("doc_id_2").as("dst"))
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
  }

  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"clusters:$dir")
    if (pre != null) return pre
    connectedComponents(dupEdges(s, dir)).orderBy("doc_id")
  }

  /** Min-label-propagation connected components over a SYMMETRIC (src,
    * dst) edge frame — d13's loop, factored so the approx-tier applied
    * dedup (d78) can run it over d06's banded pairs. One join + agg job
    * per round; labels localCheckpoint so lineage stays flat. Returns
    * (doc_id, cluster_id) for every node WITH an edge (singletons are
    * the caller's left-join concern).
    *
    * ROUND-COMPLEXITY BOUND (the assumption this formulation rides):
    * plain min-label propagation moves a label ONE hop per round, so
    * convergence takes exactly eccentricity(min-node) ≈ O(graph
    * diameter) rounds — DedupSpec measures a 50-node path at its full
    * 49 propagation hops, vs 2 rounds for a 20-node clique. That is
    * the RIGHT trade for dup-cluster graphs, whose components are
    * near-cliques of mutually-similar documents (diameter 2-4: every
    * round is one cheap join + partial agg, and a star-contraction
    * scheme would pay its extra alternating passes for nothing). It is
    * the WRONG algorithm for path-shaped graphs (transitive chains
    * thousands of hops long): there the alternating large-star /
    * small-star contraction (Kiveris et al. 2014, "Connected
    * Components in MapReduce and Beyond" — O(log² n) rounds on any
    * shape) is the SHIPPED replacement: [[connectedComponentsStar]],
    * label-identical on any graph. The 64-round rail here therefore
    * FAILS LOUDLY rather than returning silently-wrong labels: a
    * component with diameter ≥ 64 is outside this operator's posture,
    * not a partial answer.
    */
  private[ext] def connectedComponents(edges: DataFrame): DataFrame =
    connectedComponentsWithRounds(edges)._1

  /** [[connectedComponents]] plus the converged round count — the spec
    * hook that pins the O(diameter) bound as a measurement.
    */
  private[graft] def connectedComponentsWithRounds(
      edges: DataFrame): (DataFrame, Int) = {
    // Initialization folds the first propagation round in: every node
    // starts at min(own id, smallest neighbor) straight off the edge
    // aggregation, saving one join+count round trip.
    var labels = edges
      .groupBy(col("src").as("doc_id"))
      .agg(min(least(col("src"), col("dst"))).as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      val prop = edges
        .join(labels.select(col("doc_id").as("src"), col("lbl").as("slbl")), "src")
        .groupBy(col("dst").as("doc_id")).agg(min("slbl").as("nlbl"))
      // One job per round: the convergence count doubles as the action that
      // materializes the (lazy) checkpoint, and `chg` is computed inline so
      // no second join against the previous labels is needed.
      val next = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .localCheckpoint(false)
      changed = next.filter(col("chg")).count()
      labels = next.select("doc_id", "lbl")
      rounds += 1
    }
    require(changed == 0,
      s"connectedComponents hit the 64-round rail with $changed labels " +
        "still moving — a component's diameter exceeds the min-label-" +
        "propagation posture (see the scaladoc bound; path-shaped graphs " +
        "need connectedComponentsStar, not a truncated answer)")
    (labels.select(col("doc_id"), col("lbl").as("cluster_id")), rounds)
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") —
    * the O(log² n)-round variant [[connectedComponents]]'s scaladoc
    * names as the replacement for graphs whose diameter breaks the
    * one-hop-per-round propagation bound. Each round is two
    * edge-rewrites, each one groupBy + join over the CURRENT edge set
    * (which only shrinks toward the star forest): large-star hangs
    * every larger neighbor off its neighborhood minimum, small-star
    * contracts the smaller neighbors; the fixpoint is a star per
    * component centered at its minimum id, read off as the label
    * table. Convergence is detected by the edge multiset's (count,
    * hash-sum) signature repeating — a fixpoint re-derives itself, so
    * one extra round is the worst a collision could cost, and the
    * 64-round rail (≫ log² of any physical corpus) still fails loudly.
    *
    * Same contract as [[connectedComponents]]: symmetric (src, dst)
    * edges in, (doc_id, cluster_id) out for every node WITH an edge,
    * labels = component minimum — bit-identical to the propagation
    * variant on any graph (DedupSpec pins both shapes plus an
    * 80-node path the propagation rail rejects). The dedup registry
    * keeps the propagation form (near-clique components converge in
    * 2-3 cheap rounds; the star alternation pays two rewrites per
    * round for a logarithm those graphs never need).
    */
  private[graft] def connectedComponentsStar(
      edges: DataFrame): (DataFrame, Int) = {
    val nodes = edges.select(col("src").as("doc_id")).distinct()
      .localCheckpoint()
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var e = canon(edges.select(col("src").as("u"), col("dst").as("v")))
      .localCheckpoint()
    def signature(d: DataFrame): (Long, Long) = {
      // hash-sum mod p: ANSI-safe (raw 64-bit sums overflow) and still
      // a sound multiset signature up to the harmless-collision caveat
      val r = d.agg(count(lit(1)),
        sum(expr("pmod(xxhash64(u, v), 1000000007L)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def largeStar(d: DataFrame): DataFrame = {
      val sym = d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def smallStar(d: DataFrame): DataFrame = {
      val mins = d.groupBy("u").agg(min("v").as("m"))
      val others = d.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      others.unionByName(mins.select(col("u"), col("m").as("v"))).distinct()
    }
    var sig = signature(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 64) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val next = signature(e)
      converged = next == sig
      sig = next
      rounds += 1
    }
    require(converged,
      "connectedComponentsStar did not converge within 64 rounds — " +
        "beyond the O(log² n) bound, this indicates a bug, not a graph")
    val starLbl = e.select(col("u").as("doc_id"), col("v").as("lbl"))
      .groupBy("doc_id").agg(min("lbl").as("lbl"))
    val labels = nodes.join(starLbl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
    (labels, rounds)
  }

  // Symmetric near-dup edge CTE chain (shared by the d13/d49/d51
  // oracles): shingles → ≥0.5-jaccard pairs → symmetric edges.
  private val ccEdgesCte =
    s"""$shingleSqlCte,
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs)""".stripMargin

  // ...plus transitive reachability (UNION dedups → terminates).
  private val ccReachCte =
    s"""$ccEdgesCte,
       |reach(doc_id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id)""".stripMargin

  private val dupClustersSql =
    s"""WITH RECURSIVE $ccReachCte
       |SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d14

  /** Deterministic train/val/test split by content-independent hash of the
    * key — the reproducible-split primitive of a training pipeline (same
    * doc lands in the same split on every run, every engine, any
    * partitioning; no RNG, no sampleBy). Bucket = md5-60(doc_id) mod 100;
    * 80/10/10. Query twin of telemetry.Scorer.hashSplit, made portable
    * (and therefore oracle-checkable) via the md5 hash.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", docBucket)
      .selectExpr("doc_id", "bucket", splitCase)
      .orderBy("doc_id")
  }

  private val hashSplitSql =
    s"""SELECT doc_id, bucket, $splitCase
       |FROM (SELECT doc_id, $docBucketSql FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d15

  /** Token-window chunking: split each doc into 128-token chunks with
    * stride 64 (overlapping halves) — the context-window packing step
    * before tokenization in a training pipeline. Pure array ops + one
    * generator explode; no UDF. Chunk count = ceil(n_tokens/64), so the
    * last chunk may be a short tail (standard; padding is the trainer's
    * concern, not the engine's).
    */
  def tokenChunks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .selectExpr("doc_id",
        """posexplode(transform(sequence(0, CAST(ceil(size(toks)/64.0) AS INT) - 1),
          |  i -> concat_ws(' ', slice(toks, i*64 + 1, 128)))) AS (chunk_idx, chunk)""".stripMargin)
      .selectExpr("doc_id", "chunk_idx", "size(split(chunk, ' ')) AS n_chunk_tokens", "chunk")
      .orderBy("doc_id", "chunk_idx")

  private val tokenChunksSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |c AS (SELECT doc_id,
      |        unnest(list_transform(range(0, CAST(ceil(len(toks)/64.0) AS BIGINT)),
      |          i -> {'idx': i, 'chunk': array_to_string(toks[(i*64+1):(i*64+128)], ' ')})) AS e
      |      FROM t)
      |SELECT doc_id, CAST(e.idx AS INT) AS chunk_idx,
      |       len(string_split(e.chunk, ' ')) AS n_chunk_tokens, e.chunk AS chunk
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- d16

  /** Deterministic stratified sample: up to 20 docs per language, chosen
    * by md5-60 hash order (not file/partition order) — reproducible on
    * any engine, any partitioning, and statistically unbiased w.r.t.
    * document content. The per-stratum quota is a window rank, so the
    * plan is one shuffle on the (low-cardinality) stratum key; skewed
    * strata cost sort-of-stratum, not sort-of-table.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "lang",
        s"${md5h60("CAST(doc_id AS STRING)")} AS hk")
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rn") <= 20)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  private val stratifiedSampleSql =
    s"""SELECT lang, CAST(rn AS INT) AS rn, doc_id
       |FROM (SELECT lang, doc_id,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY ${md5h60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
       |      FROM documents)
       |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- d17

  /** Incremental dedup: an "incoming" batch is admitted only if its text
    * doesn't already exist in the "base" corpus — the daily-ingest shape
    * of production dedup (new data vs existing corpus, not all-pairs).
    * Split here is the deterministic d14 hash split (base = buckets <80,
    * incoming = rest). LEFT ANTI join on the text; at 100 TB the join key
    * is xxhash64(text) with in-bucket confirmation, and the base side is
    * a bucketed table so the probe is exchange-free — the all-important
    * property is that cost scales with |incoming|, not |corpus|².
    */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val (base, incoming) = baseIncoming(s, dir)
    incoming
      .join(base.select("text"), Seq("text"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id")
  }

  // NOT EXISTS, not NOT IN: NOT IN returns NULL for every row as soon as
  // the base side contains a single NULL text (and silently drops
  // NULL-text incoming rows), which would diverge from Spark's left_anti.
  private val incrementalDedupSql =
    s"""WITH b AS (SELECT doc_id, text, $docBucketSql FROM documents)
       |SELECT i.doc_id FROM b i
       |WHERE i.bucket >= $TrainCut
       |  AND NOT EXISTS (SELECT 1 FROM b WHERE bucket < $TrainCut AND text = i.text)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d18

  /** Eval-set decontamination: flag (train, eval) doc pairs sharing ≥ 5
    * distinct trigram shingles — the benchmark-leakage check a training
    * pipeline runs before a data release. Eval = the top 5% of the
    * deterministic d14 hash split; overlap is computed on the inverted
    * index (explode shingles, join train↔eval postings per shingle,
    * count per pair) so cost scales with shared-shingle postings, never
    * |train| × |eval|. The eval side is small by construction, so at
    * cluster scale its exploded postings broadcast.
    *
    * Oracle caveat (same as d05/d13): the engine counts shared 64-bit
    * xxhash64 shingle hashes while the oracle intersects raw shingle
    * strings, so a cross-shingle hash collision shared by a (train, eval)
    * pair could shift n_shared and flip the ≥ 5 admission near the
    * boundary. Collision odds at the gate corpus (~27k distinct shingles)
    * are ~1e-11; they grow with vocabulary, which is acceptable for the
    * engine itself (a rare extra flagged pair only makes decontamination
    * more conservative) but means the DuckDB hash-check is a small-SF
    * gate, not a large-corpus invariant.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleHashed(s, dir)
      .selectExpr("doc_id", docBucket, "shs")
    val train = sh.filter(col("bucket") < 95)
      .selectExpr("doc_id AS train_id", "explode(shs) AS h")
    val eval = sh.filter(col("bucket") >= 95)
      .selectExpr("doc_id AS eval_id", "explode(shs) AS h")
    train.join(broadcast(eval), Seq("h"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
      .orderBy("train_id", "eval_id")
  }

  private val contaminationSql =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks, $docBucketSql
       |      FROM documents),
      |s AS (SELECT doc_id, bucket,
      |        list_distinct(list_transform(range(1, len(toks)-1),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |      FROM t WHERE len(toks) >= 3)
      |SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
      |       len(list_intersect(a.sh, b.sh)) AS n_shared
      |FROM s a JOIN s b ON a.bucket < 95 AND b.bucket >= 95
      |WHERE len(list_intersect(a.sh, b.sh)) >= 5
      |ORDER BY train_id, eval_id""".stripMargin

  // ---------------------------------------------------------------- d19

  /** Gopher-style repetition signals (Rae et al. 2021 §A.1.1 re-expressed
    * relationally): per-doc duplicate-token fraction, duplicate-bigram
    * fraction, and the fraction of bigram slots covered by the single most
    * frequent bigram — the standard "natural text vs degenerate repetition"
    * quality gates of a training-data pipeline.
    *
    * All three signals are per-doc array ops — ZERO shuffle. The only
    * non-obvious one is the top-bigram count, which is NOT a corpus
    * frequency question: it is "longest equal run in this doc's SORTED
    * bigram array", an O(n log n) per-doc `aggregate(array_sort(bgs),…)`
    * fold. Earlier revisions shipped the bigrams through a
    * (doc, bigram) hash-agg + doc_id regroup — two exchanges moving
    * every bigram of the corpus over the network to compute a quantity
    * each row already holds locally; the fold formulation deletes both
    * (measured 1.9 s → ~0.3 s at sf0.1) and, unlike a
    * distinct×scan HOF probe, stays n log n for book-length outliers,
    * so the map-only shape survives any doc-size distribution at
    * 100 TB.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id", "size(toks) AS n_tokens",
        "size(array_distinct(toks)) AS n_uniq",
        "transform(sequence(1, size(toks)-1), i -> concat_ws(' ', slice(toks, i, 2))) AS bgs")
      .selectExpr("doc_id", "n_tokens", "n_uniq", "size(bgs) AS n_bgs",
        "size(array_distinct(bgs)) AS n_uniq_bgs",
        // longest equal run in the sorted bigram array == max per-bigram
        // count; the struct carries (previous element, current run, best)
        """aggregate(array_sort(bgs),
          |  struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),
          |  (acc, x) -> struct(x AS prev,
          |    IF(x <=> acc.prev, acc.run + 1L, 1L) AS run,
          |    greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L)) AS best),
          |  acc -> acc.best) AS top_n""".stripMargin)
      .selectExpr("doc_id", "n_tokens",
        "round(1.0D - n_uniq * 1.0D / n_tokens, 6) AS dup_token_frac",
        "round(1.0D - n_uniq_bgs * 1.0D / n_bgs, 6) AS dup_bigram_frac",
        "round(top_n * 1.0D / n_bgs, 6) AS top_bigram_frac")
      .orderBy("doc_id")

  private val repetitionStatsSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
      |           WHERE len(string_split(text,' ')) >= 2),
      |b AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq,
      |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
      |      FROM t),
      |c AS (SELECT doc_id, bg, count(*) AS n
      |      FROM (SELECT doc_id, unnest(bgs) AS bg FROM b) GROUP BY 1, 2),
      |m AS (SELECT doc_id, max(n) AS top_n FROM c GROUP BY 1)
      |SELECT b.doc_id, n_tokens,
      | round(1.0 - n_uniq * 1.0 / n_tokens, 6) AS dup_token_frac,
      | round(1.0 - len(list_distinct(bgs)) * 1.0 / len(bgs), 6) AS dup_bigram_frac,
      | round(top_n * 1.0 / len(bgs), 6) AS top_bigram_frac
      |FROM b JOIN m ON b.doc_id = m.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------- d20

  /** Cross-document duplicated-n-gram fraction: per doc, the share of its
    * distinct sliding 8-grams that also occur in at least one other doc —
    * the alignment-invariant "how much of this doc exists elsewhere in the
    * corpus" measure (the dedup-scoring side of exact-substring dedup à la
    * Lee et al. 2022), where fixed-boundary chunk hashing would miss
    * shifted near-dups.
    *
    * Set semantics per doc (array_distinct) so a doc's own internal
    * repetition (d19's signal) doesn't inflate its cross-doc score.
    * Posting aggregation keys on xxhash64(gram) with an in-bucket
    * collision confirm ([[gram8]]) — the 100 TB shuffle carries 8-byte
    * keys, and the raw-gram fallback branch keeps semantics exact.
    *
    * Plan shape: posting lists, not a self-join — the gram stream is
    * built once ([[gram8]], persisted), grouped ONCE (collect_set of doc
    * ids per gram hash) and each posting list is exploded back to
    * (doc, n_docs) attributions. Posting lists must be frequency-capped
    * at scale like d05's (a boilerplate gram shared by every doc is an
    * unbounded set AND, past the cap, is dup evidence of no further
    * discriminative value).
    */
  /** Per-doc distinct sliding 8-grams — the exploded subtree d20, d45
    * and d46 consume (d20/d45 twice each: posting aggregation + attribution
    * rejoin). Consults the shared-frames registry first; self-contained
    * runs persist under the registry contract (runner clearCache()
    * between queries — q31's documented ownership model), so the
    * explode+distinct computes ONCE per query either way. Columns carry
    * the raw gram `g` plus TWO independent 64-bit hashes: `h` is the
    * posting key the aggregations shuffle on (8 bytes instead of a
    * ~50-byte gram string), `h2` is the collision detector — a bucket
    * whose h2 min ≠ max holds two distinct grams (missing a collision
    * needs a simultaneous 128-bit collision: never) and is routed
    * through the exact raw-gram path by the consumers. Exact semantics
    * at hash-key shuffle cost.
    */
  /** Gram posting-hash width in bits (64 = production). Test hook
    * (DedupSpec): narrowing it (e.g. to 8) forces bucket collisions so
    * the h2-confirm exact fallback branches in d20/d45/d46/d48 actually
    * EXECUTE — under honest 64-bit hashing those paths are unreachable
    * in practice, and an untested exactness guarantee is no guarantee.
    */
  private[graft] var gramHashBits: Int = 64

  /** The (possibly narrowed) posting-hash expression — every frame that
    * joins against gram8-derived tables must hash through this so the
    * keys stay consistent under the test hook.
    */
  private[ext] def gramHashExpr(c: String): String =
    if (gramHashBits >= 64) s"xxhash64($c)"
    else s"pmod(xxhash64($c), ${1L << gramHashBits}L)"

  private[graft] def gram8(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"grams8:$dir")
    if (pre != null) return pre
    // fanOut: ~290 8-gram strings + 2 hashes per doc fuse into the scan
    // stage — one task on a 1-row-group input without it (guide §2.5)
    Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 8")
      .selectExpr("doc_id",
        """explode(array_distinct(transform(sequence(1, size(toks)-7),
          |  i -> concat_ws(' ', slice(toks, i, 8))))) AS g""".stripMargin)
      .selectExpr("doc_id", "g", s"${gramHashExpr("g")} AS h",
        "xxhash64(g, 42) AS h2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  def crossdocNgramDup(s: SparkSession, dir: String): DataFrame = {
    val grams = gram8(s, dir)
    // posting sets keyed by the 8-byte gram hash; h2 span detects the
    // (never-observed) bucket collision. ReuseExchange serves both
    // filters of aggH from one shuffle.
    val aggH = grams.groupBy("h")
      .agg(collect_set("doc_id").as("ds"),
        min("h2").as("h2lo"), max("h2").as("h2hi"))
    val clean = aggH.filter(col("h2lo") === col("h2hi"))
      .selectExpr("size(ds) AS n_docs", "explode(ds) AS doc_id")
    // collision fallback: regroup ONLY those buckets by the raw gram —
    // exact semantics preserved; the branch is empty in practice
    val bad = aggH.filter(col("h2lo") =!= col("h2hi")).select("h")
    val exact = grams.join(bad, "h")
      .groupBy("g").agg(collect_set("doc_id").as("ds"))
      .selectExpr("size(ds) AS n_docs", "explode(ds) AS doc_id")
    clean.union(exact)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .selectExpr("doc_id", "n_ngrams", "n_shared",
        "round(n_shared * 1.0D / n_ngrams, 6) AS shared_frac")
      .orderBy("doc_id")
  }

  private val crossdocNgramDupSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
      |           WHERE len(string_split(text,' ')) >= 8),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-6),
      |        i -> array_to_string(toks[i:(i+7)], ' ')))) AS g
      |      FROM t),
      |c AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY 1)
      |SELECT g.doc_id, count(*) AS n_ngrams,
      | CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      | round(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS shared_frac
      |FROM g JOIN c ON g.g = c.g
      |GROUP BY g.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d21

  /** TF-IDF top-3 terms per document — the keyword-extraction /
    * doc-representation step of a text pipeline. tf is the in-doc count,
    * idf = ln(N/df) with df = docs containing the term; the per-doc top-3
    * ranks on (tfidf desc, token) so ties are engine-stable.
    *
    * Plan: one explode + (doc, token) count, then a token-keyed df agg
    * joined back on token (both sides already reduced), then a per-doc
    * top-3 window — partitioned by doc_id, so the sort is per-doc-vocab,
    * never global. N is a 1-row broadcast. ln() is IEEE-double libm in
    * both engines; equal (tf, df) pairs produce bit-equal scores and the
    * token tie-break settles them, which is the only place agreement is
    * load-bearing.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "explode(split(text,' ')) AS token")
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("token")).crossJoin(broadcast(n))
      .selectExpr("doc_id", "token",
        "round(tf * ln(n_docs * 1.0D / df), 6) AS tfidf")
      .withColumn("term_rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))))
      .filter(col("term_rank") <= 3)
      .select("doc_id", "term_rank", "token", "tfidf")
      .orderBy("doc_id", "term_rank")
  }

  private val tfidfTopTermsSql =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |              FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.token,
      |         round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
      |  FROM tf JOIN df ON tf.token = df.token, n),
      |r AS (SELECT doc_id, token, tfidf,
      |        row_number() OVER (PARTITION BY doc_id
      |          ORDER BY tfidf DESC, token) AS term_rank
      |      FROM scored)
      |SELECT doc_id, CAST(term_rank AS INT) AS term_rank, token, tfidf
      |FROM r WHERE term_rank <= 3
      |ORDER BY doc_id, term_rank""".stripMargin

  // ---------------------------------------------------------------- d22

  /** Vocabulary pruning (sklearn CountVectorizer min_df/max_df
    * semantics): drop tokens that are too rare (df ≤ 6% of docs — noise,
    * typos) or too common (df > 78% — corpus stopwords), and rebuild
    * each document from its surviving tokens in original order.
    *
    * Plan: one posexplode; df is a token-keyed agg over distinct (doc,
    * token) pairs (reduced before counting); the pruned vocab is tiny by
    * construction (it lives between two df cuts) so it broadcasts back
    * onto the token stream — the big side shuffles once, on doc_id, for
    * the rebuild. Reconstruction keeps token order via the posexplode
    * index (`array_sort` on (pos, token) structs ↔ `string_agg … ORDER
    * BY pos`), so the output is the filtered document, not a bag of
    * words.
    */
  def vocabPrune(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "posexplode(split(text,' ')) AS (pos, token)")
    val dfT = toks.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df_t"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val vocab = dfT.crossJoin(broadcast(n))
      .filter(col("df_t") > col("n_docs") * 0.06 &&
        col("df_t") <= col("n_docs") * 0.78)
      .select(col("token"), lit(1).as("keep"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum("keep"), lit(0)).cast("long").as("n_kept"),
        array_join(transform(array_sort(collect_list(when(col("keep") === 1,
          struct(col("pos"), col("token"))))), x => x("token")), " ")
          .as("kept_text"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        round(col("n_kept") / col("n_tokens"), 6).as("retained_frac"),
        col("kept_text"))
      .orderBy("doc_id")
  }

  private val vocabPruneSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(string_split(text,' ')) AS token,
      |         generate_subscripts(string_split(text,' '), 1) AS pos
      |  FROM documents),
      |dft AS (SELECT token, count(*) AS df_t
      |        FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |vocab AS (SELECT token FROM dft, n
      |          WHERE df_t > n_docs * 0.06 AND df_t <= n_docs * 0.78),
      |tk AS (SELECT t.doc_id, t.token, t.pos,
      |         CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS keep
      |       FROM toks t LEFT JOIN vocab v USING (token))
      |SELECT doc_id, count(*) AS n_tokens,
      |       CAST(sum(keep) AS BIGINT) AS n_kept,
      |       round(sum(keep) * 1.0 / count(*), 6) AS retained_frac,
      |       coalesce(string_agg(token, ' ' ORDER BY pos)
      |                FILTER (WHERE keep = 1), '') AS kept_text
      |FROM tk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unigram language-model quality score (CCNet-style): per-doc mean
    * negative log-probability of its tokens under the corpus unigram
    * distribution — high cross-entropy flags unusual/noisy docs, low flags
    * boilerplate. avg(−ln(c/N)) is computed as ln(N) − avg(ln c) so the
    * corpus total N enters once, exactly.
    *
    * Scale plan: one explode pass → token-count agg (map-side partial
    * combine collapses the stream to |vocab| rows per partition) → the
    * token stream joins the count table ON TOKEN (both sides already
    * hash-partitioned by the agg's exchange) → per-doc agg. The count
    * table is NOT broadcast: at 100 TB vocabulary is web-scale (billions
    * of types) and must stay distributed; stopword-grade hot keys are
    * exactly the rows AQE's skew-join splitting handles (PlanSpec audits
    * that machinery). Display rounding 6 dp per the float policy (rule 6:
    * log values are irrational, never on a rounding boundary).
    */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    // NO fanOut here, measured (round 14): this corpus's vocabulary is
    // tiny, so the map-side partial aggs collapse the token stream to
    // |vocab| (resp. |docs|) rows before any exchange and the count
    // table broadcasts — the single-task fused pass is nearly
    // shuffle-free, and hash-spreading the scan first measured d23
    // 0.40→1.10 s (d70 3.92→5.21 downstream)
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "explode(split(text,' ')) AS tok")
    val cnt = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // N from the |vocab|-sized count table — NOT a second corpus scan
    val total = cnt.agg(sum("c").as("n_total"))
    toks.join(cnt, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(log(first("n_total")) - avg(log(col("c"))), 6).as("xent"))
      .orderBy("doc_id")
  }

  private val unigramLogprobSql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
      |tot AS (SELECT count(*) AS n_total FROM t)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(ln(max(n_total)) - avg(ln(c)), 6) AS xent
      |FROM t JOIN cnt USING (tok), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bloom-prefiltered incremental dedup — d17's operator re-planned for
    * the 100 TB corpus. d17's plain left-anti join reshuffles the ENTIRE
    * corpus for every incoming batch; here the corpus is scanned once
    * into a Bloom filter via Catalyst's own `bloom_filter_agg` (one
    * distributed aggregate, ~1 byte/element at 3% fpp —
    * [[graft.functions.GraftBloom]]), and only the incoming rows the
    * codegen'd `might_contain` probe flags as possible dups pay the
    * exact confirm join. Rows the filter rejects are DEFINITELY new
    * (Bloom has no false negatives), so the result is exactly d17's —
    * it shares d17's oracle SQL. In production the sketch is built once
    * and reused across batches; here it is rebuilt per run to stay
    * self-contained.
    */
  def bloomIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val (base, incoming) = baseIncoming(s, dir)
    // Sizing a Bloom filter needs |corpus|; production pipelines track it
    // as a table stat — recomputing it here is one columnar count scan.
    val n = math.max(base.count(), 1L)
    val bf = graft.functions.GraftBloom.buildBytes(base, col("text"), n)
    val might = graft.functions.GraftBloom.mightContain(bf, col("text"))
    val definitelyNew = incoming.filter(!might).select("doc_id")
    val candidates = incoming.filter(might)
      .join(base.select("text"), Seq("text"), "left_anti")
      .select("doc_id")
    definitelyNew.union(candidates).orderBy("doc_id")
  }

  /** GPT-style sequence packing: concatenate the corpus in doc_id order
    * and chunk the token stream into fixed 256-token training blocks —
    * each doc's global token offset decides which blocks it lands in.
    *
    * The global prefix sum is the scale problem here: a naive
    * `Window.orderBy(doc_id)` funnels 100 TB through ONE partition. This
    * plan is the distributed two-level formulation: (1) per-bucket token
    * totals (bucket = doc_id div 100 — deterministic key ranges, NOT
    * spark_partition_id, which would be layout-dependent and
    * oracle-unstable); (2) running offsets across the tiny bucket frame
    * (|docs|/100 rows — the only single-partition window, recursively
    * bucketable if even that overflows); (3) within-bucket exclusive
    * cumsum + broadcast-joined bucket offset = global position. The
    * oracle states the same thing as one flat window cumsum.
    */
  def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .selectExpr("doc_id", "size(split(text,' ')) AS n_tokens",
        "doc_id div 100 AS bucket")
    val bucketOffsets = t.groupBy("bucket")
      .agg(sum("n_tokens").as("btok"))
      .withColumn("boff", coalesce(
        sum("btok").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "boff")
    t.join(broadcast(bucketOffsets), "bucket")
      .withColumn("local", coalesce(
        sum("n_tokens").over(Window.partitionBy("bucket").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .selectExpr("doc_id", "n_tokens",
        "boff + local AS start_pos",
        "(boff + local) div 256 AS first_block",
        "(boff + local + n_tokens - 1) div 256 AS last_block")
      .withColumn("n_blocks", col("last_block") - col("first_block") + 1)
      .orderBy("doc_id")
  }

  private val sequencePackingSql =
    """WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |          AS start_pos
      |      FROM t)
      |SELECT doc_id, n_tokens, start_pos,
      |  start_pos // 256 AS first_block,
      |  (start_pos + n_tokens - 1) // 256 AS last_block,
      |  (start_pos + n_tokens - 1) // 256 - start_pos // 256 + 1 AS n_blocks
      |FROM c ORDER BY doc_id""".stripMargin

  /** Cross-split leakage audit: for each boundary of d14's deterministic
    * train/val/test split, how many later-split docs duplicate an
    * earlier-split doc — exactly (verbatim text) and as near-dup pairs
    * (d05's exact-jaccard ≥ 0.5 pair set crossing the boundary). The
    * numbers a training run must see BEFORE it starts: exact leakage
    * inflates eval metrics silently, near-dup leakage more subtly.
    *
    * Scale plan: exact counts come from ONE text-keyed aggregation
    * (per-text split tallies — corpus-sized input, near-zero output),
    * not a self-join; the near-dup side reuses the inverted-index pair
    * pipeline and joins the (tiny) pair frame to the split map twice.
    */
  def crossSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val splits = Tables.documents(s, dir)
      .selectExpr("doc_id", "text", docBucket)
      .selectExpr("doc_id", "text", splitCase)
    val exact = splits.groupBy("text").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .agg(
        sum(when(col("n_train") > 0, col("n_val")).otherwise(0L)).as("train_val"),
        sum(when(col("n_train") > 0, col("n_test")).otherwise(0L)).as("train_test"),
        sum(when(col("n_val") > 0, col("n_test")).otherwise(0L)).as("val_test"))
      .selectExpr("stack(3, 'train','val',train_val, 'train','test',train_test," +
        " 'val','test',val_test) AS (split_a, split_b, n_exact_docs)")
    val sm = splits.select("doc_id", "split")
    val nd = jaccardDupPairs(s, dir)
      .join(sm.withColumnsRenamed(Map("doc_id" -> "doc_id_1", "split" -> "split_1")), "doc_id_1")
      .join(sm.withColumnsRenamed(Map("doc_id" -> "doc_id_2", "split" -> "split_2")), "doc_id_2")
      .filter(col("split_1") =!= col("split_2"))
      .selectExpr(
        "CASE split_1 WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS r1",
        "CASE split_2 WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS r2")
      .selectExpr(
        "CASE least(r1, r2) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_a",
        "CASE greatest(r1, r2) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_b")
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_neardup_pairs"))
    exact.join(nd, Seq("split_a", "split_b"), "left")
      .na.fill(0L, Seq("n_neardup_pairs"))
      .orderBy("split_a", "split_b")
  }

  private val crossSplitLeakageSql =
    s"""WITH $shingleSqlCte,
       |sp AS (SELECT doc_id, text, $splitCase
       |       FROM (SELECT doc_id, text, $docBucketSql FROM documents)),
       |pt AS (SELECT text,
       |         sum(CASE WHEN split='train' THEN 1 ELSE 0 END) AS n_train,
       |         sum(CASE WHEN split='val' THEN 1 ELSE 0 END) AS n_val,
       |         sum(CASE WHEN split='test' THEN 1 ELSE 0 END) AS n_test
       |       FROM sp GROUP BY text),
       |ex AS (SELECT
       |         CAST(sum(CASE WHEN n_train > 0 THEN n_val ELSE 0 END) AS BIGINT) AS train_val,
       |         CAST(sum(CASE WHEN n_train > 0 THEN n_test ELSE 0 END) AS BIGINT) AS train_test,
       |         CAST(sum(CASE WHEN n_val > 0 THEN n_test ELSE 0 END) AS BIGINT) AS val_test
       |       FROM pt),
       |exl AS (SELECT 'train' AS split_a, 'val' AS split_b, train_val AS n_exact_docs FROM ex
       |        UNION ALL SELECT 'train', 'test', train_test FROM ex
       |        UNION ALL SELECT 'val', 'test', val_test FROM ex),
       |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       |       FROM s a JOIN s b ON a.doc_id < b.doc_id
       |       WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |prs AS (SELECT
       |          CASE s1.split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS r1,
       |          CASE s2.split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END AS r2
       |        FROM pr JOIN sp s1 ON pr.d1 = s1.doc_id
       |                JOIN sp s2 ON pr.d2 = s2.doc_id),
       |nd AS (SELECT
       |         CASE least(r1, r2) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_a,
       |         CASE greatest(r1, r2) WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_b,
       |         count(*) AS n_neardup_pairs
       |       FROM prs WHERE r1 <> r2 GROUP BY 1, 2)
       |SELECT e.split_a, e.split_b, e.n_exact_docs,
       |       coalesce(nd.n_neardup_pairs, 0) AS n_neardup_pairs
       |FROM exl e LEFT JOIN nd USING (split_a, split_b)
       |ORDER BY split_a, split_b""".stripMargin

  /** Per-source corpus report card: document counts, token volume, and
    * the language-mix entropy −Σ p·ln p — the one-line-per-source summary
    * a curation run reads first (a skewed source shows near-zero entropy;
    * a crawl shows high). Two cheap aggregations: (source, lang) counts,
    * then per-source combine; token totals ride the first pass. Entropy
    * terms are irrational → display rounding per policy rule 6.
    */
  def sourceReport(s: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.documents(s, dir)
      .selectExpr("source", "lang", "size(split(text,' ')) AS n_tokens")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("toks"))
    byLang
      .groupBy("source")
      .agg(sum("n").as("n_docs"),
        sum("toks").as("total_tokens"),
        count(lit(1)).as("n_langs"),
        // abs: a single-lang source's entropy is 0 up to −1e-17 float
        // residue, which would round to −0.0 and hash-differ from 0.0
        round(abs(-sum(col("n") * log(col("n"))).cast("double") / sum("n")
          + log(sum("n"))), 6).as("lang_entropy"))
      .orderBy("source")
  }

  // −Σ(n_i/N)ln(n_i/N) = ln N − (Σ n_i ln n_i)/N — the N enters once,
  // exactly, mirroring d23's cross-entropy restructuring.
  private val sourceReportSql =
    """WITH bl AS (SELECT source, lang, count(*) AS n,
      |              CAST(sum(len(string_split(text,' '))) AS BIGINT) AS toks
      |            FROM documents GROUP BY source, lang)
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS total_tokens,
      |  count(*) AS n_langs,
      |  round(abs(-CAST(sum(n * ln(n)) AS DOUBLE) / sum(n) + ln(sum(n))), 6) AS lang_entropy
      |FROM bl GROUP BY source ORDER BY source""".stripMargin

  /** Corpus length distribution in log₂ buckets — the first curation
    * plot of any dataset card: bucket k holds docs with 2^k ≤ tokens <
    * 2^(k+1), with each bucket's count and corpus share. Integer-only
    * bucketing (floor(log2 n) via bit length, not float log) so bucket
    * edges can never ulp-flip between engines.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("size(split(text,' ')) AS n")
      // floor(log2(n)) computed integrally: 63 - leading zeros, spelled
      // portably as length of the binary representation minus 1
      .selectExpr("length(bin(n)) - 1 AS bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      // total = Σ n_docs over the ≤64-row bucket frame — NOT a second
      // corpus scan (the oracle derives it from its bucket CTE likewise)
      .withColumn("total",
        sum("n_docs").over(Window.partitionBy(lit(1))))
      .selectExpr("CAST(bucket AS INT) AS bucket",
        "CAST(pow(2, bucket) AS BIGINT) AS min_tokens",
        "n_docs",
        // rule-6 rounding over an explicit DOUBLE division on BOTH sides:
        // DuckDB's bare `count(*) * 1.0 / total` is DECIMAL arithmetic,
        // which can diverge from Spark's double at unlucky bucket counts
        "round(n_docs * 1.0D / total, 6) AS share")
      .orderBy("bucket")
  }

  private val lengthHistogramSql =
    """WITH b AS (SELECT length(bin(len(string_split(text,' ')))) - 1 AS bucket
      |           FROM documents),
      |t AS (SELECT count(*) AS total FROM b)
      |SELECT CAST(bucket AS INT) AS bucket,
      |  CAST(pow(2, bucket) AS BIGINT) AS min_tokens,
      |  count(*) AS n_docs,
      |  round(CAST(count(*) AS DOUBLE) / max(total), 6) AS share
      |FROM b, t GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Applied near-dup removal — the step that turns detection into a
    * corpus: a doc survives unless it has a jaccard ≥ 0.5 partner with a
    * smaller doc_id (the standard keep-lowest-id rule applied to the
    * pair set — pairwise, not transitive: of a chain a~b~c with a≁c,
    * both a and c survive, matching per-pair MinHash dedup; d13 is the
    * transitive-cluster variant). One left-anti join of the corpus
    * against the (tiny) pair frame's higher-id side.
    */
  def applyNearDupRemoval(s: SparkSession, dir: String): DataFrame = {
    val losers = jaccardDupPairs(s, dir).select(col("doc_id_2").as("doc_id"))
    Tables.documents(s, dir).select("doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  private val applyNearDupRemovalSql =
    s"""WITH $shingleSqlCte
       |SELECT d.doc_id FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE b.doc_id = d.doc_id
       |    AND len(list_intersect(a.sh, b.sh)) * 1.0
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5)
       |ORDER BY d.doc_id""".stripMargin

  /** Boilerplate-prefix detection — docs sharing an identical leading
    * 8-token prefix (headers, templates, scraped nav bars — the near-dup
    * family exact dedup misses when only the tail differs). One
    * hash-groupBy on the prefix; at corpus scale the group key becomes
    * xxhash64(prefix) with an in-bucket confirm (d01's own scale note) —
    * here the prefix itself stays the key for oracle transparency.
    */
  def prefixDup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "array_join(slice(split(text, ' '), 1, 8), ' ') AS prefix")
      .groupBy("prefix")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("keep_id", "n_docs", "prefix")
      .orderBy("keep_id")

  private val prefixDupSql =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_docs, prefix
      |FROM (SELECT doc_id,
      |        array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix
      |      FROM documents)
      |GROUP BY prefix HAVING count(*) > 1 ORDER BY keep_id""".stripMargin

  /** Gopher-style rule filter — the standard pre-training quality gate as
    * an auditable per-doc verdict table: token-count bounds, mean-word-
    * length bounds, and a stopword-presence check, plus the conjunction.
    * Unlike d03's continuous score, each rule is a named boolean so a
    * curation run can report per-rule kill counts. Single scan, zero
    * shuffles (no aggregation — the verdict is row-local arithmetic).
    * mean_word_len = non-space chars / tokens, both exact ints in
    * doubles, one division → bit-identical across engines, emitted
    * unrounded (QueryDef rule 3).
    */
  def ruleFilter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "size(split(text, ' ')) AS n_tokens",
        "length(replace(text, ' ', '')) AS n_alpha",
        "split(text, ' ') AS toks")
      .selectExpr("doc_id", "n_tokens",
        "n_alpha * 1.0D / n_tokens AS mean_word_len",
        "n_tokens BETWEEN 50 AND 100000 AS r_len",
        "n_alpha * 1.0D / n_tokens BETWEEN 3.0D AND 10.0D AS r_word_len",
        "array_contains(toks, 'the') AND array_contains(toks, 'a') AS r_stop")
      .selectExpr("doc_id", "n_tokens", "mean_word_len",
        "r_len", "r_word_len", "r_stop",
        "r_len AND r_word_len AND r_stop AS pass")
      .orderBy("doc_id")

  private val ruleFilterSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    length(replace(text, ' ', '')) AS n_alpha,
      |    string_split(text, ' ') AS toks
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  CAST(n_alpha AS DOUBLE) / n_tokens AS mean_word_len,
      |  n_tokens BETWEEN 50 AND 100000 AS r_len,
      |  CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0 AS r_word_len,
      |  list_contains(toks, 'the') AND list_contains(toks, 'a') AS r_stop,
      |  (n_tokens BETWEEN 50 AND 100000)
      |    AND (CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
      |    AND list_contains(toks, 'the') AND list_contains(toks, 'a') AS pass
      |FROM m ORDER BY doc_id""".stripMargin

  /** Quality-weighted downsampling — the curation step after scoring:
    * keep each doc with probability proportional to its quality signal
    * (here d03's stopword density, affinely mapped into [0.1, 0.9]), but
    * SEEDED BY HASH, not rand(): u = md5-60(doc_id) mod 1e6 / 1e6, keep
    * iff u < p. Reproducible across runs/engines/partitionings — the
    * property rand()-based sampling loses the moment a task retries —
    * and a pure row-local expression: one scan, zero shuffles, composes
    * with d14's split (which uses an INDEPENDENT hash of the same id:
    * distinct md5 inputs — "doc_id" vs "s:doc_id" — decorrelate the
    * draws). All float ops (int/1e6, ×0.8/+0.1) are identical IEEE
    * expressions both engines — the comparison can't flip.
    */
  def qualityWeightedSample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "size(split(text,' ')) AS n_tokens",
        s"size(filter(split(text,' '), t -> array_contains($stopArr, t))) AS n_stop",
        s"pmod(${md5h60("concat('s:', CAST(doc_id AS STRING))")}, 1000000) / 1000000.0D AS u")
      .selectExpr("doc_id", "n_tokens",
        "n_stop * 1.0D / n_tokens * 0.8D + 0.1D AS p_keep", "u")
      .filter(col("u") < col("p_keep"))
      .orderBy("doc_id")
  }

  private val qualityWeightedSampleSql = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    len(string_split(text,' ')) AS n_tokens,
       |    len(list_filter(string_split(text,' '),
       |        t -> list_contains($stopList, t))) AS n_stop,
       |    CAST(${md5h60Sql("'s:' || CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE)
       |      / 1000000 AS u
       |  FROM documents)
       |SELECT doc_id, n_tokens,
       |  CAST(n_stop AS DOUBLE) / n_tokens * 0.8 + 0.1 AS p_keep, u
       |FROM m WHERE u < CAST(n_stop AS DOUBLE) / n_tokens * 0.8 + 0.1
       |ORDER BY doc_id""".stripMargin
  }

  /** Bigram-LM quality score — d23's CCNet-style cross-entropy upgraded
    * to conditional bigram probabilities: per doc, the mean
    * −ln p(w₂|w₁) with p(w₂|w₁) = c(w₁w₂) / c(w₁·), both counts from the
    * corpus itself (scoring the training corpus, every observed bigram
    * has c ≥ 1 — no smoothing needed; held-out scoring would add it).
    * Scale shape mirrors d23 exactly where it matters: the bigram vocab
    * is UNBOUNDED (quadratic in unigram vocab), so both count tables
    * join BY KEY, never broadcast; the first-token totals derive from
    * the |bigram-vocab|-sized count table, not a second corpus scan; and
    * after the count agg's exchange the probe side is co-partitioned on
    * the same key. avg(ln c) noise is ~1e-15 against 6-dp display
    * rounding (d23's accepted float posture; spec re-derives driver-side).
    */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val bigs = Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2))) AS b""".stripMargin)
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val cb = bigs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cf = cb.groupBy("w1").agg(sum("cb").as("cf"))
    bigs.join(cb, Seq("w1", "w2"))
      .join(cf, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("cf"))) - avg(log(col("cb"))), 6).as("xent"))
      .orderBy("doc_id")
  }

  private val bigramLogprobSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> {'w1': toks[i], 'w2': toks[i+1]})) AS e
      |      FROM t WHERE len(toks) >= 2),
      |bb AS (SELECT doc_id, e.w1 AS w1, e.w2 AS w2 FROM b),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bb GROUP BY w1, w2),
      |cf AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cf FROM cb GROUP BY w1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(avg(ln(cf)) - avg(ln(cb)), 6) AS xent
      |FROM bb JOIN cb USING (w1, w2) JOIN cf USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d34

  /** Duplicate-aware sampling: each near-dup CLUSTER contributes ~1
    * expected document — every doc's keep-probability is 1/|cluster|,
    * with unclustered docs forming singletons (p=1, always kept). This is
    * the sampling step that neutralizes duplication bias WITHOUT hard
    * deletion (soft dedup: a 40-copy boilerplate cluster still appears,
    * once in expectation, instead of 40×). Composes d13's connected
    * components with d32's reproducible draw: the Bernoulli uniform is an
    * independent md5-60 of the doc id ('cw:' domain-separated from d32's
    * 's:' stream), so the sample is identical across runs, partitionings,
    * and engines — unlike rand(). Cluster sizes are a cluster-count-sized
    * aggregate joined back on cluster_id; the draw is row-local.
    */
  def clusterWeightedSample(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val labeled = Tables.documents(s, dir).select("doc_id")
      .join(dupClusters(s, dir).withColumnRenamed("doc_id", "cdoc"),
        col("doc_id") === col("cdoc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .selectExpr("doc_id", "cluster_id", "cluster_size",
        s"pmod(${md5h60("concat('cw:', CAST(doc_id AS STRING))")}, 1000000) AS h")
      .filter(col("h") * col("cluster_size") < lit(1000000L))
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  // Oracle: d13's recursive-CTE components + the same md5-60 draw. The
  // keep test is the TRUE integer form h*size < 1_000_000 (the exact
  // integer scale-up of u < 1/size) on both engines — genuinely no
  // float op on the comparison path, so no reliance on matched float
  // op order. h < 1e6 and cluster_size ≤ corpus, so the long product
  // cannot overflow below ~9e12-doc clusters.
  private val clusterWeightedSampleSql =
    s"""WITH RECURSIVE $shingleSqlCte,
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(doc_id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id),
       |cc AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id),
       |labeled AS (
       |  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size
       |          FROM labeled GROUP BY cluster_id)
       |SELECT l.doc_id, l.cluster_id, s2.cluster_size
       |FROM labeled l JOIN sizes s2 ON l.cluster_id = s2.cluster_id
       |WHERE (${md5h60Sql("'cw:' || CAST(l.doc_id AS VARCHAR)")} % 1000000)
       |        * s2.cluster_size < 1000000
       |ORDER BY l.doc_id""".stripMargin

  // ---------------------------------------------------------------- d35

  /** Containment near-dup pairs — the ASYMMETRIC overlap measure
    * (|A∩B|/|A|, |A∩B|/|B|) that catches subset duplication Jaccard
    * misses: a short doc fully embedded in a long one has tiny Jaccard
    * (union is dominated by the long doc) but containment ≈ 1 on the
    * short side. Standard in quote/boilerplate detection. Same
    * posting-list plan as d05 — the inverted index is built once, pairs
    * carry both set sizes, and only the final predicate differs
    * (greatest of the two directed containments ≥ 0.8), so the 100 TB
    * posture is identical: two shuffles, no cross join.
    */
  def containmentDupPairs(s: SparkSession, dir: String): DataFrame = {
    val ex = shingleHashed(s, dir)
      .selectExpr("doc_id", "size(shs) AS n_sh", "explode(shs) AS h")
    val posts = ex.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .where(size(col("ds")) > 1)
    posts.selectExpr(pairExplode)
      .selectExpr("x.doc_id AS doc_id_1", "y.doc_id AS doc_id_2",
        "x.n_sh AS na", "y.n_sh AS nb")
      .groupBy("doc_id_1", "doc_id_2", "na", "nb")
      .agg(count(lit(1)).as("common"))
      .withColumn("cont_1in2", col("common") * lit(1.0) / col("na"))
      .withColumn("cont_2in1", col("common") * lit(1.0) / col("nb"))
      .filter(greatest(col("cont_1in2"), col("cont_2in1")) >= 0.8)
      .select("doc_id_1", "doc_id_2", "cont_1in2", "cont_2in1")
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val containmentDupPairsSql =
    s"""WITH $shingleSqlCte
       |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       | len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh) AS cont_1in2,
       | len(list_intersect(a.sh, b.sh)) * 1.0 / len(b.sh) AS cont_2in1
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE greatest(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh),
       |               len(list_intersect(a.sh, b.sh)) * 1.0 / len(b.sh)) >= 0.8
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d36

  /** Per-source vocabulary statistics — type-token ratio and hapax share,
    * the classic lexical-diversity signals (low TTR ⇒ repetitive/
    * boilerplate source; high hapax share ⇒ noisy/OCR-ish source; both
    * feed source-level quality gating next to d27's report card). Two
    * stacked aggregations: (source, token) counts ride ONE shuffle keyed
    * by the pair (map-side combine absorbs within-partition repeats —
    * hot tokens like 'the' collapse before the exchange), then the
    * source-level rollup reduces onto the tiny source keyspace. All
    * ratios are exact-integer divisions (QueryDef rule 3).
    */
  def hapaxStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("source", "explode(split(text, ' ')) AS t")
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .withColumn("ttr", col("vocab") * lit(1.0) / col("n_tokens"))
      .withColumn("hapax_share", col("hapax") * lit(1.0) / col("vocab"))
      .orderBy("source")

  private val hapaxStatsSql =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |c AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  count(*) * 1.0 / sum(c) AS ttr,
      |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*) AS hapax_share
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d37

  /** Best-of-cluster canonical selection — d13's clusters with the keeper
    * chosen by QUALITY instead of min-id: production dedup keeps the
    * best member of each near-dup cluster (highest stopword ratio here,
    * d03's strongest single signal on this corpus; boilerplate/salvage
    * variants score lower), with doc_id as the deterministic tie-break.
    * Composes three oracle-checked pieces: d13 components ⋈ d03's
    * row-local ratio → per-cluster argmax (window rank over the
    * cluster-sized frame — the groups are tiny by construction, so the
    * per-group sort q32 avoids is harmless here). Emits only multi-doc
    * clusters (singletons keep themselves trivially). The quality ratio
    * is an exact integer division — bit-identical cross-engine, so the
    * argmax never flips on ulps.
    */
  def bestOfCluster(s: SparkSession, dir: String): DataFrame = {
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    val q = Tables.documents(s, dir).selectExpr("doc_id",
      s"size(filter(split(text,' '), t -> array_contains($stopArr, t))) * 1.0D" +
        " / size(split(text,' ')) AS stop_ratio")
    val labeled = dupClusters(s, dir).join(q, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(desc("stop_ratio"), col("doc_id"))
    labeled
      .withColumn("rn", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")))
      .filter(col("rn") === 1 && col("cluster_size") > 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"),
        col("stop_ratio"), col("cluster_size"))
      .orderBy("cluster_id")
  }

  private val bestOfClusterSql = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH RECURSIVE $shingleSqlCte,
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
       |reach(doc_id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id),
       |cc AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id),
       |q AS (SELECT doc_id,
       |        len(list_filter(string_split(text,' '),
       |            t -> list_contains($stopList, t))) * 1.0
       |          / len(string_split(text,' ')) AS stop_ratio
       |      FROM documents),
       |ranked AS (
       |  SELECT cc.cluster_id, cc.doc_id, q.stop_ratio,
       |    row_number() OVER (PARTITION BY cc.cluster_id
       |      ORDER BY q.stop_ratio DESC, cc.doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cc.cluster_id) AS cluster_size
       |  FROM cc JOIN q ON cc.doc_id = q.doc_id)
       |SELECT cluster_id, doc_id AS keep_id, stop_ratio, cluster_size
       |FROM ranked WHERE rn = 1 AND cluster_size > 1
       |ORDER BY cluster_id""".stripMargin
  }

  // ---------------------------------------------------------------- d38

  /** Language-ID confusion matrix — the evaluation harness for d04's
    * in-engine classifier against the corpus's labeled `lang` column:
    * per (true, predicted) cell, count and row share. This is the
    * model-eval operator every heuristic classifier needs before it
    * gates data (a d04 run whose es→en confusion is 30% should not
    * route Spanish docs). One row-local prediction pass (d04's exact
    * CASE argmax), one hash agg over the ≤25-cell label keyspace, and a
    * per-true-label total joined back by broadcast; shares are
    * exact-integer divisions.
    */
  def langidConfusion(s: SparkSession, dir: String): DataFrame = {
    val hitCols = langWords.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("array(", ",", ")")
      s"size(filter(split(text,' '), t -> array_contains($arr, t))) AS ${l}_hits"
    }
    val pred =
      """CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
        |     WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
        |     WHEN de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
        |     WHEN fr_hits >= zh_hits THEN 'fr'
        |     ELSE 'zh' END AS pred_lang""".stripMargin
    val cells = Tables.documents(s, dir)
      .selectExpr(Seq("doc_id", "lang") ++ hitCols: _*)
      .selectExpr("lang", pred)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang").as("tl"))
      .agg(sum("n").as("row_total"))
    cells.join(broadcast(totals), col("lang") === col("tl"))
      .select(col("lang"), col("pred_lang"), col("n"),
        (col("n") * lit(1.0) / col("row_total")).as("row_share"),
        (col("lang") === col("pred_lang")).as("correct"))
      .orderBy("lang", "pred_lang")
  }

  private val langidConfusionSql = {
    val hitCols = langWords.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(string_split(text,' '), t -> list_contains($arr, t))) AS ${l}_hits"
    }.mkString(",\n        ")
    """WITH scored AS (
      |  SELECT lang,
      |   CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
      |        WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
      |        WHEN de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
      |        WHEN fr_hits >= zh_hits THEN 'fr'
      |        ELSE 'zh' END AS pred_lang
      |  FROM (SELECT doc_id, lang,
      |        """.stripMargin + hitCols +
      """
        |      FROM documents)),
        |cells AS (SELECT lang, pred_lang, count(*) AS n
        |          FROM scored GROUP BY lang, pred_lang),
        |tot AS (SELECT lang AS tl, CAST(sum(n) AS BIGINT) AS row_total
        |        FROM cells GROUP BY lang)
        |SELECT lang, pred_lang, n, n * 1.0 / row_total AS row_share,
        |  lang = pred_lang AS correct
        |FROM cells JOIN tot ON lang = tl
        |ORDER BY lang, pred_lang""".stripMargin
  }

  /** Quality-score calibration audit — the gate that tells an operator
    * whether d23's continuous LM score AGREES with d31's hard rule
    * verdict before either drives curation: docs decile'd by unigram
    * cross-entropy (fully tie-broken ntile), per decile the rule pass
    * rate. A well-calibrated corpus shows pass-rate falling as xent
    * rises; a flat profile means one signal is noise. Float shape:
    * xent values are 6-dp decimals → round(sum, 6) exact-restores the
    * decile sum and the mean is that / count (rules 1-2); pass rate is
    * integer / integer, one division. Decile assignment is
    * [[graft.operators.Ranking.exactNtile]] — exact two-level ranking
    * (xent value bins → ≤1024-row offset frame → in-bin window), so the
    * doc dimension never funnels through one partition even at corpus
    * scale; the exact NTILE semantics keep the oracle hash unchanged.
    */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val scores = unigramLogprob(s, dir).select("doc_id", "xent")
    val rules = ruleFilter(s, dir)
      .select(col("doc_id"), col("pass").cast("int").as("p"))
    // exactNtile scans its input three times (span, bin counts, rank);
    // the scored view is the expensive token-explode subtree, so persist
    // it — registry contract: no unpersist here, Verify/Bench clearCache()
    // between queries (q31's documented ownership model).
    val scored = scores.join(rules, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Ranking
      .exactNtile(scored, 10, col("xent"),
        ascending = true, ties = Seq(col("doc_id")), out = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        (round(sum("xent"), 6) / count(lit(1))).as("mean_xent"),
        (sum("p") * lit(1.0) / count(lit(1))).as("rule_pass_rate"))
      .orderBy("decile")
  }

  private val qualityCalibrationSql =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
      |tot AS (SELECT count(*) AS n_total FROM t),
      |sc AS (SELECT doc_id, round(ln(max(n_total)) - avg(ln(c)), 6) AS xent
      |       FROM t JOIN cnt USING (tok), tot GROUP BY doc_id),
      |m AS (SELECT doc_id,
      |        len(string_split(text, ' ')) AS n_tokens,
      |        length(replace(text, ' ', '')) AS n_alpha,
      |        string_split(text, ' ') AS toks
      |      FROM documents),
      |r AS (SELECT doc_id,
      |        CAST((n_tokens BETWEEN 50 AND 100000)
      |          AND (CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
      |          AND list_contains(toks, 'the') AND list_contains(toks, 'a') AS INT) AS p
      |      FROM m),
      |d AS (SELECT sc.doc_id, sc.xent, r.p,
      |        ntile(10) OVER (ORDER BY sc.xent, sc.doc_id) AS decile
      |      FROM sc JOIN r ON sc.doc_id = r.doc_id)
      |SELECT decile, count(*) AS n_docs,
      |  round(sum(xent), 6) / count(*) AS mean_xent,
      |  sum(p) * 1.0 / count(*) AS rule_pass_rate
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- d78

  /** Approx-tier APPLIED dedup — the chain a 100 TB pipeline actually
    * runs, end to end: d06's MinHash-banded pairs → connected components
    * → one CANONICAL keeper (min doc_id) per cluster → the full-corpus
    * verdict table (doc_id, cluster_id, n_members, is_keeper). This is
    * stricter than d29's greedy pair-loser drop: on a path cluster
    * {1–9, 5–9}, dropping every pair's larger end keeps {1, 5}, while
    * the component-canonical rule keeps only 1 — the one-doc-per-cluster
    * guarantee that makes dedup rates auditable (Σ kept = Σ clusters).
    * Singleton docs are their own cluster and keeper.
    *
    * Scale shape: pair generation is the banded LSH path (never
    * all-pairs), CC is d13's one-join-per-round min-label propagation,
    * and the apply is two hash joins on cluster_id. The DuckDB oracle is
    * the EXACT-pair recursive-CTE components — d06's own
    * algorithm-independent-witness discipline: on this corpus banded
    * recall is 1.0 (DedupSpec pins d06 ≡ d05 pair sets), so the oracle
    * hash proves the whole approx chain loses nothing vs exact.
    */
  def applyMinhashDedup(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(s, dir).select(
      col("doc_id_1").as("src"), col("doc_id_2").as("dst"))
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val labels = connectedComponents(edges)
    val lab = Tables.documents(s, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = lab.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), min("doc_id").as("keeper"))
    lab.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"),
        (col("doc_id") === col("keeper")).as("is_keeper"))
      .orderBy("doc_id")
  }

  private val applyMinhashDedupSql =
    s"""WITH RECURSIVE $ccReachCte,
       |cc AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach
       |       GROUP BY doc_id),
       |lab AS (SELECT d.doc_id,
       |          coalesce(cc.cluster_id, d.doc_id) AS cluster_id
       |        FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
       |sz AS (SELECT cluster_id, count(*) AS n_members,
       |         min(doc_id) AS keeper
       |       FROM lab GROUP BY cluster_id)
       |SELECT doc_id, cluster_id, n_members, doc_id = keeper AS is_keeper
       |FROM lab JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d81

  /** END-TO-END curation pipeline — the applied stages this surface
    * ships individually (d31 quality filter → d78 near-dup dedup → d53
    * decontamination → d49 cluster-safe split → d47 token-budget fill)
    * CHAINED into one corpus-in / corpus-out verdict table, pinning
    * stage COMPOSITION (order and data flow between stages) cross-
    * engine rather than each stage in isolation. One row per input
    * document:
    *   q_pass     — d31's hard rule verdict;
    *   keeper     — survived stage 1 AND is its near-dup cluster's
    *                canonical keeper (dedup runs AMONG stage-1
    *                survivors: banded pair generation is pair-local,
    *                so the survivor-filtered pair set IS the survivor
    *                corpus's pair set);
    *   clean      — keeper on the train side (bucket < 95) and not
    *                contaminated against the held-out eval slice
    *                (≥5 shared trigram shingles — d53's rule; eval
    *                docs are the benchmark and never enter the
    *                pipeline);
    *   split      — d49's leakage-free split of the clean docs, keyed
    *                on the dedup CLUSTER id (near-dups can never
    *                straddle the cut — here keepers are singletons per
    *                cluster by construction, so the key equals the
    *                keeper id, which is exactly the composition fact
    *                the chain pins);
    *   in_budget  — d47's per-source cumulative token fill (budget
    *                600, uniq_ratio DESC order) over the final TRAIN
    *                split only;
    *   final_kept — clean AND (train ⇒ in_budget): the corpus the run
    *                would actually train on, plus its held-out splits.
    *
    * Scale shape: every stage keeps its standalone plan's posture —
    * the rule filter is one scan, dedup is banded-LSH pairs + the
    * O(log²) CC rounds over survivor edges only, decontamination is
    * the broadcast eval-side shingle join, the split is a hash, and
    * the budget fill windows per source. No stage re-reads the corpus
    * for data another stage already carries.
    */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
    // stage 1 — d31 quality rule
    val quality = ruleFilter(s, dir).select(col("doc_id"), col("pass").as("q_pass"))
    val surv1 = quality.filter(col("q_pass")).select("doc_id")
    // stage 2 — d78 dedup among survivors
    val pairs = minhashLshPairs(s, dir)
      .join(surv1.withColumnRenamed("doc_id", "doc_id_1"), Seq("doc_id_1"), "left_semi")
      .join(surv1.withColumnRenamed("doc_id", "doc_id_2"), Seq("doc_id_2"), "left_semi")
      .select(col("doc_id_1").as("src"), col("doc_id_2").as("dst"))
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val lab = surv1.join(connectedComponents(edges), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val keepers = lab.groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "cluster_id")
    // stage 3 — d53 decontamination of the train side
    val flagged = contamination(s, dir)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = keepers
      .join(docs.selectExpr("doc_id", docBucket), Seq("doc_id"))
      .filter(col("bucket") < 95)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select("doc_id", "cluster_id")
    // stage 4 — d49 cluster-safe split of the clean docs
    val split = clean
      .selectExpr("doc_id",
        s"pmod(${md5h60("CAST(cluster_id AS STRING)")}, 100) AS bucket")
      .selectExpr("doc_id", splitCase)
    // stage 5 — d47 budget fill within the final train split
    val ranked = split.filter(col("split") === "train")
      .join(docs.selectExpr("doc_id", "source",
        "size(split(text,' ')) AS n_tokens",
        """size(array_distinct(split(text,' '))) * 1.0D
          |  / size(split(text,' ')) AS uniq_ratio""".stripMargin), Seq("doc_id"))
    val w = Window.partitionBy("source")
      .orderBy(col("uniq_ratio").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = ranked.withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), (col("cum") <= 600L).as("in_budget"))
    // verdict assembly — one row per INPUT document
    quality
      .join(keepers.select("doc_id").withColumn("k", lit(true)), Seq("doc_id"), "left")
      .join(clean.select("doc_id").withColumn("c", lit(true)), Seq("doc_id"), "left")
      .join(split, Seq("doc_id"), "left")
      .join(budget, Seq("doc_id"), "left")
      .selectExpr("doc_id", "q_pass",
        "coalesce(k, false) AS keeper",
        "coalesce(c, false) AS clean",
        "split",
        "coalesce(in_budget, false) AS in_budget",
        """coalesce(c, false) AND
          |  (split <> 'train' OR coalesce(in_budget, false)) AS final_kept""".stripMargin)
      .orderBy("doc_id")
  }

  private val curationPipelineSql =
    s"""WITH RECURSIVE $shingleSqlCte,
       |q AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    length(replace(text, ' ', '')) AS n_alpha,
       |    string_split(text, ' ') AS toks
       |  FROM documents),
       |qv AS (
       |  SELECT doc_id,
       |    (n_tokens BETWEEN 50 AND 100000)
       |    AND (CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
       |    AND (list_contains(toks, 'the') AND list_contains(toks, 'a'))
       |      AS q_pass
       |  FROM q),
       |s1 AS (SELECT doc_id FROM qv WHERE q_pass),
       |ss AS (SELECT s.doc_id, s.sh FROM s JOIN s1 USING (doc_id)),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM ss a JOIN ss b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
       |          UNION ALL SELECT d2, d1 FROM pairs),
       |reach(doc_id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id),
       |cc AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id),
       |lab AS (SELECT s1.doc_id, coalesce(cc.cluster_id, s1.doc_id) AS cluster_id
       |        FROM s1 LEFT JOIN cc USING (doc_id)),
       |keep AS (SELECT min(doc_id) AS doc_id, cluster_id
       |         FROM lab GROUP BY cluster_id),
       |bk AS (SELECT doc_id, $docBucketSql FROM documents),
       |cont AS (
       |  SELECT DISTINCT a.doc_id FROM s a JOIN bk ba USING (doc_id)
       |  JOIN s b ON TRUE JOIN bk bb ON b.doc_id = bb.doc_id
       |  WHERE ba.bucket < 95 AND bb.bucket >= 95
       |    AND len(list_intersect(a.sh, b.sh)) >= 5),
       |clean AS (
       |  SELECT keep.doc_id, keep.cluster_id
       |  FROM keep JOIN bk USING (doc_id)
       |  WHERE bk.bucket < 95
       |    AND keep.doc_id NOT IN (SELECT doc_id FROM cont)),
       |sp AS (
       |  SELECT doc_id, $splitCase FROM (
       |    SELECT doc_id,
       |      ${md5h60Sql("CAST(cluster_id AS VARCHAR)")} % 100 AS bucket
       |    FROM clean)),
       |rk AS (
       |  SELECT sp.doc_id, d.source,
       |    len(string_split(d.text,' ')) AS n_tokens,
       |    len(list_distinct(string_split(d.text,' '))) * 1.0 /
       |      len(string_split(d.text,' ')) AS uniq_ratio
       |  FROM sp JOIN documents d USING (doc_id) WHERE sp.split = 'train'),
       |bud AS (
       |  SELECT doc_id, cum <= 600 AS in_budget FROM (
       |    SELECT doc_id, sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY uniq_ratio DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM rk))
       |SELECT qv.doc_id, qv.q_pass,
       |  keep.doc_id IS NOT NULL AS keeper,
       |  clean.doc_id IS NOT NULL AS clean,
       |  sp.split,
       |  coalesce(bud.in_budget, false) AS in_budget,
       |  clean.doc_id IS NOT NULL AND
       |    (sp.split <> 'train' OR coalesce(bud.in_budget, false)) AS final_kept
       |FROM qv
       |LEFT JOIN keep ON qv.doc_id = keep.doc_id
       |LEFT JOIN clean ON qv.doc_id = clean.doc_id
       |LEFT JOIN sp ON qv.doc_id = sp.doc_id
       |LEFT JOIN bud ON qv.doc_id = bud.doc_id
       |ORDER BY qv.doc_id""".stripMargin

  // ---------------------------------------------------------------- d77

  /** CCNet-style perplexity bucketing APPLIED (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3): each document lands in the head / middle /
    * tail tercile of the corpus's bigram cross-entropy distribution
    * (d33's LM score — low xent = most in-domain), and the standard
    * curation decision keeps head+middle and drops tail. d42 AUDITS
    * whether the LM score agrees with the rule verdict; this is the
    * downstream ACTION — the bucket column CCNet ships with every
    * CommonCrawl snapshot and the `kept` flag a pipeline filters on.
    *
    * Scale shape: the per-doc score is d33's two count-table joins BY
    * KEY (unbounded-vocab discipline), and tercile assignment is
    * [[graft.operators.Ranking.exactNtile]] — the doc dimension never
    * funnels through a partition-less window, the same posture q35/d42
    * pinned. The scored frame persists (exactNtile's three passes;
    * runner-owns-cleanup contract). Floats: xent is d33's 6-dp value;
    * tercile boundaries come from exact ranking, not score arithmetic,
    * so the bucket column is integer-exact cross-engine.
    */
  def perplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val scored = bigramLogprob(s, dir).select("doc_id", "xent")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Ranking
      .exactNtile(scored, 3, col("xent"),
        ascending = true, ties = Seq(col("doc_id")), out = "t3")
      .select(col("doc_id"), col("xent"),
        when(col("t3") === 1, "head")
          .when(col("t3") === 2, "middle")
          .otherwise("tail").as("bucket"),
        (col("t3") =!= 3).as("kept"))
      .orderBy("doc_id")
  }

  private val perplexityBucketsSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> {'w1': toks[i], 'w2': toks[i+1]})) AS e
      |      FROM t WHERE len(toks) >= 2),
      |bb AS (SELECT doc_id, e.w1 AS w1, e.w2 AS w2 FROM b),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bb GROUP BY w1, w2),
      |cf AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cf FROM cb GROUP BY w1),
      |sc AS (SELECT doc_id, round(avg(ln(cf)) - avg(ln(cb)), 6) AS xent
      |       FROM bb JOIN cb USING (w1, w2) JOIN cf USING (w1)
      |       GROUP BY doc_id),
      |d AS (SELECT doc_id, xent,
      |        ntile(3) OVER (ORDER BY xent, doc_id) AS t3 FROM sc)
      |SELECT doc_id, xent,
      |  CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
      |    AS bucket,
      |  t3 <> 3 AS kept
      |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d70

  /** Isotonic (monotone) calibration of the rule-pass probability against
    * the LM quality score — the shape-constrained upgrade of d42's decile
    * audit: d42 REPORTS the per-decile pass rate; this fits the best
    * monotone (non-increasing in xent) rate curve by least squares — the
    * pool-adjacent-violators solution (Barlow et al. 1972), the standard
    * probability-calibration step (isotonic regression) before a quality
    * score is used as a sampling weight. Where the raw rates violate
    * monotonicity, adjacent deciles pool into blocks sharing their
    * weighted mean; the fitted curve is what a curation pipeline should
    * threshold on.
    *
    * PAV is sequential, but the repo never runs it over data-scaled rows:
    * docs reduce to B=10 decile bins first (the d42 frame, deciles via
    * [[graft.operators.Ranking.exactNtile]] so the doc dimension never
    * funnels), and over BOUNDED bins the fit has a closed join form —
    * the max-min identity  fit_i = min_{j≤i} max_{k≥i} mean(y_j..y_k)
    * (antitonic dual of Robertson-Wright-Dykstra Thm 1.4.4) — so the
    * whole solve is three self-joins of a 10-row frame: cumulative
    * (n, Σp) sums, interval means A(j,k) from cum differences, then
    * min-over-j of max-over-k. Float shape: every A(j,k) is ONE int/int
    * division and min/max only SELECT among those bit-identical values,
    * so the fit is emitted unrounded (QueryDef rules 3-4).
    */
  def isotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val scores = unigramLogprob(s, dir).select("doc_id", "xent")
    val rules = ruleFilter(s, dir)
      .select(col("doc_id"), col("pass").cast("int").as("p"))
    // persisted for exactNtile's three passes — d42's documented pattern
    // (registry contract: the runner owns cache cleanup)
    val scored = scores.join(rules, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bins = graft.operators.Ranking
      .exactNtile(scored, 10, col("xent"),
        ascending = true, ties = Seq(col("doc_id")), out = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("p").as("sp"),
        (round(sum("xent"), 6) / count(lit(1))).as("mean_xent"))
      // ≤10 rows BY CONSTRUCTION, referenced by six downstream frames
      // (byDec, cum, cum0, ivl, iso, the final join): materialize once,
      // GC-owned — without the cut each reference re-executes the whole
      // ntile-over-scored subtree (measured round 15: d70's plan carried
      // 154 Exchange nodes / 46 scans before, 4.46 s noop → see
      // OPTIMIZATION_r15.md)
      .localCheckpoint()
    // everything below operates on the bounded 10-row bin frame; renamed
    // projections (not plan aliases) keep the self-joins unambiguous, and
    // every non-equi join carries a broadcast hint — the frames are ≤11
    // rows BY CONSTRUCTION, so BroadcastNestedLoopJoin is the right plan
    // at any corpus size (a CartesianProduct of two shuffled sides never is)
    val byDec = bins.select(col("decile").cast("long").as("yd"),
      col("n_docs").as("yn"), col("sp").as("ysp"))
    val cum = bins.select(col("decile").cast("long").as("cd"))
      .join(broadcast(byDec), col("yd") <= col("cd"))
      .groupBy("cd")
      .agg(sum("yn").as("cumn"), sum("ysp").as("cumsp"))
    val cum0 = cum
      .unionByName(bins.sparkSession.range(1)
        .select(lit(0L).as("cd"), lit(0L).as("cumn"), lit(0L).as("cumsp")))
      .select(col("cd").as("ld"), col("cumn").as("lcumn"),
        col("cumsp").as("lcumsp"))
    val ivl = cum0.join(broadcast(cum), col("ld") < col("cd"))
      .select((col("ld") + 1).as("j"), col("cd").as("k"),
        ((col("cumsp") - col("lcumsp")) * lit(1.0) /
          (col("cumn") - col("lcumn"))).as("av"))
    val iso = bins.select(col("decile").cast("long").as("i"))
      .join(broadcast(ivl), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(max("av").as("mx"))
      .groupBy("i").agg(min("mx").as("iso_pass_rate"))
    bins.join(broadcast(iso), col("decile") === col("i"))
      .select(col("decile"), col("n_docs"), col("mean_xent"),
        (col("sp") * lit(1.0) / col("n_docs")).as("pass_rate"),
        col("iso_pass_rate"))
      .orderBy("decile")
  }

  private val isotonicCalibrationSql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
      |tot AS (SELECT count(*) AS n_total FROM t),
      |sc AS (SELECT doc_id, round(ln(max(n_total)) - avg(ln(c)), 6) AS xent
      |       FROM t JOIN cnt USING (tok), tot GROUP BY doc_id),
      |m AS (SELECT doc_id,
      |        len(string_split(text, ' ')) AS n_tokens,
      |        length(replace(text, ' ', '')) AS n_alpha,
      |        string_split(text, ' ') AS toks
      |      FROM documents),
      |r AS (SELECT doc_id,
      |        CAST((n_tokens BETWEEN 50 AND 100000)
      |          AND (CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
      |          AND list_contains(toks, 'the') AND list_contains(toks, 'a') AS INT) AS p
      |      FROM m),
      |d AS (SELECT sc.doc_id, sc.xent, r.p,
      |        ntile(10) OVER (ORDER BY sc.xent, sc.doc_id) AS decile
      |      FROM sc JOIN r ON sc.doc_id = r.doc_id),
      |bins AS (SELECT decile, count(*) AS n_docs, CAST(sum(p) AS BIGINT) AS sp,
      |           round(sum(xent), 6) / count(*) AS mean_xent
      |         FROM d GROUP BY decile),
      |cum AS (SELECT x.decile AS cd, CAST(sum(y.n_docs) AS BIGINT) AS cumn,
      |          CAST(sum(y.sp) AS BIGINT) AS cumsp
      |        FROM bins x JOIN bins y ON y.decile <= x.decile GROUP BY x.decile),
      |cum0 AS (SELECT CAST(0 AS BIGINT) AS cd, CAST(0 AS BIGINT) AS cumn,
      |           CAST(0 AS BIGINT) AS cumsp
      |         UNION ALL SELECT cd, cumn, cumsp FROM cum),
      |ivl AS (SELECT l.cd + 1 AS j, r.cd AS k,
      |          (r.cumsp - l.cumsp) * 1.0 / (r.cumn - l.cumn) AS av
      |        FROM cum0 l JOIN cum r ON l.cd < r.cd),
      |iso AS (SELECT i, min(mx) AS iso_pass_rate
      |        FROM (SELECT b.decile AS i, ivl.j, max(ivl.av) AS mx
      |              FROM bins b JOIN ivl ON ivl.j <= b.decile AND ivl.k >= b.decile
      |              GROUP BY b.decile, ivl.j)
      |        GROUP BY i)
      |SELECT decile, n_docs, mean_xent, sp * 1.0 / n_docs AS pass_rate,
      |  iso_pass_rate
      |FROM bins JOIN iso ON decile = i
      |ORDER BY decile""".stripMargin

  /** Corpus mixture reweighting — the sampling-weight table a pretraining
    * run derives before drawing its data mix: per source, the actual
    * share and the weight that would equalize shares (uniform target),
    * plus the downsample-only cap at 1. Every float is ONE division (or
    * comparison) of exact integers — bit-identical on any engine; one
    * map-side-combining count aggregation + a broadcast 1-row total, no
    * other shuffle. Non-uniform targets are a broadcast (source, share)
    * join away; the arithmetic discipline is what this pins.
    */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("n_total"),
      count(lit(1)).as("n_sources"))
    counts.crossJoin(broadcast(tot))
      .selectExpr("source", "n_docs",
        "n_docs * 1.0D / n_total AS share",
        "n_total * 1.0D / (n_sources * n_docs) AS weight",
        "least(CAST(1.0 AS DOUBLE), n_total * 1.0D / (n_sources * n_docs)) AS capped_weight")
      .orderBy("source")
  }

  private val mixtureWeightsSql =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |t AS (SELECT sum(n_docs) AS n_total, count(*) AS n_sources FROM c)
      |SELECT source, n_docs,
      |  n_docs * 1.0 / n_total AS share,
      |  n_total * 1.0 / (n_sources * n_docs) AS weight,
      |  least(CAST(1.0 AS DOUBLE), n_total * 1.0 / (n_sources * n_docs)) AS capped_weight
      |FROM c, t ORDER BY source""".stripMargin

  /** Count-Min sketch depth (independent hash rows) and width (buckets
    * per row) for [[cmsTokenFrequency]]. 4×256 longs of state TOTAL,
    * independent of vocabulary size.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-Min sketch frequency estimation — the sketch class the
    * existing trio doesn't cover: KMV (t22) answers DISTINCT, Misra-
    * Gries (d11) answers TOP-K, a CM sketch answers "how often is key
    * X?" for ANY key with d×w bounded state and an overestimate-only
    * error (hash collisions can only ADD counts — never undercount).
    * Relational formulation: the token stream fans out to d (row,
    * bucket) cells via the portable md5-60 hash (domain-separated per
    * row), one map-side-combining aggregation builds the ≤ d×w-cell
    * sketch — the shuffle carries the CELL keyspace, not the vocab —
    * and a point query reads min over the key's d cells. Sketches are
    * mergeable cell-wise (DedupSpec pins split-corpus additivity), so
    * partitions/streams combine by addition like every sketch here.
    * Emitted audit: the top-10 exact tokens' estimates with their
    * overestimate — all exact integers, deterministic on both engines.
    */
  def cmsTokenFrequency(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val toks = Tables.documents(s, dir).selectExpr("explode(split(text,' ')) AS tok")
    val sketch = toks
      .selectExpr(s"explode(sequence(0, ${CmsDepth - 1})) AS r", "tok")
      .selectExpr("r", s"pmod(${md5h60(s"concat('cms', r, ':', tok)")}, $CmsWidth) AS b")
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .orderBy(desc("exact_n"), col("tok")).limit(10)
    exact
      .selectExpr("tok", "exact_n", s"explode(sequence(0, ${CmsDepth - 1})) AS r")
      .selectExpr("tok", "exact_n", "r",
        s"pmod(${md5h60(s"concat('cms', r, ':', tok)")}, $CmsWidth) AS b")
      .join(sketch, Seq("r", "b"))
      .groupBy("tok", "exact_n").agg(min("c").as("est_n"))
      .selectExpr("tok", "exact_n", "est_n", "est_n - exact_n AS overestimate")
      .orderBy(desc("exact_n"), col("tok"))
  }

  private val cmsTokenFrequencySql = {
    val h = (arg: String) => s"${md5h60Sql(arg)} % $CmsWidth"
    s"""WITH t AS (SELECT unnest(string_split(text,' ')) AS tok FROM documents),
      |rs AS (SELECT unnest(range(0, $CmsDepth)) AS r),
      |sk AS (SELECT r, ${h("'cms' || r || ':' || tok")} AS b, count(*) AS c
      |       FROM t, rs GROUP BY 1, 2),
      |ex AS (SELECT tok, count(*) AS exact_n FROM t GROUP BY tok
      |       ORDER BY exact_n DESC, tok LIMIT 10),
      |q AS (SELECT ex.tok, ex.exact_n, rs.r,
      |        ${h("'cms' || rs.r || ':' || ex.tok")} AS b
      |      FROM ex, rs)
      |SELECT q.tok, q.exact_n, min(sk.c) AS est_n,
      |  min(sk.c) - q.exact_n AS overestimate
      |FROM q JOIN sk ON q.r = sk.r AND q.b = sk.b
      |GROUP BY q.tok, q.exact_n
      |ORDER BY exact_n DESC, tok""".stripMargin
  }

  /** Per-doc n-gram novelty — the curation dual of d18's contamination:
    * the share of a doc's distinct 8-grams whose FIRST corpus occurrence
    * (min doc_id) is the doc itself. Low novelty = the doc restates
    * earlier material even when no single pair crosses a dup threshold —
    * the "effectively duplicate tail" a mixture curator downweights
    * (d43's weights consume exactly this kind of signal). Plan: the
    * [[gram8]] subtree (built ONCE, persisted) feeds a (gram-hash → min
    * doc_id) agg with map-side combine — the posting-list discipline,
    * never a self-join — then one rejoin on the 8-byte hash key and a
    * per-doc regroup; the h2 collision confirm routes (never-observed)
    * hash collisions through the exact raw-gram path. novelty = two
    * exact integers, ONE closing division. Docs under 8 tokens have no
    * 8-grams and are excluded (novelty undefined), like d20.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val grams = gram8(s, dir)
    val (clean, exact) = gramFirstDoc(grams)
    val attributed = grams.join(clean, "h").select("doc_id", "first_doc")
      .union(grams.join(exact, Seq("h", "g")).select("doc_id", "first_doc"))
    attributed
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .selectExpr("doc_id", "n_grams", "n_novel",
        "n_novel * 1.0D / n_grams AS novelty")
      .orderBy("doc_id")
  }

  private val ngramNoveltySql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |        range(1, len(toks)-6),
      |        i -> array_to_string(toks[i:i+7], ' ')))) AS g
      |      FROM t WHERE len(toks) >= 8),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1.0 / count(*) AS novelty
      |FROM g JOIN f USING (g)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d46

  /** Maximal duplicated-substring spans — ExactSubstr-style dedup (Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499): every 8-token window that also occurs
    * in ANOTHER document marks its token range duplicated, and
    * overlapping/adjacent duplicated windows merge into MAXIMAL spans —
    * the unit a substring-dedup pass cuts from the corpus. This is the
    * paper's suffix-array formulation collapsed to fixed-width windows,
    * which is the join-friendly distributed form: a suffix array is a
    * global sequential structure, positional n-gram postings shuffle on
    * a hash key.
    *
    * Plan shape: the duplicated-gram DECISION runs over [[gram8]] (the
    * distinct per-doc frame d20/d45 share, so in pipeline mode the
    * posting input is already built), keyed by the 8-byte gram hash
    * with d20's h2 collision detector (clean buckets answer from the
    * hash; a colliding bucket — never observed — regroups by raw
    * gram); a separate POSITIONAL 8-gram explode (positions matter,
    * persisted across its two join consumers) attributes the
    * duplicated windows, then a
    * per-doc gaps-and-islands merge: fixed-width windows sorted by
    * position make the running-max-end reduce to lag(pos) + 7, so a
    * span breaks exactly when the gap to the previous window start
    * exceeds the gram width. Every window is doc-partitioned — the
    * merge is partition-local at any corpus size, and the posting
    * shuffle carries 8-byte hashes, never gram strings.
    */
  def dupSubstringSpans(s: SparkSession, dir: String): DataFrame = {
    // dup decision runs over the DISTINCT per-doc gram frame ([[gram8]] —
    // shared with d20/d45 in pipeline mode, persisted either way):
    // "appears in ≥2 docs" needs no positions, so the posting agg
    // shuffles the smaller distinct frame and the positional explode
    // below stays a pure scan-side producer
    val grams = gram8(s, dir)
    val aggH = grams.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"),
        min("h2").as("h2lo"), max("h2").as("h2hi"))
    val dupClean = aggH
      .filter(col("h2lo") === col("h2hi") && col("nd") >= 2).select("h")
    // collision fallback: regroup ONLY colliding buckets by the raw gram
    val bad = aggH.filter(col("h2lo") =!= col("h2hi")).select("h")
    val dupExact = grams.join(bad, "h")
      .groupBy("g").agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val pos = gramPos8(s, dir)
    val dupPos = pos.join(dupClean, "h").select("doc_id", "pos")
      .union(pos.join(dupExact, "g").select("doc_id", "pos"))
    mergeWindowIslands(dupPos)
      .selectExpr("doc_id", "span_id", "span_start", "span_end",
        "span_end - span_start + 1 AS span_tokens")
      .orderBy("doc_id", "span_start")
  }

  private val dupSubstringSpansSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |p AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)-6),
      |          i -> {'pos': i, 'g': array_to_string(toks[i:(i+7)], ' ')}),
      |          recursive := true)
      |      FROM t WHERE len(toks) >= 8),
      |d AS (SELECT g FROM p GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |dp AS (SELECT doc_id, pos FROM p JOIN d USING (g)),
      |isl AS (SELECT doc_id, pos,
      |          CASE WHEN lag(pos) OVER w IS NULL
      |                 OR pos > lag(pos) OVER w + 7 THEN 1 ELSE 0 END AS brk
      |        FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sp AS (SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS UNBOUNDED PRECEDING) AS span_id
      |       FROM isl)
      |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
      |  min(pos) AS span_start, max(pos) + 7 AS span_end,
      |  max(pos) + 7 - min(pos) + 1 AS span_tokens
      |FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_start""".stripMargin

  /** Positional (non-distinct) 8-grams — (doc_id, pos, g, h): the
    * attribution side of the substring family (d46 detection, d48
    * rewrite). Registry-aware; self-contained runs persist across the
    * consumers' joins under the runner-owned cleanup contract. Hash via
    * [[gramHashExpr]] so keys stay consistent with gram8-derived tables
    * under the collision test hook.
    */
  private[graft] def gramPos8(s: SparkSession, dir: String): DataFrame = {
    val pre = shared.get(s"gramPos8:$dir")
    if (pre != null) return pre
    // fanOut before the positional 8-gram explode (gram8's rationale)
    Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 8")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks)-7),
          |  i -> struct(i AS pos, concat_ws(' ', slice(toks, i, 8)) AS g)))
          |  AS w""".stripMargin)
      .selectExpr("doc_id", "CAST(w.pos AS BIGINT) AS pos", "w.g AS g",
        s"${gramHashExpr("w.g")} AS h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** First-occurrence tables over [[gram8]] under the h2 collision
    * discipline: `clean` answers collision-free buckets (h → first_doc),
    * `exact` regroups the (never-observed) colliding buckets by raw gram
    * ((h, g) → first_doc). Attribution for any frame carrying (h, g) is
    * `frame ⋈ clean on h  ∪  frame ⋈ exact on (h, g)` — the two sides
    * are disjoint by construction. Shared by d45 (novelty) and d48
    * (applied removal).
    */
  private def gramFirstDoc(grams: DataFrame): (DataFrame, DataFrame) = {
    val aggH = grams.groupBy("h")
      .agg(min("doc_id").as("first_doc"),
        min("h2").as("h2lo"), max("h2").as("h2hi"))
    val clean = aggH.filter(col("h2lo") === col("h2hi"))
      .select("h", "first_doc")
    val bad = aggH.filter(col("h2lo") =!= col("h2hi")).select("h")
    val exact = grams.join(bad, "h")
      .groupBy("h", "g").agg(min("doc_id").as("first_doc"))
    (clean, exact)
  }

  /** Gaps-and-islands merge of fixed-width (8-token) window STARTS into
    * maximal spans, per doc: sorted by position, the running max end of
    * width-8 intervals reduces to lag(pos) + 7, so a span breaks exactly
    * when the gap to the previous start exceeds the window width. Every
    * window is doc-partitioned — the merge is partition-local at any
    * corpus size. Returns (doc_id, span_id, span_start, span_end);
    * spans are DISJOINT (a break means next start > previous end), the
    * property d48's at-most-one-match token join depends on. Shared by
    * d46 and d48.
    */
  private def mergeWindowIslands(winStarts: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    winStarts
      .withColumn("brk",
        when(lag("pos", 1).over(w).isNull ||
          col("pos") > lag("pos", 1).over(w) + 7, 1L).otherwise(0L))
      .withColumn("span_id", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("span_start"), (max("pos") + 7).as("span_end"))
  }

  // ---------------------------------------------------------------- d48

  /** APPLIED substring dedup — d46's detection turned into the text
    * rewrite ExactSubstr prescribes (arXiv:2107.06499 removes one
    * occurrence and keeps the other): a token is cut when it lies in an
    * 8-gram window whose corpus-FIRST occurrence (min doc_id, d45's
    * first-doc discipline) is an EARLIER doc — so the first holder
    * keeps its text verbatim, later docs lose exactly the restated
    * spans, and within-doc repetition (first_doc == this doc) is
    * untouched. The d29 "detection → applied removal" pattern at
    * substring granularity.
    *
    * Plan shape: gram-hash posting agg for first-docs over [[gram8]]
    * (h2 collision confirm as everywhere), positional windows join the
    * first-doc table, NOT-owned window starts merge into DISJOINT
    * spans (d46's doc-partitioned islands — disjointness is what makes
    * the token join below at-most-one-match), then tokens left-join
    * the spans per doc on an index-range predicate: per-doc cost is
    * O(tokens × spans-per-doc), both bounded by the doc length — a
    * document is a bounded unit at any corpus size, and every window/
    * join key is doc-partitioned. kept_text reassembles with an
    * index-sorted collect, so the rewrite is deterministic.
    */
  def applySubstringRemoval(s: SparkSession, dir: String): DataFrame = {
    val (clean, exact) = gramFirstDoc(gram8(s, dir))
    val pos = gramPos8(s, dir)
    val attributed = pos.join(clean, "h").select("doc_id", "pos", "first_doc")
      .union(pos.join(exact.select("h", "g", "first_doc"), Seq("h", "g"))
        .select("doc_id", "pos", "first_doc"))
    val removedWin = attributed.filter(col("first_doc") < col("doc_id"))
      .select("doc_id", "pos")
    val spans = mergeWindowIslands(removedWin)
      .select(col("doc_id").as("sdoc"), col("span_start").as("sstart"),
        col("span_end").as("send"))
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "posexplode(split(text,' ')) AS (i, tok)")
      .selectExpr("doc_id", "CAST(i + 1 AS BIGINT) AS idx", "tok")
    toks.join(spans,
        toks("doc_id") === spans("sdoc") &&
          col("idx") >= col("sstart") && col("idx") <= col("send"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("sdoc").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ", expr(
          """transform(
            |  sort_array(collect_list(CASE WHEN sdoc IS NULL
            |    THEN struct(idx, tok) END)),
            |  p -> p.tok)""".stripMargin)).as("kept_text"))
      .orderBy("doc_id")
  }

  private val applySubstringRemovalSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |p AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)-6),
      |          i -> {'pos': i, 'g': array_to_string(toks[i:(i+7)], ' ')}),
      |          recursive := true)
      |      FROM t WHERE len(toks) >= 8),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM p GROUP BY g),
      |rw AS (SELECT doc_id, pos FROM p JOIN f USING (g)
      |       WHERE f.first_doc < p.doc_id),
      |isl AS (SELECT doc_id, pos,
      |          CASE WHEN lag(pos) OVER w IS NULL
      |                 OR pos > lag(pos) OVER w + 7 THEN 1 ELSE 0 END AS brk
      |        FROM rw WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sp AS (SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS UNBOUNDED PRECEDING) AS span_id
      |       FROM isl),
      |spans AS (SELECT doc_id AS sdoc, span_id,
      |            min(pos) AS sstart, max(pos) + 7 AS send
      |          FROM sp GROUP BY doc_id, span_id),
      |tok AS (SELECT doc_id,
      |          unnest(list_transform(range(1, len(toks)+1),
      |            i -> {'idx': i, 'tok': toks[i]}), recursive := true)
      |        FROM t)
      |SELECT tok.doc_id, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN spans.sdoc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  coalesce(string_agg(CASE WHEN spans.sdoc IS NULL THEN tok.tok END, ' '
      |    ORDER BY tok.idx), '') AS kept_text
      |FROM tok LEFT JOIN spans
      |  ON tok.doc_id = spans.sdoc
      | AND tok.idx >= spans.sstart AND tok.idx <= spans.send
      |GROUP BY tok.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d47

  /** Token-budget mixture fill — the curation step that turns quality
    * ranking into an actual dataset: within each source, docs rank by
    * lexical diversity (d03's uniq_ratio; ties on doc_id) and are
    * greedily kept while the source's cumulative token count stays
    * within a per-source budget (600 tokens ≈ half of each source's
    * mass on this corpus). The report is the per-source fill — docs
    * kept, tokens kept, budget utilisation — d43's mixture WEIGHTS
    * made concrete as an exact doc selection under a token cap.
    *
    * Determinism: uniq_ratio is an exact small-integer ratio in double
    * (bit-equal across engines), ties settle on doc_id, and the kept
    * set is a prefix of that total order, so both engines select
    * identical docs. All windows are SOURCE-partitioned — a source's
    * ranking never leaves its partition, so the plan holds at any
    * source count; a single pathological source is bounded by that
    * source's own size, not the corpus.
    */
  def tokenBudgetFill(s: SparkSession, dir: String): DataFrame = {
    val budget = 600L
    val ranked = Tables.documents(s, dir)
      .selectExpr("doc_id", "source",
        "size(split(text,' ')) AS n_tokens",
        """size(array_distinct(split(text,' '))) * 1.0D
          |  / size(split(text,' ')) AS uniq_ratio""".stripMargin)
    val w = Window.partitionBy("source")
      .orderBy(col("uniq_ratio").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("cum", sum("n_tokens").over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cum") <= budget, col("n_tokens").cast("long"))
          .otherwise(0L)).as("tokens_kept"))
      .selectExpr("source", "n_docs", "n_kept", "tokens_kept",
        s"round(tokens_kept * 1.0D / $budget, 6) AS budget_frac")
      .orderBy("source")
  }

  private val tokenBudgetFillSql =
    """WITH r AS (SELECT doc_id, source,
      |             len(string_split(text,' ')) AS n_tokens,
      |             len(list_distinct(string_split(text,' '))) * 1.0 /
      |               len(string_split(text,' ')) AS uniq_ratio
      |           FROM documents),
      |c AS (SELECT source, n_tokens,
      |        sum(n_tokens) OVER (PARTITION BY source
      |          ORDER BY uniq_ratio DESC, doc_id
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM r)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN cum <= 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN cum <= 600 THEN n_tokens ELSE 0 END) AS BIGINT)
      |    AS tokens_kept,
      |  round(sum(CASE WHEN cum <= 600 THEN n_tokens ELSE 0 END) * 1.0 / 600, 6)
      |    AS budget_frac
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d49

  /** Cluster-safe train/val/test split — d14's reproducible hash split
    * made LEAKAGE-FREE. d14 hashes the DOC id, so two near-identical
    * docs routinely land on opposite sides of the train/test cut (the
    * contamination d26 then has to measure). Here the split key is the
    * near-dup CLUSTER root instead: d13's connected-component label
    * (the min doc id reachable through ≥0.5-jaccard edges), a doc's own
    * id when unclustered. Every member of a cluster hashes identically,
    * so a near-dup pair can never straddle splits BY CONSTRUCTION —
    * eval leakage through duplication is structurally zero, rather than
    * something audited after the fact.
    *
    * Scale: labels come from d13's iterative hash-min label propagation
    * (one shuffle join + partial agg per round, diameter-bounded; the
    * pipeline-shared frame when enabled), and the only other exchange
    * is the doc_id-keyed left join of the corpus against the label table
    * — no window, no broadcast of anything data-scaled. The md5-60
    * bucket is the same engine-portable hash d14/d16/d17 use, so the
    * 80/10/10 cut points are the single [[TrainCut]]/[[ValCut]] source
    * of truth.
    */
  def clusterSafeSplit(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val labels = dupClusters(s, dir)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS root_id")
      .selectExpr("doc_id", "root_id",
        s"pmod(${md5h60("CAST(root_id AS STRING)")}, 100) AS bucket")
      .selectExpr("doc_id", "root_id", "bucket", splitCase)
      .orderBy("doc_id")
  }

  private val clusterSafeSplitSql =
    s"""WITH RECURSIVE $ccReachCte,
       |lbls AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id),
       |r AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS root_id
       |      FROM documents d LEFT JOIN lbls l USING (doc_id)),
       |b AS (SELECT doc_id, root_id,
       |        ${md5h60Sql("CAST(root_id AS VARCHAR)")} % 100 AS bucket FROM r)
       |SELECT doc_id, root_id, bucket, $splitCase
       |FROM b ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d50

  /** BPE merge training, distributed: learn the first k=3 merge rules of
    * a byte-pair-encoding tokenizer from the corpus — the tokenizer-
    * TRAINING step of an LLM data pipeline (d10 merely counts with a
    * fixed pretokenizer; this derives the vocabulary itself).
    *
    * Classic Sennrich BPE, in its scale-correct formulation: the trainer
    * never iterates the corpus — it iterates the WORD-FREQUENCY table
    * (one explode + count agg off the corpus, map-side combinable;
    * corpus size only affects that first pass). Each round is then
    *   1. adjacent-symbol pair counts weighted by word frequency (one
    *      explode + sum agg over the vocab table);
    *   2. a global argmax with a total tie order (count DESC, then
    *      lexicographic pair) — TakeOrdered(1), a scalar to the driver,
    *      the same per-round scalar-decision pattern as d13's
    *      convergence count;
    *   3. the merge applied to every word's symbol array via a greedy
    *      left-to-right `aggregate` fold (a merged symbol never
    *      re-pairs as the LEFT side within the same pass — concat
    *      strictly lengthens, so `last == lhs` cannot match it; this is
    *      exactly the textbook scan order).
    * Rounds localCheckpoint like d13 so k rounds don't stack lineage.
    *
    * Output: the merge table (round, lhs, rhs, merged, pair_count) — k
    * scalar rows assembled on the driver, the distributed computation's
    * whole result. The oracle replays the identical rounds: the fold is
    * a per-word recursive CTE with the same two-symbol skip, and the
    * tie order is identical, so the merge tables match exactly. (Early
    * exhaustion — a vocab with no adjacent pairs left — cannot occur at
    * k=3 on any corpus with a ≥4-char word; the loop still guards it.)
    */
  /** Shared trainer core for d50/d56: the learned merge table AND the
    * final (w, cnt, syms) vocab after all k merges are applied.
    * Registry-aware at k=3 (the registered configuration): pipeline
    * mode trains once for both consumers. */
  private def bpeTrain(s: SparkSession, dir: String, k: Int = 3)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    if (k == 3) {
      val pre = sharedBpe.get(dir)
      if (pre != null) return pre
    }
    bpeTrainImpl(s, dir, k)
  }

  private def bpeTrainImpl(s: SparkSession, dir: String, k: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var vocab = Tables.documents(s, dir)
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("w <> ''")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .selectExpr("w", "cnt", "split(w, '') AS syms")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = vocab.where("size(syms) >= 2")
        .selectExpr("cnt",
          """explode(transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))) AS p""".stripMargin)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("w"))
        .orderBy(col("w").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, w) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, a + b, w))
        def q(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
        vocab = vocab.selectExpr("w", "cnt",
          s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
             |  (acc, x) -> IF(size(acc) > 0 AND element_at(acc, -1) = '${q(a)}'
             |                 AND x = '${q(b)}',
             |    concat(slice(acc, 1, size(acc) - 1), array('${q(a + b)}')),
             |    concat(acc, array(x)))) AS syms""".stripMargin)
          .localCheckpoint()
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }

  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeTrain(s, dir)._1.toDF("round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("round")
  }

  // One CTE block per round: pair counts over s{r-1} → argmax m{r} →
  // per-word greedy fold f{r} (recursive, two-symbol skip on a hit) →
  // next vocab s{r}. Identical tie order to the Spark side. The chain
  // (v, s0, rounds 1-3) is shared by d50 (emits the merge table) and
  // d56 (consumes s3, the post-merge symbolization, keyed by word).
  private val bpeRoundsCte = {
    def round(r: Int): String = {
      val prev = s"s${r - 1}"
      s"""p$r AS (
         |  SELECT e.a AS a, e.b AS b, sum(cnt) AS w FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
         |      i -> {'a': syms[i], 'b': syms[i + 1]})) AS e
         |    FROM $prev WHERE len(syms) >= 2)
         |  GROUP BY e.a, e.b),
         |m$r AS (SELECT a, b, a || b AS ab, CAST(w AS BIGINT) AS w
         |        FROM p$r ORDER BY w DESC, a, b LIMIT 1),
         |f$r(w, syms, cnt, i, acc) AS (
         |  SELECT w, syms, cnt, 1, CAST([] AS VARCHAR[]) FROM $prev
         |  UNION ALL
         |  SELECT f.w, f.syms, f.cnt,
         |    f.i + CASE WHEN f.i < len(f.syms) AND f.syms[f.i] = m.a
         |                AND f.syms[f.i + 1] = m.b THEN 2 ELSE 1 END,
         |    list_append(f.acc,
         |      CASE WHEN f.i < len(f.syms) AND f.syms[f.i] = m.a
         |            AND f.syms[f.i + 1] = m.b THEN m.ab ELSE f.syms[f.i] END)
         |  FROM f$r f LEFT JOIN m$r m ON true WHERE f.i <= len(f.syms)),
         |s$r AS (SELECT w, cnt, acc AS syms FROM f$r WHERE i > len(syms))""".stripMargin
    }
    s"""v AS (SELECT w, count(*) AS cnt
       |      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |      WHERE w <> '' GROUP BY w),
       |s0 AS (SELECT w, cnt, string_split(w, '') AS syms FROM v),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  private val bpeMergesSql =
    s"""WITH RECURSIVE
       |$bpeRoundsCte
       |SELECT CAST(1 AS BIGINT) AS round, a AS lhs, b AS rhs, ab AS merged,
       |       w AS pair_count FROM m1
       |UNION ALL SELECT CAST(2 AS BIGINT), a, b, ab, w FROM m2
       |UNION ALL SELECT CAST(3 AS BIGINT), a, b, ab, w FROM m3
       |ORDER BY round""".stripMargin

  // ---------------------------------------------------------------- d51

  /** PageRank over the near-dup graph — centrality as an alternative
    * canonical-doc signal (d37 picks the best cluster member by QUALITY;
    * within-cluster centrality picks the member most near-dup-connected,
    * the "template" the others vary from). Three damped power-iteration
    * rounds over d05's symmetric pair graph, the Pregel shape on plain
    * DataFrames: each round is ONE join (edges ⋈ current ranks on src)
    * plus ONE dst-keyed sum agg — contributions shuffle on the edge key,
    * nothing data-scaled ever broadcasts, and rounds localCheckpoint so
    * the iteration never stacks lineage (d13's discipline). Every node
    * of the symmetric graph has degree ≥ 1, so the contribution join is
    * total — no dangling-mass correction term needed.
    *
    * Float posture: per-round ranks are round(0.15 + 0.85·Σ pr/deg, 6)
    * — neighbor sums are tiny (≤ cluster size), so cross-engine
    * addition-order noise is ~1e-14 against the 6-dp pin, the same
    * accepted posture as d23/e16 (QueryDef policy item 6).
    */
  def dupGraphPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = dupEdges(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    var pr = deg.select(col("src").as("doc_id"), lit(1.0).as("pr"))
    for (_ <- 1 to 3) {
      pr = edges
        .join(deg, "src")
        .join(pr.select(col("doc_id").as("src"), col("pr")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(round(lit(0.15) + lit(0.85) * sum(col("pr") / col("deg")), 6).as("pr"))
        .localCheckpoint()
    }
    deg.select(col("src").as("doc_id"), col("deg"))
      .join(pr, "doc_id")
      .orderBy("doc_id")
  }

  private val dupGraphPagerankSql = {
    def round(r: Int): String =
      s"""p$r AS (SELECT e.dst AS doc_id,
         |  round(0.15 + 0.85 * sum(p.pr / d.deg), 6) AS pr
         |FROM edges e JOIN deg d ON e.src = d.src
         |  JOIN p${r - 1} p ON p.doc_id = e.src
         |GROUP BY e.dst)""".stripMargin
    s"""WITH $ccEdgesCte,
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |p0 AS (SELECT src AS doc_id, 1.0 AS pr FROM deg),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT g.src AS doc_id, g.deg, p.pr
       |FROM deg g JOIN p3 p ON p.doc_id = g.src
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d52

  /** Distributed quality-classifier training: full-batch logistic
    * regression distilling d31/d03's hard heuristic into a smooth
    * quality score — the fastText-classifier step of a curation
    * pipeline (label = d03's rule verdict; features = stop ratio,
    * uniqueness ratio, ln token count, z-scored). Eight deterministic
    * gradient-descent rounds, each ONE map-side-combinable aggregate
    * over the feature frame (4 running sums — the entire cross-node
    * traffic is a 4-double partial per partition, the exact cost shape
    * of distributed full-batch GD at any corpus size); the 1-row weight
    * state broadcast-crossJoins back, e25's Lloyd-round pattern with
    * weights in place of centroids. No driver loop over data — the
    * driver holds only the 1-row weight frame between rounds
    * (localCheckpoint, so rounds don't stack lineage).
    *
    * Determinism discipline (e25's, applied to GD): feature means/stds
    * and each round's weights are 6-dp pinned, so both engines enter
    * every round with identical doubles; within-round sums differ only
    * by addition order (~1e-13 against the pin — QueryDef policy
    * item 6). Output: final weights + training accuracy + mean
    * predicted probability per class, one (term, value) row each.
    */
  def qualityLogreg(s: SparkSession, dir: String): DataFrame = {
    val lr = "5.0D"
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    val raw = Tables.documents(s, dir)
      .selectExpr(
        "size(split(text,' ')) AS n_tokens",
        s"size(filter(split(text,' '), t -> array_contains($stopArr, t))) AS n_stop",
        "size(array_distinct(split(text,' '))) AS n_uniq")
      .selectExpr(
        "CAST(n_tokens >= 20 AND n_tokens <= 400 AND n_stop * 1.0D / n_tokens >= 0.05D AS INT) AS y",
        "n_stop * 1.0D / n_tokens AS r1",
        "n_uniq * 1.0D / n_tokens AS r2",
        "log(n_tokens) AS r3")
    val z = raw.agg(
      expr("round(avg(r1), 6) AS m1"), expr("round(stddev_pop(r1), 6) AS s1"),
      expr("round(avg(r2), 6) AS m2"), expr("round(stddev_pop(r2), 6) AS s2"),
      expr("round(avg(r3), 6) AS m3"), expr("round(stddev_pop(r3), 6) AS s3"))
    val feats = raw.crossJoin(broadcast(z))
      .selectExpr("y", "(r1 - m1) / s1 AS x1", "(r2 - m2) / s2 AS x2",
        "(r3 - m3) / s3 AS x3")
      .localCheckpoint()
    var w = s.range(1)
      .selectExpr("0.0D AS wb", "0.0D AS w1", "0.0D AS w2", "0.0D AS w3")
    for (_ <- 1 to 8) {
      w = feats.crossJoin(broadcast(w))
        .selectExpr("wb", "w1", "w2", "w3",
          "1.0D / (1.0D + exp(-(wb + w1*x1 + w2*x2 + w3*x3))) - y AS e",
          "x1", "x2", "x3")
        .agg(
          expr(s"round(first(wb) - $lr * avg(e), 6) AS wb"),
          expr(s"round(first(w1) - $lr * avg(e * x1), 6) AS w1"),
          expr(s"round(first(w2) - $lr * avg(e * x2), 6) AS w2"),
          expr(s"round(first(w3) - $lr * avg(e * x3), 6) AS w3"))
        .localCheckpoint()
    }
    feats.crossJoin(broadcast(w))
      .selectExpr("y",
        "1.0D / (1.0D + exp(-(wb + w1*x1 + w2*x2 + w3*x3))) AS p",
        "wb", "w1", "w2", "w3")
      .agg(
        expr("round(avg(CAST((p >= 0.5D) = (y = 1) AS INT)), 6) AS accuracy"),
        expr("round(avg(CASE WHEN y = 0 THEN p END), 6) AS mean_p_neg"),
        expr("round(avg(CASE WHEN y = 1 THEN p END), 6) AS mean_p_pos"),
        expr("first(wb) AS w_bias"), expr("first(w3) AS w_ln_tokens"),
        expr("first(w1) AS w_stop_ratio"), expr("first(w2) AS w_uniq_ratio"))
      .selectExpr(
        """stack(7,
          |  'accuracy', accuracy, 'mean_p_neg', mean_p_neg,
          |  'mean_p_pos', mean_p_pos, 'w_bias', w_bias,
          |  'w_ln_tokens', w_ln_tokens, 'w_stop_ratio', w_stop_ratio,
          |  'w_uniq_ratio', w_uniq_ratio) AS (term, value)""".stripMargin)
      .orderBy("term")
  }

  private val qualityLogregSql = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    def step(r: Int): String =
      s"""s$r AS (SELECT wb, w1, w2, w3,
         |  1.0/(1.0+exp(-(wb + w1*x1 + w2*x2 + w3*x3))) - y AS e, x1, x2, x3
         |  FROM f, t${r - 1}),
         |t$r AS (SELECT round(any_value(wb) - 5.0*avg(e), 6) AS wb,
         |  round(any_value(w1) - 5.0*avg(e*x1), 6) AS w1,
         |  round(any_value(w2) - 5.0*avg(e*x2), 6) AS w2,
         |  round(any_value(w3) - 5.0*avg(e*x3), 6) AS w3 FROM s$r)""".stripMargin
    val steps = (1 to 8).map(step).mkString(",\n")
    s"""WITH m AS (
       |  SELECT CAST(n_tokens >= 20 AND n_tokens <= 400 AND n_stop * 1.0 / n_tokens >= 0.05 AS INT) AS y,
       |         n_stop * 1.0 / n_tokens AS r1,
       |         n_uniq * 1.0 / n_tokens AS r2,
       |         ln(n_tokens) AS r3
       |  FROM (SELECT len(string_split(text,' ')) AS n_tokens,
       |          len(list_filter(string_split(text,' '), t -> list_contains($stopList, t))) AS n_stop,
       |          len(list_distinct(string_split(text,' '))) AS n_uniq
       |        FROM documents)),
       |z AS (SELECT round(avg(r1),6) AS m1, round(stddev_pop(r1),6) AS s1,
       |             round(avg(r2),6) AS m2, round(stddev_pop(r2),6) AS s2,
       |             round(avg(r3),6) AS m3, round(stddev_pop(r3),6) AS s3 FROM m),
       |f AS (SELECT y, (r1-m1)/s1 AS x1, (r2-m2)/s2 AS x2, (r3-m3)/s3 AS x3 FROM m, z),
       |t0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |$steps,
       |sc AS (SELECT y, 1.0/(1.0+exp(-(wb + w1*x1 + w2*x2 + w3*x3))) AS p,
       |              wb, w1, w2, w3 FROM f, t8),
       |a AS (SELECT round(avg(CAST((p >= 0.5) = (y = 1) AS INT)), 6) AS accuracy,
       |  round(avg(CASE WHEN y = 0 THEN p END), 6) AS mean_p_neg,
       |  round(avg(CASE WHEN y = 1 THEN p END), 6) AS mean_p_pos,
       |  any_value(wb) AS w_bias, any_value(w3) AS w_ln_tokens,
       |  any_value(w1) AS w_stop_ratio, any_value(w2) AS w_uniq_ratio FROM sc)
       |SELECT 'accuracy' AS term, accuracy AS value FROM a
       |UNION ALL SELECT 'mean_p_neg', mean_p_neg FROM a
       |UNION ALL SELECT 'mean_p_pos', mean_p_pos FROM a
       |UNION ALL SELECT 'w_bias', w_bias FROM a
       |UNION ALL SELECT 'w_ln_tokens', w_ln_tokens FROM a
       |UNION ALL SELECT 'w_stop_ratio', w_stop_ratio FROM a
       |UNION ALL SELECT 'w_uniq_ratio', w_uniq_ratio FROM a
       |ORDER BY term""".stripMargin
  }

  // ---------------------------------------------------------------- d53

  /** Applied decontamination — d18's detection as the corpus edit it
    * exists for (the detect→apply convention of d29/d48): the train cut
    * drops every doc sharing ≥5 trigram shingles with ANY eval doc, and
    * what remains is the train corpus a leakage-audited run would
    * actually ship. One anti join of the train split against d18's
    * flagged ids — the eval side stays broadcast-sized inside d18 (eval
    * cuts are small by construction), the train side never reshuffles,
    * and at corpus scale the anti join is the same doc_id-keyed exchange
    * d29 pays.
    */
  def applyDecontamination(s: SparkSession, dir: String): DataFrame = {
    val flagged = contamination(s, dir).select(col("train_id").as("doc_id")).distinct()
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", docBucket)
      .filter(col("bucket") < 95)
      .select("doc_id")
      .join(flagged, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  private val applyDecontaminationSql =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks, $docBucketSql
       |      FROM documents),
       |s AS (SELECT doc_id, bucket,
       |        list_distinct(list_transform(range(1, len(toks)-1),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |      FROM t WHERE len(toks) >= 3)
       |SELECT d.doc_id
       |FROM (SELECT doc_id, $docBucketSql FROM documents) d
       |WHERE d.bucket < 95
       |  AND NOT EXISTS (
       |    SELECT 1 FROM s a JOIN s b ON a.bucket < 95 AND b.bucket >= 95
       |    WHERE a.doc_id = d.doc_id
       |      AND len(list_intersect(a.sh, b.sh)) >= 5)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- d54

  /** Held-out LM scoring — d23's CCNet-style cross-entropy done PROPERLY
    * (the deferral in d23's own scaladoc): the unigram model trains on
    * the TRAIN split's counts only and scores the TEST split, with
    * add-one smoothing so unseen words carry finite mass:
    * p(w) = (c_train(w)+1) / (N + V + 1), the +1 class being UNK. Per
    * eval doc: token count, OOV count/rate (the domain-shift signal a
    * curator reads next to the xent), and xent = ln(N+V+1) − avg ln(c+1)
    * — all counts exact integers, the d23 float posture (ln under 6-dp).
    *
    * Scale shape = d23's with the split twist: counts aggregate the
    * train cut once (map-side combinable), N and V derive from the
    * |vocab|-sized count table — never a second corpus scan — and eval
    * tokens LEFT-join the counts by key, co-partitioned behind the count
    * agg's exchange (left join: OOV rows must survive with c=0).
    */
  def heldoutPerplexity(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir).selectExpr("doc_id", "text", docBucket)
    val cnt = docs.filter(col("bucket") < TrainCut)
      .selectExpr("explode(split(text,' ')) AS tok")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val stats = cnt.agg((sum("c") + count(lit(1)) + lit(1L)).as("denom")) // N + V + 1
    docs.filter(col("bucket") >= ValCut)
      .selectExpr("doc_id", "explode(split(text,' ')) AS tok")
      .join(cnt, Seq("tok"), "left")
      .selectExpr("doc_id", "coalesce(c, 0L) AS c")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c") === 0, 1L).otherwise(0L)).as("n_oov"),
        round(log(first("denom")) - avg(log(col("c") + 1)), 6).as("xent"))
      .selectExpr("doc_id", "n_tokens", "n_oov",
        "n_oov * 1.0D / n_tokens AS oov_rate", "xent")
      .orderBy("doc_id")
  }

  private val heldoutPerplexitySql =
    s"""WITH d AS (SELECT doc_id, text, $docBucketSql FROM documents),
       |cnt AS (SELECT tok, count(*) AS c
       |        FROM (SELECT unnest(string_split(text,' ')) AS tok
       |              FROM d WHERE bucket < $TrainCut) GROUP BY tok),
       |st AS (SELECT CAST(sum(c) + count(*) + 1 AS BIGINT) AS denom FROM cnt),
       |et AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
       |       FROM d WHERE bucket >= $ValCut),
       |j AS (SELECT doc_id, coalesce(c, 0) AS c FROM et LEFT JOIN cnt USING (tok))
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) * 1.0 / count(*) AS oov_rate,
       |  round(ln(max(denom)) - avg(ln(c + 1)), 6) AS xent
       |FROM j, st GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d55

  /** Temperature-scaled mixture weights — the multilingual-pretraining
    * resampling rule (mT5/XLM-R style): sampling mass w_s ∝ p_s^α with
    * α < 1 flattening the source distribution, where p_s is the
    * source's TOKEN share (tokens, not docs — the quantity a trainer
    * actually draws). d43 answers "equalize"; this answers "flatten by
    * temperature", with the boost factor w/p a curator reads to see how
    * much each tail source is oversampled at α = 0.7 and 0.5.
    *
    * Shape: one corpus pass (source-keyed token agg, map-side
    * combinable), then everything runs on the |sources|-sized frame —
    * the α-denominators are a 1-row agg of that frame broadcast back,
    * never a window. Floats: p is one exact-integer division
    * (bit-identical); pow/÷ are irrational-valued and carry the 6-dp
    * display pin (QueryDef policy item 6).
    */
  def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("size(split(text, ' '))")).as("tokens"))
    val tot = src.agg(sum("tokens").as("tt"))
    val p = src.crossJoin(broadcast(tot))
      .selectExpr("source", "n_docs", "tokens", "tokens * 1.0D / tt AS p")
    val denom = p.agg(sum(expr("pow(p, 0.7D)")).as("d7"),
      sum(expr("pow(p, 0.5D)")).as("d5"))
    p.crossJoin(broadcast(denom))
      .selectExpr("source", "n_docs", "tokens", "p",
        "round(pow(p, 0.7D) / d7, 6) AS w_t07",
        "round(pow(p, 0.5D) / d5, 6) AS w_t05",
        "round(pow(p, 0.7D) / d7 / p, 6) AS boost_t07",
        "round(pow(p, 0.5D) / d5 / p, 6) AS boost_t05")
      .orderBy("source")
  }

  private val temperatureMixtureSql =
    """WITH c AS (SELECT source, count(*) AS n_docs,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |           FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM c),
      |p AS (SELECT source, n_docs, tokens, tokens * 1.0 / tt AS p FROM c, t),
      |d AS (SELECT sum(pow(p, 0.7)) AS d7, sum(pow(p, 0.5)) AS d5 FROM p)
      |SELECT source, n_docs, tokens, p,
      |  round(pow(p, 0.7) / d7, 6) AS w_t07,
      |  round(pow(p, 0.5) / d5, 6) AS w_t05,
      |  round(pow(p, 0.7) / d7 / p, 6) AS boost_t07,
      |  round(pow(p, 0.5) / d5 / p, 6) AS boost_t05
      |FROM p, d ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d56

  /** BPE ENCODING report — d50's train→apply other half: the corpus
    * re-tokenized under the three learned merges, reported per source as
    * words / chars / BPE tokens / chars-per-token (the fertility number
    * a tokenizer team actually tracks — higher = better compression).
    *
    * The scale property BPE trainers rely on, made explicit: encoding
    * never re-folds the corpus — the fold already happened ONCE per
    * VOCAB WORD inside the trainer, and the corpus pass is one explode
    * joined to the (word → symbol count) table BY KEY (the d23
    * discipline: the vocab is Zipf-tailed and unbounded, so it joins
    * co-partitioned rather than broadcast). All outputs are exact
    * integers plus one exact integer division.
    */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val lens = bpeTrain(s, dir)._2.selectExpr("w", "size(syms) AS n_syms")
    Tables.documents(s, dir)
      .selectExpr("source", "explode(split(text, ' ')) AS w")
      .where("w <> ''")
      .join(lens, "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum("n_syms").as("n_bpe_tokens"))
      .selectExpr("source", "n_words", "n_chars", "n_bpe_tokens",
        "n_chars * 1.0D / n_bpe_tokens AS chars_per_token")
      .orderBy("source")
  }

  private val bpeEncodeSql =
    s"""WITH RECURSIVE
       |$bpeRoundsCte,
       |lens AS (SELECT w, len(syms) AS n_syms FROM s3),
       |t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |j AS (SELECT source, t.w AS w, n_syms
       |      FROM t JOIN lens ON t.w = lens.w WHERE t.w <> '')
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
       |  sum(length(w)) * 1.0 / sum(n_syms) AS chars_per_token
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d57

  /** Triangle counting + local clustering coefficient over the near-dup
    * graph — the third graph primitive beside d13's connected components
    * and d51's PageRank. Where components say "these docs are transitively
    * related" and PageRank says "this doc is the template", the clustering
    * coefficient says HOW a cluster is related: cc ≈ 1 means every member
    * pairs with every other (one source document copied n ways — safe to
    * keep one), cc ≈ 0 on a high-degree node means a star/chain (A≈B≈C
    * but A≉C — template drift, where keep-one-per-component destroys
    * genuinely distinct docs). That keep-policy signal is why triangle
    * structure matters to a dedup pipeline, not just to graph analytics.
    *
    * Scale shape (the standard degree-ordered edge-iterator,
    * O(m^{3/2}) total work):
    *  1. orient each undirected edge from its (degree, id)-smaller
    *     endpoint to the larger — an acyclic total order, so every
    *     triangle has EXACTLY one vertex with two out-edges in it
    *     (counted once, no /3 correction), and out-degree is bounded by
    *     O(√m) regardless of skew: a hub of degree d keeps out-edges
    *     only to same-or-higher-degree nodes, of which there are ≤ 2m/d;
    *  2. wedges = oriented ⋈ oriented on the center vertex (fan-out
    *     bounded by that √m out-degree, the step a naive undirected
    *     wedge join would blow up on a hub);
    *  3. close each wedge against the symmetric edge set on the (b, c)
    *     pair key — joins and aggs only: no window, no driver loop, and
    *     the per-node count is a map-side-combinable explode+sum.
    *
    * Float posture: clustering = 2·tri / (deg·(deg−1)) is ONE double
    * division of exact integers — bit-identical cross-engine, emitted
    * unrounded (QueryDef policy item 4).
    */
  def dupGraphTriangles(s: SparkSession, dir: String): DataFrame = {
    val edges = dupEdges(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val oriented = edges
      .join(deg.select(col("src"), col("deg").as("sdeg")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddeg")), "dst")
      .filter(col("sdeg") < col("ddeg") ||
        (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select("src", "dst")
      .localCheckpoint()
    val out1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val out2 = oriented.select(col("src").as("a"), col("dst").as("c"))
    val wedges = out1.join(out2, Seq("a")).filter(col("b") < col("c"))
    val tris = wedges.join(
      edges.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
    deg.select(col("src").as("doc_id"), col("deg"))
      .join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          lit(2.0) * col("triangles") / (col("deg") * (col("deg") - lit(1L))))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  // Oracle: pairs already carry d1 < d2, so a triangle {a<b<c} appears as
  // exactly one (p1=(a,b), p2=(b,c), p3=(a,c)) row — same count-once
  // property the Spark side gets from the degree orientation.
  private val dupGraphTrianglesSql =
    s"""WITH $ccEdgesCte,
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |tri AS (SELECT p1.d1 AS a, p1.d2 AS b, p2.d2 AS c
       |        FROM pairs p1
       |        JOIN pairs p2 ON p2.d1 = p1.d2
       |        JOIN pairs p3 ON p3.d1 = p1.d1 AND p3.d2 = p2.d2),
       |pern AS (SELECT doc_id, count(*) AS triangles FROM (
       |           SELECT a AS doc_id FROM tri
       |           UNION ALL SELECT b FROM tri
       |           UNION ALL SELECT c FROM tri)
       |         GROUP BY doc_id)
       |SELECT g.src AS doc_id, g.deg,
       |  coalesce(p.triangles, 0) AS triangles,
       |  CASE WHEN g.deg >= 2
       |       THEN 2.0 * coalesce(p.triangles, 0) / (g.deg * (g.deg - 1))
       |       ELSE 0.0 END AS clustering
       |FROM deg g LEFT JOIN pern p ON p.doc_id = g.src
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d58

  /** Zipf-law fit per source: OLS of ln(frequency) on ln(rank) over each
    * source's top-K tokens (K = 20 here so the cut BINDS on the test
    * corpus's ~31-word vocab; a production corpus would use 100+ — the
    * plan shape is K-independent) — the corpus-health diagnostic behind d43/
    * d55's mixture decisions (natural text slopes ≈ −1; a much flatter
    * or steeper slope flags synthetic/boilerplate-heavy sources whose
    * token-share weights mean something different than they do for prose).
    *
    * Scale shape — the top-100-by-frequency cut WITHOUT sorting the
    * vocabulary: the vocab is Zipf-tailed and unbounded (d23's
    * discipline), so ranking it per source with one window would sort
    * ~|vocab| rows per source in one task. Instead:
    *  1. token counts: one map-side-combinable agg;
    *  2. counts-of-counts histogram per source — and a corpus with N
    *     tokens has at most √(2N) DISTINCT frequencies (ranks k have
    *     freq ≥ their own index at most that far), so this frame is
    *     tiny at ANY corpus size;
    *  3. running-total window over that bounded histogram finds the
    *     frequency threshold admitting ≥ K tokens;
    *  4. only threshold survivors (≈ top-K plus the boundary tie
    *     layer) reach the row_number window — survivor-sized, never
    *     vocab-sized. Top-K ⊆ survivors because every excluded token
    *     has a strictly smaller count than K admitted ones.
    *
    * Float posture: ln() sums over ≤ K terms differ cross-engine only
    * by addition order (~1e-14 relative); slope/intercept/r² are
    * irrational-valued ratios of those sums, 6-dp display-rounded
    * (QueryDef policy item 6).
    */
  /** d58's rank cut — public so the spec pins the same K. */
  val ZipfTopK = 20

  def zipfFit(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .where("tok <> ''")
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds histogram, vocab count, and survivors
    val vocab = counts.groupBy("source").agg(count(lit(1)).as("n_vocab"))
    val wCum = Window.partitionBy("source").orderBy(col("cnt").desc)
    val thr = counts.groupBy("source", "cnt").agg(count(lit(1)).as("nt"))
      .withColumn("cum", sum("nt").over(wCum))
      .groupBy("source")
      .agg(coalesce(max(when(col("cum") >= ZipfTopK, col("cnt"))), min("cnt"))
        .as("thr"))
    val ranked = counts.join(thr, "source")
      .filter(col("cnt") >= col("thr"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rank") <= ZipfTopK)
      .select(col("source"), log(col("rank")).as("x"), log(col("cnt")).as("y"))
    val fit = ranked.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    fit.join(vocab, "source")
      .selectExpr("source", "n_vocab", "n AS n_ranks",
        "round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope",
        "round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept",
        """round(CASE WHEN n*syy - sy*sy = 0 THEN CAST(NULL AS DOUBLE)
          |  ELSE (n*sxy - sx*sy) * (n*sxy - sx*sy)
          |     / ((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 6) AS r2""".stripMargin)
      .orderBy("source")
  }

  // Oracle ranks the full per-source vocab directly (tiny at oracle SF);
  // the Spark side's threshold cut provably admits the same top-K.
  private val zipfFitSql =
    s"""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |c AS (SELECT source, tok, count(*) AS cnt FROM tk
      |      WHERE tok <> '' GROUP BY source, tok),
      |v AS (SELECT source, count(*) AS n_vocab FROM c GROUP BY source),
      |r AS (SELECT source, cnt,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY cnt DESC, tok) AS rank
      |      FROM c),
      |t AS (SELECT source, ln(rank) AS x, ln(cnt) AS y FROM r
      |      WHERE rank <= $ZipfTopK),
      |f AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      |      FROM t GROUP BY source)
      |SELECT f.source, v.n_vocab, f.n AS n_ranks,
      |  round((f.n*sxy - sx*sy) / (f.n*sxx - sx*sx), 6) AS slope,
      |  round((sy - (f.n*sxy - sx*sy) / (f.n*sxx - sx*sx) * sx) / f.n, 6)
      |    AS intercept,
      |  round(CASE WHEN f.n*syy - sy*sy = 0 THEN NULL
      |    ELSE (f.n*sxy - sx*sy) * (f.n*sxy - sx*sy)
      |       / ((f.n*sxx - sx*sx) * (f.n*syy - sy*sy)) END, 6) AS r2
      |FROM f JOIN v ON v.source = f.source
      |ORDER BY f.source""".stripMargin

  // ---------------------------------------------------------------- d59

  /** Pairwise Jensen–Shannon divergence between source token
    * distributions — the distance matrix behind d43/d55's mixture
    * decisions and d58's per-source health fit: two sources with
    * jsd_norm ≈ 0 are redundant (their mixture weights compete for the
    * same distribution), jsd_norm ≈ 1 marks disjoint vocabularies
    * (domain coverage, not redundancy). JSD is the symmetric, bounded
    * ([0, ln 2]) alternative to raw KL, whose infinities on
    * non-overlapping support make it useless across heterogeneous
    * sources.
    *
    * Scale shape — no per-pair vocabulary union is ever materialized:
    * tokens present in only one side contribute exactly p·ln 2 to their
    * side's KL term, so JSD decomposes into a CO-OCCURRING-token part
    * (one tok-keyed self-join + agg — the join key is the token,
    * shuffle ∝ vocab, never vocab × pairs) and a closed-form remainder
    * ln 2 · (1 − Σ_co p). A full-outer join per source pair — the naive
    * formulation — would shuffle the union |pairs| times.
    *
    * Float posture: p = cnt/tot is one exact integer division
    * (bit-identical); the ln-term sums differ cross-engine by addition
    * order only; jsd/jsd_norm are irrational, 6-dp display-rounded
    * (QueryDef policy item 6).
    */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .where("tok <> ''")
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("source").agg(sum("cnt").as("tot"))
      .localCheckpoint() // tiny; feeds p and the pair enumeration
    val p = counts.join(totals, "source")
      .selectExpr("source", "tok", "cnt * 1.0D / tot AS p")
      .localCheckpoint() // both sides of the tok self-join
    val pairsBase = totals.select(col("source").as("source_1"))
      .crossJoin(totals.select(col("source").as("source_2")))
      .filter(col("source_1") < col("source_2"))
    val co = p.select(col("source").as("source_1"), col("tok"), col("p").as("p1"))
      .join(p.select(col("source").as("source_2"), col("tok"),
        col("p").as("p2")), "tok")
      .filter(col("source_1") < col("source_2"))
      .groupBy("source_1", "source_2")
      .agg(count(lit(1)).as("n_common"),
        sum(expr("p1 * ln(2.0D * p1 / (p1 + p2))")).as("s1"),
        sum(expr("p2 * ln(2.0D * p2 / (p1 + p2))")).as("s2"),
        sum("p1").as("sp1"), sum("p2").as("sp2"))
    pairsBase.join(co, Seq("source_1", "source_2"), "left")
      .selectExpr("source_1", "source_2",
        "coalesce(n_common, 0L) AS n_common",
        """0.5D * (coalesce(s1, 0D) + ln(2.0D) * (1.0D - coalesce(sp1, 0D)))
          |  + 0.5D * (coalesce(s2, 0D) + ln(2.0D) * (1.0D - coalesce(sp2, 0D)))
          |  AS jsd_raw""".stripMargin)
      .selectExpr("source_1", "source_2", "n_common",
        "round(jsd_raw, 6) AS jsd",
        "round(jsd_raw / ln(2.0D), 6) AS jsd_norm")
      .orderBy("source_1", "source_2")
  }

  // Oracle materializes the per-pair vocabulary union directly (fine at
  // oracle SF) — the Spark decomposition computes the same real number.
  private val sourceDivergenceSql =
    """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |c AS (SELECT source, tok, count(*) AS cnt FROM tk
      |      WHERE tok <> '' GROUP BY source, tok),
      |t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM c
      |      GROUP BY source),
      |p AS (SELECT c.source, c.tok, c.cnt * 1.0 / t.tot AS p
      |      FROM c JOIN t ON c.source = t.source),
      |pr AS (SELECT a.source AS source_1, b.source AS source_2
      |       FROM t a JOIN t b ON a.source < b.source),
      |u AS (SELECT pr.source_1, pr.source_2, v.tok,
      |        coalesce(p1.p, 0) AS p1, coalesce(p2.p, 0) AS p2
      |      FROM pr
      |      CROSS JOIN (SELECT DISTINCT tok FROM c) v
      |      LEFT JOIN p p1 ON p1.source = pr.source_1 AND p1.tok = v.tok
      |      LEFT JOIN p p2 ON p2.source = pr.source_2 AND p2.tok = v.tok
      |      WHERE coalesce(p1.p, 0) > 0 OR coalesce(p2.p, 0) > 0),
      |j AS (SELECT source_1, source_2,
      |        count(*) FILTER (WHERE p1 > 0 AND p2 > 0) AS n_common,
      |        sum(CASE WHEN p1 > 0
      |              THEN p1 * ln(2.0 * p1 / (p1 + p2)) ELSE 0 END)
      |      + sum(CASE WHEN p2 > 0
      |              THEN p2 * ln(2.0 * p2 / (p1 + p2)) ELSE 0 END) AS skl
      |      FROM u GROUP BY source_1, source_2)
      |SELECT source_1, source_2, n_common,
      |  round(0.5 * skl, 6) AS jsd,
      |  round(0.5 * skl / ln(2.0), 6) AS jsd_norm
      |FROM j ORDER BY source_1, source_2""".stripMargin

  // ---------------------------------------------------------------- d60

  /** Heaps'-law fit over the trigram-SHINGLE vocabulary: cumulative
    * distinct shingles V against cumulative shingle occurrences N across
    * corpus deciles, with the OLS fit of ln V on ln N (V ≈ k·N^β). This
    * is the LSH-INDEX-GROWTH forecast a dedup deployment sizes against:
    * d06/d24's posting lists and Bloom capacity grow like the shingle
    * vocabulary, and β tells you whether doubling the corpus doubles the
    * index (β ≈ 1, pathologically novel text) or grows it sublinearly
    * (β ≈ 0.5-0.9, natural text). Token-level Heaps is degenerate on
    * this corpus (the ~31-word vocab saturates in decile 1); the shingle
    * vocabulary grows through every decile at every SF.
    *
    * Scale shape — the cumulative-distinct-over-prefixes query WITHOUT
    * re-scanning per prefix: distinct-at-prefix-k is fully determined by
    * each shingle's FIRST-occurrence doc (one min-agg over the exploded
    * shingle table, map-side combinable), bucketed into deciles; the
    * cumulative sums then run on the 10-row decile frame via a
    * triangular self-join (10×10 — no window, nothing data-scaled).
    * doc_ids are dense 0..n−1 (the corpus contract), so decile =
    * doc_id·10 div n is a pure projection — no rank, no sort.
    *
    * Float posture: N/V are exact integers; ln sums over 10 points and
    * the β/ln k/r² ratios carry d58's 6-dp pin.
    */
  def shingleHeaps(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .selectExpr("doc_id", "greatest(size(split(text, ' ')) - 2, 0) AS ns")
    val nRow = base.agg(count(lit(1)).as("n")).localCheckpoint()
    val perB = base.crossJoin(broadcast(nRow))
      .selectExpr("CAST(doc_id * 10 DIV n AS INT) AS b", "ns")
      .groupBy("b")
      .agg(count(lit(1)).as("docs_b"), sum("ns").as("sh_b"))
    val vocabB = shingleHashed(s, dir)
      .selectExpr("doc_id", "explode(shs) AS h")
      .groupBy("h").agg(min("doc_id").as("fd"))
      .crossJoin(broadcast(nRow))
      .selectExpr("CAST(fd * 10 DIV n AS INT) AS b")
      .groupBy("b").agg(count(lit(1)).as("vocab_b"))
    val per = perB.join(vocabB, Seq("b"), "left")
      .selectExpr("b", "docs_b", "sh_b", "coalesce(vocab_b, 0L) AS vocab_b")
      .localCheckpoint() // 10 rows; both sides of the triangular join
    val cum = per.select(col("b"))
      .join(per.select(col("b").as("b0"), col("docs_b"), col("sh_b"),
        col("vocab_b")), col("b0") <= col("b"))
      .groupBy("b")
      .agg(sum("docs_b").as("n_docs"), sum("sh_b").as("n_shingles"),
        sum("vocab_b").as("vocab"))
      .localCheckpoint() // feeds the fit agg AND the output join
    val fit = cum
      .selectExpr("ln(CAST(n_shingles AS DOUBLE)) AS x",
        "ln(CAST(vocab AS DOUBLE)) AS y")
      .agg(count(lit(1)).as("m"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .selectExpr(
        "round((m*sxy - sx*sy) / (m*sxx - sx*sx), 6) AS beta",
        "round((sy - (m*sxy - sx*sy) / (m*sxx - sx*sx) * sx) / m, 6) AS lnk",
        """round(CASE WHEN m*syy - sy*sy = 0 THEN CAST(NULL AS DOUBLE)
          |  ELSE (m*sxy - sx*sy) * (m*sxy - sx*sy)
          |     / ((m*sxx - sx*sx) * (m*syy - sy*sy)) END, 6) AS r2""".stripMargin)
    cum.crossJoin(broadcast(fit))
      .selectExpr("CAST(b + 1 AS INT) AS decile", "n_docs", "n_shingles",
        "vocab", "beta", "lnk", "r2")
      .orderBy("decile")
  }

  private val shingleHeapsSql =
    s"""WITH $shingleSqlCte,
       |nn AS (SELECT count(*) AS n FROM documents),
       |pb AS (SELECT CAST((doc_id * 10) // n AS INT) AS b,
       |         count(*) AS docs_b,
       |         CAST(sum(greatest(len(string_split(text, ' ')) - 2, 0))
       |              AS BIGINT) AS sh_b
       |       FROM documents, nn GROUP BY 1),
       |fo0 AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |fo AS (SELECT g, min(doc_id) AS fd FROM fo0 GROUP BY g),
       |vb AS (SELECT CAST((fd * 10) // n AS INT) AS b, count(*) AS vocab_b
       |       FROM fo, nn GROUP BY 1),
       |per AS (SELECT pb.b, pb.docs_b, pb.sh_b,
       |          coalesce(vb.vocab_b, 0) AS vocab_b
       |        FROM pb LEFT JOIN vb ON vb.b = pb.b),
       |cum AS (SELECT a.b, CAST(sum(c.docs_b) AS BIGINT) AS n_docs,
       |          CAST(sum(c.sh_b) AS BIGINT) AS n_shingles,
       |          CAST(sum(c.vocab_b) AS BIGINT) AS vocab
       |        FROM per a JOIN per c ON c.b <= a.b GROUP BY a.b),
       |pts AS (SELECT ln(CAST(n_shingles AS DOUBLE)) AS x,
       |          ln(CAST(vocab AS DOUBLE)) AS y FROM cum),
       |f AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
       |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM pts)
       |SELECT CAST(cum.b + 1 AS INT) AS decile, n_docs, n_shingles, vocab,
       |  round((m*sxy - sx*sy) / (m*sxx - sx*sx), 6) AS beta,
       |  round((sy - (m*sxy - sx*sy) / (m*sxx - sx*sx) * sx) / m, 6) AS lnk,
       |  round(CASE WHEN m*syy - sy*sy = 0 THEN NULL
       |    ELSE (m*sxy - sx*sy) * (m*sxy - sx*sy)
       |       / ((m*sxx - sx*sx) * (m*syy - sy*sy)) END, 6) AS r2
       |FROM cum, f ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- d61

  /** MinHash ESTIMATOR calibration audit: for every exact near-dup pair
    * (d05), the 16-permutation MinHash Jaccard estimate beside the true
    * Jaccard, with the signed error — the measurement that validates the
    * statistical engine UNDER d06's LSH before anyone trusts its bands
    * at corpus scale (E[estimate] = J; per-pair σ = √(J(1−J)/16) ≈ 0.1
    * at J = 0.8, which the spec's mean-absolute-error gate reflects).
    * d06 already proves the BANDING finds the right pairs; this audits
    * the estimator those bands are built from.
    *
    * Portability: permutations are min-hashes of `md5_long60` over
    * "mh-<p>-<shingle>" — the cross-engine hash family (e29's trick),
    * so both engines hold bit-identical signatures; the production path
    * (d06) keeps the faster xxhash64 family, which no SQL oracle can
    * replay — THIS query exists to put the estimator itself under the
    * hash gate.
    *
    * Scale shape: the ENTIRE signature pass is pair-proportional, not
    * corpus-proportional — only docs that appear in an audited pair are
    * ever signed (a semi-join cuts the corpus before the 16× hash
    * explode; in production the LSH index already holds signatures, and
    * an audit that re-signed 100 TB to check 1k pairs would be absurd —
    * the measured version: corpus-wide signing scaled 4.4× across the
    * sf0.01→0.1 decade, pair-restricted stays flat). Signatures then are
    * one explode × 16-row broadcast + min-agg (map-side combinable,
    * state = one long per (doc, perm)). est = k/16 is binary-exact; err
    * is row arithmetic on exact inputs — emitted unrounded (policy
    * item 4).
    */
  def minhashEstimateAudit(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val pairs = jaccardDupPairs(s, dir)
      .localCheckpoint() // feeds the audited-doc cut AND the output join
    val pairDocs = pairs
      .select(explode(array(col("doc_id_1"), col("doc_id_2"))).as("doc_id"))
      .distinct()
    // cut FIRST, spread the survivors: the broadcast semi-probe is a
    // cheap scan-fused filter, and fanning out before it would push the
    // ENTIRE corpus text through the exchange only to drop the
    // non-audited rows on the other side (guide §2.3 — project/filter
    // before the exchange). spread, not fanOut: the partition probe
    // would re-execute the pair subtree (see Tables.spread)
    val sh = Tables.spread(Tables.documents(s, dir).select("doc_id", "text")
        .join(broadcast(pairDocs), "doc_id")) // sign ONLY audited docs
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3)))) AS shs""".stripMargin)
    val sigs = sh.selectExpr("doc_id", "explode(shs) AS g")
      .crossJoin(broadcast(s.range(0, 16).selectExpr("CAST(id AS INT) AS p")))
      .selectExpr("doc_id", "p", "md5_long60(concat('mh-', p, '-', g)) AS h")
      .groupBy("doc_id", "p").agg(min("h").as("m"))
      .localCheckpoint() // both sides of the pair join
    pairs
      .join(sigs.select(col("doc_id").as("doc_id_1"), col("p"),
        col("m").as("m1")), "doc_id_1")
      .join(sigs.select(col("doc_id").as("doc_id_2"), col("p"),
        col("m").as("m2")), Seq("doc_id_2", "p"))
      .groupBy("doc_id_1", "doc_id_2", "jaccard")
      .agg((sum(when(col("m1") === col("m2"), 1L).otherwise(0L)) / lit(16.0))
        .as("mh_estimate"))
      .selectExpr("doc_id_1", "doc_id_2", "jaccard", "mh_estimate",
        "mh_estimate - jaccard AS err")
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val minhashEstimateAuditSql =
    s"""WITH $shingleSqlCte,
       |sig AS (SELECT t.doc_id, pp.p,
       |          min(CAST(('0x' || substr(md5('mh-' || pp.p || '-' || t.g),
       |                    1, 15)) AS BIGINT)) AS m
       |        FROM (SELECT doc_id, unnest(sh) AS g FROM s) t,
       |             (SELECT unnest(range(0, 16)) AS p) pp
       |        GROUP BY t.doc_id, pp.p),
       |pairs AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |    len(list_intersect(a.sh, b.sh)) * 1.0
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      AS jaccard
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |est AS (SELECT p.doc_id_1, p.doc_id_2, p.jaccard,
       |          sum(CASE WHEN s1.m = s2.m THEN 1 ELSE 0 END) / 16.0
       |            AS mh_estimate
       |        FROM pairs p
       |        JOIN sig s1 ON s1.doc_id = p.doc_id_1
       |        JOIN sig s2 ON s2.doc_id = p.doc_id_2 AND s2.p = s1.p
       |        GROUP BY p.doc_id_1, p.doc_id_2, p.jaccard)
       |SELECT doc_id_1, doc_id_2, jaccard, mh_estimate,
       |  mh_estimate - jaccard AS err
       |FROM est ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d62

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene-style
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant, k1 = 1.2,
    * b = 0.75): top-5 documents per query term, the lookup side of the
    * corpus — after dedup/filtering, retrieval over the training set is
    * how decontamination probes, data maps, and eval-leak searches are
    * actually served. The query set is data-derived and deterministic:
    * the 8 rarest tokens (df ASC, token ASC) — the most discriminative
    * terms the vocabulary has.
    *
    * Plan shape at scale: ONE token explode builds the tf (doc,token)
    * table (map-side combinable), and every other input derives from
    * tf without touching the corpus again — dl(doc) = Σ tf, df and the
    * query-term set reduce tf by token, corpus stats reduce dl. The
    * 8-term query set and the 2-value corpus stats (N,
    * Σdl) BROADCAST onto tf, so scoring touches only the posting lists
    * of the query terms — the corpus-wide token stream is never joined
    * row-at-scale, and the only window partitions by query_term over
    * those posting lists (parallel across terms; a term's list is
    * df-bounded, and a production index would cap it with the TopK
    * aggregator — here the window keeps the oracle shape exact).
    *
    * Determinism: ranking sorts by the ROUNDED score (6 dp, policy
    * item 6 — ln is irrational) so both engines order identical keys,
    * with doc_id as the full tie-breaker (equal tf/dl ⇒ equal scores
    * are common in a 31-token vocab).
    */
  def bm25Retrieval(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: everything downstream (dl, df, corpus stats, the
    // query-term set) derives from the tf table — dl(doc) = Σ_tok tf is
    // the same number a second explode would count. tf is the inverted
    // index a production deployment materializes; persisting it here
    // (runner-owns-cleanup contract, q31's lesson) keeps its three
    // consumers from re-exploding the corpus.
    val tf = Tables.documents(s, dir)
      .selectExpr("doc_id", "explode(split(text,' ')) AS token")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qterms = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").asc, col("token").asc).limit(8)
    tf.join(broadcast(qterms), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .selectExpr("token AS query_term", "doc_id",
        s"round($bm25TermScoreExpr, 6) AS bm25")
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_term")
          .orderBy(col("bm25").desc, col("doc_id").asc)))
      .filter(col("rank") <= 5)
      .select("query_term", "rank", "doc_id", "bm25")
      .orderBy("query_term", "rank")
  }

  /** The d62 BM25 chain over an arbitrary documents relation — ONE SQL
    * definition shared by the inline oracle (d62, over `documents`) and
    * the committed-artifact oracles (d83/d84, over the index's live doc
    * set), so formula and ranking discipline can never drift.
    */
  private[ext] def bm25SqlOver(docsRel: String): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |              FROM $docsRel),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |q AS (SELECT token, count(*) AS df FROM tf GROUP BY 1
      |      ORDER BY df ASC, token ASC LIMIT 8),
      |scored AS (
      |  SELECT q.token AS query_term, tf.doc_id,
      |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (0.25 + 0.75 * (dl * 1.0 * n_docs / sum_dl))),
      |      6) AS bm25
      |  FROM tf JOIN q ON tf.token = q.token
      |  JOIN dl ON tf.doc_id = dl.doc_id, stats),
      |r AS (SELECT query_term, doc_id, bm25,
      |        row_number() OVER (PARTITION BY query_term
      |          ORDER BY bm25 DESC, doc_id ASC) AS rank
      |      FROM scored)
      |SELECT query_term, CAST(rank AS INT) AS rank, doc_id, bm25
      |FROM r WHERE rank <= 5
      |ORDER BY query_term, rank""".stripMargin

  private val bm25RetrievalSql = s"WITH ${bm25SqlOver("documents")}"

  /** The DOCUMENT-AT-A-TIME BM25 chain over an arbitrary documents
    * relation — d85's oracle: the same tokenize/tf/dl/stats/rarest-8
    * prologue as [[bm25SqlOver]], but per-term scores SUM per document
    * (unrounded doubles, rounded 6 dp on the sum — e41's lexical-arm
    * discipline) and ONE ranked top-k doc list comes back, the shape a
    * real multi-term retrieval query returns. `n_terms_hit` counts the
    * query terms present in the doc — integer-exact.
    */
  private[ext] def bm25DaatSqlOver(docsRel: String, k: Int): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |              FROM $docsRel),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |q AS (SELECT token, count(*) AS df FROM tf GROUP BY 1
      |      ORDER BY df ASC, token ASC LIMIT 8),
      |scored AS (
      |  SELECT tf.doc_id,
      |    round(sum(
      |      ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (0.25 + 0.75 * (dl * 1.0 * n_docs / sum_dl)))),
      |      6) AS bm25,
      |    count(*) AS n_terms_hit
      |  FROM tf JOIN q ON tf.token = q.token
      |  JOIN dl ON tf.doc_id = dl.doc_id, stats
      |  GROUP BY tf.doc_id),
      |r AS (SELECT doc_id, bm25, n_terms_hit,
      |        row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      |      FROM scored)
      |SELECT CAST(rank AS INT) AS rank, doc_id, bm25, n_terms_hit
      |FROM r WHERE rank <= $k
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- d63

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * per-document importance log-weight ln p_target(x) − ln p_raw(x)
    * under HASHED bigram bag-of-features models — the selection score
    * that resamples a raw crawl toward a target domain (here: the
    * `lang = 'en'` slice stands in for the target corpus). Features
    * are bigrams hashed into 1024 buckets ('ds:' domain-separated
    * md5-60, cross-engine exact); both models are add-one-smoothed
    * bucket frequencies, so
    *   logw(d) = Σ_b∈d ln((ct_b+1)/(cr_b+1)) − |d|·ln((Nt+B)/(Nr+B)).
    *
    * Scale shape: the bucket models are ≤1024 rows BY CONSTRUCTION —
    * feature hashing is what makes DSIR run on a crawl: BOTH models
    * come out of ONE agg over the bigram stream (target = a
    * conditional sum beside the raw count — separate raw/target aggs
    * would scan the corpus-wide explode twice more), the totals reduce
    * the 1024-row model, and everything broadcasts; scoring is one
    * map-side join over the stream plus one doc-keyed sum (map-side
    * combinable). Two stream evaluations total — model build and
    * scoring — the floor without materializing a corpus-scale stream.
    * Float posture: row-level ln of exact-integer ratios is
    * bit-identical across engines; the per-doc sum carries d23's
    * accepted 6-dp display rounding.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val feats = Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", "split(text,' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id", "lang",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ',
          |              element_at(toks, i + 1)))) AS bg""".stripMargin)
      .selectExpr("doc_id", "lang",
        s"pmod(${md5h60("concat('ds:', bg)")}, 1024) AS f")
    // both models in ONE agg over the bigram stream (cr = all, ct = the
    // target slice as a conditional sum) — the naive raw/tgt/join
    // spelling scans the corpus-wide explode three times
    val model = feats.groupBy("f")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    feats.join(broadcast(model), Seq("f"))
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        expr("""round(sum(ln((ct + 1.0D) / (cr + 1.0D)))
               |  - count(1) * ln((first(nt) + 1024.0D)
               |                / (first(nr) + 1024.0D)), 6)""".stripMargin)
          .as("logw"))
      .orderBy("doc_id")
  }

  private val dsirWeightsSql =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS toks
       |           FROM documents),
       |bg AS (SELECT doc_id, lang,
       |         unnest(list_transform(range(1, len(toks)),
       |           i -> toks[i] || ' ' || toks[i+1])) AS bg
       |       FROM t WHERE len(toks) >= 2),
       |feats AS (SELECT doc_id, lang,
       |            ${md5h60Sql("'ds:' || bg")} % 1024 AS f FROM bg),
       |raw AS (SELECT f, count(*) AS cr FROM feats GROUP BY 1),
       |tgt AS (SELECT f, count(*) AS ct FROM feats WHERE lang = 'en'
       |        GROUP BY 1),
       |tot AS (SELECT (SELECT sum(cr) FROM raw) AS nr,
       |               (SELECT coalesce(sum(ct), 0) FROM tgt) AS nt),
       |model AS (SELECT raw.f, cr, coalesce(ct, 0) AS ct
       |          FROM raw LEFT JOIN tgt ON raw.f = tgt.f)
       |SELECT doc_id, count(*) AS n_feats,
       |  round(sum(ln((ct + 1.0) / (cr + 1.0)))
       |    - count(*) * ln((max(nt) + 1024.0) / (max(nr) + 1024.0)), 6) AS logw
       |FROM feats JOIN model USING (f), tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d64

  /** Stupid-backoff bigram scoring of the held-out split (Brants et al.
    * 2007, arXiv/W07 "Large Language Models in Machine Translation" —
    * THE distributed-by-construction LM: no normalization, no
    * discounting, so the model is nothing but count tables and scoring
    * is embarrassingly parallel; the paper's point, and this query's,
    * is that at crawl scale this beats fancy smoothing it can't afford).
    * Score of bigram (w1,w2): cb/cf when the TRAIN split saw it, else
    * 0.4 · cu(w2)/N (the backoff path); w2 never seen in train at all
    * is OOV — excluded from the mean and reported, d54's discipline.
    *
    * Scale shape: all three model tables are VOCAB-bounded (cb ≤ V²,
    * cf/cu ≤ V) so they broadcast with the 1-row total; scoring is one
    * map-side pass over the held-out bigram stream + a doc-keyed
    * map-combinable agg — the train corpus is aggregated once, the
    * held-out corpus never shuffles except per-doc. Float posture: ln
    * of exact-integer ratios (0.4 as an exact double constant both
    * sides); per-doc avg carries d23's accepted 6-dp rounding.
    */
  def stupidBackoff(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir).selectExpr("doc_id", "text", docBucket)
    val bigramOf = """explode(transform(sequence(1, size(toks) - 1),
                     |  i -> struct(element_at(toks, i) AS w1,
                     |              element_at(toks, i + 1) AS w2))) AS b""".stripMargin
    val cb = docs.filter(col("bucket") < TrainCut)
      .selectExpr("split(text,' ') AS toks").where("size(toks) >= 2")
      .selectExpr(bigramOf).select("b.w1", "b.w2")
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cf = cb.groupBy("w1").agg(sum("cb").as("cf"))
    val cu = docs.filter(col("bucket") < TrainCut)
      .selectExpr("explode(split(text,' ')) AS w2")
      .groupBy("w2").agg(count(lit(1)).as("cu"))
    val nt = cu.agg(sum("cu").as("nt"))
    docs.filter(col("bucket") >= ValCut)
      .selectExpr("doc_id", "split(text,' ') AS toks").where("size(toks) >= 2")
      .selectExpr("doc_id", bigramOf)
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .join(broadcast(cb), Seq("w1", "w2"), "left")
      .join(broadcast(cf), Seq("w1"), "left")
      .join(broadcast(cu), Seq("w2"), "left")
      .crossJoin(broadcast(nt))
      .selectExpr("doc_id",
        "CASE WHEN cb IS NULL AND cu IS NOT NULL THEN 1L ELSE 0L END AS is_backoff",
        "CASE WHEN cu IS NULL THEN 1L ELSE 0L END AS is_oov",
        """CASE WHEN cb IS NOT NULL THEN ln(cb * 1.0D / cf)
          |     WHEN cu IS NOT NULL THEN ln(0.4D * cu / nt)
          |     ELSE CAST(NULL AS DOUBLE) END AS lns""".stripMargin)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("is_backoff").as("n_backoff"),
        sum("is_oov").as("n_oov"),
        round(avg("lns"), 6).as("sb_logscore"))
      .orderBy("doc_id")
  }

  private val stupidBackoffSql =
    s"""WITH d AS (SELECT doc_id, text, $docBucketSql FROM documents),
       |tb AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM (
       |         SELECT unnest(list_transform(range(1, len(toks)),
       |                  i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
       |         FROM (SELECT string_split(text,' ') AS toks FROM d
       |               WHERE bucket < $TrainCut)
       |         WHERE len(toks) >= 2)),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM tb GROUP BY 1, 2),
       |cf AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cf FROM cb GROUP BY 1),
       |cu AS (SELECT w2, count(*) AS cu FROM (
       |         SELECT unnest(string_split(text,' ')) AS w2 FROM d
       |         WHERE bucket < $TrainCut) GROUP BY 1),
       |nt AS (SELECT CAST(sum(cu) AS BIGINT) AS nt FROM cu),
       |hb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
       |         SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |                  i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
       |         FROM (SELECT doc_id, string_split(text,' ') AS toks FROM d
       |               WHERE bucket >= $ValCut)
       |         WHERE len(toks) >= 2)),
       |sc AS (SELECT doc_id,
       |         CASE WHEN cb IS NULL AND cu IS NOT NULL THEN 1 ELSE 0 END
       |           AS is_backoff,
       |         CASE WHEN cu IS NULL THEN 1 ELSE 0 END AS is_oov,
       |         CASE WHEN cb IS NOT NULL THEN ln(cb * 1.0 / cf)
       |              WHEN cu IS NOT NULL
       |                THEN ln(CAST(0.4 AS DOUBLE) * cu / nt)
       |              ELSE NULL END AS lns
       |       FROM hb LEFT JOIN cb USING (w1, w2) LEFT JOIN cf USING (w1)
       |            LEFT JOIN cu USING (w2), nt)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
       |  CAST(sum(is_oov) AS BIGINT) AS n_oov,
       |  round(avg(lns), 6) AS sb_logscore
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d65

  /** Fuzzy decontamination: train-split documents whose winnowed
    * fingerprints are ≥ 50% CONTAINED in some test-split document — the
    * edit-tolerant leak detector (d18's exact 8-gram probe misses a
    * contaminated doc that was lightly paraphrased or truncated;
    * winnowing's position-invariant local sampling survives both, the
    * reason plagiarism/contamination tooling is built on it —
    * Schleimer 2003). Fingerprints are min-hashes over 3-wide windows
    * of WORD-TRIGRAM hashes (d05's shingle granularity, winnowed to
    * ~1/3 of the stream): character 5-grams on this 31-word vocabulary
    * are near-ubiquitous — the all-pairs trap — while token trigrams
    * stay selective (candidate pairs drop ~40×, measured).
    *
    * Scale shape: the pair candidates come from a POSTING-LIST join
    * keyed by fingerprint (d05's inverted-index discipline — never
    * train × test): each side explodes its distinct fingerprints once,
    * the join is fingerprint-proportional, and the per-pair agg is
    * map-side combinable. A boilerplate fingerprint shared by
    * everything makes a hot key — production caps posting lists
    * exactly as d39 does for shingles. The winnow ARRAY frame is
    * localCheckpoint'd before the explode: project collapse otherwise
    * inlines the hash chain into every downstream reference and the
    * generator path re-evaluates it per OUTPUT row (measured 68 s vs
    * 0.3 s on 500 docs); the fingerprint index is the artifact a
    * production pipeline persists anyway. Containment = |shared| /
    * |train fps| is exact-integer division — bit-identical across
    * engines, emitted unrounded (policy item 4) — and the 0.5
    * threshold compares that exact value.
    */
  def fuzzyDecontamination(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val fpsFrame = Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks", docBucket)
      .where("size(toks) >= 6")
      .selectExpr("doc_id", "bucket",
        s"""transform(sequence(1, size(toks) - 2),
           |  i -> ${md5h60("concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))")}) AS hs""".stripMargin)
      .selectExpr("doc_id", "bucket",
        "array_distinct(transform(sequence(1, size(hs) - 2), i -> array_min(slice(hs, i, 3)))) AS fps")
      .localCheckpoint()
    val e = fpsFrame
      .selectExpr("doc_id", "bucket", "size(fps) AS n_fp", "explode(fps) AS fp")
    val tr = e.where(col("bucket") < TrainCut)
      .select(col("doc_id").as("train_doc_id"), col("n_fp"), col("fp"))
    val te = e.where(col("bucket") >= ValCut)
      .select(col("doc_id").as("test_doc_id"), col("fp"))
    tr.join(te, Seq("fp"))
      .groupBy("train_doc_id", "test_doc_id", "n_fp")
      .agg(count(lit(1)).as("n_shared_fp"))
      .where(expr("n_shared_fp * 1.0D / n_fp >= 0.5D"))
      .selectExpr("train_doc_id", "test_doc_id", "n_fp", "n_shared_fp",
        "n_shared_fp * 1.0D / n_fp AS containment")
      .orderBy("train_doc_id", "test_doc_id")
  }

  private val fuzzyDecontaminationSql =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
       |             $docBucketSql FROM documents),
       |h AS (SELECT doc_id, bucket,
       |        list_transform(range(1, len(toks) - 1),
       |          i -> ${md5h60Sql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}) AS hs
       |      FROM d WHERE len(toks) >= 6),
       |f AS (SELECT doc_id, bucket,
       |        list_distinct(list_transform(range(1, len(hs) - 1),
       |          i -> list_min(hs[i:i+2]))) AS fps FROM h),
       |e AS (SELECT doc_id, bucket, len(fps) AS n_fp, unnest(fps) AS fp
       |      FROM f),
       |tr AS (SELECT doc_id AS train_doc_id, n_fp, fp FROM e
       |       WHERE bucket < $TrainCut),
       |te AS (SELECT doc_id AS test_doc_id, fp FROM e
       |       WHERE bucket >= $ValCut),
       |j AS (SELECT train_doc_id, test_doc_id, n_fp, count(*) AS n_shared_fp
       |      FROM tr JOIN te USING (fp) GROUP BY 1, 2, 3)
       |SELECT train_doc_id, test_doc_id, n_fp,
       |  CAST(n_shared_fp AS BIGINT) AS n_shared_fp,
       |  n_shared_fp * 1.0 / n_fp AS containment
       |FROM j WHERE n_shared_fp * 1.0 / n_fp >= 0.5
       |ORDER BY train_doc_id, test_doc_id""".stripMargin

  // ---------------------------------------------------------------- d66

  /** Curation attrition funnel: d31's quality rules applied as an
    * ORDERED cascade with per-stage loss accounting — the report a
    * curator actually reads before shipping a filter config ("the
    * length rule costs 4% of the corpus, the stopword rule another 11%
    * of what survived"); every production pipeline publishes this
    * table next to the filtered corpus, because a rule that silently
    * deletes half the data is the most expensive bug curation has.
    *
    * Scale shape: ONE corpus scan computes all three rule booleans
    * row-locally, one global conditional-sum agg (map-side combinable,
    * 4 longs of state) yields every stage's survivor count — the
    * cascade is CUMULATIVE conjunctions, so stage k's output count is
    * simply Σ(r1 ∧ … ∧ rk) — and the 3-row funnel unpivots from that
    * single row via `stack`. No shuffle carries more than one row.
    * Rates are exact-integer divisions (policy item 3) — emitted
    * unrounded.
    */
  def filterFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id",
        "size(split(text, ' ')) AS n_tokens",
        "length(replace(text, ' ', '')) AS n_alpha",
        "split(text, ' ') AS toks")
      .selectExpr(
        "n_tokens BETWEEN 50 AND 100000 AS r1",
        "n_alpha * 1.0D / n_tokens BETWEEN 3.0D AND 10.0D AS r2",
        "array_contains(toks, 'the') AND array_contains(toks, 'a') AS r3")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("r1"), 1L).otherwise(0L)).as("s1"),
        sum(when(col("r1") && col("r2"), 1L).otherwise(0L)).as("s2"),
        sum(when(col("r1") && col("r2") && col("r3"), 1L).otherwise(0L))
          .as("s3"))
      .selectExpr(
        """stack(3,
          |  1, 'len',      n,  s1,
          |  2, 'word_len', s1, s2,
          |  3, 'stopword', s2, s3) AS (stage, rule, n_in, n_out)""".stripMargin,
        "n AS n_total")
      .selectExpr("stage", "rule", "n_in", "n_out", "n_in - n_out AS n_removed",
        "n_out * 1.0D / n_total AS survival")
      .orderBy("stage")

  private val filterFunnelSql =
    """WITH m AS (
      |  SELECT len(string_split(text, ' ')) AS n_tokens,
      |    length(replace(text, ' ', '')) AS n_alpha,
      |    string_split(text, ' ') AS toks
      |  FROM documents),
      |r AS (SELECT
      |    n_tokens BETWEEN 50 AND 100000 AS r1,
      |    CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0 AS r2,
      |    list_contains(toks, 'the') AND list_contains(toks, 'a') AS r3
      |  FROM m),
      |a AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
      |    CAST(sum(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS s3
      |  FROM r),
      |f AS (
      |  SELECT 1 AS stage, 'len' AS rule, n AS n_in, s1 AS n_out, n FROM a
      |  UNION ALL
      |  SELECT 2, 'word_len', s1, s2, n FROM a
      |  UNION ALL
      |  SELECT 3, 'stopword', s2, s3, n FROM a)
      |SELECT CAST(stage AS INT) AS stage, rule, n_in, n_out,
      |  n_in - n_out AS n_removed, n_out * 1.0 / n AS survival
      |FROM f ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- d67

  /** Corpus dup-mass report — the headline numbers a dedup paper (or a
    * curation review) publishes: how many documents and what TOKEN
    * share of the corpus is redundant, under exact dedup (d01's
    * keep-lowest-per-text) and under near-dup clustering (d13's
    * connected components), reported INDEPENDENTLY — exact dups are by
    * construction a subset of near-dup clusters, so the two measures
    * are not additive and are not summed. One row out.
    *
    * Scale shape: one corpus scan feeds the per-text group agg and the
    * 2-value total; the cluster side joins d13's assignment (pipeline
    * mode shares the persisted cluster frame) to per-doc token counts
    * — cluster count-sized aggs after that. Every exact group's
    * members share one text, hence one token count, so the redundant
    * token mass is (size−1)·tokens with no per-member bookkeeping; the
    * cluster keeper's tokens come from `min_by(n_tok, doc_id)` — the
    * keep-lowest discipline d29 applies, measured instead of applied.
    * Token shares are exact-integer divisions, unrounded.
    */
  def dupMassReport(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .selectExpr("doc_id", "text", "size(split(text,' ')) AS n_tok")
    val tot = d.agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val ex = d.groupBy("text")
      .agg(count(lit(1)).as("sz"), min("n_tok").as("tok1"))
      .agg(
        coalesce(sum(when(col("sz") > 1, col("sz") - 1)), lit(0L))
          .as("exact_redundant_docs"),
        coalesce(sum(when(col("sz") > 1, (col("sz") - 1) * col("tok1"))),
          lit(0L)).as("exact_redundant_tokens"))
    val nr = dupClusters(s, dir)
      .join(d.select("doc_id", "n_tok"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"), sum("n_tok").as("ctok"),
        expr("min_by(n_tok, doc_id)").as("keeptok"))
      .agg(count(lit(1)).as("n_clusters"),
        coalesce(sum(col("sz") - 1), lit(0L)).as("near_redundant_docs"),
        coalesce(sum(col("ctok") - col("keeptok")), lit(0L))
          .as("near_redundant_tokens"))
    tot.crossJoin(ex).crossJoin(nr)
      .selectExpr("n_docs", "n_tokens",
        "exact_redundant_docs", "exact_redundant_tokens",
        "exact_redundant_tokens * 1.0D / n_tokens AS exact_token_share",
        "n_clusters", "near_redundant_docs", "near_redundant_tokens",
        "near_redundant_tokens * 1.0D / n_tokens AS near_token_share")
  }

  private val dupMassReportSql =
    s"""WITH RECURSIVE $ccReachCte,
       |cl AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach
       |       GROUP BY doc_id),
       |d AS (SELECT doc_id, text, len(string_split(text,' ')) AS n_tok
       |      FROM documents),
       |tot AS (SELECT count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT)
       |          AS n_tokens FROM d),
       |eg AS (SELECT count(*) AS sz, min(n_tok) AS tok1 FROM d
       |       GROUP BY text),
       |ex AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN sz > 1 THEN sz - 1 END), 0)
       |      AS BIGINT) AS exact_redundant_docs,
       |    CAST(coalesce(sum(CASE WHEN sz > 1 THEN (sz - 1) * tok1 END), 0)
       |      AS BIGINT) AS exact_redundant_tokens
       |  FROM eg),
       |cg AS (SELECT cluster_id, count(*) AS sz, sum(n_tok) AS ctok,
       |         min_by(n_tok, d.doc_id) AS keeptok
       |       FROM cl JOIN d USING (doc_id) GROUP BY cluster_id),
       |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       |         CAST(coalesce(sum(sz - 1), 0) AS BIGINT)
       |           AS near_redundant_docs,
       |         CAST(coalesce(sum(ctok - keeptok), 0) AS BIGINT)
       |           AS near_redundant_tokens
       |       FROM cg)
       |SELECT n_docs, n_tokens, exact_redundant_docs, exact_redundant_tokens,
       |  exact_redundant_tokens * 1.0 / n_tokens AS exact_token_share,
       |  n_clusters, near_redundant_docs, near_redundant_tokens,
       |  near_redundant_tokens * 1.0 / n_tokens AS near_token_share
       |FROM tot, ex, nr""".stripMargin

  // ---------------------------------------------------------------- d69

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing KenLM ships and CCNet-style quality filters actually
    * run) — the top rung of the repo's LM-quality ladder: d23 add-one
    * unigram → d33 raw bigram → d64 stupid backoff (held-out) → THIS,
    * absolute discounting with the continuation-probability backoff
    * that makes KN the standard:
    *
    *   p_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *               + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··),  D = 0.75
    *
    * where N1+(w1·)/N1+(·w2) are distinct-successor/-predecessor type
    * counts and N1+(··) the bigram type total — "how many contexts has
    * w2 ever completed" rather than "how often has w2 occurred", the
    * correction that stops frequent-but-context-bound words (d33's
    * known failure on boilerplate) from looking probable everywhere.
    *
    * Scale shape = d33's discipline: every derived table (bigram
    * counts, per-w1 totals/types, per-w2 types) is vocab²-bounded and
    * joins BY KEY — never broadcast, the bigram keyspace is unbounded
    * at corpus scale; only the 1-row type total broadcasts. Scoring is
    * one pass over the corpus bigram stream + a doc-keyed
    * map-combinable mean. Every p is strictly positive by construction
    * (a scored bigram exists in the count table), so ln never sees 0.
    *
    * Determinism: p is exact-integer inputs through an IDENTICAL
    * arithmetic expression on both engines (same association order →
    * same IEEE result); the per-doc mean of ln carries the accepted
    * 6-dp posture (sum-order noise ~1e-13 vs the 5e-7 boundary).
    */
  def knBigramScore(s: SparkSession, dir: String): DataFrame = {
    val bigs = Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2))) AS b""".stripMargin)
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val cb = bigs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val byW1 = cb.groupBy("w1")
      .agg(sum("cb").as("cf"), count(lit(1)).as("n1f"))
    val byW2 = cb.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val types = cb.agg(count(lit(1)).as("n1tot"))
    bigs.join(cb, Seq("w1", "w2"))
      .join(byW1, Seq("w1"))
      .join(byW2, Seq("w2"))
      .crossJoin(broadcast(types))
      .selectExpr("doc_id",
        "greatest(cb - 0.75D, 0D) / cf + 0.75D * n1f / cf * (n1b / n1tot) AS p")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(log(col("p"))), 6).as("kn_xent"))
      .orderBy("doc_id")
  }

  private val knBigramScoreSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> {'w1': toks[i], 'w2': toks[i+1]})) AS e
      |      FROM t WHERE len(toks) >= 2),
      |bb AS (SELECT doc_id, e.w1 AS w1, e.w2 AS w2 FROM b),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bb GROUP BY w1, w2),
      |w1t AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cf, count(*) AS n1f
      |        FROM cb GROUP BY w1),
      |w2t AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY w2),
      |tt AS (SELECT count(*) AS n1tot FROM cb),
      |sc AS (SELECT doc_id,
      |         greatest(cb - 0.75, 0) / cf + 0.75 * n1f / cf * (n1b / n1tot) AS p
      |       FROM bb JOIN cb USING (w1, w2) JOIN w1t USING (w1)
      |            JOIN w2t USING (w2) CROSS JOIN tt)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(-avg(ln(p)), 6) AS kn_xent
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d71

  /** Source-overlap duplication matrix — WHERE the near-dup mass lives:
    * d67 reports the corpus-level redundancy share; this breaks the d05
    * pair set down by (source, source) cell, the provenance view that
    * tells a curation run which feeds restate which (mirror sites, cross-
    * posted content, scraper echo between crawls). Emits per unordered
    * source pair the dup-pair count, the distinct docs involved, and the
    * cell's share of all dup pairs.
    *
    * Scale shape: the pair frame is the registry-shared d05 subtree
    * (computed once in pipeline mode); each side then joins the slim
    * (doc_id, source) projection UNHINTED — row-narrow but corpus-ROW-
    * COUNT sized, so a forced broadcast would collect the whole doc
    * dimension to the driver at 100 TB. AQE broadcasts it at small SF
    * and keeps a shuffle join at scale, where the PAIR frame (dup pairs,
    * not docs) is the bounded side — d72's vector-side posture. The
    * matrix itself is bounded by |sources|², so every aggregation after
    * the joins lands on a tiny key space. The
    * distinct-doc count is a second aggregation over the exploded pair
    * ends rather than a collect_set payload, keeping agg state bounded
    * per QueryDef's no-unbounded-buffers discipline.
    */
  def sourceOverlapMatrix(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardDupPairs(s, dir).select("doc_id_1", "doc_id_2")
    val src = Tables.documents(s, dir).select("doc_id", "source")
    val m = pairs
      .join(src.select(col("doc_id").as("doc_id_1"),
        col("source").as("s1")), "doc_id_1")
      .join(src.select(col("doc_id").as("doc_id_2"),
        col("source").as("s2")), "doc_id_2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"),
        col("doc_id_1"), col("doc_id_2"))
    val np = m.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
    val nd = m.select(col("source_a"), col("source_b"),
        explode(array(col("doc_id_1"), col("doc_id_2"))).as("d"))
      .groupBy("source_a", "source_b")
      .agg(countDistinct("d").as("n_docs"))
    val tot = np.agg(sum("n_pairs").as("tot_pairs"))
    np.join(nd, Seq("source_a", "source_b"))
      .crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"), col("n_docs"),
        (col("n_pairs") * lit(1.0) / col("tot_pairs")).as("pair_share"))
      .orderBy("source_a", "source_b")
  }

  private val sourceOverlapMatrixSql =
    s"""WITH $shingleSqlCte,
       |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       |       FROM s a JOIN s b ON a.doc_id < b.doc_id
       |       WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |sm AS (SELECT least(x.source, y.source) AS source_a,
       |              greatest(x.source, y.source) AS source_b, d1, d2
       |       FROM pr JOIN documents x ON pr.d1 = x.doc_id
       |               JOIN documents y ON pr.d2 = y.doc_id),
       |np AS (SELECT source_a, source_b, count(*) AS n_pairs
       |       FROM sm GROUP BY source_a, source_b),
       |nd AS (SELECT source_a, source_b, count(DISTINCT d) AS n_docs
       |       FROM (SELECT source_a, source_b, unnest([d1, d2]) AS d FROM sm)
       |       GROUP BY source_a, source_b),
       |tp AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tot FROM np)
       |SELECT source_a, source_b, n_pairs, n_docs,
       |  n_pairs * 1.0 / tot AS pair_share
       |FROM np JOIN nd USING (source_a, source_b) CROSS JOIN tp
       |ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------- d72

  /** Hashed bag-of-ngrams cosine near-dup pairs — the WEIGHTED sparse
    * companion to d05's set-based Jaccard: docs become 4096-bucket
    * BIGRAM-frequency vectors via the hashing trick (feature hashing,
    * Weinberger et al. 2009) with the portable `md5_long60` bucket hash,
    * and pair similarity is cosine over those sparse vectors — "same
    * n-grams at the same RATES", where the shingle-set view only asks
    * "same n-grams at all". On this corpus the two agree on WHICH pairs
    * are dups (DedupSpec pins pair-set equality with d05) while scoring
    * a different geometry (multiset rates, d33's LM space).
    *
    * Scale shape — the AllPairs prefix-filtered similarity join
    * (Bayardo et al., WWW 2007) over the classic exploded (doc, bucket,
    * tf) posting representation. The naive formulation (self-join ON
    * BUCKET + per-pair tf-product sum) costs Σ_b df(b)² join rows —
    * 73M at sf0.1 on this degenerate-dense synthetic vocabulary (931
    * live bigram buckets over 5000 docs), WORSE than the 12.5M brute
    * pairs, and measured 17.5 s. The prefix filter is lossless for the
    * ≥ 0.9 gate: order every doc's features by one GLOBAL rare-first
    * key (df ASC, bucket ASC) and index only the leading features until
    * the remaining tail norm drops below t — then any pair with
    * cos ≥ t must share its globally-earliest common feature in BOTH
    * prefixes (if that feature were outside either side's prefix, every
    * shared feature would sit in that side's suffix and Cauchy-Schwarz
    * caps the dot at ‖suffix‖ < t). Candidates therefore come from a
    * prefix×prefix join (11.4M rows → 4.3M distinct pairs here; on a
    * real Zipf vocabulary prefixes are the RARE features and this
    * collapses further), and each candidate is exact-verified by the
    * codegen'd [[graft.functions.SparseDot]] merge-intersect over the
    * doc's sorted posting arrays — O(|a|+|b|) per pair, no index
    * re-join. The prefix cut is pure INTEGER arithmetic, and its
    * threshold is the EFFECTIVE one the rounded gate admits: the final
    * filter keeps round(cos, 6) ≥ 0.9, which admits true cosines down
    * to t = 0.8999995 (half-up), so a cut at 0.9 exactly would be lossy
    * for a pair in [0.8999995, 0.9) — present in the naive-join oracle,
    * not guaranteed to collide in the prefixes. The cut therefore uses
    * 10⁵·tail² ≥ 80999·‖v‖² ⟺ tail ≥ √0.80999·‖v‖, and
    * 0.80999 < t² = 0.80999910000025 makes the prefix (negligibly)
    * longer than the exact-t cut — lossless for EVERY admissible pair,
    * still bit-identical on any engine, and overflow-safe (s2 ≤ 10¹³
    * before the 10⁵ scale hits int64). The doc-vector side carries no
    * broadcast hint — AQE broadcasts it at this SF (≈4 MB) and keeps a
    * shuffle join at corpus scale, where the candidate set (not the
    * vector table) is the small side. All floats: tf products and dots
    * are exact ints; norms are sqrt of int sums; cosine =
    * int / (sqrt·sqrt) — one irrational op chain, 6-dp display rounding
    * (QueryDef rule 6), ≥ 0.9 threshold on the rounded value. The
    * DuckDB oracle keeps the NAIVE posting-join formulation — an
    * algorithm-independent witness that the prefix filter drops no
    * pair; DedupSpec pins the same equivalence against a driver
    * brute-force recompute.
    */
  def sparseCosineDupPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // Four consumers (df, prefix self-join sides, vector arrays) over the
    // tokenize+hash+agg subtree — registry contract: persist, no unpersist
    // here, Verify/Bench clearCache() between queries (q31's ownership).
    val posts = Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS g""".stripMargin)
      .selectExpr("doc_id", "pmod(md5_long60(g), 4096) AS b")
      .groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfr = posts.groupBy("b").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id")
    val wTail = Window.partitionBy("doc_id").orderBy("df", "b")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = posts.join(broadcast(dfr), "b")
      .withColumn("s2", sum(col("tf") * col("tf")).over(wDoc))
      .withColumn("tail2", sum(col("tf") * col("tf")).over(wTail))
      .filter(col("tail2") * 100000L >= col("s2") * 80999L)
      .select("doc_id", "b")
    // candidate pairs via a prefix×prefix self-join. The posting-list
    // kernel (d05's shape) was tried and MEASURED WORSE here (6.8-12.5 s
    // vs ~5-7 s): on this hashed-bucket space the heavy prefix buckets
    // hold hundreds of docs, and a collect_list + pair_explode
    // concentrates each bucket's df² pair generation in ONE task, where
    // the join spreads the same pair volume across join partitions. The
    // kernel wins when lists are bounded (d39's cap, q46's baskets,
    // d74's near-unique band keys); an unbounded skewed key space is the
    // join's territory.
    val cand = prefix.select(col("doc_id").as("da"), col("b"))
      .join(prefix.select(col("doc_id").as("db"), col("b")), Seq("b"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val vecArr = posts.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("b"), col("tf")))).as("kv"))
      .select(col("doc_id"),
        expr("transform(kv, x -> x.b)").as("ks"),
        expr("transform(kv, x -> x.tf)").as("vs"),
        expr("aggregate(kv, 0L, (acc, x) -> acc + x.tf * x.tf)").as("s2"))
    cand
      .join(vecArr.select(col("doc_id").as("da"), col("ks").as("ka"),
        col("vs").as("va"), col("s2").as("sa")), "da")
      .join(vecArr.select(col("doc_id").as("db"), col("ks").as("kb"),
        col("vs").as("vb"), col("s2").as("sb")), "db")
      .select(col("da").as("doc_id_1"), col("db").as("doc_id_2"),
        round(expr("sparse_dot(ka, va, kb, vb)") /
          (sqrt(col("sa")) * sqrt(col("sb"))), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.9)
      .orderBy("doc_id_1", "doc_id_2")
  }

  private val sparseCosineDupPairsSql =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
      |       FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(toks)),
      |           i -> toks[i] || ' ' || toks[i+1])) AS g
      |       FROM tk WHERE len(toks) >= 2),
      |p AS (SELECT doc_id,
      |        ('0x' || substr(md5(g), 1, 15))::BIGINT % 4096 AS b
      |      FROM bg),
      |tfv AS (SELECT doc_id, b, count(*) AS tf FROM p GROUP BY doc_id, b),
      |nrm AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm
      |        FROM tfv GROUP BY doc_id),
      |dots AS (SELECT a.doc_id AS da, c.doc_id AS db,
      |           CAST(sum(a.tf * c.tf) AS BIGINT) AS dot
      |         FROM tfv a JOIN tfv c ON a.b = c.b AND a.doc_id < c.doc_id
      |         GROUP BY da, db)
      |SELECT da AS doc_id_1, db AS doc_id_2,
      |  round(dot / (x.nrm * y.nrm), 6) AS cos_sim
      |FROM dots JOIN nrm x ON da = x.doc_id JOIN nrm y ON db = y.doc_id
      |WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.9
      |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ---------------------------------------------------------------- d68

  /** Intra-document repetition REMOVAL — the applied-rewrite complement
    * of d19's repetition *signals* (the same split d46→d48 makes for the
    * cross-doc substring family): each document's token stream is cut
    * into fixed 8-token chunks and only the FIRST occurrence of each
    * distinct chunk survives, in order — the "dedupe the document against
    * itself" pass (Rae et al. 2021 §A.1.1's repetition gates, applied
    * instead of merely scored) that precedes cross-doc dedup in a
    * training-data pipeline, because intra-doc loops (boilerplate
    * headers, scraper echo, degenerate generation) otherwise inflate
    * every downstream frequency signal.
    *
    * Scale shape — ZERO shuffle: the whole rewrite is higher-order array
    * functions over one `documents` scan (split → chunk via
    * transform/slice → keep-first via `filter`'s (element, index) lambda
    * against `array_position`, which returns the FIRST match). No
    * explode, no window, no regroup: every row finishes where it was
    * read, so at 100 TB this is a map-only pass at full scan bandwidth.
    * The keep-first probe is O(c²) per doc in its CHUNK count c =
    * ⌈tokens/8⌉ — bounded and local (a 2048-token web doc is c=256 →
    * 65k in-memory compares); a corpus of book-length outliers would
    * switch to the d48-style posexplode + min-pos window at the cost of
    * the doc_id shuffle this formulation exists to avoid.
    */
  def intraDocChunkDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text,' ') AS toks")
      .selectExpr("doc_id",
        """transform(sequence(0, CAST(ceil(size(toks) / 8.0) AS INT) - 1),
          |  b -> concat_ws(' ', slice(toks, b * 8 + 1, 8))) AS chunks""".stripMargin)
      .selectExpr("doc_id", "size(chunks) AS n_chunks",
        "filter(chunks, (c, i) -> array_position(chunks, c) = i + 1) AS kept")
      .selectExpr("doc_id", "n_chunks", "size(kept) AS n_kept",
        "round(1.0D - size(kept) * 1.0D / n_chunks, 6) AS dropped_frac",
        "concat_ws(' ', kept) AS cleaned_text")
      .orderBy("doc_id")

  // Same keep-first semantics in list ops: filtering a range() list keeps
  // DuckDB's lambda index-free (the elements ARE the 1-based indices),
  // and list_position — like array_position — resolves to the first match.
  private val intraDocChunkDedupSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |c AS (SELECT doc_id,
      |        list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
      |          b -> array_to_string(toks[(b*8+1):(b*8+8)], ' ')) AS chunks
      |      FROM t),
      |k AS (SELECT doc_id, chunks,
      |        list_transform(
      |          list_filter(range(1, len(chunks) + 1),
      |            i -> list_position(chunks, chunks[i]) = i),
      |          i -> chunks[i]) AS kept
      |      FROM c)
      |SELECT doc_id, len(chunks) AS n_chunks, len(kept) AS n_kept,
      |  round(1.0 - len(kept) * 1.0 / len(chunks), 6) AS dropped_frac,
      |  array_to_string(kept, ' ') AS cleaned_text
      |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d73

  /** Filter-threshold sensitivity sweep — the knob audit a curation
    * pipeline runs BEFORE committing to a quality rule: d03 fixes its
    * stopword-ratio floor at 0.05, but how much corpus does each choice
    * of floor actually cost? For a 9-point grid of floors (0 … 16% in
    * 2-point steps, expressed in integer basis points so the comparison
    * `n_stop·10000 ≥ bp·n_tokens` never touches a float) this reports
    * the surviving doc count, doc share, and — the number that matters
    * for training budgets — the surviving TOKEN share. A cliff between
    * adjacent grid points is the signal the rule is load-bearing and
    * needs review; a flat segment means the knob is free there.
    *
    * Scale shape: the per-doc stat projection is computed once from one
    * `documents` scan, then cross-joined with the BROADCAST 9-row grid —
    * the 9× row inflation is of a slim (int, int) projection and feeds a
    * map-side-combining 9-group aggregate, so the shuffle carries 9 rows
    * per input partition regardless of corpus size. Floats: all counts
    * and comparisons are exact integer arithmetic; the shares are one
    * int/int division each (QueryDef rule 3), emitted unrounded.
    */
  def thresholdSensitivity(s: SparkSession, dir: String): DataFrame = {
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    val docs = Tables.documents(s, dir)
      .selectExpr("doc_id",
        "CAST(size(split(text,' ')) AS BIGINT) AS n_tokens",
        s"CAST(size(filter(split(text,' '), t -> array_contains($stopArr, t))) AS BIGINT) AS n_stop")
    val grid = s.range(0, 9).select((col("id") * 200).as("min_stop_bp"))
    val pass = col("n_tokens").between(20, 400) &&
      col("n_stop") * 10000L >= col("min_stop_bp") * col("n_tokens")
    docs.crossJoin(broadcast(grid))
      .groupBy("min_stop_bp")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(pass, 1L).otherwise(0L)).as("n_pass"),
        sum(when(pass, col("n_tokens")).otherwise(0L)).as("tokens_pass"),
        sum("n_tokens").as("tokens_total"))
      .selectExpr("min_stop_bp", "n_pass", "n_docs",
        "n_pass * 1.0D / n_docs AS doc_share",
        "tokens_pass", "tokens_pass * 1.0D / tokens_total AS token_share")
      .orderBy("min_stop_bp")
  }

  private val thresholdSensitivitySql = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH d AS (SELECT doc_id,
       |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |        CAST(len(list_filter(string_split(text,' '),
       |          t -> list_contains($stopList, t))) AS BIGINT) AS n_stop
       |      FROM documents),
       |g AS (SELECT CAST(200 * g AS BIGINT) AS min_stop_bp
       |      FROM generate_series(0, 8) t(g)),
       |x AS (SELECT min_stop_bp, n_tokens,
       |        CAST(n_tokens BETWEEN 20 AND 400
       |          AND n_stop * 10000 >= min_stop_bp * n_tokens AS INT) AS ok
       |      FROM d CROSS JOIN g)
       |SELECT min_stop_bp, CAST(sum(ok) AS BIGINT) AS n_pass,
       |  count(*) AS n_docs,
       |  sum(ok) * 1.0 / count(*) AS doc_share,
       |  CAST(sum(CASE WHEN ok = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS tokens_pass,
       |  sum(CASE WHEN ok = 1 THEN n_tokens ELSE 0 END) * 1.0 / sum(n_tokens)
       |    AS token_share
       |FROM x GROUP BY min_stop_bp ORDER BY min_stop_bp""".stripMargin
  }

  // ---------------------------------------------------------------- d74

  /** LSH banding configs under audit: (bands, rows) with bands·rows = 16
    * permutations — public so the spec pins the same grid. */
  val BandConfigs: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2))

  /** d74's 16 affine MinHash permutations π_p(x) = (a·x + b) mod P over
    * the md5_long60 base hash, P prime < 2³⁰ so every product stays
    * < 2⁶⁰ — exact in int64 on BOTH engines (DuckDB errors on BIGINT
    * overflow rather than wrapping, so the bound is load-bearing).
    * Hashing the shingle ONCE and permuting arithmetically replaces 16
    * md5 evaluations per shingle instance with one md5 + 16 integer
    * ops — measured 8.7 s → the md5 pass was the whole query. The
    * (a, b) constants are fixed arbitrary odd values; (a·x + b) mod P
    * with a ≠ 0 is a bijection on [0, P), which is all a banding audit
    * needs from its permutation family. */
  private[ext] val MinhashP = 1073741789L
  private[ext] val MinhashAB: Seq[(Long, Long)] = Seq(
    (387420489L, 565656565L), (268435399L, 891891891L),
    (536870909L, 123456789L), (715827883L, 987654321L),
    (402653189L, 314159265L), (805306457L, 271828183L),
    (160481219L, 414213563L), (905060539L, 173205081L),
    (322122547L, 577215665L), (644245093L, 693147181L),
    (229345007L, 602214076L), (458690013L, 662607015L),
    (687935021L, 137035999L), (917180027L, 299792459L),
    (114572407L, 160217663L), (573370019L, 522807763L))

  /** LSH band-sensitivity audit — the S-curve measurement that picks
    * d06's banding BEFORE anyone trusts it at corpus scale: for each
    * (b bands × r rows) split of a 16-permutation MinHash signature,
    * the candidate pairs the banding generates, how many of the exact
    * near-dup pairs (d05, J ≥ 0.5) it detects, precision/recall, and
    * the textbook detection probability at the threshold,
    * p = 1 − (1 − τ^r)^b at τ = 0.5 (Leskovec/Rajaraman/Ullman ch. 3).
    * Few rows per band → high recall, low precision (more verify work);
    * many rows → the reverse. d61 audits the ESTIMATOR these bands are
    * built from; this audits the BANDING decision itself — together
    * they are the full pre-deployment checklist for the 100 TB dedup
    * path.
    *
    * Portability: the shingle hashes ONCE through the cross-engine
    * `md5_long60` (d61's trick), then each of the 16 permutations is
    * the exact affine map [[MinhashAB]] over that base — bit-identical
    * int64 arithmetic on both engines, 16× fewer md5 evaluations than
    * hashing per (perm, shingle) (production keeps d06's faster
    * xxhash64 family; the audit exists to put the banding under the
    * hash gate). The theory column is an exact binary rational —
    * 1 − (2^r − 1)^b / 2^16, a power-of-two division of an exact
    * integer — interpolated into both engines as the same integer
    * arithmetic, so it is emitted unrounded.
    *
    * Scale shape: the signature pass is corpus-wide BY DESIGN (unlike
    * d61's pair-restricted audit, candidate generation is the thing
    * being measured) — one shingle explode, one md5 per instance, 16
    * WIDE min-aggregate buffers over that single stream (d06's
    * measured signature formulation — no perm-grid crossJoin, so the
    * shingle stream is never multiplied 16× pre-aggregation), persisted
    * once for the three configs. Each config derives its band keys by
    * PROJECTION off the wide signature row (stack + concat in p order)
    * and pays only the (band, key) posting-list aggregate — the same
    * join volume d06's production banding pays. Candidate/detect
    * counts reduce through ONE left-join aggregate per config (never
    * two passes over the candidate set).
    */
  def lshBandSensitivity(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val sh = Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"))
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3)))) AS shs""".stripMargin)
    // WIDE signature aggregation (guide §2.3 "aggregate before you
    // shuffle" / §2.4): one min-aggregate column per permutation over the
    // single exploded shingle stream, instead of the former broadcast
    // crossJoin with the 16-row perm grid — which multiplied every
    // shingle instance 16× BEFORE the (doc_id, p) aggregation (16× the
    // rows through partial agg and 16 rows/doc through the exchange).
    // Same arithmetic ((h0·a+b) mod P per permutation, constants folded),
    // same mins; and since the fanOut above already hash-partitioned by
    // doc_id, the groupBy(doc_id) reuses that exchange outright.
    // registry contract: persist, no unpersist here — Verify/Bench
    // clearCache() between queries (q31's documented ownership model)
    val minCols = MinhashAB.zipWithIndex.map { case ((a, b), p) =>
      min(expr(s"(h0 * ${a}L + ${b}L) % ${MinhashP}L")).as(s"m$p")
    }
    val sigs = sh.selectExpr("doc_id", "explode(shs) AS g")
      .selectExpr("doc_id", s"md5_long60(g) % ${MinhashP}L AS h0")
      .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = jaccardDupPairs(s, dir)
      .select(col("doc_id_1").as("d1"), col("doc_id_2").as("d2"))
      .localCheckpoint() // one side per config + the n_true scalar
    val nTrue = exact.agg(count(lit(1)).as("n_true"))
    // ONE pass for all three configs (guide §1.2 step 1 — merge passes;
    // measured: the per-config round trio of groupBy + distinct + join
    // dominated d74 locally after the wide-signature rewrite). The
    // config-tagged band frames union into a single (nb, rpb, band,
    // key) posting aggregate, ONE pair distinct, ONE left join — same
    // total rows through the shuffle as three rounds, a third of the
    // barriers, and one pass over the cached signature frame. Band keys
    // stay pure projection off the wide signature row (concat in p
    // order is the same "m,m,.." key by construction). The 3-row config
    // anchor left-joins the grouped counts so a zero-candidate config
    // still emits its row with the per-config empty-aggregate semantics
    // (n_candidates 0, n_detected null) the old per-config agg had.
    val bandsAll = BandConfigs.map { case (b, r) =>
      sigs.selectExpr(s"$b AS nb", s"$r AS rpb", "doc_id",
        s"stack($b, ${(0 until b).map { i =>
          val ms = (i * r until (i + 1) * r)
            .map(p => s"CAST(m$p AS STRING)").mkString(", ")
          s"$i, concat_ws(',', $ms)"
        }.mkString(", ")}) AS (band, key)")
    }.reduce(_ unionByName _)
    // posting-list pair generation (d05's kernel): the bucket index is
    // built ONCE per config tag and pairs stream lazily from sorted doc
    // lists — a (band, key) self-join would compute the band aggregate
    // per side and shuffle the wider of the two
    val cand = bandsAll.groupBy("nb", "rpb", "band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .selectExpr("nb", "rpb", pairExplode)
      .select(col("nb"), col("rpb"), col("x").as("d1"), col("y").as("d2"))
      .distinct()
    val counts = cand
      .join(exact.withColumn("hit", lit(1L)), Seq("d1", "d2"), "left")
      .groupBy("nb", "rpb")
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("hit"), lit(0L))).as("n_detected"))
    // exact binary rational: num = (2^r − 1)^b, p_detect = 1 − num/2^16
    val anchor = BandConfigs
      .map { case (b, r) => (b, r, Iterator.fill(b)((1L << r) - 1).product) }
      .toDF("nb", "rpb", "num")
    anchor.join(counts, Seq("nb", "rpb"), "left")
      .crossJoin(broadcast(nTrue))
      .select(col("nb").as("n_bands"), col("rpb").as("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("n_detected"), col("n_true"),
        (col("n_detected") * lit(1.0)
          / coalesce(col("n_candidates"), lit(0L))).as("detect_precision"),
        (col("n_detected") * lit(1.0) / col("n_true")).as("detect_recall"),
        (lit(1.0) - col("num") / lit(65536.0)).as("p_detect_at_tau"))
      .orderBy("rows_per_band")
  }

  private val lshBandSensitivitySql = {
    val cfgRows = BandConfigs.map { case (b, r) =>
      val num = Iterator.fill(b)((1L << r) - 1).product
      s"($b, $r, $num)"
    }.mkString(", ")
    val permRows = MinhashAB.zipWithIndex
      .map { case ((a, b), p) => s"($p, ${a}, ${b})" }.mkString(", ")
    s"""WITH $shingleSqlCte,
       |pp AS (SELECT * FROM (VALUES $permRows) AS t(p, pa, pb)),
       |h0 AS (SELECT doc_id,
       |         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
       |           % $MinhashP AS h0
       |       FROM (SELECT doc_id, unnest(sh) AS g FROM s)),
       |sig AS (SELECT doc_id, pp.p,
       |          min((h0 * pp.pa + pp.pb) % $MinhashP) AS m
       |        FROM h0 CROSS JOIN pp
       |        GROUP BY doc_id, pp.p),
       |ex AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       |       FROM s a JOIN s b ON a.doc_id < b.doc_id
       |       WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |          >= 0.5),
       |nt AS (SELECT count(*) AS n_true FROM ex),
       |cfg AS (SELECT * FROM (VALUES $cfgRows) AS t(nb, rpb, num)),
       |bnd AS (SELECT nb, rpb, doc_id, p // rpb AS band,
       |          string_agg(CAST(m AS VARCHAR), ',' ORDER BY p) AS bkey
       |        FROM sig CROSS JOIN cfg
       |        GROUP BY nb, rpb, doc_id, band),
       |cand AS (SELECT DISTINCT x.nb, x.rpb, x.doc_id AS d1, y.doc_id AS d2
       |         FROM bnd x JOIN bnd y ON x.nb = y.nb AND x.rpb = y.rpb
       |           AND x.band = y.band AND x.bkey = y.bkey
       |           AND x.doc_id < y.doc_id),
       |st AS (SELECT nb, rpb, count(*) AS n_candidates,
       |         CAST(sum(CASE WHEN ex.d1 IS NOT NULL THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_detected
       |       FROM cand LEFT JOIN ex ON cand.d1 = ex.d1 AND cand.d2 = ex.d2
       |       GROUP BY nb, rpb)
       |SELECT cfg.nb AS n_bands, cfg.rpb AS rows_per_band, n_candidates,
       |  n_detected, n_true,
       |  n_detected * 1.0 / n_candidates AS detect_precision,
       |  n_detected * 1.0 / n_true AS detect_recall,
       |  1.0 - cfg.num / 65536.0 AS p_detect_at_tau
       |FROM st JOIN cfg ON st.nb = cfg.nb AND st.rpb = cfg.rpb
       |CROSS JOIN nt
       |ORDER BY rows_per_band""".stripMargin
  }

  // ---------------------------------------------------------------- d76

  /** d76's signature widths — prefixes of one 64-permutation family. */
  val MinhashWidths: Seq[Int] = Seq(16, 32, 64)

  /** MinHash signature-WIDTH sweep — the third LSH knob audited (d61
    * audits the estimator at one width, d74 the banding of one
    * signature; this sweeps how many permutations the signature buys):
    * per width w ∈ {16, 32, 64}, the bias, mean absolute error and RMSE
    * of the w-permutation Jaccard estimate against the exact Jaccard of
    * every audited pair. Theory says per-pair σ = √(J(1−J)/w) — RMSE
    * should fall ≈ √2 per doubling, and the measured table is what
    * justifies paying 64 longs/doc instead of 16 at 100 TB (or not).
    *
    * ONE signing pass serves every width: the widths are PREFIXES of a
    * single 64-permutation family, so estimate(w) = matches among the
    * first w permutations / w — three row-local prefix folds over the
    * packed signature arrays, no re-signing (the signature itself is 64
    * wide min buffers over one exploded stream — d06's measured
    * formulation, no perm-grid crossJoin). The permutation family is formulaic
    * (aₚ = 387420489·(2p+1) mod P, bₚ = 565656565·(p+1) mod P over the
    * md5 base — both engines derive it from p directly), products
    * bounded < 2⁶⁰ (d74's overflow discipline). Signing is
    * pair-restricted (d61's audit posture: only docs in an audited
    * pair are signed — corpus-wide signing to check 1k pairs would be
    * absurd at scale). Floats: estimates are k/w exact binary
    * rationals, err/bias are row arithmetic on exact inputs; the
    * per-width means/RMSE aggregate pair-count-many such values (sum
    * order differs across engines) — 6-dp display rounding (rule 6).
    */
  def minhashWidthSweep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val pairs = jaccardDupPairs(s, dir).localCheckpoint()
    val pairDocs = pairs
      .select(explode(array(col("doc_id_1"), col("doc_id_2"))).as("doc_id"))
      .distinct()
    // cut first, spread survivors — d61's rationale (the exchange must
    // not carry the whole corpus text past the broadcast cut, and the
    // fanOut partition probe would re-execute the pair subtree)
    val sh = Tables.spread(Tables.documents(s, dir).select("doc_id", "text")
        .join(broadcast(pairDocs), "doc_id"))
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3)))) AS shs""".stripMargin)
    // WIDE signature (d74's rewrite, at width 64): 64 min-aggregate
    // columns over ONE pass of the exploded shingle stream, packed into
    // a p-ordered array — the former broadcast crossJoin with the 64-row
    // perm grid multiplied every shingle instance 64× before the
    // (doc_id, p) aggregation, and the long-format signature then paid
    // two 64-rows-per-doc keyed joins. The affine constants fold at plan
    // time (aₚ = 387420489·(2p+1) mod P, bₚ = 565656565·(p+1) mod P —
    // the identical runtime arithmetic).
    val minCols = (0 until 64).map { p =>
      val a = (387420489L * (2 * p + 1)) % MinhashP
      val b = (565656565L * (p + 1)) % MinhashP
      min(expr(s"(h0 * ${a}L + ${b}L) % ${MinhashP}L")).as(s"m$p")
    }
    val sigs = sh.selectExpr("doc_id", "explode(shs) AS g")
      .selectExpr("doc_id", s"md5_long60(g) % ${MinhashP}L AS h0")
      .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .selectExpr("doc_id",
        s"array(${(0 until 64).map(p => s"m$p").mkString(", ")}) AS ms")
      .localCheckpoint() // both sides of the pair join
    // prefix-match counts are row-local array folds over the two packed
    // signatures (element i == permutation i on both engines' p order)
    def kw(n: Int) =
      s"""aggregate(sequence(0, ${n - 1}), 0L,
         |  (acc, i) -> acc + IF(ms1[i] = ms2[i], 1L, 0L)) AS k$n""".stripMargin
    val ks = pairs
      .join(sigs.select(col("doc_id").as("doc_id_1"), col("ms").as("ms1")),
        "doc_id_1")
      .join(sigs.select(col("doc_id").as("doc_id_2"), col("ms").as("ms2")),
        "doc_id_2")
      .selectExpr("doc_id_1", "doc_id_2", "jaccard",
        kw(16), kw(32), kw(64))
    // ONE aggregate for all three widths (guide §1.2 — merge passes):
    // the per-width map re-ran the ks join subtree once per width; the
    // twelve sums land in one row and stack() reshapes it to the same
    // three rows (identical per-width arithmetic: est = k_w / w)
    val sums = MinhashWidths.flatMap { w =>
      val est = col(s"k$w") / lit(w.toDouble)
      Seq(round(sum(est - col("jaccard")), 6).as(s"sb$w"),
        round(sum(abs(est - col("jaccard"))), 6).as(s"sa$w"),
        round(sum((est - col("jaccard")) * (est - col("jaccard"))), 6)
          .as(s"sq$w"))
    }
    val agg1 = ks.agg(count(lit(1)).as("n_pairs"), sums: _*)
    agg1
      .selectExpr("n_pairs",
        s"stack(${MinhashWidths.size}, ${MinhashWidths.map(w =>
          s"$w, sb$w, sa$w, sq$w").mkString(", ")}) AS (n_perms, sb, sa, sq)")
      .select(col("n_perms"), col("n_pairs"),
        (col("sb") / col("n_pairs")).as("mean_bias"),
        (col("sa") / col("n_pairs")).as("mean_abs_err"),
        round(sqrt(col("sq") / col("n_pairs")), 6).as("rmse"))
      .orderBy("n_perms")
  }

  private val minhashWidthSweepSql = {
    val widthRows = MinhashWidths.map(w => s"($w)").mkString(", ")
    s"""WITH $shingleSqlCte,
       |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    len(list_intersect(a.sh, b.sh)) * 1.0
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      AS jaccard
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      >= 0.5),
       |pd AS (SELECT DISTINCT doc_id FROM
       |       (SELECT d1 AS doc_id FROM pairs
       |        UNION ALL SELECT d2 FROM pairs)),
       |h0 AS (SELECT s.doc_id,
       |         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
       |           % $MinhashP AS h0
       |       FROM (SELECT doc_id, unnest(sh) AS g FROM s) s
       |       JOIN pd ON s.doc_id = pd.doc_id),
       |sig AS (SELECT doc_id, pp.p,
       |          min((h0 * ((387420489 * (2 * pp.p + 1)) % $MinhashP)
       |            + (565656565 * (pp.p + 1)) % $MinhashP) % $MinhashP)
       |            AS m
       |        FROM h0 CROSS JOIN (SELECT unnest(range(0, 64)) AS p) pp
       |        GROUP BY doc_id, pp.p),
       |ks AS (SELECT p.d1, p.d2, p.jaccard,
       |         CAST(sum(CASE WHEN s1.m = s2.m AND s1.p < 16
       |           THEN 1 ELSE 0 END) AS BIGINT) AS k16,
       |         CAST(sum(CASE WHEN s1.m = s2.m AND s1.p < 32
       |           THEN 1 ELSE 0 END) AS BIGINT) AS k32,
       |         CAST(sum(CASE WHEN s1.m = s2.m
       |           THEN 1 ELSE 0 END) AS BIGINT) AS k64
       |       FROM pairs p
       |       JOIN sig s1 ON s1.doc_id = p.d1
       |       JOIN sig s2 ON s2.doc_id = p.d2 AND s2.p = s1.p
       |       GROUP BY p.d1, p.d2, p.jaccard),
       |cfg AS (SELECT * FROM (VALUES $widthRows) AS t(w)),
       |est AS (SELECT w, jaccard,
       |          (CASE w WHEN 16 THEN k16 WHEN 32 THEN k32
       |            ELSE k64 END) / (w * 1.0) AS est
       |        FROM ks CROSS JOIN cfg)
       |SELECT w AS n_perms, count(*) AS n_pairs,
       |  round(sum(est - jaccard), 6) / count(*) AS mean_bias,
       |  round(sum(abs(est - jaccard)), 6) / count(*) AS mean_abs_err,
       |  round(sqrt(round(sum((est - jaccard) * (est - jaccard)), 6)
       |    / count(*)), 6) AS rmse
       |FROM est GROUP BY w ORDER BY n_perms""".stripMargin
  }

  // ---------------------------------------------------------------- d75

  /** Source × language independence audit — Pearson's chi-square over
    * the (source, lang) contingency table: does language composition
    * depend on source? A large standardized residual on one cell
    * localizes the finding (a monolingual crawl, a mislabeling
    * scraper) the way d59's JSD localizes vocabulary drift; together
    * they are the metadata-level and content-level halves of the same
    * provenance review. Emits every cell with observed, expected
    * (under independence), and the standardized residual
    * (O−E)/√E, plus the table-wide χ² and degrees of freedom.
    *
    * Scale shape: ONE map-side-combining (source, lang) count over the
    * metadata columns (text is never read — the heavy-column sweep
    * pins it), margins and the 1-row total derive from the
    * |sources|×|langs|-bounded cell frame and broadcast back. Floats:
    * E = (row·col)/N is one double-promoted product of exact ints over
    * an exact int; residual and χ² involve √E (irrational — rule 6),
    * so both carry 6-dp display rounding; the χ² cell sum order
    * differs across engines, same rule.
    */
  def sourceLangIndependence(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy("source").agg(sum("o").as("row_n"))
    val colM = cells.groupBy("lang").agg(sum("o").as("col_n"))
    val tot = cells.agg(sum("o").as("n"),
      ((countDistinct("source") - 1) * (countDistinct("lang") - 1))
        .as("dof"))
    // the full margin grid, not just observed cells: an ABSENT
    // (source, lang) combination still contributes E to the statistic
    // ((0 − E)²/E = E) — summing observed cells only would undercount
    val scored = rowM.crossJoin(broadcast(colM))
      .join(cells, Seq("source", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("row_n") * lit(1.0) * col("col_n") / col("n"))
      .withColumn("cellchi", (col("o") - col("e")) * (col("o") - col("e"))
        / col("e"))
    val chi2 = scored.agg(round(sum("cellchi"), 6).as("chi2"))
    scored.crossJoin(broadcast(chi2))
      .select(col("source"), col("lang"), col("o").as("observed"),
        round(col("e"), 6).as("expected"),
        round((col("o") - col("e")) / sqrt(col("e")), 6).as("std_residual"),
        col("chi2"), col("dof"))
      .orderBy("source", "lang")
  }

  private val sourceLangIndependenceSql =
    """WITH cells AS (SELECT source, lang, count(*) AS o
      |        FROM documents GROUP BY source, lang),
      |rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS row_n
      |       FROM cells GROUP BY source),
      |cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS col_n
      |       FROM cells GROUP BY lang),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |        CAST((count(DISTINCT source) - 1)
      |          * (count(DISTINCT lang) - 1) AS BIGINT) AS dof
      |      FROM cells),
      |sc AS (SELECT rm.source, cm.lang, coalesce(cells.o, 0) AS o,
      |         row_n * 1.0 * col_n / n AS e
      |       FROM rm CROSS JOIN cm
      |       LEFT JOIN cells ON cells.source = rm.source
      |         AND cells.lang = cm.lang, t),
      |x2 AS (SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2 FROM sc)
      |SELECT source, lang, o AS observed, round(e, 6) AS expected,
      |  round((o - e) / sqrt(e), 6) AS std_residual, chi2, dof
      |FROM sc, x2, t ORDER BY source, lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("d01_exact_dedup", exactDedup, Some(exactDedupSql)),
    QueryDef("d02_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("d03_quality_score", qualityScore, Some(qualityScoreSql)),
    QueryDef("d04_lang_id", langId, Some(langIdSql)),
    QueryDef("d05_jaccard_dup_pairs", jaccardDupPairs, Some(jaccardPairsSql)),
    QueryDef("d06_minhash_lsh_pairs", minhashLshPairs, Some(jaccardPairsSql)),
    QueryDef("d07_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    QueryDef("d08_winnow_fingerprint", winnowFingerprint, Some(winnowFingerprintSql)),
    QueryDef("d09_token_frequencies", tokenFrequencies, Some(tokenFrequenciesSql)),
    QueryDef("d10_bpe_token_counts", bpeTokenCounts, Some(bpeTokenCountsSql)),
    QueryDef("d11_heavy_hitter_tokens", heavyHitterTokens, Some(heavyHitterTokensSql)),
    QueryDef("d12_edit_distance_dup_pairs", editDistanceDupPairs, Some(editDistanceDupPairsSql)),
    QueryDef("d13_dup_clusters", dupClusters,
      Some(graft.QueryDef.materializeCtes(dupClustersSql))),
    QueryDef("d14_hash_split", hashSplit, Some(hashSplitSql)),
    QueryDef("d15_token_chunks", tokenChunks, Some(tokenChunksSql)),
    QueryDef("d16_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("d17_incremental_dedup", incrementalDedup, Some(incrementalDedupSql)),
    QueryDef("d18_contamination", contamination, Some(contaminationSql)),
    QueryDef("d19_repetition_stats", repetitionStats, Some(repetitionStatsSql)),
    QueryDef("d20_crossdoc_ngram_dup", crossdocNgramDup, Some(crossdocNgramDupSql)),
    QueryDef("d21_tfidf_top_terms", tfidfTopTerms, Some(tfidfTopTermsSql)),
    QueryDef("d22_vocab_prune", vocabPrune, Some(vocabPruneSql)),
    QueryDef("d23_unigram_logprob", unigramLogprob, Some(unigramLogprobSql)),
    // d24 shares d17's oracle by design: the Bloom prefilter is a plan
    // optimization, not a semantics change (no false negatives).
    QueryDef("d24_bloom_incremental_dedup", bloomIncrementalDedup,
      Some(incrementalDedupSql)),
    QueryDef("d25_sequence_packing", sequencePacking, Some(sequencePackingSql)),
    QueryDef("d26_cross_split_leakage", crossSplitLeakage, Some(crossSplitLeakageSql)),
    QueryDef("d27_source_report", sourceReport, Some(sourceReportSql)),
    QueryDef("d28_length_histogram", lengthHistogram, Some(lengthHistogramSql)),
    QueryDef("d29_apply_near_dup_removal", applyNearDupRemoval,
      Some(applyNearDupRemovalSql)),
    QueryDef("d30_prefix_dup", prefixDup, Some(prefixDupSql)),
    QueryDef("d31_rule_filter", ruleFilter, Some(ruleFilterSql)),
    QueryDef("d32_quality_weighted_sample", qualityWeightedSample,
      Some(qualityWeightedSampleSql)),
    QueryDef("d33_bigram_logprob", bigramLogprob, Some(bigramLogprobSql)),
    QueryDef("d34_cluster_weighted_sample", clusterWeightedSample,
      Some(graft.QueryDef.materializeCtes(clusterWeightedSampleSql))),
    QueryDef("d35_containment_dup_pairs", containmentDupPairs,
      Some(containmentDupPairsSql)),
    QueryDef("d36_hapax_stats", hapaxStats, Some(hapaxStatsSql)),
    QueryDef("d37_best_of_cluster", bestOfCluster,
      Some(graft.QueryDef.materializeCtes(bestOfClusterSql))),
    QueryDef("d38_langid_confusion", langidConfusion, Some(langidConfusionSql)),
    // shares d05's oracle: the capped plan provably emits the same pair
    // set on this corpus (DedupSpec) and the same float op computes jaccard
    QueryDef("d39_capped_jaccard_pairs", cappedJaccardDupPairs,
      Some(jaccardPairsSql)),
    QueryDef("d40_boilerplate_ngrams", boilerplateNgrams,
      Some(boilerplateNgramsSql)),
    QueryDef("d41_pmi_phrases", pmiPhrases, Some(pmiPhrasesSql)),
    QueryDef("d42_quality_calibration", qualityCalibration, Some(qualityCalibrationSql)),
    QueryDef("d43_mixture_weights", mixtureWeights, Some(mixtureWeightsSql)),
    QueryDef("d44_cms_token_frequency", cmsTokenFrequency, Some(cmsTokenFrequencySql)),
    QueryDef("d45_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("d46_dup_substring_spans", dupSubstringSpans,
      Some(dupSubstringSpansSql)),
    QueryDef("d47_token_budget_fill", tokenBudgetFill,
      Some(tokenBudgetFillSql)),
    QueryDef("d48_apply_substring_removal", applySubstringRemoval,
      Some(applySubstringRemovalSql)),
    QueryDef("d49_cluster_safe_split", clusterSafeSplit,
      Some(graft.QueryDef.materializeCtes(clusterSafeSplitSql))),
    QueryDef("d50_bpe_merges", bpeMerges,
      Some(graft.QueryDef.materializeCtes(bpeMergesSql))),
    QueryDef("d51_dup_graph_pagerank", dupGraphPagerank,
      Some(graft.QueryDef.materializeCtes(dupGraphPagerankSql))),
    QueryDef("d52_quality_logreg", qualityLogreg,
      Some(graft.QueryDef.materializeCtes(qualityLogregSql))),
    QueryDef("d53_apply_decontamination", applyDecontamination,
      Some(applyDecontaminationSql)),
    QueryDef("d54_heldout_perplexity", heldoutPerplexity,
      Some(heldoutPerplexitySql)),
    QueryDef("d55_temperature_mixture", temperatureMixture,
      Some(temperatureMixtureSql)),
    QueryDef("d56_bpe_encode", bpeEncode,
      Some(graft.QueryDef.materializeCtes(bpeEncodeSql))),
    QueryDef("d57_dup_graph_triangles", dupGraphTriangles,
      Some(graft.QueryDef.materializeCtes(dupGraphTrianglesSql))),
    QueryDef("d58_zipf_fit", zipfFit, Some(zipfFitSql)),
    QueryDef("d59_source_divergence", sourceDivergence,
      Some(sourceDivergenceSql)),
    QueryDef("d60_shingle_heaps", shingleHeaps, Some(shingleHeapsSql)),
    QueryDef("d61_minhash_estimate_audit", minhashEstimateAudit,
      Some(minhashEstimateAuditSql)),
    QueryDef("d62_bm25_retrieval", bm25Retrieval, Some(bm25RetrievalSql)),
    QueryDef("d63_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("d64_stupid_backoff", stupidBackoff, Some(stupidBackoffSql)),
    QueryDef("d65_fuzzy_decontamination", fuzzyDecontamination,
      Some(fuzzyDecontaminationSql)),
    QueryDef("d66_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    QueryDef("d67_dup_mass_report", dupMassReport,
      Some(graft.QueryDef.materializeCtes(dupMassReportSql))),
    QueryDef("d68_intradoc_chunk_dedup", intraDocChunkDedup,
      Some(intraDocChunkDedupSql)),
    QueryDef("d69_kn_bigram_score", knBigramScore, Some(knBigramScoreSql)),
    QueryDef("d70_isotonic_calibration", isotonicCalibration,
      Some(isotonicCalibrationSql)),
    QueryDef("d71_source_overlap_matrix", sourceOverlapMatrix,
      Some(sourceOverlapMatrixSql)),
    QueryDef("d72_sparse_cosine_dup_pairs", sparseCosineDupPairs,
      Some(sparseCosineDupPairsSql)),
    QueryDef("d73_threshold_sensitivity", thresholdSensitivity,
      Some(thresholdSensitivitySql)),
    QueryDef("d74_lsh_band_sensitivity", lshBandSensitivity,
      Some(lshBandSensitivitySql)),
    QueryDef("d75_source_lang_independence", sourceLangIndependence,
      Some(sourceLangIndependenceSql)),
    QueryDef("d76_minhash_width_sweep", minhashWidthSweep,
      Some(graft.QueryDef.materializeCtes(minhashWidthSweepSql))),
    QueryDef("d77_perplexity_buckets", perplexityBuckets,
      Some(perplexityBucketsSql)),
    QueryDef("d81_curation_pipeline", curationPipeline,
      Some(graft.QueryDef.materializeCtes(curationPipelineSql))),
    QueryDef("d78_apply_minhash_dedup", applyMinhashDedup,
      Some(graft.QueryDef.materializeCtes(applyMinhashDedupSql))),
  )
}
