package graft.ext

import graft.QueryDef
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 retrieval artifact — the text family's e46: d62
  * computes BM25 inline per query (the right correctness twin), but a
  * deployment serves ranked retrieval off a COMMITTED inverted index —
  * after dedup/filtering, retrieval over the training corpus is how
  * decontamination probes, data maps and eval-leak searches actually
  * run at 100 TB, and rebuilding tf/df/dl per query is what that
  * deployment rejects. (The reference persists its serving artifact
  * the same way — `streamlit_app.py:665` loads
  * data/models/next_hour_congestion.joblib at serve time, never
  * refit per request.)
  *
  * On-disk layout (the [[VectorIndex]]/[[TextIndex]] marker protocol —
  * `_commit-<n>` rename flip, fingerprint-stamped ensure, chain-aware
  * prune):
  *   - `v<n>/postings/tb=<b>/` — one (token, doc_id, tf, dl) row per
  *     distinct doc-token, HIVE-PARTITIONED BY TOKEN-HASH BUCKET (8
  *     dirs): a probe for given terms reads only their bucket
  *     directories (partition-pruned), with the term equality pushed
  *     into the parquet scan. `dl` is denormalized onto the posting row
  *     (Lucene's norms-with-postings layout) so scoring never joins a
  *     second corpus-sized table.
  *   - `v<n>/vocab/` — (token, df): the document-frequency table, the
  *     index STATISTICS. Maintained as SIGNED SEGMENTS: a base commit
  *     writes the full table, an append commits `vocab-delta/` with the
  *     batch's +df rows, a forget commits the forgotten docs' −df rows;
  *     [[loadVocab]] sums segments (df > 0) — so maintenance writes are
  *     O(batch vocabulary), never O(corpus vocabulary).
  *   - `v<n>/stats/` — (n_docs, sum_dl), same signed-segment
  *     discipline ([[loadStats]] sums to the live corpus size and
  *     total length — BM25's N and avgdl inputs).
  *   - `v<n>/postings-delta/` + `v<n>/tombstones` — O(batch) appends
  *     and metadata-only forgets, exactly [[TextIndex]]'s chain rules
  *     (at most one tombstones version per chain, auto-fold at
  *     [[AppendFoldThreshold]] deltas, explicit [[compactIndex]]).
  *
  * Serve cost: the 8-term standard query reads ≤8 bucket directories
  * filtered to the query terms (df-bounded posting lists), joins a
  * broadcast 8-row term table and a broadcast 1-row stats table, and
  * ranks with a query_term-partitioned window — no corpus scan, no
  * global funnel. The one corpus-sized pass is the BUILD (one tokenize
  * + two map-side-combined aggregates), the cost serving amortizes.
  */
object RetrievalIndex {

  private val nBuckets = 8

  /** Deltas tolerated in a chain before an append auto-folds. */
  private val AppendFoldThreshold = 8

  def defaultRoot(dataDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft-bm25-index/" + dataDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  def defaultLifeRoot(dataDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft-bm25-index-life/" + dataDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** (token, doc_id, tf, dl, tb) of a (doc_id, text) frame — d62's
    * exact tokenization (split on single space; every downstream number
    * derives from this one explode) with the bucket key the layout
    * partitions by.
    */
  private def postingsOf(docs: DataFrame): DataFrame = {
    val tf = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS token")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tf.join(dl, Seq("doc_id"))
      .selectExpr("token", "doc_id", "tf", "dl",
        s"pmod(xxhash64(token), $nBuckets) AS tb")
  }

  /** (token, df) of a postings frame — one row per doc-token pair means
    * df is a plain count.
    */
  private def vocabOf(postings: DataFrame): DataFrame =
    postings.groupBy("token").agg(count(lit(1)).as("df"))

  /** (n_docs, sum_dl) of a postings frame. */
  private def statsOf(postings: DataFrame): DataFrame =
    postings.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  private def fingerprint(docs: DataFrame): String = {
    val r = docs.agg(count(lit(1)), sum("doc_id")).head()
    s"n=${r.getLong(0)};s=${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  def latestVersion(s: SparkSession, root: String): Option[Long] =
    StreamOps.cdcLatestCommit(
      new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root))

  /** Full (base) commit: postings + complete vocab + complete stats. */
  private def commitVersion(s: SparkSession, root: String, ver: Long,
      postings: DataFrame, stampId: Long, stampTag: String,
      retain: Int): Long = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(rootP)
    val vdir = new org.apache.hadoop.fs.Path(rootP, s"v$ver")
    fs.delete(vdir, true) // wipe a crashed attempt's partial dir
    postings.write.mode("overwrite").partitionBy("tb")
      .parquet(new org.apache.hadoop.fs.Path(vdir, "postings").toString)
    val written = readPostingsDir(s, s"$root/v$ver/postings")
    vocabOf(written).coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(vdir, "vocab").toString)
    statsOf(written).coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(vdir, "stats").toString)
    StreamOps.flipCommitMarker(fs, rootP, ver, stampId, stampTag)
    StreamOps.pruneChainVersions(fs, rootP, retain, Seq("postings"))
    ver
  }

  private def postingsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("token", StringType),
      StructField("doc_id", LongType),
      StructField("tf", LongType),
      StructField("dl", LongType),
      StructField("tb", LongType)))
  }

  private def readPostingsDir(s: SparkSession, path: String): DataFrame =
    s.read.schema(postingsSchema).parquet(path)

  private[graft] def buildIndexFrom(docs: DataFrame, root: String,
      retain: Int = 2): Long = {
    val s = docs.sparkSession
    val ver = latestVersion(s, root).map(_ + 1).getOrElse(0L)
    commitVersion(s, root, ver, postingsOf(docs),
      -3L, s"bm25:${fingerprint(docs)}", retain)
  }

  /** The version whose `postings/` backs `v` — the chain-base walk. */
  private def postingsVersion(fs: org.apache.hadoop.fs.FileSystem,
      root: String, v: Long): Long = {
    var c = v
    while (c >= 0 && !fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/v$c/postings")))
      c -= 1
    if (c < 0) throw new IllegalStateException(
      s"no postings directory reachable from v$v under $root — " +
        "the referenced base version was pruned")
    c
  }

  /** Live postings: base ∖ tombstones ∪ deltas — [[TextIndex
    * .loadPostings]]'s resolution with the declared schema (the bucket
    * probe must reach the reader as a partition filter).
    */
  def loadPostings(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types._
    val v = latestVersion(s, root).getOrElse(throw new IllegalStateException(
      s"no committed index version under $root — build first"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val pv = postingsVersion(fs, root, v)
    val base0 = readPostingsDir(s, s"$root/v$pv/postings")
    val ts = ((pv + 1) to v).reverseIterator
      .map(i => new org.apache.hadoop.fs.Path(s"$root/v$i/tombstones"))
      .find(fs.exists)
    val base = ts match {
      case Some(p) => base0.join(
        broadcast(s.read.schema(StructType(Seq(
          StructField("doc_id", LongType)))).parquet(p.toString)),
        Seq("doc_id"), "left_anti")
      case None => base0
    }
    val deltas = ((pv + 1) to v).filter(i => fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/v$i/postings-delta")))
      .map(i => readPostingsDir(s, s"$root/v$i/postings-delta"))
    (base +: deltas).reduce(_ unionByName _)
  }

  /** The live document-frequency table: base `vocab/` plus every signed
    * `vocab-delta/` in the chain, summed (df > 0) — reading the index
    * statistics costs O(vocab), never a postings scan.
    */
  def loadVocab(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types._
    val v = latestVersion(s, root).getOrElse(throw new IllegalStateException(
      s"no committed index version under $root — build first"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val pv = postingsVersion(fs, root, v)
    val sch = StructType(Seq(
      StructField("token", StringType), StructField("df", LongType)))
    val segs = s.read.schema(sch).parquet(s"$root/v$pv/vocab") +:
      ((pv + 1) to v).filter(i => fs.exists(
          new org.apache.hadoop.fs.Path(s"$root/v$i/vocab-delta")))
        .map(i => s.read.schema(sch).parquet(s"$root/v$i/vocab-delta"))
    segs.reduce(_ unionByName _)
      .groupBy("token").agg(sum("df").as("df"))
      .filter(col("df") > 0)
  }

  /** Live (n_docs, sum_dl) — base `stats/` plus signed deltas. */
  def loadStats(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types._
    val v = latestVersion(s, root).getOrElse(throw new IllegalStateException(
      s"no committed index version under $root — build first"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val pv = postingsVersion(fs, root, v)
    val sch = StructType(Seq(
      StructField("n_docs", LongType), StructField("sum_dl", LongType)))
    val segs = s.read.schema(sch).parquet(s"$root/v$pv/stats") +:
      ((pv + 1) to v).filter(i => fs.exists(
          new org.apache.hadoop.fs.Path(s"$root/v$i/stats-delta")))
        .map(i => s.read.schema(sch).parquet(s"$root/v$i/stats-delta"))
    segs.reduce(_ unionByName _)
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
  }

  /** One incremental append commit: the batch's postings as an O(batch)
    * `postings-delta/` segment plus its +df vocab-delta and +stats
    * delta — maintenance IO scales with the batch, never the corpus.
    * Auto-folds at [[AppendFoldThreshold]]; exactly-once by stamp.
    */
  private[graft] def appendDocs(batch: DataFrame, root: String,
      batchId: Long, incarnationId: String, retain: Int = 2): Long = {
    val s = batch.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val cur = StreamOps.cdcLatestCommit(fs, rootP).getOrElse(
      throw new IllegalStateException(
        s"appendDocs needs a committed index under $root — build first"))
    if (StreamOps.cdcMarkerStamp(fs, rootP, cur) == ((batchId, incarnationId)))
      return cur
    if (batch.isEmpty) return cur
    val pv = postingsVersion(fs, root, cur)
    val nDeltas = ((pv + 1) to cur).count(i => fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/v$i/postings-delta")))
    if (nDeltas >= AppendFoldThreshold) {
      val merged = loadPostings(s, root).select("token", "doc_id", "tf", "dl", "tb")
        .unionByName(postingsOf(batch).select("token", "doc_id", "tf", "dl", "tb"))
      commitVersion(s, root, cur + 1, merged, batchId, incarnationId, retain)
    } else {
      val ver = cur + 1
      val vdir = new org.apache.hadoop.fs.Path(rootP, s"v$ver")
      fs.delete(vdir, true) // wipe a crashed attempt's partial dir
      postingsOf(batch).write.mode("overwrite").partitionBy("tb")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "postings-delta").toString)
      val written = readPostingsDir(s,
        new org.apache.hadoop.fs.Path(vdir, "postings-delta").toString)
      vocabOf(written).coalesce(1).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "vocab-delta").toString)
      statsOf(written).coalesce(1).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "stats-delta").toString)
      StreamOps.flipCommitMarker(fs, rootP, ver, batchId, incarnationId)
      StreamOps.pruneChainVersions(fs, rootP, retain, Seq("postings"))
      ver
    }
  }

  /** Forget documents: on a clean base a METADATA-ONLY commit (doc-id
    * tombstones + the forgotten docs' −df vocab-delta and −stats delta
    * — an O(forgotten) read of their posting rows, an O(forgotten
    * vocabulary) write); on a delta-bearing chain a COMPACT, keeping
    * the chain's single-tombstones invariant. After the commit the
    * forgotten docs can never rank for any query AND the statistics
    * reflect the live corpus — BM25's idf is df-sensitive, so forget
    * must unlearn the counts too, not just the rows.
    */
  private[graft] def forgetDocs(s: SparkSession, root: String,
      ids: DataFrame, stampId: Long, stampTag: String,
      retain: Int = 2): Long = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val cur = StreamOps.cdcLatestCommit(fs, rootP).getOrElse(
      throw new IllegalStateException(
        s"forgetDocs needs a committed index under $root — build first"))
    if (StreamOps.cdcMarkerStamp(fs, rootP, cur) == ((stampId, stampTag)))
      return cur
    val ver = cur + 1
    val vdir = new org.apache.hadoop.fs.Path(rootP, s"v$ver")
    fs.delete(vdir, true) // wipe a crashed attempt's partial dir
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$root/v$cur/postings"))) {
      val gone = loadPostings(s, root)
        .join(broadcast(ids.select("doc_id").distinct()), Seq("doc_id"),
          "left_semi")
      ids.select("doc_id").distinct()
        .coalesce(1).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "tombstones").toString)
      vocabOf(gone).selectExpr("token", "-df AS df")
        .coalesce(1).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "vocab-delta").toString)
      statsOf(gone).selectExpr("-n_docs AS n_docs", "-sum_dl AS sum_dl")
        .coalesce(1).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(vdir, "stats-delta").toString)
      StreamOps.flipCommitMarker(fs, rootP, ver, stampId, stampTag)
      StreamOps.pruneChainVersions(fs, rootP, retain, Seq("postings"))
      ver
    } else {
      commitVersion(s, root, ver,
        loadPostings(s, root)
          .join(broadcast(ids.select("doc_id").distinct()), Seq("doc_id"),
            "left_anti")
          .select("token", "doc_id", "tf", "dl", "tb"),
        stampId, stampTag, retain)
    }
  }

  /** Streaming maintenance sink: each micro-batch of (doc_id, text)
    * documents appends through [[appendDocs]] — version re-resolved per
    * batch, O(batch) postings-delta + signed vocab/stats segments,
    * exactly-once by the (batch id, incarnation) stamp — the FIFTH
    * streaming index-maintenance path beside the vector append /
    * admission, graph insert/delete and text-signature admission
    * sinks: the retrieval artifact stays queryable and statistically
    * exact while documents stream in.
    */
  def indexAppendSink(docs: DataFrame, root: String, retain: Int = 2)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fallbackIncarnation = java.util.UUID.randomUUID().toString
    docs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val incarnation = Option(b.sparkSession.sparkContext
            .getLocalProperty("sql.streaming.queryId"))
          .getOrElse(fallbackIncarnation)
        appendDocs(b.toDF(), root, id, incarnation, retain)
        ()
    }
  }

  /** Fold the live chain into ONE self-contained version — stamped
    * (−2, "optimize") like every index family's maintenance commit.
    */
  def compactIndex(s: SparkSession, root: String,
      retain: Int = 2): Option[Long] =
    latestVersion(s, root).map { cur =>
      commitVersion(s, root, cur + 1,
        loadPostings(s, root).select("token", "doc_id", "tf", "dl", "tb"),
        -2L, "optimize", retain)
    }

  /** BM25 top-5 per query term, served ENTIRELY off the committed
    * artifact: the 8 rarest terms (df ASC, token ASC — d62's
    * data-derived deterministic query set) resolve from the ≤|vocab|
    * statistics table, their bucket set partition-prunes the postings
    * read (term equality pushed into the scan), the 8-row term table
    * and 1-row corpus stats broadcast onto the df-bounded posting
    * lists, and per-term ranking is a query_term-partitioned window.
    */
  def serveBm25TopK(s: SparkSession, root: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qterms = loadVocab(s, root)
      .orderBy(col("df").asc, col("token").asc).limit(8)
      .selectExpr("token", "df", s"pmod(xxhash64(token), $nBuckets) AS qtb")
      .collect()
    // the resolved query terms as LITERALS: the bucket set prunes
    // partitions AND the term set pushes into the parquet scan (a
    // broadcast join alone would read whole bucket directories) — the
    // posting read is bounded by the query terms' df, not the bucket
    val tbs = qterms.map(_.getLong(2)).distinct.toSeq
    val termLits = qterms.map(_.getString(0)).toSeq
    val terms = qterms.map(r => s.range(1)
        .select(lit(r.getString(0)).as("token"), lit(r.getLong(1)).as("df")))
      .reduce(_ unionByName _)
    loadPostings(s, root)
      .filter(col("tb").isin(tbs: _*))
      .filter(col("token").isin(termLits: _*))
      .join(broadcast(terms), Seq("token"))
      .crossJoin(broadcast(loadStats(s, root)))
      .selectExpr("token AS query_term", "doc_id",
        """round(ln(1.0D + (CAST(n_docs AS DOUBLE) - df + 0.5D) / (df + 0.5D))
          |  * (tf * 2.2D)
          |  / (tf + 1.2D * (0.25D + 0.75D * (dl * 1.0D * n_docs / sum_dl))),
          |  6) AS bm25""".stripMargin)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_term")
          .orderBy(col("bm25").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select("query_term", "rank", "doc_id", "bm25")
      .orderBy("query_term", "rank")
  }

  // ---------------------------------------------------------------- d83

  /** Registry entry: ensure the committed retrieval index over the full
    * documents corpus (fingerprint-guarded), serve d62's standard query
    * off it. The oracle is d62's INLINE SQL verbatim — hash equality IS
    * the build → commit → load → serve ≡ inline guarantee for tf, dl,
    * df, the corpus stats and the ranking discipline at once.
    */
  def bm25IndexServed(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir).select("doc_id", "text")
    val root = defaultRoot(dir)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val want = s"bm25:${fingerprint(docs)}"
    StreamOps.cdcLatestCommit(fs, rootP)
      .filter(v => StreamOps.cdcMarkerStamp(fs, rootP, v) == ((-3L, want)))
      .getOrElse(buildIndexFrom(docs, root))
    serveBm25TopK(s, root)
  }

  // ---------------------------------------------------------------- d84

  /** The deterministic forget slice d84 removes from the base split. */
  private[graft] def bm25ForgetPred = "doc_id % 11 = 2"

  /** Registry entry: BM25 served after the FULL index lifecycle —
    * build the base split, forget a slice (metadata-only tombstones
    * with −df/−stats segments), append the incoming split (O(batch)
    * delta with +df/+stats segments) — d82/e62's composition pin on
    * the retrieval family. The served ranking must equal d62's inline
    * computation over the LIVE doc set, which only happens if the
    * postings chain AND the signed statistics chain both resolve
    * correctly (a stale df or n_docs shifts every idf).
    */
  def bm25LifecycleServed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = graft.Tables.documents(s, dir)
      .selectExpr("doc_id", "text", TextOps.docBucket)
    val base = docs.filter(col("bucket") < TextOps.TrainCut)
      .select("doc_id", "text")
    val incoming = docs.filter(col("bucket") >= TextOps.TrainCut)
      .select("doc_id", "text")
    val root = defaultLifeRoot(dir)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val want = s"bm25+life[forget=$bm25ForgetPred]:${fingerprint(docs)}"
    StreamOps.cdcLatestCommit(fs, rootP)
      .filter(v => StreamOps.cdcMarkerStamp(fs, rootP, v) == ((-7L, want)))
      .getOrElse {
        buildIndexFrom(base, root)                                // v0
        forgetDocs(s, root, base.filter(expr(bm25ForgetPred))
          .select("doc_id"), -6L, s"life-forget:$bm25ForgetPred") // v1: DV
        appendDocs(incoming, root, -7L, want)                     // v2: delta
      }
    serveBm25TopK(s, root)
  }

  private def bm25LifecycleSql =
    s"""WITH live AS (
      |  SELECT doc_id, text
      |  FROM (SELECT doc_id, text, ${TextOps.docBucketSql} FROM documents)
      |  WHERE NOT (bucket < ${TextOps.TrainCut} AND $bm25ForgetPred)),
      |${TextOps.bm25SqlOver("live")}""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("d83_bm25_index_served", bm25IndexServed,
      Some(s"WITH ${TextOps.bm25SqlOver("documents")}")),
    QueryDef("d84_bm25_index_lifecycle", bm25LifecycleServed,
      Some(bm25LifecycleSql)))
}
