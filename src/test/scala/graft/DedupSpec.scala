package graft

import graft.ext.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Dedup + similarity-search invariants on the sf0.001 corpus. */
class DedupSpec extends SparkSpec {

  test("MinHash-LSH recovers exactly the exact-Jaccard pair set") {
    val exact = TextOps.jaccardDupPairs(spark, sf0001)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.minhashLshPairs(spark, sf0001)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("capped-exact dedup: pair set and jaccards equal d05, postings bounded, evidence audited") {
    val exact = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = TextOps.cappedJaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    assert(capped.keySet == exact.keySet,
      s"capped missed ${exact.keySet -- capped.keySet}, extra ${capped.keySet -- exact.keySet}")
    // verify stage restores the TRUE jaccard — bit-equal, not approximate
    capped.foreach { case (k, j) => assert(j == exact(k), s"pair $k jaccard drift") }
    // generation-side posting lists are bounded by the cap: recompute df
    // and check the cold stream's max multiplicity
    val dfs = Tables.documents(spark, sf0001)
      .selectExpr("explode(array_distinct(word_trigram_hashes(text))) AS h")
      .groupBy("h").count().collect().map(_.getLong(1))
    val hot = TextOps.hotShingleEvidence(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(hot.forall(_._2 > TextOps.ShingleDfCap))
    assert(dfs.count(_ > TextOps.ShingleDfCap) == hot.length,
      "evidence channel must report every cap-dropped shingle")
  }

  test("CM sketch: overestimate-only for every token, cell-wise mergeable across a corpus split") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    def toks(pred: String) = Tables.documents(spark, sf0001)
      .filter(pred).selectExpr("explode(split(text,' ')) AS tok")
    def sketch(pred: String) = toks(pred)
      .selectExpr(s"explode(sequence(0, ${TextOps.CmsDepth - 1})) AS r", "tok")
      .selectExpr("r",
        s"pmod(md5_long60(concat('cms', r, ':', tok)), ${TextOps.CmsWidth}) AS b")
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    // guarantee: est >= exact for EVERY token, not just the audited top-10
    val sk = sketch("true").collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = toks("true").groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(sArg: String): Long = {
      val hex = md5.digest(sArg.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TextOps.CmsWidth
    }
    exact.foreach { case (tok, n) =>
      val est = (0 until TextOps.CmsDepth).map(r => sk((r, h(s"cms$r:$tok")))).min
      assert(est >= n, s"CM undercounted '$tok': $est < $n")
    }
    // mergeability: sketch(A) + sketch(B) == sketch(A ∪ B) cell-wise
    val a = sketch("doc_id % 2 = 0").collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = sketch("doc_id % 2 = 1").collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == sk, "split sketches must add to the full sketch")
    // the audited report agrees with the independent recomputation here
    val report = TextOps.cmsTokenFrequency(spark, sf0001).collect()
    assert(report.length == 10)
    report.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L)
      assert(r.getAs[Long]("est_n") ==
        (0 until TextOps.CmsDepth).map(d => sk((d, h(s"cms$d:${r.getString(0)}")))).min)
    }
  }

  test("d45 novelty: first-occurrences partition the distinct-gram space") {
    val rep = TextOps.ngramNovelty(spark, sf0001).collect()
    // every distinct corpus 8-gram has exactly ONE first occurrence, so
    // the per-doc novel counts must sum to the corpus distinct-gram count
    val distinctGrams = Tables.documents(spark, sf0001)
      .selectExpr("split(text,' ') AS toks").where("size(toks) >= 8")
      .selectExpr("""explode(array_distinct(transform(sequence(1, size(toks)-7),
        |  i -> concat_ws(' ', slice(toks, i, 8))))) AS g""".stripMargin)
      .distinct().count()
    assert(rep.map(_.getLong(2)).sum == distinctGrams)
    rep.foreach { r =>
      val novelty = r.getDouble(3)
      assert(novelty >= 0.0 && novelty <= 1.0)
      assert(novelty == r.getLong(2).toDouble / r.getLong(1))
    }
    // the lowest doc_id can never restate anything
    assert(rep.minBy(_.getLong(0)).getDouble(3) == 1.0)
  }

  test("pipeline shared frames serve bit-identical results and release cleanly") {
    def snap(name: String) = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    val names = Seq("d05_jaccard_dup_pairs", "d12_edit_distance_dup_pairs",
      "d13_dup_clusters", "d18_contamination", "d29_apply_near_dup_removal",
      "d34_cluster_weighted_sample", "d37_best_of_cluster",
      "d39_capped_jaccard_pairs", "d40_boilerplate_ngrams",
      "d46_dup_substring_spans",
      "d48_apply_substring_removal", "d67_dup_mass_report")
    val isolated = names.map(n => n -> snap(n)).toMap
    TextOps.enableSharedFrames(spark, sf0001)
    try names.foreach { n =>
      assert(snap(n) == isolated(n), s"$n drifts under shared frames")
    } finally TextOps.clearSharedFrames()
    // registry cleared: the plain self-contained path serves again
    assert(snap("d13_dup_clusters") == isolated("d13_dup_clusters"))
  }

  test("PII scrub masks emails/IPs/cards/phones with counts; clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact me at jane.doe+x@corp.example.org or 10.1.255.7 thanks"),
      (2L, "card 4111111111111111 phone 555-867-5309 and +1 (415) 555-2671"),
      (3L, "plain text with no sensitive values at all"),
      (4L, "two mails a@b.io c@d.co one ip 192.168.0.1")
    ).toDF("doc_id", "text")
    val out = TextOps.scrubPii(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getString(1) == "contact me at <EMAIL> or <IP> thanks")
    assert(out(1).getAs[Int]("n_email") == 1 && out(1).getAs[Int]("n_ip") == 1)
    val r2 = out(2).getString(1)
    assert(r2.contains("<CARD>") && !r2.exists(_.isDigit), r2)
    assert(out(2).getAs[Int]("n_card") == 1 && out(2).getAs[Int]("n_phone") == 2)
    assert(out(3).getString(1) == "plain text with no sensitive values at all")
    assert(out(3).getAs[Int]("pii_masked") == 0)
    assert(out(4).getAs[Int]("n_email") == 2 && out(4).getAs[Int]("n_ip") == 1)
    // the whole corpus is PII-free: scrub is the identity there
    val docs = Tables.documents(spark, sf0001)
    assert(TextOps.scrubPii(docs).filter(col("pii_masked") > 0).count() == 0)
  }

  test("near-dup pairs all have jaccard in (0.5, 1]") {
    val js = TextOps.jaccardDupPairs(spark, sf0001)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(js.forall(j => j >= 0.5 && j <= 1.0))
  }

  test("simhash pairs cover the high-jaccard near-dups") {
    val exact = TextOps.jaccardDupPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.9)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = TextOps.simhashPairs(spark, sf0001)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0 else (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} dup pairs")
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, sf0001)
    val distinctTexts = docs.select("text").distinct().count()
    assert(TextOps.exactDedup(spark, sf0001).count() == distinctTexts)
  }

  test("winnow fingerprints are non-empty and deterministic across runs") {
    val a = TextOps.winnowFingerprint(spark, sf0001).collect().map(_.toSeq)
    val b = TextOps.winnowFingerprint(spark, sf0001).collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("winnow fingerprints separate near-dups from unrelated docs") {
    // The plagiarism-detection property behind d08: near-dup pairs share a
    // much larger fingerprint fraction than unrelated pairs. Fingerprint
    // SETS are recomputed here with the same kgram-hash/window-min
    // construction the query uses (the query itself outputs only
    // count+checksum, which the DuckDB oracle hash-checks).
    val fps = Tables.documents(spark, sf0001)
      .where("length(text) >= 8")
      .selectExpr("doc_id",
        "transform(sequence(1, length(text)-4), i -> CAST(conv(substring(md5(substring(text, i, 5)), 1, 15), 16, 10) AS BIGINT)) AS hs")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(1, size(hs)-3), i -> array_min(slice(hs, i, 4)))) AS fps")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def overlap(a: Long, b: Long): Double =
      (fps(a) & fps(b)).size.toDouble / math.max(1, math.min(fps(a).size, fps(b).size))
    val dups = TextOps.jaccardDupPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.9)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.nonEmpty)
    val dupIds = dups.flatMap(p => Seq(p._1, p._2)).toSet
    val unrelated = fps.keys.toSeq.sorted.filterNot(dupIds).take(40)
    val unrelatedPairs = for (Seq(a, b) <- unrelated.sorted.grouped(2).toSeq if fps.contains(b)) yield (a, b)
    val dupMean = dups.map((overlap _).tupled).sum / dups.size
    val unrelMean = unrelatedPairs.map((overlap _).tupled).sum / unrelatedPairs.size
    assert(dupMean >= 0.6, s"near-dup fingerprint overlap only $dupMean")
    assert(dupMean >= unrelMean + 0.3,
      s"no separation: dup $dupMean vs unrelated $unrelMean")
  }

  test("dup clusters are consistent with the pair graph") {
    val pairs = TextOps.jaccardDupPairs(spark, sf0001)
      .select("doc_id_1", "doc_id_2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = TextOps.dupClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    // every paired doc is labeled, pair endpoints share a cluster, and the
    // cluster id is the min doc_id of its members
    pairs.foreach { case (a, b) =>
      assert(lbl(a) == lbl(b), s"pair ($a,$b) split across clusters")
    }
    lbl.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid is not its min member")
    }
  }

  test("hash split is deterministic and roughly 80/10/10") {
    val a = TextOps.hashSplit(spark, sf0001).collect().map(_.toSeq)
    val b = TextOps.hashSplit(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val n = a.length.toDouble
    val frac = a.groupBy(_(2)).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95, s"train frac $frac")
  }

  test("token chunks reconstruct the document (first 64 tokens of each chunk)") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    TextOps.tokenChunks(spark, sf0001)
      .selectExpr("doc_id", "chunk_idx", "chunk").collect()
      .groupBy(_.getLong(0)).foreach { case (id, rows) =>
        val rebuilt = rows.sortBy(_.getInt(1))
          .map(_.getString(2).split(' ').take(64).mkString(" ")).mkString(" ")
        assert(rebuilt == docs(id), s"doc $id chunk reconstruction mismatch")
      }
  }

  test("multi-probe IVF recall dominates single-probe against the exact top-5") {
    val exact = VectorOps.knnBruteForce(spark, sf0001).collect()
      .map(_.getLong(0)).take(5).toSet
    val one = VectorOps.annIvfTop5(spark, sf0001).collect().map(_.getLong(0)).toSet
    val two = VectorOps.annIvfMultiprobe(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(two.size == 5)
    // probing a superset of cells can only add candidates, so recall is
    // monotone in nprobe
    assert((exact & two).size >= (exact & one).size,
      s"nprobe=2 recall ${(exact & two).size} < nprobe=1 ${(exact & one).size}")
  }

  test("PQ-ADC top-5 lands inside the exact L2 top-50 and is run-deterministic") {
    import org.apache.spark.sql.functions._
    val pq = VectorOps.pqKnn(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(pq.size == 5)
    assert(pq == VectorOps.pqKnn(spark, sf0001).collect().map(_.getLong(0)).toSeq)
    // lossy-but-sane: with the 16-centroid stand-in codebook every ADC
    // winner must still be a genuinely near vector (measured: 5/5 in the
    // exact-L2 top-50, 2/5 in the top-10 on this corpus)
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val q = e.filter(col("vec_id") === 0).selectExpr("v AS qv")
    val exact50 = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
      .selectExpr("vec_id",
        "aggregate(zip_with(v, qv, (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x) AS d2")
      .orderBy(col("d2"), col("vec_id")).limit(50)
      .collect().map(_.getLong(0)).toSet
    assert(pq.forall(exact50), s"PQ picked far vectors: ${pq.filterNot(exact50)}")
  }

  test("PQ re-rank recovers recall the raw ADC ranking loses (vs exact cosine top-5)") {
    val exact5 = VectorOps.knnBruteForce(spark, sf0001).collect()
      .map(_.getLong(0)).take(5).toSet
    val raw = VectorOps.pqKnn(spark, sf0001).collect().map(_.getLong(0)).toSet
    val reranked = VectorOps.pqRerankTop5(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(reranked.size == 5)
    // the exact-cosine stage over the 25-wide shortlist can only improve
    // agreement with the exact answer (measured 4/5 vs raw ADC's 2/5)
    assert((exact5 & reranked).size >= (exact5 & raw).size,
      s"rerank ${(exact5 & reranked).size} < raw ${(exact5 & raw).size}")
    assert((exact5 & reranked).size >= 3)
  }

  test("BQ kNN: clustered recall gate + arithmetic agreement on the fixture corpus") {
    import spark.implicits._
    // effectiveness gate runs on data WITH structure: 4 clusters of ±1
    // patterns (seeded noise), query in cluster 0 — centered sign bits
    // must recover its own cluster. The fixture embeddings are
    // near-isotropic noise (pairwise cosine ≤ ~0.33, hamming
    // concentrated at 24±4), where NO 1-bit code can rank — so the
    // registry entry is gated on arithmetic, this on retrieval quality.
    val rnd = new scala.util.Random(7)
    val protos = Array.fill(4, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, protos(c).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val out = VectorOps.bqKnnFrom(e, queryId = 0L, shortlistN = 25).collect()
    assert(out.length == 5)
    // all five results must come from the query's own cluster (id % 4 == 0)
    out.foreach(r => assert(r.getLong(0) % 4 == 0,
      s"vec ${r.getLong(0)} is not in the query's cluster"))
    // registry query: re-ranked cosines equal a directly computed exact
    // cosine for EVERY returned id (top-10-overlap filtering would be
    // vacuous here — the noise fixture's hamming shortlist may share
    // nothing with the exact top-10)
    val bq = VectorOps.bqKnn(spark, sf0001).collect()
    assert(bq.length == 5)
    graft.functions.GraftFunctions.register(spark)
    val ids = bq.map(_.getLong(0))
    val q0 = Tables.embeddings(spark, sf0001).filter(col("vec_id") === 0)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS qv")
    val directScores = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .filter(col("vec_id").isin(ids.map(Long.box): _*))
      .crossJoin(q0)
      .selectExpr("vec_id", "round(cosine_similarity(v, qv), 6) AS cs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    bq.foreach { r =>
      assert(directScores(r.getLong(0)) == r.getAs[Double]("cos_sim"),
        s"re-rank cosine drift for vec ${r.getLong(0)}")
    }
    assert(bq.forall(r => r.getAs[Int]("hamming") >= 0 && r.getAs[Int]("hamming") <= 60))
  }

  test("e40 graph walk: clustered recall gate + exact driver replay of the beam search") {
    import spark.implicits._
    // Effectiveness gate runs on data WITH structure (the registry corpus
    // is near-isotropic noise where a 3-degree in-bucket graph walked
    // from one fixed entry cannot rank — recall 0 by data, not defect;
    // bqKnn's arrangement). Fixture: 4 tight ±1-pattern clusters; the
    // first 10 ids (the queries) AND the entry (min id) all sit in
    // cluster 0, so the walk's targets are graph-reachable — the honest
    // operating-point caveat of in-bucket graphs is that a single entry
    // cannot cross bucket components, which is exactly why real HNSW
    // builds cross-scale links.
    val rnd = new scala.util.Random(11)
    val protos = Array.fill(4, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val rows = (0 until 200).map { i =>
      val c = if (i < 10) 0 else i % 4
      (i.toLong, protos(c).map(_ + rnd.nextGaussian() * 0.25).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val g = VectorOps.knnGraphFrom(e)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val got = VectorOps.graphWalkRecallFrom(e, g, nQueries = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L until 10L))

    // ---- driver replay: greedy beam search, bit-identical semantics
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vs = rows.map { case (id, v) => id -> v.toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val adj = g.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val entry = rows.map(_._1).min
    val replay = (0L until 10L).map { qid =>
      val qv = vs(qid)
      var beam = Seq(entry)
      for (_ <- 1 to 3) {
        val cand = (beam ++ beam.flatMap(v => adj.getOrElse(v, Nil))).distinct
        beam = cand.map(v => (v, cos(vs(v), qv)))
          .sortBy { case (v, c) => (-c, v) }.take(8).map(_._1)
      }
      val ann = beam.filterNot(_ == qid)
        .map(v => (v, cos(vs(v), qv)))
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1).toSet
      val exact = rows.map(_._1).filterNot(_ == qid)
        .map(v => (v, cos(vs(v), qv)))
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1).toSet
      (qid, (exact & ann).size.toLong)
    }
    replay.foreach { case (qid, hits) =>
      val row = got.find(_._1 == qid).get
      assert(row._2 == hits, s"q$qid: engine hits ${row._2} != replay $hits")
      assert(row._3 == hits / 5.0)
    }
    // ---- retrieval quality on the clustered fixture: the walk must
    // actually navigate (gate set from measurement with margin)
    val avgRecall = got.map(_._3).sum / got.length
    assert(avgRecall >= 0.5,
      s"graph walk avg recall@5 $avgRecall on the clustered fixture")
    // ---- e42 depth sweep: hop snapshots are prefixes of the SAME walk,
    // so the hop-3 aggregate must restate e40's per-query hits exactly
    val sweep = VectorOps.graphWalkDepthSweepFrom(e, g, nQueries = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(sweep.map(_._1).toSeq == Seq(1, 2, 3))
    val hop3 = sweep.find(_._1 == 3).get
    assert(hop3._2 == got.map(_._2).sum,
      s"e42 hop-3 hits ${hop3._2} != e40 total ${got.map(_._2).sum}")
    sweep.foreach { case (_, h, r) => assert(r == h / 50.0) }
    // ---- e43 beam sweep: its beam-8 point IS e40's operating point
    val bsweep = VectorOps.graphWalkBeamSweepFrom(e, g, nQueries = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(bsweep.map(_._1).toSeq == Seq(4, 8, 16))
    val b8 = bsweep.find(_._1 == 8).get
    assert(b8._2 == got.map(_._2).sum,
      s"e43 beam-8 hits ${b8._2} != e40 total ${got.map(_._2).sum}")
    bsweep.foreach { case (_, h, r) => assert(r == h / 50.0) }
  }

  /** The e41 gate body, shared with e65 (the same fusion served off
    * the two committed artifacts): rank completeness, no self-hit,
    * shortlist membership, rrf restatement, consensus dominance.
    */
  private def assertHybridGates(rows: Array[org.apache.spark.sql.Row]): Unit = {
    assert(rows.length == 50) // 10 queries x top-5
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), s"q$qid ranks")
    }
    rows.foreach { r =>
      val qid = r.getLong(0); val doc = r.getLong(2)
      assert(doc != qid, "query doc retrieved itself")
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val den = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(lex.nonEmpty || den.nonEmpty,
        s"q$qid doc $doc fused from neither shortlist")
      (lex ++ den).foreach(x => assert(x >= 1 && x <= 20))
      // the reported rrf must restate the reported ranks exactly
      val want = BigDecimal(
        lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          den.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"q$qid doc $doc rrf drift")
    }
    // consensus dominance, unconditional at shortlist 20 / k = 60: a doc
    // on BOTH shortlists scores >= 2/80 = 0.025, a single-list doc at
    // most 1/61 ≈ 0.0164 — RRF's defining property, so within any fused
    // top-5 every both-lists doc outranks every single-list doc
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val both = rs.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
      val single = rs.filter(r => r.isNullAt(4) || r.isNullAt(5))
      if (both.nonEmpty && single.nonEmpty) {
        assert(both.map(_.getDouble(3)).min > single.map(_.getDouble(3)).max,
          "a single-shortlist doc outranked a consensus doc")
      }
    }
  }

  test("e41 hybrid RRF: fused scores restate the reported ranks, shortlist membership holds") {
    assertHybridGates(VectorOps.hybridRrfRetrieval(spark, sf0001).collect())
  }

  test("e65 hybrid served: the e41 gates hold with both arms read off the committed artifacts") {
    assertHybridGates(
      graft.ext.VectorIndex.hybridRrfServed(spark, sf0001).collect())
  }

  test("d78 applied minhash dedup: one canonical keeper per cluster, agrees with d13, stricter than d29") {
    val rows = TextOps.applyMinhashDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val corpus = Tables.documents(spark, sf0001).count()
    assert(rows.length == corpus, "every doc gets a verdict row")
    // exactly one keeper per cluster, and it is the cluster min
    rows.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.count(_._4) == 1, s"cluster $cid keeper count")
      assert(ms.filter(_._4).head._1 == ms.map(_._1).min, s"cluster $cid keeper not min")
      ms.foreach { m => assert(m._3 == ms.length, s"cluster $cid n_members") }
    }
    // kept count restates the cluster count (the auditable dedup-rate identity)
    assert(rows.count(_._4) == rows.map(_._2).distinct.length)
    // clustered docs carry d13's exact-pair component labels (banded
    // recall 1.0 on this corpus — the d06 ≡ d05 equality pinned above)
    val d13 = TextOps.dupClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => d13.contains(r._1)).foreach { r =>
      assert(r._2 == d13(r._1), s"doc ${r._1} cluster drift vs d13")
    }
    // and every singleton is its own cluster
    rows.filterNot(r => d13.contains(r._1)).foreach { r =>
      assert(r._2 == r._1 && r._4 && r._3 == 1)
    }
    // component-canonical is at most as permissive as d29's greedy drop:
    // every d78 keeper survives d29 too
    val d29kept = TextOps.applyNearDupRemoval(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    rows.filter(_._4).foreach(r =>
      assert(d29kept.contains(r._1), s"d78 keeper ${r._1} dropped by d29"))
  }

  test("d77 perplexity buckets: terciles partition the corpus, kept = not tail, monotone in xent") {
    val rows = TextOps.perplexityBuckets(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val sizes = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"))
    // NTILE semantics: tercile sizes differ by at most one
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    rows.foreach { case (id, _, b, kept) =>
      assert(kept == (b != "tail"), s"doc $id kept flag")
    }
    // buckets respect the score order (ties split by doc_id, so <=)
    def span(b: String) = {
      val xs = rows.filter(_._3 == b).map(_._2); (xs.min, xs.max)
    }
    assert(span("head")._2 <= span("middle")._1)
    assert(span("middle")._2 <= span("tail")._1)
  }

  test("ANN-LSH results are a subset of brute-force ranking order") {
    val brute = VectorOps.knnBruteForce(spark, sf0001)
      .select("vec_id", "cos_sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = VectorOps.annLshTop5(spark, sf0001)
      .select("vec_id", "cos_sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // Same-bucket candidates score identically to the brute-force pass when
    // they appear in its top-k (cosines are computed by the same expression).
    ann.filter(a => brute.contains(a._1)).foreach { case (id, c) =>
      assert(math.abs(brute(id) - c) < 1e-9, s"cos mismatch for $id")
    }
  }

  test("quantized kNN preserves most of the exact top-k (8-bit recall)") {
    val exact = VectorOps.knnBruteForce(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet // top-10 exact
    val quant = VectorOps.quantizedKnn(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet // top-5 quantized
    val recall = (quant & exact).size.toDouble / quant.size
    assert(recall >= 0.8, s"8-bit quantization recall $recall (quant=$quant)")
  }

  test("LSH buckets partition the embedding set") {
    val total = Tables.embeddings(spark, sf0001).count()
    val sum = VectorOps.lshBuckets(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_vectors")).collect()(0).getLong(0)
    assert(sum == total)
  }

  private def writeDocsFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docsfix").toString
    rows.map { case (id, text) => (id, text, "en", "fix", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d19 repetition stats match hand-computed fractions") {
    val dir = writeDocsFixture(Seq(
      0L -> "a a a a",       // 4 tokens, 1 distinct; 3 bigrams, all "a a"
      1L -> "w x y z w x"))  // 6 tokens, 4 distinct; bigrams wx xy yz zw wx
    val r = TextOps.repetitionStats(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Double]("dup_token_frac") == 0.75)       // 1 - 1/4
    assert(r(0L).getAs[Double]("dup_bigram_frac") == 0.666667)  // 1 - 1/3
    assert(r(0L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(r(1L).getAs[Double]("dup_token_frac") == 0.333333)   // 1 - 4/6
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 0.2)       // 1 - 4/5
    assert(r(1L).getAs[Double]("top_bigram_frac") == 0.4)       // "w x" ×2 / 5
  }

  test("d20 cross-doc ngram dup: verbatim copy scores 1.0, unique doc 0.0") {
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")   // 10 tokens → 3 8-grams
    val uniq = (1 to 10).map(i => s"u$i").mkString(" ")
    val dir = writeDocsFixture(Seq(0L -> ten, 1L -> ten, 2L -> uniq))
    val r = TextOps.crossdocNgramDup(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("shared_frac")).toMap
    assert(r(0L) == 1.0 && r(1L) == 1.0, s"copies: $r")
    assert(r(2L) == 0.0, s"unique doc: $r")
  }

  test("d20 flags exactly the docs that belong to d13's dup clusters") {
    // Cross-operator consistency on the planted corpus: a doc shares an
    // exact 8-gram with another doc iff it is in a near-dup cluster.
    val shared = TextOps.crossdocNgramDup(spark, sf0001)
      .filter(col("shared_frac") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val clustered = TextOps.dupClusters(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shared == clustered,
      s"ngram-shared ${shared -- clustered} vs clustered ${clustered -- shared}")
  }

  test("d22 vocab prune: kept_text is the in-order subsequence of surviving tokens") {
    val pruned = graft.ext.TextOps.vocabPrune(spark, sf0001).collect()
    val orig = Tables.documents(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var sawDrop = false; var sawKeep = false
    pruned.foreach { r =>
      val (id, nTok, nKept, text) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4))
      val keptToks = if (text.isEmpty) Array.empty[String] else text.split(" ")
      assert(keptToks.length == nKept, s"doc $id: ${keptToks.length} vs $nKept")
      assert(orig(id).split(" ").length == nTok)
      // kept_text must be a subsequence of the original token stream
      var it = orig(id).split(" ").iterator
      keptToks.foreach { t =>
        assert(it.contains(t), s"doc $id: '$t' out of order in reconstruction")
      }
      if (nKept < nTok) sawDrop = true
      if (nKept > 0) sawKeep = true
    }
    assert(sawDrop && sawKeep, "thresholds never triggered — spec is vacuous")
  }

  test("e10 representative is the argmax cosine against an independently computed centroid") {
    // Independent driver-side recomputation: centroids (rounded at 6, as
    // the operator pins) and cosines in plain Scala over the collected
    // sf0.001 embeddings, then compare the full (label -> representative).
    val rows = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = rows.groupBy(_._2).map { case (label, members) =>
      val dim = members.head._3.length
      val cent = Array.tabulate(dim)(d => round6(members.map(_._3(d)).sum / members.size))
      val best = members.map { case (id, _, v) =>
        val dot = v.zip(cent).map { case (a, b) => a * b }.sum
        val cos = dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(cent.map(x => x * x).sum))
        (round6(cos), id)
      }.minBy { case (cos, id) => (-cos, id) }
      label -> best._2
    }
    val got = VectorOps.centroidRepresentatives(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("d25 packing equals the sequential concatenation definition") {
    val rows = TextOps.sequencePacking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // the distributed two-level prefix sum must reproduce the sequential
    // scan: doc n+1 starts exactly where doc n ended, starting from 0
    var expectedStart = 0L
    rows.foreach { case (doc, n, start, first, last, nBlocks) =>
      assert(start == expectedStart, s"doc $doc: start $start != $expectedStart")
      assert(first == start / 256 && last == (start + n - 1) / 256)
      assert(nBlocks == last - first + 1)
      expectedStart += n
    }
  }

  test("d29 removes exactly the higher-id endpoints of the d05 pair set") {
    val losers = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(_.getLong(1)).toSet
    val all = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val kept = TextOps.applyNearDupRemoval(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(kept == all -- losers)
    assert(kept.nonEmpty && losers.nonEmpty)
  }

  test("d26 leakage counts match a driver-side recomputation over splits and pairs") {
    val split = TextOps.hashSplit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val texts = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySplit = texts.groupBy { case (id, _) => split(id) }
      .view.mapValues(_.map(_._2).toSet).toMap
    def exactLeak(a: String, b: String) =
      texts.count { case (id, t) => split(id) == b && bySplit(a).contains(t) }.toLong
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val ndLeak = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (split(r.getLong(0)), split(r.getLong(1))))
      .filter { case (a, b) => a != b }
      .groupBy { case (a, b) => if (rank(a) < rank(b)) (a, b) else (b, a) }
      .view.mapValues(_.length.toLong).toMap
    val got = TextOps.crossSplitLeakage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for (((a, b), (ex, nd)) <- got) {
      assert(ex == exactLeak(a, b), s"($a,$b) exact: $ex vs ${exactLeak(a, b)}")
      assert(nd == ndLeak.getOrElse((a, b), 0L), s"($a,$b) neardup: $nd")
    }
  }

  test("d24 bloom-prefiltered dedup equals the plain anti-join (no false negatives)") {
    val plain = TextOps.incrementalDedup(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    val bloom = TextOps.bloomIncrementalDedup(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(plain.nonEmpty)
    assert(bloom == plain)
  }

  test("d23 unigram xent matches a driver-side recomputation from corpus counts") {
    val toks = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "explode(split(text,' ')) AS tok")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = toks.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val n = toks.length.toDouble
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.unigramLogprob(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // xent = ln(N) − avg(ln c); positive because every token count ≤ N.
    assert(got.values.forall(_ > 0))
    toks.groupBy(_._1).foreach { case (doc, ts) =>
      val expected = round6(math.log(n) - ts.map(t => math.log(counts(t._2))).sum / ts.length)
      assert(math.abs(got(doc) - expected) < 2e-6, s"doc $doc: ${got(doc)} vs $expected")
    }
  }

  test("d33 bigram xent matches a driver-side recomputation from corpus counts") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val bigs = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))).toSeq
    }
    val cb = bigs.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val cf = bigs.groupBy(_._2._1).view.mapValues(_.length.toDouble).toMap
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.bigramLogprob(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // xent ≥ 0: c(w1w2) ≤ c(w1·) always, with equality only for
    // deterministic continuations
    assert(got.values.forall(_._2 >= 0))
    bigs.groupBy(_._1).foreach { case (doc, bs) =>
      val pairs = bs.map(_._2)
      val expected = round6(
        pairs.map(p => math.log(cf(p._1))).sum / pairs.length -
          pairs.map(p => math.log(cb(p))).sum / pairs.length)
      assert(got(doc)._1 == pairs.length.toLong, s"doc $doc bigram count")
      assert(math.abs(got(doc)._2 - expected) < 2e-6,
        s"doc $doc: ${got(doc)._2} vs $expected")
    }
  }

  test("d46 dup-substring spans merge overlapping windows into maximal spans") {
    def run(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val s12 = run("s", 12) // 12-token run shared by docs 0 and 1
    val z8 = run("z", 8)   // disjoint 8-token shared run
    // unique ≥8-token fillers so no boundary-straddling window duplicates
    val docA = s"$s12 ${run("a", 9)} $z8"
    val docB = s"$z8 ${run("b", 9)} $s12"
    val dir = writeDocsFixture(Seq(0L -> docA, 1L -> docB, 2L -> run("u", 20)))
    val spans = TextOps.dupSubstringSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // docA: s-run windows start at 1..5 → span [1,12]; z-run window at 22
    //   → span [22,29]. docB mirrored: z at [1,8], s at [18,29]. doc 2: none.
    assert(spans == Set(
      (0L, 1L, 12L, 12L), (0L, 22L, 29L, 8L),
      (1L, 1L, 8L, 8L), (1L, 18L, 29L, 12L)))
  }

  test("d48 substring removal cuts exactly the restated spans, keeps first holders") {
    def run(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val s12 = run("s", 12)
    val docA = s"$s12 ${run("a", 9)}"       // first holder: untouched
    val docB = s"${run("b", 9)} $s12"       // restates s12 → loses it
    val docC = run("u", 20)                  // unique: untouched
    val dir = writeDocsFixture(Seq(0L -> docA, 1L -> docB, 2L -> docC))
    val got = TextOps.applySubstringRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(0L) == ((21L, 0L, docA)), "first holder keeps its text verbatim")
    assert(got(1L) == ((21L, 12L, run("b", 9))), "later doc loses the restated span")
    assert(got(2L) == ((20L, 0L, docC)), "unique doc untouched")
  }

  test("d48 is consistent with d45 novelty and is an in-order subsequence") {
    val novelty = TextOps.ngramNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val orig = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    TextOps.applySubstringRemoval(spark, sf0001).collect().foreach { r =>
      val (id, n, rem, kept) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val toks = orig(id).split(" ")
      assert(n == toks.length.toLong, s"doc $id token count")
      val keptToks = if (kept.isEmpty) Array.empty[String] else kept.split(" ")
      assert(keptToks.length.toLong == n - rem, s"doc $id kept count")
      // kept tokens are an in-order subsequence of the original
      var i = 0
      keptToks.foreach { t =>
        while (i < toks.length && toks(i) != t) i += 1
        assert(i < toks.length, s"doc $id: '$t' out of order in kept_text")
        i += 1
      }
      // a fully-novel doc (every gram first occurs here) loses nothing
      if (novelty.get(id).contains(1.0)) assert(rem == 0L, s"doc $id novel but cut")
    }
  }

  test("gram-hash collision fallback: 8-bit buckets force the h2 exact path, results unchanged") {
    // Under honest 64-bit hashing the h2-confirm branches in
    // d20/d45/d46/d48 never fire; narrowing the posting hash to 8 bits
    // (≈2.5k distinct grams into 256 buckets on sf0.001) makes nearly
    // every bucket collide, so the exact raw-gram regroup carries the
    // whole query — and must reproduce the collision-free results bit
    // for bit, which is the entire exactness claim of the fallback.
    val names = Seq("d20_crossdoc_ngram_dup", "d45_ngram_novelty",
      "d46_dup_substring_spans", "d48_apply_substring_removal")
    def snap() = names.map { n =>
      val rows = SparkEntry.queries(n)(spark, sf0001).collect().toSeq
      spark.sharedState.cacheManager.clearCache()
      n -> rows
    }.toMap
    val base = snap()
    TextOps.gramHashBits = 8
    try {
      val collided = snap()
      names.foreach { n =>
        assert(collided(n) == base(n), s"$n drifts under forced collisions")
      }
    } finally TextOps.gramHashBits = 64
  }

  test("d47 token-budget fill equals the driver-recomputed greedy prefix") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).split(" ")
        (r.getLong(0), r.getString(1), toks.length.toLong,
          toks.distinct.length.toDouble / toks.length)
      }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val ordered = ds.sortBy { case (id, _, _, ur) => (-ur, id) }
      var cum = 0L; var kept = 0L; var toksKept = 0L
      ordered.foreach { case (_, _, nt, _) =>
        cum += nt
        if (cum <= 600L) { kept += 1; toksKept += nt }
      }
      src -> ((ds.length.toLong, kept, toksKept))
    }
    val got = TextOps.tokenBudgetFill(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // the fill is a strict prefix: kept tokens never exceed the budget
    assert(got.values.forall(_._3 <= 600L))
  }

  test("e24 IVF-PQ: probed-cell membership + driver-recomputed ADC distances") {
    val res = VectorOps.ivfPqKnn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.length == 5)
    assert(res.map(t => (t._3, t._1)).sameElements(
      res.map(t => (t._3, t._1)).sortBy(identity)), "ADC order")
    val em = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mirror the native expression's fused loop exactly (index order)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = em(0L)
    val probed = (0L until 16L).map(c => (c, cos(em(c), q)))
      .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
    def sub(v: Array[Double], j: Int) = v.slice(8 * j, 8 * (j + 1))
    def l2r(a: Array[Double], b: Array[Double]) =
      r6(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val qd2 = Array.tabulate(8, 16)((j, c) => l2r(sub(q, j), sub(em(c.toLong), j)))
    res.foreach { case (id, cell, adc) =>
      val myCell = (0L until 16L).map(c => (c, cos(em(c), em(id))))
        .sortBy { case (c, s) => (-s, c) }.head._1
      assert(cell == myCell, s"vec $id assigned cell")
      assert(probed.contains(cell), s"vec $id outside probed cells")
      val walk = r6((0 until 8).map { j =>
        val code = (0 until 16)
          .map(c => (l2r(sub(em(id), j), sub(em(c.toLong), j)), c)).min._2
        qd2(j)(code)
      }.sum)
      assert(adc == walk, s"vec $id ADC $adc vs driver walk $walk")
    }
  }

  test("e26 IVF recall ladder: driver-recomputed hits, monotone in nprobe") {
    val em = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = em.map { case (id, v) =>
      id -> (0L until 16L).map(c => (c, cos(em(c), v)))
        .sortBy { case (c, s) => (-s, c) }.head._1
    }
    val got = VectorOps.ivfRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got.map(_._1) == (0L until 10L).toSeq, "one row per query, in order")
    got.foreach { case (qid, h1, h2) =>
      val qv = em(qid)
      val probes = (0L until 16L).map(c => (c, cos(em(c), qv)))
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1)
      def top5(ids: Iterable[Long]) = ids.toSeq
        .map(id => (r6(cos(em(id), qv)), id))
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
      val exact = top5(em.keys.filter(_ != qid))
      val e1 = top5(em.keys.filter(id => id != qid && cells(id) == probes.head))
      val e2 = top5(em.keys.filter(id => id != qid && probes.contains(cells(id))))
      assert(h1 == (exact & e1).size.toLong, s"q$qid nprobe=1 hits")
      assert(h2 == (exact & e2).size.toLong, s"q$qid nprobe=2 hits")
      assert(h2 >= h1, s"q$qid recall must be monotone in nprobe")
    }
  }

  test("e25 k-means codebook equals a driver-recomputed two-round Lloyd loop") {
    val em = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def assign(cb: Seq[(Long, Array[Double])]): Map[Long, Long] =
      em.map { case (id, v) =>
        id -> cb.map { case (c, cv) => (c, cos(v, cv)) }
          .sortBy { case (c, s) => (-s, c) }.head._1
      }.toMap
    def centroids(a: Map[Long, Long]): Seq[(Long, Array[Double])] =
      em.groupBy { case (id, _) => a(id) }.toSeq.sortBy(_._1)
        .map { case (cell, members) =>
          val dim = members.head._2.length
          cell -> Array.tabulate(dim)(i =>
            r6(members.map(_._2(i)).sum) / members.length)
        }
    val cb0 = em.filter(_._1 < 16).toSeq
    val a2 = assign(centroids(assign(cb0)))
    val cb2 = centroids(a2).toMap
    val expected = a2.groupBy(_._2).map { case (cell, ms) =>
      val cohesion = r6(
        r6(ms.keys.toSeq.sorted.map(id => cos(em.toMap.apply(id), cb2(cell))).sum)
          / ms.size)
      cell -> ((ms.size.toLong, cohesion))
    }
    val got = VectorOps.kmeansCodebook(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet, "surviving cells")
    got.foreach { case (cell, (n, coh)) =>
      assert(n == expected(cell)._1, s"cell $cell member count")
      // sums run in a different order driver-side; the 6-dp rounding is
      // the cross-engine agreement layer, so tolerate one last-digit ulp
      assert(math.abs(coh - expected(cell)._2) < 2e-6,
        s"cell $cell cohesion $coh vs ${expected(cell)._2}")
    }
  }

  test("d69 Kneser-Ney: conditionals sum to 1 per context; xent equals driver recompute") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text,' ') AS toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray)
      .filter(_._2.length >= 2)
    val bigs = docs.flatMap { case (id, toks) =>
      toks.sliding(2).map(p => (id, p(0), p(1))) }
    val cb = bigs.groupBy(b => (b._2, b._3)).view.mapValues(_.length.toLong).toMap
    val cf = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val n1tot = cb.size.toLong
    val D = 0.75
    def p(w1: String, w2: String): Double =
      math.max(cb((w1, w2)) - D, 0.0) / cf(w1) +
        D * n1f(w1) / cf(w1) * (n1b(w2).toDouble / n1tot)
    // THE KN self-consistency identity: over the observed successor set,
    // discounted mass + redistributed continuation mass telescope to 1
    // exactly — Σ max(c−D,0)/cf = (cf − D·n1f)/cf and λ·Σ p_cont covers
    // the rest because Σ_w2 N1+(·w2) = N1+(··). A formula typo (wrong
    // normalizer, wrong discount placement) breaks this immediately.
    cf.keys.foreach { w1 =>
      val succ = cb.keys.filter(_._1 == w1).map(_._2).toSet
      val mass = succ.toSeq.map(w2 => p(w1, w2)).sum
      val cont = (n1b.keySet -- succ).toSeq
        .map(w2 => D * n1f(w1) / cf(w1) * (n1b(w2).toDouble / n1tot)).sum
      assert(math.abs(mass + cont - 1.0) < 1e-9, s"context '$w1' mass ${mass + cont}")
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bigs.groupBy(_._1).map { case (id, bs) =>
      id -> ((bs.length.toLong,
        r6(-bs.map(b => math.log(p(b._2, b._3))).sum / bs.length)))
    }
    val got = TextOps.knBigramScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (n, x)) =>
      assert(n == expected(id)._1, s"doc $id n_bigrams")
      assert(math.abs(x - expected(id)._2) < 2e-6, s"doc $id xent $x vs ${expected(id)._2}")
    }
    // the continuation correction must actually bite on this corpus:
    // KN and raw-bigram xent orderings differ somewhere
    val d33 = TextOps.bigramLogprob(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ids = got.keySet.toSeq.sorted
    assert(ids.exists(a => ids.exists(b =>
      (got(a)._2 - got(b)._2) * (d33(a) - d33(b)) < 0)),
      "expected at least one rank flip between KN and raw bigram xent")
  }

  test("e32 cluster-balanced resample equals a driver-recomputed per-cell draw") {
    val em = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cb = em.filter(_._1 < 16).toSeq
    val cellOf = em.map { case (id, v) =>
      id -> cb.map { case (c, cv) => (c, cos(v, cv)) }
        .sortBy { case (c, s) => (-s, c) }.head._1
    }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(x: Long): Long = {
      val hex = md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000000L
    }
    val quota = math.max(1L, math.ceil(em.length / 32.0).toLong)
    val expected = cellOf.groupBy(_._2).flatMap { case (cell, ms) =>
      ms.keys.toSeq.sortBy(id => (draw(id), id)).take(quota.toInt)
        .map(id => (cell, id) -> ms.size.toLong)
    }
    val got = VectorOps.clusterBalancedResample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(got.nonEmpty)
    assert(got.keySet == expected.keySet, {
      val miss = expected.keySet -- got.keySet; val extra = got.keySet -- expected.keySet
      s"kept-set drift: missing $miss extra $extra"
    })
    got.foreach { case (k @ (cell, _), (size, q)) =>
      assert(size == expected(k), s"cell $cell size")
      assert(q == quota, s"quota column")
    }
    // the balance property itself: no cell exceeds the quota, and a
    // dense cell is actually cut (this corpus has at least one)
    val perCell = got.keySet.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCell.values.forall(_ <= quota))
    assert(cellOf.groupBy(_._2).exists { case (c, ms) =>
      ms.size > quota && perCell(c) == quota }, "expected at least one cut cell")
  }

  test("e33 trained PQ codebook equals a driver-recomputed per-subspace Lloyd loop") {
    val em = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      r6(s) // the 6-dp pre-argmin round both engines apply
    }
    // per-subspace Lloyd, subspace j = dims [8j, 8j+8)
    val subs = (0 until 8).map { j =>
      j -> em.map { case (id, v) => id -> v.slice(8 * j, 8 * j + 8) }
    }.toMap
    def assign(j: Int, cb: Seq[(Long, Array[Double])]): Map[Long, Long] =
      subs(j).map { case (id, sv) =>
        id -> cb.map { case (c, cv) => (c, l2(sv, cv)) }
          .sortBy { case (c, d) => (d, c) }.head._1
      }.toMap
    def centroids(j: Int, a: Map[Long, Long]): Seq[(Long, Array[Double])] =
      subs(j).groupBy { case (id, _) => a(id) }.toSeq.sortBy(_._1)
        .map { case (code, members) =>
          code -> Array.tabulate(8)(i =>
            r6(members.map(_._2(i)).sum) / members.length)
        }
    val expected = (0 until 8).flatMap { j =>
      val cb0 = subs(j).filter(_._1 < 16).map { case (id, sv) => (id, sv) }.toSeq
      val a2 = assign(j, centroids(j, assign(j, cb0)))
      val cb2 = centroids(j, a2).toMap
      a2.groupBy(_._2).map { case (code, ms) =>
        val mse = r6(r6(ms.keys.toSeq.sorted
          .map(id => l2(subs(j).toMap.apply(id), cb2(code))).sum) / ms.size)
        (j.toLong, code) -> ((ms.size.toLong, mse))
      }
    }.toMap
    val got = VectorOps.pqCodebookTrain(spark, sf0001).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet, "surviving (subspace, code) cells")
    got.foreach { case (k, (n, mse)) =>
      assert(n == expected(k)._1, s"cell $k member count")
      // driver sums fold in a different order; 6-dp rounding is the
      // agreement layer — tolerate one last-digit ulp as in e25
      assert(math.abs(mse - expected(k)._2) < 2e-6,
        s"cell $k mse $mse vs ${expected(k)._2}")
    }
  }

  test("d49 cluster-safe split: near-dups never straddle splits; roots and buckets check out") {
    val labels = TextOps.dupClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = TextOps.clusterSafeSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    assert(labels.values.toSet.size > 1, "corpus should contain real clusters")
    // root = d13 cluster label for clustered docs, own id for singletons
    out.foreach { case (id, root, _, _) =>
      assert(root == labels.getOrElse(id, id), s"doc $id root") }
    // THE contract: every cluster lands entirely in one split, so no
    // near-dup pair can straddle train/test — checked both ways
    out.groupBy(_._2).foreach { case (root, members) =>
      assert(members.map(_._4).toSet.size == 1, s"cluster $root straddles") }
    val splitOf = out.map(t => t._1 -> t._4).toMap
    val pairs = TextOps.jaccardDupPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(splitOf(r.getLong(0)) == splitOf(r.getLong(1)),
        s"pair ${r.getLong(0)}~${r.getLong(1)} split leak") }
    // bucket is md5-60 of the ROOT id (not the doc id) — recomputed here
    val md = java.security.MessageDigest.getInstance("MD5")
    def b(x: Long): Long = {
      val hex = md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    out.foreach { case (_, root, bucket, split) =>
      assert(bucket == b(root), s"root $root bucket")
      val want = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split == want)
    }
  }

  test("d51 PageRank equals a driver-recomputed 3-round power iteration") {
    val pairs = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = deg.keys.map(_ -> 1.0).toMap
    (1 to 3).foreach { _ =>
      val sums = scala.collection.mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
      edges.foreach { case (s, d) => sums(d) += pr(s) / deg(s) }
      // HALF_UP vs rint differ only ON a boundary; tolerance covers it
      pr = deg.keys.map(k => k -> math.rint((0.15 + 0.85 * sums(k)) * 1e6) / 1e6).toMap
    }
    val got = TextOps.dupGraphPagerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == deg.keySet, "node cover")
    got.foreach { case (id, dg, p) =>
      assert(dg == deg(id), s"doc $id degree")
      assert(math.abs(p - pr(id)) < 2e-6, s"doc $id pr $p vs ${pr(id)}")
    }
  }

  test("d52 logreg equals a driver-side reference GD loop and beats the base rate") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val docs = Tables.documents(spark, sf0001).select("text").collect().map(_.getString(0))
    val rows = docs.map { t =>
      val toks = t.split(" ")
      val nStop = toks.count(stop)
      val y = if (toks.length >= 20 && toks.length <= 400 &&
        nStop * 1.0 / toks.length >= 0.05) 1.0 else 0.0
      (y, Array(nStop * 1.0 / toks.length,
        toks.distinct.length * 1.0 / toks.length, math.log(toks.length)))
    }
    val n = rows.length.toDouble
    val ms = (0 to 2).map(j => rnd6(rows.map(_._2(j)).sum / n))
    val ss = (0 to 2).map(j =>
      rnd6(math.sqrt(rows.map(r => math.pow(r._2(j) - rows.map(_._2(j)).sum / n, 2)).sum / n)))
    val xs = rows.map { case (y, f) =>
      (y, (0 to 2).map(j => (f(j) - ms(j)) / ss(j)).toArray) }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    (1 to 8).foreach { _ =>
      val g = Array(0.0, 0.0, 0.0, 0.0)
      xs.foreach { case (y, x) =>
        val e = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x(0) + w(2) * x(1) + w(3) * x(2)))) - y
        g(0) += e; g(1) += e * x(0); g(2) += e * x(1); g(3) += e * x(2) }
      w = w.zipWithIndex.map { case (wj, j) => rnd6(wj - 5.0 * g(j) / n) }
    }
    val ps = xs.map { case (y, x) =>
      (y, 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x(0) + w(2) * x(1) + w(3) * x(2))))) }
    val acc = ps.count { case (y, p) => (p >= 0.5) == (y == 1.0) } / n
    val base = math.max(xs.count(_._1 == 1.0), xs.count(_._1 == 0.0)) / n
    val got = TextOps.qualityLogreg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("accuracy", "mean_p_neg", "mean_p_pos",
      "w_bias", "w_ln_tokens", "w_stop_ratio", "w_uniq_ratio"))
    // the model must actually learn, not parrot the majority class
    assert(got("accuracy") > base + 0.05, s"acc ${got("accuracy")} vs base $base")
    assert(got("mean_p_pos") > got("mean_p_neg") + 0.2, "class separation")
    assert(math.abs(got("accuracy") - acc) < 2e-6)
    assert(math.abs(got("w_bias") - w(0)) < 2e-6, s"bias ${got("w_bias")} vs ${w(0)}")
    assert(math.abs(got("w_stop_ratio") - w(1)) < 2e-6)
    assert(math.abs(got("w_uniq_ratio") - w(2)) < 2e-6)
    assert(math.abs(got("w_ln_tokens") - w(3)) < 2e-6)
  }

  test("d53 decontamination removes exactly d18's flagged train docs") {
    graft.functions.GraftFunctions.register(spark)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val all = Tables.documents(spark, sf0001).select("doc_id").collect().map(_.getLong(0))
    val train = all.filter(bucket(_) < 95).toSet
    val flagged = TextOps.contamination(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "fixture should contain planted contamination")
    assert(flagged.subsetOf(train), "flagged ids must be train-side")
    val kept = TextOps.applyDecontamination(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(kept == train -- flagged)
  }

  test("e27 kNN graph: ranks monotone, neighbors distinct, candidate symmetry holds") {
    val rows = VectorOps.knnGraph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_._1)
    byVec.foreach { case (v, ns) =>
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"vec $v ranks")
      assert(sorted.map(_._3).distinct.length == sorted.length, s"vec $v dup neighbor")
      // heap order: cos non-increasing, ties ascending by neighbor id
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._4 > y._4 || (x._4 == y._4 && x._3 < y._3), s"vec $v order")
        case _ =>
      }
      assert(!sorted.exists(_._3 == v), s"vec $v self-edge")
    }
    // candidate symmetry: an edge a→b means b also scored a; so either a
    // is in b's list, or b's list is full and its worst entry outranks a
    rows.foreach { case (a, _, b, c) =>
      val bl = byVec(b).sortBy(_._2)
      val ok = bl.exists(_._3 == a) ||
        (bl.length == 3 && {
          val w = bl.last
          w._4 > c || (w._4 == c && w._3 < a)
        })
      assert(ok, s"edge $a->$b (c=$c) not reflected in $b's candidates")
    }
  }

  test("d54 held-out xent matches a driver recomputation; OOV carries the UNK mass") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    docs.filter(d => bucket(d._1) < 80).foreach(_._2.split(" ", -1)
      .foreach(t => cnt(t) = cnt.getOrElse(t, 0L) + 1L))
    val denom = (cnt.values.sum + cnt.size + 1).toDouble
    val got = TextOps.heldoutPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val evalDocs = docs.filter(d => bucket(d._1) >= 90)
    assert(evalDocs.nonEmpty && got.keySet == evalDocs.map(_._1).toSet)
    evalDocs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val oov = toks.count(t => !cnt.contains(t))
      val xent = math.log(denom) - toks.map(t => math.log(cnt.getOrElse(t, 0L) + 1.0)).sum / toks.length
      val (n, nOov, rate, x) = got(id)
      assert(n == toks.length && nOov == oov, s"doc $id counts")
      assert(rate == oov.toDouble / toks.length, s"doc $id oov rate")
      assert(math.abs(x - xent) < 2e-6, s"doc $id xent $x vs $xent")
    }
    // the shared-vocab fixture has no OOV eval tokens, so the UNK path is
    // exercised on a crafted corpus: doc 1 buckets train (48), doc 0
    // buckets test (98); "zzz" never occurs in train
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d54oov").toString
    Seq((1L, "alpha beta alpha", "en", "web", 16L),
        (0L, "alpha zzz", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val crafted = TextOps.heldoutPerplexity(spark, tmp).collect()
    assert(crafted.length == 1 && crafted(0).getLong(0) == 0L)
    // train: N=3 tokens, V=2 types → denom 6; eval "alpha zzz": c = (2, 0)
    assert(crafted(0).getLong(2) == 1L, "zzz must count as OOV")
    val want = math.log(6.0) - (math.log(3.0) + math.log(1.0)) / 2
    assert(math.abs(crafted(0).getDouble(4) - want) < 2e-6, "UNK mass xent")
  }

  test("d55 temperature weights match a driver recompute; boost is monotone in share") {
    val rows = TextOps.temperatureMixture(spark, sf0001).collect()
    assert(rows.length > 1)
    val toks = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val tt = toks.values.sum.toDouble
    val ps = toks.view.mapValues(_ / tt).toMap
    def wAt(alpha: Double): Map[String, Double] = {
      val d = ps.values.map(math.pow(_, alpha)).sum
      ps.view.mapValues(math.pow(_, alpha) / d).toMap
    }
    val (w7, w5) = (wAt(0.7), wAt(0.5))
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getDouble(3) == ps(src), s"$src p must be the exact division")
      assert(math.abs(r.getDouble(4) - w7(src)) < 2e-6, s"$src w_t07")
      assert(math.abs(r.getDouble(5) - w5(src)) < 2e-6, s"$src w_t05")
      assert(math.abs(r.getDouble(6) - w7(src) / ps(src)) < 2e-6, s"$src boost_t07")
      assert(math.abs(r.getDouble(7) - w5(src) / ps(src)) < 2e-6, s"$src boost_t05")
    }
    // each α's weights are a distribution, and the boost p^(α-1)/Σp^α is
    // strictly decreasing in share — smaller sources always oversample
    // the emitted weights carry the 6-dp display pin, so the sum is 1
    // only to within n · 5e-7 rounding slack
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < rows.length * 5e-7)
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < rows.length * 5e-7)
    val byShare = rows.sortBy(_.getDouble(3))
    byShare.sliding(2).foreach {
      case Array(lo, hi) if lo.getDouble(3) < hi.getDouble(3) =>
        assert(lo.getDouble(6) > hi.getDouble(6), "boost_t07 monotone")
        assert(lo.getDouble(7) > hi.getDouble(7), "boost_t05 monotone")
      case _ =>
    }
  }

  test("d56 BPE encoding equals the reference symbolization summed per source") {
    // reference trainer (same as the d50 test), then APPLY per source
    val docs = Tables.documents(spark, sf0001).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach(_._2.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    var syms: Map[String, Vector[String]] =
      words.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    (1 to 3).foreach { _ =>
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        val sq = syms(w)
        (0 until sq.length - 1).foreach { i =>
          pc((sq(i), sq(i + 1))) = pc.getOrElse((sq(i), sq(i + 1)), 0L) + c } }
      val ((a, b), _) = pc.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
      syms = syms.map { case (w, sq) =>
        val nb = Vector.newBuilder[String]; var i = 0
        while (i < sq.length) {
          if (i < sq.length - 1 && sq(i) == a && sq(i + 1) == b) { nb += (a + b); i += 2 }
          else { nb += sq(i); i += 1 }
        }
        w -> nb.result() }
    }
    val expect = docs.groupBy(_._1).view.mapValues { ds =>
      val ws = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
      (ws.length.toLong, ws.map(_.length.toLong).sum, ws.map(w => syms(w).length.toLong).sum)
    }.toMap
    val got = TextOps.bpeEncode(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (src, (nw, nc, nb, cpt)) =>
      val (ew, ec, eb) = expect(src)
      assert((nw, nc, nb) == ((ew, ec, eb)), s"source $src counts")
      assert(cpt == ec.toDouble / eb, s"source $src fertility")
      assert(nb <= ec && nb >= 1, s"source $src: merges can only shorten")
    }
  }

  test("d50 BPE merges equal a driver-side reference trainer (greedy scan semantics)") {
    val got = TextOps.bpeMerges(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length == 3)
    // independent reference: word-frequency BPE, same tie order (count
    // DESC, then lexicographic pair), textbook greedy left-to-right merge
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    Tables.documents(spark, sf0001).select("text").collect().foreach { r =>
      r.getString(0).split(" ").filter(_.nonEmpty)
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L) }
    var syms: Map[String, Vector[String]] =
      words.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    (1 to 3).foreach { round =>
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        val s = syms(w)
        (0 until s.length - 1).foreach { i =>
          pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + c } }
      val ((a, bb), cnt) = pc.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
      assert(got(round - 1) == ((round.toLong, a, bb, a + bb, cnt)),
        s"round $round merge diverges from reference")
      syms = syms.map { case (w, s) =>
        val nb = Vector.newBuilder[String]; var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == bb) { nb += (a + bb); i += 2 }
          else { nb += s(i); i += 1 }
        }
        w -> nb.result() }
    }
  }

  test("d57 triangles equal a driver-recomputed brute-force count; cc in [0,1]") {
    val pairs = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    // brute force: count unordered vertex triples whose 3 edges all exist
    val tri = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    pairs.foreach { case (a, b) => // a < b by construction
      adj(a).filter(c => c > b && pairs((b, c))).foreach { c =>
        tri(a) += 1; tri(b) += 1; tri(c) += 1
      }
    }
    val got = TextOps.dupGraphTriangles(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == deg.keySet, "node cover")
    got.foreach { case (id, dg, t, cc) =>
      assert(dg == deg(id), s"doc $id degree")
      assert(t == tri(id), s"doc $id triangles $t vs ${tri(id)}")
      assert(cc >= 0.0 && cc <= 1.0, s"doc $id clustering $cc out of range")
      val expectCc = if (dg >= 2) 2.0 * t / (dg * (dg - 1)) else 0.0
      assert(cc == expectCc, s"doc $id clustering $cc vs $expectCc")
    }
    // at least one fully-connected cluster exists in the planted corpus:
    // some node must close a triangle (or the assertion set is vacuous)
    assert(got.exists(_._3 > 0), "planted dup clusters of size >= 3 should triangle")
  }

  test("d58 zipf fit equals a driver-side OLS over the true top-K per source") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val docs = Tables.documents(spark, sf0001).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    val expect = bySource.map { case (src, rows) =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach(_._2.split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
      val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(TextOps.ZipfTopK)
      val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val n = xy.length.toDouble
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      src -> ((counts.size.toLong, xy.length.toLong, slope, intercept, r2))
    }
    val got = TextOps.zipfFit(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet, "source cover")
    expect.foreach { case (src, (nv, nr, sl, ic, r2)) =>
      val (gnv, gnr, gsl, gic, gr2) = got(src)
      assert(gnv == nv, s"$src vocab")
      assert(gnr == nr, s"$src ranks")
      assert(math.abs(gsl - rnd6(sl)) < 2e-6, s"$src slope $gsl vs $sl")
      assert(math.abs(gic - rnd6(ic)) < 2e-6, s"$src intercept $gic vs $ic")
      assert(math.abs(gr2 - rnd6(r2)) < 2e-6, s"$src r2 $gr2 vs $r2")
      // a Zipf-tailed corpus decays: slope strictly negative, fit meaningful
      assert(gsl < 0.0, s"$src slope should be negative, got $gsl")
      assert(gr2 > 0.0 && gr2 <= 1.0, s"$src r2 $gr2 out of range")
    }
  }

  test("d59 JSD matches a driver-side union recompute; bounded and symmetric-safe") {
    val docs = Tables.documents(spark, sf0001).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dist = docs.groupBy(_._1).map { case (src, rows) =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach(_._2.split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
      val tot = counts.values.sum.toDouble
      src -> counts.view.mapValues(_ / tot).toMap
    }
    val ln2 = math.log(2.0)
    def jsd(p: Map[String, Double], q: Map[String, Double]): Double = {
      val toks = p.keySet ++ q.keySet
      toks.toSeq.map { t =>
        val (a, b) = (p.getOrElse(t, 0.0), q.getOrElse(t, 0.0))
        val s1 = if (a > 0) a * math.log(2.0 * a / (a + b)) else 0.0
        val s2 = if (b > 0) b * math.log(2.0 * b / (a + b)) else 0.0
        0.5 * (s1 + s2)
      }.sum
    }
    val got = TextOps.sourceDivergence(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val srcs = dist.keys.toSeq.sorted
    val expectPairs = (for {
      i <- srcs.indices; k <- (i + 1) until srcs.length
    } yield (srcs(i), srcs(k))).toSet
    assert(got.keySet == expectPairs, "pair cover")
    expectPairs.foreach { case (a, b) =>
      val (nc, j, jn) = got((a, b))
      val ej = jsd(dist(a), dist(b))
      assert(math.abs(j - ej) < 2e-6, s"($a,$b) jsd $j vs $ej")
      assert(math.abs(jn - ej / ln2) < 2e-6, s"($a,$b) jsd_norm")
      assert(j >= 0.0 && j <= ln2 + 1e-9, s"($a,$b) jsd $j out of [0, ln2]")
      assert(nc == (dist(a).keySet & dist(b).keySet).size.toLong,
        s"($a,$b) n_common")
    }
    assert(got.values.exists(_._1 > 0), "some pair should share vocabulary")
  }

  test("e28 first PC equals a driver-side pinned power iteration; ratio in (0,1]") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val vecsArr = Tables.embeddings(spark, sf0001)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecsArr.length.toDouble
    val dim = vecsArr.head.length
    val mu = (0 until dim).map(i => rnd6(vecsArr.map(_(i)).sum) / n).toArray
    val cen = vecsArr.map(v => v.indices.map(i => v(i) - mu(i)).toArray)
    val c = Array.tabulate(dim, dim)((i, j) =>
      rnd6(cen.map(v => v(i) * v(j)).sum) / n)
    var u = Array.fill(dim)(0.125)
    (1 to 3).foreach { _ =>
      val w = (0 until dim).map(i =>
        rnd6((0 until dim).map(j => c(i)(j) * u(j)).sum)).toArray
      val nrm = math.sqrt(w.map(x => x * x).sum)
      u = w.map(x => rnd6(x / nrm))
    }
    val lam = rnd6((for (i <- 0 until dim; j <- 0 until dim)
      yield c(i)(j) * u(i) * u(j)).sum)
    val trace = rnd6((0 until dim).map(i => c(i)(i)).sum)
    val rows = VectorOps.pcaPowerIteration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == dim)
    rows.foreach { case (d, loading, eig, ratio) =>
      assert(math.abs(loading - u(d.toInt)) < 2e-6, s"dim $d loading")
      assert(math.abs(eig - lam) < 2e-6, s"eigenvalue $eig vs $lam")
      assert(math.abs(ratio - rnd6(lam / trace)) < 2e-6, "explained ratio")
      assert(ratio > 0.0 && ratio <= 1.0, s"ratio $ratio out of (0,1]")
    }
    // the final iterate is unit-length up to the coordinate pin
    val norm = math.sqrt(rows.map(r => r._2 * r._2).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"PC norm $norm")
  }

  test("e29 JL audit equals a driver recompute; ratios concentrate near 1") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      (0 until 8).foreach(k => acc = (acc << 8) | (d(k) & 0xffL))
      acc >>> 4
    }
    val sgn = Array.tabulate(16, 64)((j, i) =>
      if (md5_60(s"jl-$j-$i") % 2 == 0) 1.0 else -1.0)
    val vecsById = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(16)(j => rnd6(0.25 *
        v.indices.foldLeft(0.0)((a, i) => a + v(i) * sgn(j)(i))))
    def d2(a: Array[Double], b: Array[Double]): Double =
      rnd6(a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i))))
    val got = VectorOps.jlProjectionAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length == vecsById.size / 2, "one pair per consecutive even id")
    got.foreach { case (a, b, dOrig, dProj, ratio) =>
      assert(b == a + 1 && a % 2 == 0, s"pair ($a,$b) shape")
      val (va, vb) = (vecsById(a), vecsById(b))
      assert(math.abs(dOrig - d2(va, vb)) < 2e-6, s"($a,$b) d2_orig")
      assert(math.abs(dProj - d2(proj(va), proj(vb))) < 2e-6, s"($a,$b) d2_proj")
      assert(math.abs(ratio - rnd6(dProj / dOrig)) < 2e-6, s"($a,$b) ratio")
    }
    // JL lemma: E[ratio] = 1 for +-1/sqrt(k) projections; the sample mean
    // over 250 pairs concentrates well inside this loose band
    val mean = got.map(_._5).sum / got.length
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean not near 1")
  }

  test("d60 shingle Heaps curve equals a driver recompute; vocab strictly grows") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length
    def shingles(t: String): Seq[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Seq.empty
      else (0 until toks.length - 2).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
    }
    val first = scala.collection.mutable.HashMap.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      shingles(t).foreach(g => if (!first.contains(g)) first(g) = id) }
    val docsB = Array.fill(10)(0L); val shB = Array.fill(10)(0L)
    docs.foreach { case (id, t) =>
      val b = (id * 10 / n).toInt
      docsB(b) += 1; shB(b) += math.max(t.split(" ", -1).length - 2, 0) }
    val vocB = Array.fill(10)(0L)
    first.values.foreach(fd => vocB((fd * 10 / n).toInt) += 1)
    val exp = (0 until 10).map { d =>
      (d + 1, docsB.take(d + 1).sum, shB.take(d + 1).sum, vocB.take(d + 1).sum) }
    val xy = exp.map(e => (math.log(e._3.toDouble), math.log(e._4.toDouble)))
    val m = xy.length.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val lnk = (sy - beta * sx) / m
    val got = TextOps.shingleHeaps(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length == 10)
    got.zip(exp).foreach { case ((gd, gn, gs, gv, gb, gk), (ed, en, es, ev)) =>
      assert(gd == ed && gn == en && gs == es, s"decile $ed prefix counts")
      assert(gv == ev, s"decile $ed vocab $gv vs $ev")
      assert(math.abs(gb - rnd6(beta)) < 2e-6, s"beta $gb vs $beta")
      assert(math.abs(gk - rnd6(lnk)) < 2e-6, s"lnk $gk vs $lnk")
    }
    // the shingle vocabulary must actually GROW through the deciles (the
    // property that makes this fit non-degenerate, unlike token-level Heaps)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 > a._4, s"vocab stalled between deciles ${a._1} and ${b._1}") }
    assert(got.head._5 > 0.0 && got.head._5 < 1.0, s"beta ${got.head._5} out of (0,1)")
  }

  test("d61 MinHash estimate equals a driver recompute; estimator calibrated") {
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      (0 until 8).foreach(k => acc = (acc << 8) | (d(k) & 0xffL))
      acc >>> 4
    }
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 until toks.length - 2)
        .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val shMap = docs.map { case (id, t) => id -> shingles(t) }.toMap
    def sig(id: Long): Array[Long] =
      Array.tabulate(16)(p => shMap(id).map(g => md5_60(s"mh-$p-$g")).min)
    val got = TextOps.minhashEstimateAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, j, est, err) =>
      val ej = {
        val (sa, sb) = (shMap(a), shMap(b))
        (sa & sb).size.toDouble / (sa | sb).size
      }
      assert(j == ej, s"($a,$b) exact jaccard")
      val eest = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 16.0
      assert(est == eest, s"($a,$b) estimate $est vs $eest")
      assert(err == est - j, s"($a,$b) err")
      assert(est >= 0.0 && est <= 1.0)
    }
    // estimator calibration: E[est] = J, sigma ~ sqrt(J(1-J)/16) <= 0.125 —
    // the mean ABSOLUTE error over >= 25 pairs sits well inside 2 sigma
    val mae = got.map(g => math.abs(g._5)).sum / got.length
    assert(mae < 0.25, s"mean |err| $mae suggests a broken estimator")
  }

  test("d62 BM25 equals a driver recompute; ranks contiguous, scores monotone") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val tf = docs.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val n = docs.length.toLong
    val sumDl = dl.values.sum
    val qterms = dfm.toSeq.sortBy { case (t, d) => (d, t) }.take(8)
    def score(t: String, id: Long): Double = {
      val (tfv, dfv, dlv) = (tf((id, t)).toDouble, dfm(t).toDouble, dl(id).toDouble)
      val raw = math.log(1.0 + (n.toDouble - dfv + 0.5) / (dfv + 0.5)) *
        (tfv * 2.2) / (tfv + 1.2 * (0.25 + 0.75 * (dlv * 1.0 * n / sumDl)))
      math.rint(raw * 1e6) / 1e6
    }
    val expected = qterms.flatMap { case (t, _) =>
      docs.collect { case (id, _) if tf.contains((id, t)) => (t, id, score(t, id)) }
        .sortBy { case (_, id, sc) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((tt, id, sc), i) => (tt, i + 1, id) -> sc }
    }.toMap
    val got = TextOps.bm25Retrieval(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.keySet == expected.keySet,
      s"missing ${expected.keySet -- got.keySet}; extra ${got.keySet -- expected.keySet}")
    expected.foreach { case (k, sc) =>
      assert(math.abs(got(k) - sc) < 1.5e-6, s"$k: ${got(k)} vs $sc") }
    // per-term ranks are 1..k with non-increasing scores
    got.groupBy(_._1._1).foreach { case (t, rows) =>
      val byRank = rows.toSeq.sortBy(_._1._2)
      assert(byRank.map(_._1._2) == (1 to byRank.length), s"ranks for $t")
      assert(byRank.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"scores not monotone for $t")
    }
  }

  test("d63 DSIR weights equal a driver recompute; en docs score higher on average") {
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      (0 until 8).foreach(k => acc = (acc << 8) | (d(k) & 0xffL))
      acc >>> 4
    }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
      .filter(_._3.length >= 2)
    def feats(ts: Array[String]): Seq[Long] =
      (0 until ts.length - 1).map(i => md5_60(s"ds:${ts(i)} ${ts(i + 1)}") % 1024)
    val all = docs.flatMap { case (id, lang, ts) => feats(ts).map((id, lang, _)) }
    val cr = all.groupBy(_._3).map { case (f, v) => f -> v.length.toLong }
    val ct = all.filter(_._2 == "en").groupBy(_._3)
      .map { case (f, v) => f -> v.length.toLong }
    val (nr, nt) = (cr.values.sum.toDouble, ct.values.sum.toDouble)
    val got = TextOps.dsirWeights(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == docs.length)
    val lw = got.map(g => g._1 -> g._3).toMap
    docs.foreach { case (id, _, ts) =>
      val fs = feats(ts)
      val exp = fs.map(f => math.log((ct.getOrElse(f, 0L) + 1.0) / (cr(f) + 1.0))).sum -
        fs.length * math.log((nt + 1024.0) / (nr + 1024.0))
      assert(math.abs(lw(id) - exp) < 2e-6, s"doc $id: ${lw(id)} vs $exp")
    }
    // the selection signal points at the target: en mean beats non-en mean
    val byLang = docs.map { case (id, lang, _) => (lang, lw(id)) }
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val en = mean(byLang.toSeq.filter(_._1 == "en").map(_._2))
    val rest = mean(byLang.toSeq.filter(_._1 != "en").map(_._2))
    assert(en > rest, s"en mean $en should exceed non-en mean $rest")
  }

  test("d64 stupid backoff equals a driver recompute; backoff path exercised") {
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      (0 until 8).foreach(k => acc = (acc << 8) | (d(k) & 0xffL))
      acc >>> 4
    }
    def bucket(id: Long): Long = md5_60(id.toString) % 100
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val train = docs.filter(d => bucket(d._1) < 80)
    val test_ = docs.filter(d => bucket(d._1) >= 90).filter(_._2.length >= 2)
    def bigrams(ts: Array[String]) =
      (0 until ts.length - 1).map(i => (ts(i), ts(i + 1)))
    val cb = train.filter(_._2.length >= 2).flatMap(d => bigrams(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cf = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val cu = train.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val nt = cu.values.sum.toDouble
    val got = TextOps.stupidBackoff(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet == test_.map(_._1).toSet)
    var anyBackoff = false
    test_.foreach { case (id, ts) =>
      val bs = bigrams(ts)
      val scores = bs.flatMap { case (w1, w2) =>
        if (cb.contains((w1, w2))) Some(math.log(cb((w1, w2)) * 1.0 / cf(w1)))
        else if (cu.contains(w2)) Some(math.log(0.4 * cu(w2) / nt))
        else None
      }
      val nBackoff = bs.count { case (w1, w2) =>
        !cb.contains((w1, w2)) && cu.contains(w2) }
      val nOov = bs.count { case (_, w2) => !cu.contains(w2) }
      anyBackoff ||= nBackoff > 0
      val (gn, gb, go, gs) = got(id)
      assert(gn == bs.length && gb == nBackoff && go == nOov, s"counts for $id")
      assert(math.abs(gs - scores.sum / scores.length) < 2e-6, s"score for $id")
    }
    assert(anyBackoff, "corpus should exercise the backoff path")
  }

  test("d65 fuzzy decontamination equals a driver winnow recompute") {
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var acc = 0L
      (0 until 8).foreach(k => acc = (acc << 8) | (d(k) & 0xffL))
      acc >>> 4
    }
    def bucket(id: Long): Long = md5_60(id.toString) % 100
    def fps(t: String): Set[Long] = {
      val ts = t.split(" ", -1)
      if (ts.length < 6) return Set.empty
      val hs = (0 to ts.length - 3)
        .map(i => md5_60(s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}"))
      (0 to hs.length - 3).map(i => hs.slice(i, i + 3).min).toSet
    }
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), fps(r.getString(1)))).filter(_._2.nonEmpty)
    val tr = docs.filter(d => bucket(d._1) < 80)
    val te = docs.filter(d => bucket(d._1) >= 90)
    val expected = (for {
      (tid, tf) <- tr; (eid, ef) <- te
      shared = (tf & ef).size
      if shared * 1.0 / tf.size >= 0.5
    } yield (tid, eid, tf.size.toLong, shared.toLong)).toSet
    val got = TextOps.fuzzyDecontamination(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "corpus should contain cross-split near-dups")
    assert(got == expected,
      s"missing ${expected -- got}; extra ${got -- expected}")
  }

  test("d66 filter funnel equals a driver recompute; counts telescope") {
    val docs = Tables.documents(spark, sf0001).select("text").collect()
      .map(_.getString(0))
    def rules(t: String): (Boolean, Boolean, Boolean) = {
      val toks = t.split(" ", -1)
      val nAlpha = t.replace(" ", "").length
      (toks.length >= 50 && toks.length <= 100000,
        { val m = nAlpha * 1.0 / toks.length; m >= 3.0 && m <= 10.0 },
        toks.contains("the") && toks.contains("a"))
    }
    val rs = docs.map(rules)
    val n = docs.length.toLong
    val s1 = rs.count(_._1).toLong
    val s2 = rs.count(r => r._1 && r._2).toLong
    val s3 = rs.count(r => r._1 && r._2 && r._3).toLong
    val got = TextOps.filterFunnel(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq ==
      Seq((1, "len", n, s1), (2, "word_len", s1, s2), (3, "stopword", s2, s3)))
    got.foreach { case (_, _, nin, nout, nrem, surv) =>
      assert(nrem == nin - nout)
      assert(surv == nout * 1.0 / n)
    }
    // the funnel telescopes: each stage's input is the previous output
    assert(got.map(_._3).drop(1).toSeq == got.map(_._4).dropRight(1).toSeq)
  }

  test("e31 triplets equal an in-bucket brute-force recompute; margins consistent") {
    val vs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucket(v: Array[Double]): Int =
      VectorOps.planes.zipWithIndex.map { case (p, i) =>
        if (dot(v, p.toArray) > 0) 1 << i else 0
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      math.rint(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6) / 1e6
    val withB = vs.map { case (id, l, v) => (id, l, v, bucket(v)) }
    val expected = withB.flatMap { case (id, l, v, b) =>
      val inB = withB.filter(o => o._4 == b && o._1 != id)
      val pos = inB.filter(_._2 == l).map(o => (o._1, cos(v, o._3)))
      val neg = inB.filter(_._2 != l).map(o => (o._1, cos(v, o._3)))
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val p = pos.minBy { case (cid, c) => (-c, cid) }
        val n = neg.minBy { case (cid, c) => (-c, cid) }
        Some((id, l, p._1, n._1) -> (p._2, n._2))
      }
    }.toMap
    val got = VectorOps.tripletMining(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4))
        -> (r.getDouble(3), r.getDouble(5), r.getDouble(6))).toMap
    assert(expected.nonEmpty, "buckets should yield complete triplets")
    assert(got.keySet == expected.keySet,
      s"missing ${expected.keySet -- got.keySet}; extra ${got.keySet -- expected.keySet}")
    expected.foreach { case (k, (pc, nc)) =>
      val (gp, gn, gm) = got(k)
      assert(math.abs(gp - pc) < 1.5e-6 && math.abs(gn - nc) < 1.5e-6, s"$k")
      assert(gm == gp - gn, s"margin must be the row difference for $k")
    }
  }

  test("d67 dup-mass report equals a driver recompute over d13's clusters") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ntok = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val nDocs = docs.length.toLong
    val nTokens = ntok.values.sum
    val exGroups = docs.groupBy(_._2).values.map(_.map(_._1).sorted)
    val exRedDocs = exGroups.map(g => g.length - 1L).sum
    val exRedToks = exGroups.map(g => (g.length - 1L) * ntok(g.head)).sum
    val clusters = TextOps.dupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2).values
      .map(_.map(_._1).sorted)
    val nrDocs = clusters.map(c => c.length - 1L).sum
    val nrToks = clusters.map(c => c.map(ntok).sum - ntok(c.min)).sum
    val r = TextOps.dupMassReport(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1)) == ((nDocs, nTokens)))
    assert((row.getLong(2), row.getLong(3)) == ((exRedDocs, exRedToks)))
    assert(row.getDouble(4) == exRedToks * 1.0 / nTokens)
    assert((row.getLong(5), row.getLong(6), row.getLong(7)) ==
      ((clusters.size.toLong, nrDocs, nrToks)))
    assert(row.getDouble(8) == nrToks * 1.0 / nTokens)
    assert(nrDocs > 0, "corpus plants near-dups; the report must see them")
  }

  test("e31's negative side agrees with e30 on every shared anchor") {
    // the two miners must be the SAME mining: e31 restricts e30's anchor
    // set to those that also have a positive, never changes the negative
    val e30 = VectorOps.hardNegatives(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val e31 = VectorOps.tripletMining(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5)))
    assert(e31.nonEmpty)
    e31.foreach { case (anchor, neg) =>
      assert(e30.contains(anchor), s"e31 anchor $anchor missing from e30")
      assert(e30(anchor) == neg, s"negative disagrees for $anchor")
    }
  }

  test("e30 hard negatives equal an in-bucket brute-force recompute") {
    val vs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucket(v: Array[Double]): Int =
      VectorOps.planes.zipWithIndex.map { case (p, i) =>
        if (dot(v, p.toArray) > 0) 1 << i else 0
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      math.rint(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6) / 1e6
    val withB = vs.map { case (id, l, v) => (id, l, v, bucket(v)) }
    val expected = withB.flatMap { case (id, l, v, b) =>
      val cands = withB.filter(o => o._4 == b && o._2 != l)
        .map(o => (o._1, o._2, cos(v, o._3)))
      if (cands.isEmpty) None
      else Some {
        val best = cands.minBy { case (nid, _, c) => (-c, nid) }
        (id, l, best._1, best._2) -> best._3
      }
    }.toMap
    val got = VectorOps.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
        -> r.getDouble(4)).toMap
    assert(expected.nonEmpty, "buckets should contain cross-label candidates")
    assert(got.keySet == expected.keySet,
      s"missing ${expected.keySet -- got.keySet}; extra ${got.keySet -- expected.keySet}")
    expected.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1.5e-6, s"$k: ${got(k)} vs $c") }
    got.keySet.foreach { case (_, l, _, nl) => assert(l != nl) }
  }

  test("d70 isotonic fit equals a sequential pool-adjacent-violators solve") {
    val got = TextOps.isotonicCalibration(spark, sf0001).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 10)
    // classic sequential PAV for a NON-INCREASING fit: push each decile as
    // a block, pool while a later block's mean exceeds its predecessor's
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    got.foreach { case (_, n, rate, _) =>
      blocks += ((n.toDouble, n * rate))
      while (blocks.length >= 2 &&
          blocks(blocks.length - 1)._2 / blocks(blocks.length - 1)._1 >
          blocks(blocks.length - 2)._2 / blocks(blocks.length - 2)._1 + 1e-12) {
        val a = blocks.remove(blocks.length - 1)
        val b = blocks.remove(blocks.length - 1)
        blocks += ((a._1 + b._1, a._2 + b._2))
      }
    }
    // expand block means back to per-decile fitted values by accumulated
    // block weight (deciles may be unequal when n % 10 != 0)
    val fitPer = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var bi = 0; var acc = 0.0
      got.foreach { case (_, n, _, _) =>
        out += blocks(bi)._2 / blocks(bi)._1
        acc += n
        if (acc >= blocks.take(bi + 1).map(_._1).sum - 1e-9) bi += 1
      }
      out
    }
    got.zip(fitPer).foreach { case ((d, _, _, iso), exp) =>
      assert(math.abs(iso - exp) < 1e-9, s"decile $d: $iso vs PAV $exp") }
    // fitted curve is non-increasing and preserves the weighted mean
    got.map(_._4).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"fit not monotone: $a -> $b") }
    val wMeanRaw = got.map { case (_, n, r, _) => n * r }.sum
    val wMeanFit = got.map { case (_, n, _, f) => n * f }.sum
    assert(math.abs(wMeanRaw - wMeanFit) < 1e-6,
      s"PAV must preserve the weighted mean: $wMeanRaw vs $wMeanFit")
  }

  test("d71 source-overlap matrix equals a driver recompute over d05's pairs") {
    val pairs = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val src = Tables.documents(spark, sf0001).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) (sa, sb) else (sb, sa), a, b)
    }
    val nPairs = cells.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nDocs = cells.groupBy(_._1).view
      .mapValues(g => g.flatMap(c => Seq(c._2, c._3)).distinct.length.toLong).toMap
    val tot = pairs.length.toDouble
    val got = TextOps.sourceOverlapMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == nPairs.keySet)
    got.foreach { case (k, (np, nd, share)) =>
      assert(np == nPairs(k), s"$k pairs")
      assert(nd == nDocs(k), s"$k docs")
      assert(share == np / tot, s"$k share")
    }
  }

  test("d72 sparse-cosine pairs equal a driver hashed-bigram-TF recompute; pair set matches d05") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val vecs = docs.map { case (id, text) =>
      val toks = text.split(' ')
      val v = scala.collection.mutable.HashMap.empty[Int, Long].withDefaultValue(0L)
      toks.sliding(2).filter(_.length == 2).foreach { bg =>
        val b = (graft.functions.Md5Long
          .hash60(UTF8String.fromString(bg.mkString(" "))) % 4096).toInt
        v(b) += 1
      }
      id -> v
    }
    def cos(a: collection.Map[Int, Long], b: collection.Map[Int, Long]): Double = {
      val dot = a.iterator.map { case (k, x) => x * b(k) }.sum
      val na = a.values.map(x => x * x).sum
      val nb = b.values.map(x => x * x).sum
      math.rint(dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1e6) / 1e6
    }
    val expected = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      c = cos(vecs(i)._2, vecs(j)._2) if c >= 0.9
    } yield (vecs(i)._1 min vecs(j)._1, vecs(i)._1 max vecs(j)._1) -> c).toMap
    val got = TextOps.sparseCosineDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet,
      s"missing ${expected.keySet -- got.keySet}; extra ${got.keySet -- expected.keySet}")
    expected.foreach { case (k, c) =>
      assert(got(k) == c, s"pair $k: ${got(k)} vs $c") }
    // the weighted multiset-rate view and d05's shingle-set view must
    // agree on WHICH pairs are the planted dups (they score different
    // geometries — the VALUES differ — but the verdict set coincides on
    // this corpus), so d72 is a second independent witness of the dup set
    val d05 = TextOps.jaccardDupPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.keySet == d05,
      s"bigram-cosine set drifted from d05: only-cos ${got.keySet -- d05}, only-jac ${d05 -- got.keySet}")
  }

  test("e34 silhouette equals a driver centroid-distance recompute; bounded in [-1, 1]") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val rows = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byLabel = rows.groupBy(_._2)
    val cents = byLabel.view.mapValues { g =>
      val n = g.length
      Array.tabulate(64)(i => rnd6(g.map(_._3(i)).sum) / n)
    }.toMap
    def dist(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val d = v(i) - c(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val per = rows.map { case (_, l, v) =>
      val a = dist(v, cents(l))
      val b = cents.collect { case (cl, c) if cl != l => dist(v, c) }.min
      (l, rnd6((b - a) / math.max(a, b)), rnd6(a), rnd6(b))
    }
    val expect = per.groupBy(_._1).view.mapValues { g =>
      val n = g.length
      (n.toLong, rnd6(g.map(_._2).sum) / n, rnd6(g.map(_._3).sum) / n,
        rnd6(g.map(_._4).sum) / n)
    }.toMap
    val got = VectorOps.silhouette(spark, sf0001).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (l, (n, ms, ma, mb)) =>
      val (en, ems, ema, emb) = expect(l)
      assert(n == en, s"label $l n")
      assert(math.abs(ms - ems) < 1e-9, s"label $l sil $ms vs $ems")
      assert(math.abs(ma - ema) < 1e-9, s"label $l intra")
      assert(math.abs(mb - emb) < 1e-9, s"label $l inter")
      assert(ms >= -1.0 && ms <= 1.0, s"label $l silhouette out of range: $ms")
    }
  }

  test("e35 kNN label eval equals a driver top-5 majority-vote recompute") {
    def rnd6(v: Double) = math.rint(v * 1e6) / 1e6
    val rows = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      rnd6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val preds = rows.map { case (qa, la, va) =>
      val top = rows.filter(_._1 != qa)
        .map { case (qb, lb, vb) => (qb, lb, cos(va, vb)) }
        .sortBy { case (qb, _, c) => (-c, qb) }.take(5)
      val (pl, _) = top.groupBy(_._2).view.mapValues(_.length).toSeq
        .minBy { case (lb, nv) => (-nv, lb) }
      (la, pl)
    }
    val expect = preds.groupBy(_._1).view.mapValues { g =>
      val n = g.length; val ok = g.count(p => p._2 == p._1)
      (n.toLong, ok.toLong, ok * 1.0 / n)
    }.toMap
    val got = VectorOps.knnLabelEval(spark, sf0001).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (l, v) => assert(v == expect(l), s"label $l: $v vs ${expect(l)}") }
    // coverage: every label graded, counts partition the corpus. (On THIS
    // corpus the labels are geometry-random — measured top-5 same-label
    // share ≈ 0.09 ≈ 1/k — so the probe's correct verdict is chance-level
    // accuracy: that unlearnability REPORT is the operator's purpose, and
    // the exact-recompute equality above is the correctness pin.)
    assert(got.values.map(_._1).sum == rows.length)
    val overall = got.values.map(_._2).sum.toDouble / rows.length
    assert(overall >= 0.0 && overall <= 1.0)
  }

  test("d76 width sweep: error falls with width, and |bias| ≤ MAE ≤ RMSE throughout") {
    val rows = TextOps.minhashWidthSweep(spark, sf0001)
      .orderBy("n_perms").collect()
    assert(rows.length == TextOps.MinhashWidths.length)
    rows.foreach { r =>
      // Jensen/Cauchy-Schwarz: E|X| ≤ √E[X²], and |E X| ≤ E|X| — universal
      assert(math.abs(r.getDouble(2)) <= r.getDouble(3) + 1e-9)
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9)
    }
    // more permutations = tighter estimate (theory σ = √(J(1−J)/w);
    // pinned empirically — measured ≈ √2 decay per doubling)
    rows.map(_.getDouble(4)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"RMSE must not rise with width: $a -> $b")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("d74 band configs nest: fewer rows per band can only ADD candidates") {
    // The 16 permutations are shared and band boundaries align (each
    // (4,4) band is two adjacent (8,2) bands; each (2,8) band is two
    // (4,4) bands), so a full match at coarse r implies full matches in
    // every contained finer band: candidates(2,8) ⊆ candidates(4,4) ⊆
    // candidates(8,2). That gives monotone candidate counts, monotone
    // recall, and p_detect_at_tau monotone in the same direction.
    val rows = TextOps.lshBandSensitivity(spark, sf0001)
      .orderBy("rows_per_band").collect() // r = 2, 4, 8
    assert(rows.length == 3)
    val cands = rows.map(_.getLong(2))
    val det = rows.map(_.getLong(3))
    val rec = rows.map(_.getDouble(6))
    val theory = rows.map(_.getDouble(7))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2), cands.toSeq.toString)
    assert(det(0) >= det(1) && det(1) >= det(2), det.toSeq.toString)
    assert(rec(0) >= rec(1) && rec(1) >= rec(2), rec.toSeq.toString)
    assert(theory(0) > theory(1) && theory(1) > theory(2))
    // detected never exceeds either of its denominators
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) <= r.getLong(4))
    }
    spark.sharedState.cacheManager.clearCache() // sigs persist (registry contract)
  }

  test("connected components: the O(diameter) round bound, measured on both shapes") {
    import spark.implicits._
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    // 50-node PATH (the adversarial shape for min-label propagation):
    // the min label travels one hop per round, so convergence takes the
    // full eccentricity — init folds hop 1 in, 48 more moves, plus one
    // certifying no-change round = 49. This is the measurement that
    // pins the scaladoc's O(diameter) claim.
    val path = sym((0L until 49L).map(k => (k, k + 1)))
    val (lbl, rPath) = TextOps.connectedComponentsWithRounds(path)
    val ls = lbl.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ls.size == 50 && ls.values.forall(_ == 0L))
    assert(rPath == 49, s"expected the diameter-bound round count, got $rPath")
    // 20-node CLIQUE (the dup-cluster shape the posture is tuned for):
    // every node sees the minimum at init, one certifying round
    val clique = sym(for {
      a <- 0L until 20L; b <- (a + 1) until 20L
    } yield (a, b))
    val (cl, rClique) = TextOps.connectedComponentsWithRounds(clique)
    assert(cl.collect().forall(_.getLong(1) == 0L))
    assert(rClique <= 2, s"clique must converge in O(1) rounds, got $rClique")
    // diameter past the 64-round rail fails LOUDLY — a truncated label
    // table must never masquerade as an answer
    val long = sym((0L until 80L).map(k => (k, k + 1)))
    val ex = intercept[IllegalArgumentException] {
      TextOps.connectedComponentsWithRounds(long)
    }
    assert(ex.getMessage.contains("64-round rail"))
  }

  test("star-contraction CC: label-identical to propagation, logarithmic on the path") {
    import spark.implicits._
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // the two fixture shapes must agree label-for-label with propagation
    for (g <- Seq(
        sym((0L until 49L).map(k => (k, k + 1))), // 50-node path
        sym(for { a <- 0L until 20L; b <- (a + 1) until 20L } yield (a, b)),
        // two components + an isolated edge: ids deliberately non-dense
        sym(Seq(5L -> 9L, 9L -> 12L, 40L -> 41L, 100L -> 7L, 7L -> 5L)))) {
      val (prop, _) = TextOps.connectedComponentsWithRounds(g)
      val (star, _) = TextOps.connectedComponentsStar(g)
      assert(labelsOf(star) == labelsOf(prop))
    }
    // the 80-node path the propagation rail REJECTS: the star variant
    // converges in a logarithmic round count with the right labels
    val long = sym((0L until 80L).map(k => (k, k + 1)))
    val (lbl, rounds) = TextOps.connectedComponentsStar(long)
    assert(lbl.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 12,
      s"star contraction should need ~log rounds on an 80-path, got $rounds")
  }
}
