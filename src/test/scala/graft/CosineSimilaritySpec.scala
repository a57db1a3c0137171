package graft

import graft.functions.{CosineSimilarity, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The native cosine expression must agree with the interpreted
  * zip_with/aggregate formulation in both codegen and eval paths, and
  * handle nulls/degenerate vectors.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def registered(): SparkSession = { GraftFunctions.register(spark); spark }

  test("matches the interpreted higher-order-function formulation exactly") {
    registered()
    val df = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .limit(50)
    val both = df.alias("a").join(df.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .selectExpr(
        "cosine_similarity(a.v, b.v) AS fast",
        """aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
          | / (sqrt(aggregate(transform(a.v, x -> x * x), 0D, (acc, x) -> acc + x))
          |    * sqrt(aggregate(transform(b.v, x -> x * x), 0D, (acc, x) -> acc + x))) AS slow""".stripMargin)
    val bad = both.filter(abs(col("fast") - col("slow")) > 1e-12).count()
    assert(bad == 0)
  }

  test("works directly on float arrays (no cast needed)") {
    registered()
    val r = Tables.embeddings(spark, sf0001).alias("a")
      .crossJoin(Tables.embeddings(spark, sf0001).alias("b"))
      .filter(col("a.vec_id") === 1 && col("b.vec_id") === 1)
      .selectExpr("cosine_similarity(a.embedding, b.embedding) AS c")
      .first().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("null inputs and zero vectors yield null") {
    registered()
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(0.0f, 0.0f))),
      (None, Some(Seq(1.0f, 1.0f)))
    ).toDF("a", "b")
    val out = df.selectExpr("cosine_similarity(a, b) AS c").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval path agrees with codegen") {
    // Literal fold uses interpreted eval; compare against a known value.
    registered()
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS c")
      .first().getDouble(0)
    assert(math.abs(v - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("type check rejects non-array inputs with a clear message") {
    registered()
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_similarity"))
  }

  test("extension class injects the function into a fresh session") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val v = s2.sql("SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
        .first().getDouble(0)
      assert(math.abs(v) < 1e-15)
      val n = s2.sql("SELECT size(word_trigram_hashes('a b c d')) AS n").first().getInt(0)
      assert(n == 2) // both injected functions resolve through the extension
    } finally { /* shared JVM: do not stop the default session */ }
  }

  test("word_trigram_hashes is bit-identical to the concat_ws/xxhash64 formulation") {
    graft.functions.GraftFunctions.register(spark)
    // edge cases: consecutive spaces (empty tokens), leading/trailing space,
    // exactly 3 tokens, fewer than 3 tokens, multi-byte UTF-8, empty string
    val samples = Seq(
      "the quick brown fox", "a b c", "a  b c", " a b c", "a b c ",
      "a b", "one", "", "héllo wörld ünïcode déjà", "x " * 200 + "y")
    val df = samples.toDF("text")
    val rows = df.selectExpr(
      "word_trigram_hashes(text) AS fast",
      """IF(size(split(text, ' ')) >= 3,
        |   transform(sequence(1, size(split(text, ' ')) - 2),
        |     i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 3)))),
        |   array()) AS slow""".stripMargin)
      .collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for '$s'")
    }
    // and across the real corpus, as the dedup operators consume it
    val corpus = Tables.documents(spark, sf0001)
      .selectExpr(
        "word_trigram_hashes(text) AS fast",
        """IF(size(split(text, ' ')) >= 3,
          |   transform(sequence(1, size(split(text, ' ')) - 2),
          |     i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 3)))),
          |   array()) AS slow""".stripMargin)
      .filter("fast != slow").count()
    assert(corpus == 0)
  }

  test("md5_long60 is bit-identical to the conv/substring/md5 formulation") {
    graft.functions.GraftFunctions.register(spark)
    val samples = Seq("", "a", "hello", "héllo wörld", "x" * 1000, " ", "0")
    val rows = samples.toDF("s").selectExpr(
      "md5_long60(s) AS fast",
      "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS slow")
      .collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '$s'")
    }
    // across the corpus texts and ids, as the d07/d08/d14/d16/d17 paths use it
    val corpus = Tables.documents(spark, sf0001)
      .selectExpr("md5_long60(text) AS a",
        "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS b",
        "md5_long60(CAST(doc_id AS STRING)) AS c",
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS d")
      .filter("a != b OR c != d").count()
    assert(corpus == 0)
  }

  test("sparse_dot matches a map-based SQL dot over sorted posting arrays") {
    graft.functions.GraftFunctions.register(spark)
    // hand cases: disjoint, subset, interleaved, empty sides
    val cases = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), Seq(1L, 3L, 5L), Seq(1L, 1L, 1L), 12L),
      (Seq(1L, 2L), Seq(10L, 20L), Seq(3L, 4L), Seq(1L, 1L), 0L),
      (Seq(1L, 2L, 9L), Seq(2L, 3L, 4L), Seq(2L, 9L), Seq(5L, 7L), 43L),
      (Seq.empty[Long], Seq.empty[Long], Seq(1L), Seq(9L), 0L))
    cases.foreach { case (ka, va, kb, vb, want) =>
      val got = Seq((ka, va, kb, vb)).toDF("ka", "va", "kb", "vb")
        .selectExpr("sparse_dot(ka, va, kb, vb) AS d").head().getLong(0)
      assert(got == want, s"${ka} dot ${kb}")
    }
    // and across the corpus's bigram posting vectors against an
    // independent SQL formulation (map build + explode + join-free sum)
    val posts = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .where("size(toks) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS g""".stripMargin)
      .selectExpr("doc_id", "pmod(md5_long60(g), 4096) AS b")
      .groupBy("doc_id", "b").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("tf"))
    val vecsDf = posts.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("b"),
            org.apache.spark.sql.functions.col("tf")))).as("kv"))
      .selectExpr("doc_id", "transform(kv, x -> x.b) AS ks",
        "transform(kv, x -> x.tf) AS vs",
        "map_from_arrays(transform(kv, x -> x.b), transform(kv, x -> x.tf)) AS mp")
      .limit(40)
    val mismatches = vecsDf.as("a").crossJoin(vecsDf.as("b"))
      .selectExpr("sparse_dot(a.ks, a.vs, b.ks, b.vs) AS fast",
        """aggregate(map_entries(a.mp), 0L,
          |  (acc, e) -> acc + e.value * coalesce(b.mp[e.key], 0L)) AS slow""".stripMargin)
      .filter("fast != slow").count()
    assert(mismatches == 0)
  }

  test("sparse_dot rejects a mistyped NON-FIRST argument at analysis") {
    graft.functions.GraftFunctions.register(spark)
    // the old collectFirst-based check only ever inspected argument 1, so a
    // bad later argument type-checked and blew up at eval with a
    // ClassCastException instead of a named analysis error
    Seq(
      "sparse_dot(array(1L), 'oops', array(1L), array(1L))"      -> 2,
      "sparse_dot(array(1L), array(1L), map(1, 2), array(1L))"   -> 3,
      "sparse_dot(array(1L), array(1L), array(1L), array(1.5D))" -> 4
    ).foreach { case (exprStr, argNo) =>
      val e = intercept[Exception] { spark.sql(s"SELECT $exprStr").collect() }
      assert(e.getMessage.contains(s"argument $argNo must be array<bigint>"),
        s"arg $argNo: ${e.getMessage}")
    }
    // a fully well-typed call still analyzes and evaluates
    val ok = spark.sql(
      "SELECT sparse_dot(array(1L, 2L), array(3L, 4L), array(2L), array(5L)) AS d")
      .head().getLong(0)
    assert(ok == 20L)
  }

  test("word_trigram_hashes arity and type errors are named") {
    graft.functions.GraftFunctions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT word_trigram_hashes('a', 'b')").collect()
    }
    assert(e1.getMessage.contains("word_trigram_hashes"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT word_trigram_hashes(42)").collect()
    }
    assert(e2.getMessage.contains("word_trigram_hashes"))
  }
}
