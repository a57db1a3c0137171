package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Interchange-format roundtrips + malformed-row policy on the documents
  * table (the corpus a training pipeline would actually move as JSONL).
  */
class FormatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def docs = Tables.documents(spark, sf0001)
    .select("doc_id", "lang", "n_chars", "text")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  test("JSONL roundtrip preserves the documents multiset") {
    val out = tmp("jsonl")
    Formats.writeJsonl(docs, out)
    val back = Formats.readJsonl(spark, out, docSchema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSONL permissive mode quarantines malformed lines instead of failing") {
    val dir = Files.createTempDirectory("jsonl-bad")
    val f = dir.resolve("part-0.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "lang": "en", "n_chars": 5, "text": "hello"}""",
      """this is not json at all""",
      """{"doc_id": 2, "lang": "en", "n_chars": 5, "text": "world"}"""))
    // Spark disallows queries touching ONLY _corrupt_record on a raw scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    // parsed frame first, as the Formats scaladoc instructs.
    val read = Formats.readJsonl(spark, dir.toString, docSchema, keepCorrupt = true).cache()
    val good = read.filter(col("_corrupt_record").isNull)
    val bad = read.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").first().getString(0).contains("not json"))
  }

  test("streaming JSONL source sees the same rows as the batch reader") {
    val out = tmp("jsonl-stream")
    Formats.writeJsonl(docs, out)
    val q = Formats.readJsonlStream(spark, out, docSchema)
      .groupBy("lang").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("jsonl_stream_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("jsonl_stream_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("ORC roundtrip preserves the documents multiset") {
    val out = tmp("orc")
    Formats.writeOrc(docs, out)
    val back = Formats.readOrc(spark, out, docSchema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty)
  }

  test("ORC scan prunes columns and pushes filters") {
    val out = tmp("orc-plan")
    Formats.writeOrc(docs, out)
    val plan = Formats.readOrc(spark, out, docSchema)
      .filter(col("doc_id") === 7).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("doc_id,lang") || plan.contains("struct<doc_id:bigint,lang:string>"),
      s"ORC read schema not pruned:\n$plan")
    assert(plan.toLowerCase.contains("pushedfilters: [isnotnull(doc_id), equalto(doc_id,7)]".toLowerCase),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("Trigger.AvailableNow drains the JSONL directory and terminates on its own") {
    // The incremental-batch-job mode (SURVEY §2.9): process everything
    // currently available — across multiple micro-batches under
    // maxFilesPerTrigger — then stop without external intervention.
    val out = tmp("jsonl-availnow")
    Formats.writeJsonl(docs.repartition(10), out) // 10 files > maxFilesPerTrigger=8
    val q = Formats.readJsonlStream(spark, out, docSchema)
      .groupBy("lang").count()
      .writeStream.outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("availnow_counts").start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val streamed = spark.table("availnow_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("XML roundtrip preserves the documents multiset") {
    val out = tmp("xml")
    Formats.writeXml(docs, out, rowTag = "doc")
    val back = Formats.readXml(spark, out, docSchema, rowTag = "doc")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("zstd parquet roundtrips and is smaller than snappy on this corpus") {
    val zd = tmp("pq-zstd"); val sn = tmp("pq-snappy")
    Formats.writeParquet(docs, zd, codec = "zstd")
    Formats.writeParquet(docs, sn, codec = "snappy")
    assert(spark.read.parquet(zd).exceptAll(docs).isEmpty)
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    assert(bytes(zd) < bytes(sn), s"zstd ${bytes(zd)} !< snappy ${bytes(sn)}")
  }

  test("binaryFile source reads media payloads with glob scoping") {
    val dir = Files.createTempDirectory("binsrc")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, 4),
      "b.img" -> Array[Byte](9, 8, 7), "skip.txt" -> Array[Byte](0))
    payloads.foreach { case (n, bs) => Files.write(dir.resolve(n), bs) }
    val df = Formats.readBinaryFiles(spark, dir.toString, "*.img")
    val rows = df.select("path", "length", "content").collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("a.img", "b.img")) // glob excluded skip.txt
    rows.foreach { case (n, len, content) =>
      assert(content == payloads(n).toSeq && len == payloads(n).length)
    }
  }

  test("compact rewrites a many-small-files dataset into the target file count") {
    val fragmented = tmp("frag")
    docs.repartition(37).write.parquet(fragmented) // simulate sink accretion
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 37)
    val out = tmp("compacted")
    val n = Formats.compact(spark, fragmented, out, targetBytes = 64L * 1024 * 1024)
    assert(parquetFiles(out) == n && n < 37)
    // content preserved as a multiset
    val a = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    val b = docs.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("text roundtrip: one line per document text") {
    val out = tmp("text")
    Formats.writeText(docs.select("text"), out)
    val back = Formats.readText(spark, out)
    assert(back.count() == docs.count())
    // same multiset of lines
    val a = back.select(col("value")).collect().map(_.getString(0)).sorted
    val b = docs.select("text").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }
}
