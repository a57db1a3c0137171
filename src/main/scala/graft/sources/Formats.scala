package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange-format sources/sinks beyond the reference's CSV+Parquet
  * (SURVEY §2.1): JSON-lines — the lingua franca of LLM training-data
  * pipelines — plus ORC and raw text. All are thin, schema-explicit
  * wrappers over Spark's built-in connectors: the value here is the pinned
  * CONTRACT (explicit schema — never runtime inference at scale — and
  * explicit malformed-row policy), not reimplementation.
  *
  * Scale notes: every reader takes an explicit schema, so a 100 TB read
  * never pays the inference pre-pass and never silently widens a type;
  * JSONL/text are splittable (uncompressed or with a splittable codec), so
  * partition counts follow `spark.sql.files.maxPartitionBytes` as usual.
  */
object Formats {

  /** JSONL scan with declared schema. `PERMISSIVE` keeps malformed lines,
    * capturing the raw line in `_corrupt_record` (pass `keepCorrupt =
    * true`) so a pipeline can route bad records to quarantine instead of
    * dying mid-run; `FAILFAST` is the strict variant for curated inputs.
    * NB Spark refuses queries that reference ONLY `_corrupt_record` on the
    * raw scan — `.cache()` the parsed frame before splitting good/bad.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                keepCorrupt: Boolean = false): DataFrame = {
    val base =
      if (keepCorrupt)
        schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
      else schema
    spark.read
      .schema(base)
      .option("mode", if (keepCorrupt) "PERMISSIVE" else "FAILFAST")
      .json(path)
  }

  /** JSONL sink: one JSON object per line, one file per partition. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Streaming JSONL source: the same schema-explicit contract under
    * `readStream` — a landing directory of JSONL files becomes an
    * incremental pipeline input (new files = new micro-batch), which is
    * how a training-data ingest tails an upstream dump at scale.
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "8")
      .json(path)

  /** ORC roundtrip — columnar alternative to parquet, built into Spark
    * (predicate pushdown + column pruning work identically).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Raw text scan: one row per line (column `value`) — the entry point
    * for unstructured corpora before any parsing.
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)

  /** XML source/sink (built into Spark 4): one row per `rowTag` element,
    * schema-explicit like every reader here. XML is row-splittable per
    * element, so large dumps (wiki-style corpora) still parallelize.
    */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  /** Binary-file scan — the multimodal ingestion path (`ext.Multimodal`
    * consumes the payloads): one row per file with `path`, `length`,
    * `modificationTime`, and the raw bytes in `content`. `pathGlobFilter`
    * scopes by extension; `maxBytesPerFile` guards against a single
    * oversized object blowing an executor (binary files are NOT
    * splittable — one file is one task, so media stores should shard
    * uploads at the 100 MB-ish granularity this reader expects).
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Small-file compaction — the table-maintenance op every long-lived
    * parquet dataset needs: streaming/incremental sinks accrete many
    * small files, and at 100 TB a scan's task count (and NameNode/object-
    * store listing cost) is driven by file count, not data size. Rewrites
    * the dataset into ceil(bytes / targetBytes) files via a ROUND-ROBIN
    * repartition (even output sizes without requiring a key), to a
    * temp dir first — the swap into place is the caller's transactional
    * concern (table formats do this with a metadata commit).
    * Returns the output file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inDir)
    // Size from the ACTUAL on-disk file lengths, not optimizedPlan.stats:
    // plan stats estimate roughly-decompressed bytes, which overshoots the
    // compressed parquet size several-fold and would leave output files far
    // under targetBytes. The file listing is already driver-resident (the
    // read's InMemoryFileIndex built it), so this adds no extra round-trip.
    val hconf = spark.sessionState.newHadoopConf()
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, (bytes.toDouble / targetBytes.toDouble).ceil.toInt)
    df.repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Parquet sink with explicit codec. zstd trades ~10-20% write CPU for
    * materially smaller files than snappy — at 100 TB the scan is usually
    * IO-bound, so smaller-on-disk wins end-to-end; level stays default
    * (3): higher levels cost CPU superlinearly for single-digit % size.
    */
  def writeParquet(df: DataFrame, path: String, codec: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", codec).parquet(path)
}
