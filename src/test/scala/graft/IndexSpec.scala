package graft

import graft.ext.{VectorIndex, VectorOps}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle ([[graft.ext.VectorIndex]]):
  * build → commit → load → serve roundtrip, torn-read impossibility
  * through the marker protocol, fingerprint-guarded reuse, version
  * pruning, the partition-pruned probe read, and incremental append ≡
  * batch build over the union.
  */
class IndexSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-index-$tag").toString

  private def fullVecs = VectorOps.vecs(spark, sf0001).select("vec_id", "v")

  test("build -> commit -> load -> serve equals the inline e24 twin") {
    val root = tmpRoot("roundtrip")
    val v0 = VectorIndex.buildIndex(spark, sf0001, root)
    assert(v0 == 0L)
    assert(VectorIndex.latestVersion(spark, root).contains(0L))
    val served = VectorIndex.serveIvfPqKnn(spark, sf0001, root).collect()
    val inline = VectorOps.ivfPqKnn(spark, sf0001).collect()
    assert(served.map(_.toSeq).toSeq == inline.map(_.toSeq).toSeq)
  }

  test("torn reads are impossible: no marker, no version") {
    val root = tmpRoot("torn")
    // pre-commit: resolution is None and readers refuse loudly
    assert(VectorIndex.latestVersion(spark, root).isEmpty)
    val ex = intercept[IllegalStateException] {
      VectorIndex.loadCodebook(spark, root)
    }
    assert(ex.getMessage.contains("no committed index version"))
    // a crashed build = data directory WITHOUT a marker: invisible
    VectorIndex.buildIndex(spark, sf0001, root)
    val partial = new java.io.File(root, "v99/codebook")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(partial, "garbage.parquet").toPath, "not parquet")
    assert(VectorIndex.latestVersion(spark, root).contains(0L),
      "an unmarked version directory must not resolve")
    // and the reader still serves v0 whole
    assert(VectorIndex.loadCodebook(spark, root).count() == 16L)
  }

  test("ensureIndex reuses on matching fingerprint, rebuild bumps and prunes") {
    val root = tmpRoot("ensure")
    val v0 = VectorIndex.ensureIndex(spark, sf0001, root)
    assert(v0 == 0L)
    // same corpus → same stamped fingerprint → no new version
    assert(VectorIndex.ensureIndex(spark, sf0001, root) == 0L)
    // forced rebuilds commit monotone versions; retain=2 prunes v0 after v2
    assert(VectorIndex.buildIndex(spark, sf0001, root) == 1L)
    assert(VectorIndex.buildIndex(spark, sf0001, root) == 2L)
    val names = new java.io.File(root).list().toSet
    assert(VectorIndex.latestVersion(spark, root).contains(2L))
    assert(!names.contains("v0") && !names.contains("_commit-0"),
      s"retain=2 must prune v0: $names")
    assert(names.contains("v1") && names.contains("v2"), names.toString)
    // an append trail (non-build stamp) does not satisfy ensureIndex:
    // it rebuilds to a full-corpus artifact rather than trusting it
    VectorIndex.appendBatch(fullVecs.filter(col("vec_id") < 0), root, 7L, "x")
    assert(VectorIndex.latestVersion(spark, root).contains(3L))
    assert(VectorIndex.ensureIndex(spark, sf0001, root) == 4L)
  }

  test("the probe read is partition-pruned to the probed cell directories") {
    val root = tmpRoot("prune")
    VectorIndex.buildIndex(spark, sf0001, root)
    val all = VectorIndex.loadCodes(spark, root)
    val nCells = all.select("cell").distinct().count()
    assert(nCells > 2, s"fixture must have >2 cells for the pruning claim, got $nCells")
    val probed = Seq(0L, 3L)
    val pruned = all.filter(col("cell").isin(probed: _*))
    // df.inputFiles reports the relation's FULL listing regardless of
    // filters — the pruning lives in the physical scan's partition
    // selection, so assert there
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "the cell probe must reach the scan as a partition filter")
    val files = scans.flatMap(_.selectedPartitions.toPartitionArray)
      .map(_.urlEncodedPath)
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("/cell=0/") || f.contains("/cell=3/")),
      s"probe read touched non-probed partitions: ${files.mkString(",")}")
    assert(files.length < all.inputFiles.length,
      "probe read must list fewer files than the full index")
  }

  test("two-batch append equals the batch build over the union") {
    val e = fullVecs
    val n = e.count()
    val cut = n / 2
    assert(cut > 16, "first batch must contain the 16 codebook vectors")
    val rootA = tmpRoot("append")
    val rootB = tmpRoot("batch")
    VectorIndex.buildIndexFrom(e.filter(col("vec_id") < cut), rootA)
    VectorIndex.appendBatch(e.filter(col("vec_id") >= cut), rootA, 0L, "spec")
    VectorIndex.buildIndexFrom(e, rootB)
    def snap(root: String) = VectorIndex.loadCodes(spark, root)
      .selectExpr("vec_id", "cell", "codes")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toList)).sortBy(_._1).toSeq
    assert(snap(rootA) == snap(rootB))
    // codebooks bit-equal too (the append path must never retrain)
    def cb(root: String) = VectorIndex.loadCodebook(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList))
      .sortBy(_._1).toSeq
    assert(cb(rootA) == cb(rootB))
    // and the served query agrees between the two index trails
    assert(
      VectorIndex.serveIvfPqKnn(spark, sf0001, rootA).collect().map(_.toSeq).toSeq ==
      VectorIndex.serveIvfPqKnn(spark, sf0001, rootB).collect().map(_.toSeq).toSeq)
  }

  test("a redelivered append batch no-ops on its own stamp") {
    val root = tmpRoot("retry")
    VectorIndex.buildIndexFrom(fullVecs.filter(col("vec_id") < 100), root)
    val fresh = fullVecs.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val v1 = VectorIndex.appendBatch(fresh, root, 5L, "inc-A")
    assert(v1 == 1L)
    // same (batchId, incarnation) = crash-after-flip redelivery: no-op
    assert(VectorIndex.appendBatch(fresh, root, 5L, "inc-A") == 1L)
    assert(VectorIndex.latestVersion(spark, root).contains(1L))
    // same batch id from a NEW incarnation must apply (checkpoint reset
    // restarts ids at 0 — the CDC sink's documented trap)
    val v2 = VectorIndex.appendBatch(
      fullVecs.filter(col("vec_id") >= 200 && col("vec_id") < 210), root,
      5L, "inc-B")
    assert(v2 == 2L)
  }
}
