package graft

import org.apache.spark.sql.functions._
import graft.index.{Ingest, Sink}
import graft.Tables.t
import java.nio.file.Files

class IngestSinkSpec extends SparkSpec {

  private def docs = t(spark, sf, "documents")

  test("scan filter keeps only image suffixes, case-insensitive (A3)") {
    val kept = Ingest.imageScanFilter(Ingest.withPaths(docs))
    val exts = kept.select(
        lower(substring_index(col("relative_path"), ".", -1)).as("e"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(exts === Set("png", "jpg", "jpeg"))
    // 6 of 8 extension slots are images
    assert(kept.count() === docs.count() * 6 / 8)
  }

  test("decode stats: processed + failed == scanned (A4/C3 parity)") {
    val decoded = Ingest.tolerantDecode(Ingest.imageScanFilter(Ingest.withPaths(docs)))
    val stats = Ingest.decodeStats(decoded).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.values.sum === decoded.count())
    assert(stats.getOrElse("failed", 0L) > 0L)
  }

  test("batching: every batch full except possibly the last (A6)") {
    val scanned = Ingest.imageScanFilter(Ingest.withPaths(docs))
    val sizes = Ingest.withBatchId(scanned, "doc_id", 16)
      .groupBy("batch_id").count().orderBy("batch_id")
      .collect().map(_.getLong(1))
    assert(sizes.init.forall(_ === 16L))
    assert(sizes.last <= 16L)
  }

  test("points: deterministic ids, unique, only decoded rows (B6/F5)") {
    val pts = Ingest.buildPoints(Ingest.tolerantDecode(
      Ingest.imageScanFilter(Ingest.withPaths(docs))))
    assert(pts.filter(!col("decode_ok")).count() === 0L)
    assert(pts.select("point_id").distinct().count() === pts.count())
    val again = Ingest.buildPoints(Ingest.tolerantDecode(
      Ingest.imageScanFilter(Ingest.withPaths(docs))))
    assert(again.select("point_id").except(pts.select("point_id")).count() === 0L)
  }

  test("sink: ensure-collection is first-write-wins (C1), append counts (C2)") {
    val dir = Files.createTempDirectory("graft_sink").toFile
    val path = s"${dir.getAbsolutePath}/col"
    val pts = Ingest.buildPoints(Ingest.tolerantDecode(
      Ingest.imageScanFilter(Ingest.withPaths(docs)))).limit(10).cache()
    assert(Sink.ensureCollection(spark, path, pts))
    assert(!Sink.ensureCollection(spark, path, pts)) // second call no-op
    assert(Sink.append(pts, path) === 10L)
    assert(Sink.append(pts, path) === 10L) // returns rows written this call
    // reference semantics: re-index duplicates — collection holds both
    assert(spark.read.parquet(path).count() === 20L)
  }

  test("incremental: re-ingest of same corpus adds zero rows") {
    val pts = Ingest.buildPoints(Ingest.tolerantDecode(
      Ingest.imageScanFilter(Ingest.withPaths(docs)))).cache()
    assert(Sink.incremental(pts, pts, "point_id").count() === 0L)
    val half = pts.filter(col("doc_id") < 250)
    val fresh = Sink.incremental(pts, half, "point_id")
    assert(fresh.count() === pts.count() - half.count())
  }
}
