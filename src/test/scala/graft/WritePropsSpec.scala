package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** Write-behavior table properties (Iceberg's `write.*` family):
  * `write.parquet.compression-codec` drives the codec of every owned
  * data write, and `write.target-file-size-bytes` is the default
  * compaction bin size when no explicit target is passed — both as
  * pure table properties, no code-level arguments.
  */
class WritePropsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: java.nio.file.Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  private def codecsOf(t: java.nio.file.Path): Set[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    SnapStore.currentManifest(t).files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(t.resolve(f.path).toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.get(0).getColumns.get(0)
        .getCodec.toString
      finally r.close()
    }.toSet
  }

  // ----------------------------------------------------------------
  test("write.parquet.compression-codec drives appended and " +
    "compacted file codecs with no code-level argument") {
    val root = Files.createTempDirectory("graft-codec")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 50), "part")
    val defaultCodec = codecsOf(t)
    assert(!defaultCodec.contains("GZIP"), s"fixture: $defaultCodec")

    SnapStore.setProperties(t,
      Map("write.parquet.compression-codec" -> "gzip"))
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 80), "part")
    val m = SnapStore.currentManifest(t)
    val appended = m.files.filter(_.seq == m.version)
    assert(appended.nonEmpty)
    val conf = new org.apache.hadoop.conf.Configuration()
    appended.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(t.resolve(f.path).toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try assert(r.getFooter.getBlocks.get(0).getColumns.get(0)
        .getCodec.toString == "GZIP",
        s"appended file ${f.path} must honor the codec property")
      finally r.close()
    }

    // A full compaction rewrites everything under the property codec.
    SnapStore.compact(spark, t, "part", Long.MaxValue)
    assert(codecsOf(t) == Set("GZIP"),
      s"compacted files must honor the codec property: ${codecsOf(t)}")
    // Contents survive the codec change exactly.
    assert(SnapStore.read(spark, t).count() == 80L)
  }

  // ----------------------------------------------------------------
  test("write.sort.order drives append-time row clustering: rows " +
    "inside each written file sort by the declared columns") {
    val root = Files.createTempDirectory("graft-sortorder")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 40), "part")
    SnapStore.setProperties(t, Map("write.sort.order" -> "source, doc_id"))
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 120), "part")
    val m = SnapStore.currentManifest(t)
    val appended = m.files.filter(_.seq == m.version)
    assert(appended.nonEmpty)
    appended.foreach { f =>
      val rows = spark.read.parquet(t.resolve(f.path).toString)
        .select("part", "source", "doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows == rows.sortBy(identity),
        s"rows in ${f.path} must sort by (part, source, doc_id)")
    }
    // Contents untouched by the layout property.
    assert(SnapStore.read(spark, t).count() == 120L)
  }

  // ----------------------------------------------------------------
  test("write.target-file-size-bytes is the default compaction bin " +
    "size: a tiny target packs nothing, a large one folds the layout") {
    val root = Files.createTempDirectory("graft-target")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    // Fragmented create: many small files.
    SnapStore.create(spark, t, docs, "part", numFiles = 8)
    val before = SnapStore.currentManifest(t).files.size
    assert(before >= 4, s"fixture must be fragmented, got $before files")
    mountAs("target", root)

    // Property = 1 byte → every bin is a single file → the CALL with
    // target 0 (defer to property) rewrites nothing.
    SnapStore.setProperties(t, Map("write.target-file-size-bytes" -> "1"))
    spark.sql("CALL graft.system.rewrite_data_files('target.t', 0)")
    assert(SnapStore.currentManifest(t).files.size == before,
      "a 1-byte property target must pack nothing")

    // Property = huge → one bin → the same deferring CALL folds all.
    SnapStore.setProperties(t,
      Map("write.target-file-size-bytes" -> (1L << 40).toString))
    spark.sql("CALL graft.system.rewrite_data_files('target.t', 0)")
    assert(SnapStore.currentManifest(t).files.size < before,
      "a huge property target must fold the fragmented layout")
    assert(SnapStore.read(spark, t).count() == docs.count())
  }
}
