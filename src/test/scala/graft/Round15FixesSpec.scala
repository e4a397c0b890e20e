package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Regression pins for the round-15 VERDICT items:
  *
  *  1. (#6) `.position_deletes` seq-range pushdown: `seq >/>=/</<=/=`
  *     predicates prune input partitions (seq is a per-partition
  *     constant), composing with the r14 `delete_file`/`file` prune;
  *     results stay exact (filters residual).
  *  2. (#5) partition stats survive the spec edge: stored stats are
  *     stamped with the spec they were computed under, so after
  *     `evolve_spec` the `.partition_stats` surface serves EMPTY
  *     (never the stale partitioning) until recomputed.
  */
class Round15FixesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  private def pdPartitions(t: Path,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val sb = new PositionDeletesMetadataTable("t.position_deletes", t)
      .newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    sb.asInstanceOf[org.apache.spark.sql.connector.read
      .SupportsPushDownFilters].pushFilters(filters)
    sb.build().toBatch.planInputPartitions()
  }

  test(".position_deletes prunes partitions by seq range (a " +
    "per-partition constant), composing with delete_file=, and " +
    "SQL results stay exact") {
    import org.apache.spark.sql.sources._
    val root = Files.createTempDirectory("graft-pdseq")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 80), "part",
      numFiles = 8, keyCol = "doc_id")
    // Three delete commits → seqs 2, 3, 4 (one partition each).
    SnapStore.deletePositions(spark, t, col("doc_id") === 3L)
    SnapStore.deletePositions(spark, t, col("doc_id") === 17L)
    SnapStore.deletePositions(spark, t, col("doc_id") === 29L)
    val dels = SnapStore.currentManifest(t).deleteFiles
      .filter(_.kind == "pos").sortBy(_.seq)
    assert(dels.map(_.seq) == Seq(2, 3, 4))

    assert(pdPartitions(t, Array.empty).length == 3)
    assert(pdPartitions(t, Array(GreaterThan("seq", 2))).length == 2,
      "seq > 2 must plan only the two later delete files")
    assert(pdPartitions(t, Array(GreaterThanOrEqual("seq", 3),
      LessThan("seq", 4))).length == 1)
    assert(pdPartitions(t, Array(EqualTo("seq", 3))).length == 1)
    assert(pdPartitions(t, Array(GreaterThan("seq", 4))).isEmpty)
    assert(pdPartitions(t,
      Array(GreaterThan("seq", Int.MaxValue))).isEmpty,
      "a strict bound at the type edge must saturate, not overflow")
    // Composes with the r14 delete_file prune (intersection).
    assert(pdPartitions(t, Array(GreaterThan("seq", 2),
      EqualTo("delete_file", dels.head.path))).isEmpty)
    assert(pdPartitions(t, Array(GreaterThan("seq", 2),
      EqualTo("delete_file", dels.last.path))).length == 1)

    // SQL-level exactness: the residual filter holds above the prune.
    mountAs("pdseq", root)
    val rows = spark.sql("SELECT seq FROM graft.pdseq.t.position_deletes " +
      "WHERE seq > 2").collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(3, 4), s"got ${rows.toSeq}")
  }

  test("partition stats: computed under one spec, served via " +
    ".partition_stats; spec evolution stales them to EMPTY until " +
    "recomputed under the new spec") {
    val root = Files.createTempDirectory("graft-pstats")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    SnapStore.create(spark, t,
      docs.filter(col("doc_id") < 60)
        .withColumn("bucketed", pmod(col("doc_id"), lit(3L))),
      "part", keyCol = "doc_id")
    mountAs("pstats", root)

    spark.sql("CALL graft.system.compute_partition_stats(" +
      "'pstats.t', 'source,doc_id')")
    val served = spark.sql("SELECT partition, `column`, row_count, ndv " +
      "FROM graft.pstats.t.partition_stats ORDER BY partition, `column`")
      .collect()
    assert(served.nonEmpty)
    // Exact values: each partition holds doc_id % 4 == p, doc_id < 60
    // → 15 rows, 15 distinct ids.
    val p0 = served.filter(r =>
      r.getString(0) == "0" && r.getString(1) == "doc_id")
    assert(p0.length == 1 && p0(0).getLong(2) == 15L &&
      p0(0).getLong(3) == 15L, s"got ${p0.toSeq}")

    // Spec evolution stales the stored stats: the surface is EMPTY —
    // the old partitioning must never masquerade as the new one.
    SnapStore.evolveSpec(t, "bucketed")
    assert(spark.sql(
      "SELECT * FROM graft.pstats.t.partition_stats").collect().isEmpty,
      "stats computed under the OLD spec must not serve after evolve")

    // Recompute under the new spec: served again, new partitioning.
    spark.sql("CALL graft.system.compute_partition_stats(" +
      "'pstats.t', 'doc_id')")
    val parts2 = spark.sql("SELECT DISTINCT partition " +
      "FROM graft.pstats.t.partition_stats").collect()
      .map(_.getString(0)).sorted
    assert(parts2.toSeq == Seq("0", "1", "2"),
      s"new-spec partitions must serve, got ${parts2.toSeq}")
  }

  test("partition-pruned scans serve PARTITION-GRAIN column stats: " +
    "NDV/null/bounds roll up from only the surviving partitions, " +
    "unpruned scans keep the table-level stats") {
    val root = Files.createTempDirectory("graft-pscbo")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    // doc_id values are globally unique, so one partition's NDV is
    // ~1/4 of the table's — a refinement the estimate must reflect.
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 200), "part",
      keyCol = "doc_id")
    mountAs("pscbo", root)
    spark.sql("CALL graft.system.compute_table_stats('pscbo.t')")
    spark.sql("CALL graft.system.compute_partition_stats(" +
      "'pscbo.t', 'doc_id,source')")

    def colStatsOf(sql: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val scan = spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.head
      scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
        .columnStats().asScala.map { case (ref, cs) =>
          ref.fieldNames().mkString(".") ->
            (cs.distinctCount().getAsLong, cs.nullCount().getAsLong)
        }.toMap
    }

    val full = colStatsOf("SELECT doc_id, source FROM graft.pscbo.t")
    val one = colStatsOf(
      "SELECT doc_id, source FROM graft.pscbo.t WHERE part = 3")
    assert(one("doc_id")._1 == 50L,
      s"one-partition scan must serve that partition's exact NDV, " +
        s"got ${one("doc_id")._1}")
    assert(full("doc_id")._1 > 150L,
      s"unpruned scan keeps table-level NDV, got ${full("doc_id")._1}")
    // Repeating column: the per-partition NDV sum caps at table NDV.
    assert(one("source")._1 <= full("source")._1)
  }

  test("VARIANT columns ride write, MOR delete, compaction, and the " +
    "native read unchanged; the delete-aware rewrite preserves " +
    "extracted values exactly") {
    val root = Files.createTempDirectory("graft-varmor")
    root.toFile.deleteOnExit()
    val t = root.resolve("t")
    mountAs("varmor", root)
    spark.sql("""CREATE TABLE graft.varmor.t
      (doc_id BIGINT, part BIGINT, payload VARIANT)
      PARTITIONED BY (part)
      TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""")
    docs.filter(col("doc_id") < 80).selectExpr("doc_id", "part",
      "parse_json(concat('{\"k\":', CAST(doc_id * 7 AS STRING), " +
        "',\"s\":\"v', CAST(doc_id AS STRING), '\"}')) AS payload")
      .createOrReplaceTempView("varmor_seed")
    spark.sql("INSERT INTO graft.varmor.t SELECT * FROM varmor_seed")
    spark.sql("DELETE FROM graft.varmor.t WHERE doc_id % 5 = 2")
    assert(SnapStore.currentManifest(t).deleteFiles.nonEmpty,
      "the MOR delete must stay pending (pairs, no rewrite)")

    def contents(): Map[Long, (Long, String)] =
      spark.sql("SELECT doc_id, " +
        "variant_get(payload, '$.k', 'long') AS k, " +
        "variant_get(payload, '$.s', 'string') AS s " +
        "FROM graft.varmor.t").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val before = contents()
    assert(before.size == 80 - 16 && before(0L) == (0L, "v0") &&
      !before.contains(2L), s"pre-compact contents wrong: ${before.size}")

    // Delete-aware compaction folds the pairs; variant values carry.
    SnapStore.compact(spark, t, "part",
      SnapStore.currentManifest(t).files.map(_.bytes).sum)
    assert(SnapStore.currentManifest(t).deleteFiles.isEmpty,
      "compaction must fold the pending delete")
    assert(contents() == before,
      "the rewrite must preserve every extracted variant value")
  }
}
