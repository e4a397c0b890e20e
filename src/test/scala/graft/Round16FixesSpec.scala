package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** Round-16 fixes: view-body validation that can never execute
  * (ADVICE r15 #1), REPLACE BRANCH failure atomicity (ADVICE r15 #2),
  * WRITE UNORDERED resetting the distribution mode (ADVICE r15 #4),
  * supersede-deletion of iterative durable checkpoints (ADVICE
  * r15 #3), the view DDL completions (VERDICT r15 #5), and the
  * durable kmeans pin (VERDICT r15 #4).
  */
class Round16FixesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"))

  private def mountAs(db: String, root: java.nio.file.Path): Unit = {
    spark.conf.set(s"spark.graft.catalog.dir.$db", root.toString)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  }

  private def tempRoot(tag: String): java.nio.file.Path = {
    val root = Files.createTempDirectory(s"graft-$tag")
    root.toFile.deleteOnExit()
    root
  }

  // ----------------------------------------------------------------
  test("view DDL completions: IF NOT EXISTS is a no-op, a declared " +
    "column list renames the output on every read, a mismatched " +
    "list refuses, ALTER VIEW AS redefines keeping properties") {
    val root = tempRoot("r16vw")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 40), "part")
    mountAs("r16v", root)

    spark.sql("CREATE VIEW graft.r16v.v (grp, cnt) AS " +
      "SELECT part, COUNT(*) FROM graft.r16v.t GROUP BY part")
    val out = spark.sql(
      "SELECT grp, cnt FROM graft.r16v.v ORDER BY grp").collect()
    assert(out.length == 4 && out.map(_.getLong(1)).sum == 40L,
      "aliased view columns must resolve under the DECLARED names")

    // IF NOT EXISTS: existing view untouched, no error.
    spark.sql("CREATE VIEW IF NOT EXISTS graft.r16v.v AS SELECT 1 AS one")
    assert(spark.sql("SELECT SUM(cnt) AS s FROM graft.r16v.v")
      .collect()(0).getLong(0) == 40L, "IF NOT EXISTS must be a no-op")

    // A column list whose arity disagrees with the query refuses.
    val arity = intercept[Exception] {
      spark.sql("CREATE VIEW graft.r16v.v2 (a, b, c) AS " +
        "SELECT part, COUNT(*) FROM graft.r16v.t GROUP BY part") }
    assert(arity.getMessage.contains("column list"))

    // ALTER VIEW … AS: body swaps, stored properties survive.
    spark.sql("ALTER VIEW graft.r16v.v SET TBLPROPERTIES ('owner' = 'me')")
    spark.sql("ALTER VIEW graft.r16v.v AS " +
      "SELECT COUNT(*) AS total FROM graft.r16v.t")
    assert(spark.sql("SELECT total FROM graft.r16v.v")
      .collect()(0).getLong(0) == 40L, "ALTER VIEW AS must redefine")
    val vc = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("r16v"), "v")
    assert(vc.loadView(ident).properties().get("owner") == "me",
      "ALTER VIEW AS must keep stored view properties")
    // Missing view raises.
    intercept[Exception] {
      spark.sql("ALTER VIEW graft.r16v.nope AS SELECT 1 AS one") }
  }

  // ----------------------------------------------------------------
  test("view body validation never executes: a command-shaped body " +
    "refuses at parse and its side effect does NOT happen") {
    val root = tempRoot("r16vx")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 20), "part")
    mountAs("r16x", root)

    // If validation still went through session.sql, this body would
    // CREATE the branch at DDL time (ADVICE r15 #1's exact failure).
    intercept[Exception] {
      spark.sql("CREATE VIEW graft.r16x.evil AS " +
        "ALTER TABLE graft.r16x.t CREATE BRANCH oops") }
    assert(SnapStore.branchHead(t, "oops").isEmpty,
      "view-body validation must NEVER execute the body")
    val vc = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    assert(!vc.viewExists(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("r16x"), "evil")),
      "a refused definition must not persist")
  }

  // ----------------------------------------------------------------
  test("redefinition cycle guard: OR REPLACE and ALTER VIEW AS " +
    "refuse a body that closes a loop through stored definitions, " +
    "leaving the old definition usable") {
    val root = tempRoot("r16cy")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    mountAs("r16c", root)

    spark.sql("CREATE VIEW graft.r16c.v1 AS " +
      "SELECT part, COUNT(*) AS n FROM graft.r16c.t GROUP BY part")
    spark.sql("CREATE VIEW graft.r16c.v2 AS " +
      "SELECT SUM(n) AS s FROM graft.r16c.v1")

    // v1 := SELECT FROM v2 would close v1 -> v2 -> v1. The body
    // VALIDATES fine (v1's old definition still resolves), so only
    // the stored-graph walk can catch it — at DDL time, not at the
    // next read.
    val loop = intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.r16c.v1 AS " +
        "SELECT s FROM graft.r16c.v2") }
    assert(loop.getMessage.contains("cycle"))
    val alterLoop = intercept[Exception] {
      spark.sql("ALTER VIEW graft.r16c.v1 AS " +
        "SELECT s FROM graft.r16c.v2") }
    assert(alterLoop.getMessage.contains("cycle"))
    // Direct self-reference refuses too.
    val self = intercept[Exception] {
      spark.sql("ALTER VIEW graft.r16c.v1 AS " +
        "SELECT * FROM graft.r16c.v1") }
    assert(self.getMessage.contains("cycle"))
    // The old chain still reads.
    assert(spark.sql("SELECT s FROM graft.r16c.v2")
      .collect()(0).getLong(0) == 30L)
  }

  // ----------------------------------------------------------------
  test("REPLACE BRANCH is failure-atomic: a replace whose fork " +
    "cannot succeed leaves the existing branch untouched") {
    val root = tempRoot("r16rb")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    mountAs("r16b", root)

    spark.sql("ALTER TABLE graft.r16b.t CREATE BRANCH keep")
    assert(SnapStore.branchHead(t, "keep").contains(1))

    // AS OF VERSION 99 does not exist: the old branch must survive
    // (previously the drop ran first and the branch was destroyed).
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.r16b.t REPLACE BRANCH keep AS OF VERSION 99") }
    assert(SnapStore.branchHead(t, "keep").contains(1),
      "failed REPLACE BRANCH must leave the old branch intact")
    assert(SnapStore.readBranch(spark, t, "keep").count() == 30L)

    // A valid replace still works.
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 40), "part")
    spark.sql("ALTER TABLE graft.r16b.t REPLACE BRANCH keep AS OF VERSION 2")
    assert(SnapStore.readBranch(spark, t, "keep").count() == 40L)
  }

  // ----------------------------------------------------------------
  test("WRITE UNORDERED resets the declared write spec: sort order " +
    "AND distribution mode are unset") {
    val root = tempRoot("r16wu")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 20), "part")
    mountAs("r16w", root)

    spark.sql("ALTER TABLE graft.r16w.t WRITE DISTRIBUTED BY PARTITION " +
      "LOCALLY ORDERED BY doc_id")
    val before = SnapStore.tableProperties(t)
    assert(before.get("write.distribution-mode").contains("hash"))
    assert(before.get("write.sort.order").contains("doc_id ASC"))

    spark.sql("ALTER TABLE graft.r16w.t WRITE UNORDERED")
    val after = SnapStore.tableProperties(t)
    assert(!after.contains("write.sort.order"))
    assert(!after.contains("write.distribution-mode"),
      "UNORDERED must reset the distribution mode too (Iceberg: none)")
  }

  // ----------------------------------------------------------------
  test("durable iterative pins supersede: label propagation leaves " +
    "ONE surviving checkpoint payload, not one per round") {
    def rddDirs: Set[String] =
      spark.sparkContext.getCheckpointDir.map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) Set.empty[String]
        else fs.listStatus(p).map(_.getPath.getName)
          .filter(_.startsWith("rdd-")).toSet
      }.getOrElse(Set.empty)

    val ckpt = Files.createTempDirectory("graft-r16-ckpt").toString
    spark.conf.set("spark.graft.cc.checkpointDir", ckpt)
    try {
      val before = rddDirs
      val durable = ops.Dedup.clusters(spark, sf).collect()
        .map(_.toString).toSeq
      val added = rddDirs -- before
      assert(added.size == 1,
        s"each round must supersede the previous round's durable " +
          s"payload — expected ONE surviving checkpoint, got $added")
      val baseline = {
        spark.conf.unset("spark.graft.cc.checkpointDir")
        ops.Dedup.clusters(spark, sf).collect().map(_.toString).toSeq
      }
      assert(durable === baseline)
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }

  // ----------------------------------------------------------------
  test("incremental compute_partition_stats falls back to a full " +
    "recompute across replace-style history and after a spec change") {
    val root = tempRoot("r16ps")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 160), "part",
      keyCol = "doc_id")
    mountAs("r16p", root)
    SnapStore.computePartitionStats(spark, t, Seq("source"))

    // A MOR position delete is replace-style history: incremental
    // must fall back (None) and still serve delete-aware stats.
    SnapStore.deletePositions(spark, t,
      col("part") === 1L && pmod(col("doc_id"), lit(2L)) === 0)
    val (afterDelete, mode) =
      SnapStore.computePartitionStatsIncremental(spark, t, Seq("source"))
    assert(mode.isEmpty, "replace-style history must fall back to full")
    assert(afterDelete == SnapStore.computePartitionStats(spark, t,
      Seq("source")))

    // A spec evolution invalidates the stored stats: fallback again.
    SnapStore.evolveSpec(t, "truncate(40,doc_id)")
    val (_, mode2) =
      SnapStore.computePartitionStatsIncremental(spark, t, Seq("source"))
    assert(mode2.isEmpty, "a spec change must fall back to full")
    // A repeat call with no new commits is a zero-scan no-op.
    val (_, mode3) =
      SnapStore.computePartitionStatsIncremental(spark, t, Seq("source"))
    assert(mode3.contains(0), "up-to-date stats must cost zero scan")
  }

  // ----------------------------------------------------------------
  test("a null partition group persists under the explicit sentinel, " +
    "serves as 'null' with a stale flag on .partition_stats, and no " +
    "longer disables the pruned-scan CBO refinement") {
    val root = tempRoot("r16np")
    val t = root.resolve("t")
    // A nullable identity partition column with SOME null rows (the
    // write path only requires per-file bounds to exist, i.e. at
    // least one non-null value per file).
    val rows = Tables.documents(spark, sf).filter(col("doc_id") < 200)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(50L)) === 49L, lit(null))
          .otherwise(pmod(col("doc_id"), lit(4L))).as("part"),
        col("source"))
    SnapStore.create(spark, t, rows, "part", keyCol = "doc_id",
      numFiles = 4)
    mountAs("r16n", root)
    spark.sql("CALL graft.system.compute_table_stats('r16n.t')")
    spark.sql("CALL graft.system.compute_partition_stats(" +
      "'r16n.t', 'doc_id,source')")

    val parts = spark.sql("SELECT DISTINCT partition FROM " +
      "graft.r16n.t.partition_stats ORDER BY partition").collect()
      .map(_.getString(0)).toSeq
    assert(parts.contains("null"),
      s"the null group must serve as 'null', got $parts")
    assert(spark.sql("SELECT DISTINCT stale FROM " +
      "graft.r16n.t.partition_stats").collect()
      .map(_.getBoolean(0)).toSeq == Seq(false))

    // The pruned-scan refinement still engages: a one-partition scan
    // serves LESS than the table NDV but at least that partition's
    // (the null group's rows are conservatively included — never
    // understating).
    def ndvOf(sql: String): Long = {
      import scala.jdk.CollectionConverters._
      val scan = spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.head
      scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
        .columnStats().asScala.collectFirst {
          case (ref, cs) if ref.fieldNames().mkString(".") == "doc_id" =>
            cs.distinctCount().getAsLong
        }.get
    }
    val full = ndvOf("SELECT doc_id, source FROM graft.r16n.t")
    val one = ndvOf(
      "SELECT doc_id, source FROM graft.r16n.t WHERE part = 3")
    val nullRows = 4L // doc_id % 50 == 49 under 200
    val partRows = spark.sql("SELECT row_count FROM " +
      "graft.r16n.t.partition_stats WHERE partition = '3' " +
      "AND column = 'doc_id'").collect()(0).getLong(0)
    assert(one < full,
      s"refinement must engage despite the null group ($one vs $full)")
    assert(one >= partRows,
      s"refined NDV must never understate the partition ($one < $partRows)")
    assert(one <= partRows + nullRows,
      s"refined NDV is the partition plus at most the null group " +
        s"($one > $partRows + $nullRows)")
  }

  // ----------------------------------------------------------------
  test("maint_partition_stats_inc entry: the incremental lifecycle's " +
    "REQUIREs hold and the refreshed surface serves every partition " +
    "fresh") {
    val out = ops.Maintenance.partitionStatsInc(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.getBoolean(7)), "stale must be false after " +
      "the incremental refresh")
    val parts = out.map(_.getString(0)).distinct.sorted
    assert(parts.length == 8, s"eight partitions expected, got $parts")
  }

  // ----------------------------------------------------------------
  test("kmeans rounds pin durably under the conf and stay exact") {
    val baseline = ops.Curation.kmeansConverge(spark, sf).collect()
      .map(_.toString).toSeq
    val ckpt = Files.createTempDirectory("graft-r16-km").toString
    spark.conf.set("spark.graft.cc.checkpointDir", ckpt)
    try {
      val durable = ops.Curation.kmeansConverge(spark, sf).collect()
        .map(_.toString).toSeq
      assert(durable === baseline,
        "durable pins must not change kmeans results")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }
}
