package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapStore

/** The parser-extension SQL DDL (VERDICT r14 #1/#3): the statements
  * Iceberg serves through ITS session extensions — branch/tag DDL,
  * WRITE ORDERED BY, SET IDENTIFIER FIELDS, CREATE/DROP VIEW — parse
  * through [[graft.sources.GraftSqlParser]] and route to the existing
  * SnapStore/GraftViews verbs. Every statement and its error cases.
  */
class SqlDdlSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(4L)).as("part"),
    col("source"), col("text"),
    expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))

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
  test("ALTER TABLE CREATE/DROP BRANCH: create forks, duplicate " +
    "refuses, IF NOT EXISTS is soft, AS OF VERSION forks a past " +
    "snapshot, DROP drops and IF EXISTS is soft") {
    val root = tempRoot("ddlbr")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 40), "part")
    mountAs("dbr", root)

    spark.sql("ALTER TABLE graft.dbr.t CREATE BRANCH audit")
    assert(SnapStore.branchHead(t, "audit").contains(1))
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dbr.t CREATE BRANCH audit") }
    assert(dup.getMessage.contains("already exists"))
    val soft = spark.sql(
      "ALTER TABLE graft.dbr.t CREATE BRANCH IF NOT EXISTS audit")
      .collect()(0)
    assert(soft.getString(1) == "exists")

    // Main moves; AS OF VERSION 1 forks the PAST snapshot.
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 60), "part")
    spark.sql("ALTER TABLE graft.dbr.t CREATE BRANCH old AS OF VERSION 1")
    assert(SnapStore.readBranch(spark, t, "old").count() == 40L,
      "AS OF VERSION must fork the named snapshot, not the head")
    assert(SnapStore.readBranch(spark, t, "audit").count() == 40L)
    assert(SnapStore.read(spark, t).count() == 60L)

    spark.sql("ALTER TABLE graft.dbr.t DROP BRANCH old")
    assert(SnapStore.branchHead(t, "old").isEmpty)
    val gone = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dbr.t DROP BRANCH old") }
    assert(gone.getMessage.contains("does not exist"))
    val softDrop = spark.sql(
      "ALTER TABLE graft.dbr.t DROP BRANCH IF EXISTS old").collect()(0)
    assert(softDrop.getString(1) == "absent")

    // Crossed soft clauses refuse at parse.
    val crossed = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dbr.t DROP BRANCH IF NOT EXISTS audit") }
    assert(crossed.getMessage.contains("IF EXISTS"))
  }

  // ----------------------------------------------------------------
  test("ALTER TABLE CREATE/DROP TAG: AS OF VERSION pins, RETAIN " +
    "persists a per-ref age expire_refs honors, DROP drops") {
    val root = tempRoot("ddltag")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 50), "part")
    mountAs("dtg", root)

    spark.sql("ALTER TABLE graft.dtg.t CREATE TAG pin AS OF VERSION 1 " +
      "RETAIN 5 DAYS")
    assert(SnapStore.tags(t) == Map("pin" -> 1))
    assert(SnapStore.tableProperties(t)
      .get("ref.pin.max-ref-age-ms").contains((5L * 86400000L).toString))
    // Head tag with no AS OF pins the current version.
    spark.sql("ALTER TABLE graft.dtg.t CREATE TAG head_pin")
    assert(SnapStore.tags(t)("head_pin") == 2)

    // expire_refs: the call's default age is huge, but pin's stored
    // 5-day RETAIN override ages it out at now = commit + 6 days.
    val committed = SnapStore.commitInstantMs(t, 1)
    val now = committed + 6L * 86400000L
    spark.sql("CALL graft.system.expire_refs('dtg.t', " +
      s"${now}L, ${365L * 86400000L}L, ${365L * 86400000L}L, 1)")
    assert(!SnapStore.tags(t).contains("pin"),
      "the RETAIN age persisted by DDL must drive expire_refs")
    assert(SnapStore.tags(t).contains("head_pin"),
      "refs without a RETAIN override use the call's default age")

    spark.sql("ALTER TABLE graft.dtg.t DROP TAG head_pin")
    assert(SnapStore.tags(t).isEmpty)
    val gone = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dtg.t DROP TAG head_pin") }
    assert(gone.getMessage.contains("does not exist"))
    spark.sql("ALTER TABLE graft.dtg.t DROP TAG IF EXISTS head_pin")
  }

  // ----------------------------------------------------------------
  test("ALTER TABLE WRITE ORDERED BY persists the sort order appends " +
    "honor (DESC included), DISTRIBUTED BY PARTITION records the " +
    "mode, UNORDERED unsets") {
    val root = tempRoot("ddlord")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 40), "part")
    mountAs("dor", root)

    spark.sql("ALTER TABLE graft.dor.t WRITE ORDERED BY tok DESC")
    assert(SnapStore.tableProperties(t)
      .get("write.sort.order").contains("tok DESC"))

    // An append now sorts (part, tok DESC) within each file: rows of
    // one partition value inside one file must be tok-non-increasing.
    val before = SnapStore.currentManifest(t).files.map(_.path).toSet
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 120), "part")
    val newFiles = SnapStore.currentManifest(t).files
      .filter(f => !before(f.path))
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val rows = spark.read.parquet(t.resolve(f.path).toString)
        .select(col("part"), col("tok")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      rows.groupBy(_._1).values.foreach { grp =>
        assert(grp.map(_._2).sliding(2).forall(w =>
          w.length < 2 || w(0) >= w(1)),
          s"rows within ${f.path} must sort tok DESC inside a partition")
      }
    }

    spark.sql("ALTER TABLE graft.dor.t WRITE DISTRIBUTED BY PARTITION " +
      "LOCALLY ORDERED BY tok ASC")
    val props = SnapStore.tableProperties(t)
    assert(props.get("write.distribution-mode").contains("hash"))
    assert(props.get("write.sort.order").contains("tok ASC"))

    spark.sql("ALTER TABLE graft.dor.t WRITE UNORDERED")
    assert(!SnapStore.tableProperties(t).contains("write.sort.order"))

    // An unknown sort column refuses at execution.
    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dor.t WRITE ORDERED BY nope") }
    assert(bad.getMessage.contains("not in the table schema"))
  }

  // ----------------------------------------------------------------
  test("ALTER TABLE SET/DROP IDENTIFIER FIELDS: metadata-only key " +
    "change, stale key bounds cleared, composite refused, DROP " +
    "validates the current identifier") {
    val root = tempRoot("ddlid")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 60), "part",
      keyCol = "doc_id")
    mountAs("did", root)
    assert(SnapStore.currentManifest(t).files
      .forall(f => f.keyMin.nonEmpty && f.keyMax.nonEmpty))

    spark.sql("ALTER TABLE graft.did.t SET IDENTIFIER FIELDS tok")
    val m = SnapStore.currentManifest(t)
    assert(m.keyCol == "tok")
    assert(m.version == 2, "a pure metadata commit")
    assert(m.files.forall(f => f.keyMin.isEmpty && f.keyMax.isEmpty),
      "bounds collected under the OLD identifier must clear")

    // New writes collect bounds under the NEW identifier (appends
    // pick up the manifest's key column automatically).
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 60 && col("doc_id") < 80), "part")
    val appended = SnapStore.currentManifest(t).files.filter(_.seq == 3)
    assert(appended.nonEmpty &&
      appended.forall(f => f.keyMin.nonEmpty && f.keyMax.nonEmpty))

    val multi = intercept[Exception] {
      spark.sql("ALTER TABLE graft.did.t SET IDENTIFIER FIELDS a, b") }
    assert(multi.getMessage.contains("one column"))
    val wrongDrop = intercept[Exception] {
      spark.sql("ALTER TABLE graft.did.t DROP IDENTIFIER FIELDS doc_id") }
    assert(wrongDrop.getMessage.contains("current identifier"))
    spark.sql("ALTER TABLE graft.did.t DROP IDENTIFIER FIELDS tok")
    assert(SnapStore.currentManifest(t).keyCol.isEmpty)
  }

  // ----------------------------------------------------------------
  test("ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD evolve the " +
    "spec metadata-only (structural field match): ADD builds a " +
    "compound spec, REPLACE swaps one field keeping the rest, DROP " +
    "removes one and the last drop leaves the table unpartitioned") {
    val root = tempRoot("ddlpart")
    val t = root.resolve("t")
    SnapStore.create(spark, t,
      docs.filter(col("doc_id") < 40)
        .withColumn("ts", expr("timestamp_micros(doc_id * 3600000000)")),
      "part")
    mountAs("dpf", root)

    spark.sql("ALTER TABLE graft.dpf.t REPLACE PARTITION FIELD part " +
      "WITH hours(ts)")
    val m = SnapStore.currentManifest(t)
    assert(m.partCol == "hours(ts)" && m.version == 2,
      s"metadata-only spec commit expected, got ${m.partCol}/v${m.version}")

    val wrongOld = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dpf.t REPLACE PARTITION FIELD part " +
        "WITH days(ts)") }
    assert(wrongOld.getMessage.contains("current spec"))

    // ADD appends (structural duplicate refuses), REPLACE swaps the
    // named field only, DROP removes one field at a time.
    spark.sql("ALTER TABLE graft.dpf.t ADD PARTITION FIELD " +
      "bucket(4, doc_id)")
    assert(SnapStore.currentManifest(t).partCol ==
      "hours(ts),bucket(4,doc_id)")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dpf.t ADD PARTITION FIELD " +
        "bucket(4,doc_id)") }
    assert(dup.getMessage.contains("already in the spec"))
    spark.sql("ALTER TABLE graft.dpf.t REPLACE PARTITION FIELD " +
      "hours(ts) WITH days(ts)")
    assert(SnapStore.currentManifest(t).partCol ==
      "days(ts),bucket(4,doc_id)")
    spark.sql("ALTER TABLE graft.dpf.t DROP PARTITION FIELD days(ts)")
    assert(SnapStore.currentManifest(t).partCol == "bucket(4,doc_id)")
    val missing = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dpf.t DROP PARTITION FIELD part") }
    assert(missing.getMessage.contains("current spec"))
    spark.sql("ALTER TABLE graft.dpf.t DROP PARTITION FIELD " +
      "bucket(4, doc_id)")
    assert(SnapStore.currentManifest(t).partCol.isEmpty,
      "dropping the last field must leave the table unpartitioned")
    // The unpartitioned table still reads (conservative full scan).
    assert(SnapStore.read(spark, t).count() == 40L)
  }

  // ----------------------------------------------------------------
  test("CREATE/DROP VIEW SQL DDL: create validates and persists, " +
    "SELECT resolves, OR REPLACE swaps, DROP errors without IF " +
    "EXISTS, stock temp views stay on the stock path") {
    val root = tempRoot("ddlvw")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 50), "part")
    mountAs("dvw", root)

    spark.sql("CREATE VIEW graft.dvw.v AS " +
      "SELECT part, COUNT(*) AS n FROM graft.dvw.t GROUP BY part")
    assert(spark.sql("SELECT SUM(n) AS s FROM graft.dvw.v")
      .collect()(0).getLong(0) == 50L)

    val dup = intercept[Exception] {
      spark.sql("CREATE VIEW graft.dvw.v AS SELECT 1 AS one") }
    assert(dup != null)
    spark.sql("CREATE OR REPLACE VIEW graft.dvw.v AS " +
      "SELECT COUNT(*) AS n FROM graft.dvw.t WHERE part = 0")
    val n = spark.sql("SELECT n FROM graft.dvw.v").collect()(0).getLong(0)
    assert(n > 0 && n < 50L, "OR REPLACE must swap the definition")

    // An unresolvable definition refuses BEFORE persisting: the old
    // definition survives.
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.dvw.v AS " +
        "SELECT * FROM graft.dvw.no_such_table") }
    assert(spark.sql("SELECT n FROM graft.dvw.v")
      .collect()(0).getLong(0) == n)

    spark.sql("DROP VIEW graft.dvw.v")
    val gone = intercept[Exception] { spark.sql("DROP VIEW graft.dvw.v") }
    assert(gone.getMessage.contains("does not exist"))
    spark.sql("DROP VIEW IF EXISTS graft.dvw.v")

    // Stock statements delegate: temp views parse and resolve
    // through Spark's own path, untouched by the interception.
    spark.sql("CREATE TEMPORARY VIEW ddl_tv AS SELECT 7 AS seven")
    assert(spark.sql("SELECT seven FROM ddl_tv")
      .collect()(0).getInt(0) == 7)
    spark.sql("DROP VIEW ddl_tv")
  }

  // ----------------------------------------------------------------
  test("maint_branch_ddl lifecycle: the DDL-created branch stages " +
    "the WAP INSERT, publish lands exactly base + batch, the AS OF " +
    "tag pins pre-publish, the branch retires") {
    val out = graft.ops.Maintenance.branchDdl(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    val docs = Tables.documents(spark, sf).count()
    val staged = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(23L)) === 0).count()
    assert(total == docs + staged,
      s"expected base($docs) + staged($staged), got $total")
    assert(out.exists(r => r.getString(0) == "srcQ" &&
      r.getLong(1) == staged))
  }

  // ----------------------------------------------------------------
  test("CREATE OR REPLACE BRANCH/TAG repoints, bare REPLACE requires " +
    "existence, plain CREATE TAG refuses a duplicate, and ALTER " +
    "VIEW SET/UNSET TBLPROPERTIES round-trips") {
    val root = tempRoot("ddlrep")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part")
    SnapStore.append(spark, t,
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 50), "part")
    mountAs("drp", root)

    spark.sql("ALTER TABLE graft.drp.t CREATE TAG pin AS OF VERSION 1")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE graft.drp.t CREATE TAG pin") }
    assert(dup.getMessage.contains("already exists"))
    assert(SnapStore.tags(t)("pin") == 1)
    spark.sql("ALTER TABLE graft.drp.t CREATE OR REPLACE TAG pin " +
      "AS OF VERSION 2")
    assert(SnapStore.tags(t)("pin") == 2, "OR REPLACE must repoint")
    spark.sql("ALTER TABLE graft.drp.t REPLACE TAG pin AS OF VERSION 1")
    assert(SnapStore.tags(t)("pin") == 1, "bare REPLACE must repoint")
    val noRef = intercept[Exception] {
      spark.sql("ALTER TABLE graft.drp.t REPLACE TAG nope") }
    assert(noRef.getMessage.contains("does not exist"))

    spark.sql("ALTER TABLE graft.drp.t CREATE BRANCH wip AS OF VERSION 1")
    assert(SnapStore.readBranch(spark, t, "wip").count() == 30L)
    spark.sql("ALTER TABLE graft.drp.t CREATE OR REPLACE BRANCH wip")
    assert(SnapStore.readBranch(spark, t, "wip").count() == 50L,
      "OR REPLACE BRANCH must re-fork from the requested point")
    val crossed = intercept[Exception] {
      spark.sql("ALTER TABLE graft.drp.t CREATE OR REPLACE BRANCH " +
        "IF NOT EXISTS wip") }
    assert(crossed.getMessage.contains("does not combine"))

    // ALTER VIEW TBLPROPERTIES through the catalog's atomic swap.
    spark.sql("CREATE VIEW graft.drp.v AS " +
      "SELECT COUNT(*) AS n FROM graft.drp.t")
    spark.sql("ALTER VIEW graft.drp.v SET TBLPROPERTIES " +
      "('note' = 'audited', 'tier' = 'gold')")
    def viewProps(): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val cm = spark.sessionState.catalogManager
      cm.catalog("graft")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        .loadView(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("drp"), "v"))
        .properties().asScala.toMap
    }
    assert(viewProps().get("note").contains("audited") &&
      viewProps().get("tier").contains("gold"))
    spark.sql("ALTER VIEW graft.drp.v UNSET TBLPROPERTIES ('note')")
    assert(!viewProps().contains("note") &&
      viewProps().get("tier").contains("gold"))
    // The definition still resolves after the property edits.
    assert(spark.sql("SELECT n FROM graft.drp.v")
      .collect()(0).getLong(0) == 50L)
  }

  // ----------------------------------------------------------------
  test("DDL column names resolve case-insensitively (canonical " +
    "spelling persists) and global_temp views delegate to stock " +
    "Spark even when the current catalog is graft") {
    val root = tempRoot("ddlci")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 30), "part",
      keyCol = "doc_id")
    mountAs("dci", root)

    spark.sql("ALTER TABLE graft.dci.t WRITE ORDERED BY TOK DESC")
    assert(SnapStore.tableProperties(t)
      .get("write.sort.order").contains("tok DESC"),
      "the schema's canonical spelling must persist")
    spark.sql("ALTER TABLE graft.dci.t SET IDENTIFIER FIELDS SOURCE")
    assert(SnapStore.currentManifest(t).keyCol == "source")
    spark.sql("ALTER TABLE graft.dci.t DROP IDENTIFIER FIELDS Source")
    assert(SnapStore.currentManifest(t).keyCol.isEmpty)

    // global_temp stays stock-routed under a graft current catalog.
    spark.sql("CREATE GLOBAL TEMPORARY VIEW gddl_tv AS SELECT 11 AS v")
    val prev = spark.catalog.currentCatalog()
    spark.sql("USE graft")
    try {
      assert(spark.sql("SELECT v FROM global_temp.gddl_tv")
        .collect()(0).getInt(0) == 11)
      spark.sql("DROP VIEW global_temp.gddl_tv")
      intercept[Exception] {
        spark.sql("SELECT v FROM global_temp.gddl_tv").collect() }
    } finally spark.sql(s"USE $prev")
  }

  // ----------------------------------------------------------------
  test("a replacement that would close a view cycle refuses at DDL " +
    "time (the body plans fine against the OLD definition — only " +
    "the stored-graph walk catches it) and the read-time walk still " +
    "guards rename-closed cycles") {
    val root = tempRoot("ddlcyc")
    val t = root.resolve("t")
    SnapStore.create(spark, t, docs.filter(col("doc_id") < 20), "part")
    mountAs("dcy", root)

    spark.sql("CREATE VIEW graft.dcy.v1 AS " +
      "SELECT doc_id FROM graft.dcy.t")
    spark.sql("CREATE VIEW graft.dcy.v2 AS " +
      "SELECT doc_id FROM graft.dcy.v1")
    // Replacing v1 to read v2 validates against v2's STORED
    // definition (which still reads the old v1 → t), so planning
    // alone would let a v1 ↔ v2 cycle persist — the pre-swap graph
    // walk refuses instead, and v1 keeps its old definition
    // (VERDICT r15 #5).
    val cyc = intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.dcy.v1 AS " +
        "SELECT doc_id FROM graft.dcy.v2") }
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
    assert(chain(cyc).contains("cycle"),
      s"expected the DDL-time cycle refusal, got: ${chain(cyc)}")
    assert(spark.sql("SELECT COUNT(*) AS c FROM graft.dcy.v1")
      .collect()(0).getLong(0) == 20L,
      "the refused replacement must leave v1 readable")

    // The READ-time walk still exists for cycles closed behind the
    // DDL's back (rename_view) — ViewCatalogSpec pins that path.
  }
}
