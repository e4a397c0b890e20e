package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `CALL <catalog>.system.<proc>(…)` maintenance surface —
  * Iceberg's stored-procedure family (`expire_snapshots`,
  * `rewrite_data_files`, `rollback_to_snapshot`,
  * `remove_orphan_files`, `fast_forward`, `create_tag`,
  * `create_branch`, `apply_deletes`), served through Spark 4's DSv2
  * `ProcedureCatalog` API so plain SQL drives the [[SnapStore]]
  * maintenance actions:
  *
  * {{{
  * CALL graft.system.expire_snapshots(table => 'maint.docs', retain_last => 1)
  * CALL graft.system.rewrite_data_files('maint.docs_frag', 134217728)
  * }}}
  *
  * Each procedure resolves its `table` argument (`db.tbl`) against
  * the session's mounted warehouses, performs ONE SnapStore action,
  * and returns its outcome as a single-row result scan — the same
  * shape Iceberg procedures report.
  */
object GraftProcedures {

  private def str(n: String) = ProcedureParameter.in(n, StringType).build()
  private def int(n: String) = ProcedureParameter.in(n, IntegerType).build()
  private def lng(n: String) = ProcedureParameter.in(n, LongType).build()

  private def spark: SparkSession = SparkSession.active

  /** Resolve `db.tbl` to a mounted snapshot-table root. */
  private def tableDir(ref: String): Path = {
    val d = rawDir(ref)
    require(Files.isDirectory(d) && SnapStore.isSnapTable(d),
      s"'$ref' is not a mounted snapshot table")
    d
  }

  private def u(s: String) = UTF8String.fromString(s)

  /** Resolve `db.tbl` to a mounted path that need NOT be a snapshot
    * table yet — the target of `snapshot` (must not exist) and the
    * source of `migrate` (a plain parquet directory).
    */
  private def rawDir(ref: String): Path = {
    val parts = ref.split('.')
    require(parts.length == 2,
      s"table must be 'db.table', got '$ref'")
    GraftCatalog.mountedDir(spark, parts(0))
      .map(_.resolve(parts(1)))
      .getOrElse(throw new IllegalArgumentException(
        s"database '${parts(0)}' is not mounted"))
  }

  /** One procedure: fixed IN parameters, a result schema, and the
    * action producing the single result row.
    */
  private final class Proc(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      action: InternalRow => Array[Any])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft system procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // side-effecting
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new LocalScan(resultSchema,
        Array[InternalRow](new GenericInternalRow(action(input))),
        s"graft-procedure $procName")).iterator()
  }

  /** A procedure whose result is a MULTI-row scan (`ancestors_of`). */
  private final class RowsProc(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      action: InternalRow => Array[Array[Any]])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft system procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new LocalScan(resultSchema,
        action(input).map(vs =>
          new GenericInternalRow(vs): InternalRow),
        s"graft-procedure $procName")).iterator()
  }

  /** One body, two names: the delete-file merge under both our short
    * verb and Iceberg's exact `rewrite_position_delete_files`.
    */
  private def rewriteDeleteProc(name: String): UnboundProcedure =
    new Proc(name,
      Array(str("table")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("delete_files", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val m = SnapStore.rewriteDeleteFiles(spark, dir)
        Array[Any](m.version, m.deleteFiles.size)
      })

  /** One body, two names: publish an id-staged (spark.wap.id)
    * snapshot onto the CURRENT main head.
    */
  private def publishProc(name: String): UnboundProcedure =
    new Proc(name,
      Array(str("table"), str("wap_id")),
      StructType(Seq(
        StructField("wap_id", StringType, nullable = false),
        StructField("current_version", IntegerType, nullable = false))),
      { in =>
        val id = in.getUTF8String(1).toString
        val m = SnapStore.cherrypickSnapshot(spark,
          tableDir(in.getUTF8String(0).toString), id)
        Array[Any](u(id), m.version)
      })

  private val procs: Map[String, UnboundProcedure] = Map(
    // Iceberg ancestors_of: the ancestry line of a snapshot (0 = the
    // current head), one row per ancestor with its commit instant.
    "ancestors_of" -> new RowsProc("ancestors_of",
      Array(str("table"), int("version")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("committed_at_ms", LongType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val v0 = in.getInt(1)
        val v = if (v0 > 0) v0 else SnapStore.currentVersion(dir).getOrElse(
          throw new IllegalArgumentException(s"No snapshots under $dir"))
        SnapStore.ancestorsOf(dir, v)
          .map { case (ver, ts) => Array[Any](ver, ts) }.toArray
      }),
    // View DDL verbs — the SQL driving surface for the DSv2
    // ViewCatalog (stock Spark 4.1 parses CREATE/DROP VIEW for v2
    // catalogs but ships no execution path; Iceberg fills the same
    // gap with extensions). create_view VALIDATES the definition by
    // planning it (so only resolvable — and therefore acyclic —
    // definitions persist), then stores it through the catalog's
    // ViewCatalog face; reads resolve via ResolveGraftViews.
    "create_view" -> new Proc("create_view",
      Array(str("view"), str("sql")),
      StructType(Seq(
        StructField("view", StringType, nullable = false),
        StructField("columns", IntegerType, nullable = false))),
      { in =>
        val ref = in.getUTF8String(0).toString
        val parts = ref.split('.')
        require(parts.length == 2, s"view must be 'db.view', got '$ref'")
        val sql = in.getUTF8String(1).toString
        val schema = spark.sql(sql).schema // plans → validates
        val vc = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        vc.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
          Identifier.of(Array(parts(0)), parts(1)),
          sql, "graft", Array(parts(0)), schema, schema.fieldNames,
          Array.empty, Array.empty, java.util.Map.of()))
        Array[Any](u(ref), schema.fields.length)
      }),
    "drop_view" -> new Proc("drop_view",
      Array(str("view")),
      StructType(Seq(
        StructField("view", StringType, nullable = false),
        StructField("dropped", BooleanType, nullable = false))),
      { in =>
        val ref = in.getUTF8String(0).toString
        val parts = ref.split('.')
        require(parts.length == 2, s"view must be 'db.view', got '$ref'")
        val vc = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        Array[Any](u(ref),
          vc.dropView(Identifier.of(Array(parts(0)), parts(1))))
      }),
    "rename_view" -> new Proc("rename_view",
      Array(str("view"), str("new_name")),
      StructType(Seq(
        StructField("view", StringType, nullable = false))),
      { in =>
        val ref = in.getUTF8String(0).toString
        val parts = ref.split('.')
        require(parts.length == 2, s"view must be 'db.view', got '$ref'")
        val to = in.getUTF8String(1).toString
        require(!to.contains('.'),
          "new_name is a bare view name (renames stay in the db)")
        val vc = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        vc.renameView(Identifier.of(Array(parts(0)), parts(1)),
          Identifier.of(Array(parts(0)), to))
        Array[Any](u(s"${parts(0)}.$to"))
      }),
    "list_views" -> new RowsProc("list_views",
      Array(str("db")),
      StructType(Seq(
        StructField("view", StringType, nullable = false))),
      { in =>
        val vc = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
        vc.listViews(in.getUTF8String(0).toString)
          .map(i => Array[Any](u(i.name()))).sortBy(_(0).toString)
      }),
    // Iceberg register_table: adopt an EXISTING snapshot-table root
    // — manifests, history, branches and all — under a catalog name,
    // zero copies (the name becomes a symlink to the root). Refuses
    // roots any mounted warehouse already owns (double ownership:
    // expiry through one name would break the other) and re-registers
    // of an already-registered root. DROP on a registered name
    // unregisters only; the source stays (VERDICT r12 #6).
    "register_table" -> new Proc("register_table",
      Array(str("table"), str("source_root")),
      StructType(Seq(
        StructField("table", StringType, nullable = false),
        StructField("current_version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val ref = in.getUTF8String(0).toString
        val target = rawDir(ref)
        val src = Paths.get(in.getUTF8String(1).toString)
        require(Files.isDirectory(src) && SnapStore.isSnapTable(src),
          s"'$src' is not a snapshot table root")
        require(!Files.exists(target,
          java.nio.file.LinkOption.NOFOLLOW_LINKS),
          s"table '$ref' already exists")
        val real = src.toRealPath()
        val owned = GraftCatalog.mountedRoots(spark).flatMap { root =>
          val stream = Files.list(root)
          try stream.iterator().asScala.toSeq.filter(SnapStore.isSnapTable(_))
          finally stream.close()
        }.exists(child =>
          scala.util.Try(child.toRealPath() == real).getOrElse(false))
        require(!owned,
          s"'$src' is already owned by a mounted warehouse — " +
            "registering it twice would double-own its retention")
        Files.createSymbolicLink(target, real)
        val m = SnapStore.currentManifest(target)
        Array[Any](u(ref), m.version, m.files.size)
      }),
    // Iceberg compute_table_stats (ANALYZE): one distributed agg
    // computing per-column NDV/null/bounds statistics, persisted
    // beside the manifests and served to Spark's CBO through the
    // scan's DSv2 column statistics (VERDICT r12 #3). One row per
    // column.
    "compute_table_stats" -> new RowsProc("compute_table_stats",
      Array(str("table")),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("ndv", LongType, nullable = false),
        StructField("null_count", LongType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val (_, stats) = SnapStore.computeTableStats(spark, dir)
        stats.toSeq.sortBy(_._1).map { case (n, s) =>
          Array[Any](u(n), s.ndv, s.nulls)
        }.toArray
      }),
    // Partition-grain stats (VERDICT r14 #5 — Iceberg's partition
    // statistics files, extended with per-partition per-column NDV):
    // ONE distributed agg grouped by the partition transform;
    // persisted beside colstats, served via `.partition_stats`
    // (spec-staleness guarded). `columns` is a comma-separated list;
    // empty = every column.
    // `mode`: 'full' (default) recomputes everything; 'incremental'
    // recomputes ONLY the partitions touched since the stored stats'
    // stamped version over a bound-pruned read, falling back to full
    // across replace-style history / spec or column-set changes
    // (VERDICT r15 #3/#8).
    "compute_partition_stats" -> new RowsProc("compute_partition_stats",
      Array(str("table"), str("columns"),
        ProcedureParameter.in("mode", StringType)
          .defaultValue("'full'").build()),
      StructType(Seq(
        StructField("partition", StringType, nullable = false),
        StructField("column", StringType, nullable = false),
        StructField("row_count", LongType, nullable = false),
        StructField("ndv", LongType, nullable = false),
        StructField("null_count", LongType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val cols = in.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val mode =
          if (in.numFields > 2 && !in.isNullAt(2))
            in.getUTF8String(2).toString.toLowerCase
          else "full"
        require(mode == "full" || mode == "incremental",
          s"mode must be 'full' or 'incremental', got '$mode'")
        val stats =
          if (mode == "incremental")
            SnapStore.computePartitionStatsIncremental(spark, dir, cols)._1
          else SnapStore.computePartitionStats(spark, dir, cols)
        stats.flatMap { case (part, rows, byCol) =>
            byCol.toSeq.sortBy(_._1).map { case (n, s) =>
              Array[Any](u(part), u(n), rows, s.ndv, s.nulls)
            }
          }.toArray
      }),
    // Iceberg expire_snapshots: drop old manifests + orphaned files.
    "expire_snapshots" -> new Proc("expire_snapshots",
      Array(str("table"), int("retain_last")),
      StructType(Seq(
        StructField("expired_snapshots", IntegerType, nullable = false),
        StructField("deleted_data_files", IntegerType, nullable = false))),
      { in =>
        val (expired, deleted) =
          SnapStore.expire(tableDir(in.getUTF8String(0).toString), in.getInt(1))
        Array[Any](expired.size, deleted.size)
      }),
    // Iceberg rewrite_data_files: bin-pack compaction to target size.
    "rewrite_data_files" -> new Proc("rewrite_data_files",
      Array(str("table"), lng("target_bytes")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val cur = SnapStore.currentManifest(dir)
        require(cur.partCol.nonEmpty, "table has no partition spec")
        val m = SnapStore.compact(spark, dir, cur.partCol, in.getLong(1))
        Array[Any](m.version, m.files.size)
      }),
    // Iceberg rewrite_data_files(where => …): FILTERED bin-pack —
    // the predicate scopes the rewrite to files whose manifest
    // bounds may match; everything else carries byte-identical. On
    // a 100 TB table this is the only runnable form of compaction
    // (bin-pack the hot partitions, never touch the cold ones).
    "rewrite_data_files_where" -> new Proc("rewrite_data_files_where",
      Array(str("table"), lng("target_bytes"), str("where")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val cur = SnapStore.currentManifest(dir)
        require(cur.partCol.nonEmpty, "table has no partition spec")
        val cond = org.apache.spark.sql.functions
          .expr(in.getUTF8String(2).toString)
        val m = SnapStore.compact(spark, dir, cur.partCol, in.getLong(1),
          where = Some(cond))
        Array[Any](m.version, m.files.size)
      }),
    // Iceberg expire_snapshots(older_than, retain_last): age-based
    // expiry by commit instant (manifest mtime), newest retained.
    "expire_snapshots_older_than" -> new Proc("expire_snapshots_older_than",
      Array(str("table"), lng("older_than_ms"), int("retain_last")),
      StructType(Seq(
        StructField("expired_snapshots", IntegerType, nullable = false),
        StructField("deleted_data_files", IntegerType, nullable = false))),
      { in =>
        val (expired, deleted) = SnapStore.expireOlderThan(
          tableDir(in.getUTF8String(0).toString), in.getLong(1),
          in.getInt(2))
        Array[Any](expired.size, deleted.size)
      }),
    // Iceberg rewrite_manifests: metadata-only rebalance of the
    // manifest-list grouping (same files, even fresh groups).
    "rewrite_manifests" -> new Proc("rewrite_manifests",
      Array(str("table")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("manifest_groups", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val m = SnapStore.rewriteManifests(dir)
        Array[Any](m.version, SnapStore.currentManifest(dir).groups.size)
      }),
    // Iceberg rollback_to_snapshot.
    "rollback_to_snapshot" -> new Proc("rollback_to_snapshot",
      Array(str("table"), int("version")),
      StructType(Seq(
        StructField("previous_version", IntegerType, nullable = false),
        StructField("current_version", IntegerType, nullable = false))),
      { in =>
        val m = SnapStore.rollback(
          tableDir(in.getUTF8String(0).toString), in.getInt(1))
        Array[Any](m.parent, m.version)
      }),
    // Iceberg rollback_to_timestamp: resolve the stamped commit
    // instants to the snapshot current as of `ts_ms`, then the same
    // metadata-only rollback commit.
    "rollback_to_timestamp" -> new Proc("rollback_to_timestamp",
      Array(str("table"), lng("ts_ms")),
      StructType(Seq(
        StructField("previous_version", IntegerType, nullable = false),
        StructField("current_version", IntegerType, nullable = false))),
      { in =>
        val m = SnapStore.rollbackToTimestamp(
          tableDir(in.getUTF8String(0).toString), in.getLong(1))
        Array[Any](m.parent, m.version)
      }),
    // Iceberg expire_snapshots(snapshot_ids => …): expire ONE named
    // snapshot (tag-protected and head snapshots refuse the same way
    // the retention paths protect them — the head via retain-last).
    "expire_snapshot_id" -> new Proc("expire_snapshot_id",
      Array(str("table"), int("version")),
      StructType(Seq(
        StructField("expired_snapshots", IntegerType, nullable = false),
        StructField("deleted_data_files", IntegerType, nullable = false))),
      { in =>
        val (expired, deleted) = SnapStore.expireSnapshotId(
          tableDir(in.getUTF8String(0).toString), in.getInt(1))
        Array[Any](expired.size, deleted.size)
      }),
    // Iceberg remove_orphan_files (older_than guard in millis).
    "remove_orphan_files" -> new Proc("remove_orphan_files",
      Array(str("table"), lng("min_age_ms")),
      StructType(Seq(
        StructField("orphan_files_deleted", IntegerType, nullable = false))),
      { in =>
        Array[Any](SnapStore.removeOrphans(
          tableDir(in.getUTF8String(0).toString), in.getLong(1)).size)
      }),
    // Iceberg fast_forward (main adopts a branch head).
    "fast_forward" -> new Proc("fast_forward",
      Array(str("table"), str("branch")),
      StructType(Seq(
        StructField("branch", StringType, nullable = false),
        StructField("current_version", IntegerType, nullable = false))),
      { in =>
        val b = in.getUTF8String(1).toString
        val m = SnapStore.fastForward(tableDir(in.getUTF8String(0).toString), b)
        Array[Any](u(b), m.version)
      }),
    // Ref-level retention (Iceberg's per-reference expiry knobs,
    // max-ref-age-ms / min-snapshots-to-keep / max-snapshot-age-ms):
    // aged-out branches and tags drop whole, surviving branches trim
    // their history. `now_ms` is explicit so retention policies
    // evaluate deterministically.
    "expire_refs" -> new Proc("expire_refs",
      Array(str("table"), lng("now_ms"), lng("max_ref_age_ms"),
        lng("max_snapshot_age_ms"), int("min_snapshots_to_keep")),
      StructType(Seq(
        StructField("dropped_branches", IntegerType, nullable = false),
        StructField("dropped_tags", IntegerType, nullable = false),
        StructField("trimmed_snapshots", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        // Per-ref RETAIN ages persisted by `ALTER TABLE … CREATE
        // BRANCH|TAG … RETAIN n DAYS` (the `ref.<name>.max-ref-age-ms`
        // properties) override the call's default for those refs.
        val overrides = SnapStore.tableProperties(dir).collect {
          case (k, v) if k.startsWith("ref.") &&
              k.endsWith(".max-ref-age-ms") &&
              v.forall(_.isDigit) && v.nonEmpty =>
            k.stripPrefix("ref.").stripSuffix(".max-ref-age-ms") -> v.toLong
        }
        val (droppedB, droppedT, trimmed) = SnapStore.expireRefs(
          dir, in.getLong(1),
          in.getLong(2), in.getLong(3), in.getInt(4),
          maxRefAgeOverrides = overrides)
        Array[Any](droppedB.size, droppedT.size,
          trimmed.values.map(_.size).sum)
      }),
    // Iceberg create_tag (expiry-protected named pin).
    "create_tag" -> new Proc("create_tag",
      Array(str("table"), str("tag"), int("version")),
      StructType(Seq(
        StructField("tag", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      { in =>
        val t = in.getUTF8String(1).toString
        SnapStore.tag(tableDir(in.getUTF8String(0).toString), t, in.getInt(2))
        Array[Any](u(t), in.getInt(2))
      }),
    // Iceberg create_branch (fork from the current snapshot).
    "create_branch" -> new Proc("create_branch",
      Array(str("table"), str("branch")),
      StructType(Seq(
        StructField("branch", StringType, nullable = false),
        StructField("fork_version", IntegerType, nullable = false))),
      { in =>
        val b = in.getUTF8String(1).toString
        val m = SnapStore.createBranch(tableDir(in.getUTF8String(0).toString), b)
        Array[Any](u(b), m.parent)
      }),
    // Iceberg rewrite_position_delete_files: merge small pending
    // delete parquets metadata-only — data files untouched, pos
    // deletes merge freely, eq deletes merge within one sequence.
    "rewrite_delete_files" -> rewriteDeleteProc("rewrite_delete_files"),
    // The same merge under Iceberg's exact procedure name.
    "rewrite_position_delete_files" ->
      rewriteDeleteProc("rewrite_position_delete_files"),
    // Iceberg ALTER TABLE … ADD/REPLACE PARTITION FIELD (an
    // extensions-only SQL face upstream): metadata-only partition-
    // spec evolution through CALL.
    "evolve_spec" -> new Proc("evolve_spec",
      Array(str("table"), str("spec")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("spec", StringType, nullable = false))),
      { in =>
        val spec = in.getUTF8String(1).toString
        val m = SnapStore.evolveSpec(
          tableDir(in.getUTF8String(0).toString), spec)
        Array[Any](m.version, u(spec))
      }),
    // Iceberg snapshot: zero-copy clone — a NEW independent table
    // whose first snapshot references the source's current files.
    // No data IO at all; the clone is born gc.enabled=false (expiry
    // and orphan cleanup refuse — the files belong to the source).
    "snapshot" -> new Proc("snapshot",
      Array(str("source_table"), str("table")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val src = tableDir(in.getUTF8String(0).toString)
        val m = SnapStore.snapshotClone(src,
          rawDir(in.getUTF8String(1).toString))
        Array[Any](m.version, m.files.size)
      }),
    // Iceberg migrate: convert a plain parquet directory into a
    // snapshot table IN PLACE — files adopted where they sit, one
    // stats job, the table owns them afterwards. `key_col` may be ''.
    "migrate" -> new Proc("migrate",
      Array(str("table"), str("part_col"), str("key_col")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val m = SnapStore.migrate(spark,
          rawDir(in.getUTF8String(0).toString),
          in.getUTF8String(1).toString, in.getUTF8String(2).toString)
        Array[Any](m.version, m.files.size)
      }),
    // Iceberg add_files: metadata-only adoption of an existing
    // parquet directory — one stats job, zero data rewritten, the
    // 100 TB migration path.
    "add_files" -> new Proc("add_files",
      Array(str("table"), str("source_dir")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("added_files", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val m = SnapStore.addFiles(spark, dir,
          Paths.get(in.getUTF8String(1).toString))
        // Exact adopted count: diff against the COMMIT's parent (a
        // pre-retry snapshot read would fold a racing writer's delta
        // into the number; code review r12).
        val parentFiles = SnapStore.manifest(dir, m.parent).files.size
        Array[Any](m.version, m.files.size - parentFiles)
      }),
    // Iceberg cherrypick_snapshot / publish_changes: one publish
    // body under both its names (older and newer Iceberg verbs).
    "cherrypick_snapshot" -> publishProc("cherrypick_snapshot"),
    "publish_changes" -> publishProc("publish_changes"),
    // Iceberg create_changelog_view: register the net row-change
    // frame between two snapshots as a temp view (the SQL face of
    // the changelog read; the view stays LAZY — nothing scans until
    // queried, like Iceberg's procedure).
    "create_changelog_view" -> new Proc("create_changelog_view",
      Array(str("table"), str("view_name"), int("start_version"),
        int("end_version")),
      StructType(Seq(
        StructField("view_name", StringType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val view = in.getUTF8String(1).toString
        SnapStore.changelogRead(spark, dir, in.getInt(2), in.getInt(3))
          .createOrReplaceTempView(view)
        Array[Any](u(view))
      }),
    // Iceberg create_changelog_view(compute_updates => true,
    // identifier_columns => …): same registration, with DELETE+INSERT
    // pairs of one identifier within one commit relabeled
    // UPDATE_BEFORE/UPDATE_AFTER.
    "create_changelog_view_with_updates" ->
      new Proc("create_changelog_view_with_updates",
        Array(str("table"), str("view_name"), int("start_version"),
          int("end_version"), str("identifier_columns")),
        StructType(Seq(
          StructField("view_name", StringType, nullable = false))),
        { in =>
          val dir = tableDir(in.getUTF8String(0).toString)
          val view = in.getUTF8String(1).toString
          val ids = in.getUTF8String(4).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          SnapStore.changelogWithUpdates(spark, dir, in.getInt(2),
            in.getInt(3), ids).createOrReplaceTempView(view)
          Array[Any](u(view))
        }),
    // Fold pending delete files back into the data (the rewrite face
    // of Iceberg's rewrite_position_delete_files / delete compaction).
    "apply_deletes" -> new Proc("apply_deletes",
      Array(str("table")),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
      { in =>
        val dir = tableDir(in.getUTF8String(0).toString)
        val cur = SnapStore.currentManifest(dir)
        require(cur.partCol.nonEmpty, "table has no partition spec")
        val m = SnapStore.applyDeletes(spark, dir, cur.partCol)
        Array[Any](m.version, m.files.size)
      }))

  val namespace: Array[String] = Array("system")

  def list(ns: Array[String]): Array[Identifier] =
    if (ns.sameElements(namespace))
      procs.keys.toArray.sorted.map(Identifier.of(namespace, _))
    else Array.empty

  def load(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(namespace),
      s"no procedure namespace ${ident.namespace().mkString(".")}")
    procs.getOrElse(ident.name(),
      throw new IllegalArgumentException(
        s"no procedure system.${ident.name()}"))
  }
}
