package graft.core

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Path-addressed SQL catalog for manifest lakes —
  * `spark.sql.catalog.graft = graft.core.GraftCatalog` (any catalog
  * name works; tests use "graft"). The identifier's NAME is the lake
  * directory, the same pattern Delta uses for `delta.`-prefixed path
  * tables, so every lake on disk is a full SQL DML citizen with no
  * registration step:
  *
  * {{{
  *   SELECT * FROM graft.`/data/lake`                      -- manifest-pruned scan
  *   SELECT * FROM graft.`/data/lake` VERSION AS OF 3      -- time travel
  *   INSERT INTO graft.`/data/lake` SELECT ...             -- CAS append
  *   DELETE FROM graft.`/data/lake` WHERE doc_id = 7       -- manifest delete
  *   CALL graft.compact(path => '/data/lake', target_records => 1000000)
  *   CALL graft.vacuum(path => '/data/lake', keep_versions => 2)
  *   CALL graft.restore(path => '/data/lake', version => 3) -- roll back, history intact
  *   SELECT * FROM graft.`/data/lake$history`              -- commit log as a relation
  *   SELECT * FROM graft.`/data/lake$files`                -- per-file skipping stats
  *   SELECT * FROM graft.`/data/lake$partitions`           -- per-partition file/row census
  * }}}
  *
  * The catalog only RESOLVES (identifier → [[GraftLakeTable]], reusing
  * the `spark.read.format("graft")` planning path — one code path for
  * both SQL surfaces); reads, writes, pruning and deletes live on the
  * table. Nothing is enumerable (`listTables` is empty — paths aren't
  * a namespace), and implicit-destruction DDL refuses rather than
  * guess: `dropTable`/`renameTable`/`alterTable` throw. Lake creation
  * is the DataFrame writer's job
  * (`df.write.format("graft").option("partitionCol", ...)`) — a lake
  * needs first data to establish layout, which CREATE TABLE cannot
  * provide. The lifecycle operators that rewrite history get a SQL
  * face as PROCEDURES rather than DML (the Iceberg pattern —
  * maintenance is an explicit CALL, never a side effect of a query):
  * `compact` (optionally clustered — `cluster_by` a column, or a
  * materialized zValue column for the q153 Z-order layout) and
  * `vacuum`. Each returns a one-row result set describing what it
  * did.
  *
  * Scale: resolution reads ONE manifest file (the latest, or the named
  * version); no directory listing, no file opens — identical cost to
  * the Scala `latestSnapshot` route regardless of lake size.
  */
final class GraftCatalog extends TableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  /** `graft.`/dir`` parses to namespace=[] name="/dir"; a dotted
    * multipart identifier is not a path and names nothing here. */
  private def dirOf(ident: Identifier): String = {
    if (ident.namespace.nonEmpty)
      throw new NoSuchTableException(ident)
    ident.name
  }

  override def loadTable(ident: Identifier): Table = {
    val dir0 = dirOf(ident)
    GraftMetadata.parse(dir0) match {
      case Some((dir, kind)) =>
        if (ManifestLake.latestSnapshot(dir).isEmpty)
          throw new NoSuchTableException(Seq(dir0))
        GraftMetadataTable(dir, kind, None)
      case None =>
        if (ManifestLake.latestSnapshot(dir0).isEmpty)
          throw new NoSuchTableException(Seq(dir0))
        GraftLake.resolve(new CaseInsensitiveStringMap(
          java.util.Map.of("path", dir0)))
    }
  }

  /** `VERSION AS OF <v>` — time travel straight off the manifest log.
    * Works on the data table and on `$files` (the snapshot's file
    * list AT that version); `$history` already spans every retained
    * version, so versioning it answers nothing and refuses. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir0 = dirOf(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are manifest numbers, got '$version'")
    }
    GraftMetadata.parse(dir0) match {
      case Some((_, GraftMetadata.History)) =>
        throw new UnsupportedOperationException(
          "$history already lists every retained version — query it " +
            "with WHERE version <= v instead of VERSION AS OF")
      case Some((dir, kind)) =>
        if (ManifestLake.snapshotAt(dir, v).isEmpty)
          throw new NoSuchTableException(Seq(s"$dir0@v$v"))
        GraftMetadataTable(dir, kind, Some(v))
      case None =>
        if (ManifestLake.snapshotAt(dir0, v).isEmpty)
          throw new NoSuchTableException(Seq(s"$dir0@v$v"))
        GraftLake.resolve(new CaseInsensitiveStringMap(
          java.util.Map.of("path", dir0, "versionAsOf", version)))
    }
  }

  /** `TIMESTAMP AS OF <expr>` — Spark hands the evaluated timestamp in
    * MICROseconds; resolution finds the highest retained version whose
    * `#ts` commit wall time is ≤ it ([[ManifestLake.snapshotAsOfTimestamp]])
    * and then serves that VERSION — time is sugar over the version log,
    * never a second addressing scheme. Works on the data table and
    * `$files`; `$history` spans all versions and refuses as for
    * VERSION AS OF. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir0 = dirOf(ident)
    val millis = Math.floorDiv(timestamp, 1000L)
    // a MISSING lake raises NoSuchTableException like the other
    // overloads; a lake that exists but has no qualifying commit
    // raises IllegalStateException — NOT NoSuchTableException, which
    // the analyzer swallows and replaces with an unrelated
    // direct-file-query error
    def resolve(dir: String): Long = {
      if (ManifestLake.latestSnapshot(dir).isEmpty)
        throw new NoSuchTableException(Seq(dir0))
      ManifestLake.snapshotAsOfTimestamp(dir, millis).map(_.version).getOrElse(
        throw new IllegalStateException(s"$dir0 @ ${millis}ms: every retained " +
          "timestamped commit is later (or the lake predates commit timestamps)"))
    }
    GraftMetadata.parse(dir0) match {
      case Some((_, GraftMetadata.History)) =>
        throw new UnsupportedOperationException(
          "$history already lists every retained version — query it " +
            "with WHERE version <= v instead of TIMESTAMP AS OF")
      case Some((dir, kind)) =>
        GraftMetadataTable(dir, kind, Some(resolve(dir)))
      case None =>
        GraftLake.resolve(new CaseInsensitiveStringMap(
          java.util.Map.of("path", dir0, "versionAsOf", resolve(dir0).toString)))
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && {
      val dir = GraftMetadata.parse(ident.name).map(_._1).getOrElse(ident.name)
      ManifestLake.latestSnapshot(dir).isDefined
    }

  /** `CREATE TABLE graft.`/dir`` (cols...) PARTITIONED BY (col)
    * TBLPROPERTIES('statsCols'='a,b', 'bloomCols'='k')` — the DDL-first
    * creation path (the reference declares schemas in DDL before any
    * data exists; see sql/schema.sql:9-17). Commits an empty v1
    * manifest carrying schema + declared layout via
    * [[ManifestLake.create]]; every later INSERT inherits the declared
    * partitioning and skipping-index columns. Exactly one identity
    * PARTITIONED BY column is required — the lake layout is
    * `<col>=<value>/<file>`, and a declared lake must know it before
    * first data. Duplicate CREATE refuses loudly. */
  override def createTable(ident: Identifier, schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: JMap[String, String]): Table = {
    val dir = dirOf(ident)
    val partitionCol = partitions.toSeq match {
      case Seq(t) if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        "graft lakes require exactly one identity PARTITIONED BY column " +
          s"(layout is <col>=<value>/<file>); got: ${other.mkString(", ")}")
    }
    def csvProp(k: String): Seq[String] =
      Option(properties.get(k)).toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
    val reserved = Set("provider", "owner", "location", "external")
    val unknownProps = {
      import scala.jdk.CollectionConverters._
      properties.keySet().asScala
        .filterNot(k => k == "statsCols" || k == "bloomCols" ||
          k == "bucketCol" || k == "bucketN" || k == "write.delete.mode" ||
          k == "enableChangeDataFeed" || k.startsWith("constraint.") ||
          reserved.contains(k.toLowerCase(java.util.Locale.ROOT)))
        .toSeq.sorted
    }
    if (unknownProps.nonEmpty) throw new UnsupportedOperationException(
      s"unknown TBLPROPERTIES: ${unknownProps.mkString(", ")} — supported: " +
        "statsCols, bloomCols (comma-separated column lists), " +
        "bucketCol + bucketN (hash-bucket layout for storage-partitioned joins), " +
        "write.delete.mode (copy-on-write | merge-on-read), " +
        "enableChangeDataFeed (true | false), " +
        "constraint.<name> (CHECK predicate, enforced on every write)")
    val bucketBy = (Option(properties.get("bucketCol")),
        Option(properties.get("bucketN")).flatMap(_.toIntOption)) match {
      case (Some(c), Some(n)) => Some((c.trim, n))
      case (None, None)       => None
      case _ => throw new UnsupportedOperationException(
        "bucketCol and bucketN must be declared together")
    }
    ManifestLake.create(dir, schema, partitionCol,
      statsCols = csvProp("statsCols"), bloomCols = csvProp("bloomCols"),
      bucketBy = bucketBy,
      deleteMode = Option(properties.get("write.delete.mode")).map(_.trim),
      cdfEnabled = Option(properties.get("enableChangeDataFeed")).map(_.trim),
      constraints = {
        import scala.jdk.CollectionConverters._
        properties.asScala.collect {
          case (k, v) if k.startsWith("constraint.") =>
            k.stripPrefix("constraint.") -> v
        }.toMap
      })
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` — the only ALTER a lake can
    * honor without reinterpreting committed bytes: the widened schema
    * commits as a metadata-only version ([[ManifestLake.addColumns]]);
    * existing files null-fill on read. Renames, drops, type changes
    * and repositioning refuse loudly (a type flip would silently
    * corrupt every older file's interpretation — same rule as
    * write-side evolution). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange.{AddColumn, DeleteColumn, RenameColumn, SetProperty, UpdateColumnType}
    val dir = dirOf(ident)
    // One ALTER TABLE statement = ONE manifest commit: every change is
    // translated up front and [[ManifestLake.alterSchema]] validates
    // and folds the whole list inside a single commit loop — a
    // refusal mid-list (e.g. the second rename collides) aborts the
    // statement with nothing committed. Semantics per change kind:
    // - SET TBLPROPERTIES: the mutable operational props only
    //   (write.delete.mode, enableChangeDataFeed, publish.*);
    //   structural props are contracts over committed data.
    // - RENAME/DROP COLUMN: metadata-only via COLUMN MAPPING (Delta's
    //   name mode), including NESTED struct-field paths (path-keyed
    //   mapping entries) — committed bytes keep their physical names,
    //   the catalog serves the logical ones.
    // - ALTER COLUMN TYPE: lossless TYPE WIDENING only, top-level and
    //   nested struct-leaf paths alike (readers upcast old pages at
    //   scan time on both parquet paths — probed).
    // - ADD COLUMNS: additive evolution; existing files null-fill.
    val alterations: Seq[ManifestLake.TableAlteration] = changes.map {
      case p: SetProperty =>
        ManifestLake.AlterSetProps(Map(p.property -> p.value.trim))
      case r: RenameColumn =>
        if (r.fieldNames.length == 1)
          ManifestLake.AlterRenameColumn(r.fieldNames.head, r.newName)
        else ManifestLake.AlterRenameNested(r.fieldNames.toSeq, r.newName)
      case d: DeleteColumn =>
        if (d.fieldNames.length == 1)
          ManifestLake.AlterDropColumn(d.fieldNames.head)
        else ManifestLake.AlterDropNested(d.fieldNames.toSeq)
      case t: UpdateColumnType =>
        if (t.fieldNames.length == 1)
          ManifestLake.AlterWidenColumn(t.fieldNames.head, t.newDataType)
        else ManifestLake.AlterWidenNested(t.fieldNames.toSeq, t.newDataType)
      case a: AddColumn =>
        require(a.position() == null,
          "FIRST/AFTER positioning is not supported — new columns append " +
            "(existing files null-fill; order is part of the committed schema)")
        require(a.isNullable,
          s"ADD COLUMNS ${a.fieldNames.mkString(".")} NOT NULL is " +
            "impossible: every pre-existing row null-fills the new column")
        val fld = StructField(a.fieldNames.last, a.dataType,
          nullable = true, // pre-existing rows HAVE no value — nullable by physics
          metadata = Option(a.comment()).map(c =>
            new MetadataBuilder().putString("comment", c).build())
            .getOrElse(Metadata.empty))
        if (a.fieldNames.length == 1) ManifestLake.AlterAddColumns(Seq(fld))
        else ManifestLake.AlterAddNested(a.fieldNames.init.toSeq, fld)
      case other => throw new UnsupportedOperationException(
        s"graft lakes support ALTER TABLE ADD COLUMNS / RENAME COLUMN / " +
          s"DROP COLUMN / ALTER COLUMN TYPE (widening) / SET TBLPROPERTIES " +
          s"(got: $other)")
    }
    ManifestLake.alterSchema(dir, alterations)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "dropping a lake deletes history — do it explicitly on the filesystem, " +
        "not through SQL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a lake's identity is its path; move the directory to rename it")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) GraftProcedures.all.keys.toArray.sorted
      .map(Identifier.of(Array.empty[String], _))
    else throw new NoSuchNamespaceException(namespace)

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty, s"unknown procedure namespace: $ident")
    GraftProcedures.all.getOrElse(ident.name,
      throw new UnsupportedOperationException(
        s"unknown procedure '${ident.name}' — available: " +
          GraftProcedures.all.keys.toSeq.sorted.mkString(", ")))
  }

  /** The function catalog exists for ONE resolution: Spark's storage-
    * partitioned-join machinery loads `bucket` from the scan
    * relation's catalog to turn the scan-reported `bucket(n, col)`
    * transform into a catalyst `TransformExpression` — no catalog
    * function, no key-grouped planning on bucketed lakes. */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty[String], "bucket"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

/** The SPJ face of the engine's bucket placement rule. The write side
  * ([[ManifestLake.bucketIdCol]]) places rows with `pmod(hash(col),
  * n)`; this function is the SAME computation in V2-function form —
  * `Murmur3HashFunction.hash` IS Spark's `hash()` — so anything Spark
  * evaluates with it (a future shuffle-one-side plan under
  * `v2.bucketing.shuffle.enabled`, a repair job) agrees with every
  * committed file's placement. `canonicalName` carries the key type:
  * two lakes report compatible bucket transforms iff their key types
  * match (a long-keyed and a string-keyed lake must never co-locate). */
private[core] object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3_32(col, seed 42), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    dt match {
      case LongType | IntegerType | StringType => new Bound(dt)
      case other => throw new UnsupportedOperationException(
        s"bucket key type ${other.simpleString} is not supported " +
          "(long, int and string keys bucket)")
    }
  }

  private final class Bound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(input.get(1, dt), dt, 42L).toInt
      ((h % n) + n) % n
    }
  }
}

/** The maintenance procedures behind `CALL graft.<name>(...)`. Each is
  * its own bound form (parameters are static); `call` resolves the
  * lake, runs the existing Scala lifecycle operator, and returns a
  * one-row [[LocalScan]] so the caller sees what happened as a normal
  * result set. */
private[core] object GraftProcedures {
  private final case class Result(out: StructType, row: InternalRow)
      extends LocalScan {
    override def readSchema(): StructType = out
    override def rows(): Array[InternalRow] = Array(row)
  }

  private final case class Rows(out: StructType, all: Array[InternalRow])
      extends LocalScan {
    override def readSchema(): StructType = out
    override def rows(): Array[InternalRow] = all
  }

  private def one(scan: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(scan).iterator()

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  private def lakeOf(r: InternalRow): (String, String) = {
    val dir = str(r, 0)
    val snap = ManifestLake.latestSnapshot(dir).getOrElse(
      throw new IllegalStateException(s"no committed manifest in $dir"))
    val pc = snap.files.headOption.map(_.takeWhile(_ != '='))
      .orElse(snap.declaredPartitionCol)
      .getOrElse(throw new IllegalStateException(
        s"lake $dir has no files — nothing to maintain"))
    (dir, pc)
  }

  private object Compact extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "Bin-pack a lake's small files toward target_records per file; " +
        "cluster_by names a column to range-cluster each partition on " +
        "(a materialized zValue column gives the q153 Z-order layout)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("target_records", LongType).build(),
      ProcedureParameter.in("cluster_by", StringType)
        .defaultValue("NULL").build(),
      ProcedureParameter.in("only_partitions", StringType)
        .defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val (dir, pc) = lakeOf(input)
      val target = input.getLong(1)
      val clusterBy = if (input.isNullAt(2)) None else Some(str(input, 2))
      // `OPTIMIZE ... WHERE`: CSV of partition directory names
      // (col=value) scoping the rewrite to just those partitions
      val only = if (input.isNullAt(3)) None
        else Some(str(input, 3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      val before = ManifestLake.latestSnapshot(dir).get.files.length
      ManifestLake.compact(s, dir, pc, target, clusterBy = clusterBy,
        onlyPartitions = only)
      val after = ManifestLake.latestSnapshot(dir).get
      one(Result(
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        InternalRow(after.version, before, after.files.length)))
    }
  }

  private object Vacuum extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "Delete files retired more than grace_millis ago and manifests " +
        "older than keep_versions — bounds time travel, reclaims space; " +
        "retain_millis additionally protects every version committed " +
        "inside the window (restore-safety)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("keep_versions", IntegerType)
        .defaultValue("2").build(),
      ProcedureParameter.in("grace_millis", LongType)
        .defaultValue(ManifestLake.DefaultVacuumGraceMillis.toString).build(),
      ProcedureParameter.in("retain_millis", LongType)
        .defaultValue("0").build(),
      ProcedureParameter.in("dry_run", BooleanType)
        .defaultValue("false").build(),
      ProcedureParameter.in("maintainer_stale_millis", LongType)
        .defaultValue("0").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = str(input, 0)
      val deleted = ManifestLake.vacuum(dir,
        keepVersions = input.getInt(1), graceMillis = input.getLong(2),
        retainMillis = input.getLong(3), dryRun = input.getBoolean(4),
        maintainerStaleMillis = input.getLong(5))
      // surface WHY retention was limited (r15 verdict ask #8): the
      // registered-maintainer floor and who holds it, so an operator
      // seeing less reclaimed than expected can act (wait for the view
      // to drain, or deregister a decommissioned maintainer) instead
      // of guessing. NULLs when no maintainer is registered.
      // The reported floor applies the SAME staleness cutoff the vacuum
      // itself used (ADVICE r16: the unfiltered registry could name a
      // floor that did not constrain this run — a stale-ignored
      // maintainer would be reported as if it pinned). Stale-ignored
      // maintainers stay visible in the string, marked.
      val staleMs = input.getLong(5)
      val staleCutoff =
        if (staleMs <= 0L) Long.MinValue
        else System.currentTimeMillis() - staleMs
      val regs = ManifestLake.maintainers(dir)
      val floor = regs.filter(_.heartbeatMillis >= staleCutoff)
        .map(_.highWater).minOption
      val who =
        if (regs.isEmpty) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(
          regs.map { m =>
            val mark = if (m.heartbeatMillis < staleCutoff) " (stale, ignored)" else ""
            s"${m.appId}@${m.viewDir}:hw=${m.highWater}$mark"
          }.mkString("; "))
      one(Result(
        StructType(Seq(
          StructField("files_deleted", LongType, nullable = false),
          StructField("maintainer_pin_floor", LongType, nullable = true),
          StructField("maintainers", StringType, nullable = true))),
        InternalRow(deleted, floor.map(Long.box).orNull, who)))
    }
  }

  private object Restore extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "Roll the lake back to a prior version's content as a NEW commit " +
        "(history intact, streaming txn high-waters kept); refuses if " +
        "vacuum already reclaimed any of that version's data files"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("NULL").build(),
      ProcedureParameter.in("timestamp", LongType).defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = str(input, 0)
      // exactly one addressing form, like the CDC window options
      // the SparkSession overload: on CDF-enabled lakes the restore
      // commit records its change as sidecars (plain metadata-only
      // restore otherwise)
      val (restoredTo, committed) = (input.isNullAt(1), input.isNullAt(2)) match {
        case (false, true) =>
          (input.getLong(1),
            ManifestLake.restore(SparkSession.active, dir, input.getLong(1)))
        case (true, false) =>
          val target = ManifestLake.snapshotAsOfTimestamp(dir, input.getLong(2))
            .getOrElse(throw new IllegalStateException(
              s"cannot restore $dir to timestamp ${input.getLong(2)}: every " +
                "retained commit is later (or undated)"))
          (target.version,
            ManifestLake.restore(SparkSession.active, dir, target.version))
        case _ => throw new IllegalArgumentException(
          "restore takes exactly one of version or timestamp (epoch millis)")
      }
      one(Result(
        StructType(Seq(StructField("restored_to", LongType, nullable = false),
          StructField("committed_version", LongType, nullable = false),
          StructField("n_files", IntegerType, nullable = false))),
        InternalRow(restoredTo, committed.version, committed.files.length)))
    }
  }

  private object Rebucket extends UnboundProcedure with BoundProcedure {
    override def name(): String = "rebucket"
    override def description(): String =
      "Rewrite files lacking a manifest bucket tag (SQL copy-on-write " +
        "leaves them) through the declared bucket layout, restoring " +
        "zero-shuffle SPJ coverage; cost ∝ untagged bytes"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = str(input, 0)
      val n = ManifestLake.rebucket(
        org.apache.spark.sql.SparkSession.active, dir)
      one(Result(
        StructType(Seq(StructField("files_rebucketed", IntegerType, nullable = false))),
        InternalRow(n)))
    }
  }

  private object DeleteVectors extends UnboundProcedure with BoundProcedure {
    override def name(): String = "delete_vectors"
    override def description(): String =
      "Merge-on-read DELETE: write position sidecars for rows matching " +
        "the SQL predicate instead of rewriting files — cost ∝ deleted " +
        "rows, purged by the next compact/rewrite of the affected files " +
        "(SQL DELETE FROM stays copy-on-write)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("predicate", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val dir = str(input, 0)
      val pred = org.apache.spark.sql.functions.expr(str(input, 1))
      val deleted = ManifestLake.deleteWhereDv(s, dir, pred)
      val after = ManifestLake.latestSnapshot(dir).get
      one(Result(
        StructType(Seq(StructField("rows_deleted", LongType, nullable = false),
          StructField("files_with_dvs", IntegerType, nullable = false))),
        InternalRow(deleted, after.dvs.size)))
    }
  }

  private object UpdateVectors extends UnboundProcedure with BoundProcedure {
    override def name(): String = "update_vectors"
    override def description(): String =
      "Merge-on-read UPDATE: DV-delete the matched rows and append " +
        "their updated images as fresh files in one commit — cost ∝ " +
        "matched rows, purged by the next compact (SQL UPDATE stays " +
        "copy-on-write). assignments: 'col = expr; col2 = expr2'"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("predicate", StringType).build(),
      ProcedureParameter.in("assignments", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val dir = str(input, 0)
      val pred = org.apache.spark.sql.functions.expr(str(input, 1))
      // "col = expr" pairs, split on ';' OUTSIDE single-quoted SQL
      // literals (so `text = concat(text, '; suffix')` stays whole);
      // only the FIRST '=' of each pair splits, so the expr side may
      // itself compare
      def splitAssignments(raw: String): Seq[String] = {
        val out = Seq.newBuilder[String]
        val sb = new StringBuilder
        var inQuote = false
        raw.foreach {
          case '\'' => inQuote = !inQuote; sb.append('\'')
          case ';' if !inQuote => out += sb.toString; sb.clear()
          case ch => sb.append(ch)
        }
        out += sb.toString
        out.result()
      }
      val sets = splitAssignments(str(input, 2)).map(_.trim).filter(_.nonEmpty)
        .map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"malformed assignment '$a' — expected 'col = expr'")
          a.take(i).trim -> org.apache.spark.sql.functions.expr(a.drop(i + 1).trim)
        }
      val updated = ManifestLake.updateWhereDv(s, dir, pred, sets)
      val after = ManifestLake.latestSnapshot(dir).get
      one(Result(
        StructType(Seq(StructField("rows_updated", LongType, nullable = false),
          StructField("files_with_dvs", IntegerType, nullable = false))),
        InternalRow(updated, after.dvs.size)))
    }
  }

  private object Clone extends UnboundProcedure with BoundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "Zero-copy CLONE: hard-link the source snapshot (latest, or " +
        "version) into a brand-new independent lake — O(files) metadata, " +
        "no data bytes move; history/txns/CDF start fresh at the clone"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType).build(),
      ProcedureParameter.in("target", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("NULL").build(),
      ProcedureParameter.in("timestamp", LongType).defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val ts = if (input.isNullAt(3)) None else Some(input.getLong(3))
      val snap = ManifestLake.clone(str(input, 0), str(input, 1), v, ts)
      one(Result(
        StructType(Seq(StructField("cloned_version", LongType, nullable = false),
          StructField("n_files", IntegerType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
        InternalRow(snap.version, snap.files.length,
          snap.files.flatMap(snap.netRows).sum)))
    }
  }

  private object AddConstraint extends UnboundProcedure with BoundProcedure {
    override def name(): String = "add_constraint"
    override def description(): String =
      "ALTER TABLE ADD CONSTRAINT name CHECK (expr): validates the " +
        "existing corpus in one scan, then enforces the predicate " +
        "row-wise on every future write path (NULL passes, FALSE " +
        "violates — SQL CHECK; spell NOT NULL as 'col IS NOT NULL')"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("name", StringType).build(),
      ProcedureParameter.in("check", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val snap = ManifestLake.addConstraint(SparkSession.active,
        str(input, 0), str(input, 1), str(input, 2))
      one(Result(
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("n_constraints", IntegerType, nullable = false))),
        InternalRow(snap.version, snap.constraints.length)))
    }
  }

  private object DropConstraint extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_constraint"
    override def description(): String =
      "ALTER TABLE DROP CONSTRAINT name — metadata-only; refuses an " +
        "unknown name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("name", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val snap = ManifestLake.dropConstraint(str(input, 0), str(input, 1))
      one(Result(
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("n_constraints", IntegerType, nullable = false))),
        InternalRow(snap.version, snap.constraints.length)))
    }
  }

  private object Analyze extends UnboundProcedure with BoundProcedure {
    override def name(): String = "analyze"
    override def description(): String =
      "ANALYZE TABLE: one measurement pass (n_rows, per-column " +
        "non-null/NDV/byte widths) persisted as analyze.* properties — " +
        "later sessions' broadcast decisions read the manifest instead " +
        "of re-scanning; with_ndv => false skips the exact-NDV Expand"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build(),
      ProcedureParameter.in("with_ndv", BooleanType)
        .defaultValue("true").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = str(input, 0)
      val stats = Cbo.analyze(SparkSession.active, dir, input.getBoolean(1))
      one(Result(
        StructType(Seq(StructField("n_rows", LongType, nullable = false),
          StructField("estimated_bytes", LongType, nullable = false),
          StructField("n_columns", IntegerType, nullable = false))),
        InternalRow(stats.nRows, stats.estimatedBytes, stats.cols.size)))
    }
  }

  private object Publish extends UnboundProcedure with BoundProcedure {
    override def name(): String = "publish"
    override def description(): String =
      "Atomically publish a cross-lake version VECTOR at the coordinator " +
        "path: versions is 'lakeDir=version,lakeDir=version,...' (the " +
        "LAST '=' of each pair splits, so paths containing '=' work); " +
        "consumers then read via publish_current for snapshot-consistent " +
        "multi-lake reads"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("coordinator", StringType).build(),
      ProcedureParameter.in("versions", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val vec = str(input, 1).split(",").map(_.trim).filter(_.nonEmpty)
        .map { pair =>
          val i = pair.lastIndexOf('=')
          require(i > 0, s"malformed pair '$pair' — expected lakeDir=version")
          pair.take(i) -> pair.drop(i + 1).trim.toLong
        }.toMap
      val seq = PublishLog.publish(str(input, 0), vec)
      one(Result(
        StructType(Seq(StructField("publish_seq", LongType, nullable = false),
          StructField("n_lakes", IntegerType, nullable = false))),
        InternalRow(seq, vec.size)))
    }
  }

  private object PublishCurrent extends UnboundProcedure with BoundProcedure {
    override def name(): String = "publish_current"
    override def description(): String =
      "The coordinator's current published vector as (publish_seq, lake, " +
        "version) rows — resolve once, then read every member lake at " +
        "that one sequence"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("coordinator", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (seq, vec) = PublishLog.current(str(input, 0)).getOrElse(
        throw new IllegalStateException(
          s"nothing published in ${str(input, 0)}"))
      one(Rows(
        StructType(Seq(StructField("publish_seq", LongType, nullable = false),
          StructField("lake", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        vec.toArray.sortBy(_._1).map { case (d, v) =>
          InternalRow(seq, UTF8String.fromString(d), v)
        }))
    }
  }

  /** `CALL graft.maintain_agg_view(src, view, dims, aggs, app_id,
    * checkpoint)` — the SQL spelling of `CREATE MATERIALIZED VIEW v AS
    * SELECT dims, count(*), sum(x) FROM src GROUP BY dims` plus one
    * maintenance drain: creates the view lake on first call (its
    * schema derived by ANALYZING the aggregate against the source's
    * logical schema — sum result types come from Spark, not guessed),
    * then runs one AvailableNow drain of
    * [[ManifestLake.maintainAggView]] — the first call backfills the
    * whole change history, every later call folds only the windows
    * committed since (exactly-once via app_id + checkpoint, which must
    * travel as a pair). `aggs` is a CSV of `out:count` /
    * `out:{sum|avg|min|max}:in` — min/max ride the group-scoped
    * rescan-on-retraction fold, avg is sum/count sugar, and sum/avg
    * render SQL NULL for an all-NULL group.
    * The view partitions by `partition_col` (default: the first dim —
    * must never be NULL; file placement renders it). */
  private object MaintainAggView extends UnboundProcedure with BoundProcedure {
    override def name(): String = "maintain_agg_view"
    override def description(): String =
      "Create-if-absent and drain an AGGREGATE materialized view: fold " +
        "the source lake's change feed into view_path exactly-once; " +
        "aggs = CSV of out:count / out:{sum|avg|min|max}:in"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("src_path", StringType).build(),
      ProcedureParameter.in("view_path", StringType).build(),
      ProcedureParameter.in("dims", StringType).build(),
      ProcedureParameter.in("aggs", StringType).build(),
      ProcedureParameter.in("app_id", StringType).build(),
      ProcedureParameter.in("checkpoint", StringType).build(),
      ProcedureParameter.in("partition_col", StringType)
        .defaultValue("NULL").build(),
      ProcedureParameter.in("timeout_sec", LongType)
        .defaultValue("600").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val src = str(input, 0); val view = str(input, 1)
      val dims = str(input, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(dims.nonEmpty, "dims must name at least one column")
      val aggs = str(input, 3).split(",").map(_.trim).filter(_.nonEmpty)
        .toSeq.map { spec =>
          spec.split(":").map(_.trim) match {
            case Array(out, "count") => ManifestLake.AggSpec(out, "count")
            case Array(out, f, in)
                if Set("sum", "avg", "min", "max").contains(f) =>
              ManifestLake.AggSpec(out, f, in)
            case _ => throw new IllegalArgumentException(
              s"bad agg spec '$spec' — want out:count or " +
                "out:{sum|avg|min|max}:in")
          }
        }
      val appId = str(input, 4); val ckpt = str(input, 5)
      val partCol = if (input.isNullAt(6)) dims.head else str(input, 6)
      require(dims.contains(partCol),
        s"partition_col '$partCol' must be one of the dims")
      if (ManifestLake.latestSnapshot(view).isEmpty) {
        // derive the view schema by ANALYZING the aggregate against an
        // empty frame of the source's LOGICAL schema — count is long,
        // sum's result type is whatever Spark's sum returns for the
        // input column (long→long, double→double, decimal widens)
        val srcSchema = ManifestLake.latestSnapshot(src)
          .flatMap(_.logicalSchema).getOrElse(throw new IllegalStateException(
            s"source lake $src has no committed schema"))
        val missing = (dims ++ aggs.collect {
          case a if a.func != "count" => a.inCol
        }).filterNot(srcSchema.fieldNames.contains)
        require(missing.isEmpty,
          s"column(s) ${missing.mkString(", ")} not in the source schema " +
            s"(${srcSchema.fieldNames.mkString(", ")})")
        import org.apache.spark.sql.functions.{avg, col, count, lit, max, min, sum}
        val empty = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), srcSchema)
        val probeAggs = aggs.map {
          case ManifestLake.AggSpec(out, "count", _) =>
            count(lit(1)).as(out)
          case ManifestLake.AggSpec(out, "avg", in) =>
            avg(col(in).cast("double")).as(out)
          case ManifestLake.AggSpec(out, "min", in) => min(col(in)).as(out)
          case ManifestLake.AggSpec(out, "max", in) => max(col(in)).as(out)
          case ManifestLake.AggSpec(out, _, in) => sum(col(in)).as(out)
        }
        val derived = empty.groupBy(dims.map(col): _*)
          .agg(probeAggs.head, probeAggs.tail: _*).schema
        ManifestLake.create(view, derived, partCol, statsCols = dims)
      }
      val q = ManifestLake.maintainAggView(s, src, view, dims, aggs,
        appId, ckpt, partCol, statsCols = dims)
      val timeoutSec = input.getLong(7)
      if (!q.awaitTermination(timeoutSec * 1000L)) {
        q.stop()
        throw new IllegalStateException(
          s"aggregate view drain did not finish within $timeoutSec s")
      }
      val snap = ManifestLake.latestSnapshot(view).get
      one(Result(
        StructType(Seq(StructField("view_version", LongType, nullable = false),
          StructField("groups", LongType, nullable = false))),
        InternalRow(snap.version,
          ManifestLake.read(s, view).count())))
    }
  }

  /** `CALL graft.maintain_join_view(fact, dim, view, fact_key, fk,
    * dim_pk, view_cols, app_id, fact_ckpt, dim_ckpt, partition_col)`
    * — the SQL spelling of `CREATE MATERIALIZED VIEW v AS SELECT
    * cols FROM fact f JOIN dim d ON f.fk = d.pk` plus one maintenance
    * drain of BOTH feeds (fact then dim, serially — two exactly-once
    * writers under `app_id-fact`/`app_id-dim`, each paired with its
    * checkpoint). `view_cols` is a CSV of `f.col` / `d.col`
    * references (aliased to the leaf name — names must not collide);
    * first call derives the view schema by ANALYZING the projection
    * against empty frames of both lakes' logical schemas and creates
    * the view, later calls fold only the windows committed since.
    * The join is plain SQL INNER equality — see
    * [[ManifestLake.joinViewTransform]]. */
  private object MaintainJoinView extends UnboundProcedure with BoundProcedure {
    override def name(): String = "maintain_join_view"
    override def description(): String =
      "Create-if-absent and drain a JOIN-shaped materialized view " +
        "(fact JOIN dim ON fact.fk = dim.pk): both change feeds fold " +
        "into view_path exactly-once; view_cols = CSV of f.col / d.col"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("fact_path", StringType).build(),
      ProcedureParameter.in("dim_path", StringType).build(),
      ProcedureParameter.in("view_path", StringType).build(),
      ProcedureParameter.in("fact_key", StringType).build(),
      ProcedureParameter.in("fk", StringType).build(),
      ProcedureParameter.in("dim_pk", StringType).build(),
      ProcedureParameter.in("view_cols", StringType).build(),
      ProcedureParameter.in("app_id", StringType).build(),
      ProcedureParameter.in("fact_checkpoint", StringType).build(),
      ProcedureParameter.in("dim_checkpoint", StringType).build(),
      ProcedureParameter.in("partition_col", StringType).build(),
      ProcedureParameter.in("timeout_sec", LongType)
        .defaultValue("600").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val fact = str(input, 0); val dim = str(input, 1)
      val view = str(input, 2)
      val factKey = str(input, 3).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(factKey.nonEmpty, "fact_key must name at least one column")
      val fk = str(input, 4); val pk = str(input, 5)
      val refs = str(input, 6).split(",").map(_.trim).filter(_.nonEmpty)
        .toSeq.map { c =>
          c.split("\\.", 2) match {
            case Array(side, name) if side == "f" || side == "d" =>
              (side, name)
            case _ => throw new IllegalArgumentException(
              s"bad view column '$c' — want f.col or d.col")
          }
        }
      require(refs.map(_._2).distinct.size == refs.size,
        "view column names collide — a column may appear once " +
          "(leaf names are the view names)")
      require(factKey.forall(k => refs.contains(("f", k))),
        s"view_cols must carry the fact key (${factKey.mkString(",")})")
      val appId = str(input, 7)
      val fckpt = str(input, 8); val dckpt = str(input, 9)
      val partCol = str(input, 10)
      require(refs.exists(_._2 == partCol),
        s"partition_col '$partCol' must be one of the view columns")
      import org.apache.spark.sql.functions.col
      val project: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        j => j.select(refs.map { case (sd, n) => col(s"$sd.$n").as(n) }: _*)
      val transform = ManifestLake.joinViewTransform(s, dim, fk, pk, project)
      if (ManifestLake.latestSnapshot(view).isEmpty) {
        def logical(dir: String): StructType =
          ManifestLake.latestSnapshot(dir).flatMap(_.logicalSchema)
            .getOrElse(throw new IllegalStateException(
              s"lake $dir has no committed schema"))
        def empty(sc: StructType) = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), sc)
        val derived = project(empty(logical(fact)).alias("f")
          .join(empty(logical(dim)).alias("d"),
            col(s"f.$fk") === col(s"d.$pk"), "inner")).schema
        ManifestLake.create(view, derived, partCol, statsCols = factKey)
      }
      val timeoutSec = input.getLong(11)
      def await(q: org.apache.spark.sql.streaming.StreamingQuery,
                tag: String): Unit =
        if (!q.awaitTermination(timeoutSec * 1000L)) {
          q.stop()
          throw new IllegalStateException(
            s"join view $tag drain did not finish within $timeoutSec s")
        }
      await(ManifestLake.maintainView(s, fact, view, factKey, transform,
        s"$appId-fact", fckpt, partCol, statsCols = factKey), "fact")
      await(ManifestLake.maintainJoinViewDim(s, dim, view, fact, factKey,
        fk, pk, transform, s"$appId-dim", dckpt, partCol,
        statsCols = factKey), "dim")
      val snap = ManifestLake.latestSnapshot(view).get
      one(Result(
        StructType(Seq(StructField("view_version", LongType, nullable = false),
          StructField("rows", LongType, nullable = false))),
        InternalRow(snap.version, ManifestLake.read(s, view).count())))
    }
  }

  val all: Map[String, UnboundProcedure] =
    Map("compact" -> Compact, "vacuum" -> Vacuum, "restore" -> Restore,
      "rebucket" -> Rebucket, "delete_vectors" -> DeleteVectors,
      "update_vectors" -> UpdateVectors, "clone" -> Clone,
      "add_constraint" -> AddConstraint, "drop_constraint" -> DropConstraint,
      "analyze" -> Analyze, "publish" -> Publish,
      "publish_current" -> PublishCurrent,
      "maintain_agg_view" -> MaintainAggView,
      "maintain_join_view" -> MaintainJoinView)
}
