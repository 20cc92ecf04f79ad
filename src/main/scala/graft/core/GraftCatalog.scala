package graft.core

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
  * }}}
  *
  * The catalog only RESOLVES (identifier → [[GraftLakeTable]], reusing
  * the `spark.read.format("graft")` planning path — one code path for
  * both SQL surfaces); reads, writes, pruning and deletes live on the
  * table. Nothing is enumerable (`listTables` is empty — paths aren't
  * a namespace), and the lifecycle operators that rewrite history
  * (compact/vacuum/overwrite) deliberately stay OFF the SQL surface:
  * `dropTable`/`renameTable`/`alterTable` refuse rather than guess at
  * destructive semantics. Lake creation is the DataFrame writer's job
  * (`df.write.format("graft").option("partitionCol", ...)`) — a lake
  * needs first data to establish layout, which CREATE TABLE cannot
  * provide.
  *
  * Scale: resolution reads ONE manifest file (the latest, or the named
  * version); no directory listing, no file opens — identical cost to
  * the Scala `latestSnapshot` route regardless of lake size.
  */
final class GraftCatalog extends TableCatalog {
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
    val dir = dirOf(ident)
    if (ManifestLake.latestSnapshot(dir).isEmpty)
      throw new NoSuchTableException(Seq(dir))
    GraftLake.resolve(new CaseInsensitiveStringMap(
      java.util.Map.of("path", dir)))
  }

  /** `VERSION AS OF <v>` — time travel straight off the manifest log. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are manifest numbers, got '$version'")
    }
    if (ManifestLake.snapshotAt(dir, v).isEmpty)
      throw new NoSuchTableException(Seq(s"$dir@v$v"))
    GraftLake.resolve(new CaseInsensitiveStringMap(
      java.util.Map.of("path", dir, "versionAsOf", version)))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft time travel is by manifest VERSION AS OF — commit wall-times " +
        "are not part of the manifest contract")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ManifestLake.latestSnapshot(ident.name).isDefined

  override def createTable(ident: Identifier, schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "create lakes through the DataFrame writer: df.write.format(\"graft\")" +
        ".option(\"partitionCol\", ...).save(path) — the first commit " +
        "establishes schema AND layout from real data")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft schema evolution happens on write (appends may add columns); " +
        "there is no standalone ALTER")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "dropping a lake deletes history — do it explicitly on the filesystem, " +
        "not through SQL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a lake's identity is its path; move the directory to rename it")
}
