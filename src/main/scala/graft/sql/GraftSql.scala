package graft.sql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{IcebergMeta, LakehouseTable}

/** SQL DDL/DML face of the lakehouse storage layer — the declarative idiom
  * the reference uses for its one data dependency (`app/app.yaml:7-10`
  * declares the storage-backed index as configuration, not code). A user
  * writes Delta-style SQL strings; they lower onto
  * [[graft.sources.LakehouseTable]]'s versioned commits:
  *
  * {{{
  *   CREATE TABLE t USING graft [PARTITIONED BY (c,...)] LOCATION 'p' AS SELECT ...
  *   INSERT INTO t SELECT ...
  *   INSERT OVERWRITE t SELECT ...   -- snapshot replace, one commit
  *   MERGE INTO t [AS a] USING (SELECT ...) [AS b] ON a.k = b.k
  *     [WHEN MATCHED AND cond THEN DELETE]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *   UPDATE t SET col = expr [, ...] WHERE cond
  *   DELETE FROM t WHERE cond    -- COW; MOR when deletion vectors enabled
  *   ALTER TABLE t ENABLE DELETION VECTORS | DISABLE DELETION VECTORS
  *   REORG TABLE t APPLY (PURGE)   -- materialize + clear deletion vectors
  *   CREATE TABLE t2 SHALLOW CLONE t [LOCATION 'p']   -- zero-copy clone
  *   CONVERT TO GRAFT 'srcPath' AS t [LOCATION 'p']   -- import a Delta table
  *   RESTORE TABLE t TO VERSION AS OF n
  *   ALTER TABLE t ADD COLUMNS (c1 TYPE, ...)   -- metadata-only widening
  *   ALTER TABLE t ALTER COLUMN c TYPE t2       -- metadata-only type widening
  *   ALTER TABLE t RENAME COLUMN old TO new     -- metadata-only (column mapping)
  *   ALTER TABLE t DROP COLUMN c | DROP COLUMNS (c1, ...)
  *   ALTER TABLE t ADD CONSTRAINT name CHECK (expr)   -- validated + enforced
  *   ALTER TABLE t DROP CONSTRAINT name
  *   ALTER TABLE t SET GENERATED part AS DATE(src) | DIV(src, n)
  *   ALTER TABLE t ENABLE CHANGE DATA FEED KEYS k1, k2   -- cdc actions in the export
  *   DESCRIBE COLUMNS t    -- logical schema + physical (file) names
  *   SHOW GRAFT TABLES     -- the persistent catalog's listing
  *   ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS | FOR COLUMNS c1, c2]
  *   OPTIMIZE t [WHERE partition-pred] [ZORDER BY (c1, c2, ...)]
  *   VACUUM t [RETAIN n VERSIONS | RETAIN n HOURS]
  *   DESCRIBE HISTORY t
  *   DESCRIBE DETAIL t     -- location/version/files/partitioning/keys
  *   DROP TABLE t          -- unregisters; data files stay (external)
  *   SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...
  *   SELECT ... FROM TABLE_CHANGES(t, from, to) ...   -- needs rowKeys
  *   SELECT ... FROM delta_export('/path'[, n | 'ts']) ...     -- foreign Delta log, in place
  *   SELECT ... FROM iceberg_export('/path'[, snap | 'ts']) ...-- foreign Iceberg chain
  *   SELECT ... FROM delta_export_where('/path', 'pred') ...   -- + log-stats file skipping
  *   SELECT ... FROM iceberg_export_where('/path', 'pred') ... -- + manifest pruning/skipping
  *   SELECT ... FROM table_changes('/path', from, to) ...      -- foreign Delta CDF
  *   SELECT ... FROM iceberg_changelog('/path', from, to, 'k1,k2') ...
  *   INSERT INTO delta_export('/path') SELECT ...   -- foreign append, in place
  *   INSERT INTO iceberg_export('/path') SELECT ...
  *   DELETE FROM delta_export('/path') WHERE ...    -- foreign COW delete
  *   DELETE FROM iceberg_export('/path') WHERE ...  -- foreign MOR delete
  *   UPDATE delta_export('/path') SET c = e, ... WHERE ...   -- foreign COW update
  *   UPDATE iceberg_export('/path') SET c = e, ... WHERE ... -- foreign MOR update
  *   MERGE INTO delta_export('/path') AS t USING (src) AS s ON t.k = s.k
  *     [WHEN MATCHED AND cond THEN DELETE]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *                                                  -- foreign upsert, either face
  *   ALTER TABLE delta_export('/p') ADD COLUMNS (c T, ...) -- foreign schema evolution
  *   CHECKPOINT delta_export('/p')                  -- foreign spec checkpoint
  *   VACUUM delta_export('/p') [RETAIN n HOURS]     -- foreign file reclamation
  *   VACUUM iceberg_export('/p') [RETAIN n VERSIONS]-- foreign snapshot expiry
  *   REMOVE ORPHAN FILES iceberg_export('/p') OLDER THAN n HOURS
  *                                                  -- lost-commit debris sweep
  *   OPTIMIZE delta_export('/p')                    -- foreign bin-packing
  *   OPTIMIZE iceberg_export('/p')                  -- foreign MOR compaction
  *   RESTORE TABLE delta_export('/p') TO VERSION AS OF n  -- Delta RESTORE
  *   RESTORE TABLE iceberg_export('/p') TO SNAPSHOT id    -- Iceberg rollback
  * }}}
  *
  * Two equivalent entry points run the SAME command objects:
  *  - a parser extension ([[GraftSqlParser]], injected by
  *    [[graft.GraftExtensions]]) intercepts these statements in
  *    `spark.sql(...)` for sessions built with
  *    `spark.sql.extensions=graft.GraftExtensions`;
  *  - [[GraftSql.sql]] for an already-built session without the extension.
  *
  * Statement recognition is regex-based over the statement HEAD (the
  * embedded SELECT bodies are handed to Spark's full parser verbatim), and
  * deliberately fails closed: `INSERT INTO`/`DELETE FROM`/`MERGE INTO` are
  * intercepted only for table names registered in [[GraftCatalog]] — every
  * other statement flows to the delegate parser untouched.
  */
object GraftSql {

  /** Execute one statement. DDL/DML statements return an empty frame;
    * SELECTs return their result. Works on any session (no extension
    * needed) — the injected-parser path runs the identical commands. */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    GraftCatalog.bootstrap(spark)
    GraftSqlStatements.command(sqlText) match {
      case Some(cmd) =>
        val rows = cmd.run(spark)
        if (cmd.output.isEmpty) spark.emptyDataFrame
        else spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
          StructType(cmd.output.map(a =>
            org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))
      case None => spark.sql(GraftSqlStatements.rewriteTimeTravel(spark, sqlText))
    }
  }

  /** Register an EXISTING lakehouse table under a SQL name (the
    * `CREATE TABLE ... USING graft LOCATION` analog for tables created
    * through the Scala API) and expose/refresh its temp view. `rowKeys`
    * (row identity across rewrites, as in merge) enable the
    * `TABLE_CHANGES(name, from, to)` read syntax. */
  def register(spark: SparkSession, name: String, root: String,
      partitionBy: Seq[String] = Nil, rowKeys: Seq[String] = Nil): Unit =
    GraftCatalog.register(spark, name, root, partitionBy, rowKeys)
}

/** name → (root, partitionBy) registry backing the SQL face — a PERSISTENT
  * metastore stand-in: every registration is also written as one small JSON
  * file under [[GraftCatalog.dir]] (atomic temp+rename, mirroring the
  * manifest commit discipline), and a fresh session lazily loads that
  * directory, so `CREATE TABLE ... USING graft` survives a session restart
  * the same way the reference's one data dependency survives as durable
  * configuration (`app/app.yaml:7-10`). The temp view published under the
  * table's name is per-session — [[bootstrap]] (called from both SQL entry
  * points) publishes every cataloged table into a session on first use, and
  * DML refreshes it so plain `SELECT ... FROM name` always reads the latest
  * version. In-memory entries win over disk on load (the running process is
  * the freshest writer); `DROP TABLE` removes both. */
object GraftCatalog {
  final case class Entry(root: String, partitionBy: Seq[String],
      rowKeys: Seq[String] = Nil,
      constraints: Seq[(String, String)] = Nil,
      morDeletes: Boolean = false)
  private val tables = TrieMap.empty[String, Entry]
  @volatile private var loaded = false
  // sessions whose temp views were already published (weak: a dropped
  // session must not be pinned by the catalog)
  private val published = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  /** Catalog directory — a plain directory of `<name>.json` descriptor
    * files (not parquet: a catalog read must not need an engine). Defaults
    * under the table-cache root; point GRAFT_CATALOG_DIR at a shared
    * volume to make one catalog serve many drivers. */
  def dir: java.nio.file.Path = java.nio.file.Paths.get(
    sys.env.getOrElse("GRAFT_CATALOG_DIR",
      graft.sources.TableCache.baseDir + "/_catalog"))

  private def key(name: String): String = name.toLowerCase

  // descriptors are REAL JSON both ways (Spark's bundled Jackson): the
  // writer escapes anything a name/root/expr can carry, the reader is a
  // JSON parse — no regex that a ']' in a constraint name or a quote in a
  // path could fracture. The on-disk shape is unchanged, so descriptors
  // written by earlier versions load as-is.
  private lazy val json = new com.fasterxml.jackson.databind.ObjectMapper()

  private def descriptor(e: Entry, name: String): String = {
    val node = json.createObjectNode()
    node.put("name", name)
    node.put("root", e.root)
    val pb = node.putArray("partitionBy"); e.partitionBy.foreach(pb.add)
    val rk = node.putArray("rowKeys"); e.rowKeys.foreach(rk.add)
    // constraint exprs are arbitrary SQL — base64 keeps the stored form
    // identical to the historical descriptors (and the ':'-split decode)
    val cs = node.putArray("constraints")
    e.constraints.foreach { case (n, ex) =>
      cs.add(n + ":" + java.util.Base64.getEncoder.encodeToString(
        ex.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    if (e.morDeletes) node.put("morDeletes", true)
    json.writeValueAsString(node)
  }

  private[sql] def decodeConstraint(s: String): (String, String) = {
    val Array(n, b64) = s.split(":", 2)
    n -> new String(java.util.Base64.getDecoder.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private def parseDescriptor(txt: String): Option[Entry] = {
    import scala.jdk.CollectionConverters._
    def strs(n: com.fasterxml.jackson.databind.JsonNode, f: String): Seq[String] =
      Option(n.get(f)).toSeq.flatMap(_.elements().asScala.map(_.asText()).toSeq)
    val node =
      try json.readTree(txt)
      catch { case _: com.fasterxml.jackson.core.JacksonException => return None }
    Option(node.get("root")).map(_.asText()).map { r =>
      Entry(r, strs(node, "partitionBy"), strs(node, "rowKeys"),
        strs(node, "constraints").map(decodeConstraint),
        Option(node.get("morDeletes")).exists(_.asBoolean()))
    }
  }

  private def ensureLoaded(): Unit = if (!loaded) synchronized {
    if (!loaded) {
      if (java.nio.file.Files.isDirectory(dir)) {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().forEachRemaining { p =>
          val fn = p.getFileName.toString
          if (fn.endsWith(".json") && !fn.startsWith(".")) {
            // putIfAbsent: an entry registered by THIS process is newer
            // than whatever the disk copy says; an unparseable descriptor
            // (truncated write from a killed process) is skipped, not a
            // catalog-wide failure
            parseDescriptor(java.nio.file.Files.readString(p)).foreach(e =>
              tables.putIfAbsent(fn.stripSuffix(".json"), e))
          }
        } finally s.close()
      }
      loaded = true
    }
  }

  private def persist(name: String, e: Entry): Unit = {
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(s".${key(name)}.json.tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.writeString(tmp, descriptor(e, key(name)))
    java.nio.file.Files.move(tmp, dir.resolve(s"${key(name)}.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Publish every cataloged table as a temp view in `spark` (idempotent,
    * memoized per session). Both SQL entry points call this first, so a
    * brand-new session resolves `SELECT ... FROM name` with no
    * re-registration — the restart-survival property a catalog exists for. */
  def bootstrap(spark: SparkSession): Unit = {
    ensureLoaded()
    if (!published.contains(spark)) {
      published.add(spark)
      // fill only UNBOUND names: a view the session already registered
      // (possibly over different data) must never be silently replaced by
      // a catalog entry — the catalog seeds a fresh session, it does not
      // override a live one
      tables.keys.foreach { n =>
        if (!spark.catalog.tableExists(n)) refreshView(spark, n)
      }
    }
  }

  def register(spark: SparkSession, name: String, root: String,
      partitionBy: Seq[String], rowKeys: Seq[String] = Nil): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"graft SQL table names must be simple identifiers (temp-view rules): $name")
    require(!root.contains('"'),
      s"table location may not contain '\"' (embedded in the descriptor): $root")
    ensureLoaded()
    // re-registering the SAME table keeps its constraints (register is the
    // re-attach path, not a schema statement); a different root is a new
    // table and starts clean
    val prev = tables.get(key(name)).filter(_.root == root)
    val e = Entry(root, partitionBy, rowKeys,
      prev.map(_.constraints).getOrElse(Nil),
      prev.exists(_.morDeletes))
    tables(key(name)) = e
    persist(name, e)
    refreshView(spark, name)
  }

  /** Replace a cataloged table's CHECK constraints (ALTER TABLE ADD/DROP
    * CONSTRAINT) and persist the descriptor. */
  def setConstraints(name: String, cons: Seq[(String, String)]): Unit = {
    // ':' is the one reserved character left in the stored form (it
    // separates name from the base64 expr); every other character —
    // including ']' and '"' — now survives the JSON round trip
    cons.foreach { case (n, _) => require(!n.contains(":"),
      s"constraint name may not contain ':': $n") }
    ensureLoaded()
    val e = tables(key(name)).copy(constraints = cons)
    tables(key(name)) = e
    persist(name, e)
  }

  /** Toggle merge-on-read deletes for a cataloged table (ALTER TABLE
    * ENABLE/DISABLE DELETION VECTORS) and persist the descriptor — the
    * Delta enableDeletionVectors table property expressed over the graft
    * catalog: with it set, DELETE FROM writes a position sidecar instead
    * of rewriting files ([[graft.sources.LakehouseTable.deleteWhereMor]]). */
  def setMorDeletes(name: String, on: Boolean): Unit = {
    ensureLoaded()
    val e = tables(key(name)).copy(morDeletes = on)
    tables(key(name)) = e
    persist(name, e)
  }

  def lookup(name: String): Option[Entry] = { ensureLoaded(); tables.get(key(name)) }

  def drop(name: String): Unit = {
    ensureLoaded()
    tables.remove(key(name))
    java.nio.file.Files.deleteIfExists(dir.resolve(s"${key(name)}.json"))
  }

  /** All cataloged tables, name-sorted (SHOW GRAFT TABLES). */
  def list(): Seq[(String, Entry)] = { ensureLoaded(); tables.toSeq.sortBy(_._1) }

  /** (Re)publish `name` as a temp view of the table's CURRENT version. */
  def refreshView(spark: SparkSession, name: String): Unit =
    tables.get(key(name)).foreach { e =>
      if (LakehouseTable.versions(e.root).nonEmpty)
        LakehouseTable.read(spark, e.root).createOrReplaceTempView(name)
    }

  /** Test hook: forget all in-memory state (entries, load flag, published
    * sessions) so the next lookup must come from the on-disk catalog —
    * simulating a fresh driver process inside one JVM. */
  private[graft] def resetInMemoryForTest(): Unit = synchronized {
    tables.clear(); published.clear(); loaded = false
  }
}

// ---- command plans (LeafRunnableCommand: Spark executes run() on the
// driver via its normal command-execution path) -----------------------------

/** CREATE TABLE name USING graft ... AS query — or, with no AS clause,
  * register an EXISTING table at LOCATION (Delta's external-table form). */
case class CreateGraftTableCommand(name: String, root: String,
    partitionBy: Seq[String], query: Option[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val effectivePartitionBy = query match {
      case Some(q) =>
        LakehouseTable.create(spark.sql(q), root, partitionBy)
        partitionBy
      case None =>
        require(LakehouseTable.versions(root).nonEmpty,
          s"CREATE TABLE $name USING graft LOCATION: no table at $root " +
            "(add AS SELECT ... to create one)")
        // recover the existing table's hive layout so later DML through
        // this name keeps writing the same directory structure
        if (partitionBy.nonEmpty) partitionBy
        else LakehouseTable.partitionColumns(root)
    }
    GraftCatalog.register(spark, name, root, effectivePartitionBy)
    Seq.empty
  }
}

/** INSERT INTO name query — append-only, by-name column resolution when the
  * query's column names match the table's (else positional), and every
  * column CAST to the table's type (SQL INSERT semantics — otherwise a
  * `VALUES (100, 1.5)` literal appends int/decimal files into a
  * bigint/double table and the union-schema read fails). */
case class InsertGraftTableCommand(name: String, query: String,
    overwrite: Boolean = false) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val df = spark.sql(query)
    val target = LakehouseTable.read(spark, e.root)
    val identity = LakehouseTable.currentVersion(e.root)
      .flatMap(v => LakehouseTable.identityAt(e.root, v))
    // a GENERATED-ALWAYS identity table aligns against the NON-identity
    // columns and routes through appendWithIdentity (the id is never
    // caller-supplied — exactly the API contract, surfaced in SQL)
    identity match {
      case Some((idCol, _, _)) if !overwrite =>
        require(e.constraints.isEmpty,
          s"INSERT INTO $name: identity + CHECK constraints are not " +
            "supported in one SQL table (use the API expectations path)")
        val cols = target.columns.filterNot(_.equalsIgnoreCase(idCol)).toSeq
        val reordered =
          if (df.columns.sorted.sameElements(cols.sorted))
            df.select(cols.map(df(_)): _*)
          else df.toDF(cols: _*)
        val aligned = reordered.select(cols.map(c =>
          reordered(c).cast(target.schema(c).dataType).as(c)): _*)
        LakehouseTable.appendWithIdentity(spark, aligned, e.root)
        GraftCatalog.refreshView(spark, name)
        return Seq.empty
      case Some((idCol, _, _)) =>
        throw new IllegalArgumentException(
          s"INSERT OVERWRITE $name: unsupported on identity table " +
            s"(ids in '$idCol' are append-allocated; RESTORE or DELETE instead)")
      case None => ()
    }
    val reordered =
      if (df.columns.sorted.sameElements(target.columns.sorted))
        df.select(target.columns.map(df(_)).toSeq: _*)
      else df.toDF(target.columns.toSeq: _*)
    val aligned = reordered.select(target.schema.map(f =>
      reordered(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    if (overwrite) {
      // snapshot replace has no quarantine semantics: enforce CHECK
      // constraints by refusing the whole statement (Delta's behavior).
      // Validate and write from ONE evaluation of the source: a
      // nondeterministic query (sample / limit without order) could pass a
      // separate count() yet write different, violating rows — so pin the
      // rows first, then check, then overwrite from the pinned copy.
      // (eager localCheckpoint: one materialization; block cleanup rides
      // the ContextCleaner, appropriate for a statement-scoped pin)
      val pinned =
        if (e.constraints.isEmpty) aligned
        else aligned.localCheckpoint(true)
      e.constraints.foreach { case (n, ex) =>
        val bad = pinned.filter(not(coalesce(expr(ex), lit(true)))).count()
        require(bad == 0,
          s"INSERT OVERWRITE $name: $bad rows violate constraint $n ($ex)")
      }
      LakehouseTable.overwrite(pinned, e.root, e.partitionBy)
    } else if (e.constraints.nonEmpty)
      // CHECK constraints on append go through the expectations path:
      // passing rows commit, violating rows land in <root>/_rejects with
      // the violated constraint names (DLT-style quarantine, exact counts)
      LakehouseTable.appendWithExpectations(aligned, e.root,
        e.constraints.map { case (n, ex) => n -> expr(ex) }.toMap,
        e.partitionBy)
    else LakehouseTable.append(aligned, e.root, e.partitionBy)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** ALTER TABLE name ADD IDENTITY id ORDER BY keys — enable deterministic
  * GENERATED-ALWAYS identity; subsequent INSERT INTO statements allocate
  * ids through [[graft.sources.LakehouseTable.appendWithIdentity]]. */
case class AlterIdentityGraftCommand(name: String, idCol: String,
    orderKeys: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.enableIdentity(e.root, idCol, orderKeys)
    Seq.empty
  }
}

/** ALTER TABLE name ENABLE CHANGE DATA FEED KEYS k1, k2 — from the next
  * exported commit on, the Delta mirror records row-level changes as
  * spec cdc actions (see [[graft.sources.LakehouseTable
  * .enableChangeDataFeed]]); the keys are the row identity the manifest
  * diff classifies changes by. */
case class AlterCdfGraftCommand(name: String,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.enableChangeDataFeed(spark, e.root, keys)
    Seq.empty
  }
}

/** ALTER TABLE name SET GENERATED part AS DATE(src) | DIV(src, N) —
  * declare a partition column generated from a source column (verified
  * against existing rows), enabling optimizer-derived partition pruning
  * for queries that filter on the source only. */
case class AlterGeneratedGraftCommand(name: String, partCol: String,
    kind: String, srcCol: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.alterSetGeneratedPartition(spark, e.root, partCol, kind, srcCol)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** MERGE INTO name USING (source) ON keys — UPDATE SET * / INSERT *, with
  * an optional `WHEN MATCHED AND cond THEN DELETE` clause: source rows
  * matching `deleteCond` REMOVE their target rows, the rest upsert — in
  * one atomic file-pruned [[LakehouseTable.mergeApply]] commit (the full
  * CDC-apply statement). `deleteCond` is evaluated against the SOURCE
  * row (qualify with the source alias or bare column names). */
case class MergeGraftTableCommand(name: String, sourceQuery: String,
    keys: Seq[String], deleteCond: Option[String] = None)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val src = spark.sql(sourceQuery)
    deleteCond match {
      case None =>
        LakehouseTable.merge(spark, e.root, src, keys, e.partitionBy)
      case Some(cond) =>
        // a NULL clause condition is FALSE per MERGE semantics: the row
        // falls through to the UPDATE clause (filter(!d) would drop it
        // from BOTH frames — silently neither updated nor deleted).
        // And the clause only gates MATCHED rows: a cond-true row whose
        // key is absent from the target inserts via WHEN NOT MATCHED
        // (the split below consults the target's keys — a key-columns
        // scan, the classification cost every MERGE implementation pays)
        val del = org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.expr(cond),
          org.apache.spark.sql.functions.lit(false))
        // PERSIST the source for the classification: the split reads
        // it three ways (update / matched-delete / unmatched-insert),
        // and a non-deterministic source (uuid(), rand()) re-evaluated
        // per frame could classify one logical row differently
        val srcP = src.persist()
        try {
          val tgt = LakehouseTable.read(spark, e.root)
          val tgtKeys = tgt.select(keys.map(tgt(_)): _*).distinct()
          val condTrue = srcP.filter(del)
          LakehouseTable.mergeApply(spark, e.root,
            updates = srcP.filter(!del).unionByName(
              condTrue.join(tgtKeys, keys, "left_anti")),
            deleteKeys = condTrue.join(tgtKeys, keys, "left_semi"),
            keys = keys, partitionBy = e.partitionBy)
        } finally { srcP.unpersist(); () }
    }
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** UPDATE name SET col = expr, ... WHERE cond — file-pruned copy-on-write,
  * every SET expression evaluated against the pre-update row. */
case class UpdateGraftTableCommand(name: String, set: Seq[(String, String)],
    where: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.updateWhere(spark, e.root, set, where, e.partitionBy)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** DELETE FROM name WHERE cond — copy-on-write by default; a table with
  * deletion vectors enabled (ALTER TABLE ... ENABLE DELETION VECTORS)
  * writes a merge-on-read position sidecar instead, Delta's
  * enableDeletionVectors behavior. */
case class DeleteGraftTableCommand(name: String, where: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    if (e.morDeletes) LakehouseTable.deleteWhereMor(spark, e.root, where)
    else LakehouseTable.deleteWhere(spark, e.root, where, e.partitionBy)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** ALTER TABLE name ENABLE|DISABLE DELETION VECTORS — catalog-level
  * switch for merge-on-read DELETE (a property toggle, no table write). */
case class AlterGraftTableDvCommand(name: String, on: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftCatalog.setMorDeletes(name, on)
    Seq.empty
  }
}

/** REORG TABLE name APPLY (PURGE) — Delta's DV-purge statement: rewrite
  * exactly the files with deletion vectors, applying and clearing them
  * ([[LakehouseTable.materializeDvs]]); re-enables the Delta mirror.
  * Returns the table version afterwards (unchanged when no DVs). */
/** Foreign-path DML: the write twins of the `delta_export` /
  * `iceberg_export` table-valued READS — append / delete / update a
  * foreign open-format table IN PLACE by quoted path, no registration,
  * no CONVERT TO GRAFT copy. Each dispatches to the engine's foreign
  * writer for that face (createLink-CAS'd commits, the full refusal
  * batteries). */
case class ForeignInsertCommand(face: String, root: String, query: String,
    branch: Option[String] = None)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val df = spark.sql(query)
    if (face == "delta_export")
      LakehouseTable.appendDeltaForeign(spark, root, df)
    else graft.sources.IcebergMeta.appendIcebergForeign(spark, root, df,
      branch)
    Seq.empty
  }
}

/** ALTER TABLE iceberg_export('/path') FAST FORWARD main TO branch —
  * the PUBLISH half of write-audit-publish: main advances to the
  * staged branch head in one metadata-only commit (refused when main
  * moved since the fork — see IcebergMeta.fastForwardForeign). */
case class ForeignFastForwardCommand(root: String, branch: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.IcebergMeta.fastForwardForeign(root, branch)
    Seq.empty
  }
}

case class ForeignDeleteCommand(face: String, root: String, where: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (face == "delta_export")
      LakehouseTable.deleteDeltaForeign(spark, root, where)
    else graft.sources.IcebergMeta.deleteIcebergForeign(spark, root, where)
    Seq.empty
  }
}

case class ForeignUpdateCommand(face: String, root: String,
    set: Seq[(String, String)], where: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // refuse duplicate assignments HERE: toMap would silently keep the
    // last one, and the writers' own duplicate check (sized against
    // the lowercased map) could never fire for exact-case duplicates
    require(set.map(_._1.toLowerCase).distinct.size == set.size,
      s"duplicate SET column in ${set.map(_._1).mkString(", ")}")
    if (face == "delta_export")
      LakehouseTable.updateDeltaForeign(spark, root, where, set.toMap)
    else graft.sources.IcebergMeta.updateIcebergForeign(
      spark, root, where, set.toMap)
    Seq.empty
  }
}

/** MERGE INTO delta_export/iceberg_export('/path') AS t USING (source)
  * ON t.k = s.k — the foreign-path twin of [[MergeGraftTableCommand]]:
  * UPDATE SET * / INSERT *, with the optional
  * `WHEN MATCHED AND cond THEN DELETE` clause evaluated against the
  * SOURCE row, dispatched to the face's foreign MERGE writer
  * (createLink-CAS'd single-version commit, the full refusal
  * battery). */
case class ForeignMergeCommand(face: String, root: String,
    sourceQuery: String, keys: Seq[String], deleteCond: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = spark.sql(sourceQuery)
    var persisted: Option[org.apache.spark.sql.DataFrame] = None
    val (upd, del) = deleteCond match {
      case None => (src, None)
      case Some(c) =>
        // NULL clause condition = FALSE (the row upserts, not vanishes).
        // MERGE semantics gate the clause on MATCHED: a cond-true row
        // whose key is NOT in the target falls through to WHEN NOT
        // MATCHED THEN INSERT (Delta's own behavior), so the split
        // consults the target's keys — a key-columns-only scan, the
        // same matched-classification cost Delta's merge job pays
        val d = org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.expr(c),
          org.apache.spark.sql.functions.lit(false))
        val tgt =
          if (face == "delta_export")
            LakehouseTable.readDeltaExport(spark, root)
          else graft.sources.IcebergMeta.readIceberg(spark, root)
        val tgtKeys = tgt.select(keys.map(tgt(_)): _*).distinct()
        // persisted: the split reads the source three ways, and a
        // non-deterministic source re-evaluated per frame could
        // classify one logical row differently (the native twin's rule)
        val srcP = src.persist()
        persisted = Some(srcP)
        val condTrue = srcP.filter(d)
        (srcP.filter(!d).unionByName(
           condTrue.join(tgtKeys, keys, "left_anti")),
         Some(condTrue.join(tgtKeys, keys, "left_semi")))
    }
    try {
      if (face == "delta_export")
        LakehouseTable.mergeDeltaForeign(spark, root, upd, keys, del)
      else graft.sources.IcebergMeta.mergeIcebergForeign(
        spark, root, upd, keys, del)
    } finally persisted.foreach { p => p.unpersist(); () }
    Seq.empty
  }
}

/** ALTER TABLE delta_export/iceberg_export('/path') ADD COLUMNS (...)
  * — foreign schema evolution by quoted path: a metadata-only commit
  * (fresh metaData action / new schema object), readers null-fill the
  * new columns from old files. */
case class ForeignAlterAddColumnsCommand(face: String, root: String,
    colsDdl: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (face == "delta_export")
      LakehouseTable.addColumnsDeltaForeign(spark, root, colsDdl)
    else graft.sources.IcebergMeta.addColumnsIcebergForeign(root, colsDdl)
    Seq.empty
  }
}

/** ALTER TABLE delta_export/iceberg_export('/path') SET TBLPROPERTIES
  * ('k'='v', …) / UNSET TBLPROPERTIES ('k', …) — metadata-only
  * property commits by quoted path (each face's writer carries its
  * own obligation refusals and, on Delta, the protocol upgrade CDF
  * enablement requires). */
case class ForeignSetPropertiesCommand(face: String, root: String,
    set: Seq[(String, String)], unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // delta.* keys are canonicalized case-insensitively by the writer,
    // so case-variant duplicates there WOULD collide; user keys are
    // case-SENSITIVE in Delta (the writer preserves case-distinct user
    // keys) — compare them verbatim or ('Team.Owner','team.owner')
    // falsely refuses as a duplicate
    val dupKeyed = set.map { case (k, _) =>
      if (k.toLowerCase.startsWith("delta.")) k.toLowerCase else k }
    require(dupKeyed.distinct.size == set.size,
      s"duplicate property key in ${set.map(_._1).mkString(", ")}")
    if (face == "delta_export")
      LakehouseTable.setPropertiesDeltaForeign(spark, root, set.toMap,
        unset)
    else graft.sources.IcebergMeta.setPropertiesIcebergForeign(root,
      set.toMap, unset)
    Seq.empty
  }
}

/** ALTER TABLE iceberg_export('/path') CREATE TAG/BRANCH name AS OF
  * SNAPSHOT id / DROP TAG/BRANCH name — the snapshot-ref surface:
  * tags/branches pin snapshots against expiry and give time travel a
  * name. */
case class ForeignRefCommand(root: String, create: Boolean,
    refType: String, name: String, sid: Option[Long])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (create)
      graft.sources.IcebergMeta.createRefForeign(root, name, sid.get,
        refType)
    else graft.sources.IcebergMeta.dropRefForeign(root, name,
      expectType = Some(refType))
    Seq.empty
  }
}

/** Foreign maintenance by quoted path: CHECKPOINT delta_export (spec
  * checkpoint + pointer), VACUUM delta_export [RETAIN n HOURS]
  * (retention-gated file reclamation), VACUUM iceberg_export
  * [RETAIN n VERSIONS] (snapshot expiry), OPTIMIZE delta_export
  * (bin-packing compaction, dataChange=false), OPTIMIZE
  * iceberg_export (MOR compaction — one replace snapshot with every
  * delete applied), RESTORE TABLE delta_export ... TO VERSION AS OF n
  * (Delta RESTORE), RESTORE TABLE iceberg_export ... TO SNAPSHOT id
  * (Iceberg rollback_to_snapshot). The argument stays TEXT until each
  * op parses it — snapshot ids exceed Double's exact integer range. */
case class ForeignMaintenanceCommand(op: String, root: String,
    arg: Option[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    op match {
      case "checkpoint" =>
        LakehouseTable.checkpointDeltaForeign(spark, root)
      case "vacuum-delta" =>
        LakehouseTable.vacuumDeltaForeign(spark, root,
          arg.map(_.toDouble).getOrElse(168.0),
          explicitRetain = arg.isDefined)
      case "expire-iceberg" =>
        graft.sources.IcebergMeta.expireSnapshotsForeign(root,
          retainLast = arg.map(_.toDouble.toInt).getOrElse(1))
      case "optimize-delta" =>
        LakehouseTable.optimizeDeltaForeign(spark, root,
          zorderBy = arg.toSeq.flatMap(_.split(","))
            .map(_.trim).filter(_.nonEmpty))
      case "compact-iceberg" =>
        graft.sources.IcebergMeta.rewriteDataFilesForeign(spark, root)
      case "rewrite-manifests-iceberg" =>
        graft.sources.IcebergMeta.rewriteManifestsForeign(root)
      case "remove-orphans-iceberg" =>
        graft.sources.IcebergMeta.removeOrphanFilesForeign(spark, root,
          arg.get.toDouble)
      case "restore-delta" =>
        LakehouseTable.restoreDeltaForeign(spark, root, arg.get.toLong)
      case "rollback-iceberg" =>
        graft.sources.IcebergMeta.rollbackIcebergForeign(root,
          arg.get.toLong)
    }
    Seq.empty
  }
}

case class ReorgGraftTablePurgeCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val v = LakehouseTable.materializeDvs(spark, e.root)
    GraftCatalog.refreshView(spark, name)
    Seq(Row(v))
  }
}

/** CREATE TABLE name SHALLOW CLONE src [LOCATION 'p'] — Delta's shallow
  * clone: the new table's v0 hardlinks the source's current files (zero
  * copy, [[LakehouseTable.cloneTable]]); partitioning, row keys,
  * constraints, and the DV flag carry over, then the tables diverge
  * freely (immutability makes sharing safe; vacuum on one side cannot
  * strand the other). */
case class CloneGraftTableCommand(name: String, srcName: String, root: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftCatalog.lookup(srcName).get
    LakehouseTable.cloneTable(spark, src.root, root)
    GraftCatalog.register(spark, name, root, src.partitionBy, src.rowKeys)
    GraftCatalog.setConstraints(name, src.constraints)
    if (src.morDeletes) GraftCatalog.setMorDeletes(name, on = true)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** CONVERT TO GRAFT 'srcPath' AS name [LOCATION 'p'] — import a foreign
  * OPEN-FORMAT table as a native graft table and register it. The format
  * is detected from the source layout: a `_delta_log` dir imports via
  * [[LakehouseTable.convertFromDelta]] (hardlinked files, DV descriptors
  * to native sidecars, name-mode mappings to renames); an Iceberg
  * `metadata/version-hint.text` chain imports via
  * [[graft.sources.IcebergMeta.convertToGraft]] (current snapshot's live
  * files, hive-encoded identity partitions). Partition columns derive
  * from the imported hive layout either way — CONVERT TO DELTA/Iceberg's
  * migrate, pointed the other way. */
case class ConvertToGraftCommand(name: String, srcPath: String, root: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val srcP = java.nio.file.Paths.get(srcPath)
    if (java.nio.file.Files.isDirectory(srcP.resolve("_delta_log")))
      LakehouseTable.convertFromDelta(spark, srcPath, root)
    else if (java.nio.file.Files.exists(
        srcP.resolve("metadata").resolve("version-hint.text")))
      graft.sources.IcebergMeta.convertToGraft(spark, srcPath, root)
    else
      throw new IllegalArgumentException(
        s"CONVERT TO GRAFT: no _delta_log or Iceberg metadata at $srcPath")
    GraftCatalog.register(spark, name, root,
      LakehouseTable.partitionColumns(root))
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** RESTORE TABLE name TO VERSION AS OF n. */
case class RestoreGraftTableCommand(name: String, version: Long)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.restore(e.root, version)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** OPTIMIZE name [WHERE partition-predicate] [ZORDER BY (c1, c2, …)] —
  * without clauses: size-aware small-file compaction (Delta's OPTIMIZE
  * shape: only files under the small-size threshold are rewritten,
  * bin-packed; healthy files keep their manifest entries). With WHERE:
  * partition-scoped compaction — only matching hive partitions rewrite
  * ([[LakehouseTable.compactWhere]]; the predicate may reference
  * partition columns only). With ZORDER: rewrite the snapshot clustered
  * by the space-filling curve over the named columns (single column →
  * plain range clustering), so footer-stat file skipping prunes on every
  * listed dimension — the SQL face of the q102 layout path. Returns the
  * table version afterwards (unchanged when nothing needed compacting). */
case class OptimizeGraftTableCommand(name: String, zCols: Seq[String],
    where: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    require(where.isEmpty || zCols.isEmpty,
      "OPTIMIZE WHERE and ZORDER BY cannot be combined (compact the " +
        "partition first, then ZORDER the table)")
    val v = (where, zCols) match {
      case (Some(w), _) => LakehouseTable.compactWhere(spark, e.root, w)
      case (None, Nil) =>
        LakehouseTable.compactSmall(spark, e.root, partitionBy = e.partitionBy)
      case (None, Seq(one)) =>
        LakehouseTable.cluster(spark, e.root, Seq(one), partitionBy = e.partitionBy)
      case (None, many) =>
        LakehouseTable.zorderCluster(spark, e.root, many, partitionBy = e.partitionBy)
    }
    GraftCatalog.refreshView(spark, name)
    Seq(Row(v))
  }
}

/** DESCRIBE HISTORY name — one row per committed version: its file
  * count and the writer txn watermarks recorded in its manifest. */
case class DescribeHistoryGraftCommand(name: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("commit_ts", LongType, nullable = true)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("txns", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.versions(e.root).map { v =>
      Row(v, LakehouseTable.commitTsAt(e.root, v).map(Long.box).orNull,
        LakehouseTable.read(spark, e.root, Some(v)).inputFiles.length.toLong,
        LakehouseTable.lastTxnsAt(e.root, v).toSeq.sorted
          .map { case (a, t) => s"$a=$t" }.mkString(","))
    }
  }
}

/** DESCRIBE DETAIL name — one row: location, current version, file
  * count, partition columns, row keys (Delta's DESCRIBE DETAIL shape). */
case class DescribeDetailGraftCommand(name: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("row_keys", StringType, nullable = false)(),
      AttributeReference("constraints", StringType, nullable = false)(),
      AttributeReference("deletion_vectors", StringType, nullable = false)(),
      AttributeReference("change_data_feed", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val v = LakehouseTable.currentVersion(e.root).getOrElse(-1L)
    // manifest line count, NOT a DataFrame build: a metadata command must
    // stay O(1), not read parquet footers across the table
    val nf = if (v < 0) 0L else LakehouseTable.fileCount(e.root, v).toLong
    val dvCovered = if (v < 0) 0 else LakehouseTable.dvsAt(e.root, v).size
    val cdfKeys = if (v < 0) Seq.empty else LakehouseTable.cdfKeysAt(e.root, v)
    Seq(Row(e.root, v, nf, e.partitionBy.mkString(","), e.rowKeys.mkString(","),
      e.constraints.map { case (n, ex) => s"$n CHECK ($ex)" }.mkString("; "),
      s"${if (e.morDeletes) "enabled" else "disabled"}; $dvCovered files covered",
      if (cdfKeys.isEmpty) "disabled"
      else s"enabled; keys ${cdfKeys.mkString(",")}"))
  }
}

/** ALTER TABLE name ADD COLUMNS (c1 TYPE, ...) — metadata-only widening:
  * a new table version with the same files and the added columns recorded
  * in its manifest ([[LakehouseTable.alterAddColumns]]); reads surface them
  * as typed nulls until appends carry them. */
case class AlterGraftTableAddColumnsCommand(name: String, colsDdl: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val existing = LakehouseTable.read(spark, e.root).columns.map(_.toLowerCase).toSet
    StructType.fromDDL(colsDdl).foreach(f =>
      require(!existing.contains(f.name.toLowerCase),
        s"ALTER TABLE $name ADD COLUMNS: column already exists: ${f.name}"))
    LakehouseTable.alterAddColumns(e.root, colsDdl)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** ALTER TABLE name ADD CONSTRAINT cname CHECK (expr) — Delta-style CHECK
  * constraint: existing rows are validated first (the ALTER fails loudly
  * if any violate), then the constraint is persisted in the catalog
  * descriptor and enforced on every subsequent INSERT (append →
  * quarantine via the expectations path; OVERWRITE → statement refused on
  * violation). NULL check results pass, SQL CHECK semantics. */
case class AlterGraftTableAddConstraintCommand(name: String,
    cname: String, checkExpr: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val e = GraftCatalog.lookup(name).get
    require(!e.constraints.exists(_._1.equalsIgnoreCase(cname)),
      s"constraint $cname already exists on $name")
    val bad = LakehouseTable.read(spark, e.root)
      .filter(not(coalesce(expr(checkExpr), lit(true)))).count()
    require(bad == 0,
      s"ALTER TABLE $name ADD CONSTRAINT $cname: $bad existing rows violate ($checkExpr)")
    GraftCatalog.setConstraints(name, e.constraints :+ (cname -> checkExpr))
    Seq.empty
  }
}

/** ALTER TABLE name DROP CONSTRAINT cname. */
case class AlterGraftTableDropConstraintCommand(name: String,
    cname: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    require(e.constraints.exists(_._1.equalsIgnoreCase(cname)),
      s"no constraint $cname on $name")
    GraftCatalog.setConstraints(name,
      e.constraints.filterNot(_._1.equalsIgnoreCase(cname)))
    Seq.empty
  }
}

/** DESCRIBE COLUMNS name — the logical schema with each column's stable
  * physical (file) name, making the column mapping inspectable from SQL.
  * (Spark's own DESCRIBE on the temp view shows logical names only.) */
case class DescribeColumnsGraftCommand(name: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("col_name", StringType, nullable = false)(),
      AttributeReference("data_type", StringType, nullable = false)(),
      AttributeReference("physical_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val v = LakehouseTable.currentVersion(e.root).getOrElse(
      throw new IllegalStateException(s"no table at ${e.root}"))
    val renames = LakehouseTable.renamedColumnsAt(e.root, v)
    LakehouseTable.read(spark, e.root).schema.map { f =>
      val phys = renames.find(_._2.equalsIgnoreCase(f.name))
        .map(_._1).getOrElse(f.name)
      Row(f.name, f.dataType.sql, phys)
    }
  }
}

/** ALTER TABLE name RENAME COLUMN old TO new — metadata-only Delta-style
  * column mapping ([[LakehouseTable.alterRenameColumn]]): files keep their
  * physical column names forever; reads surface the logical name, writes
  * lower it back. */
case class AlterGraftTableRenameColumnCommand(name: String,
    oldName: String, newName: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.alterRenameColumn(spark, e.root, oldName, newName)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** ALTER TABLE name ALTER COLUMN c TYPE t — metadata-only type WIDENING
  * epoch ([[LakehouseTable.alterWidenColumnType]]): files keep their write
  * epoch's physical type, reads surface the widened type, time travel sees
  * each epoch's own type. Narrowing is rejected. */
case class AlterGraftTableColumnTypeCommand(name: String,
    colName: String, newType: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.alterWidenColumnType(spark, e.root, colName, newType)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** ALTER TABLE name DROP COLUMN c / DROP COLUMNS (c1, c2) — metadata-only
  * hide of the physical column ([[LakehouseTable.alterDropColumns]]); old
  * versions still see it via time travel. */
case class AlterGraftTableDropColumnsCommand(name: String,
    cols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    LakehouseTable.alterDropColumns(spark, e.root, cols)
    GraftCatalog.refreshView(spark, name)
    Seq.empty
  }
}

/** DROP TABLE name — unregister from the graft catalog and drop the
  * published view; data files stay on disk (external-table semantics —
  * re-attach with CREATE TABLE ... USING graft LOCATION). */
case class DropGraftTableCommand(name: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftCatalog.drop(name)
    spark.catalog.dropTempView(name)
    Seq.empty
  }
}

/** SHOW GRAFT TABLES — every cataloged table with its location, current
  * version, partitioning, and row keys. (Plain `SHOW TABLES` still goes to
  * Spark, which lists the same tables as the temp views [[GraftCatalog
  * .bootstrap]] publishes — this detailed form is the metastore listing.) */
case class ShowGraftTablesCommand() extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("row_keys", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftCatalog.list().map { case (name, e) =>
      Row(name, e.root, LakehouseTable.currentVersion(e.root).getOrElse(-1L),
        e.partitionBy.mkString(","), e.rowKeys.mkString(","))
    }
}

/** VACUUM name [RETAIN n VERSIONS | RETAIN n HOURS] — version-count or
  * time-based (Delta-style) retention; returns the deleted-file count. */
/** ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS | FOR COLUMNS
  * a, b] — row count + per-column NDV/min/max/nulls, persisted with the
  * table and attached to its reads for the CBO (see
  * [[graft.sources.TableStatistics]]). */
case class AnalyzeGraftTableCommand(name: String, columns: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "row_count", org.apache.spark.sql.types.LongType, nullable = false)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "analyzed_columns", org.apache.spark.sql.types.LongType,
        nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val st = graft.sources.TableStatistics.analyze(spark, e.root, columns)
    Seq(Row(st.rowCount, st.cols.size.toLong))
  }
}

case class VacuumGraftTableCommand(name: String, retainLast: Int,
    retainHours: Option[Double] = None) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "deleted_files", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val e = GraftCatalog.lookup(name).get
    val n = retainHours match {
      case Some(h) => LakehouseTable.vacuumRetainHours(e.root, h)
      case None    => LakehouseTable.vacuum(e.root, retainLast)
    }
    Seq(Row(n.toLong))
  }
}

/** Statement recognizer: regex over the statement head; embedded SELECT
  * bodies go to Spark's parser verbatim inside the commands' run().
  *
  * Every regex runs against a LITERAL-MASKED copy of the statement
  * ([[maskLiterals]]): string literals are swapped for inert placeholders
  * first, so a literal like `' WHEN MATCHED '` inside a MERGE source or a
  * comma inside an UPDATE SET expression can never be mistaken for a
  * clause boundary. Captured operands are unmasked before they reach
  * Spark's parser (which does the actual expression parsing at run time),
  * so recognition is structural and evaluation is Spark's. */
object GraftSqlStatements {

  /** Swap the contents of quoted SQL literals ('…' and "…", with '' / ""
    * doubling and backslash escapes) for placeholder tokens that contain
    * no keywords, parens, commas, or dots. Returns the masked text and an
    * unmask function that restores every literal verbatim. */
  private[sql] def maskLiterals(sql: String): (String, String => String) = {
    val saved = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val q = sql.charAt(i)
      if (q == '\'' || q == '"') {
        val lit = new StringBuilder().append(q)
        i += 1
        var done = false
        while (i < sql.length && !done) {
          val ch = sql.charAt(i)
          if (ch == '\\' && i + 1 < sql.length) { // backslash escape
            lit.append(ch).append(sql.charAt(i + 1)); i += 2
          } else if (ch == q) {
            if (i + 1 < sql.length && sql.charAt(i + 1) == q) { // '' doubling
              lit.append(ch).append(ch); i += 2
            } else { lit.append(ch); done = true; i += 1 }
          } else { lit.append(ch); i += 1 }
        }
        saved += lit.toString
        sb.append(q).append('\u0001').append(saved.length - 1).append('\u0001').append(q)
      } else { sb.append(q); i += 1 }
    }
    val unmask = (s: String) => saved.indices.foldLeft(s) { (acc, n) =>
      // both quote kinds share the placeholder body; restore whichever
      // quoted form the masked text carries at each site
      val body = "\u0001" + n + "\u0001"
      acc.replace("'" + body + "'", saved(n)).replace("\"" + body + "\"", saved(n))
    }
    (sb.toString, unmask)
  }

  private val CloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SHALLOW\s+CLONE\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""".r
  private val CreateRe =
    """(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+USING\s+graft\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?(?:LOCATION\s+'([^']+)'\s*)?(?:AS\s+(.*?))?\s*;?\s*$""".r
  private val InsertRe =
    """(?is)^\s*INSERT\s+(INTO|OVERWRITE)\s+([A-Za-z_][A-Za-z0-9_]*)\s+((?:SELECT|WITH|VALUES|FROM|TABLE)\b.*?)\s*;?\s*$""".r
  // HEAD only — the USING body is split by BALANCED-PAREN scan, not a
  // greedy regex: a source containing ") ... ON ..." (a nested join's
  // ON, a parenthesized union) would let `\((.*)\)...ON` mis-split and
  // surface as a confusing analysis error instead of parsing right.
  // The scan is sound because the text is MASKED (no parens hide in
  // string literals). The tail after the source parses with MergeTailRe.
  private val MergeRe =
    """(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+))?\s+USING\s+\((.*)$""".r
  private val MergeTailRe =
    """(?is)^\s*(?:AS\s+(\w+)\s+)?ON\s+(.*?)\s+(?:WHEN\s+MATCHED\s+AND\s+(.*?)\s+THEN\s+DELETE\s+)?WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$""".r

  /** Split `afterOpenParen` (the text following "USING (") into the
    * balanced source body and the tail after its closing paren.
    * Throws on unbalanced input — by the time a statement matches a
    * MERGE head, a clean refusal beats falling through to Spark's
    * parser with a message about a statement IT never saw. */
  private def splitUsingBody(afterOpenParen: String): (String, String) = {
    val s = afterOpenParen
    var depth = 1
    var i = 0
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        // string literals are masked, but COMMENTS and backtick
        // identifiers are not — a ')' inside "-- note :)" or `a)b`
        // must not close the source early
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
          i -= 1 // the shared i += 1 below lands past the newline
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          require(end >= 0,
            "unterminated /* comment in MERGE ... USING (<source>)")
          i = end + 1 // + the shared i += 1 = past the closer
        case '`' =>
          val end = s.indexOf('`', i + 1)
          require(end >= 0,
            "unterminated ` identifier in MERGE ... USING (<source>)")
          i = end
        case '(' => depth += 1
        case ')' => depth -= 1
        case _   => ()
      }
      i += 1
    }
    require(depth == 0,
      "unbalanced parentheses in MERGE ... USING (<source>)")
    (s.substring(0, i - 1), s.substring(i))
  }

  private def mergeTailError(tail: String): Nothing =
    throw new IllegalArgumentException(
      "malformed MERGE tail after USING (<source>): expected " +
        "[AS s] ON <cond> [WHEN MATCHED AND <cond> THEN DELETE] " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN " +
        s"INSERT * — got: ${tail.trim.take(120)}")
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+(.*?)\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.*?)\s*;?\s*$""".r
  private val SetItemRe = """(?s)\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*?)\s*$""".r

  /** Split "SET-list WHERE cond" on the FIRST ' WHERE ' at paren
    * depth 0 (masked text — literals cannot carry a WHERE): a
    * subquery's own WHERE inside a SET expression stays whole, the
    * flaw a lazy `(.*?)\s+WHERE` split has. */
  private def splitSetWhere(rest: String): (String, String) = {
    var depth = 0
    var i = 0
    val up = rest.toUpperCase
    while (i < rest.length) {
      rest.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("WHERE", i) &&
              i > 0 && rest.charAt(i - 1).isWhitespace &&
              i + 5 < rest.length && rest.charAt(i + 5).isWhitespace)
            return (rest.substring(0, i).trim, rest.substring(i + 5).trim)
      }
      i += 1
    }
    throw new IllegalArgumentException(
      "UPDATE requires a top-level WHERE clause")
  }

  /** Split a SET list on top-level commas only (an expression like
    * `f(x, y)` must stay whole). */
  private def splitSetList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    s.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ => ()
    }
    out += s.substring(start)
    out.result()
  }

  private def parseSetList(s: String): Seq[(String, String)] =
    splitSetList(s).map {
      case SetItemRe(c, ex) => c -> ex
      case other => throw new IllegalArgumentException(
        s"unsupported UPDATE SET item (need col = expr): $other")
    }
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val DescColsRe =
    """(?is)^\s*DESCRIBE\s+COLUMNS\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val AlterDvRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(ENABLE|DISABLE)\s+DELETION\s+VECTORS\s*;?\s*$""".r
  private val ReorgRe =
    """(?is)^\s*REORG\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+(VERSIONS|HOURS))?\s*;?\s*$""".r
  private val AnalyzeRe =
    """(?is)^\s*ANALYZE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+(?:ALL\s+COLUMNS|COLUMNS\s+(.+?)))?\s*;?\s*$""".r
  private val ShowTablesRe = """(?is)^\s*SHOW\s+GRAFT\s+TABLES\s*;?\s*$""".r
  private val ConvertRe =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""".r
  private val AlterAddRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+COLUMNS?\s*\(\s*(.+?)\s*\)\s*;?\s*$""".r
  private val AlterRenameRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val AlterAddConsRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\(\s*(.+?)\s*\)\s*;?\s*$""".r
  private val AlterDropConsRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val AlterDropColRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+COLUMNS?\s+(?:\(\s*([^)]+?)\s*\)|([A-Za-z_][A-Za-z0-9_]*))\s*;?\s*$""".r
  private val AlterColTypeRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+(?:SET\s+DATA\s+)?TYPE\s+([A-Za-z0-9_()\s,]+?)\s*;?\s*$""".r
  private val AlterIdentityRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+IDENTITY\s+([A-Za-z_][A-Za-z0-9_]*)\s+ORDER\s+BY\s+([A-Za-z0-9_,\s]+?)\s*;?\s*$""".r
  private val AlterCdfRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ENABLE\s+CHANGE\s+DATA\s+FEED\s+KEYS\s+([A-Za-z0-9_,\s]+?)\s*;?\s*$""".r
  private val AlterGeneratedRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+GENERATED\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(?:DATE\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)|DIV\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*(\d+)\s*\))\s*;?\s*$""".r
  private val OnConjunctRe = """(?s)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r

  /** ON-clause → merge key columns. Only the equi-self-named form
    * `a.k = b.k [AND ...]` is accepted (the form [[LakehouseTable.merge]]
    * implements); anything else is a loud error, not a silent misparse. */
  private def mergeKeys(cond: String, target: String, targetAlias: Option[String],
      sourceAlias: Option[String]): Seq[String] = {
    val targetNames = (Set(target.toLowerCase) ++ targetAlias.map(_.toLowerCase)).toSet
    cond.split("(?i)\\s+AND\\s+").toSeq.map {
      case OnConjunctRe(a1, c1, a2, c2) =>
        require(c1.equalsIgnoreCase(c2),
          s"MERGE ON supports same-named key columns only, got $a1.$c1 = $a2.$c2")
        require(targetNames.contains(a1.toLowerCase) ^ targetNames.contains(a2.toLowerCase),
          s"MERGE ON conjunct must compare target vs source: $a1.$c1 = $a2.$c2")
        c1
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE ON conjunct (need t.k = s.k): $other")
    }
  }

  /** The graft command for `sqlText`, if it is a graft statement. DML on
    * unregistered names returns None (delegate's statement, not ours).
    * Clause recognition runs on the literal-masked text; every captured
    * operand that can carry a literal is unmasked before it reaches the
    * command (whose run() hands it to Spark's parser). */
  def command(sqlText: String): Option[LeafRunnableCommand] = {
    val (masked, unmask) = maskLiterals(sqlText)
    // a LOCATION capture is the literal's PLACEHOLDER BODY (the regex
    // matched the masked text between quotes) — re-quote, unmask, unquote
    def unmaskQuoted(g: String): String = {
      val lit = unmask("'" + g + "'")
      lit.stripPrefix("'").stripSuffix("'")
    }
    masked match {
      case ConvertRe(src, name, loc) =>
        val root = Option(loc).map(unmaskQuoted).getOrElse(
          graft.sources.TableCache.baseDir + s"/sqlconvert_${name.toLowerCase}")
        Some(ConvertToGraftCommand(name, unmaskQuoted(src), root))
      case CloneRe(name, srcName, loc) if GraftCatalog.lookup(srcName).isDefined =>
        val root = Option(loc).map(unmaskQuoted).getOrElse(
          graft.sources.TableCache.baseDir + s"/sqlclone_${name.toLowerCase}")
        Some(CloneGraftTableCommand(name, srcName, root))
      case CreateRe(name, parts, loc, query) =>
        val partitionBy = Option(parts).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val root = Option(loc).map(unmaskQuoted).getOrElse(
          graft.sources.TableCache.baseDir + s"/sql_${name.toLowerCase}")
        Some(CreateGraftTableCommand(name, root, partitionBy,
          Option(query).map(unmask)))
      case AlterIdentityRe(name, idCol, keys) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterIdentityGraftCommand(name, idCol,
          keys.split(",").toSeq.map(_.trim).filter(_.nonEmpty)))
      case AlterCdfRe(name, keys) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterCdfGraftCommand(name,
          keys.split(",").toSeq.map(_.trim).filter(_.nonEmpty)))
      case AlterGeneratedRe(name, partCol, dateSrc, divSrc, divN)
          if GraftCatalog.lookup(name).isDefined =>
        Some(
          if (dateSrc != null)
            AlterGeneratedGraftCommand(name, partCol, "date", dateSrc)
          else AlterGeneratedGraftCommand(name, partCol, s"div:$divN", divSrc))
      case InsertRe(mode, name, query) if GraftCatalog.lookup(name).isDefined =>
        Some(InsertGraftTableCommand(name, unmask(query),
          overwrite = mode.equalsIgnoreCase("OVERWRITE")))
      case MergeRe(name, tAlias, afterUsing) if GraftCatalog.lookup(name).isDefined =>
        val (source, tail) = splitUsingBody(afterUsing)
        tail match {
          case MergeTailRe(sAlias, cond, delCond) =>
            // the DELETE condition filters the SOURCE rows: strip the source
            // alias qualifier so it evaluates against the bare source frame.
            // Alias-strip happens on the MASKED text (an alias lookalike
            // inside a literal stays intact), then the literals come back.
            val del = Option(delCond).map { c =>
              unmask(Option(sAlias).fold(c)(a => c.replaceAll(
                "(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\.", "")))
            }
            Some(MergeGraftTableCommand(name, unmask(source),
              mergeKeys(cond, name, Option(tAlias), Option(sAlias)), del))
          case t => mergeTailError(t)
        }
      case DeleteRe(name, cond) if GraftCatalog.lookup(name).isDefined =>
        Some(DeleteGraftTableCommand(name, unmask(cond)))
      case UpdateRe(name, rest) if GraftCatalog.lookup(name).isDefined =>
        // SET/WHERE and SET-list splitting both happen on MASKED text
        // at top paren depth: literals and subqueries cannot fracture
        // items or capture the wrong WHERE
        val (setList, cond) = splitSetWhere(rest)
        Some(UpdateGraftTableCommand(name,
          parseSetList(setList).map { case (c, ex) => c -> unmask(ex) },
          unmask(cond)))
      case ForeignInsertRe(face, idx, branchIdx, query) =>
        val branch = Option(branchIdx).map(unmaskLit(unmask, _))
        require(branch.isEmpty || face.equalsIgnoreCase("iceberg_export"),
          "INSERT INTO delta_export(path) takes no branch argument " +
            "(Delta has no branch refs)")
        Some(ForeignInsertCommand(face.toLowerCase,
          unmaskLit(unmask, idx), unmask(query), branch))
      case ForeignDeleteRe(face, idx, cond) =>
        Some(ForeignDeleteCommand(face.toLowerCase,
          unmaskLit(unmask, idx), unmask(cond)))
      case ForeignUpdateRe(face, idx, rest) =>
        val (setList, cond) = splitSetWhere(rest)
        Some(ForeignUpdateCommand(face.toLowerCase,
          unmaskLit(unmask, idx),
          parseSetList(setList).map { case (c, ex) => c -> unmask(ex) },
          unmask(cond)))
      case ForeignAlterAddRe(face, idx, cols) =>
        Some(ForeignAlterAddColumnsCommand(face.toLowerCase,
          unmaskLit(unmask, idx), unmask(cols)))
      case ForeignSetPropsRe(face, idx, verb, body) =>
        // the body is masked literals: SET pairs 'k'='v', UNSET keys
        // 'k' — split on top-level commas (literals cannot hide one)
        val items = body.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val isSet = verb.equalsIgnoreCase("SET")
        val PairRe = ("""(?s)^""" + MaskedLit + """\s*=\s*""" +
          MaskedLit + """$""").r
        val KeyRe = ("""(?s)^""" + MaskedLit + """$""").r
        if (isSet) {
          val pairs = items.map {
            case PairRe(k, v) =>
              (unmaskLit(unmask, k), unmaskLit(unmask, v))
            case it => throw new IllegalArgumentException(
              "SET TBLPROPERTIES expects 'key'='value' pairs, got: " +
                unmask(it))
          }
          Some(ForeignSetPropertiesCommand(face.toLowerCase,
            unmaskLit(unmask, idx), pairs, Nil))
        } else {
          val keys = items.map {
            case KeyRe(k) => unmaskLit(unmask, k)
            case it => throw new IllegalArgumentException(
              "UNSET TBLPROPERTIES expects 'key' names, got: " +
                unmask(it))
          }
          Some(ForeignSetPropertiesCommand(face.toLowerCase,
            unmaskLit(unmask, idx), Nil, keys))
        }
      case ForeignCreateRefRe(idx, refType, name, sid) =>
        Some(ForeignRefCommand(unmaskLit(unmask, idx), create = true,
          refType.toLowerCase, name, Some(sid.toLong)))
      case ForeignDropRefRe(idx, refType, name) =>
        // the verb's type is checked against the stored ref: DROP TAG
        // on a branch refuses (Iceberg's own behavior)
        Some(ForeignRefCommand(unmaskLit(unmask, idx), create = false,
          refType.toLowerCase, name, None))
      case ForeignFastForwardRe(idx, branch) =>
        Some(ForeignFastForwardCommand(unmaskLit(unmask, idx), branch))
      case ForeignCheckpointRe(idx) =>
        Some(ForeignMaintenanceCommand("checkpoint",
          unmaskLit(unmask, idx), None))
      case ForeignRewriteManifestsRe(idx) =>
        Some(ForeignMaintenanceCommand("rewrite-manifests-iceberg",
          unmaskLit(unmask, idx), None))
      case ForeignVacuumRe(face, idx, retain, unit) =>
        val f = face.toLowerCase
        if (f == "delta_export") {
          require(unit == null || unit.equalsIgnoreCase("HOURS"),
            "VACUUM delta_export(...) retention is RETAIN n HOURS")
          Some(ForeignMaintenanceCommand("vacuum-delta",
            unmaskLit(unmask, idx), Option(retain)))
        } else {
          // snapshot expiry is IRREVERSIBLE — an argument-less default
          // of "keep 1" would destroy all time travel from a statement
          // the Delta twin treats conservatively; make intent explicit
          require(unit != null && unit.equalsIgnoreCase("VERSIONS"),
            "VACUUM iceberg_export(...) requires an explicit " +
              "RETAIN n VERSIONS (snapshot expiry is irreversible)")
          Some(ForeignMaintenanceCommand("expire-iceberg",
            unmaskLit(unmask, idx), Option(retain)))
        }
      case ForeignRemoveOrphansRe(idx, hours) =>
        // deleting unreferenced files is irreversible — the grace
        // horizon must be EXPLICIT (the expire-snapshots precedent;
        // an implicit default is how in-flight writers lose files)
        require(hours != null,
          "REMOVE ORPHAN FILES iceberg_export(...) requires an " +
            "explicit OLDER THAN n HOURS (deletion is irreversible " +
            "and a too-short horizon races in-flight writers)")
        Some(ForeignMaintenanceCommand("remove-orphans-iceberg",
          unmaskLit(unmask, idx), Some(hours)))
      case ForeignOptimizeRe(face, idx, zcols) =>
        val isDelta = face.equalsIgnoreCase("delta_export")
        require(zcols == null || isDelta,
          "OPTIMIZE iceberg_export(...) is MOR compaction and takes " +
            "no ZORDER BY (cluster the table with the Delta face or " +
            "the native OPTIMIZE)")
        val zlist = Option(zcols).map(_.split(",").map(_.trim)
          .filter(_.nonEmpty).mkString(","))
        // an all-whitespace/comma list must refuse, not silently
        // degrade to bin-packing the user did not ask for
        require(zlist.forall(_.nonEmpty),
          "OPTIMIZE ... ZORDER BY (...) requires at least one column")
        Some(ForeignMaintenanceCommand(
          if (isDelta) "optimize-delta" else "compact-iceberg",
          unmaskLit(unmask, idx), zlist))
      case ForeignRestoreRe(idx, v) =>
        Some(ForeignMaintenanceCommand("restore-delta",
          unmaskLit(unmask, idx), Some(v)))
      case ForeignRollbackRe(idx, s) =>
        Some(ForeignMaintenanceCommand("rollback-iceberg",
          unmaskLit(unmask, idx), Some(s)))
      case ForeignMergeRe(face, idx, tAlias, afterUsing) =>
        // the TVF target has no table name — the ON clause can only
        // reference it through an alias, so one is required
        require(tAlias != null,
          "MERGE INTO delta_export/iceberg_export(...) requires a " +
            "target alias (MERGE INTO delta_export('/p') AS t ...)")
        val (source, tail) = splitUsingBody(afterUsing)
        tail match {
          case MergeTailRe(sAlias, cond, delCond) =>
            val del = Option(delCond).map { c =>
              unmask(Option(sAlias).fold(c)(a => c.replaceAll(
                "(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\.", "")))
            }
            Some(ForeignMergeCommand(face.toLowerCase,
              unmaskLit(unmask, idx), unmask(source),
              mergeKeys(cond, tAlias, None, Option(sAlias)), del))
          case t => mergeTailError(t)
        }
      case RestoreRe(name, v) if GraftCatalog.lookup(name).isDefined =>
        Some(RestoreGraftTableCommand(name, v.toLong))
      case OptimizeRe(name, where, zcols) if GraftCatalog.lookup(name).isDefined =>
        Some(OptimizeGraftTableCommand(name,
          Option(zcols).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
          where = Option(where).map(w => unmask(w.trim)).filter(_.nonEmpty)))
      case HistoryRe(name) if GraftCatalog.lookup(name).isDefined =>
        Some(DescribeHistoryGraftCommand(name))
      case DetailRe(name) if GraftCatalog.lookup(name).isDefined =>
        Some(DescribeDetailGraftCommand(name))
      case DescColsRe(name) if GraftCatalog.lookup(name).isDefined =>
        Some(DescribeColumnsGraftCommand(name))
      case DropRe(name) if GraftCatalog.lookup(name).isDefined =>
        Some(DropGraftTableCommand(name))
      case AlterDvRe(name, mode) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableDvCommand(name, mode.equalsIgnoreCase("ENABLE")))
      case ReorgRe(name) if GraftCatalog.lookup(name).isDefined =>
        Some(ReorgGraftTablePurgeCommand(name))
      case VacuumRe(name, retain, unit) if GraftCatalog.lookup(name).isDefined =>
        if (Option(unit).exists(_.equalsIgnoreCase("HOURS")))
          Some(VacuumGraftTableCommand(name, 1,
            retainHours = Some(retain.toDouble)))
        else
          Some(VacuumGraftTableCommand(name,
            Option(retain).map(_.toDouble.toInt).getOrElse(1)))
      case AnalyzeRe(name, cols) if GraftCatalog.lookup(name).isDefined =>
        Some(AnalyzeGraftTableCommand(name, Option(cols).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)))
      case ShowTablesRe() => Some(ShowGraftTablesCommand())
      case AlterAddRe(name, cols) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableAddColumnsCommand(name, unmask(cols)))
      case AlterAddConsRe(name, cname, ck) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableAddConstraintCommand(name, cname, unmask(ck)))
      case AlterDropConsRe(name, cname) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableDropConstraintCommand(name, cname))
      case AlterRenameRe(name, oldC, newC) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableRenameColumnCommand(name, oldC, newC))
      case AlterDropColRe(name, list, single) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableDropColumnsCommand(name,
          Option(single).map(Seq(_)).getOrElse(
            list.split(",").toSeq.map(_.trim).filter(_.nonEmpty))))
      case AlterColTypeRe(name, colName, newType) if GraftCatalog.lookup(name).isDefined =>
        Some(AlterGraftTableColumnTypeCommand(name, colName, newType.trim))
      case _ => None
    }
  }

  private val TimeTravelRe = """(?i)\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val TimestampTravelRe =
    """(?i)\b([A-Za-z_][A-Za-z0-9_]*)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r
  private val TableChangesRe =
    """(?i)\bTABLE_CHANGES\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  // FOREIGN-PATH table-valued reads: a QUOTED path (a masked literal at
  // rewrite time) instead of a registered name reads an exported /
  // foreign open-format table in place — no CONVERT TO GRAFT copy, no
  // registration. The literal appears in the masked text as
  // '<u0001><N><u0001>' (either quote kind), so these regexes match the
  // placeholder and unmask the real path on use.
  private val MaskedLit =
    """['"]""" + "\u0001" + """(\d+)""" + "\u0001" + """['"]"""
  private val DeltaExportRe =
    ("""(?i)\bdelta_export\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(?:(\d+)|""" + MaskedLit + """))?\s*\)""").r
  private val IcebergExportRe =
    ("""(?i)\biceberg_export\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(?:(\d+)|""" + MaskedLit + """))?\s*\)""").r
  // the `_where` forms take an explicit PREDICATE literal and plan the
  // scan from the format's own metadata (Delta add stats / Iceberg
  // manifest partition values + bounds) before reading — a distinct
  // name because the plain forms' optional second argument is already
  // a (timestamp) string literal and overloading it would be ambiguous
  private val DeltaExportWhereRe =
    ("""(?i)\bdelta_export_where\s*\(\s*""" + MaskedLit +
      """\s*,\s*""" + MaskedLit + """\s*\)""").r
  private val IcebergExportWhereRe =
    ("""(?i)\biceberg_export_where\s*\(\s*""" + MaskedLit +
      """\s*,\s*""" + MaskedLit + """\s*\)""").r
  // metadata-inspection TVFs by quoted path — read-only relations
  // over the chain's own parsed state (no data IO)
  private val IcebergSnapshotsRe =
    ("""(?i)\biceberg_snapshots\s*\(\s*""" + MaskedLit + """\s*\)""").r
  private val IcebergFilesRe =
    ("""(?i)\biceberg_files\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(\d+))?\s*\)""").r
  private val IcebergManifestsRe =
    ("""(?i)\biceberg_manifests\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(\d+))?\s*\)""").r
  private val IcebergRefsRe =
    ("""(?i)\biceberg_refs\s*\(\s*""" + MaskedLit + """\s*\)""").r
  private val IcebergPartitionsRe =
    ("""(?i)\biceberg_partitions\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(\d+))?\s*\)""").r
  private val DeltaDetailRe =
    ("""(?i)\bdelta_detail\s*\(\s*""" + MaskedLit + """\s*\)""").r
  private val DeltaHistoryRe =
    ("""(?i)\bdelta_history\s*\(\s*""" + MaskedLit + """\s*\)""").r
  private val DeltaFilesRe =
    ("""(?i)\bdelta_files\s*\(\s*""" + MaskedLit +
      """\s*(?:,\s*(\d+))?\s*\)""").r
  // each range bound is a bare version/sequence number OR a quoted
  // timestamp literal (masked); the keys argument of iceberg_changelog
  // is optional — omitted, the key list comes from the graft manifest's
  // cdf field when the chain is graft's own mirror
  private val ForeignChangesRe =
    ("""(?i)\btable_changes\s*\(\s*""" + MaskedLit +
      """\s*,\s*(?:(\d+)|""" + MaskedLit + """)\s*,\s*(?:(\d+)|""" +
      MaskedLit + """)\s*\)""").r
  // foreign-path DML twins of the TVF reads: the statement names a
  // QUOTED path instead of a registered table
  // optional second literal = BRANCH name (write-audit-publish
  // staging; iceberg_export only — Delta has no branch refs)
  private val ForeignInsertRe =
    ("""(?is)^\s*INSERT\s+INTO\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit + """\s*(?:,\s*""" + MaskedLit + """\s*)?""" +
      """\)\s+((?:SELECT|WITH|VALUES|FROM|TABLE)\b.*?)\s*;?\s*$""").r
  private val ForeignDeleteRe =
    ("""(?is)^\s*DELETE\s+FROM\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit + """\s*\)\s+WHERE\s+(.*?)\s*;?\s*$""").r
  private val ForeignUpdateRe =
    ("""(?is)^\s*UPDATE\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit + """\s*\)\s+SET\s+(.*?)\s*;?\s*$""").r
  private val ForeignAlterAddRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit + """\s*\)\s+ADD\s+COLUMNS?\s*\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val ForeignSetPropsRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit +
      """\s*\)\s+(SET|UNSET)\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val ForeignCreateRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+iceberg_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s+CREATE\s+(TAG|BRANCH)\s+([A-Za-z_][A-Za-z0-9_.\-]*)\s+AS\s+OF\s+SNAPSHOT\s+(\d+)\s*;?\s*$""").r
  private val ForeignDropRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+iceberg_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s+DROP\s+(TAG|BRANCH)\s+([A-Za-z_][A-Za-z0-9_.\-]*)\s*;?\s*$""").r
  private val ForeignFastForwardRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+iceberg_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s+FAST\s+FORWARD\s+main\s+TO\s+([A-Za-z_][A-Za-z0-9_.\-]*)\s*;?\s*$""").r
  private val ForeignCheckpointRe =
    ("""(?is)^\s*CHECKPOINT\s+delta_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s*;?\s*$""").r
  private val ForeignRewriteManifestsRe =
    ("""(?is)^\s*REWRITE\s+MANIFESTS\s+iceberg_export\s*\(\s*""" +
      MaskedLit + """\s*\)\s*;?\s*$""").r
  private val ForeignVacuumRe =
    ("""(?is)^\s*VACUUM\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit +
      """\s*\)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+(HOURS|VERSIONS))?\s*;?\s*$""").r
  private val ForeignRemoveOrphansRe =
    ("""(?is)^\s*REMOVE\s+ORPHAN\s+FILES\s+iceberg_export\s*\(\s*""" +
      MaskedLit +
      """\s*\)(?:\s+OLDER\s+THAN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*$""").r
  private val ForeignOptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit +
      """\s*\)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val ForeignRestoreRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+delta_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val ForeignRollbackRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+iceberg_export\s*\(\s*""" + MaskedLit +
      """\s*\)\s+TO\s+SNAPSHOT\s+(\d+)\s*;?\s*$""").r
  // HEAD only, like MergeRe — the USING body splits by balanced scan
  private val ForeignMergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+(delta_export|iceberg_export)\s*\(\s*""" +
      MaskedLit +
      """\s*\)(?:\s+AS\s+(\w+))?\s+USING\s+\((.*)$""").r
  private val IcebergChangelogRe =
    ("""(?i)\biceberg_changelog\s*\(\s*""" + MaskedLit +
      """\s*,\s*(?:(\d+)|""" + MaskedLit + """)\s*,\s*(?:(\d+)|""" +
      MaskedLit + """)\s*(?:,\s*""" + MaskedLit + """\s*)?\)""").r

  /** Restore masked literal #idx and strip its quotes — the PATH/STRING
    * argument of a foreign table-valued read. */
  private def unmaskLit(unmask: String => String, idx: String): String = {
    val restored = unmask("'\u0001" + idx + "\u0001'")
    restored.substring(1, restored.length - 1)
  }

  /** Restore masked literal #idx as a PREDICATE string: strip the outer
    * quotes AND undo the SQL doubling of that quote kind — a predicate's
    * own string literals arrive SQL-escaped
    * (`'o_orderstatus = ''F'''` → `o_orderstatus = 'F'`). */
  private def unmaskPred(unmask: String => String, idx: String): String = {
    val restored = unmask("'\u0001" + idx + "\u0001'")
    val q = restored.head
    val body = restored.substring(1, restored.length - 1)
    // one pass, mirroring maskLiterals' lexing: both escape styles the
    // masker recognizes un-escape here — quote DOUBLING and BACKSLASH
    // escapes (Spark's default lexer writes \' inside '…'); leaving a
    // backslash through would hand parseExpression a stray token.
    // Escape SEQUENCES decode to Spark's unescapeSQLString semantics:
    // \n → newline (not the letter 'n'), \t/\r/\b/\f/\0/\Z likewise,
    // \uXXXX → the code unit, \UXXXXXXXX → the code point (when a
    // valid one — Spark is lenient on overflow, so the fallback \U → 'U'
    // matches it), three-digit
    // octal \ooo → the byte value, \% and \_ KEEP their backslash
    // (LIKE pattern escapes), any other \x → x.
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        val e = body.charAt(i + 1)
        val (decoded, adv) = e match {
          // THREE-digit octal first, Spark's exact rule: the FIRST
          // digit must be 0 or 1 ('\377' stays the text "377" under
          // Spark's lexer); "\012" decodes as \n, a bare "\0" is NUL
          case o if o >= '0' && o <= '1' && i + 4 <= body.length &&
              body.charAt(i + 2) >= '0' && body.charAt(i + 2) <= '7' &&
              body.charAt(i + 3) >= '0' && body.charAt(i + 3) <= '7' =>
            (Integer.parseInt(body.substring(i + 1, i + 4), 8)
              .toChar.toString, 4)
          case 'n' => ("\n", 2); case 't' => ("\t", 2); case 'r' => ("\r", 2)
          case 'b' => ("\b", 2); case 'f' => ("\f", 2)
          case '0' => ("\u0000", 2); case 'Z' => ("\u001A", 2)
          case '%' | '_' => ("\\" + e, 2) // LIKE escapes keep the backslash
          case 'u' if i + 5 < body.length &&
              body.substring(i + 2, i + 6)
                .forall(ch => Character.digit(ch, 16) >= 0) =>
            (Integer.parseInt(body.substring(i + 2, i + 6), 16)
              .toChar.toString, 6)
          case 'U' if i + 9 < body.length &&
              body.substring(i + 2, i + 10)
                .forall(ch => Character.digit(ch, 16) >= 0) &&
              java.lang.Long.parseLong(
                body.substring(i + 2, i + 10), 16) <= 0x10FFFFL =>
            (new String(Character.toChars(
              Integer.parseInt(body.substring(i + 2, i + 10), 16))), 10)
          case other => (other.toString, 2)
        }
        sb.append(decoded)
        i += adv
      } else if (c == q && i + 1 < body.length && body.charAt(i + 1) == q) {
        sb.append(c); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** UTC wall-clock SQL timestamp literal → epoch millis (the
    * TIMESTAMP AS OF convention, shared by the foreign-read forms). */
  private def parseUtcMillis(name: String, lit: String): Long = {
    val norm = lit.trim.replaceAll("\\s+", "T")
    (try {
      if (norm.contains("T")) java.time.LocalDateTime.parse(norm)
      else java.time.LocalDate.parse(norm).atStartOfDay()
    } catch {
      case ex: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"$name: timestamp '$lit' expected " +
            "'yyyy-MM-dd' or 'yyyy-MM-dd HH:mm:ss[.SSS]'", ex)
    }).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  private def foreignView(kind: String, args: String): String =
    kind + "__" + graft.plans.TextExpressions.md5Hex(args).take(12)

  /** Rewrite the graft read sugar over REGISTERED tables into temp views
    * (registered here, at parse time — the one place that both has the
    * session and sees the raw text): `name VERSION AS OF n` → a
    * version-pinned view; `TABLE_CHANGES(name, from, to)` → a change-feed
    * view (requires the table registered with rowKeys). Unregistered
    * names pass through to the delegate parser untouched. */
  def rewriteTimeTravel(spark: SparkSession, sqlText: String): String = {
    val q = scala.util.matching.Regex.quoteReplacement _
    // rewrite against the literal-masked text: `'orders VERSION AS OF 1'`
    // inside a string literal is DATA, not time-travel sugar — without the
    // mask the rewrite would corrupt the literal
    val (maskedText, unmask) = maskLiterals(sqlText)
    val afterTt = TimeTravelRe.replaceAllIn(maskedText, m => {
      val (name, v) = (m.group(1), m.group(2).toLong)
      GraftCatalog.lookup(name) match {
        case Some(e) =>
          val view = s"${name}__v$v"
          LakehouseTable.read(spark, e.root, Some(v)).createOrReplaceTempView(view)
          q(view)
        case None => q(m.matched)
      }
    })
    val afterTs = TimestampTravelRe.replaceAllIn(afterTt, m => {
      // the regex matched the masked text, so group(2) is a literal
      // PLACEHOLDER body — restore the real timestamp text
      val (name, lit) = (m.group(1),
        unmask("'" + m.group(2) + "'").stripPrefix("'").stripSuffix("'"))
      GraftCatalog.lookup(name) match {
        case Some(e) =>
          // UTC wall-clock literal (the session timezone): date-only
          // '2026-08-13' (midnight, Delta's accepted short form) or
          // '2026-08-13 05:00:00[.123]'; interior runs of spaces collapse
          val norm = lit.trim.replaceAll("\\s+", "T")
          val millis = (try {
            if (norm.contains("T")) java.time.LocalDateTime.parse(norm)
            else java.time.LocalDate.parse(norm).atStartOfDay()
          } catch {
            case ex: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"$name TIMESTAMP AS OF '$lit': expected " +
                  "'yyyy-MM-dd' or 'yyyy-MM-dd HH:mm:ss[.SSS]'", ex)
          }).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          val v = LakehouseTable.versionAt(e.root, millis).getOrElse(
            throw new IllegalArgumentException(
              s"$name TIMESTAMP AS OF '$lit': no version committed at or before it"))
          val view = s"${name}__t$millis"
          LakehouseTable.read(spark, e.root, Some(v)).createOrReplaceTempView(view)
          q(view)
        case None => q(m.matched)
      }
    })
    val afterTc = TableChangesRe.replaceAllIn(afterTs, m => {
      val (name, from, to) = (m.group(1), m.group(2).toLong, m.group(3).toLong)
      GraftCatalog.lookup(name) match {
        case Some(e) =>
          require(e.rowKeys.nonEmpty,
            s"TABLE_CHANGES($name, ...) needs the table registered with rowKeys")
          val view = s"${name}__changes_${from}_$to"
          LakehouseTable.changeFeed(spark, e.root, from, to, e.rowKeys)
            .createOrReplaceTempView(view)
          q(view)
        case None => q(m.matched)
      }
    })
    // foreign-path table-valued reads (quoted path, not a registered
    // name): lower onto the existing open-format readers in place.
    // The `_where` forms rewrite FIRST — their names contain the plain
    // forms' as a prefix, and both regexes are word-bounded, but
    // ordering makes the precedence explicit.
    val afterDw = DeltaExportWhereRe.replaceAllIn(afterTc, m => {
      val path = unmaskLit(unmask, m.group(1))
      val pred = unmaskPred(unmask, m.group(2))
      val view = foreignView("delta_export_where",
        s"$path#$pred")
      LakehouseTable.readDeltaExport(spark, path,
          pruneWhere = Some(pred))
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterIw = IcebergExportWhereRe.replaceAllIn(afterDw, m => {
      val path = unmaskLit(unmask, m.group(1))
      val pred = unmaskPred(unmask, m.group(2))
      val view = foreignView("iceberg_export_where",
        s"$path#$pred")
      IcebergMeta.readIceberg(spark, path, pruneWhere = Some(pred))
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterDe = DeltaExportRe.replaceAllIn(afterIw, m => {
      val path = unmaskLit(unmask, m.group(1))
      val vOpt = Option(m.group(2)).map(_.toLong)
      val tsOpt = Option(m.group(3)).map(i =>
        parseUtcMillis("delta_export", unmaskLit(unmask, i)))
      val view = foreignView("delta_export",
        s"$path#${vOpt.getOrElse(-1L)}#${tsOpt.getOrElse(-1L)}")
      LakehouseTable.readDeltaExport(spark, path,
          versionAsOf = vOpt, timestampAsOf = tsOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterIe = IcebergExportRe.replaceAllIn(afterDe, m => {
      val path = unmaskLit(unmask, m.group(1))
      // quoted second argument: a snapshot REF name when the chain
      // declares one (tags/branches are the spec's named time travel —
      // `iceberg_export('/p', 'audit')`), else a timestamp literal.
      // Refs win: a chain cannot carry a ref named like a parseable
      // timestamp unless someone created it, and then the NAME is the
      // intent
      val litOpt = Option(m.group(3)).map(i =>
        unmaskLit(unmask, i))
      val refSid = litOpt.flatMap(IcebergMeta.refSnapshotId(path, _))
      val sOpt = Option(m.group(2)).map(_.toLong).orElse(refSid)
      val tsOpt =
        if (refSid.isDefined) None
        else litOpt.map(parseUtcMillis("iceberg_export", _))
      val view = foreignView("iceberg_export",
        s"$path#${sOpt.getOrElse(-1L)}#${tsOpt.getOrElse(-1L)}")
      IcebergMeta.readIceberg(spark, path,
          snapshotAsOf = sOpt, asOfTimestamp = tsOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterFc = ForeignChangesRe.replaceAllIn(afterIe, m => {
      val path = unmaskLit(unmask, m.group(1))
      // timestamp bounds resolve through the log's own commit stamps
      // (Delta's table_changes semantics): start = first version
      // committed AT OR AFTER the stamp, end = last version AT OR
      // BEFORE it; past-the-tip starts refuse rather than serve empty
      def bound(numG: Int, litG: Int, isStart: Boolean): Long =
        Option(m.group(numG)).map(_.toLong).getOrElse {
          val lit = unmaskLit(unmask, m.group(litG))
          val ts = parseUtcMillis("table_changes", lit)
          if (isStart) {
            val start = LakehouseTable.deltaExportVersionAt(path, ts - 1)
              .map(_ + 1L)
              .orElse(LakehouseTable.deltaLogVersions(path).headOption)
              .getOrElse(throw new IllegalArgumentException(
                s"table_changes: no Delta log at $path"))
            require(LakehouseTable.deltaLogVersions(path).contains(start),
              s"table_changes('$path', '$lit', ...): the start timestamp " +
                "is after the log's latest commit")
            start
          } else LakehouseTable.deltaExportVersionAt(path, ts).getOrElse(
            throw new IllegalArgumentException(
              s"table_changes('$path', ..., '$lit'): no version " +
                "committed at or before the end timestamp"))
        }
      val (from, to) = (bound(2, 3, isStart = true),
        bound(4, 5, isStart = false))
      val view = foreignView("table_changes", s"$path#$from#$to")
      LakehouseTable.readDeltaExportChanges(spark, path, from, to)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterIc = IcebergChangelogRe.replaceAllIn(afterFc, m => {
      val path = unmaskLit(unmask, m.group(1))
      // sequence bounds by number or by the chain's own snapshot
      // timestamps; the exclusive start = (first snapshot at/after) - 1
      def seqBound(numG: Int, litG: Int, isStart: Boolean): Long =
        Option(m.group(numG)).map(_.toLong).getOrElse {
          val lit = unmaskLit(unmask, m.group(litG))
          val ts = parseUtcMillis("iceberg_changelog", lit)
          val snaps = IcebergMeta.snapshots(path).sortBy(_.seq)
          if (isStart) snaps.find(_.ts >= ts).map(_.seq - 1).getOrElse(
            throw new IllegalArgumentException(
              s"iceberg_changelog('$path', '$lit', ...): the start " +
                "timestamp is after the chain's latest snapshot"))
          else snaps.filter(_.ts <= ts).lastOption.map(_.seq).getOrElse(
            throw new IllegalArgumentException(
              s"iceberg_changelog('$path', ..., '$lit'): no snapshot " +
                "committed at or before the end timestamp"))
        }
      val (from, to) = (seqBound(2, 3, isStart = true),
        seqBound(4, 5, isStart = false))
      // keys: the explicit 4th argument, or the graft manifest's cdf
      // field when the chain mirrors a graft table with CDF enabled
      val keys = Option(m.group(6))
        .map(i => unmaskLit(unmask, i)
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .orElse(IcebergMeta.graftCdfKeys(path))
        .getOrElse(throw new IllegalArgumentException(
          s"iceberg_changelog('$path', ...): pass the key-column list " +
            "('k1,k2') — the chain is not a graft CDF mirror, so no " +
            "recorded key list exists to default from"))
      val view = foreignView("iceberg_changelog",
        s"$path#$from#$to#${keys.mkString("|")}")
      IcebergMeta.icebergChangelog(spark, path, from, to, keys)
        .createOrReplaceTempView(view)
      q(view)
    })
    // metadata-INSPECTION reads (the tables every real engine exposes
    // and an operator consults before expire/compact/rewrite): all
    // three are driver-derived relations over already-parsed state
    val afterIs = IcebergSnapshotsRe.replaceAllIn(afterIc, m => {
      val path = unmaskLit(unmask, m.group(1))
      val view = foreignView("iceberg_snapshots", path)
      IcebergMeta.snapshotsDf(spark, path).createOrReplaceTempView(view)
      q(view)
    })
    val afterIf = IcebergFilesRe.replaceAllIn(afterIs, m => {
      val path = unmaskLit(unmask, m.group(1))
      val sidOpt = Option(m.group(2)).map(_.toLong)
      val view = foreignView("iceberg_files",
        s"$path#${sidOpt.getOrElse(-1L)}")
      IcebergMeta.filesDf(spark, path, snapshotAsOf = sidOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterIm = IcebergManifestsRe.replaceAllIn(afterIf, m => {
      val path = unmaskLit(unmask, m.group(1))
      val sidOpt = Option(m.group(2)).map(_.toLong)
      val view = foreignView("iceberg_manifests",
        s"$path#${sidOpt.getOrElse(-1L)}")
      IcebergMeta.manifestsDf(spark, path, snapshotAsOf = sidOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterDh = DeltaHistoryRe.replaceAllIn(afterIm, m => {
      val path = unmaskLit(unmask, m.group(1))
      val view = foreignView("delta_history", path)
      LakehouseTable.deltaHistoryDf(spark, path)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterDf = DeltaFilesRe.replaceAllIn(afterDh, m => {
      val path = unmaskLit(unmask, m.group(1))
      val vOpt = Option(m.group(2)).map(_.toLong)
      val view = foreignView("delta_files",
        s"$path#${vOpt.getOrElse(-1L)}")
      LakehouseTable.deltaFilesDf(spark, path, versionAsOf = vOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterIr = IcebergRefsRe.replaceAllIn(afterDf, m => {
      val path = unmaskLit(unmask, m.group(1))
      val view = foreignView("iceberg_refs", path)
      IcebergMeta.refsDf(spark, path).createOrReplaceTempView(view)
      q(view)
    })
    val afterIp = IcebergPartitionsRe.replaceAllIn(afterIr, m => {
      val path = unmaskLit(unmask, m.group(1))
      val sidOpt = Option(m.group(2)).map(_.toLong)
      val view = foreignView("iceberg_partitions",
        s"$path#${sidOpt.getOrElse(-1L)}")
      IcebergMeta.partitionsDf(spark, path, snapshotAsOf = sidOpt)
        .createOrReplaceTempView(view)
      q(view)
    })
    val afterDd = DeltaDetailRe.replaceAllIn(afterIp, m => {
      val path = unmaskLit(unmask, m.group(1))
      val view = foreignView("delta_detail", path)
      LakehouseTable.deltaDetailDf(spark, path)
        .createOrReplaceTempView(view)
      q(view)
    })
    unmask(afterDd)
  }
}

/** ParserInterface wrapper injected by [[graft.GraftExtensions]]: graft
  * statements become command plans; everything else (after graft
  * time-travel rewriting) delegates to Spark's parser. */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    GraftCatalog.bootstrap(spark)
    GraftSqlStatements.command(sqlText).getOrElse(
      delegate.parsePlan(GraftSqlStatements.rewriteTimeTravel(spark, sqlText)))
  }

  override def parseQuery(sqlText: String): LogicalPlan = {
    GraftCatalog.bootstrap(spark)
    delegate.parseQuery(GraftSqlStatements.rewriteTimeTravel(spark, sqlText))
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
