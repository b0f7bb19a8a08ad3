package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MERGE-ON-READ row-level DML — the counterpart of [[RowLevelOps]]'
  * copy-on-write path, and the half every lakehouse format ships for
  * delete-heavy tables (Iceberg position/equality deletes, Delta
  * deletion vectors): a stock `DELETE FROM` statement costs
  * O(|matched rows|), never O(table), because nothing rewrites — the
  * matched row ids land in a tiny DELETE SIDECAR file and every
  * subsequent read merges the sidecars back out of the scan.
  *
  * How the stock planner drives it: the table's row-level operation for
  * DELETE implements [[SupportsDelta]], so Spark's own
  * `RewriteDeleteFromTable` plans the statement as `WriteDelta` (not
  * group-based `ReplaceData`): the rewrite scan reads ONLY rows
  * matching the predicate (the condition pushes down to parquet through
  * this scan builder like any data filter), and the delta writer
  * receives one (operation=DELETE, rowId) pair per matched row — no
  * carry-over rows are ever read, computed, or written. UPDATE and
  * MERGE each carry their own opt-in (the per-command mode split
  * lakehouse formats expose as `write.delete.mode` /
  * `write.update.mode` / `write.merge.mode`): delta-based when set to
  * merge-on-read — old images become sidecar entries, new images land
  * in fresh files, O(delta) — otherwise copy-on-write over the MERGED
  * read, landing a clean generation that MATERIALIZES the outstanding
  * delete vectors.
  *
  * The sidecar (`_deletes/delete-*.keys` under the generation dir — an
  * underscore path, so the stock parquet file index never lists it):
  * a header naming the data files it APPLIES TO (the generation's file
  * set at delete time) and one encoded row-id key per line. The
  * applies-to set is what makes delete-then-reinsert correct — the
  * Iceberg sequence-number rule expressed as an explicit file list: a
  * key deleted today hides rows in files that existed today, never rows
  * a later INSERT lands in fresh files. At 100 TB the applies-to set is
  * a per-file delete index (roaring bitmaps keyed by file); the
  * explicit name list is the same contract at catalog-test scale, and
  * the sidecar volume readers pay is bounded by COMPACTION
  * ([[Mor.sidecarBytes]] is the page-on signal), which rewrites merged
  * data and clears `_deletes`.
  *
  * Publish protocol is the catalog's one atomic primitive, unchanged: a
  * DELETE lands a FRESH generation dir holding hard links of every data
  * file and prior sidecar (same inodes — byte-identical, zero data
  * movement) plus the new sidecar, then swaps the table location with
  * the same OCC as the COW path. Crash mid-delta: the half-written dir
  * carries the `_graftwriting` marker ([[WritableSnapshotCatalog
  * .gcGenerations]] leaves it alone until the rewrite grace window) and
  * the table still points at the old generation — nothing published.
  *
  * Read-path cost model (the honest trade): a table with ZERO
  * outstanding deletes serves the UNWRAPPED stock parquet scan
  * (vectorized, filter + aggregate pushdown — [[MorScanBuilder.build]]
  * returns the delegate verbatim); ANY outstanding delete puts the
  * WHOLE scan on the row-based path (Spark requires every partition of
  * one scan to agree on columnar vs row), with file-level partition
  * splitting so CLEAN files at least skip the per-row hash-set probe.
  * Compaction restores the stock vectorized scan everywhere. Like the
  * rest of the snapshot catalog, file ops use
  * local-posix java.io (the writeLocal discipline); a DFS deployment
  * swaps these for the Hadoop FileSystem API.
  *
  * Reference basis: the provisioned cluster's SQL surface over the
  * shared metastore (yc-data-proc-metadata-import
  * metastore-import.tf:196, README_en.md:3) — `DELETE FROM` typed at
  * that prompt should not rewrite a 100 TB table.
  */
private[catalog] object Mor {
  /** Table property selecting the DELETE execution mode:
    * `copy-on-write` (default) or `merge-on-read`. */
  val DeleteModeProp = "graft.delete.mode"
  val ModeMergeOnRead = "merge-on-read"
  val ModeCopyOnWrite = "copy-on-write"

  /** Table property naming the row-id column merge-on-read deletes key
    * on (int/bigint/string; must uniquely identify a row, the
    * equality-delete contract). */
  val RowIdProp = "graft.row.id"

  /** Table property selecting the MERGE execution mode (independent of
    * the DELETE mode — the per-command split lakehouse formats expose):
    * `copy-on-write` (default) or `merge-on-read`, where matched
    * updates/deletes become sidecar entries and inserted/updated rows
    * land in FRESH data files — O(delta), no carry-over rows touched. */
  val MergeModeProp = "graft.merge.mode"

  /** Table property selecting the UPDATE execution mode (the third leg
    * of the per-command split — Iceberg's `write.update.mode`):
    * `copy-on-write` (default: the UPDATE rewrites the table and
    * materializes outstanding delete vectors) or `merge-on-read`: the
    * statement plans delta-based, old images hide via sidecar entries,
    * new images land in fresh per-task files — O(delta), the last
    * O(table) DML statement gone. Spark's own rewrite preserves the
    * ORIGINAL row-id values when the SET list reassigns the row-id
    * column itself (buildOriginalRowIdValues), so even a key-moving
    * UPDATE deletes the old key and inserts the new one. */
  val UpdateModeProp = "graft.update.mode"

  /** Sidecar directory under the generation dir (underscore-prefixed:
    * hidden from the stock parquet file index). */
  val DeletesDirName = "_deletes"

  /** Commit-time CDC directory under the generation dir: for every
    * sidecar a delta statement lands, a parquet file of the SAME rows'
    * full PRE-IMAGES (plus the data file each came from) lands here at
    * the same publish — so a change-feed read between two revisions is
    * O(delta) end to end, never a `VERSION AS OF` key-join against the
    * table. The capture costs nothing extra at write time: the delta
    * rewrite scan already read the matched rows; the [[CdcCol]]
    * metadata column just carries them through to the writer. */
  val CdcDirName = "_cdc"

  /** Metadata column carrying each matched row's CDC provenance
    * through a delta rewrite: struct(file = the data file serving the
    * row, row = the full pre-image). Requested (and served) only by
    * delta row-level operations — plain reads never pay for it. */
  val CdcCol = "_cdc"

  /** Column holding the source data file in CDC parquet files; the
    * feed uses it to keep only pre-images of rows that existed at the
    * range start (files of A), dropping mid-range churn. */
  val CdcSrcFile = "_src_file"

  def cdcStructType(tableSchema: StructType): StructType =
    StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("row", tableSchema, nullable = false)))

  def cdcSchema(tableSchema: StructType): StructType =
    StructType(StructField(CdcSrcFile, StringType, nullable = true) +:
      tableSchema.fields)

  /** CDC companion file of one sidecar (same base name — the pairing
    * is how the feed detects CDC coverage of a revision range). */
  def cdcFileName(sidecarName: String): String =
    sidecarName + ".cdc.parquet"

  def normLoc(loc: String): String =
    loc.stripPrefix("file:").stripSuffix("/")

  /** One key per line; strings URL-encoded so any value stays
    * one-line-safe. The reader-side comparison forms are what
    * InternalRow.get returns (boxed Long/Integer, UTF8String). */
  def encodeKey(v: Any): String = v match {
    case u: UTF8String => java.net.URLEncoder.encode(u.toString, "UTF-8")
    case other => String.valueOf(other)
  }

  /** Fixed key-line prefix. Every key line carries it, so a STRING row
    * id equal to the EMPTY string still round-trips: without the
    * prefix its line would be blank and indistinguishable from
    * padding, silently un-deletable. */
  val KeyLinePrefix = "k:"

  def decodeKey(s: String, dt: DataType): Any = dt match {
    case LongType => java.lang.Long.valueOf(s)
    case IntegerType => java.lang.Integer.valueOf(s)
    case StringType =>
      UTF8String.fromString(java.net.URLDecoder.decode(s, "UTF-8"))
    case other => throw new IllegalArgumentException(
      s"merge-on-read row id type $other is not servable")
  }

  def fileName(
      f: org.apache.spark.sql.execution.datasources.PartitionedFile)
      : String =
    new org.apache.hadoop.fs.Path(f.filePath.toString).getName

  /** Stable identity of a data file across hard-linked generations:
    * the bare name for root files, `<col>=<val>/<name>` for files in a
    * hive partition dir — partition dir names are generation-stable,
    * the generation root's is not. Sidecar applies-to sets use exactly
    * this form, so per-partition sidecars apply only to their own
    * partition's files even when names repeat across partitions. */
  def fileId(
      f: org.apache.spark.sql.execution.datasources.PartitionedFile)
      : String = {
    val p = new org.apache.hadoop.fs.Path(f.filePath.toString)
    val parent = p.getParent
    if (parent != null && parent.getName.contains("="))
      s"${parent.getName}/${p.getName}"
    else p.getName
  }

  /** Load every sidecar of the current generation — driver-side KiB
    * (outstanding deletes between compactions; compaction is the
    * bound). Unpartitioned sidecars live under `<root>/_deletes`;
    * partitioned ones under `<root>/<col>=<val>/_deletes` with their
    * applies-to entries qualified by the partition dir (the [[fileId]]
    * form). Sorted file order for determinism. */
  def loadSidecars(loc: String): Seq[DeleteSidecar] = {
    val root = new java.io.File(normLoc(loc))
    def loadDir(dir: java.io.File, prefix: String): Seq[DeleteSidecar] = {
      val files = Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".keys"))
        .sortBy(_.getName)
      files.map { f =>
        import scala.jdk.CollectionConverters._
        val lines = java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq
        val (hdr, rest) = lines.span(_.startsWith("#applies-to:"))
        DeleteSidecar(prefix + f.getName,
          hdr.map(l => prefix + java.net.URLDecoder
            .decode(l.stripPrefix("#applies-to:"), "UTF-8")).toSet,
          rest.filter(_.startsWith(KeyLinePrefix))
            .map(_.stripPrefix(KeyLinePrefix)).toArray)
      }
    }
    val rootCars = loadDir(new java.io.File(root, DeletesDirName), "")
    val partCars = Option(root.listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.contains("="))
      .sortBy(_.getName)
      .flatMap(d => loadDir(new java.io.File(d, DeletesDirName),
        d.getName + "/"))
    (rootCars ++ partCars)
      .filter(s => s.applies.nonEmpty && s.keys.nonEmpty)
  }

  /** Outstanding sidecar volume — the compaction page-on signal —
    * summed over the root and every hive partition dir. */
  def sidecarBytes(loc: String): Long = {
    val root = new java.io.File(normLoc(loc))
    def bytes(dir: java.io.File): Long =
      Option(dir.listFiles()).toSeq.flatten.filter(_.isFile)
        .map(_.length).sum
    bytes(new java.io.File(root, DeletesDirName)) +
      Option(root.listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName.contains("="))
        .map(d => bytes(new java.io.File(d, DeletesDirName))).sum
  }

  /** Hard-link every visible file of `src` into `dst` (same inodes —
    * byte-identical, zero data movement); honest copy on filesystems
    * without links. The COW carry-over primitive shared with
    * [[PartitionRoutedCowWrite]]. */
  def linkAll(src: java.io.File, dst: java.io.File): Unit = {
    Option(src.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .foreach(f => linkOne(f, new java.io.File(dst, f.getName)))
  }

  /** Hard-link one file; honest copy ONLY on filesystems without
    * links. A name collision rethrows loudly — falling through to a
    * REPLACE_EXISTING copy would silently clobber a just-committed
    * fresh file with the old generation's bytes. */
  def linkOne(src: java.io.File, dst: java.io.File): Unit = {
    try java.nio.file.Files.createLink(dst.toPath, src.toPath): Unit
    catch {
      case e: java.nio.file.FileAlreadyExistsException => throw e
      case _: UnsupportedOperationException |
           _: java.nio.file.FileSystemException =>
        java.nio.file.Files.copy(src.toPath, dst.toPath): Unit
    }
  }

  /** The property keys [[validateTableProps]] guards. */
  def dmlProps(key: String): Boolean =
    key == DeleteModeProp || key == MergeModeProp ||
      key == UpdateModeProp || key == RowIdProp

  /** Refuse an ALTER that would break the SIDE CAR read path while the
    * current generation still has outstanding `_deletes`: disabling
    * merge-on-read (set back to copy-on-write, or UNSET) silently
    * resurrects every sidecar-hidden row on the next read; re-pointing
    * [[RowIdProp]] at a different column probes stored keys against
    * the wrong values. Both are fine on a clean generation —
    * compaction clears the sidecars, so the error names that way out.
    * [[validateTableProps]] checks VALUES; this checks table STATE. */
  def guardLiveSidecars(t: TableInfo, prop: String,
      newValue: Option[String]): Unit = {
    val wasMor = t.properties.exists(p =>
      p.key == DeleteModeProp && p.value == ModeMergeOnRead)
    if (!wasMor) return
    val breaksReadPath = prop match {
      case DeleteModeProp => !newValue.contains(ModeMergeOnRead)
      case RowIdProp =>
        newValue != t.properties.find(_.key == RowIdProp).map(_.value)
      case _ => false // merge/update-mode flips don't touch the read path
    }
    if (breaksReadPath) {
      val bytes = sidecarBytes(t.location)
      require(bytes == 0L,
        s"cannot ${newValue.fold("UNSET")(v => s"set $prop=$v")} on " +
          s"${t.db}.${t.name}: $bytes bytes of delete sidecars are " +
          "outstanding on the current generation and the change would " +
          "resurrect the hidden rows (or probe stored keys against " +
          "the wrong column). Compact first — rewrite the merged rows " +
          "to a fresh generation and SET LOCATION — then retry")
    }
  }

  /** Validate the graft.* DML-mode properties against the declared
    * columns — called BEFORE a CREATE persists (a refused table must
    * not register) and again at load (ALTER-set properties). */
  def validateTableProps(db: String, name: String,
      props: Seq[PropKV], cols: Seq[ColumnInfo]): Unit = {
    val mode = props.find(_.key == DeleteModeProp).map(_.value)
    require(mode.forall(m =>
        m == ModeCopyOnWrite || m == ModeMergeOnRead),
      s"unknown $DeleteModeProp '${mode.get}' on $db.$name — use " +
        s"$ModeCopyOnWrite or $ModeMergeOnRead")
    val mergeMode = props.find(_.key == MergeModeProp).map(_.value)
    require(mergeMode.forall(m =>
        m == ModeCopyOnWrite || m == ModeMergeOnRead),
      s"unknown $MergeModeProp '${mergeMode.get}' on $db.$name")
    val updateMode = props.find(_.key == UpdateModeProp).map(_.value)
    require(updateMode.forall(m =>
        m == ModeCopyOnWrite || m == ModeMergeOnRead),
      s"unknown $UpdateModeProp '${updateMode.get}' on $db.$name")
    if (mode.contains(ModeMergeOnRead)) {
      val rid = props.find(_.key == RowIdProp).map(_.value)
        .getOrElse(throw new IllegalArgumentException(
          s"table $db.$name sets $DeleteModeProp=$ModeMergeOnRead " +
            s"but not $RowIdProp — merge-on-read deletes need a " +
            "declared row-id column"))
      val ci = cols.find(_.name == rid)
        .getOrElse(throw new IllegalArgumentException(
          s"$RowIdProp=$rid is not a column of $db.$name"))
      require(Set("int", "bigint", "string")(ci.dataType.toLowerCase),
        s"$RowIdProp=$rid has type ${ci.dataType} — merge-on-read " +
          "row ids must be INT, BIGINT, or STRING")
      require(!ci.nullable,
        s"$RowIdProp=$rid must be declared NOT NULL — merge-on-read " +
          "deletes key on it")
      val partCols = cols.filter(_.isPartition)
      if (partCols.nonEmpty) {
        // partitioned MOR: DELETE is delta-based with per-partition
        // sidecars; UPDATE/MERGE stay partition-scoped COW (their
        // delta forms would need partition-routed fresh files — the
        // COW path already tracks touched-partition volume)
        require(!ci.isPartition,
          s"$RowIdProp=$rid is the partition column of $db.$name — " +
            "the row id must be a data column (partition values are " +
            "not stored in data files)")
        require(partCols.length == 1 && Set("string", "int", "bigint")(
            partCols.head.dataType.toLowerCase),
          s"merge-on-read on partitioned $db.$name needs a single " +
            "STRING/INT/BIGINT partition column (the partition-scoped " +
            s"DML class); got ${partCols.map(c =>
              s"${c.name} ${c.dataType}").mkString(", ")}")
        require(!mergeMode.contains(ModeMergeOnRead) &&
            !updateMode.contains(ModeMergeOnRead),
          s"$MergeModeProp/$UpdateModeProp=$ModeMergeOnRead are not " +
            s"supported on partitioned $db.$name — UPDATE/MERGE run " +
            "partition-scoped copy-on-write there; DELETE alone is " +
            "delta-based")
      }
    } else {
      require(!mergeMode.contains(ModeMergeOnRead),
        s"$MergeModeProp=$ModeMergeOnRead on $db.$name requires " +
          s"$DeleteModeProp=$ModeMergeOnRead too (the sidecar read " +
          "path)")
      require(!updateMode.contains(ModeMergeOnRead),
        s"$UpdateModeProp=$ModeMergeOnRead on $db.$name requires " +
          s"$DeleteModeProp=$ModeMergeOnRead too (the sidecar read " +
          "path)")
    }
  }
}

/** One delete sidecar: the data files it applies to (the generation's
  * file set at delete time) and the encoded row-id keys hidden from
  * them. Shipped to executors whole; decode happens once per reader. */
private[catalog] case class DeleteSidecar(name: String,
    applies: Set[String], keys: Array[String])

/** One table's row in the auto-compaction decision report: the
  * measured read-tax signals, the threshold verdict, and — when the
  * compaction actually ran — the before/after read-path class. */
private[graft] case class AutoCompactDecision(table: String,
    sidecarCount: Int, sidecarBytes: Long, dataBytes: Long,
    compacted: Boolean, sidecarsAfter: Int,
    scanBefore: String, scanAfter: String)

/** MOR read-tax lifecycle policy — the consumer of
  * [[Mor.sidecarBytes]], the signal the sidecar design documents as
  * "the compaction page-on": outstanding delete sidecars are the price
  * of O(delta) DML, and every reader pays the row-path + probe tax
  * until a compaction rewrites the merged rows into a clean
  * generation. [[autoCompact]] walks the catalog's merge-on-read
  * tables, measures (sidecar count, sidecar bytes, data bytes) against
  * the DECLARED thresholds, and compacts exactly the tables that page
  * on — the same threshold→decision→action shape as the IVF index
  * drift monitor (`sim_ann_ivf_append`'s retrain flag). The compaction
  * itself is the catalog's one maintenance primitive: merged rows →
  * fresh `_rl` generation (gc-recognized naming) → atomic SET LOCATION
  * swap; a reader holding the old generation keeps a consistent file
  * set. At 100 TB the policy runs table-parallel off the snapshot
  * metadata (KiB per table — no data is read to DECIDE; only flagged
  * tables pay the rewrite, which is the point of the thresholds). */
private[graft] object MorMaintenance {
  /** Scan class a table currently serves: "mor" (sidecar-merging row
    * path) or "stock" (unwrapped vectorized parquet). */
  private def scanClass(s: SparkSession, fqn: String): String = {
    val scans = s.table(fqn).queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan
    }
    if (scans.exists(_.isInstanceOf[MorScan])) "mor" else "stock"
  }

  /** Decide and act for every merge-on-read table of the snapshot
    * catalog registered as `catName` over `snapDir`. A table compacts
    * when EITHER declared threshold pages on: outstanding sidecar
    * count >= maxSidecars, or sidecar bytes > maxSidecarBytes. */
  def autoCompact(s: SparkSession, catName: String, snapDir: String,
      maxSidecars: Int, maxSidecarBytes: Long): Seq[AutoCompactDecision] = {
    val head = new java.io.File(snapDir, "HEAD")
    val rev = new String(java.nio.file.Files.readAllBytes(head.toPath))
      .trim.split("\\s+")(0).toInt
    val snap = CatalogTransfer.readLocal(s"$snapDir/revs/$rev")
    val morTables = snap.tables.filter(t => t.properties.exists(p =>
      p.key == Mor.DeleteModeProp && p.value == Mor.ModeMergeOnRead))
    morTables.sortBy(t => (t.db, t.name)).map { t =>
      val loc = Mor.normLoc(t.location)
      val sidecars = Mor.loadSidecars(loc)
      val scBytes = Mor.sidecarBytes(loc)
      val dataBytes = Option(new java.io.File(loc).listFiles()).toSeq
        .flatten
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
        .map(_.length).sum
      val fqn = s"$catName.${t.db}.${t.name}"
      val before = scanClass(s, fqn)
      val fire = sidecars.length >= maxSidecars ||
        scBytes > maxSidecarBytes
      val newLoc =
        if (fire) {
          // the compaction: merged rows -> clean generation, atomic swap
          val gen2 =
            loc + s"_rl${java.util.UUID.randomUUID.toString.take(8)}"
          s.table(fqn).write.parquet(gen2)
          s.sql(s"ALTER TABLE $fqn SET LOCATION '$gen2'")
          gen2
        } else loc
      val after = scanClass(s, fqn)
      AutoCompactDecision(t.name, sidecars.length, scBytes, dataBytes,
        fire, Mor.loadSidecars(newLoc).length, before, after)
    }
  }
}

/** CHANGE DATA FEED between two generations of a merge-on-read table —
  * the CDC read the MOR artifacts give away: the range's NEW sidecars
  * name every key that disappeared (deletes and updated-away images),
  * and its FRESH data files hold every row that appeared (inserts and
  * updated images):
  *  - post-images read the fresh files DIRECTLY — O(delta) — with
  *    per-(file, key) hiding for keys a later in-range sidecar removed
  *    from a fresh file (insert-then-delete nets out; the `_metadata`
  *    file-path column keys the hiding, so a re-insert after an
  *    in-range delete stays live);
  *  - pre-images read the range's COMMIT-TIME CDC FILES — the `_cdc/`
  *    parquet each delta statement lands next to its sidecar, holding
  *    the matched rows' full pre-images plus their source data file.
  *    Filtering to pre-images whose source file existed at A keeps
  *    exactly the A-state image of every key hidden in-range (later
  *    re-image churn comes from fresh files and drops out), so the
  *    pre-image leg is O(delta) too — no table-proportional term
  *    remains. For ranges whose statements predate CDC capture (some
  *    new sidecar lacks its CDC companion), the feed falls back to the
  *    key-join against the caller-provided state-A relation (serve it
  *    via `VERSION AS OF` time travel) — correct, but table-reading.
  * The feed is the NET range diff: a key touched multiple times
  * in-range emits its A-vs-B classification (delete / insert /
  * update_preimage+update_postimage), not per-statement events. At
  * 100 TB the driver-side file-set metadata (names at A and B) is the
  * same KiB-per-generation listing every other catalog op reads. */
private[graft] object MorChangeFeed {
  /** True iff every sidecar new in (locA, locB] carries its CDC
    * companion — i.e. [[between]] will take the O(delta) CDC path. */
  def cdcCovered(locA: String, locB: String): Boolean = {
    val oldSidecars = sidecarNames(locA)
    val cdcDir = new java.io.File(Mor.normLoc(locB), Mor.CdcDirName)
    Mor.loadSidecars(locB)
      .filterNot(sc => oldSidecars.contains(sc.name))
      .forall(sc => new java.io.File(cdcDir,
        Mor.cdcFileName(sc.name)).isFile)
  }

  private def sidecarNames(loc: String): Set[String] =
    Option(new java.io.File(Mor.normLoc(loc), Mor.DeletesDirName)
      .listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".keys"))
      .map(_.getName).toSet

  def between(s: SparkSession, stateA: org.apache.spark.sql.DataFrame,
      locA: String, locB: String, keyName: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def dataFiles(loc: String): Set[String] =
      Option(new java.io.File(Mor.normLoc(loc)).listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getName).toSet
    val filesA = dataFiles(locA)
    val freshNames = (dataFiles(locB) -- filesA).toSeq.sorted
    val oldSidecars = sidecarNames(locA)
    val newSidecars = Mor.loadSidecars(locB)
      .filterNot(sc => oldSidecars.contains(sc.name))
    import s.implicits._
    // sidecar keys are stored URL-ENCODED; the joins below compare
    // against cast-to-string RAW values, so decode first (identity
    // for int/bigint; a string key like "a b" rides as "a+b" on disk)
    val keyDt = stateA.schema(keyName).dataType
    def raw(k: String): String = keyDt match {
      case org.apache.spark.sql.types.StringType =>
        java.net.URLDecoder.decode(k, "UTF-8")
      case _ => k
    }
    // range-deleted keys (string form — the joins below cast; delta-
    // sized, so the lost pushdown costs nothing)
    val deletedKeys = newSidecars.flatMap(_.keys.map(raw)).distinct
      .toDS().toDF("_k")
    // fresh rows with per-(file, key) hiding
    val freshRows =
      if (freshNames.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[
          org.apache.spark.sql.Row], stateA.schema)
          .withColumn("_fname", lit(null: String))
      else
        s.read.parquet(freshNames.map(n =>
            s"${Mor.normLoc(locB)}/$n"): _*)
          .withColumn("_fname",
            element_at(split(col("_metadata.file_path"), "/"), -1))
          .drop("_metadata")
    val hiddenPairs = newSidecars
      .flatMap(sc => sc.applies.intersect(freshNames.toSet)
        .flatMap(f => sc.keys.map(k => (f, raw(k)))))
      .distinct.toDS().toDF("_fname", "_k")
    val keyStr = col(keyName).cast("string")
    val live = freshRows.withColumn("_k", keyStr)
      .join(hiddenPairs, Seq("_fname", "_k"), "left_anti")
    // pre-images of every key that existed at A and was hidden
    // in-range, WITH the `_k` join column; CDC path when covered
    val pre0: org.apache.spark.sql.DataFrame =
      if (newSidecars.isEmpty)
        stateA.withColumn("_k", keyStr).limit(0)
      else if (cdcCovered(locA, locB)) {
        val cdcDir = s"${Mor.normLoc(locB)}/${Mor.CdcDirName}"
        val paths = newSidecars.map(sc =>
          s"$cdcDir/${Mor.cdcFileName(sc.name)}")
        // keep pre-images whose source file existed at A: exactly the
        // A-state image of each key (mid-range re-image churn lives in
        // fresh files and drops out); delta-sized read, no state join
        s.read.parquet(paths: _*)
          .where(col(Mor.CdcSrcFile).isInCollection(filesA.toSeq))
          .drop(Mor.CdcSrcFile)
          .withColumn("_k", keyStr)
      } else
        // pre-CDC revisions: the documented fallback — key-join the
        // range's deleted keys against the caller-provided A state
        stateA.withColumn("_k", keyStr).join(deletedKeys, "_k")
    val pre = pre0
      .join(live.select(col("_k").as("_lk")).distinct(),
        col("_k") === col("_lk"), "left")
      .withColumn("_op",
        when(col("_lk").isNull, lit("delete"))
          .otherwise(lit("update_preimage")))
      .drop("_k", "_lk")
    // fresh-row classification keys on the A-existing pre-image set
    // (not on raw sidecar keys: a key inserted AND deleted mid-range
    // then re-inserted never existed at A — its net class is insert)
    val hadPre = pre0.select(col("_k").as("_pk")).distinct()
    val inserted = live
      .join(hadPre, col("_k") === col("_pk"), "left")
      .withColumn("_op",
        when(col("_pk").isNull, lit("insert"))
          .otherwise(lit("update_postimage")))
      .drop("_fname", "_k", "_pk")
    val cols = col("_op").as("op") +:
      stateA.schema.fieldNames.toSeq.map(col)
    pre.select(cols: _*).unionByName(inserted.select(cols: _*))
  }
}

private[catalog] object MorReadTable {
  /** Wrap ANY read-side serving of a merge-on-read table so its scans
    * merge the sidecars — the read-only catalog attach and time travel
    * go through here; the writable catalog serves the full
    * [[MorRowLevelTable]] / [[MorPartitionedTable]]. No-op for tables
    * not opted in. Partitioned tables merge their per-partition
    * sidecars through the same scan (file identity is the
    * partition-qualified [[Mor.fileId]]). */
  def maybeWrap(base: Table, ti: TableInfo): Table = {
    val mor = ti.properties.exists(p =>
      p.key == Mor.DeleteModeProp && p.value == Mor.ModeMergeOnRead)
    if (!mor) base
    else {
      val rid = ti.properties.find(_.key == Mor.RowIdProp).map(_.value)
        .getOrElse(throw new IllegalArgumentException(
          s"table ${ti.db}.${ti.name} sets ${Mor.DeleteModeProp}=" +
            s"${Mor.ModeMergeOnRead} but not ${Mor.RowIdProp}"))
      val f = base.schema().fields.find(_.name == rid)
        .getOrElse(throw new IllegalArgumentException(
          s"${Mor.RowIdProp}=$rid is not a column of " +
            s"${ti.db}.${ti.name}"))
      new MorReadTable(base, ti, f.copy(nullable = false))
    }
  }
}

/** Read-only merge-on-read serving: scans merge the sidecars of the
  * generation this TableInfo points at (time travel thus applies the
  * HISTORICAL generation's sidecars). Zero outstanding sidecars costs
  * nothing — the builder hands back the delegate scan verbatim. */
private[catalog] class MorReadTable(inner: Table, ti: TableInfo,
    keyField: StructField) extends Table with SupportsRead {
  override def name(): String = inner.name()
  override def schema(): StructType =
    StructType(inner.schema().fields.map(f =>
      if (f.name == keyField.name) f.copy(nullable = false) else f))
  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    schema().fields.map(f =>
      org.apache.spark.sql.connector.catalog.Column
        .create(f.name, f.dataType, f.nullable))
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()
  override def properties(): util.Map[String, String] =
    inner.properties()
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    inner.capabilities()
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MorScanBuilder(
      inner.asInstanceOf[SupportsRead].newScanBuilder(options),
      keyField, Mor.loadSidecars(ti.location))
}

/** Serves an unpartitioned parquet table whose DELETE mode is
  * merge-on-read. Plain reads merge outstanding sidecars; DELETE plans
  * delta-based (zero data rewrite); UPDATE and MERGE each follow their
  * own per-command mode — delta-based when opted in, otherwise the COW
  * path over the merged read, materializing the deletes. TRUNCATE is
  * always a COW generation swap. */
private[catalog] class MorRowLevelTable(inner: Table,
    cat: WritableSnapshotCatalog, ti: TableInfo, keyField: StructField,
    mergeMor: Boolean, updateMor: Boolean)
  extends RowLevelCowTable(inner, cat, ti) {

  // fresh per scan/statement: the sidecar set is generation state
  private def sidecars: Seq[DeleteSidecar] = Mor.loadSidecars(ti.location)

  // the file table relaxes every column to nullable; the catalog's
  // declared NOT NULL on the row id is re-asserted here (Spark's
  // delta rewrite refuses nullable row ids — NULLABLE_ROW_ID_ATTRIBUTES)
  override def schema(): StructType =
    StructType(inner.schema().fields.map(f =>
      if (f.name == keyField.name) f.copy(nullable = false) else f))

  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    schema().fields.map(f =>
      org.apache.spark.sql.connector.catalog.Column
        .create(f.name, f.dataType, f.nullable))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MorScanBuilder(
      inner.asInstanceOf[SupportsRead].newScanBuilder(options),
      keyField, sidecars)

  // next to the COW path's `_gen`: the CDC provenance struct the delta
  // operations require (served only by their own scans — see CdcScan)
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    super.metadataColumns() :+
      (new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name: String = Mor.CdcCol
        override def dataType: org.apache.spark.sql.types.DataType =
          Mor.cdcStructType(schema())
        override def isNullable: Boolean = true
        override def comment: String =
          "CDC provenance of a delta-rewritten row: (source data " +
            "file, full pre-image)"
      })

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () =>
      if (info.command == RowLevelOperation.Command.DELETE ||
          (info.command == RowLevelOperation.Command.MERGE && mergeMor) ||
          (info.command == RowLevelOperation.Command.UPDATE && updateMor))
        new MorDeltaOperation(this, cat, ti, keyField, info)
      else
        // a command without its merge-on-read opt-in stays
        // copy-on-write but reads through `this` (outstanding deletes
        // apply to the rewrite scan — a deleted row must never
        // resurrect), and its fresh generation carries no _deletes: a
        // COW statement materializes the delete vectors
        new GroupCowRowLevelOperation(this, cat, ti, info)
}

/** The delta-based operation: [[SupportsDelta]] routes Spark's own
  * `RewriteDeleteFromTable` / `RewriteMergeIntoTable` to a `WriteDelta`
  * plan — the scan reads ONLY rows the statement touches (DELETE's
  * condition pushes down like any data filter; MERGE reads the join's
  * matched side, never carry-over rows), and the writer lands row-id
  * sidecar entries for deletes/updated-away rows plus FRESH data files
  * for inserted/updated rows. O(delta) end-to-end. */
private[catalog] class MorDeltaOperation(table: MorRowLevelTable,
    cat: WritableSnapshotCatalog, ti: TableInfo, keyField: StructField,
    info: RowLevelOperationInfo)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command

  override def description(): String =
    s"graft-mor-${info.command} ${ti.db}.${ti.name}"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(keyField.name))

  // updates arrive as update(meta, id, row) and the writer lands them
  // as sidecar-delete + fresh-file insert itself — no split needed
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  // each matched row carries its CDC provenance (source file + full
  // pre-image) to the writer, which lands pre-images as commit-time
  // CDC files — the rewrite scan read these rows anyway, so the feed's
  // O(delta) pre-image leg costs the statement nothing extra
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(Mor.CdcCol))

  // the rewrite scan is the table's merged read: already-hidden rows
  // are never re-matched, so a sidecar records each key at most once
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(table.newScanBuilder(options), table.schema())

  override def newWriteBuilder(wInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new MorDeltaWrite(cat, ti, keyField, table.schema())
    }
}

/** Scan builder serving the [[Mor.CdcCol]] provenance struct on top of
  * the MERGED scan. When the planner requests it (delta rewrites
  * only), the delegate is pruned to the FULL table schema (the struct
  * carries the whole pre-image) while the scan's own output keeps
  * exactly the requested shape; filter pushdown forwards through, so
  * the delta scan still reads only matched row groups. */
private[catalog] class CdcScanBuilder(delegate: ScanBuilder,
    tableSchema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var cdcRequested = false
  private var requested: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    cdcRequested = requiredSchema.fieldNames.contains(Mor.CdcCol)
    if (cdcRequested) {
      require(requiredSchema.fieldNames.last == Mor.CdcCol,
        s"metadata column ${Mor.CdcCol} must be requested last, got " +
          requiredSchema.fieldNames.mkString(", "))
      requested = StructType(requiredSchema.fields.dropRight(1))
      delegate match {
        case p: SupportsPushDownRequiredColumns =>
          p.pruneColumns(tableSchema) // the struct needs every column
        case _ => ()
      }
    } else {
      requested = requiredSchema
      delegate match {
        case p: SupportsPushDownRequiredColumns =>
          p.pruneColumns(requiredSchema)
        case _ => ()
      }
    }
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan = {
    val ds = delegate.build()
    if (cdcRequested) new CdcScan(ds, tableSchema, requested) else ds
  }
}

/** Appends the per-row CDC provenance struct: file partitions are
  * split one-file-per-reader so the source file name is a per-reader
  * constant, and each emitted row carries (requested columns...,
  * struct(file, full pre-image)). Delta-scan only — its input is
  * already filtered to the statement's matched row groups. */
private[catalog] class CdcScan(delegate: Scan, tableSchema: StructType,
    requested: StructType) extends Scan {

  override def readSchema(): StructType =
    requested.add(Mor.CdcCol, Mor.cdcStructType(tableSchema),
      nullable = true)

  override def description(): String =
    s"graft-cdc-scan(${delegate.description()})"

  override def toBatch: Batch = new Batch {
    private val db = delegate.toBatch
    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.FilePartition
      db.planInputPartitions().flatMap {
        case fp: FilePartition =>
          fp.files.map(f => Array(f))
        case other => throw new IllegalStateException(
          "CDC scan expected a parquet FilePartition, got " +
            other.getClass.getName)
      }.zipWithIndex.map { case (fs, i) =>
        FilePartition(i, fs): InputPartition }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new CdcReaderFactory(db.createReaderFactory(), tableSchema,
        requested)
  }
}

private[catalog] class CdcReaderFactory(delegate: PartitionReaderFactory,
    tableSchema: StructType, requested: StructType)
  extends PartitionReaderFactory {

  private val idx = requested.fields.map(f =>
    tableSchema.fieldIndex(f.name))

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = p match {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        require(fp.files.length == 1,
          "CDC reader expects single-file partitions")
        Mor.fileName(fp.files.head)
      case other => throw new IllegalStateException(
        s"CDC reader got ${other.getClass.getName}")
    }
    val fileUtf8 = UTF8String.fromString(file)
    val dr = delegate.createReader(p)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = dr.next()
      override def get(): InternalRow = {
        // copy: the delegate reuses its row buffer, and the struct
        // must stay valid through the exec's downstream projections
        val r = dr.get().copy()
        val out = new Array[Any](idx.length + 1)
        var i = 0
        while (i < idx.length) {
          out(i) = r.get(idx(i), tableSchema(idx(i)).dataType)
          i += 1
        }
        out(idx.length) = InternalRow(fileUtf8, r)
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(out)
      }
      override def close(): Unit = dr.close()
    }
  }
}

/** Scan builder merging outstanding sidecars out of the delegate
  * parquet scan. Zero sidecars → the delegate scan VERBATIM (stock
  * vectorized path, nothing wrapped) with aggregate pushdown forwarded
  * — a freshly-compacted table keeps its parquet-metadata
  * COUNT/MIN/MAX. Otherwise the row-id column rides the projection
  * (appended if absent, dropped after the probe) and filter pushdown
  * still forwards — deleted-row filtering composes with any pushed
  * predicate conjunctively — but aggregate pushdown is REFUSED: a
  * parquet-metadata COUNT cannot see delete vectors. */
private[catalog] class MorScanBuilder(delegate: ScanBuilder,
    keyField: StructField, sidecars: Seq[DeleteSidecar])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var addedKey = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val withKey =
      if (sidecars.nonEmpty &&
          !requiredSchema.fieldNames.contains(keyField.name)) {
        addedKey = true
        requiredSchema.add(keyField)
      } else requiredSchema
    delegate match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(withKey)
      case _ => ()
    }
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushedFilters
      case _ => Array.empty
    }

  // aggregate pushdown forwards ONLY on a clean generation (the
  // builder knows the sidecar set at construction): a pushed COUNT
  // answered from parquet footers cannot see delete vectors, but a
  // just-compacted table must not pay for a mode it isn't using
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    sidecars.isEmpty && (delegate match {
      case a: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
        a.supportCompletePushDown(agg)
      case _ => false
    })

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    sidecars.isEmpty && (delegate match {
      case a: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
        a.pushAggregation(agg)
      case _ => false
    })

  override def build(): Scan = {
    val ds = delegate.build()
    if (sidecars.isEmpty) ds
    else new MorScan(ds, keyField, sidecars, addedKey)
  }
}

/** The merging scan: splits file partitions so files sharing a reader
  * always share the EXACT set of sidecars that apply to them. The
  * per-row probe may only test a row against sidecars applying to the
  * row's OWN file — a coarser (partition-level) union would hide a
  * key's fresh re-image whenever an old file in the same reader still
  * carries the hidden key (the multi-statement delta-UPDATE chain:
  * statement 2's sidecar makes statement 1's fresh files "affected",
  * but statement 1's keys must stay visible in them). CLEAN files
  * (empty signature) skip the probe entirely, though the whole scan
  * rides the row path while any sidecar is outstanding (see
  * [[MorReaderFactory.supportColumnarReads]]). */
private[catalog] class MorScan(delegate: Scan, keyField: StructField,
    sidecars: Seq[DeleteSidecar], dropKey: Boolean) extends Scan {

  override def readSchema(): StructType =
    if (dropKey) StructType(delegate.readSchema().fields.dropRight(1))
    else delegate.readSchema()

  override def description(): String =
    s"graft-mor-scan(${delegate.description()}, sidecars=${sidecars.length})"

  override def toBatch: Batch = new Batch {
    private val db = delegate.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.FilePartition
      // which sidecars hide keys in this file — the grouping signature
      def sig(name: String): Seq[String] =
        sidecars.filter(_.applies.contains(name)).map(_.name).sorted
      val out = scala.collection.mutable.ArrayBuffer
        .empty[Array[org.apache.spark.sql.execution.datasources.PartitionedFile]]
      db.planInputPartitions().foreach {
        case fp: FilePartition =>
          fp.files.groupBy(f => sig(Mor.fileId(f))).toSeq
            .sortBy(_._1.mkString(","))
            .foreach { case (_, fs) => out += fs }
        case other => throw new IllegalStateException(
          "merge-on-read scan expected a parquet FilePartition, got " +
            other.getClass.getName)
      }
      out.zipWithIndex.map { case (fs, i) => FilePartition(i, fs) }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new MorReaderFactory(db.createReaderFactory(),
        delegate.readSchema(), keyField, sidecars, dropKey)
  }
}

private[catalog] class MorReaderFactory(delegate: PartitionReaderFactory,
    fullSchema: StructType, keyField: StructField,
    sidecars: Seq[DeleteSidecar], dropKey: Boolean)
  extends PartitionReaderFactory {

  private val keyOrd = fullSchema.fieldIndex(keyField.name)

  private def partFileNames(p: InputPartition): Set[String] = p match {
    case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
      fp.files.iterator.map(Mor.fileId).toSet
    case _ => Set.empty
  }

  // [[MorScan.planInputPartitions]] guarantees every file of one
  // partition shares the SAME applicable-sidecar set, so this is the
  // exact per-file set — never a union across differently-affected
  // files (which would hide fresh re-images of a key still carried by
  // an older file in the same reader)
  private def hitSidecars(p: InputPartition): Seq[DeleteSidecar] = {
    val names = partFileNames(p)
    sidecars.filter(_.applies.exists(names))
  }

  // Spark requires every partition of one scan to agree on columnar
  // vs row (BatchScanExec refuses a mix), so outstanding sidecars put
  // the WHOLE scan on the row path — clean partitions still skip the
  // per-row probe below; compaction restores the vectorized scan
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val hit = hitSidecars(p)
    val dr = delegate.createReader(p)
    if (hit.isEmpty && !dropKey) return dr
    val deleted = new util.HashSet[Any]()
    hit.foreach(_.keys.foreach(k =>
      deleted.add(Mor.decodeKey(k, keyField.dataType)): Unit))
    val proj =
      if (dropKey)
        UnsafeProjection.create(fullSchema.fields.indices.dropRight(1)
          .map(i => BoundReference(i, fullSchema(i).dataType,
            fullSchema(i).nullable)))
      else null
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (dr.next()) {
          val r = dr.get()
          val live = deleted.isEmpty || r.isNullAt(keyOrd) ||
            !deleted.contains(r.get(keyOrd, keyField.dataType))
          if (live) {
            cur = if (proj != null) proj(r) else r
            return true
          }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = dr.close()
    }
  }
}

private[catalog] case class MorDeleteMsg(file: Option[String], keys: Long,
    dataFile: Option[String] = None,
    cdcFile: Option[String] = None) extends WriterCommitMessage

/** The delta write: tasks append encoded row-id keys to per-task
  * sidecar files under the fresh generation's `_deletes/` and land
  * inserted/updated rows in per-task FRESH parquet files at its root
  * (commit coordinator arbitrates attempts; task aborts delete their
  * own files); driver commit sweeps strays, hard-links the old
  * generation's data files and prior sidecars (same inodes — zero data
  * movement), and publishes through the catalog's atomic location swap
  * + OCC. Fresh files are never in any sidecar's applies-to set, so an
  * updated row is hidden from its OLD file and served from its new one
  * — exactly once. */
private[catalog] class MorDeltaWrite(cat: WritableSnapshotCatalog,
    ti: TableInfo, keyField: StructField,
    tableSchema: StructType) extends DeltaWrite {

  private val oldRoot = Mor.normLoc(ti.location)
  // the COW generation naming — gcGenerations recognizes and (once
  // unreferenced) reclaims these like any other generation dir
  private val newRoot =
    oldRoot + s"_rl${java.util.UUID.randomUUID.toString.take(8)}"

  override def description(): String =
    s"graft-mor-delta ${ti.db}.${ti.name} -> $newRoot"

  override def toBatch: DeltaBatchWrite = {
    // the applies-to set: data files of the generation this statement
    // was planned against (names are stable across hard-linked
    // generations; a later INSERT's fresh files are never listed, so
    // re-inserted keys stay visible — the sequence-number rule)
    val dataFiles = Option(new java.io.File(oldRoot).listFiles()).toSeq
      .flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.getName).sorted
    val delDir = new java.io.File(newRoot, Mor.DeletesDirName)
    delDir.mkdirs()
    // in-flight marker for gcGenerations (no _temporary on this path)
    val marker = new java.io.File(newRoot, "_graftwriting")
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray): Unit
    // fresh-data-file writer machinery (MERGE inserts/updates); the
    // stock parquet OutputWriterFactory, serialized to tasks
    val spark = SparkSession.active
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sessionState.newHadoopConf())
    job.setOutputKeyClass(classOf[Void])
    job.setOutputValueClass(classOf[InternalRow])
    val owf = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, tableSchema)
    // CDC pre-image files get their own factory (schema = _src_file +
    // the table's columns); prepared on a separate Job so the two
    // schemas don't clobber each other's conf
    val cdcJob = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sessionState.newHadoopConf())
    cdcJob.setOutputKeyClass(classOf[Void])
    cdcJob.setOutputValueClass(classOf[InternalRow])
    val cdcOwf = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat()
      .prepareWrite(spark, cdcJob, Map.empty, Mor.cdcSchema(tableSchema))
    val cdcDir = new java.io.File(newRoot, Mor.CdcDirName)
    cdcDir.mkdirs()
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      job.getConfiguration)
    val cdcSerConf = new org.apache.spark.util.SerializableConfiguration(
      cdcJob.getConfiguration)

    new DeltaBatchWrite {
      override def createBatchWriterFactory(
          pInfo: PhysicalWriteInfo): DeltaWriterFactory =
        new MorDeltaWriterFactory(newRoot, dataFiles,
          keyField.dataType, tableSchema, owf, serConf, cdcOwf,
          cdcSerConf)

      override def useCommitCoordinator(): Boolean = true

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val msgs = messages.collect { case m: MorDeleteMsg => m }
        val authorized = msgs.flatMap(_.file).toSet
        Option(delDir.listFiles()).toSeq.flatten.filter(_.isFile)
          .filterNot(f => authorized.contains(f.getName))
          .foreach(f => f.delete(): Unit)
        // sweep stray CDC files the same way (one per sidecar)
        val authorizedCdc = msgs.flatMap(_.cdcFile).toSet
        Option(cdcDir.listFiles()).toSeq.flatten.filter(_.isFile)
          .filterNot(f => authorizedCdc.contains(f.getName))
          .foreach(f => f.delete(): Unit)
        // sweep stray DATA files from attempts that died without abort
        val authorizedData = msgs.flatMap(_.dataFile).toSet
        Option(new java.io.File(newRoot).listFiles()).toSeq.flatten
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
          .filterNot(f => authorizedData.contains(f.getName))
          .foreach(f => f.delete(): Unit)
        Mor.linkAll(new java.io.File(oldRoot), new java.io.File(newRoot))
        val oldDel = new java.io.File(oldRoot, Mor.DeletesDirName)
        if (oldDel.isDirectory) {
          // prior sidecars carry forward untouched (underscore dirs
          // are skipped by linkAll's visible-file filter, so link
          // them explicitly dir-to-dir)
          Option(oldDel.listFiles()).toSeq.flatten
            .filter(f => f.isFile && f.getName.endsWith(".keys"))
            .foreach(f =>
              Mor.linkOne(f, new java.io.File(delDir, f.getName)))
        }
        // prior CDC files carry forward too — the feed reads the
        // range's NEW ones as the locB-minus-locA set difference
        val oldCdc = new java.io.File(oldRoot, Mor.CdcDirName)
        if (oldCdc.isDirectory) {
          Option(oldCdc.listFiles()).toSeq.flatten
            .filter(f => f.isFile && f.getName.endsWith(".parquet"))
            .foreach(f =>
              Mor.linkOne(f, new java.io.File(cdcDir, f.getName)))
        }
        marker.delete(): Unit
        cat.swapLocation(ti, newRoot) // the ONLY publish point (atomic)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(newRoot)): Unit
    }
  }
}

private[catalog] class MorDeltaWriterFactory(newRoot: String,
    appliesTo: Seq[String], keyType: DataType, schema: StructType,
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    cdcOwf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    cdcConf: org.apache.spark.util.SerializableConfiguration)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new MorDeltaWriter(newRoot, appliesTo, keyType, schema, owf,
      conf.value, cdcOwf, cdcConf.value, partitionId, taskId)
}

private[catalog] class MorDeltaWriter(newRoot: String,
    appliesTo: Seq[String], keyType: DataType, schema: StructType,
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.hadoop.conf.Configuration,
    cdcOwf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    cdcConf: org.apache.hadoop.conf.Configuration, partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}

  private var out: java.io.BufferedWriter = _
  private var file: java.io.File = _
  private var n = 0L
  private var dataOut
      : org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var dataFile: java.io.File = _
  private var cdcOut
      : org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var cdcFile: java.io.File = _
  // (partitionId, taskId) repeat across Spark APPLICATIONS (the task
  // counter resets per session) — without a per-writer nonce a fresh
  // file could collide with a prior generation's name, landing it in
  // the statement's own applies-to set (self-hiding) or clobbering on
  // the hard-link carry-over
  private val uniq = java.util.UUID.randomUUID.toString.take(8)

  private def writer(): java.io.BufferedWriter = {
    if (out == null) {
      file = new java.io.File(new java.io.File(newRoot, Mor.DeletesDirName),
        f"delete-$partitionId%05d-$taskId-$uniq.keys")
      out = java.nio.file.Files.newBufferedWriter(file.toPath)
      appliesTo.foreach { a =>
        out.write("#applies-to:" +
          java.net.URLEncoder.encode(a, "UTF-8"))
        out.newLine()
      }
    }
    out
  }

  private def dataWriter()
      : org.apache.spark.sql.execution.datasources.OutputWriter = {
    if (dataOut == null) {
      val attempt = new org.apache.hadoop.mapreduce.task
        .TaskAttemptContextImpl(conf,
          new TaskAttemptID(new TaskID(new JobID("graftmor", 0),
            TaskType.MAP, partitionId), taskId.toInt))
      dataFile = new java.io.File(newRoot,
        f"part-$partitionId%05d-$taskId-$uniq-mor" +
          owf.getFileExtension(attempt))
      dataOut = owf.newInstance(dataFile.getPath, schema, attempt)
    }
    dataOut
  }

  private def cdcWriter()
      : org.apache.spark.sql.execution.datasources.OutputWriter = {
    if (cdcOut == null) {
      // the CDC file pairs with THIS task's sidecar by name — the feed
      // detects CDC coverage of a revision range via that pairing
      val base = writer() // ensure the sidecar file (and its name) exist
      require(base != null && file != null)
      val attempt = new org.apache.hadoop.mapreduce.task
        .TaskAttemptContextImpl(cdcConf,
          new TaskAttemptID(new TaskID(new JobID("graftcdc", 0),
            TaskType.MAP, partitionId), taskId.toInt))
      cdcFile = new java.io.File(new java.io.File(newRoot, Mor.CdcDirName),
        Mor.cdcFileName(file.getName))
      cdcOut = cdcOwf.newInstance(cdcFile.getPath,
        Mor.cdcSchema(schema), attempt)
    }
    cdcOut
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    require(!id.isNullAt(0),
      "merge-on-read delta matched a row with a NULL row id — " +
        s"the ${Mor.RowIdProp} column must be non-null on every row")
    val w = writer()
    w.write(Mor.KeyLinePrefix + Mor.encodeKey(id.get(0, keyType)))
    w.newLine()
    n += 1
    // commit-time CDC: the row's full pre-image + source file, carried
    // by the _cdc metadata struct the rewrite scan served
    require(meta != null && !meta.isNullAt(0),
      "merge-on-read delta row arrived without its _cdc provenance")
    val cdc = meta.getStruct(0, 2)
    val pre = cdc.getStruct(1, schema.length)
    val rowOut = new Array[Any](schema.length + 1)
    rowOut(0) = cdc.getUTF8String(0)
    var i = 0
    while (i < schema.length) {
      rowOut(i + 1) = pre.get(i, schema(i).dataType)
      i += 1
    }
    cdcWriter().write(new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(rowOut))
  }

  // MERGE inserts land in a fresh per-task data file — never listed in
  // any sidecar's applies-to set, so they are live immediately
  override def insert(row: InternalRow): Unit =
    dataWriter().write(row)

  // an update is sidecar-delete (hides the row in its OLD file) plus a
  // fresh-file insert of the new image — served exactly once; the
  // delete half captures the pre-image CDC row
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    if (dataOut != null) dataOut.close()
    if (cdcOut != null) cdcOut.close()
    MorDeleteMsg(Option(file).map(_.getName), n,
      Option(dataFile).map(_.getName),
      Option(cdcFile).map(_.getName))
  }

  override def abort(): Unit = {
    if (out != null) {
      try out.close() catch { case _: Throwable => () }
      file.delete(): Unit
    }
    if (dataOut != null) {
      try dataOut.close() catch { case _: Throwable => () }
      dataFile.delete(): Unit
    }
    if (cdcOut != null) {
      try cdcOut.close() catch { case _: Throwable => () }
      cdcFile.delete(): Unit
    }
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------------------
// MERGE-ON-READ × PARTITIONED — the composition production fact tables
// need: a hive-partitioned table (single STRING/INT/BIGINT partition
// column, the partition-scoped DML class) opts into
// graft.delete.mode=merge-on-read and gets O(delta) DELETE — row ids
// land in sidecars under THEIR OWN partition dir
// (`<root>/<col>=<val>/_deletes/`), every data file of every partition
// carries through the publish as a hard link (zero rewrite, even in the
// touched partition), and reads apply only the sidecars of each file's
// partition (file identity is the partition-qualified [[Mor.fileId]]).
// UPDATE/MERGE stay partition-scoped COPY-ON-WRITE
// ([[PartitionCowOperation]]) but read through the MERGED table, so a
// COW statement materializes the delete vectors of the partitions it
// touches while untouched partitions hard-link WITH their sidecars.
// Partition pruning composes with the delta scan for free: the DELETE
// condition pushes to parquet through the builder chain, and a
// partition-column predicate prunes files at the parquet file index —
// the rewrite touches exactly the matched partitions' matched rows.
// ---------------------------------------------------------------------------

/** Writable serving of a partitioned merge-on-read table: merged plain
  * reads, delta DELETE with per-partition sidecars, partition-scoped
  * COW UPDATE/MERGE over the merged read. */
private[catalog] class MorPartitionedTable(inner: Table,
    cat: WritableSnapshotCatalog, ti: TableInfo,
    partField: StructField, keyField: StructField)
  extends PartitionScopedRowLevelTable(inner, cat, ti, partField) {

  // fresh per scan/statement: the sidecar set is generation state
  private def sidecars: Seq[DeleteSidecar] = Mor.loadSidecars(ti.location)

  // re-assert the catalog's declared NOT NULL on the row id (the file
  // table relaxes every column; the delta rewrite refuses nullable ids)
  override def schema(): StructType =
    StructType(inner.schema().fields.map(f =>
      if (f.name == keyField.name) f.copy(nullable = false) else f))

  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    schema().fields.map(f =>
      org.apache.spark.sql.connector.catalog.Column
        .create(f.name, f.dataType, f.nullable))

  // the merged read, plus `_partition` service on top (the runtime
  // group filter's build side reads the metadata column through this
  // REGULAR scan — without it a COW UPDATE's scope collapses to the
  // empty set and the rewrite silently no-ops)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PartMetaScanBuilder(
      new MorScanBuilder(
        inner.asInstanceOf[SupportsRead].newScanBuilder(options),
        keyField, sidecars),
      Seq(IdentityDeriver(partField)))

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () =>
      if (info.command == RowLevelOperation.Command.DELETE)
        new MorPartDeltaOperation(this, cat, ti, partField, keyField, info)
      else
        // UPDATE/MERGE: partition-scoped COW, reading through `this`
        // (the merged read — outstanding deletes must not resurrect);
        // touched partitions rewrite clean, untouched ones hard-link
        // with their sidecars (PartitionRoutedCowWrite carries them)
        new PartitionCowOperation(this, cat, ti,
          IdentityDeriver(partField), info)
}

/** Delta DELETE on a partitioned merge-on-read table: the rewrite scan
  * is the merged read plus the `_partition` metadata column (origin
  * partition of each matched row, required so the writer can route each
  * key to its partition's sidecar with that partition's applies-to
  * set). */
private[catalog] class MorPartDeltaOperation(table: MorPartitionedTable,
    cat: WritableSnapshotCatalog, ti: TableInfo, partField: StructField,
    keyField: StructField, info: RowLevelOperationInfo)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command

  override def description(): String =
    s"graft-mor-part-${info.command} ${ti.db}.${ti.name}"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(keyField.name))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(PartitionScoped.PartCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MorPartScanBuilder(table.newScanBuilder(options), partField)

  override def newWriteBuilder(wInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new MorPartDeltaWrite(cat, ti, keyField)
    }
}

/** Scan builder serving `_partition` (hive dir name of each row's
  * origin partition) on top of the MERGED scan. Filter pushdown
  * forwards through — the DELETE condition, including any
  * partition-column predicate, reaches the parquet file index, so the
  * delta scan reads only matched partitions' matched rows. The
  * partition COLUMN itself is appended to the delegate projection if
  * the planner didn't ask for it (needed to derive `_partition`) and
  * dropped again after. */
private[catalog] class MorPartScanBuilder(delegate: ScanBuilder,
    partField: StructField)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var partRequested = false
  private var addedPart = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    partRequested =
      requiredSchema.fieldNames.contains(PartitionScoped.PartCol)
    var pruned = StructType(requiredSchema.fields
      .filterNot(_.name == PartitionScoped.PartCol))
    if (partRequested) {
      require(requiredSchema.fieldNames.last == PartitionScoped.PartCol,
        s"metadata column ${PartitionScoped.PartCol} must be requested " +
          s"last, got ${requiredSchema.fieldNames.mkString(", ")}")
      if (!pruned.fieldNames.contains(partField.name)) {
        addedPart = true
        pruned = pruned.add(partField)
      }
    }
    delegate match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(pruned)
      case _ => ()
    }
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate match {
      case f: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => f.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan = {
    val ds = delegate.build()
    if (partRequested) new MorPartScan(ds, partField, addedPart) else ds
  }
}

/** Appends the per-row `_partition` (hive dir name derived from the
  * stored partition value) to the merged scan's rows; drops the
  * partition column again when the builder had to append it. */
private[catalog] class MorPartScan(delegate: Scan,
    partField: StructField, dropPart: Boolean) extends Scan {

  override def readSchema(): StructType = {
    val base =
      if (dropPart) StructType(delegate.readSchema().fields.dropRight(1))
      else delegate.readSchema()
    base.add(PartitionScoped.PartCol, StringType, nullable = true)
  }

  override def description(): String =
    s"graft-mor-part-scan(${delegate.description()})"

  override def toBatch: Batch = new Batch {
    private val db = delegate.toBatch
    override def planInputPartitions(): Array[InputPartition] =
      db.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      new MorPartReaderFactory(db.createReaderFactory(),
        delegate.readSchema(), partField, dropPart)
  }
}

private[catalog] class MorPartReaderFactory(
    delegate: PartitionReaderFactory, fullSchema: StructType,
    partField: StructField, dropPart: Boolean)
  extends PartitionReaderFactory {

  private val partOrd = fullSchema.fieldIndex(partField.name)

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val dr = delegate.createReader(p)
    val proj =
      if (dropPart)
        UnsafeProjection.create(fullSchema.fields.indices.dropRight(1)
          .map(i => BoundReference(i, fullSchema(i).dataType,
            fullSchema(i).nullable)))
      else null
    new PartitionReader[InternalRow] {
      private val joined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow
      override def next(): Boolean = dr.next()
      override def get(): InternalRow = {
        val row = dr.get()
        val dir = PartitionScoped.dirName(partField.name,
          row.get(partOrd, partField.dataType))
        val out = if (proj != null) proj(row) else row
        joined(out, InternalRow(UTF8String.fromString(dir)))
      }
      override def close(): Unit = dr.close()
    }
  }
}

private[catalog] case class MorPartDeleteMsg(
    files: Seq[(String, String)], keys: Long) extends WriterCommitMessage

/** The partitioned delta write: tasks append row-id keys to per-task
  * sidecar files under `<newRoot>/<partdir>/_deletes/`, each carrying
  * ITS partition's applies-to file list; driver commit sweeps strays,
  * hard-links every partition's data files and prior sidecars (same
  * inodes — zero data movement, even in touched partitions), and
  * publishes through the atomic location swap + OCC. */
private[catalog] class MorPartDeltaWrite(cat: WritableSnapshotCatalog,
    ti: TableInfo, keyField: StructField) extends DeltaWrite {

  private val oldRoot = Mor.normLoc(ti.location)
  private val newRoot =
    oldRoot + s"_rl${java.util.UUID.randomUUID.toString.take(8)}"

  override def description(): String =
    s"graft-mor-part-delta ${ti.db}.${ti.name} -> $newRoot"

  override def toBatch: DeltaBatchWrite = {
    def partDirs(root: String): Seq[java.io.File] =
      Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName.contains("="))
        .sortBy(_.getName)
    // per-partition applies-to: THAT partition's data files at delete
    // time (bare names on disk; the loader re-qualifies with the
    // partition dir). KiB of driver-side metadata per partition.
    val appliesTo: Map[String, Seq[String]] = partDirs(oldRoot).map { d =>
      d.getName -> Option(d.listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getName).sorted
    }.toMap
    new java.io.File(newRoot).mkdirs()
    val marker = new java.io.File(newRoot, "_graftwriting")
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray): Unit

    new DeltaBatchWrite {
      override def createBatchWriterFactory(
          pInfo: PhysicalWriteInfo): DeltaWriterFactory =
        new MorPartDeltaWriterFactory(newRoot, appliesTo,
          keyField.dataType)

      override def useCommitCoordinator(): Boolean = true

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val authorized = messages
          .collect { case m: MorPartDeleteMsg => m.files }.flatten
          .map { case (d, f) => s"$d/$f" }.toSet
        // sweep stray sidecars from attempts that died without abort
        partDirs(newRoot).foreach { pd =>
          val del = new java.io.File(pd, Mor.DeletesDirName)
          Option(del.listFiles()).toSeq.flatten.filter(_.isFile)
            .filterNot(f => authorized.contains(s"${pd.getName}/${f.getName}"))
            .foreach(f => f.delete(): Unit)
        }
        // hard-link every partition's data files and prior sidecars
        partDirs(oldRoot).foreach { src =>
          val dst = new java.io.File(newRoot, src.getName)
          dst.mkdirs()
          Mor.linkAll(src, dst)
          val srcDel = new java.io.File(src, Mor.DeletesDirName)
          if (srcDel.isDirectory) {
            val dstDel = new java.io.File(dst, Mor.DeletesDirName)
            dstDel.mkdirs()
            Option(srcDel.listFiles()).toSeq.flatten
              .filter(f => f.isFile && f.getName.endsWith(".keys"))
              .foreach(f =>
                Mor.linkOne(f, new java.io.File(dstDel, f.getName)))
          }
        }
        marker.delete(): Unit
        cat.swapLocation(ti, newRoot) // the ONLY publish point (atomic)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(newRoot)): Unit
    }
  }
}

private[catalog] class MorPartDeltaWriterFactory(newRoot: String,
    appliesTo: Map[String, Seq[String]], keyType: DataType)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new MorPartDeltaWriter(newRoot, appliesTo, keyType, partitionId,
      taskId)
}

private[catalog] class MorPartDeltaWriter(newRoot: String,
    appliesTo: Map[String, Seq[String]], keyType: DataType,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private val uniq = java.util.UUID.randomUUID.toString.take(8)
  private val writers = scala.collection.mutable.LinkedHashMap
    .empty[String, (java.io.BufferedWriter, java.io.File)]
  private var n = 0L

  private def writer(partDir: String): java.io.BufferedWriter =
    writers.getOrElseUpdate(partDir, {
      val applies = appliesTo.getOrElse(partDir,
        throw new IllegalStateException(
          s"delta DELETE matched a row in partition $partDir, which " +
            "has no data files in the generation the statement was " +
            "planned against"))
      val dir = new java.io.File(new java.io.File(newRoot, partDir),
        Mor.DeletesDirName)
      dir.mkdirs()
      val f = new java.io.File(dir,
        f"delete-$partitionId%05d-$taskId-$uniq.keys")
      val w = java.nio.file.Files.newBufferedWriter(f.toPath)
      applies.foreach { a =>
        w.write("#applies-to:" + java.net.URLEncoder.encode(a, "UTF-8"))
        w.newLine()
      }
      (w, f)
    })._1

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    require(meta != null && !meta.isNullAt(0),
      "partitioned merge-on-read delta matched a row without " +
        s"${PartitionScoped.PartCol} provenance")
    require(!id.isNullAt(0),
      "merge-on-read delta matched a row with a NULL row id — " +
        s"the ${Mor.RowIdProp} column must be non-null on every row")
    val w = writer(meta.getUTF8String(0).toString)
    w.write(Mor.KeyLinePrefix + Mor.encodeKey(id.get(0, keyType)))
    w.newLine()
    n += 1
  }

  override def insert(row: InternalRow): Unit =
    throw new IllegalStateException(
      "partitioned merge-on-read plans only DELETE delta-based; " +
        "UPDATE/MERGE run partition-scoped copy-on-write")

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    MorPartDeleteMsg(writers.toSeq.map { case (d, (_, f)) =>
      d -> f.getName }, n)
  }

  override def abort(): Unit =
    writers.values.foreach { case (w, f) =>
      try w.close() catch { case _: Throwable => () }
      f.delete(): Unit
    }

  override def close(): Unit = ()
}

/** STREAMING CHANGE-FEED CONSUMER — the production CDC topology over
  * [[MorChangeFeed]]: a Structured Streaming `foreachBatch` consumer
  * pages the catalog's own feed revision-by-revision into an
  * incremental downstream materialization (the `stream_cdc_upsert`
  * idiom, fed by the catalog instead of an event source).
  *
  * Exactly-once discipline: a LEDGER directory next to the
  * materialization records every applied revision (`rev-<n>` marker).
  * Redelivered batches (restart-from-checkpoint, speculative re-runs)
  * skip already-applied revisions; a crash between the state publish
  * and the ledger append merely re-applies a net diff whose
  * application is IDEMPOTENT by construction — deletes of absent keys
  * are no-ops, and upserts remove their key before inserting. Batches
  * arriving out of order cannot skew the state either: a batch naming
  * revision N applies every unapplied revision ≤ N from the catalog's
  * own revision log, in order.
  *
  * PUBLISH is atomic, never an in-place overwrite: each application
  * stages the new state into a fresh GENERATION directory
  * (`<out>_gen/g-<uuid>`) and publishes by atomically swapping the
  * materialization path — a symlink — onto it (tmp-link +
  * `ATOMIC_MOVE`, the catalog's own generation discipline). A crash
  * mid-stage leaves the previous generation fully served and the
  * ledger truthful; there is NO window where the recovery baseline is
  * a deleted/partial directory (the in-place `SaveMode.Overwrite`
  * hazard). Superseded generations are swept after the swap.
  *
  * Scale note (100 TB): each application is one O(delta) feed read
  * (commit-time CDC files + fresh data files — [[MorChangeFeed]])
  * joined against the materialization by key; the materialization
  * rewrite is the consumer's own cost model to improve (partitioned
  * or MOR downstream tables compose — this helper keeps the simple
  * full-rewrite shape of `stream_cdc_upsert`). */
private[graft] object ChangeFeedStream {

  private def ledgerDir(outDir: String) = new java.io.File(
    outDir.stripSuffix("/") + "_applied")

  private def genRoot(outDir: String) = new java.io.File(
    outDir.stripSuffix("/") + "_gen")

  /** Stage `state` into a fresh generation dir and atomically point
    * the materialization symlink at it; then sweep superseded
    * generations (only after the swap — a reader mid-scan on the old
    * generation keeps it until its own resolution ends on local fs
    * semantics; the sweep is the same post-publish discipline the
    * catalog's location swaps use). */
  private def publish(outDir: String,
      state: org.apache.spark.sql.DataFrame): Unit = {
    val root = genRoot(outDir)
    root.mkdirs()
    val gen = new java.io.File(root,
      s"g-${java.util.UUID.randomUUID.toString.take(12)}")
    state.write.mode("overwrite").parquet(gen.getPath)
    val link = java.nio.file.Paths.get(outDir.stripSuffix("/"))
    val tmp = new java.io.File(root, s".lnk-${gen.getName}").toPath
    java.nio.file.Files.deleteIfExists(tmp)
    java.nio.file.Files.createSymbolicLink(tmp, gen.toPath.toAbsolutePath)
    // first publish: nothing to replace; later: atomic symlink swap
    java.nio.file.Files.move(tmp, link,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("g-") && f.getName != gen.getName)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly(_): Unit)
  }

  /** Revisions recorded as applied (sorted). */
  def applied(outDir: String): Seq[Int] =
    Option(ledgerDir(outDir).list()).toSeq.flatten
      .filter(_.startsWith("rev-")).map(_.stripPrefix("rev-").toInt)
      .sorted

  /** Initialize the materialization with the table state at `base`
    * and stamp the ledger so consumption starts at `base + 1`. */
  def bootstrap(outDir: String, base: Int,
      state: org.apache.spark.sql.DataFrame): Unit = {
    // a stale plain directory at the materialization path would block
    // the symlink publish — refuse loudly rather than delete data we
    // did not write
    val at = java.nio.file.Paths.get(outDir.stripSuffix("/"))
    require(!java.nio.file.Files.exists(
        at, java.nio.file.LinkOption.NOFOLLOW_LINKS) ||
        java.nio.file.Files.isSymbolicLink(at),
      s"change-feed bootstrap target $outDir exists and is not a " +
        "generation symlink — remove it first")
    publish(outDir, state)
    val l = ledgerDir(outDir)
    l.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(l, s"rev-$base").toPath, Array.emptyByteArray): Unit
  }

  /** Apply every unapplied catalog revision ≤ `upTo` of
    * `db`.`table` (in `snapDir`) to the materialization at `outDir`,
    * in revision order. `stateAt` serves the table AS OF a revision
    * (the feed's pre-CDC fallback + schema template — time travel
    * through any attach). Returns the revisions applied this call. */
  def applyUpTo(s: SparkSession, snapDir: String, db: String,
      table: String, keyName: String, outDir: String, upTo: Int,
      stateAt: Int => org.apache.spark.sql.DataFrame): Seq[Int] = {
    import org.apache.spark.sql.functions._
    val last = applied(outDir).lastOption.getOrElse(
      throw new IllegalStateException(
        s"change-feed consumer at $outDir was never bootstrapped"))
    if (upTo <= last) return Nil
    def locAt(rev: Int): String = CatalogTransfer
      .readLocal(s"$snapDir/revs/$rev").tables
      .find(t => t.db == db && t.name == table)
      .getOrElse(throw new IllegalStateException(
        s"$db.$table absent from revision $rev"))
      .location
    var state = s.read.parquet(outDir)
    val revs = (last + 1) to upTo
    for (rev <- revs) {
      val feed = MorChangeFeed.between(s, stateAt(rev - 1),
        locAt(rev - 1), locAt(rev), keyName)
      // upsert the NET diff: removed keys = deletes + both halves of
      // an upsert (removing an insert's key first is what makes a
      // redelivered application idempotent)
      val gone = feed
        .filter(col("op").isin("delete", "update_postimage", "insert"))
        .select(col(keyName).as("_dk")).distinct()
      val adds = feed
        .filter(col("op").isin("insert", "update_postimage")).drop("op")
      state = state.join(gone, state(keyName) === col("_dk"), "left_anti")
        .unionByName(adds)
        .localCheckpoint() // sever lineage from the generation we swap
    }
    publish(outDir, state)
    val l = ledgerDir(outDir)
    revs.foreach(r => java.nio.file.Files.write(
      new java.io.File(l, s"rev-$r").toPath, Array.emptyByteArray))
    revs
  }
}
