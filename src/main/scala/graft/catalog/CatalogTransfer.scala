package graft.catalog

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Portable catalog snapshot — the Spark-native rendering of the
  * reference's Hive-Metastore export/import (its entire raison d'être:
  * yc-data-proc-metadata-import README_en.md:3, the managed Metastore
  * service at metastore-import.tf:112-117, and the symmetric
  * source/target clusters at metastore-import.tf:181-278).
  *
  * Model: METADATA travels, DATA stays put. A table is re-created on the
  * "target" purely from the snapshot (schema, provider, location,
  * partitioning, properties); its files never move — exactly the
  * reference's shared-bucket semantics (metastore-import.tf:165-179).
  *
  * Scale note (100 TB): catalog metadata is thousands of rows, not
  * terabytes — snapshot I/O is trivially driver-side; the payoff is that
  * re-registered tables keep their partitioned layout so partition
  * pruning works on the target immediately after import.
  */
final case class ColumnInfo(
    name: String, dataType: String, nullable: Boolean, isPartition: Boolean)

final case class PropKV(key: String, value: String)

final case class TableInfo(
    db: String,
    name: String,
    tableType: String,          // EXTERNAL | MANAGED | VIEW
    provider: String,           // parquet / csv / json / hive ...
    location: String,           // empty for location-less tables
    columns: Seq[ColumnInfo],   // data columns then partition columns
    properties: Seq[PropKV],    // sorted by key, volatile keys scrubbed
    comment: String,
    viewText: String)           // CREATE VIEW body; empty for tables

final case class DatabaseInfo(name: String, description: String)

final case class CatalogSnapshot(
    databases: Seq[DatabaseInfo], tables: Seq[TableInfo])

object CatalogTransfer {

  /** Keys that vary per-run and must not survive a snapshot
    * (timestamps, engine bookkeeping, statistics). */
  private val volatilePropPrefixes = Seq(
    "transient_lastDdlTime", "spark.sql.create.version",
    "spark.sql.statistics", "created", "numFiles", "totalSize",
    "option.path", "path", "external")

  private def scrub(props: Map[String, String]): Seq[PropKV] =
    props.toSeq
      .filterNot { case (k, _) =>
        volatilePropPrefixes.exists(p => k.toLowerCase.startsWith(p.toLowerCase))
      }
      .sortBy(_._1).map { case (k, v) => PropKV(k, v) }

  /** Walk the session catalog and capture every table in `dbs` (all
    * non-default databases when empty). Reads go through the
    * SessionCatalog's table metadata (CatalogTable), the same objects
    * the Hive client marshals over Thrift in the reference deployment.
    */
  def export(spark: SparkSession, dbs: Seq[String] = Nil): CatalogSnapshot = {
    val cat = spark.sessionState.catalog
    val dbNames = (if (dbs.nonEmpty) dbs
                   else cat.listDatabases().filterNot(_ == "default")).sorted
    val databases = dbNames.map { db =>
      val meta = cat.getDatabaseMetadata(db)
      DatabaseInfo(db, meta.description)
    }
    val tables = dbNames.flatMap { db =>
      // listTables also returns session temp views (no database
      // qualifier) — keep only identifiers actually owned by `db`.
      cat.listTables(db).filter(_.database.contains(db))
        .sortBy(_.table).map { ident =>
        val t = cat.getTableMetadata(ident)
        val partCols = t.partitionColumnNames.toSet
        val cols = t.schema.fields.map { f =>
          ColumnInfo(f.name, f.dataType.sql, f.nullable,
            partCols.contains(f.name))
        }.toSeq
        TableInfo(
          db = db,
          name = ident.table,
          tableType = t.tableType.name,
          provider = t.provider.getOrElse(
            if (t.tableType.name == "VIEW") "view" else "parquet"),
          location = t.storage.locationUri.map(_.toString).getOrElse(""),
          columns = cols,
          properties = scrub(t.properties),
          comment = t.comment.getOrElse(""),
          viewText = t.viewText.getOrElse(""))
      }
    }
    CatalogSnapshot(databases, tables)
  }

  /** Persist a snapshot as JSON datasets under `dir` (overwrite). */
  def write(spark: SparkSession, snap: CatalogSnapshot, dir: String): Unit = {
    import spark.implicits._
    spark.createDataset(snap.databases).coalesce(1)
      .write.mode("overwrite").json(s"$dir/databases")
    spark.createDataset(snap.tables).coalesce(1)
      .write.mode("overwrite").json(s"$dir/tables")
  }

  /** Load a snapshot previously persisted with [[write]]. */
  def read(spark: SparkSession, dir: String): CatalogSnapshot = {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    val dbs = spark.read.schema(Encoders.product[DatabaseInfo].schema)
      .json(s"$dir/databases").as[DatabaseInfo].collect().toSeq
      .sortBy(_.name)
    val tables = spark.read.schema(Encoders.product[TableInfo].schema)
      .json(s"$dir/tables").as[TableInfo].collect().toSeq
      .sortBy(t => (t.db, t.name))
    CatalogSnapshot(dbs, tables)
  }

  private def q(id: String): String = s"`${id.replace("`", "``")}`"

  /** DDL to register an existing partitioned directory as an external
    * table: Spark requires an explicit column list with PARTITIONED BY,
    * so infer it from the files (partition columns ordered last). */
  def externalPartitionedDdl(spark: SparkSession, table: String,
      location: String, partCols: Seq[String]): String = {
    val schema = spark.read.parquet(location).schema
    val fields = schema.fields.filterNot(f => partCols.contains(f.name)) ++
      partCols.map(schema.apply)
    val colDdl = fields.map(f => s"${q(f.name)} ${f.dataType.sql}")
      .mkString(", ")
    s"CREATE TABLE $table ($colDdl) USING parquet " +
      partCols.map(q).mkString("PARTITIONED BY (", ", ", ") ") +
      s"LOCATION '$location'"
  }

  /** Render the CREATE TABLE statement that reconstructs `t`. Tables
    * with a location re-emit as external (data never moves — the
    * reference's shared-bucket model); location-less managed tables
    * re-emit managed and come back empty, which is faithful: their data
    * lived in the dropped warehouse.
    */
  def createTableDdl(t: TableInfo): String = {
    val dataCols = t.columns.filterNot(_.isPartition)
    val partCols = t.columns.filter(_.isPartition)
    val colDdl = (dataCols ++ partCols)
      .map(c => s"${q(c.name)} ${c.dataType}${if (c.nullable) "" else " NOT NULL"}")
      .mkString(", ")
    val sb = new StringBuilder(
      s"CREATE TABLE ${q(t.db)}.${q(t.name)} ($colDdl) USING ${t.provider}")
    if (partCols.nonEmpty)
      sb.append(partCols.map(c => q(c.name))
        .mkString(" PARTITIONED BY (", ", ", ")"))
    if (t.comment.nonEmpty)
      sb.append(s" COMMENT '${t.comment.replace("'", "''")}'")
    if (t.location.nonEmpty)
      sb.append(s" LOCATION '${t.location.replace("'", "''")}'")
    if (t.properties.nonEmpty)
      sb.append(t.properties
        .map(p => s"'${p.key.replace("'", "''")}' = '${p.value.replace("'", "''")}'")
        .mkString(" TBLPROPERTIES (", ", ", ")"))
    sb.toString
  }

  /** Re-emit the snapshot into `spark`'s catalog (the "target
    * cluster"). Existing same-name tables/databases are left in place
    * unless `overwrite`. Partitioned external tables get their
    * partitions recovered from the directory layout, so pruning works
    * immediately.
    */
  def importInto(spark: SparkSession, snap: CatalogSnapshot,
      overwrite: Boolean = false): Seq[String] = {
    val created = Seq.newBuilder[String]
    snap.databases.foreach { db =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(db.name)}")
    }
    // plain tables first, then views (views may reference tables)
    val ordered = snap.tables.sortBy(t => (t.tableType == "VIEW", t.db, t.name))
    ordered.foreach { t =>
      if (overwrite)
        spark.sql(
          if (t.tableType == "VIEW") s"DROP VIEW IF EXISTS ${q(t.db)}.${q(t.name)}"
          else s"DROP TABLE IF EXISTS ${q(t.db)}.${q(t.name)}")
      if (!spark.catalog.tableExists(s"${t.db}.${t.name}")) {
        if (t.tableType == "VIEW")
          spark.sql(s"CREATE VIEW ${q(t.db)}.${q(t.name)} AS ${t.viewText}")
        else
          spark.sql(createTableDdl(t))
        if (t.columns.exists(_.isPartition) && t.location.nonEmpty)
          spark.catalog.recoverPartitions(s"${t.db}.${t.name}")
        created += s"${t.db}.${t.name}"
      }
    }
    created.result()
  }

  /** Deterministic JSON rendering for golden-file tests: schema-ordered
    * fields, tables sorted by (db, name). */
  def toCanonicalJson(spark: SparkSession, snap: CatalogSnapshot): String = {
    import spark.implicits._
    val dbJson = spark.createDataset(snap.databases.sortBy(_.name))
      .toJSON.collect()
    val tblJson = spark.createDataset(snap.tables.sortBy(t => (t.db, t.name)))
      .toJSON.collect()
    (dbJson ++ tblJson).mkString("\n")
  }
}
