package graft.catalog

import org.apache.spark.sql.SparkSession

/** Fidelity check for the reference's actual metastore technology:
  * runs CatalogTransfer export → drop → import against a REAL Hive
  * metastore (embedded Derby, the local stand-in for the managed HMS at
  * yc-data-proc-metadata-import metastore-import.tf:112-117).
  *
  * Standalone main (not a ScalaTest): the catalog implementation is
  * fixed per SparkContext, so Hive support needs its own JVM — run with
  *   sbt "runMain graft.catalog.HiveRoundtrip /root/testdata/sf0.001"
  * Prints HIVE_ROUNDTRIP_OK=<rowcount> on success.
  */
object HiveRoundtrip {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val scratch = new java.io.File("target/scratch/hive_roundtrip")
      .getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hive-roundtrip")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$scratch/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.conf.get("spark.sql.catalogImplementation") == "hive",
      "hive support not active")

    spark.sql("CREATE DATABASE hive_src")
    spark.sql(s"""CREATE TABLE hive_src.nation_h
                 |USING parquet LOCATION '$sfDir/nation.parquet'""".stripMargin)
    spark.sql("""ALTER TABLE hive_src.nation_h
                |SET TBLPROPERTIES ('graft.via' = 'hms')""".stripMargin)

    val snapDir = s"$scratch/snapshot"
    CatalogTransfer.write(spark,
      CatalogTransfer.export(spark, Seq("hive_src")), snapDir)
    spark.sql("DROP DATABASE hive_src CASCADE") // metadata gone from HMS
    val created =
      CatalogTransfer.importInto(spark, CatalogTransfer.read(spark, snapDir))
    require(created == Seq("hive_src.nation_h"), s"unexpected: $created")

    val n = spark.table("hive_src.nation_h").count()
    require(n > 0, "no rows after hive round-trip")
    val prop = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "nation_h", Some("hive_src")))
      .properties.getOrElse("graft.via", "<missing>")
    require(prop == "hms", s"property lost through HMS round-trip: $prop")
    println(s"HIVE_ROUNDTRIP_OK=$n")
    spark.stop()
  }
}
