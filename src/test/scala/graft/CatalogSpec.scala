package graft

import graft.catalog._

/** Group G semantics: export→import→export fixed point, DDL rendering,
  * partition recovery, and the two-session trap documented in
  * SURVEY.md §3.2 (newSession() shares the external catalog, so
  * isolation is modeled as drop-then-import — metadata loss with data
  * survival, exactly the reference's cluster-teardown semantics). */
class CatalogSpec extends SparkSpec {

  private def fixture(): Unit = {
    spark.sql("DROP DATABASE IF EXISTS graft_fix CASCADE")
    spark.sql("CREATE DATABASE graft_fix")
    spark.sql(s"""CREATE TABLE graft_fix.nation_fix
                 |USING parquet LOCATION '$sf/nation.parquet'""".stripMargin)
    spark.sql("""ALTER TABLE graft_fix.nation_fix
                |SET TBLPROPERTIES ('graft.origin' = 'test')""".stripMargin)
  }

  test("export captures schema, provider, location, properties") {
    fixture()
    val snap = CatalogTransfer.export(spark, Seq("graft_fix"))
    assert(snap.databases.map(_.name) == Seq("graft_fix"))
    val t = snap.tables.find(_.name == "nation_fix").get
    assert(t.tableType == "EXTERNAL")
    assert(t.provider == "parquet")
    assert(t.location.endsWith("nation.parquet"))
    assert(t.columns.map(_.name) ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(t.properties.contains(PropKV("graft.origin", "test")))
  }

  test("export → import → export is a fixed point") {
    fixture()
    val snap1 = CatalogTransfer.export(spark, Seq("graft_fix"))
    val dir = Tables.scratch(sf, "catalog_fixed_point")
    CatalogTransfer.write(spark, snap1, dir)
    spark.sql("DROP DATABASE graft_fix CASCADE")
    CatalogTransfer.importInto(spark, CatalogTransfer.read(spark, dir))
    val snap2 = CatalogTransfer.export(spark, Seq("graft_fix"))
    assert(CatalogTransfer.toCanonicalJson(spark, snap1)
      == CatalogTransfer.toCanonicalJson(spark, snap2))
  }

  test("round-trip preserves data readable by name") {
    fixture()
    val before = spark.table("graft_fix.nation_fix").count()
    val dir = Tables.scratch(sf, "catalog_rt_data")
    CatalogTransfer.write(spark,
      CatalogTransfer.export(spark, Seq("graft_fix")), dir)
    spark.sql("DROP DATABASE graft_fix CASCADE")
    CatalogTransfer.importInto(spark, CatalogTransfer.read(spark, dir))
    assert(spark.table("graft_fix.nation_fix").count() == before)
    assert(before > 0)
  }

  test("partitioned table round-trips with recovered partitions") {
    val partDir = Tables.scratch(sf, "lineitem_by_flag")
    Tables(spark, sf, "lineitem").write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(partDir)
    spark.sql("DROP DATABASE IF EXISTS graft_part CASCADE")
    spark.sql("CREATE DATABASE graft_part")
    spark.sql(CatalogTransfer.externalPartitionedDdl(spark, "graft_part.li",
      new java.io.File(partDir).getAbsolutePath, Seq("l_returnflag")))
    spark.catalog.recoverPartitions("graft_part.li")
    val before = spark.table("graft_part.li").count()
    val dir = Tables.scratch(sf, "catalog_rt_part")
    CatalogTransfer.write(spark,
      CatalogTransfer.export(spark, Seq("graft_part")), dir)
    spark.sql("DROP DATABASE graft_part CASCADE")
    CatalogTransfer.importInto(spark, CatalogTransfer.read(spark, dir))
    assert(spark.table("graft_part.li").count() == before)
    val parts = spark.sql("SHOW PARTITIONS graft_part.li").count()
    assert(parts == 3, s"expected 3 recovered partitions, got $parts")
  }

  test("createTableDdl renders partitioning, comment, and properties") {
    val t = TableInfo("db1", "t1", "EXTERNAL", "parquet", "/data/t1",
      Seq(ColumnInfo("a", "BIGINT", nullable = true, isPartition = false),
        ColumnInfo("p", "STRING", nullable = true, isPartition = true)),
      Seq(PropKV("k", "v")), "a comment", "")
    val ddl = CatalogTransfer.createTableDdl(t)
    assert(ddl == "CREATE TABLE `db1`.`t1` (`a` BIGINT, `p` STRING) " +
      "USING parquet PARTITIONED BY (`p`) COMMENT 'a comment' " +
      "LOCATION '/data/t1' TBLPROPERTIES ('k' = 'v')")
  }

  test("views round-trip through the snapshot (definition, not data)") {
    spark.sql("DROP DATABASE IF EXISTS graft_vrt CASCADE")
    spark.sql("CREATE DATABASE graft_vrt")
    spark.sql(s"""CREATE TABLE graft_vrt.nation_b
                 |USING parquet LOCATION '$sf/nation.parquet'""".stripMargin)
    spark.sql("""CREATE VIEW graft_vrt.nation_v AS
                |SELECT n_regionkey, COUNT(*) AS n FROM graft_vrt.nation_b
                |GROUP BY n_regionkey""".stripMargin)
    val before = spark.table("graft_vrt.nation_v").collect().toSet
    val dir = Tables.scratch(sf, "catalog_view_rt")
    CatalogTransfer.write(spark,
      CatalogTransfer.export(spark, Seq("graft_vrt")), dir)
    spark.sql("DROP DATABASE graft_vrt CASCADE")
    val created = CatalogTransfer.importInto(spark, CatalogTransfer.read(spark, dir))
    assert(created.contains("graft_vrt.nation_v"), s"view not recreated: $created")
    assert(spark.table("graft_vrt.nation_v").collect().toSet == before)
  }

  test("import is idempotent when tables already exist") {
    fixture()
    val snap = CatalogTransfer.export(spark, Seq("graft_fix"))
    val created = CatalogTransfer.importInto(spark, snap)
    assert(created.isEmpty, s"re-import should create nothing: $created")
  }
}
