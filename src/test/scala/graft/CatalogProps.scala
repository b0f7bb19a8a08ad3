package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.catalog._
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Model-based property test of the writable snapshot catalog: a
  * random DDL sequence applied both to a [[WritableSnapshotCatalog]]
  * and to a trivial in-memory model must agree on
  *
  *  1. the final catalog state as a FRESH read-only attach sees it
  *     (namespaces, tables, views, functions — the cross-cluster
  *     resolution surface is the one that matters);
  *  2. the revision log: exactly one immutable revision per successful
  *     mutation, HEAD pointing at the last one;
  *  3. time travel: a randomly chosen earlier revision replays the
  *     model's state as of that mutation (metadata history is not just
  *     append-only files — each revision is a faithful snapshot).
  *
  * Failed operations (duplicate creates, drops of missing objects,
  * renames into absent namespaces) must leave BOTH state and history
  * untouched — a thrown DDL must not burn a revision number or leak a
  * partial write, which is exactly what the temp-file + atomic-HEAD
  * persist guarantees.
  */
object CatalogProps extends Properties("graft.catalog") {

  // Spark actions per case are driver-heavy (snapshot json reads), so
  // few cases with longer op sequences beat many tiny cases.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def spark = SparkSpec.spark

  private val caseNo = new AtomicInteger

  // ---- op alphabet over small name pools (collisions are the point:
  // they exercise the duplicate/missing failure paths) ----
  private sealed trait Op
  private case class CreateNs(db: String) extends Op
  private case class DropNs(db: String) extends Op
  private case class CreateTable(db: String, t: String) extends Op
  private case class DropTable(db: String, t: String) extends Op
  private case class Rename(db: String, t: String, db2: String,
      t2: String) extends Op
  private case class CreateView(db: String, v: String) extends Op
  private case class DropView(db: String, v: String) extends Op
  private case class RegisterFn(db: String, f: String) extends Op
  private case class DropFn(db: String, f: String) extends Op

  private val dbs = Gen.oneOf("d0", "d1")
  private val tbls = Gen.oneOf("t0", "t1", "t2")
  private val vws = Gen.oneOf("v0", "v1")
  private val fns = Gen.oneOf("f0", "f1")

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> dbs.map(CreateNs),
    1 -> dbs.map(DropNs),
    4 -> Gen.zip(dbs, tbls).map((CreateTable.apply _).tupled),
    2 -> Gen.zip(dbs, tbls).map((DropTable.apply _).tupled),
    2 -> Gen.zip(dbs, tbls, dbs, tbls).map((Rename.apply _).tupled),
    2 -> Gen.zip(dbs, vws).map((CreateView.apply _).tupled),
    1 -> Gen.zip(dbs, vws).map((DropView.apply _).tupled),
    2 -> Gen.zip(dbs, fns).map((RegisterFn.apply _).tupled),
    1 -> Gen.zip(dbs, fns).map((DropFn.apply _).tupled))

  /** The model: what a metastore should contain. Views and tables
    * share a name space per db (the catalog refuses cross-kind name
    * clashes), functions have their own. */
  private case class Model(dbs: Set[String],
      tables: Set[(String, String)], views: Set[(String, String)],
      fnSet: Set[(String, String)])

  private def attach(name: String, dir: String,
      writable: Boolean): SnapshotCatalog = {
    val c = if (writable) new WritableSnapshotCatalog
      else new SnapshotCatalog
    c.initialize(name, new CaseInsensitiveStringMap(
      java.util.Map.of("path", dir)))
    c
  }

  private val oneCol = StructType(Seq(StructField("x", IntegerType)))

  property("random DDL: fresh attach, revision log, and time travel " +
      "all replay the model") = forAll(Gen.listOfN(14, genOp)) { ops =>
    spark: Unit // force the shared session (snapshot reads need it)
    val n = caseNo.incrementAndGet()
    val dirF = new java.io.File(Tables.scratch("props", s"cat_$n"))
    org.apache.commons.io.FileUtils.deleteQuietly(dirF)
    CatalogTransfer.writeLocal(CatalogSnapshot(Nil, Nil), dirF.getPath)
    val w = attach(s"props_w_$n", dirF.getPath, writable = true)
      .asInstanceOf[WritableSnapshotCatalog]

    var model = Model(Set.empty, Set.empty, Set.empty, Set.empty)
    // model state AFTER each successful mutation, index = rev - 1
    var history = Vector.empty[Model]

    def applyOp(op: Op): Unit = {
      val next: Model = op match {
        case CreateNs(db) =>
          w.createNamespace(Array(db), java.util.Map.of("comment", db))
          model.copy(dbs = model.dbs + db)
        case DropNs(db) =>
          if (!w.dropNamespace(Array(db), cascade = true)) return
          Model(model.dbs - db,
            model.tables.filterNot(_._1 == db),
            model.views.filterNot(_._1 == db),
            model.fnSet.filterNot(_._1 == db))
        case CreateTable(db, t) =>
          w.createTable(Identifier.of(Array(db), t), oneCol,
            Array.empty, java.util.Map.of()): Unit
          model.copy(tables = model.tables + ((db, t)))
        case DropTable(db, t) =>
          if (!w.dropTable(Identifier.of(Array(db), t))) return
          model.copy(tables = model.tables - ((db, t)))
        case Rename(db, t, db2, t2) =>
          w.renameTable(Identifier.of(Array(db), t),
            Identifier.of(Array(db2), t2))
          model.copy(tables = model.tables - ((db, t)) + ((db2, t2)))
        case CreateView(db, v) =>
          w.createView(new ViewInfo(Identifier.of(Array(db), v),
            "SELECT 1 AS x", s"props_w_$n", Array(db), oneCol,
            Array.empty, Array.empty, Array.empty,
            java.util.Map.of())): Unit
          model.copy(views = model.views + ((db, v)))
        case DropView(db, v) =>
          if (!w.dropView(Identifier.of(Array(db), v))) return
          model.copy(views = model.views - ((db, v)))
        case RegisterFn(db, f) =>
          w.registerFunction(db, f,
            classOf[graft.functions.HaversineKm].getName)
          model.copy(fnSet = model.fnSet + ((db, f)))
        case DropFn(db, f) =>
          if (!w.dropFunction(db, f)) return
          model.copy(fnSet = model.fnSet - ((db, f)))
      }
      model = next
      history = history :+ next
    }

    ops.foreach(op =>
      try applyOp(op)
      catch { case _: Exception => () }) // refused DDL: no state change

    // 1. the cross-cluster surface: a FRESH read-only attach
    val r = attach(s"props_r_$n", dirF.getPath, writable = false)
    val seenDbs = r.listNamespaces().map(_.head).toSet
    val seenTables = model.dbs.flatMap(db =>
      r.listTables(Array(db)).map(i => (db, i.name)).toSet)
    val seenViews = model.dbs.flatMap(db =>
      r.listViews(db).map(i => (db, i.name)).toSet)
    val seenFns = model.dbs.flatMap(db =>
      r.listFunctions(Array(db)).map(i => (db, i.name)).toSet)
    val stateOk = seenDbs == model.dbs && seenTables == model.tables &&
      seenViews == model.views && seenFns == model.fnSet

    // 2. revision log: one revision per successful mutation
    val head = new java.io.File(dirF, "HEAD")
    val headRev =
      if (history.isEmpty) !head.isFile
      else head.isFile && new String(java.nio.file.Files
        .readAllBytes(head.toPath)).trim.toInt == history.length
    val revList = Option(new java.io.File(dirF, "revs").list())
      .map(_.flatMap(_.toIntOption).sorted.toSeq).getOrElse(Nil)
    val revsOk = revList == (1 to history.length)

    // 3. time travel: a mid-sequence revision replays the model then
    val travelOk = history.isEmpty || {
      val rev = 1 + (n * 7) % history.length // deterministic pick
      val snap = CatalogTransfer.read(spark, s"${dirF.getPath}/revs/$rev")
      val m = history(rev - 1)
      snap.databases.map(_.name).toSet == m.dbs &&
        snap.tables.filter(_.tableType != "VIEW")
          .map(t => (t.db, t.name)).toSet == m.tables &&
        snap.tables.filter(_.tableType == "VIEW")
          .map(t => (t.db, t.name)).toSet == m.views &&
        snap.functions.map(f => (f.db, f.name)).toSet == m.fnSet
    }

    if (!(stateOk && headRev && revsOk && travelOk))
      println(s"case $n: ops=$ops\n  model=$model\n  seen=" +
        s"($seenDbs, $seenTables, $seenViews, $seenFns)\n  " +
        s"revs=$revList expected=1..${history.length}")
    stateOk && headRev && revsOk && travelOk
  }
}

/** Property check of [[CatalogTransfer.syncApply]] (r13): for ANY
  * subset of five independent drift operations — property alter, table
  * drop, extra table, schema widen, function drop — the incremental
  * sync must emit exactly one repair action per drifted object,
  * converge to a zero diff against the source snapshot, and be
  * idempotent (a second sync applies nothing). Each drift targets its
  * own object so |actions| == |drifts| exactly. */
object SyncApplyProps extends Properties("graft.syncapply") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private val driftGen: Gen[Seq[Int]] =
    Gen.someOf(0 to 4).map(_.toSeq.sorted)

  property("converges with one action per drifted object, " +
      "for any drift subset") = forAll(driftGen) { drifts =>
    val s = spark
    s.sql("DROP DATABASE IF EXISTS graft_syncprop CASCADE")
    s.sql("CREATE DATABASE graft_syncprop")
    s.sql(s"""CREATE TABLE graft_syncprop.t_prop
             |USING parquet LOCATION '$sf/nation.parquet'""".stripMargin)
    s.sql(s"""CREATE TABLE graft_syncprop.t_drop
             |USING parquet LOCATION '$sf/region.parquet'""".stripMargin)
    s.sql(s"""CREATE TABLE graft_syncprop.t_col
             |USING parquet LOCATION '$sf/part.parquet'""".stripMargin)
    s.sql("""CREATE FUNCTION graft_syncprop.fn_p
            |AS 'org.apache.hadoop.hive.ql.udf.UDFPI'""".stripMargin)
    val src = CatalogTransfer.export(s, Seq("graft_syncprop"))
    drifts.foreach {
      case 0 => s.sql("""ALTER TABLE graft_syncprop.t_prop
                        |SET TBLPROPERTIES ('drift' = 'y')""".stripMargin)
      case 1 => s.sql("DROP TABLE graft_syncprop.t_drop")
      case 2 => s.sql(s"""CREATE TABLE graft_syncprop.extra_p
                         |USING parquet LOCATION '$sf/supplier.parquet'"""
                  .stripMargin)
      case 3 => s.sql("""ALTER TABLE graft_syncprop.t_col
                        |ADD COLUMNS (drift_col INT)""".stripMargin)
      case 4 => s.sharedState.externalCatalog
                  .dropFunction("graft_syncprop", "fn_p")
    }
    val actions = CatalogTransfer.syncApply(s, src, Seq("graft_syncprop"))
    val oneActionPerDrift = actions.length == drifts.length
    val converged = CatalogTransfer.diff(s, src,
      CatalogTransfer.export(s, Seq("graft_syncprop"))).isEmpty
    val idempotent =
      CatalogTransfer.syncApply(s, src, Seq("graft_syncprop")).isEmpty
    if (!(oneActionPerDrift && converged && idempotent))
      println(s"drifts=$drifts actions=$actions " +
        s"converged=$converged idempotent=$idempotent")
    oneActionPerDrift && converged && idempotent
  }
}
