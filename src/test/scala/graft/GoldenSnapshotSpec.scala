package graft

import java.nio.file.{Files, Paths}
import graft.catalog.CatalogTransfer

/** Golden-file test (SURVEY.md §5.2 #4): the canonical JSON rendering of
  * a fixed fixture catalog is committed and diffed — any change to the
  * snapshot schema or scrubbing rules shows up as a golden diff. Paths
  * are relativized so the golden file is machine-independent. */
class GoldenSnapshotSpec extends SparkSpec {

  private val goldenPath = "src/test/resources/golden/meta_export.json"

  test("meta_export canonical snapshot matches the committed golden file") {
    spark.sql("DROP DATABASE IF EXISTS graft_golden CASCADE")
    spark.sql("CREATE DATABASE graft_golden COMMENT 'golden fixture db'")
    spark.sql(s"""CREATE TABLE graft_golden.nation_g
                 |USING parquet LOCATION '$sf/nation.parquet'""".stripMargin)
    spark.sql("""ALTER TABLE graft_golden.nation_g
                |SET TBLPROPERTIES ('graft.kind' = 'golden')""".stripMargin)
    spark.sql(s"""CREATE TABLE graft_golden.region_g
                 |USING parquet LOCATION '$sf/region.parquet'""".stripMargin)
    val snap = CatalogTransfer.export(spark, Seq("graft_golden"))
    // locations render as file:/..., file://... or file:///... depending
    // on the URI normalization — relativize on the bare path so the
    // golden file really is machine-independent.
    val got = CatalogTransfer.toCanonicalJson(spark, snap)
      .replace(sf, "<SF>") + "\n"
    val p = Paths.get(goldenPath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, got)
      fail(s"golden file created at $goldenPath — commit it and re-run")
    }
    assert(got == Files.readString(p),
      s"snapshot drifted from golden; got:\n$got")
  }

  private val ddlGoldenPath = "src/test/resources/golden/meta_ddl_script.sql"

  test("meta_ddl_script DDL text matches the committed golden file") {
    // CatalogSpec proves the script EXECUTES back to a drift-free
    // catalog (semantic fidelity); this pins the TEXT itself — a quoting
    // change, a reordered clause, or a lost IF NOT EXISTS alters the
    // reviewable migration artifact an operator diffs, even when the
    // semantics survive. Paths are relativized (fixture dir, scratch
    // dir, fixture-mangled scratch key) so the file is
    // machine-independent.
    val rows = graft.catalog.DdlQueries.ddlScript(spark, sf)
      .orderBy("stmt_order").collect()
    val scratchAbs = new java.io.File("target/scratch").getAbsolutePath
    val sfAbs = new java.io.File(sf).getAbsolutePath
    val got = rows.map(r => s"-- ${r.getString(1)}\n${r.getString(2)};")
      .mkString("", "\n", "\n")
      .replace("file://" + scratchAbs, "<SCRATCH>")
      .replace("file://" + sfAbs, "<SF>")
      .replace(sf.replaceAll("[^A-Za-z0-9._-]", "_"), "<SFKEY>")
      .replace(sf, "<SF>")
    val p = Paths.get(ddlGoldenPath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, got)
      fail(s"golden file created at $ddlGoldenPath — commit it and re-run")
    }
    assert(got == Files.readString(p),
      s"DDL script drifted from golden; got:\n$got")
  }

  // The BPE pair is scalatest-by-design (iterative corpus-wide argmax —
  // no SQL oracle), so its unguarded surface was the largest of the
  // no-oracle tail. These pins close it the meta_ddl_script way: the
  // trainer's merge table and a fixed encode sample are committed as
  // golden files, so ANY drift in the training rule, the tie-break, the
  // batching, or the encode regex fails the suite loudly even without a
  // DuckDB oracle. (CurationOpsSpec keeps the semantic laws — plain-
  // Scala replay equality and monotone shrinkage; this pins the VALUES.)

  private val bpeMergesGoldenPath =
    "src/test/resources/golden/text_bpe_merges.tsv"

  test("text_bpe_merges merge table matches the committed golden file") {
    val rows = SparkEntry.queries("text_bpe_merges")(spark, sf)
      .orderBy("merge_rank").collect()
    val got = rows.map(r => s"${r.getAs[Int]("merge_rank")}\t" +
        s"${r.getAs[String]("pair")}\t${r.getAs[Long]("n_occurrences")}")
      .mkString("", "\n", "\n")
    val p = Paths.get(bpeMergesGoldenPath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, got)
      fail(s"golden file created at $bpeMergesGoldenPath — commit it " +
        "and re-run")
    }
    assert(got == Files.readString(p),
      s"BPE merge table drifted from golden; got:\n$got")
  }

  private val logregGoldenPath =
    "src/test/resources/golden/ml_logreg_gd_trajectory.tsv"

  test("ml_logreg_gd weight trajectory matches the committed golden file") {
    // the 25-step GD can't be bitwise cross-engine (libm sigmoid/log),
    // so the BPE precedent applies: the full per-iteration weight
    // vector + loss is committed, and ANY drift in the trainer — the
    // standardization constants, the gradient rule, the clamping, the
    // step size, a lost iteration — fails loudly instead of silently
    // shifting the final coefficients within the key's 4-decimal round.
    val (traj, _) = graft.operators.FeatureOps.logregTrajectory(spark, sf)
    assert(traj.size == 25, s"expected 25 iterations, got ${traj.size}")
    val got = traj.map { case (it, w, loss) =>
      f"$it%d\t${w(0)}%.4f\t${w(1)}%.4f\t${w(2)}%.4f\t$loss%.4f"
    }.mkString("", "\n", "\n")
    val p = Paths.get(logregGoldenPath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, got)
      fail(s"golden file created at $logregGoldenPath — commit it " +
        "and re-run")
    }
    assert(got == Files.readString(p),
      s"GD weight trajectory drifted from golden; got:\n$got")
  }

  private val bpeEncodeGoldenPath =
    "src/test/resources/golden/text_bpe_encode.tsv"

  test("text_bpe_encode sample matches the committed golden file") {
    // first 25 docs by id: enough to cover merged and untouched docs;
    // n_raw/n_bpe/ratio pin the end-to-end encode (merge table ×
    // greedy left-to-right application) numerically.
    val rows = SparkEntry.queries("text_bpe_encode")(spark, sf)
      .orderBy("doc_id").limit(25).collect()
    val got = rows.map(r => s"${r.getAs[Long]("doc_id")}\t" +
        s"${r.getAs[Long]("n_raw")}\t${r.getAs[Long]("n_bpe")}\t" +
        s"${r.getAs[Double]("ratio")}")
      .mkString("", "\n", "\n")
    val p = Paths.get(bpeEncodeGoldenPath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, got)
      fail(s"golden file created at $bpeEncodeGoldenPath — commit it " +
        "and re-run")
    }
    assert(got == Files.readString(p),
      s"BPE encode sample drifted from golden; got:\n$got")
  }
}
