package graft

/** Feature-engineering ops: the invariants the DuckDB oracle cannot
  * see. feat_* value-level correctness is the oracle's job; here we
  * pin the laws of the ones it can't reach (ml_logreg_gd has no
  * cross-engine oracle — 25 compounding float iterations).
  */
class FeatureOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ml_logreg_gd learns: loss below ln(2) start, sane accuracy") {
    val rows = run("ml_logreg_gd").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set("bias", "w_views", "w_clicks",
      "final_loss", "accuracy"), s"unexpected rows: ${rows.keySet}")
    rows.values.foreach(v =>
      assert(!v.isNaN && !v.isInfinite, s"non-finite value in $rows"))
    // at w = 0 the log-loss is exactly ln 2; any learning drops it
    assert(rows("final_loss") < math.log(2.0),
      s"loss ${rows("final_loss")} did not improve on the zero init")
    assert(rows("accuracy") >= 0.5,
      s"accuracy ${rows("accuracy")} below coin flip")
  }

  test("ml_logreg_gd is rerun-deterministic") {
    val a = run("ml_logreg_gd").collect().map(_.toSeq).toSeq
    val b = run("ml_logreg_gd").collect().map(_.toSeq).toSeq
    assert(a == b, "two trainings diverged — GD is not deterministic")
  }

  test("feat_hash_trick buckets cover the full customer table") {
    val rows = run("feat_hash_trick").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val customers = Tables(spark, sf, "customer").count()
    assert(total == customers,
      s"buckets hold $total of $customers customers")
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.forall(b => b >= 0 && b < 64),
      s"bucket out of [0, 64): ${buckets.min}..${buckets.max}")
  }

  test("feat_binning deciles are contiguous and balanced") {
    val rows = run("feat_binning").collect().sortBy(_.getAs[Int]("bin"))
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1,
      s"ntile sizes unbalanced: ${sizes.toSeq}")
    // bin upper edges never exceed the next bin's lower edge
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("hi") <= hi.getAs[Double]("lo"),
        s"bins overlap: ${lo.getAs[Double]("hi")} > ${hi.getAs[Double]("lo")}")
    }
  }

  test("feat_onehot is exactly one-hot and consistent with the label") {
    val rows = run("feat_onehot").collect()
    assert(rows.length == Tables(spark, sf, "customer").count())
    val segCols = rows.head.schema.fieldNames.filter(_.startsWith("seg_"))
    assert(segCols.nonEmpty)
    rows.foreach { r =>
      val hots = segCols.filter(c => r.getAs[Int](c) == 1)
      assert(hots.length == 1, s"row not one-hot: $r")
      assert(hots.head == s"seg_${r.getAs[String]("c_mktsegment").toLowerCase}",
        s"hot column ${hots.head} disagrees with label: $r")
    }
  }
}
