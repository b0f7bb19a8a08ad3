package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the ETL-pattern ops beyond their oracles:
  * merge accounting, CDC label consistency, feature-matrix totals. */
class EtlPatternsSpec extends SparkSpec {

  test("agg_incremental_merge accounts for every order exactly once") {
    val out = SparkEntry.queries("agg_incremental_merge")(spark, sf)
      .collect()
    val total = Tables(spark, sf, "orders").count()
    assert(out.map(_.getAs[Long]("n_orders")).sum == total,
      "merged counts do not cover the full table")
    // and the delta side is genuinely non-empty (the merge merges)
    val delta = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(delta > 0 && delta < total)
  }

  test("dim_change_capture labels are self-consistent") {
    val rows = SparkEntry.queries("dim_change_capture")(spark, sf)
      .collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
    assert(Set("insert", "delete", "update", "unchanged")
      .subsetOf(byAction.keySet), s"degenerate CDC: ${byAction.keySet}")
    byAction("insert").foreach(r => assert(r.isNullAt(r.fieldIndex("old_bal"))
      && !r.isNullAt(r.fieldIndex("new_bal"))))
    byAction("delete").foreach(r => assert(!r.isNullAt(r.fieldIndex("old_bal"))
      && r.isNullAt(r.fieldIndex("new_bal"))))
    byAction("update").foreach(r => assert(
      r.getAs[Double]("old_bal") != r.getAs[Double]("new_bal")))
    byAction("unchanged").foreach(r => assert(
      r.getAs[Double]("old_bal") == r.getAs[Double]("new_bal")))
    // every business key appears exactly once
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length
      == rows.length)
  }

  test("feat_user_matrix totals reconcile with the raw stream") {
    val rows = SparkEntry.queries("feat_user_matrix")(spark, sf).collect()
    val typed = Seq("n_view", "n_click", "n_purchase", "n_error")
      .map(f => rows.map(_.getAs[Long](f)).sum).sum
    val streamTyped = Tables(spark, sf, "events")
      .filter(col("event_type") =!= "signup").count()
    assert(typed == streamTyped,
      s"feature counts $typed != non-signup events $streamTyped")
    rows.foreach { r =>
      val hasValue = !r.isNullAt(r.fieldIndex("purchase_value"))
      assert(hasValue == (r.getAs[Long]("n_purchase") > 0),
        s"purchase_value null-ness disagrees with n_purchase: $r")
    }
  }

  test("dim_scd2_build: dense versions, disjoint ranges, one current") {
    val rows = SparkEntry.queries("dim_scd2_build")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("custkey")).foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to vs.length),
        s"key $k: versions not dense")
      assert(vs.count(_.getAs[Int]("is_current") == 1) == 1,
        s"key $k: not exactly one current row")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // ranges close strictly before the next opens, and
          // consecutive versions really changed (SCD2 records changes)
          assert(a.getAs[String]("eff_to") < b.getAs[String]("eff_from"),
            s"key $k: overlapping validity ranges")
          assert(a.getAs[String]("prio") != b.getAs[String]("prio"),
            s"key $k: un-collapsed duplicate value")
        case _ =>
      }
      assert(sorted.last.getAs[String]("eff_to") == "9999-12-31",
        s"key $k: open row not closed by the high date")
    }
  }

  test("audit_profile stats agree with directly-computed column facts") {
    val rows = SparkEntry.queries("audit_profile")(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val n = Tables(spark, sf, "customer").count()
    assert(rows.keySet ==
      Set("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_nonnull") <= n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
    }
    assert(rows("c_custkey").getAs[Long]("n_distinct") == n,
      "key column must be all-distinct")
    assert(rows("c_mktsegment").getAs[Long]("n_distinct") == 5)
    assert(rows("c_mktsegment").getAs[Any]("avg_num") == null,
      "string column has no mean")
  }

  test("audit_table_checksum is order-independent and detects a flip") {
    def sig(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("xor_sig"), r.getAs[Long]("sum_sig")))
        .sortBy(_._1).toVector
    val base = sig(
      SparkEntry.queries("audit_table_checksum")(spark, sf).collect())
    assert(base.nonEmpty)
    // order independence: the signature of a reshuffled table is the
    // signature (the property that lets source and target clusters
    // checksum under different partitionings/layouts)
    import org.apache.spark.sql.functions._
    Tables(spark, sf, "orders").orderBy(rand(7)).repartition(7)
      .createOrReplaceTempView("orders_shuffled")
    val shuffled = spark.table("orders_shuffled")
    val canon = concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      coalesce(col("o_orderstatus"), lit("∅")),
      coalesce(col("o_orderpriority"), lit("∅")),
      col("o_orderdate").cast("date").cast("string"))
    def checksum(df: org.apache.spark.sql.DataFrame) = sig(df
      .select((col("o_orderkey") % 16).as("bucket"),
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("h64"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h64)").as("xor_sig"),
        sum(col("h64") % 1000000007L).as("sum_sig"))
      .collect())
    assert(checksum(shuffled) == base, "reshuffle changed the signature")
    // sensitivity: one flipped cell must move exactly one bucket's sigs
    val perturbed = checksum(Tables(spark, sf, "orders")
      .withColumn("o_orderstatus",
        when(col("o_orderkey") === 1, lit("X"))
          .otherwise(col("o_orderstatus"))))
    val diffs = base.zip(perturbed).filter { case (a, b) => a != b }
    assert(diffs.length == 1 && diffs.head._1._1 == 1L % 16,
      s"single-row flip should move exactly bucket 1: $diffs")
  }

  test("fn_hash agrees with the RFC 1321 / FIPS 180-4 test vectors") {
    val s = spark
    import s.implicits._
    val r = Seq("abc").toDF("x").select(
      md5(col("x")).as("m"), sha2(col("x"), 256).as("s"))
      .collect().head
    assert(r.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(1) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("AES-GCM round-trips but never repeats a ciphertext") {
    val s = spark
    import s.implicits._
    // GCM (aes_encrypt's default, the production mode fn_aes_roundtrip
    // deliberately swaps for ECB) draws a fresh random IV per call: the
    // decrypt leg must invert it, and two encryptions of the SAME
    // plaintext must differ — the semantic-security property that makes
    // GCM un-oracle-able by value diff
    val rt = Seq("the quick brown fox").toDF("x").select(
      expr("cast(aes_decrypt(aes_encrypt(x, '0123456789abcdef'), " +
        "'0123456789abcdef') as string)").as("rt"))
      .collect().head.getString(0)
    assert(rt == "the quick brown fox")
    // two SEPARATE executions — in one projection Catalyst's CSE
    // (correctly) collapses the textually-identical calls
    def enc(): Array[Byte] = Seq("the quick brown fox").toDF("x")
      .select(expr("aes_encrypt(x, '0123456789abcdef')").as("c"))
      .collect().head.getAs[Array[Byte]]("c")
    assert(!java.util.Arrays.equals(enc(), enc()),
      "GCM produced identical ciphertexts — IV not randomized")
    // and a wrong key must fail loudly (GCM authenticates), caught by
    // the try_ variant as null rather than a crash
    val bad = Seq("x").toDF("x").select(
      expr("try_aes_decrypt(aes_encrypt(x, '0123456789abcdef'), " +
        "'FEDCBA9876543210')").as("d")).collect().head
    assert(bad.isNullAt(0), "wrong-key GCM decrypt must not succeed")
  }
}
