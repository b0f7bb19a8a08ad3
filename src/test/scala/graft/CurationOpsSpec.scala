package graft

import org.apache.spark.sql.functions._

/** Round-7 curation ops: deterministic sampling/splitting, perplexity
  * bucketing, incremental dedup, and SemDeDup. Invariants here are the
  * ones the DuckDB oracle cannot see (injection bookkeeping, rerun
  * stability); value-level correctness is the oracle's job. */
class CurationOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sample_reservoir is fixed-size and rerun-stable") {
    val a = run("sample_reservoir").collect()
    val b = run("sample_reservoir").collect()
    assert(a.length == 120, s"expected K=120 rows, got ${a.length}")
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "two runs selected different docs — sample is not deterministic")
  }

  test("split_train_eval partitions the whole corpus exactly once") {
    val rows = run("split_train_eval").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables(spark, sf, "documents").count()
    assert(total == corpus,
      s"splits cover $total docs, corpus has $corpus — docs lost or doubled")
    val parts = rows.map(_.getAs[String]("part")).toSet
    assert(parts == Set("train", "val", "test"), s"parts were $parts")
  }

  test("text_ppl_bucket covers every doc and orders bucket means") {
    val rows = run("text_ppl_bucket").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables(spark, sf, "documents").count()
    assert(total == corpus, s"buckets cover $total of $corpus docs")
    // global terciles: pooled across langs, head mean < tail mean
    def mean(b: String): Double = {
      val r = rows.filter(_.getAs[String]("bucket") == b)
      r.map(x => x.getAs[Double]("mean_nll") * x.getAs[Long]("n_docs")).sum /
        r.map(_.getAs[Long]("n_docs")).sum
    }
    assert(mean("head") < mean("tail"),
      "head bucket should hold lower-NLL (in-distribution) docs than tail")
  }

  test("dedup_incremental rejects re-crawls, collapses in-batch dups") {
    val rows = run("dedup_incremental").collect()
    // every injected re-crawl (+500000) hash-matches the index → none
    // may survive the anti-join
    val recrawls = rows.map(_.getAs[Long]("doc_id"))
      .filter(id => id >= 500000L && id < 600000L)
    assert(recrawls.isEmpty, s"index dups admitted: ${recrawls.toSeq}")
    // in-batch dup groups collapse to the base doc (min id), count 2
    val dupGroups = rows.filter(_.getAs[Long]("n_in_batch") > 1)
    assert(dupGroups.nonEmpty, "fixture produced no in-batch dup groups")
    dupGroups.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id >= 300 && id < 600000L && id % 11 == 0,
        s"dup group kept $id, expected the base %11 doc")
      assert(r.getAs[Long]("n_in_batch") == 2L,
        s"dup group of $id has ${r.getAs[Long]("n_in_batch")} members")
    }
  }

  test("n-gram guard yields empty arrays for sub-K-token docs") {
    // sequence(1, 0) in Spark is the DESCENDING [1, 0], so the old
    // sequence(1, greatest(size - K, 0)) guard dereferenced invalid
    // token indices and crashed on any doc shorter than its K-gram;
    // the slice(sequence(1, size), ...) form must return [] instead
    val r = spark.sql(
      """SELECT transform(
        |  slice(sequence(1, size(t)), 1, greatest(size(t) - 2, 0)),
        |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ',
        |              element_at(t, i + 2))) AS tri
        |FROM (SELECT split('hello world', ' ') AS t)""".stripMargin)
      .head.getSeq[String](0)
    assert(r.isEmpty, s"2-token doc produced trigrams: $r")
  }

  test("text_domain_mix rates cap at 1.0 and shares are consistent") {
    val rows = run("text_domain_mix").collect()
    assert(rows.length > 1, "mix manifest collapsed to one source")
    rows.foreach { r =>
      val rate = r.getAs[Long]("sample_rate_x1e4")
      assert(rate > 0 && rate <= 10000, s"rate $rate out of (0, 1]")
      // a source whose target share exceeds its actual share cannot be
      // downsampled — its rate must sit at the cap
      if (r.getAs[Long]("target_share_x1e6") >
          r.getAs[Long]("actual_share_x1e6"))
        assert(rate == 10000,
          s"under-represented ${r.getAs[String]("source")} downsampled")
    }
    // floor-rounded shares sum to ≤ 1e6 and within one ulp per source
    val act = rows.map(_.getAs[Long]("actual_share_x1e6")).sum
    assert(act <= 1000000L && act > 1000000L - rows.length,
      s"actual shares sum to $act")
  }

  test("text_entropy respects the log2(n) bound and exact cases") {
    val rows = run("text_entropy").collect()
    rows.foreach { r =>
      val (h, n) = (r.getAs[Double]("entropy"), r.getAs[Long]("n_tokens"))
      assert(h >= 0 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-9,
        s"entropy $h outside [0, log2($n)]")
    }
    // independent recompute for one doc in plain Scala
    val doc0 = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 0).select("text").head.getString(0)
    val toks = doc0.split(" ")
    val n = toks.length.toDouble
    val expected = -toks.groupBy(identity).values
      .map(g => g.length / n * (math.log(g.length / n) / math.log(2.0)))
      .sum
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get
      .getAs[Double]("entropy")
    assert(math.abs(got - expected) < 1e-3, s"doc 0: $got vs $expected")
  }

  test("text_gopher_filter: pass is the conjunction, rules non-degenerate") {
    val rows = run("text_gopher_filter").collect()
    rows.foreach { r =>
      val flags = Seq("f_len", "f_wordlen", "f_stop", "f_rep")
        .map(r.getAs[Int])
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getAs[Int]("pass") == flags.product,
        s"pass is not the AND of the rules: $r")
    }
    for (f <- Seq("f_len", "f_stop", "f_rep")) {
      val passed = rows.count(_.getAs[Int](f) == 1)
      assert(passed > 0 && passed < rows.length,
        s"rule $f is degenerate on the fixture ($passed/${rows.length})")
    }
  }

  test("sim_mips matches a plain-Scala inner-product recompute") {
    val rows = run("sim_mips").collect()
      .filter(_.getAs[Long]("qid") == 0L)
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble))
      .toMap
    val q = vecs(0L)
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> q.zip(v).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, ip) => (-ip, id) }.take(5)
    rows.sortBy(_.getAs[Int]("rn")).zip(expected).foreach {
      case (r, (id, ip)) =>
        assert(r.getAs[Long]("neighbor") == id,
          s"rank ${r.getAs[Int]("rn")}: ${r.getAs[Long]("neighbor")} != $id")
        assert(math.abs(r.getAs[Double]("ip") - ip) < 1e-3)
    }
  }

  test("text_bpe_merges matches a plain-Scala replay of all rounds") {
    val got = run("text_bpe_merges").collect().map(r =>
      (r.getAs[Int]("merge_rank"), r.getAs[String]("pair"),
        r.getAs[Long]("n_occurrences"))).toSeq
    var corpus = Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    // batched-greedy replay, same rule as the trainer: per sync round,
    // sort pair counts by (n desc, pair asc), scan the top BpeBatchScan
    // candidates, accept token-disjoint pairs up to the remaining
    // budget, apply them all, re-count.
    val expected = collection.mutable.ArrayBuffer[(Int, String, Long)]()
    var exhausted = false
    while (expected.size < 10 && !exhausted) {
      val counts = collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      corpus.foreach { t =>
        val w = t.split(" ")
        for (i <- 0 until w.length - 1) counts(w(i) + " " + w(i + 1)) += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val budget = 10 - expected.size
        val used = collection.mutable.Set.empty[String]
        val accepted = collection.mutable.ArrayBuffer.empty[(String, Long)]
        counts.toSeq.sortBy { case (p, c) => (-c, p) }
          .take(graft.nlp.CorpusOps.BpeBatchScan)
          .iterator.takeWhile(_ => accepted.size < budget)
          .foreach { case (pair, n) =>
            val Array(a, b) = pair.split(" ", 2)
            if (!used(a) && !used(b)) {
              used += a; used += b; accepted += ((pair, n))
            }
          }
        accepted.foreach { case (pair, n) =>
          expected += ((expected.size + 1, pair, n))
          val Array(a, b) = pair.split(" ", 2)
          corpus = corpus.map { t => // greedy left-to-right, non-overlap
            val w = t.split(" ")
            val out = collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < w.length) {
              if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
                out += a + "_" + b; i += 2
              } else { out += w(i); i += 1 }
            }
            out.mkString(" ")
          }
        }
      }
    }
    assert(got == expected.toSeq,
      s"merge tables diverge:\n$got\nvs\n${expected.toSeq}")
  }

  test("text_bpe_encode matches a plain-Scala application and shrinks") {
    val merges = run("text_bpe_merges").collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(_.getAs[String]("pair"))
    val got = run("text_bpe_encode").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_bpe"))).toMap
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      // greedy left-to-right non-overlapping, rank order — the same
      // semantics the trainer's regex rewrite applies
      val enc = merges.foldLeft(text.split(" ").toSeq) { (w, pair) =>
        val Array(a, b) = pair.split(" ", 2)
        val out = collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
            out += a + "_" + b; i += 2
          } else { out += w(i); i += 1 }
        }
        out.toSeq
      }
      val (nRaw, nBpe) = got(id)
      assert(nRaw == text.split(" ").length.toLong,
        s"doc $id raw count drifted")
      assert(nBpe == enc.length.toLong,
        s"doc $id: engine encoded to $nBpe tokens, replay got ${enc.length}")
      assert(nBpe <= nRaw, s"doc $id gained tokens under BPE")
    }
    assert(got.values.exists { case (r, b) => b < r },
      "no document shrank — merges never applied")
  }

  test("dedup_semantic drops only injected copies, never originals") {
    val rows = run("dedup_semantic").collect()
    val drops = rows.filter(_.getAs[String]("status") == "drop")
      .map(_.getAs[Long]("vec_id"))
    assert(drops.nonEmpty, "no injected near-dup was dropped")
    // pairs above τ exist only between an original and its +100000
    // copy; the original has the smaller id, so it always wins
    assert(drops.forall(_ >= 100000L),
      s"an original vector was dropped: ${drops.filter(_ < 100000L).toSeq}")
    val corpus = Tables(spark, sf, "embeddings").count()
    assert(rows.count(_.getAs[String]("status") == "keep") >= corpus,
      "dedup dropped more than the injected copies")
  }

  test("text_boilerplate flags every injected header and only real chunks") {
    val rows = run("text_boilerplate").collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boiler"))
      assert(b >= 0 && b <= n, s"boiler count out of range: $r")
      val keep = r.getAs[Double]("keep_ratio")
      // output is ROUND(...,4); allow the half-ulp of that rounding
      assert(math.abs(keep - (1.0 - b.toDouble / n)) < 5e-5)
      // the injected header chunk makes every 7th doc boilerplated
      if (r.getAs[Long]("doc_id") % 7 == 0)
        assert(b >= 1, s"injected header not flagged: $r")
    }
    // boilerplate must actually appear: ≥ the injected population
    val flagged = rows.count(_.getAs[Long]("n_boiler") > 0)
    assert(flagged >= rows.length / 7, s"only $flagged docs flagged")
  }

  test("dedup_substring matches a plain-Scala substring-dedup replay") {
    val banner = "this article was automatically generated please " +
      "visit the archive for more information"
    val texts = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        val t = r.getAs[String]("text")
        id -> (if (id % 11 == 0) t.take(50) + " " + banner + " " + t.drop(50)
               else t)
      }.toMap
    val L = 40
    // every stride-1 L-gram with global multiplicity ≥ 2 marks its span
    val counts = collection.mutable.Map[String, Int]().withDefaultValue(0)
    for ((_, t) <- texts; p <- 0 to t.length - L)
      counts(t.substring(p, p + L)) += 1
    val expect = texts.map { case (id, t) =>
      val hits = (0 to t.length - L)
        .filter(p => counts(t.substring(p, p + L)) >= 2)
      // merge [p, p+L-1] covers that overlap or touch into islands
      val spans = hits.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p <= e0 + 1 =>
          (s0, math.max(e0, p + L - 1)) :: rest
        case (acc, p) => (p, p + L - 1) :: acc
      }
      id -> (spans.length.toLong, spans.map(s => s._2 - s._1 + 1).sum.toLong)
    }
    val got = run("dedup_substring").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars"))).toMap
    assert(got == expect,
      s"diff: ${(got.toSet diff expect.toSet).take(3)} vs " +
        s"${(expect.toSet diff got.toSet).take(3)}")
    // the injected banner must be detected in every 11th doc
    texts.keys.filter(_ % 11 == 0).foreach { id =>
      assert(got(id)._2 >= banner.length,
        s"doc $id: banner span not detected: ${got(id)}")
    }
  }
}
