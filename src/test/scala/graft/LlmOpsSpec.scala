package graft

import graft.sim.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-oracled group J ops: SimHash clustering behavior and the
  * multimodal decode plumbing. Data-driven: the sf0.001 and sf0.01
  * document fixtures are different corpora, so expected near-dup pairs
  * are computed, never hardcoded. */
class LlmOpsSpec extends SparkSpec {

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Exact word-trigram Jaccard ≥ 0.8 pairs by brute force (the slow
    * independent baseline the LSH path must reproduce). */
  private def exactPairs(): Set[(Long, Long)] = {
    val sets = Tables(spark, sf, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("sh", expr(
        """array_distinct(transform(slice(sequence(1, size(tokens)), 1, greatest(size(tokens) - 2, 0)),
          |  i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1),
          |              ' ', element_at(tokens, i + 2))))""".stripMargin))
      .select(col("doc_id"), col("sh"))
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("j",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val truePairs: Set[(Long, Long)] = exactPairs()

  test("minhash LSH pairs are verified-exact with high recall") {
    val lsh = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "fixture has no near-dup pairs to find")
    // every emitted pair passed the exact-Jaccard verify → no false
    // positives, ever; recall is probabilistic (a pair at j marginally
    // ≥0.8 misses all 16 bands with prob ~(1-j⁴)¹⁶), so assert a bound
    // rather than fragile set equality (currently 1.0 on the fixtures).
    assert((lsh -- truePairs).isEmpty,
      s"false positives survived the exact verify: ${lsh -- truePairs}")
    val recall = (lsh intersect truePairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"LSH recall $recall; missed ${truePairs -- lsh}")
  }

  test("10k injected exact copies: pair set stable, no bucket blowup") {
    import graft.nlp.TextOps
    val baseDocs = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 1000).select("doc_id", "text")
    val base = TextOps.shingled(baseDocs)
    val origPairs = TextOps.minhashPairs(base)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneText = base.orderBy("doc_id").select("text").head.getString(0)
    val copies = spark.range(10000)
      .select((col("id") + 2000000L).as("doc_id"), lit(oneText).as("text"))
    val injected = TextOps.shingled(baseDocs.union(copies))
    // the copies collapse to one signature row, so no band bucket may
    // grow past the cap (the executor-OOM hazard at 100 TB)...
    val maxSize = TextOps.minhashBuckets(injected)
      .agg(max(size(col("ids")))).head.getInt(0)
    assert(maxSize <= TextOps.maxBucket,
      s"bucket of size $maxSize exceeds cap ${TextOps.maxBucket}")
    // ...and the non-degenerate pair set (pairs among original docs) is
    // exactly what it was without the copies.
    val nonDegenerate = TextOps.minhashPairs(injected)
      .filter(col("doc_a") < 2000000L && col("doc_b") < 2000000L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nonDegenerate == origPairs,
      s"copies changed the pair set: missing ${origPairs -- nonDegenerate}, " +
        s"extra ${nonDegenerate -- origPairs}")
  }

  test("simhash separates near-dups from unrelated docs") {
    val sims = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = truePairs.toSeq.map { case (a, b) => hamming(sims(a), sims(b)) }
    val ids = sims.keys.toSeq.sorted
    val random = ids.take(40).zip(ids.reverse.take(40))
      .filterNot(p => truePairs.contains(p) || p._1 == p._2)
      .map { case (a, b) => hamming(sims(a), sims(b)) }
    val nearAvg = near.sum.toDouble / near.size
    val randAvg = random.sum.toDouble / random.size
    assert(nearAvg + 8 <= randAvg,
      s"no simhash separation: near-dup avg $nearAvg vs random avg $randAvg")
  }

  test("simhash is deterministic across runs") {
    val r1 = SparkEntry.queries("dedup_simhash")(spark, sf).collect()
    val r2 = SparkEntry.queries("dedup_simhash")(spark, sf).collect()
    assert(r1.sameElements(r2))
  }

  test("multimodal decode pipeline: real PNG codec round-trip") {
    // the part the closed-form oracle can't see: the media column is a
    // genuine PNG byte stream and the decode is a genuine codec parse
    for (id <- Seq(0L, 17L, 499L)) {
      val (w, h) = Multimodal.imgDims(id, id * 31 + 5)
      val bytes = Multimodal.makePng(id, w, h)
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G', s"doc $id: not a PNG stream")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.getRaster.getSample(x, y, 0) ==
          ((7L * x + 13L * y + id) % 256L).toInt,
          s"doc $id pixel ($x,$y) corrupted by the codec round-trip")
    }
    val feats: DataFrame = SparkEntry.queries("mm_decode_pipeline")(spark, sf)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = feats.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.length == docs.size)
    for ((id, w, h, bands) <- got) {
      val (ew, eh) = Multimodal.imgDims(id, docs(id))
      assert(w == ew && h == eh && bands == 1, s"doc $id dims mismatch")
    }
  }

  test("multimodal audio decode: real WAV codec round-trip") {
    // the part the closed-form oracle can't see: the media column is a
    // genuine RIFF/WAVE byte stream and the decode is a genuine codec
    // parse (header fields + every PCM sample, bit-for-bit)
    for ((id, nChars) <- Seq((0L, 0L), (17L, 523L), (499L, 40L))) {
      val bytes = Multimodal.makeWav(id, nChars)
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E', s"doc $id: not a WAV stream")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val n = 32 + (nChars % 41).toInt
      assert(fmt.getSampleRate.toInt == 8000 + (id % 8).toInt * 1000)
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      assert(ais.getFrameLength == n)
      val buf = ais.readAllBytes()
      for (i <- 0 until n) {
        val got = (buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)
        assert(got == (((31L * id + 7L * i) % 65536L) - 32768L).toInt,
          s"doc $id sample $i corrupted by the codec round-trip")
      }
    }
    // end-to-end: the Spark key's n_frames covers the whole corpus and
    // every row re-derives from metadata alone
    val rows = SparkEntry.queries("mm_audio_decode")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getLong(2) == 32 + (docs(id) % 41),
        s"doc $id frame count drifted through the container")
      assert(r.getInt(3) == 1)
    }
  }

  test("mm_video_frames: real multi-frame GIF container round-trip") {
    // the part the closed-form oracle can't see: the media column is a
    // genuine GIF89a stream and frame extraction is a genuine container
    // parse — frame count from the stream, every pixel bit-for-bit
    for ((id, nChars) <- Seq((0L, 0L), (17L, 523L), (499L, 40L))) {
      val bytes = Multimodal.makeGif(id, nChars)
      assert(new String(bytes.take(6), "ASCII") == "GIF89a",
        s"doc $id: not a GIF stream")
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      assert(n == 2 + (id % 7).toInt, s"doc $id frame count drifted")
      val (w, h) = Multimodal.imgDims(id, nChars)
      for (f <- 0 until n) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w)
          assert((img.getRGB(x, y) & 0xff) ==
            ((7L * x + 13L * y + 31L * f + id) % 256L).toInt,
            s"doc $id frame $f pixel ($x,$y) corrupted by the container")
      }
    }
    // end-to-end: per-doc frame counts over the corpus follow the law
    val counts = SparkEntry.queries("mm_video_frames")(spark, sf)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.nonEmpty)
    for ((id, c) <- counts)
      assert(c == 2 + id % 7, s"doc $id emitted $c frames")
  }

  test("mm_video_scene_cut: gate laws hold and discriminate") {
    val rows = SparkEntry.queries("mm_video_scene_cut")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, n, cuts) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(n == 2 + id % 7, s"doc $id frame count drifted")
      assert(cuts <= n - 1, s"doc $id: more cuts than transitions")
      // max_delta bounds every delta, so zero cuts implies max under
      // the per-pixel threshold would need dims — just sign law here:
      assert(r.getLong(3) >= 0)
    }
    // the gate must DISCRIMINATE on this corpus: some docs cut, some
    // don't — a degenerate threshold (all or none) is a broken gate
    val withCuts = rows.count(_.getLong(2) > 0)
    assert(withCuts > 0 && withCuts < rows.length,
      s"scene-cut gate is degenerate: $withCuts of ${rows.length}")
  }

  test("mm_image_features: laws hold and a raster replay agrees") {
    val rows = SparkEntry.queries("mm_image_features")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (mean, mn, mx) = (r.getDouble(3), r.getInt(4), r.getInt(5))
      assert(mn >= 0 && mx <= 255 && mn <= mx, s"pixel range law: $mn..$mx")
      assert(mean >= mn - 1e-9 && mean <= mx + 1e-9,
        s"mean $mean outside [$mn, $mx]")
      // gradient bound: each of the (w-1)*h steps moves at most 255
      assert(r.getLong(6) <= 255L * (w - 1) * h, "gradient energy bound")
    }
    // independent replay for a few docs from the decoded raster
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    for (d <- Tables(spark, sf, "documents")
        .select(col("doc_id"), col("n_chars")).collect().take(3)) {
      val (id, nChars) = (d.getLong(0), d.getLong(1))
      val (w, h) = Multimodal.imgDims(id, nChars)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.makePng(id, w, h)))
      val ps = for (y <- 0 until h; x <- 0 until w)
        yield img.getRaster.getSample(x, y, 0)
      val gx = (for (y <- 0 until h; x <- 1 until w) yield math.abs(
        img.getRaster.getSample(x, y, 0) -
          img.getRaster.getSample(x - 1, y, 0))).map(_.toLong).sum
      val r = byId(id)
      assert(r.getInt(4) == ps.min && r.getInt(5) == ps.max &&
        r.getLong(6) == gx, s"doc $id image feature replay mismatch")
    }
  }

  test("mm_audio_features: laws hold and a plain-Scala replay agrees") {
    val rows = SparkEntry.queries("mm_audio_features")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, zcr, peak, rms) =
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4))
      assert(peak <= 32768 && peak >= 0, s"peak out of s16 range: $peak")
      assert(rms <= peak + 1e-9, s"RMS $rms exceeds peak $peak")
      assert(zcr < n, s"more zero crossings than sample transitions")
    }
    // independent replay for a few docs: features from the WAV BYTES
    // (not the closed form) — pins the decode-side arithmetic
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect().take(3)
    for (d <- docs) {
      val (id, nChars) = (d.getLong(0), d.getLong(1))
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.makeWav(id, nChars)))
      val n = ais.getFrameLength.toInt
      val buf = ais.readAllBytes()
      def s(i: Int): Int = (buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)
      val zcr = (1 until n).count(i => (s(i - 1) >= 0) != (s(i) >= 0))
      val peak = (0 until n).map(i => math.abs(s(i))).max
      val r = byId(id)
      assert(r.getLong(1) == n && r.getLong(2) == zcr &&
        r.getInt(3) == peak, s"doc $id feature replay mismatch")
    }
  }

  test("sample_temperature: weights normalize and flatten the mixture") {
    val rows = SparkEntry.queries("sample_temperature")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("samp_weight"), r.getAs[Double]("upsample_x")))
    assert(rows.length >= 2)
    val wsum = rows.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-2, s"weights sum to $wsum")
    // temperature flattening: the sampled ratio between the largest and
    // smallest language is the SQRT of the raw token ratio
    val byTok = rows.sortBy(_._2)
    val (lo, hi) = (byTok.head, byTok.last)
    val rawRatio = hi._2.toDouble / lo._2
    val sampRatio = hi._3 / lo._3
    assert(math.abs(sampRatio - math.sqrt(rawRatio)) < 0.05 * sampRatio,
      s"flattening law violated: $sampRatio vs sqrt($rawRatio)")
    // upsample_x = q/p must exceed 1 for the rarest, undercut 1 for the
    // most common (that is the entire point of temperature sampling)
    assert(lo._4 > 1.0 && hi._4 < 1.0, s"upsample direction: $lo $hi")
  }

  test("text_bigram_lm: per-doc NLL behaves like a smoothed bigram LM") {
    val rows = SparkEntry.queries("text_bigram_lm")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("nll"))).toSeq
    val nTok = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every doc with ≥2 tokens scores; bigram count is tokens-1
    rows.foreach { case (id, nBg, nll) =>
      assert(nBg == nTok(id) - 1, s"doc $id: $nBg bigrams, ${nTok(id)} toks")
      assert(nll > 0, s"doc $id: smoothed NLL must be positive, got $nll")
    }
    assert(rows.map(_._1).toSet == nTok.filter(_._2 >= 2).keySet)
  }

  test("join_asof_tolerance: gaps bounded, all events preserved") {
    val rows = SparkEntry.queries("join_asof_tolerance")(spark, sf)
      .collect()
    val nEvents = Tables(spark, sf, "events").count()
    assert(rows.length == nEvents, "left as-of join must keep every event")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("o_orderkey"))) {
        val gap = r.getAs[Int]("gap_days")
        assert(gap >= 0 && gap <= 7, s"tolerance violated: $r")
      } else assert(r.isNullAt(r.fieldIndex("gap_days")), s"$r")
    }
    // the tolerance must actually bind on this fixture: some events
    // match under plain as-of but not under the 7-day bound
    val unmatched = rows.count(_.isNullAt(1))
    val asofUnmatched = SparkEntry.queries("join_asof")(spark, sf).count()
    assert(unmatched > nEvents - asofUnmatched,
      s"tolerance never binds: $unmatched unmatched vs plain as-of")
  }

  test("text_classifier_score: scores bounded, verdict is the threshold") {
    val rows = SparkEntry.queries("text_classifier_score")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens").toLong
      val sc = r.getAs[Long]("score_sum")
      // every weight lives in [-10, 10]
      assert(math.abs(sc) <= 10 * n, s"score outside weight bounds: $r")
      assert(r.getAs[Boolean]("keep") == (sc * 5 >= n),
        s"verdict disagrees with threshold: $r")
    }
    // the model must discriminate on the fixture, not rubber-stamp
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"classifier verdict is constant ($kept/${rows.length})")
  }

  test("corpus_filter_ensemble: votes, verdict and reason are consistent") {
    val rows = SparkEntry.queries("corpus_filter_ensemble")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // the ensemble shares its learned gate with text_classifier_score:
    // scores must agree doc-for-doc
    val clf = SparkEntry.queries("text_classifier_score")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_sum"))
      .toMap
    rows.foreach { r =>
      val votes = r.getAs[Int]("votes")
      val keep = r.getAs[Int]("keep")
      val reason = r.getAs[String]("reason")
      assert(votes >= 0 && votes <= 3)
      assert((keep == 1) == (reason == "keep"),
        s"keep flag disagrees with reason: $r")
      // keep requires all three gates; a kept doc must carry 3 votes
      if (keep == 1) assert(votes == 3, s"kept with missing votes: $r")
      if (r.getAs[Long]("n_words") < 25)
        assert(reason == "too_short", s"priority order broken: $r")
      assert(clf(r.getAs[Long]("doc_id")) == r.getAs[Long]("score"),
        s"ensemble score drifted from the classifier key: $r")
    }
    assert(rows.map(_.getAs[String]("reason")).distinct.length >= 3,
      "ensemble reasons do not discriminate on the fixture")
  }

  test("mm_image_phash: brightness-invariant where a byte hash is not") {
    import graft.sim.Multimodal
    def mk(shift: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        20, 14, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 14; x <- 0 until 20)
        // pattern capped at 199 so +shift never clips at 255
        img.getRaster.setSample(x, y, 0, (7 * x + 13 * y) % 200 + shift)
      img
    }
    val (h0, b0) = Multimodal.aHash16(mk(0))
    val (h40, b40) = Multimodal.aHash16(mk(40))
    // the perceptual property: a uniformly brightened copy (different
    // bytes, same picture) hashes identically — exact cross-multiply
    // cancellation, not approximation
    assert(h0 == h40 && b0 == b40,
      s"aHash not brightness-invariant: $h0/$b0 vs $h40/$b40")
    // and it still discriminates: an inverted image flips bits
    val inv = new java.awt.image.BufferedImage(
      20, 14, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 20)
      inv.getRaster.setSample(x, y, 0, 255 - ((7 * x + 13 * y) % 200))
    val (hInv, _) = Multimodal.aHash16(inv)
    assert(hInv != h0, "inverted image must not collide")
    // key-level: hashes discriminate on the fixture
    val rows = SparkEntry.queries("mm_image_phash")(spark, sf).collect()
    val distinct = rows.map(_.getAs[Long]("phash")).distinct.length
    assert(distinct > rows.length / 10,
      s"phash barely discriminates: $distinct/${rows.length}")
  }

  test("tolerant decode survives every corruption arm without throwing") {
    import graft.sim.Multimodal
    val good = Multimodal.makePng(7, 12, 9)
    // intact blob decodes ok with the closed-form probes
    val ok = Multimodal.decodeStatusRow(7, good)
    assert(ok.status == "ok" && ok.img_w == 12 && ok.img_h == 9 &&
      ok.px_00 == 7 % 256)
    // zeroed signature: no reader claims it (the null arm — what the
    // oracled fixture exercises)
    val unsigned = good.clone()
    java.util.Arrays.fill(unsigned, 0, 8, 0.toByte)
    assert(Multimodal.decodeStatusRow(8, unsigned).status == "corrupt")
    // valid signature but truncated body: the decoder starts and then
    // fails mid-stream (the IOException arm the fixture never reaches)
    val truncated = java.util.Arrays.copyOf(good, 40)
    assert(Multimodal.decodeStatusRow(9, truncated).status == "corrupt")
    // garbage tail after a valid signature: claimed by the PNG reader,
    // then chunk parsing explodes
    val mangled = good.clone()
    java.util.Arrays.fill(mangled, 8, mangled.length, 0x5A.toByte)
    assert(Multimodal.decodeStatusRow(10, mangled).status == "corrupt")
  }
}
