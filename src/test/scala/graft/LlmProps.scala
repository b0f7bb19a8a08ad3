package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property laws for the LLM-pipeline primitives: hashing determinism,
  * Jaccard bounds/symmetry, dedup idempotence — checked on generated
  * micro-corpora against plain Scala reference computations. */
object LlmProps extends Properties("graft.llm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def spark = SparkSpec.spark

  private val word = Gen.oneOf("the", "fast", "key", "order", "sort",
    "table", "scan", "merge", "row", "disk")
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))
  private val corpus = Gen.listOfN(8, doc)

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  property("engine bigram jaccard equals reference computation") =
    forAll(corpus) { texts =>
      import org.apache.spark.sql.functions._
      val s = spark
      import s.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("tokens", split(col("text"), " "))
        .withColumn("sh", expr(
          """array_distinct(transform(slice(sequence(1, size(tokens)), 1, greatest(size(tokens) - 1, 0)),
            |  i -> concat(element_at(tokens, i), ' ',
            |              element_at(tokens, i + 1))))""".stripMargin))
      val a = df.select(col("doc_id").as("ia"), col("sh").as("sa"))
      val b = df.select(col("doc_id").as("ib"), col("sh").as("sb"))
      val got = a.crossJoin(b).filter(col("ia") < col("ib"))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("j",
          col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
        .select("ia", "ib", "j").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSet
      got.forall { case ((i, j), v) =>
        val want = jaccard(shingles(texts(i.toInt)), shingles(texts(j.toInt)))
        math.abs(v - want) < 1e-12 && v >= 0.0 && v <= 1.0
      }
    }

  property("xxhash64 minhash signatures are deterministic and stable") =
    forAll(doc) { text =>
      import org.apache.spark.sql.functions._
      val s = spark
      import s.implicits._
      def sig(): Seq[Long] = Seq(text).toDF("text")
        .withColumn("tokens", split(col("text"), " "))
        .selectExpr(
          """transform(sequence(0, 15),
            |  p -> array_min(transform(tokens, t -> xxhash64(t, p)))) AS sig""".stripMargin)
        .head().getSeq[Long](0)
      sig() == sig()
    }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOfN(10, for {
      a <- Gen.choose(0L, 11L); b <- Gen.choose(0L, 11L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.distinct)

  property("connected components agree with reference union-find") =
    forAll(edgeList suchThat (_.nonEmpty)) { edges =>
      val s = spark
      import s.implicits._
      val got = graft.nlp.CorpusOps.connectedComponents(
          edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: tiny driver-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) parent(find(a)) = find(b)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.groupBy(find).flatMap { case (_, members) =>
        members.map(_ -> members.min)
      }.toMap
      got == want
    }

  // pure-JVM codec round-trips over RANDOM metadata — exercises the
  // dimension/frame-count/sample-rate extremes the fixed-doc law specs
  // can't: every synthesized container must decode back to the
  // generator's closed form bit-for-bit (no Spark involved; these are
  // the per-row kernels the mm_* keys run inside mapPartitions).
  private val ids = Gen.chooseNum(0L, 100000L)
  private val chars = Gen.chooseNum(0L, 100000L)

  property("WAV codec round-trip is lossless for any metadata") =
    forAll(ids, chars) { (id, nChars) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(sim.Multimodal.makeWav(id, nChars)))
      val n = 32 + (nChars % 41).toInt
      val buf = ais.readAllBytes()
      def s(i: Int): Int = (buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)
      ais.getFormat.getSampleRate.toInt == 8000 + (id % 8).toInt * 1000 &&
        buf.length == n * 2 &&
        (0 until n).forall(i =>
          s(i) == (((31L * id + 7L * i) % 65536L) - 32768L).toInt)
    }

  property("GIF container round-trip is lossless for any metadata") =
    forAll(ids, chars) { (id, nChars) =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(sim.Multimodal.makeGif(id, nChars))))
      val (w, h) = sim.Multimodal.imgDims(id, nChars)
      val n = reader.getNumImages(true)
      n == 2 + (id % 7).toInt && (0 until n).forall { f =>
        val img = reader.read(f)
        img.getWidth == w && img.getHeight == h &&
          (0 until h).forall(y => (0 until w).forall(x =>
            (img.getRGB(x, y) & 0xff) ==
              ((7L * x + 13L * y + 31L * f + id) % 256L).toInt))
      }
    }

  property("exact dedup is idempotent") = forAll(corpus) { texts =>
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def dedup(in: org.apache.spark.sql.DataFrame) =
      in.withColumn("h", sha2(col("text"), 256))
        .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
        .join(in, "doc_id").select("doc_id", "text")
    val once = dedup(df)
    val twice = dedup(once)
    once.collect().toSet == twice.collect().toSet &&
      once.count() == texts.distinct.size
  }
}
