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
