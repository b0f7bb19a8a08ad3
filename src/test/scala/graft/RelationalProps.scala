package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based algebraic laws (SURVEY.md §5.2 #3) — engine results
  * cross-checked against Scala-collection semantics on small generated
  * tables. Spark actions are expensive, so each law runs a reduced
  * number of cases with tiny data. */
object RelationalProps extends Properties("graft.relational") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def spark = SparkSpec.spark

  private def df(xs: List[Long]) = {
    val s = spark
    import s.implicits._
    xs.toDF("v")
  }

  private val smallList = Gen.listOfN(30, Gen.chooseNum(0L, 20L))

  property("unionAll count additivity") = forAll(smallList, smallList) {
    (a, b) => df(a).unionAll(df(b)).count() == (a.size + b.size).toLong
  }

  property("union+distinct = set union") = forAll(smallList, smallList) {
    (a, b) =>
      val got = df(a).union(df(b)).distinct().collect().map(_.getLong(0)).toSet
      got == (a.toSet ++ b.toSet)
  }

  property("intersect = set intersection") = forAll(smallList, smallList) {
    (a, b) =>
      val got = df(a).intersect(df(b)).collect().map(_.getLong(0)).toSet
      got == a.toSet.intersect(b.toSet)
  }

  property("except = set difference") = forAll(smallList, smallList) {
    (a, b) =>
      val got = df(a).except(df(b)).collect().map(_.getLong(0)).toSet
      got == (a.toSet -- b.toSet)
  }

  property("inner join is commutative up to row multiset") =
    forAll(smallList, smallList) { (a, b) =>
      import org.apache.spark.sql.functions.col
      val l = df(a); val r = df(b).withColumnRenamed("v", "w")
      val lr = l.join(r, col("v") === col("w")).select("v").collect()
        .map(_.getLong(0)).sorted.toSeq
      val rl = r.join(l, col("w") === col("v")).select("v").collect()
        .map(_.getLong(0)).sorted.toSeq
      lr == rl
    }

  property("inner join multiplicity = product of per-key counts") =
    forAll(smallList, smallList) { (a, b) =>
      import org.apache.spark.sql.functions.col
      val got = df(a)
        .join(df(b).withColumnRenamed("v", "w"), col("v") === col("w"))
        .count()
      val ca = a.groupBy(identity).view.mapValues(_.size)
      val cb = b.groupBy(identity).view.mapValues(_.size)
      val want = ca.map { case (k, n) => n.toLong * cb.getOrElse(k, 0) }.sum
      got == want
    }

  property("distinct is idempotent") = forAll(smallList) { a =>
    val d1 = df(a).distinct()
    d1.count() == d1.distinct().count()
  }

  property("dense_rank max equals distinct value count") =
    forAll(smallList) { a =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      a.isEmpty || {
        val got = df(a)
          .withColumn("dr", dense_rank().over(Window.orderBy(col("v"))))
          .agg(max("dr")).head().getInt(0)
        got == a.distinct.size
      }
    }

  property("exact dedup keeps exactly one row per key (the minimum id)") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 100L)))) {
      rows =>
        import org.apache.spark.sql.functions._
        val s = spark
        import s.implicits._
        rows.isEmpty || {
          val got = rows.toDF("k", "id").groupBy("k")
            .agg(min("id").as("keeper")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
          got == want
        }
    }
}
