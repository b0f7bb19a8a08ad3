package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-validation of the hand-rolled MinHash+LSH dedup against MLlib's
  * MinHashLSH on the same corpus: two independent implementations of the
  * same sketch family must agree on the high-similarity pair set. */
class MllibCrossCheckSpec extends SparkSpec {

  test("MLlib MinHashLSH finds the same near-dup pairs") {
    val ourPairs = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ourPairs.nonEmpty)

    val shingled = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 1000)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("sh", expr(
        """array_distinct(transform(slice(sequence(1, size(tokens)), 1, greatest(size(tokens) - 2, 0)),
          |  i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1),
          |              ' ', element_at(tokens, i + 2))))""".stripMargin))
      .filter(size(col("sh")) > 2)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(shingled).select("doc_id", "features")
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L)
    val model = lsh.fit(featured)
    // jaccard DISTANCE threshold 0.2 == similarity 0.8
    val mlPairs = model
      .approxSimilarityJoin(featured, featured, 0.2, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Both pipelines verify candidates exactly, so each side is a subset
    // of the true Jaccard≥0.8 pair set; but each can independently miss
    // a marginal pair with probability ~(1-j⁴)¹⁶. Strict equality would
    // be fragile to fixture regeneration — require mutual recall ≥ 0.9
    // instead (identical on the current fixtures).
    val overlap = (mlPairs intersect ourPairs).size.toDouble
    assert(overlap / ourPairs.size >= 0.9 && overlap / mlPairs.size >= 0.9,
      s"MLlib found ${mlPairs -- ourPairs} extra, missed ${ourPairs -- mlPairs}")
  }

  test("embed_pca captures dominant variance, deterministically") {
    val rows = SparkEntry.queries("embed_pca")(spark, sf).collect()
    val n = Tables(spark, sf, "embeddings").count()
    assert(rows.length == n, "a vector was dropped by the projection")
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val v1 = variance(rows.map(_.getAs[Double]("pc1")))
    val v2 = variance(rows.map(_.getAs[Double]("pc2")))
    assert(v1 >= v2 && v2 > 0, s"eigen order violated: $v1 < $v2")
    // the top PC must capture at least as much variance as ANY raw
    // coordinate axis (the defining property of PCA, translation-free)
    val coords = Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val maxAxisVar = (0 until coords.head.length)
      .map(i => variance(coords.map(_(i)))).max
    assert(v1 >= maxAxisVar - 1e-9,
      s"pc1 variance $v1 below best coordinate axis $maxAxisVar")
    // deterministic across reruns (sign canonicalization + fixed solver)
    val rerun = SparkEntry.queries("embed_pca")(spark, sf).collect()
    assert(rows.toSeq == rerun.toSeq, "PCA projection is not rerun-stable")
  }

  test("ml_linreg_normal matches MLlib's normal-equation solver") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val got = SparkEntry.queries("ml_linreg_normal")(spark, sf)
      .collect().head
    val data = Tables(spark, sf, "lineitem")
      .select(col("l_quantity").cast("double").as("x1"),
        col("l_discount").cast("double").as("x2"),
        col("l_extendedprice").cast("double").as("label"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(data)
    val model = new LinearRegression()
      .setSolver("normal").setRegParam(0.0).setFitIntercept(true)
      .fit(assembled)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-3 * math.max(1.0, math.abs(b))
    assert(close(got.getAs[Double]("b0"), model.intercept),
      s"intercept ${got.getAs[Double]("b0")} vs ${model.intercept}")
    assert(close(got.getAs[Double]("b1"), model.coefficients(0)),
      s"b1 ${got.getAs[Double]("b1")} vs ${model.coefficients(0)}")
    assert(close(got.getAs[Double]("b2"), model.coefficients(1)),
      s"b2 ${got.getAs[Double]("b2")} vs ${model.coefficients(1)}")
    assert(math.abs(got.getAs[Double]("r2") - model.summary.r2) < 1e-4,
      s"r2 ${got.getAs[Double]("r2")} vs ${model.summary.r2}")
  }
}
