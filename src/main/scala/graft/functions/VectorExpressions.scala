package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}

/** Native Catalyst expressions for the vector hot path [NS: BASELINE.json
  * north_star — similarity search at 100 TB scale].
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates interpreted lambdas per element; these expressions compile
  * to a tight primitive loop inside whole-stage codegen — the preferred
  * extension point when built-ins can't express the computation
  * efficiently (custom Expression > UDF, per the Spark tuning guidance).
  *
  * Determinism contract: folds run left-to-right, index ascending —
  * exactly the order of both the previous lambda formulation and the
  * DuckDB oracle's LIST_REDUCE — so results are bit-identical doubles.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, nx = 0.0, ny = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xi = $a.getDouble(i);
         |  double yi = $b.getDouble(i);
         |  dot += xi * yi; nx += xi * xi; ny += yi * yi;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product of two array<double> columns (codegen'd). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0;
         |for (int i = 0; i < n; i++) {
         |  dot += $a.getDouble(i) * $b.getDouble(i);
         |}
         |${ev.value} = dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode against a FIXED codebook baked into the
  * expression (the trained artifact, ~1 KiB): per subspace `m`, the
  * argmin-L2 codeword over `cids(m)`/`cents(m)` (flattened row-major,
  * `subDim` doubles per codeword; cids sorted ascending so a strict `<`
  * keeps the smallest cid on exact ties — the trainer's min_by order).
  *
  * Why an Expression and not SQL: the unrolled-literal formulation
  * (M×K×subDim = 1024 squared-diff terms) costs ~4.5 s of fixed
  * analysis/codegen per query — the plan, not the data, was the
  * bottleneck. A tight referenced-object loop keeps the generated code
  * a few hundred bytes, stays inside whole-stage codegen, and encoding
  * remains a pure zero-shuffle map at any corpus size.
  *
  * Determinism: j ascends within a codeword, k ascends within a
  * subspace, m ascends across subspaces — fixed fold order, bit-stable
  * doubles run-to-run.
  */
case class PqEncode(child: Expression, cids: Array[Array[Int]],
    cents: Array[Array[Double]], subDim: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  // ONE struct result per row: both encode consumers (sq_err + codes)
  // read fields of a single evaluation. Two sibling expressions would
  // each pay the full M×K×subDim argmin pass — and codegen
  // subexpression elimination can then collapse the two
  // GetStructField(PqEncode(v)) projections to one evaluation, which
  // it cannot do across two DIFFERENT expression classes.
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", StringType, nullable = false)))

  /** struct(total L2 error, comma-joined codes) for one vector — called
    * from both the interpreted path and generated code (reference obj). */
  def encode(a: ArrayData): InternalRow = {
    val sb = new java.lang.StringBuilder()
    var err = 0.0
    var m = 0
    while (m < cids.length) {
      val base = m * subDim
      val cs = cids(m); val cv = cents(m)
      var bestD = java.lang.Double.MAX_VALUE; var bestC = 0
      var k = 0
      while (k < cs.length) {
        val off = k * subDim
        var d = 0.0; var j = 0
        while (j < subDim) {
          val t = a.getDouble(base + j) - cv(off + j)
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; bestC = cs(k) }
        k += 1
      }
      if (m > 0) sb.append(',')
      sb.append(bestC)
      err += bestD
      m += 1
    }
    new GenericInternalRow(Array[Any](err,
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.encode($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Asymmetric distance computation (ADC), cosine flavor: cosine between
  * a FULL query vector and the PQ RECONSTRUCTION of a corpus vector —
  * the codes string ("c0,c1,…") is decoded against the baked codebook
  * subspace-by-subspace inside one loop, so the 64-double
  * reconstruction is never materialized. This is how IVF+PQ search
  * scores candidates at 100 TB: the corpus side is 8 bytes of codes,
  * only the query side is a real vector.
  *
  * left = codes (string, from [[PqCodes]]); right = query array<double>.
  * Codegen delegates to [[compute]] via a reference object — the loop
  * is compiled Scala over primitives either way, and the generated code
  * stays a few bytes.
  */
case class PqAdcCosine(left: Expression, right: Expression,
    cids: Array[Array[Int]], cents: Array[Array[Double]], subDim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Per-subspace dense cid → codebook-offset table, built once per
    * (driver/executor) instance instead of a linear scan over the K
    * cids per subspace per ROW. Transient lazy: rebuilt cheaply after
    * task-side deserialization. Sized by the MAX cid — tiny for the
    * contiguous K≈16 ids k-means assigns here; revisit if codebooks
    * ever become sparse/large-id. An empty subspace yields an all-miss
    * table so the clear per-row "code not in codebook" require fires
    * instead of an opaque max-on-empty crash at table build. */
  @transient private lazy val cidOff: Array[Array[Int]] = cids.map { cs =>
    if (cs.isEmpty) Array.empty[Int]
    else {
      val arr = Array.fill(cs.max + 1)(-1)
      cs.zipWithIndex.foreach { case (c, k) => arr(c) = k * subDim }
      arr
    }
  }

  /** cosine(q, decode(codes)); fold order: j ascending within m
    * ascending — fixed, bit-stable run-to-run. */
  def compute(codesStr: org.apache.spark.unsafe.types.UTF8String,
      qa: ArrayData): Double = {
    val codes = codesStr.toString.split(',')
    var dot = 0.0; var nc = 0.0; var nq = 0.0
    var m = 0
    while (m < codes.length && m < cids.length) {
      val cid = java.lang.Integer.parseInt(codes(m))
      val offs = cidOff(m); val cv = cents(m)
      val off = if (cid >= 0 && cid < offs.length) offs(cid) else -1
      require(off >= 0, s"code $cid not in subspace $m codebook")
      val base = m * subDim
      var j = 0
      while (j < subDim) {
        val c = cv(off + j); val q = qa.getDouble(base + j)
        dot += c * q; nc += c * c; nq += q * q
        j += 1
      }
      m += 1
    }
    dot / (math.sqrt(nc) * math.sqrt(nq))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdc", this,
      classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `graft_cosine` / `graft_dot` for SQL/expr use in this
    * session (idempotent — createOrReplace semantics). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    // custom HLL aggregate (HllExpressions.scala) — the analyzer wraps
    // a bare AggregateFunction builder in AggregateExpression itself
    reg.createOrReplaceTempFunction("graft_hll",
      exprs => HllSketchAgg(exprs.head), "built-in")
  }
}
