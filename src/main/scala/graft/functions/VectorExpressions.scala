package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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

object VectorExpressions {
  /** Register `graft_cosine` / `graft_dot` for SQL/expr use in this
    * session (idempotent — createOrReplace semantics). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
  }
}
