package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float arrays — cosine similarity on the
  * unit-norm embedding fixtures (FIXTURES.md).
  *
  * This is SURVEY.md §2-J's `expression_custom_note` realized: the
  * zip_with+aggregate higher-order-function formulation is semantically
  * identical but runs outside whole-stage codegen and boxes every element —
  * ~25× slower on the all-pairs similarity join. The generated loop reads
  * the underlying UnsafeArrayData directly and accumulates in ascending
  * index order, bit-identical to the sequential HOF fold (and DuckDB's
  * list_dot_product), so 6dp-rounded oracle parity is preserved.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float>/array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // element accessors specialized per input's element type (round 5: the
  // expression generalized to double arrays so derived vectors — k-means
  // centroids, normalized embeddings — stay on the codegen path)
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd exact integer dot product of two int arrays (long result) —
  * the scoring loop of int8-quantized vector search (§2-Q
  * vector_quantized_topk). Integer accumulation is associative, so unlike
  * the float path there is no order-sensitivity at all; the codegen win
  * over the boxed zip_with/aggregate fold is the same as VecDot's. */
case class VecDotInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_int"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotInt =
    copy(left = newLeft, right = newRight)
}

/** Registry for graft's native Catalyst expressions. */
object GraftFunctions {
  /** Idempotently register `vec_dot`/`vec_dot_int` on the session so
    * `expr("vec_dot(a,b)")` resolves; safe to call at the top of every
    * query builder. */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_int", exprs => VecDotInt(exprs.head, exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyTokenHash(exprs.head), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bands", exprs => CosineLsh.build(exprs), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigrams", exprs => TokenBigrams(exprs.head), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect", exprs => SortedIntersect(exprs.head, exprs(1)),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")
  }
}

/** The idiomatic library packaging of graft's Catalyst surface: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every session
  * built from that config resolves `vec_dot` with no registration call —
  * the injection point a deployed 100 TB cluster would use (cluster-wide
  * defaults in spark-defaults.conf, not per-notebook register calls).
  * Injection happens at session build, before any query parses. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_int"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDotInt].getName, "vec_dot_int"),
      (exprs: Seq[Expression]) => VecDotInt(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyTokenHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyTokenHash(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_bands"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshBands].getName, "lsh_bands"),
      (exprs: Seq[Expression]) => CosineLsh.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bigrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokenBigrams].getName, "bigrams"),
      (exprs: Seq[Expression]) => TokenBigrams(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersect].getName, "sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersect(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    // whole-operator surface: the native per-group top-k and as-of join
    // strategies (graft.plans) ride the same cluster-wide injection point
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
