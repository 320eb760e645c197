package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-of-dot) LSH band signature as ONE codegen'd
  * expression: `lsh_bands(vec, bands, rowsPerBand, seed)` returns an
  * `array<bigint>` of `bands` band values, each packing `rowsPerBand` sign
  * bits of seeded-Gaussian hyperplane dots (band/seed args must be integer
  * literals — they parameterize the expression, they are not per-row data).
  *
  * Why an expression instead of composing `vec_dot` per hyperplane: a
  * recall-safe banding at low thresholds needs hundreds of bands × 8 bits —
  * thousands of hyperplanes. As composed columns that is thousands of
  * 64-double literal arrays in the plan (constant-pool pressure, janino
  * compile blowup); here the generated code is one static call and the
  * hyperplane matrix is built once per (seed, nBits, dim) and cached
  * process-wide. The inner loop is a tight primitive multiply-accumulate —
  * no boxing, no per-plane expression overhead.
  */
case class LshBands(child: Expression, nBands: Int, nRows: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (nBands >= 1 && nRows >= 1 && nRows <= 63) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"lsh_bands needs bands >= 1 and 1 <= rowsPerBand <= 63, got ($nBands, $nRows)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands expects array<float>/array<double> input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    CosineLsh.bandValues(v.asInstanceOf[ArrayData], isFloat, nBands, nRows, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.CosineLsh.bandValues(
         |  $c, $isFloat, $nBands, $nRows, ${seed}L);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

object CosineLsh {
  /** Registry builder: trailing args must be integer literals. */
  def build(exprs: Seq[Expression]): LshBands = {
    require(exprs.length == 4,
      "lsh_bands(vec, bands, rowsPerBand, seed) takes 4 arguments")
    def lit(e: Expression, what: String): Long = {
      require(e.foldable, s"lsh_bands $what must be a literal")
      e.eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"lsh_bands $what must be integral, got $other")
      }
    }
    LshBands(exprs.head, lit(exprs(1), "bands").toInt,
      lit(exprs(2), "rowsPerBand").toInt, lit(exprs(3), "seed"))
  }

  /** Hyperplane matrix cache: (seed, nBits, dim) → nBits×dim Gaussians in
    * sequence order, so a larger band count extends (not reshuffles) the
    * family. Built once per process — signatures are deterministic. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  private def planes(seed: Long, nBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, nBits, dim), { _ =>
      val rng = new scala.util.Random(seed)
      Array.fill(nBits, dim)(rng.nextGaussian())
    })

  /** Band values for one vector: bit k of band b = sign(vec · plane[b*r+k]). */
  def bandValues(vec: ArrayData, isFloat: Boolean, nBands: Int, nRows: Int,
                 seed: Long): GenericArrayData = {
    val dim = vec.numElements()
    val ps = planes(seed, nBands * nRows, dim)
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var v = 0L
      var k = 0
      while (k < nRows) {
        val p = ps(b * nRows + k)
        var s = 0.0
        var i = 0
        if (isFloat) while (i < dim) { s += vec.getFloat(i) * p(i); i += 1 }
        else while (i < dim) { s += vec.getDouble(i) * p(i); i += 1 }
        if (s >= 0) v |= (1L << k)
        k += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Recall-driven band count: collision probability per bit is
    * p = 1 − θ/π at the threshold angle; `bands` bands of `rowsPerBand`
    * bits miss a threshold pair with probability (1−p^r)^bands ≤ perPairMiss. */
  def bandsFor(threshold: Double, rowsPerBand: Int,
               perPairMiss: Double = 1e-5): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pr = math.pow(p, rowsPerBand)
    math.max(1, math.ceil(math.log(perPairMiss) / math.log1p(-pr)).toInt)
  }
}
