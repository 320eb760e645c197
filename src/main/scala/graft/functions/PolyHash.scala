package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd engine-portable 60-bit string hash: a Rabin–Karp polynomial
  * fold (base 257, modulus M = 2^61−1, the same arithmetic as
  * `text_rolling_fingerprint`) followed by one multiplicative finalizer
  * `h → (h·K + 1) mod M`. The fold alone leaves the high bits of short
  * tokens zero (a 5-char token's polynomial value is < 257^5 ≈ 2^40), which
  * made SimHash bit-votes degenerate; the finalizer spreads every distinct
  * value uniformly over [0, M).
  *
  * Portability is the point: DuckDB reproduces it bit-for-bit with a
  * HUGEINT `list_reduce` over `ascii()` codes (inputs are ASCII per
  * FIXTURES.md), so `dedup_simhash` gets a full hash-compared oracle where
  * engine-specific xxhash64 allowed only a rows-only check.
  *
  * All modular arithmetic is branch-light Mersenne reduction on longs:
  * x mod (2^61−1) folds the high bits via 2^61 ≡ 1 and 2^64 ≡ 8 (mod M),
  * with `Math.multiplyHigh` supplying the 128-bit product halves.
  */
case class PolyTokenHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyTokenHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyTokenHash.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): PolyTokenHash =
    copy(child = newChild)
}

object PolyTokenHash {
  final val M: Long = (1L << 61) - 1
  /** Finalizer multiplier; any large odd constant < M works — this one is
    * the LCG multiplier from Java's SplittableRandom lineage. */
  final val K: Long = 1181783497276652981L

  /** (a * b) mod M for 0 <= a < M, 0 <= b < M, via 128-bit product halves
    * and Mersenne folding (2^64 ≡ 8, 2^61 ≡ 1 mod M). */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // unsigned lo = (lo >>> 61) * 2^61 + (lo & M); 2^61 ≡ 1 (mod M)
    var r = (lo >>> 61) + (lo & M)
    var h8 = hi * 8 // hi < 2^58 ⇒ hi*8 <= 2^61; fold once
    while (h8 >= M) h8 -= M
    r += h8
    while (r >= M) r -= M
    r
  }

  /** Rabin–Karp fold over byte codes then finalize: ((Σ h·257+c) · K + 1) mod M. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h*257 + c: h < M so the product fits the mulMod contract
      h = mulMod(h, 257L) + (bytes(i) & 0xFF)
      if (h >= M) h -= M
      i += 1
    }
    var r = mulMod(h, K) + 1
    if (r >= M) r -= M
    r
  }
}
