package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the codegen'd VecDot expression: bit-exact
  * against a plain-Scala reference fold and the HOF formulation it replaced. */
class VecDotPropSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1f, 1f))

  private def refDot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("vec_dot == sequential reference fold == HOF formulation (bit-exact)") {
    graft.functions.GraftFunctions.register(s)
    val prop = Prop.forAll(Gen.listOfN(4, Gen.zip(vecGen, vecGen))) { pairs =>
      pairs.isEmpty || {
        val rows = pairs.map { case (a, b) => Row(a, b) }
        val df = s.createDataFrame(s.sparkContext.parallelize(rows, 2), schema)
        val got = df.select(
            expr("vec_dot(a, b)").as("native"),
            aggregate(zip_with(col("a"), col("b"),
              (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
              lit(0.0), (acc, v) => acc + v).as("hof"))
          .collect()
        got.zip(pairs).forall { case (r, (a, b)) =>
          r.getDouble(0) == refDot(a, b) && r.getDouble(0) == r.getDouble(1)
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withInitialSeed(Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("vec_dot_int == exact integer reference fold") {
    graft.functions.GraftFunctions.register(s)
    val intSchema = StructType(Seq(
      StructField("a", ArrayType(IntegerType)), StructField("b", ArrayType(IntegerType))))
    val intGen: Gen[List[Int]] = Gen.listOfN(64, Gen.chooseNum(-127, 127))
    val prop = Prop.forAll(Gen.listOfN(4, Gen.zip(intGen, intGen))) { pairs =>
      pairs.isEmpty || {
        val rows = pairs.map { case (a, b) => Row(a, b) }
        val df = s.createDataFrame(s.sparkContext.parallelize(rows, 2), intSchema)
        val got = df.select(expr("vec_dot_int(a, b)")).collect()
        got.zip(pairs).forall { case (r, (a, b)) =>
          r.getLong(0) == a.zip(b).map { case (x, y) => x.toLong * y }.sum
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("vec_dot handles nulls and mismatched lengths") {
    graft.functions.GraftFunctions.register(s)
    val rows = Seq(
      Row(null, Seq(1f, 2f)),
      Row(Seq(1f, 2f, 3f), Seq(2f, 3f)))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(expr("vec_dot(a, b)")).collect()
    assert(got(0).isNullAt(0), "null input -> null")
    assert(got(1).getDouble(0) == (1.0 * 2 + 2.0 * 3), "min-length semantics")
  }
}
