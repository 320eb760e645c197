package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for Exec.splitStatements: joining arbitrary
  * well-formed statements with ';' must split back to the same statements,
  * regardless of quotes, escapes, and comments inside them. */
class ExecPropSpec extends AnyFunSuite {

  // fragments that may appear inside one statement — including quoted
  // semicolons, escaped quotes, '' doubling, and both comment forms
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("'a;b'"),
    Gen.const("'it\\'s'"),
    Gen.const("'do''ne'"),
    Gen.const("\"qu;oted\""),
    Gen.const("/* c;mt */"),
    Gen.const("x"),
    Gen.const(" "))

  private val statement: Gen[String] =
    Gen.nonEmptyListOf(fragment).map(_.mkString)
      // a statement must contain something other than whitespace/comments
      .map(b => s"SELECT $b")

  private def run(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("split(join(statements)) == statements") {
    run(Prop.forAll(Gen.listOfN(4, statement)) { stmts =>
      val script = stmts.mkString(";")
      val got = Exec.splitStatements(script)
      // the splitter replaces a block comment with one space (token
      // separator); mirror that in the expectation
      val want = stmts
        .map(_.replaceAll("/\\* c;mt \\*/", " "))
        .filter(_.trim.nonEmpty)
      got.map(_.trim).filter(_.nonEmpty) == want.map(_.trim).filter(_.nonEmpty)
    })
  }

  test("a line comment swallows the rest of its line only") {
    assert(Exec.splitStatements("SELECT 1 -- c;mt\n; SELECT 2")
      == Seq("SELECT 1", "SELECT 2"))
  }
}
