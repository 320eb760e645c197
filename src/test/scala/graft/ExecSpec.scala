package graft

import org.scalatest.funsuite.AnyFunSuite

/** dbexec-analogue script execution + catalog extraction. */
class ExecSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("splitStatements honors quotes and comments") {
    val script =
      """-- a comment; with a semicolon
        |SELECT 'a;b' AS x;
        |SELECT 1;
        | ;
        |SELECT "q;uoted" FROM t""".stripMargin
    val st = Exec.splitStatements(script)
    assert(st == Seq("SELECT 'a;b' AS x", "SELECT 1", "SELECT \"q;uoted\" FROM t"))
  }

  test("splitStatements honors backslash escapes and block comments") {
    // backslash-escaped quote: the ; after it is still inside the string
    assert(Exec.splitStatements("""SELECT 'it\'s;fine' AS x; SELECT 2""")
      == Seq("""SELECT 'it\'s;fine' AS x""", "SELECT 2"))
    // '' doubling: close-then-reopen keeps the ; quoted
    assert(Exec.splitStatements("SELECT 'a'';b' AS x; SELECT 2")
      == Seq("SELECT 'a'';b' AS x", "SELECT 2"))
    // block comment with a semicolon inside must not split; the comment is
    // replaced by ONE space (it is a token separator — "AS/*x*/y" must not
    // merge into "ASy")
    assert(Exec.splitStatements("SELECT /* not; a split */ 1; SELECT 2")
      == Seq("SELECT   1", "SELECT 2"))
    assert(Exec.splitStatements("SELECT 1 AS/*note*/x; SELECT 2")
      == Seq("SELECT 1 AS x", "SELECT 2"))
    // multi-line block comment
    assert(Exec.splitStatements("SELECT 1 /* a;\nb; */ + 2; SELECT 3")
      == Seq("SELECT 1   + 2", "SELECT 3"))
  }

  test("runScript executes a bulk-load-shaped script; abort vs continue") {
    Graft.registerTables(s, sf)
    val script =
      """CREATE OR REPLACE TEMP VIEW big_orders AS
        |  SELECT * FROM orders WHERE o_totalprice > 100000;
        |SELECT count(*) AS n FROM big_orders;
        |SELECT * FROM does_not_exist;
        |SELECT 1""".stripMargin
    val abort = Exec.runScript(s, script, Exec.AbortOnError)
    assert(abort.length == 3 && !abort(2).ok, abort.mkString("\n"))
    assert(abort(1).ok && abort(1).rowCount == 1)
    val cont = Exec.runScript(s, script, Exec.ContinueOnError)
    assert(cont.length == 4 && !cont(2).ok && cont(3).ok)
  }

  test("runScripts executes independent scripts concurrently, results in input order") {
    Graft.registerTables(s, sf)
    val scripts = (0 until 4).map { i =>
      s"""CREATE OR REPLACE TEMP VIEW par_v$i AS
         |  SELECT * FROM orders WHERE o_orderkey % 4 = $i;
         |SELECT o_orderkey FROM par_v$i""".stripMargin
    }
    val rs = Exec.runScripts(s, scripts, Exec.AbortOnError, parallelism = 4)
    assert(rs.length == 4)
    rs.zipWithIndex.foreach { case (r, i) =>
      assert(r.length == 2 && r.forall(_.ok), s"script $i: $r")
      assert(r(1).sql.contains(s"par_v$i"), "results must follow input order")
    }
    // the four disjoint mod-4 slices must cover orders exactly once
    val total = rs.map(_.apply(1).rowCount).sum
    assert(total == T.t(s, sf, "orders").count())
    // one failing script must not poison its siblings
    val mixed = Exec.runScripts(s,
      Seq("SELECT * FROM does_not_exist", "SELECT 1"), Exec.ContinueOnError)
    assert(!mixed.head.head.ok && mixed(1).head.ok)
  }

  test("catalogColumns extracts SYSCAT-style metadata for registered views") {
    Graft.registerTables(s, sf)
    val cat = Exec.catalogColumns(s)
    val lineitemCols = cat.filter("table_name = 'lineitem'").collect()
    assert(lineitemCols.length == 11)
    assert(lineitemCols.exists(r =>
      r.getAs[String]("column_name") == "l_quantity" &&
        r.getAs[String]("data_type") == "double"))
  }

  test("tidySql uppercases keywords, preserves strings, idempotent, still runs") {
    val raw = "select  n_name,   'select me' as s  from nation\n  where n_nationkey in (1,2);"
    val tidy = Graft.tidySql(raw)
    assert(tidy ==
      "SELECT n_name, 'select me' AS s FROM nation WHERE n_nationkey IN (1,2);")
    assert(Graft.tidySql(tidy) == tidy, "idempotent")
    // the tidied text is still valid Spark SQL producing the same result
    Graft.registerTables(s, sf)
    val a = s.sql(raw.stripSuffix(";")).collect().toSet
    val b = s.sql(tidy.stripSuffix(";")).collect().toSet
    assert(a == b)
  }

  test("viewDependencies reports DIRECT deps only, including expression " +
    "subqueries (VERDICT r8 #3)") {
    T.t(s, sf, "nation").createOrReplaceTempView("vd_nation")
    T.t(s, sf, "region").createOrReplaceTempView("vd_region")
    s.sql("""CREATE OR REPLACE TEMP VIEW vd_base AS
      SELECT n_nationkey, n_name, n_regionkey FROM vd_nation""")
    // view-over-view with an EXISTS expression subquery on a third relation
    s.sql("""CREATE OR REPLACE TEMP VIEW vd_top AS
      SELECT n_name FROM vd_base b
      WHERE EXISTS (SELECT 1 FROM vd_region r WHERE r.r_regionkey = b.n_regionkey)""")
    val known = Set("vd_nation", "vd_region", "vd_base")
    val deps = Exec.viewDependencies(s, Seq("vd_base", "vd_top"), known)
    assert(deps.contains(("vd_base", "vd_nation")))
    // direct only: vd_top depends on vd_base (not its expansion vd_nation)
    // and, via the EXISTS subquery, on vd_region
    assert(deps.filter(_._1 == "vd_top").map(_._2).sorted
      == Seq("vd_base", "vd_region"))
    assert(!deps.contains(("vd_top", "vd_nation")),
      "must not descend into vd_base's expansion")
  }
}
