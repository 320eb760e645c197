package graft

/** Scan: which oracle SQL strings run verbatim through spark.sql over the
  * fixture temp views, and do they match the DSL result? Output feeds the
  * SqlParitySpec run-list. Test/runMain graft.DriveSqlParity [sfDir] */
object DriveSqlParity {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else TestSpark.sf
    val s = TestSpark.spark
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      graft.T.t(s, sfDir, t).createOrReplaceTempView(t)
    var ok, mismatch, fail = 0
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      try {
        val viaSql = s.sql(sql)
        val sqlCols = viaSql.columns.sorted
        val sqlRows = viaSql.select(sqlCols.head, sqlCols.tail: _*)
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
        val viaDsl = SparkEntry.queries(name)(s, sfDir)
        val dslCols = viaDsl.columns.sorted
        val dslRows = viaDsl.select(dslCols.head, dslCols.tail: _*)
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
        if (sqlCols.map(_.toLowerCase).sameElements(dslCols.map(_.toLowerCase))
            && sqlRows.sameElements(dslRows)) {
          println(s"PARITY OK        $name"); ok += 1
        } else {
          val d = sqlRows.zip(dslRows).find { case (a, b) => a != b }
          println(s"PARITY MISMATCH  $name sqlRows=${sqlRows.length} dslRows=${dslRows.length} firstDiff=${d.map(x => x._1.take(80) + " <> " + x._2.take(80))}")
          mismatch += 1
        }
      } catch {
        case e: Throwable =>
          println(s"PARITY DIALECT   $name: ${String.valueOf(e.getMessage).linesIterator.next().take(120)}")
          fail += 1
      }
    }
    println(s"PARITY DONE ok=$ok mismatch=$mismatch dialect=$fail")
    s.stop()
  }
}
