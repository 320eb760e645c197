package graft

/** One-shot probe (VERDICT r8 #7): does SQL `MERGE INTO` work against the
  * catalogs available offline in this environment? Findings land in
  * docs/API.md. */
object DriveMergeProbe {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").saveAsTable("merge_probe_tgt")
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("merge_probe_src")
    try {
      s.sql("""MERGE INTO merge_probe_tgt USING merge_probe_src
               ON merge_probe_tgt.k = merge_probe_src.k
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      println("MERGE-OK: " +
        s.table("merge_probe_tgt").orderBy("k").collect().mkString(","))
    } catch {
      case e: Throwable =>
        println("MERGE-FAIL: " + e.getClass.getName + ": " + e.getMessage.take(600))
    }
  }
}
