package graft

import org.apache.spark.sql.SparkSession

/** Formatted-plan dump for the optimization-round evidence files
  * (`plans/r16/<key>_{before,after}.txt`): runs the key to let AQE finalize,
  * then writes `explain("formatted")` output plus the wall time.
  *
  * usage: runMain graft.PlanFmt <key[,key...]> <outDir> [suffix]
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  */
object PlanFmt {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { key =>
      spark.sparkContext.setJobDescription(s"planfmt: $key")
      val df = SparkEntry.queries(key)(spark, sfDir)
      val t0 = System.nanoTime()
      df.count() // finalize the adaptive plan
      val wall = (System.nanoTime() - t0) / 1e9
      val txt = s"== $key @ $sfDir cpus=$cpus wall=${"%.2f".format(wall)}s" +
        s" (first-touch incl. codegen)\n\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${key}_$suffix.txt")
      java.nio.file.Files.writeString(p, txt)
      println(s"WROTE $p")
    }
    spark.stop()
  }
}
