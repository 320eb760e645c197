package graft

import org.apache.spark.sql.SparkSession

/** One-off executed-plan dump for a single key at an arbitrary fixture
  * scale (DrivePlanDump is pinned to sf0.001; perf forensics need the
  * AQE-final plan at the scale that misbehaves).
  *
  * usage: runMain graft.PlanOne <key> [out.txt]
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val out = if (args.length > 1) Some(args(1)) else None
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
    val df = SparkEntry.queries(key)(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect() // finalize the adaptive plan
    val wall = (System.nanoTime() - t0) / 1e9
    val txt = s"== $key @ $sfDir wall=${"%.2f".format(wall)}s\n\n" +
      df.queryExecution.executedPlan.toString
    out match {
      case Some(p) => java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p), txt); println(s"WROTE $p")
      case None => println(txt)
    }
    spark.stop()
  }
}
