package graft

/** Time a single query repeatedly in one session (perf scratch driver):
  * Test/runMain graft.DriveBenchOne <key> <sfDir> <reps> */
object DriveBenchOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = TestSpark.spark
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(s, sfDir).count()
      println(f"DRIVE $key rep=$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
