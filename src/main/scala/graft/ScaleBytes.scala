package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Deterministic scale diagnostics for every registered key: per-query
  * deltas of task-metric totals — shuffle write/read bytes, disk+memory
  * spill, scan input bytes, executor CPU time, task count, per-task peak
  * execution memory — collected by a SparkListener across one measured
  * board pass.
  *
  * WHY (r15): wall-clock on this shared box prices 1.3–1.6× drifts that
  * mask real regressions until they are 6–21× (the DECIMAL(38,0) hash
  * repricing was caught by luck against a same-day anchor — BASELINE.md).
  * Bytes moved and CPU-ns burned are load-immune: running the SAME build
  * at two SFs gives a per-key DECADE EXPONENT for shuffle volume and CPU
  * that flags super-linear work structurally, before it costs wall time.
  * At 100 TB the shuffle-bytes exponent IS the scalability contract: a key
  * whose shuffle grows at 10^1.3 per data decade is a cliff in waiting no
  * matter how fast today's box absorbs it.
  *
  * Method notes:
  *  - A full UNTIMED warm pass runs first so session-staged shared
  *    artifacts (pair-support parquet, oriented adjacency, dedup index)
  *    attribute to staging, not to whichever key alphabetically touches
  *    them first; the measured pass then prices steady reuse — the same
  *    discipline BenchSteady uses for wall time.
  *  - Listener events are asynchronous; each snapshot spins until totals
  *    are stable for 100 ms (driver-side actions inside iterative keys are
  *    captured too — their shuffles ARE the key's work).
  *  - Task retries/speculation would double-count bytes; local[32] runs
  *    have none in practice and n_tasks makes any such run visible.
  *
  * usage: runMain graft.ScaleBytes <outJson> [keyFilter,comma,separated]
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  * Pair two runs (sf0.01 vs sf0.1) with tools/scalebytes_diff.py.
  */
object ScaleBytes {
  private final class M {
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val spillD = new AtomicLong; val spillM = new AtomicLong
    val input = new AtomicLong; val cpuNs = new AtomicLong
    val tasks = new AtomicLong; val peak = new AtomicLong
    def snap: Seq[Long] = Seq(shufW.get, shufR.get, spillD.get,
      spillM.get, input.get, cpuNs.get, tasks.get)
  }

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
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
    val m = new M
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val tm = t.taskMetrics
        if (tm != null) {
          m.shufW.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
          m.shufR.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
          m.spillD.addAndGet(tm.diskBytesSpilled)
          m.spillM.addAndGet(tm.memoryBytesSpilled)
          m.input.addAndGet(tm.inputMetrics.bytesRead)
          m.cpuNs.addAndGet(tm.executorCpuTime)
          m.tasks.incrementAndGet()
          m.peak.getAndUpdate(p => math.max(p, tm.peakExecutionMemory))
        }
      }
    })
    // totals stable for 100 ms = the async listener bus has drained this
    // query's task events (public API only; the bus itself is private)
    def stabilize(): Seq[Long] = {
      var prev = m.snap
      var quiet = 0
      val deadline = System.nanoTime() + 5000000000L
      while (quiet < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val cur = m.snap
        if (cur == prev) quiet += 1 else { quiet = 0; prev = cur }
      }
      prev
    }
    val board = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // untimed warm pass: staging, codegen, page cache
    board.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
    }
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val rows = board.map { case (name, fn) =>
      val s0 = stabilize()
      m.peak.set(0L)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[scalebytes] $name FAILED: ${e.getMessage}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = stabilize()
      val d = s1.zip(s0).map { case (a, b) => a - b }
      f"""  "$name": {"shuf_w": ${d(0)}, "shuf_r": ${d(1)}, "spill_d": ${
        d(2)}, "spill_m": ${d(3)}, "input": ${d(4)}, "cpu_ms": ${
        d(5) / 1000000}, "tasks": ${d(6)}, "peak_task_mem": ${
        m.peak.get}, "wall_s": $wall%.3f}"""
    }
    val json = s"""{"sf": "$sfDir", "cpus": $cpus, "n_errors": ${
      errors.size},\n"keys": {\n${rows.mkString(",\n")}\n}}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"[scalebytes] wrote $outPath keys=${rows.size} errors=${
      errors.size}")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
