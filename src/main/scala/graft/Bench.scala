package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + whole-stage-codegen compile + parquet reader
    // init land here instead of inside the first measured query
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().count()
      li.limit(1000).orderBy("l_orderkey").count()
    } catch { case _: Throwable => }
    // A failed query must be LOUD: r9's events-fixture drift broke 64 keys
    // yet BENCH_r09 reported rc=0 because failures were swallowed as ~0 s
    // timings (VERDICT r9 "What's wrong" #2). Record every failure by name,
    // surface them in the JSON line, and exit non-zero.
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // Split shared-artifact STAGING out of each key's query time: the
    // first consumer of a staged index (wshingle_df, oriented_adj, ...)
    // otherwise carries the whole family's build cost and reads as a
    // regression every round (VERDICT r15 "What's wrong" #2). T.staged
    // meters its own build wall; sampling it around each key yields the
    // key's staging share exactly. queries map = pure query seconds;
    // staging is reported per-key (top entries) and as staging_sec, so
    // value == sum(queries) + staging_sec remains the full honest wall.
    val staging = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val s0 = T.stagingNanos.get()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val stagedSec = (T.stagingNanos.get() - s0) / 1e9
      if (stagedSec > 0.05) staging(name) = stagedSec
      name -> math.max(0.0, wall - stagedSec)
    }
    // The driver captures only the LAST 2000 chars of output (BENCH_r01/r02
    // tails are exactly 2000 chars and r02's full-precision line was cut
    // mid-JSON → parsed:null). Keep the line well under that: 3-decimal
    // timings and only the 40 slowest queries listed individually; the
    // remainder is aggregated into other_sec/n_queries.
    // Locale.ROOT: the default-locale format would emit ',' decimal
    // separators on non-English JVMs — invalid JSON for the driver's parser
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // 36 not 40: the staging fields below cost ~300 chars of the driver's
    // 2000-char tail budget; four fewer listed keys buys the headroom back
    val top = results.toSeq.sortBy(-_._2).take(36)
    val rest = results.size - top.size
    val otherSec = results.values.sum - top.map(_._2).sum
    val qs = top.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // 1-min load average at run end: this box carries heavy external load
    // (same build measured 74–212 s total; see BASELINE.md variance notes),
    // so the context is part of the measurement
    val load = f3(java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage)
    // errors stay inside the 2000-char tail budget: full count always, the
    // first 10 names as a sample (64 names would evict the timing payload)
    val errJson = errors.take(10).map("\"" + _ + "\"").mkString("[", ",", "]")
    // staging: total + the 8 biggest per-key shares (2000-char tail budget)
    val stagingTotal = T.stagingNanos.get() / 1e9
    val stJson = staging.toSeq.sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total + stagingTotal)},"unit":"sec","queries":$qs,"n_queries":${results.size},"n_errors":${errors.size},"errors":$errJson,"n_omitted":$rest,"other_sec":${f3(otherSec)},"staging_sec":${f3(stagingTotal)},"staging":$stJson,"query_sec":${f3(total)},"load_avg":$load,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
