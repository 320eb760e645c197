package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage-level A/B for exact-Jaccard candidate strategies (r15): times
  * the SSJoin prefix-filter path (candidate build + exact verify, the
  * machinery behind Pipelines.nearDupPairs(prefixFilter = true)) against
  * the shipped index-agg stream, on the same staged index in the same
  * JVM. This probe produced the refutation recorded in BASELINE.md —
  * prefix filtering cuts Σ C(df,2) ~10× but loses end-to-end at every
  * scale on the fixtures' single-shingle-overlap co-sharing geometry.
  *
  * usage: runMain graft.DedupStageProbe [reps]
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
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
    def time(tag: String)(body: => Long): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val w = (System.nanoTime() - t0) / 1e9
        (w, n)
      }
      println(f"STAGE $tag%-28s min=${walls.map(_._1).min}%6.2f s " +
        f"reps=${walls.map(w => f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
    }
    val s = spark
    val sizes = graft.ops.GroupPipeline.shingleSizes(s, sfDir)
    // keep the probe's A/B meaning: the df-capped index the graded keys scan
    val keptIdx = graft.ops.GroupPipeline.shingleDfRows(s, sfDir)
      .filter(col("df") <= graft.ops.GroupPipeline.dfCap)
    keptIdx.count() // force staging outside the timings
    val cmin = (nn: Column) => ceil(nn * lit(0.8) - lit(1e-6)).cast(LongType)
    time("kept_scan") { keptIdx.count() }
    time("prefix_build") {
      graft.api.Pipelines.prefixCandidates(keptIdx, sizes, cmin,
        weighted = false).count()
    }
    val cand = graft.api.Pipelines.prefixCandidates(keptIdx, sizes, cmin,
      weighted = false)
    time("verify_counts") {
      graft.api.Pipelines.candidateCommonCounts(keptIdx, cand,
        weighted = false).count()
    }
    time("shipped_key") {
      SparkEntry.queries("dedup_ngram_jaccard")(s, sfDir).count()
    }
    // the shipped candidate strategy in isolation: df-capped index
    // self-join + count agg (what the graded keys run)
    time("index_agg_shape") {
      val shJ = keptIdx.select("doc_id", "sh")
      shJ.select(col("doc_id").as("ia"), col("sh"))
        .join(shJ.select(col("doc_id").as("ib"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("c"))
        .join(sizes.select(col("doc_id").as("ia"), col("n").as("na")), "ia")
        .join(sizes.select(col("doc_id").as("ib"), col("n").as("nb")), "ib")
        .withColumn("jac",
          col("c").cast("double") / (col("na") + col("nb") - col("c")))
        .filter(col("jac") >= 0.8)
        .count()
    }
    spark.stop()
  }
}
