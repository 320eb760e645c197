package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question probe (r16): how much of a text key's wall is the
  * per-invocation token derivation (documents scan + split + explode)
  * versus reading the same rows back from a staged columnar artifact?
  * Decides whether the text family gets a shared staged token index
  * (the shingle-index precedent) or keeps deriving in place.
  *
  * usage: runMain graft.TokProbe [sfDir] [reps]
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
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
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"TOK $tag%-24s min=${walls.map(_._1).min}%6.2f s " +
        f"reps=${walls.map(w => f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
    }
    val docs = T.t(spark, sfDir, "documents")
    // derive in place: the shape ~20 text keys run per invocation
    val derived = docs.select(col("doc_id"), col("lang"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    time("derive_explode") {
      derived.groupBy("lang").agg(count(lit(1))).collect().map(_.getLong(1)).sum
    }
    // staged read: the candidate artifact
    val dir = java.nio.file.Files.createTempDirectory("graft_tok_").toString
    derived.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    time("staged_read") {
      staged.groupBy("lang").agg(count(lit(1))).collect().map(_.getLong(1)).sum
    }
    // narrower projections (most keys need only tok or (lang, tok))
    time("derive_tok_only") {
      docs.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy().agg(count(lit(1))).collect().map(_.getLong(0)).sum
    }
    time("staged_tok_only") {
      staged.select("tok").groupBy().agg(count(lit(1)))
        .collect().map(_.getLong(0)).sum
    }
    // a representative downstream agg: distinct (lang, tok) counts
    time("derive_tf_agg") {
      docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1))).count()
    }
    time("staged_tf_agg") {
      staged.groupBy("lang", "tok").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
