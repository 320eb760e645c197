package graft

import org.apache.spark.sql.functions._

/** Scratch probe: candidate-pair counts of the banded cosine join. */
object DriveLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    val e = T.t(s, sfDir, "embeddings")
    val bands = graft.functions.CosineLsh.bandsFor(0.45, 8, 1e-5)
    println(s"BANDS=$bands")
    val banded = api.Pipelines.cosineLshBands(e, "vec_id", "embedding", bands, 8, 42L)
    val t0 = System.nanoTime()
    val nBanded = banded.count()
    println(f"banded rows=$nBanded t=${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    val cand = banded.select(col("_id").as("ia"), col("band_pos"), col("band_val"))
      .join(banded.select(col("_id").as("ib"), col("band_pos").as("bp"), col("band_val").as("bv")),
        col("band_pos") === col("bp") && col("band_val") === col("bv") && col("ia") < col("ib"))
    val nCand = cand.count()
    println(f"candidate rows (with multiplicity)=$nCand t=${(System.nanoTime()-t1)/1e9}%.2f s")
    // bucket skew: largest buckets
    banded.groupBy("band_pos", "band_val").count().orderBy(col("count").desc).show(10)
    s.stop()
  }
}
