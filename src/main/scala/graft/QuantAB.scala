package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Bit-exactness + scaling A/B for the agg_percentile_cont_interp replan
  * (r16): compares the OLD single-aggregate exact-Percentile plan against
  * the shipped bucket-spine selection plan — (a) value equality, compared
  * as raw IEEE bit patterns via doubleToRawLongBits, at the given fixture;
  * (b) wall time for both plans at the fixture and at an ×REP replicated
  * copy of lineitem (the cliff the replan removes grows with rows per
  * group).
  *
  * usage: runMain graft.QuantAB [sfDir] [rep]
  */
object QuantAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def oldPlan(mult: Int) = {
      val base = T.t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          col("l_extendedprice").cast(DoubleType).as("p"))
      // replication by unionAll, not crossJoin: a BNLJ replication stage
      // would pollute the timing comparison (both plans get the same form)
      val x = (1 until mult).foldLeft(base)((d, _) => d.unionAll(base))
      x.groupBy("l_returnflag")
        .agg(percentile(col("p"), lit(0.25)).as("p25"),
          percentile(col("p"), lit(0.5)).as("p50"),
          percentile(col("p"), lit(0.75)).as("p75"))
        .orderBy("l_returnflag")
    }
    def bits(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getString(0), java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }.toSeq

    // (a) bit-exact value equality at the fixture
    val newRows = bits(SparkEntry.queries("agg_percentile_cont_interp")(
      spark, sfDir).collect())
    val oldRows = bits(oldPlan(1).collect())
    val equal = newRows == oldRows
    println(s"QUANTAB $sfDir bitEqual=$equal new=$newRows" +
      (if (!equal) s" old=$oldRows" else ""))

    // (b) scaling wall A/B at ×rep (old plan vs shipped plan over the
    // same replicated input is impractical through SparkEntry, so the
    // timing compares the old aggregate against an inline copy of the
    // shipped spine selection over the identical replicated frame)
    if (rep >= 1) {
      def time(tag: String)(body: => Unit): Unit = {
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        println(f"QUANTAB ${tag}%-12s x$rep min=${walls.min}%6.2f s " +
          f"reps=${walls.map(w => f"$w%.2f").mkString(",")}")
      }
      // the .count() twin exposes the Bench-metric artifact: Catalyst
      // prunes the ungrouped Percentile aggregates under count(), so the
      // old plan's benched 0.19 s anchor never computed a percentile
      time("old_count") { oldPlan(rep).count() }
      time("old_pctile") { oldPlan(rep).collect() }
      val base0 = T.t(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          col("l_extendedprice").cast(DoubleType).as("p"))
      val base = (1 until rep).foldLeft(base0)((d, _) => d.unionAll(base0))
      // the SHARED shipped plan (Pipelines.centSpinePercentiles — ADVICE
      // r16: the timing leg previously carried a hand-inlined copy that
      // could silently drift from the key's code)
      time("new_spine") {
        graft.api.Pipelines.centSpinePercentiles(base)
          .orderBy("rf").collect()
      }
    }
    spark.stop()
  }
}
