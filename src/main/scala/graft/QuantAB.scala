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
      time("new_spine") {
        import org.apache.spark.sql.expressions.Window
        val withB = base.filter(col("p").isNotNull)
          .withColumn("bkt", expr("shiftright(cast(p * 100 as bigint), 16)"))
        val spine = withB.groupBy("rf", "bkt").agg(count(lit(1)).as("bw"))
        val wS = Window.partitionBy("rf").orderBy("bkt")
        val cum = spine.withColumn("hi", sum(col("bw")).over(
            wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("lo", col("hi") - col("bw"))
        val tgt = base.groupBy("rf").agg(count(col("p")).as("n"))
          .select(col("rf"),
            explode(expr("array(0.25D, 0.5D, 0.75D)")).as("pct"), col("n"))
          .withColumn("pos", (col("n") - 1).cast(DoubleType) * col("pct"))
          .withColumn("rlo", floor(col("pos")))
          .withColumn("rhi", ceil(col("pos")))
        val ranks = tgt.select(col("rf").as("nrf"),
            explode(array(col("rlo"), col("rhi"))).as("r")).distinct()
        val need = ranks.join(cum,
            col("nrf") === col("rf") &&
              col("r") >= col("lo") && col("r") < col("hi"))
          .select(col("nrf"), col("r"), col("bkt").as("nbkt"),
            col("lo").as("nlo"))
        val wB = Window.partitionBy("rf", "bkt").orderBy("p")
        val vals = withB
          .join(broadcast(need.select(col("nrf").as("rf"),
            col("nbkt").as("bkt")).distinct()), Seq("rf", "bkt"))
          .withColumn("ix", row_number().over(wB).cast(org.apache.spark.sql.types.LongType) - 1)
          .join(broadcast(need),
            col("rf") === col("nrf") && col("bkt") === col("nbkt") &&
              col("ix") === col("r") - col("nlo"))
          .select(col("rf"), col("r"), col("p").as("v"))
        tgt
          .join(vals.select(col("rf"), col("r").as("rlo"), col("v").as("vlo")),
            Seq("rf", "rlo"))
          .join(vals.select(col("rf"), col("r").as("rhi"), col("v").as("vhi")),
            Seq("rf", "rhi"))
          .select(col("rf"), col("pct"),
            when(col("rlo") === col("rhi") || col("vlo") === col("vhi"),
              col("vlo"))
              .otherwise(
                (col("rhi").cast(DoubleType) - col("pos")) * col("vlo") +
                  (col("pos") - col("rlo").cast(DoubleType)) * col("vhi"))
              .as("qv"))
          .groupBy("rf")
          .agg(max(when(col("pct") === 0.25, col("qv"))).as("p25"),
            max(when(col("pct") === 0.5, col("qv"))).as("p50"),
            max(when(col("pct") === 0.75, col("qv"))).as("p75"))
          .orderBy("rf").collect()
      }
    }
    spark.stop()
  }
}
