package graft

import org.apache.spark.sql.SparkSession

/** One-off local probe: can Spark 4.1.2 read every fixture table, and at
  * what timestamp precision? Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = T.t(spark, dir, n)
      println(s"== $n rows=${df.count()} schema=${df.schema.simpleString}")
    }
    T.t(spark, dir, "events").show(3, truncate = false)
    println(s"== entry rows=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
