package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Standalone sample driver for the Streams library surface (verification
  * aid, not a test): chunked replay → tumbling agg and stream-stream join. */
object DriveStreams {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("drive_replay_").toString
    Streams.writeChunks(spark, TestSpark.sf, dir, 5)
    val t = Streams.runToMemory(
      Streams.tumbling(Streams.readReplay(spark, dir)), "drive_t", OutputMode.Complete())
    println("DRIVE tumbling rows=" + t.count())
    val j = Streams.runToMemory(
      Streams.purchaseClickJoin(Streams.readReplay(spark, dir), Streams.readReplay(spark, dir)),
      "drive_j", OutputMode.Append())
    println("DRIVE join rows=" + j.count())
    spark.stop()
  }
}
