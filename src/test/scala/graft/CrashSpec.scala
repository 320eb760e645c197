package graft

import graft.streaming.Streams
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-suite pins for the driver-crash probe's two fault-point contracts
  * (the probe itself kills real JVMs — `graft.CrashProbe`, run out of
  * band; these tests pin the pieces a unit suite CAN hold still).
  */
class CrashSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("upsertBatch beforeMarker hook fires AFTER the swap and BEFORE the " +
    "marker; a death there leaves applied-but-unacknowledged state that a " +
    "redelivery converges, not double-applies") {
    import s.implicits._
    val target = T.tempDir("graft_crash_ub_")
    val b0 = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, 1.0),
                 (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 11L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    Streams.upsertBatch(target)(b0, 0L)
    // batch 1 updates user 1; the hook dies after the swap, before the marker
    val b1 = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 12L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val boom = intercept[RuntimeException] {
      Streams.upsertBatch(target,
        id => if (id == 1L) throw new RuntimeException("simulated death"))(b1, 1L)
    }
    assert(boom.getMessage == "simulated death")
    // torn: data APPLIED (swap done) but marker absent — exactly the state
    // a halt() at that point leaves on disk
    val afterTorn = s.read.parquet(s"$target/data")
    assert(afterTorn.filter(col("user_id") === 1L).head().getAs[Long]("event_id") == 12L)
    assert(!new java.io.File(target, "_committed_1").exists())
    // redelivery of the SAME (batchId, data): must converge to the same
    // state and acknowledge, not duplicate user 1
    Streams.upsertBatch(target)(b1, 1L)
    val afterRedeliver = s.read.parquet(s"$target/data")
    assert(afterRedeliver.count() == 2)
    assert(afterRedeliver.filter(col("user_id") === 1L).count() == 1)
    assert(afterRedeliver.filter(col("user_id") === 1L).head().getAs[Long]("event_id") == 12L)
    assert(new java.io.File(target, "_committed_1").exists())
    // a SECOND redelivery (marker now present) must be a no-op skip
    Streams.upsertBatch(target)(b1.limit(0), 1L)
    assert(s.read.parquet(s"$target/data").count() == 2)
  }

  test("CrashProbeChild.poisoned is an exact pass-through when disarmed " +
    "(haltAt < 0): same rows, same schema, and it composes under the " +
    "dedup pipeline unchanged") {
    val ev = T.t(s, sf, "events").limit(500)
    val wrapped = CrashProbeChild.poisoned(ev, -1L)
    assert(wrapped.schema == ev.schema)
    assert(wrapped.exceptAll(ev).count() == 0 && ev.exceptAll(wrapped).count() == 0)
  }
}
