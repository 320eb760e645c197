package graft

import org.scalatest.funsuite.AnyFunSuite

/** Task-retry exactness (VERDICT r14 #4): the graded write-path shapes
  * commit bit-exactly when tasks fail mid-write and retry. The injection
  * (RetryProbe.flaky) throws after a few rows of every chosen partition's
  * FIRST attempt, so the torn attempt has already part-written files when
  * it dies — the commit protocol must discard them. The shared test
  * session runs master local[4,4] (task-failure budget 4) so retries are
  * actually allowed; each scenario also asserts failures were REALLY
  * injected, or the run would prove nothing. RetryProbe's main re-runs
  * these at sf0.01 on local[32,4] with speculative execution on. */
class RetrySpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def check(r: RetryProbe.ScenarioResult): Unit = {
    assert(r.nInjected > 0, s"${r.name}: no failure was injected — vacuous run")
    assert(r.missing == 0 && r.extra == 0,
      s"${r.name}: committed output differs from the clean run " +
        s"(missing=${r.missing} extra=${r.extra})")
    assert(r.rows > 0, s"${r.name}: empty comparison set")
  }

  test("dynamic-partition write commits exactly once under task retries " +
    "(sink_partitioned_write shape)") {
    check(RetryProbe.partitionedWrite(s, sf, T.tempDir("graft_retry_pw_"),
      RetryProbe.flaky(_, modulus = 1)))
  }

  test("filter+derive+partitioned load commits exactly once under task " +
    "retries (bulk_load_pipeline shape)") {
    check(RetryProbe.bulkLoad(s, sf, T.tempDir("graft_retry_bl_")))
  }

  test("fragment->compact two-hop rewrite commits exactly once with " +
    "failures in BOTH hops (etl_compact_small_files shape)") {
    check(RetryProbe.compactRewrite(s, sf, T.tempDir("graft_retry_cr_")))
  }

  test("foreachBatch upsert sink stays idempotent under mid-batch task " +
    "retries (stream_upsert_sink's streaming twin)") {
    check(RetryProbe.upsertSink(s, sf, T.tempDir("graft_retry_us_")))
  }

  test("LossProbe.holdOpen is a row-exact passthrough (hold released / no flag)") {
    // The executor-loss probe's choreography wrapper must never change
    // data: with no `go` flag it streams rows untouched, and with the flag
    // present it only delays (markers dropped, rows intact). The kill
    // scenarios themselves need separate executor PROCESSES and run in
    // graft.LossProbe under local-cluster (results pinned in BASELINE.md);
    // this spec pins the wrapper's data contract in the shared session.
    val src = T.t(s, sf, "orders")
    val flagDir = T.tempDir("graft_hold_")
    val noFlag = LossProbe.holdOpen(src, flagDir)
    assert(noFlag.exceptAll(src).count() == 0 &&
      src.exceptAll(noFlag).count() == 0)
    new java.io.File(flagDir, "go").createNewFile()
    val held = LossProbe.holdOpen(src.repartition(4), flagDir, holdMs = 300)
    assert(held.exceptAll(src).count() == 0 && src.exceptAll(held).count() == 0)
    assert(new java.io.File(flagDir).listFiles()
      .exists(_.getName.startsWith("started_")), "no task marker dropped")
  }
}
