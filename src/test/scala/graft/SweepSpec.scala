package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 scale probes (MinHashSweep / NgramSweep / SimHashSweep —
  * BASELINE.md's measured dedup economics) to the graded implementations,
  * so a probe whose pipeline drifts from the keys it claims to measure
  * fails loudly instead of producing plausible-but-unrepresentative
  * numbers. */
class SweepSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("minhash sweep: r=2 and r=4 emit the identical planted pair set " +
    "(full recall) — the Jaccard twin of LshSweepSpec") {
    val (all, nPlanted) = MinHashSweep.plantedCorpus(s, "/root/testdata/sf0.001", 2, 20)
    assert(nPlanted > 0)
    val r2 = MinHashSweep.sweepOne(all, 2, 0.8, 1)
    val r4 = MinHashSweep.sweepOne(all, 4, 0.8, 1)
    assert(r2.plantedFound == nPlanted, s"r=2 recall ${r2.plantedFound}/$nPlanted")
    assert(r4.plantedFound == nPlanted, s"r=4 recall ${r4.plantedFound}/$nPlanted")
    assert(r2.pairs == r4.pairs && r2.checksum == r4.checksum,
      s"pair sets differ: r2=(${r2.pairs},${r2.checksum}) r4=(${r4.pairs},${r4.checksum})")
    // unlike the cosine family there is no background floor to fight:
    // the recall guarantee makes MORE bands at higher r, so candidates rise
    assert(r4.bands > r2.bands)
  }

  test("ngram sweep: the analytic sum-C(df,2) candidate term equals the " +
    "measured inverted-index self-join volume, caps only ever shrink it, " +
    "and planted recall survives every cap") {
    val (all, nPlanted) = NgramSweep.viralCorpus(s, "/root/testdata/sf0.001", 2, 20)
    val sh = graft.api.Pipelines.shingles(all, "doc_id", "text")
    val dfTab = sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    def analytic(cap: Int): Long = dfTab
      .agg(coalesce(sum(when(col("df") <= cap, expr("df * (df - 1) DIV 2"))),
        lit(0L))).head().getLong(0)
    def measured(cap: Int): Long = {
      val keep = dfTab.filter(col("df") <= cap).select("sh")
      val shJ = sh.join(keep, "sh")
      shJ.select(col("doc_id").as("ia"), col("sh"))
        .join(shJ.select(col("doc_id").as("ib"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("ia") < col("ib"))
        .count()
    }
    // naturals stay at single-digit df in this corpus (measured top_df
    // [viralA, viralB, 9, ...]); 15 keeps every natural, drops both virals
    val capSmall = 15; val capBig = 100000
    assert(analytic(capSmall) == measured(capSmall),
      s"analytic(${analytic(capSmall)}) != measured(${measured(capSmall)}) at cap=$capSmall")
    assert(analytic(capBig) == measured(capBig))
    // the viral tiers are admitted at the big cap only
    assert(analytic(capBig) > analytic(capSmall))
    val lo = NgramSweep.fullRun(all, capSmall, 0.8, 1)
    val hi = NgramSweep.fullRun(all, capBig, 0.8, 1)
    assert(lo._2 == nPlanted && hi._2 == nPlanted,
      s"planted recall must survive the cap: lo=${lo._2} hi=${hi._2} want=$nPlanted")
    assert(lo._1 == hi._1 && lo._3 == hi._3,
      "viral shingles must not change the verified pair set")
  }

  test("simhash sweep: the probe's signature + 15x4 band pipeline " +
    "reproduces the graded dedup_simhash pair set exactly") {
    val sf = "/root/testdata/sf0.001"
    val corpus = T.t(s, sf, "documents").select(col("doc_id"), col("text"))
    val sig = SimHashSweep.signatures(corpus)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 15).bitwiseAND(lit(0x7FFFL))): _*))
        .as(Seq("band_pos", "band_val")))
    val got = SimHashSweep.fullRun(banded, sig, 1)
    val exp = SparkEntry.queries("dedup_simhash")(s, sf)
      .agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(ia, ib))"), lit(0L))).head()
    assert(got._1 == exp.getLong(0),
      s"pair count drifted: probe=${got._1} graded=${exp.getLong(0)}")
    assert(got._2 == exp.getLong(1),
      s"pair checksum drifted: probe=${got._2} graded=${exp.getLong(1)}")
  }

  test("state sweep: fixed-domain replay keeps state rows at the user " +
    "domain while changelog bytes grow with volume; totals stay exact") {
    val r = StateSweep.runScenario(s, TestSpark.sf, grow = false,
      changelog = true, waves = 3, chunksPerWave = 2,
      T.tempDir("graft_statesweep_"))
    assert(r.exact, "final streamed totals != batch recompute")
    val users = T.t(s, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    // the store keys the DOMAIN: 3x the replayed volume, zero state growth
    assert(r.waves.map(_.stateRows) == Seq(users, users, users),
      s"state rows ${r.waves.map(_.stateRows)} != flat $users")
    assert(r.usersMatched == users)
    // changelog mode: each wave commits deltas, so every wave's delta is
    // strictly positive (per-wave deltas, not distinct-equality on the
    // cumulative values — retention pruning or a zero-delta wave would make
    // two cumulatives equal without breaking the "every commit uploads a
    // changelog" claim; ADVICE r13)
    val cl = r.waves.map(_.changelogBytes)
    assert(cl.head > 0, s"wave 1 uploaded no changelog bytes: $cl")
    cl.zip(cl.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(b > a, s"wave ${i + 2} changelog delta ${b - a} <= 0 " +
        s"(cumulative: $cl) — no changelog was uploaded that wave")
    }
    assert(r.waves.last.nChangelog > r.waves.head.nChangelog)
  }

  test("state restore: every fresh-query drain restores the store exactly " +
    "(probe totals == batch recompute) and state rows track the built domain") {
    val pts = StateRestore.runScenario(s, TestSpark.sf, changelog = true,
      retain = None, buildWaves = 2, probeReps = 1,
      T.tempDir("graft_staterestore_"))
    // runScenario verifies totals after EVERY warm AND cold drain (require
    // inside — probe chunks touch EXISTING keys, so a lost restore shows up
    // as a wrong total, not a missing row). Shape pins:
    val users = T.t(s, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    // growing domain: wave w leaves exactly w*users keys (probes reuse
    // wave-1 keys, adding none)
    assert(pts.map(_.afterWave) == Seq(1, 2))
    assert(pts.map(_.stateRows) == Seq(users, 2 * users),
      s"state rows ${pts.map(_.stateRows)} != ${Seq(users, 2 * users)}")
    // changelog mode: the restored version's tail exists on disk
    assert(pts.last.nChangelog > 0)
  }

  test("state sweep: growing-domain replay grows state rows with the key " +
    "domain; changelog off uploads snapshot zips, never changelogs") {
    val r = StateSweep.runScenario(s, TestSpark.sf, grow = true,
      changelog = false, waves = 2, chunksPerWave = 2,
      T.tempDir("graft_statesweep_"))
    assert(r.exact, "final streamed totals != batch recompute")
    val users = T.t(s, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    // wave 2 brings an all-new shifted user domain: state rows double
    assert(r.waves.map(_.stateRows) == Seq(users, 2 * users),
      s"state rows ${r.waves.map(_.stateRows)} != ${Seq(users, 2 * users)}")
    assert(r.usersMatched == 2 * users)
    // snapshot mode: zero .changelog files ever; snapshot bytes (version
    // zips + uploaded .sst files) grow per commit
    assert(r.waves.forall(_.nChangelog == 0))
    val snaps = r.waves.map(_.snapBytes)
    assert(snaps.forall(_ > 0) && snaps.last > snaps.head,
      s"snapshot bytes not growing: $snaps")
  }
}
