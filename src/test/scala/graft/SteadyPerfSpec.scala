package graft

import org.scalatest.funsuite.AnyFunSuite

/** Steady-state perf regression guard (VERDICT r7 #4): time the sentinel
  * keys — the dedup family plus triangle count, the plans whose shape
  * carries the 100 TB story — at sf0.1 in the warmed test JVM and compare
  * min-of-3 against the recorded per-key anchor (BASELINE_PERKEY.json,
  * local[32] min-of-3). Measured local[4]-vs-local[32] ratio on these keys
  * is 1.2–1.4× (they don't saturate 32 cores at sf0.1), so a 3.5× budget
  * leaves ~2.5× ambient headroom yet still fails on any genuine plan
  * de-optimization (an all-pairs join at sf0.1 is minutes, not seconds).
  * Before this spec, a plan regression surfaced only at judging.
  *
  * Cancels (does not fail) when the shared box is too loaded to measure
  * or the anchor file is absent.
  */
class SteadyPerfSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sfBench = "/root/testdata/sf0.1"
  private val factor = 3.5
  private val sentinels = Seq(
    "dedup_near_minhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_cluster_components", "graph_triangle_count")

  private lazy val anchor: Map[String, Double] = {
    val p = java.nio.file.Paths.get("BASELINE_PERKEY.json")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      """"([a-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  private def loadAvg: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  sentinels.foreach { key =>
    test(s"$key stays within ${factor}x of its steady-state anchor") {
      // HARD assert, not assume: the anchor file is COMMITTED, so a missing
      // key means the file is broken or was rewritten in a format this
      // spec's "key":value regex can't read — an r16 indent-mode rewrite
      // did exactly that and the assume turned 5 red tests into quiet
      // cancels. Only the load check may cancel (environmental).
      assert(anchor.contains(key),
        s"no anchor for $key in BASELINE_PERKEY.json — file missing, " +
          "truncated, or re-written in a non-compact format")
      assume(loadAvg < 16.0, f"box too loaded to measure (load=$loadAvg%.1f)")
      val budget = factor * anchor(key)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(key)(s, sfBench).count()
        (System.nanoTime() - t0) / 1e9
      }
      info(f"$key min=${times.min}%.2f s anchor=${anchor(key)}%.2f s budget=$budget%.2f s")
      assert(times.min <= budget,
        f"$key steady-state ${times.min}%.2f s exceeds $budget%.2f s " +
          f"(${factor}x anchor ${anchor(key)}%.2f s) - plan regression?")
    }
  }
}
