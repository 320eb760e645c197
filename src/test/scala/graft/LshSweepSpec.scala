package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the rowsPerBand scaling property graft.LshSweep demonstrates
  * (BASELINE.md): with the band count re-derived per r by
  * CosineLsh.bandsFor, raising rowsPerBand cuts band-collision noise
  * without losing pairs — the emitted pair SET is identical at every r
  * and every planted near-dup is found. */
class LshSweepSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("lsh sweep: r=8 and r=16 emit the identical planted pair set; " +
    "candidate volume shrinks with r") {
    val (all, nPlanted) = LshSweep.plantedCorpus(s, "/root/testdata/sf0.01", 20)
    assert(nPlanted == 25)
    val r8 = LshSweep.sweepOne(all, 8, 0.9, 1)
    val r16 = LshSweep.sweepOne(all, 16, 0.9, 1)
    assert(r8.plantedFound == nPlanted, s"r=8 recall ${r8.plantedFound}/$nPlanted")
    assert(r16.plantedFound == nPlanted, s"r=16 recall ${r16.plantedFound}/$nPlanted")
    assert(r8.pairs == r16.pairs && r8.checksum == r16.checksum,
      s"pair sets differ: r8=(${r8.pairs},${r8.checksum}) r16=(${r16.pairs},${r16.checksum})")
    assert(r16.candRaw < r8.candRaw,
      s"raising rowsPerBand should cut candidates: r8=${r8.candRaw} r16=${r16.candRaw}")
    // the derived band count preserves the per-pair recall guarantee, so
    // more selective bands must be compensated by more of them
    assert(r16.bands > r8.bands)
  }
}
