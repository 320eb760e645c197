package graft

/** Scratch experiment (round 9, VERDICT r8 #6): compare IVF-PQ codebook
  * strategies for RECALL on the fixture embeddings, all in-memory (the
  * corpus is 500-5k vectors at test scales — this is a design probe, not a
  * query path). Variants:
  *   raw    — current vector_ivfpq_topk: codewords = coarse-centroid slices
  *   resA   — residual codewords = residuals of candidates 20..27
  *   resB   — resA + the zero codeword
  *   resC   — one Lloyd update: codewords = mean of assigned residual subs
  *   resD   — per-cell first-candidate residuals as codewords
  */
object DriveResProbe {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    val dir = if (args.nonEmpty) args(0) else TestSpark.sf
    val rows = T.t(s, dir, "embeddings").orderBy("vec_id").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val emb = rows.toMap
    val dim = emb.values.head.length
    val M = 4; val sub = dim / M
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def slice(v: Array[Double], m: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, m * sub, (m + 1) * sub)
    def minus(a: Array[Double], b: Array[Double]): Array[Double] =
      Array.tabulate(a.length)(i => a(i) - b(i))
    val cents = (0L until 8L).map(emb).toArray
    val qids = rows.map(_._1).filter(_ < 20)
    val cids = rows.map(_._1).filter(_ >= 20)
    def cellOf(v: Array[Double]): Int =
      (0 until 8).maxBy(c => (math.rint(dot(v, cents(c)) * 1e6), -c))
    val cell = cids.map(c => c -> cellOf(emb(c))).toMap
    val resid = cids.map(c => c -> minus(emb(c), cents(cell(c)))).toMap
    // ground truth top-5 per query
    val truth = qids.flatMap { q =>
      cids.sortBy(c => (-dot(emb(q), emb(c)), c)).take(5).map(q -> _)
    }.toSet
    def recall(got: Set[(Long, Long)]): Double =
      (truth intersect got).size.toDouble / truth.size
    // generic ADC eval: codebook per m; candidate encodes vec (raw or resid);
    // query scores with qvecFn; add qbase if residual
    def eval(book: Int => Array[Array[Double]], useResid: Boolean): Double = {
      val codes = cids.map { c =>
        val v = if (useResid) resid(c) else emb(c)
        c -> Array.tabulate(M) { m =>
          val cb = book(m)
          cb.indices.maxBy(k =>
            (math.rint((dot(slice(v, m), cb(k)) - 0.5 * dot(cb(k), cb(k))) * 1e6), -k))
        }
      }.toMap
      val got = qids.flatMap { q =>
        val probes = (0 until 8).sortBy(c => (-math.rint(dot(emb(q), cents(c)) * 1e6), c)).take(2).toSet
        val cand = cids.filter(c => probes(cell(c)))
        val scored = cand.map { c =>
          // inner-product ADC: est = dot(q, mu) + sum_m dot(q_m, rhat_m)
          // (the query RESIDUAL belongs to L2 scoring, not IP — using it
          // adds a -dot(mu, rhat) bias term that is pure ranking noise)
          val base = if (useResid) dot(emb(q), cents(cell(c))) else 0.0
          val est = base + (0 until M).map(m =>
            dot(slice(emb(q), m), book(m)(codes(c)(m)))).sum
          (c, est)
        }
        scored.sortBy { case (c, e) => (-e, c) }.take(5).map(q -> _._1)
      }.toSet
      recall(got)
    }
    val rawBook = (m: Int) => cents.map(slice(_, m))
    println(f"raw  : ${eval(rawBook, useResid = false)}%.3f")
    val seedsA = (m: Int) => (20L until 28L).map(c => slice(resid(c), m)).toArray
    println(f"resA : ${eval(seedsA, useResid = true)}%.3f")
    val seedsB = (m: Int) => seedsA(m) :+ Array.fill(sub)(0.0)
    println(f"resB : ${eval(seedsB, useResid = true)}%.3f")
    // Lloyd training on residual subvectors: `iters` assignment+mean rounds
    def lloydTrain(init: Int => Array[Array[Double]], iters: Int): Array[Array[Array[Double]]] =
      (0 until M).map { m =>
        var cb = init(m)
        for (_ <- 1 to iters) {
          val assigned = cids.groupBy(c =>
            cb.indices.maxBy(k =>
              (math.rint((dot(slice(resid(c), m), cb(k)) - 0.5 * dot(cb(k), cb(k))) * 1e6), -k)))
          cb = cb.indices.map { k =>
            assigned.get(k) match {
              case Some(cs) => Array.tabulate(sub)(i =>
                cs.map(c => slice(resid(c), m)(i)).sum / cs.length)
              case None => cb(k)
            }
          }.toArray
        }
        cb
      }.toArray
    val lloyd1 = lloydTrain(seedsA, 1)
    println(f"resC : ${eval(m => lloyd1(m), useResid = true)}%.3f")
    val firstPerCell = (0 until 8).flatMap(cl =>
      cids.filter(c => cell(c) == cl).sorted.headOption).toArray
    val seedsD = (m: Int) => firstPerCell.map(c => slice(resid(c), m))
    println(f"resD : ${eval(seedsD, useResid = true)}%.3f")
    val lloyd3 = lloydTrain(seedsA, 3)
    println(f"resE : ${eval(m => lloyd3(m), useResid = true)}%.3f (lloyd3)")
    val lloyd3z = lloydTrain(seedsB, 3)
    println(f"resF : ${eval(m => lloyd3z(m), useResid = true)}%.3f (lloyd3+zero)")
    val seeds16 = (m: Int) => (20L until 36L).map(c => slice(resid(c), m)).toArray
    val lloyd3w = lloydTrain(seeds16, 3)
    println(f"resG : ${eval(m => lloyd3w(m), useResid = true)}%.3f (lloyd3, 16 entries)")
    val lloyd10 = lloydTrain(seedsA, 10)
    println(f"resH : ${eval(m => lloyd10(m), useResid = true)}%.3f (lloyd10)")
    val seeds16z = (m: Int) => seeds16(m) :+ Array.fill(sub)(0.0)
    val lloyd16z = lloydTrain(seeds16z, 3)
    println(f"resI : ${eval(m => lloyd16z(m), useResid = true)}%.3f (lloyd3, 16+zero)")
    val seeds32 = (m: Int) => (20L until 52L).map(c => slice(resid(c), m)).toArray
    val lloyd32 = lloydTrain(seeds32, 3)
    println(f"resJ : ${eval(m => lloyd32(m), useResid = true)}%.3f (lloyd3, 32 entries)")
    // farthest-point (deterministic) init over residual subvectors, 16 entries
    def fpsInit(m: Int, k: Int): Array[Array[Double]] = {
      val pts = cids.map(c => slice(resid(c), m))
      val first = pts.zip(cids).minBy { case (_, c) => c }._1
      val chosen = scala.collection.mutable.ArrayBuffer(first)
      while (chosen.length < k) {
        val next = pts.zip(cids).maxBy { case (p, c) =>
          (chosen.map(ch => -math.rint(dot(minus(p, ch), minus(p, ch)) * 1e6)).max * -1, -c)
        }._1
        chosen += next
      }
      chosen.toArray
    }
    val fps16 = (0 until M).map(m => fpsInit(m, 16)).toArray
    val lloydF = lloydTrain(m => fps16(m), 5)
    println(f"resK : ${eval(m => lloydF(m), useResid = true)}%.3f (fps16+lloyd5)")
    println(f"ref  : truth=${truth.size} cands=${cids.length}")
  }
}
