package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2-K: each Structured Streaming implementation over a chunked
  * file replay equals its declared batch form once the stream drains
  * (batch-equivalence), plus the watermark late-drop semantics that have no
  * batch analogue.
  */
class StreamingSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def chunks(late: Boolean = false): String = {
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 5, lateTail = late)
    dir
  }

  test("tumbling window: streaming result == batch stream_tumbling_window") {
    val got = Streams.runToMemory(
        Streams.tumbling(Streams.readReplay(s, chunks())), "t_tumble", OutputMode.Complete())
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = SparkEntry.queries("stream_tumbling_window")(s, sf)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("sliding window: streaming == batch stream_sliding_window") {
    val got = Streams.runToMemory(
        Streams.sliding(Streams.readReplay(s, chunks())), "t_slide", OutputMode.Complete())
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString, r.getLong(1))).toSet
    val want = SparkEntry.queries("stream_sliding_window")(s, sf)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString, r.getLong(1))).toSet
    assert(got == want)
  }

  test("session window: per-user session counts == batch stream_session_window") {
    val table = Streams.runToMemory(
      Streams.sessions(Streams.readReplay(s, chunks())), "t_sess", OutputMode.Complete())
    val got = table.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = SparkEntry.queries("stream_session_window")(s, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"))).toMap
    assert(got == want)
  }

  test("daily top-k: streaming counts + rank-at-serve == batch stream_topk_per_window") {
    val counts = Streams.runToMemory(
      Streams.dailyTypeCounts(Streams.readReplay(s, chunks())), "t_topk",
      OutputMode.Complete())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w_start").orderBy(col("cnt").desc, col("event_type"))
    val got = counts.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val want = SparkEntry.queries("stream_topk_per_window")(s, sf)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getAs[Long]("cnt"), r.getAs[Int]("rnk"))).toSet
    assert(got == want)
  }

  test("watermark: late chunk rows are dropped by the 1h watermark") {
    val q = Streams.tumblingWithWatermark(Streams.readReplay(s, chunks(late = true)))
      .writeStream.format("memory").queryName("t_wm").outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped > 0, "the late tail chunk must be dropped by the watermark")
    // final counted rows = everything except the late tail chunk (the first
    // ceil(n/5) events by ts, replayed last, all behind the watermark)
    val total = T.t(s, sf, "events").count()
    val lateChunk = math.ceil(total / 5.0).toLong
    val counted = s.table("t_wm").groupBy("w_start").agg(max("cnt").as("cnt"))
      .agg(sum("cnt")).collect().head.getLong(0)
    assert(counted == total - lateChunk, s"counted=$counted late=$lateChunk")
  }

  test("stateful dedup: duplicated replay collapses to distinct event_ids") {
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 3)
    // duplicate every chunk file, interleaved right after its original in
    // mtime order: the replay delivers each event twice, one batch apart
    val base = new java.io.File(dir)
    base.listFiles().filter(_.getName.startsWith("chunk_")).foreach { f =>
      val copy = new java.io.File(base, f.getName.replace(".parquet", "d.parquet"))
      java.nio.file.Files.copy(f.toPath, copy.toPath)
      copy.setLastModified(f.lastModified() + 1)
    }
    val got = Streams.runToMemory(
      Streams.dedup(Streams.readReplay(s, dir)), "t_dedup", OutputMode.Append())
    assert(got.count() == T.t(s, sf, "events").count())
    assert(got.select("event_id").distinct().count() == got.count())
  }

  test("mapGroupsWithState running totals == batch stream_stateful_running finals") {
    import s.implicits._
    val q = Streams.runningTotals(Streams.readReplay(s, chunks()))
      .toDF("user_id", "total_cents")
      .writeStream.format("memory").queryName("t_run").outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode appends one (user, running-total) row per touched batch;
    // the final state equals the batch per-user total, so that total must
    // appear among the user's emissions (totals aren't monotone — no maxBy)
    val emissions = s.table("t_run").collect()
      .map(r => (r.getLong(0), Math.round(r.getDouble(1))))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val want = T.t(s, sf, "events")
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(emissions.keySet == want.keySet)
    want.foreach { case (u, cents) =>
      assert(emissions(u).contains(cents),
        s"user $u: batch total $cents not among emissions ${emissions(u)}")
    }
  }

  test("transformWithState (state API v2, RocksDB) matches batch totals") {
    import s.implicits._
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(prov)
    s.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streams.runningTotalsTws(Streams.readReplay(s, chunks()))
        .toDF("user_id", "total_cents")
        .writeStream.format("memory").queryName("t_tws").outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val emissions = s.table("t_tws").collect()
        .map(r => (r.getLong(0), Math.round(r.getDouble(1))))
        .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
      val want = T.t(s, sf, "events")
        .groupBy("user_id")
        .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(emissions.keySet == want.keySet)
      want.foreach { case (u, cents) =>
        assert(emissions(u).contains(cents), s"user $u: $cents not in ${emissions(u)}")
      }
    } finally {
      old match { case Some(v) => s.conf.set(prov, v); case None => s.conf.unset(prov) }
    }
  }

  test("stream-stream interval join == batch stream_stream_join") {
    val dir = chunks()
    val got = Streams.runToMemory(
        Streams.purchaseClickJoin(Streams.readReplay(s, dir), Streams.readReplay(s, dir)),
        "t_ssj", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = SparkEntry.queries("stream_stream_join")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("foreachBatch idempotent upsert sink: replay twice == replay once " +
    "(VERDICT r8 #4)") {
    val replayDir = chunks()
    val target = T.tempDir("graft_upsert_tgt_")
    // first drain: target holds the latest (max ts, then max event_id)
    // event per user — the keyed-upsert contract
    Streams.runUpsertSink(s, replayDir, target, T.tempDir("graft_upsert_ck1_"))
    def snapshot(): Set[(Long, Long)] =
      s.read.parquet(s"$target/data").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))).toSet
    val once = snapshot()
    // the graded batch twin (stream_upsert_sink) IS the convergence target
    val expected = SparkEntry.queries("stream_upsert_sink")(s, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))).toSet
    assert(once == expected, "upsert target must equal batch stream_upsert_sink")
    // retry guard: re-delivering an already-committed (batchId, data) pair
    // (foreachBatch is at-least-once on failure) is a no-op
    val chunk0 = new java.io.File(replayDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    Streams.upsertBatch(target)(
      s.read.schema(Streams.eventsSchema).parquet(chunk0.toString), 0L)
    assert(snapshot() == once, "retried batch must not change the target")
    // full reprocess from a FRESH checkpoint (offset log gone): the
    // deterministic batch->chunk mapping + commit markers converge to the
    // identical target state
    Streams.runUpsertSink(s, replayDir, target, T.tempDir("graft_upsert_ck2_"))
    assert(snapshot() == once, "fresh-checkpoint replay must be idempotent")
  }

  test("state TTL: counts reset across a gap > ttl == batch stream_state_ttl " +
    "(retention within a period, eviction across; no-TTL control cumulates)") { withRocksDb {
    import org.apache.spark.sql.types.TimestampNTZType
    val split = "2024-01-16 00:00:00"
    val ev = T.t(s, sf, "events")
    val p1 = ev.filter(col("ts") < lit(split).cast(TimestampNTZType))
    val p2 = ev.filter(col("ts") >= lit(split).cast(TimestampNTZType))
    // period 1 as TWO back-to-back micro-batches (≪ ttl apart: proves the
    // TTL'd state is RETAINED and accumulates across batches), then a
    // 35 s gap > the 30 s ttl before period 2 (proves EVICTION)
    val dir = T.tempDir("graft_ttl_replay_")
    Streams.appendChunks(s, p1, dir, n = 2, startIdx = 0)
    val out = T.tempDir("graft_ttl_out_")
    val ttlStateRows = Streams.runTtlReplay(s, dir, out,
      T.tempDir("graft_ttl_ck_"), split,
      java.time.Duration.ofSeconds(30), gapMs = 35000,
      wave1Rows = p1.count(), wave2Rows = p2.count(),
      addLater = () => Streams.appendChunks(s, p2, dir, n = 1, startIdx = 2))
    // measured state-cardinality gate (VERDICT r12 #4): after wave 2 the
    // TTL'd ValueState holds at most the wave-2-ACTIVE user domain — the
    // wave-1 entries are > ttl old and evicted; without eviction the
    // bound would be the full keyed domain (the no-TTL control's shape)
    val p2Users = p2.select("user_id").distinct().count()
    val ttlTotal = ttlStateRows.map(_._2).sum
    info(s"TTL state rows after wave 2: $ttlTotal (wave-2 users: $p2Users)")
    assert(ttlTotal > 0 && ttlTotal <= p2Users,
      s"TTL state rows $ttlTotal exceed the wave-2 active-user bound $p2Users")
    // final running count per (user, period) = max of the emitted ladder
    val got = s.read.parquet(out)
      .groupBy("user_id", "period").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("period"),
        r.getAs[Long]("cnt"))).toSet
    val want = SparkEntry.queries("stream_state_ttl")(s, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("period"),
        r.getAs[Long]("cnt"))).toSet
    assert(got == want, "TTL eviction must reset counts at the period boundary")
    // control: a ttl far beyond the (tiny) gap evicts nothing — the final
    // per-user count is CUMULATIVE across periods, proving the reset above
    // was the TTL, not an artifact of the two-wave replay
    val dir2 = T.tempDir("graft_ttl_replay2_")
    Streams.appendChunks(s, p1, dir2, n = 2, startIdx = 0)
    val out2 = T.tempDir("graft_ttl_out2_")
    Streams.runTtlReplay(s, dir2, out2, T.tempDir("graft_ttl_ck2_"), split,
      java.time.Duration.ofDays(1), gapMs = 100,
      wave1Rows = p1.count(), wave2Rows = p2.count(),
      addLater = () => Streams.appendChunks(s, p2, dir2, n = 1, startIdx = 2))
    val gotTotal = s.read.parquet(out2).groupBy("user_id").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toMap
    val wantTotal = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toMap
    assert(gotTotal == wantTotal, "no-TTL control must cumulate across periods")
  }}

  test("parquet sink + checkpoint: restart resumes exactly-once (no reprocessing)") {
    // phase 1 processes 3 of 5 chunks into a parquet sink with a checkpoint;
    // phase 2 adds the remaining chunks and restarts with the SAME
    // checkpoint — the offset log must skip the already-committed batches
    // and the recovered dedup state must keep event_ids unique, so the sink
    // holds each event exactly once.
    val srcAll = T.tempDir("graft_replay_all_")
    Streams.writeChunks(s, sf, srcAll, n = 5)
    val chunkFiles = new java.io.File(srcAll).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val replayDir = T.tempDir("graft_replay_inc_")
    val sinkDir = T.tempDir("graft_sink_")
    val ckptDir = T.tempDir("graft_ckpt_")
    def copyIn(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(replayDir, f.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(15) // distinct mtimes keep file order deterministic
    }
    def runDrain(): Seq[(String, Long)] = {
      val q = Streams.dedup(Streams.readReplay(s, replayDir))
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(o => (o.operatorName, o.numRowsTotal))
    }
    copyIn(chunkFiles.take(3)); runDrain()
    val afterPhase1 = s.read.parquet(sinkDir).count()
    copyIn(chunkFiles.drop(3))
    val stateRows = runDrain()
    val sunk = s.read.parquet(sinkDir)
    val nUnique = SparkEntry.queries("stream_dedup_stateful")(s, sf)
      .collect().head.getAs[Long]("n_unique")
    assert(afterPhase1 > 0 && afterPhase1 < nUnique, s"phase1=$afterPhase1")
    assert(sunk.count() == nUnique,
      s"sink rows ${sunk.count()} != $nUnique unique events")
    assert(sunk.select("event_id").distinct().count() == nUnique)
    // measured state-cardinality gate (VERDICT r12 #4): the dedup store
    // keys distinct event_ids inside the watermark horizon — bounded by
    // the unique-id domain, never by replayed volume (duplicates add rows
    // to the stream but not to the store)
    val dedupTotal = stateRows.map(_._2).sum
    info(s"dedup state rows: $dedupTotal (unique-id bound: $nUnique)")
    assert(dedupTotal > 0 && dedupTotal <= nUnique,
      s"dedup state rows $dedupTotal exceed the unique-id bound $nUnique")
  }

  test("MapState distinct types: final streamed state == batch stream_distinct_state") {
    // transformWithState needs multi-column-family state → RocksDB provider
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(prov)
    s.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // Update mode emits a row per (user, batch); the count is monotone,
      // so the max per user is the drained final state
      val (table, stateRows) = Streams.runToMemoryState(
          Streams.distinctTypes(Streams.readReplay(s, chunks())).toDF("user_id", "n"),
          "t_mapstate", OutputMode.Update())
      val got = table
        .groupBy("user_id").agg(max(col("n")).as("n_types"))
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
      val want = SparkEntry.queries("stream_distinct_state")(s, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
      // measured state-cardinality gate (VERDICT r12 #4): MapState keeps
      // one entry per (user, distinct type) — bounded by the enum domain
      // users × types, NEVER by replayed row volume
      val ev = T.t(s, sf, "events")
      val bound = ev.select("user_id").distinct().count() *
        ev.select("event_type").distinct().count()
      val total = stateRows.map(_._2).sum
      info(s"MapState rows: $total (users x types bound: $bound)")
      assert(total > 0 && total <= bound,
        s"MapState rows $total exceed the users x types domain bound $bound")
    } finally {
      old match { case Some(v) => s.conf.set(prov, v); case None => s.conf.unset(prov) }
    }
  }

  test("stateful streaming funnel: final stages == batch funnel") {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(prov)
    s.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // stage is monotone, so the max Update emission per user is final
      val got = Streams.runToMemory(
          Streams.funnel(Streams.readReplay(s, chunks())).toDF("user_id", "st"),
          "t_funnel", OutputMode.Update())
        .groupBy("user_id").agg(max(col("st")).as("stage"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val want = graft.api.Pipelines
        .funnelStages(T.t(s, sf, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == want)
    } finally {
      old match { case Some(v) => s.conf.set(prov, v); case None => s.conf.unset(prov) }
    }
  }

  test("streaming near-dup dedup == batch LSH survivors; panel audit agrees (VERDICT r7 #6)") {
    val dir = T.tempDir("graft_embreplay_")
    Streams.writeEmbChunks(s, sf, dir, n = 5)
    val static = T.t(s, sf, "embeddings")
    val flags = Streams.runToMemory(
      Streams.nearDupSurvivors(Streams.readEmbReplay(s, dir), static),
      "t_neardup", OutputMode.Complete())
    val got = flags.filter(col("dup") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // full-corpus batch twin (the pre-r13 graded form): LSH candidates →
    // any-earlier-neighbor suppression → left-anti survivors
    val dups = graft.api.Pipelines
      .cosinePairsLSH(static, "vec_id", "embedding", threshold = 0.45)
      .select(col("ib").as("vec_id")).distinct()
    val want = static.join(dups, Seq("vec_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    // the r13 graded key audits a capped panel of exactly this gate: its
    // survives flag must agree with the streaming survivor set on the panel
    val panel = SparkEntry.queries("stream_dedup_neardup")(s, sf)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("survives")))
    assert(panel.nonEmpty)
    panel.foreach { case (id, sv) =>
      assert((sv == 1L) == got.contains(id), s"panel doc $id")
    }
  }

  test("signature gate: dropDuplicatesWithinWatermark collapses equal LSH signatures") {
    val dir = T.tempDir("graft_embreplay_")
    Streams.writeEmbChunks(s, sf, dir, n = 5)
    val got = Streams.runToMemory(
      Streams.sigDedup(Streams.readEmbReplay(s, dir)),
      "t_sigdedup", OutputMode.Append())
    // a 16-bit signature over 500 docs collides heavily, so the gate
    // genuinely drops rows. The surviving signature SET (and its size —
    // one survivor per distinct signature) must equal the batch distinct;
    // the representative is whichever row the state op saw first within a
    // micro-batch, so identity is deliberately unpinned.
    val batchSigs = T.t(s, sf, "embeddings")
      .select(concat_ws(",",
        call_function("lsh_bands", col("embedding"), lit(2), lit(8), lit(42L))
          .cast("array<string>")).as("sig"))
      .distinct().collect().map(_.getString(0)).toSet
    val gotRows = got.select("sig").collect().map(_.getString(0))
    assert(gotRows.toSet == batchSigs)
    assert(gotRows.length == batchSigs.size)
  }

  test("ListState top-k: final per-user top-3 == batch stream_topk_state") {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(prov)
    s.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the memory sink appends one whole-list emission per (user, batch);
      // the list state is monotone (merging only improves it pointwise),
      // so each user's FINAL state is their pointwise-maximal emission
      import scala.math.Ordering.Implicits._
      val (emitted, stateRows) = Streams.runToMemoryState(
        Streams.topValuesPerUser(Streams.readReplay(s, chunks()))
          .toDF("user_id", "top"),
        "t_liststate", OutputMode.Update())
      // measured state-cardinality gate (VERDICT r12 #4): ListState keeps
      // at most k=3 entries per user — O(users × k), never row volume
      val kBound = T.t(s, sf, "events")
        .select("user_id").distinct().count() * 3
      val stTotal = stateRows.map(_._2).sum
      info(s"ListState rows: $stTotal (users x 3 bound: $kBound)")
      assert(stTotal > 0 && stTotal <= kBound,
        s"ListState rows $stTotal exceed the users x k bound $kBound")
      val got = emitted.collect()
        .map(r => (r.getLong(0), r.getString(1).split(",").map(_.toDouble).toSeq))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
      val want = SparkEntry.queries("stream_topk_state")(s, sf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3).toSeq }
      assert(got == want)
    } finally {
      old match { case Some(v) => s.conf.set(prov, v); case None => s.conf.unset(prov) }
    }
  }

  test("left-outer stream-stream join == batch stream_join_left_outer") {
    // flushTail: without the sentinel chunk the watermark never passes the
    // last purchases' join windows, so their null-padded rows are withheld
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 5, flushTail = true)
    val got = Streams.runToMemory(
        Streams.purchaseClickLeftJoin(Streams.readReplay(s, dir), Streams.readReplay(s, dir)),
        "t_ssjlo", OutputMode.Append())
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .filter(_._1 != Streams.FlushPurchaseId).toSet
    val want = SparkEntry.queries("stream_join_left_outer")(s, sf)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == want)
  }

  private def withRocksDb[A](body: => A): A = {
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(prov)
    s.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(v) => s.conf.set(prov, v); case None => s.conf.unset(prov)
    }
  }

  test("event-time timers: sessionizer emissions == batch stream_session_timers") {
    // flushTail: a session with no later event closes ONLY through its
    // event-time timer, and the terminal timers (lastTs+30min) need the
    // final watermark past them — the sentinel chunk provides that
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 5, flushTail = true)
    withRocksDb {
      val got = Streams.runToMemory(
          Streams.sessionsWithTimers(Streams.readReplay(s, dir))
            .toDF("user_id", "start_us", "n_events", "dur_s"),
          "t_timer_sess", OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = SparkEntry.queries("stream_session_timers")(s, sf)
        .collect().map(r => (r.getAs[Long]("user_id"),
          java.time.Duration.between(java.time.LocalDateTime.of(1970, 1, 1, 0, 0),
            r.getAs[java.time.LocalDateTime]("s_start")).toNanos / 1000,
          r.getAs[Long]("n_events"), r.getAs[Long]("dur_s"))).toSet
      assert(got == want,
        s"timer sessions diverge: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }
  }

  test("event-time timers: inactivity alerts == batch stream_inactivity_alert") {
    // flushHours=4: the terminal timer of the globally LAST event sits at
    // maxTs+2h; the final watermark must be STRICTLY past it to fire
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 5, flushTail = true, flushHours = 4)
    withRocksDb {
      val got = Streams.runToMemory(
          Streams.inactivityAlerts(Streams.readReplay(s, dir))
            .toDF("user_id", "event_id"),
          "t_timer_idle", OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = SparkEntry.queries("stream_inactivity_alert")(s, sf)
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))).toSet
      assert(got == want,
        s"alerts diverge: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }
  }

  test("chained stateful operators: dedup → hourly window == batch stream_chained_stateful") {
    // duplicate every chunk (each event delivered twice, one batch apart):
    // the dedup stage must collapse them BEFORE the window counts, or every
    // hourly count doubles — that is what makes this a real two-stateful
    // chain and not two queries glued together
    val dir = T.tempDir("graft_replay_")
    Streams.writeChunks(s, sf, dir, n = 5, flushTail = true)
    val base = new java.io.File(dir)
    base.listFiles().filter(_.getName.startsWith("chunk_")).foreach { f =>
      val copy = new java.io.File(base, f.getName.replace(".parquet", "d.parquet"))
      java.nio.file.Files.copy(f.toPath, copy.toPath)
      copy.setLastModified(f.lastModified() + 1)
    }
    val got = Streams.runToMemory(
        Streams.dedupThenHourly(Streams.readReplay(s, dir)),
        "t_chain", OutputMode.Append())
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getLong(1))).toSet
    val want = SparkEntry.queries("stream_chained_stateful")(s, sf)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getAs[Long]("cnt"))).toSet
    assert(got == want,
      s"chained counts diverge: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("stream-static enrich: broadcast dim join + window agg == batch stream_static_enrich") {
    val dim = T.t(s, sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val got = Streams.runToMemory(
        Streams.staticEnrich(Streams.readReplay(s, chunks()), dim),
        "t_enrich", OutputMode.Complete())
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = SparkEntry.queries("stream_static_enrich")(s, sf)
      .collect().map(r => (r.getAs[java.time.LocalDateTime]("w_start").toString,
        r.getString(1), r.getAs[Long]("cnt"), r.getAs[Double]("sum_value"))).toSet
    assert(got == want,
      s"enrich diverges: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("initial state: batch-seeded totals over a period-2-only replay " +
    "== batch stream_initial_state grand totals") { withRocksDb {
    import s.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    val split = "2024-01-16 00:00:00"
    val ev = T.t(s, sf, "events")
    val p2 = ev.filter(col("ts") >= lit(split).cast(TimestampNTZType))
    // the warm-start state: period-1 cents per user, computed in BATCH —
    // the replay below never delivers a period-1 event
    val seeds = ev.filter(col("ts") < lit(split).cast(TimestampNTZType))
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("cents"))
      .as[(Long, Long)]
    val dir = T.tempDir("graft_seed_replay_")
    Streams.appendChunks(s, p2, dir, n = 3, startIdx = 0)
    val q = Streams.seededTotals(Streams.readReplay(s, dir), seeds)
      .toDF("user_id", "n_seen", "total_cents")
      .writeStream.format("memory").queryName("t_seed").outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // final state per user = the max-n_seen emission (n_seen is strictly
    // increasing per key; totals are non-monotone when values go negative)
    val finals = s.table("t_seed").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).maxBy(_._1)._2 }
    // graded twin: the GRAND total per user (seed + streamed) — for every
    // user the replay touched, the final streamed total must equal it,
    // which proves handleInitialState applied the seed before batch 1
    val twin = SparkEntry.queries("stream_initial_state")(s, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        Math.round(r.getAs[Double]("total_value") * 100),
        if (r.isNullAt(r.fieldIndex("seed_value"))) 0L
        else Math.round(r.getAs[Double]("seed_value") * 100)))
    val p2users = p2.select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(finals.keySet == p2users, "every touched user emits, only those")
    twin.filter(t => p2users.contains(t._1)).foreach { case (u, totalCents, _) =>
      assert(finals(u) == totalCents,
        s"user $u: final ${finals(u)} != grand total $totalCents")
    }
    // the seed genuinely contributed: at least one touched user has a
    // nonzero seed, so their grand total differs from the period-2-only sum
    val p2only = p2.groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(twin.exists { case (u, tot, seedCents) =>
      p2users.contains(u) && seedCents != 0L && tot != p2only(u) },
      "replay must include a user whose seed changes the outcome")
  }}

  test("initial state applies ONCE per checkpoint lifetime: a restart " +
    "resumes from the store and must not re-apply seeds") { withRocksDb {
    import s.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    val split = "2024-01-16 00:00:00"
    val ev = T.t(s, sf, "events")
    val p2 = ev.filter(col("ts") >= lit(split).cast(TimestampNTZType))
      .orderBy("ts", "event_id").localCheckpoint()
    val half = (p2.count() / 2).toInt
    val w1 = p2.limit(half)
    val w2 = p2.exceptAll(w1)
    val seeds = ev.filter(col("ts") < lit(split).cast(TimestampNTZType))
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("cents"))
      .as[(Long, Long)].localCheckpoint()
    val dir = T.tempDir("graft_seed_restart_")
    val out = T.tempDir("graft_seed_out_")
    val ck = T.tempDir("graft_seed_ck_")
    def drain(): Unit = {
      val q = Streams.seededTotals(Streams.readReplay(s, dir), seeds)
        .toDF("user_id", "n_seen", "total_cents")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.exception.foreach(throw _)
    }
    // wave 1 from a FRESH checkpoint: seeds apply here, and only here
    Streams.appendChunks(s, w1, dir, n = 2, startIdx = 0)
    drain()
    // restart against the SAME checkpoint with new files staged: the
    // processor resumes from the state store — handleInitialState must
    // NOT run again, or every seeded user double-counts their seed
    Streams.appendChunks(s, w2, dir, n = 2, startIdx = 2)
    drain()
    val finals = s.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_seen"), r.getAs[Long]("total_cents"))))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).maxBy(_._1)._2 }
    val grand = ev.groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as long)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val seedMap = seeds.collect().toMap
    val p2users = p2.select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(finals.keySet == p2users)
    p2users.foreach { u =>
      assert(finals(u) == grand(u),
        s"user $u: final ${finals(u)} != grand ${grand(u)} " +
          s"(double-seed would read ${grand(u) + seedMap.getOrElse(u, 0L)})")
    }
    // the assert above distinguishes the failure mode only if some
    // touched user has a nonzero seed — require it
    assert(p2users.exists(u => seedMap.getOrElse(u, 0L) != 0L),
      "fixture must include a seeded user in the replay")
  }}
}
