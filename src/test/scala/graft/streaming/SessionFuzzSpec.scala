package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingOps.{Event, Session, SessionState}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for batch/streaming sessionization parity (round-3
  * verdict #5): random event streams — exact-gap boundaries, duplicate
  * timestamps, and cross-trigger late events included — must produce
  * identical sessions through (a) the closed-form island model that the
  * `session_agg` DuckDB oracle implements, (b) `sessionizeBatch`, and
  * (c) the incremental per-trigger fold that drives the streaming
  * `sessionize` operator (chunk-at-a-time `foldSorted` with carried
  * state — the exact code path `flatMapGroupsWithState` executes per
  * trigger, minus the watermark timeout, which only ever flushes the
  * already-carried state).
  *
  * Late-delivery parity domain: an event deferred past larger-ts events
  * folds back exactly like batch whenever its session is still OPEN at
  * the trigger where it lands and a same-session successor has already
  * been delivered (then `start ≤ succ ≤ t+gap`, so the phase-2 merge in
  * foldSorted applies). The generator only defers events meeting that
  * condition — lateness beyond it is the documented stale-singleton
  * regime where batch parity is impossible by construction (the session
  * may already be emitted); for UNRESTRICTED delivery orders the spec
  * asserts conservation instead: no event lost, none double-counted.
  *
  * Values are whole doubles so sums are exact under any fold order.
  */
class SessionFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(20260812L + i)))

  /** Timestamp deltas biased to the interesting boundaries: duplicate
    * ts, exactly the gap (must MERGE — the SessionBoundarySpec pin),
    * one inside, one outside, plus ordinary small/large. */
  private val deltaGen: Gen[Long] = Gen.frequency(
    2 -> Gen.const(0L),
    3 -> Gen.const(Gap),
    3 -> Gen.const(Gap - 1),
    3 -> Gen.const(Gap + 1),
    5 -> Gen.chooseNum(1L, Gap - 2),
    4 -> Gen.chooseNum(Gap + 2, 3 * Gap))

  private val streamGen: Gen[Vector[Event]] = for {
    n <- Gen.chooseNum(0, 25)
    deltas <- Gen.listOfN(n, deltaGen)
    vals <- Gen.listOfN(n, Gen.chooseNum(0, 10))
  } yield {
    val ts = deltas.scanLeft(1000000L)(_ + _).tail
    ts.zip(vals).zipWithIndex.map { case ((t, v), i) =>
      Event(i.toLong, new java.sql.Timestamp(t), 0L, "e", v.toDouble)
    }.toVector
  }

  /** The island model == the session_agg oracle's semantics: sort by
    * ts, split strictly-greater-than-gap, aggregate in time order. */
  private def model(evs: Seq[Event], uid: Long = 0L): List[Session] = {
    // epoch-MICROS throughout, matching Session/SessionState units
    val sorted = evs.sortBy(e => StreamingOps.epochUs(e.ts))
    if (sorted.isEmpty) return Nil
    var out = List.empty[Session]
    var start = StreamingOps.epochUs(sorted.head.ts)
    var last = start
    var n = 0
    var sum = 0.0
    sorted.foreach { e =>
      val t = StreamingOps.epochUs(e.ts)
      if (t - last > Gap * 1000) {
        out ::= Session(uid, start, last, n, sum)
        start = t; n = 0; sum = 0.0
      }
      last = t; n += 1; sum += e.value
    }
    (Session(uid, start, last, n, sum) :: out).reverse
  }

  private def canon(ss: Seq[Session]): Seq[(Long, Long, Long, Int, Double)] =
    ss.map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
      s.sum_value)).sorted

  /** Run chunks through the trigger-shaped incremental fold. */
  private def incremental(chunks: Seq[Seq[Event]]): List[Session] = {
    var state: Option[SessionState] = None
    var closed = List.empty[Session]
    chunks.foreach { ch =>
      val (c, s) = StreamingOps.foldSorted(0L,
        ch.sortBy(e => StreamingOps.epochUs(e.ts)), state, Gap * 1000)
      closed ++= c
      state = s
    }
    closed ++ state.map(s =>
      Session(0L, s.start, s.lastTs, s.n, s.sumValue)).toList
  }

  /** Order-preserving random cut of the time-sorted stream into trigger
    * chunks, then safe cross-trigger deferrals: event i (sorted order)
    * may move one chunk later when its in-session successor i+1 stays
    * delivered no later than that chunk (and is not itself deferred)
    * and the next session has not yet begun by the end of that chunk —
    * the conditions under which the open state provably absorbs it. */
  private def chunkWithLateness(sorted: Vector[Event], rnd: scala.util.Random)
      : Seq[Seq[Event]] = {
    if (sorted.isEmpty) return Seq(Seq.empty)
    val nChunks = 1 + rnd.nextInt(5)
    val chunkOf = sorted.indices.map(_ => rnd.nextInt(nChunks)).sorted
    // session index per sorted position, session's last position, and
    // each session's first position (for the "next session not yet
    // started" check)
    val sess = new Array[Int](sorted.length)
    var si = 0
    sorted.indices.foreach { i =>
      if (i > 0 &&
        sorted(i).ts.getTime - sorted(i - 1).ts.getTime > Gap) si += 1
      sess(i) = si
    }
    val firstOf = sess.zipWithIndex.groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).min }
    val deferred = scala.collection.mutable.Set.empty[Int]
    val locked = scala.collection.mutable.Set.empty[Int]
    sorted.indices.dropRight(1).foreach { i =>
      val c = chunkOf(i)
      // The next session may begin in the SAME trigger the deferred
      // event lands in (chunk c+1): foldSorted judges the late prefix
      // against the carried session before the on-time fold, so a
      // session closed within that trigger still absorbs its late
      // event. (This was >= c + 2 while the fold judged late events
      // against the FINAL session — the trigger-close case was broken
      // and had to be excluded; see the regression test in
      // StreamingOpsSpec.) Only a next session opening before the
      // event's landing trigger (>= carried-state replacement) remains
      // out of the parity domain.
      val sessionOpen = firstOf.get(sess(i) + 1)
        .forall(fn => chunkOf(fn) >= c + 1)
      val succOk = sess(i + 1) == sess(i) && chunkOf(i + 1) <= c + 1 &&
        !locked.contains(i) &&
        (i == 0 || !deferred.contains(i - 1))
      // Removing i must not break the gap-chain among the remaining
      // on-time events: a deferred BRIDGE splits the session before it
      // returns, and the prematurely-closed half is already emitted —
      // the stale regime, not the parity domain.
      val noSplit = i == firstOf(sess(i)) ||
        sorted(i + 1).ts.getTime - sorted(i - 1).ts.getTime <= Gap
      if (sessionOpen && succOk && noSplit && c + 1 < nChunks &&
        rnd.nextBoolean()) {
        deferred += i
        locked += i + 1
      }
    }
    (0 until nChunks).map { c =>
      val onTime = sorted.indices.filter(i =>
        chunkOf(i) == c && !deferred.contains(i))
      val late = sorted.indices.filter(i =>
        deferred.contains(i) && chunkOf(i) == c - 1)
      // late events appended after an intra-chunk shuffle of the
      // on-time rows — foldSorted re-sorts, so arrival order inside a
      // trigger is deliberately scrambled
      rnd.shuffle((onTime ++ late).toList).map(sorted(_))
    }
  }

  test("sessionizeBatch == island model (session_agg oracle semantics) " +
    "on 1200 generated users incl. exact-gap boundaries — one Spark job") {
    val cases = samples(streamGen, 1200)
    val all = cases.zipWithIndex.flatMap { case (evs, u) =>
      evs.map(e => e.copy(user_id = u.toLong))
    }
    val got = StreamingOps
      .sessionizeBatch(all.toDS().repartition(8), Gap)
      .collect().toSeq
    val want = cases.zipWithIndex.flatMap { case (evs, u) =>
      model(evs, u.toLong)
    }
    assert(canon(got) === canon(want))
  }

  test("incremental trigger fold with safe cross-trigger late events " +
    "== island model, 1500 cases (driver-local)") {
    val rnd = new scala.util.Random(7)
    samples(streamGen, 1500).zipWithIndex.foreach { case (evs, i) =>
      val sorted = evs.sortBy(_.ts.getTime)
      val chunks = chunkWithLateness(sorted, rnd)
      assert(chunks.flatten.sortBy(_.event_id) === sorted.sortBy(_.event_id),
        s"case $i: chunking lost events")
      assert(canon(incremental(chunks)) === canon(model(evs)),
        s"case $i: chunks=${chunks.map(_.map(_.ts.getTime))}")
    }
  }

  test("unrestricted delivery order conserves every event exactly once " +
    "(stale-singleton regime included), 1000 cases") {
    val rnd = new scala.util.Random(11)
    samples(streamGen, 1000).zipWithIndex.foreach { case (evs, i) =>
      val shuffled = rnd.shuffle(evs.toList)
      val nChunks = 1 + rnd.nextInt(4)
      val chunks = shuffled.grouped(
        math.max(1, (shuffled.size + nChunks - 1) / nChunks)).toSeq
      val out = incremental(if (chunks.isEmpty) Seq(Seq.empty) else chunks)
      assert(out.map(_.n_events).sum === evs.size, s"case $i: lost rows")
      assert(out.map(_.sum_value).sum === evs.map(_.value).sum,
        s"case $i: value drift")
      out.foreach(s => assert(s.session_end >= s.session_start &&
        s.n_events >= 1))
    }
  }
}
