package graft.operators

import graft.{Registry, SparkSpec}

/** Plan-shape regression pins for the scale-critical queries.
  *
  * The 100-TB story rests on plan SHAPES, not code intent: a map-only
  * filter must stay shuffle-free, a dimension lookup must stay a
  * broadcast join, a stats-then-scan scaler must broadcast its tiny
  * stats row rather than re-shuffle the fact side. Those properties
  * hold today (docs/PLANS.md census) but nothing stopped a refactor
  * from silently losing one — e.g. a threshold change or a moved
  * `broadcast()` hint turning a broadcast join into a sort-merge join
  * adds two fact-table exchanges that no correctness gate would ever
  * see. This spec executes the static plan (AQE disabled, like the
  * DevPlans census — an AdaptiveSparkPlan hides its exchanges until
  * runtime) and pins each query's exchange/broadcast counts.
  *
  * Pins are EXACT for shuffle counts (a new exchange on these shapes is
  * always a regression; a removed one is a plan improvement worth
  * noticing and re-pinning) and lower-bounded for broadcasts (AQE-less
  * planning may stack an extra reused broadcast without harm).
  */
class PlanShapeSpec extends SparkSpec {

  /** (query, exact shuffle count, min broadcast count). */
  private val pins: Seq[(String, Int, Int)] = Seq(
    // pure scan+project: NOTHING may shuffle
    ("scan_project", 0, 0),
    // pushdown filters: map-only
    ("eq_filter", 0, 0),
    ("year_pushdown_filter", 0, 0),
    ("gopher_filter", 0, 0),
    ("corpus_filter", 0, 0),
    ("pii_scrub", 0, 0),
    // top-k fuses to TakeOrderedAndProject — no global sort exchange
    ("topk_limit", 0, 0),
    // dimension lookup: broadcast join, fact side never shuffles
    ("dict_recode", 0, 1),
    ("join_ben_ip", 0, 1),
    // stats-broadcast-over-scan scalers: ONE stats shuffle, fact side
    // rejoined by broadcast
    ("minmax_scale", 1, 1),
    ("zscore_scale", 1, 1),
    // single-shuffle aggregations
    ("groupby_max", 1, 0),
    ("dedup_exact", 1, 0),
    ("multi_hot", 1, 0),
    ("seq_pack", 1, 0),
    // time/window family: one shuffle each (keyed state or range
    // partitioning), no hidden second exchange
    ("window_hourly", 1, 0),
    ("session_agg", 1, 0),
    ("sessionize_state", 1, 0),
    ("rolling_window", 1, 0),
    ("sort_desc", 1, 0),
    // grain-bucketed range join: interval side explodes + broadcasts,
    // points shuffle once at most
    ("range_join", 1, 1),
    // as-of: ONE keyed shuffle — both sides union into a single
    // key-partitioned window; the r8 form's click-side (user, ts)
    // pre-agg exchange is folded into the window's payload-struct
    // tie-break (a 2nd exchange means the pre-agg came back)
    ("asof_join", 1, 0),
    // two-phase skew-salted agg: exactly the partial + final pair
    ("salted_agg", 2, 0),
    // aggregate-then-join full outer: two count shuffles; the join
    // itself co-locates on them (no third fact-side exchange beyond
    // the join's own requirement)
    ("join_full_outer", 2, 0),
    // dedup/ANN/contamination families (r7 verdict item 4) — the most
    // refactor-fragile shapes in the repo: every exchange below
    // carries hashes/ids/buckets, never text or vectors, and a new
    // one means payloads started shuffling.
    // banded MinHash: shingle-sig shuffle → bucket self-join pair →
    // component agg; candidate pairs are bucket-joined, not crossed
    ("dedup_minhash_lsh", 4, 4),
    // hyperplane-LSH embedding dedup: the index kernel's round-robin
    // rebalance + the L-table multi-probe bucket join (the home/probe
    // guard folds both counts into the self-join's own exchange); the
    // one broadcast is the exact-verify rejoin's small side
    ("dedup_embed_lsh", 3, 1),
    // the FORCED census-engaged sibling (blockRows=64 trips the eager
    // census at any tier): the same 3 exchanges — the kernel's
    // round-robin rebalance + one payload exchange PER SELF-JOIN SIDE
    // keyed on the full (tbl, bucket, __i, __j) join keys (the b-side
    // pre-filters to home rows below its exchange, so the sides are
    // non-identical by design) — and NOT four: a 4th would be the r12
    // double-shuffle shape (bucket exchange + a second session-width
    // chunk-key exchange) this route exists to make structurally
    // impossible. Broadcasts: the census literal + the verify rejoin
    // (r13 verdict item 5 asked for exactly this pin).
    ("dedup_embed_lsh_chunked", 3, 1),
    // cluster-blocked SemDeDup: the assignment kernel's rebalance +
    // centroid assign + in-cluster pairing, no broadcast required
    // (pairs co-locate on the cluster key). At fixture scale the
    // component labels come from dupComponents' size-gated driver
    // union-find (a parallelized local relation — no exchange); the
    // distributed route's 4-exchange shape (the roots-distinct of the
    // final star set) is pinned separately below.
    ("semantic_dedup", 3, 0),
    // cross-relation LSH decontamination: both sides sig+bucket (2×2
    // shuffles) + verify pair agg + final; small side broadcasts 5×
    ("contamination_minhash", 7, 5),
    // streamed keyed-probe ANN searches (r9): scan → ONE rebalance
    // exchange → fused index+search kernels → two bounded-survivor
    // finisher exchanges (dedup + rank). Candidates NEVER exchange —
    // a 4th exchange here means the 10^8-row candidate relation
    // started shuffling again (the r8 dedupe-then-window shape this
    // replaced); a BroadcastExchange would mean the probe map moved
    // out of the task closure into a plan-side join.
    ("ann_lsh", 3, 0),
    ("ann_ivf", 3, 0),
    ("ann_lsh_probe", 3, 0),
    ("ann_ivf_probe", 3, 0),
    // exact KNN via streamedTopK: rebalance + the final rank window
    ("knn_cosine", 2, 0),
    // TF-IDF top-k, closed-vocabulary route (the r9 size-routed
    // rework): the df pass runs at CONSTRUCTION time into a broadcast
    // map and the top-3 is selected inside the kernel, so the
    // returned scoring plan is MAP-ONLY — zero exchanges (down from
    // r8's 3: vocab df agg + corpus count + per-doc top-3 aggregate).
    // The open route's word-keyed shuffle shape is covered by
    // TfidfRouteSpec's equality test, not a pin (it is the >cap
    // fallback, unreachable at fixture scale without forcing).
    ("tfidf_topk", 0, 0)
  )

  private def shapeOf(name: String): (Int, Int) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Registry.all(name).fn(spark, sfDir)
        .queryExecution.executedPlan.toString
      // A ReusedExchange line prints its referenced exchange INLINE
      // ("ReusedExchange [...], Exchange hashpartitioning(...)") — a
      // reuse is a second READ of one shuffle write, not a new
      // exchange, so those lines must not count (they made the
      // minhash pin read 5 where the census and the plan both say 4).
      val lines = plan.linesIterator
        .filterNot(_.contains("ReusedExchange")).toSeq
      val shuffleRe = ("\\bExchange hashpartitioning|\\bExchange " +
        "rangepartitioning|\\bExchange SinglePartition|" +
        // cpuRebalance's round-robin re-splits ARE exchanges — the
        // vector-kernel shapes budget for exactly one (prints as
        // RoundRobinPartitioning, unlike the lowercase hash/range)
        "(?i)\\bExchange roundrobinpartitioning").r
      val shuffles = lines.count(l => shuffleRe.findFirstIn(l).nonEmpty)
      val bcasts = lines.count(_.contains("BroadcastExchange"))
      (shuffles, bcasts)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  for ((name, wantShuffles, minBcast) <- pins) {
    test(s"plan shape: $name has exactly $wantShuffles shuffle(s) and " +
      s">=$minBcast broadcast(s)") {
      val (shuffles, bcasts) = shapeOf(name)
      assert(shuffles === wantShuffles,
        s"$name shuffle count drifted: a new exchange on this shape " +
          "re-shuffles the fact table at scale (or a removed one is " +
          "an improvement — re-pin after reading the plan)")
      assert(bcasts >= minBcast,
        s"$name lost its broadcast: the small side now reaches the " +
          "join through a shuffle, which at scale moves the fact table")
    }
  }

  test("plan shape: semantic_dedup on the FORCED-distributed " +
    "components route has exactly 4 shuffles (the scale shape the " +
    "size gate hides at fixture scale)") {
    val key = "graft.components.driverEdgeLimit"
    val prev = sys.props.get(key)
    sys.props(key) = "0"
    try {
      val (shuffles, bcasts) = shapeOf("semantic_dedup")
      // rebalance + assign + pairing + the roots-distinct of the final
      // checkpointed star set (≤ one row per component, never the
      // corpus) — a 5th exchange means components started shuffling
      // payloads; a broadcast would mean the label relation moved into
      // a plan-side broadcast join (the 0-broadcast doctrine of the
      // default-route pin)
      assert(shuffles === 4)
      assert(bcasts === 0)
    } finally prev match {
      case Some(v) => sys.props(key) = v
      case None => sys.props -= key
    }
  }
}
