package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale-hygiene assertions on physical plans: filters reach the parquet
  * scan, projections prune the read schema, small dimensions broadcast.
  * These are the properties that keep the 100 TB plan shape sane; the
  * suite fails if a refactor silently regresses them.
  */
class PlanHygieneSpec extends SparkSpec {

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case s: FileSourceScanExec => s }
  }

  test("filter is pushed down to the parquet scan") {
    val df = SparkEntry.queries("q6_filter_agg")(spark, sf("sf0.001"))
    val scan = scans(df).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"expected shipdate/quantity pushdown, got: $pushed")
  }

  test("projection prunes the parquet read schema") {
    val df = SparkEntry.queries("split_pattern_projection")(spark, sf("sf0.001"))
    val scan = scans(df).head
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    // only the 4 projected columns may be read, not all 11
    assert(readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_shipdate") &&
      !readSchema.contains("l_returnflag"),
      s"expected pruned schema, got: $readSchema")
  }

  test("partitioned read prunes to the matching partition at planning") {
    val df = SparkEntry.queries("source_partitioned_pruning")(
      spark, sf("sf0.001"))
    val scan = scans(df).head
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("lang") && pf.contains("en"),
      s"lang filter must be a PARTITION filter, got: $pf")
    // the pruned scan must see only the lang=en partition's files
    assert(scan.relation.partitionSchema.fieldNames.contains("lang"))
    val nParts = scan.selectedPartitions.partitionCount
    assert(nParts == 1,
      s"expected exactly 1 surviving partition, got $nParts")
  }

  test("dimension joins broadcast (no fact-side shuffle for enrichment)") {
    val plan = SparkEntry.queries("q5_local_supplier")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // operator-shuffle counter: exchanges the OPERATOR requires
  // (ENSURE_REQUIREMENTS), excluding the opt-in input-layout spread
  // some queries add on the single-row-group fixtures
  // (REPARTITION_BY_COL — see Tables.spread, optimization r14)
  private def operatorShuffles(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("REPARTITION_BY_COL") &&
        !l.contains("REPARTITION_BY_NUM"))

  test("window top-k groups in one exchange, no extra sorts") {
    val plan = SparkEntry.queries("window_topk_per_group")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val exchanges = operatorShuffles(plan)
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges")
  }

  test("IVF probe plan trains centroids only on the sampled slice") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    val df = SparkEntry.queries("sim_ivf_topk")(spark, sf("sf0.001"))
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "expected the centroid-build posexplode")
    gens.foreach { g =>
      val gated = g.child.collectFirst {
        case f: Filter if f.condition.toString.contains("% 4") => f
      }
      assert(gated.isDefined,
        s"posexplode not gated by the 1-in-4 sample filter:\n$g")
    }
  }

  test("inverted-index postings use the bounded agg, not a window sort") {
    val plan = SparkEntry.queries("index_postings")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by"),
      "expected the bounded top_k_by aggregate for posting heads")
    assert(!plan.contains("Window"),
      "posting heads must not re-sort every posting through a window")
  }

  test("rolling-DAU merges day bitmaps, never re-shuffles raw user ids") {
    // the windowed OR-merge must consume the per-day states: the daily
    // bitmap build is materialized (localCheckpoint) before the self-
    // join, so the visible plan aggregates ONLY the day-keyed state
    // frame — zero raw-user_id aggregates. (Without the checkpoint the
    // self-join duplicates the aggregation subtree and raw events are
    // scanned + bitmapped twice.)
    val plan = SparkEntry.queries("events_rolling_dau")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan.toString
    assert(plan.contains("bitmap_merge_count"),
      "expected the bitmap state merge for the 7-day window")
    val rawAggs = plan.linesIterator
      .count(l => l.contains("bitmap_state(user_id") ||
        l.contains("bitmap_state(cast(user_id"))
    assert(rawAggs == 0,
      s"raw user_id must be bitmapped once (pre-checkpoint), not in " +
        s"the window plan:\n$plan")
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed daily state frame in the plan:\n$plan")
  }

  test("part-count joins carry no forced broadcast (size-driven strategy)") {
    // The per-part order-count frame scales with the part DIMENSION
    // (~2B rows at TPC-H sf10k): a forced broadcast() there OOMs the
    // build side at scale where an un-hinted join lets size stats/AQE
    // choose. recs_item_cosine must carry ZERO hints; basket_lift
    // exactly ONE — the genuinely-bounded 1-row n_orders frame.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(name: String): Int =
      SparkEntry.queries(name)(spark, sf("sf0.001"))
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    assert(hints("recs_item_cosine") == 0,
      "recs_item_cosine: part-count joins must stay hint-free")
    assert(hints("basket_lift") == 1,
      "basket_lift: only the 1-row n_orders frame may be hinted")
  }

  test("erasure audit broadcasts the delete-key set to every fact scan") {
    val plan = SparkEntry.queries("privacy_erasure")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "delete keys must broadcast, not shuffle the facts")
    assert(!plan.contains("SortMergeJoin"),
      s"erasure cascade must never sort-merge a fact table:\n${plan.take(2000)}")
  }

  test("k-means assignment plans as one native node, not k subtrees") {
    val df = SparkEntry.queries("cluster_kmeans")(spark, sf("sf0.001"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("kmeans_assign"),
      "expected the native kmeans_assign expression in the plan")
    assert(!plan.contains("cosine_sim"),
      "composed per-centroid cosine subtrees crept back into the " +
        "assignment plan (k vector copies per row)")
  }

  test("hash sampling is a pure map-side filter (zero shuffles)") {
    val df = graft.functions.Sampling.sample(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"),
      "doc_id", 0.25)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("hashed classifier scoring is map-only (zero shuffles, one node)") {
    val weights = Array.tabulate(4096)(b =>
      ((b.toLong * 2654435761L) % 2001L).toInt - 1000)
    val df = graft.functions.TextFunctions.classifierScore(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"),
      "doc_id", "text", weights)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(plan.contains("hashed_linear_score"), plan.take(1500))
  }

  test("sequence packing shuffles exactly once (shard hash partitioning)") {
    val df = SparkEntry.queries("pack_training")(spark, sf("sf0.001"))
    val exchanges = operatorShuffles(
      df.queryExecution.executedPlan.toString)
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges")
  }

  test("best-fit packing shuffles exactly once (the shard rollup)") {
    val df = SparkEntry.queries("pack_bestfit")(spark, sf("sf0.001"))
    val exchanges = operatorShuffles(
      df.queryExecution.executedPlan.toString)
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges")
  }

  test("k-NN harness broadcasts the fixed eval set (no corpus-side shuffle join)") {
    val df = SparkEntry.queries("ml_knn_classify")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
    assert(plan.contains("int8_sqdist"), "native distance missing")
  }

  test("binary-code scan packs signs natively and broadcasts queries") {
    val df = SparkEntry.queries("sim_binary_topk")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sign_pack"), "native sign_pack missing")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
  }

  test("embedding LSH bucket join moves no vector columns") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.ArrayType
    val df = SparkEntry.queries("dedup_embedding_lsh")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bucketExchanges = unwrapped.collect {
      case e: Exchange if e.output.exists(_.name == "tbl") &&
        e.output.exists(_.name == "bucket") => e
    }
    assert(bucketExchanges.nonEmpty,
      s"expected the (tbl, bucket) bucket-join exchange:\n$unwrapped")
    bucketExchanges.foreach { e =>
      val wide = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(wide.isEmpty, "vector columns cross the bucket exchange: " +
        wide.map(_.name).mkString(", "))
    }
  }

  test("minhash band join moves no signature arrays") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.ArrayType
    for (q <- Seq("dedup_minhash", "dedup_incremental")) {
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val unwrapped = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bandExchanges = unwrapped.collect {
        case e: Exchange if e.output.exists(_.name == "band") &&
          e.output.exists(_.name == "band_hash") => e
      }
      assert(bandExchanges.nonEmpty,
        s"$q: expected the (band, band_hash) band-join exchange:\n$unwrapped")
      bandExchanges.foreach { e =>
        val wide = e.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(wide.isEmpty, s"$q: signature arrays cross the band " +
          "exchange: " + wide.map(_.name).mkString(", "))
      }
    }
  }

  test("bloom prune filters the fact scan below every exchange") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = SparkEntry.queries("join_bloom_prune")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the bloom_contains filter must sit under (downstream of) the fact
    // side's first exchange: rows are dropped map-side, pre-shuffle
    val exchanges = unwrapped.collect { case e: Exchange => e }
    val bloomFilteredSubtrees = exchanges.filter(_.collect {
      case f: FilterExec if f.condition.toString.contains("bloom_contains") => f
    }.nonEmpty)
    assert(bloomFilteredSubtrees.nonEmpty,
      s"bloom_contains must prune before an exchange, plan:\n$unwrapped")
  }

  test("domain cap winners come from a bounded aggregate, not a window sort") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("curate_domain_cap")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
      s"cap must not window-sort the corpus:\n$unwrapped")
    assert(unwrapped.collect { case s: SortExec => s }.isEmpty,
      s"cap must not global-sort the corpus:\n$unwrapped")
    assert(unwrapped.toString.contains("top_k_by"),
      "winners must come from the bounded top_k_by aggregate")
  }

  test("retrieval rankings avoid window sorts (bounded top-k winners)") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("bm25_topk", "hybrid_retrieval_rrf")) {
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val unwrapped = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
        s"$q must rank via the bounded aggregate, not a window sort")
      assert(unwrapped.toString.contains("top_k_by"), s"$q winners source")
    }
  }

  test("eager stratified sampling evaluates the derived stratum once") {
    val df = SparkEntry.queries("sample_stratified")(spark, sf("sf0.001"))
    val plan = df.queryExecution.optimizedPlan.toString
    // langId contains exactly one array_position per evaluation; without
    // the pushdown barrier the expression appears twice (pushed filter +
    // output projection)
    val n = "array_position".r.findAllIn(plan).size
    assert(n == 1, s"derived stratum evaluated $n times:\n${plan.take(3000)}")
  }

  test("pareto skyline nested-loop only touches the bounded bands frame") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val df = SparkEntry.queries("curate_pareto")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(!unwrapped.toString.contains("CartesianProduct"))
    // every nested-loop must have a BOUNDED side: a single-row global
    // aggregate (the scalar n_docs broadcast inside rarity) or the
    // __band/__bm band-maxima frame (score range / bandWidth rows).
    // A per-document side on BOTH inputs is the quadratic NOT-EXISTS
    // shape this operator exists to avoid.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def bounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      val globalAgg = p.collectFirst {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      }.isDefined
      val bandFrame = p.output.nonEmpty &&
        p.output.forall(_.name.startsWith("__"))
      globalAgg || bandFrame
    }
    unwrapped.collect { case j: BroadcastNestedLoopJoinExec => j }
      .foreach { j =>
        assert(bounded(j.left) || bounded(j.right),
          s"skyline dominance join has two corpus-sized sides:\n$j")
      }
  }

  test("equi-depth histogram windows run over the aggregated value frame") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = SparkEntry.queries("profile_equidepth")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = unwrapped.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    // every window's subtree must contain the (flag, qty) count
    // aggregate — prefix sums run on the bounded distinct-value frame,
    // never on raw rows
    windows.foreach { w =>
      assert(w.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        s"window over raw rows:\n$w")
    }
  }

  test("feature hashing is explode + one aggregation, no joins") {
    val plan = SparkEntry.queries("text_feature_hash")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n${plan.take(1500)}")
    assert(plan.contains("xxhash64"), "bucket must come from xxhash64")
  }

  test("PPJoin prefix ranking is window-free (in-row sorted array)") {
    // optimization r14: the per-doc rarity ranking became a slice of
    // the per-doc sort_array((df, token)) rollup — the old
    // doc-partitioned row_number window (and with it any risk of a
    // corpus-global sort) is gone from the plan entirely.
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = SparkEntry.queries("dedup_prefix_filter")(
      spark, sf("sf0.001")).queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = unwrapped.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"PPJoin plan regained a window: ${windows.headOption}")
  }

  test("repeated-span dedup is one aggregation, no joins, no windows") {
    val plan = SparkEntry.queries("dedup_repeated_spans")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"unexpected window:\n${plan.take(1500)}")
  }

  test("Fellegi-Sunter linkage carries no forced broadcast hints") {
    // both sides of the blocked self-join scale with the customer
    // dimension — strategy must stay size-driven (AQE picks)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = SparkEntry.queries("link_fellegi_sunter")(
      spark, sf("sf0.001")).queryExecution.analyzed
      .collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, s"forced hints on SF-scaling frames: $hints")
  }

  test("KL drift aggregates the checkpointed rollup, not raw text 3x") {
    // sc is localCheckpointed: the optimized plan must not contain the
    // tokenization Generate (explode) at all — every consumer reads
    // the materialized (source, token) rollup
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val gens = SparkEntry.queries("corpus_kl_drift")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan
      .collect { case g: Generate => g }
    assert(gens.isEmpty,
      s"tokenization explode leaked past the checkpoint: $gens")
  }

  test("200-column cleaning stays a constant-depth plan") {
    import scala.jdk.CollectionConverters._
    val cols = (1 to 200).map(i => s"Col $i (X$i)")
    val row = org.apache.spark.sql.Row.fromSeq((1 to 200).map(i => s" v$i "))
    val df = spark.createDataFrame(List(row).asJava,
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType))))
    val t0 = System.nanoTime()
    val cleaned = graft.ops.Cleaning.universalClean(df)
    val projects = cleaned.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }
    val analyzeMs = (System.nanoTime() - t0) / 1e6
    assert(projects.size <= 1)
    assert(cleaned.columns.head == "col_1_x1")
    assert(cleaned.head().getString(0) == "v1")
    assert(analyzeMs < 5000, s"analysis took ${analyzeMs}ms for 200 cols")
  }

  test("dp counts broadcast the threshold table, never shuffle it") {
    val plan = SparkEntry.queries("privacy_dp_counts")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      "the 51-row threshold table must never sort-merge with counts")
  }

  test("bootstrap fan-out reads the checkpointed daily frame, not raw events") {
    // the 200-replicate cross join must consume the materialized daily
    // rollup: raw events are scanned ONCE (pre-checkpoint), so the
    // optimized plan of the returned frame contains no parquet scan
    val plan = SparkEntry.queries("events_bootstrap_ci")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      "expected the checkpointed daily frame")
    assert(!plan.toLowerCase.contains("parquet"),
      s"raw events leaked into the bootstrap plan:\n${plan.take(1500)}")
  }

  test("cohort LTV keeps the first-order join hint-free") {
    // the (customer -> first month) frame scales with the customer
    // dimension; only the ~80-row cohort-size frame may carry a hint
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hints = SparkEntry.queries("orders_cohort_ltv")(
        spark, sf("sf0.001"))
      .queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    assert(hints == 1,
      s"only the cohort-size frame may be hinted, found $hints hints")
  }

  test("KN bigram marginals read the checkpointed bigram frame") {
    // c1/r/tot are three rollups over the (w1, w2) count frame; the
    // checkpoint means the corpus tokenization+zip runs ONCE, so the
    // final plan holds no parquet scan of documents
    val plan = SparkEntry.queries("text_kn_bigram")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"))
    assert(!plan.toLowerCase.contains("parquet"),
      s"corpus re-scan leaked into the KN plan:\n${plan.take(1500)}")
  }

  test("sequence detect windows partition by purchase id, never global") {
    val plan = SparkEntry.queries("events_sequence_detect")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    val globals = plan.linesIterator
      .count(l => l.contains("Window") && l.contains("partitionBy=[]"))
    assert(globals == 0,
      "CEP ranking windows must be purchase-partitioned, not global")
  }

  test("DTW pair join reads the checkpointed top frame, one events scan") {
    // the 8-row top frame is materialized before the self-join; an
    // uncut plan would run the full profile rollup once per side
    val plan = SparkEntry.queries("events_dtw_pairs")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"))
    assert(!plan.toLowerCase.contains("parquet"),
      s"events re-scan leaked into the DTW pair plan:\n${plan.take(1500)}")
  }

  test("priority sampling's global op is TakeOrdered, never a full sort") {
    // Duffield-Lund-Thorup top-(k+1): a per-partition heap + driver
    // merge; if orderBy(...).limit ever decomposes to a global Sort +
    // Exchange the sampler stops scaling
    val plan = SparkEntry.queries("sample_priority_topk")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("theil_sen pair generation broadcasts the days-sized side") {
    // the r9 fix: an equi-join on flag alone has 3 keys (3 tasks own
    // all days^2 rows); the plan must show the broadcast right side
    // and must NOT contain a window over the un-banded pair frame
    // (row_number appears only inside the ~2% bracket band)
    val df = SparkEntry.queries("analytics_theil_sen")(
      spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    // final stage: the window's input must be band-filtered (slope
    // between the sketch bracket), not the raw pair frame
    assert(plan.contains("v_lo") && plan.contains("v_hi"),
      "band filter columns missing from the physical plan")
  }

  test("quantile regression rounds broadcast the 3-row weight frame") {
    val plan = SparkEntry.queries("ml_quantile_regression")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("mann-whitney windows run over the distinct-value rollup") {
    // the rank cum-sum must consume HashAggregate output (the cents
    // vocabulary), never the raw row-sized event frame
    val df = SparkEntry.queries("events_mann_whitney")(
      spark, sf("sf0.001"))
    val unwrapped = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = unwrapped.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected a window for the rank cum-sum")
    windows.foreach { w =>
      val below = w.child.collect {
        case agg: org.apache.spark.sql.execution.aggregate.HashAggregateExec => agg
      }
      assert(below.nonEmpty,
        "window input must be the aggregated distinct-value frame")
    }
  }

  test("ALS scoring broadcasts the eval slice and the pruned bought " +
      "set — nothing matrix-sized is built or replicated") {
    // the round-10 100x OOM fix, pinned: the cross join's broadcast
    // side must be the 20-row eval slice (BroadcastNestedLoopJoin),
    // the anti-join must consume a BROADCAST of the eval-pruned
    // ratings (never shuffle the 55M-row matrix), and no
    // CartesianProduct may appear anywhere
    val exec = SparkEntry.queries("recs_als_rank1")(
      spark, sf("sf0.001")).queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"),
      s"unguided cross product in the ALS plan:\n${plan.take(1500)}")
    assert(plan.contains("LeftAnti, BuildRight") ||
      plan.contains("LeftAnti, BuildLeft"),
      s"anti-join not broadcast:\n${plan.take(1500)}")
    // r10 verdict #3: the per-customer top-3 is the bounded top_k_by
    // aggregate — a rank window here is 20 parts-sized task sorts
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
      s"ALS scoring must not window-sort the part factors:\n" +
        plan.take(1500))
    assert(unwrapped.collect { case s: SortExec => s }.isEmpty,
      s"ALS scoring must not sort the part factors:\n${plan.take(1500)}")
    assert(plan.contains("top_k_by"),
      "ALS winners must come from the bounded top_k_by aggregate")
  }

  test("rank-2 ALS keeps the rank-1 scoring shape: broadcast eval " +
      "slice, broadcast pruned bought set, bounded top-k, no sorts") {
    val exec = SparkEntry.queries("recs_als_rank2")(
      spark, sf("sf0.001")).queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"),
      s"unguided cross product in the ALS2 plan:\n${plan.take(1500)}")
    assert(plan.contains("LeftAnti, BuildRight") ||
      plan.contains("LeftAnti, BuildLeft"),
      s"anti-join not broadcast:\n${plan.take(1500)}")
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
      s"ALS2 scoring must not window-sort the part factors:\n" +
        plan.take(1500))
    assert(unwrapped.collect { case s: SortExec => s }.isEmpty,
      s"ALS2 scoring must not sort the part factors:\n${plan.take(1500)}")
    assert(plan.contains("top_k_by"),
      "ALS2 winners must come from the bounded top_k_by aggregate")
  }

  test("edit-distance segment join moves only (blk, si, sg, id) — " +
      "titles re-attach after the pair distinct") {
    // the round-11 PassJoin shape, pinned: the probe/index explode
    // replicates each doc 5x/21x, so a title column in the segment
    // exchange is the byte bottleneck the r10 verdict flagged. Every
    // exchange that carries the segment key must be title-free.
    import org.apache.spark.sql.execution.exchange.Exchange
    val exec = SparkEntry.queries("dedup_edit_distance")(
      spark, sf("sf0.001")).queryExecution.executedPlan
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val segEx = unwrapped.collect {
      case e: Exchange if e.output.exists(_.name == "sg") => e
    }
    assert(segEx.nonEmpty,
      s"expected the (blk, si, sg) segment exchanges:\n" +
        unwrapped.toString.take(1500))
    segEx.foreach { e =>
      assert(!e.output.exists(_.name.contains("title")),
        s"segment exchange carries a title column: ${e.output}")
    }
  }

  test("isolation forest walk stays map-side: one rollup shuffle " +
      "plus the bounded top-k") {
    // 16 trees x 8 levels of hash/threshold decisions must fuse into
    // projections over the checkpointed points frame — the only
    // exchanges are the (tree, level, node) population rollup, the
    // per-(vec, tree) depth rollup, the final per-vec rollup and the
    // 50-row TakeOrdered; a per-level shuffle would make depth a
    // shuffle multiplier at 100 TB
    val df = SparkEntry.queries("embed_isolation_forest")(
      spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // composition: pops rollup + its join repartition, the two depth/
    // score rollups, and the two 1-row stat aggs (ranges, c(n)) — a
    // 7th exchange means a walk level started shuffling
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 6,
      s"$exchanges exchanges in the isolation-forest plan (walk must " +
        s"not shuffle per level):\n${plan.take(2000)}")
  }

  test("kruskal-wallis midrank window runs over the distinct-value " +
      "rollup, like mann-whitney") {
    val df = SparkEntry.queries("events_kruskal_wallis")(
      spark, sf("sf0.001"))
    val unwrapped = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = unwrapped.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the midrank cum-sum window")
    windows.foreach { w =>
      val below = w.child.collect {
        case agg: org.apache.spark.sql.execution.aggregate.HashAggregateExec => agg
      }
      assert(below.nonEmpty,
        "window input must be the cents-domain rollup, not raw events")
    }
  }

  test("cox risk sets consume the distinct-day rollup, never the " +
      "subject frame") {
    // the suffix-sum window must sit on HashAggregate output (the
    // day-domain frame) — a window over raw subjects would be a
    // row-sized single-partition sort
    val df = SparkEntry.queries("orders_cox_ph")(spark, sf("sf0.001"))
    val unwrapped = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = unwrapped.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the suffix-sum window")
    windows.foreach { w =>
      val aggBelow = w.child.collect {
        case agg: org.apache.spark.sql.execution.aggregate.HashAggregateExec => agg
      }
      assert(aggBelow.nonEmpty,
        "cox suffix window must consume the per-day rollup")
    }
  }

  test("survivorship rollups read the checkpointed member frame") {
    // canonical-name, segment-mode and count/max all consume members;
    // the checkpoint keeps the match join + component join to ONE run
    val plan = SparkEntry.queries("link_survivorship")(
      spark, sf("sf0.001")).queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"))
    assert(!plan.toLowerCase.contains("parquet"),
      s"customer re-scan leaked into the survivorship plan:\n${plan.take(1500)}")
  }

  test("rank-4 ALS keeps the rank-1 scoring shape: broadcast eval " +
      "slice, broadcast pruned bought set, bounded top-k, no sorts") {
    val exec = SparkEntry.queries("recs_als_rank4")(
      spark, sf("sf0.001")).queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"),
      s"unguided cross product in the ALS4 plan:\n${plan.take(1500)}")
    assert(plan.contains("LeftAnti, BuildRight") ||
      plan.contains("LeftAnti, BuildLeft"),
      s"anti-join not broadcast:\n${plan.take(1500)}")
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
      s"ALS4 scoring must not window-sort the part factors:\n" +
        plan.take(1500))
    assert(unwrapped.collect { case s: SortExec => s }.isEmpty,
      s"ALS4 scoring must not sort the part factors:\n${plan.take(1500)}")
    assert(plan.contains("top_k_by"),
      "ALS4 winners must come from the bounded top_k_by aggregate")
  }

  test("single-linkage cut ranks the k-1 heaviest edges via bounded " +
      "take-ordered, never a global window sort") {
    // VERDICT r12 #2a: the previous row_number() over an un-partitioned
    // Window funneled the whole MST edge frame through one task for a
    // k−1-row question. The fix is orderBy+limit (TakeOrderedAndProject:
    // per-partition top-k, k−1 rows of driver state) + broadcast
    // anti-join; this pins that no WindowExec can reappear anywhere in
    // the query (the Borůvka rounds are already window-free).
    import org.apache.spark.sql.execution.window.WindowExec
    val pts = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select(col("vec_id"),
        floor(col("embedding").getItem(0).cast("double")
          * 1000000.0 + 0.5).as("x"),
        floor(col("embedding").getItem(1).cast("double")
          * 1000000.0 + 0.5).as("y"))
    val rp = graft.ops.Dbscan.reps(pts).localCheckpoint(true)
    val mst = graft.ops.SingleLinkage.mstEdges(rp, 50000L)
    val exec = graft.ops.SingleLinkage.keptEdges(mst, 8)
      .queryExecution.executedPlan
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(unwrapped.collect { case w: WindowExec => w }.isEmpty,
      s"cut() must not window-rank the forest:\n${exec.toString.take(1500)}")
    assert(exec.toString.contains("TakeOrderedAndProject"),
      "heaviest-edge selection must be the bounded take-ordered path:\n" +
        exec.toString.take(1500))
  }
}
