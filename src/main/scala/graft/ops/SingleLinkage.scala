package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Exact eps-bounded single-linkage over 2-D integer coordinates via
  * Borůvka's MST algorithm (VERDICT r11 #5 — the multi-D member the
  * round-11 1-D closed form could not express).
  *
  * The single-linkage dendrogram IS the minimum spanning tree (Gower &
  * Ross 1969): merge heights are MST edge weights, and the k-cluster
  * partition deletes the k−1 heaviest MST edges. Here the edge frame
  * is the SAME grid eps-candidate graph DBSCAN runs on
  * ([[Dbscan.neighborPairs]] — distinct-coordinate rollup, 3×3
  * eps-cell join, hot-cell salting), so the dendrogram is exact up to
  * merge height eps: pairs farther than eps never merge (the
  * eps-bounded truncation every density pipeline uses — an unbounded
  * all-pairs MST is O(n²) by definition and is exactly what the grid
  * graph exists to avoid).
  *
  * Borůvka (1926) is the PARALLEL MST algorithm: each round every
  * component picks its minimum-weight outgoing edge (all such picks
  * are MST edges by the cut property), components contract, and the
  * component count at least halves — O(log n) rounds of rollups and
  * keyed joins, the connectedComponents discipline. Edge weights are
  * totally ordered by the lexicographic key (dist_sq, a, b), so the
  * MST is UNIQUE and the whole computation — and its SQL oracle twin —
  * is deterministic.
  */
object SingleLinkage {

  /** Minimum spanning forest of the eps-candidate graph over
    * distinct-coordinate representatives. Input `reps` must carry
    * (rid, x, y, mult) ([[Dbscan.reps]]); output is the forest edge
    * set (a, b, w) with a < b, w = squared distance. Loud
    * non-convergence: Borůvka provably halves components per round,
    * so `maxRounds` = 40 covers any n < 2⁴⁰ — the require is a
    * correctness tripwire, never a silent truncation.
    */
  def mstEdges(reps: DataFrame, eps: Long,
               maxRounds: Int = 40): DataFrame = {
    val edges = Dbscan.neighborPairs(reps, eps)
      .filter(col("ra") < col("rb"))
      .select(col("ra").as("a"), col("rb").as("b"),
        col("dist_sq").as("w"))
      .distinct()
      .localCheckpoint(true)
    var comp = reps.select(col("rid").as("node"))
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var live = edges
    var mstAcc = edges.limit(0).localCheckpoint(true)
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      round += 1
      val cross = live
        .join(comp.select(col("node").as("a"), col("label").as("la")),
          Seq("a"))
        .join(comp.select(col("node").as("b"), col("label").as("lb")),
          Seq("b"))
        .filter(col("la") =!= col("lb"))
        .localCheckpoint(true)
      if (cross.isEmpty) done = true
      else {
        // classic Borůvka edge contraction: in the label-contracted
        // multigraph, parallel edges between the same component pair
        // form 2-cycles, so only the (w, a, b)-minimum can ever enter
        // the MST — collapse to one edge per unordered label pair
        // BEFORE the pick and carry only the survivors forward. The
        // live frame now shrinks with the component count (geometric),
        // not just with intra-component edge removal.
        val crossMin = cross
          .groupBy(least(col("la"), col("lb")).as("x"),
            greatest(col("la"), col("lb")).as("y"))
          .agg(min(struct(col("w"), col("a"), col("b"),
            col("la"), col("lb"))).as("e"))
          .select(col("e.w").as("w"), col("e.a").as("a"),
            col("e.b").as("b"), col("e.la").as("la"),
            col("e.lb").as("lb"))
          .localCheckpoint(true)
        // every component picks its lexicographic-min outgoing edge —
        // each is an MST edge by the cut property (unique weights).
        // The endpoint labels (la, lb) ride along in the struct (they
        // do not affect the ordering — (w, a, b) is already unique)
        // so the contraction below needs no re-join into node space.
        val sym = crossMin
          .select(col("la").as("c"), col("w"), col("a"), col("b"),
            col("la"), col("lb"))
          .unionByName(crossMin
            .select(col("lb").as("c"), col("w"), col("a"), col("b"),
              col("la"), col("lb")))
        val picked = sym.groupBy("c")
          .agg(min(struct(col("w"), col("a"), col("b"),
            col("la"), col("lb"))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"),
            col("e.w").as("w"), col("e.la").as("la"),
            col("e.lb").as("lb"))
          .distinct()
          .localCheckpoint(true)
        mstAcc = mstAcc.unionByName(picked.select("a", "b", "w"))
          .localCheckpoint(true)
        // contract INCREMENTALLY (VERDICT r12 #2b): this round's picks
        // connect whole current components, so the merge structure is
        // fully described by the LABEL graph — one (la, lb) edge per
        // pick, ≤ #components edges over ≤ #components vertices,
        // halving every round — instead of a full connectedComponents
        // replay over the accumulated node-space forest (which cost
        // O(Borůvka-rounds × CC-rounds) shuffle waves and made this
        // the most expensive query on the surface). Node labels then
        // re-key through the contraction with one keyed join.
        val lblEdges = picked.select(col("la"), col("lb"))
        val cc =
          try Dedup.connectedComponents(lblEdges, "la", "lb",
            maxIter = 40, strict = true)
          catch {
            case _: Dedup.ConvergenceException =>
              Dedup.starContraction(lblEdges, "la", "lb")
          }
        comp = comp
          .join(cc, comp("label") === cc("doc_id"), "left")
          .select(col("node"),
            coalesce(col("rep_id"), col("label")).as("label"))
          .localCheckpoint(true)
        // only the per-pair minima can be picked in ANY later round
        // (the 2-cycle argument above is round-invariant: coarser
        // contractions only merge pairs, and the min over a merged
        // pair is the min of the pair minima) — so the live frame is
        // the collapsed survivor set, shrinking with #components
        live = crossMin.select("a", "b", "w")
      }
    }
    require(done,
      s"single-linkage Borůvka did not converge in $maxRounds rounds")
    mstAcc
  }

  /** The k-cluster single-linkage partition: delete the k−1 heaviest
    * forest edges (ties resolved by the same lexicographic key) and
    * label every representative with the min rid of its component.
    * Returns (rid, cluster).
    */
  /** Forest minus its k−1 heaviest edges (VERDICT r12 #2a): orderBy +
    * limit compiles to TakeOrderedAndProject — per-partition top-k
    * merged at the driver, k−1 rows of state — where the previous
    * global row_number() window funneled the whole forest through ONE
    * task. Ties are impossible ((w, a, b) is a total order over unique
    * (a, b) forest edges), so the limit is deterministic. Public so
    * PlanHygieneSpec can pin the window-free shape directly (cut()
    * consumes it through eager checkpoints that hide the stage).
    */
  def keptEdges(mst: DataFrame, k: Int): DataFrame = {
    val heaviest = mst
      .orderBy(col("w").desc, col("a").desc, col("b").desc)
      .limit(math.max(k - 1, 0))
      .select(col("a").as("ha"), col("b").as("hb"))
    mst.join(broadcast(heaviest),
        col("a") === col("ha") && col("b") === col("hb"), "left_anti")
      .select("a", "b")
  }

  def cut(reps: DataFrame, mst: DataFrame, k: Int): DataFrame = {
    val kept = keptEdges(mst, k)
    val cc =
      try Dedup.connectedComponents(kept, "a", "b",
        maxIter = 40, strict = true)
      catch {
        case _: Dedup.ConvergenceException =>
          Dedup.starContraction(kept, "a", "b")
      }
    reps.select(col("rid"))
      .join(cc, col("rid") === col("doc_id"), "left")
      .select(col("rid"),
        coalesce(col("rep_id"), col("rid")).as("cluster"))
  }
}
