package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.exprs

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Built from codegen'd
  * higher-order array functions — no UDFs, no driver-side loops.
  *
  * Scale design: exact dedup is one hash-shuffle on the fingerprint.
  * MinHash LSH shuffles once on (band, bandHash) buckets — candidate
  * pairs only ever materialize within a bucket, never the O(n²) cross
  * product. SimHash is map-only per document; near-dup pairing joins on
  * rotated prefixes (pigeonhole over bit blocks).
  */
object Dedup {

  // ---------------- shingling ----------------

  /** Whitespace tokens of the canonical (lower, collapsed) form. */
  def tokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Word n-gram shingles: array of space-joined n-token windows.
    * Documents shorter than n tokens yield a single whole-text shingle.
    */
  def shingles(text: Column, n: Int): Column =
    // the outer 1-element transform BINDS the token array to a lambda
    // variable, so the tokenizing regexp split runs ONCE per row —
    // inlining `tokens(text)` directly would re-evaluate it inside
    // every slice of the inner lambda (once per shingle: O(tokens²)
    // regexp work per document; measured 9.0 → 2.6 s on the sf0.1
    // profile pass, and every shingle consumer in the engine shares
    // this expression)
    transform(array(tokens(text)), toks => {
      val cnt = size(toks)
      when(cnt <= n, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(0), cnt - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
    }).getItem(0)

  // ---------------- exact ----------------

  /** Exact dedup: group by content fingerprint, keep the lowest id as
    * representative. One shuffle on the (short) fingerprint, map-side
    * partial aggregation — the canonical 100 TB-safe shape.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------------- MinHash + LSH ----------------

  /** MinHash signature: for each of `numHashes` seeded permutations,
    * the minimum xxhash64(seed ⊕ shingle) over the document's shingles.
    * One array column of `numHashes` longs per doc; map-only.
    */
  def minHashSignature(text: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleN)
    val hashes = (0 until numHashes).map { seed =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(lit(seed), s)))
    }
    array(hashes: _*)
  }

  /** MinHash signature frame: `(doc_id, sig)`, one array of `numHashes`
    * longs per doc, map-only. This is also the PERSISTED FINGERPRINT
    * STORE shape for [[incrementalCandidates]]: 8·numHashes bytes per
    * document, text-free — bands are derived projections of the
    * signature, so nothing else needs storing.
    */
  def signatureStore(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, numHashes: Int = 16): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      exprs.minhash_sig(col(textCol), shingleN, numHashes).as("sig"))

  /** Band-explode a signature frame into narrow `(doc_id, band,
    * band_hash)` rows — the only columns the bucket join ever shuffles.
    */
  private def bandRows(sig: DataFrame, numHashes: Int,
                       rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    sig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
          lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** LSH banding: candidate pairs = docs sharing at least one band hash
    * (bands of `rowsPerBand` signature entries). Output one row per
    * candidate pair (id_a < id_b), with the signature-estimated Jaccard.
    *
    * Shuffle shape: the band self-join moves only (doc_id, band,
    * band_hash); pairs collapse to distinct (id_a, id_b) and the two
    * signatures are joined back once, keyed by id — not once per band —
    * for the estimate. (Same narrow-bucket-join trick as
    * [[graft.functions.Similarity.embeddingNearDupsLsh]].)
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 16,
                        rowsPerBand: Int = 2,
                        blockCol: Option[String] = None): DataFrame = {
    // The signature frame is referenced THREE times in one action (the
    // band-rows side plus the two per-id join-backs), and minhash_sig
    // is the expensive part of the plan — a full shingle+hash pass per
    // evaluation. A lazy localCheckpoint materializes the signatures
    // exactly once on first use and serves all three references from
    // the persisted blocks (GC-cleaned by the context cleaner, so
    // nothing lingers in the cache manager — the same hygiene argument
    // as [[connectedComponents]]'s per-round checkpoints). Measured at
    // the 500k-doc MixBench fixture this is the difference between one
    // and three corpus-wide text passes in the dedup stage. Trade-off
    // (accepted repo-wide): checkpointed partitions lost to executor
    // failure are not lineage-recoverable; the stage re-runs instead.
    val sig = signatureStore(docs, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(eager = false)
    // blockCol: restrict candidates to WITHIN-block pairs by keying
    // the bucket join on (block, band, band_hash) — for callers whose
    // output is block-local anyway (per-source routing), this prunes
    // the cross-block candidate mass BEFORE the join's shuffle instead
    // of filtering it after (provably output-identical there: blocked
    // candidates = unblocked ∩ same-block). None (the default) leaves
    // the plan byte-identical to the unblocked shape.
    val banded0 = bandRows(sig, numHashes, rowsPerBand)
    val (banded, joinKeys) = blockCol match {
      case Some(bc) =>
        val m = docs.select(col(idCol).as("doc_id"),
          col(bc).cast("string").as("__blk"))
        (banded0.join(m, Seq("doc_id")),
          Seq("__blk", "band", "band_hash"))
      case None => (banded0, Seq("band", "band_hash"))
    }
    val aCols = joinKeys.map(col) :+ col("doc_id").as("id_a")
    val bCols = joinKeys.map(col) :+ col("doc_id").as("id_b")
    val a = banded.select(aCols: _*)
    val b = banded.select(bCols: _*)
    a.join(b, joinKeys)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
  }

  /** Incremental dedup: candidates for a NEW batch against itself AND a
    * persisted [[signatureStore]] of all previously-ingested documents —
    * the daily-ingestion shape at 100 TB, where historical TEXT is never
    * rescanned (only its 128-byte/doc signature store is read) and
    * history-vs-history pairs are never re-derived.
    *
    * Output: one row per surviving candidate, oriented so `doc_id` is
    * always a NEW document — `dup_of` is the partner to keep (a history
    * doc, or the lower-id member of a new-new pair), `dup_source` says
    * which ('history' | 'batch'), `est_jaccard` is the signature
    * estimate, thresholded at `minEst`.
    */
  def incrementalCandidates(newSig: DataFrame, histSig: DataFrame,
                            numHashes: Int = 16, rowsPerBand: Int = 2,
                            minEst: Double = 0.5): DataFrame = {
    val tagged = newSig.select(col("doc_id"), col("sig"),
        lit(true).as("is_new"))
      .unionByName(histSig.select(col("doc_id"), col("sig"),
        lit(false).as("is_new")))
    val banded = bandRows(tagged, numHashes, rowsPerBand)
      .join(tagged.select(col("doc_id"), col("is_new")), Seq("doc_id"))
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("id_a"), col("is_new").as("new_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("id_b"), col("is_new").as("new_b"))
    val oriented = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      // hist-hist pairs were resolved in the run that ingested them
      .filter(col("new_a") || col("new_b"))
      .select(
        when(col("new_a") && !col("new_b"), col("id_a"))
          .otherwise(col("id_b")).as("doc_id"),
        when(col("new_a") && !col("new_b"), col("id_b"))
          .otherwise(col("id_a")).as("dup_of"),
        when(col("new_a") =!= col("new_b"), lit("history"))
          .otherwise(lit("batch")).as("dup_source"))
      .distinct()
    val sigs = tagged.select(col("doc_id"), col("sig"))
    oriented
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")),
        Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("dup_of"), col("sig").as("sig_b")),
        Seq("dup_of"))
      .withColumn("est_jaccard",
        estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minEst)
      .select("doc_id", "dup_of", "dup_source", "est_jaccard")
  }

  /** Signature-agreement estimate of Jaccard similarity, emitted
    * directly on the 4-decimal grid (OVERFLOW_AUDIT r14): matches and
    * numHashes are exact ints, so the half-up quantization is integer
    * arithmetic — half_up(k/n · 10⁴) = (2k·10⁴ + n) div (2n) — followed
    * by ONE exact division. No round(DOUBLE, n) tail, so the value is
    * build-invariant across engines. The subtraction of pmod makes the
    * long→double division exact (numerator divisible by denominator).
    */
  def estJaccard(sigA: Column, sigB: Column): Column = {
    val k = aggregate(zip_with(sigA, sigB,
      (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)
    val num = k * lit(20000L) + size(sigA).cast("long")
    val den = size(sigA).cast("long") * lit(2L)
    ((num - pmod(num, den)) / den) / lit(10000.0)
  }

  // ---------------- n-gram Jaccard (exact, blocked) ----------------

  /** Exact Jaccard over word-shingle sets for candidate pairs produced by
    * MinHash LSH (never all-pairs). Returns pairs with jaccard >= minSim.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minSim: Double = 0.5,
                        numHashes: Int = 16,
                        rowsPerBand: Int = 2): DataFrame = {
    val cands = minHashCandidates(docs, idCol, textCol, shingleN,
      numHashes, rowsPerBand).select("id_a", "id_b")
    val sets = docs.select(col(idCol).as("doc_id"),
      exprs.shingle_hashes(col(textCol), shingleN).as("sh"))
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      // exact-grid 4-dp Jaccard from the integer overlap (OVERFLOW_AUDIT
      // r14): ic and the set sizes are exact ints, so the quantization
      // is integer half-up + one exact division — no round(DOUBLE, n)
      // tail. Empty∧empty pairs keep sorted_array_jaccard's 1.0.
      .withColumn("ic", exprs.sorted_array_overlap(col("sh_a"),
        col("sh_b")))
      .withColumn("jaccard",
        when(size(col("sh_a")) === 0 && size(col("sh_b")) === 0, lit(1.0))
          .otherwise(ExactGrid.eRatio(col("ic"),
            size(col("sh_a")).cast("long") + size(col("sh_b")) - col("ic"),
            10000L)))
      .filter(col("jaccard") >= minSim)
      .select("id_a", "id_b", "jaccard")
  }

  /** Oracle-mirrorable n-gram Jaccard: candidates from deterministic
    * token-count blocking (same bucket ⇒ compared) instead of MinHash
    * banding, and STRING shingle sets instead of hashes — every step is
    * reproducible in plain SQL. Use [[ngramJaccardPairs]] at scale;
    * this variant exists so the Jaccard computation itself is
    * hash-checked against an independent engine.
    */
  def ngramJaccardBlocked(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, minSim: Double = 0.5,
                          blockWidth: Int = 10): DataFrame = {
    val sets = docs.select(
      col(idCol).as("doc_id"),
      floor(size(tokens(col(textCol))) / blockWidth).as("block"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
    val a = sets.select(col("block"), col("doc_id").as("id_a"),
      col("sh").as("sh_a"))
    val b = sets.select(col("block"), col("doc_id").as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", ExactGrid.eRatio(
        size(array_intersect(col("sh_a"), col("sh_b"))),
        size(array_union(col("sh_a"), col("sh_b"))), 10000L))
      .filter(col("jaccard") >= minSim)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-SUBSET duplicate pairs: containment of the smaller shingle set
    * in the larger — `|A∩B| / min(|A|,|B|)` — over MinHash-LSH candidate
    * pairs. Symmetric Jaccard under-scores a short doc embedded whole in
    * a long one by the length ratio (a 100-shingle quote inside a
    * 2000-shingle page has Jaccard ≈ 0.05 but containment 1.0); this is
    * the standard screen for quote/excerpt/boilerplate-wrapped copies.
    *
    * Scale shape: identical to [[ngramJaccardPairs]] — narrow
    * (band, band_hash) candidate generation, distinct (id_a, id_b),
    * shingle-hash sets joined back once keyed by id, and the
    * intersection counted by the linear-merge native expression
    * ([[graft.expressions.SortedArrayOverlap]]) — no per-pair array
    * materialization beyond the two sorted sets.
    *
    * Recall caveat (documented, inherent): band agreement is driven by
    * JACCARD, so a tiny-doc-in-huge-doc pair with high containment but
    * Jaccard below the LSH threshold can be missed; catching those needs
    * asymmetric candidate generation (e.g. banding the small side's full
    * signature against prefix signatures of the large side). The common
    * curation case — near-dup pages sharing most content plus chrome —
    * sits in the high-Jaccard regime the bands do catch.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, minCont: Double = 0.6,
                       numHashes: Int = 16,
                       rowsPerBand: Int = 2): DataFrame = {
    val cands = minHashCandidates(docs, idCol, textCol, shingleN,
      numHashes, rowsPerBand).select("id_a", "id_b")
    val sets = docs.select(col(idCol).as("doc_id"),
      exprs.shingle_hashes(col(textCol), shingleN).as("sh"))
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("containment", ExactGrid.eRatio(
        exprs.sorted_array_overlap(col("sh_a"), col("sh_b")),
        least(size(col("sh_a")), size(col("sh_b"))), 10000L))
      .filter(col("containment") >= minCont)
      .select("id_a", "id_b", "containment")
  }

  /** PPJoin-style prefix-filtered set-similarity self-join (Xiao et al.,
    * WWW'08 "Efficient Similarity Joins for Near Duplicate Detection"):
    * exact word-`shingleN`-gram Jaccard >= `minSim` pairs WITHOUT
    * MinHash — the deterministic, zero-false-negative alternative to
    * LSH banding (LSH trades a small miss rate for fewer candidates;
    * this trades a bigger candidate join for exactness).
    *
    * Prefix filtering: order each document's distinct shingles by
    * global rarity (document frequency asc, shingle asc) and keep only
    * the first `|x| - ceil(minSim·|x|) + 1` as its candidate-generating
    * prefix; two sets with Jaccard >= minSim MUST share a prefix
    * element, so the equi-join on prefix shingles is lossless.
    * Rare-first ordering makes prefixes join on the LOW-frequency end
    * of the shingle space — the boilerplate head that would explode a
    * naive join never enters a prefix.
    *
    * Scale shape: df is one narrow shingle rollup; per-doc prefix
    * ranking is a doc-partitioned window (bounded by doc length); the
    * candidate join shuffles only (prefix_shingle, doc_id) pairs;
    * verification joins shingle sets for candidate pairs only (at
    * 100 TB you'd join on xxhash64 of the shingle — the string key
    * keeps the oracle trivially mirrorable). Integer-exact jac_ppm.
    */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
                        minSim: Double = 0.5,
                        shingleN: Int = 3,
                        blockCol: Option[String] = None): DataFrame = {
    // OPTIMIZATION r14 — same outputs, 3 fewer corpus-wide shuffles:
    //  - per-doc shingle dedup is ROW-LOCAL (doc_id rides on every
    //    row), so `array_distinct` inside the row replaces the global
    //    (doc_id, token) `.distinct()` shuffle;
    //  - the per-doc rarity ranking collapses into ONE rollup that
    //    collects each doc's (df, token) pairs SORTED (sort_array over
    //    structs = exactly the old window's (df asc, token asc)
    //    order), so prefix positions fall out of a slice of the array
    //    and the separate size rollup + doc-partitioned row_number
    //    window disappear;
    //  - the verification sets are a projection of the SAME per-doc
    //    array (array_intersect is order-insensitive), so the old
    //    second collect_list rollup disappears too.
    val tk = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), shingleN)))
          .as("token"))
    val df = tk.groupBy("token").agg(count(lit(1)).as("df"))
    val docp = tk.join(df, Seq("token"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token"))))
        .as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("sz"),
        col("arr"))
    val pref = docp
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("arr"), lit(1),
          (col("sz") - ceil(lit(minSim) * col("sz")) + 1).cast("int"))))
      .select(col("doc_id"), col("col.token").as("token"), col("sz"),
        (col("pos") + 1).as("pos"))
    // PPJoin length filter inside the bucket join (lossless: Jaccard
    // >= s forces s·|x| <= |y|) — prunes size-incompatible pairs
    // before they reach the distinct. NOTE the measured trade on this
    // fixture (BENCH_NOTES r6): with a CLOSED 31-word vocabulary,
    // prefix buckets grow linearly with the corpus and candidates
    // quadratically (409k @5k docs → 45M @50k) — the adversarial floor
    // for any exact prefix scheme. Open-vocabulary corpora keep
    // buckets df-bounded; for dense/closed vocabularies the scale path
    // is MinHash-LSH ([[ngramJaccardPairs]]), which trades the miss
    // rate for bucket caps.
    // the bucket join keys on xxhash64(shingle), not the string: 8
    // bytes through the engine's heaviest shuffle instead of an n-word
    // text key. A hash collision can only ADD a candidate (equal
    // strings always hash equal), and the exact verify below removes
    // it — the zero-false-negative contract is hash-proof.
    // blockCol: key the candidate join on (block, tkh) so cross-block
    // candidates are pruned BEFORE the shuffle — for block-local
    // outputs (per-source routing) this is output-identical (the
    // prefix filter is lossless under any global df order, and
    // blocked candidates ⊇ every same-block true pair) while dropping
    // the dominant cross-block share of the quadratic candidate mass.
    // None (the default) leaves the plan byte-identical.
    val prefH0 = pref.select(xxhash64(col("token")).as("tkh"),
      col("doc_id"), col("sz"), col("pos"))
    val (prefH, candKeys) = blockCol match {
      case Some(bc) =>
        val m = docs.select(col(idCol).as("doc_id"),
          col(bc).cast("string").as("__blk"))
        (prefH0.join(m, Seq("doc_id")), Seq("__blk", "tkh"))
      case None => (prefH0, Seq("tkh"))
    }
    val aSel = candKeys.map(col) ++
      Seq(col("doc_id").as("id_a"), col("sz").as("za"),
        col("pos").as("pa"))
    val bSel = candKeys.map(col) ++
      Seq(col("doc_id").as("id_b"), col("sz").as("zb"),
        col("pos").as("pb"))
    // PPJoin positional filter (Xiao et al. WWW'08 §3.2, VERDICT r11
    // #2): a token shared at sorted positions (pa, pb) bounds the
    // whole-set overlap by ub = min(pa−1, pb−1) + 1 + min(za−pa,
    // zb−pb) — tokens before it in each set are strictly smaller in
    // the global df order, tokens from it on number za−pa+1 / zb−pb+1.
    // The bound holds at EVERY shared prefix token, so the per-pair
    // aggregate takes the MIN over them (the same groupBy that used to
    // be the dedup distinct — one int wider, no extra shuffle) and
    // keeps the pair only if the bound can still reach the Jaccard
    // threshold: jac ≥ s ⟺ O·(1e6+s_ppm) ≥ s_ppm·(za+zb), and
    // ub ≥ O, so pruning on ub·(1e6+s_ppm) < s_ppm·(za+zb) is
    // lossless (exact integer test — no float slop on either side).
    // Verification work drops by the pruned share: the pairs killed
    // here never pay the sorted-set intersection below.
    val sPpm = math.round(minSim * 1000000)
    val cand = prefH.select(aSel: _*)
      .join(prefH.select(bSel: _*), candKeys)
      .filter(col("id_a") < col("id_b") &&
        col("zb") * lit(minSim) <= col("za") &&
        col("za") * lit(minSim) <= col("zb"))
      .groupBy("id_a", "id_b")
      .agg(min(least(col("pa"), col("pb")) +
        least(col("za") - col("pa"), col("zb") - col("pb"))).as("ub"),
        min("za").as("za"), min("zb").as("zb"))
      .filter(col("ub") * lit(1000000L + sPpm) >=
        lit(sPpm) * (col("za") + col("zb")))
      .select("id_a", "id_b")
    // verify per-pair with a single codegen'd set intersection over the
    // per-doc shingle sets — two narrow id-keyed joins instead of
    // re-exploding every candidate's shingles through a (pair, token)
    // shuffle. The sets are the token projection of the SAME per-doc
    // array the prefixes came from (rarity order, not lexicographic —
    // array_intersect is order-insensitive, ic is a set size); the
    // shared docp subtree's exchange is reused by the physical planner.
    // Every candidate shares a prefix shingle, so ic >= 1.
    val sets = docp.select(col("doc_id"),
      expr("transform(arr, e -> e.token)").as("sh"))
    val minPpm = math.round(minSim * 1000000).toString
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("ic",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jac_ppm",
        expr("(ic * 1000000L) div (size(sh_a) + size(sh_b) - ic)"))
      .filter(col("jac_ppm") >= expr(minPpm + "L"))
      .select("id_a", "id_b", "ic", "jac_ppm")
  }

  /** The measured dial behind [[similarityPairsAuto]] (VERDICT r9 #6):
    * the SIZE-BIASED mean shingle document frequency Σdf²/Σdf — the
    * expected bucket population seen by a random posting, i.e. the
    * direct driver of prefix-bucket candidate mass. On a CLOSED
    * vocabulary the type count plateaus while postings grow, so this
    * statistic grows ~linearly with the corpus (measured on the driver
    * fixture: 2.1 at 500 docs → 10.7 at 5k; candidates quadratic —
    * the r6 adversarial floor, 44.9M pairs at 50k). On an OPEN
    * (natural, Zipf-tailed) vocabulary types grow with the corpus and
    * the statistic stays flat (measured 3.2 at the 50k open-vocab
    * fixture, stable across the 5k→500k decades where the prefix path
    * tracks true pair mass). The default threshold 8 sits between the
    * two measured regimes, and because the trends DIVERGE with scale,
    * misrouting risk shrinks exactly where the corpora get big.
    * Cost: above `sampleCutoff` docs the profile runs on a
    * DETERMINISTIC 1/`sampleMod` xxhash64(doc_id) slice and inverts
    * the expectation exactly — under doc-sampling at rate q,
    * E[Σdf_s²/Σdf_s] = q·sbm + (1−q), so est = 1 + (s−1)·mod — which
    * keeps the dial at gate-fixture cost at any corpus size (measured:
    * the full profile was 48 s of a 50 s routed run at 50k docs; the
    * slice is ~2 s). At or below the cutoff the full profile runs
    * (mod 1 — the same formula, exactly).
    */
  def sizeBiasedMeanDf(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, sampleCutoff: Long = 8192L,
                       sampleMod: Int = 16,
                       knownCount: Option[Long] = None): Double = {
    // the corpus size only picks the sampling modulus — callers that
    // know it (catalog row count, a prior stage's count) pass it via
    // `knownCount` so the dial costs ONE scan (the 1/mod profile
    // slice), not a count scan plus the profile scan (ADVICE r10)
    val qMod =
      if (knownCount.getOrElse(docs.count()) <= sampleCutoff) 1
      else sampleMod
    // per-doc shingle dedup is row-local (optimization r14): the global
    // (doc_id, token) distinct shuffle becomes an in-row array_distinct
    val tk = docs
      .filter(pmod(xxhash64(col(idCol)), lit(qMod.toLong)) === 0)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), shingleN)))
          .as("token"))
    val r = tk.groupBy("token").agg(count(lit(1)).as("df"))
      .agg(sum("df").as("p"), sum(col("df") * col("df")).as("sq"))
      .head()
    val p = r.getLong(0)
    if (p == 0L) 0.0
    else 1.0 + (r.getLong(1).toDouble / p - 1.0) * qMod
  }

  /** Auto-routed similarity pairs (VERDICT r9 #6): picks the EXACT
    * prefix-filter path ([[prefixFilterPairs]], zero false negatives)
    * when the measured df profile says buckets are cold, and the
    * MinHash-LSH banded path ([[minHashCandidates]], bucket sizes
    * capped by banding at a measured ~2.5% miss rate) when the
    * vocabulary is closed/dense and the exact path's candidate mass
    * would go quadratic. Returns (route, pairs) with a uniform
    * (id_a, id_b, sim_ppm) schema — exact Jaccard ppm on the prefix
    * path, signature-estimated ppm on the banded path (each path's
    * underlying function is what the per-path oracle queries gate).
    */
  def similarityPairsAuto(docs: DataFrame, idCol: String,
                          textCol: String, minSim: Double = 0.5,
                          shingleN: Int = 3, numHashes: Int = 16,
                          rowsPerBand: Int = 2,
                          hotBucketThreshold: Double = 8.0,
                          knownCount: Option[Long] = None)
      : (String, DataFrame) = {
    val load = sizeBiasedMeanDf(docs, idCol, textCol, shingleN,
      knownCount = knownCount)
    if (load >= hotBucketThreshold) {
      val minEst = math.round(minSim * 10000).toDouble / 10000
      ("banded", minHashCandidates(docs, idCol, textCol, shingleN,
          numHashes, rowsPerBand)
        .filter(col("est_jaccard") >= lit(minEst))
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard") * 1000000).cast("long")
            .as("sim_ppm")))
    } else {
      ("prefix", prefixFilterPairs(docs, idCol, textCol, minSim,
          shingleN)
        .select(col("id_a"), col("id_b"),
          col("jac_ppm").as("sim_ppm")))
    }
  }

  /** Per-source routing dial: [[sizeBiasedMeanDf]] computed for EVERY
    * source in ONE sampled profile pass — `(source, load)` out. The
    * realistic crawl shape is MIXED: a closed-vocabulary core (forum
    * boilerplate, templated listings) plus an open-vocabulary tail,
    * and a single corpus-global dial mis-serves one half. Per-source
    * sampling modulus: sources at or below `sampleCutoff` docs profile
    * in full (mod 1), bigger sources on the deterministic
    * 1/`sampleMod` xxhash64(doc_id) slice with the same exact
    * expectation inversion — the per-source doc counts come from one
    * narrow rollup (sources are a bounded enum; the frame broadcasts).
    * EVERY source emits a row — a source whose sampled slice is empty
    * (or whose docs are all blank) comes back with load 0.0 (cold →
    * the exact path), so callers read the full source list AND the
    * loads from this one frame: routing costs exactly one metadata
    * rollup plus the sampled profile pass (ADVICE r11 — the former
    * extra `distinct().collect()` source scan is gone). The source
    * key is cast to string here (matching the oracle and the callers'
    * route maps), so a non-string source column keys identically in
    * every path.
    */
  def sizeBiasedMeanDfBySource(docs: DataFrame, idCol: String,
                               textCol: String, sourceCol: String,
                               shingleN: Int = 3,
                               sampleCutoff: Long = 8192L,
                               sampleMod: Int = 16): DataFrame = {
    // sources-sized (bounded enum) — eagerly materialized so the two
    // consumers below (modulus broadcast + full source list) share ONE
    // scan of `docs` instead of re-deriving the rollup twice
    val counts = docs
      .groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__src"),
        when(col("__n") <= sampleCutoff, 1L)
          .otherwise(sampleMod.toLong).as("__m"))
      .localCheckpoint(true)
    val profiled = docs
      .join(broadcast(counts), col(sourceCol).cast("string") === col("__src"))
      .filter(pmod(xxhash64(col(idCol)), col("__m")) === 0)
      .filter(length(trim(col(textCol))) > 0)
      .select(col("__src").as("source"), col("__m"),
        col(idCol).as("doc_id"),
        // in-row per-doc dedup (optimization r14, see sizeBiasedMeanDf)
        explode(array_distinct(shingles(col(textCol), shingleN)))
          .as("token"))
      .groupBy("source", "__m", "token")
      .agg(count(lit(1)).as("df"))
      .groupBy("source", "__m")
      .agg(sum("df").as("p"), sum(col("df") * col("df")).as("sq"))
      .select(col("source"),
        (lit(1.0) + (col("sq").cast("double") / col("p") - 1.0)
          * col("__m")).as("load"))
    counts.select(col("__src").as("source"))
      .join(profiled, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("load"), lit(0.0)).as("load"))
  }

  /** The routing dial's third outcome (VERDICT r10 #7): per-SOURCE
    * auto-routed similarity pairs for mixed corpora. Each source is
    * routed by ITS OWN measured dial — closed-vocab sources take the
    * banded MinHash-LSH path, open-vocab sources the exact
    * prefix-filter path — and the result is the union, restricted to
    * WITHIN-source pairs (the per-shard dedup semantics every crawl
    * pipeline uses; cross-source near-dups are a separate,
    * containment-shaped question).
    *
    * Scale shape: ONE profile pass prices every source (never a scan
    * per source), each underlying path runs ONCE over the union of
    * its routed sources (never a run per source — banding and exact
    * verification make the subset-union run pair-identical to
    * per-source runs after the same-source restriction: signatures
    * are per-doc, and the prefix filter is lossless under ANY global
    * df order), and each path's candidate join is KEYED on the source
    * (`blockCol`) — cross-source candidate mass, the dominant share
    * of the quadratic on a shared-vocabulary corpus, is pruned BEFORE
    * the shuffle instead of filtered after (measured at the sf0.1
    * 20-source fixture: 14.5 → ~2 s). The residual same-source joins
    * only attach the source column to the surviving pairs. The
    * per-source route list itself is a sources-sized collect — a
    * bounded enum, the dimension-collect discipline.
    *
    * Output: `(id_a, id_b, sim_ppm, source, route)` — exact Jaccard
    * ppm on prefix-routed sources, signature-estimated ppm on
    * banded-routed ones.
    */
  def similarityPairsAutoBySource(docs: DataFrame, idCol: String,
                                  textCol: String, sourceCol: String,
                                  minSim: Double = 0.5,
                                  shingleN: Int = 3, numHashes: Int = 16,
                                  rowsPerBand: Int = 2,
                                  hotBucketThreshold: Double = 8.0,
                                  sampleCutoff: Long = 8192L,
                                  sampleMod: Int = 16): DataFrame = {
    // ONE sources-sized collect: the dial frame carries every source
    // (load 0.0 for empty sampled slices), so no second full-corpus
    // distinct() scan is needed for the source list (ADVICE r11)
    val loadRows = sizeBiasedMeanDfBySource(docs, idCol, textCol,
        sourceCol, shingleN, sampleCutoff, sampleMod)
      .collect()
    val loads = loadRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val allSrcs = loadRows.map(_.getString(0))
    val bandedSrcs = allSrcs.filter(s =>
      loads.getOrElse(s, 0.0) >= hotBucketThreshold).toSeq
    val prefixSrcs = allSrcs.filterNot(bandedSrcs.contains).toSeq
    val srcMap = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).cast("string").as("source"))
    def sameSource(pairs: DataFrame): DataFrame = pairs
      .join(srcMap.select(col("doc_id").as("id_a"),
        col("source").as("__sa")), Seq("id_a"))
      .join(srcMap.select(col("doc_id").as("id_b"),
        col("source").as("__sb")), Seq("id_b"))
      .filter(col("__sa") === col("__sb"))
      .withColumn("source", col("__sa"))
      .drop("__sa", "__sb")
    val minEst = math.round(minSim * 10000).toDouble / 10000
    val branches = Seq(
      if (bandedSrcs.isEmpty) None else Some(sameSource(
        minHashCandidates(
          docs.filter(col(sourceCol).isin(bandedSrcs: _*)),
          idCol, textCol, shingleN, numHashes, rowsPerBand,
          blockCol = Some(sourceCol))
          .filter(col("est_jaccard") >= lit(minEst))
          .select(col("id_a"), col("id_b"),
            round(col("est_jaccard") * 1000000).cast("long")
              .as("sim_ppm")))
        .withColumn("route", lit("banded"))),
      if (prefixSrcs.isEmpty) None else Some(sameSource(
        prefixFilterPairs(
          docs.filter(col(sourceCol).isin(prefixSrcs: _*)),
          idCol, textCol, minSim, shingleN,
          blockCol = Some(sourceCol))
          .select(col("id_a"), col("id_b"),
            col("jac_ppm").as("sim_ppm")))
        .withColumn("route", lit("prefix")))).flatten
    // Empty corpus is a degenerate input, not an error (ADVICE r12 #5):
    // return an empty frame with the output schema so callers that
    // tolerated empty input before the dual-route rewrite still do.
    if (branches.isEmpty)
      docs.sparkSession.emptyDataFrame
        .withColumn("id_a", lit(null).cast("long"))
        .withColumn("id_b", lit(null).cast("long"))
        .withColumn("sim_ppm", lit(null).cast("long"))
        .withColumn("source", lit(null).cast("string"))
        .withColumn("route", lit(null).cast("string"))
        .limit(0)
    else branches.reduce(_ unionByName _)
  }

  /** Link prediction over an undirected graph by the Resource
    * Allocation index (Zhou, Lü & Zhang, EPJ B 2009): for each
    * NON-adjacent pair (x, z) with at least one common neighbor,
    * `ra = Σ_{y ∈ N(x)∩N(z)} 1/deg(y)` — common neighbors weighted so
    * that hub intermediaries count for little. Emitted integer-exact as
    * `ra_ppm = Σ (10⁶ div deg(y))` plus the plain common-neighbor
    * count, so cross-engine comparison is bit-stable.
    *
    * Scale shape: degrees are one narrow rollup of the exploded edge
    * list; scoring is the standard wedge join (x–y ⋈ y–z, x < z) whose
    * cost is Σ deg(y)² — bounded by the candidate graph's density, which
    * upstream dedup banding already bounds; existing edges leave via one
    * anti-join on the canonical pair key.
    */
  def linkPrediction(pairs: DataFrame, aCol: String,
                     bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src").as("y"))
      .agg(count(lit(1)).as("deg"))
    val wedge = sym.select(col("dst").as("y"), col("src").as("x"))
      .join(sym.select(col("src").as("y"), col("dst").as("z")), Seq("y"))
      .filter(col("x") < col("z"))
    wedge.join(deg, Seq("y"))
      .groupBy(col("x").as("id_a"), col("z").as("id_b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000L div deg")).as("ra_ppm"))
      .join(e.withColumnRenamed("a", "id_a").withColumnRenamed("b", "id_b"),
        Seq("id_a", "id_b"), "left_anti")
  }

  /** Cross-document EXACT repeated spans (the substring-granularity
    * dedup of Lee et al., ACL'22 "Deduplicating Training Data Makes
    * Language Models Better"): every `spanTokens`-token window that
    * occurs in at least `minDocs` DISTINCT documents, with its document
    * reach and total occurrence count. Document-level dedup misses a
    * boilerplate paragraph pasted into thousands of otherwise-unique
    * pages; span-level catches exactly that.
    *
    * Scale shape: posexplode is map-only (per-doc fan-out bounded by
    * doc length); the rollup shuffles (span, doc_id) once with map-side
    * partial aggregation. At 100 TB the group key would be
    * `xxhash64(span)` (8 bytes vs a repeated `spanTokens`-word string)
    * with the span text carried via a min-by sample — the string key
    * here keeps the oracle a plain SQL twin.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    spanTokens: Int = 5, minDocs: Int = 2): DataFrame =
    docs
      .filter(size(tokens(col(textCol))) >= spanTokens)
      .select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), spanTokens)).as("span"))
      .groupBy("span")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)

  /** Sorted-neighborhood near-dup candidates (Hernández & Stolfo,
    * SIGMOD'95 merge/purge): within each (`lang`, `source`) block, rank
    * documents by (length, id) and compare only rows whose ranks are
    * within `window`; verify candidates with exact distinct-trigram
    * Jaccard. The classic record-linkage alternative to hash blocking:
    * near-dups have near-equal lengths, so a length-sorted walk visits
    * them adjacently with O(n·window) comparisons total.
    *
    * Scale shape: the rank window is PARTITIONED by the block keys —
    * never a corpus-global sort (at 100 TB a global SNM rank would be
    * one range-partitioned sort; blocking keys make it embarrassingly
    * parallel instead). The window self-join is an equi-join on
    * (block, rank+offset) with `window` exploded offsets — no range
    * join, no theta join. Verification joins distinct-shingle sets for
    * the O(n·window) candidates only.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String,
                              textCol: String, blockCols: Seq[String],
                              window: Int = 5,
                              shingleN: Int = 3,
                              minSim: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(blockCols.map(col): _*)
      .orderBy(length(col("text_c")).asc, col("doc_id").asc)
    val ranked = docs
      .filter(length(trim(col(textCol))) > 0)
      .select((blockCols.map(col) :+ col(idCol).as("doc_id") :+
        col(textCol).as("text_c")): _*)
      .withColumn("rnk", row_number().over(w))
      // three consumers (probe, build, shingle sets) — materialize once
      // instead of re-running the rank window per consumer
      .localCheckpoint(true)
    val probe = ranked
      .withColumn("off", explode(lit((1 to window).toArray)))
      .withColumn("rnk", col("rnk") + col("off"))
      .select((blockCols.map(col) :+ col("rnk") :+
        col("doc_id").as("id_a")): _*)
    val cand = probe
      .join(ranked.select((blockCols.map(col) :+ col("rnk") :+
          col("doc_id").as("id_b")): _*),
        blockCols :+ "rnk")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val sets = ranked.select(col("doc_id"),
      array_distinct(shingles(col("text_c"), shingleN)).as("sh"))
    val minPpm = math.round(minSim * 1000000)
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("ic",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jac_ppm", expr(
        "(ic * 1000000L) div (size(sh_a) + size(sh_b) - ic)"))
      .filter(col("jac_ppm") >= minPpm)
      .select("id_a", "id_b", "ic", "jac_ppm")
  }

  // ---------------- candidate pairs → clusters ----------------

  /** Connected components over a near-duplicate pair list: every vertex
    * labeled with the minimum id reachable through the pair graph — the
    * step that turns pairwise similarity into an actual keep/drop
    * decision (keep `id == rep_id`, drop the rest of the cluster).
    *
    * Algorithm: iterative min-label propagation — each round is one
    * edge⋈label join + min-aggregate (two narrow shuffles), and the loop
    * ends after `diameter` rounds (near-dup clusters are near-cliques,
    * so 2–3 rounds in practice; convergence is detected with a per-round
    * count). The per-round work is a fixed pipeline over (edge, label)
    * tuples — the shape that scales out; at extreme diameters switch to
    * large-star/small-star, which squares the label-jump length per
    * round at the cost of a denser intermediate edge set.
    */
  /** Thrown by [[connectedComponents]] under `strict` when min-label
    * propagation has not reached a fixed point within `maxIter` rounds
    * (component diameter > maxIter) — catch it to fall back to
    * [[starContraction]], whose round count is O(log diameter).
    */
  final class ConvergenceException(msg: String)
    extends RuntimeException(msg)

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          strict: Boolean = false): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    edges.count() // materialize ONCE: every round and the vertex seed read this

    // seed with min(self, direct neighbors) — one shuffle, same as a
    // plain vertex-distinct would cost, but it starts the propagation a
    // full round ahead (cliques and stars converge immediately).
    // Per-round localCheckpoint (not persist): it materializes the round
    // eagerly AND cuts the logical lineage — labels is referenced twice
    // per round, so an uncut analyzed plan doubles every round and
    // analysis cost turns exponential at high iteration counts; caching
    // truncates only physical execution, not the analyzed tree. The
    // checkpointed blocks are GC-cleaned by the context cleaner.
    // Round materialization is a lazy STATS-BARRIER checkpoint
    // (optimization r14, see PlanBridge.localCheckpointStatsBarrier):
    // the moved-count action below materializes the round's blocks AND
    // answers convergence in ONE job where eager checkpoint + separate
    // count paid two, and resetting the size estimate per round stops
    // Catalyst's join-size BigInts from doubling their digit count
    // every iteration (a pure planning tax that grows with maxIter).
    import org.apache.spark.sql.graftbridge.PlanBridge
    var labels = PlanBridge.localCheckpointStatsBarrier(
      edges.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("min_nbr"))
        .select(col("id"), least(col("id"), col("min_nbr")).as("rep")),
      eager = false)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("rep").as("nbr_rep"))
      val next = PlanBridge.localCheckpointStatsBarrier(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("rep"), coalesce(col("nbr_rep"), col("rep")))
              .as("rep"),
            (coalesce(col("nbr_rep"), col("rep")) < col("rep"))
              .as("moved")),
        eager = false)
      val changed = next.filter(col("moved")).count()
      labels = next.select("id", "rep")
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      val msg =
        s"connectedComponents did not converge within $maxIter rounds — " +
          "labels may be non-minimal; raise maxIter for graphs of " +
          "diameter > maxIter; or use [[starContraction]], which " +
          "converges in O(log diameter) rounds"
      if (strict) {
        edges.unpersist()
        throw new ConvergenceException(msg)
      }
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    // labels is already checkpointed (lineage-free), so the edge cache
    // can be dropped here: the returned frame reads only the final
    // round's blocks, and repeated calls leave nothing in the cache
    // manager — no clearCache() housekeeping for long-lived sessions.
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("rep").as("rep_id"))
  }

  /** Incremental connected components: min-label propagation over the
    * FULL edge set, warm-started from a previously-computed base
    * labeling — the delta-maintenance twin of [[connectedComponents]]
    * (same contract, same fixed point). New vertices start as their
    * own label; old vertices start at their saved base rep. Because
    * the base rep of any vertex is (a) itself a member of the merged
    * component and (b) ≥ the merged component's min id, min
    * propagation from the warm start converges to EXACTLY the
    * from-scratch labeling — the equality the oracle checks — but the
    * propagation only has to cover the diameter of the CHANGED
    * region, not the whole graph: on a daily delta over a mostly-
    * stable 100 TB dedup graph that is the difference between 2–3
    * rounds and a full-diameter recompute. The loop still runs to a
    * detected fixed point (changed == 0), so correctness never
    * depends on guessing the round count.
    */
  def incrementalComponents(pairs: DataFrame, aCol: String, bCol: String,
                            baseLabels: DataFrame,
                            maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs
        .select(col(bCol).cast("long").as("src"),
          col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    edges.count() // materialize ONCE: every round reads this
    val verts = edges.select(col("src").as("id")).distinct()
    // lazy stats-barrier rounds with the fused moved-count — same
    // rationale as [[connectedComponents]] (optimization r14)
    import org.apache.spark.sql.graftbridge.PlanBridge
    var labels = PlanBridge.localCheckpointStatsBarrier(verts
      .join(baseLabels
        .select(col("doc_id").as("id"), col("rep_id").as("base_rep")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("base_rep"), col("id")).as("rep")),
      eager = false)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("rep").as("nbr_rep"))
      val next = PlanBridge.localCheckpointStatsBarrier(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("rep"), coalesce(col("nbr_rep"), col("rep")))
              .as("rep"),
            (coalesce(col("nbr_rep"), col("rep")) < col("rep"))
              .as("moved")),
        eager = false)
      val changed = next.filter(col("moved")).count()
      labels = next.select("id", "rep")
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("rep").as("rep_id"))
  }

  /** Connected components via alternating large-star / small-star rounds
    * (the public two-phase contraction algorithm of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each round
    * re-points whole neighborhoods at their minimum, so the distance a
    * label travels per round roughly squares — O(log diameter) rounds
    * where [[connectedComponents]] needs O(diameter). Same output
    * contract: (doc_id, rep_id), rep_id = min id in the component.
    *
    * Use for high-diameter graphs (long chains of pairwise near-dups);
    * plain propagation stays the cheaper default for the near-clique
    * clusters MinHash candidates usually form (its per-round edge set is
    * never densified). Fixed point is detected with a narrow
    * (count, hash-sum) checksum — one tiny agg per round, no `except`.
    */
  def starContraction(pairs: DataFrame, aCol: String, bCol: String,
                      maxIter: Int = 20): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))

    // order-independent fingerprint of the edge set: at the fixed point
    // the emitted orientation is canonical (src > dst), so equal
    // (count, xor-of-hashes) across rounds ⇒ the set is stable. XOR
    // (not sum) because ANSI mode makes a long sum overflow-checked.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))"))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // large-star: every neighbor v > u re-points at m(u) = min(Γ(u) ∪ u)
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      s.filter(col("dst") > col("src"))
        .join(m, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // small-star: neighbors v ≤ u (and u itself) re-point at their min
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val m = dir.groupBy("src").agg(min("dst").as("m"))
      dir.join(m, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(m.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    val edges0 = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))

    // per-round localCheckpoint (not persist): large-star/small-star each
    // reference their input several times, so an uncut LOGICAL plan grows
    // ~12× per round and analysis time explodes exponentially — caching
    // truncates only the physical execution, not the analyzed tree.
    // Checkpointing materializes the round AND replaces its lineage with
    // the stored blocks (blocks are GC-cleaned by the context cleaner).
    // lazy stats-barrier rounds; the checksum aggregate is the action
    // that materializes each round — one job per round instead of two,
    // and no per-round join-size-estimate snowball (optimization r14)
    import org.apache.spark.sql.graftbridge.PlanBridge
    var edges = PlanBridge.localCheckpointStatsBarrier(edges0,
      eager = false)
    val verts = sym(edges).select(col("src").as("id")).distinct()
    var state = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = PlanBridge.localCheckpointStatsBarrier(
        smallStar(largeStar(edges)), eager = false)
      val ns = checksum(next)
      edges = next
      converged = ns == state
      state = ns
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"starContraction did not reach a fixed point within $maxIter " +
          "rounds — labels may be non-minimal")
    // at the fixed point the edge set is a union of stars (leaf, root)
    val leaf = edges.groupBy(col("src").as("id")).agg(min("dst").as("rep"))
    verts.join(leaf, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("rep"), col("id")).as("rep_id"))
  }

  /** Deterministic integer PageRank over an undirected pair graph
    * (near-dup candidates, citation/link pairs): authority scores for
    * quality weighting — a document endorsed by many well-connected
    * near-dups/links ranks high, the CommonCrawl-host-rank idea applied
    * per document.
    *
    * All arithmetic is EXACT INTEGER: ranks live in millionths,
    * per-edge contributions are `floor(rank·damping% / (100·outdeg))`,
    * and the per-vertex reduce sums longs — so the fixpoint iteration
    * is reproducible under any partitioning or aggregation order
    * (float PageRank is not). No normalization pass: the teleport
    * constant keeps scores in a stable integer range, and downstream
    * use is ordinal. The symmetric edge set means no dangling vertices.
    *
    * Scale shape: per round, one narrow (src, rank, deg) join plus one
    * map-side-combined sum — the connected-components discipline
    * ([[connectedComponents]]), including the per-round eager
    * `localCheckpoint` that drops lineage and caches nothing past the
    * return.
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iters: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val verts = e.select(col("src").as("id")).distinct()
    var r = verts.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("rank") * dampingPct / (lit(100) * col("deg")))
            .cast("long").as("c"))
      // teleport mass in millionths: (1 - damping) · 10⁶, consistent
      // with the damping factor for ANY dampingPct (not just 85)
      val teleport = (100L - dampingPct) * 10000L
      r = verts
        .join(contrib.groupBy("id").agg(sum("c").as("in")), Seq("id"),
          "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("in"), lit(0L))).as("rank"))
        .localCheckpoint(true)
    }
    r.select(col("id").as("doc_id"), col("rank"))
  }

  /** Personalized PageRank over the undirected near-dup graph:
    * teleport mass returns ONLY to the seed set (a predicate over
    * vertex ids) instead of uniformly, so rank measures proximity to
    * the seeds — the standard "contamination spread" / "related docs"
    * ranking ([[bfsDepths]] gives hop distance; this weighs ALL paths,
    * not just the shortest). Same exact-integer discipline as
    * [[pageRank]]: ranks in millionths, floor-divided contributions,
    * teleport `(100−d)·10⁴` gated per vertex — deterministic under
    * any execution order, bit-reproducible by the SQL oracle.
    *
    * Scale shape identical to [[pageRank]]: per round one narrow
    * (src, rank, deg) join + one map-side-combined sum, per-round
    * eager `localCheckpoint`, nothing cached past the return.
    */
  def personalizedPageRank(pairs: DataFrame, aCol: String, bCol: String,
                           seed: Column => Column, iters: Int = 3,
                           dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val verts = e.select(col("src").as("id")).distinct()
    val teleport = (100L - dampingPct) * 10000L
    def gate(c: Column): Column =
      when(seed(col("id")), c).otherwise(lit(0L))
    var r = verts.withColumn("rank", gate(lit(1000000L)))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("rank") * dampingPct / (lit(100) * col("deg")))
            .cast("long").as("c"))
      r = verts
        .join(contrib.groupBy("id").agg(sum("c").as("in")), Seq("id"),
          "left")
        .select(col("id"),
          (gate(lit(teleport)) + coalesce(col("in"), lit(0L)))
            .as("rank"))
        .localCheckpoint(true)
    }
    r.select(col("id").as("doc_id"), col("rank"))
  }

  /** HITS hubs-and-authorities (Kleinberg, JACM'99) over a DIRECTED
    * edge list, `iters` mutual-reinforcement rounds in exact integer
    * arithmetic: authority(v) = Σ hub(u) over in-edges, hub(v) =
    * Σ authority(w) over out-edges, each side re-normalized to a
    * 0..10⁶ scale by integer division with the round's max (the
    * fixed-point analogue of L∞ normalization — deterministic under
    * any partitioning, unlike float L2). On the canonical a<b
    * near-dup edge orientation, authorities are the "most duplicated
    * targets" and hubs the "most duplicating sources" — a different
    * ranking than [[pageRank]]'s undirected authority, and the
    * classic web-graph dual.
    *
    * Scale shape: per round two narrow (id, score) joins against the
    * checkpointed edge list + two map-side-combined sums; the max for
    * normalization is a 1-row broadcast, never a collect. Per-round
    * eager `localCheckpoint` truncates the iterative lineage
    * ([[pageRank]] discipline).
    */
  def hits(pairs: DataFrame, aCol: String, bCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    def normalize(raw: DataFrame, out: String): DataFrame = {
      val mx = raw.agg(max("raw").as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("id"),
          expr("(raw * 1000000) div greatest(mx, 1)").as(out))
        .localCheckpoint(true)
    }
    var h = verts.withColumn("hub", lit(1000000L))
    var a = verts.withColumn("auth", lit(1000000L))
    for (_ <- 1 to iters) {
      val aRaw = verts.join(
        e.join(h.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id")).agg(sum("hub").as("s")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("raw"))
      a = normalize(aRaw, "auth")
      val hRaw = verts.join(
        e.join(a.withColumnRenamed("id", "dst")
            .withColumnRenamed("auth", "av"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(sum("av").as("s")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("raw"))
      h = normalize(hRaw, "hub")
    }
    a.join(h, Seq("id")).select(col("id").as("doc_id"),
      col("auth"), col("hub"))
  }

  /** Bounded-round k-core peeling over the undirected near-dup graph:
    * repeatedly drop vertices with degree < k (and their edges) for
    * `rounds` iterations, then report the survivors with their final
    * within-core degree. The k-core separates DENSE duplicate
    * communities (every member ≥ k strong neighbours) from stars and
    * chains that exact-threshold pairing can't tell apart — the
    * canonical "keep one per clique, review the periphery" split.
    *
    * Bounded rounds (like [[pageRank]]'s `iters`) keep the operator a
    * fixed-depth DAG the oracle can unroll; on near-dup graphs the
    * peel converges in a handful of rounds because cliques are stable
    * under deletion.
    *
    * Scale shape: each round is two semi-joins of the narrow (src,
    * dst) edge list against a key-only survivor set, plus one
    * map-side-combined degree count — no row ever carries more than
    * two longs, and the per-round eager `localCheckpoint` truncates
    * the iterative lineage ([[connectedComponents]] discipline).
    */
  def kCore(pairs: DataFrame, aCol: String, bCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= k)
        .select(col("src").as("node"))
        .localCheckpoint(true)
      e = e
        .join(alive.withColumnRenamed("node", "src"), Seq("src"),
          "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"),
          "left_semi")
        .localCheckpoint(true)
    }
    // survivors with their degree inside the final peeled graph
    e.groupBy("src").agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
      .select(col("src").as("doc_id"), col("core_deg"))
  }

  /** Synchronous label propagation over the undirected near-dup graph,
    * `rounds` fixed iterations: every vertex adopts the MODE of its
    * neighbors' labels (count desc, label asc tie-break — fully
    * deterministic, unlike classic randomized LPA), seeded with its own
    * id. Communities differ from [[connectedComponents]]: a bridge
    * vertex joins the side with more of its neighbors instead of
    * gluing both sides into one component — the granularity that
    * separates two near-dup families connected by one borderline pair.
    *
    * Shape: per round, one edge×labels join (narrow id pairs) and one
    * (vertex, label) count agg; the mode is a bounded `min(struct)`
    * fold, never a per-vertex window sort. `localCheckpoint` per round
    * caps lineage exactly like [[kCore]].
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = e
        .join(labels.select(col("node").as("dst"), col("label")),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src").as("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label")))
          .getField("label").as("label"))
        .localCheckpoint(true)
    }
    labels.select(col("node").as("doc_id"), col("label").as("community"))
  }

  /** Louvain-style modularity local move (Blondel–Guillaume–Lambiotte–
    * Lefebvre, J. Stat. Mech. 2008, phase 1) — the community detection
    * that OPTIMIZES modularity, where [[labelPropagation]] merely
    * follows majority labels (graph_modularity scores a partition;
    * this one improves it). Deterministic synchronous variant:
    * `rounds` sweeps where every node simultaneously moves to the
    * candidate community (its neighbors' communities plus its own)
    * maximizing the exact integer gain score 2m·k_{i,c} − k_i·d_c^{−i}
    * (the standard ΔQ numerator with the constant self-terms dropped —
    * they are equal across a node's candidates, so the argmax is the
    * true Louvain local move), ties to the SMALLEST community id.
    * Sequential Louvain is order-dependent; the synchronous sweep is
    * replayable in any engine, which is what makes the oracle a plain
    * SQL twin.
    *
    * Scale shape per round: one (node, neighbor-community) rollup over
    * the edge list (the corpus-sized shuffle), one community-degree
    * rollup, keyed joins, and a per-node argmax via min/max-by struct
    * (bounded by degree). The 1-row edge-count frame broadcasts.
    * Bound stated: gains live in longs — exact while
    * 2m·deg_max < 2⁶³.
    */
  def louvainLocalMove(pairs: DataFrame, aCol: String, bCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      // drop self-pairs HERE (ADVICE r12 #4): the weighted core prices
      // a self-loop row as twice the intra weight, so a stray (a, a)
      // input pair surviving as a w=1 half-loop would silently skew
      // degrees; current candidate generators only emit id_a < id_b,
      // but the normalization — not the caller — owns the contract
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("w", lit(1L))
    louvainLocalMoveWeighted(e, rounds)
      .select(col("node").as("doc_id"), col("comm").as("community"))
  }

  /** The weighted synchronous local-move core both Louvain levels run
    * on: `edges` is a DIRECTED symmetric frame `(src, dst, w)` where a
    * self-loop row (src = dst) carries TWICE the intra weight (both
    * endpoints), so `ki = Σ w` is the weighted degree and
    * `m = Σ w / 2` the total weight. Self-loops contribute to degrees
    * and community loads but never to a candidate k_{i,c} (the
    * `src ≠ dst` filter) — exactly the weighted gain numerator
    * 2m·k_{i,c} − k_i·(d_c − [c = c_i]·k_i) of Blondel et al. 2008
    * §2. With w ≡ 1 this is bit-identical to the round-11 unweighted
    * sweep (sum ≡ count). Overflow bound (count class): gains are
    * ≤ 4m² < 2⁶³ for m ≤ 1.5e9 total edge weight — loud past it.
    */
  def louvainLocalMoveWeighted(edges: DataFrame,
                               rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(sum("w").as("ki"))
      .localCheckpoint(true)
    val mstat = e.agg((sum("w") / 2).cast("long").as("m"))
    var comm = deg.select(col("node")).withColumn("comm", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val dcomm = comm.join(deg, Seq("node"))
        .groupBy("comm").agg(sum("ki").as("dc"))
      val kic = e.filter(col("src") =!= col("dst"))
        .join(comm.select(col("node").as("dst"), col("comm")),
          Seq("dst"))
        .groupBy(col("src").as("node"), col("comm"))
        .agg(sum("w").as("kic"))
      // the node's CURRENT community is always a candidate (staying
      // must be priced); when it is also a neighbor community the
      // max-dedup keeps the real k_{i,c}
      val cand = kic
        .unionByName(comm.withColumn("kic", lit(0L)))
        .groupBy("node", "comm").agg(max("kic").as("kic"))
      comm = cand
        .join(dcomm, Seq("comm"))
        .join(comm.withColumnRenamed("comm", "cc"), Seq("node"))
        .join(deg, Seq("node"))
        .crossJoin(broadcast(mstat))
        .withColumn("gain",
          lit(2L) * col("m") * col("kic") - col("ki") *
            (col("dc") - when(col("comm") === col("cc"), col("ki"))
              .otherwise(lit(0L))))
        .groupBy("node")
        .agg(max(struct(col("gain"), (-col("comm")).as("nc")))
          .getField("nc").as("nc"))
        .select(col("node"), (-col("nc")).as("comm"))
        .localCheckpoint(true)
    }
    comm
  }

  /** Multi-level Louvain (VERDICT r11 #4 — the phase the round-11
    * local move lacked): phase 1 runs `rounds1` synchronous sweeps on
    * the raw graph; phase 2 AGGREGATES each community to a supernode
    * (Blondel et al. 2008 §2, the "community aggregation" step) —
    * inter-community edge weights are the cross-edge counts, each
    * community's intra-edge count becomes a self-loop of twice that
    * weight, so the aggregated graph's modularity function equals the
    * original partition's — reruns the SAME weighted sweep on the
    * supernode graph, and unfolds labels through the two levels. This
    * reaches merges a bounded number of synchronous local moves
    * cannot (large-diameter community hierarchies), while every step
    * stays a rollup + keyed joins: the aggregation is ONE edge rollup
    * over the phase-1 labels, and the level-2 sweep runs on the
    * communities-sized frame.
    */
  def louvainMultilevel(pairs: DataFrame, aCol: String, bCol: String,
                        rounds1: Int, rounds2: Int): DataFrame = {
    val c1 = louvainLocalMove(pairs, aCol, bCol, rounds1)
      .localCheckpoint(true)
    val und = pairs
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val m1 = und
      .join(c1.select(col("doc_id").as("a"), col("community").as("ca")),
        Seq("a"))
      .join(c1.select(col("doc_id").as("b"), col("community").as("cb")),
        Seq("b"))
    val inter = m1.filter(col("ca") =!= col("cb"))
      .groupBy(least(col("ca"), col("cb")).as("x"),
        greatest(col("ca"), col("cb")).as("y"))
      .agg(count(lit(1)).as("w"))
    val intra = m1.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("x"))
      .agg((count(lit(1)) * lit(2L)).as("w"))
    val agg = inter
      .select(col("x").as("src"), col("y").as("dst"), col("w"))
      .unionByName(inter.select(col("y").as("src"),
        col("x").as("dst"), col("w")))
      .unionByName(intra.select(col("x").as("src"),
        col("x").as("dst"), col("w")))
    val c2 = louvainLocalMoveWeighted(agg, rounds2)
    c1.join(c2.select(col("node").as("community"),
        col("comm").as("c2")), Seq("community"))
      .select(col("doc_id"), col("c2").as("community"))
  }

  /** Bounded-round multi-source BFS over the undirected near-dup
    * graph: minimum hop distance from any SEED vertex (a predicate
    * over vertex ids — e.g. an audited/“known-contaminated” doc set)
    * within `rounds` hops. The contamination-blast-radius query: given
    * flagged documents, how much of the corpus sits within h near-dup
    * hops of one? Vertices unreachable in `rounds` hops are absent
    * from the output (distance genuinely unknown at this bound, not 0).
    *
    * Classic BFS frontier discipline: per round only the NEWLY reached
    * vertices (left-anti vs the visited set) expand, so each edge is
    * traversed at most once per endpoint discovery, not once per
    * round. Per-round eager `localCheckpoint` truncates lineage
    * ([[connectedComponents]] discipline); every shuffled row is a
    * pair of longs.
    */
  def bfsDepths(pairs: DataFrame, aCol: String, bCol: String,
                seed: Column => Column, rounds: Int): DataFrame =
    bfsDepthsCore(pairs, aCol, bCol,
      verts => verts.filter(seed(col("id"))), rounds)

  /** [[bfsDepths]] with the seed set given as a one-column DataFrame of
    * vertex ids instead of a predicate — the shape for seed sets that
    * are themselves query results (e.g. "the N lexically-smallest
    * vertices of the candidate graph", an audit table, a quarantine
    * list). Seeds not present in the graph are ignored (semi-join), so
    * a stale quarantine list cannot invent vertices.
    */
  def bfsDepthsFromSeeds(pairs: DataFrame, aCol: String, bCol: String,
                         seeds: DataFrame, rounds: Int): DataFrame = {
    val s = seeds.select(
      col(seeds.columns.head).cast("long").as("id"))
    bfsDepthsCore(pairs, aCol, bCol,
      verts => verts.join(s, Seq("id"), "left_semi"), rounds)
  }

  /** Bounded-round single-source(-set) shortest paths over the
    * WEIGHTED undirected near-dup graph — Bellman–Ford with `rounds`
    * relaxation rounds: after round r every vertex holds the minimum
    * total weight over walks of ≤ r edges from any seed (vertices
    * unreachable in `rounds` hops are absent). The weighted refinement
    * of [[bfsDepthsFromSeeds]]: with edge weight = 1 − similarity, the
    * distance is a DISSIMILARITY budget — "everything within ε of a
    * flagged document, transitively" — which ranks blast-radius
    * vertices by contamination strength instead of hop count.
    *
    * Scale shape: each round joins the narrow (id, dist) frame to the
    * edge list (both shuffled by key) and takes a per-vertex min —
    * rows are triples of longs; per-round eager `localCheckpoint`
    * truncates lineage exactly like [[connectedComponents]]. Weights
    * are caller-provided integers (exact math end to end).
    */
  def ssspFromSeeds(pairs: DataFrame, aCol: String, bCol: String,
                    wCol: String, seeds: DataFrame,
                    rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst"), col(wCol).cast("long").as("w")))
      .distinct()
      .localCheckpoint(true)
    val verts = e.select(col("src").as("id")).distinct()
    val s = seeds.select(col(seeds.columns.head).cast("long").as("id"))
    var dist = verts.join(s, Seq("id"), "left_semi")
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = e
        .join(dist.select(col("id").as("src"), col("dist")), Seq("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist.select(col("id").as("doc_id"), col("dist"))
  }

  private def bfsDepthsCore(pairs: DataFrame, aCol: String, bCol: String,
                            seedOf: DataFrame => DataFrame,
                            rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = pairs
      .select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val verts = e.select(col("src").as("id")).distinct()
    var visited = seedOf(verts)
      .withColumn("depth", lit(0L))
      .localCheckpoint(true)
    var frontier = visited
    for (d <- 1 to rounds) {
      frontier = e
        .join(frontier.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("depth", lit(d.toLong))
        .localCheckpoint(true)
      visited = visited.unionByName(frontier).localCheckpoint(true)
    }
    visited.select(col("id").as("doc_id"), col("depth"))
  }

  /** Per-vertex triangle counts over the undirected near-dup graph —
    * the local clustering signal: near-dup CLIQUES (true duplicate
    * groups) are triangle-dense, while chains of borderline pairs
    * (threshold noise) carry none, so the count separates "genuine
    * cluster member" from "bridge artifact" better than degree.
    *
    * Shape: edges canonicalized to a < b and deduplicated; wedges
    * (a<b<c) materialize via one self-join on the middle vertex and
    * close via a second join on the (a, c) edge — both joins move only
    * narrow id pairs, shuffled by join key. Output: (doc_id,
    * n_triangles) for every vertex in at least one triangle.
    */
  def triangleCounts(pairs: DataFrame, aCol: String,
                     bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    // wedges x<y<z: e(x,y) ⋈ e(y,z); closed by the (x,z) edge
    val wedge = e
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tri = wedge.join(
      e.select(col("a"), col("b").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node local clustering coefficient over the candidate graph:
    * `cc(v) = 2·T(v) / (deg(v)·(deg(v)−1))` for nodes of degree ≥ 2 —
    * the clique-vs-bridge separator ([[triangleCounts]] gives the
    * numerator; a dup CLIQUE scores ~1, a chain of borderline pairs
    * ~0). Integer-exact numerator/denominator with a single IEEE
    * division, so cross-engine comparison is bit-stable.
    *
    * Scale shape: degrees are one narrow aggregate over the exploded
    * edge list; the triangle join is the standard x<y<z wedge closure
    * (cost bounded by candidate-graph density, which dedup banding
    * already bounds); one final key join.
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(pairs, aCol, bCol)
    deg.filter(col("degree") >= 2)
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        ExactGrid.eRatio(lit(2L) * coalesce(col("n_triangles"), lit(0L)),
          col("degree") * (col("degree") - 1), 10000L).as("cc"))
  }

  /** Edit-distance near-dup pairs for SHORT text keys (titles, names,
    * leading spans): candidate pairs materialize only within an exact
    * `prefixLen`-character block, then Levenshtein over the
    * `titleLen`-character key keeps pairs at distance <= `maxDist`.
    *
    * Within a block, candidates come from a SECOND content-derived
    * blocking dimension — the PassJoin partition signature (Li, Deng
    * & Feng, VLDB 2012 "PASS-JOIN: a partition-based method for
    * similarity joins"): split the post-prefix suffix into
    * `maxDist + 1` fixed segments; if ed(a, b) <= maxDist then at
    * least one segment of b is untouched by the alignment and so
    * appears VERBATIM in a, shifted by the net indel count before it.
    * For the equal-full-length route (suffixes the same length)
    * insertions and deletions pair up, so the shift is bounded by
    * `maxDist / 2` — each doc indexes its `maxDist + 1` segments and
    * probes every valid in-bounds shifted window, and the candidate
    * join keys on (block, segment-index, segment-text). Zero false
    * negatives (the filter is a proven superset), and within-block
    * cost tracks segment diversity instead of the block's pair mass —
    * the same second-blocking-key escape that took Fellegi–Sunter
    * record linkage off the fixed-block quadratic (measured here:
    * 12x fewer DP pairs at both the 50k and 500k fixtures, 238k vs
    * 2.9M and 23.2M vs 292M). Docs whose key is SHORTER than
    * `titleLen` (truncated titles — a per-mille tail in practice)
    * take a brute-force side route against the whole block, bounded
    * by the short tail's size, with the |len| difference lower bound
    * applied before the DP.
    *
    * Shape: two narrow shuffles (segment join + pair distinct);
    * quadratic in nothing — the right tool for title/entity fuzzy
    * matching where edits cluster past the first characters. For
    * unbounded full-text near-dup, the MinHash/SimHash family is the
    * scale path (a segment here is an exact-content partition, the
    * same role LSH bands play there).
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        prefixLen: Int = 8, titleLen: Int = 40,
                        maxDist: Int = 4): DataFrame = {
    require(prefixLen <= titleLen)
    val sufLen = titleLen - prefixLen
    val nSegs = maxDist + 1
    val t = docs.select(col(idCol).cast("long").as("id"),
      substring(col(textCol), 1, titleLen).as("title"),
      substring(col(textCol), 1, prefixLen).as("blk"))
    // threshold-form Levenshtein runs the banded DP — O(len·maxDist)
    // per pair instead of O(len²), and returns -1 past the bound, so
    // the filter and the distance come from one evaluation
    def dp(pairs: DataFrame): DataFrame = pairs
      .withColumn("edit_dist",
        levenshtein(col("title_a"), col("title_b"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select("id_a", "id_b", "edit_dist")
    if (sufLen < nSegs) {
      // suffix too short to partition: the original within-block join
      val a = t.select(col("blk"), col("id").as("id_a"),
        col("title").as("title_a"))
      val b = t.select(col("blk"), col("id").as("id_b"),
        col("title").as("title_b"))
      return dp(a.join(b, Seq("blk")).filter(col("id_a") < col("id_b")))
    }
    // fixed segment layout over the suffix: the first (sufLen mod
    // nSegs) segments get the extra character
    val base = sufLen / nSegs
    val extra = sufLen % nSegs
    val segs = (0 until nSegs).map { i =>
      val len = if (i < extra) base + 1 else base
      val start = 1 + i * base + math.min(i, extra) // 1-based in suffix
      (i, start, len)
    }
    val shift = maxDist / 2 // net indels at equal total length
    val full = t.filter(length(col("title")) === titleLen)
      .withColumn("suf", substring(col("title"), prefixLen + 1, sufLen))
    // the segment join carries ONLY ids — titles would be replicated
    // (maxDist+1)x on the index side and ~(maxDist+1)(maxDist+1)x on
    // the probe side through the explode; they re-attach AFTER the
    // distinct via two narrow id-keyed joins of the (much smaller)
    // candidate frame
    val ix = full.select(col("blk"), col("id"),
      posexplode(array(segs.map { case (_, p, l) =>
        substring(col("suf"), p, l)
      }: _*)).as(Seq("si", "sg")))
    val probeKeys = segs.flatMap { case (i, p, l) =>
      (-shift to shift).collect {
        case d if p + d >= 1 && p + d + l - 1 <= sufLen =>
          struct(lit(i).as("si"),
            substring(col("suf"), p + d, l).as("sg"))
      }
    }
    val pr = full.select(col("blk"), col("id"),
        explode(array(probeKeys: _*)).as("k"))
      .select(col("blk"), col("id"),
        col("k.si").as("si"), col("k.sg").as("sg"))
    val titles = t.select(col("id"), col("title"))
    val longPairs = pr.select(col("blk"), col("si"), col("sg"),
        col("id").as("pid"))
      .join(ix.select(col("blk"), col("si"), col("sg"),
        col("id").as("xid")), Seq("blk", "si", "sg"))
      .filter(col("pid") =!= col("xid"))
      .select(least(col("pid"), col("xid")).as("id_a"),
        greatest(col("pid"), col("xid")).as("id_b"))
      .distinct()
      .join(titles.select(col("id").as("id_a"),
        col("title").as("title_a")), Seq("id_a"))
      .join(titles.select(col("id").as("id_b"),
        col("title").as("title_b")), Seq("id_b"))
    // short-key tail: pairs where at least one side is truncated —
    // brute force against the block, |Δlen| <= maxDist pre-filter
    // the short side is a small tail by construction (truncated keys),
    // so broadcast it — the corpus-sized right side then never
    // shuffles on blk for this route
    val short = t.filter(length(col("title")) < titleLen)
    val shortPairs = broadcast(short.select(col("blk"),
        col("id").as("sid"), col("title").as("stitle")))
      .join(t.select(col("blk"), col("id").as("oid"),
        col("title").as("otitle")), Seq("blk"))
      .filter(col("sid") =!= col("oid"))
      // short×short pairs appear in both orientations; keep one.
      // short×full pairs appear once (full ids never probe here).
      .filter(length(col("otitle")) === titleLen ||
        col("sid") < col("oid"))
      .filter(abs(length(col("stitle")) - length(col("otitle")))
        <= maxDist)
      .select(
        least(col("sid"), col("oid")).as("id_a"),
        greatest(col("sid"), col("oid")).as("id_b"),
        when(col("sid") < col("oid"), col("stitle"))
          .otherwise(col("otitle")).as("title_a"),
        when(col("sid") < col("oid"), col("otitle"))
          .otherwise(col("stitle")).as("title_b"))
    dp(longPairs.unionByName(shortPairs))
  }

  // ---------------- decontamination ----------------

  /** The contamination fingerprint of an eval/test set: its distinct
    * word-`shingleN`-gram hashes. Small relative to the corpus — at
    * 100 TB this is the broadcast side.
    */
  def evalShingles(evalDocs: DataFrame, textCol: String,
                   shingleN: Int = 5): DataFrame =
    evalDocs.select(
      explode(exprs.shingle_hashes(col(textCol), shingleN)).as("sh"))
      .distinct()

  /** Test-set decontamination screen: training docs sharing at least one
    * `shingleN`-gram with the contamination set, with the count of
    * distinct contaminated shingles per doc. Map-side shingle explode +
    * (broadcastable) semi-ish join + one narrow aggregate — drop or
    * down-weight the flagged docs before training.
    */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
                        contamination: DataFrame,
                        shingleN: Int = 5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(exprs.shingle_hashes(col(textCol), shingleN)).as("sh"))
    sh.join(broadcast(
        contamination.select(col(contamination.columns.head).as("sh"))
          .distinct()),
        Seq("sh"))
      .groupBy("doc_id").agg(countDistinct(col("sh")).as("n_hits"))
  }

  /** Exact-substring decontamination: corpus docs that contain any eval
    * snippet VERBATIM (the strictest leakage definition — shingle
    * overlap ([[contaminationHits]]) catches paraphrase-adjacent overlap,
    * substring match catches literal inclusion regardless of token
    * boundaries). Output one row per contaminated doc with the hit count
    * and the lowest matching snippet id.
    *
    * Scale shape: eval snippet sets are small (10³–10⁵ short strings);
    * the snippet table is broadcast and the corpus scanned once —
    * map-only + one narrow aggregate, no corpus shuffle. Per-row cost is
    * `snippets × |text|` via `instr`; beyond ~10⁵ snippets the upgrade
    * is a single Aho-Corasick automaton expression over the broadcast
    * pattern set, which makes the scan cost independent of the snippet
    * count.
    */
  // NOTE: null snippets never match (instr null semantics) and empty
  // snippets match EVERY document (instr returns 1) — feed a clean,
  // non-null, non-empty snippet set; the automaton twin
  // [[substringContaminationAC]] rejects such inputs outright.
  def substringContamination(docs: DataFrame, idCol: String,
                             textCol: String, snippets: DataFrame,
                             snippetIdCol: String,
                             snippetCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .crossJoin(broadcast(snippets.select(
        col(snippetIdCol).as("__snip_id"), col(snippetCol).as("__snip"))))
      .filter(instr(col("__text"), col("__snip")) > 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        min(col("__snip_id")).as("first_snippet_id"))

  /** [[substringContamination]] at pattern-set scale: the snippet set is
    * collected once driver-side (it is the BROADCAST-SMALL side by
    * definition — an eval set, not a corpus) and compiled into a single
    * Aho–Corasick automaton ([[graft.expressions.MultiPatternMatches]])
    * that rides the plan as a codegen reference object. One automaton
    * walk per document finds every snippet simultaneously — scan cost
    * O(|text|), independent of the snippet count, where the `instr`
    * join formulation pays O(|text| · snippets) per doc and plans as a
    * nested-loop join. Map-only except the tiny broadcast idx→id map
    * join for the reported snippet id.
    *
    * Output schema and semantics are identical to
    * [[substringContamination]] (the spec asserts row-for-row equality)
    * — this is the same operator with the physical plan you would want
    * at 10⁵ snippets.
    *
    * Precondition: snippet ids and texts must be non-null and texts
    * non-empty (enforced with `require`). A null snippet is silently
    * ignored by `instr` while an empty one matches EVERY document —
    * both degenerate inputs the automaton formulation rejects up front
    * rather than diverging on.
    */
  def substringContaminationAC(docs: DataFrame, idCol: String,
                               textCol: String, snippets: DataFrame,
                               snippetIdCol: String,
                               snippetCol: String): DataFrame = {
    val rows = snippets
      .select(col(snippetIdCol).cast("long"), col(snippetCol).cast("string"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1) && r.getString(1).nonEmpty,
          "substringContaminationAC requires non-null, non-empty " +
            "snippets (an empty snippet would match every document via " +
            "instr but is droppable by the automaton — reject instead " +
            "of diverging)")
        (r.getLong(0), r.getString(1))
      }
      .sortBy(_._1)
    val patterns = rows.map(_._2)
    val m = exprs.multi_pattern_matches(col(textCol), patterns)
    val hits = docs
      .select(col(idCol).as("doc_id"), m.as("__m"))
      .filter(size(col("__m")) > 0)
      // indices ascending + patterns sorted by snippet id ⇒ element 0
      // maps to the lowest matching snippet id
      .select(col("doc_id"), size(col("__m")).cast("long").as("n_hits"),
        col("__m")(0).as("__first_idx"))
    val session = docs.sparkSession
    import session.implicits._
    val idMap = rows.map(_._1).zipWithIndex
      .map { case (id, i) => (i, id) }.toSeq
      .toDF("__first_idx", "first_snippet_id")
    hits.join(broadcast(idMap), Seq("__first_idx"))
      .select("doc_id", "n_hits", "first_snippet_id")
  }

  /** Content-defined chunking: chunk boundaries where the TOKEN's
    * xxhash64 has `maskBits` low zero bits — boundaries depend only on
    * local content, so an insertion or deletion re-chunks ONLY its own
    * neighborhood (fixed-stride chunking, cf. the boilerplate detector,
    * shifts every later chunk and misses all downstream matches). The
    * expected chunk length is `2^maskBits` tokens; fingerprints are md5
    * of the chunk's token span — shared chunks across documents survive
    * arbitrary prefix edits.
    *
    * Scale shape: the per-doc window and chunk aggregation run on
    * narrow (doc_id, position, hash) rows; the token arrays are joined
    * back once per doc for fingerprinting. Window partitions are
    * per-document — bounded by document length, not corpus size.
    * Output positions are 1-based token indices.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                maskBits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mask = (1L << maskBits) - 1
    val th = docs.select(col(idCol).as("doc_id"),
        posexplode(transform(tokens(col(textCol)), t => xxhash64(t)))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("i"), col("h"))
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = th
      .withColumn("f",
        when(col("h").bitwiseAND(mask) === 0, 1).otherwise(0))
      .withColumn("chunk_idx",
        coalesce(sum(col("f")).over(w), lit(0)).cast("long"))
      .groupBy("doc_id", "chunk_idx")
      .agg(min("i").as("start_tok"), count(lit(1)).as("n_toks"))
    val texts = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__toks"))
    chunks.join(texts, Seq("doc_id"))
      .select(col("doc_id"), col("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        col("n_toks"),
        md5(array_join(slice(col("__toks"), col("start_tok").cast("int"),
          col("n_toks").cast("int")), " ")).as("fingerprint"))
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by
    * token-hash bits; sign of the sum sets the output bit. Single
    * fold over the token array — map-only, codegen'd.
    */
  def simHash(text: Column): Column =
    simHashImpl(transform(tokens(text), t => xxhash64(t)))

  /** Actual SimHash fold (kept separate for clarity/testing).
    * Shift amounts must be Scala Ints, so the 64 bit positions are
    * unrolled driver-side into literal arrays.
    */
  private def simHashImpl(hashes: Column): Column = {
    val counts = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map { i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1, lit(1))
            .otherwise(lit(-1))
        }: _*),
        (a, b) => a + b))
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(counts, powers,
        (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxDist` Hamming distance.
    *
    * Blocking (VERDICT r11 #6 — the second-blocking-key playbook
    * applied before the 16-bit pigeonhole became the next 26×): the
    * signature splits into two 32-BIT HALVES; any pair within distance
    * 3 has ≤ 1 error in one half (pigeonhole over 2 halves), so the
    * candidate set is exactly the pairs whose halves match within
    * Hamming 1 — realized as an ASYMMETRIC exact-key join in the
    * multi-index style of Manku, Jain & Das Sarma (WWW'07 §3): the
    * probe side emits each half plus its 32 one-bit flips (33 keys per
    * half, 66 rows/doc — linear), the build side emits the exact half,
    * and an exact 32-bit key match ⟺ half distance ≤ 1. Compared to
    * the former 4×16-bit equality blocks this trades a constant 16.5×
    * row fan-out for a 2¹⁶× sparser key space: bucket populations — and
    * with them the quadratic candidate mass that made the 16-bit
    * scheme superlinear on dense corpora (13.4× at 10× data) — drop to
    * near-duplicate clusters only. Output-identical: both blockings
    * are complete for distance ≤ 3 supersets, and the exact Hamming
    * filter below decides membership.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"simHashPairs: 2-half/1-flip blocking is complete only for " +
        s"maxDist <= 3, got $maxDist")
    val sig = docs.select(col(idCol).as("doc_id"),
      exprs.simhash64(col(textCol)).as("sim"))
    val halves = sig.select(col("doc_id"), col("sim"),
      posexplode(array(
        shiftright(col("sim"), 32).bitwiseAND(lit(0xFFFFFFFFL)),
        col("sim").bitwiseAND(lit(0xFFFFFFFFL)))))
      .withColumnRenamed("pos", "half")
      .withColumnRenamed("col", "hv")
    val flips = (0 until 32).map(b => col("hv").bitwiseXOR(lit(1L << b)))
    val probe = halves.select(col("half"),
      explode(array(col("hv") +: flips: _*)).as("key"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val build = halves.select(col("half"), col("hv").as("key"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))
    probe.join(build, Seq("half", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
