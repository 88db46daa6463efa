package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family over `documents` (SURVEY.md §2, d01–d05) — the
  * standard LLM-training-corpus pipeline: exact hash dedup, n-gram Jaccard
  * ground truth, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every candidate-generation step is a bounded
  * explode→groupBy/join on a short key (shared shingle, LSH band, SimHash
  * band, hyperplane bucket) — never an O(n²) cross join. Signatures are
  * computed with codegen'd higher-order functions (transform/aggregate/
  * zip_with), no Scala UDFs, so the hot path stays in whole-stage codegen.
  */
object Dedup {
  private type Q = (SparkSession, String) => DataFrame

  /** Whitespace-normalized text. */
  private[graft] def norm(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Word 5-gram shingle list (with duplicates), [] for docs under 5
    * tokens. Set semantics (array_distinct) cost O(n²) string compares —
    * kept only as the reference formulation; the hot paths use
    * [[shingleHashList]] over token hashes instead.
    */
  def shingleList(text: Column): Column =
    wordGrams(split(norm(text), " "), 5)

  /** Word n-grams over a token array (with duplicates), [] under n
    * tokens — shared by the shingle builders here and t15's boilerplate
    * grams (which tokenize with their own lowercasing normalizer).
    */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word 5-gram shingle set (distinct). */
  def shingles(text: Column): Column = array_distinct(shingleList(text))

  /** Token hashes (one per whitespace token), native one-pass
    * (graft.functions.Sketches — no token strings materialized).
    */
  def tokenHashes(text: Column): Column =
    graft.functions.Sketches.shingle_hashes(norm(text), 1, distinct = false)

  /** Word 5-gram shingle hashes, native one-pass. Under single-space
    * normalization the token 5-tuple is bijective to the string shingle,
    * so distinct counts and intersections equal the string formulation's
    * (modulo 2^-64 collisions).
    */
  def shingleHashes(text: Column, distinct: Boolean): Column =
    graft.functions.Sketches.shingle_hashes(norm(text), 5, distinct)

  // d01: exact dedup by content hash of normalized text; keeper = min id.
  val d01_exact_dedup: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(norm(col("text"))).as("content_hash"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_docs"))
      .orderBy("content_hash")

  /** (doc_id, n_sh, shingle) exploded shingle table, materialized behind
    * the join-key exchange so the shingle pipeline runs once and both
    * self-join sides read the same shuffle output (ReusedExchange).
    */
  private def explodedShingles(s: SparkSession, d: String): DataFrame = {
    // round-robin spread first: the testdata table is one small parquet
    // file = one input partition, which would serialize the shingle build
    // Long-only pipeline: one native pass builds the distinct window
    // hashes per doc (no token/shingle strings, no lambda re-evaluation
    // to guard against), then explode + join on long keys.
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // spread the 1-file scan
      .select(col("doc_id"), shingleHashes(col("text"), distinct = true).as("hs"))
      .select(col("doc_id"), size(col("hs")).as("n_sh"), explode(col("hs")).as("s"))
      .repartition(col("s"))
  }

  // d02: exact n-gram Jaccard near-dup pairs. Candidates = docs sharing at
  // least one shingle (the shared-shingle join bounds work to colliding
  // keys); intersection counted per pair, union from the carried set sizes.
  // The UNSORTED pair frame is the library surface (`ngramJaccardPairs`)
  // — every internal consumer (d06/d08/d16/d19/d26/d27/d28/t38) feeds it
  // into further joins or full-collapse aggregates, where d02's
  // presentation sort would be a dead global exchange; only the d02 lane
  // itself pays for the ordered readout.
  private[graft] def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    // A shingle held by exactly one doc cannot form a pair, and in a real
    // corpus that is the vast majority of shingle rows. One window count
    // over the already-s-partitioned table drops them before the
    // self-join; the window's within-partition sort on s doubles as the
    // sort-merge join's sort, so this replaces the join's two big sorts
    // with one and shrinks both probe sides to the colliding shingles
    // (measured at sf5: 6.7 s → see SCALE_r07.md).
    val ex = explodedShingles(s, d)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") >= 2)
    val a = ex.select(col("doc_id").as("d1"), col("n_sh").as("n1"), col("s"))
    val b = ex.select(col("doc_id").as("d2"), col("n_sh").as("n2"), col("s"))
    a.join(b, a("s") === b("s") && a("d1") < b("d2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2", "jaccard")
  }

  val d02_ngram_jaccard: Q = (s, d) =>
    ngramJaccardPairs(s, d).orderBy("d1", "d2")

  /** 128-perm MinHash signature from an array of shingle hashes:
    * perm_i(x) = XXH64(x, seed=i), all 128 mins in one native pass
    * (graft.functions.Sketches — the combinator formulation re-scans the
    * array 128× and allocates 128 intermediates per row; measured ~6×
    * slower end-to-end at sf0.1).
    */
  def minhashSig(hs: Column): Column = graft.functions.Sketches.minhash_sig(hs)

  // d03 (rows-only; spec: recall vs d02): MinHash + LSH banding. 32 bands
  // of 4 rows; candidates = pairs colliding on any band hash; verified by
  // signature agreement >= 0.7 (est. Jaccard). At 100 TB the band
  // explode+groupBy keeps candidate generation linear in collisions.
  //
  // CRITICAL perf shape: an expression referenced inside a `transform`
  // lambda is re-evaluated on every lambda iteration (no loop-invariant
  // hoisting in codegen) — so the shingle hashes and the 128-perm
  // signature are each materialized behind an exchange before the next
  // stage references them. Without the barriers this plan recomputes the
  // shingle pipeline 128× and the signature 32× per row (measured 1349 s
  // at sf0.1; 3.5 s with barriers).
  /** d03 with the candidate formulation chosen from the documents
    * relation's file-size statistic (no job): under ~2 MB compressed the
    * banded table (≈6× that, in-memory) fits the broadcast threshold and
    * the plain self-join wins; past it the singleton-bucket semi-cut
    * wins. See [[d03_lsh_with]] for the two formulations; the spec
    * `d03 both candidate formulations produce identical pairs` pins
    * their equivalence.
    */
  val d03_minhash_lsh: Q = (s, d) => {
    val docsBytes = Tables.documents(s, d).queryExecution.optimizedPlan
      .stats.sizeInBytes
    d03_lsh_with(semiCut = docsBytes > (2L << 20))(s, d)
  }

  private[graft] def d03_lsh_with(semiCut: Boolean): Q = (s, d) => {
    // persist, not a second repartition: CollapseRepartition would merge
    // adjacent repartitions and re-inline the signature into the band
    // explode (32x recompute). At cluster scale this is the signature
    // store you would checkpoint anyway.
    //
    // The size(sig) > 0 filter comes AFTER the persist: filtering the
    // lazy plan would let the optimizer push `size(minhash(shingles(
    // text)))` down into the parquet scan as a DataFilter, recomputing
    // the whole 128-perm signature per doc inside the (single-row-group,
    // one-task) scan — measured ~2 s of SERIAL work at sf1, the
    // operator's worst scaling term before the fix. On the cached table
    // the same filter costs one size() per row.
    val sigd = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // spread the 1-file scan
      .select(col("doc_id"), minhashSig(shingleHashes(col("text"), distinct = false)).as("sig"))
      .persist()
      .filter(size(col("sig")) > 0)
    // The band join carries ONLY (band, bh, doc_id) — never the 128-long
    // signature (which would multiply shuffle bytes ~30×). Signatures are
    // re-attached per doc AFTER the candidate pairs are deduped; at bench
    // scale AQE broadcasts the signature store into those joins, at
    // cluster scale they become hash joins on doc_id.
    val banded = sigd.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(31)), j =>
          struct(j.as("band"), xxhash64(slice(col("sig"), j * 4 + 1, lit(4))).as("bh")))).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bh"))
    // Candidate generation has two formulations with a crossover the
    // optimizer cannot find on its own (it would have to restructure the
    // query, not just pick join strategies); `semiCut` picks one —
    // [[d03_minhash_lsh]] decides from the relation's size statistic:
    //  * small corpus (banded ≈ 6× the compressed documents bytes fits
    //    the ~10 MB broadcast threshold): plain banded self-join; AQE
    //    broadcasts one side and nothing is exchanged or persisted.
    //    Forcing the semi-cut here measured +0.9 s at sf0.1 — three
    //    extra stages of fixed overhead for nothing.
    //  * large corpus: persist banded once (like sigd, the band index
    //    you would checkpoint at cluster scale), build the hot-bucket
    //    list with a keys-only groupBy (map-side partial agg → the
    //    shuffle carries ~16 B per distinct bucket), and semi-filter
    //    both self-join sides: a (band,bh) bucket with one member yields
    //    no pair, and in a mostly-unique corpus that is nearly every
    //    bucket. No broadcast hint on the hot list — AQE broadcasts it
    //    when it is actually small (it scales with dup clusters, not
    //    corpus size); on a pathologically duplicate-heavy corpus it
    //    stays a partitioned join instead of a driver-killing forced
    //    broadcast. Measured at sf5: d03 9.4 s → 5.4 s (SCALE_r07.md).
    val pruned =
      if (!semiCut) banded
      else {
        val cached = banded.persist()
        val hot = cached.groupBy("band", "bh")
          .agg(count(lit(1)).as("bdf")).filter(col("bdf") >= 2)
          .select("band", "bh")
        cached.join(hot, Seq("band", "bh"), "leftsemi")
      }
    val a = pruned.select(col("band"), col("bh"), col("doc_id").as("d1"))
    val b = pruned.select(col("band"), col("bh"), col("doc_id").as("d2"))
    a.join(b, Seq("band", "bh")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
      .join(sigd.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(sigd.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("sig1"), col("sig2"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v) / 128.0, 4))
      .filter(col("est_jaccard") >= 0.7)
      .select("d1", "d2", "est_jaccard")
      .orderBy("d1", "d2")
  }

  /** (doc_id, sh): 64-bit SimHash per doc — token hashes materialized
    * behind one exchange, then a single native pass builds the sketch
    * (graft.functions.Sketches).
    */
  def simhashDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // spread the 1-file scan
      .select(col("doc_id"),
        graft.functions.Sketches.simhash64(tokenHashes(col("text"))).as("sh"))
      .persist() // the sketch table feeds 8 band projections

  // d04 (rows-only): SimHash near-dup. Candidates from 5 bands of ~13
  // bits (a pair within hamming distance 4 must agree on >= 1 band);
  // verified exactly with bit_count(xor) <= 4 — the corpus's planted
  // near-dups sit at hamming <= 5 while the random-pair mass starts at
  // 5-6.
  val d04_simhash: Q = (s, d) => {
    val docs = simhashDocs(s, d)
    // 5 bands of 13/13/13/13/12 bits: a pair at hamming <= 4 differs in
    // <= 4 bands (pigeonhole), so >= 1 band matches exactly — the same
    // guarantee the h <= 4 verification cut needs, at 2^13 buckets per
    // band. The previous 8 bands x 8 bits guaranteed h <= 7 (looser than
    // the cut ever uses) at 32x the bucket occupancy: candidates per band
    // are ~n^2/2^width for a random corpus, ~1e9 rows at sf5's 250k docs
    // vs ~18M here. The output set is provably identical — both bandings
    // collide every pair the h <= 4 filter keeps (BandingPigeonholeSpec).
    val widths = Seq(13, 13, 13, 13, 12)
    val offs = widths.scanLeft(0)(_ + _)
    val bands = array(widths.indices.map(j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("sh"), offs(j))
          .bitwiseAND((1L << widths(j)) - 1).as("bv"))): _*)
    val banded = docs.select(col("doc_id"), col("sh"), explode(bands).as("b"))
      .select(col("doc_id"), col("sh"), col("b.band"), col("b.bv"))
    val a = banded.select(col("band"), col("bv"), col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = banded.select(col("band"), col("bv"), col("doc_id").as("d2"), col("sh").as("sh2"))
    a.join(b, Seq("band", "bv")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("sh1"), col("sh2")).distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= 4)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }

  /** Random-hyperplane LSH buckets: 8 tables × `planes` sign bits
    * (default 4 — the spec-scale width; d05 widens it with corpus size
    * via [[adaptivePlanes]]), one native pass
    * (graft.functions.Sketches). Hyperplane weights are ±1 derived from
    * XXH64(dim + 10007·(t·planes+p)) — fully deterministic, no stored
    * model. Multi-table banding recovers recall lost to a single short
    * code. Returns array<int>; index = table, value = bucket code.
    */
  def hyperplaneBuckets(emb: Column, planes: Int = 4): Column =
    graft.functions.Sketches.hyperplane_lsh(emb, 8, planes)

  /** Hyperplane code width for a corpus of ~`estRows` vectors:
    * clamp(4, 28, ceil(log2(estRows / 64))) — holds MEAN bucket
    * occupancy near 64 as the corpus grows. With a FIXED width the
    * per-table bucket count is a constant, so occupancy — and the
    * banded candidate self-join — grows as n²: measured as a transient
    * ~70 GB shuffle spill at sf5 (40 k vectors into 16 buckets/table)
    * inside d10. Adaptive width keeps candidates ≈ tables·n·32,
    * linear in n.
    *
    * Recall under widening: at the production SemDeDup threshold
    * (cos ≥ 0.99, per-plane collision p = 1 − θ/π ≈ 0.955) eight
    * tables of 24 planes still recall ≈ 0.96 of true pairs; the
    * synthetic corpus's 0.45–0.51 cosine tail (p ≈ 2/3) loses recall
    * as planes grow — at θ ≈ 60° no hyperplane family is both
    * sub-quadratic and high-recall. Hence the recall spec gates at the
    * 4-plane scale (where behavior is byte-identical) and the scale
    * evidence gates the candidate count.
    */
  private[graft] def planesForRows(estRows: Long): Int = {
    val x = math.max(estRows / 64L, 1L)
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(x - 1, 0L))
    math.min(28, math.max(4, ceilLog2))
  }

  /** [[planesForRows]] driven by the embeddings relation's size
    * statistic (no job — same idiom as d03's formulation choice) at
    * ~300 B per compressed 64-float parquet row.
    */
  private[graft] def adaptivePlanes(s: SparkSession, d: String): Int = {
    val bytes = Tables.embeddings(s, d).queryExecution.optimizedPlan
      .stats.sizeInBytes
    planesForRows(bytes.min(BigInt(Long.MaxValue)).toLong / 300L)
  }

  // d05 (rows-only): embedding-cosine near-dup inside hyperplane-LSH
  // buckets. Threshold 0.45 is calibrated to the synthetic corpus (its
  // max off-diagonal cosine is ~0.51; a production corpus would use
  // ~0.99). Exact cosine verified only inside colliding buckets.
  //
  // Shuffle discipline (same as d03's band join): the 8-table candidate
  // join and the pair `.distinct()` carry ONLY (tbl, bucket, vec_id) /
  // (v1, v2) — never the 64-float embeddings, which would multiply
  // shuffle bytes ~8× at scale. Embeddings re-attach AFTER the dedup via
  // two id joins (AQE broadcasts them at bench scale; hash joins on
  // vec_id at cluster scale). PipelineSpec asserts no shuffle exchange
  // in the executed plan carries an embedding column.
  val d05_embed_neardup: Q = (s, d) => {
    val planes = adaptivePlanes(s, d)
    val buckets = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(hyperplaneBuckets(col("embedding"), planes)).as(Seq("tbl", "bucket")))
    val a = buckets.select(col("tbl"), col("bucket"), col("vec_id").as("v1"))
    val b = buckets.select(col("tbl"), col("bucket"), col("vec_id").as("v2"))
    val cand = a.join(b, Seq("tbl", "bucket")).filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2")).distinct()
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), Vec.norm(col("embedding")).as("nrm"))
    cand
      .join(e.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1")), "v1")
      .join(e.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2")), "v2")
      .withColumn("cos", round(Vec.cosineWithNorms(
        Vec.dot(col("e1"), col("e2")), col("n1"), col("n2")), 4))
      .filter(col("cos") >= 0.45)
      .select("v1", "v2", "cos")
      .orderBy("v1", "v2")
  }

  /** Min-label-propagation connected components over an undirected pair
    * set (d1, d2) → (cluster, doc_id), cluster = component-min doc_id.
    * `pointerJump = false` is pure propagation — O(diameter) rounds, each
    * one join + one min-agg on the same key partitioning (fine for
    * near-dup clusters, whose diameter is a few hops). `pointerJump =
    * true` adds a rep ← rep(rep) contraction per round (one self-join on
    * the label table; reps are nodes, so every rep has a row), halving
    * pointer depth for O(log n) rounds — the large-star/small-star shape
    * a 100 TB link graph needs. Invariant for both: rep(u) only ever
    * decreases and always names a node of u's own component, so the
    * fixpoint — every edge label-equal and rep(rep) = rep — is exactly
    * the component minimum. Throws if the round bound is hit before the
    * fixpoint. The final labels stay cached (the caller consumes them);
    * pairs/edges caches are dropped on exit.
    *
    * Each round's label table is localCheckpoint-ed, not merely persisted:
    * `labels` enters the round twice (the propagation join and the union)
    * and `l1` twice more in the pointer-jump self-join, so without lineage
    * truncation the logical plan DOUBLES per round — cached data, 2^rounds
    * plan. At sf5, d10's component graph needed enough rounds to push the
    * plan string past 2 GB and stall the dump on plan serialization alone.
    */
  private def ccClusters(pairsIn: DataFrame, pointerJump: Boolean,
      maxIter: Int): DataFrame =
    ccClustersWithCache(pairsIn, pointerJump, maxIter)._1

  /** Public CC entry for cross-family lanes (v34): min-label connected
    * components over an undirected (d1, d2) pair frame.
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    ccClusters(pairs, pointerJump = false, maxIter = 30)

  /** ccClusters plus the underlying materialized label table, for callers
    * that re-materialize the output (d09's localCheckpoint) and want the
    * handle to the blocks beneath the returned SELECT. The per-round
    * tables are localCheckpoint-ed, so `unpersist()` on the handle is
    * best-effort — orphaned round blocks are released by the
    * ContextCleaner once unreferenced.
    */
  private def ccClustersWithCache(pairsIn: DataFrame, pointerJump: Boolean,
      maxIter: Int): (DataFrame, DataFrame) = {
    val pairs = pairsIn.persist()
    val edges = pairs.union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst").persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("rep", col("node")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("rep"))
      val l1 = labels.select("node", "rep").union(prop)
        .groupBy("node").agg(min("rep").as("rep"))
      val stepped =
        if (!pointerJump) l1
        else l1.as("a")
          .join(l1.select(col("node").as("jn"), col("rep").as("jrep")),
            col("a.rep") === col("jn"))
          .select(col("a.node").as("node"),
            least(col("a.rep"), col("jrep")).as("rep"))
      val next = stepped.localCheckpoint()
      changed = next.join(labels.withColumnRenamed("rep", "old"), "node")
        .filter(col("rep") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    pairs.unpersist()
    edges.unpersist()
    if (changed > 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"ccClusters(pointerJump=$pointerJump): not converged in $iter rounds" +
          (if (pointerJump) "" else " — switch to pointer-jumping d07"))
    }
    (labels.select(col("rep").as("cluster"), col("node").as("doc_id")), labels)
  }

  // d06: duplicate-cluster materialization — connected components over
  // the exact near-dup pairs (d02), i.e. the table a dedup job actually
  // joins against to drop all-but-one copy per cluster. Pure min-label
  // propagation: near-dup components have diameter ≤ a few hops, so 2–4
  // rounds converge. Oracle: DuckDB recursive CTE over the identical
  // pair set.
  val d06_dup_clusters: Q = (s, d) =>
    ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
      pointerJump = false, maxIter = 20)
      .orderBy("cluster", "doc_id")

  // d07: the same clustering by min-label propagation + POINTER JUMPING —
  // the web-scale path §4 promises (O(log n) rounds instead of
  // O(diameter)). Same output, same recursive-CTE oracle as d06.
  val d07_cc_pointer_jumping: Q = (s, d) =>
    ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
      pointerJump = true, maxIter = 30)
      .orderBy("cluster", "doc_id")

  // d08: END-TO-END dedup keep-list — the artifact a corpus dedup job
  // actually ships: every document tagged with its duplicate cluster,
  // keeper = the cluster's min doc_id (which IS the min-label rep), keep
  // = this doc is its cluster's keeper (or was never near-duplicated).
  // Composition: near-dup pairs → CC (pointer jumping) → left join back
  // to documents. The pair generator here is the exact d02, so the
  // recursive-CTE oracle verifies the WHOLE pipeline end-to-end; at
  // 100 TB you swap in d03's MinHash-LSH pairs — identical (d1, d2)
  // interface, identical downstream plan (PipelineSpec checks the d03
  // variant agrees on ≥90% of drops).
  val d08_dedup_keeplist: Q = (s, d) => {
    val labels = ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
      pointerJump = true, maxIter = 30)
    keeplist(Tables.documents(s, d), labels)
  }

  /** d08's keep flags for composition consumers (t51/t52) — same
    * pairs → CC → join-back pipeline, WITHOUT the lane's presentation
    * sort (a dead global exchange under the consumer's next join).
    */
  private[graft] def dedupKeepFlags(s: SparkSession, d: String): DataFrame =
    keeplistRaw(Tables.documents(s, d),
      ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
        pointerJump = true, maxIter = 30))

  /** (doc_id, cluster, keep) for every document given CC labels —
    * UNSORTED: the composition consumers (t51/t52) feed this into
    * further joins/aggregates where the presentation sort below would
    * be a dead global exchange (guide §2.4 — r17; the d02 pairs-vs-lane
    * precedent applied to the keeplist).
    */
  def keeplistRaw(documents: DataFrame, labels: DataFrame): DataFrame =
    documents.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"),
        (col("doc_id") === coalesce(col("cluster"), col("doc_id"))).as("keep"))

  /** (doc_id, cluster, keep) for every document given CC labels. */
  def keeplist(documents: DataFrame, labels: DataFrame): DataFrame =
    keeplistRaw(documents, labels).orderBy("doc_id")

  /** d08 over d03's MinHash-LSH pairs — the 100 TB formulation
    * (spec-checked against the exact keep-list, not oracle'd).
    */
  def keeplistLsh(s: SparkSession, d: String): DataFrame =
    keeplist(Tables.documents(s, d),
      ccClusters(d03_minhash_lsh(s, d).select(col("d1"), col("d2")),
        pointerJump = true, maxIter = 30))

  // d10 (rows-only; spec: keeper structure + agreement with brute-force
  // pairs): SEMANTIC dedup keep-list — the embedding-space counterpart
  // of d08 (SemDeDup shape): near-duplicate pairs from the bucketed
  // cosine search (d05: hyperplane-LSH candidates, ids-only shuffles),
  // connected components, keeper = min vec_id per cluster, joined back
  // to every embedding row. At a real corpus threshold (~0.99) this
  // drops paraphrase/translation duplicates exact text hashing misses.
  val d10_semantic_keeplist: Q = (s, d) => {
    val labels = ccClusters(
      d05_embed_neardup(s, d).select(col("v1").as("d1"), col("v2").as("d2")),
      pointerJump = true, maxIter = 30)
    Tables.embeddings(s, d).select(col("vec_id"))
      .join(labels.select(col("cluster"), col("doc_id").as("vec_id")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"),
        (col("vec_id") === coalesce(col("cluster"), col("vec_id"))).as("keep"))
      .orderBy("vec_id")
  }

  /** Exploded shingle table of an arbitrary document set. */
  private def explodedShinglesOf(docs: DataFrame, spread: Int): DataFrame =
    docs.repartition(spread)
      .select(col("doc_id"), shingleHashes(col("text"), distinct = true).as("hs"))
      .select(col("doc_id"), size(col("hs")).as("n_sh"), explode(col("hs")).as("s"))

  // d09: INCREMENTAL keep-list maintenance — the continuous-ingestion
  // shape of d08: documents arrive in batches; each batch's candidate
  // pairs come from ONE new-vs-accumulated shingle join (never a full
  // corpus self-join), and the existing cluster assignment enters the
  // next CC round as pseudo-edges (rep ↔ node preserves connectivity),
  // so components merge across batches without recomputing history. The
  // join condition admits each ≥1-new pair exactly once: old–new pairs
  // in their only orientation, new–new pairs only as (lo, hi). After the
  // last batch the keep-list must equal the batch d08 — same recursive-
  // CTE oracle, which is the equivalence proof incremental = batch.
  val d09_incremental_keeplist: Q = (s, d) => incrementalKeeplist(s, d)

  /** Driver-held incremental dedup state — the engine under d09 (batch
    * loop) and d11/s17 (Structured Streaming foreachBatch). Carries the
    * CC labels AND the accumulated exploded-shingle store across batches
    * as PARQUET state tables under a scratch dir (snapshotTwin's
    * file-backed discipline). Each advance lands ONLY its own batch's
    * shingles — total shingle work stays O(N), not O(B·N) — and the
    * merged label table, then re-reads them, so recovery from executor
    * loss is a task retry re-reading files. The previous design held the
    * store as eager `localCheckpoint()` unions: replication-1,
    * memory-resident RDD blocks whose lineage CANNOT be re-derived — at
    * sf5 multi-JVM one executor OOM during the candidate join lost the
    * blocks and killed the stream with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    * on every attempt (r16 optimization, guide §5: on a 100 TB cluster
    * executor churn is routine; inter-batch state must be durable and
    * off-heap). The accumulated store is ONE multi-path parquet read,
    * never a per-batch union chain (the r15 B-ary-union analyzer
    * lesson); batch membership re-derives from the stored batch tag.
    * `onBatch(newEx, newPairs)` exposes the only shingle table computed
    * in an advance and the candidate-pair frame (whose plan must be free
    * of shingle computation and document scans — spec-asserted; its only
    * scans are parquet reads of this engine's state dir).
    */
  final class IncrementalDedup(spread: Int) {
    private[ops] var labels: DataFrame = null
    private var exPaths: Vector[String] = Vector.empty
    var batchesSeen: Int = 0
    /** Durable inter-batch state root (what a production incremental job
      * persists between runs); reaped at JVM exit, and must outlive the
      * lazy keep-list the caller consumes.
      */
    private[graft] val stateDir = graft.sources.SourceSinks.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft_incdedup_"))

    def advance(newDocs: DataFrame,
        onBatch: (DataFrame, DataFrame) => Unit = (_, _) => ()): Unit = {
      batchesSeen += 1
      val ss = newDocs.sparkSession
      // the ONLY shingle computation this batch — the new documents,
      // landed once as this batch's durable store; `b` tags the batch so
      // the multi-path read below re-identifies new vs accumulated rows
      val exPath = stateDir.resolve(f"ex_b$batchesSeen%04d").toString
      explodedShinglesOf(newDocs, spread)
        .withColumn("b", lit(batchesSeen)).write.parquet(exPath)
      exPaths :+= exPath
      val newEx = ss.read.parquet(exPath).drop("b")
      val seenEx = ss.read.parquet(exPaths: _*)
        .withColumn("is_new", col("b") === batchesSeen)
      // both sides scan the same file-backed store (self-join lineage):
      // alias every column apart so the shingle equi-join keys get
      // distinct exprIds (a("s") === b("s") would collapse to a
      // trivially-true predicate)
      val a = seenEx.select(col("doc_id").as("da"), col("n_sh").as("na"),
        col("s").as("sa"), col("is_new").as("an"))
      val b = newEx.select(col("doc_id").as("db"), col("n_sh").as("nb"),
        col("s").as("sb"))
      val newPairs = a.join(b,
          col("sa") === col("sb") && col("da") =!= col("db") &&
            !(col("an") && col("da") > col("db")))
        .groupBy(
          least(col("da"), col("db")).as("d1"),
          greatest(col("da"), col("db")).as("d2"),
          when(col("da") < col("db"), col("na")).otherwise(col("nb")).as("n1"),
          when(col("da") < col("db"), col("nb")).otherwise(col("na")).as("n2"))
        .agg(count(lit(1)).as("inter"))
        .filter(round(col("inter") / (col("n1") + col("n2") - col("inter")), 6) >= 0.8)
        .select(col("d1"), col("d2"))
      onBatch(newEx, newPairs)
      // the existing assignment enters the next CC as pseudo-edges
      // (rep ↔ node preserves connectivity across batches)
      val allPairs =
        if (labels == null) newPairs
        else newPairs.union(
          labels.select(col("cluster").as("d1"), col("doc_id").as("d2"))
            .filter(col("d1") =!= col("d2")))
      // landing the label table truncates the logical plan at the batch
      // boundary (without it each batch's CC nests the previous batch's
      // full round-by-round plan tree and ANALYSIS time compounds) AND
      // makes the inter-batch state durable: a parquet read re-derives
      // from disk after executor loss, where the former localCheckpoint
      // blocks died with their executor. The CC-internal cache is
      // released once the write has materialized from it; the previous
      // version is folded into this one, so it retires immediately.
      val (out, cached) = ccClustersWithCache(allPairs, pointerJump = true, maxIter = 30)
      val lblPath = stateDir.resolve(f"labels_v$batchesSeen%04d")
      out.write.parquet(lblPath.toString)
      cached.unpersist()
      labels = ss.read.parquet(lblPath.toString)
      // retire superseded versions ONE BATCH LATE (keep vN and v(N-1),
      // delete v(N-2)): a lazy frame handed out by keeplistFor()/onBatch
      // before this advance still reads v(N-1) — deleting it here would
      // fail that frame with FileNotFoundException if the caller
      // consumes it after the advance (r16 ADVICE: the old checkpoint
      // blocks stayed readable until GC; parquet state must not narrow
      // that lifetime). Disk stays bounded at ≤2 label versions.
      if (batchesSeen > 2)
        graft.sources.SourceSinks.deleteDir(
          stateDir.resolve(f"labels_v${batchesSeen - 2}%04d"))
    }

    def keeplistFor(documents: DataFrame): DataFrame = keeplist(documents, labels)
  }

  /** The d09 engine: drive [[IncrementalDedup]] over doc_id % B batches. */
  def incrementalKeeplist(s: SparkSession, d: String, B: Int = 3,
      onBatch: (Int, DataFrame, DataFrame) => Unit = (_, _, _) => ()): DataFrame = {
    val docs = Tables.documents(s, d).persist()
    val state = new IncrementalDedup(s.sparkContext.defaultParallelism)
    for (batch <- 0 until B)
      state.advance(docs.filter(col("doc_id") % B === batch),
        (ex, pairs) => onBatch(batch, ex, pairs))
    val out = state.keeplistFor(docs)
    docs.unpersist()
    out
  }

  // d11: STREAMING keep-list maintenance — d09's engine as a Structured
  // Streaming job: the corpus lands as per-batch files (a continuous
  // ingest's arrival layout, modification times ascending), a file stream
  // with maxFilesPerTrigger=1 delivers one batch per micro-batch, and
  // foreachBatch advances the SAME checkpointed-state engine (candidate
  // join + CC label merge) the batch loop uses. The final keep-list must
  // equal batch d08 — same recursive-CTE oracle as d08/d09.
  val d11_streaming_keeplist: Q = (s, d) => streamingKeeplist(s, d)

  def streamingKeeplist(s: SparkSession, d: String, B: Int = 3): DataFrame = {
    val docs = Tables.documents(s, d).persist()
    val dir = java.nio.file.Files.createTempDirectory("graft_d11_")
    try {
      // arrival is made explicit: each batch file is landed only after
      // the previous one has drained to a completed micro-batch (mtime
      // ordering is NOT a contract of the file source — s11 observed it
      // breaking — so the loop below is the deterministic arrival plan)
      def land(b: Int): Unit =
        graft.sources.SourceSinks.landSingleParquet(
          docs.filter(col("doc_id") % B === b),
          dir.resolve(f"batch_$b%02d.parquet"))
      val state = new IncrementalDedup(s.sparkContext.defaultParallelism)
      val stream = s.readStream.schema(docs.schema).parquet(dir.toString)
      // explicit function value: foreachBatch has Scala/Java overloads
      val onMicroBatch: (DataFrame, Long) => Unit =
        (batchDf, _) => if (!batchDf.isEmpty) state.advance(batchDf)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch(onMicroBatch)
        .queryName(s"graft_d11_${System.nanoTime()}").start()
      try {
        for (b <- 0 until B) { land(b); q.processAllAvailable() }
      } finally q.stop()
      state.keeplistFor(docs)
    } finally {
      graft.sources.SourceSinks.deleteDir(dir)
      docs.unpersist()
    }
  }

  // d12: benchmark DECONTAMINATION — the cross-set containment check a
  // pre-training pipeline runs before dedup ships (GPT-3/Pile style):
  // flag every training document sharing ≥1 distinct word-8-gram with
  // any held-out eval document. NOT a self-join: the eval side is tiny
  // (here doc_id % 17 == 0), so its exploded 8-gram table broadcasts /
  // hash-joins against the training shingles — work is linear in the
  // training corpus at any scale. Same native one-pass shingle hashes as
  // d02 (8-token windows; the token-tuple ↔ string-shingle bijection
  // argument from shingleHashes applies).
  /** d12's train-vs-eval shared-8-gram join (train_id, eval_id, s8
    * matches) — the contamination evidence both the d12 report and the
    * composition consumers derive from. */
  private def contaminationHits(s: SparkSession, d: String): DataFrame = {
    val spread = s.sparkContext.defaultParallelism
    def shingled(df: DataFrame, idName: String): DataFrame =
      df.repartition(spread)
        .select(col("doc_id").as(idName),
          explode(graft.functions.Sketches.shingle_hashes(
            norm(col("text")), 8, distinct = true)).as("s8"))
    val docs = Tables.documents(s, d)
    val train = shingled(docs.filter(col("doc_id") % 17 =!= 0), "train_id")
    val eval8 = shingled(docs.filter(col("doc_id") % 17 === 0), "eval_id")
    train.join(eval8, "s8")
  }

  val d12_decontamination: Q = (s, d) =>
    contaminationHits(s, d)
      .groupBy(col("train_id"))
      .agg(countDistinct(col("s8")).as("n_shared_8grams"),
        countDistinct(col("eval_id")).as("n_eval_docs_hit"))
      .orderBy("train_id")

  /** The contaminated train ids ONLY — what t52's funnel flag actually
    * consumes (r17, guide §1.2 "don't compute things you throw away"):
    * skips d12's two countDistinct aggregates and presentation sort,
    * whose output t52 immediately reduced to distinct ids anyway. Same
    * membership by construction (d12's group keys ARE these ids).
    */
  private[graft] def contaminatedTrainIds(s: SparkSession, d: String): DataFrame =
    contaminationHits(s, d).select(col("train_id")).distinct()

  // d13: exact-substring CONTAINMENT dedup — documents whose entire
  // (whitespace-normalized) text appears verbatim inside another document:
  // the "page B = page A plus a footer" shape the suffix-array substring
  // dedup family targets, bounded to whole-document containment so the
  // answer is oracle-checkable. Candidates: if inner ⊆ outer then inner's
  // FIRST 20-char gram occurs somewhere in outer, so ONE hash join of
  // inner anchor hashes against the outer docs' distinct 20-gram hashes
  // finds every candidate — ids and 64-bit hashes only through the
  // shuffle (the d05 discipline); texts re-attach by id for the exact
  // contains() verify, which also clears hash collisions. Dropped doc →
  // its minimum-id container; equal texts keep the min id (d01's rule).
  val d13_containment: Q = (s, d) => {
    val n = Tables.documents(s, d)
      .select(col("doc_id"), norm(col("text")).as("s"))
    val anchors = n.filter(length(col("s")) >= 20)
      .select(col("doc_id").as("inner_id"),
        xxhash64(substring(col("s"), 1, 20)).as("gh"))
    val outerGrams = n
      .select(col("doc_id").as("outer_id"),
        explode(when(length(col("s")) >= 20,
          array_distinct(transform(sequence(lit(1), length(col("s")) - 19),
            i => xxhash64(col("s").substr(i, lit(20))))))
          .otherwise(array().cast("array<long>"))).as("gh"))
    val cand = anchors.join(outerGrams, "gh")
      .filter(col("inner_id") =!= col("outer_id"))
      .select("inner_id", "outer_id").distinct()
    val confirmed = cand
      .join(n.select(col("doc_id").as("inner_id"), col("s").as("inner_s"),
        length(col("s")).as("il")), "inner_id")
      .join(n.select(col("doc_id").as("outer_id"), col("s").as("outer_s"),
        length(col("s")).as("ol")), "outer_id")
      .filter(col("outer_s").contains(col("inner_s")) &&
        (col("il") < col("ol") ||
          (col("il") === col("ol") && col("inner_id") > col("outer_id"))))
    confirmed.groupBy(col("inner_id").as("doc_id"))
      .agg(min("outer_id").as("container_id"))
      .orderBy("doc_id")
  }

  /** d14 engine: returns (flagged batch, (flagged, truly, falsePos))
    * — exposed so the spec can pin the error structure.
    */
  def bloomDedupRun(s: SparkSession, d: String): (DataFrame, (Long, Long, Long)) = {
    // persist the normalized-hash projection: it feeds the count, the
    // bloom aggregate, the ground-truth join, AND the returned frame —
    // without the barrier each consumer re-normalizes the corpus
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), xxhash64(norm(col("text"))).as("h"))
      .persist()
    // "history" = docs before the batch boundary; "batch" = the rest
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val n = history.count()
    // the compact membership sketch: a distributed bloom_filter aggregate
    // collected to one bitset (a few GB at 100 TB corpus scale vs a join
    // against the full history), broadcast to the batch-side executors
    val bloom = history.stat.bloomFilter("h", math.max(n, 1), 0.01)
    val bc = s.sparkContext.broadcast(bloom)
    import s.implicits._
    val flagged = batch.select(col("doc_id"), col("h")).as[(Long, Long)]
      .mapPartitions { it =>
        val f = bc.value
        it.map { case (id, h) => (id, h, f.mightContain(h)) }
      }
      .toDF("doc_id", "h", "maybe_seen")
    // ground truth for the stats: which batch hashes truly are in history
    val truth = flagged.join(
      history.select(col("h"), lit(true).as("truly_seen")).distinct(),
      Seq("h"), "left")
      .na.fill(false, Seq("truly_seen"))
    val agg = truth.agg(
      sum(col("maybe_seen").cast("long")).as("flagged"),
      sum(col("truly_seen").cast("long")).as("truly"),
      sum((col("maybe_seen") && !col("truly_seen")).cast("long")).as("false_pos"),
      sum((!col("maybe_seen") && col("truly_seen")).cast("long")).as("false_neg"))
      .head()
    require(agg.getLong(3) == 0, "bloom filter produced a false negative")
    // materialize the flagged frame EXECUTOR-side before releasing the
    // cache it descends from — the frame is per-document, so a driver
    // collect here would be the c33 anti-pattern (O(batch) rows through
    // the driver); the eager localCheckpoint keeps it distributed
    val out = truth.select("doc_id", "maybe_seen", "truly_seen")
      .orderBy("doc_id").localCheckpoint(true)
    docs.unpersist()
    (out, (agg.getLong(0), agg.getLong(1), agg.getLong(2)))
  }

  // d14 (rows-only; spec: zero false negatives, bounded false positives):
  // BLOOM-FILTER dedup membership — the incremental-ingest primitive at
  // 100 TB: instead of joining each arriving batch against the full
  // accumulated corpus (d09's shingle store), carry a fixed-size bloom
  // sketch of the history's content hashes and test membership MAP-SIDE.
  // No false negatives ever (every true duplicate is flagged); false
  // positives bounded by the configured fpp and resolved by a join only
  // for the flagged sliver. The sketch is built by Spark's distributed
  // bloom aggregate and broadcast once.
  val d14_bloom_membership: Q = (s, d) => bloomDedupRun(s, d)._1

  // t17 (oracle: d08's recursive-CTE keep-list ⊕ d12's contamination
  // join ⊕ t13's sampling rule composed in ONE SQL query): CORPUS
  // BUILD — the end-to-end training-corpus construction lane, the
  // LLM-pipeline twin of c37's daemon composition: near-dup dedup
  // keep-list (d08) → eval-split holdout + benchmark decontamination
  // (d12) → per-source mix with epoch upsampling (t13), with per-source
  // drop accounting at every stage. A hash match proves no composition
  // seam (flag precedence, eval exclusion, sampling over survivors
  // only) loses or double-counts a document.
  val t17_corpus_build: Q = (s, d) =>
    // r17: unsorted keep flags (the sort was dead under the join inside
    // corpusBuildFrom — guide §2.4)
    corpusBuildFrom(s, d, dedupKeepFlags(s, d).select(col("doc_id"), col("keep")))

  // s17: STREAMING corpus build — t17 with its dedup verdicts maintained
  // by the d11 Structured-Streaming keep-list engine instead of the d08
  // batch pass (keep verdicts are mutable while near-dups arrive — a
  // cluster merge can flip an earlier keeper — so the composition runs
  // over the FINAL streamed labels, exactly as a production pipeline
  // closes its corpus snapshot after the ingest drains). Completes the
  // batch↔streaming twin set: apply/c13, keep-list/d11, view/s14, JDBC
  // tail/s15, index/s16, corpus/s17. Same oracle as t17: a hash match
  // proves the streamed state composes seam-free.
  val s17_streaming_corpus: Q = (s, d) =>
    corpusBuildFrom(s, d, streamingKeeplist(s, d).select(col("doc_id"), col("keep")))

  private def corpusBuildFrom(s: SparkSession, d: String, kl: DataFrame): DataFrame = {
    val docs = Tables.documents(s, d)
    // r17: ids-only contamination surface (see contaminatedTrainIds) —
    // d12's countDistinct report aggregates were dead weight here
    val contam = contaminatedTrainIds(s, d)
      .select(col("train_id").as("doc_id"))
      .withColumn("contam", lit(true))
    val idx = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val rate = when(idx % 4 === 0, 150L).when(idx % 4 === 1, 100L)
      .when(idx % 4 === 2, 50L).otherwise(20L)
    val pct = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long"), lit(100L))
    docs
      .filter(col("doc_id") % 17 =!= 0) // the eval split never trains
      .join(kl, "doc_id") // dedup verdict (computed over the FULL corpus)
      .join(contam, Seq("doc_id"), "left")
      .withColumn("contam", coalesce(col("contam"), lit(false)))
      .withColumn("surv", col("keep") && !col("contam"))
      .withColumn("n_tokens", size(split(lower(norm(col("text"))), " ")))
      .withColumn("rate", rate)
      .withColumn("n_copies", when(col("surv"),
        (col("rate") / 100L).cast("long") + (pct < col("rate") % 100).cast("long"))
        .otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_candidates"),
        sum((!col("keep")).cast("long")).as("n_dup_dropped"),
        sum((col("keep") && col("contam")).cast("long")).as("n_contam_dropped"),
        sum(col("surv").cast("long")).as("n_docs"),
        sum("n_copies").as("n_emitted"),
        sum(col("n_copies") * col("n_tokens")).as("emitted_tokens"))
      .orderBy("source")
  }

  /** URL canonicalization (pure codegen'd string/array expressions):
    * lowercase scheme+host, http→https, drop default :80/:443 ports,
    * strip fragments, trim trailing slashes (bare root → "/"), drop
    * utm_* / ref / fbclid tracking params, sort surviving params.
    * Exposed so the d15 operator and the perturbation-sweep spec share
    * one definition.
    */
  def canonicalizeUrl(rawUrl: Column): Column = {
    val noFrag = regexp_replace(rawUrl, "#.*$", "")
    val hostport = lower(regexp_extract(noFrag, "^[a-zA-Z]+://([^/?#]*)", 1))
    val host = regexp_replace(hostport, ":(80|443)$", "")
    val pathq = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?#]*(.*)$", 1)
    val path0 = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", "/").otherwise(path0)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => !(p.rlike("^(utm_[^=]*|ref|fbclid)(=|$)") || (p === "")))), "&")
    concat(lit("https://"), host, path,
      when(params === "", "").otherwise(concat(lit("?"), params)))
  }

  // d15: URL canonicalization dedup — the step a crawl-derived corpus
  // runs BEFORE content dedup (CommonCrawl-style pipelines drop >20% of
  // fetches as URL-level re-crawls). Eight deterministic raw-URL variants
  // are planted per logical page (doc_id/8): host/scheme case, http→https,
  // default :80/:443 ports, trailing slash, utm_*/ref tracking params,
  // fragments, and query-parameter order. Canonicalization is pure
  // codegen'd string/array expressions — lowercase scheme+host, drop
  // default ports, strip fragments, drop tracking params, sort surviving
  // params, trim trailing slashes — then an exact groupBy on the
  // canonical URL (d01's shuffle shape: one hash aggregation on a short
  // key, map-side partials; at 100 TB this is the cheapest dedup pass
  // and runs first to shrink everything downstream). Oracle: the same
  // algorithm in DuckDB SQL (list_filter/list_sort over split params).
  val d15_url_dedup: Q = (s, d) => {
    val page = (col("doc_id") / 8).cast("long")
    val v = pmod(col("doc_id"), lit(8))
    val base = concat(lit("https://www.example.com/docs/"), page)
    val raw = when(v === 0, base)
      .when(v === 1, concat(lit("HTTPS://WWW.EXAMPLE.COM/docs/"), page))
      .when(v === 2, concat(lit("http://www.example.com:80/docs/"), page))
      .when(v === 3, concat(lit("https://www.example.com:443/docs/"), page, lit("/")))
      .when(v === 4, concat(base, lit("?utm_source=feed&utm_campaign=mix")))
      .when(v === 5, concat(base, lit("#section-2")))
      .when(v === 6, concat(base, lit("?b=2&a=1")))
      .otherwise(concat(base, lit("?a=1&b=2&ref=tw")))
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw_url"))
      .withColumn("canonical_url", canonicalizeUrl(col("raw_url")))
      .groupBy(col("canonical_url"))
      .agg(min("doc_id").as("keeper_id"),
        count(lit(1)).as("n_fetches"),
        countDistinct(col("raw_url")).as("n_raw_forms"))
      .orderBy("canonical_url")
  }

  // d16 (rows-only; spec: ≡ independent recompute, recall gate): dedup
  // pipeline evaluation report — precision/recall/F1 of the shipped
  // MinHash-LSH candidate pairs (d03) against the exact Jaccard ground
  // truth (d02), as a first-class operator (v16's twin for the dedup
  // family: the scoreboard a curation pipeline keeps next to its dedup
  // config). The pair sets are compared DISTRIBUTED — one inner join +
  // three counts; only three scalars reach the driver, so the report
  // costs the same at 100 TB as the lanes it audits.
  val d16_dedup_eval: Q = (s, d) => {
    import s.implicits._
    // ONE action: a full-outer join on the pair key feeds a single
    // three-way conditional count, so the expensive d02/d03 DAGs execute
    // exactly once each (round-8 verdict: the previous three-action shape
    // ran both lanes twice — the "costs the same at 100 TB as the lanes
    // it audits" claim was off by 2×; a spec pins executions via x06's
    // QueryExecutionListener).
    val exact = ngramJaccardPairs(s, d)
      .select(col("d1"), col("d2"), lit(1).as("in_exact"))
    val approx = d03_minhash_lsh(s, d)
      .select(col("d1"), col("d2"), lit(1).as("in_approx"))
    val counts = exact.join(approx, Seq("d1", "d2"), "full_outer")
      .agg(count(col("in_exact")).as("n_exact"),
        count(col("in_approx")).as("n_approx"),
        count(when(col("in_exact").isNotNull && col("in_approx").isNotNull,
          1)).as("n_hit"))
      .head()
    val nExact = counts.getLong(0)
    val nApprox = counts.getLong(1)
    val nHit = counts.getLong(2)
    val precision = if (nApprox == 0) 1.0 else nHit.toDouble / nApprox
    val recall = if (nExact == 0) 1.0 else nHit.toDouble / nExact
    val f1 = if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    Seq((nExact, nApprox, nHit, r4(precision), r4(recall), r4(f1)))
      .toDF("n_exact", "n_approx", "n_hit", "precision", "recall", "f1")
  }

  // d17: soft dedup weighting — the alternative to dropping duplicates a
  // training pipeline increasingly prefers (repetition-aware sampling à
  // la "Scaling Data-Constrained Language Models": keep every copy but
  // down-weight it): every document gets weight 1/cluster_size from the
  // same CC labels d08 ships, so total sampling mass per distinct
  // content is exactly 1.0. Singletons (never near-duplicated) stay at
  // weight 1. Cost shape ≡ d08 plus ONE count aggregation on the cluster
  // key and an id-only join back — no payload in any shuffle.
  val d17_soft_dedup: Q = (s, d) => {
    val labels = ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
      pointerJump = true, maxIter = 30)
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val sizes = docs.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    docs.join(sizes, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
      .orderBy("doc_id")
  }

  // d18: repeated-SPAN dedup (the C4 / RefinedWeb line-level pass):
  // before whole-document near-dup, production pipelines remove text
  // units repeated ACROSS documents — navigation chrome, disclaimers,
  // boilerplate lines. The corpus has no newline structure, so the unit
  // is a fixed 10-token span (the same windowing discipline as t06's
  // chunking); a span appearing in ≥2 DISTINCT documents is boilerplate
  // and is dropped from every document, and each doc's surviving spans
  // reassemble in original order. Scale shape (d13's discipline): every
  // corpus-wide hop carries the span's 64-bit hash + ids ONLY — the
  // frequency groupBy and the flag join both move ~16 B rows; span TEXT
  // crosses exactly one doc_id-keyed shuffle (the final reassembly
  // join), where it is re-derived map-side from the document and
  // selected by kept position. Within-doc repeats are kept (the pass
  // targets cross-document boilerplate, not repetition — t12 scores
  // that).
  private val SpanTokens = 10

  /** Fixed 10-token span strings of `text`, in document order. */
  private def spanArr: Column = {
    val t = split(norm(col("text")), " ")
    transform(
      sequence(lit(0), floor((size(t) - lit(1)) / lit(SpanTokens)).cast("int")),
      i => concat_ws(" ", slice(t, i * SpanTokens + 1, lit(SpanTokens))))
  }

  /** (doc_id, pos, h): the 64-bit span hashes of a documents frame —
    * the ONLY representation that crosses corpus-wide shuffles.
    */
  private def spanHashesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(transform(spanArr, x => xxhash64(x))).as(Seq("pos", "h")))

  /** d18's verdict + reassembly tail over a (h, ndocs) frequency table:
    * flag each span by corpus frequency (ids-only join), regroup per
    * doc, re-derive span text map-side after the single doc_id-keyed
    * join. Shared by the batch lane and s19's streaming twin.
    */
  private def spanReassemble(docs: DataFrame, freq: DataFrame): DataFrame = {
    val flags = spanHashesOf(docs).join(freq, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("ndocs") >= 2, 1)).as("n_dropped"),
        sort_array(collect_list(when(col("ndocs") < 2, col("pos"))))
          .as("keep_pos"))
    docs.select(col("doc_id"), spanArr.as("spans"))
      .join(flags, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("n_dropped"),
        concat_ws(" ", transform(col("keep_pos"),
          p => element_at(col("spans"), p + 1))).as("kept_text"))
      .orderBy("doc_id")
  }

  val d18_span_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val freq = spanHashesOf(docs).groupBy("h")
      .agg(countDistinct("doc_id").as("ndocs"))
    spanReassemble(docs, freq)
  }

  // s19: STREAMING span-frequency dedup — d18's streaming twin (the
  // batch↔streaming set grows to apply/c13, keep-list/d11, view/s14,
  // JDBC tail/s15, index/s16, corpus/s17, spans/s19): the span-frequency
  // state accumulates per micro-batch under Structured Streaming's file
  // source. Because every document arrives exactly once, the per-batch
  // DISTINCT-doc counts per hash SUM into the corpus-global frequency —
  // 16-B rows through every streaming hop, localCheckpoint bounding the
  // fold lineage (d11's discipline). Span verdicts are mutable while the
  // stream runs (a later arrival flips an earlier doc's span to
  // boilerplate — s17's label discipline), so the output snapshot closes
  // over the FINAL drained state; the oracle is d18's batch SQL, and the
  // hash match proves the accumulated state composes seam-free.
  val s19_streaming_span_dedup: Q = (s, d) => {
    val B = 3
    val docs = Tables.documents(s, d).persist()
    val dir = java.nio.file.Files.createTempDirectory("graft_s19_")
    try {
      def land(b: Int): Unit =
        graft.sources.SourceSinks.landSingleParquet(
          docs.filter(col("doc_id") % B === b),
          dir.resolve(f"batch_$b%02d.parquet"))
      var freq: DataFrame = null
      val onMicroBatch: (DataFrame, Long) => Unit = (batchDf, _) =>
        if (!batchDf.isEmpty) {
          val bf = spanHashesOf(batchDf).groupBy("h")
            .agg(countDistinct("doc_id").as("ndocs"))
          freq = (if (freq == null) bf
            else freq.unionByName(bf).groupBy("h")
              .agg(sum("ndocs").as("ndocs")))
            .localCheckpoint(true)
        }
      val stream = s.readStream.schema(docs.schema).parquet(dir.toString)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch(onMicroBatch)
        .queryName(s"graft_s19_${System.nanoTime()}").start()
      try {
        for (b <- 0 until B) { land(b); q.processAllAvailable() }
      } finally q.stop()
      require(freq != null, "stream delivered no batches")
      spanReassemble(docs, freq)
    } finally {
      graft.sources.SourceSinks.deleteDir(dir)
      docs.unpersist()
      ()
    }
  }

  // d19: LSH band-configuration tuning — how a pipeline actually picks
  // d03's (bands × rows-per-band) split of the 128-perm signature: the
  // candidate probability of a pair with Jaccard s is the S-curve
  // P(s) = 1 − (1 − s^r)^b (Leskovec/Rajaraman/Ullman, MMDS ch.3), so
  // for each legal 128-perm config this reports the curve's midpoint
  // s50 = (1/b)^(1/r), the false-positive mass P(0.5) below d02's 0.8
  // near-dup threshold, and the EXPECTED RECALL over the corpus's
  // OBSERVED true-pair similarity distribution (mean P(jaccard) over
  // d02's ground-truth pairs) — the number that justifies the shipped
  // 32×4 config. Cost: the d02 pair set (bounded: true near-dups)
  // cross-joined with a 4-row broadcast config table.
  val d19_lsh_tuning: Q = (s, d) => {
    import s.implicits._
    val cfg = Seq((64, 2), (32, 4), (16, 8), (8, 16)).toDF("bands", "rpb")
    def scurve(sim: Column): Column =
      lit(1.0) - pow(lit(1.0) - pow(sim, col("rpb")), col("bands"))
    ngramJaccardPairs(s, d).select(col("jaccard"))
      .crossJoin(broadcast(cfg))
      .groupBy(col("bands"), col("rpb"))
      .agg(count(lit(1)).as("n_true_pairs"),
        round(avg(scurve(col("jaccard"))), 6).as("exp_recall"))
      .withColumn("s50",
        round(pow(lit(1.0) / col("bands"), lit(1.0) / col("rpb")), 6))
      .withColumn("p_at_05", round(scurve(lit(0.5)), 6))
      .orderBy(desc("bands"))
  }

  // d20: cross-source SHINGLE OVERLAP MATRIX — the contamination audit
  // run before mixing corpora (which crawls duplicate which, is a
  // "held-out" source actually disjoint): per-source distinct word-
  // 5-gram sets (d02's shingling), pairwise shared-shingle counts via
  // ONE equi-join on the shingle key (both sides co-partition on it;
  // fan-out bounded by sources-per-shingle, never corpus²), Jaccard
  // from broadcast per-source totals; output ≤ sources² rows. Shingles
  // cross the shuffle as strings here for oracle parity — at 100 TB
  // they carry as 64-bit hashes (d02→d03's discipline) and the join
  // key shrinks to 8 bytes.
  val d20_source_overlap: Q = (s, d) => {
    val ss = Tables.documents(s, d)
      .select(col("source"), explode(shingles(col("text"))).as("sh"))
      .distinct()
      .persist() // totals + both pair-join sides
    val tot = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = ss.as("a")
      .join(ss.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(tot.select(col("source").as("source_a"), col("n").as("na"))),
        Seq("source_a"))
      .join(broadcast(tot.select(col("source").as("source_b"), col("n").as("nb"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared") / (col("na") + col("nb") - col("n_shared")), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  // d24 (rows-only; spec: |estimate − d20's exact Jaccard| within the
  // 128-permutation binomial bound, per pair): MERGEABLE SOURCE
  // SKETCHES — the sketch-algebra counterpart of d20's exact overlap
  // matrix (d03:d02 :: d24:d20): the elementwise-min MERGE of per-doc
  // MinHash signatures IS the signature of the union of the source's
  // shingle sets (min commutes with union — same fixed permutations),
  // so each source collapses to ONE 128-long sketch regardless of
  // corpus size, and the cross-source estimate is a match-fraction
  // over k² constant-size sketch pairs. At 100 TB d20's pair join
  // touches every distinct shingle; this touches 128 longs per source.
  val d24_source_sketch_overlap: Q = (s, d) => {
    val sigs = Tables.documents(s, d)
      .select(col("source"),
        minhashSig(shingleHashes(col("text"), distinct = false)).as("sig"))
      .filter(size(col("sig")) > 0)
    val perSrc = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("pos", "h")))
      .groupBy("source", "pos").agg(min("h").as("h"))
    val sk = perSrc.groupBy("source")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("h")))),
        x => x.getField("h")).as("sk"))
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        aggregate(zip_with(col("a.sk"), col("b.sk"),
          (x, y) => (x === y).cast("int")), lit(0),
          (acc, v) => acc + v).as("n_match"),
        size(col("a.sk")).as("n_perms"))
      .withColumn("est_jaccard",
        round(col("n_match") / col("n_perms").cast("double"), 4))
      .orderBy("source_a", "source_b")
  }

  // d25 (rows-only; spec: |estimate − exact containment| within the
  // propagated sketch tolerance per DIRECTED pair): SKETCH-BASED
  // CONTAINMENT MATRIX — d13's directional question ("how much of A
  // already sits inside B?" — the source-retirement signal) answered
  // from d24's mergeable union sketches plus ONE exact per-source
  // cardinality: with Ĵ the sketch match-fraction and n_a, n_b exact
  // distinct-shingle counts, |A∩B| ≈ Ĵ/(1+Ĵ)·(n_a+n_b) and
  // C(A→B) = |A∩B|/n_a. Cross-source cost is k² constant-size sketch
  // pairs + a bounded cardinality broadcast — at 100 TB nothing
  // data-proportional ever crosses sources (d13/d20 join every
  // distinct shingle; the per-source cardinality agg stays within one
  // source partition).
  val d25_sketch_containment: Q = (s, d) => {
    val sigs = Tables.documents(s, d)
      .select(col("source"),
        minhashSig(shingleHashes(col("text"), distinct = false)).as("sig"))
      .filter(size(col("sig")) > 0)
    val sk = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("pos", "h")))
      .groupBy("source", "pos").agg(min("h").as("h"))
      .groupBy("source")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("h")))),
        x => x.getField("h")).as("sk"))
    val card = Tables.documents(s, d)
      .select(col("source"), explode(shingles(col("text"))).as("sh"))
      .distinct().groupBy("source").agg(count(lit(1)).as("n"))
    sk.as("a").join(sk.as("b"), col("a.source") =!= col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        (aggregate(zip_with(col("a.sk"), col("b.sk"),
          (x, y) => (x === y).cast("int")), lit(0),
          (acc, v) => acc + v) / size(col("a.sk")).cast("double")).as("jhat"))
      .join(broadcast(card.select(col("source").as("source_a"),
        col("n").as("na"))), Seq("source_a"))
      .join(broadcast(card.select(col("source").as("source_b"),
        col("n").as("nb"))), Seq("source_b"))
      .withColumn("inter_est",
        col("jhat") / (col("jhat") + 1.0) * (col("na") + col("nb")))
      .select(col("source_a"), col("source_b"),
        round(col("jhat"), 4).as("est_jaccard"),
        round(least(col("inter_est") / col("na"), lit(1.0)), 4)
          .as("est_containment"))
      .orderBy("source_a", "source_b")
  }

  // d27: CROSS-SHARD DUPLICATE RATE — the number that decides whether
  // a 100 TB dedup can run shard-parallel without a global pass:
  // d02's verified near-dup pairs classified same- vs cross-shard
  // under an 8-way doc-id hash sharding. A high cross rate says
  // shard-local dedup misses most duplicates (hash sharding spreads
  // near-dups uniformly — the result the lane demonstrates); content
  // sharding (d03's LSH buckets) is what actually co-locates them.
  // d28: CAPTURE-RECAPTURE DUP-MASS ESTIMATION — how many near-dup
  // pairs does the corpus hold, estimated WITHOUT the full candidate
  // join (the Lincoln-Petersen/Chapman estimator ecology uses for
  // population counts, applied to the pair universe): two deterministic
  // "captures" (A = both endpoints with even doc_id, B = both endpoints
  // with doc_id mod 3 < 2 — independent classes by CRT over uniform
  // ids), then N̂ = (n1+1)(n2+1)/(m+1) − 1 from the capture/recapture
  // counts. At 100 TB the production form runs d02's shingle join ONLY
  // over each sampled slice (a pA²+pB² fraction of the work) and skips
  // the true count; this lane keeps the exact N alongside so the
  // estimator's bias is OBSERVABLE (rel_err is the readout, the d16
  // discipline — planted dups need not respect the independence
  // assumption, and the number says by how much). All counts exact
  // longs; Chapman + rel_err are single divisions, 2dp/4dp rounds.
  val d28_dup_estimate: Q = (s, d) => {
    val pairs = ngramJaccardPairs(s, d)
      .select(
        (pmod(col("d1"), lit(2)) === 0 && pmod(col("d2"), lit(2)) === 0)
          .cast("long").as("in_a"),
        (pmod(col("d1"), lit(3)) < 2 && pmod(col("d2"), lit(3)) < 2)
          .cast("long").as("in_b"))
    pairs
      .agg(count(lit(1)).as("n_true"), sum("in_a").as("n1"),
        sum("in_b").as("n2"),
        sum(col("in_a") * col("in_b")).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        round((col("n1") + 1) * (col("n2") + 1).cast("double") /
          (col("m") + 1) - 1, 2).as("n_hat"),
        // rel_err is undefined when the corpus holds no near-dup pairs:
        // emit an explicit null instead of a 0/0 NaN (m+1 Chapman guard
        // discipline; the oracle mirrors the CASE)
        when(col("n_true") > 0,
          round(((col("n1") + 1) * (col("n2") + 1).cast("double") /
            (col("m") + 1) - 1 - col("n_true")) /
            col("n_true").cast("double"), 4)).as("rel_err"))
  }

  val d27_cross_shard_rate: Q = (s, d) =>
    ngramJaccardPairs(s, d)
      .select((pmod(col("d1"), lit(8)) === pmod(col("d2"), lit(8)))
        .cast("long").as("same"))
      .agg(count(lit(1)).as("n_pairs"), sum("same").as("n_same_shard"))
      .select(col("n_pairs"), col("n_same_shard"),
        (col("n_pairs") - col("n_same_shard")).as("n_cross_shard"),
        round((col("n_pairs") - col("n_same_shard")) /
          col("n_pairs").cast("double"), 4).as("cross_rate"))

  // t51: DEDUP-AWARE TOKEN YIELD — the number a pretraining budget
  // actually runs on: tokens per source BEFORE vs AFTER the d08
  // keep-one policy (doc counts flatter sources with many short dups;
  // token counts don't lie). Lives beside the keeplist machinery the
  // way t17's corpus build does; one join of the keep flags to a
  // token-count projection + per-source integer sums. Oracle rides
  // the same recursive-CTE ground truth as d08.
  val t51_dedup_token_yield: Q = (s, d) => {
    // r17: unsorted keep flags — the keeplist's presentation sort was a
    // dead global exchange under the join below (guide §2.4)
    val kl = dedupKeepFlags(s, d).select("doc_id", "keep")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(norm(col("text")), " ")).cast("long").as("nt"))
      .join(kl, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum("nt").as("total_tokens"),
        sum(when(col("keep"), col("nt")).otherwise(0L)).as("tokens_kept"))
      .withColumn("token_yield",
        round(col("tokens_kept") / col("total_tokens").cast("double"), 4))
      .orderBy("source")
  }

  // t52: PIPELINE FUNNEL — the per-stage attrition waterfall every
  // data team tracks for a pretraining corpus: raw → eval-split
  // held-out → quality cut (t50's τ=0.5 score) → dedup keep (d08) →
  // decontaminated (d12's 8-gram rule), with docs AND tokens at each
  // stage (tokens are what the budget buys). One pass computes all
  // five cumulative stage flags, one aggregate all ten sums; stack()
  // unpivots to the 5-row report. The oracle re-derives every stage
  // from the same proven CTE fragments (recursive-CTE keeplist, t50's
  // score, d12's contamination join) — a hash match proves the whole
  // COMPOSITION, not just the pieces. t17 materializes the surviving
  // corpus; this prices each cut.
  val t52_pipeline_funnel: Q = (s, d) => {
    // r17 (guide §1.2/§2.4): consume the sub-pipelines' UNSORTED /
    // un-aggregated composition surfaces — the previous formulation
    // paid d08's presentation sort (a dead global exchange under the
    // join below), d12's two countDistinct aggregates (reduced to
    // distinct ids immediately), and a redundant distinct. Stage flags
    // and every emitted number are identical by construction; the
    // oracle still re-derives each stage from the same CTE fragments.
    val kl = dedupKeepFlags(s, d).select(col("doc_id"), col("keep"))
    val contam = contaminatedTrainIds(s, d)
      .select(col("train_id").as("doc_id"))
      .withColumn("contam", lit(true))
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(norm(col("text")), " ")).cast("long").as("nt"))
      .join(graft.ops.TextAnalysis.weightedSampleScores(s, d)
        .select("doc_id", "score"), "doc_id")
      .join(kl, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("contam", coalesce(col("contam"), lit(false)))
      .withColumn("s2", col("doc_id") % 17 =!= 0)
      .withColumn("s3", col("s2") && col("score") >= 0.5)
      .withColumn("s4", col("s3") && col("keep"))
      .withColumn("s5", col("s4") && !col("contam"))
    base.agg(
      count(lit(1)).as("d1"), sum("nt").as("t1"),
      sum(col("s2").cast("long")).as("d2"),
      sum(when(col("s2"), col("nt")).otherwise(0L)).as("t2"),
      sum(col("s3").cast("long")).as("d3"),
      sum(when(col("s3"), col("nt")).otherwise(0L)).as("t3"),
      sum(col("s4").cast("long")).as("d4"),
      sum(when(col("s4"), col("nt")).otherwise(0L)).as("t4"),
      sum(col("s5").cast("long")).as("d5"),
      sum(when(col("s5"), col("nt")).otherwise(0L)).as("t5"))
      .select(expr("stack(5, '1_raw', d1, t1, '2_eval_held_out', d2, t2, " +
        "'3_quality', d3, t3, '4_dedup', d4, t4, " +
        "'5_decontaminated', d5, t5) as (stage, n_docs, n_tokens)"))
      .withColumn("token_retention",
        round(col("n_tokens") /
          first(col("n_tokens")).over(org.apache.spark.sql.expressions
            .Window.orderBy("stage").rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)), 4))
      .orderBy("stage")
  }

  // d26: DUP-CLUSTER PROFILE — the report a dedup run ships to its
  // operator (how much mass sits in big near-dup families, how much
  // of the corpus is untouched, how many docs a keep-one policy
  // removes): cluster-size spectrum over d06's connected components,
  // one keyed agg to the cluster axis + one to the bounded size-bucket
  // axis; singletons from corpus count minus clustered docs — no
  // corpus pass beyond the d02 pair machinery it inherits.
  val d26_cluster_profile: Q = (s, d) => {
    val cl = ccClusters(ngramJaccardPairs(s, d).select(col("d1"), col("d2")),
      pointerJump = false, maxIter = 20)
    val sizes = cl.groupBy("cluster").agg(count(lit(1)).as("size"))
    val byBucket = sizes
      .withColumn("bucket", when(col("size") >= 5, lit("5+"))
        .otherwise(col("size").cast("string")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_clusters"), sum("size").as("n_docs_in"),
        sum(col("size") - 1).as("n_removable"))
    val tot = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val clustered = cl.agg(count(lit(1)).as("n_clustered"))
    val single = tot.crossJoin(clustered)
      .select(lit("singleton").as("bucket"),
        (col("n_docs") - col("n_clustered")).as("n_clusters"),
        (col("n_docs") - col("n_clustered")).as("n_docs_in"),
        lit(0L).as("n_removable"))
    byBucket.unionAll(single).orderBy("bucket")
  }

  /** d21's span parameters — gram width, min consecutive-gram run (a
    * run of r k-grams = a shared word span of r+k−1 words), and the
    * gram document-frequency band (shared with the oracle). The lower
    * bound is d03's singleton cut — a gram in one doc can't pair; the
    * upper bound is the hot-gram cap that keeps the pair join from
    * going quadratic on boilerplate at corpus scale (both engines apply
    * it, so results stay identical).
    */
  val SubstrK = 3
  val SubstrMinRun = 3
  val SubstrDfCap = 100

  // d21: EXACT SUBSTRING-RUN DETECTION between documents — the
  // dotplot/plagiarism-span primitive behind exact-substring dedup
  // (find docs sharing a literal run of ≥5 words, where MinHash only
  // sees bag overlap). Positional k-grams join on gram text (at corpus
  // scale: on gram HASH — ids+pos only move), pairs land on their
  // DIAGONAL (pos_a − pos_b); consecutive matched positions on one
  // diagonal are one shared literal span, found with the
  // gaps-and-islands trick per (pair, diagonal) — a high-cardinality
  // composite key, so each window partition is tiny. The DF band above
  // is the only approximation and is mirrored in the oracle.
  val d21_substr_runs: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(
        wordGrams(split(norm(col("text")), " "), SubstrK))
        .as(Seq("pos", "gram")))
      .persist() // DF-band side + both pair-join sides
    val shared = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df").between(2, SubstrDfCap))
      .select(col("gram"))
    val g = grams.join(shared, Seq("gram"))
    val pairs = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), (col("a.pos") - col("b.pos")).as("diag"))
    // (pos_a, diag) is unique per pair — one gram per position — so the
    // row_number islands grouping is deterministic without a tie-break
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    pairs
      .withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .filter(col("run_len") >= SubstrMinRun)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("run_len")).as("max_run"), count(lit(1)).as("n_runs"),
        (max(col("run_len")) + SubstrK - 1).as("span_words"))
      .orderBy("doc_a", "doc_b")
  }

  /** d22's edit-distance cap, probe stripe, and blocking-prefix length
    * (shared with the oracle). 16 chars of the Customer#%09d name
    * leaves the last two digits free, so blocks stay ≤100 names at ANY
    * scale factor — the property that keeps the match linear.
    */
  val FuzzyMaxDist = 2
  val FuzzyProbeStripe = 97
  val FuzzyBlockPrefix = 16

  // d22: FUZZY ENTITY MATCH (incremental entity resolution — an
  // incoming probe batch matches against the master by edit distance,
  // the dirty-data counterpart of d01's exact hash dedup): probes are a
  // deterministic key stripe, candidates come from PREFIX BLOCKING
  // (substr equality — the LSH-for-strings: levenshtein never runs
  // outside a block, and the block size is constant in scale factor,
  // so total work is O(probes · block)); per probe the lane reports the
  // candidate count and the best match under the deterministic
  // (dist, key) order. Cross-block near-misses are the documented
  // blocking recall trade-off, mirrored exactly in the oracle.
  val d22_fuzzy_match: Q = (s, d) => {
    val master = Tables.customer(s, d)
      .select(col("c_custkey").as("m_key"), col("c_name").as("m_name"),
        substring(col("c_name"), 1, FuzzyBlockPrefix).as("blk"))
    val probes = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(FuzzyProbeStripe.toLong)) === 0)
      .select(col("c_custkey").as("p_key"), col("c_name").as("p_name"),
        substring(col("c_name"), 1, FuzzyBlockPrefix).as("blk"))
    probes.join(master, Seq("blk"))
      .filter(col("p_key") =!= col("m_key"))
      .withColumn("dist", levenshtein(col("p_name"), col("m_name")))
      .filter(col("dist") <= FuzzyMaxDist)
      .groupBy(col("p_key"))
      .agg(count(lit(1)).as("n_candidates"),
        min(struct(col("dist"), col("m_key"))).getField("m_key")
          .as("best_key"),
        min(col("dist")).as("best_dist"))
      .orderBy("p_key")
  }

  /** d23's sweep points (shared with the oracle). */
  val SweepThresholds = Seq(0.7, 0.8, 0.9, 0.95)

  // d23: DEDUP THRESHOLD SWEEP — the yield curve behind choosing d02's
  // 0.8 cut (how many pairs/docs does each candidate threshold
  // implicate?): ONE unfiltered pair-jaccard frame (d02's
  // singleton-cut join, floored at the lowest sweep point so the frame
  // stays near-dup-sized), then every sweep row comes out of ONE
  // conditional aggregation (per-θ pair counts + distinct affected
  // docs), stack-unpivoted without re-executing the join.
  val d23_threshold_sweep: Q = (s, d) => {
    val ex = explodedShingles(s, d)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") >= 2)
    val a = ex.select(col("doc_id").as("d1"), col("n_sh").as("n1"), col("s"))
    val b = ex.select(col("doc_id").as("d2"), col("n_sh").as("n2"), col("s"))
    val pairs = a.join(b, a("s") === b("s") && a("d1") < b("d2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= SweepThresholds.min)
    val aggs = SweepThresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(sum((col("jaccard") >= t).cast("long")).as(s"p$i"),
        countDistinct(when(col("jaccard") >= t, col("d2"))).as(s"a$i"))
    }
    val stackArgs = SweepThresholds.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), p$i, a$i" }.mkString(", ")
    pairs.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${SweepThresholds.size}, $stackArgs) AS " +
        "(threshold, n_pairs, n_docs_affected)")
      .orderBy("threshold")
  }

  val queries: Map[String, Q] = Map(
    "d24_source_sketch_overlap" -> d24_source_sketch_overlap,
    "d25_sketch_containment" -> d25_sketch_containment,
    "d26_cluster_profile" -> d26_cluster_profile,
    "d23_threshold_sweep" -> d23_threshold_sweep,
    "d22_fuzzy_match" -> d22_fuzzy_match,
    "d21_substr_runs" -> d21_substr_runs,
    "d20_source_overlap" -> d20_source_overlap,
    "d18_span_dedup" -> d18_span_dedup,
    "s19_streaming_span_dedup" -> s19_streaming_span_dedup,
    "d19_lsh_tuning" -> d19_lsh_tuning,
    "d17_soft_dedup" -> d17_soft_dedup,
    "d16_dedup_eval" -> d16_dedup_eval,
    "d15_url_dedup" -> d15_url_dedup,
    "t17_corpus_build" -> t17_corpus_build,
    "t51_dedup_token_yield" -> t51_dedup_token_yield,
    "t52_pipeline_funnel" -> t52_pipeline_funnel,
    "s17_streaming_corpus" -> s17_streaming_corpus,
    "d14_bloom_membership" -> d14_bloom_membership,
    "d13_containment" -> d13_containment,
    "d12_decontamination" -> d12_decontamination,
    "d01_exact_dedup" -> d01_exact_dedup,
    "d02_ngram_jaccard" -> d02_ngram_jaccard,
    "d03_minhash_lsh" -> d03_minhash_lsh,
    "d04_simhash" -> d04_simhash,
    "d05_embed_neardup" -> d05_embed_neardup,
    "d06_dup_clusters" -> d06_dup_clusters,
    "d27_cross_shard_rate" -> d27_cross_shard_rate,
    "d28_dup_estimate" -> d28_dup_estimate,
    "d07_cc_pointer_jumping" -> d07_cc_pointer_jumping,
    "d08_dedup_keeplist" -> d08_dedup_keeplist,
    "d09_incremental_keeplist" -> d09_incremental_keeplist,
    "d10_semantic_keeplist" -> d10_semantic_keeplist,
    "d11_streaming_keeplist" -> d11_streaming_keeplist,
  )

  /** d18's oracle, shared verbatim by s19's streaming twin — the
    * streamed state must hash-match the batch formulation.
    */
  private val spanDedupOracleSql: String =
    """WITH t AS (
          |  SELECT doc_id,
          |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tk
          |  FROM documents),
          |spans AS (
          |  SELECT doc_id,
          |    unnest([i for i in range(0, ((len(tk)-1)//10) + 1)]) AS pos,
          |    unnest([array_to_string(tk[(i*10+1):(i*10+10)], ' ')
          |            for i in range(0, ((len(tk)-1)//10) + 1)]) AS span
          |  FROM t),
          |freq AS (SELECT span, count(DISTINCT doc_id) AS ndocs
          |         FROM spans GROUP BY 1),
          |j AS (SELECT s.doc_id, s.pos, s.span, f.ndocs
          |      FROM spans s JOIN freq f USING (span))
          |SELECT doc_id, count(*)::BIGINT AS n_spans,
          |  sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
          |  coalesce(string_agg(CASE WHEN ndocs < 2 THEN span END, ' '
          |    ORDER BY pos), '') AS kept_text
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "d23_threshold_sweep" -> {
      val union = Dedup.SweepThresholds.map(t =>
        s"""SELECT CAST($t AS DOUBLE) AS threshold,
           |  sum((j >= $t)::BIGINT)::BIGINT AS n_pairs,
           |  count(DISTINCT CASE WHEN j >= $t THEN d2 END)::BIGINT
           |    AS n_docs_affected
           |FROM j""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |j AS (
        |  SELECT d2, round(inter / (n1 + n2 - inter), 6) AS j FROM pairs
        |  WHERE round(inter / (n1 + n2 - inter), 6) >= ${Dedup.SweepThresholds.min})
        |$union
        |ORDER BY threshold""".stripMargin
    },
    "d22_fuzzy_match" ->
      s"""WITH m AS (
        |  SELECT c_custkey AS m_key, c_name AS m_name,
        |    substr(c_name, 1, $FuzzyBlockPrefix) AS blk
        |  FROM customer),
        |p AS (
        |  SELECT c_custkey AS p_key, c_name AS p_name,
        |    substr(c_name, 1, $FuzzyBlockPrefix) AS blk
        |  FROM customer WHERE c_custkey % $FuzzyProbeStripe = 0),
        |c AS (
        |  SELECT p_key, m_key, levenshtein(p_name, m_name) AS dist
        |  FROM p JOIN m USING (blk) WHERE p_key <> m_key)
        |SELECT p_key, count(*)::BIGINT AS n_candidates,
        |  struct_extract(min(struct_pack(dist := dist, m_key := m_key)),
        |    'm_key') AS best_key,
        |  min(dist)::INT AS best_dist
        |FROM c WHERE dist <= $FuzzyMaxDist
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d21_substr_runs" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, CASE WHEN len(t) >= $SubstrK THEN
        |    [array_to_string(t[i:i+${SubstrK - 1}], ' ')
        |      for i in range(1, len(t) - ${SubstrK - 2})]
        |    ELSE [] END AS gs
        |  FROM toks),
        |g AS (
        |  SELECT doc_id, unnest(gs) AS gram,
        |    generate_subscripts(gs, 1) - 1 AS pos
        |  FROM g0),
        |band AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1)
        |  WHERE df BETWEEN 2 AND $SubstrDfCap),
        |gs AS (SELECT g.* FROM g JOIN band USING (gram)),
        |p AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pos_a,
        |    x.pos - y.pos AS diag
        |  FROM gs x JOIN gs y ON x.gram = y.gram AND x.doc_id < y.doc_id),
        |r AS (
        |  SELECT *, pos_a - row_number() OVER (
        |    PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
        |  FROM p),
        |runs AS (
        |  SELECT doc_a, doc_b, count(*)::BIGINT AS run_len
        |  FROM r GROUP BY doc_a, doc_b, diag, grp)
        |SELECT doc_a, doc_b, max(run_len) AS max_run,
        |  count(*)::BIGINT AS n_runs,
        |  (max(run_len) + ${SubstrK - 1}) AS span_words
        |FROM runs WHERE run_len >= $SubstrMinRun
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d20_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT source, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ss AS (
        |  SELECT DISTINCT source, unnest(shingles) AS sh FROM sh0),
        |tot AS (SELECT source, count(*)::BIGINT AS n FROM ss GROUP BY 1),
        |shared AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*)::BIGINT AS n_shared
        |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  round(n_shared / (ta.n + tb.n - n_shared), 6) AS jaccard
        |FROM shared
        |  JOIN tot ta ON ta.source = source_a
        |  JOIN tot tb ON tb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    // DuckDB quirks handled below: regexp_extract/array_to_string return
    // NULL (not '') on no-match/empty-list — coalesce everywhere.
    "s19_streaming_span_dedup" -> spanDedupOracleSql,
    "d18_span_dedup" -> spanDedupOracleSql,
    "d19_lsh_tuning" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT round(inter / (n1 + n2 - inter), 6) AS jaccard
        |  FROM p0 WHERE round(inter / (n1 + n2 - inter), 6) >= 0.8),
        |cfg AS (SELECT * FROM (VALUES (64, 2), (32, 4), (16, 8), (8, 16))
        |        AS c(bands, rpb))
        |SELECT bands, rpb, count(*)::BIGINT AS n_true_pairs,
        |  round(avg(1 - pow(1 - pow(jaccard, rpb), bands)), 6) AS exp_recall,
        |  round(pow(1.0 / bands, 1.0 / rpb), 6) AS s50,
        |  round(1 - pow(1 - pow(0.5, rpb), bands), 6) AS p_at_05
        |FROM pairs, cfg GROUP BY 1, 2, 5, 6 ORDER BY bands DESC""".stripMargin,
    "d15_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'https://www.example.com/docs/' || (doc_id // 8)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/docs/' || (doc_id // 8)
        |      WHEN 2 THEN 'http://www.example.com:80/docs/' || (doc_id // 8)
        |      WHEN 3 THEN 'https://www.example.com:443/docs/' || (doc_id // 8) || '/'
        |      WHEN 4 THEN 'https://www.example.com/docs/' || (doc_id // 8) || '?utm_source=feed&utm_campaign=mix'
        |      WHEN 5 THEN 'https://www.example.com/docs/' || (doc_id // 8) || '#section-2'
        |      WHEN 6 THEN 'https://www.example.com/docs/' || (doc_id // 8) || '?b=2&a=1'
        |      ELSE 'https://www.example.com/docs/' || (doc_id // 8) || '?a=1&b=2&ref=tw'
        |    END AS raw_url
        |  FROM documents),
        |p2 AS (
        |  SELECT doc_id, raw_url,
        |    regexp_replace(lower(regexp_extract(regexp_replace(raw_url, '#.*$', ''), '^[a-zA-Z]+://([^/?#]*)', 1)), ':(80|443)$', '') AS host,
        |    coalesce(regexp_extract(regexp_replace(raw_url, '#.*$', ''), '^[a-zA-Z]+://[^/?#]*(.*)$', 1), '') AS pathq
        |  FROM raw),
        |p3 AS (
        |  SELECT doc_id, raw_url, host,
        |    CASE WHEN regexp_replace(coalesce(regexp_extract(pathq, '^([^?]*)', 1), ''), '/+$', '') = '' THEN '/'
        |         ELSE regexp_replace(coalesce(regexp_extract(pathq, '^([^?]*)', 1), ''), '/+$', '') END AS path,
        |    coalesce(regexp_extract(pathq, '\?(.*)$', 1), '') AS query
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, raw_url, host, path,
        |    coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
        |      p -> NOT (regexp_matches(p, '^(utm_[^=]*|ref|fbclid)(=|$)') OR p = ''))), '&'), '') AS params
        |  FROM p3)
        |SELECT 'https://' || host || path ||
        |    CASE WHEN params = '' THEN '' ELSE '?' || params END AS canonical_url,
        |  min(doc_id) AS keeper_id, count(*)::BIGINT AS n_fetches,
        |  count(DISTINCT raw_url)::BIGINT AS n_raw_forms
        |FROM p4 GROUP BY 1 ORDER BY 1""".stripMargin,
    "d13_containment" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |conf AS (
        |  SELECT a.doc_id, b.doc_id AS outer_id
        |  FROM n a JOIN n b ON a.doc_id <> b.doc_id
        |  WHERE len(a.s) >= 20
        |    AND (len(a.s) < len(b.s)
        |         OR (len(a.s) = len(b.s) AND a.doc_id > b.doc_id))
        |    AND contains(b.s, a.s))
        |SELECT doc_id, min(outer_id) AS container_id
        |FROM conf GROUP BY 1 ORDER BY 1""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash,
        |  min(doc_id) AS keeper_id, count(*)::BIGINT AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "d28_dup_estimate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |dup AS (
        |  SELECT d1, d2,
        |    CASE WHEN d1 % 2 = 0 AND d2 % 2 = 0 THEN 1 ELSE 0 END AS in_a,
        |    CASE WHEN d1 % 3 < 2 AND d2 % 3 < 2 THEN 1 ELSE 0 END AS in_b
        |  FROM pairs WHERE round(inter / (n1 + n2 - inter), 6) >= 0.8),
        |st AS (
        |  SELECT count(*)::BIGINT AS n_true, sum(in_a)::BIGINT AS n1,
        |    sum(in_b)::BIGINT AS n2, sum(in_a * in_b)::BIGINT AS m
        |  FROM dup)
        |SELECT n_true, n1, n2, m,
        |  round((n1 + 1) * (n2 + 1)::DOUBLE / (m + 1) - 1, 2) AS n_hat,
        |  CASE WHEN n_true > 0 THEN
        |    round(((n1 + 1) * (n2 + 1)::DOUBLE / (m + 1) - 1 - n_true)
        |      / n_true::DOUBLE, 4) END AS rel_err
        |FROM st""".stripMargin,
    "d27_cross_shard_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |dup AS (
        |  SELECT d1, d2, CASE WHEN d1 % 8 = d2 % 8 THEN 1 ELSE 0 END AS same
        |  FROM pairs WHERE round(inter / (n1 + n2 - inter), 6) >= 0.8),
        |st AS (
        |  SELECT count(*)::BIGINT AS n_pairs,
        |    sum(same)::BIGINT AS n_same_shard
        |  FROM dup)
        |SELECT n_pairs, n_same_shard,
        |  n_pairs - n_same_shard AS n_cross_shard,
        |  round((n_pairs - n_same_shard) / n_pairs::DOUBLE, 4) AS cross_rate
        |FROM st""".stripMargin,
    "d02_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT d1, d2,
        |  round(inter / (n1 + n2 - inter), 6) AS jaccard
        |FROM pairs WHERE round(inter / (n1 + n2 - inter), 6) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    "d17_soft_dedup" -> softDedupOracleSql,
    "d06_dup_clusters" -> ccOracleSql,
    "d26_cluster_profile" ->
      s"""$ccCtes,
         |clusters AS (
         |  SELECT min(rep) AS cluster, node FROM cc GROUP BY node),
         |sizes AS (
         |  SELECT cluster, count(*)::BIGINT AS size
         |  FROM clusters GROUP BY 1),
         |bkt AS (
         |  SELECT CASE WHEN size >= 5 THEN '5+' ELSE size::VARCHAR END
         |      AS bucket,
         |    count(*)::BIGINT AS n_clusters, sum(size)::BIGINT AS n_docs_in,
         |    sum(size - 1)::BIGINT AS n_removable
         |  FROM sizes GROUP BY 1),
         |sing AS (
         |  SELECT 'singleton' AS bucket,
         |    ((SELECT count(*) FROM documents) -
         |     (SELECT count(*) FROM clusters))::BIGINT AS n_clusters,
         |    ((SELECT count(*) FROM documents) -
         |     (SELECT count(*) FROM clusters))::BIGINT AS n_docs_in,
         |    0::BIGINT AS n_removable)
         |SELECT * FROM bkt UNION ALL SELECT * FROM sing
         |ORDER BY bucket""".stripMargin,
    // d07 computes the identical clustering as d06, just in O(log n)
    // rounds — same recursive-CTE ground truth.
    "d07_cc_pointer_jumping" -> ccOracleSql,
    "d08_dedup_keeplist" -> keeplistOracleSql,
    "t52_pipeline_funnel" ->
      s"""$ccCtes,
         |lab AS (SELECT node, min(rep) AS cluster FROM cc GROUP BY node),
         |kl AS (
         |  SELECT d.doc_id, d.doc_id = coalesce(l.cluster, d.doc_id)
         |    AS keep
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
         |sh8 AS (
         |  SELECT doc_id, CASE WHEN len(t) >= 8 THEN
         |    list_distinct([array_to_string(t[i:i+7], ' ')
         |      for i in range(1, len(t)-6)])
         |    ELSE [] END AS shingles
         |  FROM toks),
         |ex8 AS (SELECT doc_id, unnest(shingles) AS s8 FROM sh8),
         |contam AS (
         |  SELECT DISTINCT tr.doc_id FROM ex8 tr JOIN ex8 ev
         |    ON tr.s8 = ev.s8
         |  WHERE tr.doc_id % 17 <> 0 AND ev.doc_id % 17 = 0),
         |m AS (
         |  SELECT doc_id, length(text) AS len_chars,
         |    len(string_split(lower(trim(regexp_replace(text, '\\s+',
         |      ' ', 'g'))), ' ')) AS n_tokens,
         |    len(list_filter(string_split(lower(trim(regexp_replace(text,
         |      '\\s+', ' ', 'g'))), ' '),
         |      w -> w IN ('the', 'a', 'of'))) AS stop_hits,
         |    length(text) - length(regexp_replace(text, '[.,!?;:]', '',
         |      'g')) AS punct_chars
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    round(least(n_tokens / 100.0, 1.0) * 0.5
         |      + (stop_hits / n_tokens) * 0.3
         |      + (1.0 - punct_chars / len_chars) * 0.2, 4) AS score
         |  FROM m),
         |nt AS (
         |  SELECT doc_id,
         |    len(string_split(trim(regexp_replace(text, '\\s+', ' ',
         |      'g')), ' '))::BIGINT AS nt
         |  FROM documents),
         |fl AS (
         |  SELECT d.doc_id, nt.nt, sc.score, kl.keep,
         |    d.doc_id IN (SELECT doc_id FROM contam) AS contam
         |  FROM documents d
         |  JOIN nt USING (doc_id) JOIN sc USING (doc_id)
         |  JOIN kl USING (doc_id)),
         |st AS (
         |  SELECT doc_id, nt,
         |    doc_id % 17 <> 0 AS s2,
         |    (doc_id % 17 <> 0) AND score >= 0.5 AS s3,
         |    (doc_id % 17 <> 0) AND score >= 0.5 AND keep AS s4,
         |    (doc_id % 17 <> 0) AND score >= 0.5 AND keep AND NOT contam
         |      AS s5
         |  FROM fl),
         |rows AS (
         |  SELECT '1_raw' AS stage, count(*)::BIGINT AS n_docs,
         |    sum(nt)::BIGINT AS n_tokens FROM st
         |  UNION ALL SELECT '2_eval_held_out',
         |    sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT,
         |    sum(CASE WHEN s2 THEN nt ELSE 0 END)::BIGINT FROM st
         |  UNION ALL SELECT '3_quality',
         |    sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT,
         |    sum(CASE WHEN s3 THEN nt ELSE 0 END)::BIGINT FROM st
         |  UNION ALL SELECT '4_dedup',
         |    sum(CASE WHEN s4 THEN 1 ELSE 0 END)::BIGINT,
         |    sum(CASE WHEN s4 THEN nt ELSE 0 END)::BIGINT FROM st
         |  UNION ALL SELECT '5_decontaminated',
         |    sum(CASE WHEN s5 THEN 1 ELSE 0 END)::BIGINT,
         |    sum(CASE WHEN s5 THEN nt ELSE 0 END)::BIGINT FROM st)
         |SELECT stage, n_docs, n_tokens,
         |  round(n_tokens / (SELECT n_tokens FROM rows
         |    WHERE stage = '1_raw')::DOUBLE, 4) AS token_retention
         |FROM rows ORDER BY stage""".stripMargin,
    "t51_dedup_token_yield" ->
      s"""$ccCtes,
         |lab AS (SELECT node, min(rep) AS cluster FROM cc GROUP BY node),
         |kl AS (
         |  SELECT d.doc_id, d.source,
         |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
         |      ' '))::BIGINT AS nt,
         |    d.doc_id = coalesce(l.cluster, d.doc_id) AS keep
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  sum(nt)::BIGINT AS total_tokens,
         |  sum(CASE WHEN keep THEN nt ELSE 0 END)::BIGINT AS tokens_kept,
         |  round(sum(CASE WHEN keep THEN nt ELSE 0 END)
         |    / sum(nt)::DOUBLE, 4) AS token_yield
         |FROM kl GROUP BY 1 ORDER BY 1""".stripMargin,
    // d09 maintains the same keep-list incrementally — equality with the
    // batch ground truth IS the incremental-correctness proof.
    "d09_incremental_keeplist" -> keeplistOracleSql,
    // d11 maintains it under Structured Streaming — same proof obligation.
    "d11_streaming_keeplist" -> keeplistOracleSql,
    "t17_corpus_build" -> corpusBuildOracleSql,
    "s17_streaming_corpus" -> corpusBuildOracleSql,
    "d12_decontamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 8 THEN
        |    list_distinct([array_to_string(t[i:i+7], ' ') for i in range(1, len(t)-6)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, unnest(shingles) AS s8 FROM sh)
        |SELECT tr.doc_id AS train_id,
        |  count(DISTINCT tr.s8)::BIGINT AS n_shared_8grams,
        |  count(DISTINCT ev.doc_id)::BIGINT AS n_eval_docs_hit
        |FROM ex tr JOIN ex ev ON tr.s8 = ev.s8
        |WHERE tr.doc_id % 17 <> 0 AND ev.doc_id % 17 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  /** t17's ground truth: keep-list CC ⊕ 8-gram contamination ⊕ mix rule
    * in one recursive query (the 8-gram CTEs renamed to avoid clashing
    * with ccCtes' 5-gram shingle names).
    */
  private lazy val corpusBuildOracleSql: String =
    s"""$ccCtes,
       |lab AS (SELECT node, min(rep) AS cluster FROM cc GROUP BY node),
       |sh8 AS (
       |  SELECT doc_id, CASE WHEN len(t) >= 8 THEN
       |    list_distinct([array_to_string(t[i:i+7], ' ') for i in range(1, len(t)-6)])
       |    ELSE [] END AS shingles
       |  FROM toks),
       |ex8 AS (SELECT doc_id, unnest(shingles) AS s8 FROM sh8),
       |contam AS (
       |  SELECT DISTINCT tr.doc_id FROM ex8 tr JOIN ex8 ev ON tr.s8 = ev.s8
       |  WHERE tr.doc_id % 17 <> 0 AND ev.doc_id % 17 = 0),
       |flags AS (
       |  SELECT d.doc_id, d.source,
       |    len(string_split(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))), ' ')) AS n_tokens,
       |    d.doc_id = coalesce(l.cluster, d.doc_id) AS keep,
       |    d.doc_id IN (SELECT doc_id FROM contam) AS contam,
       |    CASE regexp_extract(d.source, '(\\d+)', 1)::INT % 4
       |      WHEN 0 THEN 150 WHEN 1 THEN 100 WHEN 2 THEN 50
       |      ELSE 20 END AS rate,
       |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 6))::BIGINT % 100 AS pct
       |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node
       |  WHERE d.doc_id % 17 <> 0),
       |mix AS (
       |  SELECT *, keep AND NOT contam AS surv,
       |    CASE WHEN keep AND NOT contam THEN (rate // 100)::BIGINT
       |      + (CASE WHEN pct < rate % 100 THEN 1 ELSE 0 END)::BIGINT
       |      ELSE 0 END AS n_copies
       |  FROM flags)
       |SELECT source, count(*)::BIGINT AS n_candidates,
       |  sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::BIGINT AS n_dup_dropped,
       |  sum(CASE WHEN keep AND contam THEN 1 ELSE 0 END)::BIGINT AS n_contam_dropped,
       |  sum(CASE WHEN surv THEN 1 ELSE 0 END)::BIGINT AS n_docs,
       |  sum(n_copies)::BIGINT AS n_emitted,
       |  sum(n_copies * n_tokens)::BIGINT AS emitted_tokens
       |FROM mix GROUP BY 1 ORDER BY 1""".stripMargin

  private lazy val softDedupOracleSql: String =
    s"""$ccCtes,
       |lab AS (SELECT node, min(rep) AS cluster FROM cc GROUP BY node),
       |docs AS (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
       |sz AS (SELECT cluster, count(*)::BIGINT AS cluster_size
       |       FROM docs GROUP BY 1)
       |SELECT doc_id, cluster, cluster_size,
       |  round(1.0::DOUBLE / cluster_size, 6) AS weight
       |FROM docs JOIN sz USING (cluster) ORDER BY doc_id""".stripMargin

  private lazy val keeplistOracleSql: String =
    s"""$ccCtes,
       |lab AS (SELECT node, min(rep) AS cluster FROM cc GROUP BY node)
       |SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster,
       |  d.doc_id = coalesce(l.cluster, d.doc_id) AS keep
       |FROM documents d LEFT JOIN lab l ON d.doc_id = l.node
       |ORDER BY d.doc_id""".stripMargin

  /** Shared ground truth for d06/d07/d08: recursive-CTE connected
    * components over the exact near-dup pair set.
    */
  private lazy val ccOracleSql: String =
    s"""$ccCtes
       |SELECT min(rep) AS cluster, node AS doc_id
       |FROM cc GROUP BY node ORDER BY cluster, doc_id""".stripMargin

  private lazy val ccCtes: String =
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t)-3)])
        |    ELSE [] END AS shingles
        |  FROM toks),
        |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
        |    a.n_sh AS n1, b.n_sh AS n2
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 4, 5
        |  HAVING round(count(*) / (a.n_sh + b.n_sh - count(*)), 6) >= 0.8),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION SELECT d2, d1 FROM pairs),
        |cc(node, rep) AS (
        |  SELECT DISTINCT src AS node, src AS rep FROM edges
        |  UNION
        |  SELECT e.dst, least(c.rep, e.dst) FROM cc c JOIN edges e ON c.node = e.src)""".stripMargin
}
