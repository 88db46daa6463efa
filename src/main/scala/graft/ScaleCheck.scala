package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Ad-hoc quality gates (sfdir = args(0), default sf1) for rows-only operators (recall/error bounds
  * normally spec-checked at sf0.001) — run manually, results recorded in
  * SCALE_r07.md. Not part of the driver contract.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val tag = d.split("/").last
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1","d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(ops.Dedup.d02_ngram_jaccard(s, d))
    val lsh = pairs(ops.Dedup.d03_minhash_lsh(s, d))
    println(f"[scale] d03 recall vs d02 at $tag: ${(exact & lsh).size.toDouble / exact.size}%.4f (${exact.size} exact pairs)")
    val sim = pairs(ops.Dedup.d04_simhash(s, d))
    println(f"[scale] d04 recall vs d02 at $tag: ${(exact & sim).size.toDouble / exact.size}%.4f")
    def top10(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = top10(ops.Similarity.v01_knn_brute(s, d))
    val ivf = top10(ops.Similarity.v02_knn_ivf(s, d))
    val trained = top10(ops.Similarity.v07_knn_ivf_trained(s, d))
    val serving = top10(ops.Similarity.v13_ann_serving(s, d))
    println(f"[scale] v02 recall@10 vs v01 at $tag: ${(brute & ivf).size / 10.0}%.2f")
    println(f"[scale] v07 recall@10 vs v01 at $tag: ${(brute & trained).size / 10.0}%.2f")
    println(s"[scale] v13 rows at $tag: ${serving.size}")
    // q38 approx rolling distinct vs q35 exact
    val ex35 = ops.Relational.queries("q35_rolling_distinct")(s, d)
      .collect().map(r => (r.get(0).toString, r.getAs[Number](1).longValue)).toMap
    val ap38 = ops.Relational.queries("q38_rolling_distinct_approx")(s, d)
      .collect().map(r => (r.get(0).toString, r.getAs[Number](1).longValue)).toMap
    val errs = ex35.map { case (k, v) => math.abs(ap38(k) - v).toDouble / math.max(v, 1) }
    println(f"[scale] q38 max rel err vs q35 at $tag: ${errs.max}%.4f over ${ex35.size} days")
    // t11 CMS heavy hitters vs exact at $tag (one-sided overcount bound)
    val hh = ops.TextAnalysis.queries("t11_heavy_hitters")(s, d).collect()
    val hhOk = hh.forall(r => r.getAs[Number](r.fieldIndex("n_est")).longValue
      >= r.getAs[Number](r.fieldIndex("n_exact")).longValue)
    println(s"[scale] t11 CMS one-sided bound holds at $tag: $hhOk over ${hh.length} tokens")
    // q32/q39 sketch accuracy
    val q32 = ops.Relational.queries("q32_approx_distinct")(s, d).collect()
    val q32err = q32.map(r => math.abs(r.getAs[Number](r.fieldIndex("n_approx")).doubleValue
      - r.getAs[Number](r.fieldIndex("n_exact")).doubleValue)
      / r.getAs[Number](r.fieldIndex("n_exact")).doubleValue).max
    println(f"[scale] q32 HLL max rel err at $tag: $q32err%.4f")
    // t18/t19 BPE: merge-table size, bound invariant, corpus compression
    val merges = ops.TextAnalysis.bpeTrain(s, d)
    val enc = ops.TextAnalysis.queries("t19_bpe_encode")(s, d).collect()
    val bounds = enc.forall(r => r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    val ratio = enc.map(_.getLong(2)).sum.toDouble / enc.map(_.getLong(3)).sum
    println(f"[scale] t18 merges learned at $tag: ${merges.size}; t19 bounds hold: $bounds; compression: $ratio%.4f over ${enc.length} docs")
    // round-9 third/fourth-pass rows-only lanes at scale
    val bq = top10(ops.Similarity.v21_binary_quantize(s, d))
    println(f"[scale] v21 BQ recall@10 vs v01 at $tag: ${(brute & bq).size / 10.0}%.2f")
    val mmr = ops.Similarity.v20_mmr_diversify(s, d).collect()
    println(s"[scale] v20 MMR rows at $tag: ${mmr.length} (rank1 = v01 top1: " +
      s"${mmr.head.getAs[Long]("vec_id") == ops.Similarity.v01_knn_brute(s, d)
        .collect().head.getLong(0)})")
    val m08n = ops.Multimodal.queries("m08_audio_segments")(s, d).count()
    println(s"[scale] m08 voiced segments at $tag: $m08n")
    // continuation-session lanes at scale
    val d21n = ops.Dedup.d21_substr_runs(s, d).count()
    println(s"[scale] d21 substring-run pairs at $tag: $d21n")
    val q68r = ops.Relational.q68_label_propagation(s, d).collect().head
    println(s"[scale] q68 LPA at $tag: ${q68r.getAs[Long]("n_communities")} " +
      s"communities over ${q68r.getAs[Long]("n_nodes")} nodes, " +
      f"modularity ${q68r.getAs[Double]("modularity")}%.4f")
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq
    println(s"[scale] s24 ≡ q44 at $tag: " +
      eq(streaming.StreamingQueries.s24_stream_funnel(s, d),
        ops.Relational.q44_funnel(s, d)))
    println(s"[scale] s25 ≡ q49 at $tag: " +
      eq(streaming.StreamingQueries.s25_stream_transitions(s, d),
        ops.Relational.q49_transition_matrix(s, d)))
    println(s"[scale] s26 ≡ q65 at $tag: " +
      eq(streaming.StreamingQueries.s26_stream_ewma(s, d),
        ops.Relational.q65_ewma(s, d)))
    s.stop()
  }
}
