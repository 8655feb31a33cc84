package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline: PII
  * redaction, composite quality gating (C4/Gopher-style rule cascades),
  * source-mixing weights, deterministic split assignment, BM25
  * retrieval, and n-gram vocabulary building.
  *
  * All paths are pure column expressions (whole-stage codegen) except
  * the terminal aggregations; nothing explodes the corpus into a
  * (doc, token) stream unless the operator's output is itself
  * token-grained. Per-doc array scans are bounded by document length, so
  * partitions stay uniform at any corpus size.
  */
object Curation {

  /** Email / phone / IPv4 patterns shared by detection and redaction.
    * RE2-compatible (no backrefs/lookarounds) so the same pattern runs
    * under Java regex (Spark) and RE2 (DuckDB oracle) identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII detection + redaction: per-doc match counts on the raw text and
    * an MD5 witness of the scrubbed text (emails, then phones, then IPv4
    * are replaced by `<EMAIL>`/`<PHONE>`/`<IP>` placeholders — the order
    * is load-bearing only in that earlier placeholders must not create
    * later matches, which ASCII-tag placeholders cannot).
    * Single projection, no shuffle: runs at scan speed at any scale. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val t = col("text")
    val red = regexp_replace(
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).as("n_emails"),
      regexp_count(t, lit(PhoneRe)).as("n_phones"),
      regexp_count(t, lit(Ipv4Re)).as("n_ips"),
      md5(red).as("red_md5"))
  }

  /** Composite quality gate — a C4/Gopher-style rule cascade with the
    * FIRST violated rule recorded (the reason string downstream mixers
    * aggregate on). Rules, in order:
    *   too_short        n_tokens < minTokens
    *   no_stopword      none of TextOps.Stopwords present (C4's "must
    *                    look like prose" proxy)
    *   word_len         mean token length outside [minAvgLen, maxAvgLen]
    *   low_diversity    distinct-token ratio < minDistinct (Gopher)
    *   max_tok_ratio    most frequent token > maxTokRatio of the doc
    *                    (Gopher's top-unigram repetition rule)
    * Every metric is a per-doc array scan (the top-token count is
    * O(distinct·n) on a bounded doc) — one projection, zero shuffles.
    * All ratios are single IEEE divisions of exact ints, so keep/reason
    * are bit-stable across engines. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 25,
                    minAvgLen: Double = 3.8, maxAvgLen: Double = 5.2,
                    minDistinct: Double = 0.38,
                    maxTokRatio: Double = 0.12): DataFrame = {
    val ts = TextOps.tokens(col("text"))
    val n = size(ts)
    val nStop = size(filter(ts, t => t.isin(TextOps.Stopwords: _*)))
    val avgLen = aggregate(ts, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / n
    val distinctRatio = size(array_distinct(ts)).cast("double") / n
    val maxCnt = array_max(transform(array_distinct(ts),
      t => size(filter(ts, x => x === t))))
    val reason = when(n < minTokens, "too_short")
      .when(nStop === 0, "no_stopword")
      .when(avgLen < minAvgLen || avgLen > maxAvgLen, "word_len")
      .when(distinctRatio < minDistinct, "low_diversity")
      .when(maxCnt.cast("double") / n > maxTokRatio, "max_tok_ratio")
      .otherwise("ok")
    docs.select(col("doc_id"), n.cast("long").as("n_tokens"),
      reason.as("reason"),
      when(reason === "ok", 1L).otherwise(0L).as("keep"))
  }

  /** Temperature-style source-mixing weights: weight_s ∝ n_tokens_s^alpha
    * (alpha=1 → natural proportions, alpha→0 → uniform), plus the epoch
    * count each source runs at a given token budget. One groupBy(source)
    * (partial-agg combine) and a one-row broadcast of the normalizer —
    * the corpus is touched exactly once. */
  def mixWeights(docs: DataFrame, alpha: Double = 0.5,
                 budget: Long = 100000L): DataFrame = {
    val per = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    val z = per.agg(sum(pow(col("n_tokens"), alpha)).as("z"))
    per.crossJoin(broadcast(z)).select(
      col("source"), col("n_docs"), col("n_tokens"),
      round(pow(col("n_tokens"), alpha) / col("z"), 6).as("weight"),
      round(pow(col("n_tokens"), alpha) / col("z") * budget / col("n_tokens"), 6)
        .as("epochs"))
  }

  /** Deterministic train/val/test assignment by multiplicative hash of
    * doc_id (the q_topk_sample convention: Knuth constant mod the large
    * prime) — stable under repartitioning, reshuffling, and re-runs, no
    * RNG state. 18/1/1 buckets of 20 ≈ 90/5/5. Returns per (split,
    * source) doc and token counts (the shard-manifest view). */
  def splitAssign(docs: DataFrame): DataFrame = {
    val bucket = pmod(pmod(col("doc_id") * 2654435761L, lit(1000000007L)),
      lit(20L))
    val split = when(bucket < 18, "train")
      .when(bucket === 18, "val").otherwise("test")
    docs.select(split.as("split"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
  }

  /** BM25 top-k retrieval for a FIXED term set (the classic
    * Robertson/Sparck-Jones formulation, k1/b defaults). Because the
    * query terms are few and known, per-doc term frequencies come from
    * bounded array scans in ONE projection — the corpus is never
    * exploded to (doc, token) rows — and the corpus stats (N, avgdl,
    * per-term df) are a one-row broadcast. Scores sum in sorted-term
    * order (fixed association) and round to 6 dp BEFORE the top-k rank,
    * so cross-engine ulp noise cannot reorder the cutoff: ties break on
    * doc_id. Plan: scan → project → one-row agg ×2 → broadcast →
    * TakeOrderedAndProject. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val ts = terms.distinct.sorted
    val base = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .select(col("doc_id") +: size(col("ts")).cast("double").as("n_d") +:
        ts.map(t => size(filter(col("ts"), x => x === lit(t)))
          .cast("double").as(s"tf_$t")): _*)
    val dims = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("n_d")).as("avgdl") +:
        ts.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
          .cast("double").as(s"df_$t")): _*)
    val score = ts.map { t =>
      val tf = col(s"tf_$t")
      val df = col(s"df_$t")
      val idf = log(lit(1.0) + (col("n_docs") - df + 0.5) / (df + 0.5))
      when(tf > 0, idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("n_d") / col("avgdl"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    base.crossJoin(broadcast(dims))
      .select(col("doc_id"), round(score, 6).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** End-to-end curation decision — the final keep/drop manifest a
    * training pipeline materializes before sharding, composing the
    * engine's filter stages in the standard order with the FIRST failing
    * stage as the drop reason:
    *   exact_dup      not the min-doc_id keeper of its content hash
    *                  ([[TextOps.exactDedup]])
    *   quality:<rule> first violated [[qualityFilter]] rule
    *   contaminated   shares a k-gram with the held-out eval slice
    *                  ([[TextOps.contaminatedIds]])
    *   ok             keep
    * The eval slice (doc_id % evalMod == 0, the [[TextOps.contamination]]
    * convention) is never emitted — it is the benchmark, not training
    * data. Plan shape: one content-hash groupBy (uniform key), one
    * shuffle-free quality projection, one gram semi-join, then doc_id
    * equi-joins — every stage runs once, nothing corpus-sized crosses a
    * driver boundary, and the dedup keeper set joins back by id instead
    * of re-hashing text. */
  def keepManifest(docs: DataFrame, evalMod: Int = 20, k: Int = 13): DataFrame = {
    val train = docs.where(pmod(col("doc_id"), lit(evalMod)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(evalMod)) === 0)
    val keepers = TextOps.exactDedup(train)
      .select(col("keeper_id").as("doc_id"), lit(1).as("is_keeper"))
    val qual = qualityFilter(train).select(col("doc_id"), col("reason").as("q_reason"))
    val contam = TextOps.contaminatedIds(train, eval, k).withColumn("is_contam", lit(1))
    val reason = when(col("is_keeper").isNull, "exact_dup")
      .when(col("q_reason") =!= "ok", concat(lit("quality:"), col("q_reason")))
      .when(col("is_contam") === 1, "contaminated")
      .otherwise("ok")
    train.select(col("doc_id"))
      .join(keepers, Seq("doc_id"), "left")
      .join(qual, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), reason.as("reason"))
      .withColumn("keep", when(col("reason") === "ok", 1L).otherwise(0L))
  }

  /** Corpus top-k bigram vocabulary: adjacent-token pairs per doc
    * (zip_with over two slices — no index UDF), exploded once, counted
    * with map-side partial aggregation, ranked (count desc, gram asc) —
    * exact integer counts make the cutoff total-ordered and
    * engine-stable. */
  def vocabBigrams(docs: DataFrame, topK: Int = 30): DataFrame = {
    val ts = TextOps.tokens(col("text"))
    val m = greatest(size(ts) - 1, lit(0))
    val grams = zip_with(slice(ts, lit(1), m), slice(ts, lit(2), m),
      (a, x) => concat(a, lit(" "), x))
    docs.select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(topK)
  }
}
