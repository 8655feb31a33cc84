package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** Sequence packing + token-budget mixing — the two ordered-prefix-sum
  * stages of a training-data pipeline (pack the token stream into fixed
  * context windows; cap each source at a token budget).
  *
  * Both need a GLOBAL running sum in id order, and the naive Spark
  * spelling — `sum(v).over(Window.orderBy(id))` — is a scale killer: an
  * unpartitioned window funnels the whole corpus through ONE task. The
  * [[scan]] here is the classic two-phase distributed scan instead:
  *
  *  1. bucket rows by EXPLICIT contiguous id ranges — `(id - min) div
  *     width` — not by Spark's sampled `repartitionByRange` boundaries.
  *     The bucket is a pure function of the id and two constants, so no
  *     two jobs can ever disagree about which bucket a row is in:
  *     correctness is partition- and recompute-invariant by construction
  *     (sampled range boundaries would have to be pinned across the
  *     subtotal and main jobs; these never can drift). Bucket BALANCE
  *     (not correctness) assumes ids are roughly uniform over
  *     [min, max] — true for ingest-assigned dense ids; feed a rank
  *     (`Ids.denseIndex`) instead if production ids are pathologically
  *     clustered.
  *  2. one tiny aggregation job computes per-(group, bucket) subtotals —
  *     ≤ `nBuckets × |groups|` rows on the driver — whose exclusive
  *     prefix sums become broadcast per-bucket offsets.
  *  3. the main pass runs the running sum per (group, bucket) — parallel
  *     across buckets, each ~corpus/nBuckets wide — and adds the offset.
  *
  * Wide data sees one hash exchange on (group, bucket) + per-bucket sort;
  * nothing global, nothing driver-side beyond the subtotal rows.
  */
object Packing {

  /** Adds `cum` = inclusive running sum of `valCol` ordered by `idCol`
    * within each `groupCols` combination (global when `groupCols` empty).
    * `valCol` must be non-negative; `idCol` must be unique per group. */
  private[ops] def scan(df: DataFrame, idCol: String, valCol: String,
                        groupCols: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    // lazy local blocks: the subtotal job materializes the (narrow)
    // projection once and the main pass reuses it; recompute under
    // reliable mode is deterministic, so ephemeral is the right trade
    val base = Checkpoints.ephemeral(df)
    val mm = base.agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx")).head()
    if (mm.isNullAt(0)) return base.withColumn("cum", lit(0L)).limit(0)
    val mn = mm.getLong(0)
    val width = math.max(1L, (mm.getLong(1) - mn) / nBuckets + 1)
    val bktExpr = expr(s"(($idCol - $mn) div $width)")

    val subtot = base.withColumn("_bkt", bktExpr)
      .groupBy((groupCols :+ "_bkt").map(col): _*)
      .agg(sum(col(valCol)).cast("long").as("_tot"))
    val offRows = subtot.collect()
      .groupBy(r => groupCols.map(r.getAs[Any])).values.flatMap { grp =>
        var acc = 0L
        grp.sortBy(_.getAs[Long]("_bkt")).map { r =>
          val off = acc; acc += r.getAs[Long]("_tot")
          Row.fromSeq(groupCols.map(r.getAs[Any]) :+ r.getAs[Long]("_bkt") :+ off)
        }
      }.toSeq
    val offSchema = StructType(
      subtot.schema.fields.dropRight(1) :+ StructField("_off", LongType))
    val offDf = spark.createDataFrame(offRows.asJava, offSchema)

    val w = Window.partitionBy((groupCols :+ "_bkt").map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("_bkt", bktExpr)
      .withColumn("_lc", sum(col(valCol)).over(w))
      .join(broadcast(offDf), groupCols :+ "_bkt")
      .withColumn("cum", col("_lc") + col("_off"))
      .drop("_bkt", "_lc", "_off")
  }

  /** Greedy sequence packing: concatenate the corpus token stream in
    * doc_id order and split it into fixed `contextLen`-token windows
    * (documents straddle window boundaries — the standard pretraining
    * packing that wastes zero tokens to padding). One output row per
    * (window, document) overlap: the window id, the document's start
    * offset WITHIN that window (`start_tok`), the offset within the
    * DOCUMENT where the piece begins (`doc_off` — what a shard writer
    * slices by), and how many tokens land there. Empty documents are
    * dropped (they occupy no window positions). */
  def pack(docs: DataFrame, contextLen: Int, nBuckets: Int = 256): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val base = docs.select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    val cum = scan(base, "doc_id", "n_tokens", Nil, nBuckets)
    val L = lit(contextLen.toLong)
    val cs = col("cum") - col("n_tokens") // global offset of the doc's first token
    cum
      .withColumn("win_id", explode(sequence(
        expr(s"(cum - n_tokens) div $contextLen"),
        expr(s"(cum - 1) div $contextLen"))))
      .select(
        col("win_id"), col("doc_id"),
        (greatest(cs, col("win_id") * L) - col("win_id") * L).as("start_tok"),
        (greatest(cs, col("win_id") * L) - cs).as("doc_off"),
        (least(col("cum"), (col("win_id") + 1) * L) -
          greatest(cs, col("win_id") * L)).as("n_toks"))
  }

  /** Shard assembly on top of [[pack]]: the actual `contextLen`-token
    * text of every window (one row per window — what a training-shard
    * writer streams out). The piece plan joins back to the documents on
    * doc_id (equi-join, co-partitionable), each piece is sliced out of
    * its document's token array in codegen (`slice`), and pieces
    * concatenate per window via a sorted collect_list — bounded at
    * `contextLen` tokens per group by construction, so the aggregation
    * state can never blow up on a skewed key. */
  def assembleWindows(docs: DataFrame, contextLen: Int,
                      nBuckets: Int = 256): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
    pack(docs, contextLen, nBuckets).join(toks, "doc_id")
      .select(col("win_id"), col("start_tok"),
        array_join(slice(col("ts"), (col("doc_off") + 1).cast("int"),
          col("n_toks").cast("int")), " ").as("ptxt"),
        col("n_toks"))
      .groupBy("win_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("start_tok"), col("ptxt")))),
          s => s.getField("ptxt")), " ").as("wtext"),
        sum("n_toks").as("n_toks"))
  }

  /** Token-budget mixing: per `groupCol` (language, source, …), keep
    * whole documents in doc_id order while the group's cumulative token
    * count stays within `budget` — the fixed-token-quota counterpart of
    * [[Sampling.stratifiedTopK]]'s fixed-row quotas. Deterministic and
    * partition-invariant (the scan is); a doc that would cross the budget
    * is dropped along with everything after it in its group. */
  def tokenBudget(docs: DataFrame, groupCol: String, budget: Long,
                  nBuckets: Int = 256): DataFrame = {
    val base = docs.select(
        col(groupCol), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    scan(base, "doc_id", "n_tokens", Seq(groupCol), nBuckets)
      .where(col("cum") <= budget)
      .select(col(groupCol), col("doc_id"), col("n_tokens"),
        col("cum").as("cum_tokens"))
  }
}
