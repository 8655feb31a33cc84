package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.io.Layout

/** Storage-layout specs: bucketed tables join without a shuffle, bucket
  * pruning reaches the scan, partitioned layouts prune at planning time.
  * AQE is disabled inside each plan assertion so the prepared physical
  * plan (post-EnsureRequirements) is the thing inspected — under AQE the
  * pre-execution plan carries no exchanges yet and the check would be
  * vacuous. */
class Ops23Spec extends SparkSpec {
  import spark.implicits._

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.length

  test("bucketed equi-join: zero Exchange on either side, results identical to the direct join") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val or = spark.read.parquet(s"$sf001/orders.parquet")
    val lt = Layout.bucketedTable(spark, li, "t23_li", "l_orderkey", 4)
    val ot = Layout.bucketedTable(spark, or, "t23_or", "o_orderkey", 4)
    withoutAqe {
      val j = Layout.bucketedEquiJoin(spark, lt, "l_orderkey", ot, "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      assert(shuffles(j) == 0,
        s"bucketed join must not shuffle:\n${j.queryExecution.executedPlan}")
      val direct = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      assert(rowSet(j) == rowSet(direct))
    }
  }

  test("mismatched bucket counts reintroduce an exchange (negative control)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val or = spark.read.parquet(s"$sf001/orders.parquet")
    val lt = Layout.bucketedTable(spark, li, "t23_li8", "l_orderkey", 8)
    val ot = Layout.bucketedTable(spark, or, "t23_or4", "o_orderkey", 4)
    withoutAqe {
      val j = Layout.bucketedEquiJoin(spark, lt, "l_orderkey", ot, "o_orderkey")
      assert(shuffles(j) >= 1)
    }
  }

  test("equality filter on the bucket key prunes to a single bucket") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val lt = Layout.bucketedTable(spark, li, "t23_li_pr", "l_orderkey", 4)
    val key = li.agg(min(col("l_orderkey"))).head().getLong(0)
    // a bare filter has no distribution requirement, so the auto-bucketed-
    // scan heuristic would fall back to a plain scan and silently drop the
    // bucket pruning this test pins — disable it for the assertion
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try withoutAqe {
      val q = spark.table(lt).where(col("l_orderkey") === key)
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      assert(scans.head.metadata.get("SelectedBucketsCount")
        .exists(_.contains("1 out of 4")),
        s"bucket pruning missing: ${scans.head.metadata}")
      assert(q.count() == li.where(col("l_orderkey") === key).count())
    } finally spark.conf
      .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("partitioned layout: partition filter prunes at planning time, results unchanged") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    val path = Layout.partitionedWrite(ev, "t23_events", "event_type")
    withoutAqe {
      val q = spark.read.parquet(path).where(col("event_type") === "click")
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
        s"expected a planning-time PartitionFilter:\n${q.queryExecution.executedPlan}")
      assert(q.count() == ev.where(col("event_type") === "click").count())
      // pruning is real: the selected files all live under the matching
      // partition directory
      val files = scans.head.relation.location
        .listFiles(scans.head.partitionFilters, Nil)
        .flatMap(_.files.map(_.getPath.toString))
      assert(files.nonEmpty && files.forall(_.contains("event_type=click")))
    }
  }

  test("nearDupsAgainst: best corpus match per probe, min-id tie break, no self-pairing") {
    import graft.ops.TextOps
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (10L, t),                                            // identical to probe 5
      (11L, t),                                            // tie at jaccard 1.0
      (12L, "zulu yankee xray whiskey victor uniform tango sierra"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (5L, t),                                             // dup of 10 and 11
      (15L, "quebec romeo india juliet kilo lima mike november"))
      .toDF("doc_id", "text")
    val r = TextOps.nearDupsAgainst(corpus, probe).collect()
    assert(r.length == 1)                                  // probe 15 has no match
    assert(r(0).getLong(0) == 5L && r(0).getLong(1) == 10L // tie → min match_id
      && r(0).getDouble(2) == 1.0)
    // partition invariance
    val a = rowSet(TextOps.nearDupsAgainst(corpus.repartition(1), probe.repartition(1)))
    val b = rowSet(TextOps.nearDupsAgainst(corpus.repartition(7), probe.repartition(3)))
    assert(a == b && a.nonEmpty)
  }

  test("normDedup: case/punctuation/whitespace variants hash together, exactDedup keeps them apart") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"))
      .toDF("doc_id", "text")
    val norm = TextOps.normDedup(docs).collect()
    assert(norm.length == 2)
    val hw = norm.find(_.getLong(1) == 3L).get
    assert(hw.getLong(2) == 1L)                       // keeper = min doc_id
    assert(TextOps.exactDedup(docs).count() == 4)     // un-normalized: all distinct
  }

  test("qualityKeeper: longest member wins, token-count ties break to min id, singletons kept") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a b c d e"),                              // 5 tokens
      (2L, "a b c d e f g h i"),                      // 9 tokens — tie with 3
      (3L, "z y x w v u t s r"),                      // 9 tokens
      (4L, "lone doc"))                               // singleton, 2 tokens
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_key", "cluster")
    val r = TextOps.qualityKeeper(docs, clusters).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((3L, 2L, 9L)))                   // 3 members, keeper 2 @ 9 tokens
    assert(r(4L) == ((1L, 4L, 2L)))
  }

  test("sqTopK: degenerate-exhaustive twin equals brute force; recall@5 floor; invariance") {
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(emb, q, 5)
    // candMult large enough that the candidate set is the whole corpus →
    // the exact re-rank IS brute force (pins the re-rank machinery)
    val n = emb.count().toInt
    assert(rowSet(Similarity.sqTopK(emb, q, 5, candMult = n)) == rowSet(brute))
    // default candMult=4: int8 quantization keeps recall@5 high
    val sq = Similarity.sqTopK(emb, q, 5)
    val bruteIds = brute.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sqIds = sq.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteIds intersect sqIds).size.toDouble / bruteIds.size
    assert(recall >= 0.8, s"SQ8 recall@5 $recall below floor")
    // partition invariance of the full plan
    assert(rowSet(Similarity.sqTopK(emb.repartition(13), q, 5)) == rowSet(sq))
  }

  test("BPE training: hand-computed merge sequence on the classic fixture; early stop; invariance") {
    import graft.ops.Bpe
    // Sennrich-style corpus: low×5 lower×2 newest×6 widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 5).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "e s", "es", 9L),       // es/st/t</w> tie at 9 → lexicographic
      (2, "es t", "est", 9L),
      (3, "est </w>", "est</w>", 9L),
      (4, "l o", "lo", 7L),       // lo/ow tie at 7
      (5, "lo w", "low", 7L)))
    // all-singleton pairs → nothing merge-worthy → early stop, empty table
    val singletons = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.train(singletons, 5).count() == 0)
    // partition invariance of the corpus pass
    val docs2 = Seq((1L, text), (2L, "")).toDF("doc_id", "text").repartition(7)
    assert(Bpe.train(docs2, 5).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      merges.map(m => (m._1, m._2)).toSeq)
  }

  test("BPE training restores the session shuffle/AQE conf it tunes for the round loop") {
    import graft.ops.Bpe
    // the round loop adopts the vocabulary table's own partition count and
    // turns AQE off for rounds 2+ (scheduling overhead on a vocab-sized
    // table); both settings must come back EXACTLY, even on early stop
    val before = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    val text = (Seq.fill(5)("low") ++ Seq.fill(6)("newest")).mkString(" ")
    assert(Bpe.train(Seq((1L, text)).toDF("doc_id", "text"), 3).count() == 3)
    assert((spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.adaptive.enabled")) == before,
      "train() leaked its loop conf into the session")
    assert(Bpe.train(Seq((1L, "ab cd")).toDF("doc_id", "text"), 3).count() == 0)
    assert((spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.adaptive.enabled")) == before,
      "early-stop path leaked the loop conf")
  }

  test("kmeans: two obvious clusters recovered, empty cluster keeps its centroid, invariance") {
    import graft.ops.Clustering
    def v(xs: Float*) = xs.toArray
    // ids 1-3 near the origin, ids 4-6 near (10, 10); init takes ids 1, 2
    // (both in the left blob) — one Lloyd round must still separate them
    val emb = Seq(
      (1L, v(0f, 0f)), (2L, v(1f, 0f)), (3L, v(0f, 1f)),
      (4L, v(10f, 10f)), (5L, v(11f, 10f)), (6L, v(10f, 11f)))
      .toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(emb, 2, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(Set(a(1L), a(2L), a(3L)).size == 1)
    assert(Set(a(4L), a(5L), a(6L)).size == 1)
    assert(a(1L) != a(4L))
    // k=3 over the same 6 points: at most 3 distinct labels, all rows kept
    val b = Clustering.kmeansAssign(emb, 3, 3)
    assert(b.count() == 6 && b.select("cid").distinct().count() <= 3)
    // partition invariance
    assert(rowSet(Clustering.kmeansAssign(emb.repartition(5), 2, 4)) ==
      rowSet(Clustering.kmeansAssign(emb, 2, 4)))
  }

  test("zorder parent arithmetic: level field rewritten, Morton prefix preserved") {
    import graft.geo.CellIndex
    // the q_zorder parent formula must equal encode(L-2, ix>>2, iy>>2)
    for ((ix, iy) <- Seq((0L, 0L), (127L, 127L), (5L, 99L), (64L, 1L))) {
      val cell = CellIndex.encode(7, ix, iy)
      val parent = (5L << 58) | ((cell & ((1L << 58) - 1)) >> 4)
      assert(parent == CellIndex.encode(5, ix >> 2, iy >> 2),
        s"parent mismatch at ($ix,$iy)")
    }
  }

  test("bucketedTable is overwrite-idempotent under one name") {
    val or = spark.read.parquet(s"$sf001/orders.parquet")
    val t = Layout.bucketedTable(spark, or, "t23_idem", "o_orderkey", 4)
    val n1 = spark.table(t).count()
    Layout.bucketedTable(spark, or, "t23_idem", "o_orderkey", 4)
    assert(spark.table(t).count() == n1 && n1 == or.count())
  }
}
