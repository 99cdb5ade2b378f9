package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColFns.dec2

/** Data-mixing operators for training-corpus assembly: deterministic
  * stratified sampling, domain-weight planning, and train/benchmark
  * contamination detection.
  *
  * Scale design (100 TB): sampling is a pure per-row predicate on a
  * content-stable hash — no shuffle, no state, reproducible across runs
  * and engines (md5, not a seeded RNG, so adding executors or reordering
  * input cannot change the sample). The mixing plan aggregates one row
  * per stratum; contamination reuses the dedup inverted-index join, so
  * the pair space is bounded by shared-shingle occupancy rather than
  * |train| × |benchmark|.
  */
object Mix {

  /** Uniform [0,100) bucket from a content-stable hash of the id —
    * `md5`'s first 8 hex chars as an integer, mod 100. Both engines
    * compute the identical bucket, so the sample is oracle-reproducible.
    */
  def hashBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Weighted sample WITHOUT replacement (Efraimidis & Spirakis, IPL
    * 97(5) 2006, exponential-clocks form): each row draws
    * `key = −ln(u) / w` with `u` a content-stable md5-derived uniform
    * in (0, 1], and the k SMALLEST keys win — inclusion probability
    * proportional to weight, one pass, no replacement bookkeeping.
    *
    * Scale shape: the selection is a top-k (TakeOrderedAndProject —
    * per-partition k-heaps, one k-row merge on the driver), NEVER a
    * global sort or unpartitioned window. The md5 uniform makes the
    * draw reproducible across engines, partitionings, and task
    * retries — a seeded RNG is none of those. (ln is the one
    * non-correctly-rounded IEEE op in the key; engines may disagree in
    * the last ulp, which matters only if the k-th and k+1-th keys
    * collide within ~1e-16 relative — vanishing for continuous keys.)
    *
    * @param weight strictly positive weight column — ENFORCED in the
    *               key expression: a null/zero/negative weight (or a
    *               null id) would otherwise produce a null/-Inf sort
    *               key that silently dominates the draw, so contract
    *               violations fail the job loudly instead of biasing
    *               the sample */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") + lit(1.0)) / lit(1152921504606846976.0)
    val w = weight.cast("double")
    val guarded = when(isnull(assert_true(
        w.isNotNull && w > 0.0 && col(idCol).isNotNull,
        lit("weightedSample: weight must be a strictly positive " +
          "non-null value and the id non-null — a violating row would " +
          "silently dominate the draw"))), w)
    df.withColumn("__wkey", -log(u) / guarded)
      .orderBy(col("__wkey"), col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Keep a deterministic `rate(stratum)` fraction of rows per stratum.
    * `rates` maps stratum value → keep-rate in [0,1]; absent strata keep
    * everything. One narrow projection + filter: fully pushable, no
    * shuffle, stable under repartitioning.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate * 100)
  }

  /** Domain-mixing plan: per stratum, observed token share vs target
    * weight → sampling rate (capped at 1) and the token count that rate
    * yields. `tokenCount` is the per-row token count expression;
    * `weights` the target mix. Global share comes from a broadcast
    * one-row aggregate (ScalableWindow), not an unpartitioned window.
    */
  def mixPlan(df: DataFrame, strataCol: String, tokenCount: Column,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    // defaultWeight is explicit (no silent 0.0): a stratum absent from
    // the map must get the SAME weight the oracle's CASE...ELSE gives it.
    val weight = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, w)) =>
      when(col(strataCol) === k, lit(w)).otherwise(acc)
    }
    val perStratum = df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount).cast("long").as("total_tokens"))
    ScalableWindow.withGlobalShare(
        perStratum, sum(col("total_tokens")), "corpus_share",
        (_, total) => col("total_tokens") / total.cast("double"))
      .withColumn("target_weight", weight)
      .withColumn("sampling_rate",
        round(least(lit(1.0), col("target_weight") / col("corpus_share")), 4))
      .withColumn("sampled_tokens",
        floor(col("total_tokens") * col("sampling_rate")).cast("long"))
      .withColumn("corpus_share", round(col("corpus_share"), 4))
  }

  /** Train/benchmark contamination: (train doc, benchmark doc) pairs
    * sharing ≥ `minShared` distinct word k-grams. The benchmark side is
    * selected by `benchPred`; both sides come from ONE shingle pass
    * split by the predicate, joined through the shingle-keyed inverted
    * index (the n-gram-overlap decontamination step of a training
    * pipeline, run as a bounded equi-join).
    */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, k: Int = 5, minShared: Int = 3): DataFrame = {
    val ex = Dedup.shingleSets(docs, idCol, textCol, k)
      .withColumn("is_bench", benchPred)
      .select(col(idCol), col("is_bench"), explode(col("sh")).as("s"))
    val train = ex.filter(!col("is_bench"))
      .select(col(idCol).as("train_doc"), col("s"))
    val bench = ex.filter(col("is_bench"))
      .select(col(idCol).as("bench_doc"), col("s"))
    train.join(bench, "s")
      .groupBy("train_doc", "bench_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deterministic shard assignment from a content-stable hash of the id
    * (md5 hex chars 9–16, disjoint from [[hashBucket]]'s 1–8 so sampling
    * and sharding stay independent). A pure projection: the write path
    * is `repartition(nShards, shard)` + `partitionBy("shard")` — shard
    * membership never depends on executor count or input order, so a
    * re-run writes byte-identical shards.
    */
  def shardOf(idCol: Column, nShards: Int): Column =
    conv(substring(md5(idCol.cast("string")), 9, 8), 16, 10)
      .cast("long") % nShards

  /** Context-window chunking with stride: split each document's token
    * stream into windows of `window` tokens starting every `stride`
    * tokens (overlap = window − stride) — the standard prep that turns
    * variable-length documents into model-context-sized training rows
    * while the overlap preserves cross-boundary continuations.
    *
    * Semantics (deterministic, oracle-replayable): one chunk per start
    * offset 0, stride, 2·stride, … for every start < n_tokens; the last
    * chunks are shorter than `window` (truncation is the caller's
    * policy — a `n_chunk_tokens = window` filter drops ragged tails).
    *
    * Scale: explode of a per-row sequence — no shuffle at all; output
    * rows ≈ corpus_tokens / stride, each carrying one chunk. Returns
    * (doc_id, chunk_idx, start_token, n_chunk_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0,
      s"window and stride must be positive: window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFns.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__t"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("__pos", "__start")))
      .select(col("doc_id"),
        col("__pos").cast("long").as("chunk_idx"),
        col("__start").cast("long").as("start_token"),
        slice(col("__t"), col("__start") + 1, lit(window)).as("__ct"))
      .select(col("doc_id"), col("chunk_idx"), col("start_token"),
        size(col("__ct")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__ct")).as("chunk_text"))
  }

  /** GPT-style sequence packing: documents are concatenated in a global
    * deterministic order (by id) and chunked into fixed `seqLen`-token
    * training sequences; each document is assigned the sequence its
    * first token lands in, plus whether it spans into the next one.
    *
    * The global prefix sum is the scale problem (a naive
    * `SUM() OVER (ORDER BY id)` single-partitions the corpus). Same
    * cure as [[ScalableWindow.runningTotal]]: cumsum inside coarse id
    * buckets in parallel, then add per-bucket offsets folded driver-side
    * from one row per bucket. All token arithmetic is exact 64-bit.
    *
    * CONTRACT on `bucketOf`: it must be non-null and MONOTONE
    * non-decreasing in `idCol` (e.g. `doc_id div 1000`) — the offsets
    * fold assumes bucket b's docs all precede bucket b+1's in the
    * global id order. Both properties are VALIDATED from the same
    * one-row-per-bucket aggregate the fold already reads (per-bucket
    * [min, max] doc_id ranges must be disjoint and ordered);
    * violations throw IllegalArgumentException instead of silently
    * packing in the wrong order.
    *
    * Returns (doc_id, n, prev_cum, seq_id, spans).
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
      seqLen: Long, bucketOf: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: feeds both the windowed cumsum and the per-bucket
    // totals — without it the scan + tokenCount expression runs twice
    // (CacheScope-tracked; wrap consumption in withScope to release)
    val base = graft.CacheScope.persist(
      docs.select(col(idCol).as("doc_id"),
        tokenCount.cast("long").as("n"), bucketOf.cast("long").as("__bucket")))
    val w = Window.partitionBy("__bucket").orderBy("doc_id")
    val inBucket = base.withColumn("__cum",
      sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perBucket = base.groupBy("__bucket")
      .agg(sum("n").as("__tot"), min("doc_id").as("__lo"), max("doc_id").as("__hi"))
      .orderBy("__bucket")
      .collect() // one row per id bucket, not per doc
    require(!perBucket.exists(_.isNullAt(0)),
      "packSequences: bucketOf produced NULL — every doc needs a bucket")
    perBucket.sliding(2).foreach {
      case Array(p, c) =>
        require(p.getLong(3) < c.getLong(2),
          s"packSequences: bucketOf is not monotone in doc_id — bucket " +
            s"${p.getLong(0)} spans up to doc ${p.getLong(3)} but bucket " +
            s"${c.getLong(0)} starts at doc ${c.getLong(2)}")
      case _ =>
    }
    var running = 0L
    val offsets = perBucket.map { r =>
      val off = running
      if (!r.isNullAt(1)) running += r.getLong(1)
      org.apache.spark.sql.Row(r.getLong(0), off)
    }
    import scala.jdk.CollectionConverters._
    val offDf = docs.sparkSession.createDataFrame(
      offsets.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__obucket",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__offset",
          org.apache.spark.sql.types.LongType))))
    inBucket.join(broadcast(offDf), col("__bucket") === col("__obucket"))
      .withColumn("prev_cum", col("__offset") + col("__cum") - col("n"))
      .withColumn("seq_id", expr(s"prev_cum div $seqLen"))
      .withColumn("spans",
        (expr(s"(prev_cum + n - 1) div $seqLen") > col("seq_id")).cast("int"))
      .drop("__bucket", "__cum", "__obucket", "__offset")
  }

  /** 7-day (or any `windowDays`) rolling aggregate over a date-grain
    * frame via a bounded-fanout self-join — each row joins at most
    * `windowDays` others, so the plan scales with days × window, never
    * funnels through a global ordered window. Returns (day, n_days,
    * win_total, win_avg). */
  def rollingDays(daily: DataFrame, dayCol: String, valueCol: String,
      windowDays: Int = 7): DataFrame = {
    val a = daily.select(col(dayCol).as("day"))
    val b = daily.select(col(dayCol).as("bday"), col(valueCol).as("bval"))
    a.join(b, col("bday") >= date_sub(col("day"), windowDays - 1) &&
        col("bday") <= col("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_days"),
        sum(dec2(col("bval"))).cast("double").as("win_total"),
        round(sum(dec2(col("bval"))).cast("double") / count(lit(1)), 2)
          .as("win_avg"))
  }
}
