package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Mix

/** Training-corpus assembly surface: deterministic stratified sampling,
  * domain-mixing plans, and train/benchmark contamination checks over
  * `documents` (BASELINE north star — the data-mixing layer of an LLM
  * pipeline, downstream of dedup/quality).
  */
object MixQueries {

  private def docs(s: SparkSession, d: String) = t(s, d, "documents")

  /** Hash-bucket rendering both engines agree on: md5's first 8 hex
    * chars as an integer mod 100 (md5 is content-stable; a seeded RNG
    * would not survive engine or partitioning changes). */
  private val BUCKET_SQL =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"

  // ---------------------------------------------------------------- s01
  // Deterministic stratified sampling: downsample dominant languages
  // (en 40%, zh 80%), keep the rest — the data-mixing rebalance step.
  val s01StratifiedSample: Q = Q(
    "s01_stratified_sample",
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE $BUCKET_SQL <
       |  CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.8 ELSE 1.0 END * 100
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Mix.stratifiedSample(docs(s, d), "doc_id", "lang",
        Map("en" -> 0.4, "zh" -> 0.8))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- s02
  // Domain-mixing plan: observed token share per language vs target
  // weights → capped sampling rate and resulting token budget.
  val s02MixPlan: Q = Q(
    "s02_mix_plan",
    """WITH per AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |  FROM documents GROUP BY lang),
      |shared AS (
      |  SELECT *, total_tokens / CAST(SUM(total_tokens) OVER () AS DOUBLE)
      |    AS raw_share FROM per)
      |SELECT lang, n_docs, total_tokens,
      |  ROUND(raw_share, 4) AS corpus_share,
      |  CAST(CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2 WHEN 'es' THEN 0.2
      |            WHEN 'fr' THEN 0.2 ELSE 0.1 END AS DOUBLE) AS target_weight,
      |  ROUND(LEAST(1.0, (CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2
      |      WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.2 ELSE 0.1 END)
      |    / raw_share), 4) AS sampling_rate,
      |  CAST(FLOOR(total_tokens * ROUND(LEAST(1.0,
      |      (CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2 WHEN 'es' THEN 0.2
      |       WHEN 'fr' THEN 0.2 ELSE 0.1 END) / raw_share), 4)) AS BIGINT)
      |    AS sampled_tokens
      |FROM shared ORDER BY lang""".stripMargin) { (s, d) =>
    // Weights mirror the oracle's CASE arms exactly; the ELSE arm (0.1,
    // covering zh today and any future stratum) is the defaultWeight.
    Mix.mixPlan(docs(s, d), "lang", size(split(col("text"), " ")),
        Map("en" -> 0.3, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2),
        defaultWeight = 0.1)
      .select("lang", "n_docs", "total_tokens", "corpus_share",
        "target_weight", "sampling_rate", "sampled_tokens")
      .orderBy("lang")
  }

  /** Shared DuckDB CTE chain ending in `pairs(train_doc, bench_doc,
    * n_shared)`: distinct word 5-grams → inverted index → train×bench
    * pairs sharing ≥3 grams (doc_id % 10 = 0 plays the held-out set).
    * c01 lists the pairs; c02 rolls them up per benchmark doc. */
  private[queries] val CONTAMINATION_CTES =
    """tok AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 3),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
      |           || ' ' || t[i+4])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 5),
      |ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS train_doc, b.doc_id AS bench_doc,
      |    COUNT(*) AS n_shared
      |  FROM (SELECT * FROM ex WHERE doc_id % 10 <> 0) a
      |  JOIN (SELECT * FROM ex WHERE doc_id % 10 = 0) b ON a.s = b.s
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)""".stripMargin

  // ---------------------------------------------------------------- c01
  // Train/benchmark contamination: training docs sharing ≥3 distinct
  // word 5-grams with a benchmark doc. The decontamination primitive,
  // as an inverted-index equi-join.
  val c01Contamination: Q = Q(
    "c01_contamination",
    // concatenation, not outer stripMargin: the CTE body has SQL `||`
    // continuation lines a second stripMargin would corrupt
    s"WITH $CONTAMINATION_CTES\n" +
      """SELECT train_doc, bench_doc, n_shared FROM pairs
        |ORDER BY train_doc, bench_doc""".stripMargin) { (s, d) =>
    Mix.contaminationPairs(docs(s, d), "doc_id", "text",
        col("doc_id") % 10 === 0, k = 5, minShared = 3)
      .orderBy("train_doc", "bench_doc")
  }

  // ---------------------------------------------------------------- c02
  // Decontamination report: EVERY benchmark doc with its contamination
  // status — how many training docs overlap it (≥3 shared 5-grams) and
  // the worst overlap — the per-eval-set summary a corpus owner signs
  // off on (c01 lists the pairs; this is the actionable rollup, and the
  // left join keeps clean docs visible rather than silently absent).
  val c02ContaminationReport: Q = Q(
    "c02_contamination_report",
    s"WITH $CONTAMINATION_CTES,\n" +
      """agg AS (
      |  SELECT bench_doc, COUNT(*) AS n_train_overlaps,
      |    MAX(n_shared) AS max_shared
      |  FROM pairs GROUP BY 1)
      |SELECT d.doc_id AS bench_doc,
      |  COALESCE(n_train_overlaps, 0) AS n_train_overlaps,
      |  COALESCE(max_shared, 0) AS max_shared,
      |  (n_train_overlaps IS NOT NULL) AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
      |LEFT JOIN agg ON agg.bench_doc = d.doc_id
      |ORDER BY bench_doc""".stripMargin) { (s, d) =>
    val pairs = Mix.contaminationPairs(docs(s, d), "doc_id", "text",
      col("doc_id") % 10 === 0, k = 5, minShared = 3)
    val agg = pairs.groupBy("bench_doc")
      .agg(count(lit(1)).as("n_train_overlaps"), max("n_shared").as("max_shared"))
    docs(s, d).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("bench_doc"))
      .join(agg, Seq("bench_doc"), "left")
      .select(col("bench_doc"),
        coalesce(col("n_train_overlaps"), lit(0L)).as("n_train_overlaps"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"),
        col("n_train_overlaps").isNotNull.as("contaminated"))
      .orderBy("bench_doc")
  }

  // ---------------------------------------------------------------- g01
  // End-to-end corpus assembly as ONE declarative plan: quality gate
  // (token count + punctuation ratio) → exact-dedup survivorship
  // (min-id keeper per content hash, applied as a semi-join) →
  // deterministic stratified downsample. The composed form is the point:
  // Catalyst fuses the gate into the scan, the dedup is one hash
  // aggregate + semi-join, the sample is a pushable predicate — the
  // whole training-corpus build stays a single shuffle-lean DAG.
  val g01CorpusGold: Q = Q(
    "g01_corpus_gold",
    s"""WITH q AS (
       |  SELECT doc_id, text, lang, source,
       |    len(string_split(text, ' ')) AS n_tokens
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) BETWEEN 30 AND 1000
       |    AND ROUND(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
       |          AS DOUBLE) / NULLIF(length(text), 0), 4) <= 0.1),
       |k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text))
       |SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM q JOIN k USING (doc_id)
       |WHERE $BUCKET_SQL <
       |  CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.8 ELSE 1.0 END * 100
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withTok = docs(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
    val quality = withTok.filter(
      col("n_tokens").between(30, 1000) &&
        graft.functions.TextFns.punctRatio(col("text")) <= 0.1)
    val keepers = quality.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = quality.join(keepers, Seq("doc_id"), "semi")
    Mix.stratifiedSample(deduped, "doc_id", "lang",
        Map("en" -> 0.4, "zh" -> 0.8))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens").cast("bigint").as("n_tokens"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- g02
  // The COMPLETE modern LLM corpus pipeline as one oracle-verified
  // statement — the funnel a training-data owner signs off on:
  //   training slice → near-dup dedup (MinHash+LSH clusters, drop
  //   non-representatives) → LM-perplexity quality gate (bigram model
  //   from the reference slice, xent ≤ 3.6) → benchmark
  //   decontamination (≥3 shared 5-grams) → per-source survivor and
  //   token counts at every stage.
  // Composes THREE independently hash-verified pipelines (d06's LSH
  // cluster chain, t11's LM chain with a ptok rename, c01's
  // contamination chain with ctok/cex/cpairs renames) plus the funnel
  // flags; both engines replay the entire construction, so the whole
  // corpus build is exact cross-engine.
  private def renamed(s: String, pairs: (String, String)*): String =
    pairs.foldLeft(s) { case (acc, (from, to)) =>
      acc.replaceAll("\\b" + from + "\\b", to)
    }

  val g02CorpusFunnel: Q = Q(
    "g02_corpus_funnel",
    s"WITH RECURSIVE ${DedupQueries.CLUSTER_CTES},\n" +
      renamed(TextQueries.PPL_CTES, "tok" -> "ptok") + ",\n" +
      renamed(CONTAMINATION_CTES,
        "tok" -> "ctok", "ex" -> "cex", "pairs" -> "cpairs") + ",\n" +
      """train AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents WHERE doc_id % 10 <> 0),
        |flags AS (
        |  SELECT train.source, train.n_tokens,
        |    CASE WHEN dup.id IS NULL THEN 1 ELSE 0 END AS keep_dedup,
        |    CASE WHEN s.xent IS NULL OR ROUND(s.xent, 4) <= 3.6
        |         THEN 1 ELSE 0 END AS keep_ppl,
        |    CASE WHEN ct.train_doc IS NULL THEN 1 ELSE 0 END AS keep_clean
        |  FROM train
        |  LEFT JOIN (SELECT id FROM cc WHERE id <> cluster_rep) dup
        |    ON dup.id = train.doc_id
        |  LEFT JOIN scored s ON s.doc_id = train.doc_id
        |  LEFT JOIN (SELECT DISTINCT train_doc FROM cpairs) ct
        |    ON ct.train_doc = train.doc_id)
        |SELECT source,
        |  COUNT(*) AS n_train,
        |  CAST(SUM(keep_dedup) AS BIGINT) AS n_after_dedup,
        |  CAST(SUM(keep_dedup * keep_ppl) AS BIGINT) AS n_after_ppl,
        |  CAST(SUM(keep_dedup * keep_ppl * keep_clean) AS BIGINT) AS n_final,
        |  CAST(SUM(keep_dedup * keep_ppl * keep_clean * n_tokens) AS BIGINT)
        |    AS tokens_final
        |FROM flags GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    g02Body(s, d, DedupQueries.lshPairs(s, d))
  }

  /** g02 body over an explicit near-dup pair source (the bench feeds
    * the materialized d00 stage; the catalog entry derives it inline). */
  def g02Body(s: SparkSession, d: String,
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val all = docs(s, d)
    val train = all.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val dups = graft.operators.Dedup.connectedComponents(pairs.select("i", "j"))
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"), lit(1).as("is_dup"))
    val (counts, ctx, vocab) = graft.operators.LangModel.train(
      all, "doc_id", "text", col("source").isin("src0", "src1"))
    val xent = graft.operators.LangModel
      .crossEntropy(all, "doc_id", "text", counts, ctx, vocab)
      .select(col("doc_id"), col("xent"))
    val contaminated = Mix.contaminationPairs(all, "doc_id", "text",
        col("doc_id") % 10 === 0, k = 5, minShared = 3)
      .select(col("train_doc").as("doc_id"), lit(1).as("is_contam"))
      .distinct()
    train
      .join(dups, Seq("doc_id"), "left")
      .join(xent, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("source"), col("n_tokens"),
        when(col("is_dup").isNull, 1).otherwise(0).as("keep_dedup"),
        when(col("xent").isNull || col("xent") <= 3.6, 1).otherwise(0)
          .as("keep_ppl"),
        when(col("is_contam").isNull, 1).otherwise(0).as("keep_clean"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_train"),
        sum("keep_dedup").cast("bigint").as("n_after_dedup"),
        sum(col("keep_dedup") * col("keep_ppl")).cast("bigint")
          .as("n_after_ppl"),
        sum(col("keep_dedup") * col("keep_ppl") * col("keep_clean"))
          .cast("bigint").as("n_final"),
        sum(col("keep_dedup") * col("keep_ppl") * col("keep_clean")
          * col("n_tokens")).cast("bigint").as("tokens_final"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- s03
  // Deterministic shard plan: content-stable hash → shard id, then the
  // per-shard balance profile (docs, tokens, id range) a writer uses to
  // size output files. Assignment is a pure projection — byte-identical
  // shards on re-run, any cluster size.
  val s03ShardPlan: Q = Q(
    "s03_shard_plan",
    """WITH a AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT % 8
      |      AS shard,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents)
      |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"), Mix.shardOf(col("doc_id"), 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard")
  }

  // ---------------------------------------------------------------- s04
  // Sequence packing: concat-in-id-order, chunk at 512 tokens, report
  // per-sequence fill. Spark computes the global prefix sum via
  // parallel bucketed cumsum + broadcast offsets (no single-partition
  // window); the oracle's plain SUM() OVER (ORDER BY doc_id) is the
  // independent formulation the distributed one must hash-match.
  val s04SequencePacking: Q = Q(
    "s04_sequence_packing",
    """WITH tk AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
      |c AS (
      |  SELECT doc_id, n,
      |    CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS prev_cum
      |  FROM tk),
      |a AS (
      |  SELECT doc_id, n, prev_cum // 512 AS seq_id,
      |    CASE WHEN (prev_cum + n - 1) // 512 > prev_cum // 512
      |         THEN 1 ELSE 0 END AS spans
      |  FROM c)
      |SELECT seq_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS tokens_started,
      |  CAST(SUM(spans) AS BIGINT) AS n_spanning
      |FROM a GROUP BY seq_id ORDER BY seq_id""".stripMargin) { (s, d) =>
    Mix.packSequences(docs(s, d), "doc_id",
        size(split(col("text"), " ")), 512, expr("doc_id div 100"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("tokens_started"),
        sum("spans").cast("bigint").as("n_spanning"))
      .orderBy("seq_id")
  }

  // ---------------------------------------------------------------- s05
  // Temperature sampling (α = 0.5): the multilingual-mix rebalance —
  // q_lang ∝ share^α lifts low-resource languages, boost = q/p is the
  // per-language up/down-sample factor. α fixed at 0.5 because sqrt is
  // IEEE-correctly-rounded in every engine while pow(x, 0.7) is a libm
  // call with no such guarantee (same reasoning as v05's floor). The
  // Σ sqrt(p) sum runs in DECIMAL so partial-aggregation ORDER cannot
  // wiggle the last float bits (double addition is non-associative).
  // Global totals via broadcast one-row aggregates, never SUM() OVER ().
  val s05TemperatureMix: Q = Q(
    "s05_temperature_mix",
    """WITH per AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS t FROM per),
      |shared AS (
      |  SELECT lang, n_docs, toks,
      |    toks * 1.0 / t AS p, sqrt(toks * 1.0 / t) AS sp
      |  FROM per CROSS JOIN tot),
      |s AS (
      |  SELECT CAST(SUM(CAST(sp AS DECIMAL(18,12))) AS DOUBLE) AS ssp
      |  FROM shared)
      |SELECT lang, n_docs, ROUND(p, 4) AS corpus_share,
      |  ROUND(sp / ssp, 4) AS temp_weight,
      |  ROUND((sp / ssp) / p, 4) AS boost
      |FROM shared CROSS JOIN s ORDER BY lang""".stripMargin) { (s, d) =>
    import graft.operators.ScalableWindow
    val per = docs(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("toks"))
    val withP = ScalableWindow.withGlobalShare(
        per, sum(col("toks")).as("t"), "p",
        (_, t) => col("toks") * lit(1.0) / t)
      .withColumn("sp", sqrt(col("p")))
    ScalableWindow.withGlobalShare(
        withP,
        sum(col("sp").cast(org.apache.spark.sql.types.DecimalType(18, 12)))
          .cast("double"),
        "temp_weight", (_, ssp) => col("sp") / ssp)
      .select(col("lang"), col("n_docs"),
        round(col("p"), 4).as("corpus_share"),
        round(col("temp_weight"), 4).as("temp_weight"),
        round(col("temp_weight") / col("p"), 4).as("boost"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- s06
  // Context-window chunking with stride (window 64, stride 48 → 16-token
  // overlap): turns variable-length documents into model-context-sized
  // training rows. Pure per-row explode — zero shuffle; the oracle
  // replays the identical start-offset and slice arithmetic.
  val s06DocChunks: Q = Q(
    "s06_doc_chunks",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, t,
      |    unnest(generate_series(0, n - 1, 48)) AS start
      |  FROM d WHERE n > 0)
      |SELECT doc_id,
      |  start // 48 AS chunk_idx,
      |  start AS start_token,
      |  CAST(len(list_slice(t, CAST(start + 1 AS INT), CAST(start + 64 AS INT))) AS BIGINT)
      |    AS n_chunk_tokens,
      |  array_to_string(list_slice(t, CAST(start + 1 AS INT), CAST(start + 64 AS INT)), ' ')
      |    AS chunk_text
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Mix.chunkTokens(docs(s, d), "doc_id", "text", window = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx")
  }

  // ---------------------------------------------------------------- s07
  // Per-source document cap: keep the top-5 docs per source by token
  // count — the per-domain quota every curation pipeline applies so no
  // single domain dominates the mix. Runs on the bounded topk_pairs
  // aggregate (map-side k-heap per source), NOT a row_number() window:
  // source cardinality is small, so the window form would funnel the
  // whole corpus through a handful of reducers — the exact shuffle
  // pathology the aggregate was built to remove.
  val s07SourceCap: Q = Q(
    "s07_source_cap",
    """WITH scored AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS sc
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, sc,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY sc DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT source, doc_id, CAST(sc AS BIGINT) AS n_tokens, rank
      |FROM ranked WHERE rank <= 5 ORDER BY source, rank""".stripMargin) { (s, d) =>
    import graft.functions.expressions.TopKPairs.topk_pairs
    docs(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("sc"))
      .groupBy("source")
      .agg(topk_pairs(col("sc"), col("doc_id"), 5).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("source"), col("p.id").as("doc_id"),
        col("p.score").cast("bigint").as("n_tokens"),
        (col("pos") + 1).as("rank"))
      .orderBy("source", "rank")
  }

  // ---------------------------------------------------------------- g03
  // Training-run prep, end to end at the TOKEN level: chunk documents
  // into 64-token windows (stride 48), keep only full chunks, score
  // each chunk under the t11 bigram LM (trained on the src0/src1
  // reference slice), drop high-perplexity chunks (xent > 3.5 on the
  // 4 dp-rounded value — rounding first makes the cut engine-exact),
  // and pack survivors into 256-token training sequences in global cid
  // order via the bucketed prefix sum. Output: one row per training
  // sequence with its chunk count, token count, and DECIMAL-averaged
  // chunk cross-entropy. Composes s06 + t11 + s04 — the last mile that
  // turns a curated corpus into model-ready sequences.
  val g03TrainingPrep: Q = Q(
    "g03_training_prep",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |chunks AS (
      |  SELECT cid, ct FROM (
      |    SELECT doc_id * 1000000 + start // 48 AS cid,
      |      list_slice(t, CAST(start + 1 AS INT), CAST(start + 64 AS INT)) AS ct
      |    FROM (SELECT doc_id, t, unnest(generate_series(0, n - 1, 48)) AS start
      |          FROM d WHERE n > 0))
      |  WHERE len(ct) = 64),
      |tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |refbig AS (
      |  SELECT t[i] AS w1, t[i+1] AS w2
      |  FROM tok, unnest(range(1, len(t))) r(i)
      |  WHERE len(t) >= 2 AND source IN ('src0', 'src1')),
      |counts AS (SELECT w1, w2, COUNT(*) AS c FROM refbig GROUP BY 1, 2),
      |ctx AS (SELECT w1, COUNT(*) AS n FROM refbig GROUP BY 1),
      |vocab AS (
      |  SELECT COUNT(DISTINCT u) AS v
      |  FROM (SELECT unnest(t) AS u FROM tok WHERE source IN ('src0', 'src1'))),
      |cbig AS (
      |  SELECT cid, ct[i] AS w1, ct[i+1] AS w2
      |  FROM chunks, unnest(range(1, 64)) r(i)),
      |cscore AS (
      |  SELECT cid,
      |    ROUND(CAST(-SUM(CAST(ln((COALESCE(c, 0) + 1) / (COALESCE(n, 0) + v))
      |        AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 4) AS xent
      |  FROM cbig
      |  LEFT JOIN counts USING (w1, w2)
      |  LEFT JOIN ctx USING (w1)
      |  CROSS JOIN vocab
      |  GROUP BY cid),
      |kept AS (SELECT cid, xent FROM cscore WHERE xent <= 3.5),
      |packed AS (
      |  SELECT cid, xent,
      |    64 * (ROW_NUMBER() OVER (ORDER BY cid) - 1) AS prev_cum
      |  FROM kept)
      |SELECT prev_cum // 256 AS seq_id,
      |  COUNT(*) AS n_chunks,
      |  CAST(64 * COUNT(*) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CAST(xent AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 4)
      |    AS avg_xent
      |FROM packed GROUP BY 1 ORDER BY seq_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val all = docs(s, d)
    // cid = doc_id·10⁶ + chunk_idx: collision-free up to a million
    // chunks per document (≈48M tokens at stride 48) while doc_ids up
    // to ~9.2·10¹² stay inside a signed 64-bit cid
    val chunks = Mix.chunkTokens(all, "doc_id", "text", window = 64, stride = 48)
      .filter(col("n_chunk_tokens") === 64)
      .select((col("doc_id") * 1000000L + col("chunk_idx")).as("cid"),
        col("chunk_text"))
    val refPred = col("source").isin("src0", "src1")
    val (counts, ctx, vocab) =
      graft.operators.LangModel.train(all, "doc_id", "text", refPred)
    // persisted: packSequences' bucket-offset collect AND the final join
    // both consume `kept` — unpersisted, the whole chunk + bigram-LM
    // scoring pipeline (the query's dominant cost) would run twice
    val kept = graft.CacheScope.persist(graft.operators.LangModel
      .crossEntropy(chunks, "cid", "chunk_text", counts, ctx, vocab)
      .filter(col("xent") <= 3.5)
      .select(col("cid"), col("xent")))
    val packed = Mix.packSequences(kept, "cid", lit(64L), 256L,
      expr("cid div 100000000"))
    packed.join(kept.withColumnRenamed("cid", "doc_id"), "doc_id")
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n").as("n_tokens"),
        round(sum(col("xent").cast(DecimalType(38, 18))).cast("double")
          / count(lit(1)), 4).as("avg_xent"))
      .orderBy("seq_id")
  }

  // ---------------------------------------------------------------- s08
  // Exact-count stratified sample: exactly 30 docs per language (or all
  // of a smaller stratum), chosen by content-stable md5 order — the
  // fixed-budget companion to s01's rate-based sampling. A seeded RNG
  // would not survive engine or partitioning changes; the hash order
  // is reproducible anywhere and unbiased w.r.t. content. The ranking
  // window partitions per stratum; at corpus scale the same shape runs
  // through topk_pairs when strata counts are small.
  val s08ExactSample: Q = Q(
    "s08_exact_sample",
    """WITH ranked AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM documents)
      |SELECT doc_id, lang, source, n_chars FROM ranked
      |WHERE rnk <= 30 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 30)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- s09
  // Curriculum sharding: order the corpus easy→hard (here: by n_chars —
  // the classic short-first curriculum — with doc_id as the total-order
  // tiebreak) and cut it into K contiguous difficulty shards. The rank
  // is an EXACT global ROW_NUMBER computed WITHOUT an unpartitioned
  // window: `ScalableWindow.globalRank` ranks inside `n_chars div 100`
  // buckets in parallel and adds per-bucket count offsets (driver fold
  // = one row per bucket — the runningTotal trick applied to ranking;
  // a naive ROW_NUMBER() OVER (ORDER BY …) funnels 100 TB through one
  // task). Output is every 50th curriculum checkpoint — thin enough to
  // read, dense enough that ANY off-by-one anywhere in the distributed
  // rank breaks the hash against DuckDB's true global window.
  val s09Curriculum: Q = Q(
    "s09_curriculum",
    """WITH ranked AS (
      |  SELECT doc_id, n_chars,
      |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank,
      |    COUNT(*) OVER () AS n
      |  FROM documents)
      |SELECT rank, doc_id, n_chars,
      |  CAST(((rank - 1) * 8) // n AS BIGINT) AS shard
      |FROM ranked WHERE rank % 50 = 0
      |ORDER BY rank""".stripMargin) { (s, d) =>
    import graft.operators.ScalableWindow
    val base = docs(s, d).select(col("doc_id"), col("n_chars"))
    val ranked = ScalableWindow.globalRank(
      base, expr("n_chars div 100"),
      Seq(col("n_chars"), col("doc_id")), "rank")
    val n = base.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .filter(col("rank") % 50 === 0)
      .select(col("rank"), col("doc_id"), col("n_chars"),
        expr("((rank - 1) * 8) div n").cast("long").as("shard"))
      .orderBy("rank")
  }

  // ---------------------------------------------------------------- s10
  // Token-budget corpus selection: take documents in best-first
  // quality-per-token order until 40% of the corpus token budget is
  // spent — the greedy knapsack every curated-pretraining mix runs.
  // Composes the two scale-safe global-window replacements end to end:
  // `globalRank` (bucketed exact ROW_NUMBER over (qpt DESC, doc_id) —
  // the bucket is the DESCENDING qpt coarsened, so it stays monotone in
  // the order) feeds `runningTotal` (bucketed exact cumulative tokens
  // in rank order) — no unpartitioned window anywhere, yet the
  // selection boundary is bit-exact against DuckDB's true global
  // SUM OVER. One summary row: any rank or cumulative error anywhere
  // in the corpus moves the boundary and fails the hash.
  val s10TokenBudget: Q = Q(
    "s10_token_budget",
    """WITH q AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
      |    ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4)
      |      AS qpt
      |  FROM documents),
      |total AS (SELECT SUM(n_tok) AS total_tok FROM q),
      |ranked AS (
      |  SELECT doc_id, n_tok, qpt,
      |    SUM(n_tok) OVER (ORDER BY qpt DESC, doc_id) AS cum
      |  FROM q),
      |sel AS (SELECT * FROM ranked CROSS JOIN total
      |        WHERE cum <= 0.4 * total_tok)
      |SELECT COUNT(*) AS n_selected,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
      |  MIN(qpt) AS min_qpt_selected,
      |  CAST(MAX(cum) AS BIGINT) AS boundary_cum
      |FROM sel""".stripMargin) { (s, d) =>
    import graft.operators.ScalableWindow
    // persisted (r15): `q` feeds the one-row total AND the rank chain —
    // each a separate query execution (globalRank/runningTotal collect
    // internally), so without the persist the tokenize pass runs once
    // per consumer. NOT widened: Par.wide ahead of the tokenize A/B'd
    // 1.42× slower (r15) — string_split is too cheap per row to pay for
    // the exchange (unlike the shingle/rolling-hash sites).
    val s10opt = s.conf.get("spark.graft.s10.opt", "true").toBoolean
    val q0 = docs(s, d).select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"),
        col("n_chars"))
      .withColumn("qpt",
        round(col("n_chars").cast("double") / col("n_tok"), 4))
      .select("doc_id", "n_tok", "qpt")
    val q = if (s10opt) graft.CacheScope.persist(q0) else q0
    val total = q.agg(sum("n_tok").as("total_tok"))
    val ranked = ScalableWindow.globalRank(
      q, expr("cast(-ceil(qpt * 10) as long)"),
      Seq(col("qpt").desc, col("doc_id")), "rank")
    val withCum = ScalableWindow.runningTotal(
      ranked, "rank", "n_tok", expr("rank div 500"), "cum", "__lag")
    withCum.crossJoin(broadcast(total))
      .filter(col("cum") <= lit(0.4) * col("total_tok"))
      .agg(count(lit(1)).as("n_selected"),
        sum("n_tok").cast("bigint").as("tokens_used"),
        min("qpt").as("min_qpt_selected"),
        max("cum").cast("bigint").as("boundary_cum"))
  }

  // ---------------------------------------------------------------- g04
  // The COMPLETE curation pass in one statement, every stage a proven
  // operator: model-scored quality filter (t17's LR) → exact dedup
  // (d01's md5-group, keep min doc_id) → greedy token budget at 60% of
  // the surviving corpus (s10's knapsack) → curriculum sharding of the
  // selection (s09's rank). The output is the 4-row per-shard
  // manifest a training run consumes. Scale shape: one map-only scoring
  // scan, one hash dedup, then every global ordering runs through the
  // bucketed `globalRank`/`runningTotal` primitives — the whole
  // pipeline has no unpartitioned window and exactly three shuffles
  // (dedup group, budget rank, shard rank). Any error in ANY stage —
  // a mis-scored doc, a surviving duplicate, a budget off-by-one, a
  // shard misassignment — moves a rollup cell and fails the hash.
  val g04CurationPipeline: Q = Q(
    "g04_curation_pipeline",
    """WITH f AS (
      |  SELECT doc_id, text, n_chars, string_split(text, ' ') AS tok,
      |    ROUND(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |          / NULLIF(length(text), 0), 4) AS punct_ratio
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id, text, n_chars, len(tok) AS n_tok, punct_ratio,
      |    ROUND(CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |          / NULLIF(len(tok), 0), 4) AS stopword_ratio,
      |    ROUND(ln(1 + len(tok)), 4) AS log_len
      |  FROM f),
      |kept AS (
      |  SELECT doc_id, text, n_chars, n_tok FROM feat
      |  WHERE ROUND(1 / (1 + exp(-(-2.0 + 0.55 * log_len
      |    - 6.0 * punct_ratio + 9.0 * stopword_ratio))), 4) >= 0.5),
      |dedup AS (
      |  SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars,
      |         MIN(n_tok) AS n_tok
      |  FROM kept GROUP BY md5(text)),
      |scored AS (
      |  SELECT doc_id, n_tok,
      |    ROUND(CAST(n_chars AS DOUBLE) / n_tok, 4) AS qpt
      |  FROM dedup),
      |total AS (SELECT SUM(n_tok) AS t FROM scored),
      |ranked AS (
      |  SELECT doc_id, n_tok,
      |    SUM(n_tok) OVER (ORDER BY qpt DESC, doc_id) AS cum
      |  FROM scored),
      |sel AS (SELECT doc_id, n_tok FROM ranked CROSS JOIN total
      |        WHERE cum <= 0.6 * t),
      |nsel AS (SELECT COUNT(*) AS n FROM sel),
      |shards AS (
      |  SELECT doc_id, n_tok,
      |    ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS rank
      |  FROM sel)
      |SELECT CAST(((rank - 1) * 4) // n AS BIGINT) AS shard,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  CAST(MIN(n_tok) AS BIGINT) AS min_tok,
      |  CAST(MAX(n_tok) AS BIGINT) AS max_tok
      |FROM shards CROSS JOIN nsel
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.operators.ScalableWindow
    import graft.functions.TextFns.{tokens, punctRatio, markerHits}
    val stops = Seq("the", "a", "of", "and", "to")
    // widened (r15): the scoring scan (tokenize + punct regex + LR) is
    // the pipeline's heaviest per-row stage and the scan unsplittable
    val g04opt = s.conf.get("spark.graft.g04.opt", "true").toBoolean
    val g04src = if (g04opt) graft.operators.Par.wide(docs(s, d)) else docs(s, d)
    val base = g04src.select(
      col("doc_id"), col("text"), col("n_chars"),
      tokens(col("text")).as("tok"),
      punctRatio(col("text")).as("punct_ratio"))
    val feat = base.select(
      col("doc_id"), col("text"), col("n_chars"),
      size(col("tok")).as("n_tok"), col("punct_ratio"),
      round(markerHits(col("tok"), stops).cast("double")
        / nullif(size(col("tok")).cast("bigint"), lit(0)), 4)
        .as("stopword_ratio"),
      round(log(lit(1) + size(col("tok"))), 4).as("log_len"))
    val z = lit(-2.0) + lit(0.55) * col("log_len") -
      lit(6.0) * col("punct_ratio") + lit(9.0) * col("stopword_ratio")
    val kept = feat
      .filter(round(lit(1) / (lit(1) + exp(-z)), 4) >= 0.5)
    val dedup = kept.groupBy(md5(col("text")))
      .agg(min("doc_id").as("doc_id"), min("n_chars").as("n_chars"),
        min("n_tok").as("n_tok"))
    // persisted (r15): `scored` feeds the one-row total, the budget
    // rank, and (via `sel`) the shard rank + nsel — four consumers, each
    // in its own query execution (the ScalableWindow collects), so
    // without the persist the whole score→dedup pipeline re-runs per
    // consumer (profiled: Σ task 11.7 s for a ~2.6 s pipeline)
    val scored0 = dedup.select(col("doc_id"), col("n_tok"),
      round(col("n_chars").cast("double") / col("n_tok"), 4).as("qpt"))
    val scored = if (g04opt) graft.CacheScope.persist(scored0) else scored0
    val total = scored.agg(sum("n_tok").as("t"))
    val budgetRanked = ScalableWindow.globalRank(
      scored, expr("cast(-ceil(qpt * 10) as long)"),
      Seq(col("qpt").desc, col("doc_id")), "brank")
    val withCum = ScalableWindow.runningTotal(
      budgetRanked, "brank", "n_tok", expr("brank div 500"),
      "cum", "__lag")
    val sel = withCum.crossJoin(broadcast(total))
      .filter(col("cum") <= lit(0.6) * col("t"))
      .select("doc_id", "n_tok")
    val nsel = sel.agg(count(lit(1)).as("n"))
    val shards = ScalableWindow.globalRank(
      sel, expr("n_tok div 50"),
      Seq(col("n_tok"), col("doc_id")), "rank")
    shards.crossJoin(broadcast(nsel))
      .groupBy(expr("((rank - 1) * 4) div n").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("bigint").as("tokens"),
        min("n_tok").cast("bigint").as("min_tok"),
        max("n_tok").cast("bigint").as("max_tok"))
      .orderBy("shard")
  }

  // ---------------------------------------------------------------- s11
  // Weighted sample without replacement (Mix.weightedSample —
  // Efraimidis–Spirakis exponential clocks): 200 docs drawn with
  // inclusion probability ∝ n_chars, the "sample long documents more"
  // draw a token-budgeted mix uses. The uniform is md5-derived so both
  // engines replay the identical draw; the selection is a top-k
  // (per-partition heaps), never a global sort. DuckDB recomputes
  // −ln(u)/w from the same md5 and must select the same 200 ids.
  val s11WeightedSample: Q = Q(
    "s11_weighted_sample",
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |         + 1.0) / 1152921504606846976.0)
      |      / CAST(n_chars AS DOUBLE) AS wkey
      |  FROM documents
      |  ORDER BY wkey, doc_id LIMIT 200)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Mix.weightedSample(
        docs(s, d).select("doc_id", "lang", "source", "n_chars"),
        "doc_id", col("n_chars"), 200)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(s01StratifiedSample, s02MixPlan, c01Contamination,
    c02ContaminationReport, g01CorpusGold, g02CorpusFunnel, s03ShardPlan,
    s04SequencePacking, s05TemperatureMix, s06DocChunks, s07SourceCap,
    g03TrainingPrep, s08ExactSample, s09Curriculum, s10TokenBudget,
    g04CurationPipeline, s11WeightedSample)
}
