package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.{Ann, Dedup, Multimodal}

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search, text analysis, multimodal plumbing.
  *
  * Hash-heuristic operators (MinHash/SimHash/LSH — xxhash64-based) have
  * no DuckDB-expressible oracle; they emit single-row stats (rows>0 for
  * the driver's weaker check) and are instead verified in ScalaTest
  * (e.g. LSH recall vs brute force, known near-dup fixtures).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val EmbDim = 64

  val defs: Map[String, Q] = Map(

    // Exact dedup: normalize → sha256 → one agg pass. Oracle-checked.
    "dd1_exact_dedup" -> ((s, dir) => {
      Dedup.exactStats(t(s, dir, "documents"), col("text"))
    }),

    // Order-insensitive fingerprint (sorted-token sha256) per doc. Oracle-checked.
    "dd2_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), T.sortedTokenFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // MinHash-LSH near-dup stats: banded candidates → exact-Jaccard
    // verify — candidate count and verified count from ONE pipeline
    // (the signature pass runs once).
    "dd3_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minhashScoredCandidates(docs, "doc_id", "text")
        .agg(count(lit(1)).as("n_candidate_pairs"),
          sum(when(col("jaccard") >= 0.7, 1).otherwise(0)).as("n_near_dups"))
    }),

    // SimHash near-dup stats: banded hamming buckets.
    "dd4_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.simhashWide(docs, "doc_id", "text")
      val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      sigs.agg(count(lit(1)).as("n_docs"), countDistinct(col("sig")).as("n_distinct_sig"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_near_pairs")))
    }),

    // n-gram Jaccard near-dup: LSH candidates verified with word-3-gram
    // Jaccard (the all-pairs-free composition).
    "dd5_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dups = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5, shingleK = 3)
      dups.agg(count(lit(1)).as("n_pairs_j50"),
        coalesce(round(avg(col("jaccard")), 4), lit(0.0)).as("avg_jaccard"))
    }),

    // Embedding-cosine near-dup via hyperplane-LSH buckets.
    "dd6_embedding_neardup" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      Dedup.embeddingNearDups(embs, "vec_id", "embedding", EmbDim, threshold = 0.95)
        .agg(count(lit(1)).as("n_neardup_pairs"),
          coalesce(round(avg(col("cosine")), 4), lit(0.0)).as("avg_cosine"))
    }),

    // Brute-force cosine top-k (exact baseline). Oracle-checked against
    // DuckDB list math in double precision.
    "ann1_brute_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Ann.bruteForceTopK(embs, "vec_id", "embedding", q, "qv", 10)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
        .orderBy(desc("sim"), asc("vec_id"))
    }),

    // LSH-bucketed ANN (scale path; recall vs brute force in AnnSpec).
    "ann2_lsh_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Ann.lshTopK(embs, "vec_id", "embedding", EmbDim, q, "qv", 10, bits = 8)
        .agg(count(lit(1)).as("n_results"), round(max(col("sim")), 4).as("best_sim"))
    }),

    // IVF-style coarse search using the label column as cells.
    "ann3_ivf_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Ann.ivfTopK(embs, "vec_id", "embedding", "label", EmbDim, q, "qv", 10, nProbe = 2)
        .agg(count(lit(1)).as("n_results"), round(max(col("sim")), 4).as("best_sim"))
    }),

    // IVF with TRAINED centroids (Lloyd's k-means, executor-side
    // assignment): the real coarse-quantization scale path. Recall vs
    // brute force gated in AnnSpec.
    "ann4_ivf_kmeans" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Ann.ivfTopKTrained(embs, "vec_id", "embedding", EmbDim, q, "qv", 10,
          nCells = 8, nProbe = 2)
        .agg(count(lit(1)).as("n_results"), round(max(col("sim")), 4).as("best_sim"))
    }),

    // Language ID heuristic: predicted vs labeled distribution.
    "tx1_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"), T.languageId(col("text")).as("predicted"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    }),

    // Quality metrics per doc. Oracle-checked (same formulas in SQL).
    "tx2_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_txt"),
          round(T.punctRatio(col("text")), 4).as("punct_ratio"),
          round(T.meanTokenLen(col("text")), 4).as("mean_tok_len"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace + BPE-ish regex. Oracle-checked.
    "tx3_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenCount(col("text")).cast("long").as("ws_tokens"),
          T.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
        .orderBy("doc_id")
    }),

    // Rolling-hash document fingerprint (order-SENSITIVE; vs dd2).
    "tx4_rolling_hash" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(T.rollingHash(col("text")).as("rh"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("rh")).as("n_distinct_rh"))
    }),

    // Composed training-data prep — the operators composing as plain
    // DataFrame transforms: quality gate (token count + punct density)
    // → exact dedup (min-id representative per normalized hash) →
    // corpus stats. Fully oracle-checked end to end.
    "pl1_training_prep" -> ((s, dir) => {
      val gated = t(s, dir, "documents").filter(
        T.tokenCount(col("text")).between(5, 1000) &&
          T.punctRatio(col("text")) < 0.2)
      Dedup.dropExactDups(gated, "doc_id", col("text"))
        .agg(count(lit(1)).as("n_docs"),
          sum(T.tokenCount(col("text")).cast("long")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"))
    }),

    // Multimodal plumbing: synthetic binary payloads → batched decode →
    // resize → metadata aggregation. Payload never shuffles.
    "mm1_decode_stats" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
      val decoded = Multimodal.resize(Multimodal.decode(media), 256, 256)
      decoded.groupBy("kind")
        .agg(count(lit(1)).as("cnt"), avg(col("width")).as("avg_w"),
          avg(col("height")).as("avg_h"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy("kind")
    }),

    // Frame sampling (1 row → n frames, flatMap/UDTF shape).
    "mm2_frame_sample" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(media, everyN = 10)
        .groupBy()
        .agg(count(lit(1)).as("n_frames"), countDistinct(col("media_id")).as("n_videos"))
    })
  )

  val oracles: Map[String, String] = Map(
    "dd1_exact_dedup" ->
      """SELECT count(*) AS n_docs, count(DISTINCT h) AS n_distinct,
                count(*) - count(DISTINCT h) AS n_dups
         FROM (SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
               FROM documents)""",
    "dd2_fingerprint" ->
      """SELECT doc_id,
                sha256(array_to_string(list_sort(regexp_split_to_array(trim(text), '\s+')), ' ')) AS fp
         FROM documents ORDER BY doc_id""",
    "ann1_brute_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT vec_id,
                  list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)),
                           x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), v -> v * v))) *
                   sqrt(list_sum(list_transform((SELECT qv FROM q), v -> v * v)))) AS sim_raw
           FROM embeddings)
         SELECT vec_id, round(sim_raw, 4) AS sim FROM scored
         ORDER BY sim_raw DESC, vec_id LIMIT 10""",
    "pl1_training_prep" ->
      """WITH gated AS (
           SELECT doc_id, lang, text,
                  len(regexp_split_to_array(trim(text), '\s+')) AS toks
           FROM documents
           WHERE len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 5 AND 1000
             AND (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
                 CAST(greatest(length(text), 1) AS DOUBLE) < 0.2
         ), d AS (
           SELECT *, row_number() OVER (
             PARTITION BY sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             ORDER BY doc_id) AS rn
           FROM gated
         )
         SELECT count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens,
                count(DISTINCT lang) AS n_langs
         FROM d WHERE rn = 1""",
    "tx2_quality" ->
      """SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_txt,
                round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
                      CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
                round(length(regexp_replace(text, '\s+', '', 'g')) /
                      CAST(greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS DOUBLE), 4) AS mean_tok_len
         FROM documents ORDER BY doc_id""",
    "tx1_langid" ->
      """WITH scored AS (
           SELECT lang, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
         ), ratios AS (
           SELECT lang,
             len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein','eine','zu','den','von'], lower(t)))) / CAST(greatest(len(toks),1) AS DOUBLE) AS s_de,
             len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], lower(t)))) / CAST(greatest(len(toks),1) AS DOUBLE) AS s_en,
             len(list_filter(toks, t -> list_contains(['el','la','de','que','y','en','un','una','es','por'], lower(t)))) / CAST(greatest(len(toks),1) AS DOUBLE) AS s_es,
             len(list_filter(toks, t -> list_contains(['le','la','de','et','un','une','est','que','pour','dans'], lower(t)))) / CAST(greatest(len(toks),1) AS DOUBLE) AS s_fr,
             len(list_filter(toks, t -> list_contains(['的','是','了','在','和','有','我','他','这','中'], lower(t)))) / CAST(greatest(len(toks),1) AS DOUBLE) AS s_zh
           FROM scored
         ), best AS (
           SELECT lang,
             list_sort([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
                        {'score': s_es, 'lang': 'es'}, {'score': s_fr, 'lang': 'fr'},
                        {'score': s_zh, 'lang': 'zh'}])[-1] AS b
           FROM ratios
         )
         SELECT lang, CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS predicted,
                count(*) AS cnt
         FROM best GROUP BY lang, predicted ORDER BY lang, predicted""",
    "tx3_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpeish_tokens
         FROM documents ORDER BY doc_id"""
  ).map { case (k, v) => k -> v.linesIterator.map(_.trim).mkString(" ") }
}
