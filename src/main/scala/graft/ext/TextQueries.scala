package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** SURVEY §2.3 X4: text analysis over `documents` — language ID, quality
  * scoring, token counting, document fingerprinting, tf-idf term stats.
  *
  * The fixture corpus shares one ~31-token vocabulary across all `lang`
  * labels (FIXTURES.md), so language ID cannot key on charset/stopwords;
  * the operator is therefore the real statistical shape: learn per-language
  * token-frequency profiles from the corpus and classify each document
  * against them — all in exact integer arithmetic so the oracle matches
  * bit-for-bit.
  *
  * Scale posture: everything is explode → groupBy with map-side combine;
  * profiles are tiny (langs × vocab) and broadcast; no driver collect.
  */
object TextQueries {

  private def tokens: Column = split(col("text"), " ")

  /** The x4j per-doc rule chain — ONE definition shared by the batch
    * funnel (x4j aggregates it) and the streaming filter-at-ingest (q52h
    * drains it per micro-batch), so the two registrations cannot drift.
    * Pure per-row map arithmetic: no shuffle, no state — which is exactly
    * why the same frame streams unchanged in append mode.
    */
  private[graft] def filterFunnelVerdict(docs: DataFrame): DataFrame =
    withFunnelVerdict(docs)
      .select(col("doc_id"), col("lang"), col("n").as("n_tok"), col("drop_rule"))

  /** The same rule chain, ADDING `drop_rule` (and the intermediate stats)
    * while KEEPING the input columns — q52x's composed ingest pipeline
    * needs the verdict attached without losing `text` (the dedup and
    * decontam stages downstream consume it). One definition, two
    * projections: this and [[filterFunnelVerdict]] cannot drift.
    *
    * r13: the rule chain moved into the one-pass `funnel_stats` codegen
    * kernel ([[graft.functions.FunnelStats]]). The previous expression
    * formulation (split → bigram transform → array_distinct → CASE) was
    * correct but FILTER-hostile: q52x/q52h filter on `drop_rule`, Catalyst
    * pushes the predicate below these projections by inlining every
    * alias, and the inlined CASE expands to ~15 `split(text)` + 3
    * `array_distinct` evaluations per row (measured 0.4 s → 6.3 s on the
    * sf0.1 corpus, single scan task). The kernel inlines as ONE pass.
    * Arithmetic is byte-for-byte identical; the DuckDB oracle CTE below
    * is untouched and keeps proving it.
    */
  private[graft] def withFunnelVerdict(docs: DataFrame): DataFrame =
    docs
      .withColumn("fs",
        graft.functions.Kernels.funnel_stats(col("text"), col("n_chars")))
      .withColumn("n", col("fs.n_tok"))
      .withColumn("db_ppm", col("fs.db_ppm"))
      .withColumn("ttr_ppm", col("fs.ttr_ppm"))
      .withColumn("drop_rule", col("fs.drop_rule"))
      .drop("fs")

  /** The per-doc verdict oracle (q52h; x4j's oracle aggregates the same
    * CTE text).
    */
  private[graft] val FilterFunnelVerdictCte: String =
    """WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w
          FROM documents),
        m AS (SELECT doc_id, lang, n_chars, CAST(len(w) AS BIGINT) AS n,
          CASE WHEN len(w) >= 2 THEN
            CASE WHEN len(list_transform(generate_series(1, len(w)-1),
                i -> w[i] || ' ' || w[i+1])) > 0 THEN
              ((len(w)-1 - len(list_distinct(list_transform(generate_series(1, len(w)-1),
                i -> w[i] || ' ' || w[i+1])))) * 1000000) // (len(w)-1)
            ELSE 0 END
          ELSE 0 END AS db_ppm,
          (len(list_distinct(w)) * 1000000) // len(w) AS ttr_ppm
          FROM t),
        v AS (SELECT doc_id, lang, n AS n_tok,
          CASE WHEN n < 20 THEN 'too_short'
               WHEN n_chars * 100 // n >= 600 THEN 'long_words'
               WHEN db_ppm >= 200000 THEN 'repetitive'
               WHEN ttr_ppm < 300000 THEN 'low_diversity'
               ELSE 'kept' END AS drop_rule
          FROM m)"""

  def defs: Seq[Q] = Seq(
    // X4: corpus-profile language ID. score(doc, lang) = Σ_tok count_corpus
    // (lang, tok) over the doc's token multiset (integer naive-Bayes-ish
    // evidence); predict argmax with lang-asc tiebreak; emit per-lang
    // confusion counts.
    Q("x4_langid",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val docTok = docs.select(col("doc_id"), col("lang"), explode(tokens).as("tok"))
        val profile = docTok.groupBy(col("lang").as("p_lang"), col("tok").as("p_tok"))
          .agg(count(lit(1)).as("w"))
        val scored = docTok.join(broadcast(profile), col("tok") === col("p_tok"))
          .groupBy(col("doc_id"), col("lang"), col("p_lang"))
          .agg(sum(col("w")).as("score"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("p_lang"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("lang"), col("p_lang").as("pred_lang"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH dt AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        profile AS (SELECT lang AS p_lang, tok AS p_tok, count(*) AS w FROM dt GROUP BY 1, 2),
        scored AS (SELECT dt.doc_id, dt.lang, p.p_lang, CAST(SUM(p.w) AS BIGINT) AS score
          FROM dt JOIN profile p ON dt.tok = p.p_tok GROUP BY 1, 2, 3),
        pred AS (SELECT doc_id, lang, p_lang FROM
          (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rn FROM scored)
          WHERE rn = 1)
        SELECT lang, p_lang AS pred_lang, count(*) AS n_docs FROM pred GROUP BY 1, 2""".stripMargin)),

    // X4b: quality scoring — length stats, type-token ratio, stopword
    // ratio, all exact (counts and ratios of integers).
    Q("x4b_quality",
      (s, d) => {
        val t = tokens
        Tables.documents(s, d).select(
          col("doc_id"),
          col("n_chars"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_types"),
          (size(array_distinct(t)).cast(DoubleType) / size(t).cast(DoubleType))
            .as("type_token_ratio"),
          (length(col("text")).cast(DoubleType) / size(t).cast(DoubleType))
            .as("avg_tok_span"),
          (size(filter(t, x => x.isin("a", "the"))).cast(DoubleType) /
            size(t).cast(DoubleType)).as("stopword_ratio"),
          (size(t) >= 20 && size(array_distinct(t)) >= 10).as("passes_quality"))
      },
      Some("""SELECT doc_id, n_chars,
        CAST(len(w) AS INTEGER) AS n_tokens,
        CAST(len(list_distinct(w)) AS INTEGER) AS n_types,
        CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS type_token_ratio,
        CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_tok_span,
        CAST(len(list_filter(w, x -> x IN ('a', 'the'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio,
        len(w) >= 20 AND len(list_distinct(w)) >= 10 AS passes_quality
        FROM (SELECT *, string_split(text, ' ') AS w FROM documents)""".stripMargin)),

    // X4c: token counting — whitespace tokens plus a BPE-ish regex
    // segmentation (letter runs / digit runs / single other), the standard
    // pre-tokenizer shape; same regex in both engines.
    Q("x4c_token_count",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .as("bpe_ish_tokens"),
        length(col("text")).as("n_chars_m"),
        (length(col("text")).cast(DoubleType) /
          size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
            .cast(DoubleType)).as("chars_per_token")),
      Some("""SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_ish_tokens,
        CAST(length(text) AS INTEGER) AS n_chars_m,
        CAST(length(text) AS DOUBLE) / CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS DOUBLE) AS chars_per_token
        FROM documents""".stripMargin)),

    // X4d: document fingerprinting — full-text digest plus a winnowing-style
    // shingle fingerprint (lexicographic-min md5 over 3-token shingles; the
    // min-over-window rolling-hash idiom with a content-defined
    // representative); identical digests in both engines.
    Q("x4d_fingerprint",
      (s, d) => {
        val w = tokens
        // 3-token shingle digests via the native window_md5 kernel (the
        // HOF transform re-tokenized the doc per shingle — kernel scaladoc);
        // min/max are insensitive to its distinct-ness. Short docs keep the
        // whole-text fallback digest.
        val sh = when(size(w) >= 3,
          graft.functions.Kernels.window_md5(w, 3))
          .otherwise(array(md5(col("text"))))
        // explode + agg rather than array_min/array_max over `sh`:
        // CollapseProject would inline the shingle expression once per
        // consumer, recomputing every md5 twice. Repartition fans the
        // single-file fixture scan out to all cores for the md5 kernel.
        Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), md5(col("text")).as("doc_md5"), explode(sh).as("fp"))
          .groupBy("doc_id", "doc_md5")
          .agg(min(col("fp")).as("min_shingle_fp"), max(col("fp")).as("max_shingle_fp"))
      },
      Some("""SELECT doc_id, md5(text) AS doc_md5,
        list_min(sh) AS min_shingle_fp, list_max(sh) AS max_shingle_fp FROM
        (SELECT doc_id, text,
          CASE WHEN len(w) >= 3
            THEN list_transform(generate_series(1, len(w)-2), i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
            ELSE [md5(text)] END AS sh
         FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))""".stripMargin)),

    // X4e: tf-idf term statistics per language — rational idf (N/df as an
    // exact integer-derived double) so scoring is engine-exact; top-3 terms
    // per lang by (tf·N/df, term) with deterministic tiebreak.
    Q("x4e_tfidf",
      (s, d) => {
        val docTok = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), explode(tokens).as("tok"))
        // ONE shuffle builds the (lang, doc, tok) count cube; tf and df are
        // tiny re-aggregations of it. The direct formulation evaluated the
        // explode three times (tf, df-distinct, and the distinct's own
        // shuffle) — at corpus scale that is three passes over every token.
        // A doc has exactly one lang, so cube rows ARE the distinct
        // (doc, tok) pairs and df = row count per tok.
        val cube = docTok.groupBy(col("lang"), col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        Caching.withPersisted(cube) {
          val nDf = Tables.documents(s, d).agg(count(lit(1)).as("n"))
          val df = cube.groupBy(col("tok").as("d_tok")).agg(count(lit(1)).as("df"))
          val tf = cube.groupBy(col("lang"), col("tok")).agg(sum(col("c")).as("tf"))
          val scored = tf.join(broadcast(df), col("tok") === col("d_tok"))
            .crossJoin(broadcast(nDf))
            .select(col("lang"), col("tok"), col("tf"), col("df"),
              (col("tf").cast(DoubleType) * col("n").cast(DoubleType) / col("df").cast(DoubleType))
                .as("tfidf_rat"))
          val w = Window.partitionBy(col("lang")).orderBy(col("tfidf_rat").desc, col("tok"))
          scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
            .select(col("lang"), col("rn"), col("tok"), col("tf"), col("df"), col("tfidf_rat"))
            .localCheckpoint() // 3 rows per lang; eager so the cache can go
        }
      },
      Some("""WITH dt AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        n AS (SELECT count(*) AS n FROM documents),
        df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM dt) GROUP BY tok),
        tf AS (SELECT lang, tok, count(*) AS tf FROM dt GROUP BY 1, 2),
        scored AS (SELECT lang, tf.tok, tf, df,
          CAST(tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf_rat
          FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
        SELECT lang, CAST(rn AS INTEGER) AS rn, tok, tf, df, tfidf_rat FROM
          (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY tfidf_rat DESC, tok) AS rn FROM scored)
        WHERE rn <= 3""".stripMargin)),

    // X4f: BM25 retrieval — score every document against a fixed query-term
    // set and return the top-10. Uses the RATIONAL idf (N-df+0.5)/(df+0.5)
    // (the log-free Robertson-Sparck-Jones core) so, like x4e, every scalar
    // is a fixed-order IEEE-double expression both engines evaluate
    // identically — no transcendental whose last ulp could differ.
    //
    // Scale posture: term frequencies come from `filter()` over the token
    // array (pure per-row map, no explode/shuffle); corpus stats (N, avgdl,
    // per-term df) are ONE tiny global aggregate broadcast back via
    // crossJoin; top-10 is TakeOrderedAndProject (per-partition heaps, no
    // global sort). The whole query is one scan + one 1-row exchange.
    Q("x4f_bm25", bm25Fn, Some(bm25Sql)),

    // X4g: vocabulary-diversity scoring — per-doc token count, distinct
    // token count, type-token ratio, and Shannon entropy of the token
    // distribution, via the one-pass token_stats kernel. The oracle
    // computes the same statistics the row-amplified way (unnest → two
    // GROUP BYs): at corpus scale that shape shuffles one row per token
    // TWICE; the kernel is a pure map — zero shuffle, whole-stage codegen
    // (plan pinned in PlanSpec, kernel ≡ explode parity in KernelSpec).
    //
    // Float parity: ttr is a single IEEE division of two exact integers
    // (engine-identical); entropy sums c·log2(c) in engine-specific order,
    // so it ships as round(H·10⁴) BIGINT per the Registry float rules.
    Q("x4g_entropy",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          graft.functions.Kernels.token_stats(col("text")).as("st"))
        .select(col("doc_id"), col("lang"),
          col("st.n_tok").as("n_tok"),
          col("st.n_distinct").as("n_distinct"),
          (col("st.n_distinct").cast(DoubleType) /
            col("st.n_tok").cast(DoubleType)).as("ttr"),
          round(col("st.entropy") * 10000).cast(LongType).as("entropy_e4")),
      Some("""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
              FROM documents),
        cnt AS (SELECT doc_id, lang, t, CAST(count(*) AS DOUBLE) AS c
                FROM tok GROUP BY 1, 2, 3),
        agg AS (SELECT doc_id, lang, SUM(c) AS n, COUNT(*) AS nd,
                  SUM(c * log2(c)) AS s
                FROM cnt GROUP BY 1, 2)
        SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tok,
          CAST(nd AS BIGINT) AS n_distinct,
          CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) AS ttr,
          CAST(round((log2(n) - s / n) * 10000) AS BIGINT) AS entropy_e4
        FROM agg""".stripMargin)),

    // X4i (r11): intra-document REPETITION metrics — the Gopher/FineWeb
    // quality rule the x4b surface lacked: heavily repetitive documents
    // (boilerplate, scraped menus, generation loops) are flagged by the
    // duplicate fraction of their own words / bigrams / trigrams. All
    // per-row map-side arithmetic, and every fraction is PURE INTEGER
    // ppm ((n - distinct) * 1e6 DIV n — Spark's DIV and DuckDB's // agree
    // on the non-negative domain), so the oracle is bit-exact with no
    // float summation-order hazard. The flag threshold (bigram dup
    // fraction ≥ 20%) is the published Gopher-style cut; per-lang
    // aggregation keeps the output stable and the verdict hashable.
    Q("x4i_repetition",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("lang"), split(col("text"), " ").as("w"))
          .withColumn("bg", expr("CASE WHEN size(w) >= 2 THEN " +
            "transform(sequence(1, size(w)-1), i -> concat(element_at(w, i), ' ', element_at(w, i+1))) " +
            "ELSE array() END"))
          .withColumn("tg", expr("CASE WHEN size(w) >= 3 THEN " +
            "transform(sequence(1, size(w)-2), i -> concat(element_at(w, i), ' ', element_at(w, i+1), ' ', element_at(w, i+2))) " +
            "ELSE array() END"))
          .withColumn("dw_ppm", expr(
            "(CAST(size(w) - size(array_distinct(w)) AS BIGINT) * 1000000) DIV size(w)"))
          .withColumn("db_ppm", expr("CASE WHEN size(bg) > 0 THEN " +
            "(CAST(size(bg) - size(array_distinct(bg)) AS BIGINT) * 1000000) DIV size(bg) " +
            "ELSE CAST(0 AS BIGINT) END"))
          .withColumn("dt_ppm", expr("CASE WHEN size(tg) > 0 THEN " +
            "(CAST(size(tg) - size(array_distinct(tg)) AS BIGINT) * 1000000) DIV size(tg) " +
            "ELSE CAST(0 AS BIGINT) END"))
        base.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("db_ppm") >= 200000L, 1L).otherwise(0L)).as("n_repetitive"),
            sum(col("dw_ppm")).as("sum_dw_ppm"),
            sum(col("db_ppm")).as("sum_db_ppm"),
            sum(col("dt_ppm")).as("sum_dt_ppm"),
            max(col("db_ppm")).as("max_db_ppm"))
      },
      Some("""WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        m AS (SELECT lang,
          CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1),
            i -> w[i] || ' ' || w[i+1]) ELSE [] END AS bg,
          CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS tg,
          ((len(w) - len(list_distinct(w))) * 1000000) // len(w) AS dw_ppm
          FROM t),
        m2 AS (SELECT lang, dw_ppm,
          CASE WHEN len(bg) > 0 THEN ((len(bg) - len(list_distinct(bg))) * 1000000) // len(bg) ELSE 0 END AS db_ppm,
          CASE WHEN len(tg) > 0 THEN ((len(tg) - len(list_distinct(tg))) * 1000000) // len(tg) ELSE 0 END AS dt_ppm
          FROM m)
        SELECT lang, count(*) AS n_docs,
          CAST(SUM(CASE WHEN db_ppm >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
          CAST(SUM(dw_ppm) AS BIGINT) AS sum_dw_ppm,
          CAST(SUM(db_ppm) AS BIGINT) AS sum_db_ppm,
          CAST(SUM(dt_ppm) AS BIGINT) AS sum_dt_ppm,
          CAST(MAX(db_ppm) AS BIGINT) AS max_db_ppm
        FROM m2 GROUP BY lang""".stripMargin)),

    // X4j (r12): FILTER FUNNEL with per-rule attribution — the
    // FineWeb/Gopher-style ordered quality-rule ensemble, reported the
    // way pipelines actually publish it: every doc is attributed to the
    // FIRST rule that drops it (or 'kept'), and the funnel table counts
    // docs and tokens per (lang, rule). Rules reuse the established
    // integer/ppm metrics so every verdict is engine-exact:
    //   1. too_short      — n_tok < 20              (x4b's gate)
    //   2. long_words     — chars-per-token ≥ 6.00  (Gopher mean-word-
    //      length shape, integer ×100 compare on the n_chars column)
    //   3. repetitive     — duplicate-bigram ppm ≥ 200000 (x4i's metric)
    //   4. low_diversity  — type-token ratio < 30%  (x4g's shape, ppm)
    // Ordered first-fail attribution matters: a doc failing several
    // rules is counted ONCE, under the earliest rule — the funnel's
    // rows sum exactly to the corpus, so the report composes (unlike
    // per-rule independent counts, which double-count). 100 TB: one
    // pass, per-row map arithmetic, a single (lang, rule) aggregation.
    Q("x4j_filter_funnel",
      (s, d) => filterFunnelVerdict(Tables.documents(s, d))
        .groupBy("lang", "drop_rule")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")),
      Some(s"""$FilterFunnelVerdictCte
        SELECT lang, drop_rule, count(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM v GROUP BY lang, drop_rule""".stripMargin)),

    // X4h: perplexity quality filter — the CCNet/Gopher shape: train an
    // add-k bigram LM on the corpus ITSELF (k = 0.5, vocab = all distinct
    // tokens), score every doc by mean bits per bigram (-Σ occ·log2 p / Σ
    // occ where p(w2|w1) = (c(w1,w2)+k)/(c(w1)+k·V)), flag the
    // high-perplexity tail. c(w1) is the bigram-table marginal (doc-final
    // tokens excluded), so Σ_w2 c(w1,w2) = c(w1) — a proper conditional.
    //
    // 100 TB posture: token-level rows only ever cross KEYED shuffles
    // (bigram counts, the w1 marginal, per-doc re-aggregation), each with
    // map-side partial aggregation; the LM stays a DISTRIBUTED table
    // joined on its bigram key — never broadcast (at corpus scale the
    // bigram table is itself huge). The only broadcast is the 1-row vocab
    // size. Per the float rules, bits are compared at round(·1e4); the
    // outlier flag derives from the already-rounded value.
    Q("x4h_perplexity",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val w = tokens
        val n = size(w)
        val bg = docs.select(col("doc_id"),
          explode(zip_with(slice(w, lit(1), n - 1), slice(w, lit(2), n - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("z"))
          .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
        val uni = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
        val bgc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        val vocab = docs.select(explode(w).as("t"))
          .agg(countDistinct(col("t")).as("v"))
        val lp = bgc.join(uni, Seq("w1")).crossJoin(broadcast(vocab))
          .select(col("w1"), col("w2"),
            log2((col("cb").cast(DoubleType) + lit(0.5)) /
              (col("cu").cast(DoubleType) + lit(0.5) * col("v").cast(DoubleType)))
              .as("logp"))
        val docbg = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("occ"))
        docbg.join(lp, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(sum(col("occ")).as("n_bigrams"),
            ((sum(col("occ").cast(DoubleType) * col("logp")) * lit(-1.0)) /
              sum(col("occ")).cast(DoubleType)).as("bits"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("bits") * 10000).cast(LongType).as("bits_e4"),
            (round(col("bits") * 10000).cast(LongType) > lit(50000L)).as("is_outlier"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        bg AS (SELECT doc_id, z[1] AS w1, z[2] AS w2
               FROM (SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z FROM d)),
        uni AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
        vocab AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(w) AS t FROM d)),
        lp AS (SELECT w1, w2, log2((CAST(cb AS DOUBLE) + 0.5) / (CAST(cu AS DOUBLE) + 0.5 * CAST((SELECT v FROM vocab) AS DOUBLE))) AS logp
               FROM (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2) JOIN uni USING (w1)),
        docbg AS (SELECT doc_id, w1, w2, count(*) AS occ FROM bg GROUP BY 1, 2, 3),
        sc AS (SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_bigrams,
                 (-SUM(CAST(occ AS DOUBLE) * logp)) / CAST(SUM(occ) AS DOUBLE) AS bits
               FROM docbg JOIN lp USING (w1, w2) GROUP BY 1)
        SELECT doc_id, n_bigrams,
          CAST(round(bits * 10000) AS BIGINT) AS bits_e4,
          CAST(round(bits * 10000) AS BIGINT) > 50000 AS is_outlier
        FROM sc""".stripMargin)),

    // X4k: distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
    // arXiv:1508.07909) — the missing piece between the token-counting
    // heuristics (x4c's whitespace+regex count) and a real subword
    // vocabulary: learn the first 8 merge rules from the corpus itself.
    //
    // Distribution shape (the reason this scales where naive BPE can't):
    // the ONLY corpus-sized work is the word-frequency aggregation (one
    // shuffle, map-side combine); every merge iteration then runs over
    // the DISTINCT-WORD frame — vocab-sized, millions of rows at 100 TB,
    // still cluster work — and reduces to a 1-row argmax scalar
    // certificate (the k-means device, KMeans.scala:87). Words are kept
    // as space-delimited symbol strings; a merge is TWO chained literal
    // `replace` passes, which equals greedy left-to-right non-overlapping
    // pair merging exactly (pass 1 can miss a pair only when its leading
    // delimiter was consumed by the preceding match, and two such missed
    // pairs can never be adjacent — BpeSpec pins the 'a a a a' case).
    // The DuckDB oracle replays all 8 stages with the same two-pass
    // replace, so the hash gate proves merge-for-merge equality.
    Q("x4k_bpe_train",
      (s, d) => bpeTrain(s, bpeWordFreq(Tables.documents(s, d)), BpeMerges),
      Some(bpeOracle(BpeMerges))),

    // X4l: APPLY the trained BPE vocabulary — the token-budget counter a
    // pipeline actually runs once a subword tokenizer exists (x4c counts
    // whitespace tokens; real budgets count SUBWORD tokens). Train (x4k's
    // loop) collects the 8 merge rules as driver scalars, then tokenizes
    // every document with them: per (doc, word) the padded char sequence
    // gets the 8 merges replayed in rank order (each the same two-pass
    // greedy replace the trainer used — apply ≡ train rewrite by
    // construction), subword count = symbols left. One explode + one
    // groupBy(doc_id) with map-side combine; the merges ride into the
    // executors as 8 literal constants, never a join. The oracle re-runs
    // the training CTE chain and applies b1..b8 via the same scalar-
    // subquery replaces, so the hash gate proves train+apply end-to-end:
    // a drifted merge rule would shift some document's token count.
    Q("x4l_bpe_apply",
      (s, d) => {
        val merges = bpeTrain(s, bpeWordFreq(Tables.documents(s, d)), BpeMerges)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2)))
        val sym0 = concat(lit(" "), concat_ws(" ", expr(
            "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")),
          lit(" "))
        val tokenized = merges.foldLeft(sym0) { case (c, (pair, merged)) =>
          def rep(x: Column): Column = org.apache.spark.sql.functions
            .replace(x, lit(s" $pair "), lit(s" $merged "))
          rep(rep(c))
        }
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .select(col("doc_id"),
            size(split(trim(tokenized), " ")).cast(LongType).as("n_sub"))
          .groupBy("doc_id")
          .agg(sum(col("n_sub")).as("n_subword"), count(lit(1)).as("n_words"))
      },
      Some(bpeApplyOracle(BpeMerges))),

    // X3p: HYBRID retrieval with reciprocal-rank fusion — the serving
    // pattern RAG stacks actually run: a lexical ranker (x4f's BM25, one
    // term per query) and a vector ranker (x3's exact quantized cosine,
    // one query vector per query) each produce a top-20 list, fused as
    // Σ 1/(60+rank) over a full-outer join (Cormack et al. 2009's RRF —
    // rank-based, so the two scorers' incomparable scales never meet).
    // Four hybrid queries: query i = (term i, query vector i). 100 TB
    // posture: the lexical side is one scan + a 1-row broadcast stats
    // frame + a per-qid top-20 window over docs that CONTAIN the term;
    // the vector side is the brute baseline here (x3c/x3i are the scale
    // path — swap the ranker, the fusion is unchanged); fusion joins two
    // 80-row frames. Ranks tie-break on doc_id and every float is the
    // same expression text on both sides, so the RRF doubles are
    // IEEE-exact against the oracle.
    Q("x3p_hybrid_rrf",
      (s, d) => {
        val w = split(col("text"), " ")
        val base = Tables.documents(s, d).select(
          col("doc_id") +: size(w).as("dl") +:
            bm25Terms.zipWithIndex.map { case (t, i) =>
              size(filter(w, x => x === lit(t))).as(s"tf$i") }: _*)
        val stats = base.agg(
          count(lit(1)).as("n"),
          sum(col("dl")).as("sumdl") +:
            bm25Terms.indices.map(i =>
              sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
          .withColumn("avgdl",
            col("sumdl").cast(DoubleType) / col("n").cast(DoubleType))
        val arms = bm25Terms.indices.map(i => struct(
          lit(i).as("qid"), col(s"tf$i").as("tf"), col(s"df$i").as("df")))
        val lex = base.crossJoin(broadcast(stats))
          .select(col("doc_id"), col("dl"), col("n"), col("avgdl"),
            explode(array(arms: _*)).as("t"))
          .filter(col("t.tf") > 0)
          .select(col("t.qid").as("qid"), col("doc_id"),
            bm25Contrib(col("t.tf"), col("t.df"), col("n"), col("dl"),
              col("avgdl")).as("score"))
        val wl = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))
        val lt = lex.withColumn("rl", row_number().over(wl))
          .filter(col("rl") <= 20).select("qid", "doc_id", "rl")
        val e = SimilarityQueries.quantFrame(s, d)
          .select(col("vec_id"), col("qe"))
        val q = e.filter(col("vec_id") < 4)
          .select(col("vec_id").cast(IntegerType).as("qid"),
            col("qe").as("qemb"))
        val wv = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("doc_id"))
        val vt = e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("doc_id"),
            SimilarityQueries.qcos(col("qemb"), col("qe")).as("cos"))
          .withColumn("rv", row_number().over(wv))
          .filter(col("rv") <= 20).select("qid", "doc_id", "rv")
        val f = lt.join(vt, Seq("qid", "doc_id"), "full_outer")
          .select(col("qid"), col("doc_id"),
            (coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))).as("rrf"))
        val wf = Window.partitionBy(col("qid"))
          .orderBy(col("rrf").desc, col("doc_id"))
        f.withColumn("rank", row_number().over(wf)).filter(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("doc_id"), col("rrf"))
      },
      Some(hybridRrfSql))
  )

  private val BpeMerges = 8

  /** Corpus → word-frequency frame for BPE: `(sym, cnt)` where `sym` is
    * the word as a space-delimited, space-PADDED character sequence
    * (' h e l l o '). The padding makes ' l r ' a symbol-boundary-exact
    * literal match: without it a pair pattern could match across symbol
    * boundaries once symbols grow multi-char ('ab c' contains 'b c').
    * This is the single corpus-sized aggregation of the operator.
    */
  private[graft] def bpeWordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "), concat_ws(" ", expr(
          "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")),
        lit(" ")).as("sym"), col("cnt"))

  /** The BPE training loop over a `(sym, cnt)` word-frequency frame:
    * `nMerges` rounds of (count adjacent symbol pairs weighted by word
    * frequency → argmax with lexicographic tie-break → merge the winning
    * pair in every word). Returns the learned merge table
    * `(step, pair, merged, cnt)` — the trained artifact a tokenizer
    * ships. Each round localCheckpoints the rewritten vocab frame so the
    * per-round plan stays flat instead of stacking `nMerges` replace
    * layers of lineage; all pins are released before returning (the
    * result rows are the per-round scalar certificates).
    */
  private[graft] def bpeTrain(s: SparkSession, wordsInit: DataFrame,
      nMerges: Int): DataFrame = {
    val pinned = scala.collection.mutable.Buffer.empty[DataFrame]
    val merges = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    try {
      var words = wordsInit.localCheckpoint()
      pinned += words
      for (step <- 1 to nMerges) {
        val best = words
          .withColumn("l", split(trim(col("sym")), " "))
          .select(col("cnt"), explode(expr("CASE WHEN size(l) >= 2 THEN " +
            "transform(sequence(1, size(l) - 1), " +
            "i -> concat(element_at(l, i), ' ', element_at(l, i + 1))) " +
            "ELSE array() END")).as("pair"))
          .groupBy("pair").agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1).collect()
        require(best.nonEmpty, s"BPE merge $step: no adjacent pairs left")
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((step, pair, merged, cnt))
        // two chained literal replaces = exact greedy non-overlapping
        // merge (see the registration comment); symbols never contain
        // spaces, so the padded pattern is boundary-exact
        def rep(c: Column): Column =
          org.apache.spark.sql.functions.replace(c,
            lit(s" $pair "), lit(s" $merged "))
        words = words.select(rep(rep(col("sym"))).as("sym"), col("cnt"))
          .localCheckpoint()
        pinned += words
      }
      import s.implicits._
      merges.toSeq.toDF("step", "pair", "merged", "cnt")
    } finally pinned.foreach(df =>
      // Dataset.unpersist is a no-op for localCheckpoint storage (no
      // CacheManager entry) — release the backing RDD blocks directly,
      // the Caching.withLocalCheckpointed discipline
      org.apache.spark.sql.graftshim.Shim.backingRdds(df)
        .foreach(_.unpersist(blocking = false)))
  }

  /** DuckDB replay of [[bpeTrain]]: stage i derives pair counts from
    * w(i-1), picks the argmax via ORDER BY c DESC, pair LIMIT 1 (both
    * engines binary collation), and rewrites w(i) with the identical
    * two-pass padded replace. The UNION of the per-stage winners is the
    * merge table. Every CTE is AS MATERIALIZED: DuckDB inlines plain
    * CTEs, and with each stage referencing its predecessor ~5 times
    * (scalar subqueries ×4 + the frame) the inlined plan is 5^nMerges
    * copies of the base scan — materialization keeps the replay linear,
    * mirroring the engine's per-round localCheckpoint.
    */
  private def bpeCtes(nMerges: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (SELECT ' ' || array_to_string(
          list_transform(generate_series(1, len(word)), i -> word[i]), ' ')
          || ' ' AS sym, cnt
        FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
              WHERE len(word) > 0 GROUP BY word))"""
    val stages = (1 to nMerges).map { i =>
      s"""b$i AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged, c
          FROM (SELECT pair, SUM(cnt) AS c FROM (
            SELECT cnt, unnest(list_transform(generate_series(1, len(l) - 1),
              j -> l[j] || ' ' || l[j + 1])) AS pair
            FROM (SELECT cnt, string_split(trim(sym), ' ') AS l FROM w${i - 1}))
          GROUP BY pair)
          ORDER BY c DESC, pair LIMIT 1),
        w$i AS MATERIALIZED (SELECT replace(replace(sym,
            ' ' || (SELECT pair FROM b$i) || ' ', ' ' || (SELECT merged FROM b$i) || ' '),
            ' ' || (SELECT pair FROM b$i) || ' ', ' ' || (SELECT merged FROM b$i) || ' ') AS sym,
          cnt FROM w${i - 1})"""
    }
    s"$w0, ${stages.mkString(", ")}"
  }

  private def bpeOracle(nMerges: Int): String = {
    val sel = (1 to nMerges).map(i =>
      s"SELECT $i AS step, pair, merged, CAST(c AS BIGINT) AS cnt FROM b$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtes(nMerges)} $sel"
  }

  /** x4l's replay: the x4k training chain (unused trailing CTEs cost
    * nothing) feeding a per-(doc, word) application chain — t(i) replays
    * merge i with the identical two-pass padded replace, subword count =
    * symbols left after t(nMerges).
    */
  private def bpeApplyOracle(nMerges: Int): String = {
    val t0 =
      """docw AS MATERIALIZED (SELECT doc_id, word FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
          WHERE len(word) > 0),
        t0 AS MATERIALIZED (SELECT doc_id, ' ' || array_to_string(
          list_transform(generate_series(1, len(word)), i -> word[i]), ' ')
          || ' ' AS sym FROM docw)"""
    val apps = (1 to nMerges).map { i =>
      s"""t$i AS MATERIALIZED (SELECT doc_id, replace(replace(sym,
          ' ' || (SELECT pair FROM b$i) || ' ', ' ' || (SELECT merged FROM b$i) || ' '),
          ' ' || (SELECT pair FROM b$i) || ' ', ' ' || (SELECT merged FROM b$i) || ' ') AS sym
        FROM t${i - 1})"""
    }
    s"""WITH ${bpeCtes(nMerges)}, $t0, ${apps.mkString(", ")}
      SELECT doc_id,
        CAST(SUM(len(string_split(trim(sym), ' '))) AS BIGINT) AS n_subword,
        CAST(count(*) AS BIGINT) AS n_words
      FROM t$nMerges GROUP BY doc_id"""
  }

  private val bm25Terms = Seq("spark", "merge", "vector", "customer")

  /** One term's BM25 contribution, k1=1.2 b=0.75 — parenthesization is
    * mirrored character-for-character in [[bm25Sql]]; change in lockstep.
    */
  private def bm25Contrib(tf: Column, df: Column, n: Column, dl: Column,
      avgdl: Column): Column =
    (((n - df).cast(DoubleType) + lit(0.5)) / (df.cast(DoubleType) + lit(0.5))) *
      ((tf.cast(DoubleType) * lit(2.2)) /
        (tf.cast(DoubleType) +
          (lit(1.2) * (lit(0.25) + (lit(0.75) * (dl.cast(DoubleType) / avgdl))))))

  private def bm25Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val w = split(col("text"), " ")
    val base = Tables.documents(s, d).select(
      col("doc_id") +: size(w).as("dl") +:
        bm25Terms.zipWithIndex.map { case (t, i) =>
          size(filter(w, x => x === lit(t))).as(s"tf$i") }: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl") +:
        bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
      .withColumn("avgdl",
        col("sumdl").cast(DoubleType) / col("n").cast(DoubleType))
    val score = bm25Terms.indices.map(i =>
      bm25Contrib(col(s"tf$i"), col(s"df$i"), col("n"), col("dl"),
        col("avgdl"))).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** One term's BM25 contribution as SQL — the character-for-character
    * mirror of [[bm25Contrib]], shared by the x4f oracle (summed) and the
    * x3p hybrid oracle (per-term).
    */
  private def sqlBm25Contrib(i: Int): String =
    s"(((CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * " +
      s"((CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + " +
      s"(1.2 * (0.25 + (0.75 * (CAST(dl AS DOUBLE) / avgdl)))))))"

  /** The shared base/stats CTE text behind x4f and x3p: per-doc term
    * frequencies + the 1-row corpus statistics.
    */
  private def bm25BaseCtes: String = {
    val tfs = bm25Terms.zipWithIndex
      .map { case (t, i) => s"len(list_filter(w, x -> x = '$t')) AS tf$i" }
      .mkString(", ")
    val dfs = bm25Terms.indices
      .map(i => s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    s"""base AS (SELECT doc_id, len(w) AS dl, $tfs
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl, $dfs,
        CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM base)"""
  }

  private def bm25Sql: String = {
    val contribs = bm25Terms.indices.map(sqlBm25Contrib).mkString(" + ")
    s"""WITH $bm25BaseCtes
      SELECT doc_id, $contribs AS score
      FROM base CROSS JOIN stats
      ORDER BY score DESC, doc_id LIMIT 10"""
  }

  /** x3p's oracle: lexical top-20 per term (single-term BM25, rank ties
    * by doc_id), vector top-20 per query vector (exact quantized cosine,
    * the ScoredCte device), full-outer RRF fusion at k=60, top-10. Every
    * floating intermediate is the identical expression text on both
    * sides, so ranks and the two-term RRF sum are IEEE-exact.
    */
  private def hybridRrfSql: String = {
    val lexArms = bm25Terms.indices.map(i =>
      s"""SELECT $i AS qid, doc_id, ${sqlBm25Contrib(i)} AS score
          FROM base CROSS JOIN stats WHERE tf$i > 0""").mkString(" UNION ALL ")
    s"""WITH $bm25BaseCtes,
      lex AS (SELECT qid, doc_id, row_number() OVER
          (PARTITION BY qid ORDER BY score DESC, doc_id) AS rl
        FROM ($lexArms)),
      e AS (SELECT vec_id, ${SimilarityQueries.sqlQuant("embedding")} AS qe FROM embeddings),
      q AS (SELECT CAST(vec_id AS INTEGER) AS qid, qe AS qemb FROM e WHERE vec_id < 4),
      vecr AS (SELECT qid, c.vec_id AS doc_id, row_number() OVER
          (PARTITION BY qid ORDER BY ${SimilarityQueries.sqlQcos("q.qemb", "c.qe")} DESC, c.vec_id) AS rv
        FROM q JOIN e c ON c.vec_id <> q.qid),
      lt AS (SELECT qid, doc_id, rl FROM lex WHERE rl <= 20),
      vt AS (SELECT qid, doc_id, rv FROM vecr WHERE rv <= 20),
      f AS (SELECT COALESCE(lt.qid, vt.qid) AS qid,
          COALESCE(lt.doc_id, vt.doc_id) AS doc_id,
          COALESCE(CAST(1 AS DOUBLE) / (60 + rl), CAST(0 AS DOUBLE))
            + COALESCE(CAST(1 AS DOUBLE) / (60 + rv), CAST(0 AS DOUBLE)) AS rrf
        FROM lt FULL OUTER JOIN vt ON lt.qid = vt.qid AND lt.doc_id = vt.doc_id)
      SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, rrf FROM
        (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rank FROM f)
      WHERE rank <= 10"""
  }
}
