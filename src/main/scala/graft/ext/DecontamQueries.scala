package graft.ext

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Train/eval hygiene operators for a large-scale training-data pipeline:
  * benchmark decontamination (the n-gram-overlap scrub every serious LLM
  * corpus runs against its eval sets) and Gopher-style repetition metrics
  * (the top-n-gram-fraction signals used to drop machine-generated or
  * boilerplate text). Both are exact, deterministic, and DuckDB-oracled.
  */
object DecontamQueries {

  /** [[PipelineQueries.splitBucket]], shared so x7's train/eval can never
    * desync from x6's split — train = buckets [0,80), eval = [90,100).
    */
  private def bucket = PipelineQueries.splitBucket

  def defs: Seq[Q] = Seq(
    // X7: benchmark decontamination — flag train docs sharing any 8-token
    // gram with the eval split (the GPT-3/Llama n-gram-collision scrub).
    // Per train doc: distinct 8-grams, how many also occur in eval, and
    // the contamination flag.
    //
    // Scale posture (100 TB): eval sets are benchmark-sized — their
    // distinct-gram table is tiny and BROADCAST, so the train side is one
    // shuffle-free map-side join after its per-doc distinct; nothing
    // quadratic, no corpus-wide gram join. In production the gram string
    // would be replaced by xxhash64(gram) to cut the shuffle/broadcast
    // width 10×; the string form is kept here so the DuckDB oracle can
    // reproduce every gram byte-for-byte.
    Q("x7_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("bucket", bucket)
          .withColumn("w", split(col("text"), " "))
          .where(size(col("w")) >= 8) // sequence(1, size-7) needs size >= 8
        val grams = docs.select(col("doc_id"), col("bucket"),
          explode(expr(
            "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))"))
            .as("gram"))
        val train = grams.where(col("bucket") < 80)
          .select("doc_id", "gram").distinct()
        val evalGrams = grams.where(col("bucket") >= 90)
          .select("gram").distinct().withColumn("hit", lit(1))
        train.join(broadcast(evalGrams), Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_matched"))
          .withColumn("contaminated", (col("n_matched") > 0).cast("int"))
      },
      Some("""WITH w AS (SELECT doc_id, (doc_id * 2654435761) % 100 AS bucket,
            string_split(text, ' ') AS words FROM documents),
        g AS (SELECT doc_id, bucket, array_to_string(words[i:i+7], ' ') AS gram
              FROM w, unnest(range(1, len(words) - 6)) AS t(i)),
        train AS (SELECT DISTINCT doc_id, gram FROM g WHERE bucket < 80),
        ev AS (SELECT DISTINCT gram FROM g WHERE bucket >= 90)
        SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
          CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
          CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0 AS INTEGER) AS contaminated
        FROM train t LEFT JOIN ev e USING (gram) GROUP BY t.doc_id""".stripMargin)),

    // X7b: repetition metrics (Gopher §A.1.1 shape) — per doc, the total
    // and top-1 counts of words and 2-grams; `repetitive` fires when the
    // most frequent 2-gram exceeds 20% of all 2-grams. Counts (not
    // fractions) cross the oracle: integers are engine-exact.
    //
    // Scale posture: pure per-doc map + two partial-aggregated groupBys
    // keyed by (doc_id, term) then doc_id — no corpus-wide state, no skew
    // (a doc's terms are bounded by its length), broadcast-free.
    Q("x7b_repetition",
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("w", split(col("text"), " "))
        val wc = docs.select(col("doc_id"), explode(col("w")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val wAgg = wc.groupBy("doc_id")
          .agg(sum("c").as("n_words"), max("c").as("top_word_n"))
        val bc = docs.where(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"))
            .as("bg"))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        val bAgg = bc.groupBy("doc_id")
          .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
        wAgg.join(bAgg, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_bigrams", "top_bigram_n"))
          .withColumn("repetitive",
            (col("top_bigram_n") * 5L > col("n_bigrams")).cast("int"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        tok AS (SELECT doc_id, unnest(words) AS tok FROM w),
        wc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
        wagg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                   CAST(MAX(c) AS BIGINT) AS top_word_n FROM wc GROUP BY doc_id),
        bgrams AS (SELECT doc_id, array_to_string(words[i:i+1], ' ') AS bg
                   FROM w, unnest(range(1, len(words))) AS t(i)),
        bc AS (SELECT doc_id, bg, count(*) AS c FROM bgrams GROUP BY doc_id, bg),
        bagg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                   CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM bc GROUP BY doc_id)
        SELECT wagg.doc_id, n_words, top_word_n,
          CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
          CAST(coalesce(top_bigram_n, 0) * 5 > coalesce(n_bigrams, 0) AS INTEGER) AS repetitive
        FROM wagg LEFT JOIN bagg USING (doc_id)""".stripMargin))
  )
}
