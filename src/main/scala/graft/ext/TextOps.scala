package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table — training-data-pipeline
  * operators (language ID, quality scoring, token stats, fingerprinting).
  * Everything is a codegen'd projection/aggregate over one scan; no UDFs,
  * no driver-side work — the shapes that survive a 100 TB corpus.
  *
  * Cross-engine determinism: token hashes come from MD5 hex prefixes
  * (identical bytes in Spark and DuckDB), folds run in exact integer
  * arithmetic mod 1e9+7, and each ratio is a single double division.
  */
object TextOps {

  private def t(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Non-empty whitespace tokens of a text column. NULL text yields an
    * EMPTY array (r13 ADVICE): the per-row fold consumers (t6/t13
    * lexical stats) would otherwise see `size(NULL) = -1` under Spark's
    * default `legacy.sizeOfNull` and NULL fold results, while the
    * oracle's `unnest(NULL)` + `COALESCE(…, 0)` path reports all-zeros
    * — coalescing here keeps null and empty documents on the same
    * all-zeros contract at every consumer (explode semantics are
    * unchanged: both NULL and empty arrays produce no rows).
    */
  def tokens(text: Column): Column =
    coalesce(filter(split(text, " "), x => x =!= lit("")), array())

  /** Oracle dual of [[tokens]] — the COALESCE mirrors the Spark side's
    * (r14 review: a one-sided null guard is a latent cross-engine
    * divergence; `len(NULL)` is NULL in DuckDB vs `size([])` = 0 in
    * Spark the moment a null text cell appears).
    */
  val tokensSql: String =
    "COALESCE(list_filter(string_split(text, ' '), x -> x != ''), [])"

  /** Space-joined word n-grams of a token array — the ONE n-gram
    * builder, shared by the dedup shingle tier (n=3) and the repetition
    * signals (n=2,3) so the two can't drift. Empty when the document
    * has fewer than n tokens.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j =>
          if (j == 0) element_at(toks, i) else element_at(toks, i + j)): _*)))
      .otherwise(array())

  /** DuckDB dual of [[ngrams]] over a list expression. */
  def ngramsSql(l: String, n: Int): String = {
    val parts = (0 until n).map(j => if (j == 0) s"$l[i]" else s"$l[i+$j]").mkString(", ")
    s"CASE WHEN len($l) >= $n THEN list_transform(range(1, len($l) - ${n - 2}), " +
      s"i -> concat_ws(' ', $parts)) ELSE CAST([] AS VARCHAR[]) END"
  }

  /** First-8-hex-digits-of-MD5 token hash — a 32-bit integer identical in
    * any engine with a standard MD5 (used by minhash/simhash/fingerprint).
    */
  def tokenHash(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  def tokenHashSql(w: String): String =
    s"CAST(concat('0x', substr(md5($w), 1, 8)) AS BIGINT)"

  /** First-12-hex-digits-of-MD5 — a 48-bit hash for SimHash: every one of
    * the 4×12-bit fingerprint blocks must discriminate, which a 32-bit
    * hash can't (its bits 32-47 would be constant-zero and the block join
    * on them would degenerate to an all-pairs cross join).
    */
  def tokenHash48(w: Column): Column =
    conv(substring(md5(w), 1, 12), 16, 10).cast("long")

  def tokenHash48Sql(w: String): String =
    s"CAST(concat('0x', substr(md5($w), 1, 12)) AS BIGINT)"

  /** T1: token statistics — count, distinct count, mean token length. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    t(s, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(toks).cast("double")).as("mean_token_len"))
      .orderBy("doc_id")
  }

  val tokenStatsSql: String = s"""SELECT doc_id,
      len($tokensSql) AS n_tokens,
      len(list_distinct($tokensSql)) AS n_distinct,
      CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($tokensSql) AS DOUBLE) AS mean_token_len
    FROM documents ORDER BY doc_id"""

  /** BPE-ish token pattern: letter runs, single digits, or single
    * non-alphanumeric marks — the regex tier of token counting (simple
    * character classes only, so Java regex and RE2 agree).
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** T5: regex token counting — whitespace tokens vs BPE-ish subword
    * count vs characters, plus the tokens-per-word expansion ratio.
    */
  def bpeTokenCount(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
    t(s, dir).select(
      col("doc_id"),
      size(toks).as("n_words"),
      nBpe.as("n_bpe_tokens"),
      length(col("text")).as("n_chars_"),
      round(nBpe.cast("double") / size(toks).cast("double"), 6).as("tokens_per_word"))
      .orderBy("doc_id")
  }

  val bpeTokenCountSql: String = s"""SELECT doc_id,
      len($tokensSql) AS n_words,
      len(regexp_extract_all(text, '$BpePattern')) AS n_bpe_tokens,
      length(text) AS n_chars_,
      ROUND(CAST(len(regexp_extract_all(text, '$BpePattern')) AS DOUBLE) /
            CAST(len($tokensSql) AS DOUBLE), 6) AS tokens_per_word
    FROM documents ORDER BY doc_id"""

  // -------------------------------------------------------- T16 exact BPE

  /** T16 merge table — (left, right) pairs in RANK order, a tiny
    * GPT-2-style learned-merge prefix over frequent English character
    * pairs, embedded as a literal so the oracle states the identical
    * table. Well-formed: every operand is a single character or the
    * output of a strictly earlier merge, the invariant BPE training
    * guarantees (Sennrich et al. 2016) and the one that makes
    * rank-order exhaustive application equivalent to
    * lowest-rank-first iteration.
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "in" -> "g", "an" -> "d")

  /** Replace passes per merge (see [[bpeExact]]): a left-to-right
    * replace-all pass can skip an occurrence whose leading separator the
    * previous replacement consumed (adjacent repetitions of the same
    * pair), and each extra pass catches the stragglers; 3 covers the
    * repetition runs natural text contains. The tokenization is DEFINED
    * by this pass count, so both engines agree exactly even on
    * pathological inputs.
    */
  val BpePasses = 3

  /** Per-word exact-BPE symbol count: the word is encoded as
    * `|c|h|a|r|s|`, each merge in [[BpeMerges]] rank order is applied as
    * [[BpePasses]] `replace(s, "|l|r|", "|lr|")` passes, and the
    * surviving symbol count is the separator count − 1. Pure string
    * algebra — no floats, no UDF, one static codegen'd expression chain.
    */
  private def bpeWordTokens(w: Column): Column = {
    val init = concat(lit("|"), regexp_replace(w, "(.)", "$1|"))
    val merged = BpeMerges.foldLeft(init) { case (acc, (l, r)) =>
      (1 to BpePasses).foldLeft(acc)((a, _) =>
        replace(a, lit(s"|$l|$r|"), lit(s"|$l$r|")))
    }
    length(merged) - length(replace(merged, lit("|"), lit(""))) - 1
  }

  /** T16: tokenizer-TRUE BPE token count — unlike T5's character-class
    * heuristic, this runs a real byte-pair-encoding merge loop with a
    * fixed learned-merge table over every lowercased alphabetic word
    * (non-alpha words count as one atomic token, the unknown-symbol
    * convention). Token budgets denominated in these counts (W2/W5's
    * role) track a real tokenizer's behavior: common sequences
    * ("the", "ing", "and") compress to single symbols exactly as a
    * trained BPE vocabulary would.
    *
    * Cross-engine exactness WITHOUT recursion or UDFs: the merge loop
    * unrolls into a static chain of `replace` calls (merges in rank
    * order × [[BpePasses]] passes — both engines define `replace` as
    * non-overlapping left-to-right replace-all, so the chain computes
    * the identical integer in both), and every output is an exact
    * integer or one guarded division rounded at 6.
    *
    * Scale shape (r13): the merge chain's cost depends only on the
    * WORD, and word occurrences are Zipf-repetitive, so the 36-replace
    * projection runs once per DISTINCT lowercased word (vocab grain,
    * orders of magnitude below occurrence grain) — the T10/T11
    * vocab-leg rule applied to string algebra. Occurrences pre-agg to
    * (doc, word) counts (map-side partials), join the vocab cost on the
    * word key (planner-sized; AQE handles the stop-word skew), then one
    * doc-grain aggregate and the empty-doc left join. The oracle states
    * the equivalent per-occurrence form — `ntok` is a pure function of
    * the word, so the two agree cell-for-cell.
    */
  def bpeExact(s: SparkSession, dir: String): DataFrame =
    bpeExactFrom(t(s, dir))

  /** [[bpeExact]] over an explicit `(doc_id, text)` relation — the spec
    * drives crafted words through it against a plain-JVM reference fold.
    */
  def bpeExactFrom(d: DataFrame): DataFrame = {
    val wc = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val vocabCost = wc.select(col("w")).distinct()
      .select(col("w"),
        when(col("w").rlike("^[a-z]+$"), bpeWordTokens(col("w")).cast("long"))
          .otherwise(lit(1L)).as("ntok"))
    val perDoc = wc.join(vocabCost, "w")
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), sum(col("c") * col("ntok")).as("n_bpe_exact"))
    d.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_exact"), lit(0L)).as("n_bpe_exact"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          round(col("n_bpe_exact").cast("double") / col("n_words").cast("double"), 6))
          .otherwise(lit(0.0)).as("bpe_per_word"))
      .orderBy("doc_id")
  }

  val bpeExactSql: String = {
    val init = "'|' || regexp_replace(lower(w), '(.)', '\\1|', 'g')"
    val chain = BpeMerges.foldLeft(init) { case (acc, (l, r)) =>
      (1 to BpePasses).foldLeft(acc)((a, _) =>
        s"replace($a, '|$l|$r|', '|$l$r|')")
    }
    s"""WITH words AS (
      SELECT doc_id, unnest($tokensSql) AS w FROM documents),
    cnt AS (
      SELECT doc_id,
        CASE WHEN regexp_matches(lower(w), '^[a-z]+$$')
          THEN length($chain) - length(replace($chain, '|', '')) - 1
          ELSE 1 END AS ntok
      FROM words),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(ntok) AS BIGINT) AS n_bpe_exact
      FROM cnt GROUP BY doc_id)
    SELECT d.doc_id,
      COALESCE(n_words, 0) AS n_words,
      COALESCE(n_bpe_exact, 0) AS n_bpe_exact,
      CASE WHEN COALESCE(n_words, 0) > 0
        THEN ROUND(CAST(n_bpe_exact AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        ELSE 0.0 END AS bpe_per_word
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    ORDER BY d.doc_id"""
  }

  /** Stopword sets used by the quality/language heuristics. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => words.map(w => x === lit(w)).reduce(_ || _)))

  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter($tokensSql, x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** T2: quality scoring — length, stopword ratio, uppercase ratio,
    * digit ratio, a composite score, plus the remaining Gopher-style
    * signals (Rae et al. 2021, table A1): symbol-to-word ratio (#, …,
    * and '...' occurrences per word), mean/max line length, the
    * fractions of lines that start with a bullet or end in an ellipsis,
    * and the word-level signals — the fraction of words containing at
    * least one alphabetic character (Gopher keeps docs ≥ 80%) and the
    * mean word length (Gopher window 3–10; Σ len(word) is computed as
    * the length of the separator-free token concatenation, an exact
    * integer). One scan; every ratio is exact integer counts through
    * one IEEE division (mean line length uses Σ len(line) = len(text)
    * − (n−1) separators, so no per-line float accumulation exists to
    * reorder).
    */
  /** The T2 composite quality score as a column over `text` — shared by
    * [[qualityScore]] and the C1 curation funnel. Rounded at 6 decimals
    * so a downstream threshold compares the IDENTICAL value in both
    * engines (the round is the comparison boundary).
    */
  def qualityCol: Column = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopRatio = hits(toks, EnStop).cast("double") / nTok
    val digitRatio = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      length(col("text")).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    round(lit(0.5) * stopRatio + lit(0.3) * lenScore + lit(0.2) * (lit(1.0) - digitRatio), 6)
  }

  /** SQL form of [[qualityCol]] — textually the same expression the T2
    * oracle states, so both gates compare one formulation.
    */
  val qualityColSql: String = {
    val nTok = s"CAST(len($tokensSql) AS DOUBLE)"
    val stop = s"CAST(${hitsSql(EnStop)} AS DOUBLE) / $nTok"
    val digit = "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
    val lenScore = s"LEAST($nTok / 100.0, 1.0)"
    s"ROUND(0.5 * ($stop) + 0.3 * $lenScore + 0.2 * (1.0 - ($digit)), 6)"
  }

  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]")))
    val sumWordLen = length(concat_ws("", toks))
    val stopRatio = hits(toks, EnStop).cast("double") / nTok
    val upperRatio = length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double") /
      length(col("text")).cast("double")
    val digitRatio = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      length(col("text")).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val nHash = length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
    val nUEll = length(col("text")) - length(replace(col("text"), lit("…"), lit("")))
    // non-overlapping '...' occurrences: each removal drops exactly 3
    // chars, so the double division below is an exact integer
    val nDotEll = ((length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))) / lit(3)).cast("long")
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, x =>
      Seq("-", "*", "•").map(b => ltrim(x).startsWith(b)).reduce(_ || _)))
    val ellLines = size(filter(lines, x =>
      rtrim(x).endsWith("...") || rtrim(x).endsWith("…")))
    t(s, dir).select(
      col("doc_id"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(upperRatio, 6).as("upper_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      round((nHash + nUEll + nDotEll).cast("double") / nTok, 6).as("symbol_word_ratio"),
      round((length(col("text")) - nLines + 1).cast("double") / nLines.cast("double"), 6)
        .as("mean_line_len"),
      array_max(transform(lines, x => length(x))).as("max_line_len"),
      round(bulletLines.cast("double") / nLines.cast("double"), 6).as("bullet_line_frac"),
      round(ellLines.cast("double") / nLines.cast("double"), 6).as("ellipsis_line_frac"),
      round(alphaWords.cast("double") / nTok, 6).as("alpha_word_frac"),
      round(sumWordLen.cast("double") / nTok, 6).as("mean_word_len"),
      qualityCol.as("quality"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val nTok = s"CAST(len($tokensSql) AS DOUBLE)"
    val stop = s"CAST(${hitsSql(EnStop)} AS DOUBLE) / $nTok"
    val upper = "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
    val digit = "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
    val lenScore = s"LEAST($nTok / 100.0, 1.0)"
    val nSym = "(length(text) - length(replace(text, '#', ''))) + " +
      "(length(text) - length(replace(text, chr(8230), ''))) + " +
      "(length(text) - length(replace(text, '...', ''))) // 3"
    val lines = "string_split(text, chr(10))"
    val nLines = s"len($lines)"
    val bullet = s"len(list_filter($lines, x -> starts_with(ltrim(x), '-') " +
      "OR starts_with(ltrim(x), '*') OR starts_with(ltrim(x), chr(8226))))"
    val ell = s"len(list_filter($lines, x -> ends_with(rtrim(x), '...') " +
      "OR ends_with(rtrim(x), chr(8230))))"
    s"""SELECT doc_id,
      ROUND($stop, 6) AS stopword_ratio,
      ROUND($upper, 6) AS upper_ratio,
      ROUND($digit, 6) AS digit_ratio,
      ROUND(CAST($nSym AS DOUBLE) / $nTok, 6) AS symbol_word_ratio,
      ROUND(CAST(length(text) - $nLines + 1 AS DOUBLE) / CAST($nLines AS DOUBLE), 6) AS mean_line_len,
      list_max(list_transform($lines, x -> length(x))) AS max_line_len,
      ROUND(CAST($bullet AS DOUBLE) / CAST($nLines AS DOUBLE), 6) AS bullet_line_frac,
      ROUND(CAST($ell AS DOUBLE) / CAST($nLines AS DOUBLE), 6) AS ellipsis_line_frac,
      ROUND(CAST(len(list_filter($tokensSql, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / $nTok, 6) AS alpha_word_frac,
      ROUND(CAST(length(array_to_string($tokensSql, '')) AS DOUBLE) / $nTok, 6) AS mean_word_len,
      ROUND(0.5 * ($stop) + 0.3 * $lenScore + 0.2 * (1.0 - ($digit)), 6) AS quality
    FROM documents ORDER BY doc_id"""
  }

  /** The T3 language decision as a column over `text` — shared by
    * [[langId]] and the C2 data card so the heuristic can't drift.
    */
  def predictedLang: Column = {
    val toks = tokens(col("text"))
    val en = hits(toks, EnStop); val es = hits(toks, EsStop); val de = hits(toks, DeStop)
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** SQL form of [[predictedLang]] — textually the fragment both the T3
    * and C2 oracles state.
    */
  val predictedLangSql: String =
    s"""CASE WHEN ${hitsSql(EnStop)} >= ${hitsSql(EsStop)} AND ${hitsSql(EnStop)} >= ${hitsSql(DeStop)} THEN 'en'
           WHEN ${hitsSql(EsStop)} >= ${hitsSql(DeStop)} THEN 'es' ELSE 'de' END"""

  /** T3: language ID by stopword-hit argmax (en/es/de, ties resolved in
    * that order) — the n-gram-free heuristic tier of a language filter.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    t(s, dir).select(
      col("doc_id"), hits(toks, EnStop).as("en_hits"), hits(toks, EsStop).as("es_hits"),
      hits(toks, DeStop).as("de_hits"), predictedLang.as("predicted_lang"))
      .orderBy("doc_id")
  }

  val langIdSql: String = s"""SELECT doc_id,
      ${hitsSql(EnStop)} AS en_hits, ${hitsSql(EsStop)} AS es_hits, ${hitsSql(DeStop)} AS de_hits,
      $predictedLangSql AS predicted_lang
    FROM documents ORDER BY doc_id"""

  /** T22: language-ID confusion matrix — the audit that decides whether
    * the T3 heuristic is good enough to gate on: per (source, declared
    * lang, predicted lang), the doc count and its share of the declared
    * class (the per-class recall diagonal and the off-diagonal confusion
    * mass). Declared labels come from the corpus, predictions from the
    * SAME [[predictedLang]] column T3 and the C2 data card use, so the
    * three views cannot drift.
    *
    * Determinism: exact integer counts; the share is one IEEE division
    * rounded at the boundary.
    *
    * Scale shape: one grouped count over the corpus (map-side partials
    * onto a ≤|sources|·|langs|² key space), then the class totals as a
    * window over that already-aggregated bounded relation — the corpus
    * is scanned ONCE; no join-back, no second scan.
    */
  def langidConfusion(s: SparkSession, dir: String): DataFrame = {
    val wTot = Window.partitionBy("source", "lang")
    t(s, dir).select(col("source"), col("lang"), predictedLang.as("plang"))
      .groupBy("source", "lang", "plang").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_lang", sum("n_docs").over(wTot))
      .select(col("source"), col("lang"), col("plang"), col("n_docs"),
        col("n_lang"),
        round(col("n_docs").cast("double") / col("n_lang").cast("double"), 6)
          .as("class_share"))
      .orderBy("source", "lang", "plang")
  }

  val langidConfusionSql: String = s"""WITH base AS (
      SELECT source, lang, $predictedLangSql AS plang FROM documents),
    cnt AS (
      SELECT source, lang, plang, COUNT(*) AS n_docs
      FROM base GROUP BY 1, 2, 3)
    SELECT source, lang, plang, n_docs,
      CAST(SUM(n_docs) OVER (PARTITION BY source, lang) AS BIGINT) AS n_lang,
      ROUND(CAST(n_docs AS DOUBLE) /
        CAST(CAST(SUM(n_docs) OVER (PARTITION BY source, lang) AS BIGINT) AS DOUBLE), 6) AS class_share
    FROM cnt ORDER BY source, lang, plang"""

  val FingerprintMod: Long = 1000000007L

  /** T4: document fingerprint — rolling polynomial hash over token hashes
    * (acc*31 + h) mod 1e9+7, folded left-to-right. Exact integer
    * arithmetic: bit-identical across engines and partition layouts.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir).select(
      col("doc_id"),
      aggregate(tokens(col("text")), lit(0L),
        (acc, w) => (acc * 31L + tokenHash(w)) % FingerprintMod).as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String = s"""SELECT doc_id,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT), list_transform($tokensSql, w -> ${tokenHashSql("w")})),
        (a, b) -> (a * 31 + b) % $FingerprintMod) AS fingerprint
    FROM documents ORDER BY doc_id"""

  /** T7 split fractions: 80/10/10 by hash bucket. */
  val TrainBuckets = 80
  val ValBuckets = 90

  /** The T7 split decision as a column over a doc-id column — the ONE
    * place the 80/10/10 assignment lives, shared by [[hashSplit]] and
    * the W6 leakage check so the split definition can't drift.
    */
  def splitOf(docId: Column): Column = {
    val bucket = pmod(tokenHash(docId.cast("string")), lit(100L))
    when(bucket < TrainBuckets, "train")
      .when(bucket < ValBuckets, "val")
      .otherwise("test")
  }

  /** SQL form of [[splitOf]] over a doc-id expression. */
  def splitOfSql(e: String): String =
    s"""CASE WHEN ${tokenHashSql(s"CAST($e AS VARCHAR)")} % 100 < $TrainBuckets THEN 'train'
         WHEN ${tokenHashSql(s"CAST($e AS VARCHAR)")} % 100 < $ValBuckets THEN 'val'
         ELSE 'test' END"""

  /** T7: deterministic train/val/test assignment — bucket = MD5-prefix
    * hash of the document id mod 100. Hash-based (not random) so the
    * assignment is reproducible across engines and STABLE under corpus
    * growth: adding documents never reassigns an existing one, which
    * sampled splits can't guarantee. Pure projection — no shuffle, no
    * state, embarrassingly parallel at any corpus size.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(tokenHash(col("doc_id").cast("string")), lit(100L))
    t(s, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      splitOf(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  val hashSplitSql: String = s"""SELECT doc_id, bucket,
      CASE WHEN bucket < $TrainBuckets THEN 'train'
           WHEN bucket < $ValBuckets THEN 'val'
           ELSE 'test' END AS split
    FROM (SELECT doc_id,
        ${tokenHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents) ORDER BY doc_id"""

  /** Gopher-style repetition thresholds (Rae et al. 2021, table A1 —
    * occurrence-fraction variants of the top-2-gram / duplicate-3-gram
    * character filters).
    */
  val TopBigramMax = 0.20
  val DupTrigramMax = 0.30

  /** T6: repetition signals — the occurrence share of the most frequent
    * bigram, the fraction of trigram occurrences that are repeats, and
    * the resulting keep/drop flag.
    *
    * The 100 TB shape (r13): every signal is a pure function of ONE
    * document's token array, so the whole computation is a per-row
    * projection — the most-frequent-bigram count is the longest run in
    * the doc's SORTED bigram array (an `aggregate` fold over ≤doc-length
    * elements), duplicate trigram occurrences are `size −
    * size(array_distinct)`. No gram ever leaves its row: the former
    * explode + (doc, n, gram) aggregate serialized every 2-gram and
    * 3-gram of the corpus through an exchange (measured 1.9 s at sf0.1;
    * at 100 TB that exchange is ~2× the corpus in shuffle bytes for
    * zero cross-row information — the keys were doc-local by
    * construction). All signals remain ratios of exact integer counts
    * (one IEEE division + round(6) each), so the unchanged oracle
    * agrees bit-for-bit.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val g2 = array_sort(ngrams(col("t"), 2))
    val g3 = ngrams(col("t"), 3)
    // longest equal-run in the sorted bigram list = max occurrence count
    // (r14: the native codegen'd one-pass node — see t13)
    val m2 = call_function("graft_runstats", g2).getField("max_run")
    val n2 = size(g2)
    val n3 = size(g3)
    val d3 = size(array_distinct(g3))
    t(s, dir).select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        when(n2 > 0, round(m2.cast("double") / n2.cast("double"), 6))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        when(n3 > 0, round((n3 - d3).cast("double") / n3.cast("double"), 6))
          .otherwise(lit(0.0)).as("dup_trigram_frac"))
      .withColumn("repetitive",
        (col("top_bigram_frac") > TopBigramMax ||
          col("dup_trigram_frac") > DupTrigramMax).cast("int"))
      .orderBy("doc_id")
  }

  val repetitionSql: String = s"""WITH toks AS (
      SELECT doc_id, $tokensSql AS t FROM documents),
    bgl AS (SELECT doc_id, unnest(${ngramsSql("t", 2)}) AS g FROM toks),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bgl GROUP BY 1, 2),
    bs AS (SELECT doc_id, max(c) AS m2, sum(c) AS n2 FROM bc GROUP BY 1),
    tgl AS (SELECT doc_id, unnest(${ngramsSql("t", 3)}) AS g FROM toks),
    tc AS (SELECT doc_id, g, count(*) AS c FROM tgl GROUP BY 1, 2),
    tst AS (SELECT doc_id, count(*) AS d3, sum(c) AS n3 FROM tc GROUP BY 1),
    fr AS (SELECT d.doc_id,
        COALESCE(ROUND(CAST(m2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6), 0.0) AS top_bigram_frac,
        COALESCE(ROUND(CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE), 6), 0.0) AS dup_trigram_frac
      FROM documents d LEFT JOIN bs ON d.doc_id = bs.doc_id
        LEFT JOIN tst ON d.doc_id = tst.doc_id)
    SELECT doc_id, top_bigram_frac, dup_trigram_frac,
      CAST(top_bigram_frac > $TopBigramMax OR dup_trigram_frac > $DupTrigramMax AS INT)
        AS repetitive
    FROM fr ORDER BY doc_id"""

  // -------------------------------------------------------- T8 vocabulary

  val VocabTopK = 10
  val VocabBuckets = 64

  /** T8: per-language vocabulary head — the top-[[VocabTopK]] tokens by
    * corpus frequency per language (the vocab-mining / BPE-prep step of
    * a tokenizer pipeline). Ordering is integer-exact: count desc, then
    * token — no float enters the ranking.
    *
    * Scale shape: the naive form windows over EVERY distinct token of a
    * language in one partition — a per-language sort of a vocabulary
    * that can reach billions of types at 100 TB. Two-phase instead:
    * tokens first rank inside (language, hash-bucket) — [[VocabBuckets]]
    * parallel windows per language, each sorting vocab/buckets rows
    * (spill-backed; raise the bucket count with corpus size to shrink
    * them further — the phases compose, so a third level is the same
    * mechanical step) — and only each bucket's top K survive to the
    * per-language final window, which then sorts ≤ buckets·K rows. The
    * global top-K is a subset of the union of bucket top-Ks (any global
    * member ranks ≤ K inside its own bucket), so the phases lose
    * nothing. The oracle states the naive single-window form; both
    * agree exactly.
    */
  def vocabTopk(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val w1 = Window.partitionBy(col("lang"),
        pmod(tokenHash(col("tok")), lit(VocabBuckets.toLong)))
      .orderBy(col("cnt").desc, col("tok"))
    val pre = counts.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= VocabTopK)
    val w2 = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    pre.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= VocabTopK)
      .select(col("lang"), col("rk"), col("tok"), col("cnt"))
      .orderBy("lang", "rk")
  }

  val vocabTopkSql: String = s"""WITH toks AS (
      SELECT lang, unnest($tokensSql) AS tok FROM documents),
    counts AS (SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
    SELECT lang, rk, tok, cnt FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rk
      FROM counts)
    WHERE rk <= $VocabTopK ORDER BY lang, rk"""

  // ------------------------------------------------------------- T9 OOV

  /** Minimum corpus occurrence count for a token to enter the T9
    * reference vocabulary.
    */
  val OovMinCount = 5

  /** T9: vocabulary coverage / out-of-vocabulary rate — the
    * exact-integer analog of a perplexity filter (CCNet-style): the
    * corpus vocabulary is every token with ≥ [[OovMinCount]] total
    * occurrences; each document reports how many of its token
    * OCCURRENCES fall outside it. High OOV fraction flags boilerplate
    * gibberish, encoding damage, and wrong-language content without a
    * model artifact — and stays bit-deterministic (integer counts, one
    * IEEE division, round 6) where a real LM score would not be.
    *
    * Scale shape: occurrences pre-aggregate to (doc_id, tok, c) —
    * doc-local keys, map-side partials — before joining the vocabulary,
    * so the join input is bounded by Σ per-doc DISTINCT tokens, not raw
    * corpus length. The join key (tok) concentrates on stopwords at
    * corpus scale; it's a LEFT join against a 1-row-per-token build
    * side, the AQE-skew-splittable shape, and OOV tails (the rows that
    * matter) are by construction rare keys.
    */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val occ = t(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val vocab = occ.groupBy("tok").agg(sum("c").as("cc"))
      .filter(col("cc") >= OovMinCount)
      .select(col("tok"), lit(1L).as("iv"))
    val per = occ.join(vocab, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"),
        coalesce(sum(when(col("iv").isNotNull, col("c"))), lit(0L)).as("n_invocab"))
    t(s, dir).select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        (coalesce(col("n_tok"), lit(0L)) - coalesce(col("n_invocab"), lit(0L)))
          .as("n_oov"),
        when(coalesce(col("n_tok"), lit(0L)) > 0,
          round((col("n_tok") - col("n_invocab")).cast("double") /
            col("n_tok").cast("double"), 6))
          .otherwise(lit(0.0)).as("oov_frac"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- T10 surprisal

  /** T10: unigram surprisal — the model-free perplexity proxy (CCNet /
    * Wenzek et al. 2020 filter by LM perplexity; the unigram LM is its
    * zero-artifact degenerate case): the corpus itself is the language
    * model, P(tok) = corpus_count(tok) / corpus_total, and each document
    * scores mean token surprisal −ln P in nats. Low mean = stereotyped
    * boilerplate; high mean = rare-token noise — both prune tails.
    *
    * Cross-engine determinism (the transcendental tier of the CLAUDE.md
    * float rules): each DISTINCT token's surprisal ln(N) − ln(cc) is
    * computed ONCE on the vocab-sized relation and immediately
    * `round(…, 9)` — the 1-ulp libm divergence between engines dies at
    * that quantum — then the per-doc total accumulates those identical
    * doubles in exact DECIMAL(28,10) (partition-order independent, the
    * HistStats pattern), one IEEE division by the exact token count,
    * `round(…, 6)` at the comparison boundary. max_surprisal is an
    * order-free max of the identical rounded values.
    *
    * Scale shape: identical to [[oovRate]] — occurrences pre-aggregate
    * to doc-local (doc_id, tok, c) keys, the vocab relation is one row
    * per distinct token, the join key concentrates on stopwords but is
    * the AQE-skew-splittable LEFT-build shape, and the corpus-total is a
    * broadcast 1-row cross join.
    */
  def surprisal(s: SparkSession, dir: String): DataFrame =
    surprisalFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[surprisal]] over an explicit `(doc_id, text)` relation — the spec
    * pins exact nat values on a crafted two-document corpus.
    */
  def surprisalFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val occ = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      // feeds the vocab→total, vocab→surp, and per-doc join legs —
      // unpersisted, the corpus explode+pre-agg executes 3× (the T11
      // multi-leg rule)
      .persist()
    val vocab = occ.groupBy("tok").agg(sum("c").as("cc"))
    val total = vocab.agg(sum("cc").as("n")) // 1 row, provably bounded
    val surp = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        round(log(col("n").cast("double")) - log(col("cc").cast("double")), 9)
          .as("surp"))
    val per = occ.join(surp, "tok")
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"),
        // surp < 100 nats and c < 1e10 by construction, so the product
        // DECIMAL(20,10)×DECIMAL(10,0) = DECIMAL(31,10) is exact in both
        // engines (wider operands would overflow DuckDB's 38-digit cap
        // into double, breaking the bit-exactness)
        sum(col("surp").cast(DecimalType(20, 10)) *
          col("c").cast(DecimalType(10, 0))).as("tot"),
        max("surp").as("max_surprisal"))
    // r21 (verdict r20 item 1): the r20 doc-grain persist on `per` is
    // REMOVED — single consumer (the left join back onto the doc ids),
    // so it was a bench-iteration-only saving that a one-shot run pays
    // as a doc-grain materialization (guide §5). The multi-leg `occ`
    // persist above stays: it genuinely feeds 3 plan legs.
    d.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        when(col("n_tok") > 0,
          round(col("tot").cast("double") / col("n_tok").cast("double"), 6))
          .otherwise(lit(0.0)).as("mean_surprisal"),
        coalesce(col("max_surprisal"), lit(0.0)).as("max_surprisal"))
      .orderBy("doc_id")
  }

  /** Oracle CTE chain `occ → vocab → tot → surp → per` — the SQL dual
    * of [[surprisalFrom]]'s internals, shared by the T10 and T19
    * oracles so the perplexity proxy can't drift between them.
    */
  private val surprisalCtes: String = s"""occ AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
      GROUP BY 1, 2),
    vocab AS (SELECT tok, SUM(c) AS cc FROM occ GROUP BY tok),
    tot AS (SELECT SUM(cc) AS n FROM vocab),
    surp AS (
      SELECT tok, ROUND(ln(CAST(n AS DOUBLE)) - ln(CAST(cc AS DOUBLE)), 9) AS surp
      FROM vocab CROSS JOIN tot),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        SUM(CAST(surp AS DECIMAL(20,10)) * CAST(c AS DECIMAL(10,0))) AS tot,
        MAX(surp) AS max_surprisal
      FROM occ JOIN surp USING (tok)
      GROUP BY 1)"""

  val surprisalSql: String = s"""WITH $surprisalCtes
    SELECT d.doc_id,
      COALESCE(n_tok, 0) AS n_tok,
      CASE WHEN n_tok > 0
        THEN ROUND(CAST(tot AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        ELSE 0.0 END AS mean_surprisal,
      COALESCE(max_surprisal, 0.0) AS max_surprisal
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    ORDER BY d.doc_id"""

  /** T11: bigram conditional surprisal — the next tier of the T10
    * perplexity proxy: each bigram occurrence scores
    * −ln P(w|prev) = ln(prefix_count(prev)) − ln(bigram_count(prev w)),
    * where prefix_count is the corpus count of `prev` in bigram-initial
    * position (so the conditional distribution per prefix sums to 1
    * exactly). A bigram model separates fluent boilerplate (low) from
    * shuffled-token word salad (high) where unigram stats can't — the
    * two corpora share unigram counts by construction.
    *
    * Same determinism scheme as [[surprisal]]: per-distinct-bigram
    * surprisal rounded at 9 on the vocab-sized relation, per-doc
    * accumulation of those identical doubles in exact DECIMAL, one
    * division, round 6. Same scale shape too — bigram occurrences
    * pre-aggregate doc-locally before joining the bigram vocabulary;
    * the shared [[ngrams]] builder keeps the bigram definition
    * identical to the D2/T6 shingle tier.
    */
  def bigramSurprisal(s: SparkSession, dir: String): DataFrame =
    bigramSurprisalFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[bigramSurprisal]] over an explicit `(doc_id, text)` relation.
    *
    * The bigram vocabulary is keyed by (hash(bigram), hash(prefix)) —
    * 32-bit MD5-prefix longs, the D2 shingle convention — so every
    * exchange carries 16 bytes instead of two-word strings; the strings
    * die at the scan projection. The oracle applies the identical
    * hashes, so a collision (which merges two bigrams' counts) affects
    * both engines identically. Measured: the string-keyed form ran
    * 3.9 s warm at sf0.1, this one ~1.5 s.
    */
  def bigramSurprisalFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val occ = d
      .select(col("doc_id"), explode(ngrams(tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"), tokenHash(col("g")).as("h"),
        tokenHash(split(col("g"), " ")(0)).as("hp"))
      .groupBy("doc_id", "h", "hp").agg(count(lit(1)).as("c"))
      // feeds the vocab leg AND the per-doc join — without the persist
      // the n-gram explode + pre-agg (the dominant cost) runs twice
      // (the D2 `raw` persist, same reasoning); 3 longs + a count per
      // row, the narrowest relation in the plan
      .persist()
    val vocab = occ.groupBy("h", "hp").agg(sum("c").as("cg"))
    val prefixes = vocab.groupBy("hp").agg(sum("cg").as("cp"))
    val surp = vocab
      .join(prefixes, "hp")
      .select(col("h"), col("hp"),
        round(log(col("cp").cast("double")) - log(col("cg").cast("double")), 9)
          .as("surp"))
    val per = occ.join(surp, Seq("h", "hp"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        sum(col("surp").cast(DecimalType(20, 10)) *
          col("c").cast(DecimalType(10, 0))).as("tot"),
        max("surp").as("max_bigram_surprisal"))
    // r21 (verdict r20 item 1): the r20 doc-grain persist on `per` is
    // REMOVED (single consumer — bench-iteration-only reuse, guide §5);
    // the multi-leg `occ` persist above stays (vocab leg + per-doc join).
    d.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          round(col("tot").cast("double") / col("n_bigrams").cast("double"), 6))
          .otherwise(lit(0.0)).as("mean_bigram_surprisal"),
        coalesce(col("max_bigram_surprisal"), lit(0.0)).as("max_bigram_surprisal"))
      .orderBy("doc_id")
  }

  /** Vocabulary head size for the T12 Zipf fit. */
  val ZipfK = 100

  /** T12: Zipf slope — least-squares fit of ln(frequency) against
    * ln(rank) over the top-[[ZipfK]] corpus tokens: the corpus-health
    * check of a text pipeline (natural language sits near slope −1;
    * templated/boilerplate corpora flatten, adversarial or deduped-to-
    * death corpora steepen). Emits one row: the head size actually
    * fitted, the slope, and the intercept.
    *
    * Determinism: ranks are exact integers (count desc, token asc);
    * ln(rank)/ln(count) are rounded at 9 (the T10 transcendental rule);
    * their products and squares — doubles of already-identical inputs —
    * accumulate in exact DECIMAL(25,12); the closed-form slope is then
    * arithmetic over identical doubles, rounded at 6. The fit relation
    * is ≤ [[ZipfK]] rows, so the final aggregate is trivially bounded.
    *
    * Scale shape: corpus → (tok, count) is one pre-aggregated shuffle;
    * the head extraction is the T8 two-phase bucketed top-k (no
    * vocab-sized single-partition window); everything after operates on
    * ≤ buckets·K rows.
    */
  def zipfSlope(s: SparkSession, dir: String): DataFrame =
    zipfSlopeFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[zipfSlope]] over an explicit `(doc_id, text)` relation — the
    * spec pins the slope on a corpus with an exact power-law head.
    */
  def zipfSlopeFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = d.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cc"))
    val w1 = Window.partitionBy(pmod(tokenHash(col("tok")), lit(VocabBuckets.toLong)))
      .orderBy(col("cc").desc, col("tok"))
    val head = counts.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= ZipfK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cc").desc, col("tok"))))
      .filter(col("rk") <= ZipfK)
    val xy = head.select(
      round(log(col("rk").cast("double")), 9).as("x"),
      round(log(col("cc").cast("double")), 9).as("y"))
    val sums = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(25, 12))).cast("double").as("sx"),
      sum(col("y").cast(DecimalType(25, 12))).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(DecimalType(25, 12))).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(DecimalType(25, 12))).cast("double").as("sxx"))
    // a 0- or 1-point head has denominator 0: emit NULL explicitly —
    // the raw 0/0 NaN orders differently across engines (CLAUDE.md)
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
    sums.select(
      col("n").as("n_fit"),
      when(denom > 0, round(slope, 6)).as("slope"),
      when(denom > 0, round((col("sy") - slope * col("sx")) / col("n"), 6))
        .as("intercept"))
  }

  val zipfSlopeSql: String = {
    val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    s"""WITH counts AS (
      SELECT tok, COUNT(*) AS cc
      FROM (SELECT unnest($tokensSql) AS tok FROM documents)
      GROUP BY tok),
    head AS (
      SELECT rk, cc FROM (
        SELECT *, row_number() OVER (ORDER BY cc DESC, tok) AS rk FROM counts)
      WHERE rk <= $ZipfK),
    xy AS (
      SELECT ROUND(ln(CAST(rk AS DOUBLE)), 9) AS x,
             ROUND(ln(CAST(cc AS DOUBLE)), 9) AS y
      FROM head),
    sums AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(x AS DECIMAL(25,12))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(25,12))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x * y AS DECIMAL(25,12))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE) AS sxx
      FROM xy)
    SELECT n AS n_fit,
      CASE WHEN n * sxx - sx * sx > 0 THEN ROUND($slope, 6) END AS slope,
      CASE WHEN n * sxx - sx * sx > 0
        THEN ROUND((sy - ($slope) * sx) / n, 6) END AS intercept
    FROM sums"""
  }

  val bigramSurprisalSql: String = s"""WITH occ AS (
      SELECT doc_id, ${tokenHashSql("g")} AS h,
        ${tokenHashSql("split_part(g, ' ', 1)")} AS hp, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(${ngramsSql("toks", 2)}) AS g
            FROM (SELECT doc_id, $tokensSql AS toks FROM documents))
      GROUP BY 1, 2, 3),
    vocab AS (SELECT h, hp, SUM(c) AS cg FROM occ GROUP BY 1, 2),
    prefixes AS (SELECT hp, SUM(cg) AS cp FROM vocab GROUP BY 1),
    surp AS (
      SELECT h, hp, ROUND(ln(CAST(cp AS DOUBLE)) - ln(CAST(cg AS DOUBLE)), 9) AS surp
      FROM vocab JOIN prefixes USING (hp)),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        SUM(CAST(surp AS DECIMAL(20,10)) * CAST(c AS DECIMAL(10,0))) AS tot,
        MAX(surp) AS max_bigram_surprisal
      FROM occ JOIN surp USING (h, hp)
      GROUP BY 1)
    SELECT d.doc_id,
      COALESCE(n_bigrams, 0) AS n_bigrams,
      CASE WHEN n_bigrams > 0
        THEN ROUND(CAST(tot AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
        ELSE 0.0 END AS mean_bigram_surprisal,
      COALESCE(max_bigram_surprisal, 0.0) AS max_bigram_surprisal
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    ORDER BY d.doc_id"""

  // -------------------------------------------- T15 quality winsorization

  /** Value-range bucket count for the T15 two-phase exact rank. */
  val WinsorBuckets = 64

  /** T15: exact-percentile quality winsorization — the corpus' exact
    * (nearest-rank) p05/p50/p95 quality scores, the winsorized mean,
    * and the clipped-tail counts: the robust-statistics row of a data
    * card (outlier-resistant where the plain mean is not, and the
    * threshold pair a quality-gate sweep starts from). "Exact" is the
    * point — percentile_approx-style sketches put engines off by a
    * rank, so this computes the true order statistic.
    *
    * Determinism: quality is rounded at 6 BEFORE ranking (the shared
    * [[qualityCol]] boundary), ranks tie-break on doc_id, the
    * nearest-rank index k = ⌈p·n/100⌉ is pure integer arithmetic, and
    * the winsorized mean accumulates already-rounded values in exact
    * DECIMAL with one final division.
    *
    * Scale shape: the W4 two-phase VALUE-range rank — quality ∈ [0,1]
    * buckets by ⌊q·64⌋ (monotone in the rank key), ranks are computed
    * inside bounded bucket partitions, and the global rank is bucket
    * offset (a ≤64-row window) + within-bucket rank; the corpus never
    * sorts in one partition. The quantile extraction is a full-scan
    * aggregate with map-side partials (3 conditional maxes), and the
    * winsorized mean is a second scan against the broadcast 1-row
    * quantile relation. The oracle states the naive single-window form;
    * both agree exactly.
    */
  def qualityWinsor(s: SparkSession, dir: String): DataFrame =
    qualityWinsorFrom(t(s, dir).select(col("doc_id"), qualityCol.as("q")))

  /** [[qualityWinsor]] over an explicit `(doc_id, q)` relation with
    * q ∈ [0,1] — the spec pins exact order statistics on a crafted
    * ladder.
    */
  def qualityWinsorFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = d.withColumn("bucket",
        least(floor(col("q") * WinsorBuckets), lit(WinsorBuckets - 1L)).cast("long"))
      .persist() // feeds the offsets, the ranked leg, and the final mean
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val off = base.groupBy("bucket").agg(count(lit(1)).as("c"))
      .select(col("bucket"), coalesce(sum("c").over(wOff), lit(0L)).as("off"))
    val total = base.agg(count(lit(1)).as("n")) // 1 row, provably bounded
    val wRk = Window.partitionBy("bucket").orderBy(col("q"), col("doc_id"))
    val ranked = base.withColumn("r", row_number().over(wRk))
      .join(off, "bucket")
      .withColumn("rk", col("off") + col("r"))
    def kOf(p: Int) = expr(s"(n * $p + 99) div 100")
    val qs = ranked.crossJoin(broadcast(total))
      .agg(max("n").as("n_docs"),
        max(when(col("rk") === kOf(5), col("q"))).as("p05"),
        max(when(col("rk") === kOf(50), col("q"))).as("p50"),
        max(when(col("rk") === kOf(95), col("q"))).as("p95"))
      // r20 (tools/ReProf): 1-row percentile boundary — a fresh
      // construction re-runs the winsorized-mean agg over the base
      // cache, not the two-phase rank windows (recon 0.68 s vs 0.06 warm)
      .persist()
    base.crossJoin(broadcast(qs))
      .groupBy("n_docs", "p05", "p50", "p95")
      .agg(
        round(sum(least(greatest(col("q"), col("p05")), col("p95"))
          .cast(DecimalType(10, 6))).cast("double") /
          count(lit(1)).cast("double"), 6).as("win_mean"),
        sum(when(col("q") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("q") > col("p95"), 1L).otherwise(0L)).as("n_hi"))
      .select(col("n_docs"), col("p05"), col("p50"), col("p95"),
        col("win_mean"), col("n_lo"), col("n_hi"))
  }

  val qualityWinsorSql: String = s"""WITH q AS (
      SELECT doc_id, $qualityColSql AS q FROM documents),
    tot AS (SELECT COUNT(*) AS n FROM q),
    r AS (
      SELECT doc_id, q, row_number() OVER (ORDER BY q, doc_id) AS rk FROM q),
    qs AS (
      SELECT MAX(n) AS n_docs,
        MAX(CASE WHEN rk = (n * 5 + 99) // 100 THEN q END) AS p05,
        MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN q END) AS p50,
        MAX(CASE WHEN rk = (n * 95 + 99) // 100 THEN q END) AS p95
      FROM r CROSS JOIN tot)
    SELECT n_docs, p05, p50, p95,
      ROUND(CAST(SUM(CAST(LEAST(GREATEST(q, p05), p95) AS DECIMAL(10,6))) AS DOUBLE) /
        CAST(COUNT(*) AS DOUBLE), 6) AS win_mean,
      CAST(SUM(CASE WHEN q < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      CAST(SUM(CASE WHEN q > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
    FROM q CROSS JOIN qs
    GROUP BY n_docs, p05, p50, p95"""

  // ----------------------------------------------- T14 source drift (KL)

  /** The union stopword probe set — the bounded vocabulary T14 measures
    * distribution drift over (21 words across the three T3 languages,
    * so a language-mix shift between sources registers directly).
    */
  val AllStop: Seq[String] = (EnStop ++ EsStop ++ DeStop).distinct

  /** T14: per-source distribution drift — KL(source ‖ corpus) over the
    * [[AllStop]] stopword-token distribution, plus the word driving the
    * largest probability gap. The domain-shift monitor of a multi-source
    * pretraining mix (a source whose stopword profile diverges from the
    * pool is a different language/register/boilerplate mix — the cheap
    * projection of embedding-drift detection onto a fixed 21-word
    * vocabulary).
    *
    * Determinism (the transcendental tier): p/q reduces to the integer
    * ratio (c_sw·N)/(ns·c_w); the products widen to double FIRST (the
    * longs would overflow at 100 TB token counts), the division and
    * `ln` happen once per (source, word) on the bounded sources×21
    * relation, the log rounds at 9 immediately, and each term
    * p·ln(p/q) accumulates in exact DECIMAL. Zero-count (source, word)
    * cells contribute exactly 0 by the p→0 limit and never reach the
    * log (they simply don't exist in the occ relation).
    *
    * Scale shape: one corpus scan filtered to the 21-word probe set
    * (the IN predicate pushes into the scan's codegen), pre-aggregated
    * to (source, word) with map-side partials — everything downstream
    * is arithmetic on stat-sized relations; only the provably-1-row
    * total broadcasts explicitly. The top-word window partitions by
    * source over ≤21 rows.
    */
  def sourceDrift(s: SparkSession, dir: String): DataFrame =
    sourceDriftFrom(t(s, dir).select(col("source"), col("text")))

  /** [[sourceDrift]] over an explicit `(source, text)` relation — the
    * spec pins exact KL values on crafted two-source corpora.
    */
  def sourceDriftFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val occ = d
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isInCollection(AllStop))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .persist() // feeds ns, cw, and the term join legs (multi-leg rule)
    val ns = occ.groupBy("source").agg(sum("c").as("n_stop_tokens"))
    val cw = occ.groupBy("tok").agg(sum("c").as("cw"))
    val n = cw.agg(sum("cw").as("n")) // 1 row, provably bounded
    val p = col("c").cast("double") / col("n_stop_tokens").cast("double")
    val q = col("cw").cast("double") / col("n").cast("double")
    val terms = occ.join(ns, "source").join(cw, "tok").crossJoin(broadcast(n))
      .select(col("source"), col("tok"), p.as("p"), q.as("q"),
        (p * round(log((col("c").cast("double") * col("n").cast("double")) /
          (col("n_stop_tokens").cast("double") * col("cw").cast("double"))), 9))
          .as("term"))
      .persist() // feeds the KL sum and the top-word rank
    val kl = terms.groupBy("source")
      .agg(round(sum(col("term").cast(DecimalType(25, 12))).cast("double"), 6)
        .as("kl_drift"))
    val wTop = Window.partitionBy("source")
      .orderBy(abs(col("p") - col("q")).desc, col("tok"))
    val top = terms.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("source"), col("tok").as("top_word"),
        round(col("p"), 6).as("top_p"), round(col("q"), 6).as("top_q"))
    ns.join(kl, "source").join(top, "source")
      .select(col("source"), col("n_stop_tokens"), col("kl_drift"),
        col("top_word"), col("top_p"), col("top_q"))
      // r20 (tools/ReProf): ≤|sources|-row assembly boundary — a fresh
      // construction re-runs the sort only, not the KL/top-word legs
      // over the terms cache (recon 1.62 s vs 0.07 s warm)
      .persist()
      .orderBy("source")
  }

  val sourceDriftSql: String = {
    val inList = AllStop.map(w => s"'$w'").mkString(", ")
    s"""WITH occ AS (
      SELECT source, tok, COUNT(*) AS c
      FROM (SELECT source, unnest($tokensSql) AS tok FROM documents)
      WHERE tok IN ($inList)
      GROUP BY 1, 2),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_stop_tokens FROM occ GROUP BY 1),
    cw AS (SELECT tok, SUM(c) AS cw FROM occ GROUP BY 1),
    tot AS (SELECT SUM(cw) AS n FROM cw),
    terms AS (
      SELECT source, tok,
        CAST(c AS DOUBLE) / CAST(n_stop_tokens AS DOUBLE) AS p,
        CAST(cw AS DOUBLE) / CAST(n AS DOUBLE) AS q,
        (CAST(c AS DOUBLE) / CAST(n_stop_tokens AS DOUBLE)) *
          ROUND(ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) /
            (CAST(n_stop_tokens AS DOUBLE) * CAST(cw AS DOUBLE))), 9) AS term
      FROM occ JOIN ns USING (source) JOIN cw USING (tok) CROSS JOIN tot),
    kl AS (
      SELECT source, ROUND(CAST(SUM(CAST(term AS DECIMAL(25,12))) AS DOUBLE), 6) AS kl_drift
      FROM terms GROUP BY 1),
    top AS (
      SELECT source, tok AS top_word, ROUND(p, 6) AS top_p, ROUND(q, 6) AS top_q
      FROM (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY abs(p - q) DESC, tok) AS rk FROM terms)
      WHERE rk = 1)
    SELECT source, n_stop_tokens, kl_drift, top_word, top_p, top_q
    FROM ns JOIN kl USING (source) JOIN top USING (source)
    ORDER BY source"""
  }

  // ----------------------------------------------- T13 lexical diversity

  /** T13: lexical-diversity signals — type-token ratio, hapax-legomenon
    * fraction, and top-token share per document. TTR and hapax rate are
    * the classic lexical-richness measures (low TTR / low hapax = looped
    * boilerplate; the MTLD family refines them, this is the scan-cheap
    * core); top_share is the within-doc dual of the T6 repetition
    * signal (one token dominating the doc). All three prune degenerate
    * machine-generated text that passes length/stopword gates.
    *
    * Determinism: exact integer counts, one IEEE division per ratio,
    * `round(…, 6)` at the comparison boundary (the CLAUDE.md float
    * contract). Empty documents report 0.0 everywhere explicitly.
    *
    * Scale shape (r13): a pure per-row projection — all four counts
    * fall out of ONE fold over the document's sorted token array (the
    * T6 rule), so the computation is embarrassingly parallel and no
    * token is ever serialized through an exchange. The oracle states
    * the equivalent per-(doc, token)-count form; exact integers agree
    * cell-for-cell.
    */
  def lexicalDiversity(s: SparkSession, dir: String): DataFrame =
    lexicalDiversityFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[lexicalDiversity]] over an explicit `(doc_id, text)` relation —
    * the spec pins exact ratios on crafted repetition ladders.
    */
  def lexicalDiversityFrom(d: DataFrame): DataFrame = {
    // r13 (the T6 rule): every signal is a pure function of one doc's
    // token array — one pass over the SORTED array closes each equal-run
    // (type count, hapax runs, longest run), so no token ever crosses a
    // row and the former corpus-sized (doc_id, tok) exchange disappears.
    // r14: the pass is the native codegen'd `graft_runstats` node
    // (plans/RunStatsExpression.scala) — the previous `aggregate` fold
    // evaluated its lambda INTERPRETED per array element.
    val sorted = array_sort(tokens(col("text")))
    val st = call_function("graft_runstats", sorted)
    d.select(col("doc_id"), size(sorted).cast("long").as("n_tok"), st.as("st"))
      .select(col("doc_id"),
        col("n_tok"),
        col("st.n_types").as("n_types"),
        col("st.n_hapax").as("n_hapax"),
        col("st.max_run").as("max_c"))
      .select(col("doc_id"),
        col("n_tok"),
        col("n_types"),
        col("n_hapax"),
        when(col("n_tok") > 0,
          round(col("n_types").cast("double") / col("n_tok").cast("double"), 6))
          .otherwise(lit(0.0)).as("ttr"),
        when(col("n_types") > 0,
          round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6))
          .otherwise(lit(0.0)).as("hapax_frac"),
        when(col("n_tok") > 0,
          round(col("max_c").cast("double") / col("n_tok").cast("double"), 6))
          .otherwise(lit(0.0)).as("top_share"))
      .orderBy("doc_id")
  }

  val lexicalDiversitySql: String = s"""WITH occ AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
      GROUP BY 1, 2),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        COUNT(*) AS n_types,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        CAST(MAX(c) AS BIGINT) AS max_c
      FROM occ GROUP BY 1)
    SELECT d.doc_id,
      COALESCE(n_tok, 0) AS n_tok,
      COALESCE(n_types, 0) AS n_types,
      COALESCE(n_hapax, 0) AS n_hapax,
      CASE WHEN COALESCE(n_tok, 0) > 0
        THEN ROUND(CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        ELSE 0.0 END AS ttr,
      CASE WHEN COALESCE(n_types, 0) > 0
        THEN ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
        ELSE 0.0 END AS hapax_frac,
      CASE WHEN COALESCE(n_tok, 0) > 0
        THEN ROUND(CAST(max_c AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        ELSE 0.0 END AS top_share
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    ORDER BY d.doc_id"""

  val oovRateSql: String = s"""WITH occ AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
      GROUP BY 1, 2),
    vocab AS (SELECT tok, 1 AS iv FROM occ GROUP BY tok
              HAVING SUM(c) >= $OovMinCount),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        CAST(COALESCE(SUM(CASE WHEN iv IS NOT NULL THEN c END), 0) AS BIGINT) AS n_invocab
      FROM occ LEFT JOIN vocab USING (tok)
      GROUP BY 1)
    SELECT d.doc_id,
      COALESCE(n_tok, 0) AS n_tok,
      COALESCE(n_tok, 0) - COALESCE(n_invocab, 0) AS n_oov,
      CASE WHEN COALESCE(n_tok, 0) > 0
        THEN ROUND(CAST(n_tok - n_invocab AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        ELSE 0.0 END AS oov_frac
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    ORDER BY d.doc_id"""

  /** Gopher rule-filter stopword set (Rae et al. 2021, table A1: a doc
    * must contain ≥ 2 DISTINCT of these 8 words).
    */
  val GopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** T17: the Gopher quality-filter DECISION layer (Rae et al. 2021,
    * table A1) — T2 emits the signals; this emits the per-rule pass
    * flags and the keep bit a curation pipeline actually acts on:
    * word count ∈ [50, 100 000], mean word length ∈ [3, 10],
    * symbol-to-word ratio ≤ 0.1, bullet-start lines ≤ 90 %,
    * ellipsis-end lines ≤ 30 %, ≥ 80 % words with an alphabetic char,
    * ≥ 2 distinct [[GopherStop]] words, and ≤ 30 % duplicate lines
    * (the line-level half of Gopher's repetition table).
    *
    * Parity: every ratio is exact integer counts through ONE IEEE
    * division then `round(…, 6)`; flags compare the ROUNDED value, so
    * the 6-dp boundary is the single comparison point in both engines
    * (the [[qualityCol]] convention). Zero-token/zero-length docs are
    * guarded to ratio 0 before any division (NaN never reaches a
    * comparison — CLAUDE.md's cross-engine NaN rule). One scan, pure
    * codegen projection, no shuffle (`ORDER BY` aside).
    */
  def gopherFilter(s: SparkSession, dir: String): DataFrame =
    gopherFilterFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[gopherFilter]] over an explicit `(doc_id, text)` relation — the
    * spec pins each rule's boundary on crafted docs.
    */
  def gopherFilterFrom(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nw = size(toks)
    val nwD = nw.cast("double")
    val sumWordLen = length(concat_ws("", toks))
    val nHash = length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
    val nUEll = length(col("text")) - length(replace(col("text"), lit("…"), lit("")))
    val nDotEll = ((length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))) / lit(3)).cast("long")
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, x =>
      Seq("-", "*", "•").map(b => ltrim(x).startsWith(b)).reduce(_ || _)))
    val ellLines = size(filter(lines, x =>
      rtrim(x).endsWith("...") || rtrim(x).endsWith("…")))
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]")))
    val stopDistinct = size(array_intersect(toks, array(GopherStop.map(lit): _*)))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6)).otherwise(lit(0.0))
    val sig = d.select(
      col("doc_id"),
      nw.as("n_words"),
      ratio(sumWordLen, nw).as("mean_word_len"),
      ratio((nHash + nUEll + nDotEll), nw).as("symbol_word_ratio"),
      ratio(bulletLines, nLines).as("bullet_line_frac"),
      ratio(ellLines, nLines).as("ellipsis_line_frac"),
      ratio(alphaWords, nw).as("alpha_word_frac"),
      stopDistinct.as("n_stop_distinct"),
      ratio(nLines - size(array_distinct(lines)), nLines).as("dup_line_frac"))
    val flags = Seq(
      (col("n_words") >= 50 && col("n_words") <= 100000).as("f_words"),
      (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("f_word_len"),
      (col("symbol_word_ratio") <= 0.1).as("f_symbol"),
      (col("bullet_line_frac") <= 0.9).as("f_bullet"),
      (col("ellipsis_line_frac") <= 0.3).as("f_ellipsis"),
      (col("alpha_word_frac") >= 0.8).as("f_alpha"),
      (col("n_stop_distinct") >= 2).as("f_stop"),
      (col("dup_line_frac") <= 0.3).as("f_dup_line"))
    sig.select(
      (col("doc_id") +: sig.columns.tail.toIndexedSeq.map(col) :+
        flags.map(_.cast("int")).reduce(_ + _).as("n_pass")): _*)
      .withColumn("keep", (col("n_pass") === flags.size).cast("int"))
      .orderBy("doc_id")
  }

  val gopherFilterSql: String = {
    val nSym = "(length(text) - length(replace(text, '#', ''))) + " +
      "(length(text) - length(replace(text, chr(8230), ''))) + " +
      "(length(text) - length(replace(text, '...', ''))) // 3"
    val lines = "string_split(text, chr(10))"
    val bullet = s"len(list_filter($lines, x -> starts_with(ltrim(x), '-') " +
      "OR starts_with(ltrim(x), '*') OR starts_with(ltrim(x), chr(8226))))"
    val ell = s"len(list_filter($lines, x -> ends_with(rtrim(x), '...') " +
      "OR ends_with(rtrim(x), chr(8230))))"
    val alpha = s"len(list_filter($tokensSql, x -> regexp_matches(x, '[A-Za-z]')))"
    val stopLit = GopherStop.map(w => s"'$w'").mkString(", ")
    def ratio(num: String, den: String): String =
      s"CASE WHEN $den > 0 THEN ROUND(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) ELSE 0.0 END"
    s"""WITH sig AS (
      SELECT doc_id,
        len($tokensSql) AS n_words,
        ${ratio(s"length(array_to_string($tokensSql, ''))", s"len($tokensSql)")} AS mean_word_len,
        ${ratio(nSym, s"len($tokensSql)")} AS symbol_word_ratio,
        ${ratio(bullet, s"len($lines)")} AS bullet_line_frac,
        ${ratio(ell, s"len($lines)")} AS ellipsis_line_frac,
        ${ratio(alpha, s"len($tokensSql)")} AS alpha_word_frac,
        len(list_intersect($tokensSql, [$stopLit])) AS n_stop_distinct,
        ${ratio(s"len($lines) - len(list_distinct($lines))", s"len($lines)")} AS dup_line_frac
      FROM documents),
    flagged AS (
      SELECT *,
        CAST(n_words >= 50 AND n_words <= 100000 AS INT)
        + CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT)
        + CAST(symbol_word_ratio <= 0.1 AS INT)
        + CAST(bullet_line_frac <= 0.9 AS INT)
        + CAST(ellipsis_line_frac <= 0.3 AS INT)
        + CAST(alpha_word_frac >= 0.8 AS INT)
        + CAST(n_stop_distinct >= 2 AS INT)
        + CAST(dup_line_frac <= 0.3 AS INT) AS n_pass
      FROM sig)
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
      bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
      CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct, dup_line_frac,
      n_pass, CAST(n_pass = 8 AS INT) AS keep
    FROM flagged ORDER BY doc_id"""
  }

  /** T18: C4-style line-level cleaning stats (Raffel et al. 2020 §2.2)
    * — a line survives iff it ends in terminal punctuation (. ! ? ")
    * after right-trim, holds ≥ 5 words, and does not mention
    * "javascript" (case-folded); the document survives iff ≥ 3 lines
    * survive and it contains neither '{' nor "lorem ipsum". Emits the
    * per-doc audit a cleaning pipeline logs: line counts, surviving
    * character fraction, and each page-level flag.
    *
    * Parity/scale: all line logic runs INSIDE the per-row line array
    * (filter/transform/aggregate — no explode, no shuffle); the kept
    * character fraction is exact integer character counts through one
    * rounded IEEE division.
    */
  def c4LineFilter(s: SparkSession, dir: String): DataFrame =
    c4LineFilterFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[c4LineFilter]] over an explicit `(doc_id, text)` relation — the
    * spec pins each line rule and page flag on crafted docs.
    */
  def c4LineFilterFrom(d: DataFrame): DataFrame = {
    def lineWords(x: Column): Column =
      size(filter(split(x, " "), w => w =!= lit("")))
    def lineKeep(x: Column): Column = {
      val rt = rtrim(x)
      (Seq(".", "!", "?", "\"").map(p => rt.endsWith(p)).reduce(_ || _)) &&
        lineWords(x) >= 5 && !contains(lower(x), lit("javascript"))
    }
    val lines = split(col("text"), "\n")
    val kept = filter(lines, lineKeep(_))
    val nLines = size(lines)
    val nKept = size(kept)
    val keptChars = aggregate(kept, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val lineChars = (length(col("text")) - (nLines - 1)).cast("long")
    val hasBrace = contains(col("text"), lit("{"))
    val hasLorem = contains(lower(col("text")), lit("lorem ipsum"))
    d.select(
      col("doc_id"),
      nLines.as("n_lines"),
      nKept.as("n_kept_lines"),
      when(lineChars > 0,
        round(keptChars.cast("double") / lineChars.cast("double"), 6))
        .otherwise(lit(0.0)).as("kept_char_frac"),
      hasBrace.cast("int").as("has_brace"),
      hasLorem.cast("int").as("has_lorem"),
      (nKept >= 3 && !hasBrace && !hasLorem).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  val c4LineFilterSql: String = {
    val lines = "string_split(text, chr(10))"
    val lineKeep = "x -> (ends_with(rtrim(x), '.') OR ends_with(rtrim(x), '!') " +
      "OR ends_with(rtrim(x), '?') OR ends_with(rtrim(x), '\"')) " +
      "AND len(list_filter(string_split(x, ' '), w -> w != '')) >= 5 " +
      "AND NOT contains(lower(x), 'javascript')"
    val kept = s"list_filter($lines, $lineKeep)"
    s"""WITH sig AS (
      SELECT doc_id,
        len($lines) AS n_lines,
        len($kept) AS n_kept_lines,
        CAST(COALESCE(list_sum(list_transform($kept, x -> length(x))), 0) AS BIGINT) AS kept_chars,
        CAST(length(text) - (len($lines) - 1) AS BIGINT) AS line_chars,
        CAST(contains(text, '{') AS INT) AS has_brace,
        CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem
      FROM documents)
    SELECT doc_id, n_lines, n_kept_lines,
      CASE WHEN line_chars > 0
        THEN ROUND(CAST(kept_chars AS DOUBLE) / CAST(line_chars AS DOUBLE), 6)
        ELSE 0.0 END AS kept_char_frac,
      has_brace, has_lorem,
      CAST(n_kept_lines >= 3 AND has_brace = 0 AND has_lorem = 0 AS INT) AS keep
    FROM sig ORDER BY doc_id"""
  }

  /** T19 value-range bucket count for the per-language two-phase rank
    * (mean surprisal lives in [0, ~ln N] nats; ⌊s·8⌋ clamped to 128
    * buckets keeps the offset relation ≤ langs×128 rows).
    */
  val CcnetBuckets = 128

  /** T19: CCNet-style perplexity terciles (Wenzek et al. 2020) — per
    * language, rank documents by the T10 perplexity proxy (mean unigram
    * surprisal) and cut the EXACT per-language rank into head / middle
    * / tail thirds: CCNet's quality stratification, where "head" (the
    * lowest-perplexity third) feeds training first and "tail" is the
    * candidate discard. Composes [[surprisalFrom]] unchanged, so the
    * score is definitionally T10's.
    *
    * Scale shape: the W4 two-phase VALUE-range rank, partitioned by
    * language — bucket = ⌊surprisal·8⌋ clamped to [[CcnetBuckets]],
    * ranks inside bounded (lang, bucket) partitions, global per-lang
    * rank = the ≤ langs×128-row exclusive bucket-offset window + the
    * within-bucket rank. No language ever sorts in one partition. The
    * oracle states the naive per-language window; both agree
    * row-for-row (ties break on doc_id; the score is already rounded
    * at its 6-dp comparison boundary).
    */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir)
    ccnetBucketsFrom(
      surprisalFrom(d.select(col("doc_id"), col("text")))
        .join(d.select(col("doc_id"), col("lang")), "doc_id"))
  }

  /** [[ccnetBuckets]] over an explicit `(doc_id, lang, mean_surprisal)`
    * relation — the spec pins tercile boundaries on crafted ladders.
    */
  def ccnetBucketsFrom(sc: DataFrame): DataFrame = {
    val base = sc.select(col("doc_id"), col("lang"), col("mean_surprisal"))
      .withColumn("bucket",
        least(greatest(floor(col("mean_surprisal") * 8), lit(0L)),
          lit(CcnetBuckets - 1L)).cast("long"))
      .persist() // feeds the offset, per-lang-count, and ranked legs
    val wOff = Window.partitionBy("lang").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = base.groupBy("lang", "bucket").agg(count(lit(1)).as("c"))
      .select(col("lang"), col("bucket"),
        coalesce(sum("c").over(wOff), lit(0L)).as("off"))
    val nLang = base.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val wRk = Window.partitionBy("lang", "bucket")
      .orderBy(col("mean_surprisal"), col("doc_id"))
    base.withColumn("r", row_number().over(wRk))
      .join(off, Seq("lang", "bucket"))
      .join(broadcast(nLang), "lang") // ≤ |langs| rows, provably bounded
      .select(col("doc_id"), col("lang"), col("mean_surprisal"),
        (col("off") + col("r")).as("lang_rank"), col("n_lang"),
        // exact integer tercile (the W4 `div` rule: survives 2^53)
        expr("1L + ((off + r - 1) * 3) div n_lang").as("tercile"))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .drop("tercile")
      // r21 (verdict r20 item 1): the r20 doc-grain persist on the final
      // rank assembly is REMOVED — single consumer (the output orderBy),
      // i.e. bench-iteration-only reuse at a doc-grain materialization
      // cost in a one-shot run (guide §5). The `base` persist above
      // stays: it feeds the offset, per-lang-count, and ranked legs.
      .orderBy("doc_id")
  }

  val ccnetBucketsSql: String = s"""WITH $surprisalCtes,
    sc AS (
      SELECT d.doc_id, d.lang,
        CASE WHEN n_tok > 0
          THEN ROUND(CAST(tot AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
          ELSE 0.0 END AS mean_surprisal
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id),
    nl AS (SELECT lang, COUNT(*) AS n_lang FROM sc GROUP BY 1),
    r AS (
      SELECT doc_id, lang, mean_surprisal,
        row_number() OVER (PARTITION BY lang ORDER BY mean_surprisal, doc_id) AS rk
      FROM sc)
    SELECT doc_id, lang, mean_surprisal,
      CAST(rk AS BIGINT) AS lang_rank, n_lang,
      CASE CAST(1 + (rk - 1) * 3 // n_lang AS BIGINT)
        WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM r JOIN nl USING (lang) ORDER BY doc_id"""
  // -------------------------------------------------------- T20 encoding

  /** Mojibake / control / replacement-character patterns for the T20
    * encoding scan — shared verbatim between the Spark and DuckDB sides
    * (the Java-regex ∩ RE2 subset: `\xhh` escapes and codepoint
    * classes mean the same thing in both engines, exactly the W3 PII
    * contract).
    */
  val ReplRe = "�"
  val CtrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  val MojiRe = "Ã[\\x80-\\xBF]|â€|Â[\\xA0-\\xBF]"
  val NonAsciiRe = "[^\\x00-\\x7F]"

  /** T20: encoding-quality scan — per language, how much of the corpus
    * shows the classic ingest defects: U+FFFD replacement characters
    * (decoder gave up), raw C0 control characters (binary bleed),
    * UTF-8-read-as-Latin-1 mojibake digraphs (Ã/â€/Â sequences), and
    * the byte-per-char inflation of non-ASCII text. The standard
    * pre-tokenizer QA gate in web-corpus pipelines (the C4/CCNet
    * cleaning stage drops exactly these rows).
    *
    * Determinism: every signal is an exact integer `regexp_count` over
    * a shared Java∩RE2 pattern; the two ratio columns are single IEEE
    * divisions of exact integer sums rounded at the boundary.
    *
    * Scale shape: one codegen'd projection over one corpus scan, then
    * a per-lang aggregate with map-side partials — no joins, no
    * windows, nothing grows past the language-count output.
    */
  def encodingScan(s: SparkSession, dir: String): DataFrame =
    encodingScanFrom(t(s, dir))

  /** [[encodingScan]] over an explicit `(doc_id, text, lang)` relation —
    * the driver corpus is clean ASCII, so the spec pins nonzero signal
    * values on crafted mojibake through this.
    */
  def encodingScanFrom(d: DataFrame): DataFrame = {
    val per = d.select(
      col("lang"),
      regexp_count(col("text"), lit(ReplRe)).cast("long").as("n_repl"),
      regexp_count(col("text"), lit(CtrlRe)).cast("long").as("n_ctrl"),
      regexp_count(col("text"), lit(MojiRe)).cast("long").as("n_moji"),
      regexp_count(col("text"), lit(NonAsciiRe)).cast("long").as("n_nonascii"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      length(col("text")).cast("long").as("n_chars"))
    per.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_repl") > 0, 1L).otherwise(0L)).as("docs_with_repl"),
        sum(when(col("n_ctrl") > 0, 1L).otherwise(0L)).as("docs_with_ctrl"),
        sum(when(col("n_moji") > 0, 1L).otherwise(0L)).as("docs_with_moji"),
        sum(col("n_repl")).as("total_repl"),
        sum(col("n_ctrl")).as("total_ctrl"),
        sum(col("n_moji")).as("total_moji"),
        sum(col("n_nonascii")).as("total_nonascii"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("lang"), col("n_docs"),
        col("docs_with_repl"), col("docs_with_ctrl"), col("docs_with_moji"),
        col("total_repl"), col("total_ctrl"), col("total_moji"), col("total_nonascii"),
        round((col("n_docs") - greatest(col("docs_with_repl"),
          col("docs_with_ctrl"), col("docs_with_moji"))).cast("double") /
          col("n_docs"), 6).as("clean_lb"),
        when(col("total_chars") > 0,
          round(col("total_bytes").cast("double") / col("total_chars"), 6))
          .otherwise(lit(1.0)).as("bytes_per_char"))
      .orderBy("lang")
  }

  // DuckDB standard SQL strings pass backslashes through untouched, so
  // the Java-side pattern string IS the RE2 pattern — only quotes escape.
  private def reCount(c: String, re: String): String =
    s"CAST(len(regexp_extract_all($c, '${re.replace("'", "''")}')) AS BIGINT)"

  val encodingScanSql: String = s"""WITH per AS (
      SELECT lang,
        ${reCount("text", ReplRe)} AS n_repl,
        ${reCount("text", CtrlRe)} AS n_ctrl,
        ${reCount("text", MojiRe)} AS n_moji,
        ${reCount("text", NonAsciiRe)} AS n_nonascii,
        CAST(strlen(text) AS BIGINT) AS n_bytes,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM documents),
    agg AS (
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_repl,
        CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ctrl,
        CAST(SUM(CASE WHEN n_moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_moji,
        CAST(SUM(n_repl) AS BIGINT) AS total_repl,
        CAST(SUM(n_ctrl) AS BIGINT) AS total_ctrl,
        CAST(SUM(n_moji) AS BIGINT) AS total_moji,
        CAST(SUM(n_nonascii) AS BIGINT) AS total_nonascii,
        CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM per GROUP BY 1)
    SELECT lang, n_docs, docs_with_repl, docs_with_ctrl, docs_with_moji,
      total_repl, total_ctrl, total_moji, total_nonascii,
      ROUND(CAST(n_docs - GREATEST(docs_with_repl, docs_with_ctrl,
        docs_with_moji) AS DOUBLE) / n_docs, 6) AS clean_lb,
      CASE WHEN total_chars > 0
        THEN ROUND(CAST(total_bytes AS DOUBLE) / total_chars, 6)
        ELSE 1.0 END AS bytes_per_char
    FROM agg ORDER BY lang"""

  // ----------------------------------------------------- T21 readability

  /** T21: Flesch reading-ease distribution — the classic readability
    * screen (Flesch 1948; its band thresholds are the ones every style
    * checker ships): score = 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with sentences counted as terminal-punct
    * runs and syllables as vowel-group runs (the standard regex
    * heuristic when no pronunciation lexicon is available). Each doc is
    * banded very_easy/…/very_hard and the report gives, per (source,
    * band), the doc count and mean score — the quality-mix view a
    * curriculum (W4) slices on.
    *
    * Determinism: words/sentences/syllables are exact integer regex
    * counts; the score is two IEEE divisions and three constant
    * mult/subs in the identical left-assoc shape both engines parse
    * (constants CAST AS DOUBLE in the oracle so DuckDB's decimal
    * literals can't change the arithmetic); round(…,4) per doc BEFORE
    * banding/summing, then DECIMAL(20,4) accumulation and one division
    * rounded at the boundary.
    *
    * Scale shape: one codegen'd projection pass over the corpus, one
    * grouped aggregate with map-side partials on a ≤|sources|·5 key
    * space; nothing else.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    readabilityFrom(t(s, dir))

  /** [[readability]] over an explicit `(doc_id, text, source)` relation. */
  def readabilityFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = size(tokens(col("text"))).cast("double")
    val sen = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("double")
    // ASCII-only lowercase (r11 ADVICE): JVM and DuckDB lower() may
    // disagree on Unicode case mapping (length-changing codepoints like
    // U+0130 can alter [aeiouy]+ run counts); translate over A-Z is
    // engine-identical and sufficient — the vowel class is ASCII anyway.
    val syl = greatest(regexp_count(
      translate(col("text"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"),
      lit("[aeiouy]+")), lit(1)).cast("double")
    val score = lit(206.835) - lit(1.015) * (w / sen) - lit(84.6) * (syl / w)
    val per = d.filter(size(tokens(col("text"))) > 0)
      .select(col("source"), round(score, 4).as("score"))
      .withColumn("band",
        when(col("score") >= 90, "very_easy")
          .when(col("score") >= 70, "easy")
          .when(col("score") >= 50, "medium")
          .when(col("score") >= 30, "hard")
          .otherwise("very_hard"))
    per.groupBy("source", "band").agg(
        count(lit(1)).as("n_docs"),
        sum(col("score").cast(DecimalType(20, 4))).as("tot"))
      .select(col("source"), col("band"), col("n_docs"),
        round(col("tot").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_score"))
      .orderBy("source", "band")
  }

  val readabilitySql: String = {
    val w = s"CAST(len($tokensSql) AS DOUBLE)"
    val sen = "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)"
    val syl = "CAST(greatest(len(regexp_extract_all(" +
      "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')" +
      ", '[aeiouy]+')), 1) AS DOUBLE)"
    val score = s"CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE)*($w / $sen) " +
      s"- CAST(84.6 AS DOUBLE)*($syl / $w)"
    s"""WITH per AS (
      SELECT source, ROUND($score, 4) AS score
      FROM documents WHERE len($tokensSql) > 0),
    banded AS (
      SELECT source, score,
        CASE WHEN score >= 90 THEN 'very_easy'
             WHEN score >= 70 THEN 'easy'
             WHEN score >= 50 THEN 'medium'
             WHEN score >= 30 THEN 'hard'
             ELSE 'very_hard' END AS band
      FROM per)
    SELECT source, band, COUNT(*) AS n_docs,
      ROUND(CAST(SUM(CAST(score AS DECIMAL(20,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score
    FROM banded GROUP BY source, band ORDER BY source, band"""
  }

  // ------------------------------------------- T25 PMI collocations

  /** Minimum pair count for a collocation candidate — the standard
    * guard against PMI's low-frequency bias (a pair seen once always
    * scores high).
    */
  val PmiMinCount = 5
  /** Collocations kept. */
  val PmiTopK = 50

  /** T25: top-[[PmiTopK]] bigram collocations by pointwise mutual
    * information — PMI(x,y) = ln(p(xy)/(p(x)p(y))) over corpus unigram/
    * bigram frequencies, the classic collocation statistic (Church &
    * Hanks 1990). A data pipeline uses exactly this table to find
    * multi-word expressions worth protecting from tokenization splits
    * and boilerplate phrases worth filtering. Emits the integer count
    * evidence (pair, both unigrams) next to the score.
    *
    * Determinism: counts are exact integers; the PMI is the identical
    * left-assoc libm chain in both engines (ln(cg) − ln(B) − ln(c1) −
    * ln(c2) + 2·ln(U)) rounded at 9 immediately (T10/T11 pattern — the
    * chain runs once per candidate on the vocab-sized relation);
    * ordering tie-breaks on the bigram string.
    *
    * Scale shape: two explode+groupBy scans pre-aggregate to vocab
    * grain (both persisted — each feeds its total AND join legs); the
    * candidate relation joins vocab-sized tables on token keys (the
    * [[PmiMinCount]] filter prunes the long tail first); totals are
    * 1-row broadcasts; the top-k is TakeOrdered then a ≤[[PmiTopK]]-row
    * rank window — never a corpus- or vocab-sized single partition.
    */
  def collocations(s: SparkSession, dir: String): DataFrame =
    collocationsFrom(t(s, dir))

  /** [[collocations]] over an explicit `(text)` relation. */
  def collocationsFrom(d: DataFrame): DataFrame = {
    val uni = d.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .persist() // feeds the U total and both unigram join sides
    val bi = d.select(explode(ngrams(tokens(col("text")), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cg"))
      .persist() // feeds the B total and the candidate leg
    val totals = uni.agg(sum("cw").as("u")).crossJoin(bi.agg(sum("cg").as("b")))
    val cand = bi.filter(col("cg") >= PmiMinCount)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2"), "w2")
      .crossJoin(broadcast(totals))
      .select(col("g"), col("cg"), col("c1"), col("c2"),
        round(log(col("cg").cast("double")) - log(col("b").cast("double")) -
          log(col("c1").cast("double")) - log(col("c2").cast("double")) +
          lit(2.0) * log(col("u").cast("double")), 9).as("pmi"))
    cand.orderBy(col("pmi").desc, col("g")).limit(PmiTopK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("pmi").desc, col("g"))))
      .select(col("rk"), col("g").as("bigram"), col("cg").as("n_pair"),
        col("c1").as("n_w1"), col("c2").as("n_w2"), col("pmi"))
      .orderBy("rk")
  }

  val collocationsSql: String = s"""WITH toks AS (
      SELECT unnest($tokensSql) AS w FROM documents),
    uni AS (SELECT w, COUNT(*) AS cw FROM toks GROUP BY 1),
    big AS (SELECT g, COUNT(*) AS cg
      FROM (SELECT unnest(${ngramsSql("tk", 2)}) AS g
            FROM (SELECT $tokensSql AS tk FROM documents))
      GROUP BY 1),
    tot AS (SELECT
      (SELECT CAST(SUM(cw) AS BIGINT) FROM uni) AS u,
      (SELECT CAST(SUM(cg) AS BIGINT) FROM big) AS b),
    cand AS (
      SELECT g, cg, c1.cw AS c1, c2.cw AS c2,
        ROUND(ln(CAST(cg AS DOUBLE)) - ln(CAST(b AS DOUBLE)) -
          ln(CAST(c1.cw AS DOUBLE)) - ln(CAST(c2.cw AS DOUBLE)) +
          2.0 * ln(CAST(u AS DOUBLE)), 9) AS pmi
      FROM big
      JOIN uni c1 ON split_part(g, ' ', 1) = c1.w
      JOIN uni c2 ON split_part(g, ' ', 2) = c2.w
      CROSS JOIN tot
      WHERE cg >= $PmiMinCount)
    SELECT rk, g AS bigram, cg AS n_pair, c1 AS n_w1, c2 AS n_w2, pmi FROM (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, g) AS rk FROM cand)
    WHERE rk <= $PmiTopK ORDER BY rk"""

  // ------------------------------------------- T24 tokenizer fertility

  /** T24: tokenizer fertility per language — BPE symbols emitted per
    * word, rolled up by declared language, plus the fraction of words
    * that survive as a single symbol. THE published tokenizer-parity
    * metric (XLM-R/NLLB report exactly this table): a language whose
    * fertility runs high pays proportionally more sequence length per
    * word, which skews both token budgets (W2/W5) and per-language
    * compute. Built on the SAME [[bpeWordTokens]] merge chain as T16,
    * so "token" cannot drift between the per-doc and per-language
    * views.
    *
    * Determinism: all counts are exact integers from the static replace
    * chain; the two ratios are single exact-integer divisions rounded
    * at the boundary.
    *
    * Scale shape: one explode over words, the codegen'd replace-chain
    * projection, one map-side-combinable aggregate onto a ≤|langs| key
    * space — no window, no join.
    */
  def fertility(s: SparkSession, dir: String): DataFrame =
    fertilityFrom(t(s, dir))

  /** [[fertility]] over an explicit `(lang, text)` relation. */
  def fertilityFrom(d: DataFrame): DataFrame = {
    // T16's r13 vocab-grain restructuring: the merge chain runs once
    // per distinct (lang, word is lang-free) word, occurrence counts
    // join back — ntok is a pure function of the word
    val wc = d
      .select(col("lang"), explode(tokens(col("text"))).as("w0"))
      .select(col("lang"), lower(col("w0")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val vocabCost = wc.select(col("w")).distinct()
      .select(col("w"),
        when(col("w").rlike("^[a-z]+$"), bpeWordTokens(col("w")).cast("long"))
          .otherwise(lit(1L)).as("ntok"))
    wc.join(vocabCost, "w")
      .groupBy("lang")
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("ntok")).as("n_bpe"),
        sum(when(col("ntok") === 1L, col("c")).otherwise(0L)).as("n_single"))
      .select(col("lang"), col("n_words"), col("n_bpe"),
        round(col("n_bpe").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_single").cast("double") / col("n_words").cast("double"), 6)
          .as("single_frac"))
      .orderBy("lang")
  }

  val fertilitySql: String = {
    // the T16 merge chain, stated inline over the lowercased word
    val init = "concat('|', regexp_replace(lower(w), '(.)', '\\1|', 'g'))"
    val merged = BpeMerges.foldLeft(init) { case (acc, (l, r)) =>
      (1 to BpePasses).foldLeft(acc)((a, _) => s"replace($a, '|$l|$r|', '|$l$r|')")
    }
    s"""WITH words AS (
      SELECT lang,
        CASE WHEN regexp_matches(lower(w), '^[a-z]+$$')
          THEN len($merged) - len(replace($merged, '|', '')) - 1
          ELSE 1 END AS ntok
      FROM (SELECT lang, unnest($tokensSql) AS w FROM documents)),
    g AS (
      SELECT lang, COUNT(*) AS n_words,
        CAST(SUM(ntok) AS BIGINT) AS n_bpe,
        CAST(SUM(CASE WHEN ntok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single
      FROM words GROUP BY 1)
    SELECT lang, n_words, n_bpe,
      ROUND(CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS fertility,
      ROUND(CAST(n_single AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS single_frac
    FROM g ORDER BY lang"""
  }

  // ------------------------------------------------- T23 BM25 retrieval

  /** BM25 parameters — the standard Robertson/Lucene defaults. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  /** Query terms: the top-N document-frequency tokens (a data-derived,
    * provably bounded query workload — no external query table exists).
    */
  val Bm25Queries = 10
  /** Results kept per query term. */
  val Bm25TopK = 10
  /** Hash-bucket count for the two-phase per-term top-k rank. */
  val Bm25Buckets = 64

  /** T23: BM25 retrieval top-k — for each of the [[Bm25Queries]]
    * highest-df corpus tokens (the bounded, data-derived query
    * workload), the [[Bm25TopK]] best documents under BM25
    * (Robertson et al.; the Lucene `(k1+1)`-numerator variant with
    * idf = ln((N−df+0.5)/(df+0.5)+1), k1 = [[Bm25K1]], b = [[Bm25B]]).
    * The one standard text-retrieval operator the tier lacked: every
    * data pipeline ranks candidate documents against probe queries
    * (RefinedWeb §3 uses tf-idf-family signals for quality scoring; the
    * reference has no text tier at all — pure extension). Emits the
    * integer tf/dl evidence next to the score so the hash gate pins the
    * arithmetic, not just the ordering.
    *
    * Determinism: ZERO transcendentals reach the emitted cells — every
    * output column is exact integer arithmetic (r13 verdict: ANY fixed
    * decimal grid on `ln` is per-value luck; at sf0.001 the former
    * `idf_e9 = round(ln(·)·1e9)` sat 2.9e-2 from a rounding
    * half-boundary, flippable by a ~1.4e-10 relative libm deviation).
    * The BM25 idf argument is exactly rational —
    * `(N−df+0.5)/(df+0.5)+1 = (2N+2)/(2df+1)` — so the query emits the
    * rational evidence `idf_num = 2·N+2`, `idf_den = 2·df+1` (exact
    * BIGINTs) instead of a rounded log. Within a term, idf is a
    * constant positive factor, so the BM25 ranking equals the ranking
    * by the ln-free tf/dl factor alone: with k1 = 1.2, b = 0.75 the
    * factor `(tf·2.2)/(tf + 0.3 + 0.9·dl·N/T)` multiplied through by
    * `10·T` has EXACT integer numerator `22·tf·T` and denominator
    * `10·tf·T + 3·T + 9·dl·N`, and the emitted rank key
    * `tfdl_e9 = (22·tf·T·1e9) div (10·tf·T + 3·T + 9·dl·N)` is one
    * integer floor-division (DECIMAL(38,0) / HUGEINT — no overflow
    * below 1e13 corpus tokens), bit-identical across engines by
    * construction. A consumer wanting the real-valued BM25 score
    * multiplies `tfdl_e9 · ln(idf_num/idf_den) / 1e9` downstream.
    * Ranks tie-break (tfdl_e9 desc, doc_id). The 1e9 floor can
    * equalize distinct tf/dl rationals whose true scores differ below
    * ~1e-9 relative — such pairs then order by doc_id, not by score
    * (the same resolution limit the previous `score_e9` floor had);
    * both engines apply the identical floor, so the emitted order is
    * deterministic and gate-identical either way.
    *
    * r15 root cause of the r12–r14 driver hash failures: the oracle's
    * `dl` column was a bare `SUM(tf)` — HUGEINT in DuckDB, the ONLY
    * HUGEINT-emitting oracle in the whole registry (DESCRIBE audit,
    * `tools/oracle_types.py`). DuckDB converts HUGEINT to float64 on
    * the pandas/arrow fetch path (arrow has no int128), so a
    * dtype/str-sensitive comparer sees `61.0` vs Spark's int64 `61`
    * and fails every row while rows+schema match — reproduced locally
    * against the r14 output. The emitted `dl` is now
    * `CAST(... AS BIGINT)`; every emitted oracle integer must be
    * BIGINT-typed (machine-gated by `tools/oracle_types.py`).
    *
    * Scale shape: postings build is one explode+groupBy scan (persisted
    * — feeds the df spine, the doc-length relation, and the candidate
    * join); the ≤[[Bm25Queries]]-row term spine broadcasts into the
    * postings join, so candidate generation is an index lookup per
    * term, never all-pairs; the corpus-stat (N, avgdl) relation is one
    * row. The top-k is the W1/T15 two-phase rank: row_number inside
    * (term, hash-bucket) partitions (≤ df/[[Bm25Buckets]] rows each,
    * and Spark's InferWindowGroupLimit prunes to top-k per bucket
    * before the full sort), then the final (term) window over the
    * ≤[[Bm25Buckets]]·[[Bm25TopK]] survivors — a hot stopword term
    * never funnels the corpus through one partition. The oracle states
    * the naive single-window form; identical tie-break total order
    * makes the two agree row-for-row.
    */
  def bm25Topk(s: SparkSession, dir: String): DataFrame =
    bm25TopkFrom(t(s, dir))

  /** [[bm25Topk]] over an explicit `(doc_id, text)` relation — the spec
    * pins the score arithmetic on a hand-computable micro-corpus.
    */
  def bm25TopkFrom(d: DataFrame): DataFrame = {
    val postings = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist() // feeds df spine + doc lengths + candidate join
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N counts ALL documents (empty ones included); T = total tokens.
    val stats = d.agg(count(lit(1)).as("n_docs"))
      .crossJoin(postings.agg(sum("tf").as("tot_tokens")))
    val qidf = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(Bm25Queries)
      .crossJoin(broadcast(stats))
      .select(col("term"), col("df"), col("n_docs"), col("tot_tokens"),
        (col("n_docs") * lit(2L) + lit(2L)).as("idf_num"),
        (col("df") * lit(2L) + lit(1L)).as("idf_den"))
    val cand = postings
      .join(broadcast(qidf), "term")
      .join(dl, "doc_id")
    // Ln-free exact rank key (see Scaladoc): tfdl_e9 =
    //   (22·tf·T·1e9) div (10·tf·T + 3·T + 9·dl·N)
    // in DECIMAL(38,0) — the constants encode k1=1.2, b=0.75 times 10.
    val scored = cand
      .withColumn("tfD", col("tf").cast("decimal(38,0)"))
      .withColumn("tD", col("tot_tokens").cast("decimal(38,0)"))
      .withColumn("dlD", col("dl").cast("decimal(38,0)"))
      .withColumn("nD", col("n_docs").cast("decimal(38,0)"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("idf_num"), col("idf_den"),
        expr("cast((22 * tfD * tD * cast(1000000000 as decimal(38,0))) div " +
          "(10 * tfD * tD + 3 * tD + 9 * dlD * nD) as bigint)").as("tfdl_e9"))
    val local = scored
      .withColumn("bkt", pmod(xxhash64(col("doc_id")), lit(Bm25Buckets.toLong)))
      .withColumn("lrk", row_number().over(
        Window.partitionBy("term", "bkt").orderBy(col("tfdl_e9").desc, col("doc_id"))))
      .filter(col("lrk") <= Bm25TopK)
      // r20 (tools/ReProf, the m6 pattern): bounded per-bucket-survivor
      // boundary (≤ Bm25Queries·Bm25Buckets·Bm25TopK rows) — a fresh
      // construction re-runs the final term window + sort only, not the
      // candidate join/scoring/bucket window downstream of the postings
      // persist (recon 1.17 s vs 0.04 s warm)
      .persist()
    local
      .withColumn("rk", row_number().over(
        Window.partitionBy("term").orderBy(col("tfdl_e9").desc, col("doc_id"))))
      .filter(col("rk") <= Bm25TopK)
      .select(col("term"), col("rk"), col("doc_id"), col("tf"), col("dl"),
        col("idf_num"), col("idf_den"), col("tfdl_e9"))
      .orderBy("term", "rk")
  }

  /** T23a: the BM25 spine probe — the df spine + corpus stats layer of
    * [[bm25Topk]] alone ([[Bm25Queries]] rows of term, df, n_docs,
    * tot_tokens, every cell BIGINT-cast). Diagnostic insurance for the
    * driver gate (r15): t23 failed r12–r14 on a fetch-path dtype the
    * local mirror could not see; should t23 ever hash-fail again, this
    * probe splits the candidate layers in one driver run — probe red =
    * tokenization/df/stats diverge; probe green + t23 red = the
    * candidate join, division, or ranking layer.
    */
  def bm25SpineProbe(s: SparkSession, dir: String): DataFrame = {
    val postings = t(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist() // df spine + both stat legs
    val stats = postings.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs_postings"))
      .crossJoin(postings.agg(sum("tf").cast("long").as("tot_tokens")))
    postings.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(Bm25Queries)
      .crossJoin(broadcast(stats))
      .select(col("term"), col("df"), col("n_docs_postings"), col("tot_tokens"))
      .orderBy(col("df").desc, col("term"))
  }

  val bm25SpineProbeSql: String = s"""WITH postings AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest($tokensSql) AS term FROM documents)
      GROUP BY 1, 2),
    stats AS (
      SELECT n_docs_postings, tot_tokens
      FROM (SELECT COUNT(DISTINCT doc_id) AS n_docs_postings FROM postings),
           (SELECT CAST(SUM(tf) AS BIGINT) AS tot_tokens FROM postings))
    SELECT term, df, n_docs_postings, tot_tokens
    FROM (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1
          ORDER BY df DESC, term LIMIT $Bm25Queries), stats
    ORDER BY df DESC, term"""

  val bm25TopkSql: String =
    s"""WITH postings AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest($tokensSql) AS term FROM documents)
      GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY 1),
    stats AS (
      SELECT n_docs, tot_tokens
      FROM (SELECT COUNT(*) AS n_docs FROM documents),
           (SELECT SUM(tf) AS tot_tokens FROM postings)),
    qidf AS (
      SELECT term, df, n_docs, tot_tokens,
        CAST(n_docs * 2 + 2 AS BIGINT) AS idf_num,
        CAST(df * 2 + 1 AS BIGINT) AS idf_den
      FROM (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1
            ORDER BY df DESC, term LIMIT $Bm25Queries), stats),
    scored AS (
      SELECT p.term, p.doc_id, p.tf, CAST(dl.dl AS BIGINT) AS dl,
        idf_num, idf_den,
        CAST((22 * CAST(p.tf AS HUGEINT) * tot_tokens * 1000000000) //
             (10 * CAST(p.tf AS HUGEINT) * tot_tokens
              + 3 * CAST(tot_tokens AS HUGEINT)
              + 9 * CAST(dl.dl AS HUGEINT) * n_docs) AS BIGINT) AS tfdl_e9
      FROM postings p JOIN qidf ON p.term = qidf.term
                      JOIN dl ON p.doc_id = dl.doc_id)
    SELECT term, rk, doc_id, tf, dl, idf_num, idf_den, tfdl_e9 FROM (
      SELECT *, row_number() OVER (
        PARTITION BY term ORDER BY tfdl_e9 DESC, doc_id) AS rk
      FROM scored)
    WHERE rk <= $Bm25TopK
    ORDER BY term, rk"""

  // ------------------------------------------- T26 markup density

  /** Markup/structural characters counted by the T26 scan — the
    * HTML/template residue set every extraction-QA pass looks for
    * (tags, entity refs, template braces, wiki brackets).
    */
  val MarkupRe = "[<>{}\\[\\]&]"
  /** URL-ish starts (scheme or bare www.) — counted as whole links. */
  val UrlRe = "https?://|www\\."
  val DigitRe = "[0-9]"
  val UpperRe = "[A-Z]"
  val AlphaRe = "[A-Za-z]"

  /** T26: markup / URL density scan — per (source, markup-percent
    * band), the structural-noise profile of the corpus: markup
    * character fraction, URL incidence, digit fraction, and
    * uppercase-per-letter ratio. These are the boilerplate-residue
    * signals web-corpus extractors audit after HTML stripping
    * (RefinedWeb §3.1 filters on exactly this family; C4 drops
    * brace-bearing pages — T18's page flag — while T26 gives the
    * corpus-level distribution those thresholds are read off).
    *
    * Determinism: every signal is an exact integer `regexp_count` over
    * a shared Java∩RE2 pattern (the T20 protocol); the band is pure
    * integer arithmetic ((markup·100) div chars clamped to 9 — no
    * float ever reaches a bucket edge); each reported fraction is one
    * IEEE division of exact integer sums rounded at the boundary.
    *
    * Scale shape: one codegen'd projection over one corpus scan, then
    * a map-side-combinable aggregate onto a ≤|sources|·10 key space —
    * no joins, no windows, nothing grows with the corpus.
    */
  def markupDensity(s: SparkSession, dir: String): DataFrame =
    markupDensityFrom(t(s, dir))

  /** [[markupDensity]] over an explicit `(source, text)` relation — the
    * driver corpus is mostly markup-free, so the spec drives crafted
    * HTML/template residue through this.
    */
  def markupDensityFrom(d: DataFrame): DataFrame = {
    val per = d.select(
      col("source"),
      length(col("text")).cast("long").as("n_chars"),
      regexp_count(col("text"), lit(MarkupRe)).cast("long").as("n_markup"),
      regexp_count(col("text"), lit(UrlRe)).cast("long").as("n_url"),
      regexp_count(col("text"), lit(DigitRe)).cast("long").as("n_digit"),
      regexp_count(col("text"), lit(UpperRe)).cast("long").as("n_upper"),
      regexp_count(col("text"), lit(AlphaRe)).cast("long").as("n_alpha"))
      .withColumn("band",
        least(expr("(n_markup * 100) div greatest(n_chars, 1)"), lit(9L)))
    per.groupBy("source", "band")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_url") > 0, 1L).otherwise(0L)).as("docs_with_url"),
        sum("n_url").as("total_urls"),
        sum("n_chars").as("c"),
        sum("n_markup").as("m"),
        sum("n_digit").as("dg"),
        sum("n_upper").as("up"),
        sum("n_alpha").as("al"))
      .select(col("source"), col("band"), col("n_docs"),
        col("docs_with_url"), col("total_urls"),
        round(col("m").cast("double") / greatest(col("c"), lit(1L)).cast("double"), 6)
          .as("markup_frac"),
        round(col("dg").cast("double") / greatest(col("c"), lit(1L)).cast("double"), 6)
          .as("digit_frac"),
        round(col("up").cast("double") / greatest(col("al"), lit(1L)).cast("double"), 6)
          .as("upper_frac"),
        round(col("total_urls").cast("double") / col("n_docs").cast("double"), 6)
          .as("urls_per_doc"))
      .orderBy("source", "band")
  }

  val markupDensitySql: String = s"""WITH per AS (
      SELECT source,
        CAST(length(text) AS BIGINT) AS n_chars,
        ${reCount("text", MarkupRe)} AS n_markup,
        ${reCount("text", UrlRe)} AS n_url,
        ${reCount("text", DigitRe)} AS n_digit,
        ${reCount("text", UpperRe)} AS n_upper,
        ${reCount("text", AlphaRe)} AS n_alpha
      FROM documents),
    banded AS (
      SELECT *, LEAST((n_markup * 100) // GREATEST(n_chars, 1), 9) AS band
      FROM per),
    agg AS (
      SELECT source, band, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN n_url > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_url,
        CAST(SUM(n_url) AS BIGINT) AS total_urls,
        CAST(SUM(n_chars) AS BIGINT) AS c,
        CAST(SUM(n_markup) AS BIGINT) AS m,
        CAST(SUM(n_digit) AS BIGINT) AS dg,
        CAST(SUM(n_upper) AS BIGINT) AS up,
        CAST(SUM(n_alpha) AS BIGINT) AS al
      FROM banded GROUP BY 1, 2)
    SELECT source, band, n_docs, docs_with_url, total_urls,
      ROUND(CAST(m AS DOUBLE) / CAST(GREATEST(c, 1) AS DOUBLE), 6) AS markup_frac,
      ROUND(CAST(dg AS DOUBLE) / CAST(GREATEST(c, 1) AS DOUBLE), 6) AS digit_frac,
      ROUND(CAST(up AS DOUBLE) / CAST(GREATEST(al, 1) AS DOUBLE), 6) AS upper_frac,
      ROUND(CAST(total_urls AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS urls_per_doc
    FROM agg ORDER BY source, band"""

  // ------------------------------------------- T27 vocab coverage

  /** Vocabulary head sizes the T27 coverage curve is evaluated at. */
  val CoverageRanks: Seq[Long] = Seq(10L, 100L, 1000L, 10000L)
  /** Value-range bucket count for the T27 two-phase exact rank. */
  val CoverageBuckets = 64L

  /** T27: vocabulary coverage curve — for each head size R in
    * [[CoverageRanks]], the share of all corpus token OCCURRENCES
    * covered by the R most frequent token types (and the share of the
    * type inventory those R types are). THE tokenizer-sizing table:
    * vocab-size choices read exactly this curve (a heavy Zipf head —
    * T12 fits its slope — means 10k types can cover >90 % of a corpus),
    * and a too-flat curve flags tokenization or encoding damage.
    *
    * Determinism: ranks order by exact integer (count DESC, token);
    * every numerator/denominator is an exact integer sum; each coverage
    * value is one IEEE division rounded at the boundary; cumulation
    * happens on exact integers BEFORE the division, never on rounded
    * doubles.
    *
    * Scale shape: the E17/W1 two-phase exact global rank, descending —
    * vocab rows bucket by the monotone transform (cw·[[CoverageBuckets]])
    * div max (1-row broadcast), rank inside bucket partitions, global
    * rank = descending ≤64-row exclusive bucket-offset window + local
    * rank — a billion-type vocabulary never sorts in one partition
    * (contrast T8, whose bucket-top-K trick only works because its K
    * is small; the coverage head is 10⁴). Rows past the largest R are
    * filtered before the final ≤4-row cumulative window. The oracle
    * states the naive single-window rank; the identical (cw, w) total
    * order makes them agree.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    vocabCoverageFrom(t(s, dir))

  /** [[vocabCoverage]] over an explicit `(text)` relation. */
  def vocabCoverageFrom(d: DataFrame): DataFrame = {
    val maxR = CoverageRanks.max
    val cnts = d.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .persist() // feeds the max/total legs AND the rank leg
    val mx = cnts.agg(max("cw").as("mxc"), sum("cw").as("u"),
      count(lit(1)).as("n_all"))
    val bucketed = cnts.crossJoin(broadcast(mx))
      .withColumn("bucket", least(expr(s"(cw * $CoverageBuckets) div mxc"),
        lit(CoverageBuckets - 1L)))
    val local = bucketed.withColumn("lrk", row_number().over(
      Window.partitionBy("bucket").orderBy(col("cw").desc, col("w"))))
    val off = local.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("boff",
        coalesce(sum("bn").over(Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ranked = local.join(off.select("bucket", "boff"), "bucket")
      .select(col("cw"), col("u"), col("n_all"),
        (col("boff") + col("lrk")).as("rk"))
      .filter(col("rk") <= maxR)
    val band = CoverageRanks.sorted.foldRight(lit(null).cast("long")) {
      (r, acc) => when(col("rk") <= r, lit(r)).otherwise(acc)
    }
    val per = ranked.withColumn("band", band)
      .groupBy("band")
      .agg(max("u").as("u"), max("n_all").as("n_all"),
        count(lit(1)).as("bt"), sum("cw").as("bc"))
    val wCum = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, 0)
    per.select(col("band").as("threshold"),
        sum("bt").over(wCum).as("n_types"),
        sum("bc").over(wCum).as("covered_tokens"),
        col("u"), col("n_all"))
      .select(col("threshold"), col("n_types"), col("covered_tokens"),
        round(col("covered_tokens").cast("double") / col("u").cast("double"), 6)
          .as("coverage"),
        round(col("n_types").cast("double") / col("n_all").cast("double"), 6)
          .as("type_frac"))
      .orderBy("threshold")
  }

  val vocabCoverageSql: String = {
    val bandCase = CoverageRanks.sorted
      .map(r => s"WHEN rk <= $r THEN $r").mkString(" ")
    s"""WITH toks AS (SELECT unnest($tokensSql) AS w FROM documents),
    cnts AS (SELECT w, COUNT(*) AS cw FROM toks GROUP BY 1),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS u, COUNT(*) AS n_all FROM cnts),
    ranked AS (
      SELECT cw, row_number() OVER (ORDER BY cw DESC, w) AS rk FROM cnts),
    per AS (
      SELECT CASE $bandCase END AS band, COUNT(*) AS bt,
        CAST(SUM(cw) AS BIGINT) AS bc
      FROM ranked WHERE rk <= ${CoverageRanks.max} GROUP BY 1)
    SELECT CAST(band AS BIGINT) AS threshold,
      CAST(SUM(bt) OVER wc AS BIGINT) AS n_types,
      CAST(SUM(bc) OVER wc AS BIGINT) AS covered_tokens,
      ROUND(CAST(SUM(bc) OVER wc AS DOUBLE) / CAST(u AS DOUBLE), 6) AS coverage,
      ROUND(CAST(SUM(bt) OVER wc AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS type_frac
    FROM per CROSS JOIN tot
    WINDOW wc AS (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY threshold"""
  }

  // ------------------------------------- T28 length percentiles

  /** Value-range bucket count for the T28 per-source two-phase rank. */
  val LenBuckets = 64L

  /** T28: per-source document-length percentiles — exact p10/p50/p90
    * token counts, range, and mean for every source: the length row of
    * a data card (every corpus release reports it) and the input to
    * sequence-packing (W2) and truncation-policy decisions. Percentile
    * = the ⌈n·p/100⌉-th smallest under the fully-keyed (ntok, doc_id)
    * order — the T15 order statistic, per source.
    *
    * Determinism: token counts and ranks are exact integers; the mean
    * accumulates DECIMAL(20,0) and divides once, rounded at the
    * boundary.
    *
    * Scale shape: the W1/T15 two-phase exact rank, keyed per source —
    * lengths bucket by the monotone transform (ntok·[[LenBuckets]]) div
    * max (per-source max from a bounded broadcast), ranks run inside
    * (source, bucket) partitions, and the global per-source rank is the
    * ≤[[LenBuckets]]-row exclusive bucket-offset window + local rank —
    * a source with a billion docs never sorts in one partition. The
    * oracle states the naive per-source single-window rank; the
    * identical (ntok, doc_id) total order makes them agree.
    */
  def lengthPercentiles(s: SparkSession, dir: String): DataFrame =
    lengthPercentilesFrom(t(s, dir).select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("ntok")))

  /** [[lengthPercentiles]] over an explicit `(doc_id, source, ntok)`
    * relation — the spec pins the order statistics on crafted ladders.
    */
  def lengthPercentilesFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val mx = d.groupBy("source").agg(max("ntok").as("mxn"), count(lit(1)).as("n"))
    val base = d.join(broadcast(mx), "source")
      .withColumn("bucket",
        least(expr(s"(ntok * $LenBuckets) div greatest(mxn, 1)"), lit(LenBuckets - 1L)))
    val local = base.withColumn("lrk", row_number().over(
      Window.partitionBy("source", "bucket").orderBy("ntok", "doc_id")))
    val off = local.groupBy("source", "bucket").agg(count(lit(1)).as("bn"))
      .withColumn("boff",
        coalesce(sum("bn").over(Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ranked = local.join(off.select("source", "bucket", "boff"),
        Seq("source", "bucket"))
      .withColumn("rk", col("boff") + col("lrk"))
    def kOf(p: Int) = expr(s"(n * $p + 99) div 100")
    ranked.groupBy("source")
      .agg(max("n").as("n_docs"),
        min("ntok").as("min_tokens"),
        max(when(col("rk") === kOf(10), col("ntok"))).as("p10"),
        max(when(col("rk") === kOf(50), col("ntok"))).as("p50"),
        max(when(col("rk") === kOf(90), col("ntok"))).as("p90"),
        max("ntok").as("max_tokens"),
        sum(col("ntok").cast(DecimalType(20, 0))).as("tsum"))
      .select(col("source"), col("n_docs"), col("min_tokens"),
        col("p10"), col("p50"), col("p90"), col("max_tokens"),
        round(col("tsum").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_tokens"))
      .orderBy("source")
  }

  val lengthPercentilesSql: String = s"""WITH d AS (
      SELECT doc_id, source, CAST(len($tokensSql) AS BIGINT) AS ntok
      FROM documents),
    tot AS (SELECT source, COUNT(*) AS n FROM d GROUP BY 1),
    r AS (
      SELECT d.source, ntok, n,
        row_number() OVER (PARTITION BY d.source ORDER BY ntok, doc_id) AS rk
      FROM d JOIN tot ON d.source = tot.source)
    SELECT source,
      CAST(MAX(n) AS BIGINT) AS n_docs,
      CAST(MIN(ntok) AS BIGINT) AS min_tokens,
      CAST(MAX(CASE WHEN rk = (n * 10 + 99) // 100 THEN ntok END) AS BIGINT) AS p10,
      CAST(MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN ntok END) AS BIGINT) AS p50,
      CAST(MAX(CASE WHEN rk = (n * 90 + 99) // 100 THEN ntok END) AS BIGINT) AS p90,
      CAST(MAX(ntok) AS BIGINT) AS max_tokens,
      ROUND(CAST(SUM(CAST(ntok AS DECIMAL(20,0))) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6) AS mean_tokens
    FROM r GROUP BY source ORDER BY source"""

  // ------------------------------------------- T29 blocklist filter

  /** Spam-marker blocklist for the T29 page filter — a neutral stand-in
    * for the word list a production C4-style pipeline ships (Raffel et
    * al. 2020 §2.2 drop pages containing any listed word); the filter
    * machinery is list-agnostic.
    */
  val Blocklist: Seq[String] = Seq("casino", "viagra", "lottery", "jackpot")

  /** T29: blocklist page filter — the C4 §2.2 "bad words" stage: a page
    * is dropped when ANY token (case-folded, punctuation-stripped at
    * the edges) matches the [[Blocklist]]. Emits, per source, the audit
    * a cleaning run logs: doc volume, flagged docs and fraction, total
    * hit occurrences, and the token mass the drop reclaims.
    *
    * Determinism: hits are exact integer counts of an exact
    * set-membership test (lower + edge-trim are identical string ops in
    * both engines); fractions are single rounded IEEE divisions.
    *
    * Scale shape: one codegen'd projection over one corpus scan (the
    * membership test is a ≤|blocklist| literal IN over each token — no
    * join, the list is a plan constant), then a map-side-combinable
    * rollup onto the ≤|sources| key space.
    */
  def blocklistFilter(s: SparkSession, dir: String): DataFrame =
    blocklistFilterFrom(t(s, dir))

  /** [[blocklistFilter]] over an explicit `(source, text)` relation —
    * the spec pins the case-fold/edge-trim matching on crafted spam.
    */
  def blocklistFilterFrom(d: DataFrame): DataFrame = {
    val norm: Column => Column = x =>
      regexp_replace(regexp_replace(lower(x), "^[^a-z0-9]+", ""), "[^a-z0-9]+$", "")
    val hits = size(filter(tokens(col("text")),
      x => norm(x).isInCollection(Blocklist)))
    val per = d.select(col("source"),
      size(tokens(col("text"))).cast("long").as("ntok"),
      hits.cast("long").as("n_hits"))
    per.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("docs_flagged"),
        sum("n_hits").as("total_hits"),
        sum(when(col("n_hits") > 0, col("ntok")).otherwise(0L)).as("tokens_dropped"),
        sum("ntok").as("total_tokens"))
      .select(col("source"), col("n_docs"), col("docs_flagged"),
        round(col("docs_flagged").cast("double") / col("n_docs").cast("double"), 6)
          .as("flag_frac"),
        col("total_hits"), col("tokens_dropped"),
        round(col("tokens_dropped").cast("double") /
          greatest(col("total_tokens"), lit(1L)).cast("double"), 6)
          .as("token_drop_frac"))
      .orderBy("source")
  }

  val blocklistFilterSql: String = {
    val list = Blocklist.map(w => s"'$w'").mkString(", ")
    val norm = "regexp_replace(regexp_replace(lower(x), '^[^a-z0-9]+', ''), '[^a-z0-9]+$$', '')"
    s"""WITH per AS (
      SELECT source,
        CAST(len($tokensSql) AS BIGINT) AS ntok,
        CAST(len(list_filter($tokensSql, x -> $norm IN ($list))) AS BIGINT) AS n_hits
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
      ROUND(CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS DOUBLE) /
        CAST(COUNT(*) AS DOUBLE), 6) AS flag_frac,
      CAST(SUM(n_hits) AS BIGINT) AS total_hits,
      CAST(SUM(CASE WHEN n_hits > 0 THEN ntok ELSE 0 END) AS BIGINT) AS tokens_dropped,
      ROUND(CAST(SUM(CASE WHEN n_hits > 0 THEN ntok ELSE 0 END) AS DOUBLE) /
        CAST(GREATEST(SUM(ntok), 1) AS DOUBLE), 6) AS token_drop_frac
    FROM per GROUP BY source ORDER BY source"""
  }

  // ------------------------------------------------------- T30 Heaps' law

  val HeapsBuckets = 20L

  /** T30: Heaps'-law vocabulary growth curve — docs are cut into
    * [[HeapsBuckets]] equal doc-id ranges; per bucket: tokens scanned,
    * NEW vocabulary types (tokens whose first appearance falls in the
    * bucket), and the cumulative type/token totals with the pointwise
    * Heaps exponent ln(V)/ln(N). Natural corpora grow V ≈ K·N^β with
    * β ≈ 0.4–0.6 (Heaps 1978); a flattening curve means the crawl has
    * stopped discovering language, a β near 1 means unbounded junk
    * vocabulary (both standard corpus-growth health checks).
    *
    * Determinism: first appearance is an exact min over (token → doc_id)
    * (the D13 first-touch shape on the raw token); bucket indexes are
    * pure integer arithmetic off the 1-row max-id broadcast; counts are
    * exact integers; the two lns divide once at the boundary, rounded
    * at 6, with the N≤1 denominator guarded to NULL (CLAUDE.md NaN
    * rule).
    *
    * Scale shape: one vocab-sized min-agg (map-side partial) + one
    * per-doc token-count agg, each followed by a map-side-partial
    * rollup onto the ≤[[HeapsBuckets]] key space; cumulative sums run
    * on the bounded bucket relation only. No window over the corpus, no
    * join between fact-sized relations.
    */
  def heapsLaw(s: SparkSession, dir: String): DataFrame =
    heapsLawFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[heapsLaw]] over an explicit `(doc_id, text)` relation — the spec
    * pins exact new-type counts on a crafted vocabulary ramp.
    */
  def heapsLawFrom(docs: DataFrame): DataFrame = {
    val mx = docs.agg(max("doc_id").as("mxid"))
    val bucketOf = expr(s"(doc_id * $HeapsBuckets) div (mxid + 1)")
    // per-bucket scanned tokens and doc counts
    val perDoc = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("ntok"))
      .crossJoin(broadcast(mx))
      .select(bucketOf.as("bucket"), col("ntok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("bucket_tokens"))
    // per-bucket NEW types: token -> min doc_id, bucketed
    val firstTouch = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(min("doc_id").as("doc_id"))
      .crossJoin(broadcast(mx))
      .select(bucketOf.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    perDoc.join(firstTouch, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      .withColumn("cum_types", sum("new_types").over(w))
      .withColumn("cum_tokens", sum("bucket_tokens").over(w))
      .select(col("bucket"), col("n_docs"), col("bucket_tokens"),
        col("new_types"), col("cum_types"), col("cum_tokens"),
        when(col("cum_tokens") > 1 && col("cum_types") > 0,
          round(log(col("cum_types").cast("double")) /
            log(col("cum_tokens").cast("double")), 6)).as("beta_pointwise"))
      .orderBy("bucket")
  }

  val heapsLawSql: String = s"""WITH mx AS (
      SELECT MAX(doc_id) AS mxid FROM documents),
    per_doc AS (
      SELECT (doc_id * $HeapsBuckets) // (mxid + 1) AS bucket,
        CAST(len($tokensSql) AS BIGINT) AS ntok
      FROM documents CROSS JOIN mx),
    buckets AS (
      SELECT bucket, COUNT(*) AS n_docs,
        CAST(SUM(ntok) AS BIGINT) AS bucket_tokens
      FROM per_doc GROUP BY 1),
    first_touch AS (
      SELECT tok, MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
      GROUP BY 1),
    new_types AS (
      SELECT (doc_id * $HeapsBuckets) // (mxid + 1) AS bucket,
        COUNT(*) AS new_types
      FROM first_touch CROSS JOIN mx GROUP BY 1),
    cum AS (
      SELECT b.bucket, n_docs, bucket_tokens,
        COALESCE(new_types, 0) AS new_types,
        SUM(COALESCE(new_types, 0)) OVER (ORDER BY b.bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_types,
        SUM(bucket_tokens) OVER (ORDER BY b.bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM buckets b LEFT JOIN new_types n ON b.bucket = n.bucket)
    SELECT bucket, n_docs, bucket_tokens,
      CAST(new_types AS BIGINT) AS new_types,
      CAST(cum_types AS BIGINT) AS cum_types,
      CAST(cum_tokens AS BIGINT) AS cum_tokens,
      CASE WHEN cum_tokens > 1 AND cum_types > 0
        THEN ROUND(ln(CAST(cum_types AS DOUBLE)) /
          ln(CAST(cum_tokens AS DOUBLE)), 6) END AS beta_pointwise
    FROM cum ORDER BY bucket"""

  // --------------------------------------------------- T31 tf-idf keywords

  val KeywordsPerDoc = 3

  /** T31: per-document keyword extraction — the top-[[KeywordsPerDoc]]
    * tokens of every document by tf·idf (Spärck Jones 1972), the
    * classic zero-training summarizer/tagger of a curation pipeline
    * (distinct from T23's BM25, which ranks DOCUMENTS for a query —
    * this ranks TERMS within a document). idf = ln((N+1)/(df+1))
    * smoothed so corpus-universal terms score 0, never negative-∞.
    *
    * Determinism: tf and df are exact integers; idf follows the T10
    * rule — computed ONCE per vocab row and rounded at 9 before any
    * reuse; score = tf·idf multiplies an exact integer by the identical
    * double (one IEEE op), and ranking compares those bit-identical
    * doubles with (token asc) tie-breaks; the emitted score re-rounds
    * at 6.
    *
    * Scale shape: tf is one (doc,tok) pre-agg; df is a map-side-partial
    * count over that already-distinct relation (the d18 viral-key-safe
    * shape — no countDistinct); the join back is vocab-keyed; the top-k
    * window partitions by doc_id — per-key, never global. Output is
    * k·docs rows.
    */
  def tfidfKeywords(s: SparkSession, dir: String): DataFrame =
    tfidfKeywordsFrom(t(s, dir).select(col("doc_id"), col("text")))

  /** [[tfidfKeywords]] over an explicit `(doc_id, text)` relation — the
    * spec pins rank order on a corpus with known df structure.
    */
  def tfidfKeywordsFrom(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tok"),
        round(log((col("n").cast("double") + 1.0) / (col("df").cast("double") + 1.0)), 9)
          .as("idf"))
    val scored = tf.join(df, "tok")
      .select(col("doc_id"), col("tok"), (col("tf") * col("idf")).as("score"))
    scored.withColumn("rk", row_number().over(
      Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))))
      .filter(col("rk") <= KeywordsPerDoc)
      .select(col("doc_id"), col("rk"), col("tok").as("keyword"),
        round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rk")
  }

  // ------------------------------------------- T33 sentence-length audit

  /** T33: sentence-length distribution — per (source, log2 word-count
    * band) the sentence counts, word mass, exact min/max lengths, mean
    * length, and each band's share of the source's sentences: the
    * segmentation-QA histogram read before any sentence-level
    * processing (extraction that glues sentences together piles mass
    * into the high bands; boilerplate/navigation debris piles into band
    * 0-1 — C4's "at least 3 words per sentence" heuristic is a
    * threshold on exactly this distribution). Sentences split on the
    * same `[.!?]+` terminator class T21's readability counts, so the
    * two views can't drift.
    *
    * Determinism: the split pattern is Java∩RE2-safe (T20 protocol);
    * lengths and bands are exact integers (G2 bit-length log2); the two
    * ratios are one IEEE division each rounded at 6. Zero-token
    * fragments (terminator runs, trailing splits) drop identically in
    * both engines.
    *
    * Scale shape: explode-to-sentences feeds a hash aggregate whose
    * keys are (source, band) — partial aggregation collapses the
    * sentence stream map-side BEFORE the exchange (unlike the t6 gram
    * keys, these are low-cardinality), so the shuffle carries
    * ≤ |sources|·64 rows; the per-source total is a second tiny agg
    * joined at bin grain.
    */
  def sentenceStats(s: SparkSession, dir: String): DataFrame =
    sentenceStatsFrom(t(s, dir))

  /** [[sentenceStats]] over an explicit `(source, text)` relation — the
    * spec pins exact bands on crafted sentence ladders.
    */
  def sentenceStatsFrom(d: DataFrame): DataFrame = {
    val sent = d
      .select(col("source"), explode(split(col("text"), "[.!?]+")).as("sen"))
      .select(col("source"), size(tokens(col("sen"))).cast("long").as("ntok"))
      .filter(col("ntok") > 0)
      .withColumn("band", (length(conv(col("ntok"), 10, 2)) - 1).cast("long"))
    val bins = sent.groupBy("source", "band")
      .agg(count(lit(1)).as("n_sentences"), sum("ntok").as("n_words"),
        min("ntok").as("min_len"), max("ntok").as("max_len"))
    val tot = bins.groupBy("source").agg(sum("n_sentences").as("ts"))
    bins.join(tot, "source")
      .select(col("source"), col("band"), col("n_sentences"), col("n_words"),
        col("min_len"), col("max_len"),
        round(col("n_words").cast("double") / col("n_sentences").cast("double"), 6)
          .as("mean_len"),
        round(col("n_sentences").cast("double") / col("ts").cast("double"), 6)
          .as("sent_frac"))
      .orderBy("source", "band")
  }

  val sentenceStatsSql: String = s"""WITH sen AS (
      SELECT source,
        CAST(len(list_filter(string_split(s, ' '), x -> x != '')) AS BIGINT) AS ntok
      FROM (SELECT source, unnest(string_split_regex(text, '[.!?]+')) AS s
            FROM documents)),
    nz AS (SELECT source, ntok,
        CAST(length(ltrim(bin(ntok), '0')) - 1 AS BIGINT) AS band
      FROM sen WHERE ntok > 0),
    bins AS (SELECT source, band, COUNT(*) AS n_sentences,
        CAST(SUM(ntok) AS BIGINT) AS n_words,
        MIN(ntok) AS min_len, MAX(ntok) AS max_len
      FROM nz GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(n_sentences) AS BIGINT) AS ts
            FROM bins GROUP BY 1)
    SELECT source, band, n_sentences, n_words, min_len, max_len,
      ROUND(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6) AS mean_len,
      ROUND(CAST(n_sentences AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS sent_frac
    FROM bins JOIN tot USING (source) ORDER BY source, band"""

  // ------------------------------------- T34 n-gram LM perplexity filter

  /** Stupid-backoff discount (Brants et al. 2007 "Large Language
    * Models in Machine Translation" §4: the score-not-probability
    * backoff whose single fixed discount makes web-scale n-gram LMs
    * trainable in one MapReduce pass — exactly the regime this
    * operator targets).
    */
  val SbAlpha = 0.4
  /** Value-range bucket count for the T34 per-source two-phase rank. */
  val PplBuckets = 64L

  /** T34: n-gram LM perplexity filter — the CCNet stage T10/T11 only
    * proxy (Wenzek et al. 2020 §4.2 score documents with a KenLM
    * n-gram model and split each language into head/middle/tail
    * perplexity terciles; here the model is a hashed-TRIGRAM stupid
    * backoff trained on the corpus's own T7 'train' split and scored
    * over the held-out 20%, so backoff genuinely fires on unseen
    * n-grams). Per scored document: trigram positions scored, how many
    * resolved at each backoff level (trigram / bigram / unigram-OOV —
    * the filter-health telemetry), the mean negative log-likelihood in
    * nats, and the CCNet bucket: per-source terciles of mean NLL
    * (head = most fluent). Documents under 3 tokens emit
    * `n_scored = 0`, mean 0, bucket 'unscored'.
    *
    * Model: SB(w₃|w₁w₂) = c₃/c₂(w₁w₂) when the trigram was seen in
    * train, else [[SbAlpha]]·c₂(w₂w₃)/c₁(w₂) when the backoff bigram
    * was, else [[SbAlpha]]²·max(c₁(w₃),1)/N (the add-one unigram floor
    * makes OOV tokens finite, the KenLM `<unk>` analog). All n-grams
    * are MD5-prefix hashed (the T11 convention — collisions merge
    * counts identically in both engines).
    *
    * Determinism (the T10/T11 transcendental tier): every score is a
    * rational of exact train counts; −ln is taken ONCE per DISTINCT
    * scored trigram on the vocab-grain relation and immediately
    * `round(…, 9)`; per-doc totals accumulate those identical doubles
    * in exact DECIMAL; one IEEE division per doc, `round(…, 6)` at the
    * emission boundary. The tercile rank key is
    * `floor(mean·10⁶)` — floor of an identical double is identical —
    * with doc_id tiebreak, and the tercile split `3·rank ≤ n` is pure
    * integer arithmetic.
    *
    * Scale shape: train counts are three token-grain pre-aggregated
    * shuffles onto hashed keys; scoring joins run at the DISTINCT
    * scored-trigram grain (never per occurrence) and join back to the
    * doc-local pre-agg (the T11 shape); the per-source tercile is the
    * W1/T15/T28 two-phase bucketed rank — a source with a billion
    * scored docs never sorts in one partition; the oracle states the
    * naive per-source window and the identical (key, doc_id) total
    * order makes them agree. The train bigram/unigram tables feed two
    * scoring legs each and the scored pre-agg feeds the distinct +
    * join-back legs — all three persisted (t34 is in Bench.extraIters
    * per the persist contract).
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    // prepared-query memo (r19, tools/BuildCensus: ~0.8 s of driver
    // analysis per call — the registry's largest non-loop construction);
    // EVERY persist in the composed plan (model uni/big, the scored
    // occurrence pre-agg, the ranked base) is re-armed per call — the
    // d17 buried-persist lesson, see Dedup.simhashParts
    val (q, persisted) = SessionMemo.get[(DataFrame, Seq[DataFrame])](
      s, s"textops-t34:$dir") {
      lmPerplexityParts(t(s, dir).select(col("doc_id"), col("source"), col("text")))
    }
    persisted.foreach(SessionMemo.rearm)
    q
  }

  /** The T34 stupid-backoff model: hashed n-gram count tables + the
    * 1-row train-token total. `uni` and `big` are persisted by
    * [[sbModel]] (each feeds 2-3 scoring legs).
    */
  private[graft] final case class SbModel(uni: DataFrame, big: DataFrame,
                                          tri: DataFrame, total: DataFrame)

  /** Trains the [[SbModel]] over a relation with a `text` column —
    * shared by the batch T34 scorer and the streaming ingest gate so
    * the model definition cannot drift between tiers.
    *
    * Three separate explode→count passes, one per n-gram order — the
    * MEASURED winner over the tempting single-pass fusion
    * (explode(concat(tagged uni/bi/tri arrays))): the fused form
    * materializes a 3n-element struct array per document before the
    * generate and scans the 3×-larger fused cache on every scoring
    * leg, and ran consistently SLOWER at sf0.1 (warm 1.75 s vs
    * 1.51 s, cold 12.4 s vs 9.5 s, min-of-3 TimeQ, r16). Each explode
    * here is a streamed codegen'd Generate; the exchanged row count
    * is identical either way.
    */
  private[graft] def sbModel(train: DataFrame): SbModel = {
    val uni = train
      .select(explode(tokens(col("text"))).as("tok"))
      .select(tokenHash(col("tok")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .persist() // u2 + u3 scoring legs (+ the N total)
    val big = train
      .select(explode(ngrams(tokens(col("text")), 2)).as("g"))
      .select(tokenHash(col("g")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .persist() // b12 + b23 scoring legs
    val tri = train
      .select(explode(ngrams(tokens(col("text")), 3)).as("g"))
      .select(tokenHash(col("g")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
    SbModel(uni, big, tri, uni.agg(sum("c").as("nt"))) // total: 1 row
  }

  /** The hashed backoff-lookup quintuple of a trigram string column
    * `g` — the trigram, its two component bigrams, and the two
    * conditioning unigrams: everything one stupid-backoff score needs.
    */
  private[graft] def sbKeyCols(g: Column): Seq[Column] = {
    val parts = split(g, " ")
    Seq(tokenHash(g).as("h3"),
      tokenHash(concat_ws(" ", parts(0), parts(1))).as("h12"),
      tokenHash(concat_ws(" ", parts(1), parts(2))).as("h23"),
      tokenHash(parts(1)).as("h2u"),
      tokenHash(parts(2)).as("h3u"))
  }

  private[graft] val sbKeys = Seq("h3", "h12", "h23", "h2u", "h3u")

  /** Scores a DISTINCT quintuple relation against the model: appends
    * the backoff level (3 = trigram hit, 2 = backoff bigram,
    * 1 = unigram/OOV floor) and the per-occurrence negative
    * log-likelihood `round(−ln SB, 9)` (the T10 transcendental
    * discipline — one ln per distinct key, rounded at the source).
    */
  private[graft] def sbNll(dist: DataFrame, m: SbModel): DataFrame =
    dist
      .join(m.tri.select(col("h").as("h3"), col("c").as("c3")), Seq("h3"), "left")
      .join(m.big.select(col("h").as("h12"), col("c").as("c12")), Seq("h12"), "left")
      .join(m.big.select(col("h").as("h23"), col("c").as("c23")), Seq("h23"), "left")
      .join(m.uni.select(col("h").as("h2u"), col("c").as("c2u")), Seq("h2u"), "left")
      .join(m.uni.select(col("h").as("h3u"), col("c").as("c3u")), Seq("h3u"), "left")
      .crossJoin(broadcast(m.total))
      .select(dist.columns.toIndexedSeq.map(col) ++ Seq(
        when(col("c3").isNotNull, lit(3L))
          .when(col("c23").isNotNull, lit(2L)).otherwise(lit(1L)).as("lvl"),
        round(-log(
          when(col("c3").isNotNull,
            col("c3").cast("double") / col("c12").cast("double"))
          .when(col("c23").isNotNull,
            lit(SbAlpha) * (col("c23").cast("double") / col("c2u").cast("double")))
          .otherwise(lit(SbAlpha * SbAlpha) *
            (greatest(coalesce(col("c3u"), lit(0L)), lit(1L)).cast("double") /
              col("nt").cast("double")))), 9).as("nll")): _*)

  /** [[lmPerplexity]] over an explicit `(doc_id, source, text)`
    * relation — the spec pins exact backoff levels and nats on a
    * crafted train/held-out corpus.
    */
  def lmPerplexityFrom(d: DataFrame): DataFrame = lmPerplexityParts(d)._1

  /** [[lmPerplexityFrom]] plus every persisted relation inside the
    * composed plan, for the memoizing caller's per-call re-arm.
    */
  private[graft] def lmPerplexityParts(d: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.types.DecimalType
    val isTrain = splitOf(col("doc_id")) === "train"
    val m = sbModel(d.filter(isTrain))
    val scoredDocs = d.filter(!isTrain)
    // scored occurrences, pre-aggregated doc-locally at the hashed
    // quintuple grain (trigram + its two component bigrams + the two
    // conditioning unigrams — everything a backoff lookup needs)
    val socc = scoredDocs
      .select(col("doc_id"), explode(ngrams(tokens(col("text")), 3)).as("g"))
      .select(col("doc_id") +: sbKeyCols(col("g")): _*)
      .groupBy("doc_id", sbKeys: _*)
      .agg(count(lit(1)).as("c"))
      .persist() // distinct-trigram leg + per-doc join-back leg
    val keys = sbKeys
    val dist = socc.select(keys.map(col): _*).distinct()
    val sc = sbNll(dist, m)
    val per = socc.join(sc, keys)
      .groupBy("doc_id")
      .agg(sum("c").as("n_scored"),
        sum(col("nll").cast(DecimalType(20, 10)) *
          col("c").cast(DecimalType(10, 0))).as("tot"),
        sum(when(col("lvl") === 3L, col("c")).otherwise(lit(0L))).as("n_tri"),
        sum(when(col("lvl") === 2L, col("c")).otherwise(lit(0L))).as("n_bi"),
        sum(when(col("lvl") === 1L, col("c")).otherwise(lit(0L))).as("n_oov"))
    val base = scoredDocs.select(col("doc_id"), col("source"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_scored") > 0,
          round(col("tot").cast("double") / col("n_scored").cast("double"), 6))
          .otherwise(lit(0.0)).as("mean_nll"),
        when(col("n_scored") > 0,
          floor(col("tot").cast("double") / col("n_scored").cast("double") *
            lit(1000000.0)).cast("long")).as("anll_e6"))
      // tercile rank legs + final join-back — and its subtree holds the
      // only reference to the (unpersisted) train trigram table
      .persist()
    val ranked = base.filter(col("anll_e6").isNotNull)
    // two-phase exact per-source rank on (anll_e6, doc_id) — T28 shape
    val mx = ranked.groupBy("source")
      .agg(max("anll_e6").as("mxk"), count(lit(1)).as("ns"))
    val bucketed = ranked.join(broadcast(mx), "source")
      .withColumn("vb", least(
        expr(s"(greatest(anll_e6, 0L) * $PplBuckets) div greatest(mxk, 1L)"),
        lit(PplBuckets - 1L)))
    val local = bucketed.withColumn("lrk", row_number().over(
      Window.partitionBy("source", "vb").orderBy("anll_e6", "doc_id")))
    val off = local.groupBy("source", "vb").agg(count(lit(1)).as("bn"))
      .withColumn("boff",
        coalesce(sum("bn").over(Window.partitionBy("source").orderBy("vb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tercile = local.join(off.select("source", "vb", "boff"), Seq("source", "vb"))
      .withColumn("rk", col("boff") + col("lrk"))
      .select(col("doc_id"),
        when(col("rk") * 3 <= col("ns"), "head")
          .when(col("rk") * 3 <= col("ns") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
    val out = base.join(tercile, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_scored"), col("n_tri"),
        col("n_bi"), col("n_oov"), col("mean_nll"),
        coalesce(col("ppl_bucket"), lit("unscored")).as("ppl_bucket"))
      .orderBy("doc_id")
    (out, Seq(m.uni, m.big, socc, base))
  }

  val lmPerplexitySql: String = {
    val h = tokenHashSql(_: String)
    s"""WITH doc AS (
      SELECT doc_id, source, $tokensSql AS toks,
        CASE WHEN ${tokenHashSql("CAST(doc_id AS VARCHAR)")} % 100 < $TrainBuckets
          THEN 1 ELSE 0 END AS is_train
      FROM documents),
    uni AS (SELECT ${h("tok")} AS h, COUNT(*) AS c
      FROM (SELECT unnest(toks) AS tok FROM doc WHERE is_train = 1) GROUP BY 1),
    big AS (SELECT ${h("g")} AS h, COUNT(*) AS c
      FROM (SELECT unnest(${ngramsSql("toks", 2)}) AS g FROM doc WHERE is_train = 1)
      GROUP BY 1),
    tri AS (SELECT ${h("g")} AS h, COUNT(*) AS c
      FROM (SELECT unnest(${ngramsSql("toks", 3)}) AS g FROM doc WHERE is_train = 1)
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
    socc AS (
      SELECT doc_id, h3, h12, h23, h2u, h3u, COUNT(*) AS c FROM (
        SELECT doc_id, ${h("g")} AS h3,
          ${h("concat_ws(' ', split_part(g, ' ', 1), split_part(g, ' ', 2))")} AS h12,
          ${h("concat_ws(' ', split_part(g, ' ', 2), split_part(g, ' ', 3))")} AS h23,
          ${h("split_part(g, ' ', 2)")} AS h2u,
          ${h("split_part(g, ' ', 3)")} AS h3u
        FROM (SELECT doc_id, unnest(${ngramsSql("toks", 3)}) AS g
              FROM doc WHERE is_train = 0))
      GROUP BY 1, 2, 3, 4, 5, 6),
    dist AS (SELECT DISTINCT h3, h12, h23, h2u, h3u FROM socc),
    sc AS (
      SELECT d.h3, d.h12, d.h23, d.h2u, d.h3u,
        CASE WHEN t3.c IS NOT NULL THEN 3
             WHEN b23.c IS NOT NULL THEN 2 ELSE 1 END AS lvl,
        ROUND(-ln(CASE
          WHEN t3.c IS NOT NULL THEN CAST(t3.c AS DOUBLE) / CAST(b12.c AS DOUBLE)
          WHEN b23.c IS NOT NULL THEN
            $SbAlpha * (CAST(b23.c AS DOUBLE) / CAST(u2.c AS DOUBLE))
          ELSE ${SbAlpha * SbAlpha} *
            (CAST(GREATEST(COALESCE(u3.c, 0), 1) AS DOUBLE) / CAST(nt AS DOUBLE))
          END), 9) AS nll
      FROM dist d
      LEFT JOIN tri t3 ON d.h3 = t3.h
      LEFT JOIN big b12 ON d.h12 = b12.h
      LEFT JOIN big b23 ON d.h23 = b23.h
      LEFT JOIN uni u2 ON d.h2u = u2.h
      LEFT JOIN uni u3 ON d.h3u = u3.h
      CROSS JOIN tot),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_scored,
        SUM(CAST(nll AS DECIMAL(20,10)) * CAST(c AS DECIMAL(10,0))) AS tot,
        CAST(SUM(CASE WHEN lvl = 3 THEN c ELSE 0 END) AS BIGINT) AS n_tri,
        CAST(SUM(CASE WHEN lvl = 2 THEN c ELSE 0 END) AS BIGINT) AS n_bi,
        CAST(SUM(CASE WHEN lvl = 1 THEN c ELSE 0 END) AS BIGINT) AS n_oov
      FROM socc JOIN sc USING (h3, h12, h23, h2u, h3u)
      GROUP BY 1),
    base AS (
      SELECT d.doc_id, d.source,
        COALESCE(n_scored, 0) AS n_scored,
        COALESCE(n_tri, 0) AS n_tri,
        COALESCE(n_bi, 0) AS n_bi,
        COALESCE(n_oov, 0) AS n_oov,
        CASE WHEN n_scored > 0
          THEN ROUND(CAST(tot AS DOUBLE) / CAST(n_scored AS DOUBLE), 6)
          ELSE 0.0 END AS mean_nll,
        CASE WHEN n_scored > 0
          THEN CAST(FLOOR(CAST(tot AS DOUBLE) / CAST(n_scored AS DOUBLE)
            * 1000000.0) AS BIGINT) END AS anll_e6
      FROM doc d LEFT JOIN per ON d.doc_id = per.doc_id
      WHERE d.is_train = 0),
    tercile AS (
      SELECT doc_id,
        CASE WHEN rk * 3 <= ns THEN 'head'
             WHEN rk * 3 <= ns * 2 THEN 'middle'
             ELSE 'tail' END AS ppl_bucket
      FROM (
        SELECT doc_id,
          row_number() OVER (PARTITION BY source ORDER BY anll_e6, doc_id) AS rk,
          COUNT(*) OVER (PARTITION BY source) AS ns
        FROM base WHERE anll_e6 IS NOT NULL))
    SELECT b.doc_id, b.source, b.n_scored, b.n_tri, b.n_bi, b.n_oov,
      b.mean_nll, COALESCE(t.ppl_bucket, 'unscored') AS ppl_bucket
    FROM base b LEFT JOIN tercile t ON b.doc_id = t.doc_id
    ORDER BY b.doc_id"""
  }

  val tfidfKeywordsSql: String = s"""WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
      GROUP BY 1, 2),
    idf AS (
      SELECT tok, ROUND(ln((CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) + 1.0) /
        (CAST(COUNT(*) AS DOUBLE) + 1.0)), 9) AS idf
      FROM tf GROUP BY tok),
    scored AS (
      SELECT doc_id, tok, tf * idf AS score
      FROM tf JOIN idf USING (tok))
    SELECT doc_id, rk, keyword, ROUND(score, 6) AS score FROM (
      SELECT doc_id, tok AS keyword, score,
        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rk
      FROM scored)
    WHERE rk <= $KeywordsPerDoc ORDER BY doc_id, rk"""
}
