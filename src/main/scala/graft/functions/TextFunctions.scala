package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis building blocks for the training-data pipeline surface
  * (BASELINE.json north star): token counting, quality scoring, stopword /
  * language scoring, fingerprinting, and shingling. Everything is Spark
  * built-ins (codegen'd); no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (the documents corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-boundary token count: whitespace pieces plus intra-word
    * transitions (letter↔digit), approximating subword splits without a
    * vocab. Two capture-group passes instead of lookarounds so the same
    * regexes run under RE2 engines (DuckDB oracle parity).
    */
  def bpeishTokenCount(text: Column): Column = {
    val p1 = regexp_replace(text, "([a-zA-Z])([0-9])", "$1 $2")
    val p2 = regexp_replace(p1, "([0-9])([a-zA-Z])", "$1 $2")
    size(split(p2, " ")).cast("long")
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Count of tokens inside a fixed stopword list — lambda-filtered, stays
    * inside codegen.
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*))).cast("long")

  /** Punctuation-character count (quality-scoring ingredient). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("long")

  /** Composite quality score in [0,1]: shorter-than-minimum docs and
    * stopword-free docs are penalized; all-double IEEE arithmetic.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val uniq = uniqueTokenCount(text).cast("double")
    val sw = stopwordCount(text, stopwords).cast("double")
    val lengthTerm = least(n / lit(50.0), lit(1.0))          // saturating length credit
    val diversityTerm = uniq / greatest(n, lit(1.0))         // vocabulary diversity
    val stopwordTerm = least(sw / greatest(n, lit(1.0)) * lit(10.0), lit(1.0))
    (lengthTerm * lit(0.4) + diversityTerm * lit(0.4) + stopwordTerm * lit(0.2))
  }

  /** HTML → visible text: drop script/style subtrees and comments, strip
    * tags, decode the five core entities, normalize whitespace. A chain
    * of codegen'd `regexp_replace`/`replace` calls — no UDF — and every
    * pattern is RE2-compatible (no lookarounds), so an oracle can mirror
    * it verbatim. The boilerplate-strip step of a web-corpus pipeline
    * (payload of [[graft.operators.Warc]] response records).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Content fingerprint: md5 (cross-engine-stable hex). A rolling-hash
    * variant lives in [[rollingFingerprint]] for locality-sensitive use.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Cross-engine 60-bit hash: the first 15 hex chars of the md5 digest as
    * a non-negative long. Exactly reproducible in DuckDB as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`, which is what makes the
    * hash-seeded operators (SimHash, hyperplane LSH) DuckDB-oracle-able —
    * xxhash64 has no DuckDB twin. 15 hex chars (60 bits) keeps the value
    * clear of the sign bit in both engines; quality is md5's.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash over tokens (base 1000003, explicitly reduced
    * mod the Mersenne prime 2^31-1 each step): sensitive to token order,
    * built from `aggregate` so it stays an expression. The explicit pmod
    * keeps every intermediate below 2^52 — ANSI-mode safe (silent long
    * wraparound would throw ARITHMETIC_OVERFLOW under Spark 4's default
    * ANSI dialect).
    */
  def rollingFingerprint(text: Column): Column = {
    val p = 2147483647L // 2^31 - 1
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  /** Per-language stopword vote scores; the language with the max vote (ties
    * broken by list order) is the n-gram-heuristic language id.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "de"),
    "es" -> Seq("el", "la", "los", "y", "de"),
    "zh" -> Seq("de", "le", "he", "shi", "zai"),
  )

  def langScore(text: Column, lang: String): Column =
    stopwordCount(text, langStopwords.toMap.apply(lang))

  /** Argmax language by stopword votes with deterministic tie-break (first
    * in langStopwords order wins; 'und' default when all-zero).
    */
  def langId(text: Column): Column = {
    val scored = langStopwords.map { case (l, sw) => (l, stopwordCount(text, sw)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** PII redaction for training corpora: emails then phone-like digit runs
    * replaced by typed placeholders. Both patterns are RE2-safe (plain
    * char classes, no lookarounds) so the same regex text runs identically
    * under Java regex and DuckDB/RE2 — oracle parity by construction.
    */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe: String = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")

  /** Canonical URL form for web-corpus dedup — the normalization every
    * crawl pipeline applies before URL-level dedup so trivially-different
    * spellings of one resource collapse:
    *  - scheme and host lowercased; leading `www.` dropped;
    *  - default ports stripped (`:443` under https, `:80` under http);
    *  - fragment dropped (client-side only, never a distinct resource);
    *  - tracking query params removed (`utm_*`, `ref`), the survivors
    *    SORTED (param order is not semantic) and re-joined;
    *  - trailing slashes trimmed from the path (root stays `/`; an empty
    *    path becomes `/`).
    * Built-ins only (regexp + higher-order array functions — codegen'd,
    * no UDF), RE2-safe regex text (no lookarounds) so the same patterns
    * run identically in DuckDB — oracle parity by construction.
    */
  /** Canonical HOST alone (the registrable-domain-ish aggregation key for
    * per-domain corpus stats and blocklists): lowercased, `www.`-stripped,
    * default-port-stripped — the host component of [[canonicalizeUrl]],
    * shared regex text so the two can never drift.
    */
  def canonicalHost(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(afterScheme, "^([^/?]*)", 1))
    val hostNoWww = regexp_replace(hostPort, "^www\\.", "")
    when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .otherwise(hostNoWww)
  }

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(afterScheme, "^([^/?]*)", 1))
    val hostNoWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .otherwise(hostNoWww)
    val rawPath = regexp_extract(afterScheme, "^[^/?]*([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)$", 1)
    val params = filter(split(rawQuery, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=") && p =!= "ref")
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Distinct token n-gram shingles per document. Returns
    * (idCol, shingle) rows.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1)
    // LOCAL array expansion: each document's n-grams come straight from
    // its own token array (slice per starting position, like the q127
    // skip-gram expansion) — no posexplode + per-doc lead() window, which
    // cost a full shuffle of the token stream per call and dominated every
    // shingle consumer (q29/q30/q31/q49/q65/q125, the benches' heaviest
    // family). Only complete n-grams survive: start positions stop at
    // size − (n−1). The per-doc dedup stays a GLOBAL `.distinct()` on
    // purpose: a round-10 A/B replaced it with `array_distinct` on the
    // local string array to save the shuffle, and the full bench showed
    // string consumers 2-7.7× SLOWER (q91/q81/q69/q49) — ArrayDistinct
    // only has a hash fast path for primitive element types; on strings
    // it degrades to pairwise comparison, and the removed exchange had
    // also been the implicit materialization multi-consumer plans reused.
    // The hashed twin [[shingleHashes]] (long elements → fast path) is
    // where the shuffle-free form pays off.
    df.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), explode(expr(
        s"transform(slice(t, 1, greatest(size(t) - ${n - 1}, 0)), " +
          s"(x, i) -> concat_ws(' ', slice(t, i + 1, $n)))")).as("shingle"))
      .distinct()
  }

  /** Distinct per-document shingle HASHES (idCol, h: bigint) — [[shingles]]
    * with each n-gram replaced by its xxhash64 BEFORE the local distinct
    * and the explode. Every downstream shuffle, cache, and equi-join then
    * moves 8-byte longs instead of n-gram strings (the dedup family's
    * dominant data volume), and the signature permutations consume the
    * same hash they would have computed anyway. Set semantics are
    * preserved up to 64-bit collisions inside one document's shingle set
    * (probability ~len²·2⁻⁶⁴ — negligible against corpus-scale work; the
    * q29 exact-Jaccard oracle anchor keeps the string path).
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1)
    df.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(slice(t, 1, greatest(size(t) - ${n - 1}, 0)), " +
          s"(x, i) -> xxhash64(concat_ws(' ', slice(t, i + 1, $n))))"))).as("h"))
  }

  /** [[shingles]] keeping the 0-based start position and duplicates —
    * the ordered n-gram stream winnowing selects from (position is the
    * tie-breaker and the window axis, so neither may be collapsed).
    */
  def shinglesWithPos(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1)
    df.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), posexplode(expr(
        s"transform(slice(t, 1, greatest(size(t) - ${n - 1}, 0)), " +
          s"(x, i) -> concat_ws(' ', slice(t, i + 1, $n)))")))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "shingle")
  }
}
