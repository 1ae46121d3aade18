package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All pure `Column` compositions over built-in functions — no UDFs — so
  * every operator stays inside whole-stage codegen and distributes with the
  * scan. Each primitive is designed to be exactly reproducible in ANSI-ish
  * SQL (the DuckDB oracle): integer arithmetic where possible, explicit
  * fold orders where not.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def wsTokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  def wsTokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish tokens: word runs or single non-space punctuation — the classic
    * pre-tokenizer shape. Same regex is RE2/Java-compatible for ASCII. */
  val BpeTokenRegex = "\\w+|[^\\w\\s]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenRegex), lit(0)))

  /** Share of characters that are ASCII letters (double in [0,1]). */
  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Share of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Share of whitespace tokens found in `words` (lowercased match). */
  def wordSetRatio(c: Column, words: Seq[String]): Column =
    size(filter(wsTokens(lower(c)), t => t.isin(words.map(lit): _*))).cast("double") /
      greatest(size(wsTokens(c)), lit(1)).cast("double")

  /** One-pass token counts against several word sets:
    * `[total, |tokens ∩ set_0|, ...]` (fused native kernel — the composed
    * per-set tokenize/filter passes dominated the curation gate at 20×).
    * Bit-identical to the composed counts (TokenSetCountsSpec). */
  def tokenSetCounts(c: Column, sets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.TokenSetCounts(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), sets))

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Heuristic document quality score in [0,1]: rewards alphabetic content
    * and a natural stopword rate, penalizes punctuation soup. Fixed double
    * expression — identical operation order in the SQL oracle. The
    * stopword ratio reads the fused [[tokenSetCounts]] kernel (same
    * integer counts, same cast/divide shape as the composed
    * [[wordSetRatio]] — bit-identical doubles); [[qualityScoreComposed]]
    * is the specced baseline. */
  def qualityScore(c: Column): Column = {
    val counts = tokenSetCounts(c, Seq(StopwordsEn))
    val stop = element_at(counts, 2).cast("double") /
      greatest(element_at(counts, 1), lit(1)).cast("double")
    qualityFormula(alphaRatio(c), punctRatio(c), stop)
  }

  /** Composed-Column quality score — the spec baseline for the fused
    * stopword counting in [[qualityScore]]. */
  private[graft] def qualityScoreComposed(c: Column): Column =
    qualityFormula(alphaRatio(c), punctRatio(c), wordSetRatio(c, StopwordsEn))

  private def qualityFormula(alpha: Column, punct: Column, stop: Column): Column =
    lit(0.5) * alpha +
      lit(0.3) * least(stop * lit(5.0), lit(1.0)) +
      lit(0.2) * (lit(1.0) - least(punct * lit(10.0), lit(1.0)))

  /** Small per-language marker-word profiles for n-gram-free language ID.
    * Order is the deterministic tie-break priority. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "que", "por", "una"),
    "fr" -> Seq("le", "la", "les", "est", "et", "que", "pour", "dans"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo", "you", "he", "bu")
  )

  /** Count of tokens matching a language profile. */
  def langScore(c: Column, lang: String): Column = {
    val words = LangProfiles.toMap.apply(lang)
    size(filter(wsTokens(lower(c)), t => t.isin(words.map(lit): _*)))
  }

  /** Argmax language over the profiles, first-profile-wins on ties —
    * expressed as a `when` chain so the SQL oracle is a literal CASE. All
    * five profile counts come from ONE [[tokenSetCounts]] pass (the
    * composed form re-tokenized the document per language);
    * [[langIdComposed]] is the specced baseline. */
  def langId(c: Column): Column = {
    val counts = tokenSetCounts(c, LangProfiles.map(_._2))
    langArgmax(LangProfiles.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(counts, i + 2)
    })
  }

  /** Composed-Column language ID — the spec baseline for the fused
    * counting in [[langId]]. */
  private[graft] def langIdComposed(c: Column): Column =
    langArgmax(LangProfiles.map { case (l, _) => l -> langScore(c, l) })

  // CASE WHEN s0 >= s1 AND s0 >= s2 ... THEN l0 WHEN s1 >= s2 ... ELSE last
  private def langArgmax(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.reverse.foldLeft(lit(scores.last._1)) {
      case (els, ((l, s), i)) =>
        val later = scores.drop(i + 1)
        if (later.isEmpty) els
        else when(later.map { case (_, s2) => s >= s2 }.reduce(_ && _), lit(l))
          .otherwise(els)
    }

  /** Karp–Rabin rolling hash of the whole string: polynomial fold
    * `h = h*257 + code(char) mod 1e9+7`, seeded with the first character —
    * a "fold from first element" so engines without fold-initial-value
    * (DuckDB 1.0 `list_reduce`) can reproduce it exactly. Pure integer
    * arithmetic: bit-identical across engines. Fused native expression
    * (one pass over the bytes — the composed form allocates a string per
    * character); [[fingerprintComposed]] is the specced baseline. */
  def fingerprint(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.RollingFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Composed-Column fingerprint — the spec baseline for the native kernel. */
  private[graft] def fingerprintComposed(c: Column): Column = {
    val codes = transform(split(c, ""), ch => ascii(ch).cast("bigint"))
    when(length(c) === lit(0), lit(0L))
      .otherwise(
        aggregate(
          slice(codes, lit(2), greatest(size(codes) - lit(1), lit(0))),
          element_at(codes, 1),
          (acc, x) => pmod(acc * lit(257L) + x, lit(1000000007L))
        ))
  }

  /** Overlapping token chunks — the standard long-document split for
    * training/RAG pipelines. Chunk i covers tokens
    * `[i*(chunkSize-overlap), i*(chunkSize-overlap)+chunkSize)`; the last
    * chunk may be short; documents shorter than one chunk yield exactly
    * one. Pure integer arithmetic → reproducible in the SQL oracle.
    * Returns array<struct<idx int, chunk string, n_tokens int>>. */
  def tokenChunks(c: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = wsTokens(c)
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise((n - lit(chunkSize) + lit(step) - 1) / lit(step) + 1)
      .cast("int")
    transform(sequence(lit(0), nChunks - 1), i => {
      val piece = slice(toks, i * step + 1, lit(chunkSize))
      struct(i.cast("int").as("idx"),
        concat_ws(" ", piece).as("chunk"),
        size(piece).as("n_tokens"))
    })
  }

  /** PII/URL redaction patterns — written to the common Java-regex/RE2
    * subset so the SQL oracle's `regexp_replace` matches byte-for-byte. */
  val UrlRegex = raw"https?://[^\s]+"
  val EmailRegex = raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
  val PhoneRegex = raw"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

  /** Canonical text normalization for dedup keys: lowercase, collapse
    * whitespace runs to single spaces, then trim — so case and formatting
    * variants of the same content hash identically before exact dedup.
    * Collapse happens BEFORE trim: `trim` strips only the space character,
    * so a trailing tab would otherwise survive as a trailing space.
    * (Unicode NFC normalization would need a JVM Normalizer call — a UDF —
    * and is deliberately left to ingest; this stays a codegen'd Column.) */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Redact URLs, then emails, then phone-shaped numbers (order matters:
    * URLs can contain '@'). The pre-training scrub every public-web corpus
    * runs before anything else sees the text. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRegex, "<URL>"),
        EmailRegex, "<EMAIL>"),
      PhoneRegex, "<PHONE>")

  /** Per-group Misra–Gries frequent items (r15): at most `k` counters
    * per group no matter the group size — each map task combines its
    * partition into a bounded buffer before the exchange, so the token
    * stream itself never shuffles (an exact `groupBy(term).count()` over
    * a web-scale vocabulary does). Returns
    * `array<struct<term, count>>` sorted (count desc, term asc); counts
    * are lower bounds within totalWeight/(k+1) and EXACT when the group
    * has ≤ k distinct terms — the oracle regime
    * ([[graft.functions.expressions.MisraGries]]). */
  def heavyHitters(term: Column, weight: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.MisraGries(
        org.apache.spark.sql.graft.ColumnBridge.expression(term),
        org.apache.spark.sql.graft.ColumnBridge.expression(weight), k)
        .toAggregateExpression())

  /** Duplicate word-n-gram fraction — the Gopher-style repetition signal:
    * 1 - distinct/total over the document's n-grams (0.0 when fewer than
    * one n-gram). High values flag boilerplate/looping text. Integer
    * counts + one fixed-order division → oracle-exact. Fused native
    * kernel (the composed gram building dominated the round-2 bench);
    * [[duplicateNgramFractionComposed]] is the specced baseline. */
  def duplicateNgramFraction(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.DuplicateNgramFraction(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Composed-Column baseline for the native repetition kernel. */
  private[graft] def duplicateNgramFractionComposed(c: Column, n: Int): Column = {
    val toks = wsTokens(c)
    val total = greatest(size(toks) - lit(n - 1), lit(0))
    val grams = when(total <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), total - 1),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") / total.cast("double"))
  }

  /** Distinct character k-shingles (the MinHash input unit). */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) < lit(k), array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(1), length(c) - lit(k) + lit(1)),
            i => c.substr(i, lit(k))
          )))

  /** Query parameters stripped before URL-level dedup: tracking junk that
    * makes one page look like a thousand. */
  val TrackingParams: Seq[String] =
    Seq("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "ref_")

  private val UrlPartsRegex =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Canonical URL for URL-level dedup (the crawl-frontier stage that runs
    * BEFORE content is ever fetched): lowercase scheme and host, drop
    * default ports and fragments, remove tracking parameters, sort the
    * surviving query parameters so argument order doesn't split identical
    * pages. Non-URLs canonicalize to null. Composed regexp/array
    * functions — codegen'd, no UDF. */
  def canonicalizeUrl(c: Column): Column = {
    def part(i: Int): Column = regexp_extract(c, UrlPartsRegex, i)
    val scheme = lower(part(1))
    val host = lower(part(2))
    val port = part(3)
    val keptPort = when(
      port === "" ||
        (scheme === "http" && port === ":80") ||
        (scheme === "https" && port === ":443"), "")
      .otherwise(port)
    val path = when(part(4) === "", "/").otherwise(part(4))
    val rawQuery = part(5)
    val kept = array_sort(filter(
      split(regexp_replace(rawQuery, "^\\?", ""), "&"),
      p => p =!= "" && !TrackingParams
        .map(t => p.startsWith(t)).reduce(_ || _)))
    val query = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise("")
    when(part(1) === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, keptPort, path, query))
  }

  // ------------------------------------------------------------------ HTML

  /** Invisible containers removed wholesale before any text is measured:
    * the whole `<head>` (title/meta/style/script live there), plus inline
    * `<script>`/`<style>`/`<noscript>`/`<template>` bodies and comments.
    * Lazy `.*?` under `(?s)` survives `<`, `>` and quoted markup INSIDE a
    * script body (`track("<body>")`, `if (a > b)`). */
  private val HtmlDropRegex =
    "(?is)<head\\b.*?</head>|<script\\b[^>]*>.*?</script>" +
      "|<style\\b[^>]*>.*?</style>|<noscript\\b[^>]*>.*?</noscript>" +
      "|<template\\b[^>]*>.*?</template>|<!--.*?-->"

  /** Block-level boundaries: each open OR close tag of a block element
    * starts a new text block. Inline markup (`a b i em span strong code`)
    * stays inside its block so link density is measured per block. */
  private val HtmlBlockTagRegex =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th" +
      "|br|hr|body|html|header|footer|nav|section|article|aside|main|figure" +
      "|figcaption|blockquote|pre|form|fieldset|address)\\b[^>]*>"

  private val HtmlAnchorRegex = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Visible text of one block: tags stripped to spaces, `&nbsp;` made a
    * real space BEFORE the whitespace collapse (so runs of nbsp don't
    * survive as doubles), collapsed, trimmed. Other entities stay escaped
    * here — density is measured on this form; [[htmlUnescape]] runs once
    * on kept blocks. */
  private def htmlBlockText(b: Column): Column =
    trim(regexp_replace(
      replace(regexp_replace(b, "<[^>]*>", " "), lit("&nbsp;"), lit(" ")),
      "\\s+", " "))

  /** The five named entities a text-extraction pass must restore
    * (`&nbsp;` is handled earlier, see [[htmlBlockText]]); `&amp;` LAST so
    * a double-escape (`&amp;lt;`) unescapes exactly one level. */
  def htmlUnescape(c: Column): Column =
    replace(
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")
        .foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) },
      lit("&amp;"), lit("&"))

  /** HTML main-content extraction — the curation stage every real crawl
    * pipeline runs BEFORE language-ID / quality scoring (the
    * trafilatura/jusText slot in FineWeb/RefinedWeb-style pipelines;
    * Kohlschütter et al., WSDM 2010 showed shallow per-block text/link
    * densities recover main content competitively). The reference
    * (iangow/db2pq) starts at clean relational text and has no analog;
    * raw crawl data doesn't.
    *
    * Shape: (1) drop invisible containers ([[HtmlDropRegex]]);
    * (2) split on block-level tag boundaries ([[HtmlBlockTagRegex]]);
    * (3) per block, measure visible text and anchor-text lengths;
    * (4) keep blocks with ≥ `minChars` visible chars AND link density
    * `anchor_chars/text_chars` ≤ `maxLinkPermille`/1000 (integer
    * cross-multiplication, no division) — kills nav bars, footers and
    * "related links" lists while keeping prose; (5) unescape entities and
    * join kept blocks with `\n`.
    *
    * Pure composed Catalyst ops (regexp/split/filter/transform/
    * array_join) — a map-only, whole-stage-codegen projection with ZERO
    * shuffle, so it rides the scan at 100 TB like any per-row function.
    * Null html → null. Known limits (shared with every regex-level
    * extractor): a literal `>` inside a quoted tag attribute truncates
    * that tag early; malformed/unclosed markup degrades to keeping the
    * raw text rather than dropping content. Headings shorter than
    * `minChars` are dropped with the boilerplate — callers who want them
    * lower `minChars` per-call. */
  def htmlExtract(
      html: Column, minChars: Int = 25, maxLinkPermille: Int = 333): Column = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"maxLinkPermille must be in [0, 1000], got $maxLinkPermille")
    val blocks = split(regexp_replace(html, HtmlDropRegex, " "), HtmlBlockTagRegex)
    val kept = filter(blocks, { b =>
      val t = htmlBlockText(b)
      val a = htmlBlockText(
        array_join(regexp_extract_all(b, lit(HtmlAnchorRegex), lit(1)), " "))
      length(t) >= lit(minChars) &&
        length(a) * lit(1000) <= lit(maxLinkPermille) * length(t)
    })
    array_join(transform(kept, b => htmlUnescape(htmlBlockText(b))), "\n")
  }
}
