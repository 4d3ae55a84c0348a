package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines.
  *
  * Everything here composes `org.apache.spark.sql.functions` (codegen'd,
  * whole-stage-compatible) — no Scala UDFs on the hot path. Higher-order
  * functions (`transform`/`filter`/`aggregate`) keep per-document work
  * inside Tungsten rows, so these scale linearly with corpus bytes.
  */
object TextFunctions {

  /** Whitespace tokens of a (trimmed) text column. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count by whitespace splitting. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenization count: runs of letters, runs of digits, or a
    * single other non-space character (the classic GPT-style pre-token
    * regex family, simplified to a RE2/Java-compatible core). */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(c: Column): Column = size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** URL occurrences (http/https) — the Java-regex ∩ RE2 subset, so an
    * oracle can run the identical pattern. */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\\s]*)?"
  def urls(c: Column): Column = regexp_extract_all(c, lit(UrlPattern), lit(0))

  /** Canonical URL for web-corpus dedup (the crawl-pipeline convention:
    * the same page under tracking params / default ports / trailing
    * slashes must collapse to one key): lowercase scheme and host,
    * strip a default :80/:443 port, drop the #fragment, remove `utm_*`
    * tracking params, strip one trailing slash. Pure codegen'd
    * regex/string ops; every pattern avoids replacement group refs so
    * Java and RE2 engines agree byte-for-byte. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^(https?)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(noFrag, "^https?://([^/?#]+)", 1)), ":(80|443)$", "")
    val rest = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_extract(noFrag, "^https?://[^/?#]+(.*)$", 1),
          "utm_[A-Za-z_]+=[^&]*&?", ""),
        "[?&]$", ""),
      "/$", "")
    concat(scheme, lit("://"), host, rest)
  }

  /** Approximate registered domain: the last two host labels (a public-
    * suffix list would refine multi-label TLDs; declared approximation). */
  def urlDomain(u: Column): Column =
    regexp_extract(
      lower(regexp_extract(u, "^https?://([^/?#]+)", 1)),
      "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)(?::[0-9]+)?$", 1)

  /** Fraction of tokens found in `words`. */
  def stopwordRatio(c: Column, words: Seq[String]): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(words))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Fraction of characters that are POSIX punctuation. */
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / length(c))
      .otherwise(lit(0.0))

  /** Mean token length (characters, whitespace removed / token count). */
  def avgTokenLength(c: Column): Column = {
    val n = tokenCount(c)
    when(n > 0, (length(c) - (n - 1)).cast("double") / n).otherwise(lit(0.0))
  }

  /** Gopher-style quality-rule predicate (Rae et al. 2021 §A1.1, the
    * rule family every LLM-corpus pipeline applies before training):
    * token-count window, mean-token-length window, symbol/punctuation
    * ceiling, and a minimum stop-word presence (a proxy for "is actual
    * prose"). One codegen'd boolean column — filters push to the scan. */
  def qualityRules(text: Column,
                   minTokens: Int = 50, maxTokens: Int = 100000,
                   minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
                   maxPunctRatio: Double = 0.2,
                   minStopwordHits: Int = 2): Column = {
    val st = qualityStats(text)
    st.getField("n_tokens").between(minTokens, maxTokens) &&
      st.getField("avg_token_len").between(minAvgTokenLen, maxAvgTokenLen) &&
      st.getField("punct_ratio") <= maxPunctRatio &&
      st.getField("stop_hits") >= minStopwordHits
  }

  /** All five quality metrics + stop-hit count as ONE single-pass native
    * struct ([[QualityStats]]) — one tokenization and one character scan
    * instead of the `split`/`filter`/`regexp_replace` composition
    * re-tokenizing per metric. Fields: `len`, `n_tokens`,
    * `avg_token_len`, `stop_ratio`, `punct_ratio`, `stop_hits`;
    * bit-identical to the builtins (spec-checked). */
  def qualityStats(text: Column,
                   words: Seq[String] = LangProfiles.toMap.apply("en")): Column =
    QualityStats.col(text, words)

  /** PII redaction: emails, phone-number-looking digit runs and IPv4
    * addresses replaced with typed placeholder tokens. Patterns stay in
    * the Java-regex ∩ RE2 subset (no lookaround), so the same strings
    * drive Spark and any RE2-based engine identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9][0-9 ()-]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Fused redact + counts (r15): struct(red, n_email, n_ip) from ONE
    * native expression ([[graft.functions.PiiScan]]'s hand-rolled
    * scans) — `red` is exactly [[redactPii]]'s sequential chain,
    * `n_email`/`n_ip` count the patterns on the ORIGINAL text
    * (bit-equality with the builtin chain is spec-pinned). */
  def redactPiiStats(text: Column): Column =
    graft.functions.PiiScan.redactStatsCol(text)

  /** Bind an expensive array expression to a lambda variable so the body
    * reads it as a variable instead of re-evaluating it per element —
    * interpreted higher-order lambdas re-evaluate every subexpression of
    * the body for each element, so an embedded `split()` turns O(n) work
    * into O(n^2). `transform` over a 1-element wrapper array evaluates
    * `value` exactly once per row. */
  private def bindOnce(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Distinct hashed word k-gram shingles (the MinHash input). Documents
    * shorter than `k` words contribute a single whole-text shingle.
    * Native one-loop expression ([[ShingleHashes]]); [[wordShinglesHof]]
    * is the builtin composition it replaces (bit-identical,
    * spec-checked). */
  def wordShingles(c: Column, k: Int): Column =
    ShingleHashes.shingles(tokens(c), k)

  /** The higher-order-function formulation [[ShingleHashes]] replaces;
    * kept as the spec's bit-identity cross-check. */
  def wordShinglesHof(c: Column, k: Int): Column =
    bindOnce(tokens(c)) { toks =>
      val n = size(toks)
      array_distinct(
        when(n >= k,
          transform(sequence(lit(1), n - (k - 1)),
            i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
        .otherwise(array(xxhash64(concat_ws(" ", toks)))))
    }

  /** Distinct hashed character k-gram shingles — native
    * ([[CharShingleHashes]]); [[charShinglesHof]] is the builtin
    * cross-check. */
  def charShingles(c: Column, k: Int): Column =
    CharShingleHashes.shingles(c, k)

  /** The higher-order-function formulation [[CharShingleHashes]]
    * replaces. */
  def charShinglesHof(c: Column, k: Int): Column = {
    val n = length(c)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - (k - 1)), i => xxhash64(c.substr(i, lit(k)))))
      .otherwise(array(xxhash64(c))))
  }

  // --- language identification (n-gram/stopword heuristic) ----------

  /** Tiny per-language signature profiles (function words + charset).
    * Heuristic in the spirit of n-gram profiles (Cavnar & Trenkle 1994),
    * kept deliberately small; scores are stopword-hit counts, CJK matches
    * short-circuit to zh. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "dans", "pour"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "es", "en", "que", "por"),
  )

  /** Predicted language code for a text column. */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  /** 64-bit FNV-1a fingerprint of the normalized (lowercased,
    * whitespace-collapsed) document — a content fingerprint for
    * byte-level dedup and provenance tracking. Backed by a custom
    * Catalyst expression with codegen ([[Fnv1a64]]). */
  def fingerprint(c: Column): Column =
    Fnv1a64.fingerprint(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** HTML/markup STRIP to visible text (C53): drops `<script>`/`<style>`
    * blocks and comments wholesale, removes every remaining tag, decodes
    * the five predefined character entities (`&lt; &gt; &quot; &#39;
    * &amp;` — `&amp;` LAST, so `&amp;lt;` correctly decodes to the
    * literal text `&lt;` instead of double-decoding), collapses
    * whitespace. The regex-grade extractor of the C4/CCNet web-corpus
    * preprocessing stage — deliberately NOT a spec-complete HTML parser
    * (CDATA, conditional comments, malformed nesting degrade gracefully
    * to text); a parser would be a per-row UDF, this is a chain of
    * codegen'd builtins that never leaves whole-stage codegen. Every
    * pattern is written in the RE2-compatible subset (inline `(?is)`
    * flags, lazy quantifiers, no backrefs) so an external engine can
    * replay the transformation exactly. */
  def stripMarkup(c: Column): Column = {
    val noBlock = regexp_replace(c,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
    val noComment = regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTag) { case (acc, (ent, ch)) => regexp_replace(acc, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
