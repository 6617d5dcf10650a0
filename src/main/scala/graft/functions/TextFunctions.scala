package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column combinators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, shingling,
  * MinHash signatures, SimHash, and rolling-hash fingerprints.
  *
  * Everything here is pure `Column` composition over Spark built-ins
  * (split / transform / aggregate / zip_with / xxhash64) — no UDFs, so every
  * operator stays codegen-friendly and distributable: per-row work only,
  * no shuffle, scales linearly to 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokens. Mirrors the `\s+` split used by simple token
    * counting; leading whitespace yields an empty first token (same
    * semantics as DuckDB `string_split_regex`).
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of sentence/clause punctuation characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Ratio of punctuation chars to total chars (0 for empty text). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text))

  /** English-ish stopwords for quality scoring (public, standard list). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Number of tokens that are stopwords (codegen'd set-probe expression;
    * same semantics as `size(filter(tokens, isin))`).
    */
  def stopwordCount(text: Column): Column =
    graft.expressions.TokenExpressions.tokenSetCount(tokens(text), stopwords)

  /** Stopword ratio over tokens; the classic "natural language vs junk"
    * quality signal.
    */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(stopwordCount(text).cast("double") / n)
  }

  /** Composite heuristic quality score in [0,1]: rewards mid-length docs,
    * some punctuation, and a sane stopword ratio. Deterministic arithmetic
    * only, so it is DuckDB-oracle-expressible.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctScore = least(punctRatio(text) * 20.0, lit(1.0))
    graft.functions.ColumnFunctions.pround((lenScore + stopScore + punctScore) / 3.0, 4)
  }

  /** Marker stopwords per language for the lang-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "las"),
  )

  /** Language-ID by marker-stopword counting: argmax of per-language marker
    * hits, ties broken by list order (en first), `und` (undetermined) when
    * no marker appears at all. A real pipeline would swap in a trained
    * n-gram model; the *shape* (per-row scoring, no shuffle) is the point.
    */
  def langGuess(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> graft.expressions.TokenExpressions.tokenSetCount(toks, markers)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s === best && s > 0, lang).otherwise(elseCol)
    }
  }

  /** Word n-gram shingles: `["a b c", "b c d", ...]`. Docs shorter than n
    * tokens yield a single shingle of the whole doc. Codegen'd expression;
    * [[shinglesReference]] is the HOF twin for differential tests.
    */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.TokenExpressions.shingleArray(tokens(text), n)

  def shinglesReference(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) <= n, array(array_join(toks, " ")))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "),
        )
      )
  }

  /** MinHash signature: k independent permutations simulated as
    * xxhash64(seed_i, shingle); signature[i] = min over shingles.
    * Standard MinHash construction (Broder 1997); the per-band grouping for
    * LSH lives in [[graft.operators.Dedup]]. Delegates to the codegen'd
    * expression; [[minHashSignatureReference]] is the slow Column-built
    * twin used for differential testing.
    */
  def minHashSignature(shinglesCol: Column, k: Int): Column =
    graft.expressions.HashExpressions.minhashSignature(shinglesCol, k)

  /** Pure higher-order-function MinHash (interpreted — reference only). */
  def minHashSignatureReference(shinglesCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(i, s))),
    )

  /** Engine-portable MinHash signature: element i is the minimum over
    * shingles of the first 16 hex chars of `md5("<i>:" ++ shingle)` — a
    * fixed-width unsigned-64 order encoded as lowercase hex, so the
    * lexicographic `array_min` IS the numeric min. Any engine with md5 can
    * replay it bit-for-bit (the q45/q68 DuckDB oracles do); the xxhash64
    * codegen kernel ([[minHashSignature]]) stays the engine-native default
    * for production pipelines where cross-engine parity isn't needed.
    * Delegates to the codegen'd expression (the HOF twin below measured
    * ~18 s vs sub-second at sf0.1 — interpreted per element).
    */
  def minHashSignaturePortable(shinglesCol: Column, k: Int): Column =
    graft.expressions.HashExpressions.portableMinhashSignature(shinglesCol, k)

  /** Pure higher-order-function portable MinHash (interpreted — the
    * differential-test reference for the codegen kernel).
    */
  def minHashSignaturePortableReference(shinglesCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shinglesCol, s =>
        substring(md5(concat(lit(s"$i:"), s)), 1, 16)))
    }: _*)

  /** 64-bit SimHash (Charikar 2002) over whitespace tokens: per bit, sum
    * +1/−1 votes from each token's xxhash64; bit set iff the vote is
    * positive. Emitted as the signed Long whose bits are the fingerprint.
    * Delegates to the codegen'd expression (the HOF formulation measured
    * 137 s over 5k docs); [[simHash64Reference]] is the differential twin.
    */
  def simHash64(text: Column): Column =
    graft.expressions.HashExpressions.simhash64(tokens(text))

  /** Engine-portable SimHash64: same vote semantics, but the token hash is
    * the first 8 md5 bytes big-endian, so any engine replays the exact
    * fingerprint (the q46 DuckDB oracle does) — xxhash64 [[simHash64]]
    * stays the engine-native default.
    */
  def simHash64Portable(text: Column): Column =
    graft.expressions.HashExpressions.portableSimhash64(tokens(text))

  /** Pure higher-order-function SimHash (interpreted — reference only). */
  def simHash64Reference(text: Column): Column = {
    // Bit loops are unrolled Scala-side (shift amounts must be constants);
    // codegen subexpression elimination shares the per-token xxhash64.
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0), 64),
      (acc, t) => {
        val bitVotes = array((0 until 64).map { b =>
          when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1)
        }: _*)
        zip_with(acc, bitVotes, (a, v) => a + v)
      },
    )
    (0 until 64)
      .map(b => when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** PII scrubbing: masks emails, URLs, and phone-shaped digit runs with
    * typed placeholders — the standard pre-release redaction pass over a
    * training corpus. Order matters (URLs can contain '@'); pure
    * regexp_replace cascade, codegen'd, per-row only.
    */
  def scrubPii(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val noEmail = regexp_replace(noUrl, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>")
  }

  /** The mojibake sequences [[fixMojibake]] repairs: UTF-8 bytes of a
    * code point re-decoded as Latin-1/CP-1252 — the classic crawl
    * double-encoding artifact ("café" → "cafÃ©"). No entry is a prefix
    * of another and no replacement re-creates a later pattern, so the
    * cascade is order-insensitive and idempotent on clean text. */
  private[graft] val MojibakeMap: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä", "Ã¯" -> "ï",
    "Ã§" -> "ç", "â€™" -> "'", "â€œ" -> "\"", "â€“" -> "–", "â€”" -> "—",
    "Â°" -> "°", "Â½" -> "½", "Â«" -> "«", "Â»" -> "»")

  /** Mojibake repair: undo the most common UTF-8-as-Latin-1 double
    * decodes with a literal replace cascade — pure codegen'd per-row
    * string work, the encoding-hygiene pass a crawl corpus runs before
    * tokenization (mojibake splinters tokens and poisons n-gram stats).
    * Engine-replayable by construction: every step is a literal
    * (non-regex) replace.
    */
  def fixMojibake(text: Column): Column =
    MojibakeMap.foldLeft(text) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Duplicate-n-gram fraction (Rae et al. 2021 "repetition" quality
    * signal): 1 − |distinct n-grams| / |n-grams|; 0 for docs with a single
    * shingle. High values flag boilerplate/spam for curation filters.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    graft.functions.ColumnFunctions.pround(
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 4)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Winnowing-style document fingerprint: min hash over word w-gram
    * shingles — robust to reordering of far-apart content, cheap to
    * compare. Implemented as a 1-wide MinHash signature (codegen'd).
    */
  def fingerprint(text: Column, w: Int = 5): Column =
    element_at(minHashSignature(shingles(text, w), 1), 1)
}
