package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Text/token column functions.
  *
  * The reference's UDF surface (SURVEY.md §2.6) dissolves almost entirely
  * into codegen'd built-ins; the one survivor is the multiset
  * common-word count (reference Predictor.scala:68-75, `Seq.intersect`
  * multiplicity semantics — `size(array_intersect)` is set-semantics and
  * NOT equivalent, SURVEY.md Q5). We expose both, named so callers can
  * never grab "whichever".
  */
object TextOps {

  /** Multiset intersection size — faithful to reference Predictor.scala:73
    * (`Seq.intersect` preserves duplicate multiplicity); null-safe → 0
    * (reference :69-71). Scala UDF: correct first; promote to a codegen
    * Expression only if benchmarks show the UDF boundary dominating. */
  val commonWordsMultiset: UserDefinedFunction =
    udf((a: Seq[String], b: Seq[String]) =>
      if (a == null || b == null) 0 else a.intersect(b).size)

  /** Set-semantics twin (distinct common tokens) — pure built-ins,
    * codegen'd, oracle-expressible (DuckDB list_intersect). */
  def commonWordsSet(a: Column, b: Column): Column =
    size(array_intersect(a, b))

  /** Tokenizer M1 equivalent: lowercase + split on whitespace runs. */
  def tokenize(c: Column): Column = split(lower(c), "\\s+")

  /** Stopword removal M2 equivalent as a higher-order filter (codegen'd;
    * no ml.feature.StopWordsRemover transformer round-trip needed). */
  def removeStopwords(c: Column, stopwords: Seq[String]): Column =
    filter(c, t => !t.isInCollection(stopwords))

  /** Year-difference feature F1 (reference Predictor.scala:41-43) as a
    * built-in expression. ANSI-safe: try_cast nulls malformed years
    * instead of throwing (Spark 4 default would throw; the reference's
    * Spark 2.4 primitive UDF silently coerced null→0 — we propagate null
    * and let callers fill explicitly, SURVEY.md §2.6 F1). */
  def yearDiff(a: Column, b: Column): Column =
    abs(a.try_cast("int") - b.try_cast("int"))

  /** Same-journal feature F2 (reference Predictor.scala:52-59). Note the
    * reference counts two ""-filled (missing) journals as "same"; kept for
    * fidelity (SURVEY.md Q3) — callers can pre-filter empties. */
  def sameJournal(a: Column, b: Column): Column =
    when(a === b, 1).otherwise(0)

  /** Let-binding for array-valued expressions: evaluates `value` exactly
    * once per row and passes it to `f` as a lambda variable, however many
    * times `f`'s body references it. Shape: flatten(transform(array(e),
    * x -> f(x))) — HOF *array arguments* are evaluated once, while an
    * expression aliased in a projection gets inlined into every use site
    * by CollapseProject (even across repartition) and re-evaluated per
    * reference (or worse, per element inside another lambda). Catalyst has
    * no beta-reduction rule, so the binding survives optimization. */
  def bindOnce(value: Column)(f: Column => Column): Column =
    flatten(transform(array(value), f))

  /** bindOnce twin for scalar-valued `f` bodies. */
  def bindOnceScalar(value: Column)(f: Column => Column): Column =
    element_at(transform(array(value), f), 1)

  /** Word n-gram shingles ([] below n tokens).
    *
    * zip_with-chain formulation: the j-th of n length-aligned slices is
    * zipped in with a space-concat. Array arguments of zip_with/slice are
    * evaluated once per row — the previous transform(sequence(1, L),
    * i -> element_at(tokens, i+j)) shape re-evaluated `tokens` per
    * *element* when CollapseProject inlined a computed token array
    * (O(tokens²) interpreted regex splits; measured ~100× on the documents
    * corpus — see TextAnalysis.bigramShingles scaladoc). The whole body is
    * wrapped in bindOnce so even the n slice references share one
    * evaluation of `tokens`. */
  def shingles(tokens: Column, n: Int): Column =
    if (n <= 1) tokens
    else bindOnce(tokens) { t =>
      when(size(t) < n, array().cast("array<string>"))
        .otherwise {
          val len = size(t) - (n - 1)
          (0 until n).map(j => slice(t, lit(j + 1), len))
            .reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
        }
    }

  /** Approximate token count for a BPE-ish budget: whitespace tokens
    * further split at letter/digit/punctuation boundaries, the shape a
    * byte-pair tokenizer's pretoken pass produces. */
  def tokenCountBpeIsh(text: Column): Column =
    size(filter(split(text,
      "(\\s+|(?<=[\\p{L}])(?=[\\p{N}])|(?<=[\\p{N}])(?=[\\p{L}])|(?<=[\\p{L}\\p{N}])(?=[\\p{P}])|(?<=[\\p{P}])(?=[\\p{L}\\p{N}]))"),
      t => t =!= ""))

  /** Polynomial rolling-hash document fingerprint over tokens (order-
    * sensitive, unlike md5-of-text it survives whitespace normalization
    * if callers tokenize first). 64-bit, deterministic. */
  def rollingHash(tokens: Column): Column =
    aggregate(tokens, lit(1125899906842597L),
      (acc, t) => acc * lit(31L) + crc32(t).cast("long"))

  /** Character-trigram profile language scorer: fraction of the doc's
    * trigrams found in the language's profile set. Deterministic,
    * data-independent (profiles passed by caller). */
  def trigramScore(text: Column, profile: Seq[String]): Column = {
    val t = lower(text)
    val tri = transform(sequence(lit(1), greatest(length(t) - 2, lit(0))),
      i => t.substr(i, lit(3)))
    size(filter(tri, g => g.isInCollection(profile))).cast("double") /
      greatest(size(tri), lit(1)).cast("double")
  }

  /** PII patterns for pre-training scrubbing (the ROOTS/Dolma-style redact
    * step). Written in the Java-regex ∩ RE2 dialect — character classes,
    * `\b`/`\d`, bounded repetition only (no backrefs, no lookaround) — so
    * a DuckDB oracle running the identical pattern strings byte-matches
    * the scrub. Order matters and is fixed: email first (its local part
    * can contain digit runs a later pattern would bite into), then phone,
    * then IPv4 (dashes vs dots keep phone/IP disjoint). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b"                      -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** Redact all `piiPatterns` from a text column (codegen'd
    * regexp_replace chain — one pass per pattern, no UDF). */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
}
