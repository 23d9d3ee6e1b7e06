package pipeline.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-deterministic primitives.
 *
 * Everything here is chosen so the exact same value is computable in ANSI
 * SQL on another engine (the DuckDB oracle): md5 is bit-stable everywhere,
 * 32-bit values never overflow BIGINT arithmetic, and float→double widening
 * is IEEE-exact. Spark-native hashes (xxhash64/murmur) are NOT portable and
 * are only used for physical concerns (salting), never for results.
 */
object Portable {

  /** 2^31-1, Mersenne prime — modulus for all portable hash arithmetic. */
  val P: Long = 2147483647L

  /** Portable 32-bit hash: first 8 hex chars of md5, as a non-negative long.
    * DuckDB mirror: `CAST('0x'||substr(md5(s),1,8) AS BIGINT)`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** j-th universal hash of a 32-bit value: (a_j·x + b_j) mod P with
    * a_j = 2j+1 (odd), b_j = 7919j+1. One md5 per input feeds any number
    * of MinHash permutations. */
  def permuted(x: Column, j: Column): Column =
    pmod((lit(2) * j + lit(1)) * x + j * lit(7919) + lit(1), lit(P))

  /** Whitespace tokenization, identical to `regexp_split_to_array(s,'\s+')`
    * on trimmed input. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Evaluate `c` exactly ONCE per row and hand the value to `f` as a
    * bound lambda variable (single-element transform + element_at — the
    * gramHashArray/wordChunks pattern, extracted). Why this exists: every
    * Column REFERENCE is a copy of its whole expression tree, lambda-
    * bearing expressions are excluded from codegen subexpression
    * elimination, and predicate pushdown inlines aliases into filters —
    * so a non-cheap expression referenced k times costs k evaluations
    * per row unless bound. Values are unchanged, only evaluation count. */
  def bind1(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Word n-gram shingles (distinct), space-joined; empty array when fewer
    * than n tokens. Narrow — no explode needed by callers that aggregate
    * per-row. */
  def shingles(words: Column, n: Int): Column = {
    val joined = transform(
      sequence(lit(1), greatest(size(words) - lit(n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => get(words, i + lit(k) - lit(1))): _*))
    when(size(words) >= n, array_distinct(joined)).otherwise(array().cast("array<string>"))
  }

  /** IEEE-exact sequential dot product of two float vectors in double
    * precision (widen each element BEFORE multiply — float*float would
    * round differently than the oracle's double*double). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity, fully deterministic double arithmetic. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
}
