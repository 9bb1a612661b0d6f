package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared gram-hashing core for the fused shingle expressions below.
  *
  * Hash parity contract: every gram hash equals
  * `xxhash64(substring-producing-the-same-bytes)` — XXH64 with Spark's
  * default seed 42 over the gram's exact UTF-8 bytes, hashed IN PLACE in
  * the document's backing buffer (a UTF-8 substring by code points or by
  * single-byte separators is always a contiguous byte range, so no gram
  * string is ever materialized). HashedGramsSpec pins native ≡ the SQL
  * template (`array_distinct(transform(...xxhash64...))`) as SETS on the
  * real documents table and on multi-byte/degenerate fixtures.
  *
  * Output contract: distinct hashes, ASCENDING-SORTED. Order is safe to
  * change vs the template's first-occurrence order because every consumer
  * is order-invariant (MinHashSignature minima, size(), explode→groupBy,
  * intersection counts) — and sortedness is what lets the verify phase use
  * [[IntersectCountSorted]]'s allocation-free merge instead of
  * array_intersect's per-pair hash set.
  */
object HashedGramsCore {
  private val EMPTY = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Sort + unique-compact + wrap. `m` = number of valid slots in `hs`. */
  def sortedDistinct(hs: Array[Long], m: Int): UnsafeArrayData = {
    if (m == 0) return EMPTY
    java.util.Arrays.sort(hs, 0, m)
    var w = 1
    var i = 1
    while (i < m) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** Distinct xxhash64 of character n-gram shingles. Mirrors the SQL
    * template `array_distinct(transform(sequence(1, greatest(len - n + 1,
    * 1)), i -> xxhash64(substring(text, i, n))))` — including the
    * template's short-text case (text shorter than n chars yields ONE
    * gram: the whole text, empty string included). */
  def shingles(s: UTF8String, n: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // code-point start offsets (UTF-8 char start: (b & 0xC0) != 0x80)
    val starts = new Array[Int](nb + 1)
    var nc = 0
    var i = 0
    while (i < nb) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) { starts(nc) = i; nc += 1 }
      i += 1
    }
    starts(nc) = nb
    val m = math.max(nc - n + 1, 1)
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      val bs = if (nc == 0) 0 else starts(g)
      val be = starts(math.min(g + n, nc))
      hs(g) = XXH64.hashUnsafeBytes(base, off + bs, be - bs, 42L)
      g += 1
    }
    sortedDistinct(hs, m)
  }

  /** Distinct xxhash64 of word n-grams (single-space tokenization).
    * Mirrors `array_distinct(transform(sequence(1, size(split(text, ' '))
    * - n + 1), i -> xxhash64(array_join(slice(split(text, ' '), i, n), '
    * '))))` for docs with ≥ n tokens, and returns an EMPTY array below n
    * tokens (the call sites' `len >= n` drop-filter becomes
    * `size(grams) > 0`). Separators are single 0x20 bytes (never a UTF-8
    * continuation byte), so each joined gram is a contiguous byte range
    * of the original text — token boundaries found in one byte scan,
    * empty tokens from repeated/leading/trailing spaces preserved exactly
    * as regex split produces them. */
  def wordGrams(s: UTF8String, n: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // token i spans [tokStart(i), spacePos(i)); spacePos(last) = nb
    val tokStart = new Array[Int](nb + 2)
    val tokEnd = new Array[Int](nb + 2)
    var nt = 0
    var cur = 0
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        tokStart(nt) = cur; tokEnd(nt) = i; nt += 1; cur = i + 1
      }
      i += 1
    }
    tokStart(nt) = cur; tokEnd(nt) = nb; nt += 1
    if (nt < n) return EMPTY
    val m = nt - n + 1
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      val bs = tokStart(g)
      val be = tokEnd(g + n - 1)
      hs(g) = XXH64.hashUnsafeBytes(base, off + bs, be - bs, 42L)
      g += 1
    }
    sortedDistinct(hs, m)
  }

  /** All word n-gram hashes in POSITION ORDER, multiplicity kept — the
    * sliding-window span stream (one hash per token position) that
    * span-level dedup scores against, where a doc repeating its own
    * boilerplate must count each occurrence. Same tokenization, byte
    * ranges, and xxhash64 parity as [[wordGrams]]; only the
    * distinct+sort differs. */
  def wordGramsSeq(s: UTF8String, n: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val tokStart = new Array[Int](nb + 2)
    val tokEnd = new Array[Int](nb + 2)
    var nt = 0
    var cur = 0
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        tokStart(nt) = cur; tokEnd(nt) = i; nt += 1; cur = i + 1
      }
      i += 1
    }
    tokStart(nt) = cur; tokEnd(nt) = nb; nt += 1
    if (nt < n) return EMPTY
    val m = nt - n + 1
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      hs(g) = XXH64.hashUnsafeBytes(base, off + tokStart(g),
        tokEnd(g + n - 1) - tokStart(g), 42L)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  /** One struct<h1, h2> per bigram position (multiplicity and order
    * kept): h1 = xxhash64 of token i, h2 = xxhash64 of tokens i,i+1
    * joined by the single space that already separates them in the
    * source bytes. Emitting the PAIR from one scan matters beyond the
    * fused hashing: the bigram-LM keys explode this array, and a
    * generate carries its non-generator columns into every output row —
    * deriving h1 from a carried unigram ARRAY after the explode copies
    * O(#tokens) longs per bigram row (measured 2× SLOWER than the
    * string template it replaced; this shape is the fix). */
  def bigramPairs(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val tokStart = new Array[Int](nb + 2)
    val tokEnd = new Array[Int](nb + 2)
    var nt = 0
    var cur = 0
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        tokStart(nt) = cur; tokEnd(nt) = i; nt += 1; cur = i + 1
      }
      i += 1
    }
    tokStart(nt) = cur; tokEnd(nt) = nb; nt += 1
    if (nt < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nt - 1)
    var g = 0
    while (g < nt - 1) {
      val h1 = XXH64.hashUnsafeBytes(base, off + tokStart(g), tokEnd(g) - tokStart(g), 42L)
      val h2 = XXH64.hashUnsafeBytes(base, off + tokStart(g), tokEnd(g + 1) - tokStart(g), 42L)
      out(g) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1, h2))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All adjacent in-token CHARACTER-pair codes ((b1 << 8) | b2), one
    * int per pair position, multiplicity kept — the BPE merge-candidate
    * stream (`tokenizer_bpe_pairs`), emitted from one byte scan instead
    * of the interpreted transform-substring lambda it replaces (the
    * SCALE.md interpreted-lambda rule: higher-order functions never
    * reach codegen). BYTE-PAIR contract: codes are raw UTF-8 byte
    * pairs, which equal character pairs only for ASCII corpora — the
    * fixture's domain (the PgTrigrams ASCII contract, same rationale);
    * non-ASCII corpora would need code-point staging first. The
    * contract is ENFORCED: any byte >= 0x80 throws (ADVICE r15 — the
    * divergence from the character-pair oracle used to be silent); a
    * multilingual corpus takes [[codePointPairCodes]], the UTF-8-safe
    * sibling lane, instead.
    * Tokens split on single 0x20 bytes exactly like [[wordGramsSeq]]. */
  def charPairCodes(s: UTF8String): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var n = 0
    var i = 0
    // pair count = adjacent non-space byte pairs. The same pass enforces
    // the ASCII contract LOUDLY (ADVICE r15): a byte >= 0x80 means the
    // byte-pair stream would silently diverge from character pairs (and
    // from real BPE symbols) — abort instead of producing wrong pairs.
    while (i + 1 < nb) {
      val a = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i + 1)
      if (a < 0 || b < 0)
        throw new IllegalArgumentException(
          "char_pair_codes: non-ASCII byte 0x" +
            Integer.toHexString((if (a < 0) a else b) & 0xff) +
            " at offset " + (if (a < 0) i else i + 1) +
            " — BPE pair codes are defined over ASCII corpora only; " +
            "stage non-ASCII text to code points (or pre-filter) first")
      if (a != 0x20 && b != 0x20) n += 1
      i += 1
    }
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])
    val out = new Array[Int](n)
    var g = 0
    i = 0
    while (i + 1 < nb) {
      val a = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i + 1)
      if (a != 0x20 && b != 0x20) {
        out(g) = ((a & 0xff) << 8) | (b & 0xff)
        g += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All adjacent in-token CODE-POINT-pair codes, one LONG per pair
    * position, multiplicity kept — the UTF-8-safe sibling of
    * [[charPairCodes]] (VERDICT r16 #5: the ASCII lane fails loud on a
    * real multilingual corpus; this one doesn't have to). The pair code
    * is EXACT, not hashed: Unicode scalar values fit 21 bits
    * (≤ U+10FFFF), so `(cp1 << 21) | cp2` is a collision-free 42-bit
    * fuse the oracle can recompute arithmetically from DuckDB's
    * `ascii()` code points. Decoding walks raw UTF-8 sequences directly
    * (1–4 bytes by lead-byte class), so supplementary-plane characters
    * are single pairs-stream symbols — never the two Java chars a
    * surrogate-pair iteration would leak. Tokens split on single 0x20
    * bytes (never a continuation byte) exactly like [[wordGramsSeq]];
    * malformed UTF-8 throws LOUDLY (a truncated sequence means the
    * stream would silently desync from the character stream). */
  def codePointPairCodes(s: UTF8String): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // decode pass: code points + a parallel "starts a new token" marker
    val cps = new Array[Int](nb + 1)
    var nc = 0
    var i = 0
    while (i < nb) {
      val b0 = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff
      val len =
        if (b0 < 0x80) 1
        else if ((b0 & 0xE0) == 0xC0) 2
        else if ((b0 & 0xF0) == 0xE0) 3
        else if ((b0 & 0xF8) == 0xF0) 4
        else throw new IllegalArgumentException(
          s"code_point_pair_codes: malformed UTF-8 lead byte 0x${Integer.toHexString(b0)} at offset $i")
      if (i + len > nb)
        throw new IllegalArgumentException(
          s"code_point_pair_codes: truncated UTF-8 sequence at offset $i")
      var cp = len match {
        case 1 => b0
        case 2 => b0 & 0x1F
        case 3 => b0 & 0x0F
        case _ => b0 & 0x07
      }
      var k = 1
      while (k < len) {
        val cb = org.apache.spark.unsafe.Platform.getByte(base, off + i + k) & 0xff
        if ((cb & 0xC0) != 0x80)
          throw new IllegalArgumentException(
            s"code_point_pair_codes: malformed UTF-8 continuation 0x${Integer.toHexString(cb)} at offset ${i + k}")
        cp = (cp << 6) | (cb & 0x3F)
        k += 1
      }
      cps(nc) = cp; nc += 1
      i += len
    }
    // pair pass: adjacent pairs where neither side is the 0x20 separator
    var n = 0
    var j = 0
    while (j + 1 < nc) {
      if (cps(j) != 0x20 && cps(j + 1) != 0x20) n += 1
      j += 1
    }
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n)
    var g = 0
    j = 0
    while (j + 1 < nc) {
      if (cps(j) != 0x20 && cps(j + 1) != 0x20) {
        out(g) = (cps(j).toLong << 21) | cps(j + 1).toLong
        g += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Sorted distinct xxhash64 of pg_trgm-style padded word trigrams:
    * lowercase, split on single spaces, drop empty words, pad each word
    * to `"  w "`, shred to 3-char-grams, union over words. Mirrors the
    * template `array_distinct(flatten(transform(filter(split(lower(c),
    * ' '), ...), w -> transform(..., substring(concat('  ', w, ' '), i,
    * 3)))))` with each gram hashed — padding makes the gram bytes
    * non-contiguous in the source, so each word is staged once into a
    * small scratch buffer with its code-point offsets and the 3-gram
    * windows hash from there (hash parity: XXH64 seed 42 over the
    * gram's UTF-8 bytes = `xxhash64(gram)`).
    *
    * CASE-FOLD CONTRACT (ADVICE r14): lowercasing goes through
    * `UTF8String.toLowerCase`, which disagrees with DuckDB's `lower()`
    * on a handful of non-ASCII mappings (dotted 'İ' → 'i̇' vs 'i',
    * 'ß' stays 'ß' vs … locale quirks) — and because only HASHES cross
    * the engine boundary, a divergence would surface as an opaque
    * similarity-count mismatch, not a readable diff. The oracled keys
    * feed ASCII name fixtures, where the two folds agree byte-for-byte;
    * callers adding non-ASCII corpora must normalize (e.g. strip to
    * ASCII or NFKC-fold) BEFORE this function on both engines. */
  def pgTrigrams(raw: UTF8String): UnsafeArrayData = {
    val s = raw.toLowerCase
    val bytes = s.getBytes
    val nb = bytes.length
    val hs = new java.util.ArrayList[java.lang.Long]()
    var ws = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == 0x20) {
        if (i > ws) { // non-empty word [ws, i)
          val wlen = i - ws
          val pad = new Array[Byte](wlen + 3)
          pad(0) = ' '; pad(1) = ' '
          System.arraycopy(bytes, ws, pad, 2, wlen)
          pad(wlen + 2) = ' '
          // code-point start offsets within pad
          val starts = new Array[Int](pad.length + 1)
          var nc = 0
          var j = 0
          while (j < pad.length) {
            if ((pad(j) & 0xC0) != 0x80) { starts(nc) = j; nc += 1 }
            j += 1
          }
          starts(nc) = pad.length
          var g = 0
          while (g + 3 <= nc) {
            hs.add(XXH64.hashUnsafeBytes(pad,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(g),
              starts(g + 3) - starts(g), 42L))
            g += 1
          }
        }
        ws = i + 1
      }
      i += 1
    }
    val arr = new Array[Long](hs.size())
    var k = 0
    while (k < arr.length) { arr(k) = hs.get(k); k += 1 }
    sortedDistinct(arr, arr.length)
  }

  /** Merge-count of common elements of two ascending-sorted distinct
    * long arrays — `size(array_intersect(a, b))` without the per-pair
    * hash set or result-array allocation. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

private[functions] trait TextGramExpression extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** See [[HashedGramsCore.shingles]]. */
case class HashedShingles(child: Expression, n: Int) extends TextGramExpression {
  override def prettyName: String = "hashed_shingles"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.shingles($s, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(HashedShingles(GraftColumnBridge.expression(text), n))
}

/** See [[HashedGramsCore.wordGrams]]. */
case class HashedWordGrams(child: Expression, n: Int) extends TextGramExpression {
  override def prettyName: String = "hashed_word_grams"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.wordGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.wordGrams($s, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedWordGrams {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(HashedWordGrams(GraftColumnBridge.expression(text), n))
}

/** See [[HashedGramsCore.pgTrigrams]]. */
case class PgTrigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pg_trigrams"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.pgTrigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.pgTrigrams($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PgTrigrams {
  def apply(text: Column): Column =
    GraftColumnBridge.column(PgTrigrams(GraftColumnBridge.expression(text)))
}

/** See [[HashedGramsCore.bigramPairs]]. */
case class HashedBigramPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "hashed_bigram_pairs"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.bigramPairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.bigramPairs($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBigramPairs {
  def apply(text: Column): Column =
    GraftColumnBridge.column(HashedBigramPairs(GraftColumnBridge.expression(text)))
}

/** See [[HashedGramsCore.wordGramsSeq]] — ordered, multiplicity kept;
  * NOT sorted, so never feed this to [[IntersectCountSorted]]. */
case class HashedWordGramsSeq(child: Expression, n: Int) extends TextGramExpression {
  override def prettyName: String = "hashed_word_grams_seq"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.wordGramsSeq(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.wordGramsSeq($s, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedWordGramsSeq {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(HashedWordGramsSeq(GraftColumnBridge.expression(text), n))
}

/** See [[HashedGramsCore.charPairCodes]]. */
case class CharPairCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_pair_codes"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.charPairCodes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.charPairCodes($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPairCodes {
  def apply(text: Column): Column =
    GraftColumnBridge.column(CharPairCodes(GraftColumnBridge.expression(text)))
}

/** See [[HashedGramsCore.codePointPairCodes]] — the UTF-8-safe sibling
  * of [[CharPairCodes]]: exact 42-bit fused code-point pairs, LONG typed.
  */
case class CodePointPairCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "code_point_pair_codes"
  override def nullSafeEval(input: Any): Any =
    HashedGramsCore.codePointPairCodes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedGramsCore.codePointPairCodes($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodePointPairCodes {
  def apply(text: Column): Column =
    GraftColumnBridge.column(CodePointPairCodes(GraftColumnBridge.expression(text)))
}

/** See [[HashedGramsCore.intersectCount]]. INPUT CONTRACT: both arrays
  * ascending-sorted and distinct (what [[HashedShingles]] /
  * [[HashedWordGrams]] emit) — unsorted input silently undercounts, so
  * never point this at arrays from any other producer. */
case class IntersectCountSorted(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashedGramsCore.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashedGramsCore.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object IntersectCountSorted {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      IntersectCountSorted(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
