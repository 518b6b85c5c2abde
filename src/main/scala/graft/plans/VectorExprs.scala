package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector-math expressions for the embedding hot paths.
  *
  * Why not the constant-folded unrolled Column forms
  * (VectorFunctions.*Unrolled): at bits×dim = 768 terms the folded
  * expression codegens into ONE giant Java method body that HotSpot
  * refuses to JIT (-XX:DontCompileHugeMethods' 8 KB bytecode cliff) —
  * measured 2.7× SLOWER than even the interpreted HOF fold at sf0.1.
  * A `doGenCode` LOOP over a reference-object coefficient matrix stays
  * a few hundred bytecodes: JIT-compiled, whole-stage-codegen-resident,
  * and O(1) plan size no matter the (bits, dim).
  *
  * Value parity: both expressions accumulate in ascending element
  * order — bit-identical to the HOF folds (and so to the DuckDB
  * oracles); pinned in DedupSpec/AnnSpec.
  */
object VectorExprs {

  /** The ±1 hyperplane coefficient h_i[j], replicating the Column-form
    * draw xxhash64(lit(seed), lit(i), lit(j)) exactly: Spark's
    * XxHash64 expression chains child hashes from its 42L default
    * seed. */
  def hyperplaneSigns(bits: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](bits * dim)
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < dim) {
        var h = 42L
        h = XxHash64Function.hash(seed, LongType, h)
        h = XxHash64Function.hash(i, IntegerType, h)
        h = XxHash64Function.hash(j, IntegerType, h)
        out(i * dim + j) = if (java.lang.Math.floorMod(h, 2L) == 0L) 1.0 else -1.0
        j += 1
      }
      i += 1
    }
    out
  }

  private[plans] def elementType(t: DataType): Option[DataType] = t match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }
}

/** Signed-random-projection LSH signature as a single loop expression:
  * bit i of the result = sign( Σ_j h_i[j]·vec[j] ), coefficients from
  * [[VectorExprs.hyperplaneSigns]]. Null vector, short vector, or null
  * element → null. */
case class HyperplaneSignatureExpr(child: Expression, bits: Int, dim: Int,
                                   seed: Long = 42L)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elementType(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  @transient private lazy val signs: Array[Double] =
    VectorExprs.hyperplaneSigns(bits, dim, seed)
  @transient private lazy val isFloat: Boolean =
    VectorExprs.elementType(child.dataType).contains(FloatType)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var sig = 0L
    var i = 0
    while (i < bits) {
      var s = 0.0
      var j = 0
      val base = i * dim
      while (j < dim) {
        if (arr.isNullAt(j)) return null
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        s += signs(base + j) * x
        j += 1
      }
      if (s >= 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bad = ctx.freshName("bad")
      s"""
         |long $sig = 0L;
         |boolean $bad = $arr.numElements() < $dim;
         |for (int $i = 0; $i < $bits && !$bad; $i++) {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($arr.isNullAt($j)) { $bad = true; break; }
         |    $s += $signsRef[$i * $dim + $j] * (double) $arr.$getter($j);
         |  }
         |  if (!$bad && $s >= 0.0) $sig |= (1L << $i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word k-shingles of a text column in ONE pass — the native
  * form of the Column chain
  * `array_distinct(transform(sequence(…), i => concat_ws(" ",
  * slice(split(trim(text), "\s+"), i, k))))`, which evaluates
  * interpreted and allocates a token-array slice + join per shingle
  * (measured 2.7 s for 5 000 docs at sf0.1 — the dominant cost of the
  * MinHash pipeline).
  *
  * Value parity with the Column form, pinned in DedupSpec:
  *  - trim strips ASCII spaces only (Spark `trim` semantics, NOT
  *    Java String.trim);
  *  - tokenization is the same Java regex `\s+` split Spark's
  *    `split` uses (including its leading-empty-token behavior);
  *  - docs shorter than k tokens yield ONE whole-text shingle
  *    (sequence caps at 1, slice returns the remainder);
  *  - dedup preserves first-occurrence order (array_distinct
  *    semantics).
  *
  * CodegenFallback: the per-row work is real string processing — a
  * tight JVM loop, nothing for Janino to improve — and shingling runs
  * once per doc into a materialized table, so breaking the projection
  * out of whole-stage codegen costs one boxed row pass.
  *
  * `distinct = false` keeps every window WITH multiplicity (insertion
  * order) — the bag-of-ngrams form DSIR's likelihood needs. The
  * Column-chain spec form of THAT variant is the
  * transform(sequence(...), slice) chain, whose double reference to
  * the token array makes Catalyst's project-collapse re-evaluate the
  * split per window (O(windows × tokens) — the Dedup.scala lesson);
  * this one-pass loop is the reason Dsir's bigram scoring is linear. */
case class ShinglesExpr(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // Spark trim: ASCII ' ' only
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val toks = s.substring(from, to).split("\\s+", -1)
    // LinkedHashSet dedups preserving first occurrence; ArrayList keeps
    // multiplicity — both emit insertion order
    val out: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String]()
    if (toks.length <= k) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full MinHash signature in ONE pass over the shingle array:
  * sig[s] = min over shingles of xxhash64(shingle, s), value-identical
  * to the explode + n×`min(xxhash64)` aggregation (Dedup.wideSignature)
  * but with two structural wins:
  *
  *  1. **The string hashes once, not n times.** Spark's
  *     `xxhash64(shingle, s)` chains child hashes — the shingle's bytes
  *     hash with the constant seed 42 FIRST, and the seed index s is a
  *     cheap `hashInt` continuation. The aggregation form re-walks the
  *     string bytes for every one of the n columns; here the base hash
  *     computes once per shingle and each of the n lanes costs a few ns.
  *  2. **No shuffle.** The signature becomes a per-row scalar map —
  *     the explode + groupBy(doc) aggregation boundary (and its
  *     map-side combine machinery per exploded row) disappears; the
  *     pipeline's only shuffle is the band bucketing itself.
  *
  * Null shingle array → null; null elements → skipped (explode drops
  * them in the aggregation form). Empty array → all-Long.MaxValue lanes
  * (the aggregation form would drop the doc entirely — callers feed
  * shingle arrays that are never empty: even "" yields one shingle). */
case class MinHashSignatureExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = Array.fill(n)(Long.MaxValue)
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XxHash64Function.hash(s, StringType, 42L)
        var lane = 0
        while (lane < n) {
          val h = XxHash64Function.hash(lane, IntegerType, base)
          if (h < m(lane)) m(lane) = h
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(m)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash fingerprint in ONE pass over the token array: bit i of the
  * packed Long = sign( Σ_tok ±1 ) with the ±1 drawn from
  * xxhash64(tok, i) parity — value-identical to the explode +
  * bits×`sum(when(pmod(xxhash64…)))` aggregation (Dedup.simhashWide),
  * with the same two wins as [[MinHashSignatureExpr]]: each token's
  * bytes hash once (the per-bit draw is a `hashInt` continuation) and
  * the signature is a per-row scalar — no explode, no groupBy shuffle.
  * Null token array → null; null elements skipped. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Long](bits)
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XxHash64Function.hash(s, StringType, 42L)
        var b = 0
        while (b < bits) {
          val h = XxHash64Function.hash(b, IntegerType, base)
          counts(b) += (if (java.lang.Math.floorMod(h, 2L) == 0L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered ascending element pairs of an array —
  * [[graft.operators.Dedup]]'s in-bucket candidate generation, natively:
  * the Column form (`explode(flatten(transform(sequence…, transform(
  * slice…)))`) walks interpreted lambda trees per PAIR (~10 µs each;
  * ~2 s for the 195k banded SimHash pairs at sf0.1). One native loop
  * allocates exactly the output. Pair order matches the Column form:
  * (i, j) with i ascending, then j ascending. Elements are defensively
  * copied (bucket arrays may be unsafe-backed). */
case class ArrayPairsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array, got ${other.simpleString}")
  }

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  // inner containsNull follows the CHILD's element nullability:
  // copyElem passes null elements through, so declaring a hard
  // non-null inner array over a nullable child would hand consumers a
  // schema the data can violate
  override def dataType: DataType =
    ArrayType(
      ArrayType(elemType,
        containsNull = child.dataType.asInstanceOf[ArrayType].containsNull),
      containsNull = false)
  override def prettyName: String = "graft_array_pairs"
  override def nullable: Boolean = child.nullable

  private def copyElem(arr: ArrayData, i: Int): Any = arr.get(i, elemType) match {
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case s: UTF8String => s.clone()
    case v => v
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef](if (n < 2) 0 else n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n - 1) {
      val a = copyElem(arr, i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericArrayData(Array[Any](a, copyElem(arr, j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-overlap language ID in ONE tokenization pass — the native
  * form of TextFunctions.languageId, which tokenizes the text once PER
  * LANGUAGE through interpreted `filter`/`array_contains` HOFs.
  * Semantics replicated exactly (pinned in TextFunctionsSpec):
  * score(lang) = |{t : lower(t) ∈ stopwords(lang)}| / max(n, 1);
  * winner = argmax with ties to the lexicographically LARGEST language
  * code (array_max over (score, lang) structs); "und" when no score
  * is positive. */
case class LanguageIdExpr(child: Expression, stopwords: Map[String, Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"
  override def nullable: Boolean = child.nullable

  @transient private lazy val langs: Array[String] = stopwords.keys.toArray.sorted
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      stopwords(l).foreach(w => s.add(w))
      s
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val toks = s.substring(from, to).split("\\s+", -1)
    val counts = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      val w = toks(t).toLowerCase(java.util.Locale.ROOT)
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(w)) counts(l) += 1
        l += 1
      }
      t += 1
    }
    val denom = math.max(toks.length, 1).toDouble
    var best = 0
    var bestScore = counts(0) / denom
    var l = 1
    while (l < langs.length) {
      val sc = counts(l) / denom
      if (sc >= bestScore) { best = l; bestScore = sc } // ties → larger lang code
      l += 1
    }
    UTF8String.fromString(if (bestScore > 0) langs(best) else "und")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The Gopher document-quality rules in ONE tokenization pass — the
  * native form of TextFunctions.gopherFlags, whose Column form
  * re-tokenizes the text ~6× per row through interpreted HOFs
  * (tokens for the count, the mean length, the alpha filter, the
  * stopword intersect; lines for the bullet and ellipsis gates).
  * Semantics replicated exactly (pinned in TextFunctionsSpec):
  *
  *  - tokens = strip ' ' (Spark trim strips spaces only), then Java
  *    split("\\s+", -1) — the exact tokenizer of the Column form,
  *    including its [""]-for-empty and leading-"" quirks;
  *  - lines = split on '\n', kept when non-empty after space-strip;
  *  - ellipsis occurrences counted non-overlapping left-to-right
  *    ("..." or '…'), matching regexp_extract_all;
  *  - flag thresholds identical (see TextFunctions.gopherFlags).
  *
  * Null text → null struct (the Column form yields a struct of null
  * fields instead; both fail a `pass = 1` filter — documented, pinned).
  */
case class GopherStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(
    Seq("word_count_ok", "mean_word_len_ok", "symbol_ok", "bullet_ok",
      "ellipsis_ok", "alpha_word_ok", "stopword_ok", "pass")
      .map(StructField(_, IntegerType, nullable = false)))
  override def prettyName: String = "graft_gopher_stats"
  override def nullable: Boolean = child.nullable

  @transient private lazy val swSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w))
    s
  }

  private def stripSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val toks = stripSpaces(text).split("\\s+", -1)
    val nTok = toks.length
    val n = math.max(nTok, 1).toDouble

    // one token sweep: alpha-bearing count + distinct stopword hits
    var nAlpha = 0
    val hit = new java.util.HashSet[String]()
    var t = 0
    while (t < nTok) {
      val w = toks(t)
      var i = 0
      var alpha = false
      while (!alpha && i < w.length) {
        val c = w.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
        i += 1
      }
      if (alpha) nAlpha += 1
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      if (swSet.contains(lw)) hit.add(lw)
      t += 1
    }

    // char sweep: non-space length and '#' count (every position)
    var nonSpace = 0L
    var nHash = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!(c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r')) nonSpace += 1
      if (c == '#') nHash += 1
      i += 1
    }
    // ellipsis sweep: non-overlapping "..."/'…' left-to-right, the
    // regexp_extract_all scan (a match consumes its characters)
    var nEllipsis = 0
    i = 0
    while (i < text.length) {
      if (text.charAt(i) == '…') { nEllipsis += 1; i += 1 }
      else if (text.charAt(i) == '.' && i + 2 < text.length &&
          text.charAt(i + 1) == '.' && text.charAt(i + 2) == '.') {
        nEllipsis += 1
        i += 3
      } else i += 1
    }

    // one line sweep
    val rawLines = text.split("\n", -1)
    var nLines = 0
    var nBullet = 0
    var nEllLine = 0
    var l = 0
    while (l < rawLines.length) {
      val s = stripSpaces(rawLines(l))
      if (s.nonEmpty) {
        nLines += 1
        val c0 = s.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') nBullet += 1
        if (s.endsWith("...") || s.endsWith("…")) nEllLine += 1
      }
      l += 1
    }
    val nl = math.max(nLines, 1).toDouble

    val meanLen = nonSpace.toDouble / n
    def b(x: Boolean): Int = if (x) 1 else 0
    val wordCountOk = b(nTok >= 50 && nTok <= 100000)
    val meanOk = b(meanLen >= 3.0 && meanLen <= 10.0)
    val symbolOk = b((nHash + nEllipsis) / n <= 0.1)
    val bulletOk = b(nBullet / nl <= 0.9)
    val ellipsisOk = b(nEllLine / nl <= 0.3)
    val alphaOk = b(nAlpha / n >= 0.8)
    val stopwordOk = b(hit.size >= 2)
    val pass = wordCountOk & meanOk & symbolOk & bulletOk &
      ellipsisOk & alphaOk & stopwordOk
    InternalRow(wordCountOk, meanOk, symbolOk, bulletOk,
      ellipsisOk, alphaOk, stopwordOk, pass)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The four repetition gauges in ONE pass — the native form of
  * TextFunctions.{dupLineFraction, dupLineCharFraction,
  * topNgramCharFraction, dupNgramCharFraction}, whose Column forms
  * each re-derive lines/tokens and run interpreted sort + run-length
  * aggregates (the dominant cost of the sx19 quality scan). Hash-count
  * maps replace the sorts (value-identical: run-length over a sorted
  * array ≡ per-key counting). Semantics replicated exactly (pinned in
  * TextFunctionsSpec): the same space-strip/tokenize quirks as
  * GopherStatsExpr, the whole-text gram for docs shorter than n
  * tokens, duplicate coverage counting every occurrence, caps at 1.0,
  * and Spark's HALF_UP round(…, 4). */
case class RepetitionStatsExpr(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression with CodegenFallback {

  require(topN >= 1 && dupN >= 1, "n-gram sizes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(
    Seq("dup_line_frac", "dup_line_char_frac", "top_ngram_char_frac",
      "dup_ngram_char_frac")
      .map(StructField(_, DoubleType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"
  override def nullable: Boolean = child.nullable

  private def stripSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def nonSpaceLen(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!(c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r')) n += 1
      i += 1
    }
    n
  }

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** duplicate-coverage chars of `grams`: Σ over values with count ≥ 2
    * of count·charLen (every occurrence counted). */
  private def dupChars(counts: java.util.HashMap[String, Int],
                       charLen: String => Long): Long = {
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2) dup += e.getValue.toLong * charLen(e.getKey)
    }
    dup
  }

  private def ngrams(toks: Array[String], n: Int): Iterator[String] =
    if (toks.length <= n) Iterator.single(toks.mkString(" "))
    else new Iterator[String] {
      private var i = 0
      private val sb = new java.lang.StringBuilder()
      def hasNext: Boolean = i <= toks.length - n
      def next(): String = {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        i += 1
        sb.toString
      }
    }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val totalChars = math.max(nonSpaceLen(text), 1L).toDouble

    // lines: keep space-strip-nonempty ORIGINAL lines (filter, not map)
    val rawLines = text.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0
    var l = 0
    while (l < rawLines.length) {
      val raw = rawLines(l)
      if (stripSpaces(raw).nonEmpty) {
        nLines += 1
        lineCounts.merge(raw, 1, (a, b) => a + b)
      }
      l += 1
    }
    val dupLineFrac =
      if (nLines == 0) 0.0
      else round4(1.0 - lineCounts.size.toDouble / nLines.toDouble)
    val dupLineCharFrac =
      round4(math.min(dupChars(lineCounts, nonSpaceLen) / totalChars, 1.0))

    // word n-grams WITH repeats over the whole token stream
    val toks = stripSpaces(text).split("\\s+", -1)
    def gramStats(n: Int): (Long, Long) = { // (bestCoverage, dupCoverage)
      val counts = new java.util.HashMap[String, Int]()
      val it = ngrams(toks, n)
      while (it.hasNext) counts.merge(it.next(), 1, (a, b) => a + b)
      var best = 0L
      val e = counts.entrySet().iterator()
      while (e.hasNext) {
        val kv = e.next()
        val cov = kv.getValue.toLong * nonSpaceLen(kv.getKey)
        if (cov > best) best = cov
      }
      (best, dupChars(counts, nonSpaceLen))
    }
    val (top, _) = gramStats(topN)
    val (_, dup) = gramStats(dupN)
    val topFrac = round4(math.min(top / totalChars, 1.0))
    val dupFrac = round4(math.min(dup / totalChars, 1.0))
    InternalRow(dupLineFrac, dupLineCharFrac, topFrac, dupFrac)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF cell assignment: argmax over rows of `cents` of dot(cents(i),
  * vec) — the centroid matrix (pre-normalized by the caller) ships as
  * a codegen reference object, so the per-row work is one nCells×dim
  * loop regardless of how many cells the index has. Tie-break matches
  * the Column form it replaces (array_max over (s, i) structs):
  * equal dot → larger index wins. Null vector / short vector / null
  * element → null. NaN dots never win (the struct form would rank NaN
  * greatest; training data contains no NaNs — documented, not
  * defended). */
case class NearestCellExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "cents must be a non-empty rectangular matrix")

  private val dim = cents(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elementType(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"
  override def nullable: Boolean = true

  @transient private lazy val flat: Array[Double] = cents.flatten
  @transient private lazy val isFloat: Boolean =
    VectorExprs.elementType(child.dataType).contains(FloatType)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var best = -1
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        if (arr.isNullAt(j)) return null
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        s += flat(i * dim + j) * x
        j += 1
      }
      if (s >= bestS) { best = i; bestS = s }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", flat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val n = cents.length
    nullSafeCodeGen(ctx, ev, arr => {
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bad = ctx.freshName("bad")
      s"""
         |int $best = -1;
         |double $bestS = Double.NEGATIVE_INFINITY;
         |boolean $bad = $arr.numElements() < $dim;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($arr.isNullAt($j)) { $bad = true; break; }
         |    $s += $centsRef[$i * $dim + $j] * (double) $arr.$getter($j);
         |  }
         |  if (!$bad && $s >= $bestS) { $best = $i; $bestS = $s; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cos(a, b) = a·b / (‖a‖‖b‖), 0.0 for zero vectors, as one fused
  * ascending loop (dot and both norms accumulate in element order, so
  * the result is bit-identical to the HOF zip_with/aggregate form and
  * its DuckDB oracle). Null input, length mismatch, or null element →
  * null. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprs.elementType(left.dataType), VectorExprs.elementType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  @transient private lazy val leftFloat: Boolean =
    VectorExprs.elementType(left.dataType).contains(FloatType)
  @transient private lazy val rightFloat: Boolean =
    VectorExprs.elementType(right.dataType).contains(FloatType)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var j = 0
    while (j < n) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      val x = if (leftFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val y = if (rightFloat) b.getFloat(j).toDouble else b.getDouble(j)
      dot += x * y
      na += x * x
      nb += y * y
      j += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (leftFloat) "getFloat" else "getDouble"
    val rGet = if (rightFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $b.numElements() != $n;
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $j = 0; $j < $n && !$bad; $j++) {
         |  if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; break; }
         |  double $x = (double) $a.$lGet($j);
         |  double $y = (double) $b.$rGet($j);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = $d > 0 ? $dot / $d : 0.0;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
