package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native text-statistics expression — the quality projection's
  * hot loop (`TextAnalysis.withQuality`), found by round-17 stage
  * profiling (tools/CardProbe): the declarative formulation — three
  * regexp passes plus lower+split+filter array machinery per row —
  * burned ~1,050 executor-CPU-seconds over 500k sf10 docs (~2 ms/doc)
  * and dominates every consumer of the quality gate (dataset_card,
  * dedup_keep_best, text_quality, quality_rules, the pipeline_*
  * composers — five of the six most expensive sf100 queries). Each
  * stat here is ONE branch-light byte pass over the UTF8String
  * (~1-2 us/KB), with values BIT-IDENTICAL to the declarative law:
  *
  *   NWords     = size(filter(split(lower(text), "\\s+"), _ != ""))
  *   StopHits   = size(filter(words(text), _ isin StopWords))
  *   StopMask   = bitmask over StopWords indexes present in words(text)
  *                (popcount = the array_distinct size qualityRules uses)
  *   AlnumSpace = length(regexp_replace(text, "[^a-z0-9 ]", ""))
  *   NonSpace   = length(regexp_replace(text, "\\s", ""))
  *
  * Exactness argument (OpsSpec pins it property-style against the
  * declarative originals): Java regex \s is the six ASCII whitespace
  * chars, so word boundaries and space counts are pure byte tests;
  * Spark length() counts code points = non-continuation bytes; the
  * [a-z0-9 ] class is ASCII-only, so multi-byte code points can never
  * match it. The ONLY subtlety is stopword equality under lower():
  * Unicode lowercasing can map non-ASCII chars onto ASCII (U+212A
  * KELVIN SIGN lowers to 'k'), so rows containing ANY non-ASCII byte
  * take the reference path for the word/stopword stats — the same
  * UTF8String.toLowerCase + regex split the built-ins run. Corpus text
  * is ASCII, so the fast path is the production path; the fallback
  * keeps the law airtight on arbitrary input.
  */
case class TextStatsExpr(child: Expression, stat: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_textstat requires a string input, got $other")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = s"graft_textstat_$stat"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String], stat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.compute($s, $stat);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  val NWords = 0
  val StopHits = 1
  val StopMask = 2
  val AlnumSpace = 3
  val NonSpace = 4
  val MarkerMask = 5
  // charset-health stats (round-17 second fuse wave): pure BYTE algebra
  // on the UTF-8 encoding — exact for arbitrary input, no slow path:
  //   NonAscii     = code points matching [^\x00-\x7F] == non-continuation
  //                  bytes with the high bit set (UTF-8 lead bytes)
  //   ControlChars = code points in [\x00-\x08\x0B\x0C\x0E-\x1F]
  //                  (single-byte code points, tab/LF/CR excluded)
  //   Replacement  = occurrences of U+FFFD (the 3-byte sequence EF BF BD)
  val NonAscii = 6
  val ControlChars = 7
  val ReplacementChars = 8

  /** THE stopword list (canonical home; TextAnalysis re-exports it) —
    * order is the StopMask bit assignment, so it is part of the mask
    * contract. */
  val StopWords: Array[String] = Array("the", "a", "of", "and", "or", "in", "to")
  private val stopBytes: Array[Array[Byte]] =
    StopWords.map(_.getBytes("US-ASCII"))

  /** The langId marker table (canonical home; TextAnalysis re-exports
    * it). MarkerMask bit i set iff flat marker i occurs as a word —
    * a DISTINCT-presence mask, so score_lang =
    * popcount((mask >> 5*langIdx) & 31) equals the
    * size(array_intersect(array_distinct(words), markers)) the
    * declarative langId computed. Shared surface forms ("la", "de" in
    * both es and fr) simply set a bit in each language's window. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"))
  private val markerBytes: Array[Array[Byte]] =
    LangMarkers.flatMap(_._2).map(_.getBytes("US-ASCII")).toArray
  private val markerStrings: Array[String] = LangMarkers.flatMap(_._2).toArray

  // Java regex \s — exactly these six ASCII chars
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isAlnumSpace(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' '

  def compute(s: UTF8String, stat: Int): Long = stat match {
    case AlnumSpace =>
      // ASCII-only class: continuation/lead bytes (< 0) never match
      var i = 0; var n = 0L
      val len = s.numBytes
      while (i < len) { if (isAlnumSpace(s.getByte(i))) n += 1; i += 1 }
      n
    case NonSpace =>
      // code points (non-continuation bytes) minus ASCII space chars —
      // non-ASCII code points are always non-space under Java \s
      var i = 0; var n = 0L
      val len = s.numBytes
      while (i < len) {
        val b = s.getByte(i)
        if ((b & 0xC0) != 0x80 && !isSpace(b)) n += 1
        i += 1
      }
      n
    case NonAscii =>
      // lead bytes of multi-byte sequences: negative AND not 10xxxxxx
      var i = 0; var n = 0L
      val len = s.numBytes
      while (i < len) {
        val b = s.getByte(i)
        if (b < 0 && (b & 0xC0) != 0x80) n += 1
        i += 1
      }
      n
    case ControlChars =>
      var i = 0; var n = 0L
      val len = s.numBytes
      while (i < len) {
        val b = s.getByte(i)
        if ((b >= 0x00 && b <= 0x08) || b == 0x0B || b == 0x0C ||
            (b >= 0x0E && b <= 0x1F)) n += 1
        i += 1
      }
      n
    case ReplacementChars =>
      // U+FFFD = EF BF BD; matching at lead-byte positions only, so
      // counts can never overlap
      var i = 0; var n = 0L
      val len = s.numBytes
      while (i + 2 < len) {
        if (s.getByte(i) == 0xEF.toByte && s.getByte(i + 1) == 0xBF.toByte &&
            s.getByte(i + 2) == 0xBD.toByte) { n += 1; i += 3 }
        else i += 1
      }
      n
    case _ => wordStat(s, stat)
  }

  private def wordStat(s: UTF8String, stat: Int): Long = {
    val len = s.numBytes
    var i = 0
    var nWords = 0L; var hits = 0L; var mask = 0L
    var wordStart = -1
    var w0 = 0; var w1 = 0; var w2 = 0 // ascii-lowered first 3 bytes
    val table = if (stat == MarkerMask) markerBytes else stopBytes
    def endWord(end: Int): Unit = {
      nWords += 1
      if (stat != NWords && end - wordStart <= 3) {
        var k = 0
        while (k < table.length) {
          val sw = table(k)
          val wl = end - wordStart
          if (sw.length == wl &&
              sw(0) == w0 && (wl < 2 || sw(1) == w1) && (wl < 3 || sw(2) == w2)) {
            hits += 1; mask |= 1L << k
          }
          k += 1
        }
      }
      wordStart = -1
    }
    while (i < len) {
      val b = s.getByte(i)
      if (b < 0) return wordStatSlow(s, stat) // non-ASCII: reference path
      if (isSpace(b)) {
        if (wordStart >= 0) endWord(i)
      } else {
        if (wordStart < 0) wordStart = i
        val pos = i - wordStart
        val low = if (b >= 'A' && b <= 'Z') b + 32 else b.toInt
        if (pos == 0) w0 = low else if (pos == 1) w1 = low else if (pos == 2) w2 = low
      }
      i += 1
    }
    if (wordStart >= 0) endWord(len)
    stat match {
      case NWords => nWords
      case StopHits => hits
      case _ => mask
    }
  }

  /** Reference path for rows with non-ASCII bytes: the SAME lowering
    * the built-in lower() runs (UTF8String.toLowerCase — Unicode
    * case mapping can land on ASCII, e.g. Kelvin sign -> 'k'), then
    * the same Java-regex split the built-in split() runs. */
  private def wordStatSlow(s: UTF8String, stat: Int): Long = {
    val toks = s.toLowerCase.toString.split("\\s+", -1)
    val table = if (stat == MarkerMask) markerStrings else StopWords
    var nWords = 0L; var hits = 0L; var mask = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        nWords += 1
        var k = 0
        while (k < table.length) {
          if (table(k) == t) { hits += 1; mask |= 1L << k }
          k += 1
        }
      }
      i += 1
    }
    stat match {
      case NWords => nWords
      case StopHits => hits
      case _ => mask
    }
  }
}
