package graft.expressions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application as ONE native expression: the token count of
  * a document after applying a learned merge table — the "how many
  * tokens will this cost me" primitive a training-data pipeline runs
  * over the whole corpus (budgeting, packing, per-token pricing),
  * where the merge table is a trained artifact (here: the top pairs
  * from [[graft.functions.TextFunctions.bpePairCounts]]).
  *
  * Semantics (engine and oracle identical by construction):
  *  - words = `lower(text)` split on `[^a-z0-9]+`, empties dropped —
  *    the same pre-tokenization as `bpePairCounts`;
  *  - each word starts as single-character tokens;
  *  - merges apply IN RANK ORDER, one left-to-right non-overlapping
  *    pass each: at each position, if the next two tokens equal the
  *    pair, they fuse and the scan continues AFTER the fused token
  *    ("aaa" + merge (a,a) → [aa, a], never [a, aa]);
  *  - the result is the total token count over all words.
  *
  * First-pass merges are pairs of single characters, so one pass per
  * rank is exact classic BPE here (a later single-char pair can never
  * be re-created by an earlier merge — merging only builds longer
  * tokens). The left-to-right pass is EXACTLY the semantics of SQL
  * `replace()` over a delimiter-interleaved encoding, which is what
  * lets the DuckDB oracle emulate this expression with nested
  * `replace` calls and no recursion.
  *
  * Scale shape: map-only, O(len · merges) per document, one compact
  * codegen node with the merge table as a reference object — no
  * per-row parsing, no UDF boundary, stays inside whole-stage codegen.
  */
object BpeOps {

  /** Total post-merge token count of `text` under `merges` (2-char
    * single-character pairs, rank order). Static entry point for
    * generated code.
    */
  def tokenCount(text: UTF8String, merges: Array[String]): Int = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    var total = 0
    var wStart = -1
    var i = 0
    val n = s.length
    while (i <= n) {
      val isWord = i < n && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (isWord && wStart < 0) wStart = i
      if (!isWord && wStart >= 0) {
        total += wordTokens(s, wStart, i, merges)
        wStart = -1
      }
      i += 1
    }
    total
  }

  /** Token count of the word `s[from, until)` after the merge passes. */
  private def wordTokens(s: String, from: Int, until: Int,
                         merges: Array[String]): Int = {
    val len = until - from
    if (len == 1) return 1
    // tokens as (start, end) offsets into s — no string allocation;
    // first-pass merges are char pairs, so a token matches pair char
    // `a` iff it is single-char and equals it
    val starts = new Array[Int](len)
    val ends = new Array[Int](len)
    var nTok = 0
    var i = from
    while (i < until) { starts(nTok) = i; ends(nTok) = i + 1; nTok += 1; i += 1 }
    var m = 0
    while (m < merges.length && nTok > 1) {
      val pair = merges(m)
      if (pair.length == 2) {
        val a = pair.charAt(0)
        val b = pair.charAt(1)
        var out = 0
        var j = 0
        while (j < nTok) {
          if (j + 1 < nTok &&
              ends(j) - starts(j) == 1 && s.charAt(starts(j)) == a &&
              ends(j + 1) - starts(j + 1) == 1 &&
              s.charAt(starts(j + 1)) == b) {
            starts(out) = starts(j); ends(out) = ends(j + 1)
            j += 2
          } else {
            starts(out) = starts(j); ends(out) = ends(j)
            j += 1
          }
          out += 1
        }
        nTok = out
      }
      m += 1
    }
    nTok
  }
}

/** `INT` token count under a literal merge table (see [[BpeOps]]). */
case class BpeTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression {
  require(merges.forall(m => m != null && m.length == 2),
    "bpe_token_count: every merge must be a 2-character pair")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    BpeOps.tokenCount(s.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ms = ctx.addReferenceObj("merges", merges, "java.lang.String[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.BpeOps.tokenCount($s, $ms)")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

object BpeCol {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `bpe_token_count(col, merges)` → INT post-merge token count. */
  def bpe_token_count(col: Column, merges: Seq[String]): Column =
    column(BpeTokenCount(expression(col), merges.toArray))
}
