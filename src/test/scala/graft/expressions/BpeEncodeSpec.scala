package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, merges: Seq[String]): Int = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(BpeCol.bpe_token_count(col("t"), merges).as("n"))
      .head().getInt(0)
  }

  /** Reference mirror of the ORACLE's formulation: wrap each token in
    * its own delimiter pair and apply each merge as a left-to-right
    * non-overlapping string replace of two complete wrappers; token
    * count = delimiters / 2. (An interleaved `Dc1Dc2D` encoding would
    * make neighboring matches share a delimiter and skip every other
    * merge — "bbbb" with (b,b) would give 3 tokens, not 2.)
    * Independent code path from BpeOps — agreement means
    * expression ≡ oracle semantics.
    */
  private def replaceRef(text: String, merges: Seq[String]): Int = {
    val d = '\u001f'
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map { w =>
      var enc = w.map(c => s"$d$c$d").mkString
      merges.foreach { m =>
        enc = enc.replace(s"$d${m(0)}$d$d${m(1)}$d", s"$d$m$d")
      }
      enc.count(_ == d) / 2
    }.sum
  }

  test("known merges: fused pairs count as one token") {
    // "the cat" with merge th: [th,e] + [c,a,t] = 5
    assert(count("the cat", Seq("th")) == 5)
    // rank order matters: he applies only where th didn't consume h
    assert(count("the he", Seq("th", "he")) == 2 + 1)
    assert(count("the he", Seq("he", "th")) == 2 + 1) // t+he vs th+e
  }

  test("overlap is left-to-right non-overlapping") {
    assert(count("aaa", Seq("aa")) == 2)   // [aa, a]
    assert(count("aaaa", Seq("aa")) == 2)  // [aa, aa]
    assert(count("aaaaa", Seq("aa")) == 3) // [aa, aa, a]
  }

  test("no words, punctuation-only, and null") {
    assert(count("", Seq("th")) == 0)
    assert(count("?! --", Seq("th")) == 0)
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(BpeCol.bpe_token_count(col("t"), Seq("th")).as("n"))
      .head()
    assert(r.isNullAt(0))
  }

  test("merged tokens never re-merge (single-char pairs only match chars)") {
    // "abab": merge ab -> [ab, ab]; a second merge "ba" must NOT see
    // the b|a boundary inside/between fused tokens
    assert(count("abab", Seq("ab", "ba")) == 2)
  }

  test("expression agrees with the replace-based oracle formulation") {
    val rng = new scala.util.Random(7)
    val alpha = "aab bccd"
    val texts = (1 to 60).map { _ =>
      (1 to rng.nextInt(12)).map(_ =>
        (1 to (1 + rng.nextInt(6))).map(_ =>
          alpha(rng.nextInt(alpha.length))).mkString).mkString(" ")
    } :+ "The quick brown fox! 42 jumps." :+ "  lead/trail  "
    val merges = Seq("ab", "aa", "cc", "bc", "cd")
    texts.foreach { t =>
      assert(count(t, merges) == replaceRef(t, merges),
        s"mismatch on '${t.take(40)}'")
    }
  }

  test("empty merge table degenerates to character count") {
    assert(count("ab cd", Nil) == 4)
  }
}
