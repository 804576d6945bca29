package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher over UTF-8 bytes.
  *
  * One automaton walk per document finds ALL patterns simultaneously —
  * scan cost is O(|text| + matches), independent of the pattern count,
  * where the per-pattern `instr` formulation
  * ([[graft.functions.Dedup.substringContamination]]) pays
  * O(|text| · patterns). The break-even is low (tens of patterns);
  * eval-set decontamination sweeps run thousands to hundreds of
  * thousands of snippets, squarely in automaton territory.
  *
  * Matching is over raw UTF-8 bytes: a contiguous byte match IS a
  * substring match (UTF-8 is self-synchronizing for exact sequences), so
  * no decoding happens per row.
  */
object MultiPattern {

  /** Byte-transition Aho–Corasick automaton. Nodes hold open-addressed
    * byte→child maps (dense 256-way tables would be ~256× over-allocated
    * below the root, and the root map fills dense on its own under load).
    */
  final class Automaton(patterns: Array[Array[Byte]]) extends Serializable {
    private val root = new Node()
    // captured so matched() never references the constructor param:
    // if `patterns` were used in a method body it would be retained as
    // a field, and the executor cache's weak KEY (the same array) would
    // then be strongly reachable from its VALUE — entries could never
    // be collected and finished plans would pin their pattern sets
    private val nPatterns = patterns.length

    // trie build
    {
      var i = 0
      while (i < patterns.length) {
        var node = root
        val p = patterns(i)
        var j = 0
        while (j < p.length) {
          val b = p(j) & 0xff
          var next = node.child(b)
          if (next == null) { next = new Node(); node.setChild(b, next) }
          node = next
          j += 1
        }
        if (p.length > 0) node.addOut(i)
        i += 1
      }
      // BFS failure links; outputs merged from the fail chain
      val queue = new java.util.ArrayDeque[Node]()
      root.fail = root
      var b = 0
      while (b < 256) {
        val c = root.child(b)
        if (c != null) { c.fail = root; queue.add(c) }
        b += 1
      }
      while (!queue.isEmpty) {
        val node = queue.poll()
        node.foreachChild { (byte, child) =>
          var f = node.fail
          while (f.child(byte) == null && (f ne root)) f = f.fail
          val fc = f.child(byte)
          child.fail = if (fc != null && (fc ne child)) fc else root
          child.mergeOut(child.fail)
          queue.add(child)
        }
      }
    }

    /** Distinct matched pattern indices, ascending. */
    def matched(text: UTF8String): GenericArrayData = {
      val bytes = text.getBytes
      val hits = new java.util.BitSet(nPatterns)
      var node = root
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        while (node.child(b) == null && (node ne root)) node = node.fail
        val next = node.child(b)
        if (next != null) node = next
        node.collectInto(hits)
        i += 1
      }
      val out = new Array[Int](hits.cardinality())
      var k = 0
      var idx = hits.nextSetBit(0)
      while (idx >= 0) {
        out(k) = idx; k += 1
        idx = hits.nextSetBit(idx + 1)
      }
      new GenericArrayData(out)
    }
  }

  private final class Node extends Serializable {
    private var keys = new Array[Int](8)      // byte+1, 0 = empty
    private var vals = new Array[Node](8)
    private var n = 0
    var fail: Node = _
    private var out: Array[Int] = null        // sorted pattern ids

    def child(b: Int): Node = {
      val mask = keys.length - 1
      var i = b & mask
      while (keys(i) != 0) {
        if (keys(i) == b + 1) return vals(i)
        i = (i + 1) & mask
      }
      null
    }

    def setChild(b: Int, node: Node): Unit = {
      if (n * 4 >= keys.length * 3) grow()
      val mask = keys.length - 1
      var i = b & mask
      while (keys(i) != 0 && keys(i) != b + 1) i = (i + 1) & mask
      if (keys(i) == 0) n += 1
      keys(i) = b + 1
      vals(i) = node
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals
      keys = new Array[Int](ok.length * 2)
      vals = new Array[Node](ok.length * 2)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != 0) setChild(ok(i) - 1, ov(i))
        i += 1
      }
    }

    def foreachChild(f: (Int, Node) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) != 0) f(keys(i) - 1, vals(i))
        i += 1
      }
    }

    def addOut(id: Int): Unit =
      out = if (out == null) Array(id)
      else if (out.contains(id)) out
      else (out :+ id).sorted

    def mergeOut(from: Node): Unit =
      if (from.out != null)
        from.out.foreach(addOut)

    def collectInto(hits: java.util.BitSet): Unit = {
      if (out != null) {
        var i = 0
        while (i < out.length) { hits.set(out(i)); i += 1 }
      }
    }
  }

  /** Per-executor automaton cache: the pattern array object is the
    * codegen reference, one instance per (deserialized) plan, so
    * identity keying builds each automaton once per executor instead of
    * once per row. Weak keys let finished plans unload.
    */
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Array[Byte]], Automaton]())

  /** Static entry point for generated code. */
  def matched(text: UTF8String,
              patterns: Array[Array[Byte]]): GenericArrayData = {
    var ac = cache.get(patterns)
    if (ac == null) {
      ac = new Automaton(patterns)
      cache.put(patterns, ac)
    }
    ac.matched(text)
  }
}

/** Distinct indices (ascending) of the `patterns` that occur as verbatim
  * substrings of the text — all patterns in ONE automaton pass. The
  * pattern set rides along as a codegen reference object (like
  * [[HyperplaneSigs]]'s plane tensor), so the plan stays one compact
  * expression regardless of pattern count.
  */
case class MultiPatternMatches(child: Expression,
                               patterns: Array[String])
    extends UnaryExpression {

  private val patternBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_pattern_matches"

  override def nullSafeEval(input: Any): Any =
    MultiPattern.matched(input.asInstanceOf[UTF8String], patternBytes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val pat = ctx.addReferenceObj("patterns", patternBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MultiPattern.matched($c, $pat)")
  }

  override protected def withNewChildInternal(
      c: Expression): MultiPatternMatches = copy(child = c)
}
