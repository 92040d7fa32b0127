package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over a fixed term dictionary — the
  * multi-pattern SUBSTRING matcher behind blocklist / banned-phrase /
  * attribution scans at corpus scale. A single pass over the text
  * reports every dictionary term that occurs ANYWHERE in it (classic
  * AC: goto + failure links, so a term ending mid-way through a longer
  * word is still found — "park" inside "spark").
  *
  * Why not a regex alternation: `rlike("(t1|t2|...|t10000)")` compiles
  * a pattern whose size grows with the dictionary and scans with the
  * regex engine's backtracking machinery — per-row cost O(text ·
  * alternatives) in the worst case, and the compiled pattern itself
  * becomes megabytes at real blocklist sizes (the public smut/spam
  * lists ship 10k–100k entries). The automaton is built ONCE on the
  * driver (O(Σ|term|) states), rides the plan as a reference object,
  * and matches in O(|text| + hits) per row regardless of dictionary
  * size — the map-only 100 TB shape.
  *
  * PARITY CONTRACT (DuckDB oracle): case-sensitive substring
  * semantics, i.e. term t is reported iff `position(t IN text) > 0`.
  * Matching walks Java chars, so the contract is exact for ASCII
  * dictionaries/corpora (the repo's native-expression convention —
  * same caveat as [[WordPieceSeg]]); the result lists each matched
  * term once, lexicographically sorted (term ids are assigned on the
  * sorted deduped dictionary, so ascending-id emission IS sorted
  * order, no per-row sort).
  */
case class AhoCorasickScan(child: Expression, terms: Array[String])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "aho_corasick_scan"

  @transient private lazy val automaton: AcAutomaton =
    AcAutomaton.build(terms)

  override protected def nullSafeEval(v: Any): Any =
    automaton.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, v => s"$ref.scan($v)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickScan = copy(child = newChild)
}

object AhoCorasickScan {
  def dictScan(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(AhoCorasickScan(ColumnBridge.expression(text),
      terms.toArray))
}

/** The built automaton: a trie over the deduped sorted dictionary with
  * BFS failure links and merged output sets. Built driver-side, shipped
  * whole as a codegen reference object (one instance per plan, shared
  * by every row of every partition — the [[WordPieceSeg]] vocabulary
  * pattern, not a per-row rebuild).
  *
  * Representation: per-node `java.util.HashMap[Character, Integer]`
  * goto edges (dictionaries are sparse — a dense 64k-wide table per
  * node would waste memory at 100k terms), `fail` as a flat int array,
  * and `out` as a flat int array of term ids with per-node
  * (offset, length) slices — output sets are PRE-MERGED along failure
  * chains at build time, so the scan never walks fail links to collect
  * hits.
  */
final class AcAutomaton(
    private val next: Array[java.util.HashMap[Character, Integer]],
    private val fail: Array[Int],
    private val outOff: Array[Int],
    private val outLen: Array[Int],
    private val outIds: Array[Int],
    val sortedTerms: Array[String]) extends Serializable {

  /** Distinct matched terms, ascending term id (= lexicographic). */
  def scan(text: UTF8String): ArrayData = {
    val s = text.toString
    val hits = new java.util.BitSet(sortedTerms.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var n = next(state).get(c)
      while (n == null && state != 0) {
        state = fail(state)
        n = next(state).get(c)
      }
      state = if (n == null) 0 else n.intValue()
      var j = outOff(state)
      val end = j + outLen(state)
      while (j < end) { hits.set(outIds(j)); j += 1 }
      i += 1
    }
    val out = new Array[Any](hits.cardinality())
    var k = 0
    var id = hits.nextSetBit(0)
    while (id >= 0) {
      out(k) = UTF8String.fromString(sortedTerms(id))
      k += 1
      id = hits.nextSetBit(id + 1)
    }
    new GenericArrayData(out)
  }
}

object AcAutomaton {

  def build(terms: Array[String]): AcAutomaton = {
    val sorted = terms.toSeq.distinct.sorted.toArray
    require(sorted.nonEmpty && sorted.forall(_.nonEmpty),
      "dictionary must be non-empty with non-empty terms")
    // Trie construction.
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val nodeOut = scala.collection.mutable.ArrayBuffer(
      List.empty[Int])
    var id = 0
    while (id < sorted.length) {
      val t = sorted(id)
      var st = 0
      var i = 0
      while (i < t.length) {
        val c = Character.valueOf(t.charAt(i))
        val n = next(st).get(c)
        if (n == null) {
          next += new java.util.HashMap[Character, Integer]()
          nodeOut += Nil
          next(st).put(c, Integer.valueOf(next.length - 1))
          st = next.length - 1
        } else st = n.intValue()
        i += 1
      }
      nodeOut(st) = id :: nodeOut(st)
      id += 1
    }
    // BFS failure links; merge output sets along the fail chain so the
    // scan reads one (offset, length) slice per state.
    val n = next.length
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll()
      next(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val fn = next(f).get(c)
        fail(v) = if (fn == null || fn == v) 0 else fn.intValue()
        nodeOut(v) = nodeOut(v) ++ nodeOut(fail(v))
        queue.add(v)
      }
    }
    val outOff = new Array[Int](n)
    val outLen = new Array[Int](n)
    val flat = scala.collection.mutable.ArrayBuffer.empty[Int]
    var st = 0
    while (st < n) {
      outOff(st) = flat.length
      outLen(st) = nodeOut(st).length
      flat ++= nodeOut(st)
      st += 1
    }
    new AcAutomaton(next.toArray, fail, outOff, outLen, flat.toArray,
      sorted)
  }
}
