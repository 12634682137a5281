package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matcher: per-pattern occurrence counts over
  * a text column in ONE automaton pass (Aho–Corasick, the classic
  * multi-string matcher from Aho & Corasick, CACM 1975).
  *
  * WHY custom (SURVEY §2.11 escape hatch): the composable form is P
  * separate scans — `(length(t) - length(replace(t, p, ''))) /
  * length(p)` per pattern — i.e. O(P·|text|) work and P interpreted
  * expression trees per row. A curation blocklist is 10²–10⁵ terms
  * (banned phrases, NSFW vocab, boilerplate markers); at 100 TB the
  * only sane shape is one O(|text| + matches) automaton walk that
  * emits ALL patterns' counts at once. The automaton is built once on
  * the driver from the (literal) pattern list and rides to executors
  * as a codegen reference object — bounded model state, never a
  * shuffle.
  *
  * COUNTING SEMANTICS — leftmost non-overlapping, per pattern
  * independently: exactly what the `replace()` difference-count
  * computes, so a plain-SQL oracle can replay the numbers. Aho–Corasick
  * naturally reports every occurrence (including overlaps); a
  * per-pattern next-allowed-start cursor filters to the greedy
  * non-overlapping subset ("aa" occurs once in "aaa", "aba" once in
  * "ababa"). Different patterns never mask each other — the cursor is
  * per pattern, so nested/overlapping patterns ("a", "an", "scan") all
  * count at full strength in the same pass.
  *
  * Matching is over UTF-8 BYTES (byte-labeled trie edges): for ASCII
  * patterns this is exactly character matching, and multi-byte UTF-8
  * cannot false-positive because a valid UTF-8 sequence never contains
  * another's bytes at a misaligned offset (continuation bytes are
  * disjoint from lead bytes).
  *
  * Memory: dense byte-indexed goto rows — (total pattern bytes + 1) ×
  * 256 ints. Fine through ~10⁴ nodes (~10 MB); past that, swap the row
  * store for a double-array trie — the walk below is unchanged.
  */
final class AcAutomaton(patternStrings: Array[String]) extends Serializable {

  val numPatterns: Int = patternStrings.length
  private val pats: Array[Array[Byte]] =
    patternStrings.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  require(pats.forall(_.length > 0), "blocklist patterns must be non-empty")

  private val patLen: Array[Int] = pats.map(_.length)
  // dense goto table, flattened [node * 256 + byte]
  private val goto_ : Array[Int] = {
    val maxNodes = pats.map(_.length).sum + 1
    val g = Array.fill(maxNodes * 256)(-1)
    g
  }
  // declared BEFORE ownPats: Scala initializes fields in declaration
  // order, so a later declaration would zero the value assigned here
  private var numNodes: Int = 1
  // pattern ids whose OWN path ends at this node (not via fail links)
  private val ownPats: Array[Array[Int]] = {
    var nNodes = 1
    val own = scala.collection.mutable.Map[Int, List[Int]]()
    var id = 0
    while (id < pats.length) {
      val p = pats(id)
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xFF
        if (goto_(s * 256 + c) == -1) { goto_(s * 256 + c) = nNodes; nNodes += 1 }
        s = goto_(s * 256 + c)
        i += 1
      }
      own(s) = id :: own.getOrElse(s, Nil)
      id += 1
    }
    numNodes = nNodes
    Array.tabulate(nNodes)(n => own.getOrElse(n, Nil).reverse.toArray)
  }
  // fail links + output links (nearest fail-ancestor with own output)
  private val outLink: Array[Int] = {
    val fail = new Array[Int](numNodes)
    val ol = Array.fill(numNodes)(-1)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val v = goto_(c)
      if (v == -1) goto_(c) = 0
      else { fail(v) = 0; queue.add(v) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      ol(u) = if (ownPats(fail(u)).nonEmpty) fail(u) else ol(fail(u))
      var b = 0
      while (b < 256) {
        val v = goto_(u * 256 + b)
        if (v == -1) goto_(u * 256 + b) = goto_(fail(u) * 256 + b)
        else { fail(v) = goto_(fail(u) * 256 + b); queue.add(v) }
        b += 1
      }
    }
    ol
  }

  /** One pass; returns leftmost non-overlapping counts per pattern
    * (replace()-difference semantics — see scaladoc). Static shape so
    * generated code makes a single call per row. */
  def countMatches(text: UTF8String): ArrayData = {
    val counts = new Array[Long](numPatterns)
    if (text != null) {
      val nextStart = new Array[Int](numPatterns)
      val n = text.numBytes()
      var s = 0
      var i = 0
      while (i < n) {
        s = goto_(s * 256 + (text.getByte(i) & 0xFF))
        var o = if (ownPats(s).nonEmpty) s else outLink(s)
        while (o != -1) {
          val ids = ownPats(o)
          var k = 0
          while (k < ids.length) {
            val pid = ids(k)
            if (i - patLen(pid) + 1 >= nextStart(pid)) {
              counts(pid) += 1
              nextStart(pid) = i + 1
            }
            k += 1
          }
          o = outLink(o)
        }
        i += 1
      }
    }
    new GenericArrayData(counts)
  }
}

/** `blocklist_counts(text)` — array<bigint> of per-pattern counts,
  * aligned to the (literal) pattern list. */
case class BlocklistCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "blocklist_counts needs a non-empty pattern list")
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_counts needs a string column, got ${t.catalogString}")
  }

  @transient private lazy val automaton = new AcAutomaton(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $acRef.countMatches($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistCounts =
    copy(child = newChild)
}

object BlocklistCounts {
  /** SQL-surface builder: `blocklist_counts(text, array('p1', ...))` —
    * the pattern array must be a literal (it parameterizes the
    * automaton built at plan time). */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length == 2, "blocklist_counts(text, patterns) takes 2 arguments")
    require(es(1).foldable, "blocklist_counts: patterns must be a literal array")
    val arr = es(1).eval().asInstanceOf[ArrayData]
    // validate elements here so malformed literals fail at ANALYSIS time
    // with a clear message, not at first executor/codegen use (NULL
    // element → NPE; empty string → AcAutomaton's runtime require)
    val pats = (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i),
        s"blocklist_counts: pattern element $i is NULL — patterns must be non-null strings")
      val p = arr.getUTF8String(i).toString
      require(p.nonEmpty,
        s"blocklist_counts: pattern element $i is empty — patterns must be non-empty")
      p
    }
    BlocklistCounts(es(0), pats)
  }
}

object AhoCorasickExpression {
  /** Column API: per-pattern leftmost non-overlapping match counts. */
  def blocklistCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(BlocklistCounts(ColumnBridge.expression(text), patterns))
}
