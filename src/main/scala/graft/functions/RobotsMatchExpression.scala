package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 path-pattern matching for robots.txt rules — the full
  * grammar, not the prefix subset: `*` matches any character sequence
  * (including empty), a single trailing `$` anchors the pattern at the
  * end of the path, and any other `$` is a literal octet. A pattern
  * without `$` matches any path it is a PREFIX-pattern of (RFC 9309
  * §2.2.2: matching is anchored at the start of the path and may end
  * anywhere). Reference analog: the reference's sources fetch under
  * whatever politeness its operators bolt on — this is the Spark-native
  * crawl-rules stage of [[graft.ops.UrlFrontier]].
  *
  * Matching is the linear greedy glob walk (leftmost placement of each
  * literal segment is never worse for the segments after it — the
  * standard `*`-only glob argument; the `$` case only adds a final
  * suffix check at-or-after the last consumed position), so the cost is
  * O(|path| · segments) with zero regex compilation. That is the per-row
  * cost that matters when a rule table is broadcast against billions of
  * crawl candidates: a regex-backed matcher recompiles per row once the
  * pattern is a join column, and even Spark's `like` falls off its
  * fast path for non-foldable patterns.
  */
object RobotsMatchUtil {

  /** Codegen entry point: UTF8String in, primitive boolean out. Pattern
    * semantics operate on octets per the RFC; UTF8String.toString is the
    * only per-row allocation (patterns and paths are short).
    */
  def matches(path: UTF8String, pattern: UTF8String): Boolean =
    matchesStr(path.toString, pattern.toString)

  def matchesStr(path: String, pattern0: String): Boolean = {
    var pattern = pattern0
    var anchored = false
    if (pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$') {
      anchored = true
      pattern = pattern.substring(0, pattern.length - 1)
    }
    val star = pattern.indexOf('*')
    if (star < 0) {
      // no wildcard: plain prefix, or exact match when anchored
      return if (anchored) path == pattern else path.startsWith(pattern)
    }
    // leading literal must sit at the start
    if (!path.startsWith(pattern.substring(0, star))) return false
    var pos = star // chars of path consumed so far
    var segStart = star + 1 // segStart <= pattern.length always holds here
    while (true) {
      val nextStar = pattern.indexOf('*', segStart)
      if (nextStar < 0) {
        // last segment: suffix when anchored, find-anywhere-after otherwise
        val seg = pattern.substring(segStart)
        return if (anchored)
          path.endsWith(seg) && path.length - seg.length >= pos
        else
          seg.isEmpty || path.indexOf(seg, pos) >= 0
      }
      val seg = pattern.substring(segStart, nextStar)
      if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      segStart = nextStar + 1
    }
    false // unreachable: the nextStar < 0 branch always returns
  }
}

/** `robots_match(path, pattern)` as a native codegen'd predicate: stays
  * inside whole-stage codegen on the join output where the verdict is
  * computed (path column × broadcast rule pattern column).
  */
final case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatchUtil.matches(
      path.asInstanceOf[UTF8String], pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (path, pattern) =>
      s"${ev.value} = graft.functions.RobotsMatchUtil.matches($path, $pattern);")
}

object RobotsMatch {
  def robotsMatch(path: Column, pattern: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RobotsMatch(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(path),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(pattern)))
}
