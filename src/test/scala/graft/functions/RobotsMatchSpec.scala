package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Truth table for the RFC 9309 path-pattern matcher — every grammar
  * feature (prefix, `*`, trailing `$`, literal mid-`$`) plus the greedy
  * walk's edge shapes (adjacent stars, empty segments, suffix overlap).
  */
class RobotsMatchSpec extends AnyFunSuite {
  private def m(path: String, pattern: String) =
    RobotsMatchUtil.matchesStr(path, pattern)

  test("plain patterns are prefix matches") {
    assert(m("/p/123", "/p/"))
    assert(m("/p/", "/p/"))
    assert(!m("/q/123", "/p/"))
    assert(!m("/p", "/p/"))
    assert(m("/anything", "/"))
    assert(m("/a?b=1", "/a?b"))
  }

  test("trailing $ anchors a starless pattern exactly") {
    assert(m("/p/12", "/p/12$"))
    assert(!m("/p/123", "/p/12$"))
    assert(!m("/p/1", "/p/12$"))
  }

  test("* matches any sequence including empty") {
    assert(m("/x?sid=9", "/*?sid="))
    assert(m("/?sid=9", "/*?sid="))  // empty star match
    assert(m("/a/b/c?sid=", "/*?sid="))
    assert(!m("/x?id=9", "/*?sid="))
    assert(m("/p/134", "/p/*4"))
    assert(m("/p/4", "/p/*4"))
    assert(!m("/p/135", "/p/*4"))
    assert(!m("/q/4", "/p/*4"))
  }

  test("multiple stars walk segments in order, greedily") {
    assert(m("/p/7?sid=73", "/p/*sid=*3"))
    assert(!m("/p/3?sid=75", "/p/*sid=*3")) // '3' before sid=, not after
    assert(m("/abXcdYef", "/ab*cd*ef"))
    assert(!m("/efXcdYab", "/ab*cd*ef"))
    assert(m("/abcd", "/ab**cd")) // adjacent stars = one star
    assert(m("/ab", "/ab*"))      // trailing star matches empty
  }

  test("star with $ anchor checks the suffix after consumed segments") {
    assert(m("/a/x.html", "/*.html$"))
    assert(!m("/a/x.html?go", "/*.html$"))
    assert(m("/p/100", "/p/*00$"))
    assert(!m("/p/100?x", "/p/*00$"))
    // suffix may not overlap an already-consumed middle segment
    assert(m("/abcbc", "/a*bc$"))
    assert(!m("/abc", "/abc*bc$"))
    assert(m("/abcbc", "/abc*bc$")) // suffix occurrence sits after pos
    assert(m("/ab", "/ab*$"))       // star-then-anchor = plain prefix
    assert(m("/abZZ", "/ab*$"))
  }

  test("$ anywhere but the end is a literal octet") {
    assert(m("/price$usd", "/price$usd"))
    assert(!m("/priceusd", "/price$usd"))
    assert(m("/price$", "/price$$")) // first $ literal, last anchors
    assert(!m("/price", "/price$$"))
  }

  test("degenerate patterns") {
    assert(m("/x", "*"))
    assert(m("/x", "**"))
    assert(!m("/x", "$"))  // empty anchored pattern matches only ""
    assert(m("", "$"))
    assert(m("/x", ""))    // empty pattern = universal prefix
  }
}
