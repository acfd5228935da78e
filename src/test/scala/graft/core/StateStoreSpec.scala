package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class StateStoreSpec extends AnyFunSuite {

  private def freshStore() = {
    val dir = Files.createTempDirectory("graft-state").toString
    (StateStore(dir, "p1"), dir)
  }

  test("scalar, map and list round-trip through commit + reload") {
    val (s, dir) = freshStore()
    s.put("cursor", "2024-01-15T00:00:00")
    s.put("offset", 42L)
    s.putMap("shards", Map("shard-0" -> "seq-9", "shard-1" -> "seq-3"))
    s.putList("seen_archives", Seq("2024-01", "2024-02"))
    s.commit()

    val s2 = StateStore(dir, "p1")
    assert(s2.getString("cursor").contains("2024-01-15T00:00:00"))
    assert(s2.getLong("offset").contains(42L))
    assert(s2.getMap("shards") == Map("shard-0" -> "seq-9", "shard-1" -> "seq-3"))
    assert(s2.getList("seen_archives") == Seq("2024-01", "2024-02"))
  }

  test("uncommitted mutations do not persist; rollback restores committed view") {
    val (s, dir) = freshStore()
    s.put("cursor", "v1")
    s.commit()
    s.put("cursor", "v2-uncommitted")
    s.rollback()
    assert(s.getString("cursor").contains("v1"))
    assert(StateStore(dir, "p1").getString("cursor").contains("v1"))
  }

  test("missing keys are None/empty") {
    val (s, _) = freshStore()
    assert(s.getString("nope").isEmpty)
    assert(s.getMap("nope").isEmpty)
    assert(s.getList("nope").isEmpty)
  }

  test("pipelines are isolated by name") {
    val dir = Files.createTempDirectory("graft-state").toString
    val a = StateStore(dir, "a"); a.put("k", "va"); a.commit()
    val b = StateStore(dir, "b")
    assert(b.getString("k").isEmpty)
  }
}
