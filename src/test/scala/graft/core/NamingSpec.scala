package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NamingSpec extends AnyFunSuite {

  test("snake_case basics") {
    assert(Naming.snakeCase("CamelCase") == "camel_case")
    assert(Naming.snakeCase("HTTPServer") == "http_server")
    assert(Naming.snakeCase("already_snake") == "already_snake")
    assert(Naming.snakeCase("with space-dash") == "with_space_dash")
    assert(Naming.snakeCase("9leading") == "_9leading")
  }

  test("double-underscore path separators survive") {
    assert(Naming.snakeCase("table__child") == "table__child")
    assert(Naming.normalize("embeddings__embedding") == "embeddings__embedding")
    // 3+ collapse to the separator
    assert(Naming.snakeCase("a___b") == "a__b")
  }

  test("63-char cap with stable tag") {
    val long = "x" * 100
    val n1 = Naming.normalize(long)
    val n2 = Naming.normalize(long)
    assert(n1.length <= Naming.MaxLength)
    assert(n1 == n2)
    // distinct long names stay distinct
    assert(Naming.normalize("y" * 100) != n1)
  }

  test("idempotent") {
    Seq("CamelCase", "a__b", "x" * 100, "with-dash").foreach { s =>
      val once = Naming.normalize(s)
      assert(Naming.normalize(once) == once)
    }
  }
}
