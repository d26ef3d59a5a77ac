package graft.model

import org.scalatest.funsuite.AnyFunSuite

class SanitizeSpec extends AnyFunSuite {
  test("dash, underscore, space runs collapse to single underscore") {
    assert(Sanitize.key("a-b") == "a_b")
    assert(Sanitize.key("a b") == "a_b")
    assert(Sanitize.key("a_b") == "a_b")
    assert(Sanitize.key("a- _b") == "a_b")
    assert(Sanitize.key("first seen-date") == "first_seen_date")
  }

  test("clean keys unchanged") {
    assert(Sanitize.key("_p") == "_p")
    assert(Sanitize.key("event") == "event")
  }

  test("idempotent") {
    val dirty = "a-b c_d--e"
    assert(Sanitize.key(Sanitize.key(dirty)) == Sanitize.key(dirty))
  }
}
