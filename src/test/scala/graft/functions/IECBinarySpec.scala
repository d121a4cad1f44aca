package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference lib/.../util/IECBinaryTest.java semantics. */
class IECBinarySpec extends AnyFunSuite {
  test("format") {
    assert(IECBinaryImpl.format(0) == "0 B")
    assert(IECBinaryImpl.format(1023) == "1023 B")
    assert(IECBinaryImpl.format(1024) == "1 KiB")
    assert(IECBinaryImpl.format(1536) == "2 KiB") // %.0f half-even → 2
    assert(IECBinaryImpl.format(1024L * 1024) == "1 MiB")
    assert(IECBinaryImpl.format(3L * 1024 * 1024 * 1024) == "3 GiB")
    assert(IECBinaryImpl.format(5L * 1024 * 1024 * 1024 * 1024) == "5 TiB")
  }

  test("parse") {
    assert(IECBinaryImpl.parse("0") == 0L)
    assert(IECBinaryImpl.parse("1024") == 1024L)
    assert(IECBinaryImpl.parse("1 KiB") == 1024L)
    assert(IECBinaryImpl.parse("123 KiB") == 123L * 1024)
    assert(IECBinaryImpl.parse("2MiB") == 2L * 1024 * 1024)
    assert(IECBinaryImpl.parse("7 gib") == 7L * 1024 * 1024 * 1024)
    intercept[IllegalArgumentException](IECBinaryImpl.parse("x y z"))
  }

  test("round trip on exact unit multiples") {
    for (v <- Seq(1L, 17L, 1023L)) {
      for (shift <- Seq(0, 10, 20, 30, 40)) {
        val bytes = v << shift
        assert(IECBinaryImpl.parse(IECBinaryImpl.format(bytes)) == bytes)
      }
    }
  }
}
