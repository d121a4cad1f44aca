package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the pure scalar kernels (the bodies of the
  * Catalyst expressions) — randomized coverage of the whole input domain
  * on top of the fixed-value specs. */
object KernelProps extends Properties("graft.kernels") {

  private val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")

  property("iec: parse∘format lands within one unit of the input") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 4)) { x =>
      val s = IECBinaryImpl.format(x)
      val unitIdx = units.indexOf(s.split(" ")(1))
      val unit = if (unitIdx <= 0) 1L else 1L << (10 * unitIdx)
      val back = IECBinaryImpl.parse(s)
      math.abs(back - x) <= unit // %.0f rounds to the nearest unit
    }

  property("iec: parse is exact on exact unit multiples") =
    forAll(Gen.chooseNum(1L, 1023L), Gen.chooseNum(0, 5)) { (n, idx) =>
      IECBinaryImpl.parse(s"$n ${units(idx)}") == (n << (10 * idx))
    }

  property("iec: parse is case-insensitive") =
    forAll(Gen.chooseNum(1L, 1023L), Gen.chooseNum(1, 5)) { (n, idx) =>
      IECBinaryImpl.parse(s"$n ${units(idx).toUpperCase}") ==
        IECBinaryImpl.parse(s"$n ${units(idx)}")
    }

  property("size_bucket: monotone in size") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 2), Gen.chooseNum(0L, Long.MaxValue / 2)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      SizeBucketImpl.bucket(lo) <= SizeBucketImpl.bucket(hi)
    }

  property("size_bucket: upperBorder(b) is the first size of bucket b+1") =
    forAll(Gen.chooseNum(1, 43)) { b =>
      val border = SizeBucketImpl.upperBorder(b)
      SizeBucketImpl.bucket(border) == b + 1 &&
        SizeBucketImpl.bucket(border - 1) == b
    }

  property("size_bucket: buckets 0/1/2 match the documented model") =
    forAll(Gen.chooseNum(0L, 4L * SizeBucketImpl.MiB)) { size =>
      val b = SizeBucketImpl.bucket(size)
      if (size <= 0) b == 0
      else if (size < SizeBucketImpl.MiB) b == 1
      else if (size < 2 * SizeBucketImpl.MiB) b == 2
      else b >= 3 || size < 4 * SizeBucketImpl.MiB && b == 3
    }

  property("size_bucket: agrees with the reference double-log model away from borders") =
    // reference Bucket2nModel computes (int)(log(size/2MiB)/log 2)+3 — the
    // integer rewrite must agree wherever floating log is unambiguous
    // (strictly between powers of two; AT a power the double model itself
    // mis-rounds, which is why the integer form exists)
    forAll(Gen.chooseNum(21, 62), Gen.chooseNum(1L, 1000L)) { (k, off) =>
      val size = (1L << k) + off // strictly above the 2^k border
      val refBucket =
        (math.log(size.toDouble / (2 * SizeBucketImpl.MiB)) / math.log(2d)).toInt + 3
      SizeBucketImpl.bucket(size) == refBucket
    }
}
