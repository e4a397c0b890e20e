package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the TopKPerKey buffer algebra: for random value
  * sequences, arbitrary insert order, arbitrary merge splits, and all
  * three rank modes, the buffer must hold exactly the rows a
  * sort-based window would keep for `rank <= k` (the semantics the
  * operator replaces). Pure JVM — no SparkSession needed.
  */
class TopKBufferSpec extends AnyFunSuite {

  private val ord: TopKBuffer.Ord = new java.util.Comparator[InternalRow] {
    def compare(a: InternalRow, b: InternalRow): Int =
      java.lang.Long.compare(a.getLong(0), b.getLong(0))
  }

  private def row(v: Long): InternalRow = new GenericInternalRow(Array[Any](v))

  /** Reference: multiset of values a rank-window filter keeps. */
  private def reference(xs: Seq[Long], k: Int, mode: RankMode): Seq[Long] = {
    val sorted = xs.sorted
    mode match {
      case RankMode.RowNum => sorted.take(k)
      case RankMode.Rnk =>
        sorted.filter(v => sorted.count(_ < v) < k)
      case RankMode.DenseRnk =>
        val firstK = sorted.distinct.take(k).toSet
        sorted.filter(firstK)
    }
  }

  private def bufValues(b: TopKBuffer.Buf): Seq[Long] = b.map(_.getLong(0)).toSeq

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val gen = for {
    xs <- Gen.listOfN(40, Gen.chooseNum(0L, 9L)) // narrow domain → many ties
    k <- Gen.chooseNum(1, 6)
    mode <- Gen.oneOf(RankMode.RowNum, RankMode.Rnk, RankMode.DenseRnk)
  } yield (xs, k, mode)

  test("sequential insert equals the sort-based rank filter") {
    check(Prop.forAll(gen) { case (xs, k, mode) =>
      val buf = xs.foldLeft(new ArrayBuffer[InternalRow]) {
        (b, v) => TopKBuffer.insert(b, row(v), ord, k, mode)
      }
      // Sorted ascending AND the exact multiset the window keeps.
      bufValues(buf) == reference(xs, k, mode)
    })
  }

  test("any merge split equals the global result (partial-pass algebra)") {
    check(Prop.forAll(gen, Gen.chooseNum(0, 40)) { case ((xs, k, mode), cut0) =>
      val cut = cut0 % (xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      def build(ys: Seq[Long]) = ys.foldLeft(new ArrayBuffer[InternalRow]) {
        (b, v) => TopKBuffer.insert(b, row(v), ord, k, mode)
      }
      val merged = TopKBuffer.merge(build(l), build(r), ord, k, mode)
      bufValues(merged) == reference(xs, k, mode)
    })
  }

  test("ranked emission matches SQL rank semantics") {
    check(Prop.forAll(gen) { case (xs, k, mode) =>
      val buf = xs.foldLeft(new ArrayBuffer[InternalRow]) {
        (b, v) => TopKBuffer.insert(b, row(v), ord, k, mode)
      }
      val got = TopKBuffer.ranked(buf, ord, mode)
        .map { case (r, rk) => (r.getLong(0), rk) }.toSeq
      val sorted = bufValues(buf)
      val want = mode match {
        case RankMode.RowNum => sorted.zipWithIndex.map { case (v, i) => (v, i + 1) }
        case RankMode.Rnk =>
          sorted.map(v => (v, sorted.count(_ < v) + 1))
        case RankMode.DenseRnk =>
          val dr = sorted.distinct.zipWithIndex.toMap
          sorted.map(v => (v, dr(v) + 1))
      }
      got == want && got.forall(_._2 <= k)
    })
  }
}
