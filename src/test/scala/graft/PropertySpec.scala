package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Algebraic invariants via scalacheck's raw runner (SURVEY.md §5
  * item 4; no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private val smallList = Gen.listOfN(30, Gen.chooseNum(-5, 5))

  test("fold_hash equals a reference Scala fold on arbitrary ASCII strings") {
    graft.functions.GraftFunctions.register(spark)
    val asciiStr = Gen.listOfN(12, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(8, asciiStr)) { ss =>
      val expected = ss.map(_.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
      val got = ss.toDF("w")
        .selectExpr("fold_hash(w, 31, 0, 1000000007)")
        .as[Long].collect().toSeq
      got == expected
    })
  }

  test("unionAll count equals sum of counts") {
    check(Prop.forAll(smallList, smallList) { (a, b) =>
      val (da, db) = (a.toDF("x"), b.toDF("x"))
      da.unionAll(db).count() == da.count() + db.count()
    })
  }

  test("semi-join rows are a subset of distinct inner-join keys") {
    check(Prop.forAll(smallList, smallList) { (a, b) =>
      val da = a.toDF("x")
      val db = b.toDF("y")
      val semi = da.join(db, da("x") === db("y"), "left_semi")
        .as[Int].collect().toSet
      val inner = da.join(db, da("x") === db("y")).select(da("x"))
        .as[Int].collect().toSet
      semi == inner
    })
  }

  test("rollup row count = leaf groups + distinct prefixes + 1") {
    check(Prop.forAll(Gen.listOfN(25, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0, 3)))) { rows =>
      val df = rows.toDF("g1", "g2")
      val n = df.rollup("g1", "g2").count().count()
      val leaves = rows.distinct.size
      val prefixes = rows.map(_._1).distinct.size
      n == leaves + prefixes + 1
    })
  }

  test("intersect ⊆ both sides; except ∩ right = ∅") {
    check(Prop.forAll(smallList, smallList) { (a, b) =>
      val inter = a.toDF("x").intersect(b.toDF("x")).as[Int].collect().toSet
      val exc = a.toDF("x").except(b.toDF("x")).as[Int].collect().toSet
      inter.subsetOf(a.toSet) && inter.subsetOf(b.toSet) &&
        exc.subsetOf(a.toSet) && exc.intersect(b.toSet).isEmpty
    })
  }

  test("string bound ordering agrees with UTF8String binary order on " +
    "supplementary characters") {
    // Manifest string bounds come from Spark min/max, which compares
    // UTF8String BYTES; Java's Ordering.String compares UTF-16 code
    // units. The two disagree exactly for supplementary (non-BMP)
    // chars vs U+E000–U+FFFF — a pruning-soundness bug if the store
    // compared bounds under the wrong one (ADVICE r6). Generate
    // strings mixing ASCII, a private-use BMP char (U+E000), and a
    // supplementary char (U+10000 as surrogate pair) and require the
    // store's ordering to match UTF8String.compareTo on every pair.
    val unit = Gen.oneOf(
      Gen.choose(32.toChar, 126.toChar).map(_.toString),
      // U+E000 spelled via toChars, not an (invisible) literal: a
      // raw private-use char in source reads as an empty string
      // and the discriminating case looks missing (ADVICE r7).
      Gen.const(new String(Character.toChars(0xe000))),
      Gen.const(new String(Character.toChars(0x10000))),
      Gen.const(new String(Character.toChars(0x1f600))))
    val str = Gen.listOfN(4, unit).map(_.mkString)
    check(Prop.forAll(str, str) { (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      val expect = Integer.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      val got = Integer.signum(
        graft.sources.SnapStore.utf8BytesOrd.compare(a, b))
      got == expect
    })
  }
}
