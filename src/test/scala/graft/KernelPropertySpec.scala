package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.canon.ConnectedComponents
import graft.text.Tok

/** Property tests defending the optimized kernels against their
  * specifications: the allocation-free char scans in Tok must agree with
  * the regex grammar they replaced, and the distributed connected
  * components must agree with a serial union-find on random graphs.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val WordOrPunct =
    """[A-Za-z0-9]+(?:'[A-Za-z0-9]+)*|[^\sA-Za-z0-9]""".r
  private val SentenceEnd = """(?<=[.!?])\s+""".r

  // text over a grammar-stressing alphabet: words, punctuation runs,
  // apostrophes, mixed whitespace
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(".", "!", "?", ",", ";", "'", "''", "$", "%", "-", "..."),
    Gen.oneOf(" ", "  ", "\t", "\n", " \n "),
    Gen.const("don't"), Gen.const("Q3 2024"), Gen.const("$1.5 million")
  )).map(_.mkString)

  test("countTokens char scan == regex token count on arbitrary text") {
    check(Prop.forAll(textGen) { text =>
      Tok.countTokens(text) == WordOrPunct.findAllIn(text).length
    })
  }

  test("countTokens agrees with tokenize length") {
    check(Prop.forAll(textGen) { text =>
      Tok.countTokens(text) == Tok.tokenize(text).length
    })
  }

  test("sentenceSplit char scan == regex split on arbitrary text") {
    check(Prop.forAll(textGen) { text =>
      val want = SentenceEnd.split(text).iterator
        .map(_.trim).filter(_.nonEmpty).toVector
      Tok.sentenceSplit(text) == want
    })
  }

  test("normalizeEntityName char scan == regex reference") {
    check(Prop.forAll(textGen) { name =>
      Tok.normalizeEntityName(name) ==
        name.trim.replaceAll("\\s+", " ").replaceAll("[.,;:!?]+$", "")
    })
  }

  test("normInfix char scan == regex reference (ASCII lowering)") {
    check(Prop.forAll(textGen) { s =>
      Tok.normInfix(s) == s.trim.replaceAll("\\s+", " ").toLowerCase
    })
  }

  test("connected components == serial union-find on random graphs") {
    lazy val spark = SparkTestBase.spark
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (f"v$a%03d", f"v$b%03d"))
    } yield edges.filter(e => e._1 != e._2).distinct
    check(Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        // localEdgeCap = 0 forces the distributed label-propagation loop;
        // the default takes the driver-local union-find fast path — both
        // must agree with the serial spec
        val distributed = ConnectedComponents
          .run(spark, edges.toDF("id1", "id2"), localEdgeCap = 0L)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val got = ConnectedComponents
          .run(spark, edges.toDF("id1", "id2"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(distributed === got)
        // serial union-find with min representative
        val parent = scala.collection.mutable.Map.empty[String, String]
        def find(x: String): String = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        verts.forall(v => got(v) == find(v))
      }
    }, n = 12)
  }

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.containerOfN[Array, Double](n, Gen.choose(-100.0, 100.0)))

  test("cosine kernel: range, symmetry, self-similarity, scale invariance") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def cos(a: Array[Double], b: Array[Double]): Double =
      graft.functions.CosineSim.compute(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b),
        aFloat = false, bFloat = false)
    check(Prop.forAllNoShrink(vecGen, vecGen, Gen.choose(0.1, 50.0)) { (a, b, s) =>
      val n = math.min(a.length, b.length)
      val (a2, b2) = (a.take(n), b.take(n))
      val c = cos(a2, b2)
      val selfOk = a2.forall(_ == 0.0) || math.abs(cos(a2, a2) - 1.0) < 1e-9
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 &&
        math.abs(cos(b2, a2) - c) < 1e-12 && selfOk &&
        math.abs(cos(a2.map(_ * s), b2) - c) < 1e-9
    })
  }

  // random sorted sparse vector: strictly increasing indices + values
  private val sparseGen: Gen[(Array[Int], Array[Double])] = for {
    n <- Gen.choose(0, 40)
    idx <- Gen.containerOfN[Set, Int](n, Gen.choose(0, 200))
    vals <- Gen.containerOfN[Array, Double](idx.size, Gen.choose(-10.0, 10.0))
  } yield (idx.toArray.sorted, vals)

  test("sparse_dot kernel: bit-equal to NameFeatures.dot (the serial " +
      "oracle's kernel) and to a map-based spec, via BOTH eval paths") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    lazy val spark = SparkTestBase.spark
    check(Prop.forAllNoShrink(sparseGen, sparseGen) { (a, b) =>
      val viaCompute = graft.functions.SparseDot.compute(
        ArrayData.toArrayData(a._1), ArrayData.toArrayData(a._2),
        ArrayData.toArrayData(b._1), ArrayData.toArrayData(b._2))
      // the linking contract: same adds in the same (ascending-index)
      // order as the serial kernel, so == not approx
      val viaSerial = graft.link.NameFeatures.dot(a, b)
      // algorithm-blind spec: ascending shared indices, map lookups
      val bMap = b._1.zip(b._2).toMap
      var spec = 0.0
      a._1.zip(a._2).foreach { case (i, v) =>
        bMap.get(i).foreach(w => spec += v * w)
      }
      viaCompute == viaSerial && viaCompute == spec
    })
    // whole-stage-codegen path through the Column wrapper must agree with
    // the interpreted compute (one deterministic row is enough: the
    // generated code calls the same static kernel — this pins the
    // expression plumbing, types, and null-safety wiring)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (ai, av) = (Array(1, 3, 7), Array(0.5, -2.0, 4.0))
    val (bi, bv) = (Array(3, 7, 9), Array(1.5, 0.25, 8.0))
    val got = Seq((ai.toSeq, av.toSeq, bi.toSeq, bv.toSeq))
      .toDF("i1", "v1", "i2", "v2")
      .select(graft.functions.SparseDot.sparseDot(
        col("i1"), col("v1"), col("i2"), col("v2")).as("d"))
      .collect().head.getDouble(0)
    assert(got === graft.link.NameFeatures.dot((ai, av), (bi, bv)))
    assert(got === -2.0 * 1.5 + 4.0 * 0.25)
  }

  test("sign-lsh kernel: positive scaling never moves a vector's bucket") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    check(Prop.forAllNoShrink(vecGen, Gen.choose(0.001, 1000.0),
      Gen.choose(1, 64)) { (a, s, planes) =>
      def bucket(v: Array[Double]) = graft.functions.SignLsh.compute(
        ArrayData.toArrayData(v), planes, aFloat = false)
      bucket(a) == bucket(a.map(_ * s)) &&
        // (1L << p) overflows to MIN_VALUE at p=63, so range-check only
        // buckets that fit a non-negative long
        (planes >= 63 || (bucket(a) >= 0 && bucket(a) < (1L << planes)))
    })
  }
}
