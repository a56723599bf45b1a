package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.operators.Clustering

/** Property check: distributed connected components agrees with a
  * plain union-find reference on random graphs (the distributed
  * algorithm's only spec is "same components as the obvious sequential
  * algorithm").
  */
class ClusteringPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val genPairs: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 40) // node universe
    m <- Gen.choose(1, 60) // edges
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  private def ccProp(minTests: Int): Unit = {
    val prop = Prop.forAll(genPairs) { pairs =>
      pairs.isEmpty || {
        val got = Clustering.connectedComponents(spark, pairs.toDF("a_id", "b_id"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(pairs)
      }
    }
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: DISTRIBUTED components match union-find on random graphs") {
    // force the path-halving loop even for tiny graphs
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
    try ccProp(25)
    finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
  }

  test("property: LOCAL fast path matches union-find on random graphs") {
    ccProp(25) // default limit: these graphs all take the local path
  }
}
