package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** High-diameter connected-components property: a shuffled PATH of 13-22
  * vertices (graph diameter 12-21) must collapse to one component with the
  * minimum id as label, and the loop must report convergence. This drives
  * the fixpoint loop through 7-21 propagation rounds — well past the
  * every-5-rounds `localCheckpoint` lineage guard, which a short-diameter
  * test never reaches.
  *
  * Sample count is capped: each sample is a full multi-round Spark fixpoint,
  * so 6 samples keep the suite fast while still varying path length, vertex
  * ids, edge direction and edge order.
  */
object CCDiameterPropertySpec extends Properties("graft-cc-diameter") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  property("highDiameterPathConverges") =
    Prop.forAllNoShrink(Gen.chooseNum(13, 22), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      // n distinct ids scattered over a wide domain, chained into a path in
      // shuffled order with random per-edge direction
      val ids = rnd.shuffle((1L to 1000L).toList).take(n)
      val edges = ids.sliding(2).map { w =>
        if (rnd.nextBoolean()) (w.head, w(1)) else (w(1), w.head)
      }.toList
      val res = graft.operators.ConnectedComponents
        .minLabelWithStats(edges.toDF("src", "dst"))
      val labels = res.labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      res.converged &&
        labels.keySet == ids.toSet &&
        labels.values.toSet == Set(ids.min)
    }
}
