package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorOps

/** PQ-CASCADE DIAL SWEEP (round-14 verdict item 3): v43's width-robust
  * cascade bought its d=1536 speedup (6.39× → 1.79× cost ratio vs d=64)
  * with a recall debit — 0.88@C2=30 vs v32's SQ8 0.92@C2=15 — and v32/v43
  * share the SAME stage-1 (64-bit sign Hamming top-100), so the loss is
  * entirely stage-2 PQ ranking fidelity and the stage-1 ceiling is known
  * ≥ 0.92. This main sweeps the training dials the verdict names
  * (centroids-per-subspace k, train-sample stride, Lloyd steps, stage-2
  * keep C2) on an arbitrary corpus and prints recall@5 + wall per arm —
  * the measurement that picks the registered default. Ground truth
  * (exact top-5) is computed ONCE per run and reused across arms.
  *
  * Usage: `graft.CascadeTune <corpusDir> k=K,s=S,t=T,c2=C [...]`
  * e.g. `graft.CascadeTune /tmp/dimvol1536 k=16,s=8,t=1,c2=30 k=64,s=4,t=2,c2=30`
  */
object CascadeTune {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CascadeTune <corpusDir> k=..,s=..,t=..,c2=.. ...")
    val dir = args(0)
    val arms = args.drop(1).toSeq.map { a =>
      val m = a.split(",").map { kv =>
        val Array(n, v) = kv.split("=", 2); (n, v.toInt)
      }.toMap
      (m("k"), m("s"), m("t"), m.getOrElse("c1", 100), m("c2"), m.getOrElse("w", 4))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.StressSession.builder(dir, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    val run = VectorOps.withHashAggBudget { (s, d) =>
      val e = VectorOps.emb(s, d)
      val qs = e.filter(expr("vec_id % 100 = 0"))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"),
          col("norm").as("qn"))
      VectorOps.cosineTopK(e, qs, 5).select(col("q_id"), col("c_id"))
    }
    val exact = run(spark, dir).localCheckpoint(true)
    val nExact = exact.count()
    System.err.println(s"[tune] exact ground truth: $nExact rows")

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    val rows = arms.map { case (k, s0, t, c1, c2, w) =>
      val t0 = System.nanoTime()
      val armRun = VectorOps.withHashAggBudget { (s, d) =>
        graft.functions.VectorFunctions.register(s)
        val (_, _, casc, _) = VectorOps.cascadePq(VectorOps.emb(s, d),
          k = k, stride = s0, steps = t, c1 = c1, c2 = c2, words = w)
        casc.select(col("q_id"), col("c_id"))
      }
      val top5 = armRun(spark, dir)
      val nHit = top5.join(exact, Seq("q_id", "c_id"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = nHit.toDouble / nExact
      System.err.println(f"[tune] k=$k s=$s0 t=$t c1=$c1 c2=$c2 w=$w: " +
        f"recall@5=$recall%.4f wall=$secs%.1f s")
      s"""{"k":$k,"stride":$s0,"steps":$t,"c1":$c1,"c2":$c2,"words":$w,""" +
        s""""recall_at_5":${num(recall)},"wall_s":${num(secs)}}"""
    }
    println(s"""{"metric":"cascade_tune","corpus":"$dir","n_exact":$nExact,""" +
      s""""arms":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
