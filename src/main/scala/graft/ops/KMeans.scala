package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, expressed as DataFrame ops —
  * the trained-codebook path for the IVF/PQ quantizers (round-3 verdict
  * item 4; the reserved-vector codebooks stay as the deterministic-oracle
  * stand-in).
  *
  * Shape per iteration (the 100 TB contract):
  *  - assignment is ONE narrow whole-stage-codegen pass: the current
  *    centroids ride into the plan as a literal (k×dim doubles — a model
  *    artifact, broadcast like any literal) and `pq_encode(v, book, dim, k)`
  *    computes the L2 argmin per row — no centroid join, no argmin window;
  *  - the mean update is posexplode → two-level hash aggregation keyed on
  *    (cell, dim position): k×dim running sums, partial map-side — the only
  *    shuffle, k×dim×partitions rows max;
  *  - the driver holds k×dim doubles per round (the new centroids), never
  *    data rows. Input is `localCheckpoint`ed ONCE so each round re-reads a
  *    materialized sample instead of re-running the upstream plan (the
  *    resolveClusters iterative-lineage rule, ops/Dedup.scala).
  *
  * Convergence is decided driver-side from the collected centroids (max
  * L2 shift <= tol), so no extra action per round. Empty cells keep their
  * previous centroid. Deterministic given a fixed `init` up to float
  * summation order in the distributed means (ties in argmin break to the
  * lowest cell id; see [[graft.functions.VecAlg.pqEncode]]).
  */
object KMeans {

  /** first-k-by-id deterministic seeding (the same convention as the
    * reserved-vector codebooks; swap for k-means++ on real corpora) */
  def seedById(e: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] = {
    val rows = e.orderBy(col(idCol)).limit(k).select(vecCol).collect()
    require(rows.length == k, s"need $k seed vectors, corpus has ${rows.length}")
    rows.map(_.getSeq[Double](0).toArray)
  }

  /** Train centroids from `init` over `e(vecCol: array<double>)`; returns
    * the k×dim codebook. `sampleFraction` < 1 trains on a seeded sample —
    * at 100 TB the quantizer never needs the full corpus. */
  def train(
      e: DataFrame, vecCol: String, init: Array[Array[Double]],
      maxIters: Int = 10, tol: Double = 1e-9,
      sampleFraction: Double = 1.0, seed: Long = 20260813L): Array[Array[Double]] = {
    require(init.nonEmpty && maxIters > 0)
    graft.functions.GraftFunctions.register(e.sparkSession)
    val base = e.select(col(vecCol).as("v")).filter(col("v").isNotNull)
    val sample =
      (if (sampleFraction < 1.0) base.sample(withReplacement = false, sampleFraction, seed)
       else base).localCheckpoint()
    val k = init.length
    val dim = init(0).length
    var cents = init
    var iter = 0
    var shift = Double.MaxValue
    while (iter < maxIters && shift > tol) {
      val bookLit = typedLit(cents.map(_.toSeq).toSeq)
      val means = sample
        .select(
          element_at(call_udf("pq_encode", col("v"), bookLit, lit(dim), lit(k)), 1).as("cid"),
          posexplode(col("v")))
        .filter(col("cid").isNotNull) // rows not matching the centroid dim
        .groupBy("cid", "pos").agg(avg("col").as("m"))
        .collect()
      val next = Array.tabulate(k)(c => cents(c).clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      shift = cents.indices.map(c =>
        graft.functions.VecAlg.l2DistArr(cents(c), next(c))).max
      cents = next
      iter += 1
    }
    cents
  }
}
