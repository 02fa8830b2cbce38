package graft.operators

import org.apache.spark.sql.Dataset

/** The shared integer-lattice k-means kernel behind a23 (k-means
  * examples parity) and c19 (trained IVF codebook): vectors quantized
  * to the 2^-10 grid, distances exact BIGINT, centroid update
  * floor(sum/cnt) — every round bit-reproducible in DuckDB. ONE copy of
  * the oracle-sensitive rules (tie keeps the smaller cluster index;
  * empty clusters keep their previous centroid) so the two operators
  * can never drift apart.
  */
private[operators] object IntLattice {

  /** 2^-10 grid quantization (c15's trick). */
  def quantize(e: Array[Float]): Array[Long] =
    e.map(v => math.floor(v.toDouble * 1024.0).toLong)

  /** Nearest centroid by exact squared L2 — ascending scan, so a
    * distance tie keeps the SMALLER index (oracle: ORDER BY dist, c).
    */
  def assign(qv: Array[Long], cs: Array[Array[Long]], dim: Int): (Int, Long) = {
    var best = 0; var bd = Long.MaxValue
    var c = 0
    while (c < cs.length) {
      var dist = 0L; var i = 0
      while (i < dim) { val df = qv(i) - cs(c)(i); dist += df * df; i += 1 }
      if (dist < bd) { bd = dist; best = c }
      c += 1
    }
    (best, bd)
  }

  /** One distributed Lloyd round: per-partition partial (count, inertia,
    * sum-vector) per cluster, merged with an RDD reduceByKey — the
    * classic MR combine; the driver sees k rows.
    */
  def round(q: Dataset[(Long, Array[Long])], cents: Array[Array[Long]],
      dim: Int): Map[Int, (Long, Long, Array[Long])] = {
    val bc = q.sparkSession.sparkContext.broadcast(cents)
    q.rdd.mapPartitions { it =>
      val cs = bc.value
      val kk = cs.length
      val cnt = new Array[Long](kk)
      val inr = new Array[Long](kk)
      val sums = Array.ofDim[Long](kk, dim)
      it.foreach { case (_, qv) =>
        val (best, bd) = assign(qv, cs, dim)
        cnt(best) += 1; inr(best) += bd
        var i = 0
        while (i < dim) { sums(best)(i) += qv(i); i += 1 }
      }
      (0 until kk).iterator.map(c => (c, (cnt(c), inr(c), sums(c))))
    }.reduceByKey {
      (x: (Long, Long, Array[Long]), y: (Long, Long, Array[Long])) =>
        (x._1 + y._1, x._2 + y._2,
          Array.tabulate(dim)(i => x._3(i) + y._3(i)))
    }.collect().toMap
  }

  /** floor(sum/cnt) centroid update; an empty cluster keeps its
    * previous centroid.
    */
  def update(cents: Array[Array[Long]],
      agg: Map[Int, (Long, Long, Array[Long])], dim: Int): Array[Array[Long]] =
    Array.tabulate(cents.length) { c =>
      agg.get(c) match {
        case Some((cn, _, ss)) if cn > 0 =>
          Array.tabulate(dim)(i => math.floor(ss(i).toDouble / cn).toLong)
        case _ => cents(c)
      }
    }
}
