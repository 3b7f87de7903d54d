package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour index — the partitioned-index
  * complement to the hyperplane-LSH path (queries/Pipeline.scala
  * `sim_ann_lsh`). A coarse quantizer (k centroids, Lloyd-refined)
  * partitions the vector set into inverted lists; a query scans only the
  * `nprobe` nearest lists, giving the recall-vs-cost knob IVF is used for
  * (FAISS IndexIVF shape; reference has no native ANN index — this is
  * part of the beyond-reference LLM-pipeline surface).
  *
  * Scale design: centroid count k is small (≤ a few thousand), so the
  * centroid table lives driver-side and the assignment step is a pure
  * codegen'd argmax expression over the vector column — NO cross join,
  * no shuffle. Training is `iters` keyed aggregations (posexplode →
  * groupBy(cid, pos) → avg), each one shuffle bounded by k×dim rows.
  * Search filters the inverted lists by centroid id (partition-prunable
  * if the list table is written partitioned by cid) and brute-forces only
  * the probed lists.
  */
object IvfAnn {

  /** Ceiling on the coarse-quantizer cell count. Driver state is
    * k × dim floats (4096 × 1024-dim ≈ 16 MB) and the per-row assignment
    * expression is O(k); both stay sane below this.
    */
  val maxCentroids: Int = 4096

  case class Index(centroids: Seq[(Int, Seq[Float])], lists: DataFrame,
                   idCol: String, vecCol: String)

  /** Nearest-centroid id as a codegen'd argmax expression: an array of
    * (similarity, cid) structs sorted ascending — last element is the
    * best centroid (ties → larger cid, deterministic).
    */
  private def nearestCid(vec: Column, cents: Seq[(Int, Seq[Float])]): Column =
    element_at(
      array_sort(array(cents.map { case (cid, cv) =>
        struct(VectorFunctions.cosine_similarity(vec, typedlit(cv)).as("sim"),
          lit(cid).as("cid"))
      }: _*)),
      -1).getField("cid")

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** Train the coarse quantizer and materialize the inverted lists.
    * Seeds = a deterministic hash-spread sample: rows ranked by
    * xxhash64(id) and the top k taken — the FAISS-default random sample
    * made reproducible. (An earlier draft seeded from the k SMALLEST ids;
    * when ids correlate with content — typical for ingest order — the
    * seeds clump in one region and Lloyd converges to lopsided lists.)
    * Then `iters` Lloyd refinements. Collected state is k×dim floats —
    * tiny; the ranking is a TakeOrdered of k rows, not a full sort.
    */
  def build(vecs: DataFrame, idCol: String, vecCol: String,
            k: Int = 16, iters: Int = 2): Index = {
    require(k > 0 && iters >= 0)
    // Hard bound on the driver-resident state: every collect in this
    // method is ≤ k rows (seed sample = TakeOrdered(k); Lloyd refresh =
    // k centroid rows), so capping k caps the driver memory at
    // maxCentroids × dim floats regardless of input size. A quantizer
    // needing more cells than this wants a distributed kmeans‖ (or a
    // two-level IVF) — refuse loudly rather than OOM the driver.
    require(k <= maxCentroids,
      s"IVF k=$k exceeds maxCentroids=$maxCentroids; driver-side Lloyd " +
        "training is bounded by design — use a coarser quantizer or a " +
        "two-level index")
    var cents: Seq[(Int, Seq[Float])] = vecs
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0) }.toSeq
    for (_ <- 0 until iters) {
      val refined = vecs
        .select(nearestCid(col(vecCol), cents).as("cid"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cid"), transform(col("ps"), p => p.getField("m").cast("float")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toSeq
      // empty lists drop their centroid; keep the previous one in place
      val byId = refined.toMap
      cents = cents.map { case (cid, old) => cid -> byId.getOrElse(cid, old) }
    }
    val lists = vecs.select(col(idCol), col(vecCol),
      nearestCid(col(vecCol), cents).as("cid"))
    Index(cents, lists, idCol, vecCol)
  }

  /** The `nprobe` nearest inverted-list ids for a probe — driver-side
    * arithmetic over the k×dim centroid state (tiny). Exposed so other
    * index layouts (IVF+SQ8) can reuse the coarse-quantizer routing.
    */
  def probeCids(index: Index, probe: Seq[Float], nprobe: Int): Seq[Int] =
    index.centroids
      .sortBy { case (cid, cv) => (-cosine(probe, cv), cid) }
      .take(nprobe).map(_._1)

  /** Top-k by cosine among the `nprobe` nearest inverted lists. */
  def search(index: Index, probe: Seq[Float], topK: Int, nprobe: Int): DataFrame = {
    val probeCids = this.probeCids(index, probe, nprobe)
    index.lists
      .filter(col("cid").isin(probeCids: _*))
      .select(col(index.idCol),
        VectorFunctions.cosine_similarity(col(index.vecCol), typedlit(probe))
          .cast("double").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(index.idCol))
      .limit(topK)
  }
}
