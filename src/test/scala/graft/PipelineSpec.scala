package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact dedup groups identical content") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye")).toDF("id", "text")
    val got = Dedup.exact(df, "id", "text").orderBy("keeper").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 1L), (1L, 3L)))
  }

  test("minhash estimate tracks true jaccard for near-identical docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 36).map(i => s"w$i").mkString(" ") + " x1 x2 x3 x4"
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val pairs = Dedup.minhashPairs(df, "id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)), "near-duplicate pair must be an LSH candidate")
    assert(pairs((1L, 2L)) > 0.5)
    assert(!pairs.contains((1L, 3L)), "disjoint docs should not collide")
  }

  test("simhash of identical docs is identical; near docs within hamming bound") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "z y x w v u t s"))
      .toDF("id", "text")
    val h = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 10)
  }

  test("language id picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat est dans la maison pour les amis")).toDF("id", "text")
    val got = TextAnalysis.languageId(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("repetition handles empty/one-word docs and exact all-dup fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, ""), (2L, "   "), (3L, "solo"),       // sub-2-word: no grams
      (4L, "a a"),                               // one gram, no repeats
      (5L, "x y x y x")                          // all grams duplicated
    ).toDF("id", "text")
    val got = TextAnalysis.repetition(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // empty/whitespace text splits to [""] (n_words 1), zero fractions
    assert(got(1L) == (1L, 0.0, 0.0, 0.0, 0.0))
    assert(got(2L) == (1L, 0.0, 0.0, 0.0, 0.0))
    assert(got(3L) == (1L, 0.0, 0.0, 0.0, 0.0))
    // "a a": rep_word 1/2; grams ["a a"] — no dup, top share 1.0
    assert(got(4L) == (2L, 0.5, 0.0, 0.0, 1.0))
    // "x y x y x": grams [x y, y x, x y, y x] — all covered, half repeats
    assert(got(5L) == (5L, 0.6, 1.0, 0.5, 0.5))
  }

  test("doc-frequency valve prunes stop-word-only candidate pairs") {
    import spark.implicits._
    // "the" appears in every doc; each real near-dup pair also shares a
    // rare token. With the valve at 2, the stop-word generates no
    // candidates, so (1,2) and (3,4) survive but (1,3)/(1,4)/(2,3)/(2,4)
    // — whose only shared token is "the" — are pruned.
    val docs = Seq(
      (1L, "the alpha beta"), (2L, "the alpha gamma"),
      (3L, "the delta eps"), (4L, "the delta zeta")).toDF("id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "id", "text",
      maxDocFrequency = Int.MaxValue).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val valved = Dedup.ngramJaccardPairs(docs, "id", "text", maxDocFrequency = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L), (3L, 4L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    assert(valved == Set((1L, 2L), (3L, 4L)), valved.toString)
  }

  test("embedding block valve excludes oversized blocks; valve-off equals naive all-pairs") {
    import spark.implicits._
    // block "hot" has 3 members (3 pairs), block "cold" has 2 (1 pair)
    val e = Seq(
      (1L, "hot", Array(1f, 0f)), (2L, "hot", Array(1f, 0f)), (3L, "hot", Array(0f, 1f)),
      (4L, "cold", Array(1f, 1f)), (5L, "cold", Array(1f, 1f)))
      .toDF("id", "blk", "emb")
    def pairs(cap: Int) =
      Dedup.blockedCosinePairs(e, "id", "blk", "emb", maxBlockSize = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Int.MaxValue) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)), "valve off = exact pair set")
    assert(pairs(2) == Set((4L, 5L)),
      "cap 2 must drop the 3-member hot block entirely, keep the cold block")
    intercept[IllegalArgumentException] {
      Dedup.blockedCosinePairs(e, "id", "blk", "emb", maxBlockSize = 0)
    }
  }

  test("simhash radius beyond chunk coverage is rejected; derived chunks keep recall") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "id", "text", maxHamming = 64)
    }
    // identical docs: hamming 0 must be found at any radius
    assert(Dedup.simhashPairs(docs, "id", "text", maxHamming = 7).count() == 1)
  }

  test("connected components: chains, isolated nodes, min-label clusters") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {99} isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val got = Dedup.clusters(pairs, ids, "id")
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("IVF ANN recall >= 0.9 vs brute force on clustered vectors") {
    import graft.operators.IvfAnn
    import graft.functions.VectorFunctions
    import spark.implicits._
    // 4 well-separated clusters in 8-d; probe sits in cluster 0
    val rnd = new scala.util.Random(11)
    def pt(c: Int): Seq[Float] =
      Seq.tabulate(8)(j => (if (j % 4 == c) 10f else 0f) + rnd.nextGaussian().toFloat * 0.3f)
    val vecs = (0 until 200).map(i => (i.toLong, pt(i % 4))).toDF("vec_id", "embedding")
    val probe = pt(0)
    import org.apache.spark.sql.functions.{col, typedlit}
    val brute = vecs
      .select(col("vec_id"),
        VectorFunctions.cosine_similarity(col("embedding"), typedlit(probe)).as("s"))
      .orderBy(col("s").desc).limit(10).collect().map(_.getLong(0)).toSet
    val idx = IvfAnn.build(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val got = IvfAnn.search(idx, probe, topK = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(got).size / 10.0
    assert(recall >= 0.9, s"recall $recall, brute=$brute got=$got")
  }

  test("IVF training refuses k above the driver-state bound") {
    import graft.operators.IvfAnn
    import spark.implicits._
    val vecs = (0 until 10).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    // every collect in build() is <= k rows, so the cap on k IS the cap
    // on driver-resident training state — an over-cap k must refuse at
    // call time, before any job runs, regardless of input size
    val e = intercept[IllegalArgumentException] {
      IvfAnn.build(vecs, "vec_id", "embedding", k = IvfAnn.maxCentroids + 1)
    }
    assert(e.getMessage.contains("maxCentroids"))
  }

  test("int8 quantization: recall@10 >= 0.9 vs exact cosine, codes bounded") {
    import graft.operators.VectorQuant
    import graft.functions.VectorFunctions
    import spark.implicits._
    import org.apache.spark.sql.functions.{abs => sabs, col, typedlit, aggregate, lit, greatest, element_at}
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 300)
      .map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val probe = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val brute = vecs.select(col("vec_id"),
        VectorFunctions.cosine_similarity(col("embedding"), typedlit(probe)).as("s"))
      .orderBy(col("s").desc).limit(10).collect().map(_.getLong(0)).toSet
    val q = VectorQuant.quantize(vecs, "vec_id", "embedding")
    // codes stay in [-127, 127]
    val mx = q.select(aggregate(col("qvec").cast("array<int>"), lit(0),
      (a, x) => greatest(a, sabs(x))).as("m"))
      .agg(org.apache.spark.sql.functions.max(col("m"))).head().getInt(0)
    assert(mx <= 127)
    val got = VectorQuant.searchCosine(q, "vec_id", probe, topK = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(got).size / 10.0
    assert(recall >= 0.9, s"recall $recall, brute=$brute got=$got")
  }

  test("IVF+SQ8 composed layout: returned items are within quantization error of true top-10") {
    import graft.operators.{IvfAnn, VectorQuant}
    import graft.functions.VectorFunctions
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, typedlit}
    // same 4-cluster generator as the IVF test; under near-ties ID-level
    // recall is meaningless (any reordering within quantization error
    // swaps ids), so the pinned property is SIMILARITY recall: every
    // returned item's EXACT cosine is within tolerance of the true 10th
    val rnd = new scala.util.Random(11)
    def pt(c: Int): Seq[Float] =
      Seq.tabulate(8)(j => (if (j % 4 == c) 10f else 0f) + rnd.nextGaussian().toFloat * 0.3f)
    val vecs = (0 until 200).map(i => (i.toLong, pt(i % 4))).toDF("vec_id", "embedding")
    val probe = pt(0)
    val exactSims = vecs
      .select(col("vec_id"),
        VectorFunctions.cosine_similarity(col("embedding"), typedlit(probe))
          .cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tenthBest = exactSims.values.toSeq.sorted(Ordering[Double].reverse)(9)

    val idx = IvfAnn.build(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val qlists = VectorQuant.quantize(idx.lists, "vec_id", "embedding")
    assert(qlists.columns.contains("cid"), "cid must survive quantization")
    val cids = IvfAnn.probeCids(idx, probe, nprobe = 2)
    val got = VectorQuant.searchCosine(qlists.filter(col("cid").isin(cids: _*)),
        "vec_id", probe, topK = 10)
      .collect().map(_.getLong(0))
    assert(got.length == 10)
    got.foreach { id =>
      assert(exactSims(id) >= tenthBest - 0.02,
        s"id $id exact sim ${exactSims(id)} below 10th-best $tenthBest - tol")
    }
  }

  test("probe and stored codes agree on negative half-step components; zero vectors rank last") {
    import graft.operators.VectorQuant
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // near-half-step components (x/scale ≈ ±k.5): float arithmetic lands
    // exactly on the half while Spark's double arithmetic does not, and
    // the rounding modes differ on negative halves — the probe must
    // reproduce Spark's codes bit-for-bit either way
    val v = Seq(12.7f, -0.25f, 0.35f, 1.0f)
    val stored = VectorQuant.quantize(Seq((1L, v)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select(col("qvec")).head().getSeq[Byte](0)
    val (probe, _) = VectorQuant.quantizeProbe(v)
    assert(stored.toSeq == probe.toSeq,
      s"stored=$stored probe=$probe — rounding modes diverged")

    // a zero vector quantizes to zero codes → NaN cosine; it must sink to
    // the bottom of the descending top-k, not float to rank 1
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorQuant.searchCosine(
        VectorQuant.quantize(corpus, "vec_id", "embedding"),
        "vec_id", Seq(1.0f, 0.0f), topK = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head != 3L, s"zero vector ranked first: $got")
    assert(got.last == 3L, s"zero vector should rank last: $got")
  }

  test("int8 quantization round-trips within one quantization step") {
    import graft.operators.VectorQuant
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = Seq(
      (1L, Seq(1.0f, -2.5f, 0.0f, 127.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: scale 0, zero codes
      (3L, Seq(-0.001f, 0.0005f, 0.00075f, -0.0002f))).toDF("vec_id", "embedding")
    val q = VectorQuant.quantize(vecs, "vec_id", "embedding")
      .join(vecs, "vec_id").orderBy("vec_id")
      .select(col("vec_id"), col("qvec"), col("qscale"), col("embedding"))
      .collect()
    q.foreach { r =>
      val codes = r.getSeq[Byte](1)
      val scale = r.getFloat(2)
      val orig = r.getSeq[Float](3)
      codes.zip(orig).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-7,
          s"vec ${r.getLong(0)}: code $c scale $scale orig $x")
      }
    }
  }

  test("PNG decode recovers the synthetic test-card means exactly") {
    import graft.operators.Multimodal
    import spark.implicits._
    val imgs = Seq(3L, 7L).toDF("id").as[Long]
      .map(id => Multimodal.ImageRow(id, Multimodal.syntheticPng(id)))
    val got = Multimodal.decodeImages(imgs).collect().sortBy(_.doc_id)
    got.foreach { f =>
      assert(f.width == 16 && f.height == 16)
      val expR = (for (x <- 0 until 16; y <- 0 until 16)
        yield ((f.doc_id * 7 + x * 3 + y * 5) % 256).toDouble).sum / 256
      assert(math.abs(f.mean_r - expR) < 1e-9, s"doc ${f.doc_id}: ${f.mean_r} vs $expR")
    }
  }

  test("video frame sampling: seeked means match the pixel formula; guards") {
    import graft.operators.Multimodal
    import spark.implicits._
    val vids = Seq(3L, 7L).toDF("id").as[Long]
      .map(id => Multimodal.VideoRow(id, Multimodal.syntheticVideo(id)))
    val got = Multimodal.sampleFrames(vids, every = 3).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    assert(got.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9, 0, 3, 6, 9))
    got.foreach { f =>
      assert(f.n_frames == 12)
      val exp = (0 until 64).map(p =>
        ((f.doc_id * 7 + f.frame_idx * 13 + p * 3) % 256).toDouble).sum / 64
      assert(math.abs(f.mean_gray - exp) < 1e-9,
        s"doc ${f.doc_id} frame ${f.frame_idx}: ${f.mean_gray} vs $exp")
    }
    // every=1 visits all frames; sampled set must be a subset of it
    val all = Multimodal.sampleFrames(vids, every = 1).collect()
      .map(f => (f.doc_id, f.frame_idx, f.mean_gray)).toSet
    assert(got.forall(f => all.contains((f.doc_id, f.frame_idx, f.mean_gray))))
    // truncated container throws loudly instead of mis-parsing
    val bad = Seq(1L).toDF("id").as[Long]
      .map(id => Multimodal.VideoRow(id, Multimodal.syntheticVideo(id).dropRight(5)))
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(bad).collect()
    }
  }

  test("multimodal stub features are deterministic and shaped") {
    val ds = Multimodal.fromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.feature.length == 8))
    val again = Multimodal.extractFeatures(ds).collect()
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
    val byId = feats.map(f => f.doc_id -> f).toMap
    assert(byId.values.forall(f => f.n_bytes > 0 && f.header_hex.length == 8))
  }
}
