package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication primitives for training-data pipelines.
  *
  * Every path is expressed as keyed shuffles (explode → groupBy →
  * equi-join on bucket keys) — never an n² cross join — so the same plans
  * run at 100 TB: candidate generation is LSH-bucketed, and only
  * candidate pairs pay the exact-similarity cost.
  *
  * Hash-permutation constants derive from a fixed seed, so results are
  * deterministic across runs and cluster sizes.
  */
object Dedup {

  /** MinHash modulus (prime > 2³²); `a` bounded to 2³¹ keeps a·h < 2⁶³. */
  private val P = 4294967311L

  private def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Word n-gram shingles of a text column (n=1 → tokens). */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    if (n == 1) words
    else when(size(words) < n, array(array_join(words, " ")))
      .otherwise(transform(sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + lit(1), lit(n)), " ")))
  }

  /** Exact content dedup: group by a content hash, keep the smallest id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** MinHash signatures: one row per id with a k-long signature array.
    * One explode + one hash-aggregate — shuffle keyed on id.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, shingleN: Int = 1): DataFrame = {
    val sh = df
      .select(col(idCol), explode(wordShingles(col(textCol), shingleN)).as("sh"))
      .distinct()
      .select(col(idCol), xxhash64(col("sh")).bitwiseAND(lit(0xffffffffL)).as("h"))
    val aggs = perms(k).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"_m$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH banding: signature → (band index, band key) rows; docs sharing a
    * band key are candidate pairs. bandR = rows per band (k / bands).
    */
  def lshCandidates(sig: DataFrame, idCol: String, bands: Int, bandR: Int): DataFrame = {
    val banded = sig.select(col(idCol), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            array_join(transform(slice(col("sig"), b * bandR + lit(1), lit(bandR)),
              x => x.cast("string")), "_").as("key")))).as("bk"))
      .select(col(idCol), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
  }

  /** Candidate pairs with the MinHash similarity estimate (fraction of
    * agreeing signature positions).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, bands: Int = 16): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, k)
    lshCandidates(sig, idCol, bands, k / bands)
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (u, v) => when(u === v, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("double") / k).as("est_sim"))
  }

  /** 64-bit SimHash per id: token hash sign-votes per bit position. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("w"))
      .select(col(idCol), xxhash64(col("w")).as("h"))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"_b$j")
    }
    tok.groupBy(col(idCol)).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j => when(col(s"_b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup candidates: pigeonhole on `maxHamming + 1` chunks
    * (hamming ≤ maxHamming ⇒ the differing bits miss at least one chunk,
    * so that chunk's key matches exactly), then exact bit-hamming filter.
    * The chunk count is DERIVED from `maxHamming` so the candidate set is
    * complete for the requested radius — a fixed chunking would silently
    * miss pairs whose differing bits touch every chunk. Wider radii mean
    * narrower chunk keys and quadratically larger candidate buckets;
    * keep maxHamming small (the near-dup regime) at scale.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nChunks = maxHamming + 1
    val sh = simhash(df, idCol, textCol)
    val parts = (0 until nChunks).map { c =>
      val lo = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      sh.select(col(idCol), col("simhash"), lit(c).as("chunk"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("key"))
    }.reduce(_ unionAll _)
    val l = parts.select(col(idCol).as("id_a"), col("simhash").as("h_a"), col("chunk"), col("key"))
    val r = parts.select(col(idCol).as("id_b"), col("simhash").as("h_b"), col("chunk"), col("key"))
    l.join(r, Seq("chunk", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a similarity-pair edge list — the final
    * dedup step (one keeper per near-duplicate cluster). Iterative
    * min-label propagation: every node adopts the smallest label among
    * itself and its neighbors until fixpoint; cluster id = smallest
    * member id. Each iteration is one keyed shuffle join; iteration
    * count is the graph diameter (near-dup clusters are shallow), and
    * `localCheckpoint` truncates lineage like RecursiveCte.
    *
    * @param pairs edge list with columns (id_a, id_b)
    * @param ids   all node ids (isolated nodes become singleton clusters)
    * @return (id, cluster) with cluster = min id of the component
    */
  def clusters(pairs: DataFrame, ids: DataFrame, idCol: String): DataFrame = {
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("d"))
      .unionAll(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
      .distinct().localCheckpoint(true)
    var labels = ids.select(col(idCol).as("s"), col(idCol).as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < 50) {
      val nbrMin = edges
        .join(labels.select(col("s").as("d"), col("cluster").as("ncl")), Seq("d"))
        .groupBy(col("s")).agg(min(col("ncl")).as("nmin"))
      val next = labels.join(nbrMin, Seq("s"), "left")
        .select(col("s"), least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("cluster", "old"), Seq("s"))
        .filter(col("cluster") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    // mirror RecursiveCte.iterate: unconverged labels are WRONG cluster
    // ids — fail loudly rather than return them (a component with
    // diameter > 50 needs pointer-doubling, not silent truncation)
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge after $i iterations " +
        "(component diameter exceeds the cap)")
    labels.select(col("s").as(idCol), col("cluster"))
  }

  /** Embedding near-dup candidates: exact cosine within label blocks.
    * Pair generation is an equi-join on the block key — quadratic only
    * WITHIN a block, so the one scale hazard is a hot block.
    *
    * @param maxBlockSize scale valve mirroring [[ngramJaccardPairs]]'s
    *   doc-frequency cap: blocks with more than this many members are
    *   EXCLUDED from all-pairs generation (a block of k rows emits k²/2
    *   pairs — one hot label would be a quadratic cell at 100 TB; route
    *   oversized blocks through the LSH/IVF candidate prefilter instead,
    *   see Pipeline's sim_ann_* paths). No default: every call site
    *   states its posture — `Int.MaxValue` for the exact
    *   (oracle-verifiable) pair set on bounded inputs, a finite cap
    *   (10⁴ is a reasonable corpus value) for the scale-safe valve — so
    *   an incomplete pair set can never be selected silently.
    */
  def blockedCosinePairs(df: DataFrame, idCol: String, blockCol: String,
                         vecCol: String, maxBlockSize: Int): DataFrame = {
    require(maxBlockSize > 0, s"maxBlockSize must be positive, got $maxBlockSize")
    val base = df.select(col(idCol), col(blockCol).as("_blk"), col(vecCol).as("_v"))
    val in =
      if (maxBlockSize == Int.MaxValue) base
      else {
        val ok = base.groupBy(col("_blk")).agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= maxBlockSize).select(col("_blk"))
        base.join(broadcast(ok), Seq("_blk"))
      }
    val a = in.select(col(idCol).as("id_a"), col("_blk"), col("_v").as("emb_a"))
    val b = in.select(col(idCol).as("id_b"), col("_blk"), col("_v").as("emb_b"))
    a.join(b, Seq("_blk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.cosine_similarity(col("emb_a"), col("emb_b"))
          .as("cos_sim"))
  }

  /** Exact word-set Jaccard over candidate pairs generated by shared-token
    * blocking. For any threshold > 0 this equals the full n² result
    * (jaccard > 0 ⇒ the pair shares a token ⇒ the block join emits it).
    *
    * @param maxDocFrequency scale valve: tokens appearing in more than
    *   this many documents are excluded from blocking (a token shared by
    *   k docs emits k² candidate pairs — ubiquitous stop-words make the
    *   candidate set quadratic). With a cap, a pair is only missed if
    *   *every* shared token is ubiquitous, which also means its jaccard
    *   is dominated by stop-words — acceptable for near-dup mining at
    *   100 TB. The parameter has NO default: every call site states its
    *   posture explicitly — `Int.MaxValue` for the exact
    *   (oracle-verifiable) pair set on bounded inputs, a finite cap
    *   (1000 is a good web-corpus value) for the scale-safe valve — so
    *   an approximate candidate set can never be selected silently.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        maxDocFrequency: Int): DataFrame = {
    val ws = df.select(col(idCol), array_distinct(split(col(textCol), "\\s+")).as("ws"))
    val allTokens = ws.select(col(idCol), explode(col("ws")).as("w"))
    val tokens =
      if (maxDocFrequency == Int.MaxValue) allTokens
      else {
        val rare = allTokens.groupBy(col("w"))
          .agg(count(lit(1)).as("_df")).filter(col("_df") <= maxDocFrequency)
          .select(col("w"))
        allTokens.join(broadcast(rare), Seq("w"))
      }
    val cand = tokens.select(col(idCol).as("id_a"), col("w"))
      .join(tokens.select(col(idCol).as("id_b"), col("w")), Seq("w"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(ws.select(col(idCol).as("id_a"), col("ws").as("ws_a")), Seq("id_a"))
      .join(ws.select(col(idCol).as("id_b"), col("ws").as("ws_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ws_a"), col("ws_b"))).cast("double") /
          size(array_union(col("ws_a"), col("ws_b")))).as("jac"))
  }
}
