package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{Dedup, IvfAnn, Multimodal, TextAnalysis, VectorQuant}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline queries: dedup, similarity search, text
  * analysis, multimodal plumbing — the beyond-the-reference operator set,
  * designed shuffle-first for 100 TB (see operator scaladocs).
  *
  * Oracle notes: approximate/sketch outputs (minhash, simhash, LSH-ANN)
  * are engine-specific → rows-only checks; exact paths (content hash,
  * blocked jaccard, label-blocked cosine, quality metrics, fingerprints)
  * are value-matched against DuckDB.
  */
object Pipeline {

  val queries: Map[String, Q.Fn] = Map[String, Q.Fn](
    // REAL Structured Streaming execution, oracle-gated: fixture events
    // feed a MemoryStream source in several micro-batches (the
    // test-harness stand-in for Kafka — the driver-side collect feeds
    // the SOURCE, never a compute path), the tumbling aggregation runs
    // through the streaming engine in complete mode, and the FINAL
    // result table must value-match the same batch SQL in DuckDB. This
    // upgrades the streaming façade from unit-tested to gate-checked.
    "stream_tumbling_counts" -> { (s, d) =>
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, d, "events")
        .select(col("ts"), col("event_type"), col("value"))
        .as[(java.sql.Timestamp, String, Double)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String, Double)]
      val name = "stream_tc_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamingFacade
        .tumblingCounts(ms.toDF().toDF("ts", "event_type", "value"))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { b =>
        ms.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(name).orderBy(col("bucket"), col("event_type")).limit(50)
    },

    "dedup_exact" -> { (s, d) =>
      Dedup.exact(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("content_hash")).limit(100)
    },

    "dedup_minhash_lsh" -> { (s, d) =>
      Dedup.minhashPairs(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("est_sim").desc, col("id_a"), col("id_b")).limit(50)
    },

    "dedup_simhash" -> { (s, d) =>
      // radius 16: chunk count derives from the radius (17 chunks), so
      // candidate recall is complete for hamming ≤ 16 — see simhashPairs
      Dedup.simhashPairs(Tables(s, d, "documents"), "doc_id", "text", maxHamming = 16)
        .orderBy(col("hamming"), col("id_a"), col("id_b")).limit(50)
    },

    "dedup_ngram_jaccard" -> { (s, d) =>
      // exact mode (valve off) — this entry is oracle-verified against a
      // full n² DuckDB jaccard, so every pair must be present
      Dedup.ngramJaccardPairs(Tables(s, d, "documents"), "doc_id", "text",
          maxDocFrequency = Int.MaxValue)
        .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
        .orderBy(col("jac").desc, col("id_a"), col("id_b")).limit(50)
    },

    // near-dup clustering: connected components over jaccard>=0.9 pairs;
    // cluster id = min doc_id of the component (deterministic, so the
    // oracle verifies it via a recursive-CTE transitive closure)
    "dedup_clusters" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          maxDocFrequency = Int.MaxValue) // exact: oracle-verified closure
        .filter(col("jac") >= 0.9).select(col("id_a"), col("id_b"))
      Dedup.clusters(pairs, docs.select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    },

    "dedup_embedding" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      // valve off (Int.MaxValue): the oracle needs the exact pair set on
      // this bounded fixture; scale callers pass a finite maxBlockSize
      Dedup.blockedCosinePairs(e, "vec_id", "label", "embedding",
          maxBlockSize = Int.MaxValue)
        .select(col("id_a"), col("id_b"),
          round(col("cos_sim").cast("double"), 4).as("cs"))
        .orderBy(col("cs").desc, col("id_a"), col("id_b")).limit(50)
    },

    // ANN: random-hyperplane LSH buckets (deterministic planes), probe
    // bucket join, exact cosine only on candidates — rows-only (approx).
    "sim_ann_lsh" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val rnd = new scala.util.Random(7)
      val planes = Seq.fill(2)(Seq.fill(4)(Array.fill(64)(rnd.nextGaussian().toFloat)))
      def bucket(v: org.apache.spark.sql.Column, table: Int) =
        planes(table).zipWithIndex.map { case (p, i) =>
          when(VectorFunctions.inner_product(v, typedlit(p.toSeq)) > 0f,
            shiftleft(lit(1), i)).otherwise(lit(0))
        }.reduce(_ + _)
      val withB = (t: Int) => e.select(col("vec_id"), col("embedding"),
        lit(t).as("tbl"), bucket(col("embedding"), t).as("bucket"))
      val all = withB(0).unionAll(withB(1))
      val q = all.filter(col("vec_id") === 0)
        .select(col("tbl"), col("bucket"), col("embedding").as("qvec"))
      all.join(broadcast(q), Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(VectorFunctions.cosine_similarity(col("embedding"), col("qvec"))
            .cast("double"), 4).as("cos_sim"))
        .distinct()
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
    },

    // ANN: IVF inverted lists (coarse k-means quantizer, nprobe knob) —
    // the at-scale complement to sim_ann_lsh; approx → rows-only, with a
    // recall-vs-brute-force assertion in PipelineSpec
    "sim_ann_ivf" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val idx = IvfAnn.build(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        k = 16, iters = 2)
      IvfAnn.search(idx, probe, topK = 10, nprobe = 4)
        .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
    },

    // int8 scalar-quantized brute-force ANN (operators/VectorQuant.scala):
    // 4× less index memory/scan volume; estimator output → rows-only,
    // recall vs exact cosine pinned in PipelineSpec
    "sim_ann_int8" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val q = VectorQuant.quantize(e.filter(col("vec_id") =!= 0), "vec_id", "embedding")
      VectorQuant.searchCosine(q, "vec_id", probe, topK = 10)
        .select(col("vec_id"), round(col("cos_sim_q"), 3).as("cos_sim_q"))
        .orderBy(col("cos_sim_q").desc, col("vec_id"))
    },

    // the composed IVF+SQ8 layout: coarse-quantizer routing prunes the
    // candidate LISTS (nprobe of 16), int8 codes shrink what survivors
    // SCAN (4x) — both approximations compound, so recall vs brute force
    // is pinned in PipelineSpec; estimator output → rows-only
    "sim_ann_ivf_sq8" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val idx = IvfAnn.build(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        k = 16, iters = 2)
      val qlists = VectorQuant.quantize(idx.lists, "vec_id", "embedding")
      val cids = IvfAnn.probeCids(idx, probe, nprobe = 4)
      VectorQuant.searchCosine(qlists.filter(col("cid").isin(cids: _*)),
          "vec_id", probe, topK = 10)
        .select(col("vec_id"), round(col("cos_sim_q"), 3).as("cos_sim_q"))
        .orderBy(col("cos_sim_q").desc, col("vec_id"))
    },

    // END-TO-END corpus prep — the composed pipeline a training-data run
    // actually executes: quality metrics -> language/quality gate ->
    // exact dedup (keep lowest doc_id per content hash) -> per-language
    // corpus stats. Every stage is the gated operator itself, and the
    // whole chain is value-matched against a SQL reconstruction.
    "pipeline_corpus_prep" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val q = TextAnalysis.quality(docs, "doc_id", "text")
      val keep = docs.join(q, "doc_id")
        .filter(col("lang").isin("en", "de", "fr") &&
          col("alpha_ratio") >= 0.55 && col("n_words") >= 10)
      val deduped = keep
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          round(avg(col("alpha_ratio")), 6).as("avg_alpha"))
        .orderBy(col("lang"))
    },

    "text_quality" -> { (s, d) =>
      TextAnalysis.quality(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    "text_tokens" -> { (s, d) =>
      TextAnalysis.tokenCounts(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    "text_langid" -> { (s, d) =>
      TextAnalysis.languageId(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")).limit(500)
    },

    "text_fingerprint" -> { (s, d) =>
      TextAnalysis.fingerprint(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    // Gopher-style repetition filters — per-row array computation, no
    // explode/shuffle; the oracle recomputes via grouped unnest. The
    // crafted negative-id rows pin the sub-2-word edge (empty /
    // whitespace-only / one-word / all-dup docs must report zero or
    // exact fractions, not throw — the sequence(1, nW-1) guard).
    "text_repetition" -> { (s, d) =>
      import s.implicits._
      val crafted = Seq(
        (-5L, "   "), (-4L, ""), (-3L, "solo"), (-2L, "a a"),
        (-1L, "x y x y x")
      ).toDF("doc_id", "text")
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      TextAnalysis.repetition(docs.unionByName(crafted), "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    // PII redaction over documents plus crafted rows that actually hold
    // emails/IPs/long digit runs (the fixture corpus is clean)
    "text_redact_pii" -> { (s, d) =>
      import s.implicits._
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text")).filter(col("doc_id") < 20)
      val crafted = Seq(
        (9001L, "contact me at alice.smith+spam@example.co.uk or bob@test.io today"),
        (9002L, "server 192.168.0.1 and 10.0.255.7 ping 8.8.8.8"),
        (9003L, "call 5551234567 ext 12345 account 98765432109"),
        (9004L, "mixed: eve@corp.net from 172.16.4.20 card 4111111111111111")
      ).toDF("doc_id", "text")
      TextAnalysis.redactPii(docs.unionByName(crafted), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // sample packing: per-language running token sum into 512-token bins
    "pipeline_pack_sequences" -> { (s, d) =>
      TextAnalysis.packSequences(Tables(s, d, "documents"),
          "doc_id", "lang", "text", 512)
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_tokens")).cast("long").as("tokens"))
        .orderBy(col("lang"), col("bin"))
    },

    // typed Dataset mapPartitions path (stubbed decode) — the oracle
    // checks the byte-level outputs computed inside the partition mapper
    "mm_binary_features" -> { (s, d) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, d))
        .select(col("doc_id"), col("n_bytes"), col("header_hex"))
        .orderBy(col("doc_id")).limit(200)
    },

    // REAL image decode: deterministic PNG test cards are encoded and
    // then decoded with javax.imageio inside the partition mapper; the
    // oracle recomputes the expected channel means analytically from the
    // same pixel formula, so a value match proves the codec round-trip
    "mm_image_decode" -> { (s, d) =>
      import s.implicits._
      val ids = Tables(s, d, "documents").select(col("doc_id")).as[Long]
      val imgs = ids.mapPartitions(_.map(id =>
        Multimodal.ImageRow(id, Multimodal.syntheticPng(id))))
      Multimodal.decodeImages(imgs).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy(col("doc_id")).limit(200)
    },

    // REAL audio decode: WAV s16le PCM through javax.sound.sampled; the
    // integer sample features make the oracle match exact (closed-form
    // sample values recomputed in SQL)
    "mm_audio_decode" -> { (s, d) =>
      import s.implicits._
      val ids = Tables(s, d, "documents").select(col("doc_id")).as[Long]
      val wavs = ids.mapPartitions(_.map(id =>
        Multimodal.AudioRow(id, Multimodal.syntheticWav(id))))
      Multimodal.decodeAudio(wavs).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_samples"), col("sum_samples"), col("peak_abs"))
        .orderBy(col("doc_id")).limit(200)
    },

    // video frame-sampling plumbing: GRV1 raw-gray container parsed from
    // actual bytes, every 3rd frame SAMPLED BY SEEK (skipped frames never
    // read — decode cost scales with frames kept); the oracle recomputes
    // the sampled means from the closed-form pixel formula
    "mm_video_frames" -> { (s, d) =>
      import s.implicits._
      val ids = Tables(s, d, "documents").select(col("doc_id")).as[Long]
      val vids = ids.mapPartitions(_.map(id =>
        Multimodal.VideoRow(id, Multimodal.syntheticVideo(id))))
      Multimodal.sampleFrames(vids, every = 3).toDF()
        .select(col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames").cast("long").as("n_frames"),
          round(col("mean_gray"), 4).as("mean_gray"))
        .orderBy(col("doc_id"), col("frame_idx")).limit(200)
    }
  )

  val oracle: Map[String, String] = Map(
    "stream_tumbling_counts" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n, round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 50""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY content_hash LIMIT 100""".stripMargin,

    "pipeline_corpus_prep" ->
      """WITH q AS (
        | SELECT doc_id, lang, n_chars,
        |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |    / length(text), 6) AS alpha_ratio,
        |  len(regexp_split_to_array(text, '\s+')) AS n_words,
        |  md5(text) AS content_hash
        | FROM documents),
        |keep AS (
        | SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        | FROM q
        | WHERE lang IN ('en', 'de', 'fr') AND alpha_ratio >= 0.55 AND n_words >= 10)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | round(avg(alpha_ratio), 6) AS avg_alpha
        |FROM keep WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(a.ws || b.ws)), 6) AS jac
        |FROM w a JOIN w b ON a.doc_id < b.doc_id
        |ORDER BY jac DESC, id_a, id_b LIMIT 50""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE w AS (
        | SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
        |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
        |      FROM w a JOIN w b ON a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |        / len(list_distinct(a.ws || b.ws)) >= 0.9),
        |e AS (SELECT ia AS s, ib AS d FROM p UNION ALL SELECT ib, ia FROM p),
        |reach(s, d) AS (
        | SELECT s, d FROM e
        | UNION
        | SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s)
        |SELECT doc_id, least(doc_id, coalesce(mn, doc_id)) AS cluster
        |FROM documents LEFT JOIN (SELECT s, min(d) AS mn FROM reach GROUP BY s) m
        |  ON m.s = doc_id
        |ORDER BY doc_id""".stripMargin,

    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cs
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY cs DESC, id_a, id_b LIMIT 50""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
        | CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
        | round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |   / length(text), 6) AS alpha_ratio,
        | round(CAST(len(list_filter(string_split(text, ' '),
        |     w -> list_contains(['the','a','and','of','to','in','is','it','that','for'], w))) AS DOUBLE)
        |   / len(string_split(text, ' ')), 6) AS stop_ratio,
        | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |   / len(regexp_split_to_array(text, '\s+')), 6) AS avg_wlen
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_key,
        | list_min(list_transform(sh, x -> md5(x))) AS min_shingle_md5
        |FROM (SELECT doc_id, text,
        |       list_transform(range(0, len(w) - 2),
        |         i -> array_to_string(w[i+1:i+3], ' ')) AS sh
        |      FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) x) t
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    "text_repetition" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES (-5, '   '), (-4, ''), (-3, 'solo'),
        |    (-2, 'a a'), (-1, 'x y x y x')) v(doc_id, text)),
        |d AS (
        |  SELECT doc_id, string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS w
        |  FROM src),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(2, len(w) + 1),
        |           i -> w[i-1] || ' ' || w[i])) AS gram
        |  FROM d WHERE len(w) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
        |r AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / sum(n), 6)
        |      AS dup_2gram_frac,
        |    round(CAST(sum(n - 1) AS DOUBLE) / sum(n), 6) AS rep_2gram_frac,
        |    round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_2gram_frac
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
        |  round(CAST(len(d.w) - len(list_distinct(d.w)) AS DOUBLE) / len(d.w), 6)
        |    AS rep_word_frac,
        |  coalesce(r.dup_2gram_frac, 0.0) AS dup_2gram_frac,
        |  coalesce(r.rep_2gram_frac, 0.0) AS rep_2gram_frac,
        |  coalesce(r.top_2gram_frac, 0.0) AS top_2gram_frac
        |FROM d LEFT JOIN r ON d.doc_id = r.doc_id
        |ORDER BY d.doc_id LIMIT 200""".stripMargin,

    "text_redact_pii" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (9001, 'contact me at alice.smith+spam@example.co.uk or bob@test.io today'),
        |    (9002, 'server 192.168.0.1 and 10.0.255.7 ping 8.8.8.8'),
        |    (9003, 'call 5551234567 ext 12345 account 98765432109'),
        |    (9004, 'mixed: eve@corp.net from 172.16.4.20 card 4111111111111111'))
        |    v(doc_id, text)),
        |r AS (
        |  SELECT doc_id, text, regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{7,}\b', '<NUM>', 'g') AS redacted FROM src)
        |SELECT doc_id, redacted,
        |  CAST(length(text) - length(redacted) AS BIGINT) AS delta_chars
        |FROM r ORDER BY doc_id""".stripMargin,

    "pipeline_pack_sequences" ->
      """WITH t AS (
        |  SELECT lang, doc_id, len(regexp_split_to_array(text, '\s+')) AS n
        |  FROM documents),
        |b AS (
        |  SELECT lang, doc_id, n,
        |    CAST(floor((sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n) / 512) AS INT) AS bin
        |  FROM t)
        |SELECT lang, bin, count(*) AS docs, CAST(sum(n) AS BIGINT) AS tokens
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "mm_binary_features" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | lower(hex(substring(text, 1, 4))) AS header_hex
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

    "mm_image_decode" ->
      """SELECT d.doc_id,
        | CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        | round(avg(CAST((d.doc_id*7 + x.x*3 + y.y*5) % 256 AS DOUBLE)), 4) AS mean_r,
        | round(avg(CAST((d.doc_id*11 + x.x) % 256 AS DOUBLE)), 4) AS mean_g,
        | round(avg(CAST((d.doc_id*13 + y.y) % 256 AS DOUBLE)), 4) AS mean_b
        |FROM documents d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)
        |GROUP BY d.doc_id ORDER BY d.doc_id LIMIT 200""".stripMargin,

    "mm_audio_decode" ->
      """SELECT d.doc_id,
        | CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        | CAST(256 AS BIGINT) AS n_samples,
        | CAST(sum((d.doc_id*31 + i.i*17) % 20001 - 10000) AS BIGINT) AS sum_samples,
        | CAST(max(abs((d.doc_id*31 + i.i*17) % 20001 - 10000)) AS BIGINT) AS peak_abs
        |FROM documents d, generate_series(0, 255) i(i)
        |GROUP BY d.doc_id ORDER BY d.doc_id LIMIT 200""".stripMargin,

    "mm_video_frames" ->
      """SELECT d.doc_id,
        | CAST(f.f AS BIGINT) AS frame_idx, CAST(12 AS BIGINT) AS n_frames,
        | round(avg(CAST((d.doc_id*7 + f.f*13 + p.p*3) % 256 AS DOUBLE)), 4) AS mean_gray
        |FROM documents d, generate_series(0, 11) f(f), generate_series(0, 63) p(p)
        |WHERE f.f % 3 = 0
        |GROUP BY d.doc_id, f.f ORDER BY d.doc_id, frame_idx LIMIT 200""".stripMargin
  )
}
