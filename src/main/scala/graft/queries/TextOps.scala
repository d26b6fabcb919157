package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, PrefixJoin}
import Tables._

/** Training-data text pipeline queries over `documents` (BASELINE.json
  * north star): stats/quality, language-ID, fingerprints, exact dedup,
  * n-gram Jaccard near-dup, MinHash LSH, SimHash, multimodal metadata.
  *
  * Every query carries a DuckDB oracle. MinHash (q30) is oracled against
  * exact Jaccard (proven coincident on this corpus); SimHash (q31) is
  * oracled bit-for-bit — its signatures are built from the portable
  * md5-derived 60-bit hash, which DuckDB reproduces exactly.
  */
object TextOps {

  private val stopEn = Seq("the", "a", "of", "and", "to")

  /** Token counting + quality scoring (all-builtin arithmetic). */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select(
      $"doc_id",
      $"lang",
      length($"text").as("n_chars_obs"),
      TextFunctions.tokenCount($"text").as("n_tokens"),
      TextFunctions.uniqueTokenCount($"text").as("n_uniq"),
      TextFunctions.stopwordCount($"text", stopEn).as("n_stop"),
      TextFunctions.fingerprint($"text").as("fp"),
    ).orderBy($"doc_id")
  }

  val textStatsSql: String =
    """SELECT doc_id, lang,
      | length(text) AS n_chars_obs,
      | len(string_split(text, ' ')) AS n_tokens,
      | len(list_distinct(string_split(text, ' '))) AS n_uniq,
      | len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to'))) AS n_stop,
      | md5(text) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Language-ID by stopword vote (deterministic argmax, ties by list
    * order) — the SQL mirror encodes the same vote with CASE/greatest.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select(
      $"doc_id",
      $"lang".as("lang_true"),
      TextFunctions.langScore($"text", "en").as("score_en"),
      TextFunctions.langScore($"text", "de").as("score_de"),
      TextFunctions.langId($"text").as("lang_pred"),
    ).orderBy($"doc_id")
  }

  val langIdSql: String = {
    // Mirror TextFunctions.langStopwords / langId: greatest + first-wins tie
    def score(inList: String) =
      s"len(list_filter(string_split(text,' '), x -> x IN $inList))"
    val lists = TextFunctions.langStopwords.map { case (l, sw) =>
      l -> sw.map(s => s"'$s'").mkString("(", ",", ")")
    }
    val scoreCols = lists.map { case (l, inList) => s"${score(inList)} AS score_$l" }.mkString(", ")
    val best = lists.map { case (_, inList) => score(inList) }.mkString("greatest(", ", ", ")")
    val pick = lists.map { case (l, _) =>
      s"WHEN score_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, lang_true, score_en, score_de,
       | CASE $pick ELSE 'und' END AS lang_pred
       |FROM (SELECT doc_id, lang AS lang_true, $scoreCols, $best AS best, text
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Exact dedup by content fingerprint (min-id representative). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.exact(documents(spark, dir), "doc_id", "text")
      .orderBy($"doc_id")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, md5(text) AS fp, count(*) AS n_copies
      |FROM documents GROUP BY md5(text)
      |ORDER BY doc_id""".stripMargin

  /** Exact 3-gram Jaccard near-dup pairs (jaccard ≥ 0.5) — the ground truth
    * that the MinHash path must recover. Integer set sizes + one IEEE
    * division keep it oracle-stable.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.ngramJaccardPairs(documents(spark, dir), "doc_id", "text", 3, 0.5)
      .orderBy($"d1", $"d2")
  }

  /** q125: the EXACT q29 answer (3-gram shingle Jaccard ≥ 0.5) computed
    * sub-quadratically via AllPairs prefix filtering (see
    * [[graft.operators.PrefixJoin]]). The oracle IS q29's brute-force SQL
    * — the strongest possible statement that the prefix/length filters
    * are lossless: any dropped candidate hash-mismatches the round.
    */
  def prefixJaccard(spark: SparkSession, dir: String): DataFrame =
    // hashed shingles (longs) instead of n-gram strings: the AllPairs
    // order only needs ANY total order both sides share (doc frequency,
    // then the 64-bit hash), and set sizes/intersections are preserved up
    // to the same 64-bit collisions the q30 path accepts — so the
    // checkpointed element list, the prefix candidate join, and the
    // verify arrays all move 8-byte longs, and array_intersect takes its
    // primitive fast path (the round-10 string-array finding, inverted)
    PrefixJoin.jaccardSelfJoin(
      TextFunctions.shingleHashes(documents(spark, dir), "doc_id", "text", 3),
      "doc_id", "h", p = 1, q = 2)

  /** Brute-force oracle: identical to ngramJaccardSql by design. */
  def prefixJaccardSql: String = ngramJaccardSql

  val ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id d1, b.doc_id d2, count(*) i
      |  FROM sh a JOIN sh b USING(s) WHERE a.doc_id < b.doc_id
      |  GROUP BY 1,2)
      |SELECT d1, d2, i AS inter, c1.n AS n1, c2.n AS n2,
      |       CAST(i AS DOUBLE)/(c1.n+c2.n-i) AS jaccard
      |FROM inter JOIN cnt c1 ON d1=c1.doc_id JOIN cnt c2 ON d2=c2.doc_id
      |WHERE CAST(i AS DOUBLE)/(c1.n+c2.n-i) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  /** MinHash LSH near-dup pipeline. The oracle is the EXACT Jaccard pair
    * set at the same threshold: the banded-LSH candidate stage is
    * deterministic (fixed permutation seeds) and DedupSpec proves full
    * recall on the planted near-dups (all ≥0.95 Jaccard, candidate
    * probability ≈ 1-3e-4 per the 16×4 banding curve), so LSH filtering
    * drops nothing on this corpus and the outputs coincide — making the
    * oracle a stronger check than rows-only.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.minhashNearDupPairs(documents(spark, dir), "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3, minJaccard = 0.5)
      .orderBy($"d1", $"d2")
  }

  /** SimHash near-dup pairs. Fully DuckDB-oracled: the signature is built
    * from the portable md5-derived 60-bit token hash
    * ([[graft.functions.TextFunctions.portableHash60]]), so the oracle SQL
    * below recomputes the ENTIRE pipeline — token hashes, 60 per-bit ±1
    * sums, sign bits, 6×10-bit banding, candidate join, exact Hamming
    * filter — from first principles in DuckDB. All-integer arithmetic:
    * hash-stable across engines.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sim = Dedup.simhash(documents(spark, dir), "doc_id", "text")
    // hamming ≤ 10: covers the planted near-dups while cutting the
    // word-soup noise floor that grows steeply from 11+
    Dedup.simhashNearDupPairs(sim, "doc_id", maxHamming = 10)
      .orderBy($"d1", $"d2")
  }

  /** The full SimHash pipeline in DuckDB, mirroring [[Dedup.simhash]] +
    * [[Dedup.simhashNearDupPairs]] bit for bit (60 generated per-bit sum
    * columns).
    */
  val simhashPairsSql: String = {
    val bits = Dedup.simhashBits
    val bitSums = (0 until bits)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n    ")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN b$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS simhash FROM bits),
       |banded AS (
       |  SELECT doc_id, simhash, b.band, (simhash >> (b.band * 10)) & 1023 AS bandval
       |  FROM sig CROSS JOIN generate_series(0, 5) AS b(band)),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM banded l JOIN banded r ON l.band = r.band AND l.bandval = r.bandval
       |  WHERE l.doc_id < r.doc_id)
       |SELECT d1, d2, CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INTEGER) AS hamming
       |FROM cand JOIN sig s1 ON s1.doc_id = cand.d1
       |          JOIN sig s2 ON s2.doc_id = cand.d2
       |WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 10
       |ORDER BY d1, d2""".stripMargin
  }

  /** Multimodal metadata over binary payloads: byte length + content hash
    * of the payload column — oracle-checkable binary plumbing; the full
    * feature extraction (entropy etc.) is spec-tested in MultimodalSpec.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.syntheticMedia(spark, documents(spark, dir)).toDF()
      .select(
        $"media_id",
        $"modality",
        length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("payload_md5"),
        $"width", $"height")
      .orderBy($"media_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id AS media_id,
      | ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
      | octet_length(CAST(text AS BLOB)) AS n_bytes,
      | md5(text) AS payload_md5,
      | CAST(doc_id % 16 * 64 + 256 AS INTEGER) AS width,
      | CAST(doc_id % 9 * 64 + 256 AS INTEGER) AS height
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** q56: REAL multimodal decode — image payloads are valid binary PPMs,
    * audio payloads valid PCM16 WAVs, video payloads valid Y4M streams
    * (all built+parsed dependency-free in executors); dims, frame/sample
    * counts, durations and signal means come from parsing the bytes, and
    * the oracle recomputes them from the deterministic generator formulas.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.decodeFeatures(
        Multimodal.realMedia(spark, documents(spark, dir))).toDF()
      .orderBy($"media_id")
  }

  val multimodalDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
      |    CAST(doc_id % 16 * 4 + 16 AS INTEGER) AS w,
      |    CAST(doc_id % 9 * 4 + 16 AS INTEGER) AS h,
      |    CAST(400 + doc_id % 100 AS INTEGER) AS n_samp,
      |    CAST(2 + doc_id % 4 AS INTEGER) AS nf,
      |    CAST(24 + doc_id % 2 AS INTEGER) AS fps
      |  FROM documents),
      |img AS (
      |  SELECT media_id,
      |    CAST(CAST(SUM((media_id*31 + g.i*7) % 256) AS BIGINT) AS DOUBLE)
      |      / (w*h*3) AS signal_mean
      |  FROM m JOIN generate_series(0, 11000) g(i) ON g.i < CAST(w AS BIGINT)*h*3
      |  WHERE modality = 'image'
      |  GROUP BY media_id, w, h),
      |aud AS (
      |  SELECT media_id,
      |    CAST(CAST(SUM((media_id*13 + g.i*11) % 65536 - 32768) AS BIGINT) AS DOUBLE)
      |      / n_samp AS signal_mean
      |  FROM m JOIN generate_series(0, 500) g(i) ON g.i < n_samp
      |  WHERE modality = 'audio'
      |  GROUP BY media_id, n_samp),
      |vid AS (
      |  -- Y4M luma mean: frame f's Y-plane byte i sits at global data index
      |  -- f*(w*h*3/2) + i (4:2:0 chroma of earlier frames included), same
      |  -- pixelByte generator as the image plane
      |  SELECT media_id,
      |    CAST(CAST(SUM((media_id*31 + (fr.f*(w*h*3/2) + g.i)*7) % 256) AS BIGINT)
      |      AS DOUBLE) / (nf*w*h) AS signal_mean
      |  FROM m
      |  JOIN generate_series(0, 5) fr(f) ON fr.f < nf
      |  JOIN generate_series(0, 3700) g(i) ON g.i < CAST(w AS BIGINT)*h
      |  WHERE modality = 'video'
      |  GROUP BY media_id, w, h, nf)
      |SELECT m.media_id, m.modality,
      |  CASE WHEN modality IN ('image','video') THEN w ELSE 0 END AS parsed_width,
      |  CASE WHEN modality IN ('image','video') THEN h ELSE 0 END AS parsed_height,
      |  CASE WHEN modality = 'audio' THEN n_samp
      |       WHEN modality = 'video' THEN nf ELSE 0 END AS n_samples,
      |  CASE WHEN modality = 'audio' THEN CAST(n_samp AS DOUBLE) * 1000 / 16000
      |       WHEN modality = 'video' THEN nf * 1000.0 * 1 / fps
      |       ELSE 0.0 END AS duration_ms,
      |  COALESCE(img.signal_mean, aud.signal_mean, vid.signal_mean, 0.0) AS signal_mean
      |FROM m LEFT JOIN img USING (media_id) LEFT JOIN aud USING (media_id)
      |  LEFT JOIN vid USING (media_id)
      |ORDER BY media_id""".stripMargin

  /** q73: COMPRESSED-codec decode — the multimodal seam that stayed a
    * documented stub through round 6, closed for the grayscale baseline
    * JPEG path. Executors build a real baseline JPEG per document
    * (markers, huffman entropy coding, byte stuffing) and decode it with
    * the general [[graft.operators.Jpeg]] decoder (stream-defined huffman +
    * quant tables, IDCT). The fixture images are constant 8×8 blocks under
    * an all-ones quant table, so the lossy pipeline is exercised on
    * content it encodes losslessly: decoded luma is BIT-EXACT equal to the
    * generator formula (JpegSpec proves it per pixel) and the DuckDB
    * oracle recomputes width/height/mean in closed form — a wrong huffman
    * table, dequant, or IDCT hash-mismatches.
    */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val w = 8 * (1 + (id % 4)).toInt
      val h = 8 * (1 + (id % 3)).toInt
      val img = graft.operators.Jpeg.parseJpeg(graft.operators.Jpeg.buildJpeg(id, w, h))
      (id, img.width, img.height, img.lumaMean)
    }.toDF("media_id", "parsed_width", "parsed_height", "luma_mean")
      .orderBy($"media_id")
  }

  /** Decoded luma mean in closed form: every 8×8 block of media i is the
    * constant pixelByte(i, blockIndex), so the mean over pixels equals the
    * mean over blocks ((64·Σv)/(64·blocks) is an exact power-of-two
    * rescale in IEEE, so the doubles match bit-for-bit).
    */
  val jpegDecodeSql: String =
    """SELECT doc_id AS media_id,
      | CAST(8 * (1 + doc_id % 4) AS INTEGER) AS parsed_width,
      | CAST(8 * (1 + doc_id % 3) AS INTEGER) AS parsed_height,
      | CAST(CAST(SUM((doc_id*31 + g.i*7) % 256) AS BIGINT) AS DOUBLE)
      |   / ((1 + doc_id % 4) * (1 + doc_id % 3)) AS luma_mean
      |FROM documents
      |JOIN generate_series(0, 11) g(i) ON g.i < (1 + doc_id % 4) * (1 + doc_id % 3)
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  /** q75: COMPRESSED-audio decode — the audio analog of q73's JPEG.
    * Executors build a real G.711 μ-law WAV per document (format-tag-7
    * fmt chunk with the cbSize extension, one companded byte per sample)
    * and the parser expands it with the CCITT μ-law formula. The encoded
    * stream IS the deterministic generator (every byte value is a valid
    * μ-law code), so the DuckDB oracle recomputes the expansion in closed
    * form — a wrong bias, segment shift, or sign handling hash-mismatches.
    * MulawSpec pins the encode/decode round-trip algebra; MP3/H.264 remain
    * the only documented codec stubs.
    */
  def mulawDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id").as[Long].map { id =>
      val n = (400 + id % 100).toInt
      val wav = graft.operators.MediaFormats.parseWav(
        graft.operators.MediaFormats.buildMulawWav(id, 8000, n))
      var s = 0L
      wav.samples.foreach(x => s += x)
      (id, wav.sampleRate, wav.samples.length,
        wav.samples.length.toDouble * 1000 / wav.sampleRate,
        s.toDouble / wav.samples.length)
    }.toDF("media_id", "sample_rate", "n_samples", "duration_ms", "signal_mean")
      .orderBy($"media_id")
  }

  /** μ-law expansion in closed form: u = 255−b (the complement), exponent
    * = (u/16) mod 8, mantissa = u mod 16, magnitude = ((8·mantissa+132) ≪
    * exponent) − 132, negated when the sign bit (u ≥ 128) is set.
    */
  val mulawDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, CAST(400 + doc_id % 100 AS INTEGER) AS n_samp
      |  FROM documents),
      |v AS (
      |  SELECT media_id, n_samp,
      |    CASE WHEN u >= 128
      |      THEN -((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
      |      ELSE   (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132 END AS s
      |  FROM (
      |    SELECT media_id, n_samp,
      |      255 - CAST((media_id*13 + g.i*11) % 256 AS INTEGER) AS u
      |    FROM m JOIN generate_series(0, 500) g(i) ON g.i < n_samp))
      |SELECT media_id,
      |  CAST(8000 AS INTEGER) AS sample_rate,
      |  n_samp AS n_samples,
      |  CAST(n_samp AS DOUBLE) * 1000 / 8000 AS duration_ms,
      |  CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE) / n_samp AS signal_mean
      |FROM v
      |GROUP BY media_id, n_samp
      |ORDER BY media_id""".stripMargin

  /** q79: REAL image resize — the media table's PPM payloads are decoded,
    * nearest-neighbor-resampled to a 16×16 thumbnail, re-encoded, and the
    * resampled plane's byte mean is graded. NN sampling is fully integer
    * (target (x,y) reads source (⌊x·sw/16⌋, ⌊y·sh/16⌋)), so the DuckDB
    * oracle recomputes the exact resampled pixel set from the generator
    * formula — an off-by-one in the sampling grid hash-mismatches. This
    * flips the last resize stub to a real executor-side kernel.
    */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.realMedia(spark, documents(spark, dir))
    Multimodal.resizeImages(media, 16, 16)
      .filter(_.modality == "image")
      .map { r =>
        val p = graft.operators.MediaFormats.parsePpm(r.payload)
        var s = 0L
        p.pixels.foreach(b => s += (b & 0xFF))
        (r.media_id, p.width, p.height, s.toDouble / p.pixels.length)
      }.toDF("media_id", "dst_w", "dst_h", "resized_mean")
      .orderBy($"media_id")
  }

  /** Target pixel (x,y,c) of the 16×16 thumbnail reads source flat index
    * ((⌊y·sh/16⌋·sw + ⌊x·sw/16⌋)·3 + c); flat target index i maps to
    * y = i/48, x = (i mod 48)/3, c = i mod 3.
    */
  val imageResizeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 16 * 4 + 16 AS INTEGER) AS sw,
      |    CAST(doc_id % 9 * 4 + 16 AS INTEGER) AS sh
      |  FROM documents WHERE doc_id % 3 = 0),
      |v AS (
      |  SELECT media_id,
      |    (media_id*31 +
      |      ((((t.i // 48) * sh // 16) * sw + ((t.i % 48) // 3) * sw // 16) * 3
      |        + t.i % 3) * 7) % 256 AS b
      |  FROM m JOIN generate_series(0, 767) t(i) ON true)
      |SELECT media_id,
      |  CAST(16 AS INTEGER) AS dst_w, CAST(16 AS INTEGER) AS dst_h,
      |  CAST(CAST(SUM(b) AS BIGINT) AS DOUBLE) / 768 AS resized_mean
      |FROM v
      |GROUP BY media_id
      |ORDER BY media_id""".stripMargin

  /** q177: perceptual image fingerprints — aHash over REAL decoded PPM
    * payloads ([[graft.operators.MediaFormats.aHashPpm]]): green channel
    * mean-pooled onto an 8×8 grid, thresholded at the integer mean of
    * the 64 cells, packed row-major into (hi, lo) 32-bit halves. The
    * image-dedup primitive (near-dup pairs then follow the q31 SimHash
    * byte-band machinery on these 64 bits); here every image's full hash
    * is the graded artifact — any decode, pooling-boundary, threshold,
    * or packing slip flips bits. Spark computes from the PARSED binary;
    * the oracle recomputes bit-for-bit from the generator's pixel
    * formula — the same decode-vs-formula cross-grading as q56/q79/q80.
    */
  def imageAHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.realMedia(spark, documents(spark, dir))
      .filter(_.modality == "image")
      .map { r =>
        val p = graft.operators.MediaFormats.parsePpm(r.payload)
        val (hi, lo, pop) = graft.operators.MediaFormats.aHashPpm(p)
        (r.media_id, p.width, p.height, hi, lo, pop)
      }.toDF("media_id", "w", "h", "phash_hi", "phash_lo", "n_bits")
      .orderBy($"media_id")
  }

  val imageAHashSql: String =
    """WITH m AS (
      |  SELECT doc_id AS id, CAST(doc_id % 16 * 4 + 16 AS BIGINT) AS w,
      |         CAST(doc_id % 9 * 4 + 16 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT id, w, h, unnest(range(0, w)) AS x FROM m),
      |pxy AS (SELECT id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |g AS (
      |  SELECT id, (8 * x) // w AS bx, (8 * y) // h AS by,
      |    (id * 31 + (3 * (y * w + x) + 1) * 7) % 256 AS gv
      |  FROM pxy),
      |cells AS (SELECT id, by, bx, SUM(gv) // COUNT(*) AS cm FROM g GROUP BY 1, 2, 3),
      |ov AS (SELECT id, SUM(cm) // 64 AS mean64 FROM cells GROUP BY id),
      |bits AS (
      |  SELECT c.id, c.by * 8 + c.bx AS idx,
      |    CASE WHEN c.cm > ov.mean64 THEN 1 ELSE 0 END AS b
      |  FROM cells c JOIN ov ON ov.id = c.id),
      |hashes AS (
      |  SELECT id,
      |    CAST(SUM(CASE WHEN idx >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(SUM(CASE WHEN idx < 32 THEN b * (CAST(1 AS BIGINT) << CAST(idx AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_lo,
      |    CAST(SUM(b) AS INTEGER) AS n_bits
      |  FROM bits GROUP BY id)
      |SELECT m.id AS media_id, CAST(m.w AS INTEGER) AS w, CAST(m.h AS INTEGER) AS h,
      |  hashes.phash_hi, hashes.phash_lo, hashes.n_bits
      |FROM m JOIN hashes ON hashes.id = m.id
      |ORDER BY media_id""".stripMargin

  /** q219: IMAGE near-dup pairs — the multimodal dedup loop closed
    * end-to-end: real PPM decode → q177 aHash → multi-index Hamming
    * blocking → exact verify. The 64-bit hash splits into EIGHT 8-bit
    * bands; by pigeonhole any pair within Hamming distance 7 shares at
    * least one unchanged band, so candidates from the 8 band-equality
    * buckets are LOSS-FREE for the ≤6 threshold (the image twin of q31's
    * SimHash banding). Verify is a local popcount of the XOR halves on
    * candidates only — the corpus never goes pairwise. At 100 TB each
    * band bucket holds n/256 of the images in expectation; a skewed
    * bucket (monochrome boilerplate) would salt exactly like q30's
    * bands.
    */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hs = imageAHash(spark, dir)
      .select($"media_id", $"phash_hi", $"phash_lo")
      .localCheckpoint(eager = true) // consumed by band explode + 2 verify joins
    val bandExprs = (0 until 4).map(j =>
        s"struct($j AS bi, shiftright(phash_lo, ${8 * j}) & 255 AS bv)") ++
      (4 until 8).map(j =>
        s"struct($j AS bi, shiftright(phash_hi, ${8 * (j - 4)}) & 255 AS bv)")
    val bands = hs.select($"media_id",
        explode(expr(bandExprs.mkString("array(", ", ", ")"))).as("b"))
      .select($"media_id", $"b.bi".as("bi"), $"b.bv".as("bv"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("d1"), col("b.media_id").as("d2"))
      .distinct()
    cand
      .join(hs.select($"media_id".as("d1"), $"phash_hi".as("h1"), $"phash_lo".as("l1")), "d1")
      .join(hs.select($"media_id".as("d2"), $"phash_hi".as("h2"), $"phash_lo".as("l2")), "d2")
      .withColumn("hamming",
        expr("CAST(bit_count(h1 ^ h2) + bit_count(l1 ^ l2) AS INTEGER)"))
      .filter($"hamming" <= 6)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  val imageNearDupSql: String =
    """WITH m AS (
      |  SELECT doc_id AS id, CAST(doc_id % 16 * 4 + 16 AS BIGINT) AS w,
      |         CAST(doc_id % 9 * 4 + 16 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT id, w, h, unnest(range(0, w)) AS x FROM m),
      |pxy AS (SELECT id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |g AS (
      |  SELECT id, (8 * x) // w AS bx, (8 * y) // h AS by,
      |    (id * 31 + (3 * (y * w + x) + 1) * 7) % 256 AS gv
      |  FROM pxy),
      |cells AS (SELECT id, by, bx, SUM(gv) // COUNT(*) AS cm FROM g GROUP BY 1, 2, 3),
      |ov AS (SELECT id, SUM(cm) // 64 AS mean64 FROM cells GROUP BY id),
      |bits AS (
      |  SELECT c.id, c.by * 8 + c.bx AS idx,
      |    CASE WHEN c.cm > ov.mean64 THEN 1 ELSE 0 END AS b
      |  FROM cells c JOIN ov ON ov.id = c.id),
      |hashes AS (
      |  SELECT id,
      |    CAST(SUM(CASE WHEN idx >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(SUM(CASE WHEN idx < 32 THEN b * (CAST(1 AS BIGINT) << CAST(idx AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_lo
      |  FROM bits GROUP BY id),
      |bands AS (
      |  SELECT id, j,
      |    CASE WHEN j < 4 THEN (phash_lo >> (8 * j)) & 255
      |         ELSE (phash_hi >> (8 * (j - 4))) & 255 END AS bv
      |  FROM hashes, unnest(range(0, 8)) AS t(j)),
      |cand AS (
      |  SELECT DISTINCT a.id AS d1, b.id AS d2
      |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv AND a.id < b.id)
      |SELECT d1, d2,
      |  CAST(bit_count(CAST(xor(h1.phash_hi, h2.phash_hi) AS UBIGINT))
      |     + bit_count(CAST(xor(h1.phash_lo, h2.phash_lo) AS UBIGINT)) AS INTEGER) AS hamming
      |FROM cand JOIN hashes h1 ON d1 = h1.id JOIN hashes h2 ON d2 = h2.id
      |WHERE bit_count(CAST(xor(h1.phash_hi, h2.phash_hi) AS UBIGINT))
      |    + bit_count(CAST(xor(h1.phash_lo, h2.phash_lo) AS UBIGINT)) <= 6
      |ORDER BY d1, d2""".stripMargin

  /** q178: audio energy-contour fingerprints — the audio twin of q177
    * ([[graft.operators.MediaFormats.energyFingerprint]]): each decoded
    * PCM16 stream's 16-window mean-|sample| contour thresholds at the
    * contour mean into a 16-bit signature, the blocking key an audio
    * near-dup pass buckets on. Spark parses the RIFF binaries; the
    * oracle recomputes every signature from the sample formula —
    * decode-vs-formula cross-grading, bit-for-bit.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.realMedia(spark, documents(spark, dir))
      .filter(_.modality == "audio")
      .map { r =>
        val wv = graft.operators.MediaFormats.parseWav(r.payload)
        val (sig, pop) = graft.operators.MediaFormats.energyFingerprint(wv)
        (r.media_id, wv.samples.length, sig, pop)
      }.toDF("media_id", "n_samples", "sig", "n_bits")
      .orderBy($"media_id")
  }

  val audioFingerprintSql: String =
    """WITH m AS (
      |  SELECT doc_id AS id, CAST(400 + doc_id % 100 AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |sm AS (SELECT id, n, unnest(range(0, n)) AS i FROM m),
      |v AS (
      |  SELECT id, (16 * i) // n AS win,
      |    ABS(((id * 13 + i * 11) % 65536) - 32768) AS a
      |  FROM sm),
      |wm AS (SELECT id, win, SUM(a) // COUNT(*) AS wmean FROM v GROUP BY 1, 2),
      |ov AS (SELECT id, SUM(wmean) // 16 AS m16 FROM wm GROUP BY id),
      |bits AS (
      |  SELECT wm.id, wm.win, CASE WHEN wm.wmean > ov.m16 THEN 1 ELSE 0 END AS b
      |  FROM wm JOIN ov ON ov.id = wm.id),
      |sg AS (
      |  SELECT id, CAST(SUM(b * (1 << CAST(win AS INTEGER))) AS INTEGER) AS sig,
      |         CAST(SUM(b) AS INTEGER) AS n_bits
      |  FROM bits GROUP BY id)
      |SELECT m.id AS media_id, CAST(m.n AS INTEGER) AS n_samples, sg.sig, sg.n_bits
      |FROM m JOIN sg ON sg.id = m.id
      |ORDER BY media_id""".stripMargin

  /** q179: video motion fingerprints — the third modality signature
    * (q177 image aHash, q178 audio contour): per consecutive-frame
    * transition, the integer mean |Y_t − Y_{t−1}| over the luma plane of
    * the PARSED Y4M stream — the scene-cut/static-content signal a video
    * dedup or sampling policy keys on (a transition's mad ≈ 0 means a
    * near-duplicate frame worth dropping; q80's stride-2 sampler is the
    * blind version of that decision). All integer (abs-diff sum, one
    * div); the oracle recomputes every transition from the generator's
    * global-index pixel formula. One row per (video, transition).
    */
  def videoMotion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.realMedia(spark, documents(spark, dir))
      .filter(_.modality == "video")
      .flatMap { r =>
        val v = graft.operators.MediaFormats.parseY4m(r.payload)
        val ySize = v.width * v.height
        (1 until v.frames.length).map { t =>
          var s = 0L
          var p = 0
          while (p < ySize) {
            s += math.abs((v.frames(t)(p) & 0xFF) - (v.frames(t - 1)(p) & 0xFF))
            p += 1
          }
          (r.media_id, t, v.frames.length, s / ySize)
        }
      }.toDF("media_id", "transition", "n_frames", "mad")
      .orderBy($"media_id", $"transition")
  }

  val videoMotionSql: String =
    """WITH m AS (
      |  SELECT doc_id AS id,
      |    CAST(doc_id % 16 * 4 + 16 AS BIGINT) AS w,
      |    CAST(doc_id % 9 * 4 + 16 AS BIGINT) AS h,
      |    CAST(2 + doc_id % 4 AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |tr AS (SELECT id, w, h, nf, unnest(range(1, nf)) AS t FROM m),
      |px AS (SELECT id, w, h, nf, t, unnest(range(0, w * h)) AS p FROM tr),
      |d AS (
      |  SELECT id, t, nf, w, h,
      |    ABS((id*31 + (t * (w*h*3//2) + p) * 7) % 256
      |      - (id*31 + ((t-1) * (w*h*3//2) + p) * 7) % 256) AS ad
      |  FROM px)
      |SELECT id AS media_id, CAST(t AS INTEGER) AS transition,
      |  CAST(nf AS INTEGER) AS n_frames,
      |  CAST(SUM(ad) // (w * h) AS BIGINT) AS mad
      |FROM d
      |GROUP BY id, t, nf, w, h
      |ORDER BY media_id, transition""".stripMargin

  /** q80: REAL video frame sampling — every 2nd frame of each Y4M stream
    * (stride-2 temporal downsample, the standard frame-sample primitive),
    * graded on sampled-frame count and the luma mean over the sampled
    * frames only. The oracle recomputes both from the generator formula
    * with the same stride predicate.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.realMedia(spark, documents(spark, dir))
      .filter(_.modality == "video")
      .map { r =>
        val v = graft.operators.MediaFormats.parseY4m(r.payload)
        val ySize = v.width * v.height
        var s = 0L; var f = 0; var ns = 0
        while (f < v.frames.length) {
          if (f % 2 == 0) {
            val fr = v.frames(f)
            var i = 0
            while (i < ySize) { s += (fr(i) & 0xFF); i += 1 }
            ns += 1
          }
          f += 1
        }
        (r.media_id, v.frames.length, ns, s.toDouble / (ns.toLong * ySize))
      }.toDF("media_id", "n_frames", "n_sampled", "sampled_luma_mean")
      .orderBy($"media_id")
  }

  /** Same generator arithmetic as the q56 video CTE, restricted to even
    * frame indices; n_sampled = ⌈nf/2⌉.
    */
  val frameSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 16 * 4 + 16 AS INTEGER) AS w,
      |    CAST(doc_id % 9 * 4 + 16 AS INTEGER) AS h,
      |    CAST(2 + doc_id % 4 AS INTEGER) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |v AS (
      |  SELECT media_id, nf, w, h, CAST((nf + 1) // 2 AS INTEGER) AS ns,
      |    (media_id*31 + (fr.f*(w*h*3/2) + g.i)*7) % 256 AS b
      |  FROM m
      |  JOIN generate_series(0, 5) fr(f) ON fr.f < nf AND fr.f % 2 = 0
      |  JOIN generate_series(0, 3700) g(i) ON g.i < CAST(w AS BIGINT)*h)
      |SELECT media_id, nf AS n_frames, ns AS n_sampled,
      |  CAST(CAST(SUM(b) AS BIGINT) AS DOUBLE) / (ns*w*h) AS sampled_luma_mean
      |FROM v
      |GROUP BY media_id, nf, ns, w, h
      |ORDER BY media_id""".stripMargin

  /** q57: per-language distinct-document counts through the KMV sketch
    * aggregate (custom TypedImperativeAggregate). k=16384 exceeds every
    * per-group distinct count in the test corpus, so the sketch runs its
    * full path (hash, bounded buffer, partial-aggregate merge) yet the
    * answer is EXACT — which is what makes COUNT(DISTINCT) a valid
    * oracle (the q30 trick). Estimation accuracy at small k is
    * spec-verified in KmvSketchSpec.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.expressions.KmvSketch
    KmvSketch.register(spark)
    documents(spark, dir)
      .groupBy($"lang")
      .agg(KmvSketch.kmvDistinct($"text", 16384).as("n_distinct"))
      .orderBy($"lang")
  }

  val kmvDistinctSql: String =
    """SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q85: exact heavy hitters at sketch cost — top-20 token bigrams via
    * one [[graft.functions.expressions.MisraGries]] pass + broadcast
    * exact confirm ([[graft.operators.HeavyHitters]]). The result is
    * exact and self-certified (k-th count must clear the n/(capacity+1)
    * sketch bound — 332 vs 129 at sf0.1), so the oracle is the plain
    * exact GROUP BY. On this near-uniform synthetic corpus (~931
    * distinct bigrams) capacity 2048 saturates without decrements; the
    * lossy path (decrement rounds, merge-pivot trims, survivor
    * guarantee under 100× skew) is exercised on a Zipfian fixture in
    * MisraGriesSpec. Bigrams come from an index-aware `transform` over
    * the token array — no window, no self-join, stays in codegen.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // token array projected ONCE per row: referencing the raw split(text)
    // expression inside the transform lambda re-evaluates the split per
    // ELEMENT (O(len²) per document — measured 2.3-2.7 s for the 266k-
    // bigram pass at sf0.1 vs 0.6-0.9 s projected, and this query pays
    // the pass twice)
    val bigrams = documents(spark, dir)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(explode(transform(
        slice($"t", lit(1), size($"t") - 1),
        (x, i) => concat_ws(" ", x, element_at($"t", i + 2)))).as("bigram"))
    graft.operators.HeavyHitters.topK(bigrams, $"bigram", k = 20, capacity = 2048)
      .select($"item", $"count".as("n"))
      .orderBy($"n".desc, $"item".asc)
  }

  val heavyHittersSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |bi AS (
      |  SELECT a.tok||' '||b.tok AS item
      |  FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1)
      |SELECT item, CAST(COUNT(*) AS BIGINT) AS n
      |FROM bi GROUP BY item
      |ORDER BY n DESC, item LIMIT 20""".stripMargin

  /** q87: exact-phrase search via a positional inverted index
    * ([[graft.operators.InvertedIndex]]): build term → postings
    * (doc_id, sorted positions) in two hash aggregations, then count
    * "order fast" occurrences per document by intersecting ONLY the two
    * phrase terms' posting lists on (doc_id, offset-aligned position) —
    * the corpus itself is never rescanned at query time. The oracle
    * recomputes matches with a position self-join over the tokenized
    * corpus.
    */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val index = graft.operators.InvertedIndex.build(
      documents(spark, dir), "doc_id", "text")
    graft.operators.InvertedIndex.phraseSearch(index, Seq("order", "fast"))
      .orderBy($"doc_id")
  }

  val phraseSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents)
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
      |FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |WHERE a.tok='order' AND b.tok='fast'
      |GROUP BY a.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** q91: n-gram novelty vs a held-out benchmark — for every corpus
    * document, how many of its distinct token trigrams appear nowhere in
    * the benchmark slice (doc_id % 97 == 0, the q49/q81 split). The
    * decontamination-adjacent coverage metric: low novelty flags docs
    * that paraphrase the benchmark even when no exact passage matches
    * (q49 catches those). Scale shape: the benchmark gram set is tiny
    * relative to the corpus, so it broadcasts and the corpus-side probe
    * is a map-side left join — the corpus shuffles once, on doc_id, for
    * the per-doc rollup. Integer counts only; no float drift.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val benchGrams = TextFunctions
      .shingles(docs.filter($"doc_id" % 97 === 0), "doc_id", "text", 3)
      .select($"shingle").distinct()
    val grams = TextFunctions
      .shingles(docs.filter($"doc_id" % 97 =!= 0), "doc_id", "text", 3)
    grams
      .join(broadcast(benchGrams.withColumn("seen", lit(1))), Seq("shingle"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"seen".isNull, 1L).otherwise(0L)).as("n_novel"))
      .orderBy($"doc_id")
  }

  val ngramNoveltySql: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT DISTINCT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS g
      |  FROM tk a
      |  JOIN tk b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN tk c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 97 = 0)
      |SELECT t.doc_id, COUNT(*) AS n_grams,
      | CAST(SUM(CASE WHEN b.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |FROM tri t LEFT JOIN bench b ON t.g = b.g
      |WHERE t.doc_id % 97 <> 0
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** q95: ranked sparse retrieval over the positional inverted index —
    * top-20 documents for a 3-term query, scored
    * `Σ_t tf(t,d) · (N div df(t))`: term-frequency times an integer
    * rarity weight (the transcendental-free IDF stand-in, keeping the
    * oracle exact where log-based BM25 would drift in the last ulp).
    * Like q87, query cost is proportional to the query terms' posting
    * lists — the index rows for 3 terms out of the vocabulary — not the
    * corpus; df and tf both come from the index itself, so the corpus is
    * scanned once at build time and never at query time.
    */
  def sparseRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val n = docs.count()
    val terms = Seq("order", "fast", "free")
    graft.operators.InvertedIndex.build(docs, "doc_id", "text")
      .filter($"term".isin(terms: _*))
      .select($"term", expr(s"$n div df").as("w"), explode($"postings").as("p"))
      .select($"p.doc_id".as("doc_id"), (size($"p.positions").cast("long") * $"w").as("part"))
      .groupBy($"doc_id")
      .agg(sum($"part").as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(20)
  }

  val sparseRetrievalSql: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tk WHERE tok IN ('order','fast','free')
      |  GROUP BY doc_id, tok),
      |dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
      |SELECT tf.doc_id, CAST(SUM(tf.tf * (nn.n // dfr.df)) AS BIGINT) AS score
      |FROM tf JOIN dfr ON tf.tok = dfr.tok CROSS JOIN nn
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin

  /** q74: record-linkage near-dup — (lang, prefix-8) blocking, then a
    * BOUNDED levenshtein verify on candidates only (Spark's 3-arg
    * `levenshtein` early-exits past the threshold, so verify cost is
    * O(k·len) per pair). The fourth dedup family (after Jaccard, MinHash,
    * SimHash): edit distance catches small in-place edits that shingle
    * sets dilute. Oracle: DuckDB replays the same blocking join and its
    * own `levenshtein`.
    */
  def editDistPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.editDistancePairs(documents(spark, dir), "doc_id", "text", "lang",
        prefixLen = 8, maxDist = 8)
      .orderBy($"d1", $"d2")
  }

  val editDistPairsSql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text, substr(text, 1, 8) AS pfx FROM documents)
      |SELECT a.doc_id AS d1, c.doc_id AS d2, a.lang AS lang,
      |  CAST(levenshtein(a.text, c.text) AS BIGINT) AS lev_dist,
      |  CAST(length(a.text) AS BIGINT) AS len1,
      |  CAST(length(c.text) AS BIGINT) AS len2
      |FROM b a JOIN b c ON a.lang = c.lang AND a.pfx = c.pfx AND a.doc_id < c.doc_id
      |WHERE levenshtein(a.text, c.text) <= 8
      |ORDER BY d1, d2""".stripMargin

  /** q116: the hashing trick — fixed-dimension signed bag-of-words without
    * a vocabulary (Weinberger et al., feature hashing). Each token maps to
    * bucket `h mod 64` with sign from the hash's next bit; per-(doc,
    * bucket) signed counts are the sparse feature vector, zero entries
    * dropped. The collision-canceling sign is what keeps hashed features
    * unbiased, and the whole op is one explode + one map-side-combining
    * aggregate — no vocabulary broadcast, no second pass, the reason
    * hashing beats dictionary encoding at 100 TB. Hash is
    * [[graft.functions.TextFunctions.portableHash60]] so DuckDB replays it
    * bit-for-bit.
    */
  def featureHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("tok"))
      .withColumn("h", TextFunctions.portableHash60($"tok"))
      .groupBy($"doc_id", pmod($"h", lit(64L)).as("bucket"))
      .agg(sum(when(pmod(expr("h DIV 64"), lit(2L)) === 0L, 1L).otherwise(-1L)).as("weight"))
      .filter($"weight" =!= 0L)
      .orderBy($"doc_id", $"bucket")
  }

  val featureHashSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |h AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks)
      |SELECT doc_id, hv % 64 AS bucket,
      |  CAST(SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
      |FROM h GROUP BY 1, 2
      |HAVING SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0
      |ORDER BY doc_id, bucket""".stripMargin

  /** q132: Count-Min-sketch frequency estimation over the token stream —
    * one [[graft.functions.expressions.CountMin]] pass (4×1024 counter
    * grid, 32 KB of mergeable state; no per-token shuffle) probed at the
    * exact top-20 tokens. Buckets derive from md5 substrings (8 hex chars
    * per hash row), so the oracle rebuilds the sketch cell-for-cell in
    * DuckDB and the estimate — min over the 4 cells a token hashes to —
    * is integer-exact cross-engine. `est ≥ exact` always (CMS
    * one-sided error); the exact column is the verification anchor.
    */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.expressions.CountMin.register(spark)
    val d = 4; val w = 1024
    def buckets(tok: org.apache.spark.sql.Column) =
      array((0 until d).map(j =>
        conv(substring(md5(tok), 1 + 8 * j, 8), 16, 10).cast("long") % w): _*)
    val toks = documents(spark, dir)
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
    val sketch = toks.select(
      graft.functions.expressions.CountMin.countMin(buckets($"tok"), d, w)
        .as("sketch"))
    val probes = toks.groupBy($"tok").agg(count(lit(1)).as("exact"))
      .orderBy($"exact".desc, $"tok".asc).limit(20)
    probes.crossJoin(sketch) // 20 × 1 rows
      .withColumn("bk", buckets($"tok"))
      .withColumn("est", least((0 until d).map(j =>
        element_at($"sketch", (lit(j * w) + element_at($"bk", j + 1) + 1).cast("int"))): _*))
      .select($"tok", $"exact", $"est")
      .orderBy($"exact".desc, $"tok".asc)
  }

  val cmsFreqSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text,' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
      |buck AS (
      |  SELECT tok, n, j,
      |         ('0x' || substr(md5(tok), 1 + 8*j, 8))::BIGINT % 1024 AS b
      |  FROM cnt CROSS JOIN generate_series(0, 3) AS t(j)),
      |cells AS (SELECT j, b, SUM(n) AS total FROM buck GROUP BY j, b),
      |probe AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT 20)
      |SELECT p.tok AS tok, CAST(p.n AS BIGINT) AS exact,
      |       CAST(MIN(c.total) AS BIGINT) AS est
      |FROM probe p
      |JOIN buck bk ON bk.tok = p.tok
      |JOIN cells c ON c.j = bk.j AND c.b = bk.b
      |GROUP BY p.tok, p.n
      |ORDER BY exact DESC, p.tok""".stripMargin

  /** q136: BPE tokenizer induction ([[graft.operators.Bpe]]) — learn the
    * first 6 byte-pair merges from the corpus word-frequency table. The
    * corpus is touched ONCE (the vocab aggregate); each merge iteration
    * runs on vocabulary-sized data, which is what makes tokenizer
    * training tractable at 100 TB. The oracle unrolls all 6 iterations
    * in DuckDB (pair counts → lexicographic-tie argmax → island-parity
    * merge, proven equivalent to the Spark left fold in BpeSpec).
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = documents(spark, dir)
      .select(explode(TextFunctions.tokens($"text")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    graft.operators.Bpe.learn(vocab, k = 6).orderBy($"rank")
  }

  val bpeMergesSql: String = graft.operators.Bpe.oracleSql(6)

  /** q138: maximal repeated token spans across documents — the exact
    * substring-level dedup primitive (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022, §4.1 ExactSubstr):
    * every maximal run of ≥ 8 consecutive shared tokens between two
    * documents, located by (start1, start2, length). Mechanics: 8-gram
    * fingerprints with positions, equi-join across documents, then
    * diagonal runs (i2 − i1 constant, consecutive i1) merged by
    * gaps-and-islands — a matching-run of c consecutive 8-grams is a
    * shared span of c+7 tokens, maximal by construction because the run
    * breaks exactly where the grams stop matching.
    *
    * Scale: the only corpus-sized shuffle is the gram equi-join (grams
    * are 8-byte xxhash64 fingerprints, not token arrays — the same
    * fingerprint-not-payload move as shingleHashes, and 4× fewer shuffle
    * bytes plus no MD5 digest work vs the earlier 32-char md5 hex; the
    * output carries no fingerprint, so the oracle is unchanged and a
    * cross-document collision is the same ~len²·2⁻⁶⁴ event the dedup
    * family already accepts); islands group within
    * (d1, d2, diagonal) — bounded per document pair. The q65 passage
    * dedup is the bucketed approximation; this is its exact counterpart,
    * like q125 is to q30.
    */
  def repeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // token array projected ONCE per row (same fix as heavyHitters: a raw
    // split(text) referenced inside the lambda re-splits per POSITION)
    val grams = documents(spark, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("t"))
      .select($"doc_id", explode(
        when(size($"t") >= 8,
          transform(sequence(lit(1), size($"t") - 7), i =>
            struct(i.as("i"), xxhash64(concat_ws(" ", slice($"t", i, lit(8)))).as("g"))))
          .otherwise(typedLit(Seq.empty[(Int, Long)])
            .cast("array<struct<i:int,g:bigint>>"))).as("s"))
      .select($"doc_id", $"s.i".as("i"), $"s.g".as("g"))
    val p = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.i").as("i1"), col("b.i").as("i2"))
    val w = Window.partitionBy($"d1", $"d2", $"diag").orderBy($"i1")
    p.withColumn("diag", $"i2" - $"i1")
      .withColumn("run", $"i1" - row_number().over(w))
      .groupBy($"d1", $"d2", $"diag", $"run")
      .agg(min($"i1").as("start1"), min($"i2").as("start2"),
        (count(lit(1)) + 7).as("span_len"))
      .select($"d1", $"d2", $"start1", $"start2", $"span_len")
      .orderBy($"d1", $"d2", $"start1", $"start2")
  }

  val repeatedSpansSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      |grams AS (
      |  SELECT doc_id, t.i,
      |         md5(array_to_string(list_slice(ts, t.i, t.i + 7), ' ')) AS g
      |  FROM toks CROSS JOIN unnest(range(1, len(ts) - 6)) AS t(i)
      |  WHERE len(ts) >= 8),
      |p AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.i AS i1, b.i AS i2
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
      |r AS (
      |  SELECT d1, d2, i1, i2, i2 - i1 AS diag,
      |    i1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, i2 - i1 ORDER BY i1) AS run
      |  FROM p)
      |SELECT d1, d2, CAST(MIN(i1) AS INTEGER) AS start1,
      |       CAST(MIN(i2) AS INTEGER) AS start2,
      |       CAST(COUNT(*) + 7 AS BIGINT) AS span_len
      |FROM r GROUP BY d1, d2, diag, run
      |ORDER BY d1, d2, start1, start2""".stripMargin

  /** q139: weighted (multiset) Jaccard near-dup pairs — term-frequency-
    * aware dedup: J_w(A,B) = Σ_t min(c_A(t), c_B(t)) / Σ_t max(c_A(t),
    * c_B(t)), which penalizes repeated-token padding that set-Jaccard
    * (q29) is blind to. All-integer: Σmax = |A| + |B| − Σmin, the
    * threshold (4/5 — this corpus shows a clean gap: planted near-dups
    * at ≥ 0.92, the common-word noise floor under 0.75) compares
    * cross-multiplied, and the reported jaccard is a single IEEE
    * division. Computed sub-quadratically via the occurrence-index
    * expansion + banded weighted MinHash with exact candidate-only
    * verify (inline note); the brute-force multiset join is the DuckDB
    * oracle, not the execution plan.
    */
  def weightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Multiset Jaccard reduces EXACTLY to set Jaccard over
    // occurrence-indexed elements: expand each (tok, count c) into
    // elements tok#1 … tok#c — then |A∩B| over elements = Σ min(c_A, c_B)
    // and |A∪B| = Σ max. Candidates come from banded MinHash over those
    // elements (= integer-weight weighted MinHash), verified exactly on
    // collisions only — the q30 shape. Neither the naive shared-token
    // self-join (~448M rows at sf0.1: every doc shares frequent tokens)
    // nor the AllPairs prefix join works here: this corpus's template
    // vocabulary is ~300 words, so even the "rarest" prefix elements sit
    // in ~900 documents and the prefix buckets alone produce ~28M
    // candidate pairs (measured). Banding is 12×8 — NOT q30's 16×4: the
    // multiset noise floor sits at J_w≈0.55, where 4-row bands collide
    // with p≈0.78 and flood the verify join; 8-row bands push the
    // noise-collision rate to ≈0.10 while planted dups (≥0.92, and
    // nothing exists in (0.75, 0.92) on this corpus — measured gap)
    // still collide with p≈1−2e-4. The brute-force multiset ORACLE
    // grades the whole thing, so any dropped pair hash-mismatches the
    // round — same recall argument as q30.
    val tc = documents(spark, dir)
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    // occurrence elements as 64-bit hashes: cache, signature groupBy, and
    // both verify joins move 8-byte longs instead of "tok#k" strings (the
    // shingleHashes move — identical results up to the 64-bit collisions
    // the whole MinHash family accepts; signatures are unchanged because
    // minhashSignaturesAndCounts hashed to the same xxhash64 anyway)
    val els = tc.select($"doc_id",
        explode(transform(sequence(lit(1L), $"c"), k =>
          xxhash64(concat($"tok", lit("#"), k)))).as("h"))
      .cache()
    val sc = Dedup.minhashSignaturesAndCountsFromHashes(els, "doc_id", numHashes = 96).persist()
    val cand = Dedup.minhashCandidates(sc.select($"doc_id", $"sig"), "doc_id", bands = 12)
    val counts = sc.select($"doc_id", $"n_sh")
    val inter = els.select($"doc_id".as("d1"), $"h")
      .join(cand, Seq("d1"))
      .join(els.select($"doc_id".as("d2"), $"h"), Seq("d2", "h"))
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("smin"))
    inter
      .join(counts.select($"doc_id".as("d1"), $"n_sh".as("t1")), "d1")
      .join(counts.select($"doc_id".as("d2"), $"n_sh".as("t2")), "d2")
      .filter(lit(5) * $"smin" >= lit(4) * ($"t1" + $"t2" - $"smin")) // J_w >= 4/5
      .select($"d1", $"d2", $"smin", $"t1", $"t2",
        ($"smin".cast("double") / ($"t1" + $"t2" - $"smin")).as("wjaccard"))
      .orderBy($"d1", $"d2")
  }

  val weightedJaccardSql: String =
    """WITH tc AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) t
      |  GROUP BY doc_id, tok),
      |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM tc GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2,
      |         CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS smin
      |  FROM tc a JOIN tc b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2, smin, t1.t AS t1, t2.t AS t2,
      |       CAST(smin AS DOUBLE) / (t1.t + t2.t - smin) AS wjaccard
      |FROM inter
      |JOIN tot t1 ON t1.doc_id = d1
      |JOIN tot t2 ON t2.doc_id = d2
      |WHERE 5 * smin >= 4 * (t1.t + t2.t - smin)
      |ORDER BY d1, d2""".stripMargin

  /** q141: BPE encoding with the learned tokenizer — learn the q136
    * merges, apply them in rank order (one [[graft.operators.Bpe
    * .applyMerge]] fold per merge; order is semantic, later merges
    * consume earlier output symbols), and emit the frequency-weighted
    * top-30 symbol table of the encoded vocabulary. Train→apply closes
    * the tokenizer loop; the oracle shares the q136 iteration CTEs
    * verbatim and reads the final `w6` state, so a drift in EITHER the
    * learned merges or the application semantics hash-mismatches.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = documents(spark, dir)
      .select(explode(TextFunctions.tokens($"text")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val merges = graft.operators.Bpe.learn(vocab, 6).orderBy($"rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.Bpe.encode(vocab, merges)
      .select(explode($"syms").as("sym"), $"freq")
      .groupBy($"sym").agg(sum($"freq").as("n"))
      .orderBy($"n".desc, $"sym".asc).limit(30)
  }

  val bpeEncodeSql: String = graft.operators.Bpe.encodeOracleSql(6, 30)

  /** q169: KMV set ALGEBRA — the sketch-union/-intersection layer q57's
    * single-set estimate doesn't exercise: min-256 signatures of the EN
    * and DE trigram-shingle sets (built through the q152 Generator)
    * support |A∪B| by sketch union (min-k of the merged signatures — the
    * KMV property: union of sketches IS the sketch of the union) and
    * |A∩B| by inclusion–exclusion, each next to its exact anchor. The
    * estimator is integer-exact cross-engine: est = (k−1)·2⁶⁰ div h_k
    * over the portable 60-bit hash space (DECIMAL(38,0) / HUGEINT — no
    * float in the estimate), exact below k by construction. Scale: each
    * signature is one TakeOrdered over hashed shingles — 256 longs per
    * corpus regardless of size; only the anchors pay distinct shuffles.
    */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.expressions.NGramGenerate.register(spark)
    val k = 256
    val big = "CAST(255 AS DECIMAL(38,0)) * CAST(1152921504606846976 AS DECIMAL(38,0))"
    def grams(lang: String) = documents(spark, dir)
      .filter($"lang" === lang)
      .select(TextFunctions.tokens($"text").as("t"))
      .select(expr("graft_ngrams(t, 3)").as(Seq("pos", "gram")))
      .select(TextFunctions.portableHash60($"gram").as("h")).distinct()
    val a = grams("en").localCheckpoint(true)
    val b = grams("de").localCheckpoint(true)
    def kminStats(df: DataFrame, tag: String) =
      df.orderBy($"h").limit(k)
        .agg(count(lit(1)).as(s"nk_$tag"), max($"h").as(s"hk_$tag"))
        .select(expr(s"CASE WHEN nk_$tag < $k THEN nk_$tag ELSE CAST($big div hk_$tag AS BIGINT) END")
          .as(s"est_$tag"))
    val estA = kminStats(a, "a")
    val estB = kminStats(b, "b")
    val estU = kminStats(a.unionByName(b).distinct(), "u")
    val exacts = a.agg(count(lit(1)).as("exact_a")).crossJoin(
        b.agg(count(lit(1)).as("exact_b"))).crossJoin(
        a.unionByName(b).distinct().agg(count(lit(1)).as("exact_union")))
    exacts.crossJoin(estA).crossJoin(estB).crossJoin(estU)
      .select($"exact_a", $"est_a", $"exact_b", $"est_b",
        $"exact_union", $"est_u".as("est_union"),
        ($"exact_a" + $"exact_b" - $"exact_union").as("exact_inter"),
        ($"est_a" + $"est_b" - $"est_u").as("est_inter"))
  }

  val kmvSetOpsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents WHERE lang IN ('en', 'de')),
      |tri AS (
      |  SELECT a.lang, ('0x' || substr(md5(a.w || ' ' || b.w || ' ' || c.w), 1, 15))::BIGINT AS h
      |  FROM tok a
      |  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
      |ga AS (SELECT DISTINCT h FROM tri WHERE lang = 'en'),
      |gb AS (SELECT DISTINCT h FROM tri WHERE lang = 'de'),
      |gu AS (SELECT h FROM ga UNION SELECT h FROM gb),
      |ka AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk, CAST(MAX(h) AS BIGINT) AS hk
      |       FROM (SELECT h FROM ga ORDER BY h LIMIT 256) t),
      |kb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk, CAST(MAX(h) AS BIGINT) AS hk
      |       FROM (SELECT h FROM gb ORDER BY h LIMIT 256) t),
      |ku AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk, CAST(MAX(h) AS BIGINT) AS hk
      |       FROM (SELECT h FROM gu ORDER BY h LIMIT 256) t),
      |ex AS (SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ga) AS exact_a,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM gb) AS exact_b,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM gu) AS exact_union),
      |es AS (SELECT
      |  (SELECT CASE WHEN nk < 256 THEN nk
      |          ELSE CAST(CAST(255 AS HUGEINT) * 1152921504606846976 // hk AS BIGINT) END FROM ka) AS est_a,
      |  (SELECT CASE WHEN nk < 256 THEN nk
      |          ELSE CAST(CAST(255 AS HUGEINT) * 1152921504606846976 // hk AS BIGINT) END FROM kb) AS est_b,
      |  (SELECT CASE WHEN nk < 256 THEN nk
      |          ELSE CAST(CAST(255 AS HUGEINT) * 1152921504606846976 // hk AS BIGINT) END FROM ku) AS est_u)
      |SELECT ex.exact_a, es.est_a, ex.exact_b, es.est_b,
      |  ex.exact_union, es.est_u AS est_union,
      |  ex.exact_a + ex.exact_b - ex.exact_union AS exact_inter,
      |  es.est_a + es.est_b - es.est_u AS est_inter
      |FROM ex, es""".stripMargin

  /** q184: URL canonicalization + URL-level dedup — the step every web
    * crawl pipeline (CommonCrawl/C4/RefinedWeb lineage) applies before
    * content dedup: trivially-different spellings of one resource
    * (case-folded scheme/host, `www.`, default ports, fragments, tracking
    * params, param order, trailing slashes) must collapse to ONE canonical
    * key. Each document derives a deterministic messy URL (four spelling
    * variants by doc_id mod 4 over a shared path space); the op is
    * [[TextFunctions.canonicalizeUrl]] — built-in regex + higher-order
    * array functions, no UDF — followed by the canonical-key group: doc
    * count, representative (min doc_id), id checksum. The oracle repeats
    * the ENTIRE string surgery in DuckDB (RE2-compatible patterns by
    * construction), so any normalization drift hash-mismatches.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docPath($"lang", pmod($"doc_id", lit(50)))
    val url = when(pmod($"doc_id", lit(4)) === 0,
        concat(lit("HTTPS://WWW."), $"source", lit(".Example.COM:443/"), base,
          lit("/?utm_source=feed&b=2&a=1")))
      .when(pmod($"doc_id", lit(4)) === 1,
        concat(lit("https://"), $"source", lit(".example.com/"), base,
          lit("?a=1&ref=tw&b=2")))
      .when(pmod($"doc_id", lit(4)) === 2,
        concat(lit("https://"), $"source", lit(".EXAMPLE.com/"), base,
          lit("#section-3")))
      .otherwise(
        concat(lit("https://www."), $"source", lit(".example.com:443/"), base, lit("//")))
    documents(spark, dir)
      .select($"doc_id", TextFunctions.canonicalizeUrl(url).as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("rep_doc"),
        sum($"doc_id").as("id_checksum"))
      .orderBy($"canonical_url")
  }

  /** Shared messy-path fragment: lang/id path (the source lives in the
    * hostname, not the path).
    */
  private def docPath(lang: org.apache.spark.sql.Column,
                      id: org.apache.spark.sql.Column) =
    concat(lang, lit("/doc/"), id.cast("string"))

  val urlDedupSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed&b=2&a=1'
      |      WHEN 1 THEN 'https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&ref=tw&b=2'
      |      WHEN 2 THEN 'https://' || source || '.EXAMPLE.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '#section-3'
      |      ELSE 'https://www.' || source || '.example.com:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '//'
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id,
      |    regexp_replace(url, '#.*$', '') AS nofrag
      |  FROM raw),
      |comp AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
      |    regexp_extract(nofrag, '\?([^#]*)$', 1) AS rawq
      |  FROM parts),
      |hostpath AS (
      |  SELECT doc_id, scheme, rawq,
      |    regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', '') AS host0,
      |    regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1), '/+$', '') AS path0
      |  FROM comp),
      |canon AS (
      |  SELECT doc_id,
      |    scheme || '://' ||
      |    (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
      |          WHEN scheme = 'http'  THEN regexp_replace(host0, ':80$', '')
      |          ELSE host0 END) ||
      |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
      |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
      |  FROM (
      |    -- array_to_string([]) is NULL in DuckDB (Spark's array_join
      |    -- gives '') — coalesce, or every query-less URL goes NULL
      |    SELECT *, COALESCE(array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |      p -> p <> '' AND NOT starts_with(p, 'utm_')
      |           AND NOT starts_with(p, 'ref=') AND p <> 'ref')), '&'), '') AS q
      |    FROM hostpath) t)
      |SELECT canonical_url, COUNT(*) AS n_docs,
      |  CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM canon
      |GROUP BY canonical_url
      |ORDER BY canonical_url""".stripMargin

  /** q188: per-domain corpus statistics — the aggregation axis behind
    * domain blocklists and per-site quality decisions in crawl pipelines:
    * group the corpus by CANONICAL host ([[TextFunctions.canonicalHost]],
    * case/www/default-port-folded so spelling variants of one site can't
    * split its stats), then per domain: doc count, distinct canonical
    * URLs (the q184 key — docs-per-URL is the domain's internal dup
    * rate), token volume, language spread, and a doc-id checksum. One
    * hash-agg over codegen'd string surgery; the oracle repeats host
    * canonicalization + URL canonicalization in SQL.
    */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docPath($"lang", pmod($"doc_id", lit(50)))
    val url = when(pmod($"doc_id", lit(4)) === 0,
        concat(lit("HTTPS://WWW."), $"source", lit(".Example.COM:443/"), base,
          lit("/?utm_source=feed&b=2&a=1")))
      .when(pmod($"doc_id", lit(4)) === 1,
        concat(lit("https://"), $"source", lit(".example.com/"), base,
          lit("?a=1&ref=tw&b=2")))
      .when(pmod($"doc_id", lit(4)) === 2,
        concat(lit("https://"), $"source", lit(".EXAMPLE.com/"), base,
          lit("#section-3")))
      .otherwise(
        concat(lit("https://www."), $"source", lit(".example.com:443/"), base, lit("//")))
    documents(spark, dir)
      .select($"doc_id", $"lang",
        TextFunctions.tokenCount($"text").as("n_tokens"),
        TextFunctions.canonicalHost(url).as("domain"),
        TextFunctions.canonicalizeUrl(url).as("canonical_url"))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"canonical_url").as("n_urls"),
        sum($"n_tokens").as("n_tokens"),
        countDistinct($"lang").as("n_langs"),
        sum($"doc_id").as("id_checksum"))
      .orderBy($"domain")
  }

  val domainStatsSql: String =
    """WITH raw AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed&b=2&a=1'
      |      WHEN 1 THEN 'https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&ref=tw&b=2'
      |      WHEN 2 THEN 'https://' || source || '.EXAMPLE.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '#section-3'
      |      ELSE 'https://www.' || source || '.example.com:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '//'
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, lang, n_tokens, regexp_replace(url, '#.*$', '') AS nofrag FROM raw),
      |comp AS (
      |  SELECT doc_id, lang, n_tokens,
      |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
      |    regexp_extract(nofrag, '\?([^#]*)$', 1) AS rawq
      |  FROM parts),
      |hostpath AS (
      |  SELECT doc_id, lang, n_tokens, scheme, rawq,
      |    regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', '') AS host0,
      |    regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1), '/+$', '') AS path0
      |  FROM comp),
      |canon AS (
      |  SELECT doc_id, lang, n_tokens,
      |    (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
      |          WHEN scheme = 'http'  THEN regexp_replace(host0, ':80$', '')
      |          ELSE host0 END) AS domain,
      |    scheme || '://' ||
      |    (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
      |          WHEN scheme = 'http'  THEN regexp_replace(host0, ':80$', '')
      |          ELSE host0 END) ||
      |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
      |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
      |  FROM (
      |    SELECT *, COALESCE(array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |      p -> p <> '' AND NOT starts_with(p, 'utm_')
      |           AND NOT starts_with(p, 'ref=') AND p <> 'ref')), '&'), '') AS q
      |    FROM hostpath) t)
      |SELECT domain, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_urls,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM canon
      |GROUP BY domain
      |ORDER BY domain""".stripMargin

  /** q251: per-host politeness scheduling — the operator between q244's
    * robots gate and a real fetch: frontier URLs land in per-canonical-
    * host queues (the q188 [[TextFunctions.canonicalHost]] derivation)
    * and each URL gets a deterministic fetch ROUND from an integer
    * token bucket — round = per-host running index ÷ the host's
    * request rate — so "no more than `rate` requests per host per
    * round" holds by construction and the whole fetch plan is ONE
    * shuffle (the host-partitioned window) with no per-row state, no
    * driver loop, no mutable queue. Rate is a per-host policy value
    * (derived deterministically here; a real deployment joins the
    * crawl-delay dimension). Skew posture: a host's queue length is
    * bounded upstream by the q197 per-domain cap, so the window
    * partition cannot degenerate into one giant host.
    */
  def politenessSchedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docPath($"lang", pmod($"doc_id", lit(50)))
    val url = when(pmod($"doc_id", lit(4)) === 0,
        concat(lit("HTTPS://WWW."), $"source", lit(".Example.COM:443/"), base,
          lit("/?utm_source=feed&b=2&a=1")))
      .when(pmod($"doc_id", lit(4)) === 1,
        concat(lit("https://"), $"source", lit(".example.com/"), base,
          lit("?a=1&ref=tw&b=2")))
      .when(pmod($"doc_id", lit(4)) === 2,
        concat(lit("https://"), $"source", lit(".EXAMPLE.com/"), base,
          lit("#section-3")))
      .otherwise(
        concat(lit("https://www."), $"source", lit(".example.com:443/"), base, lit("//")))
    val frontier = documents(spark, dir)
      .select($"doc_id", url.as("url"),
        TextFunctions.canonicalHost(url).as("domain"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"domain").orderBy($"url", $"doc_id")
    frontier
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("rate", (length($"domain") % 3 + 1).cast("long"))
      .withColumn("fetch_round", floor($"idx" / $"rate").cast("long"))
      .select($"doc_id", $"domain", $"idx", $"rate", $"fetch_round")
      .orderBy($"domain", $"idx")
  }

  val politenessScheduleSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed&b=2&a=1'
      |      WHEN 1 THEN 'https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&ref=tw&b=2'
      |      WHEN 2 THEN 'https://' || source || '.EXAMPLE.com/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '#section-3'
      |      ELSE 'https://www.' || source || '.example.com:443/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) || '//'
      |    END AS url
      |  FROM documents),
      |comp AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(regexp_replace(url, '#.*$', ''), '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      |  FROM raw),
      |hosts AS (
      |  SELECT doc_id, url,
      |    CASE WHEN scheme = 'https' THEN regexp_replace(regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', ''), ':443$', '')
      |         WHEN scheme = 'http'  THEN regexp_replace(regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', ''), ':80$', '')
      |         ELSE regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', '') END AS domain
      |  FROM comp),
      |sched AS (
      |  SELECT doc_id, domain,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY url, doc_id) - 1 AS BIGINT) AS idx,
      |    CAST(length(domain) % 3 + 1 AS BIGINT) AS rate
      |  FROM hosts)
      |SELECT doc_id, domain, idx, rate, idx // rate AS fetch_round
      |FROM sched
      |ORDER BY domain, idx""".stripMargin

  /** q255: the crawl FETCH PLAN end-to-end in ONE Catalyst tree — the
    * composition capstone of the crawl tier (the q100 corpus-build
    * treatment for fetching): per-domain robots policies parsed ONCE on
    * the driver into two broadcast dimensions (the q244 rule table and a
    * [[graft.operators.Robots.crawlDelay]]-derived per-domain request
    * RATE = 6s round ÷ delay), frontier URLs gated by the RFC 9309
    * most-specific-match decision, and the SURVIVORS scheduled by the
    * q251 token bucket — rules join + window argmax + rates join + one
    * host-partitioned window, no per-row parsing, no driver loop, no
    * state. A real crawler runs exactly this plan per frontier batch.
    */
  def crawlFetchPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def robotsTxt(d: Int): String = {
      val sb = new StringBuilder
      sb.append("# synthetic policy for domain ").append(d).append('\n')
      sb.append("User-agent: otherbot\nDisallow: /\n\n")
      sb.append("User-agent: *\n")
      sb.append("Crawl-delay: ").append(d % 3 + 1).append('\n')
      sb.append("Disallow: /private\n")
      if (d % 3 == 0) { sb.append("Disallow: /\n"); sb.append("Allow: /src1\n") }
      if (d % 3 == 1) sb.append("Disallow: /src2\n")
      sb.toString
    }
    val policies = (0 until 7).map(d => d -> robotsTxt(d))
    val rules = policies.flatMap { case (d, txt) =>
      graft.operators.Robots.parse(txt, "graftbot")
        .map(r => (d.toLong, r.allow, r.pattern))
    }.toDF("r_domain", "rule_allow", "rule")
    val rates = policies.map { case (d, txt) =>
      val delay = graft.operators.Robots.crawlDelay(txt, "graftbot").getOrElse(1.0)
      (d.toLong, (6.0 / delay).toLong) // requests per 6-second round
    }.toDF("rt_domain", "rate")
    val docs = documents(spark, dir)
      .select($"doc_id", ($"doc_id" % 7).as("domain"),
        concat(lit("/"), $"source", lit("/"), $"doc_id").as("path"))
    val matched = docs.join(broadcast(rules),
        $"domain" === $"r_domain" && $"path".startsWith($"rule"))
      .select($"doc_id", $"rule_allow", length($"rule").as("l"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"l".desc, $"rule_allow".desc)
    val best = matched.withColumn("rk", row_number().over(wBest))
      .filter($"rk" === 1)
      .select($"doc_id", $"rule_allow".as("best_allow"))
    val allowed = docs.join(best, Seq("doc_id"), "left")
      .filter(coalesce($"best_allow", lit(true)))
      .drop("best_allow")
    val wHost = org.apache.spark.sql.expressions.Window
      .partitionBy($"domain").orderBy($"path", $"doc_id")
    allowed
      .join(broadcast(rates), $"domain" === $"rt_domain")
      .withColumn("idx", (row_number().over(wHost) - 1).cast("long"))
      .withColumn("fetch_round", floor($"idx" / $"rate").cast("long"))
      .select($"doc_id", $"domain", $"path", $"idx", $"rate", $"fetch_round")
      .orderBy($"domain", $"idx")
  }

  val crawlFetchPlanSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 7 AS domain,
      |             '/' || source || '/' || doc_id AS path FROM documents),
      |rules AS (
      |  SELECT dom AS domain, '/private' AS rule, FALSE AS rule_allow
      |  FROM generate_series(0, 6) g(dom)
      |  UNION ALL SELECT dom, '/', FALSE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 0
      |  UNION ALL SELECT dom, '/src1', TRUE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 0
      |  UNION ALL SELECT dom, '/src2', FALSE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 1),
      |m AS (SELECT d.doc_id, r.rule_allow, length(r.rule) AS l
      |      FROM d JOIN rules r ON d.domain = r.domain
      |        AND starts_with(d.path, r.rule)),
      |best AS (SELECT doc_id, rule_allow FROM (
      |    SELECT doc_id, rule_allow,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id
      |                         ORDER BY l DESC, rule_allow DESC) AS rk FROM m)
      |  WHERE rk = 1),
      |allowed AS (
      |  SELECT d.doc_id, d.domain, d.path
      |  FROM d LEFT JOIN best ON d.doc_id = best.doc_id
      |  WHERE COALESCE(best.rule_allow, TRUE)),
      |sched AS (
      |  SELECT doc_id, domain, path,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY domain
      |                            ORDER BY path, doc_id) - 1 AS BIGINT) AS idx,
      |    CAST(6 / (domain % 3 + 1) AS BIGINT) AS rate
      |  FROM allowed)
      |SELECT doc_id, domain, path, idx, rate, idx // rate AS fetch_round
      |FROM sched
      |ORDER BY domain, idx""".stripMargin

  /** q197: per-domain document cap — the crawl-curation rule that stops
    * one giant host from dominating a corpus (cap docs per registrable
    * domain, keep the best): each doc's canonical host comes from the
    * REAL [[TextFunctions.canonicalHost]] path (q188's derivation), and
    * the keep-set is the top 15 per domain by (n_chars desc, doc_id) —
    * executed through the custom [[graft.plans.TopKPerGroup]] physical
    * operator (partial per-partition heaps → one grouped exchange →
    * final heaps; no full sort, no rank-then-filter window), the exact
    * two-phase shape a 100 TB per-domain cap needs. The oracle expresses
    * the same contract as a row_number window.
    */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docPath($"lang", pmod($"doc_id", lit(50)))
    val url = when(pmod($"doc_id", lit(4)) === 0,
        concat(lit("HTTPS://WWW."), $"source", lit(".Example.COM:443/"), base,
          lit("/?utm_source=feed&b=2&a=1")))
      .when(pmod($"doc_id", lit(4)) === 1,
        concat(lit("https://"), $"source", lit(".example.com/"), base,
          lit("?a=1&ref=tw&b=2")))
      .when(pmod($"doc_id", lit(4)) === 2,
        concat(lit("https://"), $"source", lit(".EXAMPLE.com/"), base,
          lit("#section-3")))
      .otherwise(
        concat(lit("https://www."), $"source", lit(".example.com:443/"), base, lit("//")))
    val d = documents(spark, dir)
      .select($"doc_id", $"n_chars", TextFunctions.canonicalHost(url).as("domain"))
    graft.plans.TopKPerGroup.topK(d, Seq("domain"),
        Seq($"n_chars".desc, $"doc_id".asc), 15)
      .select($"domain", $"doc_id", $"n_chars")
      .orderBy($"domain", $"n_chars".desc, $"doc_id")
  }

  /** Every synthesized URL variant canonicalizes to `source.example.com`,
    * so the oracle derives the domain directly while the Spark side goes
    * through the full scheme/www/port/case surgery — a canonicalization
    * regression changes the grouping and hash-mismatches.
    */
  val domainCapSql: String =
    """WITH d AS (
      |  SELECT source || '.example.com' AS domain, doc_id, n_chars
      |  FROM documents),
      |r AS (
      |  SELECT domain, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY domain
      |      ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM d)
      |SELECT domain, doc_id, n_chars
      |FROM r WHERE rk <= 15
      |ORDER BY domain, n_chars DESC, doc_id""".stripMargin

  /** q210: character-level Shannon entropy per document — the cheapest
    * model-free quality signal a corpus filter has (binary junk, base64
    * blobs, and key-mash text score high; single-char spam scores near
    * zero; natural language sits ~3.5–4.5 bits/char). Computed exactly
    * from char frequencies via H = (ln n − Σ c·ln c / n) / ln 2 — two
    * hash aggregations, both map-side combinable; the char-explode is
    * linear in corpus bytes and the (doc, char) key space is bounded by
    * |alphabet| per doc, so at 100 TB this is a scan-shaped job, not a
    * shuffle problem. Per-doc H quantizes to DECIMAL(18,5) before the
    * per-language roll-up (double-sum order across partitions is not
    * associative; a 5dp quantization of an irrational quantity is
    * measure-zero from any boundary), then one exact sum + one double
    * division renders the average.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val freq = docs
      .select($"doc_id", $"lang", explode(split($"text", "")).as("ch"))
      .filter(length($"ch") === 1) // Java regex split keeps a trailing ""
      .groupBy($"doc_id", $"lang", $"ch").agg(count(lit(1)).as("c"))
    freq.groupBy($"doc_id", $"lang")
      .agg(sum($"c").as("n"),
        sum($"c".cast("double") * log($"c".cast("double"))).as("clnc"))
      .withColumn("hq",
        round((log($"n".cast("double")) - $"clnc" / $"n".cast("double")) / log(lit(2.0)), 5)
          .cast("decimal(18,5)"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"hq").cast("double") / count(lit(1)), 4).as("avg_entropy_bits"),
        sum(when($"hq" < 4.0, 1L).otherwise(0L)).as("n_low_entropy"))
      .orderBy($"lang")
  }

  val charEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id, lang, unnest(string_split(text, '')) AS ch FROM documents),
      |f AS (SELECT doc_id, lang, ch, COUNT(*) AS c
      |      FROM chars WHERE length(ch) = 1 GROUP BY 1, 2, 3),
      |e AS (SELECT doc_id, lang, SUM(c) AS n,
      |        SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS clnc
      |      FROM f GROUP BY 1, 2),
      |h AS (SELECT doc_id, lang,
      |        CAST(ROUND((LN(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE)) / LN(2.0), 5)
      |             AS DECIMAL(18,5)) AS hq
      |      FROM e)
      |SELECT lang, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(hq) AS DOUBLE) / COUNT(*), 4) AS avg_entropy_bits,
      |  CAST(SUM(CASE WHEN hq < 4.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy
      |FROM h GROUP BY lang ORDER BY lang""".stripMargin

  /** q214: MOSS winnowing fingerprints ([[graft.operators.Winnowing]]) —
    * the rolling-hash document fingerprint with the detection GUARANTEE
    * (any shared run of ≥ w+k−1 = 6 tokens contributes a common print),
    * reported as doc pairs sharing ≥ 2 winnowed prints with per-doc print
    * counts. Complements the dedup family: q30's MinHash estimates
    * whole-doc similarity, q138 finds exact repeated spans, winnowing is
    * the compact plagiarism/boilerplate detector between them. All
    * integer arithmetic on the portable 40-bit hash — bit-identical in
    * the oracle, which re-derives the window minima with SQL frames.
    */
  def winnowingPairs(spark: SparkSession, dir: String): DataFrame = {
    val prints = graft.operators.Winnowing.fingerprints(
      documents(spark, dir), "doc_id", "text", k = 3, w = 4)
    graft.operators.Winnowing.sharedPairs(prints, "doc_id", minShared = 2L,
      maxDf = 50L)
  }

  val winnowingPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.i - 1 AS pos, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |k AS (
      |  SELECT doc_id, pos,
      |    (('0x' || substr(md5(s),1,15))::BIGINT % 1099511627776) * 1048576
      |      + (1048575 - pos) AS key
      |  FROM tri),
      |wmin AS (
      |  SELECT doc_id,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
      |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
      |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
      |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
      |  FROM k),
      |fp AS (SELECT DISTINCT doc_id, sel // 1048576 AS hh FROM wmin WHERE cnt = 4),
      |n AS (SELECT doc_id, COUNT(*) AS nf FROM fp GROUP BY 1),
      |keep AS (SELECT hh FROM fp GROUP BY hh HAVING COUNT(*) <= 50),
      |fk AS (SELECT fp.doc_id, fp.hh FROM fp JOIN keep USING(hh)),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
      |  FROM fk a JOIN fk b USING(hh) WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, shared, n1.nf AS n1, n2.nf AS n2
      |FROM pairs JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
      |WHERE shared >= 2
      |ORDER BY d1, d2""".stripMargin

  /** q244: robots.txt crawl-policy filter ([[graft.operators.Robots]],
    * RFC 9309) — the compliance gate between the URL frontier and the
    * fetch. Seven synthetic domains carry formula-derived policies
    * (decoy group for another agent, a never-matching `/private` rule,
    * and per-domain deny-all-with-carve-out or source-block shapes); the
    * REAL parser extracts our agent's rule set on the driver (robots is
    * a tiny per-domain dimension) and the decision runs Spark-first as a
    * broadcast rule join + longest-match window argmax (most octets win,
    * equal-length allow beats disallow, no match allows) — never per-row
    * re-parsing. The oracle re-derives the same rule table from the
    * formula and replays the RFC decision in SQL; RobotsSpec covers the
    * parser/matcher corners (group selection, wildcards, `$` anchor,
    * tie→allow, empty Disallow).
    */
  def robotsFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def robotsTxt(d: Int): String = {
      val sb = new StringBuilder
      sb.append("# synthetic policy for domain ").append(d).append('\n')
      sb.append("User-agent: otherbot\nDisallow: /\n\n")
      sb.append("User-agent: *\n")
      sb.append("Disallow: /private\n")
      if (d % 3 == 0) { sb.append("Disallow: /\n"); sb.append("Allow: /src1\n") }
      if (d % 3 == 1) sb.append("Disallow: /src2\n")
      sb.toString
    }
    val rules = (0 until 7).flatMap { d =>
      graft.operators.Robots.parse(robotsTxt(d), "graftbot")
        .map(r => (d.toLong, r.allow, r.pattern))
    }.toDF("r_domain", "rule_allow", "rule")
    val docs = documents(spark, dir)
      .select($"doc_id", ($"doc_id" % 7).as("domain"),
        concat(lit("/"), $"source", lit("/"), $"doc_id").as("path"))
    val matched = docs.join(broadcast(rules),
        $"domain" === $"r_domain" && $"path".startsWith($"rule"))
      .select($"doc_id", $"domain", $"path",
        $"rule_allow", length($"rule").as("l"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"l".desc, $"rule_allow".desc)
    val best = matched.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"doc_id", $"rule_allow".as("best_allow"))
    docs.join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"domain", $"path",
        coalesce($"best_allow", lit(true)).as("allowed"))
      .orderBy($"doc_id")
  }

  val robotsFilterSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 7 AS domain,
      |             '/' || source || '/' || doc_id AS path FROM documents),
      |rules AS (
      |  SELECT dom AS domain, '/private' AS rule, FALSE AS rule_allow
      |  FROM generate_series(0, 6) g(dom)
      |  UNION ALL SELECT dom, '/', FALSE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 0
      |  UNION ALL SELECT dom, '/src1', TRUE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 0
      |  UNION ALL SELECT dom, '/src2', FALSE FROM generate_series(0, 6) g(dom)
      |    WHERE dom % 3 = 1),
      |m AS (SELECT d.doc_id, r.rule_allow, length(r.rule) AS l
      |      FROM d JOIN rules r ON d.domain = r.domain
      |        AND starts_with(d.path, r.rule)),
      |best AS (SELECT doc_id, rule_allow FROM (
      |    SELECT doc_id, rule_allow,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id
      |                         ORDER BY l DESC, rule_allow DESC) AS rk FROM m)
      |  WHERE rk = 1)
      |SELECT d.doc_id, d.domain, d.path,
      |  COALESCE(best.rule_allow, TRUE) AS allowed
      |FROM d LEFT JOIN best ON d.doc_id = best.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q247: ROUGE-1/ROUGE-2 n-gram overlap between document pairs — the
    * eval-harness metric (summarization/reference comparison, and the
    * exact-overlap companion the near-dup family's similarity scores
    * summarize): clipped-count overlap Σ_g min(c_a(g), c_b(g)) per
    * n-gram order and an integer milli-F1 (2000·o div (n_a+n_b)) — all
    * BIGINT-exact cross-engine, no float path. Pairing is deterministic
    * and linear (each doc vs its successor within source via lead()).
    *
    * Scale: counts are (doc, gram)-keyed aggregates; the pair overlap
    * joins count tables ON THE GRAM (the shuffle key a 100 TB corpus
    * wants — never a doc×doc cross product), and the pair set itself is
    * O(docs) by construction.
    */
  def rougePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
      .select($"doc_id", $"source", TextFunctions.tokens($"text").as("toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val pairs = d.select($"doc_id".as("a"), lead($"doc_id", 1).over(w).as("b"))
      .filter($"b".isNotNull)
    def counts(grams: DataFrame) =
      grams.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    val uni = counts(d.select($"doc_id", explode($"toks").as("g")))
    val bi = counts(d.select($"doc_id", explode(expr(
        "transform(arrays_zip(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1)), p -> concat(p['0'], ' ', p['1']))"))
      .as("g")))
    def lens(c: DataFrame, name: String) =
      c.groupBy($"doc_id").agg(sum($"c").as(name))
    def overlaps(c: DataFrame, name: String) =
      pairs
        .join(c.select($"doc_id".as("a"), $"g", $"c".as("ca")), Seq("a"))
        .join(c.select($"doc_id".as("b"), $"g", $"c".as("cb")), Seq("b", "g"))
        .groupBy($"a", $"b").agg(sum(least($"ca", $"cb")).as(name))
    pairs
      .join(lens(uni, "n").select($"doc_id".as("a"), $"n".as("n1_a")), Seq("a"))
      .join(lens(uni, "n").select($"doc_id".as("b"), $"n".as("n1_b")), Seq("b"))
      .join(lens(bi, "n").select($"doc_id".as("a"), $"n".as("n2_a")), Seq("a"), "left")
      .join(lens(bi, "n").select($"doc_id".as("b"), $"n".as("n2_b")), Seq("b"), "left")
      .join(overlaps(uni, "o1"), Seq("a", "b"), "left")
      .join(overlaps(bi, "o2"), Seq("a", "b"), "left")
      .select($"a", $"b", $"n1_a", $"n1_b",
        coalesce($"o1", lit(0L)).as("overlap1"),
        expr("2000 * coalesce(o1, 0L) DIV (n1_a + n1_b)").as("f1_milli_1"),
        coalesce($"o2", lit(0L)).as("overlap2"),
        when(coalesce($"n2_a", lit(0L)) + coalesce($"n2_b", lit(0L)) === 0L, lit(0L))
          .otherwise(expr("2000 * coalesce(o2, 0L) DIV (coalesce(n2_a, 0L) + coalesce(n2_b, 0L))"))
          .as("f1_milli_2"))
      .orderBy($"a")
  }

  val rougePairsSql: String =
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      |p AS (SELECT doc_id AS a,
      |        lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS b FROM d),
      |pairs AS (SELECT a, b FROM p WHERE b IS NOT NULL),
      |u AS (SELECT doc_id, t.g, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM d, unnest(toks) t(g) GROUP BY 1, 2),
      |len1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM u GROUP BY 1),
      |ov1 AS (SELECT pr.a, pr.b, CAST(SUM(LEAST(ua.c, ub.c)) AS BIGINT) AS o
      |        FROM pairs pr JOIN u ua ON ua.doc_id = pr.a
      |        JOIN u ub ON ub.doc_id = pr.b AND ua.g = ub.g GROUP BY 1, 2),
      |bg AS (SELECT doc_id, t.g FROM d,
      |       unnest(list_transform(range(1, len(toks)),
      |         i -> toks[i] || ' ' || toks[i+1])) t(g)),
      |b2 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
      |len2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM b2 GROUP BY 1),
      |ov2 AS (SELECT pr.a, pr.b, CAST(SUM(LEAST(ua.c, ub.c)) AS BIGINT) AS o
      |        FROM pairs pr JOIN b2 ua ON ua.doc_id = pr.a
      |        JOIN b2 ub ON ub.doc_id = pr.b AND ua.g = ub.g GROUP BY 1, 2)
      |SELECT pr.a, pr.b, l1a.n AS n1_a, l1b.n AS n1_b,
      |  COALESCE(ov1.o, 0) AS overlap1,
      |  CAST(2000 * COALESCE(ov1.o, 0) // (l1a.n + l1b.n) AS BIGINT) AS f1_milli_1,
      |  COALESCE(ov2.o, 0) AS overlap2,
      |  CASE WHEN COALESCE(l2a.n, 0) + COALESCE(l2b.n, 0) = 0 THEN 0
      |       ELSE CAST(2000 * COALESCE(ov2.o, 0)
      |                 // (COALESCE(l2a.n, 0) + COALESCE(l2b.n, 0)) AS BIGINT)
      |  END AS f1_milli_2
      |FROM pairs pr
      |JOIN len1 l1a ON l1a.doc_id = pr.a
      |JOIN len1 l1b ON l1b.doc_id = pr.b
      |LEFT JOIN len2 l2a ON l2a.doc_id = pr.a
      |LEFT JOIN len2 l2b ON l2b.doc_id = pr.b
      |LEFT JOIN ov1 ON ov1.a = pr.a AND ov1.b = pr.b
      |LEFT JOIN ov2 ON ov2.a = pr.a AND ov2.b = pr.b
      |ORDER BY pr.a""".stripMargin

  /** q261: the crawl FETCH EXECUTOR end-to-end
    * ([[graft.operators.Fetcher]], round-12 verdict item 7) — the
    * operator that CONSUMES a q255-shaped fetch plan and closes the
    * crawl loop: plan → one host-keyed shuffle → per-host sequential
    * fetch in (fetch_round, url) order → WARC gzip member per response →
    * re-read through the q243 parse path. The graded frame is built by
    * PARSING THE WARC BYTES BACK (status and body length come out of the
    * gzip member, not the transport return), so a framing bug anywhere
    * in the loop hash-mismatches; per-host plan order is
    * require-asserted row-for-row (the executor's seq_in_host must equal
    * the plan's idx). Transport is the documented deterministic offline
    * stub with the status derived from the url text, so the DuckDB
    * oracle recomputes every graded column.
    */
  def fetchExecutor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val plan = documents(spark, dir)
      .select($"doc_id",
        concat(lit("h"), ($"doc_id" % 7).cast("string")).as("host"),
        concat(lit("/"), $"source", lit("/"), $"doc_id".cast("string")).as("url"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"host").orderBy($"url", $"doc_id")
    val sched = plan.withColumn("idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_round", floor($"idx" / 3).cast("long"))
    val transport: graft.operators.Fetcher.Transport = url => {
      val status = if (url.length % 5 == 0) 404 else 200
      val reason = if (status == 200) "OK" else "Not Found"
      (status, reason, "text/plain", s"content:$url".getBytes("UTF-8"))
    }
    val fetched = graft.operators.Fetcher.execute(sched, transport)
    val parsed = fetched.map { r =>
      val recs = graft.operators.Warc.parseWarcGz(r.warc)
      require(recs.length == 1 && recs.head.warcType == "response",
        "each response must be one WARC record in its own gzip member")
      val http = graft.operators.Warc.parseHttpResponse(recs.head.payload)
      (r.host, recs.head.targetUri.get, r.fetch_round, r.seq_in_host,
        http.status, http.body.length.toLong)
    }.toDF("host", "url", "fetch_round", "seq_in_host", "status", "body_len")
    val drift = parsed.select($"host", $"url", $"seq_in_host")
      .join(sched.select($"host", $"url", $"idx"), Seq("host", "url"))
      .filter($"seq_in_host" =!= $"idx").count()
    require(drift == 0, s"per-host fetch order drifted on $drift rows")
    parsed.orderBy($"host", $"seq_in_host")
  }

  val fetchExecutorSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
      |    '/' || source || '/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |s AS (
      |  SELECT host, url,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url, doc_id) - 1
      |         AS BIGINT) AS idx
      |  FROM p)
      |SELECT host, url, idx // 3 AS fetch_round, idx AS seq_in_host,
      |  CASE WHEN length(url) % 5 = 0 THEN 404 ELSE 200 END AS status,
      |  CAST(8 + length(url) AS BIGINT) AS body_len
      |FROM s
      |ORDER BY host, seq_in_host""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q261_fetch_executor" -> fetchExecutor,
    "q247_rouge_pairs"    -> rougePairs,
    "q244_robots_filter"  -> robotsFilter,
    "q251_politeness"     -> politenessSchedule,
    "q255_crawl_fetch_plan" -> crawlFetchPlan,
    "q214_winnowing"      -> winnowingPairs,
    "q210_char_entropy"   -> charEntropy,
    "q197_domain_cap"     -> domainCap,
    "q188_domain_stats"   -> domainStats,
    "q184_url_dedup"      -> urlDedup,
    "q169_kmv_set_ops"    -> kmvSetOps,
    "q141_bpe_encode"     -> bpeEncode,
    "q139_weighted_jaccard" -> weightedJaccard,
    "q138_repeated_spans" -> repeatedSpans,
    "q136_bpe_merges"     -> bpeMerges,
    "q132_cms_freq"       -> cmsFreq,
    "q116_feature_hash"   -> featureHash,
    "q26_text_stats"      -> textStats,
    "q27_lang_id"         -> langId,
    "q28_dedup_exact"     -> dedupExact,
    "q29_ngram_jaccard"   -> ngramJaccard,
    "q125_prefix_jaccard" -> prefixJaccard,
    "q30_minhash_pairs"   -> minhashPairs,
    "q31_simhash_pairs"   -> simhashPairs,
    "q32_multimodal_meta" -> multimodalMeta,
    "q56_multimodal_decode" -> multimodalDecode,
    "q177_image_ahash"    -> imageAHash,
    "q219_image_neardup"  -> imageNearDup,
    "q178_audio_fingerprint" -> audioFingerprint,
    "q179_video_motion"   -> videoMotion,
    "q73_jpeg_decode" -> jpegDecode,
    "q57_kmv_distinct"    -> kmvDistinct,
    "q74_editdist_pairs"  -> editDistPairs,
    "q75_mulaw_decode"    -> mulawDecode,
    "q79_image_resize"    -> imageResize,
    "q80_frame_sample"    -> frameSample,
    "q85_heavy_hitters"   -> heavyHitters,
    "q87_phrase_search"   -> phraseSearch,
    "q91_ngram_novelty"   -> ngramNovelty,
    "q95_sparse_retrieval" -> sparseRetrieval,
  )

  val minhashPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS i
      |  FROM documents),
      |tri AS (
      |  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok AS s
      |  FROM toks a
      |  JOIN toks b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN toks c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |sh AS (SELECT DISTINCT doc_id, s FROM tri),
      |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id d1, b.doc_id d2, count(*) i
      |  FROM sh a JOIN sh b USING(s) WHERE a.doc_id < b.doc_id
      |  GROUP BY 1,2)
      |SELECT d1, d2, CAST(i AS DOUBLE)/(c1.n+c2.n-i) AS jaccard
      |FROM inter JOIN cnt c1 ON d1=c1.doc_id JOIN cnt c2 ON d2=c2.doc_id
      |WHERE CAST(i AS DOUBLE)/(c1.n+c2.n-i) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q261_fetch_executor" -> fetchExecutorSql,
    "q247_rouge_pairs"    -> rougePairsSql,
    "q244_robots_filter"  -> robotsFilterSql,
    "q251_politeness"     -> politenessScheduleSql,
    "q255_crawl_fetch_plan" -> crawlFetchPlanSql,
    "q214_winnowing"      -> winnowingPairsSql,
    "q210_char_entropy"   -> charEntropySql,
    "q197_domain_cap"     -> domainCapSql,
    "q188_domain_stats"   -> domainStatsSql,
    "q184_url_dedup"      -> urlDedupSql,
    "q169_kmv_set_ops"    -> kmvSetOpsSql,
    "q141_bpe_encode"     -> bpeEncodeSql,
    "q139_weighted_jaccard" -> weightedJaccardSql,
    "q138_repeated_spans" -> repeatedSpansSql,
    "q136_bpe_merges"     -> bpeMergesSql,
    "q132_cms_freq"       -> cmsFreqSql,
    "q116_feature_hash"   -> featureHashSql,
    "q26_text_stats"      -> textStatsSql,
    "q27_lang_id"         -> langIdSql,
    "q28_dedup_exact"     -> dedupExactSql,
    "q29_ngram_jaccard"   -> ngramJaccardSql,
    "q125_prefix_jaccard" -> prefixJaccardSql,
    "q30_minhash_pairs"   -> minhashPairsSql,
    "q31_simhash_pairs"   -> simhashPairsSql,
    "q32_multimodal_meta" -> multimodalMetaSql,
    "q56_multimodal_decode" -> multimodalDecodeSql,
    "q177_image_ahash"    -> imageAHashSql,
    "q219_image_neardup"  -> imageNearDupSql,
    "q178_audio_fingerprint" -> audioFingerprintSql,
    "q179_video_motion"   -> videoMotionSql,
    "q73_jpeg_decode" -> jpegDecodeSql,
    "q57_kmv_distinct"    -> kmvDistinctSql,
    "q74_editdist_pairs"  -> editDistPairsSql,
    "q75_mulaw_decode"    -> mulawDecodeSql,
    "q79_image_resize"    -> imageResizeSql,
    "q80_frame_sample"    -> frameSampleSql,
    "q85_heavy_hitters"   -> heavyHittersSql,
    "q87_phrase_search"   -> phraseSearchSql,
    "q91_ngram_novelty"   -> ngramNoveltySql,
    "q95_sparse_retrieval" -> sparseRetrievalSql,
  )
}
