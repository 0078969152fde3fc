package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (north-star extension).
  *
  * The IMAGE decode lane is REAL: `decodeImages` parses PNG/JPEG payloads
  * through `javax.imageio` (in the JDK — no external codec needed) inside
  * the partition-parallel mapPartitions boundary, with undecodable
  * payloads routed to a quarantine status instead of failing the batch.
  * Because the test fixtures carry no media, `imageCorpus` renders real
  * PNG/JPEG bytes through the same library's ENCODERS with dimensions and
  * fill derived arithmetically from `doc_id` — so a DuckDB oracle can
  * predict, from arithmetic alone, exactly what a genuine codec parse of
  * genuine codec output must find (`mm_image_decode`).
  *
  * The AUDIO lane is REAL too: `decodeAudio` is a from-the-spec
  * RIFF/WAVE PCM parser (pure little-endian byte layout — the one
  * mainstream media format that needs no codec library), verified the
  * same way against `audioCorpus`'s arithmetically-derived WAV streams
  * (`mm_audio_decode`).
  *
  * Only the VIDEO lane keeps a clearly marked stand-in (`sampleFrames`
  * slices bytes instead of decoding H.264 — the JDK has no video codec):
  * its frame-offset arithmetic is the real sampling plan and is
  * oracle-pinned by `mm_frame_plan`. `FakeDecode` remains solely for
  * non-image payloads (text bytes posing as media in `mediaCorpus`).
  *
  * Scale design: decode is embarrassingly parallel per partition; the
  * mapPartitions boundary batches records so a real vectorized decoder
  * (or a GPU stage) amortizes setup per batch, exactly like a Pandas-UDF
  * `mapInPandas` stage would. Binary payloads never shuffle — features are
  * extracted before any wide operation.
  */
object Multimodal {

  /** Typed multimodal record: opaque payload + metadata. */
  case class MediaRecord(media_id: Long, content_type: String, payload: Array[Byte])

  /** Extracted features (deterministic fake — see object doc). */
  case class MediaFeatures(media_id: Long, content_type: String,
      byte_len: Long, width: Int, height: Int, sha_prefix: String)

  /** STUB decoder for NON-image payloads only (text bytes posing as media
    * in `mediaCorpus`): derives width/height deterministically from the
    * payload so the pipeline shape stays testable. Image payloads never
    * reach this — `extractFeatures` routes them through the real
    * `javax.imageio` parse first.
    */
  object FakeDecode {
    def decodeImage(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }
  }

  /** Decoded image features from a REAL codec parse. `status` is the lane
    * router: "ok" rows carry true raster facts; "undecodable" is the
    * quarantine lane (corrupt/truncated payload — kept, never thrown);
    * "unsupported" is a non-image modality that belongs to another lane.
    */
  case class DecodedImage(media_id: Long, modality: String,
      width: Option[Int], height: Option[Int], mean_level: Option[Long],
      status: String)

  /** Real image decode: parse PNG/JPEG payloads with `javax.imageio`
    * inside the mapPartitions batch boundary and report true raster
    * dimensions plus the mean red-channel level (an exact integer for a
    * solid fill, which is what makes it oracle-checkable). A payload whose
    * magic bytes claim image but whose body fails to parse is routed to
    * the quarantine status rather than failing the partition — at 100 TB
    * a single corrupt blob must never kill a decode stage.
    */
  def decodeImages(records: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val modality = detectModality(r.payload)
        if (modality == "image/png" || modality == "image/jpeg") {
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            require(img != null, "no registered reader could parse the payload")
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            DecodedImage(r.media_id, modality, Some(img.getWidth), Some(img.getHeight),
              Some(math.round(sum.toDouble / (img.getWidth.toLong * img.getHeight))),
              "ok")
          } catch {
            case scala.util.control.NonFatal(_) =>
              DecodedImage(r.media_id, modality, None, None, None, "undecodable")
          }
        } else DecodedImage(r.media_id, modality, None, None, None, "unsupported")
      }
    }
  }

  /** Deterministic REAL image corpus: for each document, render a solid
    * `8 + doc_id % 24` × `8 + doc_id*7 % 24` image filled with gray level
    * `doc_id % 256` through javax.imageio's actual PNG (even ids) / JPEG
    * (odd ids) encoders. Every pixel fact is a pure function of `doc_id`,
    * so the decode lane can be verified by an arithmetic oracle while
    * still exercising genuine codec byte streams.
    */
  def imageCorpus(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 24).toInt
          val h = (8 + (id * 7) % 24).toInt
          val g = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val fmt = if (id % 2 == 0) "png" else "jpg"
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, out)
          MediaRecord(id, if (id % 2 == 0) "image/png" else "image/jpeg", out.toByteArray)
        }
      }
  }

  /** Decoded audio facts: true header fields + exact sample statistics. */
  case class DecodedAudio(media_id: Long, modality: String,
      sample_rate: Option[Int], n_samples: Option[Long],
      duration_ms: Option[Long], mean_abs: Option[Long], status: String)

  /** Real audio decode: a from-the-spec RIFF/WAVE PCM parser (the format
    * is pure little-endian byte layout — no external codec needed, unlike
    * video). Walks the chunk list for `fmt ` (PCM, mono, 16-bit enforced)
    * and `data`, then folds the actual samples for an exact
    * mean-absolute-amplitude. Runs inside the same mapPartitions batch
    * boundary as the image lane; malformed/truncated payloads route to a
    * quarantine status — a corrupt blob must never fail a 100 TB decode
    * stage.
    */
  def decodeAudio(records: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val p = r.payload
        val modality = detectModality(p)
        if (modality != "audio/wav")
          DecodedAudio(r.media_id, modality, None, None, None, None, "unsupported")
        else try {
          val bb = java.nio.ByteBuffer.wrap(p)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def u16(i: Int): Int = bb.getShort(i) & 0xffff
          def u32(i: Int): Long = bb.getInt(i) & 0xffffffffL
          def fourcc(i: Int): String =
            new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
          // chunk walk from offset 12 (after RIFF size + WAVE tag)
          var off = 12
          var rate = -1; var channels = -1; var bits = -1
          var dataOff = -1; var dataLen = -1L
          while (off + 8 <= p.length && (rate < 0 || dataOff < 0)) {
            val id = fourcc(off); val len = u32(off + 4)
            // a corrupt length could make the walk loop or seek backwards
            require(len <= p.length, s"chunk '$id' length $len exceeds payload")
            if (id == "fmt ") {
              require(len >= 16 && off + 8 + 16 <= p.length, "short fmt chunk")
              require(u16(off + 8) == 1, "not PCM")
              channels = u16(off + 10); rate = u32(off + 12).toInt
              bits = u16(off + 22)
            } else if (id == "data") { dataOff = off + 8; dataLen = len }
            off += 8 + len.toInt + (len.toInt & 1) // chunks pad to even
          }
          require(rate > 0 && dataOff >= 0, "missing fmt/data chunk")
          require(channels == 1 && bits == 16, s"unsupported layout $channels ch/$bits bit")
          require(dataOff + dataLen <= p.length, "truncated data chunk")
          val n = dataLen / 2
          var i = 0L; var sumAbs = 0L
          while (i < n) {
            sumAbs += math.abs(bb.getShort(dataOff + 2 * i.toInt).toLong)
            i += 1
          }
          DecodedAudio(r.media_id, modality, Some(rate), Some(n),
            Some(n * 1000L / rate),
            Some(if (n == 0) 0L else sumAbs / n), "ok")
        } catch {
          case scala.util.control.NonFatal(_) =>
            DecodedAudio(r.media_id, modality, None, None, None, None, "undecodable")
        }
      }
    }
  }

  /** Deterministic REAL audio corpus: one mono 16-bit PCM WAV per
    * document — sample rate `8000 + (doc_id%8)·1000`, `64 + doc_id%128`
    * samples of constant amplitude `(doc_id%1024) − 512`, emitted as
    * genuine RIFF bytes through a ByteBuffer writer. Every header field
    * and the mean |amplitude| are pure functions of `doc_id`, so the
    * decode lane verifies against an arithmetic oracle while parsing
    * real WAVE byte streams (the audio twin of [[imageCorpus]]).
    */
  def audioCorpus(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val rate = (8000 + (id % 8) * 1000).toInt
          val n = (64 + id % 128).toInt
          val amp = ((id % 1024) - 512).toShort
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2) // byte rate = rate · blockAlign
            .putShort(2).putShort(16) // blockAlign, bits
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) { bb.putShort(amp); i += 1 }
          MediaRecord(id, "audio/wav", bb.array())
        }
      }
  }

  /** The documents table re-cast as a binary media corpus (fixtures carry no
    * real media; text bytes stand in for payloads).
    */
  def mediaCorpus(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        lit("text/plain").as("content_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Partition-parallel batched decode: the mapPartitions boundary is where
    * a real codec/GPU batch stage plugs in.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition (per-batch) decoder setup would happen here
      it.map { r =>
        // image payloads get the REAL parse; anything else (text bytes
        // posing as media) keeps the deterministic stand-in dims
        val (w, h) = detectModality(r.payload) match {
          case "image/png" | "image/jpeg" =>
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.payload))
              if (img == null) FakeDecode.decodeImage(r.payload)
              else (img.getWidth, img.getHeight)
            } catch {
              case scala.util.control.NonFatal(_) => FakeDecode.decodeImage(r.payload)
            }
          case _ => FakeDecode.decodeImage(r.payload)
        }
        MediaFeatures(r.media_id, r.content_type, r.payload.length.toLong, w, h,
          java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).take(4).map("%02x".format(_)).mkString)
      }
    }
  }

  /** A sampled frame: contiguous byte slice standing in for a decoded
    * video frame (the STUB decode — see object doc). */
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Frame sampling: n evenly spaced fixed-size slices per payload —
    * the batch shape of a real video frame sampler (flatMap keeps it
    * partition-parallel; frames never shuffle before feature extraction).
    */
  def sampleFrames(records: Dataset[MediaRecord], n: Int, frameSize: Int = 64): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = math.min((len.toLong * i / n).toInt, math.max(0, len - 1))
        Frame(r.media_id, i, r.payload.slice(start, math.min(start + frameSize, len)))
      }
    }
  }

  /** Modality routing by REAL magic bytes — the dispatch step in front of
    * per-modality decode stages (image batch → image decoder, audio → ffmpeg
    * lane, …). Unlike the decode STUB, this is production logic: the
    * signatures are the published container formats' file headers. Unknown
    * binary falls back by printability: all-printable-ASCII prefixes route
    * to text, anything else to octet-stream. Pure per-row projection — the
    * routing column is exactly what a partitioned/bucketed write would
    * split lanes on, so payloads reach their decoder without a shuffle.
    */
  def routeByMagic(records: Dataset[MediaRecord]): Dataset[(Long, String)] = {
    import records.sparkSession.implicits._
    records.map(r => r.media_id -> detectModality(r.payload))
  }

  private[operators] def detectModality(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    def ascii(i: Int, s: String): Boolean = s.zipWithIndex.forall { case (c, j) => at(i + j) == c.toInt }
    if (at(0) == 0x89 && ascii(1, "PNG")) "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image/jpeg"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "audio/wav"
    else if (ascii(4, "ftyp")) "video/mp4"
    else if (p.nonEmpty && p.take(16).forall(b => (b & 0xff) >= 0x20 && (b & 0xff) < 0x7f))
      "text/plain"
    else "application/octet-stream"
  }

  /** Resize: recompute fake dims to fit a bounding box, preserving aspect
    * ratio — the transformation contract of a real resize stage.
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  val defs: Seq[Q] = Seq(

    // REAL image decode: imageCorpus renders genuine PNG/JPEG byte streams
    // whose dims/fill are pure functions of doc_id; decodeImages parses
    // them back with javax.imageio. The oracle predicts the decode output
    // from arithmetic alone — so a pass proves a real encoder→real decoder
    // round trip recovered the true raster facts, not a fake. mean_level
    // is pinned for lossless PNG only (JPEG's DCT/chroma round trip may
    // shift a solid fill by ±1 level; its dims are still exact).
    Q("mm_image_decode",
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS modality,
        |       CAST(8 + doc_id % 24 AS BIGINT) AS width,
        |       CAST(8 + (doc_id * 7) % 24 AS BIGINT) AS height,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS BIGINT) END AS mean_level,
        |       'ok' AS status
        |FROM documents ORDER BY media_id""".stripMargin) {
      (s, dir) =>
        decodeImages(imageCorpus(s, dir)).toDF()
          .select(col("media_id"), col("modality"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            when(col("modality") === "image/png", col("mean_level")).as("mean_level"),
            col("status"))
          .orderBy(col("media_id"))
    },

    // Real WAV decode of a deterministic RIFF corpus: the oracle predicts
    // every header field and the exact mean |amplitude| from arithmetic
    // alone, while the Spark side parses genuine WAVE byte streams.
    Q("mm_audio_decode",
      """SELECT doc_id AS media_id, 'audio/wav' AS modality,
        |       CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |       CAST(64 + doc_id % 128 AS BIGINT) AS n_samples,
        |       CAST((64 + doc_id % 128) * 1000 // (8000 + (doc_id % 8) * 1000) AS BIGINT)
        |         AS duration_ms,
        |       CAST(abs((doc_id % 1024) - 512) AS BIGINT) AS mean_abs,
        |       'ok' AS status
        |FROM documents ORDER BY media_id""".stripMargin) {
      (s, dir) =>
        decodeAudio(audioCorpus(s, dir)).toDF()
          .orderBy(col("media_id"))
    },

    // Binary-column metadata: byte length, chunk count for a 4 KiB-batched
    // decode stage, and content hash — all computable without decoding
    // (DuckDB has no md5(BLOB), so the hash oracle uses the string form;
    // byte semantics verified via octet_length over the encoded payload).
    Q("mm_binary_meta",
      """SELECT doc_id AS media_id,
        |       octet_length(encode(text)) AS byte_len,
        |       CAST(ceil(octet_length(encode(text)) / 4096.0) AS BIGINT) AS n_chunks,
        |       md5(text) AS content_md5,
        |       substr(text, 1, 4) AS magic
        |FROM documents ORDER BY media_id""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "documents").select(
          col("doc_id").as("media_id"),
          octet_length(col("text")).cast("long").as("byte_len"),
          ceil(octet_length(col("text")) / 4096.0).as("n_chunks"),
          md5(col("text")).as("content_md5"),
          substring(col("text"), 1, 4).as("magic")
        ).orderBy(col("media_id"))
    },

    // The frame-sampling plan (byte offsets of n=4 evenly spaced frames),
    // verified relationally: the same `len·i/n` (capped at len-1) integer
    // arithmetic `sampleFrames` applies per record, so the oracle pins the
    // sampling math the Dataset pipeline uses. Stringified — the
    // comparator can't hash list columns.
    Q("mm_frame_plan",
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
        |SELECT doc_id AS media_id, len,
        |       array_to_string(list_transform(range(0, 4),
        |          i -> CAST(least(len * i // 4, len - 1) AS VARCHAR)), ',') AS frame_offsets
        |FROM b WHERE len > 0 ORDER BY media_id""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("len", octet_length(col("text")).cast("long"))
          .filter(col("len") > 0)
          .select(col("doc_id").as("media_id"), col("len"),
            expr("array_join(transform(sequence(0, 3), " +
              "i -> CAST(least(len * i div 4, len - 1) AS STRING)), ',')")
              .as("frame_offsets"))
          .orderBy(col("media_id"))
    }
  )
}
