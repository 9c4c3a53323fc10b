package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (beyond-reference surface).
  *
  * The DECODE step is a clearly-marked deterministic STUB — the image/
  * audio codecs aren't in this container — but every Spark-side piece a
  * real pipeline needs is genuine and tested: the schema contract
  * (binary payload + typed meta struct), partition-preserving batched
  * inference via mapPartitions (the Scala analog of mapInPandas: rows
  * are grouped into fixed-size batches, the "model" sees Seq[bytes] and
  * returns Seq[tensor]), columnar meta derivation, and frame-index
  * generation. Swapping the stub for JNI/ONNX decode changes one
  * function value, no plan shape.
  */
object Multimodal {

  /** Typed metadata carried beside the binary payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_s", DoubleType),
    StructField("n_frames", IntegerType)))

  /** Build a media table from the documents corpus: payload = UTF-8
    * bytes of the text (a stand-in binary blob), metadata derived
    * deterministically from the doc. Kind cycles image/audio/video. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(64)) + 16).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("double").as("duration_s"),
        ((pmod(col("doc_id"), lit(30)) + 1) * 24).cast("int").as("n_frames"))
        .as("meta"))

  /** STUB decode: bytes → fake pixel tensor (float per pixel, derived
    * from payload bytes cyclically). A real implementation calls an
    * image codec here; shape contract (width*height floats) is what
    * downstream operators rely on. */
  def stubDecode(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = (payload(i % payload.length) & 0xFF) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Batched decode via mapPartitions — the mapInPandas shape: rows
    * group into `batchSize` batches; the decoder sees the whole batch
    * (GPU-friendly); partitioning is preserved (no shuffle). Adds
    * `pixels: array<float>` of size meta.width*meta.height. */
  def decodeBatched(media: DataFrame, batchSize: Int = 16,
                    decode: (Array[Byte], Int, Int) => Array[Float] = stubDecode)
      : DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+
      StructField("pixels", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped call: all payloads of the batch at once
        val decoded = batch.map { r =>
          val m = r.getStruct(metaIdx)
          decode(r.getAs[Array[Byte]](payloadIdx),
            m.getAs[Int]("width"), m.getAs[Int]("height"))
        }
        batch.iterator.zip(decoded.iterator).map { case (r, px) =>
          Row.fromSeq(r.toSeq :+ px.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize by nearest-neighbor sampling over the decoded tensor —
    * pure columnar (no UDF): index arithmetic with sequence/transform.
    * Output meta reflects the new dims. */
  def resize(decoded: DataFrame, newW: Int, newH: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    // nearest-neighbor: src index = floor(y*h/newH)*w + floor(x*w/newW)
    val idx = transform(sequence(lit(0), lit(newW * newH - 1)), i => {
      // output row must be floored BEFORE scaling, else the fractional x
      // position bleeds into the source-row index
      val y = floor(floor(i / newW) * h / newH).cast("int")
      val x = floor(pmod(i, lit(newW)) * w / newW).cast("int")
      y * w + x + 1 // element_at is 1-based
    })
    decoded
      .withColumn("pixels_resized", transform(idx, j => element_at(col("pixels"), j)))
      .withColumn("meta", col("meta")
        .withField("width", lit(newW)).withField("height", lit(newH)))
  }

  /** Frame sampling for video rows: every `everyN`th frame index up to
    * n_frames — columnar sequence generation, exploded downstream as
    * needed. */
  def frameSample(media: DataFrame, everyN: Int): DataFrame =
    media.withColumn("sampled_frames",
      when(col("meta.kind") === "video",
        sequence(lit(0), col("meta.n_frames") - 1, lit(everyN)))
        .otherwise(array().cast("array<int>")))

  /** Decode-batch scheduling: group media into decode batches of
    * bounded total pixel load — the GPU-decode manifest a multimodal
    * ingest pipeline feeds its codec workers (batches must be
    * same-modality, capacity-bounded, and DETERMINISTIC so a retried
    * worker decodes the identical batch).
    *
    * Items stay WHOLE — an image cannot split across decode batches —
    * which is the structural contrast with [[graft.ops.Packing]]'s
    * concat-then-chop for text. The assignment is start-aligned
    * next-fit inside deterministic PolyHash shards: per (kind, shard),
    * order by media_id, exclusive running pixel sum, batch =
    * running ÷ capacity. A batch's true load can overshoot capacity
    * by at most ONE item (the straddler keeps its start batch) —
    * bounded by max item size, the usual scheduling contract.
    * One partitioned window over (id, pixels) metadata rows; shard
    * count must be data-sized by the caller (Packing.sizedBuckets). */
  def decodeBatches(media: DataFrame, capacity: Long,
                    buckets: Int): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val bucket = pmod(
      graft.functions.PolyHash.polyHash(
        concat(col("media_id").cast("string"), lit("m3"))),
      lit(buckets))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind"), col("bucket")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    media.select(col("media_id"), col("meta.kind").as("kind"),
        (col("meta.width") * col("meta.height")).cast("long").as("pixels"),
        bucket.as("bucket"))
      .withColumn("__before", coalesce(sum(col("pixels")).over(w), lit(0L)))
      .withColumn("batch_id", expr(s"__before DIV $capacity"))
      .drop("__before")
  }

  /** aHash-style perceptual signature: decode → 8×8 resize →
    * average-threshold bits, emitted as four 16-bit band integers
    * (b0..b3). All-INTEGER algebra after the byte recovery — pixel
    * bytes come back exactly via rint(px·255) (the m4 proof), the
    * mean compare is the cross-multiplied 64·byte > Σbytes (no
    * division, no floats), and each band is a statically-unrolled sum
    * of 16 bit terms — so the whole signature replays bit-for-bit in
    * SQL. A real deployment swaps the stub codec for a JPEG decoder;
    * every stage after the decode is codec-agnostic. */
  def imageSignatures(media: DataFrame): DataFrame = {
    val resized = resize(decodeBatched(media), 8, 8)
    val withBytes = resized
      .withColumn("__bytes",
        transform(col("pixels_resized"), x => rint(x * lit(255.0d)).cast("int")))
      .withColumn("__tot",
        aggregate(col("__bytes"), lit(0), (a, x) => a + x))
    val bandCols = (0 until 4).map { j =>
      (0 until 16).map { i =>
        when(element_at(col("__bytes"), j * 16 + i + 1) * 64 > col("__tot"),
          lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _).as(s"b$j")
    }
    withBytes.select(col("media_id") +: bandCols: _*)
  }

  /** Image near-duplicates at Hamming distance ≤ `maxHamming` over
    * the 64-bit perceptual signature — the multimodal face of the
    * SimHash dedup family (d3's 16-bit-band pigeonhole: distance ≤ 3
    * leaves at least one of 4 bands untouched, so the band equi-join
    * has provably complete recall; verification is 4 bit_count(XOR)
    * terms). Candidate rows carry (id, 4×int bands) — ~24 bytes —
    * and only the band join shuffles; signatures never re-derive. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 16-bit bands guarantee recall only to Hamming 3, got $maxHamming")
    val sigs = imageSignatures(media)
    val banded = sigs.select(col("media_id") +:
      (0 until 4).map(j => col(s"b$j")) :+
      posexplode(array((0 until 4).map(j => col(s"b$j")): _*)): _*)
    val other = banded.select(col("media_id").as("__id_b") +:
      (0 until 4).map(j => col(s"b$j").as(s"c$j")) :+
      col("pos").as("__pos_b") :+ col("col").as("__v_b"): _*)
    val ham = (0 until 4)
      .map(j => bit_count(col(s"b$j").bitwiseXOR(col(s"c$j"))))
      .reduce(_ + _)
    banded
      .join(other, col("pos") === col("__pos_b") &&
        col("col") === col("__v_b") && col("media_id") < col("__id_b"))
      .select(col("media_id").as("id_a"), col("__id_b").as("id_b"),
        ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Feature extraction from the payload: reuses the batched-inference
    * embedding stage over a text view of the bytes (stand-in for a
    * vision/audio encoder). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val asText = media.withColumn("__payload_text", col("payload").cast("string"))
    new graft.etl.BatchInferenceEmbedder(dim, 16)
      .embed(asText, "__payload_text", "features")
      .drop("__payload_text")
  }
}
