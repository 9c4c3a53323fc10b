package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.toMediaTable(
    Tables.documents(spark, sfDir).limit(60))

  test("media table: binary payload with typed metadata") {
    val r = media.filter($"media_id" === 3).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("kind") == "image") // 3 % 3 = 0 → first
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(media.filter($"meta.width" < 16 || $"meta.width" >= 80).count() == 0)
  }

  test("batched decode: tensor size matches meta dims, batching preserved") {
    val decoded = Multimodal.decodeBatched(media, batchSize = 7)
    assert(decoded.count() == 60)
    val bad = decoded
      .filter(size($"pixels") =!= $"meta.width" * $"meta.height").count()
    assert(bad == 0)
    // deterministic across runs
    val a = decoded.select($"media_id", element_at($"pixels", 1))
      .as[(Long, Float)].collect().toMap
    val b = Multimodal.decodeBatched(media, batchSize = 16)
      .select($"media_id", element_at($"pixels", 1))
      .as[(Long, Float)].collect().toMap
    assert(a == b) // batch size must not change values
  }

  test("resize: output dims and nearest-neighbor identity at same size") {
    val decoded = Multimodal.decodeBatched(media.limit(10))
    val resized = Multimodal.resize(decoded, 8, 8)
    assert(resized.filter(size($"pixels_resized") =!= 64).count() == 0)
    assert(resized.filter($"meta.width" =!= 8 || $"meta.height" =!= 8).count() == 0)
    // resizing to the original dims reproduces the tensor
    val one = decoded.filter($"media_id" === 0)
    val w = one.select($"meta.width").as[Int].head()
    val h = one.select($"meta.height").as[Int].head()
    val same = Multimodal.resize(one, w, h)
      .select(($"pixels_resized" === $"pixels").as("eq")).as[Boolean].head()
    assert(same)
  }

  test("resize: value-level nearest-neighbor on a known gradient") {
    // 16x16 image where pixel value == source row index; downscale to 8x8
    // must pick value 2*y at every output row y (regression: fractional x
    // used to bleed into the row index).
    val w = 16; val h = 16
    val pixels = (0 until w * h).map(i => (i / w).toFloat)
    val df = Seq((1L, pixels)).toDF("media_id", "pixels")
      .withColumn("meta", struct(lit("image").as("kind"),
        lit(w).as("width"), lit(h).as("height")))
    val got = Multimodal.resize(df, 8, 8)
      .select($"pixels_resized").as[Seq[Float]].head()
    val expected = (0 until 64).map(i => (2 * (i / 8)).toFloat)
    assert(got == expected, s"got=$got")
  }

  test("frame sampling: only video rows get frame indices, stride respected") {
    val sampled = Multimodal.frameSample(media, everyN = 6)
    val nonVideo = sampled.filter($"meta.kind" =!= "video" && size($"sampled_frames") > 0)
    assert(nonVideo.count() == 0)
    val frames = sampled.filter($"meta.kind" === "video")
      .select($"meta.n_frames", $"sampled_frames").as[(Int, Seq[Int])].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (n, fs) =>
      assert(fs.head == 0 && fs.last < n)
      fs.sliding(2).foreach { case Seq(a, b) => assert(b - a == 6); case _ => }
    }
  }

  test("feature extraction: unit-norm fixed-dim vectors from payload") {
    val feats = Multimodal.extractFeatures(media.limit(20), dim = 32)
    val norms = feats.select(
      sqrt(aggregate(transform($"features", x => x.cast("double") * x),
        lit(0.0), (a, x) => a + x))).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
  }

  test("m4 rollup recovers exact payload byte sums through the stub's /255") {
    // rint(px*255) must recover the byte exactly for every possible
    // byte value despite float32 division — the property the m4 hash
    // gate's float-freedom rests on
    for (b <- 0 to 255) {
      val px = (b & 0xFF) / 255.0f
      assert(math.rint(px.toDouble * 255.0).toLong === b.toLong, s"byte $b")
    }
    val out = SparkEntry.queries("m4_resize_pipeline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall(_._2 === 256), "16x16 resize")
    assert(out.forall(r => r._3 >= 0L && r._3 <= 256L * 127), "ascii byte sums")
  }

  test("image signatures: identical payloads share all bands; planted pair at Hamming 0") {
    // plant a true duplicate: same text under ids 5 and 5 + 448 —
    // 448 ≡ 0 (mod 64), so width AND height (id·7 mod 64) both agree
    // and the decoded tensors are identical
    val one = Tables.documents(spark, sfDir).filter($"doc_id" === 5)
      .select($"doc_id", $"text")
    val dup = one.unionByName(one.withColumn("doc_id", $"doc_id" + 448))
    val m = Multimodal.toMediaTable(dup)
    val sigs = Multimodal.imageSignatures(m).collect()
    assert(sigs.length == 2)
    assert(sigs.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .distinct.length == 1, "identical payload+dims → identical bands")
    val pairs = Multimodal.imageNearDups(m, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toList
    assert(pairs == List((5L, 453L, 0L)))
  }

  test("image near-dup band join ≡ brute-force Hamming scan") {
    val m = Multimodal.toMediaTable(
      Tables.documents(spark, sfDir).filter($"doc_id" < 150))
    val banded = Multimodal.imageNearDups(m, maxHamming = 3)
    val sigs = Multimodal.imageSignatures(m)
    val o = sigs.select($"media_id".as("__id_b"), $"b0".as("c0"),
      $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3"))
    val ham = (0 until 4)
      .map(j => bit_count(col(s"b$j").bitwiseXOR(col(s"c$j"))))
      .reduce(_ + _)
    val brute = sigs.crossJoin(o).filter($"media_id" < $"__id_b")
      .select($"media_id".as("id_a"), $"__id_b".as("id_b"),
        ham.cast("long").as("hamming"))
      .filter($"hamming" <= 3)
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
  }

  test("decode batches: whole items, bounded overshoot, deterministic") {
    val cap = 4096L
    val b = Multimodal.decodeBatches(media, cap, buckets = 2).localCheckpoint()
    // whole items: every media id appears exactly once
    assert(b.count() === media.count())
    assert(b.select($"media_id").distinct().count() === media.count())
    // batch load <= capacity + max item in that batch
    val loads = b.groupBy($"kind", $"bucket", $"batch_id")
      .agg(sum($"pixels").as("load"), max($"pixels").as("mx"))
      .collect()
    assert(loads.forall(r => r.getLong(3) <= cap + r.getLong(4)),
      loads.filterNot(r => r.getLong(3) <= cap + r.getLong(4)).mkString(","))
    // contiguous batch ids from 0 per (kind, bucket)
    val perGroup = b.groupBy($"kind", $"bucket")
      .agg(min($"batch_id").as("mn"), max($"batch_id").as("mxb"),
        countDistinct($"batch_id").as("nd"))
      .collect()
    assert(perGroup.forall(r => r.getLong(2) === 0L &&
      r.getLong(4) === r.getLong(3) + 1), perGroup.mkString(","))
    // deterministic under repartitioning
    val again = Multimodal.decodeBatches(media.repartition(13), cap, buckets = 2)
      .select($"media_id", $"batch_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = b.select($"media_id", $"batch_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first === again)
  }
}
