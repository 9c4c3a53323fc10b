package graft

import org.apache.spark.sql.functions._
import graft.etl.StoreMeta

/** The repo-wide pin-discipline guard: EVERY persisted-store writer in
  * the library must leave a `_graft_meta` sidecar behind — either the
  * single-int face (a bucket modulus / layout fingerprint under `n`)
  * or the family-tagged parameter map — so that no store can silently
  * merge a delta built under different parameters. The sweep builds
  * each store tiny and asserts the sidecar exists and parses; adding a
  * new `write*Store`/`write*Index` writer means adding a row here, and
  * a writer that skips its pin fails this suite at HEAD.
  */
class PinSweepSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "one two three four five six seven eight nine"),
    (4L, "completely different words appear in this row"),
    (5L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  private lazy val vecs = (0L until 16L).map { i =>
    val base = Array.fill(4)(0.0f)
    base(i.toInt % 4) = 1.0f
    base((i.toInt + 1) % 4) = 0.1f * (i / 4)
    (i, base)
  }.toDF("vec_id", "embedding")

  private lazy val rows =
    Seq(("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 3L, 4.0), ("b", 4L, 1.0))
      .toDF("g", "k", "v")

  /** (writer label, build-it, sidecar dir to assert). */
  private lazy val writers: Seq[(String, () => String)] = Seq(
    "Sketches.writeKmvStore" -> { () =>
      val p = tmp("pin_kmv")
      graft.ops.Sketches.writeKmvStore(rows, "g", "k", p, k = 8); p
    },
    "Sketches.writeCmsStore" -> { () =>
      val p = tmp("pin_cms")
      graft.ops.Sketches.writeCmsStore(rows, "k", p); p
    },
    "Sketches.writeHllStore" -> { () =>
      val p = tmp("pin_hll")
      graft.ops.Sketches.writeHllStore(rows, "g", "k", p); p
    },
    "Sketches.writeHistStore" -> { () =>
      val p = tmp("pin_hist")
      graft.ops.Sketches.writeHistStore(rows, "g", "v", p, binWidth = 1.0); p
    },
    "Sampling.writeWeightedSampleStore" -> { () =>
      val p = tmp("pin_wsample")
      graft.ops.Sampling.writeWeightedSampleStore(
        rows, "k", col("v"), p, k = 3); p
    },
    "Similarity.writeKnnGraphStore" -> { () =>
      val p = tmp("pin_knn")
      graft.ops.Similarity.writeKnnGraphStore(
        vecs, p, seedIds = Seq(0L, 4L), k = 2); p
    },
    "Similarity.writeSemanticDedupStore" -> { () =>
      val p = tmp("pin_semdedup")
      graft.ops.Similarity.writeSemanticDedupStore(vecs, p)
      s"$p/assignments"
    },
    "Similarity.SignRandomProjectionLsh.writeIndex" -> { () =>
      val p = tmp("pin_lsh")
      new graft.ops.Similarity.SignRandomProjectionLsh(dim = 4, nBits = 4)
        .writeIndex(vecs, p); p
    },
    "Dedup.writeComponentStore" -> { () =>
      val p = tmp("pin_cc")
      graft.ops.Dedup.writeComponentStore(
        Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "component"), p); p
    },
    "Dedup.writeMinHashSignatures" -> { () =>
      val p = tmp("pin_mh")
      graft.ops.Dedup.writeMinHashSignatures(docs, "doc_id", "text", p); p
    },
    "Dedup.writeSimHashSignatures" -> { () =>
      val p = tmp("pin_sh")
      graft.ops.Dedup.writeSimHashSignatures(docs, "doc_id", "text", p); p
    },
    "SetSimJoin.writeTokenStore" -> { () =>
      val p = tmp("pin_tok")
      graft.ops.SetSimJoin.writeTokenStore(docs, "doc_id", "text", p); p
    },
    "SetSimJoin.writeBucketedTokenStore" -> { () =>
      graft.ops.SetSimJoin.writeBucketedTokenStore(
        docs, "doc_id", "text", "pin_sweep_tok_tbl", buckets = 2)
      java.net.URI.create(spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier("pin_sweep_tok_tbl"))
        .location.toString).getPath
    },
    "FuzzyJoin.writeHoodIndex" -> { () =>
      val p = tmp("pin_hood")
      graft.ops.FuzzyJoin.writeHoodIndex(
        Seq((1L, "alpha"), (2L, "omega")).toDF("id", "s"), "id", "s", p); p
    },
    "Triangles.writeEdgeStore" -> { () =>
      val p = tmp("pin_tri") + "/edges"
      graft.ops.Triangles.writeEdgeStore(
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v"), "u", "v", p); p
    },
    "Retrieval.appendBm25Index (day-zero build)" -> { () =>
      val p = tmp("pin_bm25")
      graft.ops.Retrieval.appendBm25Index(docs, "doc_id", "text", p)
      s"$p/postings"
    },
    "Sinks.idempotentAppendBucketed (day-zero keyed log)" -> { () =>
      val p = tmp("pin_klog") + "/log"
      graft.etl.Sinks.idempotentAppendBucketed(
        docs.select(col("doc_id")), p, Seq("doc_id"))
      p
    }
  )

  test("every store/index writer leaves a parseable _graft_meta pin behind") {
    val missing = writers.flatMap { case (label, build) =>
      val dir = build()
      StoreMeta.readParams(spark, dir) match {
        case None => Some(s"$label -> $dir: NO sidecar")
        case Some(m) if !m.contains("family") && !m.contains("n") =>
          Some(s"$label -> $dir: sidecar pins neither a family nor n: $m")
        case _ => None
      }
    }
    assert(missing.isEmpty,
      "unpinned writers:\n" + missing.mkString("\n") +
        "\nevery write*Store/write*Index must pin its parameters " +
        "(StoreMeta.pinFamily or the single-int face) so a delta built " +
        "under different parameters cannot silently merge")
  }
}
