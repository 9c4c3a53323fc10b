package graft.etl

import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U3 — pluggable embedding stage (SURVEY.md §2.10).
  *
  * The reference runs SentenceTransformer(bge-m3) batch inference on
  * GPU (transformers/helpers.py:210-220). Offline, the engine ships a
  * deterministic stand-in with the same pipeline semantics — same
  * column contract (text in, fixed-dim float vector out), same
  * distributed shape (per-partition batched transform, no driver
  * round-trip) — swappable for an ONNX/JNI model.
  */
trait EmbeddingStage {
  def dim: Int
  /** Adds `outCol: array<float>` of length [[dim]] computed from `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** Deterministic hashing featurizer: tokenize → murmur3 HashingTF →
  * L2 normalize → array<float>. Entirely MLlib built-ins, so the
  * transform is columnar, reproducible, and cluster-scalable; the
  * fixed-dim L2-normalized output behaves like a (bad but shaped-right)
  * embedding for downstream cosine/clustering operators. */
final class HashingEmbedder(override val dim: Int = 1024) extends EmbeddingStage {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val tmpTok = s"__${outCol}_tokens"
    val tmpTf = s"__${outCol}_tf"
    val tmpNorm = s"__${outCol}_norm"
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol(tmpTok)
      .setPattern("\\W+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol(tmpTok).setOutputCol(tmpTf).setNumFeatures(dim)
    val norm = new Normalizer().setInputCol(tmpTf).setOutputCol(tmpNorm).setP(2.0)
    norm.transform(tf.transform(tok.transform(df)))
      .withColumn(outCol, vector_to_array(col(tmpNorm), "float32"))
      .drop(tmpTok, tmpTf, tmpNorm)
  }
}

/** TF-IDF featurizer: [[HashingEmbedder]]'s term-frequency vector
  * reweighted by a FITTED inverse-document-frequency model — the
  * classic MLlib estimator/transformer pair, with the estimator and
  * transformer separated the way a real trained embedder is used:
  * [[fit]] learns the IDF statistics ONCE (one distributed aggregate;
  * the model is a `dim`-length vector on the driver) and returns a
  * reusable [[FittedTfIdfEmbedder]], so a document embeds identically
  * no matter which batch carries it. `embed` on this class remains the
  * fit-on-this-corpus convenience and is explicitly corpus-dependent —
  * use `fit(corpus).embed(batch, ...)` for batch-stable embeddings. */
final class TfIdfEmbedder(override val dim: Int = 1024) extends EmbeddingStage {

  /** Learn IDF weights from `df` (the estimator step). */
  def fit(df: DataFrame, textCol: String): FittedTfIdfEmbedder = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__fit_tokens")
      .setPattern("\\W+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__fit_tokens").setOutputCol("__fit_tf").setNumFeatures(dim)
    val model = new IDF().setInputCol("__fit_tf").setOutputCol("__fit_idf")
      .fit(tf.transform(tok.transform(df.select(col(textCol)))))
    new FittedTfIdfEmbedder(dim, model)
  }

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    fit(df, textCol).embed(df, textCol, outCol)
}

/** The transformer half of [[TfIdfEmbedder]]: applies frozen IDF
  * weights, L2-normalized. UNIT-NORM CONTRACT: a document whose every
  * term is corpus-ubiquitous (all IDF weights 0) has a zero TF-IDF
  * vector, which no normalizer can rescue — such documents FALL BACK
  * to their plain L2-normalized term-frequency vector (the stateless
  * [[HashingEmbedder]] semantics), so every tokenizable document
  * embeds unit-norm and downstream cosine/clustering stays defined.
  * Only documents with NO tokens at all embed as the zero vector. */
final class FittedTfIdfEmbedder private[etl](
    override val dim: Int,
    model: org.apache.spark.ml.feature.IDFModel) extends EmbeddingStage {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val tmpTok = s"__${outCol}_tokens"
    val tmpTf = s"__${outCol}_tf"
    val tmpIdf = s"__${outCol}_idf"
    val tmpNormI = s"__${outCol}_ni"
    val tmpNormT = s"__${outCol}_nt"
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol(tmpTok)
      .setPattern("\\W+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol(tmpTok).setOutputCol(tmpTf).setNumFeatures(dim)
    val tfDf = tf.transform(tok.transform(df))
    // copy() so concurrent embed() calls can't race on the shared
    // model's input/output column params
    val withIdf = model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setInputCol(tmpTf).setOutputCol(tmpIdf).transform(tfDf)
    val ni = new Normalizer().setInputCol(tmpIdf).setOutputCol(tmpNormI).setP(2.0)
    val nt = new Normalizer().setInputCol(tmpTf).setOutputCol(tmpNormT).setP(2.0)
    val both = nt.transform(ni.transform(withIdf))
      .withColumn(tmpNormI, vector_to_array(col(tmpNormI), "float32"))
      .withColumn(tmpNormT, vector_to_array(col(tmpNormT), "float32"))
    both
      .withColumn(outCol,
        when(exists(col(tmpNormI), x => x =!= 0.0f), col(tmpNormI))
          .otherwise(col(tmpNormT)))
      .drop(tmpTok, tmpTf, tmpIdf, tmpNormI, tmpNormT)
  }
}

/** The mapPartitions batch-inference shape the reference's GPU stage
  * would plug into: batches rows per partition (BATCH_SIZE 4/16/24,
  * transformers-stack.ts:174,207,291) and calls a model function per
  * batch. The default model is a STUB — a deterministic per-text hash
  * fingerprint — marked clearly; swap `model` for a real ONNX session.
  * Kept separate from HashingEmbedder so the UDF-free path stays the
  * default. */
final class BatchInferenceEmbedder(
    override val dim: Int = 1024,
    batchSize: Int = 24,
    model: (Seq[String], Int) => Seq[Array[Float]] = BatchInferenceEmbedder.stubModel)
  extends EmbeddingStage with Serializable {

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val d = dim; val bs = batchSize; val m = model
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))
    val textIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val vecs = m(batch.map(r => Option(r.getString(textIdx)).getOrElse("")), d)
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}

object BatchInferenceEmbedder {
  /** STUB model: deterministic token-hash featurizer standing in for
    * SentenceTransformer.encode — replace with a real inference call. */
  def stubModel(texts: Seq[String], dim: Int): Seq[Array[Float]] =
    texts.map { t =>
      val v = new Array[Float](dim)
      t.toLowerCase.split("\\W+").filter(_.nonEmpty).foreach { tok =>
        val h = scala.util.hashing.MurmurHash3.stringHash(tok)
        v(math.floorMod(h, dim)) += 1f
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
}

/** Config-selected model loading — the seam a real bge-m3-class model
  * (reference: transformers/helpers.py:210-220) drops into outside
  * this sandbox. ALL models run through the SAME
  * [[BatchInferenceEmbedder]] code path (schema handling, partition
  * batching, row reassembly); only the `(texts, dim) => vectors` batch
  * function differs, so swapping the stub for an ONNX session changes
  * zero Spark-side code.
  *
  * Specs:
  *  - `"stub"` — the deterministic token-hash stand-in.
  *  - `"onnx:<model-path>"` — reflectively loads the onnxruntime
  *    session on first batch. The runtime jar is intentionally absent
  *    here (zero-egress sandbox; no fake inference is shipped), so the
  *    loader fails fast with a clear message — the spec string and
  *    plumbing are what this sandbox can honestly deliver.
  *  - any name registered via [[register]] — the deployment hook for
  *    tests and real model integrations.
  */
object EmbedderFactory {
  type BatchModel = (Seq[String], Int) => Seq[Array[Float]]

  private val registry =
    scala.collection.concurrent.TrieMap[String, BatchModel](
      "stub" -> (BatchInferenceEmbedder.stubModel _))

  /** Register a named batch model (e.g. a mock in tests, a JNI-backed
    * encoder in deployment). Later registrations win. */
  def register(name: String, model: BatchModel): Unit = registry(name) = model

  /** Reflective ONNX loader: resolves ai.onnxruntime at call time so
    * the library compiles and runs without the jar; with the jar on
    * the executor classpath a real session can be wired in here. */
  private def onnxModel(modelPath: String): BatchModel = { (texts, dim) =>
    val cls = try Class.forName("ai.onnxruntime.OrtEnvironment")
    catch {
      case _: ClassNotFoundException => throw new UnsupportedOperationException(
        s"onnxruntime is not on the classpath; cannot load '$modelPath'. " +
          "Add the onnxruntime jar to the executors (unavailable in this " +
          "offline sandbox) or register() a model function instead.")
    }
    throw new UnsupportedOperationException(
      s"ONNX session wiring for $cls at '$modelPath' is deployment-specific; " +
        "register() the session-backed batch function for your model.")
  }

  /** Build the embedding stage for a model spec string. */
  def create(spec: String, dim: Int = 1024, batchSize: Int = 24): EmbeddingStage = {
    val model =
      if (spec.startsWith("onnx:")) onnxModel(spec.stripPrefix("onnx:"))
      else registry.getOrElse(spec, throw new IllegalArgumentException(
        s"unknown embedder model '$spec'; known: ${registry.keys.mkString(", ")} or onnx:<path>"))
    new BatchInferenceEmbedder(dim, batchSize, model)
  }
}
