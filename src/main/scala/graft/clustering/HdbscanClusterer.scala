package graft.clustering

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** U8 — driver-local HDBSCAN (the reference's actual clusterer:
  * `HDBSCAN(min_cluster_size=max(2, min(m, max(2, n // 8))))` over
  * scaled embeddings, clustering/helpers.py:124-147), noise label -1.
  *
  * Deliberately driver-local, like the reference and like
  * [[TsneProjector]]: the input is the case-level matrix (one row per
  * case, ≤ thousands after A1), not the corpus. The pipeline stays
  * distributed up to this point; coordinates rejoin by id afterwards.
  *
  * Faithful algorithm structure (not bit-compatible with the hdbscan
  * library — SURVEY §7.3(e)):
  *   1. core distance = distance to the min_samples-th nearest
  *      neighbor, self included (the library's kNN convention;
  *      min_samples defaults to min_cluster_size);
  *   2. mutual reachability d_mr(a,b) = max(core(a), core(b), d(a,b));
  *   3. MST of the mutual-reachability graph (Prim, O(n²) time,
  *      O(n) memory);
  *   4. single-linkage dendrogram from ascending MST edges;
  *   5. condensed tree: subtrees smaller than min_cluster_size fall
  *      out as points at λ = 1/distance;
  *   6. excess-of-mass cluster selection by stability, root excluded
  *      (allow_single_cluster=False);
  *   7. labels: a point gets the selected cluster on its fall-out
  *      chain, else -1. Label ids follow condensed-tree (BFS) order —
  *      deterministic for a given input.
  */
final class HdbscanClusterer(minClusterSize: Int = 5, minSamples: Int = 0,
                             maxDriverRows: Int = CaseClustering.DefaultMaxDriverRows)
    extends CaseClustering.Clusterer {

  override def cluster(df: DataFrame, inCol: String): DataFrame = {
    val spark = df.sparkSession
    val idCol = df.columns.head
    val rows = CaseClustering.collectMatrix(df, inCol, maxDriverRows, "HdbscanClusterer")
    val n = rows.length
    val mcs = CaseClustering.clampMinClusterSize(minClusterSize, n)
    val ms = math.min(if (minSamples > 0) minSamples else mcs, n)
    val labels = Hdbscan.fit(rows.map(_._2), mcs, ms)
    val labelRows = rows.indices.map(i => Row(rows(i)._1, labels(i)))
    val labelDf = spark.createDataFrame(
      spark.sparkContext.parallelize(labelRows, 4),
      StructType(Seq(StructField("__hdb_id", StringType),
        StructField("cluster", IntegerType))))
    df.join(labelDf, df(idCol).cast("string") === labelDf("__hdb_id"))
      .drop("__hdb_id")
  }
}

object Hdbscan {

  /** Labels for each row of X: cluster id ≥ 0 or -1 for noise. */
  def fit(x: Array[Array[Double]], minClusterSize: Int, minSamples: Int): Array[Int] = {
    val n = x.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(-1)

    def dist(i: Int, j: Int): Double = {
      val a = x(i); val b = x(j)
      var s = 0.0; var k = 0
      while (k < a.length) { val d = a(k) - b(k); s += d * d; k += 1 }
      math.sqrt(s)
    }

    // 1. core distances (self included at position 0)
    val core = new Array[Double](n)
    val row = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { row(j) = dist(i, j); j += 1 }
      java.util.Arrays.sort(row)
      core(i) = row(minSamples - 1)
      i += 1
    }

    // 2+3. Prim MST over mutual reachability, O(n²)/O(n)
    val inTree = new Array[Boolean](n)
    val best = Array.fill(n)(Double.PositiveInfinity)
    val bestFrom = new Array[Int](n)
    val edges = new Array[(Int, Int, Double)](n - 1) // (a, b, weight)
    inTree(0) = true
    var cur = 0
    var e = 0
    while (e < n - 1) {
      var j = 0
      while (j < n) {
        if (!inTree(j)) {
          val mr = math.max(math.max(core(cur), core(j)), dist(cur, j))
          if (mr < best(j)) { best(j) = mr; bestFrom(j) = cur }
        }
        j += 1
      }
      var next = -1; var nd = Double.PositiveInfinity
      j = 0
      while (j < n) {
        if (!inTree(j) && best(j) < nd) { nd = best(j); next = j }
        j += 1
      }
      edges(e) = (bestFrom(next), next, nd)
      inTree(next) = true
      cur = next
      e += 1
    }

    // 4. single-linkage dendrogram: leaves 0..n-1, internal n..2n-2
    val sorted = edges.sortBy(_._3)
    val parentComp = Array.tabulate(2 * n - 1)(identity)
    def find(a: Int): Int = {
      var r = a
      while (parentComp(r) != r) { parentComp(r) = parentComp(parentComp(r)); r = parentComp(r) }
      r
    }
    val compNode = Array.tabulate(n)(identity) // current dendro node of a component root
    val leftChild = new Array[Int](2 * n - 1)
    val rightChild = new Array[Int](2 * n - 1)
    val nodeDist = new Array[Double](2 * n - 1)
    val nodeSize = Array.fill(2 * n - 1)(1)
    var nextNode = n
    sorted.foreach { case (a, b, w) =>
      val ra = find(a); val rb = find(b)
      val na = compNode(ra); val nb = compNode(rb)
      leftChild(nextNode) = na; rightChild(nextNode) = nb
      nodeDist(nextNode) = w
      nodeSize(nextNode) = nodeSize(na) + nodeSize(nb)
      parentComp(ra) = rb
      compNode(find(rb)) = nextNode
      nextNode += 1
    }
    val root = 2 * n - 2

    def lambdaOf(d: Double): Double = 1.0 / math.max(d, 1e-12)

    // 5. condensed tree (BFS; cluster identity survives sub-mcs splits)
    val condParent = scala.collection.mutable.ArrayBuffer[Int]() // per condensed cluster
    val condBirth = scala.collection.mutable.ArrayBuffer[Double]()
    val condChildren = scala.collection.mutable.ArrayBuffer[List[Int]]()
    val condSize = scala.collection.mutable.ArrayBuffer[Int]()
    val fallCluster = new Array[Int](n) // condensed cluster each point fell from
    val fallLambda = new Array[Double](n)

    def newCluster(parent: Int, birth: Double, size: Int): Int = {
      condParent += parent; condBirth += birth; condChildren += Nil; condSize += size
      if (parent >= 0) condChildren(parent) = condChildren(parent) :+ (condParent.length - 1)
      condParent.length - 1
    }
    def leavesUnder(node: Int): Iterator[Int] = new Iterator[Int] {
      private val stack = scala.collection.mutable.Stack(node)
      private def descend(): Unit =
        while (stack.nonEmpty && stack.top >= n) {
          val t = stack.pop()
          stack.push(rightChild(t)); stack.push(leftChild(t))
        }
      descend()
      override def hasNext: Boolean = stack.nonEmpty
      override def next(): Int = { val leaf = stack.pop(); descend(); leaf }
    }

    val rootCid = newCluster(-1, 0.0, n)
    val queue = scala.collection.mutable.Queue[(Int, Int)]((root, rootCid)) // (dendro, cid)
    while (queue.nonEmpty) {
      val (node, cid) = queue.dequeue()
      if (node < n) {
        // identity carried all the way into a leaf (mcs == 1 edge case)
        fallCluster(node) = cid; fallLambda(node) = Double.PositiveInfinity
      } else {
        val λ = lambdaOf(nodeDist(node))
        val l = leftChild(node); val r = rightChild(node)
        val bigL = nodeSize(l) >= minClusterSize
        val bigR = nodeSize(r) >= minClusterSize
        if (bigL && bigR) {
          queue.enqueue((l, newCluster(cid, λ, nodeSize(l))))
          queue.enqueue((r, newCluster(cid, λ, nodeSize(r))))
        } else if (bigL || bigR) {
          val (big, small) = if (bigL) (l, r) else (r, l)
          leavesUnder(small).foreach { p => fallCluster(p) = cid; fallLambda(p) = λ }
          queue.enqueue((big, cid))
        } else {
          leavesUnder(l).foreach { p => fallCluster(p) = cid; fallLambda(p) = λ }
          leavesUnder(r).foreach { p => fallCluster(p) = cid; fallLambda(p) = λ }
        }
      }
    }

    // 6. stability + excess-of-mass selection
    val m = condParent.length
    val stability = new Array[Double](m)
    i = 0
    while (i < n) {
      val cid = fallCluster(i)
      val lp = math.min(fallLambda(i), 1.0 / 1e-12)
      stability(cid) += lp - condBirth(cid)
      i += 1
    }
    var c = 0
    while (c < m) {
      condChildren(c).foreach { ch =>
        stability(c) += condSize(ch) * (condBirth(ch) - condBirth(c))
      }
      c += 1
    }
    val selected = new Array[Boolean](m)
    val hat = new Array[Double](m)
    c = m - 1 // children have larger ids than parents (BFS order)
    while (c >= 0) {
      val kids = condChildren(c)
      if (kids.isEmpty) { selected(c) = true; hat(c) = stability(c) }
      else {
        val sub = kids.map(hat).sum
        if (stability(c) > sub && c != rootCid) { selected(c) = true; hat(c) = stability(c) }
        else hat(c) = sub
      }
      if (c == rootCid) selected(c) = false
      c -= 1
    }
    // top-down: a selected ancestor wins over selected descendants
    c = 0
    while (c < m) {
      if (selected(c)) {
        var p = condParent(c)
        while (p >= 0) { if (selected(p)) selected(c) = false; p = condParent(p) }
      }
      c += 1
    }

    // 7. labels
    val labelOf = condParent.indices.filter(selected).zipWithIndex.toMap
    val labels = new Array[Int](n)
    i = 0
    while (i < n) {
      var cid = fallCluster(i)
      var lab = -1
      while (cid >= 0 && lab == -1) {
        if (selected(cid)) lab = labelOf(cid)
        cid = condParent(cid)
      }
      labels(i) = lab
      i += 1
    }
    labels
  }
}
