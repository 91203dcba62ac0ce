package graft.functions

import graft.Sessions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** ProbeCells gates (SURVEY §2 #25, r16). Three contracts, each of
  * which the IVF dedup path's correctness rests on:
  *  1. flat mode reproduces the r15 `slice(sort_array(transform(
  *     centroid_scores(v), …)))` composition EXACTLY (set and order),
  *     so swapping the kernel cannot move any oracle-gated result;
  *  2. two-level mode with ALL superclusters probed equals flat mode
  *     exactly — pruning is the ONLY approximation it introduces;
  *  3. the superQuantizer CSR is a partition of the cell ids, and a
  *     planted top-1-identical vector keeps its cell under pruning
  *     (the ≥0.9 clustered regime's co-assignment property).
  * Randomized over seeds, codegen path (the DataFrame evaluates the
  * expression inside whole-stage codegen) vs the interpreted reference.
  */
class ProbeCellsSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("4")

  private def randCentroids(rng: Random, n: Int, dim: Int): Seq[Seq[Double]] =
    Seq.fill(n)(Seq.fill(dim)(rng.nextGaussian()))

  /** The r15 composition this kernel replaces, kept as the reference. */
  private def referenceProbe(
      v: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]],
      p: Int): org.apache.spark.sql.Column = {
    val scored = transform(
      CentroidScores.scores(v, centroids),
      (s, i) => struct((-s).as("ns"), i.as("idx")))
    transform(slice(sort_array(scored), 1, p), x => x.getField("idx"))
  }

  test("flat mode equals the sort_array composition, set AND order") {
    import spark.implicits._
    val rng = new Random(41)
    for (trial <- 0 until 3) {
      val dim = 8 + trial * 4
      val nCells = Seq(5, 37, 200)(trial)
      val p = Seq(1, 4, 16)(trial)
      val cents = randCentroids(rng, nCells, dim)
      val vecs = Seq.tabulate(64)(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian())))
      val df = vecs.toDF("vec_id", "v")
      val got = df.select(col("vec_id"),
          ProbeCells.flat(col("v"), cents, p).as("cells"),
          referenceProbe(col("v"), cents, p).as("ref"))
        .collect()
      for (r <- got) {
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"trial $trial vec ${r.getLong(0)}: kernel ${r.getSeq[Int](1)} vs reference ${r.getSeq[Int](2)}")
      }
    }
  }

  test("two-level with every supercluster probed equals flat exactly") {
    import spark.implicits._
    val rng = new Random(43)
    val dim = 12
    val nCells = 150
    val p = 6
    val cents = randCentroids(rng, nCells, dim)
    val (supers, offs, mems) = Similarity.superQuantizer(cents)
    // CSR is a partition: offsets cover [0, nCells), members is a permutation
    assert(offs.head == 0 && offs.last == nCells)
    assert(mems.sorted.toSeq == (0 until nCells))
    val vecs = Seq.tabulate(64)(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian())))
    val df = vecs.toDF("vec_id", "v")
    val got = df.select(
        ProbeCells.flat(col("v"), cents, p).as("flat"),
        ProbeCells.twoLevel(col("v"), cents, p, supers, supers.length, offs, mems).as("all"),
        ProbeCells.twoLevel(col("v"), cents, p, supers, 2, offs, mems).as("pruned"))
      .collect()
    for (r <- got) {
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"superProbes=sRows must equal flat: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}")
      // pruned output stays a subset of the cell space at full length
      // (a partition CSR can always fill p slots with 2 supers probed
      // unless those supers hold < p cells — tolerate short output)
      val pruned = r.getSeq[Int](2)
      assert(pruned.nonEmpty && pruned.size <= p && pruned.forall(c => c >= 0 && c < nCells))
      assert(pruned.distinct.size == pruned.size, s"duplicate cells: $pruned")
    }
  }

  test("NaN cell scores cannot block finite cells from selection (ADVICE r16)") {
    import spark.implicits._
    // A vector with an Inf element survives the upstream zero-norm
    // filter (norm = Inf > 0) and produces NaN dots against any cell
    // orthogonal to the Inf coordinate's sign pattern (Inf·0, or
    // Inf−Inf across terms). Pre-fix, a NaN inserted while the buffer
    // was unfilled froze the buffer: better() is not a total order for
    // NaN, so every later finite score was rejected once it filled.
    // Craft the matrix so the FIRST cells (lowest index — visited
    // first) score NaN, then finite cells follow: the kernel must
    // return the finite cells, NaN mapping to −∞ like the zero-norm
    // guard.
    val dim = 4
    val cents: Seq[Seq[Double]] = Seq(
      Seq(0.0, 1.0, 0.0, 0.0), // dot with v = Inf·0 + 0 + ... = NaN path
      Seq(0.0, 0.0, 1.0, 0.0), // also NaN
      Seq(1.0, 0.0, 0.0, 0.0), // dot = +Inf (fine — sorts greatest)
      Seq(0.0, 0.0, 0.0, 1.0), // NaN
      Seq(0.0, 1.0, 1.0, 1.0)) // NaN
    val v = Seq(Double.PositiveInfinity, 0.0, 0.0, 0.0)
    val df = Seq((1L, v)).toDF("vec_id", "v")
    val got = df.select(ProbeCells.flat(col("v"), cents, 3).as("cells"))
      .collect().head.getSeq[Int](0)
    // NaN cells map to −∞ (ties broken by index): +Inf cell 2 first,
    // then the lowest-indexed −∞ cells 0, 1
    assert(got == Seq(2, 0, 1),
      s"NaN scores corrupted selection: got $got, want Seq(2, 0, 1)")
  }

  test("a vector equal to a cell centroid keeps that cell under pruning") {
    import spark.implicits._
    val rng = new Random(47)
    val dim = 16
    val cents = randCentroids(rng, 100, dim)
    val (supers, offs, mems) = Similarity.superQuantizer(cents)
    // probe with the centroids THEMSELVES: cell c scores cos=‖c‖ against
    // itself, the global max for unit-incomparable scales is not
    // guaranteed, but c must land in vector c's top-|probes| because its
    // own supercluster (containing c) is always the top-1 supercluster
    // for direction c in a partition built by nearest-assignment... which
    // Lloyd movement can break for boundary cells — so gate the RATE, not
    // each row (the clustered-regime property is statistical; the exact
    // floor for planted duplicates is gated end-to-end in DedupSpec).
    val df = cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cid", "v")
    val got = df.select(col("cid"),
        ProbeCells.twoLevel(col("v"), cents, 4, supers, 1, offs, mems).as("cells"))
      .collect()
    val kept = got.count(r => r.getSeq[Int](1).contains(r.getInt(0)))
    assert(kept >= 95, s"only $kept/100 centroid-vectors kept their own cell at superProbes=1")
  }
}
