package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Closed-form checks for the fixed-point PageRank: stationary points,
  * symmetry, mass accounting, and the zero-iteration identity — the
  * properties a correct BSP implementation cannot fake. */
class GraphSpec extends AnyFunSuite with SparkSpec {

  private val Scale = 1000000000L

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankE9(
      edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-node cycle is a stationary point: uniform rank survives 10 iterations exactly") {
    // r = 15e9/(100·2) + 85·(5e8 DIV 1)/100 = 75e6 + 425e6 = 5e8 = init
    val r = run(Seq(0L -> 1L, 1L -> 0L), Seq(0L, 1L), 10)
    assert(r == Map(0L -> Scale / 2, 1L -> Scale / 2))
  }

  test("uniform complete graph (no self-loops) stays uniform") {
    val nodes = (0L until 4L)
    val edges = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val r = run(edges, nodes, 7)
    // each node emits 3 contributions of floor(25e7/3), receives 3 back:
    // base 37500000 + 85·(3·83333333) DIV 100 = 37500000 + 212499999
    assert(r.values.toSet.size == 1)
    assert(r(0L) == 37500000L + 85L * (3L * (250000000L / 3L)) / 100L)
  }

  test("sink-free star: hub outranks leaves, total mass bounded by SCALE") {
    // leaves 1..4 all link to hub 0; hub links back to every leaf
    val edges = (1L to 4L).flatMap(l => Seq(l -> 0L, 0L -> l))
    val r = run(edges, 0L to 4L, 10)
    assert((1L to 4L).forall(l => r(0L) > r(l)))
    assert((1L to 4L).map(r).toSet.size == 1)   // leaf symmetry
    val total = r.values.sum
    // floor losses only shed mass; 10 iterations of ≤ (outdeg+1) units
    assert(total <= Scale && total >= Scale - 1000L)
  }

  test("zero iterations returns the uniform init, node set preserved") {
    val r = run(Seq(0L -> 1L), Seq(0L, 1L, 2L), 0)
    assert(r == Map(0L -> Scale / 3, 1L -> Scale / 3, 2L -> Scale / 3))
  }

  test("dangling mass is redistributed uniformly: closed-form one step, mass conserved") {
    // 1 links to 2; 2 and 3 are dangling. D₀ = 2·(1e9 DIV 3) = 666666666,
    // share D₀ DIV 3 = 222222222, base = 15e9 DIV 300 = 5e7:
    //   r₁(1) = r₁(3) = 5e7 + 85·222222222 DIV 100        = 238888888
    //   r₁(2) =        5e7 + 85·(333333333+222222222) DIV 100 = 522222221
    val r1 = run(Seq(1L -> 2L), Seq(1L, 2L, 3L), 1)
    assert(r1 == Map(1L -> 238888888L, 2L -> 522222221L, 3L -> 238888888L))
    // redistribution conserves total mass up to per-step floor loss
    val r10 = run(Seq(1L -> 2L), Seq(1L, 2L, 3L), 10)
    val total = r10.values.sum
    assert(total <= Scale && total >= Scale - 1000L)
  }

  test("pagerank: edges leaving the node set are dropped; boundary node counts as dangling") {
    // 1→2 inside; 2's only out-edge points OUTSIDE the node set {1,2,3}.
    // Induced restriction must (a) drop 2→9, (b) therefore mark 2 as
    // dangling so its mass redistributes instead of silently vanishing.
    val open = Seq(1L -> 2L, 2L -> 9L)
    val r = run(open, Seq(1L, 2L, 3L), 1)
    // identical to the closed fixture above with the leaving edge gone
    assert(r == run(Seq(1L -> 2L), Seq(1L, 2L, 3L), 1))
    // mass is conserved up to floor loss over many iterations
    val total = run(open, Seq(1L, 2L, 3L), 10).values.sum
    assert(total <= Scale && total >= Scale - 1000L)
  }

  test("wide (decimal-128) arithmetic path is bit-identical to the i64 path") {
    import spark.implicits._
    // a fixture exercising every term: hub skew, dangling mass, isolation
    val edges = ((1L to 4L).flatMap(l => Seq(l -> 0L, 0L -> l)) :+ (5L -> 6L))
    val nodes = 0L to 7L
    def both(wide: Boolean): Map[Long, Long] =
      Graph.pageRankE9(edges.toDF("src", "dst"), nodes.toDF("node"),
        iterations = 10, wide = wide)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(both(wide = true) == both(wide = false))
  }

  private def runCc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                    iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponentsMinLabel(
      edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cc: chain converges at iterations = eccentricity of the min node") {
    // path 0-1-2-3-4: node 4 is 4 hops from the min id
    val chain = (0L until 4L).map(i => i -> (i + 1))
    val r = runCc(chain, 0L to 4L, 4)
    assert(r == (0L to 4L).map(_ -> 0L).toMap)
  }

  test("cc: one step short of the eccentricity has NOT converged (deterministic partial state)") {
    val chain = (0L until 4L).map(i => i -> (i + 1))
    val r = runCc(chain, 0L to 4L, 3)
    // after k steps a node holds the min over its k-hop neighborhood:
    // node 4's 3-hop neighborhood is {1,2,3,4} → label 1, not 0
    assert(r(4L) == 1L)
    assert((0L to 3L).forall(r(_) == 0L))
  }

  test("cc: triangle collapses in one step") {
    val r = runCc(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L), 0L to 2L, 1)
    assert(r == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("cc: isolated node keeps its own id; separate components stay separate") {
    val r = runCc(Seq(0L -> 1L), Seq(0L, 1L, 5L), 2)
    assert(r == Map(0L -> 0L, 1L -> 0L, 5L -> 5L))
  }

  test("cc: zero iterations is the identity labeling") {
    val r = runCc(Seq(0L -> 1L), Seq(0L, 1L, 2L), 0)
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("cc: edges with an endpoint outside the node set are dropped (induced subgraph)") {
    // edge 1-99 has no node 99: propagation must not leak through it
    val r = runCc(Seq(0L -> 1L, 1L -> 99L), Seq(0L, 1L), 3)
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }

  private def runHc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                    maxDist: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.harmonicCentralityE9(
      edges.toDF("src", "dst"), nodes.toDF("node"), maxDist)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("harmonic: directed path 0→1→2, closed form") {
    // H(0)=0 (no in-paths); H(1)=1e9/1; H(2)=1e9/1 + 1e9/2
    val r = runHc(Seq(0L -> 1L, 1L -> 2L), Seq(0L, 1L, 2L), 2)
    assert(r == Map(0L -> 0L, 1L -> 1000000000L, 2L -> 1500000000L))
  }

  test("harmonic: maxDist truncates the sum deterministically") {
    val r = runHc(Seq(0L -> 1L, 1L -> 2L), Seq(0L, 1L, 2L), 1)
    assert(r(2L) == 1000000000L)   // the dist-2 origin is out of horizon
  }

  test("harmonic: 3-cycle is symmetric, each node sees dist 1 and 2") {
    val r = runHc(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L), 0L to 2L, 5)
    assert(r.values.toSet == Set(1500000000L))
  }

  test("harmonic: disconnected and unreachable contribute zero (well-defined without ∞)") {
    val r = runHc(Seq(0L -> 1L), Seq(0L, 1L, 9L), 4)
    assert(r == Map(0L -> 0L, 1L -> 1000000000L, 9L -> 0L))
  }

  test("harmonic: edges outside the node set are dropped (induced subgraph)") {
    // 0→77→1 would give H(1)=5e8 through the ghost node; it must not
    val r = runHc(Seq(0L -> 77L, 77L -> 1L), Seq(0L, 1L), 4)
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }

  test("harmonic: zero horizon is all zeros") {
    val r = runHc(Seq(0L -> 1L), Seq(0L, 1L), 0)
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }

  test("neighborhood function: directed path closed form, zero-horizon rows present") {
    import spark.implicits._
    val nf = Graph.neighborhoodFunction(
      Seq(0L -> 1L, 1L -> 2L).toDF("src", "dst"), (0L to 2L).toDF("node"), maxDist = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pairs within d: d=1 → (0,1),(1,2); d=2 → +(0,2); saturated after
    assert(nf == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("neighborhood function: edgeless graph is all-zero but every horizon row exists") {
    import spark.implicits._
    val nf = Graph.neighborhoodFunction(
      Seq.empty[(Long, Long)].toDF("src", "dst"), (0L to 2L).toDF("node"), maxDist = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  private def runTri(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"), nodes.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: one triangle counted once per vertex, tail vertex zero") {
    val r = runTri(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L), 0L to 3L)
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("triangles: direction, duplication, and self-loops don't change the undirected count") {
    // same triangle given twice in both directions + a self-loop
    val r = runTri(Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 2L -> 0L, 0L -> 2L, 1L -> 1L),
      0L to 2L)
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangles: K4 — every vertex in C(3,2)=3 triangles") {
    val nodes = 0L until 4L
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val r = runTri(edges, nodes)
    assert(r == nodes.map(_ -> 3L).toMap)
  }

  test("triangles: triangle-free chain is all zeros") {
    val r = runTri((0L until 4L).map(i => i -> (i + 1)), 0L to 4L)
    assert(r.values.forall(_ == 0L))
  }

  test("triangles: edges to absent nodes are dropped (induced subgraph)") {
    val r = runTri(Seq(0L -> 1L, 1L -> 99L, 99L -> 0L), Seq(0L, 1L))
    assert(r == Map(0L -> 0L, 1L -> 0L))
  }

  test("clustering coefficient: closed forms — K4 = 1e6, triangle+tail mixes, chain = 0") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
      Graph.clusteringCoefficientPpm(edges.toDF("src", "dst"), nodes.toDF("node"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k4 = for (a <- 0L until 4L; b <- 0L until 4L if a < b) yield (a, b)
    assert(run(k4, 0L until 4L).values.toSet == Set(1000000L))
    // triangle 0-1-2 with tail 2-3: nodes 0,1 fully clustered; node 2 has
    // d=3, T=1 → 2e6/6 = 333333; tail node d=1 → 0 by convention
    assert(run(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L), 0L to 3L) ==
      Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 333333L, 3L -> 0L))
    assert(run((0L until 3L).map(i => i -> (i + 1)), 0L to 3L).values.forall(_ == 0L))
  }

  test("hyperball: small directed path tracks the exact harmonic values") {
    import spark.implicits._
    val r = Graph.harmonicCentralityHyperBall(
      Seq(0L -> 1L, 1L -> 2L).toDF("src", "dst"), (0L to 2L).toDF("node"),
      maxDist = 2, m = 256)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) == 0.0)                                // no in-paths, exactly
    assert(math.abs(r(1L) - 1.0) < 0.1)
    assert(math.abs(r(2L) - 1.5) < 0.15)
  }

  test("hyperball vs exact on the declared fixture: every node within 12% + 0.5 absolute") {
    // The 12%+0.5 tolerance (and the exact-zero ⇒ estimate-zero rule)
    // now lives inside the declared query as err_gate; the exact column
    // must agree with the exact twin query bit for bit.
    val rows = graft.queries.Extensions.graphHarmonicHll(spark, "/root/testdata/sf0.001")
      .collect()
    val exact = graft.queries.Extensions.graphHarmonic(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getLong(0)),
        s"node ${r.getLong(0)}: exact column diverged from graphHarmonic")
      assert(r.getLong(2) == 0L,
        s"node ${r.getLong(0)}: hyperball estimate out of tolerance (err_gate=1)")
    }
  }

  test("hyperball: deterministic run to run (idempotent union, fixed-order estimator)") {
    val a = graft.queries.Extensions.graphHarmonicHll(spark, "/root/testdata/sf0.001").collect()
    val b = graft.queries.Extensions.graphHarmonicHll(spark, "/root/testdata/sf0.001").collect()
    assert(a.sameElements(b))
  }

  private def runPpr(edges: Seq[(Long, Long)], nodes: Seq[Long],
                     seeds: Seq[Long], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankE9(
      edges.toDF("src", "dst"), nodes.toDF("node"), iters,
      seeds = Some(seeds.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("ppr: seeding every node IS the uniform prior, bit for bit") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 2L)
    val uniform = run(edges, 0L to 2L, 6)
    assert(runPpr(edges, 0L to 2L, 0L to 2L, 6) == uniform)
  }

  test("ppr: single seed on 0->1, closed form with seed-restricted dangling return") {
    // r1: seed base 15e8/10? no — base = 0.15*SCALE = 150e6 to the seed;
    // leaf gets the full damped push 85e7; r2 returns the leaf's dangling
    // mass to the SEED only: 15e7 + 85*(85e7 DIV 1) DIV 100 = 872500000
    val edges = Seq(0L -> 1L)
    val r1 = runPpr(edges, Seq(0L, 1L), Seq(0L), 1)
    assert(r1 == Map(0L -> 150000000L, 1L -> 850000000L))
    val r2 = runPpr(edges, Seq(0L, 1L), Seq(0L), 2)
    assert(r2 == Map(0L -> 872500000L, 1L -> 127500000L))
  }

  test("ppr: nodes unreachable from the seed set score exactly zero") {
    // two components: seed lives in {0,1}; {2,3} must stay at 0
    val edges = Seq(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L)
    val r = runPpr(edges, 0L to 3L, Seq(0L), 8)
    assert(r(2L) == 0L && r(3L) == 0L)
    assert(r(0L) > 0L && r(1L) > 0L)
  }

  test("ppr: out-of-graph seed ids are ignored, not mass sinks") {
    val edges = Seq(0L -> 1L, 1L -> 0L)
    // seed 99 isn't a node: |S| must be 1, so results match seeding {0} alone
    assert(runPpr(edges, Seq(0L, 1L), Seq(0L, 99L), 5) ==
      runPpr(edges, Seq(0L, 1L), Seq(0L), 5))
  }

  test("ppr: wide decimal path is bit-identical to narrow on a seeded graph") {
    import spark.implicits._
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L).toDF("src", "dst")
    val nodes = (0L to 2L).toDF("node")
    val seeds = Some(Seq(0L).toDF("node"))
    val narrow = Graph.pageRankE9(edges, nodes, 6, seeds = seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = Graph.pageRankE9(edges, nodes, 6, wide = true, seeds = seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow == wide)
  }

  test("hyperanf: small directed path tracks the exact pair counts") {
    import spark.implicits._
    // 0→1→2: dist-1 pairs {01,12}, dist-2 adds {02} → N(1)=2, N(2)=3
    val r = Graph.neighborhoodFunctionHyperAnf(
      Seq(0L -> 1L, 1L -> 2L).toDF("src", "dst"), (0L to 2L).toDF("node"),
      maxDist = 3, m = 256)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 2.0) < 0.2)
    assert(math.abs(r(2L) - 3.0) < 0.3)
    assert(r(3L) == r(2L))   // curve saturates past the diameter
  }

  test("hyperanf vs exact nf on the declared fixture: every horizon within 10%, monotone") {
    // Tolerance and monotonicity are the query's err_gate/mono_gate;
    // the exact pair column must agree with the exact twin bit for bit.
    val rows = graft.queries.Extensions.graphNfHll(spark, "/root/testdata/sf0.001")
      .collect()
    val exact = graft.queries.Extensions.graphNf(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getLong(0)),
        s"horizon ${r.getLong(0)}: exact column diverged from graphNf")
      assert(r.getLong(2) == 0L,
        s"horizon ${r.getLong(0)}: hyperanf out of tolerance (err_gate=1)")
      assert(r.getLong(3) == 0L,
        s"horizon ${r.getLong(0)}: ball mass not monotone (mono_gate=1)")
    }
  }

  test("hyperanf: deterministic run to run") {
    val a = graft.queries.Extensions.graphNfHll(spark, "/root/testdata/sf0.001").collect()
    val b = graft.queries.Extensions.graphNfHll(spark, "/root/testdata/sf0.001").collect()
    assert(a.sameElements(b))
  }

  private def runKcore(edges: Seq[(Long, Long)], nodes: Seq[Long],
                       iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.corenessHIndex(edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kcore: K5 clique is a 4-core; direction/duplicates/self-loops don't matter") {
    val nodes = 0L until 5L
    val clique = for (a <- nodes; b <- nodes if a != b) yield (a, b) // both directions
    val noisy = clique ++ Seq(0L -> 0L, 1L -> 2L, 1L -> 2L)
    assert(runKcore(noisy, nodes, 4) == nodes.map(_ -> 4L).toMap)
  }

  test("kcore: chain is a 1-core, triangle run a 2-core, isolated node 0") {
    val chain = (0L until 4L).map(i => i -> (i + 1))
    val r = runKcore(chain, 0L to 5L, 8)
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
    // chain + skips: every consecutive triple is a triangle → 2-core
    val tri = chain ++ (0L until 3L).map(i => i -> (i + 2))
    val rt = runKcore(tri, 0L to 4L, 8)
    assert(rt == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("kcore: star collapses to 1 in one h-index step from the degree init") {
    val star = (1L to 6L).map(l => 0L -> l)
    assert(runKcore(star, 0L to 6L, 1) == (0L to 6L).map(_ -> 1L).toMap)
  }

  test("kcore: clique hanging off a chain — mixed core numbers, converged == extra iterations") {
    // clique {0..3} (4 nodes, 3-core), chain 3-4-5-6 (1-core tail)
    val cnodes = 0L until 4L
    val edges = (for (a <- cnodes; b <- cnodes if a < b) yield (a, b)) ++
      Seq(3L -> 4L, 4L -> 5L, 5L -> 6L)
    val r8 = runKcore(edges, 0L to 6L, 8)
    assert(r8 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 1L, 5L -> 1L, 6L -> 1L))
    assert(r8 == runKcore(edges, 0L to 6L, 12)) // fixed point reached
  }

  private def runLpa(edges: Seq[(Long, Long)], nodes: Seq[Long],
                     iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagationMinTie(edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("lpa: triangle converges to the min label; isolated node keeps its own") {
    // K3 sync trace: l1 = (1,0,0), l2 = (0,0,0) — fixed point from step 2
    assert(runLpa(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L), 0L to 3L, 1) ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
    assert(runLpa(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L), 0L to 3L, 3) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
  }

  test("lpa: count beats label — a doubly-backed larger label wins over a smaller singleton") {
    // triangle {5,6,7}; 9–6, 9–7, 9–1; 1–0. Step 1: l1(6)=l1(7)=5
    // (each sees {5, other, 9}), l1(1)=min(0,9)=0, l1(9)=min(6,7,1)=1.
    // Step 2, node 9: votes {5:2, 0:1} → 5 by COUNT; a min-label rule
    // would say 0 — this pins the (count DESC, label ASC) order.
    val edges = Seq(5L -> 6L, 6L -> 7L, 5L -> 7L,
      9L -> 6L, 9L -> 7L, 9L -> 1L, 1L -> 0L)
    val nodes = Seq(0L, 1L, 5L, 6L, 7L, 9L)
    val r1 = runLpa(edges, nodes, 1)
    assert(r1(6L) == 5L && r1(7L) == 5L && r1(1L) == 0L && r1(9L) == 1L)
    val r2 = runLpa(edges, nodes, 2)
    assert(r2(9L) == 5L)
    // singleton ties still break to the min: node 9 at step 1 saw
    // {6, 7, 1} all count-1 and took 1
    assert(r1(9L) == 1L)
  }

  test("lpa: zero iterations is the identity labeling; deterministic run to run") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 3L -> 4L)
    assert(runLpa(edges, 0L to 4L, 0) == (0L to 4L).map(n => n -> n).toMap)
    assert(runLpa(edges, 0L to 4L, 5) == runLpa(edges, 0L to 4L, 5))
  }

  test("lpa/kcore: edges with an endpoint outside the node set are dropped (induced subgraph)") {
    val edges = Seq(0L -> 1L, 1L -> 9L) // 9 absent
    assert(runKcore(edges, 0L to 2L, 8) == Map(0L -> 1L, 1L -> 1L, 2L -> 0L))
    assert(runLpa(edges, 0L to 2L, 4)(2L) == 2L)
  }

  private def runW(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                   iters: Int, wide: Boolean = false): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankE9(edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters,
        wide = wide, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted: all weights 1 is exactly the unweighted rank") {
    val e = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 2L)
    val ew = e.map { case (s, d) => (s, d, 1L) }
    assert(runW(ew, 0L to 2L, 5) == run(e, 0L to 2L, 5))
  }

  test("weighted: closed-form one step — contribution splits by w/W, not 1/outdeg") {
    // 0 → 1 (w=1), 0 → 2 (w=3); 1 and 2 dangling. W(0)=4.
    // r₀ = 333333333 each; D₀ = 2·333333333 = 666666666, share 222222222
    //   r₁(0) = 5e7 + 85·222222222 DIV 100                          = 238888888
    //   r₁(1) = 5e7 + 85·(333333333·1 DIV 4 + 222222222) DIV 100    = 309722221
    //   r₁(2) = 5e7 + 85·(333333333·3 DIV 4 + 222222222) DIV 100    = 451388887
    val r = runW(Seq((0L, 1L, 1L), (0L, 2L, 3L)), 0L to 2L, 1)
    assert(r == Map(0L -> 238888888L, 1L -> 309722221L, 2L -> 451388887L))
  }

  test("weighted: wide decimal path is bit-identical to narrow") {
    val ew = Seq((0L, 1L, 2L), (1L, 2L, 5L), (2L, 0L, 1L), (0L, 2L, 7L))
    assert(runW(ew, 0L to 2L, 6) == runW(ew, 0L to 2L, 6, wide = true))
  }

  test("weighted: NULL/zero/negative weight fails loudly instead of leaking mass") {
    import spark.implicits._
    for (bad <- Seq(Some(0L), Some(-3L), None)) {
      val edges = Seq((0L, 1L, Some(2L)), (1L, 2L, bad), (2L, 0L, Some(1L)))
        .toDF("src", "dst", "w")
      val e = intercept[IllegalArgumentException] {
        Graph.pageRankE9(edges, (0L to 2L).toDF("node"), 2,
          weightCol = Some("w"))
      }
      assert(e.getMessage.contains("NULL/zero/negative"))
    }
  }

  private def runScc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                     iters: Int, rounds: Int = 8): Map[Long, Long] = {
    import spark.implicits._
    Graph.stronglyConnectedComponents(
      edges.toDF("src", "dst"), nodes.toDF("node"), iters, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("scc: a directed cycle is one component, labeled by its min node") {
    val edges = Seq(3L -> 5L, 5L -> 9L, 9L -> 3L)
    assert(runScc(edges, Seq(3L, 5L, 9L), 4) ==
      Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("scc: a DAG is all singletons (every node its own component)") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 0L -> 2L, 3L -> 2L)
    assert(runScc(edges, 0L to 3L, 4) == (0L to 3L).map(n => n -> n).toMap)
  }

  test("scc: two cycles linked one-way stay separate components (needs a second peel round)") {
    // 5-9-7 cycle feeds 0-2 cycle: the feeding cycle's min (5) pollutes
    // the fed cycle's F in round 1... direction matters: 5 > 0, so the
    // FED cycle keeps F=B=0 and the FEEDER splits (B dips to 0) — peeled
    // in round 2. The reverse orientation splits the fed side instead.
    val edges = Seq(5L -> 9L, 9L -> 7L, 7L -> 5L, 7L -> 0L,
      0L -> 2L, 2L -> 0L)
    assert(runScc(edges, Seq(0L, 2L, 5L, 7L, 9L), 6) ==
      Map(0L -> 0L, 2L -> 0L, 5L -> 5L, 7L -> 5L, 9L -> 5L))
  }

  test("scc: mutual bridges merge two cycles into one component") {
    val edges = Seq(0L -> 1L, 1L -> 0L, 4L -> 5L, 5L -> 4L,
      1L -> 4L, 5L -> 0L)
    assert(runScc(edges, Seq(0L, 1L, 4L, 5L), 8) ==
      Map(0L -> 0L, 1L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("scc: isolated node and edges leaving the node set (induced subgraph)") {
    val edges = Seq(0L -> 1L, 1L -> 0L, 1L -> 99L, 99L -> 1L) // 99 absent
    assert(runScc(edges, Seq(0L, 1L, 2L), 4) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
  }

  test("scc: exhausted round budget fails loudly, never returns a partial labeling") {
    // chain of 3 one-way-linked 2-cycles with labels ordered so each
    // round can only peel one end: high feeds low feeds lower
    val edges = Seq(4L -> 5L, 5L -> 4L, 4L -> 2L, 2L -> 3L, 3L -> 2L,
      2L -> 0L, 0L -> 1L, 1L -> 0L)
    val e = intercept[Exception] {
      runScc(edges, 0L to 5L, 6, rounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("scc: exhausted propagation budget fails loudly (no silent component split)") {
    // 5-cycle: min-label fixpoint needs 4 steps; a 2-step budget must
    // throw, not return a partially-propagated labeling
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 0L)
    val e = intercept[Exception] { runScc(edges, 0L to 4L, 2) }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("scc: deterministic run to run") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L, 3L -> 4L, 4L -> 3L)
    assert(runScc(edges, 0L to 4L, 6) == runScc(edges, 0L to 4L, 6))
  }

  private def runSssp(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                      sources: Seq[Long], iters: Int = 12): Map[Long, Long] = {
    import spark.implicits._
    Graph.shortestDistances(edges.toDF("src", "dst", "w"),
        nodes.toDF("node"), sources.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sssp: weighted relaxation beats the fewer-hop heavier path") {
    // 0→1→2 costs 1+1=2; direct 0→2 costs 5 — min must win, not hops
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 5L))
    assert(runSssp(edges, 0L to 2L, Seq(0L)) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("sssp: multi-source takes the per-node minimum over seeds; unreachable absent") {
    val edges = Seq((0L, 1L, 4L), (5L, 1L, 1L), (5L, 6L, 2L), (8L, 9L, 1L))
    val d = runSssp(edges, 0L to 9L, Seq(0L, 5L))
    assert(d == Map(0L -> 0L, 5L -> 0L, 1L -> 1L, 6L -> 2L))
  }

  test("sssp: cycles converge (positive weights), seeds outside the node set are ignored") {
    val edges = Seq((0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 3L))
    assert(runSssp(edges, 0L to 2L, Seq(0L, 77L)) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 4L))
  }

  test("sssp: exhausted budget fails loudly instead of returning non-minimal bounds") {
    val edges = (0L until 6L).map(i => (i, i + 1, 1L))
    val e = intercept[Exception] { runSssp(edges, 0L to 6L, Seq(0L), iters = 2) }
    assert(e.getMessage.contains("non-minimal"))
  }

  test("sssp: maxIters equal to the exact hop count H suffices (compare-only final probe)") {
    // 6-hop chain: distances are final after exactly 6 producing steps;
    // the in-budget no-change observation would need a 7th. The
    // post-budget compare-only probe must accept H = 6.
    val edges = (0L until 6L).map(i => (i, i + 1, 1L))
    assert(runSssp(edges, 0L to 6L, Seq(0L), iters = 6) ==
      (0L to 6L).map(i => i -> i).toMap)
  }

  test("declared graph_scc query: the merged 10-node SCC, the 5-cycles, and the condensation") {
    val m = graft.queries.Extensions.graphScc(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 100)
    // blocks 0 and 1 merged by the two-way bridges
    assert((0L until 10L).forall(n => m(n) == 0L))
    // every other block of 5 is its own SCC labeled by its head
    assert((10L until 100L).forall(n => m(n) == n / 5 * 5))
  }

  private def runBc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                    pivots: Seq[Long], maxDist: Int = 12): Map[Long, Long] = {
    import spark.implicits._
    Graph.betweennessBrandesPpm(edges.toDF("src", "dst"), nodes.toDF("node"),
        pivots.toDF("node"), maxDist)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Independent exact Brandes (horizon-bounded, Double arithmetic) —
    * deliberately a different formulation than the engine's fixed-point
    * BSP, so agreement certifies the algorithm, not the code. */
  private def exactBc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      pivots: Seq[Long], maxDist: Int): Map[Long, Double] = {
    val adj = edges.distinct.filter(e => nodes.contains(e._1) && nodes.contains(e._2))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val bc = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
    for (s <- pivots) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1.0)
      val levels = scala.collection.mutable.ArrayBuffer(Seq(s))
      var frontier = Seq(s); var d = 0
      while (frontier.nonEmpty && d < maxDist) {
        d += 1
        val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
        for (v <- frontier; w <- adj.getOrElse(v, Nil) if !dist.contains(w))
          contrib(w) += sigma(v)
        frontier = contrib.keys.toSeq
        frontier.foreach { w => dist(w) = d; sigma(w) = contrib(w) }
        if (frontier.nonEmpty) levels += frontier
      }
      val delta = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (lvl <- levels.indices.reverse.drop(1); v <- levels(lvl);
           w <- adj.getOrElse(v, Nil) if dist.get(w).contains(lvl + 1))
        delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
      for (v <- dist.keys if v != s) bc(v) += delta(v)
    }
    val scale = nodes.size.toDouble / pivots.size
    bc.map { case (v, x) => v -> x * scale }.toMap
  }

  test("betweenness: directed path — only the middle node lies between") {
    val r = runBc(Seq(0L -> 1L, 1L -> 2L), 0L to 2L, 0L to 2L)
    assert(r == Map(0L -> 0L, 1L -> 1000000L, 2L -> 0L))
  }

  test("betweenness: diamond splits the dependency between the two middles") {
    val r = runBc(Seq(0L -> 1L, 0L -> 2L, 1L -> 3L, 2L -> 3L), 0L to 3L, 0L to 3L)
    assert(r == Map(0L -> 0L, 1L -> 500000L, 2L -> 500000L, 3L -> 0L))
  }

  test("betweenness: pivot subset applies the N/K estimator scale; pivot's own delta excluded") {
    // Only pivot 0 runs: delta_0(1) = 1, scaled by N/K = 3
    val r = runBc(Seq(0L -> 1L, 1L -> 2L), 0L to 2L, Seq(0L))
    assert(r == Map(0L -> 0L, 1L -> 3000000L, 2L -> 0L))
  }

  test("betweenness: horizon truncation drops paths past maxDist, deterministically") {
    val r = runBc(Seq(0L -> 1L, 1L -> 2L), 0L to 2L, 0L to 2L, maxDist = 1)
    assert(r.values.forall(_ == 0L))   // no 2-hop path fits the horizon
  }

  test("betweenness vs independent exact Brandes on the declared fixture") {
    val rows = graft.queries.Extensions.graphBetweenness(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 100)
    val nodes = (0L until 100L).toSeq
    val chain = nodes.filter(n => n % 7 != 6 && n < 99).map(n => n -> (n + 1))
    val bridges = Seq(0L -> 50L, 25L -> 75L)
    val exact = exactBc(chain ++ bridges, nodes, nodes.filter(_ % 10 == 0), 12)
    // fixed-point truncation loses < 1 ppm per backward term; after the
    // x10 estimator scale a generous 0.2% + 2000 ppm absolute bound
    // still catches any real algorithmic divergence
    for ((v, e) <- exact) {
      val eppm = e * 1e6
      assert(math.abs(rows(v) - eppm) <= 0.002 * eppm + 2000,
        s"node $v: engine ${rows(v)} vs exact $eppm")
    }
    // the fixture must exercise real structure: the short forward
    // segments past each pivot (chains break every 7 nodes) plus the
    // two bridge paths yield a couple dozen true intermediates
    assert(rows.values.count(_ > 0L) > 15)
    assert(exact.values.count(_ > 0.0) == rows.values.count(_ > 0L))
  }

  test("volume fixture: full doc_id domain, 10 edges/node, rank mass bounded and differentiated") {
    val rows = graft.queries.Extensions.graphPagerankVolume(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)                       // N grows with sf, not a fixed 100
    assert(rows.map(_.getLong(0)).toSeq == (0L until 500L))
    val total = rows.map(_.getLong(1)).sum
    assert(total <= Scale && total > Scale - 500L * 100L)   // DIV-truncation slack only
    // the quadratic-residue in-degree skew must spread the ranks widely
    assert(rows.map(_.getLong(1)).distinct.length > 100)
  }

  test("volume cc: the undirected residue expander is one component (min label 0 everywhere)") {
    val m = graft.queries.Extensions.graphCcVolume(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 500 && m.values.forall(_ == 0L))
  }

  test("volume sssp: every node reached from seed 0, distances within the 16-step budget") {
    val d = graft.queries.Extensions.graphSsspVolume(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d.size == 500 && d(0L) == 0L)
    assert(d.values.max <= 16L * 5L)                 // w <= 5 per hop
  }

  private def runHits(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Graph.hitsPpm(edges.toDF("src", "dst"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Independent HITS in plain Double arithmetic with the same L∞
    * normalization — no step mirroring of the engine's integer code. */
  private def hitsExact(edges: Seq[(Long, Long)], nodes: Seq[Long],
                        iters: Int): Map[Long, (Double, Double)] = {
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(v => v -> edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val am = ar.values.max
      a = ar.map { case (k, v) => k -> v / am }
      val hr = nodes.map(u => u -> edges.filter(_._1 == u).map(e => a(e._2)).sum).toMap
      val hm = hr.values.max
      h = hr.map { case (k, v) => k -> v / hm }
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  test("hits: star — the center is the unique max hub, leaves the max authorities") {
    // 0 links to 1..4; nothing links back: 0 is a pure hub (auth 0),
    // every leaf a pure equal authority (hub 0)
    val r = runHits((1L to 4L).map(0L -> _), 0L to 4L, 5)
    assert(r(0L) == (1000000L, 0L))
    (1L to 4L).foreach(l => assert(r(l) == (0L, 1000000L)))
  }

  test("hits: L-infinity pin — every step's best hub and authority sit at exactly 1e6") {
    val edges = Seq(0L -> 1L, 0L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 0L)
    val r = runHits(edges, 0L to 3L, 7)
    assert(r.values.map(_._1).max == 1000000L)
    assert(r.values.map(_._2).max == 1000000L)
  }

  test("hits: co-citation asymmetry — the directory page out-scores an equally-linked content page as hub") {
    // 0 and 1 both point at authorities 2,3; 0 additionally points at 4
    // which 2,3 also endorse... keep it simple: 0 covers BOTH popular
    // targets, 1 only one — 0 must be the stronger hub
    val edges = Seq(0L -> 2L, 0L -> 3L, 1L -> 2L, 4L -> 2L, 4L -> 3L)
    val r = runHits(edges, 0L to 4L, 6)
    assert(r(0L)._1 > r(1L)._1)
    assert(r(2L)._2 > r(3L)._2)   // 2 has three endorsers, 3 has two
  }

  test("hits: integer fixed point tracks independent double HITS within 2 ppm-per-mille on the declared fixture") {
    val dom = (0L until 100L)
    val edges = dom.flatMap(d => Seq(1L, 2L, 3L).map(k => d -> ((d * d + k) % 100)))
      .distinct
    val got = runHits(edges, dom, 8)
    val exact = hitsExact(edges, dom, 8)
    dom.foreach { n =>
      val (hi, ai) = got(n)
      val (hd, ad) = exact(n)
      assert(math.abs(hi - math.round(hd * 1e6)) <= 2000,
        s"hub($n): integer $hi vs exact ${math.round(hd * 1e6)}")
      assert(math.abs(ai - math.round(ad * 1e6)) <= 2000,
        s"auth($n): integer $ai vs exact ${math.round(ad * 1e6)}")
    }
  }

  test("hits: edges leaving the node set are dropped (induced subgraph)") {
    // 9 is not a node: 0→9 must not leak into 0's hub sum or the max
    val withStray = Seq(0L -> 1L, 0L -> 9L, 2L -> 1L)
    val induced = Seq(0L -> 1L, 2L -> 1L)
    assert(runHits(withStray, 0L to 2L, 4) == runHits(induced, 0L to 2L, 4))
  }

  test("hits: empty induced edge list fails loudly, never divides by zero") {
    val ex = intercept[IllegalArgumentException] {
      runHits(Seq(5L -> 6L), 0L to 2L, 3)   // both endpoints outside
    }
    assert(ex.getMessage.contains("edgeless"))
  }

  test("declared graph_pagerank query: 100 domains, outdeg 3, ranks ordered and mass-bounded") {
    val df = graft.queries.Extensions.graphPagerank(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 100L))
    val total = rows.map(_.getLong(1)).sum
    assert(total <= Scale && total > Scale - 100L * 100L)
    // the d²+k quadratic-residue spread must differentiate the ranks
    assert(rows.map(_.getLong(1)).distinct.length > 10)
  }

  private def runModularity(edges: Seq[(Long, Long)], nodes: Seq[Long],
                            labels: Seq[(Long, Long)]) = {
    import spark.implicits._
    Graph.modularityPpm(edges.toDF("src", "dst"), nodes.toDF("node"),
      labels.toDF("node", "label")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("modularity: two bridged triangles, perfect labeling — closed form 70/196") {
    // triangles {0,1,2} and {3,4,5}, bridge 2–3; m=7, e_c=3, d_c=7 each
    // num = 2·(4·7·3 − 49) = 70; q_ppm = 70e6 div 196 = 357142
    val edges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L,
      3L -> 4L, 3L -> 5L, 4L -> 5L, 2L -> 3L)
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val got = runModularity(edges, 0L to 5L, labels)
    assert(got.toSeq == Seq((0L, 3L, 3L, 7L, 357142L), (1L, 3L, 3L, 7L, 357142L)))
  }

  test("modularity: the all-one-community labeling scores exactly zero") {
    // e_c = m and d_c = 2m make the numerator 4m·m − (2m)² = 0 identically
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L)
    val got = runModularity(edges, 0L to 3L, (0L to 3L).map(_ -> 9L))
    assert(got.toSeq == Seq((9L, 4L, 4L, 8L, 0L)))
  }

  test("modularity: duplicate/reversed raw edges collapse to the simple closure") {
    // same triangle stated 3 ways — m must stay 3, not 9
    val edges = Seq(0L -> 1L, 1L -> 0L, 0L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 0L)
    val got = runModularity(edges, 0L to 2L, (0L to 2L).map(_ -> 0L))
    assert(got.toSeq == Seq((0L, 3L, 3L, 6L, 0L)))
  }

  test("modularity: anti-community labeling (negative numerator) fails loudly") {
    // 4-cycle with alternating labels: zero intra edges, num = −32
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 0L)
    val labels = Seq(0L -> 0L, 2L -> 0L, 1L -> 1L, 3L -> 1L)
    val ex = intercept[IllegalArgumentException] {
      runModularity(edges, 0L to 3L, labels)
    }
    assert(ex.getMessage.contains("negative modularity"))
  }

  test("modularity: empty induced edge set fails loudly, never divides by zero") {
    val ex = intercept[IllegalArgumentException] {
      runModularity(Seq(7L -> 8L), 0L to 2L, (0L to 2L).map(_ -> 0L))
    }
    assert(ex.getMessage.contains("empty undirected edge set"))
  }

  private def runConductance(edges: Seq[(Long, Long)], nodes: Seq[Long],
                             labels: Seq[(Long, Long)]) = {
    import spark.implicits._
    Graph.conductancePpm(edges.toDF("src", "dst"), nodes.toDF("node"),
      labels.toDF("node", "label")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("conductance: two bridged triangles, perfect labeling — closed form 1e6 div 7") {
    // m=7; each community: cut=1 (the bridge), vol=7, min(7, 14−7)=7
    val edges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L,
      3L -> 4L, 3L -> 5L, 4L -> 5L, 2L -> 3L)
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val got = runConductance(edges, 0L to 5L, labels)
    assert(got.toSeq == Seq((0L, 3L, 1L, 7L, 142857L), (1L, 3L, 1L, 7L, 142857L)))
  }

  test("conductance: a cut edge counts toward BOTH endpoint communities") {
    // path 0–1–2 labeled {0},{1},{2}: every edge is cut; middle vol=2
    val edges = Seq(0L -> 1L, 1L -> 2L)
    val labels = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L)
    val got = runConductance(edges, 0L to 2L, labels)
    // ends: cut=1, vol=1, min(1, 3)=1 → 1e6; middle: cut=2, vol=2, min(2,2)=2 → 1e6
    assert(got.toSeq == Seq((0L, 1L, 1L, 1L, 1000000L),
      (1L, 1L, 2L, 2L, 1000000L), (2L, 1L, 1L, 1L, 1000000L)))
  }

  test("conductance: the all-one-community labeling fails loudly (2m − vol = 0)") {
    val edges = Seq(0L -> 1L, 1L -> 2L)
    val ex = intercept[IllegalArgumentException] {
      runConductance(edges, 0L to 2L, (0L to 2L).map(_ -> 0L))
    }
    assert(ex.getMessage.contains("min(vol, 2m−vol)"))
  }

  test("conductance: an edgeless community (isolated node) fails loudly") {
    // node 3 is isolated — its singleton community has vol = 0
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 9L)
    val ex = intercept[IllegalArgumentException] {
      runConductance(edges, 0L to 3L, labels)
    }
    assert(ex.getMessage.contains("min(vol, 2m−vol)"))
  }

  test("declared graph_conductance query: every detected community is sparse-cut (φ < 0.5)") {
    val rows = graft.queries.Extensions
      .graphConductance(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(1)).sum == 100L)   // n_nodes partitions the nodes
    val phis = rows.map(_.getLong(4))
    assert(phis.forall(p => p > 0L && p < 500000L),
      s"blocks-of-10 cuts should be sparse but positive (bridges exist): ${phis.mkString(",")}")
  }

  test("declared graph_modularity query: bridged blocks-of-10 score high, labels cover all nodes") {
    val rows = graft.queries.Extensions
      .graphModularity(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(1)).sum == 100L)      // n_nodes partitions the 100 nodes
    val q = rows.map(_.getLong(4)).distinct
    assert(q.length == 1 && q.head > 700000L,        // strong community structure
      s"blocks-of-10 modularity should exceed 0.7, got ${q.head} ppm")
  }

  private def predict(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      cap: Long): Map[(Long, Long), (Long, Long, Long, Long)] = {
    import spark.implicits._
    Graph.linkPredict(edges.toDF("src", "dst"), nodes.toDF("node"), cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("linkPredict path graph: only the two distance-2 pairs, closed-form scores") {
    // 0-1-2-3: candidates (0,2) via 1 and (1,3) via 2; (0,3) shares no
    // neighbor. jaccard = 1e6·1 DIV (1+2-1) = 500000, RA = 1e6 DIV
    // d(center)=2 = 500000, PA = 1·2 = 2.
    val p = predict(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L), 0L to 3L, 10L)
    assert(p == Map((0L, 2L) -> ((1L, 500000L, 500000L, 2L)),
      (1L, 3L) -> ((1L, 500000L, 500000L, 2L))))
  }

  test("linkPredict never re-predicts an existing edge") {
    // triangle 0-1-2 plus pendant 3-0: (1,2) are adjacent WITH a common
    // neighbor — must not surface; (1,3) and (2,3) via center 0 must.
    val p = predict(Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 0L -> 3L), 0L to 3L, 10L)
    assert(!p.contains((1L, 2L)))
    // d(1)=d(2)=2, d(3)=1: jaccard = 1e6 DIV (2+1-1) = 500000,
    // RA = 1e6 DIV d(0)=3 = 333333, PA = 2
    assert(p == Map((1L, 3L) -> ((1L, 500000L, 333333L, 2L)),
      (2L, 3L) -> ((1L, 500000L, 333333L, 2L))))
  }

  test("linkPredict center cap: an over-cap hub yields no wedges; true degrees still score") {
    val star = (1L to 5L).map(l => 0L -> l)
    // cap below the hub degree (5): the only wedge center is excluded
    assert(predict(star, 0L to 5L, 3L).isEmpty)
    // cap admits the hub: all C(5,2) leaf pairs, jaccard = 1e6·1 DIV 1,
    // RA = 1e6 DIV 5 (the RA downweighting of a promiscuous center)
    val open = predict(star, 0L to 5L, 10L)
    assert(open.size == 10 && open.values.forall(_ == ((1L, 1000000L, 200000L, 1L))))
    // a second edge to one leaf pair keeps TRUE degree in the score:
    // leaves 1,2 joined directly — excluded as existing; (1,3) now has
    // d(1)=2 so jaccard = 1e6 DIV (2+1-1) = 500000
    val p2 = predict(star :+ (1L -> 2L), 0L to 5L, 10L)
    assert(!p2.contains((1L, 2L)))
    assert(p2((1L, 3L)) == ((1L, 500000L, 200000L, 2L)))
  }

  test("linkPredict canonicalizes duplicate/directed input edges (common counted once)") {
    val p = predict(Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 1L -> 2L), 0L to 2L, 10L)
    assert(p == Map((0L, 2L) -> ((1L, 1000000L, 500000L, 1L))))
  }
}
