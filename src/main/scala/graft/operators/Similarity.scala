package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Portable => P, PortableSql => PS}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over `embeddings` (SURVEY §2g): exact brute-force
  * top-k as the baseline, SRP-LSH bucketed ANN as the scale path, and
  * IVF-style per-label cell statistics.
  *
  * Scale notes: brute-force broadcasts the (small) query set and streams
  * the corpus — one scan, no shuffle of the big side, native codegen'd
  * cosine in the inner loop. The LSH variant prunes candidates to matching
  * buckets before scoring. Pair stats aggregate exploded vectors keyed by
  * (label, dim) — partial aggregation keeps the shuffle at cell
  * cardinality, the IVF design point.
  */
object Similarity {

  val NumQueries = 10
  val TopK = 5
  val LshPlanes = 4
  val LshTopK = 3

  /** Exact cosine top-k per query vector (query set: vec_id < 10). */
  val bruteforce = QueryDef(
    "sim_bruteforce_topk",
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
       |    WHERE vec_id < $NumQueries),
       |sc AS MATERIALIZED (SELECT q_id, vec_id,
       |    list_cosine_similarity(CAST(qe AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS cos
       |  FROM q, embeddings WHERE vec_id <> q_id),
       |rk AS MATERIALIZED (SELECT q_id, vec_id, ${PS.prnd("cos", 6)} AS cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY ${PS.prnd("cos", 6)} DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT q_id, vec_id, cosine, rank FROM rk WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"q_id").orderBy(P.prnd($"cos", 6).desc, $"vec_id")
    emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", expr("graft_cosine(qe, embedding)").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"vec_id", P.prnd($"cos", 6).as("cosine"), $"rank")
      .orderBy($"q_id", $"rank")
  }

  /** SRP-LSH bucketed ANN top-k: candidates share the 4-plane bucket. */
  val lshTopk = QueryDef(
    "sim_lsh_topk",
    s"""WITH ${Srp.bandKeysSql(LshPlanes, LshPlanes)},
       |q AS MATERIALIZED (SELECT vec_id AS q_id, bkey FROM srp_bk WHERE vec_id < $NumQueries),
       |cand AS (SELECT q.q_id, b.vec_id FROM q JOIN srp_bk b ON b.bkey = q.bkey
       |  WHERE b.vec_id <> q.q_id),
       |sc AS MATERIALIZED (SELECT c.q_id, c.vec_id,
       |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |      CAST(ce.embedding AS DOUBLE[])) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.q_id
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
       |rk AS MATERIALIZED (SELECT q_id, vec_id, ${PS.prnd("cos", 6)} AS cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY ${PS.prnd("cos", 6)} DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT q_id, vec_id, cosine, rank FROM rk WHERE rank <= $LshTopK
       |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // eager localCheckpoint: materialized once for the q/candidate reads,
    // blocks self-clean on GC (persist() would leak without an unpersist
    // handle for composing callers)
    val bk = Srp.bandKeys(emb, LshPlanes, LshPlanes).select($"vec_id", $"bkey")
      .localCheckpoint(true)
    val q = bk.filter($"vec_id" < NumQueries).select($"vec_id".as("q_id"), $"bkey")
    val cand = q.join(bk, "bkey").filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id")
    val w = Window.partitionBy($"q_id").orderBy(P.prnd($"cos", 6).desc, $"vec_id")
    cand
      .join(emb.select($"vec_id".as("q_id"), $"embedding".as("qe")), "q_id")
      .join(emb.select($"vec_id", $"embedding".as("ce")), "vec_id")
      .select($"q_id", $"vec_id", expr("graft_cosine(qe, ce)").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= LshTopK)
      .select($"q_id", $"vec_id", P.prnd($"cos", 6).as("cosine"), $"rank")
      .orderBy($"q_id", $"rank")
  }

  /** IVF-style cell stats: per-label centroid norm + mean cosine of the
    * label's vectors to their centroid. Exact decimal sums keep every
    * aggregate deterministic across engines.
    */
  val pairStats = QueryDef(
    "sim_pair_stats",
    s"""WITH expl AS MATERIALIZED (SELECT vec_id, label, generate_subscripts(embedding, 1) AS j,
      |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
      |cn AS MATERIALIZED (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
      |cent AS MATERIALIZED (SELECT label, j,
      |    CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
      |  FROM expl GROUP BY label, j),
      |parts AS MATERIALIZED (SELECT e.vec_id, e.label,
      |    CAST(SUM(CAST(e.x * c.c AS DECIMAL(18,12))) AS DOUBLE) AS dot,
      |    CAST(SUM(CAST(e.x * e.x AS DECIMAL(18,12))) AS DOUBLE) AS nx
      |  FROM expl e JOIN cent c ON c.label = e.label AND c.j = e.j
      |  GROUP BY e.vec_id, e.label),
      |cnorm AS MATERIALIZED (SELECT label, CAST(SUM(CAST(c * c AS DECIMAL(18,12))) AS DOUBLE) AS ny
      |  FROM cent GROUP BY label),
      |cosv AS MATERIALIZED (SELECT p.label, p.vec_id, p.dot / sqrt(p.nx * cn2.ny) AS cos
      |  FROM parts p JOIN cnorm cn2 USING (label))
      |SELECT v.label, cn.n AS n_vectors,
      |  ${PS.prnd("sqrt(cn2.ny)", 6)} AS centroid_norm,
      |  ${PS.prnd("CAST(SUM(CAST(v.cos AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)", 6)} AS mean_cos
      |FROM cosv v JOIN cn USING (label) JOIN cnorm cn2 USING (label)
      |GROUP BY v.label, cn.n, cn2.ny
      |ORDER BY label""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val expl = emb.select($"vec_id", $"label", posexplode($"embedding").as(Seq("j0", "x0")))
      .select($"vec_id", $"label", ($"j0" + 1).as("j"), $"x0".cast("double").as("x"))
      .localCheckpoint(true)
    val cn = emb.groupBy($"label").agg(P.cnt.as("n"))
    val cent = expl.groupBy($"label", $"j")
      .agg((sum($"x".cast(DecimalType(18, 9))).cast("double") / count(lit(1))).as("c"))
      .localCheckpoint(true)
    val parts = expl.join(cent, Seq("label", "j"))
      .groupBy($"vec_id", $"label")
      .agg(sum(($"x" * $"c").cast(DecimalType(18, 12))).cast("double").as("dot"),
        sum(($"x" * $"x").cast(DecimalType(18, 12))).cast("double").as("nx"))
    val cnorm = cent.groupBy($"label")
      .agg(sum(($"c" * $"c").cast(DecimalType(18, 12))).cast("double").as("ny"))
    val cosv = parts.join(cnorm, "label")
      .select($"label", $"vec_id", ($"dot" / sqrt($"nx" * $"ny")).as("cos"))
    cosv.groupBy($"label")
      .agg((sum($"cos".cast(DecimalType(18, 9))).cast("double") / count(lit(1))).as("mean_raw"))
      .join(cn, "label").join(cnorm, "label")
      .select($"label", $"n".as("n_vectors"),
        P.prnd(sqrt($"ny"), 6).as("centroid_norm"),
        P.prnd($"mean_raw", 6).as("mean_cos"))
      .orderBy($"label")
  }

  val defs: Seq[QueryDef] = Seq(bruteforce, lshTopk, pairStats)
}
