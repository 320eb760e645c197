package graft.ops

import graft.T
import graft.T.{Q, q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-V (round 9) — training-data pipeline depth: the operators a
  * production LLM corpus pipeline runs between dedup and export (sliding
  * context chunking, deterministic dataset splits, benchmark
  * decontamination), plus robust/interpolated statistics the relational
  * surface was still missing.
  *
  * Determinism rules follow §2-T/U: exact integers wherever possible, every
  * float boundary is a single IEEE op on bit-identical operands, ranks break
  * ties on ids, integer aggregates are CAST AS BIGINT in the oracle (no
  * HUGEINT reaches an output column).
  */
object GroupNine {

  val defs: Seq[Q] = Seq(

    // Sliding-window context chunking — the RAG/embedding prep step: each
    // document's token stream is cut into windows of 64 tokens advancing
    // by a 48-token stride (16-token overlap), the shape every retrieval
    // index and long-context packer ingests. Pure per-row generator
    // (split → stride sequence → posexplode → slice): no shuffle before
    // the final presentation sort, so at 100 TB it is one scan-shaped
    // map stage that parallelizes with the input splits.
    q("text_chunk_sliding",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |c0 AS (SELECT doc_id, toks, n,
        |    unnest(range(0, CAST(n AS BIGINT), 48)) AS st FROM d),
        |c AS (SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
        |    CAST(st AS BIGINT) AS st, toks, n FROM c0)
        |SELECT doc_id, chunk_idx,
        |  CAST(least(n - st, 64) AS BIGINT) AS n_tok,
        |  toks[CAST(st + 1 AS INT)] AS first_tok,
        |  toks[CAST(least(st + 64, n) AS INT)] AS last_tok
        |FROM c ORDER BY doc_id, chunk_idx""") { (s, dir) =>
      val d = T.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
      d.select(col("doc_id"), col("toks"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1, lit(48)))
            .as(Seq("chunk_idx", "st")))
        .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
          least(col("n") - col("st"), lit(64)).cast(LongType).as("n_tok"),
          element_at(col("toks"), col("st") + 1).as("first_tok"),
          element_at(col("toks"), least(col("st") + 64, col("n")))
            .as("last_tok"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Deterministic train/valid/test split — the dataset-assignment step of
    // every training run: poly_hash(doc_id) mod 100 gates each doc into
    // 80/10/10 splits. Like pipeline_mixture_sample, the gate is the
    // engine-portable polynomial hash (not rand()), so the assignment is
    // reproducible across engines, partitionings and reruns — the property
    // that makes a split auditable. One scan + one small agg; the split
    // column is a stateless scan-level expression at any scale.
    q("pipeline_dataset_split",
      """WITH d AS (SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS toks,
        |    CAST(doc_id AS VARCHAR) AS ds FROM documents),
        |h AS (SELECT lang, toks, (list_reduce(
        |    list_concat([CAST(0 AS HUGEINT)],
        |      list_transform(range(length(ds)),
        |        i -> CAST(ascii(substr(ds, CAST(i+1 AS INT), 1)) AS HUGEINT))),
        |    (hh, c) -> (hh * 257 + c) % CAST(2305843009213693951 AS HUGEINT)
        |  ) * CAST(1181783497276652981 AS HUGEINT) + 1)
        |    % CAST(2305843009213693951 AS HUGEINT) % 100 AS bucket
        |  FROM d)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      T.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
        .withColumn("bucket",
          call_function("poly_hash", col("doc_id").cast(StringType)) % 100L)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "valid").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        .orderBy("split", "lang")
    },

    // Benchmark decontamination — the train/eval overlap scrub every
    // serious training corpus runs: an eval set (here docs with
    // doc_id % 97 = 0) is shingled into 5-token n-grams
    // (fixture docs are short — real pipelines use 8-13-gram windows; the
    // shape is identical) and any corpus
    // doc sharing a shingle is flagged, with the count of distinct eval
    // docs it collides with. The eval side is benchmark-sized (small by
    // construction), so its distinct (shingle, eval_id) set BROADCASTs
    // and the corpus side stays one scan + generator — the exact
    // production shape: 100 TB of corpus streams past a few MB of eval
    // shingles, no shuffle of the big side.
    q("pipeline_decontaminate",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |    range(len(arr) - 4),
        |    i -> array_to_string(arr[CAST(i+1 AS INT):CAST(i+5 AS INT)], ' ')
        |  )) AS sh FROM d WHERE len(arr) >= 5)
        |SELECT c.doc_id, CAST(count(DISTINCT e.doc_id) AS BIGINT)
        |    AS n_eval_overlap
        |FROM sh c JOIN sh e ON c.sh = e.sh
        |WHERE e.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      def shingled(df: DataFrame): DataFrame = df
        .select(col("doc_id"), split(col("text"), " ").as("arr"))
        .withColumn("n", size(col("arr")))
        .where(col("n") >= 5)
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n") - 5)).as("i"), col("arr"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("arr"), col("i") + 1, lit(5))).as("sh"))
        .distinct()
      val docs = T.t(s, dir, "documents")
      val corpus = shingled(docs.where(col("doc_id") % 97 =!= 0))
      val eval = shingled(docs.where(col("doc_id") % 97 === 0))
        .withColumnRenamed("doc_id", "eval_id")
      corpus.join(broadcast(eval), "sh")
        .groupBy("doc_id")
        .agg(countDistinct(col("eval_id")).as("n_eval_overlap"))
        .orderBy("doc_id")
    }
  )
}
