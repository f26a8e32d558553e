package graft.queries

import org.apache.spark.sql.functions._
import graft.core.GraftSession.table
import graft.core.{MLSchema, MLType}
import graft.processor.{DataPipeline, PipelineConfig}

/** Pipeline-orchestration corpus (SURVEY.md §2.11, §3.2): YAML config →
  * registry resolution → column-pattern matching (regex AND MLType patterns)
  * → schema propagation → one fused lazy plan, verified end-to-end.
  */
object PipelineQueries {

  private val docSchema = MLSchema(Map(
    "doc_id" -> MLType.Index,
    "text" -> MLType.Text,
    "lang" -> MLType.Categorical,
    "source" -> MLType.Categorical,
    "n_chars" -> MLType.Int))

  /** Full config-driven pipeline: an MLType pattern (`categorical`) fans one
    * step over [lang, source]; `{col_name}` templating names outputs; the
    * fitted LabelEncoding is the same distributed fit as q33. All steps fuse
    * into a single projection over the scan (no shuffle except the fit).
    */
  val q39_pipeline_e2e: Q = Q(
    fn = (s, dir) => {
      val yaml =
        """pipeline:
          |  - input: [text]
          |    transformer: CaseTransformation
          |    params: {case: upper}
          |    output: "{col_name}_uc"
          |  - input: [categorical]
          |    transformer: LabelAffix
          |    params: {prefix: "c:"}
          |    output: "{col_name}_tag"
          |  - input: [lang]
          |    transformer: LabelEncoding
          |    output: "{col_name}_enc"
          |""".stripMargin
      val pipe = new DataPipeline(PipelineConfig.fromYaml(yaml))
      val docs = table(s, dir, "documents")
      pipe.fitTransform(docs, docSchema)
        .select(
          col("doc_id"),
          substring(col("text_uc"), 1, 40).as("text_uc40"),
          col("lang_tag"),
          col("source_tag"),
          col("lang_enc"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH enc AS (
        SELECT lang AS l, row_number() OVER (ORDER BY lang) AS code
        FROM (SELECT DISTINCT lang FROM documents))
      SELECT doc_id,
             substr(upper(text), 1, 40) AS text_uc40,
             'c:' || lang AS lang_tag,
             'c:' || source AS source_tag,
             CASE WHEN lang IS NULL THEN NULL ELSE enc.code END AS lang_enc
      -- LEFT join: the engine keeps null-lang rows (LabelAffix/LabelEncoding
      -- pass null through); an inner join would drop them
      FROM documents LEFT JOIN enc ON documents.lang = enc.l
      ORDER BY doc_id"""))

  /** missing_column_behavior=SKIP (`_DataProcessor.py:11-30`): LabelEncoding
    * declared on an absent column is silently skipped (the inference-time
    * regime); remaining steps still run.
    */
  val q40_pipeline_missing_skip: Q = Q(
    fn = (s, dir) => {
      val yaml =
        """pipeline:
          |  - input: [ground_truth_label]
          |    transformer: LabelEncoding
          |    output: "{col_name}_enc"
          |  - input: [text]
          |    transformer: CaseTransformation
          |    params: {case: lower}
          |    output: "text_lc"
          |""".stripMargin
      val pipe = new DataPipeline(PipelineConfig.fromYaml(yaml))
      val docs = table(s, dir, "documents")
      val out = pipe.fitTransform(docs, docSchema)
      require(!out.columns.contains("ground_truth_label_enc"), "skip step must not add a column")
      out.select(col("doc_id"), substring(col("text_lc"), 1, 30).as("text_lc30"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      SELECT doc_id, substr(lower(text), 1, 30) AS text_lc30
      FROM documents
      ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "q39_pipeline_e2e" -> q39_pipeline_e2e,
    "q40_pipeline_missing_skip" -> q40_pipeline_missing_skip)
}
