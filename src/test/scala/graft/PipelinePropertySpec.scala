package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{MLSchema, MLType}
import graft.processor.{DataPipeline, PipelineConfig, StepConfig}

/** Randomized orchestration differential: a generated sequence of text
  * processor steps is serialized to YAML, parsed back, fitted and applied
  * through the DataPipeline — and the result must equal applying the same
  * transforms directly, in order, on the driver. This pins the pipeline
  * WIRING (config parsing, column-pattern matching, output templating,
  * step ordering) against the processors it orchestrates, on a fresh
  * random pipeline every run.
  */
class PipelinePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._

  import PropertyTestKit.sampled

  private val pythonPunct = """!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"""

  // driver mirror of each step, applied to a plain Scala string
  private def mirror(step: StepConfig): String => String = step.transformer match {
    case "CaseTransformation" =>
      if (step.params.get("case").map(_.toString).getOrElse("lower") == "upper") _.toUpperCase
      else _.toLowerCase
    case "HtmlTagRemoval" => _.replaceAll("<.*?>", "")
    case "PunctuationCleaner" =>
      val r = step.params.get("replacement_char").map(_.toString).getOrElse(" ").head
      s => s.map(c => if (pythonPunct.contains(c)) r else c)
    case "StringRemoval" =>
      val rem = step.params("removal_list").asInstanceOf[Seq[String]]
      s => rem.foldLeft(s)((acc, x) => acc.replace(x, ""))
    case other => throw new IllegalArgumentException(other)
  }

  test("yaml-configured pipeline equals direct in-order application") {
    import org.scalacheck.Gen
    val stepGen: Gen[StepConfig] = Gen.oneOf(
      Gen.oneOf("lower", "upper").map(m =>
        StepConfig(Seq("txt"), "CaseTransformation", Map("case" -> m), "{col_name}")),
      Gen.const(StepConfig(Seq("txt"), "HtmlTagRemoval", Map.empty, "{col_name}")),
      Gen.oneOf(" ", "_").map(r =>
        StepConfig(Seq("txt"), "PunctuationCleaner", Map("replacement_char" -> r), "{col_name}")),
      Gen.someOf(Seq("foo", "bar", "the")).suchThat(_.nonEmpty).map(rs =>
        StepConfig(Seq("txt"), "StringRemoval", Map("removal_list" -> rs.toSeq), "{col_name}")))
    val docs = Seq(
      "The <b>Quick</b> foo, bar; the end!",
      "plain text",
      "punct!!! <i>heavy</i>: (stuff)... the foo",
      "MiXeD CaSe <div>bar</div> the_foo-bar",
      "").zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (trial <- 1 to 3) {
      val steps = Seq.fill(sampled(Gen.chooseNum(1, 5)))(sampled(stepGen))
      val yaml = PipelineConfig.toYaml(PipelineConfig(steps, Nil))
      val parsed = PipelineConfig.fromYaml(yaml)
      // stringly params survive the YAML trip; re-typed list params do too
      val pipe = new DataPipeline(parsed)
      val schema = MLSchema(Map("txt" -> MLType.Text))
      val df = docs.toDF("id", "txt")
      pipe.fit(df, schema)
      val got = pipe.transform(df, schema)
        .select(col("id"), col("txt")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val mirrors = parsed.steps.map(mirror)
      docs.foreach { case (id, t) =>
        val want = mirrors.foldLeft(t)((acc, f) => f(acc))
        assert(got(id) == want, s"trial $trial doc $id: '${got(id)}' vs '$want'")
      }
    }
  }

  test("MLType pattern matching and {col_name} templating route steps correctly") {
    // input pattern "text" (an MLType name) must match the TEXT column
    // only; the templated output writes a NEW column per input
    val cfg = PipelineConfig(Seq(
      StepConfig(Seq("text"), "CaseTransformation", Map("case" -> "upper"), "{col_name}_up")), Nil)
    val df = Seq((1L, "abc", "keep")).toDF("id", "t1", "cat")
    val schema = MLSchema(Map("t1" -> MLType.Text, "cat" -> MLType.Categorical))
    val pipe = new DataPipeline(cfg).fit(df, schema)
    val out = pipe.transform(df, schema)
    assert(out.columns.toSet == Set("id", "t1", "cat", "t1_up"))
    val row = out.head()
    assert(row.getAs[String]("t1_up") == "ABC")
    assert(row.getAs[String]("t1") == "abc", "templated output must not clobber the input")
    assert(row.getAs[String]("cat") == "keep", "categorical column must not match 'text'")
  }
}
