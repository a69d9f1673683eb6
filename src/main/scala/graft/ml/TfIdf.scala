package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
import org.apache.spark.sql.DataFrame

/** TF-IDF featurization pipeline — reference M1-M5 (Predictor.scala:
  * 106-149) parameterized: per text column, tokenize → stopword-filter →
  * HashingTF(dim) → IDF. The reference hardcodes dim=10000 and fits on
  * abstract+title; callers pick columns and dim.
  */
object TfIdf {

  /** Stages for one text column: `col` → `col_tokens_raw` →
    * `col_tokens_clean`; the last listed column feeds TF-IDF. */
  def build(textCol: String, dim: Int = 10000,
      stopwords: Array[String] = StopWordsRemover.loadDefaultStopWords("english"))
      : Pipeline = {
    val tok = new Tokenizer()
      .setInputCol(textCol).setOutputCol(s"${textCol}_tokens_raw")
    val stop = new StopWordsRemover()
      .setStopWords(stopwords)
      .setInputCol(s"${textCol}_tokens_raw")
      .setOutputCol(s"${textCol}_tokens_clean")
    val tf = new HashingTF()
      .setNumFeatures(dim)
      .setInputCol(s"${textCol}_tokens_clean")
      .setOutputCol(s"${textCol}_tf")
    val idf = new IDF()
      .setInputCol(s"${textCol}_tf").setOutputCol(s"${textCol}_tf_idf")
    new Pipeline().setStages(Array(tok, stop, tf, idf))
  }

  def fitTransform(df: DataFrame, textCol: String, dim: Int = 10000)
      : (PipelineModel, DataFrame) = {
    val model = build(textCol, dim).fit(df)
    (model, model.transform(df))
  }
}
