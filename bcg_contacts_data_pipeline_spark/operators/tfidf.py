"""TF-IDF term ranking over a document corpus (SURVEY §7.1 module 7's
'text analysis (tokenize/tf-idf)' item).

Corpus-level statistics the expression-only text library can't produce:
document frequency needs an inverted index (explode + two aggregations),
and the corpus size N joins in as a broadcast scalar — NO driver collect,
so the operator composes lazily into larger plans and scales.

Shuffle shape at 100 TB: one shuffle on (doc, term) for tf, one on term
for df (both partial-aggregatable), one join of df back onto tf, and one
window shuffle on doc for the top-k rank. The df join is deliberately
UNHINTED: a scraped corpus's vocabulary (typos, URLs, junk tokens) is
unbounded — hundreds of millions of terms at 100 TB — so a forced
broadcast would OOM the driver. AQE broadcast-converts the join at
runtime when the measured df size is under the threshold, and falls back
to a sort-merge join on `term` when it isn't; both plans are correct.
The only forced broadcast is the one-row corpus-count scalar.

Determinism for oracle parity: tfidf is rounded to 6 decimals BEFORE
ranking — ln() differs by ≤1 ulp between libm implementations, and
ranking on the rounded value makes the order (and the emitted score)
engine-exact; ties break on the term string, making the top-k total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.functions.text import tokens


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf with idf = ln(N/df).

    Returns (id, term, tf, df, tfidf, rank); documents with no tokens
    produce no rows. Plain tf (term occurrence count) — corpus ranking
    only needs monotonicity, and the unnormalized form keeps every
    intermediate an exact integer until the single ln().
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank"))
    )
