"""Topic modeling: a DataFrame -> DataFrame multi-stage job.

The reference's one non-elementwise operator
(/root/reference/src/topic_modeling/, registered with
``is_elementwise=False`` at polars_text/functions.py:222). Stage
mapping per SURVEY.md §2.3: chunk + embed run distributed; the
dimensionality reduction + density clustering run driver-side on the
collected (n_chunks x dim) float matrix (the documented scale ceiling,
same as the reference's single-process ceiling); c-TF-IDF, rollup and
coordinates are Spark aggregations; results join back 1:1 on a row id.
"""

from polars_text_spark.operators.topic_modeling.pipeline import (
    assemble_topics,
    topic_modeling,
)

__all__ = ["assemble_topics", "topic_modeling"]
