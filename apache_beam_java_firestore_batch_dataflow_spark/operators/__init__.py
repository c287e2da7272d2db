"""Operator library: DataFrame -> DataFrame transforms.

Every operator is a pure function over DataFrames (composable with
``df.transform``), mirroring the reference's ``PTransform`` composition
(``WordCount.java:96-110``) without its row-at-a-time execution model.
"""

from .wordcount import count_words, extract_words, format_as_text, word_count_pipeline

__all__ = [
    "count_words",
    "extract_words",
    "format_as_text",
    "word_count_pipeline",
]
