"""Python UDTF surface (SURVEY.md §2 Tier B "UDF/UDAF/UDTF" row).

``NgramExploder`` is a table function: one document row in → one row per
word n-gram out, with positions.  Registered for SQL use
(``SELECT * FROM ngrams(TABLE(...))``-style lateral joins) and usable from
the DataFrame API.  UDTFs run row-at-a-time in Python — appropriate for
1-to-many expansion logic with nontrivial control flow; for pure column math
prefer the codegen expressions in functions/.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram string, start_pos int, n int")
class NgramExploder:
    """Explode a text into word n-grams with token positions."""

    def eval(self, text: str, n: int = 2):  # noqa: D102
        if not text:
            return
        words = text.split()
        for i in range(max(len(words) - n + 1, 0)):
            yield (" ".join(words[i : i + n]), i, n)


def register_udtfs(spark) -> None:
    spark.udtf.register("ngrams", NgramExploder)
