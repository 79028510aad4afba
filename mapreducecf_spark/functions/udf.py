"""User-extensible function surface — the registration path the
reference lacks entirely (its README's extension story is "edit the
proto and the Driver class", ``README.md:86-92``, i.e. modify the
engine). Spark's is ``spark.udf.register`` and the function is
immediately callable from SQL, DataFrame code, and every connector.

Scale note: a Python UDF — even Arrow-vectorized — is the SLOW path
(ser/de + a Python worker per task); the engine's production answer to
THIS function is the JVM-side higher-order expression in
``queries.text.text_doc_token_stats``. The UDF exists to grade the
extensibility surface itself, with the same reference tokenizer
semantics (T1-T3+F1, ``client.py:16-21``) so the DuckDB oracle checks
it exactly.

The ``pandas_udf`` object is built lazily inside ``register_udfs``:
the decorator parses its DDL return type through the ACTIVE session,
so a module-level UDF would make importing this module crash before
any SparkSession exists (the driver imports the registry sessionless).
"""

import re

import pandas as pd
from pyspark.sql import SparkSession

# the reference's ASCII punctuation class (client.py:17) — kept in sync
# with operators.wordcount.ASCII_PUNCT_CLASS
_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")
_SPACES = re.compile(r" +")
_NONWS = re.compile(r"\S")


def _count_tokens(text):
    if text is None:
        return None
    stripped = _PUNCT.sub("", text)
    return sum(1 for t in _SPACES.split(stripped) if _NONWS.search(t))


def make_py_token_count():
    """Arrow-batched token counter with reference-tokenizer semantics:
    punct delete (not replace), split on runs of spaces only, keep
    tokens containing any non-whitespace."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def py_token_count(texts: pd.Series) -> pd.Series:
        return texts.map(_count_tokens)

    return py_token_count


def make_py_rms():
    """Grouped-aggregate (UDAF) surface: root-mean-square over a
    group's values, one Arrow batch per group (PandasUDFType
    GROUPED_AGG — usable in ``GROUP BY`` SQL and ``agg()``)."""
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def py_rms(values: pd.Series) -> float:
        # fsum: exact summation, so the result is independent of the
        # (nondeterministic) order group rows arrive from the shuffle —
        # a float .mean() here could flip the round-6 digit run-to-run
        v = values.astype(float)
        return math.sqrt(math.fsum(v * v) / len(v))

    return py_rms


def make_py_tokenize():
    """Table-function (UDTF) surface: one (pos, token) row per token,
    reference-tokenizer semantics — invoked in FROM with LATERAL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class PyTokenize:
        def eval(self, text: str):
            if text is None:
                return
            stripped = _PUNCT.sub("", text)
            pos = 0
            for t in _SPACES.split(stripped):
                if _NONWS.search(t):
                    pos += 1
                    yield pos, t

    return PyTokenize


def register_udfs(spark: SparkSession) -> None:
    """Make the extension functions available to SQL ( SELECT
    py_token_count(text) ... ) — idempotent."""
    spark.udf.register("py_token_count", make_py_token_count())
    spark.udf.register("py_rms", make_py_rms())
    spark.udtf.register("py_tokenize", make_py_tokenize())
