"""Scalar text-statistic column functions (mirrors the per-document kernels
of graft.llm.TextStats as pyspark ``Column`` expressions).

These are the building blocks of corpus-level reports: compose them under
ordinary pyspark ``groupBy``/``agg``::

    from graft import text
    report = (docs
        .select("source",
                text.token_count("text").alias("nt"),
                text.bpe_token_count("text").alias("nb"),
                text.lang_id("text").alias("lang"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("nt").alias("n_tokens"),
             F.sum("nb").alias("n_bpe_tokens"),
             F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
              .alias("n_en")))

Each function accepts a column name or a pyspark ``Column`` and returns a
``Column`` backed by the engine's single-pass JVM kernel (codegen'd — no
Python UDF, no row shipping).
"""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# The JVM-handle Column constructor moved to pyspark.sql.classic.column in
# PySpark 4 (classic, non-Connect mode — the only mode that can wrap a raw
# JVM Column, which these kernel bindings require). Fall back to the
# pre-4.0 location so the module imports on 3.5 too.
try:
    from pyspark.sql.classic.column import Column
except ImportError:  # PySpark < 4.0
    from pyspark.sql.column import Column

__all__ = ["lang_id", "quality_score", "token_count", "bpe_token_count",
           "strip_markup", "normalize_for_dedup", "encoding_stats",
           "encoding_keep", "gopher_stats"]


def _jcol(col):
    if isinstance(col, str):
        col = F.col(col)
    return col._jc


def _api():
    return SparkSession.getActiveSession()._jvm.graft.python.PyApi


def lang_id(text):
    """Heuristic language id ('en'/'es'/'de'/'fr'/'zh') from stopword and
    script n-gram evidence — one kernel pass per row."""
    return Column(_api().langIdCol(_jcol(text)))


def quality_score(text):
    """Composite document quality score (length / punctuation / stopword
    ratios), as used by select_top_by_budget recipes."""
    return Column(_api().qualityScoreCol(_jcol(text)))


def token_count(text):
    """Whitespace token count (int)."""
    return Column(_api().tokenCountCol(_jcol(text)))


def bpe_token_count(text):
    """BPE-ish token count: runs of letters, runs of digits, single other
    non-space chars (int)."""
    return Column(_api().bpeTokenCountCol(_jcol(text)))


def strip_markup(text):
    """WET-style markup-to-text extraction: drop script/style blocks,
    strip tags to spaces, decode the six standard entities, collapse
    whitespace — one kernel scan (string)."""
    return Column(_api().stripMarkupCol(_jcol(text)))


def normalize_for_dedup(text):
    """CCNet-style ASCII canonicalization for near-exact dedup: case
    fold, digits 1-9 to '0', punctuation removed, whitespace collapsed
    and trimmed; non-ASCII passes through — one kernel scan (string).
    Hash the result (or group by it) to catch case/punctuation/number
    variants raw exact dedup misses."""
    return Column(_api().normalizeForDedupCol(_jcol(text)))


def encoding_stats(text):
    """Encoding-quality counters struct ``(n_chars, n_replacement,
    n_control)`` — code points, U+FFFD chars, disallowed control chars."""
    return Column(_api().encodingStatsCol(_jcol(text)))


def encoding_keep(text, max_bad_per_mille=1):
    """True when bad chars (replacement + control) are at most
    ``max_bad_per_mille`` per 1000 chars — integer arithmetic (bool)."""
    return Column(_api().encodingKeepCol(_jcol(text), max_bad_per_mille))


def gopher_stats(text):
    """Gopher quality counters struct ``(n_words, n_alpha_words,
    n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines)`` in one scan;
    see also ``TimeSeriesDataFrame.gopher_filter`` for the rule flags."""
    return Column(_api().gopherStatsCol(_jcol(text)))
