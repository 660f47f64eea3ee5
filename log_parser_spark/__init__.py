"""tokenlog-spark: a PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the capabilities of pppoudel/log-parser (AWK/shell
log parse-analyze-report scripts) as an idiomatic Spark parse -> enrich ->
route -> aggregate pipeline over tables of pre-tokenized sequences
(doc_id string, tokens array<int32>, n_tok int32, source string).

Not a port: the reference tells us WHAT to compute (see SURVEY.md); the HOW
is DataFrame/SQL + Catalyst, with vectorized Arrow/pandas UDFs only for the
detokenize+grok kernel that built-in functions cannot express.
"""

__version__ = "0.1.0"
