"""Compiled grok/regex patterns for the four log families.

Each pattern re-expresses a reference parser's field-extraction logic
(SURVEY.md §2.2). Patterns are written in the common RE2-compatible subset
(no backrefs/lookaround) so the SAME pattern string runs in:
  - Python `re` / pandas `.str.extract`  (the Arrow-batched parse kernel),
  - Spark `regexp_extract` (JVM, codegen)  for cheap pre-parse gates,
  - DuckDB `regexp_extract` (RE2)          for the independent SQL oracle.

Family detection anchors (cheap, run before the expensive extract):
  gc        ISO8601 timestamp prefix        javaGCStatsParser.sh:232-239
  was       [M/D/YY H:MM:SS:mmm TZ] prefix  websphereLogParser.sh:130-131
  weberror  [Day Mon DD HH:MM:SS YYYY]      webErrorLogParser.sh:150-154
  access    %h %l %u [%d/%b/%Y:...]         webAccessLogParser.sh:277
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# family detection (anchored, cheap)
# ---------------------------------------------------------------------------

FAMILY_DETECT: dict[str, str] = {
    "gc": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}",
    "was": r"^\[\d{1,2}/\d{1,2}/\d{2} \d{1,2}:\d{2}:\d{2}:\d{3} [A-Z]{2,4}\]",
    "weberror": r"^\[[A-Z][a-z]{2} [A-Z][a-z]{2} \d{1,2} \d{2}:\d{2}:\d{2} \d{4}\]",
    # COARSE gate: host + ident/user + '[dd/Mon' is enough to claim the
    # access family — a mid-timestamp-truncated record must still route to
    # this family (as a parse miss, discard_reason='parse_miss') rather
    # than to garbage; the full ACCESS grok below stays strict.
    "access": r"^\S+ \S+ \S+ \[\d{2}/[A-Z][a-z]{2}/",
}

# ---------------------------------------------------------------------------
# access_log — webAccessLogParser.sh:277 custom LogFormat
# %h %l %u [%t] "%r" %>s %b JSESSIONID="%s" UID="%s" %D %I %O "%{UA}" %v
# field split is quote-aware: FS="( \"|\" )" webAccessLogParser.sh:164
# ---------------------------------------------------------------------------

ACCESS = (
    r"^(?P<host>\S+) (?P<ident>\S+) (?P<ruser>\S+) "
    r"\[(?P<ts>[^\]]+)\] "
    r'"(?P<request>[^"]*)" '
    r"(?P<status>\d{3}) (?P<rbytes>\S+) "
    r'JSESSIONID="(?P<jsession>[^"]*)" '
    r'UID="(?P<uid>[^"]*)" '
    r"(?P<micros>\d+) (?P<bytes_rcvd>\d+) (?P<bytes_sent>\d+) "
    r'"(?P<ua>[^"]*)" '
    r"(?P<server>\S+)$"
)

# "%r" = method uri proto; the method may arrive glued to garbage
# ("...falseGET") — repaired by suffix match, webAccessLogParser.sh:329-378.
HTTP_METHODS = (
    "GET POST PUT DELETE HEAD OPTIONS TRACE CONNECT PATCH "
    "PROPFIND PROPPATCH MKCOL COPY"
).split()
REQUEST = r"^(?P<rawmethod>\S+) (?P<target>\S+)(?: (?P<proto>\S+))?$"
METHOD_SUFFIX = r"(?P<method>" + "|".join(HTTP_METHODS) + r")$"

# access timestamp: 13/Jun/2015:10:32:04 -0400  (month-name lookup
# webAccessLogParser.sh:175-180; mktime :297-320)
ACCESS_TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"      # Spark
ACCESS_TS_FMT_PY = "%d/%b/%Y:%H:%M:%S %z"     # python/pandas
ACCESS_TS_FMT_DUCK = "%d/%b/%Y:%H:%M:%S %z"   # duckdb strptime

# ---------------------------------------------------------------------------
# WAS SystemOut — websphereLogParser.sh:130-131
# [M/D/YY H:MM:SS:mmm TZ] threadId component evtType class ...msg
# ---------------------------------------------------------------------------

WAS = (
    r"^\[(?P<date>\d{1,2}/\d{1,2}/\d{2}) "
    r"(?P<time>\d{1,2}:\d{2}:\d{2}):(?P<millis>\d{3}) "
    r"(?P<tz>[A-Z]{2,4})\] "
    r"(?P<thread>[0-9a-f]+) "
    r"(?P<component>\S+) "
    r"(?P<evt>[EWFIAO]) +"
    r"(?P<wclass>\S+) (?P<msg>.*)$"
)

# message-code sub-parsers, websphereLogParser.sh:234-317
# code shape: 4-5 alnum product prefix + 4 digits + severity letter (J2CA0056I)
WAS_MSG_CODE = r"^(?P<code>[A-Z][A-Z0-9]{3,4}\d{4}[EWIAF]): "
WTRN0006W = r"Transaction (?P<txn_id>\S+) has timed out after (?P<timeout_s>\d+) seconds"
WTRN0124I = r"(?P<n_threads>\d+) thread"  # affected-thread count
# hung-thread detect (WSVR0605W) / release (WSVR0606W), websphereLogParser.sh:278-307
WSVR0605W = (
    r'Thread "(?P<hthread>[^"]+)" \((?P<hthread_id>[0-9a-f]+)\) has been active for '
    r"(?P<active_ms>\d+) milliseconds"
)
WSVR0606W = (
    r'Thread "(?P<hthread>[^"]+)" \((?P<hthread_id>[0-9a-f]+)\) was previously '
    r"reported to be hung but has completed\. It was active for approximately "
    r"(?P<active_ms>\d+) milliseconds"
)
HUNG_CHTC = r"(?P<chtc>\d+) thread\(s\) in total in the server"
HMGR0152W = r"CPU Starvation detected.*Current thread scheduling delay is (?P<delay_s>\d+) seconds"
OOM = r"java\.lang\.OutOfMemoryError"

# severity pre-filter (pass 1), websphereLogParser.sh:126-137
WAS_KEEP = r"( [EWF] )|WTRN0006W:|WTRN0124I:|WSVR0001I:|WSVR0605W:|WSVR0606W:|HMGR0152W:| WARN | ERROR | FATAL "

# ---------------------------------------------------------------------------
# Apache error_log — webErrorLogParser.sh:99,148-268
# ---------------------------------------------------------------------------

WEBERROR = (
    r"^\[(?P<dow>[A-Z][a-z]{2}) (?P<mon>[A-Z][a-z]{2}) (?P<day>\d{1,2}) "
    r"(?P<time>\d{2}:\d{2}:\d{2}) (?P<year>\d{4})\] "
    r"\[(?P<level>[a-z]+)\] (?P<rest>.*)$"
)
ERR_CLIENT = r"^\[client (?P<client>[\d.]+)\] (?P<errmsg>.*)$"
# mpmstats global line, webErrorLogParser.sh:157-171
MPM_GLOBAL = (
    r"mpmstats: rdy (?P<rdy>\d+) bsy (?P<bsy>\d+) rd (?P<rd>\d+) "
    r"wr (?P<wr>\d+) ka (?P<ka>\d+) log (?P<log>\d+) dns (?P<dns>\d+) "
    r"cls (?P<cls>\d+)"
)
# plugin-busy line (1 or 2 modules, order-insensitive), webErrorLogParser.sh:193-231
MPM_BSY = (
    r"mpmstats: bsy: (?P<n1>\d+) in (?P<mod1>\S+?)(?:,|$)"
    r"(?: (?P<n2>\d+) in (?P<mod2>\S+))?"
)
MAXCLIENTS = r"approaching MaxClients \((?P<cur>\d+)/(?P<max>\d+)\)"
HTTP_RECYCLE = r"resuming normal operations"

# ---------------------------------------------------------------------------
# verbose GC (one event per line in our input) — javaGCStatsParser.sh:285-360
# ---------------------------------------------------------------------------

_SZ = r"(\d+)([KMG])"
GC = (
    r"^(?P<ts>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+[+-]\d{4}): "
    r"\[(?P<kind>GC|Full GC \(System\)|Full GC) "
    r"(?:\[PSYoungGen: (?P<yb>\d+)(?P<ybu>[KMG])->(?P<ya>\d+)(?P<yau>[KMG])"
    r"\((?P<yt>\d+)(?P<ytu>[KMG])\)\] )?"
    r"(?:\[ParOldGen: (?P<ob>\d+)(?P<obu>[KMG])->(?P<oa>\d+)(?P<oau>[KMG])"
    r"\((?P<ot>\d+)(?P<otu>[KMG])\)\] )?"
    r"(?P<hb>\d+)(?P<hbu>[KMG])->(?P<ha>\d+)(?P<hau>[KMG])"
    r"\((?P<ht>\d+)(?P<htu>[KMG])\)"
    r"(?: \[PSPermGen: (?P<pb>\d+)(?P<pbu>[KMG])->(?P<pa>\d+)(?P<pau>[KMG])"
    r"\((?P<pt>\d+)(?P<ptu>[KMG])\)\])?"
    r", (?P<secs>[\d.]+) secs\] "
    r"\[Times: user=(?P<user>[\d.]+) sys=(?P<sys>[\d.]+), real=(?P<real>[\d.]+) secs\]$"
)

# gcType classification, javaGCStatsParser.sh:241-261
GC_TYPES = {"GC": "GC", "Full GC": "FULLGC", "Full GC (System)": "FULLGC_SYS"}

# static-content exclusion (F4), webAccessLogParser.sh:742
STATIC_EXT = r"^(jpg|gif|png|ico|js|css|woff|swf|jar|htm|html|txt)$"
XCL_URI = r"(\.css\.xhtml$|\.js\.xhtml$|\.png\.xhtml$|\.gif\.xhtml$)"
XCL_PARAMS = r"WilyCmd=cmdMetrics"

def anon(rx: str) -> str:
    """Strip Python named groups -> non-capturing, for JVM rlike/DuckDB use.

    Java regex rejects `(?P<name>...)`; for pure match tests the groups are
    irrelevant, so `(?:...)` keeps the pattern identical in all engines.
    """
    return re.sub(r"\(\?P<[^>]+>", "(?:", rx)


COMPILED: dict[str, re.Pattern[str]] = {
    name: re.compile(rx)
    for name, rx in {
        "access": ACCESS,
        "was": WAS,
        "weberror": WEBERROR,
        "gc": GC,
        "request": REQUEST,
        "method_suffix": METHOD_SUFFIX,
        "err_client": ERR_CLIENT,
        "mpm_global": MPM_GLOBAL,
        "mpm_bsy": MPM_BSY,
        **{f"detect_{k}": v for k, v in FAMILY_DETECT.items()},
    }.items()
}
