"""Parse stage: detokenize -> classify -> per-family grok extraction.

Spark-first layering (SURVEY.md §4 "cheap-regex-before-expensive-UDF"):

1. ``with_line``      one Arrow-batched pandas UDF pass turns tokens into a
                      string column (the only mandatory Python hop).
2. ``classify``       pure-JVM ``rlike``/``regexp_extract`` gates derive
                      (family, category) — codegen'd, no Python. This is the
                      router input; garbage rows never reach the heavy parser.
3. ``parse_<family>`` struct-returning Arrow UDFs run compiled grok regexes
                      batch-at-a-time (pandas .str.extract) — applied only to
                      rows already routed to that family.

Reference parity: the classify gates re-express the AWK discard rules
(webAccessLogParser.sh:680-683 F3), severity pre-filter
(websphereLogParser.sh:126-137 F1) and event routers (F5/F6); the parse UDFs
re-express the positional/regex field extraction (P1-P17).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import patterns as P
from ..functions.buckets import resp_range
from ..functions.detokenize import detokenize_udf
from ..functions.ua import classify_ua

# --------------------------------------------------------------------------
# stage 1+2: line + family/category (JVM-side after the detokenize hop)
# --------------------------------------------------------------------------

SEVERITY_WAS = r"\] [0-9a-f]+ \S+ ([EWFIAO]) "
SEVERITY_ERRLOG = r"^\[[A-Za-z ]+\d[\d: ]+\d{4}\] \[([a-z]+)\]"
UID_GATE = r'UID="([^"]*)"'
UA_GATE = r'"([^"]*)" \S+$'


def with_line(df: DataFrame, col: str = "tokens") -> DataFrame:
    """tokens -> line via the Arrow detokenize kernel."""
    return df.withColumn("line", detokenize_udf(F.col(col)))


def family_col(line: Column) -> Column:
    """Ordered family detection — anchored cheap regexes, first match wins."""
    return (
        F.when(line.rlike(P.FAMILY_DETECT["gc"]), "gc")
        .when(line.rlike(P.FAMILY_DETECT["was"]), "was")
        .when(line.rlike(P.FAMILY_DETECT["weberror"]), "weberror")
        .when(line.rlike(P.FAMILY_DETECT["access"]), "access")
        .otherwise("garbage")
    )


def classify(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Add family + category columns (all whole-stage-codegen expressions).

    Routing semantics (SURVEY.md §7):
      access parse-hit & not discarded            -> access
      WAS W/E/F, error_log error/crit/alert       -> error
      WAS I/A/O, error_log notices, all GC        -> audit
      garbage, access parse-miss, discarded (F3)  -> unmatched
    """
    line = F.col(line_col)
    df = df.withColumn("family", family_col(line))

    access_hit = line.rlike(P.anon(P.ACCESS))
    uid = F.regexp_extract(line, UID_GATE, 1)
    ua = F.regexp_extract(line, UA_GATE, 1)
    discarded = ua.startswith("curl/") | (uid == "-") | (uid == "")
    was_evt = F.regexp_extract(line, SEVERITY_WAS, 1)
    err_level = F.regexp_extract(line, SEVERITY_ERRLOG, 1)

    category = (
        F.when(F.col("family") == "garbage", "unmatched")
        .when(F.col("family") == "access",
              F.when(~access_hit | discarded, "unmatched").otherwise("access"))
        .when(F.col("family") == "was",
              F.when(was_evt.isin("E", "W", "F"), "error").otherwise("audit"))
        .when(F.col("family") == "weberror",
              F.when(err_level.isin("error", "crit", "alert"), "error").otherwise("audit"))
        .otherwise("audit")  # gc
    )
    # Unmatched subtype (reference keeps DISTINCT side files: `.discarded`
    # for curl/no-UID records, webAccessLogParser.sh:680-683, vs the raw
    # parse misses) — carried as a column so each sub-count is separately
    # reportable from the single unmatched sink. parse_miss outranks the
    # discard reasons: a truncated line's extracted UA/UID aren't
    # trustworthy, and the reference's discard branch only ever sees
    # successfully-split records.
    discard_reason = (
        F.when(F.col("family") == "garbage", "garbage")
        .when(F.col("family") == "access",
              F.when(~access_hit, "parse_miss")
              .when(ua.startswith("curl/"), "curl")
              .when((uid == "-") | (uid == ""), "no_uid"))
    )
    return df.withColumn("category", category).withColumn(
        "discard_reason", discard_reason)


# --------------------------------------------------------------------------
# per-family struct parsers (Arrow-batched, compiled regex, O(batch))
# --------------------------------------------------------------------------

ACCESS_STRUCT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("ts_raw", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("uri_full", T.StringType()),
        T.StructField("uri_path", T.StringType()),
        T.StructField("params", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("page", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("rbytes", T.LongType()),
        T.StructField("rt", T.DoubleType()),
        T.StructField("bytes_rcvd", T.LongType()),
        T.StructField("bytes_sent", T.LongType()),
        T.StructField("jsession", T.StringType()),
        T.StructField("clone_id", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField("ua", T.StringType()),
        T.StructField("browser", T.StringType()),
        T.StructField("browser_ver", T.StringType()),
        T.StructField("os_name", T.StringType()),
        T.StructField("os_ver", T.StringType()),
        T.StructField("ua_known", T.BooleanType()),
        T.StructField("event_date", T.StringType()),
        T.StructField("hour", T.IntegerType()),
    ]
)

_MONTH = {m: i + 1 for i, m in enumerate("Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split())}


def _on_uniques(s: pd.Series, fn):
    """Apply a frame-producing fn to the DISTINCT values of s and broadcast
    back — request targets/methods repeat heavily (thousands of uniques vs
    billions of rows), so per-unique work amortizes to ~zero per row."""
    uniq = pd.Series(s.dropna().unique())
    if len(uniq) >= max(64, len(s) // 4):
        return fn(s)
    res = fn(uniq)
    res.index = uniq
    out = res.reindex(s.values)
    out.index = s.index
    return out


def _decompose_url(target: pd.Series) -> pd.DataFrame:
    """P4 URL decomposition (webAccessLogParser.sh:380-414)."""
    qsplit = target.str.split("?", n=1)
    uri_path = qsplit.str[0]
    params = qsplit.str[1].fillna("NA")
    segs = uri_path.str.strip("/").str.split("/")
    domain = segs.str[0].replace("", "/")
    page = segs.str[-1].replace("", "/")
    has_ext = page.str.contains(r"\.", regex=True, na=False)
    ext = page.str.rsplit(".", n=1).str[-1].where(has_ext, "NA")
    return pd.DataFrame({"uri_path": uri_path, "params": params,
                         "domain": domain, "page": page, "ext": ext})


def _parse_access_pdf(line: pd.Series) -> pd.DataFrame:
    """Vectorized access-line grok — P1-P9 (webAccessLogParser.sh:164-667)."""
    g = line.str.extract(P.ACCESS)

    req = g["request"].str.extract(P.REQUEST)
    # P3 glued-method repair: trailing valid-method wins (webAccessLogParser.sh:329-378)
    method = _on_uniques(
        req["rawmethod"],
        lambda s: s.str.extract(P.METHOD_SUFFIX, expand=False),
    )

    # P4 URL decomposition — computed per DISTINCT target, broadcast back
    target = req["target"].fillna("")
    url = _on_uniques(target, _decompose_url)
    uri_path, params = url["uri_path"], url["params"]
    domain, page, ext = url["domain"], url["page"], url["ext"]

    # P5 jsession/cloneID: strip 0000 prefix, clone after ':' (webAccessLogParser.sh:433-445)
    jsession = g["jsession"]
    clone = jsession.str.split(":", n=1).str[1].fillna("")

    # numerics; %b may be '-' (NULL)
    status = pd.to_numeric(g["status"], errors="coerce").astype("Int32")
    rbytes = pd.to_numeric(g["rbytes"].replace("-", None), errors="coerce").astype("Int64")
    rt = pd.to_numeric(g["micros"], errors="coerce") / 1e6  # P7 µs->s
    bytes_rcvd = pd.to_numeric(g["bytes_rcvd"], errors="coerce").astype("Int64")
    bytes_sent = pd.to_numeric(g["bytes_sent"], errors="coerce").astype("Int64")

    uac = classify_ua(g["ua"])

    # P2 timestamp tokens (month-name map, webAccessLogParser.sh:175-180,297-320)
    ts = g["ts"]
    day = ts.str.slice(0, 2)
    mon = ts.str.slice(3, 6).map(_MONTH)
    year = ts.str.slice(7, 11)
    event_date = year + "-" + mon.astype("Int32").astype(str).str.zfill(2) + "-" + day
    hour = pd.to_numeric(ts.str.slice(12, 14), errors="coerce").astype("Int32")

    out = pd.DataFrame(
        {
            "host": g["host"],
            "ts_raw": ts,
            "method": method,
            "uri_full": target.where(g["request"].notna(), None),
            "uri_path": uri_path,
            "params": params,
            "domain": domain,
            "page": page,
            "ext": ext,
            "status": status,
            "rbytes": rbytes,
            "rt": rt,
            "bytes_rcvd": bytes_rcvd,
            "bytes_sent": bytes_sent,
            "jsession": jsession,
            "clone_id": clone,
            "uid": g["uid"],
            "ua": g["ua"],
            "browser": uac["browser"],
            "browser_ver": uac["browser_ver"],
            "os_name": uac["os_name"],
            "os_ver": uac["os_ver"],
            "ua_known": uac["ua_known"].astype(object).where(g["ua"].notna(), None),
            "event_date": event_date.where(mon.notna(), None),
            "hour": hour,
        }
    )
    return out


@F.pandas_udf(ACCESS_STRUCT)
def parse_access_udf(line: pd.Series) -> pd.DataFrame:
    return _parse_access_pdf(line)


WAS_STRUCT = T.StructType(
    [
        T.StructField("event_date", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("hour", T.IntegerType()),
        T.StructField("tz", T.StringType()),
        T.StructField("thread", T.StringType()),
        T.StructField("component", T.StringType()),
        T.StructField("evt", T.StringType()),
        T.StructField("wclass", T.StringType()),
        T.StructField("msg", T.StringType()),
        T.StructField("msg_code", T.StringType()),
        T.StructField("exception", T.StringType()),
        T.StructField("is_oom", T.BooleanType()),
        T.StructField("txn_id", T.StringType()),
        T.StructField("timeout_s", T.IntegerType()),
        T.StructField("delay_s", T.IntegerType()),
        T.StructField("active_ms", T.LongType()),
        T.StructField("chtc", T.IntegerType()),
        T.StructField("hthread_id", T.StringType()),
    ]
)

_EXC_RX = r"((?:[a-z]\w+\.)+[A-Z]\w+(?:Exception|Error))"


def _parse_was_pdf(line: pd.Series) -> pd.DataFrame:
    """WAS SystemOut projection + message-code sub-parsers — P10-P12
    (websphereLogParser.sh:205-317)."""
    g = line.str.extract(P.WAS)
    msg = g["msg"].fillna("")
    code = msg.str.extract(P.WAS_MSG_CODE, expand=False).fillna("")

    # date M/D/YY -> ISO (reindex+object: an all-miss batch yields a short
    # float-NaN frame, which would break the string concat below)
    dparts = (
        g["date"].str.split("/", expand=True)
        .reindex(columns=[0, 1, 2]).astype(object)
    )
    event_date = (
        "20" + dparts[2] + "-" + dparts[0].str.zfill(2) + "-" + dparts[1].str.zfill(2)
    )
    hour = pd.to_numeric(g["time"].str.split(":").str[0], errors="coerce").astype("Int32")

    tto = msg.str.extract(P.WTRN0006W)
    rel = msg.str.extract("WTRN0124I: There are currently (?P<n_threads>\\d+) thread")
    hung = msg.str.extract(P.WSVR0605W)
    hrel = msg.str.extract(P.WSVR0606W)
    chtc = msg.str.extract(P.HUNG_CHTC, expand=False)
    starv = msg.str.extract(P.HMGR0152W)
    exception = msg.str.extract(_EXC_RX, expand=False).fillna("")

    # .where keeps the object dtype (fillna on all-NaN object blocks trips
    # the pandas silent-downcasting FutureWarning in every worker log)
    txn_id = tto["txn_id"].where(
        tto["txn_id"].notna(),
        msg.str.extract(r"timed out transaction (\S+)", expand=False),
    )
    active_ms = hung["active_ms"].where(hung["active_ms"].notna(), hrel["active_ms"])
    hthread_id = hung["hthread_id"].where(
        hung["hthread_id"].notna(), hrel["hthread_id"])

    return pd.DataFrame(
        {
            "event_date": event_date,
            "time": g["time"],
            "hour": hour,
            "tz": g["tz"],
            "thread": g["thread"],
            "component": g["component"],
            "evt": g["evt"],
            "wclass": g["wclass"],
            "msg": g["msg"],
            "msg_code": code,
            "exception": exception,
            "is_oom": msg.str.contains(P.OOM, regex=True).astype(object).where(g["msg"].notna(), None),
            "txn_id": txn_id.fillna(""),
            "timeout_s": pd.to_numeric(tto["timeout_s"], errors="coerce").fillna(0).astype("Int32"),
            "delay_s": pd.to_numeric(starv["delay_s"], errors="coerce").fillna(0).astype("Int32"),
            "active_ms": pd.to_numeric(active_ms, errors="coerce").fillna(0).astype("Int64"),
            "chtc": pd.to_numeric(chtc, errors="coerce").fillna(0).astype("Int32"),
            "hthread_id": hthread_id.fillna(""),
        }
    )


@F.pandas_udf(WAS_STRUCT)
def parse_was_udf(line: pd.Series) -> pd.DataFrame:
    return _parse_was_pdf(line)


ERR_STRUCT = T.StructType(
    [
        T.StructField("event_date", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("hour", T.IntegerType()),
        T.StructField("level", T.StringType()),
        T.StructField("subtype", T.StringType()),
        T.StructField("client", T.StringType()),
        T.StructField("errmsg", T.StringType()),
        T.StructField("referer", T.StringType()),
        T.StructField("rdy", T.IntegerType()),
        T.StructField("bsy", T.IntegerType()),
        T.StructField("rd", T.IntegerType()),
        T.StructField("wr", T.IntegerType()),
        T.StructField("ka", T.IntegerType()),
        T.StructField("logc", T.IntegerType()),
        T.StructField("dns", T.IntegerType()),
        T.StructField("cls", T.IntegerType()),
        T.StructField("mod1", T.StringType()),
        T.StructField("mod1_n", T.IntegerType()),
        T.StructField("mod2", T.StringType()),
        T.StructField("mod2_n", T.IntegerType()),
        T.StructField("maxclients_cur", T.IntegerType()),
        T.StructField("maxclients_max", T.IntegerType()),
        T.StructField("is_recycle", T.BooleanType()),
    ]
)

_MONTH_ABBR = _MONTH


def _parse_weberror_pdf(line: pd.Series) -> pd.DataFrame:
    """Apache error_log projection + mpmstats parsers — P13-P14
    (webErrorLogParser.sh:99-268)."""
    g = line.str.extract(P.WEBERROR)
    rest = g["rest"].fillna("")

    mon = g["mon"].map(_MONTH_ABBR)
    event_date = (
        g["year"] + "-" + mon.astype("Int32").astype(str).str.zfill(2)
        + "-" + g["day"].str.zfill(2)
    )
    hour = pd.to_numeric(g["time"].str.slice(0, 2), errors="coerce").astype("Int32")

    cli = rest.str.extract(P.ERR_CLIENT)
    errmsg_ref = cli["errmsg"].str.split(", referer: ", n=1, regex=False)
    errmsg = errmsg_ref.str[0]
    referer = errmsg_ref.str[1]
    mpm = rest.str.extract(P.MPM_GLOBAL)
    bsy2 = rest.str.extract(P.MPM_BSY)
    mx = rest.str.extract(P.MAXCLIENTS)
    recyc = rest.str.contains(P.HTTP_RECYCLE, regex=True)

    subtype = pd.Series(
        np.select(
            [
                cli["client"].notna(),
                mpm["rdy"].notna(),
                bsy2["n1"].notna(),
                mx["cur"].notna(),
                recyc,
            ],
            ["client_err", "mpm_global", "mpm_bsy", "maxclients", "recycle"],
            default="other",
        ),
        index=line.index,
        dtype=object,
    ).where(g["rest"].notna(), None)

    def num(s: pd.Series) -> pd.Series:
        return pd.to_numeric(s, errors="coerce").fillna(0).astype("Int32")

    return pd.DataFrame(
        {
            "event_date": event_date,
            "time": g["time"],
            "hour": hour,
            "level": g["level"],
            "subtype": subtype,
            "client": cli["client"].fillna(""),
            "errmsg": errmsg.fillna(""),
            "referer": referer.fillna(""),
            "rdy": num(mpm["rdy"]),
            "bsy": num(mpm["bsy"]),
            "rd": num(mpm["rd"]),
            "wr": num(mpm["wr"]),
            "ka": num(mpm["ka"]),
            "logc": num(mpm["log"]),
            "dns": num(mpm["dns"]),
            "cls": num(mpm["cls"]),
            "mod1": bsy2["mod1"].fillna(""),
            "mod1_n": num(bsy2["n1"]),
            "mod2": bsy2["mod2"].fillna(""),
            "mod2_n": num(bsy2["n2"]),
            "maxclients_cur": num(mx["cur"]),
            "maxclients_max": num(mx["max"]),
            "is_recycle": recyc.astype(object).where(g["rest"].notna(), None),
        }
    )


@F.pandas_udf(ERR_STRUCT)
def parse_weberror_udf(line: pd.Series) -> pd.DataFrame:
    return _parse_weberror_pdf(line)


GC_STRUCT = T.StructType(
    [
        T.StructField("ts_raw", T.StringType()),
        T.StructField("event_date", T.StringType()),
        T.StructField("hour", T.IntegerType()),
        T.StructField("gc_type", T.StringType()),
        T.StructField("secs", T.DoubleType()),
        T.StructField("user_s", T.DoubleType()),
        T.StructField("sys_s", T.DoubleType()),
        T.StructField("real_s", T.DoubleType()),
        T.StructField("young_before_kb", T.DoubleType()),
        T.StructField("young_after_kb", T.DoubleType()),
        T.StructField("young_total_kb", T.DoubleType()),
        T.StructField("old_before_kb", T.DoubleType()),
        T.StructField("old_after_kb", T.DoubleType()),
        T.StructField("old_total_kb", T.DoubleType()),
        T.StructField("perm_before_kb", T.DoubleType()),
        T.StructField("perm_after_kb", T.DoubleType()),
        T.StructField("perm_total_kb", T.DoubleType()),
        T.StructField("heap_before_kb", T.DoubleType()),
        T.StructField("heap_after_kb", T.DoubleType()),
        T.StructField("heap_total_kb", T.DoubleType()),
    ]
)

_UNIT_KB = {"K": 1.0, "M": 1024.0, "G": 1024.0 * 1024.0}


def _kb(val: pd.Series, unit: pd.Series) -> pd.Series:
    """P16 unit normalization K/M/G -> KB (javaGCStatsParser.sh:361-403)."""
    return pd.to_numeric(val, errors="coerce") * unit.map(_UNIT_KB)


def _parse_gc_pdf(line: pd.Series) -> pd.DataFrame:
    """Verbose-GC event grok — P15-P17 (javaGCStatsParser.sh:155-445).

    The reference reassembles ~10-line records in a cross-line state machine;
    our input carries one whole event per sequence, so the state machine
    reduces to a single vectorized extract.
    """
    g = line.str.extract(P.GC)
    event_date = g["ts"].str.slice(0, 10)
    hour = pd.to_numeric(g["ts"].str.slice(11, 13), errors="coerce").astype("Int32")
    gc_type = g["kind"].map({"GC": "GC", "Full GC": "FULLGC", "Full GC (System)": "FULLGC_SYS"})
    return pd.DataFrame(
        {
            "ts_raw": g["ts"],
            "event_date": event_date,
            "hour": hour,
            "gc_type": gc_type,
            "secs": pd.to_numeric(g["secs"], errors="coerce"),
            "user_s": pd.to_numeric(g["user"], errors="coerce"),
            "sys_s": pd.to_numeric(g["sys"], errors="coerce"),
            "real_s": pd.to_numeric(g["real"], errors="coerce"),
            "young_before_kb": _kb(g["yb"], g["ybu"]),
            "young_after_kb": _kb(g["ya"], g["yau"]),
            "young_total_kb": _kb(g["yt"], g["ytu"]),
            "old_before_kb": _kb(g["ob"], g["obu"]),
            "old_after_kb": _kb(g["oa"], g["oau"]),
            "old_total_kb": _kb(g["ot"], g["otu"]),
            "perm_before_kb": _kb(g["pb"], g["pbu"]),
            "perm_after_kb": _kb(g["pa"], g["pau"]),
            "perm_total_kb": _kb(g["pt"], g["ptu"]),
            "heap_before_kb": _kb(g["hb"], g["hbu"]),
            "heap_after_kb": _kb(g["ha"], g["hau"]),
            "heap_total_kb": _kb(g["ht"], g["htu"]),
        }
    )


@F.pandas_udf(GC_STRUCT)
def parse_gc_udf(line: pd.Series) -> pd.DataFrame:
    return _parse_gc_pdf(line)


PARSERS = {
    "access": parse_access_udf,
    "was": parse_was_udf,
    "weberror": parse_weberror_udf,
    "gc": parse_gc_udf,
}


def parsed_family(df: DataFrame, family: str, line_col: str = "line") -> DataFrame:
    """Filter to one family and explode its parsed struct into columns.

    Adds a ``range`` bucket for access rows (P8) and keeps the carrier
    columns (doc_id, tokens, n_tok, source) for token-equality invariants.
    If ``df`` came from :func:`fused_parse` the per-family columns already
    exist (prefixed) — just select/rename, no second Python pass.
    """
    if _FAMILY_PREFIX[family] + STRUCTS[family].fields[0].name in df.columns:
        pfx = _FAMILY_PREFIX[family]
        out = df.filter(F.col("family") == family).select(
            "doc_id", "source", "category",
            *[F.col(pfx + f.name).alias(f.name) for f in STRUCTS[family].fields],
        )
    else:
        out = (
            df.filter(F.col("family") == family)
            .withColumn("p", PARSERS[family](F.col(line_col)))
            .select("doc_id", "source", "category", "p.*")
        )
    if family == "access":
        out = out.withColumn("range", resp_range(F.col("rt")))
    return out


# --------------------------------------------------------------------------
# fused single-pass kernel: detokenize + classify + ALL family groks in one
# Arrow hop (the per-round hot path — each line crosses to Python exactly
# once, each grok regex runs exactly once per row)
# --------------------------------------------------------------------------

STRUCTS = {
    "access": ACCESS_STRUCT,
    "was": WAS_STRUCT,
    "weberror": ERR_STRUCT,
    "gc": GC_STRUCT,
}
_FAMILY_PREFIX = {"access": "a_", "was": "w_", "weberror": "e_", "gc": "g_"}
_FAMILY_PARSERS_PDF = {
    "access": _parse_access_pdf,
    "was": _parse_was_pdf,
    "weberror": _parse_weberror_pdf,
    "gc": _parse_gc_pdf,
}

import re as _re

_FD_COMPILED = {k: _re.compile(v) for k, v in P.FAMILY_DETECT.items()}


def _classify_fused_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """One-pass pandas kernel: line, family, category, and a_/w_/e_/g_ fields."""
    line = pdf["__line"] if "__line" in pdf else None
    if line is None:
        from ..functions.detokenize import series_of_token_lists_to_strings

        line = series_of_token_lists_to_strings(pdf["tokens"])
    idx = line.index
    n = len(line)

    family = pd.Series("garbage", index=idx, dtype=object)
    rem = line.notna()
    for name in ("gc", "was", "weberror", "access"):
        m = rem & line.str.match(_FD_COMPILED[name], na=False)
        family[m] = name
        rem &= ~m

    out: dict[str, pd.Series] = {}
    parsed: dict[str, tuple[pd.Series, pd.DataFrame]] = {}
    for fam, pfx in _FAMILY_PREFIX.items():
        mask = family == fam
        fields = [f.name for f in STRUCTS[fam].fields]
        if mask.any():
            sub = _FAMILY_PARSERS_PDF[fam](line[mask])
            parsed[fam] = (mask, sub)
            for f in fields:
                out[pfx + f] = sub[f].reindex(idx)
        else:
            parsed[fam] = (mask, None)
            for f in fields:
                out[pfx + f] = pd.Series([None] * n, index=idx, dtype=object)

    # category (router): same semantics as expression classify()
    category = pd.Series("audit", index=idx, dtype=object)
    category[family == "garbage"] = "unmatched"
    amask, asub = parsed["access"]
    if asub is not None:
        hit = asub["host"].notna()
        uid = asub["uid"].fillna("")
        ua = asub["ua"].fillna("")
        disc = ua.str.startswith("curl/") | (uid == "-") | (uid == "")
        cat_a = pd.Series("access", index=asub.index, dtype=object)
        cat_a[~hit | disc] = "unmatched"
        category[amask] = cat_a
    wmask, wsub = parsed["was"]
    if wsub is not None:
        category[wmask] = np.where(wsub["evt"].isin(["E", "W", "F"]), "error", "audit")
    emask, esub = parsed["weberror"]
    if esub is not None:
        category[emask] = np.where(
            esub["level"].isin(["error", "crit", "alert"]), "error", "audit"
        )

    # unmatched subtype (same semantics as expression classify(); parse_miss
    # outranks curl/no_uid — a truncated line's UA/UID aren't trustworthy)
    discard = pd.Series([None] * n, index=idx, dtype=object)
    discard[family == "garbage"] = "garbage"
    if asub is not None:
        dr = pd.Series([None] * len(asub), index=asub.index, dtype=object)
        is_curl = ua.str.startswith("curl/")
        no_uid = (uid == "-") | (uid == "")
        dr[hit & is_curl] = "curl"
        dr[hit & ~is_curl & no_uid] = "no_uid"
        dr[~hit] = "parse_miss"
        discard[amask] = dr

    res = pd.DataFrame({
        "line": line, "family": family, "category": category,
        "discard_reason": discard,
    })
    for k, v in out.items():
        res[k] = v
    return res


def fused_schema(input_schema: T.StructType, keep_tokens: bool) -> T.StructType:
    fields = [
        f for f in input_schema.fields
        if keep_tokens or f.name != "tokens"
    ]
    fields += [
        T.StructField("line", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("discard_reason", T.StringType()),
    ]
    for fam, pfx in _FAMILY_PREFIX.items():
        fields += [
            T.StructField(pfx + f.name, f.dataType) for f in STRUCTS[fam].fields
        ]
    return T.StructType(fields)


def fused_parse(df: DataFrame, keep_tokens: bool = False) -> DataFrame:
    """detokenize → classify → grok all families, one mapInPandas pass.

    The scale-path parse stage: a single Arrow round trip per batch; every
    downstream operator (router, sinks, all A1-A25 aggregates) is pure JVM.
    ``keep_tokens=False`` (the default sink path) drops the int32 arrays and
    keeps the byte-string ``line`` view instead — an exact bijection under
    byte-level tokenization (see functions/detokenize.retokenize_udf), at
    1/4 the bytes moved and stored.
    """
    passthrough = [f.name for f in df.schema.fields if f.name != "tokens"]
    schema = fused_schema(df.schema, keep_tokens)

    def gen(batches):
        for pdf in batches:
            res = _classify_fused_pdf(pdf)
            for c in reversed(passthrough):
                res.insert(0, c, pdf[c])
            if keep_tokens:
                res["tokens"] = pdf["tokens"]
            yield res[[f.name for f in schema.fields]]

    return df.mapInPandas(gen, schema)
