"""Deterministic synthetic tokenized-log dataset generator (FIXTURES.md).

Generates the primary input table
    token_sequences(doc_id string, tokens array<int32>, n_tok int32, source string)
plus side artifacts used only by tests/oracles:
    raw_lines(doc_id, source, line)   -- pre-tokenization text, DuckDB oracle input
    truth(...)                        -- generator-known per-row fields/categories
    lookups/{clone_map,perf_baseline,thresholds,custom_filter,route_meta}.parquet

Pure function of (seed, sf): SF=1 ~ 10M rows, SF=0.01 ~ 100k. Tokenization is
byte-level UTF-8 (all lines are ASCII): tokens = list(line.encode()).

Row mix (FIXTURES.md §1): ~70% Apache access_log lines, ~15% WAS SystemOut,
~10% Apache error_log (incl. mpmstats), ~4% verbose-GC events (one line per
event), ~1% garbage -> unmatched. One hot source (webhost010) carries ~40% of
access rows to exercise salted-repartition skew handling.

Line formats mirror the reference's documented record shapes:
  access    webAccessLogParser.sh:277,293-295
  was       websphereLogParser.sh:130-131
  weberror  webErrorLogParser.sh:157,193
  gc        javaGCStatsParser.sh:285-345 (flattened to one line/event)
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

N_PER_SF = 10_000_000
SEED = 42
# Bump whenever the generated schema/shape changes so cached dirs regenerate.
DATASET_VERSION = 3
MAIN_DATE = "2015-06-13"
PREV_DATE = "2015-06-12"
DATA_ROOT = os.environ.get("TOKENLOG_DATA_ROOT", "/root/repo/data/tokenlog")

# ---------------------------------------------------------------- pools

WEB_SOURCES = [f"webhost{i:03d}" for i in range(1, 21)]
HOT_SOURCE = "webhost010"
WAS_SOURCES = [f"wasprod{i:02d}" for i in range(1, 7)] + ["wasbat01", "wasbat02"]
JVM_SOURCES = [f"jvmapp{i:02d}" for i in range(1, 5)] + ["jvmbat01", "jvmbat02"]

LOGIN_URI = "/secMgmt/roleSelect/loginRoleSelect.xhtml"
LOGOUT_URI = "/secMgmt/Portal"
DYNAMIC_URIS = [
    "/custCaseMgmt/admin/caseNotification.xhtml",
    "/custCaseMgmt/encounter/createCaseDetails.xhtml",
    "/custCaseMgmt/encounter/maintainCase.xhtml",
    "/custIdx/pages/cust/advancedcustSearch.faces",
    "/custIdx/pages/cust/custSearch.faces",
    "/custIdx/pages/cust/custView.faces",
    "/custIdx/pages/cust/maintaincust.faces",
    "/custIdx/pages/cust/merge/custMerge.faces",
    "/evtMgmt/pages/evtCreate.xhtml",
    "/evtMgmt/pages/evtMaintain.xhtml",
    "/evtMgmt/pages/evtSearch.xhtml",
    "/dashBoardScreen/pages/dashBoardScreen.xhtml",
    "/dashBoardScreen/dbContextHeaderServlet",
    "/docMgmt/pages/AddNewdocView.xhtml",
    "/docMgmt/pages/docDetailsView.xhtml",
    "/rptMgmt/preparerptAction.do",
    "/rptMgmt/openrpt.do",
    "/rptMgmt/rptData.do",
    "/salesMgmt/pages/cntrct/Viewcntrct.xhtml",
    "/salesMgmt/pages/ctlg/ctlgItemSearch.xhtml",
    "/issMgmt/pages/issueLogSearch.xhtml",
    "/secMgmt/pages/usrSrch/search.xhtml",
]
STATIC_URIS = [
    "/dashBoardScreen/global/images/logo.png",
    "/static/js/app.js",
    "/static/css/style.css",
    "/favicon.ico",
    "/static/images/banner.gif",
    "/docs/readme.txt",
]

# (ua string, browser family, os name) — classifications the vectorized
# classifier (functions/ua.py) must reproduce; covers >=8 of the reference's
# 16 switch cases (webAccessLogParser.sh:500-654) + curl + unknown.
UA_POOL: list[tuple[str, str, str]] = [
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 Firefox/38.0", "Firefox", "Windows"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:10.0) Gecko/20150101 Firefox/47.0", "Firefox", "Linux"),
    ("Mozilla/4.0 (compatible; MSIE 7.0; Windows NT 6.1; Trident/4.0)", "MSIE", "Windows"),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko", "MSIE", "Windows"),
    (
        "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/51.0.2704.79 Safari/537.36 Edge/14.14393",
        "Edge",
        "Windows",
    ),
    (
        "Mozilla/5.0 (iPad; CPU OS 8_1_2 like Mac OS X) AppleWebKit/600.1.4 "
        "(KHTML, like Gecko) Version/8.0 Mobile/12B440 Safari/600.1.4",
        "Safari-iPad",
        "iPadOS",
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 7_0 like Mac OS X) AppleWebKit/537.51.1 "
        "(KHTML, like Gecko) Version/7.0 Mobile/11A465 Safari/9537.53",
        "Safari-iPhone",
        "iOS",
    ),
    (
        "Mozilla/5.0 (Linux; Android 5.0; SM-G900W8 Build/LRX21T) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/52.0.2743.98 Mobile Safari/537.36",
        "Android-Chrome",
        "Android",
    ),
    (
        "Mozilla/5.0 (Windows NT 6.1) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/58.0.3029.96 Safari/537.36",
        "Chrome",
        "Windows",
    ),
    (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_11_6) AppleWebKit/601.7.7 "
        "(KHTML, like Gecko) Version/9.1.2 Safari/601.7.7",
        "Safari",
        "macOS",
    ),
    ("curl/7.29.0", "curl", "Other"),
    ("SomeBot/1.0 (unknown agent)", "Other", "Other"),
]
UA_PROBS = np.array([0.20, 0.08, 0.08, 0.12, 0.06, 0.05, 0.05, 0.06, 0.18, 0.055, 0.02, 0.015])
UA_PROBS = UA_PROBS / UA_PROBS.sum()

CLONE_ROWS = [
    ("23532em3r", "AppSrv01", "washost082"),
    ("23532enb4", "AppSrv02", "washost083"),
    ("23532es5b", "AppSrv03", "washost084"),
    ("23532etq9", "AppSrv04", "washost085"),
    ("678494cmb", "AppSrv05", "washost086"),
    ("678494f7d", "AppSrv06", "washost087"),
    ("36734iq02", "AppSrv01", "washost088"),
    ("36734isf3", "AppSrv02", "washost089"),
    ("3167345hd", "MTMSrv01", "washost088"),
    ("19758rty4", "MTMSrv02", "washost089"),
]

WAS_COMPONENTS = [
    "ServletWrappe", "WebContainer", "SystemOut", "TimeoutManage",
    "ThreadMonitor", "HAManagerImpl", "ConnLeakLogic", "SibMessage",
]
WAS_CLASSES = [
    "com.example.web.RequestFilter", "com.example.svc.CaseService",
    "com.example.dao.CustDao", "com.example.util.CacheLoader",
    "com.example.web.SessionListener",
]
ERROR_MSGS = [  # (exception-ish message, contains custom-filter pattern?)
    ("SRVE0068E: Uncaught exception thrown: java.io.IOException: Broken pipe", False),
    ("SRVE0068E: Uncaught exception thrown: java.sql.SQLException: ORA-01013: user requested cancel of current operation", True),
    ("DSRA0230E: StaleConnectionException com.ibm.websphere.ce.cm.StaleConnectionException on getConnection", False),
    ("CHFW0029E: Unable to fully sendVia channel chain HttpsOutbound; rc=7", True),
    ("PROXY0013E: backend returned 503 Service Temporarily Unavailable for upstream", True),
    ("ORBX0320E: CORBA NO_RESPONSE received while invoking remote bean", True),
]
WARN_MSGS = [
    "SECJ0305W: The role-based authorization check failed for admin-authz operation",
    "WKSP0100W: Workspace temp area nearing capacity",
    "SRVE0274W: Error while adding servlet mapping for path /internal",
    "CWWIM4538W: Multiple principals were found for login",
]
FATAL_MSG = "WSVR0009F: Server failed to start; unrecoverable initialization error"

ERRLOG_MSGS = [
    "(103)Software caused connection abort: ap_pass_brigade() failed",
    "(70007)The timeout specified has expired: proxy read timeout",
    "File does not exist: /opt/www/htdocs/robots.txt",
    "ws_common: websphereHandleRequest: Failed to handle request",
]

GARBAGE_TEMPLATES = [
    "@@corrupt-frame {h} ##binary?? \\x00\\x1f payload {h2}",
    "<<<truncated segment {h} ::: no parser for this shape {h2}>>>",
    "%%%% {h} unaligned record {h2} %%%%",
]

MONTHS = "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()
DOWS = "Mon Tue Wed Thu Fri Sat Sun".split()


# ---------------------------------------------------------------- helpers

def _fmt_access_ts(dates: pd.Series, secs: np.ndarray) -> pd.Series:
    """dd/Mon/yyyy:HH:MM:SS -0400"""
    hh = secs // 3600
    mm = (secs % 3600) // 60
    ss = secs % 60
    d = pd.to_datetime(dates)
    return (
        d.dt.strftime("%d/%b/%Y")
        + ":" + pd.Series(hh).astype(str).str.zfill(2).values
        + ":" + pd.Series(mm).astype(str).str.zfill(2).values
        + ":" + pd.Series(ss).astype(str).str.zfill(2).values
        + " -0400"
    )


def _zf(a: np.ndarray, n: int) -> pd.Series:
    return pd.Series(a).astype(str).str.zfill(n)


def _derive_url_parts(uri_full: pd.Series) -> pd.DataFrame:
    """P4 URL decomposition truth: path/params/domain/page/ext (webAccessLogParser.sh:380-414)."""
    split_q = uri_full.str.split("?", n=1)
    path = split_q.str[0]
    params = split_q.str[1].fillna("NA")
    segs = path.str.strip("/").str.split("/")
    domain = segs.str[0].replace("", "/")
    page = segs.str[-1].replace("", "/")
    has_ext = page.str.contains(r"\.", regex=True)
    ext = page.str.rsplit(".", n=1).str[-1].where(has_ext, "NA")
    return pd.DataFrame(
        {"uri_path": path, "params": params, "domain": domain, "page": page, "ext": ext}
    )


# ---------------------------------------------------------------- families

def _gen_access(n: int, rng: np.random.Generator) -> pd.DataFrame:
    src_probs = np.full(len(WEB_SOURCES), 0.6 / (len(WEB_SOURCES) - 1))
    src_probs[WEB_SOURCES.index(HOT_SOURCE)] = 0.4
    source = rng.choice(WEB_SOURCES, size=n, p=src_probs)

    ips = np.array([f"10.20.{a}.{b}" for a in range(2) for b in range(1, 26)])
    host = rng.choice(ips, size=n)
    secs = rng.integers(0, 86400, size=n)
    off_date = rng.random(n) < 0.03
    date = np.where(off_date, PREV_DATE, MAIN_DATE)

    method = rng.choice(["GET", "POST", "PUT", "DELETE", "HEAD"], size=n,
                        p=[0.86, 0.10, 0.015, 0.01, 0.015])
    glued = rng.random(n) < 0.005  # P3 glued-garbage method repair case
    rawmethod = np.where(glued, np.char.add("false", method.astype("U16")), method)

    kind = rng.choice(["dyn", "static", "login", "logout", "wily"], size=n,
                      p=[0.655, 0.28, 0.025, 0.02, 0.02])
    uri_path = np.empty(n, dtype=object)
    uri_path[kind == "dyn"] = rng.choice(DYNAMIC_URIS, size=int((kind == "dyn").sum()))
    uri_path[kind == "static"] = rng.choice(STATIC_URIS, size=int((kind == "static").sum()))
    uri_path[kind == "login"] = LOGIN_URI
    uri_path[kind == "logout"] = LOGOUT_URI
    uri_path[kind == "wily"] = "/custIdx/ping"
    qp = rng.integers(100, 999, size=n)
    params = np.where(
        kind == "wily",
        "WilyCmd=cmdMetrics",
        np.where(
            kind == "logout",
            "logout=true",
            np.where((kind == "dyn") & (rng.random(n) < 0.3),
                     np.char.add("action=view&id=", qp.astype(str)), ""),
        ),
    )
    uri_full = np.where(params == "", uri_path.astype("U128"),
                        np.char.add(np.char.add(uri_path.astype("U128"), "?"), params.astype("U64")))

    status = rng.choice([200, 206, 302, 304, 401, 403, 404, 408, 500], size=n,
                        p=[0.78, 0.02, 0.05, 0.08, 0.01, 0.01, 0.03, 0.01, 0.01])
    rbytes = rng.integers(120, 900_000, size=n)
    dash_bytes = (status == 304) & (rng.random(n) < 0.5)  # %b may be '-'
    rbytes_s = np.where(dash_bytes, "-", rbytes.astype(str))

    # response time mixture spanning all 5 buckets; first 4 rows pinned to the
    # exact inclusive boundaries 1/5/10/20s (P8 boundary tests)
    comp = rng.choice(5, size=n, p=[0.70, 0.15, 0.08, 0.04, 0.03])
    lo = np.array([0.05, 1.0, 5.0, 10.0, 20.0])[comp]
    hi = np.array([1.0, 5.0, 10.0, 20.0, 60.0])[comp]
    rt = lo + (hi - lo) * rng.random(n)
    micros = (rt * 1e6).astype(np.int64)
    if n >= 4:
        micros[:4] = [1_000_000, 5_000_000, 10_000_000, 20_000_000]
    rt = micros / 1e6
    bytes_rcvd = rng.integers(200, 4000, size=n)
    bytes_sent = rbytes + rng.integers(100, 600, size=n)

    # coherent sessions: uid & jsession derived from a session index
    n_sessions = max(20, n // 25)
    sess = rng.integers(0, n_sessions, size=n)
    uid_pool = np.array([f"user{i:03d}@example.com" for i in range(120)])
    uid = uid_pool[sess % len(uid_pool)]
    clone_ids = np.array([c for c, _, _ in CLONE_ROWS])
    clone = clone_ids[sess % len(clone_ids)]
    jsbase = np.char.add("0000", np.char.add("J", sess.astype(str)))
    jsession = np.char.add(np.char.add(jsbase, "sid:"), clone.astype("U16"))
    no_sess = rng.random(n) < 0.15
    jsession = np.where(no_sess, "-", jsession)
    clone = np.where(no_sess, "", clone)
    no_uid = rng.random(n) < 0.03
    uid = np.where(no_uid, "-", uid)

    ua_idx = rng.choice(len(UA_POOL), size=n, p=UA_PROBS)
    ua = np.array([u for u, _, _ in UA_POOL])[ua_idx]
    browser = np.array([b for _, b, _ in UA_POOL])[ua_idx]
    os_name = np.array([o for _, _, o in UA_POOL])[ua_idx]

    # 0.3% truncated lines: family detect hits but the full grok misses
    broken = rng.random(n) < 0.003

    ts_s = _fmt_access_ts(pd.Series(date), secs)
    line = (
        pd.Series(host)
        + " - - [" + ts_s + "] \""
        + pd.Series(rawmethod) + " " + pd.Series(uri_full.astype(object)) + " HTTP/1.1\" "
        + pd.Series(status).astype(str) + " " + pd.Series(rbytes_s)
        + " JSESSIONID=\"" + pd.Series(jsession.astype(object))
        + "\" UID=\"" + pd.Series(uid.astype(object))
        + "\" " + pd.Series(micros).astype(str)
        + " " + pd.Series(bytes_rcvd).astype(str)
        + " " + pd.Series(bytes_sent).astype(str)
        + " \"" + pd.Series(ua.astype(object)) + "\" "
        + pd.Series(source.astype(object))
    )
    line = line.where(~broken, line.str.slice(0, 40))

    discarded = (browser == "curl") | (uid == "-")  # F3, webAccessLogParser.sh:680-683
    category = np.where(broken | discarded, "unmatched", "access")

    df = pd.DataFrame(
        {
            "family": "access",
            "source": source,
            "line": line,
            "category": category,
            "event_date": date,
            "hour": secs // 3600,
            "secs": secs,
            "a_host": host,
            "a_method": method,
            "a_rawmethod": rawmethod,
            "a_uri_full": uri_full,
            "a_status": status,
            "a_bytes": np.where(dash_bytes, -1, rbytes),
            "a_rt": rt,
            "a_bytes_rcvd": bytes_rcvd,
            "a_bytes_sent": bytes_sent,
            "a_jsession": jsession,
            "a_clone_id": clone,
            "a_uid": uid,
            "a_ua": ua,
            "a_browser": browser,
            "a_os": os_name,
            "a_is_login": kind == "login",
            "a_is_logout": kind == "logout",
            "a_broken": broken,
            "a_discarded": discarded,
        }
    )
    df = pd.concat([df, _derive_url_parts(pd.Series(uri_full.astype(object))).add_prefix("a_")], axis=1)
    return df


def _gen_was(n: int, rng: np.random.Generator) -> pd.DataFrame:
    source = rng.choice(WAS_SOURCES, size=n, p=[0.25, 0.2, 0.15, 0.1, 0.1, 0.1, 0.05, 0.05])
    secs = rng.integers(0, 86400, size=n)
    off_date = rng.random(n) < 0.03
    date = np.where(off_date, PREV_DATE, MAIN_DATE)
    thread = np.array([f"{i:08x}" for i in rng.integers(1, 200, size=n)])
    component = rng.choice(WAS_COMPONENTS, size=n)
    wclass = rng.choice(WAS_CLASSES, size=n)
    millis = rng.integers(0, 1000, size=n)

    subtype = rng.choice(
        ["error", "warn", "fatal", "tto", "tto_rel", "hung", "hung_rel",
         "starv", "recycle", "oom", "info"],
        size=n,
        p=[0.22, 0.28, 0.02, 0.04, 0.03, 0.05, 0.03, 0.04, 0.05, 0.01, 0.23],
    )
    evt = np.select(
        [
            np.isin(subtype, ["error", "oom"]),
            np.isin(subtype, ["warn", "tto", "hung", "hung_rel", "starv"]),
            subtype == "fatal",
        ],
        ["E", "W", "F"],
        default="I",
    )
    evt = np.where(subtype == "tto_rel", "I", evt)

    err_idx = rng.integers(0, len(ERROR_MSGS), size=n)
    warn_idx = rng.integers(0, len(WARN_MSGS), size=n)
    txn_id = np.char.add("tid/", rng.integers(10_000, 99_999, size=n).astype(str))
    timeout_s = rng.choice([120, 300, 600], size=n)
    delay_s = rng.integers(5, 60, size=n)
    active_ms = rng.integers(600_000, 2_000_000, size=n)
    chtc = rng.integers(1, 6, size=n)
    hthread = np.char.add("WebContainer : ", rng.integers(1, 99, size=n).astype(str))
    hthread_id = np.array([f"{i:08x}" for i in rng.integers(1, 200, size=n)])

    msg = np.select(
        [
            subtype == "error",
            subtype == "oom",
            subtype == "warn",
            subtype == "fatal",
            subtype == "tto",
            subtype == "tto_rel",
            subtype == "hung",
            subtype == "hung_rel",
            subtype == "starv",
            subtype == "recycle",
        ],
        [
            np.array([m for m, _ in ERROR_MSGS])[err_idx],
            "J2CA0056I: java.lang.OutOfMemoryError: Java heap space while allocating buffer",
            np.array(WARN_MSGS)[warn_idx],
            FATAL_MSG,
            np.char.add(
                np.char.add("WTRN0006W: Transaction ", txn_id),
                np.char.add(" has timed out after ", np.char.add(timeout_s.astype(str), " seconds.")),
            ),
            np.char.add(
                np.char.add("WTRN0124I: There are currently ", chtc.astype(str)),
                np.char.add(" thread(s) associated with the timed out transaction ", txn_id),
            ),
            np.char.add(
                np.char.add(np.char.add(np.char.add('WSVR0605W: Thread "', hthread), '" ('), hthread_id),
                np.char.add(
                    np.char.add(") has been active for ", active_ms.astype(str)),
                    np.char.add(
                        " milliseconds and may be hung.  There is/are ",
                        np.char.add(chtc.astype(str), " thread(s) in total in the server that may be hung."),
                    ),
                ),
            ),
            np.char.add(
                np.char.add(np.char.add(np.char.add('WSVR0606W: Thread "', hthread), '" ('), hthread_id),
                np.char.add(
                    np.char.add(") was previously reported to be hung but has completed. It was active for approximately ", active_ms.astype(str)),
                    np.char.add(
                        " milliseconds.  There is/are ",
                        np.char.add(chtc.astype(str), " thread(s) in total in the server that still may be hung."),
                    ),
                ),
            ),
            np.char.add(
                "HMGR0152W: CPU Starvation detected. Current thread scheduling delay is ",
                np.char.add(delay_s.astype(str), " seconds."),
            ),
            "WSVR0001I: Server open for e-business",
        ],
        default="CWSID0001I: runtime state changed to STARTED",
    )

    d = pd.to_datetime(pd.Series(date))
    date_s = (
        d.dt.month.astype(str) + "/" + d.dt.day.astype(str) + "/" + d.dt.strftime("%y")
    )
    hh = secs // 3600
    time_s = (
        pd.Series(hh).astype(str)
        + ":" + _zf((secs % 3600) // 60, 2)
        + ":" + _zf(secs % 60, 2)
    )
    line = (
        "[" + date_s + " " + time_s + ":" + _zf(millis, 3) + " EDT] "
        + pd.Series(thread) + " " + pd.Series(component) + " " + pd.Series(evt)
        + "   " + pd.Series(wclass) + " " + pd.Series(msg.astype(object))
    )

    code = (
        pd.Series(msg.astype(object))
        .str.extract(r"^([A-Z][A-Z0-9]{3,4}\d{4}[EWIAF]): ", expand=False)
        .fillna("")
        .values
    )
    category = np.where(np.isin(evt, ["E", "W", "F"]), "error", "audit")

    return pd.DataFrame(
        {
            "family": "was",
            "source": source,
            "line": line,
            "category": category,
            "event_date": date,
            "hour": hh,
            "secs": secs,
            "w_evt": evt,
            "w_subtype": subtype,
            "w_thread": thread,
            "w_component": component,
            "w_class": wclass,
            "w_msg": msg,
            "w_code": code,
            "w_txn_id": np.where(np.isin(subtype, ["tto", "tto_rel"]), txn_id, ""),
            "w_timeout_s": np.where(subtype == "tto", timeout_s, 0),
            "w_delay_s": np.where(subtype == "starv", delay_s, 0),
            "w_active_ms": np.where(np.isin(subtype, ["hung", "hung_rel"]), active_ms, 0),
            "w_chtc": np.where(np.isin(subtype, ["hung", "hung_rel"]), chtc, 0),
            "w_hthread_id": np.where(np.isin(subtype, ["hung", "hung_rel"]), hthread_id, ""),
            "w_is_oom": subtype == "oom",
        }
    )


def _gen_weberror(n: int, rng: np.random.Generator) -> pd.DataFrame:
    src_probs = np.full(len(WEB_SOURCES), 0.65 / (len(WEB_SOURCES) - 1))
    src_probs[WEB_SOURCES.index(HOT_SOURCE)] = 0.35
    source = rng.choice(WEB_SOURCES, size=n, p=src_probs)
    secs = rng.integers(0, 86400, size=n)
    off_date = rng.random(n) < 0.03
    date = np.where(off_date, PREV_DATE, MAIN_DATE)

    subtype = rng.choice(
        ["client_err", "mpm_global", "mpm_bsy", "maxclients", "recycle"],
        size=n, p=[0.55, 0.25, 0.12, 0.04, 0.04],
    )
    level = np.where(
        subtype == "client_err",
        rng.choice(["error", "crit", "alert"], size=n, p=[0.85, 0.1, 0.05]),
        "notice",
    )
    ips = np.array([f"10.9.{a}.{b}" for a in range(2) for b in range(1, 21)])
    client = rng.choice(ips, size=n)
    emsg = rng.choice(ERRLOG_MSGS, size=n)
    referer = np.char.add("https://portal.example.com", rng.choice(DYNAMIC_URIS[:8], size=n))

    rdy = rng.integers(5, 80, size=n)
    bsy = rng.integers(1, 140, size=n)
    rd = rng.integers(0, 90, size=n)
    wr = rng.integers(0, 40, size=n)
    ka = rng.integers(0, 30, size=n)
    logc = rng.integers(0, 3, size=n)
    dns = rng.integers(0, 3, size=n)
    cls_ = rng.integers(0, 9, size=n)
    mod1n = rng.integers(1, 40, size=n)
    mod2n = rng.integers(1, 40, size=n)
    two_mods = rng.random(n) < 0.6
    cur = rng.integers(500, 599, size=n)

    d = pd.to_datetime(pd.Series(date))
    # (the real error_log space-pads the day; we emit zero-padded to keep the
    # WEBERROR regex uniform — the \d{1,2} day group accepts both)
    stamp = (
        "[" + d.dt.strftime("%a %b %d") + " " + _zf(secs // 3600, 2)
        + ":" + _zf((secs % 3600) // 60, 2) + ":" + _zf(secs % 60, 2)
        + " " + d.dt.strftime("%Y") + "]"
    )

    rest = np.select(
        [
            subtype == "client_err",
            subtype == "mpm_global",
            subtype == "mpm_bsy",
            subtype == "maxclients",
        ],
        [
            np.char.add(
                np.char.add(np.char.add("[client ", client.astype("U16")), "] "),
                np.char.add(emsg.astype("U128"), np.char.add(", referer: ", referer.astype("U128"))),
            ),
            (
                "mpmstats: rdy " + pd.Series(rdy).astype(str) + " bsy " + pd.Series(bsy).astype(str)
                + " rd " + pd.Series(rd).astype(str) + " wr " + pd.Series(wr).astype(str)
                + " ka " + pd.Series(ka).astype(str) + " log " + pd.Series(logc).astype(str)
                + " dns " + pd.Series(dns).astype(str) + " cls " + pd.Series(cls_).astype(str)
            ).values.astype(object),
            np.where(
                two_mods,
                (
                    "mpmstats: bsy: " + pd.Series(mod1n).astype(str)
                    + " in mod_was_ap22_http.c, " + pd.Series(mod2n).astype(str)
                    + " in apache2entry_web_gate.cpp"
                ).values,
                ("mpmstats: bsy: " + pd.Series(mod1n).astype(str) + " in mod_was_ap22_http.c").values,
            ),
            np.char.add(
                np.char.add("server reached MaxClients setting: approaching MaxClients (", cur.astype(str)),
                "/600)",
            ),
        ],
        default="IBM_HTTP_Server/8.5.5.1 (Unix) configured -- resuming normal operations",
    )
    line = stamp + " [" + pd.Series(level.astype(object)) + "] " + pd.Series(rest.astype(object))
    category = np.where(np.isin(level, ["error", "crit", "alert"]), "error", "audit")

    return pd.DataFrame(
        {
            "family": "weberror",
            "source": source,
            "line": line,
            "category": category,
            "event_date": date,
            "hour": secs // 3600,
            "secs": secs,
            "e_level": level,
            "e_subtype": subtype,
            "e_client": np.where(subtype == "client_err", client, ""),
            "e_errmsg": np.where(subtype == "client_err", emsg, ""),
            "e_referer": np.where(subtype == "client_err", referer, ""),
            "e_mc_cur": np.where(subtype == "maxclients", cur, 0),
            "e_mc_max": np.where(subtype == "maxclients", 600, 0),
            "e_rdy": np.where(subtype == "mpm_global", rdy, 0),
            "e_bsy": np.where(subtype == "mpm_global", bsy, 0),
            "e_rd": np.where(subtype == "mpm_global", rd, 0),
            "e_wr": np.where(subtype == "mpm_global", wr, 0),
            "e_ka": np.where(subtype == "mpm_global", ka, 0),
            "e_mod1": np.where(subtype == "mpm_bsy", mod1n, 0),
            "e_mod2": np.where((subtype == "mpm_bsy") & two_mods, mod2n, 0),
            "e_time_s": (
                _zf(secs // 3600, 2) + ":" + _zf((secs % 3600) // 60, 2)
                + ":" + _zf(secs % 60, 2)
            ),
        }
    )


def _gen_gc(n: int, rng: np.random.Generator) -> pd.DataFrame:
    source = rng.choice(JVM_SOURCES, size=n, p=[0.3, 0.25, 0.15, 0.1, 0.1, 0.1])
    secs = rng.integers(0, 86400, size=n)
    off_date = rng.random(n) < 0.03
    date = np.where(off_date, PREV_DATE, MAIN_DATE)
    kind = rng.choice(["GC", "Full GC", "Full GC (System)"], size=n, p=[0.80, 0.17, 0.03])
    unit = rng.choice(["K", "M", "G"], size=n, p=[0.96, 0.03, 0.01])
    scale = np.select([unit == "K", unit == "M"], [1, 1024], default=1024 * 1024)

    yt = rng.integers(1_000_000, 2_700_000, size=n)
    yb = (yt * rng.uniform(0.7, 0.99, size=n)).astype(np.int64)
    ya = (yt * rng.uniform(0.005, 0.05, size=n)).astype(np.int64)
    ot = rng.integers(4_000_000, 5_600_000, size=n)
    ob = (ot * rng.uniform(0.5, 0.99, size=n)).astype(np.int64)
    oa = (ot * rng.uniform(0.2, 0.6, size=n)).astype(np.int64)
    pt = rng.integers(600_000, 760_000, size=n)
    pb = (pt * rng.uniform(0.7, 0.95, size=n)).astype(np.int64)
    pa = (pb * rng.uniform(0.97, 1.0, size=n)).astype(np.int64)
    ht = yt + ot
    hb = yb + ob
    ha = ya + oa
    is_full = kind != "GC"
    ha = np.where(is_full, ya + oa, ya + ob)  # young GC doesn't shrink old

    secs_gc = np.where(is_full, rng.uniform(1.0, 8.0, size=n), rng.uniform(0.01, 0.5, size=n)).round(7)
    real = np.round(secs_gc * rng.uniform(0.95, 1.05, size=n), 2)
    user = np.round(secs_gc * rng.uniform(1.5, 8.0, size=n), 2)
    sys_ = np.round(secs_gc * rng.uniform(0.0, 0.2, size=n), 2)

    def sz(v: np.ndarray) -> np.ndarray:
        return np.char.add((v // scale).astype(str), unit.astype("U1"))

    d = pd.to_datetime(pd.Series(date))
    ts = (
        d.dt.strftime("%Y-%m-%d") + "T" + _zf(secs // 3600, 2) + ":"
        + _zf((secs % 3600) // 60, 2) + ":" + _zf(secs % 60, 2)
        + "." + _zf(rng.integers(0, 1000, size=n), 3) + "-0400"
    )
    young = np.char.add(
        np.char.add(np.char.add(np.char.add("[PSYoungGen: ", sz(yb)), "->"), sz(ya)),
        np.char.add(np.char.add("(", sz(yt)), ")] "),
    )
    old = np.where(
        is_full,
        np.char.add(
            np.char.add(np.char.add(np.char.add("[ParOldGen: ", sz(ob)), "->"), sz(oa)),
            np.char.add(np.char.add("(", sz(ot)), ")] "),
        ),
        "",
    )
    heap = np.char.add(
        np.char.add(np.char.add(sz(hb), "->"), sz(ha)),
        np.char.add(np.char.add("(", sz(ht)), ")"),
    )
    perm = np.where(
        is_full,
        np.char.add(
            np.char.add(np.char.add(np.char.add(" [PSPermGen: ", sz(pb)), "->"), sz(pa)),
            np.char.add(np.char.add("(", sz(pt)), ")]"),
        ),
        "",
    )
    times = (
        ", " + pd.Series(secs_gc).map(lambda x: f"{x:.7f}") + " secs] [Times: user="
        + pd.Series(user).map(lambda x: f"{x:.2f}") + " sys=" + pd.Series(sys_).map(lambda x: f"{x:.2f}")
        + ", real=" + pd.Series(real).map(lambda x: f"{x:.2f}") + " secs]"
    )
    line = (
        ts + ": [" + pd.Series(kind.astype(object)) + " " + pd.Series(young.astype(object))
        + pd.Series(old.astype(object)) + pd.Series(heap.astype(object))
        + pd.Series(perm.astype(object)) + times
    )

    gc_type = pd.Series(kind).map({"GC": "GC", "Full GC": "FULLGC", "Full GC (System)": "FULLGC_SYS"}).values

    # emitted values lose sub-unit precision; truth records the EMITTED value in KB
    def emitted_kb(v: np.ndarray) -> np.ndarray:
        return (v // scale) * scale

    return pd.DataFrame(
        {
            "family": "gc",
            "source": source,
            "line": line,
            "category": "audit",
            "event_date": date,
            "hour": secs // 3600,
            "secs": secs,
            "g_type": gc_type,
            "g_secs": secs_gc,
            "g_real": real,
            "g_user": user,
            "g_sys": sys_,
            "g_young_before_kb": emitted_kb(yb),
            "g_young_after_kb": emitted_kb(ya),
            "g_young_total_kb": emitted_kb(yt),
            "g_old_before_kb": np.where(is_full, emitted_kb(ob), -1),
            "g_old_after_kb": np.where(is_full, emitted_kb(oa), -1),
            "g_old_total_kb": np.where(is_full, emitted_kb(ot), -1),
            "g_perm_before_kb": np.where(is_full, emitted_kb(pb), -1),
            "g_perm_after_kb": np.where(is_full, emitted_kb(pa), -1),
            "g_perm_total_kb": np.where(is_full, emitted_kb(pt), -1),
            "g_heap_before_kb": emitted_kb(hb),
            "g_heap_after_kb": emitted_kb(ha),
            "g_heap_total_kb": emitted_kb(ht),
        }
    )


def _gen_garbage(n: int, rng: np.random.Generator) -> pd.DataFrame:
    all_sources = WEB_SOURCES + WAS_SOURCES + JVM_SOURCES
    source = rng.choice(all_sources, size=n)
    h = rng.integers(0, 2**32, size=n)
    h2 = rng.integers(0, 2**32, size=n)
    tpl = rng.choice(len(GARBAGE_TEMPLATES), size=n)
    line = pd.Series(
        [
            GARBAGE_TEMPLATES[t].format(h=f"{a:08x}", h2=f"{b:08x}")
            for t, a, b in zip(tpl, h, h2)
        ]
    )
    return pd.DataFrame(
        {
            "family": "garbage",
            "source": source,
            "line": line,
            "category": "unmatched",
            "event_date": MAIN_DATE,
            "hour": 0,
            "secs": 0,
        }
    )


# ---------------------------------------------------------------- assembly

def generate(sf: float, seed: int = SEED, start_index: int = 0) -> pd.DataFrame:
    """Build the full truth DataFrame (one row per sequence) for a scale factor."""
    n = int(round(sf * N_PER_SF))
    rng = np.random.default_rng(seed)
    counts = rng.multinomial(n, [0.70, 0.15, 0.10, 0.04, 0.01])
    parts = [
        _gen_access(counts[0], rng),
        _gen_was(counts[1], rng),
        _gen_weberror(counts[2], rng),
        _gen_gc(counts[3], rng),
        _gen_garbage(counts[4], rng),
    ]
    df = pd.concat(parts, ignore_index=True)
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    df["doc_id"] = [
        f"{s}-{start_index + i:012d}" for i, s in enumerate(df["source"])
    ]
    return df


def _tokens_list_array(lines: pd.Series) -> pa.ListArray:
    """Vectorized byte-level tokenization: one buffer + offsets, O(batch)."""
    joined = "".join(lines.tolist()).encode("utf-8")
    values = pa.array(np.frombuffer(joined, dtype=np.uint8).astype(np.int32))
    lens = lines.str.len().to_numpy(dtype=np.int64)
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    return pa.ListArray.from_arrays(offsets, values)


CHUNK_SF = 0.125  # ~1.25M rows per generation chunk (bounds datagen memory)


def materialize(sf: float, out_dir: str | Path, seed: int = SEED) -> Path:
    """Write token_sequences (hive-partitioned by source), raw_lines, truth, lookups.

    Generation is chunked (CHUNK_SF per chunk, seed derived per chunk) so
    SF=1 (10M rows) never holds the whole frame in memory; output is
    deterministic in (sf, seed). raw_lines/truth become multi-part datasets
    at large SF (pandas/duckdb read them transparently).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # chunk plan: k full chunks + remainder
    sfs: list[float] = []
    left = sf
    while left > CHUNK_SF + 1e-9:
        sfs.append(CHUNK_SF)
        left = round(left - CHUNK_SF, 9)
    sfs.append(round(left, 9))

    raw_dir = out / "raw_lines.parquet"
    truth_dir = out / "truth.parquet"
    for d in (raw_dir, truth_dir):
        if d.exists() and d.is_dir():
            import shutil

            shutil.rmtree(d)
        elif d.exists():
            d.unlink()
    raw_dir.mkdir()
    truth_dir.mkdir()

    total_rows = 0
    start_index = 0
    first = True
    for ci, csf in enumerate(sfs):
        df = generate(csf, seed + ci, start_index=start_index)
        start_index += len(df)
        total_rows += len(df)

        chunk = 1_000_000
        batches: list[pa.RecordBatch] = []
        for start in range(0, len(df), chunk):
            part = df.iloc[start: start + chunk]
            tbl = pa.table(
                {
                    "doc_id": pa.array(part["doc_id"], type=pa.string()),
                    "tokens": _tokens_list_array(part["line"].reset_index(drop=True)),
                    "n_tok": pa.array(part["line"].str.len().astype("int32")),
                    "source": pa.array(part["source"], type=pa.string()),
                }
            )
            batches.extend(tbl.to_batches(max_chunksize=128 * 1024))
        pads.write_dataset(
            batches,
            out / "token_sequences",
            format="parquet",
            schema=batches[0].schema,
            partitioning=pads.partitioning(
                pa.schema([("source", pa.string())]), flavor="hive"
            ),
            existing_data_behavior="delete_matching" if first else "overwrite_or_ignore",
            basename_template=f"chunk{ci}-part-{{i}}.parquet",
            max_rows_per_group=64 * 1024,
        )
        first = False

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(df["doc_id"], type=pa.string()),
                    "source": pa.array(df["source"], type=pa.string()),
                    "line": pa.array(df["line"], type=pa.large_string()),
                }
            ),
            raw_dir / f"part-{ci:04d}.parquet",
        )
        df.drop(columns=["line"]).to_parquet(
            truth_dir / f"part-{ci:04d}.parquet", index=False
        )
        del df

    lk = out / "lookups"
    lk.mkdir(exist_ok=True)
    write_lookups(lk)
    (out / "_SUCCESS").write_text(
        f"sf={sf} seed={seed} rows={total_rows} v={DATASET_VERSION}\n")
    return out


def write_lookups(lk: Path) -> None:
    pd.DataFrame(CLONE_ROWS, columns=["clone_id", "was_server", "was_host"]).to_parquet(
        lk / "clone_map.parquet", index=False
    )
    rng = np.random.default_rng(7)
    base = pd.DataFrame(
        {"uri": DYNAMIC_URIS, "baseline_art": np.round(rng.uniform(0.05, 3.0, len(DYNAMIC_URIS)), 4)}
    )
    base.to_parquet(lk / "perf_baseline.parquet", index=False)
    thresholds = pd.DataFrame(
        [
            ("http400PlusRespCountTh", 10.0, "http"),
            ("httpAvgRespTimeByTranTh", 3.0, "http"),
            ("httpAvgRespTimeTh", 2.5, "http"),
            ("httpDly1SecRangeTh", 82.0, "http"),
            ("httpDly20SecRangeTh", 0.9, "http"),
            ("httpBLnDevPcTh", 3.5, "http"),
            ("httpTransAvgRespTimeDiffWithBaseLineTh", 50.0, "http"),
            ("httpDiscRcdCountTh", 2500.0, "http"),
            ("httpErrorCountTh", 3500.0, "http.err"),
            ("httpMpmStBsyCountTh", 100.0, "http.mpmstat"),
            ("httpMpmStRdCountTh", 75.0, "http.mpmstat"),
            ("httpMpmStWrCountTh", 20.0, "http.mpmstat"),
            ("gcDlyCountTh", 800.0, "jvm.App"),
            ("fgcDlyCountTh", 10.0, "jvm.App"),
            ("gcDlyCountTh", 100.0, "jvm.Bat"),
            ("fgcDlyCountTh", 6.0, "jvm.Bat"),
            ("fgcOldGenAfTh", 4_700_000.0, "jvm.App"),
            ("fgcPGenAfTh", 2_097_152.0, "jvm.App"),
            ("wasTranTmOutCntTh", 3.0, "was.App"),
            ("wasTranTmOutCntTh", 2.0, "was.Bat"),
            ("wasCPUStarvCntTh", 3.0, "was.App"),
            ("wasCPUStarvCntTh", 2.0, "was.Bat"),
            ("wasHungThrdCntTh", 3.0, "was.App"),
            ("wasHungThrdCntTh", 2.0, "was.Bat"),
            ("wasFCntTh", 5.0, "was.App"),
            ("wasECntTh", 6500.0, "was.App"),
            ("wasWCntTh", 18500.0, "was.App"),
            ("wasFCntTh", 5.0, "was.Bat"),
            ("wasECntTh", 50.0, "was.Bat"),
            ("wasWCntTh", 50.0, "was.Bat"),
        ],
        columns=["property", "value", "target"],
    )
    thresholds.to_parquet(lk / "thresholds.parquet", index=False)
    pd.DataFrame(
        {
            "pattern": [
                r"Unable.*to.*sendVia.*",
                r"Error.*Getting.*Directory",
                r"503.*Service.*Temporarily.*Unavailable",
                r"CORBA.*NO_RESPONSE",
                r"ORA-01013:",
            ]
        }
    ).to_parquet(lk / "custom_filter.parquet", index=False)
    route_meta = pd.DataFrame(
        [(s, "http", "http") for s in WEB_SOURCES]
        + [(s, "was", "was.App" if s.startswith("wasprod") else "was.Bat") for s in WAS_SOURCES]
        + [(s, "jvm", "jvm.App" if s.startswith("jvmapp") else "jvm.Bat") for s in JVM_SOURCES],
        columns=["source", "route_class", "severity_class"],
    )
    route_meta.to_parquet(lk / "route_meta.parquet", index=False)


def ensure_dataset(sf: float, root: str | Path = DATA_ROOT, seed: int = SEED) -> Path:
    """Materialize-once cache keyed by (sf, seed, DATASET_VERSION).

    The version stamp lives in _SUCCESS: when the generator's schema
    changes (e.g. round 2 added secs/e_mc_cur/e_mc_max/g_perm_before_kb to
    truth), a stale cached dir would otherwise surface as confusing binder
    errors in every oracle/test — so a version mismatch regenerates."""
    import shutil

    out = Path(root) / f"sf{sf:g}"
    marker = out / "_SUCCESS"
    if marker.exists():
        if f" v={DATASET_VERSION}" in marker.read_text():
            return out
        shutil.rmtree(out)  # stale schema version — regenerate
    return materialize(sf, out, seed)


if __name__ == "__main__":
    import sys

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    p = ensure_dataset(sf)
    print(p)
