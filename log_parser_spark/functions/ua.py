"""User-agent classifier (P9) — webAccessLogParser.sh:500-654.

The reference implements a 16-case gawk `switch` over the UA string, slicing
positional space-split fields to produce (browser, osName, osFlav, osVer);
unmatched UAs fall through to "Other" and are logged to an `.unknownua` sink
(webAccessLogParser.sh:646-653).

Rebuild: the same ordered-case structure, as a *vectorized* pandas kernel
(np.select over boolean masks + str.extract) — one pass per batch, no per-row
Python. Case order matters and mirrors the reference: X11/Linux before
generic Firefox, specific MSIE/Trident shapes before generic, mobile WebKit
before desktop WebKit. Outputs are normalized (browser family + version)
rather than the reference's raw positional slices; the default case sets
browser="Other" and ua_known=False, which the router surfaces as the
unknown-UA report (the reference's unknownua sink).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# (name, detect-regex, browser-family, version-extract-regex)
# Ordered: first match wins, like the gawk switch.
UA_CASES: list[tuple[str, str, str, str | None]] = [
    ("linux_firefox", r"X11.*Linux.*Firefox", "Firefox", r"Firefox/([\d.]+)"),
    ("firefox", r"Firefox/", "Firefox", r"Firefox/([\d.]+)"),
    ("msie_compat", r"compatible; MSIE [\d.]+; Windows NT", "MSIE", r"MSIE ([\d.]+)"),
    ("ie11", r"Windows NT [\d.]+;.*Trident/[\d.]+;.*rv:[\d.]+\) like Gecko", "MSIE", r"rv:([\d.]+)"),
    ("edge", r"Edge/[\d.]+", "Edge", r"Edge/([\d.]+)"),
    ("ipad_safari", r"iPad.*AppleWebKit/.*Safari/", "Safari-iPad", r"Version/([\d.]+)"),
    ("iphone_safari", r"iPhone.*AppleWebKit/.*Safari/", "Safari-iPhone", r"Version/([\d.]+)"),
    ("android_chrome", r"Linux.*Android.*Chrome/.*Safari/", "Android-Chrome", r"Chrome/([\d.]+)"),
    ("chrome", r"AppleWebKit/.*Chrome/.*Safari/", "Chrome", r"Chrome/([\d.]+)"),
    ("safari", r"AppleWebKit/.*Safari/", "Safari", r"Version/([\d.]+)"),
    ("curl", r"^curl/", "curl", r"curl/([\d.]+)"),
]

OS_CASES: list[tuple[str, str]] = [
    (r"Windows NT ([\d.]+)", "Windows"),
    (r"X11; Linux", "Linux"),
    (r"Linux; Android ([\d.]+)", "Android"),
    (r"iPad; CPU OS ([\d_]+)", "iPadOS"),
    (r"iPhone; CPU iPhone OS ([\d_]+)", "iOS"),
    (r"Macintosh; Intel Mac OS X ([\d_.]+)", "macOS"),
]


def classify_ua(ua: pd.Series) -> pd.DataFrame:
    """Vectorized UA classification.

    Returns DataFrame(browser, browser_ver, os_name, os_ver, ua_known).

    UA cardinality is tiny relative to row count (thousands of distinct
    strings vs billions of requests), so classify distinct values once and
    map back — turns 17 regex passes over N rows into 17 passes over
    uniques. Same trick the reference can't do in a streaming awk pass.
    """
    ua = ua.fillna("")
    uniq = pd.Series(ua.unique())
    if len(uniq) < max(64, len(ua) // 4):
        res = _classify_ua_dense(uniq)
        res.index = uniq
        out = res.reindex(ua.values)
        out.index = ua.index
        return out
    return _classify_ua_dense(ua)


def _classify_ua_dense(ua: pd.Series) -> pd.DataFrame:
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)  # contains() w/ groups
        return _classify_ua_impl(ua)


def _classify_ua_impl(ua: pd.Series) -> pd.DataFrame:
    masks = [ua.str.contains(rx, regex=True) for _, rx, _, _ in UA_CASES]
    families = [fam for _, _, fam, _ in UA_CASES]
    browser = pd.Series(
        np.select(masks, families, default="Other"), index=ua.index, dtype=object
    )

    ver = pd.Series("", index=ua.index, dtype=object)
    for (_, _, fam, vrx), m in zip(UA_CASES, masks):
        if vrx is None:
            continue
        need = m & (browser == fam) & (ver == "")
        if need.any():
            ver.loc[need] = ua[need].str.extract(vrx, expand=False).fillna("")

    os_masks = [ua.str.contains(rx, regex=True) for rx, _ in OS_CASES]
    os_name = pd.Series(
        np.select(os_masks, [n for _, n in OS_CASES], default="Other"),
        index=ua.index,
        dtype=object,
    )
    os_ver = pd.Series("", index=ua.index, dtype=object)
    for (rx, n), m in zip(OS_CASES, os_masks):
        if re.compile(rx).groups == 0:
            continue
        need = m & (os_name == n) & (os_ver == "")
        if need.any():
            os_ver.loc[need] = ua[need].str.extract(rx, expand=False).fillna("")

    return pd.DataFrame(
        {
            "browser": browser,
            "browser_ver": ver,
            "os_name": os_name,
            "os_ver": os_ver,
            "ua_known": browser != "Other",
        }
    )
