"""PII masking — the standard training-corpus redaction pass
(C4/Dolma-style in the public literature): replace emails, IPv4
addresses and phone-number-shaped digit runs with fixed sentinel
tokens, and count what was masked per document.

Heuristic by design (documented): the phone pattern trades recall for
a low false-positive rate — it requires 7+ digits in separator-joined
groups and explicitly refuses ISO dates (``2026-08-18``), date+time
stamps (``2026-08-18 12:30`` keeps both the date and the re-judged
time tail), and bare 4-digit years; date refusal range-validates
month/day so 4-2-2-shaped phone numbers still mask. Masking is idempotent (sentinels contain no maskable
substring — property-tested), so a re-run over an already-masked
corpus is a no-op.

Scale shape: stateless vectorized-per-batch string kernel (compiled
module-level regexes, one pass per pattern per doc); counts come from
``subn`` so flagging costs nothing extra. No shuffle, no state.
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["MASK_EMAIL", "MASK_IP", "MASK_PHONE", "pii_mask", "pii_mask_batch", "mask_pii"]

MASK_EMAIL = "<EMAIL>"
MASK_IP = "<IP>"
MASK_PHONE = "<PHONE>"

_EMAIL_RE = re.compile(
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
)
# dotted quad with per-octet range check, not preceded by more
# dots/digits; the trailing guard rejects only a dot FOLLOWED BY A
# DIGIT (version strings like 1.2.3.4.5) — a bare sentence-final
# period after an IP must still mask ("attacker at 10.1.2.3.")
_IPV4_RE = re.compile(
    r"(?<![\d.])"
    r"(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(?!\.?\d)"
)
# 2-4 digit groups joined by -, ., space or (), optional +CC prefix,
# 7+ digits total (checked post-hoc), not butted against other digits.
# Up to 5 chained groups so a leading ISO date PLUS a full phone fits
# in one match — the date-prefix recursion then re-judges the tail
# ("2026-08-18 555-123-4567" keeps the date, masks the phone).
_PHONE_RE = re.compile(
    r"(?<!\d)"
    r"(?:\+\d{1,3}[-. ]?)?"
    r"(?:\(\d{2,4}\)[-. ]?)?"
    r"\d{2,4}(?:[-. ]\d{2,4}){1,5}"
    r"(?!\d)"
)
# yyyy-mm-dd / yyyy.mm.dd PREFIX with range-validated month/day (a
# 4-2-2 digit shape with month 45 is a phone, not a date) followed by
# a non-digit or end — prefix, not full-match, so "2026-08-18 12:30"
# keeps its date AND the remainder is re-scanned independently
_ISO_DATE_PREFIX_RE = re.compile(
    r"^(\d{4})[-.](\d{1,2})[-.](\d{1,2})(?=$|\D)"
)


def _is_date_prefix(m: re.Match) -> bool:
    return 1 <= int(m.group(2)) <= 12 and 1 <= int(m.group(3)) <= 31


def _mask_phones(s: str) -> tuple[str, int]:
    count = 0

    def sub(m: re.Match) -> str:
        nonlocal count
        g = m.group(0)
        dm = _ISO_DATE_PREFIX_RE.match(g)
        if dm and _is_date_prefix(dm):
            # keep the date; the tail (e.g. a trailing time "12:30")
            # is judged on its own
            rest, c = _mask_phones(g[dm.end() :])
            count += c
            return g[: dm.end()] + rest
        if sum(ch.isdigit() for ch in g) < 7:
            return g
        count += 1
        return MASK_PHONE

    return _PHONE_RE.sub(sub, s), count


def pii_mask(text: str | None) -> tuple[str | None, int, int, int]:
    """text -> (masked, n_emails, n_ips, n_phones); None passes through.

    Order matters: emails first (their local parts can contain digit
    runs), then IPs (dotted quads would otherwise feed the phone
    pattern), then phones.
    """
    if text is None:
        return None, 0, 0, 0
    masked, n_email = _EMAIL_RE.subn(MASK_EMAIL, text)
    masked, n_ip = _IPV4_RE.subn(MASK_IP, masked)
    masked, n_phone = _mask_phones(masked)
    return masked, n_email, n_ip, n_phone


def pii_mask_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str | None = None,
) -> pa.Table:
    """+ masked text (in place, or ``out_col``) and ``n_emails`` /
    ``n_ips`` / ``n_phones`` int64 count columns."""
    masked, emails, ips, phones = [], [], [], []
    for t in batch.column(text_col).to_pylist():
        m, ne, ni, np_ = pii_mask(t)
        masked.append(m)
        emails.append(ne)
        ips.append(ni)
        phones.append(np_)
    target = out_col or text_col
    arr = pa.array(masked, pa.string())
    if target in batch.column_names:
        batch = batch.set_column(
            batch.column_names.index(target), target, arr
        )
    else:
        batch = batch.append_column(target, arr)
    for name, vals in (
        ("n_emails", emails),
        ("n_ips", ips),
        ("n_phones", phones),
    ):
        arr = pa.array(vals, pa.int64())
        # mirror the masked-text handling: re-running over an
        # already-scored table must overwrite, never create a second
        # same-named column (pyarrow allows duplicates, which silently
        # corrupts downstream row conversion)
        if name in batch.column_names:
            batch = batch.set_column(batch.column_names.index(name), name, arr)
        else:
            batch = batch.append_column(name, arr)
    return batch


def mask_pii(ds, text_col: str = "text", out_col: str | None = None):
    """Dataset wrapper: one streaming ``map_batches`` pass."""
    return ds.map_batches(
        lambda b: pii_mask_batch(b, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
    )
