"""PII masking — the standard training-corpus redaction pass
(C4/Dolma-style in the public literature): replace emails, IPv4
addresses and phone-number-shaped digit runs with fixed sentinel
tokens, and count what was masked per document.

Heuristic by design (documented): the phone pattern trades recall for
a low false-positive rate — it requires 7+ digits in separator-joined
groups and explicitly refuses ISO dates (``2026-08-18``) and bare
4-digit years. Masking is idempotent (sentinels contain no maskable
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
# dotted quad with per-octet range check, not preceded/followed by
# more dots/digits (rejects version strings like 1.2.3.4.5)
_IPV4_RE = re.compile(
    r"(?<![\d.])"
    r"(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(?![\d.])"
)
# 2-4 digit groups joined by -, ., space or (), optional +CC prefix,
# 7+ digits total (checked post-hoc), not butted against other digits
_PHONE_RE = re.compile(
    r"(?<!\d)"
    r"(?:\+\d{1,3}[-. ]?)?"
    r"(?:\(\d{2,4}\)[-. ]?)?"
    r"\d{2,4}(?:[-. ]\d{2,4}){1,4}"
    r"(?!\d)"
)
_ISO_DATE_RE = re.compile(r"^\d{4}[-.]\d{1,2}[-.]\d{1,2}$")


def _phone_sub(m: re.Match) -> str:
    s = m.group(0)
    digits = sum(ch.isdigit() for ch in s)
    if digits < 7 or _ISO_DATE_RE.match(s):
        return s
    return MASK_PHONE


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
    n_phone = 0

    def sub(m: re.Match) -> str:
        nonlocal n_phone
        out = _phone_sub(m)
        if out == MASK_PHONE:
            n_phone += 1
        return out

    masked = _PHONE_RE.sub(sub, masked)
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
        batch = batch.append_column(name, pa.array(vals, pa.int64()))
    return batch


def mask_pii(ds, text_col: str = "text", out_col: str | None = None):
    """Dataset wrapper: one streaming ``map_batches`` pass."""
    return ds.map_batches(
        lambda b: pii_mask_batch(b, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
    )
