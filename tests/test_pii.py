"""PII masking: goldens per pattern, date/version-string refusals,
idempotence property, Dataset pass."""

import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from jamie_ray.functions.pii import (
    MASK_EMAIL,
    MASK_IP,
    MASK_PHONE,
    mask_pii,
    pii_mask,
)

GOLDENS = [
    # (raw, masked, n_emails, n_ips, n_phones)
    ("mail me at jo.doe+x@sub.example.co right now",
     f"mail me at {MASK_EMAIL} right now", 1, 0, 0),
    ("server at 192.168.0.1 and 8.8.8.8 replied",
     f"server at {MASK_IP} and {MASK_IP} replied", 0, 2, 0),
    # version strings are not IPs
    ("release 1.2.3.4.5 is out", "release 1.2.3.4.5 is out", 0, 0, 0),
    ("octet 999.1.1.1 invalid", "octet 999.1.1.1 invalid", 0, 0, 0),
    ("call +81 90-1234-5678 today",
     f"call {MASK_PHONE} today", 0, 0, 1),
    ("call (03) 1234-5678 or 555-123-4567",
     f"call {MASK_PHONE} or {MASK_PHONE}", 0, 0, 2),
    # ISO dates and short digit groups are not phones
    ("dated 2026-08-18 ok", "dated 2026-08-18 ok", 0, 0, 0),
    ("rooms 12-34 open", "rooms 12-34 open", 0, 0, 0),
    # mixed: email local part digits never double-count as phone
    ("a1234567@example.com or 555-123-4567",
     f"{MASK_EMAIL} or {MASK_PHONE}", 1, 0, 1),
    ("", "", 0, 0, 0),
    # sentence-final IP: trailing period must not suppress the mask
    ("attacker at 10.1.2.3.", f"attacker at {MASK_IP}.", 0, 1, 0),
    # date+time stamp: the greedy phone match starts with a valid ISO
    # date -> date kept, time tail re-judged (and too short to mask)
    ("posted 2026-08-18 12:30 by admin",
     "posted 2026-08-18 12:30 by admin", 0, 0, 0),
    # date followed by a REAL phone: date kept, phone masked
    ("meet 2026-08-18 555-123-4567 ok",
     f"meet 2026-08-18 {MASK_PHONE} ok", 0, 0, 1),
    # 4-2-2/4-2-4 digit shapes with impossible month are PHONES:
    # date refusal is range-validated, not shape-only
    ("fax 0123-45-6789 now", f"fax {MASK_PHONE} now", 0, 0, 1),
    ("old fax 0123-45-67 here", f"old fax {MASK_PHONE} here", 0, 0, 1),
]


def test_goldens():
    for raw, want, ne, ni, np_ in GOLDENS:
        got = pii_mask(raw)
        assert got == (want, ne, ni, np_), raw


def test_none_passthrough():
    assert pii_mask(None) == (None, 0, 0, 0)


_text = st.text(
    alphabet=st.sampled_from(
        "ab @.-+()0123456789\nxyz:_%"
    ),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_masking_idempotent(text):
    once, *_ = pii_mask(text)
    twice, ne, ni, np_ = pii_mask(once)
    assert twice == once
    assert (ne, ni, np_) == (0, 0, 0)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_no_residual_email_or_ip(text):
    """The core guarantee: after masking, nothing email- or IP-shaped
    survives (phones are heuristic by documented design; email/IP are
    not)."""
    from jamie_ray.functions.pii import _EMAIL_RE, _IPV4_RE

    masked, *_ = pii_mask(text)
    assert _EMAIL_RE.search(masked) is None
    assert _IPV4_RE.search(masked) is None


def test_mask_pii_dataset(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": [
                    "contact bob@x.org at 10.0.0.7",
                    "nothing sensitive here",
                ],
            }
        )
    )
    rows = {r["doc_id"]: r for r in mask_pii(ds).take_all()}
    assert rows[1]["text"] == f"contact {MASK_EMAIL} at {MASK_IP}"
    assert (rows[1]["n_emails"], rows[1]["n_ips"]) == (1, 1)
    assert rows[2]["text"] == "nothing sensitive here"
    assert rows[2]["n_phones"] == 0
    # out_col keeps the raw text
    kept = mask_pii(ds, out_col="masked").take_all()[0]
    assert "bob@x.org" in kept["text"] or kept["doc_id"] == 2


def test_rerun_does_not_duplicate_count_columns():
    """Re-running pii_mask_batch over an already-scored table must
    overwrite the count columns, not append same-named duplicates
    (pyarrow allows duplicates, which silently corrupts downstream
    row conversion — r4 ADVICE)."""
    import pyarrow as pa

    from jamie_ray.functions.pii import pii_mask_batch

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["mail me at a@b.example from 10.0.0.1"], pa.string()),
        }
    )
    once = pii_mask_batch(t)
    twice = pii_mask_batch(once)
    assert twice.column_names == once.column_names  # no duplicates
    assert len(twice.column_names) == len(set(twice.column_names))
    # second pass over already-masked text finds nothing new
    assert twice.column("n_emails").to_pylist() == [0]
    assert twice.column("n_ips").to_pylist() == [0]
    assert twice.column("text").to_pylist() == once.column("text").to_pylist()
