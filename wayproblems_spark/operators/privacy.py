"""PII redaction for web-text corpora — the scrub pass every public
training pipeline runs before tokenization.

Pure ``regexp_replace`` column expressions (JVM codegen, zero Python,
zero shuffle — a scan-stage rewrite). Patterns are deliberately limited
to constructs whose semantics are IDENTICAL in java.util.regex and
RE2-family engines (character classes, bounded repetition, alternation —
no backrefs, no lookaround), so a SQL oracle can replicate the scrub
byte-for-byte (q44):

* emails  — ``[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}``  → ``<EMAIL>``
* IPv4    — ``\\b\\d{1,3}(\\.\\d{1,3}){3}\\b``             → ``<IP>``
* long digit runs (phone/account-shaped, 7+) — ``\\d{7,}`` → ``<NUM>``

Order matters and is fixed (emails first — their local part may contain
digit runs; IPs before bare digit runs — an IP's octets are short but a
digit-run pass must not see glued octets). ``redact_pii`` returns the
scrubbed column; ``pii_counts`` returns per-class match counts (cheap
corpus telemetry: count BEFORE replace, on the same scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"
_DIGITS = r"\d{7,}"

PATTERNS = (("email", _EMAIL, "<EMAIL>"), ("ip", _IPV4, "<IP>"),
            ("num", _DIGITS, "<NUM>"))


def redact_pii(text_col) -> Column:
    """Scrubbed text: emails → <EMAIL>, IPv4 → <IP>, 7+-digit runs → <NUM>,
    applied in that fixed order."""
    out = text_col
    for _, pat, token in PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def _count(text_col, pat: str) -> Column:
    return F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))


def pii_counts(text_col) -> dict[str, Column]:
    """{class: count column} — counts are taken on the SAME staged text a
    class's replace sees (emails counted raw; IPs counted after the email
    pass; digit runs after both), so counts sum to replacements made."""
    after_email = F.regexp_replace(text_col, _EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, _IPV4, "<IP>")
    return {
        "n_email": _count(text_col, _EMAIL),
        "n_ip": _count(after_email, _IPV4),
        "n_num": _count(after_ip, _DIGITS),
    }
